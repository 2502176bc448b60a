"""Baseline JPEG codec tests (reach_spark.jpeg): exact solid-block
arithmetic (the property the media_jpeg_stats oracle relies on), DC
differential coding across blocks, lossy round-trip tolerances, marker
robustness, and the non-baseline rejection surface."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from reach_spark.jpeg import (_build_codes, _build_decode_table, AC_LUMA,
                              DC_LUMA, decode_jpeg, encode_jpeg)

rng = np.random.RandomState(99)


def _solid_expected(v: int) -> int:
    """Closed-form decode of a solid 8x8 block at Annex-K Q0=16:
    q = sign(v-128) * (|v-128|+1)//2, p = clip(2q+128)."""
    q = int(np.sign(v - 128)) * ((abs(v - 128) + 1) // 2)
    return min(255, max(0, 2 * q + 128))


@pytest.mark.parametrize("v", [0, 1, 63, 127, 128, 129, 200, 254, 255])
def test_solid_block_exact(v):
    d = decode_jpeg(encode_jpeg(np.full((8, 8), v, np.uint8)))
    assert (d == _solid_expected(v)).all()


def test_multiblock_dc_prediction():
    """Blocks with different solid values exercise DC differential coding
    (diffs spanning several magnitude categories) — each decodes to its
    own closed-form value independent of scan order."""
    vals = [(17 + b * 29) % 256 for b in range(8)]
    a = np.zeros((16, 32), np.uint8)
    for b, v in enumerate(vals):
        by, bx = divmod(b, 4)
        a[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = v
    d = decode_jpeg(encode_jpeg(a))
    for b, v in enumerate(vals):
        by, bx = divmod(b, 4)
        assert (d[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                == _solid_expected(v)).all()


def test_gradient_roundtrip_close():
    y, x = np.mgrid[0:32, 0:48]
    a = ((y * 3 + x * 2) % 200 + 20).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(a))
    err = np.abs(d.astype(int) - a.astype(int))
    assert err.max() <= 40 and err.mean() < 8


def test_rgb_solid_gray_is_exact():
    """Cb=Cr=128 for R=G=B, so color conversion is the identity on Y and
    the solid-block arithmetic stays exact within ±1 float rounding."""
    a = np.full((8, 8, 3), 90, np.uint8)
    d = decode_jpeg(encode_jpeg(a))
    assert d.shape == (8, 8, 3)
    assert np.abs(d.astype(int) - _solid_expected(90)).max() <= 1


def test_rgb_color_roundtrip_tolerance():
    a = np.repeat(np.repeat(rng.randint(0, 256, (2, 2, 3)), 16, axis=0),
                  16, axis=1).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(a))
    assert np.abs(d.astype(int) - a.astype(int)).max() <= 20


def test_non_multiple_of_8_dims():
    a = np.full((10, 13), 200, np.uint8)
    d = decode_jpeg(encode_jpeg(a))
    assert d.shape == (10, 13)
    assert (d == _solid_expected(200)).all()


def test_noise_decodes_with_correct_shape():
    """Random noise maximizes AC activity (ZRL runs, high-category
    magnitudes, byte-stuffing likelihood) — decode must parse its own
    encoder's worst case."""
    a = rng.randint(0, 256, (24, 16)).astype(np.uint8)
    assert decode_jpeg(encode_jpeg(a)).shape == (24, 16)


def test_byte_stuffing_roundtrip():
    """A 0xFF byte in the entropy stream must be stuffed/unstuffed; sweep
    content until encoded bytes actually contain an FF00 pair."""
    for seedval in range(40):
        a = ((np.arange(64, dtype=np.int64) * (seedval + 3)) % 256) \
            .astype(np.uint8).reshape(8, 8)
        b = encode_jpeg(a)
        if b"\xff\x00" in b[2:-2]:
            decode_jpeg(b)  # must not raise
            return
    pytest.skip("no stuffed byte produced in sweep")


def test_rejects_progressive_and_subsampled():
    a = np.full((8, 8), 50, np.uint8)
    b = bytearray(encode_jpeg(a))
    i = b.find(b"\xff\xc0")
    prog = bytes(b[:i]) + b"\xff\xc2" + bytes(b[i + 2:])
    with pytest.raises(ValueError):
        decode_jpeg(prog)
    sub = bytearray(encode_jpeg(np.full((8, 8, 3), 50, np.uint8)))
    j = sub.find(b"\xff\xc0")
    sub[j + 11] = 0x22  # luma sampling factor 2x2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(sub))


def test_rejects_garbage():
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0no-sof-here")
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")


def test_huffman_table_construction_canonical():
    """Annex-C canonical codes: shorter codes sort first, each code is
    prefix-free; encode/decode tables invert each other."""
    enc = _build_codes(*DC_LUMA)
    dec = _build_decode_table(*DC_LUMA)
    for sym, (code, ln) in enc.items():
        assert dec[(ln, code)] == sym
    lens = sorted(ln for _, ln in enc.values())
    assert lens == sorted(lens)
    enc_ac = _build_codes(*AC_LUMA)
    assert len(enc_ac) == 162  # full Annex-K AC alphabet


def test_sof_records_true_dimensions():
    b = encode_jpeg(np.zeros((10, 13), np.uint8))
    i = b.find(b"\xff\xc0")
    h, w = struct.unpack(">HH", b[i + 5:i + 9])
    assert (h, w) == (10, 13)
