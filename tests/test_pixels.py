"""Codec tests for reach_spark.pixels: PNG filter reconstruction, GIF
LZW table dynamics, PCM framing, resize grid math, dispatch totality.

The driver queries (media_pixel_stats / media_audio_stats /
media_resize_pixels) already gate the encode→decode round trip against
codec-free DuckDB oracles at sf0.01; these tests pin the unit-level
semantics — per-filter goldens, spec-golden GIF bytes, boundary shapes,
and adversarial garbage."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from reach_spark.pixels import (_lzw_decode, _lzw_encode, decode_gif,
                                decode_pixels, decode_png, decode_wav,
                                encode_gif, encode_png, encode_wav,
                                resize_nearest)

rng = np.random.RandomState(1234)


# ------------------------------------------------------------------ PNG

@pytest.mark.parametrize("shape", [(1, 1), (1, 7), (7, 1), (5, 9),
                                   (4, 4, 3), (3, 5, 4), (1, 1, 3)])
@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4, "cycle", None])
def test_png_roundtrip(shape, filt):
    a = rng.randint(0, 256, shape).astype(np.uint8)
    d = decode_png(encode_png(a, filt))
    assert d.shape == a.shape and d.dtype == np.uint8
    assert (d == a).all()


def test_png_sub_filter_is_lane_wise():
    """Sub (filter 1) predicts from the same CHANNEL of the previous
    pixel, not the previous byte — the classic multi-channel bug. Golden:
    a 1x3 RGB row [10,20,30],[11,22,33],[13,25,37] filtered with Sub
    stores deltas [10,20,30],[1,2,3],[2,3,4]."""
    a = np.array([[[10, 20, 30], [11, 22, 33], [13, 25, 37]]], np.uint8)
    b = encode_png(a, 1)
    # pull the raw filtered scanline back out of the IDAT
    (ln,) = struct.unpack(">I", b[33:37])
    raw = zlib.decompress(b[41:41 + ln])
    assert raw[0] == 1
    assert list(raw[1:]) == [10, 20, 30, 1, 2, 3, 2, 3, 4]
    assert (decode_png(b) == a).all()


def test_png_paeth_golden():
    """Hand-computed Paeth case: a=left, b=up, c=upleft; predictor picks
    the neighbor minimizing |p-x| with ties a, then b (RFC 2083 §6.6)."""
    # rows [100, 200] / [150, 180], filter 4 on BOTH rows:
    # row0 x=0: pred=paeth(0,0,0)=0 -> 100
    #      x=1: a=100,b=0,c=0 -> p=100, pa=0 -> pred=a -> (200-100)=100
    # row1 x=0: a=0,b=100,c=0 -> p=100, pred=b=100 -> (150-100)=50
    #      x=1: a=150,b=200,c=100 -> p=250: pa=100,pb=50,pc=150 ->
    #           pred=b=200 -> (180-200)%256=236
    a = np.array([[100, 200], [150, 180]], np.uint8)
    b = encode_png(a, 4)
    (ln,) = struct.unpack(">I", b[33:37])
    raw = zlib.decompress(b[41:41 + ln])
    assert list(raw) == [4, 100, 100, 4, 50, 236]
    assert (decode_png(b) == a).all()


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\nnot-a-chunk")
    with pytest.raises(ValueError):
        decode_png(b"GIF89a" + b"\x00" * 20)


def test_png_rejects_unsupported_layouts():
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)  # 16-bit depth
    crc = zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
    b = sig + struct.pack(">I", 13) + b"IHDR" + ihdr + struct.pack(">I", crc)
    with pytest.raises(ValueError):
        decode_png(b)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(arrays(np.uint8, st.tuples(st.integers(1, 12), st.integers(1, 12)),
              elements=st.integers(0, 255)),
       st.sampled_from([0, 1, 2, 3, 4, "cycle"]))
def test_png_roundtrip_property(a, filt):
    assert (decode_png(encode_png(a, filt)) == a).all()


# ------------------------------------------------------------------ GIF

def test_gif_spec_golden_1x1_white():
    """Canonical 1x1 white GIF (appears verbatim in GIF spec tutorials):
    min code size 2, stream = CLEAR(100b), 0(000b), EOI(101b) packed
    LSB-first into 0x44 0x01."""
    g = bytes.fromhex(
        "47494638396101000100800000ffffff000000"
        "2c000000000100010000" "02" "024401" "00" "3b")
    px = decode_gif(g)
    assert px.shape == (1, 1, 3) and (px == 255).all()


def test_lzw_width_growth_schedule():
    """Encoder and decoder must grow code width at the same code index —
    the off-by-one between 'encoder registers entry at emit i' and
    'decoder registers it at receive i+1'. A 300-symbol stream over a
    4-entry alphabet crosses the 3→4→5→6-bit boundaries."""
    seq = [int(x) for x in rng.randint(0, 4, 300)]
    assert _lzw_decode(2, _lzw_encode(2, seq), len(seq)) == seq


def test_lzw_table_full_reset():
    """>4096 table entries forces the encoder's clear-and-reset path."""
    seq = [int(x) for x in rng.randint(0, 256, 30000)]
    assert _lzw_decode(8, _lzw_encode(8, seq), len(seq)) == seq


def test_lzw_kwkwk_case():
    """The classic cScSc pattern where the decoder receives a code not
    yet in its table (code == next_code) and must synthesize
    prev + prev[0]."""
    seq = [1, 2, 1, 2, 1, 2, 1, 2, 1]
    assert _lzw_decode(2, _lzw_encode(2, seq), len(seq)) == seq


@pytest.mark.parametrize("h,w,ncol", [(1, 1, 2), (6, 9, 4), (17, 13, 256),
                                      (2, 300, 16)])
def test_gif_roundtrip(h, w, ncol):
    idx = rng.randint(0, ncol, (h, w)).astype(np.uint8)
    pal = rng.randint(0, 256, (ncol, 3)).astype(np.uint8)
    out = decode_gif(encode_gif(idx, pal))
    assert out.shape == (h, w, 3)
    assert (out == pal[idx]).all()


def test_gif_skips_extension_blocks():
    idx = np.array([[0, 1], [1, 0]], np.uint8)
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    g = encode_gif(idx, pal)
    # splice a graphic-control extension between the screen descriptor +
    # color table and the image descriptor
    head_end = 13 + 6  # header+LSD + 2-entry color table
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    g2 = g[:head_end] + ext + g[head_end:]
    assert (decode_gif(g2) == pal[idx]).all()


def test_gif_rejects_garbage():
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x01\x00\x01\x00\x00\x00\x00" + b"\xff")


# ------------------------------------------------------------------ WAV

@pytest.mark.parametrize("ch", [1, 2])
def test_wav_roundtrip(ch):
    s = rng.randint(-32768, 32768, (777, ch)).astype(np.int16)
    d, r = decode_wav(encode_wav(s, 16000))
    assert r == 16000 and d.shape == (777, ch) and (d == s).all()


def test_wav_8bit_widening():
    body = bytes([0, 128, 255])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    wav = (b"RIFF" + struct.pack("<I", 4 + 24 + 8 + 4) + b"WAVE" +
           b"fmt " + struct.pack("<I", 16) + fmt +
           b"data" + struct.pack("<I", 3) + body + b"\x00")
    d, r = decode_wav(wav)
    assert r == 8000
    assert d.reshape(-1).tolist() == [-32768, 0, 32512]


def test_wav_leading_junk_chunk():
    s = np.arange(-50, 50, dtype=np.int16)
    b = encode_wav(s, 44100)
    junk = b"JUNK" + struct.pack("<I", 6) + b"\x00" * 6
    b2 = b[:12] + junk + b[12:]
    b2 = b2[:4] + struct.pack("<I", len(b2) - 8) + b2[8:]
    d, r = decode_wav(b2)
    assert (d.reshape(-1) == s).all()


def test_wav_rejects_non_pcm():
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # float PCM
    wav = (b"RIFF" + struct.pack("<I", 36) + b"WAVE" +
           b"fmt " + struct.pack("<I", 16) + fmt +
           b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError):
        decode_wav(wav)


# ------------------------------------------------------- dispatch/resize

def test_dispatch_routes_all_formats():
    img = decode_pixels(encode_png(np.zeros((2, 2), np.uint8)))
    assert img["kind"] == "image" and img["format"] == "png"
    gif = decode_pixels(encode_gif(np.zeros((2, 2), np.uint8),
                                   np.zeros((2, 3), np.uint8)))
    assert gif["kind"] == "image" and gif["format"] == "gif"
    wav = decode_pixels(encode_wav(np.zeros(4, np.int16)))
    assert wav["kind"] == "audio" and wav["rate"] == 44100
    from reach_spark.jpeg import encode_jpeg
    jpg = decode_pixels(encode_jpeg(np.full((8, 8), 128, np.uint8)))
    assert jpg["kind"] == "image" and jpg["format"] == "jpeg"
    assert (jpg["pixels"] == 128).all()
    with pytest.raises(ValueError):
        decode_pixels(b"\xff\xd8\xff\xe0rest")  # truncated JPEG
    with pytest.raises(ValueError):
        decode_pixels(b"garbage-bytes-here")


def test_multimodal_decode_pixels_delegates():
    from reach_spark.multimodal import decode_pixels as mm_decode
    out = mm_decode(encode_png(np.full((3, 3), 9, np.uint8)))
    assert (out["pixels"] == 9).all()


def test_resize_nearest_grid():
    a = np.arange(24, dtype=np.uint8).reshape(4, 6)
    r = resize_nearest(a, 3, 2)
    # src rows = [0*4//2, 1*4//2] = [0, 2]; cols = [0, 2, 4]
    assert (r == a[[0, 2]][:, [0, 2, 4]]).all()
    up = resize_nearest(a, 12, 8)  # upscale repeats source pixels
    assert up.shape == (8, 12)
    assert (up[::2, ::2] == a).all()


def test_resize_nearest_identity():
    a = rng.randint(0, 256, (5, 7, 3)).astype(np.uint8)
    assert (resize_nearest(a, 7, 5) == a).all()


# ------------------------------------------------- feature-query math

def test_image_feature_math_hand_computed():
    """The media_image_features reductions on a tiny known image:
    px=[0,100,255 / 10,10,10] → grad rows |100|,|155| and |0|,|0|;
    edge threshold 32 catches exactly the two first-row gradients."""
    img = np.array([[0, 100, 255], [10, 10, 10]], np.int64)
    g = np.abs(np.diff(img, axis=1))
    assert int(img.sum()) == 385
    assert int((img * img).sum()) == 100 * 100 + 255 * 255 + 3 * 100
    assert int(g.sum()) == 100 + 155
    assert int((g >= 32).sum()) == 2


def test_audio_feature_math_hand_computed():
    """ZCR counts strict sign changes via (a<0)!=(b<0): zero is
    non-negative, so [-1, 0, 1, -2] crosses at -1→0 and 1→-2."""
    fr = np.array([-1, 0, 1, -2], np.int64)
    assert int(((fr[:-1] < 0) != (fr[1:] < 0)).sum()) == 2
    assert int((fr * fr).sum()) == 1 + 0 + 1 + 4
