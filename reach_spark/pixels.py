"""REAL pixel/sample codecs over stdlib + numpy — no codec libraries.

This closes the one remaining media stub: `multimodal.decode_pixels`
previously raised because PIL/librosa are not in the container. But three
of the four routed formats are decodable with nothing beyond the standard
library and numpy, and a production media pipeline needs the *decode
semantics* (filter reconstruction, LZW table dynamics, PCM framing) far
more than it needs a specific codec binding:

- **PNG** (ISO/IEC 15948): chunk walk, zlib inflate of the IDAT stream,
  and per-row reconstruction of all five filter types (None/Sub/Up/
  Average/Paeth). Bit depth 8, color types 0 (gray), 2 (RGB),
  6 (RGBA), no interlace — the shapes a training-data crawl actually
  stores. Sub is a per-lane cumsum (vectorized); Up is one vector add;
  Average/Paeth reconstruct left-to-right (inherent data dependence).
- **GIF** (GIF89a spec): logical-screen + color tables, extension-block
  skipping, and a real LZW decoder (variable code width 3..12 bits,
  LSB-first packing, clear/EOI handling, deferred width growth).
- **WAV** (RIFF/WAVE): chunk walk to `fmt `/`data`, PCM16/PCM8 frames
  via `np.frombuffer`.
- **JPEG** (ITU T.81 baseline) lives in the sibling `jpeg.py`: marker
  walk, Annex-K Huffman entropy decode, dequant, exact separable IDCT,
  YCbCr→RGB — plus a real encoder. Progressive/subsampled/12-bit
  streams raise (handled like any other garbage row on the crawl path).

Encoders for PNG/GIF/WAV exist too — they make the driver queries
end-to-end HONEST: the Spark path synthesizes real container bytes,
decodes them back, and reduces pixels to stats; the DuckDB oracle
computes the same stats from the closed-form pixel definition and never
touches a codec. Any bug in either direction of the filter/LZW/PCM round
trip breaks the value hash.

Reference parity note: clulab/reach has no media layer (text-only
pipeline); this module implements the multimodal mandate of the build
spec, not a reference behavior.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


# ---------------------------------------------------------------- PNG

def _paeth_vec(a, b, c):
    """Paeth predictor over int32 numpy lanes (RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(b: bytes) -> np.ndarray:
    """Decode a PNG into uint8 (h, w) for grayscale or (h, w, ch).

    Supports bit depth 8, color types 0/2/4/6, interlace 0 (the layout
    every still-image training corpus uses). Raises ValueError on other
    layouts or corrupt streams — callers on the crawl path catch and
    route the row to the unknown bucket (never fail the partition).
    """
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    i, w = 8, None
    idat = []
    while i + 8 <= len(b):
        (clen,) = struct.unpack(">I", b[i:i + 4])
        ctype = b[i + 4:i + 8]
        body = b[i + 8:i + 8 + clen]
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body[:13])
            if depth != 8 or color not in _CHANNELS:
                raise ValueError(f"unsupported PNG layout {depth}/{color}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        i += 12 + clen  # len + type + body + crc
    if w is None or not idat:
        raise ValueError("truncated PNG")
    raw = zlib.decompress(b"".join(idat))
    ch = _CHANNELS[color]
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG payload length mismatch")
    out = np.empty((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        row = np.frombuffer(raw, np.uint8, stride, off + 1).astype(np.int32)
        if ftype == 0:
            cur = row
        elif ftype == 1:  # Sub: per-lane prefix sum mod 256
            cur = np.cumsum(row.reshape(w, ch), axis=0,
                            dtype=np.int64).reshape(stride) % 256
            cur = cur.astype(np.int32)
        elif ftype == 2:  # Up
            cur = (row + prev) % 256
        elif ftype == 3:  # Average: left is reconstructed → walk x
            cur = np.empty(stride, dtype=np.int32)
            left = np.zeros(ch, dtype=np.int32)
            for x in range(w):
                s = slice(x * ch, (x + 1) * ch)
                left = (row[s] + (left + prev[s]) // 2) % 256
                cur[s] = left
        elif ftype == 4:  # Paeth
            cur = np.empty(stride, dtype=np.int32)
            left = np.zeros(ch, dtype=np.int32)
            upleft = np.zeros(ch, dtype=np.int32)
            for x in range(w):
                s = slice(x * ch, (x + 1) * ch)
                up = prev[s]
                left = (row[s] + _paeth_vec(left, up, upleft)) % 256
                cur[s] = left
                upleft = up
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = cur
        prev = cur
    arr = out.astype(np.uint8)
    return arr.reshape(h, w) if ch == 1 else arr.reshape(h, w, ch)


def encode_png(arr: np.ndarray, row_filter=None) -> bytes:
    """Encode uint8 (h, w) or (h, w, ch∈{2,3,4}) as a valid PNG.

    `row_filter`: None → filter 0 everywhere; an int → that filter for
    every row; "cycle" → filter (y % 5) per row, exercising every
    reconstruction path in decode_png. Filtering at encode time uses
    only ORIGINAL pixel values, so all five filters vectorize.
    """
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        ch, color = 1, 0
        flat = arr.astype(np.int32)
    else:
        h, w, ch = arr.shape
        color = {2: 4, 3: 2, 4: 6}[ch]
        flat = arr.reshape(h, w * ch).astype(np.int32)
    stride = w * ch
    lines = []
    zero = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = (0 if row_filter is None
             else (y % 5 if row_filter == "cycle" else int(row_filter)))
        cur = flat[y]
        up = flat[y - 1] if y > 0 else zero
        left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]]) \
            if stride > ch else zero[:stride]
        upleft = np.concatenate([np.zeros(ch, np.int32), up[:-ch]]) \
            if stride > ch else zero[:stride]
        if f == 0:
            raw = cur
        elif f == 1:
            raw = (cur - left) % 256
        elif f == 2:
            raw = (cur - up) % 256
        elif f == 3:
            raw = (cur - (left + up) // 2) % 256
        else:
            raw = (cur - _paeth_vec(left, up, upleft)) % 256
        lines.append(bytes([f]) + raw.astype(np.uint8).tobytes())
    payload = zlib.compress(b"".join(lines))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + \
            struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", payload) +
            chunk(b"IEND", b""))


# ---------------------------------------------------------------- GIF LZW

def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> list:
    """GIF-variant LZW: variable width min+1..12 bits, LSB-first packing,
    clear resets the table, EOI terminates. Width grows when the next
    table slot would not fit the current width (decoder-side rule:
    next_code == 1 << width)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: dict[int, tuple] = {i: (i,) for i in range(clear)}
    next_code = eoi + 1
    val = int.from_bytes(data, "little")
    nbits = 8 * len(data)
    pos = 0
    out: list[int] = []
    prev: tuple | None = None
    while pos + width <= nbits and len(out) < max_pixels:
        code = (val >> pos) & ((1 << width) - 1)
        pos += width
        if code == clear:
            width = min_code_size + 1
            table = {i: (i,) for i in range(clear)}
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + (prev[0],)
            else:
                raise ValueError("corrupt LZW stream")
            if next_code < 4096:
                table[next_code] = prev + (entry[0],)
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
        out.extend(entry)
        prev = entry
    return out[:max_pixels]


def _lzw_encode(min_code_size: int, indices) -> bytes:
    """Real GIF LZW encoder (string table, growing code width) matched to
    _lzw_decode's width schedule: the encoder bumps its width when
    next_code == (1 << width) + 1, because the decoder registers each
    table entry one code later than the encoder does."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)
    width = min_code_size + 1
    table: dict[tuple, int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    out_bits.append((clear, width))
    w: tuple = ()
    for k in indices:
        k = int(k)
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        out_bits.append((table[w], width))
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:  # table full: reset both sides
            out_bits.append((clear, width))
            width = min_code_size + 1
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
        w = (k,)
    if w:
        out_bits.append((table[w], width))
    out_bits.append((eoi, width))
    val = 0
    pos = 0
    for code, cw in out_bits:
        val |= code << pos
        pos += cw
    return val.to_bytes((pos + 7) // 8, "little")


def decode_gif(b: bytes) -> np.ndarray:
    """Decode the FIRST frame of a GIF89a/87a into uint8 (h, w, 3) via the
    global or local color table. Interlaced images unsupported (raises);
    extension blocks are skipped per spec."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", b[6:13])
    i = 13
    palette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        palette = np.frombuffer(b, np.uint8, 3 * n, i).reshape(n, 3)
        i += 3 * n
    while i < len(b):
        blk = b[i]
        if blk == 0x21:  # extension: label byte then sub-blocks
            i += 2
            while i < len(b) and b[i] != 0:
                i += 1 + b[i]
            i += 1
        elif blk == 0x2C:  # image descriptor
            _l, _t, w, h, iflags = struct.unpack("<HHHHB", b[i + 1:i + 10])
            i += 10
            if iflags & 0x40:
                raise ValueError("interlaced GIF unsupported")
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                palette = np.frombuffer(b, np.uint8, 3 * n, i).reshape(n, 3)
                i += 3 * n
            if palette is None:
                raise ValueError("GIF without color table")
            min_code = b[i]
            i += 1
            data = bytearray()
            while i < len(b) and b[i] != 0:
                ln = b[i]
                data += b[i + 1:i + 1 + ln]
                i += 1 + ln
            idx = _lzw_decode(min_code, bytes(data), w * h)
            if len(idx) < w * h:
                raise ValueError("short GIF pixel stream")
            return palette[np.asarray(idx, np.int32)].reshape(h, w, 3)
        elif blk == 0x3B:
            break
        else:
            raise ValueError(f"bad GIF block 0x{blk:02x}")
    raise ValueError("GIF has no image block")


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Encode one frame (uint8 index array (h, w)) + palette (n≤256, 3)
    as a GIF89a with a global color table and real LZW compression."""
    indices = np.asarray(indices, np.uint8)
    h, w = indices.shape
    n = len(palette)
    bits = max(1, (int(n) - 1).bit_length())
    table = np.zeros((2 ** bits, 3), np.uint8)
    table[:n] = palette
    min_code = max(2, bits)
    data = _lzw_encode(min_code, indices.reshape(-1))
    blocks = bytearray()
    for off in range(0, len(data), 255):
        part = data[off:off + 255]
        blocks += bytes([len(part)]) + part
    return (b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
            + table.tobytes()
            + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
            + bytes([min_code]) + bytes(blocks) + b"\x00" + b"\x3b")


# ---------------------------------------------------------------- WAV

def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM WAV → (samples (n, channels) int16, sample_rate).
    8-bit PCM is widened to int16 ((x-128)<<8); other encodings raise."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    i = 12
    fmt = None
    while i + 8 <= len(b):
        cid = b[i:i + 4]
        (clen,) = struct.unpack("<I", b[i + 4:i + 8])
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", b[i + 8:i + 24])
        elif cid == b"data":
            if fmt is None:
                raise ValueError("WAV data before fmt")
            audio_fmt, channels, rate, _, _, depth = fmt
            if audio_fmt != 1:
                raise ValueError("non-PCM WAV unsupported")
            body = b[i + 8:i + 8 + clen]
            if depth == 16:
                s = np.frombuffer(body, "<i2")
            elif depth == 8:
                s = (np.frombuffer(body, np.uint8).astype(np.int16)
                     - 128) << 8
            else:
                raise ValueError(f"PCM depth {depth} unsupported")
            return s.reshape(-1, channels), rate
        i += 8 + clen + (clen & 1)
    raise ValueError("WAV has no data chunk")


def encode_wav(samples: np.ndarray, rate: int = 44100) -> bytes:
    """Encode int16 samples (n,) or (n, channels) as PCM16 RIFF/WAVE."""
    samples = np.asarray(samples, "<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    channels = samples.shape[1]
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt +
            b"data" + struct.pack("<I", len(data)) + data +
            (b"\x00" if len(data) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ------------------------------------------------------------ dispatch

def decode_pixels(media_bytes: bytes) -> dict:
    """REAL pixel/sample decode dispatch (replaces the round-2/3 stub).

    Returns {"kind": "image", "format", "pixels": uint8 array} for
    PNG/GIF/JPEG, {"kind": "audio", "format": "wav", "samples": int16
    (n, ch), "rate"} for WAV. Raises ValueError on garbage or
    non-baseline layouts — crawl callers catch per row.
    """
    if media_bytes[:8] == _PNG_SIG:
        return {"kind": "image", "format": "png",
                "pixels": decode_png(media_bytes)}
    if media_bytes[:6] in (b"GIF87a", b"GIF89a"):
        return {"kind": "image", "format": "gif",
                "pixels": decode_gif(media_bytes)}
    if media_bytes[:4] == b"RIFF" and media_bytes[8:12] == b"WAVE":
        samples, rate = decode_wav(media_bytes)
        return {"kind": "audio", "format": "wav", "samples": samples,
                "rate": rate}
    if media_bytes[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg
        return {"kind": "image", "format": "jpeg",
                "pixels": decode_jpeg(media_bytes)}
    raise ValueError("unrecognized media payload")


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample: src index = floor(i*in/out)
    — integer arithmetic only, so the DuckDB oracle states the exact same
    sampling grid. (Production quality resampling — area/bicubic — plugs
    into the same slot; nearest is the honest deterministic baseline.)"""
    h, w = arr.shape[:2]
    ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return arr[ys][:, xs]
