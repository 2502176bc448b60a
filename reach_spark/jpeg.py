"""Baseline JPEG (ITU T.81) codec — stdlib + numpy, no codec libraries.

Completes the media codec tier (see pixels.py for PNG/GIF/WAV): baseline
sequential DCT, Huffman entropy coding, 8-bit precision. Decoder supports
grayscale (1 component) and 3-component 4:4:4 interleaved scans — the
shapes our encoder emits and the common web-crawl baseline layout;
progressive, subsampled, arithmetic-coded, and restart-interval streams
raise ValueError (crawl callers catch per row and route to the unknown
bucket, exactly like the other codecs).

Determinism note (drives the driver-query oracle): JPEG is lossy, but
DECODE of a given byte stream is deterministic, and for DC-only blocks
(solid 8×8 content) every step is exact integer arithmetic in disguise —
FDCT DC = 8·(v−128), quantized with round-half-up, dequantized, and
IDCT of a DC-only block is the flat value dc/8. The quantizer adds a 1e-9
nudge before floor so the half-integer boundary cases (v−128 odd with
Q=16) round identically to the pure-integer formula the DuckDB oracle
states, immune to the ~1e-13 float noise of the matrix FDCT. AC
coefficients of a solid block quantize to 0 at any noise level.

Tables: the example quantization + Huffman tables of ITU T.81 Annex K
(the de-facto defaults every baseline encoder ships).
"""

from __future__ import annotations

import struct

import numpy as np

# ---- Annex K tables --------------------------------------------------

QTABLE_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.int32).reshape(8, 8)

QTABLE_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.int32).reshape(8, 8)

# (bits[1..16], values) per Annex K
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    np.int32)

# Orthonormal DCT-II basis: A @ block @ A.T = coefficients.
_A = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = np.sqrt(0.125) if _u == 0 else 0.5
        _A[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)
del _u, _x, _c


def _quantize(coef: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Round-half-away-from-zero with a 1e-9 nudge so half-boundary DCs
    (exact .5 in true arithmetic) round UP regardless of ~1e-13 FDCT
    float noise — matching the oracle's integer (|x|+q/2)//q formula."""
    a = np.abs(coef) / q + 0.5 + 1e-9
    return (np.sign(coef) * np.floor(a)).astype(np.int32)


# ---- Huffman ---------------------------------------------------------

def _build_codes(bits, values):
    """(bits, huffval) → {symbol: (code, length)} per T.81 Annex C."""
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_table(bits, values):
    """(bits, huffval) → {(length, code): symbol}."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-pad per spec
        return bytes(self.buf)


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self):
        while self.n <= 24 and self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0:
                    self.pos += 1
                else:  # marker: stop feeding (EOI etc.)
                    self.pos = len(self.data)
                    break
            self.acc = (self.acc << 8) | b
            self.n += 8

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill()
        if self.n < k:
            raise ValueError("truncated JPEG entropy stream")
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        return v

    def huff(self, table) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("bad Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.12: map s-bit magnitude to signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# ---- encoder ---------------------------------------------------------

def encode_jpeg(arr: np.ndarray) -> bytes:
    """Encode uint8 (h, w) grayscale or (h, w, 3) RGB as baseline JPEG
    (4:4:4, Annex K tables). Dimensions are padded to multiples of 8 by
    edge replication; SOF records the true size."""
    arr = np.asarray(arr, np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        planes = [arr.astype(np.float64) - 128.0]
        qids, hids = [0], [0]
    else:
        r = arr[..., 0].astype(np.float64)
        g = arr[..., 1].astype(np.float64)
        b = arr[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qids, hids = [0, 1, 1], [0, 1, 1]
    qts = [QTABLE_LUMA, QTABLE_CHROMA]
    dc_codes = [_build_codes(*DC_LUMA), _build_codes(*DC_CHROMA)]
    ac_codes = [_build_codes(*AC_LUMA), _build_codes(*AC_CHROMA)]
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = []
    for p in planes:
        pp = np.empty((ph, pw))
        pp[:h, :w] = p
        pp[h:, :w] = p[-1:, :]
        pp[:, w:] = pp[:, w - 1:w]
        padded.append(pp)
    bw = _BitWriter()
    pred = [0] * len(planes)
    zz = ZIGZAG
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for ci, p in enumerate(padded):
                block = p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                coef = _A @ block @ _A.T
                q = _quantize(coef, qts[qids[ci]]).reshape(-1)[zz]
                diff = int(q[0]) - pred[ci]
                pred[ci] = int(q[0])
                s = _category(diff)
                c, ln = dc_codes[hids[ci]][s]
                bw.write(c, ln)
                if s:
                    bw.write(diff if diff >= 0 else
                             diff + (1 << s) - 1, s)
                run = 0
                last_nz = int(np.max(np.nonzero(q)[0])) if q.any() else 0
                for i in range(1, 64):
                    v = int(q[i])
                    if v == 0:
                        if i > last_nz:
                            break
                        run += 1
                        if run == 16:
                            c, ln = ac_codes[hids[ci]][0xF0]  # ZRL
                            bw.write(c, ln)
                            run = 0
                        continue
                    s = _category(v)
                    c, ln = ac_codes[hids[ci]][(run << 4) | s]
                    bw.write(c, ln)
                    bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last_nz < 63:
                    c, ln = ac_codes[hids[ci]][0x00]  # EOB
                    bw.write(c, ln)
    data = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) \
            + body

    out = bytearray(b"\xff\xd8")
    nq = 1 if gray else 2
    for qi in range(nq):
        zzq = qts[qi].reshape(-1)[zz].astype(np.uint8).tobytes()
        out += seg(0xDB, bytes([qi]) + zzq)
    ncomp = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, qids[ci]])
    out += seg(0xC0, sof)
    hts = ([(0x00, DC_LUMA), (0x10, AC_LUMA)] if gray else
           [(0x00, DC_LUMA), (0x10, AC_LUMA),
            (0x01, DC_CHROMA), (0x11, AC_CHROMA)])
    for tid, (bits, vals) in hts:
        out += seg(0xC4, bytes([tid]) + bytes(bits) + bytes(vals))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, (hids[ci] << 4) | hids[ci]])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += data + b"\xff\xd9"
    return bytes(out)


# ---- decoder ---------------------------------------------------------

def decode_jpeg(b: bytes) -> np.ndarray:
    """Decode a baseline JPEG → uint8 (h, w) grayscale or (h, w, 3) RGB.
    Supports 1-component and 3-component 4:4:4 sequential scans with
    8-bit precision; anything else (progressive SOF2, subsampling,
    restart intervals, 12-bit, arithmetic coding) raises ValueError."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    i = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple, dict] = {}
    comps = None
    h = w = 0
    scan = None
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = b[i + 1]
        if marker == 0xD9:
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        (seglen,) = struct.unpack(">H", b[i + 2:i + 4])
        body = b[i + 4:i + 2 + seglen]
        if marker == 0xDB:
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, np.int32)
                tbl[ZIGZAG] = np.frombuffer(body, np.uint8, 64, j + 1)
                qts[tq] = tbl.reshape(8, 8)
                j += 65
        elif marker == 0xC4:
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1:j + 17])
                nval = sum(bits)
                vals = list(body[j + 17:j + 17 + nval])
                huff[(tc, th)] = _build_decode_table(bits, vals)
                j += 17 + nval
        elif marker == 0xC0 or marker == 0xC1:
            if body[0] != 8:
                raise ValueError("non-8-bit JPEG unsupported")
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = body[6 + 3 * ci:9 + 3 * ci]
                if samp != 0x11:
                    raise ValueError("subsampled JPEG unsupported")
                comps.append({"id": cid, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xDD:
            if struct.unpack(">H", body)[0] != 0:
                raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:
            ns = body[0]
            sel = {}
            for ci in range(ns):
                cid, tids = body[1 + 2 * ci], body[2 + 2 * ci]
                sel[cid] = (tids >> 4, tids & 0x0F)
            scan = (sel, i + 2 + seglen)
            break
        i += 2 + seglen
    if comps is None or scan is None:
        raise ValueError("truncated JPEG")
    sel, data_off = scan
    br = _BitReader(b[data_off:])
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    planes = [np.zeros((ph, pw)) for _ in comps]
    pred = [0] * len(comps)
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for ci, comp in enumerate(comps):
                dc_t, ac_t = sel[comp["id"]]
                zq = np.zeros(64, np.int32)
                s = br.huff(huff[(0, dc_t)])
                diff = _extend(br.read(s), s)
                pred[ci] += diff
                zq[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = br.huff(huff[(1, ac_t)])
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("AC index overflow")
                    zq[k] = _extend(br.read(s), s)
                    k += 1
                coef = np.zeros(64, np.float64)
                coef[ZIGZAG] = zq * qts[comp["tq"]].reshape(-1)[ZIGZAG]
                block = _A.T @ coef.reshape(8, 8) @ _A
                planes[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = block
    planes = [p[:h, :w] + 128.0 for p in planes]
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, bl], axis=-1)), 0,
                   255).astype(np.uint8)
