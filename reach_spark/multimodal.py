"""Multimodal column handling: media spans as opaque refs/binary with
typed metadata; decode / feature-extract as Arrow-batched pandas UDFs.

Two decode tiers:

- **Header-level decode is REAL** (`parse_media_header` /
  `media_header_meta`): PNG/GIF/JPEG/WAV container headers parsed with
  stdlib `struct` over the binary column — the cheap routing stage a
  100 TB media crawl runs on every blob before any pixel work. Tested
  against real format bytes in tests/test_multimodal.py.
- **Pixel/sample decode is REAL for all four routed formats**
  (`pixels.py`: zlib inflate + all five PNG filter reconstructions, a
  real GIF LZW decoder, PCM frame decode; `jpeg.py`: baseline T.81
  Huffman + IDCT both directions). The `media_pixel_stats` /
  `media_audio_stats` / `media_jpeg_stats` / `media_resize_pixels`
  driver queries run the encode→decode round trip on real container
  bytes against closed-form DuckDB oracles that never touch a codec.

The md5-derived `_fake_decode` remains behind `media_decode_meta` /
`media_feature_extract` as the documented stand-in for a *model*
(CNN/CLIP featurizer) — those two queries exercise the metadata/embedding
plumbing, not a codec.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

QUERIES: dict[str, tuple] = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = (fn, oracle)
        return fn
    return deco


MEDIA_META = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("media_kind", T.StringType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("n_frames", T.IntegerType(), False),
])


def decode_pixels(media_bytes: bytes) -> dict:
    """Pixel/sample decoder entry point — REAL for PNG/GIF/JPEG/WAV since
    round 4 (reach_spark.pixels + reach_spark.jpeg: stdlib zlib/struct +
    numpy, no codec libraries)."""
    from .pixels import decode_pixels as _real
    return _real(media_bytes)


# kept under the old name for callers/tests written against round 2
decode_real = decode_pixels


def parse_media_header(b: bytes | None) -> tuple[str, int, int, int]:
    """REAL container-header decode — pure stdlib byte parsing, no codec
    libraries. Returns (format, width, height, n_channels_or_frames); all
    zeros with format 'unknown' for unrecognized/truncated payloads
    (never raises — a 100 TB media crawl always contains garbage rows).

    Formats (the header layouts are public file-format specs):
      PNG  — 8-byte signature, IHDR width/height big-endian u32 at 16/20.
      GIF  — 'GIF87a'/'GIF89a', logical-screen w/h little-endian u16 at 6/8.
      JPEG — marker scan to SOF0/1/2 (baseline/extended/progressive),
             height/width big-endian u16 at +5/+7 in the SOF segment.
      WAV  — 'RIFF'+'WAVE', channels LE u16 at 22, sample rate LE u32 at 24
             (returned in the third slot as 'frames' per second analog).

    This is the routing stage a real multimodal pipeline runs on every
    blob BEFORE any expensive pixel decode: cheap, branchy, pure-Python —
    but batch-amortized under mapInPandas (Arrow transfer, one Python
    roundtrip per batch, not per row).
    """
    import struct
    if not b or len(b) < 12:
        return ("unknown", 0, 0, 0)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return ("png", w, h, 1)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        # frame count = number of image-descriptor separators; exact
        # counting needs full block walking, so report at least 1
        return ("gif", w, h, max(1, b.count(b"\x00\x2c")))
    if b[:2] == b"\xff\xd8":  # JPEG SOI; scan segment markers
        i = 2
        while i + 9 < len(b) and b[i] == 0xFF:
            # fill bytes: any run of 0xFF before a marker is padding
            # (ITU T.81 §B.1.1.2) — consume it one byte at a time
            if b[i + 1] == 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                h, w = struct.unpack(">HH", b[i + 5:i + 9])
                return ("jpeg", w, h, b[i + 9] if i + 9 < len(b) else 0)
            # standalone (no length word): SOI, RSTn, TEM, EOI
            if marker in (0xD8, 0x01, 0xD9) or 0xD0 <= marker <= 0xD7:
                if marker == 0xD9:  # EOI — no SOF seen
                    break
                i += 2
                continue
            if i + 4 > len(b):
                break
            seglen = struct.unpack(">H", b[i + 2:i + 4])[0]
            i += 2 + seglen
        return ("jpeg", 0, 0, 0)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE" and len(b) >= 12:
        # walk RIFF chunks to the 'fmt ' chunk — encoders commonly emit a
        # leading JUNK/LIST chunk, so fixed offsets 22/24 are wrong in the
        # wild; unparseable chunk sequences fall through to 'unknown'
        i = 12
        while i + 8 <= len(b):
            cid = b[i:i + 4]
            (clen,) = struct.unpack("<I", b[i + 4:i + 8])
            if cid == b"fmt " and i + 16 <= len(b):
                channels = struct.unpack("<H", b[i + 10:i + 12])[0]
                rate = struct.unpack("<I", b[i + 12:i + 16])[0]
                return ("wav", channels, 0, rate)
            i += 8 + clen + (clen & 1)  # chunks are word-aligned
        return ("unknown", 0, 0, 0)
    return ("unknown", 0, 0, 0)


MEDIA_HEADER = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("format", T.StringType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("extra", T.IntegerType(), False),
])


def media_header_meta(media: DataFrame) -> DataFrame:
    """Header-decode a `(doc_id long, media binary)` DataFrame into typed
    metadata via parse_media_header — the REAL decode path (mapInPandas,
    Arrow-batched; one Python roundtrip per batch). Unrecognized payloads
    yield format='unknown' rows rather than failing the partition."""
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_media_header(x) for x in pdf["media"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "format": [p[0] for p in parsed],
                "width": [p[1] for p in parsed],
                "height": [p[2] for p in parsed],
                "extra": [p[3] for p in parsed],
            })
    return media.mapInPandas(decode, schema=MEDIA_HEADER)


def _fake_decode(ref: str) -> tuple[int, int, int]:
    """Deterministic fake decode: dimensions derived from md5(ref) hex
    nibbles — identical arithmetic exists in the SQL oracle."""
    h = hashlib.md5(ref.encode()).hexdigest()
    hexmap = "0123456789abcdef"
    w = 64 * (1 + hexmap.index(h[0]))
    hgt = 64 * (1 + hexmap.index(h[1]))
    frames = 1 + hexmap.index(h[2])
    return w, hgt, frames


@_register("media_decode_meta", """
WITH m AS (
  SELECT doc_id,
         'img://' || doc_id || '/' || (n_chars % 3) AS media_ref,
         CASE WHEN n_chars % 3 = 0 THEN 'image'
              WHEN n_chars % 3 = 1 THEN 'audio' ELSE 'video' END AS media_kind
  FROM documents)
SELECT doc_id, media_ref, media_kind,
  64 * strpos('0123456789abcdef', substr(md5(media_ref), 1, 1)) AS width,
  64 * strpos('0123456789abcdef', substr(md5(media_ref), 2, 1)) AS height,
  strpos('0123456789abcdef', substr(md5(media_ref), 3, 1)) AS n_frames
FROM m
""")
def media_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = docs.select(
        "doc_id",
        F.concat(F.lit("img://"), F.col("doc_id").cast("string"),
                 F.lit("/"), (F.col("n_chars") % 3).cast("string"))
         .alias("media_ref"),
        F.when(F.col("n_chars") % 3 == 0, "image")
         .when(F.col("n_chars") % 3 == 1, "audio")
         .otherwise("video").alias("media_kind"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_fake_decode(r) for r in pdf["media_ref"]]
            pdf = pdf.copy()
            pdf["width"] = [d[0] for d in dims]
            pdf["height"] = [d[1] for d in dims]
            pdf["n_frames"] = [d[2] for d in dims]
            yield pdf[["doc_id", "media_ref", "media_kind", "width",
                       "height", "n_frames"]]

    out = media.mapInPandas(decode, schema=MEDIA_META)
    return out.select("doc_id", "media_ref", "media_kind",
                      F.col("width").cast("bigint").alias("width"),
                      F.col("height").cast("bigint").alias("height"),
                      F.col("n_frames").cast("bigint").alias("n_frames"))


_FEAT_DIM = 8


@_register("media_feature_extract", f"""
WITH m AS (
  SELECT doc_id,
         'img://' || doc_id || '/' || (n_chars % 3) AS media_ref
  FROM documents)
SELECT doc_id, media_ref, d AS dim_idx,
       round((strpos('0123456789abcdef',
                     substr(md5(media_ref), d + 1, 1)) - 1) / 15.0, 6)
         AS value
FROM m, unnest(range(0, {_FEAT_DIM})) AS t(d)
""")
def media_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction plumbing: one {_FEAT_DIM}-dim embedding row per
    media ref, exploded to (doc_id, media_ref, dim_idx, value) for exact
    cross-engine comparison. The featurizer itself is the documented
    deterministic fake (md5-nibble / 15 → [0,1] floats) standing in for a
    CNN/CLIP encoder — in production the same mapInPandas batch loop calls
    the model on decoded pixels; the schema, batching, and downstream
    compatibility (the ANN/embedding ops consume `array<double>`) are the
    real contract."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = docs.select(
        "doc_id",
        F.concat(F.lit("img://"), F.col("doc_id").cast("string"),
                 F.lit("/"), (F.col("n_chars") % 3).cast("string"))
         .alias("media_ref"))

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hexmap = "0123456789abcdef"
        for pdf in batches:
            rows = []
            for doc_id, ref in zip(pdf["doc_id"], pdf["media_ref"]):
                h = hashlib.md5(ref.encode()).hexdigest()
                for d in range(_FEAT_DIM):
                    rows.append((doc_id, ref, d,
                                 round(hexmap.index(h[d]) / 15.0, 6)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "media_ref", "dim_idx", "value"])

    return media.mapInPandas(
        feats, schema="doc_id long, media_ref string, dim_idx long, "
                      "value double")


def media_resize_plan(media: DataFrame, target_w: int,
                      target_h: int) -> DataFrame:
    """Resize planning over a `(doc_id, media binary)` DataFrame: REAL
    header parse (parse_media_header) + REAL aspect-fit arithmetic — the
    output dims and scale factors a resampler would use to fit each image
    inside (target_w, target_h) without distortion. The pixel resampling
    itself is the stubbed step (decode_pixels); everything up to handing
    (bytes, out_w, out_h) to a codec is the production path.

    Non-image payloads (wav/unknown/truncated) yield out_w = out_h = 0 —
    the skip signal, never a partition failure.
    """
    def plan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                fmt, w, h, _ = parse_media_header(blob)
                if fmt in ("png", "gif", "jpeg") and w > 0 and h > 0:
                    scale = min(target_w / w, target_h / h)
                    ow = max(1, int(w * scale))
                    oh = max(1, int(h * scale))
                    rows.append((doc_id, fmt, w, h, ow, oh,
                                 round(scale, 6)))
                else:
                    rows.append((doc_id, fmt, w, h, 0, 0, 0.0))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "format", "width", "height", "out_w", "out_h",
                "scale"])

    return media.mapInPandas(
        plan, schema="doc_id long, format string, width int, height int, "
                     "out_w int, out_h int, scale double")


def _synth_media(doc_id: int) -> bytes:
    """Deterministic real-format bytes for the media_resize_plan driver
    query: PNG / GIF / JPEG (with marker fill bytes) / WAV (half with a
    leading JUNK chunk, the encoder layout the chunk walker exists for) /
    garbage, keyed on doc_id so the DuckDB oracle can mirror the parsed
    dimensions with pure arithmetic."""
    import struct
    k = doc_id % 7
    w = 100 + (doc_id * 37) % 1900
    h = 100 + (doc_id * 53) % 1900
    if k == 0:
        fmt = (b"fmt " + struct.pack("<I", 16) +
               struct.pack("<HHI", 1, 2, 44100) + b"\x00" * 8)
        junk = (b"JUNK" + struct.pack("<I", 4) + b"\x00" * 4
                if (doc_id // 7) % 2 == 1 else b"")
        body = b"WAVE" + junk + fmt
        return b"RIFF" + struct.pack("<I", len(body)) + body
    if k == 1:
        # pad past the 12-byte minimum the parser's truncation guard uses
        return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x3b"
    if k == 3:
        return b"notamediafile123"
    if k == 5:
        # SOI, fill byte, APP0(len 4), SOF0(len 11): h/w at +5/+7
        return (b"\xff\xd8\xff" + b"\xff\xe0" + struct.pack(">H", 4) +
                b"\x00\x00" + b"\xff\xc0" + struct.pack(">H", 11) +
                b"\x08" + struct.pack(">HH", h, w) + b"\x03")
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" +
            struct.pack(">II", w, h))


_RESIZE_TGT = 512

_RESIZE_PLAN_SQL = f"""
WITH m AS (
  SELECT doc_id, doc_id % 7 AS k,
         100 + (doc_id * 37) % 1900 AS w,
         100 + (doc_id * 53) % 1900 AS h
  FROM documents),
parsed AS (
  SELECT doc_id,
         CASE WHEN k = 0 THEN 'wav' WHEN k = 1 THEN 'gif'
              WHEN k = 3 THEN 'unknown' WHEN k = 5 THEN 'jpeg'
              ELSE 'png' END AS format,
         CASE WHEN k = 0 THEN 2 WHEN k = 3 THEN 0 ELSE w END AS width,
         CASE WHEN k IN (0, 3) THEN 0 ELSE h END AS height
  FROM m),
plan AS (
  SELECT doc_id, format, width, height,
         CASE WHEN format IN ('png', 'gif', 'jpeg')
                   AND width > 0 AND height > 0
              THEN least({_RESIZE_TGT}.0 / width, {_RESIZE_TGT}.0 / height)
              ELSE 0.0 END AS s
  FROM parsed)
SELECT CAST(doc_id AS BIGINT) AS doc_id, format,
       CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
       CASE WHEN s > 0
            THEN greatest(1, CAST(floor(width * s) AS BIGINT))
            ELSE 0 END AS out_w,
       CASE WHEN s > 0
            THEN greatest(1, CAST(floor(height * s) AS BIGINT))
            ELSE 0 END AS out_h,
       round(s, 6) AS scale
FROM plan
"""


@_register("media_resize_plan", _RESIZE_PLAN_SQL)
def media_resize_plan_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver row for the resize planner: synthesize real container bytes
    per doc (mapInPandas), run media_resize_plan — REAL header parse +
    REAL aspect-fit math over them — and return the exploded plan. The
    byte synthesis is the only fake; every parse branch (PNG/GIF/JPEG
    fill-byte scan/WAV chunk walk/garbage skip) runs on real bytes."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
                .select("doc_id")

    def mk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media": [_synth_media(int(d)) for d in pdf["doc_id"]]})

    media = docs.mapInPandas(mk, schema="doc_id long, media binary")
    plan = media_resize_plan(media, _RESIZE_TGT, _RESIZE_TGT)
    return plan.select(
        "doc_id", "format",
        F.col("width").cast("bigint").alias("width"),
        F.col("height").cast("bigint").alias("height"),
        F.col("out_w").cast("bigint").alias("out_w"),
        F.col("out_h").cast("bigint").alias("out_h"),
        "scale")


def pair_media_captions(docs: DataFrame) -> DataFrame:
    """Caption pairing over the interleaved spans: each media span gets the
    text of its NEAREST PRECEDING text span in document order (the standard
    caption-extraction heuristic for image-text training pairs mined from
    interleaved documents).

    Pure column ops: explode the span array, one running `last(text,
    ignorenulls)` window per document ordered by span offset, filter to
    media spans. No join; the window partitions on doc_id, so the shuffle
    is the one doc-keyed exchange and per-partition state is a single
    carried string — the same carry-forward shape as the as-of join
    (relational.asof_latest_order). A media span with no preceding text
    span keeps caption NULL (callers decide whether to drop or
    back-fill).

    Output: (doc_id, media_ref, caption).
    """
    from pyspark.sql import Window
    sp = docs.select("doc_id", F.explode("spans").alias("s"))
    w = (Window.partitionBy("doc_id").orderBy(F.col("s.offset"))
         .rowsBetween(Window.unboundedPreceding, 0))
    cap = sp.withColumn(
        "caption",
        F.last(F.when(F.col("s.kind") == "text", F.col("s.text")),
               ignorenulls=True).over(w))
    return (cap.where(F.col("s.kind") == "media")
            .select("doc_id", F.col("s.media_ref").alias("media_ref"),
                    "caption"))


def _synth_pixel_media(doc_id: int) -> bytes:
    """Deterministic REAL container bytes with closed-form pixel content,
    keyed on doc_id: k=0 → grayscale PNG, k=1 → RGB PNG (both encoded
    with the cycling row filter so all five PNG filter reconstructions
    run), k=2 → GIF whose LZW stream the real encoder produced. Pixel
    value at flat index i is (doc_id*31 + i) % 256 (for GIF: the palette
    index at pixel q is (doc_id*31 + q) % 256 and palette[j] =
    (j, 2j%256, 3j%256)) — pure arithmetic the DuckDB oracle restates
    without ever touching a codec."""
    import numpy as np

    from .pixels import encode_gif, encode_png
    k = doc_id % 3
    w = 4 + doc_id % 13
    h = 4 + (doc_id * 3) % 11
    if k == 0:
        flat = (doc_id * 31 + np.arange(w * h, dtype=np.int64)) % 256
        return encode_png(flat.astype(np.uint8).reshape(h, w), "cycle")
    if k == 1:
        flat = (doc_id * 31 + np.arange(w * h * 3, dtype=np.int64)) % 256
        return encode_png(flat.astype(np.uint8).reshape(h, w, 3), "cycle")
    idx = ((doc_id * 31 + np.arange(w * h, dtype=np.int64)) % 256) \
        .astype(np.uint8).reshape(h, w)
    j = np.arange(256, dtype=np.int64)
    pal = np.stack([j, (2 * j) % 256, (3 * j) % 256], axis=1) \
        .astype(np.uint8)
    return encode_gif(idx, pal)


_PIXEL_STATS_SQL = """
WITH m AS (
  SELECT doc_id, doc_id % 3 AS k,
         4 + doc_id % 13 AS w, 4 + (doc_id * 3) % 11 AS h
  FROM documents),
gray AS (
  SELECT doc_id, 'png' AS format, w, h, 1 AS channels,
         sum((doc_id*31 + i) % 256) AS px_sum,
         sum((i+1) * ((doc_id*31 + i) % 256)) AS px_check
  FROM m, unnest(range(0, w*h)) AS t(i)
  WHERE k = 0 GROUP BY doc_id, w, h),
rgb AS (
  SELECT doc_id, 'png' AS format, w, h, 3 AS channels,
         sum((doc_id*31 + i) % 256) AS px_sum,
         sum((i+1) * ((doc_id*31 + i) % 256)) AS px_check
  FROM m, unnest(range(0, w*h*3)) AS t(i)
  WHERE k = 1 GROUP BY doc_id, w, h),
gif AS (
  SELECT doc_id, 'gif' AS format, w, h, 3 AS channels,
         sum(j + (2*j) % 256 + (3*j) % 256) AS px_sum,
         sum((3*q+1)*j + (3*q+2)*((2*j) % 256)
             + (3*q+3)*((3*j) % 256)) AS px_check
  FROM (SELECT doc_id, w, h, q, (doc_id*31 + q) % 256 AS j
        FROM m, unnest(range(0, w*h)) AS t(q) WHERE k = 2)
  GROUP BY doc_id, w, h),
u AS (SELECT * FROM gray UNION ALL SELECT * FROM rgb
      UNION ALL SELECT * FROM gif)
SELECT CAST(doc_id AS BIGINT) AS doc_id, format,
       CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       CAST(channels AS BIGINT) AS channels,
       CAST(px_sum AS BIGINT) AS px_sum,
       CAST(px_check AS BIGINT) AS px_check
FROM u
"""


@_register("media_pixel_stats", _PIXEL_STATS_SQL)
def media_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel decode, end to end: synthesize real PNG (gray + RGB,
    cycling row filters) and GIF (real LZW) container bytes per doc,
    decode them back with reach_spark.pixels (zlib inflate + the five
    filter reconstructions / LZW table dynamics), and reduce the pixel
    array to (sum, position-weighted checksum). The DuckDB oracle states
    the same stats from the closed-form pixel definition — it never runs
    a codec, so any defect in EITHER direction of the encode/decode round
    trip breaks the value hash. Garbage rows would yield no row (crawl
    callers catch ValueError per row; here every synthesized blob is
    well-formed by construction)."""
    import numpy as np

    from .pixels import decode_pixels as _decode
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
                .select("doc_id")

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                out = _decode(_synth_pixel_media(d))
                px = out["pixels"]
                if px.ndim == 2:
                    h, w = px.shape
                    ch = 1
                else:
                    h, w, ch = px.shape
                flat = px.reshape(-1).astype(np.int64)
                rows.append((d, out["format"], w, h, ch, int(flat.sum()),
                             int(((np.arange(flat.size, dtype=np.int64)
                                   + 1) * flat).sum())))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "format", "width", "height", "channels",
                "px_sum", "px_check"])

    return docs.mapInPandas(
        stats, schema="doc_id long, format string, width long, "
                      "height long, channels long, px_sum long, "
                      "px_check long")


_AUDIO_STATS_SQL = """
WITH m AS (
  SELECT doc_id, 50 + doc_id % 40 AS n_frames,
         8000 + 100 * (doc_id % 50) AS rate
  FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_frames AS BIGINT) AS n_frames,
       CAST(2 AS BIGINT) AS channels,
       CAST(rate AS BIGINT) AS rate,
       CAST(sum((doc_id*7 + i*13) % 65536 - 32768) AS BIGINT) AS s_sum,
       CAST(sum((i+1) * ((doc_id*7 + i*13) % 65536 - 32768)) AS BIGINT)
         AS s_check
FROM m, unnest(range(0, n_frames*2)) AS t(i)
GROUP BY doc_id, n_frames, rate
"""


@_register("media_audio_stats", _AUDIO_STATS_SQL)
def media_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PCM decode, end to end: synthesize a stereo PCM16 WAV per doc
    (real RIFF/fmt/data chunks via pixels.encode_wav), decode it back
    (chunk walk + frombuffer), and reduce samples to (sum,
    position-weighted checksum). Oracle = the closed-form sample
    definition s_i = (doc_id*7 + 13i) % 65536 - 32768, codec-free."""
    import numpy as np

    from .pixels import decode_wav, encode_wav
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
                .select("doc_id")

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = 50 + d % 40
                rate = 8000 + 100 * (d % 50)
                s = ((d * 7 + 13 * np.arange(n * 2, dtype=np.int64))
                     % 65536 - 32768).astype(np.int16)
                dec, drate = decode_wav(encode_wav(s.reshape(n, 2), rate))
                flat = dec.reshape(-1).astype(np.int64)
                rows.append((d, dec.shape[0], dec.shape[1], drate,
                             int(flat.sum()),
                             int(((np.arange(flat.size, dtype=np.int64)
                                   + 1) * flat).sum())))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_frames", "channels", "rate", "s_sum",
                "s_check"])

    return docs.mapInPandas(
        stats, schema="doc_id long, n_frames long, channels long, "
                      "rate long, s_sum long, s_check long")


_JPEG_STATS_SQL = """
WITH m AS (
  SELECT doc_id, 8 * (1 + doc_id % 3) AS w, 8 * (1 + (doc_id // 3) % 2) AS h
  FROM documents),
px AS (
  SELECT doc_id, w, h, i,
         (doc_id*17 + ((i // w) // 8 * (w // 8) + (i % w) // 8) * 29)
           % 256 AS v
  FROM m, unnest(range(0, w*h)) AS t(i)),
dec AS (
  SELECT doc_id, w, h, i,
         least(255, greatest(0,
           2 * CAST(sign(v - 128) AS BIGINT) * ((abs(v - 128) + 1) // 2)
           + 128)) AS p
  FROM px)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       CAST(sum(p) AS BIGINT) AS px_sum,
       CAST(sum((i+1) * p) AS BIGINT) AS px_check
FROM dec GROUP BY doc_id, w, h
"""


@_register("media_jpeg_stats", _JPEG_STATS_SQL)
def media_jpeg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode, end to end: per doc, encode a grayscale
    JPEG of (doc-keyed dims, multiple 8×8 blocks) whose block b is the
    solid value (doc_id*17 + 29b) % 256, decode it back through the full
    marker-walk → Annex-K Huffman → dequant → IDCT path (reach_spark.jpeg),
    and reduce pixels to stats. Solid blocks make the lossy codec EXACT:
    DC = 8(v−128) quantizes to sign(v−128)·(|v−128|+1)//2 at Q₀=16 and
    IDCT of a DC-only block is flat, so the DuckDB oracle states the
    decoded value in closed form — while the Spark path still exercises
    DC differential coding across blocks, magnitude categories, EOB runs,
    byte unstuffing, and the float IDCT."""
    import numpy as np

    from .jpeg import decode_jpeg, encode_jpeg
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
                .select("doc_id")

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w = 8 * (1 + d % 3)
                h = 8 * (1 + (d // 3) % 2)
                a = np.empty((h, w), np.uint8)
                for by in range(h // 8):
                    for bx in range(w // 8):
                        v = (d * 17 + (by * (w // 8) + bx) * 29) % 256
                        a[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = v
                dec = decode_jpeg(encode_jpeg(a)).reshape(-1) \
                    .astype(np.int64)
                rows.append((d, w, h, int(dec.sum()),
                             int(((np.arange(dec.size, dtype=np.int64)
                                   + 1) * dec).sum())))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "px_sum", "px_check"])

    return docs.mapInPandas(
        stats, schema="doc_id long, width long, height long, "
                      "px_sum long, px_check long")


_IMAGE_FEATURES_SQL = """
WITH m AS (
  SELECT doc_id, 4 + doc_id % 13 AS w, 4 + (doc_id * 3) % 11 AS h
  FROM documents),
px AS (
  SELECT doc_id, w, h, i, (doc_id*31 + i) % 256 AS p
  FROM m, unnest(range(0, w*h)) AS t(i)),
grad AS (
  SELECT doc_id, w, h,
         abs(((doc_id*31 + i + 1) % 256) - ((doc_id*31 + i) % 256)) AS g
  FROM m, unnest(range(0, w*h)) AS t(i)
  WHERE (i % w) < w - 1)
SELECT CAST(a.doc_id AS BIGINT) AS doc_id,
       CAST(a.w AS BIGINT) AS width, CAST(a.h AS BIGINT) AS height,
       CAST(a.px_sum AS BIGINT) AS px_sum,
       CAST(a.px_sq_sum AS BIGINT) AS px_sq_sum,
       CAST(b.grad_sum AS BIGINT) AS grad_sum,
       CAST(b.edge_count AS BIGINT) AS edge_count
FROM (SELECT doc_id, w, h, sum(p) AS px_sum, sum(p*p) AS px_sq_sum
      FROM px GROUP BY doc_id, w, h) a
JOIN (SELECT doc_id, w, h, sum(g) AS grad_sum,
             sum(CASE WHEN g >= 32 THEN 1 ELSE 0 END) AS edge_count
      FROM grad GROUP BY doc_id, w, h) b
  ON a.doc_id = b.doc_id
"""


@_register("media_image_features", _IMAGE_FEATURES_SQL)
def media_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image features over REALLY decoded pixels — the integer
    feature family a crawl quality filter runs after decode (flatness /
    blur / contrast screening): per-image pixel sum + sum of squares
    (mean/variance inputs) and horizontal-gradient statistics (total
    |∂x| mass + count of edges ≥ 32, the blur/flatness signal). The
    image is a grayscale PNG encoded with cycling row filters and
    decoded through the full zlib+unfilter path; all features are pure
    integer reductions, so the DuckDB oracle restates them from the
    closed-form pixel definition. (The CNN/CLIP embedding in
    media_feature_extract remains the documented model fake; these
    features are real.)"""
    import numpy as np

    from .pixels import decode_png, encode_png
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
                .select("doc_id")

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w = 4 + d % 13
                h = 4 + (d * 3) % 11
                flat = (d * 31 + np.arange(w * h, dtype=np.int64)) % 256
                img = decode_png(encode_png(
                    flat.astype(np.uint8).reshape(h, w), "cycle")) \
                    .astype(np.int64)
                g = np.abs(np.diff(img, axis=1))
                rows.append((d, w, h, int(img.sum()),
                             int((img * img).sum()), int(g.sum()),
                             int((g >= 32).sum())))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "px_sum", "px_sq_sum",
                "grad_sum", "edge_count"])

    return docs.mapInPandas(
        feats, schema="doc_id long, width long, height long, "
                      "px_sum long, px_sq_sum long, grad_sum long, "
                      "edge_count long")


_AUDIO_FEATURES_SQL = """
WITH m AS (
  SELECT doc_id, 128 + 32 * (doc_id % 4) AS n
  FROM documents),
s AS (
  SELECT doc_id, n, i, (doc_id*7 + i*13) % 65536 - 32768 AS v
  FROM m, unnest(range(0, n)) AS t(i)),
frames AS (
  SELECT doc_id, i // 64 AS frame_idx,
         sum(v*v) AS energy,
         sum(CASE WHEN i % 64 < 63
                    AND ((doc_id*7 + i*13) % 65536 - 32768 < 0)
                        <> ((doc_id*7 + (i+1)*13) % 65536 - 32768 < 0)
                  THEN 1 ELSE 0 END) AS zcr
  FROM s WHERE i // 64 < n // 64   -- full 64-sample frames only
  GROUP BY doc_id, i // 64)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(energy AS BIGINT) AS energy,
       CAST(zcr AS BIGINT) AS zcr
FROM frames
"""


@_register("media_audio_features", _AUDIO_FEATURES_SQL)
def media_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL framed audio features over REALLY decoded PCM — the
    speech/music screening pair every audio-crawl filter computes:
    per-frame energy (sum of squared samples; silence/clipping signal)
    and zero-crossing count (voiced/unvoiced + noise signal), frames of
    64 samples, non-overlapping. Mono WAV round-trips through
    encode_wav/decode_wav; both features are exact integer reductions,
    restated closed-form by the oracle."""
    import numpy as np

    from .pixels import decode_wav, encode_wav
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
                .select("doc_id")

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = 128 + 32 * (d % 4)
                s = ((d * 7 + 13 * np.arange(n, dtype=np.int64))
                     % 65536 - 32768).astype(np.int16)
                dec, _ = decode_wav(encode_wav(s, 16000))
                x = dec.reshape(-1).astype(np.int64)
                for f in range(n // 64):
                    fr = x[f * 64:(f + 1) * 64]
                    zc = int(((fr[:-1] < 0) != (fr[1:] < 0)).sum())
                    rows.append((d, f, int((fr * fr).sum()), zc))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "frame_idx", "energy", "zcr"])

    return docs.mapInPandas(
        feats, schema="doc_id long, frame_idx long, energy long, "
                      "zcr long")


_RESIZE_PIXELS_SQL = """
WITH m AS (
  SELECT doc_id, 4 + doc_id % 13 AS w, 4 + (doc_id * 3) % 11 AS h
  FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(8 AS BIGINT) AS out_w, CAST(8 AS BIGINT) AS out_h,
       CAST(sum((doc_id*31 + ((i // 8) * h // 8) * w
                 + ((i % 8) * w // 8)) % 256) AS BIGINT) AS r_sum,
       CAST(sum((i+1) * ((doc_id*31 + ((i // 8) * h // 8) * w
                          + ((i % 8) * w // 8)) % 256)) AS BIGINT)
         AS r_check
FROM m, unnest(range(0, 64)) AS t(i)
GROUP BY doc_id
"""


@_register("media_resize_pixels", _RESIZE_PIXELS_SQL)
def media_resize_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resample, end to end: per doc, encode a grayscale PNG
    (cycling filters), decode it, nearest-neighbor resample to 8×8
    (pixels.resize_nearest — integer sampling grid src = i*in//out), and
    reduce the resampled array to stats. The oracle restates the grid
    arithmetic directly; round 3's media_resize_plan covered the planning
    math, this covers the actual pixel path it hands off to."""
    import numpy as np

    from .pixels import decode_png, resize_nearest
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
                .select("doc_id")

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w = 4 + d % 13
                h = 4 + (d * 3) % 11
                from .pixels import encode_png
                flat = (d * 31 + np.arange(w * h, dtype=np.int64)) % 256
                png = encode_png(flat.astype(np.uint8).reshape(h, w),
                                 "cycle")
                r = resize_nearest(decode_png(png), 8, 8) \
                    .reshape(-1).astype(np.int64)
                rows.append((d, 8, 8, int(r.sum()),
                             int(((np.arange(64, dtype=np.int64) + 1)
                                  * r).sum())))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "out_w", "out_h", "r_sum", "r_check"])

    return docs.mapInPandas(
        stats, schema="doc_id long, out_w long, out_h long, r_sum long, "
                      "r_check long")


@_register("media_frame_sample", """
WITH m AS (
  SELECT doc_id, 'img://' || doc_id || '/' || (n_chars % 3) AS media_ref
  FROM documents),
meta AS (
  SELECT doc_id, media_ref,
    strpos('0123456789abcdef', substr(md5(media_ref), 3, 1)) AS n_frames
  FROM m)
SELECT doc_id, media_ref, unnest(range(0, n_frames, 4)) AS frame_idx
FROM meta
""")
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plumbing: every 4th frame index per media ref — the
    explode pattern a video feature extractor fans out over."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    meta = docs.select(
        "doc_id",
        F.concat(F.lit("img://"), F.col("doc_id").cast("string"),
                 F.lit("/"), (F.col("n_chars") % 3).cast("string"))
         .alias("media_ref")
    ).withColumn(
        "n_frames",
        F.expr("instr('0123456789abcdef', substring(md5(media_ref), 3, 1))"))
    return (meta
            .select("doc_id", "media_ref",
                    F.explode(F.sequence(
                        F.lit(0), F.col("n_frames") - 1, F.lit(4)))
                     .alias("frame_idx"))
            .select("doc_id", "media_ref",
                    F.col("frame_idx").cast("bigint").alias("frame_idx")))
