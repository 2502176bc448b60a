"""Multimodal column handling: media spans as opaque refs with typed
metadata; decode / feature-extract as Arrow-batched pandas UDFs.

The container has no image/audio libraries, so the decode step is a
clearly-marked deterministic fake (md5-derived dimensions) behind the same
mapInPandas plumbing a real decoder would use — schema, batching, and
partitioning are real and tested; swap `_fake_decode` for PIL/librosa in
production. `decode_real` raises NotImplementedError by design.

The media table is derived deterministically from `documents` (one media
ref per doc) so the operator has a DuckDB oracle: the fake decode is pure
md5 arithmetic, expressible identically in SQL.
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


def decode_real(media_bytes: bytes) -> dict:
    """Real decoder entry point — image/audio libs are not in this
    container. Production: PIL.Image.open / librosa.load inside the same
    mapInPandas batch loop as `decode_media_meta`."""
    raise NotImplementedError(
        "media decoding requires PIL/librosa; use the deterministic fake "
        "for plumbing tests")


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
