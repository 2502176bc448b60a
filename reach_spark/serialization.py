"""Mention JSON (de)serialization (reference mentions/serialization/json:
``package.scala:16-294`` MentionJSONOps/REACHMentionSeq,
``JSONSerializer.scala:20-458`` toBioMentions/toCorefMentions).

The reference serializes a mention seq plus a ``documents`` map (the
annotated Document ASTs) so deserialization can rebuild full mentions
without re-annotating. The Spark-native analog keeps both halves as
DataFrames and round-trips them through JSON **with their exact
schemas**:

- ``write_mentions_json`` writes ``<dir>/mentions`` and
  ``<dir>/documents`` as JSON-lines plus a ``_mention_schema`` /
  ``_document_schema`` text part holding ``df.schema.json()`` — the
  "documents field for simple deserialization" (package.scala:30-35),
  except the schema travels with the data so the reader never infers
  (JSON inference drops types and null-only columns).
- ``read_mentions_json`` reads both back schema-first; the result is
  row-identical to what was written, schema-identical up to nullability
  (a JSON scan is always nullable — the format cannot enforce
  non-null; round-trip asserted in tests/test_serialization.py, the
  TestJsonSerialization analog).
- ``mentions_complete_json`` is the single-string ``completeAST`` form
  (package.scala:30-35) for the one-document API path.

Spark shape: plain ``df.write.json`` / ``spark.read.json(schema=...)``
per partition — no driver assembly; the schema sidecar is a 1-row text
part written through the same writer so it lands on whatever filesystem
the data does.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType


def _write_schema(df: DataFrame, path: str) -> None:
    spark = df.sparkSession
    (spark.createDataFrame([(df.schema.json(),)], "value string")
     .coalesce(1).write.mode("overwrite").text(path))


def _read_schema(spark: SparkSession, path: str) -> StructType:
    return StructType.fromJson(
        json.loads(spark.read.text(path).head()["value"]))


def write_mentions_json(mentions: DataFrame, sentences: DataFrame,
                        out_dir: str) -> None:
    """Serialize a mention table + its document (sentence) context as
    JSON-lines with schema sidecars (REACHMentionSeq.jsonAST analog —
    mentions AND documents in one artifact)."""
    _write_schema(mentions, f"{out_dir}/_mention_schema")
    _write_schema(sentences, f"{out_dir}/_document_schema")
    mentions.write.mode("overwrite").json(f"{out_dir}/mentions")
    sentences.write.mode("overwrite").json(f"{out_dir}/documents")


def read_mentions_json(spark: SparkSession,
                       out_dir: str) -> dict[str, DataFrame]:
    """Deserialize (JSONSerializer.toBioMentions analog): returns
    {'mentions', 'sentences'} DataFrames with the original schemas —
    including null-only and nested struct columns JSON inference would
    lose."""
    mschema = _read_schema(spark, f"{out_dir}/_mention_schema")
    dschema = _read_schema(spark, f"{out_dir}/_document_schema")
    return {
        "mentions": spark.read.schema(mschema)
        .json(f"{out_dir}/mentions"),
        "sentences": spark.read.schema(dschema)
        .json(f"{out_dir}/documents"),
    }


def mentions_complete_json(mentions: DataFrame,
                           sentences: DataFrame) -> str:
    """The single-string ``completeAST`` form (package.scala:30-35):
    ``{"documents": {<doc_id>: {"sentences": [...]}}, "mentions":
    [...]}`` — driver-side, for the one-document API path only."""
    docs: dict[str, dict] = {}
    for r in sentences.toJSON().collect():
        row = json.loads(r)
        docs.setdefault(row["doc_id"], {"sentences": []})[
            "sentences"].append(row)
    for d in docs.values():
        d["sentences"].sort(key=lambda s: s["sent_idx"])
    ms = [json.loads(r) for r in
          mentions.orderBy("doc_id", "sent_idx", "mention_id")
          .toJSON().collect()]
    return json.dumps({"documents": docs, "mentions": ms},
                      sort_keys=True)


def mentions_from_complete_json(spark: SparkSession, payload: str,
                                mention_schema: StructType,
                                sentence_schema: StructType
                                ) -> dict[str, DataFrame]:
    """Inverse of ``mentions_complete_json`` (JSONSerializer
    .toBioMentions over an AST string): rebuild the two DataFrames from
    the completeAST payload under explicit schemas."""
    ast = json.loads(payload)
    sent_rows = [s for d in ast["documents"].values()
                 for s in d["sentences"]]
    m_df = spark.read.schema(mention_schema).json(
        spark.sparkContext.parallelize(
            [json.dumps(m) for m in ast["mentions"]] or ["{}"]))
    s_df = spark.read.schema(sentence_schema).json(
        spark.sparkContext.parallelize(
            [json.dumps(s) for s in sent_rows] or ["{}"]))
    if not ast["mentions"]:
        m_df = m_df.limit(0)
    if not sent_rows:
        s_df = s_df.limit(0)
    return {"mentions": m_df, "sentences": s_df}
