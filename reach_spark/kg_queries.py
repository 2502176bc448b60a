"""SQL-checkable projections of the KG-construction operators (SURVEY §2)
onto the testdata tables, so the driver's DuckDB correctness gate covers the
pipeline's building blocks: span text extraction (S1), sentence chunking
(N2), dictionary NER (N6), grounding rank-1 (G3), context window (C2).

The full pipeline itself (fixture-grammar extraction → triples) is not
ANSI-SQL-expressible; it is exercised by `kg_triples_flagship` with the
driver's rows-only check plus the pytest fixture-P/R gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

QUERIES: dict[str, tuple] = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = (fn, oracle)
        return fn
    return deco


# S1: interleaved spans → extracted text. Spans are derived from documents
# deterministically (8-word chunks, offsets descending on purpose so the
# offset-order sort is exercised), then reassembled; output must equal the
# original text.
@_register("s1_span_text_extract", """
WITH words AS (
  SELECT doc_id, text, regexp_split_to_array(text, ' ') AS ws FROM documents
), chunks AS (
  SELECT doc_id, text,
         unnest(range(0, (len(ws) + 7) // 8)) AS chunk_idx,
         ws FROM words
), spans AS (
  SELECT doc_id, text, chunk_idx,
         array_to_string(ws[chunk_idx * 8 + 1 : chunk_idx * 8 + 8], ' ')
         AS span_text
  FROM chunks
)
SELECT doc_id,
       string_agg(span_text, ' ' ORDER BY chunk_idx) AS extracted,
       (string_agg(span_text, ' ' ORDER BY chunk_idx) = min(text)) AS roundtrip_ok
FROM spans GROUP BY doc_id
""")
def s1_span_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chunks = (docs
              .withColumn("ws", F.split("text", " "))
              .withColumn("chunk_idx", F.explode(F.sequence(
                  F.lit(0), ((F.size("ws") + 7) / F.lit(8)).cast("int") - 1)))
              .withColumn("span_text", F.concat_ws(" ", F.slice(
                  "ws", F.col("chunk_idx") * 8 + 1, 8))))
    agg = (chunks.groupBy("doc_id")
           .agg(F.concat_ws(" ", F.array_sort(F.collect_list(
               F.struct("chunk_idx", "span_text"))).getField("span_text"))
               .alias("extracted"),
               F.min("text").alias("orig")))
    return agg.select("doc_id", "extracted",
                      (F.col("extracted") == F.col("orig"))
                      .alias("roundtrip_ok"))


# N2: sentence chunking — one row per 8-word chunk with token counts.
@_register("n2_sentence_chunks", """
WITH words AS (
  SELECT doc_id, regexp_split_to_array(text, ' ') AS ws FROM documents
), chunks AS (
  SELECT doc_id, unnest(range(0, (len(ws) + 7) // 8)) AS sent_idx, ws
  FROM words
)
SELECT doc_id, sent_idx,
       array_to_string(ws[sent_idx * 8 + 1 : sent_idx * 8 + 8], ' ')
         AS sent_text,
       len(ws[sent_idx * 8 + 1 : sent_idx * 8 + 8]) AS n_tokens
FROM chunks
""")
def n2_sentence_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (docs
            .withColumn("ws", F.split("text", " "))
            .withColumn("sent_idx", F.explode(F.sequence(
                F.lit(0), ((F.size("ws") + 7) / F.lit(8)).cast("int") - 1)))
            .select("doc_id", "sent_idx",
                    F.concat_ws(" ", F.slice("ws",
                                             F.col("sent_idx") * 8 + 1, 8))
                     .alias("sent_text"),
                    F.size(F.slice("ws", F.col("sent_idx") * 8 + 1, 8))
                     .alias("n_tokens")))


# N6: dictionary NER — inline term dictionary joined against exploded
# tokens (the broadcast-trie longest-match reduced to unigrams, which is
# exact for this vocabulary).
_NER_DICT = [
    ("spark", "ENGINE"), ("join", "OPERATOR"), ("merge", "OPERATOR"),
    ("sort", "OPERATOR"), ("filter", "OPERATOR"), ("scan", "OPERATOR"),
    ("hash", "ALGO"), ("window", "OPERATOR"), ("stream", "SOURCE"),
    ("batch", "SOURCE"), ("vector", "TYPE"), ("customer", "ENTITY"),
    ("order", "ENTITY"), ("table", "ENTITY"), ("query", "ACTION"),
]
_NER_VALUES = ", ".join(f"('{t}', '{l}')" for t, l in _NER_DICT)


@_register("n6_dict_ner", f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) AS tok
  FROM documents
), dict(term, label) AS (VALUES {_NER_VALUES})
SELECT doc_id, term, label, count(*) AS n_mentions
FROM toks JOIN dict ON tok = term
GROUP BY doc_id, term, label
""")
def n6_dict_ner(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    dic = spark.createDataFrame(_NER_DICT, ["term", "label"])
    return (toks.join(F.broadcast(dic), toks["tok"] == dic["term"])
            .groupBy("doc_id", "term", "label")
            .agg(F.count("*").alias("n_mentions")))


# G3: grounding rank-1 — mention terms joined to a multi-row inline KB,
# first hit by (kb_priority, id) via row_number (the broadcast-join +
# rank-1 selection of reach_spark.grounding on a SQL-checkable input).
_KB_ROWS = [
    ("spark", "enginedb", "E001", 1), ("spark", "legacydb", "L900", 9),
    ("join", "opdb", "O101", 2), ("join", "legacydb", "L101", 9),
    ("merge", "opdb", "O102", 2), ("sort", "opdb", "O103", 2),
    ("filter", "opdb", "O104", 2), ("hash", "algodb", "A001", 3),
    ("window", "opdb", "O105", 2), ("stream", "srcdb", "S001", 4),
    ("batch", "srcdb", "S002", 4), ("customer", "entdb", "N001", 5),
    ("order", "entdb", "N002", 5), ("table", "entdb", "N003", 5),
    ("query", "actdb", "Q001", 6), ("vector", "typedb", "T001", 7),
    ("vector", "legacydb", "L777", 9),
]
_KB_VALUES = ", ".join(f"('{t}', '{ns}', '{i}', {p})"
                       for t, ns, i, p in _KB_ROWS)


@_register("g3_grounding_rank1", f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(regexp_split_to_array(text, ' ')) AS term
  FROM documents
), kb(term, ns, id, kb_priority) AS (VALUES {_KB_VALUES}),
hits AS (
  SELECT t.doc_id, t.term, k.ns, k.id,
         row_number() OVER (PARTITION BY t.doc_id, t.term
                            ORDER BY k.kb_priority, k.id) AS rk
  FROM toks t JOIN kb k ON t.term = k.term)
SELECT doc_id, term, ns, id FROM hits WHERE rk = 1
""")
def g3_grounding_rank1(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = (docs.select("doc_id",
                        F.explode(F.split("text", " ")).alias("term"))
            .distinct())
    kb = spark.createDataFrame(_KB_ROWS, ["term", "ns", "id", "kb_priority"])
    hits = toks.join(F.broadcast(kb), "term")
    w = Window.partitionBy("doc_id", "term").orderBy("kb_priority", "id")
    return (hits.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("doc_id", "term", "ns", "id"))


# C2: bounded-padding context window — chunks containing 'spark' emit a
# context key; every chunk collects keys from the ±3 chunk window
# (Window.rangeBetween(-3,+3), exactly the Policies.scala Policy4 shape).
@_register("c2_context_window", """
WITH words AS (
  SELECT doc_id, regexp_split_to_array(text, ' ') AS ws FROM documents
), chunks AS (
  SELECT doc_id, unnest(range(0, (len(ws) + 7) // 8)) AS sent_idx, ws
  FROM words
), sent AS (
  SELECT doc_id, sent_idx,
         array_to_string(ws[sent_idx * 8 + 1 : sent_idx * 8 + 8], ' ')
           AS sent_text
  FROM chunks
), keyed AS (
  SELECT doc_id, sent_idx,
         CASE WHEN sent_text LIKE '%spark%'
              THEN 'ENGINE:' || sent_idx ELSE NULL END AS ckey
  FROM sent
)
SELECT doc_id, sent_idx,
       coalesce(array_to_string(list_sort(list_filter(
         list(ckey) OVER (PARTITION BY doc_id ORDER BY sent_idx
                          RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING),
         x -> x IS NOT NULL)), ','), '') AS context_keys
FROM keyed
""")
def c2_context_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    sent = n2_sentence_chunks(spark, sf_dir)
    keyed = sent.select(
        "doc_id", "sent_idx",
        F.when(F.col("sent_text").like("%spark%"),
               F.concat(F.lit("ENGINE:"), F.col("sent_idx").cast("string")))
         .alias("ckey"))
    w = (Window.partitionBy("doc_id").orderBy("sent_idx")
         .rangeBetween(-3, 3))
    return keyed.select(
        "doc_id", "sent_idx",
        F.coalesce(
            F.concat_ws(",", F.array_sort(F.collect_list("ckey").over(w))),
            F.lit("")).alias("context_keys"))
