"""[S8] Corpus indexing + ranked retrieval: the reference's Lucene side
tooling re-expressed as Spark-native inverted-index tables.

Reference parity: `main/src/main/scala/org/clulab/reach/indexer/
NxmlIndexer.scala` builds a Lucene index over (id, text) documents;
`NxmlSearcher.scala:92-117` searches the `text` field with a
StandardAnalyzer query and collects top-scoring docs (Lucene's default
similarity is BM25 since 6.0 — the scoring re-implemented here), writing
(docId, score) pairs. This module keeps the same surface: build an index
artifact from a corpus, then rank documents for a free-text query.

Spark shape (the 100 TB design):
- The "index" is two tables, not a service: `postings(term, doc_id, len,
  tf)` — document length denormalized inline, Lucene-norms style, so
  scoring never joins a corpus-sized side — and `doclens(doc_id, len)`
  kept for stats/compat. Building them is one tokenize+explode scan with
  a map-side-combinable groupBy — at scale, write postings partitioned/
  bucketed BY TERM so a query's term filter prunes to its buckets and the
  scoring join needs no shuffle of the postings table.
- A query touches |query| terms: filter postings on the tiny term set
  (pushed to the scan), broadcast the per-term document frequencies, one
  groupBy(doc_id) for the score sum, then a global top-k. Corpus size
  only enters through the pruned postings rows, never a full-table pass.
- Scores: exact BM25 (k1=1.2, b=0.75, Lucene's idf shape
  ln(1+(N-df+0.5)/(df+0.5))), rounded to 6dp with doc_id tie-break so
  ranks are engine-deterministic (same convention as similarity.py).

Tokenization is StandardAnalyzer-like: lowercase, split on any
non-alphanumeric run, drop empties — no stopword list (Lucene's
StandardAnalyzer ships with CharArraySet.EMPTY_SET stopwords by default
since 7.0).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

BM25_K1 = 1.2
BM25_B = 0.75

_TOKEN_SPLIT = "[^a-z0-9]+"


def tokens_expr(col) -> F.Column:
    """text → array<string> analyzer tokens (lowercase alnum runs)."""
    return F.filter(F.split(F.lower(col), _TOKEN_SPLIT),
                    lambda t: t != "")


def build_index(documents: DataFrame,
                id_col: str = "doc_id",
                text_col: str = "text") -> dict[str, DataFrame]:
    """Corpus → {postings, doclens} (NxmlIndexer.index analog). One scan:
    tokenize, explode, count per (term, doc_id). Callers at scale persist
    both with `.write.bucketBy(n, "term")` / partitionBy so term filters
    prune (SURVEY §2.1 S8 note)."""
    toks = documents.select(F.col(id_col).alias("doc_id"),
                            tokens_expr(F.col(text_col)).alias("toks"))
    doclens = toks.select("doc_id", F.size("toks").alias("len"))
    # `len` is DENORMALIZED into the postings (one extra int per row, like
    # Lucene's per-doc norms stored inline in the segment): scoring then
    # needs NO join against the corpus-sized doclens table — at 10^12 docs
    # a broadcast of doclens would OOM the driver and a shuffle join would
    # move the whole corpus; here the length arrives with the pruned
    # postings rows for free. groupBy key includes `len` (functionally
    # dependent on doc_id) so the aggregate stays map-side combinable.
    postings = (toks
                .select("doc_id", F.size("toks").alias("len"),
                        F.explode("toks").alias("term"))
                .groupBy("term", "doc_id", "len")
                .agg(F.count("*").alias("tf")))
    # global stats live in the index artifact, exactly like Lucene's
    # segment metadata: computed ONCE at build, so searches never pay a
    # full doclens aggregate job (they are two scalars per index)
    stats = doclens.agg(F.count("*").alias("n"),
                        F.avg("len").alias("avglen")).collect()[0]
    return {"postings": postings, "doclens": doclens,
            "n_docs": int(stats["n"]),
            "avglen": float(stats["avglen"] or 0.0)}


def bm25_search(index: dict[str, DataFrame], query: str,
                k: int = 10) -> DataFrame:
    """query string → top-k (doc_id, rank, score) by summed per-term BM25
    (NxmlSearcher.searchByField analog, OR semantics like Lucene's
    QueryParser default). Only the query's terms are read from postings —
    the filter reaches the scan, so cost is O(matching postings), not
    O(corpus)."""
    postings, doclens = index["postings"], index["doclens"]
    spark = postings.sparkSession
    terms = sorted(set(
        t for t in re.split(_TOKEN_SPLIT, query.lower()) if t))
    if not terms:
        return spark.createDataFrame(
            [], "doc_id long, rank int, score double")
    # global stats come from the index metadata (build_index); indexes
    # built by older callers without them fall back to one aggregate
    if "n_docs" in index:
        n_docs, avglen = index["n_docs"], index["avglen"]
    else:
        stats = doclens.agg(F.count("*").alias("n"),
                            F.avg("len").alias("avglen")).collect()[0]
        n_docs, avglen = stats["n"], float(stats["avglen"] or 0.0)

    hit = postings.where(F.col("term").isin(terms))
    if "len" not in postings.columns:
        # legacy index without denormalized lengths: join doclens with NO
        # broadcast hint — doclens is corpus-sized (one row per document),
        # so the strategy must be AQE's call, never a forced broadcast
        hit = hit.join(doclens, "doc_id")
    # per-term df over the pruned postings only
    df_by_term = hit.groupBy("term").agg(
        F.count("*").alias("df"))
    idf = F.log(F.lit(1.0) +
                (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) /
                (F.col("df") + F.lit(0.5)))
    scored = (hit
              .join(F.broadcast(df_by_term), "term")
              .withColumn("tfn", (F.col("tf") * (BM25_K1 + 1)) /
                          (F.col("tf") + BM25_K1 *
                           (1 - BM25_B + BM25_B * F.col("len") / avglen)))
              .groupBy("doc_id")
              .agg(F.round(F.sum(idf * F.col("tfn")), 6).alias("score")))
    # top-k via orderBy+limit = TakeOrderedAndProject (per-partition
    # partial top-k, merged once — no single-task global sort over every
    # matching doc, which a bare Window.orderBy would do); row_number runs
    # on the k survivors only
    topk = scored.orderBy(F.desc("score"), "doc_id").limit(k)
    w = Window.orderBy(F.desc("score"), "doc_id")
    return (topk.withColumn("rank", F.row_number().over(w))
            .select("doc_id", "rank", "score"))


QUERIES: dict[str, tuple] = {}

_S8_QUERY = "hash join stream customer"
_S8_K = 10


def s8_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable S8 row: index the documents table, rank the fixed
    query, return the top-k (doc_id, rank, score)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bm25_search(build_index(docs), _S8_QUERY, k=_S8_K)


def bm25_oracle_sql(query: str, k: int = 10,
                    table: str = "documents") -> str:
    """The equivalent ANSI SQL (DuckDB) for one query — same analyzer,
    same BM25, same rounding/tie-break."""
    terms = sorted(set(
        t for t in re.split(_TOKEN_SPLIT, query.lower()) if t))
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text),
                                              '{_TOKEN_SPLIT}')) AS term
  FROM {table}
), toks2 AS (
  SELECT doc_id, term FROM toks WHERE term <> ''
), doclens AS (
  SELECT doc_id, count(*) AS len FROM toks2 GROUP BY doc_id
), stats AS (
  SELECT count(*) AS n, avg(len) AS avglen FROM doclens
), postings AS (
  SELECT term, doc_id, count(*) AS tf FROM toks2
  WHERE term IN ({term_list}) GROUP BY term, doc_id
), dfs AS (
  SELECT term, count(*) AS df FROM postings GROUP BY term
), scored AS (
  SELECT p.doc_id,
         round(sum(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
                   * (p.tf * ({BM25_K1} + 1)) /
                   (p.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * l.len
                                        / s.avglen))), 6) AS score
  FROM postings p
  JOIN dfs d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
  GROUP BY p.doc_id
), ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
         score
  FROM scored)
SELECT doc_id, rank, score FROM ranked WHERE rank <= {k}
"""


QUERIES["s8_bm25_search"] = (s8_bm25_search,
                             bm25_oracle_sql(_S8_QUERY, k=_S8_K))
