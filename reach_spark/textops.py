"""Large-scale training-data text operators over the `documents` table:
deduplication (exact, MinHash+LSH, n-gram Jaccard, SimHash), language ID,
quality scoring, token counting, document fingerprinting.

Every operator is pure built-in pyspark.sql.functions (JVM, whole-stage
codegen) — no Python UDFs in any hot path. Cross-engine-deterministic
hashing uses md5 hex prefixes compared as strings (identical in Spark and
DuckDB), so each operator has an exact DuckDB oracle.

Scale notes per operator are in the docstrings: the shuffles are on
bounded-cardinality keys (shingles, bands, buckets), the classic inverted-
index pattern that holds at 100 TB with salting on hot shingles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

# registry: name -> (query_fn, oracle_sql or None)
QUERIES: dict[str, tuple] = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = (fn, oracle)
        return fn
    return deco


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# exact dedup: hash-groupBy on content. At scale: group on sha2(text) not
# text itself (shuffle key size), min(doc_id) is the canonical survivor.
# --------------------------------------------------------------------------
@_register("dedup_exact", """
SELECT doc_id,
       count(*) OVER (PARTITION BY md5(text)) AS group_size,
       (doc_id = min(doc_id) OVER (PARTITION BY md5(text))) AS keep
FROM documents
""")
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy(F.md5("text"))
    return (_docs(spark, sf_dir)
            .select("doc_id",
                    F.count("*").over(w).alias("group_size"),
                    (F.col("doc_id") == F.min("doc_id").over(w)).alias("keep")))


# --------------------------------------------------------------------------
# shingles: word 3-grams. Spark: sequence+transform (JVM); DuckDB: unnest
# with ordinality self-aligned via list slicing.
# --------------------------------------------------------------------------
_SHINGLE_SPARK = """
CASE WHEN size(split(text, ' ')) >= 3 THEN
transform(
  sequence(1, size(split(text, ' ')) - 2),
  i -> concat_ws(' ', element_at(split(text, ' '), i),
                       element_at(split(text, ' '), i + 1),
                       element_at(split(text, ' '), i + 2)))
ELSE array() END
"""

_SHINGLE_DUCK = """
list_transform(
  range(1, greatest(len(regexp_split_to_array(text, ' ')) - 1, 1)),
  i -> regexp_split_to_array(text, ' ')[i] || ' ' ||
       regexp_split_to_array(text, ' ')[i+1] || ' ' ||
       regexp_split_to_array(text, ' ')[i+2])
"""


# --------------------------------------------------------------------------
# MinHash signatures: 8 permutations simulated by seeded md5; the minimum
# hex string per permutation is the signature component (string-min is
# engine-portable). LSH: 4 bands of 2 rows → band key join finds candidate
# pairs with O(n·bands) shuffle instead of O(n²).
# --------------------------------------------------------------------------
_N_PERM = 8
_BAND_ROWS = 2

# shared CTE chain: shingles → signatures → LSH bands → candidate pairs;
# used by the dedup_minhash_pairs oracle and, extended with a recursive
# transitive closure, by the dedup_near_groups oracle
_MINHASH_PAIRS_CTES = f"""sh AS (
  SELECT doc_id, unnest({_SHINGLE_DUCK}) AS shingle FROM documents
), sig AS (
  SELECT doc_id,
    {', '.join(f"min(md5('{i}:' || shingle)) AS mh{i}"
               for i in range(_N_PERM))}
  FROM sh GROUP BY doc_id
), bands AS (
  {' UNION ALL '.join(
    f"SELECT doc_id, {b} AS band, mh{2 * b} || mh{2 * b + 1} AS bkey"
    f" FROM sig" for b in range(_N_PERM // _BAND_ROWS))}
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
  WHERE a.doc_id < b.doc_id
)"""


@_register("dedup_minhash_sig", f"""
WITH sh AS (
  SELECT doc_id, unnest({_SHINGLE_DUCK}) AS shingle FROM documents
)
SELECT doc_id,
  {', '.join(f"min(md5('{i}:' || shingle)) AS mh{i}" for i in range(_N_PERM))}
FROM sh GROUP BY doc_id
""")
def dedup_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = (_docs(spark, sf_dir)
          .select("doc_id",
                  F.explode(F.expr(_SHINGLE_SPARK)).alias("shingle")))
    aggs = [F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle"))))
            .alias(f"mh{i}") for i in range(_N_PERM)]
    return sh.groupBy("doc_id").agg(*aggs)


@_register("dedup_minhash_pairs", f"""
WITH {_MINHASH_PAIRS_CTES}
SELECT doc_a, doc_b FROM pairs
""")
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = dedup_minhash_sig(spark, sf_dir)
    # one pass: bands as an inline array explode (no union of N re-scans of
    # the signature aggregation), persisted because the LSH self-join reads
    # both sides
    band_arr = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.concat(F.col(f"mh{2*b}"), F.col(f"mh{2*b+1}"))
                  .alias("bkey"))
        for b in range(_N_PERM // _BAND_ROWS)])
    # localCheckpoint (not persist): computed once for both join sides and
    # the blocks are reclaimed by the ContextCleaner when the plan is GC'd —
    # no leaked cache across repeated calls in a long-lived session
    bands = (sig.select("doc_id", F.explode(band_arr).alias("bb"))
             .select("doc_id", F.col("bb.band").alias("band"),
                     F.col("bb.bkey").alias("bkey"))
             .localCheckpoint(eager=False))
    a = bands.alias("a")
    b = bands.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band")) &
                      (F.col("a.bkey") == F.col("b.bkey")) &
                      (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())


# --------------------------------------------------------------------------
# Near-dup GROUP COLLAPSE: the pipeline step after candidate pairs — every
# document gets a near-dup group id (= min doc_id in its connected
# component over the LSH pair graph) and a canonical flag, the table a
# training-data pipeline joins against to keep one survivor per cluster.
# Scale: near-dup clusters are small and pair counts are LSH-bounded, so
# the label-propagation iterations run over a graph orders of magnitude
# smaller than the corpus; the final left join is a plain doc_id-keyed
# shuffle (or broadcast of the tiny component map when it fits).
# --------------------------------------------------------------------------
@_register("dedup_near_groups", f"""
WITH RECURSIVE {_MINHASH_PAIRS_CTES},
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
), reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b <> r.a
), comp AS (
  SELECT a AS doc_id, least(a, min(b)) AS grp FROM reach GROUP BY a
)
SELECT d.doc_id,
       coalesce(c.grp, d.doc_id) AS group_id,
       coalesce(c.grp, d.doc_id) = d.doc_id AS is_canonical
FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
""")
def dedup_near_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .canonicalize import connected_components
    edges = (dedup_minhash_pairs(spark, sf_dir)
             .select(F.col("doc_a").alias("src"),
                     F.col("doc_b").alias("dst")))
    comp = (connected_components(edges)
            .withColumnRenamed("node", "doc_id"))
    docs = _docs(spark, sf_dir).select("doc_id")
    out = docs.join(F.broadcast(comp), "doc_id", "left")
    group = F.coalesce(F.col("component"), F.col("doc_id"))
    return out.select(
        "doc_id", group.alias("group_id"),
        (group == F.col("doc_id")).alias("is_canonical"))


# --------------------------------------------------------------------------
# n-gram Jaccard near-dup: inverted index on shingles → pair intersection
# counts → |A∩B| / (|A|+|B|-|A∩B|). Threshold in basis points (integer) so
# the comparison is float-free across engines.
#
# Hot-shingle cap: a shingle shared by k docs contributes k²/2 candidate
# pairs, so one boilerplate shingle in 10⁶ docs would alone emit 5·10¹¹
# pairs. Shingles with document frequency > JACCARD_DF_CAP are dropped from
# the inverted index BEFORE the self-join (they carry ~zero Jaccard signal;
# sizes still count them so the ratio denominator is exact). Near-dup at
# corpus scale routes through the MinHash-LSH path whose candidate count is
# O(n·bands) by construction. The oracle applies the identical cap.
# --------------------------------------------------------------------------
JACCARD_DF_CAP = 1000

@_register("dedup_jaccard_pairs", f"""
WITH sh AS (
  SELECT DISTINCT doc_id, unnest({_SHINGLE_DUCK}) AS shingle FROM documents
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), cold AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 1000
), shc AS (
  SELECT sh.doc_id, sh.shingle FROM sh JOIN cold USING (shingle)
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       (10000 * i) // (sa.n + sb.n - i) AS jaccard_bp
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE 10000 * i >= 8000 * (sa.n + sb.n - i)
""")
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = (_docs(spark, sf_dir)
          .select("doc_id", F.explode(F.expr(_SHINGLE_SPARK)).alias("shingle"))
          .distinct())
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    cold = (sh.groupBy("shingle").agg(F.count("*").alias("df"))
            .where(F.col("df") <= JACCARD_DF_CAP).select("shingle"))
    sh = sh.join(cold, "shingle")
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle")) &
                       (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("i")))
    return (inter
            .join(sizes.select(F.col("doc_id").alias("doc_a"),
                               F.col("n").alias("na")), "doc_a")
            .join(sizes.select(F.col("doc_id").alias("doc_b"),
                               F.col("n").alias("nb")), "doc_b")
            .where(10000 * F.col("i") >= 8000 * (F.col("na") + F.col("nb")
                                                 - F.col("i")))
            .select("doc_a", "doc_b",
                    F.floor(10000 * F.col("i") / (F.col("na") + F.col("nb")
                                                  - F.col("i")))
                    .cast("bigint").alias("jaccard_bp")))


# --------------------------------------------------------------------------
# SimHash (64→16-bit portable variant): per-token md5-derived 16-bit
# pattern, bitwise majority vote via per-bit sums. Engine-portable because
# each bit is extracted from a md5 hex nibble by string ops + integer CASE.
# --------------------------------------------------------------------------
_HEXMAP_SPARK = "(instr('0123456789abcdef', {c}) - 1)"
_HEXMAP_DUCK = "(strpos('0123456789abcdef', {c}) - 1)"


def _simhash_sql(hexmap: str, substr: str) -> str:
    # bit j of nibble n = (n >> (j%4)) & 1 where n = hex digit j//4
    bit_terms = []
    for j in range(16):
        nib = f"{hexmap.format(c=f'{substr}(h, {j // 4 + 1}, 1)')}"
        bit_terms.append(
            f"sum(CASE WHEN ({nib} // {2 ** (j % 4)}) % 2 = 1 "
            f"THEN 1 ELSE -1 END) AS b{j}")
    return ", ".join(bit_terms)


_SIMHASH_CTE = f"""toks AS (
  SELECT doc_id, md5(unnest(regexp_split_to_array(text, ' '))) AS h
  FROM documents
), bits AS (
  SELECT doc_id, {_simhash_sql(_HEXMAP_DUCK, 'substr')}
  FROM toks GROUP BY doc_id
), sig AS (
  SELECT doc_id,
  {' + '.join(f"(CASE WHEN b{j} > 0 THEN {2 ** j} ELSE 0 END)" for j in range(16))}
  AS simhash16
  FROM bits
)"""


@_register("dedup_simhash", f"""
WITH {_SIMHASH_CTE}
SELECT doc_id, simhash16 FROM sig
""")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (_docs(spark, sf_dir)
            .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
            .select("doc_id", F.md5("tok").alias("h")))
    aggs = []
    for j in range(16):
        nib = F.expr(_HEXMAP_SPARK.format(c=f"substring(h, {j // 4 + 1}, 1)"))
        bit = (nib.cast("int") / (2 ** (j % 4))).cast("int") % 2
        aggs.append(F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"b{j}"))
    bits = toks.groupBy("doc_id").agg(*aggs)
    acc = None
    for j in range(16):
        term = F.when(F.col(f"b{j}") > 0, 2 ** j).otherwise(0)
        acc = term if acc is None else acc + term
    return bits.select("doc_id", acc.cast("bigint").alias("simhash16"))


# --------------------------------------------------------------------------
# simhash near-dup pairs: banded Hamming search. Pigeonhole: two 16-bit
# signatures within Hamming distance 3 must agree EXACTLY on at least one
# of four 4-bit bands, so candidates come from a band-key equi self-join
# (O(n · 4) index rows, never all-pairs) and the exact popcount(xor) check
# confirms. The same band trick scales to 64/128-bit simhash at 100 TB —
# bands are the shuffle key; hot bands (e.g. all-zero band from empty-ish
# docs) would be df-capped like the Jaccard shingle join.
# --------------------------------------------------------------------------
_SIMHASH_HAMMING_MAX = 3
_SIMHASH_BANDS = 4


@_register("dedup_simhash_pairs", f"""
WITH {_SIMHASH_CTE},
bands AS (
  SELECT doc_id, simhash16, b AS band_idx,
         (simhash16 // CAST(power(2, 4 * b) AS BIGINT)) % 16 AS band_bits
  FROM sig, unnest([0, 1, 2, 3]) AS t(b)
),
cand AS (
  SELECT DISTINCT least(x.doc_id, y.doc_id) AS doc_a,
                  greatest(x.doc_id, y.doc_id) AS doc_b
  FROM bands x JOIN bands y
       ON x.band_idx = y.band_idx AND x.band_bits = y.band_bits
          AND x.doc_id < y.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(sa.simhash16, sb.simhash16)) AS BIGINT) AS hamming
FROM cand c
JOIN sig sa ON sa.doc_id = c.doc_a
JOIN sig sb ON sb.doc_id = c.doc_b
WHERE bit_count(xor(sa.simhash16, sb.simhash16)) <= {_SIMHASH_HAMMING_MAX}
""")
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = dedup_simhash(spark, sf_dir)
    bands = sig.select(
        "doc_id", "simhash16",
        F.explode(F.sequence(F.lit(0), F.lit(_SIMHASH_BANDS - 1)))
         .alias("band_idx"))
    bands = bands.withColumn(
        "band_bits",
        F.expr("(simhash16 div cast(pow(2, 4 * band_idx) as bigint)) % 16"))
    x = bands.select(F.col("doc_id").alias("da"), "band_idx", "band_bits")
    y = bands.select(F.col("doc_id").alias("db"), "band_idx", "band_bits")
    cand = (x.join(y, ["band_idx", "band_bits"])
            .where(F.col("da") < F.col("db"))
            .select(F.col("da").alias("doc_a"), F.col("db").alias("doc_b"))
            .distinct())
    sa = sig.select(F.col("doc_id").alias("doc_a"),
                    F.col("simhash16").alias("_sa"))
    sb = sig.select(F.col("doc_id").alias("doc_b"),
                    F.col("simhash16").alias("_sb"))
    return (cand.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("hamming",
                        F.expr("bit_count(_sa ^ _sb)").cast("long"))
            .where(F.col("hamming") <= _SIMHASH_HAMMING_MAX)
            .select("doc_a", "doc_b", "hamming"))


# --------------------------------------------------------------------------
# language ID: stopword-hit heuristic over inline per-language lists.
# --------------------------------------------------------------------------
_STOP = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "es": ["el", "la", "los", "las", "es", "y", "un", "una"],
}


def _lang_hits_sql(dialect: str) -> str:
    out = []
    for lang, words in _STOP.items():
        lst = ", ".join(f"'{w}'" for w in words)
        if dialect == "duck":
            out.append(f"len(list_filter(regexp_split_to_array(text, ' '),"
                       f" w -> w IN ({lst}))) AS hits_{lang}")
        else:
            out.append(f"size(filter(split(text, ' '),"
                       f" w -> w IN ({lst}))) AS hits_{lang}")
    return ", ".join(out)


@_register("lang_id", f"""
WITH h AS (SELECT doc_id, {_lang_hits_sql('duck')} FROM documents)
SELECT doc_id,
  CASE WHEN hits_en >= hits_de AND hits_en >= hits_es AND hits_en > 0 THEN 'en'
       WHEN hits_de >= hits_es AND hits_de > 0 THEN 'de'
       WHEN hits_es > 0 THEN 'es'
       ELSE 'und' END AS pred_lang,
  hits_en, hits_de, hits_es
FROM h
""")
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    exprs = []
    for lang, words in _STOP.items():
        lst = ", ".join(f"'{w}'" for w in words)
        exprs.append(f"size(filter(split(text, ' '), w -> w IN ({lst}))) "
                     f"AS hits_{lang}")
    d = _docs(spark, sf_dir).selectExpr("doc_id", *exprs)
    pred = (F.when((F.col("hits_en") >= F.col("hits_de")) &
                   (F.col("hits_en") >= F.col("hits_es")) &
                   (F.col("hits_en") > 0), "en")
            .when((F.col("hits_de") >= F.col("hits_es")) &
                  (F.col("hits_de") > 0), "de")
            .when(F.col("hits_es") > 0, "es")
            .otherwise("und"))
    return d.select("doc_id", pred.alias("pred_lang"),
                    "hits_en", "hits_de", "hits_es")


# --------------------------------------------------------------------------
# quality scoring: integer component counts + integer-math tier (float-free
# so the oracle hash matches bit-for-bit).
# --------------------------------------------------------------------------
@_register("quality_score", """
WITH c AS (
  SELECT doc_id,
    len(regexp_split_to_array(text, ' ')) AS n_tokens,
    length(text) AS n_chars_m,
    len(regexp_extract_all(text, '[[:punct:]]')) AS n_punct,
    len(list_filter(regexp_split_to_array(text, ' '),
        w -> w IN ('the','a','of','and','to','in','is','was'))) AS n_stop
  FROM documents)
SELECT doc_id, n_tokens, n_chars_m, n_punct, n_stop,
  CASE WHEN n_tokens >= 20 AND 100 * n_stop >= 2 * n_tokens
            AND 100 * n_punct <= 20 * n_tokens THEN 'high'
       WHEN n_tokens >= 5 THEN 'medium' ELSE 'low' END AS tier
FROM c
""")
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    stop = ", ".join(f"'{w}'" for w in _STOP["en"])
    c = _docs(spark, sf_dir).selectExpr(
        "doc_id",
        "size(split(text, ' ')) AS n_tokens",
        "length(text) AS n_chars_m",
        r"regexp_count(text, '[\\p{Punct}]') AS n_punct",
        f"size(filter(split(text, ' '), w -> w IN ({stop}))) AS n_stop")
    tier = (F.when((F.col("n_tokens") >= 20) &
                   (100 * F.col("n_stop") >= 2 * F.col("n_tokens")) &
                   (100 * F.col("n_punct") <= 20 * F.col("n_tokens")), "high")
            .when(F.col("n_tokens") >= 5, "medium").otherwise("low"))
    return c.select("doc_id", "n_tokens", "n_chars_m",
                    F.col("n_punct").cast("bigint").alias("n_punct"),
                    "n_stop", tier.alias("tier"))


# --------------------------------------------------------------------------
# token counting: whitespace + BPE-ish regex token classes.
# --------------------------------------------------------------------------
@_register("token_count", """
SELECT doc_id,
  len(regexp_split_to_array(text, ' ')) AS ws_tokens,
  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS bpe_ish_tokens,
  length(text) AS chars
FROM documents
""")
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).selectExpr(
        "doc_id",
        "size(split(text, ' ')) AS ws_tokens",
        "regexp_count(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]') AS bpe_ish_tokens",
        "length(text) AS chars",
    ).select("doc_id", "ws_tokens",
             F.col("bpe_ish_tokens").cast("bigint").alias("bpe_ish_tokens"),
             "chars")


# --------------------------------------------------------------------------
# document fingerprint: min/max md5 over 4-gram shingles (winnowing-lite,
# rolling-hash analog) — a stable content fingerprint for incremental dedup.
# --------------------------------------------------------------------------
@_register("doc_fingerprint", f"""
WITH sh AS (
  SELECT doc_id, unnest({_SHINGLE_DUCK}) AS shingle FROM documents
)
SELECT doc_id,
       substr(min(md5(shingle)), 1, 16) AS fp_min,
       substr(max(md5(shingle)), 1, 16) AS fp_max,
       count(DISTINCT shingle) AS n_shingles
FROM sh GROUP BY doc_id
""")
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = (_docs(spark, sf_dir)
          .select("doc_id", F.explode(F.expr(_SHINGLE_SPARK)).alias("shingle")))
    return sh.groupBy("doc_id").agg(
        F.substring(F.min(F.md5("shingle")), 1, 16).alias("fp_min"),
        F.substring(F.max(F.md5("shingle")), 1, 16).alias("fp_max"),
        F.countDistinct("shingle").alias("n_shingles"))


# --------------------------------------------------------------------------
# winnowing fingerprint selection (the MOSS algorithm, Schleimer et al.
# SIGMOD'03): over the ordered shingle-hash sequence, slide a window of
# W hashes and keep the window minimum (position-tiebroken) — any match of
# length >= W + k - 1 tokens between two documents is then GUARANTEED to
# share a selected fingerprint, while storage shrinks ~2/(W+1) per token.
# The window min is ordered-window work per doc (doc-keyed shuffle only);
# the (hash,pos) pair is tie-broken by encoding both into one fixed-width
# string so the SAME lexicographic min runs on both engines.
# --------------------------------------------------------------------------
_WINNOW_W = 4
# 32-bit shingle hash from the first 8 md5 nibbles (the simhash nibble
# trick: identical integer arithmetic on both engines)
_H32_SPARK = " + ".join(
    f"(cast({_HEXMAP_SPARK.format(c=f'substring(h, {j + 1}, 1)')} as bigint)"
    f" * {16 ** j})" for j in range(8))
_H32_DUCK = " + ".join(
    f"(CAST({_HEXMAP_DUCK.format(c=f'substr(h, {j + 1}, 1)')} AS BIGINT)"
    f" * {16 ** j})" for j in range(8))


@_register("doc_winnow", f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLE_DUCK} AS arr FROM documents
), pos AS (
  SELECT doc_id, i AS p, md5(arr[i + 1]) AS h
  FROM sh, unnest(range(0, len(arr))) AS t(i)
), hashed AS (
  SELECT doc_id, p, {_H32_DUCK} AS h32,
         count(*) OVER (PARTITION BY doc_id) AS n
  FROM pos
), winmin AS (
  -- window FIRST (over every row), valid-start filter AFTER: SQL's WHERE
  -- runs before window functions and would amputate the tail rows from
  -- the lookahead
  SELECT doc_id, p, n,
         min(lpad(CAST(h32 AS VARCHAR), 10, '0') || '|' ||
             lpad(CAST(p AS VARCHAR), 10, '0'))
           OVER (PARTITION BY doc_id ORDER BY p
                 ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING)
           AS s
  FROM hashed
), sel AS (
  SELECT doc_id, s FROM winmin WHERE p <= greatest(0, n - {_WINNOW_W})
)
SELECT DISTINCT doc_id,
       CAST(substr(s, 12, 10) AS BIGINT) AS pos,
       CAST(substr(s, 1, 10) AS BIGINT) AS fp
FROM sel
""")
def doc_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = (_docs(spark, sf_dir)
          .select("doc_id",
                  F.posexplode(F.expr(_SHINGLE_SPARK)).alias("p", "s"))
          .select("doc_id", "p", F.md5("s").alias("h")))
    hashed = (sh.withColumn("h32", F.expr(_H32_SPARK))
              .withColumn("n", F.count("*").over(
                  Window.partitionBy("doc_id"))))
    enc = F.concat(F.lpad(F.col("h32").cast("string"), 10, "0"),
                   F.lit("|"),
                   F.lpad(F.col("p").cast("string"), 10, "0"))
    w = (Window.partitionBy("doc_id").orderBy("p")
         .rowsBetween(Window.currentRow, _WINNOW_W - 1))
    sel = (hashed.withColumn("s", F.min(enc).over(w))
           .where(F.col("p") <= F.greatest(
               F.lit(0), F.col("n") - _WINNOW_W)))
    return (sel.select(
        "doc_id",
        F.substring("s", 12, 10).cast("bigint").alias("pos"),
        F.substring("s", 1, 10).cast("bigint").alias("fp"))
        .distinct())


# --------------------------------------------------------------------------
# vocabulary induction: the tokenizer-training stage of an LLM data
# pipeline — corpus-wide token frequencies (map-side-combinable hash
# aggregate), top-K vocabulary with a deterministic (count DESC, token)
# tie-break, and the coverage fraction each vocab entry contributes
# (the running statistic a BPE/unigram trainer thresholds on). The token
# classes are the same BPE-ish regex as token_count. One shuffle on the
# token key; K rows out. At 100 TB the partial aggregation bounds the
# exchange at |vocab| per partition, exactly like a word-count.
# --------------------------------------------------------------------------
_VOCAB_K = 500


@_register("vocab_topk", f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(text,
                '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS token
  FROM documents),
counts AS (
  SELECT token, count(*) AS n FROM toks GROUP BY token),
total AS (SELECT sum(n) AS t FROM counts),
ranked AS (
  SELECT token, n,
         row_number() OVER (ORDER BY n DESC, token) AS rank
  FROM counts)
SELECT rank, token, n,
       CAST(floor(n * 1000000.0 / t) AS BIGINT) AS coverage_ppm
FROM ranked, total
WHERE rank <= {_VOCAB_K}
""")
def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K corpus vocabulary with per-token coverage (ppm of all
    token occurrences, floored so both engines compare as integers).
    The global top-K window runs over the ALREADY-AGGREGATED count table
    (|vocab| rows, not |tokens|), so the single-partition window is a
    bounded-size driver-side concern, not a corpus-size one; at larger K
    swap in an orderBy(...).limit(K) which Spark executes as a
    TakeOrderedAndProject without a full sort."""
    toks = _docs(spark, sf_dir).select(
        F.explode(F.expr(
            "regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)"
        )).alias("token"))
    counts = toks.groupBy("token").agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("t"))
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    ranked = counts.withColumn("rank", F.row_number().over(w)) \
                   .where(F.col("rank") <= _VOCAB_K)
    return (ranked.crossJoin(F.broadcast(total))
            .select(F.col("rank").cast("bigint").alias("rank"),
                    "token", "n",
                    F.floor(F.col("n") * 1000000.0 / F.col("t"))
                     .cast("bigint").alias("coverage_ppm")))


# --------------------------------------------------------------------------
# benchmark decontamination: the eval-leak screening stage every serious
# training-data pipeline runs (GPT-3 §2.2 / PaLM-style 8-gram overlap,
# here over the repo's word-3-gram shingle unit). The "benchmark suite"
# is the shingle set of a held-out doc slice (doc_id % 100 < 2 — at
# production it is the actual eval-set shingle table); every other doc
# reports how many of its shingles collide and an is_contaminated flag.
# Shape: benchmark side is TINY and broadcast; the corpus side streams
# through one equi-join on the shingle key then hash-aggregates per doc
# — no shuffle of the big side beyond the doc_id rollup.
# --------------------------------------------------------------------------
@_register("decontaminate_ngram", f"""
WITH bench AS (
  SELECT DISTINCT unnest({_SHINGLE_DUCK}) AS shingle
  FROM documents WHERE doc_id % 100 < 2),
corpus AS (
  SELECT doc_id, unnest({_SHINGLE_DUCK}) AS shingle
  FROM documents WHERE doc_id % 100 >= 2),
hits AS (
  SELECT c.doc_id, count(*) AS n_hits,
         count(DISTINCT c.shingle) AS n_distinct_hits
  FROM corpus c JOIN bench b USING (shingle)
  GROUP BY c.doc_id)
SELECT d.doc_id,
       coalesce(h.n_hits, 0) AS n_hits,
       coalesce(h.n_distinct_hits, 0) AS n_distinct_hits,
       coalesce(h.n_hits, 0) > 0 AS is_contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 100 >= 2) d
LEFT JOIN hits h ON d.doc_id = h.doc_id
""")
def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    bench = (docs.where("doc_id % 100 < 2")
             .select(F.explode(F.expr(_SHINGLE_SPARK)).alias("shingle"))
             .distinct())
    corpus = (docs.where("doc_id % 100 >= 2")
              .select("doc_id",
                      F.explode(F.expr(_SHINGLE_SPARK)).alias("shingle")))
    hits = (corpus.join(F.broadcast(bench), "shingle")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_hits"),
                 F.countDistinct("shingle").alias("n_distinct_hits")))
    return (docs.where("doc_id % 100 >= 2").select("doc_id")
            .join(hits, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                    F.coalesce("n_distinct_hits", F.lit(0))
                     .alias("n_distinct_hits"),
                    (F.coalesce("n_hits", F.lit(0)) > 0)
                     .alias("is_contaminated")))


# --------------------------------------------------------------------------
# PII detection + redaction: emails and long digit runs (phone-like)
# counted and replaced — the scrubbing stage before anything ships to a
# training mix. Deterministic synthetic PII is appended per doc so the
# operator has ground truth in both engines; the patterns and the
# redaction are plain regex column ops (JVM-side in Spark). Output is
# the count per class and an md5 of the redacted text, proving both
# engines performed the identical rewrite.
# --------------------------------------------------------------------------
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


@_register("pii_scrub", f"""
WITH aug AS (
  SELECT doc_id,
         text || ' Contact u' || doc_id || '@mail-' ||
         (doc_id % 7) || '.org or ' ||
         lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
         lpad(CAST((doc_id * 3) % 1000 AS VARCHAR), 3, '0') ||
         '-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
           AS text
  FROM documents)
SELECT doc_id,
       len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phones,
       md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>',
                                         'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
FROM aug
""")
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    aug = _docs(spark, sf_dir).selectExpr(
        "doc_id",
        "concat(text, ' Contact u', doc_id, '@mail-', doc_id % 7, "
        "'.org or ', lpad(CAST(doc_id % 1000 AS STRING), 3, '0'), '-', "
        "lpad(CAST((doc_id * 3) % 1000 AS STRING), 3, '0'), '-', "
        "lpad(CAST((doc_id * 7) % 10000 AS STRING), 4, '0')) AS text")
    return aug.select(
        "doc_id",
        F.expr(f"regexp_count(text, '{_EMAIL_RE}')").cast("bigint")
         .alias("n_emails"),
        F.expr(f"regexp_count(text, '{_PHONE_RE}')").cast("bigint")
         .alias("n_phones"),
        F.md5(F.regexp_replace(
            F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE, "<PHONE>")).alias("redacted_md5"))


# --------------------------------------------------------------------------
# within-document repetition (Gopher / RefinedWeb quality rules): the
# duplicate-shingle fraction — 1 - distinct/total over word 3-grams —
# flags boilerplate/spam that char-level quality_score misses. Integer
# ppm so both engines hash-compare exactly. Pure per-doc expressions:
# no shuffle at all (the aggregate is over each row's own shingle list).
# --------------------------------------------------------------------------
@_register("quality_repetition", f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLE_DUCK} AS shingles FROM documents)
SELECT doc_id,
       len(shingles) AS n_shingles,
       len(list_distinct(shingles)) AS n_distinct,
       CASE WHEN len(shingles) > 0
            THEN CAST(floor((len(shingles) - len(list_distinct(shingles)))
                            * 1000000.0 / len(shingles)) AS BIGINT)
            ELSE 0 END AS dup_ppm
FROM sh
""")
def quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _docs(spark, sf_dir).select(
        "doc_id", F.expr(_SHINGLE_SPARK).alias("shingles"))
    n = F.size("shingles")
    nd = F.size(F.array_distinct("shingles"))
    return sh.select(
        "doc_id",
        n.cast("bigint").alias("n_shingles"),
        nd.cast("bigint").alias("n_distinct"),
        F.when(n > 0, F.floor((n - nd) * 1000000.0 / n))
         .otherwise(F.lit(0)).cast("bigint").alias("dup_ppm"))


# --------------------------------------------------------------------------
# stratified sampling for data mixing: keep-rate per stratum (the lang
# column), membership decided by a deterministic md5-derived bucket of
# doc_id — the exact mechanism a training mix uses so reruns and
# downstream joins see the same sample. Bucket = first two md5 nibbles
# (0..255) % 100; engine-portable because both sides read the same hex
# characters. Pure row-local expressions + one hash-agg rollup.
# --------------------------------------------------------------------------
_MIX_RATES = {"en": 80, "de": 40, "fr": 40}  # percent kept; default 20


@_register("sample_mix_stratified", """
WITH b AS (
  SELECT doc_id, lang,
         ((strpos('0123456789abcdef',
                  substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
          + strpos('0123456789abcdef',
                   substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
           % 100 AS bucket,
         CASE WHEN lang = 'en' THEN 80
              WHEN lang IN ('de', 'fr') THEN 40 ELSE 20 END AS rate
  FROM documents)
SELECT lang, rate,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN bucket < rate THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       min(CASE WHEN bucket < rate THEN doc_id END) AS first_kept_doc
FROM b GROUP BY lang, rate
""")
def sample_mix_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _docs(spark, sf_dir).selectExpr(
        "doc_id", "lang",
        "((instr('0123456789abcdef', "
        "substring(md5(CAST(doc_id AS STRING)), 1, 1)) - 1) * 16 + "
        "instr('0123456789abcdef', "
        "substring(md5(CAST(doc_id AS STRING)), 2, 1)) - 1) % 100 "
        "AS bucket",
        "CASE WHEN lang = 'en' THEN 80 "
        "WHEN lang IN ('de', 'fr') THEN 40 ELSE 20 END AS rate")
    return (b.groupBy("lang", "rate")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.when(F.col("bucket") < F.col("rate"), 1)
                        .otherwise(0)).alias("n_kept"),
                 F.min(F.when(F.col("bucket") < F.col("rate"),
                              F.col("doc_id"))).alias("first_kept_doc"))
            .select("lang", F.col("rate").cast("bigint").alias("rate"),
                    "n_docs", "n_kept", "first_kept_doc"))


# --------------------------------------------------------------------------
# sequence packing (concat-and-chunk): the tokenize-and-pack bookkeeping
# of LLM pretraining — documents are concatenated in doc_id order and
# chunked into fixed BLOCK-token training sequences; each doc reports its
# global token offset and the block span it lands in. The corpus-wide
# prefix sum is computed the SCALABLE way: docs are bucketed by
# doc_id range, the running sum is a window WITHIN each bucket (parallel,
# bounded partitions), and each bucket adds a broadcast base offset from
# the tiny per-bucket-totals table — the classic two-pass distributed
# prefix sum. No global single-partition window anywhere (plan-gated in
# tests); at 10^12 docs the per-bucket windows shard and the base table
# stays |buckets| rows.
# --------------------------------------------------------------------------
_PACK_BLOCK = 512
_PACK_BUCKET = 1000  # docs per prefix-sum bucket


@_register("pack_sequences", f"""
WITH toks AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
           AS n_tokens
  FROM documents),
pref AS (
  SELECT doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS tok_offset
  FROM toks)
SELECT doc_id, n_tokens, tok_offset,
       tok_offset // {_PACK_BLOCK} AS first_block,
       CASE WHEN n_tokens > 0
            THEN (tok_offset + n_tokens - 1) // {_PACK_BLOCK}
            ELSE tok_offset // {_PACK_BLOCK} END AS last_block,
       tok_offset % {_PACK_BLOCK} AS tok_offset_in_block
FROM pref
""")
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    toks = _docs(spark, sf_dir).selectExpr(
        "doc_id",
        "CAST(regexp_count(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]') "
        "AS BIGINT) AS n_tokens",
        f"CAST(doc_id DIV {_PACK_BUCKET} AS BIGINT) AS bucket")
    # pass 1: tiny per-bucket totals -> exclusive base offsets (broadcast)
    bases = (toks.groupBy("bucket").agg(F.sum("n_tokens").alias("bt"))
             .withColumn("base",
                         F.coalesce(
                             F.sum("bt").over(
                                 Window.orderBy("bucket")
                                 .rowsBetween(Window.unboundedPreceding,
                                              -1)),
                             F.lit(0)))
             .select("bucket", "base"))
    # pass 2: parallel within-bucket running sums + broadcast base add
    w = (Window.partitionBy("bucket").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    pref = (toks.join(F.broadcast(bases), "bucket")
            .withColumn("tok_offset",
                        F.col("base") + F.sum("n_tokens").over(w)
                        - F.col("n_tokens")))
    blk = F.lit(_PACK_BLOCK)
    return pref.select(
        "doc_id", "n_tokens", "tok_offset",
        (F.col("tok_offset") / blk).cast("bigint").alias("first_block"),
        F.when(F.col("n_tokens") > 0,
               ((F.col("tok_offset") + F.col("n_tokens") - 1) / blk)
               .cast("bigint"))
         .otherwise((F.col("tok_offset") / blk).cast("bigint"))
         .alias("last_block"),
        (F.col("tok_offset") % blk).alias("tok_offset_in_block"))


# --------------------------------------------------------------------------
# exact substring-span dedup (Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better" — the ExactSubstr variant re-expressed as
# joins instead of a suffix array): any K-token run that appears verbatim
# in >= 2 distinct documents is a duplicated region; overlapping /
# adjacent duplicated runs inside one document merge into maximal spans.
#
# Shape: posexplode K-token shingles -> (hash, doc) distinct ->
# map-side-combinable count per hash -> cross-doc filter -> join back to
# positions -> per-doc interval merge with one running-max window.
# Shuffles are on the shingle hash (bounded key, combinable) and on
# doc_id (the window) — the inverted-index pattern that holds at 100 TB.
# A shingle shared by millions of docs legitimately explodes to all its
# positions (every copy IS a duplicate span); the per-doc side stays
# O(doc tokens). All-integer output: exact cross-engine oracle.
# --------------------------------------------------------------------------
_SUBSTR_K = 8

_SUBSTR_POS_SPARK = f"""
transform(
  sequence(0, size(split(text, ' ')) - {_SUBSTR_K}),
  p -> struct(p AS p,
              md5(concat_ws(' ', slice(split(text, ' '), p + 1,
                                       {_SUBSTR_K}))) AS h))
"""

_SUBSTR_POS_DUCK = f"""
SELECT doc_id, i AS p,
       md5(array_to_string(arr[i + 1 : i + {_SUBSTR_K}], ' ')) AS h
FROM (SELECT doc_id, regexp_split_to_array(text, ' ') AS arr
      FROM documents) t,
     unnest(range(0, len(arr) - {_SUBSTR_K} + 1)) AS u(i)
WHERE len(arr) >= {_SUBSTR_K}
"""


@_register("dedup_substring_spans", f"""
WITH pos AS (
  {_SUBSTR_POS_DUCK}
), dup AS (
  SELECT h, count(DISTINCT doc_id) AS ndocs
  FROM pos GROUP BY h HAVING count(DISTINCT doc_id) >= 2
), hit AS (
  SELECT pos.doc_id, pos.p, dup.ndocs FROM pos JOIN dup USING (h)
), m AS (
  SELECT doc_id, p, ndocs,
         max(p + {_SUBSTR_K} - 1) OVER (
           PARTITION BY doc_id ORDER BY p
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM hit
), g AS (
  SELECT doc_id, p, ndocs,
         sum(CASE WHEN prev_end IS NULL OR p > prev_end + 1
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY p) AS grp
  FROM m
)
SELECT doc_id,
       min(p) AS span_start,
       max(p) + {_SUBSTR_K} - 1 AS span_end,
       max(p) + {_SUBSTR_K} - min(p) AS dup_tokens,
       count(*) AS n_dup_shingles,
       CAST(max(ndocs) AS BIGINT) AS max_docs
FROM g GROUP BY doc_id, grp
""")
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    pos = (_docs(spark, sf_dir)
           .where(F.size(F.split("text", " ")) >= _SUBSTR_K)
           .select("doc_id",
                   F.explode(F.expr(_SUBSTR_POS_SPARK)).alias("s"))
           .select("doc_id", F.col("s.p").alias("p"),
                   F.col("s.h").alias("h")))
    # two-stage distinct-then-count: both stages map-side combinable
    # (countDistinct would carry a per-key set through the shuffle)
    dup = (pos.select("h", "doc_id").distinct()
           .groupBy("h").agg(F.count("*").alias("ndocs"))
           .where(F.col("ndocs") >= 2))
    hit = pos.join(dup, "h").select("doc_id", "p", "ndocs")
    wprev = (Window.partitionBy("doc_id").orderBy("p")
             .rowsBetween(Window.unboundedPreceding, -1))
    wrun = (Window.partitionBy("doc_id").orderBy("p")
            .rowsBetween(Window.unboundedPreceding, 0))
    m = hit.withColumn(
        "prev_end", F.max(F.col("p") + _SUBSTR_K - 1).over(wprev))
    g = m.withColumn(
        "grp",
        F.sum(F.when(F.col("prev_end").isNull()
                     | (F.col("p") > F.col("prev_end") + 1), 1)
              .otherwise(0)).over(wrun))
    return (g.groupBy("doc_id", "grp")
            .agg(F.min("p").alias("span_start"),
                 (F.max("p") + _SUBSTR_K - 1).alias("span_end"),
                 (F.max("p") + _SUBSTR_K - F.min("p")).alias("dup_tokens"),
                 F.count("*").alias("n_dup_shingles"),
                 F.max("ndocs").alias("max_docs"))
            .drop("grp"))


# --------------------------------------------------------------------------
# LM-surprisal quality score (the CCNet quality-filter stage, made
# engine-exact): under Zipf's law P(w) ~ 1/rank, a token's surprisal is
# ~ log2(rank) + const, so a document's mean floor(log2(rank)) over the
# corpus-induced frequency ranks is a deterministic integer proxy for LM
# perplexity — low = boilerplate of ultra-common tokens, high = rare-token
# noise; quality filters keep the middle band. floor(log2) is a generated
# power-of-two CASE ladder (pure integer compares, identical both engines;
# no float log whose last ulp could flip a 6-dp hash).
#
# Shape: one token-key aggregate (map-side combinable) -> |vocab|-row rank
# window (bounded artifact-size concern, same note as vocab_topk) ->
# token->rank join (AQE broadcasts the vocab side when it fits; at 10M+
# vocab it degrades to a shuffled hash join on the token key) -> per-doc
# aggregate. n_rare counts tokens outside the induced top-K vocab.
# --------------------------------------------------------------------------
def _floor_log2_sql(col: str, max_bits: int = 40) -> str:
    whens = " ".join(f"WHEN {col} >= {1 << b} THEN {b}"
                     for b in range(max_bits, 0, -1))
    return f"CASE {whens} ELSE 0 END"


@_register("quality_lm_rank", f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS token
  FROM documents),
counts AS (
  SELECT token, count(*) AS n FROM toks GROUP BY token),
ranked AS (
  SELECT token, row_number() OVER (ORDER BY n DESC, token) AS rank
  FROM counts),
scored AS (
  SELECT t.doc_id, r.rank, {_floor_log2_sql('r.rank')} AS bits
  FROM toks t JOIN ranked r USING (token))
SELECT doc_id,
       count(*) AS n_tokens,
       CAST(sum(CASE WHEN rank > {_VOCAB_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_rare,
       CAST(sum(bits) AS BIGINT) AS bits_total,
       CAST(sum(bits) * 1000 // count(*) AS BIGINT) AS mean_millibits
FROM scored GROUP BY doc_id
""")
def quality_lm_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _docs(spark, sf_dir).select(
        "doc_id",
        F.explode(F.expr(
            "regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)"
        )).alias("token"))
    counts = toks.groupBy("token").agg(F.count("*").alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    ranked = counts.select(
        "token", F.row_number().over(w).alias("rank"))
    scored = (toks.join(ranked, "token")
              .select("doc_id", "rank",
                      F.expr(_floor_log2_sql("rank")).alias("bits")))
    return (scored.groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.sum(F.when(F.col("rank") > _VOCAB_K, 1).otherwise(0))
                  .cast("bigint").alias("n_rare"),
                 F.sum("bits").cast("bigint").alias("bits_total"),
                 F.expr("CAST(sum(bits) * 1000 DIV count(*) AS BIGINT)")
                  .alias("mean_millibits")))


# --------------------------------------------------------------------------
# TF-IDF keyword extraction: top-K characteristic terms per document —
# the per-doc topical summary stage (domain tagging / clustering features
# in a training-data pipeline). IDF's log is the same power-of-two CASE
# ladder as quality_lm_rank (integer-exact): score = tf * (1 +
# floor(log2(N // df))); ties break (score DESC, token ASC). Alphabetic
# tokens only, length >= 3, so punctuation/number classes never rank.
#
# Shape: (doc, token) tf aggregate -> token-keyed df aggregate (both
# map-side combinable) -> join on token (AQE broadcasts the df side when
# it fits) -> per-doc top-K window (doc-keyed shuffle only).
# --------------------------------------------------------------------------
_KW_K = 5


@_register("doc_keywords_tfidf", f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text),
                 '[a-z][a-z][a-z]+')) AS token
  FROM documents),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
ndocs AS (SELECT count(*) AS n FROM documents),
df AS (
  SELECT token, count(*) AS df FROM tf GROUP BY token),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         tf.tf * (1 + {_floor_log2_sql('(n // df.df)')}) AS score
  FROM tf JOIN df USING (token), ndocs),
ranked AS (
  SELECT doc_id, token, tf, df, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, token) AS rank
  FROM scored)
SELECT doc_id, rank, token, tf, df, CAST(score AS BIGINT) AS score
FROM ranked WHERE rank <= {_KW_K}
""")
def doc_keywords_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _docs(spark, sf_dir).select(
        "doc_id",
        F.explode(F.expr(
            "regexp_extract_all(lower(text), '[a-z][a-z][a-z]+', 0)"
        )).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    ndocs = _docs(spark, sf_dir).agg(F.count("*").alias("n"))
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    scored = (tf.join(df, "token").crossJoin(F.broadcast(ndocs))
              .withColumn(
                  "score",
                  F.col("tf") * (1 + F.expr(
                      _floor_log2_sql("(n DIV df)")))))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "token")
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= _KW_K)
            .select("doc_id", "rank", "token", "tf", "df",
                    F.col("score").cast("bigint").alias("score")))


# --------------------------------------------------------------------------
# source/domain-level rollup — the C4 / RefinedWeb "drop bad domains"
# stage: per source, volume, exact-duplicate rate (ppm), mean doc length,
# short-doc fraction and distinct languages, so a pipeline can threshold
# whole sources before paying per-doc costs downstream. Two map-side-
# combinable aggregates (content-hash groups, then source groups) — the
# per-source cardinality is bounded by the domain count, tiny at any
# corpus scale; the hash aggregate is the same shuffle dedup_exact pays.
# --------------------------------------------------------------------------
@_register("source_stats", """
WITH h AS (
  SELECT source, lang, md5(text) AS hash,
         len(regexp_split_to_array(text, ' ')) AS n_tokens
  FROM documents),
g AS (
  SELECT source, lang, hash, n_tokens,
         count(*) OVER (PARTITION BY hash) AS copies
  FROM h)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN copies > 1 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS dup_ppm,
       CAST(sum(n_tokens) // count(*) AS BIGINT) AS mean_tokens,
       CAST(sum(CASE WHEN n_tokens < 20 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS short_ppm,
       count(DISTINCT lang) AS n_langs
FROM g GROUP BY source
""")
def source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _docs(spark, sf_dir).select(
        "source", "lang", F.md5("text").alias("hash"),
        F.size(F.split("text", " ")).alias("n_tokens"))
    g = h.withColumn(
        "copies", F.count("*").over(Window.partitionBy("hash")))
    return (g.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.expr("CAST(sum(CASE WHEN copies > 1 THEN 1 ELSE 0 END)"
                        " * 1000000 DIV count(*) AS BIGINT)")
                  .alias("dup_ppm"),
                 F.expr("CAST(sum(n_tokens) DIV count(*) AS BIGINT)")
                  .alias("mean_tokens"),
                 F.expr("CAST(sum(CASE WHEN n_tokens < 20 THEN 1 ELSE 0 "
                        "END) * 1000000 DIV count(*) AS BIGINT)")
                  .alias("short_ppm"),
                 F.countDistinct("lang").alias("n_langs")))


@_register("mixing_rates", """
WITH tok AS (
  SELECT source,
         CAST(sum(len(regexp_split_to_array(text, ' '))) AS BIGINT)
           AS tokens
  FROM documents GROUP BY source),
w AS (
  SELECT source, tokens,
         CAST(floor(sqrt(tokens)) AS BIGINT) AS weight
  FROM tok),
tot AS (
  SELECT CAST(sum(weight) AS BIGINT) AS sum_w,
         CAST(min(tokens * (SELECT sum(weight) FROM w) // weight)
              AS BIGINT) AS t_star
  FROM w)
SELECT w.source, w.tokens, w.weight,
       CAST(w.weight * 1000000 // t.sum_w AS BIGINT) AS target_ppm,
       CAST(least(t.t_star * w.weight * 1000000 //
                  (t.sum_w * w.tokens), 1000000) AS BIGINT)
         AS keep_ppm,
       CAST(w.tokens * (least(t.t_star * w.weight * 1000000 //
                              (t.sum_w * w.tokens), 1000000)) // 1000000
            AS BIGINT) AS planned_tokens
FROM w, tot t
""")
def mixing_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing rate solver (the Pile/Dolma/Gopher mixture stage):
    per-source downsampling rates that hit a temperature-reweighted
    target distribution with NO upsampling.

    Target share of source s is proportional to sqrt(tokens_s) — the
    tau=2 temperature reweighting that flattens head domains (the
    multilingual-sampling trick applied to domain mixing). The largest
    achievable corpus under downsampling-only is the water-fill
    closed form T* = min_s floor(tokens_s * sum_w / w_s) (the binding
    source is kept whole); keep_ppm_s = floor(T* * w_s * 1e6 /
    (sum_w * tokens_s)) — ALL integer arithmetic after one
    correctly-rounded sqrt (IEEE754 sqrt is exact-deterministic across
    engines; counts < 2^53), so the DuckDB oracle matches bit-for-bit.

    Spark shape: one hash aggregate per source (map-side combinable
    token sum), then a broadcast join against the single-row totals —
    the big table is scanned once, no window over the corpus."""
    tok = (_docs(spark, sf_dir)
           .groupBy("source")
           .agg(F.sum(F.size(F.split("text", " ")))
                .cast("bigint").alias("tokens")))
    w = tok.withColumn(
        "weight", F.floor(F.sqrt(F.col("tokens"))).cast("bigint"))
    sums = w.agg(F.sum("weight").cast("bigint").alias("sum_w"))
    tstar = (w.crossJoin(F.broadcast(sums))
             .select(F.expr("tokens * sum_w DIV weight").alias("cap"))
             .agg(F.min("cap").cast("bigint").alias("t_star")))
    totals = F.broadcast(sums.crossJoin(F.broadcast(tstar)))
    return (w.crossJoin(totals)
            .select("source", "tokens", "weight",
                    F.expr("weight * 1000000 DIV sum_w")
                    .cast("bigint").alias("target_ppm"),
                    F.expr("least(t_star * weight * 1000000 DIV "
                           "(sum_w * tokens), CAST(1000000 AS BIGINT))")
                    .cast("bigint").alias("keep_ppm"))
            .withColumn("planned_tokens",
                        F.expr("tokens * keep_ppm DIV 1000000")
                        .cast("bigint")))


@_register("quality_bigram_novelty", """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(text, ' ') AS t FROM documents
), bg AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t)),
                               i -> t[i] || ' ' || t[i + 1])) AS bigram
  FROM toks WHERE len(t) >= 2
), df AS (
  SELECT bigram, count(*) AS df FROM bg GROUP BY bigram
)
SELECT b.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS novel,
       CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS novel_ppm
FROM bg b JOIN df d ON d.bigram = b.bigram
GROUP BY b.doc_id
""")
def quality_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-novelty quality score: per document, the fraction (ppm) of
    its DISTINCT word bigrams that occur in no other document. Low
    novelty = boilerplate/template text sharing its phrasing corpus-wide;
    near-total novelty on a large corpus flags gibberish — the two tails
    a crawl-quality filter cuts. Complements quality_repetition (which is
    within-doc) with a cross-doc phrase statistic.

    Shape: explode per-doc distinct bigrams (corpus-token-bounded), one
    map-side-combinable document-frequency aggregate, one equi-join back
    on the bigram key, one per-doc aggregate. All integer arithmetic
    (count + ppm by truncating division). At crawl scale the df join is
    the standard hot-key surface — the same mitigation as
    dedup_jaccard_pairs' JACCARD_DF_CAP applies (drop bigrams above a df
    cap: they are by definition not novel, so the novel count is
    unaffected; only n_bigrams bookkeeping would shift — documented, not
    applied at test scale so the oracle stays exhaustive). Docs with < 2
    tokens have no bigram and are absent, like dedup shingle ops.
    """
    toks = (_docs(spark, sf_dir)
            .select("doc_id", F.split("text", " ").alias("t"))
            .where(F.size("t") >= 2))
    bg = (toks.select(
        "doc_id",
        F.explode(F.expr(
            "transform(sequence(1, size(t) - 1), "
            "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"))
        .alias("bigram"))
        .distinct())
    df = bg.groupBy("bigram").agg(F.count("*").alias("df"))
    return (bg.join(df, "bigram")
            .groupBy("doc_id")
            .agg(F.count("*").cast("bigint").alias("n_bigrams"),
                 F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
                 .cast("bigint").alias("novel"))
            .withColumn("novel_ppm",
                        F.expr("novel * 1000000 DIV n_bigrams")
                        .cast("bigint")))


# --------------------------------------------------------------------------
# deterministic train/val/test split — every training pipeline's first
# materialization: membership by a doc_id-keyed md5 bucket (three nibbles,
# 0..4095, thresholded at 90% / 95% of 4096) so reruns, resumes, and
# downstream joins all see the same assignment with no RNG state. Pure
# row-local expressions; engine-portable via the same hex-nibble reading
# as sample_mix_stratified.
# --------------------------------------------------------------------------
_SPLIT_TRAIN_LT = 3687   # floor(4096 * 0.90)
_SPLIT_VAL_LT = 3892     # floor(4096 * 0.95); >= 3892 → test


def _hex3_bucket_sql(strpos: str, substr: str,
                     strtype: str = "VARCHAR") -> str:
    """0..4095 bucket from the first three md5 nibbles of doc_id —
    `strpos`/`substr`/`strtype` spell the engine's names."""
    h = f"md5(CAST(doc_id AS {strtype}))"
    nib = (f"({strpos}('0123456789abcdef', {substr}({h}, {{i}}, 1)) - 1)")
    return (f"({nib.format(i=1)} * 256 + {nib.format(i=2)} * 16 "
            f"+ {nib.format(i=3)})")


@_register("split_assign", f"""
WITH b AS (
  SELECT doc_id, lang, source,
         {_hex3_bucket_sql('strpos', 'substr')} AS bucket
  FROM documents)
SELECT doc_id, lang, source,
       CASE WHEN bucket < {_SPLIT_TRAIN_LT} THEN 'train'
            WHEN bucket < {_SPLIT_VAL_LT} THEN 'val'
            ELSE 'test' END AS split
FROM b
""")
def split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document deterministic split assignment (train/val/test ≈
    90/5/5). The bucket is a pure function of doc_id, so the split is
    stable under reruns, repartitioning, and incremental appends — the
    property a with-RNG split cannot give without persisting state. At
    crawl scale this is a row-local projection (no shuffle, no join);
    the split column is what the output writer partitions by."""
    return _docs(spark, sf_dir).selectExpr(
        "doc_id", "lang", "source",
        f"CASE WHEN {_hex3_bucket_sql('instr', 'substring', 'STRING')} "
        f"< {_SPLIT_TRAIN_LT} THEN 'train' "
        f"WHEN {_hex3_bucket_sql('instr', 'substring', 'STRING')} "
        f"< {_SPLIT_VAL_LT} THEN 'val' ELSE 'test' END AS split")


@_register("corpus_profile", """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS p50_chars,
       CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS p90_chars
FROM documents GROUP BY source
""")
def corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus profile: doc counts, char mass, and EXACT
    discrete length percentiles (percentile_disc — the smallest value at
    cumulative probability >= p, identical in both engines; approximate
    percentile sketches would not hash-compare). The profiling pass a
    crawl pipeline runs before choosing filter thresholds. One hash
    aggregate; percentile_disc sorts within each source group — at crawl
    scale sources are many and the per-group sort is partition-local
    after the shuffle-on-source, the same cost class as any grouped
    quantile."""
    return (_docs(spark, sf_dir)
            .groupBy("source")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.sum("n_chars").cast("bigint").alias("total_chars"),
                 F.min("n_chars").cast("bigint").alias("min_chars"),
                 F.max("n_chars").cast("bigint").alias("max_chars"),
                 F.expr("CAST(percentile_disc(0.5) WITHIN GROUP "
                        "(ORDER BY n_chars) AS BIGINT)").alias("p50_chars"),
                 F.expr("CAST(percentile_disc(0.9) WITHIN GROUP "
                        "(ORDER BY n_chars) AS BIGINT)").alias("p90_chars")))


# --------------------------------------------------------------------------
# corpus curation — the capstone composition: the per-document KEEP/DROP
# decision a training-data pipeline materializes by chaining the stages
# this module provides (exact dedup -> benchmark holdout -> n-gram
# decontamination -> quality tier -> split assignment). One row per
# document with the decision and the FIRST failing reason (priority:
# duplicate > benchmark > contaminated > low_quality), so downstream
# audits can reconstruct every cut. Pure composition of the already-
# oracled stage outputs, joined on the doc key — five doc_id equi-joins,
# no new shapes.
# --------------------------------------------------------------------------
@_register("corpus_curation", """
WITH dd AS (
  SELECT doc_id,
         (doc_id = min(doc_id) OVER (PARTITION BY md5(text)))
           AS is_canonical
  FROM documents),
q AS (
  SELECT doc_id,
    len(regexp_split_to_array(text, ' ')) AS n_tokens,
    len(regexp_extract_all(text, '[[:punct:]]')) AS n_punct,
    len(list_filter(regexp_split_to_array(text, ' '),
        w -> w IN ('the','a','of','and','to','in','is','was'))) AS n_stop
  FROM documents),
qt AS (
  SELECT doc_id,
    CASE WHEN n_tokens >= 20 AND 100 * n_stop >= 2 * n_tokens
              AND 100 * n_punct <= 20 * n_tokens THEN 'high'
         WHEN n_tokens >= 5 THEN 'medium' ELSE 'low' END AS tier
  FROM q),
bench AS (
  SELECT DISTINCT unnest(
    list_transform(
      range(1, greatest(len(regexp_split_to_array(text, ' ')) - 1, 1)),
      i -> regexp_split_to_array(text, ' ')[i] || ' ' ||
           regexp_split_to_array(text, ' ')[i+1] || ' ' ||
           regexp_split_to_array(text, ' ')[i+2])) AS shingle
  FROM documents WHERE doc_id % 100 < 2),
corpus AS (
  SELECT doc_id, unnest(
    list_transform(
      range(1, greatest(len(regexp_split_to_array(text, ' ')) - 1, 1)),
      i -> regexp_split_to_array(text, ' ')[i] || ' ' ||
           regexp_split_to_array(text, ' ')[i+1] || ' ' ||
           regexp_split_to_array(text, ' ')[i+2])) AS shingle
  FROM documents WHERE doc_id % 100 >= 2),
cont AS (
  SELECT DISTINCT c.doc_id FROM corpus c JOIN bench b USING (shingle)),
sp AS (
  SELECT doc_id,
         ((strpos('0123456789abcdef',
                  substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 256
          + (strpos('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 16
          + (strpos('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1))
           AS bucket
  FROM documents)
SELECT d.doc_id, dd.is_canonical, qt.tier,
       (d.doc_id % 100 < 2) AS is_benchmark,
       (cont.doc_id IS NOT NULL) AS is_contaminated,
       CASE WHEN sp.bucket < 3687 THEN 'train'
            WHEN sp.bucket < 3892 THEN 'val' ELSE 'test' END AS split,
       CASE WHEN NOT dd.is_canonical THEN 'duplicate'
            WHEN d.doc_id % 100 < 2 THEN 'benchmark'
            WHEN cont.doc_id IS NOT NULL THEN 'contaminated'
            WHEN qt.tier = 'low' THEN 'low_quality'
       END AS drop_reason,
       (dd.is_canonical AND d.doc_id % 100 >= 2
        AND cont.doc_id IS NULL AND qt.tier <> 'low') AS keep
FROM documents d
JOIN dd ON dd.doc_id = d.doc_id
JOIN qt ON qt.doc_id = d.doc_id
JOIN sp ON sp.doc_id = d.doc_id
LEFT JOIN cont ON cont.doc_id = d.doc_id
""")
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composes the registry's own stage queries (dedup_exact, the
    quality tier, decontaminate_ngram's hit set, split_assign) into the
    per-document keep/drop table — proving the stages CHAIN, not just
    run alone."""
    dd = QUERIES["dedup_exact"][0](spark, sf_dir) \
        .select("doc_id", F.col("keep").alias("is_canonical"))
    qt = QUERIES["quality_score"][0](spark, sf_dir) \
        .select("doc_id", "tier")
    cont = (QUERIES["decontaminate_ngram"][0](spark, sf_dir)
            .where(F.col("is_contaminated"))
            .select("doc_id", F.lit(True).alias("_cont")))
    sp = QUERIES["split_assign"][0](spark, sf_dir) \
        .select("doc_id", "split")
    d = _docs(spark, sf_dir).select("doc_id")
    j = (d.join(dd, "doc_id").join(qt, "doc_id").join(sp, "doc_id")
         .join(cont, "doc_id", "left")
         .withColumn("is_benchmark", F.expr("doc_id % 100 < 2"))
         .withColumn("is_contaminated",
                     F.coalesce("_cont", F.lit(False))))
    return j.select(
        "doc_id", "is_canonical", "tier", "is_benchmark",
        "is_contaminated", "split",
        F.expr("CASE WHEN NOT is_canonical THEN 'duplicate' "
               "WHEN is_benchmark THEN 'benchmark' "
               "WHEN is_contaminated THEN 'contaminated' "
               "WHEN tier = 'low' THEN 'low_quality' END")
        .alias("drop_reason"),
        F.expr("is_canonical AND NOT is_benchmark AND NOT "
               "is_contaminated AND tier <> 'low'").alias("keep"))
