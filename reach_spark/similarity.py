"""Similarity search over the `embeddings` table (vec_id, embedding
float[64], label): brute-force cosine top-k baseline + an LSH-bucketed
(sign-projection) scale path.

Spark shape: cosine is zip_with/aggregate over double arrays — pure JVM
expressions, no Python. Ranks are made engine-deterministic by rounding the
similarity to 6 dp and tie-breaking on neighbor id. The LSH variant buckets
by the sign pattern of the first 8 dims: the crossjoin collapses to a
bucket-equi-join (the 100 TB path; add more planes for finer buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

QUERIES: dict[str, tuple] = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = (fn, oracle)
        return fn
    return deco


_COS_SPARK = """
round(
  aggregate(zip_with(qa, na, (x, y) -> x * y), 0d, (a, v) -> a + v)
  / (sqrt(aggregate(qa, 0d, (a, v) -> a + v * v))
     * sqrt(aggregate(na, 0d, (a, v) -> a + v * v))), 6)
"""

_N_QUERIES = 10
_TOP_K = 5


@_register("ann_topk_bruteforce", f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qa FROM embeddings
  WHERE vec_id < {_N_QUERIES}
), n AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS na FROM embeddings
), scored AS (
  SELECT query_id, neighbor_id,
         round(list_cosine_similarity(qa, na), 6) AS sim
  FROM q CROSS JOIN n WHERE query_id <> neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, rank, neighbor_id, sim FROM ranked WHERE rank <= {_TOP_K}
""")
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = (emb.where(F.col("vec_id") < _N_QUERIES)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").cast("array<double>").alias("qa")))
    n = emb.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("embedding").cast("array<double>").alias("na"))
    scored = (F.broadcast(q).crossJoin(n)
              .where(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("sim", F.expr(_COS_SPARK))
              .select("query_id", "neighbor_id", "sim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= _TOP_K)
            .select("query_id", "rank", "neighbor_id", "sim"))


_N_PLANES = 8

_BUCKET_DUCK = " || ".join(
    f"(CASE WHEN embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END)"
    for i in range(_N_PLANES))
_BUCKET_SPARK = "concat(" + ", ".join(
    f"(CASE WHEN element_at(embedding, {i + 1}) >= cast(0 as float) "
    f"THEN '1' ELSE '0' END)" for i in range(_N_PLANES)) + ")"


@_register("ann_lsh_bucketed", f"""
WITH b AS (
  SELECT vec_id, embedding::DOUBLE[] AS e, {_BUCKET_DUCK} AS bucket
  FROM embeddings
), pairs AS (
  SELECT a.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(a.e, c.e), 6) AS sim
  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id
  WHERE a.vec_id < {_N_QUERIES}
), ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM pairs)
SELECT query_id, rank, neighbor_id, sim FROM ranked WHERE rank <= {_TOP_K}
""")
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    b = emb.select("vec_id",
                   F.col("embedding").cast("array<double>").alias("e"),
                   F.expr(_BUCKET_SPARK).alias("bucket"))
    a = (b.where(F.col("vec_id") < _N_QUERIES)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("e").alias("qa"), "bucket"))
    c = b.select(F.col("vec_id").alias("neighbor_id"),
                 F.col("e").alias("na"), "bucket")
    pairs = (a.join(c, "bucket")
             .where(F.col("query_id") != F.col("neighbor_id"))
             .withColumn("sim", F.expr(_COS_SPARK)))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= _TOP_K)
            .select("query_id", "rank", "neighbor_id", "sim"))


# multi-probe LSH: each query probes its own bucket PLUS every bucket at
# Hamming distance 1 (9 probes for 8 planes) — recovers most of the recall
# a single-bucket probe loses at bucket boundaries while keeping the
# candidate count O(n_queries · probes · bucket_size), never all-pairs.
# Probes live on the (tiny) query side: the neighbor table is still joined
# once on bucket equality.
def _flip_duck(i: int) -> str:
    return (f"substr(bucket, 1, {i - 1}) || "
            f"(CASE WHEN substr(bucket, {i}, 1) = '1' THEN '0' ELSE '1' "
            f"END) || substr(bucket, {i + 1})")


def _flip_spark(i: int) -> str:
    return (f"concat(substring(bucket, 1, {i - 1}), "
            f"(CASE WHEN substring(bucket, {i}, 1) = '1' THEN '0' ELSE '1' "
            f"END), substring(bucket, {i + 1}))")


_PROBES_DUCK = " UNION ALL ".join(
    ["SELECT vec_id, e, bucket AS probe FROM qb"] +
    [f"SELECT vec_id, e, {_flip_duck(i)} AS probe FROM qb"
     for i in range(1, _N_PLANES + 1)])
_PROBES_SPARK = ("array(bucket, " +
                 ", ".join(_flip_spark(i)
                           for i in range(1, _N_PLANES + 1)) + ")")


@_register("ann_lsh_multiprobe", f"""
WITH b AS (
  SELECT vec_id, embedding::DOUBLE[] AS e, {_BUCKET_DUCK} AS bucket
  FROM embeddings
), qb AS (
  SELECT vec_id, e, bucket FROM b WHERE vec_id < {_N_QUERIES}
), probes AS (
  {_PROBES_DUCK}
), pairs AS (
  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(p.e, c.e), 6) AS sim
  FROM probes p JOIN b c ON p.probe = c.bucket AND p.vec_id <> c.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM pairs)
SELECT query_id, rank, neighbor_id, sim FROM ranked WHERE rank <= {_TOP_K}
""")
def ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    b = emb.select("vec_id",
                   F.col("embedding").cast("array<double>").alias("e"),
                   F.expr(_BUCKET_SPARK).alias("bucket"))
    probes = (b.where(F.col("vec_id") < _N_QUERIES)
              .select(F.col("vec_id").alias("query_id"),
                      F.col("e").alias("qa"),
                      F.explode(F.expr(_PROBES_SPARK)).alias("bucket")))
    c = b.select(F.col("vec_id").alias("neighbor_id"),
                 F.col("e").alias("na"), "bucket")
    pairs = (F.broadcast(probes).join(c, "bucket")
             .where(F.col("query_id") != F.col("neighbor_id"))
             .withColumn("sim", F.expr(_COS_SPARK)))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= _TOP_K)
            .select("query_id", "rank", "neighbor_id", "sim"))


# ---------------------------------------------------------------------------
# IVF-Flat ANN — the third point on the brute-force / LSH / IVF spectrum and
# the classic inverted-file scale path (FAISS IVF-Flat shape): a small coarse
# quantizer partitions the collection into K cells; each vector is assigned
# to its nearest centroid ONCE at build time; a query probes only its
# _IVF_NPROBE nearest cells and re-ranks the candidates with exact cosine.
#
# Centroids here are a deterministic stride-sample of the collection itself
# (stride = max(1, N div K), so K stays ~constant as N grows — sampled
# centroids are the standard bootstrap before Lloyd refinement; Lloyd is
# deliberately omitted because float centroid averaging is summation-order-
# dependent and would break bit-identical cross-engine comparison).
#
# Scale shape (10^12 rows): the K-row centroid table broadcasts; assignment
# is one map-side pass over the collection (bounded K-way fan-out per row,
# never all-pairs) folded by a map-side-combinable max_by hash aggregate —
# no window shuffle on the big side; at cluster scale the assignment is the
# amortized index build, persisted partitioned BY cell so a probe reads only
# its cells' files (partition pruning). Search joins the (tiny, broadcast)
# probe side against the assignment on cell equality — candidates are
# O(queries * nprobe * cell_size).
_IVF_K = 64
_IVF_NPROBE = 2


def _cos(a: str, b: str) -> str:
    """Rounded-6dp cosine between two double-array columns (pure JVM
    higher-order functions — the same expression shape as _COS_SPARK)."""
    return f"""
round(
  aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0d, (acc, v) -> acc + v)
  / (sqrt(aggregate({a}, 0d, (acc, v) -> acc + v * v))
     * sqrt(aggregate({b}, 0d, (acc, v) -> acc + v * v))), 6)
"""


_NORM = "sqrt(aggregate({v}, 0d, (acc, v) -> acc + v * v))"


def _cos_prenormed(dot_a: str, dot_b: str, nrm_a: str, nrm_b: str) -> str:
    """Rounded-6dp cosine with the per-row norms hoisted OUT of the pair
    expression: `nrm_a`/`nrm_b` are columns precomputed once per row
    (via _NORM) instead of re-aggregated per candidate pair — on the K-way
    assignment fan-out that removes 2·K-1 of the 2·K norm scans per row.
    The per-pair float ops (dot, multiply, divide, round) are literally the
    same values in the same order as _cos, so results stay bit-identical
    and hash-comparable against the oracle."""
    return f"""
round(
  aggregate(zip_with({dot_a}, {dot_b}, (x, y) -> x * y), 0d,
            (acc, v) -> acc + v)
  / ({nrm_a} * {nrm_b}), 6)
"""


def build_ivf_index(emb: DataFrame, k: int | None = None
                    ) -> tuple[DataFrame, DataFrame]:
    """(centroids, assignment) for an IVF-Flat index over `emb`
    (vec_id, v:array<double>[, nrm]).

    K scales with the collection: k=None → max({_IVF_K}, floor(sqrt(N)))
    computed IN-PLAN from a one-row scalar aggregate (no driver action),
    the standard IVF sizing rule (k ~ sqrt(N) keeps candidates-per-probe
    ~sqrt(N) as the collection grows; the floor keeps small test
    collections from degenerating to a handful of cells). Centroids are a
    deterministic stride sample; assignment is a broadcast K-way fan-out
    + max_by hash aggregate (map-side combinable — deliberately NOT a
    window, which would shuffle the full collection on vec_id).

    The assignment IS the reusable index: persist it / write it as a
    parquet table partitioned by `cell` (write_ivf_index) and every
    search is a cell equi-join with partition pruning — the build is paid
    once, not per query (Reach has no ANN surface; this is the
    training-data-pipeline tier)."""
    if "nrm" not in emb.columns:
        emb = emb.withColumn("nrm", F.expr(_NORM.format(v="v")))
    if k is None:
        k_expr = F.greatest(
            F.lit(_IVF_K).cast("long"),
            F.floor(F.sqrt(F.count("*"))).cast("long"))
    else:
        k_expr = F.lit(int(k)).cast("long")
    stride = emb.agg(F.greatest(
        F.lit(1).cast("long"),
        (F.count("*") / k_expr).cast("long")).alias("stride"))
    cent = (emb.crossJoin(F.broadcast(stride))
            .where(F.col("vec_id") % F.col("stride") == 0)
            .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"),
                    F.col("nrm").alias("cnrm")))
    scored = (emb.crossJoin(F.broadcast(cent))
              .withColumn("csim", F.expr(
                  _cos_prenormed("v", "cv", "nrm", "cnrm"))))
    assign = (scored.groupBy("vec_id")
              .agg(F.expr("max_by(cid, struct(csim, -cid))").alias("cell"),
                   F.first("v").alias("nv"),
                   F.first("nrm").alias("nnrm"))
              .withColumnRenamed("vec_id", "neighbor_id"))
    return cent, assign


def write_ivf_index(emb: DataFrame, path: str,
                    k: int | None = None) -> None:
    """Materialize the IVF index: assignment parquet partitioned by cell
    (searches prune to their nprobe cells at the SCAN — the 100 TB shape:
    build once, reuse across every query batch) + centroids alongside."""
    cent, assign = build_ivf_index(emb, k=k)
    assign.write.mode("overwrite").partitionBy("cell") \
        .parquet(f"{path}/assignment")
    cent.write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_search(cent: DataFrame, assign: DataFrame, queries: DataFrame,
               nprobe: int = _IVF_NPROBE, top_k: int = _TOP_K,
               repartition_by_cell: bool = False) -> DataFrame:
    """Top-k cosine search over a built IVF index. `queries` is
    (vec_id, v[, nrm]). Probe selection is a window over the tiny
    queries×centroids fan-out; candidate generation is a broadcast hash
    join on the cell key.

    `repartition_by_cell=True` pre-shuffles the ASSIGNMENT side on cell —
    use when the index is consumed repeatedly by large query batches on a
    cluster whose scan isn't already cell-partitioned (a written index is:
    write_ivf_index partitions by cell, so reads prune instead)."""
    if "nrm" not in queries.columns:
        queries = queries.withColumn("nrm", F.expr(_NORM.format(v="v")))
    if repartition_by_cell:
        assign = assign.repartition("cell")
    pscored = (queries.crossJoin(F.broadcast(cent))
               .withColumn("csim", F.expr(
                   _cos_prenormed("v", "cv", "nrm", "cnrm"))))
    wq = Window.partitionBy("vec_id").orderBy(F.desc("csim"), "cid")
    probes = (pscored.withColumn("rn", F.row_number().over(wq))
              .where(F.col("rn") <= nprobe)
              .select(F.col("vec_id").alias("query_id"),
                      F.col("v").alias("qa"), F.col("nrm").alias("qnrm"),
                      F.col("cid").alias("cell")))
    pairs = (F.broadcast(probes).join(assign, "cell")
             .where(F.col("query_id") != F.col("neighbor_id"))
             .withColumn("sim", F.expr(
                 _cos_prenormed("qa", "nv", "qnrm", "nnrm"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"),
                                               "neighbor_id")
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= top_k)
            .select("query_id", "rank", "neighbor_id", "sim"))


@_register("ann_ivf_topk", f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), s AS (
  SELECT greatest(1, count(*) // greatest({_IVF_K},
             CAST(floor(sqrt(count(*))) AS BIGINT))) AS stride FROM e
), cent AS (
  SELECT vec_id AS cid, v AS cv FROM e, s WHERE vec_id % stride = 0
), asg AS (
  SELECT vec_id AS neighbor_id, v AS nv, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY round(list_cosine_similarity(v, cv), 6)
                                     DESC, cid) AS rn
  FROM e CROSS JOIN cent
), a1 AS (
  SELECT neighbor_id, nv, cid AS cell FROM asg WHERE rn = 1
), pr AS (
  SELECT vec_id AS query_id, v AS qv, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY round(list_cosine_similarity(v, cv), 6)
                                     DESC, cid) AS rn
  FROM e CROSS JOIN cent WHERE vec_id < {_N_QUERIES}
), p1 AS (
  SELECT query_id, qv, cid AS cell FROM pr WHERE rn <= {_IVF_NPROBE}
), pairs AS (
  SELECT p.query_id, a.neighbor_id,
         round(list_cosine_similarity(p.qv, a.nv), 6) AS sim
  FROM p1 p JOIN a1 a ON a.cell = p.cell
  WHERE p.query_id <> a.neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM pairs)
SELECT query_id, rank, neighbor_id, sim FROM ranked WHERE rank <= {_TOP_K}
""")
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat top-k: build_ivf_index (K = max({_IVF_K}, floor(sqrt(N)))
    in-plan) + ivf_search, composed as one lazy DataFrame. Per-row norms
    are computed once here (the K-way fan-out would otherwise
    re-aggregate them K times per row — see _cos_prenormed)."""
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id",
                   F.col("embedding").cast("array<double>").alias("v"))
           .withColumn("nrm", F.expr(_NORM.format(v="v"))))
    cent, assign = build_ivf_index(emb)
    return ivf_search(cent, assign, emb.where(F.col("vec_id") < _N_QUERIES))


@_register("embedding_stats", """
SELECT label,
       count(*) AS n,
       round(avg(list_cosine_similarity(embedding::DOUBLE[],
                                        embedding::DOUBLE[])), 3) AS self_sim
FROM embeddings GROUP BY label
""")
def embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return (emb
            .withColumn("e", F.col("embedding").cast("array<double>"))
            .withColumn("self_sim", F.round(F.expr(
                "aggregate(zip_with(e, e, (x,y)->x*y), 0d, (a,v)->a+v)"
                " / (sqrt(aggregate(e, 0d, (a,v)->a+v*v))"
                " * sqrt(aggregate(e, 0d, (a,v)->a+v*v)))"), 3))
            .groupBy("label")
            .agg(F.count("*").alias("n"),
                 F.round(F.avg("self_sim"), 3).alias("self_sim")))


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate detection (dedup family; completes the
# exact / MinHash-LSH / SimHash / Jaccard / embedding-cosine spectrum in
# textops.py). Banded sign-LSH candidate generation — _N_BANDS bands of
# _BAND_PLANES hyperplanes each (the hyperplanes are the coordinate axes of
# dims 1..32, deterministic) — followed by an exact-cosine confirm at
# _NEAR_TAU. A pair is a candidate iff ALL plane signs agree in AT LEAST ONE
# band (the classic OR-of-ANDs LSH amplification, same construction as the
# MinHash banding in textops.minhash_lsh_pairs). The self-join is a pure
# equi-join on (band, key): candidates are bounded by band-bucket collisions
# (near-linear on clustered real-world embeddings; the synthetic random
# table is the documented worst case), never an all-pairs cartesian — the
# plan is guarded in tests/test_plans.py. The DuckDB oracle mirrors the
# banding exactly, so recall-vs-brute-force is a property of the operator
# definition, not an engine divergence.
_N_BANDS = 8
_BAND_PLANES = 4
_NEAR_TAU = 0.4

_BAND_KEYS_DUCK = ", ".join(
    "STRUCT_PACK(band := {b}, key := {k})".format(
        b=b, k=" || ".join(
            f"(CASE WHEN embedding[{b * _BAND_PLANES + i + 1}] >= 0 "
            f"THEN '1' ELSE '0' END)" for i in range(_BAND_PLANES)))
    for b in range(_N_BANDS))

_BAND_KEYS_SPARK = "array(" + ", ".join(
    "struct({b} as band, concat({k}) as key)".format(
        b=b, k=", ".join(
            f"(CASE WHEN element_at(embedding, {b * _BAND_PLANES + i + 1}) "
            f">= cast(0 as float) THEN '1' ELSE '0' END)"
            for i in range(_BAND_PLANES)))
    for b in range(_N_BANDS)) + ")"

# zero-norm guard: sim = 0 for a zero vector (padding rows) instead of
# ANSI divide-by-zero; the oracle filters the same pairs because DuckDB's
# list_cosine_similarity(0-vec, .) returns -1.0 — below tau > 0 either way.
_COS_AB = """
CASE WHEN aggregate(va, 0d, (a, v) -> a + v * v) = 0d
       OR aggregate(vb, 0d, (a, v) -> a + v * v) = 0d THEN 0d
ELSE round(
  aggregate(zip_with(va, vb, (x, y) -> x * y), 0d, (a, v) -> a + v)
  / (sqrt(aggregate(va, 0d, (a, v) -> a + v * v))
     * sqrt(aggregate(vb, 0d, (a, v) -> a + v * v))), 6) END
"""


@_register("dedup_embed_cosine", f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, [{_BAND_KEYS_DUCK}] AS bands
  FROM embeddings
), x AS (
  SELECT vec_id, v, u.band AS band, u.key AS key
  FROM e, UNNEST(bands) AS t(u)
), cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM x a JOIN x b ON a.band = b.band AND a.key = b.key
                   AND a.vec_id < b.vec_id
), scored AS (
  SELECT c.id_a, c.id_b,
         round(list_cosine_similarity(ea.v, eb.v), 6) AS sim
  FROM cand c
  JOIN e ea ON ea.vec_id = c.id_a
  JOIN e eb ON eb.vec_id = c.id_b)
SELECT id_a, id_b, sim FROM scored WHERE sim >= {_NEAR_TAU}
""")
def dedup_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id",
                   F.col("embedding").cast("array<double>").alias("v"),
                   F.explode(F.expr(_BAND_KEYS_SPARK)).alias("bk"))
           .select("vec_id", "v",
                   F.col("bk.band").alias("band"),
                   F.col("bk.key").alias("key")))
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"),
                   "band", "key")
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"),
                   "band", "key")
    cand = (a.join(b, ["band", "key"])
            .where(F.col("id_a") < F.col("id_b"))
            # vectors are functionally dependent on ids, so dedup on the
            # pair key alone (a pair colliding in several bands scores once)
            .dropDuplicates(["id_a", "id_b"]))
    return (cand.withColumn("sim", F.expr(_COS_AB))
            .where(F.col("sim") >= _NEAR_TAU)
            .select("id_a", "id_b", "sim"))


# --------------------------------------------------------------------------
# k-means document clustering (Lloyd's algorithm, spherical/cosine variant)
# — the corpus-partitioning stage of data-mixing and SemDeDup-style
# semantic dedup pipelines. Made ENGINE-EXACT by quantizing embeddings to
# integer millionths up front: every dot product, norm self-dot, and
# centroid mean is then integer arithmetic (associative — no float
# summation-order drift on either engine), dots stay < 2^53 so the final
# double division + round(.,6) is bit-identical, and ties break on
# centroid id. Init is the same deterministic stride sample as IVF.
#
# Shape per iteration: broadcast K-way fan-out + max_by hash aggregate for
# assignment (map-side combinable, NOT a window — no full shuffle on
# vec_id), posexplode + (cell,dim)-keyed combinable aggregate for the
# centroid update (K*dim rows out). At 100 TB you would persist each
# iteration's assignment (same note as connected_components'
# localCheckpoint); the fixed-iteration plan here stays lazy so the
# driver query is a pure deterministic DataFrame.
# --------------------------------------------------------------------------
_KM_K = 8
_KM_ITERS = 2
_KM_QUANT = 1_000_000

_IDOT = ("aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
         "CAST(0 AS BIGINT), (acc, v) -> acc + v)")
_INRM = ("sqrt(CAST(aggregate({v}, CAST(0 AS BIGINT), "
         "(acc, x) -> acc + x * x) AS DOUBLE))")
# zero-norm vectors (e.g. padding rows) define sim = 0 rather than
# tripping ANSI divide-by-zero; the oracle mirrors the same CASE.
_ICOS = ("CASE WHEN {na} * {nb} = 0 THEN CAST(0 AS DOUBLE) ELSE "
         f"round(CAST({_IDOT.format(a='{a}', b='{b}')} AS DOUBLE)"
         " / ({na} * {nb}), 6) END")


def _km_assign(e: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, q, nrm) x (cid, cq, cnrm) -> (vec_id, q, nrm, cell, sim)."""
    scored = (e.crossJoin(F.broadcast(cent))
              .withColumn("csim", F.expr(
                  _ICOS.format(a="q", b="cq", na="nrm", nb="cnrm"))))
    return (scored.groupBy("vec_id")
            .agg(F.expr("max_by(cid, struct(csim, -cid))").alias("cell"),
                 F.max("csim").alias("sim"),
                 F.first("q").alias("q"), F.first("nrm").alias("nrm")))


def _km_update(assigned: DataFrame) -> DataFrame:
    """Integer element-wise mean per cell -> (cid, cq, cnrm)."""
    dims = (assigned.select("cell", F.posexplode("q").alias("d", "v"))
            .groupBy("cell", "d")
            .agg(F.expr("CAST(sum(v) DIV count(*) AS BIGINT)").alias("m")))
    return (dims.groupBy("cell")
            .agg(F.expr("transform(array_sort(collect_list(struct(d, m))),"
                        " s -> s.m)").alias("cq"))
            .select(F.col("cell").alias("cid"), "cq",
                    F.expr(_INRM.format(v="cq")).alias("cnrm")))


def _km_oracle() -> str:
    idot = ("CAST(list_sum(list_transform(list_zip({a}, {b}),"
            " x -> x[1] * x[2])) AS DOUBLE)")
    inrm = ("sqrt(CAST(list_sum(list_transform({v}, x -> x * x))"
            " AS DOUBLE))")
    cos = (f"CASE WHEN {inrm.format(v='{a}')} * {inrm.format(v='{b}')} = 0"
           f" THEN CAST(0 AS DOUBLE) ELSE"
           f" round({idot} / ({inrm.format(v='{a}')}"
           f" * {inrm.format(v='{b}')}), 6) END")
    assign = """
{out} AS (
  SELECT vec_id, q, cid AS cell, csim AS sim FROM (
    SELECT e.vec_id, e.q, c.cid,
           {cos} AS csim,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos} DESC, c.cid) AS rn
    FROM e CROSS JOIN {cent} c) WHERE rn = 1
)"""

    def assign_cte(out: str, cent: str) -> str:
        return assign.format(out=out, cent=cent,
                             cos=cos.format(a="e.q", b="c.cq"))

    def update_cte(out: str, asg: str) -> str:
        return f"""
{out} AS (
  SELECT cell AS cid, list(m ORDER BY d) AS cq FROM (
    SELECT cell, d, CAST(sum(q[d]) // count(*) AS BIGINT) AS m
    FROM {asg}, unnest(range(1, len(q) + 1)) AS u(d)
    GROUP BY cell, d)
  GROUP BY cell
)"""

    ctes = [f"""e AS (
  SELECT vec_id, list_transform(embedding::DOUBLE[],
           x -> CAST(round(x * {_KM_QUANT}) AS BIGINT)) AS q
  FROM embeddings
)""", f"""s AS (SELECT count(*) // {_KM_K} AS stride FROM e)""",
        f"""c0 AS (
  SELECT vec_id // stride AS cid, q AS cq FROM e, s
  WHERE vec_id % stride = 0 AND vec_id < stride * {_KM_K}
)"""]
    prev_cent = "c0"
    for i in range(_KM_ITERS):
        ctes.append(assign_cte(f"a{i}", prev_cent))
        ctes.append(update_cte(f"c{i + 1}", f"a{i}"))
        prev_cent = f"c{i + 1}"
    ctes.append(assign_cte("afinal", prev_cent))
    return "WITH " + ",".join(ctes)


def _km_assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Lloyd chain -> final assignment (vec_id, cell, sim, q, nrm)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    e = (emb.select(
            "vec_id",
            F.expr(f"transform(cast(embedding AS array<double>), "
                   f"x -> CAST(round(x * {_KM_QUANT}) AS BIGINT))")
            .alias("q"))
         .withColumn("nrm", F.expr(_INRM.format(v="q"))))
    stride = e.agg((F.count("*") / _KM_K).cast("long").alias("stride"))
    cent = (e.crossJoin(F.broadcast(stride))
            .where((F.col("vec_id") % F.col("stride") == 0)
                   & (F.col("vec_id") < F.col("stride") * _KM_K))
            .select((F.col("vec_id") / F.col("stride")).cast("long")
                    .alias("cid"),
                    F.col("q").alias("cq"), F.col("nrm").alias("cnrm")))
    assigned = _km_assign(e, cent)
    for _ in range(_KM_ITERS):
        cent = _km_update(assigned)
        assigned = _km_assign(e, cent)
    return assigned


@_register("kmeans_embeddings", _km_oracle() +
           "\nSELECT vec_id, CAST(cell AS BIGINT) AS cluster, sim"
           " FROM afinal")
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _km_assigned(spark, sf_dir).select(
        "vec_id", F.col("cell").cast("bigint").alias("cluster"), "sim")


# --------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023): semantic dedup = cluster-then-prune.
# Within each k-means cluster, any pair above the cosine threshold marks
# the higher vec_id a duplicate of the lowest similar id; cross-cluster
# pairs are never compared — the clustering bounds the quadratic term to
# per-cluster work (the paper's trick; at 100 TB you scale K with the
# collection — K ~ N/target_cluster_size — exactly like the IVF sizing
# rule, so per-cluster pair counts stay flat). Same integer-exact cosine
# as kmeans_embeddings; the cluster equi-join replaces the all-pairs
# cross join (plan-gated: no CartesianProduct).
# --------------------------------------------------------------------------
@_register("dedup_semantic", _km_oracle() + f""",
pr AS (
  SELECT b.vec_id AS id_b, min(a.vec_id) AS dup_of
  FROM afinal a JOIN afinal b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE (CASE WHEN list_sum(list_transform(a.q, x -> x * x)) = 0
                OR list_sum(list_transform(b.q, x -> x * x)) = 0
         THEN CAST(0 AS DOUBLE)
         ELSE round(CAST(list_sum(list_transform(list_zip(a.q, b.q),
                      x -> x[1] * x[2])) AS DOUBLE)
                / (sqrt(CAST(list_sum(list_transform(a.q, x -> x * x))
                        AS DOUBLE))
                   * sqrt(CAST(list_sum(list_transform(b.q, x -> x * x))
                          AS DOUBLE))), 6) END) >= {_NEAR_TAU}
  GROUP BY b.vec_id
)
SELECT f.vec_id, CAST(f.cell AS BIGINT) AS cluster, p.dup_of,
       p.dup_of IS NULL AS keep
FROM afinal f LEFT JOIN pr p ON p.id_b = f.vec_id
""")
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _km_assigned(spark, sf_dir)
    left = a.select(F.col("cell"), F.col("vec_id").alias("id_a"),
                    F.col("q").alias("qa"), F.col("nrm").alias("na"))
    right = a.select(F.col("cell"), F.col("vec_id").alias("id_b"),
                     F.col("q").alias("qb"), F.col("nrm").alias("nb"))
    pairs = (left.join(right, "cell")
             .where(F.col("id_a") < F.col("id_b"))
             .withColumn("sim", F.expr(
                 _ICOS.format(a="qa", b="qb", na="na", nb="nb")))
             .where(F.col("sim") >= _NEAR_TAU))
    dup = pairs.groupBy("id_b").agg(F.min("id_a").alias("dup_of"))
    return (a.join(dup, a["vec_id"] == dup["id_b"], "left")
            .select("vec_id", F.col("cell").cast("bigint").alias("cluster"),
                    "dup_of", F.col("dup_of").isNull().alias("keep")))


# --------------------------------------------------------------------------
# centroid-distance outlier detection — the noise-pruning complement of
# SemDeDup: where dedup_semantic removes the TOO-SIMILAR inside a
# cluster, this flags the TOO-FAR tail (mislabeled/garbage embeddings a
# curation pass reviews before training). Outlier = similarity to the
# assigned centroid strictly below the cluster's exact 5th discrete
# percentile (percentile_disc — engine-identical on the integer-exact
# rounded sims, unlike approximate sketches). One grouped aggregate over
# K groups + a broadcast join of the K thresholds back; at 100 TB the
# K-group aggregate is the only skewed step and is subsampled per cell
# (the threshold is a quantile — a per-cell sample estimates it without
# touching every row), which keeps the shape flat.
# --------------------------------------------------------------------------
@_register("embedding_outliers", _km_oracle() + """,
thr AS (
  SELECT cell, quantile_disc(sim, 0.05) AS p05 FROM afinal GROUP BY cell
)
SELECT f.vec_id, CAST(f.cell AS BIGINT) AS cluster, f.sim,
       f.sim < t.p05 AS is_outlier
FROM afinal f JOIN thr t ON t.cell = f.cell
""")
def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _km_assigned(spark, sf_dir)
    thr = a.groupBy("cell").agg(
        F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY sim)")
        .alias("p05"))
    return (a.join(F.broadcast(thr), "cell")
            .select("vec_id",
                    F.col("cell").cast("bigint").alias("cluster"),
                    "sim",
                    (F.col("sim") < F.col("p05")).alias("is_outlier")))
