"""Relational operator demonstrations over the TPC-H-ish testdata tables —
the SURVEY §2.11 checklist (filters/projections, broadcast + anti joins,
hash aggregation, windows, top-k, set ops, as-of composition) each with an
exact DuckDB oracle. These are also the operators the KG pipeline leans on
(grounding = broadcast join + rank-1; restart = anti-join; context = range
window; completeness = group argmax), exercised here on 600k-row inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

QUERIES: dict[str, tuple] = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = (fn, oracle)
        return fn
    return deco


# TPC-H Q1-style pricing summary: hash aggregation with partial (map-side)
# combine; Catalyst pushes the shipdate filter into the parquet scan.
@_register("q1_pricing_summary", """
SELECT l_returnflag, l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
""")
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (li.where(F.col("l_shipdate") <= "1998-09-01")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice") *
                               (1 - F.col("l_discount"))), 2)
                 .alias("sum_disc_price"),
                 F.count("*").alias("count_order")))


# 3-table join + top-k: the small dims are broadcast (explicit hint);
# revenue top-10 via window over the aggregate.
@_register("q3_topk_revenue", """
WITH rev AS (
  SELECT o.o_orderkey, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
         AS revenue
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'O'
  GROUP BY o.o_orderkey)
SELECT o_orderkey, revenue FROM rev
ORDER BY revenue DESC, o_orderkey LIMIT 10
""")
def q3_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # orders is a FACT table — never broadcast it (a broadcast that fits at
    # sf0.1 OOMs at 100×); lineitem⋈orders shuffles on the join key (AQE
    # may still pick broadcast at small SF), only the customer DIM gets an
    # explicit broadcast hint
    rev = (li.join(o.where(F.col("o_orderstatus") == "O"),
                   li["l_orderkey"] == o["o_orderkey"])
           .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
           .groupBy("o_orderkey")
           .agg(F.round(F.sum(F.col("l_extendedprice") *
                              (1 - F.col("l_discount"))), 2).alias("revenue")))
    return rev.orderBy(F.desc("revenue"), "o_orderkey").limit(10)


# group argmax (the keepMostCompleteMentions F1 pattern): per order, the
# line with max quantity, ties by line number.
@_register("argmax_per_group", """
SELECT l_orderkey, l_linenumber, l_quantity FROM (
  SELECT l_orderkey, l_linenumber, l_quantity,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_quantity DESC, l_linenumber) AS rk
  FROM lineitem) WHERE rk = 1
""")
def argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    w = Window.partitionBy("l_orderkey").orderBy(F.desc("l_quantity"),
                                                 "l_linenumber")
    return (li.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("l_orderkey", "l_linenumber", "l_quantity"))


# anti-join restart filter (the S3 checkpoint-resume pattern): docs whose
# id is NOT in the 'done' set (here: even ids done).
@_register("restart_anti_join", """
SELECT d.doc_id FROM documents d
ANTI JOIN (SELECT doc_id FROM documents WHERE doc_id % 2 = 0) done
ON d.doc_id = done.doc_id
""")
def restart_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    done = d.where(F.col("doc_id") % 2 == 0).select("doc_id")
    return d.join(done, "doc_id", "left_anti").select("doc_id")


# ordered analytic window (running count per user over the event stream —
# the context-window pattern on a time axis).
@_register("window_running_count", """
SELECT event_id, user_id,
       count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seen_so_far,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
FROM events
""")
def window_running_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id", "user_id",
        F.count("*").over(w.rowsBetween(Window.unboundedPreceding, 0))
         .alias("seen_so_far"),
        F.row_number().over(w).alias("rn"))


# as-of join composition: for each event, the user's latest order at or
# before the event timestamp (join + window rank-1 — the coref
# closest-prior-antecedent shape on a time axis).
@_register("asof_latest_order", """
SELECT event_id, user_id, o_orderkey FROM (
  SELECT e.event_id, e.user_id, o.o_orderkey,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC)
         AS rk
  FROM events e JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
WHERE rk = 1
""")
def asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sort-merge as-of via union + carry-forward window: one co-partitioned
    # shuffle on user_id, NO row expansion. The naive shape (non-equi join
    # on o_orderdate <= ts, then rank-1) materializes every (event, prior
    # order) pair first — O(events × orders-per-user) rows, a blowup for
    # long-history users at 100×. Here events and orders interleave as one
    # time-sorted stream per user; each event reads the running argmax
    # (o_orderdate, o_orderkey) carried forward so ties resolve exactly
    # like the rank-1: latest date, then largest key.
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders = o.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        F.struct(F.col("o_orderdate"), F.col("o_orderkey")).alias("ostruct"),
        F.lit(None).cast(e.schema["event_id"].dataType).alias("event_id"))
    events = e.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        F.lit(None).cast(orders.schema["ostruct"].dataType).alias("ostruct"),
        "event_id")
    # orders sort BEFORE events at equal t (is_event asc): o_orderdate <=
    # ts is inclusive
    w = (Window.partitionBy("user_id").orderBy("t", "is_event")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (orders.unionByName(events)
            .withColumn("best", F.max("ostruct").over(w))
            .where((F.col("is_event") == 1) & F.col("best").isNotNull())
            .select("event_id", "user_id",
                    F.col("best.o_orderkey").alias("o_orderkey")))


# set ops: high-value customers present in 'O' orders but not 'F' orders.
@_register("set_except_customers", """
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
""")
def set_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = (o.where(F.col("o_orderstatus") == "O")
         .select(F.col("o_custkey").alias("custkey")).distinct())
    b = (o.where(F.col("o_orderstatus") == "F")
         .select(F.col("o_custkey").alias("custkey")).distinct())
    return a.exceptAll(b).distinct()


# connected components (the G7 canonicalization operator) over a bipartite
# customer↔nation graph, oracle = recursive-CTE min-label propagation.
@_register("connected_components_bipartite", """
WITH RECURSIVE edges AS (
  SELECT 'c:' || lpad(c_custkey::VARCHAR, 12, '0') AS src,
         'n:' || lpad(c_nationkey::VARCHAR, 12, '0') AS dst
  FROM customer
), sym AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
), prop AS (
  SELECT src AS node, least(src, min(dst)) AS comp
  FROM sym GROUP BY src
  UNION
  SELECT s.src AS node, p.comp
  FROM sym s JOIN prop p ON s.dst = p.node
)
SELECT node, min(comp) AS component FROM prop GROUP BY node
""")
def connected_components_bipartite(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    from .canonicalize import connected_components
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    edges = c.select(
        F.concat(F.lit("c:"), F.lpad(F.col("c_custkey").cast("string"),
                                     12, "0")).alias("src"),
        F.concat(F.lit("n:"), F.lpad(F.col("c_nationkey").cast("string"),
                                     12, "0")).alias("dst"))
    return connected_components(edges).select("node", "component")


# gap-based sessionization: the canonical behavioral-data operator (and
# the batch shape of a streaming session window). A new session starts
# when the gap to the previous event exceeds 30 min. All time arithmetic
# is integer MICROSECONDS (unix_micros / epoch_us) so both engines compare
# and aggregate exactly — second-truncating functions disagree on
# sub-second boundaries. One user-keyed window + one hash aggregate; at
# 100 TB the shuffle key is user_id and per-user history is the partition
# unit (the same shape Structured Streaming's session_window state uses).
_SESSION_GAP_US = 30 * 60 * 1_000_000


@_register("sessionize_events", f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus FROM events
), flagged AS (
  SELECT user_id, event_id, tus,
         CASE WHEN tus - lag(tus) OVER w > {_SESSION_GAP_US}
              OR lag(tus) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
), sess AS (
  SELECT user_id, event_id, tus,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id)
           AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       min(event_id) AS first_event_id,
       max(event_id) AS last_event_id,
       CAST(max(tus) - min(tus) AS BIGINT) AS duration_us
FROM sess GROUP BY user_id, session_idx
""")
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (spark.read.parquet(f"{sf_dir}/events.parquet")
         .select("user_id", "event_id",
                 # ts is TIMESTAMP_NTZ; the session TZ is pinned UTC
                 # (session.py), so the cast is the identity instant and
                 # matches DuckDB's naive epoch_us exactly
                 F.unix_micros(F.col("ts").cast("timestamp")).alias("tus")))
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    flagged = e.withColumn(
        "new_s",
        F.when(F.lag("tus").over(w).isNull()
               | ((F.col("tus") - F.lag("tus").over(w))
                  > _SESSION_GAP_US), 1).otherwise(0))
    sess = flagged.withColumn(
        "session_idx",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (sess.groupBy("user_id", "session_idx")
            .agg(F.count("*").alias("n_events"),
                 F.min("event_id").alias("first_event_id"),
                 F.max("event_id").alias("last_event_id"),
                 (F.max("tus") - F.min("tus")).alias("duration_us"))
            .select("user_id",
                    F.col("session_idx").cast("long").alias("session_idx"),
                    F.col("n_events").cast("long").alias("n_events"),
                    "first_event_id", "last_event_id",
                    F.col("duration_us").cast("long").alias("duration_us")))


# --------------------------------------------------------------------------
# ROLLUP pricing summary — GROUPING SETS coverage: the (flag, status),
# (flag), () hierarchy in ONE pass (Spark expands the rollup internally
# and keeps the aggregate map-side combinable per grouping set; a naive
# 3-query union would scan lineitem three times). grouping_id
# disambiguates the NULL-as-subtotal rows from genuine NULL keys —
# reported so both engines label subtotal levels identically. Quantities
# are integer-summed (l_quantity is integral in this generator) to keep
# the hash comparison float-free.
# --------------------------------------------------------------------------
@_register("q1_rollup_summary", """
SELECT coalesce(l_returnflag, '<all>') AS returnflag,
       coalesce(l_linestatus, '<all>') AS linestatus,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)
         AS gid,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= '1998-09-01'
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""")
def q1_rollup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (li.where(F.col("l_shipdate") <= "1998-09-01")
            .rollup("l_returnflag", "l_linestatus")
            .agg(F.expr("CAST(grouping(l_returnflag) * 2 "
                        "+ grouping(l_linestatus) AS BIGINT)").alias("gid"),
                 F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
                 F.count("*").alias("count_order"))
            .select(F.coalesce("l_returnflag", F.lit("<all>"))
                    .alias("returnflag"),
                    F.coalesce("l_linestatus", F.lit("<all>"))
                    .alias("linestatus"),
                    "gid", "sum_qty", "count_order"))


_DAY_US = 86_400_000_000


@_register("retention_cohorts", f"""
WITH d AS (
  SELECT user_id, epoch_us(ts) // {_DAY_US} AS day FROM events
), d0 AS (
  SELECT user_id, min(day) AS day0 FROM d GROUP BY user_id
)
SELECT CAST(d0.day0 // 7 AS BIGINT) AS cohort_week,
       CAST((d.day - d0.day0) // 7 AS BIGINT) AS week_offset,
       CAST(count(DISTINCT d.user_id) AS BIGINT) AS active_users
FROM d JOIN d0 ON d0.user_id = d.user_id
GROUP BY 1, 2
""")
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users grouped by first-seen week, one
    row per (cohort_week, week_offset) with distinct active users — the
    classic product-analytics triangle. Integer epoch-day arithmetic
    end-to-end (the session TZ is pinned UTC, so epoch microseconds are
    engine-identical; no calendar week-truncation semantics to
    disagree on). Spark shape: one aggregate for cohort day-0 per user,
    re-joined on user_id (shuffle on the join key), then a distinct
    hash aggregate — no windows over the corpus."""
    e = (spark.read.parquet(f"{sf_dir}/events.parquet")
         .select("user_id",
                 F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) "
                        f"DIV {_DAY_US}").alias("day")))
    d0 = e.groupBy("user_id").agg(F.min("day").alias("day0"))
    return (e.join(d0, "user_id")
            .select("user_id",
                    F.expr("day0 DIV 7").cast("bigint")
                    .alias("cohort_week"),
                    F.expr("(day - day0) DIV 7").cast("bigint")
                    .alias("week_offset"))
            .groupBy("cohort_week", "week_offset")
            .agg(F.countDistinct("user_id").cast("bigint")
                 .alias("active_users")))


@_register("funnel_conversion", f"""
WITH s AS (
  SELECT user_id, min(epoch_us(ts)) AS s_us FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), conv AS (
  SELECT s.user_id, s.s_us,
         CASE WHEN EXISTS (
           SELECT 1 FROM events p
           WHERE p.user_id = s.user_id AND p.event_type = 'purchase'
             AND epoch_us(p.ts) > s.s_us
             AND epoch_us(p.ts) <= s.s_us + 7 * {_DAY_US}
         ) THEN 1 ELSE 0 END AS converted
  FROM s
)
SELECT CAST(s_us // {_DAY_US} // 7 AS BIGINT) AS cohort_week,
       CAST(count(*) AS BIGINT) AS signups,
       CAST(sum(converted) AS BIGINT) AS converted,
       CAST(sum(converted) * 1000000 // count(*) AS BIGINT)
         AS conv_ppm
FROM conv GROUP BY 1
""")
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase funnel by signup-week cohort: share of users
    whose FIRST signup is followed by a purchase within 7 days —
    the two-stage conversion query every events pipeline runs.

    Spark shape: min-aggregate for first signup, one equi-join to the
    purchase events with the time window as a join filter (a bounded
    interval join on the user key — never a cartesian), then
    left_semi-style existence via groupBy max. Integer ppm output."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("tus"))
    s = (ev.where(F.col("event_type") == "signup")
         .groupBy("user_id").agg(F.min("tus").alias("s_us")))
    p = ev.where(F.col("event_type") == "purchase") \
        .select("user_id", F.col("tus").alias("p_us"))
    hits = (s.join(p, "user_id")
            .where((F.col("p_us") > F.col("s_us")) &
                   (F.col("p_us") <= F.col("s_us") +
                    F.lit(7 * _DAY_US)))
            .select("user_id").distinct()
            .withColumn("converted", F.lit(1)))
    conv = s.join(hits.select("user_id", "converted"), "user_id",
                  "left").fillna({"converted": 0})
    return (conv
            .select(F.expr(f"s_us DIV {_DAY_US} DIV 7").cast("bigint")
                    .alias("cohort_week"), "converted")
            .groupBy("cohort_week")
            .agg(F.count("*").cast("bigint").alias("signups"),
                 F.sum("converted").cast("bigint").alias("converted"))
            .withColumn("conv_ppm",
                        F.expr("converted * 1000000 DIV signups")
                        .cast("bigint")))


_HOUR_US = 3_600_000_000


@_register("events_rollup_hourly", f"""
WITH b AS (
  SELECT epoch_us(ts) // {_HOUR_US} AS hour, event_type,
         CAST(floor(value * 1000000) AS BIGINT) AS vus
  FROM events
), agg AS (
  SELECT hour, event_type, count(*) AS n_events, sum(vus) AS value_micros
  FROM b GROUP BY hour, event_type
)
SELECT CAST(hour AS BIGINT) AS hour, event_type,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(value_micros AS BIGINT) AS value_micros,
       CAST(sum(n_events) OVER w * 1000 // count(*) OVER w AS BIGINT)
         AS ma3_events_x1000
FROM agg
WINDOW w AS (PARTITION BY event_type ORDER BY hour
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""")
def events_rollup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly continuous-aggregate rollup over the events stream — the
    hypertable/time-bucket pattern: raw events collapse to one row per
    (hour bucket, event_type) with count + integer-micros value sum, then
    a 3-bucket trailing moving average smooths the series.

    The scale split is the point: the bucket aggregate runs over RAW
    events and is a plain map-side-combinable hash aggregate (no window
    touches the raw table); the moving-average window runs over the
    ALREADY-AGGREGATED rollup, whose cardinality is hours × event types —
    time-bounded, not corpus-bounded. value is fixed to integer micros
    via floor(value * 1e6) (identical IEEE-double → floor result on both
    engines) so sums and the x1000 moving average hash-compare exactly;
    the window average is (sum * 1000) DIV n with the leading-edge n < 3
    handled by the windowed count."""
    e = (spark.read.parquet(f"{sf_dir}/events.parquet")
         .select(F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) "
                        f"DIV {_HOUR_US}").alias("hour"),
                 "event_type",
                 F.expr("CAST(floor(value * 1000000) AS BIGINT)")
                 .alias("vus")))
    agg = (e.groupBy("hour", "event_type")
           .agg(F.count("*").alias("n_events"),
                F.sum("vus").alias("value_micros")))
    w = (Window.partitionBy("event_type").orderBy("hour")
         .rowsBetween(-2, 0))
    return (agg
            .withColumn("_ma_sum", F.sum("n_events").over(w))
            .withColumn("_ma_n", F.count("*").over(w))
            .select(F.col("hour").cast("bigint").alias("hour"),
                    "event_type",
                    F.col("n_events").cast("bigint").alias("n_events"),
                    F.col("value_micros").cast("bigint")
                    .alias("value_micros"),
                    F.expr("CAST(_ma_sum * 1000 DIV _ma_n AS BIGINT)")
                    .alias("ma3_events_x1000")))
