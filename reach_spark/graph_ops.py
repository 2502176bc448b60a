"""Downstream KG analytics over the materialized triples (EER) table.

The reference stops at exporting the assembled triples (export/.../arizona/
ArizonaOutputter.scala:14-62; assembly/.../export/AssemblyExporter.scala:
114-180) — downstream consumption happens in the DARPA pipeline outside the
repo. For a Spark-native KG engine the natural next layer is first-class:
graph queries over the materialized `(subj, pred, obj, negated, seen)`
table. Five operators, each a pure DataFrame composition (no Python UDF):

- `entity_degree`     — per-node in/out class-degree and evidence mass.
- `two_hop_chains`    — regulation chains a -pred1-> b -pred2-> c via a
                        self-join on the node key (obj == subj).
- `triangles`         — distinct undirected triangles via ordered wedge
                        enumeration + edge-closure equi-join.
- `clustering_counts` — per-node triangle + wedge counts (the integer
                        inputs of the local clustering coefficient).
- `pagerank_fp`       — fixed-iteration PageRank in *fixed-point integer*
                        arithmetic (scaled 1e6, integer division), so the
                        result is bit-identical across engines and
                        summation orders — float PageRank cannot be
                        hash-compared between Spark and an oracle; this
                        can.

Scale notes (10^12-doc corpus): all three consume the EER table, whose
cardinality is bounded by the distinct-interaction vocabulary (classes, not
occurrences) — orders of magnitude smaller than the corpus. `two_hop_chains`
shuffles both sides on the chain node key (an equi-join Catalyst plans as
sort-merge/shuffled-hash; never a cartesian — plan-guarded in
tests/test_plans.py). `pagerank_fp` keeps the rank vector keyed by node and
re-joins the static edge list each iteration: at cluster scale the edge list
would be pre-partitioned/bucketed on `src` once and reused, and the bounded
iteration count (default 3) keeps lineage shallow (no checkpoint needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# PageRank fixed-point parameters: ranks are scaled by 1e6; damping 0.85 is
# applied as  new = 150_000 + (850 * contrib_sum) div 1000  — all-integer,
# deterministic regardless of partitioning / summation order.
PR_SCALE = 1_000_000
PR_TELEPORT = 150_000  # 0.15 * PR_SCALE
PR_DAMP_NUM = 850      # 0.85 as 850/1000
PR_DAMP_DEN = 1_000


def kg_edges(triples: DataFrame, asserted_only: bool = True) -> DataFrame:
    """Distinct directed (src, dst) node pairs from the EER table.

    subj is null for un-regulated simple events (those rows are node
    *occurrences* of obj but not edges). `asserted_only` drops negated
    classes — a chain through a negated assertion is not evidence of a
    pathway.
    """
    t = triples
    if asserted_only:
        t = t.filter(~F.col("negated"))
    return (t.filter(F.col("subj").isNotNull() & F.col("obj").isNotNull())
             .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
             .distinct())


def entity_degree(triples: DataFrame) -> DataFrame:
    """Per-node degree over EER classes: out_deg / in_deg count distinct
    interaction classes the node participates in as subject / object;
    out_seen / in_seen sum the corpus evidence (SEEN) of those classes.

    One union + one hash aggregate (map-side combinable) — no join, no
    window. Nodes appearing only as obj get out_deg 0 and vice versa.
    """
    as_subj = (triples.filter(F.col("subj").isNotNull())
               .select(F.col("subj").alias("node"),
                       F.lit(1).cast("long").alias("od"),
                       F.lit(0).cast("long").alias("id_"),
                       F.col("seen").cast("long").alias("os"),
                       F.lit(0).cast("long").alias("is_")))
    as_obj = (triples.filter(F.col("obj").isNotNull())
              .select(F.col("obj").alias("node"),
                      F.lit(0).cast("long").alias("od"),
                      F.lit(1).cast("long").alias("id_"),
                      F.lit(0).cast("long").alias("os"),
                      F.col("seen").cast("long").alias("is_")))
    return (as_subj.unionByName(as_obj)
            .groupBy("node")
            .agg(F.sum("od").alias("out_deg"),
                 F.sum("id_").alias("in_deg"),
                 F.sum("os").alias("out_seen"),
                 F.sum("is_").alias("in_seen")))


def two_hop_chains(triples: DataFrame) -> DataFrame:
    """Two-hop interaction chains a -pred1-> b -pred2-> c over asserted
    (non-negated) EER classes: an equi self-join on the chain node
    (t1.obj == t2.subj). `support` is the weakest-link evidence
    min(seen1, seen2).

    Rows are distinct by construction: the EER table is unique on
    (subj, pred, obj, negated) and both sides are filtered to
    negated = false.
    """
    t = (triples.filter(~F.col("negated") & F.col("subj").isNotNull()
                        & F.col("obj").isNotNull())
         .select("subj", "pred", "obj", "seen"))
    t1 = t.select(F.col("subj").alias("a"), F.col("pred").alias("pred1"),
                  F.col("obj").alias("b"), F.col("seen").alias("_s1"))
    t2 = t.select(F.col("subj").alias("b"), F.col("pred").alias("pred2"),
                  F.col("obj").alias("c"), F.col("seen").alias("_s2"))
    return (t1.join(t2, "b")
            .select("a", "pred1", "b", "pred2", "c",
                    F.least("_s1", "_s2").cast("long").alias("support")))


def triangles(triples: DataFrame) -> DataFrame:
    """Distinct triangles {a,b,c} in the *undirected* asserted interaction
    graph — the canonical graph-analytics primitive behind clustering
    coefficients and community seeds.

    Edge direction is semantic in the KG (controller → controlled) but
    triangle membership is not: each directed edge is normalized to an
    undirected (u, v) with u < v, self-loops dropped, then the classic
    node-iterator enumeration — join wedges (a<b, b<c) on the middle node
    and close them against the edge set on (a, c). The a<b<c ordering means
    every triangle is emitted exactly once (no 6-way permutation dedup).

    Scale shape: both joins are equi-joins on node keys (never a
    cartesian — plan-guarded in tests/test_plans.py); the wedge relation is
    the size-critical intermediate (sum of deg² over middle nodes), the
    standard cost of distributed triangle listing. On a skewed corpus the
    hub-node wedge blowup is handled the same way the dedup ops handle hot
    shingles: cap or salt the top-degree nodes — at EER-table cardinality
    (vocabulary-bounded, not corpus-bounded) this is not reached.

    Output: (a, b, c) with a < b < c lexicographically.
    """
    e = kg_edges(triples)
    und = (e.select(F.least("src", "dst").alias("u"),
                    F.greatest("src", "dst").alias("v"))
           .where(F.col("u") != F.col("v"))
           .distinct())
    w1 = und.select(F.col("u").alias("a"), F.col("v").alias("b"))
    w2 = und.select(F.col("u").alias("b"), F.col("v").alias("c"))
    wedges = w1.join(w2, "b")  # a < b < c by construction
    closing = und.select(F.col("u").alias("a"), F.col("v").alias("c"))
    return (wedges.join(closing, ["a", "c"])
            .select("a", "b", "c"))


def clustering_counts(triples: DataFrame) -> DataFrame:
    """Per-node local clustering INPUTS over the undirected asserted graph:
    `tri` = triangles through the node, `wedges` = deg·(deg−1)/2. Both
    int64, so the result hash-compares across engines; the float
    coefficient tri/wedges is one division away for the consumer (float
    output would be summation/rounding-order territory — the same reason
    pagerank_fp is fixed-point).

    Built from `triangles` (each a<b<c triangle credits all three nodes)
    and one degree aggregate over the normalized edge set; nodes in no
    triangle report tri=0. Two hash aggregates + one left join — no new
    join shapes beyond the triangle listing itself.
    """
    e = kg_edges(triples)
    und = (e.select(F.least("src", "dst").alias("u"),
                    F.greatest("src", "dst").alias("v"))
           .where(F.col("u") != F.col("v"))
           .distinct())
    deg = (und.select(F.col("u").alias("node"))
           .unionAll(und.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count("*").alias("deg")))
    tri = triangles(triples)
    tri_per_node = (tri.select(F.col("a").alias("node"))
                    .unionAll(tri.select(F.col("b").alias("node")))
                    .unionAll(tri.select(F.col("c").alias("node")))
                    .groupBy("node").agg(F.count("*").alias("tri")))
    return (deg.join(tri_per_node, "node", "left")
            .select("node",
                    F.coalesce("tri", F.lit(0)).cast("long").alias("tri"),
                    # integer div: deg·(deg−1) is even, and int64 `div`
                    # avoids float rounding at extreme hub degrees
                    F.expr("(deg * (deg - 1)) div 2")
                    .cast("long").alias("wedges")))


def pagerank_fp(triples: DataFrame, iters: int = 3) -> DataFrame:
    """Fixed-point integer PageRank over the distinct asserted edge set.

    Every node starts at PR_SCALE; each iteration a node sends
    rank div outdeg along each out-edge and receives
    PR_TELEPORT + (PR_DAMP_NUM * sum(received)) div PR_DAMP_DEN.
    Dangling nodes (no out-edges) redistribute nothing — the standard
    simplification; ranks then measure received endorsement mass rather
    than forming a strict probability distribution, which is what a
    KG-importance ranking needs. All arithmetic is int64 with truncating
    division, so the result is deterministic across engines, partition
    counts and summation orders (why: float `sum` is order-dependent and
    would break hash comparison against the DuckDB oracle).

    Output: (node, pr_fp) — pr_fp is the scaled-integer rank after
    `iters` iterations.
    """
    # edges is consumed by nodes/outdeg/send and re-read every iteration;
    # eagerly truncate its lineage once so the (potentially expensive)
    # upstream pipeline plan isn't replayed per consumer and the iteration
    # plans stay small
    edges = kg_edges(triples).localCheckpoint(eager=True)
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node")))
             .distinct())
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # the static (src, outdeg, dst) relation is reused every iteration
    send = edges.join(outdeg, "src")
    ranks = nodes.select("node", F.lit(PR_SCALE).cast("long").alias("pr_fp"))
    for _ in range(iters):
        contrib = (send.join(ranks.withColumnRenamed("node", "src"), "src")
                   .select(F.col("dst").alias("node"),
                           F.expr("pr_fp div outdeg").alias("c"))
                   .groupBy("node")
                   .agg(F.sum("c").alias("contrib")))
        ranks = (nodes.join(contrib, "node", "left")
                 .select("node",
                         (F.lit(PR_TELEPORT)
                          + F.expr(f"({PR_DAMP_NUM} * coalesce(contrib, 0L))"
                                   f" div {PR_DAMP_DEN}"))
                         .cast("long").alias("pr_fp")))
    return ranks


def label_propagation(triples: DataFrame, iters: int = 3) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan et
    al. 2007) over the undirected asserted edge set: every node starts
    labeled by itself; each iteration it adopts the most frequent label
    among its neighbors, ties broken by the lexicographically smallest
    label. The classic LPA random tie-flip is replaced by an ordered
    argmax — encoded as ONE string min ('inverted zero-padded count' ||
    label) so the result is deterministic across engines, partitionings
    and summation orders (the same trick as doc_winnow's (hash,pos) min).

    Per iteration: one edge⋈label equi-join + a (node,label)-keyed
    map-side-combinable count + one node-keyed min — the bounded-round
    sibling of connected_components' propagation, so the shape holds at
    any graph scale. Output: (node, community)."""
    edges = kg_edges(triples).localCheckpoint(eager=True)
    und = (edges.union(edges.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst")))
           .distinct())
    nodes = und.select(F.col("src").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(iters):
        freq = (und.join(labels.withColumnRenamed("node", "dst"), "dst")
                .groupBy(F.col("src").alias("node"), "label")
                .agg(F.count("*").alias("cnt")))
        key = F.concat(
            F.lpad((F.lit(1_000_000_000) - F.col("cnt")).cast("string"),
                   10, "0"),
            F.col("label"))
        labels = (freq.withColumn("k", key)
                  .groupBy("node")
                  .agg(F.expr("substring(min(k), 11)").alias("label")))
    return labels.select("node", F.col("label").alias("community"))


def common_neighbors(triples: DataFrame, min_common: int = 2) -> DataFrame:
    """Link prediction baseline over the undirected asserted KG:
    candidate (unconnected) node pairs ranked by shared-neighbor count +
    integer Jaccard — "entities that co-regulate the same partners but
    have no asserted edge yet" is the KG-completion shortlist a curator
    reads.

    Same wedge shape as `triangles` (sym edge list self-joined on the
    middle node, a < b once), but KEEPING the wedges that do NOT close:
    an anti-join against the edge set replaces the closing join. Degrees
    join in for the Jaccard denominator; all arithmetic is integer ppm
    so the DuckDB oracle matches exactly. Equi-joins on node keys
    throughout — the wedge relation is sum(deg^2) sized, the standard
    distributed cost, vocabulary-bounded on the EER table.

    Output: (a, b, common, jaccard_ppm), a < b, common >= `min_common`.
    """
    e = kg_edges(triples)
    und = (e.select(F.least("src", "dst").alias("u"),
                    F.greatest("src", "dst").alias("v"))
           .where(F.col("u") != F.col("v"))
           .distinct())
    sym = (und.select(F.col("u").alias("n"), F.col("v").alias("m"))
           .unionByName(und.select(F.col("v").alias("n"),
                                   F.col("u").alias("m"))))
    deg = sym.groupBy("n").agg(F.count("*").cast("bigint").alias("deg"))
    w1 = sym.select(F.col("m").alias("mid"), F.col("n").alias("a"))
    w2 = sym.select(F.col("m").alias("mid"), F.col("n").alias("b"))
    pairs = (w1.join(w2, "mid")
             .where(F.col("a") < F.col("b"))
             .groupBy("a", "b")
             .agg(F.count("*").cast("bigint").alias("common"))
             .where(F.col("common") >= min_common))
    candidates = pairs.join(
        und, (pairs["a"] == und["u"]) & (pairs["b"] == und["v"]),
        "left_anti")
    return (candidates
            .join(deg.select(F.col("n").alias("a"),
                             F.col("deg").alias("deg_a")), "a")
            .join(deg.select(F.col("n").alias("b"),
                             F.col("deg").alias("deg_b")), "b")
            .select("a", "b", "common",
                    F.expr("common * 1000000 DIV "
                           "(deg_a + deg_b - common)")
                    .cast("bigint").alias("jaccard_ppm")))


def _und_sym(triples: DataFrame) -> DataFrame:
    """Symmetric (n, m) adjacency of the undirected asserted graph —
    the shared front end of the peel/BFS operators. Each undirected
    edge appears exactly twice (n→m and m→n), self-loops dropped."""
    e = kg_edges(triples)
    und = (e.select(F.least("src", "dst").alias("u"),
                    F.greatest("src", "dst").alias("v"))
           .where(F.col("u") != F.col("v"))
           .distinct())
    return (und.select(F.col("u").alias("n"), F.col("v").alias("m"))
            .unionByName(und.select(F.col("v").alias("n"),
                                    F.col("u").alias("m"))))


def kcore(triples: DataFrame, k: int = 2, rounds: int = 8) -> DataFrame:
    """Bounded-round k-core peel over the undirected asserted graph: the
    dense backbone of the KG that survives repeatedly deleting every node
    of degree < k (Seidman 1983). Hubs with many one-off leaf partners
    drop out of the 2-core leaf by leaf — the standard "is this entity in
    a real pathway module or just promiscuously mentioned" filter.

    Synchronous peel, `rounds` fixed iterations: each round computes
    degrees over the surviving symmetric adjacency, keeps nodes with
    deg >= k, and semi-joins the adjacency on BOTH endpoints. A fixed
    round count (rather than loop-until-stable) keeps the computation
    identical on any engine — the DuckDB oracle unrolls the same rounds.
    The bound is real, not cosmetic: each round peels one leaf layer, so
    a degree-<k cascade deeper than `rounds` (e.g. a bare path of more
    than 2*rounds nodes, peeled from both ends) would retain non-core
    mid nodes. Extra rounds are no-ops only once the peel has converged;
    tests/test_graph_ops.py gates rounds==rounds+1 equality on the
    shipped corpus default, and callers with deeper cascades must raise
    `rounds` to ~half the longest expected pendant path.
    Per round: one map-side-combinable count + two equi semi-joins;
    lineage truncated per round (localCheckpoint) exactly like
    pagerank_fp. At cluster scale the adjacency would be bucketed on `n`
    once so every round's aggregate and first semi-join are shuffle-free.

    Output: (node, core_deg) — survivors of the k-core with their degree
    inside the core.
    """
    sym = _und_sym(triples).localCheckpoint(eager=True)
    for _ in range(rounds):
        keep = (sym.groupBy("n").agg(F.count("*").alias("deg"))
                .where(F.col("deg") >= k)
                .select("n"))
        sym = (sym.join(keep, "n", "left_semi")
               .join(keep.withColumnRenamed("n", "m"), "m", "left_semi")
               .localCheckpoint(eager=True))
    return (sym.groupBy(F.col("n").alias("node"))
            .agg(F.count("*").cast("long").alias("core_deg")))


def bfs_hops(triples: DataFrame, min_seed_deg: int = 3,
             max_hops: int = 4) -> DataFrame:
    """Multi-source BFS hop distance over the undirected asserted graph:
    how many interaction hops each entity sits from the nearest hub
    (deterministic seed set = nodes of symmetric degree >= `min_seed_deg`).
    The KG-curation reading: "pathway neighborhood radius" — entities far
    from every hub are isolated fragments worth review.

    Classic synchronous frontier relaxation, `max_hops` rounds: each round
    candidate distances flow one hop along the adjacency and a node keeps
    min(current, neighbor+1). min() is order-insensitive, so the result is
    deterministic under any partitioning, and the DuckDB oracle unrolls
    the identical rounds. Unreached nodes are absent from the output (a
    corpus-scale graph's fringe stays fringe — no dense all-nodes row
    set). Per round: one equi-join + one min-aggregate, lineage truncated
    per round; at cluster scale the adjacency is bucketed on `n` once and
    every round reuses that layout.

    Output: (node, hops) with 0 <= hops <= max_hops.
    """
    sym = _und_sym(triples).localCheckpoint(eager=True)
    dist = (sym.groupBy("n").agg(F.count("*").alias("deg"))
            .where(F.col("deg") >= min_seed_deg)
            .select(F.col("n").alias("node"),
                    F.lit(0).cast("long").alias("hops")))
    for _ in range(max_hops):
        nxt = (sym.join(dist.withColumnRenamed("node", "n"), "n")
               .select(F.col("m").alias("node"),
                       (F.col("hops") + F.lit(1)).alias("hops")))
        dist = (dist.unionByName(nxt)
                .groupBy("node")
                .agg(F.min("hops").cast("long").alias("hops"))
                .localCheckpoint(eager=True))
    return dist


# HITS fixed-point parameters: scores are renormalized to max = 1e6 after
# every half-step via integer (truncating) division, so the iteration is
# bit-identical across engines, partitionings and summation orders.
HITS_SCALE = 1_000_000


def hits_fp(triples: DataFrame, iters: int = 3) -> DataFrame:
    """Fixed-point integer HITS (Kleinberg 1999) over the distinct
    asserted DIRECTED edge set — the natural companion of pagerank_fp on
    a KG whose edges are controller → controlled: authorities are
    entities many regulators point AT (regulation targets), hubs are
    entities that point at many good targets (master regulators). A plain
    degree count can't separate the two roles; the mutual recursion can.

    Each iteration: auth(n) = Σ hub over in-edges, then hub(n) = Σ auth
    over out-edges, each half-step renormalized to max = HITS_SCALE by
    integer division (the float L2 normalization of the paper is
    summation-order-dependent; max-normalization in int64 is exact and
    preserves the ranking). The global max is a 1-row aggregate broadcast
    back (crossJoin of a scalar — the same shape as the stride scalar in
    doc_winnow). Per iteration: two equi-joins + two hash aggregates over
    the static edge list; at cluster scale the edge list is bucketed once
    on each key side and the rank vectors stay node-keyed.

    Output: (node, auth_fp, hub_fp), scaled integers in [0, HITS_SCALE].
    """
    edges = kg_edges(triples).localCheckpoint(eager=True)
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node")))
             .distinct())
    hub = nodes.select("node",
                       F.lit(HITS_SCALE).cast("long").alias("hub_fp"))
    auth = nodes.select("node",
                        F.lit(HITS_SCALE).cast("long").alias("auth_fp"))

    def _renorm(df: DataFrame, col: str) -> DataFrame:
        mx = df.agg(F.greatest(F.max(F.col(col)),
                               F.lit(1).cast("long")).alias("_mx"))
        # the product v * HITS_SCALE can reach HITS_SCALE^2 * in_degree —
        # past int64 once any node's in-degree nears ~9.2e6 (real at crawl
        # scale). Widen the multiply to decimal(38,0): exact, wrap-free,
        # and `div` still returns BIGINT; the DuckDB oracle widens the
        # same product to HUGEINT, so the engines stay value-identical
        # instead of Spark wrapping silently where DuckDB raises.
        return (df.crossJoin(F.broadcast(mx))
                .select("node",
                        F.expr(f"(CAST({col} AS DECIMAL(38,0))"
                               f" * {HITS_SCALE}) div _mx")
                        .cast("long").alias(col)))

    for _ in range(iters):
        raw_a = (edges.join(hub.withColumnRenamed("node", "src"), "src")
                 .groupBy(F.col("dst").alias("node"))
                 .agg(F.sum("hub_fp").alias("s")))
        auth = _renorm(
            nodes.join(raw_a, "node", "left")
            .select("node", F.coalesce("s", F.lit(0)).cast("long")
                    .alias("auth_fp")),
            "auth_fp")
        raw_h = (edges.join(auth.withColumnRenamed("node", "dst"), "dst")
                 .groupBy(F.col("src").alias("node"))
                 .agg(F.sum("auth_fp").alias("s")))
        hub = _renorm(
            nodes.join(raw_h, "node", "left")
            .select("node", F.coalesce("s", F.lit(0)).cast("long")
                    .alias("hub_fp")),
            "hub_fp")
    return (auth.join(hub, "node")
            .select("node", "auth_fp", "hub_fp"))


def ppr_fp(triples: DataFrame, seed_min_deg: int = 3,
           iters: int = 3) -> DataFrame:
    """Fixed-point integer PERSONALIZED PageRank: random walk with
    restart to a seed set (here the hub entities of symmetric degree >=
    `seed_min_deg` — the same deterministic seeds as bfs_hops), over the
    directed asserted edge set. Where pagerank_fp ranks global
    importance, this ranks importance RELATIVE to the seed neighborhood —
    "which entities does the known pathway core endorse" is the
    KG-completion ranking a curator actually wants.

    Identical integer scheme to pagerank_fp (scale 1e6, damping 850/1000,
    truncating division) except the teleport mass lands only on seeds:
      new(n) = (n in seeds ? PR_TELEPORT : 0) + (850 * Σ contrib) div 1000
    so non-seed ranks decay to pure received endorsement. Per iteration:
    one equi-join + one map-side-combinable aggregate over the static
    edge list, lineage truncated once up front — the same 100 TB shape
    as pagerank_fp (bucket the edge list on src once, reuse every
    round).

    Output: (node, ppr_fp).
    """
    edges = kg_edges(triples).localCheckpoint(eager=True)
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node")))
             .distinct())
    seeds = (_und_sym(triples).groupBy("n")
             .agg(F.count("*").alias("deg"))
             .where(F.col("deg") >= seed_min_deg)
             .select(F.col("n").alias("node"),
                     F.lit(True).alias("is_seed")))
    base = (nodes.join(seeds, "node", "left")
            .select("node",
                    F.coalesce("is_seed", F.lit(False)).alias("is_seed"))
            .localCheckpoint(eager=True))
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    send = edges.join(outdeg, "src")
    ranks = base.select(
        "node",
        F.when(F.col("is_seed"), F.lit(PR_SCALE)).otherwise(F.lit(0))
        .cast("long").alias("ppr_fp"))
    for _ in range(iters):
        contrib = (send.join(ranks.withColumnRenamed("node", "src"), "src")
                   .select(F.col("dst").alias("node"),
                           F.expr("ppr_fp div outdeg").alias("c"))
                   .groupBy("node")
                   .agg(F.sum("c").alias("contrib")))
        ranks = (base.join(contrib, "node", "left")
                 .select("node",
                         (F.when(F.col("is_seed"), F.lit(PR_TELEPORT))
                          .otherwise(F.lit(0))
                          + F.expr(f"({PR_DAMP_NUM} * coalesce(contrib,"
                                   f" 0L)) div {PR_DAMP_DEN}"))
                         .cast("long").alias("ppr_fp")))
    return ranks


def adamic_adar(triples: DataFrame, min_common: int = 2) -> DataFrame:
    """Adamic–Adar link prediction over the undirected asserted KG — the
    degree-weighted refinement of `common_neighbors`: a shared neighbor
    counts for 1/deg(z) (rare shared partners are stronger evidence than
    promiscuous hubs). The classical 1/log deg(z) needs floats; the
    resource-allocation variant (Zhou et al. 2009) uses plain 1/deg and
    is made hash-comparable here as the integer sum of
    (1e6 DIV deg(z)) per shared neighbor — per-term truncating division
    THEN an integer sum, associative on both engines.

    Same wedge shape as common_neighbors with the degree joined on the
    MIDDLE node before aggregation; candidates are unconnected pairs
    with >= `min_common` shared neighbors. Output: (a, b, common,
    aa_ppm), a < b.
    """
    sym = _und_sym(triples)
    und = sym.where(F.col("n") < F.col("m")) \
        .select(F.col("n").alias("u"), F.col("m").alias("v"))
    deg = sym.groupBy("n").agg(F.count("*").cast("bigint").alias("deg"))
    w1 = sym.select(F.col("m").alias("mid"), F.col("n").alias("a"))
    w2 = sym.select(F.col("m").alias("mid"), F.col("n").alias("b"))
    pairs = (w1.join(w2, "mid")
             .where(F.col("a") < F.col("b"))
             .join(deg.select(F.col("n").alias("mid"), "deg"), "mid")
             .groupBy("a", "b")
             .agg(F.count("*").cast("bigint").alias("common"),
                  F.sum(F.expr("1000000 DIV deg")).cast("bigint")
                  .alias("aa_ppm"))
             .where(F.col("common") >= min_common))
    return pairs.join(
        und, (pairs["a"] == und["u"]) & (pairs["b"] == und["v"]),
        "left_anti")


def preferential_attachment(triples: DataFrame,
                            min_common: int = 2) -> DataFrame:
    """Preferential-attachment link prediction score deg(a)·deg(b) —
    the third classic baseline beside `common_neighbors` (count) and
    `adamic_adar` (rarity-weighted): hubs attract links, so high-degree
    unconnected pairs are a-priori likely. Restricted to the same
    candidate set (unconnected pairs sharing >= `min_common` neighbors)
    so the three scores rank one population and consumers can ensemble
    them directly. Integer product of int64 degrees — exact on both
    engines. Same wedge + anti-join shape; two broadcastable degree
    joins on the pair endpoints.

    Output: (a, b, common, pa_score), a < b.
    """
    sym = _und_sym(triples)
    und = sym.where(F.col("n") < F.col("m")) \
        .select(F.col("n").alias("u"), F.col("m").alias("v"))
    deg = sym.groupBy("n").agg(F.count("*").cast("bigint").alias("deg"))
    w1 = sym.select(F.col("m").alias("mid"), F.col("n").alias("a"))
    w2 = sym.select(F.col("m").alias("mid"), F.col("n").alias("b"))
    pairs = (w1.join(w2, "mid")
             .where(F.col("a") < F.col("b"))
             .groupBy("a", "b")
             .agg(F.count("*").cast("bigint").alias("common"))
             .where(F.col("common") >= min_common))
    cand = pairs.join(
        und, (pairs["a"] == und["u"]) & (pairs["b"] == und["v"]),
        "left_anti")
    return (cand
            .join(deg.select(F.col("n").alias("a"),
                             F.col("deg").alias("deg_a")), "a")
            .join(deg.select(F.col("n").alias("b"),
                             F.col("deg").alias("deg_b")), "b")
            .select("a", "b", "common",
                    (F.col("deg_a") * F.col("deg_b")).cast("bigint")
                    .alias("pa_score")))
