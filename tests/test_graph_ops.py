"""Downstream KG analytics (graph_ops) over the materialized triples table:
degree, two-hop chains, fixed-point PageRank — hand-computed expectations on
a small synthetic EER table, determinism/invariance properties, and a plan
gate (the chain self-join must be an equi-join, never cartesian/BNLJ).
"""

import pytest

from pyspark.sql import functions as F

from reach_spark.graph_ops import (PR_DAMP_DEN, PR_DAMP_NUM, PR_SCALE,
                                   PR_TELEPORT, entity_degree, kg_edges,
                                   pagerank_fp, two_hop_chains)

SCHEMA = "subj string, pred string, obj string, negated boolean, seen long"

# a -P-> b (seen 3), b -Q-> c (seen 1), a -R-> c (seen 2),
# negated a->b (dropped from edges/chains), subj-null simple event on c
ROWS = [
    ("a", "P", "b", False, 3),
    ("b", "Q", "c", False, 1),
    ("a", "R", "c", False, 2),
    ("a", "N", "b", True, 5),
    (None, "Phosphorylation", "c", False, 7),
]


@pytest.fixture()
def eer(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_kg_edges_distinct_asserted(eer):
    got = {(r.src, r.dst) for r in kg_edges(eer).collect()}
    assert got == {("a", "b"), ("b", "c"), ("a", "c")}
    # negated rows kept when asserted_only=False
    got_all = {(r.src, r.dst)
               for r in kg_edges(eer, asserted_only=False).collect()}
    assert got_all == got  # (a,b) already present — still distinct


def test_entity_degree(eer):
    rows = {r.node: r for r in entity_degree(eer).collect()}
    # a: subj of 3 classes (incl. negated), never obj
    assert (rows["a"].out_deg, rows["a"].in_deg) == (3, 0)
    assert rows["a"].out_seen == 3 + 2 + 5 and rows["a"].in_seen == 0
    # b: subj of 1, obj of 2 (asserted + negated)
    assert (rows["b"].out_deg, rows["b"].in_deg) == (1, 2)
    assert rows["b"].out_seen == 1 and rows["b"].in_seen == 3 + 5
    # c: obj of 3 classes incl. the subj-null simple event
    assert (rows["c"].out_deg, rows["c"].in_deg) == (0, 3)
    assert rows["c"].in_seen == 1 + 2 + 7


def test_two_hop_chains(eer):
    got = {(r.a, r.pred1, r.b, r.pred2, r.c, r.support)
           for r in two_hop_chains(eer).collect()}
    # only asserted 2-hop path: a -P-> b -Q-> c, support = min(3, 1)
    assert got == {("a", "P", "b", "Q", "c", 1)}


def test_pagerank_hand_computed(eer):
    """One iteration by hand on the 3-edge graph: a has outdeg 2, b outdeg 1.
    contrib(b) = PR_SCALE div 2; contrib(c) = PR_SCALE div 2 + PR_SCALE."""
    ranks = {r.node: r.pr_fp for r in pagerank_fp(eer, iters=1).collect()}
    half = PR_SCALE // 2

    def step(contrib):
        return PR_TELEPORT + (PR_DAMP_NUM * contrib) // PR_DAMP_DEN

    assert ranks["a"] == PR_TELEPORT  # no in-edges
    assert ranks["b"] == step(half)
    assert ranks["c"] == step(half + PR_SCALE)


def test_pagerank_deterministic_across_partitioning(eer, spark):
    """Fixed-point integer arithmetic: identical ranks regardless of
    partition count (float PageRank would differ in the last ulps)."""
    base = sorted((r.node, r.pr_fp)
                  for r in pagerank_fp(eer, iters=3).collect())
    re = sorted((r.node, r.pr_fp)
                for r in pagerank_fp(eer.repartition(7), iters=3).collect())
    assert base == re
    # iterating changes ranks (the fixpoint is not reached at iter 1)
    one = sorted((r.node, r.pr_fp)
                 for r in pagerank_fp(eer, iters=1).collect())
    assert base != one


def test_pagerank_mass_bounds(eer):
    """Every rank is >= teleport mass; sink ranks exceed source ranks on
    this DAG (endorsement flows a -> b -> c)."""
    ranks = {r.node: r.pr_fp for r in pagerank_fp(eer, iters=3).collect()}
    assert all(v >= PR_TELEPORT for v in ranks.values())
    assert ranks["c"] > ranks["b"] > ranks["a"]


def test_two_hop_join_is_equi_not_cartesian(eer):
    """Plan gate: the chain self-join must hash/sort-merge on the node key —
    a cartesian or broadcast-nested-loop here is the 100 TB killer."""
    plan = two_hop_chains(eer)._sc._jvm.PythonSQLUtils.explainString(
        two_hop_chains(eer)._jdf.queryExecution(), "formatted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_triangles_hand_computed(eer):
    """ROWS closes exactly one triangle {a,b,c}; the negated a->b edge must
    not be needed for it (the asserted a-P->b supplies that side), and the
    null-subj occurrence row contributes no edge."""
    from reach_spark.graph_ops import triangles
    got = {(r.a, r.b, r.c) for r in triangles(eer).collect()}
    assert got == {("a", "b", "c")}


def test_triangles_direction_and_dup_insensitive(spark):
    """A triangle is found regardless of edge orientation, reverse edges do
    not double-count it, and self-loops never form one."""
    from reach_spark.graph_ops import triangles
    rows = [
        ("y", "P", "x", False, 1),   # reversed orientation
        ("y", "Q", "z", False, 1),
        ("z", "R", "x", False, 1),   # reversed orientation
        ("x", "S", "y", False, 1),   # duplicate of x-y, other direction
        ("x", "L", "x", False, 1),   # self-loop
    ]
    eer = spark.createDataFrame(rows, SCHEMA)
    got = [(r.a, r.b, r.c) for r in triangles(eer).collect()]
    assert got == [("x", "y", "z")]


def test_triangles_plan_no_cartesian(eer):
    from reach_spark.graph_ops import triangles
    df = triangles(eer)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_clustering_counts_hand_computed(spark):
    """K3 plus a pendant: triangle nodes get tri=1; the pendant and its
    attachment have the right wedge counts; coefficient inputs are exact
    integers."""
    from reach_spark.graph_ops import clustering_counts
    rows = [("a", "P", "b", False, 1), ("b", "P", "c", False, 1),
            ("a", "P", "c", False, 1), ("c", "P", "d", False, 1)]
    eer = spark.createDataFrame(rows, SCHEMA)
    got = {r.node: (r.tri, r.wedges)
           for r in clustering_counts(eer).collect()}
    assert got == {"a": (1, 1), "b": (1, 1), "c": (1, 3), "d": (0, 0)}


def test_label_propagation_two_cliques(spark):
    """LPA: a triangle bridged to another triangle by one edge resolves
    to per-clique communities (the bridge may carry a label NAME across —
    the partition structure is the assertion); deterministic across
    partitionings."""
    from reach_spark.graph_ops import label_propagation
    rows = [(s, "P", o, False, 1) for s, o in
            [("a", "b"), ("b", "c"), ("a", "c"),      # clique 1
             ("x", "y"), ("y", "z"), ("x", "z"),      # clique 2
             ("c", "x")]]                             # bridge
    eer = spark.createDataFrame(rows, SCHEMA)
    got = {r["node"]: r["community"]
           for r in label_propagation(eer, iters=3).collect()}
    # labels are clique-consistent and the cliques stay separated (the
    # bridge may carry a label name across, structure is what matters)
    assert got["a"] == got["b"] == got["c"]
    assert got["x"] == got["y"] == got["z"]
    assert got["a"] != got["x"]
    got2 = {r["node"]: r["community"]
            for r in label_propagation(eer.repartition(7), iters=3)
            .collect()}
    assert got2 == got


def test_common_neighbors_link_prediction(spark):
    """common_neighbors: only UNCONNECTED pairs appear, counts are the
    true shared-neighbor counts, Jaccard is integer ppm over the
    undirected degrees; hand-checked diamond graph."""
    from reach_spark.graph_ops import common_neighbors
    # diamond: A-B, A-C, D-B, D-C (A,D unconnected, share {B,C});
    # B,C unconnected, share {A,D}; plus edge B-C would close it — omit.
    rows = [("A", "B"), ("A", "C"), ("D", "B"), ("D", "C")]
    df = spark.createDataFrame(
        [(s, "Binding", o, False, 1) for s, o in rows],
        "subj string, pred string, obj string, negated boolean, seen long")
    out = {(r.a, r.b): (r.common, r.jaccard_ppm)
           for r in common_neighbors(df).collect()}
    assert out == {("A", "D"): (2, 1_000_000),
                   ("B", "C"): (2, 1_000_000)}
    # connect A-D: the pair must vanish from the candidate list
    df2 = spark.createDataFrame(
        [(s, "Binding", o, False, 1) for s, o in rows + [("A", "D")]],
        "subj string, pred string, obj string, negated boolean, seen long")
    out2 = {(r.a, r.b) for r in common_neighbors(df2).collect()}
    assert ("A", "D") not in out2 and ("B", "C") in out2


def test_kcore_peel_cascade(spark):
    """kcore(k=2): a triangle with a two-node tail — the tail peels off in
    a CASCADE (e first, which drops d below k the next round), leaving the
    triangle with in-core degree 2 everywhere."""
    from reach_spark.graph_ops import kcore
    rows = [(s, "P", o, False, 1) for s, o in
            [("a", "b"), ("b", "c"), ("a", "c"),   # triangle = the 2-core
             ("c", "d"), ("d", "e")]]              # tail: deg(e)=1
    eer = spark.createDataFrame(rows, SCHEMA)
    got = {r.node: r.core_deg for r in kcore(eer, k=2).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}
    # determinism across partitionings
    got2 = {r.node: r.core_deg
            for r in kcore(eer.repartition(7), k=2).collect()}
    assert got2 == got
    # k=3 empties this graph entirely
    assert kcore(eer, k=3).count() == 0


def test_kcore_round_bound_is_real_and_documented(spark):
    """The fixed round count under-approximates on peel cascades deeper
    than `rounds`: a bare path peels from both ends, one leaf layer per
    round, so a path of > 2*rounds nodes retains mid nodes at the
    default. This pins the documented bound — and that raising `rounds`
    reaches the true (empty) 2-core."""
    from reach_spark.graph_ops import kcore
    L = 20  # path p0-p1-...-p19: true 2-core is empty
    rows = [(f"p{i:02d}", "P", f"p{i + 1:02d}", False, 1)
            for i in range(L - 1)]
    eer = spark.createDataFrame(rows, SCHEMA)
    # rounds=8 peels 2 nodes/round -> 4 mid nodes survive spuriously
    assert kcore(eer, k=2, rounds=8).count() == 4
    # rounds >= ceil(L/2) converges to the true empty 2-core
    assert kcore(eer, k=2, rounds=10).count() == 0


def test_kcore_default_rounds_converged_on_flagship_corpus(spark):
    """Convergence gate for the SHIPPED default (kg_kcore: k=2, rounds=8)
    on the corpus the driver checks: round 8 must equal round 9, i.e. the
    fixed unroll is demonstrably at the fixed point, so the oracle-parity
    equality is also true-2-core equality (ADVICE r4)."""
    import __spark_entry__ as entrymod
    from reach_spark.graph_ops import kcore
    eer = entrymod._eer_table(spark, "/root/testdata/sf0.001")
    r8 = {(r.node, r.core_deg)
          for r in kcore(eer, k=2, rounds=8).collect()}
    r9 = {(r.node, r.core_deg)
          for r in kcore(eer, k=2, rounds=9).collect()}
    assert r8 == r9


def test_bfs_hops_from_hub(spark):
    """bfs_hops: on the triangle+tail graph only c has degree >= 3, so it
    is the sole seed; hops are graph distance from c, tail end at 2."""
    from reach_spark.graph_ops import bfs_hops
    rows = [(s, "P", o, False, 1) for s, o in
            [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")]]
    eer = spark.createDataFrame(rows, SCHEMA)
    got = {r.node: r.hops for r in bfs_hops(eer, min_seed_deg=3).collect()}
    assert got == {"c": 0, "a": 1, "b": 1, "d": 1, "e": 2}
    got2 = {r.node: r.hops
            for r in bfs_hops(eer.repartition(5), min_seed_deg=3).collect()}
    assert got2 == got


def test_bfs_hops_bounded(spark):
    """Nodes beyond max_hops from every seed are absent (no dense
    all-nodes output), and a tighter bound truncates the frontier."""
    from reach_spark.graph_ops import bfs_hops
    # star hub h-(x1..x3) then a path x1-p1-p2-p3
    rows = [("h", x) for x in ("x1", "x2", "x3")] + [
        ("x1", "p1"), ("p1", "p2"), ("p2", "p3")]
    eer = spark.createDataFrame(
        [(s, "P", o, False, 1) for s, o in rows], SCHEMA)
    got = {r.node: r.hops for r in bfs_hops(eer, min_seed_deg=3,
                                            max_hops=2).collect()}
    assert got == {"h": 0, "x1": 1, "x2": 1, "x3": 1, "p1": 2}
    assert "p2" not in got and "p3" not in got


def test_hits_hand_computed(spark):
    """hits_fp on a->b, c->b, b->d: b is the authority (both hubs point at
    it), a and c are the hubs; hand-unrolled 3 iterations of the
    max-renormalized integer recursion."""
    from reach_spark.graph_ops import hits_fp
    rows = [("a", "P", "b", False, 1), ("c", "P", "b", False, 1),
            ("b", "P", "d", False, 1)]
    eer = spark.createDataFrame(rows, SCHEMA)
    got = {r.node: (r.auth_fp, r.hub_fp) for r in hits_fp(eer).collect()}
    assert got == {"a": (0, 1_000_000), "c": (0, 1_000_000),
                   "b": (1_000_000, 125_000), "d": (125_000, 0)}
    got2 = {r.node: (r.auth_fp, r.hub_fp)
            for r in hits_fp(eer.repartition(5)).collect()}
    assert got2 == got


def test_kcore_bfs_hits_plans_no_cartesian(eer):
    """Plan gate: every join in the three new iterative operators is an
    equi-join (or a broadcast of the 1-row renorm scalar) — never a
    cartesian/BNLJ over node-keyed relations."""
    from reach_spark.graph_ops import bfs_hops, hits_fp, kcore
    for df in (kcore(eer, rounds=2), bfs_hops(eer, max_hops=2)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
    # hits_fp: the renorm scalar is a deliberate 1-row broadcast (the same
    # bounded shape as doc_winnow's stride scalar) — BNLJ against one row
    # is the intended plan; a CartesianProduct would not be.
    plan = hits_fp(eer, iters=1)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_ppr_seed_restricted_teleport(spark):
    """ppr_fp: teleport mass lands only on seeds — on the triangle+tail
    graph (sole hub c), c keeps the full teleport term, its neighbors get
    only received endorsement, and nodes with no inbound path from the
    seed decay toward zero; deterministic across partitionings."""
    from reach_spark.graph_ops import PR_TELEPORT, ppr_fp
    rows = [(s, "P", o, False, 1) for s, o in
            [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")]]
    eer = spark.createDataFrame(rows, SCHEMA)
    got = {r.node: r.ppr_fp for r in ppr_fp(eer).collect()}
    # c is the only seed: its rank includes the teleport floor
    assert got["c"] >= PR_TELEPORT
    # a has no in-edges and is not a seed -> exactly zero after iter 1
    assert got["a"] == 0
    # d is fed by the seed directly; e by d — both positive, d > e
    assert got["d"] > got["e"] > 0
    got2 = {r.node: r.ppr_fp
            for r in ppr_fp(eer.repartition(5)).collect()}
    assert got2 == got


def test_adamic_adar_weights_rare_neighbors(spark):
    """adamic_adar: on a double-diamond where one candidate pair shares
    two degree-2 neighbors and another shares two hub neighbors, the
    rare-neighbor pair scores higher at equal common counts; connected
    pairs never appear."""
    from reach_spark.graph_ops import adamic_adar
    # A-B, A-C, D-B, D-C  (A,D share B,C — both degree 2 + hub edges)
    # plus hub H connected to B and C and E,F..., raising deg(B),deg(C)
    rows = [("A", "B"), ("A", "C"), ("D", "B"), ("D", "C"),
            ("E", "X"), ("E", "Y"), ("F", "X"), ("F", "Y"),
            ("X", "H1"), ("X", "H2"), ("Y", "H3"), ("Y", "H4")]
    eer = spark.createDataFrame(
        [(s, "P", o, False, 1) for s, o in rows], SCHEMA)
    got = {(r.a, r.b): (r.common, r.aa_ppm)
           for r in adamic_adar(eer).collect()}
    # A,D share B(deg2) and C(deg2): aa = 2 * (1e6 div 2) = 1_000_000
    assert got[("A", "D")] == (2, 1_000_000)
    # E,F share X(deg4) and Y(deg4): aa = 2 * (1e6 div 4) = 500_000
    assert got[("E", "F")] == (2, 500_000)
    assert got[("A", "D")][1] > got[("E", "F")][1]
    got2 = {(r.a, r.b): (r.common, r.aa_ppm)
            for r in adamic_adar(eer.repartition(5)).collect()}
    assert got2 == got


def test_preferential_attachment_scores(spark):
    """preferential_attachment: same candidate set as the other two LP
    baselines (unconnected, common >= 2), score = deg(a)*deg(b)."""
    from reach_spark.graph_ops import preferential_attachment
    rows = [("A", "B"), ("A", "C"), ("D", "B"), ("D", "C"), ("D", "E")]
    eer = spark.createDataFrame(
        [(s, "P", o, False, 1) for s, o in rows], SCHEMA)
    got = {(r.a, r.b): (r.common, r.pa_score)
           for r in preferential_attachment(eer).collect()}
    # A(deg2), D(deg3) share B,C -> 2*3; B(deg2),C(deg2) share A,D -> 4
    assert got == {("A", "D"): (2, 6), ("B", "C"): (2, 4)}
    got2 = {(r.a, r.b): (r.common, r.pa_score)
            for r in preferential_attachment(eer.repartition(5))
            .collect()}
    assert got2 == got
