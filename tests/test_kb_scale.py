"""Grounding past broadcast comfort (VERDICT r3 next-round #5).

The shipped public KB tier is ~357k rows (~10 MB) — broadcasts fine. The
reference's PRODUCTION dictionaries (uniprot-proteins-*.tsv, chebi.tsv,
PubChem.tsv — build-time fetches named in
bioresources/src/main/resources/application.conf:42,158,178) are ~3M rows,
past the point where broadcasting the KB to every executor is sane at
1000-executor scale. The strategy that survives 100×:

  * the KB side (3M+ rows) is NEVER broadcast and NEVER shuffled;
  * the probe side — the DISTINCT surface vocabulary × ~11 key transforms,
    bounded by dictionary size, not by corpus size — broadcasts;
  * matched rows (≈ probe count) feed a rank-1 hash aggregate.

These tests gate that plan shape on a real 3M-row synthetic KB
(kb.synth_kb — deterministic, generated distributed via spark.range, no
driver lists) and check rank-1 semantics end-to-end at small n.
"""

import pytest
from pyspark.sql import functions as F

from reach_spark.kb import synth_kb

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_synth_kb_is_distributed_and_deterministic(spark):
    kb = synth_kb(spark, n_rows=1000, n_keys=900)
    plan = _plan(kb)
    # generated from spark.range — no LocalTableScan of driver-side rows
    assert "Range" in plan
    assert "LocalTableScan" not in plan
    rows = kb.where(F.col("key") == "syn0").orderBy("id").collect()
    # id 0 and id 900 collide on key syn0 → ambiguity exercised
    assert [r["id"] for r in rows] == ["P0", "P900"]
    assert rows[0]["tclass"] == "protein" and rows[0]["species"] == "human"


def test_g1_kb_3m_plan_kb_never_broadcast_never_shuffled(spark):
    """The decision-point gate: at 3M KB rows the PROBE side broadcasts;
    the KB streams through a BroadcastHashJoin (build side = probes) with
    no Exchange between the KB scan and the join, and the KB itself is
    not the broadcast build side."""
    from reach_spark.kg_queries import QUERIES
    fn, _ = QUERIES["g1_kb_3m"]
    plan = _plan(fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    # the broadcast exchange must be on the probe/terms subtree (which
    # reads documents.parquet), not on the synth-kb Range subtree
    bcast = plan.split("BroadcastExchange")
    assert len(bcast) >= 2
    # formatted plan lists operators top-down; find the BroadcastExchange
    # input id and check the Range scan is NOT inside any broadcast subtree
    # — cheap proxy: 'Range' appears before the join, and the substring
    # between 'BroadcastExchange' and the next 'Exchange'/end of the
    # operator list does not mention Range.
    for seg in bcast[1:]:
        head = seg.split("\n\n")[0]
        assert "Range" not in head.split("Exchange")[0]


def test_g1_kb_3m_rank1_semantics_small(spark):
    """Same routing arithmetic at n=12/keys=9: ambiguous keys take the
    min-(priority, species-rank, id) entry; n_entries counts all hits."""
    kb = synth_kb(spark, n_rows=12, n_keys=9)
    terms = spark.createDataFrame(
        [("syn0",), ("syn1",), ("syn2",), ("synX",)], ["term"])
    species_rank = (F.when(F.col("species") == "human", 0)
                    .when(F.col("species") == "", 1).otherwise(2))
    hits = kb.join(F.broadcast(terms), F.col("key") == F.col("term"))
    out = (hits.groupBy("term")
           .agg(F.count("*").alias("n_entries"),
                F.min(F.struct(F.col("kb_priority"),
                               species_rank.alias("sr"),
                               F.col("id"), F.col("ns"),
                               F.col("kb_label"))).alias("b"))
           .select("term", "n_entries", F.col("b.id").alias("id"),
                   F.col("b.kb_priority").alias("p")))
    got = {r["term"]: (r["n_entries"], r["id"], r["p"]) for r in
           out.collect()}
    assert "synX" not in got                       # miss stays absent
    # key syn0 ← ids 0 and 9: priorities 1+(0%7)=1 vs 1+(9%7)=3 → P0 wins
    assert got["syn0"] == (2, "P0", 1)
    # key syn1 ← ids 1 and 10: priorities 2 vs 4 → P1
    assert got["syn1"] == (2, "P1", 2)
    # key syn2 ← ids 2 and 11: priorities 3 vs 5 → P2
    assert got["syn2"] == (2, "P2", 3)


def test_ground_map_kb_broadcast_false_flips_build_side(spark):
    """grounding.ground_map(kb_broadcast=False): the candidate/vocabulary
    side becomes the broadcast build side; the KB scan has no Exchange."""
    from reach_spark.grounding import ground_map
    ents = spark.createDataFrame(
        [("mek", "Gene_or_gene_product", "MEK")],
        ["canonical", "label", "text"])
    kb = synth_kb(spark, n_rows=1000, n_keys=900).withColumnRenamed(
        "kb_label", "kb_label")
    out = ground_map(ents, kb, kb_broadcast=False)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # KB comes from Range; Range must not sit under the BroadcastExchange
    for seg in plan.split("BroadcastExchange")[1:]:
        head = seg.split("\n\n")[0]
        assert "Range" not in head.split("Exchange")[0]
