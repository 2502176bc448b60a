"""Catalog-table graph materialization (reach_spark.tables): named
partitioned tables with partition-pruned reads — the in-sandbox shape of
the Iceberg output mandate (V1 session-catalog path; the V2 writeTo path
dispatches on a plugged catalog config and is unit-tested for dispatch).
"""

import pytest

from pyspark.sql import functions as F

from reach_spark.tables import materialize, materialize_graph, \
    uses_v2_catalog


@pytest.fixture()
def tri(spark):
    rows = [("a", "Phosphorylation", "b", False, 3),
            ("b", "Binding", "c", False, 1),
            ("a", "Positive_regulation", "c", False, 2)]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, negated boolean, "
              "seen long")


def test_materialize_overwrite_append_roundtrip(spark, tri):
    materialize(tri, "t_tri_rt", partition_by=("pred",), mode="overwrite")
    assert spark.table("t_tri_rt").count() == 3
    materialize(tri, "t_tri_rt", partition_by=("pred",), mode="append")
    assert spark.table("t_tri_rt").count() == 6
    materialize(tri, "t_tri_rt", partition_by=("pred",), mode="overwrite")
    got = spark.table("t_tri_rt")
    assert got.count() == 3
    # round-trip equality (pred moves to the partition column but stays a
    # readable column)
    assert ({tuple(r) for r in got.select(*tri.columns).collect()}
            == {tuple(r) for r in tri.collect()})
    spark.sql("DROP TABLE t_tri_rt")


def test_materialize_partition_pruning(spark, tri):
    """A predicate filter on the partition column must prune at the
    partition level (PartitionFilters in the scan), not post-filter a full
    read — the property that makes `WHERE pred = X` a file skip at 100 TB."""
    materialize(tri, "t_tri_prune", partition_by=("pred",))
    q = spark.table("t_tri_prune").where(F.col("pred") == "Binding")
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted")
    pf = plan.split("PartitionFilters")[1].splitlines()[0]
    assert "pred" in pf
    assert q.count() == 1
    spark.sql("DROP TABLE t_tri_prune")


def test_materialize_graph_table_set(spark, tri):
    ents = spark.createDataFrame(
        [("uniprot:P1", "a|alpha")], "canonical_id string, names string")
    names = materialize_graph(
        {"triples": tri, "canonical_entities": ents}, prefix="t_kgx")
    assert names == {"triples": "t_kgx_triples", "entities": "t_kgx_entities"}
    assert spark.table("t_kgx_triples").count() == 3
    assert spark.table("t_kgx_entities").count() == 1
    for t in names.values():
        spark.sql(f"DROP TABLE {t}")


def test_v2_catalog_dispatch(spark, tri):
    """Dispatch predicate: a table under a configured `spark.sql.catalog.
    <name>` routes to the V2 writer; unqualified / session-catalog tables
    route V1. (The V2 write itself needs the catalog jar — Iceberg on a
    real cluster — so only the dispatch decision is testable here.)"""
    assert not uses_v2_catalog(spark, "plain_table")
    assert not uses_v2_catalog(spark, "default.plain_table")
    assert not uses_v2_catalog(spark, "spark_catalog.default.t")
    spark.conf.set("spark.sql.catalog.kgtest", "org.example.FakeCatalog")
    try:
        assert uses_v2_catalog(spark, "kgtest.db.triples")
    finally:
        spark.conf.unset("spark.sql.catalog.kgtest")
    assert not uses_v2_catalog(spark, "kgtest.db.triples")


def test_mode_validation(tri):
    with pytest.raises(ValueError):
        materialize(tri, "t_bad", mode="replace")


def test_run_batch_materializes_catalog_tables(spark, tmp_path):
    """End-to-end: run_batch with catalog_prefix leaves named catalog
    tables whose contents equal the parquet outputs, with the triples
    table partition-pruned on pred."""
    from reach_spark.pipeline import run_batch
    from reach_spark.synth import make_documents
    docs = make_documents(spark, n_docs=8, skew_every=0)
    run_batch(spark, docs, str(tmp_path / "out"), resume=False,
              catalog_prefix="t_e2e")
    tri_pq = spark.read.parquet(str(tmp_path / "out" / "triples"))
    tri_tbl = spark.table("t_e2e_triples")
    cols = sorted(tri_pq.columns)
    assert sorted(tri_tbl.columns) == cols
    def _canon(rows):  # array columns → tuples so rows are hashable
        return {tuple(tuple(v) if isinstance(v, list) else v for v in r)
                for r in rows}
    assert (_canon(tri_tbl.select(*cols).collect())
            == _canon(tri_pq.select(*cols).collect()))
    ents = spark.table("t_e2e_entities")
    assert ents.count() == spark.read.parquet(
        str(tmp_path / "out" / "canonical_entities")).count()
    one_pred = tri_pq.select("pred").first()["pred"]
    q = tri_tbl.where(F.col("pred") == one_pred)
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted")
    assert "pred" in plan.split("PartitionFilters")[1].splitlines()[0]
    for t in ("t_e2e_triples", "t_e2e_entities"):
        spark.sql(f"DROP TABLE {t}")


def test_catalog_tables_under_resume(spark, tmp_path):
    """Two resumed batches with catalog_prefix: the catalog triples table
    is overwritten from the FULL occurrence log each batch, so after batch
    2 it equals a single-batch run over the whole corpus (corpus-wide SEEN,
    not batch-local)."""
    from reach_spark.pipeline import run_batch
    from reach_spark.synth import make_documents
    full = make_documents(spark, n_docs=8, skew_every=0)
    half = full.where(F.col("doc_id") < "doc-0004")
    out = str(tmp_path / "out")
    run_batch(spark, half, out, catalog_prefix="t_res")
    run_batch(spark, full, out, catalog_prefix="t_res")  # resumes the rest
    got = {(r["subj"], r["pred"], r["obj"], r["negated"]): r["seen"]
           for r in spark.table("t_res_triples")
           .select("subj", "pred", "obj", "negated", "seen").collect()}
    ref_out = str(tmp_path / "ref")
    run_batch(spark, full, ref_out, catalog_prefix="t_ref")
    ref = {(r["subj"], r["pred"], r["obj"], r["negated"]): r["seen"]
           for r in spark.table("t_ref_triples")
           .select("subj", "pred", "obj", "negated", "seen").collect()}
    assert got == ref
    for t in ("t_res_triples", "t_res_entities",
              "t_ref_triples", "t_ref_entities"):
        spark.sql(f"DROP TABLE {t}")


def test_streaming_catalog_materialization(spark, tmp_path):
    """Streaming arm of the table mandate: with catalog_prefix the
    foreachBatch rollup refreshes a named partitioned catalog triples
    table equal to the parquet EER after the batch."""
    from reach_spark.streaming import stream_pipeline
    from reach_spark.synth import make_documents
    docs_dir = str(tmp_path / "in")
    make_documents(spark, n_docs=6, skew_every=0).write.parquet(docs_dir)
    q = stream_pipeline(spark, docs_dir, str(tmp_path / "out"),
                        str(tmp_path / "ck"), catalog_prefix="t_stream")
    q.awaitTermination(120)
    pq = spark.read.parquet(str(tmp_path / "out" / "triples_eer"))
    tbl = spark.table("t_stream_triples")
    cols = ["subj", "pred", "obj", "negated", "seen"]

    def rows(df):  # subj is NULL for un-regulated events → multiset compare
        from collections import Counter
        return Counter(map(tuple, df.select(*cols).collect()))
    assert rows(tbl) == rows(pq)
    assert tbl.count() > 0
    spark.sql("DROP TABLE t_stream_triples")


def test_graphml_lines_valid_document(spark):
    """graphml_lines: ordering by (section, sort_key) yields a
    WELL-FORMED GraphML document (ElementTree parses it), with one node
    element per distinct endpoint, one edge per EER class (negated
    included), and XML-escaped ids."""
    import xml.etree.ElementTree as ET

    from reach_spark.tables import graphml_lines
    rows = [("a&b", "P<Q", 'c"d', False, 3),
            ("a&b", "N", "x", True, 1),
            (None, "Phos", "x", False, 2)]   # no edge: null subj
    eer = spark.createDataFrame(
        rows, "subj string, pred string, obj string, negated boolean,"
              " seen long")
    lines = [r.line for r in graphml_lines(eer)
             .orderBy("section", "sort_key").collect()]
    doc = "\n".join(lines)
    root = ET.fromstring(doc)
    ns = "{http://graphml.graphdrawing.org/xmlns}"
    graph = root.find(f"{ns}graph")
    nodes = graph.findall(f"{ns}node")
    edges = graph.findall(f"{ns}edge")
    assert {n.get("id") for n in nodes} == {"a&b", 'c"d', "x"}
    assert len(edges) == 2
    by_tgt = {e.get("target"): e for e in edges}
    e1 = by_tgt['c"d']
    data = {d.get("key"): d.text for d in e1.findall(f"{ns}data")}
    assert data == {"pred": "P<Q", "seen": "3", "negated": "false"}
    assert by_tgt["x"].get("source") == "a&b"
