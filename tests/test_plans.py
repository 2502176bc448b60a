"""Physical-plan quality gates: the optimizations the 100 TB design relies
on must be visible in `.explain` — predicate pushdown into the parquet
scan, column pruning, broadcast hash joins for dims, whole-stage codegen
spans. A plan regression (e.g. a broadcast silently becoming a sort-merge
of the big side) fails here before it costs a cluster-day.
"""

import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_filter_pushdown_to_parquet(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    q = (li.where(F.col("l_shipdate") <= "1997-01-01")
         .select("l_orderkey", "l_quantity"))
    plan = _plan(q)
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1].splitlines()[0]


def test_column_pruning(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    q = li.select("l_orderkey", "l_quantity")
    plan = _plan(q)
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema  # unused column not read


def test_grounding_uses_broadcast_join(spark):
    """The KB and grounding-map joins must be BroadcastHashJoin — the big
    mention side must never shuffle (SURVEY §2.6 G3)."""
    from reach_spark.grounding import ground_entities, kb_dataframe
    from reach_spark.schemas import MENTIONS
    ents = spark.createDataFrame([], MENTIONS).withColumn(
        "g_dummy", F.lit(1)).drop("g_dummy")
    out = ground_entities(ents, kb_dataframe(spark))
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_whole_stage_codegen_in_relational(spark):
    from reach_spark.relational import q1_pricing_summary
    df = q1_pricing_summary(spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "codegen")
    assert "WholeStageCodegen" in plan
    assert "Found" in plan  # 'Found N WholeStageCodegen subtrees'


def test_q3_broadcasts_dims(spark):
    from reach_spark.relational import q3_topk_revenue
    plan = _plan(q3_topk_revenue(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


@pytest.mark.parametrize("qname", ["dedup_minhash_sig", "token_count",
                                   "lang_id", "quality_score",
                                   "vocab_topk", "dedup_substring_spans",
                                   "quality_lm_rank", "doc_keywords_tfidf",
                                   "source_stats", "mixing_rates",
                                   "quality_bigram_novelty",
                                   "split_assign", "corpus_profile"])
def test_textops_no_python_udf(spark, qname):
    """Dedup/text-analysis hot paths are built-in expressions only — no
    row-at-a-time Python, no pandas UDF (BASELINE.json input_hint
    mandate)."""
    from reach_spark import textops
    fn, _ = textops.QUERIES[qname]
    plan = _plan(fn(spark, SF_DIR))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan


def test_near_groups_transitive_collapse(spark):
    """dedup_near_groups: A~B and B~C must land in ONE group (transitive
    closure over LSH pairs), singletons keep their own id, and the final
    doc-side join must not be a cartesian product."""
    from reach_spark import textops
    fn, _ = textops.QUERIES["dedup_near_groups"]
    df = fn(spark, SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = {r["doc_id"]: (r["group_id"], r["is_canonical"])
            for r in df.collect()}
    assert rows, "empty result"
    # every group id is a member of its own group and flagged canonical
    for doc, (grp, canon) in rows.items():
        assert rows[grp][0] == grp  # group representative is stable
        assert rows[grp][1] is True
        assert canon == (doc == grp)


def test_asof_no_expanding_join(spark):
    """The as-of join must be the union + carry-forward window (ONE
    co-partitioned exchange), never a non-equi join that expands to all
    prior orders per event (BroadcastNestedLoopJoin / CartesianProduct)."""
    from reach_spark.relational import asof_latest_order
    plan = _plan(asof_latest_order(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_embed_cosine_dedup_banded_equijoin(spark):
    """Embedding near-dup candidates come from the banded sign-LSH
    equi-join on (band, key) — a SortMergeJoin/ShuffledHashJoin on the
    band key, never an all-pairs product over the embeddings table."""
    from reach_spark.similarity import dedup_embed_cosine
    plan = _plan(dedup_embed_cosine(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_multiprobe_no_cartesian(spark):
    """Multi-probe ANN joins probe buckets against neighbor buckets — a
    hash join on the bucket key, never an all-pairs product."""
    from reach_spark.similarity import ann_lsh_multiprobe
    plan = _plan(ann_lsh_multiprobe(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_plan_and_recall(spark):
    """IVF-Flat ANN: the coarse quantizer is a broadcast K-way fan-out
    (BroadcastNestedLoopJoin against the tiny centroid table — bounded
    K=64 candidates per row, never an all-pairs product of the collection
    against itself), and the probe→assignment search join is a hash join
    on the cell key. The big side must never shuffle-sort (no
    SortMergeJoin, no non-broadcast CartesianProduct). Recall is checked
    against the exact brute-force baseline."""
    from reach_spark.similarity import ann_ivf_topk, ann_topk_bruteforce
    df = ann_ivf_topk(spark, SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan  # probes ⋈ assignment on cell
    ivf = df.collect()
    by_q = {}
    for r in ivf:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        assert len(rows) <= 10
        assert sorted(r["rank"] for r in rows) == list(
            range(1, len(rows) + 1))
        assert all(-1.000001 <= r["sim"] <= 1.000001 for r in rows)
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf}
    exact = {(r["query_id"], r["neighbor_id"])
             for r in ann_topk_bruteforce(spark, SF_DIR).collect()}
    # random-embedding corpus at nprobe=2/K=64 measures 0.38; the gate
    # guards against a silent degeneration (empty cells, broken probe)
    assert len(got & exact) / len(exact) >= 0.25


def test_streaming_availablenow(spark, tmp_path):
    """Structured Streaming wrapper: one availableNow micro-batch over the
    documents dir produces the same triples as the batch pipeline."""
    from reach_spark.streaming import stream_pipeline
    from reach_spark.synth import make_documents
    docs_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    make_documents(spark, n_docs=6, skew_every=0).write.parquet(docs_dir)
    q = stream_pipeline(spark, docs_dir, out_dir, ck_dir)
    q.awaitTermination(120)
    triples = spark.read.parquet(out_dir + "/triples")
    assert triples.count() > 0
    # the per-batch EER rollup exists and deduplicates the log
    eer = spark.read.parquet(out_dir + "/triples_eer")
    assert 0 < eer.count() <= triples.count()
    assert eer.groupBy("subj", "pred", "obj", "negated").count() \
        .where(F.col("count") > 1).count() == 0
    from reach_spark.pipeline import extract_dataframe
    batch = extract_dataframe(
        spark, spark.read.parquet(docs_dir),
        with_coref=False)["triple_occurrences"]
    cols = ["doc_id", "sent_idx", "event_id", "subj", "pred", "obj"]
    assert triples.select(cols).exceptAll(batch.select(cols)).count() == 0


def test_streaming_multibatch_seen_accumulates(spark, tmp_path):
    """Two micro-batches (same checkpoint): the EER rollup's SEEN counts
    accumulate across batches — the overwrite-from-full-log contract —
    and equal the batch pipeline over the union of both inputs. The
    checkpoint must also prevent reprocessing of batch-A files."""
    from reach_spark.streaming import stream_pipeline
    from reach_spark.synth import make_documents
    from reach_spark.pipeline import extract_dataframe
    from reach_spark.triples import assemble_triples
    docs_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    # batch A and batch B share content (seed-offset ranges overlap) so
    # some EER classes gain evidence in batch B
    make_documents(spark, n_docs=6, skew_every=3, skew_repeat=2) \
        .write.mode("append").parquet(docs_dir)
    q = stream_pipeline(spark, docs_dir, out_dir, ck_dir)
    q.awaitTermination(180)
    occ_a = spark.read.parquet(out_dir + "/triples").count()
    make_documents(spark, n_docs=12, skew_every=3, skew_repeat=2) \
        .where("doc_id like '%1'") \
        .write.mode("append").parquet(docs_dir)
    q = stream_pipeline(spark, docs_dir, out_dir, ck_dir)
    q.awaitTermination(180)
    occ_ab = spark.read.parquet(out_dir + "/triples")
    assert occ_ab.count() > occ_a        # batch B appended, A not redone
    eer = spark.read.parquet(out_dir + "/triples_eer")
    expected = assemble_triples(
        extract_dataframe(spark, spark.read.parquet(docs_dir),
                          with_coref=False,
                          persist=False)["triple_occurrences"])
    cols = ["subj", "pred", "obj", "negated", "seen"]
    assert eer.select(cols).exceptAll(expected.select(cols)).count() == 0
    assert expected.select(cols).exceptAll(eer.select(cols)).count() == 0


def test_stateful_eer_rollup_matches_batch(spark, tmp_path):
    """applyInPandasWithState EER rollup: two micro-batches over the
    occurrence log; the reconstructed state table equals the batch
    aggregate over the FULL log, and the second batch's changelog touches
    ONLY the classes that batch carried evidence for — the O(batch)
    incremental property that replaces the full-log re-aggregate."""
    from reach_spark.pipeline import extract_dataframe
    from reach_spark.streaming import read_eer_state, stream_eer_rollup
    from reach_spark.synth import make_documents
    from reach_spark.triples import assemble_triples
    occ_dir = str(tmp_path / "occ")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    docs_a = make_documents(spark, n_docs=6, skew_every=0)
    occ_a = extract_dataframe(spark, docs_a, with_coref=False,
                              persist=False)["triple_occurrences"]
    occ_a.write.mode("append").partitionBy("pred").parquet(occ_dir)
    q = stream_eer_rollup(spark, occ_dir, out_dir, ck_dir)
    q.awaitTermination(180)
    run1_max = spark.read.parquet(out_dir + "/triples_eer_updates") \
        .groupBy().agg(F.max("batch_id")).first()[0]
    # batch B: disjoint doc ids (prefix), partially different content
    # (different seed), so some classes accumulate and some stay A-only
    docs_b = (make_documents(spark, n_docs=4, seed=43, skew_every=0)
              .withColumn("doc_id",
                          F.concat(F.lit("b"), F.col("doc_id"))))
    occ_b = extract_dataframe(spark, docs_b, with_coref=False,
                              persist=False)["triple_occurrences"]
    occ_b.write.mode("append").partitionBy("pred").parquet(occ_dir)
    q = stream_eer_rollup(spark, occ_dir, out_dir, ck_dir)
    q.awaitTermination(180)

    got = read_eer_state(spark, out_dir)
    exp = assemble_triples(spark.read.parquet(occ_dir))
    cols = ["subj", "pred", "obj", "negated", "hypothesis", "is_direct",
            "trigger", "found_by", "seen", "seen_in"]
    assert got.select(cols).exceptAll(exp.select(cols)).count() == 0
    assert exp.select(cols).exceptAll(got.select(cols)).count() == 0

    # incremental property: run-2 changelog keys ⊆ batch-B evidence keys
    # (set ops are null-safe on the nullable subj), and strictly fewer
    # rows than the full class count — no full rewrite happened
    upd = spark.read.parquet(out_dir + "/triples_eer_updates")
    touched = (upd.where(F.col("batch_id") > run1_max)
               .select("subj", "pred", "obj", "negated").distinct())
    b_keys = occ_b.select("subj", "pred", "obj", "negated").distinct()
    assert touched.exceptAll(b_keys).count() == 0
    assert 0 < touched.count() < exp.count()


def test_stream_ingest_metrics_watermarked(spark, tmp_path):
    """Watermarked windowed ingest telemetry: the update-mode changelog's
    latest rows account for every input doc/span, and the streaming plan
    carries the watermark + stateful window aggregate (eviction-capable
    state — the unbounded-ingest requirement)."""
    from reach_spark.streaming import stream_ingest_metrics
    from reach_spark.synth import make_documents
    docs_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "out")
    docs = make_documents(spark, n_docs=8, skew_every=4, skew_repeat=3)
    docs.write.parquet(docs_dir)
    q = stream_ingest_metrics(spark, docs_dir, out_dir,
                              str(tmp_path / "ck"))
    q.awaitTermination(120)
    m = spark.read.parquet(out_dir + "/ingest_metrics")
    latest = (m.groupBy("win_start", "win_end")
              .agg(F.max_by(F.struct("docs", "text_spans", "media_spans",
                                     "text_chars"), "batch_id").alias("s"))
              .select("s.*"))
    tot = latest.groupBy().sum("docs", "text_spans", "media_spans",
                               "text_chars").first()
    exp = docs.select(
        F.count("*"),
        F.sum(F.size(F.filter("spans",
                              lambda s: s["kind"] == F.lit("text")))),
        F.sum(F.size(F.filter("spans",
                              lambda s: s["kind"] == F.lit("media")))),
        F.sum(F.aggregate(
            F.filter("spans", lambda s: s["kind"] == F.lit("text")),
            F.lit(0), lambda a, s: a + F.length(s["text"])))).first()
    assert tuple(tot) == tuple(exp)


def test_kb_bioresources_join_broadcasts(spark):
    """The ≥300k-row bioresources KB join must broadcast the KB side: the
    document/term side streams through a BroadcastHashJoin (no shuffle of
    the big side, no nested-loop fallback) — the property that keeps
    grounding viable when the corpus side is 100 TB."""
    from reach_spark.kg_queries import QUERIES
    fn, _ = QUERIES["g1_kb_bioresources"]
    plan = _plan(fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan


def test_ground_map_broadcasts_full_kb(spark):
    """ground_map against the full inline+bioresources union stays a
    broadcast join chain (the 356k-row KB is the build side)."""
    from reach_spark.grounding import ground_map, kb_dataframe
    ents = spark.createDataFrame(
        [(None, "Gene_or_gene_product", "KRAS")],
        "canonical string, label string, text string")
    plan = _plan(ground_map(ents, kb_dataframe(spark)))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_simhash_pairs_banded_no_allpairs(spark):
    """SimHash pair generation joins on the (band_idx, band_bits) key —
    never an all-pairs product — and every emitted pair is within the
    Hamming bound with doc_a < doc_b (pigeonhole completeness is exact for
    4 bands over 16 bits at max distance 3)."""
    from reach_spark.textops import QUERIES
    fn, _ = QUERIES["dedup_simhash_pairs"]
    df = fn(spark, SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = df.collect()
    assert rows
    assert all(r["doc_a"] < r["doc_b"] and 0 <= r["hamming"] <= 3
               for r in rows)
    # exhaustive cross-check on the signatures: banded candidates + confirm
    # find EXACTLY the same pair set as brute force (pigeonhole guarantee)
    sig = {r["doc_id"]: r["simhash16"] for r in
           QUERIES["dedup_simhash"][0](spark, SF_DIR).collect()}
    ids = sorted(sig)
    brute = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
             if bin(sig[a] ^ sig[b]).count("1") <= 3}
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == brute


def test_stream_dedup_exact_first_copy_survives(spark, tmp_path):
    """Streaming ingest dedup: across two micro-batches, exactly one copy
    per distinct span payload survives (state keyed on the content hash,
    doc_id excluded so a re-crawl under a new id still dedups), and the
    second batch's genuinely-new content still lands."""
    from reach_spark.streaming import stream_dedup_exact
    from reach_spark.synth import make_documents
    docs_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    # batch A: 6 docs with heavy duplication (skew_every=2 repeats spans)
    a = make_documents(spark, n_docs=6, skew_every=2, skew_repeat=3)
    a.write.parquet(docs_dir)
    q = stream_dedup_exact(spark, docs_dir, out_dir, ck)
    q.awaitTermination(120)
    # batch B: re-deliver A (re-crawl, new doc ids) + 4 new docs
    b_new = make_documents(spark, n_docs=4, skew_every=100, skew_repeat=1,
                           seed=77)
    a.withColumn("doc_id", F.concat(F.lit("re-"), "doc_id")).union(b_new) \
        .write.mode("append").parquet(docs_dir)
    q = stream_dedup_exact(spark, docs_dir, out_dir, ck)
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir + "/deduped_docs")
    n_distinct_payloads = (
        spark.read.parquet(docs_dir)
        .select(F.sha2(F.to_json(F.struct("spans")), 256).alias("h"))
        .distinct().count())
    # one survivor per distinct payload, and no payload emitted twice
    assert got.count() == n_distinct_payloads
    assert got.select("content_hash").distinct().count() == got.count()
    # the re-crawled copies were dropped: no 're-' doc id survived with a
    # payload already seen in batch A
    a_hashes = {r["h"] for r in a.select(
        F.sha2(F.to_json(F.struct("spans")), 256).alias("h"))
        .distinct().collect()}
    survivors_re = got.where(F.col("doc_id").startswith("re-"))
    for r in survivors_re.select("content_hash").collect():
        assert r["content_hash"] not in a_hashes


def test_kmeans_semdedup_plans(spark):
    """k-means assignment is a broadcast K-way fan-out (deliberate tiny
    broadcast side); SemDeDup pairs come from the CLUSTER equi-join —
    never an all-pairs CartesianProduct — and neither op runs Python."""
    from reach_spark import similarity
    for q in ("kmeans_embeddings", "dedup_semantic"):
        fn, _ = similarity.QUERIES[q]
        plan = _plan(fn(spark, SF_DIR))
        assert "CartesianProduct" not in plan, q
        assert "BatchEvalPython" not in plan, q
        assert "ArrowEvalPython" not in plan, q


def test_brat_standoff_plan_no_cartesian_no_python(spark):
    """The Brat standoff build (six-way traversal of the mention table:
    T spans, trigger map, events, relations, args, notes) must stay
    equi-joins + per-doc windows — no cartesian/broadcast-nested-loop
    shapes and no Python in the plan (the mentions input here is a
    parquet scan, exactly the staged batch path run_batch uses)."""
    import tempfile

    from pyspark.sql import Row

    from reach_spark.brat import brat_standoff
    from reach_spark.pipeline import extract_dataframe

    docs = spark.createDataFrame(
        [Row(doc_id="0", spans=[Row(
            kind="text",
            text="Mek was not phosphorylated by Erk.",
            media_ref="", offset=0)])])
    res = extract_dataframe(spark, docs, with_coref=False)
    with tempfile.TemporaryDirectory() as td:
        res["resolved_mentions"].write.parquet(f"{td}/m")
        res["sentences"].write.parquet(f"{td}/s")
        out = brat_standoff(spark.read.parquet(f"{td}/m"),
                            spark.read.parquet(f"{td}/s"))
        plan = _plan(out)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert out.count() > 0


def test_events_rollup_window_over_aggregate(spark):
    """events_rollup_hourly: the moving-average Window must consume the
    bucketed AGGREGATE, never raw events — in the executed plan the
    HashAggregate sits below the Window; and no Python UDF anywhere."""
    from reach_spark.relational import events_rollup_hourly
    df = events_rollup_hourly(spark, SF_DIR)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    wpos = plan.find("Window")
    apos = plan.rfind("HashAggregate")
    assert wpos != -1 and apos != -1
    # executedPlan prints top-down: the aggregate feeding the window
    # appears AFTER (below) the Window operator in the string
    assert apos > wpos
    # correctness spot: leading-edge moving average equals its own count
    import pyspark.sql.functions as F
    first = (df.where(F.col("event_type") == df.select("event_type")
                      .orderBy("event_type").first()[0])
             .orderBy("hour").first())
    assert first["ma3_events_x1000"] == first["n_events"] * 1000


def test_stream_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState session windows: a two-micro-batch event
    feed (batch B continues one user's open session, starts another's
    new session) reconstructs EXACTLY the batch sessionize_events
    sessions — including a session stitched ACROSS the batch boundary —
    and closed/open statuses reflect the 30-min gap rule."""
    import datetime as dt

    from reach_spark.streaming import read_sessions, stream_sessionize

    ev_dir = str(tmp_path / "ev")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def mk(rows):
        return spark.createDataFrame(
            [(i, t0 + dt.timedelta(minutes=m), u, "click", 0.0, "")
             for i, (u, m) in enumerate(rows)],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string")

    # batch A: u1 two events 5' apart; u2 one event
    mk([(1, 0), (1, 5), (2, 0)]).coalesce(1) \
        .write.mode("append").parquet(ev_dir)
    q = stream_sessionize(spark, ev_dir, out_dir, ck_dir)
    q.awaitTermination(180)
    # batch B: u1 continues within the gap (25' after last) then breaks
    # it (90'); u2 breaks the gap (60')
    mk([(1, 30), (1, 120), (2, 60)]).coalesce(1) \
        .write.mode("append").parquet(ev_dir)
    q = stream_sessionize(spark, ev_dir, out_dir, ck_dir)
    q.awaitTermination(180)

    got = {(r.user_id, r.session_start_us): (r.session_end_us, r.n_events,
                                             r.status)
           for r in read_sessions(spark, out_dir).collect()}
    us = lambda m: int((t0 + dt.timedelta(minutes=m)).replace(
        tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    # u1: [0,5,30] stitched across the boundary then closed by the 90'
    # event, which opens a new session; u2: [0] closed by 60', new open
    assert got == {
        (1, us(0)): (us(30), 3, "closed"),
        (1, us(120)): (us(120), 1, "open"),
        (2, us(0)): (us(0), 1, "closed"),
        (2, us(60)): (us(60), 1, "open"),
    }

    # cross-check n_events/durations against the batch operator over the
    # full log (session identity = (user, start))
    import reach_spark.relational as R
    ev_df = spark.read.parquet(ev_dir)
    batch = (ev_df.selectExpr(
        "user_id", "event_id",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS tus"))
    from pyspark.sql import Window, functions as F2
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    flagged = batch.withColumn(
        "new_s", F2.when(F2.lag("tus").over(w).isNull()
                         | ((F2.col("tus") - F2.lag("tus").over(w))
                            > R._SESSION_GAP_US), 1).otherwise(0))
    sess = (flagged.withColumn(
        "sid", F2.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(F2.min("tus").alias("start_us"),
             F2.max("tus").alias("end_us"),
             F2.count("*").alias("n")))
    expect = {(r.user_id, r.start_us): (r.end_us, r.n)
              for r in sess.collect()}
    assert {k: v[:2] for k, v in got.items()} == expect


def test_stream_sessionize_event_time_eviction(spark, tmp_path):
    """EventTimeTimeout eviction: once the watermark passes
    last_event + gap, the engine fires the timer and the open session is
    emitted CLOSED and its state removed — bounded state on an unbounded
    stream. The watermark is computed from the PREVIOUS batch's max
    event time, so the feed advances it in two steps."""
    import datetime as dt

    from reach_spark.streaming import read_sessions, stream_sessionize

    ev_dir = str(tmp_path / "ev")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def feed(rows):
        spark.createDataFrame(
            [(i, t0 + dt.timedelta(minutes=m), u, "click", 0.0, "")
             for i, (u, m) in enumerate(rows)],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string") \
            .coalesce(1).write.mode("append").parquet(ev_dir)
        q = stream_sessionize(spark, ev_dir, out_dir, ck_dir)
        q.awaitTermination(180)

    feed([(1, 0)])              # u1 opens a session
    feed([(9, 300)])            # far-future event; watermark still at -30'
    feed([(9, 301)])            # watermark now 270' > u1's 30' timer
    got = {(r.user_id, r.session_start_us): r.status
           for r in read_sessions(spark, out_dir).collect()}
    us = lambda m: int((t0 + dt.timedelta(minutes=m)).replace(
        tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    assert got[(1, us(0))] == "closed"
    assert got[(9, us(300))] == "open"


def test_session_update_late_event_folds_with_min_max():
    """ADVICE r4: a late-but-within-watermark event arriving in a LATER
    micro-batch (t < the open session's last_us) must fold with
    min/max — never shrink session_end below session_start — while the
    gap rule still keys off the true latest event."""
    import pandas as pd

    from reach_spark.streaming import _session_update

    class FakeState:
        hasTimedOut = False

        def __init__(self, tup=None):
            self._t = tup

        @property
        def exists(self):
            return self._t is not None

        @property
        def get(self):
            return self._t

        def update(self, tup):
            self._t = tup

        def setTimeoutTimestamp(self, ms):
            self.timeout_ms = ms

        def remove(self):
            self._t = None

    M = 60 * 1_000_000  # one minute in us
    st = FakeState((100 * M, 120 * M, 3))  # open session [100', 120']
    out = list(_session_update(
        (7,), [pd.DataFrame({"ts": pd.to_datetime([110 * M * 1000],
                                                  unit="ns")})], st))
    rows = pd.concat(out)
    assert list(rows.itertuples(index=False, name=None)) == [
        (7, 100 * M, 120 * M, 4, "open")]   # end NOT shrunk to 110'
    assert st.get == (100 * M, 120 * M, 4)
    # an even-earlier late event extends the start downward instead
    st2 = FakeState((100 * M, 120 * M, 3))
    out2 = list(_session_update(
        (7,), [pd.DataFrame({"ts": pd.to_datetime([80 * M * 1000],
                                                  unit="ns")})], st2))
    assert pd.concat(out2).iloc[0]["session_start_us"] == 80 * M
    assert st2.get == (80 * M, 120 * M, 4)


def test_embedding_outliers_tail_bounded(spark):
    """embedding_outliers: the strict-below-5th-percentile rule flags
    UNDER 5% of each cluster (percentile_disc value itself is not an
    outlier), and the threshold join is a broadcast, not a shuffle."""
    from reach_spark import similarity
    fn, _ = similarity.QUERIES["embedding_outliers"]
    df = fn(spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    import pyspark.sql.functions as F2
    per = (df.groupBy("cluster")
           .agg(F2.count("*").alias("n"),
                F2.sum(F2.col("is_outlier").cast("int")).alias("o"))
           .collect())
    assert per
    for r in per:
        assert r.o * 20 < r.n + 20, (r.cluster, r.o, r.n)
