"""[S8] Inverted index + BM25 retrieval (reference indexer/NxmlIndexer,
NxmlSearcher.searchByField — Lucene BM25 re-expressed Spark-first)."""

import math

import pytest

from reach_spark.search import (BM25_B, BM25_K1, bm25_search, build_index,
                                s8_bm25_search)

CORPUS = [
    (1, "spark shuffles the hash join build side"),
    (2, "hash hash hash collisions everywhere"),
    (3, "a sort merge join needs no hash table"),
    (4, "completely unrelated text about geraniums"),
]


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    return build_index(docs)


def test_postings_and_doclens(index):
    post = {(r["term"], r["doc_id"]): r["tf"]
            for r in index["postings"].collect()}
    assert post[("hash", 2)] == 3
    assert post[("join", 1)] == 1
    assert ("geraniums", 4) in post
    lens = {r["doc_id"]: r["len"] for r in index["doclens"].collect()}
    assert lens == {1: 7, 2: 5, 3: 8, 4: 5}


def _bm25(tf, df, n, length, avglen):
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * tf * (BM25_K1 + 1) / (
        tf + BM25_K1 * (1 - BM25_B + BM25_B * length / avglen))


def test_bm25_matches_hand_computation(index):
    rows = {r["doc_id"]: r for r in
            bm25_search(index, "hash join", k=4).collect()}
    n, avglen = 4, (7 + 5 + 8 + 5) / 4
    exp2 = round(_bm25(3, 3, n, 5, avglen), 6)          # 'hash' only
    exp1 = round(_bm25(1, 3, n, 7, avglen)
                 + _bm25(1, 2, n, 7, avglen), 6)        # hash + join
    assert rows[2]["score"] == pytest.approx(exp2, abs=1e-6)
    assert rows[1]["score"] == pytest.approx(exp1, abs=1e-6)
    assert 4 not in rows                                 # no query term
    # both query terms beat the single high-tf term here
    assert rows[1]["rank"] < rows[2]["rank"]


def test_rank_is_deterministic_and_dense(index):
    got = bm25_search(index, "hash", k=10).collect()
    assert [r["rank"] for r in sorted(got, key=lambda r: r["rank"])] == \
        list(range(1, len(got) + 1))


def test_empty_query(index):
    assert bm25_search(index, "  --  ", k=5).count() == 0


def test_topk_plan_no_global_sort(index):
    """The final top-k must be TakeOrderedAndProject (per-partition
    partial top-k), not a single-partition global Sort over all
    matching docs."""
    plan = bm25_search(index, "hash join", k=2)._jdf \
        .queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_scoring_plan_no_corpus_sized_join(index):
    """Document length is denormalized into the postings at build time,
    so the scoring plan's ONLY join is the broadcast of the |query|-row
    per-term df table — no join (broadcast or shuffle) against the
    corpus-sized doclens side. A forced doclens broadcast OOMs the driver
    at 10^12 docs; this gate keeps it out of the plan for good."""
    assert "len" in index["postings"].columns
    plan = bm25_search(index, "hash join", k=2)._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 1      # df_by_term only
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_legacy_index_without_len_still_scores(spark):
    """Indexes persisted before the denormalization (postings without
    `len`) fall back to an unhinted doclens join and score identically."""
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    idx = build_index(docs)
    legacy = dict(idx)
    legacy["postings"] = idx["postings"].drop("len")
    new = {r["doc_id"]: r["score"]
           for r in bm25_search(idx, "hash join", k=4).collect()}
    old = {r["doc_id"]: r["score"]
           for r in bm25_search(legacy, "hash join", k=4).collect()}
    assert new == old


def test_s8_driver_query(spark):
    out = s8_bm25_search(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 10
    assert [r["rank"] for r in out] != []
    scores = [r["score"] for r in sorted(out, key=lambda r: r["rank"])]
    assert scores == sorted(scores, reverse=True)
