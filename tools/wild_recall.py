"""Wild-recall evaluation: run the FULL pipeline over the reference's
real-paper JATS fixtures (main/src/test/resources/inputs/nxml/PMC*.nxml,
15 PMC papers) via sources.read_nxml and report yield — sentences,
entity mentions, grounding rate (non-failsafe share), events, triples —
side by side with the same stats over the 810-sentence golden fixture
corpus. This measures the N7 (dependency-layer) ceiling on out-of-
distribution text: the fixtures are single curated sentences; the papers
are full wild prose.

Usage:
  python tools/wild_recall.py [nxml_dir] [--sample N] [--seed S]

With --sample N it also prints N deterministically-sampled extracted
events with their sentence text for hand adjudication (the basis of the
precision spot-check table in WILD_RECALL.md).
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

NXML_DIR = "/root/reference/main/src/test/resources/inputs/nxml"


def corpus_stats(spark, documents, tag: str) -> dict:
    from reach_spark.pipeline import extract_dataframe

    res = extract_dataframe(spark, documents)
    sent = res["sentences"].select("doc_id", "sent_idx").distinct().count()
    m = res["resolved_mentions"]
    ents = m.where(F.col("kind") == "tbm")
    n_ents = ents.count()
    # grounding: failsafe ids are ns 'uaz' (AzFailsafeKBML analog); a
    # real KB hit is any other namespace. Site mentions are excluded
    # from the rate — the reference grounds sites failsafe-only (no
    # site KB exists), so counting them as misses understates linking.
    kb_targeted = ents.where(F.col("label") != "Site")
    n_kb_targeted = kb_targeted.count()
    n_grounded = kb_targeted.where(F.col("g_ns").isNotNull()
                                   & (F.col("g_ns") != "uaz")).count()
    events = m.where(F.col("kind").isin("event", "relation"))
    n_events = events.count()
    by_label = {r["label"]: r["n"] for r in
                (events.groupBy("label").agg(F.count("*").alias("n"))
                 .orderBy(F.desc("n")).collect())}
    triples = res["triples"]
    n_triples = triples.count()
    by_pred = {r["pred"]: r["n"] for r in
               (triples.groupBy("pred").agg(F.count("*").alias("n"))
                .orderBy(F.desc("n")).collect())}
    docs = documents.count()
    out = {
        "tag": tag,
        "docs": docs,
        "sentences": sent,
        "entity_mentions": n_ents,
        "entities_per_sentence": round(n_ents / max(sent, 1), 3),
        "kb_targeted_mentions": n_kb_targeted,
        "grounded_nonfailsafe": n_grounded,
        "grounded_rate": round(n_grounded / max(n_kb_targeted, 1), 4),
        "event_mentions": n_events,
        "events_per_sentence": round(n_events / max(sent, 1), 3),
        "triples": n_triples,
        "top_event_labels": dict(list(by_label.items())[:12]),
        "top_preds": dict(list(by_pred.items())[:12]),
    }
    return out, res


def sample_events(res, n: int, offset: int = 0):
    """Deterministic md5-ordered sample of extracted events joined back
    to their sentence text, for hand precision adjudication. `offset`
    skips the first K so a SECOND adjudication round can be drawn from
    events disjoint from the ones that drove fixes (out-of-sample)."""
    m = res["resolved_mentions"]
    sents = res["sentences"].select("doc_id", "sent_idx", "sent_text")
    ev = (m.where(F.col("kind").isin("event", "relation"))
          .join(sents, ["doc_id", "sent_idx"])
          .select("doc_id", "sent_idx", "label", "text", "args",
                  "sent_text")
          .withColumn("_h", F.md5(F.concat_ws("|", "doc_id", "sent_idx",
                                              "label", "text")))
          .orderBy("_h").limit(offset + n))
    return ev.collect()[offset:]


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("nxml_dir", nargs="?", default=NXML_DIR)
    p.add_argument("--sample", type=int, default=0)
    p.add_argument("--offset", type=int, default=0)
    ns = p.parse_args()
    nxml_dir, n_sample, offset = ns.nxml_dir, ns.sample, ns.offset

    from reach_spark.session import get_spark
    from reach_spark.sources import read_nxml

    spark = get_spark(app_name="wild-recall", cores=16,
                      shuffle_partitions=16)

    # wild corpus: the 15 real PMC papers
    wild_docs = read_nxml(spark, nxml_dir)
    wild, wild_res = corpus_stats(spark, wild_docs, "wild_pmc_nxml")
    print(json.dumps(wild, indent=2))

    # in-distribution yardstick: the 810 golden fixture sentences as
    # single-sentence documents
    from reach_spark import fixtures
    from reach_spark.schemas import DOCUMENTS
    fx_docs = spark.createDataFrame(
        [(str(i), [{"kind": "text", "text": s, "media_ref": None,
                    "offset": 0}])
         for i, s in enumerate(sorted(set(fixtures.fixture_sentences())))],
        DOCUMENTS)
    fx, _ = corpus_stats(spark, fx_docs, "golden_fixtures")
    print(json.dumps(fx, indent=2))

    if n_sample:
        print("\n=== sampled events (hand-adjudication input) ===")
        for r in sample_events(wild_res, n_sample, offset):
            print(json.dumps({
                "doc": r["doc_id"], "sent": r["sent_idx"],
                "label": r["label"], "trigger_span": r["text"],
                "args": [(a["role"], a["text"]) for a in (r["args"] or [])],
                "sentence": r["sent_text"][:400],
            }, ensure_ascii=False))
    spark.stop()


if __name__ == "__main__":
    main()
