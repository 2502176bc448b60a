"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall-clock of the headline suite. Also reports docs/sec for
the KG pipeline. Run `python bench.py --scaling` for the two-parallelism
(N vs 4N cores) scaling-efficiency protocol (BASELINE.md) — results land in
BENCH_SCALING.json and are summarized in BASELINE.md's bench section.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


HEADLINE = [
    "kg_triples_flagship",
    "dedup_minhash_pairs",
    "dedup_jaccard_pairs",
    "dedup_exact",
    "ann_topk_bruteforce",
    "ann_lsh_bucketed",
    "q1_pricing_summary",
    "q3_topk_revenue",
    "asof_latest_order",
    "connected_components_bipartite",
    "lang_id",
    "token_count",
]


def run_suite(spark, sf_dir: str) -> tuple[dict[str, float], int]:
    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    n_docs = 0
    for name in HEADLINE:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        if name == "kg_triples_flagship":
            n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
            timings["_kg_triples_rows"] = n
    return timings, n_docs


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    from reach_spark.session import get_spark

    if "--scaling" in sys.argv:
        # Two-cluster-size evidence (BASELINE.md protocol): the SAME
        # compute-bound job — full KG pipeline over a fixed synthetic
        # interleaved corpus large enough that per-job fixed costs are
        # amortized — at N and 4N cores, fixed partition-count policy
        # (4x target cores so both levels see identical physical plans).
        n_docs = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "20000"))
        partitions = cpus * 4
        out = {}
        for cores in (max(cpus // 4, 2), cpus):
            from reach_spark.pipeline import extract_dataframe
            from reach_spark.synth import make_documents
            spark = get_spark(app_name=f"bench-{cores}", cores=cores,
                              shuffle_partitions=partitions)
            docs = make_documents(spark, n_docs=n_docs, skew_every=50,
                                  skew_repeat=120,
                                  partitions=partitions).persist()
            docs.count()
            # warmup: small slice to load code caches
            extract_dataframe(
                spark, docs.limit(200), with_coref=False,
                persist=False)["triples"].count()
            t0 = time.time()
            res = extract_dataframe(spark, docs, with_coref=False)
            n_triples = res["triples"].count()
            wall = time.time() - t0
            out[cores] = {"wall_s": round(wall, 2),
                          "docs_per_sec": round(n_docs / wall, 2),
                          "n_triples": n_triples}
            spark.stop()
        lo, hi = sorted(out)
        kg_eff = (out[hi]["docs_per_sec"] /
                  (out[lo]["docs_per_sec"] * (hi / lo)))
        result = {"cores": out, "cores_lo": lo, "cores_hi": hi,
                  "n_docs": n_docs, "shuffle_partitions": partitions,
                  "kg_scaling_efficiency": round(kg_eff, 3)}
        with open("BENCH_SCALING.json", "w") as f:
            json.dump(result, f, indent=2)
        print(json.dumps(result))
        return

    spark = get_spark(app_name="bench", cores=cpus,
                      shuffle_partitions=max(cpus, 8))
    t0 = time.time()
    timings, n_docs = run_suite(spark, sf_dir)
    total = round(time.time() - t0, 3)
    kg_docs_per_sec = round(
        n_docs / max(timings["kg_triples_flagship"], 1e-9), 2)
    print(json.dumps({
        "metric": "headline-suite wall-clock (KG pipeline + dedup + ANN + "
                  "relational)",
        "value": total,
        "unit": "sec",
        "queries": {k: v for k, v in timings.items()
                    if not k.startswith("_")},
        "sf": _sf_from_dir(sf_dir),
        "kg_docs_per_sec": kg_docs_per_sec,
        "cores": cpus,
    }))


if __name__ == "__main__":
    main()
