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

    if "--scaling-level" in sys.argv:
        # one parallelism level, fresh JVM (invoked as a subprocess by
        # --scaling so levels can't pollute each other's heap/code cache)
        cores = int(sys.argv[sys.argv.index("--scaling-level") + 1])
        n_docs = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "100000"))
        partitions = int(os.environ.get("SPARK_GRAFT_SCALE_PARTS", "64"))
        repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "2"))
        from reach_spark.pipeline import extract_dataframe
        from reach_spark.synth import make_documents
        spark = get_spark(app_name=f"bench-{cores}", cores=cores,
                          shuffle_partitions=partitions)
        docs = make_documents(spark, n_docs=n_docs, skew_every=50,
                              skew_repeat=120,
                              partitions=partitions).persist()
        docs.count()
        # warmup compiles every plan in the measured query (codegen is a
        # serial driver cost; it must not be attributed to either level)
        extract_dataframe(spark, docs.limit(2000), with_coref=False,
                          persist=False)["triples"].count()
        walls = []
        n_triples = 0
        for _ in range(repeats):
            t0 = time.time()
            res = extract_dataframe(spark, docs, with_coref=False,
                                    persist=False)
            n_triples = res["triples"].count()
            walls.append(round(time.time() - t0, 2))
        best = min(walls)
        print(json.dumps({"cores": cores, "walls": walls,
                          "wall_s": best,
                          "docs_per_sec": round(n_docs / best, 2),
                          "n_triples": n_triples}))
        return

    if "--scaling" in sys.argv:
        # Two-cluster-size evidence (BASELINE.md protocol): the SAME
        # compute-bound job — full KG pipeline over a fixed synthetic
        # interleaved corpus — at N and 4N cores, fixed input, fixed
        # partition-count policy, each level in a fresh JVM. Default
        # levels 2 vs 8: this box's all-core clock/bandwidth ceiling
        # (see BASELINE.md burn-test) caps 8→32 at ~0.6-0.7 regardless
        # of software; 2→8 sits inside the linear region. Both pairs are
        # reported.
        import subprocess
        levels = [int(x) for x in os.environ.get(
            "SPARK_GRAFT_SCALE_LEVELS", f"2,8,{cpus}").split(",")]
        out = {}
        for cores in sorted(set(levels)):
            r = subprocess.run(
                [sys.executable, __file__, "--scaling-level", str(cores)],
                capture_output=True, text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            line = r.stdout.strip().splitlines()[-1]
            out[cores] = json.loads(line)
        lvls = sorted(out)
        pairs = {}
        for lo, hi in zip(lvls, lvls[1:]):
            eff = (out[hi]["docs_per_sec"] /
                   (out[lo]["docs_per_sec"] * (hi / lo)))
            pairs[f"{lo}->{hi}"] = round(eff, 3)
        result = {"levels": out, "scaling_efficiency": pairs,
                  "n_docs": int(os.environ.get("SPARK_GRAFT_SCALE_DOCS",
                                               "100000")),
                  "shuffle_partitions": int(os.environ.get(
                      "SPARK_GRAFT_SCALE_PARTS", "64"))}
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
