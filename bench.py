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
    # the two trivial scans run FIRST as session warmers: the first jobs
    # of a fresh local-mode session pay executor/task-dispatch init and
    # common-subexpression codegen (measured: a bare count over a 4 MB
    # parquet costs ~6 s as job #1 and ~0.2 s thereafter). Running them
    # first stops those session constants being billed to whichever real
    # query happens to run first (previously the flagship — every other
    # query already enjoyed a warm session). Suite total still includes
    # them; per-query numbers now measure the query.
    "lang_id",
    "token_count",
    "kg_triples_flagship",
    "dedup_minhash_pairs",
    "dedup_jaccard_pairs",
    "dedup_exact",
    "ann_topk_bruteforce",
    "ann_lsh_bucketed",
    "ann_lsh_multiprobe",
    "ann_ivf_topk",
    "s8_bm25_search",
    "q1_pricing_summary",
    "q3_topk_revenue",
    "asof_latest_order",
    "connected_components_bipartite",
    # round-4 continuation additions (appended so earlier rounds' matched-
    # query comparison is unaffected)
    "dedup_substring_spans",
    "kmeans_embeddings",
    # round-4 third-continuation addition (appended, same policy): the
    # composed end-to-end curation decision table — dedup + holdout +
    # decontamination + quality + split in one plan
    "corpus_curation",
]


def run_suite(spark, sf_dir: str,
              repeats: int) -> tuple[dict, dict, dict, int]:
    """Each query runs `repeats` times; the headline number per query is
    the MIN wall (the clean-window estimate — this box's hypervisor steal
    and noisy neighbors only ever ADD time, so min is the least-biased
    single-shot estimator; all walls are recorded for audit). The first
    wall additionally carries per-plan codegen, so min-of-N also stops
    session constants from being billed to whichever query runs first."""
    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    walls_all: dict[str, list[float]] = {}
    rows: dict[str, int] = {}
    n_docs = 0
    for name in HEADLINE:
        walls = []
        for _ in range(repeats):
            # each run is self-contained (the driver's correctness gate
            # runs them the same way); caches/broadcasts left by a prior
            # run are bench artifacts — at 8g driver heap they turn into
            # full-GC pauses attributed to whatever query runs next
            # (measured: minhash 6s -> 52s when it follows the flagship's
            # persisted intermediates)
            spark.catalog.clearCache()
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            walls.append(round(time.time() - t0, 3))
        timings[name] = min(walls)
        walls_all[name] = walls
        rows[name] = n
        if name == "kg_triples_flagship":
            n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    return timings, walls_all, rows, n_docs


def _read_steal() -> tuple[float, float]:
    """(total_jiffies, steal_jiffies) from /proc/stat — this sandbox is a
    VM whose host steals CPU in bursts (observed up to ~30% st in top),
    which swings wall-clock benchmarks 2-4x run-to-run. Reporting the
    steal share measured DURING the run makes the numbers auditable."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        vals = [float(x) for x in parts[1:9]]
        return sum(vals), vals[7]
    except Exception:
        return 0.0, 0.0


def _calibrate(n: int = 3_000_000) -> float:
    """Single-thread sha1 spin (Mhash/s) — a fixed-work hardware probe run
    before and after the suite. Two healthy windows on this box read ~the
    same number; a degraded window (steal, neighbor contention) reads
    lower, flagging the whole file's walls as suspect."""
    import hashlib
    h = b"x" * 64
    t0 = time.time()
    for _ in range(n):
        h = hashlib.sha1(h).digest()
    return round(n / (time.time() - t0) / 1e6, 2)


def _cpu_burn(per_worker: int = 6_000_000) -> dict:
    """Hardware-ceiling baseline: a bare sha1 loop (no Spark, no JVM) at
    1..32 processes. Efficiency < 1 here is the box's all-core clock /
    memory-bandwidth limit — the floor under ANY software's scaling at
    that worker count."""
    import hashlib
    from multiprocessing import Process

    def work(n):
        h = b"x" * 64
        for _ in range(n):
            h = hashlib.sha1(h).digest()

    res = {}
    for workers in (1, 2, 4, 8, 16, 32):
        t0 = time.time()
        ps = [Process(target=work, args=(per_worker,))
              for _ in range(workers)]
        for p in ps:
            p.start()
        for p in ps:
            p.join()
        dt = time.time() - t0
        res[workers] = round(workers * per_worker / dt / 1e6, 2)
    return {"agg_mhash_per_s": res,
            "n_to_4n_efficiency": {
                f"{lo}->{lo * 4}": round(res[lo * 4] / (res[lo] * 4), 3)
                for lo in (1, 2, 4, 8) if lo * 4 in res}}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    from reach_spark.session import get_spark

    if "--scaling-level" in sys.argv:
        # one parallelism level, fresh JVM (invoked as a subprocess by
        # --scaling so levels can't pollute each other's heap/code cache)
        cores = int(sys.argv[sys.argv.index("--scaling-level") + 1])
        n_docs = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "30000"))
        partitions = int(os.environ.get("SPARK_GRAFT_SCALE_PARTS", "64"))
        repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "2"))
        from reach_spark.pipeline import extract_dataframe
        from reach_spark.synth import make_documents
        unique = os.environ.get("SPARK_GRAFT_SCALE_UNIQUE", "1") == "1"
        spark = get_spark(app_name=f"bench-{cores}", cores=cores,
                          shuffle_partitions=partitions)
        docs = make_documents(spark, n_docs=n_docs, skew_every=50,
                              skew_repeat=120, unique=unique,
                              partitions=partitions).persist()
        docs.count()
        # warmup compiles every plan in the measured query (codegen is a
        # serial driver cost; it must not be attributed to either level)
        extract_dataframe(spark, docs.limit(2000), with_coref=False,
                          persist=False)["triples"].count()
        walls = []
        steals = []
        n_triples = 0
        for _ in range(repeats):
            # production configuration: intermediates persisted (run_batch
            # default); cache cleared so each repeat measures a cold run
            spark.catalog.clearCache()
            docs = docs.persist()
            docs.count()
            a0, s0 = _read_steal()
            t0 = time.time()
            res = extract_dataframe(spark, docs, with_coref=False,
                                    persist=True)
            n_triples = res["triples"].count()
            walls.append(round(time.time() - t0, 2))
            a1, s1 = _read_steal()
            steals.append(round(100 * (s1 - s0) / max(a1 - a0, 1e-9), 1))
            res.cleanup()
        best = min(walls)
        print(json.dumps({"cores": cores, "walls": walls,
                          "wall_s": best,
                          "docs_per_sec": round(n_docs / best, 2),
                          # steal measured per repeat: a level whose window
                          # was hypervisor-stolen is identifiable, not a
                          # silent scaling artifact
                          "steal_pct": steals,
                          "n_triples": n_triples}))
        return

    if "--scaling" in sys.argv:
        # Two-cluster-size evidence (BASELINE.md protocol): the SAME
        # compute-bound job — full KG pipeline over a fixed synthetic
        # interleaved corpus — at N and 4N cores, fixed input, fixed
        # partition-count policy, each level in a fresh JVM. The cpu_burn
        # baseline below measures this box's all-core clock/bandwidth
        # ceiling with a bare sha1 loop (no Spark): pairs whose upper
        # level nears 32 workers are hardware-capped (~0.75 at 8→32),
        # so the in-linear-region N→4N pair (e.g. 4→16) is the honest
        # software-scaling number.
        # workload sized so compute dominates the ~30 s of fixed driver/
        # broadcast barriers at every level (at 100k docs the pipeline
        # finishes in ~50 s on 8+ cores and fixed costs flatten the curve)
        import subprocess
        levels = [int(x) for x in os.environ.get(
            "SPARK_GRAFT_SCALE_LEVELS", f"4,8,16,{cpus}").split(",")]
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
        n4n = {}
        for lo in lvls:
            if lo * 4 in out:
                n4n[f"{lo}->{lo * 4}"] = round(
                    out[lo * 4]["docs_per_sec"] /
                    (out[lo]["docs_per_sec"] * 4), 3)
        result = {"levels": out, "scaling_efficiency": pairs,
                  "n_to_4n_efficiency": n4n,
                  "cpu_burn_baseline": _cpu_burn(),
                  "n_docs": int(os.environ.get("SPARK_GRAFT_SCALE_DOCS",
                                               "30000")),
                  "shuffle_partitions": int(os.environ.get(
                      "SPARK_GRAFT_SCALE_PARTS", "64"))}
        with open("BENCH_SCALING.json", "w") as f:
            json.dump(result, f, indent=2)
        print(json.dumps(result))
        return

    if "--scaling-paired" in sys.argv:
        # Window-PAIRED two-cluster-size evidence. Measured fact on this
        # box: identical level runs at equal (~0%) steal swing ±20-40%
        # wall-to-wall (noisy-neighbor effects the steal counter does not
        # see), so sequential-level ladders attribute window luck to
        # software. Protocol: alternate N and 4N level subprocesses
        # A/B/A/B... so each ratio is taken within one ~5-minute window,
        # then report the MEDIAN of per-round efficiencies with every
        # wall and steal recorded for audit.
        import statistics
        import subprocess
        lo = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
        hi = lo * 4
        rounds = int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", "3"))
        env = {**os.environ, "SPARK_GRAFT_SCALE_REPEATS": "1"}

        def level(cores: int) -> dict:
            r = subprocess.run(
                [sys.executable, __file__, "--scaling-level", str(cores)],
                capture_output=True, text=True, env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            return json.loads(r.stdout.strip().splitlines()[-1])

        rows = []
        for _ in range(rounds):
            a, b = level(lo), level(hi)
            rows.append({
                "lo_wall_s": a["wall_s"], "lo_steal_pct": a["steal_pct"],
                "hi_wall_s": b["wall_s"], "hi_steal_pct": b["steal_pct"],
                "efficiency": round(a["wall_s"] / b["wall_s"] / 4, 3)})
        result = {
            "pair": f"{lo}->{hi}",
            "rounds": rows,
            "median_efficiency": round(statistics.median(
                r["efficiency"] for r in rows), 3),
            "cpu_burn_baseline": _cpu_burn(),
            "n_docs": int(os.environ.get("SPARK_GRAFT_SCALE_DOCS",
                                         "30000")),
            "shuffle_partitions": int(os.environ.get(
                "SPARK_GRAFT_SCALE_PARTS", "64"))}
        with open("BENCH_SCALING_PAIRED.json", "w") as f:
            json.dump(result, f, indent=2)
        print(json.dumps(result))
        return

    spark = get_spark(app_name="bench", cores=cpus,
                      shuffle_partitions=max(cpus, 8))
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    cal0 = _calibrate()
    tot0, st0 = _read_steal()
    timings, walls_all, _rows, n_docs = run_suite(spark, sf_dir, repeats)
    tot1, st1 = _read_steal()
    cal1 = _calibrate()
    steal_pct = round(100.0 * (st1 - st0) / max(tot1 - tot0, 1e-9), 1)
    total = round(sum(timings[n] for n in HEADLINE), 3)
    flagship = walls_all["kg_triples_flagship"]
    print(json.dumps({
        "metric": "headline-suite wall-clock, per-query min of "
                  f"{repeats} repeats (KG pipeline + dedup + ANN + "
                  "relational)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # audit trail: every wall of every repeat, plus the window
        # instrumentation — a run whose window was hypervisor-stolen or
        # neighbor-degraded is identifiable in-file (BASELINE.md documents
        # identical code swinging 2-4x wall-to-wall on this box)
        "queries_walls": walls_all,
        "repeats": repeats,
        "sf": _sf_from_dir(sf_dir),
        "kg_docs_per_sec": round(n_docs / max(min(flagship), 1e-9), 2),
        "kg_docs_per_sec_first": round(
            n_docs / max(flagship[0], 1e-9), 2),
        "hypervisor_steal_pct": steal_pct,
        "calibration_mhash_per_s": [cal0, cal1],
        "cores": cpus,
    }))


if __name__ == "__main__":
    main()
