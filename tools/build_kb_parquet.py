"""Precompute reach_spark/kb_data/kb_union.parquet from the dictionary TSVs.

The TSVs are the source of truth (provenance: kb_data/PROVENANCE.md); the
parquet is a derived load-format cache — one columnar file the loader reads
in ~0.2 s instead of re-parsing + normalizing 26 CSVs (~5 s of expression
codegen + scan) at every session start. Rerun after ANY kb_data TSV change:

    python tools/build_kb_parquet.py

tests/test_kb_resolutions.py::test_kb_parquet_fresh fails loudly when the
parquet is stale relative to the TSVs.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reach_spark.session import get_spark          # noqa: E402
from reach_spark import kb                         # noqa: E402


def main() -> None:
    d = kb.kb_data_dir()
    assert d, "kb_data directory not found"
    spark = get_spark(app_name="build_kb_parquet")
    df = kb.load_bioresources_csv(spark, d)
    out = os.path.join(d, "kb_union.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    n = spark.read.parquet(out).count()
    with open(os.path.join(d, "kb_union.TSV_SHA"), "w") as fh:
        fh.write(kb.kb_tsv_sha(d))
    print(f"{out}: {n} rows")

    # full-KB load format: inline override tier ∪ bioresources tier, one
    # file — the grounding hot path reads THIS (single columnar scan; no
    # per-session union/createDataFrame). Column order pinned to the
    # read schema in kb.load_kb_full.
    from reach_spark.grounding import inline_kb_df, kb_inline_sha
    full = inline_kb_df(spark).unionByName(
        spark.read.parquet(out)).select(
        "kb_label", "key", "ns", "id", "species", "kb_priority",
        "is_protein_kb", "is_family_kb", "tclass")
    fout = os.path.join(d, "kb_full.parquet")
    full.coalesce(1).write.mode("overwrite").parquet(fout)
    nf = spark.read.parquet(fout).count()
    with open(os.path.join(d, "kb_full.STAMP"), "w") as fh:
        fh.write(kb.kb_full_stamp(d, kb_inline_sha()))
    print(f"{fout}: {nf} rows")
    spark.stop()


if __name__ == "__main__":
    main()
