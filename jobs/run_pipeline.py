"""spark-submit entry point for the KG-construction batch job.

Usage (cluster):
  spark-submit --py-files reach_spark.zip jobs/run_pipeline.py \
      --input /warehouse/documents --output /warehouse/kg \
      [--streaming] [--partitions 4096]

Packaging: `python jobs/package.py` builds reach_spark.zip. On a real
cluster the input/output would be Iceberg tables
(spark.table / writeTo(...).partitionedBy('pred')); the parquet paths here
keep the sandbox dependency-free with the identical layout.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--input-format", default="parquet",
                    choices=["parquet", "warc", "nxml", "dsv",
                             "plaintext"],
                    help="input connector (reach_spark.sources): parquet "
                         "reads the interleaved documents table directly; "
                         "warc/nxml/dsv/plaintext parse raw files onto "
                         "the same schema (batch mode; streaming watches "
                         "a parquet documents directory)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--streaming", action="store_true")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--max-doc-spans", type=int, default=10000,
                    help="cap a pathological document's span array "
                         "(bounds the worst single task; docs are the "
                         "atomic unit — coref/context/alias are "
                         "doc-scoped); 0 disables")
    ap.add_argument("--brat-dir", default=None,
                    help="also write Brat standoff tables (<dir>/ann = "
                         "per-doc .ann content, <dir>/txt = the matching "
                         ".txt text) — batch mode only")
    ap.add_argument("--tables-prefix", default=None,
                    help="also materialize the graph as named partitioned "
                         "catalog tables <prefix>_triples/<prefix>_entities "
                         "(Iceberg when a V2 catalog is plugged; "
                         "session-catalog parquet tables otherwise)")
    args = ap.parse_args()

    from reach_spark.session import get_spark
    spark = get_spark(app_name="reach-spark-pipeline",
                      shuffle_partitions=args.partitions)

    if args.streaming:
        if args.input_format != "parquet":
            raise SystemExit("--streaming watches a parquet documents "
                             "directory; parse raw formats in batch mode "
                             "first (--input-format is batch-only)")
        from reach_spark.streaming import stream_pipeline
        q = stream_pipeline(spark, args.input, args.output,
                            f"{args.output}/_stream_checkpoint",
                            catalog_prefix=args.tables_prefix,
                            max_doc_spans=args.max_doc_spans or None)
        q.awaitTermination()
    else:
        from reach_spark.pipeline import run_batch
        if args.input_format == "parquet":
            docs = spark.read.parquet(args.input)
        else:
            from reach_spark import sources
            docs = {"warc": sources.read_warc,
                    "nxml": sources.read_nxml,
                    "dsv": sources.read_dsv,
                    "plaintext": sources.read_plaintext,
                    }[args.input_format](spark, args.input)
        if args.partitions:
            docs = docs.repartition(args.partitions, "doc_id")
        counts = run_batch(spark, docs, args.output,
                           resume=not args.no_resume,
                           catalog_prefix=args.tables_prefix,
                           max_doc_spans=args.max_doc_spans or None,
                           brat_dir=args.brat_dir)
        print(counts)


if __name__ == "__main__":
    main()
