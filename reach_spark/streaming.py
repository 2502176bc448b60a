"""Incremental/streaming ingestion of the documents table.

The reference is batch-only (ReachCLI; SURVEY §2.11 'streaming absent'),
with restart-log resume. We keep that batch contract and ADD a Structured
Streaming wrapper for continuous ingestion: new parquet files landing in
the documents directory are picked up as micro-batches, run through the
identical extraction pipeline via foreachBatch, and appended to the triple
table. Exactly-once is inherited from the streaming checkpoint +
deterministic mention/event ids (duplicate reprocessing rewrites identical
rows).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .schemas import DOCUMENTS


def stream_pipeline(spark: SparkSession, input_dir: str, out_dir: str,
                    checkpoint_dir: str, available_now: bool = True):
    """readStream over the documents directory → foreachBatch extraction →
    append triples. Returns the StreamingQuery (caller awaits)."""
    from .pipeline import extract_dataframe

    src = (spark.readStream
           .schema(DOCUMENTS)
           .parquet(input_dir))

    def process_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        res = extract_dataframe(spark, batch_df, with_coref=False)
        # the append-safe unit is the occurrence log (one row per event
        # occurrence); appending pre-aggregated EER rows per micro-batch
        # would double-count seen, so the deduped table is re-rolled-up
        # over the FULL log after each batch (same contract as
        # pipeline.run_batch)
        (res["triple_occurrences"]
         .write.mode("append").partitionBy("pred")
         .parquet(f"{out_dir}/triples"))
        (res["entities"]
         .write.mode("append")
         .parquet(f"{out_dir}/entities"))
        from .triples import assemble_triples
        (assemble_triples(spark.read.parquet(f"{out_dir}/triples"))
         .write.mode("overwrite").partitionBy("pred")
         .parquet(f"{out_dir}/triples_eer"))
        # release per-batch caches — a long-lived stream must not
        # accumulate blocks across micro-batches (same contract as
        # pipeline.run_batch)
        for key in ("mentions", "resolved_mentions", "grounding_map"):
            res[key].unpersist()

    writer = (src.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
