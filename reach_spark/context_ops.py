"""Context assignment: events inherit context keys (species, cell line,
organ, cell type, cellular component) from nearby sentences.

Reference: bounded-padding Policy4 (default), window [sent-3, sent+3]
(context/Policies.scala:11-98, application.conf:52-57).

Spark shape: Window.partitionBy(doc_id).orderBy(sent_ord)
.rangeBetween(-3, +3) + collect_set — exactly the SURVEY §2.7 C2 mapping.
One shuffle by doc_id, reused by every context type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

CONTEXT_LABELS = ["Species", "CellLine", "Organ", "CellType", "TissueType",
                  "Cellular_component"]


def sentence_order(mentions: DataFrame) -> DataFrame:
    """Dense per-doc sentence rank so rangeBetween counts sentences, not raw
    sent_idx gaps (sent_idx encodes span_pos*1000+i)."""
    w = Window.partitionBy("doc_id").orderBy("sent_idx")
    sent_ids = mentions.select("doc_id", "sent_idx").distinct()
    return sent_ids.withColumn("sent_ord", F.dense_rank().over(w))


def assign_context(mentions: DataFrame) -> DataFrame:
    """mentions → (doc_id, sent_idx, context_species, context_all).

    context_all is a sorted array of 'Type=ns:id' strings from the ±3
    sentence window; context_species keeps just species for the triple
    columns (Arizona context columns, AssemblyExporter.scala:307-341).
    """
    orders = sentence_order(mentions)
    ctx = (
        mentions
        .where(F.col("kind") == "tbm")
        .where(F.col("label").isin(CONTEXT_LABELS))
        .select("doc_id", "sent_idx",
                F.concat_ws("=", "label",
                            F.concat_ws(":", "g_ns", "g_id")).alias("ckey"),
                F.when(F.col("label") == "Species",
                       F.concat_ws(":", "g_ns", "g_id")).alias("skey"))
        .distinct()
    )
    # every sentence participates in the frame, even without own context
    base = orders.join(ctx, ["doc_id", "sent_idx"], "left")
    w = (Window.partitionBy("doc_id").orderBy("sent_ord")
         .rangeBetween(-3, 3))
    per_sent = (
        base
        .withColumn("context_all", F.array_sort(F.collect_set("ckey").over(w)))
        .withColumn("context_species",
                    F.array_sort(F.collect_set("skey").over(w)))
        .select("doc_id", "sent_idx", "context_all", "context_species")
        .dropDuplicates(["doc_id", "sent_idx"])
    )
    return per_sent
