"""Context assignment: events inherit context keys (species, cell line,
organ, cell type, cellular component) from nearby sentences.

[C1] context mention detection = the CONTEXT_LABELS entity rows produced
by dictionary NER (ContextEngine.scala:23-36); [C2] bounded-padding
assignment below; [C3] dummy engine = passing context_df=None.

Reference: bounded-padding Policy4 (default), window [sent-3, sent+3]
(context/Policies.scala:11-98, application.conf:52-57).

Spark shape: Window.partitionBy(doc_id).orderBy(sent_ord)
.rangeBetween(-3, +3) + collect_set — exactly the SURVEY §2.7 C2 mapping.
One shuffle by doc_id, reused by every context type.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame, Window, functions as F

CONTEXT_LABELS = ["Species", "CellLine", "Organ", "CellType", "TissueType",
                  "Cellular_component"]


@lru_cache(maxsize=1)
def _ctx_keys() -> tuple[Column, Column]:
    """(ckey, skey) context-key expressions — pure unresolved trees over
    literal column names, cached across calls (the grounding-module
    pattern: rebuilding them per call is driver py4j latency)."""
    is_ctx = F.col("kind") == F.lit("tbm")
    ckey = F.when(is_ctx & F.col("label").isin(CONTEXT_LABELS),
                  F.concat_ws("=", "label",
                              F.concat_ws(":", "g_ns", "g_id")))
    skey = F.when(is_ctx & (F.col("label") == "Species"),
                  F.concat_ws(":", "g_ns", "g_id"))
    return ckey, skey


def assign_context(mentions: DataFrame, padding: int = 3,
                   policy: str = "padded",
                   species_fallback: bool = True) -> DataFrame:
    """mentions → (doc_id, sent_idx, context_species, context_all).

    context_all is a sorted array of 'Type=ns:id' strings from the policy
    window; context_species keeps just species for the triple columns
    (Arizona context columns, AssemblyExporter.scala:307-341).

    Policies (context/Policies.scala:11-98, application.conf:52-57):
      'padded'    — Policy4/BoundedPaddingContext, the production default:
                    the symmetric [sent-padding, sent+padding] window;
      'preceding' — bounded forward influence only: a context mention
                    reaches the next `padding` sentences ([sent-padding,
                    sent]);
      'fill'      — FillingContext: context carries forward from anywhere
                    earlier in the document (unbounded preceding).
    The dummy engine (C3) is passing context_df=None downstream.

    `species_fallback` mirrors the reference default-species mechanism
    (RuleBasedEngine.infer computes the doc's most frequent species key;
    BoundedPaddingContext.assign adds it when a mention's window has no
    species, Policies.scala:27-35, RuleBasedEngine.scala:13-38): a
    sentence whose policy window contains no Species mention inherits the
    document-dominant species in both context_species and context_all.
    Frequency ties are broken toward the lexicographically LARGEST key
    (one max(struct) aggregate); the reference's maxBy over a hash map
    leaves ties unspecified, so any deterministic choice is conformant.

    Shape: ONE shuffle by doc_id feeds both windows — per-sentence context
    arrays are pre-aggregated in the same pass (map-side combine), then
    dense_rank + range windows share the partitioning. No distinct /
    dropDuplicates stages. The fallback adds one per-doc aggregate (rows =
    docs, never broadcastable at corpus scale) joined back on doc_id — the
    same key the window already partitioned by.
    """
    ckey, skey = _ctx_keys()
    per_sent = (
        mentions
        .groupBy("doc_id", "sent_idx")
        .agg(F.collect_set(ckey).alias("ckeys"),
             F.collect_set(skey).alias("skeys"))
    )
    wo = Window.partitionBy("doc_id").orderBy("sent_idx")
    base = Window.partitionBy("doc_id").orderBy("sent_ord")
    if policy == "padded":
        w = base.rangeBetween(-padding, padding)
    elif policy == "preceding":
        w = base.rangeBetween(-padding, 0)
    elif policy == "fill":
        w = base.rangeBetween(Window.unboundedPreceding, 0)
    else:
        raise ValueError(f"unknown context policy: {policy!r}")
    out = (
        per_sent
        .withColumn("sent_ord", F.dense_rank().over(wo))
        .withColumn("context_all", F.array_sort(F.array_distinct(
            F.flatten(F.collect_list("ckeys").over(w)))))
        .withColumn("context_species", F.array_sort(F.array_distinct(
            F.flatten(F.collect_list("skeys").over(w)))))
        .select("doc_id", "sent_idx", "context_all", "context_species")
    )
    if not species_fallback:
        return out
    defaults = (
        mentions
        .select("doc_id", skey.alias("skey"))
        .where(F.col("skey").isNotNull())
        .groupBy("doc_id", "skey").agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max(F.struct("cnt", "skey"))["skey"]
             .alias("default_species"))
    )
    fill_species = ((F.size("context_species") == 0)
                    & F.col("default_species").isNotNull())
    return (
        out.join(defaults, "doc_id", "left")
        .withColumn("context_all",
                    F.when(fill_species,
                           F.array_sort(F.array_union(
                               "context_all",
                               F.array(F.concat(F.lit("Species="),
                                                "default_species")))))
                     .otherwise(F.col("context_all")))
        .withColumn("context_species",
                    F.when(fill_species, F.array("default_species"))
                     .otherwise(F.col("context_species")))
        .drop("default_species")
    )
