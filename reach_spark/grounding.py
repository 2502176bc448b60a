"""Grounding (entity linking): key-transform expansion → broadcast hash join
against the KB union table → rank-1 selection → failsafe IDs.

Reference semantics (SURVEY §2.6): label→KB routing with priorities
(ReachEntityLookup.scala:56-92), key transforms
(ReachKBKeyTransforms.scala:20-164), first-hit ordering
(InMemoryKB.scala:121-143), failsafe uaz IDs (AzFailsafeKBML.scala),
species preference human > none > other (ReachGrounder.scala:28-102).

Spark shape: all key transforms are built-in string expressions (JVM,
codegen); the KB is a broadcast DataFrame; first-hit = row_number over
(transform_rank, label_match, kb_priority, species_rank) — one broadcast
hash join, no shuffle of the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .resources import kb_rows

KB_COLUMNS = ["kb_label", "key", "ns", "id", "species", "kb_priority",
              "is_protein_kb", "is_family_kb"]


def kb_dataframe(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(kb_rows(), KB_COLUMNS)


def _candidate_keys() -> list[tuple[str, F.Column]]:
    """Ordered key transforms (rank = reference try-order):
    0: dictionary canonical, 1: lowered text, 2: strip '_human' suffix,
    3: strip PTM prefixes p-/u- (ReachKBKeyTransforms stripPTMPrefixes),
    4: hyphens→nothing, 5: strip post-attributive words (protein|gene|
       fragment|mutant)."""
    low = F.lower(F.col("text"))
    base = F.coalesce(F.col("canonical"), low)
    return [
        ("canonical", base),
        ("lower", low),
        ("strip_human", F.regexp_replace(low, "_human$", "")),
        ("strip_ptm_prefix", F.regexp_replace(low, "^(p|u)-", "")),
        ("strip_hyphen", F.regexp_replace(low, "-", "")),
        ("strip_attributive",
         F.regexp_replace(low, " (protein|gene|fragment|mutant|proteins)$", "")),
    ]


def ground_entities(entities: DataFrame, kb: DataFrame) -> DataFrame:
    """entities (mention rows, kind='tbm') → + (ns, id, species) columns.

    Returns every input row exactly once; unresolved mentions get the
    failsafe namespace 'uaz' with a deterministic content-hash id.
    """
    keys = F.array(*[
        F.struct(F.lit(i).alias("t_rank"), expr.alias("key"))
        for i, (_, expr) in enumerate(_candidate_keys())
    ])
    cand = (
        entities
        .select("mention_id", "label", "text", "canonical",
                F.explode(keys).alias("k"))
        .select("mention_id", "label", "text",
                F.col("k.t_rank").alias("t_rank"),
                F.col("k.key").alias("key"))
        .where(F.col("key") != "")
        .dropDuplicates(["mention_id", "key", "t_rank"])
    )
    joined = cand.join(F.broadcast(kb), "key", "inner")
    # routing: exact label match first, then protein KBs, then family KBs
    # (ReachEntityLookup label→KB sequences)
    label_rank = (
        F.when(F.col("kb_label") == F.col("label"), 0)
        .when(F.col("is_protein_kb"), 1)
        .when(F.col("is_family_kb"), 2)
        .otherwise(3)
    )
    species_rank = (
        F.when(F.col("species") == "human", 0)
        .when(F.col("species") == "", 1)
        .otherwise(2)
    )
    w = Window.partitionBy("mention_id").orderBy(
        "t_rank", label_rank, "kb_priority", species_rank, "id")
    best = (
        joined.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("mention_id", F.col("ns").alias("g_ns"),
                F.col("id").alias("g_id"),
                F.col("species").alias("g_species"))
    )
    out = entities.join(best, "mention_id", "left")
    # failsafe (AzFailsafeKBML): deterministic uaz id from canonical text
    uaz = F.concat(F.lit("UAZ"), F.upper(F.substring(F.sha1(
        F.coalesce(F.col("canonical"), F.lower(F.col("text")))), 1, 8)))
    return (
        out.withColumn("g_ns", F.coalesce(F.col("g_ns"), F.lit("uaz")))
        .withColumn("g_id", F.coalesce(F.col("g_id"), uaz))
        .withColumn("g_species", F.coalesce(F.col("g_species"), F.lit("")))
    )
