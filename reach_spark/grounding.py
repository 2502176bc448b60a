"""Grounding (entity linking): key-transform expansion → broadcast hash join
against the KB union table → rank-1 selection → failsafe IDs.

Reference semantics (SURVEY §2.6): [G1] label→KB routing with priorities
(ReachEntityLookup.scala:56-92), [G2] key transforms
(ReachKBKeyTransforms.scala:20-164), [G3] first-hit ordering
(InMemoryKB.scala:121-143) with failsafe uaz IDs (AzFailsafeKBML.scala),
[G4] candidate ordering (Grounding.scala:49-54), [G5] species preference
human > none > other (ReachGrounder.scala:28-102). [G6-G7] alias
canonization + grounding share live in canonicalize.py / extract.py
find_aliases.

Spark shape: all key transforms are built-in string expressions (JVM,
codegen); the KB is a broadcast DataFrame; first-hit = row_number over
(transform_rank, label_match, kb_priority, species_rank) — one broadcast
hash join, no shuffle of the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .resources import kb_rows

KB_COLUMNS = ["kb_label", "key", "ns", "id", "species", "kb_priority",
              "is_protein_kb", "is_family_kb"]


def kb_dataframe(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(kb_rows(), KB_COLUMNS)


def _candidate_keys() -> list[tuple[str, F.Column]]:
    """Ordered key transforms (rank = reference try-order,
    ReachKBKeyTransforms.scala:20-164):
    0: dictionary canonical, 1: lowered text, 2: strip '_human' suffix,
    3: strip PTM prefixes p-/u- (stripPTMPrefixes),
    4: hyphens→nothing, 5: strip post-attributive words
       (stripProteinPostAttributives),
    6: strip experimental-construct tag prefixes 'FLAG-Akt1'/'GFP-Ras'
       (stripGeneNameAffixes over the geneNameAffixes lookup set),
    7: strip species prefix 'hASPP2'→'aspp2' (GeneNamePrefixes h/m/r),
    8: strip family/subfamily suffix (stripFamilyPostAttributives),
    9: strip organ post-attributives 'liver tissue'→'liver'
       (stripOrganPostAttributives),
    10: strip protein-domain hyphen suffix 'Ras-SH2'→'ras'
       (stripProteinDomain over a common-domain subset).
    A worse-ranked candidate only wins when no better-ranked key matches
    the KB, so adding transforms never changes an existing grounding."""
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
        ("strip_construct_prefix",
         F.regexp_replace(base,
                          "^(e?gfp|mcherry|flag|gst|ha|myc|mbp|myr|dn|"
                          "phospho(r(ylated)?)?|activated|lenti|lv|luc)-",
                          "")),
        ("strip_species_prefix",
         F.when(base.rlike("^[hmr][a-z]{2,}[0-9]*$"),
                F.substring(base, 2, 100)).otherwise(F.lit(""))),
        ("strip_family_suffix",
         F.regexp_replace(low, " (family|subfamily)$", "")),
        ("strip_organ_postattr",
         F.regexp_replace(low, " (tissues?|cells?)$", "")),
        ("strip_domain_hyphen",
         F.regexp_replace(low, "-(sh2|sh3|ptb|ph|rbd|gap|gef|bd)$", "")),
    ]


def ground_map(entities: DataFrame, kb: DataFrame) -> DataFrame:
    """(canonical, label, text) DISTINCT → (canonical, g_ns, g_id,
    g_species).

    Grounding is a pure function of the canonical key + label, so the map
    is bounded by the distinct surface vocabulary (≪ mention count — the
    dictionary + sites + failsafe terms), never by corpus size. This is
    what makes the join-back a cheap broadcast at any scale.
    """
    base = (entities
            .select(F.coalesce("canonical", F.lower("text"))
                    .alias("canonical"),
                    "label", F.lower("text").alias("text"))
            .distinct())
    keys = F.array(*[
        F.struct(F.lit(i).alias("t_rank"), expr.alias("key"))
        for i, (_, expr) in enumerate(_candidate_keys())
    ])
    cand = (base
            .select("canonical", "label", F.explode(keys).alias("k"))
            .select("canonical", "label",
                    F.col("k.t_rank").alias("t_rank"),
                    F.col("k.key").alias("key"))
            .where(F.col("key") != ""))
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
    # first hit = min over the composite rank — one hash aggregation with
    # map-side partial combine (vs row_number window: shuffle + full sort)
    best = (
        joined
        .groupBy("canonical", "label")
        .agg(F.min(F.struct(
            F.col("t_rank"), label_rank.alias("label_rank"),
            F.col("kb_priority"), species_rank.alias("species_rank"),
            F.col("id"), F.col("ns"), F.col("species"))).alias("b"))
        .select("canonical", "label", F.col("b.ns").alias("g_ns"),
                F.col("b.id").alias("g_id"),
                F.col("b.species").alias("g_species"))
    )
    # failsafe (AzFailsafeKBML): deterministic uaz id from the canonical key
    uaz = F.concat(F.lit("UAZ"),
                   F.upper(F.substring(F.sha1(F.col("canonical")), 1, 8)))
    return (base.select("canonical", "label").distinct()
            .join(F.broadcast(best), ["canonical", "label"], "left")
            .withColumn("g_ns", F.coalesce(F.col("g_ns"), F.lit("uaz")))
            .withColumn("g_id", F.coalesce(F.col("g_id"), uaz))
            .withColumn("g_species",
                        F.coalesce(F.col("g_species"), F.lit(""))))


def ground_entities(entities: DataFrame, kb: DataFrame,
                    gmap: DataFrame | None = None) -> DataFrame:
    """entities (mention rows, kind='tbm') → + (g_ns, g_id, g_species).

    One broadcast hash join of the big mention table against the tiny
    grounding map — the big side never shuffles.
    """
    if gmap is None:
        gmap = ground_map(entities, kb)
    return (entities
            .withColumn("canonical",
                        F.coalesce("canonical", F.lower("text")))
            .join(F.broadcast(gmap), ["canonical", "label"], "left"))
