"""FRIES-style JSON frame sink (reference export/.../fries/FriesOutput.scala
:72-257, spec doc/fries-data-representation-spec.txt): entity-mention and
event-mention frame collections as JSON lines.

Spark shape: pure column restructuring (struct/to_json) + df.write.json —
no driver-side assembly, each partition writes its own frames. Optional:
triples are the parity artifact (S7); this covers the S5 sink row of the
operator inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def entity_frames(grounded_mentions: DataFrame) -> DataFrame:
    ents = grounded_mentions.where(F.col("kind") == "tbm")
    return ents.select(
        F.concat(F.lit("mention-"), "mention_id").alias("frame_id"),
        F.lit("entity-mention").alias("frame_type"),
        F.col("doc_id").alias("document"),
        F.col("sent_idx").alias("sentence"),
        F.col("text"),
        F.col("label").alias("type"),
        F.concat_ws(":", "g_ns", "g_id").alias("xref"),
        F.col("start").alias("start_pos"),
        F.col("end").alias("end_pos"),
        F.to_json("mods").alias("modifications"),
        F.col("found_by"),
    )


def event_frames(grounded_mentions: DataFrame) -> DataFrame:
    evs = grounded_mentions.where(F.col("kind") == "event")
    return evs.select(
        F.concat(F.lit("event-"), "mention_id").alias("frame_id"),
        F.lit("event-mention").alias("frame_type"),
        F.col("doc_id").alias("document"),
        F.col("sent_idx").alias("sentence"),
        F.col("label").alias("type"),
        F.col("labels").alias("type_hierarchy"),
        F.col("trigger_text").alias("trigger"),
        F.transform("args", lambda a: F.struct(
            a["role"].alias("role"),
            F.concat(F.lit("mention-"), a["mention_id"]).alias("arg"),
            a["text"].alias("text"))).alias("arguments"),
        (F.size(F.filter("mods",
                         lambda m: m["kind"] == F.lit("Negation"))) % 2 == 1)
        .alias("is_negated"),
        (F.size(F.filter("mods",
                         lambda m: m["kind"] == F.lit("Hypothesis"))) > 0)
        .alias("is_hypothesis"),
        F.col("is_direct"),
        F.col("found_by"),
    )


def write_fries(grounded_mentions: DataFrame, out_dir: str) -> None:
    entity_frames(grounded_mentions).write.mode("overwrite") \
        .json(f"{out_dir}/fries_entities")
    event_frames(grounded_mentions).write.mode("overwrite") \
        .json(f"{out_dir}/fries_events")


def index_cards(occurrences: DataFrame) -> DataFrame:
    """IndexCard per-event JSON cards (reference
    export/.../indexcards/IndexCardOutput.scala — S6): one card per event
    OCCURRENCE (build_triple_occurrences output) with participant_a/b,
    interaction_type, negation and context. Interaction-type vocabulary
    follows the reference: regulations over PTM events →
    adds_modification / inhibits_modification (with a modifications
    struct), translocations → translocates, activations →
    increases_activity / decreases_activity, plain regulations →
    increases / decreases, binding → binds. Pure column restructuring;
    write with df.write.json."""
    from .triples import PTM_SUFFIX
    ptm_names = list(PTM_SUFFIX)
    ctld = F.try_element_at(F.split("pred", "->"), F.lit(2))
    is_reg_ptm = ctld.isin(ptm_names)
    is_bare_ptm = F.col("pred").isin(ptm_names)
    ptm_type = F.coalesce(ctld, F.col("pred"))
    itype = (
        F.when(F.col("pred").startswith("Positive_regulation") & is_reg_ptm,
               F.lit("adds_modification"))
        .when(F.col("pred").startswith("Negative_regulation") & is_reg_ptm,
              F.lit("inhibits_modification"))
        .when(is_bare_ptm, F.lit("adds_modification"))
        .when(F.col("pred") == "Translocation", F.lit("translocates"))
        .when(F.col("pred").startswith("Positive_regulation"),
              F.lit("increases"))
        .when(F.col("pred").startswith("Negative_regulation"),
              F.lit("decreases"))
        .when(F.col("pred") == "Positive_activation",
              F.lit("increases_activity"))
        .when(F.col("pred") == "Negative_activation",
              F.lit("decreases_activity"))
        .when(F.col("pred") == "Binding", F.lit("binds"))
        .otherwise(F.lower(F.col("pred"))))
    mods = F.when(is_reg_ptm | is_bare_ptm,
                  F.array(F.struct(
                      F.lower(ptm_type).alias("modification_type"))))
    return occurrences.select(
        F.concat(F.lit("card-"), "event_id").alias("card_id"),
        F.col("doc_id").alias("pmc_id"),
        F.struct(
            F.col("subj").alias("participant_a"),
            F.col("obj").alias("participant_b"),
            itype.alias("interaction_type"),
            mods.alias("modifications"),
            F.col("negated").alias("negative_information"),
        ).alias("extracted_information"),
        F.col("context_species"),
        F.col("trigger").alias("evidence"),
    )


def write_index_cards(occurrences: DataFrame, out_dir: str) -> None:
    index_cards(occurrences).write.mode("overwrite").json(
        f"{out_dir}/index_cards")
