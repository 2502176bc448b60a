"""FRIES-style JSON frame sink (reference export/.../fries/FriesOutput.scala
:72-257, spec doc/fries-data-representation-spec.txt): passage, sentence,
entity-mention, event-mention and context frame collections as JSON lines,
with the spec's frame-linking structure — sentence frames reference their
passage frame, mention frames reference their sentence frame, event
arguments reference mention frames.

Frame ids follow the spec shapes (doc/fries-data-representation-spec.txt
:66-96): ``pass-<doc>-<passageIdx>`` and ``sent-<doc>-<passageIdx>-<idx>``
(the repo's sent_idx encodes passage*1000+local, so both ids derive from
columns with no join).

Spark shape: pure column restructuring (struct/to_json) + df.write.json —
no driver-side assembly, each partition writes its own frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _sent_frame_id() -> F.Column:
    return F.concat(F.lit("sent-"), "doc_id", F.lit("-"),
                    (F.col("sent_idx") / 1000).cast("int").cast("string"),
                    F.lit("-"),
                    (F.col("sent_idx") % 1000).cast("string"))


def passage_frames(documents: DataFrame) -> DataFrame:
    """One frame per text span (spec :60-71): the passage is the
    ingestion unit, referenced by its sentence frames."""
    from .annotate import text_spans
    return text_spans(documents).select(
        F.concat(F.lit("pass-"), "doc_id", F.lit("-"),
                 F.col("span_pos").cast("string")).alias("frame_id"),
        F.lit("passage").alias("frame_type"),
        F.col("doc_id").alias("document"),
        F.col("span_pos").alias("index"),
        F.col("span_text").alias("text"),
    )


def sentence_frames(sentences: DataFrame) -> DataFrame:
    """One frame per sentence (spec :74-96) with the mandatory passage
    reference; works on any (doc_id, sent_idx, sent_text) table."""
    return sentences.select(
        _sent_frame_id().alias("frame_id"),
        F.lit("sentence").alias("frame_type"),
        F.concat(F.lit("pass-"), "doc_id", F.lit("-"),
                 (F.col("sent_idx") / 1000).cast("int").cast("string"))
        .alias("passage"),
        (F.col("sent_idx") % 1000).alias("index"),
        F.col("sent_text").alias("text"),
    )


def entity_frames(grounded_mentions: DataFrame) -> DataFrame:
    ents = grounded_mentions.where(F.col("kind") == "tbm")
    return ents.select(
        F.concat(F.lit("mention-"), "mention_id").alias("frame_id"),
        F.lit("entity-mention").alias("frame_type"),
        F.col("doc_id").alias("document"),
        _sent_frame_id().alias("sentence"),
        F.col("text"),
        F.col("label").alias("type"),
        F.concat_ws(":", "g_ns", "g_id").alias("xref"),
        F.col("start").alias("start_pos"),
        F.col("end").alias("end_pos"),
        F.to_json("mods").alias("modifications"),
        F.col("found_by"),
    )


def event_frames(grounded_mentions: DataFrame,
                 context: DataFrame | None = None) -> DataFrame:
    evs = grounded_mentions.where(F.col("kind") == "event")
    out = evs.select(
        "doc_id", "sent_idx",
        F.concat(F.lit("event-"), "mention_id").alias("frame_id"),
        F.lit("event-mention").alias("frame_type"),
        F.col("doc_id").alias("document"),
        _sent_frame_id().alias("sentence"),
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
    if context is not None:
        # the FriesOutput context section: species context attached per
        # event via its sentence (assign_context ±3 window, C2)
        out = out.join(context.select("doc_id", "sent_idx",
                                      F.col("context_species")
                                      .alias("context")),
                       ["doc_id", "sent_idx"], "left")
    return out.drop("doc_id", "sent_idx")


def context_frames(context: DataFrame) -> DataFrame:
    """One frame per sentence with non-empty context (the context-frame
    collection FriesOutput emits next to the event file)."""
    return (context
            .where(F.size(F.coalesce("context_species",
                                     F.array())) > 0)
            .select(
                F.concat(F.lit("ctx-"), "doc_id", F.lit("-"),
                         F.col("sent_idx").cast("string")).alias("frame_id"),
                F.lit("context").alias("frame_type"),
                _sent_frame_id().alias("scope"),
                F.col("context_species").alias("species")))


def write_fries(grounded_mentions: DataFrame, out_dir: str,
                documents: DataFrame | None = None,
                sentences: DataFrame | None = None,
                context: DataFrame | None = None) -> None:
    if documents is not None:
        passage_frames(documents).write.mode("overwrite") \
            .json(f"{out_dir}/fries_passages")
    if sentences is not None:
        sentence_frames(sentences).write.mode("overwrite") \
            .json(f"{out_dir}/fries_sentences")
    if context is not None:
        context_frames(context).write.mode("overwrite") \
            .json(f"{out_dir}/fries_context")
    entity_frames(grounded_mentions).write.mode("overwrite") \
        .json(f"{out_dir}/fries_entities")
    event_frames(grounded_mentions, context).write.mode("overwrite") \
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
