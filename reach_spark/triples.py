"""Triple flattening: kept event mentions → (subj, pred, obj, ...) rows.

Reference: Arizona/CMU tabular export — INPUT/OUTPUT/CONTROLLER columns with
'TEXT::ns:id' formatting, regulations referencing the controlled event,
activations suffixed '.a', PTM outputs suffixed by event type, SEEN counts
after assembly dedup (ArizonaOutputter.scala:14-62,
AssemblyExporter.scala:114-180). keepIf seen>0 (ArizonaOutputter.scala:40-45).

Spark shape: args carry denormalized (text, canonical, target_label) — see
schemas.ARG — so formatting a triple needs NO self-join of the mentions
table: one broadcast join against the tiny grounding map (bounded by the
surface vocabulary, not corpus size) resolves every ns:id, and everything
else is column expressions. The only shuffles are the SEEN equivalence
aggregation (the AssemblyManager T2 dedup) and the context join. Negation
parity (F4, NegationHandler.scala:115-137) is a pure column expression over
the mods array — no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# PTM output suffixes (AssemblyExporter event-type abbreviations) — loaded
# from the declarative rule file (reach_spark/rules/simple_events.yml, the
# O5 data-driven layer) so a family added there flows through to export
from .resources import PTM_SUFFIXES as PTM_SUFFIX


def _negated_col() -> F.Column:
    """Odd number of Negation mods → negated (parity rule F4)."""
    return (F.size(F.filter("mods", lambda m: m["kind"] == F.lit("Negation")))
            % 2 == 1)


def _hyp_col() -> F.Column:
    return F.size(F.filter("mods",
                           lambda m: m["kind"] == F.lit("Hypothesis"))) > 0


def _suffix_for(label_col: F.Column) -> F.Column:
    expr = F.lit("")
    for k, v in PTM_SUFFIX.items():
        expr = F.when(label_col == k, v).otherwise(expr)
    return expr


def _arg1(role: str) -> F.Column:
    # try_element_at, not element_at: Catalyst may reorder a pushed-down
    # predicate on `pred` BEFORE the label filter, evaluating this on event
    # rows that lack the role (ANSI element_at would throw on empty arrays)
    return F.try_element_at(
        F.filter("args", lambda a: a["role"] == F.lit(role)), F.lit(1))


def build_triple_occurrences(mentions: DataFrame,
                             context: DataFrame | None = None,
                             gmap: DataFrame | None = None) -> DataFrame:
    """grounded mentions (+ optional tiny grounding map) → one row per
    EVENT OCCURRENCE (the incremental, append-safe triple log; the deduped
    EER table is `assemble_triples` over this).

    subj = CONTROLLER (null for un-regulated simple events),
    pred = 'Reg_label->Event_label' (ASCII separator: pred is a partition value; non-ASCII partition dirs break on non-UTF8 default-charset filesystems) for regulations over events,
           'Positive_activation'/'Negative_activation', 'Binding', or the
           bare event label,
    obj  = OUTPUT ('text::ns:id' + '.suffix' for PTM outputs, '.a' for
           activation outputs).
    """
    events = mentions.where(F.col("kind") == "event")
    # argsComplete pruning (Coref.scala:92-100): an event still carrying an
    # UNRESOLVED Generic_* argument (emitted by the per-sentence extractor
    # for doc-level coref, but never rewritten — e.g. with_coref=False, or
    # no antecedent found) contributes no triples
    no_generic = F.size(F.filter(
        "args", lambda a: a["target_label"].startswith("Generic"))) == 0
    events = events.where(F.col("label") != "Generic_event") \
                   .where(no_generic)

    is_reg = F.col("label").rlike("regulation|activation")

    # "un-regulated" = not the controlled arg of a SURVIVING regulation.
    # The sentence-local is_controlled stamp is not sufficient: a
    # regulation whose generic controller never resolved was pruned above
    # (no_generic), and its inner event must re-emerge as an un-regulated
    # triple ('It phosphorylates Ras.' with no antecedent keeps the
    # Phosphorylation and loses only the regulation — reference Coref
    # pruning semantics, TestCoreference sent6). Doc-scoped left join; both
    # sides are the already-filtered event subset, so the exchange carries
    # event rows only, never the corpus.
    controlled_ids = (
        events.where(is_reg)
        .select("doc_id", F.explode(F.filter(
            "args", lambda a: a["role"] == F.lit("controlled"))).alias("a"))
        .select("doc_id", F.col("a.mention_id").alias("mention_id"))
        .distinct()
        .withColumn("is_ctld", F.lit(True)))
    flagged = events.join(controlled_ids, ["doc_id", "mention_id"], "left")

    # ONE scan emits every occurrence shape through a per-row struct array
    # + explode (the three filtered-scan branches this replaces tripled the
    # cache-read traffic and the task count of the widest stage):
    #   regulations/activations → 1 struct from (controller, controlled)
    #   un-controlled Binding   → 1 struct from the content-ordered
    #                             theme pair (symmetric evidence must land
    #                             in one EER class, so themes sort by
    #                             (text, canonical), never by the
    #                             (doc, sent)-scoped mention_id)
    #   other un-controlled simple events → 1 struct per theme
    def occ_struct(subj_text, subj_canon, obj_text, obj_canon, pred,
                   obj_sfx, is_direct) -> F.Column:
        return F.struct(subj_text.alias("subj_text"),
                        subj_canon.alias("subj_canon"),
                        obj_text.alias("obj_text"),
                        obj_canon.alias("obj_canon"),
                        pred.alias("pred"), obj_sfx.alias("obj_sfx"),
                        is_direct.alias("is_direct"))

    ctrl = _arg1("controller")
    ctld = _arg1("controlled")
    reg_pred = (
        F.when(ctld["target_label"].rlike(
            "^(Positive|Negative)_(regulation|activation)$") |
            ctld["target_label"].isin(list(PTM_SUFFIX)) |
            ctld["target_label"].isin(
                "Binding", "Translocation", "Transcription",
                "IncreaseAmount", "DecreaseAmount"),
            F.concat_ws("->", F.col("label"), ctld["target_label"]))
        .otherwise(F.col("label")))
    # PTM suffix from the controlled event type; '.a' when the controlled
    # is a plain entity (activation output)
    reg_sfx = (
        F.when(_suffix_for(ctld["target_label"]) != "",
               F.concat(F.lit("."), _suffix_for(ctld["target_label"])))
        .when(F.col("label").rlike("activation"), F.lit(".a"))
        .otherwise(F.lit("")))
    reg_occ = F.array(occ_struct(
        ctrl["text"], ctrl["canonical"], ctld["text"], ctld["canonical"],
        reg_pred, reg_sfx, F.lit(False)))

    themes = F.array_sort(F.transform(
        F.filter("args", lambda a: a["role"] == F.lit("theme")),
        lambda a: F.struct(a["text"].alias("text"),
                           a["canonical"].alias("canonical"),
                           a["target_label"].alias("target_label"))))
    t1 = F.try_element_at(themes, F.lit(1))
    t2 = F.try_element_at(themes, F.lit(2))
    empty = F.array().cast(
        "array<struct<subj_text:string,subj_canon:string,obj_text:string,"
        "obj_canon:string,pred:string,obj_sfx:string,is_direct:boolean>>")
    bind_occ = F.when(t2.isNotNull(), F.array(occ_struct(
        t1["text"], t1["canonical"], t2["text"], t2["canonical"],
        F.col("label"), F.lit(""), F.col("is_direct")))).otherwise(empty)

    simple_sfx = (F.when(_suffix_for(F.col("label")) != "",
                         F.concat(F.lit("."), _suffix_for(F.col("label"))))
                  .otherwise(F.lit("")))
    other_occ = F.transform(
        F.filter("args", lambda a: a["role"] == F.lit("theme")),
        lambda th: occ_struct(
            F.lit(None).cast("string"), F.lit(None).cast("string"),
            th["text"], th["canonical"], F.col("label"), simple_sfx,
            F.col("is_direct")))

    occs = (F.when(is_reg, reg_occ)
            .when(F.col("is_ctld").isNotNull(), empty)
            .when(F.col("label") == "Binding", bind_occ)
            .otherwise(other_occ))

    rows = (flagged
            .select("doc_id", "sent_idx",
                    F.col("mention_id").alias("event_id"),
                    _negated_col().alias("negated"),
                    _hyp_col().alias("hypothesis"),
                    F.col("trigger_text").alias("trigger"),
                    "found_by",
                    F.explode(occs).alias("o"))
            .select("doc_id", "sent_idx", "event_id",
                    F.col("o.subj_text").alias("subj_text"),
                    F.col("o.subj_canon").alias("subj_canon"),
                    F.col("o.obj_text").alias("obj_text"),
                    F.col("o.obj_canon").alias("obj_canon"),
                    F.col("o.pred").alias("pred"),
                    F.col("o.obj_sfx").alias("obj_sfx"),
                    "negated", "hypothesis",
                    F.col("o.is_direct").alias("is_direct"),
                    "trigger", "found_by"))

    # --- grounding resolution: two broadcast joins against the tiny map --
    if gmap is not None:
        # one gid per canonical key (min over the labels present): keeps the
        # left joins below 1:1 — a canonical grounding differently under two
        # labels must not duplicate triple rows
        g = F.broadcast(gmap.select(F.col("canonical").alias("c"),
                                    F.concat_ws(":", "g_ns", "g_id")
                                    .alias("gid"))
                        .groupBy("c").agg(F.min("gid").alias("gid")))
        rows = (rows
                .join(g.withColumnRenamed("c", "subj_canon")
                       .withColumnRenamed("gid", "subj_gid"),
                      "subj_canon", "left")
                .join(g.withColumnRenamed("c", "obj_canon")
                       .withColumnRenamed("gid", "obj_gid"),
                      "obj_canon", "left"))
    else:
        rows = (rows.withColumn("subj_gid", F.lit(None).cast("string"))
                    .withColumn("obj_gid", F.lit(None).cast("string")))

    out = rows.select(
        "doc_id", "sent_idx", "event_id",
        F.when(F.col("subj_text").isNotNull(),
               F.concat_ws("::", "subj_text", "subj_gid")).alias("subj"),
        "pred",
        F.concat(F.concat_ws("::", "obj_text", "obj_gid"),
                 F.col("obj_sfx")).alias("obj"),
        "negated", "hypothesis", "is_direct", "trigger", "found_by")

    if context is not None:
        out = out.join(context.select("doc_id", "sent_idx",
                                      "context_species"),
                       ["doc_id", "sent_idx"], "left")
    else:
        out = out.withColumn("context_species",
                             F.lit(None).cast("array<string>"))
    return out.select(
        "doc_id", "sent_idx", "event_id", "subj", "pred", "obj", "negated",
        "hypothesis", "is_direct", "trigger", "found_by", "context_species")


def assemble_triples(occurrences: DataFrame) -> DataFrame:
    """[T1/T2/T4] AssemblyManager EER dedup: occurrence rows → ONE row per
    distinct equivalence class (subj, pred, obj, negated) with SEEN =
    corpus-wide evidence count and SEEN IN = the doc ids carrying evidence
    (AssemblyExporter.scala:114-180, ArizonaOutputter.scala:40-45; the
    seen>0 keep-filter is satisfied by construction — a class only exists
    because ≥1 occurrence was observed).

    Spark shape: a single hash aggregation with map-side partial combine on
    the equivalence key — no window (a window would shuffle AND sort every
    occurrence; the aggregate pre-combines per partition, so at 100 TB the
    shuffle carries one partial row per (partition × distinct EER), not one
    per occurrence)."""
    return (occurrences
            .groupBy("subj", "pred", "obj", "negated")
            .agg(F.count("*").alias("seen"),
                 F.max("hypothesis").alias("hypothesis"),
                 F.max("is_direct").alias("is_direct"),
                 F.min("trigger").alias("trigger"),
                 F.min("found_by").alias("found_by"),
                 F.array_sort(F.collect_set("doc_id")).alias("seen_in"))
            .select("subj", "pred", "obj", "negated", "hypothesis",
                    "is_direct", "trigger", "found_by", "seen", "seen_in"))


def build_triples(mentions: DataFrame, context: DataFrame | None = None,
                  gmap: DataFrame | None = None,
                  assemble: bool = True) -> DataFrame:
    """Convenience: occurrences (+ optional EER assembly, the default)."""
    occ = build_triple_occurrences(mentions, context, gmap)
    return assemble_triples(occ) if assemble else occ
