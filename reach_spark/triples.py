"""Triple flattening: kept event mentions → (subj, pred, obj, ...) rows.

Reference: Arizona/CMU tabular export — INPUT/OUTPUT/CONTROLLER columns with
'TEXT::ns:id' formatting, regulations referencing the controlled event,
activations suffixed '.a', PTM outputs suffixed by event type, SEEN counts
after assembly dedup (ArizonaOutputter.scala:14-62,
AssemblyExporter.scala:114-180). keepIf seen>0 (ArizonaOutputter.scala:40-45).

Spark shape: one explode over args + equi-joins on mention_id (the
id-adjacency encoding of the reference's object graph, SURVEY §1.2) + a
groupBy on the equivalence key for SEEN (the AssemblyManager equivalence-hash
dedup T2, AssemblyManager.scala:65+). Negation parity (F4,
NegationHandler.scala:115-137) is a pure column expression over the mods
array — no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# PTM output suffixes (AssemblyExporter event-type abbreviations)
PTM_SUFFIX = {
    "Phosphorylation": "phos", "Dephosphorylation": "dephos",
    "Ubiquitination": "ubiq", "Deubiquitination": "deubiq",
    "Sumoylation": "sumo", "Desumoylation": "desumo",
    "Glycosylation": "glyc", "Deglycosylation": "deglyc",
    "Acetylation": "acet", "Deacetylation": "deacet",
    "Farnesylation": "farn", "Defarnesylation": "defarn",
    "Ribosylation": "ribo", "Deribosylation": "deribo",
    "Methylation": "meth", "Demethylation": "demeth",
    "Hydroxylation": "hydrox", "Dehydroxylation": "dehydrox",
    "Hydrolysis": "hydro", "Dehydrolysis": "dehydro",
}


def _negated_col() -> F.Column:
    """Odd number of Negation mods → negated (parity rule F4)."""
    return (F.size(F.filter("mods", lambda m: m["kind"] == F.lit("Negation")))
            % 2 == 1)


def _hyp_col() -> F.Column:
    return F.size(F.filter("mods",
                           lambda m: m["kind"] == F.lit("Hypothesis"))) > 0


def build_triples(mentions: DataFrame, context: DataFrame | None = None
                  ) -> DataFrame:
    """grounded mentions → triples DataFrame (TRIPLES schema + context).

    subj = CONTROLLER (null for un-regulated simple events),
    pred = 'Reg_label→Event_label' for regulations over events,
           'Positive_activation'/'Negative_activation', 'Binding', or the
           bare event label,
    obj  = OUTPUT ('text::ns:id' + '.suffix' for PTM outputs, '.a' for
           activation outputs).
    """
    ent_fmt = (
        mentions.where(F.col("kind") == "tbm")
        .select(F.col("mention_id").alias("ref_id"),
                F.concat_ws("::", "text",
                            F.concat_ws(":", "g_ns", "g_id")).alias("fmt"))
    )
    events = mentions.where(F.col("kind") == "event")
    suffix_expr = F.coalesce(
        *[F.when(F.col("label") == k, F.lit(v)) for k, v in PTM_SUFFIX.items()],
        F.lit(""))

    # --- simple events: one row per theme -------------------------------
    simple = events.where(~F.col("label").rlike("regulation|activation"))
    themes = (
        simple.select(
            "doc_id", "sent_idx", "mention_id", "label", "trigger_text",
            "found_by", "is_direct", "mods",
            suffix_expr.alias("sfx"),
            F.explode(F.filter("args", lambda a: a["role"] == F.lit("theme")))
             .alias("arg"))
        .join(ent_fmt, F.col("arg.mention_id") == F.col("ref_id"), "left")
        .withColumn("theme_fmt", F.coalesce("fmt", F.col("arg.text")))
        .drop("ref_id", "fmt")
    )
    # OUTPUT of a modification event = theme + '.' + suffix
    simple_out = themes.withColumn(
        "obj", F.when(F.col("sfx") != "",
                      F.concat_ws(".", "theme_fmt", "sfx"))
                .otherwise(F.col("theme_fmt")))

    # event-id → output fmt (used when a regulation controls the event and
    # when an event is itself a controller; convertEventToEntity depth-1,
    # DarpaActions.scala:581-665)
    event_out = simple_out.select(
        F.col("mention_id").alias("ref_id"),
        F.col("obj").alias("fmt"),
        F.col("theme_fmt").alias("theme_only"))

    # --- regulations & activations ---------------------------------------
    regs = events.where(F.col("label").rlike("regulation|activation"))
    rr = (
        regs.select(
            "doc_id", "sent_idx", "mention_id", "label", "trigger_text",
            "found_by", "mods",
            F.element_at(F.filter("args",
                                  lambda a: a["role"] == F.lit("controller")),
                         1).alias("ctrl"),
            F.element_at(F.filter("args",
                                  lambda a: a["role"] == F.lit("controlled")),
                         1).alias("ctld"))
        .withColumn("ctrl_id", F.col("ctrl.mention_id"))
        .withColumn("ctld_id", F.col("ctld.mention_id"))
    )
    # controller: entity fmt, else event theme (depth-1 conversion)
    ctrl_map = ent_fmt.unionByName(
        event_out.select("ref_id", F.col("theme_only").alias("fmt")))
    rr = (
        rr.join(ctrl_map.withColumnRenamed("ref_id", "ctrl_id")
                        .withColumnRenamed("fmt", "subj_fmt"),
                "ctrl_id", "left")
        .join(event_out.select(F.col("ref_id").alias("ctld_id"),
                               F.col("fmt").alias("ctld_out"),
                               F.col("theme_only").alias("ctld_theme")),
              "ctld_id", "left")
        .join(ent_fmt.select(F.col("ref_id").alias("ctld_id"),
                             F.col("fmt").alias("ctld_ent")),
              "ctld_id", "left")
    )
    regs_ev = rr.where(F.col("ctld_out").isNotNull())
    # controlled-event label for the pred arrow
    ctld_label = events.select(F.col("mention_id").alias("ctld_id"),
                               F.col("label").alias("ctld_label"))
    reg_rows = (
        regs_ev.join(ctld_label, "ctld_id", "left")
        .select(
            "doc_id", "sent_idx",
            F.col("mention_id").alias("event_id"),
            F.col("subj_fmt").alias("subj"),
            F.concat_ws("→", "label", "ctld_label").alias("pred"),
            F.col("ctld_out").alias("obj"),
            _negated_col().alias("negated"),
            _hyp_col().alias("hypothesis"),
            F.lit(False).alias("is_direct"),
            F.col("trigger_text").alias("trigger"),
            "found_by")
    )
    act_rows = (
        rr.where(F.col("ctld_out").isNull() & F.col("ctld_ent").isNotNull())
        .select(
            "doc_id", "sent_idx",
            F.col("mention_id").alias("event_id"),
            F.col("subj_fmt").alias("subj"),
            F.col("label").alias("pred"),
            F.concat(F.col("ctld_ent"), F.lit(".a")).alias("obj"),
            _negated_col().alias("negated"),
            _hyp_col().alias("hypothesis"),
            F.lit(False).alias("is_direct"),
            F.col("trigger_text").alias("trigger"),
            "found_by")
    )

    # --- un-regulated simple events (subj = null) ------------------------
    controlled_ids = regs.select(
        F.explode(F.filter("args", lambda a: a["role"] == F.lit("controlled")))
         .alias("a")).select(F.col("a.mention_id").alias("mention_id")).distinct()
    free_simple = simple_out.join(controlled_ids, "mention_id", "left_anti")
    # Binding: subj = theme1, obj = theme2 (pairs are already binary)
    bind = free_simple.where(F.col("label") == "Binding")
    w2 = Window.partitionBy("mention_id").orderBy("theme_fmt")
    bind_pairs = (
        bind.withColumn("tn", F.row_number().over(w2))
        .groupBy("doc_id", "sent_idx", "mention_id", "label", "trigger_text",
                 "found_by", "is_direct", "mods")
        .agg(F.min(F.when(F.col("tn") == 1, F.col("theme_fmt"))).alias("t1"),
             F.min(F.when(F.col("tn") == 2, F.col("theme_fmt"))).alias("t2"))
        .where(F.col("t2").isNotNull())
        .select("doc_id", "sent_idx",
                F.col("mention_id").alias("event_id"),
                F.col("t1").alias("subj"),
                F.col("label").alias("pred"),
                F.col("t2").alias("obj"),
                _negated_col().alias("negated"),
                _hyp_col().alias("hypothesis"),
                "is_direct",
                F.col("trigger_text").alias("trigger"),
                "found_by")
    )
    other_rows = (
        free_simple.where(F.col("label") != "Binding")
        .select("doc_id", "sent_idx",
                F.col("mention_id").alias("event_id"),
                F.lit(None).cast("string").alias("subj"),
                F.col("label").alias("pred"),
                "obj",
                _negated_col().alias("negated"),
                _hyp_col().alias("hypothesis"),
                "is_direct",
                F.col("trigger_text").alias("trigger"),
                "found_by")
    )

    out = reg_rows.unionByName(act_rows).unionByName(bind_pairs) \
                  .unionByName(other_rows)

    # SEEN = corpus-wide evidence count on the equivalence key (T2 EER dedup
    # groupBy + the Arizona seen>0 filter T4)
    wseen = Window.partitionBy("subj", "pred", "obj", "negated")
    out = (out.withColumn("seen", F.count("*").over(wseen).cast("int"))
              .where(F.col("seen") > 0))

    if context is not None:
        out = out.join(context.select("doc_id", "sent_idx",
                                      "context_species"),
                       ["doc_id", "sent_idx"], "left")
    else:
        out = out.withColumn("context_species",
                             F.lit(None).cast("array<string>"))
    return out.select(
        "doc_id", "sent_idx", "event_id", "subj", "pred", "obj", "negated",
        "hypothesis", "is_direct", "trigger", "found_by", "context_species",
        "seen")
