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


# The expression layer below is generated SQL text compiled by ONE
# F.expr/selectExpr py4j call per column rather than Column-by-Column
# operator chaining: the chained construction cost ~1.6 s of driver py4j
# round-trips PER build_triple_occurrences call (hundreds of gateway
# messages — measured via cProfile of the warm flagship), all of it
# per-query plan-build latency that a 1000-executor cluster would pay on
# the critical path before any task launches. The Catalyst trees are the
# same; the oracle hash gate pins result parity.


def _negated_sql() -> str:
    """Odd number of Negation mods → negated (parity rule F4)."""
    return "(size(filter(mods, m -> m.kind = 'Negation')) % 2) = 1"


def _hyp_sql() -> str:
    return "size(filter(mods, m -> m.kind = 'Hypothesis')) > 0"


def _suffix_sql(label_expr: str) -> str:
    """CASE over the PTM export suffixes (labels are distinct keys, so
    branch order is immaterial — same result as the when/otherwise
    chain this replaces)."""
    branches = " ".join(f"WHEN {label_expr} = '{k}' THEN '{v}'"
                        for k, v in PTM_SUFFIX.items())
    return f"CASE {branches} ELSE '' END"


def _arg1_sql(role: str) -> str:
    # try_element_at, not element_at: Catalyst may reorder a pushed-down
    # predicate on `pred` BEFORE the label filter, evaluating this on event
    # rows that lack the role (ANSI element_at would throw on empty arrays)
    return f"try_element_at(filter(args, a -> a.role = '{role}'), 1)"


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
    no_generic = \
        "size(filter(args, a -> startswith(a.target_label, 'Generic'))) = 0"
    events = events.where(F.col("label") != "Generic_event") \
                   .where(no_generic)

    is_reg = "label RLIKE 'regulation|activation'"

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
        .select("doc_id", F.explode(F.expr(
            "filter(args, a -> a.role = 'controlled')")).alias("a"))
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
                   obj_sfx, is_direct) -> str:
        return (f"named_struct('subj_text', {subj_text}, "
                f"'subj_canon', {subj_canon}, 'obj_text', {obj_text}, "
                f"'obj_canon', {obj_canon}, 'pred', {pred}, "
                f"'obj_sfx', {obj_sfx}, 'is_direct', {is_direct})")

    # helper columns first (one collapsed projection): each subexpression
    # below is referenced up to 6 times by the occurrence CASE — naming
    # them here keeps the generated SQL text and the analyzed Catalyst
    # tree small instead of inlining duplicate subtrees per use
    themes = ("array_sort(transform(filter(args, a -> a.role = 'theme'), "
              "a -> named_struct('text', a.text, 'canonical', a.canonical, "
              "'target_label', a.target_label)))")
    pre = flagged.selectExpr(
        "*",
        f"{_arg1_sql('controller')} AS _ctrl",
        f"{_arg1_sql('controlled')} AS _ctld",
        f"try_element_at({themes}, 1) AS _t1",
        f"try_element_at({themes}, 2) AS _t2")
    pre = pre.selectExpr(
        "*",
        f"({_suffix_sql('_ctld.target_label')}) AS _sfx_ctld",
        f"({_suffix_sql('label')}) AS _sfx_label")

    ptm_in = ", ".join(f"'{k}'" for k in PTM_SUFFIX)
    reg_pred = (
        "CASE WHEN _ctld.target_label RLIKE "
        "'^(Positive|Negative)_(regulation|activation)$' "
        f"OR _ctld.target_label IN ({ptm_in}) "
        "OR _ctld.target_label IN ('Binding', 'Translocation', "
        "'Transcription', 'IncreaseAmount', 'DecreaseAmount') "
        "THEN concat_ws('->', label, _ctld.target_label) "
        "ELSE label END")
    # PTM suffix from the controlled event type; '.a' when the controlled
    # is a plain entity (activation output)
    reg_sfx = ("CASE WHEN _sfx_ctld != '' THEN concat('.', _sfx_ctld) "
               "WHEN label RLIKE 'activation' THEN '.a' ELSE '' END")
    reg_occ = "array({})".format(occ_struct(
        "_ctrl.text", "_ctrl.canonical", "_ctld.text", "_ctld.canonical",
        f"({reg_pred})", f"({reg_sfx})", "false"))

    empty = (
        "CAST(array() AS "
        "array<struct<subj_text:string,subj_canon:string,obj_text:string,"
        "obj_canon:string,pred:string,obj_sfx:string,is_direct:boolean>>)")
    bind_occ = ("CASE WHEN _t2 IS NOT NULL THEN array({s}) "
                "ELSE {empty} END").format(
        empty=empty, s=occ_struct(
            "_t1.text", "_t1.canonical", "_t2.text", "_t2.canonical",
            "label", "''", "is_direct"))

    simple_sfx = ("CASE WHEN _sfx_label != '' "
                  "THEN concat('.', _sfx_label) ELSE '' END")
    other_occ = (
        "transform(filter(args, a -> a.role = 'theme'), th -> {s})".format(
            s=occ_struct("CAST(NULL AS string)", "CAST(NULL AS string)",
                         "th.text", "th.canonical", "label",
                         f"({simple_sfx})", "is_direct")))

    occs = (f"CASE WHEN {is_reg} THEN {reg_occ} "
            f"WHEN is_ctld IS NOT NULL THEN {empty} "
            f"WHEN label = 'Binding' THEN {bind_occ} "
            f"ELSE {other_occ} END")

    rows = (pre
            .selectExpr("doc_id", "sent_idx",
                        "mention_id AS event_id",
                        f"({_negated_sql()}) AS negated",
                        f"({_hyp_sql()}) AS hypothesis",
                        "trigger_text AS trigger",
                        "found_by",
                        f"explode({occs}) AS o")
            .selectExpr("doc_id", "sent_idx", "event_id",
                        "o.subj_text AS subj_text",
                        "o.subj_canon AS subj_canon",
                        "o.obj_text AS obj_text",
                        "o.obj_canon AS obj_canon",
                        "o.pred AS pred",
                        "o.obj_sfx AS obj_sfx",
                        "negated", "hypothesis",
                        "o.is_direct AS is_direct",
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
