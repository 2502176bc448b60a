"""Mention display summaries (reference display/package.scala:14-206
summarizeMentions / summarizeMention / syntacticDependenciesToString):
the per-sentence human-readable block the reference prints to the
console — TEXT, (idx,word,tag) token triples, entity BIO labels,
lemmas, dependency edges, then per-entity and per-event summaries with
their modifications and arguments.

Spark shape: one ``groupBy(doc_id, sent_idx)`` over the mentions table
(collect_list + array_sort inside the aggregate — per-sentence mention
counts are bounded) joined to the sentences table, every string built
with JVM column expressions; ``summarize_mentions`` returns one summary
row per sentence, so printing N documents is ``df.collect()`` of N*S
small strings, never a driver-side walk of the mention graph."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_BOUNDARY = "=" * 50


def _line_for(m) -> "F.Column":
    """Per-mention summary block over a collected mention struct
    (summarizeMention :76-118): kind => text, labels, then mods and
    arguments as indented detail lines."""
    kind_name = (F.when(m["kind"] == "tbm", "TextBoundMention")
                 .when(m["kind"] == "event", "EventMention")
                 .otherwise("RelationMention"))
    mods = F.array_join(
        F.transform(
            m["mods"],
            lambda md: F.concat(
                md["kind"],
                F.when(md["label"].isNotNull() & (md["label"] != ""),
                       F.concat(F.lit("("), md["label"], F.lit(")")))
                .otherwise(F.lit("")))),
        ", ")
    args = F.array_join(
        F.transform(
            F.array_sort(F.transform(
                m["args"],
                lambda a: F.concat(a["role"], F.lit(": "), a["text"]))),
            lambda s: F.concat(F.lit("\t  "), s)),
        "\n")
    return F.concat(
        F.lit("\t"), kind_name, F.lit(" => "), m["text"],
        F.lit("\n\tlabels: "), F.array_join(m["labels"], ", "),
        F.when(mods != "", F.concat(F.lit("\n\tmods: "), mods))
        .otherwise(F.lit("")),
        F.when(F.size(m["args"]) > 0,
               F.concat(F.lit("\n\targuments:\n"), args))
        .otherwise(F.lit("")),
        F.lit("\n\t"), F.lit("-" * 30))


def summarize_mentions(mentions: DataFrame,
                       sentences: DataFrame) -> DataFrame:
    """(doc_id, sent_idx, summary): the summarizeMentions sentence block
    (:14-44). Generic mentions are excluded like the reference's
    ``!isGeneric`` filter; entities list before events, each sorted by
    the collected struct order (kind, label, span)."""
    kept = mentions.where(F.col("keep") &
                          ~F.col("label").startswith("Generic"))
    grouped = (kept
               .groupBy("doc_id", "sent_idx")
               .agg(F.array_sort(F.collect_list(F.struct(
                   "kind", "label", "start", "end", "text", "labels",
                   "mods", "args"))).alias("ms")))

    is_tbm = lambda m: m["kind"] == F.lit("tbm")          # noqa: E731
    ent_lines = F.array_join(
        F.transform(F.filter(F.col("ms"), is_tbm), _line_for), "\n")
    evt_lines = F.array_join(
        F.transform(F.filter(F.col("ms"),
                             lambda m: m["kind"] != F.lit("tbm")),
                    _line_for), "\n")
    n_ent = F.size(F.filter(F.col("ms"), is_tbm))
    n_evt = F.size(F.col("ms")) - n_ent

    toks = F.transform(
        F.col("words"),
        lambda w, i: F.concat(F.lit("("), i.cast("string"), F.lit(","),
                              w, F.lit(","),
                              F.element_at(F.col("tags"), i + 1),
                              F.lit(")")))
    ent_bio = F.zip_with(
        "words", "entities",
        lambda w, e: F.concat(F.lit("("), w, F.lit(","), e, F.lit(")")))
    deps = F.array_join(
        F.transform(
            F.col("deps"),
            lambda d: F.concat(d["label"], F.lit("("),
                               d["src"].cast("string"), F.lit(","),
                               d["dst"].cast("string"), F.lit(")"))),
        " ")

    joined = (sentences.join(grouped, ["doc_id", "sent_idx"], "left")
              .withColumn("ms", F.coalesce(
                  "ms", F.array().cast(grouped.schema["ms"].dataType))))
    summary = F.concat(
        F.lit("sentence #"), F.col("sent_idx").cast("string"),
        F.lit("\nTEXT:   "), F.col("sent_text"),
        F.lit("\nTOKENS: "), F.array_join(toks, ", "),
        F.lit("\nENTITY LABELS: "), F.array_join(ent_bio, ", "),
        F.lit("\nLEMMAS: "), F.array_join("lemmas", " "),
        F.lit("\nDEPS: "), deps,
        F.lit("\nENTITIES: "), n_ent.cast("string"),
        F.when(n_ent > 0, F.concat(F.lit("\n"), ent_lines))
        .otherwise(F.lit("")),
        F.lit("\nEVENTS:   "), n_evt.cast("string"),
        F.when(n_evt > 0, F.concat(F.lit("\n"), evt_lines))
        .otherwise(F.lit("")),
        F.lit("\n"), F.lit(_BOUNDARY))
    return joined.select("doc_id", "sent_idx", summary.alias("summary"))


def display_mentions(mentions: DataFrame, sentences: DataFrame) -> None:
    """displayMentions (:46-48): print every sentence block, document
    order — driver-side convenience for small/API results."""
    for r in (summarize_mentions(mentions, sentences)
              .orderBy("doc_id", "sent_idx").collect()):
        print(r.summary)
