"""Coreference: doc-local sieve cascade producing antecedent links.

Reference sieve order (coref/Coref.scala:420-426, darpa/DarpaLinks.scala):
exactStringMatch → groundingMatch → pronominalMatch → nounPhraseMatch.
Each sieve picks the CLOSEST PRIOR candidate (LinearSelector).

Spark shape (SURVEY §2.8): coref is doc-local, so the whole cascade is one
``applyInPandas`` behind a single groupBy(doc_id) shuffle. Output is an edge
list (mention_id, antecedent_id, sieve) that (a) rewrites generic mentions
and (b) feeds the canonicalization connected-components pass.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from .resources import GENERIC_NP_HEADS, PRONOUNS_PLURAL, PRONOUNS_SINGULAR

LINKS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("mention_id", T.StringType(), False),
    T.StructField("antecedent_id", T.StringType(), False),
    T.StructField("sieve", T.StringType(), False),
])


def _doc_links(pdf: pd.DataFrame) -> pd.DataFrame:
    ents = pdf[pdf["kind"] == "tbm"].sort_values(["sent_idx", "start"])
    rows = []
    seen: list[dict] = []
    first_by_text: dict[str, str] = {}
    first_by_grounding: dict[str, str] = {}
    for rec in ents.to_dict("records"):
        key = rec["text"].lower()
        gid = f"{rec.get('g_ns')}:{rec.get('g_id')}"
        # exactStringMatch (DarpaLinks.scala:24-45)
        if key in first_by_text and first_by_text[key] != rec["mention_id"]:
            rows.append((rec["doc_id"], rec["mention_id"],
                         first_by_text[key], "exactStringMatch"))
        # groundingMatch (DarpaLinks.scala:54-70)
        elif rec.get("g_ns") not in (None, "uaz") and \
                gid in first_by_grounding and \
                first_by_grounding[gid] != rec["mention_id"]:
            rows.append((rec["doc_id"], rec["mention_id"],
                         first_by_grounding[gid], "groundingMatch"))
        first_by_text.setdefault(key, rec["mention_id"])
        if rec.get("g_ns") not in (None, "uaz"):
            first_by_grounding.setdefault(gid, rec["mention_id"])
        seen.append(rec)
    # pronominal / generic-NP sieves: closest prior bio entity
    all_rows = pdf.sort_values(["sent_idx", "start"]).to_dict("records")
    bio = [r for r in all_rows if r["kind"] == "tbm" and
           r["label"] not in ("Site",)]
    for i, rec in enumerate(all_rows):
        t = rec["text"].lower()
        if rec["kind"] != "tbm":
            continue
        if t in PRONOUNS_SINGULAR or t in PRONOUNS_PLURAL or \
                t in GENERIC_NP_HEADS:
            prior = [b for b in bio
                     if (b["sent_idx"], b["start"]) <
                        (rec["sent_idx"], rec["start"])
                     and b["mention_id"] != rec["mention_id"]]
            if prior:
                ante = prior[-1]
                sieve = ("pronominalMatch"
                         if t in PRONOUNS_SINGULAR + PRONOUNS_PLURAL
                         else "nounPhraseMatch")
                rows.append((rec["doc_id"], rec["mention_id"],
                             ante["mention_id"], sieve))
    return pd.DataFrame(rows, columns=["doc_id", "mention_id",
                                       "antecedent_id", "sieve"])


def coref_links(grounded_mentions: DataFrame) -> DataFrame:
    cols = ["doc_id", "sent_idx", "mention_id", "kind", "label", "text",
            "start", "g_ns", "g_id"]
    slim = grounded_mentions.select(*cols)
    return slim.groupBy("doc_id").applyInPandas(
        lambda pdf: _doc_links(pdf), schema=LINKS_SCHEMA)
