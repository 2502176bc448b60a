"""Mention extraction operator: sentences → flat mention rows.

One Arrow-batched pass runs the whole sentence-local Odin-style cascade
(SURVEY §2.3: the rule-engine State is sentence-local, so entities, mods,
events, regulations, negation, hypothesis and the sentence-level
completeness filter all happen here with ZERO shuffles). The dictionary is
closure-captured — Spark ships it once per executor with the task closure,
the moral equivalent of a broadcast variable for this size (~10 KB; swap to
``spark.sparkContext.broadcast`` for multi-MB dictionaries).

Dedupe-before-compute: extraction is a pure function of the sentence TEXT,
so each partition memoizes results per distinct sentence and only remaps
the deterministic mention ids per (doc_id, sent_idx). Web-scale corpora are
heavily duplicated (boilerplate, mirrored articles, near-identical
abstracts), which is exactly the long-tail the driver's skewed synthetic
corpus models — the cache turns the 120×-repeated skew docs into hash
lookups. At 100 TB the same property holds per partition; the cache is
bounded so unique-content partitions pay only a dict probe.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from .extract import SentenceExtractor, annotate_sentence
from .resources import entity_dictionary
from .schemas import MENTIONS

_MENTION_COLS = [f.name for f in MENTIONS.fields]
_CACHE_MAX = 100_000  # per-partition distinct-sentence memo bound


def _remap_id(prefix: str, old: str) -> str:
    return hashlib.sha1((prefix + old).encode()).hexdigest()[:16]


def _extract_base(sent_text: str, dictionary) -> list[dict]:
    # annotation is re-derived here (~0.04 ms/sentence) instead of being
    # shipped as nested Arrow columns — see annotate.split_sentences_df
    ann = annotate_sentence(sent_text)
    ex = SentenceExtractor("", 0, ann, dictionary)
    base = []
    for m in ex.run():
        m.setdefault("canonical", None)
        base.append({k: m.get(k) for k in _MENTION_COLS})
    return base


def _rescope(base: list[dict], doc_id: str, sent_idx: int) -> list[dict]:
    """Remap the deterministic ids into this (doc, sent) scope."""
    prefix = f"{doc_id}|{sent_idx}|"
    rows = []
    for m in base:
        m2 = dict(m)
        m2["doc_id"] = doc_id
        m2["sent_idx"] = int(sent_idx)
        m2["mention_id"] = _remap_id(prefix, m["mention_id"])
        if m.get("args"):
            m2["args"] = [
                dict(a, mention_id=_remap_id(prefix, a["mention_id"]))
                for a in m["args"]]
        rows.append(m2)
    return rows


def extract_mentions(sentences: DataFrame) -> DataFrame:
    dictionary = entity_dictionary()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[dict]] = {}
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                base = cache.get(rec.sent_text)
                if base is None:
                    base = _extract_base(rec.sent_text, dictionary)
                    if len(cache) < _CACHE_MAX:
                        cache[rec.sent_text] = base
                rows.extend(_rescope(base, rec.doc_id, rec.sent_idx))
            yield pd.DataFrame(rows, columns=_MENTION_COLS)

    return sentences.mapInPandas(gen, schema=MENTIONS)


def alias_instance_table(mentions: DataFrame) -> DataFrame:
    """[G6] InstanceFinder vocabulary (coref/Alias.scala:12-75): entity
    names minted by alias constructions ('Akt1 (a.k.a. AktTR)'). Bounded by
    the alias vocabulary of the corpus — dimension-table sized, broadcast
    below."""
    from pyspark.sql import functions as F
    return (mentions
            .where(F.col("found_by").startswith("alias-instance"))
            .select("doc_id", F.col("text").alias("i_text"),
                    F.col("label").alias("i_label"),
                    F.col("canonical").alias("i_canonical"))
            .distinct())


def propagate_alias_instances(sentences: DataFrame, mentions: DataFrame,
                              corpus_level: bool = False) -> DataFrame:
    """Doc-wide (or corpus-wide) alias instance propagation: names minted
    by an alias construction in one sentence become dictionary entries for
    EVERY sentence of the document (reference InstanceFinder rescan,
    coref/Alias.scala:12-75; corpus mode = ReachSystem.extractFrom(Seq(
    doc1, doc2)) sharing aliases across papers, TestCoreference sent61).

    Spark shape: the instance vocabulary is tiny → broadcast hash join on
    doc_id; only sentences whose token array overlaps an instance name
    (arrays_overlap, evaluated JVM-side) are re-extracted with the extended
    dictionary; everything else keeps its pass-1 mentions via a broadcast
    anti-join. Re-extraction is memoized per (sentence, extras) like
    pass 1."""
    from pyspark.sql import functions as F

    inst = alias_instance_table(mentions)
    if corpus_level:
        docs = sentences.select("doc_id").distinct()
        inst = docs.crossJoin(
            F.broadcast(inst.drop("doc_id").distinct()))
    per_doc = (inst.groupBy("doc_id")
               .agg(F.collect_list(
                   F.struct("i_text", "i_label", "i_canonical"))
                   .alias("extras")))
    cand = (sentences.join(F.broadcast(per_doc), "doc_id")
            .where(F.expr(
                "exists(extras, x -> instr(sent_text, x.i_text) > 0)")))

    dictionary = entity_dictionary()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[tuple, list[dict]] = {}
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                extras = tuple(sorted({
                    (e["i_text"], e["i_label"], e["i_canonical"])
                    for e in rec.extras}))
                key = (rec.sent_text, extras)
                base = cache.get(key)
                if base is None:
                    d = dict(dictionary)
                    for t, lab, canon in extras:
                        d.setdefault(t.lower(), (lab, canon))
                    base = _extract_base(rec.sent_text, d)
                    if len(cache) < _CACHE_MAX:
                        cache[key] = base
                rows.extend(_rescope(base, rec.doc_id, rec.sent_idx))
            yield pd.DataFrame(rows, columns=_MENTION_COLS)

    rescanned = cand.mapInPandas(gen, schema=MENTIONS)
    keys = cand.select("doc_id", "sent_idx")
    kept = mentions.join(F.broadcast(keys), ["doc_id", "sent_idx"],
                         "left_anti")
    return kept.unionByName(rescanned)
