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

from .extract import SentenceExtractor
from .resources import entity_dictionary
from .schemas import MENTIONS

_MENTION_COLS = [f.name for f in MENTIONS.fields]
_CACHE_MAX = 100_000  # per-partition distinct-sentence memo bound


def _remap_id(prefix: str, old: str) -> str:
    return hashlib.sha1((prefix + old).encode()).hexdigest()[:16]


def extract_mentions(sentences: DataFrame) -> DataFrame:
    dictionary = entity_dictionary()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[dict]] = {}
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                base = cache.get(rec.sent_text)
                if base is None:
                    ann = {
                        "words": list(rec.words),
                        "tags": list(rec.tags),
                        "lemmas": list(rec.lemmas),
                        "start_offsets": list(rec.start_offsets),
                        "end_offsets": list(rec.end_offsets),
                    }
                    ex = SentenceExtractor("", 0, ann, dictionary)
                    base = []
                    for m in ex.run():
                        m.setdefault("canonical", None)
                        base.append({k: m.get(k) for k in _MENTION_COLS})
                    if len(cache) < _CACHE_MAX:
                        cache[rec.sent_text] = base
                # remap the deterministic ids into this (doc, sent) scope
                prefix = f"{rec.doc_id}|{rec.sent_idx}|"
                for m in base:
                    m2 = dict(m)
                    m2["doc_id"] = rec.doc_id
                    m2["sent_idx"] = int(rec.sent_idx)
                    m2["mention_id"] = _remap_id(prefix, m["mention_id"])
                    if m.get("args"):
                        m2["args"] = [
                            dict(a, mention_id=_remap_id(prefix,
                                                         a["mention_id"]))
                            for a in m["args"]]
                    rows.append(m2)
            yield pd.DataFrame(rows, columns=_MENTION_COLS)

    return sentences.mapInPandas(gen, schema=MENTIONS)
