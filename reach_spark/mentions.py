"""Mention extraction operator: sentences → flat mention rows.

One Arrow-batched pass runs the whole sentence-local Odin-style cascade
(SURVEY §2.3: the rule-engine State is sentence-local, so entities, mods,
events, regulations, negation, hypothesis and the sentence-level
completeness filter all happen here with ZERO shuffles). The dictionary is
closure-captured — Spark ships it once per executor with the task closure,
the moral equivalent of a broadcast variable for this size (~10 KB; swap to
``spark.sparkContext.broadcast`` for multi-MB dictionaries).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from .extract import SentenceExtractor
from .resources import entity_dictionary
from .schemas import MENTIONS

_MENTION_COLS = [f.name for f in MENTIONS.fields]


def extract_mentions(sentences: DataFrame) -> DataFrame:
    dictionary = entity_dictionary()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                ann = {
                    "words": list(rec.words),
                    "tags": list(rec.tags),
                    "lemmas": list(rec.lemmas),
                    "start_offsets": list(rec.start_offsets),
                    "end_offsets": list(rec.end_offsets),
                }
                ex = SentenceExtractor(rec.doc_id, int(rec.sent_idx), ann,
                                       dictionary)
                for m in ex.run():
                    m.setdefault("canonical", None)
                    rows.append({k: m.get(k) for k in _MENTION_COLS})
            yield pd.DataFrame(rows, columns=_MENTION_COLS)

    return sentences.mapInPandas(gen, schema=MENTIONS)
