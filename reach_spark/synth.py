"""Deterministic synthetic `documents` generator (interleaved text + media).

Implements the FIXTURES.md §1 synthesis recipe: each doc interleaves 1-3
fixture sentences with 0-2 media spans; a long-tail of documents repeats
sentences many times to exercise skew salting (the reference analog is
long papers vs abstracts; SURVEY §4 skew note). Fully distributed: built
from spark.range(n) + a deterministic Arrow-batched generator — no driver
lists, so it scales to any n.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from .fixtures import fixture_sentences
from .schemas import DOCUMENTS


def _rng_ints(seed: int, idx: int, n: int, mod: int) -> list[int]:
    """n deterministic pseudo-random ints in [0, mod) from sha1 — stable
    across Python/JVM versions (no random module state)."""
    out = []
    counter = 0
    while len(out) < n:
        h = hashlib.sha1(f"{seed}:{idx}:{counter}".encode()).digest()
        for i in range(0, 20, 4):
            out.append(int.from_bytes(h[i:i + 4], "big") % mod)
            if len(out) >= n:
                break
        counter += 1
    return out


def make_documents(
    spark: SparkSession,
    n_docs: int = 200,
    seed: int = 42,
    skew_every: int = 50,
    skew_repeat: int = 120,
    partitions: int | None = None,
    unique: bool = False,
) -> DataFrame:
    """Deterministic interleaved documents table.

    Every `skew_every`-th doc is a long-tail doc repeating `skew_repeat`
    sentences (heavy skew for the salting story).

    `unique=True` prefixes every text span with a deterministic
    sample-id clause, making every sentence distinct. This models a
    realistic web-scale corpus (mostly unique text) where extraction is
    CPU-bound; the default (duplicate-heavy) corpus exercises the
    dedupe-before-compute memo fast path instead.
    """
    sents = fixture_sentences()
    n_sents = len(sents)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for idx in pdf["id"].tolist():
                idx = int(idx)
                doc_id = f"doc{seed}_{idx:09d}"
                heavy = skew_every > 0 and idx % skew_every == skew_every - 1
                k_text = skew_repeat if heavy else 1 + _rng_ints(seed, idx, 1, 3)[0]
                k_media = _rng_ints(seed, idx + 10**9, 1, 3)[0]
                picks = _rng_ints(seed, idx, k_text, n_sents)
                if unique:
                    spans = [("text",
                              f"Per sample {idx}-{si}, {sents[p]}", "", 0)
                             for si, p in enumerate(picks)]
                else:
                    spans = [("text", sents[p], "", 0) for p in picks]
                for m in range(k_media):
                    spans.append(("media", "", f"img://{doc_id}/{m}", 0))
                # deterministic interleave: order by sha1 of (doc,i), then
                # re-number offsets 0..len-1
                order = _rng_ints(seed, idx + 2 * 10**9, len(spans), 10**6)
                spans = [s for _, s in sorted(zip(order, spans),
                                              key=lambda t: (t[0], t[1]))]
                spans = [
                    {"kind": k, "text": t, "media_ref": r, "offset": i}
                    for i, (k, t, r, _) in enumerate(spans)
                ]
                rows.append({"doc_id": doc_id, "spans": spans})
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    base = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)
    return base.mapInPandas(gen, schema=DOCUMENTS)
