"""Property-based tests (hypothesis) for the contracts the engine's
correctness rests on but example tests can only spot-check:

- tokenizer offset algebra (every token is an exact slice of the
  dash-normalized source; spans ascending and non-overlapping; no
  non-whitespace character lost),
- the north-rule span-sequence invariant (extract_text reassembles the
  text spans in offset order for ANY interleaving/permutation of spans),
- connected-components equivalence to a union-find oracle on random
  graphs,
- fixed-point PageRank partitioning invariance on random graphs,
- media-header decode totality on arbitrary/adversarial byte strings.

Spark-backed properties cap max_examples (each example is a Spark job);
the pure-Python tokenizer property runs at full default volume.
"""

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Row

from reach_spark.extract import annotate_sentence

ALPHABET = (string.ascii_letters + string.digits +
            " ()-,./?!:;'\"%+=[]*&#@αβΔ–‐−")
# the tokenizer normalizes unicode dash variants to ASCII '-' (1:1 length,
# extract.py en-dash complex handling) before matching
_DASHES = str.maketrans({"–": "-", "‐": "-", "−": "-"})


@given(st.text(alphabet=ALPHABET, max_size=60))
@settings(max_examples=300)
def test_tokenizer_offset_algebra(s):
    a = annotate_sentence(s)
    words, starts, ends = a["words"], a["start_offsets"], a["end_offsets"]
    norm = s.translate(_DASHES)
    prev_end = -1
    for w, st_, en in zip(words, starts, ends):
        assert st_ < en, (s, w)
        assert st_ >= prev_end, (s, w)          # ascending, non-overlapping
        assert norm[st_:en] == w, (s, w)        # exact source slice
        prev_end = en
    # nothing lost: concatenated tokens == source minus whitespace
    assert "".join(words) == "".join(norm.split())
    # parallel arrays stay parallel through POS/lemma annotation
    assert len(words) == len(a["tags"]) == len(a["lemmas"])


# --- Spark-backed properties (module-scoped session from conftest) ------

spans_strategy = st.lists(
    st.tuples(st.sampled_from(["text", "media"]),
              st.text(alphabet=string.ascii_lowercase + " ", min_size=1,
                      max_size=12)),
    min_size=1, max_size=6,
)


@given(spans=spans_strategy, perm_seed=st.integers(0, 10**6))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_span_reassembly_invariant(spark, spans, perm_seed):
    """North-rule per-row invariant: whatever order span structs arrive in,
    extract_text concatenates the text spans in offset order and media
    spans never leak into the text."""
    import random

    from reach_spark.annotate import extract_text

    rows = [Row(kind=k, text=(t if k == "text" else ""),
                media_ref=("" if k == "text" else f"m://{i}"),
                offset=i)
            for i, (k, t) in enumerate(spans)]
    shuffled = rows[:]
    random.Random(perm_seed).shuffle(shuffled)
    df = spark.createDataFrame(
        [Row(doc_id="d", spans=shuffled)],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")
    got = extract_text(df).collect()[0]
    expected = " ".join(t for k, t in spans if k == "text")
    assert got["text"] == expected
    assert got["n_spans"] == len(spans)
    assert got["n_text_spans"] == sum(1 for k, _ in spans if k == "text")


edges_strategy = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),
    min_size=1, max_size=15,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@given(edges=edges_strategy)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_connected_components_matches_union_find(spark, edges):
    from reach_spark.canonicalize import connected_components

    df = spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in edges], "src string, dst string")
    got = {r["node"]: r["component"]
           for r in connected_components(df).collect()}
    oracle = {f"n{n}": f"n{c}" for n, c in _union_find(edges).items()}
    # same node set, same partition into components, same min-label rep
    assert got == oracle


@given(edges=edges_strategy, nparts=st.integers(1, 6))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pagerank_partitioning_invariance(spark, edges, nparts):
    """Fixed-point integer PageRank must be bit-identical under any
    repartitioning of the triples input (the property float PageRank
    lacks)."""
    from reach_spark.graph_ops import pagerank_fp

    rows = [(f"n{a}", "P", f"n{b}", False, 1) for a, b in edges]
    schema = "subj string, pred string, obj string, negated boolean, seen long"
    base = spark.createDataFrame(rows, schema)
    r1 = sorted((r["node"], r["pr_fp"])
                for r in pagerank_fp(base, iters=2).collect())
    r2 = sorted((r["node"], r["pr_fp"])
                for r in pagerank_fp(base.repartition(nparts),
                                     iters=2).collect())
    assert r1 == r2


@given(blob=st.one_of(
    st.none(),
    st.binary(max_size=256),
    # adversarial: valid magic bytes followed by arbitrary garbage —
    # exercises the truncation guards in every format branch
    st.sampled_from([b"\x89PNG\r\n\x1a\n", b"GIF89a", b"\xff\xd8",
                     b"RIFF", b"RIFFxxxxWAVE"]).flatmap(
        lambda m: st.binary(max_size=64).map(lambda t: m + t))))
@settings(max_examples=200, deadline=None)
def test_media_header_total_on_arbitrary_bytes(blob):
    """parse_media_header is TOTAL: any byte string (including truncated
    valid magics) yields a well-typed 4-tuple, never an exception — the
    property that keeps one garbage blob from failing a 100 TB partition."""
    from reach_spark.multimodal import parse_media_header
    fmt, a, b, c = parse_media_header(blob)
    assert fmt in ("png", "gif", "jpeg", "wav", "unknown")
    assert all(isinstance(x, int) and x >= 0 for x in (a, b, c))


@given(st.text(max_size=120))
@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_extraction_total_and_deterministic_on_arbitrary_text(s):
    """Crawl totality: the per-sentence extraction cascade must never
    raise on arbitrary unicode (a 100 TB crawl contains every byte
    sequence) and must be deterministic (identical output on repeat —
    the property checkpoint/resume byte-equality rests on). Uses the
    full unfiltered hypothesis text alphabet: control chars, emoji,
    CJK, RTL, combining marks."""
    from reach_spark.extract import extract_sentence
    from reach_spark.resources import entity_dictionary
    d = entity_dictionary()
    _, m1 = extract_sentence("d", 0, s, d)
    _, m2 = extract_sentence("d", 0, s, d)
    # full-dict equality (ids are content-hashed, so they must agree too)
    assert m1 == m2


@given(st.text(max_size=300))
@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_sentence_split_total_and_lossless_ish(s):
    """split_sentences never raises and never invents non-whitespace
    content: concatenated output tokens are a subsequence of the
    (dash-normalized) input's non-whitespace characters."""
    from reach_spark.extract import split_sentences
    parts = split_sentences(s)
    assert all(isinstance(p, str) for p in parts)
    # every emitted sentence is non-empty after strip
    assert all(p.strip() for p in parts)


# --------------------------------------------------------------------------
# exact substring-span dedup: contract against a brute-force oracle on
# random small corpora built from a tiny vocabulary (so cross-doc K-token
# collisions actually happen)
# --------------------------------------------------------------------------
_doc_strategy = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=8, max_size=20),
    min_size=2, max_size=5)


def _substr_oracle(docs, k=8):
    """Brute force: positions whose K-token shingle occurs in >=2 distinct
    docs, merged into maximal (overlap-or-adjacent) spans per doc."""
    from collections import defaultdict
    where = defaultdict(set)
    for d, toks in enumerate(docs):
        for p in range(len(toks) - k + 1):
            where[tuple(toks[p:p + k])].add(d)
    spans = {}
    for d, toks in enumerate(docs):
        ps = [p for p in range(len(toks) - k + 1)
              if len(where[tuple(toks[p:p + k])]) >= 2]
        merged = []
        for p in ps:
            if merged and p <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], p))
            else:
                merged.append((p, p))
        spans[d] = {(s, e + k - 1) for s, e in merged}
    return spans


@given(docs=_doc_strategy)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_substring_spans_matches_bruteforce(spark, docs):
    import tempfile, os
    from reach_spark import textops
    d = tempfile.mkdtemp()
    rows = [(i, " ".join(toks), "en", "s", 0) for i, toks in enumerate(docs)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long") \
        .write.mode("overwrite").parquet(os.path.join(d,
                                                      "documents.parquet"))
    fn, _ = textops.QUERIES["dedup_substring_spans"]
    got = {}
    for r in fn(spark, d).collect():
        got.setdefault(r["doc_id"], set()).add(
            (r["span_start"], r["span_end"]))
        # span arithmetic invariants
        assert r["dup_tokens"] == r["span_end"] - r["span_start"] + 1
        assert 0 <= r["span_start"] <= r["span_end"]
        assert r["max_docs"] >= 2
    want = {d_: s for d_, s in _substr_oracle(docs).items() if s}
    assert got == want


@given(st.data())
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_kmeans_partitioning_invariance(spark, data):
    """Integer-exact k-means must be bit-identical under any repartition
    of the embeddings input (the property float Lloyd's lacks)."""
    import tempfile, os
    from reach_spark import similarity
    n = data.draw(st.integers(16, 40))
    dim = data.draw(st.integers(2, 6))
    vals = data.draw(st.lists(
        st.lists(st.floats(-1, 1, allow_nan=False, width=32),
                 min_size=dim, max_size=dim),
        min_size=n, max_size=n))
    nparts = data.draw(st.integers(1, 6))
    d = tempfile.mkdtemp()
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    df.write.mode("overwrite").parquet(os.path.join(d,
                                                    "embeddings.parquet"))
    fn, _ = similarity.QUERIES["kmeans_embeddings"]
    a = {r["vec_id"]: (r["cluster"], r["sim"])
         for r in fn(spark, d).collect()}
    d2 = tempfile.mkdtemp()
    df.repartition(nparts).write.mode("overwrite") \
        .parquet(os.path.join(d2, "embeddings.parquet"))
    b = {r["vec_id"]: (r["cluster"], r["sim"])
         for r in fn(spark, d2).collect()}
    assert a == b


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lines=st.lists(
    st.text(alphabet=string.printable, max_size=60), max_size=12))
def test_parse_standoff_total_on_arbitrary_lines(spark, lines):
    """brat.parse_standoff never throws on arbitrary printable input —
    unrecognized or malformed lines drop (Brat.parseAnnotation's
    catch-all :88), well-formed ids parse into typed rows."""
    from reach_spark.brat import parse_standoff
    clean = [l.replace("\r", " ").replace("\n", " ") for l in lines]
    df = spark.createDataFrame(
        [Row(line=l) for l in clean] or [Row(line="")],
        "line string")
    rows = parse_standoff(df).collect()
    for r in rows:
        assert r.ann_type in ("textbound", "relation", "event",
                              "equivalence", "attribute",
                              "normalization")
