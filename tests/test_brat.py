"""Brat standoff exporter/reader (reach_spark.brat — reference
main/.../brat/Brat.scala + utils/BratUtils.scala)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F


@pytest.fixture(scope="module")
def brat_results(spark):
    from reach_spark.pipeline import extract_dataframe
    texts = [
        # nested regulation + alias + binding in one doc
        "Mek was not phosphorylated by Erk. ASPP1 (also known as p53BP1) "
        "binds p53.",
        # mutation splitting: two events identical except Mutant mods —
        # the recursive-signature determinism case
        "all six FGFR3 mutants induced activatory ERK(K156M, H204M) "
        "dephosphorylation (Fig. 2).",
        "TopBP1 phosphorylates ATR on serine 125 and serine 126.",
    ]
    docs = spark.createDataFrame(
        [Row(doc_id=str(i),
             spans=[Row(kind="text", text=t, media_ref="", offset=0)])
         for i, t in enumerate(texts)])
    res = extract_dataframe(spark, docs, with_coref=False)
    return res["resolved_mentions"], res["sentences"]


def _lines(spark_df):
    return {(r.doc_id, r.ann_id): r.line for r in spark_df.collect()}


def test_standoff_structure(brat_results):
    """T/E/R/# line shapes, contiguous ids, trigger + typed args
    (Brat.dumpStandoff :132-188)."""
    from reach_spark.brat import brat_standoff
    mentions, sentences = brat_results
    lines = _lines(brat_standoff(mentions, sentences))
    doc1 = {a: l for (d, a), l in lines.items() if d == "1"}

    t_ids = sorted(int(a[1:]) for a in doc1 if a.startswith("T"))
    e_ids = sorted(int(a[1:]) for a in doc1 if a.startswith("E"))
    assert t_ids == list(range(1, len(t_ids) + 1))
    assert e_ids == list(range(1, len(e_ids) + 1))

    for a, l in doc1.items():
        assert l.startswith(a + "\t")
        if a.startswith("T"):
            body, text = l.split("\t")[1:]
            label, s, e = body.rsplit(" ", 2)
            assert 0 <= int(s) < int(e)
        if a.startswith("E"):
            head = l.split("\t")[1].split(" ")[0]
            assert ":" in head and head.split(":")[1].startswith("T")


def test_offsets_index_reconstructed_text(brat_results):
    """Every T line's [start, end) slice of brat_doc_text equals its text
    column — the .txt/.ann consistency brat itself validates."""
    from reach_spark.brat import brat_doc_text, brat_standoff
    mentions, sentences = brat_results
    txt = {r.doc_id: r.text
           for r in brat_doc_text(sentences).collect()}
    for (d, a), l in _lines(brat_standoff(mentions, sentences)).items():
        if not a.startswith("T"):
            continue
        body, text = l.split("\t")[1:]
        _, s, e = body.rsplit(" ", 2)
        assert txt[d][int(s):int(e)] == text


def test_event_args_reference_existing_ids(brat_results):
    """E/R args (Role:T<n> / Role:E<n>) reference ids present in the same
    document; nested regulations reference E ids."""
    from reach_spark.brat import brat_standoff
    mentions, sentences = brat_results
    lines = _lines(brat_standoff(mentions, sentences))
    by_doc: dict[str, dict] = {}
    for (d, a), l in lines.items():
        by_doc.setdefault(d, {})[a] = l
    saw_nested = False
    for d, anns in by_doc.items():
        for a, l in anns.items():
            if a[0] not in "ER":
                continue
            parts = l.split("\t")[1].split(" ")
            refs = [p.split(":")[1] for p in parts
                    if ":" in p and not p.startswith(a[0] + ":")]
            if a.startswith("E"):
                refs.append(parts[0].split(":")[1])
            for ref in refs:
                assert ref in anns, (d, a, l, ref)
                if a[0] == "E" and ref[0] == "E":
                    saw_nested = True
    assert saw_nested  # the Mek/Erk regulation controls E-phospho


def test_mutation_twin_determinism(spark, brat_results):
    """Two events identical except Mutant mods (extract.py mutation
    splitting) must number deterministically: repeated runs emit
    byte-identical standoff (the recursive content signature includes
    mods)."""
    from reach_spark.brat import brat_standoff
    mentions, sentences = brat_results
    a = _lines(brat_standoff(mentions, sentences))
    b = _lines(brat_standoff(
        mentions.repartition(7), sentences.repartition(5)))
    assert a == b


def test_parse_standoff_roundtrip(brat_results):
    """dump -> parse recovers every annotation with its type, label,
    spans, trigger and args (Brat.parseAnnotation :33-90)."""
    from reach_spark.brat import brat_standoff, parse_standoff
    mentions, sentences = brat_results
    lines = brat_standoff(mentions, sentences)
    parsed = parse_standoff(lines)
    n_in = lines.count()
    rows = parsed.collect()
    # '#' note lines are not annotations (parseAnnotation ignores them)
    n_notes = lines.where(F.col("ann_id").startswith("#")).count()
    assert len(rows) == n_in - n_notes
    by_type: dict[str, int] = {}
    for r in rows:
        by_type[r.ann_type] = by_type.get(r.ann_type, 0) + 1
        if r.ann_type == "textbound":
            assert r.spans and r.spans[0]["end"] > r.spans[0]["start"]
            assert r.text
        if r.ann_type == "event":
            assert r.trigger.startswith("T")
            for a in r.args or []:
                assert a["ref"][0] in "TE"
    assert by_type.get("textbound", 0) > 5
    assert by_type.get("event", 0) >= 3
    assert by_type.get("relation", 0) >= 1


def test_parse_standoff_external_forms(spark):
    """Attribute / normalization / equivalence / discontinuous-span lines
    from third-party standoff parse into typed rows (:49,70-85)."""
    from reach_spark.brat import parse_standoff
    raw = [
        "T1\tProtein 0 6;10 14\tTopBP1 ATR",
        "A1\tNegation E1",
        "M1\tSpeculation E1 High",
        "*\tEquiv T1 T2",
        "N1\tReference T1 UniProt:P53_HUMAN\tCellular tumor antigen p53",
        "X1\tBogus stuff",
    ]
    df = spark.createDataFrame([Row(line=l) for l in raw])
    rows = {r.ann_id: r for r in parse_standoff(df).collect()}
    assert "X1" not in rows and len(rows) == 5
    t1 = rows["T1"]
    assert [(s["start"], s["end"]) for s in t1.spans] == [(0, 6), (10, 14)]
    assert rows["A1"].ann_type == "attribute"
    assert rows["A1"].args[0]["ref"] == "E1"
    assert rows["N1"].norm_resource == "UniProt"
    assert rows["N1"].norm_entry == "P53_HUMAN"
    assert rows["*"].ann_type == "equivalence"
    assert [a["ref"] for a in rows["*"].args] == ["T1", "T2"]


def test_align_bio_labels(spark, brat_results):
    """BIO alignment (Brat.alignTokenLabel :108-126): B- at span start,
    I- inside, O elsewhere; the LAST overlapping annotation wins."""
    from reach_spark.brat import (align_bio_labels, brat_standoff,
                                  parse_standoff)
    mentions, sentences = brat_results
    parsed = parse_standoff(brat_standoff(mentions, sentences))
    tb = (parsed.where(F.col("ann_type") == "textbound")
          .select("doc_id",
                  F.substring("ann_id", 2, 18).cast("int").alias("tnum"),
                  "label", "spans"))
    bio = {(r.doc_id, r.sent_idx): r.entities
           for r in align_bio_labels(sentences, tb).collect()}
    d2 = bio[("2", 0)]  # TopBP1 phosphorylates ATR on serine 125 ...
    assert d2[0] == "B-Gene_or_gene_product"
    assert "B-Site" in d2 and "I-Site" in d2  # "serine 125" is 2 tokens
    assert d2.count("O") >= 2
    # last-wins: Mek sentence trigger tagged by the HIGHEST T number
    # covering it (Positive_regulation outranks Phosphorylation there)
    d1 = bio[("0", 0)]
    assert d1[3] == "B-Positive_regulation"


def test_brat_ann_text_order(brat_results):
    """brat_ann_text emits T block, then R, then E, then notes, each by
    ascending id (Brat.dumpStandoff :148-152 emit order)."""
    from reach_spark.brat import brat_ann_text
    mentions, sentences = brat_results
    ann = {r.doc_id: r.ann for r in
           brat_ann_text(mentions, sentences).collect()}
    order = {"T": 0, "R": 1, "E": 2, "#": 3}
    for d, text in ann.items():
        seen = [order[l[0]] for l in text.split("\n")]
        assert seen == sorted(seen), d


def test_brat_expected_pinned_to_fixtures():
    """_brat_expected.py regeneration pin — same discipline as
    _kg_expected (fails loudly if fixtures.py changed without re-running
    tools/gen_brat_oracle.py)."""
    import hashlib

    from reach_spark import _brat_expected as B
    from reach_spark.fixtures import fixture_sentences
    sents = fixture_sentences()
    h = hashlib.sha256()
    for s in sents:
        h.update(s.encode("utf-8"))
        h.update(b"\x00")
    assert B.N_FIXTURES == len(sents)
    assert B.FIXTURE_SHA == h.hexdigest()[:16], (
        "fixtures.py changed — regenerate with: "
        "python tools/gen_brat_oracle.py")
    assert len(B.BRAT_T) > 2000 and len(B.BRAT_E) > 800


def test_syntax_standoff(spark, brat_results):
    """Brat.syntaxStandoff (:190-214): POS tags as T rows, dependency
    edges as R rows with governor/dependent token refs; token T ids are
    document order across sentences."""
    from reach_spark.brat import syntax_standoff
    _mentions, sentences = brat_results
    rows = {(r.doc_id, r.ann_id): r.line
            for r in syntax_standoff(sentences).collect()}
    d2 = {a: l for (d, a), l in rows.items() if d == "2"}
    n_toks = sum(len(s.words) for s in sentences.collect()
                 if s.doc_id == "2")
    t_ids = sorted(int(a[1:]) for a in d2 if a.startswith("T"))
    assert t_ids == list(range(1, n_toks + 1))
    assert any(a.startswith("R") for a in d2)
    for a, l in d2.items():
        if a.startswith("R"):
            body = l.split("\t")[1]
            assert " governor:T" in body and " dependent:T" in body
            for ref in body.split(" ")[1:]:
                tid = int(ref.split(":T")[1])
                assert 1 <= tid <= n_toks


def test_ruler_run_rules(spark):
    """Ruler.runOpen analog (api.run_rules): user token rules -> brat
    standoff of the matches; compile errors come back as [name, message]
    with no standoff (OdinNamedCompileException :45-48)."""
    from reach_spark.api import run_rules
    rules = """
rules:
  - name: my-protein
    label: Protein
    pattern: "[word=/^(TopBP1|ATR)$/]"
"""
    r = run_rules(spark, "TopBP1 phosphorylates ATR.", rules)
    assert r["error"] is None
    assert "T1\tProtein 0 6\tTopBP1" in r["eventAnnotations"]
    assert "FoundByRule T1\tmy-protein" in r["eventAnnotations"]
    assert r["syntaxAnnotations"].count("\tNN ") >= 1
    assert list(r["ruleMap"]) == ["my-protein"]
    assert r["ruleMap"]["my-protein"].startswith("- name: my-protein")
    assert [t["word"] for t in r["tokens"][:2]] == ["TopBP1",
                                                    "phosphorylates"]

    bad = run_rules(spark, "TopBP1.",
                    "rules:\n  - name: broken\n"
                    "    pattern: '[word=/(unclosed/]'\n")
    assert bad["error"][0] == "broken" and bad["eventAnnotations"] is None

    empty = run_rules(spark, "TopBP1.", "   ")
    assert empty["error"] == [None, "rulesStr is empty"]


def test_ruler_run_reach(spark):
    """Ruler.runReach analog: full cascade standoff + packaged rules
    echo."""
    from reach_spark.api import run_reach
    r = run_reach(spark, "Mek was not phosphorylated by Erk.")
    assert r["error"] is None
    assert "Phosphorylation:T" in r["eventAnnotations"]
    assert "Controlled:E1" in r["eventAnnotations"]
    assert "- name:" in r["rules"] and len(r["rules"]) > 1000
    assert r["syntaxAnnotations"].startswith("R1\t") or \
        r["syntaxAnnotations"].startswith("T1\t")
