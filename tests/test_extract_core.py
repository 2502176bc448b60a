"""Golden-behavior tests over the ported reference fixture corpus
(reference test strategy: sentence-level regression suites, SURVEY §5).
Pure-Python core — no Spark session needed, so the whole fixture corpus
runs in milliseconds. The Spark layer is tested in test_pipeline_spark.py.
"""

import pytest

from reach_spark.assertions import check_expectation
from reach_spark.extract import extract_sentence
from reach_spark.fixtures import CASES
from reach_spark.resources import entity_dictionary

DICT = entity_dictionary()

PARAMS = [
    pytest.param(sent, exp, id=f"{cid}-{exp[0]}-{i}")
    for cid, _, sent, exps in CASES
    for i, exp in enumerate(exps)
    if exp[0] not in ("grounded", "grounded_same")
]


@pytest.mark.parametrize("sentence,expectation", PARAMS)
def test_fixture_expectation(sentence, expectation):
    _, mentions = extract_sentence("testdoc", 0, sentence, DICT)
    assert check_expectation(expectation, mentions), (
        f"{expectation} failed on: {sentence!r}\n"
        f"events: {[(m['label'], m.get('trigger_text'), [(a['role'], a['text']) for a in m['args']]) for m in mentions if m['kind'] == 'event']}"
    )


def test_precision_recall_target():
    """Aggregate P/R over the ported corpus must be ≥ 0.95
    (BASELINE.json metric). Each expectation is one golden item."""
    total = passed = 0
    for _, _, sent, exps in CASES:
        _, mentions = extract_sentence("testdoc", 0, sent, DICT)
        for exp in exps:
            if exp[0] in ("grounded", "grounded_same"):
                continue
            total += 1
            if check_expectation(exp, mentions):
                passed += 1
    assert total > 80
    assert passed / total >= 0.95, f"P/R {passed}/{total}"


def test_tokenizer_preserves_bio_names():
    from reach_spark.extract import tokenize
    words, starts, ends = tokenize(
        "NF-kappaB p65 binds GTP at Ser-827 (T669A).")
    assert "NF-kappaB" in words
    assert "p65" in words
    assert "Ser-827" in words
    assert "T669A" in words
    # offsets are consistent
    text = "NF-kappaB p65 binds GTP at Ser-827 (T669A)."
    for w, s, e in zip(words, starts, ends):
        assert text[s:e] == w


def test_max_sentence_guard():
    from reach_spark.extract import annotate_sentence
    ann = annotate_sentence("word " * 500)
    assert len(ann["words"]) <= 100


@pytest.mark.parametrize("sentence", [
    # TestBindingEvents sent35/sent44/sent45: no spurious bindings from
    # cargo-binding nominals, DNA-binding function NPs, or antibody IP
    # lists (kept out of the oracle fixture corpus: 'phosphatase-1C'
    # grounds label-dependently, which would break the per-fixture
    # composability that gen_kg_oracle validates)
    "LMTK2 signals via protein phosphatase-1C (PP1C) to increase "
    "inhibitory phosphorylation of GSK3β on serine-9 that reduces KLC2 "
    "phosphorylation and promotes binding of the known KLC2 cargo Smad2.",
    "We provide evidence and a model illustrating how oncogenic, "
    "activated Ras can increase the DNA binding and transcription "
    "function of SAF-1 / MAZ transcription factor, a transcriptional "
    "regulator of VEGF gene expression.",
    "The empty vector and HSP20 overexpressing HuH7 cell lysates were "
    "immunoprecipitated (IP) with antibodies for AKT, ERK, MEK and "
    "normal rabbit IgG",
])
def test_no_spurious_bindings(sentence):
    _, mentions = extract_sentence("testdoc", 0, sentence, DICT)
    assert not [m for m in mentions
                if m["kind"] == "event" and m["label"] == "Binding"]
