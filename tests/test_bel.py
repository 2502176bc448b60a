"""BEL 1.0 exporter golden-structure tests (reach_spark/bel.py).

The reference checkout reserves the sink package (export/.../bel/ exists
but is EMPTY), so these gates pin the skeleton to the public OpenBEL 1.0
grammar: term syntax (p/a/r + pmod codes), relation choice
(directly* for unwrapped modifications/activations, indirect for
regulations), wrapper-sign composition, and the complex term statement
for bindings.
"""

import pytest
from pyspark.sql import functions as F

from reach_spark.bel import bel_statements

SCHEMA = ("subj string, obj string, negated boolean, hypothesis boolean, "
          "is_direct boolean, trigger string, found_by string, seen long, "
          "seen_in array<string>, pred string")


def _stmt(spark, subj, pred, obj, negated=False, hypothesis=False, seen=1):
    df = spark.createDataFrame(
        [(subj, obj, negated, hypothesis, True, "t", "r", seen, [], pred)],
        SCHEMA)
    return bel_statements(df).collect()[0]


def test_simple_modification_direct(spark):
    r = _stmt(spark, "MEK::uniprot:Q02750", "Phosphorylation",
              "ERK::uniprot:P27361")
    assert r["statement"] == \
        "p(UP:Q02750) directlyIncreases p(UP:P27361, pmod(P))"
    assert r["relation"] == "directlyIncreases"


def test_subjectless_event_is_term_statement(spark):
    r = _stmt(spark, None, "Acetylation", "AKT1::uniprot:P31749.acet")
    # the PTM id suffix the triple formatter appends is stripped — BEL
    # carries the modification in pmod(), not the identifier
    assert r["statement"] == "p(UP:P31749, pmod(A))"
    assert r["relation"] is None


def test_de_event_flips_to_decreases(spark):
    r = _stmt(spark, "X::uniprot:P3", "Dephosphorylation",
              "Y::uniprot:P4")
    assert r["statement"] == \
        "p(UP:P3) directlyDecreases p(UP:P4, pmod(P))"


def test_binding_complex_term_lexical_order(spark):
    r = _stmt(spark, "B::uniprot:P2", "Binding", "A::uniprot:P1")
    assert r["statement"] == "complex(p(UP:P1), p(UP:P2))"
    assert r["relation"] is None


def test_wrapped_regulation_indirect(spark):
    r = _stmt(spark, "X::uniprot:P3",
              "Negative_regulation->Phosphorylation", "Y::uniprot:P4")
    assert r["statement"] == "p(UP:P3) decreases p(UP:P4, pmod(P))"


def test_wrapper_sign_composition(spark):
    # increasing a DEphosphorylation decreases the phosphorylated form
    r = _stmt(spark, "X::uniprot:P3",
              "Positive_regulation->Dephosphorylation", "Y::uniprot:P4")
    assert r["statement"] == "p(UP:P3) decreases p(UP:P4, pmod(P))"
    # and a double negative increases it
    r = _stmt(spark, "X::uniprot:P3",
              "Negative_regulation->Dephosphorylation", "Y::uniprot:P4")
    assert r["statement"] == "p(UP:P3) increases p(UP:P4, pmod(P))"


def test_activation_act_term_and_chemical_namespace(spark):
    r = _stmt(spark, "X::uniprot:P3", "Positive_activation",
              "Y::chebi:123")
    assert r["statement"] == "p(UP:P3) directlyIncreases act(a(CHEBI:123))"


def test_transcription_r_term(spark):
    r = _stmt(spark, "X::uniprot:P3",
              "Positive_regulation->Transcription", "Y::uniprot:P4",
              negated=True, hypothesis=True)
    assert r["statement"] == "p(UP:P3) increases r(UP:P4)"
    # BEL can't express negation/hypothesis — they survive as columns
    assert r["negated"] is True and r["hypothesis"] is True


def test_translocation_and_amount(spark):
    r = _stmt(spark, "E::uniprot:P6",
              "Positive_regulation->Translocation", "F::uniprot:P7")
    assert r["statement"] == "p(UP:P6) increases tloc(p(UP:P7))"
    r = _stmt(spark, None, "Amount", "Z::uaz:UAZ123")
    assert r["statement"] == "p(UAZ:UAZ123)"


def test_plan_is_pure_projection(spark):
    df = spark.createDataFrame(
        [("A::uniprot:P1", "B::uniprot:P2", False, False, True, "t", "r",
          1, [], "Phosphorylation")], SCHEMA)
    out = bel_statements(df)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert "EvalPython" not in plan
    assert "Exchange" not in plan          # no shuffle: one projection


def test_pipeline_output_exports_cleanly(spark):
    """End-to-end: every assembled triple from a real pipeline run yields
    a non-null statement with balanced parentheses."""
    from pyspark.sql import Row
    from reach_spark.pipeline import extract_dataframe
    rows = [Row(doc_id="b1", spans=[Row(kind="text",
                                        text="MEK phosphorylates ERK and "
                                             "binds AKT1.",
                                        media_ref="", offset=0)])]
    res = extract_dataframe(spark, spark.createDataFrame(rows),
                            with_coref=False)
    try:
        stmts = bel_statements(res["triples"]).collect()
    finally:
        res.cleanup()
    assert stmts
    for r in stmts:
        s = r["statement"]
        assert s and s.count("(") == s.count(")")
        assert "::" not in s
