"""BioPAX L3 exporter golden-structure tests (reach_spark/biopax.py).

The reference checkout reserves the sink package (export/.../biopax/
exists but is EMPTY), so these gates pin the skeleton to the public
BioPAX Level 3 model: interaction-class choice per event family,
Control/Catalysis/TemplateReactionRegulation with ACTIVATION/INHIBITION
controlType (wrapper-sign composition), namespace-typed physical
entities, and identifiers.org xref URIs.
"""

from reach_spark.biopax import biopax_elements

SCHEMA = ("subj string, obj string, negated boolean, hypothesis boolean, "
          "is_direct boolean, trigger string, found_by string, seen long, "
          "seen_in array<string>, pred string")


def _row(spark, subj, pred, obj, negated=False, hypothesis=False, seen=1):
    df = spark.createDataFrame(
        [(subj, obj, negated, hypothesis, True, "t", "r", seen, [], pred)],
        SCHEMA)
    return biopax_elements(df).collect()[0]


def test_simple_modification_biochemical_reaction(spark):
    r = _row(spark, None, "Phosphorylation", "ERK::uniprot:P27361.p")
    assert r["interaction_class"] == "BiochemicalReaction"
    assert r["control_class"] is None and r["control_type"] is None
    assert r["left_uri"] == "http://identifiers.org/uniprot/P27361"
    assert r["left_class"] == "Protein"
    assert r["right_uri"] == \
        "http://identifiers.org/uniprot/P27361#phosphorylation"


def test_wrapped_regulation_catalysis_activation(spark):
    r = _row(spark, "MEK::uniprot:Q02750",
             "Positive_regulation->Phosphorylation", "ERK::uniprot:P27361")
    assert r["interaction_class"] == "BiochemicalReaction"
    assert r["control_class"] == "Catalysis"
    assert r["control_type"] == "ACTIVATION"
    assert r["controller_uri"] == "http://identifiers.org/uniprot/Q02750"
    assert r["controller_class"] == "Protein"


def test_negative_regulation_control_inhibition(spark):
    r = _row(spark, "X::uniprot:P3",
             "Negative_regulation->Phosphorylation", "Y::uniprot:P4")
    assert r["control_class"] == "Control"
    assert r["control_type"] == "INHIBITION"


def test_wrapper_sign_composition_de_inner_flips(spark):
    # Negative_regulation of a DEphosphorylation composes to ACTIVATION
    r = _row(spark, "X::uniprot:P3",
             "Negative_regulation->Dephosphorylation", "Y::uniprot:P4")
    assert r["control_type"] == "ACTIVATION"
    assert r["control_class"] == "Catalysis"
    assert r["right_uri"].endswith("#unmodified")


def test_binding_complex_assembly(spark):
    r = _row(spark, "B::uniprot:P2", "Binding", "A::uniprot:P1")
    assert r["interaction_class"] == "ComplexAssembly"
    assert r["right_class"] == "Complex"
    assert r["right_uri"].endswith("#complex")


def test_translocation_transport(spark):
    r = _row(spark, None, "Translocation", "AKT1::uniprot:P31749")
    assert r["interaction_class"] == "Transport"


def test_transcription_template_reaction_rna_object(spark):
    r = _row(spark, None, "Transcription", "TP53::uniprot:P04637")
    assert r["interaction_class"] == "TemplateReaction"
    assert r["left_class"] == "Rna"


def test_template_regulation_class(spark):
    r = _row(spark, "X::uniprot:P3",
             "Positive_regulation->Transcription", "TP53::uniprot:P04637")
    assert r["control_class"] == "TemplateReactionRegulation"
    assert r["control_type"] == "ACTIVATION"


def test_chemical_namespace_small_molecule(spark):
    r = _row(spark, "EGF::chebi:CHEBI:62499", "Positive_activation",
             "AKT1::uniprot:P31749")
    assert r["controller_class"] == "SmallMolecule"
    assert r["control_type"] == "ACTIVATION"
    assert r["control_class"] == "Catalysis"


def test_negative_activation_inhibition(spark):
    r = _row(spark, "X::uniprot:P3", "Negative_activation",
             "Y::uniprot:P4")
    assert r["control_type"] == "INHIBITION"


def test_negation_hypothesis_seen_survive(spark):
    r = _row(spark, None, "Ubiquitination", "Y::uniprot:P4",
             negated=True, hypothesis=True, seen=7)
    assert r["negated"] is True and r["hypothesis"] is True
    assert r["seen"] == 7


def test_uaz_failsafe_entity_grounds_as_protein(spark):
    r = _row(spark, None, "Phosphorylation", "XYZ9::uaz:UAZ12345678")
    assert r["left_uri"] == "http://identifiers.org/uaz/UAZ12345678"
    assert r["left_class"] == "Protein"


def test_pipeline_end_to_end_biopax(spark):
    # the BEL test's pipeline pattern: a real extraction through the api
    from reach_spark.api import annotate_text
    resp = annotate_text(spark, "MEK phosphorylates ERK.",
                         out_format="biopax")
    assert resp["hasError"] is False
    import json
    elems = json.loads(resp["result"])["elements"]
    assert any(e["control_class"] == "Catalysis" and
               e["interaction_class"] == "BiochemicalReaction"
               for e in elems)


def _elements(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return biopax_elements(df)


def test_fragmenter_views(spark):
    """Fragmenter (reference fragmenter/Fragmenter.scala:14-76): typed
    per-class views, control set, xref census and id lookup over the
    element table."""
    from reach_spark.biopax import Fragmenter
    els = _elements(spark, [
        (None, "ERK::uniprot:P27361.p", False, False, True, "t", "r", 1,
         [], "Phosphorylation"),
        ("MEK::uniprot:Q02750", "ERK::uniprot:P27361.p", False, False,
         True, "t", "r", 2, [], "Positive_regulation->Phosphorylation"),
        ("A::uniprot:P1", "B::uniprot:P2", False, False, True, "t", "r",
         1, [], "Binding"),
        (None, "RAS::uniprot:P01112", False, False, True, "t", "r", 1,
         [], "Translocation"),
        (None, "TP53::uniprot:P04637", False, False, True, "t", "r", 1,
         [], "Transcription"),
    ])
    f = Fragmenter(els)
    assert f.conversions.count() == 4          # 2 biochem + assembly + transport
    assert f.controls.count() == 1
    assert f.biochemical_reactions.count() == 2
    assert f.complex_assemblies.count() == 1
    assert f.transports.count() == 1
    assert f.template_reactions.count() == 1
    assert f.catalysis.count() == 1

    xrefs = {r.xref_id: r for r in f.unification_xrefs.collect()}
    assert "P27361" in xrefs and xrefs["P27361"].db == "uniprot"
    hit = f.get_entity_reference_by_id("Q02750").collect()
    assert hit and hit[0].entity_class == "Protein"

    counts = {(r.interaction_class, r.control_class): r["count"]
              for r in f.class_counts().collect()}
    assert counts[("BiochemicalReaction", "Catalysis")] == 1
