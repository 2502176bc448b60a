"""Out-of-fixture generalization gate: sentences built from symbols that
appear in NO fixture and NO KB dictionary, through the full pipeline.

The fixture corpus (810 cases) gates parity with the reference; this file
gates the opposite risk — an engine tuned to its own test set. Every clause
shape here exercises a grammar family on entities only the shape-NER/CRF
tier can catch (digit/camel-case symbols → uaz failsafe grounding,
AzFailsafeKB.scala analog), so a regression that narrows recall to
memorized surface forms fails here even with fixtures green.
"""

import pytest

from pyspark.sql import Row

from reach_spark.pipeline import extract_dataframe

# deliberately unattested symbols: not in fixtures.py, kb_data, or rules
SENTS = [
    "ZQX741 phosphorylates YWB233.",                                # active
    "YWB233 is ubiquitinated by ZQX741.",                           # passive
    "The binding of ZQX741 to YWB233 was observed.",                # nominal
    "ZQX741 inhibits the transcription of YWB233.",                 # neg reg
    "Overexpression of ZQX741 increased the acetylation of YWB233 "
    "by QRT55.",                                                    # nested
    "ZQX741 fails to promote the hydrolysis of YWB233.",            # negation
    # wild-PMC r5 tiers (PMC3261204 / PMC1289294 / PMC3261204 shapes)
    "Decreased/lost ZQX741 increases YWB233 activation.",           # premod-
    "Tumors deficient in ZQX741 have activated YWB233.",            # absence
    "ZQX741 associates with activated YWB233.",                     # stateadj
    "QRT55 acts in the absence of any ZQX741-induced "
    "phosphorylation of YWB233.",                                   # absenceof
    "BQV881 cells express endogenous ZQX741.",                      # cell-NP
    "QRT55 translocates ZQX741 to the nucleus and the increased "
    "binding to YWB233 follows.",                                   # bind-to
    "ZQX741 and YWB233 are present, and QRT55 accelerates their "
    "ubiquitination.",                                              # pron-subj
    "KPW412 mobilizes ZQX741 and YWB233 complexes away, "
    "accelerating their degradation.",                              # pron-ger
    "ZQX741 -/- MEFs endogenously express YWB233.",                 # genotype
    "Deletion of the ZQX741 reduced the hydroxylation of YWB233.",  # det-wrap
    "Glycosylation of QRT55 targets was assayed in parallel.",      # targets
    "The stress-triggered binder of ZQX741 (STBZ) acetylates "
    "YWB233.",                                                      # sh-abbrev
    "Addition of QRTγ5 strongly induced YWB233 methylation.",       # greek
]


@pytest.fixture(scope="module")
def novel_results(spark):
    rows = [Row(doc_id=f"nov{i}",
                spans=[Row(kind="text", text=s, media_ref="", offset=0)])
            for i, s in enumerate(SENTS)]
    res = extract_dataframe(spark, spark.createDataFrame(rows),
                            with_coref=False)
    return {"triples": res["triples"].collect(),
            "entities": res["entities"].collect()}


def _has(trips, subj_sym, pred, obj_sym, negated=False):
    return any(
        (t["subj"] or "").startswith(f"{subj_sym}::uaz:")
        and t["pred"] == pred
        and (t["obj"] or "").startswith(f"{obj_sym}::uaz:")
        and t["negated"] is negated
        for t in trips)


def test_novel_symbols_ground_to_failsafe(novel_results):
    """Unseen symbols are still mentions — caught by the shape tier and
    grounded with uaz failsafe ids (never dropped, never crashing the
    broadcast-join grounding on an empty hit set)."""
    ents = {e["text"]: e["g_ns"] for e in novel_results["entities"]}
    for sym in ("ZQX741", "YWB233", "QRT55"):
        assert ents.get(sym) == "uaz"


def test_active_voice_regulation(novel_results):
    assert _has(novel_results["triples"], "ZQX741",
                "Positive_regulation->Phosphorylation", "YWB233")


def test_passive_voice_regulation(novel_results):
    assert _has(novel_results["triples"], "ZQX741",
                "Positive_regulation->Ubiquitination", "YWB233")


def test_nominal_binding(novel_results):
    bind = [t for t in novel_results["triples"] if t["pred"] == "Binding"
            and "ZQX741" in (t["subj"] or "") + (t["obj"] or "")
            and "YWB233" in (t["subj"] or "") + (t["obj"] or "")]
    assert len(bind) == 1


def test_negative_regulation_verb(novel_results):
    assert _has(novel_results["triples"], "ZQX741",
                "Negative_regulation->Transcription", "YWB233")


def test_nested_wrapper_and_by_phrase(novel_results):
    """'Overexpression of A increased the acetylation of B by C' →
    both the wrapper subject A and the by-phrase agent C control the
    acetylation (multi-controller nested regulation)."""
    trips = novel_results["triples"]
    assert _has(trips, "ZQX741", "Positive_regulation->Acetylation",
                "YWB233")
    assert _has(trips, "QRT55", "Positive_regulation->Acetylation",
                "YWB233")


def test_negation_parity_on_novel_event(novel_results):
    assert _has(novel_results["triples"], "ZQX741",
                "Positive_regulation->Hydrolysis", "YWB233", negated=True)


def test_negative_premod_flips_bare_controller(novel_results):
    """Wild-PMC r5 tier: 'Decreased/lost X increases Y activation' —
    the slash-compound negative participial pre-modifier flips the bare
    entity controller's sign (X controls through its absence)."""
    assert _has(novel_results["triples"], "ZQX741",
                "Negative_activation", "YWB233")


def test_absence_pp_flips_controller(novel_results):
    """Wild-PMC r5 tier: 'Tumors deficient in X have activated Y' —
    the absence-PP controller gets sign -1."""
    trips = [t for t in novel_results["triples"]
             if t["pred"] == "Negative_activation"
             and (t["subj"] or "").startswith("ZQX741::uaz:")
             and (t["obj"] or "").startswith("YWB233::uaz:")]
    assert trips


def test_absence_of_negates_pp_local_event(novel_results):
    """Wild-PMC r5 tier: an event inside an 'in the absence of ...' PP
    is emitted NEGATED (downward-entailing PP head; beyond the
    reference's NegationHandler cue set, inert on the fixture corpus)."""
    trips = [t for t in novel_results["triples"]
             if t["pred"] == "Phosphorylation"
             and "YWB233" in (t["obj"] or "")]
    assert trips and all(t["negated"] for t in trips)


def test_schwartz_hearst_vetoes_np_abbreviation_alias(novel_results):
    """Wild-PMC r5 tier: 'the stress-triggered binder of ZQX741 (STBZ)'
    — STBZ Schwartz–Hearst-aligns to the whole NP, so it is NOT an alias
    of the bare anchor entity ZQX741."""
    trips = novel_results["triples"]
    assert not any(t["pred"] == "Alias" and "ZQX741" in (t["subj"] or "")
                   and "STBZ" in (t["obj"] or "") for t in trips)
    assert not any(t["pred"] == "Alias" and "STBZ" in (t["subj"] or "")
                   and "ZQX741" in (t["obj"] or "") for t in trips)


def test_greek_letter_shape_ner(novel_results):
    """Wild-PMC r5 tier: Greek-letter compounds ('QRTγ5', the GTPγS
    shape) are caught by the shape tier, ground failsafe, and can head a
    wrapper controller."""
    ents = {e["text"] for e in novel_results["entities"]}
    assert "QRTγ5" in ents
    assert any(t["pred"].endswith("Methylation")
               and "QRTγ5" in (t["subj"] or "")
               for t in novel_results["triples"])


def test_wrapper_sign_crosses_determiner(novel_results):
    """Wild-PMC r5 tier: 'Deletion of the X reduced the hydroxylation of
    Y' — the determiner between 'of' and the entity is transparent for
    the negative wrapper, so the two flips compose to a POSITIVE
    regulation (X -> Y)."""
    assert _has(novel_results["triples"], "ZQX741",
                "Positive_regulation->Hydroxylation", "YWB233")


def test_entity_targets_np_takes_no_theme(novel_results):
    """Wild-PMC r5 tier: 'Glycosylation of QRT55 targets' — the theme is
    the (unnamed) targets of the entity, never the entity itself."""
    assert not any(t["pred"].endswith("Glycosylation")
                   and "QRT55" in (t["obj"] or "")
                   for t in novel_results["triples"])


def test_genotype_cell_np_is_context(novel_results):
    """Wild-PMC r5 tier: 'ZQX741 -/- MEFs endogenously express YWB233' —
    the knockout-genotype cell NP head is context; the Transcription
    fires with no regulation controlled by the knocked-out gene."""
    trips = novel_results["triples"]
    assert any(t["pred"] == "Transcription"
               and "YWB233" in (t["obj"] or "") for t in trips)
    # the pre-fix failure mode was a POSITIVE regulation of the
    # expression controlled by the knocked-out gene (the deliberate
    # Negative_regulation->Transcription from the 'inhibits the
    # transcription' sentence is unrelated and must survive)
    assert not any("ZQX741" in (t["subj"] or "")
                   and t["pred"] in ("Positive_regulation",
                                     "Positive_regulation->Transcription")
                   for t in trips)


def test_pronoun_subject_excluded_from_antecedents(novel_results):
    """Wild-PMC r5 tier: 'QRT55 accelerates their ubiquitination' — the
    tensed verb's subject is the controller, never one of the plural
    possessive's antecedents (no Ubiquitination(QRT55) event; one reg
    per real antecedent)."""
    trips = novel_results["triples"]
    assert _has(trips, "QRT55", "Positive_regulation->Ubiquitination",
                "ZQX741")
    assert _has(trips, "QRT55", "Positive_regulation->Ubiquitination",
                "YWB233")
    assert not any(t["pred"].endswith("Ubiquitination")
                   and "QRT55" in (t["obj"] or "") for t in trips)


def test_comma_gerund_takes_no_entity_controller(novel_results):
    """Wild-PMC r5 tier: a comma-preceded gerund's logical subject is the
    preceding clause — '..., accelerating their degradation' emits the
    DecreaseAmount events but never a regulation with a nearby entity
    (an antecedent sibling) as controller."""
    trips = novel_results["triples"]
    degr = [t for t in trips if "DecreaseAmount" in t["pred"]
            or "Degradation" in t["pred"]]
    assert any("ZQX741" in (t["obj"] or "") for t in degr)
    assert not any(t["subj"] and "KPW412" not in t["subj"]
                   and "ZQX741" in (t["subj"] or "")
                   and "YWB233" in (t["obj"] or "") for t in degr)
    assert not any((t["subj"] or "").startswith(("ZQX741", "YWB233"))
                   for t in degr)


def test_binding_to_never_becomes_destination(novel_results):
    """Wild-PMC r5 tier: 'binding to X' is the binding's partner, never a
    translocation destination — the real destination ('to the nucleus')
    still lands."""
    trans = [t for t in novel_results["triples"]
             if t["pred"].endswith("Translocation")]
    assert any("ZQX741" in (t["obj"] or "") for t in trans)
    assert not any("YWB233" in (t["obj"] or "") for t in trans)


def test_cell_np_head_is_context_not_controller(novel_results):
    """Wild-PMC r5 tier: an entity heading a cell NP ('BQV881 cells
    express endogenous ZQX741') is a context carrier — the Transcription
    fires but the cell line never becomes a regulation controller."""
    trips = novel_results["triples"]
    assert any(t["pred"] == "Transcription"
               and "ZQX741" in (t["obj"] or "") for t in trips)
    assert not any("BQV881" in (t["subj"] or "") for t in trips)


def test_with_participle_is_state_adjective(novel_results):
    """Wild-PMC r5 tier: 'X associates with activated Y' yields the
    Binding only — no spurious activation event with the matrix subject
    as controller."""
    trips = novel_results["triples"]
    bind = [t for t in trips if t["pred"] == "Binding"
            and "ZQX741" in (t["subj"] or "") + (t["obj"] or "")
            and "YWB233" in (t["subj"] or "") + (t["obj"] or "")]
    assert bind
    assert not _has(trips, "ZQX741", "Positive_activation", "YWB233")
