"""[T5] Assembly precedence sieves — TAM classification, the Reichenbach
relation table, the intersentential marker sieve, and sieve composition
(reference: assembly/sieves/Sieves.scala:94-260, Constraints.scala:43-190,
grammars/tense_aspect.yml, grammars/intersentential.yml)."""

import pytest
from pyspark.sql import Row

from reach_spark.pipeline import extract_dataframe


def _doc(spark, did, sents):
    spans = [{"kind": "text", "text": s, "media_ref": "", "offset": i}
             for i, s in enumerate(sents)]
    return spark.createDataFrame([Row(doc_id=did, spans=spans)])


def test_reichenbach_past_perfect_before_present(spark):
    """'had phosphorylated' (PastTense+Perfective) precedes 'activates'
    (PresentTense+none): Sieves.scala:224 table row -> before."""
    docs = _doc(spark, "t5a", ["MEK had phosphorylated ASPP2.",
                               "MEK activates Ras."])
    res = extract_dataframe(spark, docs, with_coref=False)
    rows = res["precedence"].collect()
    # the controlled Phosphorylation rolls into the regulation EER
    # (Positive_regulation->Phosphorylation); that EER precedes
    assert any(r["sieve"] == "reichenbachPrecedence" and
               r["before_pred"].endswith("Phosphorylation") and
               r["after_pred"] == "Positive_activation" for r in rows), rows


def test_reichenbach_future_after_past(spark):
    """'will phosphorylate' (FutureTense) AFTER a past event — textual
    order e1 < e2 but the relation flips (table: Future/none vs Past/none
    -> after)."""
    docs = _doc(spark, "t5b", ["MEK will phosphorylate ASPP2.",
                               "MEK ubiquitinated Ras."])
    res = extract_dataframe(spark, docs, with_coref=False)
    rows = res["precedence"].collect()
    hit = [r for r in rows if r["sieve"] == "reichenbachPrecedence"]
    assert hit and all(r["before_pred"] != "Phosphorylation" or
                       not r["before_obj"].startswith("ASPP2")
                       for r in hit), rows


def test_no_relation_same_tam(spark):
    """Two simple-present events: the table has no (Present, none,
    Present, none) row -> no precedence (the reference emits nothing
    rather than guessing from textual order)."""
    docs = _doc(spark, "t5c", ["MEK phosphorylates ASPP2.",
                               "MEK ubiquitinates Ras."])
    res = extract_dataframe(spark, docs, with_coref=False)
    assert not res["precedence"].collect()


def test_intersentential_marker_with_shared_participant(spark):
    """'Consequently, ...' opening the later sentence + a shared
    participant -> marker sieve precedence (intersentential.yml
    cross-sentence-consequently)."""
    docs = _doc(spark, "t5d", ["MEK phosphorylates ASPP2.",
                               "Consequently, ASPP2 binds Ras."])
    res = extract_dataframe(spark, docs, with_coref=False)
    rows = res["precedence"].collect()
    assert any(r["sieve"] == "intersententialMarker" and
               r["before_pred"].endswith("Phosphorylation") and
               r["after_pred"] == "Binding" for r in rows), rows


def test_marker_requires_shared_participant(spark):
    """Same opener, but no shared argument between the two events ->
    the marker sieve stays silent (the anchoring constraint)."""
    docs = _doc(spark, "t5e", ["MEK phosphorylates ASPP2.",
                               "Consequently, Akt binds Raf."])
    res = extract_dataframe(spark, docs, with_coref=False)
    assert not [r for r in res["precedence"].collect()
                if r["sieve"] == "intersententialMarker"]


def test_marker_wins_over_reichenbach(spark):
    """noExistingPrecedence (Constraints.scala:43-66): when both sieves
    decide the same pair, only the earlier sieve's row survives."""
    docs = _doc(spark, "t5f", ["MEK had phosphorylated ASPP2.",
                               "Consequently, ASPP2 binds Ras."])
    res = extract_dataframe(spark, docs, with_coref=False)
    rows = res["precedence"].collect()
    pairs = {}
    for r in rows:
        key = (r["before_pred"], r["after_pred"])
        pairs.setdefault(key, set()).add(r["sieve"])
    for sieves in pairs.values():
        assert len(sieves) == 1  # one sieve per decided pair


def test_regulation_not_paired_with_its_controlled(spark):
    """isValidRelationPair (Constraints.scala:149-190): a regulation and
    its own controlled event never form a precedence pair."""
    docs = _doc(spark, "t5g", ["MEK had phosphorylated ASPP2."])
    res = extract_dataframe(spark, docs, with_coref=False)
    # the sentence yields Phosphorylation + a Positive_regulation over it;
    # they must not precede one another
    assert not res["precedence"].collect()


@pytest.mark.parametrize("sentence,before,after", [
    # intrasentence-surface-prep-before (intrasentential.yml:118-124)
    ("MEK is ubiquitinated before the phosphorylation of ASPP2.",
     "Ubiquitination", "Phosphorylation"),
    # intrasentence-surface-prep-after
    ("MEK is ubiquitinated following the phosphorylation of ASPP2.",
     "Phosphorylation", "Ubiquitination"),
    # intrasentence-surface-as-a-result-of
    ("ASPP2 is phosphorylated as a result of the ubiquitination of MEK.",
     "Ubiquitination", "Phosphorylation"),
    # intrasentence-surface-resulting-in
    ("MEK is degraded , resulting in the ubiquitination of Ras .",
     "DecreaseAmount", "Ubiquitination"),
])
def test_intrasentential_markers(spark, sentence, before, after):
    docs = _doc(spark, f"t5i{abs(hash(sentence)) % 1000}", [sentence])
    res = extract_dataframe(spark, docs, with_coref=False)
    rows = res["precedence"].collect()
    assert any(r["sieve"] == "intrasententialMarker" and
               r["before_pred"].endswith(before) and
               r["after_pred"].endswith(after) for r in rows), rows


def test_intrasentential_semicolon(spark):
    """intrasentence-surface-semicolon: events within 3 tokens on each
    side of ';' order left-before-right."""
    docs = _doc(spark, "t5sc",
                ["MEK phosphorylates ASPP2 ; ASPP2 ubiquitinates Ras ."])
    res = extract_dataframe(spark, docs, with_coref=False)
    rows = res["precedence"].collect()
    assert any(r["sieve"] == "intrasententialMarker" and
               r["before_pred"].endswith("Phosphorylation") and
               r["after_pred"].endswith("Ubiquitination") for r in rows), rows


def test_no_intrasentential_without_marker(spark):
    """Plain coordination carries no precedence marker -> the intra sieve
    stays silent."""
    docs = _doc(spark, "t5nm",
                ["MEK phosphorylates ASPP2 and ubiquitinates Ras."])
    res = extract_dataframe(spark, docs, with_coref=False)
    assert not [r for r in res["precedence"].collect()
                if r["sieve"] == "intrasententialMarker"]


@pytest.mark.parametrize("sentence,theme,controller", [
    ("MEK had phosphorylated ASPP2.", "ASPP2", "MEK"),
    ("ASPP2 has ubiquitinated Ras.", "Ras", "ASPP2"),
])
def test_perfect_active_voice(spark, sentence, theme, controller):
    """'A has/had VBN B' is ACTIVE past/present-perfect (theme=B), not a
    passive — the have-auxiliaries are transparent to the passive rule
    (tense_aspect.yml separates aux lemma=have from the be-chain)."""
    from reach_spark.extract import extract_sentence
    from reach_spark.resources import entity_dictionary
    _, ms = extract_sentence("d", 0, sentence, entity_dictionary())
    evs = {m["label"]: m for m in ms if m["kind"] == "event"}
    simple = [m for m in ms if m["kind"] == "event"
              and not m["label"].endswith("regulation")]
    assert simple and simple[0]["args"][0]["text"] == theme
    reg = evs.get("Positive_regulation")
    assert reg is not None
    ctrl = [a for a in reg["args"] if a["role"] == "controller"]
    assert ctrl and ctrl[0]["text"] == controller
