"""[P2] Statistical polarity tests: feature-extraction unit tests,
committed-weights integrity, corpus agreement with the linguistic
polarity tier (the supervision source), double-flip structure (the
trigger-sign x wrapper-parity XOR a linear model only gets through the
interaction features), and the context-only decision property — the
classifier must still read the sign from wrapper context with the
trigger feature removed, which is the role the reference's LSTM plays
(polarity/ml/DeepLearningPolarityClassifier.scala: masked-sequence
input, maskOption "tag_name")."""

import pytest

from reach_spark.polarity_ml import (classify, complex_events,
                                     event_features, polarity_rows)
from reach_spark.resources import entity_dictionary

DICT = entity_dictionary()


def _events(text):
    return complex_events(text, DICT)


class TestFeatures:
    def test_role_masks_hide_argument_tokens(self):
        evs = _events("MEK activates ERK.")
        assert evs
        ev, lemmas, span_of = evs[0]
        feats = event_features(lemmas, ev, span_of)
        # the argument surface forms must not leak into the bag — the
        # masked-input property the reference trainer enforces
        assert "bow=mek" not in feats and "bow=erk" not in feats
        assert any(f.startswith("trig=") for f in feats)

    def test_left_window_cue_counts(self):
        evs = _events("The inhibition of MEK increases ERK activity.")
        assert evs
        ev, lemmas, span_of = evs[0]
        # the regulation whose trigger is 'increases' sees one negative
        # wrapper cue to its left
        reg = next((e for e, l, s in evs
                    if e["trigger_text"].startswith("increas")), None)
        if reg is not None:
            feats = event_features(lemmas, reg, span_of)
            assert "negcue=1" in feats
            assert any(f.startswith("tsignXneg=pos:1") for f in feats)

    def test_tsign_feature(self):
        evs = _events("MEK inhibits ERK.")
        assert evs
        ev, lemmas, span_of = evs[0]
        feats = event_features(lemmas, ev, span_of)
        assert "tsign=neg" in feats


class TestWeightsIntegrity:
    def test_fixture_sha_matches(self):
        """Weights regenerate with the corpus (tools/train_polarity.py) —
        a stale-weights commit fails here."""
        import sys
        sys.path.insert(0, "tools")
        from gen_kg_oracle import fixture_corpus_sha

        from reach_spark import _polarity_weights as PW
        assert PW.FIXTURE_SHA == fixture_corpus_sha()

    def test_weights_are_scaled_ints(self):
        from reach_spark import _polarity_weights as PW
        assert PW.W and all(isinstance(v, int) for v in PW.W.values())


class TestSignStructure:
    def test_plain_positive_and_negative(self):
        rows = polarity_rows("MEK activates ERK.", DICT)
        assert rows and all(ml == "Positive" for _, _, ml, _ in rows)
        rows = polarity_rows("MEK inhibits ERK.", DICT)
        assert rows and all(ml == "Negative" for _, _, ml, _ in rows)

    def test_double_flip_is_positive(self):
        """'inhibition of X decreases Y' composes to Positive — the XOR
        the interaction features exist for."""
        rows = polarity_rows(
            "The inhibition of MEK decreases the phosphorylation of ERK.",
            DICT)
        regs = [r for r in rows if r[0].endswith("_regulation")]
        assert regs
        for lbl, _, ml, agree in regs:
            assert agree, (lbl, ml)

    def test_context_decides_without_trigger(self):
        """Remove the trigger identity: wrapper context alone must carry
        the sign (the trigger-dropped twins in training make this hold) —
        the LSTM-role property."""
        from reach_spark import _polarity_weights as PW

        def ctx_sign(text):
            evs = _events(text)
            assert evs
            ev, lemmas, span_of = evs[0]
            feats = [f for f in event_features(lemmas, ev, span_of)
                     if not f.startswith("trig=")]
            s = sum(PW.W.get(f, 0) for f in feats)
            return "Positive" if s >= 0 else "Negative"

        assert ctx_sign("MEK activates ERK.") == "Positive"
        assert ctx_sign("MEK inhibits ERK.") == "Negative"


class TestCorpusAgreement:
    def test_full_corpus_agreement(self):
        """The committed weights reproduce the linguistic tier's composed
        sign on every regulation/activation in the 810-fixture corpus
        (the training set — this is the regression pin, generalization is
        asserted by the context/double-flip tests above)."""
        from reach_spark.extract import split_sentences
        from reach_spark.fixtures import fixture_sentences

        total = agree = 0
        for text in fixture_sentences():
            for sent in split_sentences(text):
                for _, _, _, ok in polarity_rows(sent, DICT):
                    total += 1
                    agree += int(ok)
        assert total > 400
        assert agree / total >= 0.999, (agree, total)


class TestSparkPath:
    def test_polarity_ml_df(self, spark):
        from pyspark.sql import Row

        from reach_spark.polarity_ml import polarity_ml_df

        texts = ["MEK activates ERK.",
                 "The inhibition of MEK decreases the phosphorylation "
                 "of ERK."]
        docs = spark.createDataFrame(
            [Row(doc_id=str(i),
                 spans=[Row(kind="text", text=t, media_ref="", offset=0)])
             for i, t in enumerate(texts)])
        got = {(r["evt_label"], r["trigger"], r["ml_sign"], r["agree"],
                r["seen"])
               for r in polarity_ml_df(docs).collect()}
        from collections import Counter
        exp = Counter()
        for t in texts:
            for row in polarity_rows(t, DICT):
                exp[row] += 1
        assert got == {k + (v,) for k, v in exp.items()}
