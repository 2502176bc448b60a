"""[N5] Statistical NER tests: Viterbi decoder unit tests, committed-
weights integrity, corpus agreement with the rule/dictionary NER tier
(the supervision source), and generalization to surface forms neither
the dictionary nor the fixtures contain — the property that makes the
statistical tier worth having over pure longest-match (reference:
processors/.../bionlp/ner/CRFNER.scala two-tier design)."""

import pytest

from reach_spark.crf import (crf_rows, decode_entities, token_features,
                             viterbi, word_shape)


class TestShapeAndFeatures:
    def test_word_shape(self):
        assert word_shape("Mdm2") == "Xxd"
        assert word_shape("GFP") == "X"
        assert word_shape("p53") == "xd"
        assert word_shape("alpha-helix") == "x-x"

    def test_features_context(self):
        f = token_features(["MEK", "binds", "ERK"], ["NN", "VBZ", "NN"], 1)
        assert "w=binds" in f and "pw=mek" in f and "nw=erk" in f


class TestViterbi:
    def test_emission_only(self):
        W = {"w=a": {"B-X": 10}, "w=b": {"O": 10}}
        path = viterbi(["a", "b"], ["NN", "NN"], W, {}, ["B-X", "I-X", "O"])
        assert path == ["B-X", "O"]

    def test_transition_breaks_tie(self):
        # emissions tie between I-X and O on token 2; transition B-X>I-X
        # must win
        W = {"w=a": {"B-X": 10}}
        T = {"B-X>I-X": 5}
        path = viterbi(["a", "b"], ["NN", "NN"], W, T, ["B-X", "I-X", "O"])
        assert path == ["B-X", "I-X"]

    def test_decode_spans_bio(self):
        from reach_spark import _crf_weights as CW
        assert set(CW.LABELS) >= {"O", "B-Gene_or_gene_product",
                                  "I-Gene_or_gene_product"}


class TestWeightsIntegrity:
    def test_fixture_sha_matches(self):
        """Weights regenerate with the corpus (tools/train_crf.py) — a
        stale-weights commit fails here."""
        import sys
        sys.path.insert(0, "tools")
        from gen_kg_oracle import fixture_corpus_sha

        from reach_spark import _crf_weights as CW
        assert CW.FIXTURE_SHA == fixture_corpus_sha()

    def test_weights_are_scaled_ints(self):
        from reach_spark import _crf_weights as CW
        assert all(isinstance(v, int)
                   for row in list(CW.W.values())[:50]
                   for v in row.values())


class TestCorpusAgreement:
    def test_token_agreement_with_rule_ner(self):
        """≥0.97 token-level BIO agreement with the rule NER tier over
        every fixture sentence (the trainer's own gold)."""
        from reach_spark.extract import (SentenceExtractor,
                                         annotate_sentence, split_sentences)
        from reach_spark.fixtures import fixture_sentences
        from reach_spark.resources import entity_dictionary

        dictionary = entity_dictionary()
        ok = tok = 0
        for text in fixture_sentences():
            for sent in split_sentences(text):
                ann = annotate_sentence(sent)
                ex = SentenceExtractor("d", 0, ann, dictionary)
                ents = [m for m in ex.run() if m["kind"] == "tbm"]
                gold = ["O"] * len(ann["words"])
                for m in sorted(ents, key=lambda m: m["start"] - m["end"]):
                    if all(t == "O" for t in gold[m["start"]:m["end"]]):
                        gold[m["start"]] = "B-" + m["label"]
                        for i in range(m["start"] + 1, m["end"]):
                            gold[i] = "I-" + m["label"]
                spans = decode_entities(ann["words"], ann["tags"])
                pred = ["O"] * len(ann["words"])
                for s, e, lab in spans:
                    pred[s] = "B-" + lab
                    for i in range(s + 1, e):
                        pred[i] = "I-" + lab
                ok += sum(1 for g, p in zip(gold, pred) if g == p)
                tok += len(gold)
        assert tok > 9000
        assert ok / tok >= 0.97, (ok, tok)


class TestGeneralization:
    """Novel surface forms — in no dictionary and no fixture — must be
    recovered through shape/affix/context features."""

    def _labels(self, sent):
        return {(t, lab) for lab, _s, _e, t in crf_rows(sent)}

    def test_novel_gene_symbols(self):
        got = self._labels("ZNF143 phosphorylates QRX7 at Ser99 .")
        assert ("ZNF143", "Gene_or_gene_product") in got
        assert ("QRX7", "Gene_or_gene_product") in got
        assert ("Ser99", "Site") in got

    def test_novel_chemical_suffix(self):
        got = self._labels("Treatment with rapamycin inhibited mTORC1 .")
        assert ("rapamycin", "Simple_chemical") in got

    def test_plain_words_stay_o(self):
        assert self._labels("The results were very interesting .") == set()
