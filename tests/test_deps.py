"""Light dependency layer (N7 down-payment) — reach_spark/deps.py.

Covers the grammar-relevant UD subset censused from the reference's
biogrammar/vars.yml:1-80 (nsubj / nsubjpass / dobj / nmod_of / nmod_by /
conj_and / neg / aux), plus the first consumer: negation detection via
neg edges (NegationHandler.scala:18-41 outgoing-edge check).
"""

from reach_spark.deps import light_deps, neg_cues_for_trigger
from reach_spark.extract import annotate_sentence, extract_sentence
from reach_spark.resources import entity_dictionary

DICT = entity_dictionary()


def _deps(text: str) -> list[tuple[int, int, str]]:
    return annotate_sentence(text)["deps"]


def _has(edges, src_word, dst_word, label, words):
    idx = {w: i for i, w in enumerate(words)}
    return (idx[src_word], idx[dst_word], label) in [tuple(e) for e in edges]


class TestLightDeps:
    def test_active_nsubj_dobj(self):
        ann = annotate_sentence("MEK phosphorylates ERK.")
        assert _has(ann["deps"], "phosphorylates", "MEK", "nsubj", ann["words"])
        assert _has(ann["deps"], "phosphorylates", "ERK", "dobj", ann["words"])

    def test_passive_nsubjpass_and_agent(self):
        ann = annotate_sentence("ERK is phosphorylated by MEK.")
        assert _has(ann["deps"], "phosphorylated", "ERK", "nsubjpass",
                    ann["words"])
        assert _has(ann["deps"], "phosphorylated", "is", "aux", ann["words"])
        # passive agent: nmod_by on the verb (reference agent patterns)
        assert _has(ann["deps"], "phosphorylated", "MEK", "nmod_by",
                    ann["words"])
        # no dobj for the passive
        assert not any(e[2] == "dobj" for e in ann["deps"])

    def test_nmod_of_np_head(self):
        ann = annotate_sentence("Phosphorylation of ASPP2 by MAPK occurs.")
        assert _has(ann["deps"], "Phosphorylation", "ASPP2", "nmod_of",
                    ann["words"])
        assert _has(ann["deps"], "ASPP2", "MAPK", "nmod_by", ann["words"])

    def test_nmod_of_skips_determiner_takes_run_head(self):
        ann = annotate_sentence("TopBP1 inhibits the kinase activity of ATR.")
        # "activity of ATR" — head is the noun left of 'of', dep the NP head
        assert _has(ann["deps"], "activity", "ATR", "nmod_of", ann["words"])

    def test_conj_and(self):
        ann = annotate_sentence("MEK and ERK are kinases.")
        assert _has(ann["deps"], "MEK", "ERK", "conj_and", ann["words"])

    def test_neg_edge_not(self):
        ann = annotate_sentence("TopBP1 does not inhibit ATR.")
        assert _has(ann["deps"], "inhibit", "not", "neg", ann["words"])

    def test_neg_edge_fails_to(self):
        ann = annotate_sentence("RAS fails to activate MEK.")
        # cue token is 'fails'; edge lands on the governed verb
        assert _has(ann["deps"], "activate", "fails", "neg", ann["words"])

    def test_neg_transparent_adverb(self):
        ann = annotate_sentence("RAS does not strongly activate MEK.")
        assert _has(ann["deps"], "activate", "not", "neg", ann["words"])

    def test_no_neg_edge_in_affirmative(self):
        assert not any(e[2] == "neg"
                       for e in _deps("MEK phosphorylates ERK."))

    def test_pure_function_of_annotation(self):
        ann = annotate_sentence("MEK phosphorylates ERK.")
        again = light_deps(ann["words"], ann["tags"], ann["lemmas"])
        assert [tuple(e) for e in ann["deps"]] == [tuple(e) for e in again]

    def test_neg_cues_for_trigger_accepts_dict_rows(self):
        # the sentences table carries deps as {src,dst,label} structs
        deps = [{"src": 3, "dst": 2, "label": "neg"},
                {"src": 3, "dst": 1, "label": "aux"}]
        assert neg_cues_for_trigger(deps, 3) == [2]
        assert neg_cues_for_trigger(deps, 1) == []


class TestNegationViaDeps:
    """detect_negations consumes neg edges (primary) with the surface
    window as fallback — net behavior must match the reference handler."""

    def _events(self, text):
        _, mentions = extract_sentence("d", 0, text, DICT)
        return [m for m in mentions if m["kind"] == "event"]

    @staticmethod
    def _negated(ev):
        return any(m["kind"] == "Negation" for m in ev["mods"])

    def test_negated_event(self):
        evs = self._events("MEK does not phosphorylate ERK.")
        # negation lands on the outermost event over the trigger
        # (regulation wrapper), per DarpaActions negation transfer
        assert evs and any(self._negated(ev) for ev in evs)

    def test_affirmative_event(self):
        evs = self._events("MEK phosphorylates ERK.")
        assert evs and all(not self._negated(ev) for ev in evs)

    def test_double_negative_parity(self):
        # F4 parity: two cues in the same trigger scope cancel
        # (NegationHandler.scala:115-137)
        evs = self._events("MEK does not fail to phosphorylate ERK.")
        assert evs and all(not self._negated(ev) for ev in evs)


def test_ccomp_finite_complement():
    """UD ccomp (vars.yml `complements: xcomp|ccomp` — the finite half):
    matrix verb -> clause verb across the complementizer 'that'."""
    from reach_spark.extract import annotate_sentence
    ann = annotate_sentence("We show that TopBP1 phosphorylates ATR.")
    deps = {(s, d, l) for s, d, l in ann["deps"]}
    w = ann["words"]
    show, phos = w.index("show"), w.index("phosphorylates")
    assert (show, phos, "ccomp") in deps
    # the embedded clause still gets its own subject/object
    assert (phos, w.index("TopBP1"), "nsubj") in deps
    assert (phos, w.index("ATR"), "dobj") in deps


def test_ccomp_not_on_relative_or_purpose_that():
    """'the kinase that phosphorylates X' is a relative clause
    (acl_relcl, noun before 'that'); 'so that' is purpose — neither
    emits ccomp."""
    from reach_spark.extract import annotate_sentence
    ann = annotate_sentence(
        "The kinase that phosphorylates ATR binds TopBP1.")
    assert not any(l == "ccomp" for _s, _d, l in ann["deps"])
    ann2 = annotate_sentence(
        "MEK is degraded so that ERK accumulates.")
    assert not any(l == "ccomp" for _s, _d, l in ann2["deps"])


def test_ccomp_passive_embedded_clause():
    """'We found that Mek was phosphorylated by Erk' — ccomp lands on
    the embedded passive verb."""
    from reach_spark.extract import annotate_sentence
    ann = annotate_sentence("We found that Mek was phosphorylated by Erk.")
    deps = {(s, d, l) for s, d, l in ann["deps"]}
    w = ann["words"]
    assert (w.index("found"), w.index("phosphorylated"), "ccomp") in deps
