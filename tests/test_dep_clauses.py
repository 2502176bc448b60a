"""Out-of-fixture gate for the round-4 clause tier of the dependency
layer (deps.py: xcomp / acl_relcl / acl / appos — the vars.yml:44-68
relations the r3 verdict flagged as unemitted) and the dep-rule families
that consume them (rules/dep_events.yml *_dep_4..7, dep_regulations.yml
*_dep_appos/relcl/xcomp).

Every sentence uses symbols that appear in no fixture and no KB
dictionary (shape-NER territory), so these assert structural
generalization, not memorized surface forms. The fixture-corpus parity
sweep (test_odin_graph.py) separately guarantees the new rules never
contradict the cascade on attested sentences.
"""

import pytest

from reach_spark.deps import light_deps
from reach_spark.extract import annotate_sentence
from reach_spark.odin_graph import default_engine, dep_event_matches
from reach_spark.resources import entity_dictionary

DICT = entity_dictionary()
ENGINE = default_engine()


def _edges(text):
    ann = annotate_sentence(text)
    ws = ann["words"]
    return {(ws[a], ws[b], l)
            for a, b, l in light_deps(ws, ann["tags"], ann["lemmas"])}


def _events(text):
    out = []
    for m in dep_event_matches("d", 0, text, DICT, ENGINE):
        out.append((m.label,
                    {k: tuple(sorted(x["text"] for x in v))
                     for k, v in m.args.items() if v}))
    return out


def _fired(text, label, **roles):
    want = {k: tuple(sorted(v if isinstance(v, (list, tuple)) else [v]))
            for k, v in roles.items()}
    return any(lbl == label and all(args.get(k) == v
                                    for k, v in want.items())
               for lbl, args in _events(text))


# --------------------------------------------------------------------------
# edge emission
# --------------------------------------------------------------------------

class TestClauseEdges:
    def test_relcl_comma_which(self):
        assert ("QRZ9", "binds", "acl_relcl") in _edges(
            "QRZ9, which binds WXV44, is unstable.")

    def test_relcl_bare_that(self):
        assert ("protein", "binds", "acl_relcl") in _edges(
            "The protein that binds WXV44 accumulates.")

    def test_complementizer_that_not_relcl(self):
        assert not any(l == "acl_relcl" for _, _, l in _edges(
            "We show that QRZ9 binds WXV44."))

    def test_xcomp_across_to(self):
        assert ("fails", "phosphorylate", "xcomp") in _edges(
            "QRZ9 fails to phosphorylate WXV44.")

    def test_xcomp_noun_tagged_raising_head_gets_subject(self):
        ed = _edges("QRZ9 continues to degrade WXV44.")
        assert ("continues", "degrade", "xcomp") in ed
        assert ("continues", "QRZ9", "nsubj") in ed

    def test_acl_reduced_relative(self):
        assert ("WXV44", "methylated", "acl") in _edges(
            "WXV44 methylated by QRZ9 accumulates.")

    def test_simple_past_transitive_is_not_acl(self):
        assert not any(l == "acl" for _, _, l in _edges(
            "QRZ9 phosphorylated WXV44."))

    def test_appos_with_determiner(self):
        assert ("QRZ9", "activator", "appos") in _edges(
            "QRZ9, an activator of WXV44, is overexpressed.")

    def test_list_comma_is_not_appos(self):
        assert not any(l == "appos" for _, _, l in _edges(
            "QRZ9, WXV44, and PLM77 bind TKK21."))

    def test_appos_verb_invalidates(self):
        assert not any(l == "appos" for _, _, l in _edges(
            "QRZ9, a target was measured."))


# --------------------------------------------------------------------------
# rule firing on novel symbols — one block per clause relation
# --------------------------------------------------------------------------

class TestRelclRules:
    def test_active_relcl_cause(self):
        assert _fired("QRZ9, which phosphorylates WXV44, is active.",
                      "Phosphorylation", theme="WXV44", cause="QRZ9")

    def test_active_relcl_bare_that(self):
        assert _fired("A kinase that ubiquitinates WXV44 was purified.",
                      "Ubiquitination", theme="WXV44")

    def test_passive_relcl_theme_is_head(self):
        assert _fired("WXV44, which is methylated by QRZ9, accumulates.",
                      "Methylation", theme="WXV44", cause="QRZ9")

    def test_relcl_regulation_event_controlled(self):
        assert _fired(
            "QRZ9, which inhibits the phosphorylation of WXV44, is small.",
            "Negative_regulation", controller="QRZ9")

    def test_relcl_activation_entity_controlled(self):
        assert _fired("QRZ9, which activates WXV44, is conserved.",
                      "Positive_activation",
                      controller="QRZ9", controlled="WXV44")

    def test_relcl_conjoined_theme(self):
        assert _fired("QRZ9, which acetylates WXV44 and PLM77, is rare.",
                      "Acetylation", theme=("PLM77", "WXV44"))


class TestXcompRules:
    def test_raising_verb_cause(self):
        assert _fired("QRZ9 fails to phosphorylate WXV44.",
                      "Phosphorylation", theme="WXV44", cause="QRZ9")

    def test_noun_tagged_raising_head(self):
        assert _fired("QRZ9 continues to sumoylate WXV44.",
                      "Sumoylation", theme="WXV44", cause="QRZ9")

    def test_passive_raising_was_shown_to(self):
        assert _fired("QRZ9 was shown to ubiquitinate WXV44.",
                      "Ubiquitination", theme="WXV44", cause="QRZ9")

    def test_xcomp_activation(self):
        assert _fired("QRZ9 acts to promote WXV44.",
                      "Positive_activation",
                      controller="QRZ9", controlled="WXV44")

    def test_xcomp_regulation_event_controlled(self):
        assert _fired("QRZ9 acts to suppress the methylation of WXV44.",
                      "Negative_regulation", controller="QRZ9")


class TestAclRules:
    def test_reduced_relative_theme_and_agent(self):
        assert _fired("WXV44 phosphorylated by QRZ9 accumulates.",
                      "Phosphorylation", theme="WXV44", cause="QRZ9")

    def test_reduced_relative_with_site(self):
        evs = _events(
            "WXV44 phosphorylated at Ser91 by QRZ9 is degraded.")
        assert any(lbl == "Phosphorylation" and
                   args.get("theme") == ("WXV44",) and
                   "site" in args for lbl, args in evs), evs

    def test_reduced_relative_inside_clause(self):
        assert _fired("We analyzed WXV44 ubiquitinated by QRZ9 in cells.",
                      "Ubiquitination", theme="WXV44", cause="QRZ9")


class TestApposRules:
    def test_appos_positive_agent_nominal(self):
        assert _fired("QRZ9, an activator of WXV44, is overexpressed.",
                      "Positive_activation",
                      controller="QRZ9", controlled="WXV44")

    def test_appos_negative_agent_nominal(self):
        assert _fired("QRZ9, an inhibitor of WXV44, was depleted.",
                      "Negative_activation",
                      controller="QRZ9", controlled="WXV44")

    def test_appos_process_nominal_vetoed(self):
        # "an activation of X" is a process nominal, not an agent —
        # the word-suffix constraint must keep the appos rule silent
        assert not any(lbl.endswith("_activation") for lbl, _ in _events(
            "QRZ9, an activation of WXV44, was measured."))


# --------------------------------------------------------------------------
# cross-checks: the clause tier must not leak into the core shapes
# --------------------------------------------------------------------------

class TestNoRegressions:
    def test_plain_active_unchanged(self):
        assert _fired("QRZ9 phosphorylates WXV44.",
                      "Phosphorylation", theme="WXV44", cause="QRZ9")

    def test_plain_passive_unchanged(self):
        assert _fired("WXV44 is phosphorylated by QRZ9.",
                      "Phosphorylation", theme="WXV44", cause="QRZ9")

    def test_nominal_unchanged(self):
        assert _fired("The phosphorylation of WXV44 by QRZ9 was observed.",
                      "Phosphorylation", theme="WXV44", cause="QRZ9")

    def test_dephospho_never_relcl_phospho(self):
        assert not any(lbl == "Phosphorylation" for lbl, _ in _events(
            "QRZ9, which dephosphorylates WXV44, is active."))
        assert _fired("QRZ9, which dephosphorylates WXV44, is active.",
                      "Dephosphorylation", theme="WXV44", cause="QRZ9")


# --------------------------------------------------------------------------
# round-4 tail: advcl_by / advcl (vars.yml:66 adverbial_clause)
# --------------------------------------------------------------------------

class TestAdvclEdges:
    def test_advcl_by_gerund(self):
        assert ("inhibits", "phosphorylating", "advcl_by") in _edges(
            "QRZ9 inhibits apoptosis by phosphorylating WXV44.")

    def test_by_noun_is_nmod_not_advcl(self):
        assert not any(l == "advcl_by" for _, _, l in _edges(
            "WXV44 is phosphorylated by QRZ9."))

    def test_marker_advcl_sentence_initial(self):
        assert ("inhibited", "depleted", "advcl") in _edges(
            "When QRZ9 is depleted, WXV44 is inhibited.")

    def test_marker_without_comma_no_advcl(self):
        assert not any(l == "advcl" for _, _, l in _edges(
            "When QRZ9 binds WXV44 it is degraded"))

    def test_mid_sentence_marker_not_emitted(self):
        # conservative subset: only sentence-initial subordinators
        assert not any(l == "advcl" for _, _, l in _edges(
            "WXV44 declines when QRZ9 is depleted."))


class TestAdvclByRules:
    def test_gerund_event_with_matrix_subject_cause(self):
        assert _fired("QRZ9 inhibits apoptosis by phosphorylating WXV44.",
                      "Phosphorylation", theme="WXV44", cause="QRZ9")

    def test_gerund_event_novel_symbols(self):
        assert _fired("PLM77 blocks growth by ubiquitinating TKK21.",
                      "Ubiquitination", theme="TKK21", cause="PLM77")

    def test_gerund_of_theme_hop(self):
        # theme reached through the dobj + nmod_of hop from the gerund
        assert _fired(
            "QRZ9 blocks apoptosis by phosphorylating the tail of TKK21.",
            "Phosphorylation", theme="TKK21", cause="QRZ9")

    def test_deprefix_veto_holds_for_gerund(self):
        # deubiquitinating must not fire Ubiquitination through dep_8
        assert not _fired(
            "QRZ9 acts by deubiquitinating WXV44.",
            "Ubiquitination", theme="WXV44")


# --------------------------------------------------------------------------
# round-4 continuation: genitive tier (vars.yml:50 nmod:poss;
# pos/neg-reg_template possessive_noun shapes)
# --------------------------------------------------------------------------

class TestPossessiveEdges:
    def test_poss_edge_simple(self):
        assert ("phosphorylation", "QRZ9's", "nmod_poss") in _edges(
            "QRZ9's phosphorylation of WXV44 was observed.")

    def test_poss_edge_skips_premodifier(self):
        # pos-lite tags unknown premodifiers NN: head = rightmost noun
        assert ("ubiquitination", "QRZ9's", "nmod_poss") in _edges(
            "QRZ9's rapid ubiquitination of WXV44 was reported.")

    def test_no_poss_edge_without_apostrophe(self):
        assert not any(l == "nmod_poss" for _, _, l in _edges(
            "QRZ9 phosphorylation of WXV44 was observed."))


class TestPossessiveNER:
    def test_dictionary_entity_with_clitic(self):
        from reach_spark.extract import annotate_sentence, \
            SentenceExtractor
        ann = annotate_sentence("Raf's phosphorylation of MEK increases.")
        ms = [dict(m) for m in SentenceExtractor("d", 0, ann, DICT).run()]
        assert any(m["text"] == "Raf's" and
                   m["label"] == "Gene_or_gene_product" and
                   m.get("canonical") == "raf" for m in ms)

    def test_stoplist_word_possessive_not_entity(self):
        from reach_spark.extract import annotate_sentence, \
            SentenceExtractor
        ann = annotate_sentence("The cell's growth was normal.")
        ms = [dict(m) for m in SentenceExtractor("d", 0, ann, DICT).run()]
        assert not any(m["text"] == "cell's" for m in ms)


class TestPossessiveRules:
    def test_genitive_cause_on_simple_event(self):
        assert _fired("QRZ9's phosphorylation of WXV44 was observed.",
                      "Phosphorylation", theme="WXV44", cause="QRZ9's")

    def test_genitive_cause_dictionary_entity(self):
        assert _fired("Raf's phosphorylation of MEK increases signaling.",
                      "Phosphorylation", theme="MEK", cause="Raf's")

    def test_genitive_agent_activation(self):
        assert _fired("QRZ9's inhibition of WXV44 was reported.",
                      "Negative_activation",
                      controlled="WXV44", controller="QRZ9's")
        assert _fired("QRZ9's activation of WXV44 was reported.",
                      "Positive_activation",
                      controlled="WXV44", controller="QRZ9's")

    def test_genitive_patient_activation(self):
        assert _fired("QRZ9's inhibition by WXV44 was reported.",
                      "Negative_activation",
                      controlled="QRZ9's", controller="WXV44")

    def test_no_fire_without_possessor(self):
        assert not _fired("The inhibition of WXV44 was reported.",
                          "Negative_activation", controlled="WXV44")

    def test_misattachment_veto_still_active(self):
        # the own-trigger exemption must not weaken the original veto
        from reach_spark.odin_graph import dep_event_matches
        out = [(m.label,
                {k: [x["text"] for x in v] for k, v in m.args.items() if v})
               for m in dep_event_matches(
                   "d", 0, "EGF induced STAT1 phosphorylation.",
                   DICT, ENGINE)]
        assert not any(lbl == "Positive_activation" and
                       args.get("controlled") == ["STAT1"]
                       for lbl, args in out)


class TestNounModifierTier:
    """vars.yml:50 noun_modifiers census (amod|compound|advmod|nmod:poss|
    nummod): the four relations added in round 4's continuation. Novel
    symbols throughout — structural generalization, not memorization."""

    def test_amod_participial_premodifier(self):
        # the PTM-premodifier shape the cascade reads as an entity mod
        assert ("QRZ9", "phosphorylated", "amod") in _edges(
            "The phosphorylated QRZ9 accumulates in the nucleus.")
        assert ("WXV44", "ubiquitinated", "amod") in _edges(
            "Levels of ubiquitinated WXV44 increase.")

    def test_amod_not_on_simple_past(self):
        # noun VBN noun = transitive past, owned by nsubj/dobj
        es = _edges("XKL3 phosphorylated WXV44.")
        assert not any(l == "amod" for _, _, l in es)
        assert ("phosphorylated", "XKL3", "nsubj") in es
        assert ("phosphorylated", "WXV44", "dobj") in es

    def test_compound_entity_head_and_nominal_suffix(self):
        assert ("protein", "KRAS", "compound") in _edges(
            "The KRAS protein binds QRZ9.")
        assert ("kinase", "Raf", "compound") in _edges(
            "The Raf kinase phosphorylates MEK.")
        assert ("receptor", "insulin", "compound") in _edges(
            "The insulin receptor binds XKL3.")

    def test_compound_blocked_on_mistagged_adjectives(self):
        # defaulted-NN adjectives must not become compound modifiers
        es = _edges("Two distinct subunits assemble rapidly.")
        assert not any(l == "compound" for _, _, l in es)
        # and the mis-tagged-verb boundary still breaks the run
        es2 = _edges("MAPK occurs in the cytosol.")
        assert not any(l == "compound" for _, _, l in es2)

    def test_nummod_digit_adjacent(self):
        assert ("sites", "2", "nummod") in _edges(
            "The insulin receptor binds XKL3 at 2 sites.")

    def test_advmod_adjacent_adverb(self):
        assert ("inhibits", "strongly", "advmod") in _edges(
            "XKL3 strongly inhibits WXV44.")
        # 'not' stays with the neg tier
        es = _edges("XKL3 does not inhibit WXV44.")
        assert not any(l == "advmod" for _, _, l in es)

    def test_amod_parity_with_cascade_ptm(self):
        """Corpus property: on out-of-fixture PTM-premodifier sentences
        the participial amod edge and the cascade's PTM entity
        modification tell the SAME story — the dep layer is the
        structural account of the modification the cascade attaches."""
        from reach_spark.extract import extract_sentence
        cases = [("The phosphorylated QRZ9 accumulates.", "QRZ9",
                  "Phosphorylation"),
                 ("Ubiquitinated WXV44 is degraded.", "WXV44",
                  "Ubiquitination"),
                 ("The acetylated PLK9 binds DNA.", "PLK9",
                  "Acetylation")]
        for text, sym, modlabel in cases:
            es = _edges(text)
            assert any(h == sym and l == "amod" for h, _, l in es), text
            _, mentions = extract_sentence("d", 0, text, DICT)
            ent = next(m for m in mentions if m["text"] == sym)
            assert any(mod["kind"] == "PTM" and mod["label"] == modlabel
                       for mod in ent["mods"]), (text, ent["mods"])
