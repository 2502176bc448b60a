"""[O2] Dependency-pattern engine tests: path compiler + VM unit tests,
canonical sentence extraction through the YAML rules, the faithful
ModificationTrigger / ubiquitin-veto semantics, and the corpus-wide parity
sweep against the surface cascade over every ported fixture sentence."""

import pytest

from reach_spark.odin_graph import (GraphArg, GraphRule, GraphRuleEngine,
                                    compile_path, dep_event_matches,
                                    default_engine, index_edges,
                                    load_graph_rules, run_path,
                                    token_fields)
from reach_spark.odin import TokenRule
from reach_spark.resources import entity_dictionary

DICT = entity_dictionary()


def _reach(path, deps, start, words=None, tags=None):
    words = words or [f"w{i}" for i in range(10)]
    fields = token_fields(words, tags or [""] * len(words))
    prog, pc = compile_path(path)
    out_e, in_e = index_edges(deps)
    return run_path(prog, pc, start, out_e, in_e, fields)


class TestPathVM:
    DEPS = [(1, 0, "nsubj"), (1, 2, "dobj"), (2, 4, "nmod_of"),
            (2, 3, "conj_and"), (5, 1, "advcl")]

    def test_single_outgoing_step(self):
        assert _reach(">dobj", self.DEPS, 1) == {2}

    def test_bare_label_is_outgoing(self):
        assert _reach("dobj", self.DEPS, 1) == {2}

    def test_incoming_step(self):
        assert _reach("<nsubj", self.DEPS, 0) == {1}

    def test_regex_label(self):
        assert _reach(">/^nmod/", self.DEPS, 2) == {4}

    def test_wildcard_steps(self):
        assert _reach(">>", self.DEPS, 1) == {0, 2}
        assert _reach("<<", self.DEPS, 1) == {5}

    def test_sequence(self):
        assert _reach(">dobj >nmod_of", self.DEPS, 1) == {4}

    def test_alternation(self):
        assert _reach(">dobj (>nmod_of | >conj_and)", self.DEPS, 1) == {3, 4}

    def test_optional_quantifier(self):
        assert _reach(">dobj >conj_and?", self.DEPS, 1) == {2, 3}

    def test_bounded_quantifier_open_low(self):
        # {,2} — zero, one, or two hops
        assert _reach(">dobj (>nmod_of | >conj_and){,2}", self.DEPS, 1) \
            == {2, 3, 4}

    def test_star_terminates_on_cycle(self):
        cyc = [(0, 1, "conj_and"), (1, 0, "conj_and")]
        assert _reach(">conj_and*", cyc, 0) == {0, 1}

    def test_node_constraint_filters(self):
        words = ["a", "by", "c"]
        deps = [(0, 1, "x"), (0, 2, "x")]
        fields = token_fields(words, [""] * 3)
        prog, pc = compile_path('>x [word=by]')
        out_e, in_e = index_edges(deps)
        assert run_path(prog, pc, 0, out_e, in_e, fields) == {1}

    def test_unclosed_group_raises(self):
        with pytest.raises(ValueError):
            compile_path("(>dobj")


class TestEngineDispatch:
    def _engine(self):
        trig = TokenRule(name="t", label="Ev", pattern_src="[word=eats]")
        arg = GraphArg(name="theme", label="Food", required=True,
                       path_src=">dobj")
        return GraphRuleEngine([GraphRule(
            name="r", label="Ev", trigger=trig, args=[arg])])

    def test_required_arg_gates_match(self):
        eng = self._engine()
        words = ["Sam", "eats", "pie"]
        mentions = [{"start": 2, "end": 3, "label": "Food", "text": "pie"}]
        ms = eng.match_sentence(words, [""] * 3, None,
                                [(1, 2, "dobj")], mentions)
        assert len(ms) == 1 and ms[0].args["theme"][0]["text"] == "pie"
        # no dep edge → required theme unresolvable → no match
        assert eng.match_sentence(words, [""] * 3, None, [], mentions) == []

    def test_longest_covering_mention_wins(self):
        eng = self._engine()
        words = ["Sam", "eats", "apple", "pie"]
        mentions = [
            {"start": 3, "end": 4, "label": "Food", "text": "pie"},
            {"start": 2, "end": 4, "label": "Food", "text": "apple pie"},
        ]
        ms = eng.match_sentence(words, [""] * 4, None,
                                [(1, 3, "dobj")], mentions)
        assert [m["text"] for m in ms[0].args["theme"]] == ["apple pie"]


class TestDepEventRules:
    """The YAML rules over real sentences (light deps + NER + cascade
    pseudo-mentions through dep_event_matches)."""

    def _events(self, text):
        out = []
        for gm in dep_event_matches("d", 0, text, DICT):
            out.append((gm.rule.label,
                        tuple(sorted(m["text"]
                                     for m in gm.args.get("theme", []))),
                        tuple(sorted(m["text"]
                                     for m in gm.args.get("cause", []))),
                        tuple(sorted(m["text"]
                                     for m in gm.args.get("site", [])))))
        return out

    def test_active_verb_with_site(self):
        assert self._events("MEK phosphorylates ERK on serine 21 .") == [
            ("Phosphorylation", ("ERK",), ("MEK",), ("serine 21",))]

    def test_passive_verb_by_agent_site(self):
        assert self._events("ERK is phosphorylated by MEK at Ser21 .") == [
            ("Phosphorylation", ("ERK",), ("MEK",), ("Ser21",))]

    def test_nominal_of_by(self):
        assert self._events(
            "The phosphorylation of ASPP2 by MAPK is rapid .") == [
            ("Phosphorylation", ("ASPP2",), ("MAPK",), ())]

    def test_conjoined_themes(self):
        assert self._events("MEK ubiquitinates ERK and AKT .") == [
            ("Ubiquitination", ("AKT", "ERK"), ("MEK",), ())]

    def test_modification_trigger_excluded(self):
        # participle premodifier is an entity mod, not a Ubiquitination
        # event (simple-event_template.yml !mention=ModificationTrigger);
        # the activation from the real verb still fires
        evs = self._events("Ubiquitinated Ras activates Raf and PI3K .")
        assert all(lbl != "Ubiquitination" for lbl, *_ in evs)

    def test_ubiquitin_veto_kills_whole_event(self):
        # TestUbiquitination: ubiquitin can never fill a role
        assert self._events("Ubiquitin ubiquitinates beta-catenin .") == []

    def test_dephospho_not_matched_as_phospho(self):
        evs = self._events("MEK dephosphorylates ERK .")
        assert all(lbl != "Phosphorylation" for lbl, *_ in evs)

    def test_family_templating_instantiates_all(self):
        eng = default_engine()
        labels = {r.label for r in eng.rules}
        assert {"Phosphorylation", "Ubiquitination", "Sumoylation",
                "Glycosylation", "Acetylation", "Farnesylation",
                "Ribosylation", "Methylation", "Hydroxylation",
                "Positive_regulation", "Negative_regulation",
                "Positive_activation", "Negative_activation"} <= labels
        # 21 simple/de-/transcription families × 8 shapes (3 core + the
        # round-4 clause tier: relcl-active/relcl-passive/xcomp/acl +
        # advcl_by — the by-gerund adverbial clause)
        # + 2 signs × 11 reg/act shapes (4 core + appos/relcl×2/xcomp×2
        # + the genitive tier poss_agent/poss_patient)
        # + 3 binding + 4 translocation
        assert "Binding" in labels
        assert "Translocation" in labels
        assert "Dephosphorylation" in labels
        assert len(eng.rules) == 21 * 8 + 2 * 11 + 3 + 4


class TestRegulationDepRules:
    """Regulation/activation dependency rules (rules/dep_regulations.yml —
    pos-reg/neg-reg template re-expression) + the Reach-binding postpass
    arbitration (_reach_postpass)."""

    def _events(self, text):
        out = []
        for gm in dep_event_matches("d", 0, text, DICT):
            if not gm.label.endswith(("_regulation", "_activation")):
                continue
            out.append((gm.label,
                        tuple(sorted((m["label"], m["text"]) for m in
                                     gm.args.get("controlled", []))),
                        tuple(sorted(m["text"] for m in
                                     gm.args.get("controller", [])))))
        return out

    def test_active_regulation_of_event(self):
        assert self._events("MEK inhibits the phosphorylation of ERK .") \
            == [("Negative_regulation",
                 (("Phosphorylation", "phosphorylation"),), ("MEK",))]

    def test_passive_regulation_climbs_of_theme(self):
        assert self._events(
            "The phosphorylation of ERK was inhibited by MEK .") == [
            ("Negative_regulation",
             (("Phosphorylation", "phosphorylation"),), ("MEK",))]

    def test_active_activation_of_entity(self):
        assert self._events("MEK activates ERK and AKT .") == [
            ("Positive_activation",
             (("Gene_or_gene_product", "AKT"),
              ("Gene_or_gene_product", "ERK")), ("MEK",))]

    def test_wrapper_sign_flip(self):
        # negative noun wrapper on the controller flips the sign
        # (cascade wrapper-sign composition)
        evs = self._events(
            "The inhibition of ASPP1 increases the phosphorylation "
            "of ASPP2 .")
        assert ("Negative_regulation",
                (("Phosphorylation", "phosphorylation"),),
                ("ASPP1",)) in evs

    def test_self_activation_vetoed(self):
        assert self._events("MEK activates MEK .") == []

    def test_event_nominal_compound_not_activation(self):
        # "STAT1 phosphorylation" — STAT1 is the nominal's theme, not an
        # activation target
        assert all(lbl.endswith("_regulation")
                   for lbl, *_ in self._events(
                       "FGFR3 causes STAT1 phosphorylation ."))

    def test_subjectless_participle_not_regulation(self):
        # "elevated phosphorylation" is an amount premodifier, not a reg
        assert self._events(
            "We detected elevated phosphorylation of K-Ras .") == []

    def test_regulation_beats_activation_same_trigger(self):
        evs = self._events("MEK inhibits the phosphorylation of ERK .")
        assert all(lbl.endswith("_regulation") for lbl, *_ in evs)


class TestBindingDepRules:
    """Binding dependency rules (rules/dep_bindings.yml — bind_events.yml
    core shapes) + the postpass binding arbitration."""

    def _bindings(self, text):
        return [tuple(sorted(m["text"] for m in gm.args.get("theme", [])))
                for gm in dep_event_matches("d", 0, text, DICT)
                if gm.label == "Binding"]

    def test_active_two_sided(self):
        assert self._bindings("p53 binds Mdm2 .") == [("Mdm2", "p53")]

    def test_to_phrase_and_conjunction(self):
        assert self._bindings("Raf and PI3K bind to K-Ras .") == [
            ("K-Ras", "PI3K", "Raf")]

    def test_nominal_of_to(self):
        assert self._bindings("The binding of p53 to Mdm2 is strong .") \
            == [("Mdm2", "p53")]

    def test_nominal_between(self):
        assert self._bindings(
            "The interaction between p53 and Mdm2 is weak .") == [
            ("Mdm2", "p53")]

    def test_self_binding_vetoed(self):
        assert self._bindings("AKT binds AKT .") == []

    def test_single_theme_vetoed(self):
        assert self._bindings("The AKT binding was successful .") == []

    def test_ubiquitin_partner_vetoed(self):
        assert self._bindings("Ras binds to ubiquitin .") == []

    def test_promoter_compound_not_partner(self):
        assert self._bindings("RB1 binds the BCL2 promoter .") == []


class TestTranslocationDepRules:
    """Translocation dependency rules (rules/dep_translocations.yml —
    translocation_events.yml core shapes): theme + source/destination
    locations, location-required postpass (mkTranslocation)."""

    def _trans(self, text):
        return [(tuple(sorted(m["text"] for m in gm.args.get("theme", []))),
                 tuple(sorted(m["text"] for m in gm.args.get("source", []))),
                 tuple(sorted(m["text"]
                              for m in gm.args.get("destination", []))))
                for gm in dep_event_matches("d", 0, text, DICT)
                if gm.label == "Translocation"]

    def test_intransitive_destination(self):
        assert self._trans("ASPP2 translocates to the nucleus .") == [
            (("ASPP2",), (), ("nucleus",))]

    def test_passive_from_to(self):
        assert self._trans(
            "p53 is translocated from the cytosol to the nucleus .") == [
            (("p53",), ("cytosol",), ("nucleus",))]

    def test_nominal_of_to(self):
        assert self._trans(
            "The translocation of p53 to the nucleus is rapid .") == [
            (("p53",), (), ("nucleus",))]

    def test_nominal_export_from(self):
        assert self._trans(
            "The export of p53 from the nucleus to the cytoplasm .") == [
            (("p53",), ("nucleus",), ("cytoplasm",))]

    def test_transitive_into(self):
        assert self._trans(
            "The importin complex transports p53 into the nucleus .") == [
            (("p53",), (), ("nucleus",))]

    def test_location_required(self):
        # no source and no destination → postpass drops the match
        assert self._trans("ASPP2 translocates rapidly .") == []


class TestNewSimpleFamilies:
    """De-modification / Hydrolysis / Transcription families added as
    dep_events.yml data (simple-event-auto_template reverse events,
    hydrolysis_events.yml, transcription_events.yml)."""

    def _events(self, text, label):
        return [(tuple(sorted(m["text"] for m in gm.args.get("theme", []))),
                 tuple(sorted(m["text"] for m in gm.args.get("cause", []))))
                for gm in dep_event_matches("d", 0, text, DICT)
                if gm.label == label]

    def test_dephosphorylation_active(self):
        assert self._events("MEK dephosphorylates ERK .",
                            "Dephosphorylation") == [(("ERK",), ("MEK",))]
        # and the base family must NOT fire on the de- form
        assert self._events("MEK dephosphorylates ERK .",
                            "Phosphorylation") == []

    def test_dephosphorylation_nominal(self):
        assert self._events("The dephosphorylation of ERK by MEK .",
                            "Dephosphorylation") == [(("ERK",), ("MEK",))]

    def test_deubiquitination_passive(self):
        assert self._events("Ras is deubiquitinated by USP8 .",
                            "Deubiquitination") == [(("Ras",), ("USP8",))]

    def test_hydrolysis_irregular_nominal(self):
        assert self._events("The hydrolysis of PIP3 is fast .",
                            "Hydrolysis") == [(("PIP3",), ())]

    def test_transcription_passive_expression(self):
        assert self._events("ASPP2 is expressed in cells .",
                            "Transcription") == [(("ASPP2",), ())]

    def test_vbn_active_requires_subject(self):
        # simple past with a subject: active reading fires (the bare
        # "MEK phosphorylated ERK" form is owned by the cascade's
        # premodifier ModificationTrigger marking, faithfully excluded)
        assert self._events("MEK phosphorylated the ERK protein .",
                            "Phosphorylation") == [(("ERK",), ("MEK",))]
        # subject-less premodifier participle with a dobj-looking NP:
        # no active reading ("the ubiquitinated subfraction of X")
        evs = self._events(
            "the ubiquitinated subfraction of G12V-K-Ras was purified .",
            "Ubiquitination")
        assert evs == []


class TestCorpusParity:
    """Corpus-wide agreement with the surface cascade over every ported
    fixture sentence: the dependency path is the structural account, the
    cascade the regression-tuned recall surface, so (almost) every
    dep-rule event must also be found by the cascade. The thresholds
    leave room only for the documented span-granularity residue (the
    cascade splits mutant-prefixed spans: 'G12V-K-BEF' vs 'BEF')."""

    def test_theme_and_cause_parity(self):
        from reach_spark.fixtures import fixture_sentences
        from reach_spark.extract import extract_sentence

        dep_events = ok_theme = cause_claims = ok_cause = 0
        n_reg = ok_reg = n_act = ok_act = 0
        for text in fixture_sentences():
            gms = dep_event_matches("d", 0, text, DICT)
            if not gms:
                continue
            _, mentions = extract_sentence("d", 0, text, DICT)
            surface = [m for m in mentions if m.get("kind") == "event"]
            for gm in gms:
                lbl = gm.label
                ctrls = {m["text"]
                         for m in gm.args.get("controller", [])}
                if lbl.endswith("_regulation"):
                    n_reg += 1
                    clab = {m["label"]
                            for m in gm.args.get("controlled", [])}
                    surf = {(a2["target_label"], a1["text"])
                            for ev in surface if ev["label"] == lbl
                            for a1 in ev["args"]
                            if a1["role"] == "controller"
                            for a2 in ev["args"]
                            if a2["role"] == "controlled"}
                    surf_nc = {a2["target_label"] for ev in surface
                               if ev["label"] == lbl
                               for a2 in ev["args"]
                               if a2["role"] == "controlled"}
                    ok_reg += (all(any(s == (cl, ct) for s in surf)
                                   for cl in clab for ct in ctrls)
                               if ctrls else clab <= surf_nc)
                    continue
                if lbl.endswith("_activation"):
                    n_act += 1
                    cts = {m["text"]
                           for m in gm.args.get("controlled", [])}
                    surf = {(a2["text"], a1["text"])
                            for ev in surface if ev["label"] == lbl
                            for a1 in ev["args"]
                            if a1["role"] == "controller"
                            for a2 in ev["args"]
                            if a2["role"] == "controlled"}
                    surf_nc = {a2["text"] for ev in surface
                               if ev["label"] == lbl
                               for a2 in ev["args"]
                               if a2["role"] == "controlled"}
                    ok_act += (all(any(s == (c, ct) for s in surf)
                                   for c in cts for ct in ctrls)
                               if ctrls else cts <= surf_nc)
                    continue
                dep_events += 1
                themes = {m["text"] for m in gm.args.get("theme", [])}
                causes = {m["text"] for m in gm.args.get("cause", [])}
                surf_themes = {a["text"] for ev in surface
                               if ev["label"] == lbl
                               for a in ev["args"] if a["role"] == "theme"}
                if themes <= surf_themes:
                    ok_theme += 1
                if causes:
                    cause_claims += 1
                    surf_ctrl = {
                        a["text"] for ev in surface
                        if ev["label"].endswith(("_regulation",
                                                 "_activation"))
                        for a in ev["args"] if a["role"] == "controller"}
                    if causes <= surf_ctrl:
                        ok_cause += 1
        # non-vacuous: the dep grammar must actually fire across the corpus
        assert dep_events >= 150, dep_events
        assert cause_claims >= 50, cause_claims
        assert n_reg >= 10 and n_act >= 10, (n_reg, n_act)
        assert ok_theme / dep_events >= 0.97, (ok_theme, dep_events)
        assert ok_cause / cause_claims >= 0.99, (ok_cause, cause_claims)
        # reg/activation rules are precision-first: everything claimed
        # must agree with the cascade (measured 12/12 and 15/15)
        assert ok_reg / n_reg >= 0.99, (ok_reg, n_reg)
        assert ok_act / n_act >= 0.99, (ok_act, n_act)
