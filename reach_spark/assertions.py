"""Python re-implementation of the reference assertion helpers
(main/src/test/scala/org/clulab/reach/TestUtils.scala:119-257): label match +
argument-text containment. Used by pytest and the P/R measurement."""

from __future__ import annotations

from .resources import label_closure


def _matches(m: dict, label: str) -> bool:
    return label in m.get("labels", [m.get("label")])


def _arg_texts(m: dict, role: str) -> list[str]:
    return [a["text"] for a in m.get("args", []) if a["role"] == role]


def has_event_with_arguments(label: str, arg_texts: list[str],
                             mentions: list[dict]) -> bool:
    """hasEventWithArguments (TestUtils.scala:119-143): an event matching
    `label` whose argument texts contain each requested text."""
    for m in mentions:
        if m.get("kind") != "event" or not _matches(m, label):
            continue
        all_args = [a["text"] for a in m.get("args", [])]
        if all(any(want in got or got in want for got in all_args)
               for want in arg_texts):
            return True
    return False


def has_entity(text: str, mentions: list[dict]) -> bool:
    return any(m.get("kind") == "tbm" and
               (text in m["text"] or m["text"] in text)
               for m in mentions)


def _has_reg(polarity_label: str, controller: str, controlled_label: str,
             arg_texts: list[str], mentions: list[dict]) -> bool:
    """hasPositiveRegulationByEntity / hasNegativeRegulationByEntity
    (TestUtils.scala:179-221)."""
    by_id = {m["mention_id"]: m for m in mentions}
    for m in mentions:
        if not _matches(m, polarity_label):
            continue
        ctrls = _arg_texts(m, "controller")
        if not any(controller in c or c in controller for c in ctrls):
            continue
        for a in m.get("args", []):
            if a["role"] != "controlled":
                continue
            ev = by_id.get(a["mention_id"])
            if ev is None or not _matches(ev, controlled_label):
                continue
            got = [x["text"] for x in ev.get("args", [])]
            if all(any(w in g or g in w for g in got) for w in arg_texts):
                return True
    return False


def has_positive_regulation_by_entity(controller, controlled_label,
                                      arg_texts, mentions) -> bool:
    return _has_reg("Positive_regulation", controller, controlled_label,
                    arg_texts, mentions)


def has_negative_regulation_by_entity(controller, controlled_label,
                                      arg_texts, mentions) -> bool:
    return _has_reg("Negative_regulation", controller, controlled_label,
                    arg_texts, mentions)


def _has_act(label: str, controller: str, controlled: str,
             mentions: list[dict]) -> bool:
    for m in mentions:
        if not _matches(m, label):
            continue
        ctrls = _arg_texts(m, "controller")
        ctlds = _arg_texts(m, "controlled")
        if any(controller in c or c in controller for c in ctrls) and \
                any(controlled in c or c in controlled for c in ctlds):
            return True
    return False


def has_positive_activation(controller, controlled, mentions) -> bool:
    return _has_act("Positive_activation", controller, controlled, mentions)


def has_negative_activation(controller, controlled, mentions) -> bool:
    return _has_act("Negative_activation", controller, controlled, mentions)


def count_label(label: str, mentions: list[dict]) -> int:
    """Taxonomy-closure count, mirroring `mentions filter (_ matches X)`
    (TestUtils usage; SURVEY §1.4)."""
    return sum(1 for m in mentions
               if m.get("kind") in ("event", "relation") and
               _matches(m, label))


def has_negated(label: str, mentions: list[dict]) -> bool:
    return any(_matches(m, label) and
               any(mod["kind"] == "Negation" for mod in m.get("mods", []))
               for m in mentions)


def has_hypothesis(label: str, mentions: list[dict]) -> bool:
    return any(_matches(m, label) and
               any(mod["kind"] == "Hypothesis" for mod in m.get("mods", []))
               for m in mentions)


def has_ptm(ent_text: str, ptm_label: str, site: str | None,
            mentions: list[dict]) -> bool:
    """TestModifications-style: an entity mention carrying a PTM mod with
    this label (and site text containment when given)."""
    for m in mentions:
        if m.get("kind") != "tbm":
            continue
        if ent_text not in m["text"] and m["text"] not in ent_text:
            continue
        for mod in m.get("mods", []):
            if mod["kind"] != "PTM" or mod["label"] != ptm_label:
                continue
            if site is None:
                return True
            st = mod.get("site_text") or ""
            if site in st or st in site and st:
                return True
    return False


def check_expectation(exp: tuple, mentions: list[dict],
                      groundings: dict[str, str] | None = None) -> bool:
    """Evaluate one fixture expectation tuple (see fixtures.py header)."""
    op = exp[0]
    if op == "event":
        return has_event_with_arguments(exp[1], exp[2], mentions)
    if op == "!event":
        return not has_event_with_arguments(exp[1], exp[2], mentions)
    if op == "posreg":
        return has_positive_regulation_by_entity(exp[1], exp[2], exp[3],
                                                 mentions)
    if op == "!posreg":
        return not has_positive_regulation_by_entity(exp[1], exp[2], exp[3],
                                                     mentions)
    if op == "negreg":
        return has_negative_regulation_by_entity(exp[1], exp[2], exp[3],
                                                 mentions)
    if op == "!negreg":
        return not has_negative_regulation_by_entity(exp[1], exp[2], exp[3],
                                                     mentions)
    if op == "posact":
        return has_positive_activation(exp[1], exp[2], mentions)
    if op == "!posact":
        return not has_positive_activation(exp[1], exp[2], mentions)
    if op == "negact":
        return has_negative_activation(exp[1], exp[2], mentions)
    if op == "!negact":
        return not has_negative_activation(exp[1], exp[2], mentions)
    if op == "count":
        return count_label(exp[1], mentions) == exp[2]
    if op in ("same_canonical", "!same_canonical"):
        # alias grounding share proxy: canonical keys determine grounding
        # ids deterministically (G3), so shared canonical == shared id
        c1 = {m.get("canonical") for m in mentions
              if m.get("kind") == "tbm" and m["text"] == exp[1]}
        c2 = {m.get("canonical") for m in mentions
              if m.get("kind") == "tbm" and m["text"] == exp[2]}
        same = bool(c1) and bool(c2) and bool(c1 & c2)
        return same if op == "same_canonical" else (
            bool(c1) and bool(c2) and not (c1 & c2))
    if op == "entcount":
        return sum(1 for m in mentions if m.get("kind") == "tbm" and
                   _matches(m, exp[1])) == exp[2]
    if op == "entity":
        return has_entity(exp[1], mentions)
    if op == "!entity":
        return not has_entity(exp[1], mentions)
    if op == "negated":
        return has_negated(exp[1], mentions)
    if op == "!negated":
        return not has_negated(exp[1], mentions)
    if op == "hypothesis":
        return has_hypothesis(exp[1], mentions)
    if op == "!hypothesis":
        return not has_hypothesis(exp[1], mentions)
    if op == "mutations":
        # total Mutant mods across tbm mentions whose text contains exp[1],
        # optionally requiring a specific evidence string exp[3]
        # (TestModifications countMutations / hasMutation)
        muts = [x for m in mentions
                if m.get("kind") == "tbm" and exp[1] in m["text"]
                for x in (m.get("mods") or []) if x["kind"] == "Mutant"]
        if len(exp) > 3:
            return any(exp[3] in (x.get("evidence_text") or "")
                       for x in muts)
        return len(muts) == exp[2]
    if op == "ptm":
        return has_ptm(exp[1], exp[2], exp[3] if len(exp) > 3 else None,
                       mentions)
    if op == "grounded_same":
        if groundings is None:
            return False
        ids = [groundings.get(m["mention_id"]) for m in mentions
               if m.get("kind") == "tbm" and m["text"] == exp[1]]
        ids = [i for i in ids if i]
        return len(ids) >= 2 and len(set(ids)) == 1
    if op == "grounded":
        if groundings is None:
            return False
        return any(groundings.get(m["mention_id"], "").startswith(
            ("uniprot", "pfam", "pubchem", "go", "taxonomy"))
            for m in mentions if m.get("kind") == "tbm" and m["text"] == exp[1])
    raise ValueError(f"unknown expectation op: {op}")
