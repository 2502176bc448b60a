"""Light deterministic dependency layer — the N7 down-payment.

The reference parses with CoreNLP's UD-enhanced parser and its grammars
match dependency paths (biogrammar/vars.yml:1-80 censuses the relations the
templates actually consume: nsubj / nsubjpass / dobj / nmod_of / nmod_by /
conj_and / neg / aux). This module produces THAT subset deterministically
from the POS-lite tags — not a general parser (documented divergence,
SURVEY §2.2 N7): a rule chunker good enough to carry the grammar-relevant
edges in the sentences table (`deps` column, schemas.DEP) so handlers can
consume dependency structure instead of raw token windows.

Edge convention matches the reference's outgoingEdges orientation:
(src=head token, dst=dependent token, label=relation). Deterministic,
pure function of (words, tags, lemmas) — safe to recompute anywhere.

First consumer: negation (extract.SentenceExtractor.detect_negations →
neg edges from trigger tokens, NegationHandler.scala:18-41).
"""

from __future__ import annotations

_NEG_CUES = frozenset({"not", "no", "cannot", "never", "unable", "little"})
_GENERAL_PREPS = frozenset({"at", "on", "in", "to", "with", "for", "from",
                            "between", "into", "onto"})
_NMOD_PREPS = frozenset({"of", "by"}) | _GENERAL_PREPS
_FAIL_VERBS = frozenset({"fails", "fail", "failed", "failure"})
_CONJ = frozenset({"and", "or", "nor"})


def _is_verb(tag: str) -> bool:
    return tag.startswith("V")


def _is_nounish(tag: str) -> bool:
    return tag in ("NN", "CD")


def light_deps(words: list[str], tags: list[str],
               lemmas: list[str]) -> list[tuple[int, int, str]]:
    """(src, dst, label) edges for the grammar-relevant UD subset:
    neg, nsubj, nsubjpass, dobj, nmod_of, nmod_by, nmod_<prep> for the
    general prepositions (at/on/in/to/with/for/from), conj_and, aux."""
    n = len(words)
    lows = [w.lower() for w in words]
    # determiner-governed gerunds are nominals in UD ("The binding of
    # p53 ..." — binding/NOUN heads the nmod_of edge, not a VBG verb)
    tags = [("NN" if t == "VBG" and i > 0 and tags[i - 1] == "DT" else t)
            for i, t in enumerate(tags)]
    edges: list[tuple[int, int, str]] = []

    # --- neg: cue attaches to the nearest following verb-ish token ------
    # (CoreNLP attaches 'not' to its governing verb; the surface window
    # mirrors extract.detect_negations' 4-token scope so both agree)
    for i, lw in enumerate(lows):
        is_cue = lw in _NEG_CUES or "n't" in lw or (
            lw in _FAIL_VERBS and i + 1 < n and
            (lows[i + 1] in ("to", "not") or _is_verb(tags[i + 1])))
        if not is_cue:
            continue
        for j in range(i + 1, min(n, i + 5)):
            # adverbs/determiners/aux are transparent ('not strongly
            # inhibited' → neg on 'inhibited')
            if lows[j].endswith("ly") or tags[j] in ("DT", "AUX", "."):
                continue
            if _is_verb(tags[j]) or tags[j] == "NN":
                edges.append((j, i, "neg"))
                break

    for i, t in enumerate(tags):
        if not _is_verb(t):
            continue
        # --- aux + passive detection ---------------------------------
        is_passive = t == "VBN" and i > 0 and tags[i - 1] == "AUX"
        k = i - 1
        while k >= 0 and (tags[k] == "AUX" or lows[k].endswith("ly") or
                          lows[k] in ("often", "not", "never", "to")):
            if tags[k] == "AUX":
                edges.append((i, k, "aux"))
            k -= 1
        # --- nsubj / nsubjpass: nearest noun-ish head run to the left --
        if k >= 0 and _is_nounish(tags[k]):
            # UD coordination headedness: in "Raf and PI3K bind", nsubj
            # attaches to the FIRST conjunct (Raf) and conj_and carries
            # Raf→PI3K, so rule paths ">nsubj (>conj_and)?" reach both.
            # NOT when the pair is a PP object ("the binding of X and Y
            # promotes ..." — the subject head is the nominal, and the
            # nearest-noun reading keeps the cascade's attachment).
            if k >= 2 and lows[k - 1] in _CONJ and _is_nounish(tags[k - 2]) \
                    and (k < 3 or lows[k - 3] not in _NMOD_PREPS):
                k -= 2
            edges.append((i, k, "nsubjpass" if is_passive else "nsubj"))
        # --- dobj: nearest noun-ish token to the right (active only) ---
        if not is_passive:
            j = i + 1
            while j < n and (tags[j] == "DT" or lows[j].endswith("ly")):
                j += 1
            if j < n and _is_nounish(tags[j]):
                edges.append((i, j, "dobj"))

    # --- nmod_<prep>: "X of Y" → edge X→Y ------------------------------
    # of/by are the grammar-critical pair (genitive + passive agent); the
    # general-preposition tier (vars.yml preps_general: at/on/in/to/with/
    # for/from) carries site and locative attachment for the dependency
    # rules (odin_graph), attaching to a verb head when one directly
    # precedes ("phosphorylated at Ser21" → nmod_at on the verb, the UD
    # obl edge the reference site patterns traverse).
    for i, lw in enumerate(lows):
        if lw in _NMOD_PREPS and 0 < i < n - 1:
            # head = nearest noun-ish left, dependent = head of the right NP.
            # For "by" also allow a passive-verb head ("phosphorylated by
            # MEK" → nmod_by on the verb — the agent pattern the reference
            # grammars match, e.g. simple-event_template.yml agent rules)
            h = i - 1
            if not (_is_nounish(tags[h]) or
                    (lw == "by" and tags[h] == "VBN") or
                    (lw in _GENERAL_PREPS and _is_verb(tags[h]))):
                continue
            j = i + 1
            while j < n and tags[j] == "DT":
                j += 1
            if j < n and _is_nounish(tags[j]):
                # NP head = last noun of the run; an uppercase→lowercase
                # transition ends the NP (entity heads sit last — a
                # following lowercase "noun" is usually a mis-tagged verb,
                # e.g. "MAPK occurs")
                while j + 1 < n and _is_nounish(tags[j + 1]) and not (
                        any(c.isupper() for c in words[j]) and
                        words[j + 1].islower()):
                    j += 1
                edges.append((h, j, f"nmod_{lw}"))

    # --- conj_and: "X and Y" with matching noun-ish tags ----------------
    for i, lw in enumerate(lows):
        if lw in _CONJ and 0 < i < n - 1 and \
                _is_nounish(tags[i - 1]) and _is_nounish(tags[i + 1]):
            edges.append((i - 1, i + 1, f"conj_{lw}"))

    return edges


def neg_cues_for_trigger(deps: list, trigger_start: int) -> list[int]:
    """Cue token positions attached to `trigger_start` by a neg edge —
    the NegationHandler.scala:18-41 outgoing-edge check."""
    out = []
    for e in deps:
        src, dst, label = (e[0], e[1], e[2]) if not isinstance(e, dict) \
            else (e["src"], e["dst"], e["label"])
        if label == "neg" and src == trigger_start:
            out.append(dst)
    return out
