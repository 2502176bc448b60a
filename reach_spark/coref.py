"""Coreference: doc-local sieve cascade producing antecedent links, plus
the Coref.resolve-style argument rewrite.

Reference sieve order (coref/Coref.scala:420-426, darpa/DarpaLinks.scala):
exactStringMatch → groundingMatch → mutantProteinMatch → strictHeadMatch →
pronominalMatch → nounPhraseMatch → simpleEventMatch. Each sieve selects
antecedents with the LinearSelector (AntecedentSelector.scala:14-31): scan
sentences backward from the anaphor within a 1-sentence limit, taking the
leftmost candidates of the nearest non-empty sentence chunk, deduped on
shared grounding.

Resolution (coref/Coref.scala:35-110,316-336): events whose arguments are
Generic_* placeholders are rewritten with their antecedents' content;
plural anaphors ('they') expand to one event copy per antecedent
combination; events whose generic arguments stay unresolved are DROPPED
(argsComplete pruning, Coref.scala:92-100).

Spark shape (SURVEY §2.8): coref is doc-local, so the whole cascade is one
``applyInPandas`` behind a single groupBy(doc_id) shuffle; the rewrite is a
``cogroup`` of (mentions, links) on the same key — the only shuffles are
the two doc-level hash exchanges, both co-partitioned on doc_id. Output:
(a) the links edge list feeding canonicalization connected-components, and
(b) the resolved mentions table feeding triple flattening.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from .resources import GENERIC_NP_HEADS, PRONOUNS_PLURAL, PRONOUNS_SINGULAR

LINKS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("mention_id", T.StringType(), False),
    T.StructField("antecedent_id", T.StringType(), False),
    T.StructField("sieve", T.StringType(), False),
])

# sieves whose links rewrite event arguments (generic → antecedent);
# exactString/grounding links relate SPECIFIC mentions and only feed
# canonicalization
REWRITE_SIEVES = frozenset({"mutantProteinMatch", "strictHeadMatch",
                            "pronominalMatch", "nounPhraseMatch",
                            "simpleEventMatch"})

_PRONOUNS = frozenset(PRONOUNS_SINGULAR) | frozenset(PRONOUNS_PLURAL)

# PossibleController gate (taxonomy.yml:25-80): pronominal/NP anaphors only
# take antecedents from the Event ∪ BioEntity subtree — context-type
# entities (Species, CellLine, Organ, Cellular_component, ...) and Sites
# are never antecedents (DarpaLinks.scala:206-234 m.matches(
# "PossibleController") candidate filter)
_POSSIBLE_CONTROLLER_LABELS = frozenset({
    "Gene_or_gene_product", "Protein", "Family", "Complex", "GENE",
    "Simple_chemical", "BioProcess", "Disease"})

# PRP$ possessive pronouns keep the event's co-arguments as candidates
# ("its own degradation" — 'its' may corefer with the theme's possessor);
# non-possessives exclude them (DarpaLinks.scala:198-204 gTag != "PRP$"
# guard on extending excludeThese)
_POSSESSIVES = frozenset({"its", "their"})

# nounPhraseMatch label compatibility: the anaphor's head constrains the
# antecedent's label (the surface analog of DarpaLinks.scala:309-327
# g.labels.forall(m.labels.contains) over the taxonomy)
_MACROMOLECULE_LABELS = frozenset({"Gene_or_gene_product", "Protein",
                                   "Family", "Complex", "GENE"})
_NP_HEAD_LABELS: dict[str, frozenset] = {
    h: _MACROMOLECULE_LABELS
    for h in ("protein", "proteins", "enzyme", "enzymes", "kinase",
              "kinases", "receptor", "receptors", "factor", "factors",
              "gene", "genes", "complex")}
_NP_HEAD_LABELS.update({
    "molecule": _POSSIBLE_CONTROLLER_LABELS,
    "molecules": _POSSIBLE_CONTROLLER_LABELS})



def _lst(v) -> list:
    """None/NaN-safe list view of a nested Arrow column value."""
    if v is None or (isinstance(v, float) and v != v):
        return []
    return list(v)

def _mutants(r: dict) -> list[str]:
    return [m["evidence_text"] for m in _lst(r.get("mods"))
            if m["kind"] == "Mutant" and
            not str(m.get("evidence_text", "")).startswith("mutant")]


def _has_generic_mutation(r: dict) -> bool:
    return any(m["kind"] == "Mutant" and
               str(m.get("evidence_text", "")).startswith("mutant")
               for m in _lst(r.get("mods")))


def _is_generic(r: dict) -> bool:
    return str(r["label"]).startswith("Generic")


def _number(r: dict) -> int:
    for m in _lst(r.get("mods")):
        if m["kind"] == "Generic" and m.get("label") == "plural":
            return 2
    return 1


def _gid(r: dict) -> str | None:
    ns = r.get("g_ns")
    if ns in (None, "uaz"):
        return None
    return f"{ns}:{r.get('g_id')}"


def _compatible_mutants(ante: dict, gen: dict) -> bool:
    """CorefUtils.compatibleMutants (CorefUtils.scala:105-117): the
    anaphor's specific mutants must be a subset of the antecedent's."""
    return set(_mutants(gen)) <= set(_mutants(ante))


def _linear_select(anaphor: dict, cands: list[dict], num: int,
                   sent_limit: int = 1) -> list[dict]:
    """LinearSelector (AntecedentSelector.scala:14-31): nearest non-empty
    sentence chunk going backward (≤ sent_limit before the anaphor's),
    leftmost first, skipping candidates that share grounding with ones
    already selected."""
    sel: list[dict] = []
    chosen: set[str] = set()
    i = anaphor["_ord"]
    while i >= 0 and anaphor["_ord"] - i <= sent_limit and len(sel) < num:
        chunk = sorted(
            (c for c in cands
             if c["_ord"] == i and c["mention_id"] not in chosen and
             not any(_gid(c) is not None and _gid(c) == _gid(s)
                     for s in sel)),
            key=lambda c: (c["start"], c["mention_id"]))
        take = chunk[:num - len(sel)]
        sel.extend(take)
        chosen.update(c["mention_id"] for c in take)
        if not take:
            i -= 1
    return sel


def _doc_links(pdf: pd.DataFrame) -> pd.DataFrame:
    rows = pdf.sort_values(["sent_idx", "start"]).to_dict("records")
    ords = {s: i for i, s in enumerate(sorted({r["sent_idx"]
                                               for r in rows}))}
    for r in rows:
        r["_ord"] = ords[r["sent_idx"]]
    tbms = [r for r in rows if r["kind"] == "tbm"]
    events = [r for r in rows if r["kind"] == "event"]
    linked: set[str] = set()
    out: list[tuple] = []

    def link(anaphor: dict, antecedents: list[dict], sieve: str) -> None:
        for a in antecedents:
            out.append((anaphor["doc_id"], anaphor["mention_id"],
                        a["mention_id"], sieve))
        if antecedents:
            linked.add(anaphor["mention_id"])

    def precedes(a: dict, b: dict) -> bool:
        return (a["sent_idx"], a["start"]) < (b["sent_idx"], b["start"])

    # 1. exactStringMatch (DarpaLinks.scala:24-45): closest prior mention
    # with identical text + mutant signature, non-generic only
    last_by_key: dict[str, str] = {}
    for r in tbms:
        if _is_generic(r) or _has_generic_mutation(r):
            continue
        key = (str(r["text"]).lower() + "(" + "/".join(sorted(_mutants(r)))
               + ")")
        if key in last_by_key and r["mention_id"] not in linked:
            out.append((r["doc_id"], r["mention_id"], last_by_key[key],
                        "exactStringMatch"))
            linked.add(r["mention_id"])
        last_by_key[key] = r["mention_id"]

    # 2. groundingMatch (DarpaLinks.scala:54-75): closest prior mention
    # with the same grounding id
    last_by_gid: dict[str, str] = {}
    for r in tbms:
        if _is_generic(r) or _has_generic_mutation(r):
            continue
        gid = _gid(r)
        if gid is None:
            continue
        if gid in last_by_gid and r["mention_id"] not in linked:
            out.append((r["doc_id"], r["mention_id"], last_by_gid[gid],
                        "groundingMatch"))
            linked.add(r["mention_id"])
        last_by_gid[gid] = r["mention_id"]

    # 3. mutantProteinMatch (DarpaLinks.scala:77-110): a mention carrying a
    # generic mutation (or a Generic_entity with mutant mods) links to a
    # prior specific-mutant-bearing mention with compatible mutants and
    # (when grounded) the same grounding
    for g in tbms:
        if g["mention_id"] in linked:
            continue
        g_generic = _is_generic(g)
        if not (_has_generic_mutation(g) or
                (g_generic and _lst(g.get("mods")) and
                 any(m["kind"] == "Mutant" for m in _lst(g["mods"])))):
            continue
        cands = [m for m in tbms
                 if precedes(m, g) and not _is_generic(m) and
                 not _has_generic_mutation(m) and
                 (_gid(m) is None or g_generic or _gid(m) == _gid(g)) and
                 _mutants(m) and _compatible_mutants(m, g)]
        link(g, _linear_select(g, cands, _number(g)), "mutantProteinMatch")

    # 4. strictHeadMatch (DarpaLinks.scala:120-162): a generic NP whose
    # head word appears inside an earlier mention with the same labels
    for g in tbms:
        if g["mention_id"] in linked or not _is_generic(g):
            continue
        txt = str(g["text"]).lower()
        if txt in _PRONOUNS or txt not in GENERIC_NP_HEADS:
            continue
        head = txt.split()[-1].rstrip("s")
        cands = [m for m in tbms
                 if precedes(m, g) and not _is_generic(m) and
                 head in str(m["text"]).lower().split()]
        link(g, _linear_select(g, cands, _number(g)), "strictHeadMatch")

    # 5/6. pronominalMatch / nounPhraseMatch (DarpaLinks.scala:171-354):
    # generic arguments of events link to the nearest prior non-generic
    # bio entity, excluding the event's own other arguments
    arg_parent: dict[str, dict] = {}
    for ev in events:
        for a in _lst(ev.get("args")):
            arg_parent.setdefault(a["mention_id"], ev)
    for g in tbms:
        if g["mention_id"] in linked or not _is_generic(g):
            continue
        txt = str(g["text"]).lower()
        is_pron = txt in _PRONOUNS
        if not is_pron and txt not in GENERIC_NP_HEADS:
            continue
        parent = arg_parent.get(g["mention_id"])
        # PRP$ possessives do NOT exclude the parent event's co-arguments
        # (DarpaLinks.scala:198-204); other anaphors do
        if txt in _POSSESSIVES or parent is None:
            exclude: set = set()
        else:
            exclude = {a["mention_id"] for a in _lst(parent.get("args"))}
        head_labels = (_POSSIBLE_CONTROLLER_LABELS if is_pron
                       else _NP_HEAD_LABELS.get(
                           txt.split()[-1], _POSSIBLE_CONTROLLER_LABELS))
        cands = [m for m in tbms
                 if precedes(m, g) and not _is_generic(m) and
                 m["label"] in head_labels and
                 m["mention_id"] not in exclude and
                 # pronominal antecedents: same or previous sentence only
                 # (DarpaLinks.scala:209 g.sentence - m.sentence < 2);
                 # _ord is the dense per-doc sentence rank
                 (not is_pron or g["_ord"] - m["_ord"] < 2) and
                 # NP anaphors respect mutant compatibility
                 # (DarpaLinks.scala:313 compatibleMutants)
                 (is_pron or _compatible_mutants(m, g))]
        link(g, _linear_select(g, cands, _number(g)),
             "pronominalMatch" if is_pron else "nounPhraseMatch")

    # 7. simpleEventMatch (DarpaLinks.scala:364-420): a Generic_event
    # argument of a complex event links to the nearest prior specific
    # simple event of the hinted type
    for g in events:
        if g["label"] != "Generic_event" or g["mention_id"] in linked:
            continue
        hint = next((x for x in _lst(g.get("labels"))
                     if x != "Generic_event"), None)
        cands = [ev for ev in events
                 if precedes(ev, g) and ev["label"] != "Generic_event" and
                 (hint is None or ev["label"] == hint) and
                 not any(str(a["target_label"]).startswith("Generic")
                         for a in _lst(ev.get("args")))]
        link(g, _linear_select(g, cands, 1), "simpleEventMatch")

    return pd.DataFrame(out, columns=["doc_id", "mention_id",
                                      "antecedent_id", "sieve"])


_LINK_COLS = ["doc_id", "sent_idx", "mention_id", "kind", "label", "labels",
              "text", "start", "args", "mods", "g_ns", "g_id"]


def coref_links(grounded_mentions: DataFrame) -> DataFrame:
    slim = grounded_mentions.select(*_LINK_COLS)
    return slim.groupBy("doc_id").applyInPandas(
        lambda pdf: _doc_links(pdf), schema=LINKS_SCHEMA)


def _remap(mid: str, salt: str) -> str:
    return hashlib.sha1((mid + "|" + salt).encode()).hexdigest()[:16]


def resolve_mentions(grounded_mentions: DataFrame,
                     links: DataFrame) -> DataFrame:
    """Coref.resolve (Coref.scala:35-110,316-336) as a doc-cogrouped
    rewrite: event arguments pointing at Generic_* mentions are replaced
    by their antecedents' content; plural anaphors expand to one event
    copy per antecedent; events with unresolved generic arguments and the
    generic placeholder rows themselves are dropped; simple events newly
    consumed as a resolved `controlled` are flagged is_controlled so the
    triple builder does not double-emit them."""
    schema = grounded_mentions.schema

    def fn(mdf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        ant: dict[str, list[str]] = {}
        for r in ldf.itertuples(index=False):
            if r.sieve in REWRITE_SIEVES:
                ant.setdefault(r.mention_id, []).append(r.antecedent_id)
        recs = mdf.to_dict("records")
        content = {r["mention_id"]: r for r in recs}
        controlled_now: set[str] = set()
        out: list[dict] = []
        for r in recs:
            if r["kind"] == "tbm" and _is_generic(r):
                continue  # placeholders materialize through event args
            if r["kind"] != "event":
                out.append(r)
                continue
            if r["label"] == "Generic_event":
                continue
            arg_options: list[list[dict]] = []
            complete = True
            for a in _lst(r.get("args")):
                if not str(a["target_label"]).startswith("Generic"):
                    arg_options.append([dict(a)])
                    continue
                reps: list[dict] = []
                for aid in ant.get(a["mention_id"], []):
                    c = content.get(aid)
                    if c is None:
                        continue
                    if c["kind"] == "event":
                        theme = next((x for x in _lst(c.get("args"))
                                      if x["role"] == "theme"), None)
                        reps.append({
                            "role": a["role"], "mention_id": aid,
                            "text": theme["text"] if theme else c["text"],
                            "canonical": (theme["canonical"] if theme
                                          else None),
                            "target_label": c["label"]})
                        controlled_now.add(aid)
                    else:
                        reps.append({
                            "role": a["role"], "mention_id": aid,
                            "text": c["text"],
                            "canonical": c.get("canonical"),
                            "target_label": c["label"]})
                if not reps:
                    complete = False
                    break
                arg_options.append(reps)
            if not complete:
                continue  # argsComplete pruning
            # cross-product over plural replacements (combineArgs,
            # Coref.scala:64-86) — one event copy per combination
            combos: list[list[dict]] = [[]]
            for opts in arg_options:
                combos = [c + [o] for c in combos for o in opts]
            for idx, combo in enumerate(combos):
                r2 = dict(r)
                r2["args"] = combo
                if len(combos) > 1:
                    r2["mention_id"] = _remap(
                        r["mention_id"],
                        "|".join(a["mention_id"] for a in combo))
                out.append(r2)
        for r in out:
            if r["kind"] == "event" and \
                    r["mention_id"] in controlled_now:
                r["is_controlled"] = True
        return pd.DataFrame(out, columns=[f.name for f in schema.fields]) \
            if out else pd.DataFrame(columns=[f.name for f in schema.fields])

    return (grounded_mentions.groupBy("doc_id")
            .cogroup(links.groupBy("doc_id"))
            .applyInPandas(lambda m, l: fn(m, l), schema=schema))
