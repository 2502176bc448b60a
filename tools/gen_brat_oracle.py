"""Generate reach_spark/_brat_expected.py — per-fixture expected Brat
standoff components backing the `export_brat` DuckDB oracle.

Same validity argument as tools/gen_kg_oracle.py: the interleaved corpus is
a deterministic composition of per-fixture spans (span0 <- doc_id % N,
span2 <- (doc_id*7+3) % N), extraction is sentence-local with coref off,
and standoff numbering is pure document-order arithmetic — so each doc's
T/E/R ids are the per-fixture ids offset by the span0 fixture's counts,
char offsets by its reconstructed text length + 1, and '#'-note numbers
re-rank in SQL. This script computes the per-fixture components with its
OWN plain-Python numbering (independent re-implementation of the
reach_spark.brat sort/id spec — no Spark windows/joins), running the real
pipeline once on a one-doc-per-fixture corpus.

Run: python tools/gen_brat_oracle.py   (regenerate with fixtures.py or the
extraction cascade; pinned by the same FIXTURE_SHA discipline as
_kg_expected.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Row  # noqa: E402

from reach_spark.fixtures import fixture_sentences  # noqa: E402
from reach_spark.session import get_spark  # noqa: E402
from tools.gen_kg_oracle import fixture_corpus_sha  # noqa: E402


def _per_fixture(mrows: list, srows: list):
    """Plain-Python standoff components for ONE fixture document.

    Returns (t_rows, e_rows, r_rows, arg_rows, note_rows, meta) where ids
    follow the reach_spark.brat deterministic spec: T by (sent_idx, cs,
    ce, label, text) over distinct spans; E by (sent_idx, trig span,
    label, argsig, token span); R by (sent_idx, span, label, argsig);
    notes in (class T<R<E, id) order with min(found_by) per id."""
    sents = sorted(srows, key=lambda r: r["sent_idx"])
    bases, tlen = {}, 0
    pos = 0
    for s in sents:
        bases[s["sent_idx"]] = pos
        pos += len(s["sent_text"]) + 1
    tlen = max(0, pos - 1)
    smap = {s["sent_idx"]: s for s in sents}

    def cspan(si, ts, te):
        s = smap[si]
        return (bases[si] + s["start_offsets"][ts],
                bases[si] + s["end_offsets"][te - 1])

    kept = [m for m in mrows if m["keep"]]
    tb_spans = set()
    ent_span = {}    # mention_id -> T span key
    trig_span = {}   # event mention_id -> trigger T span key
    for m in kept:
        if m["kind"] == "tbm":
            cs, ce = cspan(m["sent_idx"], m["start"], m["end"])
            key = (m["sent_idx"], cs, ce, m["label"], m["text"])
            tb_spans.add(key)
            ent_span[m["mention_id"]] = key
        elif m["kind"] == "event" and m["trigger_start"] is not None:
            cs, ce = cspan(m["sent_idx"], m["trigger_start"],
                           m["trigger_end"])
            key = (m["sent_idx"], cs, ce, m["label"], m["trigger_text"])
            tb_spans.add(key)
            trig_span[m["mention_id"]] = key
    t_sorted = sorted(tb_spans)
    tnum = {key: i + 1 for i, key in enumerate(t_sorted)}
    t_rows = [(k, key[1], key[2], key[3], key[4])
              for key, k in sorted(tnum.items(), key=lambda kv: kv[1])]

    # recursive content signature — EXACT mirror of
    # reach_spark.brat._content_sigs (see its docstring for the spec)
    by_mid = {m["mention_id"]: m for m in kept}

    def modsig(m):
        return "{" + ",".join(sorted(
            "/".join([md["kind"], md["label"] or "",
                      md["evidence_text"] or "", md["site_text"] or "",
                      "true" if md["negated"] else "false"])
            for md in m["mods"])) + "}"

    def sig(m, depth):
        if m["kind"] == "tbm":
            return (f"{m['label']}@{m['start']}-{m['end']}:{m['text']}"
                    + modsig(m))
        ts = m["trigger_start"] if m["trigger_start"] is not None \
            else m["start"]
        te = m["trigger_end"] if m["trigger_end"] is not None \
            else m["end"]
        prefix = (f"{m['label']}@{ts}-{te}#{m['start']}-{m['end']}"
                  + modsig(m))
        terms = []
        for a in m["args"]:
            tgt = by_mid.get(a["mention_id"])
            if tgt is None:
                term = "?" + a["text"]
            elif tgt["kind"] == "tbm":
                term = sig(tgt, 0)
            elif depth > 1:
                term = sig(tgt, depth - 1)
            else:
                term = "?" + a["text"]
            terms.append(f"{a['role']}:{term}")
        return prefix + "[" + " ".join(sorted(terms)) + "]"

    def argsig(m):
        return sig(m, 4)

    events = [m for m in kept if m["kind"] == "event"
              and m["trigger_start"] is not None]
    ev_keyed = []
    for m in events:
        key = trig_span[m["mention_id"]]
        ev_keyed.append(((m["sent_idx"], key[1], key[2], m["label"],
                          argsig(m)), m))
    ev_keyed.sort(key=lambda km: km[0])
    enum = {}
    e_rows = []
    for i, (key, m) in enumerate(ev_keyed):
        enum[m["mention_id"]] = i + 1
        e_rows.append((i + 1, m["label"],
                       tnum[trig_span[m["mention_id"]]]))

    rels = [m for m in kept if m["kind"] == "relation" or
            (m["kind"] == "event" and m["trigger_start"] is None)]
    rel_keyed = []
    for m in rels:
        cs, ce = cspan(m["sent_idx"], m["start"], m["end"])
        rel_keyed.append(((m["sent_idx"], cs, ce, m["label"], argsig(m)),
                          m))
    rel_keyed.sort(key=lambda km: km[0])
    rnum = {}
    r_rows = []
    for i, (key, m) in enumerate(rel_keyed):
        rnum[m["mention_id"]] = i + 1
        r_rows.append((i + 1, m["label"]))

    arg_rows = []
    for okind, keyed in (("E", ev_keyed), ("R", rel_keyed)):
        for _, m in keyed:
            onum = (enum if okind == "E" else rnum)[m["mention_id"]]
            for a in m["args"]:
                mid = a["mention_id"]
                if mid in ent_span:
                    ref = ("T", tnum[ent_span[mid]])
                elif mid in enum:
                    ref = ("E", enum[mid])
                else:
                    continue
                arg_rows.append((okind, onum, a["role"].capitalize(),
                                 ref[0], ref[1]))

    # notes: min(found_by) per id; class order T(entities only) < R < E
    note_fb: dict[tuple, str] = {}
    for m in kept:
        if m["kind"] == "tbm":
            tgt = (0, tnum[ent_span[m["mention_id"]]])
        elif m["mention_id"] in enum:
            tgt = (2, enum[m["mention_id"]])
        elif m["mention_id"] in rnum:
            tgt = (1, rnum[m["mention_id"]])
        else:
            continue
        fb = m["found_by"]
        if tgt not in note_fb or fb < note_fb[tgt]:
            note_fb[tgt] = fb
    note_rows = [(cls, num, fb)
                 for (cls, num), fb in sorted(note_fb.items())]

    # BIO alignment per sentence (Brat.alignTokenLabel last-wins over
    # the fixture's own T rows — sentence-local, so corpus-exact)
    bio_rows = []
    for s in sents:
        si = s["sent_idx"]
        labels = []
        for j in range(len(s["words"])):
            ts = bases[si] + s["start_offsets"][j]
            te = bases[si] + s["end_offsets"][j]
            lab = "O"
            for key in t_sorted:  # ascending T number = file order
                _si, cs, ce, tl, _tx = key
                if ts < ce and cs < te:
                    lab = ("B-" if ts <= cs else "I-") + tl
            labels.append(lab)
        bio_rows.append((si, "|".join(labels)))

    meta = (len(t_rows), len(e_rows), len(r_rows), tlen)
    return t_rows, e_rows, r_rows, arg_rows, note_rows, bio_rows, meta


def main() -> None:
    from reach_spark.pipeline import extract_dataframe

    spark = get_spark(app_name="gen_brat_oracle")
    sents_txt = fixture_sentences()
    n = len(sents_txt)
    docs = spark.createDataFrame(
        [Row(doc_id=str(i),
             spans=[Row(kind="text", text=s, media_ref="", offset=0)])
         for i, s in enumerate(sents_txt)])
    res = extract_dataframe(spark, docs, with_coref=False)
    mrows = [r.asDict(recursive=True)
             for r in res["resolved_mentions"].collect()]
    srows = [r.asDict(recursive=True) for r in res["sentences"].collect()]

    by_fix_m: dict[int, list] = {i: [] for i in range(n)}
    by_fix_s: dict[int, list] = {i: [] for i in range(n)}
    for m in mrows:
        by_fix_m[int(m["doc_id"])].append(m)
    for s in srows:
        by_fix_s[int(s["doc_id"])].append(s)

    T, E, R, A, NOTE, BIO, META = [], [], [], [], [], [], []
    for i in range(n):
        t, e, r, a, nt, bio, meta = _per_fixture(by_fix_m[i],
                                                 by_fix_s[i])
        T += [(i,) + row for row in t]
        E += [(i,) + row for row in e]
        R += [(i,) + row for row in r]
        A += [(i,) + row for row in a]
        NOTE += [(i,) + row for row in nt]
        BIO += [(i,) + row for row in bio]
        META.append((i,) + meta)

    sha = fixture_corpus_sha()
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "reach_spark", "_brat_expected.py")
    with open(out, "w") as f:
        f.write('"""GENERATED by tools/gen_brat_oracle.py — per-fixture '
                'Brat standoff components\nbacking the export_brat DuckDB '
                'oracle. Do not edit by hand."""\n\n')
        f.write(f'FIXTURE_SHA = "{sha}"\n')
        f.write(f"N_FIXTURES = {n}\n\n")
        for name, rows in (("BRAT_T", T), ("BRAT_E", E), ("BRAT_R", R),
                           ("BRAT_ARGS", A), ("BRAT_NOTES", NOTE),
                           ("BRAT_BIO", BIO), ("BRAT_META", META)):
            f.write(f"{name} = [\n")
            for row in rows:
                f.write(f"    {row!r},\n")
            f.write("]\n\n")
    print(f"wrote {out}: {len(T)} T, {len(E)} E, {len(R)} R, "
          f"{len(A)} args, {len(NOTE)} notes, {n} fixtures, sha {sha}")


if __name__ == "__main__":
    main()
