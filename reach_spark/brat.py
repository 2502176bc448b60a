"""Brat standoff exporter/reader (reference main/.../brat/Brat.scala:24-214
+ utils/BratUtils.scala:1-155): the BioNLP shared-task annotation format.

Writer (``brat_standoff``, Brat.dumpStandoff :128-188): one standoff line
per annotation —

  ``T<n>\\t<label> <start> <end>\\t<text>``   text-bound (entity / trigger)
  ``E<n>\\t<label>:T<t> Role:Ref ...``        event (trigger + typed args)
  ``R<n>\\t<label> Role:Ref ...``             relation (no trigger, e.g. Alias)
  ``#<n>\\tFoundByRule <id>\\t<rule>``         rule-name note (:156-160)

ID assignment diverges from the reference deliberately: IdTracker
(:218-263) numbers mentions in encounter order of a Scala ``Seq`` (and its
arg strings follow unordered ``Map`` iteration), which is not reproducible
from a declarative plan. Here every id is DETERMINISTIC document order —
T by (sent_idx, char_start, char_end, label, text), E by (sent_idx,
trigger span, label, arg signature, token span), R likewise, note lines by
(id class T<R<E, id number) — the order Brat.dumpStandoff itself sorts its
output lines into (:148-152), so the emitted FILE ordering matches.

Character coordinates: the reference offsets index the original document
text (IdTracker.charInterval :238-242). This pipeline's sentence splitter
normalizes whitespace (extract.split_sentences strips + re-merges), so the
original coordinate is not recoverable; the standoff coordinate here is
the RECONSTRUCTED document text = all sentences in (doc_id, sent_idx)
order joined by single spaces, emitted by ``brat_doc_text`` so ``.txt`` /
``.ann`` pairs stay consistent — the invariant brat itself checks.

Reader (``parse_standoff``, Brat.parseAnnotation :33-90) and BIO
alignment (``align_bio_labels``, Brat.alignTokenLabel :108-126 /
alignSentenceLabels :122-126): pure column ops — split/regexp parsing into
typed annotation rows, then a sentence-banded overlap join where the
LAST overlapping annotation (file order) wins, B- when the token starts
at/before the span start else I-.

Spark shape: every id is a ``row_number`` window partitioned by doc_id
(standoff numbering is inherently per-document, so the shuffle key is the
natural partition key and per-partition state is bounded by document
size); all lookups (arg -> T/E id) are per-doc equi-joins on mention_id or
the span key. No UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_TAB = "\t"


# ---------------------------------------------------------------------------
# document text reconstruction (the standoff coordinate system)
# ---------------------------------------------------------------------------

def sentence_layout(sentences: DataFrame) -> DataFrame:
    """SENTENCES + ``sent_base``: char offset of each sentence within the
    reconstructed doc text (sentences joined by single spaces, doc order).
    One window per doc — the per-doc running sum of (len + 1)."""
    w = (Window.partitionBy("doc_id").orderBy("sent_idx")
         .rowsBetween(Window.unboundedPreceding, -1))
    base = F.coalesce(F.sum(F.length("sent_text") + 1).over(w), F.lit(0))
    return sentences.withColumn("sent_base", base)


def brat_doc_text(sentences: DataFrame) -> DataFrame:
    """(doc_id, text): the ``.txt`` half of a brat corpus — the exact
    string the standoff offsets index."""
    return (sentences
            .groupBy("doc_id")
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("sent_idx", "sent_text"))),
                    lambda s: s["sent_text"]),
                " ").alias("text")))


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

def _char_span(tok_s: Column, tok_e: Column) -> tuple[Column, Column]:
    """Token interval [tok_s, tok_e) -> doc-level char span using the
    sentence's offset arrays + sent_base (IdTracker.charInterval analog)."""
    cs = F.col("sent_base") + F.element_at("start_offsets", tok_s + 1)
    ce = F.col("sent_base") + F.element_at("end_offsets", tok_e)
    return cs, ce


_SIG_DEPTH = 4


def _content_sigs(kept: DataFrame) -> DataFrame:
    """(doc_id, mention_id, sig): a depth-bounded recursive content
    signature for every non-tbm mention — THE deterministic E/R sort
    tiebreaker. Two sibling events can tie on (trigger span, label) and
    even on their args' display texts (a regulation's controlled arg
    shows its theme's text, extract._arg), yet reference structurally
    different sub-events; the signature descends into arg targets so
    such siblings order deterministically.

    Spec (mirrored exactly by tools/gen_brat_oracle.py):
      modsig         = sorted kind/label/evidence/site/negated per mod,
                       ','-joined (mutation-split twins differ ONLY in
                       their Mutant mods — extract.py:4090)
      sig(tbm)       = label@start-end:text{modsig}      (token coords)
      sig(ev, k)     = label@ts-te#start-end{modsig}[sorted role:term]
                       where term = sig(tbm target) | sig(ev target,
                       k-1) | '?'+arg.text when k==1 for ev targets
    after _SIG_DEPTH iterations. Events identical to that depth are
    identical trees in practice (nesting here is <= 3 levels), and fully
    identical subtrees emit the same line set under either order.

    Token coordinates (not chars) keep the signature a pure sentence-
    local function. Cost: _SIG_DEPTH per-doc equi-joins over the
    (small) mentions table."""
    modsig = F.concat(
        F.lit("{"),
        F.array_join(F.array_sort(F.transform(
            "mods",
            lambda m: F.concat(
                m["kind"], F.lit("/"), F.coalesce(m["label"], F.lit("")),
                F.lit("/"), F.coalesce(m["evidence_text"], F.lit("")),
                F.lit("/"), F.coalesce(m["site_text"], F.lit("")),
                F.lit("/"), m["negated"].cast("string")))), ","),
        F.lit("}"))
    tbm_sig = kept.where(F.col("kind") == "tbm").select(
        "doc_id", F.col("mention_id").alias("ref_mid"),
        F.concat("label", F.lit("@"), F.col("start").cast("string"),
                 F.lit("-"), F.col("end").cast("string"), F.lit(":"),
                 "text", modsig).alias("sig"))
    ev = kept.where(F.col("kind") != "tbm")
    ev_base = ev.select(
        "doc_id", "mention_id",
        F.concat("label", F.lit("@"),
                 F.coalesce("trigger_start", "start").cast("string"),
                 F.lit("-"),
                 F.coalesce("trigger_end", "end").cast("string"),
                 F.lit("#"), F.col("start").cast("string"), F.lit("-"),
                 F.col("end").cast("string"), modsig).alias("prefix"))
    args_flat = (ev.select("doc_id", "mention_id",
                           F.explode("args").alias("arg"))
                 .select("doc_id", "mention_id",
                         F.col("arg")["role"].alias("role"),
                         F.col("arg")["mention_id"].alias("ref_mid"),
                         F.col("arg")["text"].alias("atext")))
    ev_sig = None
    for _ in range(_SIG_DEPTH):
        ref = tbm_sig if ev_sig is None else tbm_sig.unionByName(
            ev_sig.select("doc_id", F.col("mention_id").alias("ref_mid"),
                          "sig"))
        terms = (args_flat
                 .join(ref, ["doc_id", "ref_mid"], "left")
                 .select("doc_id", "mention_id",
                         F.concat("role", F.lit(":"),
                                  F.coalesce(
                                      "sig",
                                      F.concat(F.lit("?"), "atext")))
                         .alias("term")))
        agg = (terms.groupBy("doc_id", "mention_id")
               .agg(F.array_join(F.array_sort(F.collect_list("term")),
                                 " ").alias("argstr")))
        ev_sig = (ev_base.join(agg, ["doc_id", "mention_id"], "left")
                  .select("doc_id", "mention_id",
                          F.concat("prefix", F.lit("["),
                                   F.coalesce("argstr", F.lit("")),
                                   F.lit("]")).alias("sig")))
    return ev_sig


def _tb_with_spans(mentions: DataFrame, layout: DataFrame) -> DataFrame:
    """Every text-bound surface the standoff needs: entity mentions
    (kind=tbm, keyed by mention_id) UNION event triggers (keyed by the
    owning event's mention_id with is_trigger=true), each with doc-level
    char coordinates."""
    kept = mentions.where(F.col("keep"))
    tbm = kept.where(F.col("kind") == "tbm").select(
        "doc_id", "sent_idx", "mention_id", "label",
        F.col("start").alias("tok_s"), F.col("end").alias("tok_e"),
        "text", F.lit(False).alias("is_trigger"))
    trig = (kept
            .where((F.col("kind") == "event") &
                   F.col("trigger_start").isNotNull())
            .select("doc_id", "sent_idx", "mention_id", "label",
                    F.col("trigger_start").alias("tok_s"),
                    F.col("trigger_end").alias("tok_e"),
                    F.col("trigger_text").alias("text"),
                    F.lit(True).alias("is_trigger")))
    j = (tbm.unionByName(trig)
         .join(layout.select("doc_id", "sent_idx", "sent_base",
                             "start_offsets", "end_offsets"),
               ["doc_id", "sent_idx"]))
    cs, ce = _char_span(F.col("tok_s"), F.col("tok_e"))
    return j.select("doc_id", "sent_idx", "mention_id", "label", "text",
                    "is_trigger", cs.alias("cs"), ce.alias("ce"))


def _numbered(df: DataFrame, order: list, col: str) -> DataFrame:
    w = Window.partitionBy("doc_id").orderBy(*order)
    return df.withColumn(col, F.row_number().over(w))


def standoff_tables(mentions: DataFrame,
                    sentences: DataFrame) -> dict[str, DataFrame]:
    """The typed halves of the standoff: ``textbound`` (T rows with
    doc-level ids + the mention_id->T map), ``events`` (E rows), and
    ``relations`` (R rows), each with a pre-formatted ``args`` string."""
    layout = sentence_layout(sentences)
    tb = _tb_with_spans(mentions, layout)

    # T ids over DISTINCT spans (two mentions on the same (span, label,
    # text) share one T, as one brat annotation)
    t_rows = _numbered(
        tb.select("doc_id", "sent_idx", "label", "text", "cs", "ce")
        .distinct(),
        ["sent_idx", "cs", "ce", "label", "text"], "tnum")
    # mention_id -> T id (entities AND triggers route through this)
    t_map = tb.join(
        t_rows, ["doc_id", "sent_idx", "label", "text", "cs", "ce"]).select(
        "doc_id", "mention_id", "is_trigger", "tnum", "cs", "ce")

    kept = mentions.where(F.col("keep"))
    sigs = _content_sigs(kept)
    ev_raw = kept.where((F.col("kind") == "event") &
                        F.col("trigger_start").isNotNull())
    rel_raw = kept.where((F.col("kind") == "relation") |
                         ((F.col("kind") == "event") &
                          F.col("trigger_start").isNull()))

    # events: deterministic E numbering by (sentence, trigger span, label,
    # recursive content signature)
    ev = (ev_raw
          .select("doc_id", "sent_idx", "mention_id", "label")
          .join(sigs, ["doc_id", "mention_id"])
          .join(t_map.where("is_trigger")
                .select("doc_id", "mention_id",
                        F.col("tnum").alias("trig_tnum"),
                        F.col("cs").alias("trig_cs"),
                        F.col("ce").alias("trig_ce")),
                ["doc_id", "mention_id"]))
    ev = _numbered(ev, ["sent_idx", "trig_cs", "trig_ce", "label",
                        "sig"], "enum")

    # relations: char span of the whole relation mention for ordering
    rel = (rel_raw
           .join(layout.select("doc_id", "sent_idx", "sent_base",
                               "start_offsets", "end_offsets"),
                 ["doc_id", "sent_idx"]))
    rcs, rce = _char_span(F.col("start"), F.col("end"))
    rel = (rel.select("doc_id", "sent_idx", "mention_id", "label",
                      rcs.alias("cs"), rce.alias("ce"))
           .join(sigs, ["doc_id", "mention_id"]))
    rel = _numbered(rel, ["sent_idx", "cs", "ce", "label", "sig"],
                    "rnum")

    # ---- argument resolution: explode args, route each target through
    # the entity T map or the event E map, format "Role:Ref" sorted by
    # (role, ref class, ref number) ------------------------------------
    owners = (ev.select("doc_id", "mention_id",
                        F.lit("E").alias("okind"),
                        F.col("enum").alias("onum"))
              .unionByName(rel.select("doc_id", "mention_id",
                                      F.lit("R").alias("okind"),
                                      F.col("rnum").alias("onum"))))
    args_x = (kept.where(F.col("kind") != "tbm")
              .select("doc_id", "mention_id",
                      F.explode("args").alias("arg"))
              .select("doc_id", "mention_id",
                      F.initcap(F.col("arg")["role"]).alias("role"),
                      F.col("arg")["mention_id"].alias("ref_mid")))
    ent_refs = t_map.where(~F.col("is_trigger")).select(
        "doc_id", F.col("mention_id").alias("ref_mid"),
        F.lit("T").alias("ref_kind"), F.col("tnum").alias("ref_num"))
    ev_refs = ev.select(
        "doc_id", F.col("mention_id").alias("ref_mid"),
        F.lit("E").alias("ref_kind"), F.col("enum").alias("ref_num"))
    resolved = (args_x
                .join(ent_refs.unionByName(ev_refs),
                      ["doc_id", "ref_mid"]))
    arg_str = (resolved
               .groupBy("doc_id", "mention_id")
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct("role", "ref_kind", "ref_num"))),
                       lambda s: F.concat(s["role"], F.lit(":"),
                                          s["ref_kind"],
                                          s["ref_num"].cast("string"))),
                   " ").alias("args_str")))

    ev = ev.join(arg_str, ["doc_id", "mention_id"], "left")
    rel = rel.join(arg_str, ["doc_id", "mention_id"], "left")
    return {"textbound": t_rows, "t_map": t_map, "events": ev,
            "relations": rel}


def brat_standoff(mentions: DataFrame, sentences: DataFrame,
                  with_notes: bool = True) -> DataFrame:
    """(doc_id, ann_id, line): the full standoff document, one row per
    annotation line (Brat.dumpStandoff :132-154 — sorted T then R then E
    then #-notes). Concatenate ``line`` per doc (or write with
    ``partitionBy(doc_id)``) for on-disk ``.ann`` files."""
    t = standoff_tables(mentions, sentences)

    t_lines = t["textbound"].select(
        "doc_id",
        F.concat(F.lit("T"), F.col("tnum").cast("string")).alias("ann_id"),
        F.lit(0).alias("cls"), F.col("tnum").alias("num"),
        F.concat(F.lit("T"), F.col("tnum").cast("string"), F.lit(_TAB),
                 "label", F.lit(" "), F.col("cs").cast("string"),
                 F.lit(" "), F.col("ce").cast("string"), F.lit(_TAB),
                 "text").alias("line"))
    r_lines = t["relations"].select(
        "doc_id",
        F.concat(F.lit("R"), F.col("rnum").cast("string")).alias("ann_id"),
        F.lit(1).alias("cls"), F.col("rnum").alias("num"),
        F.concat(F.lit("R"), F.col("rnum").cast("string"), F.lit(_TAB),
                 "label",
                 F.when(F.col("args_str").isNotNull(),
                        F.concat(F.lit(" "), "args_str"))
                 .otherwise(F.lit(""))).alias("line"))
    e_lines = t["events"].select(
        "doc_id",
        F.concat(F.lit("E"), F.col("enum").cast("string")).alias("ann_id"),
        F.lit(2).alias("cls"), F.col("enum").alias("num"),
        F.concat(F.lit("E"), F.col("enum").cast("string"), F.lit(_TAB),
                 "label", F.lit(":T"), F.col("trig_tnum").cast("string"),
                 F.when(F.col("args_str").isNotNull(),
                        F.concat(F.lit(" "), "args_str"))
                 .otherwise(F.lit(""))).alias("line"))
    out = t_lines.unionByName(r_lines).unionByName(e_lines)

    if with_notes:
        # FoundByRule notes (Brat.displayRuleName :156-160): one per
        # mention that owns a standoff id, numbered per doc in (id class,
        # id number) order — entity T rows (not triggers), then R, then E
        kept = mentions.where(F.col("keep"))
        fb = kept.select("doc_id", "mention_id", "found_by")
        ids = (t["t_map"].where(~F.col("is_trigger"))
               .select("doc_id", "mention_id", F.lit(0).alias("cls"),
                       F.col("tnum").alias("num"),
                       F.concat(F.lit("T"), F.col("tnum").cast("string"))
                       .alias("ref_id"))
               .unionByName(
                   t["relations"].select(
                       "doc_id", "mention_id", F.lit(1).alias("cls"),
                       F.col("rnum").alias("num"),
                       F.concat(F.lit("R"),
                                F.col("rnum").cast("string"))
                       .alias("ref_id")))
               .unionByName(
                   t["events"].select(
                       "doc_id", "mention_id", F.lit(2).alias("cls"),
                       F.col("enum").alias("num"),
                       F.concat(F.lit("E"),
                                F.col("enum").cast("string"))
                       .alias("ref_id"))))
        # two mentions can share one T row — one note per id, the
        # lexicographically-first rule name wins (deterministic)
        notes = (ids.join(fb, ["doc_id", "mention_id"])
                 .groupBy("doc_id", "cls", "num", "ref_id")
                 .agg(F.min("found_by").alias("found_by")))
        nw = Window.partitionBy("doc_id").orderBy("cls", "num")
        notes = (notes.withColumn("nnum", F.row_number().over(nw))
                 .select(
                     "doc_id",
                     F.concat(F.lit("#"), F.col("nnum").cast("string"))
                     .alias("ann_id"),
                     F.lit(3).alias("cls"), F.col("nnum").alias("num"),
                     F.concat(F.lit("#"), F.col("nnum").cast("string"),
                              F.lit(_TAB), F.lit("FoundByRule "),
                              "ref_id", F.lit(_TAB), "found_by")
                     .alias("line")))
        out = out.unionByName(notes)

    return (out.select("doc_id", "ann_id", "line", "cls", "num")
            .sortWithinPartitions("doc_id", "cls", "num")
            .drop("cls", "num"))


def brat_ann_text(mentions: DataFrame, sentences: DataFrame,
                  with_notes: bool = True) -> DataFrame:
    """(doc_id, ann): each document's complete ``.ann`` file content, lines
    in Brat.dumpStandoff's emit order (T block, R block, E block, notes —
    :148-152, each sorted by id number). Pair with ``brat_doc_text`` for
    the ``.txt`` half; write with ``.write.partitionBy('doc_id')`` (or
    foreachPartition to files) — assembly is one per-doc aggregate, no
    driver collect."""
    lines = brat_standoff(mentions, sentences, with_notes=with_notes)
    cls = (F.when(F.substring("ann_id", 1, 1) == "T", 0)
           .when(F.substring("ann_id", 1, 1) == "R", 1)
           .when(F.substring("ann_id", 1, 1) == "E", 2)
           .otherwise(3))
    num = F.substring("ann_id", 2, 18).cast("int")
    return (lines
            .withColumn("cls", cls).withColumn("num", num)
            .groupBy("doc_id")
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("cls", "num", "line"))),
                    lambda s: s["line"]),
                "\n").alias("ann")))


def syntax_standoff(sentences: DataFrame) -> DataFrame:
    """(doc_id, ann_id, line): POS tags as T rows + dependency edges as
    ``R<n>\\t<label> governor:T<g> dependent:T<d>`` rows
    (Brat.syntaxStandoff :190-214). Token T ids are document order, so
    the id of token j in a sentence is (tokens before the sentence) +
    j + 1 — pure per-doc running-sum arithmetic, no id join."""
    layout = sentence_layout(sentences)
    w = (Window.partitionBy("doc_id").orderBy("sent_idx")
         .rowsBetween(Window.unboundedPreceding, -1))
    s2 = layout.withColumn(
        "tok_base", F.coalesce(F.sum(F.size("words")).over(w), F.lit(0)))

    toks = (s2.select(
        "doc_id", "sent_idx", "tok_base", "sent_base",
        F.posexplode(F.arrays_zip("words", "tags", "start_offsets",
                                  "end_offsets")).alias("j", "z")))
    tid = (F.col("tok_base") + F.col("j") + 1).cast("string")
    t_lines = toks.select(
        "doc_id",
        F.concat(F.lit("T"), tid).alias("ann_id"),
        F.concat(F.lit("T"), tid, F.lit(_TAB), F.col("z.tags"),
                 F.lit(" "),
                 (F.col("sent_base") + F.col("z.start_offsets"))
                 .cast("string"),
                 F.lit(" "),
                 (F.col("sent_base") + F.col("z.end_offsets"))
                 .cast("string"),
                 F.lit(_TAB), F.col("z.words")).alias("line"))

    deps = (s2.select("doc_id", "sent_idx", "tok_base",
                      F.explode("deps").alias("d"))
            .select("doc_id", "sent_idx", "tok_base",
                    F.col("d.src").alias("src"),
                    F.col("d.dst").alias("dst"),
                    F.col("d.label").alias("label")))
    rw = Window.partitionBy("doc_id").orderBy("sent_idx", "src", "dst",
                                              "label")
    rid = F.row_number().over(rw).cast("string")
    gov = (F.col("tok_base") + F.col("src") + 1).cast("string")
    dep = (F.col("tok_base") + F.col("dst") + 1).cast("string")
    r_lines = deps.select(
        "doc_id",
        F.concat(F.lit("R"), rid).alias("ann_id"),
        F.concat(F.lit("R"), rid, F.lit(_TAB), "label",
                 F.lit(" governor:T"), gov,
                 F.lit(" dependent:T"), dep).alias("line"))
    return t_lines.unionByName(r_lines)


# ---------------------------------------------------------------------------
# reader (Brat.parseAnnotation :33-90)
# ---------------------------------------------------------------------------

def parse_standoff(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse standoff lines into typed annotation rows — the
    Brat.parseAnnotation dispatch as one declarative select. Input: any
    DataFrame with a ``line`` column (+ passthrough doc_id if present).

    Output columns: ann_id, ann_type ('textbound'|'relation'|'event'|
    'equivalence'|'attribute'|'normalization'), label, spans
    (array<struct<start,end>> — ';'-separated discontinuous spans kept,
    :49), text, trigger, args (array<struct<role,ref>>), norm_resource,
    norm_entry. Unrecognized ids drop (:88)."""
    c = F.split(F.col(line_col), _TAB)
    ann_id = F.trim(F.get(c, 0))
    body = F.get(c, 1)
    elems = F.split(body, " ")
    head = F.get(elems, 0)
    first = F.substring(ann_id, 1, 1)

    def _args(from_idx: int) -> Column:
        tail = F.when(
            F.size(elems) > from_idx,
            F.slice(elems, from_idx + 1, F.size(elems) - from_idx)
        ).otherwise(F.array().cast("array<string>"))
        return F.filter(
            F.transform(
                tail,
                lambda e: F.struct(
                    F.get(F.split(e, ":"), 0).alias("role"),
                    F.get(F.split(e, ":"), 1).alias("ref"))),
            lambda a: a["ref"].isNotNull() & (a["role"] != ""))

    # T: label then "start end[;start end...]" then text
    t_label = F.get(F.split(body, " "), 0)
    t_offsets = F.trim(F.substring(body, F.length(t_label) + 2, 1 << 20))
    t_spans = F.filter(
        F.transform(
            F.split(t_offsets, ";"),
            lambda s: F.struct(
                F.try_element_at(F.split(F.trim(s), " "), F.lit(1))
                .cast("int").alias("start"),
                F.try_element_at(F.split(F.trim(s), " "), F.lit(2))
                .cast("int").alias("end"))),
        lambda sp: sp["start"].isNotNull() & sp["end"].isNotNull())

    ann_type = (F.when(first == "T", "textbound")
                .when(first == "R", "relation")
                .when(first == "E", "event")
                .when(first == "*", "equivalence")
                .when(first.isin("A", "M"), "attribute")
                .when(first == "N", "normalization"))

    _out_names = {"ann_id", "ann_type", "label", "spans", "text",
                  "trigger", "args", "norm_resource", "norm_entry"}
    keep_cols = [f for f in lines.columns
                 if f != line_col and f not in _out_names]
    out = lines.select(
        *keep_cols,
        ann_id.alias("ann_id"),
        ann_type.alias("ann_type"),
        F.when(first == "T", t_label)
        .when(first == "E", F.get(F.split(head, ":"), 0))
        .otherwise(head).alias("label"),
        F.when(first == "T", t_spans).alias("spans"),
        F.when(first.isin("T", "N"), F.get(c, 2))
        .when(first == "M", F.get(elems, 2)).alias("text"),
        F.when(first == "E", F.get(F.split(head, ":"), 1))
        .alias("trigger"),
        # A/M attributes carry a bare target id (BinaryAttribute /
        # MultiValueAttribute :74-81); M's value lands in `text`
        F.when(first.isin("R", "E"), _args(1))
        .when(first.isin("A", "M"),
              F.array(F.struct(F.lit("target").alias("role"),
                               F.get(elems, 1).alias("ref"))))
        .when(first == "*",
              F.transform(F.slice(elems, 2, F.size(elems) - 1),
                          lambda e: F.struct(F.lit("equiv").alias("role"),
                                             e.alias("ref"))))
        .alias("args"),
        F.when(first == "N", F.get(F.split(F.get(elems, 2), ":"), 0))
        .alias("norm_resource"),
        F.when(first == "N", F.get(F.split(F.get(elems, 2), ":"), 1))
        .alias("norm_entry"),
    )
    # a standoff line must have id<TAB>body (Brat.parseAnnotation reads
    # chunks(1) unconditionally; malformed lines drop instead of throwing)
    return out.where(F.col("ann_type").isNotNull() &
                     F.col("label").isNotNull())


def align_bio_labels(sentences: DataFrame,
                     textbound: DataFrame) -> DataFrame:
    """BIO token labels from text-bound annotations
    (Brat.alignSentenceLabels :122-126 / alignTokenLabel :108-126 /
    BratUtils entity injection): per token, the LAST (highest T number)
    overlapping annotation wins; B- when the token starts at/before the
    span start, else I-; 'O' otherwise.

    ``textbound``: (doc_id, tnum, label, spans) — parse_standoff output
    filtered to ann_type='textbound' (tnum = int of ann_id tail) or
    standoff_tables()['textbound'] with spans packed. Join is banded per
    doc (equi on doc_id, overlap as a filter) — per-doc annotation counts
    are bounded, so the join stays local after the doc shuffle."""
    layout = sentence_layout(sentences)
    toks = (layout
            .select("doc_id", "sent_idx",
                    F.posexplode(F.zip_with(
                        "start_offsets", "end_offsets",
                        lambda s, e: F.struct(s.alias("s"), e.alias("e"))))
                    .alias("tok_idx", "se"),
                    "sent_base")
            .select("doc_id", "sent_idx", "tok_idx",
                    (F.col("sent_base") + F.col("se.s")).alias("ts"),
                    (F.col("sent_base") + F.col("se.e")).alias("te")))
    spans = (textbound
             .select("doc_id", "tnum", "label",
                     F.explode("spans").alias("sp"))
             .select("doc_id", "tnum", "label",
                     F.col("sp.start").alias("cs"),
                     F.col("sp.end").alias("ce")))
    hit = (toks.join(spans, "doc_id")
           .where((F.col("ts") < F.col("ce")) &
                  (F.col("cs") < F.col("te")))
           .groupBy("doc_id", "sent_idx", "tok_idx")
           .agg(F.max_by(
               F.concat(
                   F.when(F.col("ts") <= F.col("cs"), "B-")
                   .otherwise("I-"),
                   "label"),
               F.struct("tnum", "cs")).alias("bio")))
    labeled = (toks.join(hit, ["doc_id", "sent_idx", "tok_idx"], "left")
               .withColumn("bio", F.coalesce("bio", F.lit("O"))))
    return (labeled
            .groupBy("doc_id", "sent_idx")
            .agg(F.transform(
                F.array_sort(F.collect_list(
                    F.struct("tok_idx", "bio"))),
                lambda s: s["bio"]).alias("entities")))
