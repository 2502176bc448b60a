"""[T5] Assembly precedence sieves: deterministic causal-precedence
relations between EERs.

Reference: `assembly/src/main/scala/org/clulab/reach/assembly/sieves/
Sieves.scala` — the PrecedenceSieves cascade. This module re-expresses the
two deterministic members Spark-first (the ML members —
`featureBasedClassifier*` (Sieves.scala:332-371) and the corpus-trained
BioDRB pattern set — are out of scope, same declared divergence as P2):

1. `intersentential_marker_precedence` — discourse-connective rules
   (intersentential.yml: 'Furthermore, ...', 'As a consequence ...',
   'The second step is ...'): an event in sentence i precedes an event in
   sentence i+1 when the later sentence OPENS with a consequence/sequence
   connective and the two events share a participant (the shared-argument
   anchoring that the reference's cross-sentence Odin rules encode via
   argument coref).
2. `reichenbach_precedence` — tense/aspect (TAM) classification of each
   verbal event trigger, then the exact Reichenbach relation table of
   Sieves.scala:219-249 over ordered same-document event pairs.

Sieve composition follows the reference's `noExistingPrecedence`
(Constraints.scala:43-66): a later sieve never overwrites an earlier
sieve's (before, after) EER pair — implemented as a left-anti join on the
unordered pair key.

TAM surface re-expression (tense_aspect.yml:12-110): the reference gates
aux rules on UD `aux` edges and matrix rules on VBD/VBZ tags; this engine
has the deterministic POS-lite layer (extract.py) which merges VBD into
VBN, so tense is read from the literal auxiliary chain directly before the
trigger token (documented divergence, same decision surface):
  will/'ll            -> FutureTense            (fut_aux, MD lemma=will)
  was/were/did/had    -> PastTense              (past_aux, VBD auxiliaries)
  is/has/does or
  modal != will       -> PresentTense           (pres_aux, VBZ | MD!will)
  has/have/had        -> Perfective             (perf_aux, lemma=have)
  being/VBG aux       -> Progressive            (prog_aux; never yields a
                                                 relation — the table only
                                                 matches none/Perfective)
  matrix (no aux):  trigger -ed -> PastTense, -s -> PresentTense
Nominal triggers ('the phosphorylation of X') carry no TAM -> none/none,
exactly as in the reference (TAM rules require verbal tags).

Spark shape: TAM is a pure column expression over the sentences table's
token array (one broadcast-free join on (doc_id, sent_idx) — both sides
are event/sentence rows of the same partition-friendly key). Pair
generation is a doc-scoped self-join; the quadratic blow-up is bounded by
events-per-document (papers, not corpora), and the join key carries
doc_id so it co-partitions at any corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# aux-chain skip words: adverbs/negation may sit between the auxiliary and
# the verb ('has recently been phosphorylated', 'was not degraded')
_SKIP = ("not", "n't", "also", "been", "only", "since", "thus",
         "thereby", "strongly", "rapidly", "specifically")
_AUXES = ("will", "'ll", "shall", "was", "were", "did", "had",
          "is", "has", "does", "are", "am", "do", "have",
          "can", "could", "may", "might", "must", "should", "would",
          "being")

# the Reichenbach relation table, verbatim (Sieves.scala:219-249);
# keys: (e1_tense, e1_aspect, e2_tense, e2_aspect) -> before|after
_REICHENBACH = {
    ("PastTense", "none", "PastTense", "Perfective"): "after",
    ("PastTense", "none", "FutureTense", "none"): "before",
    ("PastTense", "none", "FutureTense", "Perfective"): "before",
    ("PastTense", "Perfective", "PastTense", "none"): "before",
    ("PastTense", "Perfective", "PresentTense", "none"): "before",
    ("PastTense", "Perfective", "PresentTense", "Perfective"): "before",
    ("PastTense", "Perfective", "FutureTense", "none"): "before",
    ("PastTense", "Perfective", "FutureTense", "Perfective"): "before",
    ("PresentTense", "none", "PastTense", "Perfective"): "after",
    ("PresentTense", "none", "FutureTense", "none"): "before",
    ("PresentTense", "Perfective", "PastTense", "Perfective"): "after",
    ("PresentTense", "Perfective", "FutureTense", "none"): "before",
    ("PresentTense", "Perfective", "FutureTense", "Perfective"): "before",
    ("FutureTense", "none", "PastTense", "none"): "after",
    ("FutureTense", "none", "PastTense", "Perfective"): "after",
    ("FutureTense", "none", "PresentTense", "none"): "after",
    ("FutureTense", "none", "PresentTense", "Perfective"): "after",
    ("FutureTense", "Perfective", "PastTense", "none"): "after",
    ("FutureTense", "Perfective", "PastTense", "Perfective"): "after",
    ("FutureTense", "Perfective", "PresentTense", "Perfective"): "after",
}

# sentence-opening consequence/sequence connectives
# (intersentential.yml: cross-sentence-furthermore, -as-a-X,
#  -consequently, -next-step, -event-led-to anchors)
_OPENERS_1 = ("furthermore", "consequently", "subsequently", "then",
              "next", "afterwards", "thereafter", "accordingly")
_OPENERS_3 = ("as a consequence", "as a result", "the second step",
              "following this", "in turn ,")


def _tam_cols(trigger_start: F.Column, trigger_text: F.Column,
              words: F.Column) -> tuple[F.Column, F.Column]:
    """(tense, aspect) expressions for one event trigger.

    The aux chain is the contiguous run of auxiliary/skip tokens directly
    before the trigger (lookback 3, matching the reference patterns'
    effective span: 'will have been', 'has recently been')."""
    def tok(k: int) -> F.Column:
        # words is 0-indexed by token; element_at is 1-based; the token
        # k places before the trigger sits at position trigger_start-k+1.
        # Guard position >= 1: try_element_at tolerates out-of-RANGE but
        # still raises INVALID_INDEX_OF_ZERO on position 0 (ANSI),
        # which a sentence-initial trigger would produce.
        pos = trigger_start - k + F.lit(1)
        return F.lower(F.coalesce(
            F.when(pos >= 1, F.try_element_at(words, pos)),
            F.lit("")))

    t1, t2, t3 = tok(1), tok(2), tok(3)
    in_chain1 = t1.isin(*_AUXES, *_SKIP)
    in_chain2 = in_chain1 & t2.isin(*_AUXES, *_SKIP)
    in_chain3 = in_chain2 & t3.isin(*_AUXES, *_SKIP)
    aux1 = F.when(in_chain1 & t1.isin(*_AUXES), t1)
    aux2 = F.when(in_chain2 & t2.isin(*_AUXES), t2)
    aux3 = F.when(in_chain3 & t3.isin(*_AUXES), t3)
    chain = F.array_compact(F.array(aux1, aux2, aux3))
    has = lambda *ws: F.arrays_overlap(chain, F.array(*[F.lit(w) for w in ws]))  # noqa: E731

    trig = F.lower(F.coalesce(trigger_text, F.lit("")))
    verbal_past = trig.rlike("(ed|en)$")
    verbal_pres = trig.rlike("[a-z](es|ys|ts|ls|ds|rs|ms|ns)$")
    no_aux = F.size(chain) == 0

    tense = (
        F.when(has("will", "'ll"), "FutureTense")
        .when(has("was", "were", "did", "had"), "PastTense")
        .when(has("is", "has", "does") |
              has("can", "could", "may", "might", "must", "should",
                  "would", "shall"), "PresentTense")
        # matrix verb (no auxiliary): tag-driven in the reference
        # (past_matrix VBD / pres_matrix VBZ)
        .when(no_aux & verbal_past, "PastTense")
        .when(no_aux & verbal_pres, "PresentTense")
        .otherwise("none"))
    aspect = (
        F.when(has("has", "have", "had"), "Perfective")
        .when(has("being"), "Progressive")
        .otherwise("none"))
    return tense, aspect


def event_tams(mentions: DataFrame, sentences: DataFrame) -> DataFrame:
    """Event rows -> (doc_id, sent_idx, mention_id, trigger_start,
    start, end, args, label, tense, aspect). One equi-join against the
    sentences table on the natural (doc_id, sent_idx) key for the token
    arrays."""
    events = (mentions.where(F.col("kind") == "event")
              .where(F.col("label") != "Generic_event")
              .select("doc_id", "sent_idx", "mention_id", "label",
                      "trigger_start", "trigger_text", "start", "end",
                      "args"))
    toks = sentences.select("doc_id", "sent_idx", "words")
    j = events.join(toks, ["doc_id", "sent_idx"], "left")
    tense, aspect = _tam_cols(F.col("trigger_start"),
                              F.col("trigger_text"), F.col("words"))
    return j.select("doc_id", "sent_idx", "mention_id", "label",
                    "trigger_start", "start", "end", "args",
                    tense.alias("tense"), aspect.alias("aspect"))


def _event_pairs(tams: DataFrame) -> DataFrame:
    """Ordered same-document event pairs e1 textually-precedes e2, with
    the reference pair-validity constraints (Constraints.scala:149-190):
    a regulation is never paired with its own controlled (either
    direction), and two events never pair when one is an argument of the
    other."""
    e1 = tams.select(
        F.col("doc_id"),
        F.col("mention_id").alias("id1"), F.col("label").alias("label1"),
        F.col("sent_idx").alias("s1"), F.col("trigger_start").alias("t1"),
        F.col("start").alias("start1"), F.col("end").alias("end1"),
        F.col("tense").alias("tense1"), F.col("aspect").alias("aspect1"),
        F.col("args").alias("args1"))
    e2 = tams.select(
        F.col("doc_id"),
        F.col("mention_id").alias("id2"), F.col("label").alias("label2"),
        F.col("sent_idx").alias("s2"), F.col("trigger_start").alias("t2"),
        F.col("start").alias("start2"), F.col("end").alias("end2"),
        F.col("tense").alias("tense2"), F.col("aspect").alias("aspect2"),
        F.col("args").alias("args2"))
    pairs = (e1.join(e2, "doc_id")
             .where((F.col("s1") < F.col("s2")) |
                    ((F.col("s1") == F.col("s2")) &
                     (F.col("t1") < F.col("t2")))))
    arg_ids = lambda c: F.transform(c, lambda a: a["mention_id"])  # noqa: E731
    is_arg = (F.array_contains(arg_ids(F.col("args1")), F.col("id2")) |
              F.array_contains(arg_ids(F.col("args2")), F.col("id1")))
    return pairs.where(~is_arg)


def _shared_participant(pairs: DataFrame) -> F.Column:
    """True when the two events share an argument canonical (the
    cross-sentence anchoring the reference encodes via argument coref)."""
    canons = lambda c: F.array_compact(  # noqa: E731
        F.transform(c, lambda a: a["canonical"]))
    return F.arrays_overlap(canons(F.col("args1")), canons(F.col("args2")))


def precedence_relations(mentions: DataFrame,
                         sentences: DataFrame) -> DataFrame:
    """The T5 sieve cascade -> (doc_id, before_id, after_id, sieve) —
    mention-level precedence rows, first-sieve-wins per unordered pair."""
    # localCheckpoint (lazy): tams is consumed by BOTH self-join sides and
    # by both sieves — without a materialization each branch re-runs the
    # mentions-sentences lineage CONCURRENTLY (the duplicated-lineage
    # pathology documented in pipeline.extract_dataframe; measured 80 s on
    # a 2-event doc). Blocks are reclaimed when the plan is GC'd.
    tams = event_tams(mentions, sentences).localCheckpoint(eager=False)
    # pairs feeds three branches (marker sieve, reichenbach, the claimed-
    # pair anti-join); one materialization instead of three self-joins
    pairs = _event_pairs(tams).localCheckpoint(eager=False)

    # --- sieve 1: intrasentential discourse markers -----------------------
    # Surface members of intrasentential.yml, re-expressed over the token
    # gap between the two (disjoint) event spans — matched as a lowered
    # space-joined string so adjacency patterns stay regexes:
    #   resulting-in   '@before "," resulting in []*? @after'   -> before
    #   leading-to     '@before(ComplexEvent) []*? leading to
    #                   [DT]? subsequent? []{0,3} @after'        -> before
    #   semicolon      '@before []{,3} ";" []{,3} @after'        -> before
    #   prep-before    '@before (before|prior to) [DT/CD/JJ]* @after'
    #   prep-after     '@after (after|following) [DT/CD/JJ]* @before'
    #   as-a-result-of '@after as a result of @before'           (flip)
    # (the which-it/where-it/when-it members need pronoun coref and stay
    # with the dep-syntax variants as the documented divergence)
    own_words = sentences.select(
        F.col("doc_id"), F.col("sent_idx").alias("s1"),
        F.col("words").alias("w1"))
    gap = F.lower(F.concat_ws(" ", F.slice(
        F.col("w1"), F.col("end1") + 1,
        F.greatest(F.col("start2") - F.col("end1"), F.lit(0)))))
    _dt = "(the|a|an|this|that|these|those|its|their|subsequent|[0-9]+)"
    rel_intra = (
        F.when(gap.rlike(r"^, (\S+ )*?resulting in( |$)"), "before")
        .when(F.col("label1").rlike("regulation|activation") &
              gap.rlike(r"(^|.* )leading to( \S+){0,5}$"), "before")
        .when(gap.rlike(r"^(\S+ ){0,3}; ?(\S+ ){0,3}\S*$") &
              gap.rlike(r"(^| );( |$)"), "before")
        .when(gap.rlike(r"^(before|prior to)( " + _dt + r")*$"), "before")
        .when(gap.rlike(r"^(after|following)( " + _dt + r")*$"), "after")
        .when(gap.rlike(r"^,? ?as a result of( " + _dt + r")?$"), "after")
        .otherwise(F.lit(None)))
    intra = (pairs
             .where(F.col("s1") == F.col("s2"))
             .where(F.col("end1") <= F.col("start2"))
             .join(own_words, ["doc_id", "s1"], "left")
             .withColumn("rel", rel_intra)
             .where(F.col("rel").isNotNull())
             .select("doc_id",
                     F.when(F.col("rel") == "before", F.col("id1"))
                      .otherwise(F.col("id2")).alias("before_id"),
                     F.when(F.col("rel") == "before", F.col("id2"))
                      .otherwise(F.col("id1")).alias("after_id"),
                     F.lit("intrasententialMarker").alias("sieve")))

    # --- sieve 2: intersentential discourse markers ----------------------
    first_lower = F.lower(F.concat_ws(
        " ",
        F.try_element_at(F.col("w2"), F.lit(1)),
        F.try_element_at(F.col("w2"), F.lit(2)),
        F.try_element_at(F.col("w2"), F.lit(3))))
    opener = (F.try_element_at(F.col("w2"), F.lit(1)).isNotNull() &
              (F.lower(F.try_element_at(F.col("w2"), F.lit(1)))
               .isin(*_OPENERS_1) |
               first_lower.isin(*_OPENERS_3)))
    # sentence adjacency: sent_idx is span-scoped (offset*1000 + i), so
    # "the next sentence" is the successor in document order, not idx+1
    from pyspark.sql import Window
    succ = sentences.select(
        F.col("doc_id"), F.col("sent_idx").alias("s1"),
        F.lead("sent_idx").over(
            Window.partitionBy("doc_id").orderBy("sent_idx"))
        .alias("next_idx"))
    sent_tokens = sentences.select(
        F.col("doc_id"), F.col("sent_idx").alias("s2"),
        F.col("words").alias("w2"))
    marker = (pairs
              .join(succ, ["doc_id", "s1"], "left")
              .where(F.col("s2") == F.col("next_idx"))
              .where(_shared_participant(pairs))
              .join(sent_tokens, ["doc_id", "s2"], "left")
              .where(opener)
              .select("doc_id",
                      F.col("id1").alias("before_id"),
                      F.col("id2").alias("after_id"),
                      F.lit("intersententialMarker").alias("sieve")))

    # --- sieve 2: Reichenbach tense/aspect --------------------------------
    rel = F.lit(None).cast("string")
    for (t1, a1, t2, a2), out in _REICHENBACH.items():
        rel = F.when((F.col("tense1") == t1) & (F.col("aspect1") == a1) &
                     (F.col("tense2") == t2) & (F.col("aspect2") == a2),
                     F.lit(out)).otherwise(rel)
    reich = (pairs.withColumn("rel", rel).where(F.col("rel").isNotNull())
             .select("doc_id",
                     F.when(F.col("rel") == "before", F.col("id1"))
                      .otherwise(F.col("id2")).alias("before_id"),
                     F.when(F.col("rel") == "before", F.col("id2"))
                      .otherwise(F.col("id1")).alias("after_id"),
                     F.lit("reichenbachPrecedence").alias("sieve")))

    # noExistingPrecedence: earlier sieves win on the unordered pair key
    # (reference order: intrasentential -> intersentential -> reichenbach);
    # each later sieve only fills pairs no earlier sieve decided
    pair_key = F.array_sort(F.array("before_id", "after_id"))
    out = intra.localCheckpoint(eager=False)
    for later in (marker, reich):
        claimed = out.select("doc_id", pair_key.alias("pk")).distinct()
        later = (later.withColumn("pk", pair_key)
                 .join(claimed, ["doc_id", "pk"], "left_anti").drop("pk"))
        out = out.unionByName(later).localCheckpoint(eager=False)
    return out.distinct()


def reichenbach_decisions(mentions: DataFrame,
                          sentences: DataFrame) -> DataFrame:
    """The Reichenbach decision surface over a corpus: one row per
    (e1 tense/aspect, e2 tense/aspect) pair shape with the table's
    relation ('before'/'after'/'none') and the pair count. Non-empty on
    any corpus with events — used by the driver's `t5_precedence` query so
    the sieve's pair generation and relation table are exercised even on
    corpora whose tense distribution yields no positive relation."""
    tams = event_tams(mentions, sentences).localCheckpoint(eager=False)
    pairs = _event_pairs(tams)
    rel = F.lit("none")
    for (t1, a1, t2, a2), out in _REICHENBACH.items():
        rel = F.when((F.col("tense1") == t1) & (F.col("aspect1") == a1) &
                     (F.col("tense2") == t2) & (F.col("aspect2") == a2),
                     F.lit(out)).otherwise(rel)
    return (pairs.select("tense1", "aspect1", "tense2", "aspect2",
                         rel.alias("relation"))
            .groupBy("tense1", "aspect1", "tense2", "aspect2", "relation")
            .agg(F.count("*").alias("pairs")))


def precedence_eers(mentions: DataFrame, sentences: DataFrame,
                    occurrences: DataFrame) -> DataFrame:
    """Precedence at the EER level (the reference's
    storePrecedenceRelation target): mention-level precedence rows mapped
    through the occurrence log onto (subj, pred, obj, negated) equivalence
    classes, deduplicated. Two broadcast-friendly joins on (doc_id,
    event_id) — the occurrence log is already keyed that way."""
    rels = precedence_relations(mentions, sentences)
    occ = occurrences.select(
        "doc_id", F.col("event_id"),
        "subj", "pred", "obj", "negated").distinct()
    b = occ.select("doc_id", F.col("event_id").alias("before_id"),
                   F.col("subj").alias("before_subj"),
                   F.col("pred").alias("before_pred"),
                   F.col("obj").alias("before_obj"),
                   F.col("negated").alias("before_negated"))
    a = occ.select("doc_id", F.col("event_id").alias("after_id"),
                   F.col("subj").alias("after_subj"),
                   F.col("pred").alias("after_pred"),
                   F.col("obj").alias("after_obj"),
                   F.col("negated").alias("after_negated"))
    return (rels.join(b, ["doc_id", "before_id"])
                .join(a, ["doc_id", "after_id"])
            .select("before_subj", "before_pred", "before_obj",
                    "before_negated", "after_subj", "after_pred",
                    "after_obj", "after_negated", "sieve")
            .distinct())
