"""Grounding (entity linking): key-transform expansion → broadcast hash join
against the KB union table → rank-1 selection → failsafe IDs.

Reference semantics (SURVEY §2.6): [G1] label→KB routing with priorities
(ReachEntityLookup.scala:56-92, bioresources application.conf:3-264),
[G2] key transforms (ReachKBKeyTransforms.scala:20-164) — each aux transform
group is only applicable to its KB class (ProteinAuxKeyTransforms /
FamilyAuxKeyTransforms / OrganAuxKeyTransforms), [G3] first-hit ordering
(InMemoryKB.scala:121-143) with failsafe uaz IDs (AzFailsafeKBML.scala),
[G4] candidate ordering (Grounding.scala:49-54), [G5] species preference
human > none > other (ReachGrounder.scala:28-102). [G6-G7] alias
canonization + grounding share live in canonicalize.py / extract.py
find_aliases.

The KB union = the inline override tier (resources.kb_rows — the analog of
the reference's NER-Grounding-Override curated KB, priorities 1-8) plus the
public bioresources dictionary tier (reach_spark/kb.py, ~356k rows,
priorities 11+). An inline entry always outranks a bioresources entry for
the same key; the bioresources tier grounds the long tail that used to fall
through to uaz failsafe ids.

Spark shape: all key transforms are built-in string expressions (JVM,
codegen); the KB is a broadcast DataFrame; first-hit = one hash aggregation
over (transform_rank, label_match, kb_priority, species_rank) — one
broadcast hash join, no shuffle of the big side, at any corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .kb import (canon_expr, gene_name_affixes, load_bioresources,
                 load_kb_full, protein_domains)
from .resources import kb_rows

KB_COLUMNS = ["kb_label", "key", "ns", "id", "species", "kb_priority",
              "is_protein_kb", "is_family_kb"]


# per-session cache of the loaded KB. Persisted (lazily — the first
# broadcast build materializes it): a flagship run broadcasts the KB from
# several join subplans, and every broadcast build re-executes the source
# scan unless the rows sit in the block cache.
_KB_CACHE: dict[tuple[str, bool], DataFrame] = {}


def kb_inline_sha() -> str:
    """Content hash of the inline override tier (resources.kb_rows) — part
    of the kb_full.parquet staleness stamp."""
    import hashlib
    return hashlib.sha256(repr(kb_rows()).encode()).hexdigest()


def inline_kb_df(spark: SparkSession) -> DataFrame:
    """The inline override tier as a DataFrame (Arrow LocalTableScan —
    pure JVM rows at action time, no Python worker round-trip like a
    pickled-RDD createDataFrame)."""
    import pandas as pd
    return spark.createDataFrame(
        pd.DataFrame(kb_rows(), columns=KB_COLUMNS)
    ).withColumn("kb_priority", F.col("kb_priority").cast("int")).withColumn(
        "tclass",
        F.when(F.col("is_protein_kb"), F.lit("protein"))
         .when(F.col("is_family_kb"), F.lit("family"))
         .when(F.col("ns") == "uberon", F.lit("organ"))
         .otherwise(F.lit("default")))


def kb_dataframe(spark: SparkSession,
                 bioresources: bool = True) -> DataFrame:
    """Inline override tier + (when the kb_data directory is available) the
    public bioresources dictionary tier, as one broadcastable table.

    Fast path: the precomputed kb_full.parquet (tools/build_kb_parquet.py)
    — ONE columnar scan declares the whole KB. The multi-source union this
    replaces (createDataFrame ∪ parquet, coalesced) cost ~10 s of cold
    session time to materialize (measured at sf0.1); a single 4 MB parquet
    scan costs ~0.3 s and every broadcast build after the first reads the
    block cache."""
    ck = (spark.sparkContext.applicationId, bioresources)
    hit = _KB_CACHE.get(ck)
    if hit is not None:
        return hit
    out = load_kb_full(spark, kb_inline_sha()) if bioresources else None
    if out is None:
        out = inline_kb_df(spark)
        if bioresources:
            bio = load_bioresources(spark)
            if bio is not None:
                out = out.unionByName(bio).coalesce(4)
    out = out.persist()
    if len(_KB_CACHE) > 4:        # old sessions' entries are dead weight
        _KB_CACHE.clear()
    _KB_CACHE[ck] = out
    return out


def adhoc_kb_df(spark: SparkSession,
                entries,
                default_label: str = "Gene_or_gene_product") -> DataFrame:
    """Ad-hoc KB tier (reference AdHocIMKBFactory.scala:35-66 +
    ReachEntityLookup adhoc-first routing): a user-supplied dictionary
    consulted BEFORE every built-in tier.

    `entries` is either a path to a reference-format ad-hoc TSV —
    4-5 columns (text, id, species, namespace[, type]); empty species
    defaults to 'human' per AdHocIMKBFactory.processFields — or an
    in-memory list of (text, ns, id[, species[, label]]) tuples.

    Rows take `kb_priority=0`; `_best_hits` ranks `kb_priority <= 0` ahead
    of EVERYTHING (before even the transform rank), so an ad-hoc hit on any
    key transform overrides any built-in hit — the Spark re-expression of
    "adhoc KBs are searched first". Union it in with `kb_with_adhoc`, or
    pass `adhoc_kb=` to pipeline.extract_dataframe.
    """
    import pandas as pd
    if isinstance(entries, str):
        rows = []
        with open(entries, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line.strip():
                    continue
                f = line.split("\t")
                # reference AdHocIMKBFactory.tsvValidateFields requires
                # text, id AND namespace non-empty (fields 0, 1, 3)
                if (len(f) < 4 or not f[0].strip() or not f[1].strip()
                        or not f[3].strip()):
                    continue
                rows.append((f[0], f[3], f[1],
                             f[2].strip() or "human", default_label))
        entries = rows
    norm = []
    for e in entries:
        text, ns, rid = e[0], e[1], e[2]
        species = e[3] if len(e) > 3 else ""
        label = e[4] if len(e) > 4 else default_label
        norm.append((label, text, ns, rid, species.lower(), 0, False, False))
    df = spark.createDataFrame(
        pd.DataFrame(norm, columns=KB_COLUMNS)
    ).withColumn("kb_priority", F.col("kb_priority").cast("int")) \
     .withColumn("tclass", F.lit("default"))
    # keys are canonized exactly like every built-in tier, so the same
    # transform expressions match
    return df.withColumn("key", canon_expr(F.col("key")))


def kb_with_adhoc(kb: DataFrame, adhoc: DataFrame | None) -> DataFrame:
    """The KB union with an optional ad-hoc tier on top (no-op when None)."""
    return kb if adhoc is None else adhoc.unionByName(kb)


def _sq(s: str) -> str:
    """Single-quoted SQL string literal."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


from functools import lru_cache


@lru_cache(maxsize=1)
def _candidate_keys() -> list[tuple[str, Column, str]]:
    """Ordered key transforms — (name, key expression, required KB class).
    rank = reference try-order; 'any' candidates match every KB, the rest
    only KBs loaded with the matching aux-transform class
    (ReachKBKeyTransforms.scala:143-165 transform groups; e.g.
    'pthr2 family' must NOT resolve against a protein KB —
    TestProteinResolutions.scala:44-52).

    Every candidate is canonicalized (canonicalKey) after its transform, the
    same normalization applied to KB keys at load — so 'EGF receptor
    protein' → 'egfreceptor' meets the KB's 'egfreceptor'.

    A worse-ranked candidate only wins when no better-ranked key matches
    the KB, so adding transforms never changes an existing grounding."""
    raw = F.trim(F.col("text"))
    low = F.lower(raw)
    base = F.coalesce(F.col("canonical"), low)

    # stripGeneNameAffixesKT (ReachKBKeyTransforms.scala:39-57): strip
    # trailing (e)GFP suffixes, then drop every hyphen-part that is a known
    # gene-name affix (geneNameAffixes.txt); all-affix inputs fall back to
    # the last part as candidate stem; unchanged inputs yield no candidate.
    # One array literal via SQL text — per-element F.lit would cost one
    # py4j round-trip each (driver-side latency, measured in seconds)
    affix_arr = F.expr(
        "array(" + ",".join(_sq(a) for a in gene_name_affixes()) + ")")
    desuf = F.regexp_replace(low, "(-?e?gfp)+$", "")
    parts = F.split(desuf, "-")
    nonaff = F.filter(parts, lambda p: ~F.array_contains(affix_arr, p))
    gene_affix = (
        F.when(F.size(nonaff) == F.size(parts),
               F.when(desuf != low, desuf).otherwise(F.lit("")))
        .when(F.size(nonaff) == 0, F.element_at(parts, -1))
        .otherwise(F.array_join(nonaff, "-")))

    # stripMutantProteinKT: phosphor-mutation phrase, trailing '<x> <y>
    # mutant', then leading 'mutant-<x>' (ReachKBKeyTransforms.scala:60-66)
    mutant = F.coalesce(
        F.nullif(F.regexp_extract(
            low, r"^phosphorylated\s+(.*?)\s+\w+\s+mutant$", 1), F.lit("")),
        F.nullif(F.regexp_extract(low, r"^(.*?)\s+\w+\s+mutant$", 1),
                 F.lit("")),
        F.nullif(F.regexp_extract(low, r"^mutant[\s-]+(.*)$", 1),
                 F.lit("")),
        F.lit(""))

    return [
        ("canonical", canon_expr(base), "any"),
        ("lower", canon_expr(low), "any"),
        # AllKeysSuffixPat '_human' applies to every KB
        ("strip_human",
         canon_expr(F.regexp_replace(low, "_human$", "")), "any"),
        # PTMPrefixPat is CASE-SENSITIVE on the raw text: p/u + an
        # uppercase/digit start ('pSTAT1' → STAT1; 'pstat1' must fail —
        # TestProteinResolutions.scala:97-118)
        ("ptm_prefix",
         canon_expr(F.regexp_extract(
             raw, r"^(?:p|u)([A-Z0-9_-][A-Za-z0-9_-]*)$", 1)), "protein"),
        ("protein_postattr",
         canon_expr(F.regexp_replace(
             low, r"( mutant)? proteins?$| gene$| fragment$| mutant$", "")),
         "protein"),
        ("mutant_strip", canon_expr(mutant), "protein"),
        # stripProteinDomainKT: single-hyphen name whose RHS is a known
        # short protein-domain name (proteinDomains-short.txt); membership
        # via IN (InSet hash probe — a 1.3k-way regex alternation walks
        # branches linearly per row), built as ONE SQL expression — 1.3k
        # Column.isin literals would pay 1.3k py4j round-trips (~10 s of
        # driver time, measured)
        ("domain_strip",
         canon_expr(F.expr(
             "CASE WHEN regexp_extract(lower(trim(text)), "
             "'^([a-z0-9_]+)-([a-z0-9_]+)$', 2) IN (" +
             ",".join(_sq(d) for d in protein_domains()) + ") "
             "THEN regexp_extract(lower(trim(text)), "
             "'^([a-z0-9_]+)-([a-z0-9_]+)$', 1) ELSE '' END")), "protein"),
        ("gene_affixes", canon_expr(gene_affix), "protein"),
        # species prefix 'hASPP2' → 'aspp2' (GeneNamePrefixes h/m/r)
        ("species_prefix",
         F.when(base.rlike("^[hmr][a-z]{2,}[0-9]*$"),
                F.substring(base, 2, 100)).otherwise(F.lit("")), "protein"),
        ("family_suffix",
         canon_expr(F.regexp_replace(low, r"( protein)? family$", "")),
         "family"),
        ("organ_postattr",
         canon_expr(F.regexp_replace(
             low, r"( cells?| tissues?| fluids?)+$", "")), "organ"),
    ]


@lru_cache(maxsize=1)
def _candidate_key_array() -> Column:
    """The candidate-key transforms as one array<struct> column expression.
    Cached (together with _candidate_keys): these are pure unresolved
    expression trees over the literal column names (canonical, label,
    text), reusable across every grounding query in the process — building
    them costs ~1-3 s of driver-side py4j round-trips per call (the
    domain-membership InSet alone is a 1.3k-literal SQL text)."""
    return F.array(*[
        F.struct(F.lit(i).alias("t_rank"), expr.alias("key"),
                 F.lit(req).alias("req"))
        for i, (_, expr, req) in enumerate(_candidate_keys())
    ])


def _best_hits(base: DataFrame, kb: DataFrame,
               species: str | None = None,
               kb_broadcast: bool = True) -> DataFrame:
    """(canonical, label, text) → best (g_ns, g_id, g_species) among KB
    matches; rows with no match are absent (no failsafe here).

    Join strategy: the shipped 357k-row tier broadcasts comfortably
    (~10 MB). Past broadcast comfort (UniProt-scale, 3M+ rows — see
    kb.synth_kb), pass kb_broadcast=False: the CANDIDATE side broadcasts
    instead — it is the distinct surface vocabulary × ~11 transforms,
    bounded by dictionary size, never by corpus size — and the big KB is
    streamed through the broadcast hash join with NO shuffle and NO
    broadcast of the KB at any scale. Either way the big side of the
    pipeline (mentions) never shuffles."""
    keys = _candidate_key_array()
    cand = (base
            .select("canonical", "label", "text",
                    F.explode(keys).alias("k"))
            .select("canonical", "label", "text",
                    F.col("k.t_rank").alias("t_rank"),
                    F.col("k.key").alias("key"),
                    F.col("k.req").alias("req"))
            .where(F.col("key") != ""))
    if kb_broadcast:
        joined = cand.join(F.broadcast(kb), "key", "inner")
    else:
        joined = F.broadcast(cand).join(kb, "key", "inner")
    joined = joined.where((F.col("req") == "any") |
                          (F.col("req") == F.col("tclass")))
    if species is not None:
        joined = joined.where(F.col("species") == species.lower())
    # first hit = min over the composite rank — one hash aggregation with
    # map-side partial combine (vs row_number window: shuffle + full sort)
    return (
        joined
        .groupBy("canonical", "label", "text")
        .agg(_best_struct_min().alias("b"))
        .select("canonical", "label", "text",
                F.col("b.ns").alias("g_ns"),
                F.col("b.id").alias("g_id"),
                F.col("b.species").alias("g_species")))


@lru_cache(maxsize=1)
def _best_struct_min() -> Column:
    """min(struct(rank..., id, ns, species)) — the first-hit selector.

    Cached like _candidate_key_array: a pure unresolved expression tree
    over literal column names, reusable across every grounding query in
    the process (rebuilding it was ~0.2 s of py4j round-trips per call).

    Ranks: exact label match first, then protein KBs, then family KBs
    (ReachEntityLookup label→KB sequences); human > no-species > other;
    the ad-hoc tier (kb_priority <= 0) outranks EVERYTHING — reference
    ReachEntityLookup consults adhoc KBs before the labeled sequence, so
    the adhoc rank precedes even the transform rank. Constant 1 when no
    ad-hoc rows are loaded (built-in priorities start at 1): ordering is
    then byte-identical to the pre-adhoc engine."""
    label_rank = (
        F.when(F.col("kb_label") == F.col("label"), 0)
        .when(F.col("is_protein_kb"), 1)
        .when(F.col("is_family_kb"), 2)
        .otherwise(3)
    )
    species_rank = (
        F.when(F.col("species") == "human", 0)
        .when(F.col("species") == "", 1)
        .otherwise(2)
    )
    adhoc_rank = F.when(F.col("kb_priority") <= 0, 0).otherwise(1)
    return F.min(F.struct(
        adhoc_rank.alias("adhoc_rank"),
        F.col("t_rank"), label_rank.alias("label_rank"),
        F.col("kb_priority"), species_rank.alias("species_rank"),
        F.col("id"), F.col("ns"), F.col("species")))


def ground_map(entities: DataFrame, kb: DataFrame,
               kb_broadcast: bool = True) -> DataFrame:
    """(canonical, label, text) DISTINCT → (canonical, label, text, g_ns,
    g_id, g_species).

    Grounding is a pure function of the (canonical key, label, surface
    text) triple, so the map is bounded by the distinct surface vocabulary
    (≪ mention count — the dictionary + sites + failsafe terms), never by
    corpus size. This is what makes the join-back a cheap broadcast at any
    scale. The raw surface text is part of the key because one transform
    (PTM prefix) is case-sensitive.
    """
    base = (entities
            .select(F.coalesce("canonical", F.lower("text"))
                    .alias("canonical"),
                    "label", "text")
            .distinct())
    best = _best_hits(base, kb, kb_broadcast=kb_broadcast)
    # failsafe (AzFailsafeKBML): deterministic uaz id from the canonical key
    uaz = F.concat(F.lit("UAZ"),
                   F.upper(F.substring(F.sha1(F.col("canonical")), 1, 8)))
    return (base
            .join(F.broadcast(best), ["canonical", "label", "text"], "left")
            .withColumn("g_ns", F.coalesce(F.col("g_ns"), F.lit("uaz")))
            .withColumn("g_id", F.coalesce(F.col("g_id"), uaz))
            .withColumn("g_species",
                        F.coalesce(F.col("g_species"), F.lit(""))))


def ground_entities(entities: DataFrame, kb: DataFrame,
                    gmap: DataFrame | None = None) -> DataFrame:
    """entities (mention rows, kind='tbm') → + (g_ns, g_id, g_species).

    One broadcast hash join of the big mention table against the tiny
    grounding map — the big side never shuffles.
    """
    if gmap is None:
        gmap = ground_map(entities, kb)
    return (entities
            .withColumn("canonical",
                        F.coalesce("canonical", F.lower("text")))
            .join(F.broadcast(gmap), ["canonical", "label", "text"],
                  "left"))


def kb_resolve(spark: SparkSession, kb: DataFrame, queries: list[str],
               label: str = "", species: str | None = None
               ) -> dict[str, tuple[str, str] | None]:
    """IMKBLookup.resolve / resolveByASpecies analog for the ported
    Test{Protein,Family,Organ}Resolutions contracts: each query text →
    best (ns, id) through the full transform+routing engine, or None when
    no KB entry matches (NO failsafe — 'should be empty' is observable)."""
    ents = (spark.createDataFrame([(q,) for q in queries], "text string")
            .select(F.lit(None).cast("string").alias("canonical"),
                    F.lit(label).alias("label"), "text"))
    base = (ents
            .select(F.coalesce("canonical", F.lower("text"))
                    .alias("canonical"), "label", "text")
            .distinct())
    hits = {r["text"]: (r["g_ns"], r["g_id"])
            for r in _best_hits(base, kb, species=species).collect()}
    return {q: hits.get(q) for q in queries}
