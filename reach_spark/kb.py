"""Bioresources KB tier: public dictionary TSV loader + label routing.

Reference parity: the reference grounds against ~27 public dictionary TSVs
(bioresources/src/main/resources/org/clulab/reach/kb/) routed by
`bioresources/src/main/resources/application.conf:3-264` — per-KB namespace,
entity label, priority and key-transform class (DefaultKeyTransforms vs
Protein/Family/OrganAuxKeyTransforms). Column layout per
`grounding/TsvIMKBFactory.scala:34-53`: text <TAB> id [<TAB> species]
(override KBs add <TAB> namespace <TAB> label).

Spark shape: one `spark.read.csv` scan per file (tab-separated, quoting
off), normalized to the grounding KB schema and unioned — ~356k rows / a few
MB of strings, loaded once per session and BROADCAST into the grounding
join. The big mention side never shuffles; at 100 TB the KB directory lives
on shared storage (HDFS/S3) and the same loader reads it there
(SPARK_GRAFT_KB_DIR).

The shipped files are public dictionary DATA (see kb_data/PROVENANCE.md) —
they are loaded, never imported or executed.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession, functions as F

# characters removed by the canonical key, mirrored JVM-side; MUST stay in
# sync with resources.canonical_key (test_kb.py asserts the mirror)
_CANON_CHARS = "'\"/.- "


def canon_expr(col: F.Column) -> F.Column:
    """JVM mirror of resources.canonical_key: lower, trim, strip ' \" / . -
    and spaces (reference canonicalKey, ReachKBKeyTransforms.scala:20-24)."""
    return F.translate(F.lower(F.trim(col)), _CANON_CHARS, "")


# ---------------------------------------------------------------------------
# Routing table — application.conf:3-264 re-expressed as data.
# (file, ns, label, conf_priority, has_species_col, is_protein, is_family,
#  tclass) — tclass selects which aux key transforms may match this KB:
#  'default' | 'protein' | 'family' | 'organ'.
# Override KBs (5-column, per-row ns+label) are listed with ns=None.
# ---------------------------------------------------------------------------
_S = dict
KB_SOURCES: list[dict] = [
    # override tier (reference adHoc/override KBs, consulted before statics)
    _S(file="NER-Grounding-Override.tsv", ns=None, label=None, priority=1,
       species=True, protein=False, family=False, tclass="default",
       override=True),
    _S(file="Phase3-Override.tsv", ns=None, label=None, priority=2,
       species=True, protein=False, family=False, tclass="default",
       override=True),
    # static tier — conf priorities 1..24 (application.conf order)
    _S(file="bio_process.tsv", ns="go", label="BioProcess", priority=11),
    _S(file="biopax-cellular_component.tsv", ns="uaz",
       label="Cellular_component", priority=12),
    _S(file="GO-subcellular-locations.tsv", ns="go",
       label="Cellular_component", priority=13),
    _S(file="uniprot-subcellular-locations.tsv", ns="uniprot",
       label="Cellular_component", priority=14),
    _S(file="uniprot-proteins-sample.tsv", ns="uniprot",
       label="Gene_or_gene_product", priority=15, species=True,
       protein=True, tclass="protein"),
    _S(file="protein-ontology-fragments.tsv", ns="proonto",
       label="Gene_or_gene_product", priority=18, protein=True,
       tclass="protein"),
    _S(file="biopax-gene_or_gene_product.tsv", ns="uaz",
       label="Gene_or_gene_product", priority=19, family=True),
    _S(file="PFAM-families.tsv", ns="pfam", label="Family", priority=20,
       family=True, tclass="family"),
    _S(file="ProteinFamilies.tsv", ns="interpro", label="Family",
       priority=21, species=True, family=True, tclass="family"),
    _S(file="famplex.tsv", ns="fplx", label="Family", priority=22,
       family=True),
    _S(file="biopax-simple_chemical.tsv", ns="uaz", label="Simple_chemical",
       priority=23),
    _S(file="hms-drugs.tsv", ns="pubchem", label="Simple_chemical",
       priority=25),
    _S(file="InterPro-protein-domains.tsv", ns="uaz", label="Site",
       priority=27),
    _S(file="mesh-disease.tsv", ns="mesh", label="Disease", priority=28),
    _S(file="Cellosaurus.tsv", ns="cellosaurus", label="CellLine",
       priority=29, species=True),
    _S(file="atcc.tsv", ns="atcc", label="CellLine", priority=30,
       species=True),
    _S(file="CellOntology.tsv", ns="cl", label="CellType", priority=31),
    _S(file="Uberon.tsv", ns="uberon", label="Organ", priority=32,
       tclass="organ"),
    _S(file="Species.tsv", ns="taxonomy", label="Species", priority=33),
    _S(file="tissue-type.tsv", ns="tissuelist", label="TissueType",
       priority=34),
]
# static-tier priorities sit ABOVE the inline override KB (priorities 1-8 in
# resources.kb_rows — the fixture-pinned analog of the reference's override
# tier), so an inline entry always outranks a bioresources entry for the
# same key; bioresources fill the space the inline KB never covered.
KB_PRIORITY_OFFSET = 10


def kb_data_dir() -> str | None:
    """Resolve the KB directory: $SPARK_GRAFT_KB_DIR, else the packaged
    kb_data/ next to this module (repo checkout), else ./reach_spark/kb_data
    (spark-submit with --py-files zip, cwd = repo root). None → bioresources
    tier unavailable (engine falls back to the inline KB only)."""
    cands = [os.environ.get("SPARK_GRAFT_KB_DIR"),
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "kb_data"),
             os.path.join(os.getcwd(), "reach_spark", "kb_data")]
    for c in cands:
        if c and os.path.isdir(c):
            return c
    return None


_READ_SCHEMA = ("c0 string, c1 string, c2 string, c3 string, c4 string")


def kb_tsv_sha(kb_dir: str) -> str:
    """Joint sha256 of every routed TSV, in KB_SOURCES order — written into
    kb_union.parquet/TSV_SHA at build time so staleness of the derived
    parquet is detectable without mtimes (git does not preserve them)."""
    import hashlib
    h = hashlib.sha256()
    for src in KB_SOURCES:
        path = os.path.join(kb_dir, src["file"])
        if os.path.exists(path):
            h.update(src["file"].encode())
            with open(path, "rb") as fh:
                h.update(fh.read())
    return h.hexdigest()


def load_kb_full(spark: SparkSession, inline_sha: str,
                 kb_dir: str | None = None) -> DataFrame | None:
    """The FULL grounding KB (inline override tier ∪ bioresources tier) as
    one precomputed parquet (tools/build_kb_parquet.py). This is the
    grounding hot path's load format: a single 4 MB columnar scan — no
    per-session createDataFrame of the inline tier, no union plan, no
    multi-source materialization (the union shape cost ~10 s of cold time
    per session, measured at sf0.1). Returns None when the artifact is
    absent or stale (stamp mismatch) — callers fall back to building the
    union from parts."""
    kb_dir = kb_dir or kb_data_dir()
    if kb_dir is None:
        return None
    pq = os.path.join(kb_dir, "kb_full.parquet")
    stamp = os.path.join(kb_dir, "kb_full.STAMP")
    if not (os.path.isdir(pq) and os.path.exists(stamp)):
        return None
    with open(stamp) as fh:
        if fh.read().strip() != kb_full_stamp(kb_dir, inline_sha):
            return None
    return spark.read.schema(
        "kb_label string, key string, ns string, id string, "
        "species string, kb_priority int, is_protein_kb boolean, "
        "is_family_kb boolean, tclass string").parquet(pq)


def kb_full_stamp(kb_dir: str, inline_sha: str) -> str:
    """Staleness stamp for kb_full.parquet: covers both source tiers (the
    routed TSVs and the inline kb_rows code)."""
    import hashlib
    return hashlib.sha256(
        (kb_tsv_sha(kb_dir) + ":" + inline_sha).encode()).hexdigest()


SYNTH_KB_ROWS = 3_000_000
SYNTH_KB_KEYS = 2_700_000


def synth_kb(spark: SparkSession, n_rows: int = SYNTH_KB_ROWS,
             n_keys: int = SYNTH_KB_KEYS) -> DataFrame:
    """Deterministic UniProt-scale synthetic KB (grounding-schema rows).

    The reference's full production dictionaries (uniprot-proteins-*.tsv /
    chebi.tsv / PubChem.tsv, ~3M rows) are build-time fetches named in
    `bioresources/src/main/resources/application.conf:42,158,178` and are
    not in the checkout; this generator stands in for them at the same
    cardinality so the grounding join strategy can be proven PAST
    broadcast comfort (the shipped 357k-row tier broadcasts in ~10 MB; at
    3M+ rows the executor-memory math flips and the vocabulary side must
    broadcast instead — grounding.ground_map(kb_broadcast=False)).

    Pure column expressions over spark.range — no driver lists, no
    Python; generates distributed at any n. `n_keys < n_rows` makes the
    tail keys ambiguous (multiple entries per key) so rank-1 routing is
    exercised at scale. The identical arithmetic is SQL-expressible for
    the DuckDB oracle (kg_queries.g1_kb_3m).
    """
    i = F.col("id")
    return (spark.range(n_rows)
            .select(
                F.when(i % 3 == 0, "Gene_or_gene_product")
                 .when(i % 3 == 1, "Family")
                 .otherwise("Simple_chemical").alias("kb_label"),
                F.concat(F.lit("syn"), (i % n_keys).cast("string"))
                 .alias("key"),
                F.when(i % 4 == 0, "uniprot").when(i % 4 == 1, "chebi")
                 .when(i % 4 == 2, "go").otherwise("pubchem").alias("ns"),
                F.concat(F.lit("P"), i.cast("string")).alias("id"),
                F.when(i % 3 == 0, "human").when(i % 3 == 1, "")
                 .otherwise("mouse").alias("species"),
                (F.lit(1) + (i % 7)).cast("int").alias("kb_priority"),
                (i % 3 == 0).alias("is_protein_kb"),
                (i % 3 == 1).alias("is_family_kb"),
                F.when(i % 3 == 0, "protein").when(i % 3 == 1, "family")
                 .otherwise("default").alias("tclass")))


def _norm_species(col: F.Column) -> F.Column:
    s = F.lower(F.trim(F.coalesce(col, F.lit(""))))
    return F.when(s.isin("human", "homo sapiens"), F.lit("human")) \
            .otherwise(s)


def load_bioresources(spark: SparkSession,
                      kb_dir: str | None = None) -> DataFrame | None:
    """All routed dictionary files → one KB DataFrame
    (kb_label, key, ns, id, species, kb_priority, is_protein_kb,
    is_family_kb, tclass). ~356k rows; callers broadcast it.

    Prefers the precomputed kb_union.parquet (tools/build_kb_parquet.py —
    single columnar read, ~0.2 s) and falls back to normalizing the TSVs
    directly (~5 s of codegen + scan), e.g. when SPARK_GRAFT_KB_DIR points
    at a raw reference-format dictionary directory."""
    kb_dir = kb_dir or kb_data_dir()
    if kb_dir is None:
        return None
    pq = os.path.join(kb_dir, "kb_union.parquet")
    if os.path.isdir(pq):
        # explicit schema: skips footer-based schema inference (one job +
        # ~0.5 s of first-read latency on the grounding hot path)
        return spark.read.schema(
            "kb_label string, key string, ns string, id string, "
            "species string, kb_priority int, is_protein_kb boolean, "
            "is_family_kb boolean, tclass string").parquet(pq)
    return load_bioresources_csv(spark, kb_dir)


def load_bioresources_csv(spark: SparkSession, kb_dir: str) -> DataFrame:
    """Normalize the raw dictionary TSVs (the parquet builder + fallback
    path). ONE csv scan over all files (a 26-way union of per-file scans
    costs 26 file listings + jobs — measured ~12 s vs ~1 s single-scan);
    per-file routing metadata rides in on input_file_name() through a
    broadcast join against the KB_SOURCES table."""
    paths, metas = [], []
    for src in KB_SOURCES:
        path = os.path.join(kb_dir, src["file"])
        if not os.path.exists(path):        # sample KBs are optional
            continue
        paths.append(path)
        metas.append((src["file"], src.get("ns"), src.get("label"),
                      src["priority"] + KB_PRIORITY_OFFSET,
                      bool(src.get("species")), bool(src.get("protein")),
                      bool(src.get("family")), src.get("tclass", "default"),
                      bool(src.get("override"))))
    if not paths:
        return None
    meta = spark.createDataFrame(
        metas, "src string, m_ns string, m_label string, kb_priority int, "
               "has_species boolean, is_protein_kb boolean, "
               "is_family_kb boolean, tclass string, is_override boolean")
    raw = (spark.read.schema(_READ_SCHEMA)
           .options(sep="\t", quote="", mode="PERMISSIVE")
           .csv(paths)
           .withColumn("src", F.url_decode(F.element_at(
               F.split(F.input_file_name(), "/"), -1))))
    # some upstream files have CRLF endings: strip \r everywhere
    cols = {c: F.regexp_replace(F.col(c), "\r", "") for c in
            ("c0", "c1", "c2", "c3", "c4")}
    ns = F.when(F.col("is_override"),
                F.lower(F.trim(F.coalesce(cols["c3"], F.lit("uaz"))))) \
          .otherwise(F.col("m_ns"))
    label = F.when(F.col("is_override"),
                   F.trim(F.coalesce(cols["c4"], F.lit("BioEntity")))) \
             .otherwise(F.col("m_label"))
    species = F.when(F.col("has_species"), _norm_species(cols["c2"])) \
               .otherwise(F.lit(""))
    return (raw.join(F.broadcast(meta), "src")
            .select(label.alias("kb_label"),
                    canon_expr(cols["c0"]).alias("key"),
                    ns.alias("ns"),
                    F.trim(cols["c1"]).alias("id"),
                    species.alias("species"),
                    F.col("kb_priority"),
                    F.col("is_protein_kb"), F.col("is_family_kb"),
                    F.col("tclass"))
            .where((F.col("key") != "") & F.col("id").isNotNull()
                   & (F.col("id") != "")))


# ---------------------------------------------------------------------------
# lookup sets for the aux key transforms (reference KBLookupSet.scala +
# ReachKBConstants.scala filenames)
# ---------------------------------------------------------------------------

def _read_lookup(name: str) -> list[str]:
    d = kb_data_dir()
    if d is None:
        return []
    path = os.path.join(d, name)
    if not os.path.exists(path):
        return []
    with open(path, encoding="utf-8") as fh:
        return [ln.strip().lower() for ln in fh
                if ln.strip() and not ln.startswith("#")]


@lru_cache(maxsize=1)
def gene_name_affixes() -> tuple[str, ...]:
    """geneNameAffixes.txt (isGeneNamePrefix lookup, KBLookupSet.scala:67-73)
    — falls back to the subset exercised by the ported tests when the data
    dir is absent."""
    got = _read_lookup("geneNameAffixes.txt")
    if got:
        return tuple(sorted(set(got)))
    return ("activated", "egfp", "flag", "gfp", "gst", "ha", "kd", "lent",
            "lenti", "lentivirus", "luc", "mchy", "myc", "myr", "phospho",
            "phosphorylated", "raav", "sh", "shrna", "wt", "yfp")


@lru_cache(maxsize=1)
def protein_domains() -> tuple[str, ...]:
    """proteinDomains-short.txt (~1.3k names) — the stripProteinDomainKT
    gate (HyphenatedNamePat + isProteinDomain,
    ReachKBKeyTransforms.scala:75-79): single-hyphen names only, RHS must
    be a known short domain name. Consumed as an `isin` membership set
    (Catalyst InSet, O(1) per row) — a 1.3k-way regex alternation walks
    branches linearly per row and bloats codegen."""
    domains = _read_lookup("proteinDomains-short.txt") or \
        ["sh2", "sh3", "ptb", "ph", "rbd", "gap", "gef", "bd", "zu5"]
    return tuple(sorted(set(domains)))


@lru_cache(maxsize=1)
def ner_stoplist() -> frozenset[str]:
    """ner_stoplist.txt — surface forms never emitted as entity mentions."""
    return frozenset(_read_lookup("ner_stoplist.txt"))
