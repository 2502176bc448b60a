"""Ported Test{Protein,Family,Organ,Complex}Resolutions — the reference's
KB-grounding contract suites (main/src/test/scala/org/clulab/reach/
TestProteinResolutions.scala, TestFamilyResolutions.scala,
TestOrganResolutions.scala, TestComplexResolutions.scala), run against the
REAL public bioresources dictionaries (reach_spark/kb_data) through the
Spark grounding engine (kb_resolve → _best_hits → broadcast join).

The contracts are defined/empty per key: each aux transform group only
applies to its KB class (protein vs family vs organ), PTM-prefix stripping
is case-sensitive, gene-name affix stripping handles multi-affix hyphen
chains, and domain stripping is gated on the proteinDomains-short.txt
lookup set.
"""

import pytest
from pyspark.sql import functions as F

from reach_spark.grounding import kb_dataframe, kb_resolve


@pytest.fixture(scope="module")
def kb(spark):
    df = kb_dataframe(spark).persist()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def protein_kb(kb):
    # StaticProtein KBs: uniprot rows loaded with ProteinAuxKeyTransforms
    return kb.where((F.col("ns") == "uniprot") &
                    (F.col("tclass") == "protein"))


@pytest.fixture(scope="module")
def family_kb(kb):
    # StaticProteinFamily2 = ProteinFamilies.tsv (interpro)
    return kb.where(F.col("ns") == "interpro")


@pytest.fixture(scope="module")
def organ_kb(kb):
    # ContextOrgan = Uberon.tsv
    return kb.where(F.col("ns") == "uberon")


@pytest.fixture(scope="module")
def complex_kb(kb):
    # StaticProteinFamilyOrComplex = famplex.tsv
    return kb.where(F.col("ns") == "fplx")


def _resolve(spark, kbdf, queries, **kw):
    return kb_resolve(spark, kbdf, list(queries), **kw)


# --------------------------------------------------------------------------
# TestProteinResolutions.scala
# --------------------------------------------------------------------------

PROTEIN_DEFINED = [
    # :55-79 alternate lookups
    "PTHR2", "pthr2", "pthr2_human", "pthr2 protein", "mutant-pthr2",
    "mutant-zyx-1", "zyx-1", "zyx-1_human", "zyx-1 protein",
    "STAT1", "stat1", "STBA", "stba", "SMAD2", "Smad2", "smad2",
    "SMAD 2", "Smad 2", "smad 2", "SMAD-2", "Smad-2", "smad-2",
    # :80-88 protein domain lookup
    "PI3Kbeta-RBD", "pi3kbeta-rbd", "PI3Kbeta-DSS1_SEM1",
    "pi3kbeta-dss1_sem1", "PTHR2-ZU5", "pthr2-zu5", "pthr2-DSS1_SEM1",
    # :112-118 PTM prefix stripping (case-sensitive)
    "pSTAT1", "pSTBC", "pERK", "uERK", "uSTAT1", "uSTBA",
    # :139-165 gene name affix stripping
    "activated-STAT1", "lent-STAT1", "lenti-STAT1", "lentivirus-STAT1",
    "Lent-STAT1", "Lenti-STAT1", "Lentivirus-STAT1", "Myc-STBC",
    "rAAV-STBA", "Yfp-STBA", "YFP-STBA", "phospho-ERK",
    "phosphorylated-ERK", "ERK-KD", "ERK-kd", "ERK-KD-SHRNA",
    "ERK-kd-shrna", "Myr-Flag-Akt1", "Myr-Flag-Akt-1", "Sh-Myr-Flag-Akt1",
    "SH-MYR-FLAG-Akt-1", "GFP-Mchy-SH", "GFP-KRAS-KD", "GFP-KRAS-Kd",
    "WT-Gfp-KRAS-Kd-shRNA",
]

PROTEIN_EMPTY = [
    # :43-52 not in KB / family transforms not applicable to proteins
    "NOTINKB", "notinkb", "notinkb_human", "notinkb protein",
    "notinkb family", "pthr2 family", "zyx-1 family",
    # :90-95 domain lookup gates
    "NotInKB-RBD", "zyx-1-rbd", "PI3K-C2-alpha-RBD",
    # :97-110 PTM prefix gates (case-sensitive, no hyphen form)
    "pNOTINKB", "pnotinkb", "uNOTINKB", "unotinkb",
    "PSTAT1", "Pstat1", "pstat1", "uerk", "ustat1", "ustba",
    # :121-136 affix stripping gates
    "prefix-NOTINKB", "suffix-notinkb", "xxx-NOTINKB", "u-notinkb",
    "rAAV", "shRNA", "KD-shRNA", "Gfp-kd", "Gfp-SH-kd-shRNA",
    "Yfp-virus-YFP", "KD-VIRUS-shRNA", "Gfp-Virus-kd",
]


def test_protein_resolutions_defined(spark, protein_kb):
    got = _resolve(spark, protein_kb, PROTEIN_DEFINED)
    missing = [q for q, v in got.items() if v is None]
    assert not missing, f"should resolve but did not: {missing}"


def test_protein_resolutions_empty(spark, protein_kb):
    got = _resolve(spark, protein_kb, PROTEIN_EMPTY)
    extra = [(q, v) for q, v in got.items() if v is not None]
    assert not extra, f"should NOT resolve but did: {extra}"


def test_protein_resolve_by_species(spark, protein_kb):
    """resolveByASpecies (TestProteinResolutions.scala:168-199)."""
    human = _resolve(spark, protein_kb,
                     ["pthr2", "pthr2_human", "pthr2 protein",
                      "PTHR2 protein", "mutant-pthr2"], species="human")
    assert all(v is not None for v in human.values()), human
    ce = _resolve(spark, protein_kb,
                  ["zyx-1", "zyx-1_human", "zyx-1 protein", "mutant-zyx-1"],
                  species="Caenorhabditis elegans")
    assert all(v is not None for v in ce.values()), ce
    wrong = _resolve(spark, protein_kb,
                     ["NotInKB", "zyx-1", "zyx-1_human", "zyx-1 protein",
                      "mutant-zyx-1", "pthr2 family"], species="frog")
    assert all(v is None for v in wrong.values()), wrong


def test_protein_real_accessions(spark, protein_kb):
    """The sample protein KB carries real public UniProt accessions."""
    got = _resolve(spark, protein_kb, ["PTHR2", "STAT1", "SMAD2"])
    assert got["PTHR2"] == ("uniprot", "P49190")
    assert got["STAT1"][1] in ("P42224", "P076E00")  # bioresources | inline
    assert got["SMAD2"] is not None


# --------------------------------------------------------------------------
# TestFamilyResolutions.scala (IP-PF = ProteinFamilies.tsv)
# --------------------------------------------------------------------------

FAMILY_DEFINED = [
    "PTHR21244", "pthr21244", "pthr21244_human", "pthr21244_Human",
    "pthr21244_HUMAN", "pthr21244 family", "pthr21244 Family",
    "pthr21244 FAMILY", "hk", "hk_human",
]

FAMILY_EMPTY = [
    "NOTINKB", "notinkb", "notinkb_human", "notinkb protein",
    "notinkb family",
    # protein transforms not applicable to family KBs:
    "pthr21244 protein", "mutant-pthr21244", "hk protein", "mutant-hk",
]


def test_family_resolutions_defined(spark, family_kb):
    got = _resolve(spark, family_kb, FAMILY_DEFINED)
    missing = [q for q, v in got.items() if v is None]
    assert not missing, f"should resolve but did not: {missing}"


def test_family_resolutions_empty(spark, family_kb):
    got = _resolve(spark, family_kb, FAMILY_EMPTY)
    extra = [(q, v) for q, v in got.items() if v is not None]
    assert not extra, f"should NOT resolve but did: {extra}"


# --------------------------------------------------------------------------
# TestOrganResolutions.scala (OctKBL = Uberon.tsv + OrganAuxKeyTransforms)
# --------------------------------------------------------------------------

ORGAN_DEFINED = [
    "blood plasm", "Brevis Fossa", "liver parenchyma", "liver lobe",
    "liver cell plate", "mesometrium",
    "blood plasm cell", "blood plasm cells", "blood plasm tissue",
    "blood plasm tissues", "Brevis Fossa cell", "Liver parenchyma cell",
    "Liver parenchyma cells", "Liver Parenchyma tissue",
    "Liver Parenchyma tissues", "liver lobe cell", "liver lobe cells",
    "liver lobe fluid", "liver lobe fluids", "liver lobe tissue",
    "liver lobe tissues", "liver cell plate cell", "liver cell plate cells",
    "liver cell plate tissue", "liver cell plate tissues",
    "mesometrium cell", "mesometrium cells", "mesometrium tissue",
    "mesometrium tissues", "mesometrium fluid", "mesometrium fluids",
]

ORGAN_EMPTY = [
    "NOTINKB", "notinkb", "notinkb cell", "notinkb cells",
    "notinkb tissue", "notinkb tissues", "notinkb fluid", "notinkb fluids",
]


def test_organ_resolutions_defined(spark, organ_kb):
    got = _resolve(spark, organ_kb, ORGAN_DEFINED)
    missing = [q for q, v in got.items() if v is None]
    assert not missing, f"should resolve but did not: {missing}"


def test_organ_resolutions_empty(spark, organ_kb):
    got = _resolve(spark, organ_kb, ORGAN_EMPTY)
    extra = [(q, v) for q, v in got.items() if v is not None]
    assert not extra, f"should NOT resolve but did: {extra}"


# --------------------------------------------------------------------------
# TestComplexResolutions.scala (BE-PC = famplex.tsv)
# --------------------------------------------------------------------------

def test_complex_resolutions(spark, complex_kb):
    empty = _resolve(spark, complex_kb, [
        "NOTINKB", "notinkb", "notinkb_human", "notinkb protein",
        "notinkb family", "mutant-zyx-1", "pthr2 family", "zyx-1 family"])
    extra = [(q, v) for q, v in empty.items() if v is not None]
    assert not extra, f"should NOT resolve but did: {extra}"
    defined = _resolve(spark, complex_kb, ["9-1-1 complex", "14-3-3"])
    assert all(v is not None and v[0] == "fplx" for v in defined.values()), \
        defined


# --------------------------------------------------------------------------
# KB loader invariants
# --------------------------------------------------------------------------

def test_kb_scale_and_namespaces(kb):
    """The union KB is real-scale (≥300k rows, vs the 432-row inline tier)
    and covers the routed namespaces of application.conf:3-264."""
    assert kb.count() >= 300_000
    ns = {r["ns"] for r in kb.select("ns").distinct().collect()}
    assert {"uniprot", "pfam", "interpro", "fplx", "go", "mesh",
            "cellosaurus", "atcc", "cl", "uberon", "taxonomy",
            "tissuelist", "proonto", "uaz"} <= ns


def test_kb_parquet_fresh():
    """kb_union.parquet (the derived load-format cache) must match the
    TSVs it was built from — rerun tools/build_kb_parquet.py after any
    kb_data change."""
    import os
    from reach_spark.kb import kb_data_dir, kb_tsv_sha
    d = kb_data_dir()
    pq = os.path.join(d, "kb_union.parquet")
    if not os.path.isdir(pq):
        return                      # no cache → loader uses the CSV path
    with open(os.path.join(d, "kb_union.TSV_SHA")) as fh:
        assert fh.read().strip() == kb_tsv_sha(d), \
            "kb_union.parquet is stale: python tools/build_kb_parquet.py"


def test_kb_full_parquet_fresh():
    """kb_full.parquet (the grounding hot path's single-scan load format)
    must cover the current TSVs AND the current inline kb_rows code."""
    import os
    from reach_spark.grounding import kb_inline_sha
    from reach_spark.kb import kb_data_dir, kb_full_stamp
    d = kb_data_dir()
    pq = os.path.join(d, "kb_full.parquet")
    if not os.path.isdir(pq):
        return                      # no cache → loader builds the union
    with open(os.path.join(d, "kb_full.STAMP")) as fh:
        assert fh.read().strip() == kb_full_stamp(d, kb_inline_sha()), \
            "kb_full.parquet is stale: python tools/build_kb_parquet.py"


def test_kb_full_fast_path_matches_union(spark):
    """The kb_full.parquet fast path ≡ the inline ∪ bioresources union it
    precomputes (count + per-(ns, kb_priority) counts)."""
    from reach_spark.grounding import inline_kb_df, kb_inline_sha
    from reach_spark.kb import load_bioresources, load_kb_full
    fast = load_kb_full(spark, kb_inline_sha())
    if fast is None:
        return
    union = inline_kb_df(spark).unionByName(load_bioresources(spark))
    a = {tuple(r) for r in
         fast.groupBy("ns", "kb_priority", "tclass").count().collect()}
    b = {tuple(r) for r in
         union.groupBy("ns", "kb_priority", "tclass").count().collect()}
    assert a == b


def test_parquet_csv_paths_agree(spark):
    """The parquet fast path and the CSV fallback produce identical KB
    unions (count + per-namespace counts)."""
    from reach_spark.kb import (kb_data_dir, load_bioresources,
                                load_bioresources_csv)
    d = kb_data_dir()
    a = load_bioresources(spark, d)
    b = load_bioresources_csv(spark, d)
    rows_a = {tuple(r) for r in
              a.groupBy("ns").count().collect()}
    rows_b = {tuple(r) for r in
              b.groupBy("ns").count().collect()}
    assert rows_a == rows_b


def test_canon_expr_mirrors_python(spark):
    """canon_expr (JVM) ≡ resources.canonical_key (Python) — the KB load
    key and the lookup key must normalize identically."""
    from reach_spark.kb import canon_expr
    from reach_spark.resources import canonical_key
    samples = ["A-B and/or C", "MAN_human", "WO-MAN", "K-Ras", "MCF-7",
               "liver cell plate", "PI3Kbeta-RBD", " padded ",
               "it's a 'quoted' name", "dot.ted", 'd"q', "Homo/sapiens"]
    df = spark.createDataFrame([(s,) for s in samples], "text string")
    got = {r["text"]: r["k"]
           for r in df.select("text",
                              canon_expr(F.col("text")).alias("k"))
           .collect()}
    for s in samples:
        assert got[s] == canonical_key(s), (s, got[s], canonical_key(s))


def test_override_tier_wins(spark, kb):
    """An inline override entry (priority 1-8) outranks a bioresources
    entry for the same key — e.g. 'Erk' is in ProteinFamilies.tsv
    (IPR008349) but the inline uniprot tier still grounds it."""
    got = kb_resolve(spark, kb, ["ERK"], label="Gene_or_gene_product")
    assert got["ERK"] is not None and got["ERK"][0] == "uniprot"


def test_bioresources_fills_failsafe_gap(spark):
    """Names absent from the inline 432-row tier now ground to real public
    ids instead of uaz failsafe (the round-2 'KB breadth' gap)."""
    from reach_spark.grounding import ground_map
    ents = spark.createDataFrame(
        [(None, "Simple_chemical", "imatinib"),
         (None, "Disease", "neuroblastoma"),
         (None, "CellLine", "U-87 MG"),
         (None, "BioProcess", "glycogen biosynthesis")],
        "canonical string, label string, text string")
    gm = {r["text"]: (r["g_ns"], r["g_id"])
          for r in ground_map(ents, kb_dataframe(spark)).collect()}
    assert gm["neuroblastoma"][0] == "mesh"
    assert gm["U-87 MG"][0] == "cellosaurus"
    assert gm["glycogen biosynthesis"][0] == "go"


def test_context_kb_lister_types(spark):
    """ReachContextKBLister analog: every reference context type
    (ReachContextKBLister.scala:13) is represented, entries carry ns:id,
    and rows are distinct."""
    from reach_spark.kg_queries import QUERIES
    fn, _ = QUERIES["c1_context_kb_entries"]
    df = fn(spark, "/root/testdata/sf0.001")
    by_type = {r["ctx_type"]: r["n"] for r in
               df.groupBy("ctx_type").agg(F.count("*").alias("n"))
               .collect()}
    for t in ("CellLine", "CellType", "Species", "TissueType", "Organ",
              "Cellular_component"):
        assert by_type.get(t, 0) > 0, t
    row = df.first()
    assert row["ns_id"] == f"{row['ns']}:{row['id']}"
    assert df.count() == df.distinct().count()
