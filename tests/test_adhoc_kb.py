"""Ad-hoc KB tier (grounding.adhoc_kb_df / kb_with_adhoc — reference
AdHocIMKBFactory.scala:35-66 + ReachEntityLookup adhoc-first routing): a
user dictionary consulted before every built-in KB, loadable from tuples or
the reference 4-5 column TSV format, threaded through
pipeline.extract_dataframe(adhoc_kb=...).
"""

from pyspark.sql import functions as F

from reach_spark.grounding import (adhoc_kb_df, ground_map, kb_dataframe,
                                   kb_with_adhoc)

MENT = "canonical string, label string, text string"


def _gmap_for(spark, kb, text, label="Gene_or_gene_product"):
    ents = spark.createDataFrame([(None, label, text)], MENT)
    return {r["text"]: (r["g_ns"], r["g_id"])
            for r in ground_map(ents, kb).collect()}


def test_adhoc_overrides_builtin(spark):
    """'MEK' grounds to the inline uniprot:Q02750 without the ad-hoc tier
    and to the user's id with it — adhoc wins over a same-surface builtin
    (reference: adhoc KBs are searched first)."""
    kb = kb_dataframe(spark)
    assert _gmap_for(spark, kb, "MEK")["MEK"] == ("uniprot", "Q02750")
    adhoc = adhoc_kb_df(spark, [("MEK", "mylab", "CUSTOM-0001", "human")])
    got = _gmap_for(spark, kb_with_adhoc(kb, adhoc), "MEK")
    assert got["MEK"] == ("mylab", "CUSTOM-0001")


def test_adhoc_novel_surface_and_no_op(spark):
    """A surface unknown to every builtin grounds via the ad-hoc tier
    instead of the uaz failsafe; unrelated surfaces are untouched."""
    kb = kb_dataframe(spark)
    base = _gmap_for(spark, kb, "Zorblaxin")
    assert base["Zorblaxin"][0] == "uaz"  # failsafe without the tier
    adhoc = adhoc_kb_df(spark, [("zorblaxin", "chebi", "CHEBI:99999")])
    merged = kb_with_adhoc(kb, adhoc)
    got = _gmap_for(spark, merged, "Zorblaxin")
    assert got["Zorblaxin"] == ("chebi", "CHEBI:99999")
    # regression: an unrelated builtin surface is unchanged by the union
    assert (_gmap_for(spark, merged, "MEK")["MEK"]
            == _gmap_for(spark, kb, "MEK")["MEK"])


def test_adhoc_key_transforms_apply(spark):
    """Ad-hoc keys are canonized like every builtin tier, so the standard
    transforms (case/strip) match variant surfaces."""
    kb = kb_dataframe(spark)
    adhoc = adhoc_kb_df(spark, [("my-protein", "mylab", "CUSTOM-7")])
    got = _gmap_for(spark, kb_with_adhoc(kb, adhoc), "My-Protein")
    assert got["My-Protein"] == ("mylab", "CUSTOM-7")


def test_adhoc_tsv_format(spark, tmp_path):
    """Reference ad-hoc TSV: (text, id, species, namespace[, type]); blank
    species defaults to human (AdHocIMKBFactory.processFields); malformed
    rows are skipped."""
    p = tmp_path / "adhoc.tsv"
    p.write_text("zorblaxin\tZBX-1\t\tmylab\tprotein\n"
                 "\n"
                 "only-two-cols\tno\n"
                 "quuxin\tQX-9\tmouse\tmylab\n")
    adhoc = adhoc_kb_df(spark, str(p))
    rows = {r["key"]: (r["ns"], r["id"], r["species"], r["kb_priority"])
            for r in adhoc.collect()}
    assert rows == {"zorblaxin": ("mylab", "ZBX-1", "human", 0),
                    "quuxin": ("mylab", "QX-9", "mouse", 0)}


def test_extract_dataframe_adhoc_threading(spark):
    """End-to-end: extract_dataframe(adhoc_kb=...) re-grounds a fixture
    entity to the user's id in the mentions table."""
    from reach_spark.pipeline import extract_dataframe
    docs = spark.createDataFrame(
        [("d1", [{"kind": "text", "text": "Ras phosphorylates MEK.",
                  "media_ref": "", "offset": 0}])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")
    adhoc = adhoc_kb_df(spark, [("MEK", "mylab", "CUSTOM-0001", "human")])
    res = extract_dataframe(spark, docs, with_coref=False, persist=False,
                            adhoc_kb=adhoc)
    ground = {r["text"]: (r["g_ns"], r["g_id"])
              for r in res["mentions"]
              .where((F.col("kind") == "tbm") & (F.col("g_id").isNotNull()))
              .select("text", "g_ns", "g_id").collect()}
    assert ground["MEK"] == ("mylab", "CUSTOM-0001")
    assert ground["Ras"][0] == "uniprot"  # builtins untouched
