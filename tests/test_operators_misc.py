"""Mutation splitting (F8), alias canonization (G6), FRIES sink (S5)."""

from pyspark.sql import Row, functions as F

from reach_spark.extract import extract_sentence
from reach_spark.pipeline import extract_dataframe
from reach_spark.resources import entity_dictionary

DICT = entity_dictionary()


def test_mutation_splitting_f8():
    """Entity with k>1 Mutant mods → k copies, one per mutation
    (ReachSystem.scala:257-275)."""
    _, mentions = extract_sentence(
        "d", 0, "The EGFR T669A L858R mutant phosphorylates ERBB3.", DICT)
    egfr = [m for m in mentions if m["kind"] == "tbm" and m["text"] == "EGFR"]
    assert len(egfr) == 2
    muts = sorted(m["mods"][0]["evidence_text"] for m in egfr)
    assert muts == ["L858R", "T669A"]
    assert len({m["mention_id"] for m in egfr}) == 2


def test_alias_relation_g6():
    _, mentions = extract_sentence(
        "d", 0, "Ras (HRAS) binds AKT.", DICT)
    aliases = [m for m in mentions if m["label"] == "Alias"]
    assert len(aliases) == 1
    texts = {a["text"] for a in aliases[0]["args"]}
    assert texts == {"Ras", "HRAS"}


def test_alias_feeds_canonicalization(spark):
    """The alias pair must land key:ras and key:hras in one component."""
    one = spark.createDataFrame([Row(doc_id="a1", spans=[
        Row(kind="text", text="Ras (HRAS) binds AKT.", media_ref="",
            offset=0)])])
    res = extract_dataframe(spark, one, with_coref=False)
    canon = res["canonical_entities"].collect()
    joint = [c for c in canon if c["names"] and
             "ras" in c["names"] and "hras" in c["names"]]
    assert len(joint) == 1


def test_fries_frames(spark, tmp_path):
    from reach_spark.fries import entity_frames, event_frames, write_fries
    one = spark.createDataFrame([Row(doc_id="f1", spans=[
        Row(kind="text", text="MEK phosphorylates Ras.", media_ref="",
            offset=0)])])
    res = extract_dataframe(spark, one, with_coref=False)
    ef = entity_frames(res["mentions"]).collect()
    assert {e["text"] for e in ef} == {"MEK", "Ras"}
    assert all(e["frame_type"] == "entity-mention" for e in ef)
    vf = event_frames(res["mentions"]).collect()
    assert any(v["type"] == "Phosphorylation" for v in vf)
    regs = [v for v in vf if v["type"] == "Positive_regulation"]
    assert regs and {a["role"] for a in regs[0]["arguments"]} == \
        {"controller", "controlled"}
    write_fries(res["mentions"], str(tmp_path))
    assert spark.read.json(str(tmp_path) + "/fries_events").count() >= 2


def test_dsv_and_plaintext_sources(spark, tmp_path):
    """S2 connectors land on the documents schema and feed the pipeline
    (reference PaperReader.scala:102-137, utils/DSVParser.scala)."""
    from reach_spark.sources import read_dsv, read_plaintext
    from reach_spark.pipeline import extract_dataframe
    tsv = tmp_path / "in.tsv"
    tsv.write_text("doc_id\ttext\nd1\tMEK phosphorylates Ras.\n"
                   "d2\tASPP1 is an inhibitor of ASPP2\n")
    docs = read_dsv(spark, str(tsv))
    assert docs.columns == ["doc_id", "spans"]
    res = extract_dataframe(spark, docs, with_coref=False, persist=False)
    preds = {r["pred"] for r in res["triples"].collect()}
    assert "Positive_regulation->Phosphorylation" in preds
    assert "Negative_activation" in preds

    txtdir = tmp_path / "txts"
    txtdir.mkdir()
    (txtdir / "p1.txt").write_text("MEK binds to Ras.")
    docs2 = read_plaintext(spark, str(txtdir))
    rows = docs2.collect()
    assert rows and rows[0]["doc_id"] == "p1"


def test_index_card_sink(spark):
    """S6 IndexCard sink: one card per triple with interaction_type."""
    from reach_spark.fries import index_cards
    from reach_spark.pipeline import extract_dataframe
    from pyspark.sql import Row
    docs = spark.createDataFrame([Row(doc_id="c1", spans=[
        Row(kind="text", text="MEK phosphorylates Ras.", media_ref="",
            offset=0)])])
    res = extract_dataframe(spark, docs, with_coref=False, persist=False)
    cards = index_cards(res["triples"]).collect()
    itypes = {c["extracted_information"]["interaction_type"] for c in cards}
    assert "increases" in itypes  # the Positive_regulation card
