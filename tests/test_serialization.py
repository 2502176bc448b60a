"""Mention JSON (de)serialization + display summaries
(reach_spark.serialization / display — reference
mentions/serialization/json/*.scala, display/package.scala; the
TestJsonSerialization round-trip discipline)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row


@pytest.fixture(scope="module")
def ser_results(spark):
    from reach_spark.pipeline import extract_dataframe
    docs = spark.createDataFrame(
        [Row(doc_id="0", spans=[Row(
            kind="text",
            text="Mek was not phosphorylated by Erk. "
                 "ASPP1 (also known as p53BP1) binds p53.",
            media_ref="", offset=0)]),
         Row(doc_id="1", spans=[Row(
             kind="text",
             text="TopBP1 phosphorylates ATR on serine 125.",
             media_ref="", offset=0)])])
    res = extract_dataframe(spark, docs, with_coref=False)
    return res["resolved_mentions"], res["sentences"]


def _rows(df):
    return sorted(map(str, df.collect()))


def _nullable(dt):
    """Normalize nullability recursively — a JSON scan is always nullable
    (the format cannot enforce non-null), so round-trip schema equality
    is up-to-nullability by construction."""
    from pyspark.sql import types as T
    if isinstance(dt, T.StructType):
        return T.StructType([
            T.StructField(f.name, _nullable(f.dataType), True)
            for f in dt.fields])
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_nullable(dt.elementType), True)
    return dt


def test_json_roundtrip_files(spark, tmp_path, ser_results):
    """write_mentions_json -> read_mentions_json is row-identical and
    schema-identical up to nullability (schema sidecars defeat JSON
    inference loss; JSON reads are inherently nullable)."""
    from reach_spark.serialization import (read_mentions_json,
                                           write_mentions_json)
    m, s = ser_results
    out = str(tmp_path / "rt")
    write_mentions_json(m, s, out)
    back = read_mentions_json(spark, out)
    assert _nullable(back["mentions"].schema) == _nullable(m.schema)
    assert _nullable(back["sentences"].schema) == _nullable(s.schema)
    assert _rows(back["mentions"]) == _rows(m)
    assert _rows(back["sentences"]) == _rows(s)


def test_complete_ast_roundtrip(spark, ser_results):
    """mentions_complete_json <-> mentions_from_complete_json — the
    completeAST single-string form (package.scala:30-35) round-trips."""
    from reach_spark.serialization import (mentions_complete_json,
                                           mentions_from_complete_json)
    import json
    m, s = ser_results
    payload = mentions_complete_json(m, s)
    ast = json.loads(payload)
    assert set(ast) == {"documents", "mentions"}
    assert set(ast["documents"]) == {"0", "1"}
    back = mentions_from_complete_json(spark, payload, m.schema, s.schema)
    assert _rows(back["mentions"]) == _rows(m)
    assert _rows(back["sentences"]) == _rows(s)


def test_complete_ast_empty(spark, ser_results):
    """Empty mention set still round-trips (limit(0) guard)."""
    from reach_spark.serialization import (mentions_complete_json,
                                           mentions_from_complete_json)
    m, s = ser_results
    payload = mentions_complete_json(m.limit(0), s.limit(0))
    back = mentions_from_complete_json(spark, payload, m.schema, s.schema)
    assert back["mentions"].count() == 0
    assert back["sentences"].count() == 0


def test_summarize_mentions_blocks(ser_results):
    """display.summarize_mentions: the reference console block — TEXT /
    TOKENS (idx,word,tag) / ENTITY LABELS / LEMMAS / DEPS / counted
    entity+event summaries with args (display/package.scala:14-44)."""
    from reach_spark.display import summarize_mentions
    m, s = ser_results
    rows = {(r.doc_id, r.sent_idx): r.summary
            for r in summarize_mentions(m, s).collect()}
    blk = rows[("0", 1)]  # the ASPP1/binding sentence
    assert blk.startswith("sentence #1\nTEXT:   ASPP1 ")
    assert "(0,ASPP1,NN)" in blk
    assert "\nENTITIES: 3" in blk
    assert "\nEVENTS:   2" in blk
    assert "EventMention => binds" in blk
    assert "\t  theme: ASPP1" in blk and "\t  theme: p53" in blk
    assert "RelationMention => " in blk  # the Alias relation
    assert blk.endswith("=" * 50)
    # a sentence with no mentions still renders with zero counts
    neg = rows[("0", 0)]
    assert "ENTITIES: " in neg and "TOKENS: (0,Mek," in neg


def test_summarize_mods_shown(ser_results):
    """PTM site modifications surface in the mods line
    (summarizeModifications analog)."""
    from reach_spark.display import summarize_mentions
    m, s = ser_results
    blk = {(r.doc_id, r.sent_idx): r.summary
           for r in summarize_mentions(m, s).collect()}[("1", 0)]
    assert "mods: " in blk or "Site" in blk
