"""API surface (ApiRuler / ApiServer analog): response contract, output
formats, HTTP route behavior. Reference: export/.../apis/ApiRuler.scala
(annotateText/mkResponse), export/.../server/ApiServer.scala (/api/text
routes with text+output params, /version)."""

import json
import threading
import urllib.parse
import urllib.request

import pytest

from reach_spark.api import annotate_text, make_server

SENT = "The ubiquitinated Ras protein phosphorylates AKT."


@pytest.fixture(scope="module")
def fries_response(spark):
    return annotate_text(spark, SENT, doc_id="apidoc")


def test_response_contract(fries_response):
    r = fries_response
    assert r["hasError"] is False
    assert r["requestId"].startswith("api")
    assert r["endTime"] >= r["startTime"]
    assert r["result"]


def test_fries_frames(fries_response):
    out = json.loads(fries_response["result"])
    assert {"passages", "sentences", "entities", "events",
            "context"} <= set(out)
    # frame linking: every event's sentence ref is a sentence frame id
    sent_ids = {s["frame_id"] for s in out["sentences"]}
    assert out["events"] and all(
        e["sentence"] in sent_ids for e in out["events"])
    ev_types = {e["type"] for e in out["events"]}
    assert "Phosphorylation" in ev_types
    # entity frames grounded through the KB tier
    ents = {e["text"]: e for e in out["entities"]}
    assert "AKT" in ents and ":" in ents["AKT"]["xref"]


def test_indexcard_format(spark):
    r = annotate_text(spark, SENT, out_format="indexcard")
    assert r["hasError"] is False
    cards = json.loads(r["result"])["cards"]
    itypes = {c["extracted_information"]["interaction_type"]
              for c in cards}
    assert "adds_modification" in itypes


def test_serial_json_format(spark):
    r = annotate_text(spark, SENT, out_format="serial-json")
    mentions = json.loads(r["result"])["mentions"]
    assert any(m["kind"] == "event" for m in mentions)


def test_arizona_format(spark):
    r = annotate_text(spark, SENT, out_format="arizona")
    triples = json.loads(r["result"])["triples"]
    assert any(t["pred"].endswith("Phosphorylation") for t in triples)


def test_error_path(spark):
    r = annotate_text(spark, None)         # not a string → engine error
    assert r["hasError"] is True and r["errorMessage"]
    assert r["result"] == ""


def test_http_server_roundtrip(spark):
    server = make_server(spark)
    host, port = server.server_address
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        # GET /version
        with urllib.request.urlopen(
                f"http://{host}:{port}/version") as resp:
            assert json.loads(resp.read())["version"]
        # GET /api/text?text=...&output=arizona
        q = urllib.parse.urlencode({"text": SENT, "output": "arizona"})
        with urllib.request.urlopen(
                f"http://{host}:{port}/api/text?{q}") as resp:
            assert resp.status == 200
            triples = json.loads(resp.read())["triples"]
            assert any(t_["pred"].endswith("Phosphorylation")
                       for t_ in triples)
        # POST form-encoded, default output (fries)
        body = urllib.parse.urlencode({"text": SENT}).encode()
        with urllib.request.urlopen(urllib.request.Request(
                f"http://{host}:{port}/api/text", data=body)) as resp:
            assert json.loads(resp.read())["events"]
        # missing text → 400
        try:
            urllib.request.urlopen(f"http://{host}:{port}/api/text")
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # unknown route → 404
        try:
            urllib.request.urlopen(f"http://{host}:{port}/nope")
            raise AssertionError("expected HTTP 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()
        server.server_close()


def test_run_rules_engine_cache(spark):
    """OpenSystem.scala:20-36 cachedRules semantics: a second run with
    the IDENTICAL rules string reuses the compiled engine object; a
    failing rules string is never cached."""
    from reach_spark import api
    api._RULE_ENGINE_CACHE.clear()
    rules = ("rules:\n- name: r1\n  label: L\n"
             "  pattern: '[word=KRAS]'\n")
    r1 = api.run_rules(spark, "KRAS binds MEK.", rules)
    assert r1["error"] is None and len(api._RULE_ENGINE_CACHE) == 1
    eng = api._RULE_ENGINE_CACHE[rules]
    r2 = api.run_rules(spark, "MEK binds KRAS.", rules)
    assert r2["error"] is None
    assert api._RULE_ENGINE_CACHE[rules] is eng     # reused, not rebuilt
    bad = "rules:\n- name: broken\n  pattern: '[unclosed'\n"
    rb = api.run_rules(spark, "KRAS.", bad)
    assert rb["error"] is not None
    assert bad not in api._RULE_ENGINE_CACHE        # errors not cached
