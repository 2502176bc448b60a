"""Programmatic + REST API surface: the reference's ApiRuler / ApiServer
re-expressed over the Spark engine.

Reference parity:
- `export/src/main/scala/org/clulab/reach/export/apis/ApiRuler.scala`
  (annotateText:55-65, mkResponse:95-118): a request annotates one text
  and returns a heterogeneous response map `{result, hasError
  [, errorMessage]}` where `result` is the serialized output in the
  requested format (`fries` default | `indexcard` | `serial-json`).
- `export/src/main/scala/org/clulab/reach/export/server/ApiServer.scala`
  (:168-230): HTTP routes `GET|POST /api/text` with parameters `text` and
  `output` (default fries), plus `/version`. The reference runs Akka HTTP;
  this engine uses the stdlib `http.server` (no external dependency) —
  the route/parameter/response contract is the same.
- Request ids follow `utils/IncrementingId.scala` (`api<N>`,
  ApiRuler.scala:27-31,99).

Spark shape: an API request is ONE document, so the request path reuses
the corpus engine (`pipeline.extract_dataframe`) on a 1-row DataFrame and
collects the frames driver-side — exactly the reference's in-process
ReachSystem call. Corpus-scale work stays on `pipeline.run_batch`; a
production server fronting a cluster enqueues into that batch path
instead of blocking a request on it.
"""

from __future__ import annotations

import itertools
import json
import time

from pyspark.sql import DataFrame, Row, SparkSession

from .fries import (context_frames, entity_frames, event_frames,
                    index_cards, passage_frames, sentence_frames)
from .pipeline import extract_dataframe

OUTPUT_FORMATS = ("fries", "indexcard", "serial-json", "arizona")

# shared counter for request numbering (IncrementingId.scala analog)
_request_counter = itertools.count(1)


def text_documents(spark: SparkSession, text: str,
                   doc_id: str = "api") -> DataFrame:
    """One interleaved-document row from a raw text string (the FriesEntry
    the reference builds in annotateText — one passage, no media)."""
    spans = [{"kind": "text", "text": text, "media_ref": "", "offset": 0}]
    return spark.createDataFrame([Row(doc_id=doc_id, spans=spans)])


def _rows(df: DataFrame) -> list[dict]:
    """Collect a frame DataFrame as plain JSON-safe dicts (driver-side —
    the API path is one document)."""
    return [json.loads(r) for r in df.toJSON().collect()]


def _fries_result(results: dict, doc_df: DataFrame) -> str:
    """The FRIES frame collections for one request, as one JSON document
    (FriesOutput emits passage/sentence/entity/event/context collections;
    spec doc/fries-data-representation-spec.txt)."""
    ctx = results["context"]
    return json.dumps({
        "passages": _rows(passage_frames(doc_df)),
        "sentences": _rows(sentence_frames(results["sentences"])),
        "entities": _rows(entity_frames(results["mentions"])),
        "events": _rows(event_frames(results["mentions"], ctx)),
        "context": _rows(context_frames(ctx)),
    }, sort_keys=True)


def _indexcard_result(results: dict) -> str:
    return json.dumps(
        {"cards": _rows(index_cards(results["triple_occurrences"]))},
        sort_keys=True)


def _serial_result(results: dict) -> str:
    """SerialJsonOutput analog: the resolved mention rows themselves."""
    return json.dumps({"mentions": _rows(results["resolved_mentions"])},
                      sort_keys=True)


def _arizona_result(results: dict) -> str:
    """The Arizona/CMU tabular sink (triples.py S7) as JSON rows — the
    reference's CMU output format addition (ApiRuler.scala:20)."""
    return json.dumps({"triples": _rows(results["triples"])},
                      sort_keys=True)


def annotate_text(spark: SparkSession, text: str, doc_id: str = "api",
                  out_format: str = "fries") -> dict:
    """ApiRuler.annotateText: text → response map. `result` holds the
    serialized output; errors come back as `{hasError: True,
    errorMessage}` instead of raising (ApiRuler.scala:108-118)."""
    start = time.time()
    request_id = f"api{next(_request_counter)}"
    try:
        if not isinstance(text, str) or not text.strip():
            raise ValueError("text must be a non-empty string")
        fmt = (out_format or "fries").lower()
        doc_df = text_documents(spark, text, doc_id)
        results = extract_dataframe(spark, doc_df)
        try:
            if fmt == "indexcard":
                result = _indexcard_result(results)
            elif fmt == "serial-json":
                result = _serial_result(results)
            elif fmt in ("arizona", "cmu"):
                result = _arizona_result(results)
            elif fmt == "bel":
                from .bel import bel_statements
                result = json.dumps(
                    {"statements": _rows(bel_statements(
                        results["triples"]))}, sort_keys=True)
            elif fmt == "biopax":
                from .biopax import biopax_elements
                result = json.dumps(
                    {"elements": _rows(biopax_elements(
                        results["triples"]))}, sort_keys=True)
            else:                      # "fries" and the reference's
                result = _fries_result(results, doc_df)   # catch-all
        finally:
            results.cleanup()
        return {"result": result, "hasError": False,
                "requestId": request_id,
                "startTime": start, "endTime": time.time()}
    except Exception as exc:                     # noqa: BLE001 — API edge
        return {"result": "", "hasError": True, "errorMessage": str(exc),
                "requestId": request_id,
                "startTime": start, "endTime": time.time()}


# ---------------------------------------------------------------------------
# HTTP server (ApiServer.scala route contract, stdlib http.server)
# ---------------------------------------------------------------------------

API_VERSION = "1.0"


def make_server(spark: SparkSession, host: str = "127.0.0.1",
                port: int = 0):
    """An HTTP server exposing the ApiServer routes over this engine.
    Returns a `ThreadingHTTPServer`; callers run `serve_forever()` (or
    poll `handle_request()`) and `shutdown()` it. Port 0 binds an
    ephemeral port (inspect `server.server_address`)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):      # silent by default
            pass

        def _reply(self, status: int, body: str,
                   ctype: str = "application/json") -> None:
            data = body.encode("utf-8")
            self.send_response(status)
            self.send_header("Content-Type", f"{ctype}; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _handle(self, params: dict[str, list[str]]) -> None:
            path = urlparse(self.path).path
            if path == "/version":
                self._reply(200, json.dumps({"version": API_VERSION}))
                return
            if path != "/api/text":
                self._reply(404, json.dumps({"error": "unknown route"}))
                return
            text = (params.get("text") or [""])[0]
            out = (params.get("output") or ["fries"])[0]
            if not text:
                self._reply(400, json.dumps(
                    {"error": "missing required parameter: text"}))
                return
            resp = annotate_text(spark, text, out_format=out)
            if resp["hasError"]:
                # ApiServer.scala:126 — errors map to 500 + message
                self._reply(500, json.dumps(
                    {"error": resp.get("errorMessage", "internal error")}))
            else:
                self._reply(200, resp["result"])

        def do_GET(self):               # noqa: N802 — http.server API
            self._handle(parse_qs(urlparse(self.path).query))

        def do_POST(self):              # noqa: N802
            n = int(self.headers.get("Content-Length") or 0)
            body = self.rfile.read(n).decode("utf-8") if n else ""
            self._handle(parse_qs(body))

    return ThreadingHTTPServer((host, port), Handler)


# ---------------------------------------------------------------------------
# Ruler: the rule-playground API (export/.../apis/Ruler.scala)
# ---------------------------------------------------------------------------

def _mk_rule_map(rules: str) -> dict[str, str]:
    """ruleName -> rule-source chunks for display (Ruler.mkRuleMap
    :103-124): strip comment lines, split on `- name:` boundaries, key by
    the (possibly quoted) rule name."""
    import re as _re
    cleaned = _re.sub(r"(?m)^\s*#.*$", "", rules).strip()
    name_re = _re.compile(r'^- name:\s+("[^\\"]*(?:\\.[^\\"]*)*"|[^\s#]+)')
    out: dict[str, str] = {}
    for chunk in _re.split(r"(?=- name:)", cleaned):
        chunk = chunk.strip()
        if not chunk:
            continue
        m = name_re.match(chunk)
        if m:
            name = m.group(1)
            if name.startswith('"') and name.endswith('"'):
                name = name[1:-1]
            out[name] = chunk
    return out


def _ruler_results(spark: SparkSession, text: str, rules: str,
                   sentences: DataFrame,
                   mentions: DataFrame | None,
                   error: list | None) -> dict:
    """Assemble the RulerResults response map (Ruler.scala:36-61):
    standoff + syntax standoff via the Brat exporter, per-token rows
    (Ruler.tokens :78-90), the display rule map, and the [name, message]
    error pair on compile failure (OdinNamedCompileException analog —
    no standoff in that case)."""
    from .brat import brat_ann_text, syntax_standoff

    def _ann_join(df):
        lines = sorted((r.ann_id, r.line) for r in df.collect())
        return "\n".join(l for _a, l in lines)

    event_ann = None
    if error is None and mentions is not None:
        anns = {r.doc_id: r.ann
                for r in brat_ann_text(mentions, sentences,
                                       with_notes=True).collect()}
        event_ann = anns.get("ruler", "")
    syntax_ann = None if error is not None else _ann_join(
        syntax_standoff(sentences))
    toks = []
    for s in sorted(sentences.collect(), key=lambda r: r.sent_idx):
        for i, w in enumerate(s.words):
            toks.append({"word": w, "lemma": s.lemmas[i],
                         "tag": s.tags[i], "entity": s.entities[i],
                         "startOffset": s.start_offsets[i],
                         "endOffset": s.end_offsets[i]})
    return {"text": text, "rules": rules,
            "eventAnnotations": event_ann,
            "syntaxAnnotations": syntax_ann,
            "tokens": toks,
            "ruleMap": _mk_rule_map(rules) or None,
            "error": error}


# OpenSystem.scala:20-36 caches the compiled ExtractorEngine keyed by
# the exact rules string, so the rule-editor's repeated runs with
# unchanged rules skip recompilation; same contract here (compile
# errors are never cached). Bounded like the extraction memos.
_RULE_ENGINE_CACHE: dict[str, object] = {}
_RULE_ENGINE_CACHE_MAX = 64


def run_rules(spark: SparkSession, text: str, rules: str) -> dict:
    """Ruler.runOpen (:22-61): run USER-SUPPLIED token rules over a text
    and return standoff annotations of the matches — the rule-playground
    endpoint behind the reference's rule editor UI. Rules are the same
    YAML `- name:/label:/pattern:` shape reach_spark.odin compiles
    (rules/entity_tokens.yml); a per-rule compile failure returns
    [ruleName, message] in `error` with no standoff, an unnamed parse
    failure returns [None, message] (OdinNamedCompileException /
    OdinCompileException analogs). The compiled engine is cached on the
    rules string (OpenSystem.scala:20-36 cachedRules semantics)."""
    from .annotate import annotate_sentences
    from .odin import TokenRule, TokenRuleEngine

    doc_df = text_documents(spark, text, doc_id="ruler")
    sentences = annotate_sentences(doc_df)
    sentences.persist().count()
    try:
        if not rules.strip():
            return _ruler_results(spark, text, rules, sentences, None,
                                  [None, "rulesStr is empty"])
        engine = _RULE_ENGINE_CACHE.get(rules)
        if engine is None:
            try:
                import yaml
                doc = yaml.safe_load(rules)
            except Exception as exc:             # noqa: BLE001
                return _ruler_results(spark, text, rules, sentences, None,
                                      [None, str(exc)])
            specs = doc.get("rules", doc) if isinstance(doc, dict) else doc
            if not isinstance(specs, list):
                return _ruler_results(spark, text, rules, sentences, None,
                                      [None, "expected a `rules:` list"])
            compiled = []
            for d in specs:
                name = (d or {}).get("name", "<unnamed>")
                try:
                    compiled.append(TokenRule(
                        name=name, label=d.get("label", name),
                        pattern_src=" ".join(str(d["pattern"]).split("\n")),
                        priority=int(d.get("priority", 1)),
                        consume=bool(d.get("consume", True)), meta={}))
                except Exception as exc:         # noqa: BLE001
                    return _ruler_results(spark, text, rules, sentences,
                                          None, [name, str(exc)])
            engine = TokenRuleEngine(compiled)
            if len(_RULE_ENGINE_CACHE) >= _RULE_ENGINE_CACHE_MAX:
                # FIFO-evict the oldest entry (dict preserves insertion
                # order) — clearing everything caused a recompile burst
                # for still-hot grammars
                _RULE_ENGINE_CACHE.pop(next(iter(_RULE_ENGINE_CACHE)))
            _RULE_ENGINE_CACHE[rules] = engine

        # single-request path: one doc, driver-side dispatch like the
        # reference's in-process ExtractorEngine call
        mrows = []
        for s in sorted(sentences.collect(), key=lambda r: r.sent_idx):
            fields = [{"word": w, "tag": s.tags[i], "lemma": s.lemmas[i]}
                      for i, w in enumerate(s.words)]
            for rule, st, en in engine.match_sentence(fields):
                mrows.append(Row(
                    doc_id="ruler", sent_idx=int(s.sent_idx),
                    mention_id=f"ruler-{s.sent_idx}-{rule.name}-{st}-{en}",
                    kind="tbm", label=rule.label or rule.name,
                    start=st, end=en,
                    text=" ".join(s.words[st:en]),
                    trigger_start=None, trigger_end=None,
                    trigger_text=None, args=[], mods=[],
                    found_by=rule.name, keep=True))
        schema = ("doc_id string, sent_idx int, mention_id string, "
                  "kind string, label string, start int, `end` int, "
                  "text string, trigger_start int, trigger_end int, "
                  "trigger_text string, "
                  "args array<struct<role:string,mention_id:string,"
                  "text:string>>, "
                  "mods array<struct<kind:string,label:string,"
                  "evidence_text:string,site_text:string,"
                  "negated:boolean>>, found_by string, keep boolean")
        mentions = spark.createDataFrame(mrows, schema=schema)
        return _ruler_results(spark, text, rules, sentences, mentions,
                              None)
    finally:
        sentences.unpersist()


def run_reach(spark: SparkSession, text: str) -> dict:
    """Ruler.runReach (:64-75): the full bio cascade over a text with
    Brat standoff + syntax standoff of everything it found; `rules` echoes
    the engine's own packaged rule files (reach.allRules analog)."""
    import pkgutil

    doc_df = text_documents(spark, text, doc_id="ruler")
    results = extract_dataframe(spark, doc_df)
    try:
        sentences = results["sentences"]
        sentences.persist().count()
        all_rules = []
        for f in ("entity_tokens.yml", "mutant_tokens.yml",
                  "simple_events.yml", "complex_events.yml",
                  "dep_events.yml", "dep_regulations.yml"):
            raw = pkgutil.get_data("reach_spark", f"rules/{f}")
            if raw:
                all_rules.append(raw.decode("utf-8"))
        rules = "\n\n".join(all_rules)
        out = _ruler_results(spark, text, rules, sentences,
                             results["resolved_mentions"], None)
        sentences.unpersist()
        return out
    finally:
        results.cleanup()
