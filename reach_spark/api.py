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
