"""Input connectors: DSV/CSV and plaintext → the `documents` table
(SURVEY §2.1 S2; reference PaperReader.scala:102-137 + utils/DSVParser.scala).

Every source lands on the same interleaved-documents schema
(doc_id, spans array<struct<kind,text,media_ref,offset>>), so the rest of
the pipeline is source-agnostic. All transforms are built-in column
expressions — the csv/text scans stay fully JVM-side with pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _to_documents(df: DataFrame, id_col, text_col) -> DataFrame:
    span = F.struct(
        F.lit("text").alias("kind"),
        F.coalesce(text_col.cast("string"), F.lit("")).alias("text"),
        F.lit("").alias("media_ref"),
        F.lit(0).cast("int").alias("offset"),
    )
    return df.select(id_col.cast("string").alias("doc_id"),
                     F.array(span).alias("spans"))


def read_dsv(spark: SparkSession, path: str, id_col: str = "doc_id",
             text_col: str = "text", sep: str = "\t",
             header: bool = True) -> DataFrame:
    """TSV/CSV of (id, text, ...) → documents (DSVParser semantics:
    one FriesEntry per row, PaperReader.scala:102-137)."""
    df = spark.read.option("sep", sep).option("header", header) \
        .option("multiLine", True).option("escape", '"').csv(path)
    return _to_documents(df, F.col(id_col), F.col(text_col))


def read_plaintext(spark: SparkSession, path: str) -> DataFrame:
    """Directory of .txt files → documents, one doc per file (the
    PaperReader plaintext branch); doc_id = file name."""
    df = (spark.read.text(path, wholetext=True)
          .withColumn("doc_id",
                      F.regexp_extract(F.input_file_name(),
                                       r"([^/]+?)(\.txt)?$", 1)))
    return _to_documents(df, F.col("doc_id"), F.col("value"))


#: reference main/src/main/resources/application.conf:30
NXML_IGNORE_SECTIONS = frozenset(
    ["references", "materials", "materials|methods", "methods",
     "supplementary-material"])


def read_nxml(spark: SparkSession, path: str,
              ignore_sections=NXML_IGNORE_SECTIONS) -> DataFrame:
    """Directory of PMC .nxml/.xml (JATS) papers → interleaved documents
    (the PaperReader.readNXMLPaper branch, PaperReader.scala:85-100 via
    ai.lum.nxmlreader; ignoreSections default application.conf:30).

    Span mapping onto the interleaved shape (BASELINE.json input_hint):
    title, abstract paragraphs and body paragraphs become ordered text
    spans; each ``<fig>`` becomes a MEDIA span (media_ref = the
    ``<graphic xlink:href>``) immediately followed by its caption as a
    text span — figures interleave with the prose exactly where JATS
    places them. ``<sec>`` subtrees whose ``sec-type`` or title match
    `ignore_sections` drop (the reference's references/methods cut).

    Spark shape: XML parsing is not expressible with built-in column
    functions (no JATS source in-sandbox), so the parse runs as an
    Arrow-batched mapInPandas over ``wholetext`` file rows — one task
    per file batch, embarrassingly parallel, source-stage-only; the
    output lands on the same `documents` schema as every other
    connector, so downstream plans are unchanged."""
    import re as _re

    from .schemas import DOCUMENTS

    files = (spark.read.text(path, wholetext=True)
             .withColumn("fname", F.input_file_name())
             .where(F.col("fname").rlike(r"\.(nxml|xml)$")))

    ignore = {s.lower() for s in ignore_sections}

    def gen(batches):
        import pandas as pd
        import xml.etree.ElementTree as ET

        XLINK = "{http://www.w3.org/1999/xlink}href"

        def norm_tag(el):
            return el.tag.rsplit("}", 1)[-1]

        def text_of(el) -> str:
            return _re.sub(r"\s+", " ",
                           "".join(el.itertext())).strip()

        def sec_ignored(sec) -> bool:
            st = (sec.get("sec-type") or "").lower()
            if st in ignore:
                return True
            for child in sec:
                if norm_tag(child) == "title":
                    return text_of(child).lower() in ignore
            return False

        def walk(el, spans, order):
            """Document-order walk: <p> → text span, <fig> → media +
            caption spans, ignored <sec> subtrees skipped."""
            for child in el:
                tag = norm_tag(child)
                if tag == "sec" and sec_ignored(child):
                    continue
                if tag == "p":
                    t = text_of(child)
                    if t:
                        spans.append({"kind": "text", "text": t,
                                      "media_ref": "",
                                      "offset": order[0]})
                        order[0] += 1
                    continue
                if tag == "fig":
                    ref = ""
                    cap = ""
                    for sub in child.iter():
                        if norm_tag(sub) == "graphic" and not ref:
                            ref = sub.get(XLINK) or \
                                sub.get("href") or ""
                        if norm_tag(sub) == "caption" and not cap:
                            cap = text_of(sub)
                    spans.append({"kind": "media", "text": "",
                                  "media_ref": ref,
                                  "offset": order[0]})
                    order[0] += 1
                    if cap:
                        spans.append({"kind": "text", "text": cap,
                                      "media_ref": "",
                                      "offset": order[0]})
                        order[0] += 1
                    continue
                walk(child, spans, order)

        for pdf in batches:
            rows = []
            for raw, fname in zip(pdf["value"], pdf["fname"]):
                try:
                    root = ET.fromstring(raw)
                except ET.ParseError:
                    continue
                pmc = None
                for el in root.iter():
                    if norm_tag(el) == "article-id" and \
                            el.get("pub-id-type") == "pmc":
                        pmc = (el.text or "").strip()
                        break
                doc_id = pmc or _re.sub(
                    r"\.(nxml|xml)$", "", fname.rsplit("/", 1)[-1])
                spans = []
                order = [0]
                for el in root.iter():
                    tag = norm_tag(el)
                    if tag == "article-title":
                        t = text_of(el)
                        if t:
                            spans.append({"kind": "text", "text": t,
                                          "media_ref": "",
                                          "offset": order[0]})
                            order[0] += 1
                        break
                for el in root.iter():
                    if norm_tag(el) in ("abstract", "body"):
                        walk(el, spans, order)
                if spans:
                    rows.append({"doc_id": doc_id, "spans": spans})
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    return files.mapInPandas(gen, schema=DOCUMENTS)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Directory of .warc files (ISO 28500 / Common-Crawl layout) →
    interleaved documents — the crawl-ingestion source a web-scale corpus
    actually starts from. No reference counterpart (PaperReader reads
    NXML/DSV/plaintext); this connector exists for the 10^12-document
    crawl mandate and lands on the same `documents` schema as every
    other source, so downstream plans are unchanged.

    Record mapping: `response` records carry an HTTP payload — status
    line + headers are stripped, the real Content-Type read from the
    HTTP headers; `conversion` records are taken as-is. text/* bodies
    become ONE text span (script/style subtrees dropped, tags stripped,
    entities unescaped, whitespace collapsed — the minimal extraction;
    boilerplate-line removal is a downstream op); non-text bodies become
    a MEDIA span with media_ref = the target URI, which is exactly the
    interleaved text+media shape. warcinfo/request/metadata records are
    skipped. Content-Length is honored byte-exactly, so payloads
    containing "WARC/1.0" do not split records.

    Spark shape: `binaryFile` source (payloads are bytes, not lines) →
    Arrow-batched mapInPandas, one task per file batch — embarrassingly
    parallel source-stage work like read_nxml. At crawl scale WARC files
    are ~1 GiB each, so file-level parallelism saturates any executor
    count; gzip members (.warc.gz) would be decompressed per record by
    the same walk (not wired in-sandbox — plain .warc only)."""
    from .schemas import DOCUMENTS

    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc")
             .load(path)
             .select("path", "content"))

    def gen(batches):
        import pandas as pd
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                rows.extend(_parse_warc(bytes(content)))
            yield pd.DataFrame(rows, columns=["doc_id", "spans"]) \
                if rows else pd.DataFrame(
                    {"doc_id": pd.Series([], dtype="str"),
                     "spans": pd.Series([], dtype="object")})

    return files.mapInPandas(gen, DOCUMENTS)


def _strip_html(body: str) -> str:
    """Minimal text extraction: drop script/style subtrees, strip tags,
    unescape entities, collapse whitespace."""
    import html as _html
    import re as _re
    body = _re.sub(r"(?is)<(script|style)\b.*?</\1\s*>", " ", body)
    body = _re.sub(r"(?s)<[^>]*>", " ", body)
    return _re.sub(r"\s+", " ", _html.unescape(body)).strip()


def _parse_warc(b: bytes) -> list[tuple[str, list[dict]]]:
    """Byte-exact WARC record walk (Content-Length honored; CRLF per
    spec). Returns (doc_id, spans) rows on the interleaved shape."""
    import re as _re
    out = []
    i = 0
    n = len(b)
    while i < n:
        j = b.find(b"WARC/", i)
        if j < 0:
            break
        hdr_end = b.find(b"\r\n\r\n", j)
        if hdr_end < 0:
            break
        headers = {}
        # unfold continuation lines (RFC-style LWS folding) BEFORE
        # parsing — a folded Content-Length would otherwise silently
        # read as missing
        hdr_block = (b[j:hdr_end]
                     .replace(b"\r\n ", b" ").replace(b"\r\n\t", b" "))
        for line in hdr_block.split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers[b"content-length"])
        except (KeyError, ValueError):
            # no parseable payload boundary: SKIP the record (emit
            # nothing) and resync at the spec record terminator
            # (CRLFCRLF before the next header) — never scan a payload
            # for a bare 'WARC/', which a body can legitimately contain
            nxt = b.find(b"\r\n\r\nWARC/", hdr_end + 4)
            if nxt < 0:
                break
            i = nxt + 4
            continue
        payload = b[hdr_end + 4:hdr_end + 4 + clen]
        i = hdr_end + 4 + clen
        wtype = headers.get(b"warc-type", b"").decode("ascii", "replace")
        if wtype not in ("response", "conversion"):
            continue
        uri = headers.get(b"warc-target-uri", b"") \
            .decode("utf-8", "replace")
        rid = headers.get(b"warc-record-id", b"") \
            .decode("ascii", "replace").strip("<>")
        ctype = headers.get(b"content-type", b"") \
            .decode("ascii", "replace")
        body = payload
        if ctype.startswith("application/http"):
            he = payload.find(b"\r\n\r\n")
            http_hdr = payload[:max(he, 0)]
            body = payload[he + 4:] if he >= 0 else payload
            m = _re.search(rb"(?im)^content-type:\s*([^\r\n;]+)",
                           http_hdr)
            ctype = (m.group(1).decode("ascii", "replace").strip()
                     if m else "text/html")
        else:
            ctype = ctype.split(";")[0].strip()
        doc_id = rid or uri
        if not doc_id:
            continue
        if ctype.startswith("text/"):
            text = body.decode("utf-8", "replace")
            if ctype == "text/html":
                text = _strip_html(text)
            else:
                import re as _re2
                text = _re2.sub(r"\s+", " ", text).strip()
            spans = [{"kind": "text", "text": text, "media_ref": "",
                      "offset": 0}]
        else:
            spans = [{"kind": "media", "text": "",
                      "media_ref": uri or doc_id, "offset": 0}]
        out.append((doc_id, spans))
    return out
