"""Minimal WARC/1.0 reader — Common Crawl's native archive format (the
real-world intake for the pages table this engine is built around:
``(url, warc_ts, html, text, lang)``, see sources/synth.py and
BASELINE.json's input_hint).

Spec followed: ISO 28500 (WARC/1.0/1.1 — public standard). A WARC file
is a sequence of records::

    WARC/1.0\\r\\n
    <name>: <value>\\r\\n ...          (headers)
    \\r\\n
    <Content-Length bytes of payload>
    \\r\\n\\r\\n                         (record separator)

Only ``WARC-Type: response`` records yield rows; their payload is a raw
HTTP response whose body (after the first CRLFCRLF) is the page html.
``Transfer-Encoding: chunked`` bodies are de-chunked (Common Crawl
stores responses verbatim, so chunked payloads do occur).

Scale shape: ONE Ray task per WARC file — a Common Crawl segment file
(~1 GB gzip) is the natural parallel unit, and ``.warc.gz`` files are
multi-member gzip streams that stdlib ``gzip`` decompresses in one pass.
Parsing is a linear scan with ``bytes.find`` (no per-byte Python loop);
nothing file-count-sized reaches the driver beyond the path list.
"""

from __future__ import annotations

import gzip
import os

import numpy as np
import pyarrow as pa
import ray.data

_CRLF2 = b"\r\n\r\n"


def iter_warc_records(buf: bytes):
    """Yield (headers_dict, payload_bytes) per record; header names are
    lower-cased. Raises on malformed framing (a truncated tail record is
    an error, not a silent drop)."""
    i, n = 0, len(buf)
    while i < n:
        while buf.startswith(b"\r\n", i):
            i += 2
        if i >= n:
            return
        he = buf.find(_CRLF2, i)
        if he < 0:
            raise ValueError(f"warc: unterminated header block at {i}")
        block = buf[i:he].decode("latin-1")
        lines = block.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"warc: expected WARC/<ver> at {i}, "
                             f"got {lines[0][:40]!r}")
        hdrs: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            hdrs[k.strip().lower()] = v.strip()
        try:
            clen = int(hdrs["content-length"])
        except KeyError:
            raise ValueError(f"warc: record at {i} has no Content-Length")
        start = he + len(_CRLF2)
        if start + clen > n:
            raise ValueError(f"warc: truncated payload at {start}")
        yield hdrs, buf[start:start + clen]
        i = start + clen


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked body (size-hex CRLF data CRLF ...).
    Malformed or truncated chunk framing raises — same fail-loud policy
    as the record framing (a silently truncated page would corrupt the
    corpus with no signal)."""
    out, i = [], 0
    while True:
        j = body.find(b"\r\n", i)
        if j < 0:
            raise ValueError("warc: chunked body missing size line")
        size = int(body[i:j].split(b";")[0], 16)   # ValueError if corrupt
        if size == 0:
            return b"".join(out)
        end = j + 2 + size
        if end > len(body):
            raise ValueError("warc: truncated chunk in chunked body")
        out.append(body[j + 2:end])
        i = end + 2


def _http_head_body(payload: bytes) -> tuple[str, bytes]:
    """(lower-cased header text, body) of a raw HTTP response. Handles
    CRLFCRLF and bare-LF header blocks (some servers emit LF-only
    headers and crawls store them verbatim); a payload with no header
    separator at all is treated as a bare body."""
    he = payload.find(_CRLF2)
    sep = len(_CRLF2)
    le = payload.find(b"\n\n")
    if he < 0 or (0 <= le < he):
        he, sep = le, 2
    if he < 0:
        return "", payload
    return (payload[:he].decode("latin-1", "replace").lower(),
            payload[he + sep:])


def _header_value(head: str, name: str) -> str:
    """First value of an HTTP header in a lower-cased header block."""
    key = name + ":"
    for ln in head.splitlines():
        if ln.startswith(key):
            return ln[len(key):].strip()
    return ""


def _http_body(payload: bytes) -> bytes:
    """Decoded body of a raw HTTP response: de-chunked when
    Transfer-Encoding says so, then content-decoded (gzip / deflate —
    crawls store responses verbatim, so compressed bodies occur).
    Unknown content encodings raise rather than leaking compressed
    bytes into the html column."""
    import zlib

    head, body = _http_head_body(payload)
    if "chunked" in _header_value(head, "transfer-encoding"):
        body = _dechunk(body)
    enc = _header_value(head, "content-encoding")
    if enc in ("", "identity"):
        return body
    if enc in ("gzip", "x-gzip"):
        return gzip.decompress(body)
    if enc == "deflate":
        try:
            return zlib.decompress(body)
        except zlib.error:            # raw-deflate servers (no zlib wrapper)
            return zlib.decompress(body, -zlib.MAX_WBITS)
    raise ValueError(f"warc: unsupported Content-Encoding {enc!r}")


def parse_warc_bytes(buf: bytes, html_only: bool = True) -> pa.Table:
    """One WARC file's bytes -> (url, warc_ts, html) Arrow table.

    Rows come from ``WARC-Type: response`` records; with ``html_only``
    (default) only successful HTML pages qualify — 2xx status AND a
    Content-Type that is html or absent. Redirects, error pages, and
    image/PDF payloads would otherwise flow garbage text into every
    downstream corpus statistic and the graph build. ``warc_ts`` is
    timestamp[us] from the ISO-8601 WARC-Date header."""
    urls: list[str] = []
    stamps: list[np.datetime64] = []
    htmls: list[bytes] = []
    for hdrs, payload in iter_warc_records(buf):
        if hdrs.get("warc-type") != "response":
            continue
        if html_only:
            head, _ = _http_head_body(payload)
            status = head.split("\n", 1)[0].split()
            if len(status) >= 2 and not status[1].startswith("2"):
                continue
            ctype = _header_value(head, "content-type")
            if ctype and "html" not in ctype:
                continue
        url = hdrs.get("warc-target-uri", "")
        date = hdrs.get("warc-date", "")
        ts = np.datetime64(date.rstrip("Z"), "us") if date else \
            np.datetime64("NaT", "us")
        urls.append(url)
        stamps.append(ts)
        htmls.append(_http_body(payload))
    return pa.table({
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array(np.array(stamps, dtype="datetime64[us]")),
        "html": pa.array(htmls, type=pa.binary())})


def _expand(paths: list[str] | str) -> list[str]:
    """Resolve inputs to .warc/.warc.gz files (dirs scanned recursively,
    case-insensitive extensions). An input that contributes NO files is
    an error — a typo'd directory among several inputs must not silently
    drop part of the corpus."""
    if isinstance(paths, str):
        paths = [paths]
    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            found = sorted(
                os.path.join(dp, f)
                for dp, _, fs in os.walk(p) for f in fs
                if f.lower().endswith((".warc", ".warc.gz")))
            if not found:
                raise ValueError(f"no .warc/.warc.gz files under {p!r}")
            out.extend(found)
        elif os.path.exists(p):
            out.append(p)
        else:
            raise ValueError(f"warc input does not exist: {p!r}")
    return out


def read_warc(paths: list[str] | str) -> ray.data.Dataset:
    """Dataset[(url, warc_ts, html)] over WARC file(s)/dir(s) — one task
    per file (the Common Crawl parallel unit). ``.gz`` inputs are
    multi-member gzip streams, decompressed inside the task."""
    files = _expand(paths)

    def parse(t: pa.Table) -> pa.Table:
        tabs = []
        for raw in t.column("bytes").to_pylist():
            # magic-byte check, not extension: Ray's read_binary_files
            # already auto-decompresses .gz by filename, so bytes may
            # arrive either way
            buf = gzip.decompress(raw) if raw[:2] == b"\x1f\x8b" else raw
            tabs.append(parse_warc_bytes(buf))
        return pa.concat_tables(tabs) if tabs else parse_warc_bytes(b"")

    return ray.data.read_binary_files(
        files, override_num_blocks=len(files)).map_batches(
        parse, batch_format="pyarrow", batch_size=1)


def warc_to_pages(paths: list[str] | str) -> ray.data.Dataset:
    """Full pages rows from WARC: (url, warc_ts, html, text, lang) —
    ``text`` via the byte-parity extractor (the per-row invariant of
    BASELINE.json's input_hint), ``lang`` via the n-gram heuristic the
    docs_langid contract query uses."""
    from ligrust_ray.dataops.textstats import lang_id
    from ligrust_ray.functions.extract import extract_page

    def enrich(t: pa.Table) -> pa.Table:
        texts = [extract_page(h)[0]
                 for h in t.column("html").to_pylist()]
        tt = pa.table({"doc_id": pa.array(
            np.arange(t.num_rows, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string())})
        lang = lang_id()(tt).column("pred_lang")
        return pa.table({
            "url": t.column("url"), "warc_ts": t.column("warc_ts"),
            "html": t.column("html"),
            "text": pa.array(texts, type=pa.string()), "lang": lang})

    return read_warc(paths).map_batches(enrich, batch_format="pyarrow",
                                        batch_size=256)
