"""HTML -> (text, links) extraction.

This is the ingest front-end of the engine: the analog of the reference's
text-format parser (/root/reference/src/graph.rs:145-196), but over
Common-Crawl-style web pages (``html: binary`` per BASELINE.json input_hint)
instead of Ligra's AdjacencyGraph text format.

Design notes (scale):
- ``ExtractLinks`` is a callable class: the HTML parser machinery is set up
  once per actor in ``__init__`` and reused per batch
  (``map_batches(ExtractLinks, batch_format="pyarrow", concurrency=N)``).
- Extraction is a pure function of the html bytes -> byte-identical text per
  url across runs (the input_hint per-row invariant). Tests double-extract
  and compare against the stored ``text`` column.
- Output is Arrow-native: a flat edge-url table built with
  ``pa.ListArray`` offsets, no Python-row materialisation beyond the
  unavoidable per-page parse (HTML parsing is inherently per-document).
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin

import numpy as np
import pyarrow as pa

_SKIP_TAGS = frozenset({"script", "style", "noscript", "template"})
# Tags that terminate a text run with a newline (block-level-ish).
_BLOCK_TAGS = frozenset(
    {"p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
     "title", "tr", "table", "blockquote", "pre", "section", "article",
     "header", "footer", "body"}
)


class _PageParser(HTMLParser):
    """One-pass text + href harvester.

    Text normalisation rule (deterministic): every run of whitespace inside a
    text node collapses to a single space; block tags insert a newline;
    consecutive newlines collapse; leading/trailing whitespace stripped.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.reset_page()

    def reset_page(self) -> None:
        self._chunks: list[str] = []
        self._hrefs: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self._hrefs.append(v)
        if tag in _BLOCK_TAGS:
            self._chunks.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            if self._skip_depth > 0:
                self._skip_depth -= 1
            return
        if tag in _BLOCK_TAGS:
            self._chunks.append("\n")

    def handle_data(self, data):
        if self._skip_depth == 0 and data:
            self._chunks.append(" ".join(data.split()) or " ")


def _finalise_text(chunks: list[str]) -> str:
    out: list[str] = []
    prev_nl = True  # strips leading separators
    for c in chunks:
        if c == "\n":
            if not prev_nl:
                out.append("\n")
                prev_nl = True
        else:
            c = c.strip() if prev_nl else c
            if c and c != " ":
                out.append(c)
                prev_nl = False
            elif c == " " and not prev_nl:
                out.append(c)
    text = "".join(out)
    # collapse "space before newline" artefacts and trailing ws
    lines = [ln.strip() for ln in text.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def extract_page(html: bytes, base_url: str = "") -> tuple[str, list[str]]:
    """Pure function: html bytes -> (normalised text, resolved hrefs).

    hrefs keep document order and duplicates (the reference keeps parallel
    edges verbatim — /root/reference/src/graph.rs:182-192).
    """
    p = _PageParser()
    try:
        p.feed(html.decode("utf-8", errors="replace"))
        p.close()
    except Exception:
        pass  # salvage whatever was harvested before the error
    text = _finalise_text(p._chunks)
    links = [urljoin(base_url, h) if base_url else h for h in p._hrefs]
    return text, links


class _LinksParser(HTMLParser):
    """href-only harvester: IDENTICAL tag semantics to _PageParser (same
    HTMLParser tokenizer, same <a href> rule, script/style CDATA handled by
    the tokenizer itself) but skips all text-node bookkeeping — the edge
    extraction path never needs the text, and handle_data dominates the
    full parse."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v)


def extract_links(html: bytes, base_url: str = "") -> list[str]:
    """Pure function: html bytes -> resolved hrefs, document order,
    duplicates kept. Equals ``extract_page(html, base_url)[1]`` (tested)."""
    p = _LinksParser()
    try:
        p.feed(html.decode("utf-8", errors="replace"))
        p.close()
    except Exception:
        pass  # salvage whatever was harvested before the error
    return [urljoin(base_url, h) if base_url else h for h in p.hrefs]


class _AnchorParser(HTMLParser):
    """(href, anchor-text) harvester. The href rule is IDENTICAL to
    ``_LinksParser`` (one pair per ``<a href>`` start tag, document order,
    duplicates kept — the pair list is parallel to ``extract_links``,
    tested), plus the text: whitespace-collapsed concatenation of the text
    nodes seen while that anchor is the most recent open ``<a>``. A new
    ``<a>`` implicitly closes the previous (nested anchors are invalid
    HTML and browsers do the same); skip-tag contents are excluded with
    ``_PageParser``'s depth rule."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.pairs: list[tuple[str, str]] = []
        self._href: str | None = None
        self._chunks: list[str] = []
        self._skip_depth = 0

    def _flush(self) -> None:
        if self._href is not None:
            text = " ".join("".join(self._chunks).split())
            self.pairs.append((self._href, text))
        self._href = None
        self._chunks = []

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag == "a":
            self._flush()
            for k, v in attrs:
                if k == "href" and v:
                    self._href = v
                    break

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            if self._skip_depth > 0:
                self._skip_depth -= 1
            return
        if tag == "a":
            self._flush()

    def handle_data(self, data):
        if self._skip_depth == 0 and self._href is not None and data:
            self._chunks.append(data)


def extract_anchors(html: bytes, base_url: str = ""
                    ) -> tuple[list[str], list[str]]:
    """Pure function: html bytes -> (resolved hrefs, anchor texts), two
    parallel lists in document order, duplicates kept. The href list
    equals ``extract_links(html, base_url)`` exactly (tested) — this is
    the same edge extraction, carrying what the linking page SAYS about
    the target."""
    p = _AnchorParser()
    try:
        p.feed(html.decode("utf-8", errors="replace"))
        p.close()
    except Exception:
        pass  # salvage whatever was harvested before the error
    p._flush()   # an <a href> left open at EOF still yields its pair
    hrefs = [urljoin(base_url, h) if base_url else h for h, _ in p.pairs]
    return hrefs, [t for _, t in p.pairs]


class ExtractAnchors:
    """Actor-pool batch UDF: pages batch -> anchor-edge batch.

    In:  pyarrow batch with columns ``url`` (string) and ``html`` (binary).
    Out: ``(src_url, dst_url, anchor)`` — one row per href occurrence
    (parallel edges preserved), ``anchor`` = the link's display text.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        all_links: list[str] = []
        all_anchors: list[str] = []
        offsets = [0]
        for u, h in zip(urls, htmls):
            hrefs, texts = extract_anchors(h, base_url=u)
            all_links.extend(hrefs)
            all_anchors.extend(texts)
            offsets.append(len(all_links))
        counts = np.diff(np.asarray(offsets, dtype=np.int64))
        src_arr = pa.array(np.repeat(np.asarray(urls, dtype=object), counts))
        return pa.table({"src_url": src_arr.cast(pa.string()),
                         "dst_url": pa.array(all_links, type=pa.string()),
                         "anchor": pa.array(all_anchors, type=pa.string())})


class ExtractLinks:
    """Actor-pool batch UDF: pages batch -> edge-url batch.

    In:  pyarrow batch with columns ``url`` (string) and ``html`` (binary).
    Out: pyarrow table ``(src_url: string, dst_url: string)`` — one row per
    href occurrence (parallel edges preserved).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        all_links: list[str] = []
        offsets = [0]
        for u, h in zip(urls, htmls):
            all_links.extend(extract_links(h, base_url=u))
            offsets.append(len(all_links))
        counts = np.diff(np.asarray(offsets, dtype=np.int64))
        src_arr = pa.array(np.repeat(np.asarray(urls, dtype=object), counts))
        return pa.table({"src_url": src_arr.cast(pa.string()),
                         "dst_url": pa.array(all_links, type=pa.string())})


class ExtractText:
    """Actor-pool batch UDF: pages batch -> (url, text) batch."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url")
        htmls = batch.column("html").to_pylist()
        texts = [extract_page(h)[0] for h in htmls]
        return pa.table({"url": urls, "text": pa.array(texts, type=pa.string())})
