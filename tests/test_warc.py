"""WARC intake (sources/warc.py): framing, HTTP body extraction
(plain + chunked), gzip members, the byte-identical-extracted-text
invariant against the synthetic corpus, and the import-warc CLI."""

import gzip
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ligrust_ray.sources.warc import (iter_warc_records, parse_warc_bytes,
                                      read_warc, warc_to_pages)


def _http(html: bytes, chunked: bool = False) -> bytes:
    if chunked:
        body = (f"{len(html):x}".encode() + b"\r\n" + html
                + b"\r\n0\r\n\r\n")
        return (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
                + body)
    return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html)


def _record(wtype: str, payload: bytes, url: str = "",
            date: str = "") -> bytes:
    hdr = [f"WARC/1.0", f"WARC-Type: {wtype}",
           f"Content-Length: {len(payload)}"]
    if url:
        hdr.append(f"WARC-Target-URI: {url}")
    if date:
        hdr.append(f"WARC-Date: {date}")
    return ("\r\n".join(hdr) + "\r\n\r\n").encode() + payload + b"\r\n\r\n"


def _make_warc(rows, chunked_every: int = 3) -> bytes:
    out = [_record("warcinfo", b"test-crawl")]     # skipped by the reader
    for i, (url, ts, html) in enumerate(rows):
        out.append(_record("response", _http(html, chunked=(
            chunked_every and i % chunked_every == 0)), url, ts))
    return b"".join(out)


def test_parse_warc_records_and_bodies():
    rows = [("http://a.example/x", "2017-03-22T17:01:41Z", b"<p>one</p>"),
            ("http://b.example/y", "2018-01-02T03:04:05Z", b"<p>two</p>"),
            ("http://c.example/z", "2019-12-31T23:59:59Z", b"<p>3</p>")]
    buf = _make_warc(rows)
    recs = list(iter_warc_records(buf))
    assert [h["warc-type"] for h, _ in recs] == \
        ["warcinfo", "response", "response", "response"]
    t = parse_warc_bytes(buf)
    assert t.column("url").to_pylist() == [r[0] for r in rows]
    # chunked (i=0) and plain bodies both round-trip byte-exact
    assert t.column("html").to_pylist() == [r[2] for r in rows]
    ts = t.column("warc_ts").to_pylist()
    assert ts[0].year == 2017 and ts[2].second == 59


def test_read_warc_gz_and_pages_invariant(ray_session, tmp_path):
    """WARC built FROM the synthetic pages corpus reads back byte-exact,
    and warc_to_pages reproduces the corpus's own text column — the
    input_hint's byte-identical-extracted-text-per-url invariant."""
    import ray

    from ligrust_ray.sources.synth import write_pages_corpus

    corpus = str(tmp_path / "pages")
    write_pages_corpus(corpus, 60, seed=11, parallel=False)
    src = pq.read_table(corpus)
    rows = [(u, np.datetime_as_string(np.datetime64(ts, "s")) + "Z", h)
            for u, ts, h in zip(src.column("url").to_pylist(),
                                src.column("warc_ts").to_pylist(),
                                src.column("html").to_pylist())]
    w1 = str(tmp_path / "a.warc")
    w2 = str(tmp_path / "b.warc.gz")
    with open(w1, "wb") as f:
        f.write(_make_warc(rows[:30]))
    with open(w2, "wb") as f:
        f.write(gzip.compress(_make_warc(rows[30:], chunked_every=0)))

    got = read_warc(str(tmp_path)).to_pandas().sort_values("url")
    assert len(got) == 60
    by_url = dict(zip(src.column("url").to_pylist(),
                      src.column("html").to_pylist()))
    assert all(by_url[u] == h for u, h in zip(got["url"], got["html"]))

    pages = warc_to_pages([w1, w2]).to_pandas().sort_values("url")
    want_text = dict(zip(src.column("url").to_pylist(),
                         src.column("text").to_pylist()))
    assert all(want_text[u] == x
               for u, x in zip(pages["url"], pages["text"]))
    assert set(pages.columns) == {"url", "warc_ts", "html", "text", "lang"}
    assert (pages["lang"] == "en").mean() > 0.8       # synthetic corpus


def test_import_warc_cli_and_build(ray_session, tmp_path, capsys):
    """import-warc writes committed pages shards; the graph built from
    them equals the graph built from the original parquet corpus."""
    import json

    from ligrust_ray.cli import main
    from ligrust_ray.pipelines.build import build_graph_from_pages
    from ligrust_ray.sources.resumable_sink import read_partitioned
    from ligrust_ray.sources.synth import write_pages_corpus
    from ligrust_ray.state.graph import DistGraph

    corpus = str(tmp_path / "pages")
    write_pages_corpus(corpus, 50, seed=12, parallel=False)
    src = pq.read_table(corpus)
    rows = [(u, np.datetime_as_string(np.datetime64(ts, "s")) + "Z", h)
            for u, ts, h in zip(src.column("url").to_pylist(),
                                src.column("warc_ts").to_pylist(),
                                src.column("html").to_pylist())]
    w = str(tmp_path / "crawl.warc.gz")
    with open(w, "wb") as f:
        f.write(gzip.compress(_make_warc(rows)))

    out = str(tmp_path / "imported")
    assert main(["import-warc", w, "-o", out, "--shards", "4"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_pages"] == 50 and rep["rows_written"] == 50

    g1d, g2d = str(tmp_path / "g1"), str(tmp_path / "g2")
    build_graph_from_pages(corpus, g1d, num_partitions=3)
    build_graph_from_pages(
        read_partitioned(out).select_columns(["url", "html"]), g2d,
        num_partitions=3)
    g1, g2 = DistGraph.load(g1d), DistGraph.load(g2d)
    assert (g1.n, g1.m) == (g2.n, g2.m)

    from ligrust_ray.algos.cc import cc
    cc(g1)
    cc(g2)
    np.testing.assert_array_equal(g1.collect_state(["ids"])["ids"],
                                  g2.collect_state(["ids"])["ids"])


def test_http_body_encodings_and_filters():
    """Content-Encoding gzip/deflate bodies are decoded, LF-only header
    blocks are split correctly, non-2xx and non-html responses are
    filtered, and malformed chunked framing raises."""
    import pytest

    from ligrust_ray.sources.warc import _http_body

    html = b"<p>enc</p>"
    gz = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
          + gzip.compress(html))
    assert _http_body(gz) == html
    import zlib
    fl = (b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n"
          + zlib.compress(html))
    assert _http_body(fl) == html
    lf = b"HTTP/1.1 200 OK\nContent-Type: text/html\n\n" + html
    assert _http_body(lf) == html
    with pytest.raises(ValueError, match="Content-Encoding"):
        _http_body(b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\nxx")
    with pytest.raises(ValueError, match="chunk"):
        _http_body(b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
                   b"\r\nff\r\nshort")

    rows = [("http://ok/1", "2020-01-01T00:00:00Z", b"<p>ok</p>")]
    buf = (_make_warc(rows, chunked_every=0)
           + _record("response",
                     b"HTTP/1.1 301 Moved\r\nLocation: x\r\n\r\n",
                     "http://redir/2", "2020-01-01T00:00:00Z")
           + _record("response",
                     b"HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\n"
                     b"\x89PNG", "http://img/3", "2020-01-01T00:00:00Z"))
    t = parse_warc_bytes(buf)
    assert t.column("url").to_pylist() == ["http://ok/1"]
    t_all = parse_warc_bytes(buf, html_only=False)
    assert t_all.num_rows == 3


def test_expand_rejects_empty_inputs(tmp_path):
    import pytest

    from ligrust_ray.sources.warc import _expand

    good = tmp_path / "a"
    nested = good / "seg" / "x.WARC.GZ"      # recursive + case-insensitive
    nested.parent.mkdir(parents=True)
    nested.write_bytes(b"")
    assert _expand(str(good)) == [str(nested)]
    empty = tmp_path / "b"
    empty.mkdir()
    with pytest.raises(ValueError, match="no .warc"):
        _expand([str(good), str(empty)])
    with pytest.raises(ValueError, match="does not exist"):
        _expand(str(tmp_path / "typo"))
