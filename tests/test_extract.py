import numpy as np

from ligrust_ray.functions.extract import ExtractLinks, extract_page
from ligrust_ray.sources.synth import generate_pages, generate_pages_slice, _resolve


def test_extract_deterministic_and_self_consistent():
    t = generate_pages(120, seed=42)
    for i in range(0, 120, 17):
        html = t.column("html")[i].as_py()
        text1, links1 = extract_page(html, base_url=t.column("url")[i].as_py())
        text2, links2 = extract_page(html, base_url=t.column("url")[i].as_py())
        assert text1 == text2  # byte-identical per url (input_hint invariant)
        assert links1 == links2
        assert text1 == t.column("text")[i].as_py()  # corpus self-consistency


def test_extract_strips_script_and_keeps_duplicates():
    html = (b'<html><head><script>x</script></head><body><p>hello  world</p>'
            b'<a href="/a">x</a><a href="/a">y</a><a href="http://z/b">z</a>'
            b"</body></html>")
    text, links = extract_page(html, base_url="http://base.example/p/1")
    assert "x" not in text.split("hello")[0]
    assert text.startswith("hello world")
    assert links == ["http://base.example/a", "http://base.example/a", "http://z/b"]


def test_extract_malformed_html_no_crash():
    text, links = extract_page(b"<html><p>ok<a href=", base_url="http://b/")
    assert "ok" in text


def test_synth_chunk_equivalence():
    import pyarrow as pa

    urls, hubs = _resolve(90, 7, None, None)
    whole = generate_pages_slice(0, 90, urls, hubs, 7, 200, 1000, 0.02, 0.01)
    parts = [generate_pages_slice(lo, min(lo + 30, 90), urls, hubs, 7, 200, 1000,
                                  0.02, 0.01) for lo in range(0, 90, 30)]
    assert pa.concat_tables(parts).equals(whole)


def test_links_only_parser_matches_full_parse():
    """extract_links (text-skipping fast path) must equal
    extract_page()[1] on the synth corpus AND adversarial HTML."""
    from ligrust_ray.functions.extract import extract_links

    t = generate_pages(200, seed=11)
    for i in range(200):
        u = t.column("url")[i].as_py()
        html = t.column("html")[i].as_py()
        assert extract_links(html, u) == extract_page(html, u)[1]
    nasty = [
        b'<a href="/x">a</a><script><a href="/hidden">s</a></script>',
        b'<noscript><a href="/ns">n</a></noscript>',
        b"<a href='/single'>q</a><a href=unquoted>u</a>",
        b'<a href="/amp?a=1&amp;b=2">e</a>',
        b'<A HREF="/upper">c</A>',
        b'<a href="">empty</a><a>none</a>',
        b'<a href="/broken',
        '<a href="/unicodé">u</a>'.encode(),
    ]
    for html in nasty:
        assert extract_links(html, "http://b/") == \
            extract_page(html, "http://b/")[1]


def test_extract_links_batchfn():
    t = generate_pages(50, seed=3)
    out = ExtractLinks()(t)
    # row-by-row equivalence against the pure function
    exp_src, exp_dst = [], []
    for i in range(50):
        u = t.column("url")[i].as_py()
        _, links = extract_page(t.column("html")[i].as_py(), base_url=u)
        exp_src += [u] * len(links)
        exp_dst += links
    assert out.column("src_url").to_pylist() == exp_src
    assert out.column("dst_url").to_pylist() == exp_dst


def test_extract_anchors_href_parity_and_text():
    """extract_anchors: href list equals extract_links exactly on the
    synthetic corpus and on adversarial HTML; anchor texts are
    whitespace-collapsed, skip-tag-excluded, nested/EOF-safe."""
    from ligrust_ray.functions.extract import extract_anchors, extract_links

    t = generate_pages(60, seed=11)
    for i in range(60):
        u = t.column("url")[i].as_py()
        html = t.column("html")[i].as_py()
        hrefs, texts = extract_anchors(html, base_url=u)
        assert hrefs == extract_links(html, base_url=u)
        assert len(hrefs) == len(texts)
        assert all(tx == " ".join(tx.split()) for tx in texts)

    cases = {
        b'<a href="/x">hello  world</a>': [("B/x", "hello world")],
        # a new <a> implicitly closes the previous (invalid nesting)
        b'<a href="/x">first <a href="/y">second</a>':
            [("B/x", "first"), ("B/y", "second")],
        b'<a href="/eof">left open': [("B/eof", "left open")],
        b'<a>no href</a><a href="/z"></a>': [("B/z", "")],
        b'<script><a href="/s">x</a></script><a href="/r">r</a>':
            [("B/r", "r")],
        b'<a href="/b">foo <b>bar</b> baz</a>': [("B/b", "foo bar baz")],
    }
    for html, exp in cases.items():
        hrefs, texts = extract_anchors(html, base_url="http://B/")
        assert hrefs == extract_links(html, base_url="http://B/"), html
        got = [(h.replace("http://B", "B"), tx)
               for h, tx in zip(hrefs, texts)]
        assert got == exp, (html, got)


def test_pages_anchor_text_vs_duckdb(ray_session):
    """Contract query vs its SQL oracle — in-repo mirror of the driver
    compare (the SQL reads the artifact the query persists)."""
    import duckdb
    import pandas as pd

    import __ray_entry__ as E

    got = E.queries()["pages_anchor_text"]("/root/testdata/sf0.001")
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    exp = duckdb.sql(E.oracle_sql()["pages_anchor_text"]).df()
    cols = sorted(exp.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    exp = exp[cols].sort_values(cols).reset_index(drop=True)
    got["n"] = got["n"].astype(np.int64)
    exp["n"] = exp["n"].astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)
    assert got.groupby("dst_url").size().max() <= 3


def test_pages_crawl_order_vs_duckdb(ray_session):
    """Politeness crawl order vs its SQL oracle, plus the two scheduling
    invariants: crawl_pos is a permutation of 0..n-1, and within every
    host fetch order follows the priority rank k (no host is visited at
    round k+1 before its round-k url globally)."""
    import duckdb
    import pandas as pd

    import __ray_entry__ as E

    got = E.queries()["pages_crawl_order"]("/root/testdata/sf0.001")
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    exp = duckdb.sql(E.oracle_sql()["pages_crawl_order"]).df()
    cols = sorted(exp.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    e = exp[cols].sort_values(cols).reset_index(drop=True)
    for c in ("k", "crawl_pos"):
        g[c] = g[c].astype(np.int64)
        e[c] = e[c].astype(np.int64)
    pd.testing.assert_frame_equal(g, e)
    n = len(got)
    assert sorted(got["crawl_pos"].tolist()) == list(range(n))
    by_pos = got.sort_values("crawl_pos")
    # round-robin: k is non-decreasing along the global fetch order
    assert (np.diff(by_pos["k"].to_numpy()) >= 0).all()
    # per-host: fetch order == priority order
    per_host = got.sort_values(["host", "crawl_pos"])
    assert (per_host.groupby("host")["k"].diff().dropna() == 1).all()


def test_pages_host_cap_vs_duckdb(ray_session):
    """Per-host crawl-budget cap vs its SQL oracle, plus the cap
    invariants: <= HOST_CAP_K survivors per host with dense ranks
    0..count-1, and the kept set per host is exactly crawl_order's
    first-k prefix (same priority tape)."""
    import duckdb
    import pandas as pd

    import __ray_entry__ as E
    from ligrust_ray.pipelines.queries import HOST_CAP_K

    got = E.queries()["pages_host_cap"]("/root/testdata/sf0.001")
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    exp = duckdb.sql(E.oracle_sql()["pages_host_cap"]).df()
    cols = sorted(exp.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    e = exp[cols].sort_values(cols).reset_index(drop=True)
    g["k"] = g["k"].astype(np.int64)
    e["k"] = e["k"].astype(np.int64)
    pd.testing.assert_frame_equal(g, e)
    sizes = got.groupby("host")["k"].agg(["size", "max"])
    assert (sizes["size"] <= HOST_CAP_K).all()
    assert (sizes["max"] == sizes["size"] - 1).all()    # dense ranks
    order = E.queries()["pages_crawl_order"]("/root/testdata/sf0.001")
    order = order.to_pandas() if hasattr(order, "to_pandas") else order
    pfx = order[order["k"] < HOST_CAP_K][["url", "host", "k"]]
    pd.testing.assert_frame_equal(
        got.sort_values(["host", "k"]).reset_index(drop=True)
        [["url", "host", "k"]].astype({"k": np.int64}),
        pfx.sort_values(["host", "k"]).reset_index(drop=True)
        .astype({"k": np.int64}))


def test_pages_host_locality_vs_duckdb(ray_session):
    """Per-host link locality vs its SQL oracle + sanity invariants
    (n_intra <= n_links, permille in [0, 1000], totals match the edge
    count)."""
    import duckdb
    import pandas as pd

    import __ray_entry__ as E

    got = E.queries()["pages_host_locality"]("/root/testdata/sf0.001")
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    exp = duckdb.sql(E.oracle_sql()["pages_host_locality"]).df()
    cols = sorted(exp.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    e = exp[cols].sort_values(cols).reset_index(drop=True)
    for c in ("n_links", "n_intra", "locality_permille"):
        g[c] = g[c].astype(np.int64)
        e[c] = e[c].astype(np.int64)
    pd.testing.assert_frame_equal(g, e)
    assert (got["n_intra"] <= got["n_links"]).all()
    assert got["locality_permille"].between(0, 1000).all()
