"""sources/jsonl.py — NDJSON intake normalisation + CLI import."""

import json
import os

import numpy as np
import pandas as pd

from ligrust_ray.dataops.hashing import md5_u64_lower


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_read_documents_jsonl_normalises(ray_session, tmp_path):
    from ligrust_ray.sources.jsonl import read_documents_jsonl

    p = str(tmp_path / "a.jsonl")
    _write_jsonl(p, [
        {"doc_id": 7, "text": "hello world", "lang": "en",
         "source": "crawl-a"},
        {"doc_id": 8, "text": "hallo welt", "lang": None},   # null lang
        {"doc_id": 9, "text": "ciao"},                       # missing meta
    ])
    got = read_documents_jsonl(p).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert list(got.columns) == ["doc_id", "text", "lang", "source",
                                 "n_chars"]
    assert got["doc_id"].tolist() == [7, 8, 9]
    assert got["lang"].tolist() == ["en", "und", "und"]
    assert got["source"].tolist() == ["crawl-a", "jsonl", "jsonl"]
    assert got["n_chars"].tolist() == [11, 10, 4]


def test_read_documents_jsonl_content_ids(ray_session, tmp_path):
    from ligrust_ray.sources.jsonl import read_documents_jsonl

    p = str(tmp_path / "noid.jsonl")
    _write_jsonl(p, [{"text": "alpha"}, {"text": "beta"},
                     {"text": "alpha"}])
    got = read_documents_jsonl(p).to_pandas()
    exp = [md5_u64_lower(t.encode()) & ((1 << 63) - 1)
           for t in ("alpha", "beta", "alpha")]
    assert got["doc_id"].tolist() == exp          # content-addressed,
    assert got["doc_id"][0] == got["doc_id"][2]   # dup text -> same id


def test_import_jsonl_cli_roundtrip(ray_session, tmp_path):
    from ligrust_ray.cli import main
    from ligrust_ray.sources.resumable_sink import read_partitioned

    src = str(tmp_path / "in.jsonl")
    rows = [{"doc_id": i, "text": f"doc number {i}", "lang": "en"}
            for i in range(50)]
    _write_jsonl(src, rows)
    out = str(tmp_path / "sink")
    assert main(["import-jsonl", src, "-o", out, "--shards", "4"]) == 0
    back = read_partitioned(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert len(back) == 50
    pd.testing.assert_series_equal(
        back["doc_id"], pd.Series(np.arange(50, dtype=np.int64),
                                  name="doc_id"))
    assert back["text"].tolist() == [f"doc number {i}" for i in range(50)]
    # rerun skips all committed shards
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        main(["import-jsonl", src, "-o", out, "--shards", "4"])
    again = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert again["rows_written"] == 0 and again["shards_skipped"] == 4


def test_corpus_stats_cli(ray_session, tmp_path, capsys):
    from ligrust_ray.cli import main

    assert main(["corpus-stats", "/root/testdata/sf0.001"]) == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["n_docs"] == 500 and got["n_chars"] == 153156
    assert got["n_sources"] == 20 and got["langs"]["en"] == 193
    # also over a resumable sink dir (the import-jsonl output layout)
    src = str(tmp_path / "cs.jsonl")
    _write_jsonl(src, [{"doc_id": i, "text": "x" * (i + 1), "lang": "en"}
                       for i in range(10)])
    out = str(tmp_path / "cs_sink")
    main(["import-jsonl", src, "-o", out, "--shards", "2"])
    main(["corpus-stats", out])
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["n_docs"] == 10 and got["n_chars"] == 55


def test_build_from_csv_edges(ray_session, tmp_path, capsys):
    """CSV edge intake builds the same graph as the parquet edge path."""
    from ligrust_ray.cli import main

    csvp = str(tmp_path / "e.csv")
    with open(csvp, "w") as f:
        f.write("src,dst\n0,1\n1,2\n2,0\n2,3\n")
    out = str(tmp_path / "gcsv")
    assert main(["build", csvp, "-o", out, "-p", "2",
                 "--format", "csv"]) == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got == {"n": 4, "m": 4, "partitions": 2}
    from ligrust_ray.algos.cc import cc
    from ligrust_ray.state.graph import DistGraph

    g = DistGraph.load(out)
    cc(g)
    assert g.collect_state(["ids"])["ids"].tolist() == [0, 0, 0, 0]


def test_shuffle_export_cli(ray_session, tmp_path, capsys):
    """shuffle-export writes pos-ordered shards matching the docs_shuffle
    assignment, and a rerun skips every committed shard."""
    import duckdb
    import pyarrow.parquet as pq

    from ligrust_ray.cli import main

    out = str(tmp_path / "train")
    assert main(["shuffle-export", "/root/testdata/sf0.001",
                 "-o", out]) == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["rows_written"] == 500 and got["shards"] == 8
    # per-shard: pos strictly increasing, shard == pos % 8, text carried
    total = 0
    for sh in range(8):
        t = pq.read_table(os.path.join(out, f"shard={sh:05d}",
                                       "part.parquet"))
        pos = t.column("pos").to_numpy()
        assert (np.diff(pos) > 0).all() and (pos % 8 == sh).all()
        assert t.column("text").null_count == 0
        total += t.num_rows
    assert total == 500
    # the global order matches the SQL rank spec
    exp = duckdb.sql(
        "WITH r AS (SELECT doc_id, md5_number_lower(CAST(doc_id AS "
        "VARCHAR)) AS h FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')) "
        "SELECT doc_id FROM r ORDER BY h, doc_id LIMIT 5").df()
    first = pq.read_table(os.path.join(out, "shard=00000",
                                       "part.parquet")).to_pandas()
    assert first.sort_values("pos")["doc_id"].iloc[0] == \
        exp["doc_id"].iloc[0]
    # resume: nothing rewritten
    main(["shuffle-export", "/root/testdata/sf0.001", "-o", out])
    again = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert again["rows_written"] == 0 and again["shards_skipped"] == 8


def test_jsonl_missing_text_field_raises(ray_session, tmp_path):
    import pytest

    from ligrust_ray.sources.jsonl import read_documents_jsonl

    p = str(tmp_path / "bad.jsonl")
    _write_jsonl(p, [{"content": "oops", "doc_id": 1}])
    with pytest.raises(Exception, match="text field 'text' absent"):
        read_documents_jsonl(p).materialize()


def test_shuffle_export_refuses_duplicate_ids(ray_session, tmp_path,
                                              capsys):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ligrust_ray.cli import main

    d = str(tmp_path / "dup_sf")
    os.makedirs(d)
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "doc_id": [1, 1, 2], "text": ["a", "a", "b"],
        "lang": ["en"] * 3, "source": ["s"] * 3,
        "n_chars": [1, 1, 1]})), os.path.join(d, "documents.parquet"))
    assert main(["shuffle-export", d, "-o", str(tmp_path / "o")]) == 1
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "duplicate doc_ids" in out["error"]


def test_dedup_cli_exact(ray_session, tmp_path, capsys):
    """dedup --method exact keeps one representative per distinct text
    (sf0.001: 500 docs -> 460 distinct, DuckDB-verified)."""
    import duckdb

    from ligrust_ray.cli import main

    exp = duckdb.sql(
        "SELECT COUNT(DISTINCT text) FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchone()[0]
    out = str(tmp_path / "dd")
    assert main(["dedup", "/root/testdata/sf0.001", "-o", out,
                 "--shards", "4"]) == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["n_docs"] == 500 and got["n_kept"] == exp
    from ligrust_ray.sources.resumable_sink import read_partitioned

    back = read_partitioned(out).to_pandas()
    assert len(back) == exp and back["text"].nunique() == exp


def test_prepare_pipeline_cli(ray_session, tmp_path, capsys):
    """prepare = clean -> dedup -> shuffle -> ordered shards; counts
    match the docs_clean oracle and shard invariants hold."""
    import duckdb
    import pyarrow.parquet as pq

    import __ray_entry__ as E
    from ligrust_ray.cli import main

    out = str(tmp_path / "prep")
    assert main(["prepare", "/root/testdata/sf0.001", "-o", out]) == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet("
                "'/root/testdata/sf0.001/documents.parquet')")
    n_clean = con.execute(
        f"SELECT COUNT(*) FROM ({E.oracle_sql()['docs_clean']})"
    ).fetchone()[0]
    assert got["n_clean"] == n_clean
    assert got["rows_written"] == got["n_kept"] <= n_clean
    total, seen = 0, set()
    for sh in range(8):
        p = os.path.join(out, f"shard={sh:05d}", "part.parquet")
        if not os.path.exists(p):
            continue
        t = pq.read_table(p)
        pos = t.column("pos").to_numpy()
        assert (np.diff(pos) > 0).all() and (pos % 8 == sh).all()
        seen.update(pos.tolist())
        total += t.num_rows
    assert total == got["n_kept"]
    assert seen == set(range(got["n_kept"]))   # pos is a dense 0..k-1


def test_dedup_collapses_duplicate_ids(ray_session, tmp_path, capsys):
    """Content-addressed corpora carry duplicate rows per doc_id; dedup
    must collapse them (one row per survivor, no cross-products)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ligrust_ray.cli import main
    from ligrust_ray.sources.resumable_sink import read_partitioned

    d = str(tmp_path / "dup_sf2")
    os.makedirs(d)
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "doc_id": [7, 7, 9, 9, 9, 4],
        "text": ["same text here", "same text here", "other words",
                 "other words", "other words", "third body"],
        "lang": ["en"] * 6, "source": ["s"] * 6,
        "n_chars": [14, 14, 11, 11, 11, 10]})),
        os.path.join(d, "documents.parquet"))
    out = str(tmp_path / "ddup")
    assert main(["dedup", d, "-o", out, "--shards", "2"]) == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["n_docs"] == 6 and got["n_kept"] == 3
    back = read_partitioned(out).to_pandas()
    assert len(back) == 3
    assert sorted(back["doc_id"]) == [4, 7, 9]
    assert back["text"].nunique() == 3


def test_select_cli_dsir(ray_session, tmp_path, capsys):
    """`select` exports exactly the DuckDB-computed DSIR top-K doc set as
    committed resumable shards; a rerun resumes (all skipped)."""
    import json

    import duckdb

    from ligrust_ray.cli import main

    out = str(tmp_path / "sel")
    assert main(["select", "/root/testdata/sf0.001", "-o", out,
                 "-k", "20", "--shards", "4"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_selected"] == 20 and rep["rows_written"] == 20

    con = duckdb.connect()
    got = set(con.execute(
        f"SELECT doc_id FROM read_parquet('{out}/shard=*/part.parquet')"
    ).df()["doc_id"])
    want = set(con.execute(
        "WITH tok AS (SELECT doc_id, lang, "
        "UNNEST(regexp_extract_all(text, '\\S+')) AS tk "
        "FROM read_parquet('/root/testdata/sf0.001/documents.parquet')), "
        "b AS (SELECT doc_id, lang, "
        "CAST(md5_number_lower(tk) % 8192 AS BIGINT) AS bucket FROM tok), "
        "cnt AS (SELECT bucket, COUNT(*) AS nc, "
        "COUNT(*) FILTER (WHERE lang = 'en') AS nt FROM b GROUP BY bucket), "
        "w AS (SELECT b.doc_id, (1000000 * (c.nt + 1)) // (c.nc + 1) AS tw "
        "FROM b JOIN cnt c USING (bucket)), "
        "s AS (SELECT doc_id, CAST(SUM(tw) // COUNT(*) AS BIGINT) AS score "
        "FROM w GROUP BY doc_id) "
        "SELECT doc_id FROM s ORDER BY score DESC, doc_id LIMIT 20"
    ).df()["doc_id"])
    assert got == want

    # rerun resumes: everything skipped
    assert main(["select", "/root/testdata/sf0.001", "-o", out,
                 "-k", "20", "--shards", "4"]) == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["rows_written"] == 0 and rep2["shards_skipped"] == rep2["shards"]


def test_select_cli_validates_target_and_collapses_dups(ray_session,
                                                        tmp_path, capsys):
    """--target must name an existing string column, and duplicate
    doc_id rows are collapsed before scoring/export (like dedup/prepare)
    so the top-K holds K distinct docs and shards carry no dup rows."""
    import json

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from ligrust_ray.cli import main

    with pytest.raises(SystemExit, match="not in corpus"):
        main(["select", "/root/testdata/sf0.001", "-o",
              str(tmp_path / "x"), "-k", "5", "--target", "nope=1"])
    with pytest.raises(SystemExit, match="string column"):
        main(["select", "/root/testdata/sf0.001", "-o",
              str(tmp_path / "x"), "-k", "5", "--target", "n_chars=10"])
    capsys.readouterr()

    src = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    dup = pa.concat_tables([src, src.slice(0, 20)])   # 20 duplicate ids
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(dup, str(sf / "documents.parquet"))
    out = str(tmp_path / "sel")
    assert main(["select", str(sf), "-o", out, "-k", "15",
                 "--shards", "4"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_selected"] == 15 and rep["rows_written"] == 15
    got = pd.concat([pd.read_parquet(str(p))
                     for p in (tmp_path / "sel").glob("shard=*/part.parquet")])
    assert len(got) == 15 and got["doc_id"].is_unique


def test_hyperball_cli(ray_session, tmp_path, capsys):
    """hyperball CLI over an edge parquet: JSON summary + optional
    per-node parquet, estimates near-exact on a tiny path graph."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ligrust_ray.cli import main

    edges = str(tmp_path / "e.parquet")
    pq.write_table(pa.table({       # 0->1->2->3 path
        "src": pa.array([0, 1, 2], type=pa.int64()),
        "dst": pa.array([1, 2, 3], type=pa.int64())}), edges)
    out = str(tmp_path / "hb.parquet")
    assert main(["hyperball", edges, "-t", "2", "-o", out]) == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["nodes"] == 4 and got["t"] == 2
    per = pq.read_table(out).to_pandas().set_index("node")["estimate"]
    # out-balls at t=2 (exact at these sizes): {0,1,2} {1,2,3} {2,3} {3}
    for node, exact in ((0, 3), (1, 3), (2, 2), (3, 1)):
        assert abs(per[node] - exact) / exact < 0.05
