"""Random-walk corpus generation (algos/walks.py) vs the independent
dict-adjacency oracle (tests/oracle.walks_oracle) and the driver SQL."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from ligrust_ray.algos.walks import random_walks
from tests import oracle

CASES = [
    ("er", *oracle.random_digraph(48, 6.0, seed=7)),
    ("zipf", *oracle.random_digraph(120, 0, seed=9, zipf=True)),
    ("path", np.array([0, 1, 2]), np.array([1, 2, 3])),   # dead end at 3
    ("self-loop", np.array([0, 1, 1]), np.array([0, 1, 0])),
    ("empty", np.array([], dtype=np.int64), np.array([], dtype=np.int64)),
]


def _ds(src, dst):
    return ray.data.from_arrow(pa.table({
        "src": pa.array(src.astype(np.int64)),
        "dst": pa.array(dst.astype(np.int64))}))


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = (["start", "step", "node"]
            if len(df) and "wid" not in df.columns
            else ["start", "wid", "step", "node"])
    if not len(df):
        # Ray to_pandas() drops columns on a fully-empty dataset
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    return (df[cols].astype(np.int64)
            .sort_values(cols[:-1]).reset_index(drop=True))


@pytest.mark.parametrize("mode", ["task", "distributed"])
@pytest.mark.parametrize("name,src,dst", CASES, ids=[c[0] for c in CASES])
def test_walks_match_oracle(ray_session, name, src, dst, mode):
    got = _norm(random_walks(_ds(src, dst), mode=mode).to_pandas())
    n = int(max(src.max(), dst.max())) + 1 if len(src) else 0
    exp = _norm(oracle.walks_oracle(n, src.astype(np.int64),
                                    dst.astype(np.int64)))
    pd.testing.assert_frame_equal(got, exp)
    assert not len(got) or (got["wid"] == 0).all()


@pytest.mark.parametrize("mode", ["task", "distributed"])
def test_multi_walks_match_oracle(ray_session, mode):
    """walks_per_node=3: wid enters the chooser, walks decorrelate, and
    the engine still equals the oracle walk-for-walk."""
    _, src, dst = CASES[0]
    got = _norm(random_walks(_ds(src, dst), walks_per_node=3,
                             mode=mode).to_pandas())
    n = int(max(src.max(), dst.max())) + 1
    exp = _norm(oracle.walks_oracle(n, src.astype(np.int64),
                                    dst.astype(np.int64), walks=3))
    pd.testing.assert_frame_equal(got, exp)
    assert set(got["wid"].unique()) == {0, 1, 2}
    # walks from the same start diverge somewhere (hash decorrelation);
    # compare only steps where BOTH wids survive (NaN != x is truthy and
    # would make the assertion vacuous)
    by = got.pivot_table(index=["start", "step"], columns="wid",
                         values="node", aggfunc="first").dropna(subset=[0, 1])
    assert (by[0] != by[1]).any()


def test_walks_length_and_determinism(ray_session):
    _, src, dst = CASES[0][0], CASES[0][1], CASES[0][2]
    a = _norm(random_walks(_ds(src, dst), length=2).to_pandas())
    b = _norm(random_walks(_ds(src, dst), length=2).to_pandas())
    pd.testing.assert_frame_equal(a, b)          # pure function of input
    assert set(a["step"].unique()) <= {1, 2}
    # each (start, wid, step) appears at most once: one walk per start
    assert not a.duplicated(["start", "wid", "step"]).any()


def test_walks_id_overflow_guard(ray_session):
    big = np.array([1 << 31], dtype=np.int64)
    with pytest.raises(ValueError, match="2\\^31"):
        random_walks(_ds(big, big + 1))


def test_events_walks_vs_duckdb(ray_session):
    """Contract query vs its SQL oracle on sf0.001 — in-repo mirror of
    the driver compare."""
    import duckdb

    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    got = _norm(E.queries()["events_walks"](sf).to_pandas())
    exp = _norm(con.execute(E.oracle_sql()["events_walks"]).df())
    pd.testing.assert_frame_equal(got, exp)


def _norm_pairs(df: pd.DataFrame) -> pd.DataFrame:
    if not len(df):
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in ("center", "context", "n")})
    return (df[["center", "context", "n"]].astype(np.int64)
            .sort_values(["center", "context"]).reset_index(drop=True))


def test_skipgrams_match_oracle(ray_session):
    from ligrust_ray.algos.walks import skipgram_pairs

    for name, src, dst in CASES:
        walks = random_walks(_ds(src, dst))
        got = _norm_pairs(skipgram_pairs(walks).to_pandas())
        n = int(max(src.max(), dst.max())) + 1 if len(src) else 0
        wf = oracle.walks_oracle(n, src.astype(np.int64),
                                 dst.astype(np.int64))
        exp = _norm_pairs(oracle.skipgrams_oracle(wf))
        pd.testing.assert_frame_equal(got, exp, obj=name)


def test_events_skipgrams_vs_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    got = _norm_pairs(E.queries()["events_skipgrams"](sf).to_pandas())
    exp = _norm_pairs(con.execute(E.oracle_sql()["events_skipgrams"]).df())
    pd.testing.assert_frame_equal(got, exp)


@pytest.mark.parametrize("mode", ["task", "distributed"])
@pytest.mark.parametrize("name,src,dst", CASES, ids=[c[0] for c in CASES])
def test_no_backtrack_walks_match_oracle(ray_session, name, src, dst, mode):
    got = _norm(random_walks(_ds(src, dst), no_backtrack=True,
                             mode=mode).to_pandas())
    n = int(max(src.max(), dst.max())) + 1 if len(src) else 0
    exp = _norm(oracle.walks_oracle(n, src.astype(np.int64),
                                    dst.astype(np.int64),
                                    no_backtrack=True))
    pd.testing.assert_frame_equal(got, exp)


def test_no_backtrack_terminates_on_pendant(ray_session):
    """0 <-> 1 only: a no-backtrack walk must stop after one step, while
    the standard walk oscillates for all 4 steps."""
    src = np.array([0, 1], dtype=np.int64)
    dst = np.array([1, 0], dtype=np.int64)
    nb = _norm(random_walks(_ds(src, dst), no_backtrack=True).to_pandas())
    std = _norm(random_walks(_ds(src, dst)).to_pandas())
    assert len(nb) == 2                 # one step per start, then stuck
    assert set(nb["step"]) == {1}
    assert len(std) == 8                # 4 steps per start


def test_walk_cache_invalidates_on_data_change(ray_session, tmp_path):
    """_walks_cached keys on the events.parquet fingerprint: regenerating
    the file under the SAME path must produce fresh walks (and evict the
    stale cache entry), not serve the old corpus."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ligrust_ray.pipelines import queries as Q

    sf = str(tmp_path)
    shutil.copy("/root/testdata/sf0.001/events.parquet",
                os.path.join(sf, "events.parquet"))
    first = Q._walks_cached(sf).to_pandas()
    n_keys = len(Q._WALK_CACHE)

    # regenerate: keep only the first half of the rows (different graph)
    t = pq.read_table(os.path.join(sf, "events.parquet"))
    pq.write_table(t.slice(0, t.num_rows // 2),
                   os.path.join(sf, "events.parquet"))
    second = Q._walks_cached(sf).to_pandas()
    assert len(Q._WALK_CACHE) == n_keys          # stale entry evicted
    assert not first.equals(second)

    Q.clear_caches()
    assert not Q._WALK_CACHE and not Q._WEDGE_CACHE and not Q._GRAPH_CACHE
