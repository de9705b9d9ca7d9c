"""Truss peel (algos/truss.py) vs the independent set-intersection oracle
(tests/oracle.truss_oracle), both execution modes."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from ligrust_ray.algos.truss import TRUSS_ROUNDS, truss_peel
from tests import oracle

CASES = [
    # (name, src, dst)
    ("two-triangles-bridge",       # two triangles joined by a bridge edge
     np.array([0, 1, 0, 3, 4, 3, 2]), np.array([1, 2, 2, 4, 5, 5, 3])),
    ("clique5-pendant",            # K5 with a pendant path hanging off
     np.array([i for i in range(5) for j in range(i + 1, 5)] + [4, 5]),
     np.array([j for i in range(5) for j in range(i + 1, 5)] + [5, 6])),
    ("path", np.array([0, 1, 2]), np.array([1, 2, 3])),
    ("empty", np.array([], dtype=np.int64), np.array([], dtype=np.int64)),
    ("self-loops-and-dups",
     np.array([0, 0, 1, 1, 2, 0, 2]), np.array([0, 1, 2, 0, 0, 1, 2])),
    ("er", *oracle.random_digraph(48, 6.0, seed=7)),
    ("zipf", *oracle.random_digraph(120, 0, seed=9, zipf=True)),
]


def _ds(src, dst):
    return ray.data.from_arrow(pa.table({
        "src": pa.array(src.astype(np.int64)),
        "dst": pa.array(dst.astype(np.int64))}))


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    if not len(df):
        # Ray's to_pandas drops column schema on fully-empty datasets
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in ("a", "b", "died_round")})
    return (df.astype(np.int64).sort_values(["a", "b"])
            .reset_index(drop=True))


@pytest.mark.parametrize("name,src,dst", CASES,
                         ids=[c[0] for c in CASES])
def test_truss_task_mode_matches_oracle(ray_session, name, src, dst):
    got = _norm(truss_peel(_ds(src, dst), mode="task").to_pandas())
    exp = _norm(oracle.truss_oracle(src.astype(np.int64),
                                    dst.astype(np.int64)))
    pd.testing.assert_frame_equal(got, exp)


def test_truss_distributed_matches_task(ray_session):
    """The per-round shuffle loop must equal the single-task peel —
    including a skewed graph where the peel cascades over a few rounds.
    (The long-cascade er case is covered rounds-capped below: each
    distributed round costs ~2 executor jobs, so the full 10+-round
    cascade belongs to the single-task path at this scale anyway.)"""
    for name, src, dst in [CASES[0], CASES[1], CASES[3], CASES[6]]:
        got = _norm(truss_peel(_ds(src, dst),
                               mode="distributed").to_pandas())
        exp = _norm(oracle.truss_oracle(src.astype(np.int64),
                                        dst.astype(np.int64)))
        pd.testing.assert_frame_equal(got, exp, obj=name)


def test_truss_distributed_rounds_cap_matches(ray_session):
    """Rounds-capped distributed peel on the er graph (cascades every
    round): died_round beyond the cap stays 0 on both sides."""
    _, src, dst = CASES[5]
    got = _norm(truss_peel(_ds(src, dst), mode="distributed",
                           rounds=3).to_pandas())
    exp = _norm(oracle.truss_oracle(src.astype(np.int64),
                                    dst.astype(np.int64), rounds=3))
    pd.testing.assert_frame_equal(got, exp)


def test_events_truss_vs_duckdb(ray_session):
    """Contract query vs its SQL oracle on sf0.001 — in-repo mirror of
    the driver compare."""
    import duckdb

    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    got = _norm(E.queries()["events_truss"](sf).to_pandas())
    exp = _norm(con.execute(E.oracle_sql()["events_truss"]).df())
    pd.testing.assert_frame_equal(got, exp)


def test_truss_threshold_override_and_cap(ray_session):
    src, dst = CASES[1][1], CASES[1][2]          # clique5 + pendant
    # T=4: every K5 edge has support 3 < 4 -> all die (pendant edges die
    # round 1 with support 0, clique follows once T exceeds 3)
    got = _norm(truss_peel(_ds(src, dst), threshold=4).to_pandas())
    assert (got["died_round"] > 0).all()
    exp = _norm(oracle.truss_oracle(src.astype(np.int64),
                                    dst.astype(np.int64), threshold=4))
    pd.testing.assert_frame_equal(got, exp)
    # T=0: nothing ever dies
    got0 = _norm(truss_peel(_ds(src, dst), threshold=0).to_pandas())
    assert (got0["died_round"] == 0).all()
    # rounds=1 cap: only the first synchronous wave dies
    got1 = _norm(truss_peel(_ds(src, dst), rounds=1,
                            threshold=4).to_pandas())
    exp1 = _norm(oracle.truss_oracle(src.astype(np.int64),
                                     dst.astype(np.int64), rounds=1,
                                     threshold=4))
    pd.testing.assert_frame_equal(got1, exp1)
    assert TRUSS_ROUNDS == 16            # contract constant (oracle unroll)


def test_truss_checkpoint_resume_bitwise(ray_session, tmp_path):
    """r5: round-level manifests on the peel loop — a run killed after
    each round k resumes from the checkpoint and produces the bitwise
    output of an uninterrupted run; stale dirs are ignored."""
    src, dst = oracle.random_digraph(60, 8.0, seed=2)
    base = truss_peel(_ds(src, dst), mode="distributed")
    base_df = _norm(base.to_pandas())
    n_rounds = int(base_df["died_round"].max())
    assert n_rounds >= 2          # the case must exercise multiple rounds

    # uninterrupted checkpointed run == plain run
    ck0 = str(tmp_path / "ck0")
    full = _norm(truss_peel(_ds(src, dst),
                            checkpoint_dir=ck0).to_pandas())
    pd.testing.assert_frame_equal(full, base_df)

    # "kill" after round k (simulated by capping rounds), then resume
    for k in (1, 2):
        ck = str(tmp_path / f"ck{k}_kill")
        truss_peel(_ds(src, dst), rounds=k, checkpoint_dir=ck).to_pandas()
        from ligrust_ray.algos.truss import _truss_ckpt_latest
        man = _truss_ckpt_latest(ck)
        assert man is not None and man["round"] == k
        resumed = _norm(truss_peel(_ds(src, dst),
                                   checkpoint_dir=ck).to_pandas())
        pd.testing.assert_frame_equal(resumed, base_df)

    # stale checkpoint (different edge set) is ignored, not resumed
    ck_stale = str(tmp_path / "ck_stale")
    truss_peel(_ds(src, dst), rounds=1, checkpoint_dir=ck_stale)\
        .to_pandas()
    src2, dst2 = oracle.random_digraph(60, 4.0, seed=5)
    other = _norm(truss_peel(_ds(src2, dst2),
                             checkpoint_dir=str(tmp_path / "fresh"))
                  .to_pandas())
    other_stale = _norm(truss_peel(_ds(src2, dst2),
                                   checkpoint_dir=ck_stale).to_pandas())
    pd.testing.assert_frame_equal(other_stale, other)
