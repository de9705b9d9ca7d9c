"""Onion decomposition: single-task vs forced-distributed parity, a
Python peeling replica, and layer/core invariants."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ligrust_ray.algos.onion import ONION_SQL_ROUNDS, onion_layers


def _pairs_ds(a: np.ndarray, b: np.ndarray) -> ray.data.Dataset:
    return ray.data.from_arrow(pa.table({
        "lo": pa.array(np.minimum(a, b).astype(np.int64)),
        "hi": pa.array(np.maximum(a, b).astype(np.int64))}))


def _brute(pairs: set) -> pd.DataFrame:
    from collections import defaultdict

    adj = defaultdict(set)
    for x, y in pairs:
        adj[x].add(y)
        adj[y].add(x)
    alive = set(adj)
    deg = {v: len(nb) for v, nb in adj.items()}
    k, r, rows = 0, 0, []
    while alive:
        r += 1
        k = max(k, min(deg[v] for v in alive))
        rm = [v for v in alive if deg[v] <= k]
        for v in rm:
            rows.append((v, r, k))
            alive.discard(v)
        for v in rm:
            for w in adj[v]:
                if w in alive:
                    deg[w] -= 1
    return (pd.DataFrame(rows, columns=["node_id", "layer", "core"])
            .sort_values("node_id").reset_index(drop=True)
            .astype(np.int64))


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (df.sort_values("node_id").reset_index(drop=True)
            .astype(np.int64))


CASES = []
_rng = np.random.default_rng(5)
for n, m in ((20, 40), (60, 200), (9, 8)):
    a = _rng.integers(0, n, m)
    b = _rng.integers(0, n, m)
    keep = a != b
    CASES.append((a[keep], b[keep]))
# planted: K5 clique + a path tail (distinct layers and cores)
_k5 = np.array([(i, j) for i in range(5) for j in range(i + 1, 5)])
_tail = np.array([(4, 10), (10, 11), (11, 12)])
CASES.append((np.concatenate([_k5[:, 0], _tail[:, 0]]),
              np.concatenate([_k5[:, 1], _tail[:, 1]])))


def test_onion_matches_bruteforce_both_paths(ray_session):
    # distributed rounds cost ~6 Ray jobs each — parity-force the two
    # small cases only; the fast path covers every case
    for ci, (a, b) in enumerate(CASES):
        pairs = {(min(int(x), int(y)), max(int(x), int(y)))
                 for x, y in zip(a, b)}
        pl, ph = np.array([p[0] for p in pairs]), \
            np.array([p[1] for p in pairs])
        exp = _brute(pairs)
        fast = _norm(onion_layers(_pairs_ds(pl, ph)).to_pandas())
        pd.testing.assert_frame_equal(fast, exp)
        if ci >= 2:
            dist = _norm(onion_layers(_pairs_ds(pl, ph),
                                      force_distributed=True).to_pandas())
            pd.testing.assert_frame_equal(dist, exp)


def test_onion_invariants(ray_session):
    a, b = CASES[-1]
    pairs = {(min(int(x), int(y)), max(int(x), int(y)))
             for x, y in zip(a, b)}
    got = _norm(onion_layers(_pairs_ds(
        np.array([p[0] for p in pairs]),
        np.array([p[1] for p in pairs]))).to_pandas())
    by = got.set_index("node_id")
    # K5 members end in core 4; the path tail peels at core 1
    assert (by.loc[[0, 1, 2, 3, 4], "core"] == 4).all()
    assert (by.loc[[10, 11, 12], "core"] == 1).all()
    # core is non-decreasing in layer (the threshold only rises)
    seq = got.sort_values("layer")["core"].to_numpy()
    assert (np.diff(seq) >= 0).all()
    assert got["layer"].min() == 1
    assert ONION_SQL_ROUNDS == 64        # contract constant (oracle unroll)


def test_onion_checkpoint_resume_bitwise(ray_session, tmp_path):
    """r5: round manifests on the onion peel — a run capped mid-peel
    (the cap raises with survivors remaining, but every completed round
    is committed) resumes to the bitwise output of an uninterrupted
    run; stale dirs are ignored."""
    import pytest

    rng = np.random.default_rng(3)
    a = rng.integers(0, 60, 420)
    b = rng.integers(0, 60, 420)
    keep = a != b
    a, b = a[keep], b[keep]
    pairs = {(int(min(x, y)), int(max(x, y))) for x, y in zip(a, b)}
    base = (onion_layers(_pairs_ds(a, b), force_distributed=True)
            .to_pandas().sort_values("node_id").reset_index(drop=True))
    n_rounds = int(base["layer"].max())
    assert n_rounds >= 2

    ck = str(tmp_path / "on_ck")
    with pytest.raises(RuntimeError, match="no fixed point"):
        onion_layers(_pairs_ds(a, b), rounds=1,
                     checkpoint_dir=ck).to_pandas()
    from ligrust_ray.algos.onion import _onion_ckpt_latest
    man = _onion_ckpt_latest(ck)
    assert man is not None and man["round"] == 1
    resumed = (onion_layers(_pairs_ds(a, b), checkpoint_dir=ck)
               .to_pandas().sort_values("node_id")
               .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        resumed.astype(np.int64), base.astype(np.int64))

    # stale dir (different pair set) is ignored
    a2 = rng.integers(0, 30, 100)
    b2 = rng.integers(0, 30, 100)
    keep2 = a2 != b2
    a2, b2 = a2[keep2], b2[keep2]
    plain = (onion_layers(_pairs_ds(a2, b2), force_distributed=True)
             .to_pandas().sort_values("node_id").reset_index(drop=True))
    via_ck = (onion_layers(_pairs_ds(a2, b2), checkpoint_dir=ck)
              .to_pandas().sort_values("node_id")
              .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        via_ck.astype(np.int64), plain.astype(np.int64))
