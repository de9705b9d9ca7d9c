import numpy as np
import pyarrow as pa
import pytest

import oracle
from ligrust_ray.algos.triangles import triangle_count


def _per_node_oracle(n, src, dst):
    edges = set()
    for s, d in zip(src.tolist(), dst.tolist()):
        if s != d:
            edges.add((min(s, d), max(s, d)))
    adj = {v: set() for v in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    cnt = np.zeros(n, dtype=np.int64)
    tris = set()
    for a, b in edges:
        for c in adj[a] & adj[b]:
            tris.add(tuple(sorted((a, b, c))))
    for t in tris:
        for v in t:
            cnt[v] += 1
    return len(tris), cnt


def _dense(pern_ds, n):
    """Densify the nonzero-only per-node Dataset to an n-length array."""
    df = pern_ds.to_pandas()
    full = np.zeros(n, dtype=np.int64)
    if len(df):
        full[df["node_id"].to_numpy()] = df["triangles"].to_numpy()
    return full


def test_triangles_exact(ray_session):
    for n, seed in [(25, 1), (60, 4), (100, 9)]:
        src, dst = oracle.random_digraph(n, 4.0, seed)
        t = pa.table({"src": src, "dst": dst})
        exp_total, exp_pn = _per_node_oracle(n, src, dst)
        assert oracle.triangles_oracle(src, dst) == exp_total
        total, pn = triangle_count(t, n=n, per_node=True)
        assert total == exp_total
        np.testing.assert_array_equal(_dense(pn, n), exp_pn)


def test_triangles_bucketed_matches_broadcast(ray_session):
    """The no-broadcast scale path (wedge<->edge hash join) must equal the
    broadcast path and the oracle, including per-node counts."""
    for n, seed in [(60, 4), (100, 9)]:
        src, dst = oracle.random_digraph(n, 4.0, seed)
        t = pa.table({"src": src, "dst": dst})
        exp_total, exp_pn = _per_node_oracle(n, src, dst)
        total, pn = triangle_count(t, n=n, per_node=True,
                                   probe_mode="bucketed")
        assert total == exp_total
        np.testing.assert_array_equal(_dense(pn, n), exp_pn)
        assert triangle_count(t, n=n, probe_mode="bucketed") == exp_total


def test_triangles_dataset_degrees(ray_session):
    """The 10^10-node scale path — degrees as a Dataset attached via two
    co_group passes, NO n-length driver/broadcast array — must match the
    oracle for both probe modes, n given and n derived."""
    for n, seed in [(60, 4), (100, 9)]:
        src, dst = oracle.random_digraph(n, 4.0, seed)
        t = pa.table({"src": src, "dst": dst})
        exp_total, exp_pn = _per_node_oracle(n, src, dst)
        total, pn = triangle_count(t, n=n, per_node=True,
                                   deg_mode="dataset", probe_mode="bucketed")
        assert total == exp_total
        np.testing.assert_array_equal(_dense(pn, n), exp_pn)
        assert triangle_count(t, deg_mode="dataset") == exp_total  # n derived


def test_triangles_huge_n_merge_probe(ray_session):
    """n >= 2^31 disables the x*n+y scalar encode (int64 overflow): the
    probe falls back to the two-column merge path and bucketed mode."""
    src, dst = oracle.random_digraph(80, 4.0, 7)
    exp = oracle.triangles_oracle(src, dst)
    t = pa.table({"src": src, "dst": dst})
    assert triangle_count(t, n=(1 << 31) + 80, deg_mode="dataset") == exp


def test_triangles_mode_validation(ray_session):
    t = pa.table({"src": np.array([0], dtype=np.int64),
                  "dst": np.array([1], dtype=np.int64)})
    with pytest.raises(ValueError):
        triangle_count(t, probe_mode="bcast")
    with pytest.raises(ValueError):
        triangle_count(t, deg_mode="drivers")


def test_triangles_parallel_edges_and_self_loops(ray_session):
    # duplicates and self-loops must not change the count
    src = np.array([0, 0, 1, 1, 2, 2, 0], dtype=np.int64)
    dst = np.array([1, 1, 2, 2, 0, 2, 0], dtype=np.int64)
    assert triangle_count(pa.table({"src": src, "dst": dst}), n=3) == 1


def test_triangles_empty(ray_session):
    t = pa.table({"src": pa.array([], type=pa.int64()),
                  "dst": pa.array([], type=pa.int64())})
    assert triangle_count(t, n=5) == 0


def test_doulion_matches_hash_filtered_bruteforce(ray_session):
    """DOULION's deterministic md5 coin: the sampled triangle count must
    equal the brute-force count of the hash-filtered edge set (replayed
    here with hashlib), est = 64 x sampled, and on the sf0.001 events
    graph the estimate lands within 30% of the exact count."""
    from ligrust_ray.dataops.hashing import md5_u64_lower
    from ligrust_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    got = Q.q_events_triangles_doulion(sf).to_pandas()
    assert got["est_triangles"].iloc[0] == \
        got["n_sampled_triangles"].iloc[0] * 64

    ed = Q.events_edges_ds(sf).to_pandas()
    src, dst = ed["src"].to_numpy(), ed["dst"].to_numpy()
    pairs = {(min(s, d), max(s, d)) for s, d in zip(src, dst) if s != d}
    kept = [(a, b) for a, b in pairs
            if md5_u64_lower(f"{a},{b}".encode()) % Q.DOULION_DEN == 0]
    n = int(max(src.max(), dst.max())) + 1
    exp_sampled, _ = _per_node_oracle(
        n, np.array([a for a, _ in kept]), np.array([b for _, b in kept]))
    assert got["n_sampled_triangles"].iloc[0] == exp_sampled

    exact, _ = _per_node_oracle(n, src, dst)
    est = got["est_triangles"].iloc[0]
    assert 0.7 * exact <= est <= 1.3 * exact
