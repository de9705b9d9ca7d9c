import numpy as np
import pyarrow as pa

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
    for a, b in edges:
        for c in adj[a] & adj[b]:
            cnt[a] += 1  # counted once per incident edge-pair; /2 below
    # simpler exact recompute: triangles containing v
    cnt = np.zeros(n, dtype=np.int64)
    tris = set()
    for a, b in edges:
        for c in adj[a] & adj[b]:
            tris.add(tuple(sorted((a, b, c))))
    for t in tris:
        for v in t:
            cnt[v] += 1
    return len(tris), cnt


def test_triangles_exact(ray_session):
    for n, seed in [(25, 1), (60, 4), (100, 9)]:
        src, dst = oracle.random_digraph(n, 4.0, seed)
        t = pa.table({"src": src, "dst": dst})
        exp_total, exp_pn = _per_node_oracle(n, src, dst)
        assert oracle.triangles_oracle(src, dst) == exp_total
        total, pn = triangle_count(t, n=n, per_node=True)
        assert total == exp_total
        np.testing.assert_array_equal(pn["triangles"].to_numpy(), exp_pn)


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
        np.testing.assert_array_equal(pn["triangles"].to_numpy(), exp_pn)
        assert triangle_count(t, n=n, probe_mode="bucketed") == exp_total


def test_triangles_parallel_edges_and_self_loops(ray_session):
    # duplicates and self-loops must not change the count
    src = np.array([0, 0, 1, 1, 2, 2, 0], dtype=np.int64)
    dst = np.array([1, 1, 2, 2, 0, 2, 0], dtype=np.int64)
    assert triangle_count(pa.table({"src": src, "dst": dst}), n=3) == 1


def test_triangles_empty(ray_session):
    t = pa.table({"src": pa.array([], type=pa.int64()),
                  "dst": pa.array([], type=pa.int64())})
    assert triangle_count(t, n=5) == 0
