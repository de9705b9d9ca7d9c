"""Engine vs oracle conformance (SURVEY.md §5.2): CC/labels exact, PageRank
allclose atol=1e-6, BFS levels exact + parent validity invariant."""

import numpy as np
import pyarrow as pa
import pytest

import oracle
from ligrust_ray.algos.bfs import bfs
from ligrust_ray.algos.cc import cc
from ligrust_ray.algos.labelprop import label_propagation
from ligrust_ray.algos.pagerank import page_rank_delta
from ligrust_ray.pipelines.build import build_graph_from_edges
from ligrust_ray.state.graph import DistGraph


def make_graph(tmp, src, dst, n, nparts=3):
    t = pa.table({"src": pa.array(src, type=pa.int64()),
                  "dst": pa.array(dst, type=pa.int64())})
    build_graph_from_edges(t, tmp, n=n, num_partitions=nparts)
    return DistGraph.load(tmp)


GRAPHS = [
    # (name, n, edge fn)
    ("fixture", 4, lambda: (np.array([0, 2]), np.array([1, 3]))),  # test-graph.input
    ("path", 4, lambda: (np.array([0, 1, 2]), np.array([1, 2, 3]))),
    ("empty-edges", 5, lambda: (np.array([], dtype=np.int64),
                                np.array([], dtype=np.int64))),
    ("self-loop", 3, lambda: (np.array([1]), np.array([1]))),
    ("er-64", 64, lambda: oracle.random_digraph(64, 3.0, seed=1)),
    ("er-300", 300, lambda: oracle.random_digraph(300, 5.0, seed=2)),
    ("zipf-200", 200, lambda: oracle.random_digraph(200, 0, seed=3, zipf=True)),
]


@pytest.fixture(scope="module")
def graphs(ray_session, tmp_path_factory):
    out = {}
    for name, n, fn in GRAPHS:
        src, dst = fn()
        d = str(tmp_path_factory.mktemp(f"g_{name}"))
        out[name] = (make_graph(d, src, dst, n), n,
                     src.astype(np.int64), dst.astype(np.int64))
    return out


@pytest.mark.parametrize("name", [g[0] for g in GRAPHS])
def test_cc_exact(graphs, name):
    g, n, src, dst = graphs[name]
    cc(g)
    got = g.collect_state(["ids"])["ids"]
    exp = oracle.cc_oracle(n, src, dst)
    np.testing.assert_array_equal(got, exp)


@pytest.mark.parametrize("name", [g[0] for g in GRAPHS])
def test_pagerank_allclose(graphs, name):
    g, n, src, dst = graphs[name]
    res = page_rank_delta(g, max_iterations=100)
    got = g.collect_state(["page_rank"])["page_rank"]
    exp, it, err = oracle.page_rank_delta_oracle(n, src, dst, max_iterations=100)
    assert res["iterations"] == it
    np.testing.assert_allclose(got, exp, atol=1e-6)


@pytest.mark.parametrize("name", [g[0] for g in GRAPHS])
def test_bfs_levels_and_parent_invariant(graphs, name):
    g, n, src, dst = graphs[name]
    root = 0
    bfs(g, root)
    st = g.collect_state(["parent", "level"])
    exp_parent, exp_level = oracle.bfs_oracle(n, src, dst, root)
    np.testing.assert_array_equal(st["level"], exp_level)
    # parent = min in-neighbor at level-1 (deterministic refinement) — exact
    np.testing.assert_array_equal(st["parent"], exp_parent)
    # invariant check: every reached non-root parent is an in-neighbor one level up
    edge_set = set(zip(src.tolist(), dst.tolist()))
    for v in range(n):
        p = st["parent"][v]
        if v == root or p == -1:
            continue
        assert (p, v) in edge_set
        assert st["level"][p] == st["level"][v] - 1


@pytest.mark.parametrize("name", [g[0] for g in GRAPHS])
def test_label_propagation_exact(graphs, name):
    g, n, src, dst = graphs[name]
    label_propagation(g, max_iterations=10)
    got = g.collect_state(["labels"])["labels"]
    exp = oracle.label_prop_oracle(n, src, dst, max_iterations=10)
    np.testing.assert_array_equal(got, exp)


def test_push_pull_agree(ray_session, tmp_path):
    """Force both edge_map modes on the same graph: results must be equal
    (mirrors the reference's threshold branch, ligra.rs:82-87)."""
    src, dst = oracle.random_digraph(150, 4.0, seed=9)
    g = make_graph(str(tmp_path / "a"), src, dst, 150, nparts=4)
    # default threshold (m/20): mixed modes
    cc(g)
    ids_mixed = g.collect_state(["ids"])["ids"]
    # force always-push by inflating threshold via monkeypatched m
    g2 = make_graph(str(tmp_path / "b"), src, dst, 150, nparts=4)
    g2.m = 10**12  # threshold = m/20 enormous -> sparse/push every round
    cc(g2)
    ids_push = g2.collect_state(["ids"])["ids"]
    g3 = make_graph(str(tmp_path / "c"), src, dst, 150, nparts=4)
    g3.m = 0  # threshold 0 -> dense/pull every round
    cc(g3)
    ids_pull = g3.collect_state(["ids"])["ids"]
    np.testing.assert_array_equal(ids_mixed, ids_push)
    np.testing.assert_array_equal(ids_mixed, ids_pull)
    # partition-aligned pull (the >16M-node scale path; small graphs
    # normally take the single-object broadcast fast path)
    g4 = make_graph(str(tmp_path / "d"), src, dst, 150, nparts=4)
    g4.m = 0
    g4.PULL_BROADCAST_MAX_NODES = 0
    cc(g4)
    np.testing.assert_array_equal(
        ids_mixed, g4.collect_state(["ids"])["ids"])


def test_partition_aligned_pull_pagerank(ray_session, tmp_path):
    """PageRank through the partition-aligned pull path (broadcast
    disabled) must equal the broadcast path and the oracle."""
    src, dst = oracle.random_digraph(200, 5.0, seed=11)
    g = make_graph(str(tmp_path / "pa"), src, dst, 200, nparts=4)
    g.PULL_BROADCAST_MAX_NODES = 0
    page_rank_delta(g, max_iterations=50)
    got = g.collect_state(["page_rank"])["page_rank"]
    exp, _, _ = oracle.page_rank_delta_oracle(200, src, dst, max_iterations=50)
    np.testing.assert_allclose(got, exp, atol=1e-6)


@pytest.mark.parametrize("name", ["er-300", "zipf-200", "path"])
def test_pagerank_classic_allclose(graphs, name):
    from ligrust_ray.algos.pagerank import page_rank_classic

    g, n, src, dst = graphs[name]
    res = page_rank_classic(g, max_iterations=60)
    got = g.collect_state(["page_rank"])["page_rank"]
    exp, it, err = oracle.page_rank_classic_oracle(n, src, dst,
                                                   max_iterations=60)
    assert res["iterations"] == it
    np.testing.assert_allclose(got, exp, atol=1e-6)


def test_hub_splitting_matches_oracle(ray_session, tmp_path):
    """Skew path: in-lists above hub_in_threshold spill to holder
    partitions (build.py) and merge through the hub-partials wave. All
    three reduce kinds (sum=PR, min=CC, mode=LP) must equal the oracle,
    and the split build must equal the unsplit build."""
    from ligrust_ray.algos.labelprop import label_propagation
    from ligrust_ray.algos.pagerank import page_rank_classic

    # Zipf graph with a designated mega-hub: half of all edges hit node 7
    src, dst = oracle.random_digraph(120, 4.0, seed=21)
    hub_src = np.arange(0, 120, dtype=np.int64)
    src = np.concatenate([src, hub_src])
    dst = np.concatenate([dst, np.full(120, 7, dtype=np.int64)])

    g_split = make_graph(str(tmp_path / "split"), src, dst, 120, nparts=4)
    # rebuild with splitting forced (threshold far below the hub degree)
    t = pa.table({"src": pa.array(src, type=pa.int64()),
                  "dst": pa.array(dst, type=pa.int64())})
    build_graph_from_edges(t, str(tmp_path / "split2"), n=120,
                           num_partitions=4, hub_in_threshold=8)
    g2 = DistGraph.load(str(tmp_path / "split2"))
    assert g2.has_hubs and not g_split.has_hubs
    assert g2.manifest["spilled_in_edges"] > 0

    # CC (min)
    cc(g_split)
    cc(g2)
    exp = oracle.cc_oracle(120, src, dst)
    np.testing.assert_array_equal(g_split.collect_state(["ids"])["ids"], exp)
    np.testing.assert_array_equal(g2.collect_state(["ids"])["ids"], exp)

    # PageRank delta (sum) — exact oracle conformance through the hub wave
    page_rank_delta(g2, max_iterations=60)
    exp_pr, _, _ = oracle.page_rank_delta_oracle(120, src, dst,
                                                 max_iterations=60)
    np.testing.assert_allclose(g2.collect_state(["page_rank"])["page_rank"],
                               exp_pr, atol=1e-6)

    # classic variant exercises the FUSED path with hub_aggs
    r = page_rank_classic(g2, max_iterations=50)
    assert r["iterations"] >= 1

    # LP (mode) — non-associative reduce through driver count-merge
    label_propagation(g2, max_iterations=8)
    exp_lab = oracle.label_prop_oracle(120, src, dst, max_iterations=8)
    np.testing.assert_array_equal(
        g2.collect_state(["labels"])["labels"], exp_lab)

    # PARTITION-ALIGNED pull with hubs (the >2^24-node scale path for
    # skewed graphs): hub partials fetch only needed view slices
    g3 = DistGraph.load(str(tmp_path / "split2"))
    g3.PULL_BROADCAST_MAX_NODES = 0
    cc(g3)
    np.testing.assert_array_equal(g3.collect_state(["ids"])["ids"], exp)
    page_rank_delta(g3, max_iterations=60)
    np.testing.assert_allclose(g3.collect_state(["page_rank"])["page_rank"],
                               exp_pr, atol=1e-6)
    label_propagation(g3, max_iterations=8)
    np.testing.assert_array_equal(
        g3.collect_state(["labels"])["labels"], exp_lab)


def test_bfs_dense_early_exit_skips_claimed(ray_session, tmp_path):
    """Dense-mode early-exit (ligra.rs:217-234 analog): on a high-diameter
    chain forced into dense pulls, claimed vertices' in-lists are skipped,
    so total edges_scanned is well below iterations x m — and levels stay
    exact."""
    n = 240
    src = np.arange(n - 1, dtype=np.int64)
    dst = np.arange(1, n, dtype=np.int64)
    g = make_graph(str(tmp_path / "chain"), src, dst, n, nparts=4)
    g.m = 0                      # threshold 0 -> dense pull every round
    from ligrust_ray.algos.bfs import bfs

    res = bfs(g, root=0)
    exp_par, exp_lvl = oracle.bfs_oracle(n, src, dst, 0)
    np.testing.assert_array_equal(g.collect_state(["level"])["level"],
                                  exp_lvl)
    np.testing.assert_array_equal(g.collect_state(["parent"])["parent"],
                                  exp_par)
    full_scan = res["iterations"] * (n - 1)
    assert res["edges_scanned"] < 0.7 * full_scan


def test_rebuild_clears_stale_hubspill(ray_session, tmp_path):
    """Rebuilding into the same dir with a different hub threshold must not
    leave stale hubspill files that double-count edges (ADVICE r1)."""
    src, dst = oracle.random_digraph(80, 3.0, seed=5)
    src = np.concatenate([src, np.arange(80, dtype=np.int64)])
    dst = np.concatenate([dst, np.full(80, 3, dtype=np.int64)])
    t = pa.table({"src": pa.array(src, type=pa.int64()),
                  "dst": pa.array(dst, type=pa.int64())})
    d = str(tmp_path / "re")
    build_graph_from_edges(t, d, n=80, num_partitions=4, hub_in_threshold=8)
    # rebuild WITHOUT splitting into the same dir
    build_graph_from_edges(t, d, n=80, num_partitions=4)
    g = DistGraph.load(d)
    assert not g.has_hubs
    import glob
    assert not glob.glob(str(tmp_path / "re" / "in" / "hubspill-*.parquet"))
    cc(g)
    np.testing.assert_array_equal(g.collect_state(["ids"])["ids"],
                                  oracle.cc_oracle(80, src, dst))


# ---- k-core (round 3; undirected peeling through the kernel surface) ----

def _kcore_oracle(n, src, dst, k):
    """Sequential peeling over the symmetrized simple graph."""
    adj = {v: set() for v in range(n)}
    for s, d in zip(src.tolist(), dst.tolist()):
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    alive = set(range(n))
    changed = True
    while changed:
        changed = False
        for v in list(alive):
            if len(adj[v] & alive) < k:
                alive.discard(v)
                changed = True
    return np.array(sorted(alive), dtype=np.int64)


def test_kcore_matches_oracle(ray_session, tmp_path):
    from ligrust_ray.algos.kcore import kcore

    for i, (n, deg, seed) in enumerate([(60, 4.0, 5), (150, 6.0, 6),
                                        (200, 8.0, 7)]):
        src, dst = oracle.random_digraph(n, deg, seed)
        # symmetrize + simplify (the operator's documented precondition)
        keep = src != dst
        a = np.minimum(src[keep], dst[keep])
        b = np.maximum(src[keep], dst[keep])
        u = np.unique(np.stack([a, b], axis=1), axis=0)
        s2 = np.concatenate([u[:, 0], u[:, 1]])
        d2 = np.concatenate([u[:, 1], u[:, 0]])
        g = make_graph(str(tmp_path / f"kc{i}"), s2, d2, n)
        for k in (2, 3, 5):
            m = kcore(g, k)
            alive = g.collect_state(["alive"])["alive"]
            got = np.flatnonzero(alive)
            np.testing.assert_array_equal(got, _kcore_oracle(n, src, dst, k),
                                          err_msg=f"n={n} k={k}")
            assert m["rounds"] >= 0   # 0 = nothing below k anywhere


# ---- Radii (round 3; bit-parallel multi-source BFS, reduce="or") --------

def _radii_oracle(n, src, dst, srcs):
    from collections import deque
    adj = {v: [] for v in range(n)}
    for s, d in zip(src.tolist(), dst.tolist()):
        adj[s].append(d)
    rad = np.full(n, -1, dtype=np.int64)
    for s in srcs:
        dist = np.full(n, -1, dtype=np.int64)
        dist[s] = 0
        q = deque([s])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if dist[w] < 0:
                    dist[w] = dist[u] + 1
                    q.append(w)
        reach = dist >= 0
        rad[reach] = np.maximum(rad[reach], dist[reach])
    return rad


def test_radii_matches_oracle(ray_session, tmp_path):
    from ligrust_ray.algos.radii import radii, sample_sources

    for i, (n, deg, seed) in enumerate([(40, 2.0, 11), (120, 4.0, 12),
                                        (200, 1.0, 13)]):
        src, dst = oracle.random_digraph(n, deg, seed)
        g = make_graph(str(tmp_path / f"rad{i}"), src, dst, n)
        for k in (1, 8, 17):
            m = radii(g, k=k)
            got = g.collect_state(["radii"])["radii"]
            exp = _radii_oracle(n, src, dst, sample_sources(n, k))
            np.testing.assert_array_equal(got, exp, err_msg=f"n={n} k={k}")
            assert m["rounds"] >= 1


def test_radii_hub_splitting_matches_oracle(ray_session, tmp_path):
    """reduce='or' through the hub-partials wave: a split mega-hub build
    must equal both the unsplit build and the multi-BFS oracle."""
    from ligrust_ray.algos.radii import radii, sample_sources

    src, dst = oracle.random_digraph(120, 4.0, seed=23)
    hub_src = np.arange(0, 120, dtype=np.int64)
    src = np.concatenate([src, hub_src])
    dst = np.concatenate([dst, np.full(120, 7, dtype=np.int64)])
    g1 = make_graph(str(tmp_path / "rh1"), src, dst, 120, nparts=4)
    t = pa.table({"src": pa.array(src, type=pa.int64()),
                  "dst": pa.array(dst, type=pa.int64())})
    build_graph_from_edges(t, str(tmp_path / "rh2"), n=120,
                           num_partitions=4, hub_in_threshold=8)
    g2 = DistGraph.load(str(tmp_path / "rh2"))
    assert g2.has_hubs
    exp = _radii_oracle(120, src, dst, sample_sources(120, 8))
    for g in (g1, g2):
        radii(g, k=8)
        np.testing.assert_array_equal(
            g.collect_state(["radii"])["radii"], exp)


# ---- MIS (round 3; Luby rounds with deterministic priorities) ------------

def _mis_oracle(n, a, b):
    """Sequential replica of the algos.mis round semantics over unique
    undirected non-loop edges (a[i], b[i])."""
    from ligrust_ray.algos.mis import round_priorities

    active = np.ones(n, dtype=bool)
    in_mis = np.zeros(n, dtype=bool)
    r = 0
    while active.any():
        r += 1
        assert r <= 200
        p = round_priorities(r, np.arange(n, dtype=np.int64))
        live = active[a] & active[b]
        mn = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mn, a[live], p[b[live]])
        np.minimum.at(mn, b[live], p[a[live]])
        sel = active & (p < mn)
        in_mis |= sel
        active &= ~sel
        kill = sel[a] | sel[b]
        active[a[kill]] = False
        active[b[kill]] = False
        # selected nodes stay out of active; in_mis untouched by kills
        active &= ~sel
    return in_mis


def test_mis_matches_oracle_and_is_maximal(ray_session, tmp_path):
    from ligrust_ray.algos.mis import mis

    for i, (n, deg, seed) in enumerate([(60, 4.0, 11), (150, 6.0, 12),
                                        (200, 2.0, 13)]):
        src, dst = oracle.random_digraph(n, deg, seed)
        keep = src != dst
        ua = np.minimum(src[keep], dst[keep])
        ub = np.maximum(src[keep], dst[keep])
        u = np.unique(np.stack([ua, ub], axis=1), axis=0)
        s2 = np.concatenate([u[:, 0], u[:, 1]])
        d2 = np.concatenate([u[:, 1], u[:, 0]])
        g = make_graph(str(tmp_path / f"mis{i}"), s2, d2, n)
        m = mis(g)
        got = g.collect_state(["in_mis"])["in_mis"]
        # exact parity with the sequential replica (same priority sequence)
        np.testing.assert_array_equal(got, _mis_oracle(n, u[:, 0], u[:, 1]),
                                      err_msg=f"n={n}")
        # independence: no edge inside the set
        assert not np.any(got[u[:, 0]] & got[u[:, 1]])
        # maximality: every non-member has a member neighbour
        covered = np.zeros(n, dtype=bool)
        covered[u[:, 0][got[u[:, 1]]]] = True
        covered[u[:, 1][got[u[:, 0]]]] = True
        assert np.all(got | covered), f"non-maximal at n={n}"
        assert m["rounds"] >= 1


# ---- Bellman-Ford (round 3; weighted edgeMap over derived weights) -------

def test_edge_weights_match_hashlib():
    """Pin the DuckDB-evaluated weight expression byte-for-byte against
    the repo's verified md5_u64_lower byte-order."""
    from ligrust_ray.dataops.hashing import md5_u64_lower
    from ligrust_ray.state.weights import edge_weights

    rng = np.random.default_rng(5)
    s = rng.integers(0, 10**7, 300).astype(np.int64)
    d = rng.integers(0, 10**7, 300).astype(np.int64)
    got = edge_weights("md5:32", s, d)
    exp = np.array([int(md5_u64_lower(f"w:{a}:{b}".encode())) % 32 + 1
                    for a, b in zip(s, d)], dtype=np.int64)
    np.testing.assert_array_equal(got, exp)
    assert got.min() >= 1 and got.max() <= 32


def _bf_oracle(n, src, dst):
    """Synchronous (Jacobi) relaxation with the same md5 weights; the
    engine's frontier-based rounds reach the identical fixpoint."""
    from ligrust_ray.algos.bellman_ford import UNREACHED, WEIGHT_SPEC
    from ligrust_ray.state.weights import edge_weights

    w = edge_weights(WEIGHT_SPEC, src, dst)
    dist = np.full(n, int(UNREACHED), dtype=np.int64)
    dist[0] = 0
    for _ in range(n + 1):
        nd = dist.copy()
        if len(src):
            np.minimum.at(nd, dst, dist[src] + w)
        if np.array_equal(nd, dist):
            return dist
        dist = nd
    raise AssertionError("oracle did not converge")


@pytest.mark.parametrize("name", [g[0] for g in GRAPHS])
def test_bellman_ford_matches_oracle(graphs, name):
    from ligrust_ray.algos.bellman_ford import bellman_ford

    g, n, src, dst = graphs[name]
    m = bellman_ford(g, source=0)
    got = g.collect_state(["dist"])["dist"]
    np.testing.assert_array_equal(got, _bf_oracle(n, src, dst))
    assert got[0] == 0 and m["rounds"] >= 0


def test_bellman_ford_push_pull_agree(ray_session, tmp_path):
    """Weighted relaxation through BOTH edgeMap modes (mirrors the
    reference's threshold branch) plus the default mixed schedule."""
    from ligrust_ray.algos.bellman_ford import bellman_ford

    src, dst = oracle.random_digraph(200, 3.0, seed=31)
    exp = _bf_oracle(200, src, dst)
    g = make_graph(str(tmp_path / "bf"), src, dst, 200, nparts=4)
    for forced_m in (None, 10**12, 0):   # mixed, always-push, always-pull
        if forced_m is not None:
            g.m = forced_m
        bellman_ford(g, source=0)
        np.testing.assert_array_equal(
            g.collect_state(["dist"])["dist"], exp, err_msg=f"m={forced_m}")


def test_bellman_ford_hub_splitting_matches_oracle(ray_session, tmp_path):
    """Weighted min through the hub-partials wave: a split mega-hub build
    must equal both the unsplit build and the oracle (hub weights use the
    per-chunk 'hub' layout cache)."""
    from ligrust_ray.algos.bellman_ford import bellman_ford

    src, dst = oracle.random_digraph(120, 4.0, seed=37)
    hub_src = np.arange(0, 120, dtype=np.int64)
    src = np.concatenate([src, hub_src])
    dst = np.concatenate([dst, np.full(120, 7, dtype=np.int64)])
    g1 = make_graph(str(tmp_path / "bfh1"), src, dst, 120, nparts=4)
    t = pa.table({"src": pa.array(src, type=pa.int64()),
                  "dst": pa.array(dst, type=pa.int64())})
    build_graph_from_edges(t, str(tmp_path / "bfh2"), n=120,
                           num_partitions=4, hub_in_threshold=8)
    g2 = DistGraph.load(str(tmp_path / "bfh2"))
    assert g2.has_hubs
    exp = _bf_oracle(120, src, dst)
    for g in (g1, g2):
        bellman_ford(g, source=0)
        np.testing.assert_array_equal(g.collect_state(["dist"])["dist"], exp)


# ---- Betweenness centrality (round 3; Brandes via two sum-edgeMaps) ------

def _bc_oracle(n, a, b):
    """Sequential Brandes over unique undirected non-loop edges
    (a[i], b[i]) from root 0: returns (level, sigma, delta)."""
    s = np.concatenate([a, b])
    d = np.concatenate([b, a])
    level = np.full(n, -1, dtype=np.int64)
    sigma = np.zeros(n, dtype=np.float64)
    delta = np.zeros(n, dtype=np.float64)
    level[0] = 0
    sigma[0] = 1.0
    lvl = 0
    while True:
        fr = level == lvl
        contrib = fr[s] if len(s) else np.zeros(0, dtype=bool)
        agg = np.zeros(n)
        cnt = np.zeros(n, dtype=np.int64)
        np.add.at(agg, d[contrib], sigma[s[contrib]])
        np.add.at(cnt, d[contrib], 1)
        new = (level < 0) & (cnt > 0)
        if not new.any():
            break
        level[new] = lvl + 1
        sigma[new] = agg[new]
        lvl += 1
    for back in range(lvl, 0, -1):
        fr = level == back
        contrib = fr[s] if len(s) else np.zeros(0, dtype=bool)
        agg = np.zeros(n)
        np.add.at(agg, d[contrib],
                  (1.0 + delta[s[contrib]]) / sigma[s[contrib]])
        tgt = level == back - 1
        delta[tgt] = sigma[tgt] * agg[tgt]
    return level, sigma, delta


def _sym_unique(src, dst):
    keep = src != dst
    ua = np.minimum(src[keep], dst[keep])
    ub = np.maximum(src[keep], dst[keep])
    u = np.unique(np.stack([ua, ub], axis=1), axis=0)
    return u[:, 0], u[:, 1]


def test_betweenness_matches_oracle(ray_session, tmp_path):
    from ligrust_ray.algos.betweenness import betweenness

    for i, (n, deg, seed) in enumerate([(60, 3.0, 41), (150, 5.0, 42),
                                        (200, 1.5, 43)]):
        src, dst = oracle.random_digraph(n, deg, seed)
        a, b = _sym_unique(src, dst)
        g = make_graph(str(tmp_path / f"bc{i}"),
                       np.concatenate([a, b]), np.concatenate([b, a]), n,
                       nparts=4)
        m = betweenness(g)
        st = g.collect_state(["level", "sigma", "delta"])
        lv, sg, dl = _bc_oracle(n, a, b)
        np.testing.assert_array_equal(st["level"], lv, err_msg=f"n={n}")
        np.testing.assert_array_equal(st["sigma"], sg, err_msg=f"n={n}")
        np.testing.assert_allclose(st["delta"], dl, rtol=1e-12, atol=1e-12)
        assert m["levels"] == int(lv.max())


def test_betweenness_push_pull_agree(ray_session, tmp_path):
    from ligrust_ray.algos.betweenness import betweenness

    src, dst = oracle.random_digraph(150, 2.0, seed=44)
    a, b = _sym_unique(src, dst)
    g = make_graph(str(tmp_path / "bcpp"),
                   np.concatenate([a, b]), np.concatenate([b, a]), 150,
                   nparts=4)
    lv, sg, dl = _bc_oracle(150, a, b)
    for forced_m in (10**12, 0):   # always-push, always-pull
        g.m = forced_m
        betweenness(g)
        st = g.collect_state(["level", "sigma", "delta"])
        np.testing.assert_array_equal(st["level"], lv)
        np.testing.assert_array_equal(st["sigma"], sg)
        np.testing.assert_allclose(st["delta"], dl, rtol=1e-12, atol=1e-12)


# ---- Graph coloring (round 3; Jones-Plassmann via or-reduce masks) -------

def _coloring_oracle(n, a, b):
    """Sequential replica of algos.coloring round semantics over unique
    undirected non-loop edges (a[i], b[i])."""
    from ligrust_ray.algos.mis import round_priorities

    s = np.concatenate([a, b])
    d = np.concatenate([b, a])
    color = np.full(n, -1, dtype=np.int64)
    r = 0
    while (color < 0).any():
        r += 1
        assert r <= 400
        p = round_priorities(r, np.arange(n, dtype=np.int64))
        unc = color < 0
        live = unc[s] & unc[d] if len(s) else np.zeros(0, dtype=bool)
        mn = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mn, d[live], p[s[live]])
        sel = unc & (p < mn)
        for v in np.flatnonzero(sel):
            used = set(color[d[s == v]][color[d[s == v]] >= 0].tolist())
            c = 0
            while c in used:
                c += 1
            color[v] = c
    return color


def test_coloring_matches_oracle_and_is_proper(ray_session, tmp_path):
    from ligrust_ray.algos.coloring import color_graph

    cases = [(60, 4.0, 51), (150, 6.0, 52), (120, 1.5, 53)]
    for i, (n, deg, seed) in enumerate(cases):
        src, dst = oracle.random_digraph(n, deg, seed)
        a, b = _sym_unique(src, dst)
        g = make_graph(str(tmp_path / f"col{i}"),
                       np.concatenate([a, b]), np.concatenate([b, a]), n,
                       nparts=4)
        m = color_graph(g)
        got = g.collect_state(["color"])["color"]
        np.testing.assert_array_equal(got, _coloring_oracle(n, a, b),
                                      err_msg=f"n={n}")
        assert not np.any(got[a] == got[b])          # proper coloring
        assert m["colors"] == int(got.max()) + 1


def test_coloring_clique_multiword(ray_session, tmp_path):
    """A 70-clique forces colors 0..69 — past the 63-bit word boundary —
    so the second mask word (and the W growth path) is exercised; the
    engine must still match the sequential replica exactly."""
    from ligrust_ray.algos.coloring import color_graph

    n = 70
    iu = np.triu_indices(n, k=1)
    a, b = iu[0].astype(np.int64), iu[1].astype(np.int64)
    g = make_graph(str(tmp_path / "colq"),
                   np.concatenate([a, b]), np.concatenate([b, a]), n,
                   nparts=3)
    m = color_graph(g, max_rounds=400)
    got = g.collect_state(["color"])["color"]
    assert m["colors"] == 70 and sorted(got.tolist()) == list(range(70))
    np.testing.assert_array_equal(got, _coloring_oracle(n, a, b))


def test_coloring_hub_split_batched_waves(ray_session, tmp_path):
    """A 130-clique needs >=3 mask words near the end (colors past bit
    126), so edge_map_multi batches >=2 gather kernels per round — and a
    forced hub split (threshold 32 << in-degree 129) routes every word
    through the batched hub-partials path (pull_broadcast_multi +
    hub_partials_multi). Exact oracle parity must survive both."""
    from ligrust_ray.algos.coloring import color_graph

    n = 130
    iu = np.triu_indices(n, k=1)
    a, b = iu[0].astype(np.int64), iu[1].astype(np.int64)
    t = pa.table({"src": pa.array(np.concatenate([a, b]), type=pa.int64()),
                  "dst": pa.array(np.concatenate([b, a]), type=pa.int64())})
    d = str(tmp_path / "colhub")
    build_graph_from_edges(t, d, n=n, num_partitions=4, hub_in_threshold=32)
    g = DistGraph.load(d)
    assert g.has_hubs
    m = color_graph(g, max_rounds=400)
    got = g.collect_state(["color"])["color"]
    assert m["colors"] == n and sorted(got.tolist()) == list(range(n))
    np.testing.assert_array_equal(got, _coloring_oracle(n, a, b))


def test_coloring_fast_path_matches_oracle(ray_session):
    """Single-task fast path (color_graph_fast) must reproduce the exact
    kernel-path coloring — same cases as the kernel test plus the
    multi-word 70-clique."""
    import pyarrow as pa

    from ligrust_ray.algos.coloring import color_graph_fast

    cases = [(60, 4.0, 51), (150, 6.0, 52), (120, 1.5, 53)]
    for n, deg, seed in cases:
        src, dst = oracle.random_digraph(n, deg, seed)
        a, b = _sym_unique(src, dst)
        sym = pa.table({"v": pa.array(np.concatenate([a, b])),
                        "w": pa.array(np.concatenate([b, a]))})
        got = color_graph_fast(n, sym)
        np.testing.assert_array_equal(got, _coloring_oracle(n, a, b),
                                      err_msg=f"n={n}")
    n = 70
    iu = np.triu_indices(n, k=1)
    a, b = iu[0].astype(np.int64), iu[1].astype(np.int64)
    sym = pa.table({"v": pa.array(np.concatenate([a, b])),
                    "w": pa.array(np.concatenate([b, a]))})
    got = color_graph_fast(n, sym, max_rounds=400)
    assert sorted(got.tolist()) == list(range(70))
    np.testing.assert_array_equal(got, _coloring_oracle(n, a, b))


# ---- Densest subgraph (round 3; Charikar/Bahmani batched peeling) --------

def _densest_oracle(n, a, b):
    """Sequential replica of the deterministic peeling: returns the member
    mask of the best start-of-round alive set (exact rational argmax,
    earliest round on ties)."""
    deg = np.zeros(n, dtype=np.int64)
    np.add.at(deg, a, 1)
    np.add.at(deg, b, 1)
    alive = np.ones(n, dtype=bool)
    died = np.full(n, 1 << 62, dtype=np.int64)
    n_alive, m_alive = n, len(a)
    best_m, best_n, best_round = m_alive, n_alive, 1
    r = 0
    while n_alive > 0:
        r += 1
        if m_alive * best_n > best_m * n_alive:
            best_m, best_n, best_round = m_alive, n_alive, r
        thr = (3 * m_alive) // n_alive
        dying = alive & (deg <= thr)
        alive &= ~dying
        died[dying] = r
        live_edge = alive[a] & alive[b]
        a, b = a[live_edge], b[live_edge]
        deg = np.zeros(n, dtype=np.int64)
        np.add.at(deg, a, 1)
        np.add.at(deg, b, 1)
        n_alive, m_alive = int(alive.sum()), len(a)
    return died >= best_round, r, best_round


def test_densest_matches_oracle(ray_session, tmp_path):
    from ligrust_ray.algos.densest import densest_subgraph

    cases = [(60, 4.0, 61), (150, 6.0, 62), (200, 1.5, 63),
             (120, 0, 64), (100, 1.0, 65)]
    exercised_late_best = False
    for i, (n, deg, seed) in enumerate(cases):
        src, dst = oracle.random_digraph(n, deg, seed,
                                         zipf=(deg == 0))
        if i == 4:
            # plant a 20-clique on a sparse background: peeling strips the
            # background first, so the best round is LATE (argmax path)
            iu = np.triu_indices(20, k=1)
            src = np.concatenate([src, iu[0].astype(np.int64)])
            dst = np.concatenate([dst, iu[1].astype(np.int64)])
        a, b = _sym_unique(src, dst)
        g = make_graph(str(tmp_path / f"dsg{i}"),
                       np.concatenate([a, b]), np.concatenate([b, a]), n,
                       nparts=4)
        m = densest_subgraph(g)
        died = g.collect_state(["died"])["died"]
        want, want_rounds, want_best = _densest_oracle(n, a, b)
        np.testing.assert_array_equal(died >= m["best_round"], want,
                                      err_msg=f"n={n}")
        assert m["rounds"] == want_rounds and m["best_round"] == want_best
        # density of the reported set really is max over rounds (sanity:
        # best_m/best_n vs the full graph's density)
        assert m["best_m"] * n >= len(a) * m["best_n"]
        exercised_late_best |= want_best > 1
    assert exercised_late_best, "no case exercised a late best round"


def test_densest_empty_and_isolated(ray_session, tmp_path):
    from ligrust_ray.algos.densest import densest_subgraph

    # no edges at all: every node dies in round 1, best set = full graph
    g = make_graph(str(tmp_path / "dsg_e"),
                   np.array([], dtype=np.int64),
                   np.array([], dtype=np.int64), 7, nparts=2)
    m = densest_subgraph(g)
    died = g.collect_state(["died"])["died"]
    assert m["rounds"] == 1 and m["best_round"] == 1
    assert np.all(died >= m["best_round"])


def test_densest_sql_oracle_late_best_round(ray_session, tmp_path):
    """The driver's sf tables peel to best_round == 1 (the whole graph is
    the densest prefix), leaving the oracle's rational-argmax + died-round
    SQL unexercised — so drive _densest_sql directly on a synthetic
    events table with a planted 20-clique (best round is LATE) and check
    it matches the engine exactly."""
    import duckdb

    from ligrust_ray.algos.densest import densest_subgraph
    import __ray_entry__ as E

    rng = np.random.default_rng(7)
    n_bg = 140
    src = rng.integers(0, 150, size=n_bg).astype(np.int64)
    dst = rng.integers(0, 150, size=n_bg).astype(np.int64)
    iu = np.triu_indices(20, k=1)
    src = np.concatenate([src, iu[0].astype(np.int64)])
    dst = np.concatenate([dst, iu[1].astype(np.int64)])
    # encode as an events table: edge (u, v) <- user_id=u,
    # value=(v+0.5)/100 so FLOOR(value*100) % 150 == v exactly
    con = duckdb.connect()
    con.execute("CREATE TABLE events AS SELECT * FROM (SELECT "
                "UNNEST(?::BIGINT[]) AS user_id, "
                "UNNEST(?::DOUBLE[]) AS value)",
                [src.tolist(), ((dst + 0.5) / 100).tolist()])
    want = con.execute(E._densest_sql(32)).df()["node_id"].to_numpy()

    a, b = _sym_unique(src, dst)
    g = make_graph(str(tmp_path / "dsgsql"),
                   np.concatenate([a, b]), np.concatenate([b, a]), 150,
                   nparts=3)
    m = densest_subgraph(g)
    died = g.collect_state(["died"])["died"]
    got = np.flatnonzero(died >= m["best_round"])
    assert m["best_round"] > 1, "planted clique should move the best round"
    np.testing.assert_array_equal(np.sort(got), np.sort(want))


# ---- Harmonic centrality (round 3; rides the radii bit-parallel BFS) -----

def _harmonic_oracle(n, src, dst, srcs):
    from collections import deque
    adj = {v: [] for v in range(n)}
    for s, d in zip(src.tolist(), dst.tolist()):
        adj[s].append(d)
    harm = np.zeros(n, dtype=np.int64)
    for s in srcs:
        dist = np.full(n, -1, dtype=np.int64)
        dist[s] = 0
        q = deque([s])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if dist[w] < 0:
                    dist[w] = dist[u] + 1
                    q.append(w)
        pos = dist > 0
        harm[pos] += 1_000_000 // dist[pos]
    return harm


def test_harmonic_matches_oracle(ray_session, tmp_path):
    from ligrust_ray.algos.radii import radii, sample_sources

    for i, (n, deg, seed) in enumerate([(40, 2.0, 71), (120, 4.0, 72),
                                        (200, 1.0, 73)]):
        src, dst = oracle.random_digraph(n, deg, seed)
        g = make_graph(str(tmp_path / f"harm{i}"), src, dst, n)
        for k in (1, 8, 17):
            m = radii(g, k=k, harmonic=True)
            st = g.collect_state(["radii", "harm"])
            ss = sample_sources(n, k)
            np.testing.assert_array_equal(
                st["harm"], _harmonic_oracle(n, src, dst, ss),
                err_msg=f"n={n} k={k}")
            # the radii estimate is unchanged by the harmonic piggyback
            np.testing.assert_array_equal(
                st["radii"], _radii_oracle(n, src, dst, ss))
            assert "harm" in m["state_names"]


# ---- Spanning forest (round 3; CC roots + multi-source BFS parents) ------

def _forest_oracle(n, a, b):
    from collections import deque
    adj = {v: [] for v in range(n)}
    for s, d in zip(a.tolist(), b.tolist()):
        adj[s].append(d)
        adj[d].append(s)
    comp = np.full(n, -1, dtype=np.int64)
    for v in range(n):
        if comp[v] < 0:
            comp[v] = v
            q = deque([v])
            while q:
                u = q.popleft()
                for w in adj[u]:
                    if comp[w] < 0:
                        comp[w] = v
                        q.append(w)
    parent = np.full(n, -1, dtype=np.int64)
    level = np.full(n, -1, dtype=np.int64)
    roots = np.flatnonzero(comp == np.arange(n))
    parent[roots] = roots
    level[roots] = 0
    frontier, l = set(roots.tolist()), 0
    while frontier:
        l += 1
        claims = {}
        for u in frontier:
            for w in adj[u]:
                if parent[w] < 0:
                    claims[w] = min(claims.get(w, u), u)
        for w, p in claims.items():
            parent[w] = p
            level[w] = l
        frontier = set(claims)
    return comp, parent, level


def test_spanning_forest_matches_oracle(ray_session, tmp_path):
    from ligrust_ray.algos.forest import spanning_forest

    for i, (n, deg, seed) in enumerate([(60, 4.0, 81), (150, 1.2, 82),
                                        (200, 0, 83)]):
        src, dst = oracle.random_digraph(n, deg, seed, zipf=(deg == 0))
        a, b = _sym_unique(src, dst)
        g = make_graph(str(tmp_path / f"sf{i}"),
                       np.concatenate([a, b]), np.concatenate([b, a]), n,
                       nparts=4)
        spanning_forest(g)
        st = g.collect_state(["ids", "parent", "level"])
        comp, parent, level = _forest_oracle(n, a, b)
        np.testing.assert_array_equal(st["parent"], parent, err_msg=f"n={n}")
        np.testing.assert_array_equal(st["level"], level)
        # forest invariants: every node claimed; roots = components;
        # non-root parent is a real neighbour one level up
        assert np.all(st["parent"] >= 0) and np.all(st["level"] >= 0)
        ids = np.arange(n)
        roots = st["parent"] == ids
        assert int(roots.sum()) == len(np.unique(comp))
        edge_set = set(zip(a.tolist(), b.tolist())) \
            | set(zip(b.tolist(), a.tolist()))
        nr = ~roots
        assert all((p, v) in edge_set
                   for v, p in zip(ids[nr], st["parent"][nr]))
        np.testing.assert_array_equal(st["level"][st["parent"][nr]],
                                      st["level"][nr] - 1)


def test_scc_matches_oracle(ray_session, tmp_path):
    """FB-Trim SCC vs the dense-closure oracle: scc(v) = min member id,
    over shapes that exercise trim-only graphs (chains/DAGs), single big
    cycles, interlocking SCCs bridged by a DAG, self-loops, empty edges,
    and random digraphs with a giant SCC + periphery."""
    from ligrust_ray.algos.scc import scc

    cases = [
        ("chain", 10, np.arange(9), np.arange(1, 10)),
        ("cycle", 6, np.arange(6), (np.arange(6) + 1) % 6),
        ("two-sccs-bridge", 7,
         np.array([0, 1, 2, 2, 4, 5, 6]), np.array([1, 2, 0, 4, 5, 6, 4])),
        ("self-loop", 3, np.array([1]), np.array([1])),
        ("empty", 5, np.array([], dtype=np.int64), np.array([], dtype=np.int64)),
        ("er-64", 64, *oracle.random_digraph(64, 3.0, seed=11)),
        ("er-200-sparse", 200, *oracle.random_digraph(200, 1.2, seed=12)),
        ("zipf-100", 100, *oracle.random_digraph(100, 0, seed=13, zipf=True)),
    ]
    for name, n, src, dst in cases:
        src = src.astype(np.int64)
        dst = dst.astype(np.int64)
        g = make_graph(str(tmp_path / f"f_{name}"), src, dst, n, nparts=3)
        grev = make_graph(str(tmp_path / f"r_{name}"), dst, src, n, nparts=3)
        m = scc(g, grev)
        got = g.collect_state(["scc"])["scc"]
        exp = oracle.scc_oracle(n, src, dst)
        np.testing.assert_array_equal(got, exp, err_msg=name)
        assert m["rounds"] >= 1


def test_hits_matches_oracle(ray_session, tmp_path):
    from ligrust_ray.algos.hits import hits

    for name, n, (src, dst) in [
            ("er-64", 64, oracle.random_digraph(64, 3.0, seed=21)),
            ("zipf-120", 120, oracle.random_digraph(120, 0, seed=22,
                                                    zipf=True)),
            ("empty", 5, (np.array([], dtype=np.int64),
                          np.array([], dtype=np.int64)))]:
        src = src.astype(np.int64)
        dst = dst.astype(np.int64)
        g = make_graph(str(tmp_path / f"hf_{name}"), src, dst, n, nparts=3)
        grev = make_graph(str(tmp_path / f"hr_{name}"), dst, src, n, nparts=3)
        hits(g, grev, rounds=3)
        st = g.collect_state(["h", "a"])
        eh, ea = oracle.hits_oracle(n, src, dst, rounds=3)
        np.testing.assert_array_equal(st["h"].astype(np.int64), eh,
                                      err_msg=name)
        np.testing.assert_array_equal(st["a"].astype(np.int64), ea,
                                      err_msg=name)


def test_ppr_matches_oracle(graphs, name="er-64"):
    from ligrust_ray.algos.ppr import personalized_page_rank

    for nm in ("fixture", "path", "empty-edges", "er-64", "zipf-200"):
        g, n, src, dst = graphs[nm]
        personalized_page_rank(g, source=0, rounds=4)
        got = g.collect_state(["p"])["p"]
        exp = oracle.ppr_oracle(n, src, dst, source=0, rounds=4)
        np.testing.assert_allclose(got, exp, atol=1e-12, err_msg=nm)


def _matching_oracle(a, b, h):
    """Row-at-a-time local-max matching reference (same spec as
    algos/matching.py, deliberately unvectorised)."""
    import collections
    active = list(zip(a.tolist(), b.tolist(), h.tolist()))
    out = []
    rnd = 0
    while active:
        rnd += 1
        mh = collections.defaultdict(int)
        for u, v, p in active:
            mh[u] = max(mh[u], p)
            mh[v] = max(mh[v], p)
        won = [(u, v) for u, v, p in active
               if p == mh[u] and p == mh[v]]
        dead = set()
        for u, v in won:
            dead.add(u)
            dead.add(v)
            out.append((u, v, rnd))
        active = [(u, v, p) for u, v, p in active
                  if u not in dead and v not in dead]
    return sorted(out)


def test_maximal_matching_fast_vs_distributed(ray_session):
    import ray.data

    from ligrust_ray.algos.matching import maximal_matching, _with_priority

    rng = np.random.default_rng(7)
    u = rng.integers(0, 60, 400).astype(np.int64)
    v = rng.integers(0, 60, 400).astype(np.int64)
    keep = u != v
    a, b = np.minimum(u[keep], v[keep]), np.maximum(u[keep], v[keep])
    pairs = np.unique(np.stack([a, b], axis=1), axis=0)
    edges = pa.table({"a": pa.array(pairs[:, 0]),
                      "b": pa.array(pairs[:, 1])})

    got_fast = maximal_matching(edges, mode="single").to_pandas()
    got_dist = maximal_matching(
        ray.data.from_arrow(edges).repartition(4),
        mode="distributed").to_pandas()

    prio = _with_priority(edges)
    exp = _matching_oracle(prio.column("a").to_numpy(),
                           prio.column("b").to_numpy(),
                           prio.column("h").to_numpy())
    for got in (got_fast, got_dist):
        rows = sorted(map(tuple, got[["u", "v", "rnd"]].to_numpy()))
        assert rows == exp
    # it IS a matching: no vertex twice; and maximal: no active edge left
    mv = got_fast[["u", "v"]].to_numpy().ravel()
    assert len(mv) == len(set(mv))
    matched = set(mv)
    uncovered = [(x, y) for x, y in pairs
                 if x not in matched and y not in matched]
    assert not uncovered


def test_maximal_matching_empty_and_modes(ray_session):
    from ligrust_ray.algos.matching import maximal_matching

    empty = pa.table({"a": pa.array([], type=pa.int64()),
                      "b": pa.array([], type=pa.int64())})
    out = maximal_matching(empty).to_pandas()
    assert len(out) == 0
    with pytest.raises(ValueError, match="unknown mode"):
        maximal_matching(empty, mode="bogus")


@pytest.mark.parametrize("name", [g[0] for g in GRAPHS])
def test_cc_incremental_matches_full(graphs, name, tmp_path):
    """Warm-started incremental CC over a 90/10 edge split equals the
    from-scratch fixed point bitwise on every graph shape."""
    from ligrust_ray.algos.cc import cc_incremental

    g, n, src, dst = graphs[name]
    keep = (src * 31 + dst) % 10 != 0
    if keep.all() or not keep.any():
        pytest.skip("split degenerate for this seed")
    gb = make_graph(str(tmp_path / "base"), src[keep], dst[keep], n)
    cc(gb)
    base_ids = gb.collect_state(["ids"])["ids"]

    res = cc_incremental(g, base_ids, np.unique(src[~keep]))
    got = g.collect_state(["ids"])["ids"]
    np.testing.assert_array_equal(got, oracle.cc_oracle(n, src, dst))
    assert res["iterations"] >= 1


def test_cc_incremental_empty_delta(graphs):
    """An empty insertion batch must run ZERO edge_map waves and leave the
    base fixed point untouched (the incremental fast path)."""
    from ligrust_ray.algos.cc import cc_incremental

    g, n, src, dst = graphs["er-64"]
    cc(g)
    base_ids = g.collect_state(["ids"])["ids"].copy()
    res = cc_incremental(g, base_ids, np.zeros(0, dtype=np.int64))
    assert res["iterations"] == 0 and res["edges_scanned"] == 0
    np.testing.assert_array_equal(g.collect_state(["ids"])["ids"], base_ids)


def _wpr_oracle(n, src, dst, spec="md5:32"):
    """Closed form of weighted PageRankDelta (the round-1 frontier quirk
    empties the frontier for n >= 4): 0.15 + 0.85·Σ_in (1/n)·w/w_out."""
    from ligrust_ray.state.weights import edge_weights

    w = edge_weights(spec, src, dst).astype(np.float64)
    w_out = np.zeros(n)
    if len(src):
        np.add.at(w_out, src, w)
    gather = np.zeros(n)
    if len(src):
        np.add.at(gather, dst, (1.0 / n) / w_out[src] * w)
    return 0.15 + 0.85 * gather


@pytest.mark.parametrize("name", [g[0] for g in GRAPHS])
def test_pagerank_weighted_allclose(graphs, name):
    g, n, src, dst = graphs[name]
    if n < 4:
        pytest.skip("closed form needs the n >= 4 frontier-empty regime")
    page_rank_delta(g, max_iterations=100, weight_spec="md5:32")
    got = g.collect_state(["page_rank"])["page_rank"]
    np.testing.assert_allclose(got, _wpr_oracle(n, src, dst), atol=1e-6)


def test_pagerank_weighted_push_pull_agree(ray_session, tmp_path):
    """Weighted gather through forced push, forced pull (broadcast AND
    partition-aligned) and the hub-spill path must agree with the numpy
    closed form — the 'mul' weight combine exercises every layout."""
    src, dst = oracle.random_digraph(150, 4.0, seed=9)
    # a 40-in-degree hub to force hub chunks under a low spill threshold
    hub_src = np.arange(40, 100, dtype=np.int64)
    src = np.concatenate([src, hub_src])
    dst = np.concatenate([dst, np.full(60, 7, dtype=np.int64)])
    exp = _wpr_oracle(150, src, dst)
    for sub, m_override, hub_thr in (("p", 10**12, None), ("q", 0, None),
                                     ("r", 0, 16), ("s", None, 16)):
        d = str(tmp_path / sub)
        build_graph_from_edges(pa.table({"src": src, "dst": dst}), d,
                               n=150, num_partitions=4,
                               hub_in_threshold=hub_thr)
        g = DistGraph.load(d)
        if m_override is not None:
            g.m = m_override
        page_rank_delta(g, max_iterations=100, weight_spec="md5:32")
        np.testing.assert_allclose(
            g.collect_state(["page_rank"])["page_rank"], exp, atol=1e-6,
            err_msg=sub)


def test_hyperball_estimates_match_exact_balls(ray_session):
    """HyperBall t-ball estimates vs exact BFS ball sizes on a random
    sparse digraph: registers count EXACTLY the ball's distinct nodes
    (HLL with p=12 is linear-counting-exact at these cardinalities),
    so estimates land within a few percent."""
    import ray

    from ligrust_ray.algos.hyperball import (hyperball_estimates,
                                             hyperball_summary)

    rng = np.random.default_rng(5)
    n, m = 60, 180
    src = rng.integers(0, n, size=m)
    dst = rng.integers(0, n, size=m)
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(src, type=pa.int64()),
        "dst": pa.array(dst, type=pa.int64())})).repartition(3)

    adj = [set() for _ in range(n)]
    for a, b in zip(src, dst):
        adj[a].add(b)

    def ball(v, t):
        seen, frontier = {v}, {v}
        for _ in range(t):
            frontier = {w for u in frontier for w in adj[u]} - seen
            seen |= frontier
        return seen

    for t in (1, 2):
        est = hyperball_estimates(edges, t=t).set_index("node")["estimate"]
        touched = set(src) | set(dst)
        assert set(est.index) == touched
        for v in sorted(touched):
            exact = len(ball(v, t))       # seen starts at {v}: v included
            assert abs(est[v] - exact) / exact < 0.05, (t, v, est[v], exact)

    # summary rows agree with the registers' own counts at t=2
    summ = hyperball_summary(edges, t=2).to_pandas()
    assert len(summ) == len(touched)
    assert (summ["n_regs"] >= 1).all()
    big = summ.set_index("node_id")["n_regs"]
    for v in sorted(touched):
        assert big[v] <= len(ball(v, 2))   # distinct hashes <= ball size


def test_louvain_move_candidate_invariant(ray_session):
    """One-round Louvain refinement: every node lands in its own LP
    community or a community owned by an in/out neighbor, and isolated
    nodes never move."""
    import pandas as pd

    from ligrust_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    got = Q.q_events_louvain_move(sf).to_pandas()
    lp = Q.q_labelprop_events(sf).to_pandas()
    edges = Q.events_edges_ds(sf).to_pandas()

    lab = lp.set_index("node_id")["label"]
    nbrs: dict[int, set] = {}
    for s, d in zip(edges["src"], edges["dst"]):
        nbrs.setdefault(int(s), set()).add(int(d))
        nbrs.setdefault(int(d), set()).add(int(s))
    assert len(got) == len(lp)
    for v, c in zip(got["node_id"], got["community"]):
        allowed = {int(lab[v])} | {int(lab[u]) for u in nbrs.get(int(v),
                                                                 set())}
        assert int(c) in allowed, (v, c, allowed)
    iso = set(lab.index) - set(nbrs)
    moved = got.set_index("node_id")["community"]
    for v in iso:
        assert int(moved[v]) == int(lab[v])


def test_neighborhood_function_and_effective_diameter(ray_session):
    """N(t) on a directed 6-cycle is exactly 6*(t+1) until saturation at
    N=36; the interpolated 90% effective diameter lands between the true
    distances bracketing the 0.9 quantile."""
    import ray

    from ligrust_ray.algos.hyperball import (effective_diameter,
                                             neighborhood_function)

    n = 6
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(range(n), type=pa.int64()),
        "dst": pa.array([(i + 1) % n for i in range(n)],
                        type=pa.int64())}))
    nf = neighborhood_function(edges, max_t=10, eps=0.0)
    exact = [min(n * (t + 1), n * n) for t in nf["t"]]
    np.testing.assert_allclose(nf["n_pairs"].to_numpy(),
                               np.asarray(exact, dtype=float), rtol=0.05)
    # 0.9*36 = 32.4 pairs sits between N(4)=30 and N(5)=36 -> d_eff in (4,5)
    d = effective_diameter(nf)
    assert 4.0 < d <= 5.0


def test_temporal_earliest_arrival_planted(ray_session):
    """Time-respecting semantics: an edge departing BEFORE the arrival at
    its source is unusable; equal times chain (non-decreasing paths);
    unreached nodes emit no row. Local fast path == forced-distributed
    co_group rounds == hand-computed arrivals."""
    import pandas as pd
    import ray.data

    from ligrust_ray.algos.temporal import earliest_arrival

    #        0 -(10)-> 1 -(5: too early)-> 2   1 -(20)-> 2
    #        0 -(7)->  3 -(7: equal ok)->  4   5 isolated, 6 -(1)-> 0
    e = pa.table({
        "src": pa.array([0, 1, 1, 0, 3, 6], type=pa.int64()),
        "dst": pa.array([1, 2, 2, 3, 4, 0], type=pa.int64()),
        "t":   pa.array([10, 5, 20, 7, 7, 1], type=pa.int64())})
    ds = ray.data.from_arrow(e)
    exp = pd.DataFrame({"node": [0, 1, 2, 3, 4],
                        "arr": [-1, 10, 20, 7, 7]})
    for mode in ("local", "distributed"):
        got = (earliest_arrival(ds, source=0, rounds=8, mode=mode)
               .to_pandas().sort_values("node").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype("int64"), exp.astype("int64"), obj=mode)


def test_temporal_distributed_matches_local_sf(ray_session):
    """sf0.001 events graph: the forced-distributed path must reproduce
    the single-task fixpoint bit-for-bit."""
    from ligrust_ray.algos.temporal import earliest_arrival
    from ligrust_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    import os

    import ray.data

    def derive(t):
        u = t.column("user_id").to_numpy().astype(np.int64)
        v = t.column("value").to_numpy()
        dst = (np.floor(v * 100).astype(np.int64)) % Q.N_EVENT_NODES
        return pa.table({"src": pa.array(u), "dst": pa.array(dst),
                         "t": t.column("ts").cast(pa.int64())})

    edges = ray.data.read_parquet(
        os.path.join(sf, "events.parquet"),
        columns=["user_id", "value", "ts"]).map_batches(
            derive, batch_format="pyarrow")
    loc = (earliest_arrival(edges, rounds=8, mode="local").to_pandas()
           .sort_values("node").reset_index(drop=True))
    dist = (earliest_arrival(edges, rounds=8, mode="distributed")
            .to_pandas().sort_values("node").reset_index(drop=True))
    np.testing.assert_array_equal(loc["node"].to_numpy(),
                                  dist["node"].to_numpy())
    np.testing.assert_array_equal(loc["arr"].to_numpy(),
                                  dist["arr"].to_numpy())


def test_louvain_distributed_matches_local(ray_session):
    """The keyed-shuffle move round must reproduce the single-task pandas
    fast path bit-for-bit on the sf0.001 graph (unit weights)."""
    import ray.data

    from ligrust_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    lp = ray.data.from_arrow(Q._lp_cached(sf))
    edges = Q.events_edges_ds(sf).map_batches(
        lambda t: t.append_column(
            "w", pa.array(np.ones(t.num_rows, dtype=np.int64))),
        batch_format="pyarrow").materialize()
    m = edges.count()
    loc = (Q._louvain_move_round(lp, edges, m, 8, mode="auto")
           .to_pandas().sort_values("node_id").reset_index(drop=True))
    dist = (Q._louvain_move_round(lp, edges, m, 8, mode="distributed")
            .to_pandas().sort_values("node_id").reset_index(drop=True))
    np.testing.assert_array_equal(loc["node_id"].to_numpy(),
                                  dist["node_id"].to_numpy())
    np.testing.assert_array_equal(loc["community"].to_numpy(),
                                  dist["community"].to_numpy())


def test_louvain_coarse_refines_level1(ray_session):
    """Phase-2 invariant: the coarse assignment factors through level 1 —
    two nodes in the same level-1 community always share the same
    level-2 community, and level-2 labels live in the level-1 community
    id space."""
    from ligrust_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    l1 = Q.q_events_louvain_move(sf).to_pandas()
    l2 = Q.q_events_louvain_coarse(sf).to_pandas()
    j = l1.merge(l2, on="node_id", suffixes=("_1", "_2"))
    assert len(j) == len(l1)
    per = j.groupby("community_1")["community_2"].nunique()
    assert (per == 1).all()
    assert set(j["community_2"]) <= set(l1["community"])


def test_louvain_full_invariants(ray_session):
    """Hierarchical Louvain loop (r5): accepted q_num trace strictly
    increases, the level count is bounded and consistent with the trace,
    the final partition factors through level 1, and a second run is
    bit-identical (determinism)."""
    from ligrust_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    ds, levels, trace = Q.louvain_full(sf)
    full = ds.to_pandas().sort_values("node_id").reset_index(drop=True)
    assert 0 <= levels <= Q.LOUVAIN_MAX_LEVELS
    # trace[0] = initial LP partition; accepted levels strictly gain
    accepted = [trace[0]]
    for qc in trace[1:]:
        if qc > accepted[-1]:
            accepted.append(qc)
    assert len(accepted) - 1 == levels
    assert all(b > a for a, b in zip(accepted, accepted[1:]))
    # rejected tail (if the loop stopped early): last candidate <= best
    if levels + 1 < len(trace):
        assert trace[-1] <= accepted[-1]
    # final modularity >= single-move-round modularity (it iterates on it)
    if levels >= 1:
        l1 = Q.q_events_louvain_move(sf).to_pandas()
        j = l1.merge(full, on="node_id", suffixes=("_1", "_f"))
        per = j.groupby("community_1")["community_f"].nunique()
        assert (per == 1).all()          # factors through level 1
    ds2, levels2, trace2 = Q.louvain_full(sf)
    full2 = ds2.to_pandas().sort_values("node_id").reset_index(drop=True)
    assert levels2 == levels and trace2 == trace
    assert (full2["community"].to_numpy()
            == full["community"].to_numpy()).all()


def test_katz_matches_oracle(graphs):
    from ligrust_ray.algos.ppr import katz

    for nm in ("fixture", "path", "empty-edges", "er-64", "zipf-200"):
        g, n, src, dst = graphs[nm]
        katz(g, rounds=4)
        got = g.collect_state(["x"])["x"]
        exp = oracle.katz_oracle(n, src, dst, rounds=4)
        np.testing.assert_allclose(got, exp, atol=1e-12, err_msg=nm)


def test_trustrank_matches_oracle(graphs):
    from ligrust_ray.algos.ppr import trust_rank

    for nm in ("fixture", "path", "empty-edges", "er-64", "zipf-200"):
        g, n, src, dst = graphs[nm]
        trust_rank(g, seed_mod=4, rounds=4)
        got = g.collect_state(["p"])["p"]
        exp = oracle.trustrank_oracle(n, src, dst, seed_mod=4, rounds=4)
        np.testing.assert_allclose(got, exp, atol=1e-12, err_msg=nm)
        # teleport mass only lands on seeds: a node with no in-edges and
        # id % mod != 0 must score exactly 0
        no_in = np.setdiff1d(np.arange(n), dst)
        non_seed = no_in[no_in % 4 != 0]
        assert (got[non_seed] == 0.0).all(), nm


def test_eigencentrality_matches_oracle(graphs):
    from ligrust_ray.algos.ppr import eigencentrality

    for nm in ("fixture", "path", "empty-edges", "er-64", "zipf-200"):
        g, n, src, dst = graphs[nm]
        eigencentrality(g, rounds=4)
        got = g.collect_state(["x"])["x"]
        exp = oracle.eigencentrality_oracle(n, src, dst, rounds=4)
        np.testing.assert_allclose(got, exp, atol=1e-12, err_msg=nm)
        # L1-normalised: mass sums to 1 whenever the iterate is nonzero
        # (on a DAG the adjacency operator is nilpotent, so the iterate
        # legitimately collapses to all-zeros once rounds exceed the
        # longest path — the 0/0 guard keeps it at 0, not NaN)
        tot = np.abs(got).sum()
        assert tot < 1e-12 or abs(tot - 1.0) < 1e-9, nm
        assert not np.isnan(got).any(), nm


def test_condensation_is_a_dag(ray_session):
    import ligrust_ray.pipelines.queries as Q

    t = Q.q_events_condensation("/root/testdata/sf0.001")
    df = t.to_pandas() if hasattr(t, "to_pandas") else t
    if hasattr(df, "schema"):       # Dataset
        df = df.to_pandas()
    assert list(sorted(df.columns)) == ["comp_dst", "comp_src", "n_edges"]
    assert (df["comp_src"] != df["comp_dst"]).all()
    assert (df["n_edges"] >= 1).all()
    # acyclic: repeatedly strip sink components; everything must drain
    edges = set(zip(df["comp_src"], df["comp_dst"]))
    while edges:
        srcs = {a for a, _ in edges}
        sinks = {b for _, b in edges} - srcs
        assert sinks, "cycle in condensation DAG"
        edges = {(a, b) for a, b in edges if b not in sinks}


def test_bipartite_component_rollup(ray_session):
    import ligrust_ray.pipelines.queries as Q

    df = Q.q_events_bipartite("/root/testdata/sf0.001").to_pandas()
    assert list(sorted(df.columns)) == ["comp", "is_bipartite", "n_nodes"]
    assert df["is_bipartite"].isin([0, 1]).all()
    assert (df["n_nodes"] >= 1).all()
    # component labels are min member ids -> distinct, and sizes sum to n
    assert df["comp"].is_unique
    n = Q.events_n("/root/testdata/sf0.001")
    assert int(df["n_nodes"].sum()) == n
    # a dense random multigraph's giant component has odd cycles; only
    # trivial (size<3) components can be bipartite here
    giant = df.loc[df["n_nodes"].idxmax()]
    if giant["n_nodes"] >= 3:
        assert giant["is_bipartite"] == 0


def test_bowtie_partition_invariants(ray_session):
    import ligrust_ray.pipelines.queries as Q

    df = Q.q_events_bowtie("/root/testdata/sf0.001").to_pandas()
    assert set(df["cls"]) <= {"core", "in", "out", "other"}
    assert len(df) == Q.events_n("/root/testdata/sf0.001")
    # the giant SCC is non-empty and every class is exclusive (one row
    # per node is a partition by construction of np.where)
    assert (df["cls"] == "core").sum() >= 1
    # every IN node must reach the core: IN members have at least one
    # out-edge in the subgraph (a node with no out-edges cannot reach
    # anything, so it can never be classed 'in')
    import numpy as np
    import pyarrow.compute as pc
    edges = Q.events_err_edges_ds("/root/testdata/sf0.001").to_pandas()
    has_out = set(edges["src"])
    in_nodes = set(df.loc[df["cls"] == "in", "node_id"])
    assert in_nodes <= has_out


def test_degree_mixing_and_multiplicity_mass(ray_session):
    import ligrust_ray.pipelines.queries as Q

    sf = "/root/testdata/sf0.001"
    ev = Q.events_edges_ds(sf).to_pandas()
    mix = Q.q_events_degree_mixing(sf).to_pandas()
    und = ev[ev.src != ev.dst]
    n_und = len({(min(a, b), max(a, b)) for a, b in zip(und.src, und.dst)})
    # every directed pair of the symmetrized simple graph appears once
    assert int(mix["n_pairs"].sum()) == 2 * n_und
    # the matrix is symmetric: (bx,by) mass equals (by,bx) mass
    m = {(r.bx, r.by): r.n_pairs for r in mix.itertuples()}
    assert all(m[(a, b)] == m.get((b, a)) for a, b in m)

    mult = Q.q_events_multiplicity(sf).to_pandas()
    assert int((mult["multiplicity"] * mult["n_edges"]).sum()) == len(ev)


def test_pages_bowtie_has_multiple_regions(ray_session):
    import ligrust_ray.pipelines.queries as Q

    df = Q.q_pages_bowtie("/root/testdata/sf0.001").to_pandas()
    assert set(df["cls"]) <= {"core", "in", "out", "other"}
    # the synthetic crawl's dead links produce a real bow-tie: a core
    # plus at least one non-core region
    counts = df["cls"].value_counts()
    assert counts.get("core", 0) >= 1
    assert len(counts) >= 2


def test_dead_links_census(ray_session):
    import ligrust_ray.pipelines.queries as Q

    df = Q.q_pages_dead_links("/root/testdata/sf0.001").to_pandas()
    assert (df["n_dead"] <= df["n_links"]).all()
    # planted void*.example targets are never crawled: all dead
    void = df[df["host"].str.startswith("void")]
    assert len(void) >= 1
    assert (void["n_dead"] == void["n_links"]).all()
    # site*.example targets resolve (crawled universe): not all dead
    site = df[df["host"].str.startswith("site")]
    assert len(site) >= 1
    assert int(site["n_dead"].sum()) < int(site["n_links"].sum())


def test_louvain_full_planted_hierarchy(ray_session):
    """Planted two-scale graph: 8 cliques of 6, cliques 2k/2k+1 bridged
    by a few edges — level 1 (from singleton labels) finds the cliques,
    a later accepted level merges bridged pairs; the loop must accept
    >= 2 levels with strictly-increasing q_num and end with 4
    communities that exactly partition the clique pairs."""
    import pyarrow as pa
    import ray.data

    from ligrust_ray.pipelines import queries as Q

    K, S = 8, 6                    # cliques, clique size
    src, dst, w = [], [], []
    for c in range(K):
        base = c * S
        for i in range(S):
            for j in range(i + 1, S):
                src.append(base + i)
                dst.append(base + j)
    for c in range(0, K, 2):       # weak bridges between pair members
        a, b = c * S, (c + 1) * S
        for k in range(2):
            src.append(a + k)
            dst.append(b + k)
    n = K * S
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(src, type=pa.int64()),
        "dst": pa.array(dst, type=pa.int64()),
        "w": pa.array([1] * len(src), type=pa.int64())})).materialize()
    singles = ray.data.from_arrow(pa.table({
        "node_id": pa.array(range(n), type=pa.int64()),
        "community": pa.array(range(n), type=pa.int64())})).materialize()
    ds, levels, trace = Q.louvain_full_core(singles, edges, len(src))
    out = ds.to_pandas().sort_values("node_id").reset_index(drop=True)
    assert levels >= 2
    acc = [trace[0]]
    for qc in trace[1:]:
        if qc > acc[-1]:
            acc.append(qc)
    assert len(acc) - 1 == levels
    assert all(b > a for a, b in zip(acc, acc[1:]))
    comm = out["community"].to_numpy()
    # the synchronous move round does not guarantee the classic
    # sequential-Louvain merge of whole cliques (simultaneous moves
    # split ties) — assert the partition is PURE across the planted
    # two-scale structure: no community spans two different clique
    # pairs, and it is strictly coarser than singletons
    groups = {}
    for node, c in enumerate(comm):
        groups.setdefault(c, set()).add(node)
    pair_of = {node: node // (2 * S) for node in range(n)}
    for members in groups.values():
        assert len({pair_of[v] for v in members}) == 1
    assert len(groups) < n


def test_pagerank_standard_matches_oracle(graphs):
    """r5: normalized PageRank with dangling redistribution — numpy
    oracle parity over 5 graph shapes + probability-mass conservation
    (the property the reference's unnormalized variant lacks)."""
    from ligrust_ray.algos.pagerank import page_rank_standard

    for nm in ("fixture", "path", "empty-edges", "er-64", "zipf-200"):
        g, n, src, dst = graphs[nm]
        page_rank_standard(g, rounds=6)
        got = g.collect_state(["x"])["x"]
        exp = oracle.pr_std_oracle(n, src, dst, rounds=6)
        np.testing.assert_allclose(got, exp, atol=1e-12, err_msg=nm)
        assert abs(got.sum() - 1.0) < 1e-9, nm   # mass conserved


def test_salsa_matches_oracle(ray_session, tmp_path):
    """r5: SALSA random-walk hub/authority scores vs numpy oracle over
    3 graph shapes (twin-graph protocol of test_hits_matches_oracle)."""
    from ligrust_ray.algos.hits import salsa

    for name, n, (src, dst) in [
            ("er-64", 64, oracle.random_digraph(64, 3.0, seed=21)),
            ("zipf-120", 120, oracle.random_digraph(120, 0, seed=22,
                                                    zipf=True)),
            ("empty", 5, (np.array([], dtype=np.int64),
                          np.array([], dtype=np.int64)))]:
        src = src.astype(np.int64)
        dst = dst.astype(np.int64)
        g = make_graph(str(tmp_path / f"sf_{name}"), src, dst, n, nparts=3)
        grev = make_graph(str(tmp_path / f"sr_{name}"), dst, src, n,
                          nparts=3)
        salsa(g, grev, rounds=3)
        st = g.collect_state(["h", "a"])
        eh, ea = oracle.salsa_oracle(n, src, dst, rounds=3)
        np.testing.assert_allclose(st["h"], eh, atol=1e-12, err_msg=name)
        np.testing.assert_allclose(st["a"], ea, atol=1e-12, err_msg=name)


def test_topo_levels_distributed_matches_fast(ray_session):
    """r5: the keyed-shuffle max-propagation loop == the single-task
    relaxation on the condensation DAG, plus layering invariants
    (every cross-comp edge strictly increases level)."""
    from ligrust_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    fast = (Q.q_events_topo_levels(sf).to_pandas()
            .sort_values("comp").reset_index(drop=True))
    dist = (Q.q_events_topo_levels(sf, mode="distributed").to_pandas()
            .sort_values("comp").reset_index(drop=True))
    assert (fast["comp"].to_numpy() == dist["comp"].to_numpy()).all()
    assert (fast["level"].to_numpy() == dist["level"].to_numpy()).all()
    lvl = dict(zip(fast["comp"], fast["level"]))
    ce = Q.q_events_condensation(sf).to_pandas()
    for _, r in ce.iterrows():
        assert lvl[r["comp_dst"]] >= lvl[r["comp_src"]] + 1
    assert fast["level"].min() == 0


def test_louvain_full_checkpoint_resume(ray_session, tmp_path):
    """r5: level-manifest checkpointing on the hierarchy loop — a run
    capped after level 1 resumes to the bitwise output of an
    uninterrupted run; stale dirs from a different edge set are
    ignored."""
    import pyarrow as pa
    import ray.data

    from ligrust_ray.pipelines import queries as Q

    K, S = 8, 6
    src, dst = [], []
    for c in range(K):
        base = c * S
        for i in range(S):
            for j in range(i + 1, S):
                src.append(base + i)
                dst.append(base + j)
    for c in range(0, K, 2):
        a, b = c * S, (c + 1) * S
        for k in range(2):
            src.append(a + k)
            dst.append(b + k)
    n = K * S

    def edges():
        return ray.data.from_arrow(pa.table({
            "src": pa.array(src, type=pa.int64()),
            "dst": pa.array(dst, type=pa.int64()),
            "w": pa.array([1] * len(src), type=pa.int64())})) \
            .materialize()

    def singles():
        return ray.data.from_arrow(pa.table({
            "node_id": pa.array(range(n), type=pa.int64()),
            "community": pa.array(range(n), type=pa.int64())})) \
            .materialize()

    base_ds, base_lvl, base_tr = Q.louvain_full_core(
        singles(), edges(), len(src))
    base = (base_ds.to_pandas().sort_values("node_id")
            .reset_index(drop=True))
    assert base_lvl >= 2

    # "kill" after level 1 (max_levels=1 writes only level 1), resume
    ck = str(tmp_path / "lv_ck")
    Q.louvain_full_core(singles(), edges(), len(src), max_levels=1,
                        checkpoint_dir=ck)[0].to_pandas()
    man = Q._louvain_ckpt_latest(ck)
    assert man is not None and man["level"] == 1
    ds2, lvl2, tr2 = Q.louvain_full_core(singles(), edges(), len(src),
                                         checkpoint_dir=ck)
    got = ds2.to_pandas().sort_values("node_id").reset_index(drop=True)
    assert lvl2 == base_lvl and tr2 == base_tr
    assert (got["community"].to_numpy()
            == base["community"].to_numpy()).all()

    # stale dir (different graph) ignored
    other_edges = ray.data.from_arrow(pa.table({
        "src": pa.array([0, 1, 2], type=pa.int64()),
        "dst": pa.array([1, 2, 0], type=pa.int64()),
        "w": pa.array([1, 1, 1], type=pa.int64())})).materialize()
    other_sing = ray.data.from_arrow(pa.table({
        "node_id": pa.array(range(3), type=pa.int64()),
        "community": pa.array(range(3), type=pa.int64())})).materialize()
    plain = Q.louvain_full_core(other_sing, other_edges, 3)[0] \
        .to_pandas().sort_values("node_id").reset_index(drop=True)
    via_ck = Q.louvain_full_core(other_sing, other_edges, 3,
                                 checkpoint_dir=ck)[0] \
        .to_pandas().sort_values("node_id").reset_index(drop=True)
    assert (plain["community"].to_numpy()
            == via_ck["community"].to_numpy()).all()


def test_wl_colors_distributed_matches_fast(ray_session):
    """r5: the single-task WL refinement == the keyed-shuffle rounds
    bit-for-bit (hash spec parity incl. signed rendering + wrapped
    multiset sum)."""
    from ligrust_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    fast = (Q.q_events_wl_colors(sf).to_pandas()
            .sort_values("node_id").reset_index(drop=True))
    dist = (Q.q_events_wl_colors(sf, mode="distributed").to_pandas()
            .sort_values("node_id").reset_index(drop=True))
    assert (fast["node_id"].to_numpy() == dist["node_id"].to_numpy()).all()
    for c in ("wl1", "wl2"):
        assert (fast[c].to_numpy() == dist[c].to_numpy()).all()
