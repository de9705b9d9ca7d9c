"""Resume semantics (SURVEY.md §5.2 #5 / FIXTURES.md F6): interrupt after
iteration k, resume from checkpoint, final outputs equal an uninterrupted
run (bitwise for integer algorithms)."""

import numpy as np
import pyarrow as pa
import ray

import oracle
from ligrust_ray.algos.cc import cc
from ligrust_ray.algos.pagerank import page_rank_delta
from ligrust_ray.pipelines.build import build_graph_from_edges
from ligrust_ray.state import checkpoint as ckpt
from ligrust_ray.state.graph import DistGraph


def _graph(tmp, src, dst, n, sub):
    d = str(tmp / sub)
    build_graph_from_edges(pa.table({"src": src, "dst": dst}), d, n=n,
                           num_partitions=3)
    return DistGraph.load(d)


class _Bomb(Exception):
    pass


def test_cc_resume_bitwise(ray_session, tmp_path):
    src, dst = oracle.random_digraph(200, 4.0, seed=5)
    g1 = _graph(tmp_path, src, dst, 200, "a")
    cc(g1)
    want = g1.collect_state(["ids"])["ids"]

    g2 = _graph(tmp_path, src, dst, 200, "b")
    cdir = str(tmp_path / "ck")
    # interrupted run: stop after 2 iterations by wrapping edge_map
    real_edge_map = g2.edge_map
    calls = {"k": 0}

    def bomb(kernel):
        if calls["k"] == 2:
            raise _Bomb()
        calls["k"] += 1
        return real_edge_map(kernel)

    g2.edge_map = bomb
    try:
        cc(g2, checkpoint_dir=cdir)
    except _Bomb:
        pass
    man = ckpt.latest_checkpoint(cdir, "cc")
    assert man is not None and man["iteration"] == 2
    assert man["metrics"]["frontier_size"] >= 0

    # fresh actors (simulates a new driver process), resume from checkpoint
    g3 = _graph(tmp_path, src, dst, 200, "c")
    res = cc(g3, checkpoint_dir=cdir, resume=True)
    got = g3.collect_state(["ids"])["ids"]
    np.testing.assert_array_equal(got, want)


def test_pagerank_resume_matches(ray_session, tmp_path):
    src, dst = oracle.random_digraph(150, 5.0, seed=6)
    g1 = _graph(tmp_path, src, dst, 150, "a")
    r1 = page_rank_delta(g1, max_iterations=30)
    want = g1.collect_state(["page_rank"])["page_rank"]

    cdir = str(tmp_path / "ck")
    g2 = _graph(tmp_path, src, dst, 150, "b")
    real = g2.edge_map
    calls = {"k": 0}

    def bomb(kernel):
        if calls["k"] == 3:
            raise _Bomb()
        calls["k"] += 1
        return real(kernel)

    g2.edge_map = bomb
    try:
        page_rank_delta(g2, max_iterations=30, checkpoint_dir=cdir)
    except _Bomb:
        pass
    g3 = _graph(tmp_path, src, dst, 150, "c")
    r3 = page_rank_delta(g3, max_iterations=30, checkpoint_dir=cdir, resume=True)
    got = g3.collect_state(["page_rank"])["page_rank"]
    np.testing.assert_array_equal(got, want)  # float BITWISE: same op order
    assert r3["iterations"] == r1["iterations"]


def test_result_dataset(ray_session, tmp_path):
    src, dst = oracle.random_digraph(50, 3.0, seed=7)
    g = _graph(tmp_path, src, dst, 50, "a")
    cc(g)
    ds = g.result_dataset(["ids"])
    pdf = ds.to_pandas().sort_values("node_id")
    np.testing.assert_array_equal(pdf["ids"].to_numpy(),
                                  oracle.cc_oracle(50, src, dst))


def test_sssp_resume_bitwise(ray_session, tmp_path):
    """Weighted Bellman-Ford interrupted after 2 rounds resumes to the
    identical exact-int distance array (and the derived edge weights are
    recomputed identically by the fresh actors)."""
    from ligrust_ray.algos.bellman_ford import bellman_ford

    src, dst = oracle.random_digraph(200, 3.0, seed=6)
    g1 = _graph(tmp_path, src, dst, 200, "sa")
    bellman_ford(g1, source=0)
    want = g1.collect_state(["dist"])["dist"]

    g2 = _graph(tmp_path, src, dst, 200, "sb")
    cdir = str(tmp_path / "sck")
    real_edge_map = g2.edge_map
    calls = {"k": 0}

    def bomb(kernel):
        if calls["k"] == 2:
            raise _Bomb()
        calls["k"] += 1
        return real_edge_map(kernel)

    g2.edge_map = bomb
    try:
        bellman_ford(g2, source=0, checkpoint_dir=cdir)
    except _Bomb:
        pass
    man = ckpt.latest_checkpoint(cdir, "sssp")
    assert man is not None and man["iteration"] == 2

    g3 = _graph(tmp_path, src, dst, 200, "sc")
    bellman_ford(g3, source=0, checkpoint_dir=cdir, resume=True)
    np.testing.assert_array_equal(g3.collect_state(["dist"])["dist"], want)


def test_cc_resume_after_actor_kill(ray_session, tmp_path):
    """Cluster-style failure: a CSR shard ACTOR dies mid-algorithm (node
    loss), not just the driver. The surviving checkpoint + graph dir must
    be enough: reload the graph (fresh actors) and resume to the same
    bitwise result as an uninterrupted run."""
    import ray

    src, dst = oracle.random_digraph(200, 4.0, seed=11)
    g1 = _graph(tmp_path, src, dst, 200, "ka")
    cc(g1)
    want = g1.collect_state(["ids"])["ids"]

    g2 = _graph(tmp_path, src, dst, 200, "kb")
    cdir = str(tmp_path / "ck_kill")
    real_edge_map = g2.edge_map
    calls = {"k": 0}

    def kill_then_run(kernel):
        if calls["k"] == 2:        # after iter-2's checkpoint committed
            ray.kill(g2.actors[1], no_restart=True)
        calls["k"] += 1
        return real_edge_map(kernel)

    g2.edge_map = kill_then_run
    try:
        cc(g2, checkpoint_dir=cdir)
        raise AssertionError("expected the killed actor to surface")
    except ray.exceptions.RayError:
        pass
    man = ckpt.latest_checkpoint(cdir, "cc")
    assert man is not None and man["iteration"] >= 1

    # new actor set over the same persisted graph dir; resume
    g3 = DistGraph.load(man["graph_dir"])
    res = cc(g3, checkpoint_dir=cdir, resume=True)
    got = g3.collect_state(["ids"])["ids"]
    np.testing.assert_array_equal(got, want)
    assert res["iterations"] >= man["iteration"]


def test_hyperball_checkpoint_resume_bitwise(ray_session, tmp_path):
    """HyperBall round checkpoints: a run that stops after round 1 and a
    fresh process-equivalent resume to round 3 produce registers and
    N(t) history identical to an uninterrupted run; an incomplete
    (manifest-less) round dir is ignored."""
    import os

    import pandas as pd

    from ligrust_ray.algos import hyperball as hb

    rng = np.random.default_rng(23)
    src, dst = rng.integers(0, 40, 120), rng.integers(0, 40, 120)
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(src, type=pa.int64()),
        "dst": pa.array(dst, type=pa.int64())}))

    def regs_df(d):
        return (d.to_pandas().sort_values(["node", "reg"])
                .reset_index(drop=True))

    plain = regs_df(hb.hyperball_registers(edges, t=3))

    ck = str(tmp_path / "hb")
    r1 = hb.hyperball_registers(edges, t=1, checkpoint_dir=ck)
    assert os.path.isdir(os.path.join(ck, "iter_000001"))
    resumed = regs_df(hb.hyperball_registers(edges, t=3,
                                             checkpoint_dir=ck))
    pd.testing.assert_frame_equal(resumed, plain)

    # neighborhood function resume carries the N(t) history
    ck2 = str(tmp_path / "nf")
    full = hb.neighborhood_function(edges, max_t=3, eps=0.0)
    hb.neighborhood_function(edges, max_t=1, eps=0.0, checkpoint_dir=ck2)
    resumed_nf = hb.neighborhood_function(edges, max_t=3, eps=0.0,
                                          checkpoint_dir=ck2)
    pd.testing.assert_frame_equal(resumed_nf, full)

    # an incomplete round (no manifest) is invisible to resume
    broken = os.path.join(ck, "iter_000009")
    os.makedirs(broken)
    with open(os.path.join(broken, "part-0.parquet"), "w") as fh:
        fh.write("torn write")
    again = regs_df(hb.hyperball_registers(edges, t=3, checkpoint_dir=ck))
    pd.testing.assert_frame_equal(again, plain)
