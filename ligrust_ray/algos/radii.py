"""Radii estimation (graph eccentricity lower bounds) — the Ligra paper's
bit-parallel multi-source BFS (Shun & Blelloch 2013 §6), NEW here (the
reference implements only CC/BFS/PageRankDelta). K sampled sources run
their BFS waves SIMULTANEOUSLY through one int64 bitmask per vertex and a
bitwise-OR edgeMap reduce: ``radii[v]`` ends as the last round in which v
acquired a new source bit = max over sources reaching v of dist(s, v) —
a lower bound on v's true eccentricity that sharpens with K.

Demonstrates the kernel surface's extensibility: the only engine addition
is the associative ``reduce="or"`` (state/graph.py), after which the whole
dense/sparse machinery (pull gather, push combine, hub merge, fused waves)
applies unchanged.
"""

from __future__ import annotations

import time

import numpy as np

from ligrust_ray.stages.kernels import EdgeKernel

STATE = ["visited", "radii"]


def sample_sources(n: int, k: int) -> np.ndarray:
    """Deterministic evenly-spaced source ids (replicated by the SQL
    oracle as ``(i * n) // k``)."""
    return np.unique((np.arange(k, dtype=np.int64) * n) // k)


class RadiiEdge(EdgeKernel):
    reduce = "or"
    value_dtype = np.int64

    def __init__(self):
        self.round = 0          # set by the driver loop before each wave

    def source_values(self, state, out_deg):
        return state["visited"]

    def source_values_at(self, state, out_deg, idx):
        return state["visited"][idx]

    def apply(self, state, agg, touched, shard):
        visited = state["visited"]
        new = visited | np.where(touched, agg, 0)
        changed = new != visited
        state["visited"] = new
        state["radii"] = np.where(changed, np.int64(self.round),
                                  state["radii"])
        return changed, {"changed": int(changed.sum())}


def _popcount64(a: np.ndarray) -> np.ndarray:
    """Per-element popcount of an int64 array (numpy 1.x has no
    bitwise_count; unpackbits over the raw bytes is branch-free and
    correct for any bit pattern)."""
    if len(a) == 0:
        return np.zeros(0, dtype=np.int64)
    return np.unpackbits(
        np.ascontiguousarray(a).view(np.uint8).reshape(len(a), 8),
        axis=1).sum(axis=1).astype(np.int64)


class HarmonicEdge(RadiiEdge):
    """Radii wave + sampled harmonic centrality: each NEW source bit
    arriving at v in round r contributes floor(1e6 / r) micro-units
    (r = dist(s, v) on a BFS wave), so ``harm[v]`` ends as
    sum over sampled sources s != v reaching v of 1_000_000 // d(s, v) —
    the integer-ppm sampled harmonic centrality, exactly replicable by
    the per-source recursive-CTE SQL oracle."""

    def apply(self, state, agg, touched, shard):
        visited = state["visited"]
        new = visited | np.where(touched, agg, 0)
        newbits = new ^ visited
        changed = newbits != 0
        state["visited"] = new
        state["radii"] = np.where(changed, np.int64(self.round),
                                  state["radii"])
        state["harm"] = state["harm"] + _popcount64(newbits) * np.int64(
            1_000_000 // self.round)
        return changed, {"changed": int(changed.sum())}


def radii(graph, k: int = 8, harmonic: bool = False) -> dict:
    """Run to fixpoint; afterwards ``state['radii']`` holds the estimate
    (-1 = reached by no sampled source). k <= 64 (bitmask width).
    ``harmonic=True`` additionally accumulates ``state['harm']`` (sampled
    harmonic centrality in ppm, see HarmonicEdge) on the SAME waves —
    zero extra dispatches."""
    if not (1 <= k <= 64):
        raise ValueError("k must be in [1, 64]")
    t0 = time.perf_counter()
    srcs = sample_sources(graph.n, k)

    def init_visited(lo, hi):
        v = np.zeros(hi - lo, dtype=np.int64)
        for i, s in enumerate(srcs):
            if lo <= s < hi:
                v[s - lo] |= np.int64(1) << np.int64(i)
        return v

    def init_radii(lo, hi):
        r = np.full(hi - lo, -1, dtype=np.int64)
        for s in srcs:
            if lo <= s < hi:
                r[s - lo] = 0
        return r

    spec = {"visited": init_visited, "radii": init_radii}
    if harmonic:
        spec["harm"] = (np.int64, 0)
    graph.init_algo(spec)
    graph.set_frontier("ids", srcs)
    kernel = HarmonicEdge() if harmonic else RadiiEdge()
    graph.edges_scanned = 0
    rounds = 0
    while graph.frontier_count != 0:
        rounds += 1
        kernel.round = rounds
        graph.edge_map(kernel)
    return {"k": int(len(srcs)), "rounds": rounds,
            "edges_scanned": graph.edges_scanned,
            "wall_s": time.perf_counter() - t0,
            "state_names": STATE + (["harm"] if harmonic else [])}
