"""Single-source betweenness centrality (Brandes 2001) — the Ligra paper's
BC application (Shun & Blelloch 2013 §6), NEW vs the reference
(/root/reference/src/algos.rs has no BC), expressed through the engine's
kernel surface with reduce="sum" in both directions.

Runs on a SYMMETRIZED simple graph (like k-core/MIS/Radii): on an
undirected graph the backward dependency pass follows the same adjacency
as the forward BFS, so no transpose edgeMap is needed (Ligra's BC flips
to the in-CSR; here in == out by construction).

Forward (path counting): level-synchronous BFS where
``sigma[t] = Σ sigma[s]`` over t's neighbours in the previous frontier —
an edgeMap sum whose apply claims unvisited targets. Path counts are
exact int64 kept below 2^53 (the sum-reduce travels through float64;
the apply RAISES past that bound rather than silently rounding).

Backward (dependency accumulation), for levels L-1 .. 1:
``delta[v] = sigma[v] * Σ_{w adj v, level[w]=level[v]+1}
(1 + delta[w]) / sigma[w]`` — an edgeMap sum from the level-l frontier
applied to level-(l-1) targets. On an undirected BFS every neighbour one
level deeper is a successor, so the frontier restriction alone gives
Brandes' predecessor sums.

Contract note: level/sigma are exact integers; delta is float64 whose
per-node sums follow the in-list reduceat order — the SQL oracle's SUM
order differs in the last ulp, so the contract column is
``floor(delta*1e6 + 0.5)`` (identical rounding function both sides;
see __ray_entry__._bc_sql).
"""

from __future__ import annotations

import time

import numpy as np

from ligrust_ray.stages.kernels import EdgeKernel, VertexKernel

_SIGMA_EXACT_MAX = float(1 << 53)   # float64 exact-integer ceiling

STATE = ["level", "sigma", "delta"]


class _SeedRoot(VertexKernel):
    def __init__(self, root: int):
        self.root = root

    def update(self, state, mask, shard):
        if shard.lo <= self.root < shard.hi:
            state["level"][self.root - shard.lo] = 0
            state["sigma"][self.root - shard.lo] = 1.0
        return None, {}


class _CountPaths(EdgeKernel):
    """Forward wave l: agg = Σ sigma over previous-frontier neighbours;
    unvisited touched targets join level l with sigma = agg."""

    reduce = "sum"
    value_dtype = np.float64

    def __init__(self, level: int):
        self.level = level

    def source_values(self, state, out_deg):
        return state["sigma"]

    def source_values_at(self, state, out_deg, idx):
        return state["sigma"][idx]

    def target_active(self, state):
        return state["level"] < 0

    def apply(self, state, agg, touched, shard):
        new = touched
        state["level"][new] = self.level
        state["sigma"][new] = agg[new]
        if new.any() and float(agg[new].max()) > _SIGMA_EXACT_MAX:
            raise OverflowError("sigma exceeded float64 exact-integer "
                                "range (2^53); path counts would round")
        return new, {"visited": int(new.sum())}


class _SelectLevel(VertexKernel):
    """frontier := nodes at exactly ``level``."""

    def __init__(self, level: int):
        self.level = level

    def update(self, state, mask, shard):
        return state["level"] == self.level, {}


class _Accumulate(EdgeKernel):
    """Backward wave from the level-l frontier:
    agg[t] = Σ (1 + delta[s]) / sigma[s]; level-(l-1) targets set
    delta = sigma * agg."""

    reduce = "sum"
    value_dtype = np.float64
    has_output_frontier = False   # frontier is re-selected per level

    def __init__(self, level: int):
        self.level = level   # the FRONTIER's level; targets are level-1

    def source_values(self, state, out_deg):
        sig = state["sigma"]
        out = np.zeros(len(sig), dtype=np.float64)
        np.divide(1.0 + state["delta"], sig, out=out, where=sig > 0)
        return out

    def source_values_at(self, state, out_deg, idx):
        sig = state["sigma"][idx]
        out = np.zeros(len(idx), dtype=np.float64)
        np.divide(1.0 + state["delta"][idx], sig, out=out, where=sig > 0)
        return out

    def target_active(self, state):
        return state["level"] == self.level - 1

    def apply(self, state, agg, touched, shard):
        state["delta"][touched] = state["sigma"][touched] * agg[touched]
        return None, {}


def betweenness(graph, root: int = 0, max_levels: int = 10_000) -> dict:
    """Brandes from one root; afterwards state holds ``level`` (-1 if
    unreached), ``sigma`` (shortest-path counts, exact) and ``delta``
    (dependency scores — the single-source betweenness contribution).
    ``graph`` MUST be symmetrized and simple. ``max_levels`` bounds the
    BFS depth and RAISES when exceeded (keeps the engine inside the SQL
    oracle's unroll depth)."""
    t0 = time.perf_counter()
    graph.init_algo({"level": (np.int64, -1),
                     "sigma": (np.float64, 0.0),
                     "delta": (np.float64, 0.0)})
    graph.vertex_map(_SeedRoot(root), over="all")
    graph.set_frontier("ids", np.asarray([root], dtype=np.int64))
    graph.edges_scanned = 0
    levels = 0
    while graph.frontier_count != 0:
        levels += 1
        if levels > max_levels:
            raise RuntimeError(
                f"betweenness forward pass exceeded {max_levels} levels")
        graph.edge_map(_CountPaths(levels))
    # deepest level actually reached is levels-1 (the last wave was empty)
    for lvl in range(levels - 1, 0, -1):
        graph.vertex_filter(_SelectLevel(lvl), over="all")
        if graph.frontier_count:
            graph.edge_map(_Accumulate(lvl))
    return {"levels": levels - 1, "edges_scanned": graph.edges_scanned,
            "wall_s": time.perf_counter() - t0, "state_names": STATE}
