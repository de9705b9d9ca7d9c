"""k-core decomposition (membership for a fixed k) — NEW algorithm, not in
the reference, expressed entirely through the engine's kernel surface
(U1 EdgeKernel + U2 VertexKernel, SURVEY.md §2.5): the classic Ligra KCore
peeling loop, exercising the same push/pull edgeMap machinery as CC/BFS.

Semantics: UNDIRECTED simple k-core — run on a SYMMETRIZED simple graph
(every undirected edge stored in both directions, self-loops dropped), so
``out_deg`` is the undirected degree and the existing out-CSR push / in-CSR
pull both carry the full adjacency. Peeling is synchronous-round
(simultaneous removal): frontier = nodes currently below k; they are marked
dead, then push one decrement per incident edge; targets falling below k
form the next frontier. The fixed point (the unique maximal subgraph with
min degree >= k) is independent of removal order.
"""

from __future__ import annotations

import time

import numpy as np

from ligrust_ray.stages.kernels import EdgeKernel, VertexKernel

STATE = ["alive", "deg"]


class _InitDeg(VertexKernel):
    def update(self, state, mask, shard):
        state["deg"] = shard.out_deg.astype(np.int64).copy()
        return None, {}


class _SelectDying(VertexKernel):
    """frontier := alive nodes currently below k."""

    def __init__(self, k: int):
        self.k = k

    def update(self, state, mask, shard):
        keep = state["alive"] & (state["deg"] < self.k)
        return keep, {"dying": int(keep.sum())}


class _Kill(VertexKernel):
    """Mark the frontier dead (before its removal messages are pushed, so
    simultaneously-dying nodes never receive pointless decrements)."""

    def update(self, state, mask, shard):
        state["alive"] = state["alive"] & ~mask
        return None, {}


class _Decrement(EdgeKernel):
    reduce = "sum"
    value_dtype = np.float64

    def __init__(self, k: int):
        self.k = k

    def source_values(self, state, out_deg):
        return np.ones(len(out_deg), dtype=np.float64)   # 1 per edge

    def source_values_at(self, state, out_deg, idx):
        return np.ones(len(idx), dtype=np.float64)

    def target_active(self, state):
        return state["alive"]

    def apply(self, state, agg, touched, shard):
        deg = state["deg"]
        dec = np.where(touched, agg, 0.0).astype(np.int64)
        deg = deg - dec
        state["deg"] = deg
        changed = touched & state["alive"] & (deg < self.k)
        return changed, {"newly_dying": int(changed.sum())}


def kcore(graph, k: int, max_rounds: int = 10_000) -> dict:
    """Peel to fixpoint; afterwards ``state['alive']`` marks the k-core.
    Returns metrics. ``graph`` MUST be a symmetrized simple graph (see
    module docstring)."""
    t0 = time.perf_counter()
    graph.init_algo({"alive": (np.bool_, True),
                     "deg": (np.int64, 0)})
    graph.vertex_map(_InitDeg(), over="all")
    graph.vertex_filter(_SelectDying(k), over="all")
    kernel = _Decrement(k)
    kill = _Kill()
    graph.edges_scanned = 0
    rounds = 0
    while graph.frontier_count != 0:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(f"kcore did not converge in {max_rounds} "
                               "rounds")
        graph.vertex_map(kill, over="frontier")
        graph.edge_map(kernel)
    return {"k": k, "rounds": rounds,
            "edges_scanned": graph.edges_scanned,
            "wall_s": time.perf_counter() - t0, "state_names": STATE}
