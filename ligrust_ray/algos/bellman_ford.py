"""Bellman-Ford single-source shortest paths — the Ligra paper's weighted
application (Shun & Blelloch 2013 §6, "Bellman-Ford"), NEW vs the
unweighted reference (/root/reference/src/algos.rs has BFS but no SSSP),
expressed through the engine's kernel surface with the derived-weight
weighted edgeMap (state/weights.py, ``EdgeKernel.weight_spec``).

Frontier-based relaxation on the min-plus semiring: each round the edgeMap
computes, for every target with an in-neighbour in the frontier,
``agg = min over frontier sources s of dist[s] + w(s, t)``; targets whose
distance improves adopt it and form the next frontier. Positive integer
weights (w in [1, W]) mean no negative cycles: the fixpoint is reached in
at most (max shortest-path hop count) rounds, every distance is an exact
int64, and the unrolled DuckDB oracle (same weight hash, same per-round
min) reproduces the distances bit-for-bit.

``UNREACHED`` is 2^62, not int64 max: source values for unreached nodes
flow through the gather BEFORE the frontier mask is applied
(graph._segment_reduce masks after the weight add), so the sentinel must
leave headroom for ``+ w`` without wrapping.
"""

from __future__ import annotations

import time

import numpy as np

from ligrust_ray.stages.kernels import EdgeKernel, VertexKernel
from ligrust_ray.state import checkpoint as ckpt

WEIGHT_SPEC = "md5:32"          # w(s, d) in [1, 32] — see state/weights.py
UNREACHED = np.int64(1) << 62   # overflow-safe "infinity"


class _SetSource(VertexKernel):
    def __init__(self, source: int):
        self.source = source

    def update(self, state, mask, shard):
        if shard.lo <= self.source < shard.hi:
            state["dist"][self.source - shard.lo] = 0
        return None, {}


class _Relax(EdgeKernel):
    reduce = "min"
    value_dtype = np.int64
    weight_spec = WEIGHT_SPEC

    def source_values(self, state, out_deg):
        return state["dist"]

    def source_values_at(self, state, out_deg, idx):
        return state["dist"][idx]

    def apply(self, state, agg, touched, shard):
        improved = touched & (agg < state["dist"])
        state["dist"][improved] = agg[improved]
        return improved, {"relaxed": int(improved.sum())}


def bellman_ford(graph, source: int = 0, max_rounds: int | None = None,
                 checkpoint_dir: str | None = None,
                 checkpoint_every: int = 1, resume: bool = True) -> dict:
    """Run to fixpoint; afterwards ``state['dist']`` holds exact shortest
    md5-weighted distances from ``source`` (UNREACHED where no path).
    ``max_rounds`` caps the relaxation rounds and RAISES when exceeded
    (used to keep the engine inside the SQL oracle's unroll depth);
    default n — the classic n-1 improvement rounds plus the final
    empty-result wave that drains the frontier. Checkpoint/resume follows
    the bfs/cc pattern (state + frontier per round; resume is bitwise
    because distances are exact ints)."""
    t0 = time.perf_counter()
    if max_rounds is None:
        max_rounds = max(1, graph.n)
    graph.init_algo({"dist": (np.int64, UNREACHED)})
    rounds = 0
    man = ckpt.latest_checkpoint(checkpoint_dir, "sssp") if (
        checkpoint_dir and resume) else None
    if man is not None:
        ckpt.restore_checkpoint(graph, man)
        rounds = man["loop_state"]["rounds"]
    else:
        graph.vertex_map(_SetSource(source), over="all")
        graph.set_frontier("ids", np.asarray([source], dtype=np.int64))
    kernel = _Relax()
    graph.edges_scanned = 0
    while graph.frontier_count != 0:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"bellman_ford did not converge in {max_rounds} rounds")
        graph.edge_map(kernel)
        if checkpoint_dir and checkpoint_every \
                and rounds % checkpoint_every == 0:
            ckpt.write_checkpoint(
                graph, checkpoint_dir, "sssp", rounds, ["dist"],
                {"frontier_size": graph.frontier_count,
                 "edges_scanned": graph.edges_scanned,
                 "wall_s": time.perf_counter() - t0},
                {"rounds": rounds})
    return {"rounds": rounds, "edges_scanned": graph.edges_scanned,
            "wall_s": time.perf_counter() - t0, "state_names": ["dist"]}
