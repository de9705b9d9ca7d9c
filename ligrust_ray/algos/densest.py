"""Approximate densest subgraph (Charikar 2000 greedy peeling, parallel
batched-removal variant of Bahmani, Kumar & Vassilvitskii, VLDB 2012) —
NEW vs the reference (which implements only CC/BFS/PageRankDelta,
/root/reference/src/main.rs), expressed through the engine's kernel
surface like k-core (algos/kcore.py shares the decrement machinery shape).

Runs on a SYMMETRIZED simple graph. Round r (alive set S_r, n_r = |S_r|,
m_r = undirected edges inside S_r):

1. density rho_r = m_r / n_r; the best (max-density) start-of-round set
   is tracked by EXACT rational comparison (m_a * n_b > m_b * n_a —
   no float ties), earliest round winning equality.
2. every alive node with degree <= floor(3 * m_r / n_r) is removed
   SIMULTANEOUSLY (threshold 2(1+eps)*rho with eps = 1/2, giving a
   2(1+eps) = 3-approximation and n_{r+1} < n_r / (1+eps), so the loop
   ends within ~log_1.5 n rounds). Since min degree <= average
   2*m_r/n_r <= threshold, every round removes at least one node and the
   loop always terminates with S empty within ~log_1.5 n rounds.
3. removed nodes push one decrement per incident edge (sum-reduce
   edgeMap, targets = still-alive); the same wave's apply reports the
   per-shard alive census (count + remaining degree sum), so a round
   costs exactly one vertex wave + one edge wave — no extra census pass.

``state['died']`` records each node's removal round; the answer (the
densest start-of-round set) is ``died >= best_round``. The whole loop is
deterministic, so the DuckDB oracle (unrolled rounds, same floor-divide
threshold and rational argmax) reproduces the EXACT member set.
"""

from __future__ import annotations

import time

import numpy as np

from ligrust_ray.stages.kernels import EdgeKernel, VertexKernel

STATE = ["alive", "deg", "died"]
NEVER_DIED = np.int64(1) << np.int64(62)


class _InitDeg(VertexKernel):
    def update(self, state, mask, shard):
        state["deg"] = shard.out_deg.astype(np.int64)   # astype = fresh copy
        return None, {}


class _Peel(VertexKernel):
    """frontier := alive nodes at/below the density threshold; they are
    marked dead (died = this round) before their removal messages push."""

    def __init__(self, round_no: int, thr: int):
        self.round_no = round_no
        # python int; clip so huge thresholds stay valid int64
        self.thr = min(int(thr), int(np.iinfo(np.int64).max))

    def update(self, state, mask, shard):
        dying = state["alive"] & (state["deg"] <= self.thr)
        state["alive"] = state["alive"] & ~dying
        state["died"][dying] = self.round_no
        return dying, {"removed": int(dying.sum())}


class _DecrementCensus(EdgeKernel):
    """1 decrement per edge from the dying frontier into alive targets;
    apply also reports the post-removal alive census (apply runs on every
    shard each wave — graph.py apply_messages/pull dispatch to all)."""

    reduce = "sum"
    value_dtype = np.float64
    has_output_frontier = False     # _Peel re-filters at next round start

    def source_values(self, state, out_deg):
        return np.ones(len(out_deg), dtype=np.float64)

    def source_values_at(self, state, out_deg, idx):
        return np.ones(len(idx), dtype=np.float64)

    def target_active(self, state):
        return state["alive"]

    def apply(self, state, agg, touched, shard):
        dec = np.where(touched, agg, 0.0).astype(np.int64)
        state["deg"] = state["deg"] - dec
        alive = state["alive"]
        return None, {"alive_cnt": int(alive.sum()),
                      "deg_sum": int(state["deg"][alive].sum())}


def densest_subgraph(graph, max_rounds: int = 64) -> dict:
    """Peel to empty; afterwards ``state['died'] >= best_round`` marks the
    approximately-densest subgraph. ``graph`` MUST be symmetrized simple
    (graph.m counts both directions, so undirected m = graph.m // 2).
    Raises past ``max_rounds`` (keeps the engine inside the SQL oracle's
    unroll depth; the n/(1.5)-per-round shrink makes ~log_1.5 n enough)."""
    t0 = time.perf_counter()
    graph.init_algo({"alive": (np.bool_, True), "deg": (np.int64, 0),
                     "died": (np.int64, NEVER_DIED)})
    graph.vertex_map(_InitDeg(), over="all")
    graph.edges_scanned = 0
    n_alive = graph.n
    m_alive = graph.m // 2
    best_m, best_n, best_round = m_alive, n_alive, 1
    rounds = 0
    while n_alive > 0:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"densest_subgraph did not drain in {max_rounds} rounds")
        # python-int cross-multiply: exact, overflow-free at any scale
        if m_alive * best_n > best_m * n_alive:
            best_m, best_n, best_round = m_alive, n_alive, rounds
        thr = (3 * m_alive) // n_alive
        graph.vertex_filter(_Peel(rounds, thr), over="all")
        s = graph.edge_map(_DecrementCensus())
        n_alive = s.get("alive_cnt", 0)
        m_alive = s.get("deg_sum", 0) // 2
    return {"rounds": rounds, "best_round": best_round,
            "best_n": best_n, "best_m": best_m,
            "edges_scanned": graph.edges_scanned,
            "wall_s": time.perf_counter() - t0, "state_names": STATE}
