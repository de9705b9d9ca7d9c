"""PageRankDelta — G3 of SURVEY.md §2.6
(/root/reference/src/algos.rs:169-295), semantics preserved verbatim,
including its quirks (do NOT "fix" them — SURVEY.md §7.8):

- round 1 (algos.rs:194-205): ``delta = gathered*0.85 + 0.15``;
  ``page_rank += delta``; ``delta -= 1/n``; frontier keeps v iff
  ``|delta| > page_rank[v] + 0.01`` (``+``, not ``×``).
- later rounds (algos.rs:207-222): ``delta = gathered*0.85`` (no +0.15);
  page_rank updated and v kept iff ``|rank| > rank*0.01`` (true for every
  rank > 0, so the frontier is all touched nodes).
- stop when ``error < 1e-7`` where error is the SIGNED sum of deltas
  (algos.rs:263-265, 285), or the iteration budget runs out.
- unnormalized teleport (no 1/n scaling — TODO at algos.rs:197), no
  dangling-node redistribution (dangling vertices emit nothing).

Gather: ``neighbors_rank[t] += deltas[s] / out_degree(s)`` over frontier
sources (algos.rs:225-231) — reduce = sum, ``has_output_frontier = False``
(``has_no_result``, algos.rs:237-239).
"""

from __future__ import annotations

import time

import numpy as np

from ligrust_ray.stages.kernels import EdgeKernel, VertexKernel
from ligrust_ray.state import checkpoint as ckpt

DAMPING = 0.85
TOLERANCE = 1e-7
DELTA_THRESHOLD = 1e-2
ALPHA = 1.0 - DAMPING

STATE = ["deltas", "page_rank", "nbr"]


class PREdge(EdgeKernel):
    """Unweighted: message = deltas[s] / out_degree(s) (algos.rs:225-231).
    Weighted (``weight_spec``): message = (deltas[s] / w_out(s)) · w(s,t)
    — the plus-times semiring via weight_combine="mul"; ``w_out`` is the
    per-node weighted out-degree precomputed by
    ``DistGraph.init_out_strength`` (each edge then carries its share of
    the source's delta, Σ_t w(s,t)/w_out(s) = 1 exactly as 1/out_degree
    sums to 1 unweighted)."""

    reduce = "sum"
    value_dtype = np.float64
    has_output_frontier = False

    def __init__(self, weight_spec: str | None = None):
        self.weight_spec = weight_spec
        self.weight_combine = "mul" if weight_spec else "add"

    def _denom(self, state, out_deg):
        return state["w_out"] if self.weight_spec else out_deg

    def source_values(self, state, out_deg):
        d = state["deltas"]
        dg = self._denom(state, out_deg)
        out = np.zeros_like(d)
        np.divide(d, dg, out=out, where=dg > 0)
        return out

    def source_values_at(self, state, out_deg, idx):
        # masked: only the frontier's deltas are divided (push path)
        d = state["deltas"][idx]
        dg = self._denom(state, out_deg)[idx]
        out = np.zeros_like(d)
        np.divide(d, dg, out=out, where=dg > 0)
        return out

    def apply(self, state, agg, touched, shard):
        # nbr was reset to 0 by the previous round's filter; agg is this
        # round's full gather (zeros where untouched)
        state["nbr"] = agg.astype(np.float64, copy=False)
        return None, {}


class PRFirstRound(VertexKernel):
    def __init__(self, one_over_n: float):
        self.one_over_n = one_over_n

    def update(self, state, mask, shard):
        delta = state["nbr"] * DAMPING + ALPHA
        state["nbr"] = np.zeros_like(delta)
        state["page_rank"] = state["page_rank"] + delta
        current = state["page_rank"]
        delta = delta - self.one_over_n
        state["deltas"] = delta
        keep = np.abs(delta) > (current + DELTA_THRESHOLD)
        return keep, {"sum_of_delta": float(delta.sum())}


class PRLater(VertexKernel):
    def update(self, state, mask, shard):
        delta = state["nbr"] * DAMPING
        state["nbr"] = np.zeros_like(delta)
        state["deltas"] = delta
        current = state["page_rank"]
        upd = np.abs(current) > current * DELTA_THRESHOLD
        pr = current.copy()
        pr[upd] += delta[upd]
        state["page_rank"] = pr
        return upd, {"sum_of_delta": float(delta.sum())}


class PRClassicRound(VertexKernel):
    """One round of the CLASSIC delta-PageRank variant (the semantics the
    Ligra paper intends and the reference's FirstRound threshold quirk
    defeats — see module docstring). Fixed point is the same
    ``r = 0.15 + 0.85·Σ r_u/d_u``; the frontier prunes converged vertices
    (``|delta| > 0.01·rank`` keeps), error is the L1 delta norm."""

    def update(self, state, mask, shard):
        delta = state["nbr"] * DAMPING
        state["nbr"] = np.zeros_like(delta)
        state["deltas"] = delta
        pr = state["page_rank"] + delta
        state["page_rank"] = pr
        keep = np.abs(delta) > np.abs(pr) * DELTA_THRESHOLD
        return keep, {"sum_of_delta": float(np.abs(delta).sum())}


def page_rank_classic(graph, max_iterations: int = 100,
                      tolerance: float = TOLERANCE,
                      weight_spec: str | None = None) -> dict:
    """Iterative-to-convergence variant used for benchmarking (the
    reference-exact variant stops after 2 rounds by construction). Same
    unnormalized fixed point; push/pull switching is exercised as the
    frontier shrinks. ``weight_spec`` runs the weighted gather (see
    PREdge) to ITS fixed point r = 0.15 + 0.85·Σ r_u·w(u,v)/w_out(u)."""
    t0 = time.perf_counter()
    graph.init_algo({
        "deltas": (np.float64, ALPHA),      # r_0 = delta_0 = 0.15 everywhere
        "page_rank": (np.float64, ALPHA),
        "nbr": (np.float64, 0.0),
    })
    if weight_spec:
        graph.init_out_strength(weight_spec)
    graph.set_frontier("all")
    graph.edges_scanned = 0
    edge_kernel = PREdge(weight_spec)
    round_kernel = PRClassicRound()
    iteration = 0
    error = float("inf")
    while iteration < max_iterations and graph.frontier_count:
        iteration += 1
        s = graph.edge_map_fused(edge_kernel, round_kernel, over="all")
        error = s["sum_of_delta"]
        if error < tolerance:
            break
    return {"iterations": iteration, "edges_scanned": graph.edges_scanned,
            "error": error, "wall_s": time.perf_counter() - t0,
            "state_names": ["page_rank"]}


def page_rank_delta(graph, max_iterations: int = 100,
                    checkpoint_dir: str | None = None,
                    checkpoint_every: int = 1, resume: bool = True,
                    weight_spec: str | None = None) -> dict:
    t0 = time.perf_counter()
    n = graph.n
    one_over_n = 1.0 / n
    edge_kernel = PREdge(weight_spec)
    iteration = 0
    man = ckpt.latest_checkpoint(checkpoint_dir, "pagerank") if (
        checkpoint_dir and resume) else None
    graph.init_algo({
        "deltas": (np.float64, one_over_n),
        "page_rank": (np.float64, 0.0),
        "nbr": (np.float64, 0.0),
    })
    if weight_spec:
        graph.init_out_strength(weight_spec)
    graph.edges_scanned = 0
    if man is not None:
        ckpt.restore_checkpoint(graph, man)
        iteration = man["iteration"]
        pending_error = man["loop_state"]["pending_error"]
        max_iterations = man["loop_state"]["remaining_iterations"]
    else:
        graph.set_frontier("all")
        graph.edge_map(edge_kernel)                       # round-1 edgeMap (full)
        s = graph.vertex_filter(PRFirstRound(one_over_n), over="all")
        pending_error = s["sum_of_delta"]
        iteration = 1
        if checkpoint_dir and checkpoint_every:
            ckpt.write_checkpoint(
                graph, checkpoint_dir, "pagerank", iteration, STATE,
                {"frontier_size": graph.frontier_count,
                 "edges_scanned": graph.edges_scanned, "error": pending_error,
                 "wall_s": time.perf_counter() - t0},
                {"pending_error": pending_error,
                 "remaining_iterations": max_iterations})

    later = PRLater()
    while True:
        error = pending_error                             # sum_of_delta.swap(0)
        max_iterations -= 1
        if error < TOLERANCE or max_iterations == 0:
            break
        graph.edge_map(edge_kernel)
        s = graph.vertex_filter(later, over="all")
        pending_error = s["sum_of_delta"]
        iteration += 1
        if checkpoint_dir and checkpoint_every and iteration % checkpoint_every == 0:
            ckpt.write_checkpoint(
                graph, checkpoint_dir, "pagerank", iteration, STATE,
                {"frontier_size": graph.frontier_count,
                 "edges_scanned": graph.edges_scanned, "error": pending_error,
                 "wall_s": time.perf_counter() - t0},
                {"pending_error": pending_error,
                 "remaining_iterations": max_iterations})
    return {"iterations": iteration, "edges_scanned": graph.edges_scanned,
            "error": error, "wall_s": time.perf_counter() - t0,
            "state_names": ["page_rank"]}


class _StdPRGather(EdgeKernel):
    """Standard-PageRank gather: xr(v) = sum over in-edges (u, v) of
    x(u)/out_deg(u); dangling sources emit nothing here (their mass is
    redistributed uniformly by the apply step)."""

    reduce = "sum"
    value_dtype = np.float64
    has_output_frontier = False

    def source_values(self, state, out_deg):
        return np.where(out_deg > 0,
                        state["x"] / np.maximum(out_deg, 1), 0.0)

    def source_values_at(self, state, out_deg, idx):
        od = out_deg[idx]
        return np.where(od > 0, state["x"][idx] / np.maximum(od, 1), 0.0)

    def apply(self, state, agg, touched, shard):
        state["xr"] = np.where(touched, agg, 0.0)
        return None, {}


class _StdPRApply(VertexKernel):
    """x := (1-d)/n + d*(xr + D/n) — the textbook normalized update with
    dangling-mass redistribution; the NEXT round's dangling mass rides
    the wave summary (per-shard sum of x over out_deg == 0 nodes), so
    the driver holds one scalar, never a vertex array."""

    def __init__(self, n: int, dangling_mass: float):
        self.n = n
        self.dm = dangling_mass

    def update(self, state, mask, shard):
        x = ALPHA / self.n + DAMPING * (state["xr"] + self.dm / self.n)
        state["x"] = x
        return None, {"dangling": float(x[shard.out_deg == 0].sum())}


class _DanglingProbe(VertexKernel):
    def update(self, state, mask, shard):
        return None, {"dangling":
                      float(state["x"][shard.out_deg == 0].sum())}


def page_rank_standard(graph, rounds: int = 6) -> dict:
    """STANDARD PageRank (Brin & Page 1998 as normalized by Langville &
    Meyer): x_{t+1}(v) = (1-d)/n + d*(sum_{u->v} x_t(u)/out(u) + D_t/n)
    with D_t the dangling mass — the probability-distribution variant
    the reference deliberately lacks (SURVEY §2.6 G3: no dangling
    redistribution, unnormalized teleport — preserved separately in
    page_rank_delta). Fixed ``rounds`` so the SQL oracle unrolls
    exactly; each round is one gather wave + one vertex wave with the
    dangling scalar riding the summaries. Total mass stays 1 (checked
    in tests), so scores are comparable across graphs."""
    t0 = time.perf_counter()
    n = graph.n
    graph.init_algo({
        "x": (np.float64, 1.0 / n),
        "xr": (np.float64, 0.0),
    })
    s = graph.vertex_map(_DanglingProbe(), over="all")
    dm = float(s.get("dangling", 0.0))
    gather = _StdPRGather()
    graph.edges_scanned = 0
    for _ in range(rounds):
        graph.set_frontier("all")
        graph.edge_map(gather)
        s = graph.vertex_map(_StdPRApply(n, dm), over="all")
        dm = float(s.get("dangling", 0.0))
    return {"rounds": rounds, "edges_scanned": graph.edges_scanned,
            "wall_s": time.perf_counter() - t0, "state_names": ["x"]}
