"""Personalized PageRank — fixed-round power iteration from one seed.

The random-walk-with-restart scoring used for seed-based page discovery:
p_0 = e_s;  p_{t+1}(v) = 0.15 * e_s(v) + 0.85 * sum over in-edges (u, v)
of p_t(u) / outdeg(u) (multi-edges contribute multiplicity, dangling mass
vanishes — both exactly as the reference-semantics PageRank gather,
algos/pagerank.py / reference algos.rs:225-231). Fixed ``rounds`` rather
than convergence so the SQL oracle can unroll the identical computation;
the contract renders floor(p * 1e6 + 0.5), the rounding convention shared
with pagerank_events / events_bc, so only a last-ulp sum-order
coincidence at a .5 ppm boundary could ever differ.
"""

from __future__ import annotations

import time

import numpy as np

from ligrust_ray.stages.kernels import EdgeKernel, VertexKernel

STATE = ["p"]
DAMPING = 0.85
ALPHA = 1.0 - DAMPING


class PPREdge(EdgeKernel):
    reduce = "sum"
    value_dtype = np.float64
    has_output_frontier = False

    def __init__(self, source: int):
        self.source = source

    def source_values(self, state, out_deg):
        return np.where(out_deg > 0,
                        state["p"] / np.maximum(out_deg, 1), 0.0)

    def source_values_at(self, state, out_deg, idx):
        od = out_deg[idx]
        return np.where(od > 0, state["p"][idx] / np.maximum(od, 1), 0.0)

    def apply(self, state, agg, touched, shard):
        nbr = np.where(touched, agg, 0.0)
        e_s = np.zeros(shard.nloc, dtype=np.float64)
        if shard.lo <= self.source < shard.hi:
            e_s[self.source - shard.lo] = 1.0
        state["p"] = ALPHA * e_s + DAMPING * nbr
        return None, {}


def personalized_page_rank(g, source: int = 0, rounds: int = 4) -> dict:
    """Run ``rounds`` synchronous PPR gathers; scores land in state 'p'."""
    t0 = time.perf_counter()
    src = int(source)

    def seed(lo: int, hi: int) -> np.ndarray:
        p = np.zeros(hi - lo, dtype=np.float64)
        if lo <= src < hi:
            p[src - lo] = 1.0
        return p

    g.init_algo({"p": seed})
    kernel = PPREdge(src)
    for _ in range(rounds):
        g.set_frontier("all")
        g.edge_map(kernel)
    return {"rounds": rounds, "wall_s": time.perf_counter() - t0,
            "state_names": STATE}


class TrustRankEdge(EdgeKernel):
    """TrustRank (Gyongyi/Garcia-Molina/Pedersen VLDB'04): PageRank whose
    teleport mass is restricted to a trusted SEED set — p_{t+1} = 0.15 *
    e_S + 0.85 * gather, e_S uniform over seeds. The seed predicate is
    id % seed_mod == 0 (a deterministic stand-in for an audited
    whitelist), shard-locally computable so no seed table ships."""

    reduce = "sum"
    value_dtype = np.float64
    has_output_frontier = False

    def __init__(self, seed_mod: int, n_seeds: int):
        self.seed_mod = int(seed_mod)
        self.n_seeds = int(n_seeds)

    def source_values(self, state, out_deg):
        return np.where(out_deg > 0,
                        state["p"] / np.maximum(out_deg, 1), 0.0)

    def source_values_at(self, state, out_deg, idx):
        od = out_deg[idx]
        return np.where(od > 0, state["p"][idx] / np.maximum(od, 1), 0.0)

    def apply(self, state, agg, touched, shard):
        nbr = np.where(touched, agg, 0.0)
        ids = np.arange(shard.lo, shard.hi, dtype=np.int64)
        e_s = np.where(ids % self.seed_mod == 0,
                       1.0 / self.n_seeds, 0.0)
        state["p"] = ALPHA * e_s + DAMPING * nbr
        return None, {}


def trust_rank(g, seed_mod: int = 16, rounds: int = 4) -> dict:
    """Run ``rounds`` synchronous TrustRank gathers; scores land in state
    'p'. n_seeds = |{id in [0, n) : id % seed_mod == 0}| = ceil(n/mod),
    exact on both engine and oracle sides."""
    t0 = time.perf_counter()
    n_seeds = (g.n + seed_mod - 1) // seed_mod

    def seed(lo: int, hi: int) -> np.ndarray:
        ids = np.arange(lo, hi, dtype=np.int64)
        return np.where(ids % seed_mod == 0, 1.0 / n_seeds, 0.0)

    g.init_algo({"p": seed})
    kernel = TrustRankEdge(seed_mod, n_seeds)
    for _ in range(rounds):
        g.set_frontier("all")
        g.edge_map(kernel)
    return {"rounds": rounds, "n_seeds": n_seeds,
            "wall_s": time.perf_counter() - t0, "state_names": STATE}


KATZ_ALPHA = 0.05    # < 1/lambda_max for any graph this alpha targets


class KatzEdge(EdgeKernel):
    """Katz centrality, truncated power series: x_{t+1} = 1 + alpha *
    sum over in-edges (u, v) of x_t(u) — no degree normalization
    (multi-edges contribute multiplicity), beta = 1."""

    reduce = "sum"
    value_dtype = np.float64
    has_output_frontier = False

    def source_values(self, state, out_deg):
        return state["x"]

    def source_values_at(self, state, out_deg, idx):
        return state["x"][idx]

    def apply(self, state, agg, touched, shard):
        nbr = np.where(touched, agg, 0.0)
        state["x"] = 1.0 + KATZ_ALPHA * nbr
        return None, {}


def katz(g, rounds: int = 4) -> dict:
    """Run ``rounds`` synchronous Katz gathers from x_0 = 1; scores land
    in state 'x'."""
    t0 = time.perf_counter()
    g.init_algo({"x": lambda lo, hi: np.ones(hi - lo, dtype=np.float64)})
    kernel = KatzEdge()
    for _ in range(rounds):
        g.set_frontier("all")
        g.edge_map(kernel)
    return {"rounds": rounds, "wall_s": time.perf_counter() - t0,
            "state_names": ["x"]}


class _EigenGather(EdgeKernel):
    """Power-iteration gather: xr(v) = sum over in-edges (u, v) of x(u)
    (multi-edges contribute multiplicity, like KatzEdge). The per-shard
    L1 partial rides the wave summary so the driver normalises with one
    scalar — no collect_state between rounds."""

    reduce = "sum"
    value_dtype = np.float64
    has_output_frontier = False

    def source_values(self, state, out_deg):
        return state["x"]

    def source_values_at(self, state, out_deg, idx):
        return state["x"][idx]

    def apply(self, state, agg, touched, shard):
        raw = np.where(touched, agg, 0.0)
        state["xr"] = raw
        return None, {"l1": float(np.abs(raw).sum())}


class _EigenScale(VertexKernel):
    """x := xr / tot — the L1 normalisation step of power iteration.
    ``tot`` is the driver-summed global L1 of the raw gather (0 handled
    upstream: tot == 0 means every raw value is 0, any divisor works)."""

    def __init__(self, tot: float):
        self.tot = tot

    def update(self, state, mask, shard):
        state["x"] = state["xr"] / self.tot
        return None, {}


def eigencentrality(g, rounds: int = 4) -> dict:
    """L1-normalised power iteration for the dominant eigenvector of the
    (in-edge) adjacency operator: x_{t+1} = A^T x_t / ||A^T x_t||_1 from
    x_0 = 1. Unlike HITS (unnormalised, integer-exact) this is the
    classic eigenvector-centrality score whose scale is pinned each
    round; scores land in state 'x'. Two actor waves per round (gather +
    scale), L1 reduced from per-shard partials on the driver."""
    t0 = time.perf_counter()
    g.init_algo({"x": lambda lo, hi: np.ones(hi - lo, dtype=np.float64),
                 "xr": lambda lo, hi: np.zeros(hi - lo, dtype=np.float64)})
    kernel = _EigenGather()
    for _ in range(rounds):
        g.set_frontier("all")
        s = g.edge_map(kernel)
        tot = float(s.get("l1", 0.0))
        g.vertex_map(_EigenScale(tot if tot > 0.0 else 1.0), over="all")
    return {"rounds": rounds, "wall_s": time.perf_counter() - t0,
            "state_names": ["x"]}
