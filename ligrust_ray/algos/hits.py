"""HITS (Kleinberg hubs & authorities) — fixed-round, integer-exact.

The directed companion to the two-phase sum-edgeMap of Brandes BC
(algos/betweenness.py), run across the forward/reversed twin graphs of
algos/scc.py: per round t,

    h_t(v) = sum over out-neighbours w of a_{t-1}(w)   (reversed graph)
    a_t(v) = sum over in-neighbours  u of h_t(u)       (forward graph)

with a_0 = 1 and NO per-round normalisation: every score stays a
non-negative integer (multi-edges contribute multiplicity, same as the
PageRank gather), so the driver hash-compare is exact. Scores grow like
(d_max)^rounds; the engine sums in float64 and RAISES if any partial sum
could reach 2^53, rather than silently losing exactness — at that scale
callers should drop to rounds=2 or normalise externally.

State moves between the twins via scc.transfer_state (partition-aligned
object-ref handoff; identical bounds by construction).
"""

from __future__ import annotations

import time

import numpy as np

from ligrust_ray.algos.scc import transfer_state
from ligrust_ray.stages.kernels import EdgeKernel

STATE = ["h", "a"]
_EXACT_LIMIT = float(1 << 53)   # float64 integer-exactness bound


class SumGather(EdgeKernel):
    """agg[target] = sum of state[src_key] over in-edges (of whichever
    graph this runs on); result into state[out_key], 0 where untouched."""

    reduce = "sum"
    value_dtype = np.float64
    has_output_frontier = False

    def __init__(self, src_key: str, out_key: str):
        self.src_key = src_key
        self.out_key = out_key

    def source_values(self, state, out_deg):
        return state[self.src_key]

    def source_values_at(self, state, out_deg, idx):
        return state[self.src_key][idx]

    def apply(self, state, agg, touched, shard):
        out = np.where(touched, agg, 0.0)
        state[self.out_key] = out
        return None, {"max_sum": float(out.max()) if len(out) else 0.0}


def hits(g_fwd, g_rev, rounds: int = 3) -> dict:
    """Run ``rounds`` HITS rounds; final h/a land in g_fwd state."""
    t0 = time.perf_counter()
    if g_fwd.n != g_rev.n or g_fwd.nparts != g_rev.nparts:
        raise ValueError("g_rev must mirror g_fwd (same n, num_partitions)")
    g_fwd.init_algo({"a": (np.float64, 1.0), "h": (np.float64, 0.0)})
    g_rev.init_algo({"a": (np.float64, 1.0), "h": (np.float64, 0.0)})
    h_kernel = SumGather("a", "h")   # on g_rev: in-nbrs there = out-nbrs here
    a_kernel = SumGather("h", "a")   # on g_fwd: plain in-neighbour gather
    for t in range(rounds):
        if t > 0:
            transfer_state(g_fwd, g_rev, {"a": "a"})
        g_rev.set_frontier("all")
        s = g_rev.edge_map(h_kernel)
        transfer_state(g_rev, g_fwd, {"h": "h"})
        g_fwd.set_frontier("all")
        s2 = g_fwd.edge_map(a_kernel)
        # per-partition maxes are SUMMED by _absorb — the true max is <=
        # that sum, so staying under 2^53 guarantees every sum was exact
        if max(s.get("max_sum", 0.0), s2.get("max_sum", 0.0)) \
                >= _EXACT_LIMIT:
            raise RuntimeError(
                f"HITS round {t + 1} scores reach the float64 integer-"
                "exactness bound (2^53); reduce rounds or normalise")
    return {"rounds": rounds, "wall_s": time.perf_counter() - t0,
            "state_names": STATE}


class NormSumGather(SumGather):
    """Degree-normalized gather: agg[target] = sum over in-edges of
    state[src_key]/out_deg(src) — the random-walk (SALSA) counterpart
    of SumGather; zero-out-degree sources emit nothing."""

    def source_values(self, state, out_deg):
        return np.where(out_deg > 0,
                        state[self.src_key] / np.maximum(out_deg, 1), 0.0)

    def source_values_at(self, state, out_deg, idx):
        od = out_deg[idx]
        return np.where(od > 0,
                        state[self.src_key][idx] / np.maximum(od, 1), 0.0)

    def apply(self, state, agg, touched, shard):
        state[self.out_key] = np.where(touched, agg, 0.0)
        return None, {}


def salsa(g_fwd, g_rev, rounds: int = 3) -> dict:
    """SALSA (Lempel & Moran WWW'00): the random-walk HITS — per round,
    h(i) = sum over out-nbrs k of a(k)/indeg(k) (gathered on the
    reversed twin, where the normalizing degree IS its out-degree), then
    a(j) = sum over in-nbrs i of h(i)/outdeg(i) (forward twin). a_0 = 1,
    no per-round normalization (mass is conserved by the stochastic
    matrices up to degree-0 leakage), fixed rounds so the SQL oracle
    unrolls exactly; scores bounded by n so float64 is safe at any
    round count."""
    t0 = time.perf_counter()
    if g_fwd.n != g_rev.n or g_fwd.nparts != g_rev.nparts:
        raise ValueError("g_rev must mirror g_fwd (same n, num_partitions)")
    g_fwd.init_algo({"a": (np.float64, 1.0), "h": (np.float64, 0.0)})
    g_rev.init_algo({"a": (np.float64, 1.0), "h": (np.float64, 0.0)})
    h_kernel = NormSumGather("a", "h")
    a_kernel = NormSumGather("h", "a")
    for t in range(rounds):
        if t > 0:
            transfer_state(g_fwd, g_rev, {"a": "a"})
        g_rev.set_frontier("all")
        g_rev.edge_map(h_kernel)
        transfer_state(g_rev, g_fwd, {"h": "h"})
        g_fwd.set_frontier("all")
        g_fwd.edge_map(a_kernel)
    return {"rounds": rounds, "wall_s": time.perf_counter() - t0,
            "state_names": STATE}
