"""Maximal independent set (Luby 1986) — NEW algorithm, not in the
reference, expressed entirely through the engine's kernel surface
(U1 EdgeKernel + U2 VertexKernel, SURVEY.md §2.5), like the Ligra MIS
application (Shun & Blelloch 2013 §6).

Semantics: runs on a SYMMETRIZED simple graph (undirected edges both
directions, self-loops dropped — same requirement as k-core). Each round
every still-active node draws a fresh deterministic 63-bit priority
``md5_number_lower("{round}:{id}") % 2^63`` (bit-identical to the DuckDB
oracle — see hashing.py for the verified byte-order) and enters the MIS
iff its priority is a STRICT local minimum over its active neighbourhood
(nodes with no active neighbour always enter). Selected nodes' neighbours
are then deactivated. Strict-minimum means an (astronomically unlikely)
priority tie selects neither endpoint that round — they redraw next round,
so there is no livelock and the fixpoint is a valid maximal independent
set for ANY priority sequence; determinism of the sequence is what makes
the unrolled SQL oracle replicate the exact same set.

Two edgeMap waves per round (select, then deactivate) — the same
push/pull/hub machinery as CC/BFS, exercised with reduce="min".
"""

from __future__ import annotations

import time

import numpy as np

from ligrust_ray.dataops.hashing import md5_u64_lower_many
from ligrust_ray.stages.kernels import EdgeKernel, VertexKernel

STATE = ["active", "in_mis", "prio"]

_MASK63 = np.uint64((1 << 63) - 1)


def round_priorities(round_no: int, ids: np.ndarray) -> np.ndarray:
    """Deterministic per-round priorities, replicated by the SQL oracle as
    ``md5_number_lower(round || ':' || id) % 2^63`` (nonneg int64 so the
    numpy signed compare and DuckDB's unsigned compare agree)."""
    items = [f"{round_no}:{i}".encode() for i in ids]
    return (md5_u64_lower_many(items) & _MASK63).astype(np.int64)


class _DrawPriorities(VertexKernel):
    """state['prio'] := fresh round-tagged priorities for the local range
    (only active nodes' values are ever read, but the draw is O(n_local)
    like every other per-round vertex pass)."""

    def __init__(self, round_no: int):
        self.round_no = round_no

    def update(self, state, mask, shard):
        ids = np.arange(shard.lo, shard.hi, dtype=np.int64)
        state["prio"] = round_priorities(self.round_no, ids)
        return None, {}


class _SelectActive(VertexKernel):
    """frontier := still-active nodes."""

    def update(self, state, mask, shard):
        return state["active"].copy(), {"active": int(state["active"].sum())}


class _SelectMinima(EdgeKernel):
    """Wave 1: agg = min over ACTIVE neighbours' priorities; a node joins
    the MIS iff active and (untouched — no active neighbour — or a strict
    minimum). Output frontier = the newly selected set (feeds wave 2)."""

    reduce = "min"
    value_dtype = np.int64

    def source_values(self, state, out_deg):
        return state["prio"]

    def source_values_at(self, state, out_deg, idx):
        return state["prio"][idx]

    def target_active(self, state):
        return state["active"]

    def apply(self, state, agg, touched, shard):
        active = state["active"]
        sel = active & (~touched | (state["prio"] < agg))
        state["in_mis"] = state["in_mis"] | sel
        state["active"] = active & ~sel
        return sel, {"selected": int(sel.sum())}


class _DeactivateNeighbors(EdgeKernel):
    """Wave 2: neighbours of the freshly selected set leave the active
    set (they can never be independent of a selected node)."""

    reduce = "min"
    value_dtype = np.int64
    has_output_frontier = False   # frontier reset via _SelectActive

    def source_values(self, state, out_deg):
        return np.ones(len(out_deg), dtype=np.int64)

    def source_values_at(self, state, out_deg, idx):
        return np.ones(len(idx), dtype=np.int64)

    def target_active(self, state):
        return state["active"]

    def apply(self, state, agg, touched, shard):
        state["active"] = state["active"] & ~touched
        return None, {"deactivated": int(touched.sum())}


def mis(graph, max_rounds: int = 200) -> dict:
    """Run to fixpoint; afterwards ``state['in_mis']`` marks a maximal
    independent set. ``graph`` MUST be a symmetrized simple graph (see
    module docstring). Expected O(log n) rounds (Luby); the cap raises
    rather than returning a non-maximal set."""
    t0 = time.perf_counter()
    graph.init_algo({"active": (np.bool_, True),
                     "in_mis": (np.bool_, False),
                     "prio": (np.int64, 0)})
    select = _SelectMinima()
    deact = _DeactivateNeighbors()
    graph.edges_scanned = 0
    rounds = 0
    graph.vertex_filter(_SelectActive(), over="all")
    while graph.frontier_count != 0:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(f"mis did not converge in {max_rounds} "
                               "rounds (expected O(log n))")
        graph.vertex_map(_DrawPriorities(rounds), over="all")
        graph.edge_map(select)           # frontier -> newly selected
        if graph.frontier_count:
            graph.edge_map(deact)        # kill their neighbours
        graph.vertex_filter(_SelectActive(), over="all")
    return {"rounds": rounds, "edges_scanned": graph.edges_scanned,
            "wall_s": time.perf_counter() - t0, "state_names": STATE}
