"""Greedy graph coloring (Jones & Plassmann 1993) — NEW vs the reference,
expressed through the engine's kernel surface; the GBBS/Ligra-family
benchmark suite's coloring application.

Runs on a SYMMETRIZED simple graph (like k-core/MIS/BC). Each round:

1. Still-uncolored nodes draw the SAME deterministic per-round priorities
   as MIS (``md5("{round}:{id}") % 2^63`` — algos/mis.round_priorities),
   and a node is SELECTED iff it is a strict priority minimum over its
   uncolored neighbourhood (no two adjacent nodes can both be selected,
   so same-round color choices never conflict; ties select neither and
   redraw — no livelock).
2. Selected nodes take the smallest color absent from their
   already-colored neighbourhood. Neighbour color sets travel as W
   63-bit OR-reduce bitmask words (bits 0..62 per word keep every mask
   non-negative in both numpy int64 and the oracle's BIGINT): one
   ``reduce="or"`` edgeMap per word, sources = colored nodes, targets =
   the selected set — the dense-mode early-exit makes each wave cost
   O(edges incident to the selected set), not O(m).

Because any new color is at most (current max color + 1) — the smallest
ABSENT value cannot skip past it — ``W = cur_max//63 + 2`` words always
cover the next assignment, so W grows with the palette, not the degree
bound. Colors are exact ints; the unrolled DuckDB oracle replicates the
priority sequence and the smallest-absent rule, reproducing the EXACT
same coloring (not merely some proper coloring).
"""

from __future__ import annotations

import time

import numpy as np
import ray

from ligrust_ray.algos.mis import round_priorities
from ligrust_ray.stages.kernels import EdgeKernel, VertexKernel

STATE = ["color", "prio"]
_BITS = 63                      # bits per mask word (sign bit never set)


class _DrawPriorities(VertexKernel):
    def __init__(self, round_no: int):
        self.round_no = round_no

    def update(self, state, mask, shard):
        ids = np.arange(shard.lo, shard.hi, dtype=np.int64)
        state["prio"] = round_priorities(self.round_no, ids)
        return None, {}


class _SelectUncolored(VertexKernel):
    """frontier := still-uncolored nodes."""

    def update(self, state, mask, shard):
        unc = state["color"] < 0
        return unc, {"uncolored": int(unc.sum())}


class _SelectMinima(EdgeKernel):
    """agg = min over UNCOLORED neighbours' priorities; a node becomes
    PENDING iff uncolored and (untouched or a strict minimum). Pending is
    marked as color == -2 (distinct from uncolored -1)."""

    reduce = "min"
    value_dtype = np.int64

    def source_values(self, state, out_deg):
        return state["prio"]

    def source_values_at(self, state, out_deg, idx):
        return state["prio"][idx]

    def target_active(self, state):
        return state["color"] < 0

    def apply(self, state, agg, touched, shard):
        unc = state["color"] < 0
        sel = unc & (~touched | (state["prio"] < agg))
        state["color"][sel] = -2
        return sel, {"selected": int(sel.sum())}


class _SelectColored(VertexKernel):
    """frontier := colored nodes (the mask-wave sources)."""

    def update(self, state, mask, shard):
        return state["color"] >= 0, {}


class _GatherMaskWord(EdgeKernel):
    """OR of (1 << (color - 63*word)) over colored neighbours, applied to
    the pending (-2) targets; the result lands in state['nbmask{w}']."""

    reduce = "or"
    value_dtype = np.int64
    has_output_frontier = False

    def __init__(self, word: int):
        self.word = word

    def _mask(self, color: np.ndarray) -> np.ndarray:
        rel = color - self.word * _BITS
        inw = (rel >= 0) & (rel < _BITS) & (color >= 0)
        out = np.zeros(len(color), dtype=np.int64)
        out[inw] = np.int64(1) << rel[inw]
        return out

    def source_values(self, state, out_deg):
        return self._mask(state["color"])

    def source_values_at(self, state, out_deg, idx):
        return self._mask(state["color"][idx])

    def target_active(self, state):
        return state["color"] == -2

    def apply(self, state, agg, touched, shard):
        pend = state["color"] == -2
        state[f"nbmask{self.word}"][pend] = agg[pend]
        return None, {}


class _FinishRound(VertexKernel):
    """One fused vertex pass closing a round: pending nodes take the
    smallest absent color across the W gathered words (lowest zero bit of
    the first non-full word), priorities for the NEXT round are drawn,
    and the returned keep-mask = still-uncolored is the next frontier —
    riding the same actor wave as the final mask gather
    (edge_map_fused)."""

    def __init__(self, next_round: int, n_words: int):
        self.next_round = next_round
        self.n_words = n_words

    def update(self, state, mask, shard):
        pend = np.flatnonzero(state["color"] == -2)
        if len(pend):
            color = np.full(len(pend), -1, dtype=np.int64)
            full = np.int64((1 << _BITS) - 1)
            for w in range(self.n_words):
                m = state[f"nbmask{w}"][pend]
                mu = m.astype(np.uint64)      # uint64: no overflow warning
                low = (~mu) & (mu + np.uint64(1))   # lowest zero bit
                cand = w * _BITS + np.log2(
                    low.astype(np.float64)).round().astype(np.int64)
                take = (color < 0) & (m != full)
                color[take] = cand[take]
            if (color < 0).any():
                raise RuntimeError("coloring: mask words exhausted "
                                   "(W sizing bug)")  # pragma: no cover
            state["color"][pend] = color
        ids = np.arange(shard.lo, shard.hi, dtype=np.int64)
        state["prio"] = round_priorities(self.next_round, ids)
        unc = state["color"] < 0
        c = state["color"]
        # per-shard palette max rides the same wave (keyed per partition —
        # driver scalars are SUMMED, a shared key would add maxes): keeps
        # the driver's word-count bound tracking the REAL palette instead
        # of rounds, so long tails never gather always-zero mask words
        return unc, {"uncolored": int(unc.sum()),
                     f"maxc_{shard.part}": int(c.max()) if len(c) else -1}


class _MaxColor(VertexKernel):
    """Per-shard palette max, keyed by partition (driver scalars are
    SUMMED across shards, so a shared key would add maxes together)."""

    def update(self, state, mask, shard):
        c = state["color"]
        return None, {f"maxc_{shard.part}": int(c.max()) if len(c) else -1}


def color_graph(graph, max_rounds: int = 200) -> dict:
    """Run to fixpoint; afterwards ``state['color']`` is a proper greedy
    coloring (exactly replicated by the SQL oracle). ``graph`` MUST be
    symmetrized and simple. Raises past ``max_rounds`` (keeps the engine
    inside the oracle's unroll depth)."""
    t0 = time.perf_counter()
    graph.init_algo({"color": (np.int64, -1), "prio": (np.int64, 0)})
    graph.edges_scanned = 0
    rounds = 0
    # Palette bound from the per-shard maxc scalars of each finish wave
    # (free — they ride the wave summary): a round's new colors cannot
    # exceed (current max + 1), so W = bound//63 + 2 words always cover
    # the next assignment while tracking the REAL palette (a rounds-based
    # bound gathered always-zero extra mask words on long round tails)
    cur_bound = -1
    words_alloc = 0
    graph.vertex_map(_DrawPriorities(1), over="all")
    graph.vertex_filter(_SelectUncolored(), over="all")
    # Per-round wave budget is the scaling cost on small graphs, so the
    # round is packed into 2 + (W-1) fused dispatches: [select minima +
    # switch frontier to colored] then [last mask gather + assign + draw
    # next priorities + uncolored re-filter], each one actor wave. The
    # kernel objects are STABLE across rounds (per-round inputs live in
    # shard state, not the kernels) so each fused wave can prefetch the
    # NEXT kernel's source values under its identity tag — the
    # alternating select/gather pair would otherwise miss the view cache
    # every wave and pay a make_view round trip each (4 waves/round -> 2).
    sel = _SelectMinima()
    gathers: list[_GatherMaskWord] = []
    while graph.frontier_count != 0:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"coloring did not converge in {max_rounds} rounds")
        n_words = (cur_bound + 1) // _BITS + 1
        if n_words > words_alloc:
            # init_state only ASSIGNS the named entries — existing
            # color/prio state is untouched by the added mask words
            graph.init_algo({f"nbmask{w}": (np.int64, 0)
                             for w in range(words_alloc, n_words)})
            words_alloc = n_words
        while len(gathers) < n_words:
            gathers.append(_GatherMaskWord(len(gathers)))
        graph.edge_map_fused(sel, _SelectColored(), over="all",
                             next_kernel=gathers[0])
        # mask-word gathers are INDEPENDENT (disjoint nbmask words, same
        # colored-source frontier): one batched two-wave dispatch instead
        # of (n_words - 2) sequential edge_map round trips
        graph.edge_map_multi(gathers[:n_words - 1])
        s = graph.edge_map_fused(gathers[n_words - 1],
                                 _FinishRound(rounds + 1, n_words),
                                 over="all", next_kernel=sel)
        cur_bound = max([cur_bound] + [v for k, v in s.items()
                                       if k.startswith("maxc_")])
    s = graph.vertex_map(_MaxColor(), over="all")
    n_colors = 1 + max(v for k, v in s.items() if k.startswith("maxc_"))
    return {"rounds": rounds, "colors": n_colors,
            "edges_scanned": graph.edges_scanned,
            "wall_s": time.perf_counter() - t0, "state_names": ["color"]}


# ---------------------------------------------------------------------------
# Single-task fast path (same gate economics as walks/truss/matching): below
# a few million edges the per-round actor-wave dispatch (2+W waves x ~36 ms,
# BASELINE §2d) dwarfs the numpy compute, so the identical round/selection/
# smallest-absent semantics run vectorised in ONE Ray task over the full
# symmetric edge list. Parity with the kernel path is test-enforced.

COLOR_SINGLE_TASK_MAX = 1 << 22
_I64_MAX = np.iinfo(np.int64).max


def _color_arrays(n: int, src: np.ndarray, dst: np.ndarray,
                  max_rounds: int) -> tuple[np.ndarray, int]:
    """Exact JP rounds over a SYMMETRIC simple edge list: per round,
    uncolored strict-priority minima over uncolored neighbours select,
    then take the mex of their colored neighbourhoods. Returns (color,
    rounds)."""
    color = np.full(n, -1, dtype=np.int64)
    ids = np.arange(n, dtype=np.int64)
    rounds = 0
    while (color < 0).any():
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"coloring did not converge in {max_rounds} rounds")
        prio = round_priorities(rounds, ids)
        unc = color < 0
        m = unc[src] & unc[dst]
        agg = np.full(n, _I64_MAX, dtype=np.int64)
        touched = np.zeros(n, dtype=bool)
        if m.any():
            np.minimum.at(agg, dst[m], prio[src[m]])
            touched[dst[m]] = True
        sel = unc & (~touched | (prio < agg))
        # mex over colored neighbours, per selected target (vectorised:
        # sort-dedupe (target, color) pairs, first position where the
        # 0,1,2,... run breaks)
        em = (color[src] >= 0) & sel[dst]
        mex = np.zeros(n, dtype=np.int64)
        if em.any():
            tgt, c = dst[em], color[src[em]]
            order = np.lexsort((c, tgt))
            tgt, c = tgt[order], c[order]
            keep = np.ones(len(tgt), dtype=bool)
            keep[1:] = (tgt[1:] != tgt[:-1]) | (c[1:] != c[:-1])
            tgt, c = tgt[keep], c[keep]
            new_seg = np.r_[True, tgt[1:] != tgt[:-1]]
            starts = np.flatnonzero(new_seg)
            seg_id = np.cumsum(new_seg) - 1
            pos = np.arange(len(tgt)) - starts[seg_id]
            seg_len = np.diff(np.r_[starts, len(tgt)])
            mex_seg = seg_len.astype(np.int64)   # full 0..k-1 run
            mism = np.flatnonzero(c != pos)
            if len(mism):
                first = np.full(len(starts), _I64_MAX, dtype=np.int64)
                np.minimum.at(first, seg_id[mism], pos[mism])
                has = first < _I64_MAX
                mex_seg[has] = first[has]
            mex[tgt[starts]] = mex_seg
        color[sel] = mex[sel]
    return color, rounds


@ray.remote
def _color_task(n: int, blocks: list, max_rounds: int) -> np.ndarray:
    import pyarrow as pa

    # blocks arrive as object refs — fetched zero-copy in the task, the
    # driver never materializes the edge set
    blocks = ray.get(list(blocks))
    tabs = [t for t in blocks if t.num_rows]
    if not tabs:
        return np.zeros(n, dtype=np.int64)   # edgeless: all color 0 rnd 1
    t = pa.concat_tables([tb.select(["v", "w"]) for tb in tabs])
    src = t.column("v").to_numpy().astype(np.int64)
    dst = t.column("w").to_numpy().astype(np.int64)
    return _color_arrays(n, src, dst, max_rounds)[0]


def color_graph_fast(n: int, sym_edges, max_rounds: int = 200
                     ) -> np.ndarray:
    """Single-task JP coloring over a symmetric (v, w) edge Dataset;
    callers gate on COLOR_SINGLE_TASK_MAX edges."""
    import ray
    import ray.data

    if isinstance(sym_edges, ray.data.Dataset):
        blocks = sym_edges.to_arrow_refs()
    else:
        blocks = [ray.put(sym_edges)]
    return ray.get(_color_task.remote(n, blocks, max_rounds))
