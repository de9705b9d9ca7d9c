"""Partitioned graph state: CSR shard actors + the DistGraph handle.

The reference pins the whole CSR in shared memory (mmap,
/root/reference/src/graph.rs:383-417) and runs rayon kernels over it with
per-vertex state in atomic arrays. Our distributed analog:

- ``CsrShard`` — one Ray actor per contiguous vertex range, holding that
  range's out-CSR and in-CSR as NumPy views over Arrow parquet buffers
  (loaded ONCE in ``__init__`` — the "load once, query many" mmap analog)
  plus the range's vertex-state arrays. This is the one place we drop below
  the Dataset API: iterative frontier kernels mutate a shared per-vertex
  index thousands of times, which ``map_batches`` cannot express without
  re-shipping state every wave.
- ``DistGraph`` — the driver-side handle: actor list, partition bounds,
  frontier bookkeeping, and the edge_map/vertex_map/vertex_filter
  primitives (see stages/kernels.py for kernel specs and semantics).

Scale notes:
- All exchanges are object-store refs; the driver never materialises
  per-vertex data (message payloads travel actor->actor via
  ``num_returns``-split refs; state views travel as per-partition slices).
- Pull-mode reads are partition-aligned: each shard precomputes, at load
  time, which source partitions its in-lists reference and a compact
  index into the concatenation of just those ranges, so a shard fetches
  only the state slices it needs (NOT a full-graph broadcast).
- Hub skew: id assignment hashes urls into buckets (pipelines/build.py), so
  hub pages land in uniformly-random ranges; within a shard, gathers are
  vectorised segment reductions, so a single hub's in-list costs O(degree)
  sequential bandwidth, not a serialization point.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

INT_SENTINEL = np.iinfo(np.int64).max


def _weighted(kernel, vals: np.ndarray, ew: np.ndarray) -> np.ndarray:
    """Combine per-edge source values with derived edge weights under the
    kernel's semiring: "add" (min-plus / weighted accumulate) or "mul"
    (plus-times — weighted PageRank)."""
    return vals * ew if kernel.weight_combine == "mul" else vals + ew


def _multi_range(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenate [s, s+l) ranges, vectorised."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    rep = np.repeat(starts - np.concatenate(([0], np.cumsum(lens)[:-1])), lens)
    return rep + np.arange(total, dtype=np.int64)


def _load_csr_part(path: str, id_dtype=np.int64) -> tuple[np.ndarray, np.ndarray]:
    """part parquet -> (indptr[len+1] local, flat neighbor ids global).

    ``id_dtype=np.int32`` when n < 2^31: gather kernels are memory-bandwidth
    bound, so halving index width is a direct throughput win."""
    t = pq.read_table(path, columns=["neighbors", "degree"])
    col = t.column("neighbors").combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(id_dtype, copy=False)
    deg = t.column("degree").to_numpy().astype(np.int64, copy=False)
    indptr = np.zeros(len(deg) + 1, dtype=np.int64)
    np.cumsum(deg, out=indptr[1:])
    return indptr, flat


def _segment_reduce(reduce: str, indptr: np.ndarray, w: np.ndarray,
                    contrib_mask: np.ndarray | None, value_dtype,
                    tgt_idx: np.ndarray | None = None
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Per-target reduction over in-list segments.

    ``w``: per-edge value; ``contrib_mask``: per-edge "source in frontier"
    (``None`` = full frontier, every edge contributes). Returns
    (agg[nloc], touched[nloc]). Deterministic: accumulation follows flat
    (source-ascending) order, mirroring the oracle.
    """
    nloc = len(indptr) - 1
    deg = np.diff(indptr)
    ne = deg > 0
    starts = indptr[:-1][ne]
    if contrib_mask is None:
        touched = ne
    else:
        # np.add over bool == logical OR per segment: "any source active"
        touched = np.zeros(nloc, dtype=bool)
        if w.size:
            touched[ne] = np.add.reduceat(contrib_mask, starts)
    if reduce == "sum":
        # single-pass segment sum over the CSR layout (reduceat), no
        # per-edge target-index array — gather kernels are bandwidth bound
        if contrib_mask is not None:
            w = np.where(contrib_mask, w, 0.0)
        agg = np.zeros(nloc, dtype=np.float64)
        if w.size:
            agg[ne] = np.add.reduceat(w, starts)
    elif reduce == "min":
        if contrib_mask is not None:
            w = np.where(contrib_mask, w, INT_SENTINEL)
        agg = np.full(nloc, INT_SENTINEL, dtype=np.int64)
        if w.size:
            agg[ne] = np.minimum.reduceat(w, starts)
        touched = agg < INT_SENTINEL
    elif reduce == "or":
        # bitwise OR (bit-parallel multi-source algorithms, e.g. Radii):
        # identity 0, associative, order-free
        if contrib_mask is not None:
            w = np.where(contrib_mask, w, 0)
        agg = np.zeros(nloc, dtype=np.int64)
        if w.size:
            agg[ne] = np.bitwise_or.reduceat(w.astype(np.int64), starts)
    elif reduce == "mode":
        # most frequent value with smallest-value tiebreak, per target.
        # Single np.sort of a composite (target, label) key — we never need
        # the permutation, and one key sort is ~3x cheaper than lexsort,
        # which dominates label-propagation iterations.
        if tgt_idx is None:
            tgt_idx = np.repeat(np.arange(nloc, dtype=np.int64), deg)
        if contrib_mask is None:
            t_i, lab = tgt_idx, w.astype(np.int64)
        else:
            t_i = tgt_idx[contrib_mask]
            lab = w[contrib_mask].astype(np.int64)
        agg = np.full(nloc, INT_SENTINEL, dtype=np.int64)
        touched = np.zeros(nloc, dtype=bool)
        if t_i.size:
            lab_min = int(lab.min())
            lab_span = int(lab.max()) + 1
            if lab_min >= 0 and nloc * lab_span < (1 << 62):
                key = np.sort(t_i * lab_span + lab)
                run_start = np.flatnonzero(
                    np.concatenate(([True], key[1:] != key[:-1])))
                run_key = key[run_start]
                run_t = run_key // lab_span
                run_l = run_key - run_t * lab_span
            else:
                # composite key would overflow int64 (or labels are
                # negative): lexsort fallback, runs on the pair arrays
                order = np.lexsort((lab, t_i))
                st, sl = t_i[order], lab[order]
                run_start = np.flatnonzero(np.concatenate(
                    ([True], (st[1:] != st[:-1]) | (sl[1:] != sl[:-1]))))
                run_t = st[run_start]
                run_l = sl[run_start]
            run_cnt = np.diff(np.append(run_start, t_i.size))
            # Winner per target WITHOUT another sort: runs are already
            # (t asc, label asc), so per contiguous target segment take the
            # max count, then the first (= smallest-label) run hitting it —
            # three reduceat/compare passes over the runs.
            tstart = np.flatnonzero(
                np.concatenate(([True], run_t[1:] != run_t[:-1])))
            seg_sizes = np.diff(np.append(tstart, run_t.size))
            seg = np.repeat(np.arange(len(tstart)), seg_sizes)
            max_per_seg = np.maximum.reduceat(run_cnt, tstart)
            idx = np.where(run_cnt == max_per_seg[seg],
                           np.arange(run_t.size), run_t.size)
            first = np.minimum.reduceat(idx, tstart)
            uniq_t = run_t[tstart]
            agg[uniq_t] = run_l[first]
            touched[uniq_t] = True
    else:  # pragma: no cover
        raise ValueError(f"unknown reduce {reduce}")
    return agg, touched


def _merge_hub_partials_rows(reduce: str, parts: list, lo: int, hi: int
                             ) -> dict:
    """Merge per-chunk hub partials into {hub: (value, touched)} for hubs
    homed in [lo, hi). ``parts`` is the per-shard lists of
    (hub, *partial) rows (sum/min: (hub, val, touched); mode: (hub,
    labels, counts)). Runs INSIDE the home shard so the hub wave overlaps
    the main pull wave instead of serialising through a driver merge."""
    merged: dict = {}
    for plist in parts:
        for row in plist:
            if lo <= row[0] < hi:
                merged.setdefault(row[0], []).append(row[1:])
    out: dict = {}
    for hub, ps in merged.items():
        if reduce == "sum":
            out[hub] = (float(sum(v for v, _ in ps)), any(t for _, t in ps))
        elif reduce == "min":
            vals = [v for v, t in ps if t]
            out[hub] = (min(vals) if vals else INT_SENTINEL, bool(vals))
        elif reduce == "or":
            vals = [v for v, t in ps if t]
            acc = 0
            for v in vals:
                acc |= int(v)
            out[hub] = (acc, bool(vals))
        else:  # mode: merge label counts, argmax w/ min-label tiebreak
            lab = np.concatenate([p[0] for p in ps])
            cnt = np.concatenate([p[1] for p in ps])
            if lab.size == 0:
                out[hub] = (INT_SENTINEL, False)
                continue
            order = np.argsort(lab, kind="stable")
            lab, cnt = lab[order], cnt[order]
            starts = np.flatnonzero(
                np.concatenate(([True], lab[1:] != lab[:-1])))
            ulab = lab[starts]
            ucnt = np.add.reduceat(cnt, starts)
            win = np.lexsort((ulab, -ucnt))[0]
            out[hub] = (int(ulab[win]), True)
    return out


def _combine_by_key(reduce: str, keys: np.ndarray, vals: np.ndarray
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Partial combiner for push messages: (dst, val) -> unique dst + agg."""
    if keys.size == 0:
        return keys, vals
    order = np.argsort(keys, kind="stable")
    k, v = keys[order], vals[order]
    run = np.empty(k.size, dtype=bool)
    run[0] = True
    run[1:] = k[1:] != k[:-1]
    starts = np.flatnonzero(run)
    uk = k[starts]
    if reduce == "sum":
        # deterministic: np.add.reduceat sums each run in order
        uv = np.add.reduceat(v, starts)
    elif reduce == "min":
        uv = np.minimum.reduceat(v, starts)
    elif reduce == "or":
        uv = np.bitwise_or.reduceat(v.astype(np.int64), starts)
    else:
        raise ValueError(f"reduce {reduce} cannot be pushed (not associative "
                         "over partial frontiers); use dense/pull mode")
    return uk, uv


@ray.remote
class CsrShard:
    """One vertex-range partition: CSR (both directions) + vertex state."""

    def __init__(self, part: int, bounds: list[int], graph_dir: str):
        self.part = part
        self.bounds = np.asarray(bounds, dtype=np.int64)
        self.lo = int(bounds[part])
        self.hi = int(bounds[part + 1])
        self.nloc = self.hi - self.lo
        self.nparts = len(bounds) - 1
        id_dtype = np.int32 if int(bounds[-1]) < (1 << 31) else np.int64
        self.out_indptr, self.out_flat = _load_csr_part(
            os.path.join(graph_dir, "out", f"part-{part:05d}.parquet"), id_dtype)
        self.in_indptr, self.in_flat = _load_csr_part(
            os.path.join(graph_dir, "in", f"part-{part:05d}.parquet"), id_dtype)
        self.out_deg = np.diff(self.out_indptr)
        self._in_tgt_idx: np.ndarray | None = None   # lazy (mode reduce only)
        # hub spill chunks held by THIS shard (skew-aware splitting,
        # pipelines/build.py): list of (hub_global_id, src_ids)
        import glob as _glob

        self.hub_chunks: list[tuple[int, np.ndarray]] = []
        for f in sorted(_glob.glob(os.path.join(graph_dir, "in",
                                                "hubspill-*.parquet"))):
            t = pq.read_table(f)
            hold = t.column("holder").to_numpy()
            mine = hold == part
            if mine.any():
                hubs = t.column("hub_id").to_numpy()[mine]
                col = t.column("srcs").combine_chunks()
                for i in np.flatnonzero(mine):
                    self.hub_chunks.append((
                        int(t.column("hub_id")[i].as_py()),
                        np.asarray(col[i].as_py(), dtype=id_dtype)))

        # --- partition-aligned index for hub-spill chunks held here: which
        # source parts the chunk srcs touch, and each src's position in the
        # concat of just those ranges (same scheme as the in-CSR below), so
        # hub partials never need a full-graph broadcast.
        if self.hub_chunks:
            hub_srcs = np.concatenate([c for _, c in self.hub_chunks])
            hsp = np.searchsorted(self.bounds, hub_srcs, side="right") - 1
            self.hub_needed_parts = np.unique(hsp).astype(np.int64)
            hsizes = np.diff(self.bounds)[self.hub_needed_parts]
            hoff = np.zeros(self.nparts, dtype=np.int64)
            hoff[self.hub_needed_parts] = np.concatenate(
                ([0], np.cumsum(hsizes)[:-1]))
            self.hub_srcs_compact = (hub_srcs - self.bounds[hsp] + hoff[hsp])
            self.hub_chunk_ptr = np.concatenate(
                ([0], np.cumsum([len(c) for _, c in self.hub_chunks])))
        else:
            self.hub_needed_parts = np.zeros(0, dtype=np.int64)

        # --- partition-aligned pull index: which source parts feed us, and a
        # compact index of each in-edge into the concat of just those ranges.
        src_part = np.searchsorted(self.bounds, self.in_flat, side="right") - 1
        self.needed_parts = np.unique(src_part).astype(np.int64)
        sizes = np.diff(self.bounds)[self.needed_parts]
        compact_off = np.zeros(self.nparts, dtype=np.int64)
        compact_off[self.needed_parts] = np.concatenate(([0], np.cumsum(sizes)[:-1]))
        self.in_flat_compact = (self.in_flat - self.bounds[src_part]
                                + compact_off[src_part])
        self.compact_size = int(sizes.sum())
        self.state: dict[str, np.ndarray] = {}
        self.frontier = np.zeros(self.nloc, dtype=bool)
        # derived per-edge weights, (spec, layout) -> int64 per-edge array
        # aligned with that layout's flat edge order (state/weights.py)
        self._ew_cache: dict[tuple[str, str], np.ndarray] = {}

    def _edge_weights(self, spec: str, layout: str) -> np.ndarray:
        """Cached w(src, dst) for one of this shard's edge layouts:
        ``"in"`` (target-segment order, aligned with in_flat), ``"out"``
        (source-segment order, aligned with out_flat), ``"hub"`` (the
        concatenation of held hub-spill chunks, hub_chunk_ptr-aligned).
        Computed ONCE per (spec, layout) — the derived-weight analog of
        loading a stored weight column at shard init."""
        key = (spec, layout)
        if key not in self._ew_cache:
            from ligrust_ray.state.weights import edge_weights

            rng = np.arange(self.lo, self.hi, dtype=np.int64)
            if layout == "in":
                src = self.in_flat
                dst = np.repeat(rng, np.diff(self.in_indptr))
            elif layout == "out":
                src = np.repeat(rng, self.out_deg)
                dst = self.out_flat
            elif layout == "hub":
                if self.hub_chunks:
                    src = np.concatenate([c for _, c in self.hub_chunks])
                    dst = np.repeat(
                        np.asarray([h for h, _ in self.hub_chunks],
                                   dtype=np.int64),
                        np.diff(self.hub_chunk_ptr))
                else:
                    src = dst = np.zeros(0, dtype=np.int64)
            else:  # pragma: no cover
                raise ValueError(layout)
            self._ew_cache[key] = edge_weights(spec, src, dst)
        return self._ew_cache[key]

    def compute_out_strength(self, spec: str, name: str) -> None:
        """state[name] <- per-local-node weighted out-degree (Σ of derived
        out-edge weights; float64). The out-CSR is complete per shard —
        hub splitting only spills IN-edge lists — so this is one local
        segment sum, no exchange."""
        ew = self._edge_weights(spec, "out").astype(np.float64)
        # cumsum differences are exact here (weights are small integers,
        # far below 2^53) and robust to empty segments anywhere
        c = np.concatenate(([0.0], np.cumsum(ew)))
        self.state[name] = c[self.out_indptr[1:]] - c[self.out_indptr[:-1]]

    def in_tgt_idx(self) -> np.ndarray:
        if self._in_tgt_idx is None:
            self._in_tgt_idx = np.repeat(
                np.arange(self.nloc, dtype=np.int64), np.diff(self.in_indptr))
        return self._in_tgt_idx

    # ---- lifecycle -------------------------------------------------------
    def ping(self) -> int:
        return self.part

    def warm(self) -> int:
        """Touch every CSR page. Dispatched fire-and-forget right after
        load: the first iteration otherwise pays first-touch page faults
        (part of a measured ~18 s one-time cost on a 100M-edge graph under
        THP churn); warming overlaps with driver-side setup instead."""
        s = int(self.out_flat.sum(dtype=np.int64)
                + self.in_flat.sum(dtype=np.int64))
        return s & 1

    def build_mode_index(self) -> int:
        """Pre-build the lazy mode-reduce target index (m_in int64 — only
        mode-reduce algorithms should pay this memory)."""
        return int(self.in_tgt_idx().size)

    def hub_edge_count(self) -> int:
        return int(sum(len(c) for _, c in self.hub_chunks))

    def meta(self) -> dict:
        return {"part": self.part, "lo": self.lo, "hi": self.hi,
                "m_out": int(self.out_flat.size), "m_in": int(self.in_flat.size),
                "needed_parts": self.needed_parts.tolist()}

    def init_state(self, spec: dict) -> None:
        """spec: name -> (dtype, fill) | ("arange",) | callable(lo, hi)."""
        for name, s in spec.items():
            if callable(s):
                self.state[name] = np.asarray(s(self.lo, self.hi))
            elif s == ("arange",):
                self.state[name] = np.arange(self.lo, self.hi, dtype=np.int64)
            else:
                dtype, fill = s
                self.state[name] = np.full(self.nloc, fill, dtype=dtype)

    def set_frontier(self, kind: str, ids: np.ndarray | None = None) -> dict:
        if kind == "all":
            self.frontier = np.ones(self.nloc, dtype=bool)
        elif kind == "none":
            self.frontier = np.zeros(self.nloc, dtype=bool)
        else:  # "ids" (global ids, already range-filtered by caller)
            self.frontier = np.zeros(self.nloc, dtype=bool)
            if ids is not None and len(ids):
                self.frontier[np.asarray(ids, dtype=np.int64) - self.lo] = True
        return self._frontier_summary()

    def _frontier_summary(self) -> dict:
        return {"part": self.part,
                "frontier_count": int(self.frontier.sum()),
                "frontier_degree_sum": int(self.out_deg[self.frontier].sum())}

    # ---- views (pull-mode source state exchange) -------------------------
    def make_view(self, kernel) -> tuple[np.ndarray, np.ndarray]:
        """(frontier slice, per-source message values slice) for this range."""
        vals = kernel.source_values(self.state, self.out_deg)
        return self.frontier, vals

    def make_view_multi(self, kernels) -> tuple[np.ndarray, list]:
        """(frontier slice, [values slice per kernel]) — one wave serves
        every kernel of an ``edge_map_multi`` batch."""
        return self.frontier, [k.source_values(self.state, self.out_deg)
                               for k in kernels]

    # ---- dense / pull edge map ------------------------------------------
    def _resolve_hub_aggs(self, kernel, hub_partial_refs: list | None
                          ) -> dict | None:
        """Fetch the in-flight hub-partials wave (refs, not values — the
        wave runs CONCURRENTLY with this pull) and merge the chunks homed
        in this range."""
        if not hub_partial_refs:
            return None
        parts = ray.get(list(hub_partial_refs))
        return _merge_hub_partials_rows(kernel.reduce, parts,
                                        self.lo, self.hi)

    def pull(self, kernel, view_refs: list,
             hub_partial_refs: list | None = None) -> dict:
        """Gather over this range's in-CSR. ``view_refs[p]`` is the ObjectRef
        of partition p's ``make_view`` result; only ``needed_parts`` are
        fetched (partition-aligned, not a full broadcast).
        ``hub_partial_refs``: the concurrent hub-partials wave; merged
        aggregates overwrite split hubs homed here (their local in-lists
        are empty by construction — assignment, not double-count)."""
        hub_aggs = self._resolve_hub_aggs(kernel, hub_partial_refs)
        fr_parts = ray.get([view_refs[p] for p in self.needed_parts])
        if self.compact_size:
            frontier_c = np.concatenate([f for f, _ in fr_parts]) \
                if fr_parts else np.zeros(0, dtype=bool)
            values_c = np.concatenate([v for _, v in fr_parts]) \
                if fr_parts else np.zeros(0)
        else:
            frontier_c = np.zeros(0, dtype=bool)
            values_c = np.zeros(0)
        agg, touched, active, n_scanned = self._dense_gather(
            kernel, self.in_flat_compact, frontier_c, values_c)
        if hub_aggs:
            touched = touched.copy()
            for h, (val, tch) in hub_aggs.items():
                if self.lo <= h < self.hi:
                    agg[h - self.lo] = val
                    touched[h - self.lo] = tch
        if active is not None:
            touched = touched & active
        changed, scalars = kernel.apply(self.state, agg, touched, self)
        if kernel.has_output_frontier:
            self.frontier = changed
        s = self._frontier_summary()
        s["edges_scanned"] = n_scanned
        s["scalars"] = scalars
        return s

    def _dense_gather(self, kernel, flat_idx: np.ndarray,
                      frontier_arr: np.ndarray | None,
                      values_arr: np.ndarray):
        """Segment reduce over this range's in-CSR; ``flat_idx`` maps edge
        slots into ``frontier_arr``/``values_arr`` (full broadcast or
        compact partition-aligned layout).

        Dense-mode early-exit (reference ligra.rs:217-234 analog): when the
        kernel declares inactive targets (e.g. BFS's already-claimed
        vertices) and fewer than half the range is active, gather ONLY the
        active targets' in-list segments — claimed vertices' edges are
        never read. Returns (agg, touched, active, edges_scanned)."""
        active = kernel.target_active(self.state)
        if (active is not None and kernel.reduce != "mode"
                and 2 * int(active.sum()) < self.nloc):
            act_idx = np.flatnonzero(active)
            sub_deg = np.diff(self.in_indptr)[act_idx]
            edge_idx = _multi_range(self.in_indptr[:-1][act_idx], sub_deg)
            sub_indptr = np.zeros(len(act_idx) + 1, dtype=np.int64)
            np.cumsum(sub_deg, out=sub_indptr[1:])
            sel = flat_idx[edge_idx]
            contrib = None if frontier_arr is None else (
                frontier_arr[sel] if sel.size else np.zeros(0, dtype=bool))
            w = values_arr[sel] if sel.size else \
                np.zeros(0, dtype=values_arr.dtype)
            if kernel.weight_spec and w.size:
                w = _weighted(kernel, w, self._edge_weights(
                    kernel.weight_spec, "in")[edge_idx])
            sub_agg, sub_touched = _segment_reduce(
                kernel.reduce, sub_indptr, w, contrib, kernel.value_dtype)
            if kernel.reduce == "sum":
                agg = np.zeros(self.nloc, dtype=np.float64)
            elif kernel.reduce == "or":
                agg = np.zeros(self.nloc, dtype=np.int64)  # OR identity
            else:
                agg = np.full(self.nloc, INT_SENTINEL, dtype=np.int64)
            touched = np.zeros(self.nloc, dtype=bool)
            agg[act_idx] = sub_agg
            touched[act_idx] = sub_touched
            return agg, touched, active, int(edge_idx.size)
        idx = flat_idx
        contrib = None if frontier_arr is None else (
            frontier_arr[idx] if idx.size else np.zeros(0, dtype=bool))
        w = values_arr[idx] if idx.size else \
            np.zeros(0, dtype=values_arr.dtype)
        if kernel.weight_spec and w.size:
            w = _weighted(kernel, w,
                          self._edge_weights(kernel.weight_spec, "in"))
        agg, touched = _segment_reduce(kernel.reduce, self.in_indptr, w,
                                       contrib, kernel.value_dtype,
                                       self.in_tgt_idx()
                                       if kernel.reduce == "mode" else None)
        return agg, touched, active, int(self.in_flat.size)

    def pull_broadcast(self, kernel, frontier_full: np.ndarray | None,
                       values_full: np.ndarray, return_views: bool = False,
                       hub_partial_refs: list | None = None,
                       hub_aggs: dict | None = None):
        """Dense gather against ONE broadcast (frontier, values) pair
        covering all n vertices (small-graph fast path: n x 9 bytes is a
        single plasma object, zero-copy mapped by every shard — 2 objects
        per iteration instead of P^2 small fetches, which serialize in the
        object store server). ``frontier_full=None`` means the frontier is
        FULL (every source active) — skips the mask gather entirely.
        ``DistGraph.edge_map`` switches to the partition-aligned ``pull``
        above a node-count threshold."""
        if hub_aggs is None:
            hub_aggs = self._resolve_hub_aggs(kernel, hub_partial_refs)
        agg, touched, active, n_scanned = self._dense_gather(
            kernel, self.in_flat, frontier_full, values_full)
        if hub_aggs:
            # merged aggregates for split hubs homed in this range (their
            # local in-lists are empty by construction, so this is
            # assignment, not double-count)
            touched = touched.copy()
            for h, (val, tch) in hub_aggs.items():
                if self.lo <= h < self.hi:
                    agg[h - self.lo] = val
                    touched[h - self.lo] = tch
        if active is not None:
            touched = touched & active
        changed, scalars = kernel.apply(self.state, agg, touched, self)
        if kernel.has_output_frontier:
            self.frontier = changed
        s = self._frontier_summary()
        s["edges_scanned"] = n_scanned
        s["scalars"] = scalars
        if return_views:
            # next-iteration (frontier, source_values) so the driver can
            # skip the make_view wave (same contract as pull_fused)
            return s, self.frontier, kernel.source_values(self.state,
                                                          self.out_deg)
        return s

    @staticmethod
    def _chunk_partial(kernel, active: np.ndarray):
        if kernel.reduce == "sum":
            return (float(active.sum()), bool(len(active)))
        if kernel.reduce == "min":
            return (int(active.min()), True) if len(active) else \
                (INT_SENTINEL, False)
        if kernel.reduce == "or":
            return (int(np.bitwise_or.reduce(active.astype(np.int64))),
                    True) if len(active) else (0, False)
        if kernel.reduce == "mode":
            lab, cnt = np.unique(active.astype(np.int64), return_counts=True)
            return (lab, cnt)
        raise ValueError(kernel.reduce)  # pragma: no cover

    def hub_partials(self, kernel, frontier_full: np.ndarray | None,
                     values_full: np.ndarray) -> list:
        """Per-chunk partials for the hub chunks this shard holds, against
        the BROADCAST views. sum/min: (hub, partial, touched);
        mode: (hub, labels, counts)."""
        out = []
        for i, (hub, srcs) in enumerate(self.hub_chunks):
            w = values_full[srcs]
            if kernel.weight_spec and w.size:
                ew = self._edge_weights(kernel.weight_spec, "hub")
                w = _weighted(kernel, w, ew[
                    self.hub_chunk_ptr[i]:self.hub_chunk_ptr[i + 1]])
            active = w if frontier_full is None else w[frontier_full[srcs]]
            out.append((hub, *self._chunk_partial(kernel, active)))
        return out

    def pull_broadcast_multi(self, kernels, frontier_full: np.ndarray | None,
                             values_refs: list,
                             hub_partial_refs: list | None = None) -> dict:
        """Apply a BATCH of independent kernels (disjoint written state,
        shared frontier) back to back in one actor call — the driver pays
        one dispatch instead of one per kernel. ``values_refs[k]`` is the
        ObjectRef of kernel k's broadcast values (refs nested in a list
        are not auto-resolved; each resolves zero-copy from local
        plasma). Summary: last kernel's frontier state, edges_scanned
        summed, scalars merged across kernels."""
        hub_parts = ray.get(list(hub_partial_refs)) \
            if hub_partial_refs else None
        total_scanned = 0
        scalars: dict = {}
        s: dict = {}
        for ki, kernel in enumerate(kernels):
            values_full = ray.get(values_refs[ki])
            hub_aggs = None
            if hub_parts is not None:
                hub_aggs = _merge_hub_partials_rows(
                    kernel.reduce, [p[ki] for p in hub_parts],
                    self.lo, self.hi)
            s = self.pull_broadcast(kernel, frontier_full, values_full,
                                    hub_aggs=hub_aggs or {})
            total_scanned += s["edges_scanned"]
            for k2, v2 in (s.get("scalars") or {}).items():
                scalars[k2] = scalars.get(k2, 0) + v2
        s["edges_scanned"] = total_scanned
        s["scalars"] = scalars
        return s

    def hub_partials_multi(self, kernels,
                           frontier_full: np.ndarray | None,
                           values_refs: list) -> list:
        """Per-kernel hub partials for an ``edge_map_multi`` batch:
        returns [hub_partials(kernel_k) for k] (values refs resolved
        locally, zero-copy)."""
        return [self.hub_partials(k, frontier_full, ray.get(values_refs[ki]))
                for ki, k in enumerate(kernels)]

    def hub_partials_aligned(self, kernel, view_refs: list) -> list:
        """Same partials, but partition-aligned: fetch ONLY the source
        partitions this shard's hub chunks reference (the >2^24-node scale
        path — no n-sized broadcast object)."""
        if not self.hub_chunks:
            return []
        fr_parts = ray.get([view_refs[p] for p in self.hub_needed_parts])
        frontier_c = np.concatenate([f for f, _ in fr_parts])
        values_c = np.concatenate([v for _, v in fr_parts])
        out = []
        for i, (hub, _) in enumerate(self.hub_chunks):
            idx = self.hub_srcs_compact[
                self.hub_chunk_ptr[i]:self.hub_chunk_ptr[i + 1]]
            w = values_c[idx]
            if kernel.weight_spec and w.size:
                ew = self._edge_weights(kernel.weight_spec, "hub")
                w = _weighted(kernel, w, ew[
                    self.hub_chunk_ptr[i]:self.hub_chunk_ptr[i + 1]])
            active = w[frontier_c[idx]]
            out.append((hub, *self._chunk_partial(kernel, active)))
        return out

    def pull_fused(self, kernel, vkernel, over: str,
                   frontier_full: np.ndarray | None,
                   values_full: np.ndarray,
                   hub_partial_refs: list | None = None,
                   next_kernel=None):
        """One wave = pull_broadcast + vertex_op + next-iteration view
        values. Collapses the 3 actor waves of an iterative round
        (make_view, pull, vertex_filter) into 1 — per-iteration dispatch
        overhead is the scaling killer for mid-size graphs. Returns
        (summary, next_view_values). ``next_kernel``: prefetch the view
        values of a DIFFERENT kernel that the caller will dispatch next
        (alternating-kernel rounds like JP coloring otherwise miss the
        view cache every wave and pay a make_view round trip); values are
        computed AFTER vkernel.update, so they see the post-round state
        exactly as a separate make_view wave would."""
        s = self.pull_broadcast(kernel, frontier_full, values_full,
                                hub_partial_refs=hub_partial_refs)
        mask = np.ones(self.nloc, dtype=bool) if over == "all" else self.frontier
        keep, scalars = vkernel.update(self.state, mask, self)
        self.frontier = keep if keep is not None else mask.copy()
        s2 = self._frontier_summary()
        s2["edges_scanned"] = s["edges_scanned"]
        merged = dict(s.get("scalars") or {})
        merged.update(scalars or {})
        s2["scalars"] = merged
        return s2, self.frontier, (next_kernel or kernel).source_values(
            self.state, self.out_deg)

    # ---- sparse / push edge map -----------------------------------------
    def push(self, kernel):
        """Scatter from this range's frontier along out-CSR. Returns
        ``nparts`` message blobs (one per target partition; None if empty)
        followed by an edges_scanned count — call with
        ``num_returns=nparts+1`` so each blob routes to its target shard
        without driver materialisation."""
        f_idx = np.flatnonzero(self.frontier)
        # masked source values: a sparse frontier never pays an O(n_local)
        # compute (kernels with allocating source_values override _at)
        vals_f = kernel.source_values_at(self.state, self.out_deg, f_idx)
        starts = self.out_indptr[f_idx]
        lens = self.out_deg[f_idx]
        edge_idx = _multi_range(starts, lens)
        dst = self.out_flat[edge_idx]
        vals = np.repeat(vals_f, lens)
        if kernel.weight_spec and vals.size:
            vals = _weighted(kernel, vals, self._edge_weights(
                kernel.weight_spec, "out")[edge_idx])
        uk, uv = _combine_by_key(kernel.reduce, dst, vals)
        part_of = np.searchsorted(self.bounds, uk, side="right") - 1
        cut = np.searchsorted(part_of, np.arange(self.nparts + 1))
        out = []
        for p in range(self.nparts):
            a, b = cut[p], cut[p + 1]
            out.append((uk[a:b], uv[a:b]) if b > a else None)
        out.append(int(lens.sum()))
        return tuple(out)

    def apply_messages(self, kernel, msg_refs: list) -> dict:
        """Final combine of per-source-partition pre-combined messages,
        then kernel.apply. Deterministic: messages concatenated in source-
        partition order; within a partition dsts are sorted."""
        msgs = ray.get(msg_refs)
        ks = [m[0] for m in msgs if m is not None]
        vs = [m[1] for m in msgs if m is not None]
        if ks:
            keys = np.concatenate(ks)
            vals = np.concatenate(vs)
            uk, uv = _combine_by_key(kernel.reduce, keys, vals)
        else:
            uk = np.zeros(0, dtype=np.int64)
            uv = np.zeros(0)
        nloc = self.nloc
        touched = np.zeros(nloc, dtype=bool)
        if kernel.reduce == "sum":
            agg = np.zeros(nloc, dtype=np.float64)
        elif kernel.reduce == "or":
            agg = np.zeros(nloc, dtype=np.int64)
        else:
            agg = np.full(nloc, INT_SENTINEL, dtype=np.int64)
        if uk.size:
            loc = uk - self.lo
            agg[loc] = uv
            touched[loc] = True
        active = kernel.target_active(self.state)
        if active is not None:
            touched = touched & active
        changed, scalars = kernel.apply(self.state, agg, touched, self)
        if kernel.has_output_frontier:
            self.frontier = changed
        s = self._frontier_summary()
        s["edges_scanned"] = 0
        s["scalars"] = scalars
        return s

    # ---- vertex ops ------------------------------------------------------
    def vertex_op(self, kernel, over: str, set_frontier: bool) -> dict:
        mask = np.ones(self.nloc, dtype=bool) if over == "all" else self.frontier
        keep, scalars = kernel.update(self.state, mask, self)
        if set_frontier:
            self.frontier = keep if keep is not None else mask.copy()
        s = self._frontier_summary()
        s["scalars"] = scalars
        return s

    # ---- results / checkpoint -------------------------------------------
    def get_state(self, names: list[str]) -> dict:
        return {n: self.state[n] for n in names}

    def get_frontier_ids(self) -> np.ndarray:
        return np.flatnonzero(self.frontier) + self.lo

    def state_table(self, names: list[str]) -> pa.Table:
        cols = {"node_id": pa.array(np.arange(self.lo, self.hi, dtype=np.int64))}
        for n in names:
            cols[n] = pa.array(self.state[n])
        return pa.table(cols)

    def checkpoint(self, ckpt_dir: str, names: list[str]) -> dict:
        os.makedirs(ckpt_dir, exist_ok=True)
        cols = {"node_id": pa.array(np.arange(self.lo, self.hi, dtype=np.int64)),
                "frontier": pa.array(self.frontier)}
        for n in names:
            cols[n] = pa.array(self.state[n])
        final = os.path.join(ckpt_dir, f"part-{self.part:05d}.parquet")
        tmp = final + f".tmp{self.part}"
        pq.write_table(pa.table(cols), tmp)
        os.replace(tmp, final)
        return {"part": self.part, "rows": self.nloc, "file": final}

    def restore(self, ckpt_dir: str, names: list[str]) -> dict:
        t = pq.read_table(os.path.join(ckpt_dir, f"part-{self.part:05d}.parquet"))
        for n in names:
            self.state[n] = t.column(n).to_numpy().copy()
        self.frontier = t.column("frontier").to_numpy().copy()
        return self._frontier_summary()


class DistGraph:
    """Driver-side handle over the shard actors (the Graph trait analog,
    /root/reference/src/graph.rs:18-34)."""

    def __init__(self, graph_dir: str, manifest: dict, actors: list):
        self.graph_dir = graph_dir
        self.manifest = manifest
        self.n = int(manifest["n"])
        self.m = int(manifest["m"])
        self.bounds = np.asarray(manifest["bounds"], dtype=np.int64)
        self.nparts = int(manifest["num_partitions"])
        self.has_hubs = bool(manifest.get("spilled_in_edges", 0))
        self.hub_edges_total = int(manifest.get("spilled_in_edges", 0))
        self.actors = actors
        self.frontier_count = 0
        self.frontier_degree_sum = 0
        self.edges_scanned = 0
        # (kernel_key, frontier, source_values) for the NEXT edge_map,
        # produced by the previous pull wave. Tagged with the producing
        # kernel's identity: reusing source values across kernel types
        # would silently pull wrong messages. Any state/frontier mutation
        # outside edge_map invalidates it (init_algo / vertex_map /
        # vertex_filter / set_frontier / restore).
        self._view_cache: tuple[object, np.ndarray, np.ndarray] | None = None

    # threshold() of graph.rs:31-33 — the Ligra dense/sparse switch constant
    @property
    def threshold(self) -> int:
        return self.m // 20

    @classmethod
    def load(cls, graph_dir: str, actor_num_cpus: float = 0,
             warm: bool = True) -> "DistGraph":
        import json

        with open(os.path.join(graph_dir, "manifest.json")) as f:
            manifest = json.load(f)
        nparts = int(manifest["num_partitions"])
        actors = [
            CsrShard.options(num_cpus=actor_num_cpus).remote(
                p, manifest["bounds"], graph_dir)
            for p in range(nparts)
        ]
        ray.get([a.ping.remote() for a in actors])  # surface load errors early
        if warm:
            # fire-and-forget: page-touch + lazy-index build overlap with
            # driver-side setup instead of stalling the first iteration
            for a in actors:
                a.warm.remote()
        return cls(graph_dir, manifest, actors)

    def _absorb(self, summaries: list[dict]) -> dict:
        self.frontier_count = sum(s["frontier_count"] for s in summaries)
        self.frontier_degree_sum = sum(s["frontier_degree_sum"] for s in summaries)
        self.edges_scanned += sum(s.get("edges_scanned", 0) for s in summaries)
        merged: dict = {}
        for s in summaries:
            for k, v in (s.get("scalars") or {}).items():
                merged[k] = merged.get(k, 0) + v
        return merged

    # ---- primitives ------------------------------------------------------
    def init_algo(self, spec: dict) -> None:
        self._view_cache = None
        ray.get([a.init_state.remote(spec) for a in self.actors])

    def init_out_strength(self, weight_spec: str, name: str = "w_out"
                          ) -> None:
        """Materialize per-node weighted out-degree into vertex state —
        one local pass per shard (weights derive from the cached out
        layout), no exchange."""
        self._view_cache = None
        ray.get([a.compute_out_strength.remote(weight_spec, name)
                 for a in self.actors])

    def set_frontier(self, kind: str, ids: np.ndarray | None = None) -> None:
        if kind == "all" and self._view_cache is not None:
            # source VALUES depend only on state (unchanged here); the new
            # frontier is full, which _broadcast_views encodes as
            # f_ref=None — so patch the cached frontier instead of paying
            # a make_view wave (labelprop does this every round)
            k, _, v = self._view_cache
            self._view_cache = (k, np.ones(self.n, dtype=bool), v)
        else:
            self._view_cache = None
        if kind in ("all", "none"):
            s = ray.get([a.set_frontier.remote(kind) for a in self.actors])
        else:
            ids = np.asarray(ids, dtype=np.int64)
            part = np.searchsorted(self.bounds, ids, side="right") - 1
            s = ray.get([
                a.set_frontier.remote("ids", ids[part == p])
                for p, a in enumerate(self.actors)
            ])
        self._absorb(s)

    # above this node count the broadcast views no longer fit one object
    # comfortably; fall back to partition-aligned per-shard fetch
    PULL_BROADCAST_MAX_NODES = 1 << 24

    def edge_map(self, kernel) -> dict:
        """relationship_map (/root/reference/src/ligra.rs:58-88): dense pull
        when Σ out_degree(frontier) > m/20, else sparse push."""
        if kernel.weight_spec and kernel.reduce == "mode":
            raise ValueError("weighted edgeMap is not defined for "
                             "reduce='mode' (labels + weights)")
        if self.frontier_degree_sum > self.threshold:
            if self.n <= self.PULL_BROADCAST_MAX_NODES:
                f_ref, v_ref = self._broadcast_views(kernel)
                hub_refs = self._hub_wave(kernel, f_ref, v_ref)
                out = ray.get([
                    a.pull_broadcast.remote(kernel, f_ref, v_ref,
                                            return_views=True,
                                            hub_partial_refs=hub_refs)
                    for a in self.actors])
                self._view_cache = (
                    self._kernel_key(kernel),
                    np.concatenate([f for _, f, _ in out]),
                    np.concatenate([v for _, _, v in out]))
                return self._absorb([s for s, _, _ in out])
            # partition-aligned path (> 2^24 nodes): per-shard fetch of only
            # the needed source ranges; hub partials are aligned too, so
            # skew-split graphs keep the no-broadcast scale path
            views = [a.make_view.remote(kernel) for a in self.actors]
            hub_refs = self._hub_wave_aligned(kernel, views)
            summaries = ray.get([a.pull.remote(kernel, views, hub_refs)
                                 for a in self.actors])
        else:
            per_actor = [
                a.push.options(num_returns=self.nparts + 1).remote(kernel)
                for a in self.actors
            ]
            self.edges_scanned += sum(ray.get([r[-1] for r in per_actor]))
            summaries = ray.get([
                a.apply_messages.remote(kernel, [per_actor[src][p]
                                                 for src in range(self.nparts)])
                for p, a in enumerate(self.actors)
            ])
        self._view_cache = None
        return self._absorb(summaries)

    def edge_map_multi(self, kernels: list) -> dict:
        """Run a BATCH of independent edge_map kernels (disjoint written
        state, same source frontier — e.g. JP coloring's per-word
        neighbour-color mask gathers) in TWO actor waves total: one
        ``make_view_multi`` returning every kernel's source values, one
        ``pull_broadcast_multi`` applying them all, instead of
        (make_view + pull) x K round trips. Round-dominated algorithms
        are dispatch-bound at small per-round work (BASELINE §2d: ~20 ms
        per wave), so this cuts a K-word round from 2K to 2 dispatches.
        Dense broadcast mode only; other regimes fall back to sequential
        ``edge_map`` (correct, just unbatched)."""
        if not kernels:
            return {}
        if len(kernels) == 1:
            return self.edge_map(kernels[0])
        dense = self.frontier_degree_sum > self.threshold
        if not (dense and self.n <= self.PULL_BROADCAST_MAX_NODES):
            # sequential fallback must honor the same contract as the
            # batched path: scalars MERGED across kernels (summed per
            # key), not just the last kernel's
            merged: dict = {}
            for k in kernels:
                for k2, v2 in (self.edge_map(k) or {}).items():
                    merged[k2] = merged.get(k2, 0) + v2
            return merged
        views = ray.get([a.make_view_multi.remote(kernels)
                         for a in self.actors])
        full = self.frontier_count >= self.n
        f_ref = None if full else \
            ray.put(np.concatenate([f for f, _ in views]))
        v_refs = [ray.put(np.concatenate([vs[ki] for _, vs in views]))
                  for ki in range(len(kernels))]
        hub_refs = None
        if self.has_hubs:
            self.edges_scanned += self.hub_edges_total * len(kernels)
            # dispatch-only, merged inside the concurrent pull wave
            hub_refs = [a.hub_partials_multi.remote(kernels, f_ref, v_refs)
                        for a in self.actors]
        out = ray.get([
            a.pull_broadcast_multi.remote(kernels, f_ref, v_refs, hub_refs)
            for a in self.actors])
        self._view_cache = None
        return self._absorb(out)

    def _hub_wave(self, kernel, f_ref, v_ref) -> dict | None:
        """Tiny pre-wave for split hubs: every shard reduces its held
        chunks against the broadcast views; the driver merges per hub.
        Returns {hub_id: (agg_value, touched)} or None."""
        if not self.has_hubs:
            return None
        self.edges_scanned += self.hub_edges_total
        # dispatch ONLY — the refs ship to the pull wave, which merges the
        # chunks homed in its range; both waves are in flight concurrently
        # (round 1 serialised: partials wave -> driver merge -> pull wave)
        return [a.hub_partials.remote(kernel, f_ref, v_ref)
                for a in self.actors]

    def _hub_wave_aligned(self, kernel, view_refs: list) -> list | None:
        """Hub pre-wave for the partition-aligned pull path: each shard
        fetches only the view slices its chunks reference. Dispatch-only;
        merge happens inside the concurrent pull wave."""
        if not self.has_hubs:
            return None
        self.edges_scanned += self.hub_edges_total
        return [a.hub_partials_aligned.remote(kernel, view_refs)
                for a in self.actors]

    @staticmethod
    def _kernel_key(kernel):
        # the KERNEL OBJECT ITSELF is the cache tag, compared by identity:
        # holding the reference pins its id, so a GC'd kernel's recycled
        # address can never falsely match a stale cache (a (type, id)
        # tuple gave weaker protection than it appeared to)
        return kernel

    def _broadcast_views(self, kernel):
        """(frontier_ref|None, values_ref) for a broadcast pull — reused
        from the view cache when the previous fused wave produced them
        WITH THE SAME KERNEL (skips the make_view dispatch in steady
        state); a different kernel's cached source values would be wrong,
        so mismatches fall back to a make_view wave."""
        full = self.frontier_count >= self.n
        if (self._view_cache is not None
                and self._view_cache[0] is self._kernel_key(kernel)):
            _, f, v = self._view_cache
            return (None if full else ray.put(f)), ray.put(v)
        views = ray.get([a.make_view.remote(kernel) for a in self.actors])
        f_ref = None if full else \
            ray.put(np.concatenate([f for f, _ in views]))
        return f_ref, ray.put(np.concatenate([v for _, v in views]))

    def edge_map_fused(self, kernel, vkernel, over: str = "all",
                       next_kernel=None) -> dict:
        """edge_map + vertex_filter in ONE actor wave (dense broadcast mode
        only; falls back to the two separate primitives otherwise). The
        wave also returns next-iteration source values, so steady-state
        iterations cost one dispatch + one broadcast. ``next_kernel``:
        cache the returned views under a DIFFERENT kernel the caller will
        dispatch next (alternating-kernel rounds — JP coloring runs
        select-minima then mask-gather every round — otherwise miss the
        identity-tagged cache on every wave and pay 2x the dispatches)."""
        if kernel.weight_spec and kernel.reduce == "mode":
            raise ValueError("weighted edgeMap is not defined for "
                             "reduce='mode' (labels + weights)")
        dense = self.frontier_degree_sum > self.threshold
        if not (dense and self.n <= self.PULL_BROADCAST_MAX_NODES):
            self.edge_map(kernel)
            return self.vertex_filter(vkernel, over=over)
        f_ref, v_ref = self._broadcast_views(kernel)
        hub_refs = self._hub_wave(kernel, f_ref, v_ref)
        out = ray.get([a.pull_fused.remote(kernel, vkernel, over, f_ref, v_ref,
                                           hub_refs, next_kernel)
                       for a in self.actors])
        self._view_cache = (self._kernel_key(next_kernel or kernel),
                            np.concatenate([f for _, f, _ in out]),
                            np.concatenate([v for _, _, v in out]))
        return self._absorb([s for s, _, _ in out])

    def vertex_map(self, kernel, over: str = "frontier") -> dict:
        self._view_cache = None
        return self._absorb(ray.get([
            a.vertex_op.remote(kernel, over, False) for a in self.actors]))

    def vertex_filter(self, kernel, over: str = "frontier") -> dict:
        self._view_cache = None
        return self._absorb(ray.get([
            a.vertex_op.remote(kernel, over, True) for a in self.actors]))

    # ---- results ---------------------------------------------------------
    def collect_state(self, names: list[str]) -> dict:
        """Assemble full per-vertex arrays on the driver — results/tests at
        sandbox scale; use ``result_dataset`` for big outputs."""
        parts = ray.get([a.get_state.remote(names) for a in self.actors])
        return {n: np.concatenate([p[n] for p in parts]) for n in names}

    def result_dataset(self, names: list[str]):
        import ray.data

        refs = [a.state_table.remote(names) for a in self.actors]
        return ray.data.from_arrow_refs(refs)
