"""Kernel specs — the UDF surface of the engine.

The reference's ``RelationshipMapper`` (/root/reference/src/ligra.rs:34-56)
is an atomic ``update(source, target) -> bool`` + ``check(target)``; its
shared-memory CAS updates become, under BSP message exchange, an
associative reduce plus a vectorised apply:

- ``source_values(state, out_deg)``: per-source message value (the payload
  of ``update``'s read side) — e.g. ``deltas/out_degree`` for PageRank
  (algos.rs:225-231), ``ids`` for CC, the node id itself for BFS.
- ``reduce``: ``"sum" | "min" | "or" | "mode"`` — replaces ``fetch_add`` /
  CAS-write-min / atomic-OR / CAS-claim. ``mode`` (label frequency argmax)
  is pull-only: it is not associative over partial frontiers; the other
  three work on both push and pull paths. ``"or"`` is bitwise int64
  (identity 0) — the bit-parallel multi-source family (algos/radii.py).
- ``target_active(state)``: the ``check(target)`` pre-filter
  (ligra.rs:41-43); None = always true.
- ``apply(state, agg, touched, shard)``: the write side; returns
  (changed_mask_or_None, scalars). ``changed_mask`` is the next frontier —
  the set of targets for which the reference's ``update`` returned true
  (ligra.rs:224-241); the broken sparse-output path K2b (ligra.rs:144-201)
  is NOT replicated, per SURVEY.md §2.2.

``VertexKernel.update(state, mask, shard)`` is the NodeMapper analog
(ligra.rs:244-250): vectorised over the subset, returns (keep_mask_or_None,
scalars) — keep_mask drives node_filter (ligra.rs:268-306).

Kernels are small picklable objects shipped to shard actors per super-step;
all heavy state stays in the actors.
"""

from __future__ import annotations

import numpy as np


class EdgeKernel:
    reduce: str = "sum"
    value_dtype = np.float64
    has_output_frontier: bool = True  # = !has_no_result (ligra.rs:53-55)
    # Weighted edgeMap (Ligra's wgh field; the reference is unweighted):
    # a state/weights.py spec string (e.g. "md5:32") makes every edge
    # contribution ``source_value (+|*) w(src, dst)`` — weight_combine
    # "add" is the min-plus semiring for Bellman-Ford under reduce="min"
    # / weighted accumulate under "sum"/"or"; "mul" is the plus-times
    # semiring (weighted PageRank: message = (delta / w_out) * w).
    # Weights are derived (pure hash of the endpoint ids), computed once
    # per shard per CSR layout and cached; NOT supported with
    # reduce="mode" (a label plus a weight is meaningless).
    weight_spec: str | None = None
    weight_combine: str = "add"

    def source_values(self, state: dict, out_deg: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def source_values_at(self, state: dict, out_deg: np.ndarray,
                         idx: np.ndarray) -> np.ndarray:
        """Masked variant for the sparse push path: values for ``idx``
        (frontier positions) only. Default gathers from the full-range
        array; kernels whose source_values ALLOCATES per call (e.g.
        PageRank's deltas/out_deg divide) override this so a tiny frontier
        never pays an O(n_local) compute."""
        return self.source_values(state, out_deg)[idx]

    def target_active(self, state: dict):
        return None

    def apply(self, state: dict, agg: np.ndarray, touched: np.ndarray, shard):
        raise NotImplementedError


class VertexKernel:
    def update(self, state: dict, mask: np.ndarray, shard):
        raise NotImplementedError
