"""Connected components — G1 of SURVEY.md §2.6
(/root/reference/src/algos.rs:48-122).

Semantics preserved exactly: min-label propagation **along out-edges only**
(the dense branch gathers over in-edges but checks frontier membership of
the source — same (s -> t) direction, ligra.rs:226-237). Fixed point:
``ids[v] = min({u : directed path u ~> v} ∪ {v})`` — equals weakly-connected
components only on symmetrized input. The reference's ``prev_ids``
first-improvement bookkeeping (algos.rs:72-78) only dedups frontier entries
under racy atomics; in BSP the changed-mask frontier is exact, so no
snapshot pass is needed and the fixed point is identical.
"""

from __future__ import annotations

import time

import numpy as np

from ligrust_ray.stages.kernels import EdgeKernel
from ligrust_ray.state import checkpoint as ckpt

STATE = ["ids"]


class CCEdge(EdgeKernel):
    reduce = "min"
    value_dtype = np.int64

    def source_values(self, state, out_deg):
        return state["ids"]

    def apply(self, state, agg, touched, shard):
        ids = state["ids"]
        new = np.minimum(ids, np.where(touched, agg, ids))
        changed = new < ids
        state["ids"] = new
        return changed, {"changed": int(changed.sum())}


def cc_incremental(graph, base_ids: np.ndarray, delta_srcs: np.ndarray,
                   checkpoint_dir: str | None = None,
                   checkpoint_every: int = 1) -> dict:
    """Incremental CC after a batch of edge insertions: ``graph`` is the
    UNION graph (base + delta edges already in the CSR), ``base_ids`` the
    base graph's fixed point over the same node universe, ``delta_srcs``
    the SOURCE endpoints of the inserted edges. Warm-starts the min-label
    propagation from base_ids with the frontier seeded at delta_srcs.

    Why this converges to exactly the from-scratch fixed point: any label
    change in the union fixed point must flow across at least one delta
    edge, and the first wave pushes every delta source's settled label
    across ALL its out-edges (including the new ones); every subsequent
    flow is triggered by a changed target joining the frontier, exactly as
    in a cold run. Cost is proportional to the affected region — an empty
    delta runs zero edge_map waves. The base labels broadcast once via
    ``ray.put`` (each shard slices its own range zero-copy); nothing
    n-sized is re-shipped per wave."""
    import ray

    t0 = time.perf_counter()
    if len(base_ids) != graph.n:
        raise ValueError(f"base_ids covers {len(base_ids)} nodes, union "
                         f"graph has {graph.n}")
    ref = ray.put(np.ascontiguousarray(base_ids, dtype=np.int64))
    graph.init_algo({"ids": lambda lo, hi: ray.get(ref)[lo:hi]})
    graph.set_frontier("ids", np.unique(
        np.asarray(delta_srcs, dtype=np.int64)))
    kernel = CCEdge()
    graph.edges_scanned = 0
    iteration = 0
    while graph.frontier_count != 0:
        iteration += 1
        graph.edge_map(kernel)
        if checkpoint_dir and checkpoint_every and \
                iteration % checkpoint_every == 0:
            ckpt.write_checkpoint(
                graph, checkpoint_dir, "cc_incr", iteration, STATE,
                {"frontier_size": graph.frontier_count,
                 "edges_scanned": graph.edges_scanned,
                 "wall_s": time.perf_counter() - t0},
                {})
    return {"iterations": iteration, "edges_scanned": graph.edges_scanned,
            "wall_s": time.perf_counter() - t0, "state_names": STATE}


def cc(graph, checkpoint_dir: str | None = None, checkpoint_every: int = 1,
       resume: bool = True) -> dict:
    """Run to fixed point. Returns {"ids": np.ndarray? via graph, metrics}."""
    t0 = time.perf_counter()
    iteration = 0
    man = ckpt.latest_checkpoint(checkpoint_dir, "cc") if (
        checkpoint_dir and resume) else None
    if man is not None:
        graph.init_algo({"ids": ("arange",)})
        ckpt.restore_checkpoint(graph, man)
        iteration = man["iteration"]
    else:
        graph.init_algo({"ids": ("arange",)})
        graph.set_frontier("all")
    kernel = CCEdge()
    graph.edges_scanned = 0
    while graph.frontier_count != 0:
        iteration += 1
        graph.edge_map(kernel)
        if checkpoint_dir and checkpoint_every and iteration % checkpoint_every == 0:
            ckpt.write_checkpoint(
                graph, checkpoint_dir, "cc", iteration, STATE,
                {"frontier_size": graph.frontier_count,
                 "edges_scanned": graph.edges_scanned,
                 "wall_s": time.perf_counter() - t0},
                {})
    return {"iterations": iteration, "edges_scanned": graph.edges_scanned,
            "wall_s": time.perf_counter() - t0, "state_names": STATE}
