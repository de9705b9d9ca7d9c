"""Synchronous label propagation — NEW algorithm (required by BASELINE.json
north_rule; the reference implements only CC/BFS/PageRankDelta,
/root/reference/src/algos.rs). Specified in SURVEY.md §7.5 and expressed
over the same edgeMap kernel:

- state: ``labels[v] <- v``.
- per round, for every vertex with in-neighbors: new label = the most
  frequent label among in-neighbors (parallel edges count with
  multiplicity), ties broken by SMALLEST label (determinism). Vertices with
  no in-neighbors keep their label.
- stop when no label changed or ``max_iterations`` reached (synchronous LP
  can oscillate on bipartite structures; the cap bounds that).

The frequency-argmax reduce ("mode") is NOT associative over partial
frontiers, so this kernel always runs in dense/pull mode over full in-lists
(every round recomputes all targets — frontier set to "all" each round).
"""

from __future__ import annotations

import time

import numpy as np

from ligrust_ray.stages.kernels import EdgeKernel
from ligrust_ray.state import checkpoint as ckpt

STATE = ["labels"]


class LPEdge(EdgeKernel):
    reduce = "mode"
    value_dtype = np.int64

    def source_values(self, state, out_deg):
        return state["labels"]

    def apply(self, state, agg, touched, shard):
        labels = state["labels"]
        new = np.where(touched, agg, labels)
        changed = new != labels
        state["labels"] = new
        return changed, {"n_changed": int(changed.sum())}


def label_propagation(graph, max_iterations: int = 20,
                      checkpoint_dir: str | None = None,
                      checkpoint_every: int = 1, resume: bool = True) -> dict:
    t0 = time.perf_counter()
    iteration = 0
    man = ckpt.latest_checkpoint(checkpoint_dir, "labelprop") if (
        checkpoint_dir and resume) else None
    graph.init_algo({"labels": ("arange",)})
    if man is not None:
        ckpt.restore_checkpoint(graph, man)
        iteration = man["iteration"]
        if man["loop_state"].get("converged"):
            return {"iterations": iteration, "edges_scanned": 0,
                    "wall_s": 0.0, "state_names": STATE}
    kernel = LPEdge()
    graph.edges_scanned = 0
    # overlap the lazy mode-index build (m_in int64 per shard) with the
    # frontier-init waves instead of stalling the first dense pull
    for a in graph.actors:
        a.build_mode_index.remote()
    while iteration < max_iterations:
        iteration += 1
        graph.set_frontier("all")  # mode-reduce needs full in-lists every round
        s = graph.edge_map(kernel)
        converged = s.get("n_changed", 0) == 0
        if checkpoint_dir and checkpoint_every and iteration % checkpoint_every == 0:
            ckpt.write_checkpoint(
                graph, checkpoint_dir, "labelprop", iteration, STATE,
                {"n_changed": s.get("n_changed", 0),
                 "edges_scanned": graph.edges_scanned,
                 "wall_s": time.perf_counter() - t0},
                {"converged": converged})
        if converged:
            break
    return {"iterations": iteration, "edges_scanned": graph.edges_scanned,
            "wall_s": time.perf_counter() - t0, "state_names": STATE}
