"""BFS — G2 of SURVEY.md §2.6 (/root/reference/src/algos.rs:124-167).

Level-synchronous: per level, every unvisited target with an in-neighbor in
the frontier is claimed. The reference's parent is a CAS race among
same-level sources (algos.rs:136-140); we take the deterministic refinement
``parent = min same-level in-neighbor`` (reduce = min over source ids).
Levels are exact; unreached nodes keep parent = level = -1 (the reference's
``usize::MAX``, FIXTURES.md F5 maps it to -1).
"""

from __future__ import annotations

import time

import numpy as np

from ligrust_ray.stages.kernels import EdgeKernel, VertexKernel
from ligrust_ray.state import checkpoint as ckpt

STATE = ["parent", "level"]


class BFSEdge(EdgeKernel):
    reduce = "min"
    value_dtype = np.int64

    def __init__(self, level: int):
        self.level = level

    def source_values(self, state, out_deg):
        return state["self_id"]

    def target_active(self, state):
        # check(): unvisited (algos.rs:142-144)
        return state["parent"] == -1

    def apply(self, state, agg, touched, shard):
        claim = touched  # already masked by target_active
        state["parent"][claim] = agg[claim]
        state["level"][claim] = self.level
        return claim, {}


class _SetRoot(VertexKernel):
    def __init__(self, root: int):
        self.root = root

    def update(self, state, mask, shard):
        if shard.lo <= self.root < shard.hi:
            i = self.root - shard.lo
            state["parent"][i] = self.root
            state["level"][i] = 0
        return None, {}


def bfs(graph, root: int, checkpoint_dir: str | None = None,
        checkpoint_every: int = 1, resume: bool = True) -> dict:
    t0 = time.perf_counter()
    graph.init_algo({
        "parent": (np.int64, -1),
        "level": (np.int64, -1),
        "self_id": ("arange",),
    })
    level = 0
    man = ckpt.latest_checkpoint(checkpoint_dir, "bfs") if (
        checkpoint_dir and resume) else None
    if man is not None:
        ckpt.restore_checkpoint(graph, man)
        level = man["loop_state"]["level"]
    else:
        graph.vertex_map(_SetRoot(root), over="all")
        graph.set_frontier("ids", np.array([root]))
    graph.edges_scanned = 0
    while graph.frontier_count != 0:
        level += 1
        graph.edge_map(BFSEdge(level))
        if checkpoint_dir and checkpoint_every and level % checkpoint_every == 0:
            ckpt.write_checkpoint(
                graph, checkpoint_dir, "bfs", level, STATE + ["self_id"],
                {"frontier_size": graph.frontier_count,
                 "edges_scanned": graph.edges_scanned,
                 "wall_s": time.perf_counter() - t0},
                {"level": level})
    return {"iterations": level, "edges_scanned": graph.edges_scanned,
            "wall_s": time.perf_counter() - t0, "state_names": STATE}
