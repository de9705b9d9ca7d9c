"""Deterministic spanning forest — NEW vs the reference (which implements
only CC/BFS/PageRankDelta, /root/reference/src/main.rs), composed entirely
from the two engine algorithms the reference DOES define: connected
components picks each component's root (its minimum node id), then one
multi-source BFS wave from ALL roots simultaneously claims every node's
forest parent (``parent = min same-level in-neighbor``, the same
deterministic refinement algos/bfs.py uses). The parent edges form a
spanning forest: levels strictly decrease toward the root, so no cycles,
and every node is reached because its component root reaches it.

Runs on a SYMMETRIZED simple graph (the undirected-forest semantics;
in-CSR = full adjacency). Roots keep ``parent = self`` (mirroring bfs's
root convention); the output is exactly replicated by a DuckDB oracle
(recursive component closure -> roots -> multi-source BFS levels ->
min-parent-at-level-1).
"""

from __future__ import annotations

import time

import numpy as np

from ligrust_ray.algos.bfs import BFSEdge
from ligrust_ray.algos.cc import cc
from ligrust_ray.stages.kernels import VertexKernel

STATE = ["ids", "parent", "level"]


class _SeedRoots(VertexKernel):
    """frontier := component roots (label == own id); parent = self,
    level = 0."""

    def update(self, state, mask, shard):
        ids = np.arange(shard.lo, shard.hi, dtype=np.int64)
        root = state["ids"] == ids
        state["parent"][root] = ids[root]
        state["level"][root] = 0
        return root, {"roots": int(root.sum())}


def spanning_forest(graph) -> dict:
    """Run CC then rooted multi-source BFS; afterwards ``state['parent']``
    / ``state['level']`` hold the forest (root: parent = self, level = 0).
    ``graph`` MUST be symmetrized simple."""
    t0 = time.perf_counter()
    cc(graph)                      # state['ids'] = component min label
    # init_algo ASSIGNS only the named entries — 'ids' survives
    graph.init_algo({"parent": (np.int64, -1), "level": (np.int64, -1),
                     "self_id": ("arange",)})
    graph.vertex_filter(_SeedRoots(), over="all")
    graph.edges_scanned = 0
    level = 0
    while graph.frontier_count != 0:
        level += 1
        graph.edge_map(BFSEdge(level))
    return {"depth": level, "edges_scanned": graph.edges_scanned,
            "wall_s": time.perf_counter() - t0, "state_names": STATE}
