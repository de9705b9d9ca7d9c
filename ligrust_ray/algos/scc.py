"""Strongly connected components — forward-backward min-label with
iterative trimming.

The reference engine stops at the directed-reachability minimum (its CC,
/root/reference/src/algos.rs:48-122); SCC extends the same kernel surface
to the full directed family using the classic parallel decomposition
(Orzan's coloring / the FW-BW-Trim of Slota et al., both frontier-based
and Ligra-shaped — no DFS):

  repeat until no undecided node:
    TRIM   nodes with zero undecided in-neighbours OR zero undecided
           out-neighbours are singleton SCCs (nothing through them can
           cycle): scc = own id. Iterated to a cap — pure acceleration,
           FB below is exact regardless.
    F      min-label propagation along OUT-edges within the undecided
           subgraph: lab_f[v] = min undecided u with u ->* v (and >= the
           trivial v itself).
    B      the same along IN-edges, run on the REVERSED graph's shard
           actors: lab_b[v] = min undecided u with v ->* u.
    DECIDE undecided v with lab_f[v] == lab_b[v] == L joins SCC L:
           L ->* v and v ->* L, so v is in SCC(L). F and B are constant
           across an SCC (members reach each other), so whole SCCs decide
           together, and the common value is exactly min(member id) — no
           smaller member m could exist or F would be <= m < L. The SCC
           of the globally minimal undecided id always has F == B == that
           id, so every round decides >= 1 SCC -> termination.

Both graphs are built over the same (n, num_partitions) so their
partition bounds are identical (pipelines/build.partition_bounds); state
moves between the twin shard actors as per-partition object refs — the
driver never materialises an O(n) array.
"""

from __future__ import annotations

import time

import numpy as np
import ray

from ligrust_ray.stages.kernels import EdgeKernel, VertexKernel
from ligrust_ray.state.graph import INT_SENTINEL

STATE = ["scc"]


def transfer_state(src_g, dst_g, mapping: dict[str, str]) -> None:
    """Copy per-vertex arrays between twin graphs (identical bounds):
    ``mapping`` is dst_name -> src_name. Partition-aligned ref handoff —
    each destination shard pulls exactly its own range's arrays from the
    matching source shard; nothing is concatenated on the driver."""
    if not np.array_equal(src_g.bounds, dst_g.bounds):  # pragma: no cover
        raise ValueError("transfer_state requires identical partition bounds")
    names = sorted(set(mapping.values()))
    refs = [a.get_state.remote(names) for a in src_g.actors]
    ray.get([
        b.init_state.remote({
            dn: (lambda lo, hi, _r=r, _s=sn: ray.get(_r)[_s].copy())
            for dn, sn in mapping.items()})
        for r, b in zip(refs, dst_g.actors)
    ])
    # init_state bypasses DistGraph.init_algo: invalidate the view cache
    dst_g._view_cache = None


class MinLabelEdge(EdgeKernel):
    """CC-style min-label propagation restricted to the undecided
    subgraph: only undecided targets accept (target_active), and only
    undecided sources ever carry a live label (decided nodes hold the
    INT_SENTINEL identity and never enter the frontier)."""

    reduce = "min"
    value_dtype = np.int64

    def source_values(self, state, out_deg):
        return state["lab"]

    def target_active(self, state):
        return state["und"]

    def apply(self, state, agg, touched, shard):
        lab = state["lab"]
        new = np.minimum(lab, np.where(touched, agg, lab))
        changed = new < lab
        state["lab"] = new
        return changed, {"changed": int(changed.sum())}


class HasNbrEdge(EdgeKernel):
    """One full-frontier wave marking, per undecided target, whether ANY
    undecided neighbour feeds it along this graph's edge direction
    (``touched`` of a min-reduce is exactly "some frontier source
    contributes"). Leaves the frontier untouched."""

    reduce = "min"
    value_dtype = np.int64
    has_output_frontier = False

    def __init__(self, key: str):
        self.key = key

    def source_values(self, state, out_deg):
        return np.zeros(len(out_deg), dtype=np.int64)

    def source_values_at(self, state, out_deg, idx):
        return np.zeros(len(idx), dtype=np.int64)

    def target_active(self, state):
        return state["und"]

    def apply(self, state, agg, touched, shard):
        state[self.key] = touched.copy()
        return None, {}


class SetFrontierUnd(VertexKernel):
    def update(self, state, mask, shard):
        return state["und"].copy(), {}


class ResetLab(VertexKernel):
    """lab = own id on undecided nodes, sentinel elsewhere; frontier =
    undecided (one wave does both via vertex_filter(over='all'))."""

    def update(self, state, mask, shard):
        und = state["und"]
        ids = np.arange(shard.lo, shard.hi, dtype=np.int64)
        state["lab"] = np.where(und, ids, INT_SENTINEL)
        return und.copy(), {}


class TrimMark(VertexKernel):
    def update(self, state, mask, shard):
        und = state["und"]
        newly = und & ~(state["has_in"] & state["has_out"])
        ids = np.arange(shard.lo, shard.hi, dtype=np.int64)
        state["scc"][newly] = ids[newly]
        state["und"] = und & ~newly
        return None, {"trimmed": int(newly.sum()),
                      "undecided": int(state["und"].sum())}


class Decide(VertexKernel):
    def update(self, state, mask, shard):
        und = state["und"]
        sel = und & (state["lab"] == state["lab_b"]) \
            & (state["lab"] < INT_SENTINEL)
        state["scc"][sel] = state["lab"][sel]
        state["und"] = und & ~sel
        return None, {"decided": int(sel.sum()),
                      "undecided": int(state["und"].sum())}


def _minlabel_fixpoint(g, kernel) -> int:
    """Run min-label propagation to fixed point on ``g`` (frontier must
    already be the undecided set with lab freshly reset)."""
    iters = 0
    while g.frontier_count != 0:
        iters += 1
        g.edge_map(kernel)
    return iters


def scc(g_fwd, g_rev, max_rounds: int = 64, trim_rounds: int = 30) -> dict:
    """Exact SCC ids (min member id) into g_fwd's ``scc`` state.

    ``g_rev`` must be the same edge set reversed, built with the same
    (n, num_partitions). Raises if ``max_rounds`` outer rounds don't
    drain — each round provably decides >= 1 SCC, so this only fires on
    adversarial SCC-chain graphs where the cap is genuinely too low."""
    t0 = time.perf_counter()
    if g_fwd.n != g_rev.n or g_fwd.nparts != g_rev.nparts:
        raise ValueError("g_rev must mirror g_fwd (same n, num_partitions)")
    g_fwd.init_algo({"scc": (np.int64, -1), "und": (np.bool_, True),
                     "lab": (np.int64, INT_SENTINEL),
                     "lab_b": (np.int64, INT_SENTINEL),
                     "has_in": (np.bool_, False),
                     "has_out": (np.bool_, False)})
    g_rev.init_algo({"und": (np.bool_, True),
                     "lab": (np.int64, INT_SENTINEL),
                     "has_out": (np.bool_, False)})
    fwd_min = MinLabelEdge()
    rev_min = MinLabelEdge()
    has_in_k = HasNbrEdge("has_in")
    has_out_k = HasNbrEdge("has_out")
    undecided = g_fwd.n
    rounds = trims = fb_iters = 0
    while undecided > 0:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"scc did not converge in {max_rounds} rounds "
                f"({undecided} undecided); raise max_rounds")
        # ---- TRIM to local stability (or cap) -------------------------
        for _ in range(trim_rounds):
            g_fwd.vertex_filter(SetFrontierUnd(), over="all")
            g_fwd.edge_map(has_in_k)
            transfer_state(g_fwd, g_rev, {"und": "und"})
            g_rev.vertex_filter(SetFrontierUnd(), over="all")
            g_rev.edge_map(has_out_k)
            transfer_state(g_rev, g_fwd, {"has_out": "has_out"})
            s = g_fwd.vertex_map(TrimMark(), over="all")
            trims += s["trimmed"]
            undecided = s["undecided"]
            if s["trimmed"] == 0 or undecided == 0:
                break
        if undecided == 0:
            break
        # ---- F: forward min-label on the undecided subgraph -----------
        g_fwd.vertex_filter(ResetLab(), over="all")
        fb_iters += _minlabel_fixpoint(g_fwd, fwd_min)
        # ---- B: backward (reversed graph) ------------------------------
        transfer_state(g_fwd, g_rev, {"und": "und"})
        g_rev.vertex_filter(ResetLab(), over="all")
        fb_iters += _minlabel_fixpoint(g_rev, rev_min)
        # ---- DECIDE -----------------------------------------------------
        transfer_state(g_rev, g_fwd, {"lab_b": "lab"})
        s = g_fwd.vertex_map(Decide(), over="all")
        if s["decided"] == 0:  # pragma: no cover — contradicts the proof
            raise RuntimeError("scc round decided nothing; invariant broken")
        undecided = s["undecided"]
    return {"rounds": rounds, "trimmed": trims, "fb_iterations": fb_iters,
            "wall_s": time.perf_counter() - t0, "state_names": STATE}


# ------------------------------------------------------------- bow-tie
class ReachEdge(EdgeKernel):
    """Boolean reachability wave along this graph's edge direction: any
    frontier source marks its out-neighbours reached; the newly reached
    nodes form the next frontier (already-reached targets stop accepting
    via target_active, so each node is touched once)."""

    reduce = "or"
    value_dtype = np.int64

    def source_values(self, state, out_deg):
        return np.ones(len(out_deg), dtype=np.int64)

    def source_values_at(self, state, out_deg, idx):
        return np.ones(len(idx), dtype=np.int64)

    def target_active(self, state):
        return ~state["reach"]

    def apply(self, state, agg, touched, shard):
        new = touched & (agg > 0) & ~state["reach"]
        state["reach"] |= new
        return new, {"new": int(new.sum())}


class SeedReachFromLabel(VertexKernel):
    """reach := (scc == label); frontier := that seed set. The predicate
    is shard-local — the (possibly O(n)-sized) core member list never
    ships anywhere."""

    def __init__(self, label: int):
        self.label = int(label)

    def update(self, state, mask, shard):
        seed = state["scc"] == self.label
        state["reach"] = seed.copy()
        return seed, {}


def mark_reach_from_scc(g, label: int) -> dict:
    """BFS-mark state['reach'] on every node reachable (along this
    graph's edge direction) from the scc == ``label`` member set;
    requires a prior scc() run to have left 'scc' state on ``g``."""
    t0 = time.perf_counter()
    g.init_algo({"reach": lambda lo, hi: np.zeros(hi - lo, dtype=bool)})
    g.vertex_filter(SeedReachFromLabel(label), over="all")
    waves = 0
    while g.frontier_count:
        g.edge_map(ReachEdge())
        waves += 1
    return {"waves": waves, "wall_s": time.perf_counter() - t0}


def bowtie_labels(g, grev) -> "np.ndarray":
    """Broder et al. WWW'00 bow-tie classification over the twin graphs:
    returns one of 'core' / 'in' / 'out' / 'other' per node. Runs scc(),
    picks the giant label (ties to smallest) from a DISTRIBUTED size
    count folded to one row per block, then two ReachEdge sweeps seeded
    by the shard-local scc == giant predicate. Driver state: the final
    n-length class array (results-at-sandbox-scale convention; shard
    state stays distributed throughout)."""
    import pyarrow as pa
    import ray.data  # noqa: F401  (result_dataset)

    from ligrust_ray.stages import shuffle

    if g.n == 0:
        return np.array([], dtype=object)
    scc(g, grev)
    sizes = shuffle.grouped_agg(
        g.result_dataset(["scc"]).map_batches(
            lambda t: pa.table({"scc": t.column("scc").cast(pa.int64())}),
            batch_format="pyarrow"),
        ["scc"], {"n": (None, "count")})

    def top1(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"scc": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        n = t.column("n").to_numpy()
        s = t.column("scc").to_numpy()
        best = np.lexsort((s, -n))[0]
        return pa.table({"scc": pa.array([s[best]]),
                         "n": pa.array([n[best]])})

    tops = sizes.map_batches(top1, batch_format="pyarrow").to_pandas()
    tops = tops.sort_values(["n", "scc"], ascending=[False, True])
    giant = int(tops.iloc[0]["scc"])

    mark_reach_from_scc(g, giant)
    transfer_state(g, grev, {"scc": "scc"})
    mark_reach_from_scc(grev, giant)

    fwd = g.collect_state(["reach", "scc"])
    bwd = grev.collect_state(["reach"])["reach"]
    core = fwd["scc"] == giant
    return np.where(core, "core",
                    np.where(bwd & ~core, "in",
                             np.where(fwd["reach"] & ~core, "out",
                                      "other")))
