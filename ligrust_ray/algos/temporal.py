"""Time-respecting reachability over temporal edge streams.

A temporal edge (u, v, t) is traversable only at a time t >= arr(u): the
earliest-arrival relaxation of Wu et al., "Path Problems in Temporal
Graphs" (VLDB 2014). The distributed path runs synchronous co_group
rounds over the timestamped edge Dataset rather than through the CSR
kernels — each edge carries its own timestamp attribute (a multigraph
with per-edge state), so the natural Ray Data shape is: co-partition
(edges by src, arrivals by node), relax vectorised per partition,
grouped-min merge.

Partitioning assumption: the edge table hash-partitions by src every
round. At 100-TB scale you would materialize the edge table in that
layout once and reuse it across rounds (the round loop re-keys the tiny
arrival set, not the bodies); the arrival state is one (node, arr) row
per REACHED node, never an n-length driver array.

Below ``LOCAL_EDGE_GATE`` edges the whole relaxation runs as ONE Ray
task on numpy arrays (the coloring/truss/walks fast-path precedent) —
8 rounds of keyed shuffles on a 10k-row input is pure dispatch
overhead. The distributed path is parity-forced in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ligrust_ray.stages import shuffle

START = -1           # source departs at any time: every epoch-us >= -1
UNREACHED = 1 << 62  # internal sentinel; never emitted
LOCAL_EDGE_GATE = 1 << 22


def _relax_local(src: np.ndarray, dst: np.ndarray, t: np.ndarray,
                 source: int, rounds: int) -> pa.Table:
    """Single-task numpy fixpoint: identical semantics to the distributed
    rounds (synchronous — each round relaxes against the PREVIOUS round's
    arrivals), early-exit once a round changes nothing (the remaining
    rounds are no-ops, so the capped unrolled oracle still agrees)."""
    n = int(max(src.max(), dst.max(), source)) + 1 if len(src) else source + 1
    arr = np.full(n, UNREACHED, dtype=np.int64)
    arr[source] = START
    for _ in range(rounds):
        ok = t >= arr[src]
        if not ok.any():
            break
        nxt = arr.copy()
        np.minimum.at(nxt, dst[ok], t[ok])
        if np.array_equal(nxt, arr):
            break
        arr = nxt
    ids = np.flatnonzero(arr < UNREACHED)
    return pa.table({"node": pa.array(ids.astype(np.int64)),
                     "arr": pa.array(arr[ids])})


@ray.remote
def _relax_local_task(blocks: list[pa.Table], source: int,
                      rounds: int) -> pa.Table:
    tbl = pa.concat_tables(blocks) if blocks else pa.table(
        {"src": pa.array([], type=pa.int64()),
         "dst": pa.array([], type=pa.int64()),
         "t": pa.array([], type=pa.int64())})
    return _relax_local(tbl.column("src").to_numpy().astype(np.int64),
                        tbl.column("dst").to_numpy().astype(np.int64),
                        tbl.column("t").to_numpy().astype(np.int64),
                        source, rounds)


def earliest_arrival(edges: ray.data.Dataset, source: int = 0,
                     rounds: int = 8, num_partitions: int | None = None,
                     mode: str = "auto") -> ray.data.Dataset:
    """``edges`` = (src:int64, dst:int64, t:int64) temporal edge rows
    (epoch microseconds). Returns (node, arr) for every node reached
    within ``rounds`` synchronous relaxation rounds — the fixpoint when
    ``rounds`` >= the temporal diameter; extra rounds are no-ops on both
    the engine and the unrolled SQL oracle, so a FIXED round cap keeps
    the two bit-identical regardless of convergence depth (rounds that
    change nothing are skipped, which cannot alter the capped result).

    ``mode``: "auto" gates the single-task numpy path at
    LOCAL_EDGE_GATE edges; "distributed" forces the co_group rounds
    (tests); "local" forces the single task."""
    if mode not in ("auto", "distributed", "local"):
        raise ValueError(f"mode must be auto|distributed|local, got {mode!r}")
    edges = edges.materialize()
    m = edges.count()
    if mode == "local" or (mode == "auto" and m <= LOCAL_EDGE_GATE):
        refs = edges.to_arrow_refs()
        out = ray.get(_relax_local_task.remote(ray.get(refs), source, rounds))
        return ray.data.from_arrow(out)

    if num_partitions is None:
        num_partitions = max(4, min(64, m // 500_000))
    i64 = pa.int64()
    e_schema = pa.schema([("src", i64), ("dst", i64), ("t", i64)])
    a_schema = pa.schema([("node", i64), ("arr", i64)])
    arr = ray.data.from_arrow(pa.table({
        "node": pa.array([source], type=i64),
        "arr": pa.array([START], type=i64)}))

    def relax(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"node": pd.Series([], dtype="int64"),
                              "arr": pd.Series([], dtype="int64")})
        if not len(lf) or not len(rf):
            return empty
        j = lf.merge(rf.rename(columns={"node": "src"}), on="src",
                     how="inner")
        j = j[j["t"] >= j["arr"]]
        if not len(j):
            return empty
        g = j.groupby("dst", as_index=False)["t"].min()
        return g.rename(columns={"dst": "node", "t": "arr"})

    prev_sig = (1, START)   # (row count, arr sum) — strictly improving
    for _ in range(rounds):
        cand = shuffle.co_group(edges, arr, l_on="src", r_on="node",
                                fn=relax, num_partitions=num_partitions,
                                l_schema=e_schema, r_schema=a_schema)
        arr = shuffle.grouped_agg(arr.union(cand), ["node"],
                                  {"arr": ("arr", "min")},
                                  num_partitions=num_partitions
                                  ).materialize()
        sig = (arr.count(), int(arr.sum("arr")))
        if sig == prev_sig:   # fixpoint: remaining rounds are no-ops
            break             # (arrivals only ever decrease or appear)
        prev_sig = sig
    return arr
