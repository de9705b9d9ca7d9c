"""Deterministic random-walk corpus generation — the DeepWalk/node2vec
front-end (Perozzi et al. KDD'14): one fixed-length walk per start node
over the distinct directed edge set, emitted as (start, step, node) rows.
This is the op a 100 TB embedding pipeline runs to turn a link graph into
a token corpus; a NEW operator, not in the reference (which has no walk
sampler), built on the repo's shuffle algebra.

Spec (SQL-replicable, see __ray_entry__._walks_sql):
1. adjacency = DISTINCT directed edges; per source, neighbors indexed
   0..deg-1 in dst-ascending order (SQL ROW_NUMBER - 1);
2. the walk from ``start`` at node ``cur`` on step ``t`` (1-based) moves to
   the neighbor with index ``_hash_step(start, cur, t) % deg(cur)`` — a
   pure integer hash, so engine and oracle pick the SAME pseudo-random
   neighbor with no RNG state;
3. a walk reaching a node with out-degree 0 terminates (no row emitted for
   that or later steps);
4. output: (start, wid, step, node) for step = 1..length, one row per
   surviving walk-step; starts = every node id in [0, n) times
   walks_per_node walk ids (wid joins the chooser hash, weight _D — the
   SQL-oracled contract query runs walks_per_node=1, where the wid term
   is 0 and the column is constant).

Scale shape: the adjacency is hash-partitioned by source once; each step is
ONE bucketed co_group (walk frontier keyed by current node vs adjacency
keyed by source) with a vectorised in-partition chooser (group offsets +
searchsorted, no per-row Python); the frontier is rebuilt as <= P Arrow
blocks per step via zero-job block-ref coalesce tasks (same machinery as
algos/truss.py — co_group unions otherwise compound block counts per
round). Hub skew bounds: a hot CURRENT node funnels its walkers to one
partition; the chooser is O(rows) and walkers-per-node is bounded by
n * walks_per_node in the worst case — for heavy multi-walk corpora over
hub-dominated graphs, key the frontier by (cur, wid % S) with the
adjacency replicated S ways (the docs_tfidf salted-join shape).

Node ids must be < 2^31 so the hash arithmetic stays in exact int64/BIGINT
range on both sides (raised, not silent).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ligrust_ray.stages import shuffle

WALK_LENGTH = 4

# mixing constants: Knuth multiplicative + three primes; every intermediate
# fits int64 for ids < 2^31 (max term 2^31 * 2654435761 < 2^63)
_A, _B, _C, _D = 2654435761, 40503, 104729, 7919

_MOD = 1 << 32

_FRONTIER_SCHEMA = pa.schema([("start", pa.int64()), ("wid", pa.int64()),
                              ("cur", pa.int64())])
# no-backtrack walks also carry the previous node (excluded candidate)
_FRONTIER_SCHEMA_NB = pa.schema([("start", pa.int64()), ("wid", pa.int64()),
                                 ("cur", pa.int64()), ("prev", pa.int64())])
_ADJ_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
_OUT_SCHEMA = pa.schema([("start", pa.int64()), ("wid", pa.int64()),
                         ("step", pa.int64()), ("node", pa.int64())])


def _hash_step(start: np.ndarray, cur: np.ndarray, t: int,
               wid: np.ndarray | int = 0) -> np.ndarray:
    """The shared engine/SQL chooser hash (exact int64 arithmetic);
    ``wid`` (walk id within a start) decorrelates multi-walk corpora and
    contributes 0 for the SQL-oracled single-walk case."""
    return (start * _A + cur * _B + np.int64(t) * _C
            + wid * np.int64(_D)) % _MOD


def _empty_out() -> pa.Table:
    return _OUT_SCHEMA.empty_table()


def _advance_arrays(srcs: np.ndarray, dsts: np.ndarray, u: np.ndarray,
                    off: np.ndarray, deg: np.ndarray, start: np.ndarray,
                    wid: np.ndarray, cur: np.ndarray,
                    prev: np.ndarray | None, t: int, no_backtrack: bool,
                    keys: np.ndarray | None = None):
    """One chooser step over prepared adjacency arrays (sorted by
    (src, dst); ``u``/``off``/``deg`` per-source runs). Returns the
    surviving walkers' (start, wid, next, prev=old cur) — the shared
    kernel of the per-partition co_group fn and the single-task path."""
    pos = np.searchsorted(u, cur)
    pos = np.minimum(pos, max(len(u) - 1, 0))
    hit = (u[pos] == cur) if len(u) else np.zeros(len(cur), bool)
    h = _hash_step(start[hit], cur[hit], t, wid[hit])
    o_h, d_h = off[pos[hit]], deg[pos[hit]]
    if not no_backtrack:
        nxt = dsts[o_h + h % d_h]
        return start[hit], wid[hit], nxt, cur[hit]
    # exclude prev: locate it in cur's sorted neighbor run via a
    # composite (src << 32 | dst) key (ids < 2^31 guaranteed);
    # prev = -1 masks to 0xFFFFFFFF, matching no dst
    if keys is None:
        keys = ((srcs.astype(np.uint64) << np.uint64(32))
                | dsts.astype(np.uint64))
    prev_h = prev[hit]
    target = ((cur[hit].astype(np.uint64) << np.uint64(32))
              | (prev_h.astype(np.uint64) & np.uint64(0xFFFFFFFF)))
    q = np.searchsorted(keys, target)
    qc = np.minimum(q, max(len(keys) - 1, 0))
    found = keys[qc] == target
    cnt = d_h - found.astype(np.int64)
    live = cnt > 0                   # only-neighbor-is-prev: terminate
    k = h[live] % cnt[live]
    # removing the element at p_rel from the sorted run shifts later
    # candidates left: remaining[k] = original[k + (k >= p_rel)]
    p_rel = (qc - o_h)[live]
    k = k + (found[live] & (k >= p_rel)).astype(np.int64)
    nxt = dsts[o_h[live] + k]
    return start[hit][live], wid[hit][live], nxt, cur[hit][live]


# below this edge count (and start count) the whole walk loop runs in ONE
# Ray task over the full adjacency — length co_group dispatches cost more
# than the vectorised compute at sandbox scale (the same economics as
# truss.SINGLE_TASK_MAX_EDGES)
SINGLE_TASK_MAX = 1 << 22


@ray.remote(num_cpus=2)
def _walks_single_task(adj_refs: list, n: int, length: int, W: int,
                       no_backtrack: bool) -> pa.Table:
    tabs = [t if isinstance(t, pa.Table)
            else pa.Table.from_pandas(t, preserve_index=False)
            for t in ray.get(list(adj_refs))]
    tabs = [t for t in tabs if t.num_rows and "src" in t.column_names]
    if not tabs:
        return _empty_out()
    adj = pa.concat_tables(tabs)
    srcs = adj.column("src").to_numpy().astype(np.int64)
    dsts = adj.column("dst").to_numpy().astype(np.int64)
    order = np.lexsort((dsts, srcs))
    srcs, dsts = srcs[order], dsts[order]
    u, off = np.unique(srcs, return_index=True)
    deg = np.diff(np.append(off, len(srcs)))
    keys = ((srcs.astype(np.uint64) << np.uint64(32))
            | dsts.astype(np.uint64)) if no_backtrack else None

    ids = np.arange(n * W, dtype=np.int64)
    start, wid, cur = ids // W, ids % W, ids // W
    prev = np.full(n * W, -1, dtype=np.int64)
    outs = []
    for t in range(1, length + 1):
        start, wid, cur, prev = _advance_arrays(
            srcs, dsts, u, off, deg, start, wid, cur, prev, t,
            no_backtrack, keys)
        if not len(start):
            break
        outs.append((start, wid, np.full(len(start), t, dtype=np.int64),
                     cur))
    if not outs:
        return _empty_out()
    return pa.table({
        "start": pa.array(np.concatenate([o[0] for o in outs])),
        "wid": pa.array(np.concatenate([o[1] for o in outs])),
        "step": pa.array(np.concatenate([o[2] for o in outs])),
        "node": pa.array(np.concatenate([o[3] for o in outs]))},
        schema=_OUT_SCHEMA)


@ray.remote(num_cpus=1)
def _frontier_coalesce(block_refs: list, nb: bool = False) -> pa.Table:
    """Rebuild a step's frontier as one Arrow block per task (bounds the
    loop's block count at <= P; see module docstring)."""
    schema = _FRONTIER_SCHEMA_NB if nb else _FRONTIER_SCHEMA
    tabs = []
    for b in ray.get(list(block_refs)):
        t = (pa.Table.from_pandas(b, preserve_index=False)
             if isinstance(b, pd.DataFrame) else b)
        if t.num_rows and "start" in t.column_names:
            tabs.append(t.select(schema.names).cast(schema))
    if not tabs:
        return schema.empty_table()
    return pa.concat_tables(tabs).combine_chunks()


def random_walks(edges: ray.data.Dataset | pa.Table, n: int | None = None,
                 length: int = WALK_LENGTH, walks_per_node: int = 1,
                 no_backtrack: bool = False, mode: str = "auto",
                 num_partitions: int = 16) -> ray.data.Dataset:
    """(start, wid, step, node) walk corpus per the module spec —
    ``walks_per_node`` independent walks per start (wid = 0..W-1 enters
    the chooser hash, so walks from the same start decorrelate after the
    first step-from-identical-state; W*n start rows are generated
    distributed). ``no_backtrack`` gives the node2vec-style second-order
    variant: the walker's previous node is excluded from the candidate
    set (the chooser indexes the REMAINING neighbors in dst order — the
    SQL oracle re-ranks with a filtered ROW_NUMBER); a walker whose only
    neighbor is its predecessor terminates."""
    from ligrust_ray.algos.triangles import infer_n
    from ligrust_ray.dataops.dedup import _block_refs

    if mode not in ("auto", "task", "distributed"):
        raise ValueError(f"mode must be auto|task|distributed, got {mode!r}")
    if isinstance(edges, pa.Table):
        edges = ray.data.from_arrow(edges)
    adj = shuffle.distinct(edges.select_columns(["src", "dst"]),
                           ["src", "dst"]).materialize()
    m = adj.count()
    if m == 0:
        return ray.data.from_arrow(_empty_out())
    if n is None:
        n = infer_n(adj)
    if n >= (1 << 31):
        raise ValueError("random_walks: node ids >= 2^31 overflow the "
                         "exact-int64 chooser hash; shard the id space")

    W = int(walks_per_node)
    if mode == "auto":
        mode = ("task" if m <= SINGLE_TASK_MAX and n * W <= SINGLE_TASK_MAX
                else "distributed")
    if mode == "task":
        return ray.data.from_arrow_refs([_walks_single_task.remote(
            _block_refs(adj), n, length, W, no_backtrack)])
    f_schema = _FRONTIER_SCHEMA_NB if no_backtrack else _FRONTIER_SCHEMA
    f_cols = list(f_schema.names)

    def starts_block(t: pa.Table) -> pa.Table:
        ids = t.column("id").cast(pa.int64()).to_numpy()
        cols = {"start": pa.array(ids // W), "wid": pa.array(ids % W),
                "cur": pa.array(ids // W)}
        if no_backtrack:     # nothing to exclude on the first step
            cols["prev"] = pa.array(np.full(len(ids), -1, dtype=np.int64))
        return pa.table(cols, schema=f_schema)

    # distributed start generation: no O(n) driver array (range is lazy)
    frontier = (ray.data.range(n * W, override_num_blocks=num_partitions)
                .map_batches(starts_block, batch_format="pyarrow"))

    step_parts: list[ray.data.Dataset] = []
    for t in range(1, length + 1):
        def advance(lf: pd.DataFrame, rf: pd.DataFrame,
                    _t=t) -> pd.DataFrame:
            # vectorised chooser (the shared _advance_arrays kernel): sort
            # this partition's adjacency by (src, dst) -> per-src offsets
            if not len(lf) or not len(rf):
                return pd.DataFrame(
                    {c: pd.Series([], dtype=np.int64) for c in f_cols})
            rf = rf.sort_values(["src", "dst"], kind="mergesort")
            srcs = rf["src"].to_numpy(dtype=np.int64)
            dsts = rf["dst"].to_numpy(dtype=np.int64)
            u, off = np.unique(srcs, return_index=True)
            deg = np.diff(np.append(off, len(srcs)))
            prev = (lf["prev"].to_numpy(dtype=np.int64)
                    if no_backtrack else None)
            s2, w2, nxt, pr = _advance_arrays(
                srcs, dsts, u, off, deg,
                lf["start"].to_numpy(dtype=np.int64),
                lf["wid"].to_numpy(dtype=np.int64),
                lf["cur"].to_numpy(dtype=np.int64), prev, _t,
                no_backtrack)
            out = {"start": s2, "wid": w2, "cur": nxt}
            if no_backtrack:
                out["prev"] = pr
            return pd.DataFrame(out)

        stepped = shuffle.co_group(
            frontier, adj, l_on="cur", r_on="src", fn=advance,
            num_partitions=num_partitions,
            l_schema=f_schema, r_schema=_ADJ_SCHEMA).materialize()

        def out_rows(tb: pa.Table, _t=t) -> pa.Table:
            return pa.table({
                "start": tb.column("start").cast(pa.int64()),
                "wid": tb.column("wid").cast(pa.int64()),
                "step": pa.array(np.full(tb.num_rows, _t, dtype=np.int64)),
                "node": tb.column("cur").cast(pa.int64())},
                schema=_OUT_SCHEMA)

        # lazy over the materialized step snapshot; executed in the one
        # job that consumes the final union
        step_parts.append(stepped.map_batches(out_rows,
                                              batch_format="pyarrow"))
        if t < length:
            refs = _block_refs(stepped)
            if not refs:
                break
            groups = np.array_split(np.arange(len(refs)),
                                    min(num_partitions, len(refs)))
            frontier = ray.data.from_arrow_refs(
                [_frontier_coalesce.remote([refs[i] for i in g],
                                           no_backtrack)
                 for g in groups if len(g)])

    out = step_parts[0]
    for d in step_parts[1:]:
        out = out.union(d)
    return out


SKIPGRAM_WINDOW = 2

_PAIR_SCHEMA = pa.schema([("center", pa.int64()), ("context", pa.int64()),
                          ("n", pa.int64())])


def skipgram_pairs(walks: ray.data.Dataset, window: int = SKIPGRAM_WINDOW,
                   num_partitions: int = 16) -> ray.data.Dataset:
    """(center, context, n) — the word2vec training pairs of a walk corpus
    (directed: every ordered position pair within ``window`` steps of the
    same walk, 0 < |i - j| <= window, over the emitted steps). Input is
    ``random_walks`` output (start, step, node); each walk's positions
    co-locate via ONE start-keyed shuffle, pair generation is a vectorised
    in-partition self-merge, then one grouped count."""

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"center": pd.Series([], dtype=np.int64),
                                 "context": pd.Series([], dtype=np.int64)})
        j = df.merge(df, on=["start", "wid"], suffixes=("_a", "_b"))
        d = (j["step_a"] - j["step_b"]).abs()
        j = j[(d > 0) & (d <= window)]
        return pd.DataFrame({
            "center": j["node_a"].to_numpy(dtype=np.int64),
            "context": j["node_b"].to_numpy(dtype=np.int64)})

    raw = shuffle.grouped_apply(walks, ["start"], pairs,
                                num_partitions=num_partitions)
    out = shuffle.grouped_agg(raw, ["center", "context"],
                              {"n": (None, "count")},
                              num_partitions=num_partitions)
    return out.map_batches(
        lambda t: pa.table({"center": t.column("center").cast(pa.int64()),
                            "context": t.column("context").cast(pa.int64()),
                            "n": t.column("n").cast(pa.int64())},
                           schema=_PAIR_SCHEMA),
        batch_format="pyarrow")
