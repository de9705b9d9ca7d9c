"""Truss peeling — per-edge triangle-support cohesion (NEW operator, not in
the reference; the k-truss primitive of Cohen 2008 with a data-dependent
threshold so the peel is non-degenerate at every data scale).

Spec (SQL-replicable, see __ray_entry__._truss_sql):
1. edge set = distinct canonical undirected simple edges (a < b);
2. support(e) = number of triangles of the CURRENT edge set containing e;
3. threshold T = lower median of the INITIAL supports (zero-support edges
   included): sorted_supports[(m - 1) // 2] — DuckDB quantile_disc(s, 0.5);
4. synchronous peel, ``rounds`` (default 16) fixed rounds: round r removes
   every edge with current support < T simultaneously (died_round = r);
5. output (a, b, died_round) for EVERY initial edge; died_round = 0 means
   the edge survived all rounds (= it is in the T-truss fixed point
   whenever the peel converged within the cap, which the engine detects —
   a round that kills nothing makes all later rounds no-ops, so early
   exit is exact, and fixed ``rounds`` keeps the oracle unrollable).

Scale shape: triangle enumeration reuses the (deg, id)-rank orientation of
``algos.triangles`` (oriented out-degree O(sqrt(m)) bounds the wedge
count); per-round support rows are emitted in ORIENTED coordinates so
every shuffle in the loop — the wedge<->edge probe co_group, the support
grouped_agg, and the survive/die filter co_group — keys by the oriented
source, whose skew the orientation bounds. No O(n) or O(m) driver state
on the distributed path; the driver sees per-round death counts only.
Below ``SINGLE_TASK_MAX_EDGES`` the whole peel runs in ONE Ray task
(numpy; same spec exactly) — at typical graph sizes the per-round shuffle
fixed cost dwarfs the compute, and the distributed path is parity-tested
against it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ligrust_ray.algos.triangles import (_EDGE_SCHEMA, canon_undirected,
                                         infer_n, orient_edges)
from ligrust_ray.stages import shuffle

TRUSS_ROUNDS = 16
# below this many undirected edges the peel runs in one Ray task; above it
# the per-round shuffle loop takes over (the 10^12-edge path)
SINGLE_TASK_MAX_EDGES = 1 << 22

_OUT_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                         ("died_round", pa.int64())])
_SUP_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                         ("sup", pa.int64())])


def _np_support(u: np.ndarray, v: np.ndarray, rank_v: np.ndarray
                ) -> np.ndarray:
    """Per-edge triangle support of an oriented edge set (u -> v in rank
    order; ``rank_v`` = rank of each v), vectorised: per-apex wedge
    generation + sorted scalar-key probe. Counts align with input order.
    Node ids must fit 2^32 (always true on the single-task path; the
    distributed path has no such encode)."""
    m = len(u)
    if m == 0:
        return np.zeros(0, dtype=np.int64)
    if int(max(u.max(), v.max())) >= (1 << 32):
        raise ValueError("_np_support: node ids >= 2^32 need the "
                         "distributed path")
    order = np.lexsort((rank_v, u))     # per-apex neighbors in rank order
    us, vs = u[order], v[order]
    keyset = np.sort(us * (np.int64(1) << 32) + vs)
    starts = np.flatnonzero(np.concatenate(([True], us[1:] != us[:-1])))
    bounds = np.append(starts, m)
    hits_a, hits_b = [], []
    for i in range(len(starts)):
        lo, hi = bounds[i], bounds[i + 1]
        d = hi - lo
        if d < 2:
            continue
        nb = vs[lo:hi]                   # rank ascending (lexsort above)
        ii, jj = np.triu_indices(d, k=1)
        x, y = nb[ii], nb[jj]
        # wedge endpoints are already in rank order (x before y), so the
        # closing edge, if present, is oriented exactly x -> y
        wk = x * (np.int64(1) << 32) + y
        pos = np.minimum(np.searchsorted(keyset, wk), len(keyset) - 1)
        hit = keyset[pos] == wk
        ap = np.full(len(ii), us[lo], dtype=np.int64)
        # three oriented edges of each triangle: (ap,x), (ap,y), (x,y)
        hits_a.append(np.concatenate([ap[hit], ap[hit], x[hit]]))
        hits_b.append(np.concatenate([x[hit], y[hit], y[hit]]))
    out = np.zeros(m, dtype=np.int64)
    if hits_a:
        tk = (np.concatenate(hits_a) * (np.int64(1) << 32)
              + np.concatenate(hits_b))
        uk, cnt = np.unique(tk, return_counts=True)
        ek = u * (np.int64(1) << 32) + v
        pos = np.minimum(np.searchsorted(uk, ek), max(len(uk) - 1, 0))
        hit = uk[pos] == ek if len(uk) else np.zeros(m, bool)
        out[hit] = cnt[pos[hit]]
    return out


@ray.remote(num_cpus=1)
def _truss_peel_task(blocks: list, rounds: int,
                     threshold: int | None) -> pa.Table:
    """Single-task fast path: the full peel over one worker's memory.
    ``blocks`` are canonical (src < dst) distinct edge blocks."""
    tabs = [pa.Table.from_pandas(b, preserve_index=False)
            if isinstance(b, pd.DataFrame) else b
            for b in ray.get(list(blocks))]
    tabs = [t for t in tabs if t.num_rows and "src" in t.schema.names]
    if not tabs:
        return pa.table({"a": pa.array([], type=pa.int64()),
                         "b": pa.array([], type=pa.int64()),
                         "died_round": pa.array([], type=pa.int64())},
                        schema=_OUT_SCHEMA)
    a = np.concatenate([t.column("src").to_numpy() for t in tabs]) \
        .astype(np.int64)
    b = np.concatenate([t.column("dst").to_numpy() for t in tabs]) \
        .astype(np.int64)
    n = int(max(a.max(), b.max())) + 1
    deg = np.zeros(n, dtype=np.int64)
    np.add.at(deg, a, 1)
    np.add.at(deg, b, 1)
    # (deg, id) rank, identical to orient_edges
    a_first = (deg[a] < deg[b]) | ((deg[a] == deg[b]) & (a < b))
    u = np.where(a_first, a, b)
    v = np.where(a_first, b, a)
    rank = deg * np.int64(n) + np.arange(n, dtype=np.int64)
    died = np.zeros(len(a), dtype=np.int64)
    alive = np.ones(len(a), dtype=bool)
    T = threshold
    for r in range(1, rounds + 1):
        sup = np.zeros(len(a), dtype=np.int64)
        sup[alive] = _np_support(u[alive], v[alive], rank[v[alive]])
        if T is None:                    # lower median of INITIAL supports
            T = int(np.sort(sup)[(len(sup) - 1) // 2])
        kill = alive & (sup < T)
        if not kill.any():
            break                        # all later rounds are no-ops
        died[kill] = r
        alive &= ~kill
        if not alive.any():
            break
    return pa.table({"a": pa.array(a), "b": pa.array(b),
                     "died_round": pa.array(died)}, schema=_OUT_SCHEMA)


def _edge_support_ds(alive: ray.data.Dataset, num_partitions: int
                     ) -> ray.data.Dataset:
    """(src, dst, sup) per-edge triangle support of an oriented edge
    Dataset, in oriented coordinates — wedges per source partition,
    bucketed wedge<->edge co_group probe (emitting the three ORIENTED
    edges of each closed triangle), one grouped_agg count."""
    wedge_schema = pa.schema([("x", pa.int64()), ("y", pa.int64()),
                              ("apex", pa.int64())])

    def make_wedges(g: pd.DataFrame) -> pa.Table:
        u = g["src"].to_numpy(dtype=np.int64)
        v = g["dst"].to_numpy(dtype=np.int64)
        vd = g["vdeg"].to_numpy(dtype=np.int64)
        order = np.lexsort((v, vd, u))   # per-apex nb sorted by (deg, id)
        u, v = u[order], v[order]
        starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        bounds = np.append(starts, len(u))
        xs, ys, ap = [], [], []
        for i in range(len(starts)):
            lo, hi = bounds[i], bounds[i + 1]
            d = hi - lo
            if d < 2:
                continue
            nb = v[lo:hi]
            ii, jj = np.triu_indices(d, k=1)
            xs.append(nb[ii])
            ys.append(nb[jj])
            ap.append(np.full(len(ii), u[lo], dtype=np.int64))
        if not xs:
            z = pa.array([], type=pa.int64())
            return pa.table({"x": z, "y": z, "apex": z},
                            schema=wedge_schema)
        return pa.table({"x": pa.array(np.concatenate(xs)),
                         "y": pa.array(np.concatenate(ys)),
                         "apex": pa.array(np.concatenate(ap))},
                        schema=wedge_schema)

    wedges = (alive.groupby("part")
              .map_groups(make_wedges, batch_format="pandas"))

    def probe(wt: pa.Table, et: pa.Table) -> pa.Table:
        esch = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
        if not wt.num_rows or not et.num_rows:
            return esch.empty_table()
        # Acero left-semi join: wedges whose (x, y) closes an edge —
        # no pandas copy, no id-range encode
        hit = wt.join(et.rename_columns(["x", "y"]), keys=["x", "y"],
                      join_type="left semi")
        x = hit.column("x").to_numpy().astype(np.int64)
        y = hit.column("y").to_numpy().astype(np.int64)
        ap = hit.column("apex").to_numpy().astype(np.int64)
        return pa.table({
            "src": pa.array(np.concatenate([ap, ap, x])),
            "dst": pa.array(np.concatenate([x, y, y]))}, schema=esch)

    tri_edges = shuffle.co_group(
        wedges, alive.select_columns(["src", "dst"]),
        l_on="x", r_on="src", fn=probe, num_partitions=num_partitions,
        l_schema=wedge_schema, r_schema=_EDGE_SCHEMA, arrow_fn=True)
    return shuffle.grouped_agg(tri_edges, ["src", "dst"],
                               {"sup": (None, "count")},
                               num_partitions=num_partitions)


@ray.remote(num_cpus=0)
def _die_count_block(b) -> int:
    """Newly-dead edge count of one tagged block (trivial compute:
    num_cpus=0). Raw block refs DO see zero-column empty blocks from
    group-less map_groups partitions — guard for the column."""
    t = (pa.Table.from_pandas(b, preserve_index=False)
         if isinstance(b, pd.DataFrame) else b)
    if t.num_rows == 0 or "__die" not in t.column_names:
        return 0
    return int(pa.compute.sum(
        pa.compute.cast(t.column("__die"), pa.int64())).as_py() or 0)


_ALIVE_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                           ("vdeg", pa.int64()), ("part", pa.int64())])


@ray.remote(num_cpus=1)
def _alive_coalesce(block_refs: list) -> pa.Table:
    """Concat a handful of tagged blocks, keep survivors, drop the tag —
    rebuilding the next round's alive set as ONE Arrow block per task.
    This caps the loop's block count at num_partitions: without it each
    co_group union SUMS the two sides' block counts, so blocks (and task
    counts) grow ~3x per round and the peel goes exponential."""
    tabs = []
    for b in ray.get(list(block_refs)):
        t = (pa.Table.from_pandas(b, preserve_index=False)
             if isinstance(b, pd.DataFrame) else b)
        if t.num_rows == 0 or "__die" not in t.column_names:
            continue
        keep = pa.compute.invert(pa.compute.cast(t.column("__die"),
                                                 pa.bool_()))
        tabs.append(t.filter(keep).select(
            [f.name for f in _ALIVE_SCHEMA]).cast(_ALIVE_SCHEMA))
    if not tabs:
        return _ALIVE_SCHEMA.empty_table()
    return pa.concat_tables(tabs).combine_chunks()


def _median_support(sup: ray.data.Dataset, m: int) -> int:
    """Exact lower median of per-edge supports including the zero-support
    edges absent from ``sup``: a value histogram (grouped_agg over sup
    values — O(distinct supports) driver rows, the bounded-sketch shape)
    plus ``m - |sup|`` implicit zeros."""
    hist = shuffle.grouped_agg(sup.select_columns(["sup"]), ["sup"],
                               {"c": (None, "count")}).to_pandas()
    if not len(hist):
        return 0        # no edge is in any triangle: all supports zero
    hist = hist.sort_values("sup")
    vals = hist["sup"].to_numpy(dtype=np.int64)
    cnts = hist["c"].to_numpy(dtype=np.int64)
    zeros = m - int(cnts.sum())
    vals = np.concatenate(([np.int64(0)], vals))
    cnts = np.concatenate(([np.int64(zeros)], cnts))
    target = (m - 1) // 2                # index of the lower median
    cum = np.cumsum(cnts)
    return int(vals[np.searchsorted(cum, target + 1)])


def _truss_ckpt_latest(root: str) -> dict | None:
    """Highest complete round manifest under ``root`` (the
    state/checkpoint.py commit-point convention: manifest written last,
    atomic rename; a killed run leaves at most one incomplete round dir,
    which resume ignores)."""
    import json
    import os
    import re

    if not os.path.isdir(root):
        return None
    best = None
    for name in os.listdir(root):
        mm = re.fullmatch(r"round_(\d{6})", name)
        if not mm:
            continue
        mf = os.path.join(root, name, "manifest.json")
        if os.path.exists(mf):
            with open(mf) as f:
                man = json.load(f)
            if man.get("complete") and (best is None
                                        or man["round"] > best["round"]):
                best = man
    return best


_FP_MOD = (1 << 61) - 1


def _edge_fp(und: ray.data.Dataset) -> int:
    """Order-free content fingerprint of a canonical edge set (per-block
    partial sums mod a Mersenne prime) — guards checkpoint resume
    against a same-edge-count different graph reusing a stale dir."""
    def part(t: pa.Table) -> pa.Table:
        a = t.column("src").to_numpy().astype(np.int64)
        b = t.column("dst").to_numpy().astype(np.int64)
        v = ((a % _FP_MOD) * 1_000_003 + b) % _FP_MOD
        return pa.table({"x": pa.array([int(v.sum() % _FP_MOD)],
                                       type=pa.int64())})

    s = und.map_batches(part, batch_format="pyarrow").to_pandas()
    return int(s["x"].sum() % _FP_MOD)


def _truss_ckpt_write(root: str, r: int, alive: ray.data.Dataset | None,
                      died: ray.data.Dataset, thr: int, n_alive: int,
                      m: int, fp: int) -> tuple[ray.data.Dataset | None,
                                                ray.data.Dataset]:
    """Persist one peel round: survivor edges + this round's deaths as
    partitioned parquet, then the manifest (atomic tmp+rename = commit).
    The round dir is CLEARED first — write_parquet appends into
    non-empty dirs, so leftovers from a stale/incomplete run would
    duplicate edges on re-read. Returns datasets re-anchored to the
    written files so later rounds' lineage roots on disk, not on
    in-memory block refs."""
    import json
    import os
    import shutil

    d = os.path.join(root, f"round_{r:06d}")
    if os.path.isdir(d):
        shutil.rmtree(d)
    ad = os.path.join(d, "alive")
    dd = os.path.join(d, "died")
    os.makedirs(dd, exist_ok=True)
    died.write_parquet(dd)
    if alive is not None:
        os.makedirs(ad, exist_ok=True)
        alive.write_parquet(ad)
    manifest = {"round": r, "T": int(thr), "n_alive": int(n_alive),
                "m": int(m), "fp": int(fp),
                "alive_dir": ad if alive is not None else None,
                "died_dirs": [os.path.join(root, f"round_{k:06d}", "died")
                              for k in range(1, r + 1)],
                "complete": True}
    tmp = os.path.join(d, ".manifest.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(d, "manifest.json"))
    alive_out = None
    if alive is not None:
        alive_out = ray.data.read_parquet(ad).map_batches(
            lambda t: t.select([f.name for f in _ALIVE_SCHEMA])
            .cast(_ALIVE_SCHEMA), batch_format="pyarrow")
    died_out = ray.data.read_parquet(dd).map_batches(
        lambda t: t.select([f.name for f in _OUT_SCHEMA])
        .cast(_OUT_SCHEMA), batch_format="pyarrow")
    return alive_out, died_out


def truss_peel(edges: ray.data.Dataset | pa.Table, rounds: int = TRUSS_ROUNDS,
               threshold: int | None = None, mode: str = "auto",
               num_partitions: int = 16,
               checkpoint_dir: str | None = None) -> ray.data.Dataset:
    """(a, b, died_round) for every distinct canonical undirected simple
    edge; see module docstring for the peel spec. ``threshold`` overrides
    the median-of-initial-supports default.

    ``checkpoint_dir`` (forces the distributed path): persist every peel
    round's survivors + deaths + loop scalars (T, n_alive) and RESUME
    from the highest complete round on re-invocation — the round-level
    manifest story of state/checkpoint.py applied to the longest-running
    multi-round co_group loop. The m recorded in the manifest must match
    the input's edge count, else the checkpoint is ignored (stale dir
    guard)."""
    if mode not in ("auto", "task", "distributed"):
        raise ValueError(f"mode must be auto|task|distributed, got {mode!r}")
    und = canon_undirected(edges)
    m = und.count()
    if m == 0:
        return ray.data.from_arrow(pa.table(
            {"a": pa.array([], type=pa.int64()),
             "b": pa.array([], type=pa.int64()),
             "died_round": pa.array([], type=pa.int64())},
            schema=_OUT_SCHEMA))
    if checkpoint_dir is not None:
        mode = "distributed"
    elif mode == "auto":
        mode = "task" if m <= SINGLE_TASK_MAX_EDGES else "distributed"

    if mode == "task":
        from ligrust_ray.dataops.dedup import _block_refs
        ref = _truss_peel_task.remote(_block_refs(und), rounds, threshold)
        return ray.data.from_arrow_refs([ref])

    from ligrust_ray.dataops.dedup import _block_refs

    n = infer_n(und)
    died_parts: list[ray.data.Dataset] = []
    T = threshold
    n_alive = m          # tracked arithmetically — no per-round count job
    start = 1
    alive = None
    fp = _edge_fp(und) if checkpoint_dir is not None else 0
    if checkpoint_dir is not None:
        man = _truss_ckpt_latest(checkpoint_dir)
        if man is not None and man["m"] == m and man.get("fp") == fp:
            T = man["T"]
            n_alive = man["n_alive"]
            start = man["round"] + 1
            if man["alive_dir"] is not None:
                alive = ray.data.read_parquet(
                    man["alive_dir"]).map_batches(
                    lambda t: t.select([f.name for f in _ALIVE_SCHEMA])
                    .cast(_ALIVE_SCHEMA), batch_format="pyarrow")
            died_parts = [
                ray.data.read_parquet(dd).map_batches(
                    lambda t: t.select([f.name for f in _OUT_SCHEMA])
                    .cast(_OUT_SCHEMA), batch_format="pyarrow")
                for dd in man["died_dirs"]]
    if alive is None and n_alive:
        alive = orient_edges(und, n, num_partitions=num_partitions)

    for r in range(start, (rounds + 1) if n_alive else start):
        sup = _edge_support_ds(alive, num_partitions).materialize()
        if T is None:
            T = _median_support(sup, m)
        thr = int(T)

        def split(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
            # left join alive x sup on the oriented edge, zero-fill; tag
            # rows die/survive — one pass, both outputs in one table
            j = lf.merge(rf, on=["src", "dst"], how="left")
            s = j["sup"].fillna(0).to_numpy(dtype=np.int64)
            j = j.drop(columns=["sup"])
            j["__die"] = s < thr
            return j

        tagged = shuffle.co_group(
            alive, sup, l_on="src", r_on="src", fn=split,
            num_partitions=num_partitions,
            l_schema=_ALIVE_SCHEMA, r_schema=_SUP_SCHEMA).materialize()
        refs = _block_refs(tagged)
        n_died = sum(ray.get([_die_count_block.remote(b) for b in refs]))
        if n_died == 0:
            break                        # fixed point: later rounds no-op

        def dead_rows(df: pd.DataFrame, _r=r) -> pd.DataFrame:
            d = df[df["__die"]]
            u = d["src"].to_numpy(dtype=np.int64)
            v = d["dst"].to_numpy(dtype=np.int64)
            return pd.DataFrame({"a": np.minimum(u, v),
                                 "b": np.maximum(u, v),
                                 "died_round": np.full(len(u), _r,
                                                       dtype=np.int64)})

        # LAZY over the materialized tagged snapshot (plan depth 1 each);
        # all 16 branches execute in the single job that consumes `out`
        died_parts.append(tagged.map_batches(dead_rows,
                                             batch_format="pandas"))
        n_alive -= n_died
        if n_alive:
            # survivors rebuilt as <= num_partitions Arrow blocks via raw
            # block-ref tasks (no executor job; see _alive_coalesce)
            groups = np.array_split(np.arange(len(refs)),
                                    min(num_partitions, len(refs)))
            alive = ray.data.from_arrow_refs(
                [_alive_coalesce.remote([refs[i] for i in g])
                 for g in groups if len(g)])
        else:
            alive = None
        if checkpoint_dir is not None:
            alive, died_anchor = _truss_ckpt_write(
                checkpoint_dir, r, alive, died_parts[-1], thr,
                n_alive, m, fp)
            died_parts[-1] = died_anchor
        if n_alive == 0:
            break

    def survivors(df: pd.DataFrame) -> pd.DataFrame:
        df = df[~df["__die"]] if "__die" in df.columns else df
        u = df["src"].to_numpy(dtype=np.int64)
        v = df["dst"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"a": np.minimum(u, v), "b": np.maximum(u, v),
                             "died_round": np.zeros(len(u), dtype=np.int64)})

    # n_alive == 0: skip the survivors branch — map_batches UDFs are
    # SKIPPED on empty blocks, so an empty alive would leak its own
    # (src, dst, vdeg, part) schema into the union
    parts = ([alive.map_batches(survivors, batch_format="pandas")]
             if n_alive else []) + died_parts
    out = parts[0]
    for d in parts[1:]:
        out = out.union(d)
    return out
