"""Triangle counting — NEW algorithm (BASELINE.json north_rule; not in the
reference). SURVEY.md §7.5: not frontier-shaped, so it is a pure Ray Data
pipeline rather than an edgeMap composition.

Algorithm (degree-ordered wedge check):
1. canonicalise: undirected simplification — ``(min(s,d), max(s,d))``,
   self-loops dropped, duplicates removed (in-batch pre-dedup, then one
   groupby shuffle);
2. orient each edge from the endpoint with (degree, id)-smaller rank to the
   larger — bounds every oriented out-degree by O(sqrt(m)), which is what
   keeps hub (Zipf) vertices from exploding the wedge count (the skew
   story);
3. hash-partition oriented edges by source (ONE groupby shuffle; a handful
   of groups, each processed with vectorised NumPy — no per-vertex pandas);
4. per partition: group edges by source, generate wedges (v, w) per source
   with ``triu_indices``, probe each wedge against the oriented edge set.
   Every hit is exactly one triangle, counted once (at its wedge apex).

Degrees, two modes (``deg_mode``):
- ``broadcast`` (default below ``DEG_BROADCAST_MAX`` nodes): per-batch
  (v, count) partials are combined into one int64 array and ``ray.put``
  once — an n-length array, bounded by the gate (2^24 nodes = 128 MB).
- ``dataset`` (the 10^10-node scale path): degrees stay a Dataset built by
  ``grouped_agg`` over exploded endpoints and are attached to each edge by
  TWO ``co_group`` passes (src then dst) — no O(n) driver or broadcast
  array anywhere; the oriented edge carries the (deg, id) rank it needs.

Closing-edge probe, two modes (``probe_mode``):
- ``broadcast`` (default below ``BROADCAST_MAX_EDGES`` oriented edges): the
  oriented edge set is broadcast ONCE as a sorted ``u * n + v`` key array
  (``ray.put``, ``np.searchsorted`` per partition).
- ``bucketed`` (the 10^12-edge scale path): wedges and edges are both
  hash-bucketed by the wedge's first endpoint (= the edge's source) and
  joined per bucket — NO broadcast of the edge set; the wedge stream is the
  shuffle (O(Σ C(outdeg,2)) rows, bounded by the sqrt-degree orientation).

Wedges are generated with endpoints in ORIENTATION order ((deg, id) rank),
so the closing edge of a real triangle is oriented exactly x -> y: one
probe per wedge. The rank order is read from the ``vdeg`` column carried on
each oriented edge, so wedge generation never touches a global array.

``per_node=True`` returns ``(total, Dataset)`` where the Dataset holds
(node_id, triangles) for nodes in >=1 triangle — built by ``grouped_agg``
over per-partition (node, count) partials; nothing n-length is ever
materialised on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ligrust_ray.stages import shuffle

# above this oriented-edge count the probe set stops being broadcast and
# the bucketed wedge<->edge hash join runs instead
BROADCAST_MAX_EDGES = 1 << 22
# above this node count degrees stay a Dataset (co_group attach) instead of
# one ray.put array — same gate idiom as the pull kernel's broadcast switch
DEG_BROADCAST_MAX = 1 << 24

_EDGE_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
_DEG_SCHEMA = pa.schema([("v", pa.int64()), ("deg", pa.int64())])


def _probe_hits(x: np.ndarray, y: np.ndarray, e_src: np.ndarray,
                e_dst: np.ndarray, n: int) -> np.ndarray:
    """Boolean mask: wedge (x, y) closed by an oriented edge x -> y.

    Scalar-key searchsorted when ``x * n + y`` fits int64; above that
    (n >= 2^31, i.e. >2 G nodes) a two-column pandas C merge — no 128-bit
    encode needed."""
    if n < (1 << 31):
        ks = np.sort(e_src * n + e_dst)
        wk = x * n + y
        pos = np.minimum(np.searchsorted(ks, wk), max(len(ks) - 1, 0))
        return (ks[pos] == wk) if len(ks) else np.zeros(len(wk), bool)
    w = pd.DataFrame({"x": x, "y": y})
    e = pd.DataFrame({"x": e_src, "y": e_dst, "__hit": True})
    j = w.merge(e, on=["x", "y"], how="left")
    return j["__hit"].notna().to_numpy()


def _per_node_rows(ids: np.ndarray, total: int) -> pd.DataFrame:
    """Partition-local (node_id, count) partials + one (-1, total) row —
    combined by np.unique, never an n-length array."""
    uv, cnt = np.unique(ids, return_counts=True)
    return pd.DataFrame({
        "node_id": np.append(uv, np.int64(-1)),
        "triangles": np.append(cnt.astype(np.int64), np.int64(total))})


def canon_undirected(edges: ray.data.Dataset | pa.Table) -> ray.data.Dataset:
    """Distinct canonical undirected simple edges (src < dst, self-loops
    dropped): in-batch pre-dedup then one distinct shuffle. Shared by the
    triangle and truss operators."""
    if isinstance(edges, pa.Table):
        edges = ray.data.from_arrow(edges)

    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        keep = s != d
        a = np.minimum(s[keep], d[keep]).astype(np.int64)
        b = np.maximum(s[keep], d[keep]).astype(np.int64)
        k = np.unique(np.stack([a, b], axis=1), axis=0)  # in-batch pre-dedup
        return pa.table({"src": k[:, 0], "dst": k[:, 1]}, schema=_EDGE_SCHEMA)

    return shuffle.distinct(edges.map_batches(canon, batch_format="pyarrow"),
                            ["src", "dst"]).materialize()


def infer_n(und: ray.data.Dataset) -> int:
    """max endpoint + 1 via per-batch scalar partials -> driver max over
    O(#blocks) rows."""
    vmax_parts = und.map_batches(
        lambda t: pa.table({"m": pa.array(
            [max(int(np.max(t.column("src").to_numpy())),
                 int(np.max(t.column("dst").to_numpy())))],
            type=pa.int64())}),
        batch_format="pyarrow").to_pandas()
    return int(vmax_parts["m"].max()) + 1


def orient_edges(und: ray.data.Dataset, n: int, deg_mode: str = "auto",
                 num_partitions: int = 16) -> ray.data.Dataset:
    """(deg, id)-rank orientation of a canonical undirected edge set:
    emits (src, dst, vdeg, part) with src the rank-smaller endpoint (so
    oriented out-degree is O(sqrt(m))), vdeg = degree of the oriented dst
    (per-apex neighbor rank order), part = src % num_partitions. Degrees
    broadcast under ``DEG_BROADCAST_MAX`` nodes, Dataset + two co_group
    attaches above (the 10^10-node path). Materialized."""
    if deg_mode == "auto":
        deg_mode = "broadcast" if n <= DEG_BROADCAST_MAX else "dataset"

    # ---- orientation: attach (deg, id) rank, emit (src, dst, vdeg, part)
    # with vdeg = degree of the ORIENTED dst (for per-apex neighbor order)
    def _orient(a, b, da, db):
        a_first = (da < db) | ((da == db) & (a < b))
        u = np.where(a_first, a, b).astype(np.int64)
        v = np.where(a_first, b, a).astype(np.int64)
        vdeg = np.where(a_first, db, da).astype(np.int64)
        return pa.table({"src": u, "dst": v, "vdeg": vdeg,
                         "part": (u % num_partitions).astype(np.int64)})

    if deg_mode == "broadcast":
        # per-batch (v, count) partials -> one gated n-length array, put once
        def deg_partial(t: pa.Table) -> pa.Table:
            v = np.concatenate([t.column("src").to_numpy(),
                                t.column("dst").to_numpy()])
            uv, cnt = np.unique(v, return_counts=True)
            return pa.table({"v": uv, "c": cnt.astype(np.int64)})

        deg = np.zeros(n, dtype=np.int64)
        for b in (und.map_batches(deg_partial, batch_format="pyarrow")
                  .iter_batches(batch_format="numpy")):
            np.add.at(deg, b["v"], b["c"])
        deg_ref = ray.put(deg)

        def orient_bcast(t: pa.Table) -> pa.Table:
            dg = ray.get(deg_ref)
            a = t.column("src").to_numpy()
            b = t.column("dst").to_numpy()
            return _orient(a, b, dg[a], dg[b])

        oriented = und.map_batches(orient_bcast,
                                   batch_format="pyarrow").materialize()
    else:
        # degrees as a Dataset: grouped_agg over exploded endpoints, then
        # two co_group passes attach deg to src and dst — no O(n) driver
        # or broadcast array (the 10^10-node path)
        degs = shuffle.grouped_agg(
            und.map_batches(
                lambda t: pa.table({"v": pa.concat_arrays(
                    [t.column("src").combine_chunks().cast(pa.int64()),
                     t.column("dst").combine_chunks().cast(pa.int64())])}),
                batch_format="pyarrow"),
            ["v"], {"deg": (None, "count")},
            num_partitions=num_partitions)

        def attach(col: str, out: str):
            def f(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
                j = lf.merge(rf.rename(columns={"v": col, "deg": out}),
                             on=col, how="inner")
                return j
            return f

        e1_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                               ("sdeg", pa.int64())])
        e1 = shuffle.co_group(und, degs, l_on="src", r_on="v",
                              fn=attach("src", "sdeg"),
                              num_partitions=num_partitions,
                              l_schema=_EDGE_SCHEMA, r_schema=_DEG_SCHEMA)
        e2 = shuffle.co_group(e1, degs, l_on="dst", r_on="v",
                              fn=attach("dst", "ddeg"),
                              num_partitions=num_partitions,
                              l_schema=e1_schema, r_schema=_DEG_SCHEMA)
        oriented = e2.map_batches(
            lambda t: _orient(t.column("src").to_numpy(),
                              t.column("dst").to_numpy(),
                              t.column("sdeg").to_numpy(),
                              t.column("ddeg").to_numpy()),
            batch_format="pyarrow").materialize()
    return oriented


def triangle_count(edges: ray.data.Dataset | pa.Table, n: int | None = None,
                   per_node: bool = False, num_partitions: int = 16,
                   probe_mode: str = "auto", deg_mode: str = "auto"):
    """Returns total int, or ``(total, Dataset[node_id, triangles])`` (nodes
    in >=1 triangle) when ``per_node``."""
    if probe_mode not in ("auto", "broadcast", "bucketed"):
        raise ValueError(f"probe_mode must be auto|broadcast|bucketed, "
                         f"got {probe_mode!r}")
    if deg_mode not in ("auto", "broadcast", "dataset"):
        raise ValueError(f"deg_mode must be auto|broadcast|dataset, "
                         f"got {deg_mode!r}")
    und = canon_undirected(edges)
    if und.count() == 0:
        empty = ray.data.from_arrow(pa.table(
            {"node_id": pa.array([], type=pa.int64()),
             "triangles": pa.array([], type=pa.int64())}))
        return (0, empty) if per_node else 0
    if n is None:
        n = infer_n(und)
    oriented = orient_edges(und, n, deg_mode=deg_mode,
                            num_partitions=num_partitions)

    m_oriented = oriented.count()
    if probe_mode == "auto":
        probe_mode = ("broadcast" if m_oriented <= BROADCAST_MAX_EDGES
                      else "bucketed")
    if probe_mode == "broadcast" and n >= (1 << 31):
        probe_mode = "bucketed"    # x*n+y scalar encode would overflow int64

    def wedges_of(g: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(x, y, apex) wedge arrays for one source-partition, endpoints in
        ORIENTATION ((deg, id)-rank) order — read from the carried vdeg
        column — so the closing edge, if present, is oriented exactly
        x -> y."""
        u = g["src"].to_numpy(dtype=np.int64)
        v = g["dst"].to_numpy(dtype=np.int64)
        vd = g["vdeg"].to_numpy(dtype=np.int64)
        order = np.lexsort((v, vd, u))        # per-apex nb sorted by (deg,id)
        u, v = u[order], v[order]
        starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        bounds = np.append(starts, len(u))
        xs, ys, ap = [], [], []
        for i in range(len(starts)):
            lo, hi = bounds[i], bounds[i + 1]
            d = hi - lo
            if d < 2:
                continue
            nb = v[lo:hi]                      # (deg, id)-rank ascending
            ii, jj = np.triu_indices(d, k=1)
            xs.append(nb[ii])
            ys.append(nb[jj])
            ap.append(np.full(len(ii), u[lo], dtype=np.int64))
        if not xs:
            z = np.zeros(0, dtype=np.int64)
            return z, z, z
        return np.concatenate(xs), np.concatenate(ys), np.concatenate(ap)

    if probe_mode == "broadcast":
        keys = np.sort(np.concatenate(
            [b["src"] * n + b["dst"]
             for b in oriented.iter_batches(batch_format="numpy")]))
        keys_ref = ray.put(keys)

        def probe_part(g: pd.DataFrame) -> pd.DataFrame:
            ks = ray.get(keys_ref)
            x, y, ap = wedges_of(g)
            wk = x * n + y                     # single probe: see wedges_of
            pos = np.minimum(np.searchsorted(ks, wk), max(len(ks) - 1, 0))
            hit = (ks[pos] == wk) if len(ks) else np.zeros(0, bool)
            total = int(np.count_nonzero(hit))
            if per_node:
                return _per_node_rows(
                    np.concatenate([ap[hit], x[hit], y[hit]]), total)
            return pd.DataFrame({"node_id": [-1], "triangles": [total]})

        res = (oriented.groupby("part")
               .map_groups(probe_part, batch_format="pandas"))
    else:
        # bucketed wedge<->edge co-group (stages/shuffle.co_group): both
        # sides hash-route by the wedge's first endpoint / the edge's
        # source — no broadcast of the edge set.
        wedge_schema = pa.schema([("x", pa.int64()), ("y", pa.int64()),
                                  ("apex", pa.int64())])

        def make_wedges(g: pd.DataFrame) -> pa.Table:
            x, y, ap = wedges_of(g)
            return pa.table({"x": pa.array(x), "y": pa.array(y),
                             "apex": pa.array(ap)}, schema=wedge_schema)

        wedges = (oriented.groupby("part")
                  .map_groups(make_wedges, batch_format="pandas"))

        def join_bucket(wt: pa.Table, et: pa.Table) -> pd.DataFrame:
            # arrow_fn co_group: zero-copy int64 columns straight into
            # the numpy probe — no per-partition pandas materialization
            x = wt.column("x").to_numpy().astype(np.int64, copy=False)
            y = wt.column("y").to_numpy().astype(np.int64, copy=False)
            ap = wt.column("apex").to_numpy().astype(np.int64, copy=False)
            hit = _probe_hits(
                x, y,
                et.column("src").to_numpy().astype(np.int64, copy=False),
                et.column("dst").to_numpy().astype(np.int64, copy=False),
                n)
            total = int(np.count_nonzero(hit))
            if per_node:
                return _per_node_rows(
                    np.concatenate([ap[hit], x[hit], y[hit]]), total)
            return pd.DataFrame({"node_id": [-1], "triangles": [total]})

        res = shuffle.co_group(
            wedges, oriented.select_columns(["src", "dst"]),
            l_on="x", r_on="src", fn=join_bucket,
            num_partitions=num_partitions,
            l_schema=wedge_schema, r_schema=_EDGE_SCHEMA, arrow_fn=True)

    if not per_node:
        parts = res.to_pandas()                # one row per partition
        return int(parts.loc[parts["node_id"] == -1, "triangles"].sum())

    # per-node: grouped_agg over (node_id, count) partials — the -1 row
    # carries the total; everything stays a Dataset
    grouped = shuffle.grouped_agg(res, ["node_id"],
                                  {"triangles": ("triangles", "sum")},
                                  num_partitions=num_partitions).materialize()
    tot = grouped.map_batches(
        lambda df: df[df["node_id"] < 0],
        batch_format="pandas").to_pandas()     # exactly one row
    total = int(tot["triangles"].sum())
    pern = grouped.map_batches(lambda df: df[df["node_id"] >= 0],
                               batch_format="pandas")
    return total, pern
