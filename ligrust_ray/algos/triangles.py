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
probe per wedge (round 1 sorted by id and probed both directions).
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


def triangle_count(edges: ray.data.Dataset | pa.Table, n: int | None = None,
                   per_node: bool = False, num_partitions: int = 16,
                   probe_mode: str = "auto"):
    """Returns total int, or (total, per-node pa.Table) when ``per_node``."""
    if isinstance(edges, pa.Table):
        edges = ray.data.from_arrow(edges)

    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        keep = s != d
        a = np.minimum(s[keep], d[keep]).astype(np.int64)
        b = np.maximum(s[keep], d[keep]).astype(np.int64)
        k = np.unique(np.stack([a, b], axis=1), axis=0)  # in-batch pre-dedup
        return pa.table({"src": k[:, 0], "dst": k[:, 1]})

    und = shuffle.distinct(edges.map_batches(canon, batch_format="pyarrow"),
                           ["src", "dst"]).materialize()
    if und.count() == 0:
        empty = pa.table({"node_id": pa.array([], type=pa.int64()),
                          "triangles": pa.array([], type=pa.int64())})
        return (0, empty) if per_node else 0

    # degrees on the simple graph: per-batch (v, count) partials combined on
    # the driver — the deg array is driver-resident here regardless, so a
    # full groupby shuffle buys nothing (scale path: keep degrees as a
    # dataset and broadcast per-partition slices)
    def deg_partial(t: pa.Table) -> pa.Table:
        v = np.concatenate([t.column("src").to_numpy(),
                            t.column("dst").to_numpy()])
        uv, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": uv, "c": cnt.astype(np.int64)})

    parts = list(und.map_batches(deg_partial, batch_format="pyarrow")
                 .iter_batches(batch_format="numpy"))
    vmax = max(int(b["v"].max()) for b in parts)
    if n is None:
        n = vmax + 1
    deg = np.zeros(n, dtype=np.int64)
    for b in parts:
        np.add.at(deg, b["v"], b["c"])
    deg_ref = ray.put(deg)

    def orient_and_part(t: pa.Table) -> pa.Table:
        dg = ray.get(deg_ref)
        a = t.column("src").to_numpy()
        b = t.column("dst").to_numpy()
        a_first = (dg[a] < dg[b]) | ((dg[a] == dg[b]) & (a < b))
        u = np.where(a_first, a, b).astype(np.int64)
        v = np.where(a_first, b, a).astype(np.int64)
        return pa.table({"src": u, "dst": v,
                         "part": (u % num_partitions).astype(np.int64)})

    oriented = und.map_batches(orient_and_part,
                               batch_format="pyarrow").materialize()
    m_oriented = oriented.count()
    if probe_mode == "auto":
        probe_mode = ("broadcast" if m_oriented <= BROADCAST_MAX_EDGES
                      else "bucketed")

    def wedges_of(g: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(x, y, apex) wedge arrays for one source-partition, endpoints in
        ORIENTATION ((deg, id)-rank) order so the closing edge, if present,
        is oriented exactly x -> y."""
        dg = ray.get(deg_ref)
        u = g["src"].to_numpy(dtype=np.int64)
        v = g["dst"].to_numpy(dtype=np.int64)
        order = np.lexsort((v, dg[v], u))     # per-apex nb sorted by (deg,id)
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
                hits = np.zeros(n, dtype=np.int64)
                np.add.at(hits, ap[hit], 1)
                np.add.at(hits, x[hit], 1)
                np.add.at(hits, y[hit], 1)
                nz = np.flatnonzero(hits)
                return pd.DataFrame({"node_id": np.append(nz, -1),
                                     "triangles": np.append(hits[nz], total)})
            return pd.DataFrame({"node_id": [-1], "triangles": [total]})

        res = (oriented.groupby("part")
               .map_groups(probe_part, batch_format="pandas").to_pandas())
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

        def join_bucket(wf: pd.DataFrame, ef: pd.DataFrame) -> pd.DataFrame:
            ks = np.sort(ef["src"].to_numpy(dtype=np.int64) * n
                         + ef["dst"].to_numpy(dtype=np.int64))
            x = wf["x"].to_numpy(dtype=np.int64)
            y = wf["y"].to_numpy(dtype=np.int64)
            ap = wf["apex"].to_numpy(dtype=np.int64)
            wk = x * n + y
            pos = np.minimum(np.searchsorted(ks, wk), max(len(ks) - 1, 0))
            hit = (ks[pos] == wk) if len(ks) else np.zeros(len(wk), bool)
            total = int(np.count_nonzero(hit))
            if per_node:
                out_id = np.concatenate([ap[hit], x[hit], y[hit],
                                         np.array([-1], dtype=np.int64)])
                out_c = np.concatenate([np.ones(3 * total, dtype=np.int64),
                                        np.array([total], dtype=np.int64)])
                return pd.DataFrame({"node_id": out_id, "triangles": out_c})
            return pd.DataFrame({"node_id": [-1], "triangles": [total]})

        res = shuffle.co_group(
            wedges, oriented.select_columns(["src", "dst"]),
            l_on="x", r_on="src", fn=join_bucket,
            num_partitions=num_partitions,
            l_schema=wedge_schema,
            r_schema=pa.schema([("src", pa.int64()),
                                ("dst", pa.int64())])).to_pandas()

    total = int(res.loc[res["node_id"] == -1, "triangles"].sum())
    if not per_node:
        return total
    pern = res[res["node_id"] >= 0].groupby("node_id")["triangles"].sum()
    full = np.zeros(n, dtype=np.int64)
    full[pern.index.to_numpy()] = pern.to_numpy()
    tbl = pa.table({"node_id": pa.array(np.arange(n, dtype=np.int64)),
                    "triangles": pa.array(full)})
    return total, tbl
