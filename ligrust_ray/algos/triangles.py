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

The probe set is broadcast as a sorted ``u * n + v`` key array (``ray.put``
once, ``np.searchsorted`` per partition). At 10^12 edges the probe side no
longer broadcasts: the scale path buckets wedges by ``hash(v) % B`` and
hash-joins against the identically bucketed edge set per bucket; the wedge
generation and probe kernels are unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ligrust_ray.stages import shuffle


def triangle_count(edges: ray.data.Dataset | pa.Table, n: int | None = None,
                   per_node: bool = False, num_partitions: int = 16):
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

    oriented = edges  # placeholder for chaining clarity
    oriented = und.map_batches(orient_and_part,
                               batch_format="pyarrow").materialize()

    keys = np.sort(np.concatenate(
        [b["src"] * n + b["dst"]
         for b in oriented.iter_batches(batch_format="numpy")]))
    keys_ref = ray.put(keys)

    def probe_part(g: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(keys_ref)
        u = g["src"].to_numpy(dtype=np.int64)
        v = g["dst"].to_numpy(dtype=np.int64)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        bounds = np.append(starts, len(u))
        if per_node:
            hits = np.zeros(n, dtype=np.int64)
        total = 0
        for i in range(len(starts)):
            lo, hi = bounds[i], bounds[i + 1]
            d = hi - lo
            if d < 2:
                continue
            nb = v[lo:hi]                      # sorted by id
            ii, jj = np.triu_indices(d, k=1)
            x, y = nb[ii], nb[jj]
            wk = x * n + y                     # canonical? orientation is by
            # (deg, id) rank, so check both directions of the closing edge:
            pos = np.minimum(np.searchsorted(ks, wk), len(ks) - 1)
            hit = ks[pos] == wk
            wk2 = y * n + x
            pos2 = np.minimum(np.searchsorted(ks, wk2), len(ks) - 1)
            hit = hit | (ks[pos2] == wk2)
            c = int(np.count_nonzero(hit))
            total += c
            if per_node and c:
                hits[u[lo]] += c
                np.add.at(hits, x[hit], 1)
                np.add.at(hits, y[hit], 1)
        if per_node:
            nz = np.flatnonzero(hits)
            return pd.DataFrame({"node_id": np.append(nz, -1),
                                 "triangles": np.append(hits[nz], total)})
        return pd.DataFrame({"node_id": [-1], "triangles": [total]})

    res = (oriented.groupby("part")
           .map_groups(probe_part, batch_format="pandas").to_pandas())
    total = int(res.loc[res["node_id"] == -1, "triangles"].sum())
    if not per_node:
        return total
    pern = res[res["node_id"] >= 0].groupby("node_id")["triangles"].sum()
    full = np.zeros(n, dtype=np.int64)
    full[pern.index.to_numpy()] = pern.to_numpy()
    tbl = pa.table({"node_id": pa.array(np.arange(n, dtype=np.int64)),
                    "triangles": pa.array(full)})
    return total, tbl
