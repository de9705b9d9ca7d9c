"""Triangle counting — NEW algorithm (BASELINE.json north_rule; not in the
reference). SURVEY.md §7.5: not frontier-shaped, so it is a pure Ray Data
pipeline rather than an edgeMap composition.

Algorithm (degree-ordered wedge check):
1. canonicalise: undirected simplification — ``(min(s,d), max(s,d))``,
   self-loops dropped, duplicates removed (groupby distinct = shuffle #1);
2. orient each edge from the endpoint with (degree, id)-smaller rank to the
   larger — bounds every oriented out-degree by O(sqrt(m)), which is what
   keeps hub (Zipf) vertices from exploding the wedge count (the skew story);
3. roll oriented edges into per-source neighbor lists (groupby = shuffle #2);
4. generate wedges (v, w) per source u from its oriented list and probe each
   against the oriented edge set; every hit is exactly one triangle.

The probe set is broadcast as a sorted ``u * n + v`` key array (``ray.put``
once, ``np.searchsorted`` per batch — no per-batch reshipping). At 10^12
edges the probe side no longer broadcasts: the scale path is to bucket
wedges by ``hash(v) % B`` and hash-join against the identically bucketed
edge set per bucket; the wedge generation and probe kernels are unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _canonical_undirected(edges: ray.data.Dataset) -> ray.data.Dataset:
    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        keep = s != d
        a = np.minimum(s[keep], d[keep])
        b = np.maximum(s[keep], d[keep])
        # in-batch pre-dedup shrinks the shuffle input
        k = np.unique(np.stack([a, b], axis=1), axis=0)
        return pa.table({"src": k[:, 0], "dst": k[:, 1]})

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates()

    return (edges.map_batches(canon, batch_format="pyarrow")
            .groupby(["src", "dst"]).map_groups(dedup, batch_format="pandas"))


def triangle_count(edges: ray.data.Dataset | pa.Table, n: int | None = None,
                   per_node: bool = False):
    """Returns total int, or (total, per-node pa.Table) when ``per_node``."""
    if isinstance(edges, pa.Table):
        edges = ray.data.from_arrow(edges)
    und = _canonical_undirected(edges).materialize()
    if und.count() == 0:
        empty = pa.table({"node_id": pa.array([], type=pa.int64()),
                          "triangles": pa.array([], type=pa.int64())})
        return (0, empty) if per_node else 0

    # degrees over the undirected simple graph (small result: one row/vertex)
    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table({"v": np.concatenate([t.column("src").to_numpy(),
                                              t.column("dst").to_numpy()])})

    deg_pdf = (und.map_batches(endpoints, batch_format="pyarrow")
               .groupby("v").count().to_pandas())
    if n is None:
        n = int(deg_pdf["v"].max()) + 1
    deg = np.zeros(n, dtype=np.int64)
    deg[deg_pdf["v"].to_numpy()] = deg_pdf["count()"].to_numpy()
    deg_ref = ray.put(deg)

    def orient(t: pa.Table) -> pa.Table:
        dg = ray.get(deg_ref)
        a = t.column("src").to_numpy()
        b = t.column("dst").to_numpy()
        # rank(v) = (deg[v], v); orient low rank -> high rank
        a_first = (dg[a] < dg[b]) | ((dg[a] == dg[b]) & (a < b))
        u = np.where(a_first, a, b)
        v = np.where(a_first, b, a)
        return pa.table({"src": u, "dst": v})

    oriented = und.map_batches(orient, batch_format="pyarrow").materialize()

    # broadcast probe set: sorted u*n+v keys (scale path: bucketed hash join)
    key_parts = [b["src"].astype(np.int64) * n + b["dst"].astype(np.int64)
                 for b in oriented.iter_batches(batch_format="numpy")]
    keys = np.sort(np.concatenate(key_parts)) if key_parts else np.zeros(0, np.int64)
    keys_ref = ray.put(keys)

    def listify(g: pd.DataFrame) -> pd.DataFrame:
        u = int(g["src"].iloc[0])
        nb = np.sort(g["dst"].to_numpy(dtype=np.int64))
        return pd.DataFrame({"src": [u], "nbrs": [nb]})

    adj = oriented.groupby("src").map_groups(listify, batch_format="pandas")

    class WedgeProbe:
        def __init__(self):
            self.keys = ray.get(keys_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            rows_u, rows_cnt = [], []
            node_hits: dict[int, int] = {}
            for u, nb in zip(batch["src"], batch["nbrs"]):
                nb = np.asarray(nb, dtype=np.int64)
                d = len(nb)
                if d < 2:
                    continue
                ii, jj = np.triu_indices(d, k=1)
                wk = nb[ii] * n + nb[jj]           # oriented: nb sorted, need
                # rank order not id order — recheck both orders:
                pos = np.searchsorted(self.keys, wk)
                pos = np.minimum(pos, len(self.keys) - 1)
                hit1 = self.keys[pos] == wk if len(self.keys) else np.zeros(0, bool)
                wk2 = nb[jj] * n + nb[ii]
                pos2 = np.searchsorted(self.keys, wk2)
                pos2 = np.minimum(pos2, len(self.keys) - 1)
                hit2 = self.keys[pos2] == wk2 if len(self.keys) else np.zeros(0, bool)
                hit = hit1 | hit2
                c = int(hit.sum())
                if c:
                    rows_u.append(u)
                    rows_cnt.append(c)
                    if per_node:
                        node_hits[u] = node_hits.get(u, 0) + c
                        for x in nb[ii][hit].tolist():
                            node_hits[x] = node_hits.get(x, 0) + 1
                        for x in nb[jj][hit].tolist():
                            node_hits[x] = node_hits.get(x, 0) + 1
            if per_node:
                ks = sorted(node_hits)
                return pd.DataFrame({"node_id": ks,
                                     "triangles": [node_hits[k] for k in ks]})
            return pd.DataFrame({"node_id": rows_u, "triangles": rows_cnt})

    counted = adj.map_batches(WedgeProbe, batch_format="pandas",
                              concurrency=(1, 8))
    if per_node:
        agg = counted.groupby("node_id").sum("triangles").to_pandas()
        agg = agg.rename(columns={"sum(triangles)": "triangles"})
        full = np.zeros(n, dtype=np.int64)
        if len(agg):
            full[agg["node_id"].to_numpy()] = agg["triangles"].to_numpy()
        total = int(full.sum()) // 3
        tbl = pa.table({"node_id": pa.array(np.arange(n, dtype=np.int64)),
                        "triangles": pa.array(full)})
        return total, tbl
    s = counted.sum("triangles") if counted.count() else 0
    return int(s)
