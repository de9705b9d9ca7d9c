"""Similarity search over an embedding column (``list<float>``).

- ``knn_bruteforce``: exact top-k cosine — per-batch numpy matmul against a
  broadcast query matrix (``ray.put`` once), per-batch top-k candidates,
  final top-k merge per query. The baseline and the oracle.
- ``knn_ivf``: IVF-style scale path — deterministic k-means-lite centroids,
  vectors bucketed by nearest centroid (partitioned layout), queries probe
  only ``nprobe`` buckets. Approximate; recall tested vs brute force.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _matrix(tbl: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    ids = tbl["vec_id"].to_numpy(dtype=np.int64)
    mat = np.stack(tbl["embedding"].to_numpy()).astype(np.float64)
    return ids, mat


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def knn_bruteforce(emb: ray.data.Dataset, query_ids: list[int], k: int = 10
                   ) -> ray.data.Dataset:
    """(query_id, neighbor_id, rank) — exact cosine top-k, self included.
    Rank ties broken by neighbor_id ascending (deterministic)."""
    import pyarrow.compute as pc

    qarr = pa.array(sorted(int(q) for q in query_ids), type=pa.int64())
    q_tbl = emb.map_batches(
        lambda t: t.filter(pc.is_in(t.column("vec_id"), value_set=qarr)),
        batch_format="pyarrow").to_pandas()
    q_ids, q_mat = _matrix(q_tbl)
    order = np.argsort(q_ids)
    q_ids, q_mat = q_ids[order], _normalize(q_mat[order])
    q_ref = ray.put((q_ids, q_mat))

    def score(t: pa.Table) -> pa.Table:
        qi, qm = ray.get(q_ref)
        ids = t.column("vec_id").to_numpy()
        m = _normalize(np.stack([np.asarray(v)
                                 for v in t.column("embedding").to_pylist()]
                                ).astype(np.float64))
        sims = qm @ m.T                      # (nq, batch)
        kk = min(k, sims.shape[1])
        # per-batch candidate top-k (ties -> smaller id first)
        out_q, out_n, out_s = [], [], []
        for row, qid in enumerate(qi):
            srow = sims[row]
            cand = np.lexsort((ids, -srow))[:kk]
            out_q.extend([qid] * len(cand))
            out_n.extend(ids[cand].tolist())
            out_s.extend(srow[cand].tolist())
        return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                         "neighbor_id": pa.array(out_n, type=pa.int64()),
                         "sim": pa.array(out_s, type=pa.float64())})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame({"query_id": g["query_id"],
                             "neighbor_id": g["neighbor_id"],
                             "rank": np.arange(1, len(g) + 1, dtype=np.int64)})

    return (emb.select_columns(["vec_id", "embedding"])
            .map_batches(score, batch_format="pyarrow", batch_size=4096)
            .groupby("query_id").map_groups(merge, batch_format="pandas"))


def _kmeans_lite(mat: np.ndarray, n_centroids: int, iters: int = 5,
                 seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)
    cent = mat[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(len(cent)):
            mask = assign == c
            if mask.any():
                v = mat[mask].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def knn_ivf(emb: ray.data.Dataset, query_ids: list[int], k: int = 10,
            n_centroids: int = 16, nprobe: int = 4, seed: int = 42,
            train_sample: int = 4096) -> ray.data.Dataset:
    """Approximate top-k: bucket by nearest centroid, probe nprobe buckets.

    Distributed shape (what a 10^12-vector deployment runs; only the tiny
    artifacts touch the driver):
    1. centroids trained on a bounded driver-side SAMPLE (train_sample rows);
    2. every vector scored/bucketed inside ``map_batches`` against the
       broadcast centroids — the bucketed layout is what scale persists as
       hash-partitioned parquet;
    3. per-batch partial top-k per (query, probed-bucket) — only candidate
       rows in probed buckets emit scores;
    4. final exact top-k per query via a tiny per-query group merge.
    """
    import pyarrow.compute as pc

    # 1. bounded sample -> centroids (driver holds n_centroids x d only)
    sample = emb.select_columns(["vec_id", "embedding"]) \
        .limit(train_sample).to_pandas()
    s_ids, s_mat = _matrix(sample)
    s_mat = _normalize(s_mat)
    cent = _kmeans_lite(s_mat, n_centroids, seed=seed)

    # query vectors: the query-id set is small by contract
    qarr = pa.array(sorted(int(q) for q in query_ids), type=pa.int64())
    q_tbl = emb.map_batches(
        lambda t: t.filter(pc.is_in(t.column("vec_id"), value_set=qarr)),
        batch_format="pyarrow").to_pandas()
    q_ids, q_mat = _matrix(q_tbl)
    order = np.argsort(q_ids)
    q_ids, q_mat = q_ids[order], _normalize(q_mat[order])
    probes = np.argsort(-(q_mat @ cent.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    bcast = ray.put((cent, q_ids, q_mat, probes))

    def score(t: pa.Table) -> pa.Table:
        c, qi, qm, pr = ray.get(bcast)
        ids = t.column("vec_id").to_numpy()
        m = _normalize(np.stack([np.asarray(v)
                                 for v in t.column("embedding").to_pylist()]
                                ).astype(np.float64))
        assign = np.argmax(m @ c.T, axis=1)
        out_q, out_n, out_s = [], [], []
        for row, q in enumerate(qi):
            cand = np.isin(assign, pr[row])
            if not cand.any():
                continue
            sims = m[cand] @ qm[row]
            cids = ids[cand]
            top = np.lexsort((cids, -sims))[:k]     # per-batch partial top-k
            out_q.extend([q] * len(top))
            out_n.extend(cids[top].tolist())
            out_s.extend(sims[top].tolist())
        return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                         "neighbor_id": pa.array(out_n, type=pa.int64()),
                         "sim": pa.array(out_s, type=pa.float64())})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"],
                          ascending=[False, True]).head(k)
        return pd.DataFrame({"query_id": g["query_id"].to_numpy(),
                             "neighbor_id": g["neighbor_id"].to_numpy(),
                             "rank": np.arange(1, len(g) + 1, dtype=np.int64)})

    return (emb.select_columns(["vec_id", "embedding"])
            .map_batches(score, batch_format="pyarrow", batch_size=4096)
            .groupby("query_id").map_groups(merge, batch_format="pandas"))
