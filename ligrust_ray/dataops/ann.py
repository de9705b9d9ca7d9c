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


def _arrow_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids, L2-normalized float64 matrix) from an Arrow batch —
    fixed-width list flatten+reshape (zero-copy view, one cast) instead
    of a per-row to_pylist/np.stack materialization (the hot-path shape
    shared with dedup._block_matrix)."""
    ids = t.column("vec_id").to_numpy()
    emb = t.column("embedding").combine_chunks()
    m = emb.flatten().to_numpy().reshape(len(ids), -1).astype(np.float64)
    return ids, _normalize(m)


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
        ids, m = _arrow_matrix(t)
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


# ---- IVF index: bucket count scales with n -------------------------------
# Fixed B=16 caps groupby parallelism at 16 and makes in-bucket all-pairs
# O((n/16)^2). Auto mode picks B ~ sqrt(n) (balances bucketize cost n*B
# against in-bucket cost n^2/B); above _TWO_LEVEL_MIN the index goes
# two-level (coarse sqrt(B) x fine sqrt(B), inverted-multi-index shape) so
# BOTH the driver k-means (sample x sqrt(B) x d) and the per-vector assign
# (2 x sqrt(B) x d instead of B x d) stay bounded as B grows.
IVF_MAX_CENTROIDS = 1 << 16
IVF_MAX_TRAIN = 1 << 18
_TWO_LEVEL_MIN = 65


def auto_centroids(n: int) -> int:
    return int(min(max(16, round(np.sqrt(max(n, 1)))), IVF_MAX_CENTROIDS))


def train_ivf(s_mat: np.ndarray, n_centroids: int, seed: int = 42):
    """-> (coarse (Bc,d), fines list[(Bf_i,d)], offsets (Bc+1,)). Bucket id
    of fine cell f under coarse c is offsets[c]+f. One-level indexes are a
    single dummy coarse cell holding every centroid as a fine."""
    B = max(1, min(n_centroids, len(s_mat)))
    if B < _TWO_LEVEL_MIN:
        fines = [_kmeans_lite(s_mat, B, seed=seed)]
        return (np.zeros((1, s_mat.shape[1])), fines,
                np.array([0, len(fines[0])], dtype=np.int64))
    bc = int(np.ceil(np.sqrt(B)))
    coarse = _kmeans_lite(s_mat, bc, seed=seed)
    assign = np.argmax(s_mat @ coarse.T, axis=1)
    bf = int(np.ceil(B / len(coarse)))
    fines = []
    for c in range(len(coarse)):
        sub = s_mat[assign == c]
        fines.append(coarse[[c]] if not len(sub)
                     else _kmeans_lite(sub, min(bf, len(sub)), seed=seed + 1 + c))
    offsets = np.concatenate(
        ([0], np.cumsum([len(f) for f in fines]))).astype(np.int64)
    return coarse, fines, offsets


def assign_buckets(index, m: np.ndarray, kprobe: int
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Top-``kprobe`` bucket ids per row of ``m`` (normalised), descending
    sim, deterministic ties. -> (buckets (n,kk) int64, valid (n,kk) bool)
    — rows can have fewer than kprobe reachable cells (small indexes)."""
    coarse, fines, offsets = index
    bc = len(coarse)
    nc = min(bc, max(1, int(kprobe)))       # coarse cells explored per row
    if nc < bc:
        cs = m @ coarse.T
        topc = np.argpartition(-cs, nc - 1, axis=1)[:, :nc]
    else:
        topc = np.tile(np.arange(bc), (len(m), 1))
    bfmax = max(len(f) for f in fines)
    cand_s = np.full((len(m), nc * bfmax), -np.inf)
    cand_b = np.zeros((len(m), nc * bfmax), dtype=np.int64)
    for g in np.unique(topc):
        rows, cols = np.nonzero(topc == g)
        fs = m[rows] @ fines[g].T            # (r, Bf_g)
        slot = cols[:, None] * bfmax + np.arange(fines[g].shape[0])
        cand_s[rows[:, None], slot] = fs
        cand_b[rows[:, None], slot] = offsets[g] + np.arange(
            fines[g].shape[0], dtype=np.int64)
    kk = min(int(kprobe), cand_s.shape[1])
    order = np.argsort(-cand_s, axis=1, kind="stable")[:, :kk]
    r = np.arange(len(m))[:, None]
    return cand_b[r, order], np.isfinite(cand_s[r, order])


def md5_buckets(ids: np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic bucket id per vec_id: md5_number_lower of the DECIMAL
    id string, mod B — a pure function of the id, exactly replicable in
    DuckDB (``md5_number_lower(CAST(vec_id AS VARCHAR)) % B``). This is
    the ``quantizer="md5"`` coarse quantizer: it exercises the identical
    bucketed layout / probe restriction / partial-top-k plumbing as the
    k-means index while being SQL-oracle-checkable end to end; k-means
    remains the RECALL path (random buckets carry no geometric pruning
    power — recall ~ nprobe/B by construction)."""
    from ligrust_ray.dataops.hashing import md5_u64_lower_arrow

    arr = pa.array(ids.astype(np.int64)).cast(pa.string())
    return (md5_u64_lower_arrow(arr) % np.uint64(n_buckets)).astype(np.int64)


def _train_from_ds(emb: ray.data.Dataset, n_centroids: int | None,
                   seed: int, train_sample: int):
    """Bounded-sample IVF training; auto B from a metadata-cheap count."""
    if n_centroids is None:
        n_centroids = auto_centroids(emb.count())
    train_sample = min(max(train_sample, 8 * n_centroids), IVF_MAX_TRAIN)
    sample = emb.select_columns(["vec_id", "embedding"]) \
        .limit(train_sample).to_pandas()
    _, s_mat = _matrix(sample)
    return train_ivf(_normalize(s_mat), n_centroids, seed=seed)


def knn_ivf(emb: ray.data.Dataset, query_ids: list[int], k: int = 10,
            n_centroids: int | None = None, nprobe: int = 4, seed: int = 42,
            train_sample: int = 4096, quantizer: str = "kmeans"
            ) -> ray.data.Dataset:
    """Approximate top-k: bucket by nearest centroid, probe nprobe buckets.

    Distributed shape (what a 10^12-vector deployment runs; only the tiny
    artifacts touch the driver):
    1. centroids trained on a bounded driver-side SAMPLE (train_sample rows);
       ``n_centroids=None`` auto-scales B ~ sqrt(n) via the two-level index
       above, so bucket count (and pruning power) grows with the data;
    2. every vector scored/bucketed inside ``map_batches`` against the
       broadcast index — the bucketed layout is what scale persists as
       hash-partitioned parquet;
    3. per-batch partial top-k per (query, probed-bucket) — only candidate
       rows in probed buckets emit scores;
    4. final exact top-k per query via a tiny per-query group merge.

    ``quantizer="md5"`` swaps the k-means index for the deterministic
    md5 id-bucket quantizer (``md5_buckets``): buckets are md5(id) % B,
    a query probes buckets (md5(qid)+j) % B for j < nprobe. Same
    distributed plumbing, SQL-oracle-checkable, no geometric recall.
    """
    import pyarrow.compute as pc

    if quantizer not in ("kmeans", "md5"):
        raise ValueError(f"unknown quantizer {quantizer!r}")
    if quantizer == "md5":
        n_buckets = n_centroids if n_centroids is not None \
            else auto_centroids(emb.count())
        mode = ("md5", n_buckets)
    else:
        mode = ("kmeans", _train_from_ds(emb, n_centroids, seed,
                                         train_sample))

    # query vectors: the query-id set is small by contract
    qarr = pa.array(sorted(int(q) for q in query_ids), type=pa.int64())
    q_tbl = emb.map_batches(
        lambda t: t.filter(pc.is_in(t.column("vec_id"), value_set=qarr)),
        batch_format="pyarrow").to_pandas()
    q_ids, q_mat = _matrix(q_tbl)
    order = np.argsort(q_ids)
    q_ids, q_mat = q_ids[order], _normalize(q_mat[order])
    if quantizer == "md5":
        probes = (md5_buckets(q_ids, mode[1])[:, None]
                  + np.arange(nprobe, dtype=np.int64)) % mode[1]
    else:
        probes, pvalid = assign_buckets(mode[1], q_mat, nprobe)
        probes = np.where(pvalid, probes, -1)  # unreachable cells no-match
    bcast = ray.put((mode, q_ids, q_mat, probes))

    def score(t: pa.Table) -> pa.Table:
        mo, qi, qm, pr = ray.get(bcast)
        ids, m = _arrow_matrix(t)
        assign = md5_buckets(ids, mo[1]) if mo[0] == "md5" \
            else assign_buckets(mo[1], m, 1)[0][:, 0]
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


# ---- Product quantization (PQ) -------------------------------------------
# The memory-scale path for 100-TB embedding stores: each vector compresses
# to M sub-codes (M bytes at K<=256), and queries scan codes via an ADC
# lookup table instead of raw floats. The codebook here is deterministic —
# codeword j of subspace s = the subvector of the MINIMUM vec_id whose
# md5 bucket is j (a data-sampled "medoid" codebook, the standard cheap
# baseline; k-means refinement would drop in behind the same interface) —
# and ALL distances are exact int64 arithmetic over floor(e*1000)-scaled
# components, so the DuckDB oracle reproduces codes and rankings bit-for-
# bit (no float-summation-order hazards). Recall vs exact cosine is
# property-tested, not oracled.

PQ_M = 8            # subspaces
PQ_K = 16           # codewords per subspace (md5 buckets)
PQ_SCALE = 1000.0   # fixed-point grid: x_int = floor(float64(e) * 1000)


def _scaled_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids, int64 fixed-point matrix) — same flatten/reshape shape as
    _arrow_matrix but onto the exact-arithmetic grid."""
    ids = t.column("vec_id").to_numpy()
    emb = t.column("embedding").combine_chunks()
    m = emb.flatten().to_numpy().reshape(len(ids), -1).astype(np.float64)
    return ids, np.floor(m * PQ_SCALE).astype(np.int64)


def _scaled_pd(df: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    ids = df["vec_id"].to_numpy(dtype=np.int64)
    m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return ids, np.floor(m * PQ_SCALE).astype(np.int64)


def pq_codebook(emb: ray.data.Dataset, n_codes: int = PQ_K
                ) -> tuple[np.ndarray, np.ndarray]:
    """Train the deterministic codebook: (bucket ids j ascending,
    centroid tensor int64 (nj, D)). Distributed: the rep choice is a
    16-row grouped_agg (min vec_id per md5 bucket); only the <=n_codes
    representative vectors ever reach the driver."""
    from ligrust_ray.stages import shuffle

    def bucketize(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy()
        return pa.table({
            "b": pa.array(md5_buckets(ids.astype(np.int64), n_codes)),
            "vec_id": pa.array(ids.astype(np.int64))})

    reps = shuffle.grouped_agg(
        emb.select_columns(["vec_id"]).map_batches(
            bucketize, batch_format="pyarrow"),
        ["b"], {"rid": ("vec_id", "min")}).to_pandas()
    reps = reps.sort_values("b")
    rid = pa.array(reps["rid"].to_numpy().astype(np.int64))

    rep_df = emb.map_batches(
        lambda t: t.filter(pa.compute.is_in(t.column("vec_id"),
                                            value_set=rid)),
        batch_format="pyarrow").to_pandas()
    ids, mat = _scaled_pd(rep_df)
    order = {int(v): i for i, v in enumerate(ids)}
    cent = mat[[order[int(v)] for v in reps["rid"].to_numpy()]]
    return reps["b"].to_numpy().astype(np.int64), cent


def _pq_assign(x: np.ndarray, cent: np.ndarray, buckets: np.ndarray,
               m_sub: int = PQ_M) -> np.ndarray:
    """codes (B, M): argmin_j L2^2(subvector, codeword) with smallest-j
    tie-break (np.argmin picks the first occurrence; buckets ascend)."""
    bsz, d = x.shape
    sub = d // m_sub
    xs = x.reshape(bsz, m_sub, 1, sub)
    cs = cent.reshape(1, len(cent), m_sub, sub).transpose(0, 2, 1, 3)
    d2 = ((xs - cs) ** 2).sum(axis=3)            # (B, M, nj)
    return buckets[np.argmin(d2, axis=2)]        # (B, M)


def pq_codes(emb: ray.data.Dataset, m_sub: int = PQ_M) -> ray.data.Dataset:
    """(vec_id, s, code) — one row per vector per subspace. Codebook is
    broadcast once (ray.put); assignment is one vectorised map."""
    buckets, cent = pq_codebook(emb)
    cb = ray.put((buckets, cent))

    def assign(t: pa.Table) -> pa.Table:
        bks, cn = ray.get(cb)
        ids, x = _scaled_matrix(t)
        codes = _pq_assign(x, cn, bks, m_sub)
        bsz = len(ids)
        return pa.table({
            "vec_id": pa.array(np.repeat(ids.astype(np.int64), m_sub)),
            "s": pa.array(np.tile(np.arange(m_sub, dtype=np.int64), bsz)),
            "code": pa.array(codes.reshape(-1))})

    return (emb.select_columns(["vec_id", "embedding"])
            .map_batches(assign, batch_format="pyarrow", batch_size=4096))


def knn_pq(emb: ray.data.Dataset, query_ids: list[int], k: int = 10,
           m_sub: int = PQ_M) -> ray.data.Dataset:
    """(query_id, neighbor_id, rank) — ADC search: dist(q, x) =
    sum_s lut[s, q, code_s(x)] where lut is the (M, nq, nj) int64 table
    of query-subvector-to-codeword distances. Ranks by (dist asc,
    neighbor_id asc); self included, like knn_bruteforce. Per batch the
    scan cost is O(B * M) table lookups — never a full float matmul."""
    import pyarrow.compute as pc

    buckets, cent = pq_codebook(emb)
    qarr = pa.array(sorted(int(q) for q in query_ids), type=pa.int64())
    q_df = emb.map_batches(
        lambda t: t.filter(pc.is_in(t.column("vec_id"), value_set=qarr)),
        batch_format="pyarrow").to_pandas()
    q_ids, q_mat = _scaled_pd(q_df)
    order = np.argsort(q_ids)
    q_ids, q_mat = q_ids[order].astype(np.int64), q_mat[order]
    nq, d = q_mat.shape
    sub = d // m_sub
    qs = q_mat.reshape(nq, m_sub, 1, sub)
    cs = cent.reshape(1, len(cent), m_sub, sub).transpose(0, 2, 1, 3)
    lut = ((qs - cs) ** 2).sum(axis=3).transpose(1, 0, 2)  # (M, nq, nj)
    jpos = np.full(int(buckets.max()) + 1, -1, dtype=np.int64)
    jpos[buckets] = np.arange(len(buckets))
    bcast = ray.put((buckets, cent, q_ids, lut, jpos))

    def score(t: pa.Table) -> pa.Table:
        bks, cn, qi, lt, jp = ray.get(bcast)
        ids, x = _scaled_matrix(t)
        codes = _pq_assign(x, cn, bks, m_sub)     # (B, M) bucket ids
        acc = np.zeros((len(qi), len(ids)), dtype=np.int64)
        for s in range(m_sub):
            acc += lt[s][:, jp[codes[:, s]]]
        out_q, out_n, out_d = [], [], []
        for row, q in enumerate(qi):
            top = np.lexsort((ids, acc[row]))[:k]   # per-batch partial
            out_q.extend([int(q)] * len(top))
            out_n.extend(ids[top].tolist())
            out_d.extend(acc[row][top].tolist())
        return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                         "neighbor_id": pa.array(out_n, type=pa.int64()),
                         "dist": pa.array(out_d, type=pa.int64())})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dist", "neighbor_id"]).head(k)
        return pd.DataFrame({"query_id": g["query_id"].to_numpy(),
                             "neighbor_id": g["neighbor_id"].to_numpy(),
                             "rank": np.arange(1, len(g) + 1,
                                               dtype=np.int64)})

    return (emb.select_columns(["vec_id", "embedding"])
            .map_batches(score, batch_format="pyarrow", batch_size=4096)
            .groupby("query_id").map_groups(merge, batch_format="pandas"))


# -------------------------------------------------------------- k-means
KMEANS_K = 8         # clusters
KMEANS_ROUNDS = 2    # Lloyd centroid updates

def _km_assign(mat: np.ndarray, cids: np.ndarray, cent: np.ndarray
               ) -> np.ndarray:
    """argmin_c L2^2(x, centroid_c) on the int64 grid; ties break to the
    smallest cluster id (cids ascend, np.argmin takes the first)."""
    d2 = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    return cids[np.argmin(d2, axis=1)]


def kmeans(emb: ray.data.Dataset, k: int = KMEANS_K,
           rounds: int = KMEANS_ROUNDS) -> ray.data.Dataset:
    """(vec_id, cluster) — deterministic integer-exact Lloyd clustering
    on the PQ fixed-point grid (x_int = floor(float64(e) * PQ_SCALE)):
    initial assignment is the md5 id-bucket hash (md5_buckets, the same
    convention as the IVF md5 quantizer), then ``rounds`` synchronous
    updates of centroid_c[d] = floor(sum / count) over members followed
    by nearest-centroid reassignment (L2^2 int64, smallest-cluster-id
    tie-break). Clusters that lose every member drop out of the centroid
    table (candidates shrink — the SQL oracle gets this for free from
    its GROUP BY). Every arithmetic step is exact int64, so the DuckDB
    oracle unrolls the identical rounds and the contract compare is
    hash-exact.

    Scale shape: assignments are RECOMPUTED per batch from the tiny
    broadcast centroid table (k x D int64 — ray.put once per round)
    instead of materializing an n-row assignment column between rounds;
    the per-round reduction ships only k x D partial (sum, count) rows
    per block through one grouped_agg. Driver state is O(k*D), never
    O(n)."""
    from ligrust_ray.stages import shuffle

    ek = emb.select_columns(["vec_id", "embedding"])
    cent_ref: "ray.ObjectRef | None" = None    # (cids, cent) after round r

    def partials(t: pa.Table, ref) -> pa.Table:
        ids, mat = _scaled_matrix(t)
        if ref is None:
            a = md5_buckets(ids, k)
        else:
            cids, cent = ray.get(ref)
            a = _km_assign(mat, cids, cent)
        # per-block (cluster, dim) partial sums + member counts
        uc, inv = np.unique(a, return_inverse=True)
        d = mat.shape[1]
        sums = np.zeros((len(uc), d), dtype=np.int64)
        np.add.at(sums, inv, mat)
        cnt = np.bincount(inv, minlength=len(uc)).astype(np.int64)
        cc = np.repeat(uc, d)
        dd = np.tile(np.arange(d, dtype=np.int64), len(uc))
        return pa.table({"c": pa.array(cc), "d": pa.array(dd),
                         "s": pa.array(sums.ravel()),
                         "n": pa.array(np.repeat(cnt, d))})

    for _ in range(rounds):
        ref = cent_ref

        def stage(t: pa.Table, _ref=ref) -> pa.Table:
            return partials(t, _ref)

        rows = shuffle.grouped_agg(
            ek.map_batches(stage, batch_format="pyarrow"),
            ["c", "d"], {"s": ("s", "sum"), "n": ("n", "sum")}).to_pandas()
        rows = rows.sort_values(["c", "d"])
        cids = rows["c"].to_numpy()[::int(rows["d"].max()) + 1]
        d = int(rows["d"].max()) + 1
        s = rows["s"].to_numpy().reshape(-1, d)
        n = rows["n"].to_numpy().reshape(-1, d)[:, 0]
        cent = np.floor(s.astype(np.float64) / n[:, None]).astype(np.int64)
        cent_ref = ray.put((cids.astype(np.int64), cent))

    final_ref = cent_ref

    def assign(t: pa.Table) -> pa.Table:
        ids, mat = _scaled_matrix(t)
        cids, cent = ray.get(final_ref)
        return pa.table({"vec_id": pa.array(ids.astype(np.int64)),
                         "cluster": pa.array(_km_assign(mat, cids, cent))})

    return ek.map_batches(assign, batch_format="pyarrow")


SEMDEDUP_NUM = 9     # cosine threshold num/den = 0.9
SEMDEDUP_DEN = 10


def semdedup(emb: ray.data.Dataset, k: int = KMEANS_K,
             rounds: int = KMEANS_ROUNDS,
             thr_num: int = SEMDEDUP_NUM,
             thr_den: int = SEMDEDUP_DEN) -> ray.data.Dataset:
    """(vec_id, cluster, kept) — SemDeDup-style semantic dedup (Abbas et
    al. 2023): cluster the embedding space with the integer-exact
    k-means, then inside each cluster drop every vector that is
    near-duplicate (cosine >= thr_num/thr_den) of an EARLIER vector on
    the deterministic (md5(vec_id), vec_id) priority tape. The cosine
    verdict is EXACT integer arithmetic on the PQ fixed-point grid:
    cos(u,v) >= t  <=>  dot > 0 and dot^2 * den^2 >= num^2 * |u|^2|v|^2
    — no float comparison anywhere, so the DuckDB oracle replays it
    hash-exactly. (The one-pass drop-if-any-earlier-similar rule is
    deliberately parallel — unlike greedy keep-set chaining it needs no
    sequential scan, and every pair decision is independent.)

    Scale shape: assignments ride the k-means broadcast centroids;
    embeddings attach to their cluster via one keyed co_group; the
    all-pairs verdict runs per CLUSTER inside a cluster-keyed
    grouped_apply — pair work is bounded by cluster size (~n/k), never
    corpus-quadratic. Guards the int64 bound and raises rather than
    overflow."""
    from ligrust_ray.dataops import hashing
    from ligrust_ray.stages import shuffle

    assigns = kmeans(emb, k, rounds)
    ek = emb.select_columns(["vec_id", "embedding"])

    def attach(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        return lf.merge(rf, on="vec_id", how="inner")

    joined = shuffle.co_group(
        assigns, ek, l_on="vec_id", r_on="vec_id", fn=attach,
        l_schema=pa.schema([("vec_id", pa.int64()),
                            ("cluster", pa.int64())]),
        r_schema=pa.schema([("vec_id", pa.int64()),
                            ("embedding", pa.list_(pa.float64()))]))

    num2 = thr_num * thr_num
    den2 = thr_den * thr_den

    def verdict(df: pd.DataFrame) -> pd.DataFrame:
        cols = ("vec_id", "cluster", "kept")
        if not len(df):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        out = []
        for cl, g in df.groupby("cluster", sort=False):
            ids = g["vec_id"].to_numpy(np.int64)
            mat = np.floor(np.stack(
                [np.asarray(e, dtype=np.float64)
                 for e in g["embedding"]]) * PQ_SCALE).astype(np.int64)
            pk = np.array([hashing.md5_u64_lower(str(i).encode())
                           for i in ids], dtype=np.uint64)
            order = np.lexsort((ids, pk))
            ids, mat = ids[order], mat[order]
            n2 = (mat * mat).sum(axis=1)
            if len(n2) and float(n2.max())**2 * den2 >= 2.0**62:
                raise RuntimeError("semdedup: norms exceed the int64 "
                                   "exactness bound; rescale")
            dots = mat @ mat.T
            sim = (dots > 0) & (dots.astype(np.int64) ** 2 * den2
                                >= num2 * np.outer(n2, n2))
            # drop i iff ANY earlier j (strict lower triangle) is similar
            dropped = np.tril(sim, k=-1).any(axis=1)
            out.append(pd.DataFrame({
                "vec_id": ids, "cluster": np.full(len(ids), cl,
                                                  dtype=np.int64),
                "kept": (~dropped).astype(np.int64)}))
        return pd.concat(out, ignore_index=True)

    return shuffle.grouped_apply(joined, ["cluster"], verdict)


PCA_ROUNDS = 4


def top_component(emb: ray.data.Dataset, rounds: int = PCA_ROUNDS
                  ) -> pa.Table:
    """(dim, loading_ppm) — the corpus's dominant principal direction
    (uncentered) by L1-normalized power iteration on the Gram matrix
    A = X^T X: the embedding-drift / anisotropy readout embedding
    pipelines monitor. A is computed EXACTLY: per-block int64 partial
    Gram matrices on the PQ fixed-point grid (D x D = 4096 rows per
    block, the bounded-sketch shape) fold through one grouped sum;
    the 64x64 power iteration runs driver-side ENTIRELY in exact
    integer arithmetic — v lives on the ppm grid and each round
    renormalizes with the half-up integer division
    (2*raw*1e6 + l1) // (2*l1), so no float addition order exists
    anywhere and the DuckDB compare is hash-exact (unlike the
    eigencentrality ppm convention, which accepts last-ulp float
    divergence). Nothing n-sized ever reaches the driver."""
    from ligrust_ray.stages import shuffle

    def gram_part(t: pa.Table) -> pa.Table:
        _ids, mat = _scaled_matrix(t)
        d = mat.shape[1]
        g = mat.T.astype(np.int64) @ mat.astype(np.int64)
        ii = np.repeat(np.arange(d, dtype=np.int64), d)
        jj = np.tile(np.arange(d, dtype=np.int64), d)
        return pa.table({"i": pa.array(ii), "j": pa.array(jj),
                         "s": pa.array(g.ravel())})

    rows = shuffle.grouped_agg(
        emb.select_columns(["vec_id", "embedding"]).map_batches(
            gram_part, batch_format="pyarrow"),
        ["i", "j"], {"s": ("s", "sum")}).to_pandas()
    d = int(rows["i"].max()) + 1
    A = [[0] * d for _ in range(d)]           # python ints: exact
    for i, j, s in zip(rows["i"].to_numpy(np.int64),
                       rows["j"].to_numpy(np.int64),
                       rows["s"].to_numpy(np.int64)):
        A[int(i)][int(j)] = int(s)
    v = [10**6] * d                            # ppm grid
    for _ in range(rounds):
        raw = [sum(A[i][j] * v[j] for j in range(d)) for i in range(d)]
        l1 = sum(abs(x) for x in raw)
        v = ([0] * d if l1 == 0 else
             [(2 * x * 10**6 + l1) // (2 * l1) for x in raw])
    return pa.table({
        "dim": pa.array(np.arange(d, dtype=np.int64)),
        "loading_ppm": pa.array(np.array(v, dtype=np.int64))})


def top_eigenvalue(emb: ray.data.Dataset, rounds: int = PCA_ROUNDS
                   ) -> pa.Table:
    """(rayleigh_den, eig_milli) — exact dominant-eigenvalue estimate of
    the Gram matrix: the Rayleigh quotient v^T A v / v^T v of the ppm
    loading vector, rendered as the half-up integer milli value (the
    raw numerator overflows int64, so the division happens in exact
    python ints and only bounded outputs ship) — the spectral-energy /
    anisotropy magnitude companion of top_component. A is PSD, so the
    quotient is non-negative and plain floor division matches DuckDB."""
    from ligrust_ray.stages import shuffle

    comp = top_component(emb, rounds)
    v = [int(x) for x in comp.column("loading_ppm").to_pylist()]

    def gram_part(t: pa.Table) -> pa.Table:
        _ids, mat = _scaled_matrix(t)
        d = mat.shape[1]
        g = mat.T.astype(np.int64) @ mat.astype(np.int64)
        ii = np.repeat(np.arange(d, dtype=np.int64), d)
        jj = np.tile(np.arange(d, dtype=np.int64), d)
        return pa.table({"i": pa.array(ii), "j": pa.array(jj),
                         "s": pa.array(g.ravel())})

    rows = shuffle.grouped_agg(
        emb.select_columns(["vec_id", "embedding"]).map_batches(
            gram_part, batch_format="pyarrow"),
        ["i", "j"], {"s": ("s", "sum")}).to_pandas()
    num = 0
    for i, j, sv in zip(rows["i"].to_numpy(np.int64),
                        rows["j"].to_numpy(np.int64),
                        rows["s"].to_numpy(np.int64)):
        num += v[int(i)] * int(sv) * v[int(j)]
    den = sum(x * x for x in v)
    eig_milli = 0 if den == 0 else (2 * num * 1000 + den) // (2 * den)
    return pa.table({
        "rayleigh_den": pa.array([den], type=pa.int64()),
        "eig_milli": pa.array([int(eig_milli)], type=pa.int64())})
