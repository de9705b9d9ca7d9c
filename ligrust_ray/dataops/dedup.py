"""Deduplication family over the ``documents`` table.

- exact:      hash-partitioned group-by-content, keep min doc_id
- minhash:    shingle -> minhash signature -> LSH band buckets (groupby
              shuffle) -> candidate pairs -> exact-Jaccard verify
- simhash:    64-bit simhash over token multiset (near-dup by hamming)
- ngram-jaccard: exact Jaccard over word shingles for candidate pairs
- embedding:  cosine near-dup pairs over the embeddings table

Scale shape: per-doc signatures are computed in ``map_batches`` (stateless,
vectorised over the batch); only the tiny (doc_id, band_hash) pairs enter
the LSH groupby shuffle; candidate verification fetches just the candidate
docs' shingle sets. Cluster assignment (union-find over surviving pairs) is
driver-side — pair counts are ~O(dups), tiny relative to the corpus; at
10^12 docs it becomes an iterated min-label propagation over the pair graph
(exactly our CC operator), which is the documented scale path.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ligrust_ray.stages import shuffle

_WORD = re.compile(r"\S+")


def _content_hash(texts: list[str]) -> list[str]:
    return [hashlib.sha1(t.encode("utf-8")).hexdigest() for t in texts]


def exact_dedup(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id) of the minimal doc_id per distinct text — matches
    ``SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text``.
    Grouping key is sha1(text): the shuffle moves 20-byte keys, not bodies."""

    def hash_batch(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"),
                         "h": pa.array(_content_hash(t.column("text").to_pylist()))})

    hashed = docs.map_batches(hash_batch, batch_format="pyarrow")
    return (shuffle.grouped_agg(hashed, ["h"], {"doc_id": ("doc_id", "min")})
            .select_columns(["doc_id"]))


def _shingles(text: str, k: int) -> set[int]:
    toks = _WORD.findall(text.lower())
    if len(toks) < k:
        joined = " ".join(toks)
        return {hash_shingle(joined)} if joined else set()
    return {hash_shingle(" ".join(toks[i:i + k])) for i in range(len(toks) - k + 1)}


def hash_shingle(s: str) -> int:
    h = int.from_bytes(hashlib.blake2b(s.encode("utf-8"),
                                       digest_size=8).digest(), "big")
    return h - (1 << 64) if h >= (1 << 63) else h  # signed int64 range


class MinHasher:
    """Stateful batch UDF: the permutation parameters are drawn once per
    actor from a fixed seed (deterministic across runs and actor counts)."""

    MERSENNE = (1 << 61) - 1

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 42):
        rng = np.random.default_rng(seed)
        # a < 2^30 and the permutation input x < 2^32, so a*x + b < 2^63:
        # the whole (a*x+b) mod p runs vectorised in int64 — no object-dtype
        # bigint fallback (which made signatures ~50x slower)
        self.a = rng.integers(1, 1 << 30, size=num_perm, dtype=np.int64)
        self.b = rng.integers(0, 1 << 61, size=num_perm, dtype=np.int64)
        self.k = shingle_k
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        if not sh:
            return np.full(self.num_perm, self.MERSENNE, dtype=np.int64)
        x = np.array(sorted(sh), dtype=np.int64) & 0xFFFFFFFF   # low 32 bits
        vals = (x[None, :] * self.a[:, None] + self.b[:, None]) % self.MERSENNE
        return np.min(vals, axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        sigs = np.stack([self.signature(x) for x in texts]) if texts else \
            np.zeros((0, self.num_perm), dtype=np.int64)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.ravel(), type=pa.int64()), self.num_perm),
        })


def minhash_lsh_dedup(docs: ray.data.Dataset, num_perm: int = 64,
                      bands: int = 16, shingle_k: int = 3,
                      threshold: float = 0.8, seed: int = 42
                      ) -> ray.data.Dataset:
    """Returns (doc_id, cluster) — cluster = min doc_id of the near-dup
    group under exact-Jaccard >= threshold verification of LSH candidates."""
    rows_per_band = num_perm // bands
    sigs = docs.map_batches(MinHasher, batch_format="pyarrow", batch_size=512,
                            concurrency=(1, 8),
                            fn_constructor_kwargs=dict(
                                num_perm=num_perm, shingle_k=shingle_k, seed=seed)
                            ).materialize()

    def band_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        sig = np.stack([np.asarray(s) for s in t.column("sig").to_pylist()]) \
            if t.num_rows else np.zeros((0, num_perm), dtype=np.int64)
        out_id, out_b, out_h = [], [], []
        for b in range(bands):
            chunk = sig[:, b * rows_per_band:(b + 1) * rows_per_band]
            hs = [hash_shingle(f"{b}:" + ",".join(map(str, row)))
                  for row in chunk.tolist()]
            out_id.extend(ids.tolist())
            out_b.extend([b] * len(ids))
            out_h.extend(hs)
        return pa.table({"doc_id": pa.array(out_id, type=pa.int64()),
                         "band": pa.array(out_b, type=pa.int64()),
                         "bh": pa.array(out_h, type=pa.int64())})

    def bucket_pairs(part: pd.DataFrame) -> pd.DataFrame:
        """All (a<b) pairs sharing a (band, bh) bucket, vectorised over the
        whole hash partition: only buckets with >=2 docs generate pairs."""
        if not len(part):
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        # bucket key is bh alone: the band index is already hashed into bh
        # (hash_shingle(f"{band}:...")), and a band-multiplied composite
        # would overflow int64 for band >= 2
        d = part.sort_values(["bh", "doc_id"])
        key = d["bh"].to_numpy()
        ids = d["doc_id"].to_numpy(dtype=np.int64)
        starts = np.flatnonzero(np.concatenate(([True], key[1:] != key[:-1])))
        sizes = np.diff(np.append(starts, len(key)))
        out_a, out_b = [], []
        for s, z in zip(starts[sizes >= 2], sizes[sizes >= 2]):
            u = np.unique(ids[s:s + z])
            if len(u) < 2:
                continue
            ii, jj = np.triu_indices(len(u), k=1)
            out_a.append(u[ii])
            out_b.append(u[jj])
        if not out_a:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)})

    cand = shuffle.grouped_apply(
        sigs.map_batches(band_rows, batch_format="pyarrow"),
        ["band", "bh"], bucket_pairs).to_pandas().drop_duplicates()

    # verify candidates with exact jaccard over shingle sets. Only docs
    # that appear in a candidate pair are shingled, inside map_batches;
    # the driver receives O(#candidate docs) shingle sets, never the corpus
    # (the corpus-wide take_all this replaces is the antipattern that
    # cannot run at 10^12 docs).
    cand_ids = np.unique(np.concatenate([
        cand["a"].to_numpy(dtype=np.int64),
        cand["b"].to_numpy(dtype=np.int64)])) if len(cand) else \
        np.zeros(0, dtype=np.int64)
    cand_arr = pa.array(cand_ids, type=pa.int64())

    def shingle_candidates(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.is_in(t.column("doc_id"), value_set=cand_arr))
        ids = t.column("doc_id").to_pylist()
        sets = [np.array(sorted(_shingles(x, shingle_k)), dtype=np.int64)
                for x in t.column("text").to_pylist()]
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "sh": pa.array([s.tolist() for s in sets],
                           type=pa.list_(pa.int64()))})

    sh_map = {}
    for b in (docs.select_columns(["doc_id", "text"])
              .map_batches(shingle_candidates, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        for d, s in zip(b.column("doc_id").to_pylist(),
                        b.column("sh").to_pylist()):
            sh_map[int(d)] = set(s)

    keep_pairs = []
    for a, b in zip(cand.get("a", []), cand.get("b", [])):
        sa, sb = sh_map[int(a)], sh_map[int(b)]
        u = len(sa | sb)
        if u and len(sa & sb) / u >= threshold:
            keep_pairs.append((int(a), int(b)))

    # union-find -> cluster = min id (driver-side; scale path: CC operator)
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in keep_pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    all_ids = sorted(
        int(x) for b in sigs.select_columns(["doc_id"])
        .iter_batches(batch_format="numpy") for x in b["doc_id"])
    cluster = [find(d) for d in all_ids]
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(all_ids, type=pa.int64()),
        "cluster": pa.array(cluster, type=pa.int64())}))


class SimHasher:
    def __init__(self, seed: int = 42):
        self.seed = seed

    @staticmethod
    def simhash64(text: str) -> int:
        toks = _WORD.findall(text.lower())
        if not toks:
            return 0
        digs = np.stack([np.frombuffer(
            hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(),
            dtype=np.uint8) for t in toks])
        bits = np.unpackbits(digs, axis=1).astype(np.int64)   # (ntok, 64)
        acc = np.where(bits == 1, 1, -1).sum(axis=0)
        h = 0
        for i in range(64):
            if acc[i] > 0:
                h |= (1 << i)
        return h - (1 << 64) if h >= (1 << 63) else h

    def __call__(self, t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "simhash": pa.array([self.simhash64(x)
                                 for x in t.column("text").to_pylist()],
                                type=pa.int64())})


def simhash_dataset(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(SimHasher, batch_format="pyarrow", batch_size=512,
                            concurrency=(1, 8))


def ngram_jaccard_pairs(docs: ray.data.Dataset, shingle_k: int = 3,
                        threshold: float = 0.5, num_perm: int = 64,
                        bands: int = 32, seed: int = 42) -> ray.data.Dataset:
    """Near-dup PAIRS (a < b) with exact word-shingle Jaccard >= threshold;
    candidates from an aggressive LSH (many bands => high recall at the
    given threshold)."""
    clustered = minhash_lsh_dedup(docs, num_perm=num_perm, bands=bands,
                                  shingle_k=shingle_k, threshold=threshold,
                                  seed=seed)
    pdf = clustered.to_pandas()
    out_a, out_b = [], []
    for _, grp in pdf.groupby("cluster"):
        ids = np.sort(grp["doc_id"].to_numpy())
        if len(ids) > 1:
            rep = ids[0]
            for other in ids[1:]:
                out_a.append(int(rep))
                out_b.append(int(other))
    return ray.data.from_arrow(pa.table({"a": pa.array(out_a, type=pa.int64()),
                                         "b": pa.array(out_b, type=pa.int64())}))


def embedding_near_dup(emb: ray.data.Dataset, threshold: float = 0.95,
                       ) -> ray.data.Dataset:
    """(a, b) pairs with cosine >= threshold, a < b. Brute-force blocked
    matmul: each batch of rows is compared against the (broadcast) full
    normalised matrix — O(n^2 d / batch) flops, the scale path is the IVF
    partitioner in dataops/ann.py."""
    tbl = emb.select_columns(["vec_id", "embedding"]).to_pandas()
    ids = tbl["vec_id"].to_numpy(dtype=np.int64)
    mat = np.stack(tbl["embedding"].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    mat_ref = ray.put(mat)
    ids_ref = ray.put(ids)

    def block(t: pa.Table) -> pa.Table:
        m = ray.get(mat_ref)
        all_ids = ray.get(ids_ref)
        q_ids = t.column("vec_id").to_numpy()
        q = np.stack([np.asarray(v) for v in t.column("embedding").to_pylist()]
                     ).astype(np.float64)
        q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        sims = q @ m.T
        ii, jj = np.nonzero(sims >= threshold)
        a = q_ids[ii]
        b = all_ids[jj]
        keep = a < b
        return pa.table({"a": pa.array(a[keep], type=pa.int64()),
                         "b": pa.array(b[keep], type=pa.int64())})

    return emb.select_columns(["vec_id", "embedding"]).map_batches(
        block, batch_format="pyarrow", batch_size=256)
