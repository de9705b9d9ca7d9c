"""DSIR-style hashed importance resampling (Xie et al. 2023, "Data
Selection for Language Models via Importance Resampling" — public
method): score every document by how much its hashed-unigram profile
looks like a TARGET slice of the corpus (e.g. lang == 'en'), then keep
the top-K. The classic use: select general-web text that resembles a
curated target domain.

Integer-exact spec (so the DuckDB oracle hash-matches bit for bit):

1. tokens  = maximal ``\\S+`` runs (RE2 semantics — pyarrow's regex
   kernels ARE RE2, same engine as DuckDB's, so Unicode whitespace
   behaves identically on both sides);
2. bucket  = md5_number_lower(token) % N_BUCKETS  (vectorised md5, the
   shared hashing helper);
3. per-bucket counts over the WHOLE corpus (nc) and over the target
   slice (nt) — the feature table is bounded at N_BUCKETS rows, so at
   any corpus scale this is one partial-combined grouped_agg plus one
   broadcast of two int64[N_BUCKETS] arrays;
4. token weight  tw(b)   = (SCALE * (nt[b] + 1)) // (nc[b] + 1)
   (Laplace-smoothed likelihood ratio, integer floor);
5. doc score     score   = sum(tw of its tokens) // n_tokens
   (length-normalised; docs with zero tokens emit no score row);
6. resample      top-K docs by (score DESC, doc_id ASC).

Scale shape: two streaming passes over the text (count, then score) —
nothing doc-count-sized ever reaches the driver; the only driver-side
object is the N_BUCKETS-row count table (bounded, like nation/region
dims). The per-batch kernels are pure Arrow/numpy: RE2 split, list
flatten with a repeated parent index, one vectorised md5 per batch,
np.bincount for the per-doc sums.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ligrust_ray.stages import shuffle

N_BUCKETS = 8192          # hashed unigram feature space (2^13)
SCALE = 1_000_000         # integer likelihood-ratio scale

_WS_RE2 = r"[\t\n\f\r ]+"   # RE2 \s — explicit class, parity-pinned


def _doc_token_buckets(t: pa.Table, text_col: str
                       ) -> tuple[np.ndarray, np.ndarray]:
    """(parent_row_idx, bucket) for every token occurrence in the batch
    — RE2 whitespace split + vectorised md5, no per-row Python."""
    from ligrust_ray.dataops.hashing import md5_u64_lower_arrow

    toks = pc.split_pattern_regex(t.column(text_col),
                                  pattern=_WS_RE2).combine_chunks()
    lens = pc.list_value_length(toks).to_numpy()
    parents = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    flat = toks.flatten()
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    parents = parents[keep]
    flat = flat.filter(pa.array(keep))
    if not len(parents):
        return parents, np.zeros(0, dtype=np.int64)
    bucket = (md5_u64_lower_arrow(flat)
              % np.uint64(N_BUCKETS)).astype(np.int64)
    return parents, bucket


def bucket_counts(docs: ray.data.Dataset, target_col: str,
                  target_value: str, text_col: str = "text"
                  ) -> tuple[np.ndarray, np.ndarray]:
    """(nc, nt): int64[N_BUCKETS] token-occurrence counts over the whole
    corpus and over the target slice. Map-side partials bound the
    shuffle at N_BUCKETS rows per block."""
    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"bucket": pa.array([], type=pa.int64()),
                          "nc": pa.array([], type=pa.int64()),
                          "nt": pa.array([], type=pa.int64())})
        if not t.num_rows:
            return empty
        parents, bucket = _doc_token_buckets(t, text_col)
        if not len(parents):
            return empty
        is_t = pc.equal(t.column(target_col),
                        target_value).to_numpy(zero_copy_only=False)
        nc = np.bincount(bucket, minlength=N_BUCKETS)
        nt = np.bincount(bucket[is_t[parents]], minlength=N_BUCKETS)
        nz = np.flatnonzero(nc)
        return pa.table({"bucket": pa.array(nz),
                         "nc": pa.array(nc[nz].astype(np.int64)),
                         "nt": pa.array(nt[nz].astype(np.int64))})

    counts = shuffle.grouped_agg(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["bucket"], {"nc": ("nc", "sum"), "nt": ("nt", "sum")}).to_pandas()
    nc = np.zeros(N_BUCKETS, dtype=np.int64)
    nt = np.zeros(N_BUCKETS, dtype=np.int64)
    b = counts["bucket"].to_numpy()
    nc[b] = counts["nc"].to_numpy()
    nt[b] = counts["nt"].to_numpy()
    return nc, nt


def dsir_scores(docs: ray.data.Dataset, target_col: str = "lang",
                target_value: str = "en", text_col: str = "text"
                ) -> ray.data.Dataset:
    """(doc_id, score) — length-normalised integer importance score per
    document with >=1 token (see module spec)."""
    nc, nt = bucket_counts(docs, target_col, target_value, text_col)
    tw_ref = ray.put((SCALE * (nt + 1)) // (nc + 1))   # int64[N_BUCKETS]

    def score(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "score": pa.array([], type=pa.int64())})
        if not t.num_rows:
            return empty
        parents, bucket = _doc_token_buckets(t, text_col)
        if not len(parents):
            return empty
        tw = ray.get(tw_ref)
        # int64-exact per-doc sums: bincount(weights=) is float64 (rounds
        # above 2^53) and np.add.at is the slow unbuffered scatter —
        # parents is NONDECREASING by construction (np.repeat of arange,
        # order-preserving filter), so one np.add.reduceat segment sum
        # does it at vector speed with integral arithmetic
        starts = np.flatnonzero(np.r_[True, parents[1:] != parents[:-1]])
        wsum = np.zeros(t.num_rows, dtype=np.int64)
        wsum[parents[starts]] = np.add.reduceat(tw[bucket], starts)
        ntok = np.bincount(parents, minlength=t.num_rows).astype(np.int64)
        has = ntok > 0
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        return pa.table({"doc_id": pa.array(ids[has]),
                         "score": pa.array(wsum[has] // ntok[has])})

    return docs.map_batches(score, batch_format="pyarrow")


def dsir_sample(docs: ray.data.Dataset, k: int,
                target_col: str = "lang", target_value: str = "en",
                text_col: str = "text") -> pa.Table:
    """Top-k (doc_id, score) by (score DESC, doc_id ASC): per-block
    partial top-k, then one bounded final merge (<= k rows per block
    reach the driver)."""
    scored = dsir_scores(docs, target_col, target_value, text_col)

    def topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        idx = np.lexsort((t.column("doc_id").to_numpy(),
                          -t.column("score").to_numpy()))[:k]
        return t.take(pa.array(np.sort(idx)))

    parts = [b for b in scored.map_batches(topk, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")]
    allp = pa.concat_tables([pa.table(p) for p in parts]) if parts else \
        pa.table({"doc_id": pa.array([], type=pa.int64()),
                  "score": pa.array([], type=pa.int64())})
    s = allp.column("score").to_numpy()
    d = allp.column("doc_id").to_numpy()
    idx = np.lexsort((d, -s))[:k]
    return pa.table({"doc_id": pa.array(d[idx].astype(np.int64)),
                     "score": pa.array(s[idx].astype(np.int64))})
