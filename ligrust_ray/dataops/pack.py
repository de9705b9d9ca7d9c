"""Sequence packing — assign documents to fixed-token-budget training
packs by a deterministic, SQL-replicable rule.

Spec (mirrored by __ray_entry__'s ``docs_pack`` oracle): documents are
ordered by ``doc_id``; ``prev`` = the exclusive running sum of per-doc
token counts (whitespace tokens, textstats.token_count_batch semantics);
``pack_id = prev // pack_tokens``. This is the "contiguous greedy fill"
packer: a doc starts in the pack where its predecessor's running total
landed (docs may straddle a boundary — real packers split the straddling
doc across sequences; the assignment of the doc's FIRST token is what we
record). Output: one row per doc (doc_id, n_tokens, pack_id).

Scale shape — a textbook distributed prefix sum (scan):
1. one narrow pass computes (doc_id, n_tokens, bucket = doc_id //
   BUCKET) per batch (vectorised token count, no shuffle);
2. per-bucket token sums via grouped_agg (partial-combined shuffle of
   one row per bucket per block);
3. the bucket-sum table — O(n / BUCKET) rows, 65536x smaller than the
   corpus — is exclusive-cumsummed; at 10^12 docs that is ~15M rows,
   a single-task job (tree the scan one more level if it ever binds);
4. the offsets ride the object store (ray.put) into one grouped_apply
   keyed by bucket: in-bucket exclusive cumsum over doc_id order + the
   bucket's offset, then an integer divide.
Nothing n-length touches the driver; bodies shuffle once, as (id, count)
pairs only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ligrust_ray.dataops import textstats
from ligrust_ray.stages import shuffle

PACK_TOKENS = 2048          # tokens per training sequence
PACK_BUCKET = 1 << 16       # doc_ids per scan bucket


def pack_assign(docs: ray.data.Dataset, pack_tokens: int = PACK_TOKENS,
                bucket: int = PACK_BUCKET,
                num_partitions: int = 32) -> ray.data.Dataset:
    """(doc_id, n_tokens, pack_id) per the module spec."""

    def counts(t: pa.Table) -> pa.Table:
        c = textstats.token_count_batch(t)
        did = c.column("doc_id").to_numpy()
        return c.append_column("bucket", pa.array(did // bucket,
                                                  type=pa.int64()))

    tc = docs.map_batches(counts, batch_format="pyarrow").materialize()
    if tc.count() == 0:
        # map_batches UDFs are skipped on empty blocks (no `bucket` column
        # downstream) — return the typed empty output directly
        return ray.data.from_arrow(pa.schema(
            [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
             ("pack_id", pa.int64())]).empty_table())

    sums = shuffle.grouped_agg(tc, ["bucket"], {"tok": ("n_tokens", "sum")},
                               num_partitions=num_partitions).to_pandas()
    sums = sums.sort_values("bucket")
    # exclusive prefix over buckets (empty buckets simply don't appear)
    off = np.concatenate(([0], np.cumsum(sums["tok"].to_numpy())[:-1])) \
        if len(sums) else np.array([], dtype=np.int64)
    off_ref = ray.put(pd.Series(off.astype(np.int64),
                                index=sums["bucket"].to_numpy()))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in ("doc_id", "n_tokens", "pack_id")})
        offs = ray.get(off_ref)
        df = df.sort_values("doc_id")
        nt = df["n_tokens"].to_numpy(dtype=np.int64)
        bk = df["bucket"].to_numpy(dtype=np.int64)
        cum = np.cumsum(nt) - nt                    # in-partition exclusive
        # restart the running sum at each bucket boundary, then add the
        # bucket's corpus-level offset
        first = np.concatenate(([True], bk[1:] != bk[:-1]))
        base = np.where(first, cum, 0)
        np.maximum.accumulate(base, out=base)
        prev = cum - base + offs.loc[bk].to_numpy(dtype=np.int64)
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                             "n_tokens": nt,
                             "pack_id": prev // pack_tokens})

    return shuffle.grouped_apply(tc, ["bucket"], assign,
                                 num_partitions=num_partitions)
