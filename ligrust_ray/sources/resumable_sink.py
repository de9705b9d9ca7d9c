"""Resumable partitioned Parquet sink.

A 100-TB pipeline run WILL lose nodes mid-write; output must be laid out
so a rerun skips finished work instead of starting over. This sink writes
one directory per deterministic key-hash shard:

    out_dir/shard=00042/part.parquet      the shard's rows
    out_dir/shard=00042/_SUCCESS          commit marker (written LAST)

Shard assignment is a pure function of the row key (knuth-hash for int64
keys, md5_number_lower for strings — both stable across runs, processes
and cluster sizes), NEVER of block boundaries or task ids, so a rerun
reproduces the same shard contents bit-for-bit and `resume=True` can skip
any shard whose `_SUCCESS` marker exists. Files are written to a `.tmp`
name and renamed into place before the marker lands — a task killed
mid-write leaves no marker and at worst an orphaned `.tmp`, so partial
output is never mistaken for finished output.

Shape: one grouped_apply shuffle routes rows to their shard partition;
each partition task writes its shards locally and emits one tiny stats
row per shard. Nothing returns to the driver but the stats table
(O(num_shards) rows).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ligrust_ray.stages import shuffle

_KNUTH = np.uint64(2654435761)


def shard_of(key, num_shards: int) -> np.ndarray:
    """Deterministic shard id per key: ints via a Knuth multiplicative
    hash (plain ``% num_shards`` would map key ranges to single shards),
    strings via md5_number_lower."""
    arr = np.asarray(key)
    if arr.dtype.kind in "iu":
        return ((arr.astype(np.uint64) * _KNUTH) >> np.uint64(16)
                ).astype(np.int64) % num_shards
    from ligrust_ray.dataops.hashing import md5_u64_lower_arrow

    return (md5_u64_lower_arrow([str(x) for x in arr])
            % np.uint64(num_shards)).astype(np.int64)


def _check_sink_config(out_dir: str, cfg: dict, resume: bool) -> None:
    """Validate-or-record this run's sink parameters + input fingerprint
    (row count, column set). A _SUCCESS marker alone proves a shard was
    COMMITTED, not that it was committed from THIS input with THIS
    sharding — resuming with a different num_shards, key, or input would
    silently keep stale shard contents and read_partitioned would mix
    generations. Mismatch on a RESUME fails loudly; ``resume=False``
    declares a fresh generation, so the config is simply replaced (every
    shard gets rewritten below regardless). Same-count same-columns
    content drift is caught per shard by the marker row-count check.

    A pre-upgrade sink (shard= dirs, no _SINK_CONFIG) is ADOPTED: the
    current config is recorded and the resume proceeds — the per-shard
    committed-rows check still fails loudly if the input changed, which
    is strictly better than forcing a from-scratch rewrite of every
    committed shard."""
    path = os.path.join(out_dir, "_SINK_CONFIG")
    if resume and os.path.exists(path):
        with open(path) as f:
            old = json.load(f)
        if old != cfg:
            diff = {k: (old.get(k), cfg[k]) for k in cfg
                    if old.get(k) != cfg[k]}
            raise ValueError(
                f"resumable sink mismatch under {out_dir}: committed vs "
                f"current differ on {diff} — refusing to mix output "
                "generations; use a fresh out_dir, delete the old one, or "
                "pass resume=False to rewrite it as a new generation")
        return
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cfg, f)
    os.replace(tmp, path)


def write_partitioned(ds: ray.data.Dataset, out_dir: str, key: str,
                      num_shards: int = 64, resume: bool = True,
                      num_partitions: int = 32,
                      shard_col: str | None = None,
                      order_by: str | None = None) -> pd.DataFrame:
    """Write ``ds`` under ``out_dir`` sharded by ``key`` per the module
    spec; returns the per-shard stats table (shard, rows, skipped). Size
    ``num_shards`` so one shard ~ one comfortable parquet file (hundreds
    of MB at scale); a rerun over the same input skips committed shards.

    ``shard_col`` (optional): use an EXISTING int column as the shard id
    instead of hashing ``key`` — for precomputed assignments like the
    training-order shuffle's ``shard``; determinism is then the
    caller's contract. ``order_by`` (default ``key``) sets the in-shard
    row order."""
    os.makedirs(out_dir, exist_ok=True)
    order_by = order_by or key

    def route(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.assign(__shard=pd.Series([], dtype=np.int64))
        sh = (df[shard_col].to_numpy(dtype=np.int64) if shard_col
              else shard_of(df[key].to_numpy(), num_shards))
        return df.assign(__shard=sh)

    def write_shards(df: pd.DataFrame) -> pd.DataFrame:
        stats = []
        for sh, g in df.groupby("__shard", sort=True):
            sdir = os.path.join(out_dir, f"shard={int(sh):05d}")
            marker = os.path.join(sdir, "_SUCCESS")
            if resume and os.path.exists(marker):
                # committed-marker row count vs THIS run's routed rows for
                # the shard: sharding is a pure key function, so any
                # difference means the input changed since the commit —
                # skipping would silently mix generations
                with open(marker) as f:
                    committed = int(f.read().strip().split("=", 1)[1])
                if committed != len(g):
                    raise ValueError(
                        f"resume mismatch in {sdir}: committed rows="
                        f"{committed} but current input routes {len(g)} "
                        "rows here — the input changed since this shard "
                        "was written; use a fresh out_dir (or resume="
                        "False to overwrite)")
                stats.append((int(sh), 0, 1))
                continue
            os.makedirs(sdir, exist_ok=True)
            g = g.drop(columns=[c for c in g.columns
                                if c.startswith("__")]) \
                .sort_values(order_by)
            final = os.path.join(sdir, "part.parquet")
            tmp = final + ".tmp"
            pq.write_table(pa.Table.from_pandas(g, preserve_index=False),
                           tmp)
            os.replace(tmp, final)            # atomic on one filesystem
            with open(marker + ".tmp", "w") as f:
                f.write(f"rows={len(g)}\n")
            os.replace(marker + ".tmp", marker)
            stats.append((int(sh), len(g), 0))
        if not stats:
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in ("shard", "rows", "skipped")})
        out = pd.DataFrame(stats, columns=["shard", "rows", "skipped"])
        return out.astype(np.int64)

    empty_stats = pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                for c in ("shard", "rows", "skipped")})
    # grouped_apply hash-routes by __shard so a shard never spans tasks
    # (each shard directory has exactly one writer)
    routed = ds.map_batches(route, batch_format="pandas").materialize()
    if routed.count() > 0:      # empty input writes nothing to validate
        _check_sink_config(out_dir, {
            "key": key, "num_shards": int(num_shards),
            "shard_col": shard_col, "order_by": order_by,
            "n_rows": int(routed.count()),
            "columns": sorted(c for c in routed.schema().names
                              if not c.startswith("__"))}, resume)
        if not resume:
            # fresh generation: the new routing may touch FEWER shard ids
            # than the old one (smaller num_shards, different key) —
            # lingering committed dirs would mix generations in
            # read_partitioned, so clear every old shard dir up front
            import shutil

            for name in os.listdir(out_dir):
                if name.startswith("shard="):
                    shutil.rmtree(os.path.join(out_dir, name),
                                  ignore_errors=True)
    if routed.count() == 0:
        # map_batches/map_groups are skipped on empty blocks (the Ray
        # empty-block gotcha): the stats frame would come back schema-less
        return empty_stats
    stats = shuffle.grouped_apply(routed, ["__shard"], write_shards,
                                  num_partitions=num_partitions)
    df = stats.to_pandas()                    # O(num_shards) rows
    return df.sort_values("shard").reset_index(drop=True)


def read_partitioned(out_dir: str) -> ray.data.Dataset:
    """Read back a committed sink directory, ignoring uncommitted shards
    and orphaned ``.tmp`` files."""
    parts = []
    for name in sorted(os.listdir(out_dir)):
        sdir = os.path.join(out_dir, name)
        if name.startswith("shard=") and \
                os.path.exists(os.path.join(sdir, "_SUCCESS")):
            parts.append(os.path.join(sdir, "part.parquet"))
    if not parts:
        raise FileNotFoundError(f"no committed shards under {out_dir}")
    # partitioning=None: don't hive-infer a `shard` column from the path
    return ray.data.read_parquet(parts, partitioning=None)
