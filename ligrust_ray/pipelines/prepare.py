"""The full LM-corpus `prepare` pipeline as a callable (extracted from
cli.py so the CLI, the bench volume-validation runs and tests share one
implementation): quality clean -> dedup -> deterministic training-order
shuffle -> pos-ordered resumable shards.

Stage timers are returned alongside the counts so volume sweeps can
attribute wall time per stage (clean / dedup / shuffle+write)."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import ray.data


def prepare_corpus(sf_dir: str, output: str, method: str = "exact",
                   resume: bool = True) -> dict:
    """Run clean -> dedup(method) -> shuffle-rank -> shard write over
    ``{sf_dir}/documents.parquet`` into ``output``; returns counts +
    per-stage wall seconds."""
    from ligrust_ray.dataops import dedup as D
    from ligrust_ray.pipelines import queries as Q
    from ligrust_ray.sources.resumable_sink import write_partitioned
    from ligrust_ray.stages.shuffle import hash_join, semi_join

    timings: dict[str, float] = {}
    t0 = time.perf_counter()
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet")).materialize()
    n_docs = docs.count()
    # 0. one row per doc_id (content-addressed imports carry duplicate
    # rows for repeated texts — they would cross-product through the
    # final join)
    docs = D.unique_by_id(docs).materialize()
    timings["read_unique"] = time.perf_counter() - t0

    # 1. quality clean (the docs_clean composite keeps doc_ids and is
    # ALREADY exact-deduplicated — min doc_id per distinct text)
    t0 = time.perf_counter()
    cleaned = semi_join(docs, Q.q_docs_clean(sf_dir),
                        l_on="doc_id", r_on="doc_id",
                        r_key_type=pa.int64()).materialize()
    n_clean = cleaned.count()
    timings["clean"] = time.perf_counter() - t0

    # 2. near-dup pass (exact is a no-op on the cleaned set — skip the
    # redundant shuffle entirely)
    t0 = time.perf_counter()
    if method == "exact":
        surv = cleaned
    else:
        surv = semi_join(
            cleaned, D.survivor_ids(cleaned, method),
            l_on="doc_id", r_on="doc_id",
            r_key_type=pa.int64()).materialize()
    n_kept = surv.count()
    timings["dedup"] = time.perf_counter() - t0

    # 3. deterministic training-order shuffle over the survivors,
    # 4. bodies join + pos-ordered resumable shard write
    t0 = time.perf_counter()
    order = Q.shuffle_rank(surv.select_columns(["doc_id"]))
    body_cols = [c for c in surv.schema().names if c != "doc_id"]
    ds = hash_join(surv, order, on="doc_id", l_cols=body_cols,
                   r_cols=["pos", "shard"])
    stats = write_partitioned(ds, output, key="doc_id",
                              shard_col="shard", order_by="pos",
                              resume=resume)
    timings["shuffle_write"] = time.perf_counter() - t0

    return {
        "output": output, "n_docs": int(n_docs),
        "n_clean": int(n_clean), "n_kept": int(n_kept),
        "method": method, "shards": int(len(stats)),
        "rows_written": int(stats["rows"].sum()),
        "shards_skipped": int(stats["skipped"].sum()),
        "timings": timings,
    }
