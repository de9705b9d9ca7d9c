"""Windowed / sessionized aggregates over event streams.

The classic "streaming window" operator family expressed Ray-Data-first:
hash-partition by the window key (user), then ONE vectorised pass per
partition (lexsort + diff — no per-row Python, no per-group calls). The
partitioning assumption: all events of a key fit one partition (true for
per-user web sessions at any realistic skew; a pathological key would
need the same salting as any keyed shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ligrust_ray.stages import shuffle

SESSION_GAP_US = 30 * 60 * 1_000_000     # 30 min, microseconds


def sessionize(events: ray.data.Dataset, gap_us: int = SESSION_GAP_US
               ) -> ray.data.Dataset:
    """(user_id, n_sessions, n_events): a new session starts at the first
    event or when the gap to the previous event of the SAME user exceeds
    ``gap_us``. Ties on ts break by event_id (deterministic, shared with
    the SQL oracle's ORDER BY ts, event_id)."""

    def per_partition(part: pd.DataFrame) -> pd.DataFrame:
        if not len(part):
            return pd.DataFrame({
                "user_id": pd.Series([], dtype=np.int64),
                "n_sessions": pd.Series([], dtype=np.int64),
                "n_events": pd.Series([], dtype=np.int64)})
        u = part["user_id"].to_numpy(dtype=np.int64)
        ts = part["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = part["event_id"].to_numpy(dtype=np.int64)
        order = np.lexsort((eid, ts, u))
        u, ts = u[order], ts[order]
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        gap = np.concatenate(([0], np.diff(ts)))
        new_session = new_user | (gap > gap_us)
        starts = np.flatnonzero(new_user)
        counts = np.diff(np.append(starts, len(u)))
        uid = u[starts]
        seg = np.repeat(np.arange(len(starts)), counts)
        n_sessions = np.bincount(seg, weights=new_session).astype(np.int64)
        return pd.DataFrame({"user_id": uid, "n_sessions": n_sessions,
                             "n_events": counts.astype(np.int64)})

    return shuffle.grouped_apply(
        events.select_columns(["event_id", "ts", "user_id"]),
        ["user_id"], per_partition)


def tumbling_window_counts(events: ray.data.Dataset,
                           window_us: int = 3_600_000_000
                           ) -> ray.data.Dataset:
    """(window_start_us, n_events, sum_value_cents): fixed (tumbling)
    time-window aggregate — stateless per batch (window id is a pure
    function of ts), partial-combined before one small shuffle."""

    def bucket(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        w = (ts // window_us) * window_us
        # floor(x+0.5): shared with the SQL oracle — np.round's half-even
        # diverges from DuckDB ROUND on exact .5 values
        cents = np.floor(t.column("value").to_numpy() * 100.0 + 0.5) \
            .astype(np.int64)
        return pa.table({"window_start_us": pa.array(w),
                         "cents": pa.array(cents)})

    out = shuffle.grouped_agg(
        events.select_columns(["ts", "value"]).map_batches(
            bucket, batch_format="pyarrow"),
        ["window_start_us"],
        {"n_events": (None, "count"), "sum_value_cents": ("cents", "sum")})
    return out.map_batches(
        lambda t: pa.table({
            "window_start_us": t.column("window_start_us").cast(pa.int64()),
            "n_events": t.column("n_events").cast(pa.int64()),
            "sum_value_cents":
                t.column("sum_value_cents").cast(pa.int64())}),
        batch_format="pyarrow")
