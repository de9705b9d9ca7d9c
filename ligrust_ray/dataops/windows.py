"""Windowed / sessionized aggregates over event streams.

The classic "streaming window" operator family expressed Ray-Data-first:
hash-partition by the window key (user), then ONE vectorised pass per
partition (lexsort + diff — no per-row Python, no per-group calls). The
default partitioning assumption: all events of a key fit one partition
(true for per-user web sessions at any realistic skew). For pathological
keys, ``sessionize(..., salt_slab_us=...)`` switches to the two-phase
salted plan: phase 1 partitions by (key, time-slab) and emits one partial
session summary per slab; phase 2 merges slab boundaries per key (a
boundary join happens exactly when the gap across two adjacent slabs'
last/first events is within the session gap). Per-partition volume is
bounded by slab duration x event rate, not by key popularity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ligrust_ray.stages import shuffle

SESSION_GAP_US = 30 * 60 * 1_000_000     # 30 min, microseconds


def sessionize(events: ray.data.Dataset, gap_us: int = SESSION_GAP_US,
               salt_slab_us: int | None = None) -> ray.data.Dataset:
    """(user_id, n_sessions, n_events): a new session starts at the first
    event or when the gap to the previous event of the SAME user exceeds
    ``gap_us``. Ties on ts break by event_id (deterministic, shared with
    the SQL oracle's ORDER BY ts, event_id).

    ``salt_slab_us`` (optional) enables the skew-proof two-phase plan for
    keys whose full history exceeds one partition — see module docstring;
    results are identical (tested)."""
    if salt_slab_us is not None:
        return _sessionize_salted(events, gap_us, salt_slab_us)

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


def _sessionize_salted(events: ray.data.Dataset, gap_us: int,
                       slab_us: int) -> ray.data.Dataset:
    """Two-phase sessionization: (user, ts//slab_us) partials, then a tiny
    per-user boundary merge. Within a slab the session rule is applied
    verbatim (first slab event opens a session); across ADJACENT present
    slabs, the two sessions merge iff first_ts(next) - last_ts(prev)
    <= gap_us — subtracting one session per such join reproduces the
    single-pass count exactly. Phase-2 volume is one summary row per
    (user, slab), bounded regardless of key popularity."""

    def add_slab(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(dtype=np.int64),
            "event_id": df["event_id"].to_numpy(dtype=np.int64),
            "ts_us": ts, "slab": ts // slab_us})

    def slab_partial(part: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "slab", "n_sessions", "n_events",
                "first_ts", "last_ts"]
        if not len(part):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        u = part["user_id"].to_numpy(dtype=np.int64)
        sl = part["slab"].to_numpy(dtype=np.int64)
        ts = part["ts_us"].to_numpy(dtype=np.int64)
        eid = part["event_id"].to_numpy(dtype=np.int64)
        order = np.lexsort((eid, ts, sl, u))
        u, sl, ts = u[order], sl[order], ts[order]
        new_seg = np.concatenate(
            ([True], (u[1:] != u[:-1]) | (sl[1:] != sl[:-1])))
        gap = np.concatenate(([0], np.diff(ts)))
        new_session = new_seg | (gap > gap_us)
        starts = np.flatnonzero(new_seg)
        counts = np.diff(np.append(starts, len(u)))
        seg = np.repeat(np.arange(len(starts)), counts)
        return pd.DataFrame({
            "user_id": u[starts], "slab": sl[starts],
            "n_sessions": np.bincount(seg, weights=new_session)
            .astype(np.int64),
            "n_events": counts.astype(np.int64),
            "first_ts": ts[starts],
            "last_ts": np.maximum.reduceat(ts, starts)})

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        if not len(part):
            return pd.DataFrame({
                "user_id": pd.Series([], dtype=np.int64),
                "n_sessions": pd.Series([], dtype=np.int64),
                "n_events": pd.Series([], dtype=np.int64)})
        part = part.sort_values(["user_id", "slab"])
        u = part["user_id"].to_numpy(dtype=np.int64)
        first = part["first_ts"].to_numpy(dtype=np.int64)
        last = part["last_ts"].to_numpy(dtype=np.int64)
        joins = np.concatenate(
            ([False], (u[1:] == u[:-1]) & (first[1:] - last[:-1] <= gap_us)))
        starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        counts = np.diff(np.append(starts, len(u)))
        seg = np.repeat(np.arange(len(starts)), counts)
        ns = part["n_sessions"].to_numpy(dtype=np.int64)
        ne = part["n_events"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "user_id": u[starts],
            "n_sessions": (np.bincount(seg, weights=ns)
                           - np.bincount(seg, weights=joins))
            .astype(np.int64),
            "n_events": np.bincount(seg, weights=ne).astype(np.int64)})

    partials = shuffle.grouped_apply(
        events.select_columns(["event_id", "ts", "user_id"]),
        ["user_id", "slab"], slab_partial, pre=add_slab)
    return shuffle.grouped_apply(partials, ["user_id"], merge)


def asof_last_match(events: ray.data.Dataset, match_value: str = "click",
                    salt_slab_us: int | None = None) -> ray.data.Dataset:
    """As-of self join: for every event, the epoch-us timestamp of the most
    recent STRICTLY PRECEDING event of the same user whose event_type
    equals ``match_value`` (-1 when none). Order is (ts, event_id) —
    shared with the SQL oracle. Default plan: hash-partition by user, one
    vectorised sorted sweep (assumes one user's history fits a partition).

    ``salt_slab_us`` enables the skew-proof two-phase plan: within-slab
    sweeps partitioned by (user, time-slab), a per-(user, slab) max-match
    summary, a tiny per-user prefix-max carry over slabs, and a
    (user, slab)-bucketed join attaching the carry — every stage's
    partition volume is bounded by slab duration x event rate. Identical
    results (tested): carried matches are strictly earlier (smaller slab
    => smaller ts), so answer = max(within-slab value, carry-in)."""

    def sweep(part: pd.DataFrame, seg_cols: list[str]) -> pd.DataFrame:
        if not len(part):
            return pd.DataFrame({
                c: pd.Series([], dtype=np.int64)
                for c in [*seg_cols, "event_id", "within"]})
        u = part["user_id"].to_numpy(dtype=np.int64)
        ts = part["ts_us"].to_numpy(dtype=np.int64)
        eid = part["event_id"].to_numpy(dtype=np.int64)
        is_m = part["is_match"].to_numpy()
        sl = part["slab"].to_numpy(dtype=np.int64) if "slab" in seg_cols \
            else np.zeros(len(u), dtype=np.int64)
        order = np.lexsort((eid, ts, sl, u))
        u, ts, eid, is_m, sl = (u[order], ts[order], eid[order],
                                is_m[order], sl[order])
        match_ts = np.where(is_m, ts, np.int64(-1))
        prev = np.concatenate(([np.int64(-1)], match_ts[:-1]))
        new_seg = np.concatenate(
            ([True], (u[1:] != u[:-1]) | (sl[1:] != sl[:-1])))
        prev[new_seg] = -1
        seg_id = np.cumsum(new_seg)
        within = pd.DataFrame({"s": seg_id, "p": prev}).groupby("s")["p"] \
            .cummax().to_numpy(dtype=np.int64)
        out = {"user_id": u, "event_id": eid, "within": within}
        if "slab" in seg_cols:
            out["slab"] = sl
        return pd.DataFrame(out)

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        out = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(dtype=np.int64),
            "event_id": df["event_id"].to_numpy(dtype=np.int64),
            "ts_us": ts,
            "is_match": df["event_type"].to_numpy() == match_value})
        if salt_slab_us is not None:
            out["slab"] = ts // salt_slab_us
        return out

    if salt_slab_us is None:
        def plain(part: pd.DataFrame) -> pd.DataFrame:
            r = sweep(part, ["user_id"])
            return pd.DataFrame({"event_id": r["event_id"],
                                 "last_click_us": r["within"]})

        return shuffle.grouped_apply(
            events.select_columns(["event_id", "ts", "user_id",
                                   "event_type"]),
            ["user_id"], plain, pre=prep)

    ev2 = events.select_columns(
        ["event_id", "ts", "user_id", "event_type"]).map_batches(
        prep, batch_format="pandas").materialize()   # consumed twice

    within = shuffle.grouped_apply(
        ev2, ["user_id", "slab"],
        lambda part: sweep(part, ["user_id", "slab"]))

    def slab_summary(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(dtype=np.int64),
            "slab": df["slab"].to_numpy(dtype=np.int64),
            "mt": np.where(df["is_match"].to_numpy(),
                           df["ts_us"].to_numpy(dtype=np.int64),
                           np.int64(-1))})

    summaries = shuffle.grouped_agg(
        ev2.map_batches(slab_summary, batch_format="pandas"),
        ["user_id", "slab"], {"mt": ("mt", "max")})

    def carry_of(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["user_id", "slab"])
        u = part["user_id"].to_numpy(dtype=np.int64)
        mt = part["mt"].to_numpy(dtype=np.int64)
        new_u = np.concatenate(([True], u[1:] != u[:-1]))
        prev = np.concatenate(([np.int64(-1)], mt[:-1]))
        prev[new_u] = -1
        seg = np.cumsum(new_u)
        carry = pd.DataFrame({"s": seg, "p": prev}).groupby("s")["p"] \
            .cummax().to_numpy(dtype=np.int64)
        return pd.DataFrame({"user_id": u,
                             "slab": part["slab"].to_numpy(dtype=np.int64),
                             "carry": carry})

    carries = shuffle.grouped_apply(summaries, ["user_id"], carry_of)

    # (user, slab)-bucketed join: both sides route by the same mixed int
    # key, exact match on the real columns inside the partition
    def add_jk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["jk"] = (df["user_id"].to_numpy(dtype=np.int64)
                    * np.int64(1000003)
                    + df["slab"].to_numpy(dtype=np.int64))
        return df

    w_schema = pa.schema([("user_id", pa.int64()), ("event_id", pa.int64()),
                          ("within", pa.int64()), ("slab", pa.int64()),
                          ("jk", pa.int64())])
    c_schema = pa.schema([("user_id", pa.int64()), ("slab", pa.int64()),
                          ("carry", pa.int64()), ("jk", pa.int64())])

    def attach(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        j = lf.merge(rf[["user_id", "slab", "carry"]],
                     on=["user_id", "slab"], how="inner")
        return pd.DataFrame({
            "event_id": j["event_id"].to_numpy(dtype=np.int64),
            "last_click_us": np.maximum(
                j["within"].to_numpy(dtype=np.int64),
                j["carry"].to_numpy(dtype=np.int64))})

    return shuffle.co_group(
        within.map_batches(add_jk, batch_format="pandas"),
        carries.map_batches(add_jk, batch_format="pandas"),
        l_on="jk", r_on="jk", fn=attach,
        l_schema=w_schema, r_schema=c_schema)


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


def hopping_window_counts(events: ray.data.Dataset,
                          window_us: int = 3_600_000_000,
                          hop_us: int = 900_000_000) -> ray.data.Dataset:
    """(window_start_us, n_events, sum_value_cents): HOPPING (sliding)
    time windows of length ``window_us`` advancing every ``hop_us`` —
    each event lands in window_us/hop_us overlapping windows. Stateless
    fan-out per batch (every start is a pure function of ts), then the
    same partial-combined grouped aggregate as the tumbling variant; the
    shuffle carries k pre-combined rows per (batch, window), never k
    copies of the events."""
    if window_us % hop_us:
        raise ValueError("window_us must be a multiple of hop_us")
    k = window_us // hop_us

    def bucket(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        base = (ts // hop_us) * hop_us
        # event ts belongs to starts {base - j*hop : j < k}; every one
        # satisfies start <= ts < start + window by construction
        j = np.tile(np.arange(k, dtype=np.int64) * hop_us, len(ts))
        w = np.repeat(base, k) - j
        cents = np.floor(t.column("value").to_numpy() * 100.0 + 0.5) \
            .astype(np.int64)
        return pa.table({"window_start_us": pa.array(w),
                         "cents": pa.array(np.repeat(cents, k))})

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


LATE_ALLOWED_US = 15 * 60 * 1_000_000    # bounded lateness: 15 min
LATE_JITTER_US = 30 * 60 * 1_000_000     # max arrival delay: 30 min
LATE_SLAB_US = 6 * 3_600_000_000         # arrival-time range slab: 6 h


def late_window_counts(events: ray.data.Dataset,
                       window_us: int = 3_600_000_000,
                       lateness_us: int = LATE_ALLOWED_US,
                       jitter_us: int = LATE_JITTER_US,
                       slab_us: int = LATE_SLAB_US,
                       panes: bool = False) -> ray.data.Dataset:
    """(window_start_us, n_events, sum_value_cents, n_late): event-time
    tumbling windows over an OUT-OF-ORDER stream with a bounded-lateness
    WATERMARK and drop policy — the windowing capability a 100-TB
    streaming ingest hits once events arrive shuffled.

    The stream replays deterministically in both engines: arrival time
    a = event_time + md5_number_lower(event_id) % jitter_us (a nearly
    ordered stream with bounded per-event delay — the realistic
    out-of-order regime), ties broken by (h, event_id). The watermark
    before an arrival is max(event-time over the strict arrival prefix)
    − lateness_us; an event is DROPPED iff its event time is below the
    watermark (the Beam/Flink allowed-lateness drop contract), counted
    per window in ``n_late``; accepted events aggregate into
    ``n_events`` / ``sum_value_cents`` of their event-time window.

    Scale plan — a distributed exclusive prefix-max, no global sort:
    arrival time range-partitions into fixed ``slab_us`` slabs (volume
    per slab bounded by event rate × slab, the sessionize-salted
    assumption); pass 1 computes one max-event-ts row per slab (one
    small table to the driver), the driver folds the exclusive prefix
    over slab order, pass 2 sorts each slab locally (lexsort), seeds
    its running max with the prefix, and emits per-(slab, window)
    partials; one small grouped sum finishes. The events table is
    projected to 5 int64 columns and materialized once, read by both
    passes.

    ``panes=True`` switches the output to the Beam pane taxonomy:
    (window_start_us, n_on_time, n_late_acc, n_dropped,
    sum_value_cents) — an accepted event is a LATE-pane refinement iff
    the watermark had already passed its window's end at arrival."""
    from ligrust_ray.dataops import hashing

    def pre(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy().astype(np.int64)
        h = hashing.md5_u64_lower_arrow(
            pa.compute.cast(t.column("event_id"), pa.string()))
        ts = t.column("ts").to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        arr = ts + (h % np.uint64(jitter_us)).astype(np.int64)
        cents = np.floor(t.column("value").to_numpy() * 100.0 + 0.5) \
            .astype(np.int64)
        return pa.table({
            "part": pa.array(arr // slab_us),
            "arr": pa.array(arr),
            "h": pa.array(h.view(np.int64)),   # int64 view, order-safe
            "event_id": pa.array(eid),
            "ts_us": pa.array(ts),
            "cents": pa.array(cents)})

    narrow = events.select_columns(["event_id", "ts", "value"]) \
        .map_batches(pre, batch_format="pyarrow").materialize()

    # pass 1: per-slab max event time -> exclusive prefix on the driver
    pmax = shuffle.grouped_agg(
        narrow.select_columns(["part", "ts_us"]), ["part"],
        {"mx": ("ts_us", "max")}, num_partitions=8).to_pandas() \
        .sort_values("part")
    lo = np.iinfo(np.int64).min
    parts = pmax["part"].to_numpy(np.int64)
    mx = pmax["mx"].to_numpy(np.int64)
    excl = np.concatenate(([lo], np.maximum.accumulate(mx)[:-1]))
    seed = dict(zip(parts.tolist(), excl.tolist()))

    pane_cols = ("n_events", "cents", "n_late") if not panes else \
        ("n_on_time", "n_late_acc", "n_dropped", "cents")

    def window_late(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"window_start_us": pd.Series([], dtype=np.int64)}
                | {c: pd.Series([], dtype=np.int64) for c in pane_cols})
        out = []
        for part, g in df.groupby("part", sort=False):
            # arrival order within the slab: (arr, uint64 h, event_id)
            hu = g["h"].to_numpy(np.int64).view(np.uint64)
            order = np.lexsort((g["event_id"].to_numpy(np.int64), hu,
                                g["arr"].to_numpy(np.int64)))
            ts = g["ts_us"].to_numpy(np.int64)[order]
            cents = g["cents"].to_numpy(np.int64)[order]
            run = np.maximum.accumulate(
                np.concatenate(([seed[int(part)]], ts[:-1])))
            # guard the -inf seed: lo - lateness would wrap int64 and
            # reject the globally-first arrival
            wm = np.where(run <= lo + lateness_us, lo,
                          run - lateness_us)
            ok = ts >= wm                     # empty prefix: accepted
            w = (ts // window_us) * window_us
            frame = {"window_start_us": w,
                     "cents": np.where(ok, cents, 0)}
            if panes:
                # Beam pane taxonomy: an accepted element lands in a
                # LATE pane iff the watermark had already passed its
                # window's END when it arrived (the refinement case a
                # downstream consumer must handle)
                late_acc = ok & (wm >= w + window_us)
                frame["n_on_time"] = (ok & ~late_acc).astype(np.int64)
                frame["n_late_acc"] = late_acc.astype(np.int64)
                frame["n_dropped"] = (~ok).astype(np.int64)
            else:
                frame["n_events"] = ok.astype(np.int64)
                frame["n_late"] = (~ok).astype(np.int64)
            acc = pd.DataFrame(frame)
            gg = acc.groupby("window_start_us", as_index=False).agg(
                {c: "sum" for c in pane_cols})
            out.append(gg)
        res = pd.concat(out, ignore_index=True)
        for c in pane_cols:
            res[c] = res[c].astype(np.int64)
        return res

    partials = shuffle.grouped_apply(
        narrow, ["part"], window_late, num_partitions=32)
    out = shuffle.grouped_agg(
        partials, ["window_start_us"],
        {("sum_value_cents" if c == "cents" else c): (c, "sum")
         for c in pane_cols})
    out_names = ["window_start_us"] + [
        "sum_value_cents" if c == "cents" else c for c in pane_cols]
    return out.map_batches(
        lambda t: pa.table({c: t.column(c).cast(pa.int64())
                            for c in out_names}),
        batch_format="pyarrow")


ROLL_N = 3   # trailing events per rolling sum


FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_counts(events: ray.data.Dataset,
                  stages: tuple[str, ...] = FUNNEL_STAGES,
                  num_partitions: int = 32) -> ray.data.Dataset:
    """(stage, n_users): ordered-conversion funnel — a user reaches stage
    k+1 when an event of that type occurs STRICTLY AFTER the user's
    first-reach timestamp of stage k (first stage: the user's earliest
    event of that type). The classic product-analytics window op.

    Plan: one user-keyed hash shuffle, then a vectorised per-partition
    sweep (each user's full history sits in one partition — the
    sessionize partitioning assumption), emitting one partial count row
    per stage per partition; a 3-row grouped_agg sums the partials.
    Stage labels are ordinal-prefixed (``1_view``) so output order is
    self-describing."""

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        labels = [f"{i + 1}_{s}" for i, s in enumerate(stages)]
        if not len(df):
            return pd.DataFrame({
                "stage": pd.Series(labels, dtype=object),
                "n_users": pd.Series(np.zeros(len(stages), np.int64))})
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = df.assign(__ts=ts)
        counts = []
        reached = None      # Series: user_id -> first-reach ts of prev stage
        for st in stages:
            sub = df[df["event_type"] == st]
            if reached is None:
                reached = sub.groupby("user_id")["__ts"].min()
            else:
                m = sub.merge(reached.rename("prev").reset_index(),
                              on="user_id")
                m = m[m["__ts"] > m["prev"]]
                reached = m.groupby("user_id")["__ts"].min()
            counts.append(len(reached))
        return pd.DataFrame({"stage": labels,
                             "n_users": np.asarray(counts, np.int64)})

    parts = shuffle.grouped_apply(
        events.select_columns(["ts", "user_id", "event_type"]),
        ["user_id"], per_partition, num_partitions=num_partitions)
    # zero-count seed: the funnel always reports every stage (the SQL
    # oracle's VALUES rows), even over an empty event stream
    seed = ray.data.from_arrow(pa.table({
        "stage": pa.array([f"{i + 1}_{s}" for i, s in enumerate(stages)]),
        "n_users": pa.array(np.zeros(len(stages), np.int64))}))
    agg = shuffle.grouped_agg(parts.union(seed), ["stage"],
                              {"n_users": ("n_users", "sum")})
    return agg.map_batches(
        lambda t: pa.table({
            "stage": t.column("stage").cast(pa.string()),
            "n_users": t.column("n_users").cast(pa.int64())}),
        batch_format="pyarrow")


def rolling_user_sum(events: ray.data.Dataset, n: int = ROLL_N,
                     num_partitions: int = 32) -> ray.data.Dataset:
    """(event_id, user_id, roll_cents): per-event trailing sum of the
    PREVIOUS ``n`` events' integer cents for the same user in
    (ts, event_id) order — the classic feature-engineering window (SQL:
    SUM OVER ROWS BETWEEN n PRECEDING AND 1 PRECEDING). One user-keyed
    hash shuffle, then a vectorised padded-cumsum sweep per partition
    (same per-key-fits-partition assumption as sessionize, and the same
    salted-two-phase escape hatch applies if a key ever outgrows it)."""

    def sweep(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in ("event_id", "user_id",
                                           "roll_cents")})
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = df.assign(__ts=ts).sort_values(["user_id", "__ts", "event_id"])
        cents = np.floor(df["value"].to_numpy() * 100.0 + 0.5) \
            .astype(np.int64)
        uid = df["user_id"].to_numpy(dtype=np.int64)
        # padded inclusive cumsum, restarted per user: roll[i] =
        # cum[i-1] - cum[i-1-n] clipped to the user's first row
        cum = np.concatenate(([0], np.cumsum(cents)))
        idx = np.arange(len(cents))
        first = np.flatnonzero(np.concatenate(([True],
                                               uid[1:] != uid[:-1])))
        run_start = first[np.searchsorted(first, idx, side="right") - 1]
        lo = np.maximum(idx - n, run_start)
        roll = cum[idx] - cum[lo]
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(dtype=np.int64),
            "user_id": uid, "roll_cents": roll})

    return shuffle.grouped_apply(
        events.select_columns(["event_id", "ts", "user_id", "value"]),
        ["user_id"], sweep, num_partitions=num_partitions)


RANGE_BAND_US = 2 * 3_600_000_000      # band width for the range join


def banded_interval_count(points: ray.data.Dataset,
                          intervals: ray.data.Dataset,
                          band_us: int = RANGE_BAND_US,
                          num_partitions: int = 32) -> ray.data.Dataset:
    """(owner, n_points) — the RANGE JOIN count: for every interval
    (owner, lo, hi) the number of point rows (ts_us) with
    lo <= ts < hi. Ray Data has no inequality join; the scalable plan
    is BANDING: points key by ts // band, intervals replicate to every
    band they span (ceil(len/band)+1 rows — bounded when interval
    length ~ band), one band-keyed co_group; in each band partition the
    points sort once and every interval binary-searches its [lo, hi)
    count clipped to the band (each point lives in exactly ONE band, so
    partial counts add without double counting); one owner-keyed
    grouped sum finishes. No cross product is ever materialized."""
    i64 = pa.int64()
    pt_schema = pa.schema([("band", i64), ("ts_us", i64)])
    iv_schema = pa.schema([("band", i64), ("owner", i64),
                           ("lo", i64), ("hi", i64)])

    def pt_rows(t: pa.Table) -> pa.Table:
        ts = t.column("ts_us").to_numpy().astype(np.int64)
        return pa.table({"band": pa.array(ts // band_us),
                         "ts_us": pa.array(ts)}, schema=pt_schema)

    def iv_rows(t: pa.Table) -> pa.Table:
        lo = t.column("lo").to_numpy().astype(np.int64)
        hi = t.column("hi").to_numpy().astype(np.int64)
        ow = t.column("owner").to_numpy().astype(np.int64)
        b0 = lo // band_us
        b1 = np.maximum((hi - 1) // band_us, b0)   # hi exclusive
        counts = (b1 - b0 + 1).astype(np.int64)
        bands = np.concatenate([np.arange(a, a + c) for a, c in
                                zip(b0, counts)]) if len(lo) else \
            np.zeros(0, dtype=np.int64)
        return pa.table({
            "band": pa.array(bands),
            "owner": pa.array(np.repeat(ow, counts)),
            "lo": pa.array(np.repeat(lo, counts)),
            "hi": pa.array(np.repeat(hi, counts))}, schema=iv_schema)

    def count_in_band(pf: pd.DataFrame, vf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"owner": pd.Series([], dtype=np.int64),
                              "n": pd.Series([], dtype=np.int64)})
        if not len(pf) or not len(vf):
            return empty
        out = []
        for band, g in vf.groupby("band", sort=False):
            ts = np.sort(pf.loc[pf["band"] == band, "ts_us"]
                         .to_numpy(np.int64))
            if not len(ts):
                continue
            blo = band * band_us
            bhi = blo + band_us
            lo = np.maximum(g["lo"].to_numpy(np.int64), blo)
            hi = np.minimum(g["hi"].to_numpy(np.int64), bhi)
            n = (np.searchsorted(ts, hi, side="left")
                 - np.searchsorted(ts, lo, side="left"))
            out.append(pd.DataFrame({
                "owner": g["owner"].to_numpy(np.int64), "n": n}))
        return pd.concat(out, ignore_index=True) if out else empty

    partials = shuffle.co_group(
        points.map_batches(pt_rows, batch_format="pyarrow"),
        intervals.map_batches(iv_rows, batch_format="pyarrow"),
        l_on="band", r_on="band", fn=count_in_band,
        l_schema=pt_schema, r_schema=iv_schema,
        num_partitions=num_partitions)
    out = shuffle.grouped_agg(partials, ["owner"],
                              {"n_points": ("n", "sum")},
                              num_partitions=num_partitions)
    return out.map_batches(
        lambda t: pa.table({"owner": t.column("owner").cast(i64),
                            "n_points": t.column("n_points").cast(i64)}),
        batch_format="pyarrow")
