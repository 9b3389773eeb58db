"""Windowed / sessionized aggregates over an event stream table
(event_id, ts, user_id, event_type, value, props).

The reference is a pure batch tool with no windows (SURVEY.md §2.6); these
are the event-time operators a web-scale pipeline adds. All window/session
keys are computed per batch (no Python row loops); the only shuffles are

- tumbling window: ``groupby(window_start, event_type)`` after a per-batch
  partial aggregate (bounded rows per batch, skew-proof like
  canonicalize.py), and
- sessionization: ``groupby(user_id).map_groups`` — the per-user event
  history must be co-located and ordered; the partitioning assumption is
  user_id cardinality >> cluster cores (true for web logs). A single hot
  user degrades to one task, bounded by that user's history length.

Timestamps flow as int64 epoch-MICROSECONDS (``us``) so values compare
exactly against the DuckDB oracle (``epoch_us``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

US_PER_HOUR = 3_600_000_000
SESSION_GAP_US = 1_800_000_000  # 30 min


def _ts_us(batch: pa.Table, col: str = "ts") -> pa.Array:
    ts = batch.column(col)
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    return ts.cast(pa.timestamp("us")).cast(pa.int64())


def _sorted_user_events(group: pa.Table):
    """(us, eid, order) for one user's events — THE per-user event-time
    ordering contract (ts, then event_id as the tiebreak), defined once for
    every window/session kernel in this module."""
    us = _ts_us(group).to_numpy(zero_copy_only=False)
    eid = group.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((eid, us))
    return us, eid, order


def partial_window_counts(batch: pa.Table, window_us: int = US_PER_HOUR) -> pa.Table:
    """Per-batch combiner for the tumbling-window aggregate: at most one row
    per (window_start_us, event_type) per batch."""
    us = _ts_us(batch).to_numpy(zero_copy_only=False)
    # FLOOR division (matches the oracle's //; pc.divide truncates, which
    # differs for pre-1970 timestamps)
    window = pa.array(np.floor_divide(us, window_us) * window_us)
    t = pa.Table.from_pydict(
        {
            "window_start_us": window,
            "event_type": batch.column("event_type"),
            "value": batch.column("value"),
        }
    )
    out = t.group_by(["window_start_us", "event_type"]).aggregate(
        [("value", "count"), ("value", "sum")]
    )
    return out.rename_columns(
        ["window_start_us", "event_type", "partial_count", "partial_sum"]
    )


def _cents(batch: pa.Table, col: str, out: str) -> pa.Table:
    """Float money sum -> exact integer cents. Summation order differs
    across engines/parallelism by ~1 ulp; source values have 2 decimals, so
    round(x*100) is boundary-free and bit-exact everywhere."""
    i = batch.column_names.index(col)
    cents = pc.round(pc.multiply(batch.column(col), pa.scalar(100.0))).cast(pa.int64())
    return batch.set_column(i, out, cents)


def window_counts(ds, window_us: int = US_PER_HOUR):
    """Tumbling event-time window: (window_start_us, event_type) ->
    n_events, sum_value_cents. Partial-then-final aggregate."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        lambda b: partial_window_counts(b, window_us), batch_format="pyarrow"
    )
    agg = partials.groupby(["window_start_us", "event_type"]).aggregate(
        Sum("partial_count", alias_name="n_events"),
        Sum("partial_sum", alias_name="sum_value"),
    )
    return agg.map_batches(
        lambda b: _cents(b, "sum_value", "sum_value_cents"), batch_format="pyarrow"
    )


def partial_sliding_counts(
    batch: pa.Table, size_us: int, slide_us: int
) -> pa.Table:
    """Per-batch combiner for SLIDING windows: each event belongs to
    ``size/slide`` windows; the assignment explodes per batch (vectorized)
    and pre-aggregates, so the shuffle still moves at most one row per
    (window, type) per batch."""
    us = _ts_us(batch).to_numpy(zero_copy_only=False)
    k = size_us // slide_us  # windows per event
    # first (latest-starting) window containing the event: floor(ts/slide)
    first_w = us // slide_us
    offs = np.arange(k, dtype=np.int64)
    starts = (first_w[:, None] - offs[None, :]) * slide_us  # (n, k)
    # an event at ts belongs to every window [start, start+size) with
    # start in {(floor(ts/slide) - i) * slide : i < k} — including starts
    # before epoch for early events (the oracle generates the same set)
    n = len(us)
    et = batch.column("event_type")
    if isinstance(et, pa.ChunkedArray):
        et = et.combine_chunks()
    vals = batch.column("value")
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
    t = pa.Table.from_pydict(
        {
            "window_start_us": pa.array(starts.reshape(-1)),
            "event_type": et.take(rep),
            "value": vals.take(rep),
        }
    )
    out = t.group_by(["window_start_us", "event_type"]).aggregate(
        [("value", "count"), ("value", "sum")]
    )
    return out.rename_columns(
        ["window_start_us", "event_type", "partial_count", "partial_sum"]
    )


def sliding_window_counts(ds, size_us: int = US_PER_HOUR, slide_us: int | None = None):
    """Sliding event-time windows (size, slide): (window_start_us,
    event_type) -> n_events, sum_value_cents. ``slide`` must divide
    ``size``; defaults to size/4."""
    from ray.data.aggregate import Sum

    slide_us = slide_us or size_us // 4
    if size_us % slide_us != 0:
        raise ValueError("slide must divide size")
    partials = ds.map_batches(
        lambda b: partial_sliding_counts(b, size_us, slide_us),
        batch_format="pyarrow",
    )
    agg = partials.groupby(["window_start_us", "event_type"]).aggregate(
        Sum("partial_count", alias_name="n_events"),
        Sum("partial_sum", alias_name="sum_value"),
    )
    return agg.map_batches(
        lambda b: _cents(b, "sum_value", "sum_value_cents"), batch_format="pyarrow"
    )


def _sessionize_group(group: pa.Table, gap_us: int = SESSION_GAP_US) -> pa.Table:
    """One user's events -> session summary rows. Vectorized within the
    group: sort by (ts, event_id), gap > gap_us starts a new session."""
    us = _ts_us(group).to_numpy(zero_copy_only=False)
    eid = np.asarray(group.column("event_id").to_pylist(), dtype=np.int64)
    order = np.lexsort((eid, us))
    us = us[order]
    new_sess = np.ones(len(us), dtype=np.int64)
    if len(us) > 1:
        new_sess[1:] = (us[1:] - us[:-1] > gap_us).astype(np.int64)
    sess = np.cumsum(new_sess)
    user = group.column("user_id")[0].as_py()
    # per-session min/max/count via reduceat on the sorted session boundaries
    starts = np.flatnonzero(new_sess)
    n_sessions = len(starts)
    counts = np.diff(np.append(starts, len(us)))
    return pa.Table.from_pydict(
        {
            "user_id": pa.array([user] * n_sessions, type=pa.int64()),
            "session_id": pa.array(sess[starts], type=pa.int64()),
            "n_events": pa.array(counts, type=pa.int64()),
            "start_us": pa.array(us[starts], type=pa.int64()),
            "end_us": pa.array(us[np.append(starts[1:] - 1, len(us) - 1)], type=pa.int64()),
        }
    )


def sessionize(ds, gap_us: int = SESSION_GAP_US):
    """Event stream -> per-user sessions (gap-based). Shuffle key: user_id."""
    return ds.groupby("user_id").map_groups(
        lambda g: _sessionize_group(g, gap_us), batch_format="pyarrow"
    )


def _gaps_group(group: pa.Table) -> pa.Table:
    """One user's events -> per-event lag gap (window-function LAG shape).
    Vectorized: sort by (ts, event_id), diff; the first event's gap is -1
    (not NULL — keeps the column int64 on both engines so the value-hash
    oracle compares exactly)."""
    us = _ts_us(group).to_numpy(zero_copy_only=False)
    eid = np.asarray(group.column("event_id").to_pylist(), dtype=np.int64)
    order = np.lexsort((eid, us))
    us, eid = us[order], eid[order]
    gap = np.empty(len(us), dtype=np.int64)
    gap[0] = -1
    if len(us) > 1:
        gap[1:] = us[1:] - us[:-1]
    user = group.column("user_id")[0].as_py()
    return pa.Table.from_pydict(
        {
            "user_id": pa.array(np.full(len(us), user), type=pa.int64()),
            "event_id": pa.array(eid, type=pa.int64()),
            "us": pa.array(us, type=pa.int64()),
            "gap_us": pa.array(gap, type=pa.int64()),
        }
    )


def event_gaps(ds):
    """Per-event inter-arrival gap (LAG window function over the per-user
    event-time order). Shuffle key: user_id — same co-location contract as
    ``sessionize`` (module docstring)."""
    return ds.groupby("user_id").map_groups(_gaps_group, batch_format="pyarrow")


def _running_extrema_group(group: pa.Table) -> pa.Table:
    """One user's events -> cumulative MAX/MIN of value in (ts, event_id)
    order (the ``MAX(value) OVER (PARTITION BY user ORDER BY ts ROWS
    UNBOUNDED PRECEDING)`` window-frame shape). Extrema are exact double
    comparisons — no accumulation arithmetic — so the oracle hash can't
    drift a ulp the way a running SUM/AVG of doubles could."""
    _, eid, order = _sorted_user_events(group)
    val = group.column("value").to_numpy(zero_copy_only=False)
    eid, val = eid[order], val[order]
    user = group.column("user_id")[0].as_py()
    return pa.Table.from_pydict(
        {
            "user_id": pa.array(np.full(len(eid), user), type=pa.int64()),
            "event_id": pa.array(eid, type=pa.int64()),
            "running_max": pa.array(np.maximum.accumulate(val), type=pa.float64()),
            "running_min": pa.array(np.minimum.accumulate(val), type=pa.float64()),
        }
    )


def running_extrema(ds):
    """Cumulative window frame (ROWS UNBOUNDED PRECEDING) per user: running
    max/min of ``value`` in event-time order. Shuffle key: user_id — one
    shuffle, vectorized accumulate within each group."""
    return ds.groupby("user_id").map_groups(
        _running_extrema_group, batch_format="pyarrow"
    )


TRAILING_K = 4


def _trailing_max_group(group: pa.Table, k: int = TRAILING_K) -> pa.Table:
    """One user's events -> max of ``value`` over the trailing ``k`` rows
    (the ``ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW`` window frame) in
    (ts, event_id) order. Vectorized moving max via a sliding window view
    over a -inf-padded prefix; exact double comparisons (no accumulation),
    so the oracle hash is drift-free."""
    _, eid, order = _sorted_user_events(group)
    val = group.column("value").to_numpy(zero_copy_only=False)
    eid, val = eid[order], val[order]
    padded = np.concatenate([np.full(k - 1, -np.inf), val])
    mov = np.lib.stride_tricks.sliding_window_view(padded, k).max(axis=1)
    user = group.column("user_id")[0].as_py()
    return pa.Table.from_pydict(
        {
            "user_id": pa.array(np.full(len(eid), user), type=pa.int64()),
            "event_id": pa.array(eid, type=pa.int64()),
            "trailing_max": pa.array(mov, type=pa.float64()),
        }
    )


def trailing_max(ds, k: int = TRAILING_K):
    """Bounded window frame (ROWS k-1 PRECEDING .. CURRENT ROW) per user:
    moving max of ``value`` in event-time order. One shuffle on user_id."""
    return ds.groupby("user_id").map_groups(
        lambda g: _trailing_max_group(g, k), batch_format="pyarrow"
    )


def _funnel_group(group: pa.Table, gap_us: int = SESSION_GAP_US) -> pa.Table:
    """One user's events -> per-session funnel row: click/purchase counts
    and whether the session converted (some purchase at-or-after the first
    click, compared on event time). Reuses the gap-sessionization cut, then
    per-session segment reductions via np.minimum/maximum.reduceat."""
    us, _, order = _sorted_user_events(group)
    etype = group.column("event_type").to_numpy(zero_copy_only=False)
    us, etype = us[order], etype[order]
    new_sess = np.ones(len(us), dtype=np.int64)
    if len(us) > 1:
        new_sess[1:] = (us[1:] - us[:-1] > gap_us).astype(np.int64)
    sess = np.cumsum(new_sess)
    starts = np.flatnonzero(new_sess)
    n_sessions = len(starts)
    seg = sess - 1  # 0-based session index per event
    is_click = etype == "click"
    is_buy = etype == "purchase"
    n_clicks = np.bincount(seg[is_click], minlength=n_sessions).astype(np.int64)
    n_buys = np.bincount(seg[is_buy], minlength=n_sessions).astype(np.int64)
    first_click = np.full(n_sessions, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(first_click, seg[is_click], us[is_click])
    last_buy = np.full(n_sessions, np.iinfo(np.int64).min, dtype=np.int64)
    np.maximum.at(last_buy, seg[is_buy], us[is_buy])
    converted = ((n_clicks > 0) & (n_buys > 0) & (last_buy >= first_click)).astype(
        np.int64
    )
    user = group.column("user_id")[0].as_py()
    return pa.Table.from_pydict(
        {
            "user_id": pa.array(np.full(n_sessions, user), type=pa.int64()),
            "session_id": pa.array(sess[starts], type=pa.int64()),
            "n_clicks": pa.array(n_clicks, type=pa.int64()),
            "n_purchases": pa.array(n_buys, type=pa.int64()),
            "converted": pa.array(converted, type=pa.int64()),
        }
    )


def session_funnel(ds, gap_us: int = SESSION_GAP_US):
    """Per-session click->purchase conversion over gap sessions. Same single
    user_id shuffle as sessionize; composes the session cut with per-segment
    funnel reductions in one map_groups pass."""
    return ds.groupby("user_id").map_groups(
        lambda g: _funnel_group(g, gap_us), batch_format="pyarrow"
    )


RECENT_WINDOW_US = 600_000_000  # 10 min


def _recent_count_group(group: pa.Table, window_us: int) -> pa.Table:
    """One user's events -> count of that user's events in the preceding
    ``window_us`` including the current row (the value-based ``RANGE BETWEEN
    window PRECEDING AND CURRENT ROW`` frame — a frame ROWS can't express).
    Vectorized: sort by ts, one searchsorted of (ts - window) against the
    sorted ts array; RANGE peer semantics fall out of the left/right
    searchsorted sides. Exact int arithmetic."""
    us, eid, order = _sorted_user_events(group)
    us, eid = us[order], eid[order]
    lo = np.searchsorted(us, us - window_us, side="left")
    # RANGE frames include ALL peers of the current row's ORDER BY value
    hi = np.searchsorted(us, us, side="right")
    cnt = hi - lo
    user = group.column("user_id")[0].as_py()
    return pa.Table.from_pydict(
        {
            "user_id": pa.array(np.full(len(eid), user), type=pa.int64()),
            "event_id": pa.array(eid, type=pa.int64()),
            "recent_count": pa.array(cnt.astype(np.int64)),
        }
    )


def recent_count(ds, window_us: int = RECENT_WINDOW_US):
    """Value-based window frame (RANGE window PRECEDING) per user: events in
    the trailing time window. One shuffle on user_id."""
    return ds.groupby("user_id").map_groups(
        lambda g: _recent_count_group(g, window_us), batch_format="pyarrow"
    )


def _transitions_group(group: pa.Table) -> pa.Table:
    """One user's events -> partial (from_type, to_type, n) transition
    counts over consecutive events in (ts, event_id) order. At most
    |types|^2 rows per user — the combiner that keeps the final pair
    shuffle tiny."""
    _, _, order = _sorted_user_events(group)
    et = group.column("event_type").take(pa.array(order)).combine_chunks()
    if len(et) < 2:
        return pa.table(
            {
                "from_type": pa.array([], type=pa.string()),
                "to_type": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    pairs = pa.table(
        {"from_type": et.slice(0, len(et) - 1), "to_type": et.slice(1)}
    )
    out = pairs.group_by(["from_type", "to_type"]).aggregate([([], "count_all")])
    return out.rename_columns(["from_type", "to_type", "n"])


def event_type_transitions(ds):
    """Markov transition counts of consecutive event types per user,
    summed corpus-wide: per-user partials (bounded |types|^2 rows), then one
    tiny groupby-sum on the pair key."""
    from ray.data.aggregate import Sum

    partials = ds.groupby("user_id").map_groups(
        _transitions_group, batch_format="pyarrow"
    )
    return partials.groupby(["from_type", "to_type"]).aggregate(
        Sum("n", alias_name="n")
    )


US_PER_DAY = 86_400_000_000


def first_seen_daily(ds):
    """New users per UTC day: per-user min event time (hash aggregate with
    per-block partials — bounded by distinct users per block), then a tiny
    day-level count. Two aggregates, the second over <=n_days rows."""
    from ray.data.aggregate import Count, Min

    def to_us(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"user_id": b.column("user_id"), "us": _ts_us(b)}
        )

    per_user = (
        ds.map_batches(to_us, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("us", alias_name="first_us"))
    )

    def to_day(b: pa.Table) -> pa.Table:
        us = b.column("first_us").to_numpy(zero_copy_only=False)
        # floor division matches DuckDB // for negative (pre-1970) us too
        return pa.Table.from_pydict(
            {"day": pa.array(np.floor_divide(us, US_PER_DAY))}
        )

    out = (
        per_user.map_batches(to_day, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Count(alias_name="new_users"))
    )
    return out


def _distinct_day_users(ds):
    """Event stream -> distinct (day, user_id) pairs: per-batch partial
    dedup (bounded by the batch's distinct pairs), then one hash aggregate
    on the pair key."""
    from ray.data.aggregate import Count

    def partial(b: pa.Table) -> pa.Table:
        # FLOOR division (DuckDB //), not pc.divide's truncation — the two
        # differ for pre-1970 timestamps
        us = _ts_us(b).to_numpy(zero_copy_only=False)
        day = pa.array(np.floor_divide(us, US_PER_DAY))
        t = pa.Table.from_pydict({"day": day, "user_id": b.column("user_id")})
        return t.group_by(["day", "user_id"]).aggregate([])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["day", "user_id"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )


def daily_active_users(ds):
    """DAU: COUNT(DISTINCT user_id) per UTC day — two-level aggregate
    (distinct pairs, then a tiny day-level count). The exact-distinct
    shuffle is bounded by the true (day, user) pair count; the approximate
    path for when even that is too wide is the HLL sketch (sketch.py)."""
    from ray.data.aggregate import Count

    return (
        _distinct_day_users(ds)
        .groupby("day")
        .aggregate(Count(alias_name="active_users"))
    )


WAU_WINDOW_DAYS = 7


def weekly_active_users(ds, window_days: int = WAU_WINDOW_DAYS):
    """Sliding 7-day active users: each distinct (day, user) pair explodes
    to the ``window_days`` window starts covering it (vectorized repeat),
    pairs dedup again (a user active on several days of one window counts
    once), then a per-window count. Windows at the corpus edges are
    partial by definition — both engines agree."""
    from ray.data.aggregate import Count

    def explode(b: pa.Table) -> pa.Table:
        day = b.column("day").to_numpy(zero_copy_only=False).astype(np.int64)
        user = b.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(day)
        offs = np.tile(np.arange(window_days, dtype=np.int64), n)
        ws = np.repeat(day, window_days) - offs
        return pa.Table.from_pydict(
            {
                "window_start_day": pa.array(ws),
                "user_id": pa.array(np.repeat(user, window_days)),
            }
        )

    pairs = _distinct_day_users(ds).map_batches(explode, batch_format="pyarrow")
    dedup = pairs.groupby(["window_start_day", "user_id"]).aggregate(
        Count(alias_name="_n")
    )
    return (
        dedup.drop_columns(["_n"])
        .groupby("window_start_day")
        .aggregate(Count(alias_name="active_users"))
    )


def partial_user_stats(batch: pa.Table) -> pa.Table:
    """Per-batch combiner for per-user stats."""
    err = pc.equal(batch.column("event_type"), pa.scalar("error"))
    t = pa.Table.from_pydict(
        {
            "user_id": batch.column("user_id"),
            "value": batch.column("value"),
            "is_error": err.cast(pa.int64()),
        }
    )
    out = t.group_by(["user_id"]).aggregate(
        [("value", "count"), ("value", "sum"), ("is_error", "sum")]
    )
    return out.rename_columns(
        ["user_id", "partial_count", "partial_sum", "partial_errors"]
    )


def user_stats(ds):
    """(user_id) -> n_events, sum_value_cents, n_errors."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(partial_user_stats, batch_format="pyarrow")
    agg = partials.groupby("user_id").aggregate(
        Sum("partial_count", alias_name="n_events"),
        Sum("partial_sum", alias_name="sum_value"),
        Sum("partial_errors", alias_name="n_errors"),
    )
    return agg.map_batches(
        lambda b: _cents(b, "sum_value", "sum_value_cents"), batch_format="pyarrow"
    )


def _resample_group(group: pa.Table, window_us: int) -> pa.Table:
    """One user's events -> DENSE per-window counts between the user's
    first and last event (empty windows emitted as zero)."""
    us = _ts_us(group).to_numpy(zero_copy_only=False)
    w = us // window_us
    lo, hi = int(w.min()), int(w.max())
    counts = np.bincount(w - lo, minlength=hi - lo + 1)
    user = group.column("user_id")[0].as_py()
    wins = (np.arange(lo, hi + 1) * window_us).astype(np.int64)
    return pa.Table.from_pydict(
        {
            "user_id": pa.array(np.full(len(wins), user), type=pa.int64()),
            "window_start_us": pa.array(wins),
            "n_events": pa.array(counts, type=pa.int64()),
        }
    )


def resample_user_windows(ds, window_us: int = US_PER_HOUR):
    """Time-series densification: per-user fixed-window event counts with
    gap windows filled as zeros (resample semantics). Shuffle key:
    user_id; per-user output is bounded by the user's active time span
    over the window size, not by event count — a years-idle user with two
    events pays for the dense range between them (document the window
    size accordingly)."""
    return ds.groupby("user_id").map_groups(
        lambda g: _resample_group(g, window_us), batch_format="pyarrow"
    )


# ---- DuckDB oracle SQL ------------------------------------------------------

def sql_window_counts(window_us: int = US_PER_HOUR, table: str = "events") -> str:
    return (
        f"SELECT (epoch_us(ts) // {window_us}) * {window_us} AS window_start_us,\n"
        f"  event_type, CAST(count(*) AS BIGINT) AS n_events,\n"
        f"  CAST(ROUND(sum(value) * 100) AS BIGINT) AS sum_value_cents\n"
        f"FROM {table} GROUP BY 1, 2"
    )


def sql_sliding_window_counts(
    size_us: int = US_PER_HOUR, slide_us: int | None = None, table: str = "events"
) -> str:
    slide_us = slide_us or size_us // 4
    k = size_us // slide_us
    return (
        f"SELECT (epoch_us(ts) // {slide_us} - i) * {slide_us} AS window_start_us,\n"
        f"  event_type, CAST(count(*) AS BIGINT) AS n_events,\n"
        f"  CAST(ROUND(sum(value) * 100) AS BIGINT) AS sum_value_cents\n"
        f"FROM {table} CROSS JOIN (SELECT unnest(range({k})) AS i) w\n"
        f"GROUP BY 1, 2"
    )


def sql_sessionize(gap_us: int = SESSION_GAP_US, table: str = "events") -> str:
    return (
        f"WITH e AS (\n"
        f"  SELECT user_id, event_id, epoch_us(ts) AS us,\n"
        f"    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL\n"
        f"         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}\n"
        f"         THEN 1 ELSE 0 END AS new_s\n"
        f"  FROM {table}\n"
        f"  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)\n"
        f"), s AS (\n"
        f"  SELECT user_id, us,\n"
        f"    sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id\n"
        f"      ROWS UNBOUNDED PRECEDING) AS session_id\n"
        f"  FROM e\n"
        f")\n"
        f"SELECT user_id, CAST(session_id AS BIGINT) AS session_id,\n"
        f"  CAST(count(*) AS BIGINT) AS n_events,\n"
        f"  min(us) AS start_us, max(us) AS end_us\n"
        f"FROM s GROUP BY user_id, session_id"
    )


def sql_event_gaps(table: str = "events") -> str:
    return (
        f"SELECT user_id, event_id, epoch_us(ts) AS us,\n"
        f"  COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER (\n"
        f"    PARTITION BY user_id ORDER BY ts, event_id), -1) AS gap_us\n"
        f"FROM {table}"
    )


def sql_running_extrema(table: str = "events") -> str:
    return (
        f"SELECT user_id, event_id,\n"
        f"  max(value) OVER w AS running_max,\n"
        f"  min(value) OVER w AS running_min\n"
        f"FROM {table}\n"
        f"WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id\n"
        f"  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )


def sql_trailing_max(k: int = TRAILING_K, table: str = "events") -> str:
    return (
        f"SELECT user_id, event_id,\n"
        f"  max(value) OVER w AS trailing_max\n"
        f"FROM {table}\n"
        f"WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id\n"
        f"  ROWS BETWEEN {k - 1} PRECEDING AND CURRENT ROW)"
    )


def sql_session_funnel(gap_us: int = SESSION_GAP_US, table: str = "events") -> str:
    return (
        f"WITH e AS (\n"
        f"  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,\n"
        f"    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL\n"
        f"         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}\n"
        f"         THEN 1 ELSE 0 END AS new_s\n"
        f"  FROM {table}\n"
        f"  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)\n"
        f"), s AS (\n"
        f"  SELECT user_id, event_type, us,\n"
        f"    sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id\n"
        f"      ROWS UNBOUNDED PRECEDING) AS session_id\n"
        f"  FROM e\n"
        f")\n"
        f"SELECT user_id, CAST(session_id AS BIGINT) AS session_id,\n"
        f"  CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_clicks,\n"
        f"  CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)\n"
        f"    AS n_purchases,\n"
        f"  CAST(CASE WHEN count(*) FILTER (event_type = 'click') > 0\n"
        f"        AND count(*) FILTER (event_type = 'purchase') > 0\n"
        f"        AND max(us) FILTER (event_type = 'purchase')\n"
        f"            >= min(us) FILTER (event_type = 'click')\n"
        f"       THEN 1 ELSE 0 END AS BIGINT) AS converted\n"
        f"FROM s GROUP BY user_id, session_id"
    )


def sql_recent_count(window_us: int = RECENT_WINDOW_US, table: str = "events") -> str:
    return (
        f"SELECT user_id, event_id,\n"
        f"  count(*) OVER w AS recent_count\n"
        f"FROM {table}\n"
        f"WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)\n"
        f"  RANGE BETWEEN {window_us} PRECEDING AND CURRENT ROW)"
    )


def sql_event_type_transitions(table: str = "events") -> str:
    return (
        f"SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n\n"
        f"FROM (SELECT lag(event_type) OVER (PARTITION BY user_id\n"
        f"        ORDER BY ts, event_id) AS from_type,\n"
        f"      event_type AS to_type FROM {table})\n"
        f"WHERE from_type IS NOT NULL\n"
        f"GROUP BY from_type, to_type"
    )


def sql_first_seen_daily(table: str = "events") -> str:
    return (
        f"SELECT first_us // {US_PER_DAY} AS day,\n"
        f"  CAST(count(*) AS BIGINT) AS new_users\n"
        f"FROM (SELECT user_id, min(epoch_us(ts)) AS first_us\n"
        f"      FROM {table} GROUP BY user_id)\n"
        f"GROUP BY day"
    )


def sql_daily_active_users(table: str = "events") -> str:
    return (
        f"SELECT epoch_us(ts) // {US_PER_DAY} AS day,\n"
        f"  CAST(count(DISTINCT user_id) AS BIGINT) AS active_users\n"
        f"FROM {table} GROUP BY day"
    )


def sql_weekly_active_users(
    window_days: int = WAU_WINDOW_DAYS, table: str = "events"
) -> str:
    return (
        f"WITH du AS (SELECT DISTINCT epoch_us(ts) // {US_PER_DAY} AS day,\n"
        f"    user_id FROM {table}),\n"
        f"w AS (SELECT day - o AS window_start_day, user_id FROM du\n"
        f"  CROSS JOIN (SELECT unnest(range(0, {window_days})) AS o))\n"
        f"SELECT window_start_day,\n"
        f"  CAST(count(DISTINCT user_id) AS BIGINT) AS active_users\n"
        f"FROM w GROUP BY window_start_day"
    )


def sql_user_stats(table: str = "events") -> str:
    return (
        f"SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,\n"
        f"  CAST(ROUND(sum(value) * 100) AS BIGINT) AS sum_value_cents,\n"
        f"  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors\n"
        f"FROM {table} GROUP BY user_id"
    )


# -- grouped exact quantiles --------------------------------------------------

def grouped_quantiles(ds, key_col: str, value_col: str, qs: tuple = (0.5, 0.9, 0.99)):
    """Exact discrete quantiles per group: element at ``max(ceil(q*n)-1, 0)``
    of the sorted values — DuckDB ``quantile_disc``'s convention, verified
    element-for-element in tests, so the oracle hash-matches (no
    interpolation arithmetic to drift). Per-group sort bounds memory by the
    hottest group (the sessionization assumption); at extreme group sizes
    swap in ``grouped_quantile_sketch`` below (mergeable k-point summaries,
    guaranteed 1/k rank error, error-bound-tested rather than oracled)."""
    import numpy as np
    import pyarrow as pa

    qs = tuple(float(q) for q in qs)

    def per_group(group: pa.Table) -> pa.Table:
        col = group.column(value_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        v = np.sort(col.to_numpy(zero_copy_only=False))
        n = len(v)
        idx = [max(int(np.ceil(q * n)) - 1, 0) for q in qs]
        key = group.column(key_col)
        return pa.Table.from_pydict(
            {
                key_col: key.take(pa.array([0] * len(qs))),
                "q": pa.array(qs, type=pa.float64()),
                "qvalue": pa.array(v[idx], type=pa.float64()),
            }
        )

    return ds.groupby(key_col).map_groups(per_group, batch_format="pyarrow")


def sql_grouped_quantiles(
    key_col: str = "event_type",
    value_col: str = "value",
    qs: tuple = (0.5, 0.9, 0.99),
    table: str = "events",
) -> str:
    parts = [
        f"SELECT {key_col}, {q} AS q, quantile_disc({value_col}, {q}) AS qvalue\n"
        f"FROM {table} GROUP BY {key_col}"
        for q in qs
    ]
    return "\nUNION ALL\n".join(parts)
def grouped_quantiles_cont(
    ds, key_col: str, value_col: str, qs: tuple = (0.25, 0.5, 0.75, 0.9)
):
    """Exact INTERPOLATED quantiles per group (percentile_cont semantics).

    DuckDB 1.0's continuous interpolator is ``lo*(1-frac) + hi*frac`` with
    ``frac = RN - floor(RN)``, ``RN = q*(n-1)`` — reproduced here operation
    for operation in float64, so the oracle hash-matches bit-exactly.
    Caveat pinned by tests: DuckDB parses the quantile LITERAL as DECIMAL
    (int/10^scale evaluated in double), so only literals whose decimal
    parse equals the Python float are used (0.25/0.5/0.75/0.9 qualify);
    an arbitrary 17-digit q would diverge by an ulp in frac."""
    import numpy as np
    import pyarrow as pa

    qs = tuple(float(q) for q in qs)

    def per_group(group: pa.Table) -> pa.Table:
        col = group.column(value_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        v = np.sort(col.to_numpy(zero_copy_only=False))
        n = len(v)
        out = []
        for q in qs:
            rn = q * (n - 1)
            frn = int(np.floor(rn))
            crn = int(np.ceil(rn))
            if crn == frn:
                out.append(v[frn])
            else:
                frac = rn - frn
                out.append(v[frn] * (1.0 - frac) + v[crn] * frac)
        key = group.column(key_col)
        return pa.Table.from_pydict(
            {
                key_col: key.take(pa.array([0] * len(qs))),
                "q": pa.array(qs, type=pa.float64()),
                "qvalue": pa.array(out, type=pa.float64()),
            }
        )

    return ds.groupby(key_col).map_groups(per_group, batch_format="pyarrow")


def lerp_median(v) -> float:
    """Median of a SORTED float64 array with DuckDB's percentile_cont lerp
    (``lo*(1-frac) + hi*frac``, frac from ``0.5*(n-1)``) — bit-exact vs
    ``median(x)``. THE single definition; grouped_mad and the outlier gate
    in pipelines.queries both use it so the cross-engine semantics live in
    one place."""
    import numpy as np

    n = len(v)
    rn = 0.5 * (n - 1)
    frn = int(np.floor(rn))
    crn = int(np.ceil(rn))
    if crn == frn:
        return float(v[frn])
    frac = rn - frn
    return float(v[frn] * (1.0 - frac) + v[crn] * frac)


def grouped_mad(ds, key_col: str, value_col: str):
    """Median absolute deviation per group — robust dispersion for outlier
    gating.  Both medians use the percentile_cont lerp replica (see
    grouped_quantiles_cont), and DuckDB's ``mad(x)`` is exactly
    ``median(abs(x - median(x)))``, so the float64 output compares == with
    the oracle (pinned by tests across group sizes)."""
    import numpy as np
    import pyarrow as pa

    def per_group(group: pa.Table) -> pa.Table:
        col = group.column(value_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        v = np.sort(col.to_numpy(zero_copy_only=False))
        med = lerp_median(v)
        mad = lerp_median(np.sort(np.abs(v - med)))
        return pa.Table.from_pydict(
            {
                key_col: group.column(key_col).take(pa.array([0])),
                "med": pa.array([med], type=pa.float64()),
                "mad_value": pa.array([mad], type=pa.float64()),
            }
        )

    return ds.groupby(key_col).map_groups(per_group, batch_format="pyarrow")


def sql_grouped_mad(
    key_col: str = "event_type", value_col: str = "value", table: str = "events"
) -> str:
    return (
        f"SELECT {key_col}, median({value_col}) AS med,"
        f" mad({value_col}) AS mad_value FROM {table} GROUP BY {key_col}"
    )


def sql_grouped_quantiles_cont(
    key_col: str = "event_type",
    value_col: str = "value",
    qs: tuple = (0.25, 0.5, 0.75, 0.9),
    table: str = "events",
) -> str:
    parts = [
        f"SELECT {key_col}, {q} AS q, quantile_cont({value_col}, {q}) AS qvalue\n"
        f"FROM {table} GROUP BY {key_col}"
        for q in qs
    ]
    return "\nUNION ALL\n".join(parts)


def sql_resample_user_windows(
    window_us: int = US_PER_HOUR, table: str = "events"
) -> str:
    return (
        f"WITH b AS (SELECT user_id, epoch_us(ts) // {window_us} AS w FROM {table}),\n"
        f"r AS (SELECT user_id, min(w) AS lo, max(w) AS hi FROM b GROUP BY user_id),\n"
        f"g AS (SELECT user_id, unnest(range(lo, hi + 1)) AS w FROM r),\n"
        f"c AS (SELECT user_id, w, count(*) AS n FROM b GROUP BY user_id, w)\n"
        f"SELECT g.user_id, CAST(g.w * {window_us} AS BIGINT) AS window_start_us,\n"
        f"  CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events\n"
        f"FROM g LEFT JOIN c ON c.user_id = g.user_id AND c.w = g.w"
    )


# -- mergeable grouped-quantile sketch (the hot-group scale path) -------------

QSKETCH_K = 256


def _qsketch_partial(batch, key_col: str, value_col: str, k: int):
    """Per-batch, per-group K-point weighted summary: the group's values are
    approximated by K order statistics, point i covering an integer share
    of the group's ranks (shares sum exactly to n).  Rank error introduced
    per batch-group is <= n_bg / k, so the summed error over any group is
    <= n_group / k — a guaranteed eps = 1/k rank error, independent of how
    Ray batched the rows.  At most k rows per (batch, group) leave the
    batch: the combiner that lets a single hot group's quantiles be
    computed without ever sorting the full group on one node."""
    import numpy as np
    import pyarrow as pa

    empty = pa.table(
        {
            key_col: pa.array([], type=batch.schema.field(key_col).type),
            "point": pa.array([], type=pa.float64()),
            "w": pa.array([], type=pa.int64()),
        }
    )
    if batch.num_rows == 0:
        return empty
    import pyarrow.compute as pc

    keys = batch.column(key_col)
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    enc = pc.dictionary_encode(keys)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = batch.column(value_col).to_numpy(zero_copy_only=False)
    # one lexsort groups AND sorts values within each group
    order = np.lexsort((vals, codes))
    codes, vals = codes[order], vals[order]
    bounds = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1], True])
    key_idx, pts_out, w_out = [], [], []
    for s, t in zip(bounds[:-1], bounds[1:]):
        v = vals[s:t]
        n = t - s
        kk = min(k, n)
        # integer weight shares: w_i = ceil(n*(i+1)/kk) - ceil(n*i/kk)
        cuts = np.ceil(n * np.arange(kk + 1) / kk).astype(np.int64)
        w_out.append(np.diff(cuts))
        # point i = the LAST value of its rank share (quantile_disc-style
        # upper representative, keeps max exact)
        pts_out.append(v[cuts[1:] - 1])
        key_idx.append(np.full(kk, codes[s], dtype=np.int64))
    return pa.table(
        {
            key_col: enc.dictionary.take(
                pa.array(np.concatenate(key_idx))
            ).cast(batch.schema.field(key_col).type),
            "point": pa.array(np.concatenate(pts_out), type=pa.float64()),
            "w": pa.array(np.concatenate(w_out), type=pa.int64()),
        }
    )


def grouped_quantile_sketch(
    ds,
    key_col: str,
    value_col: str,
    qs: tuple = (0.5, 0.9, 0.99),
    k: int = QSKETCH_K,
):
    """Approximate grouped quantiles with a GUARANTEED rank-error bound:
    |true_rank(answer) - q*n| <= n/k + 1, whatever the batch layout.

    The scale path promised by ``grouped_quantiles``: that operator sorts
    each whole group inside one ``map_groups`` task (exact, oracle-able,
    but bounded by the hottest group); this one ships at most k weighted
    points per (batch, group) — the merge input for a group is
    k * n_batches rows, NOT n_group — and answers from the weighted
    cumulative ranks.  Use when a group can exceed one worker's heap;
    the result is deterministic for a fixed batch layout but only
    eps-exact across layouts, so it has error-bound tests, not a value
    oracle."""
    import numpy as np
    import pyarrow as pa

    qs = tuple(float(q) for q in qs)

    def per_group(group: pa.Table) -> pa.Table:
        pts = group.column("point").to_numpy(zero_copy_only=False)
        w = group.column("w").to_numpy(zero_copy_only=False)
        order = np.argsort(pts, kind="stable")
        pts, w = pts[order], w[order]
        cw = np.cumsum(w)
        n = cw[-1]
        out = []
        for q in qs:
            target = max(int(np.ceil(q * n)), 1)
            out.append(pts[np.searchsorted(cw, target)])
        return pa.Table.from_pydict(
            {
                key_col: group.column(key_col).take(pa.array([0] * len(qs))),
                "q": pa.array(qs, type=pa.float64()),
                "qvalue": pa.array(out, type=pa.float64()),
            }
        )

    partial = ds.map_batches(
        lambda b: _qsketch_partial(b, key_col, value_col, k),
        batch_format="pyarrow",
    )
    return partial.groupby(key_col).map_groups(per_group, batch_format="pyarrow")


# --- interval coalescing (gaps-and-islands) ----------------------------------

INTERVAL_DUR_MULT = 10_000_000  # value cents -> interval microseconds


def _coalesce_group(group: pa.Table, dur_mult: int) -> pa.Table:
    """One user's value-weighted intervals [ts, ts + cents(value)*dur_mult)
    -> maximal merged islands (overlapping OR touching intervals fuse; a
    new island starts where start > running max of all previous ends —
    the classic gaps-and-islands recurrence, vectorized).

    Exact integer arithmetic throughout: epoch microseconds + half-away
    cent rounding of value, so the island boundaries are bit-identical to
    the SQL window form at any parallelism."""
    from ..kernel.rounding import round_away

    us, eid, order = _sorted_user_events(group)
    val = group.column("value").to_numpy(zero_copy_only=False)
    us, val = us[order], val[order].astype(np.float64)
    dur = round_away(val * 100.0, 0).astype(np.int64) * dur_mult
    end = us + dur
    # EXCLUSIVE running max of ends: prev_max[i] = max(end[:i])
    prev_max = np.empty(len(us), dtype=np.int64)
    prev_max[0] = -1
    if len(us) > 1:
        np.maximum.accumulate(end[:-1], out=prev_max[1:])
    new_island = us > prev_max
    island = np.cumsum(new_island)  # 1-based island ordinal
    starts = np.flatnonzero(new_island)
    n_events = np.diff(np.append(starts, len(us)))
    island_end = np.maximum.reduceat(end, starts)
    user = group.column("user_id")[0].as_py()
    n = len(starts)
    return pa.Table.from_pydict(
        {
            "user_id": pa.array(np.full(n, user), type=pa.int64()),
            "island_id": pa.array(island[starts], type=pa.int64()),
            "start_us": pa.array(us[starts], type=pa.int64()),
            "end_us": pa.array(island_end, type=pa.int64()),
            "n_events": pa.array(n_events, type=pa.int64()),
        }
    )


def coalesce_intervals(ds, dur_mult: int = INTERVAL_DUR_MULT):
    """Gaps-and-islands interval coalescing: each event is an interval of
    duration proportional to its value; overlapping/touching intervals per
    user merge into maximal islands (temporal-KG fact-validity shape: the
    merged validity windows of repeatedly re-observed facts). ONE shuffle
    (user_id groupby); the running-max recurrence is vectorized numpy
    inside each group. Hot-user bound: a user's whole event list must fit
    one group — same contract as sessionize (module docstring)."""
    return ds.groupby("user_id").map_groups(
        lambda g: _coalesce_group(g, dur_mult), batch_format="pyarrow"
    )


def sql_coalesce_intervals(
    dur_mult: int = INTERVAL_DUR_MULT, table: str = "events"
) -> str:
    return (
        f"WITH iv AS (\n"
        f"  SELECT user_id, event_id, epoch_us(ts) AS s,\n"
        f"    epoch_us(ts) + CAST(round(value*100) AS BIGINT)*{dur_mult} AS e\n"
        f"  FROM {table}),\n"
        f"m AS (\n"
        f"  SELECT user_id, event_id, s, e,\n"
        f"    CASE WHEN s > COALESCE(max(e) OVER (\n"
        f"      PARTITION BY user_id ORDER BY s, event_id\n"
        f"      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)\n"
        f"    THEN 1 ELSE 0 END AS new_island\n"
        f"  FROM iv),\n"
        f"g AS (\n"
        f"  SELECT user_id, s, e,\n"
        f"    sum(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id\n"
        f"      ROWS UNBOUNDED PRECEDING) AS island_id\n"
        f"  FROM m)\n"
        f"SELECT user_id, CAST(island_id AS BIGINT) AS island_id,\n"
        f"  min(s) AS start_us, max(e) AS end_us,\n"
        f"  CAST(count(*) AS BIGINT) AS n_events\n"
        f"FROM g GROUP BY user_id, island_id"
    )


# --- exponential-decay activity score (EWMA, alpha = 1/2, exact) -------------


def _decay_group(group: pa.Table) -> pa.Table:
    """One user's events -> the running half-life decay score over value
    cents: ``s_1 = v_1``, ``s_i = (v_i + s_{i-1}) // 2`` in per-user
    event-time order. The floor at EVERY step makes the recurrence
    bit-deterministic (an IEEE EWMA would drift ulps across engines), at
    the cost of a sequential scan: nested floors do not distribute, so
    the within-group recurrence is a genuine O(events-per-user) loop —
    bounded by the same hot-user contract as sessionize (module
    docstring). Everything around it (sort, cents, assembly) stays
    vectorized."""
    from ..kernel.rounding import round_away

    us, eid, order = _sorted_user_events(group)
    us, eid = us[order], eid[order]
    val = group.column("value").to_numpy(zero_copy_only=False)[order]
    v = round_away(val * 100.0, 0).astype(np.int64)
    s = np.empty(len(v), dtype=np.int64)
    acc = 0
    first = True
    for i in range(len(v)):
        acc = int(v[i]) if first else (int(v[i]) + acc) // 2
        first = False
        s[i] = acc
    user = group.column("user_id")[0].as_py()
    return pa.Table.from_pydict(
        {
            "user_id": pa.array(np.full(len(v), user), type=pa.int64()),
            "event_id": pa.array(eid, type=pa.int64()),
            "decay_c": pa.array(s, type=pa.int64()),
        }
    )


def decay_scores(ds):
    """Per-event exponential-decay activity score (half-life EWMA over
    value cents, exact integer): one user_id shuffle, sequential
    recurrence within each group (see _decay_group)."""
    return ds.groupby("user_id").map_groups(_decay_group, batch_format="pyarrow")


def sql_decay_scores(table: str = "events") -> str:
    """Recursive-CTE oracle: the identical integer recurrence stepped per
    rank; recursion depth = max events per user."""
    return (
        f"WITH RECURSIVE o AS (\n"
        f"  SELECT user_id, event_id,\n"
        f"    CAST(round(value*100) AS BIGINT) AS v,\n"
        f"    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)\n"
        f"      AS rn\n"
        f"  FROM {table}),\n"
        f"r(user_id, event_id, rn, s) AS (\n"
        f"  SELECT user_id, event_id, rn, v FROM o WHERE rn = 1\n"
        f"  UNION ALL\n"
        f"  SELECT o.user_id, o.event_id, o.rn, (o.v + r.s) // 2\n"
        f"  FROM r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1)\n"
        f"SELECT user_id, event_id, s AS decay_c FROM r"
    )


# --- retention cohorts --------------------------------------------------------

US_PER_DAY = 86_400_000_000


def retention_cohorts(ds):
    """Cohort retention table: users bucketed by FIRST-seen day, counted
    per (cohort_day, day_offset) of later activity — the product-analytics
    grid behind every retention curve.

    Shapes: per-batch (user, day) projection -> one composite-key groupby
    dedup (distinct active days per user) -> per-user min aggregate
    (cohort) -> one hash join back -> final dimension-bounded groupby.
    The join ships one row per (user, active day), never raw events."""
    from ray.data.aggregate import Count, Min

    def to_days(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"user_id": pa.array([], type=pa.int64()),
                 "day": pa.array([], type=pa.int64())}
            )
        us = _ts_us(b).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "day": pa.array(us // US_PER_DAY, type=pa.int64()),
            }
        )

    days = (
        ds.map_batches(to_days, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .aggregate(Count(alias_name="_n"))
    )
    def project_days(b: pa.Table) -> pa.Table:
        # typed projection (not drop_columns): groupby emits schema-less
        # empty blocks that would break the downstream hash join
        if b.num_rows == 0:
            return pa.table(
                {"user_id": pa.array([], type=pa.int64()),
                 "day": pa.array([], type=pa.int64())}
            )
        return pa.table({"user_id": b.column("user_id"), "day": b.column("day")})

    days = (
        days.map_batches(project_days, batch_format="pyarrow")
        .repartition(8)
        .materialize()
    )
    first = days.groupby("user_id").aggregate(Min("day", alias_name="cohort_day"))

    def strip(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"juser": pa.array([], type=pa.int64()),
                 "cohort_day": pa.array([], type=pa.int64())}
            )
        return pa.table(
            {"juser": b.column("user_id"), "cohort_day": b.column("cohort_day")}
        )

    # repartition decouples the join input from the aggregate's block
    # layout (Ray's hash join rejects aggregate-emitted empty blocks —
    # same workaround as q_dedup_keep_best)
    first = first.map_batches(strip, batch_format="pyarrow").repartition(8)
    joined = days.join(
        first, "inner", num_partitions=8, on=("user_id",), right_on=("juser",)
    )

    def offset(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"cohort_day": pa.array([], type=pa.int64()),
                 "day_offset": pa.array([], type=pa.int64())}
            )
        d = b.column("day").to_numpy(zero_copy_only=False)
        c = b.column("cohort_day").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cohort_day": b.column("cohort_day"),
                "day_offset": pa.array(d - c, type=pa.int64()),
            }
        )

    return (
        joined.map_batches(offset, batch_format="pyarrow")
        .groupby(["cohort_day", "day_offset"])
        .aggregate(Count(alias_name="n_users"))
    )


def sql_retention_cohorts(table: str = "events") -> str:
    return (
        f"WITH d AS (SELECT DISTINCT user_id,\n"
        f"    epoch_us(ts) // {US_PER_DAY} AS day FROM {table}),\n"
        f"f AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id)\n"
        f"SELECT f.cohort_day, d.day - f.cohort_day AS day_offset,\n"
        f"  CAST(count(*) AS BIGINT) AS n_users\n"
        f"FROM d JOIN f USING (user_id) GROUP BY 1, 2"
    )
