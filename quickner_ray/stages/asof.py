"""Distributed as-of join — an operator Ray Data has no primitive for.

Shape (SURVEY.md §4 custom-operator rule (a): composition of map_batches +
groupby().map_groups): tag both sides with a common schema, ``union`` them,
hash-shuffle ONCE on the join key, and do a vectorized sorted-merge inside
each group (numpy ``searchsorted`` — no Python row loop). Partitioning
assumption: one key's rows fit in a worker (same bound as sessionization;
a key here is one user's events + orders).

Semantics: for each left row (key, ts) attach the right row with the
greatest ``right_ts <= ts`` for that key; ties on ``right_ts`` break to the
greatest ``right_id`` (deterministic, so the DuckDB oracle hash-matches).
Left rows with no match keep nulls (left as-of join).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _col(table: pa.Table, name: str) -> pa.Array:
    c = table.column(name)
    return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c


def _asof_merge_group(group: pa.Table) -> pa.Table:
    """One key's tagged rows -> events with last-order columns attached."""
    side = _col(group, "side").to_numpy(zero_copy_only=False)
    ts = _col(group, "ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    rid = _col(group, "right_id").to_numpy(zero_copy_only=False)
    left = np.flatnonzero(side == 0)
    right = np.flatnonzero(side == 1)
    out_cols = {
        "event_id": _col(group, "left_id").take(pa.array(left)),
        "user_id": _col(group, "key").take(pa.array(left)),
        "ts": _col(group, "ts").take(pa.array(left)),
    }
    if len(right):
        # right_id is null on the events side -> to_numpy gave float; the
        # right-side slice is dense, so the int cast is exact
        r_all = rid[right].astype(np.int64)
        order = right[np.lexsort((r_all, ts[right]))]
        r_ts = ts[order]
        r_id = rid[order].astype(np.int64)
        pos = np.searchsorted(r_ts, ts[left], side="right") - 1
        hit = pos >= 0
        key_arr = np.where(hit, r_id[np.maximum(pos, 0)], 0)
        date_arr = np.where(hit, r_ts[np.maximum(pos, 0)], 0)
        out_cols["last_order_key"] = pa.array(key_arr, type=pa.int64(), mask=~hit)
        out_cols["last_order_date"] = pa.array(date_arr, mask=~hit).cast(
            pa.timestamp("us")
        )
    else:
        n = len(left)
        out_cols["last_order_key"] = pa.nulls(n, type=pa.int64())
        out_cols["last_order_date"] = pa.nulls(n, type=pa.timestamp("us"))
    return pa.Table.from_pydict(out_cols)


def asof_last_order(events_ds, orders_ds):
    """events (event_id, ts, user_id) ASOF-LEFT-JOIN orders
    (o_orderkey, o_custkey, o_orderdate) on user_id == o_custkey,
    o_orderdate <= ts -> (event_id, user_id, ts, last_order_key,
    last_order_date)."""

    def tag_events(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.Table.from_pydict(
            {
                "key": _col(b, "user_id"),
                "ts": _col(b, "ts"),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "left_id": _col(b, "event_id"),
                "right_id": pa.nulls(n, type=pa.int64()),
            }
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.Table.from_pydict(
            {
                "key": _col(b, "o_custkey").cast(pa.int64()),
                "ts": _col(b, "o_orderdate"),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "left_id": pa.nulls(n, type=pa.int64()),
                "right_id": _col(b, "o_orderkey"),
            }
        )

    ev = events_ds.map_batches(tag_events, batch_format="pyarrow")
    orr = orders_ds.map_batches(tag_orders, batch_format="pyarrow")
    tagged = ev.union(orr)
    return tagged.groupby("key").map_groups(_asof_merge_group, batch_format="pyarrow")


def sql_asof_last_order() -> str:
    """DuckDB oracle: explicit window form of the as-of join so the
    tie-break (max date, then max orderkey) is deterministic."""
    return (
        "SELECT event_id, user_id, ts, last_order_key, last_order_date FROM (\n"
        "  SELECT e.event_id, e.user_id, e.ts,\n"
        "    o.o_orderkey AS last_order_key, o.o_orderdate AS last_order_date,\n"
        "    row_number() OVER (PARTITION BY e.event_id\n"
        "      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn\n"
        "  FROM events e LEFT JOIN orders o\n"
        "    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts\n"
        ") WHERE rn = 1"
    )
