"""As-of join (stages/asof.py): vectorized sorted-merge semantics must
equal the DuckDB window-form oracle, including left-null rows (no prior
order), events before the first order, and date ties (max orderkey wins)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from quickner_ray.stages.asof import asof_last_order, sql_asof_last_order

TS = lambda s: pd.Timestamp(s)  # noqa: E731


@pytest.fixture(scope="module")
def tables():
    events = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
            "ts": pa.array(
                [TS("2024-01-05"), TS("2024-01-01"), TS("2024-02-01"),
                 TS("2024-01-10"), TS("2024-03-01"), TS("2024-01-02")],
                type=pa.timestamp("us"),
            ),
            "user_id": pa.array([1, 1, 1, 2, 3, 3], type=pa.int64()),
        }
    )
    orders = pa.table(
        {
            "o_orderkey": pa.array([10, 11, 12, 13, 14], type=pa.int64()),
            "o_custkey": pa.array([1, 1, 1, 2, 9], type=pa.int64()),
            # orders 11 and 12 tie on date: key 12 must win
            "o_orderdate": pa.array(
                [TS("2024-01-03"), TS("2024-01-20"), TS("2024-01-20"),
                 TS("2024-01-10"), TS("2024-01-01")],
                type=pa.timestamp("us"),
            ),
        }
    )
    return events, orders


def test_asof_join_matches_oracle(ray_session, tables):
    import ray.data as rd

    events, orders = tables
    got = (
        asof_last_order(rd.from_arrow(events), rd.from_arrow(orders))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql("SET threads=2")
    con.register("events", events)
    con.register("orders", orders)
    ora = (
        con.sql(sql_asof_last_order())
        .df()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ora[got.columns], check_dtype=False)

    by_id = got.set_index("event_id")
    # user 3 has no orders at all -> nulls
    assert pd.isna(by_id.loc[5, "last_order_key"])
    assert pd.isna(by_id.loc[6, "last_order_key"])
    # event 2 precedes user 1's first order -> null
    assert pd.isna(by_id.loc[2, "last_order_key"])
    # date tie (orders 11, 12 both 2024-01-20): max orderkey wins
    assert by_id.loc[3, "last_order_key"] == 12
    # plain case: event 1 (01-05) -> order 10 (01-03)
    assert by_id.loc[1, "last_order_key"] == 10
    # exact-timestamp match counts (<=): event 4 at 01-10 -> order 13
    assert by_id.loc[4, "last_order_key"] == 13
