"""Multi-way-join query (TPC-H Q3 shape) vs the DuckDB oracle at sf0.001."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_shipping_priority_matches_oracle(sf_dir):
    from quickner_ray.pipelines.queries import (
        q_shipping_priority,
        sql_shipping_priority,
    )

    got = q_shipping_priority(sf_dir).to_pandas()
    con = duckdb.connect()
    con.sql("SET threads=2")
    for t in ["customer", "orders", "lineitem"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    ora = con.sql(sql_shipping_priority()).df()
    cols = ["l_orderkey", "o_orderdate_us", "o_orderpriority", "revenue_e4"]
    pd.testing.assert_frame_equal(
        got[cols].reset_index(drop=True),
        ora[cols].reset_index(drop=True),
        check_dtype=False,
    )
    # ordering contract: revenue strictly non-increasing
    assert (got.revenue_e4.diff().dropna() <= 0).all()
