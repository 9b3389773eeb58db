"""TPC-H-shaped relational queries (Q7/Q9/Q10/Q11/Q12/Q14/Q15/Q18,
INTERSECT, CROSS JOIN grid) plus latest_order vs their DuckDB oracles at
sf0.001."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from quickner_ray.pipelines import relational as rel

TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]

CASES = [
    ("q_nation_trade_volume", "sql_nation_trade_volume"),
    ("q_product_profit", "sql_product_profit"),
    ("q_returned_items", "sql_returned_items"),
    ("q_priority_line_counts", "sql_priority_line_counts"),
    ("q_promo_revenue", "sql_promo_revenue"),
    ("q_large_order_customers", "sql_large_order_customers"),
    ("q_customers_both_priorities", "sql_customers_both_priorities"),
    ("q_top_supplier_revenue", "sql_top_supplier_revenue"),
    ("q_important_parts", "sql_important_parts"),
    ("q_nation_status_grid", "sql_nation_status_grid"),
    ("q_party_nation_union", "sql_party_nation_union"),
    ("q_orders_above_customer_avg", "sql_orders_above_customer_avg"),
    ("q_nation_revenue_share", "sql_nation_revenue_share"),
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("qfn,sfn", CASES, ids=[c[0] for c in CASES])
def test_relational_matches_oracle(sf_dir, qfn, sfn):
    out = getattr(rel, qfn)(sf_dir)
    got = out.to_pandas() if hasattr(out, "to_pandas") else pd.DataFrame(out)
    con = duckdb.connect()
    con.sql("SET threads=2")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    ora = con.sql(getattr(rel, sfn)()).df()
    assert len(got) == len(ora), (qfn, len(got), len(ora))
    pd.testing.assert_frame_equal(_canon(got), _canon(ora), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_latest_order_matches_oracle(sf_dir):
    from quickner_ray.pipelines.queries import q_latest_order, sql_latest_order

    got = q_latest_order(sf_dir).to_pandas()
    con = duckdb.connect()
    con.sql("SET threads=2")
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'")
    ora = con.sql(sql_latest_order()).df()
    assert len(got) == len(ora)
    pd.testing.assert_frame_equal(_canon(got), _canon(ora), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_returned_items_ordering(sf_dir):
    got = rel.q_returned_items(sf_dir).to_pandas()
    assert len(got) <= rel.Q10_K
    assert (got.revenue_e4.diff().dropna() <= 0).all()


from quickner_ray.pipelines import relational2 as rel2

CASES2 = [
    ("q_order_priority_check", "sql_order_priority_check"),
    ("q_forecast_revenue", "sql_forecast_revenue"),
    ("q_market_share", "sql_market_share"),
    ("q_customer_distribution", "sql_customer_distribution"),
    ("q_disjunctive_revenue", "sql_disjunctive_revenue"),
    ("q_waiting_suppliers", "sql_waiting_suppliers"),
    ("q_idle_customers", "sql_idle_customers"),
]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("qfn,sfn", CASES2, ids=[c[0] for c in CASES2])
def test_relational2_matches_oracle(sf_dir, qfn, sfn):
    """Q4/Q6/Q8/Q13/Q19/Q21/Q22 shapes (relational2.py) vs DuckDB."""
    out = getattr(rel2, qfn)(sf_dir)
    got = out.to_pandas() if hasattr(out, "to_pandas") else pd.DataFrame(out)
    con = duckdb.connect()
    con.sql("SET threads=2")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    ora = con.sql(getattr(rel2, sfn)()).df()
    assert len(got) == len(ora), (qfn, len(got), len(ora))
    pd.testing.assert_frame_equal(_canon(got), _canon(ora), check_dtype=False)


from quickner_ray.pipelines import relational3 as rel3

CASES3 = [
    ("q_min_cost_supplier", "sql_min_cost_supplier"),
    ("q_supplier_part_counts", "sql_supplier_part_counts"),
    ("q_small_qty_revenue", "sql_small_qty_revenue"),
    ("q_excess_suppliers", "sql_excess_suppliers"),
]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("qfn,sfn", CASES3, ids=[c[0] for c in CASES3])
def test_relational3_matches_oracle(sf_dir, qfn, sfn):
    """Q2/Q16/Q17/Q20 shapes (relational3.py) vs DuckDB — these complete
    all 22 TPC-H query shapes."""
    out = getattr(rel3, qfn)(sf_dir)
    got = out.to_pandas() if hasattr(out, "to_pandas") else pd.DataFrame(out)
    con = duckdb.connect()
    con.sql("SET threads=2")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    ora = con.sql(getattr(rel3, sfn)()).df()
    assert len(got) == len(ora), (qfn, len(got), len(ora))
    pd.testing.assert_frame_equal(_canon(got), _canon(ora), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_q2_ties_kept(sf_dir):
    """Q2 keeps EVERY supplier achieving the per-part minimum: each
    surviving (part, supplier) row's cost equals its part's min cost."""
    got = rel3.q_min_cost_supplier(sf_dir).to_pandas()
    if len(got) == 0:
        pytest.skip("no qualifying parts at this sf")
    per_part_min = got.groupby("p_partkey").cost_c.transform("min")
    assert (got.cost_c == per_part_min).all()
