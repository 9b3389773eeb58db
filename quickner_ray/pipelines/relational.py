"""TPC-H-shaped relational operators beyond the Q1/Q3/Q5 family already in
``pipelines.queries``: nation-pair trade volume (Q7), product profit by
nation/year (Q9), returned-item customer report (Q10), value-share HAVING
(Q11 shape), priority line counts with conditional aggregation (Q12
shape), promo revenue share (Q14), argmax-with-ties (Q15 shape), the
grouped-HAVING semi-join for large-volume orders (Q18), an INTERSECT
set-op, and a CROSS JOIN zero-filled grid. Matching DuckDB oracle SQL
lives next to each query.

Join-plan conventions (the 10^12-row shapes, same as queries.py):
- the ONLY all-to-all exchanges are fact ⋈ fact joins on the orderkey;
- dimension attaches (supplier, part, nation) are broadcast Arrow lookups
  (``ray.put`` once, ``pc.index_in`` + ``take`` inside the batch fn) run as
  ``task_stage`` stages — light state, so no actor pool is reserved and the
  join's shuffle aggregators never starve for CPUs;
- customer's (custkey -> nationkey/name) projection is the one fact-sized
  broadcast, same documented tradeoff as q_local_supplier_revenue — the
  partitioned alternative is a second orderkey-co-shuffle;
- money is computed on the integer cent grid per row
  (``cents * (100 - disc_cents)`` -> int64 "e4" units) so distributed sums
  are bit-exact at any parallelism.

Ray is initialised by the caller — nothing here calls ray.init().
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..stages.taskstate import task_stage


def _cents_away(col) -> pa.Array:
    """``CAST(round(x*100) AS BIGINT)`` with DuckDB ROUND semantics (half
    AWAY from zero — kernel/rounding.round_away), not pc.round's
    half-to-even: identical on the cent grid, but exact for any input
    decimals (e.g. 0.125 * 100 = 12.5 -> 13, where pc.round gives 12)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    from ..kernel.rounding import round_away

    x = col.to_numpy(zero_copy_only=False).astype(np.float64)
    return pa.array(round_away(x * 100.0, 0).astype(np.int64), type=pa.int64())


def _us(date: str) -> int:
    """'YYYY-MM-DD' -> int64 epoch microseconds (matches timestamp[us])."""
    return int(pa.scalar(date).cast(pa.timestamp("us")).cast(pa.int64()).as_py())


def _revenue_e4(b: pa.Table) -> pa.ChunkedArray:
    """Exact integer revenue: round(price*100) * (100 - round(disc*100)),
    DuckDB ROUND (half away from zero) on both factors."""
    cents = _cents_away(b.column("l_extendedprice"))
    disc = _cents_away(b.column("l_discount"))
    return pc.multiply(cents, pc.subtract(pa.scalar(100, type=pa.int64()), disc))


def _dim_arrays(path: str, key: str, *cols: str):
    """Read a dimension projection as combined Arrow arrays for broadcast."""
    t = pq.read_table(path, columns=[key, *cols])
    return tuple(t.column(c).combine_chunks() for c in (key, *cols))


def _lookup(keys, vals, query):
    """Broadcast dim lookup: ``vals[index_in(query, keys)]``.

    Null policy: a key absent from the dim yields NULL — callers that use
    the attach as a filter must keep ``pc.is_valid`` explicitly (Q7's
    nation restriction does); plain attaches rely on FK integrity and let
    a null surface loudly rather than dropping rows silently."""
    if isinstance(query, pa.ChunkedArray):
        query = query.combine_chunks()
    return vals.take(pc.index_in(query, value_set=keys))


def _ts_range_filter(b: pa.Table, col: str, lo: int, hi: int) -> pa.Table:
    us = b.column(col).combine_chunks().cast(pa.int64())
    keep = pc.and_(
        pc.greater_equal(us, pa.scalar(lo, type=pa.int64())),
        pc.less(us, pa.scalar(hi, type=pa.int64())),
    )
    return b.filter(keep)


# --- Q7: nation-pair trade volume ------------------------------------------

Q7_NATION_A = "NATION_3"
Q7_NATION_B = "NATION_7"
Q7_FROM = "1996-01-01"
Q7_TO = "1998-01-01"


class _Q7LiPre:
    """Filter shipdate range, attach + filter supplier nation name."""

    def __init__(self, ref, lo: int, hi: int):
        import ray

        self.sk, self.sn, _ck, _cn, self.nat_keys, self.nat_names = ray.get(ref)
        self.lo, self.hi = lo, hi

    def __call__(self, b: pa.Table) -> pa.Table:
        b = _ts_range_filter(b, "l_shipdate", self.lo, self.hi)
        s_nat = _lookup(self.sk, self.sn, b.column("l_suppkey"))
        idx = pc.index_in(s_nat, value_set=self.nat_keys)
        keep = pc.is_valid(idx)
        b = b.filter(keep)
        return pa.Table.from_pydict(
            {
                "l_orderkey": b.column("l_orderkey"),
                "supp_nation": self.nat_names.take(idx.filter(keep)),
                "l_year": pc.year(b.column("l_shipdate")),
                "revenue_e4": _revenue_e4(b),
            }
        )


class _Q7OrdPre:
    """Attach + filter customer nation name (fact-sized broadcast)."""

    def __init__(self, ref):
        import ray

        _sk, _sn, self.ck, self.cn, self.nat_keys, self.nat_names = ray.get(ref)

    def __call__(self, b: pa.Table) -> pa.Table:
        c_nat = _lookup(self.ck, self.cn, b.column("o_custkey"))
        idx = pc.index_in(c_nat, value_set=self.nat_keys)
        keep = pc.is_valid(idx)
        return pa.Table.from_pydict(
            {
                "o_orderkey": b.column("o_orderkey").filter(keep),
                "cust_nation": self.nat_names.take(idx.filter(keep)),
            }
        )


def _q7_cross_only(b: pa.Table) -> pa.Table:
    keep = pc.invert(
        pc.equal(b.column("supp_nation"), b.column("cust_nation")).combine_chunks()
    )
    return b.filter(keep).select(["supp_nation", "cust_nation", "l_year", "revenue_e4"])


def q_nation_trade_volume(sf_dir: str):
    """TPC-H-Q7-shaped join: revenue shipped between two named nations, by
    (supplier nation, customer nation, ship year). The supplier-nation
    filter is pushed into the lineitem scan via a broadcast dim lookup, so
    the orderkey shuffle only carries the ~2/25 of lineitems that survive;
    the customer-nation filter shrinks orders the same way."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    lo, hi = _us(Q7_FROM), _us(Q7_TO)
    nk, nn = _dim_arrays(
        os.path.join(sf_dir, "nation.parquet"), "n_nationkey", "n_name"
    )
    pair = pc.or_(pc.equal(nn, Q7_NATION_A), pc.equal(nn, Q7_NATION_B))
    sk, sn = _dim_arrays(
        os.path.join(sf_dir, "supplier.parquet"), "s_suppkey", "s_nationkey"
    )
    ck, cn = _dim_arrays(
        os.path.join(sf_dir, "customer.parquet"), "c_custkey", "c_nationkey"
    )
    ref = ray.put((sk, sn, ck, cn, nk.filter(pair), nn.filter(pair)))

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_orderkey",
            "l_suppkey",
            "l_shipdate",
            "l_extendedprice",
            "l_discount",
        ],
    ).map_batches(
        task_stage(_Q7LiPre, ref=ref, lo=lo, hi=hi), batch_format="pyarrow"
    )
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
    ).map_batches(task_stage(_Q7OrdPre, ref=ref), batch_format="pyarrow")

    joined = li.join(
        orders, "inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )
    out = joined.map_batches(_q7_cross_only, batch_format="pyarrow")
    return out.groupby(["supp_nation", "cust_nation", "l_year"]).aggregate(
        Sum("revenue_e4", alias_name="revenue_e4")
    )


def sql_nation_trade_volume() -> str:
    return (
        f"SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,\n"
        f"  year(l_shipdate) AS l_year,\n"
        f"  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)\n"
        f"      * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)\n"
        f"    AS revenue_e4\n"
        f"FROM lineitem, orders, supplier, customer, nation n1, nation n2\n"
        f"WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey\n"
        f"  AND o_custkey = c_custkey AND s_nationkey = n1.n_nationkey\n"
        f"  AND c_nationkey = n2.n_nationkey\n"
        f"  AND n1.n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}')\n"
        f"  AND n2.n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}')\n"
        f"  AND n1.n_name <> n2.n_name\n"
        f"  AND l_shipdate >= TIMESTAMP '{Q7_FROM}'\n"
        f"  AND l_shipdate < TIMESTAMP '{Q7_TO}'\n"
        f"GROUP BY supp_nation, cust_nation, l_year"
    )


# --- Q9: product profit by nation / year -----------------------------------

Q9_NAME_FRAGMENT = "red"


class _Q9Profit:
    def __init__(self, ref):
        import ray

        self.red_keys, self.sk, self.sn, self.nk, self.nn = ray.get(ref)

    def __call__(self, b: pa.Table) -> pa.Table:
        keep = pc.is_in(
            b.column("l_partkey").combine_chunks(), value_set=self.red_keys
        )
        b = b.filter(keep)
        s_nat = _lookup(self.sk, self.sn, b.column("l_suppkey"))
        name = _lookup(self.nk, self.nn, s_nat)
        return pa.Table.from_pydict(
            {
                "n_name": name,
                "l_year": pc.year(b.column("l_shipdate")),
                "profit_e4": _revenue_e4(b),
            }
        )


def q_product_profit(sf_dir: str):
    """TPC-H-Q9-shaped profit rollup: lineitems of parts whose name contains
    a fragment, revenue grouped by supplier nation and ship year. part and
    supplier are dim broadcasts; no shuffle join at all — the groupby on
    (n_name, l_year) is the only exchange. (Deviation from stock Q9 noted:
    profit uses the revenue term only — this schema has no partsupp table —
    and the year is the ship year, keeping the query single-fact.)"""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    pk, pname = _dim_arrays(
        os.path.join(sf_dir, "part.parquet"), "p_partkey", "p_name"
    )
    red_keys = pk.filter(pc.match_substring(pname, Q9_NAME_FRAGMENT))
    sk, sn = _dim_arrays(
        os.path.join(sf_dir, "supplier.parquet"), "s_suppkey", "s_nationkey"
    )
    nk, nn = _dim_arrays(
        os.path.join(sf_dir, "nation.parquet"), "n_nationkey", "n_name"
    )
    ref = ray.put((red_keys, sk, sn, nk, nn))

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_partkey",
            "l_suppkey",
            "l_shipdate",
            "l_extendedprice",
            "l_discount",
        ],
    ).map_batches(task_stage(_Q9Profit, ref=ref), batch_format="pyarrow")
    return li.groupby(["n_name", "l_year"]).aggregate(
        Sum("profit_e4", alias_name="profit_e4")
    )


def sql_product_profit() -> str:
    return (
        f"SELECT n_name, year(l_shipdate) AS l_year,\n"
        f"  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)\n"
        f"      * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)\n"
        f"    AS profit_e4\n"
        f"FROM lineitem, part, supplier, nation\n"
        f"WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey\n"
        f"  AND s_nationkey = n_nationkey\n"
        f"  AND p_name LIKE '%{Q9_NAME_FRAGMENT}%'\n"
        f"GROUP BY n_name, l_year"
    )


# --- Q10: returned-item customer report ------------------------------------

Q10_FROM = "1996-07-01"
Q10_TO = "1996-10-01"
Q10_K = 20


def _q10_li_pre(b: pa.Table) -> pa.Table:
    b = b.filter(pc.equal(b.column("l_returnflag"), "R").combine_chunks())
    return pa.Table.from_pydict(
        {"l_orderkey": b.column("l_orderkey"), "revenue_e4": _revenue_e4(b)}
    )


class _Q10Attach:
    def __init__(self, ref):
        import ray

        self.ck, self.cname, self.cnat, self.nk, self.nn = ray.get(ref)

    def __call__(self, b: pa.Table) -> pa.Table:
        idx = pc.index_in(b.column("o_custkey").combine_chunks(), value_set=self.ck)
        nat = self.nn.take(pc.index_in(self.cnat.take(idx), value_set=self.nk))
        return pa.Table.from_pydict(
            {
                "c_custkey": b.column("o_custkey"),
                "c_name": self.cname.take(idx),
                "n_name": nat,
                "revenue_e4": b.column("revenue_e4"),
            }
        )


def q_returned_items(sf_dir: str):
    """TPC-H-Q10-shaped report: revenue lost to returned lineitems per
    customer for one quarter of orders, top 20. One orderkey shuffle join
    (returned lineitems ⋈ quarter orders), then customer name/nation attach
    as a broadcast, exact-integer revenue aggregate, sort+limit."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    lo, hi = _us(Q10_FROM), _us(Q10_TO)
    ck, cname, cnat = _dim_arrays(
        os.path.join(sf_dir, "customer.parquet"), "c_custkey", "c_name", "c_nationkey"
    )
    nk, nn = _dim_arrays(
        os.path.join(sf_dir, "nation.parquet"), "n_nationkey", "n_name"
    )
    ref = ray.put((ck, cname, cnat, nk, nn))

    def ord_pre(b: pa.Table) -> pa.Table:
        b = _ts_range_filter(b, "o_orderdate", lo, hi)
        return b.select(["o_orderkey", "o_custkey"])

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(_q10_li_pre, batch_format="pyarrow")
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(ord_pre, batch_format="pyarrow")

    joined = li.join(
        orders, "inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )
    out = joined.map_batches(task_stage(_Q10Attach, ref=ref), batch_format="pyarrow")
    agg = out.groupby(["c_custkey", "c_name", "n_name"]).aggregate(
        Sum("revenue_e4", alias_name="revenue_e4")
    )
    return agg.sort(["revenue_e4", "c_custkey"], descending=[True, False]).limit(Q10_K)


def sql_returned_items() -> str:
    return (
        f"SELECT c_custkey, c_name, n_name,\n"
        f"  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)\n"
        f"      * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)\n"
        f"    AS revenue_e4\n"
        f"FROM lineitem, orders, customer, nation\n"
        f"WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey\n"
        f"  AND c_nationkey = n_nationkey AND l_returnflag = 'R'\n"
        f"  AND o_orderdate >= TIMESTAMP '{Q10_FROM}'\n"
        f"  AND o_orderdate < TIMESTAMP '{Q10_TO}'\n"
        f"GROUP BY c_custkey, c_name, n_name\n"
        f"ORDER BY revenue_e4 DESC, c_custkey LIMIT {Q10_K}"
    )


# --- Q12 shape: conditional aggregation over a fact-fact join --------------

Q12_YEAR = 1997
Q12_HIGH = ("1-URGENT", "2-HIGH")


def _q12_flag(b: pa.Table) -> pa.Table:
    high = pc.is_in(
        b.column("o_orderpriority").combine_chunks(), value_set=pa.array(Q12_HIGH)
    ).cast(pa.int64())
    return pa.Table.from_pydict(
        {
            "l_linestatus": b.column("l_linestatus"),
            "high_count": high,
            "low_count": pc.subtract(pa.scalar(1, type=pa.int64()), high),
        }
    )


def q_priority_line_counts(sf_dir: str):
    """TPC-H-Q12-shaped conditional aggregation: per lineitem linestatus,
    how many 1997-shipped lineitems belong to high- vs low-priority orders.
    The CASE is evaluated vectorized post-join; counts are 0/1 int columns
    summed by the aggregate (partial sums per block, tiny final shuffle)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    lo, hi = _us(f"{Q12_YEAR}-01-01"), _us(f"{Q12_YEAR + 1}-01-01")

    def li_pre(b: pa.Table) -> pa.Table:
        b = _ts_range_filter(b, "l_shipdate", lo, hi)
        return b.select(["l_orderkey", "l_linestatus"])

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linestatus", "l_shipdate"],
    ).map_batches(li_pre, batch_format="pyarrow")
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
    )
    joined = li.join(
        orders, "inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )
    out = joined.map_batches(_q12_flag, batch_format="pyarrow")
    return out.groupby("l_linestatus").aggregate(
        Sum("high_count", alias_name="high_count"),
        Sum("low_count", alias_name="low_count"),
    )


def sql_priority_line_counts() -> str:
    hi = ", ".join(f"'{p}'" for p in Q12_HIGH)
    return (
        f"SELECT l_linestatus,\n"
        f"  CAST(sum(CASE WHEN o_orderpriority IN ({hi}) THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS high_count,\n"
        f"  CAST(sum(CASE WHEN o_orderpriority IN ({hi}) THEN 0 ELSE 1 END)"
        f" AS BIGINT) AS low_count\n"
        f"FROM lineitem JOIN orders ON l_orderkey = o_orderkey\n"
        f"WHERE l_shipdate >= TIMESTAMP '{Q12_YEAR}-01-01'\n"
        f"  AND l_shipdate < TIMESTAMP '{Q12_YEAR + 1}-01-01'\n"
        f"GROUP BY l_linestatus"
    )


# --- Q14: promo revenue share ----------------------------------------------

Q14_FROM = "1996-09-01"
Q14_TO = "1996-10-01"


class _Q14Partial:
    def __init__(self, ref, lo: int, hi: int):
        import ray

        self.promo_keys = ray.get(ref)
        self.lo, self.hi = lo, hi

    def __call__(self, b: pa.Table) -> pa.Table:
        b = _ts_range_filter(b, "l_shipdate", self.lo, self.hi)
        rev = _revenue_e4(b)
        promo = pc.is_in(
            b.column("l_partkey").combine_chunks(), value_set=self.promo_keys
        ).cast(pa.int64())
        return pa.Table.from_pydict(
            {
                "promo_revenue_e4": pc.multiply(rev, promo),
                "total_revenue_e4": rev,
            }
        )


def q_promo_revenue(sf_dir: str):
    """TPC-H-Q14-shaped global conditional aggregate: revenue from PROMO
    parts vs all parts for one ship month, emitted as two exact integers
    (numerator / denominator of the promo share — no float division, so the
    result is bit-exact across engines). part-type attach is a dim
    broadcast; the whole query is one scan plus a scalar aggregate."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    lo, hi = _us(Q14_FROM), _us(Q14_TO)
    pk, ptype = _dim_arrays(
        os.path.join(sf_dir, "part.parquet"), "p_partkey", "p_type"
    )
    ref = ray.put(pk.filter(pc.equal(ptype, "PROMO")))

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(
        task_stage(_Q14Partial, ref=ref, lo=lo, hi=hi), batch_format="pyarrow"
    )
    agg = li.aggregate(
        Sum("promo_revenue_e4", alias_name="promo_revenue_e4"),
        Sum("total_revenue_e4", alias_name="total_revenue_e4"),
    )
    # Sum over an empty (out-of-window) dataset returns None; the oracle's
    # coalesce emits 0 — mirror it
    return pa.Table.from_pydict(
        {
            "promo_revenue_e4": pa.array(
                [int(agg["promo_revenue_e4"] or 0)], type=pa.int64()
            ),
            "total_revenue_e4": pa.array(
                [int(agg["total_revenue_e4"] or 0)], type=pa.int64()
            ),
        }
    )


def sql_promo_revenue() -> str:
    return (
        f"SELECT\n"
        f"  CAST(coalesce(sum(CASE WHEN p_type = 'PROMO' THEN\n"
        f"    CAST(round(l_extendedprice*100) AS BIGINT)\n"
        f"      * (100 - CAST(round(l_discount*100) AS BIGINT)) END), 0)\n"
        f"    AS BIGINT) AS promo_revenue_e4,\n"
        f"  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)\n"
        f"      * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)\n"
        f"    AS total_revenue_e4\n"
        f"FROM lineitem JOIN part ON l_partkey = p_partkey\n"
        f"WHERE l_shipdate >= TIMESTAMP '{Q14_FROM}'\n"
        f"  AND l_shipdate < TIMESTAMP '{Q14_TO}'"
    )


# --- Q18: large-volume orders (grouped HAVING semi-join) -------------------

Q18_QTY = 300
Q18_BROADCAST_CAP = 500_000  # rows; above this the keyset joins by hash


class _Q18Attach:
    def __init__(self, ref):
        import ray

        self.ck, self.cname = ray.get(ref)

    def __call__(self, b: pa.Table) -> pa.Table:
        name = _lookup(self.ck, self.cname, b.column("o_custkey"))
        return pa.Table.from_pydict(
            {
                "c_name": name,
                "o_custkey": b.column("o_custkey"),
                "o_orderkey": b.column("o_orderkey"),
                "o_orderdate_us": b.column("o_orderdate")
                .combine_chunks()
                .cast(pa.int64()),
                "total_cents": pc.round(
                    pc.multiply(b.column("o_totalprice"), pa.scalar(100.0))
                ).cast(pa.int64()),
                "sum_qty": b.column("sum_qty"),
            }
        )


def q_large_order_customers(sf_dir: str):
    """TPC-H-Q18-shaped grouped-HAVING semi-join: orders whose lineitems sum
    to > 300 units, joined back to order/customer detail. The HAVING side is
    a lineitem groupby(orderkey) — quantities are small integers stored as
    doubles, so the double sum is exact (< 2^53). The surviving keyset is
    tiny by construction; quantity sums ride the join back to orders."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    def qty_partial(b: pa.Table) -> pa.Table:
        # per-batch combiner: lineitem is orderkey-contiguous on disk, so
        # this collapses ~4 rows/order to ~1 before the global shuffle
        return b.group_by("l_orderkey").aggregate([("l_quantity", "sum")]).rename_columns(
            ["l_orderkey", "sum_qty"]
        )

    big = (
        rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_quantity"],
        )
        .map_batches(qty_partial, batch_format="pyarrow")
        .groupby("l_orderkey", num_partitions=8)
        .aggregate(Sum("sum_qty", alias_name="sum_qty"))
        .filter(expr=f"sum_qty > {Q18_QTY}")
        # hash aggregates can emit schema-less empty blocks that crash the
        # downstream join; a small repartition normalizes them
        .repartition(2)
    )

    ck, cname = _dim_arrays(
        os.path.join(sf_dir, "customer.parquet"), "c_custkey", "c_name"
    )
    ref = ray.put((ck, cname))

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    # size gate (same idiom as stages/antijoin): the >300-qty keyset is a
    # tiny fraction of orders — broadcast the (orderkey -> sum_qty) map and
    # skip the join shuffle entirely; fall back to the hash join when the
    # keyset outgrows the broadcast cap
    big = big.materialize()
    if big.count() <= Q18_BROADCAST_CAP:
        from ..stages.collect import collect_blocks

        bt = collect_blocks(
            big,
            "l_orderkey",
            pa.table(
                {
                    "l_orderkey": pa.array([], type=pa.int64()),
                    "sum_qty": pa.array([], type=pa.float64()),
                }
            ),
        )
        qref = ray.put(
            (bt.column("l_orderkey").combine_chunks(), bt.column("sum_qty").combine_chunks())
        )

        class SemiAttach:
            def __init__(self, qref):
                import ray as _ray

                self.bk, self.bq = _ray.get(qref)

            def __call__(self, b: pa.Table) -> pa.Table:
                idx = pc.index_in(
                    b.column("o_orderkey").combine_chunks(), value_set=self.bk
                )
                keep = pc.is_valid(idx)
                b = b.filter(keep)
                return b.append_column("sum_qty", self.bq.take(idx.filter(keep)))

        joined = orders.map_batches(
            task_stage(SemiAttach, qref=qref), batch_format="pyarrow"
        )
    else:
        joined = orders.join(
            big, "inner", num_partitions=4, on=("o_orderkey",), right_on=("l_orderkey",)
        )
    return joined.map_batches(task_stage(_Q18Attach, ref=ref), batch_format="pyarrow")


def sql_large_order_customers() -> str:
    return (
        f"SELECT c_name, o_custkey, o_orderkey,\n"
        f"  epoch_us(o_orderdate) AS o_orderdate_us,\n"
        f"  CAST(round(o_totalprice*100) AS BIGINT) AS total_cents, sum_qty\n"
        f"FROM orders JOIN customer ON o_custkey = c_custkey\n"
        f"JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem\n"
        f"      GROUP BY l_orderkey HAVING sum(l_quantity) > {Q18_QTY}) big\n"
        f"  ON o_orderkey = big.l_orderkey"
    )


# --- INTERSECT set-op -------------------------------------------------------

INTERSECT_A = "1-URGENT"
INTERSECT_B = "5-LOW"


def q_customers_both_priorities(sf_dir: str):
    """INTERSECT set-op: customers who placed at least one urgent AND one
    low-priority order. Each side is deduplicated by a groupby-count (the
    distinct keys shuffle is bounded by customer cardinality), then a keyed
    inner join realizes the intersection."""
    import ray.data as rd
    from ray.data.aggregate import Count

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderpriority"],
    )

    def side(prio: str, key: str):
        return (
            orders.filter(expr=f"o_orderpriority == '{prio}'")
            .groupby("o_custkey")
            .aggregate(Count(alias_name="n"))
            .drop_columns(["n"])
            .rename_columns({"o_custkey": key})
            .repartition(2)
        )

    a = side(INTERSECT_A, "o_custkey")
    b = side(INTERSECT_B, "b_custkey")
    both = a.join(
        b, "inner", num_partitions=4, on=("o_custkey",), right_on=("b_custkey",)
    )
    return both.select_columns(["o_custkey"])


def q_party_nation_union(sf_dir: str):
    """Set-op UNION (distinct): every nation key that has a customer OR a
    supplier — completes the set-op family (EXCEPT, INTERSECT, UNION).
    Dataset.union concatenates; distinctness is one bounded groupby."""
    import ray.data as rd
    from ray.data.aggregate import Count

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_nationkey"]
    ).map_batches(
        lambda b: pa.table({"nationkey": b.column("c_nationkey").cast(pa.int64())}),
        batch_format="pyarrow",
    )
    supp = rd.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_nationkey"]
    ).map_batches(
        lambda b: pa.table({"nationkey": b.column("s_nationkey").cast(pa.int64())}),
        batch_format="pyarrow",
    )
    return (
        cust.union(supp)
        .groupby("nationkey")
        .aggregate(Count(alias_name="n"))
        .drop_columns(["n"])
    )


def sql_party_nation_union() -> str:
    return (
        "SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer\n"
        "UNION\n"
        "SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier"
    )


def sql_customers_both_priorities() -> str:
    return (
        f"SELECT o_custkey FROM orders WHERE o_orderpriority = '{INTERSECT_A}'\n"
        f"INTERSECT\n"
        f"SELECT o_custkey FROM orders WHERE o_orderpriority = '{INTERSECT_B}'"
    )


# --- CROSS JOIN grid with zero-fill ----------------------------------------


def q_nation_status_grid(sf_dir: str):
    """Dense reporting grid: order counts per (nation, order status) with
    zero-filled missing combinations — the CROSS JOIN + LEFT JOIN +
    COALESCE(0) shape.  The counts aggregate is the only shuffle; the grid
    itself is dimension-bounded (|nation| x |status|), so densification
    happens driver-side on the tiny aggregate output."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    nk, nn = _dim_arrays(
        os.path.join(sf_dir, "nation.parquet"), "n_nationkey", "n_name"
    )
    ck, cn = _dim_arrays(
        os.path.join(sf_dir, "customer.parquet"), "c_custkey", "c_nationkey"
    )
    ref = ray.put((ck, cn, nk, nn))

    class AttachNation:
        def __init__(self, ref):
            import ray as _ray

            self.ck, self.cn, self.nk, self.nn = _ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            c_nat = self.cn.take(
                pc.index_in(b.column("o_custkey").combine_chunks(), value_set=self.ck)
            )
            name = self.nn.take(pc.index_in(c_nat, value_set=self.nk))
            return pa.Table.from_pydict(
                {"n_name": name, "o_orderstatus": b.column("o_orderstatus")}
            )

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderstatus"],
    ).map_batches(task_stage(AttachNation, ref=ref), batch_format="pyarrow")
    counts = orders.groupby(["n_name", "o_orderstatus"]).aggregate(
        Count(alias_name="n_orders")
    )
    from ..stages.collect import collect_blocks

    got = collect_blocks(
        counts,
        "n_name",
        pa.table(
            {
                "n_name": pa.array([], type=pa.string()),
                "o_orderstatus": pa.array([], type=pa.string()),
                "n_orders": pa.array([], type=pa.int64()),
            }
        ),
    )
    statuses = sorted(set(got.column("o_orderstatus").to_pylist()))
    seen = {
        (a, s): c
        for a, s, c in zip(
            got.column("n_name").to_pylist(),
            got.column("o_orderstatus").to_pylist(),
            got.column("n_orders").to_pylist(),
        )
    }
    names = nn.to_pylist()
    out_n, out_s, out_c = [], [], []
    for name in names:
        for s in statuses:
            out_n.append(name)
            out_s.append(s)
            out_c.append(seen.get((name, s), 0))
    return pa.table(
        {
            "n_name": pa.array(out_n, type=pa.string()),
            "o_orderstatus": pa.array(out_s, type=pa.string()),
            "n_orders": pa.array(out_c, type=pa.int64()),
        }
    )


def sql_nation_status_grid() -> str:
    return (
        "SELECT n.n_name, s.o_orderstatus,\n"
        "  CAST(coalesce(c.n, 0) AS BIGINT) AS n_orders\n"
        "FROM nation n\n"
        "CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s\n"
        "LEFT JOIN (SELECT n_name AS nn, o_orderstatus AS st, count(*) AS n\n"
        "    FROM orders JOIN customer ON o_custkey = c_custkey\n"
        "    JOIN nation ON c_nationkey = n_nationkey\n"
        "    GROUP BY nn, st) c\n"
        "  ON n.n_name = c.nn AND s.o_orderstatus = c.st"
    )


# --- Q15: top supplier(s) by quarter revenue (argmax with ties) ------------

Q15_FROM = "1996-01-01"
Q15_TO = "1996-04-01"


class _Q15Partial:
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi

    def __call__(self, b: pa.Table) -> pa.Table:
        b = _ts_range_filter(b, "l_shipdate", self.lo, self.hi)
        return pa.Table.from_pydict(
            {"l_suppkey": b.column("l_suppkey"), "revenue_e4": _revenue_e4(b)}
        )


def q_top_supplier_revenue(sf_dir: str):
    """TPC-H-Q15-shaped argmax-with-ties: the supplier(s) whose quarter
    revenue equals the maximum over all suppliers — the correlated-scalar-
    subquery (WHERE x = (SELECT max ...)) shape. One scan + one supplier-
    bounded groupby; the max is a scalar aggregate over that tiny table,
    broadcast into a vectorized equality filter; names attach from the
    supplier dim."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    lo, hi = _us(Q15_FROM), _us(Q15_TO)
    rev = (
        rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        )
        .map_batches(task_stage(_Q15Partial, lo=lo, hi=hi), batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("revenue_e4", alias_name="total_revenue_e4"))
        .materialize()
    )
    best = rev.aggregate(Max("total_revenue_e4", alias_name="m"))["m"]
    if best is None:  # no lineitem in the window: no supplier qualifies
        return pa.table(
            {
                "s_suppkey": pa.array([], type=pa.int64()),
                "s_name": pa.array([], type=pa.string()),
                "total_revenue_e4": pa.array([], type=pa.int64()),
            }
        )

    sk, sname = _dim_arrays(
        os.path.join(sf_dir, "supplier.parquet"), "s_suppkey", "s_name"
    )
    ref = ray.put((sk, sname))

    class Finish:
        def __init__(self, ref, best: int):
            import ray as _ray

            self.sk, self.sname = _ray.get(ref)
            self.best = best

        def __call__(self, b: pa.Table) -> pa.Table:
            keep = pc.equal(
                b.column("total_revenue_e4").combine_chunks(),
                pa.scalar(self.best, type=pa.int64()),
            )
            b = b.filter(keep)
            name = self.sname.take(
                pc.index_in(b.column("l_suppkey").combine_chunks(), value_set=self.sk)
            )
            return pa.Table.from_pydict(
                {
                    "s_suppkey": b.column("l_suppkey"),
                    "s_name": name,
                    "total_revenue_e4": b.column("total_revenue_e4"),
                }
            )

    return rev.map_batches(
        task_stage(Finish, ref=ref, best=int(best)), batch_format="pyarrow"
    )


def sql_top_supplier_revenue() -> str:
    return (
        f"WITH rev AS MATERIALIZED (SELECT l_suppkey,\n"
        f"  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)\n"
        f"      * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)\n"
        f"    AS total_revenue_e4\n"
        f"  FROM lineitem\n"
        f"  WHERE l_shipdate >= TIMESTAMP '{Q15_FROM}'\n"
        f"    AND l_shipdate < TIMESTAMP '{Q15_TO}'\n"
        f"  GROUP BY l_suppkey)\n"
        f"SELECT s_suppkey, s_name, total_revenue_e4\n"
        f"FROM supplier JOIN rev ON s_suppkey = l_suppkey\n"
        f"WHERE total_revenue_e4 = (SELECT max(total_revenue_e4) FROM rev)"
    )


# --- Q11 shape: value-share HAVING against a global scalar -----------------

Q11_MULT_NUM = 3  # keep parts with revenue > 1.5x the mean part revenue
Q11_MULT_DEN = 2


def _q11_partial(b: pa.Table) -> pa.Table:
    return pa.Table.from_pydict(
        {"l_partkey": b.column("l_partkey"), "revenue_e4": _revenue_e4(b)}
    )


def q_important_parts(sf_dir: str):
    """TPC-H-Q11-shaped value-share filter: parts whose total revenue
    exceeds 1.5x the mean part revenue — the HAVING-against-a-global-scalar
    shape. One scan + one partkey groupby; the global total and group count
    are scalar aggregates over the grouped table, broadcast into an exact
    integer cross-multiplied filter (rev * n_parts * 2 > total * 3 — no
    division, no floats; int64 headroom to ~10^18 e4-units)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    rev = (
        rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(_q11_partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("revenue_e4", alias_name="part_revenue_e4"))
        .materialize()
    )
    tot = rev.aggregate(
        Sum("part_revenue_e4", alias_name="t"), Count(alias_name="n")
    )
    n_parts = int(tot["n"] or 0)
    if n_parts == 0:  # empty lineitem: no part clears any share threshold
        return pa.table(
            {
                "p_partkey": pa.array([], type=pa.int64()),
                "p_name": pa.array([], type=pa.string()),
                "part_revenue_e4": pa.array([], type=pa.int64()),
            }
        )
    total = int(tot["t"])

    pk, pname = _dim_arrays(
        os.path.join(sf_dir, "part.parquet"), "p_partkey", "p_name"
    )
    ref = ray.put((pk, pname))

    class Finish:
        def __init__(self, ref, total: int, n_parts: int):
            import ray as _ray

            self.pk, self.pname = _ray.get(ref)
            self.cut = total * Q11_MULT_NUM
            self.mult = n_parts * Q11_MULT_DEN

        def __call__(self, b: pa.Table) -> pa.Table:
            lhs = pc.multiply(
                b.column("part_revenue_e4").combine_chunks(),
                pa.scalar(self.mult, type=pa.int64()),
            )
            b = b.filter(pc.greater(lhs, pa.scalar(self.cut, type=pa.int64())))
            name = self.pname.take(
                pc.index_in(b.column("l_partkey").combine_chunks(), value_set=self.pk)
            )
            return pa.Table.from_pydict(
                {
                    "p_partkey": b.column("l_partkey"),
                    "p_name": name,
                    "part_revenue_e4": b.column("part_revenue_e4"),
                }
            )

    return rev.map_batches(
        task_stage(Finish, ref=ref, total=total, n_parts=n_parts),
        batch_format="pyarrow",
    )


def sql_important_parts() -> str:
    return (
        f"WITH rev AS MATERIALIZED (SELECT l_partkey,\n"
        f"  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)\n"
        f"      * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)\n"
        f"    AS part_revenue_e4\n"
        f"  FROM lineitem GROUP BY l_partkey)\n"
        f"SELECT p_partkey, p_name, part_revenue_e4\n"
        f"FROM part JOIN rev ON p_partkey = l_partkey\n"
        f"WHERE part_revenue_e4 * (SELECT count(*) FROM rev) * {Q11_MULT_DEN}\n"
        f"  > (SELECT sum(part_revenue_e4) FROM rev) * {Q11_MULT_NUM}"
    )


# --- correlated row-vs-group-aggregate comparison --------------------------


def q_orders_above_customer_avg(sf_dir: str):
    """Correlated-subquery shape: orders whose price exceeds their own
    customer's average order value. The per-customer (sum, count) aggregate
    is customer-bounded; it broadcasts into a vectorized integer
    cross-multiplied filter (cents * n > sum_cents — exact, no division).
    At open-vocabulary key scale the broadcast swaps for a key-partitioned
    join, same as the Q5 customer-side note."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def cents_pre(b: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(b.column("o_totalprice"), pa.scalar(100.0))).cast(
            pa.int64()
        )
        return pa.Table.from_pydict(
            {
                "o_orderkey": b.column("o_orderkey"),
                "o_custkey": b.column("o_custkey"),
                "cents": cents,
            }
        )

    orders = orders.map_batches(cents_pre, batch_format="pyarrow").materialize()
    stats = orders.groupby("o_custkey").aggregate(
        Sum("cents", alias_name="sum_cents"), Count(alias_name="n_orders")
    )
    from ..stages.collect import collect_blocks

    st = collect_blocks(
        stats,
        "o_custkey",
        pa.table(
            {
                "o_custkey": pa.array([], type=pa.int64()),
                "sum_cents": pa.array([], type=pa.int64()),
                "n_orders": pa.array([], type=pa.int64()),
            }
        ),
    )
    ref = ray.put(
        (
            st.column("o_custkey").combine_chunks(),
            st.column("sum_cents").combine_chunks(),
            st.column("n_orders").combine_chunks(),
        )
    )

    class AboveAvg:
        def __init__(self, ref):
            import ray as _ray

            self.keys, self.sums, self.counts = _ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            idx = pc.index_in(b.column("o_custkey").combine_chunks(), value_set=self.keys)
            lhs = pc.multiply(b.column("cents").combine_chunks(), self.counts.take(idx))
            keep = pc.greater(lhs, self.sums.take(idx))
            b = b.filter(keep)
            return pa.Table.from_pydict(
                {
                    "o_orderkey": b.column("o_orderkey"),
                    "o_custkey": b.column("o_custkey"),
                    "cents": b.column("cents"),
                }
            )

    return orders.map_batches(task_stage(AboveAvg, ref=ref), batch_format="pyarrow")


def sql_orders_above_customer_avg() -> str:
    return (
        "SELECT o_orderkey, o_custkey,\n"
        "  CAST(round(o_totalprice*100) AS BIGINT) AS cents\n"
        "FROM orders JOIN (SELECT o_custkey AS ck,\n"
        "    sum(CAST(round(o_totalprice*100) AS BIGINT)) AS s,\n"
        "    count(*) AS n FROM orders GROUP BY ck) st\n"
        "  ON o_custkey = ck\n"
        "WHERE CAST(round(o_totalprice*100) AS BIGINT) * n > s"
    )


# --- ratio-to-report (global window aggregate) -----------------------------


def q_nation_revenue_share(sf_dir: str):
    """Ratio-to-report shape (sum() OVER () window): each nation's order
    revenue next to the global total, both as exact integers — the share is
    revenue_e4 / total_e4 without any float division. The grouped
    aggregate is nation-bounded; the grand total is a scalar aggregate
    attached as a constant column."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.collect import collect_blocks

    nk, nn = _dim_arrays(
        os.path.join(sf_dir, "nation.parquet"), "n_nationkey", "n_name"
    )
    ck, cn = _dim_arrays(
        os.path.join(sf_dir, "customer.parquet"), "c_custkey", "c_nationkey"
    )
    import ray

    ref = ray.put((ck, cn, nk, nn))

    class Attach:
        def __init__(self, ref):
            import ray as _ray

            self.ck, self.cn, self.nk, self.nn = _ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            nat = self.cn.take(
                pc.index_in(b.column("o_custkey").combine_chunks(), value_set=self.ck)
            )
            name = self.nn.take(pc.index_in(nat, value_set=self.nk))
            cents = pc.round(
                pc.multiply(b.column("o_totalprice"), pa.scalar(100.0))
            ).cast(pa.int64())
            return pa.Table.from_pydict({"n_name": name, "cents": cents})

    orders = (
        rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_totalprice"],
        )
        .map_batches(task_stage(Attach, ref=ref), batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("cents", alias_name="revenue_cents"))
    )
    tab = collect_blocks(
        orders,
        "n_name",
        pa.table(
            {
                "n_name": pa.array([], type=pa.string()),
                "revenue_cents": pa.array([], type=pa.int64()),
            }
        ),
    )
    total = sum(tab.column("revenue_cents").to_pylist())
    return tab.append_column(
        "total_cents", pa.array([total] * tab.num_rows, type=pa.int64())
    )


def sql_nation_revenue_share() -> str:
    return (
        "SELECT n_name, revenue_cents,\n"
        "  CAST(sum(revenue_cents) OVER () AS BIGINT) AS total_cents\n"
        "FROM (SELECT n_name,\n"
        "    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)\n"
        "      AS revenue_cents\n"
        "  FROM orders JOIN customer ON o_custkey = c_custkey\n"
        "  JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name)"
    )
