"""TPC-H-shaped relational operators, part 2: the shapes not yet covered
by ``pipelines.queries`` / ``pipelines.relational`` — order-priority
checking with EXISTS (Q4), the zero-shuffle filter-aggregate forecast
(Q6), market share with exact integer numerator/denominator (Q8), the
customer order-count distribution incl. zero-order customers (Q13),
disjunctive OR-of-ANDs predicates over a part attach (Q19), the
sole-supplier EXISTS/NOT-EXISTS chain (Q21 shape), and idle customers
above the global positive-balance average (Q22 shape). Matching DuckDB
oracle SQL lives next to each query.

Schema adaptations (this testdata has no partsupp / commitdate /
receiptdate / comment columns) are documented per query; the JOIN/EXISTS
structure is preserved exactly.

Same scale conventions as relational.py: the only all-to-all exchanges
are fact-fact joins / fact groupbys on the orderkey or custkey; dims
broadcast as Arrow lookups; money on the integer cent grid so sums are
bit-exact at any parallelism; averages compared by integer
cross-multiplication instead of division (the Q11 trick).

Ray is initialised by the caller — nothing here calls ray.init().
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..stages.taskstate import task_stage
from .relational import (
    _cents_away,
    _dim_arrays,
    _lookup,
    _revenue_e4,
    _ts_range_filter,
    _us,
)


def _cents(col) -> pa.Array:
    """DuckDB-ROUND-exact cents (half away from zero; see relational._cents_away)."""
    return _cents_away(col)


# --- Q4: order priority checking --------------------------------------------

Q4_FROM = "1996-01-01"
Q4_TO = "1996-04-01"


def q_order_priority_check(sf_dir: str):
    """TPC-H-Q4-shaped EXISTS count: orders placed in one quarter that have
    at least one RETURNED lineitem ('R' stands in for the reference's
    commitdate < receiptdate — this schema carries no commit/receipt
    dates), counted by priority. The EXISTS reaches orders as a semi-join
    whose key side is the dedup-bounded returned-orderkey set (broadcast
    below cap, hash-partitioned left_semi above); the priority groupby is
    5 groups."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from ..stages.antijoin import semi_join

    lo, hi = _us(Q4_FROM), _us(Q4_TO)
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        lambda b: _ts_range_filter(b, "o_orderdate", lo, hi), batch_format="pyarrow"
    )
    returned = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_returnflag"],
    ).filter(expr="l_returnflag == 'R'")
    hit = semi_join(orders, "o_orderkey", returned, "l_orderkey")
    return hit.groupby("o_orderpriority").aggregate(Count(alias_name="order_count"))


def sql_order_priority_check() -> str:
    return (
        f"SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count\n"
        f"FROM orders o\n"
        f"WHERE o_orderdate >= TIMESTAMP '{Q4_FROM}'\n"
        f"  AND o_orderdate < TIMESTAMP '{Q4_TO}'\n"
        f"  AND EXISTS (SELECT 1 FROM lineitem l\n"
        f"    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')\n"
        f"GROUP BY o_orderpriority"
    )


# --- Q6: forecasting revenue change ------------------------------------------

Q6_FROM = "1996-01-01"
Q6_TO = "1997-01-01"
Q6_DISC_LO_C = 5  # discount cents in [5, 7]
Q6_DISC_HI_C = 7
Q6_QTY_LT = 24.0


def q_forecast_revenue(sf_dir: str):
    """TPC-H-Q6-shaped filter-aggregate: revenue that would be gained by
    dropping small discounts — ``sum(extendedprice * discount)`` over a
    shipdate year, a discount band and a quantity cap. ZERO shuffles:
    pruned scan, one vectorized predicate, one global integer sum
    (cents x discount-cents = e4 units, bit-exact at any parallelism)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    lo, hi = _us(Q6_FROM), _us(Q6_TO)

    def pre(b: pa.Table) -> pa.Table:
        b = _ts_range_filter(b, "l_shipdate", lo, hi)
        disc_c = _cents(b.column("l_discount"))
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(disc_c, pa.scalar(Q6_DISC_LO_C, type=pa.int64())),
                pc.less_equal(disc_c, pa.scalar(Q6_DISC_HI_C, type=pa.int64())),
            ),
            pc.less(b.column("l_quantity").combine_chunks(), pa.scalar(Q6_QTY_LT)),
        )
        b = b.filter(keep)
        rev = pc.multiply(_cents(b.column("l_extendedprice")), _cents(b.column("l_discount")))
        return pa.Table.from_pydict({"revenue_e4": rev})

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    ).map_batches(pre, batch_format="pyarrow")
    total = ds.aggregate(Sum("revenue_e4", alias_name="revenue_e4"))
    return pa.Table.from_pydict(
        {"revenue_e4": pa.array([total["revenue_e4"]], type=pa.int64())}
    )


def sql_forecast_revenue() -> str:
    return (
        f"SELECT CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)\n"
        f"    * CAST(round(l_discount*100) AS BIGINT)) AS BIGINT) AS revenue_e4\n"
        f"FROM lineitem\n"
        f"WHERE l_shipdate >= TIMESTAMP '{Q6_FROM}'\n"
        f"  AND l_shipdate < TIMESTAMP '{Q6_TO}'\n"
        f"  AND CAST(round(l_discount*100) AS BIGINT) BETWEEN {Q6_DISC_LO_C} AND {Q6_DISC_HI_C}\n"
        f"  AND l_quantity < {Q6_QTY_LT}"
    )


# --- Q8: national market share ----------------------------------------------

Q8_NATION = "NATION_5"
Q8_REGION = "ASIA"
Q8_FROM = "1996-01-01"
Q8_TO = "1998-01-01"


class _Q8Li:
    """Lineitem side: revenue + is-target-supplier-nation flag."""

    def __init__(self, ref):
        import ray

        self.sk, self.s_is_nat = ray.get(ref)

    def __call__(self, b: pa.Table) -> pa.Table:
        flag = _lookup(self.sk, self.s_is_nat, b.column("l_suppkey"))
        return pa.Table.from_pydict(
            {
                "l_orderkey": b.column("l_orderkey"),
                "rev_e4": _revenue_e4(b),
                "is_nat": flag,
            }
        )


class _Q8Ord:
    """Orders side: date band + customer-region filter + order year."""

    def __init__(self, ref, lo: int, hi: int):
        import ray

        self.ck, self.c_in_region = ray.get(ref)
        self.lo, self.hi = lo, hi

    def __call__(self, b: pa.Table) -> pa.Table:
        b = _ts_range_filter(b, "o_orderdate", self.lo, self.hi)
        inr = _lookup(self.ck, self.c_in_region, b.column("o_custkey"))
        keep = pc.fill_null(inr, False)
        b = b.filter(keep)
        return pa.Table.from_pydict(
            {
                "o_orderkey": b.column("o_orderkey"),
                "o_year": pc.year(b.column("o_orderdate")),
            }
        )


def _q8_partial(b: pa.Table) -> pa.Table:
    num = pc.if_else(b.column("is_nat").combine_chunks(), b.column("rev_e4").combine_chunks(), pa.scalar(0, type=pa.int64()))
    return pa.Table.from_pydict(
        {
            "o_year": b.column("o_year"),
            "num_e4": num,
            "den_e4": b.column("rev_e4"),
        }
    )


def q_market_share(sf_dir: str):
    """TPC-H-Q8-shaped market share: of all revenue delivered to one
    region's customers over two order years, the fraction supplied by one
    nation — per year, as EXACT integer numerator/denominator (the share
    is num/den; emitting both avoids float division entirely). One
    orderkey shuffle joins the two pre-filtered fact sides; supplier and
    customer restrictions ride broadcast lookups. (Adaptation: no partsupp
    in this schema, so the part restriction is dropped and the year is the
    order year.)"""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    lo, hi = _us(Q8_FROM), _us(Q8_TO)
    nk, nn, nr = _dim_arrays(
        os.path.join(sf_dir, "nation.parquet"), "n_nationkey", "n_name", "n_regionkey"
    )
    rk, rn = _dim_arrays(os.path.join(sf_dir, "region.parquet"), "r_regionkey", "r_name")
    region_key = rk.filter(pc.equal(rn, Q8_REGION))
    nat_in_region = pc.is_in(nr, value_set=region_key)
    region_nations = nk.filter(nat_in_region)

    sk, sn = _dim_arrays(
        os.path.join(sf_dir, "supplier.parquet"), "s_suppkey", "s_nationkey"
    )
    target_key = nk.filter(pc.equal(nn, Q8_NATION))
    s_is_nat = pc.is_in(sn, value_set=target_key)
    ck, cn = _dim_arrays(
        os.path.join(sf_dir, "customer.parquet"), "c_custkey", "c_nationkey"
    )
    c_in_region = pc.is_in(cn, value_set=region_nations)

    li_ref = ray.put((sk, s_is_nat))
    ord_ref = ray.put((ck, c_in_region))

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(task_stage(_Q8Li, ref=li_ref), batch_format="pyarrow")
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(task_stage(_Q8Ord, ref=ord_ref, lo=lo, hi=hi), batch_format="pyarrow")

    joined = li.join(
        orders, "inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )
    return (
        joined.map_batches(_q8_partial, batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(Sum("num_e4", alias_name="num_e4"), Sum("den_e4", alias_name="den_e4"))
    )


def sql_market_share() -> str:
    return (
        f"SELECT year(o_orderdate) AS o_year,\n"
        f"  CAST(sum(CASE WHEN n1.n_name = '{Q8_NATION}' THEN\n"
        f"    CAST(round(l_extendedprice*100) AS BIGINT)\n"
        f"      * (100 - CAST(round(l_discount*100) AS BIGINT)) ELSE 0 END) AS BIGINT)\n"
        f"    AS num_e4,\n"
        f"  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)\n"
        f"      * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS den_e4\n"
        f"FROM lineitem, orders, customer, supplier, nation n1, nation n2, region\n"
        f"WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey\n"
        f"  AND o_custkey = c_custkey AND s_nationkey = n1.n_nationkey\n"
        f"  AND c_nationkey = n2.n_nationkey AND n2.n_regionkey = r_regionkey\n"
        f"  AND r_name = '{Q8_REGION}'\n"
        f"  AND o_orderdate >= TIMESTAMP '{Q8_FROM}'\n"
        f"  AND o_orderdate < TIMESTAMP '{Q8_TO}'\n"
        f"GROUP BY o_year"
    )


# --- Q13: customer order-count distribution ----------------------------------

Q13_EXCLUDE_PRIORITY = "4-NOT SPECIFIED"


def q_customer_distribution(sf_dir: str):
    """TPC-H-Q13-shaped distribution: how many customers placed exactly k
    qualifying orders, INCLUDING k=0 (the left-join subtlety). One
    custkey groupby counts orders per customer; the distribution groupby
    is tiny (max orders per customer). Zero-order customers = total
    customers minus customers seen in the counts — exact, no customer-side
    shuffle. (Adaptation: the reference excludes comment-pattern orders;
    this schema has no comment, so one priority class is excluded.)"""
    import ray.data as rd
    from ray.data.aggregate import Count

    counts = (
        rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_orderpriority"],
        )
        .filter(expr=f"o_orderpriority != '{Q13_EXCLUDE_PRIORITY}'")
        .groupby("o_custkey")
        .aggregate(Count(alias_name="c_count"))
    )
    dist = counts.groupby("c_count").aggregate(Count(alias_name="custdist")).take_all()
    n_customers = pq.ParquetFile(
        os.path.join(sf_dir, "customer.parquet")
    ).metadata.num_rows
    with_orders = sum(r["custdist"] for r in dist)
    rows = {int(r["c_count"]): int(r["custdist"]) for r in dist}
    if n_customers > with_orders:
        rows[0] = n_customers - with_orders
    ks = sorted(rows)
    return pa.Table.from_pydict(
        {
            "c_count": pa.array(ks, type=pa.int64()),
            "custdist": pa.array([rows[k] for k in ks], type=pa.int64()),
        }
    )


def sql_customer_distribution() -> str:
    return (
        f"SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (\n"
        f"  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count\n"
        f"  FROM customer c LEFT JOIN orders o\n"
        f"    ON c.c_custkey = o.o_custkey\n"
        f"   AND o.o_orderpriority <> '{Q13_EXCLUDE_PRIORITY}'\n"
        f"  GROUP BY c.c_custkey)\n"
        f"GROUP BY c_count"
    )


# --- Q19: disjunctive predicates ---------------------------------------------

Q19_BRANCHES = (
    ("Brand#12", 5, 1.0, 11.0),
    ("Brand#23", 10, 10.0, 20.0),
    ("Brand#34", 15, 20.0, 30.0),
)


class _Q19Rev:
    """Vectorized OR-of-ANDs over broadcast part attributes."""

    def __init__(self, ref):
        import ray

        self.pk, self.brand, self.size = ray.get(ref)

    def __call__(self, b: pa.Table) -> pa.Table:
        brand = _lookup(self.pk, self.brand, b.column("l_partkey"))
        size = _lookup(self.pk, self.size, b.column("l_partkey"))
        qty = b.column("l_quantity").combine_chunks()
        keep = None
        for br, size_hi, q_lo, q_hi in Q19_BRANCHES:
            cond = pc.and_(
                pc.and_(
                    pc.equal(brand, br),
                    pc.and_(
                        pc.greater_equal(size, pa.scalar(1)),
                        pc.less_equal(size, pa.scalar(size_hi)),
                    ),
                ),
                pc.and_(
                    pc.greater_equal(qty, pa.scalar(q_lo)),
                    pc.less_equal(qty, pa.scalar(q_hi)),
                ),
            )
            keep = cond if keep is None else pc.or_(keep, cond)
        b = b.filter(pc.fill_null(keep, False))
        return pa.Table.from_pydict({"revenue_e4": _revenue_e4(b)})


def q_disjunctive_revenue(sf_dir: str):
    """TPC-H-Q19-shaped disjunctive filter: revenue from lineitems matching
    any of three (brand, size band, quantity band) branches. The part
    attributes ride ONE broadcast lookup; the OR-of-ANDs is pure Arrow
    boolean algebra; ZERO shuffles (global integer sum)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    pk, pb, psz = _dim_arrays(
        os.path.join(sf_dir, "part.parquet"), "p_partkey", "p_brand", "p_size"
    )
    ref = ray.put((pk, pb, psz))
    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(task_stage(_Q19Rev, ref=ref), batch_format="pyarrow")
    total = ds.aggregate(Sum("revenue_e4", alias_name="revenue_e4"))
    val = total["revenue_e4"]
    return pa.Table.from_pydict(
        {"revenue_e4": pa.array([val if val is not None else 0], type=pa.int64())}
    )


def sql_disjunctive_revenue() -> str:
    ors = []
    for br, size_hi, q_lo, q_hi in Q19_BRANCHES:
        ors.append(
            f"(p_brand = '{br}' AND p_size BETWEEN 1 AND {size_hi}"
            f" AND l_quantity BETWEEN {q_lo} AND {q_hi})"
        )
    disj = "\n   OR ".join(ors)
    return (
        f"SELECT CAST(coalesce(sum(CAST(round(l_extendedprice*100) AS BIGINT)\n"
        f"    * (100 - CAST(round(l_discount*100) AS BIGINT))), 0) AS BIGINT)\n"
        f"  AS revenue_e4\n"
        f"FROM lineitem, part\n"
        f"WHERE l_partkey = p_partkey AND ({disj})"
    )


# --- Q21: suppliers who kept orders waiting (sole-failing-supplier) ----------

Q21_TOPK = 10


def _q21_pairs(b: pa.Table) -> pa.Table:
    """Per-batch combiner: distinct (orderkey, suppkey) with OR-combined
    returned flag — bounds each orderkey's group to its supplier count."""
    is_r = pc.equal(b.column("l_returnflag"), "R")
    t = pa.Table.from_pydict(
        {
            "l_orderkey": b.column("l_orderkey"),
            "l_suppkey": b.column("l_suppkey"),
            "is_r": is_r.cast(pa.int64()),
        }
    )
    return (
        t.group_by(["l_orderkey", "l_suppkey"])
        .aggregate([("is_r", "max")])
        .rename_columns(["l_orderkey", "l_suppkey", "is_r"])
    )


def _q21_per_order(b: pa.Table) -> pa.Table:
    return pa.Table.from_pydict(
        {
            "l_orderkey": b.column("l_orderkey"),
            "one": pa.array([1] * b.num_rows, type=pa.int64()),
            "is_r": b.column("is_r"),
            "r_supp": pc.if_else(
                pc.equal(b.column("is_r").combine_chunks(), 1),
                b.column("l_suppkey").combine_chunks(),
                pa.scalar(None, type=pa.int64()),
            ),
        }
    )


def q_waiting_suppliers(sf_dir: str):
    """TPC-H-Q21-shaped EXISTS/NOT-EXISTS chain: suppliers who were the
    ONLY supplier with a returned line on a finished multi-supplier order
    ('returned' stands in for the reference's late-delivery predicate —
    no commit/receipt dates in this schema), ranked by how often. Plan:
    distinct (orderkey, suppkey, returned) pairs — per-batch combiner
    first (bounds the exchange), then an exact global pair groupby (a
    pair split across input blocks must not double-count) — then ONE
    orderkey groupby computing (n_suppliers, n_returned_suppliers, the
    returned supplier as a null-skipping Min — exact when the count is
    1), a vectorized filter, then a tiny supplier groupby + broadcast
    name attach. The EXISTS and NOT-EXISTS collapse into the same
    aggregate pass — no self-joins."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min, Sum

    from ..stages.antijoin import semi_join

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_returnflag"],
    )
    fin = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderstatus"],
    ).filter(expr="o_orderstatus == 'F'")
    li = semi_join(li, "l_orderkey", fin, "o_orderkey")
    pairs = (
        li.map_batches(_q21_pairs, batch_format="pyarrow")
        .groupby(["l_orderkey", "l_suppkey"])
        .aggregate(Max("is_r", alias_name="is_r"))
        .map_batches(_q21_per_order, batch_format="pyarrow")
    )
    per_order = pairs.groupby("l_orderkey").aggregate(
        Sum("one", alias_name="n_supp"),
        Sum("is_r", alias_name="n_r"),
        Min("r_supp", alias_name="r_supp", ignore_nulls=True),
    )

    def pick(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater(b.column("n_supp").combine_chunks(), pa.scalar(1, type=pa.int64())),
            pc.equal(b.column("n_r").combine_chunks(), pa.scalar(1, type=pa.int64())),
        )
        b = b.filter(keep)
        return pa.Table.from_pydict({"s_suppkey": b.column("r_supp").cast(pa.int64())})

    waiting = per_order.map_batches(pick, batch_format="pyarrow")
    counts = waiting.groupby("s_suppkey").aggregate(Count(alias_name="numwait"))

    sk, sname = _dim_arrays(
        os.path.join(sf_dir, "supplier.parquet"), "s_suppkey", "s_name"
    )
    ref = ray.put((sk, sname))

    class Attach:
        def __init__(self, ref):
            import ray

            self.sk, self.sname = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            return b.append_column("s_name", _lookup(self.sk, self.sname, b.column("s_suppkey")))

    out = counts.map_batches(task_stage(Attach, ref=ref), batch_format="pyarrow")
    return out.sort(["numwait", "s_name"], descending=[True, False]).limit(Q21_TOPK)


def sql_waiting_suppliers() -> str:
    return (
        f"SELECT w.s_suppkey, numwait, s_name FROM (\n"
        f"  SELECT l1.l_suppkey AS s_suppkey,\n"
        f"         CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait\n"
        f"  FROM lineitem l1, orders\n"
        f"  WHERE l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'\n"
        f"    AND l1.l_returnflag = 'R'\n"
        f"    AND EXISTS (SELECT 1 FROM lineitem l2\n"
        f"      WHERE l2.l_orderkey = l1.l_orderkey\n"
        f"        AND l2.l_suppkey <> l1.l_suppkey)\n"
        f"    AND NOT EXISTS (SELECT 1 FROM lineitem l3\n"
        f"      WHERE l3.l_orderkey = l1.l_orderkey\n"
        f"        AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')\n"
        f"  GROUP BY l1.l_suppkey) w\n"
        f"JOIN supplier ON w.s_suppkey = supplier.s_suppkey\n"
        f"ORDER BY numwait DESC, s_name LIMIT {Q21_TOPK}"
    )


# --- Q22: idle customers above the positive-balance average -------------------


def q_idle_customers(sf_dir: str):
    """TPC-H-Q22-shaped anti-join + global scalar: customers with NO
    URGENT-priority orders whose balance exceeds the average POSITIVE
    balance, grouped by nation. (In this synthetic data every customer
    has at least one order, so the no-orders-at-all predicate is
    degenerate; the urgent-order restriction keeps the anti-join
    non-trivial while preserving the NOT EXISTS + scalar-subquery
    structure exactly.)
    The average never becomes a float: the filter is the integer
    cross-multiplication ``acctbal_cents * n_pos > sum_pos_cents`` (Q11
    trick). The no-orders side is the distributed anti-join stage
    (broadcast under its cap, Bloom + hash-partitioned shuffle above).
    (Adaptation: no phone column — nation plays the country-code role.)"""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )

    def add_cents(b: pa.Table) -> pa.Table:
        return b.append_column("bal_c", _cents(b.column("c_acctbal")))

    cust = cust.map_batches(add_cents, batch_format="pyarrow")
    pos = cust.filter(expr="bal_c > 0")
    tot = pos.aggregate(Sum("bal_c", alias_name="s"), Count(alias_name="n"))
    s_pos, n_pos = int(tot["s"] or 0), int(tot["n"] or 0)

    from ..stages.antijoin import anti_join

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderpriority"],
    ).filter(expr="o_orderpriority == '1-URGENT'")
    idle = anti_join(cust, "c_custkey", orders, "o_custkey")

    def above_avg(b: pa.Table) -> pa.Table:
        lhs = pc.multiply(
            b.column("bal_c").combine_chunks(), pa.scalar(n_pos, type=pa.int64())
        )
        return b.filter(pc.greater(lhs, pa.scalar(s_pos, type=pa.int64())))

    kept = idle.map_batches(above_avg, batch_format="pyarrow")
    return kept.groupby("c_nationkey").aggregate(
        Count(alias_name="numcust"), Sum("bal_c", alias_name="totacctbal_c")
    )


def sql_idle_customers() -> str:
    return (
        "SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,\n"
        "       CAST(sum(bal_c) AS BIGINT) AS totacctbal_c\n"
        "FROM (SELECT c_custkey, c_nationkey,\n"
        "             CAST(round(c_acctbal*100) AS BIGINT) AS bal_c FROM customer) c\n"
        "WHERE NOT EXISTS (SELECT 1 FROM orders o\n"
        "  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')\n"
        "  AND bal_c * (SELECT count(*) FROM customer\n"
        "               WHERE CAST(round(c_acctbal*100) AS BIGINT) > 0)\n"
        "      > (SELECT sum(CAST(round(c_acctbal*100) AS BIGINT)) FROM customer\n"
        "         WHERE CAST(round(c_acctbal*100) AS BIGINT) > 0)\n"
        "GROUP BY c_nationkey"
    )
