"""TPC-H-shaped relational operators, part 3 — the last four of the 22
classic shapes: the correlated-min supplier selection (Q2), the
COUNT(DISTINCT) part/supplier attribute counts with a NOT-IN exclusion
(Q16), the correlated avg-quantity small-order revenue (Q17), and the
nested-IN excess-supply promotion scan (Q20). With relational.py,
relational2.py and pipelines/queries.py this completes every TPC-H query
shape over this schema.

Schema adaptations (no partsupp / container / comment columns — see
TESTDATA.md): the part<->supplier bridge is lineitem itself; "supply
cost" is the minimum extended price a supplier ever charged for a part
(Q2); "customer complaints" suppliers are those with s_acctbal below a
constant (Q16's NOT-IN side); Q17's container filter becomes a brand
filter alone; Q20's availqty>0.5*shipped becomes 1996-shipped >
0.5*all-time-shipped per (supplier, part). The JOIN / correlated
subquery / EXISTS structure of each reference query is preserved
exactly, and every money/quantity comparison is an integer
cross-multiplication on the cent grid (bit-exact at any parallelism).

Scale notes: all-to-all exchanges are only on l_partkey-prefixed keys
((partkey, suppkey) pair aggregates and per-part map_groups); part and
supplier dims attach as broadcast Arrow lookups inside task_stage
workers (one fetch per worker process, zero-copy plasma reads).

Ray is initialised by the caller — nothing here calls ray.init().
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.taskstate import task_stage
from .relational import _cents_away, _dim_arrays, _lookup, _ts_range_filter, _us

# --- Q2: minimum-cost supplier ------------------------------------------------

Q2_REGION = "ASIA"
Q2_TYPE = "LARGE"
Q2_SIZE_MAX = 10
Q2_TOPK = 100


class _Q2Pre:
    """Lineitem side: keep (region suppliers) x (qualifying parts), emit
    cost cents. Both filter sets ride ONE broadcast ObjectRef."""

    def __init__(self, ref):
        import ray

        self.part_keys, self.supp_keys = ray.get(ref)

    def __call__(self, b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_in(b.column("l_partkey").combine_chunks(), value_set=self.part_keys),
            pc.is_in(b.column("l_suppkey").combine_chunks(), value_set=self.supp_keys),
        )
        b = b.filter(keep)
        t = pa.Table.from_pydict(
            {
                "l_partkey": b.column("l_partkey"),
                "l_suppkey": b.column("l_suppkey"),
                "cost_c": _cents_away(b.column("l_extendedprice")),
            }
        )
        # per-batch combiner: min cost per (part, supplier) bounds the shuffle
        # to one row per distinct pair per batch
        return (
            t.group_by(["l_partkey", "l_suppkey"])
            .aggregate([("cost_c", "min")])
            .rename_columns(["l_partkey", "l_suppkey", "cost_c"])
        )


def _q2_pick_min(g: pa.Table) -> pa.Table:
    """Within one part's group: keep every supplier row achieving the
    per-part minimum cost (ties kept, as in the reference Q2)."""
    cost = g.column("cost_c").combine_chunks()
    lo = pc.min(cost)
    return g.filter(pc.equal(cost, lo))


class _Q2Attach:
    def __init__(self, ref):
        import ray

        (self.sk, self.s_name, self.s_bal_c, self.s_nname) = ray.get(ref)

    def __call__(self, b: pa.Table) -> pa.Table:
        sk = b.column("l_suppkey")
        return pa.Table.from_pydict(
            {
                "p_partkey": b.column("l_partkey"),
                "s_suppkey": sk,
                "cost_c": b.column("cost_c"),
                "s_name": _lookup(self.sk, self.s_name, sk),
                "s_acctbal_c": _lookup(self.sk, self.s_bal_c, sk),
                "n_name": _lookup(self.sk, self.s_nname, sk),
            }
        )


def q_min_cost_supplier(sf_dir: str):
    """TPC-H-Q2-shaped correlated-min selection: for every qualifying part
    (type/size filter), the REGION supplier(s) offering it at the minimum
    cost, ranked by account balance. The correlated scalar subquery
    (cost = min cost over region suppliers of the same part) runs as one
    (part, supplier) pair aggregate — per-batch combiner first — followed
    by a per-part map_groups that keeps the argmin rows (ties included).
    Dims (part filter set, region-supplier set, supplier attributes)
    broadcast; the only shuffles are on the partkey-prefixed pair key."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min

    import pyarrow.parquet as pq

    # qualifying parts (type + size), region suppliers: tiny dim scans
    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type", "p_size"]
    )
    part_keys = part.filter(
        pc.and_(
            pc.equal(part.column("p_type").combine_chunks(), Q2_TYPE),
            pc.less_equal(part.column("p_size").combine_chunks(), Q2_SIZE_MAX),
        )
    ).column("p_partkey").combine_chunks()

    nk, n_rk, n_name = _dim_arrays(
        os.path.join(sf_dir, "nation.parquet"), "n_nationkey", "n_regionkey", "n_name"
    )
    rk, r_name = _dim_arrays(
        os.path.join(sf_dir, "region.parquet"), "r_regionkey", "r_name"
    )
    region_key = rk.filter(pc.equal(r_name, Q2_REGION))
    region_nations = nk.filter(pc.is_in(n_rk, value_set=region_key))

    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    )
    in_region = pc.is_in(
        supp.column("s_nationkey").combine_chunks(), value_set=region_nations
    )
    supp = supp.filter(in_region)
    supp_keys = supp.column("s_suppkey").combine_chunks()
    pre_ref = ray.put((part_keys, supp_keys))
    attach_ref = ray.put(
        (
            supp_keys,
            supp.column("s_name").combine_chunks(),
            _cents_away(supp.column("s_acctbal")),
            _lookup(nk, n_name, supp.column("s_nationkey")),
        )
    )

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    )
    pair_min = (
        li.map_batches(task_stage(_Q2Pre, ref=pre_ref), batch_format="pyarrow")
        .groupby(["l_partkey", "l_suppkey"])
        .aggregate(Min("cost_c", alias_name="cost_c"))
    )
    winners = pair_min.groupby("l_partkey").map_groups(
        _q2_pick_min, batch_format="pyarrow"
    )
    out = winners.map_batches(
        task_stage(_Q2Attach, ref=attach_ref), batch_format="pyarrow"
    )
    return out.sort(
        ["s_acctbal_c", "n_name", "s_name", "p_partkey"],
        descending=[True, False, False, False],
    ).limit(Q2_TOPK)


def sql_min_cost_supplier() -> str:
    return (
        f"WITH rs AS (\n"
        f"  SELECT s_suppkey, s_name,\n"
        f"         CAST(round(s_acctbal*100) AS BIGINT) AS s_acctbal_c, n_name\n"
        f"  FROM supplier JOIN nation ON s_nationkey = n_nationkey\n"
        f"  JOIN region ON n_regionkey = r_regionkey WHERE r_name = '{Q2_REGION}'),\n"
        f"qp AS (SELECT p_partkey FROM part\n"
        f"  WHERE p_type = '{Q2_TYPE}' AND p_size <= {Q2_SIZE_MAX}),\n"
        f"cost AS (\n"
        f"  SELECT l_partkey, l_suppkey,\n"
        f"         min(CAST(round(l_extendedprice*100) AS BIGINT)) AS cost_c\n"
        f"  FROM lineitem JOIN qp ON l_partkey = p_partkey\n"
        f"  JOIN rs ON l_suppkey = s_suppkey\n"
        f"  GROUP BY l_partkey, l_suppkey)\n"
        f"SELECT c.l_partkey AS p_partkey, c.l_suppkey AS s_suppkey, c.cost_c,\n"
        f"       rs.s_name, rs.s_acctbal_c, rs.n_name\n"
        f"FROM cost c JOIN rs ON c.l_suppkey = rs.s_suppkey\n"
        f"WHERE c.cost_c = (SELECT min(c2.cost_c) FROM cost c2\n"
        f"                  WHERE c2.l_partkey = c.l_partkey)\n"
        f"ORDER BY s_acctbal_c DESC, n_name, s_name, p_partkey LIMIT {Q2_TOPK}"
    )


# --- Q16: part/supplier attribute counts --------------------------------------

Q16_BRAND_NOT = "Brand#11"
Q16_TYPE_NOT = "PROMO"
Q16_SIZES = (1, 4, 9, 16, 25, 36, 49)
Q16_COMPLAINT_BAL = 3000_00  # cents; suppliers below are the NOT-IN side


class _Q16Pre:
    """Attach part attrs (brand/type/size filters), drop excluded
    suppliers, and dedup (attrs, suppkey) per batch."""

    def __init__(self, ref):
        import ray

        (self.pk, self.brand, self.ptype, self.psize, self.bad_supp) = ray.get(ref)

    def __call__(self, b: pa.Table) -> pa.Table:
        pkey = b.column("l_partkey").combine_chunks()
        idx = pc.index_in(pkey, value_set=self.pk)
        brand = self.brand.take(idx)
        ptype = self.ptype.take(idx)
        psize = self.psize.take(idx)
        keep = pc.and_(
            pc.and_(
                pc.invert(pc.equal(brand, Q16_BRAND_NOT)),
                pc.invert(pc.equal(ptype, Q16_TYPE_NOT)),
            ),
            pc.and_(
                pc.is_in(psize, value_set=pa.array(Q16_SIZES, type=psize.type)),
                pc.invert(
                    pc.is_in(
                        b.column("l_suppkey").combine_chunks(),
                        value_set=self.bad_supp,
                    )
                ),
            ),
        )
        t = pa.Table.from_pydict(
            {
                "p_brand": brand,
                "p_type": ptype,
                "p_size": psize,
                "l_suppkey": b.column("l_suppkey"),
            }
        ).filter(keep)
        return t.group_by(["p_brand", "p_type", "p_size", "l_suppkey"]).aggregate([])


def q_supplier_part_counts(sf_dir: str):
    """TPC-H-Q16-shaped COUNT(DISTINCT supplier) per (brand, type, size)
    with a NOT-IN supplier exclusion (the "complaints" side — here the
    below-balance set, this schema has no comments). Distinct pairs are
    established by a per-batch 4-key dedup combiner + one exact global
    pair groupby (a pair split across blocks must not double-count);
    the final attribute groupby is dimension-bounded. Part attributes and
    the exclusion set broadcast — no dim shuffle."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
    )
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_acctbal"]
    )
    bad = supp.filter(
        pc.less(
            _cents_away(supp.column("s_acctbal")),
            pa.scalar(Q16_COMPLAINT_BAL, type=pa.int64()),
        )
    ).column("s_suppkey").combine_chunks()
    ref = ray.put(
        (
            part.column("p_partkey").combine_chunks(),
            part.column("p_brand").combine_chunks(),
            part.column("p_type").combine_chunks(),
            part.column("p_size").combine_chunks(),
            bad,
        )
    )

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_partkey", "l_suppkey"]
    )
    pairs = (
        li.map_batches(task_stage(_Q16Pre, ref=ref), batch_format="pyarrow")
        .groupby(["p_brand", "p_type", "p_size", "l_suppkey"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )
    return pairs.groupby(["p_brand", "p_type", "p_size"]).aggregate(
        Count(alias_name="supplier_cnt")
    )


def sql_supplier_part_counts() -> str:
    sizes = ", ".join(str(s) for s in Q16_SIZES)
    return (
        f"SELECT p_brand, p_type, p_size,\n"
        f"       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt\n"
        f"FROM lineitem JOIN part ON l_partkey = p_partkey\n"
        f"WHERE p_brand <> '{Q16_BRAND_NOT}' AND p_type <> '{Q16_TYPE_NOT}'\n"
        f"  AND p_size IN ({sizes})\n"
        f"  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier\n"
        f"    WHERE CAST(round(s_acctbal*100) AS BIGINT) < {Q16_COMPLAINT_BAL})\n"
        f"GROUP BY p_brand, p_type, p_size"
    )


# --- Q17: small-quantity-order revenue -----------------------------------------

Q17_BRAND = "Brand#13"


def _q17_group(g: pa.Table) -> pa.Table:
    """One part's lineitems: sum extendedprice cents over rows with
    quantity below 20% of the part's average quantity. The correlated
    avg never becomes a float: qty < sum/(5*cnt) is evaluated as the
    integer cross-product 5*qty_c*cnt < sum_qty_c*100... both sides on
    the e2 grid: 5 * qty_c * cnt < sum_qty_c."""
    qty_c = _cents_away(g.column("l_quantity"))
    n = pa.scalar(len(qty_c), type=pa.int64())
    s = pc.sum(qty_c)
    lhs = pc.multiply(pc.multiply(qty_c, pa.scalar(5, type=pa.int64())), n)
    keep = pc.less(lhs, s)
    kept = g.filter(keep)
    rev = pc.sum(_cents_away(kept.column("l_extendedprice")))
    return pa.Table.from_pydict(
        {"revenue_c": pa.array([0 if rev.as_py() is None else rev.as_py()], type=pa.int64())}
    )


def q_small_qty_revenue(sf_dir: str):
    """TPC-H-Q17-shaped correlated-average filter: revenue from orders of
    one brand's parts whose quantity is below 20% of that part's average
    order quantity. ONE shuffle (partkey groupby); the correlated scalar
    subquery and the outer filter both run inside the per-part group,
    vectorized, with the 0.2*avg comparison as an exact integer
    cross-multiplication (5*qty*cnt < sum_qty on the e2 grid). The brand
    part set broadcasts into the scan filter."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"]
    )
    keys = part.filter(
        pc.equal(part.column("p_brand").combine_chunks(), Q17_BRAND)
    ).column("p_partkey").combine_chunks()
    ref = ray.put(keys)

    class Pre:
        def __init__(self, ref):
            import ray

            self.keys = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            keep = pc.is_in(
                b.column("l_partkey").combine_chunks(), value_set=self.keys
            )
            return b.filter(keep)

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    ).map_batches(task_stage(Pre, ref=ref), batch_format="pyarrow")
    per_part = li.groupby("l_partkey").map_groups(_q17_group, batch_format="pyarrow")
    total = per_part.aggregate(Sum("revenue_c", alias_name="revenue_c"))
    return pa.Table.from_pydict(
        {"revenue_c": pa.array([int(total["revenue_c"] or 0)], type=pa.int64())}
    )


def sql_small_qty_revenue() -> str:
    return (
        f"SELECT CAST(coalesce(sum(CAST(round(l_extendedprice*100) AS BIGINT)), 0)"
        f" AS BIGINT) AS revenue_c\n"
        f"FROM lineitem l JOIN part ON l.l_partkey = p_partkey\n"
        f"WHERE p_brand = '{Q17_BRAND}'\n"
        f"  AND 5 * CAST(round(l.l_quantity*100) AS BIGINT)\n"
        f"      * (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)\n"
        f"    < (SELECT sum(CAST(round(l3.l_quantity*100) AS BIGINT))\n"
        f"       FROM lineitem l3 WHERE l3.l_partkey = l.l_partkey)"
    )


# --- Q20: excess-supply suppliers ----------------------------------------------

Q20_TYPE = "PROMO"
Q20_FROM = "1996-01-01"
Q20_TO = "1997-01-01"
Q20_NATION = "NATION_3"


class _Q20Pre:
    """Promo-part lineitems -> per-batch (supp, part) partial sums of
    in-window and all-time shipped quantity cents."""

    def __init__(self, ref, lo: int, hi: int):
        import ray

        self.keys = ray.get(ref)
        self.lo, self.hi = lo, hi

    def __call__(self, b: pa.Table) -> pa.Table:
        keep = pc.is_in(b.column("l_partkey").combine_chunks(), value_set=self.keys)
        b = b.filter(keep)
        ts = b.column("l_shipdate").combine_chunks().cast(pa.int64())
        in_win = pc.and_(
            pc.greater_equal(ts, pa.scalar(self.lo, type=pa.int64())),
            pc.less(ts, pa.scalar(self.hi, type=pa.int64())),
        )
        qty_c = _cents_away(b.column("l_quantity"))
        t = pa.Table.from_pydict(
            {
                "l_suppkey": b.column("l_suppkey"),
                "l_partkey": b.column("l_partkey"),
                "win_c": pc.if_else(in_win, qty_c, pa.scalar(0, type=pa.int64())),
                "tot_c": qty_c,
            }
        )
        return (
            t.group_by(["l_suppkey", "l_partkey"])
            .aggregate([("win_c", "sum"), ("tot_c", "sum")])
            .rename_columns(["l_suppkey", "l_partkey", "win_c", "tot_c"])
        )


def q_excess_suppliers(sf_dir: str):
    """TPC-H-Q20-shaped nested-IN chain: suppliers in one nation who have
    at least one promo-type part whose 1996 shipped quantity exceeds half
    of its all-time shipped quantity from that supplier (the
    availqty > 0.5*sum(qty) predicate re-expressed over this schema —
    there is no partsupp). Plan: part set broadcasts into the scan; ONE
    (supp, part) pair aggregate (per-batch combiner bounds it) computes
    both the correlated window sum and the all-time sum; the 0.5 factor
    is the integer comparison 2*win > tot; a distinct-supplier reduction
    + broadcast nation/name attach end it. No self-join, no dim shuffle."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    )
    keys = part.filter(
        pc.equal(part.column("p_type").combine_chunks(), Q20_TYPE)
    ).column("p_partkey").combine_chunks()
    ref = ray.put(keys)

    lo, hi = _us(Q20_FROM), _us(Q20_TO)
    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_suppkey", "l_partkey", "l_quantity", "l_shipdate"],
    )
    pair = (
        li.map_batches(
            task_stage(_Q20Pre, ref=ref, lo=lo, hi=hi), batch_format="pyarrow"
        )
        .groupby(["l_suppkey", "l_partkey"])
        .aggregate(Sum("win_c", alias_name="win_c"), Sum("tot_c", alias_name="tot_c"))
    )

    def excess(b: pa.Table) -> pa.Table:
        keep = pc.greater(
            pc.multiply(
                b.column("win_c").combine_chunks(), pa.scalar(2, type=pa.int64())
            ),
            b.column("tot_c").combine_chunks(),
        )
        return b.filter(keep).select(["l_suppkey"])

    from ray.data.aggregate import Count

    supp_keys = (
        pair.map_batches(excess, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )

    nk, n_name = _dim_arrays(
        os.path.join(sf_dir, "nation.parquet"), "n_nationkey", "n_name"
    )
    nat_key = nk.filter(pc.equal(n_name, Q20_NATION))
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name", "s_nationkey"],
    )
    supp = supp.filter(
        pc.is_in(supp.column("s_nationkey").combine_chunks(), value_set=nat_key)
    )
    aref = ray.put(
        (supp.column("s_suppkey").combine_chunks(), supp.column("s_name").combine_chunks())
    )

    class Attach:
        def __init__(self, ref):
            import ray

            self.sk, self.sname = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            key = b.column("l_suppkey").combine_chunks()
            name = _lookup(self.sk, self.sname, key)
            keep = pc.is_valid(name)  # nation filter: absent => other nation
            return pa.Table.from_pydict(
                {"s_suppkey": key.filter(keep), "s_name": name.filter(keep)}
            )

    out = supp_keys.map_batches(task_stage(Attach, ref=aref), batch_format="pyarrow")
    return out.sort("s_name")


def sql_excess_suppliers() -> str:
    return (
        f"SELECT s_suppkey, s_name FROM supplier\n"
        f"WHERE s_suppkey IN (\n"
        f"  SELECT l_suppkey FROM (\n"
        f"    SELECT l_suppkey, l_partkey,\n"
        f"      sum(CASE WHEN l_shipdate >= TIMESTAMP '{Q20_FROM}'\n"
        f"               AND l_shipdate < TIMESTAMP '{Q20_TO}'\n"
        f"          THEN CAST(round(l_quantity*100) AS BIGINT) ELSE 0 END) AS win_c,\n"
        f"      sum(CAST(round(l_quantity*100) AS BIGINT)) AS tot_c\n"
        f"    FROM lineitem\n"
        f"    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = '{Q20_TYPE}')\n"
        f"    GROUP BY l_suppkey, l_partkey) sp\n"
        f"  WHERE 2 * win_c > tot_c)\n"
        f"  AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = '{Q20_NATION}')\n"
        f"ORDER BY s_name"
    )
