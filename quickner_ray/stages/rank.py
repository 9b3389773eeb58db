"""Global order statistics WITHOUT a global sort.

``global_rank`` computes the exact SQL ``RANK() OVER (ORDER BY col)`` for
every row in two passes:

1. value histogram: ``groupby(col).count()`` — a shuffle bounded by the
   DISTINCT value count, not the row count — collected driver-side and
   turned into a cumulative-count array;
2. broadcast the (sorted values, cumulative counts) pair and assign each
   row's rank with one vectorized ``searchsorted`` per batch.

This is exact and scale-safe for BOUNDED-CARDINALITY columns (integer
counts, scores on a grid, categorical codes) — the histogram is the
small side, rows never leave their blocks.  For continuous columns whose
distinct count approaches the row count, the histogram degenerates to
the dataset; use a distributed sort or a quantile sketch there instead
(``max_distinct`` guards against that misuse).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def exact_quantiles(
    ds,
    col: str,
    qs: list[float],
    *,
    bins: int = 4096,
    max_collect: int = 100_000,
    max_depth: int = 6,
):
    """EXACT global quantiles of a CONTINUOUS column without a global sort
    (``quantile_disc`` convention: element at index max(ceil(q*n)-1, 0) of
    the ascending order).

    Distributed quickselect by histogram refinement: each level runs one
    counting pass (per-batch bincount partials -> a groupby bounded by the
    bin count) over the candidate interval, narrowing every target rank to
    one bin; a bin whose population is under ``max_collect`` is resolved
    exactly by collecting just that sliver (predicate-pushdown re-read),
    a heavier bin recurses. Total work: O(depth) passes, driver memory
    bounded by bins + max_collect — never the row count. Returns
    [(q, value)] sorted by q.

    Degenerate mass (many duplicates of one value) stops refining an
    interval of zero width and collects it regardless of size cap — the
    duplicates are one value, so the collect is the distinct-value list.
    """
    import ray  # noqa: F401  (Dataset ops only)
    from ray.data.aggregate import Count, Max as AMax, Min as AMin, Sum

    agg = ds.aggregate(AMin(col), AMax(col), Count())
    n = agg["count()"]
    if not n:
        return []
    lo0, hi0 = agg[f"min({col})"], agg[f"max({col})"]
    targets = {q: max(int(np.ceil(q * n)) - 1, 0) for q in qs}

    def hist_pass(lo: float, hi: float):
        """One counting pass over [lo, hi]: returns (edges, counts)."""
        edges = np.linspace(lo, hi, bins + 1)

        def partial(b: pa.Table) -> pa.Table:
            v = b.column(col).to_numpy(zero_copy_only=False)
            v = v[(v >= lo) & (v <= hi)]
            if len(v) == 0:
                return pa.table(
                    {
                        "bin": pa.array([], type=pa.int64()),
                        "n": pa.array([], type=pa.int64()),
                    }
                )
            idx = np.clip(
                np.searchsorted(edges, v, side="right") - 1, 0, bins - 1
            )
            counts = np.bincount(idx, minlength=bins)
            nz = np.flatnonzero(counts)
            return pa.table(
                {
                    "bin": pa.array(nz, type=pa.int64()),
                    "n": pa.array(counts[nz], type=pa.int64()),
                }
            )

        rows = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bin")
            .aggregate(Sum("n", alias_name="n"))
            .take_all()
        )
        counts = np.zeros(bins, dtype=np.int64)
        for r in rows:
            counts[r["bin"]] = r["n"]
        return edges, counts

    def collect_slivers(
        intervals: list[tuple[float, float]]
    ) -> dict[int, np.ndarray]:
        """ONE pass collecting every listed [lo, hi] sliver: rows are tagged
        with their interval index inside map_batches, so resolving all
        small bins of a refinement level costs a single read."""
        los = np.array([iv[0] for iv in intervals])
        his = np.array([iv[1] for iv in intervals])

        def tag(b: pa.Table) -> pa.Table:
            v = b.column(col).to_numpy(zero_copy_only=False)
            hits_v, hits_i = [], []
            for i in range(len(los)):
                m = (v >= los[i]) & (v <= his[i])
                if m.any():
                    hits_v.append(v[m])
                    hits_i.append(np.full(int(m.sum()), i, dtype=np.int64))
            if not hits_v:
                return pa.table(
                    {
                        "iv": pa.array([], type=pa.int64()),
                        "v": pa.array([], type=pa.float64()),
                    }
                )
            return pa.table(
                {
                    "iv": pa.array(np.concatenate(hits_i)),
                    "v": pa.array(np.concatenate(hits_v), type=pa.float64()),
                }
            )

        # collect DISTINCT (iv, v) counts, not raw rows: a sliver holding a
        # hot value with millions of duplicates comes back as one row per
        # distinct value, so the driver cost is bounded by the sliver's
        # distinct-value count, never its row count
        from ray.data.aggregate import Count

        rows = (
            ds.map_batches(tag, batch_format="pyarrow")
            .groupby(["iv", "v"])
            .aggregate(Count(alias_name="n"))
            .take_all()
        )
        acc: dict[int, list[tuple[float, int]]] = {
            i: [] for i in range(len(intervals))
        }
        for r in rows:
            acc[r["iv"]].append((r["v"], r["n"]))
        out: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for i, pairs in acc.items():
            pairs.sort()
            vals = np.array([p[0] for p in pairs], dtype=np.float64)
            cum = np.cumsum(np.array([p[1] for p in pairs], dtype=np.int64))
            out[i] = (vals, cum)
        return out

    # rank -> value; resolve iteratively, grouping targets by interval.
    # Each level: one histogram pass per unresolved interval, then ONE
    # shared collect pass for every interval that became small enough.
    out: dict[float, float] = {}
    work = [(float(lo0), float(hi0), 0, dict(targets))]  # lo, hi, offset, {q: k}
    depth = 0
    while work:
        depth += 1
        next_work = []
        to_collect: list[tuple[float, float, int, dict[float, int]]] = []
        for lo, hi, offset, tgts in work:
            if lo == hi:
                # degenerate interval: every remaining row in it carries
                # the same value — the answer IS that value, no collect
                for q in tgts:
                    out[q] = lo
                continue
            if depth > max_depth:
                to_collect.append((lo, hi, offset, tgts))
                continue
            edges, counts = hist_pass(lo, hi)
            cum = np.concatenate([[0], np.cumsum(counts)])
            by_bin: dict[int, dict[float, int]] = {}
            for q, k in tgts.items():
                b = int(np.searchsorted(cum, k - offset, side="right") - 1)
                by_bin.setdefault(b, {})[q] = k
            for b, sub in by_bin.items():
                blo = float(edges[b])
                bhi = float(edges[b + 1])
                boff = offset + int(cum[b])
                if counts[b] <= max_collect:
                    # exact resolve: the sliver is small by measurement.
                    # The inclusive upper edge may pull in next-bin rows
                    # (v == bhi); they sort after every in-bin value and a
                    # target's index never reaches them, so they're inert.
                    to_collect.append((blo, bhi, boff, sub))
                else:
                    next_work.append((blo, bhi, boff, sub))
        if to_collect:
            slivers = collect_slivers([(c[0], c[1]) for c in to_collect])
            for i, (_lo, _hi, boff, sub) in enumerate(to_collect):
                vals, cum = slivers[i]
                for q, k in sub.items():
                    # 0-based index t within the sorted sliver lives at the
                    # first distinct value whose cumulative count exceeds t
                    t = k - boff
                    out[q] = float(vals[np.searchsorted(cum, t, side="right")])
        work = next_work
    return sorted(out.items())


class _RankAssign:
    def __init__(self, ref, col: str, out_col: str, descending: bool):
        import ray

        vals, cum = ray.get(ref)
        self.vals = vals
        self.cum = cum
        self.col = col
        self.out_col = out_col
        self.descending = descending

    def __call__(self, b: pa.Table) -> pa.Table:
        v = b.column(self.col).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(self.vals, v, side="left")
        if self.descending:
            # rank = rows strictly greater + 1 = total - cum[idx+1... ] ;
            # with ascending cum, rows > v = total - cum at right edge
            right = np.searchsorted(self.vals, v, side="right")
            rnk = (self.cum[-1] - self.cum[right]) + 1
        else:
            rnk = self.cum[idx] + 1
        return b.append_column(self.out_col, pa.array(rnk, type=pa.int64()))


def global_rank(
    ds,
    col: str,
    *,
    out_col: str = "rnk",
    descending: bool = False,
    max_distinct: int = 10_000_000,
):
    """Attach the exact global ``RANK() OVER (ORDER BY col)`` (ascending or
    descending) to every row.  See module docstring for the cardinality
    contract."""
    import ray
    from ray.data.aggregate import Count

    hist = ds.groupby(col).aggregate(Count(alias_name="n")).take_all()
    if len(hist) > max_distinct:
        raise ValueError(
            f"global_rank: {len(hist)} distinct values exceeds max_distinct="
            f"{max_distinct}; use a distributed sort or quantile sketch"
        )
    hist.sort(key=lambda r: r[col])
    vals = np.array([r[col] for r in hist])
    counts = np.array([r["n"] for r in hist], dtype=np.int64)
    cum = np.concatenate([[0], np.cumsum(counts)])
    ref = ray.put((vals, cum))

    from .taskstate import task_stage

    return ds.map_batches(
        task_stage(
            _RankAssign, ref=ref, col=col, out_col=out_col, descending=descending
        ),
        batch_format="pyarrow",
    )


# -- global row_number via distributed sort + per-block offsets --------------


def global_row_number(ds, keys: list[str], *, descending=None, out_col: str = "rn"):
    """Exact 1-based ``ROW_NUMBER() OVER (ORDER BY keys)`` for every row.

    The complement of ``global_rank``: that one is for bounded-cardinality
    columns (histogram broadcast, no sort); this one handles arbitrary /
    near-unique key tuples with Ray Data's native range-partitioned sort,
    then assigns contiguous global ordinals the way Spark's zipWithIndex
    does — per-block row counts (tiny remote tasks; blocks never leave the
    object store), an exclusive prefix sum on the driver (one int per
    block), and a per-block offset-add. Raw Ray tasks are used ONLY for the
    offset-add because ``map_batches`` cannot see a block's position in the
    dataset; everything stays zero-copy Arrow.

    Pass a key tuple that is unique per row (e.g. include the primary key
    as the last tiebreak) — otherwise ties get an arbitrary but
    deterministic-per-sort order, which is row_number semantics anyway.
    """
    import ray
    import ray.data as rd

    if descending is None:
        descending = [False] * len(keys)
    sorted_ds = ds.sort(keys, descending=descending).materialize()
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def _nrows(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([_nrows.remote(r) for r in refs])
    offsets = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])

    @ray.remote
    def _with_rn(t: pa.Table, off: int) -> pa.Table:
        rn = pa.array(np.arange(off + 1, off + 1 + t.num_rows, dtype=np.int64))
        return t.append_column(out_col, rn)

    out_refs = [_with_rn.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return rd.from_arrow_refs(out_refs)


def ntile_from_rn(rn: np.ndarray, total: int, tiles: int) -> np.ndarray:
    """SQL NTILE(tiles) from 1-based row numbers: the first ``total % tiles``
    buckets get one extra row (DuckDB/ANSI semantics)."""
    size, rem = divmod(total, tiles)
    big = rem * (size + 1)
    out = np.empty(len(rn), dtype=np.int64)
    in_big = rn <= big
    out[in_big] = (rn[in_big] - 1) // (size + 1) + 1
    if size:
        out[~in_big] = rem + (rn[~in_big] - 1 - big) // size + 1
    return out


def global_prefix_max(
    ds,
    order_keys: list[str],
    value_col: str,
    *,
    out_col: str = "prefix_max",
    descending=None,
):
    """Exact EXCLUSIVE running max of ``value_col`` in global ``order_keys``
    order — ``max(v) OVER (ORDER BY keys ROWS BETWEEN UNBOUNDED PRECEDING
    AND 1 PRECEDING)``, the watermark primitive of streaming systems (max
    event-time seen over strictly earlier ARRIVALS).

    A prefix scan looks inherently serial; distributed it is the
    zipWithIndex shape of ``global_row_number`` with a max instead of a
    count: range-partitioned sort, per-block maxima collected driver-side
    (ONE int per block), exclusive prefix over those block maxima, then a
    per-block vectorized cummax seeded with the carried-in prefix. Rows
    with no preceding row get NULL (SQL window semantics).
    """
    import ray
    import ray.data as rd

    if descending is None:
        descending = [False] * len(order_keys)
    sorted_ds = ds.sort(order_keys, descending=descending).materialize()
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def _block_max(t: pa.Table):
        if t.num_rows == 0:
            return None
        col = t.column(value_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # numpy scalar, not int(): preserves the value dtype (float columns
        # must not be truncated by the carry).
        return np.max(col.to_numpy(zero_copy_only=False))

    maxima = ray.get([_block_max.remote(r) for r in refs])
    carries: list = []
    cur = None
    for m in maxima:
        carries.append(cur)
        if m is not None:
            cur = m if cur is None else max(cur, m)

    @ray.remote
    def _with_prefix(t: pa.Table, carry) -> pa.Table:
        out_type = t.schema.field(value_col).type
        n = t.num_rows
        if n == 0:
            return t.append_column(out_col, pa.array([], type=out_type))
        col = t.column(value_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        v = col.to_numpy(zero_copy_only=False)
        cm = np.maximum.accumulate(v)
        out = np.empty(n, dtype=v.dtype)
        mask_valid = np.ones(n, dtype=bool)
        if carry is None:
            # Global first row: no preceding row -> NULL (value under the
            # mask is arbitrary).
            mask_valid[0] = False
            out[0] = v[0]
            if n > 1:
                out[1:] = cm[:-1]
        else:
            out[0] = carry
            if n > 1:
                out[1:] = np.maximum(carry, cm[:-1])
        return t.append_column(
            out_col, pa.array(out, type=out_type, mask=~mask_valid)
        )

    out_refs = [_with_prefix.remote(r, c) for r, c in zip(refs, carries)]
    return rd.from_arrow_refs(out_refs)
