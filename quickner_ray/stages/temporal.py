"""Temporal-KG operators: SCD2 validity intervals, a generalized multi-key
as-of join, and truth-discovery majority vote across sources.

All three share one distribution shape — the operators Ray Data has no
primitive for (SURVEY.md §4 custom-operator rule (a)): hash the rows into
a bounded number of PARTITION BUCKETS on an integer key column, shuffle
ONCE with ``groupby(bucket).map_groups``, and run a fully vectorized
multi-key kernel (Arrow ``sort_by`` + numpy flag/reduceat passes) over
each whole bucket. Bucketing — instead of grouping on the real key —
avoids the many-tiny-groups trap (one Python call per (subject, attr)
key) while keeping every key's rows co-located; the kernel handles ALL
keys in the bucket in one pass.

Partitioning assumption: one bucket's rows fit in a worker. Buckets are
uniform (multiplicative hash of the subject id), so the bound is
``n_rows / n_buckets``; size ``n_buckets`` to the cluster (default 64 is
right for the test scales; at 100 TB raise it so a bucket is ~a block).

No counterpart in the reference (quickner is a single-snapshot NER
annotator); these are the temporal/fusion layer a KG build needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _default_buckets() -> int:
    """Bucket count sized to the cluster: ~4 buckets per CPU (floor 64) so
    the one shuffle parallelizes across every worker while each bucket
    stays a single vectorized kernel call. Output values are
    bucket-count-invariant (pinned by tests), so auto-sizing is safe."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 16))
    except Exception:
        cpus = 16
    return max(64, cpus * 4)


def _chunk(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _add_bucket(ds, bucket_key: str, n_buckets: int):
    """Uniform partition bucket from an int64 key column (splitmix-style
    multiplicative hash so dense ids don't stride the buckets)."""

    def f(b: pa.Table) -> pa.Table:
        k = _chunk(b.column(bucket_key)).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ).astype(np.uint64)
        h = (k * _MIX) >> np.uint64(33)
        return b.append_column(
            "_bkt", pa.array((h % np.uint64(n_buckets)).astype(np.int64))
        )

    return ds.map_batches(f, batch_format="pyarrow")


def _new_flags(t: pa.Table, cols: list[str]) -> np.ndarray:
    """Boolean row mask: row i differs from row i-1 on any of ``cols``
    (row 0 always True). Vectorized: one shifted Arrow compare per col."""
    n = t.num_rows
    new = np.zeros(n, dtype=bool)
    if n == 0:
        return new
    new[0] = True
    for c in cols:
        arr = _chunk(t.column(c))
        ne = pc.not_equal(arr.slice(1), arr.slice(0, n - 1))
        new[1:] |= ne.to_numpy(zero_copy_only=False)
    return new


def islands_by_key(
    ds,
    *,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    bucket_key: str | None = None,
    n_buckets: int | None = None,
):
    """SCD2 collapse (gaps-and-islands): consecutive observations of the
    same ``value_col`` per key — ordered by ``order_col`` — fold into one
    row (key..., value, valid_from, valid_to, n_snaps). A value that
    reverts later starts a NEW island (change detection, not distinct)."""
    bucket_key = bucket_key or key_cols[0]
    n_buckets = n_buckets or _default_buckets()
    sort_spec = [(c, "ascending") for c in [*key_cols, order_col]]
    out_keys = [*key_cols, value_col]

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["_bkt"]).sort_by(sort_spec)
        n = t.num_rows
        new = _new_flags(t, [*key_cols, value_col])
        starts = np.flatnonzero(new)
        bounds = np.r_[starts[1:], n]
        ends = bounds - 1
        ordv = _chunk(t.column(order_col))
        cols = {c: _chunk(t.column(c)).take(pa.array(starts)) for c in out_keys}
        cols["valid_from"] = ordv.take(pa.array(starts))
        cols["valid_to"] = ordv.take(pa.array(ends))
        cols["n_snaps"] = pa.array((bounds - starts).astype(np.int64))
        return pa.table(cols)

    return (
        _add_bucket(ds, bucket_key, n_buckets)
        .groupby("_bkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def island_counts(
    ds,
    *,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    bucket_key: str | None = None,
    n_buckets: int | None = None,
):
    """Per composite key: how many value islands (= 1 + number of value
    changes) its observation sequence contains. Same bucket kernel as
    ``islands_by_key`` but collapses straight to (key..., n_islands) —
    one atomic row per key, so downstream per-attr rollups can combine
    per batch without split-key risk."""
    bucket_key = bucket_key or key_cols[0]
    n_buckets = n_buckets or _default_buckets()
    sort_spec = [(c, "ascending") for c in [*key_cols, order_col]]

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["_bkt"]).sort_by(sort_spec)
        new_island = _new_flags(t, [*key_cols, value_col])
        new_key = _new_flags(t, key_cols)
        k_starts = np.flatnonzero(new_key)
        # islands per key: count island starts within each key segment
        n_islands = np.add.reduceat(new_island.astype(np.int64), k_starts)
        cols = {c: _chunk(t.column(c)).take(pa.array(k_starts)) for c in key_cols}
        cols["n_islands"] = pa.array(n_islands)
        return pa.table(cols)

    return (
        _add_bucket(ds, bucket_key, n_buckets)
        .groupby("_bkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def asof_join(
    left,
    right,
    *,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    carry_cols: list[str],
    bucket_key: str | None = None,
    n_buckets: int | None = None,
):
    """Generalized multi-key left as-of join: for each left row
    (key..., left_ts) attach the right row with the greatest
    ``right_ts <= left_ts`` for the same composite key (ties include the
    equal-ts right row). Emits (key..., left_ts, carry..., value...[,
    null when no right row precedes]).

    Shape: tag both sides, ``union``, ONE bucket shuffle, then a
    last-right-seen scan per bucket (maximum.accumulate over right-row
    indices, segment-guarded at key boundaries) — no per-key Python."""
    bucket_key = bucket_key or key_cols[0]
    n_buckets = n_buckets or _default_buckets()

    def tag(side: int, vcols_from: pa.Table | None = None):
        def f(b: pa.Table) -> pa.Table:
            n = b.num_rows
            cols = {c: _chunk(b.column(c)) for c in key_cols}
            cols["_ts"] = _chunk(
                b.column(left_ts if side else right_ts)
            ).cast(pa.int64())
            cols["_side"] = pa.array(np.full(n, side, dtype=np.int8))
            for c in carry_cols:
                cols[c] = (
                    _chunk(b.column(c))
                    if side
                    else pa.nulls(n, type=_carry_types[c])
                )
            for c in value_cols:
                cols[c] = (
                    pa.nulls(n, type=_value_types[c])
                    if side
                    else _chunk(b.column(c))
                )
            return pa.table(cols)

        return f

    # resolve column types once from the datasets' schemas (null columns on
    # the opposite side must agree for the union)
    ltypes = dict(zip(left.schema().names, left.schema().types))
    rtypes = dict(zip(right.schema().names, right.schema().types))
    _carry_types = {c: ltypes[c] for c in carry_cols}
    _value_types = {c: rtypes[c] for c in value_cols}

    tagged = left.map_batches(tag(1), batch_format="pyarrow").union(
        right.map_batches(tag(0), batch_format="pyarrow")
    )
    sort_spec = (
        [(c, "ascending") for c in key_cols]
        + [
            ("_ts", "ascending"),
            ("_side", "ascending"),  # right (0) before left (1) at equal ts
        ]
        # deterministic tie-break when SEVERAL right rows share right_ts:
        # the greatest value tuple wins (last-in-sort-order is what the
        # accumulate picks). Left rows are unaffected: their value cols
        # are all-null, and _side already separates the two groups.
        + [(c, "ascending") for c in value_cols]
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["_bkt"]).sort_by(sort_spec)
        n = t.num_rows
        side = _chunk(t.column("_side")).to_numpy(zero_copy_only=False)
        # last right-row index at or before each row, within the bucket
        ridx = np.where(side == 0, np.arange(n, dtype=np.int64), -1)
        np.maximum.accumulate(ridx, out=ridx)
        # segment (composite-key) starts guard against cross-key leakage
        new = _new_flags(t, key_cols)
        starts = np.flatnonzero(new)
        seg_first = starts[np.cumsum(new) - 1]
        hit = ridx >= seg_first
        lmask = side == 1
        l_hit = hit[lmask]
        match = ridx[lmask].astype(object)
        match[~l_hit] = None
        take_idx = pa.array(match, type=pa.int64())
        lsel = pa.array(np.flatnonzero(lmask))
        cols = {c: _chunk(t.column(c)).take(lsel) for c in key_cols}
        cols[left_ts] = _chunk(t.column("_ts")).take(lsel)
        for c in carry_cols:
            cols[c] = _chunk(t.column(c)).take(lsel)
        for c in value_cols:
            cols[c] = _chunk(t.column(c)).take(take_idx)
        return pa.table(cols)

    return (
        _add_bucket(tagged, bucket_key, n_buckets)
        .groupby("_bkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def majority_vote(
    ds,
    *,
    key_cols: list[str],
    value_col: str,
    source_col: str,
    bucket_key: str | None = None,
    n_buckets: int | None = None,
):
    """Truth discovery over multi-source fact assertions: per composite
    key, the value asserted by the most DISTINCT sources wins (ties break
    to the lexicographically smallest value — deterministic, so the SQL
    oracle hash-matches). Emits (key..., n_sources, n_values,
    majority_value, support, conflict).

    A batch-local distinct (key, value, source) combiner runs BEFORE the
    bucket shuffle, so duplicate assertions never hit the wire — at corpus
    scale the shuffled volume is bounded by the distinct-assertion set."""
    bucket_key = bucket_key or key_cols[0]
    n_buckets = n_buckets or _default_buckets()
    triple = [*key_cols, value_col, source_col]
    tsort = [(c, "ascending") for c in triple]

    def local_distinct(b: pa.Table) -> pa.Table:
        t = b.select(triple).sort_by(tsort)
        keep = np.flatnonzero(_new_flags(t, triple))
        return t.take(pa.array(keep))

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["_bkt"]).sort_by(tsort)
        d = t.take(pa.array(np.flatnonzero(_new_flags(t, triple))))
        nd = d.num_rows
        # per (key, value): distinct-source support
        kv_new = _new_flags(d, [*key_cols, value_col])
        kv_starts = np.flatnonzero(kv_new)
        support = np.r_[kv_starts[1:], nd] - kv_starts
        kv = d.take(pa.array(kv_starts)).select([*key_cols, value_col])
        # per key: n_values, n_sources, winner
        k_new_kv = _new_flags(kv, key_cols)
        k_starts = np.flatnonzero(k_new_kv)
        n_values = np.r_[k_starts[1:], len(kv)] - k_starts
        # n_sources must be count(DISTINCT source) per key — a source
        # asserting two values may not count twice, so distinct
        # (key, source) needs its own sort (d is sorted key, value, source)
        ks = d.select([*key_cols, source_col]).sort_by(
            [(c, "ascending") for c in [*key_cols, source_col]]
        )
        ks_keep = _new_flags(ks, [*key_cols, source_col])
        ks_d = ks.take(pa.array(np.flatnonzero(ks_keep)))
        ksk_new = _new_flags(ks_d, key_cols)
        ksk_starts = np.flatnonzero(ksk_new)
        n_sources = np.r_[ksk_starts[1:], ks_d.num_rows] - ksk_starts
        # winner per key: kv rows sorted by (key, value asc); order by
        # support desc then value asc -> stable lexsort over segment ids
        seg = np.cumsum(k_new_kv) - 1
        order = np.lexsort((np.arange(len(kv)), -support, seg))
        ordered_seg = seg[order]
        first = np.flatnonzero(np.r_[True, ordered_seg[1:] != ordered_seg[:-1]])
        win = order[first]  # one index into kv per key, in seg order
        keys_t = kv.take(pa.array(k_starts)).select(key_cols)
        cols = {c: _chunk(keys_t.column(c)) for c in key_cols}
        cols["n_sources"] = pa.array(n_sources.astype(np.int64))
        cols["n_values"] = pa.array(n_values.astype(np.int64))
        cols["majority_value"] = _chunk(kv.column(value_col)).take(pa.array(win))
        cols["support"] = pa.array(support[win].astype(np.int64))
        cols["conflict"] = pa.array((n_values > 1).astype(np.int64))
        return pa.table(cols)

    pre = ds.map_batches(local_distinct, batch_format="pyarrow")
    return (
        _add_bucket(pre, bucket_key, n_buckets)
        .groupby("_bkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
