"""Bucketed hash join (inner / left outer / left semi / left anti) —
ONE exchange, no actor pools.

Shape: tag-union both sides (each side pads the other's non-key columns
with typed nulls so the union schemas line up), ONE groupby shuffle on an
md5-derived bucket of the key tuple (kernel/md5vec — vectorized), then
Arrow's C++ ``Table.join`` (Acero) inside each bucket. Compared to Ray's
built-in ``Dataset.join`` this trades the hash-aggregator actor pool
(whole-pool spin-up per join; seconds of fixed cost at contract scale,
and schema-less empty-block crashes when an Aggregate feeds it) for the
repo's standard groupby exchange: same all-to-all volume, zero fixed
actor cost, empty blocks tolerated.

Per-bucket correctness for the one-sided types: every left row hashes to
exactly one bucket together with ALL right rows sharing its key, so a
bucket-local left outer / semi / anti answer is the global answer.

Pass ``left_types``/``right_types`` (column -> pyarrow DataType) when the
input is a lazy aggregate: ``Dataset.schema()`` on an un-executed
aggregate runs the whole upstream plan once just to learn the schema and
then AGAIN for the join — explicit types keep the plan single-execution.

Partitioning assumption: one bucket's rows (both sides) fit in a worker;
buckets are md5-uniform so the bound is ``n_rows / n_buckets``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _chunk(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _key_bucket(b: pa.Table, on: tuple[str, ...], n_buckets: int) -> pa.Array:
    from ..kernel.md5vec import md5_h64

    if len(on) == 1:
        key = pc.cast(_chunk(b.column(on[0])), pa.string())
    else:
        parts = [pc.cast(_chunk(b.column(c)), pa.string()) for c in on]
        key = pc.binary_join_element_wise(*parts, "\x00")
    h = md5_h64(key).astype(np.uint64)
    return pa.array((h % np.uint64(n_buckets)).astype(np.int64))


def bucketed_join(
    left,
    right,
    *,
    on: tuple[str, ...],
    n_buckets: int,
    join_type: str = "inner",
    left_types: dict | None = None,
    right_types: dict | None = None,
):
    """Equi-join of two Datasets on ``on``; non-key column names of the
    two sides must be disjoint. ``join_type``: "inner", "left outer",
    "left semi", "left anti" (Arrow Acero names). Semi/anti emit the
    left columns only."""
    if join_type not in (
        "inner", "left outer", "left semi", "left anti", "full outer"
    ):
        raise ValueError(f"unsupported join_type {join_type!r}")

    def sdict(ds, types):
        if types:
            return types
        sch = ds.schema()  # None <=> the dataset is verifiably empty
        return None if sch is None else dict(zip(sch.names, sch.types))

    lsch = sdict(left, left_types)
    rsch = sdict(right, right_types)
    # Empty-side degeneration (schema unknowable): empty left -> empty
    # result for every join type; empty right -> left unchanged for
    # outer/anti, empty-with-left-schema for inner/semi (the right-side
    # pad columns are unknowable and omitted from the empty result).
    if lsch is None or (rsch is None and join_type == "full outer"):
        if join_type == "full outer":
            # can't synthesize the absent side's null pad columns without
            # its schema; callers pass explicit types for full outer
            raise ValueError(
                "full outer join with an empty schema-less side needs "
                "explicit left_types/right_types"
            )
        return left
    if rsch is None:
        return left if join_type in ("left outer", "left anti") else left.limit(0)
    lonly = sorted(c for c in lsch if c not in on)
    ronly = sorted(c for c in rsch if c not in on)
    clash = set(lonly) & set(ronly)
    if clash:
        raise ValueError(f"non-key column name clash: {sorted(clash)}")
    order = [*on, *lonly, *ronly, "_side", "_bkt"]

    def tag(side: int, pad: dict):
        def f(b: pa.Table) -> pa.Table:
            n = b.num_rows
            cols = {c: _chunk(b.column(c)) for c in b.column_names}
            for c, t in pad.items():
                cols[c] = pa.nulls(n, type=t)
            cols["_side"] = pa.array(np.full(n, side, dtype=np.int8))
            cols["_bkt"] = _key_bucket(b, on, n_buckets)
            return pa.table({c: cols[c] for c in order})

        return f

    tagged = left.map_batches(
        tag(0, {c: rsch[c] for c in ronly}), batch_format="pyarrow"
    ).union(
        right.map_batches(tag(1, {c: lsch[c] for c in lonly}), batch_format="pyarrow")
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        side = _chunk(g.column("_side")).to_numpy(zero_copy_only=False)
        lt = g.take(pa.array(np.flatnonzero(side == 0))).select([*on, *lonly])
        rt = g.take(pa.array(np.flatnonzero(side == 1))).select([*on, *ronly])
        if join_type in ("left semi", "left anti"):
            rt = rt.select(list(on))  # keys only: membership test
        return lt.join(rt, keys=list(on), join_type=join_type)

    return tagged.groupby("_bkt").map_groups(per_bucket, batch_format="pyarrow")


def bucketed_inner_join(left, right, **kw):
    """Back-compat alias: ``bucketed_join(..., join_type="inner")``."""
    return bucketed_join(left, right, join_type="inner", **kw)
