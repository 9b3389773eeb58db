"""Sorted-neighborhood blocking (entity-resolution candidate generation).

The classic record-linkage blocking method: sort all records globally by
a normalized blocking key, then pair every record with its next
``window`` neighbors in that order — near-identical keys land adjacent
regardless of which hash bucket they would fall into (the advantage over
hash blocking when keys have typos in any position).

Distributed shape: one range-partitioned global sort with exact
ordinals (rank.global_row_number — the only all-to-all), then the
window pairing as a BUCKETED self-join with no dedup step at all: each
record-as-point lives in exactly one rn-bucket of width window+1, each
record-as-window explodes to the <=2 buckets its window covers, and a
qualifying pair meets in precisely the point's bucket. Pair volume is
n * window by construction — the bound that makes the method usable at
10^12 records (vs the unbounded quadratic of a key-equality self-join
on skewed keys).

Reference anchor: none (the reference has no joins, SURVEY.md §2.5) —
north-rule extension (entity canonicalization candidate generation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .intervaljoin import explode_interval_buckets


def sorted_neighborhood_pairs(
    ds,
    key_cols: list[str],
    id_col: str,
    *,
    window: int = 5,
    num_partitions: int = 8,
):
    """Dataset -> candidate pairs (id_a, id_b, dist) with
    ``1 <= dist <= window`` in the global (key_cols, id_col) sort order.
    ``id_col`` must be unique per row (it is the ordinal tiebreak)."""
    from .rank import global_row_number

    w1 = window + 1
    r = global_row_number(ds, list(key_cols) + [id_col], out_col="rn").materialize()

    def prep_left(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "l_rn": pa.array([], type=pa.int64()),
                    "bucket": pa.array([], type=pa.int64()),
                }
            )
        rn = b.column("rn").to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table(
            {
                "id_a": b.column(id_col),
                "l_rn": pa.array(rn, type=pa.int64()),
                "w_s": pa.array(rn + 1, type=pa.int64()),
                "w_e": pa.array(rn + w1, type=pa.int64()),
            }
        )
        return explode_interval_buckets(
            t, "w_s", "w_e", w_us=w1, keep=["id_a", "l_rn"]
        )

    def prep_right(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "id_b": pa.array([], type=pa.int64()),
                    "r_rn": pa.array([], type=pa.int64()),
                    "r_bucket": pa.array([], type=pa.int64()),
                }
            )
        rn = b.column("rn").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "id_b": b.column(id_col),
                "r_rn": pa.array(rn, type=pa.int64()),
                "r_bucket": pa.array(rn // w1, type=pa.int64()),
            }
        )

    lex = r.map_batches(prep_left, batch_format="pyarrow")
    rex = r.map_batches(prep_right, batch_format="pyarrow")
    joined = lex.join(
        rex,
        "inner",
        num_partitions=num_partitions,
        on=("bucket",),
        right_on=("r_bucket",),
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                    "dist": pa.array([], type=pa.int64()),
                }
            )
        l_rn = b.column("l_rn").to_numpy(zero_copy_only=False)
        r_rn = b.column("r_rn").to_numpy(zero_copy_only=False)
        dist = r_rn - l_rn
        keep = (dist >= 1) & (dist <= window)
        kidx = pa.array(np.flatnonzero(keep))
        return pa.table(
            {
                "id_a": b.column("id_a").take(kidx),
                "id_b": b.column("id_b").take(kidx),
                "dist": pa.array(dist[keep], type=pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")
