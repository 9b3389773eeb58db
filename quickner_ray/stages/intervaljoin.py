"""Distributed interval-overlap join (interval x interval, both sides large).

The classic time-bucket decomposition: each half-open interval [s, e)
explodes to the day-buckets it covers, the two sides hash-join on the
composite (user_id, bucket) key, and a pair is kept only in the FIRST
bucket both intervals cover (``bucket == max(s1, s2) // W``) — so no
dedup shuffle is ever needed. Per-pair overlap is then computed
vectorized and zero-overlap pairs drop.

Scale shape: the only movement is the bucket-key hash join; explosion
factor is ceil(interval_len / W) rows per interval, so W is tuned to the
interval-length distribution (1 day here: sf events span 30 days, value
islands last <= ~6 days). Skewed users salt naturally because the join
key includes the bucket. Nothing is ever collected driver-side.

Reference anchor: the reference has no joins at all (SURVEY.md §2.5);
this is a north-rule extension operator (temporal-KG fact-validity
intersection: which observation sessions overlap which fact-validity
islands).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

BUCKET_US = 86_400_000_000  # 1 day


def explode_interval_buckets(
    b: pa.Table,
    s_col: str,
    e_col: str,
    *,
    w_us: int = BUCKET_US,
    keep: list[str],
) -> pa.Table:
    """One row per (interval, covering bucket). Intervals are half-open
    [s, e); empty / inverted intervals emit nothing. Vectorized repeat +
    cumulative-offset arange (no Python per-row loop)."""
    s = b.column(s_col).to_numpy(zero_copy_only=False).astype(np.int64)
    e = b.column(e_col).to_numpy(zero_copy_only=False).astype(np.int64)
    valid = e > s
    first = s // w_us
    last = (e - 1) // w_us
    n = np.where(valid, last - first + 1, 0)
    total = int(n.sum())
    idx = np.repeat(np.arange(len(s), dtype=np.int64), n)
    # intra-interval bucket ordinal: arange per row via offset subtraction
    starts = np.cumsum(n) - n
    intra = np.arange(total, dtype=np.int64) - np.repeat(starts, n)
    bucket = first[idx] + intra
    cols = {name: b.column(name).take(pa.array(idx)) for name in keep}
    cols["bucket"] = pa.array(bucket, type=pa.int64())
    return pa.Table.from_pydict(cols)


def interval_overlap_join(
    left,
    right,
    *,
    key_col: str = "user_id",
    left_cols: tuple[str, str, str] = ("session_id", "start_us", "end_us"),
    right_cols: tuple[str, str, str] = ("island_id", "start_us", "end_us"),
    w_us: int = BUCKET_US,
    num_partitions: int = 8,
):
    """left x right interval-overlap join per key.

    ``left_cols`` / ``right_cols`` = (id, start, end); both interval sets
    are half-open [start, end). Returns a Dataset with
    (key, left_id, right_id, overlap_us), overlap_us > 0.
    """
    lid, ls, le = left_cols
    rid, rs, re_ = right_cols

    def prep_left(b: pa.Table) -> pa.Table:
        t = pa.Table.from_pydict(
            {
                key_col: b.column(key_col),
                lid: b.column(lid),
                "l_s": b.column(ls).cast(pa.int64()),
                "l_e": b.column(le).cast(pa.int64()),
            }
        )
        return explode_interval_buckets(
            t, "l_s", "l_e", w_us=w_us, keep=[key_col, lid, "l_s", "l_e"]
        )

    def prep_right(b: pa.Table) -> pa.Table:
        t = pa.Table.from_pydict(
            {
                "r_key": b.column(key_col),
                rid: b.column(rid),
                "r_s": b.column(rs).cast(pa.int64()),
                "r_e": b.column(re_).cast(pa.int64()),
            }
        )
        t = explode_interval_buckets(
            t, "r_s", "r_e", w_us=w_us, keep=["r_key", rid, "r_s", "r_e"]
        )
        return t.rename_columns(["r_key", rid, "r_s", "r_e", "r_bucket"])

    lex = left.map_batches(prep_left, batch_format="pyarrow")
    rex = right.map_batches(prep_right, batch_format="pyarrow")
    joined = lex.join(
        rex,
        "inner",
        num_partitions=num_partitions,
        on=(key_col, "bucket"),
        right_on=("r_key", "r_bucket"),
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.Table.from_pydict(
                {
                    key_col: pa.array([], type=pa.int64()),
                    lid: pa.array([], type=pa.int64()),
                    rid: pa.array([], type=pa.int64()),
                    "overlap_us": pa.array([], type=pa.int64()),
                }
            )
        l_s = b.column("l_s").to_numpy(zero_copy_only=False)
        l_e = b.column("l_e").to_numpy(zero_copy_only=False)
        r_s = b.column("r_s").to_numpy(zero_copy_only=False)
        r_e = b.column("r_e").to_numpy(zero_copy_only=False)
        bucket = b.column("bucket").to_numpy(zero_copy_only=False)
        lo = np.maximum(l_s, r_s)
        hi = np.minimum(l_e, r_e)
        overlap = hi - lo
        # keep each pair exactly once: only in the first shared bucket
        keep = (overlap > 0) & (bucket == lo // w_us)
        kidx = pa.array(np.flatnonzero(keep))
        return pa.Table.from_pydict(
            {
                key_col: b.column(key_col).take(kidx),
                lid: b.column(lid).take(kidx),
                rid: b.column(rid).take(kidx),
                "overlap_us": pa.array(overlap[keep], type=pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")
