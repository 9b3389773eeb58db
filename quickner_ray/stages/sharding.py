"""Consistent-hashing shard planner (partition assignment that survives
resizes).

Plain ``hash(key) % N`` reassigns ~(N-1)/N of all keys when N changes —
a full data movement on every cluster resize. The consistent-hash ring
(Karger et al. 1997) bounds movement to ~1/(N+1): each shard owns
``VNODES`` pseudo-random points on a 64-bit ring; a key belongs to the
first vnode clockwise from its own hash (wrapping). Assignment is a
pure function of (key, ring), so the planner is a zero-shuffle batch
map: the ring (shards x vnodes ints — bytes, not data) broadcasts, each
batch does one vectorized ``searchsorted`` against it.

Everything derives from the shared md5 h64 (== DuckDB
``md5_number_upper``), so the SQL oracle rebuilds the identical ring
from literals and reproduces every assignment value-exactly.

Reference anchor: none — north-rule extension (explicit partitioning
design: deterministic shard layout that keeps checkpoint/resume
shard-pure across cluster resizes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

N_SHARDS = 8
VNODES = 8


def ring_points(n_shards: int = N_SHARDS, vnodes: int = VNODES) -> list[tuple[int, int]]:
    """Sorted (ring_hash, shard) vnode points."""
    from .dedup_approx import h64

    pts = [
        (h64(f"shard{s}:v{v}"), s)
        for s in range(n_shards)
        for v in range(vnodes)
    ]
    pts.sort()
    return pts


def assign_shards(
    ds, key_col: str, *, n_shards: int = N_SHARDS, vnodes: int = VNODES
):
    """Dataset -> (key, key_h, shard): consistent-hash shard per distinct
    key value. Zero shuffles; the ring is a broadcast constant."""
    from .dedup_approx import h64

    pts = ring_points(n_shards, vnodes)
    ring_h = np.array([p[0] for p in pts], dtype=np.uint64)
    ring_s = np.array([p[1] for p in pts], dtype=np.int64)

    def f(b: pa.Table) -> pa.Table:
        keys = b.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if len(keys) == 0:
            return pa.table(
                {
                    key_col: pa.array([], type=pa.string()),
                    "key_h": pa.array([], type=pa.int64()),
                    "shard": pa.array([], type=pa.int64()),
                }
            )
        kl = keys.cast(pa.string()).to_pylist()
        h = np.fromiter((h64(s) for s in kl), dtype=np.uint64, count=len(kl))
        # first vnode with ring_hash >= key hash, wrapping to the ring start
        idx = np.searchsorted(ring_h, h, side="left")
        idx[idx == len(ring_h)] = 0
        return pa.table(
            {
                key_col: keys.cast(pa.string()),
                "key_h": pa.array(h.astype(np.int64), type=pa.int64()),
                "shard": pa.array(ring_s[idx], type=pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def sql_assign_shards(
    key_expr: str, table: str, *, n_shards: int = N_SHARDS, vnodes: int = VNODES
) -> str:
    """Oracle: the ring inlined as literals, assignment via the min
    ring-hash >= key-hash (wrapping to the global ring minimum).
    Hashes compare as HUGEINT (md5_number_upper is unsigned 64-bit);
    key_h is emitted wrapped to signed BIGINT to match the numpy side."""
    pts = ring_points(n_shards, vnodes)
    rows = ", ".join(f"({h}, {s})" for h, s in pts)
    first_h, first_s = pts[0]
    return (
        f"WITH ring(vh, shard) AS (VALUES {rows}),\n"
        f"k AS (SELECT {key_expr} AS key,\n"
        f"  md5_number_upper(CAST({key_expr} AS VARCHAR)) AS h FROM {table}),\n"
        f"a AS (SELECT k.key, k.h,\n"
        f"  (SELECT r.shard FROM ring r WHERE r.vh >= k.h\n"
        f"   ORDER BY r.vh LIMIT 1) AS shard0\n"
        f"  FROM k)\n"
        f"SELECT key, CAST(h - CASE WHEN h >= 9223372036854775808 THEN\n"
        f"    18446744073709551616 ELSE 0 END AS BIGINT) AS key_h,\n"
        f"  CAST(COALESCE(shard0, {first_s}) AS BIGINT) AS shard\n"
        f"FROM a"
    )
