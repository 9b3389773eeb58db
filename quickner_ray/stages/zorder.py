"""Z-order (Morton) interleaved sort keys for multi-column data clustering.

The storage-layout lever for 100 TB scan pruning: sorting/partitioning by a
single column gives perfect locality on that column and none on any other;
interleaving the bits of TWO columns (Morton 1966; the Z-ORDER BY of
Delta/Databricks and ClickHouse's mortonEncode) gives a total order whose
contiguous ranges are 2-D tiles, so range predicates on EITHER column — or
both — prune block min/max statistics effectively. Writing Parquet sorted
by ``zkey`` turns row-group stats into a quadtree without any index
structure.

``zorder_key16`` interleaves the low 16 bits of two int columns into a
32-bit key (bit i of A at position 2i, of B at 2i+1), fully vectorized via
the classic magic-mask bit-spread — and mirrored bit-for-bit by the
generated SQL's unrolled per-bit sum, so the driver hash-compares keys.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MASK16 = 0xFFFF


def _spread16(v: np.ndarray) -> np.ndarray:
    """16-bit values -> bits placed at even positions of a 32-bit word."""
    v = v.astype(np.int64) & MASK16
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def zorder_key16(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Morton-interleave (a & 0xFFFF, b & 0xFFFF) -> int64 z-keys."""
    return _spread16(a) | (_spread16(b) << 1)


def add_zorder_key(
    batch: pa.Table, a_col: str, b_col: str, *, out_col: str = "zkey"
) -> pa.Table:
    """Append the Morton key of (a_col & 0xFFFF, b_col & 0xFFFF)."""

    def _np(c):
        col = batch.column(c)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return col.to_numpy(zero_copy_only=False).astype(np.int64)

    z = zorder_key16(_np(a_col), _np(b_col))
    return batch.append_column(out_col, pa.array(z, type=pa.int64()))


def sql_zorder_expr(a_expr: str, b_expr: str) -> str:
    """Unrolled per-bit SQL mirror of :func:`zorder_key16`."""
    terms = []
    for i in range(16):
        terms.append(f"((({a_expr} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b_expr} >> {i}) & 1) << {2 * i + 1})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"
