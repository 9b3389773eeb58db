"""Distributed 2-D skyline (Pareto frontier), both dimensions maximize.

A row survives iff no other row is >= in both dimensions and > in at
least one (exact duplicates of a frontier point all survive — neither
dominates the other). The distributed shape is the textbook one:

  local skyline per batch (a batch-dominated row is globally dominated,
  so the combiner is lossless) -> coalesce the small partials to one
  block -> final skyline pass.

The per-pass kernel is fully vectorized: lexsort by (x desc, y desc),
per-x-group max-y via reduceat, strict prefix max across groups. The
only data movement is the partial-skyline coalesce, whose size is the
frontier cardinality (O(sqrt-ish of n for random data), never the
corpus.

Reference anchor: no counterpart (the reference has no ranking ops at
all, SURVEY.md §2.6) — north-rule extension operator (multi-criteria
document/host selection: e.g. pick crawl hosts maximizing both quality
and volume).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def skyline_mask_2d(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean survivor mask for the maximize/maximize skyline."""
    n = len(x)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-y, -x))  # x desc, then y desc
    xs, ys = x[order], y[order]
    # group boundaries where x changes (xs is non-increasing)
    new_group = np.empty(n, dtype=bool)
    new_group[0] = True
    np.not_equal(xs[1:], xs[:-1], out=new_group[1:])
    starts = np.flatnonzero(new_group)
    gmax = ys[starts]  # ys is desc within each x group -> first is the max
    # strict prefix max of previous groups' maxes; the first (max-x) group
    # is always on the frontier, so no dtype-dependent sentinel is needed
    # (works for signed, unsigned and float y alike)
    group_alive = np.empty(len(starts), dtype=bool)
    group_alive[0] = True
    if len(starts) > 1:
        group_alive[1:] = gmax[1:] > np.maximum.accumulate(gmax[:-1])
    gid = np.cumsum(new_group) - 1
    # survive: group alive AND y equals the group max
    alive_sorted = group_alive[gid] & (ys == gmax[gid])
    mask = np.zeros(n, dtype=bool)
    mask[order] = alive_sorted
    return mask


def _skyline_batch(b: pa.Table, x_col: str, y_col: str) -> pa.Table:
    x = b.column(x_col).to_numpy(zero_copy_only=False)
    y = b.column(y_col).to_numpy(zero_copy_only=False)
    keep = skyline_mask_2d(x, y)
    return b.filter(pa.array(keep))


def skyline_2d(ds, x_col: str, y_col: str):
    """Dataset -> its 2-D maximize/maximize Pareto frontier (all columns
    of frontier rows preserved)."""
    partial = ds.map_batches(
        lambda b: _skyline_batch(b, x_col, y_col), batch_format="pyarrow"
    )
    # partials are frontier-sized; one block finishes exactly
    return partial.repartition(1).map_batches(
        lambda b: _skyline_batch(b, x_col, y_col), batch_format="pyarrow"
    )
