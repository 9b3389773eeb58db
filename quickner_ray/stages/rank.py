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
