"""Range (non-equi) join of a value column into a small interval table.

The band table is the classic broadcast-range-join small side (price
bands, latency buckets, score tiers): ship the sorted band bounds once
via ``ray.put`` and assign each row's band with ONE vectorized
``searchsorted`` per batch — no shuffle, no per-row Python.  Bands must
be non-overlapping and sorted; rows falling in no band are dropped
(inner-join semantics), matching the SQL ``JOIN bands ON v >= lo AND
v < hi`` oracle.

At 100 TB this is the right shape whenever the interval table fits in
the object store (bands, calendars, IP-geo ranges up to ~10^7 rows —
searchsorted is O(log n) per row on a shared zero-copy array).  An
interval table that is itself fact-sized needs an interval-partitioned
shuffle join instead, which no current pipeline requires.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class _BandAssign:
    def __init__(self, ref, value_col: str, band_col: str):
        import ray

        lo, hi, names = ray.get(ref)
        self.lo = lo
        self.hi = hi
        self.names = names
        self.value_col = value_col
        self.band_col = band_col

    def __call__(self, b: pa.Table) -> pa.Table:
        v = b.column(self.value_col).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(self.lo, v, side="right") - 1
        valid = (idx >= 0) & (v < self.hi[np.clip(idx, 0, len(self.hi) - 1)])
        idx = idx[valid]
        kept = b.filter(pa.array(valid))
        return kept.append_column(self.band_col, pa.array(self.names[idx]))


def band_join(
    ds,
    bands: list[tuple[float, float, str]],
    *,
    value_col: str,
    band_col: str = "band",
):
    """Dataset + [(lo, hi, name), ...] -> Dataset with ``band_col``
    attached; rows outside every [lo, hi) interval are dropped."""
    import ray

    from .taskstate import task_stage

    srt = sorted(bands)
    for (alo, ahi, _), (blo, _bhi, _n) in zip(srt, srt[1:]):
        if ahi > blo:
            raise ValueError(f"overlapping bands at lo={blo}")
    lo = np.array([b[0] for b in srt], dtype=np.float64)
    hi = np.array([b[1] for b in srt], dtype=np.float64)
    names = np.array([b[2] for b in srt])
    ref = ray.put((lo, hi, names))
    return ds.map_batches(
        task_stage(_BandAssign, ref=ref, value_col=value_col, band_col=band_col),
        batch_format="pyarrow",
    )
