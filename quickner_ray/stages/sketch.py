"""Mergeable cardinality sketch (HyperLogLog) as a Ray Data aggregate.

Exact COUNT(DISTINCT) over 10^12 rows is a full shuffle on the key; an
HLL sketch replaces it with a per-batch partial whose size is bounded by
the register count.  The distributed shape here keeps everything in
ordinary Dataset operators — no custom aggregate plumbing:

  map_batches -> SPARSE partial registers (bucket, register), at most
  ``m`` rows per batch; then ONE groupby("bucket").max — a shuffle
  bounded by m=2^p distinct keys, independent of row count.

Everything is deterministic (md5-based h64 hash, Flajolet et al. 2007
register rule), so the register table has an EXACT SQL oracle: DuckDB
reproduces rho with string bit ops (bin + lpad + strpos — no float log,
which mis-rounds near 2^k-1).  The numpy side gets exact bit lengths
from ``frexp`` (values < 2^53 convert to float64 losslessly).

``hll_estimate`` turns a register table into the cardinality estimate
(standard bias correction + linear counting for small ranges); accuracy
is pinned by tests, the registers by the oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

P = 12  # 2^12 = 4096 registers; relative error ~1.04/sqrt(m) = 1.6%
M = 1 << P
_LOW_BITS = 64 - P
_LOW_MASK = np.uint64((1 << _LOW_BITS) - 1)


def _partial_registers(batch: pa.Table, col: str) -> pa.Table:
    """Batch -> sparse (bucket, register) partial: the per-batch max rho of
    each touched bucket."""
    from .dedup_approx import h64

    vals = batch.column(col)
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    if len(vals) == 0:
        return pa.table(
            {
                "bucket": pa.array([], type=pa.int64()),
                "register": pa.array([], type=pa.int64()),
            }
        )
    h = np.fromiter(
        (h64(s) for s in vals.cast(pa.string()).to_pylist()),
        dtype=np.uint64,
        count=len(vals),
    )
    bucket = (h >> np.uint64(_LOW_BITS)).astype(np.int64)
    low = h & _LOW_MASK
    # bit_length via frexp: ints < 2^53 are exact in float64, frexp returns
    # the exact exponent (log2 would round 2^k - 1 up and break rho by one)
    bitlen = np.frexp(low.astype(np.float64))[1]
    rho = np.where(low == 0, _LOW_BITS + 1, _LOW_BITS + 1 - bitlen).astype(
        np.int64
    )
    regs = np.zeros(M, dtype=np.int64)
    np.maximum.at(regs, bucket, rho)
    nz = np.flatnonzero(regs)
    return pa.table(
        {
            "bucket": pa.array(nz, type=pa.int64()),
            "register": pa.array(regs[nz], type=pa.int64()),
        }
    )


def hll_registers(ds, col: str):
    """Dataset -> Dataset(bucket, register): the merged HLL register table
    (one row per nonzero bucket)."""
    from ray.data.aggregate import Max

    partial = ds.map_batches(
        lambda b: _partial_registers(b, col), batch_format="pyarrow"
    )
    return partial.groupby("bucket").aggregate(Max("register", alias_name="register"))


def hll_estimate(registers: list[tuple[int, int]]) -> float:
    """(bucket, register) rows -> cardinality estimate: HLL harmonic mean
    with linear counting below the 2.5m small-range threshold."""
    regs = np.zeros(M, dtype=np.int64)
    for b, r in registers:
        regs[b] = r
    alpha = 0.7213 / (1 + 1.079 / M)
    est = alpha * M * M / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * M and zeros:
        est = M * np.log(M / zeros)
    return float(est)


def sql_hll_registers(col: str, table: str) -> str:
    """Exact oracle: same registers via string bit ops (see module doc)."""
    div = 1 << _LOW_BITS
    return (
        f"WITH hv AS (SELECT DISTINCT md5_number_upper(CAST({col} AS VARCHAR))"
        f" AS h FROM {table}),\n"
        f"parts AS (SELECT CAST(h // {div} AS BIGINT) AS bucket,\n"
        f"                 h % {div} AS low FROM hv),\n"
        f"rho AS (SELECT bucket, CASE WHEN low = 0 THEN {_LOW_BITS + 1}\n"
        f"  ELSE strpos(lpad(bin(low), {_LOW_BITS}, '0'), '1') END AS r\n"
        f"  FROM parts)\n"
        f"SELECT bucket, CAST(max(r) AS BIGINT) AS register FROM rho GROUP BY bucket"
    )
