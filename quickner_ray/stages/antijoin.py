"""Distributed anti-join: drop rows of a corpus-scale Dataset whose key
appears in a drop-key Dataset.

The near-dup drop set is corpus-proportional for web text (30-50% dup rate),
so collecting it on the driver with ``take_all()`` does not scale. Two
scale-safe shapes, chosen by measuring the (already small, distributed)
drop side:

- **broadcast** (drop side below ``broadcast_cap`` keys): distinct keys are
  shipped once via ``ray.put`` as an Arrow array; each batch filters with a
  vectorized ``pc.is_in`` (no shuffle of the big side — the cheap path when
  the drop rate is low).
- **shuffle** (otherwise): Ray Data's hash-partitioned ``left_anti`` join —
  both sides shuffle on the key, each partition anti-joins independently
  (bounded memory per partition; the 100 TB path). With
  ``bloom_prefilter=True`` a Bloom filter of the drop keys (~10 bits/key
  vs 64+ for the keys themselves) is broadcast first and only the
  POSSIBLY-dropped rows enter the shuffle; definite non-members — the vast
  majority when the drop rate is moderate — pass through shuffle-free, and
  the join itself removes the false positives (exact verification).

The drop side is ``materialize()``d to count it — that is the small side by
construction (pairs/ids, never the corpus), so the materialization is
bounded and reused by whichever path runs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_BROADCAST_CAP = 2_000_000  # keys; ~16 MB of int64 per executor

BLOOM_BITS_PER_KEY = 10  # ~1% false-positive rate at k=7 probes
BLOOM_PROBES = 7


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — avalanche int keys into uniform uint64."""
    with np.errstate(over="ignore"):
        x = x.astype(np.uint64, copy=True)
        x += np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _key_hashes(col: pa.Array) -> np.ndarray:
    """Column -> uint64 hashes (ints mixed directly; strings via the
    batch-vectorized md5 kernel — value-identical to dedup_approx.h64)."""
    if pa.types.is_integer(col.type):
        return _mix64(col.cast(pa.int64()).to_numpy(zero_copy_only=False))
    from ..kernel.md5vec import md5_h64

    return md5_h64(col.cast(pa.string()))


def _bloom_probes(h: np.ndarray, m_bits: int):
    """Double hashing: probe_i = (h1 + i*h2) mod m. Yields (word, bit)."""
    with np.errstate(over="ignore"):
        h1 = h
        h2 = _mix64(h) | np.uint64(1)
        for i in range(BLOOM_PROBES):
            p = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
            yield (p >> np.uint64(6)).astype(np.int64), np.uint64(1) << (
                p & np.uint64(63)
            )


def bloom_build(hashes: np.ndarray, n_keys: int) -> np.ndarray:
    m_bits = max(64, 1 << int(np.ceil(np.log2(max(n_keys, 1) * BLOOM_BITS_PER_KEY))))
    bits = np.zeros(m_bits // 64, dtype=np.uint64)
    for word, bit in _bloom_probes(hashes, m_bits):
        np.bitwise_or.at(bits, word, bit)
    return bits


def bloom_contains(bits: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    m_bits = len(bits) * 64
    out = np.ones(len(hashes), dtype=bool)
    for word, bit in _bloom_probes(hashes, m_bits):
        out &= (bits[word] & bit) != 0
    return out


def anti_join(
    ds,
    key: str,
    drop_ds,
    drop_key: str | None = None,
    *,
    broadcast_cap: int = DEFAULT_BROADCAST_CAP,
    num_partitions: int | None = None,
    bloom_prefilter: bool = True,
):
    """``ds`` minus rows whose ``key`` appears in ``drop_ds[drop_key]``.

    Returns a lazy Dataset with ``ds``'s columns (order preserved within
    blocks on the broadcast path; the shuffle path repartitions by key).
    """
    import ray

    drop_key = drop_key or key
    small = drop_ds.select_columns([drop_key]).materialize()
    n_drop = small.count()

    if n_drop <= broadcast_cap:
        # distinct driver-side is bounded by broadcast_cap rows (checked);
        # blocks come back as Arrow tables — no Python-dict row conversion
        import logging

        logging.getLogger(__name__).info(
            "anti_join: broadcast path (%d drop keys <= cap %d)", n_drop, broadcast_cap
        )
        if n_drop:
            # drop empty blocks: groupby stages can emit zero-row blocks
            # whose schema is empty, which concat_tables rejects
            blocks = [t for t in ray.get(small.to_arrow_refs()) if t.num_rows]
            tab = pa.concat_tables(blocks)
            values = pc.unique(tab.column(drop_key).combine_chunks())
        else:
            values = pa.array([])
        ref = ray.put(values)

        class DropByKey:
            def __init__(self, ref):
                self.values = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

            def __call__(self, b: pa.Table) -> pa.Table:
                if len(self.values) == 0:
                    return b
                col = b.column(key)
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                mask = pc.invert(pc.is_in(col, value_set=self.values))
                return b.filter(mask)

        from .taskstate import task_stage

        return ds.map_batches(
            task_stage(DropByKey, ref=ref), batch_format="pyarrow"
        )

    # hash-partitioned anti-join: both sides shuffle on the key, partitions
    # anti-join independently — drop side never lands on the driver
    if num_partitions is None:
        num_partitions = max(8, small.num_blocks())
    right = small
    if drop_key != key:
        right = right.map_batches(
            lambda b: b.rename_columns([key]), batch_format="pyarrow"
        )
    if not bloom_prefilter:
        return ds.join(right, "left_anti", num_partitions, on=(key,))

    # Bloom prefilter: stream the (small) drop side's key hashes into one
    # bitmap (driver memory = bitmap + one block; at extreme drop-set sizes
    # switch to OR-merging per-block bitmaps), broadcast it, and send only
    # bloom-POSSIBLE rows into the shuffle. The left_anti join then drops
    # the true members; bloom false positives (~1%) survive it unharmed.
    # Trade-off made explicit: the corpus is SCANNED twice (clean pass +
    # candidate pass — columnar, pruned, shuffle-free) so that only the
    # candidate fraction pays the all-to-all exchange; at web-scale drop
    # rates that exchange, not the re-read, is the bottleneck.
    bits = np.zeros(
        max(
            64, 1 << int(np.ceil(np.log2(max(n_drop, 1) * BLOOM_BITS_PER_KEY)))
        )
        // 64,
        dtype=np.uint64,
    )
    for blk_ref in small.to_arrow_refs():
        blk = ray.get(blk_ref)
        if not blk.num_rows:
            continue
        col = blk.column(drop_key)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = _key_hashes(col)
        for word, bit in _bloom_probes(h, len(bits) * 64):
            np.bitwise_or.at(bits, word, bit)
    bits_ref = ray.put(bits)
    cols = ds.schema().names

    def split(maybe: bool):
        def fn(b: pa.Table) -> pa.Table:
            col = b.column(key)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            member = bloom_contains(ray.get(bits_ref), _key_hashes(col))
            return b.filter(pa.array(member if maybe else ~member))

        fn.__name__ = f"bloom_{'candidates' if maybe else 'pass'}"
        return fn

    clean = ds.map_batches(split(False), batch_format="pyarrow")
    candidates = ds.map_batches(split(True), batch_format="pyarrow")
    joined = candidates.join(right, "left_anti", num_partitions, on=(key,))
    return clean.union(joined.select_columns(cols))


def semi_join(
    ds,
    key: str,
    keep_ds,
    keep_key: str | None = None,
    *,
    broadcast_cap: int = DEFAULT_BROADCAST_CAP,
    num_partitions: int | None = None,
):
    """Complement of ``anti_join``: KEEP rows of ``ds`` whose ``key`` appears
    in ``keep_ds[keep_key]`` (distributed semi-join). Same two shapes:
    broadcast ``is_in`` below the cap, hash-partitioned ``left_semi`` above
    (a Bloom prefilter is unnecessary here — the semi-join output IS the
    bloom-possible set, so prefiltering saves nothing on the kept side)."""
    import ray

    keep_key = keep_key or key
    small = keep_ds.select_columns([keep_key]).materialize()
    n_keep = small.count()

    if n_keep <= broadcast_cap:
        if n_keep:
            blocks = [t for t in ray.get(small.to_arrow_refs()) if t.num_rows]
            tab = pa.concat_tables(blocks)
            values = pc.unique(tab.column(keep_key).combine_chunks())
        else:
            values = pa.array([])
        ref = ray.put(values)

        class KeepByKey:
            def __init__(self, ref):
                self.values = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

            def __call__(self, b: pa.Table) -> pa.Table:
                if len(self.values) == 0:
                    return b.slice(0, 0)
                col = b.column(key)
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                return b.filter(pc.is_in(col, value_set=self.values))

        from .taskstate import task_stage

        return ds.map_batches(task_stage(KeepByKey, ref=ref), batch_format="pyarrow")

    if num_partitions is None:
        num_partitions = max(8, small.num_blocks())
    right = small
    if keep_key != key:
        right = right.map_batches(
            lambda b: b.rename_columns([key]), batch_format="pyarrow"
        )
    return ds.join(right, "left_semi", num_partitions, on=(key,))
