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
  (bounded memory per partition; the 100 TB path).

The drop side is ``materialize()``d to count it — that is the small side by
construction (pairs/ids, never the corpus), so the materialization is
bounded and reused by whichever path runs.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_BROADCAST_CAP = 2_000_000  # keys; ~16 MB of int64 per executor


def anti_join(
    ds,
    key: str,
    drop_ds,
    drop_key: str | None = None,
    *,
    broadcast_cap: int = DEFAULT_BROADCAST_CAP,
    num_partitions: int | None = None,
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
    return ds.join(right, "left_anti", num_partitions, on=(key,))
