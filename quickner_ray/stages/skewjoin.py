"""Skew-aware hybrid equi-join: runtime hot-key detection splits the join
into a broadcast path (hot keys) and a bucketed-shuffle path (cold keys).

The north-rule failure mode this exists for: joining mention streams to
entity tables on surface-form keys where a handful of keys ("the", a
mega-entity, a null-ish sentinel) carry orders of magnitude more rows than
the rest. A plain hash join sends every hot-key row to ONE bucket — one
straggling worker owns 30% of the data. Here:

1. **Hot-key detection, combiner-bounded.** A Misra-Gries candidate sweep
   over the left key column (exact per-batch counts, trimmed to <= k rows
   per batch — the mergeable-summaries bound: every key with global
   frequency > n/(k+1) survives) feeds a tiny groupby-sum; candidates are
   then recounted EXACTLY in a second bounded pass. Keys with exact count
   >= ``hot_threshold`` are hot. Neither pass shuffles the key universe —
   wire cost is <= k rows per batch plus |candidates| per batch.
2. **Hot path, zero shuffle.** The right-side rows for hot keys (a
   bounded set: <= k keys, dim-like multiplicity — asserted via
   ``hot_right_cap``) are collected once and broadcast via ``ray.put``;
   left batches join against them in-batch with Arrow's C++ ``Table.join``.
   Hot rows never enter an exchange, so no bucket can strangle a worker.
3. **Cold path.** Everything else goes through the repo's standard
   md5-bucketed hash join (stages/hashjoin.py) — uniform by construction
   once the heavy keys are gone.

The output is the exact inner join regardless of which keys are classified
hot: both paths compute exact joins over disjoint key subsets split by one
driver-resolved hot set, so correctness never depends on the detector.

Note the left Dataset's upstream plan executes twice (detection sweep +
join pass) — at scale, stage the left input to Parquet first (the repo's
/tmp fingerprint-cache pattern) if its upstream is expensive.

Reference: n/a — no counterpart (quickner is a single-process annotator;
skew handling is mandated by the north rule's "salted keys for skewed hot
entities").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_MG_K = 64
DEFAULT_HOT_RIGHT_CAP = 100_000


def _chunk(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _mg_key_partial(b: pa.Table, key_col: str, k: int) -> pa.Table:
    """Per-batch Misra-Gries summary of the key column: exact counts,
    trimmed by the (k+1)-th largest so at most k rows leave the batch.

    The ``b`` column carries the batch's TRUE row count on the first emitted
    row (zero elsewhere) so the driver can validate the MG completeness
    bound against the real dataset size n, not just surviving-candidate mass
    (ADVICE r3). When trimming would leave no survivors (uniform batch), the
    top-1 key is emitted with w=0 purely to carry the count — a zero-weight
    candidate never distorts the MG weights."""
    col = _chunk(b.column(key_col))
    empty = pa.table(
        {
            "k": pa.array([], type=col.type),
            "w": pa.array([], type=pa.int64()),
            "b": pa.array([], type=pa.int64()),
        }
    )
    if len(col) == 0:
        return empty
    enc = pc.dictionary_encode(col)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    tf = np.bincount(codes, minlength=len(enc.dictionary))
    thresh = np.partition(tf, -(k + 1))[-(k + 1)] if len(tf) > k else 0
    keep = np.nonzero(tf > thresh)[0]
    if len(keep) == 0:
        keep = np.array([int(np.argmax(tf))], dtype=np.int64)
        thresh = tf[keep[0]]  # w = 0 for the count-carrier row
    bcount = np.zeros(len(keep), dtype=np.int64)
    bcount[0] = len(col)
    return pa.table(
        {
            "k": enc.dictionary.take(pa.array(keep)),
            "w": pa.array(tf[keep] - thresh, type=pa.int64()),
            "b": pa.array(bcount, type=pa.int64()),
        }
    )


def _recount_partial(b: pa.Table, key_col: str, cand_ref) -> pa.Table:
    """Exact per-batch counts restricted to the broadcast candidate keys."""
    import ray

    cand = ray.get(cand_ref) if not isinstance(cand_ref, pa.Array) else cand_ref
    col = _chunk(b.column(key_col))
    empty = pa.table(
        {"k": pa.array([], type=col.type), "n": pa.array([], type=pa.int64())}
    )
    if len(col) == 0 or len(cand) == 0:
        return empty
    hits = col.filter(pc.is_in(col, value_set=cand))
    if len(hits) == 0:
        return empty
    enc = pc.dictionary_encode(hits)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.bincount(codes, minlength=len(enc.dictionary))
    return pa.table(
        {
            "k": enc.dictionary,
            "n": pa.array(counts, type=pa.int64()),
        }
    )


def hot_keys(ds, key_col: str, hot_threshold: int, *, mg_k: int = DEFAULT_MG_K):
    """Exact set of keys whose frequency in ``ds[key_col]`` is
    >= ``hot_threshold``, found without shuffling the key universe.

    Requires hot_threshold > n/(mg_k+1) for completeness (MG guarantees
    every key above n/(k+1) survives the candidate sweep); the threshold
    is checked against the TRUE dataset size n (carried through the MG
    pass) and raised loudly if too low.
    Returns a (possibly empty) pyarrow Array of the key column's type.
    """
    import ray
    from ray.data.aggregate import Sum

    from .collect import collect_blocks

    mg = (
        ds.map_batches(
            lambda b: _mg_key_partial(b, key_col, mg_k), batch_format="pyarrow"
        )
        .groupby("k")
        .aggregate(Sum("w", alias_name="w"), Sum("b", alias_name="b"))
    )
    cand_tab = collect_blocks(
        mg,
        "k",
        pa.table(
            {
                "k": pa.array([], type=pa.null()),
                "w": pa.array([], type=pa.int64()),
                "b": pa.array([], type=pa.int64()),
            }
        ),
    )
    if cand_tab.num_rows == 0:
        return pa.array([], type=pa.null())
    n_total = pc.sum(cand_tab.column("b")).as_py() or 0
    if n_total and hot_threshold * (mg_k + 1) <= n_total:
        raise ValueError(
            f"hot_threshold={hot_threshold} is below the MG completeness "
            f"bound n/(k+1)={n_total}/{mg_k + 1}: raise the threshold or mg_k"
        )
    cand = _chunk(cand_tab.column("k"))
    cand_ref = ray.put(cand)
    exact = (
        ds.map_batches(
            lambda b: _recount_partial(b, key_col, cand_ref),
            batch_format="pyarrow",
        )
        .groupby("k")
        .aggregate(Sum("n", alias_name="n"))
    )
    tab = collect_blocks(
        exact,
        "k",
        pa.table({"k": pa.array([], type=cand.type), "n": pa.array([], type=pa.int64())}),
    )
    keep = tab.filter(pc.greater_equal(tab.column("n"), hot_threshold))
    return _chunk(keep.column("k"))


def skew_join(
    left,
    right,
    *,
    on: str,
    hot_threshold: int,
    n_buckets: int = 16,
    mg_k: int = DEFAULT_MG_K,
    hot_right_cap: int = DEFAULT_HOT_RIGHT_CAP,
    left_types: dict | None = None,
    right_types: dict | None = None,
):
    """Inner equi-join of ``left`` and ``right`` on the single key column
    ``on``; left keys with exact frequency >= ``hot_threshold`` take the
    broadcast path, the rest the bucketed-shuffle path. Non-key column
    names must be disjoint across sides. Output columns:
    [on, *sorted(left-only), *sorted(right-only)].
    """
    import ray

    from .collect import collect_blocks
    from .hashjoin import bucketed_join

    hot = hot_keys(left, on, hot_threshold, mg_k=mg_k)

    def sdict(ds, types):
        if types:
            return types
        sch = ds.schema()
        return None if sch is None else dict(zip(sch.names, sch.types))

    lsch, rsch = sdict(left, left_types), sdict(right, right_types)
    if lsch is None or rsch is None:  # empty side: inner join is empty
        return left.limit(0)
    lonly = sorted(c for c in lsch if c != on)
    ronly = sorted(c for c in rsch if c != on)
    order = [on, *lonly, *ronly]

    if len(hot) == 0:
        return bucketed_join(
            left,
            right,
            on=(on,),
            n_buckets=n_buckets,
            join_type="inner",
            left_types=lsch,
            right_types=rsch,
        ).map_batches(lambda b: b.select(order), batch_format="pyarrow")

    hot_ref = ray.put(hot)

    def side_filter(keep_hot: bool):
        def f(b: pa.Table) -> pa.Table:
            col = _chunk(b.column(on))
            mask = pc.is_in(col, value_set=ray.get(hot_ref))
            return b.filter(mask if keep_hot else pc.invert(mask))

        return f

    # Hot right rows: bounded collect + broadcast (<= mg_k keys, dim-like
    # multiplicity per key — enforced by hot_right_cap).
    right_hot_tab = collect_blocks(
        right.map_batches(side_filter(True), batch_format="pyarrow"),
        on,
        pa.table({c: pa.array([], type=rsch[c]) for c in [on, *ronly]}),
    ).select([on, *ronly])
    if right_hot_tab.num_rows > hot_right_cap:
        raise ValueError(
            f"hot right side has {right_hot_tab.num_rows} rows > "
            f"hot_right_cap={hot_right_cap}: the right side is not dim-like "
            "on the hot keys; salt the key instead"
        )
    rh_ref = ray.put(right_hot_tab)

    def join_hot(b: pa.Table) -> pa.Table:
        rt = ray.get(rh_ref)
        lt = b.select([on, *lonly])
        return lt.join(rt, keys=[on], join_type="inner").select(order)

    hot_joined = left.map_batches(side_filter(True), batch_format="pyarrow").map_batches(
        join_hot, batch_format="pyarrow"
    )
    cold_joined = bucketed_join(
        left.map_batches(side_filter(False), batch_format="pyarrow"),
        right.map_batches(side_filter(False), batch_format="pyarrow"),
        on=(on,),
        n_buckets=n_buckets,
        join_type="inner",
        left_types=lsch,
        right_types=rsch,
    ).map_batches(lambda b: b.select(order), batch_format="pyarrow")
    return hot_joined.union(cold_joined)
