"""Grouped top-k with a partial combiner, and deterministic stratified
sampling built on it.

Scale shape (the partial-aggregate rule of SURVEY.md §4): each batch first
prunes to its OWN top-k per key — a batch contributes at most k rows per
key to the shuffle no matter how hot the key is — then one small
``groupby(key).map_groups`` finishes. Rank extraction is vectorized
(one lexsort + run-length head mask per batch; no Python row loop).

``stratified_sample`` ranks by the shared 64-bit md5 hash (``h64`` ==
DuckDB ``md5_number_upper``) of the id column, so "keep k per stratum" is
deterministic, reproducible across engines, and oracle-checkable — the
hash-rank trick that makes corpus subsampling resumable at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _head_mask(codes: np.ndarray, order: np.ndarray, k: int) -> np.ndarray:
    """Row mask selecting the first k rows of each key run in ``order``
    (codes already grouped when traversed in ``order``)."""
    sorted_codes = codes[order]
    new_run = np.r_[True, sorted_codes[1:] != sorted_codes[:-1]]
    run_id = np.cumsum(new_run) - 1
    run_start = np.flatnonzero(new_run)
    pos_in_run = np.arange(len(order)) - run_start[run_id]
    mask = np.zeros(len(order), dtype=bool)
    mask[order[pos_in_run < k]] = True
    return mask


def grouped_topk(ds, key_col: str, rank_cols: list[str], k: int, *, descending=False):
    """Top-k rows per key, ranked by ``rank_cols`` (ties broken by later
    columns; ``descending`` applies to the FIRST rank column only).

    One shuffle whose volume is bounded by k x keys x batches."""
    desc = descending if isinstance(descending, (list, tuple)) else (
        [descending] + [False] * (len(rank_cols) - 1)
    )

    def _desc_key(v: np.ndarray, col_name: str) -> np.ndarray:
        # order-reversing transform: ~v for ints (never overflows — unlike
        # -v, which wraps uint64 and maps 0 to itself, mis-ranking the
        # minimum as the descending top); -v for floats (-0.0 == 0.0, so
        # ordering is unaffected). Strings have no cheap reversal.
        if v.dtype.kind in "iu":
            return ~v
        if v.dtype.kind == "f":
            return -v
        raise TypeError(
            f"grouped_topk: descending rank on non-numeric column "
            f"{col_name!r} (dtype {v.dtype}) is not supported"
        )

    def partial(b: pa.Table) -> pa.Table:
        keys = b.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        codes = pc.dictionary_encode(keys).indices.to_numpy(zero_copy_only=False)
        cols = []
        for c, d in zip(rank_cols, desc):
            col = b.column(c)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            v = col.to_numpy(zero_copy_only=False)
            cols.append(_desc_key(v, c) if d else v)
        order = np.lexsort(tuple(reversed(cols)) + (codes,))
        return b.filter(pa.array(_head_mask(codes, order, k)))

    pruned = ds.map_batches(partial, batch_format="pyarrow")
    # the final per-key top-k over the pruned stream (k rows per key per
    # batch at most) — map_groups reuses the same partial on each group
    return pruned.groupby(key_col).map_groups(partial, batch_format="pyarrow")


def stratified_sample(ds, key_col: str, id_col: str, k: int):
    """Deterministic k-per-stratum sample: rank rows inside each ``key_col``
    stratum by ``h64(str(id))`` (ties by id) and keep the k smallest."""
    from ..stages.dedup_approx import h64

    def with_rank(b: pa.Table) -> pa.Table:
        ids = b.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ranks = np.fromiter(
            (h64(s) for s in ids.cast(pa.string()).to_pylist()),
            dtype=np.uint64,
            count=len(ids),
        )
        return b.append_column("sample_rank", pa.array(ranks))

    ranked = ds.map_batches(with_rank, batch_format="pyarrow")
    return grouped_topk(ranked, key_col, ["sample_rank", id_col], k)


def mixture_sample(ds, source_col: str, id_col: str, *, n_rates: int = 4):
    """Deterministic source-mixture subsampling (the data-mixing step of an
    LLM corpus: up-/down-weight each source by a keep rate).

    Keep rate per source is k/``n_rates`` with k = (h64(source) % n_rates)+1
    — deterministic, no config table to ship — and a row survives iff the
    top bits of its id hash fall under k: ``h64(id) >> log2(2^64/n_rates) <
    k``, exact integer math with no 2^64 overflow on either engine.  Pure
    per-batch filter: no shuffle, no state, resumable by construction."""
    import math

    from ..stages.dedup_approx import h64

    shift = 64 - int(math.log2(n_rates))
    if 1 << (64 - shift) != n_rates:
        raise ValueError("n_rates must be a power of two")

    def keep(b: pa.Table) -> pa.Table:
        ids = b.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        srcs = b.column(source_col)
        if isinstance(srcs, pa.ChunkedArray):
            srcs = srcs.combine_chunks()
        hid = np.fromiter(
            (h64(s) for s in ids.cast(pa.string()).to_pylist()),
            dtype=np.uint64,
            count=len(ids),
        )
        rates = {s: (h64(s) % n_rates) + 1 for s in set(srcs.to_pylist())}
        k = np.fromiter(
            (rates[s] for s in srcs.to_pylist()), dtype=np.uint64, count=len(ids)
        )
        return b.filter(pa.array((hid >> np.uint64(shift)) < k))

    return ds.map_batches(keep, batch_format="pyarrow")


def sql_mixture_sample_docs(n_rates: int = 4) -> str:
    """Oracle for the driver query: per-source hash-rate subsample of
    documents. Integer division mirrors the >> shift (no 2^64 overflow)."""
    div = (1 << 64) // n_rates
    return (
        "SELECT doc_id, source FROM documents\n"
        f"WHERE md5_number_upper(CAST(doc_id AS VARCHAR)) // {div}\n"
        f"  < (md5_number_upper(source) % {n_rates}) + 1"
    )


def sql_grouped_topk_orders(k: int = 3) -> str:
    """Oracle for the driver query: top-k orders per priority class by
    total price (ties to the smaller orderkey)."""
    return (
        "SELECT o_orderpriority, o_orderkey, o_totalprice FROM orders\n"
        "QUALIFY row_number() OVER (PARTITION BY o_orderpriority\n"
        f"  ORDER BY o_totalprice DESC, o_orderkey) <= {k}"
    )


def sql_stratified_sample_docs(k: int = 20) -> str:
    """Oracle for the driver query: k docs per lang by md5 hash rank."""
    return (
        "SELECT lang, doc_id FROM documents\n"
        "QUALIFY row_number() OVER (PARTITION BY lang\n"
        f"  ORDER BY md5_number_upper(CAST(doc_id AS VARCHAR)), doc_id) <= {k}"
    )
