"""Deterministic negative sampling for KG-embedding training data.

TransE-family training (Bordes et al. 2013) needs, per positive edge
(src, dst), K corrupted edges (src, dst') with dst' drawn from the
entity vocabulary and accidental positives removed. This implements the
tail-corruption sampler as a Ray Data composition with NO randomness:
the replacement index is ``md5_h64(src | dst | i) % |vocab|`` over the
ascending-sorted distinct-tail vocabulary, so every worker, every retry
and the DuckDB oracle pick the SAME corruption (the repo's md5_h64 ==
DuckDB ``md5_number_upper`` equivalence, kernel/md5vec.py).

Shape at scale:
- the vocabulary is entity-bounded (tiny next to the corpus/edge set) —
  collected once on the driver and captured by the generator closure
  (shipped once per task, the broadcast-small-side pattern),
- candidate generation is one vectorized map_batches (numpy fancy-index
  into the vocab array, K-fold column concat),
- the accidental-positive filter is ONE bucketed hash anti-join on
  (src, dst_neg) against the positive pairs — no driver-side membership
  set, so the positive set may be arbitrarily large.

No reference counterpart (quickner has no training-data layer).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashjoin import bucketed_join
from .temporal import _default_buckets


def negative_samples(
    pairs, *, vocab=None, k: int = 3, n_buckets: int | None = None
):
    """Dataset(src, dst) of DISTINCT positive pairs -> Dataset(src,
    dst_neg, sample_i) of k deterministic tail corruptions per positive,
    with corruptions that collide with ANY true (src, dst) pair removed.
    Output size is <= k * |pairs| (less where corruption collides).

    ``vocab``: optional Dataset whose FIRST column is the replacement
    vocabulary (e.g. every entity in the KG). Defaults to the positive
    tails — fine for sparse graphs, degenerate for dense ones (every
    corruption collides with a positive)."""
    if k < 1:
        raise ValueError("negative_samples requires k >= 1")
    nb = n_buckets or max(32, _default_buckets() // 4)

    # entity-bounded vocabulary, ascending (== SQL row_number order)
    from ray.data.aggregate import Count

    vsrc = vocab if vocab is not None else pairs
    vcol = vsrc.schema().names[0] if vocab is not None else "dst"
    vocab_rows = (
        vsrc.map_batches(
            lambda b, c=vcol: pa.table({"v": b.column(c)}).group_by(["v"])
            .aggregate([]),
            batch_format="pyarrow",
        )
        .groupby("v", num_partitions=max(2, nb // 8))
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .take_all()
    )
    vocab = np.array(sorted(r["v"] for r in vocab_rows), dtype=object)
    nv = np.uint64(len(vocab))
    if nv == 0:
        return pairs.limit(0)

    def gen(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..kernel.md5vec import md5_h64

        src = b.column("src")
        dst = b.column("dst")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        if isinstance(dst, pa.ChunkedArray):
            dst = dst.combine_chunks()
        s_np = src.to_numpy(zero_copy_only=False)
        outs, outd, outi = [], [], []
        for i in range(k):  # k-fold column concat, each fold vectorized
            keys = pc.binary_join_element_wise(
                src, dst, pa.scalar(str(i)), "|"
            )
            pick = (md5_h64(keys) % nv).astype(np.int64)
            outs.append(s_np)
            outd.append(vocab[pick])
            outi.append(np.full(len(s_np), i, dtype=np.int64))
        return pa.table(
            {
                "src": pa.array(np.concatenate(outs), type=pa.string()),
                "dst_neg": pa.array(np.concatenate(outd), type=pa.string()),
                "sample_i": pa.array(np.concatenate(outi), type=pa.int64()),
            }
        )

    cand = pairs.map_batches(gen, batch_format="pyarrow")
    positives = pairs.map_batches(
        lambda b: pa.table({"src": b.column("src"), "dst_neg": b.column("dst")}),
        batch_format="pyarrow",
    )
    return bucketed_join(
        cand,
        positives,
        on=("src", "dst_neg"),
        n_buckets=nb,
        join_type="left anti",
        left_types={
            "src": pa.string(),
            "dst_neg": pa.string(),
            "sample_i": pa.int64(),
        },
        right_types={"src": pa.string(), "dst_neg": pa.string()},
    )


def sql_negative_samples(
    sql_pairs: str, sql_vocab: str | None = None, k: int = 3
) -> str:
    """Oracle: ``sql_pairs`` is a subquery yielding DISTINCT (src, dst);
    ``sql_vocab`` optionally yields the one-column replacement vocabulary.
    Emits (src, dst_neg, sample_i) matching ``negative_samples``."""
    vsub = sql_vocab if sql_vocab else "SELECT DISTINCT dst FROM ns_pairs"
    return (  # ns_-prefixed CTE names: callers splice this after other CTEs
        f"ns_pairs AS ({sql_pairs}),\n"
        f"ns_vocab AS (SELECT v AS e,\n"
        f"    row_number() OVER (ORDER BY v) - 1 AS idx\n"
        f"  FROM (SELECT * FROM ({vsub}) t0(v))),\n"
        f"ns_nv AS (SELECT count(*) AS n FROM ns_vocab),\n"
        f"ns_cand AS (SELECT p.src, p.dst, t.i,\n"
        f"    CAST(CAST(md5_number_upper(p.src || '|' || p.dst || '|'\n"
        f"      || CAST(t.i AS VARCHAR)) AS UBIGINT)\n"
        f"      % (SELECT n FROM ns_nv) AS BIGINT) AS pick\n"
        f"  FROM ns_pairs p CROSS JOIN\n"
        f"    (SELECT unnest(range({k})) AS i) t)\n"
        f"SELECT c.src, v.e AS dst_neg, CAST(c.i AS BIGINT) AS sample_i\n"
        f"FROM ns_cand c JOIN ns_vocab v ON v.idx = c.pick\n"
        f"WHERE NOT EXISTS (SELECT 1 FROM ns_pairs p\n"
        f"  WHERE p.src = c.src AND p.dst = v.e)"
    )
