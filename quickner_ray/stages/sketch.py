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


# -- Count-Min Sketch (heavy-hitter frequency sketch) -------------------------

CMS_D = 4    # hash rows
CMS_W = 512  # buckets per row


def _cms_partial(batch: pa.Table, text_col: str) -> pa.Table:
    """Batch -> sparse (sketch_row, bucket, register) partial counts of the
    Count-Min sketch over lowered ``[a-z0-9]+`` word tokens (same token
    class as vocab_df, so the two oracles share semantics).

    md5 runs once per DISTINCT word per hash row (vocab-bounded, not
    token-stream-bounded); counting is a dictionary-encode + bincount;
    the accumulate is one dense (d, w) add.  At most d*w rows leave the
    batch regardless of its size — the combiner that bounds the shuffle.
    """
    import pyarrow.compute as pc

    from .dedup_approx import h64
    from .text_analysis import WORD_CLASS_SPLIT_RE

    empty = pa.table(
        {
            "sketch_row": pa.array([], type=pa.int64()),
            "bucket": pa.array([], type=pa.int64()),
            "register": pa.array([], type=pa.int64()),
        }
    )
    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if len(texts) == 0:
        return empty
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), WORD_CLASS_SPLIT_RE)
    flat = pc.list_flatten(toks)
    if len(flat):
        flat = flat.filter(pc.greater(pc.binary_length(flat), 0))
    if not len(flat):
        return empty
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary.to_pylist()
    tf = np.bincount(codes, minlength=len(vocab))
    regs = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for r in range(CMS_D):
        buckets = np.fromiter(
            (h64(f"{r}:{w}") % CMS_W for w in vocab),
            dtype=np.int64,
            count=len(vocab),
        )
        np.add.at(regs[r], buckets, tf)
    rr, bb = np.nonzero(regs)
    return pa.table(
        {
            "sketch_row": pa.array(rr.astype(np.int64)),
            "bucket": pa.array(bb.astype(np.int64)),
            "register": pa.array(regs[rr, bb]),
        }
    )


def cms_registers(ds, text_col: str = "text"):
    """Dataset -> Dataset(sketch_row, bucket, register): merged Count-Min
    sketch of corpus word frequencies.  Partials are (d*w)-bounded per
    batch; the groupby key space is d*w, independent of corpus size."""
    from ray.data.aggregate import Sum

    partial = ds.map_batches(
        lambda b: _cms_partial(b, text_col), batch_format="pyarrow"
    )
    return partial.groupby(["sketch_row", "bucket"]).aggregate(
        Sum("register", alias_name="register")
    )


def cms_estimate(registers: list[tuple[int, int, int]], word: str) -> int:
    """Point frequency estimate: min over rows of the word's bucket —
    an upper bound on the true count (classic CMS guarantee)."""
    from .dedup_approx import h64

    table = {(r, b): v for r, b, v in registers}
    return min(
        table.get((r, h64(f"{r}:{word}") % CMS_W), 0) for r in range(CMS_D)
    )


def sql_cms_registers(table: str = "documents") -> str:
    """Exact oracle: same registers via per-distinct-word md5 bucketing."""
    return (
        f"WITH toks AS (SELECT unnest(regexp_extract_all(lower(text),"
        f" '[a-z0-9]+')) AS tok FROM {table}),\n"
        f"tc AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),\n"
        f"r AS (SELECT unnest(range({CMS_D})) AS sketch_row),\n"
        f"hb AS (SELECT r.sketch_row,\n"
        f"  CAST(md5_number_upper(CAST(r.sketch_row AS VARCHAR) || ':' || tok)"
        f" % {CMS_W} AS BIGINT) AS bucket, c\n"
        f"  FROM tc CROSS JOIN r)\n"
        f"SELECT CAST(sketch_row AS BIGINT) AS sketch_row, bucket,\n"
        f"  CAST(sum(c) AS BIGINT) AS register\n"
        f"FROM hb GROUP BY sketch_row, bucket"
    )


# -- Misra-Gries heavy hitters (exact two-pass) -------------------------------

MG_K = 50


def _mg_partial(batch: pa.Table, text_col: str, k: int = MG_K) -> pa.Table:
    """Batch -> Misra-Gries summary (token, weight), at most MG_K rows.

    Exact per-batch token counts (dictionary-encode + bincount) are turned
    into an MG summary by subtracting the (K+1)-th largest count: at most K
    tokens keep a positive weight, and the per-batch undercount of any token
    is <= n_batch/(K+1).  Summed across batches (one tiny groupby), every
    token with global frequency > n/(K+1) keeps a positive merged weight
    (Agarwal et al. 2012, mergeable summaries) — the candidate sweep that
    replaces a full-vocab shuffle with a <= K-rows-per-batch combiner.
    """
    import pyarrow.compute as pc

    from .text_analysis import WORD_CLASS_SPLIT_RE

    empty = pa.table(
        {
            "token": pa.array([], type=pa.string()),
            "weight": pa.array([], type=pa.int64()),
        }
    )
    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if len(texts) == 0:
        return empty
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), WORD_CLASS_SPLIT_RE)
    flat = pc.list_flatten(toks)
    if len(flat):
        flat = flat.filter(pc.greater(pc.binary_length(flat), 0))
    if not len(flat):
        return empty
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    tf = np.bincount(codes, minlength=len(enc.dictionary))
    if len(tf) > k:
        thresh = np.partition(tf, -(k + 1))[-(k + 1)]
    else:
        thresh = 0
    keep = np.nonzero(tf > thresh)[0]
    return pa.table(
        {
            "token": enc.dictionary.take(pa.array(keep)),
            "weight": pa.array(tf[keep] - thresh, type=pa.int64()),
        }
    )


def _mg_verify_partial(batch: pa.Table, text_col: str, cand_ref) -> pa.Table:
    """Exact recount pass: per-batch counts of CANDIDATE tokens only, plus
    one ('', n_batch_tokens) row carrying the total-token partial (tokens
    are non-empty by construction, so '' cannot collide)."""
    import ray
    import pyarrow.compute as pc

    from .text_analysis import WORD_CLASS_SPLIT_RE

    cand = ray.get(cand_ref) if not isinstance(cand_ref, pa.Array) else cand_ref
    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    out_tok: list = []
    out_n: list = []
    total = 0
    if len(texts):
        toks = pc.split_pattern_regex(pc.utf8_lower(texts), WORD_CLASS_SPLIT_RE)
        flat = pc.list_flatten(toks)
        if len(flat):
            flat = flat.filter(pc.greater(pc.binary_length(flat), 0))
        total = len(flat)
        if total:
            hits = flat.filter(pc.is_in(flat, value_set=cand))
            if len(hits):
                enc = pc.dictionary_encode(hits)
                codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
                counts = np.bincount(codes, minlength=len(enc.dictionary))
                out_tok = enc.dictionary.to_pylist()
                out_n = counts.tolist()
    return pa.table(
        {
            "token": pa.array(out_tok + [""], type=pa.string()),
            "n_occurrences": pa.array(out_n + [total], type=pa.int64()),
        }
    )


def heavy_hitter_tokens(ds, text_col: str = "text", k: int = MG_K):
    """Exact heavy hitters: all tokens with frequency > n_tokens/(k+1).

    Pass 1 (MG candidate sweep): <= k (token, weight) rows per batch ->
    groupby-sum -> bounded candidate table collected driver-side and
    broadcast (same size-gate rationale as rare_word_stats' top-K vocab:
    the candidate set is O(k * stragglers), never vocab-sized).
    Pass 2 (exact verify): per-batch counts of candidates + total-token
    partials -> groupby-sum -> filter count*(k+1) > n.  Both shuffles are
    combiner-bounded; the full vocabulary never moves.
    """
    import ray
    from ray.data.aggregate import Sum

    mg = (
        ds.map_batches(
            lambda b: _mg_partial(b, text_col, k), batch_format="pyarrow"
        )
        .groupby("token")
        .aggregate(Sum("weight", alias_name="weight"))
    )
    from .collect import collect_blocks

    empty_out = pa.table(
        {
            "token": pa.array([], type=pa.string()),
            "n_occurrences": pa.array([], type=pa.int64()),
        }
    )
    mg_tab = collect_blocks(
        mg,
        "token",
        pa.table(
            {
                "token": pa.array([], type=pa.string()),
                "weight": pa.array([], type=pa.int64()),
            }
        ),
    )
    if mg_tab.num_rows == 0:
        return empty_out
    cand = mg_tab.column("token").combine_chunks()
    cand_ref = ray.put(cand)

    exact = (
        ds.map_batches(
            lambda b: _mg_verify_partial(b, text_col, cand_ref),
            batch_format="pyarrow",
        )
        .groupby("token")
        .aggregate(Sum("n_occurrences", alias_name="n_occurrences"))
    )
    merged = collect_blocks(exact, "token", empty_out)
    tok = merged.column("token")
    n = merged.column("n_occurrences")
    import pyarrow.compute as pc

    total = pc.sum(n.filter(pc.equal(tok, ""))).as_py() or 0
    keep = pc.and_(
        pc.not_equal(tok, ""),
        pc.greater(pc.multiply(n, pa.scalar(k + 1, type=pa.int64())), total),
    )
    return merged.filter(keep)


def sql_heavy_hitters(table: str = "documents", k: int = MG_K) -> str:
    """Exact oracle: tokens with count*(k+1) > total token count."""
    return (
        f"WITH toks AS (SELECT unnest(regexp_extract_all(lower(text),"
        f" '[a-z0-9]+')) AS tok FROM {table}),\n"
        f"tc AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),\n"
        f"tot AS (SELECT count(*) AS n FROM toks)\n"
        f"SELECT tok AS token, CAST(c AS BIGINT) AS n_occurrences\n"
        f"FROM tc, tot WHERE c * ({k} + 1) > n"
    )


def _partial_registers_grouped(batch: pa.Table, col: str, group_col: str) -> pa.Table:
    """Per-(group, bucket) sparse partial registers. Vectorized over the
    whole batch via a flat (group_code * M + bucket) scatter-max; partial
    size is bounded by distinct-groups-per-batch x M (fine for
    dimension-like group keys such as event_type — the grouped-HLL use
    case; a corpus-keyed group column would belong in exact COUNT
    DISTINCT instead)."""
    from .dedup_approx import h64

    vals = batch.column(col)
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    grp = batch.column(group_col)
    if isinstance(grp, pa.ChunkedArray):
        grp = grp.combine_chunks()
    if len(vals) == 0:
        return pa.table(
            {
                group_col: pa.array([], type=pa.string()),
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
    bitlen = np.frexp(low.astype(np.float64))[1]
    rho = np.where(low == 0, _LOW_BITS + 1, _LOW_BITS + 1 - bitlen).astype(np.int64)
    enc = grp.cast(pa.string()).dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniques = enc.dictionary.to_pylist()
    regs = np.zeros(len(uniques) * M, dtype=np.int64)
    np.maximum.at(regs, codes * M + bucket, rho)
    nz = np.flatnonzero(regs)
    return pa.table(
        {
            group_col: pa.array([uniques[i] for i in nz // M], type=pa.string()),
            "bucket": pa.array(nz % M, type=pa.int64()),
            "register": pa.array(regs[nz], type=pa.int64()),
        }
    )


def hll_registers_grouped(ds, col: str, group_col: str):
    """Dataset -> Dataset(group, bucket, register): merged per-group HLL
    register tables (grouped approximate COUNT DISTINCT — e.g. distinct
    users per event type). ONE groupby bounded by groups x M rows."""
    from ray.data.aggregate import Max

    partial = ds.map_batches(
        lambda b: _partial_registers_grouped(b, col, group_col),
        batch_format="pyarrow",
    )
    return partial.groupby([group_col, "bucket"]).aggregate(
        Max("register", alias_name="register")
    )


def sql_hll_registers_grouped(col: str, group_col: str, table: str) -> str:
    div = 1 << _LOW_BITS
    return (
        f"WITH hv AS (SELECT DISTINCT {group_col},\n"
        f"    md5_number_upper(CAST({col} AS VARCHAR)) AS h FROM {table}),\n"
        f"parts AS (SELECT {group_col}, CAST(h // {div} AS BIGINT) AS bucket,\n"
        f"                 h % {div} AS low FROM hv),\n"
        f"rho AS (SELECT {group_col}, bucket,\n"
        f"  CASE WHEN low = 0 THEN {_LOW_BITS + 1}\n"
        f"  ELSE strpos(lpad(bin(low), {_LOW_BITS}, '0'), '1') END AS r\n"
        f"  FROM parts)\n"
        f"SELECT {group_col}, bucket, CAST(max(r) AS BIGINT) AS register\n"
        f"FROM rho GROUP BY {group_col}, bucket"
    )


# --------------------------------------------------------------------------
# KMV (k-minimum-values) sketch + set-intersection estimation
# --------------------------------------------------------------------------
# Beyer et al., "On Synopses for Distinct-Value Estimation Under Multiset
# Operations" (SIGMOD 2007): keep the k smallest hash values of the
# distinct keys. Unlike HLL, two KMV sketches support a DIRECT
# intersection estimate (no inclusion-exclusion error blow-up): merge to
# the union sketch, count how many of its members appear in BOTH input
# sketches (K), then |A∩B| ~= K/k * (k-1) * 2^64 / kth_min. Everything is
# deterministic over the shared md5 h64, so the whole sketch AND the
# integer-exact estimate have a bit-exact DuckDB oracle. No reference
# counterpart (quickner-core has no sketches).

KMV_K = 256
_TWO64 = 1 << 64


def _kmv_partial(batch: pa.Table, col: str, k: int) -> pa.Table:
    """Batch -> its k smallest distinct h64 hashes of ``col`` (<= k rows)."""
    from ..kernel.md5vec import md5_h64

    vals = batch.column(col)
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    if len(vals) == 0:
        return pa.table({"h": pa.array([], type=pa.uint64())})
    h = np.unique(md5_h64(vals.cast(pa.string())))
    return pa.table({"h": h[:k]})  # np.unique is sorted ascending


def _kmv_combine(batch: pa.Table, k: int) -> pa.Table:
    """Merge partial sketches: distinct hashes, keep the k smallest."""
    h = batch.column("h")
    if isinstance(h, pa.ChunkedArray):
        h = h.combine_chunks()
    merged = np.unique(h.to_numpy(zero_copy_only=False))
    return pa.table({"h": pa.array(merged[:k], type=pa.uint64())})


def kmv_sketch(ds, col: str, k: int = KMV_K, fan_in: int = 32):
    """Dataset -> one-block Dataset(h: uint64, ascending) of the k smallest
    distinct hashes of ``col``.

    Tree combine, no groupby/sort: per-block partials (<= k rows each) ->
    repartition(fan_in) -> in-block unique+take-k -> repartition(1) ->
    final unique+take-k. Every exchange moves <= k rows per upstream
    block, so the wire cost is sketch-sized and independent of input row
    count (the 100 TB shape). Deliberately avoids Dataset.groupby/sort:
    Ray's hash-aggregate round-trips keys through Python and cannot
    represent uint64 hashes above 2^63 (falls back to pickled-object
    columns); the numpy combine keeps the column native Arrow uint64."""
    partial = ds.map_batches(
        lambda b: _kmv_partial(b, col, k), batch_format="pyarrow"
    )
    mid = partial.repartition(fan_in).map_batches(
        lambda b: _kmv_combine(b, k), batch_size=None, batch_format="pyarrow"
    )
    return mid.repartition(1).map_batches(
        lambda b: _kmv_combine(b, k), batch_size=None, batch_format="pyarrow"
    )


def kmv_overlap(ds_a, ds_b, col: str, k: int = KMV_K):
    """Two Datasets -> ONE-row Dataset estimating |A ∩ B| over the
    distinct values of ``col`` from their KMV sketches.

    Columns (all integers, bit-exact vs the SQL oracle):
      k, n_a, n_b      sketch parameter and the two sketch sizes
      n_union          union-sketch size (min(k, |distinct union|))
      union_kth        largest hash kept in the union sketch (uint64)
      n_shared         union-sketch members present in BOTH sketches
      est_intersection K(k-1)*2^64 // (k*union_kth), or exactly n_shared
                       when the union sketch is the whole union (< k)
    """
    sa = kmv_sketch(ds_a, col, k).map_batches(
        lambda b: b.append_column("_s", pa.array(np.zeros(b.num_rows, np.int8))),
        batch_format="pyarrow",
    )
    sb = kmv_sketch(ds_b, col, k).map_batches(
        lambda b: b.append_column("_s", pa.array(np.ones(b.num_rows, np.int8))),
        batch_format="pyarrow",
    )

    def finish(t: pa.Table) -> pa.Table:
        side = t.column("_s").to_numpy(zero_copy_only=False)
        h = t.column("h").to_numpy(zero_copy_only=False)
        ha, hb = set(h[side == 0].tolist()), set(h[side == 1].tolist())
        u = sorted(ha | hb)
        sk_u = u[:k]
        n_u = len(sk_u)
        kth = sk_u[-1] if sk_u else 0
        shared = sum(1 for x in sk_u if x in ha and x in hb)
        if n_u >= k and kth:
            est = shared * (k - 1) * _TWO64 // (k * kth)
        else:  # sketches are the complete sets: the overlap is exact
            est = shared
        return pa.table(
            {
                "k": pa.array([k], type=pa.int64()),
                "n_a": pa.array([len(ha)], type=pa.int64()),
                "n_b": pa.array([len(hb)], type=pa.int64()),
                "n_union": pa.array([n_u], type=pa.int64()),
                "union_kth": pa.array([kth], type=pa.uint64()),
                "n_shared": pa.array([shared], type=pa.int64()),
                "est_intersection": pa.array([est], type=pa.int64()),
            }
        )

    # both sketches are <= k rows: ONE tiny block finishes exactly
    return sa.union(sb).repartition(1).map_batches(
        finish, batch_size=None, batch_format="pyarrow"
    )


def _kmv_grouped_partial(batch: pa.Table, key: str, col: str, k: int) -> pa.Table:
    """Batch -> per-key k smallest distinct h64 hashes (<= k rows/key)."""
    from ..kernel.md5vec import md5_h64

    t = pa.table({key: batch.column(key), "v": batch.column(col)})
    t = t.group_by([key, "v"]).aggregate([])  # batch-local distinct
    if t.num_rows == 0:
        return pa.table(
            {key: pa.array([], type=pa.string()),
             "h": pa.array([], type=pa.uint64())}
        )
    vals = t.column("v")
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    h = md5_h64(vals.cast(pa.string()))
    keys = t.column(key)
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    k_np = keys.to_numpy(zero_copy_only=False)
    # per-key k-min: lexsort by (key, h), keep first k of each key run
    order = np.lexsort((h, k_np))
    ks, hs = k_np[order], h[order]
    new_key = np.empty(len(ks), dtype=bool)
    new_key[0] = True
    new_key[1:] = ks[1:] != ks[:-1]
    rank = np.arange(len(ks)) - np.maximum.accumulate(
        np.where(new_key, np.arange(len(ks)), 0)
    )
    keep = rank < k
    return pa.table(
        {key: pa.array(ks[keep], type=pa.string()),
         "h": pa.array(hs[keep], type=pa.uint64())}
    )


def kmv_estimate_grouped(ds, key: str, col: str, k: int = KMV_K):
    """Per-key distinct-count estimates from per-key KMV sketches:
    Dataset -> Dataset(key, n_sketch, kth_min, est_distinct) — exact
    count when a key has < k distinct values (the sketch IS the set),
    else the Beyer estimator (k-1) * 2^64 / kth_min as an integer.

    Same shape as the grouped HLL: per-batch partials bound every key's
    contribution to k rows per block, ONE groupby on the key moves only
    sketch-sized data, and the per-key finish is a vectorized run scan —
    the per-group distinct-count synopsis for unbounded key spaces (hosts,
    predicates, sources) at corpus scale."""

    def finish(g: pa.Table) -> pa.Table:
        kv = g.column(key)
        if isinstance(kv, pa.ChunkedArray):
            kv = kv.combine_chunks()
        h = np.unique(g.column("h").to_numpy(zero_copy_only=False))[:k]
        n = len(h)
        kth = int(h[-1]) if n else 0
        if n >= k and kth:
            est = (k - 1) * _TWO64 // kth
        else:
            est = n
        return pa.table(
            {
                key: kv[:1],
                "n_sketch": pa.array([n], type=pa.int64()),
                "kth_min": pa.array([kth], type=pa.uint64()),
                "est_distinct": pa.array([est], type=pa.int64()),
            }
        )

    partial = ds.map_batches(
        lambda b: _kmv_grouped_partial(b, key, col, k), batch_format="pyarrow"
    )
    return partial.groupby(key).map_groups(finish, batch_format="pyarrow")


def sql_kmv_estimate_grouped(
    sql_rows: str, key: str = "g", k: int = KMV_K
) -> str:
    """Oracle for ``kmv_estimate_grouped``: ``sql_rows`` yields (``key``,
    v) rows; emits (key, n_sketch, kth_min, est_distinct)."""
    return (
        f"kg_h AS (SELECT {key},\n"
        f"    CAST(md5_number_upper(v) AS UBIGINT) AS h\n"
        f"  FROM ({sql_rows}) GROUP BY {key}, h),\n"
        f"kg_sk AS (SELECT {key}, h,\n"
        f"    row_number() OVER (PARTITION BY {key} ORDER BY h) AS rk\n"
        f"  FROM kg_h),\n"
        f"kg_st AS (SELECT {key}, count(*) AS n, max(h) AS kth\n"
        f"  FROM kg_sk WHERE rk <= {k} GROUP BY {key})\n"
        f"SELECT {key}, CAST(n AS BIGINT) AS n_sketch,\n"
        f"  CAST(kth AS UBIGINT) AS kth_min,\n"
        f"  CAST(CASE WHEN n >= {k} AND kth > 0 THEN\n"
        f"    {k - 1} * CAST(18446744073709551616 AS HUGEINT) // kth\n"
        f"  ELSE n END AS BIGINT) AS est_distinct\n"
        f"FROM kg_st"
    )


def sql_kmv_overlap(sql_a: str, sql_b: str, k: int = KMV_K) -> str:
    """Oracle for ``kmv_overlap``: ``sql_a``/``sql_b`` are subqueries
    yielding one string column ``v`` (the key to sketch)."""
    return (
        f"a AS (SELECT DISTINCT CAST(md5_number_upper(v) AS UBIGINT) AS h\n"
        f"      FROM ({sql_a})),\n"
        f"sa AS (SELECT h FROM a ORDER BY h LIMIT {k}),\n"
        f"b AS (SELECT DISTINCT CAST(md5_number_upper(v) AS UBIGINT) AS h\n"
        f"      FROM ({sql_b})),\n"
        f"sb AS (SELECT h FROM b ORDER BY h LIMIT {k}),\n"
        f"su AS (SELECT DISTINCT h FROM (SELECT h FROM sa UNION ALL"
        f" SELECT h FROM sb) ORDER BY h LIMIT {k}),\n"
        f"st AS (SELECT count(*) AS n_u, max(h) AS kth,\n"
        f"  count(*) FILTER (h IN (SELECT h FROM sa)"
        f" AND h IN (SELECT h FROM sb)) AS shared FROM su)\n"
        f"SELECT CAST({k} AS BIGINT) AS k,\n"
        f"  (SELECT count(*) FROM sa) AS n_a,\n"
        f"  (SELECT count(*) FROM sb) AS n_b,\n"
        f"  CAST(n_u AS BIGINT) AS n_union,\n"
        f"  CAST(COALESCE(kth, 0) AS UBIGINT) AS union_kth,\n"
        f"  CAST(shared AS BIGINT) AS n_shared,\n"
        f"  CAST(CASE WHEN n_u >= {k} AND kth > 0 THEN\n"
        f"    CAST(shared AS HUGEINT) * {k - 1}"
        f" * CAST(18446744073709551616 AS HUGEINT)"
        f" // (CAST({k} AS HUGEINT) * kth)\n"
        f"  ELSE shared END AS BIGINT) AS est_intersection\n"
        f"FROM st"
    )
