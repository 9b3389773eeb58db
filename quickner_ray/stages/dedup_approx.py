"""Approximate deduplication + similarity for training-data pipelines:
MinHash signatures, MinHash+LSH near-duplicate pairs (with exact n-gram
Jaccard verification), SimHash fingerprints, and embedding-cosine
most-similar pairs.

All hashes are md5-derived so the DuckDB oracle computes IDENTICAL values:
``h64(s) = int.from_bytes(md5(s).digest()[:8], "little")`` equals DuckDB's
``md5_number_upper(s)``. MinHash permutations are affine maps
``(a*h + b) mod 2**64`` — numpy uint64 wraparound on our side, UHUGEINT
modular arithmetic in SQL. (At production scale the hash is a pluggable
detail; md5 via hashlib runs at C speed and keeps the oracle exact.)

Ray Data shape (generalizes the reference's exact-dedup E1,
quickner.rs:538-557, to near-dup at web scale):

- signatures / simhash: stateless vectorized ``map_batches`` (one md5 per
  distinct shingle; no per-row Python beyond the tokenizer loop).
- LSH: docs -> band rows (``BANDS`` rows per doc, shingle set carried
  along) -> ``groupby(band_id, band_key).map_groups`` emits within-bucket
  pairwise exact Jaccard -> ``groupby(pair).max`` dedups pairs found in
  multiple bands. The only shuffle key is the band key; bucket sizes are
  bounded by ``MAX_BUCKET`` (hot buckets of identical docs would otherwise
  go quadratic — exact duplicates should be removed by E1 first).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..kernel.rounding import round_away

WORD_RE = re.compile(r"[a-z0-9]+")
WORD_RE_SQL = "[a-z0-9]+"  # RE2 class, identical semantics in DuckDB
WORD_SPLIT_RE_SQL = "[^a-z0-9]+"  # complement class (split form of WORD_RE)

# per-position shingle-combine multipliers (odd, 32-bit: keeps the DuckDB
# oracle's UHUGEINT partial sums below 2^128 — xxhash primes)
SH_C = np.array([0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D], dtype=np.uint64)

N_SHINGLE = 3  # word n-gram size
K_PERMS = 16
BANDS = 4
ROWS_PER_BAND = K_PERMS // BANDS
MAX_BUCKET = 200  # cap pairwise work per LSH bucket (scale guard)

# deterministic affine-permutation constants (odd multipliers)
PERM_A = np.array(
    [(2 * i + 1) * 0x9E3779B97F4A7C15 % 2**64 for i in range(K_PERMS)], dtype=np.uint64
)
PERM_B = np.array(
    [(i * i + 1) * 0xC2B2AE3D27D4EB4F % 2**64 for i in range(K_PERMS)], dtype=np.uint64
)


def h64(s: str) -> int:
    """Shared 64-bit string hash == DuckDB ``md5_number_upper(s)``."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


def shingle_hashes(text: str, n: int = N_SHINGLE) -> np.ndarray:
    """Distinct word-``n``-gram hashes (uint64), scalar reference path.

    Shingle hash = positional polynomial over per-WORD md5 hashes
    (``sum_j h64(w[i+j]) * SH_C[j] mod 2^64``) — md5 runs once per word,
    not once per n-gram, and the combine is plain integer arithmetic that
    the DuckDB oracle replicates exactly (``sql_shingle_ctes``). Texts with
    < n words contribute one shingle over the available words (so every doc
    has >= 1; zero words -> hash 0).

    Lowering uses the Arrow kernel, not ``str.lower()``: Arrow and DuckDB
    share simple (1:1) case mapping while Python applies full case mapping
    (e.g. U+0130 'İ' -> 'i' + combining dot), which would change the word
    split on such inputs."""
    lowered = pc.utf8_lower(pa.array([text]))[0].as_py()
    w = WORD_RE.findall(lowered)
    hw = np.fromiter((h64(x) for x in w), dtype=np.uint64, count=len(w))
    with np.errstate(over="ignore"):
        if len(w) >= n:
            h = np.zeros(len(w) - n + 1, dtype=np.uint64)
            for j in range(n):
                h += hw[j : len(w) - n + 1 + j] * SH_C[j]
        elif len(w):
            h = np.array([np.sum(hw * SH_C[: len(w)], dtype=np.uint64)])
        else:
            h = np.zeros(1, dtype=np.uint64)
    return np.unique(h)


def minhash_signature(hashes: np.ndarray) -> np.ndarray:
    """k-permutation MinHash signature of a shingle-hash set (uint64[k])."""
    with np.errstate(over="ignore"):
        return (hashes[:, None] * PERM_A[None, :] + PERM_B[None, :]).min(axis=0)


def _shingle_rows(texts, n: int = N_SHINGLE):
    """Vectorized batch shingling: Arrow string array -> distinct
    (row, shingle-hash) pairs, sorted by row.

    One Arrow lower+split over the whole batch, md5 only per DISTINCT word
    (dictionary-encode), n-gram combine as numpy uint64 arithmetic, per-row
    dedup via one lexsort. Returns ``(parents, hashes, starts)`` where
    ``starts[i]`` is the first index of row i's run (every row has >= 1
    shingle, mirroring ``shingle_hashes``)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_rows = len(texts)
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), WORD_SPLIT_RE_SQL)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    if len(flat):
        nonempty = pc.greater(pc.binary_length(flat), 0).to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        parents = parents[nonempty]
    enc = pc.dictionary_encode(flat)
    from ..kernel.md5vec import md5_h64

    vocab_h = md5_h64(enc.dictionary)
    codes = enc.indices.to_numpy(zero_copy_only=False)
    hw = vocab_h[codes] if len(codes) else np.empty(0, dtype=np.uint64)
    wc = np.bincount(parents, minlength=n_rows) if len(parents) else np.zeros(
        n_rows, dtype=np.int64
    )
    with np.errstate(over="ignore"):
        # full n-gram windows (rows with >= n words)
        if len(hw) >= n:
            win = np.zeros(len(hw) - n + 1, dtype=np.uint64)
            for j in range(n):
                win += hw[j : len(hw) - n + 1 + j] * SH_C[j]
            ok = parents[: -(n - 1)] == parents[n - 1 :]
            win_h, win_p = win[ok], parents[: -(n - 1)][ok]
        else:
            win_h = np.empty(0, dtype=np.uint64)
            win_p = np.empty(0, dtype=np.int64)
        # short rows (< n words, incl. zero): one polynomial over all words
        short = np.flatnonzero(wc < n)
        acc = np.zeros(n_rows, dtype=np.uint64)
        if len(parents):
            doc_start = np.searchsorted(parents, np.arange(n_rows))
            pos = np.arange(len(parents)) - doc_start[parents]
            sel = wc[parents] < n
            np.add.at(acc, parents[sel], hw[sel] * SH_C[pos[sel]])
    all_p = np.concatenate([win_p, short])
    all_h = np.concatenate([win_h, acc[short]])
    order = np.lexsort((all_h, all_p))
    p, h = all_p[order], all_h[order]
    keep = np.ones(len(p), dtype=bool)
    keep[1:] = (p[1:] != p[:-1]) | (h[1:] != h[:-1])
    p, h = p[keep], h[keep]
    starts = np.flatnonzero(np.r_[True, p[1:] != p[:-1]]) if len(p) else np.empty(
        0, dtype=np.int64
    )
    return p, h, starts


def _batch_signatures(texts) -> np.ndarray:
    """Vectorized per-row MinHash signatures: (n_rows, K_PERMS) uint64."""
    p, h, starts = _shingle_rows(texts)
    with np.errstate(over="ignore"):
        affine = h[:, None] * PERM_A[None, :] + PERM_B[None, :]
    sigs = np.minimum.reduceat(affine, starts, axis=0)
    return sigs, p, h, starts


def minhash_signatures_long(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Batch -> long-form signatures (doc_id, perm_id, sig). Oracle-checked
    shape: one row per (doc, permutation)."""
    doc_ids = batch.column("doc_id")
    n = len(doc_ids)
    sigs, _, _, _ = _batch_signatures(batch.column(text_col))
    return pa.Table.from_pydict(
        {
            "doc_id": doc_ids.take(
                pa.array(np.repeat(np.arange(n, dtype=np.int64), K_PERMS))
            ),
            "perm_id": pa.array(np.tile(np.arange(K_PERMS, dtype=np.int64), n)),
            "sig": pa.array(sigs.reshape(-1)),
        }
    )


def band_rows(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Batch -> LSH band rows (doc_id, band_id, band_key, shingles).

    ``band_key`` = ':'-joined decimal sigs of the band (string key shuffles
    cheaply and matches the SQL string_agg form). The distinct shingle-hash
    set rides along so bucket groups can verify exact Jaccard without a
    second pass over the corpus. Key strings are built with one Arrow
    element-wise join per band; the shingle list column is one ListArray
    over the vectorized shingle rows (no per-doc Python)."""
    doc_ids = batch.column("doc_id")
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    n = len(doc_ids)
    sigs, p, h, starts = _batch_signatures(batch.column(text_col))
    counts = np.diff(np.r_[starts, len(p)])
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    shingle_list = pa.ListArray.from_arrays(
        pa.array(offsets), pa.array(h, type=pa.uint64())
    )
    rep = np.repeat(np.arange(n, dtype=np.int64), BANDS)
    keys = []
    for b in range(BANDS):
        cols = [
            pa.array(sigs[:, b * ROWS_PER_BAND + r]).cast(pa.string())
            for r in range(ROWS_PER_BAND)
        ]
        keys.append(pc.binary_join_element_wise(*cols, ":"))
    key_all = pa.concat_arrays(keys)  # band-major: [b0 rows..., b1 rows...]
    # reorder band-major -> doc-major (d0b0, d0b1, ...): output row d*B+b
    # reads key_all[b*n + d]
    doc_major = np.tile(np.arange(BANDS, dtype=np.int64), n) * n + np.repeat(
        np.arange(n, dtype=np.int64), BANDS
    )
    return pa.Table.from_pydict(
        {
            "doc_id": doc_ids.take(pa.array(rep)).cast(pa.int64()),
            "band_id": pa.array(np.tile(np.arange(BANDS, dtype=np.int64), n)),
            "band_key": key_all.take(pa.array(doc_major)),
            "shingles": shingle_list.take(pa.array(rep)),
        }
    )


def jaccard(a: set, b: set) -> float:
    inter = len(a & b)
    if inter == 0:
        return 0.0
    return inter / (len(a) + len(b) - inter)


def _bucket_pairs(group: pa.Table) -> pa.Table:
    """Within one LSH bucket: all-pairs exact Jaccard (doc_a < doc_b)."""
    docs = group.column("doc_id").to_pylist()
    shingles = [set(s) for s in group.column("shingles").to_pylist()]
    order = np.argsort(docs, kind="stable")[:MAX_BUCKET]
    out_a, out_b, out_j = [], [], []
    for ii in range(len(order)):
        for jj in range(ii + 1, len(order)):
            i, j = order[ii], order[jj]
            out_a.append(docs[i])
            out_b.append(docs[j])
            out_j.append(round_away(jaccard(shingles[i], shingles[j]), 6))
    return pa.Table.from_pydict(
        {
            "doc_a": pa.array(out_a, type=pa.int64()),
            "doc_b": pa.array(out_b, type=pa.int64()),
            "jaccard": pa.array(out_j, type=pa.float64()),
        }
    )


def lsh_dup_pairs(ds, *, threshold: float = 0.5, text_col: str = "text"):
    """MinHash+LSH near-duplicate pairs with exact n-gram-Jaccard scores.

    Dataset(doc_id, text) -> Dataset(doc_a, doc_b, jaccard >= threshold).
    One shuffle on the band key; a second tiny groupby dedups pairs caught
    by multiple bands.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Max

    bands = ds.map_batches(
        lambda b: band_rows(b, text_col=text_col), batch_format="pyarrow"
    )
    pairs = bands.groupby(["band_id", "band_key"]).map_groups(
        _bucket_pairs, batch_format="pyarrow"
    )
    pairs = pairs.filter(
        expr=f"jaccard >= {threshold}"
    )
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Max("jaccard", alias_name="jaccard"))


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Batch -> (doc_id, simhash): 64-bit SimHash over word unigrams, each
    occurrence voting +/-1 per bit. Docs with zero words are dropped (the
    SQL oracle's unnest does the same).

    Vectorized: ONE split over the lowered batch, md5 computed only per
    DISTINCT word in the batch (Zipf: the vocabulary is far smaller than the
    occurrence stream), bit votes accumulated with a single scatter-add."""
    import pyarrow.compute as pc

    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_docs = len(texts)
    # findall(WORD_RE) == split on the complement class, empties dropped
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), "[^a-z0-9]+")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    if len(flat):
        keep = pc.greater(pc.binary_length(flat), 0).to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parents = parents[keep]
    doc_ids = batch.column("doc_id")
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    if not len(flat):
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "simhash": pa.array([], type=pa.uint64()),
            }
        )
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False)
    vocab = enc.dictionary.to_pylist()
    shifts = np.arange(64, dtype=np.uint64)
    vh = np.fromiter((h64(w) for w in vocab), dtype=np.uint64, count=len(vocab))
    vocab_bits = ((vh[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
    ones = np.zeros((n_docs, 64), dtype=np.int64)
    np.add.at(ones, parents, vocab_bits[codes])
    n_words = np.bincount(parents, minlength=n_docs)
    votes = 2 * ones - n_words[:, None]
    sims = ((votes > 0).astype(np.uint64) << shifts[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    has_words = n_words > 0
    return pa.Table.from_pydict(
        {
            "doc_id": doc_ids.take(pa.array(np.flatnonzero(has_words))),
            "simhash": pa.array(sims[has_words]),
        }
    )


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays."""
    x = np.bitwise_xor(a, b)
    # popcount via 8x uint8 view
    v = x.view(np.uint8).reshape(*x.shape, 8)
    return np.unpackbits(v, axis=-1).sum(axis=-1)


class EmbeddingPairScorer:
    """Actor-pool stage: all-pairs cosine of a batch against the broadcast
    full matrix (the "small side" shipped once via ray.put). Emits only
    pairs (a < b) in the batch-rows x all-rows block, pre-trimmed to the
    per-batch top ``k`` so the final global sort is tiny."""

    def __init__(self, mat_ref, k: int):
        import ray

        ids, mat = ray.get(mat_ref) if isinstance(mat_ref, ray.ObjectRef) else mat_ref
        self.all_ids = np.asarray(ids, dtype=np.int64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        self.unit = mat / np.where(norms == 0, 1.0, norms)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        dim = self.unit.shape[1]
        q = (
            col.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(-1, dim)
        )
        qn = np.linalg.norm(q, axis=1, keepdims=True)
        q = q / np.where(qn == 0, 1.0, qn)
        qids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cos = q @ self.unit.T  # (batch, all)
        mask = qids[:, None] < self.all_ids[None, :]  # pairs a < b only
        cos = np.where(mask, cos, -np.inf)
        flat = cos.ravel()
        n_keep = min(self.k, int(mask.sum()))
        if n_keep == 0:
            return pa.Table.from_pydict(
                {
                    "vec_a": pa.array([], type=pa.int64()),
                    "vec_b": pa.array([], type=pa.int64()),
                    "cos_sim": pa.array([], type=pa.float64()),
                }
            )
        top = np.argpartition(-flat, n_keep - 1)[:n_keep]
        ai, bi = np.unravel_index(top, cos.shape)
        return pa.Table.from_pydict(
            {
                "vec_a": pa.array(qids[ai]),
                "vec_b": pa.array(self.all_ids[bi]),
                "cos_sim": pa.array(round_away(flat[top], 6)),
            }
        )


def embedding_topk_pairs(emb_path: str, k: int = 20, *, batch_size: int = 512):
    """Top-k most-cosine-similar embedding pairs (brute force; the LSH/IVF
    bucketed variant in ``similarity.py`` is the >1M-row scale path)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    tab = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    ids = np.asarray(tab.column("vec_id").to_pylist(), dtype=np.int64)
    col = tab.column("embedding").combine_chunks()
    dim = len(col[0])
    mat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(-1, dim)
    ref = ray.put((ids, mat))
    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
    ds = ds.map_batches(
        EmbeddingPairScorer,
        fn_constructor_kwargs={"mat_ref": ref, "k": k},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 8),
    )
    return ds.sort(["cos_sim", "vec_a", "vec_b"], descending=[True, False, False]).limit(k)


# ---- DuckDB oracle SQL builders (keep constants in lockstep) ----------------

def sql_perm_values() -> str:
    return ", ".join(
        f"({i}, {int(PERM_A[i])}::UBIGINT, {int(PERM_B[i])}::UBIGINT)"
        for i in range(K_PERMS)
    )


def sql_shingle_ctes(table: str = "documents") -> str:
    """WITH-clauses: words -> distinct shingle hashes (h64) per doc.

    Mirrors ``shingle_hashes``: per-WORD md5 (``md5_number_upper`` ==
    ``h64``) combined positionally with the 32-bit ``SH_C`` multipliers mod
    2^64 (UHUGEINT partial sums stay < 2^128, so plain arithmetic is exact).
    ``range(1, len-1)`` yields the ``len(w) - n + 1`` 3-gram start positions
    (DuckDB lists are 1-based, ``range`` stop-exclusive)."""
    assert N_SHINGLE == 3  # the CASE arms below are written for 3-grams
    c0, c1, c2 = (int(c) for c in SH_C)
    m = "18446744073709551616"  # 2^64
    return (
        f"words AS (\n"
        f"  SELECT doc_id, list_transform(\n"
        f"    regexp_extract_all(lower(text), '{WORD_RE_SQL}'),\n"
        f"    w -> CAST(md5_number_upper(w) AS UHUGEINT)) AS hw FROM {table}\n"
        f"), sh AS (\n"
        f"  SELECT doc_id, unnest(CASE\n"
        f"    WHEN len(hw) >= 3 THEN list_transform(range(1, len(hw) - 1),\n"
        f"      i -> CAST((hw[i]*{c0} + hw[i+1]*{c1} + hw[i+2]*{c2}) % {m} AS UBIGINT))\n"
        f"    WHEN len(hw) = 2 THEN [CAST((hw[1]*{c0} + hw[2]*{c1}) % {m} AS UBIGINT)]\n"
        f"    WHEN len(hw) = 1 THEN [CAST((hw[1]*{c0}) % {m} AS UBIGINT)]\n"
        f"    ELSE [CAST(0 AS UBIGINT)] END) AS h64\n"
        f"  FROM words\n"
        f"), hsh AS (\n"
        f"  SELECT DISTINCT doc_id, h64 FROM sh\n"
        f")"
    )


def sql_sigs_cte() -> str:
    """CTE chain hsh -> long-form minhash signatures (needs sql_shingle_ctes
    before it)."""
    return (
        f"perms(perm_id, a, b) AS (VALUES {sql_perm_values()}),\n"
        f"sigs AS (\n"
        f"  SELECT doc_id, perm_id,\n"
        f"    CAST(min((CAST(a AS UHUGEINT)*h64 + b) % "
        f"CAST(18446744073709551616 AS UHUGEINT)) AS UBIGINT) AS sig\n"
        f"  FROM hsh CROSS JOIN perms GROUP BY doc_id, perm_id\n"
        f")"
    )


def sql_minhash_signatures(table: str = "documents") -> str:
    return (
        f"WITH {sql_shingle_ctes(table)}, {sql_sigs_cte()}\n"
        f"SELECT doc_id, perm_id, sig FROM sigs"
    )


def sql_lsh_pairs_cte() -> str:
    """CTE chain sigs -> verified near-dup candidate pairs (unfiltered).

    Mirrors ``_bucket_pairs``'s MAX_BUCKET guard exactly: each LSH bucket is
    truncated to its MAX_BUCKET lowest doc ids before pair enumeration, so
    the oracle and the Ray path agree even on oversized buckets."""
    return (
        f"bands AS (\n"
        f"  SELECT * FROM (\n"
        f"    SELECT doc_id, perm_id // {ROWS_PER_BAND} AS band_id,\n"
        f"      string_agg(sig, ':' ORDER BY perm_id) AS band_key\n"
        f"    FROM sigs GROUP BY doc_id, perm_id // {ROWS_PER_BAND})\n"
        f"  QUALIFY row_number() OVER (PARTITION BY band_id, band_key ORDER BY doc_id)"
        f" <= {MAX_BUCKET}\n"
        f"), cand AS (\n"
        f"  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b\n"
        f"  FROM bands x JOIN bands y ON x.band_id = y.band_id "
        f"AND x.band_key = y.band_key AND x.doc_id < y.doc_id\n"
        f"), sizes AS (\n"
        f"  SELECT doc_id, count(*) AS n FROM hsh GROUP BY doc_id\n"
        f"), inter AS (\n"
        f"  SELECT c.doc_a, c.doc_b, count(*) AS n_inter\n"
        f"  FROM cand c JOIN hsh a ON a.doc_id = c.doc_a "
        f"JOIN hsh b ON b.doc_id = c.doc_b AND b.h64 = a.h64\n"
        f"  GROUP BY c.doc_a, c.doc_b\n"
        f"), pairs AS (\n"
        f"  SELECT i.doc_a, i.doc_b,\n"
        f"    ROUND(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 6) AS jaccard\n"
        f"  FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a "
        f"JOIN sizes sb ON sb.doc_id = i.doc_b\n"
        f")"
    )


def sql_lsh_dup_pairs(threshold: float = 0.5, table: str = "documents") -> str:
    return (
        f"WITH {sql_shingle_ctes(table)}, {sql_sigs_cte()}, {sql_lsh_pairs_cte()}\n"
        f"SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= {threshold}"
    )


def sql_dedup_keep_docs(threshold: float = 0.5, table: str = "documents") -> str:
    """Greedy keep-first dedup: drop every doc that near-duplicates a
    lower-id doc."""
    return (
        f"WITH {sql_shingle_ctes(table)}, {sql_sigs_cte()}, {sql_lsh_pairs_cte()}\n"
        f"SELECT doc_id FROM {table} WHERE doc_id NOT IN "
        f"(SELECT DISTINCT doc_b FROM pairs WHERE jaccard >= {threshold})"
    )


def sql_dup_clusters(threshold: float = 0.5, table: str = "documents") -> str:
    """Connected components of the verified near-dup pair graph: for each
    doc, the min doc_id reachable through pairs with jaccard >= threshold.
    The recursive CTE enumerates (node, reachable-label) facts — UNION
    dedup terminates it — and min-aggregates per node, which is exactly
    the fixpoint the distributed min-label propagation computes."""
    return (
        f"WITH RECURSIVE {sql_shingle_ctes(table)}, {sql_sigs_cte()}, "
        f"{sql_lsh_pairs_cte()},\n"
        f"dup AS (SELECT doc_a, doc_b FROM pairs WHERE jaccard >= {threshold}),\n"
        f"edges AS (SELECT doc_a AS src, doc_b AS dst FROM dup\n"
        f"  UNION ALL SELECT doc_b, doc_a FROM dup),\n"
        f"reach(node, lab) AS (\n"
        f"  SELECT doc_id, doc_id FROM {table}\n"
        f"  UNION\n"
        f"  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node\n"
        f")\n"
        f"SELECT node AS doc_id, min(lab) AS component FROM reach GROUP BY node"
    )


def sql_simhash(table: str = "documents") -> str:
    return (
        f"WITH words AS (\n"
        f"  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{WORD_RE_SQL}')) AS w\n"
        f"  FROM {table}\n"
        f"), wh AS (\n"
        f"  SELECT doc_id, CAST(md5_number_upper(w) AS HUGEINT) AS h64 FROM words\n"
        f"), bits AS (\n"
        f"  SELECT doc_id, bit, sum(CASE WHEN (h64 >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS v\n"
        f"  FROM wh CROSS JOIN (SELECT CAST(unnest(range(64)) AS HUGEINT) AS bit) b\n"
        f"  GROUP BY doc_id, bit\n"
        f")\n"
        f"SELECT doc_id, CAST(sum(CASE WHEN v > 0 THEN CAST(1 AS HUGEINT) << CAST(bit AS INTEGER)\n"
        f"  ELSE CAST(0 AS HUGEINT) END) AS UBIGINT) AS simhash\n"
        f"FROM bits GROUP BY doc_id"
    )


def sql_embedding_topk_pairs(k: int = 20, table: str = "embeddings") -> str:
    return (
        f"SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,\n"
        f"  ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
        f"CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim\n"
        f"FROM {table} a JOIN {table} b ON a.vec_id < b.vec_id\n"
        f"ORDER BY cos_sim DESC, vec_a, vec_b LIMIT {k}"
    )


# -- benchmark decontamination ------------------------------------------------


def benchmark_shingles(texts: list[str]) -> np.ndarray:
    """Benchmark-set shingle hashes, sorted for searchsorted membership."""
    if not texts:
        return np.empty(0, dtype=np.uint64)
    _, h, _ = _shingle_rows(pa.array(texts, type=pa.string()))
    return np.unique(h)


def contamination_counts(ds, bench_hashes: np.ndarray, *, text_col: str = "text"):
    """Benchmark decontamination: Dataset(doc_id, text) ->
    Dataset(doc_id, n_shared) for every doc sharing >= 1 word-n-gram
    shingle with the benchmark set (n_shared = distinct shared shingles).

    The benchmark shingle set is SMALL by definition (a test set, not the
    corpus) — it broadcasts once via ``ray.put`` as a sorted uint64 array
    and membership is one ``searchsorted`` per batch.  Zero shuffles; the
    flagged set streams out for the downstream anti-join
    (``antijoin.anti_join``) that actually drops contaminated docs.
    """
    import ray

    ref = ray.put(np.asarray(bench_hashes, dtype=np.uint64))

    def f(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "n_shared": pa.array([], type=pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        hs = ray.get(ref)
        p, h, _ = _shingle_rows(batch.column(text_col))
        if len(hs) == 0 or len(h) == 0:
            return empty
        idx = np.searchsorted(hs, h)
        idx[idx == len(hs)] = 0
        found = hs[idx] == h
        n_shared = np.bincount(p[found], minlength=batch.num_rows)
        rows = np.flatnonzero(n_shared)
        if not len(rows):
            return empty
        ids = batch.column("doc_id").take(pa.array(rows))
        return pa.table(
            {
                "doc_id": ids,
                "n_shared": pa.array(n_shared[rows], type=pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def sql_contamination(bench_max_doc_id: int = 20, table: str = "documents") -> str:
    """Oracle: benchmark set = docs with doc_id < ``bench_max_doc_id`` of
    the same corpus (deterministic, no external data); n_shared = distinct
    shingles shared with it."""
    return (
        f"WITH {sql_shingle_ctes(table)},\n"
        f"bench AS (SELECT DISTINCT h64 FROM hsh WHERE doc_id < {bench_max_doc_id})\n"
        f"SELECT h.doc_id, CAST(count(*) AS BIGINT) AS n_shared\n"
        f"FROM hsh h JOIN bench b ON b.h64 = h.h64\n"
        f"GROUP BY h.doc_id"
    )


def sql_dup_cluster_sizes(threshold: float = 0.5, table: str = "documents") -> str:
    """Oracle for ``q_dup_cluster_sizes``: (cluster_size, n_clusters)
    histogram over the connected components of the near-dup graph."""
    return (
        sql_dup_clusters(threshold, table).replace(
            "SELECT node AS doc_id, min(lab) AS component FROM reach GROUP BY node",
            ", cc AS (SELECT node, min(lab) AS component FROM reach GROUP BY node),\n"
            "cs AS (SELECT component, count(*) AS cluster_size FROM cc GROUP BY component)\n"
            "SELECT CAST(cluster_size AS BIGINT) AS cluster_size,\n"
            "  CAST(count(*) AS BIGINT) AS n_clusters\n"
            "FROM cs GROUP BY cluster_size",
        )
    )


# -- corpus-internal duplicate-shingle fraction (Lee et al. dedup metric) ----


def dup_shingle_stats(ds, *, text_col: str = "text", num_partitions: int = 8):
    """Per-doc fraction of distinct word-n-gram shingles that appear in at
    least one OTHER document — the corpus-internal exact-substring
    duplication signal (the intra-corpus counterpart of ``contamination``,
    which compares against a broadcast test set).

    Scale shape: doc-shingle pairs -> shingle-df aggregate (shuffle keyed
    on the uniform 64-bit shingle hash — no salting needed) -> one
    hash-partitioned join back on the same key -> per-doc count reduce.
    The two wide ops share the shingle-hash partitioning key. Exact; the
    probabilistic alternative when even the df table is too wide is the CMS
    sketch (sketch.py)."""
    from ray.data.aggregate import Count, Sum

    def pairs(batch: pa.Table) -> pa.Table:
        p, h, _ = _shingle_rows(batch.column(text_col))
        ids = batch.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.Table.from_pydict(
            {
                "doc_id": ids.take(pa.array(p)),
                # int64 view of the uint64 hash (bit-pattern preserving) —
                # Ray's hash join hashes int64 natively; the SQL mirror
                # applies the same reinterpretation
                "h": pa.array(h.view(np.int64)),
            }
        )

    pair_ds = ds.map_batches(pairs, batch_format="pyarrow")
    df = (
        pair_ds.groupby("h")
        .aggregate(Count(alias_name="df"))
        .repartition(num_partitions)  # normalize empty-block schemas for acero
    )
    joined = pair_ds.join(
        df, "inner", num_partitions=num_partitions, on=("h",)
    )

    def flag(b: pa.Table) -> pa.Table:
        dup = pc.greater(b.column("df"), pa.scalar(1)).cast(pa.int64())
        return pa.Table.from_pydict({"doc_id": b.column("doc_id"), "dup": dup})

    agg = (
        joined.map_batches(flag, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Count(alias_name="n_shingles"), Sum("dup", alias_name="n_dup"))
    )

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n_shingles").to_numpy(zero_copy_only=False).astype(np.float64)
        d = b.column("n_dup").combine_chunks().cast(pa.int64())
        frac = d.to_numpy(zero_copy_only=False) / n
        return pa.Table.from_pydict(
            {
                "doc_id": b.column("doc_id"),
                "n_shingles": b.column("n_shingles"),
                "n_dup": d,
                "dup_frac": pa.array(frac, type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def sql_dup_shingle_stats(table: str = "documents") -> str:
    return (
        f"WITH {sql_shingle_ctes(table)},\n"
        f"df AS (SELECT h64, count(*) AS df FROM hsh GROUP BY h64)\n"
        f"SELECT h.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,\n"
        f"  CAST(count(*) FILTER (d.df > 1) AS BIGINT) AS n_dup,\n"
        f"  count(*) FILTER (d.df > 1) / count(*) AS dup_frac\n"
        f"FROM hsh h JOIN df d ON d.h64 = h.h64\n"
        f"GROUP BY h.doc_id"
    )


# --- random-hyperplane (SimHash-for-embeddings) LSH buckets -------------------

HP_PLANES = 16
HP_DIM = 64
HP_SEED = 2024


def hyperplanes(n_planes: int = HP_PLANES, dim: int = HP_DIM, seed: int = HP_SEED) -> np.ndarray:
    """Deterministic random hyperplanes (seeded standard normals). Shared
    verbatim by the SQL-oracle generator, so both engines use the exact
    same float64 coefficients (repr round-trips bit-exactly)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def add_hyperplane_bucket(batch: pa.Table, planes: np.ndarray | None = None) -> pa.Table:
    """Random-hyperplane LSH bucket per embedding: bit p = (e . r_p) > 0,
    bucket = sum bit_p * 2^p. Cosine-similar vectors collide with high
    probability — the bucket key is the shuffle key for embedding
    near-dup at 10^9+ vectors (within-bucket pairwise only, the same
    shape as the MinHash LSH path; brute-force top-k stays the oracle at
    small scale).

    Dot products accumulate IN DIMENSION ORDER (acc += e_i * c_i for
    i = 0..d-1): IEEE addition is order-sensitive, and the generated SQL
    oracle is a left-associated ``+`` chain with the identical order, so
    the sign test matches bit-for-bit."""
    from .similarity import _mat_from_list_col

    if planes is None:
        planes = hyperplanes()
    n_planes, dim = planes.shape
    mat = _mat_from_list_col(batch.column("embedding"), dim)
    acc = np.zeros((len(mat), n_planes), dtype=np.float64)
    for i in range(dim):
        acc += mat[:, i : i + 1] * planes[:, i][None, :]
    bits = acc > 0.0
    bucket = (bits << np.arange(n_planes, dtype=np.int64)[None, :]).sum(
        axis=1, dtype=np.int64
    )
    return pa.Table.from_pydict(
        {
            "vec_id": batch.column("vec_id"),
            "bucket": pa.array(bucket, type=pa.int64()),
        }
    )


def sql_hyperplane_buckets(table: str = "embeddings", n_planes: int = HP_PLANES) -> str:
    """Generated oracle: one left-associated product chain per plane with
    the literal (repr round-trip) coefficients of ``hyperplanes()``."""
    planes = hyperplanes(n_planes)
    terms = []
    for p in range(planes.shape[0]):
        chain = " + ".join(
            f"CAST(embedding[{i + 1}] AS DOUBLE) * ({planes[p, i]!r})"
            for i in range(planes.shape[1])
        )
        terms.append(f"(CASE WHEN {chain} > 0 THEN {1 << p} ELSE 0 END)")
    expr = "\n    + ".join(terms)
    return f"SELECT vec_id, CAST({expr} AS BIGINT) AS bucket FROM {table}"


def embedding_lsh_pairs(
    ds,
    *,
    n_planes: int = 8,
    threshold: float = 0.2,
    max_bucket: int = MAX_BUCKET,
):
    """Embedding near-dup candidate pairs via random-hyperplane LSH: ONE
    shuffle on the bucket key, exact cosine only within each bucket.

    Dataset(vec_id, embedding) -> Dataset(vec_a, vec_b, cos_sim >= threshold),
    vec_a < vec_b. This is the 10^9-vector scale path for embedding near-dup
    (the brute-force all-pairs ``embedding_topk_pairs`` stays the exactness
    oracle at small scale): bucket occupancy ~ N / 2^n_planes, so n_planes
    grows with the corpus and within-bucket work stays bounded. ``max_bucket``
    caps quadratic blowup on pathological buckets (the ``max_bucket`` lowest
    vec_ids are kept); the SQL oracle mirrors the cap exactly via QUALIFY.
    """
    planes = hyperplanes(n_planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        out = add_hyperplane_bucket(batch, planes)
        return out.append_column("embedding", batch.column("embedding"))

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_numpy()
        order = np.argsort(ids, kind="stable")[:max_bucket]
        from .similarity import _mat_from_list_col

        mat = _mat_from_list_col(group.column("embedding"))[order]
        ids = ids[order]
        norms = np.linalg.norm(mat, axis=1)
        # Zero-norm vectors have undefined cosine: drop them before pairing
        # (the SQL oracle mirrors this with a dot-product > 0 guard).
        nz = norms > 0
        mat, ids, norms = mat[nz], ids[nz], norms[nz]
        unit = mat / norms[:, None]
        gram = round_away(unit @ unit.T, 6)
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = gram[ii, jj] >= threshold
        return pa.Table.from_pydict(
            {
                "vec_a": pa.array(ids[ii[keep]], type=pa.int64()),
                "vec_b": pa.array(ids[jj[keep]], type=pa.int64()),
                "cos_sim": pa.array(gram[ii, jj][keep], type=pa.float64()),
            }
        )

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")
    return bucketed.groupby("bucket").map_groups(
        bucket_pairs, batch_format="pyarrow"
    )


def sql_embedding_lsh_pairs(
    n_planes: int = 8,
    threshold: float = 0.2,
    max_bucket: int = MAX_BUCKET,
    table: str = "embeddings",
) -> str:
    """Exact oracle for ``embedding_lsh_pairs``: same literal hyperplane
    coefficients, same bucket cap (QUALIFY row_number <= max_bucket on
    vec_id order), DOUBLE[] cosine rounded to 6 (absorbs summation-order
    ulps, like the ``similarity_topk`` oracle)."""
    return (
        f"WITH bk AS ({sql_hyperplane_buckets(table, n_planes)}),\n"
        f"capped AS (SELECT vec_id, bucket FROM bk QUALIFY\n"
        f"  row_number() OVER (PARTITION BY bucket ORDER BY vec_id) <= {max_bucket})\n"
        f"SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,\n"
        f"  ROUND(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),\n"
        f"        CAST(eb.embedding AS DOUBLE[])), 6) AS cos_sim\n"
        f"FROM capped a JOIN capped b ON a.bucket = b.bucket AND a.vec_id < b.vec_id\n"
        f"JOIN {table} ea ON ea.vec_id = a.vec_id\n"
        f"JOIN {table} eb ON eb.vec_id = b.vec_id\n"
        f"WHERE list_dot_product(CAST(ea.embedding AS DOUBLE[]),\n"
        f"      CAST(ea.embedding AS DOUBLE[])) > 0\n"
        f"  AND list_dot_product(CAST(eb.embedding AS DOUBLE[]),\n"
        f"      CAST(eb.embedding AS DOUBLE[])) > 0\n"
        f"  AND ROUND(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),\n"
        f"      CAST(eb.embedding AS DOUBLE[])), 6) >= {threshold}"
    )


SIMHASH_BANDS = 4  # 16-bit bands; pigeonhole: hamming <= BANDS-1 -> >=1 band equal
SIMHASH_MAX_HAMMING = 3


def simhash_band_rows(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Batch -> (band_id, band_key, doc_id, simhash): the 64-bit SimHash
    split into ``SIMHASH_BANDS`` 16-bit bands — the shuffle key for
    hamming-distance near-dup search (two hashes with hamming <=
    SIMHASH_MAX_HAMMING < SIMHASH_BANDS must agree on >= 1 whole band)."""
    import numpy as np

    sh = simhash_batch(batch, text_col)
    sims = sh.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
    n = len(sims)
    if not n:
        return pa.table(
            {
                "band_id": pa.array([], type=pa.int64()),
                "band_key": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=sh.column("doc_id").type),
                "simhash": pa.array([], type=pa.uint64()),
            }
        )
    bands = np.arange(SIMHASH_BANDS, dtype=np.uint64)
    keys = (sims[:, None] >> (bands[None, :] * np.uint64(16))) & np.uint64(0xFFFF)
    rep = np.repeat(np.arange(n), SIMHASH_BANDS)
    return pa.table(
        {
            "band_id": pa.array(np.tile(bands.astype(np.int64), n)),
            "band_key": pa.array(keys.reshape(-1).astype(np.int64)),
            "doc_id": sh.column("doc_id").take(pa.array(rep)),
            "simhash": pa.array(sims[rep]),
        }
    )


def _simhash_bucket_pairs(group: pa.Table) -> pa.Table:
    """Within one band bucket: all-pairs hamming over the MAX_BUCKET lowest
    doc ids (quadratic guard, QUALIFY-mirrored in the SQL oracle)."""
    import numpy as np

    docs = group.column("doc_id").to_numpy(zero_copy_only=False)
    sims = group.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
    order = np.argsort(docs, kind="stable")[:MAX_BUCKET]
    docs, sims = docs[order], sims[order]
    k = len(docs)
    empty = pa.table(
        {
            "doc_a": pa.array([], type=pa.int64()),
            "doc_b": pa.array([], type=pa.int64()),
            "hamming": pa.array([], type=pa.int64()),
        }
    )
    if k < 2:
        return empty
    iu, ju = np.triu_indices(k, 1)
    ham = hamming64(sims[iu], sims[ju]).astype(np.int64)
    return pa.table(
        {
            "doc_a": pa.array(docs[iu].astype(np.int64)),
            "doc_b": pa.array(docs[ju].astype(np.int64)),
            "hamming": pa.array(ham),
        }
    )


def simhash_dup_pairs(
    ds, *, max_hamming: int = SIMHASH_MAX_HAMMING, text_col: str = "text"
):
    """SimHash hamming near-dup pairs: Dataset(doc_id, text) ->
    Dataset(doc_a, doc_b, hamming <= max_hamming), complete for
    ``max_hamming < SIMHASH_BANDS`` by pigeonhole. One shuffle on the
    16-bit band key; a tiny pair groupby dedups multi-band hits."""
    from ray.data.aggregate import Min

    rows = ds.map_batches(
        lambda b: simhash_band_rows(b, text_col), batch_format="pyarrow"
    )
    pairs = rows.groupby(["band_id", "band_key"]).map_groups(
        _simhash_bucket_pairs, batch_format="pyarrow"
    )
    pairs = pairs.filter(expr=f"hamming <= {max_hamming}")
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )


def sql_simhash_dup_pairs(
    *, max_hamming: int = SIMHASH_MAX_HAMMING, table: str = "documents"
) -> str:
    """Oracle: same bands, same MAX_BUCKET cap (QUALIFY mirror), hamming
    via bit_count(xor())."""
    return (
        f"WITH sh AS MATERIALIZED ({sql_simhash(table)}),\n"
        f"bands AS (SELECT doc_id, simhash, j AS band_id,\n"
        f"  CAST((simhash >> CAST(16 * j AS INTEGER)) & 65535 AS BIGINT)"
        f" AS band_key\n"
        f"  FROM sh CROSS JOIN (SELECT unnest(range({SIMHASH_BANDS})) AS j)),\n"
        f"capped AS (SELECT * FROM bands QUALIFY\n"
        f"  row_number() OVER (PARTITION BY band_id, band_key ORDER BY doc_id)"
        f" <= {MAX_BUCKET}),\n"
        f"cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,\n"
        f"    a.simhash AS sa, b.simhash AS sb\n"
        f"  FROM capped a JOIN capped b ON a.band_id = b.band_id\n"
        f"    AND a.band_key = b.band_key AND a.doc_id < b.doc_id)\n"
        f"SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming\n"
        f"FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}"
    )
