"""Exact set-similarity self-join with prefix filtering (PPJoin-style).

All document pairs whose word-3-gram SHINGLE-set Jaccard similarity
clears a threshold τ — exactly, with NO false negatives, unlike the
MinHash/LSH and SimHash banding paths (probabilistic recall). This is
the AllPairs/PPJoin family (Bayardo et al. WWW'07, Xiao et al. WWW'08):
under ANY consistent global order on set elements, a set with n elements
needs only its first ``p = n - ceil(τ·n) + 1`` elements (its *prefix*)
indexed — two sets with Jaccard ≥ τ must share a prefix element.

Set elements are the repo's standard near-dup signal: distinct h64 word
3-gram shingle hashes (the same construction MinHash signs, so this is
the exact ground truth for the LSH pipeline). The global element order
is ``(is_hot, hash)``: the exact top-K most frequent shingles (template
boilerplate — the ONLY elements whose candidate buckets can go
quadratic) sort LAST so they never enter a prefix unless a doc consists
of nothing else, and everything else orders by hash value, known to
every worker for free. The hot set is computed by one combiner-bounded
count pass + a tiny global sort-limit (deterministic: ties at the K
boundary break by (count desc, hash asc)), broadcast as one sorted
uint64 array — bounded state, unlike a full df table. ANY consistent
global order preserves the prefix-filter completeness theorem; hotness
only improves pruning (classic PPJoin uses full df-ascending order,
which needs corpus-scale rank state).

Distributed shape:
1. hot pass — per-batch shingle-count combiner -> groupby-sum ->
   top-K sort-limit -> broadcast sorted hot array.
2. prefix emit — zero-shuffle per-batch pass: distinct shingles per doc
   (``_shingle_rows``), per-doc lexsort by (is_hot, hash), keep the
   first p per doc, carry the set size.
3. bucket verify — ONE groupby on the prefix shingle. Each doc's FULL
   sorted shingle array rides along with its prefix rows (the band_rows
   rideshare trick, so verification needs no second corpus pass and no
   joins); within a bucket, pairs (da < db) are pruned by the PPJoin
   size filter (J >= tau forces den*min(na,nb) >= num*max(na,nb)) and
   the positional filter (overlap can't exceed
   1 + min(na-ia-1, nb-jb-1) given the bucket shingle's position in
   each doc), then verified by exact sorted-array intersection; the
   Jaccard test is the integer cross-multiply
   ``den*inter >= num*(na+nb-inter)``. Cross-bucket duplicate hits fold
   in a final (tiny: only qualifying pairs) pair-key groupby.

All integers — the DuckDB oracle (brute-force all-pairs over the same
``hsh`` shingle CTE the MinHash oracle uses) matches bit-for-bit, and
prefix filtering is provably output-identical to the exhaustive join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup_approx import _shingle_rows

TAU = (1, 2)  # Jaccard threshold as an exact rational (0.5)


def _prefix_len(n: np.ndarray, num: int, den: int) -> np.ndarray:
    """p = n - ceil(num*n/den) + 1 (every doc has >= 1 shingle)."""
    ceil_tau_n = (num * n + den - 1) // den
    return n - ceil_tau_n + 1


def _doc_shingles(b: pa.Table, text_col: str, id_col: str):
    """(doc ids np, parents np, hashes np, sizes np) for a batch; hashes
    ascending within each doc (the _shingle_rows lexsort invariant)."""
    p, h, starts = _shingle_rows(b.column(text_col))
    ids = b.column(id_col)
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    idv = ids.to_numpy(zero_copy_only=False)
    counts = np.diff(np.r_[starts, len(p)])
    return idv, p, h, counts.astype(np.int64)


def shingle_postings(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset -> (doc, sh, n): distinct shingle postings with the doc's
    set size attached (verification never joins a separate sizes table)."""

    def gen(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "doc": pa.array([], type=pa.int64()),
                    "sh": pa.array([], type=pa.uint64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        idv, p, h, sizes = _doc_shingles(b, text_col, id_col)
        return pa.table(
            {
                "doc": pa.array(idv[p], type=pa.int64()),
                "sh": pa.array(h, type=pa.uint64()),
                "n": pa.array(sizes[p]),
            }
        )

    return ds.map_batches(gen, batch_format="pyarrow")


def hot_shingles(
    ds, *, k: int = 65536, hot_min: int = 4, text_col: str = "text"
) -> "np.ndarray":
    """Top-``k`` most frequent shingles among those with count >=
    ``hot_min``: per-batch count combiner (one row per distinct shingle
    per batch) -> groupby-sum -> threshold filter (shingles colder than
    hot_min produce trivially small buckets and need not be ranked — the
    filter keeps the global sort input tiny) -> sort by (count desc,
    hash asc) -> limit k. Deterministic: a pure function of the corpus.
    Returns a SORTED uint64 array for searchsorted membership tests."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {"sh": pa.array([], type=pa.int64()),
             "c": pa.array([], type=pa.int64())}
        )
        if b.num_rows == 0:
            return empty
        _, h, _ = _shingle_rows(b.column(text_col))
        if not len(h):
            return empty
        vals, counts = np.unique(h, return_counts=True)
        # int64 reinterpret: Ray's sort/shuffle machinery rejects uint64
        # keys; two's-complement view round-trips exactly and any total
        # order works for the deterministic K-boundary tiebreak
        return pa.table(
            {"sh": pa.array(vals.view(np.int64)),
             "c": pa.array(counts.astype(np.int64))}
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("sh")
        .aggregate(Sum("c", alias_name="c"))
    )

    def thresh(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"sh": pa.array([], type=pa.int64()),
                 "c": pa.array([], type=pa.int64())}
            )
        import pyarrow.compute as pc

        return b.filter(pc.greater_equal(b.column("c"), hot_min))

    counts = counts.map_batches(thresh, batch_format="pyarrow")
    top = counts.sort(key=["c", "sh"], descending=[True, False]).limit(k)
    hot = np.array([r["sh"] for r in top.take_all()], dtype=np.int64).view(np.uint64)
    hot.sort()
    return hot


def similarity_join(
    ds,
    *,
    tau: tuple[int, int] = TAU,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 8,
    hot_k: int = 65536,
):
    """Exact shingle-Jaccard self-join: Dataset(doc_a, doc_b, n_inter,
    n_union) for every pair with ``n_inter/n_union >= tau`` (doc_a <
    doc_b). ``ds`` is consumed twice (prefix pass + postings pass) — pass
    a re-readable Dataset; both read only (id, text)."""
    import ray
    from ray.data.aggregate import Count

    num, den = tau
    hot_ref = ray.put(hot_shingles(ds, k=hot_k, text_col=text_col))

    def prefix_rows(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "sh": pa.array([], type=pa.uint64()),
                "doc": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
                "pos": pa.array([], type=pa.int64()),
                "lst": pa.array([], type=pa.list_(pa.uint64())),
            }
        )
        if b.num_rows == 0:
            return empty
        idv, p, h, sizes = _doc_shingles(b, text_col, id_col)
        if not len(p):
            return empty
        plen = _prefix_len(sizes, num, den)
        hot = ray.get(hot_ref)
        if len(hot):
            pos = np.searchsorted(hot, h)
            is_hot = (pos < len(hot)) & (hot[np.minimum(pos, len(hot) - 1)] == h)
        else:
            is_hot = np.zeros(len(h), dtype=bool)
        # global order (is_hot, hash): re-sort each doc run so hot
        # (bucket-quadratic) shingles fall OUT of the prefix
        o = np.lexsort((h, is_hot.astype(np.int8), p))
        p_o, h_o = p[o], h[o]
        first = np.r_[True, p_o[1:] != p_o[:-1]]
        grp_start = np.maximum.accumulate(np.where(first, np.arange(len(p_o)), 0))
        within = np.arange(len(p_o)) - grp_start
        keep = within < plen[p_o]
        rows_k = p_o[keep]
        # rideshare: each prefix row carries its doc's FULL hash-sorted
        # shingle array (one ListArray gather, no per-doc Python)
        offsets = np.zeros(len(sizes) + 1, dtype=np.int32)
        np.cumsum(sizes, out=offsets[1:])
        full = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(h, type=pa.uint64())
        )
        return pa.table(
            {
                "sh": pa.array(h_o[keep], type=pa.uint64()),
                "doc": pa.array(idv[rows_k], type=pa.int64()),
                "n": pa.array(sizes[rows_k]),
                "pos": pa.array(within[keep].astype(np.int64)),
                "lst": full.take(pa.array(rows_k)),
            }
        )

    prefixes = ds.map_batches(prefix_rows, batch_format="pyarrow")

    def bucket_verify(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "n_inter": pa.array([], type=pa.int64()),
                "n_union": pa.array([], type=pa.int64()),
            }
        )
        if g.num_rows < 2:
            return empty
        docs = g.column("doc").combine_chunks().to_numpy(zero_copy_only=False)
        ns = g.column("n").combine_chunks().to_numpy(zero_copy_only=False)
        poss = g.column("pos").combine_chunks().to_numpy(zero_copy_only=False)
        lst = g.column("lst")
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        o = np.argsort(docs, kind="stable")
        docs, ns, poss = docs[o], ns[o], poss[o]
        vals = lst.values.to_numpy(zero_copy_only=False)
        offs = lst.offsets.to_numpy(zero_copy_only=False)
        ii, jj = np.triu_indices(len(docs), k=1)
        na, nb = ns[ii], ns[jj]
        # size filter (exact): den*min >= num*max
        ok = den * np.minimum(na, nb) >= num * np.maximum(na, nb)
        # positional filter (exact): required overlap o_req =
        # ceil(num*(na+nb)/(num+den)); achievable <= 1 + min(rest_a, rest_b)
        o_req = (num * (na + nb) + (num + den) - 1) // (num + den)
        bound = 1 + np.minimum(na - poss[ii] - 1, nb - poss[jj] - 1)
        ok &= bound >= o_req
        out_a, out_b, out_i, out_u = [], [], [], []
        oi = o  # original row index per sorted position
        for a_s, b_s in zip(ii[ok], jj[ok]):
            ra, rb = oi[a_s], oi[b_s]
            sa = vals[offs[ra] : offs[ra + 1]]
            sb = vals[offs[rb] : offs[rb + 1]]
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            uni = len(sa) + len(sb) - inter
            if den * inter >= num * uni:
                out_a.append(int(docs[a_s]))
                out_b.append(int(docs[b_s]))
                out_i.append(inter)
                out_u.append(uni)
        if not out_a:
            return empty
        return pa.table(
            {
                "doc_a": pa.array(out_a, type=pa.int64()),
                "doc_b": pa.array(out_b, type=pa.int64()),
                "n_inter": pa.array(out_i, type=pa.int64()),
                "n_union": pa.array(out_u, type=pa.int64()),
            }
        )

    hits = prefixes.groupby("sh").map_groups(bucket_verify, batch_format="pyarrow")
    # a qualifying pair can be found via several shared prefix shingles —
    # fold duplicates (tiny: only pairs that already passed tau)
    deduped = hits.groupby(["doc_a", "doc_b", "n_inter", "n_union"]).aggregate(
        Count(alias_name="_c")
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "doc_a": pa.array([], type=pa.int64()),
                    "doc_b": pa.array([], type=pa.int64()),
                    "n_inter": pa.array([], type=pa.int64()),
                    "n_union": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {c: b.column(c) for c in ("doc_a", "doc_b", "n_inter", "n_union")}
        )

    return deduped.map_batches(finish, batch_format="pyarrow")


def sql_similarity_join(tau: tuple[int, int] = TAU, table: str = "documents") -> str:
    """Brute-force oracle: all-pairs exact Jaccard over the SAME distinct
    shingle sets (``hsh`` CTE shared with the MinHash oracle). Prefix
    filtering is a pure optimization — results must be identical to the
    exhaustive join."""
    from .dedup_approx import sql_shingle_ctes

    num, den = tau
    return (
        f"WITH {sql_shingle_ctes(table)},\n"
        f"sz AS (SELECT doc_id, count(*) AS n FROM hsh GROUP BY doc_id),\n"
        f"i AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter\n"
        f"      FROM hsh a JOIN hsh b ON a.h64 = b.h64 AND a.doc_id < b.doc_id\n"
        f"      GROUP BY 1, 2)\n"
        f"SELECT da AS doc_a, db AS doc_b, CAST(inter AS BIGINT) AS n_inter,\n"
        f"       CAST(sa.n + sb.n - inter AS BIGINT) AS n_union\n"
        f"FROM i JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db\n"
        f"WHERE {den} * inter >= {num} * (sa.n + sb.n - inter)"
    )
