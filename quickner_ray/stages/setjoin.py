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
is the HASH VALUE itself: consistent, known to every worker for free —
no document-frequency pass, no driver-collected vocabulary, no broadcast
(classic df-ascending ordering prunes a bit harder but needs global df
state; hash order is the right cost point at 100 TB).

Distributed shape:
1. prefix emit — zero-shuffle per-batch pass: distinct shingles per doc
   (``_shingle_rows``: one split + lexsort, hashes already ascending
   within each doc), keep the first p per doc, carry the set size.
2. candidate buckets — ONE groupby on the prefix shingle; pairs
   (da < db) within a bucket; cross-bucket dupes folded by a pair-key
   groupby. Bucket sizes are rare-element-bounded by construction.
3. exact verification — candidates expanded against doc-a postings (one
   join), matched to doc-b postings on the composite (shingle, doc) key
   (one join), counted per pair; Jaccard tested as the exact integer
   cross-multiply ``den*inter >= num*(na+nb-inter)``.

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


def similarity_join(
    ds,
    *,
    tau: tuple[int, int] = TAU,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 8,
):
    """Exact shingle-Jaccard self-join: Dataset(doc_a, doc_b, n_inter,
    n_union) for every pair with ``n_inter/n_union >= tau`` (doc_a <
    doc_b). ``ds`` is consumed twice (prefix pass + postings pass) — pass
    a re-readable Dataset; both read only (id, text)."""
    from ray.data.aggregate import Count

    num, den = tau

    def prefix_rows(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "sh": pa.array([], type=pa.uint64()),
                "doc": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        idv, p, h, sizes = _doc_shingles(b, text_col, id_col)
        if not len(p):
            return empty
        plen = _prefix_len(sizes, num, den)
        # hashes are ascending within each doc run: position-in-run < plen
        first = np.r_[True, p[1:] != p[:-1]]
        grp_start = np.maximum.accumulate(np.where(first, np.arange(len(p)), 0))
        within = np.arange(len(p)) - grp_start
        keep = within < plen[p]
        return pa.table(
            {
                "sh": pa.array(h[keep], type=pa.uint64()),
                "doc": pa.array(idv[p[keep]], type=pa.int64()),
                "n": pa.array(sizes[p[keep]]),
            }
        )

    prefixes = ds.map_batches(prefix_rows, batch_format="pyarrow")

    def bucket_pairs(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "da": pa.array([], type=pa.int64()),
                "db": pa.array([], type=pa.int64()),
                "na": pa.array([], type=pa.int64()),
                "nb": pa.array([], type=pa.int64()),
            }
        )
        if g.num_rows < 2:
            return empty
        docs = g.column("doc").combine_chunks().to_numpy(zero_copy_only=False)
        ns = g.column("n").combine_chunks().to_numpy(zero_copy_only=False)
        o = np.argsort(docs, kind="stable")
        docs, ns = docs[o], ns[o]
        ii, jj = np.triu_indices(len(docs), k=1)
        return pa.table(
            {
                "da": pa.array(docs[ii], type=pa.int64()),
                "db": pa.array(docs[jj], type=pa.int64()),
                "na": pa.array(ns[ii], type=pa.int64()),
                "nb": pa.array(ns[jj], type=pa.int64()),
            }
        )

    cands = prefixes.groupby("sh").map_groups(bucket_pairs, batch_format="pyarrow")
    cands = cands.groupby(["da", "db", "na", "nb"]).aggregate(Count(alias_name="_c"))

    def norm_cand(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {c: pa.array([], type=pa.int64()) for c in ("da", "db", "na", "nb")}
            )
        return pa.table({c: b.column(c) for c in ("da", "db", "na", "nb")})

    cands = cands.map_batches(norm_cand, batch_format="pyarrow").repartition(
        num_partitions
    )

    post = shingle_postings(ds, text_col=text_col, id_col=id_col).repartition(
        num_partitions
    )
    expanded = cands.join(
        post, "inner", num_partitions=num_partitions, on=("da",), right_on=("doc",)
    )

    def norm_exp(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "da": pa.array([], type=pa.int64()),
                    "db": pa.array([], type=pa.int64()),
                    "na": pa.array([], type=pa.int64()),
                    "nb": pa.array([], type=pa.int64()),
                    "sh": pa.array([], type=pa.uint64()),
                }
            )
        return pa.table({c: b.column(c) for c in ("da", "db", "na", "nb", "sh")})

    expanded = expanded.map_batches(norm_exp, batch_format="pyarrow")

    def norm_post_b(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "sh2": pa.array([], type=pa.uint64()),
                    "doc2": pa.array([], type=pa.int64()),
                }
            )
        return pa.table({"sh2": b.column("sh"), "doc2": b.column("doc")})

    post_b = post.map_batches(norm_post_b, batch_format="pyarrow")
    matched = expanded.join(
        post_b,
        "inner",
        num_partitions=num_partitions,
        on=("sh", "db"),
        right_on=("sh2", "doc2"),
    )
    inter = matched.groupby(["da", "db", "na", "nb"]).aggregate(
        Count(alias_name="n_inter")
    )

    def finish(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "n_inter": pa.array([], type=pa.int64()),
                "n_union": pa.array([], type=pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        na = b.column("na").combine_chunks().to_numpy(zero_copy_only=False)
        nb = b.column("nb").combine_chunks().to_numpy(zero_copy_only=False)
        it = b.column("n_inter").combine_chunks().to_numpy(zero_copy_only=False)
        uni = na + nb - it
        keep = den * it >= num * uni
        if not keep.any():
            return empty
        t = pa.table(
            {
                "doc_a": b.column("da"),
                "doc_b": b.column("db"),
                "n_inter": b.column("n_inter"),
                "n_union": pa.array(uni.astype(np.int64)),
            }
        )
        return t.filter(pa.array(keep))

    return inter.map_batches(finish, batch_format="pyarrow")


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
