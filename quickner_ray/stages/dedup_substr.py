"""Exact-substring deduplication (the "Deduplicating Training Data Makes
Language Models Better" ExactSubstr operator): remove every K-word span
that occurs more than once ANYWHERE in the corpus, keeping no copy —
repeated boilerplate/license blocks/templates vanish from all documents.

Word-level definition (deterministic, exactly mirrored by the DuckDB
oracle): words are the single-space split of the text; a word at (doc, j)
is removed iff some K-shingle instance (doc, i), i <= j < i+K, has a
corpus-wide duplicate (including a second occurrence in the same doc).
Docs whose every word is removed disappear; output is
(doc_id, text_clean, n_kept).

Scale shape — every stage is vectorized Arrow/numpy, every exchange is
either combiner-bounded or the documented dedup operator:
1. shingle counts: per-batch (shingle, n) combiner -> groupby(shingle)
   sum -> duplicate keys (dedup-bounded: DISTINCT duplicated shingles);
2. mark: the shingle stream semi-joins the duplicate keys
   (stages/antijoin.semi_join — broadcast under its cap, hash-partitioned
   left_semi above), then expands each hit to its K word positions with
   one repeat/tile kernel;
3. remove: the word stream anti-joins the marked (doc, pos) keys
   (stages/antijoin.anti_join — Bloom + shuffle above the cap);
4. reassemble: groupby(doc_id) sort-by-pos join (the line_dedup shape).
The shingle/word streams are lazy re-executions of the same explode
lineage (two source scans — the same pattern as the LSH near-dup
pipeline; at 10^12 docs you'd checkpoint the explode to parquet instead).

A corpus-hot shingle ("all rights reserved ...") contributes ONE row per
batch to exchange 1 and its instances spread over the doc-partitioned
streams elsewhere — no single-reducer hotspot.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_K = 8


def _explode_words(batch: pa.Table, id_col: str, text_col: str):
    """(doc_ids, words, pos) arrays for the batch — one split + gather."""
    ids = batch.column(id_col)
    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern(texts, " ")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    pnp = parents.to_numpy(zero_copy_only=False)
    if len(pnp):
        starts = np.zeros(len(texts) + 1, dtype=np.int64)
        np.add.at(starts, pnp + 1, 1)
        starts = np.cumsum(starts)
        pos = np.arange(len(pnp), dtype=np.int64) - starts[pnp]
    else:
        pos = np.empty(0, dtype=np.int64)
    doc_ids = ids.take(parents) if len(pnp) else pa.array([], type=ids.type)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return doc_ids, flat, pos, pnp


def words_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    doc_ids, flat, pos, _p = _explode_words(batch, id_col, text_col)
    return pa.Table.from_pydict(
        {"doc_id": doc_ids, "pos": pa.array(pos, type=pa.int64()), "word": flat}
    )


def shingles_batch(
    batch: pa.Table, k: int = DEFAULT_K, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """K-word shingle rows (doc_id, pos, s): k shifted slices of the flat
    word array joined element-wise — no per-row Python."""
    doc_ids, flat, pos, pnp = _explode_words(batch, id_col, text_col)
    n = len(flat)
    if n < k:
        return pa.Table.from_pydict(
            {
                "doc_id": doc_ids.slice(0, 0),
                "pos": pa.array([], type=pa.int64()),
                "s": pa.array([], type=pa.string()),
            }
        )
    m = n - k + 1
    parts = [flat.slice(j, m) for j in range(k)]
    s = pc.binary_join_element_wise(*parts, " ")
    # a shingle is valid only when its k words lie in the SAME doc
    valid = pa.array(pnp[:m] == pnp[k - 1 :])
    return pa.Table.from_pydict(
        {
            "doc_id": doc_ids.slice(0, m).filter(valid),
            "pos": pa.array(pos[:m], type=pa.int64()).filter(valid),
            "s": s.filter(valid),
        }
    )


def _shingle_count_partial(b: pa.Table) -> pa.Table:
    return (
        b.select(["s"])
        .append_column("one", pa.array(np.ones(b.num_rows, dtype=np.int64)))
        .group_by("s")
        .aggregate([("one", "sum")])
        .rename_columns(["s", "n"])
    )


def _expand_marks(b: pa.Table, k: int) -> pa.Table:
    """Duplicate-shingle instances -> distinct (key=doc\\x00pos) word marks."""
    n = b.num_rows
    if n == 0:
        return pa.Table.from_pydict({"key": pa.array([], type=pa.string())})
    doc = pc.cast(b.column("doc_id").combine_chunks(), pa.string())
    pos = b.column("pos").combine_chunks().to_numpy(zero_copy_only=False)
    wpos = (pos[:, None] + np.arange(k, dtype=np.int64)[None, :]).ravel()
    doc_rep = doc.take(pa.array(np.repeat(np.arange(n, dtype=np.int64), k)))
    key = pc.binary_join_element_wise(
        doc_rep, pc.cast(pa.array(wpos), pa.string()), "\x00"
    )
    return pa.Table.from_pydict({"key": pc.unique(key)})


def exact_substring_dedup(
    ds, *, k: int = DEFAULT_K, id_col: str = "doc_id", text_col: str = "text"
):
    """Corpus-wide exact K-word-substring removal; see module docstring.
    Returns a Dataset (doc_id, text_clean, n_kept); zero-kept docs drop."""
    from ray.data.aggregate import Sum

    from .antijoin import anti_join, semi_join

    sh = ds.map_batches(
        lambda b: shingles_batch(b, k, id_col, text_col), batch_format="pyarrow"
    )
    counts = (
        sh.map_batches(_shingle_count_partial, batch_format="pyarrow")
        .groupby("s")
        .aggregate(Sum("n", alias_name="n"))
    )
    dups = counts.filter(expr="n > 1").select_columns(["s"])
    hits = semi_join(sh, "s", dups, "s")
    marks = hits.map_batches(lambda b: _expand_marks(b, k), batch_format="pyarrow")

    words = ds.map_batches(
        lambda b: words_batch(b, id_col, text_col), batch_format="pyarrow"
    )

    def add_key(b: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(b.column("doc_id").combine_chunks(), pa.string()),
            pc.cast(b.column("pos").combine_chunks(), pa.string()),
            "\x00",
        )
        return b.append_column("key", key)

    keep = anti_join(
        words.map_batches(add_key, batch_format="pyarrow"), "key", marks, "key"
    )

    def reassemble(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("pos", "ascending")])
        g = group.take(order)
        return pa.Table.from_pydict(
            {
                "doc_id": [g.column("doc_id")[0].as_py()],
                "text_clean": [" ".join(g.column("word").to_pylist())],
                "n_kept": pa.array([g.num_rows], type=pa.int64()),
            }
        )

    return keep.groupby("doc_id").map_groups(reassemble, batch_format="pyarrow")


def sql_exact_substring_dedup(table: str = "documents", k: int = DEFAULT_K) -> str:
    return (
        f"WITH words AS (\n"
        f"  SELECT doc_id, CAST(unnest(generate_series(1, len(l))) - 1 AS BIGINT) AS pos,\n"
        f"         unnest(l) AS word\n"
        f"  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM {table})\n"
        f"), sh AS (\n"
        f"  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,\n"
        f"         array_to_string(l[i:i+{k - 1}], ' ') AS s\n"
        f"  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM {table}),\n"
        f"       LATERAL unnest(generate_series(1, len(l) - {k - 1})) AS t(i)\n"
        f"), dup AS (\n"
        f"  SELECT s FROM sh GROUP BY s HAVING count(*) > 1\n"
        f"), marked AS (\n"
        f"  SELECT DISTINCT sh.doc_id, sh.pos + u.g AS wpos\n"
        f"  FROM sh JOIN dup USING (s), unnest(generate_series(0, {k - 1})) AS u(g)\n"
        f")\n"
        f"SELECT w.doc_id,\n"
        f"       string_agg(w.word, ' ' ORDER BY w.pos) AS text_clean,\n"
        f"       CAST(count(*) AS BIGINT) AS n_kept\n"
        f"FROM words w\n"
        f"WHERE NOT EXISTS (SELECT 1 FROM marked m\n"
        f"  WHERE m.doc_id = w.doc_id AND m.wpos = w.pos)\n"
        f"GROUP BY w.doc_id"
    )
