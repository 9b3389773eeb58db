"""Fuzzy (edit-distance <= 1) string matching between corpus vocabulary and
a reference name list — the approximate-string-join operator class
(misspelled entity surface forms, OCR noise, typo-tolerant gazetteers).

Algorithm (SymSpell / FastSS deletion blocking, public domain technique):
two strings are within Levenshtein distance 1 iff they share a variant in
each other's {self} ∪ {single-char deletions} sets *with a position-aware
check folded into the final verify*. We generate deletion variants for BOTH
sides, join on the variant key, then verify candidate pairs with an exact
distance computation — candidates are a tiny superset, so the quadratic
verify never materializes the cross product. This is the scale shape:

- the corpus side is the DISTINCT vocabulary (``vocab_df`` partials — the
  only corpus-wide pass, combiner-bounded), not the token stream;
- variant explosion multiplies each word by <= len(word)+1 — bounded;
- the reference side is small and broadcast; the variant join is a
  vectorized ``index_in`` per batch against the broadcast variant table,
  NOT a shuffle join. (With two fact-sized name sets you would hash-join
  on the variant key instead; same plan, one exchange.)

The DuckDB oracle cross-joins vocabulary x names with ``levenshtein() <= 1``
— exact at oracle scale, which independently verifies both the blocking
scheme's completeness (no missed pair) and the verify's precision.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _deletion_variants(word: str) -> set[str]:
    return {word} | {word[:i] + word[i + 1 :] for i in range(len(word))}


def edit_distance_leq1(a: str, b: str) -> bool:
    """Exact check dist(a,b) <= 1 in O(len) (no DP table needed for k=1)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # la <= lb; find first mismatch
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    if la == lb:
        return a[i + 1 :] == b[i + 1 :]  # one substitution
    return a[i:] == b[i + 1 :]  # one insertion into a


def fuzzy_match_names(
    ds,
    names: list[str],
    *,
    text_col: str = "text",
):
    """Corpus -> (word, name) pairs with Levenshtein distance <= 1.

    ``names`` must be single tokens (multi-word reference names are matched
    by the boundary-rule detector, not here). Output one row per matching
    (distinct corpus word, name) pair."""
    import ray

    from .text_analysis import vocab_df

    name_list = sorted({n for n in names if n})
    # a word longer than the longest name + 1 can never be within dist 1 —
    # the derived cap is the ONLY length skip, so the result stays exactly
    # consistent with the cap-free SQL oracle for any name list
    max_len = max((len(n) for n in name_list), default=0) + 1
    var_keys: list[str] = []
    var_name_idx: list[int] = []
    for idx, n in enumerate(name_list):
        for v in _deletion_variants(n):
            var_keys.append(v)
            var_name_idx.append(idx)
    # one variant key can belong to several names — keep all (verified
    # later). Pre-SORT the key table once driver-side so every batch can
    # searchsorted directly instead of re-sorting the broadcast.
    order = np.argsort(np.asarray(var_keys, dtype=object), kind="stable")
    sorted_keys = np.asarray(var_keys, dtype=object)[order]
    sorted_idx = np.asarray(var_name_idx, dtype=np.int64)[order]
    ref = ray.put((sorted_keys, sorted_idx, name_list))

    vocab = vocab_df(ds, text_col).select_columns(["word"])

    def match(batch: pa.Table) -> pa.Table:
        sorted_keys, sorted_idx, nlist = ray.get(ref)
        words = batch.column("word")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        out_w: list[str] = []
        out_n: list[str] = []
        wl = words.to_pylist()
        # per distinct word: generate its variants, probe the broadcast key
        # table with one vectorized index_in, verify exact distance
        flat_vars: list[str] = []
        parents: list[int] = []
        for i, w in enumerate(wl):
            if not w or len(w) > max_len:
                continue
            for v in _deletion_variants(w):
                flat_vars.append(v)
                parents.append(i)
        if not flat_vars:
            return pa.table(
                {
                    "word": pa.array([], type=pa.string()),
                    "name": pa.array([], type=pa.string()),
                }
            )
        # all hit positions, not just the first, via the pre-sorted table
        fv = np.asarray(flat_vars, dtype=object)
        lo = np.searchsorted(sorted_keys, fv, side="left")
        hi = np.searchsorted(sorted_keys, fv, side="right")
        seen: set[tuple[int, int]] = set()
        for j in range(len(fv)):
            for p in range(lo[j], hi[j]):
                wi, ni = parents[j], int(sorted_idx[p])
                if (wi, ni) in seen:
                    continue
                seen.add((wi, ni))
                if edit_distance_leq1(wl[wi], nlist[ni]):
                    out_w.append(wl[wi])
                    out_n.append(nlist[ni])
        return pa.table(
            {
                "word": pa.array(out_w, type=pa.string()),
                "name": pa.array(out_n, type=pa.string()),
            }
        )

    return vocab.map_batches(match, batch_format="pyarrow")


def sql_fuzzy_match_names(names: list[str], table: str = "documents") -> str:
    from .text_analysis import WORD_CLASS_RE

    name_list = sorted({n for n in names if n})
    vals = ", ".join("('" + n.replace("'", "''") + "')" for n in name_list)
    return (
        f"WITH vocab AS (\n"
        f"  SELECT DISTINCT w AS word\n"
        f"  FROM (SELECT unnest(regexp_extract_all(lower(text),"
        f" '{WORD_CLASS_RE}')) AS w FROM {table})\n"
        f"), names(name) AS (VALUES {vals})\n"
        f"SELECT v.word, n.name FROM vocab v CROSS JOIN names n\n"
        f"WHERE levenshtein(v.word, n.name) <= 1"
    )
