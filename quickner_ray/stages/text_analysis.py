"""Text-analysis operators for training-data pipelines (driver-graded set):
token counting, quality metrics, language ID, document fingerprinting.

All are vectorized ``map_batches`` stages over ``batch_format="pyarrow"``.
Regexes are RE2-compatible classes so the DuckDB oracle (also RE2) computes
identical values.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# whitespace-delimited tokens; explicit class, identical in Python/RE2/DuckDB
TOKEN_RE = "[^ \\t\\n\\x0b\\x0c\\r]+"
TOKEN_SPLIT_RE = "[ \\t\\n\\x0b\\x0c\\r]+"  # the complementary separator class
PUNCT_RE = "[!-/:-@\\[-`{-~]"
DIGIT_RE = "[0-9]"


def add_token_count(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col)
    n = pc.count_substring_regex(texts, TOKEN_RE)
    return batch.append_column("n_tokens", n.cast(pa.int64()))


# GPT-2-style pretokenizer, ASCII + RE2-safe: contraction suffixes, then
# space-prefixed letter / digit / punctuation runs, then whitespace runs.
# RE2 has no lookahead, so GPT-2's trailing-space rule ``\s+(?!\S)`` is
# dropped (whitespace runs become single pretokens). pyarrow and DuckDB both
# run RE2 with leftmost-first alternation, so counts agree bit-exactly.
PRETOKEN_RE = (
    "'(?:s|t|re|ve|m|ll|d)"
    "| ?[a-zA-Z]+"
    "| ?[0-9]+"
    "| ?[^a-zA-Z0-9 \\t\\n\\x0b\\x0c\\r]+"
    "|[ \\t\\n\\x0b\\x0c\\r]+"
)


def add_bpe_token_count(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """BPE-ish token budget estimate: number of GPT-2-style pretokens per
    document (the pretokenizer is the dominant term of a real BPE token
    count; merges only shrink within-pretoken counts)."""
    texts = batch.column(text_col)
    n = pc.count_substring_regex(texts, PRETOKEN_RE)
    return batch.append_column("n_bpe_tokens", n.cast(pa.int64()))


def sql_bpe_token_count(table: str = "documents") -> str:
    """DuckDB oracle for ``add_bpe_token_count`` (same RE2 pattern)."""
    pat = PRETOKEN_RE.replace("'", "''")
    return (
        f"SELECT doc_id, CAST(length(regexp_extract_all(text, '{pat}')) AS BIGINT)"
        f" AS n_bpe_tokens FROM {table}"
    )


def add_quality_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality-signal counts: chars, tokens, ASCII punct, digits, spaces."""
    texts = batch.column(text_col)
    out = batch
    out = out.append_column("n_chars_m", pc.utf8_length(texts).cast(pa.int64()))
    out = out.append_column(
        "n_tokens", pc.count_substring_regex(texts, TOKEN_RE).cast(pa.int64())
    )
    out = out.append_column(
        "n_punct", pc.count_substring_regex(texts, PUNCT_RE).cast(pa.int64())
    )
    out = out.append_column(
        "n_digits", pc.count_substring_regex(texts, DIGIT_RE).cast(pa.int64())
    )
    out = out.append_column(
        "n_spaces", pc.count_substring_regex(texts, "[ ]").cast(pa.int64())
    )
    return out


def add_quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic document quality in [0,1]: penalizes very short/very long
    docs, high punct/digit density, low token diversity.

    Fully vectorized: char/punct/digit counts are the same Arrow regex
    kernels as ``add_quality_counts``; token diversity counts distinct
    whitespace-split tokens per row via one dictionary-encode over the
    flattened token lists. The formula is DuckDB-expressible
    (``sql_quality_score``) so the driver oracle checks it bit-exactly."""
    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.float64)
    n_punct = (
        pc.count_substring_regex(texts, PUNCT_RE)
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    n_digits = (
        pc.count_substring_regex(texts, DIGIT_RE)
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    # distinct-token counts: split once, count uniques per row with a single
    # global dictionary-encode + (row, code) unique pass. Splitting on the
    # separator class yields empty strings at text edges — masked out so
    # token semantics equal TOKEN_RE matches (== str.split on ASCII).
    toks = pc.split_pattern_regex(texts, TOKEN_SPLIT_RE)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    n_toks = np.zeros(len(texts), dtype=np.float64)
    n_distinct = np.zeros(len(texts), dtype=np.float64)
    if len(flat):
        nonempty = pc.greater(pc.binary_length(flat), 0).to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        parents = parents[nonempty]
    if len(flat):
        codes = pc.dictionary_encode(flat).indices.to_numpy(zero_copy_only=False)
        np.add.at(n_toks, parents, 1.0)
        pair = parents.astype(np.int64) * (int(codes.max()) + 1) + codes
        uniq_parents = parents[np.unique(pair, return_index=True)[1]]
        np.add.at(n_distinct, uniq_parents, 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        length_score = np.minimum(1.0, n / 200.0) * np.where(n < 20000, 1.0, 0.5)
        diversity = np.where(n_toks > 0, n_distinct / np.maximum(n_toks, 1.0), 0.0)
        punct = np.where(n > 0, n_punct / np.maximum(n, 1.0), 0.0)
        digits = np.where(n > 0, n_digits / np.maximum(n, 1.0), 0.0)
    scores = np.clip(0.5 * length_score + 0.5 * diversity - punct - digits, 0.0, 1.0)
    scores = np.where((n == 0) | (n_toks == 0), 0.0, scores)
    return batch.append_column("quality_score", pa.array(scores))


def sql_quality_score(table: str = "documents") -> str:
    """DuckDB oracle for ``add_quality_score`` — same counts, same double
    arithmetic in the same operation order (both engines do IEEE doubles, so
    the values hash-compare exactly)."""
    return (
        f"WITH t AS (\n"
        f"  SELECT doc_id,\n"
        f"    CAST(length(text) AS DOUBLE) AS n,\n"
        f"    CAST(length(regexp_extract_all(text, '{PUNCT_RE}')) AS DOUBLE) AS np,\n"
        f"    CAST(length(regexp_extract_all(text, '{DIGIT_RE}')) AS DOUBLE) AS nd,\n"
        f"    CAST(length(regexp_extract_all(text, '{TOKEN_RE}')) AS DOUBLE) AS ntok,\n"
        f"    CAST(length(list_distinct(regexp_extract_all(text, '{TOKEN_RE}')))"
        f" AS DOUBLE) AS ndis\n"
        f"  FROM {table})\n"
        f"SELECT doc_id,\n"
        f"  CASE WHEN n = 0 OR ntok = 0 THEN 0.0 ELSE\n"
        f"    LEAST(1.0, GREATEST(0.0,\n"
        f"      0.5 * (LEAST(1.0, n / 200.0) * (CASE WHEN n < 20000 THEN 1.0 ELSE 0.5 END))\n"
        f"      + 0.5 * (ndis / ntok) - np / n - nd / n)) END AS quality_score\n"
        f"FROM t"
    )


# -- corpus n-gram frequencies ------------------------------------------------


def partial_bigram_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch partial word-bigram counts (one row per distinct bigram per
    batch — the combiner bound). Bigram strings are built with one Arrow
    element-wise join over the shifted word arrays."""
    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), WORD_CLASS_SPLIT_RE)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    if len(flat):
        nonempty = pc.greater(pc.binary_length(flat), 0).to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        parents = parents[nonempty]
    empty = pa.table(
        {"ngram": pa.array([], type=pa.string()), "n": pa.array([], type=pa.int64())}
    )
    if len(flat) < 2:
        return empty
    ok = parents[:-1] == parents[1:]
    if not ok.any():
        return empty
    left = flat.slice(0, len(flat) - 1).filter(pa.array(ok))
    right = flat.slice(1).filter(pa.array(ok))
    grams = pc.binary_join_element_wise(left, right, " ")
    enc = pc.dictionary_encode(grams)
    codes = enc.indices.to_numpy(zero_copy_only=False)
    counts = np.bincount(codes, minlength=len(enc.dictionary))
    return pa.table(
        {
            "ngram": enc.dictionary.cast(pa.string()),
            "n": pa.array(counts, type=pa.int64()),
        }
    )


def top_bigrams(ds, *, k: int = 20, text_col: str = "text"):
    """Corpus-wide top-k word bigrams: partial counts per batch, one small
    groupby().sum, then a tiny sort+limit (ties break to the
    lexicographically smaller bigram — deterministic top-k set)."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        lambda b: partial_bigram_counts(b, text_col), batch_format="pyarrow"
    )
    agg = partials.groupby("ngram").aggregate(Sum("n", alias_name="n"))
    return agg.sort(["n", "ngram"], descending=[True, False]).limit(k)


def sql_top_bigrams(k: int = 20, table: str = "documents") -> str:
    return (
        f"WITH words AS (SELECT regexp_extract_all(lower(text),"
        f" '{WORD_CLASS_RE}') AS w FROM {table}),\n"
        f"bg AS (SELECT unnest(list_transform(range(1, len(w)),"
        f" i -> w[i] || ' ' || w[i+1])) AS ngram FROM words WHERE len(w) >= 2)\n"
        f"SELECT ngram, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY ngram\n"
        f"ORDER BY n DESC, ngram LIMIT {k}"
    )


# -- repetition stats (Gopher/RefinedWeb-style duplicate-line signal) --------


def add_compression_ratio(batch: pa.Table, text_col: str = "text", level: int = 6) -> pa.Table:
    """Compression-ratio quality signal (the Gopher/RefinedWeb-style
    filter): ``deflate_len / utf8_len`` per doc. Repetitive boilerplate
    and template spam compress far below prose (~0.3 vs ~0.6+); near-zero
    ratios are a strong junk signal. zlib is deterministic for a fixed
    (level, library) pair and runs at C speed per doc — the per-row call
    is the codec itself, not Python bookkeeping. No SQL form (DuckDB has
    no compress()) -> rows-only; invariants pinned in tests."""
    import zlib

    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_raw = np.empty(len(texts), dtype=np.int64)
    n_comp = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts.to_pylist()):
        raw = t.encode("utf-8")
        n_raw[i] = len(raw)
        n_comp[i] = len(zlib.compress(raw, level))
    ratio = n_comp / np.maximum(n_raw, 1)
    out = batch.append_column("n_bytes", pa.array(n_raw))
    out = out.append_column("n_deflate", pa.array(n_comp))
    return out.append_column("compression_ratio", pa.array(ratio, type=pa.float64()))


def add_repetition_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc line counts and duplicate-line fraction: repetitive pages
    (boilerplate, listings, spam) show high ``dup_line_frac``. Vectorized:
    one newline split over the batch, one dictionary-encode, distinct
    (row, line) via a unique pass. ``frac = (n_lines - n_distinct) /
    n_lines`` is two IEEE ops, so the DuckDB oracle hash-matches."""
    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lines = pc.split_pattern(texts, "\n")
    flat = pc.list_flatten(lines)
    parents = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    n_rows = len(texts)
    n_lines = np.bincount(parents, minlength=n_rows) if len(parents) else np.zeros(
        n_rows, dtype=np.int64
    )
    n_distinct = np.zeros(n_rows, dtype=np.int64)
    if len(flat):
        codes = pc.dictionary_encode(flat).indices.to_numpy(zero_copy_only=False)
        pair = parents.astype(np.int64) * (int(codes.max()) + 1) + codes
        uniq_parents = parents[np.unique(pair, return_index=True)[1]]
        np.add.at(n_distinct, uniq_parents, 1)
    frac = (n_lines - n_distinct) / np.maximum(n_lines, 1)
    out = batch.append_column("n_lines", pa.array(n_lines, type=pa.int64()))
    out = out.append_column("n_distinct_lines", pa.array(n_distinct, type=pa.int64()))
    return out.append_column("dup_line_frac", pa.array(frac, type=pa.float64()))


def sql_repetition_stats(table: str = "documents") -> str:
    return (
        f"SELECT doc_id,\n"
        f"  CAST(len(l) AS BIGINT) AS n_lines,\n"
        f"  CAST(len(list_distinct(l)) AS BIGINT) AS n_distinct_lines,\n"
        f"  CAST(len(l) - len(list_distinct(l)) AS DOUBLE)\n"
        f"    / CAST(greatest(len(l), 1) AS DOUBLE) AS dup_line_frac\n"
        f"FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM {table})"
    )


def add_normalized_text(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """C4-style text normalization: lowercase (utf8proc simple case mapping
    — identical in Arrow and DuckDB), collapse every ASCII-whitespace run
    to one space, trim edge spaces. Pure per-batch kernels, no Python."""
    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    norm = pc.replace_substring_regex(
        pc.utf8_lower(texts), "[ \t\n\r\x0b\x0c]+", " "
    )
    norm = pc.utf8_trim(norm, " ")
    out = batch.append_column("norm_text", norm)
    return out.append_column("n_chars_norm", pc.utf8_length(norm).cast(pa.int64()))


def sql_normalized_text(table: str = "documents") -> str:
    return (
        "SELECT doc_id,\n"
        "  trim(regexp_replace(lower(text),"
        " '[ \\t\\n\\r\\x0b\\x0c]+', ' ', 'g'), ' ') AS norm_text,\n"
        "  CAST(length(trim(regexp_replace(lower(text),"
        " '[ \\t\\n\\r\\x0b\\x0c]+', ' ', 'g'), ' ')) AS BIGINT) AS n_chars_norm\n"
        f"FROM {table}"
    )


def add_nfc_normalized(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Unicode NFC normalization (multilingual / mC4-style prep: compose
    combining sequences so equal-looking strings hash equal before dedup
    and tokenization), matching DuckDB's ``nfc_normalize`` (UAX #15)
    bit-for-bit.

    pyarrow 16's ``utf8_normalize`` does NOT perform canonical
    composition (verified: NFC leaves ``e`` + U+0301 decomposed), so the
    kernel here is a vectorized ``string_is_ascii`` fast path — ASCII rows
    are NFC by definition and pass through zero-copy — with CPython's
    ``unicodedata.normalize`` applied only to the non-ASCII subset."""
    import unicodedata

    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    non_ascii = pc.invert(pc.string_is_ascii(texts))
    if pc.any(non_ascii).as_py():
        idx = pc.indices_nonzero(non_ascii)
        fixed = pa.array(
            [unicodedata.normalize("NFC", s) for s in texts.take(idx).to_pylist()],
            type=texts.type,
        )
        norm = pc.replace_with_mask(texts, non_ascii, fixed)
    else:
        norm = texts
    out = batch.append_column("text_nfc", norm)
    out = out.append_column(
        "n_chars_raw", pc.utf8_length(texts).cast(pa.int64())
    )
    return out.append_column("n_chars_nfc", pc.utf8_length(norm).cast(pa.int64()))


def sql_nfc_normalized(table: str = "documents") -> str:
    """Oracle for ``q_unicode_nfc``: the same deterministic decomposition
    (every 'e' -> 'e' + U+0301 combining acute) re-composed by
    ``nfc_normalize`` — counts prove real composition happened."""
    decomp = "replace(text, 'e', 'e' || chr(769))"
    return (
        f"SELECT doc_id,\n"
        f"  nfc_normalize({decomp}) AS text_nfc,\n"
        f"  CAST(length({decomp}) AS BIGINT) AS n_chars_raw,\n"
        f"  CAST(length(nfc_normalize({decomp})) AS BIGINT) AS n_chars_nfc\n"
        f"FROM {table}"
    )


# -- corpus-level line dedup (CCNet-style) -----------------------------------

_LINE_BLANK_CHARS = " \t\r"
_LINE_NO_PAD = 12  # zero-padded line_no width inside the packed order key


def explode_lines(
    batch: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> pa.Table:
    """(doc_id, line_no, line, blank, packed) — one newline split per
    batch, parent indices for doc attribution, all Arrow kernels.
    ``packed`` = ``doc_id || '\\x00' || zero-padded line_no`` orders
    lexicographically exactly like the tuple (doc_id, line_no) (the NUL
    separator sorts below every other byte), so a plain ``Min`` aggregate
    picks the corpus-first occurrence of each line."""
    ids = batch.column(id_col)
    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lines = pc.split_pattern(texts, sep)
    flat = pc.list_flatten(lines)
    parents = pc.list_parent_indices(lines)
    pnp = parents.to_numpy(zero_copy_only=False)
    # line_no = position within the doc: global index minus the doc's offset
    if len(pnp):
        starts = np.zeros(len(texts) + 1, dtype=np.int64)
        np.add.at(starts, pnp + 1, 1)
        starts = np.cumsum(starts)
        line_no = np.arange(len(pnp), dtype=np.int64) - starts[pnp]
    else:
        line_no = np.empty(0, dtype=np.int64)
    doc_ids = ids.take(parents) if len(pnp) else pa.array([], type=ids.type)
    blank = pc.equal(pc.utf8_trim(flat, _LINE_BLANK_CHARS), "")
    no_str = pc.utf8_lpad(
        pc.cast(pa.array(line_no, type=pa.int64()), pa.string()), _LINE_NO_PAD, "0"
    )
    # integer ids are zero-padded so the packed key's lexicographic order
    # equals numeric order (matches the SQL oracle's ORDER BY doc_id);
    # non-negative ids assumed (documented). String ids compare as-is.
    id_str = pc.cast(doc_ids, pa.string())
    if pa.types.is_integer(ids.type):
        id_str = pc.utf8_lpad(id_str, 20, "0")
    packed = pc.binary_join_element_wise(id_str, no_str, "\x00")
    return pa.Table.from_pydict(
        {
            "doc_id": doc_ids,
            "line_no": pa.array(line_no, type=pa.int64()),
            "line": flat,
            "blank": blank,
            "packed": packed,
        }
    )


def _partial_line_min(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: at most ONE row per distinct dedup key per
    batch (min packed key) — bounds the line-key shuffle for hot
    boilerplate lines the same way the canonicalization combiner bounds
    surfaces. The dedup key unifies both classes in ONE stream (a lazy
    Dataset cannot be forked without re-running its whole lineage):
    non-blank lines group corpus-wide on ``"L\\x00" + line``; blank lines
    get the unique-per-occurrence key ``"B\\x00" + packed`` so each
    survives the Min as its own singleton group."""
    key = pc.binary_join_element_wise(
        pc.if_else(batch.column("blank").combine_chunks(), "B", "L"),
        pc.if_else(
            batch.column("blank").combine_chunks(),
            batch.column("packed").combine_chunks(),
            batch.column("line").combine_chunks(),
        ),
        "\x00",
    )
    t = pa.Table.from_pydict(
        {
            "key": key,
            "packed": batch.column("packed"),
            "line": batch.column("line"),
        }
    )
    return (
        t.group_by("key")
        .aggregate([("packed", "min"), ("line", "min")])
        .rename_columns(["key", "packed", "line"])
    )


def line_dedup(ds, id_col: str = "doc_id", text_col: str = "text", sep: str = "\n"):
    """Corpus-level duplicate-line removal (the CCNet prep step): every
    non-blank line keeps only its FIRST occurrence corpus-wide (order =
    (doc_id, line_no)); blank lines always survive; docs are reassembled
    from surviving lines. Output: (doc_id, text_dedup, n_kept); a doc
    whose every line was dropped disappears.

    SINGLE source scan (2 exchanges, both combiner-bounded): explode ->
    [per-batch min combiner over the unified dedup key] ->
    groupby(key).min(packed, line) -> groupby(doc_id) reassemble. Blank
    lines ride the same shuffle under unique-per-occurrence keys instead
    of a second scan of the input; ``Min(line)`` is exact because the
    line is constant within a non-blank group and blank groups are
    singletons."""
    from ray.data.aggregate import Min

    id_type = ds.schema().base_schema.field(id_col).type
    lines = ds.map_batches(
        lambda b: explode_lines(b, id_col, text_col, sep), batch_format="pyarrow"
    ).map_batches(_partial_line_min, batch_format="pyarrow")
    keepers = lines.groupby("key").aggregate(
        Min("packed", alias_name="packed"), Min("line", alias_name="line")
    )

    def unpack(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch.column("packed"), "\x00", max_splits=1)
        flat = pc.list_flatten(parts)
        doc = flat.take(pa.array(range(0, len(flat), 2), type=pa.int64()))
        no = flat.take(pa.array(range(1, len(flat), 2), type=pa.int64()))
        return pa.Table.from_pydict(
            {
                "doc_id": pc.cast(doc, id_type),
                "line_no": pc.cast(no, pa.int64()),
                "line": batch.column("line"),
            }
        )

    surviving = keepers.map_batches(unpack, batch_format="pyarrow")

    def reassemble(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("line_no", "ascending")])
        g = group.take(order)
        return pa.Table.from_pydict(
            {
                "doc_id": [g.column("doc_id")[0].as_py()],
                "text_dedup": [sep.join(g.column("line").to_pylist())],
                "n_kept": pa.array([g.num_rows], type=pa.int64()),
            }
        )

    return surviving.groupby("doc_id").map_groups(reassemble, batch_format="pyarrow")


def sql_line_dedup(table: str = "documents", sep: str = "\n") -> str:
    sep_sql = "'" + sep.replace("'", "''") + "'" if sep != "\n" else "chr(10)"
    return (
        "WITH lines AS (\n"
        "  SELECT doc_id,\n"
        "         CAST(unnest(generate_series(1, len(l))) - 1 AS BIGINT) AS line_no,\n"
        "         unnest(l) AS line\n"
        f"  FROM (SELECT doc_id, string_split(text, {sep_sql}) AS l FROM {table})\n"
        "), keep AS (\n"
        "  SELECT doc_id, line_no, line FROM (\n"
        "    SELECT doc_id, line_no, line,\n"
        "      row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn,\n"
        "      trim(line, ' ' || chr(9) || chr(13)) = '' AS blank\n"
        "    FROM lines)\n"
        "  WHERE blank OR rn = 1\n"
        ")\n"
        "SELECT doc_id,\n"
        f"       string_agg(line, {sep_sql} ORDER BY line_no) AS text_dedup,\n"
        "       CAST(count(*) AS BIGINT) AS n_kept\n"
        "FROM keep GROUP BY doc_id"
    )


# -- per-host boilerplate removal (CCNet/RefinedWeb site-template step) ------


def _host_line_rows(
    batch: pa.Table,
    id_col: str,
    host_col: str,
    text_col: str,
    sep: str,
) -> pa.Table:
    """Explode a (doc, host, text) batch to one row per line with the
    host attached (vectorized ``index_in`` back to the parent row)."""
    ex = explode_lines(batch, id_col, text_col, sep)
    idx = pc.index_in(
        ex.column("doc_id"), value_set=batch.column(id_col).combine_chunks()
    )
    host = batch.column(host_col).combine_chunks().take(idx)
    return ex.append_column("host", host)


def host_boilerplate_lines(
    ds,
    *,
    id_col: str = "doc_id",
    host_col: str = "host",
    text_col: str = "text",
    sep: str = "\n",
    min_docs: int = 2,
):
    """Per-HOST boilerplate line detection (the CCNet/RefinedWeb
    site-template signal): a non-blank line that appears in >= ``min_docs``
    DISTINCT documents of the same host is site chrome (nav bars, footers,
    cookie banners), not content. Output: (host, line, n_docs).

    Shape: explode -> per-batch combiner (a document's lines never span
    batches, so within-batch distinct (host, line, doc) counting is an
    exact partial) -> ONE groupby-sum on the (host, line) key. The key is
    host-qualified, so a globally hot line ("Home") shards across hosts
    instead of melting one reducer."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        ex = _host_line_rows(b, id_col, host_col, text_col, sep)
        mask = pc.invert(ex.column("blank").combine_chunks())
        t = pa.table(
            {
                "host": ex.column("host"),
                "line": ex.column("line"),
                "doc_id": ex.column("doc_id"),
            }
        ).filter(mask)
        g = t.group_by(["host", "line", "doc_id"]).aggregate([])
        p = g.group_by(["host", "line"]).aggregate([("doc_id", "count")])
        return p.rename_columns(["host", "line", "p_docs"])

    stats = ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["host", "line"]
    ).aggregate(Sum("p_docs", alias_name="n_docs"))

    def finish(b: pa.Table) -> pa.Table:
        keep = pc.greater_equal(
            b.column("n_docs").combine_chunks(),
            pa.scalar(min_docs, type=pa.int64()),
        )
        return b.filter(keep)

    return stats.map_batches(finish, batch_format="pyarrow")


def host_boilerplate_strip(
    ds,
    *,
    id_col: str = "doc_id",
    host_col: str = "host",
    text_col: str = "text",
    sep: str = "\n",
    min_docs: int = 2,
):
    """Strip per-host boilerplate lines from every document: pass 1
    computes the (host, line) boilerplate table (``host_boilerplate_lines``
    — output is bounded by repeated-template volume, tiny vs the corpus),
    pass 2 re-explodes and drops lines via the distributed ``anti_join``
    on the packed ``host || NUL || line`` key (broadcast below the cap,
    hash-partitioned shuffle + Bloom prefilter above — never a driver-side
    set). Blank lines never enter the boilerplate table, so they survive
    unconditionally, as in ``line_dedup``. Output: (doc_id, text_clean,
    n_kept); a doc whose every line was boilerplate disappears."""
    from .antijoin import anti_join

    id_type = ds.schema().base_schema.field(id_col).type
    boiler = host_boilerplate_lines(
        ds,
        id_col=id_col,
        host_col=host_col,
        text_col=text_col,
        sep=sep,
        min_docs=min_docs,
    ).map_batches(
        lambda b: pa.table(
            {
                "hl_key": pc.binary_join_element_wise(
                    b.column("host").combine_chunks(),
                    b.column("line").combine_chunks(),
                    "\x00",
                )
            }
        ),
        batch_format="pyarrow",
    )

    def keyed_lines(b: pa.Table) -> pa.Table:
        ex = _host_line_rows(b, id_col, host_col, text_col, sep)
        key = pc.binary_join_element_wise(
            ex.column("host").combine_chunks(),
            ex.column("line").combine_chunks(),
            "\x00",
        )
        return pa.table(
            {
                "doc_id": ex.column("doc_id"),
                "line_no": ex.column("line_no"),
                "line": ex.column("line"),
                "hl_key": key,
            }
        )

    lines = ds.map_batches(keyed_lines, batch_format="pyarrow")
    kept = anti_join(lines, "hl_key", boiler, "hl_key")

    def reassemble(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("line_no", "ascending")])
        g = group.take(order)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array([g.column("doc_id")[0].as_py()], type=id_type),
                "text_clean": [sep.join(g.column("line").to_pylist())],
                "n_kept": pa.array([g.num_rows], type=pa.int64()),
            }
        )

    return kept.groupby("doc_id").map_groups(reassemble, batch_format="pyarrow")


# -- Gopher-rules composite quality gate (MassiveText filtering) -------------

_WS_CHAR_RE = "[ \\t\\n\\x0b\\x0c\\r]"
_ALPHA_TOKEN_RE = (
    "[^ \\t\\n\\x0b\\x0c\\r]*[A-Za-z][^ \\t\\n\\x0b\\x0c\\r]*"
)
_SYMBOL_RE = "#|\\.\\.\\."
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def add_gopher_quality(
    batch: pa.Table,
    text_col: str = "text",
    *,
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    max_symbol_ratio_pct: int = 10,
    min_alpha_word_pct: int = 80,
    min_stopwords: int = 1,
) -> pa.Table:
    """Gopher/MassiveText composite quality gate (Rae et al. 2021 §A1.1),
    adapted to whitespace tokenization and made ALL-INTEGER so the keep
    decision is bit-exact across engines (ratio rules are integer
    cross-multiplies, never IEEE division):

    - word count in [min_words, max_words]
    - mean word length in [3, 10]:  3*n_words <= n_word_chars <= 10*n_words
    - symbol-to-word ratio (# or ...) <= 10%:  100*n_sym <= 10*n_words
    - >= 80% of words contain an alphabetic char: 100*n_alpha >= 80*n_words
    - >= 2 distinct common English stopwords present

    One pass of Arrow RE2 kernels per batch, zero shuffles. Output adds
    (n_words, n_word_chars, n_alpha_words, n_sym, n_stop, keep)."""
    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_words = pc.count_substring_regex(texts, TOKEN_RE).cast(pa.int64())
    n_ws = pc.count_substring_regex(texts, _WS_CHAR_RE).cast(pa.int64())
    n_word_chars = pc.subtract(pc.utf8_length(texts).cast(pa.int64()), n_ws)
    n_alpha = pc.count_substring_regex(texts, _ALPHA_TOKEN_RE).cast(pa.int64())
    n_sym = pc.count_substring_regex(texts, _SYMBOL_RE).cast(pa.int64())
    n_stop = pa.array(np.zeros(len(texts), dtype=np.int64))
    for w in GOPHER_STOPWORDS:
        present = pc.cast(
            pc.greater(
                pc.count_substring_regex(texts, f"\\b{w}\\b"), 0
            ),
            pa.int64(),
        )
        n_stop = pc.add(n_stop, present)
    c1 = pc.and_(
        pc.greater_equal(n_words, pa.scalar(min_words, type=pa.int64())),
        pc.less_equal(n_words, pa.scalar(max_words, type=pa.int64())),
    )
    c2 = pc.and_(
        pc.less_equal(pc.multiply(n_words, pa.scalar(min_mean_word_len, type=pa.int64())), n_word_chars),
        pc.less_equal(n_word_chars, pc.multiply(n_words, pa.scalar(max_mean_word_len, type=pa.int64()))),
    )
    c3 = pc.less_equal(
        pc.multiply(n_sym, pa.scalar(100, type=pa.int64())),
        pc.multiply(n_words, pa.scalar(max_symbol_ratio_pct, type=pa.int64())),
    )
    c4 = pc.greater_equal(
        pc.multiply(n_alpha, pa.scalar(100, type=pa.int64())),
        pc.multiply(n_words, pa.scalar(min_alpha_word_pct, type=pa.int64())),
    )
    c5 = pc.greater_equal(n_stop, pa.scalar(min_stopwords, type=pa.int64()))
    keep = pc.cast(pc.and_(pc.and_(pc.and_(c1, c2), pc.and_(c3, c4)), c5), pa.int64())
    out = batch
    for name, col in (
        ("n_words", n_words),
        ("n_word_chars", n_word_chars),
        ("n_alpha_words", n_alpha),
        ("n_sym", n_sym),
        ("n_stop", n_stop),
        ("keep", keep),
    ):
        out = out.append_column(name, col)
    return out


def sql_gopher_filter(
    table: str = "documents",
    *,
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    max_symbol_ratio_pct: int = 10,
    min_alpha_word_pct: int = 80,
    min_stopwords: int = 1,
) -> str:
    stop_sum = " + ".join(
        f"CASE WHEN regexp_matches(text, '\\b{w}\\b') THEN 1 ELSE 0 END"
        for w in GOPHER_STOPWORDS
    )
    return (
        f"WITH t AS (\n"
        f"  SELECT doc_id,\n"
        f"    CAST(length(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS n_words,\n"
        f"    CAST(length(text) - length(regexp_extract_all(text, '{_WS_CHAR_RE}')) AS BIGINT) AS n_word_chars,\n"
        f"    CAST(length(regexp_extract_all(text, '{_ALPHA_TOKEN_RE}')) AS BIGINT) AS n_alpha_words,\n"
        f"    CAST(length(regexp_extract_all(text, '{_SYMBOL_RE}')) AS BIGINT) AS n_sym,\n"
        f"    CAST({stop_sum} AS BIGINT) AS n_stop\n"
        f"  FROM {table})\n"
        f"SELECT doc_id, n_words, n_word_chars, n_alpha_words, n_sym, n_stop,\n"
        f"  CAST(n_words BETWEEN {min_words} AND {max_words}\n"
        f"   AND {min_mean_word_len} * n_words <= n_word_chars\n"
        f"   AND n_word_chars <= {max_mean_word_len} * n_words\n"
        f"   AND 100 * n_sym <= {max_symbol_ratio_pct} * n_words\n"
        f"   AND 100 * n_alpha_words >= {min_alpha_word_pct} * n_words\n"
        f"   AND n_stop >= {min_stopwords} AS BIGINT) AS keep\n"
        f"FROM t"
    )


# -- vocabulary statistics (df/tf with a partial combiner) -------------------

WORD_CLASS_RE = "[a-z0-9]+"
WORD_CLASS_SPLIT_RE = "[^a-z0-9]+"


def partial_vocab_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch partial (word, df, tf): tf = occurrences, df = docs
    containing. A batch contributes at most ONE row per distinct word no
    matter how hot the word is — the combiner that bounds the vocab shuffle.
    One split + dictionary-encode per batch; counts via bincount."""
    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), WORD_CLASS_SPLIT_RE)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    if len(flat):
        nonempty = pc.greater(pc.binary_length(flat), 0).to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        parents = parents[nonempty]
    if not len(flat):
        return pa.table(
            {
                "word": pa.array([], type=pa.string()),
                "df": pa.array([], type=pa.int64()),
                "tf": pa.array([], type=pa.int64()),
            }
        )
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_words = len(enc.dictionary)
    tf = np.bincount(codes, minlength=n_words)
    # df: distinct (doc, word) pairs
    pair = parents.astype(np.int64) * n_words + codes
    uniq = np.unique(pair)
    df = np.bincount((uniq % n_words).astype(np.int64), minlength=n_words)
    return pa.table(
        {
            "word": enc.dictionary.cast(pa.string()),
            "df": pa.array(df, type=pa.int64()),
            "tf": pa.array(tf, type=pa.int64()),
        }
    )


def vocab_df(ds, text_col: str = "text"):
    """Corpus vocabulary with document frequency and term frequency:
    partial counts per batch, then one small groupby().sum over words."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        lambda b: partial_vocab_counts(b, text_col), batch_format="pyarrow"
    )
    return partials.groupby("word").aggregate(
        Sum("df", alias_name="df"), Sum("tf", alias_name="tf")
    )


def collect_vocab(ds, text_col: str = "text", columns=("word", "tf")) -> pa.Table:
    """Driver-side collect of the (bounded: distinct words, Zipf-capped in
    real corpora) vocab_df table. The one place that knows hash-aggregate
    outputs can contain schema-less empty blocks that must be dropped
    before concat — shared by rare_word_stats, bpe_train, doc_keywords-style
    consumers."""
    import ray

    cols = list(columns)
    refs = vocab_df(ds, text_col).select_columns(cols).to_arrow_refs()
    blocks = [t for t in (ray.get(r) for r in refs) if t.num_rows]
    if blocks:
        return pa.concat_tables(blocks).combine_chunks()
    empty = {
        "word": pa.array([], type=pa.string()),
        "df": pa.array([], type=pa.int64()),
        "tf": pa.array([], type=pa.int64()),
    }
    return pa.table({c: empty[c] for c in cols})


def sql_vocab_df(table: str = "documents") -> str:
    return (
        f"SELECT w AS word, count(DISTINCT doc_id) AS df, count(*) AS tf\n"
        f"FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text),"
        f" '{WORD_CLASS_RE}')) AS w FROM {table})\n"
        f"GROUP BY w"
    )


# -- per-doc keywords (tf-weighted by inverse document frequency) ------------


def doc_keywords(ds, *, k: int = 3, text_col: str = "text"):
    """Top-k characteristic words per document, ranked by tf/df (term count
    over corpus document frequency — an exact-rational idf weighting so the
    score is ONE IEEE division in both engines and the DuckDB oracle
    hash-matches; classic log-idf would drift in the last ulp between numpy
    and DuckDB ln). Ties break to the lexicographically smaller word.

    Shape: vocab_df partials -> small word table collected driver-side and
    broadcast (bounded: distinct words, zipf-capped in real corpora; at
    10^12 docs cap it with a min-df filter) -> one vectorized pass
    computing per-doc tf and the top-k mask."""
    import ray

    from .topk import _head_mask

    # collect once through the shared guard, then SORT BY WORD driver-side:
    # the broadcast vocab being sorted makes a word's index its global rank,
    # so per_doc needs no per-batch re-sort (same pre-sort-the-broadcast
    # move as fuzzy.py's variant table)
    df_tbl = collect_vocab(ds, text_col, columns=("word", "df")).sort_by("word")
    ref = ray.put(df_tbl)

    def per_doc(batch: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        words_arr = lookup.column("word")
        if isinstance(words_arr, pa.ChunkedArray):
            words_arr = words_arr.combine_chunks()
        df_np = lookup.column("df").to_numpy(zero_copy_only=False).astype(np.float64)
        texts = batch.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.split_pattern_regex(pc.utf8_lower(texts), WORD_CLASS_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        nonempty = pc.greater(pc.binary_length(flat), 0).to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        parents = parents[nonempty].astype(np.int64)
        if not len(flat):
            return pa.table(
                {
                    "doc_id": batch.column("doc_id").slice(0, 0),
                    "word": pa.array([], type=pa.string()),
                    "tf": pa.array([], type=pa.int64()),
                    "df": pa.array([], type=pa.int64()),
                }
            )
        # per-(doc, word) tf via one unique over packed pairs
        gcodes = pc.index_in(flat, value_set=words_arr).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        n_vocab = len(words_arr)
        pair = parents * n_vocab + gcodes
        uniq, tf = np.unique(pair, return_counts=True)
        u_doc = uniq // n_vocab
        u_word = uniq % n_vocab
        score = tf.astype(np.float64) / df_np[u_word]
        word_vals = words_arr.take(pa.array(u_word))
        # top-k per doc: rank by score desc, tie word asc — the broadcast
        # vocab is pre-sorted, so a word's code IS its global rank
        order = np.lexsort((u_word, -score, u_doc))
        mask = _head_mask(u_doc, order, k)
        sel = np.flatnonzero(mask)
        doc_col = batch.column("doc_id")
        if isinstance(doc_col, pa.ChunkedArray):
            doc_col = doc_col.combine_chunks()
        return pa.table(
            {
                "doc_id": doc_col.take(pa.array(u_doc[sel])),
                "word": word_vals.take(pa.array(sel)).cast(pa.string()),
                "tf": pa.array(tf[sel], type=pa.int64()),
                "df": pa.array(df_np[u_word[sel]].astype(np.int64), type=pa.int64()),
            }
        )

    return ds.map_batches(per_doc, batch_format="pyarrow")


def sql_doc_keywords(k: int = 3, table: str = "documents") -> str:
    return (
        f"WITH words AS (\n"
        f"  SELECT doc_id, unnest(regexp_extract_all(lower(text),"
        f" '{WORD_CLASS_RE}')) AS w FROM {table}\n"
        f"), tf AS (\n"
        f"  SELECT doc_id, w, count(*) AS tf FROM words GROUP BY doc_id, w\n"
        f"), df AS (\n"
        f"  SELECT w, count(DISTINCT doc_id) AS df FROM words GROUP BY w\n"
        f")\n"
        f"SELECT doc_id, tf.w AS word, tf, df FROM tf JOIN df USING (w)\n"
        f"QUALIFY row_number() OVER (PARTITION BY doc_id\n"
        f"  ORDER BY CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) DESC, tf.w) <= {k}"
    )


# -- PII redaction (corpus cleaning) -----------------------------------------

# RE2-safe patterns, applied in order: email first (so its digits/dots are
# not half-eaten), then unbroken long digit runs (ids/cards -> <NUM>; must
# precede the phone rule, which would otherwise swallow every 9+-digit
# run), then separator-shaped phone numbers. Identical semantics in DuckDB.
PII_RULES: list[tuple[str, str]] = [
    (r"[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    (r"[0-9]{9,}", "<NUM>"),
    (r"\+?[0-9][0-9()\-. ]{7,}[0-9]", "<PHONE>"),
]


def redact_pii(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Replace emails / phone-shaped runs / long digit runs with typed
    placeholders. Vectorized: one ``replace_substring_regex`` pass per rule."""
    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    for pat, repl in PII_RULES:
        texts = pc.replace_substring_regex(texts, pat, repl)
    return batch.append_column("clean_text", texts)


def sql_redact_pii(table: str = "documents") -> str:
    expr = "text"
    for pat, repl in PII_RULES:
        sq = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{sq}', '{repl}', 'g')"
    return f"SELECT doc_id, {expr} AS clean_text FROM {table}"


# -- language ID (n-gram/stopword heuristic; no external models) -------------
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "it", "you", "that", "was", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "von"},
    "fr": {"le", "la", "les", "et", "est", "pas", "un", "une", "dans", "pour"},
    "es": {"el", "la", "los", "que", "es", "un", "una", "por", "para", "con"},
}


class LangIdStage:
    """Actor-pool stage: stopword tables built once per actor (__init__),
    scored per batch (__call__). Falls back to 'und' when no evidence.

    Vectorized: tokens come from ONE split over the lowered batch (findall
    of the word class == split on its complement, empties dropped), the
    first-200-words cap is a rank mask, and per-language hits are ``is_in``
    + segment sums — no per-row Python."""

    def __init__(self):
        self.langs = list(_STOPWORDS)
        self.tables = [
            pa.array(sorted(_STOPWORDS[lang]), type=pa.large_string())
            for lang in self.langs
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n_docs = len(texts)
        lowered = pc.utf8_lower(texts)
        toks = pc.split_pattern_regex(lowered, "[^a-zäöüßéèàçñ]+")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        if len(flat):
            keep = pc.greater(pc.binary_length(flat), 0).to_numpy(zero_copy_only=False)
            flat = flat.filter(pa.array(keep))
            parents = parents[keep]
        hits = np.zeros((n_docs, len(self.langs)), dtype=np.int64)
        if len(flat):
            # rank of each token within its doc; score only the first LANG_CAP
            first_idx = np.zeros(n_docs, dtype=np.int64)
            counts = np.bincount(parents, minlength=n_docs)
            first_idx[1:] = np.cumsum(counts)[:-1]
            rank = np.arange(len(parents)) - first_idx[parents]
            capped = rank < LANG_CAP
            flat_c = flat.filter(pa.array(capped))
            par_c = parents[capped]
            for li, table in enumerate(self.tables):
                m = pc.is_in(flat_c, value_set=table).to_numpy(zero_copy_only=False)
                np.add.at(hits[:, li], par_c[m], 1)
        best = hits.argmax(axis=1)  # ties -> earliest language (dict order)
        none = hits.max(axis=1) == 0
        names = np.array(self.langs + ["und"])
        out = names[np.where(none, len(self.langs), best)]
        return batch.append_column("lang_pred", pa.array(out, type=pa.string()))


LANG_WORD_RE_SQL = "[a-zäöüßéèàçñ]+"
LANG_CAP = 200  # score at most the first 200 words


def sql_lang_id(table: str = "documents") -> str:
    """DuckDB oracle for LangIdStage: stopword hits per language over the
    first LANG_CAP words; argmax with ties going to the earlier language in
    _STOPWORDS order; 'und' when no stopword hits at all."""
    langs = list(_STOPWORDS)
    hit_exprs = []
    for lang in langs:
        words = ", ".join(f"'{w}'" for w in sorted(_STOPWORDS[lang]))
        hit_exprs.append(
            f"len(list_filter(w, x -> x IN ({words}))) AS hits_{lang}"
        )
    ge = {
        lang: " AND ".join(
            f"hits_{lang} >= hits_{other}" for other in langs[i + 1 :]
        )
        for i, lang in enumerate(langs)
    }
    case = [f"WHEN {' AND '.join(filter(None, ['greatest(' + ', '.join('hits_' + l for l in langs) + ') = 0']))} THEN 'und'"]
    for lang in langs[:-1]:
        cond = ge[lang] or "TRUE"
        case.append(f"WHEN {cond} THEN '{lang}'")
    case.append(f"ELSE '{langs[-1]}'")
    case_sql = "CASE " + " ".join(case) + " END"
    return (
        f"WITH words AS (\n"
        f"  SELECT doc_id, regexp_extract_all(lower(text), '{LANG_WORD_RE_SQL}')"
        f"[1:{LANG_CAP}] AS w FROM {table}\n"
        f"), hits AS (\n"
        f"  SELECT doc_id, {', '.join(hit_exprs)} FROM words\n"
        f")\n"
        f"SELECT doc_id, {case_sql} AS lang_pred FROM hits"
    )


# -- document fingerprinting (winnowing over rolling hashes) -----------------
def add_fingerprint(
    batch: pa.Table, text_col: str = "text", k: int = 5, window: int = 8
) -> pa.Table:
    """Winnowing fingerprint: k-gram rolling hashes, per-window minimum,
    fingerprint = hash of the selected minima set. Deterministic; near-equal
    texts share many selected minima (used for copy detection)."""
    texts = batch.column(text_col).to_pylist()
    fps = []
    for t in texts:
        norm = " ".join(t.lower().split())
        data = norm.encode("utf-8")
        n = len(data)
        if n < k:
            fps.append(np.uint64(len(data)).item())
            continue
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        # polynomial rolling hash of every k-gram, fully vectorized
        h = np.zeros(n - k + 1, dtype=np.uint64)
        for j in range(k):
            h = h * np.uint64(257) + arr[j : n - k + 1 + j]
        if len(h) <= window:
            sel = h.min()
            fps.append(int(sel))
            continue
        mins = np.lib.stride_tricks.sliding_window_view(h, window).min(axis=1)
        sel = np.unique(mins)
        fps.append(int(np.bitwise_xor.reduce(sel) ^ np.uint64(len(sel))))
    return batch.append_column("fingerprint", pa.array(fps, type=pa.uint64()))


def sql_fingerprint(table: str = "documents", k: int = 5, window: int = 8) -> str:
    """DuckDB oracle for ``add_fingerprint``. The k-gram polynomial hash
    never exceeds 127 * 257^(k-1) + ... < 2^63 for k=5, so the numpy uint64
    arithmetic never wraps and plain BIGINT math matches it exactly.
    ASCII assumption: byte index == char index (``ord`` == byte value)."""
    assert k == 5, "coefficients below are for k=5"
    coef = [257 ** (k - 1 - j) for j in range(k)]
    gram = " + ".join(
        f"ord(substr(t, s + {j}, 1)) * {c}::BIGINT" if c != 1 else f"ord(substr(t, s + {j}, 1))"
        for j, c in enumerate(coef)
    )
    return (
        f"WITH norm AS (\n"
        f"  SELECT doc_id, coalesce(array_to_string(regexp_extract_all(lower(text),"
        f" '{TOKEN_RE}'), ' '), '') AS t FROM {table}\n"
        f"), m AS (SELECT doc_id, t, length(t) AS n FROM norm),\n"
        f"grams AS (\n"
        f"  SELECT m.doc_id, gs.s, {gram} AS h, m.n\n"
        f"  FROM m CROSS JOIN LATERAL (SELECT unnest(range(1, m.n - {k} + 2)) AS s) gs\n"
        f"), wins AS (\n"
        f"  SELECT doc_id, s, n,\n"
        f"    min(h) OVER (PARTITION BY doc_id ORDER BY s\n"
        f"                 ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS wmin,\n"
        f"    h\n"
        f"  FROM grams\n"
        f"), fps AS (\n"
        f"  SELECT doc_id,\n"
        f"    CASE WHEN max(n) - {k} + 1 <= {window} THEN min(h)\n"
        f"         ELSE xor(bit_xor(DISTINCT wmin_valid),"
        f" count(DISTINCT wmin_valid)) END AS fp\n"
        f"  FROM (SELECT doc_id, n, h,\n"
        f"          CASE WHEN s <= n - {k} + 1 - {window - 1} THEN wmin END AS wmin_valid\n"
        f"        FROM wins)\n"
        f"  GROUP BY doc_id\n"
        f")\n"
        f"SELECT m.doc_id, CAST(coalesce(f.fp, m.n) AS UBIGINT) AS fingerprint\n"
        f"FROM m LEFT JOIN fps f ON f.doc_id = m.doc_id AND m.n >= {k}"
    )


# -- rare-word fraction (Gopher-style quality signal) ------------------------

RARE_VOCAB_K = 10


def rare_word_stats(ds, *, k: int = RARE_VOCAB_K, text_col: str = "text"):
    """Per-doc fraction of tokens outside the corpus top-``k`` vocabulary
    (a Gopher-style "too many rare words" quality signal).

    Scale shape: the broadcast side is the COMMON set (top-k by corpus tf,
    ties to the smaller word) — bounded by construction at any corpus size,
    unlike the rare set, which is most of a Zipf vocabulary. One vocab_df
    pass (per-batch combiner bounds that shuffle), driver-side k-row sort,
    then a zero-shuffle vectorized membership pass. rare_frac is one
    int/int IEEE division in both engines, so the oracle hash is exact."""
    import ray

    tbl = collect_vocab(ds, text_col)
    if tbl.num_rows:
        order = pc.sort_indices(
            tbl, sort_keys=[("tf", "descending"), ("word", "ascending")]
        )
        common = tbl.take(order.slice(0, k)).column("word").combine_chunks()
    else:
        common = pa.array([], type=pa.string())
    ref = ray.put(common)

    def per_doc(batch: pa.Table) -> pa.Table:
        common_words = ray.get(ref)
        texts = batch.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.split_pattern_regex(pc.utf8_lower(texts), WORD_CLASS_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        nonempty = pc.greater(pc.binary_length(flat), 0).to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        parents = parents[nonempty].astype(np.int64)
        n = len(batch)
        n_tokens = np.bincount(parents, minlength=n).astype(np.int64)
        is_rare = pc.is_null(pc.index_in(flat, value_set=common_words)).to_numpy(
            zero_copy_only=False
        )
        n_rare = np.bincount(parents[is_rare], minlength=n).astype(np.int64)
        frac = np.divide(
            n_rare, n_tokens, out=np.zeros(n, dtype=np.float64), where=n_tokens > 0
        )
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tokens),
                "n_rare": pa.array(n_rare),
                "rare_frac": pa.array(frac),
            }
        )

    return ds.map_batches(per_doc, batch_format="pyarrow")


def sql_rare_word_stats(k: int = RARE_VOCAB_K, table: str = "documents") -> str:
    return (
        f"WITH tf AS (\n"
        f"  SELECT w AS word, count(*) AS tf\n"
        f"  FROM (SELECT unnest(regexp_extract_all(lower(text),"
        f" '{WORD_CLASS_RE}')) AS w FROM {table}) GROUP BY w\n"
        f"), common AS (\n"
        f"  SELECT word FROM tf ORDER BY tf DESC, word LIMIT {k}\n"
        f"), toks AS (\n"
        f"  SELECT doc_id, unnest(regexp_extract_all(lower(text),"
        f" '{WORD_CLASS_RE}')) AS w FROM {table}\n"
        f"), per_doc AS (\n"
        f"  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,\n"
        f"    CAST(count(*) FILTER (w NOT IN (SELECT word FROM common))"
        f" AS BIGINT) AS n_rare\n"
        f"  FROM toks GROUP BY doc_id\n"
        f")\n"
        f"SELECT d.doc_id, coalesce(p.n_tokens, 0) AS n_tokens,\n"
        f"  coalesce(p.n_rare, 0) AS n_rare,\n"
        f"  CASE WHEN coalesce(p.n_tokens, 0) = 0 THEN 0.0\n"
        f"       ELSE p.n_rare / p.n_tokens END AS rare_frac\n"
        f"FROM {table} d LEFT JOIN per_doc p ON d.doc_id = p.doc_id"
    )


# -- boolean keyword search ---------------------------------------------------

SEARCH_TERMS = ("spark", "window")


def keyword_search(ds, terms=SEARCH_TERMS, *, text_col: str = "text"):
    """Docs whose text contains ALL ``terms`` as whole word-class tokens
    (boolean AND search). Zero-shuffle: one compiled RE2 containment test
    per term per batch; the same patterns drive the DuckDB oracle."""
    import re as _re

    pats = [rf"(^|[^a-z0-9]){_re.escape(t)}($|[^a-z0-9])" for t in terms]

    def match(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        low = pc.utf8_lower(texts)
        mask = pc.match_substring_regex(low, pats[0])
        for p in pats[1:]:
            mask = pc.and_(mask, pc.match_substring_regex(low, p))
        return batch.filter(mask)

    return ds.map_batches(match, batch_format="pyarrow")


def sql_keyword_search(
    terms=SEARCH_TERMS, table: str = "documents", cols: str = "doc_id, lang"
) -> str:
    import re as _re

    conds = " AND ".join(
        "regexp_matches(lower(text), '(^|[^a-z0-9])"
        + _re.escape(t).replace("'", "''")
        + "($|[^a-z0-9])')"
        for t in terms
    )
    return f"SELECT {cols} FROM {table} WHERE {conds}"


SYLLABLE_RE = "[aeiouy]+"     # vowel-group syllable heuristic
SENTENCE_RE = "[.!?]+"        # terminator runs


def add_readability(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Readability features (Flesch-Kincaid grade), exact-integer: word,
    sentence-terminator and vowel-group (syllable heuristic) counts plus
    the FK grade as a rational — ``fk_num / fk_den`` where

        fk_num = 39*W^2 + 1180*Syl*S - 1559*S*W,  fk_den = 100*S*W

    (FK grade = 0.39*W/S + 11.8*Syl/W - 15.59, cross-multiplied by S*W so
    no IEEE division exists to drift; S and W are clamped to >= 1). The
    textstat-style reading-level gate of corpus curation stacks, fully
    vectorized (three RE2 count kernels per batch, zero shuffles)."""
    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    low = pc.utf8_lower(texts)
    w = pc.count_substring_regex(low, WORD_CLASS_RE).cast(pa.int64())
    s = pc.count_substring_regex(low, SENTENCE_RE).cast(pa.int64())
    syl = pc.count_substring_regex(low, SYLLABLE_RE).cast(pa.int64())
    wn = np.maximum(w.to_numpy(zero_copy_only=False), 1)
    sn = np.maximum(s.to_numpy(zero_copy_only=False), 1)
    syln = syl.to_numpy(zero_copy_only=False)
    fk_num = 39 * wn * wn + 1180 * syln * sn - 1559 * sn * wn
    fk_den = 100 * sn * wn
    return (
        batch.append_column("n_words", w)
        .append_column("n_sentences", s)
        .append_column("n_syllables", syl)
        .append_column("fk_num", pa.array(fk_num.astype(np.int64)))
        .append_column("fk_den", pa.array(fk_den.astype(np.int64)))
    )


def sql_readability(table: str = "documents") -> str:
    return (
        f"WITH c AS (SELECT doc_id,\n"
        f"  length(regexp_extract_all(lower(text), '{WORD_CLASS_RE}')) AS w,\n"
        f"  length(regexp_extract_all(lower(text), '{SENTENCE_RE.replace(chr(39), chr(39)*2)}')) AS s,\n"
        f"  length(regexp_extract_all(lower(text), '{SYLLABLE_RE}')) AS syl\n"
        f"  FROM {table}),\n"
        f"g AS (SELECT doc_id, w AS n_words, s AS n_sentences, syl AS n_syllables,\n"
        f"  GREATEST(w, 1) AS wc, GREATEST(s, 1) AS sc, syl FROM c)\n"
        f"SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,\n"
        f"  CAST(n_sentences AS BIGINT) AS n_sentences,\n"
        f"  CAST(n_syllables AS BIGINT) AS n_syllables,\n"
        f"  CAST(39 * wc * wc + 1180 * syl * sc - 1559 * sc * wc AS BIGINT) AS fk_num,\n"
        f"  CAST(100 * sc * wc AS BIGINT) AS fk_den\n"
        f"FROM g"
    )
