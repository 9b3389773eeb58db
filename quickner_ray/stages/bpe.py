"""Distributed BPE-merge training (tokenizer induction) over a corpus.

How real BPE trainers scale (HF tokenizers, SentencePiece): the corpus pass
aggregates WORD counts — embarrassingly parallel, combiner-bounded — and the
merge loop then runs over that (small, Zipf-capped) weighted vocabulary, not
the corpus. This module follows that split exactly:

- corpus pass = ``text_analysis.vocab_df`` (per-batch partial (word, tf)
  rows, one small groupby-sum — the only shuffle);
- merge loop = deterministic driver computation on the collected vocab
  (``min_count`` prunes the Zipf tail so the collect stays bounded at any
  corpus size; at 100 TB you'd also cap to the top-K words like every
  production trainer does).

Determinism: pair selection is (count DESC, left ASC, right ASC); symbol
order inside a word is positional. Identical merges at any parallelism /
block layout (pinned by tests against a brute-force reference).

SQL oracle (``sql_bpe_merges`` / ``sql_bpe_encoded_counts``): the merge
loop has a CLOSED form for a fixed ``n_merges`` — one chained CTE pair per
rank. Words encode as chr(2)-double-delimited symbol strings
(``␂␂a␂␂b␂␂``); adjacent pairs extract with one non-overlapping regex per
boundary parity (the second parity strips the leading symbol first);
the rank's winner is ``ORDER BY cnt DESC, l, r LIMIT 1``; applying a merge
is ONE ``replace(s, ␂l␂␂r␂, ␂lr␂)`` — each match consumes one delimiter
from each side's double boundary, so plain left-to-right non-overlapping
``replace`` reproduces the trainer's in-word scan EXACTLY (runs like
"aaaaa" group from the left on both engines; pinned by tests). Symbols are
``[a-z0-9]`` runs, so chr(2) can never collide.

No counterpart in the reference (SURVEY.md §2 has no tokenizer training);
extension operator for the training-data pipeline set.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

DEFAULT_MERGES = 20
DEFAULT_MIN_COUNT = 1


def learn_merges(
    word_counts: list[tuple[str, int]],
    n_merges: int = DEFAULT_MERGES,
) -> list[tuple[str, str, int]]:
    """Classic BPE merge learning over a weighted vocabulary.

    Returns up to ``n_merges`` merges as (left, right, pair_count) in rank
    order. Pure driver-side function; input is the bounded vocab table."""
    # each word -> list of current symbols (initially characters)
    seqs: list[list[str]] = [list(w) for w, _ in word_counts]
    weights = [int(c) for _, c in word_counts]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, w in zip(seqs, weights):
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += w
        if not pairs:
            break
        # (count DESC, left ASC, right ASC) — deterministic
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((left, right, cnt))
        tgt = left + right
        for syms in seqs:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == left and syms[i + 1] == right:
                    syms[i : i + 2] = [tgt]
                else:
                    i += 1
    return merges


def bpe_train(
    ds,
    *,
    n_merges: int = DEFAULT_MERGES,
    min_count: int = DEFAULT_MIN_COUNT,
    text_col: str = "text",
):
    """Corpus -> merge table Dataset (rank, left, right, pair_count).

    One distributed vocab pass; the merge loop runs on the collected
    (word, tf) table, pruned by ``min_count``."""
    import ray.data as rd

    from .text_analysis import collect_vocab

    tbl = collect_vocab(ds, text_col)
    wc = [
        (w, c)
        for w, c in zip(tbl.column("word").to_pylist(), tbl.column("tf").to_pylist())
        if c >= min_count
    ]
    wc.sort()  # input order must not depend on block layout
    merges = learn_merges(wc, n_merges)
    tbl = pa.table(
        {
            "rank": pa.array(range(1, len(merges) + 1), type=pa.int64()),
            "left": pa.array([m[0] for m in merges], type=pa.string()),
            "right": pa.array([m[1] for m in merges], type=pa.string()),
            "pair_count": pa.array([m[2] for m in merges], type=pa.int64()),
        }
    )
    return rd.from_arrow(tbl)


def apply_merges(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Encode one word with a trained merge table, applying merges in RANK
    order with left-to-right replacement — the exact procedure
    ``learn_merges`` used on its vocabulary, so training corpus words
    round-trip to their trained segmentations."""
    syms = list(word)
    for left, right in merges:
        i = 0
        while i < len(syms) - 1:
            if syms[i] == left and syms[i + 1] == right:
                syms[i : i + 2] = [left + right]
            else:
                i += 1
    return syms


class BpeEncodeStage:
    """Tokenize-the-corpus stage: per doc, the BPE token count under a
    broadcast merge table. The merge loop runs once per DISTINCT word per
    batch (vocab-bounded, not token-stream-bounded — the same cost argument
    as the minhash shingler); per-doc totals are one bincount over parent
    indices. Rows-only in the driver gate (iterative merges are outside
    SQL); exactness is pinned by a pure-Python whole-text reference test."""

    def __init__(self, merges_ref):
        import ray

        merges = merges_ref
        if isinstance(merges, ray.ObjectRef):
            merges = ray.get(merges)
        self.merges = [(l, r) for l, r, *_ in merges]
        self.cache: dict[str, int] = {}

    def _word_len(self, w: str) -> int:
        n = self.cache.get(w)
        if n is None:
            n = self.cache[w] = len(apply_merges(w, self.merges))
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        from .text_analysis import WORD_CLASS_SPLIT_RE

        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        ids = batch.column("doc_id")
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=batch.schema.field("doc_id").type),
                    "n_bpe_tokens": pa.array([], type=pa.int64()),
                }
            )
        toks = pc.split_pattern_regex(pc.utf8_lower(texts), WORD_CLASS_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        if len(flat):
            nonempty = pc.greater(pc.binary_length(flat), 0).to_numpy(
                zero_copy_only=False
            )
            flat = flat.filter(pa.array(nonempty))
            parents = parents[nonempty]
        counts = np.zeros(batch.num_rows, dtype=np.int64)
        if len(flat):
            enc = pc.dictionary_encode(flat)
            codes = enc.indices.to_numpy(zero_copy_only=False)
            per_word = np.fromiter(
                (self._word_len(w) for w in enc.dictionary.to_pylist()),
                dtype=np.int64,
                count=len(enc.dictionary),
            )
            np.add.at(counts, parents, per_word[codes])
        return pa.table(
            {"doc_id": ids, "n_bpe_tokens": pa.array(counts, type=pa.int64())}
        )


# --- closed-SQL oracle (chained per-rank CTEs; see module docstring) --------

_PAIR_RE = r"\x02([^\x02]+)\x02\x02([^\x02]+)\x02"
_STRIP_RE = r"^\x02\x02[^\x02]+"


def _sql_bpe_chain(table: str, n_merges: int, min_count: int) -> str:
    """WITH-clause body defining v0..v{n} (vocab with evolving symbol
    strings) and m1..m{n} (per-rank winning merges). The final vocabulary
    segmentation is ``v{n_merges}``."""
    parts = [
        # weighted vocab + initial char-level symbol encoding
        f"v0 AS MATERIALIZED (SELECT word, tf,\n"
        f"  chr(2) || chr(2) ||"
        f" array_to_string(regexp_extract_all(word, '.'), chr(2) || chr(2))"
        f" || chr(2) || chr(2) AS s\n"
        f"  FROM (SELECT w AS word, CAST(count(*) AS BIGINT) AS tf\n"
        f"        FROM (SELECT unnest(regexp_extract_all(lower(text),"
        f" '[a-z0-9]+')) AS w FROM {table})\n"
        f"        GROUP BY w) )"
    ]
    for k in range(1, n_merges + 1):
        prev = f"v{k - 1}"
        # adjacent pairs at both boundary parities, weighted by tf; the
        # min_count prune applies to LEARNING only (encode still covers
        # every word, matching bpe_encode's split)
        src = f"(SELECT tf, s FROM {prev} WHERE tf >= {min_count})"
        parts.append(
            f"p{k} AS MATERIALIZED (\n"
            f"  SELECT l, r, CAST(sum(tf) AS BIGINT) AS cnt FROM (\n"
            f"    SELECT tf, regexp_extract(m, '{_PAIR_RE}', 1) AS l,\n"
            f"               regexp_extract(m, '{_PAIR_RE}', 2) AS r\n"
            f"    FROM (SELECT tf, unnest(regexp_extract_all(s,"
            f" '{_PAIR_RE}')) AS m FROM {src} q)\n"
            f"    UNION ALL\n"
            f"    SELECT tf, regexp_extract(m, '{_PAIR_RE}', 1),\n"
            f"               regexp_extract(m, '{_PAIR_RE}', 2)\n"
            f"    FROM (SELECT tf, unnest(regexp_extract_all("
            f"regexp_replace(s, '{_STRIP_RE}', ''), '{_PAIR_RE}')) AS m"
            f" FROM {src} q2)\n"
            f"  ) GROUP BY l, r)"
        )
        parts.append(
            f"m{k} AS MATERIALIZED (SELECT l, r, cnt FROM p{k}"
            f" ORDER BY cnt DESC, l, r LIMIT 1)"
        )
        # chr(3) fallback pattern can never match, so an exhausted vocab
        # (empty m{k}) leaves s unchanged instead of nulling it
        parts.append(
            f"v{k} AS MATERIALIZED (SELECT word, tf, replace(s,\n"
            f"  chr(2) || coalesce((SELECT l FROM m{k}), chr(3)) ||"
            f" chr(2) || chr(2) || coalesce((SELECT r FROM m{k}), chr(3))"
            f" || chr(2),\n"
            f"  chr(2) || coalesce((SELECT l || r FROM m{k}), chr(3))"
            f" || chr(2)) AS s FROM {prev})"
        )
    return ",\n".join(parts)


def sql_bpe_merges(
    table: str = "documents",
    n_merges: int = DEFAULT_MERGES,
    min_count: int = DEFAULT_MIN_COUNT,
) -> str:
    """Oracle for ``bpe_train``: (rank, left, right, pair_count)."""
    arms = "\nUNION ALL ".join(
        f'SELECT {k} AS "rank", l AS "left", r AS "right",'
        f" cnt AS pair_count FROM m{k}"
        for k in range(1, n_merges + 1)
    )
    return f"WITH {_sql_bpe_chain(table, n_merges, min_count)}\n{arms}"


def sql_bpe_encoded_counts(
    table: str = "documents",
    n_merges: int = DEFAULT_MERGES,
    min_count: int = DEFAULT_MIN_COUNT,
) -> str:
    """Oracle for ``bpe_encode``: (doc_id, n_bpe_tokens) — the final
    vocabulary segmentation (v{n}) joins each document's token stream;
    a word's BPE token count is its delimiter count / 2 − 1."""
    return (
        f"WITH {_sql_bpe_chain(table, n_merges, min_count)},\n"
        f"seg AS (SELECT word, CAST((length(s) -"
        f" length(replace(s, chr(2), ''))) // 2 - 1 AS BIGINT) AS n"
        f" FROM v{n_merges}),\n"
        f"toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),"
        f" '[a-z0-9]+')) AS w FROM {table}),\n"
        f"cnt AS (SELECT t.doc_id, sum(seg.n) AS n FROM toks t"
        f" JOIN seg ON seg.word = t.w GROUP BY t.doc_id)\n"
        f"SELECT d.doc_id, CAST(coalesce(c.n, 0) AS BIGINT) AS n_bpe_tokens\n"
        f"FROM {table} d LEFT JOIN cnt c ON d.doc_id = c.doc_id"
    )


def bpe_encode(
    ds,
    *,
    n_merges: int = DEFAULT_MERGES,
    min_count: int = DEFAULT_MIN_COUNT,
    text_col: str = "text",
):
    """Corpus -> Dataset(doc_id, n_bpe_tokens): train the merge table (one
    vocab pass), broadcast it, and tokenize every document with it — the
    train-then-apply pair every LLM data pipeline runs before packing."""
    import ray

    from .taskstate import task_stage
    from .text_analysis import collect_vocab

    tbl = collect_vocab(ds, text_col)
    wc = [
        (w, c)
        for w, c in zip(tbl.column("word").to_pylist(), tbl.column("tf").to_pylist())
        if c >= min_count
    ]
    wc.sort()
    merges = learn_merges(wc, n_merges)
    ref = ray.put(merges)
    return ds.map_batches(
        task_stage(BpeEncodeStage, merges_ref=ref), batch_format="pyarrow"
    )
