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

No SQL oracle is claimed — the merge loop is iterative re-tokenization,
outside DuckDB's recursion-free reach — so the driver query is rows-only;
the algorithm is pinned by unit tests instead.

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
