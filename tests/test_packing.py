"""Sequence packing invariants (stages/packing.py): every chunk exactly
once, no sequence over max_len unless it is a single over-long chunk,
greedy fill order, content-derived deterministic seq ids."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from quickner_ray.stages.packing import pack_batch

MAX_LEN = 100


def _mk(chunks):
    return pa.table(
        {
            "doc_id": pa.array([c[0] for c in chunks], type=pa.int64()),
            "chunk_id": pa.array([c[1] for c in chunks], type=pa.int64()),
            "chunk_text": ["x" * c[2] for c in chunks],
        }
    )


def test_pack_invariants_random():
    rng = np.random.RandomState(3)
    chunks = [
        (int(d), int(c), int(rng.randint(1, 130)))
        for d in range(40)
        for c in range(rng.randint(1, 6))
    ]
    out = pack_batch(_mk(chunks), max_len=MAX_LEN).to_pandas()
    # every chunk exactly once
    assert len(out) == len(chunks)
    assert set(zip(out.doc_id, out.chunk_id)) == {(d, c) for d, c, _ in chunks}
    # per-sequence totals respect max_len unless a lone over-long chunk
    for _, g in out.groupby("seq_id"):
        if len(g) > 1:
            assert g.n_chars.sum() <= MAX_LEN
        # positions are 0..len-1
        assert sorted(g.seq_pos.tolist()) == list(range(len(g)))
    # greedy: a sequence never ends while the NEXT chunk would still fit
    ordered = out.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    sums = ordered.groupby("seq_id", sort=False).n_chars.sum()
    seq_order = ordered.seq_id.drop_duplicates().tolist()
    first_len = ordered.groupby("seq_id", sort=False).n_chars.first()
    for a, b in zip(seq_order, seq_order[1:]):
        assert sums[a] + first_len[b] > MAX_LEN


def test_pack_deterministic_and_ids():
    chunks = [(1, 0, 60), (1, 1, 30), (2, 0, 50), (3, 0, 200)]
    a = pack_batch(_mk(chunks), max_len=MAX_LEN).to_pandas()
    b = pack_batch(_mk(chunks), max_len=MAX_LEN).to_pandas()
    assert a.equals(b)
    by = a.set_index(["doc_id", "chunk_id"])
    # first sequence is named after its first chunk
    assert by.loc[(1, 0), "seq_id"] == "1:0"
    # 60+30 fits; +50 would exceed -> (2,0) starts "2:0"
    assert by.loc[(1, 1), "seq_id"] == "1:0"
    assert by.loc[(2, 0), "seq_id"] == "2:0"
    # over-long chunk alone in its own sequence
    assert by.loc[(3, 0), "seq_id"] == "3:0"
    assert (a.seq_id == "3:0").sum() == 1


def test_pack_doc_parts_invariants_and_naive_greedy():
    """Doc-local packer vs a naive per-doc greedy reference, plus the
    block-independence property (same output at any batch split)."""
    from quickner_ray.stages.packing import pack_doc_parts_batch

    rng = np.random.default_rng(5)
    docs = []
    for d in range(20):
        n_words = int(rng.integers(1, 30))
        words = ["w" * int(rng.integers(1, 40)) for _ in range(n_words)]
        docs.append((d, " ".join(words)))
    batch = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
            "text": pa.array([t for _, t in docs]),
        }
    )
    max_len = 60
    out = pack_doc_parts_batch(batch, max_len=max_len)
    rows = sorted(
        zip(*(out.column(c).to_pylist() for c in out.column_names))
    )
    # naive per-doc greedy reference
    ref = []
    for d, t in docs:
        parts = t.split(" ")
        fill, start = 0, 1
        for i, w in enumerate(parts, start=1):
            if i == 1 or fill + len(w) > max_len:
                fill, start = len(w), i
            else:
                fill += len(w)
            ref.append((f"{d}:{start}", i - start, d, i, len(w)))
    assert rows == sorted(ref)
    # block-independence: packing each doc alone yields identical rows
    solo = []
    for d, t in docs:
        one = pack_doc_parts_batch(
            pa.table(
                {"doc_id": pa.array([d], type=pa.int64()),
                 "text": pa.array([t])}
            ),
            max_len=max_len,
        )
        solo.extend(zip(*(one.column(c).to_pylist() for c in one.column_names)))
    assert sorted(solo) == rows


def test_pack_doc_parts_overlong_part_is_own_sequence():
    from quickner_ray.stages.packing import pack_doc_parts_batch

    batch = pa.table(
        {"doc_id": pa.array([1], type=pa.int64()),
         "text": pa.array(["aa " + "x" * 50 + " bb"])}
    )
    out = pack_doc_parts_batch(batch, max_len=10)
    seqs = out.column("seq_id").to_pylist()
    assert seqs == ["1:1", "1:2", "1:3"]  # the 50-char token stands alone
