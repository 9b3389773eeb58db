"""TextRank summarization (stages/textrank.py): exact-integer fixed point
pinned against a hand-computed example, layout invariance, and edge cases."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from quickner_ray.stages.textrank import (
    HALF,
    SCALE,
    _doc_scores,
    textrank_top_sentences,
)


def _ds(texts, parts=2):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts),
            }
        )
    ).repartition(parts)


def test_doc_scores_hand_computed():
    # 3 sentences: A={a,b}, B={b,c}, C={c}
    # w_AB=1 (b), w_BC=1 (c), w_AC=0; W_A=1, W_B=2, W_C=1
    ws = [{"a", "b"}, {"b", "c"}, {"c"}]
    s1 = _doc_scores(ws, 1)
    # s1_A = H + (S*1//2)//2 ; s1_B = H + (S//1 + S//1)//2 ; s1_C = H + (S*1//2)//2
    assert s1.tolist() == [
        HALF + (SCALE // 2) // 2,
        HALF + (SCALE + SCALE) // 2,
        HALF + (SCALE // 2) // 2,
    ]


def test_isolated_and_single_sentence():
    assert _doc_scores([{"x"}], 2).tolist() == [HALF]
    assert _doc_scores([set(), set()], 2).tolist() == [HALF, HALF]


def test_top_sentence_and_ties(ray_session):
    # doc 0: middle sentence shares words with both others -> highest score;
    # doc 1: all sentences disjoint -> all HALF, tie goes to sent_idx 1
    rows = textrank_top_sentences(
        _ds(
            [
                "red apple pie. apple pie and cake. cake stand here.",
                "alpha one. beta two. gamma three.",
            ]
        )
    ).take_all()
    got = {r["doc_id"]: (r["sent_idx"], r["sentence"]) for r in rows}
    assert got[0][0] == 2 and "apple pie and cake" in got[0][1]
    assert got[1] == (1, "alpha one")


def test_layout_invariance(ray_session):
    texts = [f"alpha {i} beta. beta gamma {i}. gamma delta." for i in range(40)]
    a = sorted(
        tuple(r.values())
        for r in textrank_top_sentences(_ds(texts, parts=1)).take_all()
    )
    b = sorted(
        tuple(r.values())
        for r in textrank_top_sentences(_ds(texts, parts=8)).take_all()
    )
    assert a == b
