"""Hashed-linear classifier inference: brute-force reference, batch-layout
invariance, broadcast-weights path."""

from __future__ import annotations

import re

import numpy as np
import pytest
import ray.data as rd

from quickner_ray.stages.classifier import (
    D_FEATURES,
    W_MIX,
    ClassifierScorer,
    _stand_in_weights,
    classifier_scores,
)
from quickner_ray.stages.dedup_approx import h64

DOCS = [
    ("d1", "Rust is FAST and fast to 42 ship"),
    ("d2", ""),
    ("d3", "  --- !!! ---  "),
    ("d4", "one"),
    ("d5", "repeat repeat repeat repeat"),
]


def _ref_score(text: str, weights) -> tuple[int, int]:
    toks = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
    return len(toks), int(sum(int(weights[h64(w) % len(weights)]) for w in toks))


def test_stand_in_weights_shape():
    w = _stand_in_weights()
    assert len(w) == D_FEATURES
    assert w.min() == -(D_FEATURES - 1) // 2 and w.max() == (D_FEATURES - 1) // 2
    # Lehmer mix is a bijection for gcd(W_MIX, D)=1: all weights distinct
    assert len(np.unique(w)) == D_FEATURES and W_MIX % 7 != 0


def test_matches_brute_force_reference():
    import pyarrow as pa

    w = _stand_in_weights()
    batch = pa.table(
        {"doc_id": [d for d, _ in DOCS], "text": [t for _, t in DOCS]}
    )
    out = ClassifierScorer()(batch)
    for i, (_, text) in enumerate(DOCS):
        n, s = _ref_score(text, w)
        assert out.column("n_tokens")[i].as_py() == n
        assert out.column("score")[i].as_py() == s
        assert out.column("keep")[i].as_py() == int(s > 0)


@pytest.mark.usefixtures("ray_session")
def test_batch_layout_invariance():
    rows = [{"doc_id": f"d{i}", "text": f"alpha beta{i % 3} gamma " * (i % 5)}
            for i in range(40)]
    outs = []
    for bs in (1, 7, 64):
        ds = rd.from_items(rows).map_batches(
            lambda b: b, batch_format="pyarrow", batch_size=bs
        )
        got = {
            r["doc_id"]: (r["n_tokens"], r["score"], r["keep"])
            for r in classifier_scores(ds).take_all()
        }
        outs.append(got)
    assert outs[0] == outs[1] == outs[2]


@pytest.mark.usefixtures("ray_session")
def test_broadcast_weights_ref_path():
    import ray

    # a "trained model": different D, all-ones weights -> score == n_tokens
    ones = np.ones(97, dtype=np.int64)
    ds = rd.from_items([{"doc_id": d, "text": t} for d, t in DOCS])
    out = classifier_scores(ds, weights_ref=ray.put(ones)).take_all()
    for r in out:
        assert r["score"] == r["n_tokens"]
