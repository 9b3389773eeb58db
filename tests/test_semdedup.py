"""SemDeDup: brute-force greedy reference, duplicate collapse, batch-layout
determinism, cap behavior."""

from __future__ import annotations

import numpy as np
import pytest
import ray.data as rd

from quickner_ray.stages.semdedup import _greedy_keep, semdedup


def _rows(vectors, ids=None):
    ids = ids if ids is not None else list(range(len(vectors)))
    return [
        {"vec_id": i, "embedding": [float(x) for x in v]}
        for i, v in zip(ids, vectors)
    ]


def _ref_greedy(vectors, tau):
    """Brute-force greedy keep over id-ordered unit vectors."""
    kept: list[int] = []
    out = []
    unit = []
    for v in vectors:
        a = np.asarray(v, dtype=np.float64)
        n = np.linalg.norm(a)
        unit.append(a / n if n else a)
    for i, u in enumerate(unit):
        if any(float(u @ unit[j]) >= tau for j in kept):
            out.append(0)
        else:
            kept.append(i)
            out.append(1)
    return out


def test_greedy_keep_matches_reference():
    rng = np.random.default_rng(7)
    base = rng.normal(size=(12, 8))
    # inject exact and near duplicates
    vecs = np.vstack([base, base[3], base[5] * 1.7, base[0] + 1e-4 * base[1]])
    keep = _greedy_keep(vecs, 0.95)
    assert list(keep.astype(int)) == _ref_greedy(list(vecs), 0.95)
    assert keep[12] == False and keep[13] == False  # noqa: E712


def test_zero_vector_is_safe():
    vecs = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 0.0]])
    keep = _greedy_keep(vecs, 0.95)
    # zero vectors have cos 0 with everything except each other (0/1*1=0)
    assert keep[0] and keep[1]


@pytest.mark.usefixtures("ray_session")
def test_single_cluster_matches_brute_force():
    rng = np.random.default_rng(11)
    base = rng.normal(size=(20, 6))
    vecs = np.vstack([base, base[2], base[7] * 3.0])
    rows = _rows(list(vecs))
    out = semdedup(rd.from_items(rows), k=1, iters=1, tau=0.95).take_all()
    got = {r["vec_id"]: r["keep"] for r in out}
    ordered_ids = sorted(got)
    ref = _ref_greedy(
        [rows_r["embedding"] for rows_r in sorted(rows, key=lambda r: r["vec_id"])],
        0.95,
    )
    assert [got[i] for i in ordered_ids] == ref
    assert len(out) == len(rows)  # every input row appears exactly once


@pytest.mark.usefixtures("ray_session")
def test_exact_duplicates_collapse_to_lowest_id():
    v = [1.0, 2.0, 3.0]
    rows = _rows([v, v, v, [9.0, -1.0, 0.0]], ids=[10, 11, 12, 13])
    out = semdedup(rd.from_items(rows), k=1, iters=1, tau=0.999).take_all()
    got = {r["vec_id"]: r["keep"] for r in out}
    assert got == {10: 1, 11: 0, 12: 0, 13: 1}


@pytest.mark.usefixtures("ray_session")
def test_parallelism_invariance():
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(60, 5))
    vecs[30:40] = vecs[0:10]  # duplicates across the table
    rows = _rows(list(vecs))
    results = []
    for nblocks in (1, 4, 16):
        ds = rd.from_items(rows, override_num_blocks=nblocks)
        out = semdedup(ds, k=4, iters=2, tau=0.98).take_all()
        results.append(sorted((r["vec_id"], r["cluster"], r["keep"]) for r in out))
    assert results[0] == results[1] == results[2]


@pytest.mark.usefixtures("ray_session")
def test_cluster_cap_keeps_tail_uncompared():
    v = [1.0, 0.0]
    rows = _rows([v] * 6)
    out = semdedup(
        rd.from_items(rows), k=1, iters=1, tau=0.9, cluster_cap=3
    ).take_all()
    got = {r["vec_id"]: r["keep"] for r in out}
    # first 3 ids compared (1 kept), tail beyond the cap kept un-compared
    assert got == {0: 1, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}
