"""Hypothesis property tests for the pure (no-Ray) per-batch kernels:
pair/relation/df generation vs brute-force references, and the WARC
record framing round-trip."""

from __future__ import annotations

import datetime as dt
import io
from itertools import combinations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from quickner_ray.stages.canonicalize import entity_id
from quickner_ray.stages.graph_cc import _cooc_batch, _df_batch
from quickner_ray.stages.relations import _rel_batch

# mention rows: few docs/surfaces so collisions and multi-mention docs occur
_docs = st.integers(min_value=0, max_value=5)
_surf = st.sampled_from(["apple", "bolt", "coil", "drum", "e f"])
_lab = st.sampled_from(["ORG", "PART"])
_mention = st.tuples(_docs, _surf, _lab, st.integers(0, 60))


def _table(rows):
    # doc-contiguity invariant: sort rows by doc id like explode_mentions
    rows = sorted(rows, key=lambda r: r[0])
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "surface_norm": [r[1] for r in rows],
            "label": [r[2] for r in rows],
            "start": pa.array([r[3] for r in rows], type=pa.int64()),
            "end": pa.array([r[3] + len(r[1]) for r in rows], type=pa.int64()),
        }
    )


@settings(max_examples=60, deadline=None)
@given(st.lists(_mention, max_size=40))
def test_cooc_batch_matches_brute_force(rows):
    got = {
        (a, b): n
        for a, b, n in zip(*[c.to_pylist() for c in _cooc_batch(_table(rows)).columns])
    }
    by_doc: dict = {}
    for d, s, l, _ in rows:
        by_doc.setdefault(d, set()).add(entity_id(s, l))
    want: dict = {}
    for ents in by_doc.values():
        for a, b in combinations(sorted(ents), 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want


@settings(max_examples=60, deadline=None)
@given(st.lists(_mention, max_size=40))
def test_df_batch_matches_brute_force(rows):
    t = _table(rows)
    got = dict(
        zip(*[c.to_pylist() for c in _df_batch(t).columns])
    )
    want: dict = {}
    seen = set()
    for d, s, l, _ in rows:
        e = entity_id(s, l)
        if (d, e) not in seen:
            seen.add((d, e))
            want[e] = want.get(e, 0) + 1
    assert got == want


@settings(max_examples=60, deadline=None)
@given(st.lists(_mention, max_size=30), st.integers(0, 50))
def test_rel_batch_matches_brute_force(rows, window):
    out = _rel_batch(_table(rows), window=window, cap=64)
    got = set(zip(*[c.to_pylist() for c in out.columns])) if out.num_rows else set()
    by_doc: dict = {}
    for d, s, l, start in rows:
        by_doc.setdefault(d, []).append((start, start + len(s), entity_id(s, l)))
    want = set()
    for d, ms in by_doc.items():
        ms = sorted(ms)[:64]
        for a in ms:
            for b in ms:
                gap = b[0] - a[1]
                if a[0] < b[0] and a[2] != b[2] and 0 <= gap <= window:
                    want.add((d, a[2], b[2], gap))
    assert got == want


_body = st.binary(max_size=200)
_lang = st.sampled_from(["", "en", "fr", "zho,eng"])


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(_body, _lang), max_size=8))
def test_warc_framing_roundtrip(recs):
    from quickner_ray.sources.warc import _parse_warc_stream, _record

    ts = dt.datetime(2024, 3, 1, 12, 0, 0)
    buf = b"".join(
        _record(f"https://h/{i}", ts, body, lang)
        for i, (body, lang) in enumerate(recs)
    )
    parsed = list(_parse_warc_stream(io.BufferedReader(io.BytesIO(buf))))
    assert [(r[0], r[2], r[3]) for r in parsed] == [
        (f"https://h/{i}", body, lang) for i, (body, lang) in enumerate(recs)
    ]
