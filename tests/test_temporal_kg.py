"""Temporal-KG operators (stages/temporal.py): island semantics including
value reversion, as-of tie/null/key-boundary cases, majority-vote tie-break
and distinct-source counting, and bucket-count invariance (the results must
not depend on how rows were partitioned)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

from quickner_ray.stages.temporal import asof_join, islands_by_key, majority_vote


def _pdf(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return df.sort_values(sorted(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def obs_table():
    # key (1, 'a'): x x y x  -> THREE islands (reversion restarts)
    # key (1, 'b'): z z      -> one island
    # key (2, 'a'): x        -> one island (adjacent doc ids share buckets)
    return pa.table(
        {
            "doc_id": pa.array([1, 1, 1, 1, 1, 1, 2], type=pa.int64()),
            "attr": ["a", "a", "a", "a", "b", "b", "a"],
            "snap": pa.array([0, 1, 2, 3, 0, 1, 0], type=pa.int64()),
            "value": ["x", "x", "y", "x", "z", "z", "x"],
        }
    )


def test_islands_reversion_and_keys(ray_session, obs_table):
    import ray.data as rd

    out = _pdf(
        islands_by_key(
            rd.from_arrow(obs_table).repartition(3),
            key_cols=["doc_id", "attr"],
            order_col="snap",
            value_col="value",
        )
    )
    rows = {
        (r.doc_id, r.attr, r.valid_from): (r.value, r.valid_to, r.n_snaps)
        for r in out.itertuples()
    }
    assert rows == {
        (1, "a", 0): ("x", 1, 2),
        (1, "a", 2): ("y", 2, 1),
        (1, "a", 3): ("x", 3, 1),  # reversion = NEW island, not merged
        (1, "b", 0): ("z", 1, 2),
        (2, "a", 0): ("x", 0, 1),
    }


def test_islands_bucket_invariance(ray_session, obs_table):
    import ray.data as rd

    a = _pdf(
        islands_by_key(
            rd.from_arrow(obs_table),
            key_cols=["doc_id", "attr"],
            order_col="snap",
            value_col="value",
            n_buckets=1,
        )
    )
    b = _pdf(
        islands_by_key(
            rd.from_arrow(obs_table).repartition(5),
            key_cols=["doc_id", "attr"],
            order_col="snap",
            value_col="value",
            n_buckets=64,
        )
    )
    pd.testing.assert_frame_equal(a, b)


def test_island_counts(ray_session, obs_table):
    import ray.data as rd

    from quickner_ray.stages.temporal import island_counts

    out = _pdf(
        island_counts(
            rd.from_arrow(obs_table).repartition(4),
            key_cols=["doc_id", "attr"],
            order_col="snap",
            value_col="value",
        )
    )
    got = {(r.doc_id, r.attr): r.n_islands for r in out.itertuples()}
    assert got == {(1, "a"): 3, (1, "b"): 1, (2, "a"): 1}


def test_asof_ties_nulls_and_key_guard(ray_session):
    import ray.data as rd

    right = pa.table(
        {
            "doc_id": pa.array([1, 1, 2], type=pa.int64()),
            "attr": ["a", "a", "a"],
            "obs_ts": pa.array([10, 20, 5], type=pa.int64()),
            "value": ["v10", "v20", "w5"],
        }
    )
    left = pa.table(
        {
            "doc_id": pa.array([1, 1, 1, 1, 2], type=pa.int64()),
            # key (1,'b') has NO right rows: must stay null even though
            # key (1,'a') right rows sort immediately before it
            "attr": ["a", "a", "a", "b", "a"],
            "probe_ts": pa.array([9, 10, 25, 50, 4], type=pa.int64()),
        }
    )
    out = _pdf(
        asof_join(
            rd.from_arrow(left).repartition(2),
            rd.from_arrow(right),
            key_cols=["doc_id", "attr"],
            left_ts="probe_ts",
            right_ts="obs_ts",
            value_cols=["value", "obs_ts"],
            carry_cols=[],
        )
    )
    got = {
        (r.doc_id, r.attr, r.probe_ts): (
            None if pd.isna(r.value) else r.value,
            None if pd.isna(r.obs_ts) else int(r.obs_ts),
        )
        for r in out.itertuples()
    }
    assert got == {
        (1, "a", 9): (None, None),  # before first observation
        (1, "a", 10): ("v10", 10),  # equal ts INCLUDED
        (1, "a", 25): ("v20", 20),
        (1, "b", 50): (None, None),  # no cross-key leakage
        (2, "a", 4): (None, None),
    }


def test_majority_vote_tiebreak_and_distinct_sources(ray_session):
    import ray.data as rd

    facts = pa.table(
        {
            "doc_id": pa.array([1] * 4 + [2] * 3 + [3] * 2, type=pa.int64()),
            "attr": ["a"] * 9,
            # doc 1: 2-2 tie between 'm' and 'k' -> smallest value 'k' wins
            # doc 2: source s1 asserts TWO values; n_sources must be 2 (not 3)
            # doc 3: duplicate assertion rows collapse (support 1)
            "value": ["m", "m", "k", "k", "p", "p", "q", "r", "r"],
            "source": ["s1", "s2", "s3", "s4", "s1", "s2", "s1", "s9", "s9"],
        }
    )
    out = _pdf(
        majority_vote(
            rd.from_arrow(facts).repartition(3),
            key_cols=["doc_id", "attr"],
            value_col="value",
            source_col="source",
        )
    )
    got = {
        r.doc_id: (r.n_sources, r.n_values, r.majority_value, r.support, r.conflict)
        for r in out.itertuples()
    }
    assert got == {
        1: (4, 2, "k", 2, 1),
        2: (2, 2, "p", 2, 1),
        3: (1, 1, "r", 1, 0),
    }


# ---- hypothesis property tests: kernels vs brute-force references ----

from hypothesis import given, settings
from hypothesis import strategies as st

_key = st.integers(min_value=0, max_value=3)
_attr = st.sampled_from(["a", "b"])
_snap = st.integers(min_value=0, max_value=5)
_val = st.sampled_from(["x", "y", "z"])
_src = st.sampled_from(["s1", "s2", "s3"])


def _brute_islands(rows):
    """rows: (doc, attr, snap, value), unique (doc, attr, snap)."""
    from collections import defaultdict

    seq = defaultdict(list)
    for d, a, s, v in rows:
        seq[(d, a)].append((s, v))
    out = set()
    for (d, a), obs in seq.items():
        obs.sort()
        i = 0
        while i < len(obs):
            j = i
            while j + 1 < len(obs) and obs[j + 1][1] == obs[i][1]:
                j += 1
            out.add((d, a, obs[i][1], obs[i][0], obs[j][0], j - i + 1))
            i = j + 1
    return out


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(_key, _attr, _snap, _val), min_size=1, max_size=30,
        unique_by=lambda r: (r[0], r[1], r[2]),
    )
)
def test_islands_hypothesis(ray_session, rows):
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "attr": [r[1] for r in rows],
            "snap": pa.array([r[2] for r in rows], type=pa.int64()),
            "value": [r[3] for r in rows],
        }
    )
    out = _pdf(
        islands_by_key(
            rd.from_arrow(t).repartition(3),
            key_cols=["doc_id", "attr"],
            order_col="snap",
            value_col="value",
            n_buckets=4,
        )
    )
    got = {
        (r.doc_id, r.attr, r.value, r.valid_from, r.valid_to, r.n_snaps)
        for r in out.itertuples()
    }
    assert got == _brute_islands(rows)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(_key, _attr, _snap, _val), min_size=1, max_size=20,
        unique_by=lambda r: (r[0], r[1], r[2]),
    ),
    st.lists(
        st.tuples(_key, _attr, st.integers(min_value=-1, max_value=7)),
        min_size=1, max_size=20, unique_by=lambda r: (r[0], r[1], r[2]),
    ),
)
def test_asof_hypothesis(ray_session, right_rows, left_rows):
    import ray.data as rd

    right = pa.table(
        {
            "doc_id": pa.array([r[0] for r in right_rows], type=pa.int64()),
            "attr": [r[1] for r in right_rows],
            "obs_ts": pa.array([r[2] for r in right_rows], type=pa.int64()),
            "value": [r[3] for r in right_rows],
        }
    )
    left = pa.table(
        {
            "doc_id": pa.array([r[0] for r in left_rows], type=pa.int64()),
            "attr": [r[1] for r in left_rows],
            "probe_ts": pa.array([r[2] for r in left_rows], type=pa.int64()),
        }
    )
    out = _pdf(
        asof_join(
            rd.from_arrow(left).repartition(2),
            rd.from_arrow(right).repartition(2),
            key_cols=["doc_id", "attr"],
            left_ts="probe_ts",
            right_ts="obs_ts",
            value_cols=["value"],
            carry_cols=[],
            n_buckets=4,
        )
    )
    got = {
        (r.doc_id, r.attr, r.probe_ts): (None if pd.isna(r.value) else r.value)
        for r in out.itertuples()
    }
    assert len(out) == len(left_rows)
    for d, a, pt in [(r[0], r[1], r[2]) for r in left_rows]:
        cands = [r for r in right_rows if r[0] == d and r[1] == a and r[2] <= pt]
        want = max(cands, key=lambda r: r[2])[3] if cands else None
        assert got[(d, a, pt)] == want, (d, a, pt)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(_key, _attr, _val, _src), min_size=1, max_size=30,
    )
)
def test_majority_vote_hypothesis(ray_session, rows):
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "attr": [r[1] for r in rows],
            "value": [r[2] for r in rows],
            "source": [r[3] for r in rows],
        }
    )
    out = _pdf(
        majority_vote(
            rd.from_arrow(t).repartition(3),
            key_cols=["doc_id", "attr"],
            value_col="value",
            source_col="source",
            n_buckets=4,
        )
    )
    from collections import defaultdict

    by_key = defaultdict(set)
    for d, a, v, s in rows:
        by_key[(d, a)].add((v, s))
    assert len(out) == len(by_key)
    for r in out.itertuples():
        triples = by_key[(r.doc_id, r.attr)]
        vals = {v for v, _ in triples}
        srcs = {s for _, s in triples}
        sup = {v: len({s for vv, s in triples if vv == v}) for v in vals}
        best = max(sup.values())
        winner = min(v for v in vals if sup[v] == best)
        assert (r.n_sources, r.n_values) == (len(srcs), len(vals))
        assert (r.majority_value, r.support) == (winner, best)
        assert r.conflict == int(len(vals) > 1)


def test_contract_queries_match_duckdb(ray_session, sf_dir):
    """End-to-end: the three contract queries hash-match their oracles at
    sf0.001 (the driver gate in miniature)."""
    import duckdb

    import __ray_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    for name in (
        "fact_validity_intervals",
        "fact_asof_lookup",
        "fact_majority_vote",
        "fact_churn_stats",
    ):
        ray_df = _pdf(q[name](sf_dir))
        sql_df = con.execute(o[name]).fetchdf()
        sql_df = sql_df.sort_values(
            sorted(sql_df.columns), kind="mergesort"
        ).reset_index(drop=True)[sorted(sql_df.columns)]
        ray_df = ray_df[sorted(ray_df.columns)]
        assert list(ray_df.columns) == list(sql_df.columns), name
        assert len(ray_df) == len(sql_df), name
        for c in ray_df.columns:
            a, b = ray_df[c], sql_df[c]
            if a.dtype == object or b.dtype == object:
                assert a.astype(str).equals(b.astype(str)), (name, c)
            else:
                assert a.astype("float64").equals(b.astype("float64")), (name, c)
