"""Fuzzy string join: deletion-blocking completeness vs brute-force
Levenshtein, and the Dataset path vs the DuckDB oracle."""

from __future__ import annotations

import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from quickner_ray.stages.fuzzy import edit_distance_leq1


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class TestEditDistance:
    @settings(max_examples=400, deadline=None)
    @given(
        a=st.text(alphabet="abcx", max_size=6),
        b=st.text(alphabet="abcx", max_size=6),
    )
    def test_leq1_matches_brute_force(self, a, b):
        assert edit_distance_leq1(a, b) == (_lev(a, b) <= 1)


@pytest.mark.usefixtures("ray_session")
def test_fuzzy_match_vs_oracle_incl_tricky_pairs():
    import duckdb
    import pandas as pd
    import ray.data as rd

    from quickner_ray.stages.fuzzy import fuzzy_match_names, sql_fuzzy_match_names

    names = ["spark", "sort", "ab"]
    texts = [
        "spark spork sparkk park",   # sub / insert / delete variants
        "sort sbort srt stro",       # insert, delete, transposition (dist 2)
        "ba ab xy",                  # transposition 'ba' vs 'ab' is dist 2
        "verylongwordthatcannotmatch",
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}
    )
    got = fuzzy_match_names(rd.from_arrow(tbl), names).to_pandas()
    con = duckdb.connect()
    con.sql("SET threads=2")
    con.register("documents", tbl)
    ora = con.sql(sql_fuzzy_match_names(names)).df()
    key = ["word", "name"]
    a = got.sort_values(key).reset_index(drop=True)
    b = ora.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[key], b[key], check_dtype=False)
    pairs = set(map(tuple, a[key].values))
    assert ("spork", "spark") in pairs and ("sparkk", "spark") in pairs
    assert ("park", "spark") in pairs and ("srt", "sort") in pairs
    assert ("stro", "sort") not in pairs      # transposition = dist 2
    assert ("ba", "ab") not in pairs
