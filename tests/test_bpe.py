"""BPE merge learning: hand-derived merges, determinism across layouts,
weighting by term frequency."""

from __future__ import annotations

import pyarrow as pa
import pytest

from quickner_ray.stages.bpe import learn_merges


class TestLearnMerges:
    def test_hand_derived(self):
        # "abab" x3, "ab" x2 -> pair (a,b) count 3*2+2*1=8 wins first.
        # After merging: ["ab","ab"] x3, ["ab"] x2 -> (ab,ab) count 3.
        merges = learn_merges([("abab", 3), ("ab", 2)], n_merges=3)
        assert merges[0] == ("a", "b", 8)
        assert merges[1] == ("ab", "ab", 3)
        assert len(merges) == 2  # nothing left to merge

    def test_tie_breaks_lexicographic(self):
        # pairs (a,b) and (c,d) both count 1 -> (a,b) first
        merges = learn_merges([("ab", 1), ("cd", 1)], n_merges=1)
        assert merges[0] == ("a", "b", 1)

    def test_weight_beats_length(self):
        # rare long word vs frequent short word: frequency dominates
        merges = learn_merges([("xy", 10), ("zzzz", 1)], n_merges=1)
        assert merges[0] == ("x", "y", 10)


@pytest.mark.usefixtures("ray_session")
def test_bpe_train_deterministic_across_layouts():
    import ray.data as rd

    from quickner_ray.stages.bpe import bpe_train

    texts = ["the cat sat", "the cat", "a hat the cat wore", "sat sat the"]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}
    )
    a = bpe_train(rd.from_arrow(tbl), n_merges=8).to_pandas()
    b = bpe_train(rd.from_arrow(tbl).repartition(5), n_merges=8).to_pandas()
    assert a.equals(b)
    # "th"+"e" or "at" family dominates this corpus; first merge count must
    # equal the corpus-wide pair weight, here ('a','t') in cat/sat/hat = 7
    # vs ('t','h') in 'the' x4 -> at wins with 7
    assert a.iloc[0][["left", "right"]].tolist() == ["a", "t"]
    assert a.iloc[0]["pair_count"] == 7


class TestSqlOracle:
    """The closed-SQL unrolled trainer must match learn_merges exactly —
    including the in-word scan semantics on repeated-symbol runs, where a
    naive single-delimiter replace() groups differently."""

    def _run(self, texts, n_merges=6):
        import duckdb

        from quickner_ray.stages.bpe import sql_bpe_encoded_counts, sql_bpe_merges

        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM (VALUES "
            + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
            + ") t(doc_id, text)"
        )
        m = sorted(con.sql(sql_bpe_merges(n_merges=n_merges)).fetchall())
        c = dict(con.sql(sql_bpe_encoded_counts(n_merges=n_merges)).fetchall())
        return m, c

    def _reference(self, texts, n_merges=6):
        import re

        from quickner_ray.stages.bpe import apply_merges, learn_merges

        wc: dict = {}
        doc_words = []
        for t in texts:
            ws = re.findall(r"[a-z0-9]+", t.lower())
            doc_words.append(ws)
            for w in ws:
                wc[w] = wc.get(w, 0) + 1
        merges = learn_merges(sorted(wc.items()), n_merges)
        m2 = [(l, r) for l, r, _ in merges]
        counts = {
            i: sum(len(apply_merges(w, m2)) for w in ws)
            for i, ws in enumerate(doc_words)
        }
        return (
            sorted((k + 1, l, r, c) for k, (l, r, c) in enumerate(merges)),
            counts,
        )

    @pytest.mark.parametrize(
        "texts",
        [
            # odd/even repeated-symbol runs: left-grouping must match
            ["aaaaa aaaa aaa", "aa aaaaa"],
            ["the cat sat on the mat", "a hat the cat wore", "sat sat the"],
            ["ababab abab ab", "ba ab abab"],
            ["", "no1 alpha99 no1"],
        ],
    )
    def test_matches_python_trainer(self, texts):
        got_m, got_c = self._run(texts)
        want_m, want_c = self._reference(texts)
        assert got_m == want_m
        assert got_c == want_c


class TestBpeEncode:
    def test_apply_merges_roundtrip(self):
        from quickner_ray.stages.bpe import apply_merges, learn_merges

        wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
        merges = [(l, r) for l, r, _ in learn_merges(wc, 10)]
        # training words segment consistently with the trainer's own loop
        assert "".join(apply_merges("lowest", merges)) == "lowest"
        for w, _ in wc:
            segs = apply_merges(w, merges)
            assert "".join(segs) == w
            assert all(s for s in segs)

    def test_counts_match_reference_and_layouts(self, ray_session):
        import re

        import pyarrow.parquet as pq
        import ray.data as rd

        from quickner_ray.stages.bpe import (
            DEFAULT_MERGES,
            apply_merges,
            bpe_encode,
            learn_merges,
        )

        tab = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
        )
        # reference: train on exact word counts, encode every word per doc
        wc_map: dict = {}
        docs = list(
            zip(tab.column("doc_id").to_pylist(), tab.column("text").to_pylist())
        )
        for _, t in docs:
            for w in re.findall(r"[a-z0-9]+", t.lower()):
                wc_map[w] = wc_map.get(w, 0) + 1
        merges = [
            (l, r) for l, r, _ in learn_merges(sorted(wc_map.items()), DEFAULT_MERGES)
        ]
        expect = {
            d: sum(
                len(apply_merges(w, merges))
                for w in re.findall(r"[a-z0-9]+", t.lower())
            )
            for d, t in docs
        }
        for parts in (2, 7):
            got = (
                bpe_encode(rd.from_arrow(tab).repartition(parts))
                .to_pandas()
                .set_index("doc_id")["n_bpe_tokens"]
                .to_dict()
            )
            assert got == expect
