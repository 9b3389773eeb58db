"""Hypothesis property tests (SURVEY §5.3): fast path == oracle, extraction
round-trip, lowercase invariance, dedup idempotence."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from quickner_ray.kernel.annotate import annotate_text
from quickner_ray.kernel.automaton import Gazetteer
from quickner_ray.kernel.htmlextract import extract_text, synth_page

NAMES = [
    ("rust", "PL"),
    ("go", "PL"),
    ("sun", "ORG"),
    ("sun microsystems", "ORG"),
    ("a.b", "X"),
    ("café", "X"),
]
GAZ = Gazetteer(NAMES, case_sensitive=False)
GAZ_CS = Gazetteer(NAMES, case_sensitive=True)

# alphabet tuned to hit boundary rules: pattern chars, '.', punct, ws, unicode
ALPHABET = "rust gon.b,café&é\tmicrosystems-"
texts = st.text(alphabet=ALPHABET, max_size=60)


class TestMatcherProperties:
    @settings(max_examples=300, deadline=None)
    @given(texts)
    def test_fast_equals_oracle(self, t):
        assert GAZ.annotate(t) == GAZ.annotate_oracle(t)

    @settings(max_examples=150, deadline=None)
    @given(texts)
    def test_case_insensitive_invariance(self, t):
        """Matching after lowercase == matching the uppercased text (the
        reference lowercases in place; results must not depend on case)."""
        lo, spans_lo = annotate_text(t, GAZ)
        up, spans_up = annotate_text(t.upper(), GAZ)
        assert lo == up and spans_lo == spans_up

    @settings(max_examples=150, deadline=None)
    @given(texts)
    def test_case_sensitive_subset(self, t):
        """Case-sensitive matches on lowercase text are a subset of
        case-insensitive matches (same names, lowered)."""
        cs = set(GAZ_CS.annotate(t.lower()))
        ci = set(GAZ.annotate(t.lower()))
        assert cs <= ci

    @settings(max_examples=200, deadline=None)
    @given(st.lists(texts, max_size=6))
    def test_batch_equals_single(self, batch):
        singles = [GAZ.annotate(t) for t in batch]
        assert GAZ.annotate_batch(batch) == singles

    @settings(max_examples=200, deadline=None)
    @given(texts)
    def test_spans_slice_back(self, t):
        """Char-index invariant: text[start:end] is a gazetteer name."""
        lo, spans = annotate_text(t, GAZ)
        names = set(GAZ.names)
        for s, e, _l in spans:
            assert lo[s:e] in names


class TestExtractionProperties:
    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=300))
    def test_synth_roundtrip(self, t):
        """extract_text(synth_page(t)) == t byte-identically — the per-url
        invariant from the input_hint contract."""
        assert extract_text(synth_page(t)) == t

    @settings(max_examples=100, deadline=None)
    @given(st.text(max_size=200))
    def test_extract_deterministic(self, t):
        page = synth_page(t, seq=3)
        assert extract_text(page) == extract_text(page)


class TestGazetteerBuildProperties:
    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.tuples(st.text("abcde ", min_size=1, max_size=8), st.sampled_from("XY")), max_size=12))
    def test_build_dedup_idempotent(self, entities):
        g1 = Gazetteer(entities, case_sensitive=False)
        g2 = Gazetteer(list(zip(g1.names, g1.labels)), case_sensitive=False)
        assert g1.names == g2.names and g1.labels == g2.labels


class TestVectorPathEquivalence:
    """The numpy token fast path == the regex path == the oracle."""

    TOKEN_GAZ = [
        ("table scan", "OP"),
        ("scan", "OP"),
        ("the fast key", "PHRASE"),
        ("key", "CONCEPT"),
        ("merge", "OP"),
    ]

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet="table scan merg-ekey, f.ast\nthe", max_size=120))
    def test_vector_equals_regex_and_oracle(self, t):
        gv = Gazetteer(self.TOKEN_GAZ)
        assert gv.token_spec is not None
        gr = Gazetteer(self.TOKEN_GAZ)
        gr.token_spec = None  # force regex path
        assert gv.annotate_batch([t]) == gr.annotate_batch([t])
        assert gv.annotate(t) == gv.annotate_oracle(t)

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.text(alphabet="table scan key the fast ", max_size=60), max_size=5))
    def test_vector_arrays_match_lists(self, batch):
        gv = Gazetteer(self.TOKEN_GAZ)
        doc_idx, s, e, p = gv.annotate_batch_arrays(batch)
        spans = gv.annotate_batch_pids(batch)
        flat = [
            (di, *sp) for di, doc in enumerate(spans) for sp in doc
        ]
        got = list(zip(doc_idx.tolist(), s.tolist(), e.tolist(), p.tolist()))
        assert got == flat

    def test_non_ascii_batch_uses_wide_kernel(self):
        gv = Gazetteer(self.TOKEN_GAZ)
        texts = ["table scan café", "merge"]
        assert gv.annotate_batch(texts) == [
            gv.annotate_oracle(t) for t in texts
        ]

    # alphabet mixes multi-byte chars (2-, 3-byte UTF-8), non-ASCII
    # whitespace that IS boundary class (U+00A0, U+3000), and the token
    # chars — exercises the UTF-32 wide kernel incl. rule 4's byte-length
    # comparison on non-ASCII docs
    WIDE_ALPHABET = "table scan merg-ekey, f.astéthe汉 　\n"

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet=WIDE_ALPHABET, max_size=120))
    def test_wide_equals_regex_and_oracle(self, t):
        gv = Gazetteer(self.TOKEN_GAZ)
        gr = Gazetteer(self.TOKEN_GAZ)
        gr.token_spec = None  # force regex path
        assert gv.annotate_batch([t]) == gr.annotate_batch([t])
        assert gv.annotate(t) == gv.annotate_oracle(t)

    # non-ASCII NAMES: byte_len(name) > char len, so rule-5/6's ``after``
    # sits past the span end and spans may be accepted mid-word ('東京'
    # inside '東京irn ') — the prefix-candidate path must reproduce this
    UNI_GAZ = [
        ("café", "X"),
        ("東京", "LOC"),
        ("münchen straße", "LOC"),
        ("café bar", "Y"),
        ("東京 tower", "Y"),
        ("scan", "OP"),
    ]
    UNI_ALPHABET = "café東京münchen straße bar tower scan x.,-é 　\n"

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet=UNI_ALPHABET, max_size=100))
    def test_unicode_names_vector_equals_regex_and_oracle(self, t):
        gv = Gazetteer(self.UNI_GAZ)
        assert gv.token_spec is not None and not gv.token_spec["all_ascii"]
        gr = Gazetteer(self.UNI_GAZ)
        gr.token_spec = None
        assert gv.annotate_batch([t]) == gr.annotate_batch([t])
        assert gv.annotate(t) == gv.annotate_oracle(t)

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.text(alphabet=WIDE_ALPHABET, max_size=60), max_size=6))
    def test_wide_mixed_batch_arrays_match_lists(self, batch):
        """Mixed ASCII/non-ASCII batches: the narrow+wide merged array path
        equals the per-doc list path in reference order."""
        gv = Gazetteer(self.TOKEN_GAZ)
        doc_idx, s, e, p = gv.annotate_batch_arrays(batch)
        spans = gv.annotate_batch_pids(batch)
        flat = [(di, *sp) for di, doc in enumerate(spans) for sp in doc]
        got = list(zip(doc_idx.tolist(), s.tolist(), e.tolist(), p.tolist()))
        assert got == flat
        for t, doc in zip(batch, gv.annotate_batch(batch)):
            assert doc == gv.annotate_oracle(t)

    def test_non_token_gazetteer_uses_regex(self):
        g = Gazetteer([("a.b", "X"), ("scan", "OP")])
        assert g.token_spec is None
        assert g.annotate("x a.b scan") == g.annotate_oracle("x a.b scan")


class TestMinhashVectorizedProperty:
    @settings(max_examples=150, deadline=None)
    @given(
        st.lists(
            st.text(
                alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x2FF),
                max_size=80,
            ),
            min_size=1,
            max_size=12,
        )
    )
    def test_batch_shingles_equal_scalar(self, texts):
        """The vectorized batch shingler must equal the scalar reference on
        arbitrary (incl. non-ASCII) text."""
        import numpy as np
        import pyarrow as pa

        from quickner_ray.stages import dedup_approx as da

        p, h, starts = da._shingle_rows(pa.array(texts, type=pa.string()))
        assert len(starts) == len(texts)
        for i, t in enumerate(texts):
            assert np.array_equal(np.sort(da.shingle_hashes(t)), np.sort(h[p == i]))


# -- window / rank / sentence kernels vs DuckDB on random inputs -------------


class TestWindowKernelProperties:
    @settings(max_examples=60, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=200),
        tiles=st.integers(min_value=1, max_value=12),
    )
    def test_ntile_matches_duckdb(self, n, tiles):
        import duckdb
        import numpy as np

        from quickner_ray.stages.rank import ntile_from_rn

        got = ntile_from_rn(np.arange(1, n + 1), n, tiles)
        con = duckdb.connect()
        con.sql("SET threads=1")
        ora = con.sql(
            f"SELECT ntile({tiles}) OVER (ORDER BY r) FROM range({n}) t(r)"
        ).fetchnumpy()
        assert (got == list(ora.values())[0]).all()

    @settings(max_examples=60, deadline=None)
    @given(
        ts=st.lists(
            st.integers(min_value=0, max_value=50), min_size=1, max_size=40
        )
    )
    def test_recent_count_matches_duckdb_with_peers(self, ts):
        """Duplicate timestamps exercise RANGE peer-inclusion."""
        import duckdb
        import pandas as pd
        import pyarrow as pa

        from quickner_ray.stages.events import _recent_count_group

        W = 7
        tbl = pa.table(
            {
                "event_id": pa.array(range(len(ts)), type=pa.int64()),
                "ts": pa.array(
                    pd.to_datetime(pd.Series(ts), unit="us")
                ).cast(pa.timestamp("us")),
                "user_id": pa.array([1] * len(ts), type=pa.int64()),
            }
        )
        got = _recent_count_group(tbl, W).to_pandas()
        con = duckdb.connect()
        con.sql("SET threads=1")
        con.register("e", tbl)
        ora = con.sql(
            f"SELECT event_id, count(*) OVER (ORDER BY epoch_us(ts)\n"
            f"  RANGE BETWEEN {W} PRECEDING AND CURRENT ROW) AS rc FROM e"
        ).df()
        a = got.sort_values("event_id").reset_index(drop=True)
        b = ora.sort_values("event_id").reset_index(drop=True)
        assert (a.recent_count.values == b.rc.values).all()

    @settings(max_examples=60, deadline=None)
    @given(
        texts=st.lists(
            st.text(alphabet="ab .!?x\n\t", max_size=30), min_size=1, max_size=8
        )
    )
    def test_sentence_split_matches_duckdb(self, texts):
        import duckdb
        import pyarrow as pa

        from quickner_ray.stages.chunking import (
            split_sentences_batch,
            sql_sentences,
        )

        tbl = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
        got = (
            split_sentences_batch(tbl)
            .to_pandas()
            .sort_values(["doc_id", "sent_idx"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.sql("SET threads=1")
        con.register("documents", tbl)
        ora = (
            con.sql(sql_sentences())
            .df()
            .sort_values(["doc_id", "sent_idx"])
            .reset_index(drop=True)
        )
        assert got.sentence.tolist() == ora.sentence.tolist()
        assert got.sent_chars.tolist() == ora.sent_chars.tolist()


class TestMisraGriesProperties:
    @settings(max_examples=120, deadline=None)
    @given(
        st.lists(
            st.text(alphabet="ab1 xyz", max_size=40), min_size=0, max_size=12
        ),
        st.integers(min_value=1, max_value=8),
    )
    def test_mg_partial_guarantee(self, docs, k):
        """For any batch and capacity: <=k rows out, weights never exceed
        true counts, undercount <= n/(k+1), and every token over the
        n/(k+1) threshold is present."""
        import re

        import pyarrow as pa

        from quickner_ray.stages.sketch import _mg_partial

        batch = pa.table({"text": pa.array(docs, type=pa.string())})
        out = _mg_partial(batch, "text", k)
        true: dict = {}
        for t in docs:
            for w in re.findall(r"[a-z0-9]+", t.lower()):
                true[w] = true.get(w, 0) + 1
        n = sum(true.values())
        assert out.num_rows <= k
        weights = dict(
            zip(out.column("token").to_pylist(), out.column("weight").to_pylist())
        )
        for tok, w in weights.items():
            assert 0 < w <= true[tok]
            assert true[tok] - w <= n / (k + 1)
        for tok, c in true.items():
            if c * (k + 1) > n:
                assert tok in weights


class TestQuantileSketchProperties:
    @settings(max_examples=80, deadline=None)
    @given(
        st.lists(
            st.floats(
                min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
            ),
            min_size=1,
            max_size=200,
        ),
        st.integers(min_value=2, max_value=16),
    )
    def test_partial_weights_and_points(self, vals, k):
        """Weights sum exactly to n, every point is a real group value, and
        the i-th point's rank share covers ceil(n*i/k)..ceil(n*(i+1)/k)."""
        import numpy as np
        import pyarrow as pa

        from quickner_ray.stages.events import _qsketch_partial

        batch = pa.table(
            {"g": pa.array(["x"] * len(vals)), "v": pa.array(vals, type=pa.float64())}
        )
        out = _qsketch_partial(batch, "g", "v", k)
        n = len(vals)
        kk = min(k, n)
        assert out.num_rows == kk
        w = out.column("w").to_pylist()
        assert sum(w) == n and all(x >= 1 for x in w)
        pts = out.column("point").to_pylist()
        sv = np.sort(np.asarray(vals))
        cuts = np.ceil(n * np.arange(kk + 1) / kk).astype(int)
        for i, p in enumerate(pts):
            assert p == sv[cuts[i + 1] - 1]


class TestSessionKernelProperties:
    """Round-2 kernels: popcount, greedy cosine prune, prefix max."""

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=40))
    def test_hamming64_popcount_matches_python(self, xs):
        import numpy as np

        from quickner_ray.stages.dedup_approx import hamming64

        arr = np.array(xs, dtype=np.uint64)
        got = list(hamming64(arr, np.zeros_like(arr)))
        assert got == [bin(x).count("1") for x in xs]

    @settings(max_examples=100, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.floats(
                    min_value=-5, max_value=5, allow_nan=False, allow_infinity=False
                ),
                min_size=3,
                max_size=3,
            ),
            min_size=0,
            max_size=20,
        ),
        st.floats(min_value=0.5, max_value=1.0),
    )
    def test_greedy_keep_invariants(self, vecs, tau):
        import numpy as np

        from quickner_ray.stages.semdedup import _greedy_keep

        mat = np.array(vecs, dtype=np.float64).reshape(len(vecs), 3)
        keep = _greedy_keep(mat, tau)
        assert len(keep) == len(vecs)
        if len(vecs):
            assert keep[0]  # first row always kept
        # kept set is pairwise below tau (greedy guarantee on kept rows)
        kept_idx = [i for i in range(len(vecs)) if keep[i]]
        unit = []
        for i in kept_idx:
            v = mat[i]
            n = np.linalg.norm(v)
            unit.append(v / n if n else v)
        for a in range(len(unit)):
            for b in range(a + 1, len(unit)):
                assert float(unit[a] @ unit[b]) < tau + 1e-12

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.integers(min_value=-100, max_value=100), max_size=50))
    def test_prefix_max_serial_reference(self, vals):
        """The per-block cummax + carry logic equals the serial scan for a
        single block (multi-block carry covered by the Ray test)."""
        import numpy as np

        ref = []
        cur = None
        for v in vals:
            ref.append(cur)
            cur = v if cur is None else max(cur, v)
        # reproduce _with_prefix's vector math locally
        n = len(vals)
        if n == 0:
            return
        v = np.array(vals, dtype=np.int64)
        cm = np.maximum.accumulate(v)
        out = [None] + list(cm[:-1])
        assert out == ref
