"""Kernel matching tests: reference goldens (FIXTURES.md F-3), boundary-rule
micro-fixtures (F-6), fast-path vs brute-force-oracle equivalence."""

from __future__ import annotations

import random

import pytest

from quickner_ray.kernel import Gazetteer, annotate_text, annotate_texts

REF_TEXTS = [
    "rust is made by Mozilla",
    "Python was created by Guido van Rossum",
    "Java was created by James Gosling at Sun Microsystems",
    "Swift was created by Chris Lattner and Apple",
    "You can find more information about Rust at https://www.rust-lang.org/",
]
REF_ENTITIES = [
    ("Rust", "PL"),
    ("Python", "PL"),
    ("Java", "PL"),
    ("Swift", "PL"),
    ("Mozilla", "ORG"),
    ("Apple", "ORG"),
    ("Sun Microsystems", "ORG"),
    ("Guido van Rossum", "PERSON"),
    ("James Gosling", "PERSON"),
    ("Chris Lattner", "PERSON"),
]
GOLDEN = {
    "rust is made by mozilla": [(0, 4, "PL"), (16, 23, "ORG")],
    "python was created by guido van rossum": [(0, 6, "PL"), (22, 38, "PERSON")],
    "java was created by james gosling at sun microsystems": [
        (0, 4, "PL"),
        (20, 33, "PERSON"),
        (37, 53, "ORG"),
    ],
    "swift was created by chris lattner and apple": [
        (0, 5, "PL"),
        (21, 34, "PERSON"),
        (39, 44, "ORG"),
    ],
}


@pytest.fixture(scope="module")
def gaz():
    return Gazetteer(REF_ENTITIES, case_sensitive=False)


class TestReferenceGoldens:
    def test_golden_spans(self, gaz):
        lowered, spans = annotate_texts(REF_TEXTS, gaz)
        for t, s in zip(lowered, spans):
            if t in GOLDEN:
                assert s == GOLDEN[t]

    def test_total_label_count_is_12(self, gaz):
        # tests/test.py:58-59 — the URL text contributes two `rust` PL spans
        _, spans = annotate_texts(REF_TEXTS, gaz)
        assert sum(len(s) for s in spans) == 12

    def test_url_text_two_rust_hits(self, gaz):
        t = REF_TEXTS[4].lower()
        spans = gaz.annotate(t)
        assert len(spans) == 2
        assert all(t[s:e] == "rust" for s, e, _ in spans)

    def test_char_index_invariant_non_ascii(self):
        # tests/test.py:167-174
        g = Gazetteer([("Python", "PL")], case_sensitive=False)
        t = (
            "Indizes auf Zeichenebene anstelle von Indizes auf Byteebene, "
            "um Python-Slicing zu unterstützen"
        )
        matched, spans = annotate_text(t, g)
        assert len(spans) == 1
        s, e, label = spans[0]
        assert matched[s:e] == "python" and label == "PL"

    def test_batch_equals_single(self, gaz):
        lowered, batch_spans = annotate_texts(REF_TEXTS, gaz)
        for t, s in zip(lowered, batch_spans):
            assert gaz.annotate(t) == s


class TestBoundaryRules:
    """One minimal case per rule / quirk (quickner.rs:137-222, FIXTURES.md F-6)."""

    G = Gazetteer([("rust", "PL")], case_sensitive=False)

    def test_rule1_start_of_text_then_space(self):
        assert self.G.annotate("rust rocks") == [(0, 4, "PL")]

    def test_rule1_start_of_text_then_punct(self):
        assert self.G.annotate("rust, ok") == [(0, 4, "PL")]

    def test_rule2_ws_before_ws_after(self):
        assert self.G.annotate("i use rust daily") == [(6, 10, "PL")]

    def test_rule3_punct_before_punct_after(self):
        # the www.rust-lang.org case: '.' before is accepted via rule 3
        assert self.G.annotate("www.rust-lang.org") == [(4, 8, "PL")]

    def test_rule4_end_of_text_unconditional(self):
        # match ending at text end is accepted even mid-word (byte arithmetic)
        assert self.G.annotate("xrust") == [(1, 5, "PL")]

    def test_midword_rejected(self):
        assert self.G.annotate("rustlang is a word") == []

    def test_midword_prefix_rejected(self):
        assert self.G.annotate("say trust me") == []

    def test_followed_by_dot_rule6_vs_rule2(self):
        # next char '.' is punct → accepted by rule 2 (ws before, punct after)
        assert self.G.annotate("i like rust.") == [(7, 11, "PL")]

    def test_start0_next_alnum_rejected(self):
        assert self.G.annotate("rusty nail") == []

    def test_overlapping_sun_and_sun_microsystems(self):
        g = Gazetteer([("Sun", "ORG"), ("Sun Microsystems", "ORG2")], case_sensitive=False)
        spans = g.annotate("works at sun microsystems now")
        assert spans == [(9, 12, "ORG"), (9, 25, "ORG2")]

    def test_duplicate_name_two_labels_both_emitted(self):
        g = Gazetteer([("apple", "ORG"), ("apple", "FRUIT")], case_sensitive=False)
        spans = g.annotate("an apple a day")
        assert sorted(spans) == [(3, 8, "FRUIT"), (3, 8, "ORG")]

    def test_duplicate_entity_rows_deduped(self):
        g = Gazetteer([("apple", "ORG"), ("Apple", "ORG")], case_sensitive=False)
        assert g.annotate("an apple a day") == [(3, 8, "ORG")]

    def test_case_sensitive_mode(self):
        g = Gazetteer([("Rust", "PL")], case_sensitive=True)
        assert g.annotate("i use Rust daily") == [(6, 10, "PL")]
        assert g.annotate("i use rust daily") == []

    def test_non_ascii_name_byte_len_quirk(self):
        # name byte length differs from char length; rule 4/5/6 use bytes
        g = Gazetteer([("café", "PLACE")], case_sensitive=False)
        assert g.annotate("meet at café now") == [(8, 12, "PLACE")]
        assert g.annotate("meet at café") == [(8, 12, "PLACE")]

    def test_empty_gazetteer(self):
        g = Gazetteer([], case_sensitive=False)
        assert g.annotate("anything") == []

    def test_empty_text(self):
        assert self.G.annotate("") == []


VOCAB = ["rust", "go", "c", "java", "sun", "sun microsystems", "café", "naïve", "a.b", "x&y"]


class TestOracleEquivalence:
    """Fast scan path == brute-force all-positions oracle on random inputs."""

    def test_random_ascii(self):
        rng = random.Random(42)
        names = [(n, f"L{i % 3}") for i, n in enumerate(VOCAB)]
        g = Gazetteer(names, case_sensitive=False)
        alphabet = "ab crust.go-javé\nsun microsystems&"
        for _ in range(300):
            t = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 80)))
            assert g.annotate(t) == g.annotate_oracle(t), repr(t)

    def test_random_batches(self):
        rng = random.Random(7)
        names = [(n, "L") for n in VOCAB]
        g = Gazetteer(names, case_sensitive=False)
        alphabet = "ab crust.go-javé sun&"
        for _ in range(30):
            texts = [
                "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60)))
                for _ in range(rng.randrange(1, 8))
            ]
            batch = g.annotate_batch(texts)
            for t, s in zip(texts, batch):
                assert s == g.annotate_oracle(t), repr(t)

    def test_newline_in_pattern_falls_back(self):
        g = Gazetteer([("a\nb", "L"), ("c", "L")], case_sensitive=False)
        assert not g.sep_safe
        texts = ["x a\nb y", "c", "a\nb"]
        batch = g.annotate_batch(texts)
        for t, s in zip(texts, batch):
            assert s == g.annotate_oracle(t), repr(t)

    def test_pickle_roundtrip(self):
        import pickle

        g = Gazetteer([(n, "L") for n in VOCAB], case_sensitive=False)
        g2 = pickle.loads(pickle.dumps(g))
        t = "i use rust at sun microsystems in a café"
        assert g2.annotate(t) == g.annotate(t) != []


class TestArrowScanPath:
    """scan_batch_ascii_arrow / batch_matches must be value-identical to
    the text-list kernel on every layout Arrow can hand them."""

    TEXTS = [
        "rust is made by Mozilla and sun microsystems",
        "",
        "the fast key opens the door. Sun!",
        "data data data query key value part",
        "order line customer vector batch row",
        "sun",
    ]

    def _gaz(self):
        from quickner_ray.pipelines.queries import documents_gazetteer

        return documents_gazetteer()

    @pytest.mark.parametrize("typ", ["string", "large_string"])
    @pytest.mark.parametrize("slice_off", [0, 2])
    def test_matches_text_path(self, typ, slice_off):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from quickner_ray.kernel.vectorscan import scan_batch_ascii_arrow

        gaz = self._gaz()
        arr = pa.array(self.TEXTS, type=getattr(pa, typ)())
        arr = arr.slice(slice_off)
        texts = [t.lower() for t in self.TEXTS[slice_off:]]
        want = gaz.annotate_batch_arrays(texts)
        got = scan_batch_ascii_arrow(gaz, pc.ascii_lower(arr))
        for g, w in zip(got, want):
            assert np.array_equal(g, w)

    def test_batch_matches_fallback_on_non_ascii(self):
        import numpy as np
        import pyarrow as pa

        from quickner_ray.stages.detect import batch_matches

        gaz = self._gaz()
        texts = ["Rust chez Mozilla — naïve sun microsystems", "sun"]
        batch = pa.table({"text": texts})
        matched, *got = batch_matches(batch, gaz)
        assert isinstance(matched, list)  # fell back (non-ASCII buffer)
        want = gaz.annotate_batch_arrays([t.lower() for t in texts])
        for g, w in zip(got, want):
            assert np.array_equal(g, w)

    def test_batch_matches_arrow_path_and_lowering(self):
        import numpy as np
        import pyarrow as pa

        from quickner_ray.stages.detect import batch_matches

        gaz = self._gaz()
        batch = pa.table({"text": self.TEXTS})
        matched, *got = batch_matches(batch, gaz)
        assert isinstance(matched, pa.Array)
        assert matched.to_pylist() == [t.lower() for t in self.TEXTS]
        want = gaz.annotate_batch_arrays([t.lower() for t in self.TEXTS])
        for g, w in zip(got, want):
            assert np.array_equal(g, w)

    def test_rule4_tail_probe_end_aligned(self):
        """Names matching only at the doc end (rule 4) must survive the
        tail-slice probe."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from quickner_ray.kernel.automaton import Gazetteer
        from quickner_ray.kernel.vectorscan import scan_batch_ascii_arrow

        gaz = Gazetteer([("deep learning", "X"), ("sun", "Y")])
        texts = ["we all love deep learning", "a doc about the sun"]
        arr = pc.ascii_lower(pa.array(texts, type=pa.large_string()))
        got = scan_batch_ascii_arrow(gaz, arr)
        want = gaz.annotate_batch_arrays([t.lower() for t in texts])
        for g, w in zip(got, want):
            assert np.array_equal(g, w)
        assert len(got[0]) >= 2  # both names matched somewhere
