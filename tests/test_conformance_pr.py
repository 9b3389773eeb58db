"""Explicit triple-level P/R vs an independent oracle (BASELINE.json metric:
triple P/R >= 0.95 vs reference semantics; target 1.0 since we replicate the
semantics exactly).

The oracle matcher is ``Gazetteer.annotate_oracle`` — a brute-force trie walk
from EVERY char position (``find_overlapping_iter`` semantics) through the
same boundary rules — independent of the production regex-anchored fast path.
The pipeline under test is the real Ray pipeline (fused fast path).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from quickner_ray.kernel.automaton import Gazetteer
from quickner_ray.pipelines.kg import KGPipelineConfig, run_kg
from quickner_ray.pipelines.queries import DEFAULT_GAZETTEER
from quickner_ray.sources.pages import write_synth_pages
from quickner_ray.stages.canonicalize import entity_id

# the reference's own test corpus + gazetteer (tests/test.py:8-28)
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


def _expected_triples(texts_by_url: dict[str, str], gaz: Gazetteer) -> set:
    out = set()
    for url, text in texts_by_url.items():
        t = text if gaz.case_sensitive else text.lower()
        for s, e, label in gaz.annotate_oracle(t):
            out.add((url, label, entity_id(t[s:e].lower(), label), s, e))
    return out


def _pr(emitted: set, expected: set) -> tuple[float, float]:
    if not emitted or not expected:
        return (0.0, 0.0)
    tp = len(emitted & expected)
    return tp / len(emitted), tp / len(expected)


class TestTriplePR:
    def test_pipeline_pr_on_synthetic_pages(self, ray_session, tmp_path):
        pages = str(tmp_path / "pages")
        write_synth_pages(pages, "/root/testdata/sf0.001/documents.parquet", repeat=1)
        gaz = Gazetteer(DEFAULT_GAZETTEER)
        out = str(tmp_path / "out")
        run_kg(
            pages,
            gaz,
            out,
            KGPipelineConfig(
                source="html", write_annotated=False, detect_concurrency=2
            ),
            shards=1,
        )
        tri = pq.read_table(os.path.join(out, "triples"))
        emitted = set(
            zip(
                tri.column("subj").to_pylist(),
                tri.column("pred").to_pylist(),
                tri.column("obj").to_pylist(),
                tri.column("start").to_pylist(),
                tri.column("end").to_pylist(),
            )
        )
        src = pq.read_table(pages + "/pages-0000.parquet", columns=["url", "text"])
        texts_by_url = dict(
            zip(src.column("url").to_pylist(), src.column("text").to_pylist())
        )
        expected = _expected_triples(texts_by_url, gaz)
        p, r = _pr(emitted, expected)
        print(f"\ntriple precision={p:.4f} recall={r:.4f} (n={len(emitted)})")
        assert p >= 0.95 and r >= 0.95
        assert p == 1.0 and r == 1.0  # exact-semantics replication

    def test_pr_on_reference_corpus(self):
        """Reference test corpus: production matcher vs oracle matcher span
        sets — P/R of 1.0, plus the pinned total of 12 annotations
        (tests/test.py:58-59)."""
        gaz = Gazetteer(REF_ENTITIES, case_sensitive=False)
        total = 0
        for text in REF_TEXTS:
            t = text.lower()
            fast = gaz.annotate(t)
            oracle = gaz.annotate_oracle(t)
            assert fast == oracle
            total += len(fast)
        assert total == 12
