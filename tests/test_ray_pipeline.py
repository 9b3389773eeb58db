"""Ray Data pipeline tests: stages, flagship KG run, checkpoint/resume."""

from __future__ import annotations

import glob
import json
import os

import pyarrow.parquet as pq
import pytest

from quickner_ray.kernel.automaton import Gazetteer
from quickner_ray.pipelines.kg import KGPipelineConfig, run_kg
from quickner_ray.pipelines.queries import DEFAULT_GAZETTEER, documents_gazetteer
from quickner_ray.sources.pages import write_synth_pages

GAZ = [
    ("table scan", "OP"),
    ("merge", "OP"),
    ("spark", "SYS"),
    ("window", "OP"),
    ("customer", "ENT"),
]


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("pages")
    write_synth_pages(str(d), "/root/testdata/sf0.001/documents.parquet", repeat=2)
    return str(d)


def _rows(path: str) -> int:
    return sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )


class TestKGPipeline:
    def test_end_to_end_and_resume(self, pages_dir, tmp_path, ray_session):
        out = str(tmp_path / "out")
        gaz = Gazetteer(GAZ)
        cfg = KGPipelineConfig(source="html", batch_size=256, detect_concurrency=2)
        m1 = run_kg(pages_dir, gaz, out, cfg, shards=2)
        assert m1["stages"]["annotated"]["skipped_shards"] == 0
        n_annotated = _rows(os.path.join(out, "annotated"))
        assert n_annotated == 1000  # 500 docs x repeat 2
        n_mentions = _rows(os.path.join(out, "mentions"))
        n_triples = _rows(os.path.join(out, "triples"))
        assert n_mentions == n_triples > 0
        # entities: one row per (surface_norm, label)
        ents = pq.read_table(os.path.join(out, "entities"))
        assert set(ents.column_names) == {"surface_norm", "label", "n_mentions", "entity_id"}
        assert ents.num_rows == len({(n.lower(), l) for n, l in GAZ})
        assert sum(ents.column("n_mentions").to_pylist()) == n_mentions
        # resume: identical rerun skips all shards and changes nothing
        before = sorted(glob.glob(os.path.join(out, "**", "*.parquet"), recursive=True))
        m2 = run_kg(pages_dir, gaz, out, cfg, shards=2)
        assert m2["stages"]["annotated"]["skipped_shards"] == 2
        after = sorted(glob.glob(os.path.join(out, "**", "*.parquet"), recursive=True))
        assert before == after

    def test_resume_reruns_incomplete_shard(self, pages_dir, tmp_path, ray_session):
        out = str(tmp_path / "out2")
        gaz = Gazetteer(GAZ)
        cfg = KGPipelineConfig(source="html", batch_size=256, detect_concurrency=2)
        run_kg(pages_dir, gaz, out, cfg, shards=2)
        # simulate a crash: delete one shard's manifest (output possibly partial)
        os.remove(os.path.join(out, "_lineage", "annotated", "shard-00001.json"))
        m = run_kg(pages_dir, gaz, out, cfg, shards=2)
        assert m["stages"]["annotated"]["skipped_shards"] == 1
        assert _rows(os.path.join(out, "annotated")) == 1000

    def test_config_change_invalidates(self, pages_dir, tmp_path, ray_session):
        out = str(tmp_path / "out3")
        cfg = KGPipelineConfig(source="html", batch_size=256, detect_concurrency=2)
        run_kg(pages_dir, Gazetteer(GAZ), out, cfg, shards=1)
        m = run_kg(pages_dir, Gazetteer(GAZ + [("query", "X")]), out, cfg, shards=1)
        assert m["stages"]["annotated"]["skipped_shards"] == 0

    def test_extraction_matches_text_column(self, pages_dir, ray_session):
        """Per-row invariant (input_hint): extracted text == text col, byte-identical."""
        import ray.data as rd

        from quickner_ray.stages.extract import extract_pages

        pages = rd.read_parquet(pages_dir)
        golden = {
            u: t
            for u, t in zip(
                *[
                    pq.read_table(f, columns=["url", "text"]).column(c).to_pylist()
                    for f in [sorted(glob.glob(pages_dir + "/*.parquet"))[0]]
                    for c in ["url", "text"]
                ]
            )
        }
        extracted = pages.map_batches(extract_pages, batch_format="pyarrow").to_pandas()
        checked = 0
        for u, t in zip(extracted["url"], extracted["text"]):
            if u in golden:
                assert t == golden[u]
                checked += 1
        assert checked == 500

    def test_pipeline_triples_match_kernel(self, pages_dir, tmp_path, ray_session):
        """Distributed output == single-process kernel on the same corpus."""
        out = str(tmp_path / "out4")
        gaz = Gazetteer(GAZ)
        run_kg(pages_dir, gaz, out, KGPipelineConfig(source="html", detect_concurrency=2), shards=2)
        ann = pq.read_table(os.path.join(out, "annotated"))
        from quickner_ray.kernel.annotate import annotate_text

        src = pq.read_table(sorted(glob.glob(pages_dir + "/*.parquet"))[0])
        by_url = dict(zip(src.column("url").to_pylist(), src.column("text").to_pylist()))
        rows = ann.to_pylist()
        checked = 0
        for row in rows[:200]:
            orig = by_url.get(row["url"])
            if orig is None:
                continue
            matched, spans = annotate_text(orig, gaz)
            assert row["text"] == matched
            got = [(s["start"], s["end"], s["label"]) for s in row["label"]]
            assert got == spans
            checked += 1
        assert checked > 0


class TestLineage:
    def test_manifest_atomic_and_fingerprinted(self, tmp_path):
        from quickner_ray.state.lineage import read_manifest, shard_complete, write_manifest

        out = str(tmp_path)
        write_manifest(out, "s", 3, inputs=["a"], rows=10, fingerprint="fp1")
        assert read_manifest(out, "s", 3)["rows"] == 10
        assert shard_complete(out, "s", 3, inputs=["a"], fingerprint="fp1")
        assert not shard_complete(out, "s", 3, inputs=["b"], fingerprint="fp1")
        assert not shard_complete(out, "s", 3, inputs=["a"], fingerprint="fp2")

    def test_run_metrics_written(self, pages_dir, tmp_path, ray_session):
        out = str(tmp_path / "m")
        run_kg(
            pages_dir,
            Gazetteer(GAZ),
            out,
            KGPipelineConfig(source="html", detect_concurrency=2),
            shards=1,
        )
        with open(os.path.join(out, "_lineage", "run-metrics.json")) as f:
            m = json.load(f)
        assert m["shards"] == 1 and m["total_seconds"] > 0


class TestDefaultGazetteer:
    def test_covers_documents_vocab(self, ray_session):
        gaz = documents_gazetteer()
        assert len(gaz) == len(DEFAULT_GAZETTEER)
        spans = gaz.annotate("the fast key order sort table scan merge")
        labels = {(s, e, l) for s, e, l in spans}
        assert (24, 34, "OPERATOR") in labels  # "table scan"
        assert (0, 12, "PHRASE") in labels  # "the fast key"


class TestFusedFastPath:
    def test_fused_triples_match_standard(self, pages_dir, tmp_path, ray_session):
        """write_annotated=False (pages -> detect -> explode -> triples in
        one pass) must emit exactly the standard path's triples."""
        gaz = Gazetteer(GAZ)
        out_std = str(tmp_path / "std")
        out_fast = str(tmp_path / "fast")
        run_kg(pages_dir, gaz, out_std, KGPipelineConfig(source="html"), shards=2)
        run_kg(
            pages_dir,
            gaz,
            out_fast,
            KGPipelineConfig(source="html", write_annotated=False, shard_parallelism=2),
            shards=2,
        )
        cols = ["subj", "pred", "obj", "surface_norm", "start", "end"]
        std = pq.read_table(os.path.join(out_std, "triples")).select(cols).to_pandas()
        fast = pq.read_table(os.path.join(out_fast, "triples")).select(cols).to_pandas()
        std = std.sort_values(cols).reset_index(drop=True)
        fast = fast.sort_values(cols).reset_index(drop=True)
        assert std.equals(fast)
        # entities + label_counts written in both layouts
        for sub in ("entities", "label_counts"):
            a = pq.read_table(os.path.join(out_std, sub))
            b = pq.read_table(os.path.join(out_fast, sub))
            assert a.num_rows == b.num_rows > 0
        # fast path skips the annotated/mentions checkpoints entirely
        assert not os.path.exists(os.path.join(out_fast, "annotated"))
        assert not os.path.exists(os.path.join(out_fast, "mentions"))

    def test_build_indexes_both_layouts(self, pages_dir, tmp_path, ray_session):
        """run_kg(build_indexes=True) works on BOTH layouts (the fused
        triples layout has different column names) and the posting sets
        agree: entity index keyed by surface_norm, label index by label."""
        gaz = Gazetteer(GAZ)
        out_std = str(tmp_path / "std")
        out_fast = str(tmp_path / "fast")
        run_kg(
            pages_dir, gaz, out_std, KGPipelineConfig(source="html"),
            shards=1, build_indexes=True,
        )
        run_kg(
            pages_dir, gaz, out_fast,
            KGPipelineConfig(source="html", write_annotated=False),
            shards=1, build_indexes=True,
        )

        def load(out, sub, key):
            t = pq.read_table(os.path.join(out, sub))
            return {
                k: n
                for k, n in zip(
                    t.column(key).to_pylist(), t.column("n_postings").to_pylist()
                )
            }

        # posting COUNTS must agree across layouts (ids differ: doc_id vs
        # subj=url, both one per mention)
        assert load(out_std, "entity_index", "surface_norm") == load(
            out_fast, "entity_index", "surface_norm"
        )
        assert load(out_std, "label_index", "label") == load(
            out_fast, "label_index", "label"
        )
        ei = pq.read_table(os.path.join(out_std, "entity_index"))
        n_mentions = _rows(os.path.join(out_std, "mentions"))
        assert sum(ei.column("n_postings").to_pylist()) == n_mentions

    def test_zero_match_corpus_completes(self, pages_dir, tmp_path, ray_session):
        """A gazetteer that matches NOTHING must still complete: phase B/C
        read empty mention/triple dirs (Ray writes no files for an empty
        dataset), so the pruned reads fall back to an empty schema'd
        dataset instead of failing schema inference."""
        gaz = Gazetteer([("zzzqqq_never_present", "X")])
        for name, cfg in [
            ("fast", KGPipelineConfig(source="html", write_annotated=False)),
            ("std", KGPipelineConfig(source="html")),
        ]:
            out = str(tmp_path / name)
            run_kg(pages_dir, gaz, out, cfg, shards=1, build_indexes=True)
            ents = pq.read_table(os.path.join(out, "entities"))
            assert ents.num_rows == 0
            lc = pq.read_table(os.path.join(out, "label_counts"))
            assert lc.num_rows == 0
            assert set(lc.column_names) == {"label", "n_mentions"}

    def test_fused_case_sensitive_merges_case_variants(self, ray_session):
        """With case_sensitive=True, 'Apple' and 'apple' are distinct pids
        but ONE canonical (surface_norm, label) entity — the fused-path
        aggregate must merge them exactly like the standard path."""
        import pyarrow as pa
        import ray.data as rd

        from quickner_ray.stages.canonicalize import (
            canonical_entities,
            canonical_entities_from_pids,
        )

        gaz = Gazetteer([("Apple", "ORG"), ("apple", "ORG"), ("Kiwi", "F")],
                        case_sensitive=True)
        # triples-shaped input: pid rows for both case variants
        tri = rd.from_arrow(
            pa.Table.from_pydict(
                {"pid": pa.array([0, 0, 1, 1, 1, 2], type=pa.int32())}
            )
        )
        got = {
            (r["surface_norm"], r["label"]): r["n_mentions"]
            for r in canonical_entities_from_pids(tri, gaz).take_all()
        }
        assert got == {("apple", "ORG"): 5, ("kiwi", "F"): 1}
        # standard path on the equivalent mention rows agrees
        mentions = rd.from_arrow(
            pa.Table.from_pydict(
                {
                    "surface_norm": pa.array(
                        ["apple", "apple", "apple", "apple", "apple", "kiwi"]
                    ),
                    "label": pa.array(["ORG"] * 5 + ["F"]),
                }
            )
        )
        std = {
            (r["surface_norm"], r["label"]): r["n_mentions"]
            for r in canonical_entities(mentions).take_all()
        }
        assert std == got


class TestSaltedIndex:
    def test_salted_matches_driver_truth_on_zipf_key(self, tmp_path, ray_session):
        """A Zipf-hot surface (one key holding 80% of rows) must produce the
        same posting sets through the salted two-phase path as a trivial
        driver-side groupby, with SORTED (deterministic) posting lists."""
        import pyarrow as pa
        import ray.data as rd

        from quickner_ray.stages.indexes import build_entity_index

        n = 5000
        surfaces = ["apple" if i % 5 != 0 else f"rare{i % 37}" for i in range(n)]
        rows = {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "surface_norm": pa.array(surfaces),
        }
        expected: dict[str, list[int]] = {}
        for i, s in enumerate(surfaces):
            expected.setdefault(s, []).append(i)
        ds = rd.from_arrow(pa.Table.from_pydict(rows))
        salted = {
            r["surface_norm"]: (list(r["doc_ids"]), r["n_postings"])
            for r in build_entity_index(ds, salt=8).take_all()
        }
        assert salted == {k: (sorted(v), len(v)) for k, v in expected.items()}
        assert salted["apple"][1] == 4000

    def test_label_index_fused_key_col(self, ray_session):
        """build_label_index(key_col='pred') serves the fused triples layout
        and emits a 'label' output column."""
        import pyarrow as pa
        import ray.data as rd

        from quickner_ray.stages.indexes import build_label_index

        ds = rd.from_arrow(
            pa.Table.from_pydict(
                {
                    "subj": pa.array([f"u{i}" for i in range(40)]),
                    "pred": pa.array(["ORG" if i % 4 else "LOC" for i in range(40)]),
                }
            )
        )
        out = {
            r["label"]: (list(r["doc_ids"]), r["n_postings"])
            for r in build_label_index(ds, "subj", key_col="pred", salt=4).take_all()
        }
        assert set(out) == {"ORG", "LOC"}
        assert out["LOC"][1] == 10 and out["ORG"][1] == 30
        assert out["LOC"][0] == sorted(f"u{i}" for i in range(40) if i % 4 == 0)

    def test_salted_max_postings_cap(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from quickner_ray.stages.indexes import build_entity_index_salted

        ds = rd.from_arrow(
            pa.Table.from_pydict(
                {
                    "doc_id": pa.array(range(100), type=pa.int64()),
                    "surface_norm": pa.array(["hot"] * 100),
                }
            )
        )
        out = build_entity_index_salted(ds, salt=4, max_postings=10).take_all()
        assert len(out) == 1
        assert out[0]["n_postings"] == 100 and len(out[0]["doc_ids"]) == 10
        assert list(out[0]["doc_ids"]) == list(range(10))  # sorted-prefix cap


class TestExtraStages:
    def test_custom_stage_inserted(self, pages_dir, tmp_path, ray_session):
        """SURVEY §2.7 extension surface: a user stage between prep and
        detect runs and its effect shows in the output (here: drop half the
        docs), and changing the stage list invalidates resume."""
        import pyarrow as pa

        def keep_even(ds):
            def f(b: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                n = pc.utf8_length(b.column("text")).cast("int64")
                return b.filter(pc.equal(pc.bit_wise_and(n, 1), 0))

            return ds.map_batches(f, batch_format="pyarrow")

        gaz = Gazetteer(GAZ)
        out = str(tmp_path / "out")
        base = KGPipelineConfig(source="html", write_annotated=False, detect_concurrency=2)
        run_kg(pages_dir, gaz, out, base, shards=1)
        n_all = pq.read_table(os.path.join(out, "triples")).num_rows

        custom = KGPipelineConfig(
            source="html",
            write_annotated=False,
            detect_concurrency=2,
            extra_stages=(("keep_even", keep_even),),
        )
        # different fingerprint -> shard re-runs instead of resuming
        m = run_kg(pages_dir, gaz, out, custom, shards=1)
        assert m["stages"]["annotated"]["skipped_shards"] == 0
        n_filtered = pq.read_table(os.path.join(out, "triples")).num_rows
        assert 0 < n_filtered < n_all

    def test_incremental_ingest_recomputes_aggregates(self, tmp_path, ray_session):
        """Appending input files (shards=None: one stable shard per file)
        must compute ONLY the new shards but re-run the aggregate phases —
        the graph manifest keys on the shard-output roster, not just the
        directory path, so canonical entities reflect the new data."""
        from quickner_ray.sources.pages import write_synth_pages

        pages = str(tmp_path / "pages_inc")
        write_synth_pages(pages, "/root/testdata/sf0.001/documents.parquet", repeat=2)
        gaz = Gazetteer(GAZ)
        out = str(tmp_path / "out_inc")
        cfg = KGPipelineConfig(source="html", write_annotated=False, detect_concurrency=2)
        run_kg(pages, gaz, out, cfg, shards=None)
        n1 = _rows(os.path.join(out, "triples"))
        ent1 = pq.read_table(os.path.join(out, "entities"))

        # append a third file (distinct urls) and re-run
        import pyarrow.parquet as _pq

        tmp_extra = str(tmp_path / "pages_extra")
        write_synth_pages(tmp_extra, "/root/testdata/sf0.001/documents.parquet", repeat=3)
        src = os.path.join(tmp_extra, sorted(os.listdir(tmp_extra))[-1])
        import shutil as _sh

        _sh.copy(src, os.path.join(pages, "pages-0002.parquet"))
        m = run_kg(pages, gaz, out, cfg, shards=None)
        assert m["stages"]["annotated"]["skipped_shards"] == 2  # old shards reused
        n2 = _rows(os.path.join(out, "triples"))
        assert n2 > n1  # new shard's triples landed
        ent2 = pq.read_table(os.path.join(out, "entities"))
        # aggregates re-ran: mention counts grew
        s1 = sum(ent1.column("n_mentions").to_pylist())
        s2 = sum(ent2.column("n_mentions").to_pylist())
        assert s2 > s1

    def test_corpus_prep_stages_compose_into_kg(self, pages_dir, tmp_path, ray_session):
        """The round-2 corpus-prep operators plug into the flagship via
        extra_stages: PII redaction (rewriting text in place) and a
        repetition filter run between prep and detection, and the pipeline
        stays resumable (stage_version fingerprinting)."""
        import pyarrow as pa
        import pyarrow.compute as pc2

        from quickner_ray.stages.text_analysis import (
            add_repetition_stats,
            redact_pii,
        )

        def redact_stage(ds):
            def f(b: pa.Table) -> pa.Table:
                out = redact_pii(b)
                i = out.column_names.index("text")
                clean = out.column("clean_text")
                return out.set_column(i, "text", clean).drop_columns(["clean_text"])

            return ds.map_batches(f, batch_format="pyarrow")

        redact_stage.stage_version = 1

        def rep_filter(ds):
            def f(b: pa.Table) -> pa.Table:
                out = add_repetition_stats(b)
                keep = pc2.less_equal(out.column("dup_line_frac"), pa.scalar(0.99))
                return out.filter(keep).drop_columns(
                    ["n_lines", "n_distinct_lines", "dup_line_frac"]
                )

            return ds.map_batches(f, batch_format="pyarrow")

        rep_filter.stage_version = 1

        gaz = Gazetteer(GAZ)
        out = str(tmp_path / "out_prep_kg")
        cfg = KGPipelineConfig(
            source="html",
            write_annotated=False,
            detect_concurrency=2,
            extra_stages=(("redact", redact_stage), ("rep_filter", rep_filter)),
        )
        m = run_kg(pages_dir, gaz, out, cfg, shards=1)
        assert pq.read_table(os.path.join(out, "triples")).num_rows > 0
        # resume: identical config skips the completed shard
        m2 = run_kg(pages_dir, gaz, out, cfg, shards=1)
        assert m2["stages"]["annotated"]["skipped_shards"] == 1

    def test_stage_logic_change_invalidates_fingerprint(self):
        """Editing a stage's CODE (same name) must invalidate resume — the
        fingerprint hashes function bytecode and the optional stage_version
        attribute, not just the name."""
        gaz = Gazetteer(GAZ)

        def stage_v1(ds):
            return ds.limit(10)

        def stage_v2(ds):
            return ds.limit(20)

        fp1 = KGPipelineConfig(extra_stages=(("s", stage_v1),)).fingerprint(gaz)
        fp2 = KGPipelineConfig(extra_stages=(("s", stage_v2),)).fingerprint(gaz)
        assert fp1 != fp2

        class VersionedStage:
            def __init__(self, version):
                self.stage_version = version

            def __call__(self, ds):
                return ds

        fp3 = KGPipelineConfig(extra_stages=(("c", VersionedStage(1)),)).fingerprint(gaz)
        fp4 = KGPipelineConfig(extra_stages=(("c", VersionedStage(2)),)).fingerprint(gaz)
        assert fp3 != fp4
