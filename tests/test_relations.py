"""Proximity relation-candidate generation vs a brute-force reference."""

from __future__ import annotations

import pytest
import ray.data as rd


def _mention_table(rows):
    import pyarrow as pa

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "surface_norm": [r[1] for r in rows],
                "label": [r[2] for r in rows],
                "start": pa.array([r[3] for r in rows], type=pa.int64()),
                "end": pa.array([r[4] for r in rows], type=pa.int64()),
            }
        )
    )


def _brute(rows, window, cap):
    from quickner_ray.stages.canonicalize import entity_id

    by_doc: dict = {}
    for d, sn, lb, s, e in rows:
        by_doc.setdefault(d, []).append((s, e, entity_id(sn, lb)))
    out = set()
    for d, ms in by_doc.items():
        ms = sorted(ms)[:cap]
        for a in ms:
            for b in ms:
                gap = b[0] - a[1]
                if a[0] < b[0] and a[2] != b[2] and 0 <= gap <= window:
                    out.add((d, a[2], b[2], gap))
    return out


@pytest.mark.usefixtures("ray_session")
class TestRelationCandidates:
    def test_matches_brute_force(self):
        from quickner_ray.stages.relations import relation_candidates

        rows = [
            # doc 1: a(0,5) b(8,12) c(60,64): a->b gap 3; b->c gap 48 (out)
            (1, "alpha", "ORG", 0, 5),
            (1, "bolt", "PART", 8, 12),
            (1, "coil", "PART", 60, 64),
            # doc 2: same entity twice (no pair), then a different entity close by
            (2, "alpha", "ORG", 0, 5),
            (2, "alpha", "ORG", 10, 15),
            (2, "bolt", "PART", 16, 20),
            # doc 3: overlapping mentions (negative gap -> excluded)
            (3, "alpha", "ORG", 0, 10),
            (3, "bolt", "PART", 4, 8),
        ]
        got = {
            (r["doc_id"], r["subj"], r["obj"], r["gap"])
            for r in relation_candidates(_mention_table(rows)).take_all()
        }
        assert got == _brute(rows, 40, 64)
        assert len(got) == 3  # d1 a->b; d2 alpha@0->bolt? gap 11 ok, alpha@10->bolt gap 1

    def test_window_and_cap(self):
        from quickner_ray.stages.relations import relation_candidates

        rows = [(7, f"e{i:02d}", "L", i * 10, i * 10 + 4) for i in range(10)]
        got = relation_candidates(
            _mention_table(rows), window=6, cap=5
        ).take_all()
        want = _brute(rows, 6, 5)
        assert {
            (r["doc_id"], r["subj"], r["obj"], r["gap"]) for r in got
        } == want
        # consecutive pairs only (gap 6 <= 6), capped to first 5 mentions
        assert len(want) == 4

    def test_empty(self):
        from quickner_ray.stages.relations import relation_candidates

        assert relation_candidates(_mention_table([])).take_all() == []


@pytest.mark.usefixtures("ray_session")
class TestMentionContexts:
    def test_clamped_windows(self):
        import pyarrow as pa

        from quickner_ray.stages.relations import mention_contexts

        text = "abcdefghijklmnopqrstuvwxyz0123456789"
        # mentions at the very start, middle, and very end
        rows = [(0, 3), (10, 14), (30, 36)]
        parents = pa.array([0, 0, 0], type=pa.int32())
        batch = pa.table(
            {
                "doc_id": pa.array([5, 5, 5], type=pa.int64()),
                "surface_norm": ["a", "b", "c"],
                "start": pa.array([r[0] for r in rows], type=pa.int64()),
                "end": pa.array([r[1] for r in rows], type=pa.int64()),
                "doc_text": pa.DictionaryArray.from_arrays(
                    parents, pa.array([text])
                ),
            }
        )
        out = mention_contexts(
            rd.from_arrow(batch), window=4
        ).take_all()
        got = {(r["start"], r["context"]) for r in out}
        assert got == {
            (0, text[0:7]),          # lo clamped to 0
            (10, text[6:18]),
            (30, text[26:36]),       # hi clamped to len
        }


@pytest.mark.usefixtures("ray_session")
class TestEntityDocFreq:
    def test_distinct_doc_counts(self):
        import pyarrow as pa

        from quickner_ray.stages.canonicalize import entity_id
        from quickner_ray.stages.graph_cc import entity_doc_freq

        rows = [
            (1, "apple", "ORG"),
            (1, "apple", "ORG"),   # same doc twice -> df 1 contribution
            (2, "apple", "ORG"),
            (2, "bolt", "PART"),
        ]
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                    "surface_norm": [r[1] for r in rows],
                    "label": [r[2] for r in rows],
                }
            )
        )
        got = {r["eid"]: r["df"] for r in entity_doc_freq(ds).take_all()}
        assert got == {
            entity_id("apple", "ORG"): 2,
            entity_id("bolt", "PART"): 1,
        }


@pytest.mark.usefixtures("ray_session")
def test_entity_aliases_collapse():
    """Surface forms differing only in punctuation/spacing collapse to one
    alias group; different labels stay distinct (same alias_key + groupby
    shape as q_entity_aliases, driven on a crafted canonical table — the
    sf corpora have no colliding aliases to exercise)."""
    import pyarrow as pa
    from ray.data.aggregate import Count, Sum

    rows = [
        ("u.s.", "GPE", 3),
        ("u s", "GPE", 2),
        ("us", "GPE", 5),
        ("us", "ORG", 1),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "surface_norm": [r[0] for r in rows],
                "label": [r[1] for r in rows],
                "n_mentions": pa.array([r[2] for r in rows], type=pa.int64()),
            }
        )
    )
    import pyarrow.compute as pc

    def add_key(b):
        key = pc.replace_substring_regex(
            b.column("surface_norm").combine_chunks(), "[^a-z0-9]", ""
        )
        return pa.table(
            {
                "alias_key": key,
                "label": b.column("label"),
                "n_mentions": b.column("n_mentions"),
            }
        )

    out = (
        ds.map_batches(add_key, batch_format="pyarrow")
        .groupby(["alias_key", "label"])
        .aggregate(Count(alias_name="n_surfaces"), Sum("n_mentions", alias_name="n_mentions"))
        .take_all()
    )
    got = {(r["alias_key"], r["label"]): (r["n_surfaces"], r["n_mentions"]) for r in out}
    assert got == {("us", "GPE"): (3, 10), ("us", "ORG"): (1, 1)}


@pytest.mark.usefixtures("ray_session")
def test_incremental_canonical_merge_equals_batch():
    """Delta merge (even-store + odd-delta) must equal the batch recompute."""
    from quickner_ray.pipelines.queries import (
        q_canonical_entities,
        q_canonical_entities_incremental,
    )

    sf = "/root/testdata/sf0.001"
    batch = {
        (r["entity_id"], r["surface_norm"], r["label"]): r["n_mentions"]
        for r in q_canonical_entities(sf).take_all()
    }
    inc = {
        (r["entity_id"], r["surface_norm"], r["label"]): r["n_mentions"]
        for r in q_canonical_entities_incremental(sf).take_all()
    }
    assert inc == batch and len(batch) > 0


@pytest.mark.usefixtures("ray_session")
def test_host_quality_keep_rule():
    """keep == (2 * n_good >= n_docs) on every emitted host row."""
    from quickner_ray.pipelines.queries import q_host_quality

    rows = q_host_quality("/root/testdata/sf0.001").take_all()
    assert rows
    n_total = sum(r["n_docs"] for r in rows)
    assert n_total == 500  # every document lands in exactly one host
    for r in rows:
        assert r["keep"] == int(2 * r["n_good"] >= r["n_docs"])
        assert 0 <= r["n_good"] <= r["n_docs"]


@pytest.mark.usefixtures("ray_session")
def test_kg_negative_samples_properties():
    import ray.data as rd

    from quickner_ray.stages.relations import kg_negative_samples

    ents = [f"e{i:02d}" for i in range(10)]
    triples = [
        {"subj": f"d{i}", "pred": "P", "obj": ents[i % 10]} for i in range(200)
    ]
    out1 = kg_negative_samples(rd.from_items(triples), ents).take_all()
    out2 = kg_negative_samples(
        rd.from_items(triples, override_num_blocks=8), ents
    ).take_all()
    key = lambda r: (r["subj"], r["pred"], r["obj"], r["neg_obj"])  # noqa: E731
    assert sorted(map(key, out1)) == sorted(map(key, out2))  # deterministic
    for r in out1:
        assert r["neg_obj"] != r["obj"]  # always a true corruption
        assert r["neg_obj"] in ents
    # hash draw spreads over the universe, not a constant
    assert len({r["neg_obj"] for r in out1}) > 3


class TestEntityContextFeatures:
    @pytest.mark.usefixtures("ray_session")
    def test_matches_duckdb_and_counts(self, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from quickner_ray.pipelines.ner_oracle import (
            sql_entity_context_features,
        )
        from quickner_ray.pipelines.queries import (
            DEFAULT_GAZETTEER,
            documents_gazetteer,
        )
        from quickner_ray.stages.detect import detect_mentions
        from quickner_ray.stages.relations import entity_context_features

        texts = [
            "the quick sort beats the slow merge every time",
            "sort",
            "a hash join and a merge join walked into a scan",
            "window window window",
        ]
        path = str(tmp_path / "documents.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts),
                }
            ),
            path,
        )
        ds = rd.read_parquet(path)
        ann = detect_mentions(ds, documents_gazetteer(), concurrency=2)
        got = (
            entity_context_features(ann, dims=8)
            .to_pandas()
            .sort_values(["surface_norm", "label"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
        want = (
            con.sql(sql_entity_context_features(DEFAULT_GAZETTEER, dims=8))
            .df()
            .sort_values(["surface_norm", "label"])
            .reset_index(drop=True)
        )
        want = want[got.columns]
        assert got.equals(want), (len(got), len(want))
        # feature mass == total context tokens: every mention contributes
        # at least its own surface token
        fcols = [f"f{k}" for k in range(8)]
        assert (got[fcols].sum(axis=1) >= 1).all()


class TestOpenVocabFusion:
    """fact_corroboration_open / source_reliability_open vs brute force;
    both reliability fold paths (broadcast vs keyed join) must agree."""

    FACTS = [
        # (attr, value, source) assertions, with repeats
        ("pop", "1", "a"), ("pop", "1", "b"), ("pop", "1", "b"),
        ("pop", "2", "a"),
        ("area", "9", "c"), ("area", "9", "a"), ("area", "9", "b"),
        ("lang", "fr", "c"),
    ]

    def _ds(self):
        import pyarrow as pa

        return rd.from_arrow(
            pa.table(
                {
                    "attr": [f[0] for f in self.FACTS],
                    "value": [f[1] for f in self.FACTS],
                    "source": [f[2] for f in self.FACTS],
                }
            )
        )

    def test_corroboration_matches_brute_force(self):
        from collections import defaultdict

        from quickner_ray.stages.canonicalize import fact_corroboration_open

        out = {
            (r["attr"], r["value"]): (
                r["n_sources"], r["n_mentions"], r["corroborated"]
            )
            for r in fact_corroboration_open(
                self._ds(), key_cols=["attr", "value"], min_sources=2
            ).take_all()
        }
        srcs, mentions = defaultdict(set), defaultdict(int)
        for a, v, s in self.FACTS:
            srcs[(a, v)].add(s)
            mentions[(a, v)] += 1
        expect = {
            k: (len(srcs[k]), mentions[k], int(len(srcs[k]) >= 2))
            for k in srcs
        }
        assert out == expect

    @pytest.mark.parametrize("cap", [0, 10**6])
    def test_reliability_join_and_broadcast_agree(self, cap):
        from collections import defaultdict

        from quickner_ray.stages.canonicalize import source_reliability_open

        out = {
            r["source"]: (r["n_facts"], r["n_corroborated"])
            for r in source_reliability_open(
                self._ds(),
                key_cols=["attr", "value"],
                min_sources=2,
                broadcast_cap=cap,
                num_partitions=2,
            ).take_all()
        }
        srcs = defaultdict(set)
        per_src = defaultdict(set)
        for a, v, s in self.FACTS:
            srcs[(a, v)].add(s)
            per_src[s].add((a, v))
        expect = {
            s: (
                len(facts),
                sum(1 for f in facts if len(srcs[f]) >= 2),
            )
            for s, facts in per_src.items()
        }
        assert out == expect

    def test_infobox_carry_cols_provenance(self):
        """infobox_facts carry_cols propagates page provenance per fact."""
        from quickner_ray.kernel.htmlextract import synth_infobox_page
        from quickner_ray.stages.relations import infobox_facts
        import pyarrow as pa

        pages = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], type=pa.int64()),
                    "html": pa.array(
                        [
                            synth_infobox_page("p1", [("k", "v1")], seq=1),
                            synth_infobox_page("p2", [("k", "v2"), ("k2", "x")], seq=2),
                        ],
                        type=pa.binary(),
                    ),
                    "source": ["sA", "sB"],
                }
            )
        )
        rows = sorted(
            (r["doc_id"], r["attr"], r["value"], r["source"])
            for r in infobox_facts(pages, carry_cols=["source"]).take_all()
        )
        assert rows == [
            (1, "k", "v1", "sA"),
            (2, "k", "v2", "sB"),
            (2, "k2", "x", "sB"),
        ]
