"""The boundary-rule NER family's DuckDB oracle (pipelines/ner_oracle.py)
must equal the Ray pipeline bit-for-bit — including the reference's quirky
rule 4 (end-aligned matches accepted mid-word) and rejections of mid-word
occurrences. This is the closed SQL form of kernel/boundary.py for ASCII."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from quickner_ray.pipelines.ner_oracle import (
    sql_canonical_entities,
    sql_label_mention_counts,
    sql_triples,
)
from quickner_ray.pipelines.queries import DEFAULT_GAZETTEER

TEXTS = [
    # plain word-boundary matches
    "the sort and the hash join run a table scan",
    # rule 4: end-aligned matches accepted even mid-word
    "nonsensejoin",
    "we do a megasort",
    # mid-word occurrences NOT at the end are rejected
    "joinx is not a match, nor sorting here",
    # punctuation boundaries, doc edges, multi-word phrase at the very end
    "sort! (join) merge... the fast key",
    "SORT and JOIN in upper case",
    "",
    "sort",
    "a window window window sort",
    # adjacent with exactly-one-space requirement for multi-word names
    "table  scan has two spaces; table scan has one",
]


@pytest.fixture(scope="module")
def docs_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("nerdocs") / "documents.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(TEXTS)), type=pa.int64()),
                "text": pa.array(TEXTS),
                "lang": pa.array(["en"] * len(TEXTS)),
            }
        ),
        path,
    )
    return path


def _ray_triples(docs_path):
    import ray.data as rd

    from quickner_ray.pipelines.queries import documents_gazetteer
    from quickner_ray.stages.canonicalize import (
        add_triple_columns,
        canonical_entities,
        explode_mentions,
        label_counts,
    )
    from quickner_ray.stages.detect import detect_mentions

    ds = rd.read_parquet(docs_path)
    ann = detect_mentions(ds, documents_gazetteer(), concurrency=2)
    mentions = ann.map_batches(
        lambda b: explode_mentions(b, subj_col="doc_id"), batch_format="pyarrow"
    )
    tri = mentions.map_batches(
        lambda b: add_triple_columns(b, subj_col="doc_id"), batch_format="pyarrow"
    )
    return tri, canonical_entities(mentions), label_counts(mentions)


def _canon(df):
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


class TestNerOracle:
    def test_family_matches_duckdb(self, ray_session, docs_path):
        tri_ds, ents_ds, lc_ds = _ray_triples(docs_path)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM '{docs_path}'")

        tri = _canon(tri_ds.to_pandas())
        otri = _canon(con.sql(sql_triples(DEFAULT_GAZETTEER)).df())
        assert tri.equals(otri), (len(tri), len(otri))
        # the quirks actually fired in this corpus:
        surf_by_doc = {
            (int(s), sn) for s, sn in zip(tri["subj"], tri["surface_norm"])
        }
        assert (1, "join") in surf_by_doc  # rule-4 mid-word, end-aligned
        assert (2, "sort") in surf_by_doc
        assert (3, "join") not in surf_by_doc  # mid-word, not end-aligned
        assert (7, "sort") in surf_by_doc  # whole-doc match (rule 4 at 0)
        doc9 = sorted(r for d, r in surf_by_doc if d == 9)
        assert "table scan" in doc9  # single-space form matches
        n9 = (tri["subj"] == "9").sum()
        assert n9 == int((otri["subj"] == "9").sum())

        ents = _canon(ents_ds.to_pandas())
        oents = _canon(con.sql(sql_canonical_entities(DEFAULT_GAZETTEER)).df())
        assert ents.equals(oents)

        lc = _canon(lc_ds.to_pandas())
        olc = _canon(con.sql(sql_label_mention_counts(DEFAULT_GAZETTEER)).df())
        assert lc.equals(olc)

    def test_quality_score_oracle(self, ray_session, docs_path):
        from quickner_ray.stages.text_analysis import (
            add_quality_score,
            sql_quality_score,
        )

        tab = pq.read_table(docs_path)
        ours = (
            add_quality_score(tab)
            .select(["doc_id", "quality_score"])
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM '{docs_path}'")
        oracle = con.sql(sql_quality_score()).df().sort_values("doc_id").reset_index(drop=True)
        assert (ours["quality_score"].values == oracle["quality_score"].values).all()

    def test_fingerprint_oracle(self, ray_session, docs_path):
        from quickner_ray.stages.text_analysis import add_fingerprint, sql_fingerprint

        tab = pq.read_table(docs_path)
        ours = (
            add_fingerprint(tab)
            .select(["doc_id", "fingerprint"])
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM '{docs_path}'")
        oracle = con.sql(sql_fingerprint()).df().sort_values("doc_id").reset_index(drop=True)
        assert (
            ours["fingerprint"].astype("uint64").values
            == oracle["fingerprint"].astype("uint64").values
        ).all()

    def test_entity_link_oracle(self, ray_session, docs_path, tmp_path):
        """Mention stream -> linked entities: Ray actor-pool scoring equals
        the SQL form (same ln/jaccard arithmetic, argmax + post-round)."""
        import os
        import shutil

        from quickner_ray.pipelines.ner_oracle import sql_entity_link
        from quickner_ray.pipelines.queries import q_entity_link

        sf_dir = str(tmp_path / "sf")
        os.makedirs(sf_dir, exist_ok=True)
        shutil.copy(docs_path, os.path.join(sf_dir, "documents.parquet"))
        ours = _canon(q_entity_link(sf_dir).to_pandas())
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM '{docs_path}'")
        oracle = _canon(con.sql(sql_entity_link(DEFAULT_GAZETTEER)).df())
        assert ours.equals(oracle), (len(ours), len(oracle))


class TestEntityTimeline:
    def test_matches_duckdb(self, ray_session, docs_path):
        import ray.data as rd

        from quickner_ray.pipelines.ner_oracle import sql_entity_timeline
        from quickner_ray.pipelines.queries import documents_gazetteer
        from quickner_ray.stages.canonicalize import entity_timeline
        from quickner_ray.stages.detect import detect_mentions

        ds = rd.read_parquet(docs_path)
        ann = detect_mentions(ds, documents_gazetteer(), concurrency=2)
        # small batches force multi-batch partials: the combiner's
        # per-(entity,snap) rows must merge correctly across batches
        tl = _canon(entity_timeline(ann, n_snapshots=3).to_pandas())
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM '{docs_path}'")
        otl = _canon(
            con.sql(sql_entity_timeline(DEFAULT_GAZETTEER, n_snapshots=3)).df()
        )
        assert tl.equals(otl), (len(tl), len(otl))
        # interval semantics: first <= last, snapshot spread within range
        assert (tl["first_snap"] <= tl["last_snap"]).all()
        assert (tl["n_snaps"] <= tl["last_snap"] - tl["first_snap"] + 1).all()
        assert (tl["n_snaps"] >= 1).all() and (tl["n_mentions"] >= tl["n_snaps"]).all()


class TestEntityDeltaAndTrend:
    def test_delta_matches_duckdb(self, ray_session, docs_path):
        import ray.data as rd

        from quickner_ray.pipelines.ner_oracle import sql_canonical_entities_delta
        from quickner_ray.pipelines.queries import documents_gazetteer
        from quickner_ray.stages.canonicalize import canonical_entities_delta
        from quickner_ray.stages.detect import detect_mentions

        ds = rd.read_parquet(docs_path)
        ann = detect_mentions(ds, documents_gazetteer(), concurrency=2)
        got = _canon(canonical_entities_delta(ann).to_pandas())
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM '{docs_path}'")
        want = _canon(con.sql(sql_canonical_entities_delta(DEFAULT_GAZETTEER)).df())
        assert got.equals(want), (len(got), len(want))
        # status partition covers all rows and matches the count columns
        st = dict(zip(zip(got["n_old"], got["n_new"]), got["status"]))
        for (a, b), s in st.items():
            if a == 0:
                assert s == "added"
            elif b == 0:
                assert s == "removed"
            else:
                assert s == ("same" if a == b else "changed")

    def test_trend_matches_duckdb(self, ray_session, docs_path):
        import ray.data as rd

        from quickner_ray.pipelines.ner_oracle import sql_entity_trend
        from quickner_ray.pipelines.queries import documents_gazetteer
        from quickner_ray.stages.canonicalize import entity_trend
        from quickner_ray.stages.detect import detect_mentions

        ds = rd.read_parquet(docs_path)
        ann = detect_mentions(ds, documents_gazetteer(), concurrency=2)
        got = _canon(entity_trend(ann, n_snapshots=4).to_pandas())
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM '{docs_path}'")
        want = _canon(
            con.sql(sql_entity_trend(DEFAULT_GAZETTEER, n_snapshots=4)).df()
        )
        assert got.equals(want), (len(got), len(want))
        # slope sign sanity: an entity mentioned only in snapshot 0 must
        # have negative slope; only in the last snapshot, positive
        for _, r in got.iterrows():
            if r["n_mentions"] > 0:
                lo = -6 * r["n_mentions"]  # K=4: min slope = (4*0-6)*n
                hi = 6 * r["n_mentions"]   # max = (4*3-6)*n
                assert lo <= r["slope_num"] <= hi


class TestEntityTimelineWarcTs:
    """The north-rule pages schema path: snapshots from REAL warc_ts month
    buckets (snap_col) instead of the doc_id-derived stand-in."""

    def test_warc_ts_month_buckets(self, ray_session, tmp_path):
        import datetime as dt

        import pyarrow.parquet as pq
        import ray.data as rd

        from quickner_ray.pipelines.queries import documents_gazetteer
        from quickner_ray.stages.canonicalize import entity_timeline
        from quickner_ray.stages.detect import detect_mentions

        texts = ["the sort ran", "a hash join", "sort and join", "sort", "no hits here"]
        stamps = [
            dt.datetime(2025, 1, 3),
            dt.datetime(2025, 1, 20),
            dt.datetime(2025, 3, 9),
            dt.datetime(2025, 7, 1),
            dt.datetime(2025, 2, 2),
        ]
        path = str(tmp_path / "pages.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(5), type=pa.int64()),
                    "text": pa.array(texts),
                    "warc_ts": pa.array(stamps, type=pa.timestamp("us")),
                }
            ),
            path,
        )
        ds = rd.read_parquet(path)

        def add_snap(b):
            import pyarrow.compute as c

            ts = b.column("warc_ts")
            snap = c.add(
                c.multiply(c.year(ts).cast(pa.int64()), 12),
                c.month(ts).cast(pa.int64()),
            )
            return b.append_column("snap", snap)

        ds = ds.map_batches(add_snap, batch_format="pyarrow")
        ann = detect_mentions(ds, documents_gazetteer(), concurrency=2)
        tl = {
            (r["surface_norm"], r["label"]): r
            for r in entity_timeline(ann, snap_col="snap").take_all()
        }
        jan, mar, jul = 2025 * 12 + 1, 2025 * 12 + 3, 2025 * 12 + 7
        s = tl[("sort", "OPERATOR")]
        assert (s["first_snap"], s["last_snap"], s["n_snaps"], s["n_mentions"]) == (
            jan, jul, 3, 3,
        )
        j = tl[("join", "OPERATOR")]
        assert (j["first_snap"], j["last_snap"], j["n_snaps"], j["n_mentions"]) == (
            jan, mar, 2, 2,
        )
        assert ("no", "OPERATOR") not in tl


class TestFactCorroboration:
    def test_matches_duckdb(self, ray_session, tmp_path):
        import ray.data as rd

        from quickner_ray.pipelines.ner_oracle import sql_fact_corroboration
        from quickner_ray.pipelines.queries import documents_gazetteer
        from quickner_ray.stages.canonicalize import fact_corroboration
        from quickner_ray.stages.detect import detect_mentions

        # "scan" appears under several sources (corroborated); "window"
        # appears only under src0 however often (NOT corroborated).
        texts = [
            "a scan here",          # src0
            "scan and sort again",  # src1
            "window window",        # src0
            "the window stays",     # src0
            "scan",                 # src2
            "no hits at all",       # src1
        ]
        srcs = ["src0", "src1", "src0", "src0", "src2", "src1"]
        path = str(tmp_path / "documents.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts),
                    "source": pa.array(srcs),
                }
            ),
            path,
        )
        ds = rd.read_parquet(path)
        # concurrency=2 forces multi-batch partials: per-(fact, source)
        # combiner rows must merge correctly across batches
        ann = detect_mentions(ds, documents_gazetteer(), concurrency=2)
        got = _canon(fact_corroboration(ann).to_pandas())
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
        want = _canon(con.sql(sql_fact_corroboration(DEFAULT_GAZETTEER)).df())
        assert got.equals(want), (got, want)
        by = got.set_index("surface_norm")
        assert by.loc["scan", "n_sources"] == 3
        assert by.loc["scan", "corroborated"] == 1
        # single-source repetition is support, not corroboration
        assert by.loc["window", "n_sources"] == 1
        assert by.loc["window", "n_mentions"] == 3
        assert by.loc["window", "corroborated"] == 0

    def test_source_reliability_matches_duckdb(self, ray_session, tmp_path):
        import ray.data as rd

        from quickner_ray.pipelines.ner_oracle import sql_source_reliability
        from quickner_ray.pipelines.queries import documents_gazetteer
        from quickner_ray.stages.canonicalize import source_reliability
        from quickner_ray.stages.detect import detect_mentions

        texts = [
            "a scan here",          # src0
            "scan and sort again",  # src1
            "window window",        # src0: window is src0-only
            "the window stays",     # src0
            "scan",                 # src2
            "no hits at all",       # src1
        ]
        srcs = ["src0", "src1", "src0", "src0", "src2", "src1"]
        path = str(tmp_path / "documents.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts),
                    "source": pa.array(srcs),
                }
            ),
            path,
        )
        ds = rd.read_parquet(path)
        ann = detect_mentions(ds, documents_gazetteer(), concurrency=2)
        got = _canon(source_reliability(ann).to_pandas())
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
        want = _canon(con.sql(sql_source_reliability(DEFAULT_GAZETTEER)).df())
        assert got.equals(want), (got, want)
        by = got.set_index("source")
        # src0 asserts {scan, window}; only scan is corroborated elsewhere
        assert by.loc["src0", "n_facts"] == 2
        assert by.loc["src0", "n_corroborated"] == 1
        # src1 asserts {scan, sort}; sort is src1-only
        assert by.loc["src1", "n_facts"] == 2
        assert by.loc["src1", "n_corroborated"] == 1
        # src2 asserts only the corroborated scan
        assert by.loc["src2", "n_facts"] == 1
        assert by.loc["src2", "n_corroborated"] == 1
