"""Hyperlink extraction kernel + host link-graph stage."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from quickner_ray.kernel.htmlextract import (
    extract_links,
    synth_linked_page,
    synth_page,
)


class TestExtractLinks:
    def test_basic_and_quirks(self):
        html = (
            b'<html><body><a href="https://a.com/x">A &amp; B</a>'
            b"<!-- <a href='https://commented.com'>no</a> -->"
            b'<script>var s = \'<a href="https://scripted.com">no</a>\';</script>'
            b"<a href='https://b.com/y'><b>bold</b> text</a>"
            b"<a href=/rel>rel</a></body></html>"
        )
        got = extract_links(html)
        assert got == [
            ("https://a.com/x", "A & B"),
            ("https://b.com/y", "bold text"),
            ("/rel", "rel"),
        ]

    def test_undecodable_is_empty(self):
        assert extract_links(b"\xff\xfe<a href='x'>y</a>") == []

    def test_synth_round_trip(self):
        links = [
            ("https://h1.example.com/t/1", "site 1"),
            ("https://h2.example.com/t/2", 'quoted "anchor"'),
        ]
        page = synth_linked_page("line1\nline2", links, seq=5)
        got = extract_links(page)
        # template nav contributes "/" and "/about" first
        assert got[:2] == [("/", "Home"), ("/about", "About")]
        assert got[2:] == links

    def test_plain_synth_page_has_only_nav(self):
        got = extract_links(synth_page("hello"))
        assert got == [("/", "Home"), ("/about", "About")]


@pytest.mark.usefixtures("ray_session")
class TestHostLinkGraph:
    def test_matches_oracle(self, sf_dir):
        from quickner_ray.pipelines.queries import (
            q_host_link_graph,
            sql_host_link_graph,
        )

        got = q_host_link_graph(sf_dir).to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
        ora = con.sql(sql_host_link_graph()).df()
        key = ["src_host", "dst_host"]
        a = got.sort_values(key).reset_index(drop=True)[sorted(got.columns)]
        b = ora.sort_values(key).reset_index(drop=True)[sorted(ora.columns)]
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_degrees_consistent(self, sf_dir):
        """in/out degree sums must both equal the edge count; link volume
        sums must both equal total links."""
        from quickner_ray.pipelines.queries import (
            q_host_degrees,
            q_host_link_graph,
        )

        edges = q_host_link_graph(sf_dir).to_pandas()
        deg = q_host_degrees(sf_dir).to_pandas()
        assert deg.out_deg.sum() == len(edges) == deg.in_deg.sum()
        assert deg.out_links.sum() == edges.n_links.sum() == deg.in_links.sum()

    def test_intra_host_links_dropped(self, ray_session):
        """A page linking to its own host contributes no edge."""
        import ray.data as rd

        from quickner_ray.stages.linkgraph import host_link_graph

        page = synth_linked_page(
            "t",
            [
                ("https://self.example.com/other", "self"),
                ("https://other.example.com/x", "other"),
            ],
        )
        ds = rd.from_arrow(
            pa.table(
                {
                    "url": ["https://self.example.com/page"],
                    "html": pa.array([page], type=pa.binary()),
                }
            )
        )
        got = host_link_graph(ds).to_pandas()
        assert got.src_host.tolist() == ["self.example.com"]
        assert got.dst_host.tolist() == ["other.example.com"]


@pytest.mark.usefixtures("ray_session")
def test_host_pagerank_matches_oracle(sf_dir):
    from quickner_ray.pipelines.queries import q_host_pagerank, sql_host_pagerank

    got = q_host_pagerank(sf_dir).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    ora = con.sql(sql_host_pagerank()).df()
    a = got.sort_values("host").reset_index(drop=True)[sorted(got.columns)]
    b = ora.sort_values("host").reset_index(drop=True)[sorted(ora.columns)]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_anchor_aliases_matches_oracle(sf_dir):
    from quickner_ray.pipelines.queries import q_anchor_aliases, sql_anchor_aliases

    got = q_anchor_aliases(sf_dir).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    ora = con.sql(sql_anchor_aliases()).df()
    key = ["dst_host", "anchor"]
    a = got.sort_values(key).reset_index(drop=True)[sorted(got.columns)]
    b = ora.sort_values(key).reset_index(drop=True)[sorted(ora.columns)]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


class TestInfoboxExtraction:
    """Infobox fact parse: round-trip vs synth, decoy/markup hardening,
    and the distributed stage against a brute per-page reference."""

    def test_round_trip_and_hardening(self):
        from quickner_ray.kernel.htmlextract import (
            extract_infobox,
            synth_infobox_page,
        )

        facts = [("population", "8,336,817"), ("area", "783.8 km2"),
                 ("motto", "E pluribus & unum")]
        for seq in range(5):
            assert extract_infobox(synth_infobox_page("body", facts, seq=seq)) == facts
        # commented-out rows and script blocks never produce facts
        page = (
            b'<html><body><table class="infobox">'
            b"<!-- <tr><th>ghost</th><td>1</td></tr> -->"
            b"<tr><th>real <b>attr</b></th><td> v&amp;1 \n two</td></tr>"
            b"<tr><td>no th, skipped</td></tr>"
            b"</table><script>var t='<tr><th>x</th><td>y</td></tr>'</script>"
            b"</body></html>"
        )
        assert extract_infobox(page) == [("real attr", "v&1 two")]
        assert extract_infobox(b"<html><body>plain</body></html>") == []
        assert extract_infobox(b"\xff\xfe\x00bad") == []

    @pytest.mark.usefixtures("ray_session")
    def test_stage_matches_reference(self, tmp_path):
        import pyarrow.parquet as pq
        import ray.data as rd

        from quickner_ray.kernel.htmlextract import (
            extract_infobox,
            synth_infobox_page,
        )
        from quickner_ray.stages.relations import infobox_facts

        pages = []
        want = []
        for d in range(40):
            facts = [(f"a{j}", f"val {d * (j + 2) % 11} & co") for j in range(d % 4)]
            html = synth_infobox_page(f"doc {d}", facts, seq=d)
            pages.append({"doc_id": d, "html": html})
            for attr, val in extract_infobox(html):
                want.append((d, attr, val))
        ds = rd.from_items(pages)
        got = [
            (r["doc_id"], r["attr"], r["value"])
            for r in infobox_facts(ds).take_all()
        ]
        assert sorted(got) == sorted(want)
        # docs with 0 facts (d % 4 == 0) contribute no rows
        assert not any(d % 4 == 0 for d, _, _ in got)
