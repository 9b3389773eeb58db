"""URL/host filtering: vectorized host extraction + blocklist semantics."""

from __future__ import annotations

import pytest
import ray.data as rd


def _pages(urls):
    import pyarrow as pa

    return rd.from_arrow(
        pa.table({"url": urls, "text": [f"t{i}" for i in range(len(urls))]})
    )


URLS = [
    "https://example.org/a",
    "https://ads.example.org/b",          # subdomain of example.org
    "http://EXAMPLE.org:8080/c",          # case + port normalization
    "https://notexample.org/d",           # suffix must anchor on a dot
    "https://spam.net/e",
    "ftp://files.example.com/f",
    "garbage-without-scheme",             # empty host -> never matches
]


@pytest.mark.usefixtures("ray_session")
class TestUrlFilter:
    def test_add_host(self):
        from quickner_ray.stages.urlfilter import add_host

        got = [r["host"] for r in add_host(_pages(URLS)).take_all()]
        assert got == [
            "example.org",
            "ads.example.org",
            "example.org",
            "notexample.org",
            "spam.net",
            "files.example.com",
            "",
        ]

    def test_blocklist_drops_host_and_subdomains(self):
        from quickner_ray.stages.urlfilter import filter_hosts

        out = filter_hosts(_pages(URLS), ["example.org", "spam.net"]).take_all()
        assert [r["url"] for r in out] == [
            "https://notexample.org/d",
            "ftp://files.example.com/f",
            "garbage-without-scheme",
        ]

    def test_keep_allowlist(self):
        from quickner_ray.stages.urlfilter import filter_hosts

        out = filter_hosts(
            _pages(URLS), ["example.org"], keep=True
        ).take_all()
        assert [r["url"] for r in out] == URLS[:3]

    def test_empty_blocklist_noop(self):
        from quickner_ray.stages.urlfilter import filter_hosts

        assert filter_hosts(_pages(URLS), []).count() == len(URLS)
        assert filter_hosts(_pages(URLS), [], keep=True).count() == 0

    def test_regex_metachars_escaped(self):
        from quickner_ray.stages.urlfilter import filter_hosts

        # "a.b" must not match "aXb.org" via an unescaped dot
        out = filter_hosts(_pages(["https://axb.org/x"]), ["a.b.org"]).take_all()
        assert len(out) == 1

    def test_kg_extra_stage_integration(self, tmp_path):
        from quickner_ray.pipelines.kg import KGPipelineConfig, annotate_dataset
        from quickner_ray.pipelines.queries import documents_gazetteer
        from quickner_ray.sources.pages import synth_pages_table
        from quickner_ray.stages.urlfilter import filter_hosts

        tab = synth_pages_table(["Rust text here", "more Rust text"])
        cfg = KGPipelineConfig(
            source="html",
            batch_size=64,
            extra_stages=[("urlblock", lambda ds: filter_hosts(ds, ["example.org"]))],
        )
        ann = annotate_dataset(rd.from_arrow(tab), documents_gazetteer(), cfg)
        assert ann.count() == 0  # all synth urls are example.org


class TestCanonicalUrl:
    def test_rules(self):
        from quickner_ray.stages.urlfilter import canonical_url as c

        assert c("HTTP://Host1.Example.COM:80/p/3/?b=2&a=1&utm_source=x#s") == (
            "http://host1.example.com/p/3?a=1&b=2"
        )
        assert c("https://a.com:443/") == "https://a.com"
        assert c("https://a.com:8443/x") == "https://a.com:8443/x"  # non-default kept
        assert c("http://a.com/?utm_campaign=1&gclid=2&fbclid=3&ref=4") == (
            "http://a.com"
        )
        assert c("http://a.com/x?refresh=1") == "http://a.com/x?refresh=1"  # no false prefix
        assert c("not a url #frag") == "not a url "
        # idempotent
        u = c("HTTPS://B.com/a/b/?z=1&y=2#f")
        assert c(u) == u

    def test_dedup_merges_pairs(self, ray_session, sf_dir):
        from quickner_ray.pipelines.queries import q_url_dedup

        got = q_url_dedup(sf_dir).to_pandas()
        # every canonical URL collects exactly its even/odd messy pair
        # (one singleton when the doc count is odd)
        assert (got.n_dupes <= 2).all()
        assert (got.n_dupes == 2).sum() >= len(got) - 1
        assert (got.keep_doc_id % 2 == 0).all()
