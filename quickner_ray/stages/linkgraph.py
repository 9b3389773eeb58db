"""Hyperlink / host link-graph extraction over crawled pages.

The web-graph side of a Common-Crawl-scale KG build: every page's
``<a href>`` anchors are parsed out of the raw HTML bytes
(kernel/htmlextract.extract_links — comment/script-stripped, entity-
unescaped), exploded to one ``(src_url, href, anchor)`` row per link,
resolved to normalized hosts (stages/urlfilter host rules), and
aggregated into a weighted host->host edge list. The reference has no
HTML handling at all; this stage exists for the north-rule pipeline
(BASELINE.json: Common-Crawl-style pages input).

Scale shape: link extraction and host resolution are embarrassingly
parallel per batch (the per-page regex scan is the same cost class as
text extraction); the ONLY shuffle is the final (src_host, dst_host)
groupby, whose partial per-batch combiner bounds each exchange row to
one per distinct host pair per batch. Edge keys are host pairs — far
fewer than pages — and hot hosts (every page links to facebook.com)
stay safe because the combiner collapses them batch-locally first, so a
reducer receives at most n_batches rows per hot pair, not n_links.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..kernel.htmlextract import extract_links
from .urlfilter import _hosts


def explode_outlinks(ds, html_col: str = "html", url_col: str = "url"):
    """Pages -> one row per anchor: (src_url, href, anchor). Per-batch
    flat explode; no shuffle."""

    def per_batch(b: pa.Table) -> pa.Table:
        htmls = b.column(html_col)
        if isinstance(htmls, pa.ChunkedArray):
            htmls = htmls.combine_chunks()
        urls = b.column(url_col)
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        src, href, anchor = [], [], []
        for i in range(len(htmls)):
            u = urls[i].as_py()
            for h, a in extract_links(htmls[i].as_py()):
                src.append(u)
                href.append(h)
                anchor.append(a)
        return pa.table(
            {
                "src_url": pa.array(src, type=pa.string()),
                "href": pa.array(href, type=pa.string()),
                "anchor": pa.array(anchor, type=pa.string()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow")


def _absolute_hosts(links: pa.Table) -> pa.Table:
    """Keep absolute http(s) links; resolve src/dst hosts; drop self-loops
    and intra-host links (the host graph is about cross-site edges)."""
    def _flat(col):
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

    dst = _flat(_hosts(_flat(links.column("href"))))
    src = _flat(_hosts(_flat(links.column("src_url"))))
    keep = pc.and_(pc.invert(pc.equal(dst, "")), pc.invert(pc.equal(src, dst)))
    return pa.table({"src_host": src, "dst_host": dst}).filter(keep)


def host_link_graph(ds, html_col: str = "html", url_col: str = "url"):
    """Pages -> weighted cross-host edge list (src_host, dst_host,
    n_links). One shuffle (the host-pair groupby), bounded by the
    per-batch combiner."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = _absolute_hosts(b)
        return (
            t.group_by(["src_host", "dst_host"])
            .aggregate([([], "count_all")])
            .rename_columns(["src_host", "dst_host", "n_links"])
        )

    edges = explode_outlinks(ds, html_col=html_col, url_col=url_col).map_batches(
        partial, batch_format="pyarrow"
    )
    # host-pair key space is host-count bounded (tiny next to pages), so a
    # handful of reduce partitions beats the default block-count fan-out
    return edges.groupby(["src_host", "dst_host"], num_partitions=8).aggregate(
        Sum("n_links", alias_name="n_links")
    )


def host_degrees(edge_ds):
    """Host in/out degree + link volume from a (src_host, dst_host,
    n_links) edge list: two dimension-bounded groupbys unioned into one
    per-host row (out_deg, in_deg, out_links, in_links)."""
    from ray.data.aggregate import Count, Sum

    out_side = edge_ds.map_batches(
        lambda b: pa.table(
            {
                "host": b.column("src_host"),
                "out_deg": pa.array([1] * b.num_rows, type=pa.int64()),
                "out_links": b.column("n_links"),
                "in_deg": pa.array([0] * b.num_rows, type=pa.int64()),
                "in_links": pa.array([0] * b.num_rows, type=pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    in_side = edge_ds.map_batches(
        lambda b: pa.table(
            {
                "host": b.column("dst_host"),
                "out_deg": pa.array([0] * b.num_rows, type=pa.int64()),
                "out_links": pa.array([0] * b.num_rows, type=pa.int64()),
                "in_deg": pa.array([1] * b.num_rows, type=pa.int64()),
                "in_links": b.column("n_links"),
            }
        ),
        batch_format="pyarrow",
    )
    return out_side.union(in_side).groupby("host", num_partitions=4).aggregate(
        Sum("out_deg", alias_name="out_deg"),
        Sum("out_links", alias_name="out_links"),
        Sum("in_deg", alias_name="in_deg"),
        Sum("in_links", alias_name="in_links"),
    )


def anchor_stats(ds, html_col: str = "html", url_col: str = "url"):
    """Anchor-text mining: how the web names each host. Cross-host anchors
    aggregate to (dst_host, anchor, n_refs) — the classic alias-candidate
    source for entity canonicalization (anchor text is the crowd-sourced
    surface form of the link target). Same shuffle budget as
    host_link_graph: per-batch (dst_host, anchor) combiner, then one
    bounded pair groupby."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        def _flat(col):
            return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

        dst = _flat(_hosts(_flat(b.column("href"))))
        src = _flat(_hosts(_flat(b.column("src_url"))))
        keep = pc.and_(pc.invert(pc.equal(dst, "")), pc.invert(pc.equal(src, dst)))
        t = pa.table({"dst_host": dst, "anchor": b.column("anchor")}).filter(keep)
        return (
            t.group_by(["dst_host", "anchor"])
            .aggregate([([], "count_all")])
            .rename_columns(["dst_host", "anchor", "n_refs"])
        )

    pairs = explode_outlinks(ds, html_col=html_col, url_col=url_col).map_batches(
        partial, batch_format="pyarrow"
    )
    return pairs.groupby(["dst_host", "anchor"], num_partitions=8).aggregate(
        Sum("n_refs", alias_name="n_refs")
    )
