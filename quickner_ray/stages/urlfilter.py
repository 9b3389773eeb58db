"""URL/host filtering for web-crawl corpora.

Corpus prep for Common-Crawl-style input starts with URL hygiene: drop
pages from blocklisted hosts (UT1/adult/spam lists) or keep only an
allowlist.  Both are ZERO-shuffle per-batch filters: the host is
extracted with one vectorized RE2 kernel, the (bounded) blocklist ships
once via ``ray.put`` and compiles ONCE per task into a single anchored
alternation regex — host-suffix matching (``ads.example.com`` matches a
blocked ``example.com``) costs one ``pc.extract_regex`` + one
``pc.match_substring_regex`` per batch, no Python row loops.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?P<host>[^/?#]+)"


def _hosts(urls) -> pa.Array:
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    st = pc.extract_regex(urls, _HOST_RE)
    # non-matching urls (no scheme) -> null host -> empty string
    host = pc.if_else(
        pc.is_valid(st),
        pc.struct_field(st, "host"),
        pa.scalar("", type=pa.string()),
    )
    # strip port + lowercase (hosts are case-insensitive)
    return pc.utf8_lower(pc.replace_substring_regex(host, r":\d+$", ""))


def add_host(ds, url_col: str = "url", out_col: str = "host"):
    """Append a normalized (lowercased, port-stripped) host column."""

    def f(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column(out_col, pa.array([], type=pa.string()))
        return b.append_column(out_col, _hosts(b.column(url_col)))

    return ds.map_batches(f, batch_format="pyarrow")


def _block_pattern(hosts: list[str]) -> str:
    """One anchored alternation matching a host or any of its subdomains."""
    alts = "|".join(re.escape(h.lower()) for h in sorted(set(hosts)))
    return rf"(^|\.)({alts})$"


def filter_hosts(ds, blocked: list[str], *, url_col: str = "url", keep: bool = False):
    """Drop (or with ``keep=True``, keep only) rows whose url host matches
    any blocklist entry or subdomain thereof.  The blocklist is broadcast
    once; empty blocklist is a no-op (or empty result when keep=True)."""
    import ray

    if not blocked:
        if keep:
            return ds.filter(lambda _: False)
        return ds
    ref = ray.put(_block_pattern(blocked))

    def f(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        pat = ray.get(ref)
        hit = pc.match_substring_regex(_hosts(b.column(url_col)), pat)
        return b.filter(hit if keep else pc.invert(hit))

    return ds.map_batches(f, batch_format="pyarrow")
