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


# --- URL canonicalization ------------------------------------------------------

_URL_SPLIT_RE = re.compile(
    r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]+)([^?#]*)(?:\?([^#]*))?"
)
_TRACKING_PARAM_RE = re.compile(r"^(utm_[^=]*|gclid|fbclid|msclkid|ref)(=|$)")


def canonical_url(u: str) -> str:
    """One URL -> its canonical form (crawl-dedup normalization):

    - fragment dropped;
    - scheme and host lowercased;
    - default port stripped (``:80`` for http, ``:443`` for https);
    - ONE trailing slash stripped from the path (so ``/p/`` == ``/p`` and
      ``https://a.com/`` == ``https://a.com``);
    - tracking query params removed (``utm_*``, ``gclid``, ``fbclid``,
      ``msclkid``, ``ref``), remaining params sorted bytewise, empty query
      dropped.

    Non-URL strings (no ``scheme://``) pass through with only the fragment
    dropped — canonicalization must be total and idempotent."""
    u = u.split("#", 1)[0]
    m = _URL_SPLIT_RE.match(u)
    if m is None:
        return u
    scheme = m.group(1).lower()
    netloc = m.group(2).lower()
    path = m.group(3) or ""
    query = m.group(4)
    if scheme == "http" and netloc.endswith(":80"):
        netloc = netloc[:-3]
    elif scheme == "https" and netloc.endswith(":443"):
        netloc = netloc[:-4]
    if path.endswith("/"):
        path = path[:-1]
    params = sorted(
        p
        for p in (query.split("&") if query else [])
        if p and not _TRACKING_PARAM_RE.match(p)
    )
    out = f"{scheme}://{netloc}{path}"
    return out + "?" + "&".join(params) if params else out


def add_canonical_url(ds, url_col: str = "url", out_col: str = "canon_url"):
    """Append the canonical form of ``url_col``. Per-batch map; the only
    per-row Python is the query-param sort (rows without a query string
    are the common case and stay cheap)."""

    def per_batch(b: pa.Table) -> pa.Table:
        urls = b.column(url_col)
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        canon = pa.array(
            [canonical_url(u) for u in urls.to_pylist()], type=pa.string()
        )
        return b.append_column(out_col, canon)

    return ds.map_batches(per_batch, batch_format="pyarrow")
