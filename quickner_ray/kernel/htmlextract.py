"""Deterministic HTML -> text extraction (the north-rule extraction stage).

The reference has NO HTML handling (it consumes a texts CSV); this stage is
demanded by the target contract (BASELINE.json ``input_hint``): the input is
Common-Crawl-style pages ``(url, warc_ts, html, text, lang)`` and the
extractor must recover ``text`` byte-identically per url. lxml/bs4/
trafilatura are unavailable in this environment, so this is a pure
regex/state-machine main-content extractor:

1. decode UTF-8 (undecodable bytes -> extraction failure, the skip-hook the
   reference models as ``is_valid_utf8``, utils.rs:104-111);
2. strip comments, <script>/<style>/<noscript>/<template> blocks;
3. select the main-content region: first <article>, else <main>, else <body>
   minus <nav>/<header>/<footer>/<aside> boilerplate blocks (a
   trafilatura-style tag heuristic);
4. <br> -> newline; closing block tags -> newline; strip remaining tags;
5. unescape HTML entities; drop the final block-close newline.

``synth_page`` is the inverse generator used by tests/benchmarks: it wraps a
text in a deterministic page template (one <p> per line, html-escaped) with
nav/footer boilerplate; ``extract_text(synth_page(t)) == t`` for ALL texts —
pinned by golden + property tests. Everything is a pure function of the
input bytes, so re-runs at any parallelism produce identical output.
"""

from __future__ import annotations

import html as _html
import re

_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_DROP_BLOCK_RE = re.compile(
    r"<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>", re.S | re.I
)
_HEAD_RE = re.compile(r"<head\b[^>]*>.*?</head\s*>", re.S | re.I)
_ARTICLE_RE = re.compile(r"<article\b[^>]*>(.*?)</article\s*>", re.S | re.I)
_MAIN_RE = re.compile(r"<main\b[^>]*>(.*?)</main\s*>", re.S | re.I)
_BODY_RE = re.compile(r"<body\b[^>]*>(.*?)</body\s*>", re.S | re.I)
_BOILER_RE = re.compile(
    r"<(nav|header|footer|aside)\b[^>]*>.*?</\1\s*>", re.S | re.I
)
_BR_RE = re.compile(r"<br\s*/?>", re.I)
_BLOCK_CLOSE_RE = re.compile(
    r"</(p|div|h[1-6]|li|ul|ol|tr|table|blockquote|pre|section|article|figure|dd|dt)\s*>",
    re.I,
)
_TAG_RE = re.compile(r"<[^>]*>")


def extract_text(html_bytes: bytes) -> str | None:
    """Extract main-content text from page bytes; None if undecodable."""
    try:
        doc = html_bytes.decode("utf-8")
    except UnicodeDecodeError:
        return None
    doc = _COMMENT_RE.sub("", doc)
    doc = _DROP_BLOCK_RE.sub("", doc)
    m = _ARTICLE_RE.search(doc)
    if m is None:
        m = _MAIN_RE.search(doc)
    if m is not None:
        region = m.group(1)
    else:
        mb = _BODY_RE.search(doc)
        region = mb.group(1) if mb is not None else _HEAD_RE.sub("", doc)
        region = _BOILER_RE.sub("", region)
    region = _BR_RE.sub("\n", region)
    region = _BLOCK_CLOSE_RE.sub("\n", region)
    region = _TAG_RE.sub("", region)
    text = _html.unescape(region)
    # every closing block tag contributed one '\n'; n paragraphs need n-1
    if text.endswith("\n"):
        text = text[:-1]
    return text


_PAGE_TEMPLATE = (
    "<html><head><meta charset=\"utf-8\"><title>{title}</title>"
    "<style>body{{margin:0}}</style><script>var _p={seq};</script></head>"
    "<body><nav><a href=\"/\">Home</a> | <a href=\"/about\">About</a></nav>"
    "<article>{paragraphs}</article>"
    "<footer>&copy; example.org crawl fixture</footer></body></html>"
)


def synth_page(text: str, seq: int = 0, title: str = "fixture") -> bytes:
    """Deterministic HTML wrapping of ``text``; inverse of ``extract_text``."""
    paragraphs = "".join(
        "<p>" + _html.escape(line, quote=False) + "</p>" for line in text.split("\n")
    )
    page = _PAGE_TEMPLATE.format(
        title=_html.escape(title, quote=False), seq=seq, paragraphs=paragraphs
    )
    return page.encode("utf-8")


# --- hyperlink extraction (host link-graph stage input) -----------------------

_ANCHOR_RE = re.compile(
    r"<a\b[^>]*?\bhref\s*=\s*(\"([^\"]*)\"|'([^']*)'|([^\s>]+))[^>]*>(.*?)</a\s*>",
    re.S | re.I,
)


def extract_links(html_bytes: bytes) -> list[tuple[str, str]]:
    """All ``(href, anchor_text)`` pairs from a page, in document order.

    Comments and script/style/noscript/template blocks are stripped first
    (a commented-out link is not a link); anchors keep their inner text
    with tags removed and entities unescaped. Relative hrefs are returned
    as-is — the link-graph stage filters/resolves. Undecodable bytes ->
    empty list (same skip-hook as extract_text)."""
    try:
        doc = html_bytes.decode("utf-8")
    except UnicodeDecodeError:
        return []
    doc = _COMMENT_RE.sub("", doc)
    doc = _DROP_BLOCK_RE.sub("", doc)
    out: list[tuple[str, str]] = []
    for m in _ANCHOR_RE.finditer(doc):
        href = m.group(2) or m.group(3) or m.group(4) or ""
        inner = _TAG_RE.sub("", m.group(5))
        out.append((_html.unescape(href), _html.unescape(inner)))
    return out


def synth_linked_page(
    text: str, links: list[tuple[str, str]], seq: int = 0, title: str = "fixture"
) -> bytes:
    """Deterministic page with an outlink list appended inside the article:
    ``extract_links`` recovers exactly the template nav links plus
    ``links`` (href, anchor) in order. (``extract_text`` of a linked page
    yields ``text`` plus the anchor texts as trailing lines — anchors are
    in-content, as on real pages.)"""
    paragraphs = "".join(
        "<p>" + _html.escape(line, quote=False) + "</p>" for line in text.split("\n")
    )
    ul = (
        "<ul>"
        + "".join(
            '<li><a href="{h}">{a}</a></li>'.format(
                h=_html.escape(h, quote=True), a=_html.escape(a, quote=False)
            )
            for h, a in links
        )
        + "</ul>"
    )
    page = _PAGE_TEMPLATE.format(
        title=_html.escape(title, quote=False),
        seq=seq,
        paragraphs=paragraphs + ul,
    )
    return page.encode("utf-8")


# --- semi-structured infobox extraction (attribute-value fact tables) ---------

_INFOBOX_RE = re.compile(
    r"<table\b[^>]*\bclass\s*=\s*\"[^\"]*\binfobox\b[^\"]*\"[^>]*>(.*?)</table\s*>",
    re.S | re.I,
)
_TR_RE = re.compile(r"<tr\b[^>]*>(.*?)</tr\s*>", re.S | re.I)
_TH_RE = re.compile(r"<th\b[^>]*>(.*?)</th\s*>", re.S | re.I)
_TD_RE = re.compile(r"<td\b[^>]*>(.*?)</td\s*>", re.S | re.I)
_WS_RE = re.compile(r"\s+")


def _cell_text(fragment: str) -> str:
    """Cell markup -> clean text: inner tags stripped, entities unescaped,
    whitespace collapsed (the WebTables-style cell normalization)."""
    return _WS_RE.sub(" ", _html.unescape(_TAG_RE.sub("", fragment))).strip()


def extract_infobox(html_bytes: bytes) -> list[tuple[str, str]]:
    """Attribute-value pairs from a page's ``<table class="infobox">`` —
    the semi-structured fact source of WebTables / DBpedia-style KG
    construction (each row ``<tr><th>attr</th><td>value</td></tr>`` is a
    (subject-page, attr, value) triple candidate).

    Byte-deterministic pure function: comments and script/style blocks are
    stripped first (a commented-out ``<td>`` must not produce a fact),
    inner inline tags are stripped, entities unescaped, whitespace
    collapsed. Rows missing either cell are skipped. [] on undecodable
    bytes (P10 skip-hook) or pages without an infobox."""
    try:
        doc = html_bytes.decode("utf-8")
    except UnicodeDecodeError:
        return []
    doc = _COMMENT_RE.sub("", doc)
    doc = _DROP_BLOCK_RE.sub("", doc)
    m = _INFOBOX_RE.search(doc)
    if m is None:
        return []
    out = []
    for tr in _TR_RE.finditer(m.group(1)):
        row = tr.group(1)
        th, td = _TH_RE.search(row), _TD_RE.search(row)
        if th is None or td is None:
            continue
        attr, val = _cell_text(th.group(1)), _cell_text(td.group(1))
        if attr:
            out.append((attr, val))
    return out


def synth_infobox_page(
    text: str, facts: list[tuple[str, str]], seq: int = 0, title: str = "fixture"
) -> bytes:
    """Deterministic page carrying an infobox of ``facts``:
    ``extract_infobox`` recovers exactly ``facts`` in order. Adversarial
    markup baked in: an HTML comment containing a decoy row, alternating
    ``<b>`` wraps inside value cells, and entity-escaped cell text."""
    rows = []
    for i, (attr, val) in enumerate(facts):
        v = _html.escape(val, quote=False)
        if (seq + i) % 3 == 0:
            v = "<b>" + v + "</b>"
        rows.append(
            "<tr><th>" + _html.escape(attr, quote=False) + "</th><td>" + v + "</td></tr>"
        )
    tbl = (
        '<table class="infobox vcard">'
        "<!-- layout hint <tr><th>bogus</th><td>decoy</td></tr> -->"
        + "".join(rows)
        + "</table>"
    )
    paragraphs = "".join(
        "<p>" + _html.escape(line, quote=False) + "</p>" for line in text.split("\n")
    )
    page = _PAGE_TEMPLATE.format(
        title=_html.escape(title, quote=False),
        seq=seq,
        paragraphs=tbl + paragraphs,
    )
    return page.encode("utf-8")
