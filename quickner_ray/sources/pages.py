"""Web-pages Parquet source + deterministic synthetic page generator.

The authoritative pipeline input (BASELINE.json ``input_hint``) is a Parquet
table of Common-Crawl-style pages::

    url: string, warc_ts: timestamp[us], html: binary, text: large_string, lang: string

``read_pages`` prunes columns at the read (only what the requested stages
need leaves storage). ``synth_pages_table`` builds a seeded, fully
deterministic pages table from a source of texts (e.g.
``documents.parquet``), wrapping each text with ``kernel.htmlextract.synth_page``
so ``extract_text(html) == text`` byte-identically per url — no external
data (driver rule). Zipf-hot surface forms come from the source texts
themselves.
"""

from __future__ import annotations

import datetime as _dt

import pyarrow as pa

from ..kernel.htmlextract import synth_page

PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.large_string()),
        pa.field("lang", pa.string()),
    ]
)


def read_pages(path: str, columns: list[str] | None = None, **kwargs):
    """ray.data.read_parquet with column pruning (pass only needed columns)."""
    import ray.data as rd

    return rd.read_parquet(path, columns=columns, **kwargs)


_EPOCH = _dt.datetime(2023, 1, 1)


def synth_pages_table(
    texts: list[str], langs: list[str] | None = None, base_seq: int = 0
) -> pa.Table:
    """Deterministic pages table: text[i] -> one page row. Pure function of
    its inputs (no clock, no RNG) so any shard re-generates identically."""
    n = len(texts)
    urls = [f"https://example.org/crawl/{base_seq + i:012d}" for i in range(n)]
    ts = [_EPOCH + _dt.timedelta(seconds=(base_seq + i) % 86400) for i in range(n)]
    htmls = [synth_page(t, seq=base_seq + i) for i, t in enumerate(texts)]
    langs = langs if langs is not None else ["en"] * n
    return pa.Table.from_arrays(
        [
            pa.array(urls, type=pa.string()),
            pa.array(ts, type=pa.timestamp("us")),
            pa.array(htmls, type=pa.binary()),
            pa.array(texts, type=pa.large_string()),
            pa.array(langs, type=pa.string()),
        ],
        schema=PAGES_SCHEMA,
    )


def write_synth_pages(
    out_dir: str,
    source_documents_parquet: str,
    repeat: int = 1,
    row_group_size: int = 4096,
    text_multiplier: int = 1,
    charset: str = "ascii",
) -> list[str]:
    """Materialize a synthetic pages dataset from a documents table.

    Writes one parquet FILE per repeat (``pages-NNNN.parquet``) so the file
    list doubles as the deterministic shard layout for resumable runs.
    ``repeat`` > 1 duplicates the corpus with distinct urls/seqs (distinct
    html bytes, same text distribution) to scale benchmark input.
    ``text_multiplier`` > 1 pads each text to Common-Crawl-page length (the
    source docs average ~300 chars; real extracted pages are KBs) with
    MANGLED copies ('x'-prefixed words) so the page is m-times longer but
    mention density per doc stays realistic — plain tiling would multiply
    gazetteer hits m-fold, which no real page does.
    ``charset="multilingual"`` prefixes the filler of every ODD doc with
    non-ASCII letters instead (ü/é/汉/я round-robin), making 50% of pages
    non-ASCII — a deterministic mixed-language corpus that exercises the
    UTF-32 wide matching kernel at realistic density. Returns the list of
    file paths.
    """
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    src = pq.read_table(source_documents_parquet, columns=["text", "lang"])
    texts = src["text"].to_pylist()
    if text_multiplier > 1:
        uni = "üé汉я"

        def _pad(t: str, i: int) -> str:
            if charset == "multilingual" and i % 2 == 1:
                words = t.split()
                filler = " ".join(uni[j % 4] + w for j, w in enumerate(words))
            else:
                filler = " ".join("x" + w for w in t.split())
            return " ".join([t] + [filler] * (text_multiplier - 1))

        texts = [_pad(t, i) for i, t in enumerate(texts)]
    langs = src["lang"].to_pylist()
    n = len(texts)
    paths = []
    for r in range(repeat):
        path = os.path.join(out_dir, f"pages-{r:04d}.parquet")
        pq.write_table(
            synth_pages_table(texts, langs, base_seq=r * n),
            path,
            row_group_size=row_group_size,
        )
        paths.append(path)
    return paths
