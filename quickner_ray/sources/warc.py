"""WARC source: Common-Crawl-style web-archive files as a Ray Dataset.

Custom ``FileBasedDatasource`` — the idiomatic Ray shape for a new file
format: Ray plans one read task per file (or file group), each task
streams ITS files record-by-record and yields bounded Arrow batches, so
a crawl of any size reads with per-file parallelism, column-complete
blocks, and no driver-side materialization.  ``.warc.gz`` is handled by
wrapping the stream in stdlib gzip (real Common Crawl ships
member-per-record gzip; plain concatenated gzip also decodes).

Parsed record subset: ``WARC-Type: response`` records with headers
``WARC-Target-URI``, ``WARC-Date`` and (CC-style)
``WARC-Identified-Content-Language``; the record body is the raw page
bytes.  Output schema matches ``pages.PAGES_SCHEMA`` minus ``text``
(url, warc_ts, html, lang) — downstream HTML extraction is the
pipeline's job, not the reader's.

``write_synth_warc`` materializes a deterministic synthetic crawl from a
documents table (same page bytes as ``pages.write_synth_pages``, so
``extract_text`` round-trips byte-identically) — no external data.
"""

from __future__ import annotations

import datetime as _dt
import gzip
import io
import os
from typing import TYPE_CHECKING, Iterator

import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import pyarrow

_BATCH_RECORDS = 512

WARC_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("lang", pa.string()),
    ]
)


def _parse_warc_stream(
    stream, record_type: str = "response"
) -> Iterator[tuple[str, _dt.datetime, bytes, str]]:
    """Yield (url, ts, body, lang) per record of ``record_type``
    ("response" for .warc, "conversion" for .wet). Streaming: reads header
    lines then exactly Content-Length body bytes — never the whole file at
    once."""
    while True:
        line = stream.readline()
        if not line:
            return
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(f"not a WARC record header: {line[:40]!r}")
        headers: dict[str, str] = {}
        while True:
            h = stream.readline()
            if h in (b"\r\n", b"\n", b""):
                break
            k, _, v = h.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0"))
        body = stream.read(length)
        if headers.get("warc-type") != record_type:
            continue
        url = headers.get("warc-target-uri", "")
        ts_raw = headers.get("warc-date", "1970-01-01T00:00:00Z")
        ts = _dt.datetime.strptime(ts_raw, "%Y-%m-%dT%H:%M:%SZ")
        lang = headers.get("warc-identified-content-language", "")
        yield url, ts, body, lang


def _rows_to_batch(rows: list[tuple]) -> pa.Table:
    return pa.Table.from_arrays(
        [
            pa.array([r[0] for r in rows], type=pa.string()),
            pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            pa.array([r[2] for r in rows], type=pa.binary()),
            pa.array([r[3] for r in rows], type=pa.string()),
        ],
        schema=WARC_SCHEMA,
    )


class WarcDatasource:
    """Lazily constructed to avoid importing ray at module import time."""

    def __new__(cls, paths, **kwargs):
        from ray.data.datasource import FileBasedDatasource

        class _WarcDatasource(FileBasedDatasource):
            _FILE_EXTENSIONS = ["warc", "warc.gz"]

            def _read_stream(
                self, f: "pyarrow.NativeFile", path: str
            ) -> Iterator[pa.Table]:
                # .gz is already decompressed here: Arrow infers compression
                # from the extension when Ray opens the input stream
                raw = io.BufferedReader(_NativeWrapper(f))
                rows: list[tuple] = []
                for rec in _parse_warc_stream(raw):
                    rows.append(rec)
                    if len(rows) >= _BATCH_RECORDS:
                        yield _rows_to_batch(rows)
                        rows = []
                if rows:
                    yield _rows_to_batch(rows)

        return _WarcDatasource(paths, **kwargs)


class _NativeWrapper(io.RawIOBase):
    """Adapt a pyarrow NativeFile to the io.RawIOBase protocol so
    BufferedReader/GzipFile can stream it."""

    def __init__(self, f):
        self._f = f

    def readable(self) -> bool:
        return True

    def readinto(self, b) -> int:
        data = self._f.read(len(b))
        b[: len(data)] = data
        return len(data)


def read_warc(paths, **kwargs):
    """WARC file(s)/dir -> Dataset(url, warc_ts, html, lang)."""
    import ray.data as rd

    return rd.read_datasource(WarcDatasource(paths), **kwargs)


def _record(
    url: str, ts: _dt.datetime, body: bytes, lang: str, rec_type: str = "response"
) -> bytes:
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {rec_type}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
        f"WARC-Identified-Content-Language: {lang}\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n"
    ).encode()
    return head + body + b"\r\n\r\n"


def write_synth_warc(
    out_dir: str,
    source_documents_parquet: str,
    *,
    repeat: int = 1,
    gzip_files: bool = False,
) -> list[str]:
    """Deterministic synthetic crawl: one ``.warc[.gz]`` file per repeat,
    same page bytes as ``pages.write_synth_pages`` (extract_text
    round-trips byte-identically per url)."""
    import pyarrow.parquet as pq

    from .pages import synth_pages_table

    os.makedirs(out_dir, exist_ok=True)
    tab = pq.read_table(source_documents_parquet, columns=["text", "lang"])
    texts = tab.column("text").to_pylist()
    langs = tab.column("lang").to_pylist()
    out_files = []
    for r in range(repeat):
        pages = synth_pages_table(texts, langs, base_seq=r * len(texts))
        name = f"crawl-{r:04d}.warc" + (".gz" if gzip_files else "")
        path = os.path.join(out_dir, name)
        opener = gzip.open if gzip_files else open
        with opener(path, "wb") as f:
            for url, ts, html, lang in zip(
                pages.column("url").to_pylist(),
                pages.column("warc_ts").to_pylist(),
                pages.column("html").to_pylist(),
                pages.column("lang").to_pylist(),
            ):
                f.write(_record(url, ts, html, lang))
        out_files.append(path)
    return out_files


# -- WET (extracted-text conversion records) ----------------------------------

WET_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("text", pa.large_string()),
        pa.field("lang", pa.string()),
    ]
)


def _wet_rows_to_batch(rows: list[tuple]) -> pa.Table:
    return pa.Table.from_arrays(
        [
            pa.array([r[0] for r in rows], type=pa.string()),
            pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            pa.array(
                [r[2].decode("utf-8", "replace") for r in rows],
                type=pa.large_string(),
            ),
            pa.array([r[3] for r in rows], type=pa.string()),
        ],
        schema=WET_SCHEMA,
    )


class WetDatasource:
    """WET sibling of ``WarcDatasource``: ``WARC-Type: conversion`` records
    whose body is the already-extracted page TEXT (utf-8) — Common Crawl's
    .wet files. Output matches the pages schema's text path
    (url, warc_ts, text, lang), feeding ``KGPipelineConfig(source="text")``
    with no HTML extraction stage."""

    def __new__(cls, paths, **kwargs):
        from ray.data.datasource import FileBasedDatasource

        class _WetDatasource(FileBasedDatasource):
            _FILE_EXTENSIONS = ["wet", "wet.gz"]

            def _read_stream(self, f, path: str):
                raw = io.BufferedReader(_NativeWrapper(f))
                rows: list[tuple] = []
                for rec in _parse_warc_stream(raw, record_type="conversion"):
                    rows.append(rec)
                    if len(rows) >= _BATCH_RECORDS:
                        yield _wet_rows_to_batch(rows)
                        rows = []
                if rows:
                    yield _wet_rows_to_batch(rows)

        return _WetDatasource(paths, **kwargs)


def read_wet(paths, **kwargs):
    """WET file(s)/dir -> Dataset(url, warc_ts, text, lang)."""
    import ray.data as rd

    return rd.read_datasource(WetDatasource(paths), **kwargs)


def write_synth_wet(
    out_dir: str,
    source_documents_parquet: str,
    *,
    repeat: int = 1,
    gzip_files: bool = False,
) -> list[str]:
    """Deterministic synthetic WET shards: conversion records whose body is
    the document TEXT (same urls/timestamps as the synthetic crawl)."""
    import pyarrow.parquet as pq

    from .pages import synth_pages_table

    os.makedirs(out_dir, exist_ok=True)
    tab = pq.read_table(source_documents_parquet, columns=["text", "lang"])
    texts = tab.column("text").to_pylist()
    langs = tab.column("lang").to_pylist()
    out_files = []
    for r in range(repeat):
        pages = synth_pages_table(texts, langs, base_seq=r * len(texts))
        name = f"crawl-{r:04d}.wet" + (".gz" if gzip_files else "")
        path = os.path.join(out_dir, name)
        opener = gzip.open if gzip_files else open
        with opener(path, "wb") as f:
            for url, ts, text, lang in zip(
                pages.column("url").to_pylist(),
                pages.column("warc_ts").to_pylist(),
                pages.column("text").to_pylist(),
                pages.column("lang").to_pylist(),
            ):
                f.write(_record(url, ts, text.encode(), lang, rec_type="conversion"))
        out_files.append(path)
    return out_files
