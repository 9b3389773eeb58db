"""HTML -> text extraction stage (stateless ``map_batches`` batch UDF).

Wraps ``kernel.htmlextract.extract_text`` over the ``html: binary`` column of
a pages Dataset (BASELINE.json input shape). Pure per-row function of the
bytes — byte-identical output per url at any parallelism. Rows whose bytes
do not decode are dropped and counted (the reference's invalid-utf8 skip
hook, utils.rs:104-111,123-126).
"""

from __future__ import annotations

import pyarrow as pa

from ..kernel.htmlextract import extract_text


def extract_pages(batch: pa.Table) -> pa.Table:
    """(url, warc_ts?, html, lang?) -> (url, warc_ts?, lang?, text).

    Use inside ``ds.map_batches(extract_pages, batch_format="pyarrow")``.
    """
    htmls = batch.column("html").to_pylist()
    texts = [extract_text(h) for h in htmls]
    keep = [i for i, t in enumerate(texts) if t is not None]
    out_cols = {}
    for name in batch.column_names:
        if name in ("html", "text"):
            continue  # drop the heavy binary (and any pre-existing text) ASAP
        out_cols[name] = batch.column(name)
    out = pa.Table.from_pydict(
        {**{k: v for k, v in out_cols.items()},
         "text": pa.array(texts, type=pa.large_string())}
    )
    if len(keep) != len(texts):
        out = out.take(pa.array(keep, type=pa.int64()))
    return out


def passthrough_text(batch: pa.Table) -> pa.Table:
    """Fast path when the pages table already carries extracted ``text``
    (conformance corpora): select away the html column, keep everything else."""
    if "html" in batch.column_names:
        batch = batch.drop_columns(["html"])
    return batch
