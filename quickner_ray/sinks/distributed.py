"""Distributed JSONL export: each block writes one part file whose LINES
are byte-identical to the reference sink (``formats._doc_json`` — serde
compact, field order id/text/label, label rows as [start, end, label]).

The reference's ``to_jsonl`` writes one ordered in-memory file; at corpus
scale the sink must stream, so this writes ``part-<hash>.jsonl`` per block
(content-derived names: a retried task overwrites its own part instead of
duplicating it — idempotent, same contract as the parquet shards) and
returns a manifest Dataset (path, rows) instead of re-shipping the data.
Line ORDER across parts is block order, not global order — reference-exact
ordering still goes through the in-memory facade (SURVEY.md §4 Ordering).
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa


def write_jsonl_dataset(
    annotated_ds,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
):
    """Annotated Dataset -> directory of JSONL parts; returns the manifest
    Dataset (consume it to execute the write)."""
    os.makedirs(out_dir, exist_ok=True)

    def dump(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        texts = b.column(text_col).to_pylist()
        labels = b.column(label_col).to_pylist() if label_col in b.column_names else [
            [] for _ in ids
        ]
        if not ids:
            return pa.table(
                {"path": pa.array([], type=pa.string()),
                 "rows": pa.array([], type=pa.int64())}
            )
        lines = []
        for i, t, lab in zip(ids, texts, labels):
            triples = [
                [x["start"], x["end"], x["label"]] for x in (lab or [])
            ]
            lines.append(
                json.dumps(
                    {"id": i, "text": t, "label": triples},
                    ensure_ascii=False,
                    separators=(",", ":"),
                )
            )
        name = hashlib.md5(
            f"{ids[0]}:{ids[-1]}:{len(ids)}".encode()
        ).hexdigest()[:12]
        path = os.path.join(out_dir, f"part-{name}.jsonl")
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("\n".join(lines))
            f.write("\n")
        os.replace(tmp, path)
        return pa.table(
            {"path": pa.array([path]), "rows": pa.array([len(lines)], type=pa.int64())}
        )

    return annotated_ds.map_batches(dump, batch_format="pyarrow")
