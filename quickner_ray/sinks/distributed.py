"""Distributed annotation export: stream an annotated Dataset into
per-block part files in any reference sink format (K1-K5). Part bytes are
produced by the SAME conformance writers as the in-memory sinks
(``formats.save_annotations``, ports of quickner-core/src/models.rs:39-165
quirks included), called per block on shim documents — so each part's
record bytes are identical to what the reference would write for those
documents.

The reference's ``save`` writes one ordered in-memory file; at corpus
scale the sink must stream, so this writes one part per block with a
content-derived name (md5 of first id, last id, row count): a retried or
re-run block overwrites its own part instead of duplicating it —
idempotent, the same contract as the parquet shard checkpoints
(state/lineage.py). Record ORDER across parts is block order, not global
order — reference-exact single-file ordering still goes through the
in-memory facade (SURVEY.md §4 Ordering).

brat (K4) note: the reference emits ONE corpus-wide .txt/.ann pair with
T-ids restarting per document (models.rs:113); here each part is its own
.txt/.ann pair with the same per-document T-id semantics.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa

from .formats import save_annotations

# extensions each format's writer produces; first entry is the primary
# file recorded in the manifest (brat's .ann rides along with its .txt).
_PART_EXTS = {
    "jsonl": (".jsonl",),
    "csv": (".csv",),
    "spacy": (".json",),
    "brat": (".txt", ".ann"),
    "conll": (".txt",),
}

_EMPTY_MANIFEST = pa.table(
    {"path": pa.array([], type=pa.string()), "rows": pa.array([], type=pa.int64())}
)


class _ShimDoc:
    """Duck-typed Document (id/text/label) fed to the conformance writers."""

    __slots__ = ("id", "text", "label")

    def __init__(self, id: str, text: str, label: list) -> None:
        self.id = id
        self.text = text
        self.label = label


def write_annotations_dataset(
    annotated_ds,
    out_dir: str,
    *,
    format: str = "jsonl",
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
):
    """Annotated Dataset (text + list<struct{start,end,label}>) -> directory
    of format parts. Returns the manifest Dataset (path, rows), one row per
    part — consume it to execute the write."""
    if format not in _PART_EXTS:
        raise ValueError(f"unsupported format: {format!r}")
    os.makedirs(out_dir, exist_ok=True)
    exts = _PART_EXTS[format]

    def dump(b: pa.Table) -> pa.Table:
        texts = b.column(text_col).to_pylist()
        if not texts:
            return _EMPTY_MANIFEST
        if id_col in b.column_names:
            ids = b.column(id_col).to_pylist()
        else:
            from ..kernel.hashing import hash_text

            ids = [hash_text(t) for t in texts]
        if label_col in b.column_names:
            labels = b.column(label_col).to_pylist()
        else:
            labels = [None] * len(texts)
        docs = [
            _ShimDoc(i, t, [(x["start"], x["end"], x["label"]) for x in (lab or [])])
            for i, t, lab in zip(ids, texts, labels)
        ]
        name = hashlib.md5(
            f"{ids[0]}:{ids[-1]}:{len(ids)}".encode()
        ).hexdigest()[:12]
        base = os.path.join(out_dir, f"part-{name}")
        tmp = os.path.join(out_dir, f"tmp-{name}")
        # the writer strips the extension itself (models.rs:49-55 quirk)
        save_annotations(docs, tmp + ".x", format)
        for ext in exts:
            os.replace(tmp + ext, base + ext)
        return pa.table(
            {
                "path": pa.array([base + exts[0]]),
                "rows": pa.array([len(docs)], type=pa.int64()),
            }
        )

    return annotated_ds.map_batches(dump, batch_format="pyarrow")


def write_jsonl_dataset(annotated_ds, out_dir: str, **kwargs):
    """JSONL (K1) distributed export — see ``write_annotations_dataset``."""
    return write_annotations_dataset(annotated_ds, out_dir, format="jsonl", **kwargs)


def compact_parquet(
    in_dir: str,
    out_dir: str,
    *,
    target_rows_per_file: int = 1_000_000,
    columns: list[str] | None = None,
) -> dict:
    """Small-file compaction: read a (possibly many-small-shards) parquet
    directory and rewrite it as ~``target_rows_per_file``-row files.

    The small-file problem is the standard failure mode of per-shard
    checkpointed output at scale (10^5 shards x tiny files destroys read
    parallelism and metadata servers).  Row count comes from parquet
    FOOTERS (no data read); the rewrite is a streaming
    read -> repartition -> write — the repartition is the only shuffle and
    moves each row once.  Returns {rows, files_in, files_out}.
    """
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    files = sorted(
        os.path.join(in_dir, f)
        for f in os.listdir(in_dir)
        if f.endswith(".parquet")
    )
    if not files:
        raise ValueError(f"no parquet files under {in_dir}")
    total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    n_out = max(1, -(-total // target_rows_per_file))
    ds = rd.read_parquet(files, columns=columns)
    ds.repartition(n_out).write_parquet(out_dir)
    files_out = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    return {"rows": total, "files_in": len(files), "files_out": len(files_out)}


# --- N-Triples graph export ---------------------------------------------------

_NT_BASE = "urn:quickner"


def _nt_escape(col: pa.Array) -> pa.Array:
    """N-Triples 1.1 literal escaping, vectorized: backslash first, then
    quote, newline, carriage return, tab (UTF-8 passes through — the 1.1
    grammar is UTF-8, no \\u escaping required)."""
    import pyarrow.compute as pc

    out = pc.replace_substring(col, "\\", "\\\\")
    out = pc.replace_substring(out, '"', '\\"')
    out = pc.replace_substring(out, "\n", "\\n")
    out = pc.replace_substring(out, "\r", "\\r")
    return pc.replace_substring(out, "\t", "\\t")


def _nt_iri_seg(col: pa.Array) -> pa.Array:
    """Percent-encode IRI-unsafe chars in a urn segment. Vectorized for the
    common all-safe case (one regex mask); odd values fall back to
    ``urllib.parse.quote`` via dictionary values (distinct-bounded)."""
    import pyarrow.compute as pc

    col = pc.cast(col, pa.string())
    safe = pc.match_substring_regex(col, r"^[A-Za-z0-9._~:-]*$")
    if pc.all(safe).as_py():
        return col
    from urllib.parse import quote

    enc = pc.dictionary_encode(col)
    quoted = pa.array(
        [quote(v, safe="._~:-") for v in enc.dictionary.to_pylist()],
        type=pa.string(),
    )
    return quoted.take(enc.indices)


def write_ntriples_dataset(
    triples_ds,
    out_dir: str,
    *,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
):
    """KG triples Dataset -> directory of W3C N-Triples 1.1 parts:
    ``<urn:quickner:doc:SUBJ> <urn:quickner:pred:PRED> "OBJ" .`` one line
    per triple, UTF-8, literal objects escaped per the grammar. Line
    assembly is pure Arrow kernels (escape chains + one element-wise
    join); parts use the same content-derived idempotent naming as the
    annotation sinks (a retried block overwrites its own part). Returns
    the manifest Dataset (path, rows) — consume it to execute the write."""
    import pyarrow.compute as pc

    os.makedirs(out_dir, exist_ok=True)

    def dump(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY_MANIFEST
        subj = _nt_iri_seg(b.column(subj_col).combine_chunks())
        pred = _nt_iri_seg(b.column(pred_col).combine_chunks())
        obj = _nt_escape(pc.cast(b.column(obj_col).combine_chunks(), pa.string()))
        n = b.num_rows
        lt = pa.array([f"<{_NT_BASE}:doc:"] * n, type=pa.string())
        mid = pa.array([f"> <{_NT_BASE}:pred:"] * n, type=pa.string())
        oq = pa.array(['> "'] * n, type=pa.string())
        end = pa.array(['" .'] * n, type=pa.string())
        lines = pc.binary_join_element_wise(lt, subj, mid, pred, oq, obj, end, "")
        payload = ("\n".join(lines.to_pylist()) + "\n").encode("utf-8")
        # name = hash of the PART BYTES: idempotent (same block -> same
        # path) and collision-free across blocks (first/last-row keys are
        # not unique on Zipf-repetitive triple streams)
        key = hashlib.md5(payload).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{key}.nt")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        return pa.table({"path": [path], "rows": pa.array([n], type=pa.int64())})

    return triples_ds.map_batches(dump, batch_format="pyarrow")


def write_nquads_dataset(
    quads_ds,
    out_dir: str,
    *,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    graph_col: str = "graph",
):
    """KG quads Dataset -> directory of W3C N-Quads 1.1 parts:
    ``<..doc:S> <..pred:P> "O" <..graph:G> .`` — rows whose graph is
    ``''`` (the default graph) emit the 3-term N-Triples form, per the
    N-Quads grammar. Same pure-Arrow line assembly and content-derived
    idempotent part naming as write_ntriples_dataset; round-trips through
    sources/ntriples.read_nquads."""
    import pyarrow.compute as pc

    os.makedirs(out_dir, exist_ok=True)

    def dump(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY_MANIFEST
        subj = _nt_iri_seg(b.column(subj_col).combine_chunks())
        pred = _nt_iri_seg(b.column(pred_col).combine_chunks())
        obj = _nt_escape(
            pc.cast(b.column(obj_col).combine_chunks(), pa.string())
        )
        graph = pc.cast(b.column(graph_col).combine_chunks(), pa.string())
        gseg = _nt_iri_seg(graph)
        n = b.num_rows
        lt = pa.array([f"<{_NT_BASE}:doc:"] * n, type=pa.string())
        mid = pa.array([f"> <{_NT_BASE}:pred:"] * n, type=pa.string())
        oq = pa.array(['> "'] * n, type=pa.string())
        # default-graph rows close after the literal; named rows carry
        # the graph IRI (vectorized if_else over the two tails)
        named_tail = pc.binary_join_element_wise(
            pa.array(['" <' + f"{_NT_BASE}:graph:"] * n, type=pa.string()),
            gseg,
            pa.array(["> ."] * n, type=pa.string()),
            "",
        )
        tail = pc.if_else(
            pc.equal(graph, pa.scalar("")),
            pa.array(['" .'] * n, type=pa.string()),
            named_tail,
        )
        lines = pc.binary_join_element_wise(
            lt, subj, mid, pred, oq, obj, tail, ""
        )
        payload = ("\n".join(lines.to_pylist()) + "\n").encode("utf-8")
        key = hashlib.md5(payload).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{key}.nq")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        return pa.table(
            {"path": [path], "rows": pa.array([n], type=pa.int64())}
        )

    return quads_ds.map_batches(dump, batch_format="pyarrow")
