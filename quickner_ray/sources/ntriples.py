"""N-Triples 1.1 reader — the ingest half of the RDF round-trip
(sinks/distributed.write_ntriples_dataset is the export half).

A KG build at corpus scale routinely ingests existing RDF dumps (e.g.
truthy-triple exports) next to the crawl-extracted triples; this reader
streams ``.nt`` shard directories through ``ray.data.read_text`` (one
block per file range, no driver materialization) and parses each line
batch with vectorized Arrow kernels:

- triple structure via ONE ``pc.extract_regex`` pass
  (``<iri> <iri> ("literal"|<iri>) .``),
- literal unescaping via the sentinel-ordered replace chain (``\\\\``
  first to a NUL sentinel, so ``\\\\n`` round-trips to backslash-n, not
  newline),
- IRI decoding (strip the ``urn:quickner`` base when present,
  percent-decode on a distinct-bounded dictionary fallback only when a
  ``%`` actually occurs).

Lines the regex rejects (comments, blank lines) are dropped; a
malformed non-comment line raises — silent data loss is worse than a
loud shard. ``\\uXXXX``/``\\UXXXXXXXX`` escapes (valid 1.1, never
emitted by our writer) are handled on a per-distinct-value Python
fallback gated on the substring actually appearing.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_NT_BASE = "urn:quickner"
_LINE_RE = (
    r"^<(?P<s>[^ >]*)> <(?P<p>[^ >]*)> "
    r'(?:"(?P<o>(?:[^"\\]|\\.)*)"|<(?P<oi>[^ >]*)>)'
    r"(?:\^\^<[^ >]*>|@[A-Za-z0-9-]+)? \.\s*$"
)
_SENTINEL = "\x00"


def _unescape_literal(col: pa.Array) -> pa.Array:
    """Reverse of sinks._nt_escape. ``\\\\`` must resolve FIRST (to a
    sentinel) so ``\\\\n`` yields backslash+n, not newline."""
    out = pc.replace_substring(col, "\\\\", _SENTINEL)
    out = pc.replace_substring(out, '\\"', '"')
    out = pc.replace_substring(out, "\\n", "\n")
    out = pc.replace_substring(out, "\\r", "\r")
    out = pc.replace_substring(out, "\\t", "\t")
    out = pc.replace_substring(out, _SENTINEL, "\\")
    # \uXXXX / \UXXXXXXXX: valid N-Triples 1.1 we never emit — decode on a
    # distinct-bounded Python fallback only if one actually appears
    has_u = pc.any(
        pc.or_(
            pc.match_substring(out, "\\u"), pc.match_substring(out, "\\U")
        )
    ).as_py()
    if has_u:
        import re

        u_re = re.compile(r"\\u([0-9A-Fa-f]{4})|\\U([0-9A-Fa-f]{8})")

        def u_sub(v: str) -> str:
            return u_re.sub(lambda m: chr(int(m.group(1) or m.group(2), 16)), v)

        enc = pc.dictionary_encode(out)
        dec = pa.array(
            [u_sub(v) for v in enc.dictionary.to_pylist()], type=pa.string()
        )
        out = dec.take(enc.indices)
    return out


def _decode_iri(col: pa.Array, *, strip_seg: str) -> pa.Array:
    """Strip ``urn:quickner:<seg>:`` when present (round-trip with our
    writer), percent-decode only when needed, pass foreign IRIs through."""
    prefix = f"{_NT_BASE}:{strip_seg}:"
    ours = pc.starts_with(col, prefix)
    stripped = pc.if_else(
        ours, pc.utf8_slice_codeunits(col, len(prefix)), col
    )
    if not pc.any(pc.match_substring(stripped, "%")).as_py():
        return stripped
    from urllib.parse import unquote

    enc = pc.dictionary_encode(stripped)
    dec = pa.array(
        [unquote(v) if "%" in v else v for v in enc.dictionary.to_pylist()],
        type=pa.string(),
    )
    return dec.take(enc.indices)


def parse_ntriples_batch(b: pa.Table, *, text_col: str = "text") -> pa.Table:
    """(text) line batch -> (subj, pred, obj, obj_is_iri) triple batch."""
    empty = pa.table(
        {
            "subj": pa.array([], type=pa.string()),
            "pred": pa.array([], type=pa.string()),
            "obj": pa.array([], type=pa.string()),
            "obj_is_iri": pa.array([], type=pa.bool_()),
        }
    )
    if b.num_rows == 0:
        return empty
    lines = b.column(text_col)
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    lines = pc.cast(lines, pa.string())
    m = pc.extract_regex(lines, _LINE_RE)
    ok = pc.is_valid(m)
    if not pc.all(ok).as_py():
        bad = lines.filter(pc.invert(ok))
        real = [
            v
            for v in bad.to_pylist()
            if v is not None and v.strip() and not v.lstrip().startswith("#")
        ]
        if real:
            raise ValueError(f"malformed N-Triples line: {real[0]!r}")
        m = m.filter(ok)
    s = pc.struct_field(m, "s")
    p = pc.struct_field(m, "p")
    o_lit = pc.struct_field(m, "o")
    o_iri = pc.struct_field(m, "oi")
    # extract_regex fills NON-participating groups with "" (not null): an
    # object is an IRI iff the <...> alternative captured something (a
    # valid N-Triples IRI is never empty)
    is_iri = pc.not_equal(pc.fill_null(o_iri, ""), "")
    obj = pc.if_else(
        is_iri,
        _decode_iri(pc.fill_null(o_iri, ""), strip_seg="doc"),
        _unescape_literal(pc.fill_null(o_lit, "")),
    )
    return pa.table(
        {
            "subj": _decode_iri(s, strip_seg="doc"),
            "pred": _decode_iri(p, strip_seg="pred"),
            "obj": obj,
            "obj_is_iri": is_iri,
        }
    )


def read_ntriples(paths, **read_text_kwargs):
    """Directory / file list of ``.nt`` shards -> Dataset(subj, pred, obj,
    obj_is_iri). Streaming: read_text blocks -> one vectorized parse
    map_batches; nothing touches the driver."""
    import ray.data as rd

    ds = rd.read_text(paths, file_extensions=["nt"], **read_text_kwargs)
    return ds.map_batches(parse_ntriples_batch, batch_format="pyarrow")


_NQ_LINE_RE = (
    r"^<(?P<s>[^ >]*)> <(?P<p>[^ >]*)> "
    r'(?:"(?P<o>(?:[^"\\]|\\.)*)"|<(?P<oi>[^ >]*)>)'
    r"(?:\^\^<[^ >]*>|@[A-Za-z0-9-]+)?"
    r"(?: <(?P<g>[^ >]*)>)? \.\s*$"
)


def parse_nquads_batch(b: pa.Table, *, text_col: str = "text") -> pa.Table:
    """(text) line batch -> (subj, pred, obj, obj_is_iri, graph) quad
    batch. The graph term is optional per line (N-Quads 1.1: a quad
    without a graph label is a default-graph statement) — absent graphs
    surface as ``''`` (empty string, never null, matching the engine's
    null-free binding model)."""
    empty = pa.table(
        {
            "subj": pa.array([], type=pa.string()),
            "pred": pa.array([], type=pa.string()),
            "obj": pa.array([], type=pa.string()),
            "obj_is_iri": pa.array([], type=pa.bool_()),
            "graph": pa.array([], type=pa.string()),
        }
    )
    if b.num_rows == 0:
        return empty
    lines = b.column(text_col)
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    lines = pc.cast(lines, pa.string())
    m = pc.extract_regex(lines, _NQ_LINE_RE)
    ok = pc.is_valid(m)
    if not pc.all(ok).as_py():
        bad = lines.filter(pc.invert(ok))
        real = [
            v
            for v in bad.to_pylist()
            if v is not None and v.strip() and not v.lstrip().startswith("#")
        ]
        if real:
            raise ValueError(f"malformed N-Quads line: {real[0]!r}")
        m = m.filter(ok)
    s = pc.struct_field(m, "s")
    p = pc.struct_field(m, "p")
    o_lit = pc.struct_field(m, "o")
    o_iri = pc.struct_field(m, "oi")
    g = pc.fill_null(pc.struct_field(m, "g"), "")
    is_iri = pc.not_equal(pc.fill_null(o_iri, ""), "")
    obj = pc.if_else(
        is_iri,
        _decode_iri(pc.fill_null(o_iri, ""), strip_seg="doc"),
        _unescape_literal(pc.fill_null(o_lit, "")),
    )
    return pa.table(
        {
            "subj": _decode_iri(s, strip_seg="doc"),
            "pred": _decode_iri(p, strip_seg="pred"),
            "obj": obj,
            "obj_is_iri": is_iri,
            "graph": _decode_iri(g, strip_seg="graph"),
        }
    )


def read_nquads(paths, **read_text_kwargs):
    """Directory / file list of ``.nq`` shards -> Dataset(subj, pred,
    obj, obj_is_iri, graph). Same streaming shape as read_ntriples; plain
    ``.nt`` content parses too (every graph ``''``)."""
    import ray.data as rd

    ds = rd.read_text(paths, file_extensions=["nq", "nt"], **read_text_kwargs)
    return ds.map_batches(parse_nquads_batch, batch_format="pyarrow")
