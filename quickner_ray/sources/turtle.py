"""Turtle (.ttl) subset reader — prefix-abbreviated RDF ingest.

Real-world KG dumps (DBpedia, Wikidata subsets, schema.org crawls) ship as
Turtle far more often than N-Triples; this reader adds the ingest format
next to sources/ntriples.py. Turtle is STATEFUL across lines (``@prefix``
declarations scope the whole file; statements span lines via ``;`` / ``,``
continuation), so the unit of parallelism is the FILE, not the line:
``ray.data.read_binary_files`` hands each shard to one task and the parser
runs per file — the standard shape for many-shard RDF dumps (one task per
shard, no cross-file state, no driver materialization).

Supported subset (everything the common dump exports use):
- ``@prefix ns: <iri> .`` and ``@base`` declarations (SPARQL-style
  ``PREFIX`` lines too),
- prefixed names (``ns:local``), absolute IRIs (``<...>``),
- the ``a`` keyword (rdf:type),
- predicate lists (``;``) and object lists (``,``),
- string literals with N-Triples escapes, optional ``@lang`` / ``^^type``
  tags (tags dropped, value kept — same policy as the N-Triples reader),
- numeric/boolean bare literals, ``#`` comments.

NOT supported, rejected loudly (silent loss is worse): blank nodes
(``[]``/``_:``), collections ``( )``, multi-line ``\"\"\"`` literals.

Reference: n/a — no counterpart (the reference reads CSV/JSONL only;
format-breadth extension for RDF ingest).
"""

from __future__ import annotations

import re

import pyarrow as pa

# ``^^`` is its own token (so ``"v"^^<iri>`` yields str + dtype + iri) and
# the word group consumes the run AFTER each internal dot — decimal literals
# ("1.5"), dotted local names ("ex:foo.bar") and dotted IRIs inside datatype
# tags all stay one token, while a statement-terminating "." (dot followed by
# whitespace/EOF/punct) still tokenizes as punct.
_TOKEN_RE = re.compile(
    r"""
    (?P<comment>\#[^\n]*)
  | (?P<str>"(?:[^"\\]|\\.)*")
  | (?P<iri><[^>\s]*>)
  | (?P<dtype>\^\^)
  | (?P<punct>[;,.\[\]()])
  | (?P<word>[^\s;,.\[\]()^]+(?:\.[^\s;,.\[\]()^]+)*)
    """,
    re.VERBOSE,
)

_UNESC = {
    "\\\\": "\x00",
    '\\"': '"',
    "\\n": "\n",
    "\\r": "\r",
    "\\t": "\t",
}


def _unescape(v: str) -> str:
    for k, r in _UNESC.items():
        v = v.replace(k, r)
    v = re.sub(
        r"\\u([0-9A-Fa-f]{4})|\\U([0-9A-Fa-f]{8})",
        lambda m: chr(int(m.group(1) or m.group(2), 16)),
        v,
    )
    return v.replace("\x00", "\\")


class TurtleError(ValueError):
    pass


def parse_turtle(text: str) -> list[tuple[str, str, str]]:
    """One .ttl document -> [(subj, pred, obj)] in statement order."""
    toks: list[str] = []
    for m in _TOKEN_RE.finditer(text):
        if m.lastgroup == "comment":
            continue
        toks.append(m.group(0))

    prefixes: dict[str, str] = {}
    base = ""

    def term(tok: str) -> str:
        if tok.startswith("<") and tok.endswith(">"):
            iri = tok[1:-1]
            return base + iri if base and not re.match(r"^[a-z][a-z0-9+.-]*:", iri, re.I) else iri
        if tok.startswith('"'):
            return _unescape(tok[1:-1])
        if tok == "a":
            return "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
        if tok.startswith("_:") or tok in ("[", "]", "(", ")"):
            raise TurtleError(f"unsupported Turtle construct: {tok!r}")
        if ":" in tok:
            ns, local = tok.split(":", 1)
            if ns not in prefixes:
                raise TurtleError(f"undeclared prefix {ns!r} in {tok!r}")
            return prefixes[ns] + local
        # bare numeric / boolean literal
        if re.fullmatch(r"[+-]?\d+(\.\d+)?([eE][+-]?\d+)?|true|false", tok):
            return tok
        raise TurtleError(f"unparseable term {tok!r}")

    out: list[tuple[str, str, str]] = []
    i, n = 0, len(toks)
    while i < n:
        t = toks[i]
        low = t.lower()
        if low in ("@prefix", "prefix"):
            if i + 2 >= n or not toks[i + 1].endswith(":") or not toks[i + 2].startswith("<"):
                raise TurtleError(f"malformed @prefix at token {i}")
            prefixes[toks[i + 1][:-1]] = toks[i + 2][1:-1]
            i += 3
            if i < n and toks[i] == ".":  # @prefix takes '.', PREFIX doesn't
                i += 1
            continue
        if low in ("@base", "base"):
            if i + 1 >= n or not toks[i + 1].startswith("<"):
                raise TurtleError("malformed @base")
            base = toks[i + 1][1:-1]
            i += 2
            if i < n and toks[i] == ".":
                i += 1
            continue
        # statement: subject predicateObjectList ('.'),
        # with ';' predicate continuation and ',' object continuation
        subj = term(t)
        i += 1
        while True:
            if i >= n:
                raise TurtleError("unterminated statement (missing '.')")
            pred = term(toks[i])
            i += 1
            while True:
                if i >= n:
                    raise TurtleError("unterminated object list")
                tok = toks[i]
                # strip literal tags: "v"@lang / "v"^^<type> arrive as the
                # string token followed by a word token starting @ / ^^
                obj = term(tok)
                i += 1
                if i < n and tok.startswith('"'):
                    if toks[i] == "^^":
                        # datatype tag: skip '^^' plus the IRI/prefixed name
                        i += 1
                        if i >= n:
                            raise TurtleError("dangling '^^' datatype tag")
                        i += 1
                    elif toks[i].startswith("@"):
                        i += 1
                out.append((subj, pred, obj))
                if i < n and toks[i] == ",":
                    i += 1
                    continue
                break
            if i < n and toks[i] == ";":
                i += 1
                if i < n and toks[i] == ".":  # trailing ';' before '.'
                    i += 1
                    break
                continue
            if i < n and toks[i] == ".":
                i += 1
                break
            raise TurtleError(
                f"expected ';' ',' or '.' after object, got {toks[i] if i < n else 'EOF'!r}"
            )
    return out


def parse_turtle_batch(b: pa.Table, *, bytes_col: str = "bytes") -> pa.Table:
    col = b.column(bytes_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    subs: list[str] = []
    preds: list[str] = []
    objs: list[str] = []
    for buf in col.to_pylist():
        if buf is None:
            continue
        for s, p, o in parse_turtle(
            buf.decode("utf-8") if isinstance(buf, (bytes, bytearray)) else str(buf)
        ):
            subs.append(s)
            preds.append(p)
            objs.append(o)
    return pa.table(
        {
            "subj": pa.array(subs, type=pa.string()),
            "pred": pa.array(preds, type=pa.string()),
            "obj": pa.array(objs, type=pa.string()),
        }
    )


def read_turtle(paths, **read_kwargs):
    """Stream .ttl shard files -> Dataset(subj, pred, obj). One parse task
    per file (Turtle state never crosses files)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, **read_kwargs)
    return ds.map_batches(parse_turtle_batch, batch_format="pyarrow")
