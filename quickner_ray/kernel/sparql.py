"""A small SPARQL SELECT front-end for the BGP/path engine.

Parses the conjunctive core of SPARQL 1.1 SELECT — the query language a
KG built by this pipeline is served through — into the argument shape of
``stages/bgp.bgp_match``:

    SELECT ?doc ?op WHERE {
      ?doc :SYSTEM :e4f0...c1 .
      ?doc :OPERATOR ?op .
      OPTIONAL { ?doc :UNIT ?u . }
      FILTER NOT EXISTS { ?doc :PHRASE ?p . }
    }

Supported: variables (``?name``), prefixed constants (``:value`` — the
leading colon marks an IRI-ish constant, stripped to its local part),
quoted string constants, triple patterns terminated by ``.``, any number
of OPTIONAL { ... } and FILTER NOT EXISTS { ... } groups (each holding
one or more patterns), comments (``#`` to end of line), and SELECT
projection with ``*`` or an explicit variable list. DISTINCT is implied
(bgp_match returns distinct bindings — stated in its contract).

Deliberately NOT a full grammar: no UNION/GRAPH/SERVICE/BIND, no literal
datatypes — parity target is the engine underneath, and unsupported
syntax raises ``SparqlError`` loudly rather than mis-parsing. Pure
string processing: no Ray, no reference counterpart (quickner has no
query layer).
"""

from __future__ import annotations

import re

__all__ = ["SparqlError", "parse_select", "run_select"]


class SparqlError(ValueError):
    """Raised on any syntax the mini-grammar does not support."""


_TOKEN = re.compile(
    r"""\s*(?:
        (?P<punct>[{}.])
      | (?P<str>"(?:[^"\\]|\\.)*")
      | (?P<word>[^\s{}."]+)
    )""",
    re.VERBOSE,
)


def _tokens(text: str):
    # strip comments first: '#' to end of line (not inside quotes — the
    # mini-grammar forbids '#' in quoted constants for simplicity)
    lines = []
    for ln in text.split("\n"):
        q = False
        out = []
        for ch in ln:
            if ch == '"':
                q = not q
            if ch == "#" and not q:
                break
            out.append(ch)
        lines.append("".join(out))
    text = "\n".join(lines)
    pos = 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip():
                raise SparqlError(f"cannot tokenize at: {text[pos:pos+30]!r}")
            return
        pos = m.end()
        tok = m.group("punct") or m.group("str") or m.group("word")
        if tok:
            yield tok


PLUS_DEFAULT_HOPS = 6  # SPARQL '+' is unbounded; the engine hop-bounds it

_STEP = re.compile(r"^(\^?):([^\^/|+{}]+)(\+(\d*))?$")


def parse_path(tok: str):
    """Predicate-position path expression -> stages/paths.eval_path tuple.

    Grammar (whitespace-free, one token): alternation ``a|b`` (lowest),
    sequence ``a/b``, and per step an optional leading ``^`` (inverse)
    and optional trailing ``+`` (closure, hop-bounded at
    PLUS_DEFAULT_HOPS) or ``+H`` with an explicit hop bound (SPARQL 1.1
    dropped {n,m}; the engine's closure is hop-bounded by design, so the
    bound is part of the syntax). No parentheses — compose in the engine
    API when precedence needs overriding."""

    def step(s: str):
        m = _STEP.match(s)
        if not m:
            raise SparqlError(f"bad path step {s!r}")
        inv, name, suffix, hops = m.groups()
        e = ("pred", name)
        if inv:
            e = ("inv", e)
        if suffix:
            h = int(hops) if hops else PLUS_DEFAULT_HOPS
            if h < 1:
                raise SparqlError(f"path bound must be >= 1 in {s!r}")
            e = ("plus", e, h)
        return e

    def seq(s: str):
        parts = s.split("/")
        if any(not p for p in parts):
            raise SparqlError(f"empty sequence step in {s!r}")
        e = step(parts[-1])
        for p in reversed(parts[:-1]):
            e = ("seq", step(p), e)
        return e

    alts = tok.split("|")
    if any(not a for a in alts):
        raise SparqlError(f"empty alternation branch in {tok!r}")
    e = seq(alts[-1])
    for a in reversed(alts[:-1]):
        e = ("alt", seq(a), e)
    return e


def _is_path_token(tok: str) -> bool:
    return tok.startswith((":", "^")) and any(c in tok for c in "/|^+")


def _term(tok: str) -> str:
    """Token -> bgp_match term: '?x' stays a variable; ':local' and
    quoted strings become constants."""
    if tok.startswith("?"):
        if len(tok) == 1:
            raise SparqlError("bare '?' is not a variable")
        return tok
    if tok.startswith(":"):
        if len(tok) == 1:
            raise SparqlError("bare ':' is not a constant")
        return tok[1:]
    if tok.startswith('"') and tok.endswith('"') and len(tok) >= 2:
        return tok[1:-1].replace('\\"', '"').replace("\\\\", "\\")
    raise SparqlError(
        f"term {tok!r} must be a ?variable, :constant or \"string\""
    )


def _pattern(cur: list[str]) -> tuple:
    """Three tokens -> a bgp_match pattern; a path expression in the
    predicate position compiles to its eval_path tuple (endpoints must be
    variables — enforced by the engine)."""
    s, p, o = cur
    if _is_path_token(p):
        return (_term(s), parse_path(p), _term(o))
    return (_term(s), _term(p), _term(o))


def _parse_group(toks: list[str], i: int) -> tuple[list[tuple], int]:
    """Parse '{ pattern . pattern . ... }' starting at toks[i] == '{'."""
    if i >= len(toks) or toks[i] != "{":
        raise SparqlError("expected '{'")
    i += 1
    pats: list[tuple] = []
    cur: list[str] = []
    while i < len(toks):
        t = toks[i]
        if t == "}":
            if cur:
                raise SparqlError(
                    f"unterminated pattern before '}}': {cur!r} (missing '.')"
                )
            return pats, i + 1
        if t == ".":
            if len(cur) != 3:
                raise SparqlError(f"pattern needs 3 terms, got {cur!r}")
            pats.append(_pattern(cur))
            cur = []
        elif t == "{":
            raise SparqlError("nested groups are not supported here")
        else:
            cur.append(t)
            if len(cur) > 3:
                raise SparqlError(f"pattern has more than 3 terms: {cur!r}")
        i += 1
    raise SparqlError("unterminated '{' group")


def parse_select(query: str) -> dict:
    """SPARQL SELECT text -> {'project': [vars] | None, 'patterns': [...],
    'optional': [...], 'not_exists': [...]} — the bgp_match argument shape
    (project None == SELECT *, meaning every bound variable)."""
    toks = list(_tokens(query))
    if not toks or toks[0].upper() != "SELECT":
        raise SparqlError("query must start with SELECT")
    i = 1
    if i < len(toks) and toks[i].upper() == "DISTINCT":
        i += 1  # bindings are always distinct; accept and ignore
    project: list[str] | None = []
    if i < len(toks) and toks[i] == "*":
        project = None
        i += 1
    else:
        while i < len(toks) and toks[i].startswith("?"):
            project.append(toks[i][1:])
            i += 1
        if not project:
            raise SparqlError("SELECT needs '*' or at least one ?variable")
    if i >= len(toks) or toks[i].upper() != "WHERE":
        raise SparqlError("expected WHERE")
    i += 1
    if i >= len(toks) or toks[i] != "{":
        raise SparqlError("expected '{' after WHERE")
    i += 1

    patterns: list[tuple] = []
    optional: list[tuple] = []
    not_exists: list[tuple] = []
    cur: list[str] = []
    while i < len(toks):
        t = toks[i]
        up = t.upper()
        if t == "}":
            if cur:
                raise SparqlError(
                    f"unterminated pattern before '}}': {cur!r} (missing '.')"
                )
            i += 1
            if i != len(toks):
                raise SparqlError(f"trailing tokens after '}}': {toks[i:]!r}")
            if not patterns:
                raise SparqlError("WHERE has no required patterns")
            return {
                "project": project,
                "patterns": patterns,
                "optional": optional,
                "not_exists": not_exists,
            }
        if up == "OPTIONAL" and not cur:
            grp, i = _parse_group(toks, i + 1)
            optional.extend(grp)
            continue
        if up == "FILTER" and not cur:
            if (
                i + 2 < len(toks)
                and toks[i + 1].upper() == "NOT"
                and toks[i + 2].upper() == "EXISTS"
            ):
                grp, i = _parse_group(toks, i + 3)
                not_exists.extend(grp)
                continue
            raise SparqlError("only FILTER NOT EXISTS { ... } is supported")
        if t == ".":
            if len(cur) != 3:
                raise SparqlError(f"pattern needs 3 terms, got {cur!r}")
            patterns.append(_pattern(cur))
            cur = []
        elif t == "{":
            raise SparqlError("bare nested groups are not supported")
        else:
            cur.append(t)
            if len(cur) > 3:
                raise SparqlError(f"pattern has more than 3 terms: {cur!r}")
        i += 1
    raise SparqlError("unterminated WHERE group")


def run_select(triples, query: str, **bgp_kwargs):
    """Parse ``query`` and evaluate it with stages/bgp.bgp_match; project
    to the SELECTed variables (DISTINCT bindings re-deduped after a
    narrowing projection)."""
    from ray.data.aggregate import Count

    from ..stages.bgp import bgp_match

    q = parse_select(query)
    out = bgp_match(
        triples,
        q["patterns"],
        optional=tuple(q["optional"]),
        not_exists=tuple(q["not_exists"]),
        **bgp_kwargs,
    )
    if q["project"] is None:
        return out
    cols = list(q["project"])
    missing = [c for c in cols if c not in out.schema().names]
    if missing:
        raise SparqlError(f"SELECT of unbound variables: {missing}")
    if set(cols) == set(out.schema().names):
        return out.select_columns(cols)
    return (  # narrowing projection: re-dedup for DISTINCT semantics
        out.select_columns(cols)
        .groupby(cols)
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )
