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
one or more patterns), comments (``#`` to end of line), SELECT
projection with ``*`` or an explicit variable list, the SPARQL 1.1
aggregate set COUNT/SUM/MIN/MAX/AVG/SAMPLE/GROUP_CONCAT (with DISTINCT
and ``; SEPARATOR=``) under GROUP BY / HAVING, FILTER expressions
(comparisons = != < > <= >=, regex/strStarts/strEnds/contains, && || !
and parentheses, over variables, constants and the value functions),
BIND with STRLEN/UCASE/LCASE/CONCAT/SUBSTR value expressions, ORDER BY
/ LIMIT / OFFSET paging, UNION, MINUS, VALUES, and GRAPH groups over
quad streams (``GRAPH ?g { ... }`` binds, ``GRAPH :name { ... }``
restricts; ungrouped patterns match any graph — the
union-default-graph configuration).
DISTINCT is implied (bgp_match returns distinct bindings — stated in
its contract).

Subqueries (``{ SELECT ... }`` inside WHERE) evaluate independently and
join the outer group on shared variables, their results re-entering the
binding model as string terms.

Deliberately NOT a full grammar: no SERVICE/federation, no literal
datatypes — parity target is the engine underneath, and unsupported
syntax raises ``SparqlError`` loudly rather than mis-parsing. Pure
string processing: no Ray, no reference counterpart (quickner has no
query layer).
"""

from __future__ import annotations

import re

import pyarrow as pa

__all__ = [
    "SparqlError",
    "parse_select",
    "parse_update",
    "parse_update_request",
    "run_ask",
    "run_construct",
    "run_describe",
    "run_select",
    "run_update_triples",
]


class SparqlError(ValueError):
    """Raised on any syntax the mini-grammar does not support."""


class SparqlGraphStoreError(SparqlError):
    """A graph-management verb (CLEAR/DROP/CREATE GRAPH, WITH scoping,
    GRAPH data blocks) aimed at a store that cannot honor it — the
    single-graph permutation store raises this and points at the quad
    store executor (serving.quad_update)."""


_TOKEN = re.compile(
    r"""\s*(?:
        (?P<punct>[{}.(),])
      | (?P<str>"(?:[^"\\]|\\.)*")
      | (?P<iri><[^>\s]+>)
      | (?P<word>[^\s{}."(),]+)
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
        tok = (
            m.group("punct") or m.group("str") or m.group("iri")
            or m.group("word")
        )
        if tok:
            yield tok


# SPARQL 1.1 '+'/'*' are unbounded: a bare postfix compiles to the
# TO-FIXPOINT closure (stages/paths.min_hops_closure max_hops=None);
# an explicit digit bound (':A+3') keeps the hop-windowed form.
PLUS_DEFAULT_HOPS = None

_PATH_STOP = set("^/|+*?()!{}")  # chars that end a :name inside a path


def parse_path(tok: str):
    """Predicate-position path expression -> stages/paths.eval_path tuple.

    Grammar (whitespace-free, one token; recursive descent, SPARQL 1.1
    precedence):

        alt     := seq ('|' seq)*                       lowest
        seq     := unary ('/' unary)*
        unary   := '^'? primary postfix?
        primary := ':'name | '(' alt ')'
                 | '!' ':'name | '!(' ':'name ('|' ':'name)* ')'
        postfix := '+' H? | '*' H? | '?'

    Bare ``+``/``*`` closures are UNBOUNDED (SPARQL 1.1 semantics —
    evaluated to fixpoint with frontier-size gating); an explicit ``H``
    digit bound (``:A+3``) selects the hop-windowed form (SPARQL 1.1
    dropped {n,m}; the digit postfix is this grammar's replacement).
    ``!`` negated sets take forward predicate names only.
    ``^`` binds tighter than a postfix (``^:p+`` closes the inverse
    step, matching the pre-parenthesis grammar this replaces)."""
    s = tok
    pos = 0

    def peek() -> str:
        return s[pos] if pos < len(s) else ""

    def expect(c: str):
        nonlocal pos
        if peek() != c:
            raise SparqlError(f"expected {c!r} at {pos} in path {tok!r}")
        pos += 1

    def name() -> str:
        nonlocal pos
        expect(":")
        start = pos
        while pos < len(s) and s[pos] not in _PATH_STOP:
            pos += 1
        if pos == start:
            raise SparqlError(f"empty predicate name at {start} in {tok!r}")
        return s[start:pos]

    def hop_bound(op: str) -> int | None:
        nonlocal pos
        start = pos
        while pos < len(s) and s[pos].isdigit():
            pos += 1
        if pos == start:
            return None  # bare '+'/'*': unbounded fixpoint closure
        h = int(s[start:pos])
        if h < 1:
            raise SparqlError(f"path bound must be >= 1 after {op!r} in {tok!r}")
        return h

    def primary():
        nonlocal pos
        c = peek()
        if c == "(":
            pos += 1
            e = alt()
            expect(")")
            return e
        if c == "!":
            pos += 1
            if peek() == "(":
                pos += 1
                labels = [name()]
                while peek() == "|":
                    pos += 1
                    labels.append(name())
                expect(")")
                return ("neg", tuple(labels))
            return ("neg", (name(),))
        if c == ":":
            return ("pred", name())
        raise SparqlError(f"bad path primary at {pos} in {tok!r}")

    def unary():
        nonlocal pos
        inv = peek() == "^"
        if inv:
            pos += 1
        e = primary()
        if inv:
            e = ("inv", e)
        c = peek()
        if c == "+":
            pos += 1
            e = ("plus", e, hop_bound("+"))
        elif c == "*":
            pos += 1
            e = ("star", e, hop_bound("*"))
        elif c == "?":
            pos += 1
            e = ("opt", e)
        return e

    def seq():
        e = unary()
        while peek() == "/":
            nonlocal_advance()
            e = ("seq", e, unary())
        return e

    def nonlocal_advance():
        nonlocal pos
        pos += 1

    def alt():
        e = seq()
        while peek() == "|":
            nonlocal_advance()
            e = ("alt", e, seq())
        return e

    e = alt()
    if pos != len(s):
        raise SparqlError(f"trailing {s[pos:]!r} in path {tok!r}")
    return e


def _is_path_token(tok: str) -> bool:
    if tok.startswith(("!", "(")):
        return True
    return tok.startswith((":", "^")) and any(c in tok for c in "/|^+*?(")


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


def _graph_term(tok: str) -> str:
    """A graph IRI in verb position: ``<iri>`` (angle form), ``:name`` or
    a quoted string — never a variable (graph-management verbs take
    constants)."""
    if tok.startswith("<") and tok.endswith(">") and len(tok) > 2:
        return tok[1:-1]
    term = _term(tok)
    if term.startswith("?"):
        raise SparqlError(f"graph target must be a constant, got {tok!r}")
    return term


def _pattern(cur: list[str]) -> tuple:
    """Three tokens -> a bgp_match pattern; a path expression in the
    predicate position compiles to its eval_path tuple (endpoints must be
    variables — enforced by the engine)."""
    s, p, o = cur
    if _is_path_token(p):
        return (_term(s), parse_path(p), _term(o))
    return (_term(s), _term(p), _term(o))


_PATH_POSTFIX = re.compile(r"[+*?]\d*")


def _path_starts_at(toks: list[str], i: int, cur: list[str]) -> bool:
    """True when toks[i] begins a parenthesized/negated path in the
    PREDICATE position (subject already collected). The tokenizer splits
    '(' / ')' off as punctuation, so '(:A/:B)*2' arrives as four tokens
    that must be re-joined before parse_path sees them."""
    if len(cur) != 1:
        return False
    t = toks[i]
    return t == "(" or (t == "!" and i + 1 < len(toks) and toks[i + 1] == "(")


def _join_path_tokens(toks: list[str], i: int) -> tuple[str, int]:
    """Re-join a tokenizer-split path starting at toks[i] ('(' or '!')
    through its balanced close paren, plus one optional postfix token
    ('+H' / '*H' / '?'); paths are whitespace-free by grammar, so plain
    concatenation reconstructs the original text. Returns (token, next_i)."""
    parts: list[str] = []
    depth = 0
    while i < len(toks):
        t = toks[i]
        parts.append(t)
        i += 1
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
            if depth == 0:
                if i < len(toks) and _PATH_POSTFIX.fullmatch(toks[i]):
                    parts.append(toks[i])
                    i += 1
                return "".join(parts), i
        elif depth == 0 and t != "!":
            break
    raise SparqlError(f"unbalanced '(' in path near {' '.join(parts)!r}")


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
        elif _path_starts_at(toks, i, cur):
            tok, i = _join_path_tokens(toks, i)
            cur.append(tok)
            continue
        else:
            cur.append(t)
            if len(cur) > 3:
                raise SparqlError(f"pattern has more than 3 terms: {cur!r}")
        i += 1
    raise SparqlError("unterminated '{' group")


_AGG_FNS = ("COUNT", "SUM", "MIN", "MAX", "AVG", "SAMPLE", "GROUP_CONCAT")

_VFNS = ("STRLEN", "UCASE", "LCASE", "CONCAT", "SUBSTR")
_BFNS = ("REGEX", "STRSTARTS", "STRENDS", "CONTAINS")
_CMP_OPS = ("=", "!=", "<", ">", "<=", ">=")


def _expect(toks: list[str], i: int, tok: str) -> int:
    if i >= len(toks) or toks[i] != tok:
        got = toks[i] if i < len(toks) else "<end>"
        raise SparqlError(f"expected {tok!r}, got {got!r}")
    return i + 1


def _parse_vexpr(toks: list[str], i: int) -> tuple[tuple, int]:
    """Value expression -> AST tuple. Grammar: ?var | :const | "lit" |
    number | STRLEN(v) | UCASE(v) | LCASE(v) | CONCAT(v, v, ...) |
    SUBSTR(v, start[, len]) (1-based, like SPARQL)."""
    if i >= len(toks):
        raise SparqlError("expected a value expression, got end of query")
    t = toks[i]
    up = t.upper()
    if up in _VFNS:
        i = _expect(toks, i + 1, "(")
        if up in ("STRLEN", "UCASE", "LCASE"):
            inner, i = _parse_vexpr(toks, i)
            i = _expect(toks, i, ")")
            return (up.lower(), inner), i
        if up == "CONCAT":
            args = []
            a, i = _parse_vexpr(toks, i)
            args.append(a)
            while i < len(toks) and toks[i] == ",":
                a, i = _parse_vexpr(toks, i + 1)
                args.append(a)
            i = _expect(toks, i, ")")
            return ("concat", tuple(args)), i
        # SUBSTR(v, start[, len])
        inner, i = _parse_vexpr(toks, i)
        i = _expect(toks, i, ",")
        if i >= len(toks) or not toks[i].isdigit() or int(toks[i]) < 1:
            raise SparqlError("SUBSTR start must be a positive integer")
        start = int(toks[i])
        i += 1
        length = None
        if i < len(toks) and toks[i] == ",":
            i += 1
            if i >= len(toks) or not toks[i].isdigit():
                raise SparqlError("SUBSTR length must be an integer")
            length = int(toks[i])
            i += 1
        i = _expect(toks, i, ")")
        return ("substr", inner, start, length), i
    if t.startswith("?"):
        if len(t) == 1:
            raise SparqlError("bare '?' is not a variable")
        return ("var", t[1:]), i + 1
    if t.startswith(":") or t.startswith('"'):
        return ("lit", _term(t)), i + 1
    try:
        return ("num", float(t)), i + 1
    except ValueError:
        raise SparqlError(f"bad value expression at {t!r}") from None


def _parse_bexpr(toks: list[str], i: int) -> tuple[tuple, int]:
    """Boolean FILTER expression: || over && over ! over primaries;
    primaries are parenthesized expressions, the boolean functions
    regex/strStarts/strEnds/contains(v, v), or comparisons
    ``vexpr <op> vexpr`` (= != string-compare, < > <= >= numeric with a
    loud cast — unless either side is statically numeric, e.g. STRLEN,
    which makes = and != numeric too)."""
    a, i = _parse_band(toks, i)
    while i < len(toks) and toks[i] == "||":
        b, i = _parse_band(toks, i + 1)
        a = ("or", a, b)
    return a, i


def _parse_band(toks: list[str], i: int) -> tuple[tuple, int]:
    a, i = _parse_bunary(toks, i)
    while i < len(toks) and toks[i] == "&&":
        b, i = _parse_bunary(toks, i + 1)
        a = ("and", a, b)
    return a, i


def _parse_bunary(toks: list[str], i: int) -> tuple[tuple, int]:
    if i < len(toks) and toks[i] == "!":
        a, i = _parse_bunary(toks, i + 1)
        return ("not", a), i
    return _parse_bprimary(toks, i)


def _parse_bprimary(toks: list[str], i: int) -> tuple[tuple, int]:
    if i >= len(toks):
        raise SparqlError("expected a FILTER expression, got end of query")
    if toks[i] == "(":
        a, i = _parse_bexpr(toks, i + 1)
        return a, _expect(toks, i, ")")
    if toks[i].upper() in _BFNS:
        fn = toks[i].upper().lower()
        i = _expect(toks, i + 1, "(")
        v, i = _parse_vexpr(toks, i)
        i = _expect(toks, i, ",")
        p, i = _parse_vexpr(toks, i)
        i = _expect(toks, i, ")")
        if _ast_vars(p):
            raise SparqlError(f"{fn} pattern must be a constant")
        return ("fn", fn, v, p), i
    l, i = _parse_vexpr(toks, i)
    if i >= len(toks) or toks[i] not in _CMP_OPS:
        got = toks[i] if i < len(toks) else "<end>"
        raise SparqlError(
            f"expected comparison operator, got {got!r} (supported FILTERs: "
            f"comparisons, {'/'.join(_BFNS)}, && || ! and parentheses)"
        )
    op = toks[i]
    r, i = _parse_vexpr(toks, i + 1)
    if op in ("<", ">", "<=", ">=") or "num" in (
        _vexpr_kind(l), _vexpr_kind(r)
    ):
        # numeric comparison: literal sides must parse as numbers NOW —
        # fail at parse time, not mid-stream
        for side in (l, r):
            if side[0] == "lit":
                try:
                    float(side[1])
                except ValueError:
                    raise SparqlError(
                        f"numeric FILTER needs a number, got {side[1]!r}"
                    ) from None
    return ("cmp", op, l, r), i


def _ast_vars(ast) -> set[str]:
    if not isinstance(ast, tuple):
        return set()
    if ast[0] == "var":
        return {ast[1]}
    out: set[str] = set()
    for part in ast[1:]:
        if isinstance(part, tuple):
            out |= _ast_vars(part)
        elif isinstance(part, (list,)):
            for p in part:
                out |= _ast_vars(p)
    return out


def _vexpr_kind(ast) -> str:
    """Static type of a value expression: 'num' or 'str'."""
    return "num" if ast[0] in ("num", "strlen") else "str"


def _eval_vexpr(ast, b: "pa.Table"):
    """Value expression AST -> pa array (or scalar for all-literal
    expressions), evaluated with vectorized Arrow kernels only."""
    import pyarrow.compute as pc

    k = ast[0]
    if k == "var":
        return b.column(ast[1])
    if k == "lit":
        return pa.scalar(ast[1], type=pa.string())
    if k == "num":
        return pa.scalar(ast[1], type=pa.float64())
    if k == "strlen":
        return pc.cast(pc.utf8_length(_eval_vexpr(ast[1], b)), pa.int64())
    if k == "ucase":
        return pc.utf8_upper(_eval_vexpr(ast[1], b))
    if k == "lcase":
        return pc.utf8_lower(_eval_vexpr(ast[1], b))
    if k == "concat":
        parts = [_eval_vexpr(a, b) for a in ast[1]]
        # broadcast pure-literal parts; binary_join_element_wise wants
        # equal-length arrays (scalars are accepted in recent Arrow, but
        # normalize for safety)
        n = b.num_rows
        arrs = [
            p if isinstance(p, (pa.Array, pa.ChunkedArray))
            else pa.array([p.as_py()] * n, type=pa.string())
            for p in parts
        ]
        return pc.binary_join_element_wise(*arrs, "")
    assert k == "substr", k
    v = _eval_vexpr(ast[1], b)
    start = ast[2] - 1  # SPARQL is 1-based
    stop = None if ast[3] is None else start + ast[3]
    return pc.utf8_slice_codeunits(v, start, stop)


def _eval_bexpr(ast, b: "pa.Table"):
    """Boolean FILTER AST -> boolean mask array."""
    import pyarrow.compute as pc

    k = ast[0]
    if k == "or":
        return pc.or_(_eval_bexpr(ast[1], b), _eval_bexpr(ast[2], b))
    if k == "and":
        return pc.and_(_eval_bexpr(ast[1], b), _eval_bexpr(ast[2], b))
    if k == "not":
        return pc.invert(_eval_bexpr(ast[1], b))
    if k == "fn":
        _, fn, v, p = ast
        col = _eval_vexpr(v, b)
        pat = _eval_vexpr(p, b)
        if not isinstance(pat, pa.Scalar):
            raise SparqlError(f"{fn} pattern must be a constant")
        pat = pat.as_py()
        if fn == "regex":
            return pc.match_substring_regex(col, pat)
        if fn == "strstarts":
            return pc.starts_with(col, pattern=pat)
        if fn == "strends":
            return pc.ends_with(col, pattern=pat)
        return pc.match_substring(col, pat)
    assert k == "cmp", k
    _, op, l, r = ast
    lv, rv = _eval_vexpr(l, b), _eval_vexpr(r, b)
    numeric = (
        _vexpr_kind(l) == "num"
        or _vexpr_kind(r) == "num"
        or op in ("<", ">", "<=", ">=")
    )
    if numeric:
        # loud cast: a non-numeric binding value raises instead of
        # comparing garbage (same contract as the legacy numeric FILTER)
        def as_num(x):
            if isinstance(x, pa.Scalar):
                if pa.types.is_string(x.type):
                    return pa.scalar(float(x.as_py()), type=pa.float64())
                return pc.cast(x, pa.float64())
            return pc.cast(x, pa.float64())

        lv, rv = as_num(lv), as_num(rv)
    ops = {"=": pc.equal, "!=": pc.not_equal, "<": pc.less,
           ">": pc.greater, "<=": pc.less_equal, ">=": pc.greater_equal}
    return ops[op](lv, rv)


def _parse_agg(toks: list[str], i: int) -> tuple[dict, int]:
    """Parse '( FN ( [DISTINCT] ?v [; SEPARATOR= "s"] ) AS ?alias )' from
    toks[i] == '(' — FN one of COUNT/SUM/MIN/MAX/AVG/SAMPLE/GROUP_CONCAT.
    Determinism contract (the engine is oracle-checked value-exact, so
    SPARQL's implementation-defined choices are pinned): SAMPLE is the
    MINIMUM value; GROUP_CONCAT joins in ascending sorted order; SUM/AVG
    cast bindings to int64 and fail loudly on non-integer values (AVG is
    the float64 quotient of two exact integers)."""
    j = i + 1
    fn = toks[j].upper() if j < len(toks) else ""
    if fn not in _AGG_FNS:
        raise SparqlError(
            f"unsupported aggregate {toks[j:j + 1]!r}; one of {_AGG_FNS}"
        )
    j += 1
    if j >= len(toks) or toks[j] != "(":
        raise SparqlError(f"expected '(' after {fn}")
    j += 1
    distinct = False
    if j < len(toks) and toks[j].upper() == "DISTINCT":
        distinct = True
        j += 1
    if j >= len(toks) or not toks[j].startswith("?") or len(toks[j]) < 2:
        raise SparqlError(f"{fn} needs a ?variable")
    var = toks[j][1:]
    j += 1
    sep = ","
    if j < len(toks) and toks[j].startswith(";"):
        if fn != "GROUP_CONCAT":
            raise SparqlError(f"SEPARATOR is only valid in GROUP_CONCAT")
        # tokenizer shapes: '; SEPARATOR= "x"' / ';SEPARATOR = "x"' ...
        key = toks[j][1:]
        j += 1
        if not key and j < len(toks):
            key = toks[j]
            j += 1
        if key.endswith("="):
            key = key[:-1]
        elif j < len(toks) and toks[j] == "=":
            j += 1
        else:
            raise SparqlError("expected '=' after SEPARATOR")
        if key.upper() != "SEPARATOR":
            raise SparqlError(f"expected SEPARATOR, got {key!r}")
        if j >= len(toks) or not toks[j].startswith('"'):
            raise SparqlError('SEPARATOR takes a quoted string')
        sep = _term(toks[j])
        j += 1
    if j + 2 >= len(toks) or toks[j] != ")" or toks[j + 1].upper() != "AS":
        raise SparqlError("expected ') AS ?alias' in aggregate")
    alias_tok = toks[j + 2]
    if not alias_tok.startswith("?") or len(alias_tok) < 2:
        raise SparqlError("aggregate alias must be a ?variable")
    j += 3
    if j >= len(toks) or toks[j] != ")":
        raise SparqlError("unterminated aggregate projection")
    return {"fn": fn.lower(), "var": var, "distinct": distinct,
            "alias": alias_tok[1:], "sep": sep}, j + 1


def _select_out_vars(sel: dict) -> list[str]:
    """The column names a parsed SELECT evaluates to — statically, so a
    subquery's joinable variables are known without executing it."""
    aliases = [a["alias"] for a in sel["aggs"]]
    if sel["aggs"] and not sel["group_by"]:
        return aliases
    if sel["group_by"]:
        return list(
            dict.fromkeys(
                [*(sel["project"] or sorted(sel["group_by"])), *aliases]
            )
        )
    if sel["project"] is not None:
        return list(sel["project"])
    vs: list[str] = []
    for p in (*sel["patterns"], *sel["optional"]):
        for t in p:
            if isinstance(t, str) and t.startswith("?") and t[1:] not in vs:
                vs.append(t[1:])
    for grp in sel["unions"]:
        for p in grp:
            for t in p:
                if (
                    isinstance(t, str)
                    and t.startswith("?")
                    and t[1:] not in vs
                ):
                    vs.append(t[1:])
    for sub in sel["subqueries"]:
        for v in sub["vars"]:
            if v not in vs:
                vs.append(v)
    for n, _ in sel["binds"]:
        if n not in vs:
            vs.append(n)
    return sorted(vs)


def parse_select(query: str) -> dict:
    """SPARQL SELECT text -> {'project': [vars] | None, 'aggs': [...],
    'patterns': [...], 'optional': [...], 'not_exists': [...],
    'group_by': [...], 'order_by': [(var, desc)], 'limit': int | None} —
    the bgp_match argument shape plus SPARQL 1.1 aggregation and solution
    modifiers (project None == SELECT *, meaning every bound variable)."""
    toks = list(_tokens(query))
    if not toks or toks[0].upper() != "SELECT":
        raise SparqlError("query must start with SELECT")
    i = 1
    if i < len(toks) and toks[i].upper() == "DISTINCT":
        i += 1  # bindings are always distinct; accept and ignore
    project: list[str] | None = []
    aggs: list[dict] = []
    if i < len(toks) and toks[i] == "*":
        project = None
        i += 1
    else:
        while i < len(toks):
            if toks[i].startswith("?") and len(toks[i]) > 1:
                project.append(toks[i][1:])
                i += 1
            elif toks[i] == "(":
                agg, i = _parse_agg(toks, i)
                aggs.append(agg)
            else:
                break
        if not project and not aggs:
            raise SparqlError("SELECT needs '*' or at least one ?variable")
    if i >= len(toks) or toks[i].upper() != "WHERE":
        raise SparqlError("expected WHERE")
    i += 1
    if i >= len(toks) or toks[i] != "{":
        raise SparqlError("expected '{' after WHERE")
    i += 1

    patterns: list[tuple] = []
    optional: list[tuple] = []
    exists_pats: list[tuple] = []
    not_exists: list[tuple] = []
    values: list[tuple[str, list[str]]] = []
    unions: list[list[tuple]] = []
    filters: list[tuple] = []  # boolean-expression ASTs (_parse_bexpr)
    binds: list[tuple[str, tuple]] = []  # (target var, vexpr AST)
    subqueries: list[dict] = []  # {'text': str, 'vars': [out vars]}
    services: list[dict] = []  # {'endpoint': str, 'patterns': [...]}
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
            group_by, order_by, limit, having, offset = _parse_modifiers(
                toks, i
            )
            if unions:
                if patterns:
                    raise SparqlError(
                        "UNION groups cannot mix with top-level patterns"
                    )
                if optional or not_exists or exists_pats:
                    raise SparqlError(
                        "OPTIONAL/EXISTS/NOT EXISTS/MINUS are not "
                        "supported alongside UNION"
                    )
            elif not patterns and not subqueries:
                raise SparqlError("WHERE has no required patterns")
            if services and unions:
                raise SparqlError("SERVICE cannot mix with UNION groups")
            if aggs and not group_by and project:
                raise SparqlError(
                    "non-aggregate SELECT variables need GROUP BY"
                )
            if having and not group_by:
                raise SparqlError("HAVING needs GROUP BY")
            if offset and not order_by:
                raise SparqlError(
                    "OFFSET without ORDER BY is non-deterministic; add a "
                    "sort key"
                )
            if group_by:
                if not aggs:
                    raise SparqlError("GROUP BY needs an aggregate in SELECT")
                if project is None:
                    raise SparqlError("SELECT * cannot be grouped")
                bad = [v for v in project if v not in group_by]
                if bad:
                    raise SparqlError(
                        f"non-grouped variables in SELECT: {bad}"
                    )
            return {
                "project": project,
                "aggs": aggs,
                "patterns": patterns,
                "optional": optional,
                "exists": exists_pats,
                "not_exists": not_exists,
                "values": values,
                "unions": unions,
                "filters": filters,
                "binds": binds,
                "subqueries": subqueries,
                "services": services,
                "group_by": group_by,
                "having": having,
                "order_by": order_by,
                "limit": limit,
                "offset": offset,
            }
        if up == "VALUES" and not cur:
            i += 1
            if i >= len(toks) or not toks[i].startswith("?") or len(toks[i]) < 2:
                raise SparqlError("VALUES needs one ?variable")
            var = toks[i][1:]
            i += 1
            if i >= len(toks) or toks[i] != "{":
                raise SparqlError("expected '{' after VALUES variable")
            i += 1
            consts: list[str] = []
            while i < len(toks) and toks[i] != "}":
                c = _term(toks[i])
                if c.startswith("?"):
                    raise SparqlError("VALUES rows must be constants")
                consts.append(c)
                i += 1
            if i >= len(toks):
                raise SparqlError("unterminated VALUES group")
            if not consts:
                raise SparqlError("VALUES needs at least one constant")
            values.append((var, consts))
            i += 1
            continue
        if (
            t == "{"
            and not cur
            and i + 1 < len(toks)
            and toks[i + 1].upper() == "SELECT"
        ):
            # subquery: '{ SELECT ... }' — evaluated independently, its
            # projected bindings join the outer group on shared variables
            # (results re-enter the binding model as string terms)
            depth, j = 1, i + 1
            while j < len(toks) and depth:
                if toks[j] == "{":
                    depth += 1
                elif toks[j] == "}":
                    depth -= 1
                j += 1
            if depth:
                raise SparqlError("unterminated subquery")
            text = " ".join(toks[i + 1:j - 1])
            sub = parse_select(text)  # fail HERE, not mid-stream
            subqueries.append({"text": text, "vars": _select_out_vars(sub)})
            i = j
            continue
        if t == "{" and not cur and not patterns and not unions:
            # '{ groupA } UNION { groupB } [UNION ...]' — branch bindings
            # union (each branch a plain pattern group; OPTIONAL / FILTER
            # NOT EXISTS go inside neither — scoped out loudly below)
            grp, i = _parse_group(toks, i)
            unions.append(grp)
            while i < len(toks) and toks[i].upper() == "UNION":
                grp, i = _parse_group(toks, i + 1)
                unions.append(grp)
            if len(unions) < 2:
                raise SparqlError("a bare group needs UNION branches")
            continue
        if up == "MINUS" and not cur:
            # SPARQL MINUS on shared variables == FILTER NOT EXISTS here;
            # the engine refuses no-shared-variable MINUS (where real
            # SPARQL would remove nothing) instead of silently diverging
            grp, i = _parse_group(toks, i + 1)
            not_exists.extend(grp)
            continue
        if up == "OPTIONAL" and not cur:
            grp, i = _parse_group(toks, i + 1)
            optional.extend(grp)
            continue
        if up == "GRAPH" and not cur:
            # GRAPH ?g { ... } binds each inner pattern's graph term;
            # GRAPH :name { ... } restricts it. Inner patterns become
            # 4-term (quad) patterns — the stream must carry a graph
            # column (bgp_match's graph_col). Ungrouped patterns match
            # any graph (union default graph).
            i += 1
            if i >= len(toks):
                raise SparqlError("GRAPH needs a ?variable or constant")
            gtok = toks[i]
            if gtok.startswith("?"):
                if len(gtok) == 1:
                    raise SparqlError("bare '?' is not a variable")
                g = gtok
            else:
                g = _term(gtok)
            i += 1
            grp, i = _parse_group(toks, i)
            for p in grp:
                if isinstance(p[1], tuple):
                    raise SparqlError(
                        "path patterns cannot be GRAPH-scoped"
                    )
                patterns.append((*p, g))
            continue
        if up == "SERVICE" and not cur:
            # SPARQL 1.1 federation: SERVICE :endpoint { patterns } —
            # the inner group is evaluated against the endpoint's OWN
            # triples source (run_select's ``service_sources`` mapping)
            # and its bindings join the outer group on shared variables.
            i += 1
            if i >= len(toks):
                raise SparqlError("SERVICE needs an endpoint name")
            ep = _term(toks[i])
            if ep.startswith("?"):
                raise SparqlError(
                    "variable SERVICE endpoints are not supported"
                )
            i += 1
            grp, i = _parse_group(toks, i)
            for p in grp:
                if isinstance(p[1], tuple):
                    raise SparqlError(
                        "path patterns cannot be SERVICE-scoped"
                    )
            services.append({"endpoint": ep, "patterns": grp})
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
            if i + 1 < len(toks) and toks[i + 1].upper() == "EXISTS":
                grp, i = _parse_group(toks, i + 2)
                exists_pats.extend(grp)
                continue
            ast, i = _parse_bexpr(toks, i + 1)
            filters.append(ast)
            continue
        if up == "BIND" and not cur:
            i = _expect(toks, i + 1, "(")
            ast, i = _parse_vexpr(toks, i)
            if i >= len(toks) or toks[i].upper() != "AS":
                raise SparqlError("expected AS in BIND")
            i += 1
            if i >= len(toks) or not toks[i].startswith("?") or len(toks[i]) < 2:
                raise SparqlError("BIND target must be a ?variable")
            name = toks[i][1:]
            i = _expect(toks, i + 1, ")")
            if any(n == name for n, _ in binds):
                raise SparqlError(f"duplicate BIND target ?{name}")
            binds.append((name, ast))
            continue
        if t == ".":
            if len(cur) != 3:
                raise SparqlError(f"pattern needs 3 terms, got {cur!r}")
            patterns.append(_pattern(cur))
            cur = []
        elif t == "{":
            raise SparqlError("bare nested groups are not supported")
        elif _path_starts_at(toks, i, cur):
            tok, i = _join_path_tokens(toks, i)
            cur.append(tok)
            continue
        else:
            cur.append(t)
            if len(cur) > 3:
                raise SparqlError(f"pattern has more than 3 terms: {cur!r}")
        i += 1
    raise SparqlError("unterminated WHERE group")


_HAVING_OPS = ("=", "!=", "<", ">", "<=", ">=")


def _parse_modifiers(
    toks: list[str], i: int
) -> tuple[list[str], list[tuple[str, bool]], int | None, list[dict], int]:
    """Trailing GROUP BY / HAVING / ORDER BY / LIMIT / OFFSET clauses
    after the WHERE group."""
    group_by: list[str] = []
    order_by: list[tuple[str, bool]] = []
    limit: int | None = None
    having: list[dict] = []
    offset = 0

    def var_at(j: int) -> str:
        if j >= len(toks) or not toks[j].startswith("?") or len(toks[j]) < 2:
            raise SparqlError(f"expected ?variable, got {toks[j:j+1]!r}")
        return toks[j][1:]

    while i < len(toks):
        up = toks[i].upper()
        if up == "GROUP":
            if i + 1 >= len(toks) or toks[i + 1].upper() != "BY":
                raise SparqlError("expected BY after GROUP")
            i += 2
            while i < len(toks) and toks[i].startswith("?"):
                group_by.append(var_at(i))
                i += 1
            if not group_by:
                raise SparqlError("GROUP BY needs at least one ?variable")
        elif up == "ORDER":
            if i + 1 >= len(toks) or toks[i + 1].upper() != "BY":
                raise SparqlError("expected BY after ORDER")
            i += 2
            got = False
            while i < len(toks):
                u = toks[i].upper()
                if u in ("ASC", "DESC") and i + 1 < len(toks) and toks[i + 1] == "(":
                    order_by.append((var_at(i + 2), u == "DESC"))
                    if i + 3 >= len(toks) or toks[i + 3] != ")":
                        raise SparqlError(f"unterminated {u}(...)")
                    i += 4
                    got = True
                elif toks[i].startswith("?"):
                    order_by.append((var_at(i), False))
                    i += 1
                    got = True
                else:
                    break
            if not got:
                raise SparqlError("ORDER BY needs at least one sort key")
        elif up == "HAVING":
            # HAVING ( COUNT ( [DISTINCT] ?v ) <op> <int> ) — SPARQL 1.1
            # group filter, restricted to the COUNT aggregate the SELECT
            # layer supports
            j = i + 1
            if j >= len(toks) or toks[j] != "(":
                raise SparqlError("expected '(' after HAVING")
            j += 1
            if j >= len(toks) or toks[j].upper() != "COUNT":
                raise SparqlError("HAVING supports COUNT aggregates only")
            j += 1
            if j >= len(toks) or toks[j] != "(":
                raise SparqlError("expected '(' after COUNT in HAVING")
            j += 1
            distinct = False
            if j < len(toks) and toks[j].upper() == "DISTINCT":
                distinct = True
                j += 1
            if j >= len(toks) or not toks[j].startswith("?") or len(toks[j]) < 2:
                raise SparqlError("COUNT in HAVING needs a ?variable")
            var = toks[j][1:]
            j += 1
            if j >= len(toks) or toks[j] != ")":
                raise SparqlError("unterminated COUNT in HAVING")
            j += 1
            if (
                j + 2 >= len(toks)
                or toks[j] not in _HAVING_OPS
                or toks[j + 2] != ")"
            ):
                raise SparqlError(
                    "HAVING needs ( COUNT(?v) <op> <int> ) with <op> one of "
                    + " ".join(_HAVING_OPS)
                )
            if not toks[j + 1].lstrip("-").isdigit():
                raise SparqlError("HAVING compares against an integer")
            having.append(
                {"var": var, "distinct": distinct, "op": toks[j],
                 "n": int(toks[j + 1])}
            )
            i = j + 3
        elif up == "LIMIT":
            if i + 1 >= len(toks) or not toks[i + 1].isdigit():
                raise SparqlError("LIMIT needs a non-negative integer")
            limit = int(toks[i + 1])
            i += 2
        elif up == "OFFSET":
            if i + 1 >= len(toks) or not toks[i + 1].isdigit():
                raise SparqlError("OFFSET needs a non-negative integer")
            offset = int(toks[i + 1])
            i += 2
        else:
            raise SparqlError(f"trailing tokens after '}}': {toks[i:]!r}")
    return group_by, order_by, limit, having, offset


def run_select(triples, query: str, **bgp_kwargs):
    """Parse ``query`` and evaluate it with stages/bgp.bgp_match; project
    to the SELECTed variables (DISTINCT bindings re-deduped after a
    narrowing projection)."""
    from ray.data.aggregate import Count

    import pyarrow.compute as pc

    q = parse_select(query)
    out, bound = _bindings(triples, q, **bgp_kwargs)

    if q["aggs"] and not q["group_by"]:
        # implicit single group (SPARQL 1.1: aggregates without GROUP BY
        # aggregate the whole solution set into one row)
        out = _aggregate_global(out, q, bound)
        final_cols = [a["alias"] for a in q["aggs"]]
    elif q["group_by"]:
        # HAVING filters reuse a matching SELECT aggregate; otherwise a
        # hidden one is computed alongside and dropped after the filter
        orig_aliases = [a["alias"] for a in q["aggs"]]
        hidden: list[str] = []
        for k, h in enumerate(q["having"]):
            match = next(
                (a for a in q["aggs"]
                 if a["fn"] == "count" and a["var"] == h["var"]
                 and a["distinct"] == h["distinct"]),
                None,
            )
            if match is None:
                alias = f"_having{k}"
                q["aggs"].append(
                    {"fn": "count", "var": h["var"], "sep": ",",
                     "distinct": h["distinct"], "alias": alias}
                )
                hidden.append(alias)
                h["_alias"] = alias
            else:
                h["_alias"] = match["alias"]
        out = _aggregate(out, q, bound)
        ops = {"=": pc.equal, "!=": pc.not_equal, "<": pc.less,
               ">": pc.greater, "<=": pc.less_equal, ">=": pc.greater_equal}
        for h in q["having"]:
            out = out.map_batches(
                lambda b, a=h["_alias"], o=ops[h["op"]], n=h["n"]: b.filter(
                    o(b.column(a), pa.scalar(n))
                ),
                batch_format="pyarrow",
            )
        if hidden:
            out = out.drop_columns(hidden)
        final_cols = list(
            dict.fromkeys(
                [*(q["project"] or sorted(q["group_by"])), *orig_aliases]
            )
        )
    elif q["project"] is not None:
        cols = list(q["project"])
        missing = [c for c in cols if c not in bound]
        if missing:
            raise SparqlError(f"SELECT of unbound variables: {missing}")
        if set(cols) == set(bound):
            out = out.select_columns(cols)
        else:  # narrowing projection: re-dedup for DISTINCT semantics
            out = (
                out.select_columns(cols)
                .groupby(cols)
                .aggregate(Count(alias_name="_n"))
                .drop_columns(["_n"])
            )
        final_cols = cols
    else:
        final_cols = sorted(bound)

    for var, _ in q["order_by"]:
        if var not in final_cols:
            raise SparqlError(f"ORDER BY of unbound variable: ?{var}")
    if q["order_by"]:
        out = out.sort(
            [v for v, _ in q["order_by"]],
            descending=[d for _, d in q["order_by"]],
        )
    if q["offset"]:
        # OFFSET skips the first n rows of the sorted stream (parse
        # refuses OFFSET without ORDER BY); split_at_indices preserves
        # the global sort order
        out = out.split_at_indices([q["offset"]])[1]
    if q["limit"] is not None:
        out = out.limit(q["limit"])
    return out


def _bindings(triples, sel: dict, **bgp_kwargs):
    """Shared WHERE evaluation: bgp_match + VALUES restrictions. Returns
    (bindings Dataset, bound variable names). Bound variables are static
    in the query text — never call Dataset.schema() here: on a lazy
    aggregate it executes the whole upstream plan once for the names and
    then AGAIN for the rows."""
    import pyarrow.compute as pc

    from ..stages.bgp import bgp_match

    # federation sources are OURS to consume, not bgp_match kwargs
    service_sources: dict = bgp_kwargs.pop("service_sources", {})

    def group_vars(pats) -> list[str]:
        vs: list[str] = []
        for p in pats:
            for t in p:
                if isinstance(t, str) and t.startswith("?") and t[1:] not in vs:
                    vs.append(t[1:])
        return vs

    if sel.get("unions"):
        from ray.data.aggregate import Count

        branches = sel["unions"]
        bound = sorted(group_vars(branches[0]))
        for b in branches[1:]:
            if sorted(group_vars(b)) != bound:
                raise SparqlError(
                    "UNION branches must bind the same variables "
                    f"({bound} vs {sorted(group_vars(b))})"
                )
        out = bgp_match(triples, branches[0], **bgp_kwargs)
        for b in branches[1:]:  # branch outputs share the sorted-var layout
            out = out.union(bgp_match(triples, b, **bgp_kwargs))
        out = (  # per-branch DISTINCT doesn't dedup across branches
            out.groupby(bound)
            .aggregate(Count(alias_name="_n"))
            .drop_columns(["_n"])
        )
    elif sel["patterns"]:
        bound = group_vars([*sel["patterns"], *sel["optional"]])
        out = bgp_match(
            triples,
            sel["patterns"],
            optional=tuple(sel["optional"]),
            exists=tuple(sel.get("exists", ())),
            not_exists=tuple(sel["not_exists"]),
            **bgp_kwargs,
        )
    else:  # subquery-only WHERE: the first subquery is the base
        if sel["optional"] or sel["not_exists"] or sel.get("exists"):
            raise SparqlError(
                "OPTIONAL / FILTER [NOT] EXISTS need required patterns"
            )
        out, bound = None, []

    for sq in sel.get("subqueries", ()):
        from ..stages.bgp import _default_buckets
        from ..stages.hashjoin import bucketed_join

        sub_out = run_select(
            triples,
            sq["text"],
            **bgp_kwargs,
            **({"service_sources": service_sources} if service_sources else {}),
        ).map_batches(
            # subquery results re-enter the binding model as string terms
            # (aggregate columns cast; joins/filters stay uniform)
            lambda b: pa.table(
                {
                    c: (
                        b.column(c)
                        if pa.types.is_string(b.column(c).type)
                        else pc.cast(b.column(c), pa.string())
                    )
                    for c in b.column_names
                }
            ),
            batch_format="pyarrow",
        )
        if out is None:
            out, bound = sub_out, list(sq["vars"])
            continue
        shared = sorted(set(bound) & set(sq["vars"]))
        if not shared:
            raise SparqlError(
                f"subquery shares no variable with the group "
                f"(bound={sorted(bound)}, subquery={sq['vars']})"
            )
        out = bucketed_join(
            out,
            sub_out,
            on=tuple(shared),
            n_buckets=max(8, _default_buckets() // 16),
            left_types={v: pa.string() for v in bound},
            right_types={v: pa.string() for v in sq["vars"]},
        )
        bound = [*bound, *[v for v in sq["vars"] if v not in bound]]
    for svc in sel.get("services", ()):
        from ..stages.bgp import _default_buckets
        from ..stages.hashjoin import bucketed_join

        if svc["endpoint"] not in service_sources:
            raise SparqlError(
                f"no service_sources entry for SERVICE {svc['endpoint']} "
                f"(have: {sorted(service_sources)})"
            )
        # the endpoint evaluates its group over its OWN triples — none of
        # the local stream's pattern_source/stats kwargs apply there
        svars = sorted(group_vars(svc["patterns"]))
        sub_out = bgp_match(service_sources[svc["endpoint"]], svc["patterns"])
        if out is None:
            out, bound = sub_out, list(svars)
            continue
        shared = sorted(set(bound) & set(svars))
        if not shared:
            raise SparqlError(
                f"SERVICE group shares no variable with the outer group "
                f"(bound={sorted(bound)}, service={svars})"
            )
        out = bucketed_join(
            out,
            sub_out,
            on=tuple(shared),
            n_buckets=max(8, _default_buckets() // 16),
            left_types={v: pa.string() for v in bound},
            right_types={v: pa.string() for v in svars},
        )
        bound = [*bound, *[v for v in svars if v not in bound]]
    for var, consts in sel.get("values", ()):
        if var not in bound:
            raise SparqlError(f"VALUES of unbound variable: ?{var}")
        out = out.map_batches(
            lambda b, v=var, cs=tuple(consts): b.filter(
                pc.is_in(b.column(v), value_set=pa.array(cs, type=pa.string()))
            ),
            batch_format="pyarrow",
        )
    for name, ast in sel.get("binds", ()):
        missing = [v for v in sorted(_ast_vars(ast)) if v not in bound]
        if missing:
            raise SparqlError(f"BIND uses unbound variables: {missing}")
        if name in bound:
            raise SparqlError(f"BIND target ?{name} is already bound")

        def add(b: pa.Table, n=name, a=ast) -> pa.Table:
            v = _eval_vexpr(a, b)
            if isinstance(v, pa.Scalar):  # all-literal expression
                v = pa.array([v.as_py()] * b.num_rows)
            if not pa.types.is_string(v.type):
                # the binding model is string terms (RDF-style): numeric
                # results (STRLEN) join/group/compare as rendered strings;
                # numeric FILTERs cast them back exactly
                v = pc.cast(v, pa.string())
            return b.append_column(n, v)

        out = out.map_batches(add, batch_format="pyarrow")
        bound = [*bound, name]
    for ast in sel.get("filters", ()):
        missing = [v for v in sorted(_ast_vars(ast)) if v not in bound]
        if missing:
            raise SparqlError(f"FILTER of unbound variables: {missing}")
        out = out.map_batches(
            lambda b, a=ast: b.filter(_eval_bexpr(a, b)),
            batch_format="pyarrow",
        )
    return out, bound


def run_construct(triples, query: str, **bgp_kwargs):
    """SPARQL CONSTRUCT: ``CONSTRUCT { template . ... } WHERE { ... }`` ->
    Dataset(subj, pred, obj) of the DISTINCT triples instantiated from the
    WHERE bindings. Template terms are ?vars (must be bound by WHERE) or
    constants; each template pattern is one zero-shuffle projection of
    the binding stream, templates union, one bounded groupby dedups."""
    from ray.data.aggregate import Count

    toks = list(_tokens(query))
    if not toks or toks[0].upper() != "CONSTRUCT":
        raise SparqlError("query must start with CONSTRUCT")
    templates, i = _parse_group(toks, 1)
    if not templates:
        raise SparqlError("CONSTRUCT needs at least one template pattern")
    if any(isinstance(p[1], tuple) for p in templates):
        raise SparqlError("CONSTRUCT templates cannot contain paths")
    if i >= len(toks) or toks[i].upper() != "WHERE":
        raise SparqlError("expected WHERE after the CONSTRUCT template")
    # reuse the SELECT * machinery for the WHERE group + its validation
    sel = parse_select("SELECT * WHERE " + " ".join(toks[i + 1:]))
    if (
        sel["group_by"]
        or sel["order_by"]
        or sel["limit"] is not None
        or sel["having"]
        or sel["offset"]
    ):
        raise SparqlError("CONSTRUCT takes no solution modifiers")
    bindings, bound = _bindings(triples, sel, **bgp_kwargs)
    for p in templates:
        for t in p:
            if t.startswith("?") and t[1:] not in bound:
                raise SparqlError(f"template uses unbound variable ?{t[1:]}")

    def instantiate(b: pa.Table) -> pa.Table:
        outs = []
        for s, p, o in templates:
            cols = {}
            for name, term in (("subj", s), ("pred", p), ("obj", o)):
                if term.startswith("?"):
                    cols[name] = b.column(term[1:])
                else:
                    cols[name] = pa.array([term] * b.num_rows, type=pa.string())
            outs.append(pa.table(cols))
        t = pa.concat_tables(outs)
        return t.group_by(t.column_names).aggregate([])  # batch-local dedup

    return (
        bindings.map_batches(instantiate, batch_format="pyarrow")
        .groupby(["subj", "pred", "obj"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )


def run_describe(triples, query: str, *, subj_col: str = "subj",
                 pred_col: str = "pred", obj_col: str = "obj"):
    """SPARQL DESCRIBE for a constant term: ``DESCRIBE :entity`` -> every
    DISTINCT triple where the term is the subject or the object. ONE
    vectorized filter pass over the stream plus a bounded dedup groupby —
    at store scale feed the SPO/OSP permutation lookups instead."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    toks = list(_tokens(query))
    if len(toks) != 2 or toks[0].upper() != "DESCRIBE":
        raise SparqlError("DESCRIBE takes exactly one term")
    term = _term(toks[1])
    if term.startswith("?"):
        raise SparqlError("DESCRIBE needs a constant term, not a variable")

    def f(b: pa.Table) -> pa.Table:
        mask = pc.or_(
            pc.equal(b.column(subj_col), pa.scalar(term)),
            pc.equal(b.column(obj_col), pa.scalar(term)),
        )
        t = b.filter(mask)
        out = pa.table(
            {"subj": t.column(subj_col), "pred": t.column(pred_col),
             "obj": t.column(obj_col)}
        )
        return out.group_by(out.column_names).aggregate([])

    return (
        triples.map_batches(f, batch_format="pyarrow")
        .groupby(["subj", "pred", "obj"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )


def run_ask(triples, query: str, **bgp_kwargs):
    """SPARQL ASK: ``ASK { ... }`` -> one-row Dataset(ask: int64 0/1) —
    does any binding satisfy the group? Evaluates the group's bindings
    and stops at the first one (limit(1) short-circuits the stream)."""
    import ray.data as rd

    toks = list(_tokens(query))
    if not toks or toks[0].upper() != "ASK":
        raise SparqlError("query must start with ASK")
    sel = parse_select("SELECT * WHERE " + " ".join(toks[1:]))
    bindings, _ = _bindings(triples, sel, **bgp_kwargs)
    hit = len(bindings.limit(1).take(1)) > 0
    return rd.from_arrow(
        pa.table({"ask": pa.array([1 if hit else 0], type=pa.int64())})
    )


def _agg_type(agg: dict) -> "pa.DataType":
    if agg["fn"] in ("count", "sum"):
        return pa.int64()
    if agg["fn"] == "avg":
        return pa.float64()
    return pa.string()


def _agg_one(bindings, keys: list[str], agg: dict):
    """One aggregate -> Dataset(keys..., alias). Scale shape: a per-batch
    Arrow hash partial first (bounded to #groups rows per block), then ONE
    bounded groupby finish — Ray's Min/Max/Sum combine the partials for
    the mergeable functions; GROUP_CONCAT (not partial-mergeable in sorted
    order) finishes with map_groups over list partials that still carry
    each value exactly once."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max, Min, Sum

    fn, var, alias = agg["fn"], agg["var"], agg["alias"]
    src = bindings
    if agg["distinct"] and var not in keys and fn in (
        "count", "sum", "avg", "group_concat"
    ):
        # pair-dedup: one bounded groupby on (keys, var)
        src = (
            bindings.select_columns([*keys, var])
            .groupby([*keys, var])
            .aggregate(Count(alias_name="_n"))
            .drop_columns(["_n"])
        )
    if fn == "count":
        if agg["distinct"] and var not in keys:
            return src.groupby(keys).aggregate(Count(alias_name=alias))
        # COUNT(?v) == solutions per group (bindings are distinct);
        # COUNT(DISTINCT key-var) degenerates to the same thing
        return bindings.groupby(keys).aggregate(Count(alias_name=alias))

    if fn in ("min", "max", "sample"):  # SAMPLE pinned to MIN (docstring)
        arrow_fn = "max" if fn == "max" else "min"

        def partial(b: pa.Table, af=arrow_fn) -> pa.Table:
            g = b.select([*keys, var]).group_by(keys).aggregate([(var, af)])
            return g.rename_columns([*keys, alias])

        agged = src.map_batches(partial, batch_format="pyarrow")
        ray_agg = Max(alias, alias_name=alias) if fn == "max" else Min(
            alias, alias_name=alias
        )
        return agged.groupby(keys).aggregate(ray_agg)

    if fn in ("sum", "avg"):

        def partial(b: pa.Table) -> pa.Table:
            # int64 cast fails loudly on non-integer bindings — SUM/AVG
            # never silently aggregate garbage (see _parse_agg contract)
            t = pa.table(
                {
                    **{k: b.column(k) for k in keys},
                    "_v": pc.cast(b.column(var), pa.int64()),
                }
            )
            g = t.group_by(keys).aggregate([("_v", "sum"), ("_v", "count")])
            return g.rename_columns([*keys, "_s", "_c"])

        agged = src.map_batches(partial, batch_format="pyarrow").groupby(
            keys
        ).aggregate(Sum("_s", alias_name="_s"), Sum("_c", alias_name="_c"))
        if fn == "sum":
            def finish(b: pa.Table) -> pa.Table:
                return pa.table(
                    {**{k: b.column(k) for k in keys},
                     alias: pc.cast(b.column("_s"), pa.int64())}
                )
        else:  # avg == float64 quotient of two exact integers
            def finish(b: pa.Table) -> pa.Table:
                return pa.table(
                    {
                        **{k: b.column(k) for k in keys},
                        alias: pc.divide(
                            pc.cast(b.column("_s"), pa.float64()),
                            pc.cast(b.column("_c"), pa.float64()),
                        ),
                    }
                )
        return agged.map_batches(finish, batch_format="pyarrow")

    assert fn == "group_concat", fn
    sep = agg["sep"]

    def partial(b: pa.Table) -> pa.Table:
        g = b.select([*keys, var]).group_by(keys).aggregate([(var, "list")])
        return g.rename_columns([*keys, "_vs"])

    def finish(t: pa.Table, s=sep) -> pa.Table:
        flat: list[str] = []
        for chunk in t.column("_vs").to_pylist():
            flat.extend(chunk)
        flat.sort()  # ascending-order join: the pinned determinism rule
        return pa.table(
            {
                **{k: pa.array([t.column(k)[0].as_py()]) for k in keys},
                alias: pa.array([s.join(flat)], type=pa.string()),
            }
        )

    return (
        src.map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .map_groups(finish, batch_format="pyarrow")
    )


def _aggregate_global(bindings, q: dict, bound: list[str]):
    """Implicit single-group aggregation: every aggregate reduces the
    whole (distinct) solution set to one scalar; the result is a one-row
    Dataset. Mergeable functions partial-combine per batch then finish
    with ONE global Dataset.aggregate (a bounded tree-reduce, no key
    shuffle); GROUP_CONCAT's values ARE the output row, so collecting
    them driver-side is the result size, not a materialization. Empty
    solution sets pin to COUNT/SUM = 0, AVG = 0.0, strings = ''."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min, Sum

    mat = bindings.materialize()  # each aggregate consumes the same set
    cols: dict[str, pa.Array] = {}
    seen: set[str] = set()
    for agg in q["aggs"]:
        fn, var, alias = agg["fn"], agg["var"], agg["alias"]
        if var not in bound:
            raise SparqlError(f"{fn.upper()} of unbound variable: ?{var}")
        if alias in seen:
            raise SparqlError(f"duplicate result name ?{alias}")
        seen.add(alias)
        src = mat
        if agg["distinct"] and fn in ("count", "sum", "avg", "group_concat"):
            src = (
                mat.select_columns([var])
                .groupby([var])
                .aggregate(Count(alias_name="_n"))
                .drop_columns(["_n"])
            )
        if fn == "count":
            n = src.count() if agg["distinct"] else mat.count()
            cols[alias] = pa.array([n], type=pa.int64())
        elif fn in ("min", "max", "sample"):
            ray_agg = Max(var, alias_name="v") if fn == "max" else Min(
                var, alias_name="v"
            )
            res = src.select_columns([var]).aggregate(ray_agg)
            v = (res or {}).get("v")
            cols[alias] = pa.array(
                [v if v is not None else ""], type=pa.string()
            )
        elif fn in ("sum", "avg"):
            def to_int(b: pa.Table, v=var) -> pa.Table:
                return pa.table({"_v": pc.cast(b.column(v), pa.int64())})

            res = src.select_columns([var]).map_batches(
                to_int, batch_format="pyarrow"
            ).aggregate(Sum("_v", alias_name="s"), Count(alias_name="c"))
            s = (res or {}).get("s") or 0
            c = (res or {}).get("c") or 0
            if fn == "sum":
                cols[alias] = pa.array([int(s)], type=pa.int64())
            else:
                cols[alias] = pa.array(
                    [float(s) / c if c else 0.0], type=pa.float64()
                )
        else:  # group_concat: route through the grouped machinery with a
            # constant key so the values concatenate on a WORKER (per-batch
            # list partials -> one map_groups sort+join; _agg_one handles
            # DISTINCT itself) — the driver receives only the single
            # joined output string, never the value stream as a Python
            # list (at sf1 that list held ~500k separate strings).
            def keyed(b: pa.Table, v=var) -> pa.Table:
                return pa.table(
                    {
                        "_g": pa.array(["_"] * b.num_rows, type=pa.string()),
                        v: pc.cast(b.column(v), pa.string()),
                    }
                )

            one = _agg_one(
                mat.select_columns([var]).map_batches(
                    keyed, batch_format="pyarrow"
                ),
                ["_g"],
                agg,
            )
            rows = one.take(1)
            v = rows[0][alias] if rows else ""
            cols[alias] = pa.array([v], type=pa.string())
    return rd.from_arrow(pa.table(cols))


def _aggregate(bindings, q: dict, bound: list[str]):
    """GROUP BY aggregates over distinct bindings (COUNT/SUM/MIN/MAX/AVG/
    SAMPLE/GROUP_CONCAT — each one partial-combined per batch then one
    bounded groupby, see _agg_one); multiple aggregates fold with ONE
    bounded groupby-max over typed-null-padded branch unions."""
    keys = sorted(q["group_by"])  # canonical key order, like bgp output
    missing = [c for c in keys if c not in bound]
    if missing:
        raise SparqlError(f"GROUP BY of unbound variables: {missing}")
    if len(q["aggs"]) > 1:
        # each _agg_one consumes the binding stream; without this, Ray
        # re-executes the WHOLE upstream (NER + BGP fold) once PER
        # aggregate — measured 7x pipeline cost on the 7-aggregate
        # rollup. The binding stream is projection-pruned to the group +
        # aggregate vars, so materializing it is solution-set-sized, not
        # corpus-sized (and spills, never OOMs).
        bindings = bindings.materialize()
    seen_aliases = set(keys)
    types: dict[str, "pa.DataType"] = {}
    branches: list[tuple[str, object]] = []
    for agg in q["aggs"]:
        var, alias = agg["var"], agg["alias"]
        if var not in bound:
            raise SparqlError(
                f"{agg['fn'].upper()} of unbound variable: ?{var}"
            )
        if alias in seen_aliases:
            raise SparqlError(f"duplicate result name ?{alias}")
        seen_aliases.add(alias)
        branches.append((alias, _agg_one(bindings, keys, agg)))
        types[alias] = _agg_type(agg)
    if len(branches) == 1:
        out = branches[0][1]
    else:
        # fold the per-aggregate (keys, alias) branches with ONE bounded
        # groupby-max over a typed-null-padded union instead of a CHAIN
        # of bucketed joins: each (group, alias) cell is non-null in
        # exactly one branch, so max-ignore-nulls reassembles the row.
        # The join chain cost one all-to-all PER aggregate (measured 7x
        # fixed exchange cost on the 7-aggregate rollup); this is one.
        aliases = [a for a, _ in branches]
        order = [*keys, *aliases]

        def pad(one_alias):
            def f(b: pa.Table) -> pa.Table:
                if b.num_rows == 0:
                    cols = {k: pa.array([], type=pa.string()) for k in keys}
                    cols.update(
                        {a2: pa.array([], type=types[a2]) for a2 in aliases}
                    )
                    return pa.table({c: cols[c] for c in order})
                cols = {k: b.column(k) for k in keys}
                for a2 in aliases:
                    cols[a2] = (
                        b.column(a2)
                        if a2 == one_alias
                        else pa.nulls(b.num_rows, type=types[a2])
                    )
                return pa.table({c: cols[c] for c in order})

            return f

        from ray.data.aggregate import Max

        u = None
        for a2, one in branches:
            p = one.map_batches(pad(a2), batch_format="pyarrow")
            u = p if u is None else u.union(p)
        out = u.groupby(keys).aggregate(
            *[Max(a2, alias_name=a2) for a2 in aliases]
        )
    cols = [*(q["project"] or keys), *[a["alias"] for a in q["aggs"]]]
    # drop group keys not projected (SPARQL allows grouping by an
    # unprojected var); re-dedup is unnecessary — group keys are unique
    return out.select_columns(list(dict.fromkeys(cols)))


def parse_update(text: str) -> list[tuple[str, list[tuple[str, str, str]]]]:
    """SPARQL 1.1 Update, ground-data subset: a ';'-separated sequence of
    ``INSERT DATA { triples }`` / ``DELETE DATA { triples }`` operations
    (constants only — the pattern-template verbs INSERT/DELETE WHERE are
    out of scope). Returns [(verb, [(s, p, o), ...]), ...] in operation
    order; sequence semantics (a later INSERT revives a DELETEd triple,
    a later DELETE removes a just-INSERTed one) are the executor's
    contract (serving.sparql_update)."""
    toks = list(_tokens(text))
    i = 0
    ops: list[tuple[str, list[tuple[str, str, str]]]] = []
    while i < len(toks):
        if toks[i] == ";":
            i += 1
            continue
        verb = toks[i].upper()
        if verb not in ("INSERT", "DELETE"):
            raise SparqlError(f"expected INSERT or DELETE, got {toks[i]!r}")
        i += 1
        if i >= len(toks) or toks[i].upper() != "DATA":
            raise SparqlError(f"{verb} supports only {verb} DATA here")
        i += 1
        if i >= len(toks) or toks[i] != "{":
            raise SparqlError("expected '{' after DATA")
        i += 1
        triples: list[tuple] = []
        cur: list[str] = []

        def flush(graph: str | None):
            if len(cur) != 3:
                raise SparqlError(f"triple needs 3 terms, got {cur!r}")
            triples.append(
                (cur[0], cur[1], cur[2])
                if graph is None
                else (cur[0], cur[1], cur[2], graph)
            )
            cur.clear()

        def ground(t: str) -> str:
            term = _term(t)
            if term.startswith("?"):
                raise SparqlError(
                    f"DATA blocks take ground terms, not variables: {t!r}"
                )
            return term

        while i < len(toks) and toks[i] != "}":
            t = toks[i]
            if t.upper() == "GRAPH" and not cur:
                # nested GRAPH <g> { quads } block (SPARQL 1.1 QuadData)
                if i + 2 >= len(toks) or toks[i + 2] != "{":
                    raise SparqlError("GRAPH needs '<iri> {' after it")
                g = _graph_term(toks[i + 1])
                i += 3
                while i < len(toks) and toks[i] != "}":
                    if toks[i] == ".":
                        if cur:  # tolerate the optional trailing dot
                            flush(g)
                    else:
                        cur.append(ground(toks[i]))
                        if len(cur) > 3:
                            raise SparqlError(
                                f"triple has more than 3 terms: {cur!r}"
                            )
                    i += 1
                if i >= len(toks):
                    raise SparqlError("unterminated GRAPH block")
                if cur:
                    flush(g)
            elif t == ".":
                if cur:  # a dot may also close a GRAPH block (optional)
                    flush(None)
            else:
                cur.append(ground(t))
                if len(cur) > 3:
                    raise SparqlError(f"triple has more than 3 terms: {cur!r}")
            i += 1
        if i >= len(toks):
            raise SparqlError("unterminated '{' in DATA block")
        if cur:
            flush(None)
        i += 1  # past '}'
        ops.append(("insert" if verb == "INSERT" else "delete", triples))
    if not ops:
        raise SparqlError("empty update request")
    return ops


def _check_modify_sel(sel: dict) -> None:
    if (
        sel["group_by"]
        or sel["order_by"]
        or sel["limit"] is not None
        or sel["having"]
        or sel["offset"]
        or sel["aggs"]
    ):
        raise SparqlError("UPDATE WHERE takes no solution modifiers")


def parse_update_request(text: str):
    """SPARQL 1.1 Update request -> ``("data", ops)`` for the ground
    INSERT DATA / DELETE DATA sequence (``parse_update``),
    ``("load", [paths])`` for a ``LOAD <iri>`` sequence (RDF document
    ingest; the executor picks the reader by extension), or
    ``("modify", {"delete": tpls, "insert": tpls, "select": sel})`` for
    the pattern-template verbs:

    - ``DELETE WHERE { bgp }`` — the group doubles as the delete
      template (spec shorthand), so it must be a plain conjunctive BGP;
    - ``DELETE { tpl } [INSERT { tpl }] WHERE { group }`` /
      ``INSERT { tpl } WHERE { group }`` — templates are path-free
      triple patterns over variables the WHERE binds; the WHERE group
      accepts everything a CONSTRUCT WHERE does (FILTER/OPTIONAL/...),
      just no solution modifiers.

    ``sel`` is the ``parse_select`` dict for ``SELECT * WHERE ...`` —
    the executor streams its bindings and instantiates the templates
    (serving.sparql_update)."""
    toks = list(_tokens(text))
    if not toks:
        raise SparqlError("empty update request")
    if toks[0].upper() == "CLEAR":
        # CLEAR ALL / CLEAR DEFAULT retract every triple; CLEAR GRAPH
        # <iri> targets ONE named graph (quad stores only — the
        # single-graph executor rejects it loudly at execution)
        rest = [t.upper() for t in toks[1:]]
        if rest in ([], ["ALL"], ["DEFAULT"]):
            return ("clear", None)
        if len(toks) == 3 and toks[1].upper() == "GRAPH":
            return ("clear_graph", _graph_term(toks[2]))
        raise SparqlError(
            "CLEAR supports ALL / DEFAULT / GRAPH <iri>; "
            f"got {' '.join(toks[1:])!r}"
        )
    if toks[0].upper() in ("DROP", "CREATE"):
        verb = toks[0].upper()
        if len(toks) == 3 and toks[1].upper() == "GRAPH":
            return (f"{verb.lower()}_graph", _graph_term(toks[2]))
        raise SparqlError(f"{verb} supports only {verb} GRAPH <iri>")
    if toks[0].upper() in ("ADD", "COPY", "MOVE"):
        # SPARQL 1.1 graph management: ADD/COPY/MOVE [GRAPH] <src> TO
        # [GRAPH] <dst> (quad stores only). ADD merges src's triples into
        # dst; COPY replaces dst with src; MOVE = COPY then DROP src.
        verb = toks[0].upper()
        rest = [t for t in toks[1:] if t.upper() != "GRAPH"]
        if len(rest) == 3 and rest[1].upper() == "TO":
            src, dst = _graph_term(rest[0]), _graph_term(rest[2])
            if src == dst:
                raise SparqlError(f"{verb} needs distinct graphs")
            return (f"{verb.lower()}_graph_to", (src, dst))
        raise SparqlError(f"{verb} syntax: {verb} GRAPH <src> TO GRAPH <dst>")
    if toks[0].upper() == "LOAD":
        # ';'-separated LOAD <iri> sequence; cannot mix with other verbs
        paths: list[str] = []
        i = 0
        while i < len(toks):
            if toks[i] == ";":
                i += 1
                continue
            if toks[i].upper() != "LOAD":
                raise SparqlError(
                    "LOAD requests cannot mix with other update verbs"
                )
            if i + 1 >= len(toks) or not toks[i + 1].startswith("<"):
                raise SparqlError("LOAD needs an <iri> document target")
            paths.append(toks[i + 1][1:-1])
            i += 2
        if not paths:
            raise SparqlError("empty LOAD request")
        return ("load", paths)
    # WITH <iri> prefix: scopes the WHERE dataset AND the template target
    # to ONE named graph (SPARQL 1.1 Update; quad stores only)
    with_graph: str | None = None
    if toks[0].upper() == "WITH":
        if len(toks) < 2:
            raise SparqlError("WITH needs a graph <iri>")
        with_graph = _graph_term(toks[1])
        toks = toks[2:]
        if not toks:
            raise SparqlError("WITH needs an update operation after it")

    if not any(t.upper() == "WHERE" for t in toks):
        if with_graph is not None:
            raise SparqlError("WITH applies to template updates (needs WHERE)")
        return ("data", parse_update(text))

    # DELETE WHERE { bgp } shorthand: pattern group == delete template
    if toks[0].upper() == "DELETE" and len(toks) > 1 and toks[1].upper() == "WHERE":
        sel = parse_select("SELECT * WHERE " + " ".join(toks[2:]))
        _check_modify_sel(sel)
        extras = [
            k
            for k in (
                "optional", "exists", "not_exists", "values", "unions",
                "filters", "binds", "subqueries", "services",
            )
            if sel[k]
        ]
        if extras:
            raise SparqlError(
                f"DELETE WHERE is a plain-BGP shorthand; found {extras} — "
                "use DELETE { template } WHERE { group } instead"
            )
        if any(isinstance(p[1], tuple) for p in sel["patterns"]):
            raise SparqlError("DELETE WHERE cannot contain property paths")
        return (
            "modify",
            {"delete": sel["patterns"], "insert": [], "select": sel,
             "with_graph": with_graph},
        )

    i = 0
    delete_tpls: list | None = None
    insert_tpls: list | None = None
    sel = None
    while i < len(toks):
        up = toks[i].upper()
        if up == "DELETE":
            if delete_tpls is not None or insert_tpls is not None:
                raise SparqlError("DELETE template must come first, once")
            delete_tpls, i = _parse_group(toks, i + 1)
        elif up == "INSERT":
            if insert_tpls is not None:
                raise SparqlError("duplicate INSERT template")
            if i + 1 < len(toks) and toks[i + 1].upper() == "DATA":
                raise SparqlError(
                    "INSERT DATA cannot mix with a WHERE clause; use "
                    "INSERT { template } WHERE { group }"
                )
            insert_tpls, i = _parse_group(toks, i + 1)
        elif up == "WHERE":
            sel = parse_select("SELECT * WHERE " + " ".join(toks[i + 1 :]))
            break
        else:
            raise SparqlError(f"expected DELETE/INSERT/WHERE, got {toks[i]!r}")
    if sel is None:
        raise SparqlError("expected WHERE after the update templates")
    if not delete_tpls and not insert_tpls:
        raise SparqlError("update needs a DELETE and/or INSERT template")
    _check_modify_sel(sel)
    for tpls in (delete_tpls or []), (insert_tpls or []):
        if any(isinstance(p[1], tuple) for p in tpls):
            raise SparqlError("update templates cannot contain paths")
    return (
        "modify",
        {"delete": delete_tpls or [], "insert": insert_tpls or [],
         "select": sel, "with_graph": with_graph},
    )


def _instantiate_templates(bindings, templates: list, bound: list[str]):
    """Binding stream + path-free templates -> Dataset(subj, pred, obj) of
    the DISTINCT instantiated triples (the CONSTRUCT shape: zero-shuffle
    projection per template, batch-local dedup, one bounded groupby)."""
    from ray.data.aggregate import Count

    for p in templates:
        for t in p:
            if t.startswith("?") and t[1:] not in bound:
                raise SparqlError(f"template uses unbound variable ?{t[1:]}")

    def instantiate(b: pa.Table) -> pa.Table:
        outs = []
        for s, p, o in templates:
            cols = {}
            for name, term in (("subj", s), ("pred", p), ("obj", o)):
                if term.startswith("?"):
                    cols[name] = b.column(term[1:])
                else:
                    cols[name] = pa.array([term] * b.num_rows, type=pa.string())
            outs.append(pa.table(cols))
        t = pa.concat_tables(outs)
        return t.group_by(t.column_names).aggregate([])

    return (
        bindings.map_batches(instantiate, batch_format="pyarrow")
        .groupby(["subj", "pred", "obj"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )


def run_update_triples(triples, parsed: dict, **bgp_kwargs):
    """Evaluate a parsed modify request against a triple stream ->
    ``(delete_keys, insert_keys)`` — each a DISTINCT (subj, pred, obj)
    Dataset or None when that template is absent. The caller owns what
    deletion/insertion MEANS for its store (serving.sparql_update turns
    these into one LSM delta generation)."""
    sel = parsed["select"]
    bindings, bound = _bindings(triples, sel, **bgp_kwargs)
    if parsed["delete"] and parsed["insert"]:
        bindings = bindings.materialize()  # both templates read the stream
    dels = (
        _instantiate_templates(bindings, parsed["delete"], bound)
        if parsed["delete"]
        else None
    )
    ins = (
        _instantiate_templates(bindings, parsed["insert"], bound)
        if parsed["insert"]
        else None
    )
    return dels, ins
