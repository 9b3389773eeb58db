"""DuckDB oracle SQL for the boundary-rule NER family (triples /
canonical_entities / label_mention_counts).

The reference's acceptance rules 1-6 (quickner-core/src/quickner.rs:137-222,
ported in kernel/boundary.py) collapse, for ASCII text, to a closed form
over EVERY literal occurrence of a gazetteer name in the lowered text:

    accept(start, end)  <=>  end == len(text)                      (rule 4)
                          OR (  (start == 0 OR text[start-1] in B)
                              AND end < len(text) AND text[end] in B )

with B = ASCII whitespace ∪ ASCII punctuation. Proof sketch (mirrors
kernel/vectorscan.py's completeness argument): rules 1-3 are exactly
``(at0 | prevB) & nextB``; rules 5/6 are strict subsets of that for ASCII
(where ``start + byte_len == end``); rule 4 is the unconditional
end-aligned case. Property tests pin the Python engines to this form, and
this module makes the same statement in SQL: enumerate candidate positions
with ``range``, test literal substring equality, apply the predicate.

ASSUMPTION (checked by the caller's context): the corpus is ASCII — char
index == byte index and the non-ASCII members of Rust's White_Space set
cannot occur. The synthetic ``documents`` tables are ASCII by construction.

Entity ids are md5("surface_norm\\x00label") — precomputed here in Python
and embedded as literals (DuckDB varchar cannot hold NUL bytes).
"""

from __future__ import annotations

from ..stages.canonicalize import entity_id

# ASCII boundary class: whitespace (\t \n \x0b \x0c \r space) + the 32
# ASCII punctuation chars, as an RE2 class for regexp_matches
BOUNDARY_CLASS_SQL = "[ \t\n\x0b\x0c\r!-/:-@\\[-`{-~]"


def _quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def sql_match_ctes(entities: list[tuple[str, str]], table: str = "documents") -> str:
    """WITH-clause chain ending in ``acc`` = one row per ACCEPTED mention:
    (doc_id, pname, plabel, eid, start, "end").

    ``entities`` are (name, label) pairs; names are matched case-insensitively
    (text is lowered, names are lowered — the engine's case_sensitive=False
    path) and must not contain single quotes beyond SQL escaping needs.
    """
    rows = ", ".join(
        f"({_quote(n.lower())}, {_quote(l)}, "
        f"{_quote(entity_id(n.lower(), l))}, {len(n)})"
        for n, l in entities
    )
    b = BOUNDARY_CLASS_SQL.replace("'", "''")
    return (
        f"pats(pname, plabel, eid, plen) AS (VALUES {rows}),\n"
        f"lt AS (SELECT doc_id, lower(text) AS t, length(text) AS n FROM {table}),\n"
        f"cand AS (\n"
        f"  SELECT lt.doc_id, p.pname, p.plabel, p.eid, gs.s AS start,\n"
        f"         gs.s + p.plen AS \"end\", lt.n, lt.t\n"
        f"  FROM lt CROSS JOIN pats p\n"
        f"  CROSS JOIN LATERAL (SELECT unnest(range(0, lt.n - p.plen + 1)) AS s) gs\n"
        f"  WHERE substr(lt.t, gs.s + 1, p.plen) = p.pname\n"
        f"),\n"
        f"acc AS (\n"
        f"  SELECT doc_id, pname, plabel, eid, start, \"end\" FROM cand\n"
        f"  WHERE (\"end\" = n)\n"
        f"     OR ( (start = 0 OR regexp_matches(substr(t, start, 1), '{b}'))\n"
        f"          AND \"end\" < n\n"
        f"          AND regexp_matches(substr(t, \"end\" + 1, 1), '{b}') )\n"
        f")"
    )


def sql_triples(entities: list[tuple[str, str]], table: str = "documents") -> str:
    """Oracle for ``q_triples``: (subj, pred, obj, surface_norm, start, end)."""
    return (
        f"WITH {sql_match_ctes(entities, table)}\n"
        f"SELECT CAST(doc_id AS VARCHAR) AS subj, plabel AS pred, eid AS obj,\n"
        f"       pname AS surface_norm, CAST(start AS BIGINT) AS start,\n"
        f"       CAST(\"end\" AS BIGINT) AS \"end\"\n"
        f"FROM acc"
    )


def sql_canonical_entities(
    entities: list[tuple[str, str]], table: str = "documents"
) -> str:
    """Oracle for ``q_canonical_entities``:
    (surface_norm, label, n_mentions, entity_id)."""
    return (
        f"WITH {sql_match_ctes(entities, table)}\n"
        f"SELECT pname AS surface_norm, plabel AS label,\n"
        f"       count(*) AS n_mentions, eid AS entity_id\n"
        f"FROM acc GROUP BY pname, plabel, eid"
    )


def sql_label_mention_counts(
    entities: list[tuple[str, str]], table: str = "documents"
) -> str:
    """Oracle for ``q_label_mention_counts``: (label, n_mentions)."""
    return (
        f"WITH {sql_match_ctes(entities, table)}\n"
        f"SELECT plabel AS label, count(*) AS n_mentions FROM acc GROUP BY plabel"
    )
