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


def sql_entity_cooccurrence(
    entities: list[tuple[str, str]], table: str = "documents", *, cap: int = 64
) -> str:
    """Oracle for ``q_entity_cooccurrence``: (entity_a, entity_b, n_docs) —
    distinct entity pairs co-mentioned in a document, capped at the ``cap``
    lowest eids per doc (mirrors MAX_ENT_PER_DOC's quadratic guard)."""
    return (
        f"WITH {sql_match_ctes(entities, table)},\n"
        f"de AS (SELECT DISTINCT doc_id, eid FROM acc),\n"
        f"dcap AS (SELECT doc_id, eid FROM de QUALIFY\n"
        f"  row_number() OVER (PARTITION BY doc_id ORDER BY eid) <= {cap})\n"
        f"SELECT a.eid AS entity_a, b.eid AS entity_b, count(*) AS n_docs\n"
        f"FROM dcap a JOIN dcap b ON a.doc_id = b.doc_id AND a.eid < b.eid\n"
        f"GROUP BY a.eid, b.eid"
    )


def sql_entity_link(
    entities: list[tuple[str, str]],
    table: str = "documents",
    *,
    window: int = 50,
    prior_weight: float = 1.0,
    context_weight: float = 2.0,
) -> str:
    """Oracle for ``q_entity_link``: every accepted mention scored against
    the canonical entities sharing its surface form —
    ``score = prior_weight * ln(1 + prior) + context_weight * jaccard(window
    tokens, alias tokens)`` (stages/entity_link.score_candidates), argmax
    with (score desc, label asc, eid asc) tie-break, score rounded AFTER
    selection. Float parity: the Python side computes ``math.log(1.0 +
    prior)``, bit-identical to DuckDB ``ln`` here; jaccard is exact rational
    arithmetic in the same operation order."""
    tok = "[a-z0-9]+"
    return (
        f"WITH {sql_match_ctes(entities, table)},\n"
        f"ents AS (\n"
        f"  SELECT pname, plabel, eid, CAST(count(*) AS DOUBLE) AS prior\n"
        f"  FROM acc GROUP BY pname, plabel, eid\n"
        f"),\n"
        f"ncand AS (SELECT pname, count(*) AS n_candidates FROM ents GROUP BY pname),\n"
        f"scored AS (\n"
        f"  SELECT a.doc_id, a.pname, a.plabel, a.start, a.\"end\",\n"
        f"    e.eid AS cand_eid, e.plabel AS cand_label, e.prior,\n"
        f"    list_distinct(regexp_extract_all(e.pname, '{tok}')) AS ctx_e,\n"
        f"    list_distinct(regexp_extract_all(substr(lt.t,\n"
        f"      greatest(a.start - {window}, 0) + 1,\n"
        f"      least(a.\"end\" + {window}, lt.n) - greatest(a.start - {window}, 0)),\n"
        f"      '{tok}')) AS ctx_w\n"
        f"  FROM acc a JOIN lt USING (doc_id) JOIN ents e ON e.pname = a.pname\n"
        f"),\n"
        f"s2 AS (\n"
        f"  SELECT *, len(list_filter(ctx_e, x -> list_contains(ctx_w, x))) AS inter\n"
        f"  FROM scored\n"
        f"),\n"
        f"s3 AS (\n"
        f"  SELECT doc_id, pname, plabel, start, \"end\", cand_eid, cand_label,\n"
        f"    {prior_weight} * ln(1.0 + prior) + {context_weight} * (\n"
        f"      CASE WHEN inter > 0\n"
        f"           THEN CAST(inter AS DOUBLE) / (len(ctx_e) + len(ctx_w) - inter)\n"
        f"           ELSE 0.0 END) AS raw_score\n"
        f"  FROM s2\n"
        f"),\n"
        f"best AS (\n"
        f"  SELECT *, row_number() OVER (\n"
        f"    PARTITION BY doc_id, pname, plabel, start, \"end\"\n"
        f"    ORDER BY raw_score DESC, cand_label, cand_eid) AS rn\n"
        f"  FROM s3\n"
        f")\n"
        f"SELECT b.doc_id, b.pname AS surface_norm, b.plabel AS label,\n"
        f"  b.cand_eid AS linked_entity_id, ROUND(b.raw_score, 6) AS link_score,\n"
        f"  nc.n_candidates\n"
        f"FROM best b JOIN ncand nc ON nc.pname = b.pname WHERE rn = 1"
    )


def sql_entity_pagerank(
    entities: list[tuple[str, str]],
    table: str = "documents",
    *,
    cap: int = 64,
    n_iters: int = 3,
) -> str:
    """Oracle for ``q_entity_pagerank``: (entity_id, pr_score) — integer
    fixed-point PageRank (damping 0.85, PR_SCALE=10^12 units) over the
    entity co-occurrence graph, iterations unrolled as CTEs.

    Mirrors stages/graph_cc.pagerank op-for-op: per-edge contribution is
    ``score // deg`` (floor division — all values positive so DuckDB ``//``
    == numpy ``//``), damped as ``base + (85 * inc) // 100``; DuckDB's
    SUM(BIGINT) widens to HUGEINT, the final CAST narrows back to BIGINT
    to match the Ray side's int64."""
    pr_scale = 10**12
    base = (15 * pr_scale) // 100
    sql = (
        f"WITH {sql_match_ctes(entities, table)},\n"
        f"de AS (SELECT DISTINCT doc_id, eid FROM acc),\n"
        f"dcap AS (SELECT doc_id, eid FROM de QUALIFY\n"
        f"  row_number() OVER (PARTITION BY doc_id ORDER BY eid) <= {cap}),\n"
        f"e AS (SELECT DISTINCT a.eid AS ea, b.eid AS eb\n"
        f"      FROM dcap a JOIN dcap b ON a.doc_id = b.doc_id AND a.eid < b.eid),\n"
        f"und AS MATERIALIZED (SELECT ea AS s, eb AS d FROM e\n"
        f"  UNION ALL SELECT eb, ea FROM e),\n"
        f"deg AS MATERIALIZED (SELECT s AS node, count(*) AS deg FROM und GROUP BY s),\n"
        f"nodes AS MATERIALIZED (SELECT DISTINCT eid AS node FROM acc),\n"
        f"s0 AS (SELECT node, CAST({pr_scale} AS BIGINT) AS sc FROM nodes)"
    )
    for i in range(n_iters):
        sql += (
            f",\ns{i + 1} AS (\n"
            f"  SELECT n.node,\n"
            f"    CAST({base} + (85 * COALESCE(x.inc, 0)) // 100 AS BIGINT) AS sc\n"
            f"  FROM nodes n LEFT JOIN (\n"
            f"    SELECT u.d AS node, SUM(p.sc // g.deg) AS inc\n"
            f"    FROM und u JOIN s{i} p ON p.node = u.s JOIN deg g ON g.node = u.s\n"
            f"    GROUP BY u.d) x ON x.node = n.node)"
        )
    sql += f"\nSELECT node AS entity_id, sc AS pr_score FROM s{n_iters}"
    return sql


def sql_entity_ppr(
    entities: list[tuple[str, str]],
    seeds: list[str],
    table: str = "documents",
    *,
    cap: int = 64,
    n_iters: int = 3,
) -> str:
    """Oracle for ``q_entity_ppr``: (entity_id, ppr_score) — integer
    fixed-point Personalized PageRank over the entity co-occurrence
    graph, iterations unrolled as CTEs. Identical op-for-op to
    :func:`sql_entity_pagerank` except the restart: s0 holds PR_SCALE
    only at the ``seeds`` and the per-iteration damping base is
    seed-conditional (0 elsewhere) — mirrors
    stages/graph_cc.personalized_pagerank."""
    pr_scale = 10**12
    base = (15 * pr_scale) // 100
    seed_in = ", ".join("'" + s.replace("'", "''") + "'" for s in sorted(set(seeds)))
    sql = (
        f"WITH {sql_match_ctes(entities, table)},\n"
        f"de AS (SELECT DISTINCT doc_id, eid FROM acc),\n"
        f"dcap AS (SELECT doc_id, eid FROM de QUALIFY\n"
        f"  row_number() OVER (PARTITION BY doc_id ORDER BY eid) <= {cap}),\n"
        f"e AS (SELECT DISTINCT a.eid AS ea, b.eid AS eb\n"
        f"      FROM dcap a JOIN dcap b ON a.doc_id = b.doc_id AND a.eid < b.eid),\n"
        f"und AS MATERIALIZED (SELECT ea AS s, eb AS d FROM e\n"
        f"  UNION ALL SELECT eb, ea FROM e),\n"
        f"deg AS MATERIALIZED (SELECT s AS node, count(*) AS deg FROM und GROUP BY s),\n"
        f"nodes AS MATERIALIZED (SELECT DISTINCT eid AS node FROM acc),\n"
        f"s0 AS (SELECT node, CAST(CASE WHEN node IN ({seed_in})\n"
        f"  THEN {pr_scale} ELSE 0 END AS BIGINT) AS sc FROM nodes)"
    )
    for i in range(n_iters):
        sql += (
            f",\ns{i + 1} AS (\n"
            f"  SELECT n.node,\n"
            f"    CAST((CASE WHEN n.node IN ({seed_in}) THEN {base} ELSE 0 END)\n"
            f"      + (85 * COALESCE(x.inc, 0)) // 100 AS BIGINT) AS sc\n"
            f"  FROM nodes n LEFT JOIN (\n"
            f"    SELECT u.d AS node, SUM(p.sc // g.deg) AS inc\n"
            f"    FROM und u JOIN s{i} p ON p.node = u.s JOIN deg g ON g.node = u.s\n"
            f"    GROUP BY u.d) x ON x.node = n.node)"
        )
    sql += f"\nSELECT node AS entity_id, sc AS ppr_score FROM s{n_iters}"
    return sql


def sql_entity_triangles(
    entities: list[tuple[str, str]],
    table: str = "documents",
    *,
    cap: int = 64,
    wedge_cap: int = 256,
) -> str:
    """Oracle for ``q_entity_triangles``: (entity_id, degree, n_triangles)
    over the co-occurrence graph — wedge enumeration at the lowest-id apex
    with the same per-apex ``wedge_cap`` on the sorted out-neighbor list
    as stages/graph_cc.triangle_counts, closed against the UNCAPPED edge
    list; degree is the full undirected degree."""
    return (
        f"WITH {sql_match_ctes(entities, table)},\n"
        f"de AS (SELECT DISTINCT doc_id, eid FROM acc),\n"
        f"dcap AS (SELECT doc_id, eid FROM de QUALIFY\n"
        f"  row_number() OVER (PARTITION BY doc_id ORDER BY eid) <= {cap}),\n"
        f"e AS (SELECT DISTINCT a.eid AS s, b.eid AS d\n"
        f"      FROM dcap a JOIN dcap b ON a.doc_id = b.doc_id AND a.eid < b.eid),\n"
        f"ecap AS (SELECT s, d FROM e QUALIFY\n"
        f"  row_number() OVER (PARTITION BY s ORDER BY d) <= {wedge_cap}),\n"
        f"w AS (SELECT e1.s AS a, e1.d AS x, e2.d AS y\n"
        f"      FROM ecap e1 JOIN ecap e2 ON e2.s = e1.s AND e1.d < e2.d),\n"
        f"tri AS (SELECT w.a, w.x, w.y FROM w JOIN e ON e.s = w.x AND e.d = w.y),\n"
        f"tn AS (SELECT a AS node FROM tri UNION ALL SELECT x FROM tri\n"
        f"       UNION ALL SELECT y FROM tri),\n"
        f"und AS (SELECT s AS node FROM e UNION ALL SELECT d FROM e),\n"
        f"nodes AS (SELECT DISTINCT eid AS node FROM acc),\n"
        f"degt AS (SELECT node, count(*) AS degree FROM und GROUP BY node),\n"
        f"trit AS (SELECT node, count(*) AS n_triangles FROM tn GROUP BY node)\n"
        f"SELECT n.node AS entity_id,\n"
        f"  CAST(COALESCE(d.degree, 0) AS BIGINT) AS degree,\n"
        f"  CAST(COALESCE(t.n_triangles, 0) AS BIGINT) AS n_triangles\n"
        f"FROM nodes n LEFT JOIN degt d ON d.node = n.node\n"
        f"LEFT JOIN trit t ON t.node = n.node"
    )


def sql_relation_candidates(
    entities: list[tuple[str, str]],
    table: str = "documents",
    *,
    window: int = 40,
    cap: int = 64,
) -> str:
    """Oracle for ``q_relation_candidates``: (doc_id, subj, obj, gap) —
    directed proximity pairs of accepted mentions of different entities,
    per-doc mention list capped at the first ``cap`` rows in
    (start, end, eid) order (mirrors stages/relations.MENTION_CAP)."""
    return (
        f"WITH {sql_match_ctes(entities, table)},\n"
        f"mcap AS (SELECT doc_id, eid, start, \"end\" FROM acc QUALIFY\n"
        f"  row_number() OVER (PARTITION BY doc_id\n"
        f"    ORDER BY start, \"end\", eid) <= {cap})\n"
        f"SELECT a.doc_id, a.eid AS subj, b.eid AS obj,\n"
        f"  CAST(b.start - a.\"end\" AS BIGINT) AS gap\n"
        f"FROM mcap a JOIN mcap b ON a.doc_id = b.doc_id\n"
        f"  AND a.start < b.start AND a.eid <> b.eid\n"
        f"  AND b.start - a.\"end\" BETWEEN 0 AND {window}"
    )


def sql_entity_pmi(
    entities: list[tuple[str, str]], table: str = "documents", *, cap: int = 64
) -> str:
    """Oracle for ``q_entity_pmi``: exact-rational PMI components —
    pair doc counts use the same per-doc cap as co-occurrence; entity doc
    frequencies are UNCAPPED (both mirrored by the Ray side)."""
    return (
        f"WITH {sql_match_ctes(entities, table)},\n"
        f"de AS (SELECT DISTINCT doc_id, eid FROM acc),\n"
        f"dcap AS (SELECT doc_id, eid FROM de QUALIFY\n"
        f"  row_number() OVER (PARTITION BY doc_id ORDER BY eid) <= {cap}),\n"
        f"e AS (SELECT a.eid AS ea, b.eid AS eb, count(*) AS np\n"
        f"      FROM dcap a JOIN dcap b ON a.doc_id = b.doc_id AND a.eid < b.eid\n"
        f"      GROUP BY a.eid, b.eid),\n"
        f"df AS (SELECT eid, count(*) AS df FROM de GROUP BY eid),\n"
        f"n AS (SELECT count(*) AS n FROM {table})\n"
        f"SELECT e.ea AS entity_a, e.eb AS entity_b,\n"
        f"  CAST(e.np AS BIGINT) AS n_pair,\n"
        f"  CAST(e.np * n.n AS BIGINT) AS pmi_num,\n"
        f"  CAST(da.df * db.df AS BIGINT) AS pmi_den\n"
        f"FROM e JOIN df da ON da.eid = e.ea JOIN df db ON db.eid = e.eb\n"
        f"CROSS JOIN n"
    )


def sql_mention_contexts(
    entities: list[tuple[str, str]], table: str = "documents", *, window: int = 20
) -> str:
    """Oracle for ``q_mention_contexts``: per-mention snippet
    ``t[max(start-w,0):min(end+w,n)]`` over the lowered text (the engine's
    in-place lowercase output semantics, P7)."""
    return (
        f"WITH {sql_match_ctes(entities, table)}\n"
        f"SELECT a.doc_id, a.pname AS surface_norm,\n"
        f"  CAST(a.start AS BIGINT) AS start, CAST(a.\"end\" AS BIGINT) AS \"end\",\n"
        f"  substr(lt.t, greatest(a.start - {window}, 0) + 1,\n"
        f"    least(a.\"end\" + {window}, lt.n) - greatest(a.start - {window}, 0))"
        f" AS context\n"
        f"FROM acc a JOIN lt USING (doc_id)"
    )


def sql_entity_aliases(
    entities: list[tuple[str, str]], table: str = "documents"
) -> str:
    """Oracle for ``q_entity_aliases``: alias-normalized entity groups —
    (alias_key, label, n_surfaces, n_mentions)."""
    return (
        f"WITH {sql_match_ctes(entities, table)}\n"
        f"SELECT regexp_replace(pname, '[^a-z0-9]', '', 'g') AS alias_key,\n"
        f"  plabel AS label, CAST(count(DISTINCT pname) AS BIGINT) AS n_surfaces,\n"
        f"  CAST(count(*) AS BIGINT) AS n_mentions\n"
        f"FROM acc GROUP BY 1, 2"
    )


def sql_entity_kcore(
    entities: list[tuple[str, str]],
    table: str = "documents",
    *,
    k: int = 2,
    rounds: int = 8,
    cap: int = 64,
) -> str:
    """Oracle for ``q_entity_kcore``: (entity_id, core_deg) after exactly
    ``rounds`` unrolled peel rounds over the co-occurrence graph — the Ray
    side early-stops on the fixpoint, which converged rounds make
    value-identical (stages/graph_cc.kcore)."""
    sql = (
        f"WITH {sql_match_ctes(entities, table)},\n"
        f"de AS (SELECT DISTINCT doc_id, eid FROM acc),\n"
        f"dcap AS (SELECT doc_id, eid FROM de QUALIFY\n"
        f"  row_number() OVER (PARTITION BY doc_id ORDER BY eid) <= {cap}),\n"
        f"e AS (SELECT DISTINCT a.eid AS ea, b.eid AS eb\n"
        f"      FROM dcap a JOIN dcap b ON a.doc_id = b.doc_id AND a.eid < b.eid),\n"
        f"und AS MATERIALIZED (SELECT ea AS s, eb AS d FROM e\n"
        f"  UNION ALL SELECT eb, ea FROM e),\n"
        f"a0 AS MATERIALIZED (SELECT DISTINCT s AS node FROM und)"
    )
    # MATERIALIZED is load-bearing: DuckDB inlines CTEs by default and each
    # round references the previous alive set twice — inlining would
    # re-evaluate the whole upstream chain 2^rounds times
    for i in range(rounds):
        sql += (
            f",\nd{i} AS (SELECT u.s AS node, count(*) AS dg FROM und u\n"
            f"  JOIN a{i} x ON x.node = u.s JOIN a{i} y ON y.node = u.d\n"
            f"  GROUP BY u.s),\n"
            f"a{i + 1} AS MATERIALIZED (SELECT node FROM d{i} WHERE dg >= {k})"
        )
    sql += (
        f",\ndfin AS (SELECT u.s AS node, count(*) AS dg FROM und u\n"
        f"  JOIN a{rounds} x ON x.node = u.s JOIN a{rounds} y ON y.node = u.d\n"
        f"  GROUP BY u.s)\n"
        f"SELECT node AS entity_id, CAST(dg AS BIGINT) AS core_deg FROM dfin"
    )
    return sql


def sql_entity_postings(
    entities: list[tuple[str, str]], table: str = "documents"
) -> str:
    """Oracle for ``q_entity_postings``: per surface form the sorted
    per-mention doc-id posting list (joined) and its length."""
    return (
        f"WITH {sql_match_ctes(entities, table)}\n"
        f"SELECT pname AS surface_norm,\n"
        f"  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids_str,\n"
        f"  CAST(count(*) AS BIGINT) AS n_postings\n"
        f"FROM acc GROUP BY pname"
    )


def sql_neighborhood_jaccard(
    entities: list[tuple[str, str]],
    table: str = "documents",
    *,
    cap: int = 64,
    nb_cap: int = 256,
    min_common: int = 2,
) -> str:
    """Oracle for ``q_entity_jaccard``: exact-rational neighborhood Jaccard
    over the co-occurrence graph — both-direction adjacency, per-apex
    neighbor list capped at the ``nb_cap`` lowest ids (QUALIFY mirrors the
    numpy sort-and-slice), wedge self-join = common-neighbor counts,
    capped degrees close the union term.  AS MATERIALIZED throughout:
    DuckDB 1.0 inlines CTEs, and adj/nb are referenced 2-3 times."""
    inner = sql_entity_cooccurrence(entities, table, cap=cap)
    return (
        f"WITH edges AS MATERIALIZED ({inner}),\n"
        f"adj AS MATERIALIZED (SELECT entity_a AS a, entity_b AS b FROM edges\n"
        f"  UNION ALL SELECT entity_b, entity_a FROM edges),\n"
        f"nb AS MATERIALIZED (SELECT a, b FROM adj QUALIFY\n"
        f"  row_number() OVER (PARTITION BY a ORDER BY b) <= {nb_cap}),\n"
        f"deg AS MATERIALIZED (SELECT a, count(*) AS d FROM nb GROUP BY a),\n"
        f"wed AS (SELECT n1.b AS x, n2.b AS y FROM nb n1 JOIN nb n2\n"
        f"  ON n1.a = n2.a AND n1.b < n2.b),\n"
        f"inter AS (SELECT x, y, count(*) AS c FROM wed GROUP BY x, y)\n"
        f"SELECT x AS entity_a, y AS entity_b, CAST(c AS BIGINT) AS n_common,\n"
        f"  CAST(dx.d + dy.d - c AS BIGINT) AS n_union\n"
        f"FROM inter JOIN deg dx ON inter.x = dx.a JOIN deg dy ON inter.y = dy.a\n"
        f"WHERE c >= {min_common}"
    )


def sql_resource_allocation(
    entities: list[tuple[str, str]],
    table: str = "documents",
    *,
    cap: int = 64,
    nb_cap: int = 256,
    min_common: int = 2,
    scale: int = 10**9,
) -> str:
    """Oracle for ``q_entity_resource_alloc``: fixed-point Resource-
    Allocation index over the co-occurrence graph.  Same capped adjacency
    as ``sql_neighborhood_jaccard``; each wedge apex contributes
    ``scale // capped_degree`` (DuckDB ``//`` = integer floor division,
    matching numpy's ``//`` on positive int64), summed per pair — an
    order-independent integer sum, so the hash compare is exact."""
    inner = sql_entity_cooccurrence(entities, table, cap=cap)
    return (
        f"WITH edges AS MATERIALIZED ({inner}),\n"
        f"adj AS MATERIALIZED (SELECT entity_a AS a, entity_b AS b FROM edges\n"
        f"  UNION ALL SELECT entity_b, entity_a FROM edges),\n"
        f"nb AS MATERIALIZED (SELECT a, b FROM adj QUALIFY\n"
        f"  row_number() OVER (PARTITION BY a ORDER BY b) <= {nb_cap}),\n"
        f"deg AS MATERIALIZED (SELECT a, count(*) AS d FROM nb GROUP BY a),\n"
        f"wed AS (SELECT n1.b AS x, n2.b AS y, dg.d AS d FROM nb n1\n"
        f"  JOIN nb n2 ON n1.a = n2.a AND n1.b < n2.b\n"
        f"  JOIN deg dg ON dg.a = n1.a)\n"
        f"SELECT x AS entity_a, y AS entity_b,\n"
        f"  CAST(count(*) AS BIGINT) AS n_common,\n"
        f"  CAST(sum({scale} // d) AS BIGINT) AS ra_score\n"
        f"FROM wed GROUP BY x, y HAVING count(*) >= {min_common}"
    )


def sql_entity_bfs(
    entities: list[tuple[str, str]],
    table: str = "documents",
    *,
    k: int = 4,
    cap: int = 64,
) -> str:
    """Oracle for ``q_entity_bfs``: (entity_id, dist) — minimum hop
    distance (<= ``k``) over the co-occurrence graph from the single
    globally-smallest node, as ``k`` unrolled frontier-expansion rounds
    (semi-naive evaluation: each round joins the previous frontier to the
    adjacency and NOT-EXISTS-drops visited nodes — exactly the Ray side's
    semi-join + anti-join round in stages/graph_cc.bfs_distances)."""
    sql = (
        f"WITH {sql_match_ctes(entities, table)},\n"
        f"de AS (SELECT DISTINCT doc_id, eid FROM acc),\n"
        f"dcap AS (SELECT doc_id, eid FROM de QUALIFY\n"
        f"  row_number() OVER (PARTITION BY doc_id ORDER BY eid) <= {cap}),\n"
        f"e AS (SELECT DISTINCT a.eid AS ea, b.eid AS eb\n"
        f"      FROM dcap a JOIN dcap b ON a.doc_id = b.doc_id AND a.eid < b.eid),\n"
        f"und AS MATERIALIZED (SELECT ea AS s, eb AS d FROM e\n"
        f"  UNION ALL SELECT eb, ea FROM e),\n"
        f"v0 AS MATERIALIZED (SELECT min(s) AS node, 0 AS dist FROM und\n"
        f"  WHERE s IS NOT NULL)"
    )
    # MATERIALIZED per round: each v{i} is referenced twice (frontier join
    # + NOT EXISTS visited check) — inlining would re-evaluate the chain
    # exponentially (same reasoning as sql_entity_kcore)
    for i in range(1, k + 1):
        sql += (
            f",\nn{i} AS (SELECT DISTINCT u.d AS node FROM und u\n"
            f"  JOIN v{i - 1} p ON p.node = u.s AND p.dist = {i - 1}),\n"
            f"v{i} AS MATERIALIZED (SELECT node, dist FROM v{i - 1}\n"
            f"  UNION ALL\n"
            f"  SELECT f.node, {i} AS dist FROM n{i} f\n"
            f"  WHERE NOT EXISTS (SELECT 1 FROM v{i - 1} w WHERE w.node = f.node))"
        )
    sql += (
        f"\nSELECT node AS entity_id, CAST(dist AS BIGINT) AS dist FROM v{k}\n"
        f"WHERE node IS NOT NULL"
    )
    return sql


def sql_kg_negative_samples(
    entities: list[tuple[str, str]], table: str = "documents"
) -> str:
    """Oracle for ``q_kg_negative_samples``: (subj, pred, obj, neg_obj) —
    one row per accepted mention; neg_obj is the deterministic hash-pick
    from the OCCURRING entity universe (sorted, 0-indexed), bumped one
    slot when the pick equals the true obj (stages/relations.py
    kg_negative_samples)."""
    return (
        f"WITH {sql_match_ctes(entities, table)},\n"
        f"el AS (SELECT eid, row_number() OVER (ORDER BY eid) - 1 AS i\n"
        f"  FROM (SELECT DISTINCT eid FROM acc)),\n"
        f"nn AS (SELECT count(*) AS n FROM el),\n"
        f"pick AS (SELECT CAST(doc_id AS VARCHAR) AS subj, plabel AS pred,\n"
        f"  eid AS obj,\n"
        f"  CAST(md5_number_upper(CAST(doc_id AS VARCHAR) || '|' || plabel\n"
        f"    || '|' || eid) % nn.n AS BIGINT) AS i0,\n"
        f"  nn.n AS n FROM acc, nn)\n"
        f"SELECT p.subj, p.pred, p.obj,\n"
        f"  CASE WHEN e0.eid <> p.obj THEN e0.eid ELSE e1.eid END AS neg_obj\n"
        f"FROM pick p JOIN el e0 ON e0.i = p.i0\n"
        f"  JOIN el e1 ON e1.i = (p.i0 + 1) % p.n"
    )


def sql_entity_salience(
    entities: list[tuple[str, str]], table: str = "documents"
) -> str:
    """Oracle for ``q_entity_salience``: per (doc, entity) the mention
    count, first-mention char offset and document char length."""
    return (
        f"WITH {sql_match_ctes(entities, table)}\n"
        f"SELECT a.doc_id, a.eid AS entity_id, a.plabel AS label,\n"
        f"  CAST(count(*) AS BIGINT) AS n_mentions,\n"
        f"  CAST(min(a.start) AS BIGINT) AS first_start,\n"
        f"  CAST(min(lt.n) AS BIGINT) AS n_chars\n"
        f"FROM acc a JOIN lt ON a.doc_id = lt.doc_id\n"
        f"GROUP BY a.doc_id, a.eid, a.plabel"
    )


def sql_kg_prep_canonical(
    entities: list[tuple[str, str]],
    table: str = "documents",
    *,
    min_len: int = 100,
    max_len: int = 300,
) -> str:
    """Oracle for ``q_kg_prep_canonical``: the ENTIRE curation-to-KG chain
    composed into one statement — P1 byte-length filter, exact content
    dedup keeping the min doc_id per distinct text, then the boundary-rule
    match CTEs over the surviving subset and the canonical-entity
    aggregate."""
    return (
        f"WITH kept AS (\n"
        f"  SELECT doc_id, text FROM {table}\n"
        f"  WHERE strlen(text) > 0 AND strlen(text) >= {min_len}\n"
        f"    AND strlen(text) <= {max_len}\n"
        f"  QUALIFY row_number() OVER (PARTITION BY md5(text)"
        f" ORDER BY doc_id) = 1\n"
        f"),\n"
        f"{sql_match_ctes(entities, 'kept')}\n"
        f"SELECT pname AS surface_norm, plabel AS label,\n"
        f"       count(*) AS n_mentions, eid AS entity_id\n"
        f"FROM acc GROUP BY pname, plabel, eid"
    )


def sql_entity_timeline(
    entities: list[tuple[str, str]], table: str = "documents", *, n_snapshots: int = 8
) -> str:
    """Oracle for ``q_entity_timeline``: (surface_norm, label, first_snap,
    last_snap, n_snaps, n_mentions, entity_id) — temporal provenance per
    canonical entity over derived crawl snapshots ``doc_id % n_snapshots``."""
    return (
        f"WITH {sql_match_ctes(entities, table)}\n"
        f"SELECT pname AS surface_norm, plabel AS label,\n"
        f"       min(doc_id % {n_snapshots}) AS first_snap,\n"
        f"       max(doc_id % {n_snapshots}) AS last_snap,\n"
        f"       count(DISTINCT doc_id % {n_snapshots}) AS n_snaps,\n"
        f"       count(*) AS n_mentions, eid AS entity_id\n"
        f"FROM acc GROUP BY pname, plabel, eid"
    )


def sql_entity_random_walks(
    entities: list[tuple[str, str]],
    table: str = "documents",
    *,
    cap: int = 64,
    walk_len: int = 4,
) -> str:
    """Oracle for ``q_entity_random_walks``: (start, step, node) — one
    deterministic hash-seeded walk per canonical entity over the
    co-occurrence graph, steps unrolled as CTEs. Transition = argmin of
    ``md5_number_upper(cur || '|step|' || v)`` over neighbors (== the Ray
    side's h64), ties by v; dead ends drop out of later steps."""
    sql = (
        f"WITH {sql_match_ctes(entities, table)},\n"
        f"de AS (SELECT DISTINCT doc_id, eid FROM acc),\n"
        f"dcap AS (SELECT doc_id, eid FROM de QUALIFY\n"
        f"  row_number() OVER (PARTITION BY doc_id ORDER BY eid) <= {cap}),\n"
        f"e AS (SELECT DISTINCT a.eid AS ea, b.eid AS eb\n"
        f"      FROM dcap a JOIN dcap b ON a.doc_id = b.doc_id AND a.eid < b.eid),\n"
        f"und AS MATERIALIZED (SELECT ea AS s, eb AS d FROM e\n"
        f"  UNION ALL SELECT eb, ea FROM e),\n"
        f"nodes AS MATERIALIZED (SELECT DISTINCT eid AS node FROM acc),\n"
        f"w0 AS (SELECT node AS start, node AS cur FROM nodes)"
    )
    for i in range(1, walk_len + 1):
        sql += (
            f",\nc{i} AS (SELECT s AS cur, d AS nxt FROM und QUALIFY\n"
            f"  row_number() OVER (PARTITION BY s\n"
            f"    ORDER BY md5_number_upper(s || '|{i}|' || d), d) = 1),\n"
            f"w{i} AS (SELECT w.start, c.nxt AS cur\n"
            f"        FROM w{i - 1} w JOIN c{i} c ON c.cur = w.cur)"
        )
    selects = "\nUNION ALL ".join(
        f"SELECT start, CAST({i} AS BIGINT) AS step, cur AS node FROM w{i}"
        for i in range(walk_len + 1)
    )
    return sql + "\n" + selects


def sql_fact_corroboration(
    entities: list[tuple[str, str]],
    table: str = "documents",
    *,
    min_sources: int = 2,
) -> str:
    """Oracle for ``q_fact_corroboration``: (surface_norm, label,
    n_sources, n_mentions, corroborated, entity_id) — distinct-source
    support per canonical fact; mentions inherit their document's
    ``source`` column."""
    return (
        f"WITH {sql_match_ctes(entities, table)},\n"
        f"src AS (SELECT doc_id, source FROM {table})\n"
        f"SELECT a.pname AS surface_norm, a.plabel AS label,\n"
        f"       count(DISTINCT s.source) AS n_sources,\n"
        f"       count(*) AS n_mentions,\n"
        f"       CAST(count(DISTINCT s.source) >= {min_sources} AS BIGINT)\n"
        f"         AS corroborated,\n"
        f"       a.eid AS entity_id\n"
        f"FROM acc a JOIN src s ON s.doc_id = a.doc_id\n"
        f"GROUP BY a.pname, a.plabel, a.eid"
    )


def sql_source_reliability(
    entities: list[tuple[str, str]],
    table: str = "documents",
    *,
    min_sources: int = 2,
) -> str:
    """Oracle for ``q_source_reliability``: (source, n_facts,
    n_corroborated) — per source, distinct facts asserted and how many
    are asserted by >= ``min_sources`` distinct sources overall."""
    return (
        f"WITH {sql_match_ctes(entities, table)},\n"
        f"src AS (SELECT doc_id, source FROM {table}),\n"
        f"fs AS (SELECT DISTINCT a.pname, a.plabel, s.source\n"
        f"       FROM acc a JOIN src s ON s.doc_id = a.doc_id),\n"
        f"ns AS (SELECT pname, plabel, count(*) AS n_sources\n"
        f"       FROM fs GROUP BY pname, plabel)\n"
        f"SELECT fs.source, count(*) AS n_facts,\n"
        f"       CAST(count(*) FILTER (ns.n_sources >= {min_sources})\n"
        f"         AS BIGINT) AS n_corroborated\n"
        f"FROM fs JOIN ns ON ns.pname = fs.pname AND ns.plabel = fs.plabel\n"
        f"GROUP BY fs.source"
    )


def sql_canonical_entities_delta(
    entities: list[tuple[str, str]], table: str = "documents"
) -> str:
    """Oracle for ``q_canonical_entities_delta``: entity-level diff of the
    even-doc (old) vs odd-doc (new) crawls — (surface_norm, label, n_old,
    n_new, status, entity_id)."""
    return (
        f"WITH {sql_match_ctes(entities, table)}\n"
        f"SELECT pname AS surface_norm, plabel AS label,\n"
        f"       count(*) FILTER (doc_id % 2 = 0) AS n_old,\n"
        f"       count(*) FILTER (doc_id % 2 = 1) AS n_new,\n"
        f"       CASE WHEN count(*) FILTER (doc_id % 2 = 0) = 0 THEN 'added'\n"
        f"            WHEN count(*) FILTER (doc_id % 2 = 1) = 0 THEN 'removed'\n"
        f"            WHEN count(*) FILTER (doc_id % 2 = 0)\n"
        f"              <> count(*) FILTER (doc_id % 2 = 1) THEN 'changed'\n"
        f"            ELSE 'same' END AS status,\n"
        f"       eid AS entity_id\n"
        f"FROM acc GROUP BY pname, plabel, eid"
    )


def sql_entity_trend(
    entities: list[tuple[str, str]], table: str = "documents", *, n_snapshots: int = 8
) -> str:
    """Oracle for ``q_entity_trend``: exact integer regression-slope
    numerator of per-snapshot mention counts,
    ``K * Σ(mention snap) − ΣS * count``."""
    sum_s = n_snapshots * (n_snapshots - 1) // 2
    return (
        f"WITH {sql_match_ctes(entities, table)}\n"
        f"SELECT pname AS surface_norm, plabel AS label,\n"
        f"       count(*) AS n_mentions,\n"
        f"       CAST({n_snapshots} * sum(doc_id % {n_snapshots})\n"
        f"            - {sum_s} * count(*) AS BIGINT) AS slope_num,\n"
        f"       eid AS entity_id\n"
        f"FROM acc GROUP BY pname, plabel, eid"
    )


def sql_entity_communities(
    entities: list[tuple[str, str]],
    table: str = "documents",
    *,
    cap: int = 64,
    n_rounds: int = 3,
) -> str:
    """Oracle for ``q_entity_communities``: synchronous label propagation
    over the co-occurrence graph, rounds unrolled as CTEs. Vote = most
    frequent neighbor label, ties by smallest label; voteless nodes keep
    their previous label (COALESCE against the prior round)."""
    sql = (
        f"WITH {sql_match_ctes(entities, table)},\n"
        f"de AS (SELECT DISTINCT doc_id, eid FROM acc),\n"
        f"dcap AS (SELECT doc_id, eid FROM de QUALIFY\n"
        f"  row_number() OVER (PARTITION BY doc_id ORDER BY eid) <= {cap}),\n"
        f"e AS (SELECT DISTINCT a.eid AS ea, b.eid AS eb\n"
        f"      FROM dcap a JOIN dcap b ON a.doc_id = b.doc_id AND a.eid < b.eid),\n"
        f"und AS MATERIALIZED (SELECT ea AS s, eb AS d FROM e\n"
        f"  UNION ALL SELECT eb, ea FROM e),\n"
        f"nodes AS MATERIALIZED (SELECT DISTINCT eid AS node FROM acc),\n"
        f"l0 AS (SELECT node, node AS lab FROM nodes)"
    )
    for r in range(1, n_rounds + 1):
        sql += (
            f",\nv{r} AS (SELECT u.d AS node, p.lab, count(*) AS c\n"
            f"  FROM und u JOIN l{r - 1} p ON p.node = u.s GROUP BY u.d, p.lab),\n"
            f"w{r} AS (SELECT node, lab FROM v{r} QUALIFY\n"
            f"  row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) = 1),\n"
            f"l{r} AS (SELECT n.node, COALESCE(w.lab, p.lab) AS lab\n"
            f"  FROM nodes n LEFT JOIN w{r} w ON w.node = n.node\n"
            f"  JOIN l{r - 1} p ON p.node = n.node)"
        )
    return sql + f"\nSELECT node AS entity_id, lab AS community FROM l{n_rounds}"


def sql_entity_fastrp(
    entities: list[tuple[str, str]],
    table: str = "documents",
    *,
    cap: int = 64,
    dims: int = 4,
) -> str:
    """Oracle for ``q_entity_fastrp``: exact-integer FastRP moments over
    the co-occurrence graph — h1 = A·R, h2 = A²·R with the hash-derived
    ±1/0 projection ``(md5_number_upper(node || '|k') % 3) - 1``."""
    h1 = ",\n       ".join(
        f"CAST(sum(CAST(md5_number_upper(d || '|{k}') % 3 AS BIGINT) - 1)"
        f" AS BIGINT) AS h1_{k}"
        for k in range(dims)
    )
    h2 = ", ".join(
        f"CAST(sum(r.h1_{k}) AS BIGINT) AS h2_{k}" for k in range(dims)
    )
    h1_sel = ", ".join(f"r.h1_{k}" for k in range(dims))
    h2_sel = ", ".join(f"r2.h2_{k}" for k in range(dims))
    return (
        f"WITH {sql_match_ctes(entities, table)},\n"
        f"de AS (SELECT DISTINCT doc_id, eid FROM acc),\n"
        f"dcap AS (SELECT doc_id, eid FROM de QUALIFY\n"
        f"  row_number() OVER (PARTITION BY doc_id ORDER BY eid) <= {cap}),\n"
        f"e AS (SELECT DISTINCT a.eid AS ea, b.eid AS eb\n"
        f"      FROM dcap a JOIN dcap b ON a.doc_id = b.doc_id AND a.eid < b.eid),\n"
        f"und AS MATERIALIZED (SELECT ea AS s, eb AS d FROM e\n"
        f"  UNION ALL SELECT eb, ea FROM e),\n"
        f"r AS (SELECT s AS node,\n       {h1}\n     FROM und GROUP BY s),\n"
        f"r2 AS (SELECT u.s AS node, {h2}\n"
        f"       FROM und u JOIN r ON r.node = u.d GROUP BY u.s)\n"
        f"SELECT r.node AS entity_id, {h1_sel}, {h2_sel}\n"
        f"FROM r JOIN r2 ON r2.node = r.node"
    )


def sql_entity_context_features(
    entities: list[tuple[str, str]],
    table: str = "documents",
    *,
    window: int = 20,
    dims: int = 16,
) -> str:
    """Oracle for ``q_entity_context_features``: hashed bag-of-context-words
    per canonical entity — KWIC window tokens bucketed by
    ``md5_number_upper(token) % dims`` (== the Ray side's h64)."""
    fcols = ",\n       ".join(
        f"count(*) FILTER (CAST(md5_number_upper(w) % {dims} AS BIGINT) = {k})"
        f" AS f{k}"
        for k in range(dims)
    )
    return (
        f"WITH {sql_match_ctes(entities, table)},\n"
        f"ctx AS (SELECT a.pname, a.plabel, a.eid,\n"
        f"  substr(lt.t, greatest(a.start - {window}, 0) + 1,\n"
        f"    least(a.\"end\" + {window}, lt.n) - greatest(a.start - {window}, 0))"
        f" AS context\n"
        f"  FROM acc a JOIN lt USING (doc_id)),\n"
        f"tok AS (SELECT pname, plabel, eid,\n"
        f"  unnest(regexp_extract_all(context, '[a-z0-9]+')) AS w FROM ctx)\n"
        f"SELECT pname AS surface_norm, plabel AS label,\n       {fcols},\n"
        f"       eid AS entity_id\n"
        f"FROM tok GROUP BY pname, plabel, eid"
    )
