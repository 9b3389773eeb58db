"""Plan explanation for the BGP planners — the EXPLAIN a query engine
owes its operators.

``explain_bgp`` reports, WITHOUT executing the query, the fold order
``bgp_match`` would run under each planner mode and the per-pattern
cardinality figure that order was derived from:

- ``plan="stats"``  — synopsis estimates (zero scans; the serving path)
- ``plan="cardinality"`` — exact leaf counts (one shared scan)
- ``plan="given"``  — the caller's order, no figures

``explain_select`` lifts the same report to SPARQL text via
kernel/sparql.parse_select. Output is a driver-side pyarrow Table (one
row per pattern — plan-sized, never data-sized).

No reference counterpart (file:line n/a — quickner has no query layer).
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["explain_bgp", "explain_select"]


def _render_term(t) -> str:
    if isinstance(t, tuple):
        return repr(t)  # path expression
    return t


def _render(p) -> str:
    return " ".join(_render_term(t) for t in p)


def explain_bgp(
    patterns,
    *,
    stats: dict | None = None,
    triples=None,
    cols=("subj", "pred", "obj"),
) -> pa.Table:
    """One row per pattern IN FOLD ORDER: (step, pattern, figure, mode).
    Pass ``stats`` (sinks/triplestore.read_store_stats) for synopsis
    estimates, ``triples`` for exact shared-scan counts, neither for the
    given order. Connectivity violations raise exactly like bgp_match."""
    from .bgp import (
        _greedy_fold,
        estimate_pattern_counts,
        pattern_counts,
        plan_patterns,
        plan_patterns_stats,
    )

    if stats is not None:
        mode = "stats"
        figures = estimate_pattern_counts(stats, patterns)
        order = plan_patterns_stats(stats, patterns)
    elif triples is not None:
        mode = "cardinality"
        figures = [float(n) for n in pattern_counts(
            triples, patterns, cols=tuple(cols)
        )]
        order = plan_patterns(triples, patterns, cols=tuple(cols))
    else:
        mode = "given"
        figures = [float("nan")] * len(patterns)
        order = list(patterns)
    # match reordered patterns back to their figures by value (patterns
    # are hashable tuples; duplicates share a figure, which is correct)
    val_fig = {}
    for p, f in zip(patterns, figures):
        val_fig.setdefault(p, f)
    return pa.table(
        {
            "step": pa.array(range(1, len(order) + 1), type=pa.int64()),
            "pattern": pa.array([_render(p) for p in order], type=pa.string()),
            "figure": pa.array(
                [val_fig[p] for p in order], type=pa.float64()
            ),
            "mode": pa.array([mode] * len(order), type=pa.string()),
        }
    )


def explain_select(
    query: str,
    *,
    stats: dict | None = None,
    triples=None,
) -> pa.Table:
    """EXPLAIN for SPARQL text: parses the SELECT and reports the fold
    order of its required patterns (OPTIONAL / EXISTS / NOT EXISTS apply
    after the fold in declaration order and are listed with step 0).
    UNION queries explain each branch separately is NOT supported here —
    explain the branches individually."""
    from ..kernel.sparql import SparqlError, parse_select

    q = parse_select(query)
    if q["unions"]:
        raise SparqlError("explain each UNION branch separately")
    base = explain_bgp(q["patterns"], stats=stats, triples=triples)
    extras = []
    for kind, group in (
        ("optional", q["optional"]),
        ("exists", q.get("exists", ())),
        ("not_exists", q["not_exists"]),
    ):
        for p in group:
            extras.append((f"{kind}: {_render(p)}"))
    if not extras:
        return base
    tail = pa.table(
        {
            "step": pa.array([0] * len(extras), type=pa.int64()),
            "pattern": pa.array(extras, type=pa.string()),
            "figure": pa.array([float("nan")] * len(extras),
                               type=pa.float64()),
            "mode": pa.array(["post-fold"] * len(extras), type=pa.string()),
        }
    )
    return pa.concat_tables([base, tail])
