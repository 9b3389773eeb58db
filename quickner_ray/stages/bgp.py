"""SPARQL-style Basic Graph Pattern (BGP) matching over a triples Dataset.

A KG is queried, not just built: the BGP evaluator takes a list of
(subject, predicate, object) patterns — constants bind, ``?name`` terms
are variables — and returns the DISTINCT variable bindings satisfying
every pattern simultaneously (the conjunctive-query core of SPARQL).
``optional=`` adds SPARQL OPTIONAL patterns (null-preserving left outer
join, unbound rendered as '') and ``not_exists=`` adds FILTER NOT
EXISTS (anti-join) — together the monotone core + the two most-used
non-monotone SPARQL verbs.

Execution shape (idiomatic Ray Data, no driver loops):
- each pattern compiles to ONE vectorized ``map_batches`` filter+project
  over the triples stream (constants as ``pc.equal`` masks, repeated
  variables as intra-pattern equality masks),
- patterns fold left-to-right through a bucketed hash join on their
  shared variables: tag-union both sides, ONE groupby shuffle on an
  md5-derived bucket of the join key (kernel/md5vec — vectorized), then
  Arrow's C++ ``Table.join`` inside each bucket. This is the same
  one-exchange shape as every other custom join in the repo and avoids
  the per-join actor-pool spin-up of ``Dataset.join`` (engine="native"
  keeps the built-in available; at tiny scale the bucket path measured
  ~6x faster end-to-end). Patterns are ordered so every fold shares at
  least one variable (a cross product is refused loudly),
- a final bounded groupby makes the bindings DISTINCT (SQL
  ``SELECT DISTINCT`` semantics, so the DuckDB oracle hash-matches).

Selectivity note: put the most selective pattern first — the fold joins
against its (small) bindings — or pass ``plan="cardinality"`` to let the
engine measure every pattern's exact match count in one shared scan and
fold smallest-first itself (``plan_patterns``). At store scale, feed
patterns from the permutation-index ``lookup`` (sinks/triplestore.py)
instead of the full stream so each pattern reads only admitting
fragments.

No counterpart in the reference (file:line n/a — quickner has no query
layer); this is the KG-consumption step a construction pipeline feeds.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .hashjoin import bucketed_join
from .temporal import _default_buckets


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _pattern_ds(triples, pattern, cols: tuple[str, str, str]):
    """One pattern -> Dataset of its variable bindings (renamed columns)."""
    terms = list(zip(pattern, cols))
    out_vars: list[tuple[str, str]] = []  # (var_name, source_col)
    seen: dict[str, str] = {}
    eq_pairs: list[tuple[str, str]] = []
    for term, col in terms:
        if _is_var(term):
            name = term[1:]
            if name in seen:  # repeated variable: intra-pattern equality
                eq_pairs.append((seen[name], col))
            else:
                seen[name] = col
                out_vars.append((name, col))
    if not out_vars:
        raise ValueError(f"pattern {pattern!r} binds no variables")

    def f(b: pa.Table) -> pa.Table:
        mask = None
        for term, col in terms:
            if not _is_var(term):
                m = pc.equal(b.column(col), pa.scalar(term))
                mask = m if mask is None else pc.and_(mask, m)
        for ca, cb in eq_pairs:
            m = pc.equal(b.column(ca), b.column(cb))
            mask = m if mask is None else pc.and_(mask, m)
        t = b if mask is None else b.filter(mask)
        out = pa.table({name: t.column(col) for name, col in out_vars})
        # batch-local distinct: mentions repeat Zipf-style within a block;
        # dropping duplicates BEFORE the hash join bounds the join fan-out
        # (the final bounded groupby still guarantees global DISTINCT)
        return out.group_by(out.column_names).aggregate([])

    return triples.map_batches(f, batch_format="pyarrow"), [n for n, _ in out_vars]


def _pattern_vars(pattern) -> set[str]:
    return {t[1:] for t in pattern if isinstance(t, str) and _is_var(t)}


def pattern_counts(triples, patterns, *, cols: tuple) -> list[int]:
    """Exact per-pattern match cardinalities in ONE shared scan: every
    pattern's constant/repeated-variable mask is evaluated per batch
    (vectorized), the per-batch counts are a #patterns-bounded partial
    table, and a tiny groupby-sum finishes. Cost: one extra pass over the
    stream — trivially cheaper than folding joins in a bad order."""
    from ray.data.aggregate import Sum

    specs = []
    for p in patterns:
        consts: list[tuple[str, str]] = []
        seen: dict[str, str] = {}
        eq_pairs: list[tuple[str, str]] = []
        for term, col in zip(p, cols):
            if _is_var(term):
                name = term[1:]
                if name in seen:
                    eq_pairs.append((seen[name], col))
                else:
                    seen[name] = col
            else:
                consts.append((term, col))
        specs.append((consts, eq_pairs))

    def f(b: pa.Table) -> pa.Table:
        ns = []
        for consts, eq_pairs in specs:
            mask = None
            for term, col in consts:
                m = pc.equal(b.column(col), pa.scalar(term))
                mask = m if mask is None else pc.and_(mask, m)
            for ca, cb in eq_pairs:
                m = pc.equal(b.column(ca), b.column(cb))
                mask = m if mask is None else pc.and_(mask, m)
            if mask is None:
                ns.append(b.num_rows)
            else:
                ns.append(int(pc.sum(mask).as_py() or 0))
        return pa.table(
            {
                "i": pa.array(range(len(specs)), type=pa.int64()),
                "n": pa.array(ns, type=pa.int64()),
            }
        )

    agg = (
        triples.map_batches(f, batch_format="pyarrow")
        .groupby("i")
        .aggregate(Sum("n", alias_name="n"))
    )
    out = [0] * len(specs)
    for r in agg.take_all():  # #patterns rows — driver-side by design
        out[r["i"]] = r["n"]
    return out


def _greedy_fold(patterns, counts):
    """Shared planner core: greedily fold smallest-count-first under the
    connectivity constraint (each next pattern must share a variable
    with the already-bound set — the same rule bgp_match enforces)."""
    remaining = list(range(len(patterns)))
    # seed: globally smallest pattern
    first = min(remaining, key=lambda i: (counts[i], i))
    order = [first]
    remaining.remove(first)
    bound = _pattern_vars(patterns[first])
    while remaining:
        connected = [
            i for i in remaining if bound & _pattern_vars(patterns[i])
        ]
        if not connected:
            raise ValueError(
                "disconnected BGP: no shared variable with remaining "
                f"patterns (bound={sorted(bound)})"
            )
        nxt = min(connected, key=lambda i: (counts[i], i))
        order.append(nxt)
        remaining.remove(nxt)
        bound |= _pattern_vars(patterns[nxt])
    return [patterns[i] for i in order]


def plan_patterns(triples, patterns, *, cols=("subj", "pred", "obj")):
    """Cardinality-based join ordering: measure every pattern's exact
    match count (one shared scan), then fold via _greedy_fold. Returns
    the reordered pattern list. Path patterns (tuple predicate) are not
    countable in the shared scan and are refused."""
    if any(isinstance(p[1], tuple) for p in patterns):
        raise ValueError("plan_patterns does not support path patterns")
    if len(patterns) <= 1:
        return list(patterns)
    return _greedy_fold(
        patterns, pattern_counts(triples, patterns, cols=tuple(cols))
    )


def estimate_pattern_counts(stats: dict, patterns) -> list[float]:
    """Selectivity estimates from the triple store's per-predicate
    synopsis (sinks/triplestore.read_store_stats) — NO scan, no Ray:
    a bound predicate prices at its distinct-triple count; each bound
    endpoint divides by the predicate's distinct count on that position
    (uniformity assumption, the System-R rule); an unbound predicate
    prices at the store totals. Estimates order joins, they never answer
    queries — a skewed key mis-prices the order, not the result."""
    preds, total = stats["preds"], stats["total"]
    out: list[float] = []
    for p in patterns:
        if isinstance(p[1], tuple):
            raise ValueError(
                "estimate_pattern_counts does not support path patterns"
            )
        s, pr, o = p[0], p[1], p[2]  # a 4th (graph) term never tightens
        # the estimate: the synopsis has no per-graph counts (safe upper)
        if _is_var(pr):
            n, n_subj, n_obj = total
        else:
            n, n_subj, n_obj = preds.get(pr, (0, 1, 1))
        est = float(n)
        if not _is_var(s):
            est /= max(n_subj, 1)
        if not _is_var(o):
            est /= max(n_obj, 1)
        out.append(est)
    return out


def plan_patterns_stats(stats: dict, patterns):
    """Join ordering from the store synopsis alone — the planner a
    10^12-triple BGP needs (the exact-count path scans once; this
    answers from a #predicates-row table)."""
    if len(patterns) <= 1:
        return list(patterns)
    return _greedy_fold(patterns, estimate_pattern_counts(stats, patterns))


def bgp_match(
    triples,
    patterns,
    *,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    num_partitions: int | None = None,
    engine: str = "bucket",
    pattern_source=None,
    optional=(),
    exists=(),
    not_exists=(),
    plan: str = "given",
    stats: dict | None = None,
    graph_col: str = "graph",
):
    """Match every pattern conjunctively; return DISTINCT variable
    bindings as a Dataset with one column per variable.

    ``pattern_source`` (optional): callable pattern -> Dataset supplying
    each pattern's triples individually — pass a permutation-index
    ``lookup`` (sinks/triplestore.py) so a bound-predicate pattern reads
    ONLY admitting index fragments instead of scanning the full stream;
    the vectorized constant masks still apply on top.

    ``optional``: SPARQL OPTIONAL patterns — each left-outer-joins the
    required bindings on its shared variables; its new variables stay in
    the output with the SPARQL-unbound rendered as ``''`` (empty string,
    not null, so downstream groupbys and the driver's value-hash compare
    stay null-free; '' cannot collide because entity ids are non-empty).

    ``exists``: SPARQL FILTER EXISTS patterns — each semi-joins the
    bindings on its shared variables, keeping only bindings WITH a
    match; its variables never join the output.

    ``not_exists``: SPARQL FILTER NOT EXISTS patterns — each anti-joins
    the bindings on its shared variables, keeping only bindings with NO
    match; its variables never join the output."""
    from ray.data.aggregate import Count

    if not patterns:
        raise ValueError("bgp_match needs at least one pattern")
    if plan not in ("given", "cardinality", "stats"):
        raise ValueError(f"unknown plan {plan!r}")
    for p in (*patterns, *optional, *exists, *not_exists):
        if len(p) not in (3, 4):
            raise ValueError(f"pattern needs 3 or 4 terms, got {p!r}")
        if len(p) == 4 and isinstance(p[1], tuple):
            raise ValueError(f"path patterns cannot be graph-scoped: {p!r}")
    nparts = num_partitions or max(32, _default_buckets() // 4)
    # quad patterns (4 terms) zip their 4th term against graph_col — a
    # 3-term pattern over a quad stream matches ANY graph (the
    # union-default-graph configuration; GRAPH scoping restricts/binds)
    cols = (subj_col, pred_col, obj_col, graph_col)
    all_pats = (*patterns, *optional, *exists, *not_exists)
    # Every arm that reads the lazy ``triples`` stream re-executes its
    # WHOLE upstream (the NER scan, at stream scale) — Ray branches a
    # lazy Dataset per consumer. Count the consumers (non-path arms when
    # no pattern_source routes them to the store, path arms always, the
    # cardinality planner's shared scan) and, when more than one, project
    # the stream to just the matched columns and materialize ONCE —
    # triple-sized blocks in the object store (spillable), never the
    # corpus, mirroring the multi-aggregate fold (kernel/sparql
    # _aggregate). Store-backed evaluation (pattern_source=lookup) is
    # untouched: its arms read pruned index fragments, not the stream.
    n_stream_consumers = (plan == "cardinality" and len(patterns) > 1) + sum(
        1
        for p in all_pats
        if isinstance(p[1], tuple) or pattern_source is None
    )
    if n_stream_consumers > 1:
        keep = [subj_col, pred_col, obj_col]
        if any(len(p) == 4 for p in all_pats):
            keep.append(graph_col)
        triples = triples.select_columns(keep).materialize()
    if plan == "cardinality":
        # exact leaf cardinalities from one shared scan pick the fold
        # order (smallest bindings first); answers are order-independent
        patterns = plan_patterns(triples, patterns, cols=cols)
    elif plan == "stats":
        # synopsis-estimated cardinalities — zero scans, the right
        # planner when evaluating against the permutation store
        if stats is None:
            raise ValueError('plan="stats" needs the stats= synopsis')
        patterns = plan_patterns_stats(stats, patterns)

    def compile_one(p):
        if isinstance(p[1], tuple):  # property-path predicate (paths.eval_path
            # expr): both endpoints must be variables; bindings come from the
            # path evaluation and join into the fold like any other pattern
            sv, expr, ov = p
            if not (_is_var(sv) and _is_var(ov)):
                raise ValueError(
                    f"path pattern {p!r} needs variable endpoints"
                )
            from .paths import eval_path

            pairs = eval_path(
                triples,
                expr,
                subj_col=subj_col,
                pred_col=pred_col,
                obj_col=obj_col,
                n_buckets=nparts,
            )
            if sv == ov:  # cycle constraint: same var at both ends
                one = pairs.map_batches(
                    lambda b: pa.table(
                        {sv[1:]: b.filter(
                            pc.equal(b.column("src"), b.column("dst"))
                        ).column("src")}
                    ),
                    batch_format="pyarrow",
                )
                return one, [sv[1:]]
            renamed = pairs.map_batches(
                lambda b: pa.table(
                    {sv[1:]: b.column("src"), ov[1:]: b.column("dst")}
                ),
                batch_format="pyarrow",
            )
            return renamed, [sv[1:], ov[1:]]
        return _pattern_ds(pattern_source(p) if pattern_source else triples, p, cols)

    compiled = [compile_one(p) for p in patterns]
    acc, acc_vars = compiled[0]
    bound = set(acc_vars)
    pending = list(compiled[1:])
    while pending:
        # pick the next pattern sharing a variable (refuse cross products)
        idx = next(
            (i for i, (_, vs) in enumerate(pending) if bound & set(vs)), None
        )
        if idx is None:
            raise ValueError(
                "disconnected BGP: no shared variable with remaining "
                f"patterns (bound={sorted(bound)})"
            )
        nxt, nxt_vars = pending.pop(idx)
        shared = tuple(sorted(bound & set(nxt_vars)))
        if engine == "native":
            acc = acc.join(nxt, "inner", nparts, on=shared)
        else:
            acc = bucketed_join(
                acc,
                nxt,
                on=shared,
                n_buckets=nparts,
                left_types={v: pa.string() for v in sorted(bound)},
                right_types={v: pa.string() for v in nxt_vars},
            )
        bound |= set(nxt_vars)

    for side_type, group in (
        ("left outer", optional),
        ("left semi", exists),  # FILTER EXISTS: keep bindings WITH a match
        ("left anti", not_exists),
    ):
        for p in group:
            nxt, nxt_vars = compile_one(p)
            shared = tuple(sorted(bound & set(nxt_vars)))
            if not shared:
                raise ValueError(
                    f"{side_type} pattern {p!r} shares no variable with the "
                    f"required bindings (bound={sorted(bound)})"
                )
            new_vars = sorted(set(nxt_vars) - bound)
            acc = bucketed_join(
                acc,
                nxt,
                on=shared,
                n_buckets=nparts,
                join_type=side_type,
                left_types={v: pa.string() for v in sorted(bound)},
                right_types={v: pa.string() for v in nxt_vars},
            )
            if side_type == "left outer" and new_vars:
                acc = acc.map_batches(
                    lambda b, nv=tuple(new_vars): pa.table(
                        {
                            c: (
                                pc.fill_null(b.column(c), "") if c in nv
                                else b.column(c)
                            )
                            for c in b.column_names
                        }
                    ),
                    batch_format="pyarrow",
                )
                bound |= set(new_vars)

    out_cols = sorted(bound)
    return (
        acc.groupby(out_cols)
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )
