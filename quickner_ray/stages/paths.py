"""SPARQL property paths over a triples / edge-list Dataset.

The BGP evaluator (stages/bgp.py) answers conjunctive patterns; property
paths are the other half of SPARQL's graph-navigation surface: regular
expressions over predicates. This module evaluates a small path algebra

    ("pred", label)    one predicate step, subj -> obj
    ("inv", e)         ^e      — inverse (swap direction)
    ("seq", a, b)      a / b   — composition
    ("alt", a, b)      a | b   — alternation
    ("plus", e, H)     e+ / e{1,H} — transitive closure; H=None -> true
                       to-fixpoint Kleene closure (SPARQL 1.1 semantics)
    ("neg", labels)    !(a|b)  — negated property set (any OTHER predicate)
    ("opt", e)         e?      — zero-or-one (identity over the node universe)
    ("star", e, H)     e* / e{0,H} — zero-or-more; H=None -> fixpoint

to the DISTINCT (src, dst) endpoint pairs. Unbounded closures iterate
the semi-naive frontier to FIXPOINT — termination is guaranteed because
the seen-pair set grows monotonically inside the |V|^2 bound and each
round's frontier is anti-joined against it (frontier-size gating: the
loop ends the round the frontier empties, i.e. after graph-diameter
rounds, never |V|). The exact oracle is a recursive CTE with UNION
(distinct) — DuckDB's set-semantics recursion reaches the same fixpoint
on cyclic graphs (UNION ALL path enumeration would not terminate).
Explicit ``+H``/``*H`` digit bounds remain for hop-windowed queries.
Zero-length arms (``?``/``*``) follow SPARQL 1.1 semantics: the empty
path relates every graph term to itself, so they union in the identity
pairs over the node universe (distinct subjects + objects of the triple
stream — one zero-shuffle projection pass; the final global distinct
dedupes it against the closure). Negated sets are the one step shape a
per-predicate index CANNOT serve (the match set is the complement), so
they always scan the stream even under ``pred_source``.

Execution shape (idiomatic Ray Data, no driver-side row loops):
- a predicate step is ONE vectorized filter+project over the triples
  stream with batch-local distinct (Zipf-repeated mentions collapse
  before anything shuffles),
- ``seq`` is ONE bucketed md5 hash join (stages/hashjoin.py) on the
  shared midpoint,
- ``alt`` is a zero-shuffle union (distinct is applied once, at the end),
- ``plus`` is min-hop BFS over the DISTINCT edge set: per round, join
  the newly-discovered frontier with the edges, anti-join against the
  seen set, materialize the (bounded, pairs-only) frontier. Per-round
  wire cost is |frontier| + |edges| — never paths (path counts are
  exponential; pair counts are |V|^2-bounded). The per-round
  ``materialize()`` is load-bearing: the frontier feeds both the next
  join and the seen union, and re-executing it would double work every
  round; it holds PAIRS of a closure the caller asked for, not the
  corpus.

Partitioning assumption (inherited from bucketed_join): one md5 bucket
of endpoint pairs fits in a worker; buckets are uniform, so the bound is
pairs/n_buckets.

No counterpart in the reference (quickner has no query layer); public
grounding: SPARQL 1.1 property paths (W3C REC) and the standard
semi-naive BFS evaluation.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .hashjoin import bucketed_join
from .temporal import _default_buckets

_STR2 = {"src": pa.string(), "dst": pa.string()}


def _local_distinct(b: pa.Table) -> pa.Table:
    return b.group_by(b.column_names).aggregate([])


def _distinct_pairs(ds, n_buckets: int):
    """Global DISTINCT on (src, dst) — the repo's standard bounded groupby."""
    from ray.data.aggregate import Count

    return (
        ds.groupby(["src", "dst"], num_partitions=max(2, n_buckets // 8))
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )


def _step(triples, label: str, subj_col: str, pred_col: str, obj_col: str):
    def f(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column(pred_col), pa.scalar(label)))
        return _local_distinct(
            pa.table({"src": t.column(subj_col), "dst": t.column(obj_col)})
        )

    return triples.map_batches(f, batch_format="pyarrow")


def _neg_step(triples, labels, subj_col: str, pred_col: str, obj_col: str):
    """Negated property set !(l1|l2|...): every (subj, obj) pair whose
    predicate is NOT in ``labels`` — one vectorized complement filter."""
    vset = pa.array(sorted(set(labels)), type=pa.string())

    def f(b: pa.Table) -> pa.Table:
        p = b.column(pred_col)
        if isinstance(p, pa.ChunkedArray):
            p = p.combine_chunks()
        t = b.filter(pc.invert(pc.is_in(p, value_set=vset)))
        return _local_distinct(
            pa.table({"src": t.column(subj_col), "dst": t.column(obj_col)})
        )

    return triples.map_batches(f, batch_format="pyarrow")


def _identity_pairs(triples, subj_col: str, obj_col: str):
    """(node, node) for every term of the graph — the SPARQL zero-length
    path. Batch-local distinct only; the caller's global distinct (or the
    closure union) dedupes across batches."""

    def f(b: pa.Table) -> pa.Table:
        nodes = pa.concat_tables(
            [
                pa.table({"n": b.column(subj_col).cast(pa.string())}),
                pa.table({"n": b.column(obj_col).cast(pa.string())}),
            ]
        )
        u = nodes.group_by(["n"]).aggregate([])
        return pa.table({"src": u.column("n"), "dst": u.column("n")})

    return triples.map_batches(f, batch_format="pyarrow")


def _swap(ds):
    return ds.map_batches(
        lambda b: pa.table({"src": b.column("dst"), "dst": b.column("src")}),
        batch_format="pyarrow",
    )


def _seq(a, b, n_buckets: int):
    left = a.map_batches(
        lambda t: pa.table({"src": t.column("src"), "m": t.column("dst")}),
        batch_format="pyarrow",
    )
    right = b.map_batches(
        lambda t: pa.table({"m": t.column("src"), "dst": t.column("dst")}),
        batch_format="pyarrow",
    )
    joined = bucketed_join(
        left,
        right,
        on=("m",),
        n_buckets=n_buckets,
        left_types={"src": pa.string(), "m": pa.string()},
        right_types={"m": pa.string(), "dst": pa.string()},
    )
    return joined.map_batches(
        lambda t: _local_distinct(
            pa.table({"src": t.column("src"), "dst": t.column("dst")})
        ),
        batch_format="pyarrow",
    )


def min_hops_closure(
    edges,
    *,
    max_hops: int | None,
    n_buckets: int | None = None,
    driver_cap: int | None = None,
):
    """Edge Dataset(src, dst) -> Dataset(src, dst, min_hops): every pair
    connected by a directed path of 1..max_hops edges — or, with
    ``max_hops=None``, by ANY directed path (true Kleene closure to
    fixpoint) — labeled with its shortest hop count. Semi-naive BFS:
    round h joins only the pairs FIRST discovered at h-1 against the
    edge set, so no path is re-walked; the unbounded form terminates
    when a round's anti-joined frontier empties (at most graph-diameter
    rounds — the frontier-size gate, not an hop cap).

    Size gate (the graph_cc convention): when the distinct edge set is
    below ``driver_cap`` the BFS runs driver-side on the collected edges —
    host/entity graphs are dimension-bounded (tiny next to the corpus),
    and 2-4 distributed shuffle rounds cost seconds of fixed overhead that
    a dict BFS over 200k edges does not. Above the cap, the distributed
    frontier rounds run; both paths emit identical pairs."""
    if max_hops is not None and max_hops < 1:
        raise ValueError("min_hops_closure requires max_hops >= 1 or None")
    from .graph_cc import DRIVER_CAP

    cap = DRIVER_CAP if driver_cap is None else driver_cap
    nb = n_buckets or max(32, _default_buckets() // 4)

    def tag(ds, h: int):
        return ds.map_batches(
            lambda b, hh=h: b.append_column(
                "min_hops", pa.array([hh] * b.num_rows, type=pa.int64())
            ),
            batch_format="pyarrow",
        )

    e = _distinct_pairs(
        edges.map_batches(_local_distinct, batch_format="pyarrow"), nb
    ).materialize()
    if e.count() <= cap:
        return _broadcast_min_hops(e.take_all(), max_hops)
    frontier = e
    seen = e  # pairs only (untagged) for the anti-join side
    out = tag(e, 1)
    h = 2
    while max_hops is None or h <= max_hops:
        step = _seq(frontier, e, nb)
        new = bucketed_join(
            _distinct_pairs(step, nb),
            seen,
            on=("src", "dst"),
            n_buckets=nb,
            join_type="left anti",
            left_types=_STR2,
            right_types=_STR2,
        ).materialize()
        if new.count() == 0:  # fixpoint: nothing new reachable
            break
        out = out.union(tag(new, h))
        seen = seen.union(new).materialize()
        frontier = new
        h += 1
    return out


def _broadcast_min_hops(edge_rows, max_hops: int | None):
    """Driver-side BFS over collected distinct edges (below the size gate);
    ``max_hops=None`` runs each start's BFS until its frontier empties."""
    import itertools

    import ray.data as rd
    from collections import defaultdict

    adj = defaultdict(list)
    for r in edge_rows:
        adj[r["src"]].append(r["dst"])
    src_out, dst_out, hop_out = [], [], []
    for start in adj:
        frontier, seen = {start}, set()
        hops = (
            range(1, max_hops + 1) if max_hops is not None
            else itertools.count(1)
        )
        for h in hops:
            frontier = {d for u in frontier for d in adj.get(u, ())} - seen
            if not frontier:
                break
            for d in frontier:
                src_out.append(start)
                dst_out.append(d)
                hop_out.append(h)
            seen |= frontier
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src_out, type=pa.string()),
                "dst": pa.array(dst_out, type=pa.string()),
                "min_hops": pa.array(hop_out, type=pa.int64()),
            }
        )
    )


def cheapest_paths(
    edges,
    *,
    max_hops: int,
    weight_col: str = "w",
    n_buckets: int | None = None,
    driver_cap: int | None = None,
):
    """Weighted property paths: Dataset(src, dst, w) -> Dataset(src, dst,
    min_cost) — the minimum total integer weight over directed paths of
    1..max_hops edges (hop-bounded Bellman-Ford; parallel edges collapse
    to their cheapest first).

    Per round: ONE bucketed join extends every known cheapest pair by one
    edge, then a groupby-min folds extensions into the table — the state
    is always (src, dst, cost) PAIRS, |V|^2-bounded, never path
    enumerations. Same size gate as min_hops_closure: dimension-bounded
    graphs relax driver-side."""
    if max_hops < 1:
        raise ValueError("cheapest_paths requires max_hops >= 1")
    from ray.data.aggregate import Min

    from .graph_cc import DRIVER_CAP

    cap = DRIVER_CAP if driver_cap is None else driver_cap
    nb = n_buckets or max(32, _default_buckets() // 4)

    def min_pairs(ds):
        return ds.groupby(
            ["src", "dst"], num_partitions=max(2, nb // 8)
        ).aggregate(Min("cost", alias_name="cost"))

    e = min_pairs(
        edges.map_batches(
            lambda b: pa.table(
                {
                    "src": b.column("src"),
                    "dst": b.column("dst"),
                    "cost": pc.cast(b.column(weight_col), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    ).materialize()
    if e.count() <= cap:
        return _broadcast_cheapest(e.take_all(), max_hops)

    dist = e
    for _ in range(max_hops - 1):
        left = dist.map_batches(
            lambda b: pa.table(
                {"src": b.column("src"), "m": b.column("dst"),
                 "acc": b.column("cost")}
            ),
            batch_format="pyarrow",
        )
        right = e.map_batches(
            lambda b: pa.table(
                {"m": b.column("src"), "dst": b.column("dst"),
                 "w": b.column("cost")}
            ),
            batch_format="pyarrow",
        )
        ext = bucketed_join(
            left,
            right,
            on=("m",),
            n_buckets=nb,
            left_types={"src": pa.string(), "m": pa.string(),
                        "acc": pa.int64()},
            right_types={"m": pa.string(), "dst": pa.string(),
                         "w": pa.int64()},
        ).map_batches(
            lambda b: pa.table(
                {
                    "src": b.column("src"),
                    "dst": b.column("dst"),
                    "cost": pc.add(b.column("acc"), b.column("w")),
                }
            ),
            batch_format="pyarrow",
        )
        dist = min_pairs(dist.union(ext)).materialize()
    return dist.map_batches(
        lambda b: b.rename_columns(["src", "dst", "min_cost"]),
        batch_format="pyarrow",
    )


def _broadcast_cheapest(edge_rows, max_hops: int):
    """Driver-side hop-bounded Bellman-Ford over collected distinct edges."""
    import ray.data as rd

    from collections import defaultdict

    ew = {(r["src"], r["dst"]): r["cost"] for r in edge_rows}
    adj = defaultdict(list)
    for (s, d), w in ew.items():
        adj[s].append((d, w))
    dist = dict(ew)
    for _ in range(max_hops - 1):
        nxt = dict(dist)
        for (s, m), c in dist.items():
            for d, w in adj.get(m, ()):
                cand = c + w
                if cand < nxt.get((s, d), cand + 1):
                    nxt[s, d] = cand
        dist = nxt
    items = sorted(dist.items())
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([k[0] for k, _ in items], type=pa.string()),
                "dst": pa.array([k[1] for k, _ in items], type=pa.string()),
                "min_cost": pa.array([v for _, v in items], type=pa.int64()),
            }
        )
    )


def eval_path(
    triples,
    expr,
    *,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    n_buckets: int | None = None,
    pred_source=None,
):
    """Evaluate a path expression; return the DISTINCT (src, dst) pairs.

    ``pred_source`` (optional): callable label -> Dataset supplying each
    predicate step's triples individually — pass a permutation-index
    ``lookup`` (sinks/triplestore.py) so a step reads ONLY the POS-index
    fragments whose row-group stats admit its predicate, instead of
    scanning the full stream (the same pruning hook as bgp_match's
    ``pattern_source``; at store scale this is the difference between a
    fragment read and a 10^12-triple scan per step)."""
    nb = n_buckets or max(32, _default_buckets() // 4)

    def ev(e):
        op = e[0]
        if op == "pred":
            src = pred_source(e[1]) if pred_source else triples
            return _step(src, e[1], subj_col, pred_col, obj_col)
        if op == "inv":
            return _swap(ev(e[1]))
        if op == "seq":
            return _seq(ev(e[1]), ev(e[2]), nb)
        if op == "alt":
            return ev(e[1]).union(ev(e[2]))
        if op == "plus":
            closed = min_hops_closure(ev(e[1]), max_hops=e[2], n_buckets=nb)
            return closed.drop_columns(["min_hops"])
        if op == "neg":
            return _neg_step(triples, e[1], subj_col, pred_col, obj_col)
        if op == "opt":
            return ev(e[1]).union(_identity_pairs(triples, subj_col, obj_col))
        if op == "star":
            closed = min_hops_closure(ev(e[1]), max_hops=e[2], n_buckets=nb)
            return closed.drop_columns(["min_hops"]).union(
                _identity_pairs(triples, subj_col, obj_col)
            )
        raise ValueError(f"unknown path op {e!r}")

    return _distinct_pairs(ev(expr), nb)
