"""Distributed weakly-connected components over an edge Dataset.

Near-duplicate CLUSTERING is the principled form of corpus dedup: a dup
cluster is a connected component of the verified near-dup pair graph
(keep one representative per component), not just "drop the right side of
every pair".  The same operator serves KG graph analytics (component =
linked entity group over subj-obj edges).

Algorithm: iterative min-label propagation with pointer jumping (the
"hash-to-min" family — Rastogi et al., "Finding Connected Components in
Map-Reduce in Logarithmic Rounds", ICDE 2013).  Each round computes

    cand(n) = min( label(n),                      -- keep own label
                   label(m) for every edge (m,n), -- edge propagation
                   label(label(n)) )              -- pointer jump

as three message streams, all hash-partitioned on the node key: the round
is two hash-partitioned joins + one groupby-min, no driver-side state.
Labels only decrease, so the scalar label sum strictly decreases until
fixpoint — convergence costs one small aggregate per round.  Pointer
jumping contracts label chains, making rounds O(log diameter) rather than
O(diameter); web-scale dup graphs have shallow components, so a handful
of rounds suffices.

Per-round ``materialize()`` is REQUIRED for an iterative Dataset
algorithm (lazy lineage would re-execute every prior round); what is
materialized is only the (node, label) frontier — two int64 columns, the
smallest possible representation.  The symmetrized edge list is
materialized ONCE and reused every round.
"""

from __future__ import annotations

import pyarrow as pa


def _project(ds, mapping: dict[str, str]):
    """Rename/select columns: ``mapping`` is {out_name: in_name}.

    Also NORMALIZES empty blocks: Ray's hash aggregate/join can emit
    zero-row blocks with an empty schema, which crash a downstream acero
    join ("no match for key field on right side"); those are rewritten to
    typed empty int64 columns (node ids/labels are int64 throughout)."""

    def f(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {out: pa.array([], type=pa.int64()) for out in mapping}
            )
        return pa.table({out: b.column(src) for out, src in mapping.items()})

    return ds.map_batches(f, batch_format="pyarrow")


def connected_components(
    edges,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    nodes=None,
    node_col: str = "node",
    num_partitions: int = 8,
    max_rounds: int = 25,
):
    """Edge Dataset -> Dataset(node, component) where ``component`` is the
    minimum node id reachable from ``node`` (undirected reachability).

    ``nodes`` optionally supplies the full node universe so isolated nodes
    (no incident edge) appear as their own singleton components.
    """
    from ray.data.aggregate import Min

    fwd = _project(edges, {"src": src_col, "dst": dst_col})
    rev = _project(edges, {"src": dst_col, "dst": src_col})
    # repartition for the same schema-normalization reason as labels below
    # (upstream aggregates can hand us schema-less empty blocks)
    und = fwd.union(rev).repartition(num_partitions).materialize()

    seed = _project(und, {"node": "src"})
    if nodes is not None:
        seed = seed.union(_project(nodes, {"node": node_col}))
    # groupby-min on the node key doubles as DISTINCT; label(n) starts at n.
    # The repartition is load-bearing, not cosmetic: Ray's hash aggregate
    # emits schema-LESS empty blocks for empty partitions, zero-row blocks
    # skip map_batches, and a join partition composed only of them crashes
    # acero ("no match for key field on right side"); repartition
    # consolidates them into schema-ful blocks. Cost: one extra round-trip
    # of the two-int64-column frontier per round.
    labels = _project(
        seed.groupby("node").aggregate(Min("node", alias_name="label")),
        {"node": "node", "label": "label"},
    ).repartition(num_partitions).materialize()
    if labels.count() == 0 or und.count() == 0:
        # no nodes, or no edges: every node is already its own component
        return _project(labels, {"node": "node", "component": "label"})

    prev_sum = labels.sum("label")
    for _ in range(max_rounds):
        m_edge = und.join(
            labels, "inner", num_partitions=num_partitions,
            on=("src",), right_on=("node",),
        )
        m_edge = _project(m_edge, {"node": "dst", "cand": "label"})
        ptr = _project(labels, {"pnode": "node", "plabel": "label"})
        m_jump = ptr.join(
            labels, "inner", num_partitions=num_partitions,
            on=("plabel",), right_on=("node",),
        )
        m_jump = _project(m_jump, {"node": "pnode", "cand": "label"})
        m_self = _project(labels, {"node": "node", "cand": "label"})
        labels = _project(
            m_edge.union(m_jump)
            .union(m_self)
            .groupby("node")
            .aggregate(Min("cand", alias_name="label")),
            {"node": "node", "label": "label"},
        ).repartition(num_partitions).materialize()  # see seed comment
        cur = labels.sum("label")
        if cur == prev_sum:
            break
        prev_sum = cur
    return _project(labels, {"node": "node", "component": "label"})
