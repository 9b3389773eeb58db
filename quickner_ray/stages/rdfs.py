"""RDFS forward-chaining entailment over a triples Dataset.

A constructed KG is consumed through its ontology: RDFS entailment adds
the triples the schema implies — rdfs2 (``p rdfs:domain C`` types every
subject of ``p``), rdfs3 (``p rdfs:range C`` types every object), rdfs7
(``p rdfs:subPropertyOf q`` lifts every ``(s p o)`` to ``(s q o)``) and
rdfs9/rdfs5 (``C rdfs:subClassOf D`` propagates inferred types up the
class hierarchy, transitively).

Scale shape: the ONTOLOGY is tiny (tens-to-thousands of schema triples
even for large public KGs) while the INSTANCE stream is the 100 TB side.
So the schema closures (subClassOf*, subPropertyOf*) are computed
driver-side in plain Python and folded into a flat list of
``(pred, emit_column, derived_constant)`` arms; the instance pass is one
zero-shuffle ``map_batches`` applying one vectorized ``pc.equal`` mask
per arm (arm count is schema-bounded, not data-bounded), with a
batch-local distinct. One bounded groupby makes the result DISTINCT.
Nothing driver-materializes and no instance-side join or shuffle exists
beyond the final dedup.

No reference counterpart (file:line n/a — quickner has no schema layer);
this is the KG-enrichment step between construction and serving.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["RdfsSchema", "transitive_closure", "entailed_types", "lift_predicates"]


@dataclass(frozen=True)
class RdfsSchema:
    """A small RDFS ontology as direct-edge pair lists.

    ``sub_class_of``    — (class, superclass) direct edges
    ``sub_property_of`` — (pred, superpred) direct edges
    ``domain``          — (pred, class): subjects of pred are instances of class
    ``range``           — (pred, class): objects of pred are instances of class
    """

    sub_class_of: tuple[tuple[str, str], ...] = field(default=())
    sub_property_of: tuple[tuple[str, str], ...] = field(default=())
    domain: tuple[tuple[str, str], ...] = field(default=())
    range: tuple[tuple[str, str], ...] = field(default=())


def transitive_closure(pairs) -> dict[str, tuple[str, ...]]:
    """node -> every strict ancestor reachable over the direct edges,
    deterministic order (BFS level, then name). Cycle-safe (a cycle's
    members become ancestors of each other, each excluded from itself
    unless reachable via the cycle — standard reachability semantics).
    Driver-side: ontologies are tiny by contract."""
    adj: dict[str, list[str]] = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
    out: dict[str, tuple[str, ...]] = {}
    for start in sorted(adj):
        seen: list[str] = []
        frontier = sorted(set(adj[start]))
        while frontier:
            nxt: set[str] = set()
            for n in frontier:
                if n not in seen:
                    seen.append(n)
                    nxt.update(adj.get(n, ()))
            frontier = sorted(n for n in nxt if n not in seen)
        out[start] = tuple(seen)
    return out


def _type_arms(schema: RdfsSchema) -> list[tuple[str, str, str]]:
    """Flatten rdfs2/3 + rdfs9 into (pred, source_column_role, type) arms.
    source_column_role is 'subj' (domain side) or 'obj' (range side)."""
    sup = transitive_closure(schema.sub_class_of)
    arms: list[tuple[str, str, str]] = []
    for side, pairs in (("subj", schema.domain), ("obj", schema.range)):
        for pred, cls in pairs:
            for t in (cls, *sup.get(cls, ())):
                arms.append((pred, side, t))
    # deterministic, duplicate-free arm order
    return sorted(set(arms))


def entailed_types(
    triples,
    schema: RdfsSchema,
    *,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
):
    """rdfs2 + rdfs3 + rdfs9: Dataset(node, rdf_type) — every DISTINCT
    type assertion the schema entails from the instance triples."""
    from ray.data.aggregate import Count

    arms = _type_arms(schema)
    if not arms:
        raise ValueError("schema has no domain/range declarations")
    col_of = {"subj": subj_col, "obj": obj_col}

    def f(b: pa.Table) -> pa.Table:
        preds = b.column(pred_col)
        nodes: list[pa.Array] = []
        types: list[pa.Array] = []
        for pred, side, t in arms:
            picked = b.column(col_of[side]).filter(
                pc.equal(preds, pa.scalar(pred))
            )
            if isinstance(picked, pa.ChunkedArray):
                picked = picked.combine_chunks()
            if len(picked) == 0:
                continue
            nodes.append(picked.cast(pa.string()))
            types.append(pa.array([t] * len(picked), type=pa.string()))
        if not nodes:
            return pa.table(
                {"node": pa.array([], type=pa.string()),
                 "rdf_type": pa.array([], type=pa.string())}
            )
        out = pa.table(
            {"node": pa.concat_arrays(nodes), "rdf_type": pa.concat_arrays(types)}
        )
        # batch-local distinct: Zipf-repeated mentions collapse here, so the
        # dedup shuffle ships near-unique (node, type) pairs only
        return out.group_by(out.column_names).aggregate([])

    return (
        triples.map_batches(f, batch_format="pyarrow")
        .groupby(["node", "rdf_type"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )


def lift_predicates(
    triples,
    schema: RdfsSchema,
    *,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
):
    """rdfs7: Dataset(subj, pred, obj) of the DISTINCT entailed triples —
    each instance triple plus one copy per superproperty of its predicate
    (subPropertyOf*, transitive)."""
    from ray.data.aggregate import Count

    sup = transitive_closure(schema.sub_property_of)
    # (pred -> emitted predicate) arms, identity included
    arms = sorted(
        {(p, p) for p in sup} | {(p, q) for p, ss in sup.items() for q in ss}
    )

    def f(b: pa.Table) -> pa.Table:
        preds = b.column(pred_col)
        parts: list[pa.Table] = []
        # identity arm for predicates the schema doesn't mention
        known = pa.array(sorted(sup), type=pa.string())
        rest = b.filter(pc.invert(pc.is_in(preds, value_set=known)))
        if rest.num_rows:
            parts.append(
                pa.table(
                    {
                        "subj": rest.column(subj_col).cast(pa.string()),
                        "pred": rest.column(pred_col).cast(pa.string()),
                        "obj": rest.column(obj_col).cast(pa.string()),
                    }
                )
            )
        for pred, lifted in arms:
            t = b.filter(pc.equal(preds, pa.scalar(pred)))
            if not t.num_rows:
                continue
            parts.append(
                pa.table(
                    {
                        "subj": t.column(subj_col).cast(pa.string()),
                        "pred": pa.array([lifted] * t.num_rows, type=pa.string()),
                        "obj": t.column(obj_col).cast(pa.string()),
                    }
                )
            )
        if not parts:
            return pa.table(
                {c: pa.array([], type=pa.string()) for c in ("subj", "pred", "obj")}
            )
        out = pa.concat_tables(parts)
        return out.group_by(out.column_names).aggregate([])

    return (
        triples.map_batches(f, batch_format="pyarrow")
        .groupby(["subj", "pred", "obj"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )
