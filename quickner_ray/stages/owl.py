"""OWL-lite property semantics over a triples Dataset.

The property axioms a constructed KG is enriched and sanity-checked
with, beyond the RDFS class/predicate layer (stages/rdfs.py):

- ``owl:inverseOf``   — every ``(s p o)`` materializes ``(o q s)``
- ``owl:SymmetricProperty`` — every ``(s p o)`` materializes ``(o p s)``
- ``owl:TransitiveProperty`` — hop-bounded closure of ``p`` (delegates
  to stages/paths.eval_path's ``plus`` algebra — the engine's closure is
  hop-bounded by design, so the bound is part of the axiom here)
- ``owl:FunctionalProperty`` — integrity REPORT: subjects carrying more
  than one distinct object for ``p`` (a functional predicate admits one)
- ``owl:InverseFunctionalProperty`` — entity-resolution SIGNAL: objects
  identifying more than one subject (two subjects sharing an IFP value
  denote the same individual -> owl:sameAs candidates)

Scale shape mirrors rdfs.py: the ontology is tiny and driver-side; the
instance stream is the 100 TB side. Inverse/symmetric materialization is
ONE zero-shuffle ``map_batches`` pass (one vectorized ``pc.equal`` mask
per axiom arm, arm count schema-bounded). The integrity checks are one
in-batch pre-dedup + one bounded (key, pred) groupby each. sameAs
candidate PAIRS are per-object-group quadratic, so pair emission caps
each group (``pair_cap``) exactly like the LSH bucket guards — the
uncapped signal report stays linear.

No reference counterpart (file:line n/a — quickner has no ontology
layer); consumes the KG the construction pipeline emits.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "OwlSchema",
    "materialize_property_axioms",
    "transitive_triples",
    "functional_violations",
    "ifp_merge_signals",
    "ifp_sameas_pairs",
]

_COLS = ("subj", "pred", "obj")


@dataclass(frozen=True)
class OwlSchema:
    """OWL-lite property axioms as flat driver-side lists.

    ``inverse_of``  — (pred, inverse-pred) pairs: p owl:inverseOf q
    ``symmetric``   — predicates declared owl:SymmetricProperty
    ``transitive``  — (pred, max_hops): owl:TransitiveProperty, bounded
    ``functional``  — predicates declared owl:FunctionalProperty
    ``inverse_functional`` — owl:InverseFunctionalProperty predicates
    """

    inverse_of: tuple[tuple[str, str], ...] = field(default=())
    symmetric: tuple[str, ...] = field(default=())
    transitive: tuple[tuple[str, int], ...] = field(default=())
    functional: tuple[str, ...] = field(default=())
    inverse_functional: tuple[str, ...] = field(default=())


def materialize_property_axioms(
    triples,
    schema: OwlSchema,
    *,
    include_input: bool = True,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
):
    """Materialize the inverseOf / symmetric axioms: one zero-shuffle
    batch pass emitting the derived triples (swapped endpoints, rewritten
    predicate), batch-locally deduped, then ONE bounded groupby for
    global DISTINCT output (subj, pred, obj)."""
    from ray.data.aggregate import Count

    arms: list[tuple[str, str]] = list(schema.inverse_of) + [
        (p, p) for p in schema.symmetric
    ]
    if not arms:
        raise ValueError("schema declares no inverseOf/symmetric axioms")

    def f(b: pa.Table) -> pa.Table:
        outs = []
        if include_input:
            outs.append(
                pa.table(
                    {
                        "subj": b.column(subj_col),
                        "pred": b.column(pred_col),
                        "obj": b.column(obj_col),
                    }
                )
            )
        for src_pred, out_pred in arms:
            m = pc.equal(b.column(pred_col), pa.scalar(src_pred))
            t = b.filter(m)
            outs.append(
                pa.table(
                    {
                        "subj": t.column(obj_col),
                        "pred": pa.array(
                            [out_pred] * t.num_rows, type=pa.string()
                        ),
                        "obj": t.column(subj_col),
                    }
                )
            )
        out = pa.concat_tables(outs)
        return out.group_by(list(_COLS)).aggregate([])  # batch-local dedup

    return (
        triples.map_batches(f, batch_format="pyarrow")
        .groupby(list(_COLS))
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )


def transitive_triples(
    triples,
    pred: str,
    max_hops: int,
    *,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
):
    """owl:TransitiveProperty materialization: the DISTINCT (s, pred, o)
    pairs reachable over 1..max_hops ``pred`` steps — the ``plus``
    closure of stages/paths.eval_path, re-labelled as triples."""
    from .paths import eval_path

    pairs = eval_path(
        triples,
        ("plus", ("pred", pred), max_hops),
        subj_col=subj_col,
        pred_col=pred_col,
        obj_col=obj_col,
    )

    def relabel(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": b.column("src"),
                "pred": pa.array([pred] * b.num_rows, type=pa.string()),
                "obj": b.column("dst"),
            }
        )

    return pairs.map_batches(relabel, batch_format="pyarrow")


def _key_cardinality(triples, preds, key_col, other_col, pred_col, alias):
    """Distinct-``other`` count per (key, pred), preds-restricted: an
    in-batch pre-dedup pass, one (key, pred, other) dedup groupby, one
    bounded (key, pred) count groupby."""
    from ray.data.aggregate import Count

    vs = pa.array(sorted(preds), type=pa.string())

    def pre(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b.column(pred_col), value_set=vs))
        t = pa.table(
            {
                "k": t.column(key_col),
                "pred": t.column(pred_col),
                "v": t.column(other_col),
            }
        )
        return t.group_by(["k", "pred", "v"]).aggregate([])

    return (
        triples.map_batches(pre, batch_format="pyarrow")
        .groupby(["k", "pred", "v"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .groupby(["k", "pred"])
        .aggregate(Count(alias_name=alias))
    )


def functional_violations(
    triples,
    schema: OwlSchema,
    *,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
):
    """owl:FunctionalProperty integrity report: Dataset(subj, pred,
    n_objects) for every subject carrying MORE than one distinct object
    under a functional predicate."""
    if not schema.functional:
        raise ValueError("schema declares no functional predicates")
    counts = _key_cardinality(
        triples, schema.functional, subj_col, obj_col, pred_col, "n_objects"
    )
    return counts.map_batches(
        lambda b: b.filter(pc.greater(b.column("n_objects"), 1)).rename_columns(
            ["subj", "pred", "n_objects"]
        ),
        batch_format="pyarrow",
    )


def ifp_merge_signals(
    triples,
    schema: OwlSchema,
    *,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
):
    """owl:InverseFunctionalProperty merge signals: Dataset(obj, pred,
    n_subjects) for every IFP value identifying MORE than one subject —
    each row is an entity-resolution merge candidate set. Linear (no
    pair explosion): the quadratic pair emission lives in
    ifp_sameas_pairs behind a cap."""
    if not schema.inverse_functional:
        raise ValueError("schema declares no inverse-functional predicates")
    counts = _key_cardinality(
        triples,
        schema.inverse_functional,
        obj_col,
        subj_col,
        pred_col,
        "n_subjects",
    )
    return counts.map_batches(
        lambda b: b.filter(
            pc.greater(b.column("n_subjects"), 1)
        ).rename_columns(["obj", "pred", "n_subjects"]),
        batch_format="pyarrow",
    )


def ifp_sameas_pairs(
    triples,
    schema: OwlSchema,
    *,
    pair_cap: int = 64,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
):
    """owl:sameAs candidate pairs from IFP sharing: for every (pred, obj)
    group under an inverse-functional predicate, the DISTINCT unordered
    subject pairs (a < b) — each pair evidence its two subjects denote
    one individual. Per-group pair count is quadratic, so groups larger
    than ``pair_cap`` subjects are SKIPPED (loudly countable via
    ifp_merge_signals; a hub value shared by thousands of subjects is a
    data-quality smell, not merge evidence). One (pred, obj) shuffle."""
    from ray.data.aggregate import Count

    if not schema.inverse_functional:
        raise ValueError("schema declares no inverse-functional predicates")
    vs = pa.array(sorted(schema.inverse_functional), type=pa.string())

    def pre(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b.column(pred_col), value_set=vs))
        t = pa.table(
            {
                "pred": t.column(pred_col),
                "obj": t.column(obj_col),
                "subj": t.column(subj_col),
            }
        )
        return t.group_by(["pred", "obj", "subj"]).aggregate([])

    def pairs(t: pa.Table, cap=pair_cap) -> pa.Table:
        subs = sorted(set(t.column("subj").to_pylist()))
        a: list[str] = []
        bcol: list[str] = []
        if 2 <= len(subs) <= cap:
            for i in range(len(subs)):
                for j in range(i + 1, len(subs)):
                    a.append(subs[i])
                    bcol.append(subs[j])
        n = len(a)
        return pa.table(
            {
                "pred": pa.array(
                    [t.column("pred")[0].as_py()] * n, type=pa.string()
                ),
                "obj": pa.array(
                    [t.column("obj")[0].as_py()] * n, type=pa.string()
                ),
                "subj_a": pa.array(a, type=pa.string()),
                "subj_b": pa.array(bcol, type=pa.string()),
            }
        )

    deduped = (
        triples.map_batches(pre, batch_format="pyarrow")
        .groupby(["pred", "obj", "subj"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )
    return deduped.groupby(["pred", "obj"]).map_groups(
        pairs, batch_format="pyarrow"
    )
