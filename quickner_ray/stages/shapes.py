"""SHACL-lite shape validation over a triples Dataset.

A constructed KG is only servable if it conforms to its shapes: per
predicate, how many DISTINCT objects a subject may carry (sh:maxCount),
must carry (sh:minCount), and which objects are admissible (sh:in, the
closed value set). This stage evaluates a list of such constraints in
one distributed pass and emits the violating (constraint_id, subj)
pairs — the validation-report core of SHACL, scoped to the constraint
components a gazetteer-built KG needs.

Scale shape:
- ONE filtered projection of the stream to the constrained predicates
  with batch-local dedup, then one (subj, pred, obj) distinct groupby →
  one (subj, pred) count groupby: the only data-sized exchanges, both
  bounded by the DISTINCT edge count, never by mention volume.
- max-count violations are a vectorized filter over the counts.
- min-count violations are a bucketed LEFT ANTI join of the focus set
  (all distinct subjects) against the satisfying subjects — membership
  test, keys only, no payload.
- closed-value (sh:in) violations are a zero-shuffle ``pc.is_in`` mask
  pass (the allowed set is constraint-bounded and ships as a constant).
- violation kinds union; one bounded groupby dedups the report.

No reference counterpart (file:line n/a — quickner has no schema layer);
this is the QA gate between KG construction and publishing.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

from .hashjoin import bucketed_join
from .temporal import _default_buckets

__all__ = ["ShapeConstraint", "shape_violations"]


@dataclass(frozen=True)
class ShapeConstraint:
    """One property shape on a predicate, applied to every subject in the
    stream (the focus set). ``min_count``/``max_count`` bound the number
    of DISTINCT objects; ``allowed_objects`` is a closed value set."""

    constraint_id: str
    pred: str
    min_count: int = 0
    max_count: int | None = None
    allowed_objects: tuple[str, ...] | None = None


def shape_violations(
    triples,
    constraints,
    *,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    n_buckets: int | None = None,
):
    """Dataset(constraint_id, subj) — every DISTINCT violation of every
    constraint. A subject violates min_count by having FEWER than
    ``min_count`` distinct objects for the predicate (including zero —
    absent subjects are caught via the focus-set anti-join)."""
    from ray.data.aggregate import Count

    constraints = list(constraints)
    if not constraints:
        raise ValueError("shape_violations needs at least one constraint")
    ids = [c.constraint_id for c in constraints]
    if len(set(ids)) != len(ids):
        raise ValueError(f"duplicate constraint_id in {ids}")
    nb = n_buckets or max(32, _default_buckets() // 4)
    counted_preds = sorted(
        {c.pred for c in constraints if c.min_count > 0 or c.max_count is not None}
    )

    outs = []

    def _report(subj_arr: pa.Array, cid: str) -> pa.Table:
        if isinstance(subj_arr, pa.ChunkedArray):
            subj_arr = subj_arr.combine_chunks()
        out = pa.table(
            {
                "constraint_id": pa.array(
                    [cid] * len(subj_arr), type=pa.string()
                ),
                "subj": subj_arr.cast(pa.string()),
            }
        )
        return out.group_by(out.column_names).aggregate([])

    if counted_preds:
        pred_set = pa.array(counted_preds, type=pa.string())

        def edges(b: pa.Table) -> pa.Table:
            t = b.filter(pc.is_in(b.column(pred_col), value_set=pred_set))
            out = pa.table(
                {
                    "subj": t.column(subj_col).cast(pa.string()),
                    "pred": t.column(pred_col).cast(pa.string()),
                    "obj": t.column(obj_col).cast(pa.string()),
                }
            )
            # batch-local dedup: Zipf-repeated mentions collapse before
            # the distinct shuffle
            return out.group_by(out.column_names).aggregate([])

        counts = (
            triples.map_batches(edges, batch_format="pyarrow")
            .groupby(["subj", "pred", "obj"])
            .aggregate(Count(alias_name="_n"))
            .drop_columns(["_n"])
            .groupby(["subj", "pred"])
            .aggregate(Count(alias_name="n_objs"))
        ).materialize()  # several constraint consumers; counts are
        # distinct-edge-bounded, far below the stream size

        for c in constraints:
            if c.max_count is not None:
                outs.append(
                    counts.map_batches(
                        lambda b, p=c.pred, k=c.max_count, cid=c.constraint_id: _report(
                            b.filter(
                                pc.and_(
                                    pc.equal(b.column("pred"), pa.scalar(p)),
                                    pc.greater(b.column("n_objs"), pa.scalar(k)),
                                )
                            ).column("subj"),
                            cid,
                        ),
                        batch_format="pyarrow",
                    )
                )
            if c.min_count > 0:
                focus = triples.map_batches(
                    lambda b: pa.table(
                        {
                            "subj": pc.unique(
                                b.column(subj_col).combine_chunks()
                                if isinstance(b.column(subj_col), pa.ChunkedArray)
                                else b.column(subj_col)
                            ).cast(pa.string())
                        }
                    ),
                    batch_format="pyarrow",
                )
                ok = counts.map_batches(
                    lambda b, p=c.pred, k=c.min_count: pa.table(
                        {
                            "subj": b.filter(
                                pc.and_(
                                    pc.equal(b.column("pred"), pa.scalar(p)),
                                    pc.greater_equal(
                                        b.column("n_objs"), pa.scalar(k)
                                    ),
                                )
                            ).column("subj")
                        }
                    ),
                    batch_format="pyarrow",
                )
                missing = bucketed_join(
                    focus,
                    ok,
                    on=("subj",),
                    n_buckets=nb,
                    join_type="left anti",
                    left_types={"subj": pa.string()},
                    right_types={"subj": pa.string()},
                )
                outs.append(
                    missing.map_batches(
                        lambda b, cid=c.constraint_id: _report(
                            b.column("subj"), cid
                        ),
                        batch_format="pyarrow",
                    )
                )

    for c in constraints:
        if c.allowed_objects is not None:
            allowed = pa.array(sorted(set(c.allowed_objects)), type=pa.string())
            outs.append(
                triples.map_batches(
                    lambda b, p=c.pred, al=allowed, cid=c.constraint_id: _report(
                        b.filter(
                            pc.and_(
                                pc.equal(b.column(pred_col), pa.scalar(p)),
                                pc.invert(
                                    pc.is_in(
                                        b.column(obj_col).cast(pa.string()),
                                        value_set=al,
                                    )
                                ),
                            )
                        ).column(subj_col),
                        cid,
                    ),
                    batch_format="pyarrow",
                )
            )

    if not outs:
        raise ValueError("no constraint declares a checkable component")
    acc = outs[0]
    for o in outs[1:]:
        acc = acc.union(o)
    return (
        acc.groupby(["constraint_id", "subj"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )
