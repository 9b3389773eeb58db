"""Triple-store materialization: SPO / POS / OSP permutation indexes.

A KG triple store answers point lookups on any of subject / predicate /
object. On Parquet the classic layout (RDF-3X / Hexastore reduced to
the three leading-key permutations) is: the DISTINCT triple table
written three times, each globally RANGE-SORTED by one permutation of
(subj, pred, obj) — the sort makes every file and row group carry tight
min/max statistics on its leading key, so a lookup reads only the
fragments whose stats admit the key (predicate pushdown at the read,
never a scan).

Shapes: ONE groupby (s,p,o) dedup that also aggregates per-triple
mention support, then three range-partitioned sorts, each written to
its own partition directory (resumable: the store dir is keyed by a
content fingerprint, finished permutations are skipped on re-run).

Reference anchor: quickner's two in-memory inverted indexes
(quickner-core/src/quickner.rs:719-742) generalized to the on-disk,
any-position lookup layout the north rule's "graph materialize" needs.
"""

from __future__ import annotations

import os

import pyarrow as pa

PERMS: dict[str, list[str]] = {
    "spo": ["subj", "pred", "obj"],
    "pos": ["pred", "obj", "subj"],
    "osp": ["obj", "subj", "pred"],
}


def distinct_triples(triples):
    """Mention-level triples -> distinct (subj, pred, obj, n_mentions)."""
    from ray.data.aggregate import Count

    t = triples.select_columns(["subj", "pred", "obj"])
    return t.groupby(["subj", "pred", "obj"]).aggregate(
        Count(alias_name="n_mentions")
    )


def write_triple_store(
    triples,
    out_dir: str,
    *,
    perms: list[str] | None = None,
    row_group_size: int | None = None,
):
    """Write the three permutation indexes under ``out_dir``/{spo,pos,osp}.
    ``triples`` is the mention-level (subj, pred, obj, ...) Dataset; the
    distinct aggregation runs once and the result is materialized so the
    three sorts do not re-execute the upstream pipeline.
    ``row_group_size`` bounds rows per Parquet row group — the pruning
    granularity of lookups (default pyarrow 1M; lower it so stores whose
    key cardinality is high prune inside files too, not only across
    them)."""
    import shutil

    dt = distinct_triples(triples).materialize()
    kw = {"row_group_size": row_group_size} if row_group_size else {}
    for name in perms or list(PERMS):
        d = os.path.join(out_dir, name)
        done = os.path.join(d, "_DONE")
        if os.path.exists(done):
            continue
        # Crash-safe: a prior run may have died mid-write_parquet, leaving
        # partial files in `d`; a naive re-run would ADD uniquely-named
        # files beside them and serve duplicated triples. Write into a
        # sibling temp dir and promote with an atomic rename instead.
        tmp = d + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        if os.path.isdir(d):
            shutil.rmtree(d)
        dt.sort(PERMS[name]).write_parquet(tmp, **kw)
        os.rename(tmp, d)
        with open(done, "w") as f:
            f.write("ok")
    return out_dir


def lookup(store_dir: str, position: str, value):
    """Point lookup by leading key: position in {'subj','pred','obj'}.
    Reads ONLY the fragments/row groups whose min/max statistics admit
    ``value`` (pyarrow predicate pushdown over the sorted layout)."""
    import pyarrow.compute as pc
    import ray.data as rd

    perm = {"subj": "spo", "pred": "pos", "obj": "osp"}[position]
    return rd.read_parquet(
        os.path.join(store_dir, perm),
        filter=(pc.field(position) == value),
    )


def pruned_fraction(store_dir: str, position: str, value) -> float:
    """Diagnostic: fraction of row groups whose stats EXCLUDE ``value``
    (what the lookup skips). Uses only Parquet footer metadata."""
    import pyarrow.dataset as pads

    perm = {"subj": "spo", "pred": "pos", "obj": "osp"}[position]
    dset = pads.dataset(os.path.join(store_dir, perm), format="parquet")
    total = kept = 0
    for frag in dset.get_fragments():
        frag.ensure_complete_metadata()
        md = frag.metadata
        ci = [c.path_in_schema for c in (md.row_group(0).column(j) for j in range(md.num_columns))].index(position)
        for i in range(md.num_row_groups):
            st = md.row_group(i).column(ci).statistics
            total += 1
            if st is None or (st.min <= value <= st.max):
                kept += 1
    return 1.0 - (kept / total) if total else 0.0
