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
    _write_store_stats(dt, out_dir)
    return out_dir


def _write_store_stats(dt, out_dir: str) -> None:
    """Per-predicate planning synopsis under ``out_dir``/stats: one row
    per predicate with its distinct-triple count and distinct subject /
    object counts — the classic RDF aggregated-index statistics a
    cost-based BGP planner orders joins with (stages/bgp
    plan_patterns_stats), answered from a #predicates-row parquet
    instead of any scan. Built once at store-build time: the per-pred
    counts are one bounded groupby; the distinct-pair counts pre-dedup
    per batch before their (pred, key) shuffle. Crash-safe like the
    permutation writes (temp dir + atomic rename). Deltas applied later
    drift the synopsis — acceptable for planning (the numbers price join
    orders, they never answer queries); compact_store refreshes it."""
    import shutil

    import pyarrow.parquet as pq
    from ray.data.aggregate import Count, Sum

    d = os.path.join(out_dir, "stats")
    if os.path.exists(os.path.join(d, "_DONE")):
        return

    n = {
        r["pred"]: r["n"]
        for r in dt.groupby("pred")
        .aggregate(Count(alias_name="n"))
        .take_all()  # #predicates rows — driver-side by design
    }

    def distinct_per_pred(col: str) -> dict[str, int]:
        pairs = (
            dt.select_columns(["pred", col])
            .map_batches(  # batch-local pre-dedup cuts the shuffle volume
                lambda b: b.group_by(["pred", col]).aggregate([]),
                batch_format="pyarrow",
            )
            .groupby(["pred", col])
            .aggregate(Count(alias_name="_n"))
        )
        per = pairs.map_batches(
            lambda b: b.group_by("pred").aggregate([("pred", "count")]),
            batch_format="pyarrow",
        ).groupby("pred").aggregate(Sum("pred_count", alias_name="nd"))
        return {r["pred"]: r["nd"] for r in per.take_all()}

    ns, no = distinct_per_pred("subj"), distinct_per_pred("obj")
    preds = sorted(n)
    table = pa.table(
        {
            "pred": pa.array(preds, type=pa.string()),
            "n": pa.array([n[p] for p in preds], type=pa.int64()),
            "n_subj": pa.array([ns.get(p, 0) for p in preds], type=pa.int64()),
            "n_obj": pa.array([no.get(p, 0) for p in preds], type=pa.int64()),
        }
    )
    tmp = d + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    if os.path.isdir(d):
        shutil.rmtree(d)
    os.makedirs(tmp)
    pq.write_table(table, os.path.join(tmp, "stats.parquet"))
    os.rename(tmp, d)
    with open(os.path.join(d, "_DONE"), "w") as f:
        f.write("ok")


def read_store_stats(store_dir: str) -> dict:
    """Load the planning synopsis: {'preds': {pred: (n, n_subj, n_obj)},
    'total': (N, NS, NO)}. Totals are the per-predicate sums — N is
    exact; NS/NO are upper bounds on the global distinct counts (a
    subject can appear under several predicates), which is the safe
    direction for the selectivity estimates they feed (they only price
    unbound-predicate patterns)."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(store_dir, "stats", "stats.parquet"))
    preds = {
        t.column("pred")[i].as_py(): (
            t.column("n")[i].as_py(),
            t.column("n_subj")[i].as_py(),
            t.column("n_obj")[i].as_py(),
        )
        for i in range(t.num_rows)
    }
    total = (
        sum(v[0] for v in preds.values()),
        sum(v[1] for v in preds.values()),
        sum(v[2] for v in preds.values()),
    )
    return {"preds": preds, "total": total}


def _delta_dirs(perm_dir: str) -> list[str]:
    if not os.path.isdir(perm_dir):
        return []
    return sorted(
        os.path.join(perm_dir, f)
        for f in os.listdir(perm_dir)
        if f.startswith("delta-") and os.path.isdir(os.path.join(perm_dir, f))
    )


def lookup(store_dir: str, position: str, value, *, second=None):
    """Point lookup by leading key: position in {'subj','pred','obj'}.
    Reads ONLY the fragments/row groups whose min/max statistics admit
    ``value`` (pyarrow predicate pushdown over the sorted layout — delta
    partitions are range-sorted too, so they prune the same way). When
    delta partitions exist, a (s,p,o) key may be split across base +
    deltas: the filtered (small) result is re-aggregated and retracted
    keys (support folded to <= 0) are dropped.

    ``second`` (optional): a bound value for the permutation's SECOND
    sort key (spo->pred, pos->obj, osp->subj) — two-key prefix pruning:
    within the leading key's run the layout is sorted by the second key
    too, so row-group stats prune on BOTH (the composite-lookup path a
    (pred, obj)-bound pattern serves from)."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    perm = {"subj": "spo", "pred": "pos", "obj": "osp"}[position]
    d = os.path.join(store_dir, perm)
    flt = pc.field(position) == value
    if second is not None:
        second_col = PERMS[perm][1]
        flt = flt & (pc.field(second_col) == second)
    ds = rd.read_parquet(d, filter=flt)
    if not _delta_dirs(d):
        return ds
    out = ds.groupby(["subj", "pred", "obj"]).aggregate(
        Sum("n_mentions", alias_name="n_mentions")
    )

    def positive(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        n = b.column("n_mentions")
        if isinstance(n, pa.ChunkedArray):
            n = n.combine_chunks()
        b = b.filter(_pc.greater(n, 0))
        i = b.column_names.index("n_mentions")
        return b.set_column(i, "n_mentions", b.column("n_mentions").cast(pa.int64()))

    return out.map_batches(positive, batch_format="pyarrow")


def apply_triple_delta(
    store_dir: str,
    delta,
    *,
    perms: list[str] | None = None,
    distinct: bool = False,
    row_group_size: int | None = None,
) -> list[str]:
    """Incrementally MERGE a triple delta into an existing store — no full
    rebuild. ``delta`` is a mention-level (subj, pred, obj) Dataset (or,
    with ``distinct=True``, an already-aggregated (s,p,o, n_mentions)
    table; negative ``n_mentions`` retracts support). The delta is
    aggregated once, then written as a range-sorted ``delta-NNNN``
    partition inside each permutation dir — the LSM pattern: base +
    sorted delta runs, folded by ``compact_store``. Writes are crash-safe
    (temp dir + atomic rename); a re-run of a crashed apply cannot leave a
    partial partition behind. Returns the created partition dirs.

    Cost: one (s,p,o) groupby over the DELTA only + three delta-sized
    sorts — at 100 TB this is |delta| work instead of |store| work; reads
    pay a per-key re-aggregate only on keys the delta touched (lookup
    filters first, so that cost is on the result rows, not the store)."""
    import shutil

    dt = (delta if distinct else distinct_triples(delta)).materialize()
    kw = {"row_group_size": row_group_size} if row_group_size else {}
    created: list[str] = []
    for name in perms or list(PERMS):
        d = os.path.join(store_dir, name)
        if not os.path.exists(os.path.join(d, "_DONE")):
            raise FileNotFoundError(f"no completed base permutation at {d}")
        seq = len(_delta_dirs(d))
        part = os.path.join(d, f"delta-{seq:04d}")
        tmp = part + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        dt.sort(PERMS[name]).write_parquet(tmp, **kw)
        os.rename(tmp, part)
        created.append(part)
    return created


def compact_store(
    store_dir: str,
    *,
    perms: list[str] | None = None,
    row_group_size: int | None = None,
) -> dict:
    """Fold base + delta partitions back into one sorted run per
    permutation (the LSM compaction): read the whole perm dir (base +
    deltas), re-aggregate (s,p,o) support, drop retracted keys, range-sort,
    rewrite atomically. After compaction the store is value-identical to a
    full rebuild from the merged corpus (pinned by tests) and lookups are
    single-run again. Returns {perm: n_deltas_folded}."""
    import shutil

    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    kw = {"row_group_size": row_group_size} if row_group_size else {}
    folded: dict = {}
    for name in perms or list(PERMS):
        d = os.path.join(store_dir, name)
        deltas = _delta_dirs(d)
        folded[name] = len(deltas)
        if not deltas:
            continue
        merged = (
            rd.read_parquet(d, columns=["subj", "pred", "obj", "n_mentions"])
            .groupby(["subj", "pred", "obj"])
            .aggregate(Sum("n_mentions", alias_name="n_mentions"))
        )

        def positive(b: pa.Table) -> pa.Table:
            n = b.column("n_mentions")
            if isinstance(n, pa.ChunkedArray):
                n = n.combine_chunks()
            b = b.filter(pc.greater(n, 0))
            i = b.column_names.index("n_mentions")
            return b.set_column(
                i, "n_mentions", b.column("n_mentions").cast(pa.int64())
            )

        merged = merged.map_batches(positive, batch_format="pyarrow")
        tmp = d + ".compact.tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        merged.sort(PERMS[name]).write_parquet(tmp, **kw)
        old = d + ".old"
        if os.path.isdir(old):
            shutil.rmtree(old)
        os.rename(d, old)
        os.rename(tmp, d)
        shutil.rmtree(old)
        with open(os.path.join(d, "_DONE"), "w") as f:
            f.write("ok")
    if any(folded.values()) and os.path.isdir(os.path.join(store_dir, "stats")):
        # refresh the planning synopsis from the compacted base (deltas
        # drifted it); any compacted perm serves — contents are identical
        import ray.data as _rd

        done = next(n for n, k in folded.items() if k)
        marker = os.path.join(store_dir, "stats", "_DONE")
        if os.path.exists(marker):
            os.remove(marker)
        _write_store_stats(
            _rd.read_parquet(
                os.path.join(store_dir, done), columns=["subj", "pred", "obj"]
            ),
            store_dir,
        )
    return folded


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
