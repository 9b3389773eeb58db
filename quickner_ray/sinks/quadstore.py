"""Named-graph (quad) permutation store: the triple store partitioned
BY GRAPH.

Layout — one LSM permutation store per named graph, each a subdirectory
of the quad store root:

    store_dir/
      g-<md5(graph)[:12]>/     one per graph IRI
        graph.txt              the graph IRI (the listing source of truth)
        spo/ pos/ osp/         range-sorted permutations, columns
                               (subj, pred, obj, graph, n_mentions) —
                               the graph column is written IN-FILE so a
                               union-default read over many graphs is ONE
                               ``read_parquet`` over the selected dirs
                               (never a per-graph Dataset.union chain —
                               the documented executor-overhead trap),
        stats/                 optional per-graph planning synopsis.

Why partition by graph instead of adding ``graph`` to the permutation
sort key: graph-scoped maintenance (``CLEAR GRAPH``, ``DROP GRAPH``,
graph-scoped UPDATE) becomes |graph| work on one subtree — at 100 TB a
provenance graph (one crawl snapshot, one upstream feed) retracts
without touching any other graph's runs, and a graph-scoped query reads
only its own subtree. Partitioning assumption: the number of NAMED
GRAPHS is bounded (feeds / snapshots / sources — tens to thousands),
while each graph's triple set is data-sized; the per-graph write loop
iterates graphs on the driver but every per-graph step is a distributed
filter/sort over materialized distinct-quad blocks.

Composes sinks/triplestore.py (PERMS, delta rosters, crash-safe
temp-dir + atomic-rename writes). Reference: n/a — no counterpart
(quickner has no store); layout follows the RDF-3X permutation design
with SPARQL 1.1 Update graph semantics.
"""

from __future__ import annotations

import hashlib
import os
import shutil

import pyarrow as pa

from .triplestore import PERMS, _delta_dirs, _write_store_stats

QUAD_KEYS = ["subj", "pred", "obj", "graph"]
_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("graph", pa.string()),
        ("n_mentions", pa.int64()),
    ]
)


def graph_dirname(graph: str) -> str:
    return "g-" + hashlib.md5(graph.encode()).hexdigest()[:12]


def graph_dir(store_dir: str, graph: str) -> str:
    return os.path.join(store_dir, graph_dirname(graph))


def list_graphs(store_dir: str) -> dict[str, str]:
    """{graph_iri: graph_dir} for every graph present in the store."""
    out: dict[str, str] = {}
    if not os.path.isdir(store_dir):
        return out
    for name in sorted(os.listdir(store_dir)):
        d = os.path.join(store_dir, name)
        marker = os.path.join(d, "graph.txt")
        if name.startswith("g-") and os.path.isfile(marker):
            with open(marker) as f:
                out[f.read().strip()] = d
    return out


def distinct_quads(quads):
    """Mention-level quads -> distinct (subj, pred, obj, graph,
    n_mentions) — ONE bounded groupby (per-batch Arrow partials ride
    Ray's hash aggregate)."""
    from ray.data.aggregate import Count

    return (
        quads.select_columns(QUAD_KEYS)
        .groupby(QUAD_KEYS)
        .aggregate(Count(alias_name="n_mentions"))
    )


def create_graph(store_dir: str, graph: str) -> str:
    """Ensure an (empty) per-graph permutation store exists — the
    ``CREATE GRAPH`` verb, and the implicit target of an INSERT into a
    graph the store has not seen. Idempotent; returns the graph dir."""
    import pyarrow.parquet as pq

    gd = graph_dir(store_dir, graph)
    for name in PERMS:
        d = os.path.join(gd, name)
        if os.path.exists(os.path.join(d, "_DONE")):
            continue
        tmp = d + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        pq.write_table(_SCHEMA.empty_table(), os.path.join(tmp, "empty.parquet"))
        if os.path.isdir(d):
            shutil.rmtree(d)
        os.rename(tmp, d)
        with open(os.path.join(d, "_DONE"), "w") as f:
            f.write("ok")
    with open(os.path.join(gd, "graph.txt"), "w") as f:
        f.write(graph)
    return gd


def drop_graph(store_dir: str, graph: str) -> bool:
    """``DROP GRAPH <iri>``: remove the graph's whole subtree — O(graph),
    physically reclaimed immediately (no tombstone delta needed: the
    graph's runs live nowhere else). Returns whether it existed."""
    gd = graph_dir(store_dir, graph)
    if not os.path.isdir(gd):
        return False
    shutil.rmtree(gd)
    return True


def write_quad_store(
    quads,
    out_dir: str,
    *,
    row_group_size: int | None = None,
    stats: bool = False,
):
    """Build the per-graph permutation stores from a mention-level quad
    Dataset. The distinct aggregation runs ONCE (materialized, so the
    per-graph filter+sort passes re-read object-store blocks, not the
    upstream pipeline); graphs iterate on the driver (bounded, see module
    docstring) and every graph gets the crash-safe temp-dir + atomic
    rename + _DONE roster of the single-graph store."""
    import pyarrow.compute as pc

    dt = distinct_quads(quads).materialize()
    graphs = sorted(
        r["graph"]
        for r in dt.groupby("graph").count().take_all()  # bounded: one
        # row per named graph, the partitioning assumption
    )
    kw = {"row_group_size": row_group_size} if row_group_size else {}
    for g in graphs:
        gd = graph_dir(out_dir, g)
        dtg = dt.map_batches(
            lambda b, gg=g: b.filter(pc.equal(b.column("graph"), pa.scalar(gg))),
            batch_format="pyarrow",
        )
        pending = [
            n for n in PERMS
            if not os.path.exists(os.path.join(gd, n, "_DONE"))
        ]
        if pending:
            dtg = dtg.materialize()  # graph-sized; 3 sorts share it
        for name in pending:
            d = os.path.join(gd, name)
            tmp = d + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            if os.path.isdir(d):
                shutil.rmtree(d)
            os.makedirs(gd, exist_ok=True)
            dtg.sort(PERMS[name]).write_parquet(tmp, **kw)
            os.rename(tmp, d)
            with open(os.path.join(d, "_DONE"), "w") as f:
                f.write("ok")
        with open(os.path.join(gd, "graph.txt"), "w") as f:
            f.write(g)
    if stats:
        # ONE cross-graph planning synopsis at the store root (the
        # per-predicate table triplestore.read_store_stats loads —
        # estimates order joins, they never answer queries, so the
        # graph dimension needs no per-graph refinement)
        _write_store_stats(dt, out_dir)
    return out_dir


def _perm_dirs(store_dir: str, perm: str, graph: str | None) -> list[str]:
    if graph is not None:
        gd = graph_dir(store_dir, graph)
        d = os.path.join(gd, perm)
        if not os.path.exists(os.path.join(d, "_DONE")):
            raise FileNotFoundError(
                f"no completed {perm} permutation for graph <{graph}> "
                f"under {store_dir}"
            )
        return [d]
    dirs = [
        os.path.join(gd, perm)
        for _, gd in sorted(list_graphs(store_dir).items())
    ]
    dirs = [d for d in dirs if os.path.exists(os.path.join(d, "_DONE"))]
    if not dirs:
        raise FileNotFoundError(f"no completed graphs under {store_dir}")
    return dirs


def _parquet_files(dirs: list[str]) -> list[str]:
    """Expand perm dirs (base runs + delta-NNNN subdirs) to their parquet
    FILES — ``read_parquet`` takes one flat file list across graphs (the
    ivfpq probed-dirs pattern; a list of directories is not a valid
    read_parquet source). Crashed ``.tmp``/``.old`` dirs are skipped."""
    out: list[str] = []
    for d in dirs:
        for root, subdirs, files in os.walk(d):
            subdirs[:] = [
                s for s in subdirs
                if not (s.endswith(".tmp") or s.endswith(".old"))
            ]
            out.extend(
                os.path.join(root, f) for f in files if f.endswith(".parquet")
            )
    return sorted(out)


def _fold_deltas(ds):
    """Base + delta rows -> net rows: re-aggregate (s,p,o,graph) support,
    drop keys folded to <= 0 (retractions)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    out = ds.groupby(QUAD_KEYS).aggregate(Sum("n_mentions", alias_name="n_mentions"))

    def positive(b: pa.Table) -> pa.Table:
        n = b.column("n_mentions")
        if isinstance(n, pa.ChunkedArray):
            n = n.combine_chunks()
        b = b.filter(pc.greater(n, 0))
        i = b.column_names.index("n_mentions")
        return b.set_column(
            i, "n_mentions", b.column("n_mentions").cast(pa.int64())
        )

    return out.map_batches(positive, batch_format="pyarrow")


def quad_lookup(
    store_dir: str,
    position: str,
    value,
    *,
    graph: str | None = None,
    second=None,
):
    """Point lookup by leading key across ONE graph (``graph=``) or the
    union of all graphs (union-default-graph reads). Always ONE
    ``read_parquet`` over the selected per-graph permutation dirs — the
    graph column rides in-file, so no per-graph union chain; row-group
    stats prune on the leading (and optional second) key exactly like the
    single-graph store."""
    import pyarrow.compute as pc
    import ray.data as rd

    perm = {"subj": "spo", "pred": "pos", "obj": "osp"}[position]
    dirs = _perm_dirs(store_dir, perm, graph)
    flt = pc.field(position) == value
    if second is not None:
        flt = flt & (pc.field(PERMS[perm][1]) == second)
    ds = rd.read_parquet(_parquet_files(dirs), filter=flt)
    if not any(_delta_dirs(d) for d in dirs):
        return ds
    return _fold_deltas(ds)


def graph_stream(store_dir: str, *, graph: str | None = None, perm: str = "spo"):
    """The store's full quad stream (one graph or all) — what serving
    WHERE clauses and CLEAR evaluate over. Delta-aware; ONE read."""
    import ray.data as rd

    dirs = _perm_dirs(store_dir, perm, graph)
    ds = rd.read_parquet(_parquet_files(dirs))
    if not any(_delta_dirs(d) for d in dirs):
        return ds
    return _fold_deltas(ds)


def apply_quad_delta(
    store_dir: str,
    delta,
    *,
    distinct: bool = False,
    row_group_size: int | None = None,
) -> list[str]:
    """Merge a quad delta as ONE new LSM generation per affected graph
    (graphs absent from the store are created empty first — the SPARQL
    auto-create rule for INSERT). ``delta`` is mention-level (subj, pred,
    obj, graph) or, with ``distinct=True``, already (.. n_mentions) with
    negative support retracting. |delta| work: the aggregate runs over
    the delta only; per-graph partitions are delta-sized sorted runs."""
    import pyarrow.compute as pc

    dt = (delta if distinct else distinct_quads(delta)).materialize()
    graphs = sorted(r["graph"] for r in dt.groupby("graph").count().take_all())
    kw = {"row_group_size": row_group_size} if row_group_size else {}
    created: list[str] = []
    for g in graphs:
        gd = create_graph(store_dir, g)
        dtg = dt.map_batches(
            lambda b, gg=g: b.filter(pc.equal(b.column("graph"), pa.scalar(gg))),
            batch_format="pyarrow",
        ).materialize()
        for name in PERMS:
            d = os.path.join(gd, name)
            seq = len(_delta_dirs(d))
            part = os.path.join(d, f"delta-{seq:04d}")
            tmp = part + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            dtg.sort(PERMS[name]).write_parquet(tmp, **kw)
            os.rename(tmp, part)
            created.append(part)
    return created


def clear_graph(store_dir: str, graph: str) -> int:
    """``CLEAR GRAPH <iri>``: one delta generation negating every key's
    net support IN THAT GRAPH ONLY — |graph| work, sibling graphs
    untouched (the locality the per-graph partitioning buys). Returns
    the number of keys retracted."""
    import pyarrow.compute as pc

    def negate(b: pa.Table) -> pa.Table:
        n = b.column("n_mentions")
        if isinstance(n, pa.ChunkedArray):
            n = n.combine_chunks()
        n = n.cast(pa.int64())
        b = b.set_column(
            b.column_names.index("n_mentions"), "n_mentions",
            pc.negate_checked(n),
        )
        return b.filter(pc.not_equal(n, 0))

    delta = (
        graph_stream(store_dir, graph=graph)
        .map_batches(negate, batch_format="pyarrow")
        .materialize()
    )
    n = delta.count()
    if n:
        apply_quad_delta(store_dir, delta, distinct=True)
    return n


def compact_quad_store(store_dir: str, *, row_group_size: int | None = None) -> dict:
    """Fold every graph's base + deltas back into single sorted runs
    (per-graph LSM compaction; graphs whose net support is empty keep an
    empty base — DROP is the verb that removes a graph). Returns
    {graph: n_delta_generations_folded} (max across that graph's perms)."""
    import ray.data as rd

    kw = {"row_group_size": row_group_size} if row_group_size else {}
    folded: dict[str, int] = {}
    for g, gd in sorted(list_graphs(store_dir).items()):
        n_folded = 0
        for name in PERMS:
            d = os.path.join(gd, name)
            deltas = _delta_dirs(d)
            if not deltas:
                continue
            n_folded = max(n_folded, len(deltas))
            merged = _fold_deltas(rd.read_parquet(d))
            tmp = d + ".compact.tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            merged.sort(PERMS[name]).write_parquet(tmp, **kw)
            if not os.listdir(tmp):  # fully-retracted graph: keep a
                # readable empty base (schema-carrying file)
                import pyarrow.parquet as pq

                pq.write_table(
                    _SCHEMA.empty_table(), os.path.join(tmp, "empty.parquet")
                )
            old = d + ".old"
            shutil.rmtree(old, ignore_errors=True)
            os.rename(d, old)
            os.rename(tmp, d)
            shutil.rmtree(old)
            with open(os.path.join(d, "_DONE"), "w") as f:
                f.write("ok")
        folded[g] = n_folded
    if any(folded.values()) and os.path.isdir(os.path.join(store_dir, "stats")):
        # deltas drifted the cross-graph planning synopsis; rebuild it
        # from the compacted bases (one pruned read over every graph's
        # spo run — same refresh rule as triplestore.compact_store)
        import ray.data as rd

        marker = os.path.join(store_dir, "stats", "_DONE")
        if os.path.exists(marker):
            os.remove(marker)
        _write_store_stats(
            rd.read_parquet(
                _parquet_files(_perm_dirs(store_dir, "spo", None)),
                columns=["subj", "pred", "obj"],
            ),
            store_dir,
        )
    return folded
