"""SPARQL serving over the permutation triple store.

The glue between the query front-end (kernel/sparql.py) and the on-disk
store (sinks/triplestore.py) — what a deployed KG endpoint runs:

- every bound-predicate pattern reads via the POS-index ``lookup``
  (only fragments whose row-group stats admit the predicate),
- join order comes from the store's per-predicate synopsis
  (``plan="stats"`` — zero scans to plan),
- variable-predicate and property-path patterns fall back to streaming
  the SPO base (rare in served workloads; still index-resident, still
  column-pruned),
- DESCRIBE unions the SPO and OSP point lookups instead of scanning.

Everything returns lazy Datasets; nothing driver-materializes.
No reference counterpart (file:line n/a — quickner has no query layer).
"""

from __future__ import annotations

import os

__all__ = [
    "quad_select",
    "quad_update",
    "sparql_ask",
    "sparql_construct",
    "sparql_describe",
    "sparql_select",
    "sparql_update",
]


def _base(store_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(store_dir, "spo"))


def _kwargs(store_dir: str, parsed_has_paths: bool) -> dict:
    from .sinks.triplestore import lookup, read_store_stats

    def source(pat):
        s, pred, o = pat[0], pat[1], pat[2]
        if isinstance(pred, tuple) or (
            isinstance(pred, str) and pred.startswith("?")
        ):
            return _base(store_dir)  # unbound predicate: stream the base
        if not s.startswith("?"):  # (subj, pred) prefix: SPO two-key prune
            return lookup(store_dir, "subj", s, second=pred)
        if not o.startswith("?"):  # (pred, obj) prefix: POS two-key prune
            return lookup(store_dir, "pred", pred, second=o)
        return lookup(store_dir, "pred", pred)

    kw: dict = {"pattern_source": source}
    if not parsed_has_paths:
        kw["plan"] = "stats"
        kw["stats"] = read_store_stats(store_dir)
    return kw


def _has_paths(query: str) -> bool:
    from .kernel.sparql import SparqlError, parse_select

    try:
        q = parse_select(query)
    except SparqlError:
        return True  # non-SELECT verbs: let the caller's verb parse it;
        # skip stats planning (safe either way — planning is an ordering)
    return any(
        isinstance(p[1], tuple)
        for p in (*q["patterns"], *q["optional"], *q["not_exists"],
                  *[pp for grp in q["unions"] for pp in grp])
    )


def sparql_select(store_dir: str, query: str, **overrides):
    """Serve a SPARQL SELECT from the store. Property paths evaluate
    against the SPO base (bgp_match routes path steps through
    ``triples``), so the base Dataset rides along as the stream."""
    from .kernel.sparql import run_select

    kw = _kwargs(store_dir, _has_paths(query))
    kw.update(overrides)
    return run_select(_base(store_dir), query, **kw)


def sparql_ask(store_dir: str, query: str, **overrides):
    from .kernel.sparql import run_ask

    kw = _kwargs(store_dir, True)  # ASK groups are small; skip planning
    kw.update(overrides)
    return run_ask(_base(store_dir), query, **kw)


def sparql_construct(store_dir: str, query: str, **overrides):
    from .kernel.sparql import run_construct

    kw = _kwargs(store_dir, True)
    kw.update(overrides)
    return run_construct(_base(store_dir), query, **kw)


def sparql_describe(store_dir: str, query: str):
    """DESCRIBE :term from the store: the SPO lookup (term as subject)
    unioned with the OSP lookup (term as object) — two point reads, no
    scan — then one bounded dedup groupby."""
    import pyarrow as pa
    from ray.data.aggregate import Count

    from .kernel.sparql import SparqlError, _term, _tokens
    from .sinks.triplestore import lookup

    toks = list(_tokens(query))
    if len(toks) != 2 or toks[0].upper() != "DESCRIBE":
        raise SparqlError("DESCRIBE takes exactly one term")
    term = _term(toks[1])
    if term.startswith("?"):
        raise SparqlError("DESCRIBE needs a constant term, not a variable")
    both = lookup(store_dir, "subj", term).union(
        lookup(store_dir, "obj", term)
    )
    return (
        both.map_batches(
            lambda b: pa.table(
                {"subj": b.column("subj"), "pred": b.column("pred"),
                 "obj": b.column("obj")}
            ),
            batch_format="pyarrow",
        )
        .groupby(["subj", "pred", "obj"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )


def sparql_update(store_dir: str, text: str, *, perms: list[str] | None = None) -> int:
    """Execute a SPARQL UPDATE against the permutation store as ONE LSM
    delta generation (sinks/triplestore.apply_triple_delta — |delta| work,
    no rebuild; compact_store folds it later). Two request shapes
    (kernel/sparql.parse_update_request):

    * **Ground data** — an ``INSERT DATA { ... }`` / ``DELETE DATA``
      sequence. Per triple key, a DELETE retracts the store's CURRENT
      support and voids any earlier INSERT in the same request; INSERTs
      after the last DELETE add support. Retraction amounts come from
      point lookups against the pre-update store — the delete set is
      bounded by the request text, so these are a handful of pruned index
      reads, never a scan.
    * **Pattern templates** — ``DELETE WHERE { bgp }`` or
      ``DELETE { tpl } [INSERT { tpl }] WHERE { group }``. The WHERE
      bindings stream from the served BGP engine (synopsis-planned index
      lookups, same as SELECT); templates instantiate as distinct-key
      Datasets (CONSTRUCT shape). DELETE keys join the SPO base with the
      bucketed hash join to fetch current support (the delete set can be
      data-sized, so this stays a distributed exchange — no driver
      materialization); INSERT keys add support 1 each. Both fold into
      one groupby-summed delta.

    Returns the number of (s, p, o) keys the applied delta touched
    (0 = no-op request; nothing is written). Idempotency is the
    caller's contract, as with apply_triple_delta: re-running the same
    request re-applies it (INSERT support doubles), so guard with
    ``_delta_dirs`` where exactly-once matters.
    No reference counterpart (n/a — quickner has no query layer)."""
    import pyarrow as pa
    import ray.data as rd

    from .kernel.sparql import SparqlGraphStoreError, parse_update_request
    from .sinks.triplestore import PERMS, apply_triple_delta, lookup

    kind, parsed = parse_update_request(text)
    if perms is None:
        perms = [
            p for p in PERMS
            if os.path.exists(os.path.join(store_dir, p, "_DONE"))
        ]
    if not perms:
        raise FileNotFoundError(f"no completed permutation under {store_dir}")

    if kind in (
        "clear_graph", "drop_graph", "create_graph",
        "add_graph_to", "copy_graph_to", "move_graph_to",
    ):
        raise SparqlGraphStoreError(
            f"{kind.split('_')[0].upper()} GRAPH targets a named-graph "
            "store — use quad_update on a quad store "
            "(sinks/quadstore.py); this permutation store is single-graph"
        )
    if kind == "modify":
        if parsed.get("with_graph") is not None:
            raise SparqlGraphStoreError(
                "WITH <graph> scoping needs a quad store — use quad_update"
            )
        return _apply_modify(store_dir, parsed, perms)
    if kind == "load":
        return _apply_load(store_dir, parsed, perms)
    if kind == "clear":
        return _apply_clear(store_dir, perms)
    ops = parsed
    if any(len(t) == 4 for _, ts in ops for t in ts):
        raise SparqlGraphStoreError(
            "GRAPH blocks in DATA need a quad store — use quad_update"
        )

    # fold the op sequence: triple -> [retract_store_support, n_inserts]
    pending: dict[tuple[str, str, str], list] = {}
    for verb, triples in ops:
        for t in triples:
            st = pending.setdefault(t, [False, 0])
            if verb == "insert":
                st[1] += 1
            else:
                st[0] = True
                st[1] = 0

    retract = [t for t, st in pending.items() if st[0]]
    store_n: dict[tuple[str, str, str], int] = {}
    if retract:
        by_perm = {"spo": ("subj", 0), "pos": ("pred", 1), "osp": ("obj", 2)}
        perm = next((p for p in ("spo", "osp", "pos") if p in perms), perms[0])
        position, idx = by_perm[perm]
        for key in sorted({t[idx] for t in retract}):
            for r in lookup(store_dir, position, key).take_all():
                store_n[(r["subj"], r["pred"], r["obj"])] = r["n_mentions"]

    keys, deltas = [], []
    for t, (retr, ins) in pending.items():
        n = ins - (store_n.get(t, 0) if retr else 0)
        if n != 0:
            keys.append(t)
            deltas.append(n)
    if not keys:
        return 0
    tab = pa.table(
        {
            "subj": pa.array([k[0] for k in keys], type=pa.string()),
            "pred": pa.array([k[1] for k in keys], type=pa.string()),
            "obj": pa.array([k[2] for k in keys], type=pa.string()),
            "n_mentions": pa.array(deltas, type=pa.int64()),
        }
    )
    apply_triple_delta(store_dir, rd.from_arrow(tab), perms=perms, distinct=True)
    return len(keys)


def _apply_load(store_dir: str, paths: list[str], perms: list[str]) -> int:
    """``LOAD <iri>`` executor: stream-parse the RDF document(s) with the
    format reader the extension selects (.ttl -> sources/turtle, .nt ->
    sources/ntriples, .nq -> nquads with the graph column dropped; a
    directory loads its shard files — one parse task per file), aggregate
    occurrence counts per (s, p, o), and merge everything as ONE LSM delta
    generation. LOAD is additive on the counted store: each occurrence in
    the loaded document adds support 1, consistent with INSERT DATA.
    Returns the number of distinct keys the delta touched."""
    from .sinks.triplestore import apply_triple_delta, distinct_triples
    from .sources.ntriples import read_nquads, read_ntriples
    from .sources.turtle import read_turtle

    readers = {".ttl": read_turtle, ".nt": read_ntriples, ".nq": read_nquads}

    def parts_for(p: str):
        """One (reader, target) per extension GROUP — a directory mixing
        .ttl/.nt/.nq shards parses each file with ITS format's reader
        (<=3 bounded union arms), never the alphabetically-first file's."""
        if os.path.isdir(p):
            by_ext: dict[str, list[str]] = {}
            for f in sorted(os.listdir(p)):
                ext = os.path.splitext(f)[1]
                if ext in readers:
                    by_ext.setdefault(ext, []).append(os.path.join(p, f))
            if not by_ext:
                raise FileNotFoundError(f"LOAD <{p}>: no RDF files inside")
            return [(readers[e], fs) for e, fs in sorted(by_ext.items())]
        ext = os.path.splitext(p)[1]
        if ext not in readers:
            raise ValueError(
                f"LOAD <{p}>: unsupported extension (expected .ttl/.nt/.nq)"
            )
        return [(readers[ext], p)]

    ds = None
    for p in paths:
        local = p[7:] if p.startswith("file://") else p
        for reader, target in parts_for(local):
            part = reader(target).select_columns(["subj", "pred", "obj"])
            ds = part if ds is None else ds.union(part)
    delta = distinct_triples(ds).materialize()
    n = delta.count()
    if n:
        apply_triple_delta(store_dir, delta, perms=perms, distinct=True)
    return n


def _apply_clear(store_dir: str, perms: list[str]) -> int:
    """``CLEAR ALL`` executor: one delta generation negating every key's
    current NET support (base + prior deltas, one groupby-sum over the
    store — CLEAR is inherently |store| work), so lookups fold everything
    to zero. ``compact_store`` later reclaims the space physically.
    Returns the number of keys retracted (0 on an already-empty store)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .sinks.triplestore import apply_triple_delta

    def as_delta(b: pa.Table) -> pa.Table:
        n = b.column("n_mentions")
        if isinstance(n, pa.ChunkedArray):
            n = n.combine_chunks()
        n = n.cast(pa.int64())
        b = b.set_column(
            b.column_names.index("n_mentions"),
            "n_mentions",
            pc.negate_checked(n),
        )
        return b.filter(pc.not_equal(n, 0))

    import ray.data as rd

    # read whichever completed permutation is available (contents are
    # value-identical across perms; spo may not be among ``perms``)
    src = os.path.join(store_dir, perms[0])
    delta = (
        rd.read_parquet(src, columns=["subj", "pred", "obj", "n_mentions"])
        .groupby(["subj", "pred", "obj"])
        .aggregate(Sum("n_mentions", alias_name="n_mentions"))
        .map_batches(as_delta, batch_format="pyarrow")
        .materialize()
    )
    n = delta.count()
    if n:
        apply_triple_delta(store_dir, delta, perms=perms, distinct=True)
    return n


def _apply_modify(store_dir: str, parsed: dict, perms: list[str]) -> int:
    """Pattern-template UPDATE executor: served WHERE bindings ->
    distinct delete/insert key Datasets (kernel/sparql.run_update_triples)
    -> ONE merged LSM delta.

    DELETE semantics on the counted store: retract the key's CURRENT net
    support — the delete keys join the SPO stream (base + delta runs) with
    the bucketed hash join and every matched row is negated; the final
    (s,p,o) groupby sums base+delta+request contributions, so a key whose
    support is already 0 folds away. INSERT adds support 1 per distinct
    instantiated triple (RDF set semantics on a counted store). The delete
    set can be data-sized (DELETE WHERE { ?s ?p ?o }), so everything here
    is an exchange over matched keys — nothing driver-materializes."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .kernel.sparql import run_update_triples
    from .sinks.triplestore import apply_triple_delta
    from .stages.hashjoin import bucketed_join

    sel = parsed["select"]
    has_paths = any(
        isinstance(p[1], tuple)
        for p in (
            *sel["patterns"], *sel["optional"], *sel["not_exists"],
            *[pp for grp in sel["unions"] for pp in grp],
        )
    )
    kw = _kwargs(store_dir, has_paths)
    dels, ins = run_update_triples(_base(store_dir), parsed, **kw)

    parts = []
    if dels is not None:
        matched = bucketed_join(
            _base(store_dir),
            dels,
            on=("subj", "pred", "obj"),
            n_buckets=16,
            join_type="inner",
        )

        def negate(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "subj": b.column("subj"),
                    "pred": b.column("pred"),
                    "obj": b.column("obj"),
                    "n_mentions": pc.negate_checked(
                        b.column("n_mentions").cast(pa.int64())
                    ),
                }
            )

        parts.append(matched.map_batches(negate, batch_format="pyarrow"))
    if ins is not None:

        def plus_one(b: pa.Table) -> pa.Table:
            return b.append_column(
                "n_mentions", pa.array([1] * b.num_rows, type=pa.int64())
            )

        parts.append(ins.map_batches(plus_one, batch_format="pyarrow"))

    merged = parts[0]
    for p in parts[1:]:
        merged = merged.union(p)
    def nonzero_int64(b: pa.Table) -> pa.Table:
        n = b.column("n_mentions")
        if isinstance(n, pa.ChunkedArray):
            n = n.combine_chunks()
        n = n.cast(pa.int64())
        b = b.set_column(b.column_names.index("n_mentions"), "n_mentions", n)
        return b.filter(pc.not_equal(n, 0))  # keys whose support nets out

    delta = (
        merged.groupby(["subj", "pred", "obj"])
        .aggregate(Sum("n_mentions", alias_name="n_mentions"))
        .map_batches(nonzero_int64, batch_format="pyarrow")
        .materialize()
    )
    n = delta.count()
    if n == 0:
        return 0
    apply_triple_delta(store_dir, delta, perms=perms, distinct=True)
    return n


# --- named-graph (quad store) serving ---------------------------------------

def _quad_kwargs(store_dir: str) -> dict:
    """Per-pattern index routing for the quad store (the single-graph
    `_kwargs` generalized): a pattern inside ``GRAPH :iri`` reads ONLY
    that graph's permutation subtree; a constant-graph-free or
    ``GRAPH ?g`` pattern reads the union-default file list — either way
    one pruned read per pattern, the graph column riding in-file so the
    4th pattern term binds/restricts vectorized on top."""
    from .sinks.quadstore import graph_stream, quad_lookup

    def source(pat):
        s, pred, o = pat[0], pat[1], pat[2]
        g = pat[3] if len(pat) == 4 else None
        graph = (
            None
            if g is None or (isinstance(g, str) and g.startswith("?"))
            else g
        )
        if isinstance(pred, tuple) or pred.startswith("?"):
            return graph_stream(store_dir, graph=graph)
        if not s.startswith("?"):  # (subj, pred) prefix: SPO two-key prune
            return quad_lookup(store_dir, "subj", s, second=pred, graph=graph)
        if not o.startswith("?"):  # (pred, obj) prefix: POS two-key prune
            return quad_lookup(store_dir, "pred", pred, second=o, graph=graph)
        return quad_lookup(store_dir, "pred", pred, graph=graph)

    return {"pattern_source": source}


def quad_select(
    store_dir: str,
    query: str,
    *,
    graph: str | None = None,
    serve: str = "lookup",
):
    """Serve a SPARQL query over the quad store. ``serve="lookup"``
    routes every bound-predicate pattern through the per-graph
    permutation indexes (`_quad_kwargs` — a ``GRAPH :iri`` group reads
    one graph's subtree only); ``serve="stream"`` feeds the
    union-default quad stream (ONE read across every graph's SPO run,
    delta-aware) to the front-end. Both answer identically; ``graph=``
    restricts the stream variant to one graph."""
    from .kernel.sparql import run_select
    from .sinks.quadstore import graph_stream

    if serve == "lookup" and graph is None:
        kw = _quad_kwargs(store_dir)
        if os.path.exists(
            os.path.join(store_dir, "stats", "_DONE")
        ) and not _has_paths(query):
            # cross-graph synopsis (write_quad_store stats=True): join
            # order priced from a #predicates-row table, zero scans
            from .sinks.triplestore import read_store_stats

            kw["plan"] = "stats"
            kw["stats"] = read_store_stats(store_dir)
        return run_select(graph_stream(store_dir), query, **kw)
    return run_select(graph_stream(store_dir, graph=graph), query)


def quad_update(store_dir: str, text: str) -> int:
    """Execute a SPARQL UPDATE against the NAMED-GRAPH store. The graph
    verbs lower onto per-graph subtrees — the locality the partitioning
    buys (sinks/quadstore.py module docstring):

    * ``CREATE GRAPH <g>`` / ``DROP GRAPH <g>`` — create / remove one
      graph's subtree (O(1) / O(graph); DROP reclaims physically).
    * ``ADD/COPY/MOVE GRAPH <src> TO GRAPH <dst>`` — ADD merges src's
      net triples into dst (support-additive); COPY replaces dst (one
      clear delta + the copied net); MOVE = COPY then DROP src. All
      |src|+|dst| work on two subtrees.
    * ``CLEAR GRAPH <g>`` — one delta generation negating net support in
      THAT graph only; ``CLEAR ALL``/``DEFAULT`` loops every graph.
    * ``INSERT DATA`` / ``DELETE DATA`` with ``GRAPH <g> { ... }``
      blocks — quad-level sequence semantics (a DELETE retracts the
      target graph's current support and voids earlier same-request
      INSERTs of the same quad); bare triples land in the default graph
      ``''``. Unknown graphs auto-create on INSERT.
    * ``WITH <g> DELETE {t} [INSERT {t}] WHERE {group}`` and
      ``WITH <g> DELETE WHERE {bgp}`` — the WHERE evaluates over graph
      g's stream AND the templates target g (SPARQL 1.1 WITH rule).
      The delete keys join g's stream distributed (bucketed hash join),
      so data-sized delete sets never touch the driver.
    * ``LOAD <iri>`` — ``.nq`` documents land in their own graph terms
      (quads; missing graph -> ``''``), ``.ttl``/``.nt`` in ``''``.

    Returns the number of (s, p, o, graph) keys touched (DROP/CREATE
    return 1/0 for changed/no-op). Same idempotency contract as
    sparql_update. Reference: n/a — no counterpart."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from .kernel.sparql import SparqlError, parse_update_request
    from .sinks.quadstore import (
        apply_quad_delta,
        clear_graph,
        create_graph,
        drop_graph,
        graph_stream,
        list_graphs,
        quad_lookup,
    )

    kind, parsed = parse_update_request(text)

    if kind == "create_graph":
        existed = parsed in list_graphs(store_dir)
        create_graph(store_dir, parsed)
        return 0 if existed else 1
    if kind == "drop_graph":
        return int(drop_graph(store_dir, parsed))
    if kind == "clear_graph":
        return clear_graph(store_dir, parsed)
    if kind in ("add_graph_to", "copy_graph_to", "move_graph_to"):
        src, dst = parsed
        if src not in list_graphs(store_dir):
            raise FileNotFoundError(f"graph <{src}> not in store {store_dir}")
        n = 0
        if kind != "add_graph_to" and dst in list_graphs(store_dir):
            n += clear_graph(store_dir, dst)  # COPY/MOVE replace dst
        def retarget(b, d=dst):
            i = b.column_names.index("graph")
            return b.set_column(
                i, "graph", pa.array([d] * b.num_rows, type=pa.string())
            )

        copied = (
            graph_stream(store_dir, graph=src)
            .map_batches(retarget, batch_format="pyarrow")
            .materialize()
        )
        k = copied.count()
        if k:
            apply_quad_delta(store_dir, copied, distinct=True)
        if kind == "move_graph_to":
            drop_graph(store_dir, src)
        return n + k
    if kind == "clear":
        return sum(clear_graph(store_dir, g) for g in sorted(list_graphs(store_dir)))
    if kind == "load":
        return _quad_load(store_dir, parsed)
    if kind == "modify":
        return _quad_modify(store_dir, parsed)

    # ground data: fold the op sequence per QUAD key
    ops = parsed
    pending: dict[tuple[str, str, str, str], list] = {}
    for verb, triples in ops:
        for t in triples:
            q = t if len(t) == 4 else (*t, "")
            st = pending.setdefault(q, [False, 0])
            if verb == "insert":
                st[1] += 1
            else:
                st[0] = True
                st[1] = 0

    # retraction amounts: per graph, pruned point lookups on the
    # pre-update store (bounded by the request text, never a scan)
    store_n: dict[tuple[str, str, str, str], int] = {}
    retract = [q for q, st in pending.items() if st[0]]
    known = list_graphs(store_dir)
    for g in sorted({q[3] for q in retract}):
        if g not in known:
            continue  # deleting from an absent graph retracts nothing
        for subj in sorted({q[0] for q in retract if q[3] == g}):
            for r in quad_lookup(store_dir, "subj", subj, graph=g).take_all():
                store_n[(r["subj"], r["pred"], r["obj"], g)] = r["n_mentions"]

    keys, deltas = [], []
    for q, (retr, ins) in pending.items():
        n = ins - (store_n.get(q, 0) if retr else 0)
        if n != 0:
            keys.append(q)
            deltas.append(n)
    if not keys:
        return 0
    tab = pa.table(
        {
            "subj": pa.array([k[0] for k in keys], type=pa.string()),
            "pred": pa.array([k[1] for k in keys], type=pa.string()),
            "obj": pa.array([k[2] for k in keys], type=pa.string()),
            "graph": pa.array([k[3] for k in keys], type=pa.string()),
            "n_mentions": pa.array(deltas, type=pa.int64()),
        }
    )
    apply_quad_delta(store_dir, rd.from_arrow(tab), distinct=True)
    return len(keys)


def _quad_load(store_dir: str, paths: list[str]) -> int:
    """LOAD into the quad store: ``.nq`` shards keep their graph terms,
    ``.ttl``/``.nt`` land in the default graph ``''``."""
    import pyarrow as pa

    from .sinks.quadstore import apply_quad_delta, distinct_quads
    from .sources.ntriples import read_nquads, read_ntriples
    from .sources.turtle import read_turtle

    def with_graph(ds, constant: str | None):
        def f(b: pa.Table, c=constant) -> pa.Table:
            g = (
                pa.array([c] * b.num_rows, type=pa.string())
                if c is not None
                else b.column("graph")
            )
            return pa.table(
                {"subj": b.column("subj"), "pred": b.column("pred"),
                 "obj": b.column("obj"), "graph": g}
            )

        return ds.map_batches(f, batch_format="pyarrow")

    readers = {
        ".ttl": (read_turtle, ""),
        ".nt": (read_ntriples, ""),
        ".nq": (read_nquads, None),  # graph rides the parsed quad
    }
    ds = None
    for p in paths:
        local = p[7:] if p.startswith("file://") else p
        groups: list[tuple[str, object]] = []
        if os.path.isdir(local):
            by_ext: dict[str, list[str]] = {}
            for f in sorted(os.listdir(local)):
                ext = os.path.splitext(f)[1]
                if ext in readers:
                    by_ext.setdefault(ext, []).append(os.path.join(local, f))
            if not by_ext:
                raise FileNotFoundError(f"LOAD <{p}>: no RDF files inside")
            groups = sorted(by_ext.items())
        else:
            ext = os.path.splitext(local)[1]
            if ext not in readers:
                raise ValueError(
                    f"LOAD <{p}>: unsupported extension (expected .ttl/.nt/.nq)"
                )
            groups = [(ext, local)]
        for ext, target in groups:
            reader, const = readers[ext]
            part = with_graph(reader(target), const)
            ds = part if ds is None else ds.union(part)
    delta = distinct_quads(ds).materialize()
    n = delta.count()
    if n:
        apply_quad_delta(store_dir, delta, distinct=True)
    return n


def _quad_modify(store_dir: str, parsed: dict) -> int:
    """WITH-scoped pattern-template UPDATE on the quad store: WHERE
    bindings stream from the target graph only; delete keys join that
    graph's stream (distributed); the merged delta lands in that graph's
    LSM roster alone — sibling graphs are untouched by construction."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .kernel.sparql import SparqlError, run_update_triples
    from .sinks.quadstore import apply_quad_delta, graph_stream, list_graphs
    from .stages.hashjoin import bucketed_join

    g = parsed.get("with_graph")
    if g is None:
        raise SparqlError(
            "quad-store template updates need WITH <graph> scoping "
            "(which graph should the templates target?)"
        )
    if g not in list_graphs(store_dir):
        raise FileNotFoundError(f"graph <{g}> not in store {store_dir}")
    scoped = graph_stream(store_dir, graph=g)
    dels, ins = run_update_triples(scoped, parsed)

    parts = []
    if dels is not None:
        matched = bucketed_join(
            scoped.select_columns(["subj", "pred", "obj", "n_mentions"]),
            dels,
            on=("subj", "pred", "obj"),
            n_buckets=16,
            join_type="inner",
        )

        def negate(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "subj": b.column("subj"),
                    "pred": b.column("pred"),
                    "obj": b.column("obj"),
                    "n_mentions": pc.negate_checked(
                        b.column("n_mentions").cast(pa.int64())
                    ),
                }
            )

        parts.append(matched.map_batches(negate, batch_format="pyarrow"))
    if ins is not None:

        def plus_one(b: pa.Table) -> pa.Table:
            return b.append_column(
                "n_mentions", pa.array([1] * b.num_rows, type=pa.int64())
            )

        parts.append(ins.map_batches(plus_one, batch_format="pyarrow"))

    merged = parts[0]
    for p in parts[1:]:
        merged = merged.union(p)

    def finish(b: pa.Table, gg=g) -> pa.Table:
        n = b.column("n_mentions")
        if isinstance(n, pa.ChunkedArray):
            n = n.combine_chunks()
        n = n.cast(pa.int64())
        b = b.set_column(b.column_names.index("n_mentions"), "n_mentions", n)
        b = b.filter(pc.not_equal(n, 0))
        return b.append_column(
            "graph", pa.array([gg] * b.num_rows, type=pa.string())
        )

    delta = (
        merged.groupby(["subj", "pred", "obj"])
        .aggregate(Sum("n_mentions", alias_name="n_mentions"))
        .map_batches(finish, batch_format="pyarrow")
        .materialize()
    )
    n = delta.count()
    if n == 0:
        return 0
    apply_quad_delta(store_dir, delta, distinct=True)
    return n
