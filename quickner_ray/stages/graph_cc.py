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
import pyarrow.compute as pc


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


MAX_ENT_PER_DOC = 64


def _cooc_batch(
    batch: pa.Table, *, cap: int = MAX_ENT_PER_DOC, doc_col: str = "doc_id"
) -> pa.Table:
    """Mentions batch -> per-batch partial co-occurrence counts
    (entity_a, entity_b, n), entity_a < entity_b.

    A document's mentions are contiguous within one batch (explode_mentions
    is per-batch over whole documents), so per-doc pair generation needs NO
    shuffle — only the final (a, b) count aggregation does.  Per doc the
    distinct entity list is capped at ``cap`` lowest eids (quadratic guard,
    mirrored in the SQL oracle), and the loop runs once per DOCUMENT over
    numpy arrays, not once per mention or pair.
    """
    import numpy as np
    import pyarrow.compute as pc

    from .canonicalize import entity_id

    if batch.num_rows == 0:
        return pa.table(
            {
                "entity_a": pa.array([], type=pa.string()),
                "entity_b": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    sn = batch.column("surface_norm")
    if isinstance(sn, pa.ChunkedArray):
        sn = sn.combine_chunks()
    lb = batch.column("label")
    if isinstance(lb, pa.ChunkedArray):
        lb = lb.combine_chunks()
    # eid per mention via md5 per DISTINCT (surface_norm, label) pair —
    # the distinct set is bounded by the gazetteer, not the mention stream
    key = pc.binary_join_element_wise(
        sn.cast(pa.large_string()),
        lb.cast(pa.large_string()),
        pa.scalar("\x00", type=pa.large_string()),
    )
    enc = pc.dictionary_encode(key)
    codes = enc.indices.to_numpy(zero_copy_only=False)
    eid_vocab = np.array(
        [entity_id(*k.rsplit("\x00", 1)) for k in enc.dictionary.to_pylist()]
    )
    docs = np.asarray(batch.column(doc_col).to_pylist())
    # distinct (doc, eid), sorted by doc then eid string — the cap order
    de = np.unique(
        np.stack([docs, eid_vocab[codes]], axis=1), axis=0
    )
    d, e = de[:, 0], de[:, 1]
    bounds = np.flatnonzero(np.r_[True, d[1:] != d[:-1], True])
    out_a, out_b = [], []
    for s, t in zip(bounds[:-1], bounds[1:]):
        ids = e[s : min(t, s + cap)]
        k = len(ids)
        if k >= 2:
            iu, ju = np.triu_indices(k, 1)
            out_a.append(ids[iu])
            out_b.append(ids[ju])
    if not out_a:
        return pa.table(
            {
                "entity_a": pa.array([], type=pa.string()),
                "entity_b": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    ab = np.stack([np.concatenate(out_a), np.concatenate(out_b)], axis=1)
    uniq, counts = np.unique(ab, axis=0, return_counts=True)
    return pa.table(
        {
            "entity_a": pa.array(uniq[:, 0]),
            "entity_b": pa.array(uniq[:, 1]),
            "n": pa.array(counts, type=pa.int64()),
        }
    )


def cooccurrence_pairs(
    mentions,
    *,
    cap: int = MAX_ENT_PER_DOC,
    doc_col: str = "doc_id",
    annotated: bool = False,
):
    """KG edge construction: entity co-occurrence graph.
    Dataset -> Dataset(entity_a, entity_b, n_docs) — one edge per entity
    pair co-mentioned in a document, weighted by document count.

    Shape: per-batch partial counts (zero-shuffle pair generation, see
    ``_cooc_batch``) then ONE groupby-sum on the pair key.

    Doc locality: ``_cooc_batch`` needs a document's mentions whole inside
    one batch.  Pass ``annotated=True`` with the ANNOTATED-documents
    dataset (one row per doc) — the explode then runs FUSED in the same
    batch fn, so the invariant holds by construction even when Ray's
    dynamic block splitting would have split a large exploded block
    mid-document.  The raw-mentions form remains for callers that own the
    layout (e.g. a freshly exploded in-memory batch in tests).
    """
    from ray.data.aggregate import Sum

    if annotated:
        from .canonicalize import explode_mentions

        def gen(b: pa.Table) -> pa.Table:
            return _cooc_batch(
                explode_mentions(b, subj_col=doc_col), cap=cap, doc_col=doc_col
            )

    else:

        def gen(b: pa.Table) -> pa.Table:
            return _cooc_batch(b, cap=cap, doc_col=doc_col)

    partial = mentions.map_batches(gen, batch_format="pyarrow")
    return partial.groupby(["entity_a", "entity_b"]).aggregate(
        Sum("n", alias_name="n_docs")
    )


PR_SCALE = 10**12  # fixed-point unit for integer PageRank


def _project_t(ds, mapping: dict[str, str], types: dict[str, "pa.DataType"]):
    """``_project`` with per-column empty-block types: ``types`` maps an
    OUT column name to its arrow type (default int64) so schema-less empty
    blocks normalize correctly for non-int64 keys (string entity ids)."""

    def f(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {out: pa.array([], type=types.get(out, pa.int64())) for out in mapping}
            )
        return pa.table({out: b.column(src) for out, src in mapping.items()})

    return ds.map_batches(f, batch_format="pyarrow")


def pagerank(
    edges,
    *,
    nodes,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    node_type: "pa.DataType | None" = None,
    n_iters: int = 3,
    num_partitions: int = 8,
    driver_cap: int | None = None,
):
    """Integer fixed-point PageRank over an undirected simple graph:
    Dataset(node, pr_score) after ``n_iters`` power iterations with
    damping 0.85 (scores in 10^-12 units; a singleton node scores
    0.15*PR_SCALE, mass is intentionally NOT renormalized).

    All arithmetic is INTEGER (contributions by floor division, damping as
    (85*x)//100), which makes every iteration bit-deterministic across
    engines — float summation order would drift ulps per round and break
    the value-hash oracle; the unrolled SQL oracle
    (ner_oracle.sql_pagerank_ctes) applies the identical integer ops.

    Distributed shape per iteration: one hash join (edge src -> current
    score/degree), one groupby-sum of contributions on the destination
    key, one left-outer join back onto the node universe for the damping
    base — the same bounded-frontier materialize-per-round pattern as
    ``connected_components``; only the (node, score) frontier is ever
    materialized.  ``nodes`` must be distinct and cover every edge
    endpoint; ``node_type`` is the node id arrow type (int64 default,
    pass ``pa.string()`` for entity-id graphs).

    Size-gated like ``connected_components``: when the edge list is
    measurably small (< ``driver_cap``, default ``DRIVER_CAP``) the power
    iteration runs driver-side over numpy code arrays and only the
    (endpoint -> score) map is broadcast — for an ENTITY graph the edge
    set is bounded by the gazetteer squared, not the corpus, so this is
    the common case; the distributed per-iteration join/aggregate path
    covers the 10^5+-entity regime.  ``driver_cap=0`` forces distributed.
    """
    from ray.data.aggregate import Count, Sum

    nt = node_type if node_type is not None else pa.int64()
    ntypes = {"src": nt, "dst": nt, "node": nt, "jnode": nt, "inode": nt}
    cap = DRIVER_CAP if driver_cap is None else driver_cap

    fwd = _project_t(edges, {"src": src_col, "dst": dst_col}, ntypes)
    rev = _project_t(edges, {"src": dst_col, "dst": src_col}, ntypes)
    und = fwd.union(rev).repartition(num_partitions).materialize()

    universe0 = _project_t(nodes, {"node": node_col}, ntypes)
    if und.count() <= 2 * cap:
        return _broadcast_pagerank(universe0, und.take_all(), nt, n_iters)

    deg = _project_t(
        und.groupby("src").aggregate(Count(alias_name="deg")),
        {"node": "src", "deg": "deg"},
        ntypes,
    ).repartition(num_partitions).materialize()

    universe = universe0.materialize()

    def with_score(b: pa.Table) -> pa.Table:
        import numpy as np

        if b.num_rows == 0:
            return pa.table(
                {"node": pa.array([], type=nt), "score": pa.array([], type=pa.int64())}
            )
        return b.append_column(
            "score", pa.array(np.full(b.num_rows, PR_SCALE, dtype=np.int64))
        )

    scores = universe.map_batches(with_score, batch_format="pyarrow").materialize()
    base = (15 * PR_SCALE) // 100

    def contrib(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"dst": pa.array([], type=nt), "c": pa.array([], type=pa.int64())}
            )
        s = b.column("score").to_numpy(zero_copy_only=False)
        d = b.column("deg").to_numpy(zero_copy_only=False)
        return pa.table(
            {"dst": b.column("dst"), "c": pa.array(s // d, type=pa.int64())}
        )

    def damp(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"node": pa.array([], type=nt), "score": pa.array([], type=pa.int64())}
            )
        inc_np = b.column("inc").fill_null(0).to_numpy(zero_copy_only=False)
        score = base + (85 * inc_np) // 100
        return pa.table(
            {"node": b.column("node"), "score": pa.array(score, type=pa.int64())}
        )

    for _ in range(n_iters):
        # attach deg to current scores (only edge endpoints contribute)
        sd = scores.join(
            deg, "inner", num_partitions=num_partitions,
            on=("node",), right_on=("node",),
        )
        # repartition is load-bearing: the hash join can emit schema-LESS
        # empty blocks, zero-row blocks SKIP map_batches (so _project_t's
        # empty normalization never sees them), and a right-side partition
        # of only those crashes the next acero join; repartition
        # consolidates them into schema-ful blocks (see connected_components)
        j = und.join(
            _project_t(
                sd, {"jnode": "node", "score": "score", "deg": "deg"}, ntypes
            ).repartition(num_partitions),
            "inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("jnode",),
        )
        inc = (
            j.map_batches(contrib, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("c", alias_name="inc"))
        )
        inc = _project_t(inc, {"inode": "dst", "inc": "inc"}, ntypes).repartition(
            num_partitions
        )
        nxt = universe.join(
            inc, "left_outer", num_partitions=num_partitions,
            on=("node",), right_on=("inode",),
        )
        scores = nxt.map_batches(damp, batch_format="pyarrow").repartition(
            num_partitions
        ).materialize()
    return _project_t(scores, {"node": "node", "pr_score": "score"}, ntypes)


def personalized_pagerank(
    edges,
    *,
    nodes,
    seeds,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    node_type: "pa.DataType | None" = None,
    n_iters: int = 3,
    num_partitions: int = 8,
    driver_cap: int | None = None,
):
    """Integer fixed-point Personalized PageRank (random walk with
    restart) over an undirected simple graph: Dataset(node, ppr_score)
    after ``n_iters`` iterations with damping 0.85, where the 0.15
    restart mass lands ONLY on the ``seeds`` set — the classic
    entity-relatedness score ("how close is every node to THESE
    nodes"). Identical integer rules to :func:`pagerank`
    (contribution ``score // deg``, damping ``(85 * inc) // 100``),
    so every iteration is bit-deterministic and the unrolled SQL
    oracle (ner_oracle.sql_entity_ppr) compares value-exact; the only
    deltas are the seed-conditional restart base and the s0 vector
    (PR_SCALE at seeds, 0 elsewhere). Nodes unreachable from a seed
    within ``n_iters`` hops score exactly 0.

    ``seeds`` is a small Python list (query-bounded, like a SPARQL
    VALUES block): it ships inside task closures, never shuffles.
    Size-gated like ``pagerank``: below ``driver_cap`` the power
    iteration runs driver-side over numpy code arrays; above, the
    per-iteration join/aggregate rounds run with only the
    (node, score) frontier materialized.
    Reference anchor: n/a — no graph analytics in quickner; public
    grounding: Jeh & Widom 2003 (personalized PageRank), Tong et al.
    2006 (random walk with restart)."""
    from ray.data.aggregate import Count, Sum

    if not seeds:
        raise ValueError("personalized_pagerank requires >= 1 seed")
    nt = node_type if node_type is not None else pa.int64()
    ntypes = {"src": nt, "dst": nt, "node": nt, "jnode": nt, "inode": nt}
    cap = DRIVER_CAP if driver_cap is None else driver_cap
    seed_arr = pa.array(sorted(set(seeds)), type=nt)

    fwd = _project_t(edges, {"src": src_col, "dst": dst_col}, ntypes)
    rev = _project_t(edges, {"src": dst_col, "dst": src_col}, ntypes)
    und = fwd.union(rev).repartition(num_partitions).materialize()

    universe0 = _project_t(nodes, {"node": node_col}, ntypes)
    if und.count() <= 2 * cap:
        return _broadcast_ppr(universe0, und.take_all(), seed_arr, nt, n_iters)

    deg = _project_t(
        und.groupby("src").aggregate(Count(alias_name="deg")),
        {"node": "src", "deg": "deg"},
        ntypes,
    ).repartition(num_partitions).materialize()

    universe = universe0.materialize()
    base = (15 * PR_SCALE) // 100

    def seed_base(col: "pa.Array") -> "pa.Array":
        import pyarrow.compute as pc

        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        m = pc.is_in(col, value_set=seed_arr)
        return pc.if_else(m, pa.scalar(base, type=pa.int64()),
                          pa.scalar(0, type=pa.int64()))

    def with_score(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if b.num_rows == 0:
            return pa.table(
                {"node": pa.array([], type=nt), "score": pa.array([], type=pa.int64())}
            )
        col = b.column("node")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        m = pc.is_in(col, value_set=seed_arr)
        s0 = pc.if_else(m, pa.scalar(PR_SCALE, type=pa.int64()),
                        pa.scalar(0, type=pa.int64()))
        return b.append_column("score", s0)

    scores = universe.map_batches(with_score, batch_format="pyarrow").materialize()

    def contrib(b: pa.Table) -> pa.Table:
        import numpy as np

        if b.num_rows == 0:
            return pa.table(
                {"dst": pa.array([], type=nt), "c": pa.array([], type=pa.int64())}
            )
        s = b.column("score").to_numpy(zero_copy_only=False)
        d = b.column("deg").to_numpy(zero_copy_only=False)
        return pa.table(
            {"dst": b.column("dst"), "c": pa.array(s // d, type=pa.int64())}
        )

    def damp(b: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        if b.num_rows == 0:
            return pa.table(
                {"node": pa.array([], type=nt), "score": pa.array([], type=pa.int64())}
            )
        inc_np = b.column("inc").fill_null(0).to_numpy(zero_copy_only=False)
        sb = seed_base(b.column("node")).to_numpy(zero_copy_only=False)
        score = sb + (85 * inc_np) // 100
        return pa.table(
            {"node": b.column("node"), "score": pa.array(score, type=pa.int64())}
        )

    for _ in range(n_iters):
        sd = scores.join(
            deg, "inner", num_partitions=num_partitions,
            on=("node",), right_on=("node",),
        )
        # repartition is load-bearing — see pagerank
        j = und.join(
            _project_t(
                sd, {"jnode": "node", "score": "score", "deg": "deg"}, ntypes
            ).repartition(num_partitions),
            "inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("jnode",),
        )
        inc = (
            j.map_batches(contrib, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("c", alias_name="inc"))
        )
        inc = _project_t(inc, {"inode": "dst", "inc": "inc"}, ntypes).repartition(
            num_partitions
        )
        nxt = universe.join(
            inc, "left_outer", num_partitions=num_partitions,
            on=("node",), right_on=("inode",),
        )
        scores = nxt.map_batches(damp, batch_format="pyarrow").repartition(
            num_partitions
        ).materialize()
    return _project_t(scores, {"node": "node", "ppr_score": "score"}, ntypes)


def _broadcast_ppr(universe, und_rows, seed_arr, nt, n_iters: int):
    """Small-graph Personalized-PageRank path (see _broadcast_pagerank):
    vocab covers edge endpoints PLUS seeds (an edgeless seed still holds
    its restart base); everything else scores exactly 0, so the
    broadcast map fill_null is 0, not the base."""
    import numpy as np
    import ray

    base = (15 * PR_SCALE) // 100
    seed_list = seed_arr.to_pylist()
    s = np.asarray([r["src"] for r in und_rows])
    d = np.asarray([r["dst"] for r in und_rows])
    vocab, codes = np.unique(
        np.concatenate([s, d, np.asarray(seed_list)])
        if len(und_rows)
        else np.asarray(seed_list),
        return_inverse=True,
    )
    n = len(vocab)
    seed_mask = np.isin(vocab, np.asarray(seed_list))
    score = np.where(seed_mask, PR_SCALE, 0).astype(np.int64)
    if len(und_rows):
        sc, dc = codes[: len(s)], codes[len(s) : len(s) + len(d)]
        deg = np.bincount(sc, minlength=n)
        safe_deg = np.maximum(deg, 1)  # endpoints always have deg >= 1
        for _ in range(n_iters):
            inc = np.zeros(n, dtype=np.int64)
            np.add.at(inc, dc, score[sc] // safe_deg[sc])
            score = seed_mask * base + (85 * inc) // 100
    else:
        score = (seed_mask * base).astype(np.int64)
    payload = (pa.array(vocab.tolist(), type=nt), pa.array(score, type=pa.int64()))
    ref = ray.put(payload)

    def relabel(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "node": pa.array([], type=nt),
                    "ppr_score": pa.array([], type=pa.int64()),
                }
            )
        import pyarrow.compute as pc

        k, v = ray.get(ref)
        nodes = b.column("node")
        if isinstance(nodes, pa.ChunkedArray):
            nodes = nodes.combine_chunks()
        idx = pc.index_in(nodes, value_set=k)
        return pa.table(
            {
                "node": nodes,
                "ppr_score": pc.take(v, idx).fill_null(0),
            }
        )

    return universe.map_batches(relabel, batch_format="pyarrow")


WEDGE_CAP = 256  # per-node out-neighbor cap for wedge generation


def triangle_counts(
    edges,
    *,
    nodes,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    node_type: "pa.DataType | None" = None,
    wedge_cap: int = WEDGE_CAP,
    num_partitions: int = 8,
    driver_cap: int | None = None,
):
    """Per-node triangle participation over an ORIENTED simple edge list
    (``src < dst``, distinct — cooccurrence_pairs' output shape):
    Dataset(node, degree, n_triangles).

    Classic two-phase MapReduce triangle enumeration (Suri &
    Vassilvitskii, WWW'11 shape): wedge generation at the lowest-id apex
    (per-src sorted out-neighbor pairs — numpy, one group call per node),
    then ONE hash join of wedge (x, y) candidates against the edge list
    closes each wedge into a triangle.  Per-apex out-neighbors are capped
    at the ``wedge_cap`` LOWEST dst ids (quadratic guard for hub
    entities; the SQL oracle mirrors the cap with a QUALIFY row_number).

    Degree (full undirected, uncapped) and triangle attribution (each
    triangle counts for all 3 corners) are merged in a single tag-union
    groupby-sum over (node, d, t) rows — no joins on the node universe.

    Size-gated like ``pagerank``/``connected_components``: below
    ``driver_cap`` edges (gazetteer-bounded entity graphs), wedges are
    closed driver-side against a hash set and only the (node -> degree,
    triangles) map is broadcast.  ``driver_cap=0`` forces distributed.
    """
    import numpy as np

    nt = node_type if node_type is not None else pa.int64()
    ntypes = {"src": nt, "dst": nt, "node": nt, "a": nt, "x": nt, "y": nt}

    e = _project_t(edges, {"src": src_col, "dst": dst_col}, ntypes).materialize()
    cap = DRIVER_CAP if driver_cap is None else driver_cap
    if e.count() <= cap:
        return _broadcast_triangles(
            _project_t(nodes, {"node": node_col}, ntypes),
            e.take_all(),
            nt,
            wedge_cap,
        )

    def wedges(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], type=nt), "x": pa.array([], type=nt),
             "y": pa.array([], type=nt)}
        )
        if g.num_rows < 2:
            return empty
        nb = np.sort(np.asarray(g.column("dst").to_pylist()))[:wedge_cap]
        k = len(nb)
        iu, ju = np.triu_indices(k, 1)
        a = g.column("src")[0].as_py()
        return pa.table(
            {
                "a": pa.array(np.repeat(a, len(iu))).cast(nt),
                "x": pa.array(nb[iu]).cast(nt),
                "y": pa.array(nb[ju]).cast(nt),
            }
        )

    w = (
        e.groupby("src")
        .map_groups(wedges, batch_format="pyarrow")
        .repartition(num_partitions)
    )
    # close wedges: candidate (x, y) is a triangle iff it is an edge
    tri = w.join(
        e.repartition(num_partitions),
        "inner",
        num_partitions=num_partitions,
        on=("x", "y"),
        right_on=("src", "dst"),
    )

    def tri_nodes(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"node": pa.array([], type=nt),
                 "d": pa.array([], type=pa.int64()),
                 "t": pa.array([], type=pa.int64())}
            )
        n = pa.concat_arrays(
            [b.column(c).combine_chunks().cast(nt) for c in ("a", "x", "y")]
        )
        z = np.zeros(len(n), dtype=np.int64)
        return pa.table(
            {"node": n, "d": pa.array(z), "t": pa.array(z + 1)}
        )

    def deg_rows(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"node": pa.array([], type=nt),
                 "d": pa.array([], type=pa.int64()),
                 "t": pa.array([], type=pa.int64())}
            )
        n = pa.concat_arrays(
            [b.column(c).combine_chunks().cast(nt) for c in ("src", "dst")]
        )
        z = np.zeros(len(n), dtype=np.int64)
        return pa.table({"node": n, "d": pa.array(z + 1), "t": pa.array(z)})

    def universe_rows(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"node": pa.array([], type=nt),
                 "d": pa.array([], type=pa.int64()),
                 "t": pa.array([], type=pa.int64())}
            )
        z = np.zeros(b.num_rows, dtype=np.int64)
        return pa.table(
            {"node": b.column(node_col).combine_chunks().cast(nt),
             "d": pa.array(z), "t": pa.array(z)}
        )

    from ray.data.aggregate import Sum

    tagged = (
        tri.map_batches(tri_nodes, batch_format="pyarrow")
        .union(e.map_batches(deg_rows, batch_format="pyarrow"))
        .union(nodes.map_batches(universe_rows, batch_format="pyarrow"))
    )
    out = tagged.groupby("node").aggregate(
        Sum("d", alias_name="degree"), Sum("t", alias_name="n_triangles")
    )
    return _project_t(
        out,
        {"node": "node", "degree": "degree", "n_triangles": "n_triangles"},
        ntypes,
    )


def _broadcast_triangles(universe, edge_rows, nt, wedge_cap: int):
    """Small-graph triangle path: close wedges driver-side against an
    edge hash set (same wedge_cap semantics as the distributed path) and
    broadcast the bounded (endpoint -> (deg, tri)) map; nodes with no
    incident edge report (0, 0) without appearing in the map."""
    import ray

    adj: dict = {}
    es = set()
    deg: dict = {}
    for r in edge_rows:
        s, d = r["src"], r["dst"]
        es.add((s, d))
        adj.setdefault(s, []).append(d)
        deg[s] = deg.get(s, 0) + 1
        deg[d] = deg.get(d, 0) + 1
    tri: dict = {}
    for a, nbrs in adj.items():
        nb = sorted(nbrs)[:wedge_cap]
        for i in range(len(nb)):
            for j in range(i + 1, len(nb)):
                if (nb[i], nb[j]) in es:
                    for v in (a, nb[i], nb[j]):
                        tri[v] = tri.get(v, 0) + 1
    keys = sorted(deg)
    payload = (
        pa.array(keys, type=nt),
        pa.array([deg[n] for n in keys], type=pa.int64()),
        pa.array([tri.get(n, 0) for n in keys], type=pa.int64()),
    )
    ref = ray.put(payload)

    def relabel(b: pa.Table) -> pa.Table:
        # vectorized lookup: the universe is corpus-sized even when the
        # edge map is small — no per-row Python here
        if b.num_rows == 0:
            return pa.table(
                {
                    "node": pa.array([], type=nt),
                    "degree": pa.array([], type=pa.int64()),
                    "n_triangles": pa.array([], type=pa.int64()),
                }
            )
        import pyarrow.compute as pc

        k, dv, tv = ray.get(ref)
        nodes = b.column("node")
        if isinstance(nodes, pa.ChunkedArray):
            nodes = nodes.combine_chunks()
        idx = pc.index_in(nodes, value_set=k)
        return pa.table(
            {
                "node": nodes,
                "degree": pc.take(dv, idx).fill_null(0),
                "n_triangles": pc.take(tv, idx).fill_null(0),
            }
        )

    return universe.map_batches(relabel, batch_format="pyarrow")


def _broadcast_pagerank(universe, und_rows, nt, n_iters: int):
    """Small-graph PageRank path: the symmetrized edge list fits on the
    driver; run the power iteration over numpy code arrays and broadcast
    only the (edge-endpoint -> final score) map — nodes with no incident
    edge score the damping base without appearing in the map, so the map
    is bounded by the EDGE set (gazetteer-bounded for entity graphs), not
    the node universe."""
    import numpy as np
    import ray

    base = (15 * PR_SCALE) // 100
    score_map: dict = {}
    if und_rows:
        s = np.asarray([r["src"] for r in und_rows])
        d = np.asarray([r["dst"] for r in und_rows])
        vocab, codes = np.unique(np.concatenate([s, d]), return_inverse=True)
        sc, dc = codes[: len(s)], codes[len(s) :]
        n = len(vocab)
        deg = np.bincount(sc, minlength=n)
        score = np.full(n, PR_SCALE, dtype=np.int64)
        for _ in range(n_iters):
            inc = np.zeros(n, dtype=np.int64)
            np.add.at(inc, dc, score[sc] // deg[sc])
            score = base + (85 * inc) // 100
        payload = (pa.array(vocab, type=nt), pa.array(score, type=pa.int64()))
    else:
        payload = (pa.array([], type=nt), pa.array([], type=pa.int64()))
    ref = ray.put(payload)

    def relabel(b: pa.Table) -> pa.Table:
        # vectorized lookup over the corpus-sized universe (see
        # _broadcast_triangles.relabel)
        if b.num_rows == 0:
            return pa.table(
                {
                    "node": pa.array([], type=nt),
                    "pr_score": pa.array([], type=pa.int64()),
                }
            )
        import pyarrow.compute as pc

        k, v = ray.get(ref)
        nodes = b.column("node")
        if isinstance(nodes, pa.ChunkedArray):
            nodes = nodes.combine_chunks()
        idx = pc.index_in(nodes, value_set=k)
        return pa.table(
            {
                "node": nodes,
                "pr_score": pc.take(v, idx).fill_null(base),
            }
        )

    return universe.map_batches(relabel, batch_format="pyarrow")


DRIVER_CAP = 200_000  # edges; below this the pair graph union-finds driver-side


def _broadcast_cc(labels, edge_rows) -> "object":
    """Small-graph path: union-find the collected edge list driver-side and
    broadcast the (non-singleton) component map; one map_batches relabels
    the node universe.  Same size-gated pattern as stages/antijoin.py —
    the VERIFIED pair graph is usually far smaller than the corpus, but is
    corpus-proportional in the worst case, hence the cap."""
    import ray

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for r in edge_rows:
        ra, rb = find(r["src"]), find(r["dst"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    keys = sorted(parent)
    payload = (
        pa.array(keys, type=pa.int64()),
        pa.array([find(x) for x in keys], type=pa.int64()),
    )
    ref = ray.put(payload)

    def relabel(b: pa.Table) -> pa.Table:
        # vectorized: the relabel pass covers the WHOLE node universe even
        # when the dup map is small — index_in/take, no per-row Python
        if b.num_rows == 0:
            return pa.table(
                {
                    "node": pa.array([], type=pa.int64()),
                    "component": pa.array([], type=pa.int64()),
                }
            )
        import pyarrow.compute as pc

        k, v = ray.get(ref)
        nodes = b.column("node")
        if isinstance(nodes, pa.ChunkedArray):
            nodes = nodes.combine_chunks()
        nodes = nodes.cast(pa.int64())
        idx = pc.index_in(nodes, value_set=k)
        comp = pc.if_else(pc.is_valid(idx), pc.take(v, idx), nodes)
        return pa.table({"node": nodes, "component": comp})

    return labels.map_batches(relabel, batch_format="pyarrow")


def connected_components(
    edges,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    nodes=None,
    node_col: str = "node",
    num_partitions: int = 8,
    max_rounds: int = 25,
    driver_cap: int = DRIVER_CAP,
):
    """Edge Dataset -> Dataset(node, component) where ``component`` is the
    minimum node id reachable from ``node`` (undirected reachability).

    ``nodes`` optionally supplies the full node universe so isolated nodes
    (no incident edge) appear as their own singleton components; when
    given it must be DISTINCT and cover every edge endpoint (both true for
    a document table keyed by id).

    Two execution shapes, size-gated like ``antijoin.anti_join``: when the
    edge list is measurably small (< ``driver_cap``) it is union-found
    driver-side and the component map broadcast (one relabel pass, no join
    rounds); above the cap, the distributed min-label propagation with
    pointer jumping runs (module docstring).  Set ``driver_cap=0`` to
    force the distributed path.
    """
    from ray.data.aggregate import Min

    raw = _project(edges, {"src": src_col, "dst": dst_col}).materialize()
    n_edges = raw.count()

    if n_edges <= driver_cap:
        # broadcast path needs neither symmetrization nor a distinct pass:
        # union-find reads the raw pairs, and the node universe (caller-
        # supplied, or the distinct endpoints) is relabelled lazily.
        if nodes is not None:
            universe = _project(nodes, {"node": node_col})
        else:
            universe = _project(
                _project(raw, {"node": "src"})
                .union(_project(raw, {"node": "dst"}))
                .groupby("node")
                .aggregate(Min("node", alias_name="label")),
                {"node": "node"},
            )
        return _broadcast_cc(universe, raw.take_all() if n_edges else [])

    fwd = _project(raw, {"src": "src", "dst": "dst"})
    rev = _project(raw, {"src": "dst", "dst": "src"})
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

    prev_sum = labels.sum("label")
    for _ in range(max_rounds):
        # ONE tag-union join per round covers both message kinds: edge rows
        # (key=src -> emit to dst) and pointer-jump rows (key=label(n) ->
        # emit to n) share the join against labels on the key column.
        e_tag = _project(und, {"k": "src", "out": "dst"})
        p_tag = _project(labels, {"k": "label", "out": "node"})
        joined = e_tag.union(p_tag).join(
            labels, "inner", num_partitions=num_partitions,
            on=("k",), right_on=("node",),
        )
        msgs = _project(joined, {"node": "out", "cand": "label"})
        m_self = _project(labels, {"node": "node", "cand": "label"})
        labels = _project(
            msgs.union(m_self)
            .groupby("node")
            .aggregate(Min("cand", alias_name="label")),
            {"node": "node", "label": "label"},
        ).repartition(num_partitions).materialize()  # see seed comment
        cur = labels.sum("label")
        if cur == prev_sum:
            break
        prev_sum = cur
    return _project(labels, {"node": "node", "component": "label"})


def _df_batch(batch: pa.Table, doc_col: str = "doc_id") -> pa.Table:
    """Mentions batch -> per-batch partial entity document frequency
    (eid, pdf).  Distinct (doc, eid) is batch-local by doc contiguity
    (same invariant as ``_cooc_batch``), so the partial sums to the exact
    global distinct-doc count."""
    import numpy as np
    import pyarrow.compute as pc

    from .canonicalize import entity_id

    if batch.num_rows == 0:
        return pa.table(
            {
                "eid": pa.array([], type=pa.string()),
                "pdf": pa.array([], type=pa.int64()),
            }
        )
    sn = batch.column("surface_norm")
    if isinstance(sn, pa.ChunkedArray):
        sn = sn.combine_chunks()
    lb = batch.column("label")
    if isinstance(lb, pa.ChunkedArray):
        lb = lb.combine_chunks()
    key = pc.binary_join_element_wise(
        sn.cast(pa.large_string()),
        lb.cast(pa.large_string()),
        pa.scalar("\x00", type=pa.large_string()),
    )
    enc = pc.dictionary_encode(key)
    codes = enc.indices.to_numpy(zero_copy_only=False)
    eid_vocab = np.array(
        [entity_id(*k.rsplit("\x00", 1)) for k in enc.dictionary.to_pylist()]
    )
    docs = np.asarray(batch.column(doc_col).to_pylist())
    de = np.unique(np.stack([docs, eid_vocab[codes]], axis=1), axis=0)
    uniq, counts = np.unique(de[:, 1], return_counts=True)
    return pa.table(
        {"eid": pa.array(uniq), "pdf": pa.array(counts, type=pa.int64())}
    )


def entity_doc_freq(mentions, *, doc_col: str = "doc_id", annotated: bool = False):
    """Mention Dataset -> Dataset(eid, df): distinct-document frequency per
    entity.  Batch-local distinct then ONE groupby-sum on the eid key.
    ``annotated=True`` fuses the mention explode into the batch fn (same
    doc-locality guarantee as ``cooccurrence_pairs``)."""
    from ray.data.aggregate import Sum

    if annotated:
        from .canonicalize import explode_mentions

        def gen(b: pa.Table) -> pa.Table:
            return _df_batch(explode_mentions(b, subj_col=doc_col), doc_col)

    else:

        def gen(b: pa.Table) -> pa.Table:
            return _df_batch(b, doc_col)

    partial = mentions.map_batches(gen, batch_format="pyarrow")
    return partial.groupby("eid").aggregate(Sum("pdf", alias_name="df"))


def _broadcast_kcore(edge_rows, nt, k: int, rounds: int):
    """Small-graph k-core peel: numpy rounds over code arrays driver-side;
    returns the surviving (node, core_deg) rows as a materialized list."""
    import numpy as np

    if not edge_rows:
        return []
    s = np.asarray([r["src"] for r in edge_rows])
    d = np.asarray([r["dst"] for r in edge_rows])
    vocab, codes = np.unique(np.concatenate([s, d]), return_inverse=True)
    sc, dc = codes[: len(s)], codes[len(s) :]
    n = len(vocab)
    alive = np.ones(n, dtype=bool)
    deg = np.zeros(n, dtype=np.int64)
    for _ in range(rounds):
        deg[:] = 0
        mask = alive[sc] & alive[dc]
        np.add.at(deg, sc[mask], 1)
        new_alive = deg >= k
        if (new_alive == alive).all():
            break
        alive = new_alive
    deg[:] = 0
    mask = alive[sc] & alive[dc]
    np.add.at(deg, sc[mask], 1)
    # mirror the distributed/SQL shape: the final degree table only has
    # rows for nodes with >= 1 surviving edge
    keep = np.flatnonzero(alive & (deg >= 1))
    return [
        {"node": vocab[i].item() if hasattr(vocab[i], "item") else vocab[i],
         "core_deg": int(deg[i])}
        for i in keep
    ]


def kcore(
    edges,
    *,
    k: int = 2,
    rounds: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
    node_type: "pa.DataType | None" = None,
    num_partitions: int = 8,
    driver_cap: int | None = None,
):
    """R-round k-core peel over an undirected simple graph:
    Dataset(node, core_deg) of nodes surviving ``rounds`` peel rounds
    (each round removes nodes whose degree within the surviving subgraph
    is < k), with their final within-core degree.  Equals the exact
    k-core whenever peeling converges within ``rounds`` (the loop
    early-stops on a fixed point, so extra rounds are free); the SQL
    oracle unrolls the SAME fixed round count, keeping the two engines
    value-identical even pre-convergence.

    Distributed round: two hash semi-joins restrict the symmetrized edge
    list to alive endpoints, one groupby-count re-derives degrees, one
    filter peels — only the (node,) frontier materializes per round.
    Size-gated driver path as in ``pagerank``/``triangle_counts``.
    """
    from ray.data.aggregate import Count

    import ray.data as rd

    nt = node_type if node_type is not None else pa.int64()
    ntypes = {"src": nt, "dst": nt, "node": nt}
    cap = DRIVER_CAP if driver_cap is None else driver_cap

    fwd = _project_t(edges, {"src": src_col, "dst": dst_col}, ntypes)
    rev = _project_t(edges, {"src": dst_col, "dst": src_col}, ntypes)
    und = fwd.union(rev).repartition(num_partitions).materialize()

    if und.count() <= 2 * cap:
        # und holds both directions; _broadcast_kcore degrees count s-side
        # occurrences, i.e. full undirected degree
        rows = _broadcast_kcore(und.take_all(), nt, k, rounds)
        if not rows:
            return rd.from_arrow(
                pa.table(
                    {"node": pa.array([], type=nt),
                     "core_deg": pa.array([], type=pa.int64())}
                )
            )
        return rd.from_items(rows)

    alive = _project_t(
        und.groupby("src").aggregate(Count(alias_name="_c")),
        {"node": "src"},
        ntypes,
    ).repartition(num_partitions).materialize()
    prev_n = alive.count()

    def degrees(live):
        e1 = und.join(
            live, "inner", num_partitions=num_partitions,
            on=("src",), right_on=("node",),
        )
        e1 = _project_t(e1, {"src": "src", "dst": "dst"}, ntypes).repartition(
            num_partitions
        )
        e2 = e1.join(
            _project_t(live, {"dnode": "node"}, {"dnode": nt}).repartition(
                num_partitions
            ),
            "inner",
            num_partitions=num_partitions,
            on=("dst",),
            right_on=("dnode",),
        )
        return _project_t(e2, {"src": "src", "dst": "dst"}, ntypes).groupby(
            "src"
        ).aggregate(Count(alias_name="deg"))

    def keep_ge_k(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"node": pa.array([], type=nt)})
        import pyarrow.compute as pc

        m = pc.greater_equal(b.column("deg"), pa.scalar(k))
        return pa.table({"node": b.column("src").filter(m)})

    import ray.data as _rd

    empty_out = _rd.from_arrow(
        pa.table(
            {"node": pa.array([], type=nt), "core_deg": pa.array([], type=pa.int64())}
        )
    )
    for _ in range(rounds):
        deg = degrees(alive)
        alive = (
            deg.map_batches(keep_ge_k, batch_format="pyarrow")
            .repartition(num_partitions)
            .materialize()
        )
        cur = alive.count()
        if cur == 0:
            # everything peeled: joins over an all-empty frontier would
            # see schema-less blocks (zero-row blocks skip map_batches)
            return empty_out
        if cur == prev_n:
            break
        prev_n = cur
    # output = final within-core degree table over the surviving set
    # (nodes with zero alive-alive edges drop out, mirroring the oracle)
    return _project_t(degrees(alive), {"node": "src", "core_deg": "deg"}, ntypes)


def neighborhood_jaccard(
    edges,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    node_type: "pa.DataType | None" = None,
    nb_cap: int = WEDGE_CAP,
    min_common: int = 2,
):
    """Link prediction by neighborhood overlap: for node pairs sharing >=
    ``min_common`` neighbors in the undirected graph, the exact-rational
    Jaccard of their (capped) neighbor sets as integer numerator /
    denominator — Dataset(entity_a, entity_b, n_common, n_union) with
    ``jaccard = n_common / n_union`` (no float emitted, so the oracle
    hash-matches).

    Shape: wedge enumeration at every apex over the BOTH-direction
    adjacency (one groupby on the node key; per-apex out-neighbors capped
    at the ``nb_cap`` lowest ids — quadratic hub guard, mirrored in the
    SQL oracle's QUALIFY) -> ONE pair-count groupby = common-neighbor
    counts.  Capped degrees are a node-bounded table (the entity universe
    is gazetteer-bounded) collected once and broadcast into the final
    vectorized attach; for open-vocabulary graphs swap the attach for two
    hash joins on the pair endpoints.
    """
    import numpy as np
    import ray
    from ray.data.aggregate import Count

    nt = node_type if node_type is not None else pa.int64()
    types = {"src": nt, "dst": nt, "a": nt, "b": nt, "x": nt, "y": nt}
    e = _project_t(edges, {"src": src_col, "dst": dst_col}, types).materialize()
    adj = _project_t(e, {"a": "src", "b": "dst"}, types).union(
        _project_t(e, {"a": "dst", "b": "src"}, types)
    )

    def nb_pairs(g: pa.Table) -> pa.Table:
        empty = pa.table({"x": pa.array([], type=nt), "y": pa.array([], type=nt)})
        if g.num_rows < 2:
            return empty
        nb = np.sort(np.asarray(g.column("b").to_pylist()))[:nb_cap]
        iu, ju = np.triu_indices(len(nb), 1)
        return pa.table(
            {"x": pa.array(nb[iu]).cast(nt), "y": pa.array(nb[ju]).cast(nt)}
        )

    inter = (
        adj.groupby("a")
        .map_groups(nb_pairs, batch_format="pyarrow")
        .groupby(["x", "y"])
        .aggregate(Count(alias_name="n_common"))
    )

    # capped degree per node: min(true neighbor count, nb_cap) — bounded by
    # the node universe, collected once and broadcast
    from .collect import collect_blocks

    degs = adj.groupby("a").aggregate(Count(alias_name="d"))
    dtab = collect_blocks(
        degs,
        "a",
        pa.table({"a": pa.array([], type=nt), "d": pa.array([], type=pa.int64())}),
    )
    if dtab.num_rows == 0:
        return pa.table(
            {
                "entity_a": pa.array([], type=nt),
                "entity_b": pa.array([], type=nt),
                "n_common": pa.array([], type=pa.int64()),
                "n_union": pa.array([], type=pa.int64()),
            }
        )
    dkeys = dtab.column("a").combine_chunks()
    import pyarrow.compute as pc

    dvals = pc.min_element_wise(
        dtab.column("d").combine_chunks(), pa.scalar(nb_cap, type=pa.int64())
    )
    ref = ray.put((dkeys, dvals))

    class AttachDeg:
        def __init__(self, ref):
            self.dkeys, self.dvals = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            keep = pc.greater_equal(
                b.column("n_common").combine_chunks(),
                pa.scalar(min_common, type=pa.int64()),
            )
            b = b.filter(keep)
            dx = self.dvals.take(
                pc.index_in(b.column("x").combine_chunks(), value_set=self.dkeys)
            )
            dy = self.dvals.take(
                pc.index_in(b.column("y").combine_chunks(), value_set=self.dkeys)
            )
            c = b.column("n_common").combine_chunks()
            union = pc.subtract(pc.add(dx, dy), c)
            return pa.table(
                {
                    "entity_a": b.column("x"),
                    "entity_b": b.column("y"),
                    "n_common": c,
                    "n_union": union.cast(pa.int64()),
                }
            )

    from .taskstate import task_stage

    return inter.map_batches(task_stage(AttachDeg, ref=ref), batch_format="pyarrow")


RA_SCALE = 10**9  # fixed-point unit for Resource-Allocation scores


def resource_allocation(
    edges,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    node_type: "pa.DataType | None" = None,
    nb_cap: int = WEDGE_CAP,
    min_common: int = 2,
):
    """Resource-Allocation link prediction index (Zhou, Lü & Zhang, EPJ B
    2009): score(x, y) = Σ over common neighbors z of 1/deg(z) — like
    Adamic-Adar but with a 1/d kernel, which makes it EXACT in fixed
    point: each apex contributes ``RA_SCALE // capped_deg`` (integer floor
    division), so the score is an order-independent integer sum that
    hash-matches the SQL oracle bit-for-bit.  Dataset(entity_a, entity_b,
    n_common, ra_score) for pairs sharing >= ``min_common`` neighbors.

    Shape: wedge enumeration at every apex over the both-direction
    adjacency (per-apex neighbors capped at the ``nb_cap`` lowest ids —
    quadratic hub guard, QUALIFY-mirrored in the oracle), weighting each
    emitted pair by the apex's own term, then ONE pair-key groupby-sum.
    Unlike ``neighborhood_jaccard`` there is no degree-attach phase: the
    apex's contribution is computed where its adjacency already lives,
    so the operator is two shuffles total (apex groupby + pair groupby)
    at any graph size."""
    import numpy as np
    from ray.data.aggregate import Count, Sum

    nt = node_type if node_type is not None else pa.int64()
    types = {"src": nt, "dst": nt, "a": nt, "b": nt, "x": nt, "y": nt}
    e = _project_t(edges, {"src": src_col, "dst": dst_col}, types).materialize()
    adj = _project_t(e, {"a": "src", "b": "dst"}, types).union(
        _project_t(e, {"a": "dst", "b": "src"}, types)
    )

    def nb_pairs(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "x": pa.array([], type=nt),
                "y": pa.array([], type=nt),
                "w": pa.array([], type=pa.int64()),
            }
        )
        if g.num_rows < 2:
            return empty
        nb = np.sort(np.asarray(g.column("b").to_pylist()))[:nb_cap]
        k = len(nb)
        iu, ju = np.triu_indices(k, 1)
        w = np.full(len(iu), RA_SCALE // k, dtype=np.int64)
        return pa.table(
            {
                "x": pa.array(nb[iu]).cast(nt),
                "y": pa.array(nb[ju]).cast(nt),
                "w": pa.array(w),
            }
        )

    pairs = adj.groupby("a").map_groups(nb_pairs, batch_format="pyarrow")
    scored = pairs.groupby(["x", "y"]).aggregate(
        Count(alias_name="n_common"), Sum("w", alias_name="ra_score")
    )

    def finish(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "entity_a": pa.array([], type=nt),
                "entity_b": pa.array([], type=nt),
                "n_common": pa.array([], type=pa.int64()),
                "ra_score": pa.array([], type=pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        import pyarrow.compute as pc

        keep = pc.greater_equal(
            b.column("n_common").combine_chunks(),
            pa.scalar(min_common, type=pa.int64()),
        )
        b = b.filter(keep)
        return pa.table(
            {
                "entity_a": b.column("x"),
                "entity_b": b.column("y"),
                "n_common": b.column("n_common").combine_chunks().cast(pa.int64()),
                "ra_score": b.column("ra_score").combine_chunks().cast(pa.int64()),
            }
        )

    return scored.map_batches(finish, batch_format="pyarrow")


def _broadcast_bfs(und_rows, seeds, k: int):
    """Small-graph BFS driver-side: numpy frontier sweeps over code arrays;
    returns materialized (node, dist) rows for nodes within ``k`` hops."""
    import numpy as np

    if not und_rows:
        return [{"node": s, "dist": 0} for s in sorted(set(seeds))]
    s = np.asarray([r["src"] for r in und_rows])
    d = np.asarray([r["dst"] for r in und_rows])
    vocab, codes = np.unique(np.concatenate([s, d]), return_inverse=True)
    sc, dc = codes[: len(s)], codes[len(s) :]
    n = len(vocab)
    dist = np.full(n, -1, dtype=np.int64)
    # seeds outside the edge universe are emitted at dist 0 but expand no
    # edges (they have none)
    seed_arr = np.asarray(sorted(set(seeds)))
    pos = np.searchsorted(vocab, seed_arr)
    in_graph = (pos < n) & (vocab[np.minimum(pos, n - 1)] == seed_arr)
    frontier = np.unique(pos[in_graph])
    dist[frontier] = 0
    for lvl in range(1, k + 1):
        if not len(frontier):
            break
        hit = np.isin(sc, frontier)
        nxt = np.unique(dc[hit])
        nxt = nxt[dist[nxt] < 0]
        if not len(nxt):
            break
        dist[nxt] = lvl
        frontier = nxt
    out = [
        {"node": vocab[i].item() if hasattr(vocab[i], "item") else vocab[i],
         "dist": int(dist[i])}
        for i in np.flatnonzero(dist >= 0)
    ]
    missing = set(seeds) - {r["node"] for r in out}
    out.extend({"node": m, "dist": 0} for m in sorted(missing))
    return out


def bfs_distances(
    edges,
    *,
    k: int = 4,
    seeds=None,
    src_col: str = "src",
    dst_col: str = "dst",
    node_type: "pa.DataType | None" = None,
    num_partitions: int = 8,
    driver_cap: int | None = None,
):
    """k-hop BFS over an undirected simple graph: Dataset(node, dist) with
    the minimum hop distance (<= ``k``) from a seed set.

    ``seeds``: a Dataset with a ``node`` column, or None -> the single
    globally smallest src node of the symmetrized edge list (deterministic,
    SQL-expressible seed for the oracle).

    Distributed round (the frontier never leaves the cluster): one
    hash-partitioned semi-join restricts edges to frontier sources, a
    groupby-distinct projects candidate neighbors, one anti-join drops
    already-visited nodes; only the (node, dist) visited set and the
    (node,) frontier materialize per round — both bounded by the reachable
    set, never the edge list. Size-gated driver path as in ``pagerank`` /
    ``kcore`` (DRIVER_CAP edges).

    BFS frontier expansion is the standard iterative-join formulation of
    reachability (semi-naive Datalog evaluation); the SQL oracle unrolls
    the SAME k rounds so both engines agree at any k, converged or not.
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Min

    from .antijoin import anti_join

    nt = node_type if node_type is not None else pa.int64()
    ntypes = {"src": nt, "dst": nt, "node": nt}
    cap = DRIVER_CAP if driver_cap is None else driver_cap

    fwd = _project_t(edges, {"src": src_col, "dst": dst_col}, ntypes)
    rev = _project_t(edges, {"src": dst_col, "dst": src_col}, ntypes)
    und = fwd.union(rev).repartition(num_partitions).materialize()

    if seeds is None:
        m = und.aggregate(Min("src"))
        seed_vals = [m["min(src)"]] if m and m.get("min(src)") is not None else []
        seeds_ds = rd.from_arrow(pa.table({"node": pa.array(seed_vals, type=nt)}))
    else:
        seeds_ds = _project_t(seeds, {"node": "node"}, ntypes)

    if und.count() <= 2 * cap:
        seed_vals = [r["node"] for r in seeds_ds.take_all()]
        rows = _broadcast_bfs(und.take_all(), seed_vals, k)
        if not rows:
            return rd.from_arrow(
                pa.table(
                    {"node": pa.array([], type=nt),
                     "dist": pa.array([], type=pa.int64())}
                )
            )
        return rd.from_items(rows)

    def with_dist(ds, lvl: int):
        def f(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table(
                    {"node": pa.array([], type=nt),
                     "dist": pa.array([], type=pa.int64())}
                )
            return pa.table(
                {"node": b.column("node"),
                 "dist": pa.array([lvl] * b.num_rows, type=pa.int64())}
            )

        return ds.map_batches(f, batch_format="pyarrow")

    frontier = seeds_ds.repartition(num_partitions).materialize()
    visited = with_dist(frontier, 0).repartition(num_partitions).materialize()
    for lvl in range(1, k + 1):
        hits = und.join(
            frontier,
            "inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("node",),
        )
        cand = _project_t(hits, {"node": "dst"}, ntypes).groupby("node").aggregate(
            Count(alias_name="_c")
        )
        cand = _project_t(cand, {"node": "node"}, ntypes)
        new = anti_join(
            cand, "node", visited, "node", num_partitions=num_partitions
        )
        new = (
            _project_t(new, {"node": "node"}, ntypes)
            .repartition(num_partitions)
            .materialize()
        )
        if new.count() == 0:
            break
        visited = (
            visited.union(with_dist(new, lvl))
            .repartition(num_partitions)
            .materialize()
        )
        frontier = new
    return visited


def _broadcast_walks(und_rows, universe, walk_len: int):
    """Small-graph walk path, driver-side: adjacency dict + per-step
    h64-argmin choice. Returns (start, step, node) rows."""
    from .dedup_approx import h64

    adj: dict = {}
    for r in und_rows:
        adj.setdefault(r["src"], []).append(r["dst"])
    rows = []
    for start in sorted(set(universe)):
        cur = start
        rows.append({"start": start, "step": 0, "node": cur})
        for lvl in range(1, walk_len + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            cur = min(nbrs, key=lambda v, c=cur, s=lvl: (h64(f"{c}|{s}|{v}"), v))
            rows.append({"start": start, "step": lvl, "node": cur})
    return rows


def random_walks(
    edges,
    *,
    nodes=None,
    walk_len: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    node_type: "pa.DataType | None" = None,
    num_partitions: int = 8,
    driver_cap: int | None = None,
):
    """Deterministic hash-seeded random walks over an undirected simple
    graph — the DeepWalk/node2vec training-corpus generator (Perozzi et
    al., KDD'14), reproducible at any parallelism.

    One walk per start node; the transition from ``cur`` at step ``s`` is
    ``argmin over neighbors v of h64(f"{cur}|{s}|{v}")`` (ties by v) — a
    pseudo-uniform choice that is a pure function of the graph, so re-runs
    and the SQL oracle (md5_number_upper) agree bit-for-bit. Dead-end
    nodes end their walk early. Output: Dataset(start, step, node) with
    step 0..walk_len.

    Distributed shape: per step, ONE hash-partitioned join restricts the
    edge list to frontier sources, a per-batch h64 ranking feeds the
    k-bounded grouped top-1 combiner (the per-node choice is frontier-
    bounded, never edge-list-bounded), and one join advances the (start,
    cur) frontier. Only the frontier and the choice table materialize per
    step. Size-gated driver path below DRIVER_CAP edges, as in
    ``pagerank`` / ``bfs_distances``.
    """
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import Count

    from .dedup_approx import h64
    from .topk import grouped_topk

    nt = node_type if node_type is not None else pa.int64()
    ntypes = {"src": nt, "dst": nt, "node": nt}
    cap = DRIVER_CAP if driver_cap is None else driver_cap

    fwd = _project_t(edges, {"src": src_col, "dst": dst_col}, ntypes)
    rev = _project_t(edges, {"src": dst_col, "dst": src_col}, ntypes)
    und = fwd.union(rev).repartition(num_partitions).materialize()

    if nodes is None:
        uni = _project_t(
            und.groupby("src").aggregate(Count(alias_name="_c")),
            {"node": "src"},
            ntypes,
        )
    else:
        uni = _project_t(nodes, {"node": "node"}, ntypes)

    empty = pa.table(
        {
            "start": pa.array([], type=nt),
            "step": pa.array([], type=pa.int64()),
            "node": pa.array([], type=nt),
        }
    )

    if und.count() <= 2 * cap:
        universe = [r["node"] for r in uni.take_all()]
        rows = _broadcast_walks(und.take_all(), universe, walk_len)
        if not rows:
            return rd.from_arrow(empty)
        return rd.from_items(rows)

    def start_frontier(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"start": pa.array([], type=nt), "cur": pa.array([], type=nt)})
        return pa.table({"start": b.column("node"), "cur": b.column("node")})

    def with_step(fr, lvl: int):
        def f(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return empty
            return pa.table(
                {
                    "start": b.column("start"),
                    "step": pa.array([lvl] * b.num_rows, type=pa.int64()),
                    "node": b.column("cur"),
                }
            )

        return fr.map_batches(f, batch_format="pyarrow")

    frontier = (
        uni.map_batches(start_frontier, batch_format="pyarrow")
        .repartition(num_partitions)
        .materialize()
    )
    out = with_step(frontier, 0)
    for lvl in range(1, walk_len + 1):
        curs = _project_t(
            frontier.groupby("cur").aggregate(Count(alias_name="_c")),
            {"node": "cur"},
            ntypes,
        )
        inc = und.join(
            curs,
            "inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("node",),
        )

        def add_h(b: pa.Table, _lvl=lvl) -> pa.Table:
            if b.num_rows == 0:
                return pa.table(
                    {
                        "src": pa.array([], type=nt),
                        "dst": pa.array([], type=nt),
                        "h": pa.array([], type=pa.uint64()),
                    }
                )
            s = b.column("src").to_pylist()
            d = b.column("dst").to_pylist()
            h = np.fromiter(
                (h64(f"{a}|{_lvl}|{c}") for a, c in zip(s, d)),
                dtype=np.uint64,
                count=len(s),
            )
            return pa.table(
                {"src": b.column("src"), "dst": b.column("dst"), "h": pa.array(h)}
            )

        inc_h = inc.map_batches(add_h, batch_format="pyarrow")
        choice = _project_t(
            grouped_topk(inc_h, "src", ["h", "dst"], 1),
            {"cur_from": "src", "nxt": "dst"},
            {"cur_from": nt, "nxt": nt},
        )
        nf = frontier.join(
            choice,
            "inner",
            num_partitions=num_partitions,
            on=("cur",),
            right_on=("cur_from",),
        )
        frontier = _project_t(
            nf, {"start": "start", "cur": "nxt"}, {"start": nt, "cur": nt}
        ).materialize()
        out = out.union(with_step(frontier, lvl))
    return out


def _broadcast_lpa(und_rows, universe, n_rounds: int):
    """Small-graph synchronous label propagation, driver-side."""
    adj: dict = {}
    for r in und_rows:
        adj.setdefault(r["src"], []).append(r["dst"])
    lab = {v: v for v in universe}
    for v in adj:
        lab.setdefault(v, v)
    for _ in range(n_rounds):
        new = dict(lab)
        for v, nbrs in adj.items():
            counts: dict = {}
            for u in nbrs:
                counts[lab[u]] = counts.get(lab[u], 0) + 1
            new[v] = min(counts, key=lambda x: (-counts[x], x))
        lab = new
    return [{"node": v, "community": lab[v]} for v in sorted(universe)]


def label_propagation(
    edges,
    *,
    nodes=None,
    n_rounds: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    node_type: "pa.DataType | None" = None,
    num_partitions: int = 8,
    driver_cap: int | None = None,
):
    """Community detection by synchronous label propagation (Raghavan et
    al. 2007), made deterministic: every node starts labeled with itself;
    each round it adopts the most frequent label among its neighbors,
    ties broken by the smallest label; isolated nodes keep their own.
    Unlike ``connected_components`` (min-label = whole component), the
    frequency vote finds densely-knit subgroups inside a component.
    Output: Dataset(node, community) after ``n_rounds``.

    Distributed round: ONE hash-partitioned join ships labels to
    neighbors, a (node, label)-key groupby counts votes (bounded by
    distinct labels per neighborhood, not edges), the k-bounded grouped
    top-1 picks the winner, and an anti-join keeps prior labels for
    voteless nodes. Only the (node, label) frontier materializes per
    round. Size-gated driver path below DRIVER_CAP edges, as in
    ``pagerank`` / ``bfs_distances``; the SQL oracle unrolls the SAME
    rounds, so both engines agree at any round count, converged or not.
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from .antijoin import anti_join
    from .topk import grouped_topk

    nt = node_type if node_type is not None else pa.int64()
    ntypes = {"src": nt, "dst": nt, "node": nt}
    cap = DRIVER_CAP if driver_cap is None else driver_cap

    fwd = _project_t(edges, {"src": src_col, "dst": dst_col}, ntypes)
    rev = _project_t(edges, {"src": dst_col, "dst": src_col}, ntypes)
    und = fwd.union(rev).repartition(num_partitions).materialize()

    if nodes is None:
        uni = _project_t(
            und.groupby("src").aggregate(Count(alias_name="_c")),
            {"node": "src"},
            ntypes,
        )
    else:
        uni = _project_t(nodes, {"node": "node"}, ntypes)

    if und.count() <= 2 * cap:
        universe = [r["node"] for r in uni.take_all()]
        rows = _broadcast_lpa(und.take_all(), universe, n_rounds)
        if not rows:
            return rd.from_arrow(
                pa.table(
                    {"node": pa.array([], type=nt),
                     "community": pa.array([], type=nt)}
                )
            )
        return rd.from_items(rows)

    lt = {"node": nt, "lab": nt}

    def self_label(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"node": pa.array([], type=nt), "lab": pa.array([], type=nt)})
        return pa.table({"node": b.column("node"), "lab": b.column("node")})

    labels = (
        uni.map_batches(self_label, batch_format="pyarrow")
        .repartition(num_partitions)
        .materialize()
    )
    for _ in range(n_rounds):
        # ship labels along edges: (dst gets src's label)
        votes = und.join(
            labels,
            "inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("node",),
        )
        votes = _project_t(votes, {"node": "dst", "lab": "lab"}, lt)
        counted = votes.groupby(["node", "lab"]).aggregate(Count(alias_name="cnt"))
        winner = _project_t(
            grouped_topk(counted, "node", ["cnt", "lab"], 1, descending=[True, False]),
            {"node": "node", "lab": "lab"},
            lt,
        )
        keep = anti_join(labels, "node", winner, "node")
        labels = winner.union(_project_t(keep, {"node": "node", "lab": "lab"}, lt))
        labels = labels.repartition(num_partitions).materialize()
    return _project_t(labels, {"node": "node", "community": "lab"}, {"node": nt, "community": nt})


def fastrp_embeddings(
    edges,
    *,
    dims: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    node_type: "pa.DataType | None" = None,
    num_partitions: int = 8,
):
    """FastRP-style node embeddings (Chen et al. 2019), made exact and
    deterministic: each node's random vector is the hash-derived sparse
    projection ``r(u)[k] = (h64(f"{u}|{k}") % 3) - 1`` (the Achlioptas
    ±1/0 construction), and the embedding is the pair of propagation
    moments ``h1(v) = Σ_{u∈N(v)} r(u)`` and ``h2(v) = Σ_{u∈N(v)} h1(u)``
    (A·R and A²·R) in plain int64 — no floats, so the SQL oracle matches
    bit-for-bit and results are identical at any parallelism.

    Shape: hop 1 is a per-batch combiner over the edge list (random
    vectors computed once per DISTINCT neighbor per batch via dictionary
    encode, then a within-batch segment sum) + one groupby-sum; hop 2 is
    ONE hash join shipping h1 along edges + the same combiner. Output:
    Dataset(node, h1_0..h1_{d-1}, h2_0..h2_{d-1}), one row per node with
    at least one edge.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    from .dedup_approx import h64

    nt = node_type if node_type is not None else pa.int64()
    ntypes = {"src": nt, "dst": nt, "node": nt}

    fwd = _project_t(edges, {"src": src_col, "dst": dst_col}, ntypes)
    rev = _project_t(edges, {"src": dst_col, "dst": src_col}, ntypes)
    # two consumers (hop-1 combiner + hop-2 join): materialize ONCE or the
    # whole upstream (detection + co-occurrence) re-executes per consumer
    und = fwd.union(rev).materialize()

    h1_cols = [f"h1_{k}" for k in range(dims)]
    h2_cols = [f"h2_{k}" for k in range(dims)]

    def _segsum(keys: pa.Array, mat: "np.ndarray", out_cols: list[str]) -> pa.Table:
        """Within-batch combiner: sum mat rows per distinct key."""
        enc = pc.dictionary_encode(keys)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        nk = len(enc.dictionary)
        sums = np.zeros((nk, mat.shape[1]), dtype=np.int64)
        np.add.at(sums, codes, mat)
        cols = {"node": enc.dictionary}
        for j, c in enumerate(out_cols):
            cols[c] = pa.array(sums[:, j])
        return pa.table(cols)

    def _empty(cols: list[str]) -> pa.Table:
        d = {"node": pa.array([], type=nt)}
        for c in cols:
            d[c] = pa.array([], type=pa.int64())
        return pa.table(d)

    def part1(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _empty(h1_cols)
        s = b.column("src")
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        d = b.column("dst")
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        enc = pc.dictionary_encode(d)
        vocab = enc.dictionary.to_pylist()
        rv = np.empty((len(vocab), dims), dtype=np.int64)
        for i, u in enumerate(vocab):
            for k in range(dims):
                rv[i, k] = int(h64(f"{u}|{k}") % 3) - 1
        mat = rv[enc.indices.to_numpy(zero_copy_only=False)]
        return _segsum(s, mat, h1_cols)

    h1 = (
        und.map_batches(part1, batch_format="pyarrow")
        .groupby("node")
        .aggregate(*[Sum(c, alias_name=c) for c in h1_cols])
    )
    # hash-aggregate outputs carry schema-less empty blocks that the join
    # operator cannot type — repartition consolidates them away (the same
    # remedy bfs_distances/label_propagation apply to their frontiers);
    # materialized because h1 feeds both the hop-2 join and the output join
    h1 = h1.repartition(num_partitions).materialize()

    hits = und.join(
        h1,
        "inner",
        num_partitions=num_partitions,
        on=("dst",),
        right_on=("node",),
    )

    def part2(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _empty(h2_cols)
        s = b.column("src")
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        mat = np.column_stack(
            [
                _as_np(b.column(c))
                for c in h1_cols
            ]
        ).astype(np.int64)
        return _segsum(s, mat, h2_cols)

    h2 = (
        hits.map_batches(part2, batch_format="pyarrow")
        .groupby("node")
        .aggregate(*[Sum(c, alias_name=c) for c in h2_cols])
    )
    h2 = _project_t(
        h2,
        {"node2": "node", **{c: c for c in h2_cols}},
        {"node2": nt},
    ).repartition(num_partitions)

    out = h1.join(
        h2,
        "inner",
        num_partitions=num_partitions,
        on=("node",),
        right_on=("node2",),
    )
    return out.select_columns(["node", *h1_cols, *h2_cols])


def _as_np(col):
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def _broadcast_wpagerank(universe, edge_rows, nt, n_iters: int):
    """Small-graph weighted directed PageRank, driver-side (numpy codes)."""
    import numpy as np
    import ray.data as rd

    nodes = [r["node"] for r in universe.take_all()]
    vocab = {v: i for i, v in enumerate(sorted(nodes))}
    n = len(vocab)
    sc = np.full(n, PR_SCALE, dtype=np.int64)
    if edge_rows:
        s = np.fromiter((vocab[r["src"]] for r in edge_rows), dtype=np.int64)
        d = np.fromiter((vocab[r["dst"]] for r in edge_rows), dtype=np.int64)
        w = np.fromiter((r["w"] for r in edge_rows), dtype=np.int64)
        sw = np.zeros(n, dtype=np.int64)
        np.add.at(sw, s, w)
    base = (15 * PR_SCALE) // 100
    for _ in range(n_iters):
        inc = np.zeros(n, dtype=np.int64)
        if edge_rows:
            np.add.at(inc, d, (sc[s] * w) // sw[s])
        sc = base + (85 * inc) // 100
    inv = sorted(vocab)
    return rd.from_items(
        [{"node": inv[i], "pr_score": int(sc[i])} for i in range(n)]
    )


def weighted_pagerank(
    edges,
    *,
    nodes,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    node_col: str = "node",
    node_type: "pa.DataType | None" = None,
    n_iters: int = 3,
    num_partitions: int = 8,
    driver_cap: int | None = None,
):
    """Integer fixed-point PageRank over a DIRECTED, edge-WEIGHTED graph
    (host authority by link volume): mass flows src -> dst proportional to
    the edge weight's share of the source's total out-weight —
    ``contribution = (score * w) // sw(src)`` (floor division keeps every
    iteration bit-deterministic, as in :func:`pagerank`). Damping 0.85,
    scores in PR_SCALE units, no renormalization; nodes without out-edges
    simply contribute nothing (mass leaks — the standard simplification
    when mass is not renormalized anyway). Caller invariant:
    ``max(score) * max(w)`` must stay < 2^63 (holds when total weight per
    node is bounded, as for host link volumes).

    Same two execution shapes as :func:`pagerank`: size-gated driver path
    (numpy scatter-adds) below DRIVER_CAP edges; otherwise one join + one
    groupby-sum + one outer join per iteration, with only the (node,
    score) frontier materialized.
    """
    from ray.data.aggregate import Sum

    nt = node_type if node_type is not None else pa.int64()
    ntypes = {"src": nt, "dst": nt, "node": nt, "jnode": nt, "inode": nt}
    cap = DRIVER_CAP if driver_cap is None else driver_cap

    ew = _project_t(
        edges, {"src": src_col, "dst": dst_col, "w": weight_col}, ntypes
    ).repartition(num_partitions).materialize()
    universe0 = _project_t(nodes, {"node": node_col}, ntypes)
    if ew.count() <= 2 * cap:
        return _broadcast_wpagerank(universe0, ew.take_all(), nt, n_iters)

    sw = _project_t(
        ew.map_batches(
            lambda b: pa.table({"src": b.column("src"), "w": b.column("w")})
            if b.num_rows
            else pa.table(
                {"src": pa.array([], type=nt), "w": pa.array([], type=pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .groupby("src")
        .aggregate(Sum("w", alias_name="sw")),
        {"node": "src", "sw": "sw"},
        ntypes,
    ).repartition(num_partitions).materialize()

    universe = universe0.materialize()

    def with_score(b: pa.Table) -> pa.Table:
        import numpy as np

        if b.num_rows == 0:
            return pa.table(
                {"node": pa.array([], type=nt), "score": pa.array([], type=pa.int64())}
            )
        return b.append_column(
            "score", pa.array(np.full(b.num_rows, PR_SCALE, dtype=np.int64))
        )

    scores = universe.map_batches(with_score, batch_format="pyarrow").materialize()
    base = (15 * PR_SCALE) // 100

    def contrib(b: pa.Table) -> pa.Table:
        import numpy as np

        if b.num_rows == 0:
            return pa.table(
                {"dst": pa.array([], type=nt), "c": pa.array([], type=pa.int64())}
            )
        s = b.column("score").to_numpy(zero_copy_only=False)
        w = b.column("w").to_numpy(zero_copy_only=False)
        t = b.column("sw").to_numpy(zero_copy_only=False)
        return pa.table(
            {"dst": b.column("dst"), "c": pa.array((s * w) // t, type=pa.int64())}
        )

    def damp(b: pa.Table) -> pa.Table:
        import numpy as np

        if b.num_rows == 0:
            return pa.table(
                {"node": pa.array([], type=nt), "score": pa.array([], type=pa.int64())}
            )
        inc_np = b.column("inc").fill_null(0).to_numpy(zero_copy_only=False)
        score = base + (85 * inc_np) // 100
        return pa.table(
            {"node": b.column("node"), "score": pa.array(score, type=pa.int64())}
        )

    for _ in range(n_iters):
        sd = scores.join(
            sw, "inner", num_partitions=num_partitions,
            on=("node",), right_on=("node",),
        )
        j = ew.join(
            _project_t(
                sd, {"jnode": "node", "score": "score", "sw": "sw"}, ntypes
            ).repartition(num_partitions),
            "inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("jnode",),
        )
        inc = (
            j.map_batches(contrib, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("c", alias_name="inc"))
        )
        inc = _project_t(inc, {"inode": "dst", "inc": "inc"}, ntypes).repartition(
            num_partitions
        )
        nxt = universe.join(
            inc, "left_outer", num_partitions=num_partitions,
            on=("node",), right_on=("inode",),
        )
        scores = nxt.map_batches(damp, batch_format="pyarrow").repartition(
            num_partitions
        ).materialize()
    return _project_t(scores, {"node": "node", "pr_score": "score"}, ntypes)


HITS_SCALE = 10**9  # fixed-point unit for integer HITS (see overflow note)


def _broadcast_hits(universe, edge_rows, nt, n_iters: int):
    """Small-graph HITS, driver-side (numpy scatter-adds)."""
    import numpy as np
    import ray.data as rd

    nodes = sorted(r["node"] for r in universe.take_all())
    vocab = {v: i for i, v in enumerate(nodes)}
    n = len(vocab)
    h = np.full(n, HITS_SCALE, dtype=np.int64)
    a = np.zeros(n, dtype=np.int64)
    if edge_rows:
        s = np.fromiter((vocab[r["src"]] for r in edge_rows), dtype=np.int64)
        d = np.fromiter((vocab[r["dst"]] for r in edge_rows), dtype=np.int64)
        w = np.fromiter((r["w"] for r in edge_rows), dtype=np.int64)
    for _ in range(n_iters):
        araw = np.zeros(n, dtype=np.int64)
        if edge_rows:
            np.add.at(araw, d, h[s] * w)
        amax = int(araw.max()) if n else 0
        a = araw // (amax // HITS_SCALE + 1)
        hraw = np.zeros(n, dtype=np.int64)
        if edge_rows:
            np.add.at(hraw, s, a[d] * w)
        hmax = int(hraw.max()) if n else 0
        h = hraw // (hmax // HITS_SCALE + 1)
    return rd.from_items(
        [
            {"node": nodes[i], "hub_score": int(h[i]), "auth_score": int(a[i])}
            for i in range(n)
        ]
    )


def _hits_half(scores, ew, from_col, to_col, universe, ntypes, nt, num_partitions):
    """One HITS half-step: push ``scores`` along edges from ``from_col``
    to ``to_col``, sum, then max-normalize back into HITS_SCALE units with
    the exact integer rule ``sc = raw // (max(raw) // HITS_SCALE + 1)``
    (divisor-first keeps every term inside int64 — no raw*SCALE blowup).
    The max is a one-scalar driver aggregate broadcast into the
    normalizing map; everything else is one hash join + one groupby-sum
    + one outer join onto the node universe (absent nodes score 0)."""
    from ray.data.aggregate import Sum

    j = ew.join(
        _project_t(scores, {"jnode": "node", "sc": "sc"}, ntypes).repartition(
            num_partitions
        ),
        "inner",
        num_partitions=num_partitions,
        on=(from_col,),
        right_on=("jnode",),
    )

    def contrib(b: pa.Table) -> pa.Table:
        import numpy as np

        if b.num_rows == 0:
            return pa.table(
                {"tnode": pa.array([], type=nt), "c": pa.array([], type=pa.int64())}
            )
        sc = b.column("sc").to_numpy(zero_copy_only=False)
        w = b.column("w").to_numpy(zero_copy_only=False)
        return pa.table({"tnode": b.column(to_col), "c": pa.array(sc * w, type=pa.int64())})

    raw = (
        j.map_batches(contrib, batch_format="pyarrow")
        .groupby("tnode")
        .aggregate(Sum("c", alias_name="raw"))
        .materialize()
    )
    rmax = raw.max("raw") if raw.count() else None
    q = (int(rmax) if rmax is not None else 0) // HITS_SCALE + 1

    def norm(b: pa.Table) -> pa.Table:
        import numpy as np

        if b.num_rows == 0:
            return pa.table(
                {"inode": pa.array([], type=nt), "nsc": pa.array([], type=pa.int64())}
            )
        r = b.column("raw").to_numpy(zero_copy_only=False)
        return pa.table({"inode": b.column("tnode"), "nsc": pa.array(r // q, type=pa.int64())})

    normed = raw.map_batches(norm, batch_format="pyarrow").repartition(num_partitions)
    out = universe.join(
        normed, "left_outer", num_partitions=num_partitions,
        on=("node",), right_on=("inode",),
    )

    def fill(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"node": pa.array([], type=nt), "sc": pa.array([], type=pa.int64())}
            )
        return pa.table(
            {"node": b.column("node"), "sc": b.column("nsc").fill_null(0)}
        )

    return out.map_batches(fill, batch_format="pyarrow").repartition(
        num_partitions
    ).materialize()


def hits_scores(
    edges,
    *,
    nodes,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    node_col: str = "node",
    node_type: "pa.DataType | None" = None,
    n_iters: int = 2,
    num_partitions: int = 8,
    driver_cap: int | None = None,
):
    """Integer fixed-point HITS (hubs & authorities) over a directed,
    edge-weighted graph: per iteration, auth(v) = sum of hub(u)*w over
    in-edges then hub(u) = sum of auth(v)*w over out-edges, each half
    max-normalized back into HITS_SCALE units by the exact integer rule
    ``sc = raw // (max(raw) // HITS_SCALE + 1)`` — bit-deterministic at
    any parallelism, so the unrolled SQL oracle compares value-exact.

    Overflow invariant (documented, like weighted_pagerank): per-node
    total in/out weight x HITS_SCALE must stay < 2^63, i.e. per-host
    link volume < ~9e9 at the 1e-9 fixed point.

    Size-gated: driver numpy path below DRIVER_CAP edges, else per
    half-step one hash join + one groupby-sum + one scalar max + one
    outer join (only the (node, score) frontier materializes).
    Returns Dataset(node, hub_score, auth_score).
    """
    if n_iters < 1:
        raise ValueError("hits_scores requires n_iters >= 1")
    nt = node_type if node_type is not None else pa.int64()
    ntypes = {"src": nt, "dst": nt, "node": nt, "jnode": nt, "inode": nt}
    cap = DRIVER_CAP if driver_cap is None else driver_cap

    ew = _project_t(
        edges, {"src": src_col, "dst": dst_col, "w": weight_col}, ntypes
    ).repartition(num_partitions).materialize()
    universe0 = _project_t(nodes, {"node": node_col}, ntypes)
    if ew.count() <= 2 * cap:
        return _broadcast_hits(universe0, ew.take_all(), nt, n_iters)

    universe = universe0.repartition(num_partitions).materialize()

    def with_score(b: pa.Table) -> pa.Table:
        import numpy as np

        if b.num_rows == 0:
            return pa.table(
                {"node": pa.array([], type=nt), "sc": pa.array([], type=pa.int64())}
            )
        return b.append_column(
            "sc", pa.array(np.full(b.num_rows, HITS_SCALE, dtype=np.int64))
        )

    h = universe.map_batches(with_score, batch_format="pyarrow").materialize()
    a = None
    for _ in range(n_iters):
        a = _hits_half(h, ew, "src", "dst", universe, ntypes, nt, num_partitions)
        h = _hits_half(a, ew, "dst", "src", universe, ntypes, nt, num_partitions)

    ha = h.join(
        _project_t(a, {"anode": "node", "asc": "sc"}, {"anode": nt}).repartition(
            num_partitions
        ),
        "inner",
        num_partitions=num_partitions,
        on=("node",),
        right_on=("anode",),
    )
    return _project_t(
        ha, {"node": "node", "hub_score": "sc", "auth_score": "asc"}, ntypes
    )
