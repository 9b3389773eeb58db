"""Strongly connected components over a DIRECTED edge Dataset.

The web-graph counterpart of stages/graph_cc.connected_components (which is
undirected): hosts that link each other transitively form the mutually-
reachable cores (the "SCC bowtie" of Broder et al., WWW 2000). Output is
(node, scc) where ``scc`` is the MINIMUM node id in the component —
deterministic, hence value-exact against a mutual-reachability SQL oracle.

Two execution shapes, size-gated like connected_components:

* below ``driver_cap`` edges — iterative Tarjan driver-side, component map
  broadcast (one relabel pass). SCC is the one graph primitive whose exact
  sequential algorithm is linear, so the gate is purely about edge-list
  size, not work.
* above the cap — the FW-BW COLORING algorithm (Orzan 2004; the standard
  Pregel/BSP SCC): repeat { forward max-label propagation to fixpoint
  ("color" = max id that reaches v, detected via the monotone label-sum
  trick of graph_cc); roots are nodes with color(v)==v; a backward sweep
  restricted to same-color edges marks exactly the root's SCC; marked
  nodes are assigned and peeled }. Every outer round settles all current
  root SCCs; web graphs (one giant SCC + shallow periphery) settle in a
  handful of rounds. Adversarial long chains degrade to O(n) rounds —
  ``max_outer`` bounds that loudly. Wire cost per round: the (node, color)
  frontier and the surviving edges; nothing node-payload-sized.

Reference: n/a — no counterpart (extension operator; the reference is a
single-process NER annotator).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .graph_cc import DRIVER_CAP, _project


def _tarjan(edge_rows, node_ids) -> dict[int, int]:
    """Iterative Tarjan; returns node -> min-member scc id."""
    adj: dict[int, list[int]] = {}
    nodes = set(int(n) for n in node_ids)
    for r in edge_rows:
        s, d = int(r["src"]), int(r["dst"])
        nodes.add(s)
        nodes.add(d)
        adj.setdefault(s, []).append(d)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on_stack: set[int] = set()
    stack: list[int] = []
    out: dict[int, int] = {}
    counter = 0
    for root in sorted(nodes):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            succ = adj.get(v, ())
            for i in range(pi, len(succ)):
                w = succ[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            work.pop()
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])
    return out


def _dedup_edges(edges, num_partitions: int):
    from ray.data.aggregate import Count

    return _project(
        edges.groupby(["src", "dst"], num_partitions=num_partitions).aggregate(
            Count(alias_name="_n")
        ),
        {"src": "src", "dst": "dst"},
    )


def strongly_connected_components(
    edges,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    nodes=None,
    node_col: str = "node",
    num_partitions: int = 8,
    driver_cap: int = DRIVER_CAP,
    max_outer: int = 32,
    max_inner: int = 25,
):
    """Directed edge Dataset -> Dataset(node, scc), ``scc`` = min member id.

    ``nodes`` optionally supplies the universe so isolated nodes appear as
    singleton components. Set ``driver_cap=0`` to force the distributed
    FW-BW path (tests do)."""
    import ray
    from ray.data.aggregate import Max, Min

    raw = _project(edges, {"src": src_col, "dst": dst_col}).materialize()
    n_edges = raw.count()
    # gate on BOTH collects the driver path performs: a sparse edge list over
    # a huge node universe (isolated nodes are exactly why ``nodes`` exists)
    # must not take_all the universe (VERDICT r3). The distributed path
    # handles isolated nodes streaming: colorless singletons are roots and
    # are assigned in their first FW-BW round.
    n_nodes = nodes.count() if nodes is not None else 0

    if n_edges <= driver_cap and n_nodes <= driver_cap:
        node_ids = (
            [r[node_col] for r in nodes.select_columns([node_col]).take_all()]
            if nodes is not None
            else []
        )
        comp = _tarjan(raw.take_all() if n_edges else [], node_ids)
        items = sorted(comp.items())
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([k for k, _ in items], type=pa.int64()),
                    "scc": pa.array([v for _, v in items], type=pa.int64()),
                }
            )
        )

    E = _dedup_edges(raw, num_partitions).repartition(num_partitions).materialize()
    R = _project(raw, {"node": "src"}).union(_project(raw, {"node": "dst"}))
    if nodes is not None:
        R = R.union(_project(nodes, {"node": node_col}))
    R = (
        _project(
            R.groupby("node").aggregate(Min("node", alias_name="_l")),
            {"node": "node"},
        )
        .repartition(num_partitions)
        .materialize()
    )

    from .antijoin import anti_join

    assigned = []
    def _singletons(rr):
        return rr.map_batches(
            lambda b: pa.table({"node": b.column("node"), "scc": b.column("node")})
            if b.num_rows
            else pa.table(
                {
                    "node": pa.array([], type=pa.int64()),
                    "scc": pa.array([], type=pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )

    for _outer in range(max_outer):
        if R.count() == 0:
            break
        if E.count() == 0:
            # only isolated nodes remain: all singletons, done
            assigned.append(_singletons(R).materialize())
            R = R.limit(0)
            break
        # ---- forward max-color propagation to fixpoint -------------------
        C = (
            _project(R, {"node": "node"})
            .map_batches(
                lambda b: pa.table(
                    {"node": b.column("node"), "color": b.column("node")}
                )
                if b.num_rows
                else pa.table(
                    {
                        "node": pa.array([], type=pa.int64()),
                        "color": pa.array([], type=pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
            .repartition(num_partitions)
            .materialize()
        )
        prev = C.sum("color")
        for _ in range(max_inner):
            msgs = _project(
                E.join(
                    C,
                    "inner",
                    num_partitions=num_partitions,
                    on=("src",),
                    right_on=("node",),
                ),
                {"node": "dst", "cand": "color"},
            )
            C = (
                _project(
                    _project(C, {"node": "node", "cand": "color"})
                    .union(msgs)
                    .groupby("node")
                    .aggregate(Max("cand", alias_name="color")),
                    {"node": "node", "color": "color"},
                )
                .repartition(num_partitions)
                .materialize()
            )
            s = C.sum("color")
            if s == prev:  # max-labels are monotone: equal sum <=> fixpoint
                break
            prev = s
        else:
            raise RuntimeError(
                f"SCC forward coloring did not reach fixpoint in {max_inner} "
                "rounds — raise max_inner (graph diameter exceeds it)"
            )
        # ---- backward sweep on same-color edges from the roots ------------
        cc_src = _project(C, {"esrc": "node", "csrc": "color"})
        cc_dst = _project(C, {"edst": "node", "cdst": "color"})
        # _project between the joins normalizes the schema-less empty blocks
        # Ray's join emits for empty partitions (see graph_cc.connected_
        # components) — a second acero join crashes on them otherwise.
        j1 = _project(
            E.join(
                cc_src,
                "inner",
                num_partitions=num_partitions,
                on=("src",),
                right_on=("esrc",),
            ),
            {"src": "src", "dst": "dst", "csrc": "csrc"},
        ).repartition(num_partitions)
        ec = j1.join(
            cc_dst, "inner", num_partitions=num_partitions, on=("dst",), right_on=("edst",)
        )

        def same_color(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            if b.num_rows == 0:
                return pa.table(
                    {
                        "src": pa.array([], type=pa.int64()),
                        "dst": pa.array([], type=pa.int64()),
                        "c": pa.array([], type=pa.int64()),
                    }
                )
            keep = b.filter(pc.equal(b.column("csrc"), b.column("cdst")))
            return pa.table(
                {
                    "src": keep.column("src"),
                    "dst": keep.column("dst"),
                    "c": keep.column("csrc"),
                }
            )

        EC = (
            ec.map_batches(same_color, batch_format="pyarrow")
            .repartition(num_partitions)
            .materialize()
        )

        def roots(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            if b.num_rows == 0:
                return pa.table(
                    {
                        "node": pa.array([], type=pa.int64()),
                        "c": pa.array([], type=pa.int64()),
                    }
                )
            keep = b.filter(pc.equal(b.column("node"), b.column("color")))
            return pa.table({"node": keep.column("node"), "c": keep.column("color")})

        M = C.map_batches(roots, batch_format="pyarrow").repartition(
            num_partitions
        ).materialize()
        prev_m = M.count()
        n_ec = EC.count()  # zero same-color edges: roots ARE their SCCs
        for _ in range(max_inner if n_ec else 0):
            back = _project(
                EC.join(
                    _project(M, {"mnode": "node", "mc": "c"}),
                    "inner",
                    num_partitions=num_partitions,
                    on=("dst",),
                    right_on=("mnode",),
                ),
                {"node": "src", "c": "mc"},
            )
            # a node's color is unique, so groupby-max is pure dedup
            M = (
                _project(
                    _project(M, {"node": "node", "c": "c"})
                    .union(back)
                    .groupby("node")
                    .aggregate(Max("c", alias_name="c")),
                    {"node": "node", "c": "c"},
                )
                .repartition(num_partitions)
                .materialize()
            )
            m = M.count()
            if m == prev_m:
                break
            prev_m = m
        else:
            if n_ec:
                raise RuntimeError(
                    f"SCC backward sweep did not reach fixpoint in {max_inner} "
                    "rounds — raise max_inner (component diameter exceeds it)"
                )
        # ---- assign scc = min marked node per color, then peel -----------
        sccmin = _project(
            M.groupby("c").aggregate(Min("node", alias_name="scc")),
            {"mc": "c", "scc": "scc"},
        ).repartition(num_partitions)  # consolidate schema-less empties
        part = _project(
            M.join(
                sccmin,
                "inner",
                num_partitions=num_partitions,
                on=("c",),
                right_on=("mc",),
            ),
            {"node": "node", "scc": "scc"},
        ).materialize()
        assigned.append(part)
        R = (
            anti_join(R, "node", M, "node", num_partitions=num_partitions)
            .repartition(num_partitions)
            .materialize()
        )
        E = (
            anti_join(
                anti_join(E, "src", M, "node", num_partitions=num_partitions),
                "dst",
                M,
                "node",
                num_partitions=num_partitions,
            )
            .repartition(num_partitions)
            .materialize()
        )
    else:
        raise RuntimeError(
            f"SCC did not converge in {max_outer} outer rounds — the graph "
            "has a longer chain structure than max_outer allows"
        )
    out = assigned[0]
    for p in assigned[1:]:
        out = out.union(p)
    return out
