"""Harmonic closeness centrality from a deterministic seed panel.

Closeness on a 10^9-node web graph is approximated from a fixed panel of
source nodes (Eppstein-Wang style sampling, made deterministic: the
``seeds_k`` SMALLEST node ids in the edge list — SQL-expressible, so the
whole operator stays value-exact). For every node v:

    centrality(v) = Σ_{s in seeds, d(s,v) >= 1} SCALE // d(s,v)

with d the min hop distance on the undirected graph, bounded at
``max_hops`` (harmonic form: unreachable pairs contribute 0 instead of
breaking the sum — the standard fix for disconnected webs). All integer.

Shape: one bounded distinct-node pass picks the seeds; each seed runs the
semi-naive BFS of graph_cc.bfs_distances (frontier-sized wire cost per
round, size-gated driver path below DRIVER_CAP); the tagged per-seed
(node, dist) sets union into ONE bounded groupby-sum. seeds_k is a
constant, so the whole operator is seeds_k BFS sweeps — the documented
trade of exact all-pairs closeness (O(n) sweeps) for a fixed panel.

Reference: n/a — no counterpart (extension operator for web-graph
analytics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

CENT_SCALE = 10**6


def harmonic_centrality(
    edges,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    seeds_k: int = 4,
    max_hops: int = 3,
    scale: int = CENT_SCALE,
    num_partitions: int = 8,
):
    """Directed edge Dataset -> Dataset(node, centrality): integer harmonic
    closeness from the ``seeds_k`` smallest node ids, hop-bounded."""
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    from .collect import collect_blocks
    from .graph_cc import _project, bfs_distances

    raw = _project(edges, {"src": src_col, "dst": dst_col}).materialize()
    # seed panel: the seeds_k smallest distinct endpoint ids (bounded
    # collect — a per-batch min-k combiner would bound it further at
    # >32-bit universes; endpoints here are host buckets)
    ends = _project(raw, {"node": "src"}).union(_project(raw, {"node": "dst"}))
    uniq = collect_blocks(
        ends.groupby("node").aggregate(Min("node", alias_name="_l")),
        "node",
        pa.table({"node": pa.array([], type=pa.int64())}),
    )
    node_ids = np.sort(uniq.column("node").to_numpy(zero_copy_only=False))
    seeds = node_ids[:seeds_k].tolist()

    tagged = None
    for s in seeds:
        seed_ds = rd.from_arrow(pa.table({"node": pa.array([s], type=pa.int64())}))
        d = bfs_distances(
            raw, k=max_hops, seeds=seed_ds, num_partitions=num_partitions
        )

        def contrib(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            if b.num_rows == 0:
                return pa.table(
                    {
                        "node": pa.array([], type=pa.int64()),
                        "centrality": pa.array([], type=pa.int64()),
                    }
                )
            dist = b.column("dist").to_numpy(zero_copy_only=False).astype(np.int64)
            c = np.where(dist > 0, scale // np.where(dist > 0, dist, 1), 0)
            return pa.table(
                {
                    "node": b.column("node"),
                    "centrality": pa.array(c, type=pa.int64()),
                }
            )

        part = d.map_batches(contrib, batch_format="pyarrow")
        tagged = part if tagged is None else tagged.union(part)
    if tagged is None:
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([], type=pa.int64()),
                    "centrality": pa.array([], type=pa.int64()),
                }
            )
        )
    return tagged.groupby("node").aggregate(
        Sum("centrality", alias_name="centrality")
    )
