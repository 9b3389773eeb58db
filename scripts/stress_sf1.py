"""Order-of-magnitude scale-stress run (sf1-equivalent).

Synthesizes a 10x-sf0.1 corpus under /tmp (deterministic tiling of
documents/embeddings: ids shifted per tile, HALF the tiles carry perturbed
text so the dedup family sees both planted cross-tile duplicates and
near-misses), then runs:

- the headline KG build over 400,000 CC-density synthetic pages
  (bench.run_headline, repeat=8 over the 50k-doc table), and
- the dedup family at sf1: doc_dedup, minhash_dedup_docs, dup_clusters,
  similarity_join_exact, semdedup.

Prints one JSON line with walls + spill stats; paste the result into
BASELINE.md. Usage:

    python scripts/stress_sf1.py [--skip-headline]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/quickner_sf1"
TILES = 10


def build_sf1(dst: str = DST) -> str:
    done = os.path.join(dst, "_DONE")
    if os.path.exists(done):
        return dst
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    docs = pq.read_table(os.path.join(SRC, "documents.parquet"))
    n = docs.num_rows
    tiles = []
    for k in range(TILES):
        t = docs
        ids = pc.add(t.column("doc_id"), pa.scalar(k * n, pa.int64()))
        t = t.set_column(t.column_names.index("doc_id"), "doc_id", ids)
        if k % 2 == 1:  # odd tiles: perturbed text (near-miss corpus)
            txt = pc.binary_join_element_wise(
                t.column("text").cast(pa.string()),
                pa.array([f"tile {k} marker"] * n, pa.string()),
                " ",
            )
            t = t.set_column(t.column_names.index("text"), "text", txt)
            t = t.set_column(
                t.column_names.index("n_chars"),
                "n_chars",
                pc.utf8_length(txt).cast(pa.int64()),
            )
        tiles.append(t)
    pq.write_table(pa.concat_tables(tiles), os.path.join(dst, "documents.parquet"))

    emb = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    m = emb.num_rows
    etiles = []
    for k in range(TILES):
        t = emb
        ids = pc.add(t.column("vec_id"), pa.scalar(k * m, pa.int64()))
        t = t.set_column(t.column_names.index("vec_id"), "vec_id", ids)
        etiles.append(t)  # identical vectors => planted exact dup clusters
    pq.write_table(pa.concat_tables(etiles), os.path.join(dst, "embeddings.parquet"))
    # the remaining tables are only touched by relational queries; link the
    # originals so q_* helpers that sniff sf_dir still resolve
    for f in os.listdir(SRC):
        p = os.path.join(dst, f)
        if not os.path.exists(p):
            os.symlink(os.path.join(SRC, f), p)
    with open(done, "w") as fh:
        fh.write("ok")
    return dst


def spilled_bytes() -> int:
    total = 0
    spill_dir = "/tmp/ray"
    for root, _dirs, files in os.walk(spill_dir):
        if "spilled" in root or "object_spilling" in root:
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    return total


def main() -> None:
    import ray

    skip_headline = "--skip-headline" in sys.argv
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = build_sf1()

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")

    out: dict = {"metric": "sf1_stress", "sf": 1.0, "num_cpus": cpus,
                 "tiles": TILES, "walls": {}}

    if not skip_headline:
        from bench import run_headline

        head = run_headline(sf_dir, repeat=8, warmup=False, reps=1)
        out["walls"]["headline_kg"] = round(head["wall_sec"], 2)
        out["headline_docs"] = head["n_docs"]
        out["headline_docs_per_sec"] = round(head["docs_per_sec"], 1)

    from quickner_ray.pipelines import queries as q

    from quickner_ray.pipelines import temporal_kg as tkg

    family = {
        "doc_dedup": q.q_doc_dedup,
        "minhash_dedup_docs": q.q_minhash_dedup_docs,
        "dup_clusters": q.q_dup_clusters,
        "similarity_join_exact": q.q_similarity_join_exact,
        "semdedup": q.q_semdedup,
        # temporal-KG wave: 6 synth snapshots x 500k docs = 3M page parses
        # feeding the bucket-shuffle island kernel
        "fact_validity_intervals": tkg.q_fact_validity_intervals,
        "fact_majority_vote": tkg.q_fact_majority_vote,
        # BGP joins over the sf1 mention-triple stream (bucketed hash join)
        "triple_pattern_match": q.q_triple_pattern_match,
        # property-path family: closure over the parsed host graph (500k
        # pages -> HTML link extraction dominates; closure is host-bounded),
        # path-algebra join over the sf1 triple stream, KMV synopsis scan
        "host_reachability": q.q_host_reachability,
        "kg_path_affinity": q.q_kg_path_affinity,
        "kg_pred_cardinality": q.q_kg_pred_cardinality,
        "kmv_entity_overlap": q.q_kmv_entity_overlap,
        # round-3 continuation wave: store-synopsis planning + serving,
        # full aggregate rollup, named graphs, subqueries, OWL layer
        "triple_pattern_match_stats": q.q_triple_pattern_match_stats,
        "kg_sparql_rollup": q.q_kg_sparql_rollup,
        "kg_sparql_served": q.q_kg_sparql_served,
        "kg_sparql_subquery": q.q_kg_sparql_subquery,
        "kg_graph_bgp": q.q_kg_graph_bgp,
        "kg_owl_inverse": q.q_kg_owl_inverse,
    }
    new_wave = {
        # round-3 final wave: skew join, PQ ANN, sameAs rewrite, SCC,
        # SPARQL federation, TextRank, centrality, Turtle ingest
        "skew_join": q.q_skew_join,
        "pq_codes": q.q_pq_codes,
        "pq_topk": q.q_pq_topk,
        "kg_sameas_rewrite": q.q_kg_sameas_rewrite,
        "host_scc": q.q_host_scc,
        "kg_sparql_service": q.q_kg_sparql_service,
        "textrank_summaries": q.q_textrank_summaries,
        "host_centrality": q.q_host_centrality,
        "turtle_ingest": q.q_turtle_ingest,
    }
    family.update(new_wave)
    r5_wave = {
        # round-4 UPDATE verbs (VERDICT r4 item 6: no sf1 row yet) — each
        # builds its own fingerprint-keyed store from the sf1 corpus then
        # applies one delta generation; store build dominates
        "kg_sparql_update": q.q_kg_sparql_update,
        "kg_sparql_load": q.q_kg_sparql_load,
        "kg_sparql_clear": q.q_kg_sparql_clear,
        "similarity_topk_ivfpq": q.q_similarity_topk_ivfpq,
        # round-5 additions: named-graph store (20 per-graph LSM subtrees
        # over the sf1 quad stream), unbounded path closure, the seeded
        # kmeans assignment, doc-local packing, batched ANN serving
        "kg_quadstore_scoped_update": q.q_kg_quadstore_scoped_update,
        "kg_quadstore_clear_graph": q.q_kg_quadstore_clear_graph,
        "kg_sparql_path_closure": q.q_kg_sparql_path_closure,
        "embedding_kmeans": q.q_embedding_kmeans,
        "packed_sequences": q.q_packed_sequences,
        "similarity_topk_batch": q.q_similarity_topk_batch,
    }
    family.update(r5_wave)
    if "--new-only" in sys.argv:
        family = new_wave
    if "--r5-only" in sys.argv:
        family = r5_wave
    rows: dict = {}
    for name, fn in family.items():
        t0 = time.perf_counter()
        res = fn(sf_dir)
        n = res.count() if hasattr(res, "count") else len(res)
        out["walls"][name] = round(time.perf_counter() - t0, 2)
        rows[name] = int(n)
    out["rows"] = rows
    out["spilled_bytes"] = spilled_bytes()
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
