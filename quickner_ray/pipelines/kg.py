"""The flagship KG-construction pipeline (north rule, BASELINE.json).

Dataflow (SURVEY.md §3.1 "Ray Data shape", §7):

    read_parquet(pages, pruned columns)
      -> map_batches(extract_pages)            stateless: html -> text
      -> map_batches(add_doc_id)               stateless: md5 content hash
      -> [filter_texts]                        optional P1 predicate
      -> [dedup_exact]                         optional E1 shuffle on doc_id
      -> map_batches(MentionDetector, ...)     ACTOR POOL: shared automaton
      -> write_parquet(out/annotated/shard=i)  per-shard checkpoint
    read_parquet(out/annotated)
      -> map_batches(explode_mentions)         docs -> mention rows
      -> write_parquet(out/mentions)
    read_parquet(out/mentions)
      -> canonical_entities (partial->final groupby)  -> out/entities
      -> map_batches(add_triple_columns)              -> out/triples
      -> label_counts (partial->final groupby)        -> out/label_counts

Scale design decisions:
- **Streaming throughout**: every stage is a lazy Dataset consumed by
  ``write_parquet``; nothing materializes the full corpus; stage handoffs go
  through partitioned Parquet so each phase is independently restartable.
- **Shards are a pure function of the input file list** (never of
  scheduling): phase A processes one input-file shard at a time, writes
  ``shard=NNNNN`` dirs and atomic lineage manifests; a killed run re-enters
  and skips complete shards (state/lineage.py).
- **The gazetteer is broadcast, not joined**: compiled once on the driver,
  ``ray.put`` once, deserialized once per actor.
- **The canonicalization shuffle is skew-proof by construction**: per-batch
  partial aggregation emits <=1 row per key per batch before the global
  groupby (stages/canonicalize.py).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field

from ..kernel.automaton import Gazetteer
from ..kernel.filters import Filters
from ..stages.canonicalize import (
    add_triple_columns,
    canonical_entities,
    explode_mentions,
    label_counts,
    label_counts_from_entities,
)
from ..stages.dedup_exact import add_doc_id, dedup_exact
from ..stages.detect import detect_mentions
from ..stages.extract import extract_pages, passthrough_text
from ..state.lineage import reset_shard_dir, shard_complete, write_manifest


@dataclass
class KGPipelineConfig:
    source: str = "html"  # "html": extract from html bytes; "text": use text col
    case_sensitive: bool = False
    filters: Filters | None = None  # None -> no P1 filtering
    dedup: bool = False  # E1 exact-dedup shuffle before detection
    subj_col: str = "url"  # triple subject column
    batch_size: int = 1024
    detect_concurrency: tuple | int | None = None
    detect_num_cpus: float = 1
    read_concurrency: int | None = None
    # True: write the reference-shaped annotated-docs + mentions checkpoints
    # (conformance sinks read them). False: FUSED fast path — pages ->
    # detect -> explode -> triples in ONE streaming pass per shard (the
    # headline-throughput configuration; 2 fewer full-corpus passes).
    write_annotated: bool = True
    # phase-A shards executed concurrently (driver threads, one Dataset
    # execution each). >1 keeps the cluster busy when shards are small
    # relative to cluster width; per-shard checkpointing is unchanged.
    shard_parallelism: int = 1
    # User-extension surface (SURVEY §2.7): custom stages inserted between
    # the prep chain (extract/hash/filter/dedup) and detection. Each entry
    # is ``(name, stage)`` where ``stage`` is a callable ``Dataset ->
    # Dataset`` (attach your own map_batches / actor pools). The config
    # fingerprint hashes the stage name, the function bytecode (for plain
    # functions/lambdas) and an optional ``stage.stage_version`` attribute —
    # set ``stage_version`` on class-based stages so editing their logic
    # invalidates resume; renaming always invalidates.
    extra_stages: tuple = ()

    def fingerprint(self, gazetteer: Gazetteer) -> str:
        h = hashlib.md5()
        h.update(
            repr(
                (
                    self.source,
                    self.case_sensitive,
                    self.dedup,
                    self.subj_col,
                    self.write_annotated,
                )
            ).encode()
        )
        for name, stage in self.extra_stages:
            h.update(name.encode())
            h.update(b"\x1f")
            # content-derived stage identity: bytecode for plain functions /
            # lambdas, explicit version for class-based stages. NOT repr()
            # (memory addresses would break resume across processes).
            ver = getattr(stage, "stage_version", None)
            if ver is not None:
                h.update(str(ver).encode())
            code = getattr(stage, "__code__", None)
            if code is not None:
                _hash_code(h, code)
            h.update(b"\x1e")
        if self.filters is not None:
            h.update(repr(self.filters).encode())
        for name, label in zip(gazetteer.names, gazetteer.labels):
            h.update(name.encode())
            h.update(b"\x1f")
            h.update(label.encode())
            h.update(b"\x1e")
        h.update(str(gazetteer.case_sensitive).encode())
        return h.hexdigest()


def _hash_code(h, code) -> None:
    """Process-stable hash of a code object: bytecode + names + RECURSIVE
    nested code objects. ``repr(co_consts)`` is NOT stable — a nested
    lambda/def const reprs as ``<code object ... at 0x7f...>`` whose
    address changes every process, which would silently invalidate resume
    on each run (the exact failure the bytecode hashing exists to avoid)."""
    h.update(code.co_code)
    h.update(repr((code.co_names, code.co_varnames)).encode())
    for const in code.co_consts:
        if hasattr(const, "co_code"):
            _hash_code(h, const)
        else:
            h.update(repr(const).encode())


def _prep_dataset(ds, cfg: KGPipelineConfig):
    """Shared pre-detection chain: extract -> hash -> filter -> dedup."""
    if cfg.source == "html":
        ds = ds.map_batches(extract_pages, batch_format="pyarrow")
    else:
        ds = ds.map_batches(passthrough_text, batch_format="pyarrow")
    ds = ds.map_batches(add_doc_id, batch_format="pyarrow")
    if cfg.filters is not None:
        from ..stages.filter_stage import filter_texts

        ds = filter_texts(ds, cfg.filters)
    if cfg.dedup:
        ds = dedup_exact(ds, key="doc_id")
    for _name, stage in cfg.extra_stages:
        ds = stage(ds)
    return ds


def annotate_dataset(ds, gazetteer: Gazetteer, cfg: KGPipelineConfig):
    """Phase-A transform chain on an already-read pages Dataset (no I/O)."""
    ds = _prep_dataset(ds, cfg)
    ds = detect_mentions(
        ds,
        gazetteer,
        batch_size=cfg.batch_size,
        concurrency=cfg.detect_concurrency,
        num_cpus=cfg.detect_num_cpus,
    )
    return ds


def triples_dataset(ds, gazetteer: Gazetteer, cfg: KGPipelineConfig):
    """FUSED phase-A chain: pages -> triple rows in one actor-pool pass
    (detect.MentionTripleDetector — no annotated-docs intermediate)."""
    from ..stages.detect import detect_triples

    ds = _prep_dataset(ds, cfg)
    return detect_triples(
        ds,
        gazetteer,
        subj_col=cfg.subj_col,
        batch_size=cfg.batch_size,
        concurrency=cfg.detect_concurrency,
        num_cpus=cfg.detect_num_cpus,
    )


def _read_columns(cfg: KGPipelineConfig) -> list[str]:
    # prune at the read: never ship the html column when matching on text
    if cfg.source == "html":
        return ["url", "html", "lang"]
    return ["url", "text", "lang"]


def run_kg(
    input_paths: list[str] | str,
    gazetteer: Gazetteer,
    out_dir: str,
    cfg: KGPipelineConfig | None = None,
    *,
    shards: int | None = None,
    build_indexes: bool = False,
) -> dict:
    """Run the full pipeline with per-shard checkpointing. Returns metrics.

    ``input_paths``: parquet file(s) or a directory. ``shards`` groups the
    input FILES into that many shards (default: one shard per file).
    Re-running with the same inputs+config skips completed shards.
    """
    import ray.data as rd

    cfg = cfg or KGPipelineConfig()
    if isinstance(input_paths, str):
        if os.path.isdir(input_paths):
            files = sorted(
                os.path.join(input_paths, f)
                for f in os.listdir(input_paths)
                if f.endswith((".parquet", ".warc", ".warc.gz"))
            )
        else:
            files = [input_paths]
    else:
        files = sorted(input_paths)
    if not files:
        raise ValueError("no input parquet/warc files")
    n_shards = min(shards or len(files), len(files))
    shard_files = [files[i::n_shards] for i in range(n_shards)]
    fp = cfg.fingerprint(gazetteer)
    metrics: dict = {"shards": n_shards, "fingerprint": fp, "stages": {}}
    t_all = time.perf_counter()

    # ---- phase A: extract + detect, per shard (resumable) -------------------
    # Standard path writes annotated docs (stage "annotated"); the fused
    # fast path writes triples directly (stage name stays "annotated" in the
    # manifest so resume logic is uniform).
    ann_dir = os.path.join(out_dir, "annotated")
    tri_dir = os.path.join(out_dir, "triples")
    phase_a_dir = ann_dir if cfg.write_annotated else tri_dir
    skipped = 0

    import threading

    import ray

    # Dataset CONSTRUCTION is serialized: Ray's read_parquet path/filesystem
    # resolution has a lazy-import race under concurrent threads. Execution
    # (the expensive part) still overlaps freely.
    _read_lock = threading.Lock()

    # Concurrent shard executions don't coordinate resources — each thread's
    # streaming executor assumes the whole cluster. Size each shard's
    # detector pool to its SHARE so pools don't starve one another.
    shard_cfg = cfg
    if cfg.shard_parallelism > 1 and cfg.detect_concurrency is None:
        total_cpus = int(ray.cluster_resources().get("CPU", 8))
        per_shard = max(1, (total_cpus - cfg.shard_parallelism) // cfg.shard_parallelism)
        from dataclasses import replace

        # FIXED pool size (int), not autoscaling: concurrent pipelines keep
        # autoscaling pools stuck at their minimum (each executor sees the
        # others' load as cluster pressure), leaving most cores idle
        shard_cfg = replace(cfg, detect_concurrency=per_shard)

    def _run_shard(i: int, shard: list[str]) -> bool:
        shard_out = os.path.join(phase_a_dir, f"shard={i:05d}")
        if shard_complete(out_dir, "annotated", i, inputs=shard, fingerprint=fp):
            return True
        t0 = time.perf_counter()
        reset_shard_dir(shard_out)
        with _read_lock:
            if shard[0].endswith((".warc", ".warc.gz")):
                from ..sources.warc import read_warc

                # WARC records always need the html path; prune warc_ts
                ds = read_warc(shard).select_columns(["url", "html", "lang"])
            else:
                ds = rd.read_parquet(
                    shard,
                    columns=_read_columns(cfg),
                    concurrency=cfg.read_concurrency,
                )
        if cfg.write_annotated:
            ds = annotate_dataset(ds, gazetteer, shard_cfg)
        else:
            ds = triples_dataset(ds, gazetteer, shard_cfg)
        ds.write_parquet(shard_out)
        rows = sum(f.metadata.num_rows for f in _parquet_fragments(shard_out))
        try:  # per-stage execution stats (operator wall/cpu breakdown)
            stats = ds.stats()[:8000]
        except Exception:
            stats = None
        write_manifest(
            out_dir,
            "annotated",
            i,
            inputs=shard,
            rows=rows,
            fingerprint=fp,
            extra={"seconds": time.perf_counter() - t0, "ray_data_stats": stats},
        )
        return False

    if cfg.shard_parallelism > 1 and n_shards > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=cfg.shard_parallelism) as pool:
            skipped = sum(pool.map(_run_shard, range(n_shards), shard_files))
    else:
        skipped = sum(_run_shard(i, s) for i, s in enumerate(shard_files))
    metrics["stages"]["annotated"] = {"skipped_shards": skipped}

    # Content-derived roster of phase-A shard outputs: downstream phase
    # manifests key on it (not just the directory path), so INCREMENTAL
    # ingest works — appending input files (shards=None gives one stable
    # shard per file) computes only the new shards AND re-runs the
    # aggregate phases, instead of skipping them against a stale dir path.
    from ..state.lineage import read_manifest as _read_m

    roster = []
    for _i in range(n_shards):
        _m = _read_m(out_dir, "annotated", _i)
        roster.append(f"{_i}:{_m['rows'] if _m else -1}")

    # ---- phase B (standard path only): explode mentions + triples -----------
    mentions_dir = os.path.join(out_dir, "mentions")
    if cfg.write_annotated:
        if not shard_complete(out_dir, "mentions", 0, inputs=[ann_dir, *roster], fingerprint=fp):
            t0 = time.perf_counter()
            reset_shard_dir(mentions_dir)
            # prune to what explode_mentions consumes — the annotated dir
            # also carries n_mentions and any passthrough columns, which
            # must not ride the mention explode (VERDICT r3)
            import pyarrow.dataset as _pads

            _avail = set(_pads.dataset(ann_dir, format="parquet").schema.names)
            _need = [
                c
                for c in dict.fromkeys(
                    (cfg.subj_col, "doc_id", "url", "lang", "text", "label")
                )
                if c in _avail
            ]
            ann = rd.read_parquet(ann_dir, columns=_need)
            mentions = ann.map_batches(
                lambda b: explode_mentions(b, subj_col=cfg.subj_col),
                batch_format="pyarrow",
            )
            mentions.write_parquet(mentions_dir)
            write_manifest(
                out_dir, "mentions", 0, inputs=[ann_dir, *roster], rows=-1, fingerprint=fp,
                extra={"seconds": time.perf_counter() - t0},
            )
        graph_src = mentions_dir
    else:
        graph_src = tri_dir  # triples already written in phase A

    # ---- phase C: canonical entities, triples, label counts -----------------
    # entities aggregate from the mention/triple rows (one shuffle);
    # label_counts derive from the (tiny) entities table, not a third
    # full-corpus pass.
    if not shard_complete(out_dir, "graph", 0, inputs=[graph_src, *roster], fingerprint=fp):
        t0 = time.perf_counter()
        ent_dir = os.path.join(out_dir, "entities")
        lc_dir = os.path.join(out_dir, "label_counts")
        reset_shard_dir(ent_dir)
        reset_shard_dir(lc_dir)
        if cfg.write_annotated:
            reset_shard_dir(tri_dir)
            mentions = _read_mentions(mentions_dir, None, subj_col=cfg.subj_col)
            mentions.map_batches(
                lambda b: add_triple_columns(b, subj_col=cfg.subj_col),
                batch_format="pyarrow",
            ).write_parquet(tri_dir)
        if cfg.write_annotated:
            # prune at the read: the entity aggregate needs only 2 columns
            canonical_entities(
                _read_mentions(graph_src, ["surface_norm", "label"])
            ).write_parquet(ent_dir)
        else:
            # fused triples carry the pattern id: aggregate ONE int32 column
            from ..stages.canonicalize import canonical_entities_from_pids

            canonical_entities_from_pids(
                _read_mentions(graph_src, ["pid"]), gazetteer
            ).write_parquet(ent_dir)
        _write_label_counts(ent_dir, lc_dir)
        if build_indexes:
            # salted two-phase builders (stages/indexes.py): label cardinality
            # is tiny and surfaces are Zipf-hot, so unsalted groupbys would
            # colocate the whole corpus on a handful of reducers at scale.
            # Column mapping differs by layout: the standard mentions table
            # carries (doc_id, surface_norm, label); fused triples carry
            # (subj, surface_norm, pred).
            from ..stages.indexes import build_entity_index, build_label_index

            if cfg.write_annotated:
                idx_src, id_col, label_col = mentions_dir, "doc_id", "label"
            else:
                idx_src, id_col, label_col = tri_dir, "subj", "pred"
            ei_dir = os.path.join(out_dir, "entity_index")
            li_dir = os.path.join(out_dir, "label_index")
            reset_shard_dir(ei_dir)
            reset_shard_dir(li_dir)
            build_entity_index(
                _read_mentions(idx_src, ["surface_norm", id_col], subj_col=cfg.subj_col),
                id_col,
            ).write_parquet(ei_dir)
            build_label_index(
                _read_mentions(idx_src, [label_col, id_col], subj_col=cfg.subj_col),
                id_col,
                key_col=label_col,
            ).write_parquet(li_dir)
        write_manifest(
            out_dir, "graph", 0, inputs=[graph_src, *roster], rows=-1, fingerprint=fp,
            extra={"seconds": time.perf_counter() - t0},
        )

    metrics["total_seconds"] = time.perf_counter() - t_all
    with open(os.path.join(out_dir, "_lineage", "run-metrics.json"), "w") as f:
        json.dump(metrics, f)
    return metrics


def _write_label_counts(ent_dir: str, lc_dir: str) -> None:
    """A5 from the canonical-entity table. The table is bounded by the
    gazetteer's distinct (surface, label) pairs, so below a generous cap it
    aggregates driver-side with pyarrow (saves a whole Ray pipeline's fixed
    latency); a Ray groupby handles the oversized case."""
    import pyarrow.parquet as pq

    total = sum(f.metadata.num_rows for f in _parquet_fragments(ent_dir))
    if next(_parquet_fragments(ent_dir), None) is None:
        import pyarrow as pa

        out = pa.table(
            {"label": pa.array([], "string"), "n_mentions": pa.array([], "int64")}
        )
        pq.write_table(out, os.path.join(lc_dir, "label_counts.parquet"))
    elif total <= 2_000_000:
        import pyarrow.dataset as pads

        tab = pads.dataset(ent_dir).to_table(columns=["label", "n_mentions"])
        out = tab.group_by(["label"]).aggregate([("n_mentions", "sum")])
        out = out.rename_columns(["label", "n_mentions"])
        pq.write_table(out, os.path.join(lc_dir, "label_counts.parquet"))
    else:
        import ray.data as rd

        label_counts_from_entities(rd.read_parquet(ent_dir)).write_parquet(lc_dir)


# Types for the empty-corpus fallback schema in _read_mentions (matches
# explode_mentions / detect_triples output types).
_MENTION_TYPES = {
    "surface": "string",
    "surface_norm": "string",
    "label": "string",
    "pred": "string",
    "subj": "string",
    "obj": "string",
    "doc_id": "string",
    "url": "string",
    "lang": "string",
    "start": "int64",
    "end": "int64",
    "pid": "int32",
}


def _read_mentions(path: str, columns: list[str] | None, *, subj_col: str = "url"):
    """Pruned ``read_parquet`` that tolerates an EMPTY mention/triple
    directory: a corpus where the gazetteer matches nothing writes zero
    parquet files, and a plain read would fail schema inference. Returns an
    empty in-memory dataset with the expected column types instead."""
    import pyarrow as pa
    import ray.data as rd

    if next(_parquet_fragments(path), None) is not None:
        return rd.read_parquet(path, columns=columns)
    if columns is None:
        columns = [subj_col, "label", "start", "end", "surface", "surface_norm"]
    empty = pa.table(
        {c: pa.array([], type=_MENTION_TYPES.get(c, "string")) for c in columns}
    )
    return rd.from_arrow(empty)


def _parquet_fragments(path: str):
    import pyarrow.parquet as pq

    for root, _dirs, fns in os.walk(path):
        for fn in fns:
            if fn.endswith(".parquet"):
                yield pq.ParquetFile(os.path.join(root, fn))
