"""CLI entrypoint — the ``ray job submit`` surface (north rule).

    ray job submit -- python -m quickner_ray \\
        --input /data/pages --out /data/kg_out \\
        --gazetteer /data/entities.csv --shards 64 [--resume-only]

Re-running the same command after a kill resumes from the last completed
shard (state/lineage.py manifests). This script OWNS its Ray session when
run standalone; under ``ray job submit`` the cluster address comes from the
environment.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="quickner_ray")
    ap.add_argument("--input", required=True, help="pages parquet file or directory")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument(
        "--gazetteer",
        required=True,
        help="entities CSV (name,label header, reference S2 format)",
    )
    ap.add_argument("--shards", type=int, default=None)
    ap.add_argument("--source", choices=["html", "text"], default="html")
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--shard-parallelism", type=int, default=1)
    ap.add_argument("--case-sensitive", action="store_true")
    ap.add_argument("--dedup", action="store_true", help="exact-dedup before detection")
    ap.add_argument(
        "--annotated",
        action="store_true",
        help="also write reference-shaped annotated docs (slower two-pass layout)",
    )
    ap.add_argument("--build-indexes", action="store_true")
    ap.add_argument(
        "--export-format",
        choices=["jsonl", "csv", "spacy", "brat", "conll"],
        default=None,
        help="also stream the annotated docs out as reference-format part "
        "files (implies --annotated)",
    )
    ap.add_argument(
        "--export-dir",
        default=None,
        help="directory for --export-format parts (default <out>/export)",
    )
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # respects RAY_ADDRESS (set by `ray job submit` / this sandbox)
        ray.init(ignore_reinit_error=True, include_dashboard=False)

    from quickner_ray.kernel.automaton import Gazetteer
    from quickner_ray.pipelines.kg import KGPipelineConfig, run_kg
    from quickner_ray.sources.csv_sources import read_entities_csv

    entities = read_entities_csv(args.gazetteer)
    gaz = Gazetteer(entities, case_sensitive=args.case_sensitive)
    cfg = KGPipelineConfig(
        source=args.source,
        case_sensitive=args.case_sensitive,
        dedup=args.dedup,
        batch_size=args.batch_size,
        write_annotated=args.annotated or args.export_format is not None,
        shard_parallelism=args.shard_parallelism,
    )
    metrics = run_kg(
        args.input, gaz, args.out, cfg, shards=args.shards,
        build_indexes=args.build_indexes,
    )
    if args.export_format:
        import os

        import ray.data as rd

        from quickner_ray.sinks.distributed import write_annotations_dataset

        ann_dir = os.path.join(args.out, "annotated")
        export_dir = args.export_dir or os.path.join(args.out, "export")
        manifest = write_annotations_dataset(
            rd.read_parquet(ann_dir), export_dir, format=args.export_format
        ).take_all()
        metrics["export_parts"] = len(manifest)
        metrics["export_rows"] = int(sum(m["rows"] for m in manifest))
    print(json.dumps(metrics))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
