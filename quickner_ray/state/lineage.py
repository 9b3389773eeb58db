"""Per-partition lineage manifests — the checkpoint/resume substrate.

The reference has no checkpointing (single in-memory process). The north
rule requires a killed run to restart from the last completed partition.
Design (SURVEY.md §4 "Checkpoint / resume"):

- Work is split into deterministic shards (a pure function of the input file
  list — never of scheduling), each writing to ``<out>/<stage>/shard=NNNNN/``.
- After a shard's output is fully written, a manifest JSON is written
  ATOMICALLY (tmp file + rename) at ``<out>/_lineage/<stage>/shard-NNNNN.json``
  recording input refs, row counts, config/gazetteer hashes and wall time.
- On restart, ``shard_complete`` skips shards whose manifest exists AND
  matches the current inputs+config hash; stale/partial outputs are
  re-written (rerun overwrites the shard dir first).
"""

from __future__ import annotations

import json
import os
import shutil
import time


def _manifest_path(out_dir: str, stage: str, shard: int) -> str:
    return os.path.join(out_dir, "_lineage", stage, f"shard-{shard:05d}.json")


def write_manifest(
    out_dir: str,
    stage: str,
    shard: int,
    *,
    inputs: list[str],
    rows: int,
    fingerprint: str,
    extra: dict | None = None,
) -> str:
    path = _manifest_path(out_dir, stage, shard)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {
        "stage": stage,
        "shard": shard,
        "inputs": inputs,
        "rows": rows,
        "fingerprint": fingerprint,
        "completed_at": time.time(),
        **(extra or {}),
    }
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)  # atomic publish
    return path


def read_manifest(out_dir: str, stage: str, shard: int) -> dict | None:
    path = _manifest_path(out_dir, stage, shard)
    if not os.path.exists(path):
        return None
    try:
        with open(path, encoding="utf-8") as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def shard_complete(
    out_dir: str, stage: str, shard: int, *, inputs: list[str], fingerprint: str
) -> bool:
    m = read_manifest(out_dir, stage, shard)
    return (
        m is not None
        and m.get("inputs") == inputs
        and m.get("fingerprint") == fingerprint
    )


def reset_shard_dir(path: str) -> None:
    """Clear a (possibly partial) shard output dir before re-writing."""
    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
