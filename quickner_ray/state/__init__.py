from .lineage import (
    read_manifest,
    reset_shard_dir,
    shard_complete,
    write_manifest,
)

__all__ = ["read_manifest", "reset_shard_dir", "shard_complete", "write_manifest"]
