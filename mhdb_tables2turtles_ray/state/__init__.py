from .manifest import (
    completed_partitions,
    manifest_path,
    partition_done,
    write_partition_atomic,
)

__all__ = [
    "completed_partitions",
    "manifest_path",
    "partition_done",
    "write_partition_atomic",
]
