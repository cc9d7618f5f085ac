"""Resumable hash-partitioned Parquet sink.

The Parquet counterpart of the Turtle materializer: ONE all-to-all on
``hash(key) % num_partitions``, one atomic file + lineage manifest per
partition (temp-write → rename → manifest last, exactly the
``state/manifest.py`` protocol), and resume that filters finished
partitions out BEFORE the shuffle so completed work costs nothing on a
rerun. Never one giant file — a failed 10^12-row job rewrites only its
missing partitions.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.manifest import completed_partitions, finalize_partition_atomic

_PID = "__pid"
_EXT = ".parquet"


def write_partitioned_parquet(
    ds,
    out_dir: str,
    key_col: str,
    num_partitions: int = 64,
    resume: bool = True,
    identity_key: bool = False,
    sort_within: list[str] | None = None,
    drop_cols: list[str] | None = None,
) -> dict:
    """Write ``ds`` as ``num_partitions`` hash-partitioned parquet files
    under ``out_dir`` with per-partition manifests; returns a summary
    {written, skipped, n_rows}. Rows of one key always land in one
    partition (hash partitioning), so per-key consumers can read a
    single file.

    ``identity_key=True`` uses the key VALUE itself (mod
    ``num_partitions``) as the partition id instead of its hash — for
    integer keys that already ARE partition assignments (e.g. IVF
    cluster ids), so partition file ``i`` holds exactly key ``i``'s rows
    and a consumer can prune reads to specific keys' files.

    ``sort_within`` orders rows INSIDE each partition file by the named
    columns before writing (a per-partition local sort — never a global
    one), making file bytes a pure function of the partition's row SET;
    ``drop_cols`` removes transient columns (e.g. the sort key) from the
    written file after sorting."""
    os.makedirs(out_dir, exist_ok=True)
    done = (
        completed_partitions(out_dir, num_partitions, ext=_EXT) if resume else set()
    )
    pending = sorted(set(range(num_partitions)) - done)
    if not pending:
        return {"written": [], "skipped": sorted(done), "n_rows": 0}
    pending_arr = np.array(pending, dtype=np.int64)

    def add_pid(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        if identity_key:
            pid = (
                df[key_col].to_numpy().astype(np.int64) % num_partitions
            )
        else:
            pid = (
                pd.util.hash_array(df[key_col].to_numpy())
                % np.uint64(num_partitions)
            ).astype(np.int64)
        df[_PID] = pid
        # resume filter BEFORE the shuffle: finished partitions never move
        return df[np.isin(pid, pending_arr)]

    def write_part(part: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        pid = int(part[_PID].iloc[0])
        if sort_within:
            part = part.sort_values(sort_within, kind="mergesort")
        table = pa.Table.from_pandas(
            part.drop(columns=[_PID, *(drop_cols or [])]),
            preserve_index=False,
        )
        tmp = os.path.join(out_dir, f".tmp-part-{pid:05d}.{os.getpid()}")
        pq.write_table(table, tmp)
        manifest = finalize_partition_atomic(
            out_dir, pid, tmp, {"rows": table.num_rows, "key": key_col}, _EXT
        )
        return pd.DataFrame(
            {"pid": [pid], "rows": [table.num_rows], "sha256": [manifest["sha256"]]}
        )

    stats = (
        ds.map_batches(add_pid, batch_format="pandas")
        .groupby(_PID)
        .map_groups(write_part, batch_format="pandas")
        .take_all()
    )
    written = {int(s["pid"]) for s in stats}
    # a partition no key hashed into still needs its (empty) shard +
    # manifest, or resume would re-attempt it on every rerun
    empty = [p for p in pending if p not in written]
    if empty:
        import pyarrow.parquet as pq

        from ..state.manifest import data_path

        if written:
            # derive the shard schema from a part this run just wrote
            # (ds.schema() can be None after aggregates)
            schema = pq.read_schema(
                data_path(out_dir, next(iter(written)), _EXT)
            )
        else:
            ds_schema = ds.schema()
            if ds_schema is None:
                raise ValueError(
                    "dataset produced no rows and its schema is unknown — "
                    "cannot write empty partitions"
                )
            hidden = {_PID, *(drop_cols or [])}
            schema = pa.schema(
                [f for f in ds_schema.base_schema if f.name not in hidden]
            )
        empty_table = pa.table(
            {
                name: pa.array([], type_)
                for name, type_ in zip(schema.names, schema.types)
                if name not in {_PID, *(drop_cols or [])}
            }
        )
        for pid in empty:
            tmp = os.path.join(out_dir, f".tmp-part-{pid:05d}.{os.getpid()}")
            pq.write_table(empty_table, tmp)
            finalize_partition_atomic(
                out_dir, pid, tmp, {"rows": 0, "key": key_col}, _EXT
            )
            written.add(pid)
    return {
        "written": sorted(written),
        "skipped": sorted(done),
        "n_rows": int(sum(s["rows"] for s in stats)),
    }


def read_partitioned_parquet(out_dir: str, num_partitions: int):
    """Read back every completed partition as one Dataset (validates
    manifests — a partition with a missing/corrupt manifest is NOT
    read; callers resume the write first)."""
    import ray.data

    from ..state.manifest import data_path

    done = completed_partitions(out_dir, num_partitions, ext=_EXT)
    paths = [data_path(out_dir, p, _EXT) for p in sorted(done)]
    return ray.data.read_parquet(paths)
