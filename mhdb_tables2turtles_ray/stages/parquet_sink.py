"""Resumable hash-partitioned Parquet (or JSONL) sink.

The Parquet counterpart of the Turtle materializer: ONE all-to-all on
``hash(key) % num_partitions``, one atomic file + lineage manifest per
partition (temp-write → rename → manifest last, exactly the
``state/manifest.py`` protocol), and resume that filters finished
partitions out BEFORE the shuffle so completed work costs nothing on a
rerun. Never one giant file — a failed 10^12-row job rewrites only its
missing partitions.

``file_format="jsonl"`` swaps the per-partition serialization for
newline-delimited JSON (the LLM-training interchange format) under the
SAME shuffle/manifest/resume machinery — partition bytes stay a pure
function of the partition's row set, so the determinism and resume
guarantees carry over unchanged. JSONL requires JSON-serializable
columns (strings, numbers, lists — not binary).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.manifest import completed_partitions, finalize_partition_atomic

_PID = "__pid"
_EXT = ".parquet"


def _write_jsonl(df: pd.DataFrame, path: str) -> None:
    """One JSON object per row via the stdlib encoder: floats serialize
    as shortest round-trip repr (LOSSLESS — pandas ``to_json`` caps at
    15 significant digits, which silently corrupts the last ulps of a
    float64), NaN/None become JSON null, numpy scalars and arrays
    coerce to native types. Deterministic byte output for a given row
    order."""
    import json

    def _san(v):
        # recursive: a NaN INSIDE a list/ndarray (embedding columns)
        # must also become null, or the shard is invalid JSON that
        # pyarrow read_json rejects
        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, (float, np.floating)):
            f = float(v)
            return None if f != f else f
        if isinstance(v, np.ndarray):
            return [_san(x) for x in v.tolist()]
        if isinstance(v, (list, tuple)):
            return [_san(x) for x in v]
        if isinstance(v, dict):
            return {k: _san(x) for k, x in v.items()}
        return v

    def default(o):
        s = _san(o)
        if s is o:
            raise TypeError(f"not JSON-serializable: {type(o).__name__}")
        return s

    with open(path, "w", encoding="utf-8") as f:
        for rec in df.to_dict(orient="records"):
            clean = {k: _san(v) for k, v in rec.items()}
            f.write(json.dumps(clean, ensure_ascii=False, default=default))
            f.write("\n")


def write_partitioned_parquet(
    ds,
    out_dir: str,
    key_col: str,
    num_partitions: int = 64,
    resume: bool = True,
    identity_key: bool = False,
    sort_within: list[str] | None = None,
    drop_cols: list[str] | None = None,
    file_format: str = "parquet",
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
    written file after sorting.

    ``file_format``: ``"parquet"`` (default) or ``"jsonl"`` (one JSON
    object per row, ``.jsonl`` shard files; floats serialize as
    shortest round-trip repr — lossless AND byte-deterministic). The
    two formats may not share a directory (manifest namespace guard)."""
    if file_format not in ("parquet", "jsonl"):
        raise ValueError(f"file_format must be parquet/jsonl, got {file_format!r}")
    ext = _EXT if file_format == "parquet" else ".jsonl"
    os.makedirs(out_dir, exist_ok=True)
    # manifests are named part-{pid}.json regardless of data extension,
    # so writing format B into a directory of completed format-A shards
    # would silently overwrite A's manifests (invalidating valid data
    # with no error on the later read) — refuse loudly instead
    import glob as _glob

    other_ext = ".jsonl" if file_format == "parquet" else _EXT
    conflicting = _glob.glob(os.path.join(out_dir, f"part-*{other_ext}"))
    if conflicting:
        raise ValueError(
            f"{out_dir} already holds {other_ext} shards "
            f"({len(conflicting)} files); writing {ext} shards would "
            "overwrite their manifests — use a separate directory per format"
        )
    done = (
        completed_partitions(out_dir, num_partitions, ext=ext) if resume else set()
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
        pid = int(part[_PID].iloc[0])
        if sort_within:
            part = part.sort_values(sort_within, kind="mergesort")
        out = part.drop(columns=[_PID, *(drop_cols or [])])
        tmp = os.path.join(out_dir, f".tmp-part-{pid:05d}.{os.getpid()}")
        if file_format == "parquet":
            import pyarrow.parquet as pq

            table = pa.Table.from_pandas(out, preserve_index=False)
            pq.write_table(table, tmp)
            n_rows = table.num_rows
        else:
            _write_jsonl(out, tmp)
            n_rows = len(out)
        manifest = finalize_partition_atomic(
            out_dir, pid, tmp, {"rows": n_rows, "key": key_col}, ext
        )
        return pd.DataFrame(
            {"pid": [pid], "rows": [n_rows], "sha256": [manifest["sha256"]]}
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
    if empty and file_format == "jsonl":
        # an empty JSONL shard is an empty file — no schema needed
        for pid in empty:
            tmp = os.path.join(out_dir, f".tmp-part-{pid:05d}.{os.getpid()}")
            with open(tmp, "wb"):
                pass
            finalize_partition_atomic(
                out_dir, pid, tmp, {"rows": 0, "key": key_col}, ext
            )
            written.add(pid)
        empty = []
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


def write_range_partitioned_parquet(
    ds,
    out_dir: str,
    key_col: str,
    num_partitions: int = 64,
    resume: bool = True,
    file_format: str = "parquet",
    boundaries=None,
) -> dict:
    """GLOBALLY SORTED partitioned output: partition ``i`` holds the
    ``key_col`` range (b_{i-1}, b_i], every file is locally sorted on
    ``key_col``, so reading part-00000..part-NNNNN in order streams the
    whole dataset in key order — the range-partitioning counterpart of
    the hash sink above (hash co-locates a key; range additionally
    ORDERS the files, the layout a binary-searchable or merge-joinable
    artifact needs).

    NO global sort runs: the range boundaries are the key's exact
    ``1/num_partitions`` quantiles (``stages/quantiles.py`` — fixed-size
    histogram exchanges, a factor-``bins`` narrowing per pass), each row
    then maps to its range with one ``searchsorted`` per batch, and the
    per-partition local sort happens inside the partition task. That is
    the same boundaries-then-local-sort shape a distributed sort uses,
    but with exact boundaries (no sampling skew) and the resumable
    atomic-manifest write fused onto the exchange. Numeric keys only
    (the quantile stage's domain); skewed keys yield uneven ranges but
    identical ordering guarantees — boundaries land ON the repeated
    value, so a >1/num_partitions point mass concentrates its partition
    the same way any range partitioner must.

    Returns the hash-sink summary dict plus ``boundaries`` (the
    ``num_partitions - 1`` upper bounds). Same manifests, resume and
    ``file_format`` semantics as :func:`write_partitioned_parquet`.

    Pass ``boundaries`` (``num_partitions - 1`` non-decreasing floats —
    typically another range export's returned boundaries) to skip the
    quantile passes and CO-PARTITION this dataset with an existing one:
    partition ``i`` of both exports then holds the same key range,
    which is exactly what :func:`co_partitioned_join` needs to join the
    two without any exchange.

    The export's structural parameters (key, partition count,
    boundaries, format) are pinned in ``_range_meta.json`` at creation
    — the same immutability protocol as the persisted dedup indexes'
    ``_index_meta.json``: a resumed run reuses the pinned boundaries
    (no quantile re-scan — completed work costs nothing), a rerun with
    DIFFERENT params raises instead of silently mixing range layouts,
    and :func:`co_partitioned_join` verifies both sides against their
    metas rather than trusting the caller."""
    if boundaries is not None:
        boundaries = np.asarray(boundaries, dtype=np.float64)
        if len(boundaries) != num_partitions - 1:
            raise ValueError(
                f"boundaries must have num_partitions-1 = {num_partitions - 1} "
                f"entries, got {len(boundaries)}"
            )
        if np.any(np.diff(boundaries) < 0):
            raise ValueError("boundaries must be non-decreasing")

    meta_path = os.path.join(out_dir, "_range_meta.json")
    meta = None
    if os.path.exists(meta_path):
        import json

        with open(meta_path) as f:
            meta = json.load(f)
        for name, got, want in (
            ("key", meta["key"], key_col),
            ("num_partitions", meta["num_partitions"], num_partitions),
            ("file_format", meta["file_format"], file_format),
        ):
            if got != want:
                raise ValueError(
                    f"{out_dir} is a range export with {name}={got!r}; "
                    f"rerun requested {name}={want!r} — structural params "
                    "are pinned at creation (use a fresh directory)"
                )
        pinned = np.asarray(meta["boundaries"], dtype=np.float64)
        if boundaries is not None and not np.array_equal(pinned, boundaries):
            raise ValueError(
                f"{out_dir} pins different boundaries than the ones passed "
                "— co-partitioned layouts are immutable at creation"
            )
        boundaries = pinned  # resume: no quantile re-scan
    elif boundaries is None:
        from .quantiles import exact_float_quantiles

        qs = tuple(i / num_partitions for i in range(1, num_partitions))
        cuts = exact_float_quantiles(ds.select_columns([key_col]), key_col, qs)
        boundaries = np.array([cuts[q] for q in qs], dtype=np.float64)

    if meta is None:
        # pin BEFORE the data write: a killed run resumes under the
        # same boundaries instead of recomputing (possibly different)
        # quantiles over changed input. link()-based publish-or-EEXIST
        # (the _index_meta protocol, pipelines/dedup.py): a concurrent
        # first-writer with DIFFERENT params must raise, not last-wins
        # its meta over partitions assigned under the other layout.
        import json

        os.makedirs(out_dir, exist_ok=True)
        tmp = meta_path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "key": key_col,
                    "num_partitions": num_partitions,
                    "boundaries": boundaries.tolist(),
                    "file_format": file_format,
                },
                f,
            )
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, meta_path)  # atomic publish-or-EEXIST
        except FileExistsError:
            with open(meta_path) as f:
                winner = json.load(f)
            if (
                winner["key"] != key_col
                or winner["num_partitions"] != num_partitions
                or winner["file_format"] != file_format
                or not np.array_equal(
                    np.asarray(winner["boundaries"], dtype=np.float64),
                    boundaries,
                )
            ):
                os.unlink(tmp)
                raise ValueError(
                    f"{out_dir}: a concurrent writer pinned a DIFFERENT "
                    "range layout — structural params are immutable at "
                    "creation (use a fresh directory)"
                )
        os.unlink(tmp)

    _RANGE = "__range"

    def add_range(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        v = df[key_col].to_numpy().astype(np.float64)
        df[_RANGE] = np.searchsorted(boundaries, v, side="left").astype(np.int64)
        return df

    summary = write_partitioned_parquet(
        ds.map_batches(add_range, batch_format="pandas"),
        out_dir,
        _RANGE,
        num_partitions=num_partitions,
        resume=resume,
        identity_key=True,
        sort_within=[key_col],
        drop_cols=[_RANGE],
        file_format=file_format,
    )
    summary["boundaries"] = boundaries.tolist()
    return summary


def _load_range_meta(d: str) -> dict:
    import json

    meta_path = os.path.join(d, "_range_meta.json")
    if not os.path.exists(meta_path):
        raise ValueError(
            f"{d} has no _range_meta.json — not a range export "
            "(co_partitioned_join only joins range-partitioned outputs)"
        )
    with open(meta_path) as f:
        return json.load(f)


def co_partitioned_join(
    dir_a: str,
    dir_b: str,
    on: str,
    how: str = "inner",
    suffixes: tuple[str, str] = ("_a", "_b"),
):
    """Join two range exports that share boundaries — ZERO exchange.

    Both directories must be complete :func:`write_range_partitioned_parquet`
    outputs over the SAME boundaries (write the second with
    ``boundaries=first_summary["boundaries"]``). Then partition ``i`` of
    A can only match partition ``i`` of B, so the join is one
    independent task per partition pair — a Dataset over partition ids
    whose map stage reads the two part files and pandas-merges them
    locally. Nothing shuffles, nothing broadcasts; the at-scale cost is
    exactly the two partition reads per task. This is the payoff of
    range co-partitioning: the same join as ``shuffle_join`` with the
    all-to-all amortized into the (resumable, reusable) exports.

    Nothing here is trusted from the caller: both sides' pinned
    ``_range_meta.json`` must exist, agree on boundaries, key (= ``on``)
    and parquet format, and every pinned partition must be complete
    (manifest-gated) — mismatched layouts or a half-written export
    raise instead of joining silently wrong. ``how``: pandas merge
    semantics; non-key column collisions take ``suffixes``."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data

    from ..state.manifest import data_path

    ma, mb = _load_range_meta(dir_a), _load_range_meta(dir_b)
    for d, m in ((dir_a, ma), (dir_b, mb)):
        if m["key"] != on:
            raise ValueError(
                f"{d} is range-partitioned on {m['key']!r}, not the join "
                f"key {on!r} — only the range key co-locates matches"
            )
        if m["file_format"] != "parquet":
            raise ValueError(
                f"{d} is a {m['file_format']} export; co_partitioned_join "
                "reads parquet range exports"
            )
    if ma["boundaries"] != mb["boundaries"] or (
        ma["num_partitions"] != mb["num_partitions"]
    ):
        raise ValueError(
            f"{dir_a} and {dir_b} pin different range layouts "
            f"({ma['num_partitions']} vs {mb['num_partitions']} partitions"
            ") — write the second export with boundaries="
            "first_summary['boundaries']"
        )
    num_partitions = int(ma["num_partitions"])

    # completeness check is PRESENCE-level (manifest parses + data file
    # exists) — sha256-verifying every partition would serially read
    # both exports in full on the driver before any join task runs,
    # doubling the documented two-reads-per-task cost; a corrupt file
    # still fails loudly inside its join task's parquet read
    from ..state.manifest import partition_present

    for d in (dir_a, dir_b):
        missing = [
            p for p in range(num_partitions)
            if not partition_present(d, p, ext=_EXT)
        ]
        if missing:
            raise ValueError(
                f"{d} is not a complete {num_partitions}-partition range "
                f"export (missing/invalid partitions {missing[:8]}...) — "
                "resume the write first"
            )

    pids = ray.data.from_items(
        [{"pid": p} for p in range(num_partitions)]
    ).repartition(num_partitions)

    def join_pair(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for pid in batch["pid"].tolist():
            a = pq.read_table(data_path(dir_a, int(pid), _EXT)).to_pandas()
            b = pq.read_table(data_path(dir_b, int(pid), _EXT)).to_pandas()
            outs.append(a.merge(b, on=on, how=how, suffixes=suffixes))
        return pd.concat(outs, ignore_index=True)

    return pids.map_batches(join_pair, batch_format="pandas")


def read_range_partitioned(
    out_dir: str,
    lo: float | None = None,
    hi: float | None = None,
):
    """Read back a range export, PRUNED to the partitions whose key
    range intersects ``[lo, hi]`` (either side open with ``None``) —
    the I/O payoff of the sorted layout: a point or band lookup over a
    10^12-row export reads O(1) files, not the dataset. Pruning is
    resolved from the pinned ``_range_meta.json`` boundaries with two
    ``searchsorted`` calls; the returned Dataset is the pruned
    partitions' rows (each file already sorted on the key — callers
    still filter exact endpoints, this prunes FILES). Validation is
    pruned AND presence-level: only the partitions the band touches are
    checked, and the check is manifest-parses + data-file-exists — a
    sha256 sweep would read every pruned byte on the driver before
    ``read_parquet`` reads it again (the same cost rule as
    :func:`co_partitioned_join`; a corrupt file still fails loudly
    inside its read task). A pruned-to partition that is missing raises
    rather than silently returning a hole."""
    import ray.data

    from ..state.manifest import data_path, partition_present

    meta = _load_range_meta(out_dir)
    if meta["file_format"] != "parquet":
        raise ValueError(
            f"{out_dir} is a {meta['file_format']} export; "
            "read_range_partitioned reads parquet"
        )
    n = int(meta["num_partitions"])
    bounds = np.asarray(meta["boundaries"], dtype=np.float64)
    if lo is not None and hi is not None and lo > hi:
        # uniform contract: an inverted range is an error even when both
        # endpoints fall inside ONE partition (where the searchsorted
        # arithmetic alone would quietly return that file)
        raise ValueError(f"empty key range [{lo}, {hi}] — lo exceeds hi")
    # partition i holds (b_{i-1}, b_i]: the first partition that can
    # contain values >= lo, and the last that can contain values <= hi
    first = 0 if lo is None else int(np.searchsorted(bounds, lo, side="left"))
    last = n - 1 if hi is None else int(np.searchsorted(bounds, hi, side="left"))
    pids = list(range(first, min(last, n - 1) + 1))

    missing = [p for p in pids if not partition_present(out_dir, p, ext=_EXT)]
    if missing:
        raise ValueError(
            f"{out_dir}: partitions {missing[:8]} in the requested range "
            "are missing/invalid — resume the write first"
        )
    return ray.data.read_parquet([data_path(out_dir, p, _EXT) for p in pids])
