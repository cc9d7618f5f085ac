"""Persisted term-partitioned inverted index + partition-pruned BM25.

The lexical-retrieval analogue of the cluster-partitioned IVF storage
path (``similarity.py:build_ivf_index``): :func:`bm25_score` re-scans
the whole corpus per query, which is the right shape for one-off
scoring but wrong for a served retrieval workload. Here the corpus is
tokenized ONCE into posting rows ``(term, doc_id, tf, dl)`` written
through the resumable hash-partitioned parquet sink keyed on ``term``
— every term's complete posting list lives in exactly one partition
file — so a probe reads ONLY the ``|query terms|`` matching partition
files (I/O pruning, not a post-read filter): at 100 TB that is
``len(terms)/num_partitions`` of the index bytes instead of the whole
corpus per query. Posting rows are denormalized with the document
length ``dl`` (classic posting-list design) so scoring needs no join
back to the corpus; document frequency needs no stored vocabulary
table either, because a term's ``df`` is simply its row count inside
its own partition. Structural params are pinned in
``_index_meta.json``; corpus-level stats (n_docs, total_tokens) are
persisted atomically alongside.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.numeric import round_half_away
from ..sources.tables import read_table

_STATS_FILE = "_corpus_stats.json"


def _postings(batch: pa.Table) -> pa.Table:
    """(term, doc_id, tf, dl) rows for one batch — one Arrow lower +
    split pass, per-(term, doc) counts via Arrow's own hash group-by
    (no per-row Python)."""
    from .text import _flat_tokens

    flat, parents = _flat_tokens(pc.utf8_lower(batch.column("text")))
    n = len(batch)
    dl = np.bincount(parents, minlength=n).astype(np.int64)
    doc_ids = batch.column("doc_id").to_numpy()
    g = (
        pa.table({"term": flat, "r": pa.array(parents, pa.int64())})
        .group_by(["term", "r"])
        .aggregate([("r", "count")])
    )
    r = g.column("r").to_numpy()
    return pa.table(
        {
            "term": g.column("term"),
            "doc_id": pa.array(doc_ids[r], pa.int64()),
            "tf": pa.array(g.column("r_count").to_numpy(), pa.int64()),
            "dl": pa.array(dl[r], pa.int64()),
        }
    )


def build_text_index(
    sf_dir: str,
    index_dir: str,
    num_partitions: int = 64,
    ds: ray.data.Dataset | None = None,
) -> dict:
    """Build (or resume) the inverted index; returns the corpus stats
    dict ``{n_docs, total_tokens, num_partitions}``.

    Two streaming passes: a fixed-one-row-per-batch stats pass (the
    driver merges scalars, never rows), then the posting pass through
    :func:`stages.parquet_sink.write_partitioned_parquet` hash-keyed
    on ``term`` — the same vectorized siphash the probe uses to locate
    a term's partition (``stages/semijoin.py:hash_strings``). The sink
    is resumable: a crashed build skips finished partitions on rerun.
    ``num_partitions`` is pinned in ``_index_meta.json`` — probing
    with a different value would read the wrong files, so a later
    mismatch raises instead."""
    from .dedup import _index_meta
    from ..stages.parquet_sink import write_partitioned_parquet

    _index_meta(
        index_dir, {"kind": "bm25_inverted", "num_partitions": num_partitions}
    )
    if ds is None:
        ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    stats_path = os.path.join(index_dir, _STATS_FILE)
    if os.path.exists(stats_path):
        with open(stats_path) as f:
            stats = json.load(f)
    else:

        def stats_partial(batch: pa.Table) -> pa.Table:
            from .text import _flat_tokens

            _, parents = _flat_tokens(batch.column("text"))
            return pa.table(
                {
                    "n_docs": pa.array([len(batch)], pa.int64()),
                    "total_tokens": pa.array([len(parents)], pa.int64()),
                }
            )

        n_docs = total_tokens = 0
        parts = ds.map_batches(
            stats_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        for bt in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
            n_docs += int(pc.sum(bt.column("n_docs")).as_py())
            total_tokens += int(pc.sum(bt.column("total_tokens")).as_py())
        stats = {
            "n_docs": n_docs,
            "total_tokens": total_tokens,
            "num_partitions": num_partitions,
        }
        # atomic publish AFTER the pass completes — a crash mid-build
        # leaves no stats file, so the resume recomputes instead of
        # trusting a partial count
        tmp = f"{stats_path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(stats, f)
        os.replace(tmp, stats_path)

    postings = ds.map_batches(
        _postings, batch_format="pyarrow", zero_copy_batch=True
    )
    write_partitioned_parquet(
        postings, index_dir, "term", num_partitions=num_partitions
    )
    return stats


def bm25_probe(
    index_dir: str, query: str, k1: float = 1.2, b: float = 0.75
) -> ray.data.Dataset:
    """(doc_id, score) — BM25 against a :func:`build_text_index` index,
    reading ONLY the query terms' partition files.

    Two streaming passes over the pruned read (|terms| files of
    ``num_partitions``): a fixed-size df pass (one row per batch — a
    term's df is its row count, since each (term, doc) pair is one
    posting row and a term's whole posting list is in one partition),
    then a pure scoring map whose only shuffle is the final
    ``groupby(doc_id)`` over matching (doc, term) rows. Scores use the
    same Lucene idf and rounding boundary as :func:`text.bm25_score`;
    results match it on any corpus (same doc set, scores equal up to
    float summation order under the 6-decimal rounding)."""
    import ray

    from ..stages.semijoin import hash_strings
    from ..state.manifest import completed_partitions, data_path

    terms = sorted({t for t in query.lower().split() if t})
    if not terms:
        raise ValueError("query has no terms")
    # read-only meta load: the probe must never CLAIM creation of a
    # meta file (that is the builder's job) — probing a path that was
    # never built is an error, not an index birth
    meta_path = os.path.join(index_dir, "_index_meta.json")
    if not os.path.exists(meta_path):
        raise ValueError(f"no inverted index at {index_dir} — build it first")
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("kind") != "bm25_inverted":
        raise ValueError(
            f"index at {index_dir} is kind={meta.get('kind')!r}, "
            "not a bm25_inverted index"
        )
    num_partitions = meta["num_partitions"]
    with open(os.path.join(index_dir, _STATS_FILE)) as f:
        stats = json.load(f)
    n_docs, total_tokens = stats["n_docs"], stats["total_tokens"]
    empty = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "score": pa.array([], pa.float64())}
        )
    )
    if n_docs == 0:
        return empty

    term_arr = np.asarray(terms, dtype=object)
    pids = sorted(set((hash_strings(term_arr) % num_partitions).tolist()))
    done = completed_partitions(index_dir, num_partitions, ext=".parquet")
    missing = [p for p in pids if p not in done]
    if missing:
        # a complete index has a manifest for every partition (empty
        # ones included) — silently skipping would drop matching docs
        raise ValueError(
            f"inverted index at {index_dir} is missing/corrupt partition "
            f"file(s) {missing} — rebuild the index"
        )
    paths = [data_path(index_dir, p, ".parquet") for p in pids]
    tset = pa.array(terms, pa.string())

    def matching(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("term"), value_set=tset))

    pruned = ray.data.read_parquet(paths).map_batches(
        matching, batch_format="pyarrow", zero_copy_batch=True
    )

    # pass 1: df per term — fixed one row per batch, driver merges ints
    def df_partial(batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch.column("term"), value_set=tset).to_numpy(
            zero_copy_only=False
        )
        counts = np.bincount(idx.astype(np.int64), minlength=len(terms))
        return pa.table(
            {f"df_{i}": pa.array([int(c)], pa.int64())
             for i, c in enumerate(counts)}
        )

    df = np.zeros(len(terms), dtype=np.int64)
    for bt in pruned.map_batches(
        df_partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        for i in range(len(terms)):
            df[i] += int(pc.sum(bt.column(f"df_{i}")).as_py())
    if int(df.sum()) == 0:
        return empty
    avgdl = total_tokens / n_docs
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    idf_ref = ray.put(idf)

    # pass 2: pure scoring map; the groupby carries only matching rows
    def contrib(batch: pa.Table) -> pa.Table:
        w = ray.get(idf_ref)
        idx = pc.index_in(batch.column("term"), value_set=tset).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        tf = batch.column("tf").to_numpy().astype(np.float64)
        dl = batch.column("dl").to_numpy().astype(np.float64)
        c = w[idx] * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "contrib": pa.array(c, pa.float64())}
        )

    from ..stages.grouped import bucketed_agg

    scored = bucketed_agg(
        pruned.map_batches(contrib, batch_format="pyarrow", zero_copy_batch=True),
        "doc_id",
        "contrib",
        how="sum",
        out="sum(contrib)",
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "score": pa.array(
                    round_half_away(
                        batch.column("sum(contrib)").to_numpy(), 6
                    ),
                    pa.float64(),
                ),
            }
        )

    return scored.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def default_text_index_dir(sf_dir: str, num_partitions: int) -> str:
    """Deterministic per-(input, params) cache path under /tmp (same
    fingerprint discipline as ``similarity._default_index_dir`` — data
    regenerated at the same path gets a fresh index, not stale
    postings)."""
    import hashlib

    doc = os.path.join(sf_dir, "documents.parquet")
    try:
        st = os.stat(doc)
        fp = f"{st.st_mtime_ns}-{st.st_size}"
    except OSError:
        fp = "nofile"
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{fp}".encode("utf-8")
    ).hexdigest()[:12]
    return os.path.join(
        "/tmp", f"mhdb_lex_cache-{os.getuid()}", f"{key}-p{num_partitions}"
    )


def bm25_indexed(
    sf_dir: str,
    query: str = "hash join scan",
    num_partitions: int = 64,
    k1: float = 1.2,
    b: float = 0.75,
    index_dir: str | None = None,
) -> ray.data.Dataset:
    """Convenience: build-or-reuse the index for ``sf_dir`` (cached
    under /tmp keyed on the data fingerprint), then probe."""
    if index_dir is None:
        index_dir = default_text_index_dir(sf_dir, num_partitions)
    build_text_index(sf_dir, index_dir, num_partitions=num_partitions)
    return bm25_probe(index_dir, query, k1=k1, b=b)
