"""Deterministic seeded training shards — global-shuffle semantics
without a global order dependency.

A training-data loader wants the corpus split into N shards whose
concatenation in (shard, position) order is a pseudo-random permutation
of the corpus, reproducible from (seed, n_shards) alone. The classic
implementation is ``random_shuffle()`` + ``repartition(N)`` — a full
random exchange whose output depends on execution order. Here the
permutation is a PURE FUNCTION of each row's id:

    hk    = md5(f"{seed}:{id}")          # cross-engine 'random' key
    shard = int(hk[:8], 16) % n_shards   # balanced in expectation
    pos   = rank of (hk, id) within the shard

so the assignment needs no coordination at all (one embarrassingly
parallel ``map_batches``), the within-shard order needs only a LOCAL
per-shard sort (each shard is ~|corpus| / n_shards — size n_shards so a
shard fits a worker, exactly the file-size rule every training-shard
layout already follows), and two runs — at ANY cluster size or block
layout — produce byte-identical shards. Reshuffling between epochs is a
seed change, not a data move you have to trust.

md5 is the same cross-engine key used by ``rel_events_sample``
(DuckDB's ``md5`` matches hashlib's hex), which makes the whole
permutation SQL-checkable: the ``text_shard_assign`` oracle recomputes
shard and pos in DuckDB via ``'0x' || substr(md5(..), 1, 8)``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data

from ..sources.tables import read_table

_HK = "__shard_hk"
_SHARD = "__shard"


def _seeded_hex(ids, seed: int) -> list[str]:
    """md5 hex of ``f'{seed}:{id}'`` per id — the permutation key. The
    per-row hashlib loop runs over the (small) id column only, the same
    no-vector-kernel-exists trade as ``text_fingerprint``."""
    return [
        hashlib.md5(f"{seed}:{i}".encode("utf-8")).hexdigest() for i in ids
    ]


def _assign_cols(df: pd.DataFrame, id_col: str, seed: int, n_shards: int):
    hks = _seeded_hex(df[id_col].tolist(), seed)
    shards = np.fromiter(
        (int(h[:8], 16) % n_shards for h in hks), np.int64, len(hks)
    )
    return hks, shards


def _with_permutation_cols(
    df: pd.DataFrame, id_col: str, seed: int, n_shards: int, shard_col: str
) -> pd.DataFrame:
    """Attach the permutation key (``_HK``) and shard assignment to a
    batch — the ONE place the seeded-permutation columns are built
    (shard_assign / write_training_shards / pack_sequences all ride
    this; a key-scheme change lands everywhere at once)."""
    df = df.copy(deep=False)
    hks, shards = _assign_cols(df, id_col, seed, n_shards)
    df[_HK] = hks
    df[shard_col] = shards
    return df


def shard_assign(
    sf_dir: str, n_shards: int = 8, seed: int = 42
) -> ray.data.Dataset:
    """(doc_id, shard, pos) for every document — the seeded permutation
    as a queryable table. ``pos`` is 1-based within its shard, ordered
    by (hk, doc_id); reading shards 0..N-1 each in pos order replays
    one fixed pseudo-random pass over the corpus."""
    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def add(df: pd.DataFrame) -> pd.DataFrame:
        return _with_permutation_cols(df, "doc_id", seed, n_shards, "shard")

    def rank(part: pd.DataFrame) -> pd.DataFrame:
        # one whole shard per group: local sort by the permutation key
        part = part.sort_values([_HK, "doc_id"], kind="mergesort")
        return pd.DataFrame(
            {
                "doc_id": part["doc_id"].to_numpy(),
                "shard": part["shard"].to_numpy(),
                "pos": np.arange(1, len(part) + 1, dtype=np.int64),
            }
        )

    return (
        ds.map_batches(add, batch_format="pandas")
        .groupby("shard")
        .map_groups(rank, batch_format="pandas")
    )


def write_training_shards(
    ds: ray.data.Dataset,
    out_dir: str,
    id_col: str = "doc_id",
    n_shards: int = 64,
    seed: int = 42,
    resume: bool = True,
    file_format: str = "parquet",
) -> dict:
    """Write ``ds`` as ``n_shards`` seeded-permutation shards under
    ``out_dir`` (atomic file + manifest per shard, the
    ``state/manifest.py`` protocol). Rows inside each shard file are
    sorted by the permutation key, so shard bytes are a pure function
    of (row set, seed, n_shards): a resumed run — or a rerun on a
    different cluster size — reproduces the exact same files, and
    resume skips finished shards BEFORE the one shard exchange.
    ``file_format="jsonl"`` writes newline-delimited JSON shards (the
    LLM-training interchange format) with identical determinism/resume
    semantics."""
    from ..stages.parquet_sink import write_partitioned_parquet

    def add(df: pd.DataFrame) -> pd.DataFrame:
        return _with_permutation_cols(df, id_col, seed, n_shards, _SHARD)

    return write_partitioned_parquet(
        ds.map_batches(add, batch_format="pandas"),
        out_dir,
        _SHARD,
        num_partitions=n_shards,
        resume=resume,
        identity_key=True,
        sort_within=[_HK, id_col],
        drop_cols=[_HK, _SHARD],
        file_format=file_format,
    )


def pack_sequences(
    sf_dir: str, budget: int = 256, n_shards: int = 8, seed: int = 42
) -> ray.data.Dataset:
    """Greedy fixed-token-budget sequence packing — the step between a
    curated corpus and a training loader: each shard's seeded
    permutation stream (the :func:`shard_assign` order) is chunked into
    sequences of at most ``budget`` whitespace tokens, docs kept whole,
    a doc longer than the budget forming its own sequence. Output per
    doc: ``(doc_id, shard, seq, n_tokens)`` with ``seq`` 1-based per
    shard — concatenating a shard's docs in (seq, position) order
    replays the permutation in trainer-ready chunks.

    The at-scale shape: token counts are ONE vectorized Arrow regex
    pass and the ``text`` column is dropped BEFORE the shard exchange
    (the shuffle carries three int64 columns and a 32-char key, not the
    corpus); packing itself is per-shard — a local sort plus one
    ``searchsorted`` per EMITTED SEQUENCE over the cumulative token sum
    (O(#sequences) vectorized steps, no per-doc Python loop). Greedy
    reset-on-overflow is inherently sequential, which is exactly why it
    rides the already-partitioned shard stream instead of a global
    order. The oracle replays the same greedy rule as a recursive CTE
    (``rel_events_rollup``'s registry entry documents the levels
    trick; here recursion depth = docs per shard)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def count_tokens(batch: pa.Table) -> pa.Table:
        # null text counts as 0 tokens BY RULE (the curate.py
        # fused_filter convention) — without the coalesce, one null doc
        # would NaN-poison the shard's cumulative sum and misassign
        # every later seq in that shard
        text = pc.coalesce(batch.column("text"), "")
        n = pc.count_substring_regex(text, r"\S+")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pc.cast(n, pa.int64()),
            }
        )

    def add(df: pd.DataFrame) -> pd.DataFrame:
        return _with_permutation_cols(df, "doc_id", seed, n_shards, "shard")

    def pack(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values([_HK, "doc_id"], kind="mergesort")
        tok = part["n_tokens"].to_numpy()
        cum = np.cumsum(tok)
        seq = np.empty(len(tok), np.int64)
        start, base, s = 0, 0, 0
        while start < len(tok):
            s += 1
            # last doc whose running total still fits the budget; a
            # doc alone over budget is forced through as its own bin
            j = int(np.searchsorted(cum, base + budget, side="right"))
            if j <= start:
                j = start + 1
            seq[start:j] = s
            base = int(cum[j - 1])
            start = j
        return pd.DataFrame(
            {
                "doc_id": part["doc_id"].to_numpy(),
                "shard": part["shard"].to_numpy(),
                "seq": seq,
                "n_tokens": tok,
            }
        )

    return (
        ds.map_batches(count_tokens, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add, batch_format="pandas")
        .groupby("shard")
        .map_groups(pack, batch_format="pandas")
    )


def stratified_sample(
    sf_dir: str, k: int = 25, seed: int = 42
) -> ray.data.Dataset:
    """Deterministic seeded stratified sample: the ``k`` docs per
    ``lang`` stratum with the smallest md5 permutation key — the
    "give me a reproducible eval slice with every language present"
    query. Output ``(lang, doc_id, rk)``, ``rk`` 1-based within the
    stratum; two runs at ANY cluster size or block layout return the
    identical sample, and a different seed is a different sample with
    zero data movement beyond the same bounded merge.

    The at-scale shape is partial top-k before the shuffle: each batch
    keeps at most ``k`` rows per stratum (one vectorized sort +
    ``groupby.head``), so the exchange carries ≤ strata × #batches × k
    rows regardless of corpus size, and the per-stratum final merge
    sees ≤ #batches × k rows — the :func:`detect_hot_keys` fixed-size
    partial discipline applied to sampling."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return _smallest_k_partial(df, "lang", "doc_id", k, seed)

    def final(part: pd.DataFrame) -> pd.DataFrame:
        part = _smallest_k_merge(part, "doc_id", k)
        return pd.DataFrame(
            {
                "lang": part["lang"].to_numpy(),
                "doc_id": part["doc_id"].to_numpy(),
                "rk": np.arange(1, len(part) + 1, dtype=np.int64),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
    )


def _smallest_k_partial(
    df: pd.DataFrame, stratum_col: str, id_col: str, k: int, seed: int
) -> pd.DataFrame:
    """Per-batch partial of the seeded smallest-k rule: md5 permutation
    key, stable (hk, id) order, ``head(k)`` per stratum. ONE home for
    the selection rule — :func:`stratified_sample` and
    :func:`cap_per_stratum` both ride it, so the shared SQL
    row_number-over-md5 oracle can never diverge between them."""
    df = df[[stratum_col, id_col]].copy(deep=False)
    df[_HK] = _seeded_hex(df[id_col].tolist(), seed)
    df = df.sort_values([_HK, id_col], kind="mergesort")
    return df.groupby(stratum_col, sort=False).head(k)


def _smallest_k_merge(
    part: pd.DataFrame, id_col: str, k: int
) -> pd.DataFrame:
    """Final merge of one stratum's partials: same (hk, id) order,
    global ``head(k)``."""
    return part.sort_values([_HK, id_col], kind="mergesort").head(k)


def cap_per_stratum(
    ds: ray.data.Dataset,
    stratum_col: str,
    k: int,
    seed: int = 42,
    id_col: str = "doc_id",
    num_buckets: int = 256,
) -> ray.data.Dataset:
    """(stratum, id) of the ≤ ``k`` rows per stratum with the smallest
    md5 permutation key — the per-source/per-domain document cap every
    web corpus applies (an over-crawled domain must not dominate the
    training mix). Same deterministic smallest-k rule as
    :func:`stratified_sample` (two runs at any cluster size pick the
    identical survivors; a different seed is a fresh draw), but built
    for UNBOUNDED stratum cardinality: web-scale source domains number
    in the millions, so the final per-stratum merge rides the
    coarse-bucketed ``sorted_bucket_map`` (256-way hash-bucket shuffle,
    then the per-stratum head(k) is ONE ``cumcount() < k`` mask over
    the (stratum, hk, id)-sorted bucket) instead of a fine-key
    ``groupby().map_groups`` whose per-group overhead would dominate.
    The exchange still carries only the per-batch partial top-k rows
    (≤ strata-per-batch × #batches × k), never the corpus.

    Rows with a NULL stratum are dropped (by the partial's pandas
    groupby) — a doc with no source carries no quota
    evidence; keep-them semantics belong to the caller via fill_null
    upstream."""
    if k < 1:
        raise ValueError(f"cap k must be >= 1, got {k}")
    from ..stages.grouped import sorted_bucket_map

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return _smallest_k_partial(df, stratum_col, id_col, k, seed)

    def final_bucket(part: pd.DataFrame) -> pd.DataFrame:
        # sorted by (stratum, hk, id): per-stratum head(k) — the
        # _smallest_k_merge rule — is one cumcount mask over the bucket
        keep = part.groupby(stratum_col, sort=False).cumcount() < k
        return part.loc[keep, [stratum_col, id_col]]

    return sorted_bucket_map(
        ds.map_batches(partial, batch_format="pandas"),
        stratum_col,
        [_HK, id_col],
        final_bucket,
        num_buckets=num_buckets,
    )


def resample_corpus(
    sf_dir: str,
    weights: dict[str, float],
    seed: int = 42,
    default_weight: float = 1.0,
) -> ray.data.Dataset:
    """(doc_id, lang, copy) — deterministic weighted resampling, the
    data-mixing step of a training pipeline (down-weight an
    over-represented language, up-weight a scarce one, "temperature"
    rebalancing). Each document's stratum weight ``w = weights.get(lang,
    default_weight)`` yields ``floor(w)`` full copies plus one more iff
    ``frac(w) > u(doc)``, where ``u = int(md5(f"{seed}:{doc_id}")[:8],
    16) / 2^32`` — the same cross-engine md5 'random' used by the shard
    permutation, so expectation equals the weight exactly while the
    realized sample is a PURE per-row function: no coordination, no
    shuffle, byte-identical at any cluster size or block layout, and a
    rerun with a new seed is a fresh draw. ``copy`` numbers a doc's
    replicas 0..r-1 so downstream shard assignment can separate them
    (e.g. key the permutation on (doc_id, copy)).

    Emits ids only (join text back downstream) — at 100 TB the resample
    decision should never move document payloads that are about to be
    dropped."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    wmap = _validate_weights(weights, default_weight)

    def rep(df: pd.DataFrame) -> pd.DataFrame:
        return resample_batch(df, wmap, default_weight, seed)

    return ds.map_batches(rep, batch_format="pandas")


def _validate_weights(weights: dict[str, float], default_weight: float):
    wmap = {k: float(v) for k, v in weights.items()}
    for lang, w in wmap.items():
        if w < 0:
            raise ValueError(f"negative weight for {lang!r}: {w}")
    if default_weight < 0:
        raise ValueError(f"negative default_weight: {default_weight}")
    return wmap


def resample_batch(
    df: pd.DataFrame,
    wmap: dict[str, float],
    default_weight: float,
    seed: int,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
) -> pd.DataFrame:
    """The :func:`resample_corpus` rule applied to ONE batch, keeping
    every input column: floor(w) copies + md5-threshold fractional
    copy, ``copy`` numbering each row's replicas 0..r-1. Pure per-row
    function — composable inline on a text-bearing dataset so the mix
    step adds ZERO joins/shuffles (``curate.prepare_training_data``)."""
    hks = _seeded_hex(df[id_col].tolist(), seed)
    u = np.fromiter(
        (int(h[:8], 16) for h in hks), np.float64, len(hks)
    ) / 2.0**32
    w = (
        df[stratum_col]
        .map(lambda l: wmap.get(l, default_weight))
        .to_numpy(dtype=np.float64)
    )
    base = np.floor(w)
    reps = (base + (w - base > u)).astype(np.int64)
    idx = np.repeat(np.arange(len(df)), reps)
    out = df.iloc[idx].reset_index(drop=True)
    # within-row replica index 0..r-1: global position minus the
    # first position of each row's run
    starts = np.cumsum(reps) - reps
    out["copy"] = np.arange(len(out), dtype=np.int64) - np.repeat(
        starts, reps
    )
    return out
