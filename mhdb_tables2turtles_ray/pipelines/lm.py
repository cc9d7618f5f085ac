"""Corpus-trained n-gram language-model perplexity scoring.

The classic statistical quality filter for web-scale training data
(CCNet / Gopher style): train a bigram LM on a reference corpus, score
every document by per-token perplexity, drop the tail. No external
model — the LM is the corpus's own bigram count tables, built with the
engine's streaming primitives, so the operator works at any corpus
size:

- **Counting** rides the coarse-bucketed reduction
  (``stages/grouped.py:bucketed_agg`` shape): per-batch ``np.unique``
  partials, a 256-value shuffle sort, one vectorized pandas sum per
  bucket — never a fine-key distributed sort over the bigram domain.
- **Scoring** attaches counts to each document's bigrams via
  ``stages/shuffle_join.auto_join`` — the count tables broadcast while
  they fit and degrade to a hash-shuffle join above the threshold, so
  a 100M-row bigram table never ships per task.
- Bigram keys are NUMERIC combinations of per-token 64-bit hashes
  (``h1*P ^ h2`` on wrapping uint64), not concatenated strings — the
  object-string window concat was measured 7x slower at 100M+ windows
  (see ``dedup._batch_token_windows``'s count-phase history).

Probabilities use add-alpha smoothing over the context row:
``P(w2|w1) = (c(w1 w2) + a) / (c(w1) + a*V)`` with ``V`` = distinct
token count of the training corpus; a document's perplexity is
``exp(-sum(log P) / n_bigrams)``. Unseen bigrams/contexts (scoring a
corpus the LM was not trained on) fall back to the smoothed floor via
left joins, never a KeyError. Tokenization is the text family's shared
helper (``text._flat_tokens``, lowercased) — same token stream as
token_counts/BM25, so scores compose with the rest of the funnel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..sources.tables import read_table

_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def _bigram_rows(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(row_idx, bigram_hash, context_hash) for every in-row adjacent
    lowercased token pair of the batch; one Arrow split, no per-row
    Python."""
    import pyarrow.compute as pc

    from .dedup import _stable_hash64
    from .text import _flat_tokens

    flat, parents = _flat_tokens(batch.column("text"))
    h = _stable_hash64(
        pc.utf8_lower(flat).to_numpy(zero_copy_only=False)
    ).astype(np.uint64)
    if len(h) < 2:
        e = np.empty(0, dtype=np.int64)
        return e, e, e
    valid = parents[:-1] == parents[1:]
    h1, h2 = h[:-1][valid], h[1:][valid]
    bh = ((h1 * _MIX) ^ h2).view(np.int64)
    return parents[:-1][valid], bh, h1.view(np.int64)


def train_bigram_lm(
    sf_dir: str, ds: ray.data.Dataset | None = None
) -> dict:
    """Bigram count tables + vocabulary size from a corpus, in ONE
    corpus scan.

    The scan emits a combined tagged partial per batch — unigram
    (kind 0, for the vocabulary) and bigram (kind 1, carrying the
    context hash) ``np.unique`` counts — which materializes at
    count-table size, not corpus size. Everything else derives from
    that partial set without touching the corpus again: bigram totals
    by coarse-bucket reduction (the context hash rides along — it is a
    pure function of the bigram, so "first per bigram" is exact, not a
    choice), context totals by re-summing the BIGRAM table over the
    carried context hash (``c(w1) = Σ_w2 c(w1 w2)`` — a second-order
    reduction over the distinct-bigram domain, corpus never re-read),
    and the vocabulary size by distinct-count of the unigram rows.
    At 100 TB the corpus read is the dominant cost; 1 scan vs 3 is the
    whole point of the tagged partial.

    Returns ``{"bigrams": Dataset[bh, n], "contexts": Dataset[uh, n],
    "vocab_size": int, "n_bigrams": int}``. The count Datasets are
    materialized (consumed once per scored corpus, sized by the
    DISTINCT bigram/unigram domain); only the two scalars ever reach
    the driver."""
    import pyarrow.compute as pc

    if ds is None:
        ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    num_buckets = 256

    def tagged_partial(batch: pa.Table) -> pa.Table:
        from .dedup import _stable_hash64
        from .text import _flat_tokens

        flat, parents = _flat_tokens(batch.column("text"))
        h = _stable_hash64(
            pc.utf8_lower(flat).to_numpy(zero_copy_only=False)
        ).astype(np.uint64)
        uk_uni, c_uni = np.unique(h.view(np.int64), return_counts=True)
        if len(h) >= 2:
            valid = parents[:-1] == parents[1:]
            h1, h2 = h[:-1][valid], h[1:][valid]
            bh = ((h1 * _MIX) ^ h2).view(np.int64)
            uk_big, first, c_big = np.unique(
                bh, return_index=True, return_counts=True
            )
            uh_big = h1[first].view(np.int64)
        else:
            uk_big = np.empty(0, np.int64)
            c_big = np.empty(0, np.int64)
            uh_big = np.empty(0, np.int64)
        key = np.concatenate([uk_uni, uk_big])
        return pa.table(
            {
                "kind": pa.array(
                    np.repeat(
                        np.array([0, 1], np.int64),
                        [len(uk_uni), len(uk_big)],
                    ),
                    pa.int64(),
                ),
                "key": pa.array(key, pa.int64()),
                "uh": pa.array(
                    np.concatenate(
                        [np.zeros(len(uk_uni), np.int64), uh_big]
                    ),
                    pa.int64(),
                ),
                "n": pa.array(
                    np.concatenate([c_uni, c_big]), pa.int64()
                ),
                "b": pa.array(
                    (key.view(np.uint64) % np.uint64(num_buckets)).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
            }
        )

    combined = ds.map_batches(
        tagged_partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # count-table-sized; consumed by ONE fused reduction

    # ONE bucketed reduction answers all three questions at once —
    # bigram totals (kind 1 rows out), per-bucket distinct-unigram
    # counts (kind 0) and per-bucket bigram-token totals (kind 2) —
    # instead of three separate sort executions over the same partials.
    # At sf0.1 the per-execution fixed cost (~0.25 s each) dominated
    # this whole operator; at 100 TB the fold is still strictly fewer
    # passes over the count tables.
    def fused_reduce(part: pd.DataFrame) -> pd.DataFrame:
        uni = part[part["kind"] == 0]
        big = part[part["kind"] == 1]
        g = big.groupby("key", sort=False).agg(
            n=("n", "sum"), uh=("uh", "first")
        )
        return pd.concat(
            [
                pd.DataFrame(
                    {
                        "kind": np.ones(len(g), np.int64),
                        "bh": g.index.to_numpy(),
                        "uh": g["uh"].to_numpy(),
                        "n": g["n"].to_numpy(),
                    }
                ),
                pd.DataFrame(
                    {
                        "kind": np.array([0, 2], np.int64),
                        "bh": np.zeros(2, np.int64),
                        "uh": np.zeros(2, np.int64),
                        "n": np.array(
                            [uni["key"].nunique(), g["n"].sum()], np.int64
                        ),
                    }
                ),
            ],
            ignore_index=True,
        )

    fused = (
        combined.groupby("b")
        .map_groups(fused_reduce, batch_format="pandas")
        .materialize()
    )

    def only(kind: int, cols: list[str]):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t.column("kind"), kind)).select(cols)

        return f

    # driver sees 2 rows per bucket, never a count table
    stats = fused.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("kind"), 1)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    vocab_size = sum(r["n"] for r in stats if r["kind"] == 0)
    n_bigrams = sum(r["n"] for r in stats if r["kind"] == 2)

    from ..stages.grouped import bucketed_agg

    bigrams_full = fused.map_batches(
        only(1, ["bh", "uh", "n"]), batch_format="pyarrow", zero_copy_batch=True
    )
    contexts = bucketed_agg(bigrams_full, "uh", "n", how="sum").materialize()

    # lazy select off the materialized fused result — auto_join
    # materializes its right side anyway, so a second eager materialize
    # here would just pay one more execution
    bigrams = fused.map_batches(
        only(1, ["bh", "n"]), batch_format="pyarrow", zero_copy_batch=True
    )
    return {
        "bigrams": bigrams,
        "contexts": contexts,
        "vocab_size": int(vocab_size),
        "n_bigrams": int(n_bigrams),
    }


def score_perplexity(
    sf_dir: str,
    alpha: float = 0.1,
    lm: dict | None = None,
    ds: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """(doc_id, n_bigrams, ppl) — per-token bigram perplexity of every
    document under ``lm`` (default: an LM trained on the same corpus,
    the self-scoring CCNet shape). Documents with < 2 tokens have no
    bigrams: ``n_bigrams = 0`` and a null ``ppl``.

    Both count attachments are LEFT ``auto_join``s with a zero fill,
    so scoring a corpus the LM never saw degrades to the smoothed
    floor ``a / (c(w1) + a*V)`` (unseen bigram) or ``1/V`` (unseen
    context) instead of failing."""
    if ds is None:
        ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    if lm is None:
        lm = train_bigram_lm(sf_dir, ds=ds)
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0 (smoothing floor), got {alpha}")
    V = lm["vocab_size"]

    from ..stages.shuffle_join import auto_join

    def explode(batch: pa.Table) -> pa.Table:
        ridx, bh, uh = _bigram_rows(batch)
        doc_ids = batch.column("doc_id").to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[ridx], pa.int64()),
                "bh": pa.array(bh, pa.int64()),
                "uh": pa.array(uh, pa.int64()),
            }
        )

    pairs = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    with_c2 = auto_join(
        pairs,
        lm["bigrams"].map_batches(
            lambda t: t.rename_columns(["bh", "c2"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        on="bh",
        left_cols=["doc_id", "uh"],
        right_cols=["c2"],
        how="left",
    )
    with_c1 = auto_join(
        with_c2,
        lm["contexts"].map_batches(
            lambda t: t.rename_columns(["uh", "c1"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        on="uh",
        left_cols=["doc_id", "c2"],
        right_cols=["c1"],
        how="left",
    )

    def logprob(batch: pa.Table) -> pa.Table:
        c2 = np.nan_to_num(
            batch.column("c2").to_numpy(zero_copy_only=False).astype(np.float64)
        )
        c1 = np.nan_to_num(
            batch.column("c1").to_numpy(zero_copy_only=False).astype(np.float64)
        )
        lp = np.log(c2 + alpha) - np.log(c1 + alpha * V)
        uk, inv = np.unique(
            batch.column("doc_id").to_numpy(), return_inverse=True
        )
        return pa.table(
            {
                "doc_id": pa.array(uk, pa.int64()),
                "s": pa.array(np.bincount(inv, weights=lp), pa.float64()),
                "n": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "b": pa.array(
                    (uk.view(np.uint64) % np.uint64(256)).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    def bucket_finish(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("doc_id", sort=False).agg(
            s=("s", "sum"), n=("n", "sum")
        )
        n = g["n"].to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            ppl = np.where(
                n > 0, np.exp(-g["s"].to_numpy() / np.maximum(n, 1)), np.nan
            )
        return pd.DataFrame(
            {
                "doc_id": g.index.to_numpy(),
                "n_bigrams": n,
                "ppl": ppl,
            }
        )

    # Docs with < 2 tokens never emit a bigram row. Instead of a whole
    # re-attach join at the end (two extra executions — measured to be
    # a third of this operator's wall time at sf0.1), every input doc
    # contributes a ZERO partial (s=0.0, n=0) into the SAME bucket
    # reduction: coverage is total by construction, and adding 0.0
    # terms to an IEEE sum chain is bit-exact (x + 0.0 == x), so the
    # scored values are unchanged.
    def id_markers(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "s": pa.array(np.zeros(len(ids), np.float64), pa.float64()),
                "n": pa.array(np.zeros(len(ids), np.int64), pa.int64()),
                "b": pa.array(
                    (ids.view(np.uint64) % np.uint64(256)).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    partials = with_c1.map_batches(
        logprob, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        ds.map_batches(id_markers, batch_format="pyarrow", zero_copy_batch=True)
    )
    scored = partials.groupby("b").map_groups(
        bucket_finish, batch_format="pandas"
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # a no-bigram doc's ppl is NaN from the numpy path — normalize
        # to a real Arrow null (the hash gate distinguishes them)
        ppl = batch.column("ppl")
        if pa.types.is_floating(ppl.type):
            ppl = pc.if_else(pc.is_nan(ppl), pa.scalar(None, ppl.type), ppl)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bigrams": pc.cast(batch.column("n_bigrams"), pa.int64()),
                "ppl": pc.cast(ppl, pa.float64()),
            }
        )

    return scored.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
