"""Text-analysis operators over the ``documents`` table.

Large-scale training-data pipeline staples: token counting, quality
scoring, language identification, document fingerprinting, train/test
decontamination. The per-doc analyses are single-pass ``map_batches``
stages — no shuffle, fully streaming — with vectorized pyarrow/numpy
kernels where the kernel exists and tight per-batch Python only for
the set-membership scoring. :func:`decontaminate` is the exception by
design: two passes over the corpus (a driver-blocking test-side filter
build, then the streaming train-side probe), still shuffle-free.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..sources.tables import read_table
from ..stages.sketch import mg_compress

_TOKEN_RE = re.compile(r"\S+")
_WS_RE = re.compile(r"\s+")


def _flat_tokens(text_col):
    """THE tokenization of the text family, in one place: null → "",
    whitespace split (Arrow RE2 — no lookarounds, so exact-token work
    downstream is is_in/equal over the flat array, never a lookaround
    pattern), flatten, drop empty tokens. Returns ``(flat, parents)`` —
    the flattened token array and each token's row index — so callers
    bincount per-row stats and never loop rows. Every operator that
    counts or matches whitespace tokens MUST ride this helper: five
    independent copies of the split→flatten→filter block is how token
    semantics silently diverge."""
    toks = pc.split_pattern_regex(pc.coalesce(text_col, ""), r"\s+")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy()
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return pc.filter(flat, pa.array(keep)), parents[keep]


def whitespace_token_count(text_col) -> np.ndarray:
    """Per-row whitespace token count, int64 — THE count definition of
    the text family (null → "" by rule, one Arrow regex pass). Same
    single-home contract as :func:`_flat_tokens`: every operator that
    thresholds or distributes on token counts (curate funnel's quality
    filter and length cut, ``token_counts``) MUST ride this helper, or
    the definitions silently diverge."""
    text = pc.coalesce(text_col, "")
    return (
        pc.count_substring_regex(text, r"\S+")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )


def _marker_hits(text_col, value_sets: list[pa.Array]) -> list[np.ndarray]:
    """Per-row counts of tokens falling in each marker set, vectorized:
    one ``pc.is_in`` + ``np.bincount`` per set over the shared flat
    tokenization. Null texts contribute zero tokens."""
    flat, parents = _flat_tokens(text_col)
    n = len(text_col)
    return [
        np.bincount(
            parents,
            weights=pc.is_in(flat, value_set=vs).to_numpy(zero_copy_only=False),
            minlength=n,
        ).astype(np.int64)
        for vs in value_sets
    ]

# Marker (stopword) lists per language for the n-gram/stopword heuristic
# language ID. Deterministic priority tie-break: en > de > fr.
LANG_MARKERS = {
    "en": ("the", "a"),
    "de": ("der", "die", "das"),
    "fr": ("le", "la", "les"),
}

STOPWORDS = ("the", "a")


# GPT-2-style pre-tokenizer segments, RE2-safe (Arrow and DuckDB both
# run RE2 — no lookarounds, so the trailing-space alternates of the
# original GPT-2 pattern are dropped): optionally-space-prefixed letter
# runs, digit runs, and punctuation runs.
BPE_ISH_RE = r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def token_counts(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_tokens, n_subtokens) — whitespace tokenization plus a
    BPE-ish pre-tokenizer segment count (:data:`BPE_ISH_RE`), both as
    single vectorized Arrow regex passes."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def count(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n = whitespace_token_count(text)
        n_sub = pc.count_substring_regex(text, BPE_ISH_RE)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n, pa.int64()),
                "n_subtokens": pc.cast(n_sub, pa.int64()),
            }
        )

    return ds.map_batches(count, batch_format="pyarrow", zero_copy_batch=True)


def quality_scores(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_chars_text, n_tokens, stop_hits, stop_ratio,
    dup_token_frac, top_bigram_frac) — length/stopword-ratio quality
    signals plus the Gopher-style repetition signals (duplicated-token
    fraction; fraction of bigram positions taken by the single most
    frequent bigram). Fully vectorized: ONE Arrow split per batch feeds
    every stat (is_in+bincount for stopword hits, C-level pandas
    drop_duplicates/groupby for the distinct and mode counts, numpy
    shifted-window concat for bigrams)."""
    import pandas as pd

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    stop_set = pa.array(list(STOPWORDS), pa.string())

    def score(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n = len(text)
        toks = pc.split_pattern_regex(text, r"\s+")
        flat_pa = pc.list_flatten(toks)
        parents_all = pc.list_parent_indices(toks).to_numpy()
        stop_w = pc.is_in(flat_pa, value_set=stop_set).to_numpy(
            zero_copy_only=False
        )
        stop_hits = np.bincount(
            parents_all, weights=stop_w, minlength=n
        ).astype(np.int64)

        flat = flat_pa.to_numpy(zero_copy_only=False)
        keep = flat != ""  # match regexp_extract_all('\S+'): no empties
        flat, parents = flat[keep], parents_all[keep]
        n_tokens = np.bincount(parents, minlength=n).astype(np.int64)

        ratio = np.divide(
            stop_hits,
            n_tokens,
            out=np.zeros(n, dtype=np.float64),
            where=n_tokens > 0,
        )

        n_distinct = np.zeros(n, dtype=np.int64)
        if len(flat):
            nd = (
                pd.DataFrame({"p": parents, "t": flat})
                .drop_duplicates()
                .groupby("p", sort=False)
                .size()
            )
            n_distinct[nd.index.to_numpy()] = nd.to_numpy()
        dup_frac = np.divide(
            n_tokens - n_distinct,
            n_tokens,
            out=np.zeros(n, dtype=np.float64),
            where=n_tokens > 0,
        )

        top_frac = np.zeros(n, dtype=np.float64)
        if len(flat) >= 2:
            valid = parents[:-1] == parents[1:]
            if valid.any():
                bp = parents[:-1][valid]
                # object-dtype concat (see _batch_grams): fixed-width
                # np.char would inflate every slot to max token width
                bi = (flat[:-1] + " " + flat[1:])[valid]
                cnt = (
                    pd.DataFrame({"p": bp, "g": bi})
                    .groupby(["p", "g"], sort=False)
                    .size()
                )
                topc = cnt.groupby(level=0).max()
                top = np.zeros(n, dtype=np.int64)
                top[topc.index.to_numpy()] = topc.to_numpy()
                tot = np.bincount(bp, minlength=n)
                top_frac = np.divide(
                    top, tot, out=np.zeros(n, dtype=np.float64), where=tot > 0
                )

        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars_text": pc.cast(pc.utf8_length(text), pa.int64()),
                "n_tokens": pa.array(n_tokens),
                "stop_hits": pa.array(stop_hits),
                "stop_ratio": pa.array(ratio),
                "dup_token_frac": pa.array(dup_frac),
                "top_bigram_frac": pa.array(top_frac),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def lang_vote(text_col) -> np.ndarray:
    """Per-row language label ('en'/'de'/'fr'/'unknown') — the SINGLE
    home of the marker-vote rule (deterministic en > de > fr priority
    tie-break, zero hits → 'unknown'), shared by :func:`lang_id` and
    ``pipelines/curate.py`` so the vote can never silently diverge
    between the registry query and the curation filter."""
    sets = [pa.array(list(LANG_MARKERS[k]), pa.string()) for k in ("en", "de", "fr")]
    en, de, fr = _marker_hits(text_col, sets)
    return np.select(
        [
            (en >= de) & (en >= fr) & (en > 0),
            (de >= fr) & (de > 0),
            fr > 0,
        ],
        ["en", "de", "fr"],
        default="unknown",
    )


def lang_id(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, predicted_lang) — stopword-marker heuristic language ID
    (:func:`lang_vote`). Vectorized: one split, one is_in+bincount per
    language, numpy selects."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def predict(batch: pa.Table) -> pa.Table:
        out = lang_vote(batch.column("text"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "predicted_lang": pa.array(out.tolist(), pa.string()),
            }
        )

    return ds.map_batches(predict, batch_format="pyarrow", zero_copy_batch=True)


def lang_distribution(sf_dir: str) -> ray.data.Dataset:
    """(predicted_lang, n_docs) — corpus language mix from the lang_id
    heuristic; the monitoring aggregate a filtering pipeline watches.
    Partial per-batch counts → tiny final shuffle (≤ 4 rows/block)."""
    from ray.data.aggregate import Sum

    base = lang_id(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(["predicted_lang"]).aggregate(
            [("predicted_lang", "count")]
        )

    partials = base.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    final = partials.groupby("predicted_lang").aggregate(
        Sum("predicted_lang_count", alias_name="n_docs")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("n_docs"),
            "n_docs",
            pc.cast(batch.column("n_docs"), pa.int64()),
        )

    return final.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def fingerprints(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, fingerprint) — md5 of the whitespace-normalized,
    lowercased text (cross-engine-checkable canonical fingerprint)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        digests = [
            hashlib.md5(_WS_RE.sub(" ", t.lower()).encode("utf-8")).hexdigest()
            if t is not None
            else None
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "fingerprint": pa.array(digests)}
        )

    return ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)


# PII scrub patterns (RE2 on BOTH engines — pyarrow and DuckDB use RE2,
# so replacement semantics are identical and the value-hash gate holds).
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
)


def pii_scrub(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, clean_text, n_redactions) — regex redaction of
    email/phone/IPv4 shapes, the standard pre-training privacy pass.
    Fully vectorized (one RE2 replace + count per pattern per batch),
    single streamed pass, no shuffle."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def scrub(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        total = np.zeros(len(text), dtype=np.int64)
        for pattern, token in PII_PATTERNS:
            total += (
                pc.count_substring_regex(text, pattern)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            text = pc.replace_substring_regex(text, pattern, token)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "clean_text": text,
                "n_redactions": pa.array(total),
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True)


def top_tokens(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """(token, n) — the k most frequent whitespace tokens, deterministic
    tiebreak (count desc, token asc). Heavy-hitter shape: per-batch
    pyarrow group_by pre-aggregates before the (token-keyed, already
    tiny) shuffle, so the exchange carries one row per distinct token
    per block, never the corpus."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(batch.column("text"))
        t = pa.table({"token": flat})
        return t.group_by(["token"]).aggregate([("token", "count")])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    counts = partials.groupby("token").aggregate(Sum("token_count", alias_name="n"))

    def finish(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("n"), "n", pc.cast(batch.column("n"), pa.int64())
        )

    return (
        counts.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["n", "token"], descending=[True, False])
        .limit(k)
    )


def heavy_hitter_tokens(
    sf_dir: str, k: int = 20, capacity: int = 8192
) -> ray.data.Dataset:
    """(token, n) — exact top-k whitespace tokens computed WITHOUT a
    token-keyed shuffle. :func:`top_tokens`' groupby exchange carries
    one row per distinct token per block — fine for bounded vocabularies,
    but a 100-TB web corpus's distinct-token space (URLs, hashes, typos)
    is itself shuffle-sized. Here the exchange is FIXED-SIZE: per-batch
    Misra-Gries summaries (≤ ``capacity`` rows each, ``stages/sketch.py:
    mg_compress``) stream to the driver, which merges them into one
    summary whose keys are the candidate set; a second
    candidate-restricted pass (``pc.is_in`` against the ≤ capacity
    candidates, so its per-batch partials are also ≤ capacity rows)
    counts the candidates exactly. Total exchange: O(batches × capacity)
    regardless of vocabulary size, and two passes over the text.

    Guarantee (mergeable-summaries bound): any token with true count >
    total_tokens/(capacity+1) survives every compress, so the result
    equals the exact top-k whenever the k-th most frequent token clears
    that bound — pinned against :func:`top_tokens` in tests. Below the
    bound the top of the result is still exact for every token that made
    candidacy; nothing is silently extrapolated (counts come from the
    exact second pass, never from the sketch's decremented estimates)."""
    import pandas as pd

    ds = read_table(sf_dir, "documents", columns=["text"])

    def summarize(batch: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(batch.column("text"))
        t = pa.table({"token": flat}).group_by(["token"]).aggregate(
            [("token", "count")]
        )
        keys, counts = mg_compress(
            t.column("token").to_numpy(zero_copy_only=False),
            t.column("token_count").to_numpy().astype(np.int64),
            capacity,
        )
        return pa.table(
            {"token": pa.array(keys, pa.string()),
             "n": pa.array(counts, pa.int64())}
        )

    # streamed driver merge, one ≤capacity partial resident at a time
    acc = pd.Series(dtype=np.int64)
    parts = ds.map_batches(summarize, batch_format="pyarrow", zero_copy_batch=True)
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        s = pd.Series(
            b.column("n").to_numpy(), index=b.column("token").to_pylist()
        )
        # a duplicated index label would make Series.add keep BOTH rows
        # (not sum them) and corrupt every later merge — never assume a
        # yielded batch maps 1:1 to one summarize() output block
        s = s.groupby(level=0).sum()
        acc = acc.add(s, fill_value=0).astype(np.int64)
        if len(acc) > capacity:
            keys, counts = mg_compress(
                acc.index.to_numpy(), acc.to_numpy(), capacity
            )
            acc = pd.Series(counts, index=keys)
    candidates = pa.array(sorted(acc.index), pa.string())

    def count_candidates(batch: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(batch.column("text"))
        flat = pc.filter(flat, pc.is_in(flat, value_set=candidates))
        return pa.table({"token": flat}).group_by(["token"]).aggregate(
            [("token", "count")]
        )

    exact = pd.Series(dtype=np.int64)
    cparts = ds.map_batches(
        count_candidates, batch_format="pyarrow", zero_copy_batch=True
    )
    for b in cparts.iter_batches(batch_size=None, batch_format="pyarrow"):
        s = pd.Series(
            b.column("token_count").to_numpy().astype(np.int64),
            index=b.column("token").to_pylist(),
        )
        s = s.groupby(level=0).sum()  # same duplicate-label hazard
        exact = exact.add(s, fill_value=0).astype(np.int64)
    out = (
        pd.DataFrame({"token": exact.index, "n": exact.astype(np.int64)})
        .sort_values(["n", "token"], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    return ray.data.from_arrow(
        pa.table(
            {"token": pa.array(out["token"], pa.string()),
             "n": pa.array(out["n"], pa.int64())}
        )
    )


def bm25_score(
    sf_dir: str, query: str, k1: float = 1.2, b: float = 0.75
) -> ray.data.Dataset:
    """(doc_id, score) — Okapi BM25 relevance of every matching document
    against ``query`` (lowercased whitespace terms), the ranking-side
    complement of the embedding ANN family for lexical retrieval over a
    training corpus.

    Two passes, both scale-shaped. Pass 1 streams ONE fixed-size row per
    batch to the driver — (n_docs, total_tokens, df per query term); the
    exchange is O(batches × |query|), never the vocabulary (a full
    DF table would be a token shuffle — the point of query-restricted
    BM25 is that only the query's terms need document frequencies).
    Pass 2 is a pure map: per-batch vectorized term counts
    (``pc.equal`` + ``np.bincount`` per term over the flattened token
    list) score every doc against the broadcast (N, avgdl, df) stats;
    docs containing no query term are dropped. Scores use the Lucene
    idf form ``ln(1 + (N - df + 0.5)/(df + 0.5))`` and are rounded
    half-away to 6 decimals at the output boundary. Output is unsorted
    (streaming); compose with a sort().limit(k) for top-k retrieval."""
    from ..functions.numeric import round_half_away

    terms = sorted({t for t in query.lower().split() if t})
    if not terms:
        raise ValueError("query has no terms")
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def _doc_term_stats(batch: pa.Table):
        """(dl, tf_matrix) — per-doc token count and per-term counts."""
        flat, parents = _flat_tokens(pc.utf8_lower(batch.column("text")))
        n = len(batch)
        dl = np.bincount(parents, minlength=n).astype(np.int64)
        tf = np.empty((len(terms), n), dtype=np.int64)
        for i, t in enumerate(terms):
            hits = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            tf[i] = np.bincount(parents, weights=hits, minlength=n).astype(
                np.int64
            )
        return dl, tf

    def stats_partial(batch: pa.Table) -> pa.Table:
        dl, tf = _doc_term_stats(batch)
        cols = {
            "n_docs": pa.array([len(batch)], pa.int64()),
            "total_tokens": pa.array([int(dl.sum())], pa.int64()),
        }
        for i in range(len(terms)):
            cols[f"df_{i}"] = pa.array([int((tf[i] > 0).sum())], pa.int64())
        return pa.table(cols)

    n_docs, total_tokens = 0, 0
    df = np.zeros(len(terms), dtype=np.int64)
    parts = ds.map_batches(
        stats_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    for bt in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        n_docs += int(pc.sum(bt.column("n_docs")).as_py())
        total_tokens += int(pc.sum(bt.column("total_tokens")).as_py())
        for i in range(len(terms)):
            df[i] += int(pc.sum(bt.column(f"df_{i}")).as_py())
    if n_docs == 0:
        return ray.data.from_arrow(
            pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64())}
            )
        )
    avgdl = total_tokens / n_docs
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

    def score(batch: pa.Table) -> pa.Table:
        dl, tf = _doc_term_stats(batch)
        denom_dl = k1 * (1.0 - b + b * dl / avgdl)  # (n,)
        s = np.zeros(len(batch), dtype=np.float64)
        for i in range(len(terms)):
            tfi = tf[i].astype(np.float64)
            s += idf[i] * tfi * (k1 + 1.0) / (tfi + denom_dl)
        keep = tf.sum(axis=0) > 0
        return pa.table(
            {
                "doc_id": pc.filter(
                    batch.column("doc_id"), pa.array(keep)
                ),
                "score": pa.array(
                    round_half_away(s[keep], 6), pa.float64()
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def chunk_documents(
    sf_dir: str, max_tokens: int = 512, overlap: int = 64
) -> ray.data.Dataset:
    """(doc_id, chunk, n_tokens, text) — split every document into
    token windows of ≤ ``max_tokens`` with ``overlap`` tokens shared
    between consecutive windows (stride = max_tokens − overlap): the
    context-window chunking step before embedding or sequence packing.
    Chunk ``j`` of a doc covers token positions [j·stride, j·stride +
    max_tokens); the last chunk may be short; token-less docs emit no
    chunks.

    Pure per-batch map (no shuffle) and NO per-row Python: one Arrow
    split per batch, numpy computes each token's replica window (a
    token at position t belongs to chunks ⌈(t−max_tokens+1)/stride⌉ …
    ⌊t/stride⌋, clipped), ``np.repeat`` materializes the replicas, one
    stable argsort groups them by (doc, chunk), and
    ``pc.binary_join`` reassembles chunk texts from a rebuilt Arrow
    list array. Memory per batch is bounded by the replication factor
    max_tokens/stride (e.g. 512/448 ≈ 1.14× the token count) — size
    ``batch_size`` accordingly for huge documents."""
    if max_tokens <= 0 or overlap < 0 or overlap >= max_tokens:
        raise ValueError(
            f"need 0 <= overlap < max_tokens, got {overlap=}, {max_tokens=}"
        )
    stride = max_tokens - overlap
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def chunk(batch: pa.Table) -> pa.Table:
        flat, parents = _flat_tokens(batch.column("text"))
        n = len(batch)
        n_toks = np.bincount(parents, minlength=n).astype(np.int64)
        if len(parents) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "chunk": pa.array([], pa.int64()),
                 "n_tokens": pa.array([], pa.int64()),
                 "text": pa.array([], pa.string())}
            )
        # position of each token within its doc
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(n_toks[:-1], out=starts[1:])
        tpos = np.arange(len(parents), dtype=np.int64) - starts[parents]
        # chunk count per doc and each token's replica window
        n_chunks = np.where(
            n_toks > 0,
            1 + np.maximum(0, -(-(n_toks - max_tokens) // stride)),
            0,
        )
        j_lo = np.maximum(0, -(-(tpos - max_tokens + 1) // stride))
        j_hi = np.minimum(tpos // stride, n_chunks[parents] - 1)
        reps = (j_hi - j_lo + 1).astype(np.int64)
        rep_parents = np.repeat(parents, reps)
        rep_flat_idx = np.repeat(np.arange(len(parents)), reps)
        # within-replica offset via the cumsum-of-reps trick
        first = np.cumsum(reps) - reps
        rep_chunk = (
            np.repeat(j_lo, reps)
            + np.arange(reps.sum(), dtype=np.int64)
            - np.repeat(first, reps)
        )
        # group replicas by (doc, chunk) keeping token order (stable)
        order = np.lexsort((rep_flat_idx, rep_chunk, rep_parents))
        rep_parents, rep_chunk, rep_flat_idx = (
            rep_parents[order], rep_chunk[order], rep_flat_idx[order],
        )
        # chunk boundaries → Arrow list array → join
        boundary = np.empty(len(order), dtype=bool)
        boundary[0] = True
        boundary[1:] = (rep_parents[1:] != rep_parents[:-1]) | (
            rep_chunk[1:] != rep_chunk[:-1]
        )
        group_start = np.flatnonzero(boundary)
        offsets = np.append(group_start, len(order)).astype(np.int32)
        tokens = flat.combine_chunks() if isinstance(
            flat, pa.ChunkedArray
        ) else flat
        lists = pa.ListArray.from_arrays(
            pa.array(offsets), tokens.take(pa.array(rep_flat_idx))
        )
        return pa.table(
            {
                "doc_id": pc.take(
                    batch.column("doc_id"), pa.array(rep_parents[group_start])
                ),
                "chunk": pa.array(rep_chunk[group_start], pa.int64()),
                "n_tokens": pa.array(
                    np.diff(offsets).astype(np.int64), pa.int64()
                ),
                "text": pc.binary_join(lists, " "),
            }
        )

    return ds.map_batches(chunk, batch_format="pyarrow", zero_copy_batch=True)


def encode_documents(
    sf_dir: str, vocab_size: int = 32768
) -> tuple[ray.data.Dataset, "pa.Table"]:
    """(dataset, vocab) — frequency-vocabulary token-id encoding: the
    "tokenize the corpus" step of training-data prep, over the same
    whitespace tokens the rest of the text family uses.

    The vocabulary is the ``vocab_size`` most frequent tokens
    (:func:`top_tokens` — count desc, token asc, so ids are
    deterministic), id 1..V in rank order with id 0 reserved for UNK.
    The returned vocab table (token, id, n) is the decode side.

    Encoding is one pure vectorized pass: the vocab ships to workers
    ONCE via ``ray.put`` (broadcast, not per-batch closure re-ship),
    each batch does a single ``pc.index_in`` over its flattened tokens
    and rebuilds the doc-aligned list structure from the original
    offsets. Output rows: (doc_id, input_ids list<int32>, n_tokens,
    n_unk)."""
    import ray

    vocab_rows = top_tokens(sf_dir, k=vocab_size).take_all()
    vocab = pa.table(
        {
            "token": pa.array([r["token"] for r in vocab_rows], pa.string()),
            "id": pa.array(
                range(1, len(vocab_rows) + 1), pa.int32()
            ),
            "n": pa.array([r["n"] for r in vocab_rows], pa.int64()),
        }
    )
    vocab_ref = ray.put(vocab.column("token").combine_chunks())

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def encode(batch: pa.Table) -> pa.Table:
        tokens_in_rank_order = ray.get(vocab_ref)
        flat, parents = _flat_tokens(batch.column("text"))
        n = len(batch)
        # rank index (0-based) or null → +1 → null→0 (UNK)
        ids = pc.add(
            pc.cast(
                pc.index_in(flat, value_set=tokens_in_rank_order), pa.int32()
            ),
            np.int32(1),
        )
        n_unk = np.bincount(
            parents, weights=pc.is_null(ids).to_numpy(zero_copy_only=False),
            minlength=n,
        ).astype(np.int64)
        ids = pc.fill_null(ids, np.int32(0))
        counts = np.bincount(parents, minlength=n).astype(np.int64)
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(counts, out=offsets[1:])
        lists = pa.ListArray.from_arrays(
            pa.array(offsets),
            ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids,
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "input_ids": lists,
                "n_tokens": pa.array(counts, pa.int64()),
                "n_unk": pa.array(n_unk, pa.int64()),
            }
        )

    return (
        ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True),
        vocab,
    )


def length_histogram(sf_dir: str, bucket_chars: int = 100) -> ray.data.Dataset:
    """(bucket, n_docs) — document-length histogram (bucket = floor of
    char count / ``bucket_chars``). Partial per-batch combine; the final
    shuffle carries one row per bucket per block."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        n = pc.utf8_length(batch.column("text"))
        bucket = pc.cast(
            pc.floor(pc.divide(pc.cast(n, pa.float64()), float(bucket_chars))),
            pa.int64(),
        )
        t = pa.table({"bucket": bucket})
        return t.group_by(["bucket"]).aggregate([("bucket", "count")])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    final = partials.groupby("bucket").aggregate(Sum("bucket_count", alias_name="n_docs"))

    def finish(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("n_docs"),
            "n_docs",
            pc.cast(batch.column("n_docs"), pa.int64()),
        )

    return final.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


_WINNOW_MOD = (1 << 61) - 1
_WINNOW_BASE = 257


def _batch_grams(text_col, n: int) -> tuple[np.ndarray, np.ndarray]:
    """All whitespace-token ``n``-grams of every row, vectorized.

    Returns (row_index, gram) ndarrays: one Arrow lower+split pass,
    empty tokens dropped (so splitting matches DuckDB's
    ``regexp_extract_all('\\S+')`` exactly), then numpy shifted-window
    concatenation — no per-row Python. Grams never cross row boundaries
    (window positions whose start and end map to different parent rows
    are masked out)."""
    lowered = pc.utf8_lower(pc.coalesce(text_col, pa.scalar("", pa.string())))
    toks = pc.split_pattern_regex(lowered, r"\s+")
    flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    parents = pc.list_parent_indices(toks).to_numpy()
    keep = flat != ""
    flat, parents = flat[keep], parents[keep]
    L = len(flat)
    if L < n:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=object)
    valid = parents[: L - n + 1] == parents[n - 1 :]
    # object-dtype concat, NOT np.char on fixed-width unicode: a U array
    # sizes EVERY slot at (n × max token length), so one long unbroken
    # token (base64 blob, URL) would inflate the gram buffer to
    # positions × max_width × 4 bytes and OOM the worker; object arrays
    # pay only the actual string bytes.
    grams = flat[: L - n + 1]
    for j in range(1, n):
        grams = grams + " " + flat[j : L - n + 1 + j]
    return parents[: L - n + 1][valid].astype(np.int64), grams[valid]


def decontaminate_pair(
    train_ds: ray.data.Dataset,
    test_ds: ray.data.Dataset,
    n: int = 5,
    exact_threshold: int = 4_000_000,
) -> ray.data.Dataset:
    """Train/test decontamination core over two (doc_id, text)
    Datasets. Output (doc_id, n_hits): every train doc sharing at least
    one lowercased whitespace-token ``n``-gram with the test set, with
    the count of contaminated gram positions.

    Scale shape: the test side is the SMALL side by construction — its
    distinct grams build a broadcast key filter
    (``stages/semijoin.py:build_string_key_filter``: exact object-dtype
    strings under ``exact_threshold`` — the zero-false-positive,
    oracle-checkable representation — hashed Bloom partials streamed
    above it), and the train corpus streams through one vectorized
    membership pass. No shuffle touches either corpus."""
    if n < 1:
        # n=0 degenerates _batch_grams into matching any shared token
        # against the test set's LAST row — silent mass over-dropping
        raise ValueError(f"n-gram size must be >= 1, got {n}")
    import ray

    from ..stages.semijoin import build_string_key_filter, string_filter_contains

    def test_grams(batch: pa.Table) -> pa.Table:
        _, grams = _batch_grams(batch.column("text"), n)
        # per-batch dedup pre-shrinks what the filter build consumes
        return pa.table({"gram": pa.array(np.unique(grams).tolist(), pa.string())})

    gram_ds = test_ds.map_batches(
        test_grams, batch_format="pyarrow", zero_copy_batch=True
    )
    keys_ref = ray.put(
        build_string_key_filter(gram_ds, "gram", exact_threshold=exact_threshold)
    )

    def probe(batch: pa.Table) -> pa.Table:
        sub_ids = batch.column("doc_id").to_numpy()
        idx, grams = _batch_grams(batch.column("text"), n)
        hit = string_filter_contains(ray.get(keys_ref), grams)
        counts = np.bincount(
            idx[hit], minlength=len(sub_ids)
        ).astype(np.int64)
        nz = counts > 0
        return pa.table(
            {
                "doc_id": pa.array(sub_ids[nz], pa.int64()),
                "n_hits": pa.array(counts[nz], pa.int64()),
            }
        )

    return train_ds.map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True
    )


def decontaminate(
    sf_dir: str | None = None,
    n: int = 5,
    test_mod: int = 10,
    ds: ray.data.Dataset | None = None,
    exact_threshold: int = 4_000_000,
) -> ray.data.Dataset:
    """Registry surface of :func:`decontaminate_pair` — the benchmark-
    leakage staple, distinct from near-dup dedup (cross-SET containment
    at n-gram granularity, not within-set similarity). The TEST slice
    is ``doc_id % test_mod == 0``; everything else is TRAIN."""
    if ds is None:
        ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def part(test: bool):
        def fn(batch: pa.Table) -> pa.Table:
            dids = batch.column("doc_id").to_numpy()
            m = dids % test_mod == 0
            return batch.filter(pa.array(m if test else ~m))

        return fn

    train_ds = ds.map_batches(
        part(False), batch_format="pyarrow", zero_copy_batch=True
    )
    test_ds = ds.map_batches(
        part(True), batch_format="pyarrow", zero_copy_batch=True
    )
    return decontaminate_pair(
        train_ds, test_ds, n=n, exact_threshold=exact_threshold
    )


def _kgram_hasher(k: int):
    """Vectorized k-gram polynomial rolling hash (winnowing inner loop).

    Returns ``hashes(data: bytes) -> np.ndarray`` yielding every k-gram's
    ``sum(data[i+j] * BASE^(k-1-j)) mod MOD`` — identical values to the
    sequential recurrence, computed as k shifted-slice table-lookup adds
    instead of a per-byte Python loop. ``(BASE^j * byte) % MOD`` is
    precomputed per byte value: each term is < MOD < 2^61, so a sum of
    k ≤ 8 terms fits uint64 without overflow (the raw product would
    not — hence the tables)."""
    if k * _WINNOW_MOD >= (1 << 64):
        raise ValueError("k too large for the uint64 accumulation")
    powers = [pow(_WINNOW_BASE, k - 1 - j, _WINNOW_MOD) for j in range(k)]
    luts = [
        np.array([(p * v) % _WINNOW_MOD for v in range(256)], dtype=np.uint64)
        for p in powers
    ]

    def hashes(data: bytes) -> np.ndarray:
        arr = np.frombuffer(data, dtype=np.uint8)
        n = len(arr) - k + 1
        acc = np.zeros(n, dtype=np.uint64)
        for j, lut in enumerate(luts):
            acc += lut[arr[j : j + n]]
        return acc % np.uint64(_WINNOW_MOD)

    return hashes


def winnow_fingerprints(
    sf_dir: str | None,
    k: int = 5,
    window: int = 4,
    ds: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """(doc_id, n_grams, n_selected, min_hash, max_hash) — winnowing-style
    rolling-hash document fingerprint (Schleimer et al. 2003 scheme:
    k-gram rolling hashes, per-window minima). Deterministic polynomial
    rolling hash — no Python ``hash()``."""
    if ds is None:
        ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    doc_hashes = _kgram_hasher(k)

    def winnow(batch: pa.Table) -> pa.Table:
        # BATCHED outer loop: all docs concatenate into one buffer,
        # hashed ONCE (k LUT adds over the whole buffer); per-doc gram
        # ranges are slices of the global hash array, so k-grams and
        # windows that would cross a document boundary are simply
        # excluded by position masks — no per-doc Python in the common
        # path.
        datas = [(t or "").encode("utf-8") for t in batch.column("text").to_pylist()]
        n_docs = len(datas)
        lens = np.fromiter((len(d) for d in datas), dtype=np.int64, count=n_docs)
        gram_counts = np.maximum(lens - k + 1, 0)
        n_sel = np.zeros(n_docs, dtype=np.int64)
        mins = np.zeros(n_docs, dtype=np.int64)
        maxs = np.zeros(n_docs, dtype=np.int64)
        buf = b"".join(datas)
        if len(buf) >= k:
            all_h = doc_hashes(buf)
            starts = np.zeros(n_docs, dtype=np.int64)
            starts[1:] = np.cumsum(lens)[:-1]
            if len(all_h) >= window:
                # one global sliding-window min; position p belongs to
                # doc i iff starts[i] <= p <= starts[i]+grams[i]-window
                allmins = np.lib.stride_tricks.sliding_window_view(
                    all_h, window
                ).min(axis=1)
                p = np.arange(len(allmins))
                doc = np.searchsorted(starts, p, side="right") - 1
                valid = (p - starts[doc]) <= (gram_counts[doc] - window)
                docv, minv = doc[valid], allmins[valid]
                if len(docv):
                    # per-doc distinct minima stats via one lexsort:
                    # run starts/ends give min/max, run count gives
                    # n_selected
                    order = np.lexsort((minv, docv))
                    d_s, v_s = docv[order], minv[order]
                    new = np.ones(len(d_s), dtype=bool)
                    new[1:] = (d_s[1:] != d_s[:-1]) | (v_s[1:] != v_s[:-1])
                    n_sel += np.bincount(d_s[new], minlength=n_docs)
                    first = np.ones(len(d_s), dtype=bool)
                    first[1:] = d_s[1:] != d_s[:-1]
                    last = np.ones(len(d_s), dtype=bool)
                    last[:-1] = d_s[1:] != d_s[:-1]
                    mins[d_s[first]] = v_s[first].astype(np.int64)
                    maxs[d_s[last]] = v_s[last].astype(np.int64)
            # short docs (0 < grams < window) take a single window over
            # their whole gram slice — only docs under k+window-1 bytes
            # ever land here, so the loop is effectively empty
            for i in np.nonzero((gram_counts > 0) & (gram_counts < window))[0]:
                s = starts[i]
                m = int(all_h[s : s + gram_counts[i]].min())
                n_sel[i] = 1
                mins[i] = m
                maxs[i] = m
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_grams": pa.array(gram_counts, pa.int64()),
                "n_selected": pa.array(n_sel, pa.int64()),
                "min_hash": pa.array(mins, pa.int64()),
                "max_hash": pa.array(maxs, pa.int64()),
            }
        )

    return ds.map_batches(winnow, batch_format="pyarrow", zero_copy_batch=True)
