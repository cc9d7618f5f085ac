"""Distributed BPE subword tokenizer training + corpus encoding.

The missing piece between :func:`pipelines.text.token_counts` (counting)
and :func:`pipelines.text.encode_documents` (frequency-vocab ids): LEARN
a subword vocabulary from the corpus, then encode with it.

Scale shape. The only distributed work in training is ONE
word-frequency scan — per-batch pyarrow ``group_by`` pre-aggregation
followed by the coarse-bucketed reduce (``stages/grouped.py:
bucketed_agg``), so the exchange carries distinct-words-per-block rows,
never the corpus, and the shuffle sorts 256 bucket values, never the
vocabulary. Merge learning then runs on the driver over the BOUNDED
word-frequency table (``min_count`` threshold + ``max_words`` cap,
truncation surfaced in the result — no silent caps): this is the
standard industrial formulation (SentencePiece and HF tokenizers train
from word counts, not the raw stream), so driver cost is O(vocab ×
merges), independent of corpus size. Encoding is an actor-pool
``map_batches``: the merge ranks broadcast ONCE via ``ray.put``, each
actor keeps a word→pieces memo across batches (Zipf makes the distinct
word set per batch tiny relative to token count), and each batch
encodes each distinct word exactly once via ``np.unique``; doc-aligned
output lists are rebuilt with ``np.repeat``/``np.bincount`` — no
per-token Python.

Determinism: pair selection is (count desc, pair lexicographic asc),
and the word table is itself deterministic, so two runs — at ANY
parallelism — learn byte-identical merge lists (pinned by test).
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..sources.tables import read_table
from ..stages.grouped import bucketed_agg
from .text import _flat_tokens

END_OF_WORD = "</w>"


def _word_symbols(word: str, end_of_word: str = END_OF_WORD) -> tuple[str, ...]:
    """Initial symbol sequence of a word: its characters, with the
    end-of-word marker appended to the LAST character (Sennrich-style,
    so 'low' and 'lowest' share the 'lo' prefix but not the final
    symbol)."""
    if not word:
        return ()
    return tuple(word[:-1]) + (word[-1] + end_of_word,)


def _merge_symbols(
    syms: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    """Apply one merge left-to-right (the classic greedy rule: after a
    merge the scan resumes AFTER the merged token, so 'aaa' under (a,a)
    becomes ('aa','a'))."""
    left, right = pair
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def word_counts(
    sf_dir: str,
    min_count: int = 1,
    max_words: int = 1_000_000,
    ds: ray.data.Dataset | None = None,
) -> tuple[list[str], np.ndarray, bool]:
    """(words, counts, truncated) — the corpus word-frequency table over
    the shared whitespace tokenization (:func:`text._flat_tokens`),
    ordered (count desc, word asc) so every consumer is deterministic.

    One scan: per-batch pyarrow ``group_by`` count partials →
    ``bucketed_agg`` sum (coarse 256-bucket shuffle) → ``min_count``
    filter → (count desc, word asc) sort → ``max_words`` limit. The
    driver only ever holds the ≤ ``max_words`` result; ``truncated``
    reports whether the cap actually dropped tail words (count them —
    never silently). Pass ``ds`` (any Dataset with a ``text`` column —
    the repo-wide caller-ds convention) to count a derived corpus
    instead of the documents table."""
    if ds is None:
        ds = read_table(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(batch.column("text"))
        t = pa.table({"word": flat}).group_by(["word"]).aggregate(
            [("word", "count")]
        )
        return pa.table(
            {
                "word": t.column("word"),
                "n": pa.compute.cast(t.column("word_count"), pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    counts = bucketed_agg(partials, key="word", value="n", how="sum")
    if min_count > 1:
        counts = counts.filter(expr=f"n >= {min_count}")
    ordered = counts.sort(["n", "word"], descending=[True, False])
    top = ordered.limit(max_words + 1).to_pandas()
    truncated = len(top) > max_words
    top = top.head(max_words)
    return (
        top["word"].tolist(),
        top["n"].to_numpy().astype(np.int64),
        truncated,
    )


def _learn_merges(
    words: list[tuple[str, ...]],
    counts: np.ndarray,
    num_merges: int,
) -> list[tuple[str, str]]:
    """Incremental BPE merge learning over a word-frequency table.

    Maintains pair→count and pair→{word idx} maps; each round picks the
    (count desc, pair asc) best pair and rewrites ONLY the words that
    contain it, so cost is O(affected word length) per merge — the
    update-in-place algorithm, not the naive recount-everything loop
    (the naive form is the test oracle, ``tests/test_bpe.py``)."""
    words = [list(w) for w in words]
    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for wi, syms in enumerate(words):
        c = int(counts[wi])
        for p in zip(syms, syms[1:]):
            pair_counts[p] += c
            pair_words[p].add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        affected = list(pair_words.get(best, ()))
        for wi in affected:
            syms = words[wi]
            c = int(counts[wi])
            old_pairs = Counter(zip(syms, syms[1:]))
            new_syms = list(_merge_symbols(tuple(syms), best))
            new_pairs = Counter(zip(new_syms, new_syms[1:]))
            for p, k in old_pairs.items():
                delta = new_pairs.get(p, 0) - k
                if delta:
                    pair_counts[p] += delta * c
                if new_pairs.get(p, 0) == 0:
                    pair_words[p].discard(wi)
                if pair_counts.get(p, 0) <= 0:
                    pair_counts.pop(p, None)
                    pair_words.pop(p, None)
            for p, k in new_pairs.items():
                if p not in old_pairs:
                    pair_counts[p] += k * c
                if k:
                    pair_words[p].add(wi)
            words[wi] = new_syms
    return merges


def train_bpe(
    sf_dir: str,
    num_merges: int = 200,
    min_count: int = 1,
    max_words: int = 1_000_000,
    end_of_word: str = END_OF_WORD,
    ds: ray.data.Dataset | None = None,
) -> dict:
    """Learn a BPE merge list from the documents corpus.

    Returns ``{"merges": [(left, right), ...] in rank order,
    "vocab": [symbol, ...] (base symbols sorted, then merged symbols in
    rank order — id = position + 1, id 0 reserved for UNK, matching
    ``encode_documents``' convention), "n_words": int,
    "truncated": bool}``. See the module docstring for the scale
    shape; ``truncated=True`` means ``max_words`` dropped tail words
    and the learned statistics are over the kept head."""
    raw_words, counts, truncated = word_counts(
        sf_dir, min_count=min_count, max_words=max_words, ds=ds
    )
    sym_words = [_word_symbols(w, end_of_word) for w in raw_words]
    merges = _learn_merges(sym_words, counts, num_merges)

    base = sorted({s for w in sym_words for s in w})
    vocab = base + [left + right for left, right in merges]
    return {
        "merges": merges,
        "vocab": vocab,
        "n_words": len(raw_words),
        "truncated": truncated,
        "end_of_word": end_of_word,
    }


def merges_table(model: dict) -> pa.Table:
    """(rank, left, right) — the merge list as an Arrow table (the
    persistable artifact; ``train_bpe`` ∘ this round-trips through
    parquet)."""
    m = model["merges"]
    return pa.table(
        {
            "rank": pa.array(range(len(m)), pa.int64()),
            "left": pa.array([a for a, _ in m], pa.string()),
            "right": pa.array([b for _, b in m], pa.string()),
        }
    )


def encode_word(
    word: str,
    ranks: dict[tuple[str, str], int],
    end_of_word: str = END_OF_WORD,
) -> tuple[str, ...]:
    """Encode one word: start from characters(+eow) and repeatedly apply
    the LOWEST-RANK merge present until none applies — which reproduces
    exactly the symbol state training left that word in (pinned by
    test)."""
    syms = _word_symbols(word, end_of_word)
    while len(syms) > 1:
        pairs = set(zip(syms, syms[1:]))
        best = min(
            (p for p in pairs if p in ranks), key=ranks.__getitem__, default=None
        )
        if best is None:
            break
        syms = _merge_symbols(syms, best)
    return syms


class _BPEEncoder:
    """Actor-pool batch encoder: ranks + vocab ids arrive ONCE via
    ``ray.put`` (``__init__``), the word→pieces memo persists across
    batches, and each batch encodes each DISTINCT word exactly once."""

    def __init__(self, model_ref):
        model = ray.get(model_ref)
        self.ranks = {tuple(m): i for i, m in enumerate(model["merges"])}
        self.ids = {s: i + 1 for i, s in enumerate(model["vocab"])}
        self.eow = model["end_of_word"]
        self.memo: dict[str, tuple[str, ...]] = {}

    # memo bound: Zipf keeps real vocabularies far below this, but a
    # pathological corpus (random strings) must not grow actor heap
    # without limit — reset beats an LRU here (hits restart instantly,
    # and the reset cost is one re-encode per distinct word per epoch)
    _MEMO_CAP = 1 << 20

    def _pieces(self, word: str) -> tuple[str, ...]:
        got = self.memo.get(word)
        if got is None:
            if len(self.memo) >= self._MEMO_CAP:
                self.memo.clear()
            got = self.memo[word] = encode_word(word, self.ranks, self.eow)
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, parents = _flat_tokens(batch.column("text"))
        n = len(batch)
        words = flat.to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(words, return_inverse=True)
        pieces = [self._pieces(w) for w in uniq]
        ids = self.ids
        piece_len = np.array([len(p) for p in pieces], dtype=np.int64)
        concat_pieces = np.array(
            [ids.get(s, 0) for p in pieces for s in p], dtype=np.int32
        )
        u_starts = np.zeros(len(pieces), dtype=np.int64)
        np.cumsum(piece_len[:-1], out=u_starts[1:])

        # doc-aligned assembly, no per-token Python: the concatenated
        # distinct-word piece buffer is gathered once with a vectorized
        # multi-range index (one np slice arithmetic pass over all
        # tokens), parents expand by piece count, per-doc lists come
        # from bincount offsets.
        lens = piece_len[inv]
        total = int(lens.sum())
        if total:
            ends = np.cumsum(lens)
            idx = (
                np.arange(total, dtype=np.int64)
                - np.repeat(ends - lens, lens)
                + np.repeat(u_starts[inv], lens)
            )
            flat_ids = concat_pieces[idx]
        else:
            flat_ids = np.empty(0, dtype=np.int32)
        flat_parents = np.repeat(parents, lens)
        n_pieces = np.bincount(
            flat_parents, minlength=n
        ).astype(np.int64) if len(flat_parents) else np.zeros(n, np.int64)
        n_unk = np.bincount(
            flat_parents, weights=(flat_ids == 0), minlength=n
        ).astype(np.int64) if len(flat_parents) else np.zeros(n, np.int64)
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(n_pieces, out=offsets[1:])
        lists = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(flat_ids, pa.int32())
        )
        # every non-text column passes through (uid/lang/copy metadata in
        # the training-prep flow); text itself is REPLACED by the ids
        out = batch.drop_columns(["text"])
        out = out.append_column("input_ids", lists)
        out = out.append_column("n_pieces", pa.array(n_pieces, pa.int64()))
        return out.append_column("n_unk", pa.array(n_unk, pa.int64()))


def bpe_encode(
    sf_dir: str,
    model: dict,
    concurrency: tuple[int, int] | int = (1, 4),
    ds: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """(…passthrough cols, input_ids list<int32>, n_pieces, n_unk) —
    encode the documents corpus with a trained BPE model
    (:func:`train_bpe`). The ``text`` column is replaced by the ids;
    every other input column (doc_id, and in the prep flow
    uid/copy/lang) passes through unchanged.
    Symbols never seen in training (e.g. a character new to this split)
    map to UNK id 0, counted per doc in ``n_unk`` — same convention as
    ``text.encode_documents``. Pass ``ds`` (a (doc_id, text) Dataset)
    to encode a derived corpus instead of the documents table."""
    model_ref = ray.put(model)
    if ds is None:
        ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        _BPEEncoder,
        fn_constructor_args=(model_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def save_bpe_model(model: dict, path: str) -> None:
    """Persist a trained model as one parquet file: the merges in rank
    order plus the vocab (id order) and metadata in the file's
    key-value schema metadata — a single artifact that round-trips
    exactly (pinned by test) so a tokenizer trained once can encode
    every later increment of a corpus."""
    import json
    import os

    import pyarrow.parquet as pq

    table = merges_table(model)
    table = table.replace_schema_metadata(
        {
            "bpe_meta": json.dumps(
                {
                    "vocab": model["vocab"],
                    "end_of_word": model["end_of_word"],
                    "n_words": model["n_words"],
                    "truncated": model["truncated"],
                }
            )
        }
    )
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    fd = os.open(tmp, os.O_RDONLY)  # fsync before publish, like every
    try:                            # atomic-publish path in the repo
        os.fsync(fd)
    finally:
        os.close(fd)
    os.rename(tmp, path)


def load_bpe_model(path: str) -> dict:
    """Inverse of :func:`save_bpe_model` — exact round-trip."""
    import json

    import pyarrow.parquet as pq

    table = pq.read_table(path)
    raw = (table.schema.metadata or {}).get(b"bpe_meta")
    if raw is None:
        raise ValueError(f"{path} is not a saved BPE model (no bpe_meta)")
    meta = json.loads(raw)
    merges = list(
        zip(table.column("left").to_pylist(), table.column("right").to_pylist())
    )
    return {
        "merges": merges,
        "vocab": meta["vocab"],
        "end_of_word": meta["end_of_word"],
        "n_words": meta["n_words"],
        "truncated": meta["truncated"],
    }
