"""Text-analysis operators over the ``documents`` table.

Large-scale training-data pipeline staples: token counting, quality
scoring, language identification, document fingerprinting. All are
single-pass ``map_batches`` stages — no shuffle, fully streaming — with
vectorized pyarrow/numpy kernels where the kernel exists and tight
per-batch Python only for the set-membership scoring.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..sources.tables import read_table

_TOKEN_RE = re.compile(r"\S+")
_WS_RE = re.compile(r"\s+")

# Marker (stopword) lists per language for the n-gram/stopword heuristic
# language ID. Deterministic priority tie-break: en > de > fr.
LANG_MARKERS = {
    "en": ("the", "a"),
    "de": ("der", "die", "das"),
    "fr": ("le", "la", "les"),
}

STOPWORDS = ("the", "a")


def token_counts(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_tokens) — whitespace tokenization, vectorized."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def count(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch.column("text"), r"\S+")
        return pa.table(
            {"doc_id": batch.column("doc_id"), "n_tokens": pc.cast(n, pa.int64())}
        )

    return ds.map_batches(count, batch_format="pyarrow", zero_copy_batch=True)


def quality_scores(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_chars_text, n_tokens, stop_hits, stop_ratio) — the
    length/stopword-ratio quality signals."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    stop = set(STOPWORDS)

    def score(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_tokens, stop_hits = [], []
        for t in texts:
            toks = _TOKEN_RE.findall(t) if t else []
            n_tokens.append(len(toks))
            stop_hits.append(sum(1 for w in toks if w in stop))
        ratio = [
            (h / n) if n else 0.0 for h, n in zip(stop_hits, n_tokens)
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars_text": pc.cast(
                    pc.utf8_length(batch.column("text")), pa.int64()
                ),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "stop_hits": pa.array(stop_hits, pa.int64()),
                "stop_ratio": pa.array(ratio, pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def lang_id(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, predicted_lang) — stopword-marker heuristic with the
    deterministic en > de > fr priority tie-break; zero hits → 'unknown'."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    markers = {k: frozenset(v) for k, v in LANG_MARKERS.items()}

    def predict(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch.column("text").to_pylist():
            toks = _TOKEN_RE.findall(t) if t else []
            hits = {k: sum(1 for w in toks if w in m) for k, m in markers.items()}
            if hits["en"] >= hits["de"] and hits["en"] >= hits["fr"] and hits["en"] > 0:
                out.append("en")
            elif hits["de"] >= hits["fr"] and hits["de"] > 0:
                out.append("de")
            elif hits["fr"] > 0:
                out.append("fr")
            else:
                out.append("unknown")
        return pa.table(
            {"doc_id": batch.column("doc_id"), "predicted_lang": pa.array(out)}
        )

    return ds.map_batches(predict, batch_format="pyarrow", zero_copy_batch=True)


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


def winnow_fingerprints(
    sf_dir: str, k: int = 5, window: int = 4
) -> ray.data.Dataset:
    """(doc_id, n_grams, n_selected, min_hash, max_hash) — winnowing-style
    rolling-hash document fingerprint (Schleimer et al. 2003 scheme:
    k-gram rolling hashes, per-window minima). Deterministic polynomial
    rolling hash — no Python ``hash()``."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    MOD = (1 << 61) - 1
    BASE = 257

    def winnow(batch: pa.Table) -> pa.Table:
        n_grams_c, n_sel_c, mins, maxs = [], [], [], []
        for t in batch.column("text").to_pylist():
            data = (t or "").encode("utf-8")
            if len(data) < k:
                n_grams_c.append(0)
                n_sel_c.append(0)
                mins.append(0)
                maxs.append(0)
                continue
            power = pow(BASE, k - 1, MOD)
            h = 0
            hashes = []
            for i, b in enumerate(data):
                h = (h * BASE + b) % MOD
                if i >= k:
                    h = (h - data[i - k] * power * BASE) % MOD
                if i >= k - 1:
                    hashes.append(h)
            selected = set()
            for w in range(max(1, len(hashes) - window + 1)):
                selected.add(min(hashes[w : w + window]))
            n_grams_c.append(len(hashes))
            n_sel_c.append(len(selected))
            mins.append(min(selected))
            maxs.append(max(selected))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_grams": pa.array(n_grams_c, pa.int64()),
                "n_selected": pa.array(n_sel_c, pa.int64()),
                "min_hash": pa.array(mins, pa.int64()),
                "max_hash": pa.array(maxs, pa.int64()),
            }
        )

    return ds.map_batches(winnow, batch_format="pyarrow", zero_copy_batch=True)
