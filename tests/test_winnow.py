"""Winnowing fingerprint: the vectorized k-gram rolling hash must equal
the sequential recurrence it replaced (Schleimer et al. 2003 scheme)."""

from __future__ import annotations

import numpy as np

from mhdb_tables2turtles_ray.pipelines.text import winnow_fingerprints

MOD = (1 << 61) - 1
BASE = 257


def _sequential(data: bytes, k: int, window: int):
    """The original per-byte recurrence, kept here as the oracle."""
    if len(data) < k:
        return (0, 0, 0, 0)
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
    return (len(hashes), len(selected), min(selected), max(selected))


def test_vectorized_matches_sequential(ray_session):
    k, window = 5, 4
    out = {
        r["doc_id"]: (r["n_grams"], r["n_selected"], r["min_hash"], r["max_hash"])
        for r in winnow_fingerprints("/root/testdata/sf0.001", k=k, window=window)
        .take_all()
    }
    import pyarrow.parquet as pq

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    checked = 0
    for doc_id, text in zip(
        docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
    ):
        expect = _sequential((text or "").encode("utf-8"), k, window)
        assert out[doc_id] == expect, doc_id
        checked += 1
    assert checked == len(out) > 0


def test_batched_winnow_edge_docs(ray_session):
    """The batched path must match the sequential oracle on the doc
    shapes the corpus doesn't cover: empty, shorter than k (no grams),
    shorter than k+window-1 (single-window fallback), and boundary
    adjacency (a short doc between two long ones must not absorb its
    neighbors' k-grams through the concatenated buffer)."""
    import pyarrow as pa
    import ray.data

    k, window = 5, 4
    texts = [
        "",                       # no bytes
        "abc",                    # < k
        "abcde",                  # exactly k: 1 gram, short-window path
        "abcdefg",                # 3 grams < window
        "the quick brown fox jumps over the lazy dog",  # long
        "ab",                     # short again, wedged between longs
        "pack my box with five dozen liquor jugs",      # long
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    out = {
        r["doc_id"]: (r["n_grams"], r["n_selected"], r["min_hash"], r["max_hash"])
        for r in winnow_fingerprints(None, k=k, window=window, ds=ds).take_all()
    }
    for i, t in enumerate(texts):
        assert out[i] == _sequential(t.encode("utf-8"), k, window), (i, t)


def test_hasher_adversarial_bytes():
    """The vectorized hasher equals the recurrence on edge-case byte
    strings: exactly k bytes, all-0xFF (max accumulation — overflow
    probe), high-byte runs, NULs."""
    from mhdb_tables2turtles_ray.pipelines.text import _kgram_hasher

    for k in (2, 5, 8):
        hasher = _kgram_hasher(k)
        for payload in (
            bytes(range(k)),
            b"\xff" * (k + 20),
            bytes(range(248, 256)) * 4,
            b"\x00" * (k + 3),
            b"The quick brown fox jumps over the lazy dog",
        ):
            got = hasher(payload).tolist()
            power = pow(BASE, k - 1, MOD)
            h, expect = 0, []
            for i, b in enumerate(payload):
                h = (h * BASE + b) % MOD
                if i >= k:
                    h = (h - payload[i - k] * power * BASE) % MOD
                if i >= k - 1:
                    expect.append(h)
            assert got == expect, (k, payload[:8])


def test_hasher_rejects_overflowing_k():
    import pytest

    from mhdb_tables2turtles_ray.pipelines.text import _kgram_hasher

    with pytest.raises(ValueError):
        _kgram_hasher(9)  # 9 * (2^61 - 1) >= 2^64
