"""Deduplication operators over the ``documents`` / ``embeddings`` tables.

Exact + the near-dup family a training-data pipeline needs: MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine. The scalable shape shared by
the sketch-based ops is ONE shuffle, no joins:

    map_batches: signature per doc → explode to (bucket, doc_id, sig)
    → groupby(bucket): pairwise check within bucket → candidate pairs
    → groupby(pair): global pair dedup

Signatures ride along in the bucket rows (bands × sig bytes per doc)
instead of a second join-shuffle back to the corpus — a deliberate
space-for-shuffle trade documented per op.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Min

from ..functions.numeric import round_half_away
from ..sources.tables import read_table

_MERSENNE = (1 << 61) - 1


def _stable_hash64(tokens: list[str]) -> np.ndarray:
    """Deterministic 64-bit hashes (no PYTHONHASHSEED dependence).

    pandas' vectorized siphash with its fixed default key — stable
    across processes/runs and ~20× faster than per-token blake2b."""
    return pd.util.hash_array(np.asarray(tokens, dtype=object))


def exact_dedup(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup by content hash: keep the smallest doc_id per distinct
    text. Coarse-bucketed min-reduction on the digest
    (``bucketed_agg`` — uniform keys, no skew, no fine-key sort over
    the digest domain), with the heavy ``text`` column dropped before
    the shuffle."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def digest(batch: pa.Table) -> pa.Table:
        keys = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "text_md5": pa.array(keys)}
        )

    from ..stages.grouped import bucketed_agg

    return bucketed_agg(
        ds.map_batches(digest, batch_format="pyarrow", zero_copy_batch=True),
        "text_md5",
        "doc_id",
        how="min",
    ).select_columns(["doc_id"])


def _shingles(text: str, k: int) -> list[str]:
    toks = text.split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


class MinHasher:
    """Actor-pool signature stage: permutation params built once.

    ``mode``:
      - ``"bands"``       → exploded (band, band_hash, doc_id, sig) — the
        single-pass shape (signature rides every band row);
      - ``"bands_light"`` → exploded (band, band_hash, doc_id) — 16-byte
        band rows for the two-pass shape (signatures verified later);
      - ``"sigs"``        → one (doc_id, sig) row per doc.
    """

    def __init__(
        self,
        num_perm: int = 64,
        shingle_k: int = 3,
        bands: int = 16,
        mode: str = "bands",
    ):
        rng = np.random.RandomState(7)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.mode = mode

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text or "", self.k)
        if not sh:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        h = _stable_hash64(sh)  # (n_shingles,)
        # (num_perm, n_shingles) permuted hashes, min over shingles
        ph = (np.outer(self.a, h) + self.b[:, None]) % _MERSENNE
        return ph.min(axis=1).astype(np.uint64)

    def signatures_batch(self, texts: list) -> np.ndarray:
        """(n_docs, num_perm) signatures with ONE vectorized hash pass.

        ``pd.util.hash_array`` per doc pays its setup cost thousands of
        times per batch (measured: ~2/3 of signature time); hashing all
        shingles flat and segmenting the permuted-min with
        ``np.minimum.reduceat`` produces bit-identical signatures (the
        hash and the mod-Mersenne permutation are elementwise)."""
        sigs = np.full(
            (len(texts), self.num_perm), np.iinfo(np.uint64).max, dtype=np.uint64
        )
        # Chunk by shingle count so the (num_perm × total_shingles)
        # permuted matrix stays ~16 MB regardless of caller batch size
        # (larger chunks measurably lose to cache misses).
        budget = max(1, (16 << 20) // (8 * self.num_perm))
        start = 0
        while start < len(texts):
            sh_lists, total, end = [], 0, start
            while end < len(texts) and (total == 0 or total < budget):
                sh = _shingles(texts[end] or "", self.k)
                sh_lists.append(sh)
                total += len(sh)
                end += 1
            lens = np.array([len(s) for s in sh_lists], dtype=np.int64)
            flat = [s for lst in sh_lists for s in lst]
            if flat:
                h = _stable_hash64(np.asarray(flat, dtype=object))  # (total,)
                ph = (np.outer(self.a, h) + self.b[:, None]) % _MERSENNE
                nonzero = lens > 0
                offsets = np.concatenate(([0], np.cumsum(lens)))[:-1][nonzero]
                idx = np.arange(start, end)[nonzero]
                sigs[idx] = np.minimum.reduceat(ph, offsets, axis=1).T.astype(
                    np.uint64
                )
            start = end
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        all_sigs = self.signatures_batch(texts)
        if self.mode == "sigs":
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "sig": pa.array(all_sigs.tolist(), pa.list_(pa.uint64())),
                }
            )
        carry = self.mode == "bands"
        doc_col, band_col, bhash_col, sig_col = [], [], [], []
        for doc_id, sig in zip(ids, all_sigs):
            sig_list = sig.tolist() if carry else None
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                bh = int.from_bytes(
                    hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(), "little"
                )
                doc_col.append(doc_id)
                band_col.append(band)
                bhash_col.append(bh)
                if carry:
                    sig_col.append(sig_list)
        cols = {
            "band": pa.array(band_col, pa.int32()),
            "band_hash": pa.array(bhash_col, pa.uint64()),
            "doc_id": pa.array(doc_col, pa.int64()),
        }
        if carry:
            cols["sig"] = pa.array(sig_col, pa.list_(pa.uint64()))
        return pa.table(cols)


def minhash_lsh_pairs(
    sf_dir: str | None = None,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 200,
    concurrency=(1, 8),
    carry_sig: bool = False,
    ds: ray.data.Dataset | None = None,
    auto_switch_min: int = 100_000,
    auto_switch_frac: float = 0.5,
) -> ray.data.Dataset:
    """Near-duplicate pairs via MinHash + banded LSH.

    ``ds`` overrides the sf-dir read with any (doc_id, text) Dataset —
    the library-composition entry (and the scale-stress harness).

    Output (doc_a, doc_b, est_jaccard): candidate pairs sharing ≥1 LSH
    bucket whose signature-estimated Jaccard ≥ ``threshold``. Estimated
    (not exact) Jaccard is the standard at-scale verify — it avoids
    shipping shingle sets through a second join. Buckets larger than
    ``max_bucket`` are truncated (sorted by doc_id) — a skew guard
    against degenerate buckets going quadratic. Each partition task that
    truncates logs a warning with the truncated-bucket count (worker
    log), so truncation is observable; the corpus itself is never
    dropped, only candidate pairs beyond the cap.

    ``carry_sig`` picks the shuffle/compute trade (results identical,
    verified by test):
      - False (two-pass, DEFAULT): band rows carry only (band,
        band_hash, doc_id) — 27× less shuffle at the defaults (measured
        at sf0.1: 1.6 MB vs 42.9 MB exploded, see STATS.md) — then
        signatures are recomputed for just the candidate docs (second
        pruned read) and pairs verified against a broadcast signature
        block. The at-scale shape when near-dup density is low
        (candidates ≪ corpus, the normal regime); also faster here.
      - True (single-pass): each doc's full signature rides all
        ``bands`` band rows (~``bands × num_perm × 8`` ≈ 8 KB/doc
        shuffled at the defaults). One corpus pass, no candidate-id
        broadcast — the fallback when candidates are NOT sparse (a
        dup-saturated corpus would blow the candidate broadcast).

    The two-pass path AUTO-SWITCHES to single-pass when the candidate
    regime turns out saturated (the ``auto_join`` count-then-choose
    pattern, stages/shuffle_join.py): after the bucket pass, if
    ≥ ``auto_switch_min`` distinct docs are candidates AND they exceed
    ``auto_switch_frac`` of the corpus, the broadcast-signature verify
    would ship a near-corpus-sized block to every task — re-run in
    ``carry_sig=True`` shape instead (one extra band pass, bounded
    shuffle). The decision is logged; results are identical either way
    (pinned by test).
    """
    if ds is None:
        ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    hasher_kwargs = {
        "num_perm": num_perm,
        "shingle_k": shingle_k,
        "bands": bands,
        "mode": "bands" if carry_sig else "bands_light",
    }
    exploded = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=hasher_kwargs,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=512,
        concurrency=concurrency,
    )

    # Coarsen the shuffle key: hash each (band, band_hash) LSH bucket into
    # B coarse partitions, then group the fine buckets with pandas INSIDE
    # each partition task. One (band, band_hash) groupby would create one
    # Ray group per fine bucket — per-group task overhead dominates when
    # buckets are tiny; B coarse groups amortize it by ~|buckets|/B.
    B = 256

    def add_bucket(t: pa.Table) -> pa.Table:
        coarse = pc.bit_wise_xor(
            t.column("band_hash"), pc.cast(t.column("band"), pa.uint64())
        )
        bucket = pc.cast(pc.bit_wise_and(coarse, pa.scalar(B - 1, pa.uint64())), pa.int64())
        return t.append_column("bucket", bucket)

    def coarse_pairs(part: pd.DataFrame) -> pd.DataFrame:
        a_idx, b_idx, est = [], [], []
        n_truncated = 0
        for _, group in part.groupby(["band", "band_hash"], sort=False):
            if len(group) < 2:
                continue
            if len(group) > max_bucket:
                n_truncated += 1
            group = group.sort_values("doc_id").head(max_bucket)
            ids = group["doc_id"].to_numpy()
            sigs = np.stack(group["sig"].to_numpy())  # (n, num_perm)
            for i in range(len(ids)):
                eq = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
                for j in np.nonzero(eq >= threshold)[0]:
                    a_idx.append(ids[i])
                    b_idx.append(ids[i + 1 + j])
                    est.append(float(eq[j]))
        if n_truncated:
            import logging

            logging.getLogger(__name__).warning(
                "minhash_lsh: truncated %d bucket(s) to max_bucket=%d "
                "(skew guard; candidate pairs beyond the cap dropped)",
                n_truncated,
                max_bucket,
            )
        return pd.DataFrame(
            {"doc_a": a_idx, "doc_b": b_idx, "est_jaccard": est}
        ).astype({"doc_a": "int64", "doc_b": "int64", "est_jaccard": "float64"})

    def coarse_candidates(part: pd.DataFrame) -> pd.DataFrame:
        """Light mode: ALL within-bucket pairs (no signature to estimate
        with here) — the verify pass filters by est_jaccard."""
        out_a, out_b = [], []
        n_truncated = 0
        for _, group in part.groupby(["band", "band_hash"], sort=False):
            if len(group) < 2:
                continue
            if len(group) > max_bucket:
                n_truncated += 1
            ids = np.sort(group["doc_id"].to_numpy())[:max_bucket]
            ia, ib = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ia])
            out_b.append(ids[ib])
        if n_truncated:
            import logging

            logging.getLogger(__name__).warning(
                "minhash_lsh: truncated %d bucket(s) to max_bucket=%d "
                "(skew guard; candidate pairs beyond the cap dropped)",
                n_truncated,
                max_bucket,
            )
        if not out_a:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype("int64")
        return pd.DataFrame(
            {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)}
        )

    bucketed = exploded.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    )

    if carry_sig:
        pairs = bucketed.groupby("bucket").map_groups(
            coarse_pairs, batch_format="pandas"
        )
        # global pair dedup (same pair found in multiple bands)
        return pairs.groupby(["doc_a", "doc_b"]).aggregate(
            Min("est_jaccard", alias_name="est_jaccard")
        )

    # Two-pass: candidates (bounded — the whole point), then verify
    # against signatures recomputed for candidate docs only.
    candidates = (
        bucketed.groupby("bucket")
        .map_groups(coarse_candidates, batch_format="pandas")
        .materialize()  # consumed twice (id collect + verify); bounded size
    )
    # unique() may return a list, a set, or None-on-empty depending on
    # block lineage — np.fromiter + `or ()` covers all three
    cand_ids = np.union1d(
        np.fromiter(candidates.unique("doc_a") or (), dtype=np.int64),
        np.fromiter(candidates.unique("doc_b") or (), dtype=np.int64),
    )
    if cand_ids.size == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "est_jaccard": pa.array([], pa.float64()),
                }
            )
        )
    if cand_ids.size >= auto_switch_min:
        # Saturated-regime check only once the absolute floor is hit
        # (corpus count is free for a parquet read, one execution for a
        # passed-in ds — worth it only when a big broadcast looms).
        corpus_n = ds.count()
        if cand_ids.size > auto_switch_frac * corpus_n:
            import logging

            logging.getLogger(__name__).warning(
                "minhash_lsh: candidate regime saturated (%d candidate "
                "docs / %d corpus > frac=%.2f) — switching to the "
                "single-pass carry_sig shape instead of broadcasting "
                "the candidate signature block",
                cand_ids.size,
                corpus_n,
                auto_switch_frac,
            )
            return minhash_lsh_pairs(
                sf_dir,
                num_perm=num_perm,
                bands=bands,
                shingle_k=shingle_k,
                threshold=threshold,
                max_bucket=max_bucket,
                concurrency=concurrency,
                carry_sig=True,
                ds=ds,
            )
    ids_ref = ray.put(cand_ids)
    sig_rows = (
        ds.map_batches(
            lambda t: t.filter(
                pc.is_in(t.column("doc_id"), pa.array(ray.get(ids_ref)))
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .map_batches(
            MinHasher,
            fn_constructor_kwargs={**hasher_kwargs, "mode": "sigs"},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=512,
            concurrency=concurrency,
        )
        .take_all()
    )
    order = np.argsort([r["doc_id"] for r in sig_rows])
    sig_ids = np.array([sig_rows[i]["doc_id"] for i in order], dtype=np.int64)
    sig_mat = np.stack(
        [np.asarray(sig_rows[i]["sig"], dtype=np.uint64) for i in order]
    )
    sig_ref = ray.put((sig_ids, sig_mat))

    def verify(batch: pa.Table) -> pa.Table:
        ids, mat = ray.get(sig_ref)
        a = batch.column("doc_a").to_numpy()
        b = batch.column("doc_b").to_numpy()
        est = (
            mat[np.searchsorted(ids, a)] == mat[np.searchsorted(ids, b)]
        ).mean(axis=1)
        keep = est >= threshold
        return pa.table(
            {
                "doc_a": pa.array(a[keep]),
                "doc_b": pa.array(b[keep]),
                "est_jaccard": pa.array(est[keep], pa.float64()),
            }
        )

    verified = candidates.map_batches(
        verify, batch_format="pyarrow", zero_copy_batch=True
    )
    return verified.groupby(["doc_a", "doc_b"]).aggregate(
        Min("est_jaccard", alias_name="est_jaccard")
    )


class SimHasher:
    """64-bit SimHash signature stage (token-frequency weighted)."""

    def __init__(self, band_bits: int = 16):
        self.band_bits = band_bits
        self.n_bands = 64 // band_bits

    def simhash(self, text: str) -> int:
        toks = (text or "").split()
        if not toks:
            return 0
        h = _stable_hash64(toks)  # (n,)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def simhash_batch(self, texts: list) -> list[int]:
        """All docs' simhashes with ONE vectorized hash pass — identical
        values to :meth:`simhash` (elementwise hash; per-doc bit sums
        segmented with ``np.add.reduceat``)."""
        tok_lists = [(t or "").split() for t in texts]
        lens = np.array([len(t) for t in tok_lists], dtype=np.int64)
        out = np.zeros(len(texts), dtype=np.uint64)
        flat = [tok for lst in tok_lists for tok in lst]
        if not flat:
            return out.tolist()
        h = _stable_hash64(np.asarray(flat, dtype=object))  # (total,)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
        nonzero = lens > 0
        offsets = np.concatenate(([0], np.cumsum(lens)))[:-1][nonzero]
        sums = np.add.reduceat(bits, offsets, axis=0)  # (n_nonzero, 64)
        v = 2 * sums - lens[nonzero][:, None]  # sum of (2*bit - 1)
        out[nonzero] = ((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
            axis=1
        )
        return out.tolist()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        band_col, key_col, doc_col, sig_col = [], [], [], []
        mask = (1 << self.band_bits) - 1
        all_sigs = self.simhash_batch(batch.column("text").to_pylist())
        for doc_id, sig in zip(ids, all_sigs):
            sig = int(sig)
            for band in range(self.n_bands):
                band_col.append(band)
                key_col.append((sig >> (band * self.band_bits)) & mask)
                doc_col.append(doc_id)
                sig_col.append(sig)
        return pa.table(
            {
                "band": pa.array(band_col, pa.int32()),
                "band_key": pa.array(key_col, pa.uint64()),
                "doc_id": pa.array(doc_col, pa.int64()),
                "sig": pa.array(sig_col, pa.uint64()),
            }
        )


def simhash_pairs(
    sf_dir: str, band_bits: int = 16, hamming_max: int = 3, max_bucket: int = 200,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Near-dup pairs via SimHash banding: docs sharing any 16-bit band
    are candidates; verified by Hamming distance ≤ ``hamming_max``."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    exploded = ds.map_batches(
        SimHasher,
        fn_constructor_kwargs={"band_bits": band_bits},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=512,
        concurrency=concurrency,
    )

    # Same coarse-bucket shuffle trick as minhash_lsh_pairs: B partitions,
    # fine (band, band_key) buckets grouped with pandas inside each task.
    B = 256

    def add_bucket(t: pa.Table) -> pa.Table:
        coarse = pc.bit_wise_xor(
            t.column("band_key"), pc.cast(t.column("band"), pa.uint64())
        )
        bucket = pc.cast(pc.bit_wise_and(coarse, pa.scalar(B - 1, pa.uint64())), pa.int64())
        return t.append_column("bucket", bucket)

    def coarse_pairs(part: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_a": [], "doc_b": [], "hamming": []}
        for _, group in part.groupby(["band", "band_key"], sort=False):
            if len(group) < 2:
                continue
            group = group.sort_values("doc_id").head(max_bucket)
            ids = group["doc_id"].to_numpy()
            sigs = group["sig"].to_numpy().astype(np.uint64)
            for i in range(len(ids)):
                x = sigs[i + 1 :] ^ sigs[i]
                d = np.array([bin(int(v)).count("1") for v in x])
                for j in np.nonzero(d <= hamming_max)[0]:
                    out["doc_a"].append(int(ids[i]))
                    out["doc_b"].append(int(ids[i + 1 + j]))
                    out["hamming"].append(int(d[j]))
        return pd.DataFrame(out).astype(
            {"doc_a": "int64", "doc_b": "int64", "hamming": "int64"}
        )

    pairs = (
        exploded.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(coarse_pairs, batch_format="pandas")
    )
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )


def sketch_pairs(sf_dir: str) -> ray.data.Dataset:
    """Monitoring union of the sketch-based near-dup detectors: one tall
    (variant, doc_a, doc_b, score) table — variant 'minhash_lsh' with
    score = estimated Jaccard, variant 'simhash' with score = Hamming
    distance, variant 'embed_lsh' with score = SRP-estimated cosine
    (doc ids are vec_ids for that variant). Consolidates the rows-only
    registry entries so every oracled query fits under the driver's
    gate; each sketch keeps its own tests (two-pass equality, banding
    bounds, SRP recall/estimator accuracy)."""

    def tag(ds: ray.data.Dataset, name: str, score_col: str) -> ray.data.Dataset:
        def fmt(t: pa.Table, name=name, score_col=score_col) -> pa.Table:
            return pa.table(
                {
                    "variant": pa.array([name] * t.num_rows, pa.string()),
                    "doc_a": t.column("doc_a"),
                    "doc_b": t.column("doc_b"),
                    "score": pc.cast(t.column(score_col), pa.float64()),
                }
            )

        return ds.map_batches(fmt, batch_format="pyarrow", zero_copy_batch=True)

    mh = tag(minhash_lsh_pairs(sf_dir), "minhash_lsh", "est_jaccard")
    sh = tag(simhash_pairs(sf_dir), "simhash", "hamming")
    el = tag(embedding_lsh_pairs(sf_dir), "embed_lsh", "est_cosine")
    return mh.union(sh).union(el)


def jaccard_pairs_subset(
    sf_dir: str, max_doc_id: int = 300, threshold: float = 0.8
) -> ray.data.Dataset:
    """Exact unigram-set Jaccard pairs on a bounded doc_id subset.

    The bounded side (< ``max_doc_id`` rows) is collected and broadcast
    (``ray.put``), then each task compares its batch against the
    broadcast sets — a broadcast self-join, no shuffle. This is the
    oracle-checkable exact variant; the unbounded-scale path is
    :func:`minhash_lsh_pairs`.
    """
    import ray

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    subset = ds.filter(expr=f"doc_id < {max_doc_id}")
    rows = subset.take_all()  # bounded by construction
    sets = {r["doc_id"]: set((r["text"] or "").split(" ")) for r in rows}
    sets_ref = ray.put(sets)

    def pairs(batch: pa.Table) -> pa.Table:
        all_sets = ray.get(sets_ref)
        out_a, out_b, out_j = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            if doc_id >= max_doc_id:
                continue
            s = set((text or "").split(" "))
            for other_id, other in all_sets.items():
                if other_id <= doc_id:
                    continue
                inter = len(s & other)
                union = len(s | other)
                j = inter / union if union else 0.0
                if j >= threshold:
                    out_a.append(doc_id)
                    out_b.append(other_id)
                    out_j.append(j)
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    return ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)


def _union_find_roots(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Connected components over the (bounded) pair list; root = the
    component's smallest member. Pairs are sparse by construction
    (near-dup candidates ≪ corpus — the same argument that bounds the
    two-pass LSH candidate broadcast), so the driver union-find is the
    pragmatic scale path; the corpus itself never leaves the cluster."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def _non_root_ids(
    comp: ray.data.Dataset, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """(id_col) of every component's non-representative members — the
    drop set of a keep-one removal. ONE home for the non-root rule:
    lexical (:func:`_anti_join_non_roots`) and semantic
    (:func:`embedding_duplicate_ids`) removal both read it."""

    def non_roots(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t.column("node"), t.column("component"))
        return pa.table({id_col: t.filter(keep).column("node")})

    return comp.map_batches(non_roots, batch_format="pyarrow", zero_copy_batch=True)


def _anti_join_dropped(
    ds: ray.data.Dataset, dropped: ray.data.Dataset, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Corpus ids minus a dropped-id Dataset, fully streamed: the
    key filter is forced EXACT (a Bloom false positive here would drop
    a KEPT doc) and build_key_filter streams its merge — no collection
    on the driver."""
    import ray

    from ..stages.semijoin import build_key_filter, semi_join

    keys = build_key_filter(dropped, id_col, exact_threshold=None)
    return semi_join(
        ds.select_columns([id_col]), id_col, ray.put(keys), anti=True
    )


def _anti_join_non_roots(
    ds: ray.data.Dataset, comp: ray.data.Dataset, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Corpus minus every component's non-representative members — the
    ONE removal path shared by ``dedup_keep_best(method="distributed")``,
    :func:`dedup_keep_best_lsh` and :func:`dedup_keep_best_embedding`
    (composed from :func:`_non_root_ids` + :func:`_anti_join_dropped`)."""
    return _anti_join_dropped(ds, _non_root_ids(comp, id_col), id_col)


def dedup_keep_best(
    sf_dir: str,
    max_doc_id: int = 300,
    threshold: float = 0.8,
    method: str = "driver",
    cc_max_iters: int = 25,
) -> ray.data.Dataset:
    """End-to-end near-dup REMOVAL (what a dedup pipeline is for):
    cluster the near-dup pair graph (connected components, exact
    n-gram-Jaccard pairs on the bounded subset so the result is
    oracle-checkable) and keep one representative per cluster — the
    smallest doc_id — plus every unclustered doc. Output: the surviving
    (doc_id) set.

    ``method="driver"`` (default): pairs (bounded, the sparse-pairs
    regime) → driver union-find → broadcast drop set → one streamed
    membership filter. ``method="distributed"``: components come from
    ``stages/cc.py:connected_components`` (iterative min-label
    propagation — pairs and labels never touch the driver) and the
    removal rides the SAME streamed anti-join path as
    :func:`dedup_keep_best_lsh` (``_anti_join_non_roots``: no component
    collection on the driver); identical survivors (pinned by test).
    Either way the corpus is never collected, and the pair source swaps
    to :func:`minhash_lsh_pairs` unchanged."""
    import ray

    pair_ds = jaccard_pairs_subset(sf_dir, max_doc_id, threshold)
    if method == "distributed":
        from ..stages.cc import connected_components

        comp = connected_components(pair_ds, max_iters=cc_max_iters)
        return _anti_join_non_roots(
            read_table(sf_dir, "documents", columns=["doc_id"]), comp
        )
    elif method == "driver":
        pairs = [(r["doc_a"], r["doc_b"]) for r in pair_ds.take_all()]
        roots = _union_find_roots(pairs)
        dropped = np.sort(
            np.fromiter(
                (n for n, r in roots.items() if r != n), dtype=np.int64
            )
        )
    else:
        raise ValueError(f"unknown method: {method!r}")
    ref = ray.put(dropped)

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def keep(batch: pa.Table) -> pa.Table:
        drop = ray.get(ref)
        ids = batch.column("doc_id").to_numpy()
        mask = ~np.isin(ids, drop)
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def dedup_keep_best_lsh(
    sf_dir: str | None = None,
    ds: ray.data.Dataset | None = None,
    threshold: float = 0.5,
    cc_max_iters: int = 25,
    **lsh_kwargs,
) -> ray.data.Dataset:
    """At-scale near-dup REMOVAL, composed entirely from the scale
    paths: MinHash-LSH candidate pairs (banded shuffle, two-pass
    verify) → DISTRIBUTED connected components (iterative min-label
    propagation, ``stages/cc.py``) → anti semi-join of the corpus
    against the non-representative cluster members (thresholded
    broadcast key filter — exact, per anti-join semantics). No exact
    pair join, no driver union-find, no corpus collection anywhere:
    the sketch-based counterpart of :func:`dedup_keep_best` (which
    stays oracle-checkable via exact Jaccard on a bounded subset).
    Survivors = each near-dup cluster's smallest doc_id + every
    unclustered doc."""
    from ..stages.cc import connected_components

    if ds is None:
        ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = minhash_lsh_pairs(threshold=threshold, ds=ds, **lsh_kwargs)
    # cc_max_iters bounds the label-propagation rounds (≈ cluster-graph
    # diameter) — exposed so a deep near-dup chain is actionable from
    # the caller instead of a dead-end RuntimeError
    comp = connected_components(pairs, max_iters=cc_max_iters)
    return _anti_join_non_roots(ds, comp)


def embedding_near_dup(
    sf_dir: str, max_query_id: int = 100, threshold: float = 0.3
) -> ray.data.Dataset:
    """Embedding-cosine near-dup: pairs (query_id < ``max_query_id``,
    any vec_id > query_id) with cosine ≥ ``threshold``.

    The bounded query block is broadcast as a dense float64 matrix; each
    task runs one matmul per batch (vectorized, zero shuffle). Cosine is
    rounded to 6 decimals so the value is FP-stable cross-engine.
    """
    import ray

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qrows = ds.filter(expr=f"vec_id < {max_query_id}").take_all()
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qmat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    ref = ray.put((qids, qmat))

    def sims(batch: pa.Table) -> pa.Table:
        from ..functions.numeric import list_column_to_matrix

        ids_q, mat_q = ray.get(ref)
        vids = batch.column("vec_id").to_numpy()
        emb = list_column_to_matrix(batch.column("embedding"))
        emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        cos = round_half_away(emb @ mat_q.T, 6)  # round BEFORE the threshold so
        # membership is FP-stable cross-engine (oracle filters rounded too)
        out_q, out_v, out_c = [], [], []
        hit_rows, hit_cols = np.nonzero(cos >= threshold)
        for r, c in zip(hit_rows, hit_cols):
            if vids[r] <= ids_q[c]:
                continue  # dedup ordering + self-match
            out_q.append(int(ids_q[c]))
            out_v.append(int(vids[r]))
            out_c.append(float(cos[r, c]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_c, pa.float64()),
            }
        )

    return ds.map_batches(sims, batch_format="pyarrow", zero_copy_batch=True)


# byte-popcount lookup for vectorized 64-bit Hamming (numpy < 2 has no
# bitwise_count kernel)
_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
    axis=1
).astype(np.int64)


def _popcount64(x: np.ndarray) -> np.ndarray:
    return _POP8[np.ascontiguousarray(x, dtype=np.uint64).view(np.uint8)].reshape(
        len(x), 8
    ).sum(axis=1)


class HyperplaneHasher:
    """Signed-random-projection 64-bit signature stage over the
    ``embedding`` column — SimHash for cosine space. The Gaussian
    hyperplane matrix is a deterministic function of (seed, dim),
    generated lazily on the first batch (dim read from the data) and
    reused for the actor's lifetime, so every task buckets identically
    without shipping the matrix."""

    def __init__(self, band_bits: int = 16, seed: int = 7):
        self.band_bits = band_bits
        self.n_bands = 64 // band_bits
        self.seed = seed
        self._R: np.ndarray | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.numeric import list_column_to_matrix

        vids = batch.column("vec_id").to_numpy()
        emb = list_column_to_matrix(batch.column("embedding"))
        if self._R is None:
            rng = np.random.default_rng(self.seed)
            self._R = rng.standard_normal((64, emb.shape[1]))
        proj = emb @ self._R.T  # (n, 64); sign is scale-invariant, no norm needed
        bits = (proj >= 0).astype(np.uint64)
        sig = (bits << np.arange(64, dtype=np.uint64)).sum(axis=1).astype(np.uint64)

        n = len(vids)
        bands = np.arange(self.n_bands, dtype=np.uint64)
        band_rep = np.tile(bands, n)
        sig_rep = np.repeat(sig, self.n_bands)
        mask = np.uint64((1 << self.band_bits) - 1)
        keys = (sig_rep >> (band_rep * np.uint64(self.band_bits))) & mask
        return pa.table(
            {
                "band": pa.array(band_rep.astype(np.int32)),
                "band_key": pa.array(keys),
                "doc_id": pa.array(np.repeat(vids, self.n_bands).astype(np.int64)),
                "sig": pa.array(sig_rep),
            }
        )


def embedding_lsh_pairs(
    sf_dir: str | None = None,
    ds: ray.data.Dataset | None = None,
    band_bits: int = 16,
    threshold: float = 0.85,
    max_bucket: int = 200,
    concurrency=(1, 8),
    seed: int = 7,
) -> ray.data.Dataset:
    """Corpus-scale embedding near-dup pairs via random-hyperplane LSH —
    the unbounded-both-sides sibling of :func:`embedding_near_dup`
    (which broadcasts a bounded query block). Signatures bucket on
    16-bit bands exactly like :func:`simhash_pairs`; within-bucket
    pairs are scored by the SRP estimator
    ``est_cosine = cos(pi * hamming / 64)`` and kept at
    ``est_cosine >= threshold``. One all-to-all of 24-byte band rows —
    vectors never shuffle; estimation (not exact re-scoring) is the
    standard at-scale verify, mirroring MinHash's est_jaccard."""
    if ds is None:
        ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    exploded = ds.map_batches(
        HyperplaneHasher,
        fn_constructor_kwargs={"band_bits": band_bits, "seed": seed},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=512,
        concurrency=concurrency,
    )

    B = 256

    def add_bucket(t: pa.Table) -> pa.Table:
        coarse = pc.bit_wise_xor(
            t.column("band_key"), pc.cast(t.column("band"), pa.uint64())
        )
        bucket = pc.cast(
            pc.bit_wise_and(coarse, pa.scalar(B - 1, pa.uint64())), pa.int64()
        )
        return t.append_column("bucket", bucket)

    def coarse_pairs(part: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_e = [], [], []
        n_truncated = 0
        for _, group in part.groupby(["band", "band_key"], sort=False):
            if len(group) < 2:
                continue
            if len(group) > max_bucket:
                n_truncated += 1
            group = group.sort_values("doc_id").head(max_bucket)
            ids = group["doc_id"].to_numpy()
            sigs = group["sig"].to_numpy().astype(np.uint64)
            for i in range(len(ids)):
                d = _popcount64(sigs[i + 1 :] ^ sigs[i])
                est = np.cos(np.pi * d / 64.0)
                for j in np.nonzero(est >= threshold)[0]:
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[i + 1 + j]))
                    out_e.append(float(est[j]))
        if n_truncated:
            import logging

            logging.getLogger(__name__).warning(
                "embedding_lsh: truncated %d bucket(s) to max_bucket=%d "
                "(skew guard; candidate pairs beyond the cap dropped)",
                n_truncated,
                max_bucket,
            )
        return pd.DataFrame(
            {"doc_a": out_a, "doc_b": out_b, "est_cosine": out_e}
        ).astype({"doc_a": "int64", "doc_b": "int64", "est_cosine": "float64"})

    pairs = (
        exploded.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(coarse_pairs, batch_format="pandas")
    )
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("est_cosine", alias_name="est_cosine")
    )


def embedding_duplicate_ids(
    sf_dir: str | None = None,
    ds: ray.data.Dataset | None = None,
    threshold: float = 0.85,
    cc_max_iters: int = 25,
    **lsh_kwargs,
) -> ray.data.Dataset:
    """(vec_id) of every semantic NON-survivor — the docs a keep-one
    removal drops: hyperplane-LSH pairs → distributed connected
    components → non-root (node != component) ids. Exposed separately
    from :func:`dedup_keep_best_embedding` so composed funnels
    (``curate.curate_corpus``'s semantic stage) can anti-join their own
    survivor stream ONCE instead of inverting the kept set back into a
    dropped set (each inversion is an extra exact key-filter collection
    + filter pass)."""
    from ..stages.cc import connected_components

    if ds is None:
        ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    pairs = embedding_lsh_pairs(ds=ds, threshold=threshold, **lsh_kwargs)
    comp = connected_components(pairs, max_iters=cc_max_iters)
    return _non_root_ids(comp, id_col="vec_id")


def dedup_keep_best_embedding(
    sf_dir: str | None = None,
    ds: ray.data.Dataset | None = None,
    threshold: float = 0.85,
    cc_max_iters: int = 25,
    **lsh_kwargs,
) -> ray.data.Dataset:
    """Surviving (vec_id) rows after SEMANTIC near-dup removal at
    corpus scale — the embedding-space sibling of
    :func:`dedup_keep_best_lsh`, composed from the same scale paths:
    :func:`embedding_duplicate_ids` (vectors never shuffle, 24-byte
    band rows only) → exact anti semi-join (a Bloom false positive
    here would drop a KEPT doc, so the filter is forced exact).
    Survivors = each semantic cluster's smallest vec_id + every
    unclustered vector; no driver union-find, no vector collection."""
    if ds is None:
        ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    dropped = embedding_duplicate_ids(
        ds=ds, threshold=threshold, cc_max_iters=cc_max_iters, **lsh_kwargs
    )
    return _anti_join_dropped(ds, dropped, id_col="vec_id")


def _index_meta(index_dir: str, expected: dict) -> dict:
    """Load-or-create the index-level ``_index_meta.json``.

    A persisted incremental index is only coherent if its structural
    parameters (hash partition count, Bloom sidecar capacity, signature
    shape) stay CONSTANT across every increment — a later call with a
    different ``num_partitions`` would compute wrong partition ids and
    the existence-filtered reads would silently skip "missing" files,
    leaking indexed duplicates. The first call CLAIMS creation with a
    link()-based publish: content is fully written (and fsynced) to a
    pid-suffixed tmp file first, then ``os.link`` publishes it — the
    link either atomically creates a COMPLETE meta file or raises
    EEXIST, so there is no TOCTOU window for two concurrent
    first-increments with different params, no retry loop (a loser
    always reads complete content), and a crash mid-write can never
    leave a corrupt file at the meta path. Losers fall through to the
    validate path, which FAILS LOUDLY on any structural mismatch.
    """
    import json
    import os

    os.makedirs(index_dir, exist_ok=True)
    path = os.path.join(index_dir, "_index_meta.json")

    def validate() -> dict:
        with open(path) as f:
            stored = json.load(f)
        mismatch = {
            k: (stored.get(k), v)
            for k, v in expected.items()
            if stored.get(k) != v
        }
        if mismatch:
            detail = ", ".join(
                f"{k}: stored={s!r} requested={r!r}"
                for k, (s, r) in sorted(mismatch.items())
            )
            raise ValueError(
                f"index at {index_dir} was created with different "
                f"parameters ({detail}) — these are immutable for the "
                f"lifetime of one index; pass the stored values "
                f"(see {path})"
            )
        return stored

    if os.path.exists(path):
        return validate()
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(expected, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, path)  # atomic publish-or-EEXIST
    except FileExistsError:
        os.unlink(tmp)
        return validate()  # concurrent winner's content is complete
    os.unlink(tmp)
    return expected


def incremental_exact_dedup(
    sf_dir: str | None,
    index_dir: str,
    ds: ray.data.Dataset | None = None,
    num_partitions: int = 16,
    exact_threshold: int | None = 1_000_000,
    fpp: float = 1e-9,
) -> ray.data.Dataset:
    """Exact dedup against a PERSISTED fingerprint index — the
    incremental-ingestion shape (daily crawl batches arriving against an
    ever-growing corpus):

    1. load the existing index (generation subdirectories of
       hash-partitioned digest parquet, one per prior increment) and
       build the seen-digest filter;
    2. stream the new batch, drop rows whose digest is already indexed
       OR duplicated within the batch (keep smallest doc_id);
    3. append the surviving digests as a NEW generation through the
       resumable parquet sink, so the next increment sees them (append
       = new generation; prior generations are immutable).

    The seen-set representation is size-thresholded exactly like
    ``stages/semijoin.py``: at or under ``exact_threshold`` indexed
    digests the filter is the exact distinct-digest array, probed
    vectorized with ``pc.is_in``; above it a fixed-size Bloom filter
    over 64-bit-hashed digests, built DISTRIBUTED (per-batch partial
    filters OR-merged on the driver — the driver never holds the digest
    set, per-increment cost stays flat as the index grows). The Bloom
    path is approximate in the semi-join direction: a false positive
    drops a genuinely-new document at the configured ``fpp`` (default
    1e-9 ≈ one wrongly-dropped doc per 10^9 — the standard dedup-at-
    scale trade). Pass ``exact_threshold=None`` to force exact.

    Index-structural parameters are pinned in ``_index_meta.json`` at
    creation; a later call with a different ``num_partitions`` fails
    loudly instead of silently leaking duplicates.

    Returns the surviving (doc_id, text_md5) Dataset (materialized —
    it is both the result and the next index generation).
    """
    import os

    import ray

    from ..stages.parquet_sink import (
        read_partitioned_parquet,
        write_partitioned_parquet,
    )
    from ..stages.semijoin import BloomFilter

    _index_meta(
        index_dir, {"kind": "exact_md5", "num_partitions": num_partitions}
    )

    if ds is None:
        ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def digest(batch: pa.Table) -> pa.Table:
        keys = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "text_md5": pa.array(keys)}
        )

    digested = ds.map_batches(digest, batch_format="pyarrow", zero_copy_batch=True)

    gens = sorted(
        d for d in os.listdir(index_dir)
        if d.startswith("gen-") and os.path.isdir(os.path.join(index_dir, d))
    )
    seen_filter = None
    if gens:
        idx_ds = None
        for g in gens:
            d = read_partitioned_parquet(os.path.join(index_dir, g), num_partitions)
            idx_ds = d if idx_ds is None else idx_ds.union(d)
        n = idx_ds.count()
        if n == 0:
            seen_filter = None  # empty index (unique() would return None)
        elif exact_threshold is None or n <= exact_threshold:
            # exact path: distinct digests as one Arrow string array,
            # broadcast once, probed with a vectorized pc.is_in
            seen_filter = pa.array(
                sorted(idx_ds.unique("text_md5")), pa.string()
            )
        else:
            # Bloom path: hash the digests to 64-bit keys and reuse the
            # semi-join filter builder (forced Bloom via
            # exact_threshold=0) — ONE copy of the distributed build +
            # streamed OR-merge logic to maintain
            from ..stages.semijoin import build_key_filter

            def hash_keys(batch: pa.Table) -> pa.Table:
                h = pd.util.hash_array(
                    np.asarray(batch.column("text_md5").to_pylist(), dtype=object)
                )
                return pa.table({"k": pa.array(h.view(np.int64))})

            hashed = idx_ds.map_batches(
                hash_keys, batch_format="pyarrow", zero_copy_batch=True
            )
            seen_filter = build_key_filter(hashed, "k", exact_threshold=0, fpp=fpp)
    seen_ref = ray.put(seen_filter)

    def drop_seen(batch: pa.Table) -> pa.Table:
        f = ray.get(seen_ref)
        if f is None:
            return batch
        if isinstance(f, BloomFilter):
            keys = pd.util.hash_array(
                np.asarray(batch.column("text_md5").to_pylist(), dtype=object)
            )
            return batch.filter(pa.array(~f.contains(keys)))
        return batch.filter(pc.invert(pc.is_in(batch.column("text_md5"), f)))

    survivors = (
        digested.map_batches(drop_seen, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("text_md5")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .select_columns(["doc_id", "text_md5"])
        .materialize()  # consumed twice: index append + returned result
    )
    if survivors.count() > 0:
        gen_dir = os.path.join(index_dir, f"gen-{len(gens):05d}")
        write_partitioned_parquet(
            survivors.select_columns(["text_md5"]),
            gen_dir,
            "text_md5",
            num_partitions=num_partitions,
        )
    return survivors


def incremental_minhash_dedup(
    sf_dir: str | None,
    index_dir: str,
    ds: ray.data.Dataset | None = None,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
    num_partitions: int = 32,
    bloom_capacity: int = 4_000_000,
) -> ray.data.Dataset:
    """NEAR-dup filtering of an arriving batch against a persisted
    signature index — the incremental counterpart of
    :func:`minhash_lsh_pairs` (its batch mode dedups within one corpus;
    this dedups a new increment against everything already ingested).

    Index layout per generation (immutable, append-only):
      - exploded (band, band_hash, doc_id, sig) rows, hash-partitioned
        parquet KEYED ON band_hash (``stages/parquet_sink.py``) — so a
        candidate band hash maps to exactly one partition file;
      - a fixed-size Bloom sidecar (``.bloom``, ~10 MB at the default
        capacity) over the generation's band hashes. ``bloom_capacity``
        must stay CONSTANT for the lifetime of one index (sidecars are
        OR-merged, which requires equal bit arrays).

    Query path (the at-scale shape):
      1. OR the generations' Bloom sidecars (fixed bytes per gen —
         reading them never scales with index size);
      2. new docs' band hashes probe the merged Bloom; docs with zero
         hits are CLEAN without touching the index (the common case);
      3. for candidate band hashes only, read the matching index
         partitions (pruned by the sink's key-locality), join on
         band_hash, verify est-Jaccard against the carried signatures;
      4. survivors (not near-dup of any indexed doc) append their band
         rows as a new generation + Bloom sidecar.

    Returns the surviving (doc_id) Dataset. In-batch near-dups are NOT
    collapsed here — run :func:`minhash_lsh_pairs` on the increment
    first if the batch itself may contain near-dups.
    """
    import os

    import ray

    from ..stages.parquet_sink import write_partitioned_parquet
    from ..stages.semijoin import BloomFilter

    # structural params are immutable per index (partition ids, Bloom
    # bit-array width and signature comparability all depend on them) —
    # pinned at creation, later calls fail loudly on mismatch
    _index_meta(
        index_dir,
        {
            "kind": "minhash_bands",
            "num_partitions": num_partitions,
            "bloom_capacity": bloom_capacity,
            "num_perm": num_perm,
            "bands": bands,
            "shingle_k": shingle_k,
        },
    )

    if ds is None:
        ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    hasher_kwargs = {
        "num_perm": num_perm,
        "bands": bands,
        "shingle_k": shingle_k,
        "mode": "bands",
    }
    new_rows = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=hasher_kwargs,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=512,
        concurrency=(1, 8),
    ).materialize()  # consumed up to 3×: probe, verify, index append

    gens = (
        sorted(
            d for d in os.listdir(index_dir)
            if d.startswith("gen-") and os.path.isdir(os.path.join(index_dir, d))
        )
        if os.path.isdir(index_dir)
        else []
    )

    dup_ids: set[int] = set()
    if gens:
        merged = BloomFilter(capacity=bloom_capacity, fpp=1e-4)
        for g in gens:
            bits = np.fromfile(
                os.path.join(index_dir, g + ".bloom"), dtype=np.uint64
            )
            merged.bits |= bits
        bloom_ref = ray.put(merged)

        def probe(batch: pa.Table) -> pa.Table:
            bf = ray.get(bloom_ref)
            hit = bf.contains(batch.column("band_hash").to_numpy())
            return batch.filter(pa.array(hit))

        cand = new_rows.map_batches(
            probe, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        if cand.count() > 0:
            cand_hashes = np.fromiter(
                cand.unique("band_hash"), dtype=np.uint64
            )
            # partition pruning: candidate band hashes → their partitions
            pids = set(
                (pd.util.hash_array(cand_hashes) % np.uint64(num_partitions))
                .astype(np.int64)
                .tolist()
            )
            from ..state.manifest import data_path

            paths = [
                data_path(os.path.join(index_dir, g), p, ".parquet")
                for g in gens
                for p in sorted(pids)
                if os.path.exists(
                    data_path(os.path.join(index_dir, g), p, ".parquet")
                )
            ]
            idx_rows = ray.data.read_parquet(paths).map_batches(
                lambda t: t.filter(
                    pc.is_in(
                        t.column("band_hash"),
                        pa.array(cand_hashes, pa.uint64()),
                    )
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).take_all()
            if idx_rows:
                # verify: any (new, indexed) pair sharing a band whose
                # signature-estimated Jaccard ≥ threshold marks new as
                # dup. Fully vectorized: index rows sorted by band_hash
                # once, each batch expands its ragged per-row match
                # ranges (searchsorted left/right) into one flat stacked
                # signature compare — no per-row Python.
                from ..functions.numeric import list_column_to_matrix

                ih = np.array(
                    [r["band_hash"] for r in idx_rows], dtype=np.uint64
                )
                order = np.argsort(ih, kind="stable")
                ih = ih[order]
                imat = np.stack(
                    [np.asarray(idx_rows[i]["sig"], dtype=np.uint64) for i in order]
                )
                idx_ref = ray.put((ih, imat))

                def verify(batch: pa.Table) -> pa.Table:
                    ih_s, imat_s = ray.get(idx_ref)
                    ids = batch.column("doc_id").to_numpy()
                    bhs = batch.column("band_hash").to_numpy()
                    smat = list_column_to_matrix(
                        batch.column("sig"), dtype=np.uint64
                    )
                    lo = np.searchsorted(ih_s, bhs, side="left")
                    hi = np.searchsorted(ih_s, bhs, side="right")
                    rep = hi - lo
                    total = int(rep.sum())
                    if total == 0:
                        return pa.table({"doc_id": pa.array([], pa.int64())})
                    row = np.repeat(np.arange(len(ids)), rep)
                    start = np.cumsum(rep) - rep
                    pos = (
                        np.repeat(lo, rep)
                        + np.arange(total)
                        - np.repeat(start, rep)
                    )
                    eq = (smat[row] == imat_s[pos]).mean(axis=1)
                    dup = np.unique(ids[row[eq >= threshold]])
                    return pa.table({"doc_id": pa.array(dup, pa.int64())})

                dup_ids = set(
                    cand.map_batches(
                        verify, batch_format="pyarrow", zero_copy_batch=True
                    ).unique("doc_id")
                    or ()  # unique() → None when no candidate verified
                )

    dup_ref = ray.put(np.fromiter(dup_ids, dtype=np.int64))

    def keep_new(batch: pa.Table) -> pa.Table:
        drop = ray.get(dup_ref)
        mask = ~np.isin(batch.column("doc_id").to_numpy(), drop)
        return batch.filter(pa.array(mask))

    survivors_rows = new_rows.map_batches(
        keep_new, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    if survivors_rows.count() > 0:
        gen_name = f"gen-{len(gens):05d}"
        gen_dir = os.path.join(index_dir, gen_name)
        write_partitioned_parquet(
            survivors_rows, gen_dir, "band_hash", num_partitions=num_partitions
        )
        bf = BloomFilter(capacity=bloom_capacity, fpp=1e-4)
        for b in survivors_rows.iter_batches(
            batch_format="pyarrow", batch_size=65536
        ):
            bf.add(b.column("band_hash").to_numpy())
        tmp = os.path.join(index_dir, gen_name + f".bloom.tmp.{os.getpid()}")
        bf.bits.tofile(tmp)
        os.rename(tmp, os.path.join(index_dir, gen_name + ".bloom"))

    def ids_only(batch: pa.Table) -> pa.Table:
        return (
            batch.select(["doc_id"]).group_by(["doc_id"]).aggregate([])
        )

    from ..stages.grouped import bucketed_agg

    return bucketed_agg(
        survivors_rows.map_batches(
            ids_only, batch_format="pyarrow", zero_copy_batch=True
        ),
        "doc_id",
        "doc_id",
        how="min",
        out="__d",
    ).select_columns(["doc_id"])


# --- substring-level (duplicate-span) dedup -------------------------------
#
# The one dedup granularity the doc-level family above can't express:
# two distinct documents sharing a long verbatim passage (boilerplate,
# license headers, quoted text) keep BOTH docs under doc-level rules,
# yet the passage is still memorization fuel. Suffix-array substring
# dedup (Lee et al. 2022, "Deduplicating Training Data Makes Language
# Models Better") finds such spans exactly; a distributed suffix array
# is a heavy global sort, so this engine uses the standard scalable
# approximation at token granularity: a W-token window is duplicated
# iff its (lowercased, whitespace-tokenized) content occurs >= min_count
# times in the corpus, and maximal runs of duplicated windows merge
# into spans. Detection is exact at window granularity — a shared
# passage of length >= W tokens is always found; passages shorter than
# W never are (W is the paper's min-match length knob).


def _batch_token_windows(text_col, window: int):
    """Per-batch (row_idx, start_pos, window_hash) for every
    within-row ``window``-token window, plus the kept token layout
    (flat original-case tokens, parents) for callers that rebuild text.

    One Arrow split per batch; windows are built on LOWERCASED copies
    of the tokens (detection is case-insensitive, like the gram family)
    by numpy shifted-window concatenation over object arrays (see
    ``text._batch_grams`` for why not fixed-width U arrays). Hashes are
    the library's stable 64-bit siphash (``_stable_hash64``) — an
    8-byte shuffle key instead of a W-token string; a cross-doc hash
    collision (~2^-64 per window pair) can mark a non-duplicated window
    as duplicated, the same accept-rate trade as the Bloom path of
    ``stages/semijoin.py`` and in the SAFE direction for dedup
    (over-removal, never under-removal)."""
    toks = pc.split_pattern_regex(
        pc.coalesce(text_col, pa.scalar("", pa.string())), r"\s+"
    )
    flat_arr = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy()
    keep = pc.not_equal(flat_arr, "").to_numpy(zero_copy_only=False)
    flat = flat_arr.to_numpy(zero_copy_only=False)[keep]
    lflat = pc.utf8_lower(flat_arr).to_numpy(zero_copy_only=False)[keep]
    parents = parents[keep]
    L = len(flat)
    # token position within its own row (parents is sorted ascending)
    pos = np.arange(L, dtype=np.int64) - np.searchsorted(
        parents, parents, side="left"
    )
    if L < window:
        e = np.empty(0, dtype=np.int64)
        return e, e, np.empty(0, dtype=np.uint64), flat, parents, pos
    valid = parents[: L - window + 1] == parents[window - 1 :]
    grams = lflat[: L - window + 1]
    for j in range(1, window):
        grams = grams + " " + lflat[j : L - window + 1 + j]
    h = _stable_hash64(grams[valid])
    return (
        parents[: L - window + 1][valid],
        pos[: L - window + 1][valid],
        h,
        flat,
        parents,
        pos,
    )


def _dup_window_filter(
    ds, window: int, min_count: int, exact_threshold: int
):
    """Broadcastable membership filter over the hashes of duplicated
    ``window``-token windows (corpus occurrences >= ``min_count``).

    One 8-byte-key shuffle total: per-batch pre-aggregated (hash,
    count) partials -> COARSE 256-bucket shuffle -> one vectorized
    pandas sum + threshold per bucket task. The coarse bucket (a pure
    function of the hash, so a hash's partials always meet) replaces a
    fine-key distributed sort over tens of millions of 16-byte rows
    with a 256-value sort — measured 7x faster at 11M partial rows
    (the ``stages/grouped.py:bucketed_agg`` shape, inlined so the
    partial pre-aggregation is the ``np.unique`` already inside the
    window map — no 100M-row (hash, 1) intermediate between stages —
    and the >= min_count threshold folds into the bucket task). The
    surviving hash set rides
    :func:`stages.semijoin.build_key_filter` (exact int64 ndarray at
    or under ``exact_threshold``, streamed Bloom above — bounded
    driver memory at any corpus size)."""
    from ..stages.semijoin import build_key_filter

    num_buckets = 256

    def hash_partial(batch: pa.Table) -> pa.Table:
        _, _, h, _, _, _ = _batch_token_windows(batch.column("text"), window)
        uh, counts = np.unique(h, return_counts=True)
        return pa.table(
            {
                "wh": pa.array(uh.view(np.int64), pa.int64()),
                "n": pa.array(counts, pa.int64()),
                "b": pa.array(
                    (uh % num_buckets).astype(np.int64), pa.int64()
                ),
            }
        )

    def bucket_dups(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("wh", sort=False)["n"].sum()
        return pd.DataFrame({"wh": g.index.to_numpy()[g.to_numpy() >= min_count]})

    dups = (
        ds.map_batches(hash_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("b")
        .map_groups(bucket_dups, batch_format="pandas")
    )
    return build_key_filter(dups, "wh", exact_threshold=exact_threshold)


def _filter_contains(keys, vals_u64: np.ndarray) -> np.ndarray:
    from ..stages.semijoin import BloomFilter

    v = vals_u64.view(np.int64)
    if isinstance(keys, BloomFilter):
        return keys.contains(v)
    return np.isin(v, keys)


def duplicate_spans(
    sf_dir: str,
    window: int = 16,
    min_count: int = 2,
    exact_threshold: int = 4_000_000,
    ds: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """(doc_id, span_start, span_end, n_windows) — maximal duplicated
    token spans per document: every run of ``window``-token windows
    whose content occurs >= ``min_count`` times corpus-wide, merged
    while consecutive windows overlap or touch (gap would mean a
    non-duplicated token between them). ``span_end`` is exclusive;
    both bounds are whitespace-token positions.

    Two passes, both streaming: the count shuffle carries only (hash,
    partial count) rows, the broadcast dup-hash set is the only
    driver-resident state, and the span pass is a pure map (windows
    never cross rows, so a doc's spans complete within its batch)."""
    import ray

    if window < 2:
        raise ValueError(f"window must be >= 2 tokens, got {window}")
    if ds is None:
        ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    keys_ref = ray.put(
        _dup_window_filter(ds, window, min_count, exact_threshold)
    )

    def spans(batch: pa.Table) -> pa.Table:
        ridx, wpos, h, _, _, _ = _batch_token_windows(
            batch.column("text"), window
        )
        hit = _filter_contains(ray.get(keys_ref), h)
        ridx, wpos = ridx[hit], wpos[hit]
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "span_start": pa.array([], pa.int64()),
                "span_end": pa.array([], pa.int64()),
                "n_windows": pa.array([], pa.int64()),
            }
        )
        if len(ridx) == 0:
            return empty
        # windows arrive sorted by (row, pos); merge overlapping/adjacent
        brk = np.empty(len(ridx), dtype=bool)
        brk[0] = True
        brk[1:] = (ridx[1:] != ridx[:-1]) | (wpos[1:] > wpos[:-1] + window)
        gid = np.cumsum(brk) - 1
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(ridx)) - 1
        doc_ids = batch.column("doc_id").to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[ridx[starts]], pa.int64()),
                "span_start": pa.array(wpos[starts], pa.int64()),
                "span_end": pa.array(wpos[ends] + window, pa.int64()),
                "n_windows": pa.array(
                    np.bincount(gid).astype(np.int64), pa.int64()
                ),
            }
        )

    return ds.map_batches(spans, batch_format="pyarrow", zero_copy_batch=True)


def strip_duplicate_spans(
    sf_dir: str,
    window: int = 16,
    min_count: int = 2,
    exact_threshold: int = 4_000_000,
    ds: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """The corpus with every duplicated span (the
    :func:`duplicate_spans` regions, ALL occurrences) cut out at token
    granularity: ``text`` is replaced in place, an ``n_tokens_removed``
    column is appended, and every other input column passes through
    untouched (so the op drops into a wider stream, e.g. the curation
    funnel's (doc_id, lang, text)). Surviving tokens keep their
    original case and are re-joined with single spaces — this is a
    token-stream operator (like the paper's byte-level variant it
    normalizes the whitespace it split on); a doc that was entirely
    duplicated content comes back as "".

    Removing every occurrence (not all-but-one) is the conservative
    policy: a global keep-one choice for overlapping window families
    has no stable distributed definition, and the duplicated passages
    this targets (boilerplate, license text) are usually wanted gone
    from every copy. Same two-pass shape as :func:`duplicate_spans`."""
    import ray

    if window < 2:
        raise ValueError(f"window must be >= 2 tokens, got {window}")
    if ds is None:
        ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    keys_ref = ray.put(
        _dup_window_filter(ds, window, min_count, exact_threshold)
    )

    def strip(batch: pa.Table) -> pa.Table:
        ridx, wpos, h, flat, parents, pos = _batch_token_windows(
            batch.column("text"), window
        )
        n = len(batch)
        hit = _filter_contains(ray.get(keys_ref), h)
        ridx, wpos = ridx[hit], wpos[hit]
        L = len(flat)
        # coverage via a +1/-1 delta sweep over global token indices
        # (windows never cross rows, so start+window stays in-row)
        row_start = np.searchsorted(parents, np.arange(n), side="left")
        delta = np.zeros(L + 1, dtype=np.int64)
        gstart = row_start[ridx] + wpos
        np.add.at(delta, gstart, 1)
        np.add.at(delta, gstart + window, -1)
        covered = np.cumsum(delta[:L]) > 0
        kept = ~covered
        counts = np.bincount(parents[kept], minlength=n).astype(np.int64)
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(counts, out=offsets[1:])
        list_arr = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(flat[kept], pa.string())
        )
        total = np.bincount(parents, minlength=n).astype(np.int64)
        out = batch.set_column(
            batch.schema.get_field_index("text"),
            "text",
            pc.binary_join(list_arr, " "),
        )
        return out.append_column(
            "n_tokens_removed", pa.array(total - counts, pa.int64())
        )

    return ds.map_batches(strip, batch_format="pyarrow", zero_copy_batch=True)
