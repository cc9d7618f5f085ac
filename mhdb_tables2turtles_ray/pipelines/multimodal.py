"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container ships no image/audio codecs, so the DECODE step is gated:
real decoding raises ``NotImplementedError`` unless the optional lib
exists; a deterministic fake derives metadata from the bytes instead.
Everything Ray-side — schema (binary column + metadata), actor-pool
stage shape, batch sizing, output layout — is real and tested.

Scale note: binary payloads make rows wide — these stages use a small
``batch_size`` and ``batch_format="pyarrow"`` (binary columns round-trip
zero-copy through Arrow; pandas would object-box them).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..sources.tables import read_table


def binary_payloads(sf_dir: str) -> ray.data.Dataset:
    """documents → (doc_id, payload: binary, media_type) — the opaque
    multimodal column with typed metadata."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def encode(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "payload": pc.cast(batch.column("text"), pa.binary()),
                "media_type": pc.binary_join_element_wise(
                    pa.array(["image/fake"] * batch.num_rows),
                    pc.cast(batch.column("source"), pa.string()),
                    ";src=",
                ),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)


class MediaDecoder:
    """Actor-pool decode/feature-extract stage.

    ``__init__`` probes for a real codec ONCE per actor (PIL); absent →
    deterministic fake mode: width/height derived from payload length.
    Real mode is a clearly marked stub — the Ray plumbing is the point.
    """

    def __init__(self, require_real: bool = False):
        try:
            import PIL.Image  # noqa: F401

            self.real = True
        except ImportError:
            self.real = False
        if require_real and not self.real:
            raise NotImplementedError(
                "real image decode requires PIL, not shipped in this container"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real:
            raise NotImplementedError(
                "real decode path stubbed: wire PIL.Image.open over payload bytes here"
            )
        payloads = batch.column("payload").to_pylist()
        n_bytes = [len(p) for p in payloads]
        sha = [hashlib.sha256(p).hexdigest() for p in payloads]
        width = [n % 640 for n in n_bytes]
        height = [(n * 7) % 480 for n in n_bytes]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "sha256": pa.array(sha, pa.string()),
                "width": pa.array(width, pa.int64()),
                "height": pa.array(height, pa.int64()),
            }
        )


def payload_meta(sf_dir: str, concurrency=(1, 4), batch_size: int = 1024) -> ray.data.Dataset:
    """(doc_id, n_bytes, sha256, width, height) via the decoder pool."""
    return binary_payloads(sf_dir).map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_sample(sf_dir: str, chunk: int = 64, stride: int = 4) -> ray.data.Dataset:
    """Treat each payload as a frame stream: ``chunk``-byte frames,
    every ``stride``-th sampled. (doc_id, n_frames, n_sampled)."""
    ds = binary_payloads(sf_dir)

    def sample(batch: pa.Table) -> pa.Table:
        n_bytes = [len(p) for p in batch.column("payload").to_pylist()]
        n_frames = [(n + chunk - 1) // chunk for n in n_bytes]
        n_sampled = [(f + stride - 1) // stride for f in n_frames]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_frames": pa.array(n_frames, pa.int64()),
                "n_sampled": pa.array(n_sampled, pa.int64()),
            }
        )

    return ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)
