"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Decode modes (``MediaDecoder``): ``"real"`` decodes actual image
payloads — PIL when importable, else a pure-Python container header
probe (PNG/GIF/BMP — the dimension fields sit at fixed offsets in each
format's public spec, so no codec is needed to read them); undecodable
payloads quarantine to null dimensions rather than failing the batch.
``"fake"`` derives deterministic metadata from the byte length — the
no-codec fallback the SQL oracle checks against this container's
text-bytes test payloads. ``"auto"`` picks real iff PIL is present.

Scale note: binary payloads make rows wide — these stages use a small
``batch_size`` and ``batch_format="pyarrow"`` (binary columns round-trip
zero-copy through Arrow; pandas would object-box them).
"""

from __future__ import annotations

import hashlib
import io
import struct

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..sources.tables import read_table


def probe_image_dims(payload: bytes) -> tuple[int, int]:
    """(width, height) from an image container header, pure Python.

    PNG: 8-byte signature, then the IHDR chunk whose first 8 data bytes
    are width/height as big-endian uint32. GIF: 6-byte version tag then
    the logical-screen size as little-endian uint16s. BMP: 'BM' magic,
    width/height as little-endian int32 at offset 18. Raises
    ``ValueError`` for anything else."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        w, h = struct.unpack(">II", payload[16:24])
        return int(w), int(h)
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return int(w), int(h)
    if payload[:2] == b"BM" and len(payload) >= 26:
        w, h = struct.unpack("<ii", payload[18:26])
        return int(w), int(abs(h))
    raise ValueError("unrecognized image container")


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

    ``__init__`` probes for PIL ONCE per actor. Output schema is
    identical in every mode: (doc_id, n_bytes, sha256, width, height) —
    real mode quarantines undecodable payloads to null width/height.
    """

    def __init__(self, mode: str = "fake"):
        try:
            from PIL import Image

            self._pil = Image
        except ImportError:
            self._pil = None
        if mode == "auto":
            mode = "real" if self._pil else "fake"
        if mode not in ("real", "fake"):
            raise ValueError(f"unknown decode mode: {mode!r}")
        self.mode = mode

    def _decode(self, payload: bytes) -> tuple[int | None, int | None]:
        if self._pil is not None:
            try:
                with self._pil.open(io.BytesIO(payload)) as img:
                    return int(img.width), int(img.height)
            except Exception:
                pass  # fall through to the header probe
        try:
            return probe_image_dims(payload)
        except ValueError:
            return None, None  # quarantine: not an image this decoder reads

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        n_bytes = [len(p) for p in payloads]
        sha = [hashlib.sha256(p).hexdigest() for p in payloads]
        if self.mode == "real":
            dims = [self._decode(p) for p in payloads]
            width = [d[0] for d in dims]
            height = [d[1] for d in dims]
        else:
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


def payload_meta(
    sf_dir: str, concurrency=(1, 4), batch_size: int = 1024, mode: str = "fake"
) -> ray.data.Dataset:
    """(doc_id, n_bytes, sha256, width, height) via the decoder pool."""
    return binary_payloads(sf_dir).map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"mode": mode},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


class MediaResizer:
    """Actor-pool resize stage (decode → bounded-box scale).

    Real mode WITH PIL actually resizes: ``thumbnail`` (aspect-
    preserving, bounded by ``max_dim``), PNG re-encode, and
    ``resized_bytes`` = the re-encoded size. Real mode WITHOUT PIL
    (header-probe-only container) computes the scaled dimensions
    arithmetically — no pixel data is decoded, so ``resized_bytes`` is
    null. Fake mode scales the deterministic fake dimensions with the
    same floor arithmetic the SQL oracle reproduces (``resized_bytes``
    null). Output schema is identical in every mode:
    (doc_id, width, height, resized_w, resized_h, resized_bytes).
    """

    def __init__(self, max_dim: int = 64, mode: str = "fake"):
        self.max_dim = max_dim
        self.decoder = MediaDecoder(mode=mode)

    def __call__(self, batch: pa.Table) -> pa.Table:
        meta = self.decoder(batch)
        width = meta.column("width").to_pylist()
        height = meta.column("height").to_pylist()
        pil = self.decoder._pil if self.decoder.mode == "real" else None
        payloads = batch.column("payload").to_pylist() if pil else None
        rw, rh, rb = [], [], []
        for i, (w, h) in enumerate(zip(width, height)):
            if w is None or h is None:
                rw.append(None)
                rh.append(None)
                rb.append(None)
                continue
            if pil is not None:
                try:
                    with pil.open(io.BytesIO(payloads[i])) as img:
                        img.thumbnail((self.max_dim, self.max_dim))
                        buf = io.BytesIO()
                        img.save(buf, format="PNG")
                        rw.append(int(img.width))
                        rh.append(int(img.height))
                        rb.append(buf.getbuffer().nbytes)
                        continue
                except Exception:
                    pass  # dims came from the header probe; no pixels
            scale = min(1.0, self.max_dim / max(w, h, 1))
            rw.append(int(w * scale))
            rh.append(int(h * scale))
            rb.append(None)
        return pa.table(
            {
                "doc_id": meta.column("doc_id"),
                "width": meta.column("width"),
                "height": meta.column("height"),
                "resized_w": pa.array(rw, pa.int64()),
                "resized_h": pa.array(rh, pa.int64()),
                "resized_bytes": pa.array(rb, pa.int64()),
            }
        )


def resize_meta(
    sf_dir: str, max_dim: int = 64, concurrency=(1, 4), batch_size: int = 1024
) -> ray.data.Dataset:
    """(doc_id, width, height, resized_w, resized_h) via the resizer
    actor pool (fake decode mode — the oracle-checkable variant;
    ``resized_bytes`` is always null in fake mode, so it is dropped
    from the oracle surface)."""
    return binary_payloads(sf_dir).map_batches(
        MediaResizer,
        fn_constructor_kwargs={"max_dim": max_dim},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    ).select_columns(["doc_id", "width", "height", "resized_w", "resized_h"])


def media_meta(
    sf_dir: str,
    max_dim: int = 64,
    chunk: int = 64,
    stride: int = 4,
    concurrency=(1, 4),
    batch_size: int = 1024,
    mode: str = "fake",
) -> ray.data.Dataset:
    """The whole multimodal metadata surface from ONE decode pass:
    (doc_id, n_bytes, sha256, width, height, n_frames, n_sampled,
    resized_w, resized_h) — decode (actor pool), frame-stream sampling
    arithmetic and bounded-box resize arithmetic appended vectorized to
    the decoder's output instead of re-reading payloads per op. This is
    the consolidated oracled registry entry; :func:`payload_meta` /
    :func:`frame_sample` / :func:`resize_meta` remain the per-op library
    surfaces."""
    import numpy as np

    base = payload_meta(
        sf_dir, concurrency=concurrency, batch_size=batch_size, mode=mode
    )

    def extend(batch: pa.Table) -> pa.Table:
        n = batch.column("n_bytes").to_numpy()
        n_frames = (n + chunk - 1) // chunk
        n_sampled = (n_frames + stride - 1) // stride
        # width/height may carry nulls in real mode (quarantined
        # payloads) — compute through float NaN and mask back
        wf = batch.column("width").to_numpy(zero_copy_only=False).astype(np.float64)
        hf = batch.column("height").to_numpy(zero_copy_only=False).astype(np.float64)
        scale = np.minimum(1.0, max_dim / np.maximum(np.maximum(wf, hf), 1.0))
        rw = np.floor(wf * scale)
        rh = np.floor(hf * scale)
        mask = np.isnan(rw)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bytes": batch.column("n_bytes"),
                "sha256": batch.column("sha256"),
                "width": batch.column("width"),
                "height": batch.column("height"),
                "n_frames": pa.array(n_frames, pa.int64()),
                "n_sampled": pa.array(n_sampled, pa.int64()),
                "resized_w": pa.array(
                    np.where(mask, 0, rw).astype(np.int64), pa.int64(), mask=mask
                ),
                "resized_h": pa.array(
                    np.where(mask, 0, rh).astype(np.int64), pa.int64(), mask=mask
                ),
            }
        )

    return base.map_batches(extend, batch_format="pyarrow", zero_copy_batch=True)


def frame_sample(sf_dir: str, chunk: int = 64, stride: int = 4) -> ray.data.Dataset:
    """Treat each payload as a frame stream: ``chunk``-byte frames,
    every ``stride``-th sampled. (doc_id, n_frames, n_sampled)."""
    import numpy as np

    ds = binary_payloads(sf_dir)

    def sample(batch: pa.Table) -> pa.Table:
        n_bytes = (
            pc.binary_length(batch.column("payload"))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        n_frames = (n_bytes + chunk - 1) // chunk
        n_sampled = (n_frames + stride - 1) // stride
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_frames": pa.array(n_frames, pa.int64()),
                "n_sampled": pa.array(n_sampled, pa.int64()),
            }
        )

    return ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)
