"""MediaDecoder real/fake decode modes.

The PNG fixture is generated in-process (zlib-compressed IDAT + CRC32
chunk trailers — no codec library needed to WRITE a valid minimal PNG),
so the real decode branch is exercised both with PIL (full decode) and
without it (pure-Python header probe): both must report the same
dimensions.
"""

from __future__ import annotations

import struct
import zlib

import pyarrow as pa

from mhdb_tables2turtles_ray.pipelines.multimodal import (
    MediaDecoder,
    probe_image_dims,
)


def make_png(width: int, height: int) -> bytes:
    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + b"\x10\x20\x30" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_gif(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00" * 20


def test_probe_image_dims():
    assert probe_image_dims(make_png(7, 3)) == (7, 3)
    assert probe_image_dims(make_gif(640, 480)) == (640, 480)
    try:
        probe_image_dims(b"not an image at all")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_real_decode_pipeline(ray_session):
    """Real mode decodes generated PNG/GIF payloads through the actor
    pool; garbage payloads quarantine to null dims instead of failing."""
    import ray.data

    table = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "payload": pa.array(
                [make_png(12, 5), make_gif(100, 50), b"garbage bytes"], pa.binary()
            ),
        }
    )
    out = (
        ray.data.from_arrow(table)
        .map_batches(
            MediaDecoder,
            fn_constructor_kwargs={"mode": "real"},
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=1,
        )
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert (out.loc[1, "width"], out.loc[1, "height"]) == (12, 5)
    assert (out.loc[2, "width"], out.loc[2, "height"]) == (100, 50)
    assert out.loc[3, ["width", "height"]].isna().all()
    assert out["n_bytes"].tolist() == [
        len(make_png(12, 5)),
        len(make_gif(100, 50)),
        len(b"garbage bytes"),
    ]


def test_real_matches_probe_with_or_without_pil():
    """Whichever backend is present, real decode agrees with the header
    probe on the fixture dimensions (PIL parses the same IHDR)."""
    dec = MediaDecoder(mode="real")
    assert dec._decode(make_png(33, 21)) == (33, 21)
    assert dec._decode(make_gif(9, 4)) == (9, 4)
    assert dec._decode(b"\x00\x01") == (None, None)


def test_fake_mode_unchanged():
    """Fake mode stays byte-length-derived (what the SQL oracle checks)."""
    payload = b"hello multimodal"
    batch = pa.table(
        {"doc_id": pa.array([9], pa.int64()), "payload": pa.array([payload], pa.binary())}
    )
    out = MediaDecoder(mode="fake")(batch)
    n = len(payload)
    assert out.column("width").to_pylist() == [n % 640]
    assert out.column("height").to_pylist() == [(n * 7) % 480]


def test_auto_mode_selects_available_backend():
    dec = MediaDecoder(mode="auto")
    assert dec.mode in ("real", "fake")
    try:
        import PIL  # noqa: F401

        assert dec.mode == "real"
    except ImportError:
        assert dec.mode == "fake"


def test_resizer_real_and_fake_modes():
    from mhdb_tables2turtles_ray.pipelines.multimodal import MediaResizer

    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([make_png(200, 100), b"junk"], pa.binary()),
        }
    )
    out = MediaResizer(max_dim=64, mode="real")(batch)
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    # 200x100 bounded by 64 -> scale 0.32 -> (64, 32)
    assert (rows[1]["resized_w"], rows[1]["resized_h"]) == (64, 32)
    assert rows[2]["resized_w"] is None and rows[2]["resized_h"] is None
    # resized_bytes: an actual re-encoded size iff PIL did the resize;
    # header-probe-only real mode decodes no pixels -> null
    try:
        import PIL  # noqa: F401

        assert rows[1]["resized_bytes"] > 0
    except ImportError:
        assert rows[1]["resized_bytes"] is None
    assert rows[2]["resized_bytes"] is None

    fake = MediaResizer(max_dim=64, mode="fake")(batch)
    for r in fake.to_pylist():
        assert r["resized_w"] <= 64 and r["resized_h"] <= 64
        assert r["resized_bytes"] is None
