"""Image decode path (multimodal/binary.py): real stdlib BMP decode
(VERDICT r12 item 6 — the audio lane's PCM precedent), stand-in fallback,
and the Arrow-batched extract_image_features plumbing."""

from __future__ import annotations

import struct

import pytest

from scraper_db_refine_merge_spark.multimodal.binary import (
    FEATURE_DIM,
    decode_bmp,
    extract_image_features,
    pil_available,
    real_image_features,
)


def _bmp_bytes(pixels, bpp: int = 24, topdown: bool = False) -> bytes:
    """Minimal BITMAPINFOHEADER BMP from rows of (r, g, b) tuples (top row
    first in ``pixels``; written bottom-up unless ``topdown``)."""
    h = len(pixels)
    w = len(pixels[0])
    bytespp = bpp // 8
    stride = ((w * bytespp + 3) // 4) * 4
    body = bytearray()
    rows = pixels if topdown else pixels[::-1]
    for row in rows:
        line = bytearray()
        for r, g, b in row:
            line += bytes([b, g, r] + ([0] if bpp == 32 else []))
        line += b"\x00" * (stride - len(line))
        body += line
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if topdown else h), 1, bpp, 0,
        len(body), 2835, 2835, 0, 0,
    )
    return bytes(header + dib + body)


def test_decode_bmp_roundtrip_both_orientations():
    px = [
        [(255, 0, 0), (0, 255, 0)],
        [(0, 0, 255), (255, 255, 255)],
    ]
    for topdown in (False, True):
        for bpp in (24, 32):
            w, h, rows = decode_bmp(_bmp_bytes(px, bpp=bpp, topdown=topdown))
            assert (w, h) == (2, 2)
            # integer BT.601 luma of the same top-first pixel grid
            assert rows == [[299 * 255 // 1000, 587 * 255 // 1000],
                            [114 * 255 // 1000, 255]]


def test_decode_bmp_rejects_non_bmp_and_compressed():
    with pytest.raises(NotImplementedError):
        decode_bmp(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    blob = bytearray(_bmp_bytes([[(1, 2, 3)]]))
    struct.pack_into("<I", blob, 30, 1)  # BI_RLE8 compression flag
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(blob))


@pytest.mark.skipif(pil_available(), reason="stdlib path only runs sans Pillow")
def test_real_image_features_bmp_solid_gray():
    # solid mid-gray: every thumbnail cell averages to exactly 128 luma
    px = [[(128, 128, 128)] * 16 for _ in range(16)]
    w, h, feats = real_image_features(_bmp_bytes(px))
    assert (w, h) == (16, 16)
    assert len(feats) == FEATURE_DIM
    expected = 128.0 / 255.0 * 2.0 - 1.0
    assert all(abs(f - expected) < 1e-12 for f in feats)
    # deterministic across calls
    assert real_image_features(_bmp_bytes(px))[2] == feats


def test_extract_image_features_modes(spark):
    bmp = _bmp_bytes([[(10, 20, 30), (200, 100, 50)], [(0, 0, 0), (255, 255, 255)]])
    rows = [
        ("i1", "image", bmp),
        ("i2", "image", b"not-an-image-blob-compressed"),
        ("a1", "audio", bmp),  # wrong type → filtered out
    ]
    media = spark.createDataFrame(
        rows, "media_id string, media_type string, content binary"
    )

    by_id = {r["media_id"]: r for r in extract_image_features(media, "auto").collect()}
    assert set(by_id) == {"i1", "i2"}
    assert (by_id["i1"]["width"], by_id["i1"]["height"]) == (2, 2)
    assert by_id["i2"]["width"] is None  # stand-in fallback
    assert len(by_id["i1"]["features"]) == FEATURE_DIM == len(by_id["i2"]["features"])
    assert all(-1.0 <= f <= 1.0 for f in by_id["i1"]["features"])

    stand_in = {r["media_id"]: r for r in extract_image_features(media, "never").collect()}
    assert all(r["width"] is None for r in stand_in.values())
    assert stand_in["i1"]["content_hash"] == by_id["i1"]["content_hash"]

    with pytest.raises(Exception, match="NotImplementedError|PythonException"):
        extract_image_features(media, "always").collect()
