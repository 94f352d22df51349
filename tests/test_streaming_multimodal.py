"""Streaming ingestion (ST1-ST5) and multimodal plumbing tests."""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F

from scraper_db_refine_merge_spark.multimodal.binary import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    decode_image,
    extract_features,
    media_stats,
    sample_video_frames,
)
from scraper_db_refine_merge_spark.streaming.pipeline import (
    fresh_rows,
    refresh_queue,
    stream_ingest,
    windowed_event_counts,
)

NOW = datetime(2025, 5, 1, 12, 0, 0, tzinfo=timezone.utc)


def _raw_event(i: int, title: str) -> dict:
    return {
        "title": title,
        "url": f"https://www.example.com/events/{i}",
        "venue": "amnesia",
        "date_text": f"{(i % 28) + 1} May 2025",
        "lineup": [{"name": f"DJ {i}", "role": "dj"}],
        "price_text": "30€",
        "genres": ["techno"],
        "description": f"evt {i}",
    }


@pytest.mark.slow
def test_stream_ingest_upserts(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    target = str(tmp_path / "events_table")
    metrics = str(tmp_path / "metrics")
    ckpt1, ckpt2 = str(tmp_path / "ck1"), str(tmp_path / "ck2")

    with open(landing / "batch1.json", "w") as f:
        for i in range(5):
            f.write(json.dumps(_raw_event(i, f"Stream Party {i}")) + "\n")
    q = stream_ingest(spark, str(landing), target, ckpt1, metrics_path=metrics)
    q.awaitTermination(120)
    assert spark.read.parquet(target).count() == 5

    # re-scrape: same (title, date_text) → same event_id → upsert, plus 2 new
    with open(landing / "batch2.json", "w") as f:
        for i in range(3, 8):
            f.write(json.dumps(_raw_event(i, f"Stream Party {i}")) + "\n")
    q2 = stream_ingest(spark, str(landing), target, ckpt2, metrics_path=metrics)
    q2.awaitTermination(120)

    final = spark.read.parquet(target)
    # ckpt2 is fresh so batch2 re-reads both files → still 8 unique events
    assert final.count() == 8
    assert final.select("event_id").distinct().count() == 8

    m = spark.read.parquet(metrics)
    assert m.count() >= 2
    assert {r["inserted"] for r in m.collect()} >= {5}


def test_fresh_rows_and_refresh_queue(spark):
    rows = [
        ("e1", "https://x/1", (NOW - timedelta(hours=1)).isoformat(), "2025-06-01T23:00:00Z", False),
        ("e2", "https://x/2", (NOW - timedelta(days=10)).isoformat(), "2025-06-01T23:00:00Z", False),
        ("e3", "https://x/3", (NOW - timedelta(days=40)).isoformat(), "2025-06-01T23:00:00Z", False),
        ("e4", "https://x/4", (NOW - timedelta(hours=2)).isoformat(), "2025-06-01T23:00:00Z", True),
    ]
    df = spark.createDataFrame(
        rows, "event_id string, url string, scraped string, start string, flagged boolean"
    ).select(
        "event_id",
        F.struct(
            F.col("url").alias("source_url"), F.col("scraped").alias("last_scraped")
        ).alias("scraping_metadata"),
        F.struct(F.col("start").alias("start_date")).alias("datetime"),
        F.struct(F.col("flagged").alias("needs_refresh")).alias("system_flags"),
    )
    fresh = fresh_rows(df, "scraping_metadata.last_scraped", max_age_hours=24, now=NOW)
    assert {r["event_id"] for r in fresh.collect()} == {"e1", "e4"}

    queue = {r["event_id"]: r["reason"] for r in refresh_queue(df, now=NOW).collect()}
    assert queue == {
        "e2": "stale_scrape",
        "e3": "stale_scrape",
        "e4": "explicit_refresh_request",
    }


def test_windowed_counts_batch_analog(spark):
    from scraper_db_refine_merge_spark.sources.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "events")
    w = windowed_event_counts(e).collect()
    assert sum(r["event_count"] for r in w) == e.count()
    assert len(w) == 30  # one window per January day


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("img1", "image", "image/png", b"\x89PNG fake image bytes 1", ("https://x/1.png", 100, 50, None, 23)),
        ("img2", "image", "image/jpeg", b"\xff\xd8 fake jpeg 2", ("https://x/2.jpg", 64, 64, None, 12)),
        ("aud1", "audio", "audio/wav", b"RIFF fake wav", ("https://x/a.wav", None, None, 1000, 13)),
        ("vid1", "video", "video/mp4", b"\x00" * 200000, ("https://x/v.mp4", 1920, 1080, 60000, 200000)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).cache()


def test_media_feature_extraction(media):
    feats = extract_features(media).collect()
    by_id = {r["media_id"]: r for r in feats}
    assert len(by_id) == 4
    for r in feats:
        assert len(r["features"]) == FEATURE_DIM
        assert all(-1.0 <= x <= 1.0 for x in r["features"])
    # deterministic across runs
    again = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    assert again == {k: v["features"] for k, v in by_id.items()}


def test_video_frame_sampling(media):
    frames = sample_video_frames(media, every_n_bytes=1 << 16).collect()
    assert {f["media_id"] for f in frames} == {"vid1"}
    assert [f["frame_index"] for f in sorted(frames, key=lambda f: f["frame_offset"])] == [0, 1, 2, 3]


def test_media_stats_prunes_blob(spark, media, tmp_path):
    stats = {r["media_type"]: r["n"] for r in media_stats(media).collect()}
    assert stats == {"image": 2, "audio": 1, "video": 1}
    # against a parquet scan, column pruning must exclude the blob column
    path = str(tmp_path / "media")
    media.write.parquet(path)
    plan = media_stats(spark.read.parquet(path))._jdf.queryExecution().executedPlan().toString()
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "content" not in read_schema[0]


def test_decode_image_raises_without_pillow():
    from scraper_db_refine_merge_spark.multimodal.binary import pil_available

    if pil_available():
        pytest.skip("Pillow present — covered by test_extract_image_features_real_decoder")
    with pytest.raises(NotImplementedError):
        decode_image(b"not an image")


def test_extract_image_features_fallback(media):
    """use_decoder='never': md5 stand-in features, NULL dims — the
    replay-stable path that works in any environment."""
    from scraper_db_refine_merge_spark.multimodal.binary import extract_image_features

    rows = {r["media_id"]: r for r in extract_image_features(media, use_decoder="never").collect()}
    assert set(rows) == {"img1", "img2"}  # image rows only
    for r in rows.values():
        assert r["width"] is None and r["height"] is None
        assert len(r["features"]) == FEATURE_DIM
        assert all(-1.0 <= x <= 1.0 for x in r["features"])


def test_extract_image_features_real_decoder(spark):
    """Real Pillow path: decode → true dims + 8×8 grayscale thumbnail
    features. Skipped where the container ships no imaging library."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from scraper_db_refine_merge_spark.multimodal.binary import extract_image_features

    buf = io.BytesIO()
    Image.new("RGB", (20, 10), color=(255, 0, 0)).save(buf, format="PNG")
    rows = [("real1", "image", "image/png", buf.getvalue(), ("https://x/r.png", None, None, None, len(buf.getvalue())))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = extract_image_features(media, use_decoder="always").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["width"], r["height"]) == (20, 10)
    assert len(r["features"]) == FEATURE_DIM
    # uniform red image → uniform grayscale thumbnail → constant features
    assert len(set(r["features"])) == 1
