"""Raw JSON sources (S1/S2/S8): array files, calendar envelopes, NDJSON."""

from __future__ import annotations

import json

from scraper_db_refine_merge_spark.sources.rawjson import (
    bulk_copy,
    read_calendar_export,
    read_json_array,
    read_ndjson,
)

EVENTS = [
    {"title": "Opening Party", "url": "https://x.test/1", "venue": "Amnesia"},
    {"title": "Closing Party", "url": "https://x.test/2", "venue": "DC10"},
]


def test_read_json_array(spark, tmp_path):
    p = tmp_path / "events.json"
    p.write_text(json.dumps(EVENTS))
    df = read_json_array(spark, str(p))
    assert df.count() == 2
    assert {r["title"] for r in df.collect()} == {"Opening Party", "Closing Party"}


def test_read_calendar_export(spark, tmp_path):
    p = tmp_path / "calendar.json"
    p.write_text(
        json.dumps(
            {
                "metadata": {"source": "ibiza-spotlight", "scraper_version": "fast_v1.0"},
                "events": EVENTS,
            }
        )
    )
    df = read_calendar_export(spark, str(p))
    rows = df.collect()
    assert len(rows) == 2
    # envelope metadata is carried onto every event row
    assert all(r["source"] == "ibiza-spotlight" for r in rows)
    assert {r["venue"] for r in rows} == {"Amnesia", "DC10"}


def test_read_ndjson_quarantines_corrupt(spark, tmp_path):
    p = tmp_path / "feed.ndjson"
    p.write_text('{"title": "ok", "url": "u"}\n{not json at all\n')
    df = read_ndjson(spark, str(p), schema="title string, url string, _corrupt_record string")
    rows = df.collect()
    assert len(rows) == 2
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(good) == 1 and good[0]["title"] == "ok"
    assert len(bad) == 1  # malformed row kept for quarantine, not dropped


def test_bulk_copy_appends(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    spark.range(5).write.parquet(src)
    spark.range(3).write.parquet(dst)
    assert bulk_copy(spark, src, dst) == 5
    assert spark.read.parquet(dst).count() == 8
