"""Tests: cross-source canonicalization (J5), extraction coalesce (J8),
SQLite bronze source (S3/S4) end-to-end into refine."""

from __future__ import annotations

import json
import sqlite3
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from scraper_db_refine_merge_spark.operators.canonicalize import (
    canonical_only,
    canonicalize,
    extraction_coalesce,
)
from scraper_db_refine_merge_spark.refine import refine
from scraper_db_refine_merge_spark.sources.sqlite import (
    read_sqlite_local,
    sqlite_to_raw_rows,
)

NOW = datetime(2025, 5, 1, 12, 0, 0, tzinfo=timezone.utc)

RAW_SCHEMA = (
    "title string, url string, venue string, date_text string, "
    "lineup array<struct<name:string,role:string>>, price_text string, "
    "genres array<string>, description string"
)


@pytest.mark.slow
def test_canonicalize_cross_source(spark):
    # same real-world event scraped from two platforms (different urls,
    # whitespace/case variance), plus an unrelated event
    a = spark.createDataFrame(
        [("Glitterbox", "https://a.example.com/1", "hi ibiza", "25 May 2025",
          [("Dave Lee", "headliner")], "50€", ["house"], "desc A")],
        RAW_SCHEMA,
    )
    b = spark.createDataFrame(
        [("  GLITTERBOX ", "https://b.example.com/9", "Hï Ibiza", "Sunday 25 May 2025",
          None, None, None, None),
         ("Other Party", "https://b.example.com/10", "pacha", "26 May 2025",
          None, None, None, None)],
        RAW_SCHEMA,
    )
    events = refine(a, "platform-a", now=NOW).unionByName(refine(b, "platform-b", now=NOW))
    out = canonicalize(events).cache()

    glitter = out.filter(F.lower(F.trim(F.col("title"))) == "glitterbox").collect()
    assert len(glitter) == 2
    canon = [r for r in glitter if r["deduplication"]["is_canonical"]]
    dup = [r for r in glitter if not r["deduplication"]["is_canonical"]]
    assert len(canon) == 1 and len(dup) == 1
    # both members share the canonical id; canonical carries the merge list
    assert dup[0]["canonical_id"] == canon[0]["event_id"]
    assert canon[0]["deduplication"]["merged_from_ids"] == [dup[0]["event_id"]]
    assert canon[0]["deduplication"]["merge_log"]
    # richer record (platform-a with lineup+price → higher quality) wins
    assert canon[0]["scraping_metadata"]["source_platform"] == "platform-a"

    other = out.filter(F.col("title") == "Other Party").first()
    assert other["deduplication"]["is_canonical"] is True
    assert other["deduplication"]["merged_from_ids"] == []

    assert canonical_only(events).count() == 2


def test_extraction_coalesce(spark):
    df = spark.createDataFrame(
        [
            (None, "WP Title", "Meta Title", None, "https://jsonld/x", None),
            ("LD Title", None, None, "Pattern T", None, "https://pattern/y"),
        ],
        "jsonld_title string, wp_title string, meta_title string, pattern_title string, "
        "jsonld_url string, pattern_url string",
    )
    out = extraction_coalesce(
        df,
        {
            "title": ["jsonld_title", "wp_title", "meta_title", "pattern_title"],
            "tickets_url": ["jsonld_url", "pattern_url"],
        },
    ).collect()
    assert [r["title"] for r in out] == ["WP Title", "LD Title"]
    assert [r["tickets_url"] for r in out] == ["https://jsonld/x", "https://pattern/y"]


@pytest.fixture()
def sqlite_db(tmp_path):
    path = str(tmp_path / "ventura.db")
    conn = sqlite3.connect(path)
    conn.execute(
        """CREATE TABLE scraped_events (
            url_hash TEXT PRIMARY KEY, url TEXT UNIQUE, title TEXT,
            event_data TEXT, extraction_method TEXT, last_scraped_utc TEXT,
            success INTEGER, error_message TEXT, response_time_ms REAL,
            status_code INTEGER)"""
    )
    good = json.dumps(
        {
            "title": "DB Party 2025",
            "venue": "amnesia",
            "date_text": "20 May 2025",
            "price_text": "40€",
            "lineup": [{"name": "DB DJ", "role": "dj"}],
            "genres": ["techno"],
            "description": "from sqlite",
        }
    )
    rows = [
        ("h1", "https://x/1", "DB Party 2025", good, "jsonld", "2025-05-01T00:00:00", 1, None, 120.5, 200),
        ("h2", "https://x/2", "Failed", None, "fallback", "2025-05-01T00:00:00", 0, "boom", 50.0, 500),
        ("h3", "https://x/3", "NoData", None, "jsonld", "2025-05-01T00:00:00", 1, None, 80.0, 200),
    ]
    conn.executemany("INSERT INTO scraped_events VALUES (?,?,?,?,?,?,?,?,?,?)", rows)
    conn.commit()
    conn.close()
    return path


@pytest.mark.slow
def test_sqlite_bronze_to_refine(spark, sqlite_db):
    bronze = read_sqlite_local(spark, sqlite_db)
    # ETL filter: success=1 AND event_data IS NOT NULL → only h1
    assert bronze.count() == 1
    raw = sqlite_to_raw_rows(bronze)
    refined = refine(raw, "sqlite-etl", now=NOW)
    row = refined.first()
    assert row["title"] == "DB Party 2025"
    assert row["venue"]["name"] == "Amnesia"
    assert row["ticketing"]["tiers"][0]["tier_price"] == 40.0
    assert row["acts"][0]["act_name"] == "DB DJ"


def test_sqlite_upsert_sink_roundtrip(spark, tmp_path):
    """S13: INSERT OR REPLACE keyed by url_hash — second write replaces."""
    from scraper_db_refine_merge_spark.sources.sqlite import (
        ensure_scraped_events_table,
        read_sqlite_local,
        write_sqlite_upsert,
    )

    db = str(tmp_path / "ops.db")
    ensure_scraped_events_table(db)
    schema = (
        "url_hash string, url string, title string, event_data string, "
        "extraction_method string, last_scraped_utc string, success int, "
        "error_message string, response_time_ms double, status_code int"
    )
    v1 = spark.createDataFrame(
        [
            ("h1", "u1", "Party v1", "{}", "jsonld", "2025-01-01T00:00:00", 1, None, 120.0, 200),
            ("h2", "u2", "Other", "{}", "meta", "2025-01-01T00:00:00", 1, None, 90.0, 200),
        ],
        schema,
    )
    write_sqlite_upsert(v1, db, "scraped_events", key_col="url_hash")
    v2 = spark.createDataFrame(
        [("h1", "u1", "Party v2", "{}", "jsonld", "2025-01-02T00:00:00", 1, None, 100.0, 200)],
        schema,
    )
    write_sqlite_upsert(v2, db, "scraped_events", key_col="url_hash")

    back = {r["url_hash"]: r["title"] for r in read_sqlite_local(spark, db, "scraped_events").collect()}
    assert back == {"h1": "Party v2", "h2": "Other"}
