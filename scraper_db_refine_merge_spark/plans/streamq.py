"""q57 — ST1 streaming ingest under the oracle gate (VERDICT r1 item 7).

A deterministic batch replay of the REAL streaming path: three raw JSON
batches derived from ``documents`` land in a temp directory, Structured
Streaming (``stream_ingest``: readStream → refine → foreachBatch MERGE,
availableNow, maxFilesPerTrigger=1) ingests them in mtime order, and the
query returns the final merged table state. Batches 1/2 re-scrape subsets
(doc_id % 3 == 0, then % 5 == 0) with new descriptions, so the final state
verifies MERGE's last-writer-wins upsert semantics end-to-end — landing →
refine → keyed MERGE — not just the per-operator pieces.

The oracle reconstructs the expected final state in SQL: per event, the
description of the LAST batch that scraped it, plus the refine-normalized
title/venue/type/genre columns (the q50-proved mirrors). ``refine`` runs
with a fixed ``now`` so scrape timestamps are replay-stable. uuid5 event
ids stay out of the projection (DuckDB has no sha1; they are golden-tested
in test_functions).

Driver-sized input generation (collecting doc_ids to write landing JSON) is
test harnessing, not the operator — the ingest itself is the streaming
engine over files.
"""

from __future__ import annotations

import json
import os
import tempfile
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ..streaming.pipeline import stream_ingest

QUERIES: dict = {}
ORACLES: dict = {}

_NOW = datetime(2025, 6, 1, tzinfo=timezone.utc)


def _raw_row(m: int, version: int) -> dict:
    title = f"Stream Festival {m}" if m % 7 == 0 else f"Stream Event {m}"
    venue = "amnesia" if m % 3 == 0 else ("Main Room" if m % 3 == 1 else "hi ibiza")
    return {
        "title": title,
        "url": f"https://stream.example.com/e/{m}",
        "venue": venue,
        "date_text": f"2025-05-{m % 28 + 1:02d}",
        "lineup": [],
        "price_text": "10€",
        "genres": ["tech house"],
        "description": f"v{version}",
        "scraped_at": f"2025-05-0{version + 1}T00:00:00+00:00",
    }


def q57_stream_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    ids = [r[0] for r in d.select("doc_id").collect()]

    root = tempfile.mkdtemp(prefix="q57_stream_")
    landing = os.path.join(root, "landing")
    os.makedirs(landing)
    batches = [
        (0, ids),
        (1, [m for m in ids if m % 3 == 0]),
        (2, [m for m in ids if m % 5 == 0]),
    ]
    for version, members in batches:
        path = os.path.join(landing, f"batch_{version}.json")
        with open(path, "w") as f:
            for m in members:
                f.write(json.dumps(_raw_row(m, version)) + "\n")
        t = 1_700_000_000 + version * 60  # strict mtime order → batch order
        os.utime(path, (t, t))

    target = os.path.join(root, "events")
    q = stream_ingest(
        spark,
        landing,
        target,
        os.path.join(root, "ckpt"),
        source_platform="stream.example.com",
        max_files_per_trigger=1,
        now=_NOW,
    )
    q.awaitTermination(300)

    t = spark.read.parquet(target)
    return t.select(
        F.col("title"),
        F.col("venue_name"),
        F.col("type").alias("event_type"),
        F.col("content.full_description").alias("description"),
        F.col("music.primary_genre").alias("primary_genre"),
        F.col("ticketing.tiers")[0]["tier_price"].alias("tier_price"),
        F.col("scraping_metadata.last_scraped").alias("last_scraped"),
    )


QUERIES["q57_stream_replay"] = q57_stream_replay
# Expected final table state: last batch that scraped each event wins
# (b2 ⊃ m%5=0 beats b1 ⊃ m%3=0 beats b0 ⊃ all); title/venue/type/genre
# mirror refine's normalizations, last_scraped is the fixed replay `now`.
ORACLES["q57_stream_replay"] = """
    SELECT
        CASE WHEN doc_id % 7 = 0 THEN 'Stream Festival ' || CAST(doc_id AS VARCHAR)
             ELSE 'Stream Event ' || CAST(doc_id AS VARCHAR) END AS title,
        CASE WHEN doc_id % 3 = 0 THEN 'Amnesia'
             WHEN doc_id % 3 = 1 THEN 'Main Room'
             ELSE 'Hï Ibiza' END AS venue_name,
        CASE WHEN doc_id % 7 = 0 THEN 'festival' ELSE 'club_night' END AS event_type,
        CASE WHEN doc_id % 5 = 0 THEN 'v2'
             WHEN doc_id % 3 = 0 THEN 'v1'
             ELSE 'v0' END AS description,
        'Tech House' AS primary_genre,
        CAST(10.0 AS DOUBLE) AS tier_price,
        '2025-06-01T00:00:00+00:00' AS last_scraped
    FROM documents
"""
