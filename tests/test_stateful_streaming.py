"""applyInPandasWithState sessionization: closed sessions emitted, open
sessions retained in state across micro-batches."""

from __future__ import annotations

import json
import os

from scraper_db_refine_merge_spark.streaming.stateful import sessionize_stream

STREAM_SCHEMA = "user_id long, ts timestamp, value double"


def _write_batch(path: str, rows: list[dict], mtime: float) -> None:
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.utime(path, (mtime, mtime))


def test_stateful_sessionization_across_batches(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    # batch 1: user 1 has two events 1 min apart; user 2 has one event
    _write_batch(
        str(landing / "001.json"),
        [
            {"user_id": 1, "ts": "2024-01-01 10:00:00", "value": 5.0},
            {"user_id": 1, "ts": "2024-01-01 10:01:00", "value": 7.5},
            {"user_id": 2, "ts": "2024-01-01 10:00:00", "value": 1.0},
        ],
        mtime=1_700_000_000,
    )
    # batch 2: user 1 returns after 2h (> 30 min gap -> closes session 1);
    # user 2 returns within the gap (extends the open session, no emission)
    _write_batch(
        str(landing / "002.json"),
        [
            {"user_id": 1, "ts": "2024-01-01 12:00:00", "value": 2.0},
            {"user_id": 2, "ts": "2024-01-01 10:05:00", "value": 3.0},
        ],
        mtime=1_700_000_060,
    )

    stream = (
        spark.readStream.schema(STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(landing))
    )
    sessions = sessionize_stream(stream, gap_minutes=30.0)

    collected: list = []

    def sink(batch_df, batch_id):
        collected.extend(batch_df.collect())

    q = (
        sessions.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert len(collected) == 1, f"expected exactly one closed session, got {collected}"
    row = collected[0]
    assert row["user_id"] == 1
    assert row["n_events"] == 2
    assert row["total_value"] == 12.5
    assert str(row["session_start"]) == "2024-01-01 10:00:00"
    assert str(row["session_end"]) == "2024-01-01 10:01:00"
