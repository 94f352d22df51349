"""Partition-pruned MERGE: only touched partitions are rewritten."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from scraper_db_refine_merge_spark.operators.merge import merge_upsert_partitioned


def _files_with_mtimes(root: str, part: str) -> dict[str, float]:
    d = os.path.join(root, part)
    return {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d) if f.endswith(".parquet")}


def test_partitioned_merge_rewrites_only_touched_partitions(spark, tmp_path):
    target = str(tmp_path / "events_by_day")
    base = spark.createDataFrame(
        [
            ("e1", "2024-01-01", 1.0),
            ("e2", "2024-01-01", 2.0),
            ("e3", "2024-01-02", 3.0),
            ("e4", "2024-01-03", 4.0),
        ],
        "event_id string, day string, value double",
    )
    base.write.partitionBy("day").parquet(target)

    untouched_before = {
        p: _files_with_mtimes(target, f"day={p}") for p in ("2024-01-02", "2024-01-03")
    }

    # batch: update e1 (2024-01-01), insert e5 into a NEW partition; e1 has a
    # within-batch duplicate that latest-wins must resolve first
    batch = spark.createDataFrame(
        [
            ("e1", "2024-01-01", 10.0, 1),
            ("e1", "2024-01-01", 99.0, 2),  # newer → wins
            ("e5", "2024-01-04", 5.0, 1),
        ],
        "event_id string, day string, value double, version int",
    ).withColumn("__ord", F.col("version")).drop("version")

    touched = merge_upsert_partitioned(
        spark,
        target,
        batch.select("event_id", "day", "value", "__ord"),
        key_cols=["event_id"],
        partition_col="day",
        order_cols=[F.col("__ord").desc(), F.col("event_id")],
    )
    assert touched == ["2024-01-01", "2024-01-04"]

    # untouched partitions: identical files, identical mtimes — never rewritten
    for p, before in untouched_before.items():
        assert _files_with_mtimes(target, f"day={p}") == before

    out = {
        r["event_id"]: r["value"]
        for r in spark.read.parquet(target).select("event_id", "value").collect()
    }
    assert out == {"e1": 99.0, "e2": 2.0, "e3": 3.0, "e4": 4.0, "e5": 5.0}


def test_partitioned_merge_rejects_null_partition_values(spark, tmp_path):
    """NULL partition values would land in __HIVE_DEFAULT_PARTITION__ and be
    silently dropped by the swap loop — must be rejected at entry."""
    import pytest

    batch = spark.createDataFrame(
        [("e1", "2024-01-01", 1.0), ("e2", None, 2.0)],
        "event_id string, day string, value double",
    )
    with pytest.raises(ValueError, match="NULL"):
        merge_upsert_partitioned(
            spark, str(tmp_path / "t"), batch, key_cols=["event_id"], partition_col="day"
        )
