"""Streaming HLL (streaming/sketch_stream.py): stream == batch, and
at-least-once safety (re-merging a batch is a no-op)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from scraper_db_refine_merge_spark.operators.sketches import hll_registers
from scraper_db_refine_merge_spark.streaming.sketch_stream import (
    merge_register_tables,
    stream_hll_registers,
)


def _regs_set(df):
    return sorted(tuple(r) for r in df.select("event_type", "bucket", "max_rho").collect())


def test_remerging_same_batch_is_noop(spark):
    df = spark.range(200).select(
        F.col("id").alias("user_id"), F.lit("t").alias("event_type")
    )
    regs = hll_registers(df, ["event_type"], "user_id")
    twice = merge_register_tables(regs, regs, ["event_type"])
    assert _regs_set(regs) == _regs_set(twice)


def test_stream_registers_equal_batch_registers(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    batches = [range(0, 100), range(50, 150), range(0, 30)]
    all_users = []
    for i, users in enumerate(batches):
        with open(landing / f"b{i}.json", "w") as f:
            for u in users:
                f.write(json.dumps({"user_id": u, "event_type": "x"}) + "\n")
        t = 1_700_000_000 + i * 60
        os.utime(landing / f"b{i}.json", (t, t))
        all_users.extend(users)

    target = str(tmp_path / "regs")
    q = stream_hll_registers(
        spark, str(landing), target, str(tmp_path / "ckpt"),
        ["event_type"], "user_id", schema="user_id long, event_type string",
    )
    q.awaitTermination(120)

    batch_df = spark.createDataFrame(
        [(u, "x") for u in all_users], "user_id long, event_type string"
    )
    expected = hll_registers(batch_df, ["event_type"], "user_id")
    assert _regs_set(spark.read.parquet(target)) == _regs_set(expected)
