"""KMV / HLL sketches: mergeability (the scale property), estimate
accuracy sanity, small-group exact fallback."""

from __future__ import annotations

from pyspark.sql import functions as F

from scraper_db_refine_merge_spark.operators.sketches import (
    HLL_M,
    hll_registers,
    hll_summary,
    kmv_sketch,
)


def _events(spark, n_users=400, n_rows=4000):
    return spark.range(n_rows).select(
        (F.col("id") % n_users).alias("user_id"),
        F.when(F.col("id") % 2 == 0, "click").otherwise("view").alias("event_type"),
    )


def test_hll_registers_merge_by_max(spark):
    """Registers built on two halves, unioned and re-MAXed, must equal the
    registers built on the whole — element-wise MAX mergeability."""
    df = _events(spark)
    whole = hll_registers(df, ["event_type"], "user_id")
    h1 = hll_registers(df.filter(F.col("user_id") % 2 == 0), ["event_type"], "user_id")
    h2 = hll_registers(df.filter(F.col("user_id") % 2 == 1), ["event_type"], "user_id")
    merged = (
        h1.unionByName(h2)
        .groupBy("event_type", "bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    a = sorted(tuple(r) for r in whole.collect())
    b = sorted(tuple(r) for r in merged.collect())
    assert a == b


def test_hll_estimate_within_tolerance(spark):
    df = _events(spark, n_users=1000, n_rows=20000)
    regs = hll_registers(df, ["event_type"], "user_id")
    out = {r["event_type"]: r for r in hll_summary(regs, ["event_type"]).collect()}
    # event_type is id-parity and 1000 is even → each type sees exactly 500
    # distinct users; raw HLL with m=64 has ~13% stderr, allow 3 sigma
    for r in out.values():
        assert abs(r["raw_estimate"] - 500) / 500 < 0.4
        assert 0 <= r["n_zero_registers"] < HLL_M


def test_kmv_small_group_exact(spark):
    df = spark.createDataFrame([(i, "t") for i in range(10)], "user_id long, event_type string")
    row = kmv_sketch(df, ["event_type"], "user_id", k=32).collect()[0]
    assert row["kth_hash"] is None
    assert row["est_distinct"] == 10.0
    assert row["n_distinct_hashes"] == 10


def test_kmv_estimate_and_duplicates_collapse(spark):
    # duplicates must not change the sketch (set semantics)
    base = _events(spark, n_users=500, n_rows=500)
    dup = base.unionByName(base).unionByName(base)
    a = sorted(tuple(r) for r in kmv_sketch(base, ["event_type"], "user_id").collect())
    b = sorted(tuple(r) for r in kmv_sketch(dup, ["event_type"], "user_id").collect())
    assert a == b
    for r in a:
        est = r[-1]
        n_true = 250  # 500 users split across 2 event types by id parity
        assert abs(est - n_true) / n_true < 0.6  # k=32 → ~18% stderr, 3 sigma
