"""Salted operators must be result-identical to their unsalted forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from scraper_db_refine_merge_spark.operators.dedup import latest_wins
from scraper_db_refine_merge_spark.operators.skew import salted_join, salted_latest_per_key
from scraper_db_refine_merge_spark.sources.tables import load_table


def test_salted_join_equals_plain_join(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    # event_type is the archetypal hot key: tiny cardinality, huge rows-per-key
    dim = e.select("event_type").distinct().withColumn("type_tag", F.upper("event_type"))
    plain = e.join(dim, ["event_type"]).select("event_id", "type_tag")
    salted = salted_join(e, dim, on=["event_type"], n_salts=8, salt_from=["event_id"]).select(
        "event_id", "type_tag"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_outer_modes(spark):
    """right/full outer would surface unmatched replicated-side rows once
    per salt — the operator must refuse those modes."""
    import pytest

    a = spark.createDataFrame([(1, "x")], "k int, v string")
    b = spark.createDataFrame([(1, "y")], "k int, w string")
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(a, b, on=["k"], how=how, salt_from=["v"])


def test_salted_latest_per_key_equals_single_window(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    order = [F.col("ts").desc(), F.col("event_id").asc()]
    plain = latest_wins(e, ["user_id"], order)
    salted = salted_latest_per_key(
        e, ["user_id"], order, salt_from=["event_id"], n_salts=8
    )
    # identical total order (ts desc, event_id asc) on both paths → identical
    # winner per user regardless of how ties land across salt buckets
    p = {r["user_id"]: r["event_id"] for r in plain.select("user_id", "event_id").collect()}
    s = {r["user_id"]: r["event_id"] for r in salted.select("user_id", "event_id").collect()}
    assert set(p) == set(s)
    diffs = {u for u in p if p[u] != s[u]}
    assert not diffs, f"winners differ for users {sorted(diffs)[:5]}"
