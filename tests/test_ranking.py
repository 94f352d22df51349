"""with_global_ranks must be bit-identical to the single-window ranking
family, and its plan must contain NO unpartitioned window over the data
(only the |partitions|-row offsets table)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from scraper_db_refine_merge_spark.operators.ranking import with_global_ranks
from scraper_db_refine_merge_spark.sources.tables import load_table


def _spend(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(F.floor(F.col("value") * 100)).alias("cents"))
    )


def test_global_ranks_equal_single_window(spark, sf_dir):
    spend = _spend(spark, sf_dir)
    order = [F.col("cents").desc(), F.col("user_id")]
    w = Window.orderBy(*order)
    naive = spend.select(
        "user_id",
        "cents",
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
        F.percent_rank().over(w).alias("prk"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(4).over(w).alias("q4"),
        F.ntile(7).over(w).alias("q7"),
    )
    got = with_global_ranks(
        spend,
        order,
        ["cents", "user_id"],
        rank_col="rk",
        dense_rank_col="drk",
        percent_rank_col="prk",
        cume_dist_col="cd",
        ntile=("q4", 4),
    )
    got7 = with_global_ranks(spend, order, ["cents", "user_id"], ntile=("q7", 7))
    key = lambda rows: {r["user_id"]: tuple(r.asDict().items()) for r in rows}
    n_rows = naive.collect()
    g_rows = got.collect()
    n_map = {r["user_id"]: (r["rk"], r["drk"], r["prk"], r["cd"], r["q4"]) for r in n_rows}
    g_map = {r["user_id"]: (r["rk"], r["drk"], r["prk"], r["cd"], r["q4"]) for r in g_rows}
    assert n_map == g_map
    n7 = {r["user_id"]: r["q7"] for r in n_rows}
    g7 = {r["user_id"]: r["q7"] for r in got7.collect()}
    assert n7 == g7


def test_peer_groups_rank_correctly(spark):
    """Heavy ties (every value appears many times) — peer-based prk/cd and
    dense offsets across range-partition boundaries must stay exact."""
    df = spark.createDataFrame(
        [(i, i % 5) for i in range(1000)], "id long, v long"
    )
    order = [F.col("v").desc()]
    w = Window.orderBy(*order)
    naive = df.select(
        "id", F.rank().over(w).alias("rk"), F.dense_rank().over(w).alias("drk"),
        F.percent_rank().over(w).alias("prk"), F.cume_dist().over(w).alias("cd"),
    )
    got = with_global_ranks(
        df, order, ["v"], rank_col="rk", dense_rank_col="drk",
        percent_rank_col="prk", cume_dist_col="cd",
    )
    n = {r["id"]: (r["rk"], r["drk"], r["prk"], r["cd"]) for r in naive.collect()}
    g = {r["id"]: (r["rk"], r["drk"], r["prk"], r["cd"]) for r in got.collect()}
    assert n == g


def test_no_unpartitioned_window_over_data(spark, sf_dir):
    """The only single-partition exchange allowed is the offsets table
    (|partitions| rows): the raw-data window must key on __pid. The range
    exchange itself now lives behind the pinned (checkpointed) frame — see
    the partition-id pinning note in operators/ranking.py — so it is
    asserted via test_pinned_frame_is_range_partitioned, not plan text."""
    spend = _spend(spark, sf_dir)
    out = with_global_ranks(
        spend, [F.col("cents").desc(), F.col("user_id")], ["cents", "user_id"],
        rank_col="rk",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    data_windows = [
        ln for ln in plan.splitlines() if "Window" in ln and "__lrk" in ln
    ]
    assert data_windows and all("__pid" in ln for ln in data_windows), data_windows


def test_pinned_frame_is_range_partitioned_and_frozen(spark, sf_dir):
    """r8 partition-id pinning: the frame every branch reads is (a) actually
    range-partitioned — per-partition key ranges are DISJOINT, so equal keys
    never straddle a boundary and local ranks compose into global ones —
    and (b) materialized (locally checkpointed), so spark_partition_id() is
    evaluated once, not per physical branch."""
    from scraper_db_refine_merge_spark.operators.ranking import _pin_range_partitions

    spend = _spend(spark, sf_dir)
    # AQE coalesces test-sized data to ONE range partition (64 MB advisory
    # target) which would make the disjointness assertion vacuous — shrink
    # the advisory size for this test only.
    keys = (
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst",
    )
    prev = {k: spark.conf.get(k, None) for k in keys}
    spark.conf.set(keys[0], "64b")
    spark.conf.set(keys[1], "64b")
    spark.conf.set(keys[2], "false")
    try:
        pinned = _pin_range_partitions(
            spend, [F.col("cents").desc(), F.col("user_id")]
        )
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    # the frame is a scan over a materialized RDD (localCheckpoint), not a
    # lazy exchange every consumer would re-evaluate (pinned.rdd itself is
    # a fresh javaToPython wrapper, so assert on the plan)
    assert "LogicalRDD" in pinned._jdf.queryExecution().optimizedPlan().toString()
    key = F.struct(
        (F.col("cents") * -1).alias("nc"), F.col("user_id").alias("uid")
    )
    parts = (
        pinned.select("cents", "user_id")
        .withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(F.min(key).alias("lo"), F.max(key).alias("hi"))
        .orderBy("__pid")
        .collect()
    )
    assert len(parts) > 1  # the data actually spread over partitions
    for prev, cur in zip(parts, parts[1:]):
        assert (prev["hi"]["nc"], prev["hi"]["uid"]) <= (
            cur["lo"]["nc"],
            cur["lo"]["uid"],
        ), (prev, cur)


def test_global_ranks_with_nulls_in_order_keys(spark):
    """ADVICE r6: dense_rank treats NULL as a rankable value (NULLS FIRST),
    so the per-partition distinct counts feeding the dense-rank offsets
    must count null-containing keys too — the struct-wrapped count does;
    bare count(distinct a, b) drops them and shifts later partitions."""
    rows = [(i, None if i % 7 == 0 else i // 3) for i in range(200)]
    df = spark.createDataFrame(rows, "id int, v int").repartition(8)
    order = [F.col("v").asc_nulls_first(), F.col("id")]
    w = Window.orderBy(*order)
    naive = {
        r["id"]: (r["rk"], r["drk"])
        for r in df.select(
            "id", F.rank().over(w).alias("rk"), F.dense_rank().over(w).alias("drk")
        ).collect()
    }
    got = {
        r["id"]: (r["rk"], r["drk"])
        for r in with_global_ranks(
            df, order, ["v", "id"], rank_col="rk", dense_rank_col="drk"
        ).collect()
    }
    assert got == naive


def test_reliable_checkpoint_path_when_dir_configured(spark, sf_dir, tmp_path):
    """VERDICT r9 item 6: with a checkpoint dir configured (the production
    deployment contract — setCheckpointDir to HDFS/S3 on a cluster),
    pinning takes the RELIABLE checkpoint path: blocks written under the
    dir (executor loss recovers by re-reading them, no lineage cliff), and
    the ranking family stays bit-identical to the single window."""
    import glob
    import os

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None, "suite default must be the local fallback"
    ckpt = str(tmp_path / "ckpt")
    sc.setCheckpointDir(ckpt)
    try:
        spend = _spend(spark, sf_dir)
        order = [F.col("cents").desc(), F.col("user_id")]
        w = Window.orderBy(*order)
        naive = {
            r["user_id"]: r["rk"]
            for r in spend.select("user_id", F.rank().over(w).alias("rk")).collect()
        }
        got = {
            r["user_id"]: r["rk"]
            for r in with_global_ranks(
                spend, order, ["cents", "user_id"], rank_col="rk"
            ).collect()
        }
        assert got == naive
        written = [
            f for f in glob.glob(os.path.join(ckpt, "**"), recursive=True)
            if os.path.isfile(f)
        ]
        assert written, "reliable checkpoint path wrote nothing under the dir"
    finally:
        # restore the no-dir state so the rest of the suite keeps the
        # documented local fallback (and never writes into pytest's
        # about-to-be-removed tmp dir). There is no public unset API, so
        # this reaches into the Scala setter — guarded (ADVICE r10): if a
        # Spark upgrade / Spark Connect removes the hook, fail with a
        # pointed message instead of an opaque py4j error, because a
        # SILENTLY-kept tmp checkpoint dir would poison later tests.
        try:
            getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.empty())
        except Exception as exc:  # noqa: BLE001 — diagnose, then fail loudly
            pytest.fail(
                "could not restore the no-checkpoint-dir state via the JVM "
                f"setter checkpointDir_$eq ({exc!r}). Update the reset for "
                "this Spark version, or move this test into a subprocess "
                "session so no restore is needed."
            )
        assert sc.getCheckpointDir() is None


def test_global_cumsum_equals_single_window(spark, sf_dir):
    from scraper_db_refine_merge_spark.operators.ranking import global_cumsum

    spend = _spend(spark, sf_dir)
    order = [F.col("cents").desc(), F.col("user_id")]
    w = (
        Window.orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = sorted(
        map(tuple, spend.select("user_id", "cents", F.sum("cents").over(w).alias("cs")).collect())
    )
    got = sorted(
        map(
            tuple,
            global_cumsum(spend, order, F.col("cents"), "cs")
            .select("user_id", "cents", "cs")
            .collect(),
        )
    )
    assert got == naive
    # determinism under repartition
    again = sorted(
        map(
            tuple,
            global_cumsum(spend.repartition(17), order, F.col("cents"), "cs")
            .select("user_id", "cents", "cs")
            .collect(),
        )
    )
    assert again == naive


def test_global_cumsum_no_unpartitioned_window_over_data(spark, sf_dir):
    from scraper_db_refine_merge_spark.operators.ranking import global_cumsum

    spend = _spend(spark, sf_dir)
    out = global_cumsum(
        spend, [F.col("cents").desc(), F.col("user_id")], F.col("cents"), "cs"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    data_windows = [ln for ln in plan.splitlines() if "Window" in ln and "__lcs" in ln]
    assert data_windows and all("__pid" in ln for ln in data_windows), data_windows


def test_global_cumsum_null_parity_with_single_window(spark):
    """ADVICE r7: SUM() OVER skips NULLs and is NULL only while the whole
    prefix is null. Rows 0..9 all-null (expect NULL), then mixed nulls
    (expect the null-skipping running total, never NULL again)."""
    from scraper_db_refine_merge_spark.operators.ranking import global_cumsum

    rows = [(i, None if (i < 10 or i % 3 == 0) else i * 7) for i in range(200)]
    df = spark.createDataFrame(rows, "id int, v int").repartition(9)
    order = [F.col("id")]
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    naive = sorted(
        map(tuple, df.select("id", F.sum("v").over(w).alias("cs")).collect())
    )
    got = sorted(
        map(
            tuple,
            global_cumsum(df, order, F.col("v"), "cs").select("id", "cs").collect(),
        )
    )
    assert got == naive
    assert got[0][1] is None and got[9][1] is None and got[10][1] is not None


def test_topk_order_sql_global_and_grouped_parity(spark, sf_dir):
    """ADVICE r11: order_sql with group_cols == [] is a GLOBAL top-k (the
    naive PARTITION BY join rendered invalid SQL); both order_sql paths
    must be bit-identical to the Column path / a full sort."""
    from scraper_db_refine_merge_spark.operators.ranking import topk_per_group

    spend = _spend(spark, sf_dir).repartition(8)
    # global: matches a full sort's head
    got = topk_per_group(spend, [], [], 10, order_sql="cents DESC, user_id ASC")
    got_rows = [(r["user_id"], r["cents"], r["rank"]) for r in got.collect()]
    exp = spend.orderBy(F.desc("cents"), F.asc("user_id")).limit(10).collect()
    assert sorted(got_rows) == sorted(
        (r["user_id"], r["cents"], i + 1) for i, r in enumerate(exp)
    )
    # grouped: order_sql path == Column path
    e = load_table(spark, sf_dir, "events").repartition(8)
    a = topk_per_group(
        e, ["event_type"], [], 3, order_sql="value DESC, user_id ASC, ts ASC"
    )
    b = topk_per_group(
        e,
        ["event_type"],
        [F.desc("value"), F.asc("user_id"), F.asc("ts")],
        3,
    )
    cols = ["event_type", "user_id", "value", "rank"]
    assert sorted(map(tuple, a.select(*cols).collect())) == sorted(
        map(tuple, b.select(*cols).collect())
    )
