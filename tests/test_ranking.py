"""with_global_ranks must be bit-identical to the single-window ranking
family, and its plan must contain NO unpartitioned window over the data
(only the |partitions|-row offsets table)."""

from __future__ import annotations

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
    (|partitions| rows): the raw-data window must key on __pid."""
    spend = _spend(spark, sf_dir)
    out = with_global_ranks(
        spend, [F.col("cents").desc(), F.col("user_id")], ["cents", "user_id"],
        rank_col="rk",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower(), plan
    data_windows = [
        ln for ln in plan.splitlines() if "Window" in ln and "__lrk" in ln
    ]
    assert data_windows and all("__pid" in ln for ln in data_windows), data_windows


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
    assert "rangepartitioning" in plan.lower(), plan
    data_windows = [ln for ln in plan.splitlines() if "Window" in ln and "__lcs" in ln]
    assert data_windows and all("__pid" in ln for ln in data_windows), data_windows
