"""Temporal-join queries over the ``events`` table (beyond-reference:
training-pipeline attribution / windowed correlation primitives).

Oracle mirroring: the DuckDB oracles express the same semantics as plain
non-equi joins + window dedup — the engine's union-and-window / bucketed
forms must produce identical rows. Time arithmetic is exact integer
microseconds on both sides (``unix_micros`` ≡ ``epoch_us``); timestamps in
output are formatted to µs strings the way q08 does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.temporal import asof_join, interval_join
from ..sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


# --------------------------------------------------------------------------
# q58 — as-of join: last-touch attribution. For every purchase, the latest
# click by the same user at-or-before the purchase (ties on ts broken by
# highest event_id), NULL when the user never clicked before. Engine side is
# the union-and-window asof_join (one shuffle, no pair explosion); oracle is
# the quadratic LEFT JOIN + row_number form.
@_register(
    "q58_asof_attribution",
    f"""
    WITH p AS (
        SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, event_id AS click_id, ts AS click_ts
        FROM events WHERE event_type = 'click'
    ),
    j AS (
        SELECT p.user_id, p.event_id, p.ts, c.click_id, c.click_ts,
               ROW_NUMBER() OVER (
                   PARTITION BY p.event_id
                   ORDER BY c.click_ts DESC, c.click_id DESC
               ) AS rn
        FROM p LEFT JOIN c
          ON c.user_id = p.user_id AND c.click_ts <= p.ts
    )
    SELECT user_id, event_id,
           strftime(ts, '{_TS_FMT_DUCK}') AS ts_str,
           click_id,
           strftime(click_ts, '{_TS_FMT_DUCK}') AS click_ts_str,
           epoch_us(ts) - epoch_us(click_ts) AS gap_us
    FROM j WHERE rn = 1
    """,
)
def q58_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    j = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="click_ts",
        right_tiebreak="click_id",
        matched_time_alias="matched_click_ts",
    )
    return j.select(
        "user_id",
        "event_id",
        F.date_format("ts", _TS_FMT_SPARK).alias("ts_str"),
        "click_id",
        F.date_format("matched_click_ts", _TS_FMT_SPARK).alias("click_ts_str"),
        (F.unix_micros("ts") - F.unix_micros("matched_click_ts")).alias("gap_us"),
    )


# --------------------------------------------------------------------------
# q59 — point-in-interval join: clicks within one hour after a signup by
# the same user (inclusive bounds). Engine side is the bucketed
# interval_join (1h buckets ≈ interval length → ≤2 replicas per interval);
# oracle is the plain range join.
@_register(
    "q59_signup_click_window",
    """
    WITH s AS (
        SELECT user_id, event_id AS signup_id, ts AS start_ts,
               ts + INTERVAL 1 HOUR AS end_ts
        FROM events WHERE event_type = 'signup'
    ),
    c AS (
        SELECT user_id, event_id AS click_id, ts FROM events
        WHERE event_type = 'click'
    )
    SELECT c.user_id, s.signup_id, c.click_id,
           epoch_us(c.ts) - epoch_us(s.start_ts) AS offset_us
    FROM c JOIN s
      ON s.user_id = c.user_id AND c.ts >= s.start_ts AND c.ts <= s.end_ts
    """,
)
def q59_signup_click_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    signups = e.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end_ts"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    j = interval_join(
        clicks,
        signups,
        on="user_id",
        point_time="ts",
        start_col="start_ts",
        end_col="end_ts",
        bucket_width_us=3_600_000_000,
    )
    return j.select(
        "user_id",
        "signup_id",
        "click_id",
        (F.unix_micros("ts") - F.unix_micros("start_ts")).alias("offset_us"),
    )


# --------------------------------------------------------------------------
# q64 — hopping (sliding) window counts: 2h windows sliding by 1h, so every
# event lands in exactly two windows. Spark's F.window generates the
# overlapping windows natively (epoch-aligned starts at multiples of the
# slide); the oracle replicates each row to its two covering window starts
# with unnest([0,1]).
@_register(
    "q64_sliding_window_counts",
    """
    SELECT strftime(date_trunc('hour', ts) - to_hours(k), '%Y-%m-%d %H:%M:%S')
               AS window_start,
           event_type,
           COUNT(*) AS n
    FROM events, unnest([0, 1]) AS t(k)
    GROUP BY 1, 2
    """,
)
def q64_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
    )
