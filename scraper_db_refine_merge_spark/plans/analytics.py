"""Warehouse-analytics operators beyond the reference's query surface:
SCD2 dimension history, funnel analysis, retention cohorts, TF-IDF term
ranking. All oracle-gated (q84-q87).

These are the standard workloads a user of a general analytics engine runs
daily; each is expressed as windows/aggregations that shuffle once per
logical step and survive scale:

- SCD2 (q84): run-collapse via the lag-change + cumulative-sum island
  trick — one window pass, one aggregation, one lead pass. No self-join.
- Funnel (q85): staged conditional mins; each stage is a broadcast join of
  the (per-user, tiny) previous stage onto the filtered event stream.
- Cohorts (q86): first-touch per user broadcast back over the stream,
  integer week arithmetic (no calendar-week functions — those differ
  between engines).
- TF-IDF (q87): tf and df from the same token explode, rarity weight as
  N/df (a monotone transform of textbook idf; ln() is NOT cross-engine
  bit-stable, a documented divergence), deterministic per-doc top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ._util import money_sum

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
# q84 — SCD2 dimension history from an event stream. The tracked attribute
# is the user's value band (floor(value/100)); consecutive events in the
# same band collapse into ONE version row (true SCD2 semantics — a version
# per CHANGE, not per event), with [valid_from, valid_to) intervals and
# NULL valid_to marking the current version. The island detection is the
# lag-change + running-sum trick: one window pass to mark changes, a
# cumulative sum to number versions, one aggregation, and a lead() to close
# intervals — no self-joins, shuffle is one hash exchange on user_id reused
# by every window (same partition key).
# The SCD2 history CTE (shared by the q84 oracle and the q104 streaming
# as-of enrichment oracle in plans/streamq.py): ``hist`` has raw interval
# bounds vf/vt, NULL vt = current version.
SCD2_HIST_CTE = """
    banded AS (
        SELECT user_id, ts, event_id,
               CAST(floor(value / 100) AS INTEGER) AS band
        FROM events
    ),
    changes AS (
        SELECT *,
               CASE WHEN band IS DISTINCT FROM
                         LAG(band) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    THEN 1 ELSE 0 END AS chg
        FROM banded
    ),
    versioned AS (
        SELECT *,
               CAST(SUM(chg) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS INTEGER) AS version
        FROM changes
    ),
    collapsed AS (
        SELECT user_id, version, band,
               MIN(ts) AS vf, COUNT(*) AS n_events
        FROM versioned GROUP BY 1, 2, 3
    ),
    hist AS (
        SELECT user_id, version, band, vf,
               LEAD(vf) OVER (PARTITION BY user_id ORDER BY version) AS vt,
               n_events
        FROM collapsed
    )
"""


@_register(
    "q84_scd2_history",
    f"""
    WITH {SCD2_HIST_CTE}
    SELECT user_id, version, band,
           strftime(vf, '{_TS_FMT_DUCK}') AS valid_from,
           strftime(vt, '{_TS_FMT_DUCK}') AS valid_to,
           n_events
    FROM hist
    """,
)
def q84_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return scd2_history_raw(e).select(
        "user_id",
        "version",
        "band",
        F.date_format("vf", _TS_FMT_SPARK).alias("valid_from"),
        F.date_format("vt", _TS_FMT_SPARK).alias("valid_to"),
        "n_events",
    )


def scd2_history_raw(e: DataFrame) -> DataFrame:
    """The SCD2 version table with RAW timestamp bounds ``vf``/``vt``
    (NULL vt = current version) — shared by q84 (formatted output) and the
    streaming as-of enrichment (q104), which joins against the raw bounds."""
    band = F.floor(F.col("value") / 100).cast("int")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    banded = e.select("user_id", "ts", "event_id", band.alias("band"))
    # IS DISTINCT FROM semantics: eqNullSafe negated (bands here are never
    # NULL, but the operator must not silently break if they can be)
    chg = F.when(
        ~F.col("band").eqNullSafe(F.lag("band").over(w)), F.lit(1)
    ).otherwise(F.lit(0))
    versioned = banded.withColumn("chg", chg).withColumn(
        "version", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int")
    )
    collapsed = versioned.groupBy("user_id", "version", "band").agg(
        F.min("ts").alias("vf"), F.count("*").alias("n_events")
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    return collapsed.select(
        "user_id", "version", "band", "vf",
        F.lead("vf").over(wv).alias("vt"), "n_events",
    )


# --------------------------------------------------------------------------
# q85 — funnel analysis: signup → first click strictly after it → first
# purchase strictly after that click, per user; one row of stage counts.
# Each stage joins the (per-user, one-row) previous stage back onto the
# filtered stream — the stream itself never self-joins. No broadcast HINTS:
# per-user state grows with the corpus, so a forced broadcast is an
# eventual OOM (VERDICT r4 item 2); AQE broadcasts while the stage tables
# are genuinely small and falls back to a user_id-keyed shuffle join
# beyond that (intent pinned in tests/test_plan_shape.py).
@_register(
    "q85_funnel_steps",
    """
    WITH s AS (
        SELECT user_id, MIN(ts) AS signup_ts
        FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS click_ts
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = 'click' AND e.ts > s.signup_ts
        GROUP BY 1
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS purchase_ts
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
        GROUP BY 1
    )
    SELECT (SELECT COUNT(*) FROM s) AS users_signed_up,
           (SELECT COUNT(*) FROM c) AS users_clicked_after,
           (SELECT COUNT(*) FROM p) AS users_purchased_after
    """,
)
def q85_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel_steps(load_table(spark, sf_dir, "events"))


def funnel_steps(e: DataFrame) -> DataFrame:
    """The q85 funnel over an arbitrary events frame (also driven at
    replicated scale by tools/scale_smoke.py)."""
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        s.agg(F.count("*").alias("users_signed_up"))
        .crossJoin(c.agg(F.count("*").alias("users_clicked_after")))
        .crossJoin(p.agg(F.count("*").alias("users_purchased_after")))
    )


# --------------------------------------------------------------------------
# q86 — retention cohorts: cohort = integer week of the user's first event
# since 2024-01-01, cell = distinct users from that cohort active in each
# week offset. Week arithmetic is plain integer day division — calendar
# week functions (weekofyear / ISO weeks) differ between engines and
# locales, a classic cross-engine trap.
@_register(
    "q86_retention_cohorts",
    """
    WITH first_touch AS (
        SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY 1
    ),
    tagged AS (
        SELECT e.user_id,
               CAST(floor(datediff('day', DATE '2024-01-01',
                                   CAST(f.first_ts AS DATE)) / 7) AS INTEGER)
                   AS cohort_week,
               CAST(floor(datediff('day', DATE '2024-01-01',
                                   CAST(e.ts AS DATE)) / 7) AS INTEGER)
                   AS event_week
        FROM events e JOIN first_touch f ON e.user_id = f.user_id
    )
    SELECT cohort_week,
           event_week - cohort_week AS week_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
    FROM tagged
    GROUP BY 1, 2
    """,
)
def q86_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return retention_cohorts(load_table(spark, sf_dir, "events"))


def retention_cohorts(e: DataFrame) -> DataFrame:
    """The q86 cohort grid over an arbitrary events frame (also driven at
    replicated scale by tools/scale_smoke.py)."""
    first = e.groupBy("user_id").agg(F.min("ts").alias("first_ts"))

    def week(col):
        return F.floor(F.datediff(F.to_date(col), F.lit("2024-01-01")) / 7).cast("int")

    # No broadcast hint: first-touch is one row PER USER — corpus-growing
    # (VERDICT r4 item 2). AQE picks broadcast while it fits.
    tagged = e.join(first, "user_id").select(
        "user_id",
        week(F.col("first_ts")).alias("cohort_week"),
        week(F.col("ts")).alias("event_week"),
    )
    return (
        tagged.groupBy(
            "cohort_week", (F.col("event_week") - F.col("cohort_week")).alias("week_offset")
        )
        .agg(F.count_distinct("user_id").alias("users"))
    )


# --------------------------------------------------------------------------
# q87 — TF-IDF-style term ranking: top-3 terms for the first 20 docs.
# tf and df both derive from ONE tokenization (lower, split on non-[a-z],
# tokens ≥ 3 chars); rarity weight = N/df instead of ln(N/df) — a monotone
# transform, so rankings are textbook-identical, while ln() across engines
# is not bit-stable (documented divergence). score = round(tf·N/df, 4)
# with integer numerator and a single double division — deterministic.
# df stays corpus-wide (the per-doc restriction applies only to tf), which
# is what makes the weights meaningful and the plan scale-shaped: df is a
# token-keyed aggregation, broadcast back onto the restricted tf table.
@_register(
    "q87_tfidf_terms",
    """
    WITH toks AS (
        SELECT doc_id, tok
        FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
            FROM documents
        )
        WHERE length(tok) >= 3
    ),
    df AS (
        SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM toks GROUP BY 1
    ),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM toks),
    tf AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks WHERE doc_id < 20 GROUP BY 1, 2
    ),
    scored AS (
        SELECT tf.doc_id, tf.tok, tf.tf, df.df,
               ROUND(CAST(tf.tf * n.n AS DOUBLE) / df.df, 4) AS score
        FROM tf JOIN df USING (tok) CROSS JOIN n
    )
    SELECT doc_id, tok, tf, df, score
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY score DESC, tok) AS rn
        FROM scored
    )
    WHERE rn <= 3
    """,
)
def q87_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("tok")
    ).filter(F.length("tok") >= 3)
    df_t = toks.groupBy("tok").agg(F.count_distinct("doc_id").alias("df"))
    n = toks.agg(F.count_distinct("doc_id").alias("n"))
    tf = (
        toks.filter(F.col("doc_id") < 20)
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    scored = (
        tf.join(df_t, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            "tf",
            "df",
            F.round((F.col("tf") * F.col("n")).cast("double") / F.col("df"), 4).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


# --------------------------------------------------------------------------
# q89 — anomaly detection: days whose event count deviates from their
# event_type's mean by more than 2σ. The cross-engine trap here is
# stddev(): both engines accumulate variance in floating point in data
# order, which is not deterministic under partitioning. Instead mean and
# variance derive from EXACT integer sums (Σn, Σn² as BIGINT — daily
# counts are integers), converted to double once, in one fixed expression
# order: var = (n·Σx² − (Σx)²) / (n·(n−1)). Same bits on any engine, any
# partitioning — the engine's pattern for every moment-based statistic.
@_register(
    "q89_anomaly_days",
    """
    WITH daily AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS days,
               CAST(SUM(n) AS BIGINT) AS sum_n,
               CAST(SUM(n * n) AS BIGINT) AS sum_n2
        FROM daily GROUP BY 1
    ),
    scored AS (
        SELECT d.event_type, d.day, d.n,
               CAST(s.sum_n AS DOUBLE) / s.days AS mean_n,
               sqrt(CAST(s.days * s.sum_n2 - s.sum_n * s.sum_n AS DOUBLE)
                    / (CAST(s.days AS DOUBLE) * (s.days - 1))) AS std_n
        FROM daily d JOIN stats s USING (event_type)
    )
    SELECT event_type, day, n,
           ROUND(mean_n, 6) AS mean_n,
           ROUND(std_n, 6) AS std_n,
           ROUND(abs(n - mean_n) / std_n, 6) AS zscore
    FROM scored
    WHERE abs(n - mean_n) > 2 * std_n
    """,
)
def q89_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("days"),
        F.sum("n").alias("sum_n"),
        F.sum(F.col("n") * F.col("n")).alias("sum_n2"),
    )
    j = daily.join(F.broadcast(stats), "event_type")
    mean_n = F.col("sum_n").cast("double") / F.col("days")
    std_n = F.sqrt(
        (F.col("days") * F.col("sum_n2") - F.col("sum_n") * F.col("sum_n")).cast("double")
        / (F.col("days").cast("double") * (F.col("days") - 1))
    )
    scored = j.select(
        "event_type", "day", "n", mean_n.alias("mean_n"), std_n.alias("std_n")
    )
    return scored.filter(
        F.abs(F.col("n") - F.col("mean_n")) > 2 * F.col("std_n")
    ).select(
        "event_type",
        "day",
        "n",
        F.round("mean_n", 6).alias("mean_n"),
        F.round("std_n", 6).alias("std_n"),
        F.round(F.abs(F.col("n") - F.col("mean_n")) / F.col("std_n"), 6).alias("zscore"),
    )


# --------------------------------------------------------------------------
# q90 — pivot report: days × event types as columns (the reference's
# report scripts emit this shape; reporting engines must pivot). The
# column set is FIXED (the 5 event types) — a dynamic pivot would make the
# output schema data-dependent, which breaks both oracle comparison and
# production schema contracts; fixed-column conditional aggregation is the
# portable form both engines compile to a single pass.
@_register(
    "q90_daily_type_pivot",
    """
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signups,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors
    FROM events
    GROUP BY 1
    """,
)
def q90_daily_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")

    def cnt(t):
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).cast("long")

    return e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        cnt("view").alias("views"),
        cnt("click").alias("clicks"),
        cnt("purchase").alias("purchases"),
        cnt("signup").alias("signups"),
        cnt("error").alias("errors"),
    )


# --------------------------------------------------------------------------
# q92 — table profiling: per-column null counts, distinct counts, min/max
# (stringified) for the events table in ONE pass — the data-quality
# reconnaissance every pipeline runs before trusting a source. Spark
# computes all columns' stats in a single aggregation (no per-column
# scans); the one-row-per-column shape comes from unpivoting the single
# stats row, not from scanning per column.
@_register(
    "q92_table_profile",
    """
    SELECT 'event_id' AS col, COUNT(*) AS n,
           CAST(COUNT(*) - COUNT(event_id) AS BIGINT) AS nulls,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS distinct_n,
           CAST(MIN(event_id) AS VARCHAR) AS min_s, CAST(MAX(event_id) AS VARCHAR) AS max_s
    FROM events
    UNION ALL
    SELECT 'user_id', COUNT(*), CAST(COUNT(*) - COUNT(user_id) AS BIGINT),
           CAST(COUNT(DISTINCT user_id) AS BIGINT),
           CAST(MIN(user_id) AS VARCHAR), CAST(MAX(user_id) AS VARCHAR)
    FROM events
    UNION ALL
    SELECT 'event_type', COUNT(*), CAST(COUNT(*) - COUNT(event_type) AS BIGINT),
           CAST(COUNT(DISTINCT event_type) AS BIGINT),
           MIN(event_type), MAX(event_type)
    FROM events
    UNION ALL
    SELECT 'value', COUNT(*), CAST(COUNT(*) - COUNT(value) AS BIGINT),
           CAST(COUNT(DISTINCT value) AS BIGINT),
           CAST(MIN(value) AS VARCHAR), CAST(MAX(value) AS VARCHAR)
    FROM events
    """,
)
def q92_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    cols = ["event_id", "user_id", "event_type", "value"]
    aggs = []
    for c in cols:
        aggs += [
            F.count("*").alias(f"{c}__n"),
            (F.count("*") - F.count(c)).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    row = e.agg(*aggs)
    # unpivot the single stats row into one row per column
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col(f"{c}__n").alias("n"),
                F.col(f"{c}__nulls").alias("nulls"),
                F.col(f"{c}__distinct").alias("distinct_n"),
                F.col(f"{c}__min").alias("min_s"),
                F.col(f"{c}__max").alias("max_s"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(structs).alias("s")).select("s.*")


# --------------------------------------------------------------------------
# q93 — winsorization: clip `value` to its event_type's [p01, p99] before
# aggregating — the standard outlier treatment before a numeric column
# feeds training or reporting. Quantiles are exact (Spark percentile() ≡
# DuckDB quantile_cont() bit-for-bit, same linear interpolation — see
# ROADMAP gotchas); the per-type bounds table is tiny and broadcasts back
# onto the stream. Sums of clipped values go through exact DECIMAL.
@_register(
    "q93_winsorized_stats",
    """
    WITH bounds AS (
        SELECT event_type,
               quantile_cont(value, 0.01) AS p01,
               quantile_cont(value, 0.99) AS p99
        FROM events GROUP BY 1
    ),
    clipped AS (
        SELECT e.event_type,
               CASE WHEN e.value < b.p01 THEN b.p01
                    WHEN e.value > b.p99 THEN b.p99
                    ELSE e.value END AS v,
               CASE WHEN e.value < b.p01 OR e.value > b.p99 THEN 1 ELSE 0 END AS was_clipped
        FROM events e JOIN bounds b USING (event_type)
    )
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(was_clipped) AS BIGINT) AS n_clipped,
           CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS sum_clipped_value
    FROM clipped
    GROUP BY event_type
    """,
)
def q93_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bounds = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.01)).alias("p01"),
        F.percentile("value", F.lit(0.99)).alias("p99"),
    )
    j = e.join(F.broadcast(bounds), "event_type")
    v = (
        F.when(F.col("value") < F.col("p01"), F.col("p01"))
        .when(F.col("value") > F.col("p99"), F.col("p99"))
        .otherwise(F.col("value"))
    )
    was = F.when(
        (F.col("value") < F.col("p01")) | (F.col("value") > F.col("p99")), 1
    ).otherwise(0)
    return (
        j.select("event_type", v.alias("v"), was.alias("was_clipped"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("was_clipped").cast("long").alias("n_clipped"),
            F.sum(F.col("v").cast("decimal(18,6)")).cast("double").alias("sum_clipped_value"),
        )
    )


# --------------------------------------------------------------------------
# q95 — geo under the gate (G1/G2/F14, previously pytest-only): derived
# lon/lat columns (integer-mod arithmetic — exact doubles, so box
# comparisons are engine-exact; haversine's trig is deliberately NOT in an
# oracle-gated filter, transcendentals are not cross-engine bit-stable),
# coordinate validation, and Ibiza bounding-box membership per nation.
# Box predicates are sargable — at scale they prune partitions/row groups
# the way the reference's 2dsphere index served $geoWithin.
@_register(
    "q95_geo_box_membership",
    """
    WITH located AS (
        SELECT c_nationkey,
               CASE WHEN c_custkey % 13 = 0 THEN -200.0
                    ELSE 1.0 + (c_custkey % 100) / 100.0 END AS lon,
               38.5 + (c_custkey % 80) / 100.0 AS lat
        FROM customer
    )
    SELECT c_nationkey AS nationkey,
           COUNT(*) AS n_customers,
           CAST(SUM(CASE WHEN lon BETWEEN -180.0 AND 180.0
                          AND lat BETWEEN -90.0 AND 90.0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           CAST(SUM(CASE WHEN lon BETWEEN 1.2 AND 1.6
                          AND lat BETWEEN 38.8 AND 39.1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_in_ibiza
    FROM located
    GROUP BY 1
    """,
)
def q95_geo_box_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.geo import in_ibiza, valid_coordinates

    c = load_table(spark, sf_dir, "customer")
    lon = F.when(F.col("c_custkey") % 13 == 0, F.lit(-200.0)).otherwise(
        1.0 + (F.col("c_custkey") % 100) / 100.0
    )
    lat = 38.5 + (F.col("c_custkey") % 80) / 100.0
    located = c.select(
        F.col("c_nationkey").alias("nationkey"), lon.alias("lon"), lat.alias("lat")
    )
    return located.groupBy("nationkey").agg(
        F.count("*").alias("n_customers"),
        F.sum(
            F.when(valid_coordinates(F.col("lon"), F.col("lat")), 1).otherwise(0)
        ).cast("long").alias("n_valid"),
        F.sum(F.when(in_ibiza(F.col("lon"), F.col("lat")), 1).otherwise(0))
        .cast("long")
        .alias("n_in_ibiza"),
    )


# --------------------------------------------------------------------------
# q96 — skew-salted join under the gate: the engine runs the SALTED
# physical form (deterministic salt on the skewed side, ×n_salts
# replication of the other side — the standard treatment when one key
# dominates and the dim is too big/dynamic to broadcast) and must produce
# row-for-row the plain logical join the oracle states. Gating the
# equivalence is the point: salting is pure physical-plan surgery, and
# any result drift is a bug.
@_register(
    "q96_salted_join",
    """
    SELECT e.event_type, o.label,
           COUNT(*) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e
    JOIN (
        SELECT 'view' AS event_type, 'browse' AS label
        UNION ALL SELECT 'click', 'browse'
        UNION ALL SELECT 'purchase', 'convert'
        UNION ALL SELECT 'signup', 'convert'
        UNION ALL SELECT 'error', 'ops'
    ) o ON e.event_type = o.event_type
    GROUP BY 1, 2
    """,
)
def q96_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    e = load_table(spark, sf_dir, "events")
    # event_type has 5 values over the whole table — maximal key skew
    dim = spark.createDataFrame(
        [
            ("view", "browse"),
            ("click", "browse"),
            ("purchase", "convert"),
            ("signup", "convert"),
            ("error", "ops"),
        ],
        "event_type string, label string",
    )
    j = salted_join(e, dim, ["event_type"], n_salts=8, salt_from=["event_id"])
    return j.groupBy("event_type", "label").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


# --------------------------------------------------------------------------
# q97 — keyset pagination under the gate (P12's deep-page form): page 4 of
# the event stream ordered by (ts, event_id), fetched by "strictly after
# the last seen key" instead of OFFSET — O(limit) per page at any depth,
# and the key predicate pushes to the scan. The composite key is encoded
# as a single sortable string (µs timestamp || zero-padded id) so one
# strictly-greater comparison expresses the lexicographic (ts, event_id)
# order on both engines.
@_register(
    "q97_keyset_page",
    """
    WITH keyed AS (
        SELECT event_id, user_id, event_type,
               strftime(ts, '%Y-%m-%d %H:%M:%S.%f') || '|' ||
                   lpad(CAST(event_id AS VARCHAR), 12, '0') AS page_key
        FROM events
    ),
    page3_last AS (
        SELECT MAX(page_key) AS last_key
        FROM (SELECT page_key FROM keyed ORDER BY page_key LIMIT 60)
    )
    SELECT k.event_id, k.user_id, k.event_type, k.page_key
    FROM keyed k, page3_last
    WHERE k.page_key > page3_last.last_key
    ORDER BY k.page_key
    LIMIT 20
    """,
)
def q97_keyset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pagination import paginate_after

    e = load_table(spark, sf_dir, "events")
    key = F.concat(
        F.date_format("ts", _TS_FMT_SPARK),
        F.lit("|"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    keyed = e.select("event_id", "user_id", "event_type", key.alias("page_key"))
    # the harness derives last_seen the way an API client would: the tail
    # of the previous page (3 pages × 20). Driver-side scalar, O(1).
    last_key = (
        keyed.orderBy("page_key").limit(60).agg(F.max("page_key")).first()[0]
    )
    return paginate_after(keyed, F.col("page_key"), last_key, 20)


# --------------------------------------------------------------------------
# q99 — frame-based sliding aggregate: 7-day moving average of daily
# revenue per event_type (ROWS BETWEEN 6 PRECEDING AND CURRENT ROW over
# the dense daily series). Daily sums are exact DECIMAL (order-free); the
# moving average is ONE double division of the exact frame sum — no
# accumulated floating error, and the frame sum itself stays decimal so
# the window is engine-exact.
@_register(
    "q99_moving_average",
    """
    WITH daily AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               SUM(CAST(value AS DECIMAL(18,2))) AS rev
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, day,
           CAST(rev AS DOUBLE) AS day_revenue,
           CAST(SUM(rev) OVER w AS DOUBLE) AS window_revenue,
           CAST(SUM(rev) OVER w AS DOUBLE) / COUNT(*) OVER w AS moving_avg
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def q99_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("rev"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    return daily.select(
        "event_type",
        "day",
        F.col("rev").cast("double").alias("day_revenue"),
        F.sum("rev").over(w).cast("double").alias("window_revenue"),
        (F.sum("rev").over(w).cast("double") / F.count("*").over(w)).alias("moving_avg"),
    )


# --------------------------------------------------------------------------
# q100 — market-share capstone (TPC-H Q8 shape): each region's share of
# global revenue per order-priority class — a conditional-aggregate ratio
# over the full star join. Numerator and denominator are both exact
# DECIMAL sums; the share is one double division, so the ratio is
# engine-exact without any rounding fudge.
@_register(
    "q100_region_market_share",
    """
    SELECT o.o_orderpriority AS priority,
           CAST(SUM(CASE WHEN r.r_name = 'EUROPE'
                         THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
               / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS europe_share,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1
    """,
)
def q100_region_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    # integer-cents arithmetic per row, exact decimal sum per group
    # (plans/_util.py r6) — conditional cents for the EUROPE numerator
    eu = F.when(F.col("r_name") == "EUROPE", F.col("l_extendedprice")).otherwise(F.lit(0.0))
    return (
        # customer grows with SF — no forced hint, AQE decides (VERDICT r5
        # item 1); nation/region are constant-size and keep theirs.
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            (money_sum(eu) / money_sum("l_extendedprice")).alias("europe_share"),
            money_sum("l_extendedprice").alias("total_revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )




# --------------------------------------------------------------------------
# q145 — BM25-family RANKED RETRIEVAL (Robertson-Spärck Jones BM25, public):
# score the corpus against a fixed bag-of-words query with the saturated-TF
# scoring function tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)), k1=1.2 b=0.75,
# weighted per term by the RATIONAL idf surrogate (N−df+0.5)/(df+0.5) —
# exp of the Robertson idf; per-term monotone in df, so term saturation
# behaves like BM25 while avoiding ln(), which is not cross-engine
# bit-stable (the q87 divergence note). Parity scheme: the per-(doc,term)
# contribution is a fixed IEEE expression tree on identical doubles
# (dl/avgdl carried as the exact integer ratio dl·N/ΣDL before ONE double
# division), floored into integer MICRO-units — the q127 ADC trick — so
# the per-doc sum is an order-independent BIGINT sum and the final ranking
# compares integers. Scale: token explode → two token-keyed aggs (df, tf)
# + one per-doc agg; the query-term table is literal-bounded; global top-k
# is orderBy+limit (TakeOrdered — no single-task global window).
_BM25_TERMS = ("customer", "vector", "batch")


@_register(
    "q145_bm25_retrieval",
    f"""
    WITH toks AS (
        SELECT doc_id, tok
        FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
            FROM documents
        )
        WHERE length(tok) >= 3
    ),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS dlsum
        FROM dl
    ),
    qterm AS (SELECT unnest({list(_BM25_TERMS)}) AS tok),
    df AS (
        SELECT toks.tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM toks JOIN qterm ON toks.tok = qterm.tok GROUP BY 1
    ),
    tf AS (
        SELECT doc_id, toks.tok, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks JOIN qterm ON toks.tok = qterm.tok GROUP BY 1, 2
    ),
    contrib AS (
        SELECT tf.doc_id,
               CAST(floor(
                   ((CAST(s.n - df.df AS DOUBLE) + 0.5) / (CAST(df.df AS DOUBLE) + 0.5))
                   * (CAST(tf.tf AS DOUBLE) * 2.2
                      / (CAST(tf.tf AS DOUBLE)
                         + 1.2 * (0.25 + 0.75 * (CAST(dl.dl * s.n AS DOUBLE)
                                                 / CAST(s.dlsum AS DOUBLE)))))
                   * 1000000.0) AS BIGINT) AS micro
        FROM tf JOIN dl USING (doc_id) CROSS JOIN stats s JOIN df ON tf.tok = df.tok
    )
    SELECT doc_id, CAST(SUM(micro) AS BIGINT) AS bm25_micro,
           CAST(COUNT(*) AS BIGINT) AS n_terms_hit
    FROM contrib
    GROUP BY doc_id
    ORDER BY bm25_micro DESC, doc_id
    LIMIT 20
    """,
)
def q145_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("tok")
    ).filter(F.length("tok") >= 3)
    qterm = F.col("tok").isin(*_BM25_TERMS)
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n"), F.sum("dl").alias("dlsum")
    )
    df_t = toks.filter(qterm).groupBy("tok").agg(F.count_distinct("doc_id").alias("df"))
    tf = toks.filter(qterm).groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    contrib = (
        tf.join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(df_t), "tok")
        .select(
            "doc_id",
            F.floor(
                (((F.col("n") - F.col("df")).cast("double") + F.lit(0.5))
                 / (F.col("df").cast("double") + F.lit(0.5)))
                * (F.col("tf").cast("double") * F.lit(2.2)
                   / (F.col("tf").cast("double")
                      + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75)
                                      * ((F.col("dl") * F.col("n")).cast("double")
                                         / F.col("dlsum").cast("double")))))
                * F.lit(1000000.0)
            ).cast("bigint").alias("micro"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(F.sum("micro").alias("bm25_micro"), F.count("*").alias("n_terms_hit"))
        .orderBy(F.col("bm25_micro").desc(), "doc_id")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q149 — COLLOCATION MINING: adjacent-bigram association strength as the
# PMI lift ratio p(ab)/(p(a)p(b)) = c_ab·N1²/(N2·c_a·c_b) — the exp of
# pointwise mutual information, monotone in PMI per pair, so top-lift
# collocations are textbook-identical while ln() stays out of the gate
# (the q87/q145 divergence rule). Computed in DOUBLE with one fixed
# parenthesization (integer products would overflow BIGINT at corpus
# scale: N1² ≈ 10²⁴ at 100 TB), then floored into 1e-4 units so the
# ranking compares integers. Tokenization = q87's (lower, non-[a-z]
# split, len ≥ 3), with adjacency over the FILTERED token sequence.
# Scale: one bigram explode, two token-keyed aggs, tiny stats cross join;
# min-support 5 prunes the tail before the final top-k (TakeOrdered).
@_register(
    "q149_collocations",
    """
    WITH arrs AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z]+'),
                           x -> length(x) >= 3) AS t
        FROM documents
    ),
    uni AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT unnest(t) AS tok FROM arrs) GROUP BY 1
    ),
    n1 AS (SELECT CAST(SUM(c) AS BIGINT) AS n1 FROM uni),
    bi AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_ab
        FROM (
            SELECT t[i] AS w1, t[i + 1] AS w2
            FROM (SELECT t, unnest(range(1, len(t))) AS i FROM arrs)
        )
        GROUP BY 1, 2
    ),
    n2 AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n2 FROM bi),
    lift AS (
        SELECT bi.w1, bi.w2, bi.c_ab,
               CAST(floor(
                   ((CAST(bi.c_ab AS DOUBLE)
                     * (CAST(n1.n1 AS DOUBLE) * CAST(n1.n1 AS DOUBLE)))
                    / (CAST(n2.n2 AS DOUBLE)
                       * (CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE))))
                   * 10000.0) AS BIGINT) AS lift_e4
        FROM bi
        JOIN uni ua ON bi.w1 = ua.tok
        JOIN uni ub ON bi.w2 = ub.tok
        CROSS JOIN n1 CROSS JOIN n2
        WHERE bi.c_ab >= 5
    )
    SELECT w1, w2, c_ab, lift_e4
    FROM lift
    ORDER BY lift_e4 DESC, w1, w2
    LIMIT 20
    """,
)
def q149_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    arrs = d.select(
        "doc_id",
        F.filter(
            F.split(F.lower("text"), "[^a-z]+"), lambda t: F.length(t) >= 3
        ).alias("t"),
    )
    uni = (
        arrs.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    n1 = uni.agg(F.sum("c").alias("n1"))
    bi = (
        arrs.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(t) >= 2 THEN "
                    "transform(sequence(1, size(t) - 1), i -> struct(t[i - 1] AS w1, t[i] AS w2)) "
                    "ELSE CAST(array() AS array<struct<w1: string, w2: string>>) END"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c_ab"))
    )
    n2 = bi.agg(F.sum("c_ab").alias("n2"))
    ua = uni.select(F.col("tok").alias("w1"), F.col("c").alias("ca"))
    ub = uni.select(F.col("tok").alias("w2"), F.col("c").alias("cb"))
    lift = (
        bi.filter(F.col("c_ab") >= 5)
        .join(ua, "w1")
        .join(ub, "w2")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            "w1",
            "w2",
            "c_ab",
            F.floor(
                (
                    (F.col("c_ab").cast("double")
                     * (F.col("n1").cast("double") * F.col("n1").cast("double")))
                    / (F.col("n2").cast("double")
                       * (F.col("ca").cast("double") * F.col("cb").cast("double")))
                )
                * F.lit(10000.0)
            ).cast("bigint").alias("lift_e4"),
        )
    )
    return lift.orderBy(F.col("lift_e4").desc(), "w1", "w2").limit(20)
