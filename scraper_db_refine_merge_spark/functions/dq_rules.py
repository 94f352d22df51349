"""Declarative data-quality rule engine (SURVEY D5/A14).

The reference specifies a 32-rule catalog (docs/data_quality_rules.md:30-86:
C001-C011 completeness, VF001-VF011 validity/format, CP001-CP008
consistency/plausibility, DF001-DF002 freshness) with a registry design
(docs/dq_assessment_script_design.md:160-213). Here each rule is a named
boolean column over the unified events table; the rule set evaluates in ONE
projection producing ``dq_rule_results: array<struct<rule_id, severity,
passed>>``, and the rollup (A14) is an explode + groupBy.

Issue-table output (docs/dq_assessment_script_design.md:264-280): one row
per failed rule per event — the ``data_quality_issues`` collection analog.

Scale: rule evaluation is embarrassingly parallel (no shuffle); only the
rollup aggregates. C001's uniqueness check is the exception — it needs a
count over event_id, implemented as a window count (single shuffle on the
key, which the merge layer already partitions by).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta, timezone
from typing import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .strings import VALID_CURRENCIES

_URL_RE = r"(?i)^https?://[^\s/]+\.[^\s/]+"
_IANA_TZ_RE = r"^[A-Za-z]+/[A-Za-z_+-]+$|^UTC$|^CET$|^CEST$"
_PLACEHOLDER_TITLES = ("untitled event", "lorem ipsum", "test event", "tbc", "tba")
_GENERIC_VENUES = ("tbc", "tba", "venue to be announced", "unknown venue", "to be confirmed")


@dataclass(frozen=True)
class Rule:
    rule_id: str
    severity: str  # Critical | High | Medium | Low
    field: str
    description: str
    predicate: Callable[[DataFrame, datetime], Column]  # True = PASS


def _truthy(c: Column) -> Column:
    return c.isNotNull() & (c != "")


def _valid_iso(c: Column) -> Column:
    return c.isNull() | F.try_to_timestamp(c).isNotNull()


def _ts(c: Column) -> Column:
    return F.try_to_timestamp(c)


def _tiers(df):  # noqa: ANN001
    return F.coalesce(
        F.col("ticketing.tiers"),
        F.array().cast(df.schema["ticketing"].dataType["tiers"].dataType),
    )


RULES: list[Rule] = [
    # --- Completeness (C001-C011)
    Rule("C001", "Critical", "event_id", "unique non-empty event id",
         lambda df, now: _truthy(F.col("event_id")) & (F.col("__event_id_count") == 1)),
    Rule("C002", "Critical", "title", "non-empty title",
         lambda df, now: _truthy(F.col("title"))),
    Rule("C003", "Critical", "datetime.start_date", "valid start date",
         lambda df, now: _truthy(F.col("datetime.start_date"))
         & _ts(F.col("datetime.start_date")).isNotNull()),
    Rule("C004", "Critical", "scraping_metadata.source_url", "valid source url",
         lambda df, now: _truthy(F.col("scraping_metadata.source_url"))
         & F.col("scraping_metadata.source_url").rlike(_URL_RE)),
    Rule("C005", "High", "venue.name", "primary location identifier present",
         lambda df, now: _truthy(F.col("venue.name"))
         | _truthy(F.col("venue.address.full_address"))),
    Rule("C006", "Medium", "content", "description present",
         lambda df, now: _truthy(F.col("content.full_description"))
         | _truthy(F.col("content.short_description"))),
    Rule("C007", "Medium", "content.keywords", "content keywords/hashtags present",
         lambda df, now: (F.size(F.coalesce(F.col("content.keywords"), F.array())) > 0)
         | (F.size(F.coalesce(F.col("content.hashtags"), F.array())) > 0)),
    Rule("C008", "Medium", "ticketing", "price info present for paid events",
         lambda df, now: (F.col("ticketing.is_free") != False)  # noqa: E712
         | (F.size(_tiers(df)) > 0) | _truthy(F.col("ticketing.tickets_url"))),
    Rule("C009", "Critical", "scraping_metadata.source_platform", "source platform present",
         lambda df, now: _truthy(F.col("scraping_metadata.source_platform"))),
    Rule("C010", "Critical", "scraping_metadata.last_scraped", "valid scraped timestamp",
         lambda df, now: _truthy(F.col("scraping_metadata.last_scraped"))
         & _ts(F.col("scraping_metadata.last_scraped")).isNotNull()),
    Rule("C011", "Medium", "acts", "performer information present",
         lambda df, now: F.size(F.coalesce(F.col("acts"), F.array())) > 0),
    # --- Validity & format (VF001-VF011)
    Rule("VF001", "Critical", "scraping_metadata.source_url", "source url format",
         lambda df, now: F.col("scraping_metadata.source_url").isNull()
         | F.col("scraping_metadata.source_url").rlike(_URL_RE)),
    Rule("VF002", "High", "venue.social_links", "social/image link formats",
         lambda df, now: F.size(
             F.filter(
                 F.map_values(F.coalesce(F.col("venue.social_links"),
                                         F.map_from_arrays(F.array(), F.array()).cast("map<string,string>"))),
                 lambda v: ~v.rlike(_URL_RE),
             )
         ) == 0),
    Rule("VF003", "High", "ticketing.tickets_url", "ticket url format",
         lambda df, now: F.col("ticketing.tickets_url").isNull()
         | F.col("ticketing.tickets_url").rlike(_URL_RE)),
    Rule("VF004", "Critical", "datetime", "ISO-8601 dates parse",
         lambda df, now: _valid_iso(F.col("datetime.start_date"))
         & _valid_iso(F.col("datetime.end_date"))
         & _valid_iso(F.col("scraping_metadata.first_scraped"))
         & _valid_iso(F.col("scraping_metadata.last_scraped"))),
    Rule("VF005", "High", "datetime.timezone", "IANA timezone string",
         lambda df, now: F.col("datetime.timezone").isNull()
         | F.col("datetime.timezone").rlike(_IANA_TZ_RE)),
    Rule("VF006", "High", "ticketing.tiers.tier_price", "non-negative numeric prices",
         lambda df, now: F.size(
             F.filter(_tiers(df), lambda t: t["tier_price"].isNotNull() & (t["tier_price"] < 0))
         ) == 0),
    Rule("VF007", "High", "ticketing.tiers.currency", "ISO-4217 currency codes",
         lambda df, now: F.size(
             F.filter(
                 _tiers(df),
                 lambda t: t["currency"].isNotNull() & ~F.upper(t["currency"]).isin(*VALID_CURRENCIES),
             )
         ) == 0),
    Rule("VF008", "High", "venue.coordinates", "geo-coordinates in range",
         lambda df, now: (F.size(F.coalesce(F.col("venue.coordinates.coordinates"), F.array().cast("array<double>"))) != 2)
         | (F.get(F.col("venue.coordinates.coordinates"), 0).between(-180.0, 180.0)
            & F.get(F.col("venue.coordinates.coordinates"), 1).between(-90.0, 90.0))),
    Rule("VF009", "High", "system_flags", "boolean flags are boolean",
         lambda df, now: F.col("system_flags.is_hidden").isNotNull()
         & F.col("system_flags.is_featured").isNotNull()),
    Rule("VF010", "Medium", "acts", "each act has a name",
         lambda df, now: F.size(
             F.filter(F.coalesce(F.col("acts"), F.array().cast(df.schema["acts"].dataType)),
                      lambda a: a["act_name"].isNull() | (a["act_name"] == ""))
         ) == 0),
    Rule("VF011", "Medium", "title", "string length limits",
         lambda df, now: (F.length(F.coalesce(F.col("title"), F.lit(""))) <= 500)
         & (F.length(F.coalesce(F.col("content.full_description"), F.lit(""))) <= 10000)
         & (F.length(F.coalesce(F.col("venue.name"), F.lit(""))) <= 200)),
    # --- Consistency & plausibility (CP001-CP008)
    Rule("CP001", "High", "datetime", "end date >= start date",
         lambda df, now: F.col("datetime.end_date").isNull()
         | F.col("datetime.start_date").isNull()
         | (_ts(F.col("datetime.end_date")) >= _ts(F.col("datetime.start_date")))),
    Rule("CP002", "Medium", "datetime", "plausible duration (< 7 days)",
         lambda df, now: F.col("datetime.end_date").isNull()
         | F.col("datetime.start_date").isNull()
         | ((_ts(F.col("datetime.end_date")).cast("double")
             - _ts(F.col("datetime.start_date")).cast("double")) < 7 * 86400)),
    Rule("CP003", "Medium", "datetime.start_date", "start within [-1y, +3y]",
         lambda df, now: _ts(F.col("datetime.start_date")).isNull()
         | _ts(F.col("datetime.start_date")).between(
             F.lit((now - timedelta(days=365)).replace(tzinfo=None)).cast("timestamp"),
             F.lit((now + timedelta(days=3 * 365)).replace(tzinfo=None)).cast("timestamp"))),
    Rule("CP004", "Medium", "venue.address", "city/country consistency",
         lambda df, now: F.col("venue.address.city").isNull()
         | F.col("venue.address.country").isNull()
         | ~(F.lower(F.col("venue.address.city")).contains("ibiza")
             & (F.lower(F.col("venue.address.country")) != "spain"))),
    Rule("CP005", "Medium", "ticketing.tiers.tier_price", "plausible prices",
         lambda df, now: F.size(
             F.filter(_tiers(df),
                      lambda t: t["tier_price"].isNotNull()
                      & ((t["tier_price"] > 10000) | ((t["tier_price"] > 0) & (t["tier_price"] < 1))))
         ) == 0),
    Rule("CP006", "High", "ticketing", "is_free consistent with prices",
         lambda df, now: (F.col("ticketing.is_free") != True)  # noqa: E712
         | (F.size(F.filter(_tiers(df), lambda t: t["tier_price"] > 0)) == 0)),
    Rule("CP007", "Low", "title", "no placeholder title",
         lambda df, now: ~F.lower(F.coalesce(F.col("title"), F.lit(""))).isin(*_PLACEHOLDER_TITLES)),
    Rule("CP008", "Low", "venue.name", "no generic venue name",
         lambda df, now: ~F.lower(F.coalesce(F.col("venue.name"), F.lit(""))).isin(*_GENERIC_VENUES)),
    # --- Freshness (DF001-DF002)
    Rule("DF001", "High", "scraping_metadata.last_scraped", "scraped within 7 days",
         lambda df, now: _ts(F.col("scraping_metadata.last_scraped")).isNull()
         | (_ts(F.col("scraping_metadata.last_scraped"))
            >= F.lit((now - timedelta(days=7)).replace(tzinfo=None)).cast("timestamp"))),
    Rule("DF002", "Medium", "scraping_metadata.last_scraped", "future events freshly scraped",
         lambda df, now: (_ts(F.col("datetime.start_date")).isNull())
         | (_ts(F.col("datetime.start_date")) <= F.lit(now.replace(tzinfo=None)).cast("timestamp"))
         | (_ts(F.col("scraping_metadata.last_scraped"))
            >= F.lit((now - timedelta(days=30)).replace(tzinfo=None)).cast("timestamp"))),
]

RULES_BY_ID = {r.rule_id: r for r in RULES}


def evaluate_rules(
    events: DataFrame, now: datetime | None = None, rules: list[Rule] | None = None
) -> DataFrame:
    """Adds ``dq_rule_results: array<struct<rule_id,severity,field,passed>>``.

    One projection; the only shuffle is the C001 uniqueness window count.
    A predicate that evaluates to NULL (three-valued SQL logic over missing
    fields, e.g. C008 with NULL ``is_free`` and no tiers) counts as a FAIL —
    an unevaluable rule must not count as passed, and the rollup's failure
    count and pass rate must agree on it.
    """
    now = now or datetime.now(timezone.utc)
    rules = rules or RULES
    df = events.withColumn(
        "__event_id_count", F.count("*").over(Window.partitionBy("event_id"))
    )
    entries = [
        F.struct(
            F.lit(r.rule_id).alias("rule_id"),
            F.lit(r.severity).alias("severity"),
            F.lit(r.field).alias("field"),
            F.coalesce(r.predicate(df, now), F.lit(False)).alias("passed"),
        )
        for r in rules
    ]
    return df.withColumn("dq_rule_results", F.array(*entries)).drop("__event_id_count")


def issue_table(evaluated: DataFrame) -> DataFrame:
    """One row per failed rule per event — the ``data_quality_issues``
    collection analog (docs/dq_assessment_script_design.md:264-280)."""
    return (
        evaluated.select(
            "event_id",
            F.explode(F.filter(F.col("dq_rule_results"), lambda r: ~r["passed"])).alias("r"),
        )
        .select(
            "event_id",
            F.col("r.rule_id").alias("rule_id"),
            F.col("r.severity").alias("severity"),
            F.col("r.field").alias("field"),
        )
    )


def rule_rollup(evaluated: DataFrame) -> DataFrame:
    """A14 — per-rule failure counts + pass rate."""
    n = evaluated.count()
    return (
        evaluated.select(F.explode("dq_rule_results").alias("r"))
        .groupBy(
            F.col("r.rule_id").alias("rule_id"),
            F.col("r.severity").alias("severity"),
            F.col("r.field").alias("field"),
        )
        .agg(
            F.sum(F.when(~F.col("r.passed"), 1).otherwise(0)).alias("failures"),
            F.round(F.avg(F.when(F.col("r.passed"), 1.0).otherwise(0.0)), 4).alias("pass_rate"),
        )
        .withColumn("total_events", F.lit(n))
        .orderBy("rule_id")
    )


def dq_summary(evaluated: DataFrame) -> DataFrame:
    """Docs-with-issues / clean-docs / overall pass rate summary."""
    failed_any = F.size(F.filter(F.col("dq_rule_results"), lambda r: ~r["passed"])) > 0
    critical_failed = (
        F.size(
            F.filter(
                F.col("dq_rule_results"),
                lambda r: ~r["passed"] & (r["severity"] == "Critical"),
            )
        )
        > 0
    )
    return evaluated.agg(
        F.count("*").alias("total_events"),
        F.sum(F.when(failed_any, 1).otherwise(0)).alias("events_with_issues"),
        F.sum(F.when(critical_failed, 1).otherwise(0)).alias("events_with_critical_issues"),
    )
