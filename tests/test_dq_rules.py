"""DQ rule engine tests: passing + failing fixture per rule family
(FIXTURES.md §7: one fixture per rule with pass and fail variants)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from scraper_db_refine_merge_spark.functions.dq_rules import (
    RULES,
    dq_summary,
    evaluate_rules,
    issue_table,
    rule_rollup,
)
from scraper_db_refine_merge_spark.refine import refine

NOW = datetime(2025, 5, 1, 12, 0, 0, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def evaluated(spark):
    # a clean event via refine() + handcrafted violations
    raw = spark.createDataFrame(
        [
            (
                "Good Party 2025",
                "https://www.example.com/events/1",
                "hi ibiza",
                "25 May 2025",
                [("Headliner A", "headliner")],
                "50€",
                ["techno"],
                "A fine party",
            )
        ],
        "title string, url string, venue string, date_text string, "
        "lineup array<struct<name:string,role:string>>, price_text string, "
        "genres array<string>, description string",
    )
    clean = refine(raw, "test-platform", now=NOW)

    # violations: empty title (C002), bad start date (C003/VF004), bad url
    # (C004/VF001), negative price (VF006), bad currency (VF007), end<start
    # (CP001), placeholder title (CP007), generic venue (CP008), stale scrape
    # (DF001), duplicated event_id (C001)
    bad = clean.withColumn("title", F.lit("Untitled Event")).withColumn(
        "datetime",
        F.col("datetime")
        .withField("start_date", F.lit("2025-06-01T23:00:00Z"))
        .withField("end_date", F.lit("2025-05-31T23:00:00Z")),
    ).withColumn(
        "venue", F.col("venue").withField("name", F.lit("TBC"))
    ).withColumn(
        "ticketing",
        F.col("ticketing").withField(
            "tiers",
            F.expr(
                "array(named_struct('tier_name','X','tier_price',cast(-5.0 as double),"
                "'currency','ZZZ','sale_start',cast(null as string),'sale_end',cast(null as string),"
                "'is_sold_out',false,'is_nearly_sold_out',false))"
            ),
        ),
    ).withColumn(
        "scraping_metadata",
        F.col("scraping_metadata")
        .withField("source_url", F.lit("not a url"))
        .withField("last_scraped", F.lit("2025-01-01T00:00:00+00:00")),
    )
    dup = clean  # same event_id as clean → C001 fails for both
    corpus = clean.unionByName(bad).unionByName(dup)
    return evaluate_rules(corpus, now=NOW).cache()


def test_rule_count_is_32():
    assert len(RULES) == 32


@pytest.mark.slow
def test_clean_event_passes_most(evaluated):
    rows = evaluated.filter(F.col("title") == "Good Party 2025").collect()
    assert len(rows) == 2  # clean + dup
    failed = {
        r["rule_id"] for row in rows for r in row["dq_rule_results"] if not r["passed"]
    }
    # duplicate id trips C001; keywords/description-of-sections may trip C007
    assert "C002" not in failed and "C003" not in failed and "VF004" not in failed
    assert "C001" in failed


def test_bad_event_fails_expected_rules(evaluated):
    row = evaluated.filter(F.col("title") == "Untitled Event").first()
    res = {r["rule_id"]: r["passed"] for r in row["dq_rule_results"]}
    for rule_id in ["C004", "VF001", "VF006", "VF007", "CP001", "CP007", "CP008", "DF001"]:
        assert res[rule_id] is False, rule_id
    assert res["C002"] is True  # "Untitled Event" is non-empty → completeness ok
    assert res["C010"] is True  # parseable timestamp, just stale


@pytest.mark.slow
def test_issue_table_and_rollup(evaluated):
    issues = issue_table(evaluated)
    assert issues.filter(F.col("rule_id") == "CP001").count() == 1
    roll = rule_rollup(evaluated)
    as_map = {r["rule_id"]: r for r in roll.collect()}
    assert len(as_map) == 32
    # clean, dup, AND bad all share the same event_id (bad is derived from clean)
    assert as_map["C001"]["failures"] == 3
    assert as_map["CP007"]["failures"] == 1
    assert as_map["C002"]["pass_rate"] == 1.0

    s = dq_summary(evaluated).first()
    assert s["total_events"] == 3
    assert s["events_with_issues"] == 3
    assert s["events_with_critical_issues"] == 3  # C001 (dup) is Critical
