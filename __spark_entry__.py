"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship query smoke check on sf0.001.
- ``queries()`` — every implemented operator/query from SURVEY.md §2,
  each ``(spark, sf_dir) -> DataFrame``.
- ``oracle_sql()`` — DuckDB-equivalent SQL per query (same column names).
  ALL registered queries carry an oracle — including the md5-derived
  SimHash/LSH pipelines, mirrored via DuckDB's '0x…'::UBIGINT hex cast
  (≡ Spark conv(hex,16,10)).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from scraper_db_refine_merge_spark.plans.catalog import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7 Phase 1): the reference's GET /api/events
    shape — pushed-down filters, projection, date sort, page cap — over the
    events table (q20). The star-join showcase remains available as
    queries()["q04_region_revenue"]."""
    return QUERIES["q20_api_events_listing"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
