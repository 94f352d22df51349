"""Raw JSON event sources (SURVEY S1/S2/S8).

The reference ingests scraped events from JSON array files
(database/data_migration.py:42-49,168-172) and calendar exports wrapped in a
``{metadata, events[]}`` envelope (ibiza_spotlight_calendar_events.json).

Scale notes: ``multiLine`` JSON cannot be split within a file (one file =
one task), so huge exports should be NDJSON — ``read_ndjson`` covers that
path and parallelizes by file splits. All readers run PERMISSIVE with a
``_corrupt_record`` column so one malformed scrape does not kill a 100 TB
ingest; corrupt rows are quarantined, not dropped silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_json_array(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """S1 — JSON array-of-events file scan (data_migration.py:42-49)."""
    reader = spark.read.option("multiLine", True).option("mode", "PERMISSIVE")
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def read_ndjson(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """S1 (scale path) — newline-delimited JSON: splittable, parallel."""
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", CORRUPT_COL
    )
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def read_calendar_export(spark: SparkSession, path: str) -> DataFrame:
    """S2 — wrapped calendar export: ``{metadata, events[]}`` envelope →
    one row per event with the run metadata carried alongside
    (ibiza_spotlight_calendar_events.json:1-20)."""
    raw = spark.read.option("multiLine", True).json(path)
    return raw.select(
        F.col("metadata"), F.explode(F.col("events")).alias("event")
    ).select("metadata.*", "event.*")


def bulk_copy(spark: SparkSession, source_path: str, target_path: str) -> int:
    """S8 — insert-only collection-to-collection copy
    (migrate_to_atlas.py:15-43): append everything, no key matching.
    Returns rows copied. Unordered-parallel by construction (§4)."""
    df = spark.read.parquet(source_path)
    n = df.count()
    df.write.mode("append").parquet(target_path)
    return n
