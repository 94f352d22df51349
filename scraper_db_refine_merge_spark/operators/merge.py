"""Keyed upsert MERGE over Parquet (SURVEY S6/S7/J4/W3).

The reference's merge layer is Mongo bulk ``UpdateOne(upsert=True)`` keyed by
event_id (data_migration.py:102-158, etl_sqlite_to_mongo.py:129-164,
scrapers_v2/utils.py:94-180). The Spark-native equivalent is Delta
``MERGE INTO``; this container has no Delta, so the documented fallback
(SURVEY §4) is implemented: latest-wins within the batch → left-anti +
union → atomic directory swap.

Scale notes:
- within-batch dedup is W3 (row_number over the key) — mandatory before any
  MERGE to avoid nondeterministic multi-match (SURVEY §7 hard-part 5);
- the rewrite is partition-parallel and the swap is atomic at the directory
  level (write to ``<path>.__staging__``, rename over);
- at real scale the same ``merge_upsert`` call maps 1:1 onto Delta MERGE
  (predicate: ``target.key = source.key``) and only rewrites matched files.
"""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


@dataclass
class MergeStats:
    """Counters mirroring the reference's MigrationStats
    (data_migration.py:34-40)."""

    total_incoming: int
    within_batch_duplicates: int
    updated: int
    inserted: int
    target_rows_after: int


def latest_per_key(df: DataFrame, key_cols: list[str], order_cols: list[Column]) -> DataFrame:
    """W3: newest row per business key; order must be a total order."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    order_cols: list[Column] | None = None,
    collect_stats: bool = True,
) -> MergeStats | None:
    """Upsert ``updates`` into the keyed Parquet table at ``target_path``.

    Semantics = Mongo's ``$set`` whole-document upsert / Delta
    ``WHEN MATCHED UPDATE SET * WHEN NOT MATCHED INSERT *`` with
    latest-wins inside the batch.
    """
    order_cols = order_cols or [F.col(key_cols[0])]
    total_incoming = updates.count() if collect_stats else -1
    deduped = latest_per_key(updates, key_cols, order_cols)

    exists = os.path.exists(target_path)
    if exists:
        target = spark.read.parquet(target_path)
        kept = target.join(deduped.select(*key_cols), key_cols, "left_anti")
        merged = kept.unionByName(deduped)
    else:
        merged = deduped

    staging = f"{target_path}.__staging__{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(staging)

    if collect_stats:
        batch_rows = deduped.count()
        if exists:
            kept_rows = spark.read.parquet(staging).count() - batch_rows
            target_rows_before = spark.read.parquet(target_path).count()
            updated = target_rows_before - kept_rows
        else:
            updated = 0
        inserted = batch_rows - updated
        after = kept_rows + batch_rows if exists else batch_rows
        stats = MergeStats(
            total_incoming=total_incoming,
            within_batch_duplicates=total_incoming - batch_rows,
            updated=updated,
            inserted=inserted,
            target_rows_after=after,
        )
    else:
        stats = None

    # atomic swap
    backup = f"{target_path}.__old__{uuid.uuid4().hex[:8]}"
    if exists:
        os.rename(target_path, backup)
    os.rename(staging, target_path)
    if exists:
        shutil.rmtree(backup, ignore_errors=True)
    return stats


def merge_upsert_partitioned(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str,
    order_cols: list[Column] | None = None,
) -> list[str]:
    """Partition-pruned upsert into a hive-partitioned Parquet table.

    The whole-table ``merge_upsert`` rewrite is O(table) per batch — wrong
    cost model at 100 TB. This variant implements what Delta MERGE's file
    pruning does over plain parquet: only partitions that the batch actually
    touches are read, merged, and swapped; every other partition is never
    opened. Merge cost scales with the batch's data locality (a day's
    re-scrape rewrites that day), not with table size.

    Requirements: target written with ``partitionBy(partition_col)``; the
    partition column must be a stable string/date key. Swap atomicity is
    per-partition directory (documented relaxation vs the whole-table swap;
    Delta gets cross-partition atomicity from its log — over raw parquet
    that would require a manifest layer).

    Returns the list of partition values rewritten.
    """
    order_cols = order_cols or [F.col(key_cols[0])]
    deduped = latest_per_key(updates, key_cols, order_cols)

    # The batch's touched partitions: small by construction (a batch has
    # temporal/source locality), so collect() is a driver-sized list.
    touched = [
        r[0] for r in deduped.select(partition_col).distinct().collect()
    ]
    if not touched:
        return []
    # A NULL partition value would be written as __HIVE_DEFAULT_PARTITION__
    # in staging, but the swap loop below builds "col=None" paths (never
    # found → rows silently dropped) and isin(touched) can't prune NULLs.
    # Callers must coalesce to a sentinel first (stream_ingest does).
    if any(v is None for v in touched):
        raise ValueError(
            f"merge_upsert_partitioned: NULL values in partition column "
            f"{partition_col!r}; coalesce to a sentinel before merging"
        )

    exists = os.path.exists(target_path)
    if exists:
        target = spark.read.option("basePath", target_path).parquet(target_path)
        # partition pruning: only touched partition directories are scanned
        affected = target.filter(F.col(partition_col).isin(touched))
        kept = affected.join(deduped.select(*key_cols), key_cols, "left_anti")
        merged = kept.unionByName(deduped.select(*kept.columns))
    else:
        merged = deduped

    staging = f"{target_path}.__staging__{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").partitionBy(partition_col).parquet(staging)

    os.makedirs(target_path, exist_ok=True)
    for value in touched:
        part_dir = f"{partition_col}={value}"
        src = os.path.join(staging, part_dir)
        dst = os.path.join(target_path, part_dir)
        if not os.path.exists(src):
            continue
        backup = f"{dst}.__old__{uuid.uuid4().hex[:8]}"
        if os.path.exists(dst):
            os.rename(dst, backup)
        os.rename(src, dst)
        shutil.rmtree(backup, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)
    return sorted(str(v) for v in touched)


def insert_if_absent(
    spark: SparkSession, target_path: str, new_rows: DataFrame, key_cols: list[str]
) -> int:
    """J9/U3 — anti-join insert (reference add_proxies_if_not_exist,
    ventura_crawler.py:386-398). Returns number of rows appended."""
    if os.path.exists(target_path):
        existing = spark.read.parquet(target_path).select(*key_cols)
        fresh = new_rows.join(existing, key_cols, "left_anti")
    else:
        fresh = new_rows
    n = fresh.count()
    if n:
        fresh.write.mode("append").parquet(target_path)
    return n
