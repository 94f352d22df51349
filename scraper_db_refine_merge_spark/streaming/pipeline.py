"""Incremental / streaming ingestion (SURVEY §2.11 ST1-ST5, S15).

The reference is batch + incremental re-scrape with upsert semantics
(data_migration.py:133-139, unified_scraper.py:622-642). Structured
Streaming generalizes it:

- ST1: ``readStream`` over a landing directory → refine → ``foreachBatch``
  keyed MERGE (latest wins). foreachBatch is the correct sink because MERGE
  is not an append-only streaming sink; each micro-batch applies W3 dedup
  then the upsert.
- ST2: freshness predicate / TTL (ventura_crawler.py:260-287) as both a
  batch predicate and a watermark config.
- ST3: staleness detection (DF001/DF002) producing a refresh queue.
- ST5/S15: per-batch metrics rows appended to a metrics table
  (the append-mode metrics sink of ventura_crawler.py:289-300).

At scale the landing dir becomes cloud storage / Kafka; ``maxFilesPerTrigger``
bounds batch size so MERGE rewrites stay amortized.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import merge_upsert
from ..refine import refine

RAW_STREAM_SCHEMA = (
    "title string, url string, venue string, date_text string, "
    "lineup array<struct<name:string,role:string>>, price_text string, "
    "genres array<string>, description string, scraped_at string"
)


def stream_ingest(
    spark: SparkSession,
    landing_dir: str,
    target_path: str,
    checkpoint_dir: str,
    source_platform: str = "stream",
    metrics_path: str | None = None,
    max_files_per_trigger: int = 16,
    partition_by_event_date: bool = False,
    now: datetime | None = None,
):
    """ST1 — continuous upsert ingestion. Returns the StreamingQuery.

    Each micro-batch: refine → latest-wins per event_id → MERGE into the
    keyed events table; optionally append a run-metrics row (ST5).

    ``partition_by_event_date=True`` switches to the partition-pruned MERGE
    (operators.merge.merge_upsert_partitioned) over a table hive-partitioned
    by ``event_date``: a micro-batch only rewrites the date partitions it
    touches. This is the production shape — re-scrapes have temporal
    locality, so merge cost tracks the batch, not the table. The default
    whole-table MERGE reports richer stats and suits small tables.
    """
    raw = (
        spark.readStream.schema(RAW_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(landing_dir)
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # fixed `now` (deterministic replay / the oracle-gated q57) or
        # wall clock (production)
        refined = refine(batch_df, source_platform, now=now)
        if partition_by_event_date:
            from ..operators.merge import merge_upsert_partitioned

            with_date = refined.withColumn(
                "event_date",
                F.coalesce(
                    F.to_date(F.try_to_timestamp(F.col("datetime.start_date"))),
                    F.lit("1970-01-01").cast("date"),
                ),
            )
            touched = merge_upsert_partitioned(
                spark,
                target_path,
                with_date,
                key_cols=["event_id"],
                partition_col="event_date",
                order_cols=[
                    F.col("scraping_metadata.last_scraped").desc(),
                    F.col("event_id"),
                ],
            )
            if metrics_path:
                metrics = spark.createDataFrame(
                    [(batch_id, len(touched), datetime.now(timezone.utc).isoformat())],
                    "batch_id long, partitions_rewritten int, emitted_at string",
                )
                metrics.write.mode("append").parquet(metrics_path)
            return
        # r17 (guide §1.2): MergeStats cost real jobs per micro-batch
        # (_overlap_stats counts over target AND the full refine lineage)
        # and were discarded whenever no metrics sink was configured —
        # only collect them when the ST5 metrics emission consumes them.
        stats = merge_upsert(
            spark,
            target_path,
            refined,
            key_cols=["event_id"],
            order_cols=[F.col("scraping_metadata.last_scraped").desc(), F.col("event_id")],
            collect_stats=metrics_path is not None,
        )
        if metrics_path and stats:
            # ST5 — run-level metrics emission (ventura_crawler.py:289-300)
            metrics = spark.createDataFrame(
                [
                    (
                        batch_id,
                        stats.total_incoming,
                        stats.within_batch_duplicates,
                        stats.updated,
                        stats.inserted,
                        stats.target_rows_after,
                        datetime.now(timezone.utc).isoformat(),
                    )
                ],
                "batch_id long, incoming long, within_batch_duplicates long, "
                "updated long, inserted long, target_rows_after long, emitted_at string",
            )
            metrics.write.mode("append").parquet(metrics_path)

    return (
        raw.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def fresh_rows(df: DataFrame, ts_col: str, max_age_hours: float, now: datetime | None = None) -> DataFrame:
    """ST2 — TTL cache predicate: rows scraped within the window
    (ventura_crawler.py:260-287)."""
    now = now or datetime.now(timezone.utc)
    cutoff = (now - timedelta(hours=max_age_hours)).replace(tzinfo=None)
    return df.filter(F.try_to_timestamp(F.col(ts_col)) >= F.lit(cutoff).cast("timestamp"))


def refresh_queue(events: DataFrame, now: datetime | None = None) -> DataFrame:
    """ST3 — staleness detection (DF001: scraped > 7d ago; DF002: stale
    future events) + explicit refresh flags (ST4) → rows needing re-scrape."""
    now = now or datetime.now(timezone.utc)
    scraped = F.try_to_timestamp(F.col("scraping_metadata.last_scraped"))
    start = F.try_to_timestamp(F.col("datetime.start_date"))
    now_l = F.lit(now.replace(tzinfo=None)).cast("timestamp")
    df001 = scraped < F.lit((now - timedelta(days=7)).replace(tzinfo=None)).cast("timestamp")
    df002 = (start > now_l) & (
        scraped < F.lit((now - timedelta(days=30)).replace(tzinfo=None)).cast("timestamp")
    )
    flagged = F.coalesce(F.col("system_flags.needs_refresh"), F.lit(False))
    reason = (
        F.when(flagged, "explicit_refresh_request")
        .when(df001, "stale_scrape")
        .otherwise("stale_future_event")
    )
    return (
        events.filter(flagged | df001 | df002)
        .select(
            "event_id",
            F.col("scraping_metadata.source_url").alias("source_url"),
            reason.alias("reason"),
        )
    )


def dedup_stream(
    stream_df: DataFrame, id_cols: list[str], ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exact-dedup with bounded state: first row per id wins,
    duplicates arriving within the watermark horizon are dropped, and id
    state is EVICTED once the watermark passes its event time + delay —
    so state is O(ids per watermark window), not O(all ids ever) like
    plain ``dropDuplicates`` on a stream. The cost of bounded state is
    at-least-once across horizons: an id re-sent after eviction emits
    again (dedupe the sink with a batch J3/J4 pass if exactly-once
    matters downstream). The J3 dedup family's streaming analog."""
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(id_cols)


def windowed_event_counts(
    stream_df: DataFrame, ts_col: str = "ts", window_len: str = "1 day", watermark: str = "1 hour"
) -> DataFrame:
    """Tumbling-window counts with late-data watermark — the streaming analog
    of the A2 daily-counts report. Works on both streams and batches."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_len).alias("w"))
        .agg(F.count("*").alias("event_count"))
        .select(F.col("w.start").alias("window_start"), "event_count")
    )
