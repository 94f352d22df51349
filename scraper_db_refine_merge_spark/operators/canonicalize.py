"""Cross-source canonicalization (SURVEY J5) and extraction-layer coalesce
(SURVEY J8).

J5 — the reference reserves ``canonical_id`` + ``deduplication{is_canonical,
merged_from_ids, merge_log}`` (helpers/schemas.py:154-159, populated at
schema_adapter_enhanced.py:540-544) for linking the same real-world event
scraped from multiple platforms. The Spark implementation groups events by a
normalized candidate key (title + event date + venue), elects a canonical
row per group (best quality, then earliest id for determinism), and rewrites
the dedup section with the full member list.

Shuffle profile: ONE shuffle on the candidate key (the groupBy and the
window share partitioning). No self-join is needed — a window over the key
both elects the canonical and lets every member learn it.

J8 — multi-extractor precedence merge (mono_ticketmaster.py:395-416):
JSON-LD preferred, then wordpress/meta/text-pattern fallbacks, per field —
a ``coalesce`` across extraction-source columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def candidate_key(
    title: Column, start_date: Column, venue_name: Column
) -> Column:
    """Normalized (title, date, venue) blocking key for entity resolution.

    Engine spec, not a reference-parity strip site: the reference dedups on
    raw ``source_url + start_date`` (database/data_migration.py:88-91), so
    the ASCII-space ``trim`` here is this engine's own blocking-key
    definition, mirrored verbatim by the q40 oracle SQL.
    """
    return F.sha2(
        F.concat_ws(
            "|",
            F.lower(F.trim(F.coalesce(title, F.lit("")))),
            F.coalesce(F.to_date(F.try_to_timestamp(start_date)).cast("string"), F.lit("")),
            F.lower(F.trim(F.coalesce(venue_name, F.lit("")))),
        ),
        256,
    )


def canonicalize(events: DataFrame) -> DataFrame:
    """Assign canonical_id + deduplication section across sources.

    Canonical election: highest ``data_quality.overall_score``, tie-broken by
    smallest event_id (deterministic). Members record the canonical id and
    the merged-from list; the canonical row carries all other members in
    ``merged_from_ids``.
    """
    key = candidate_key(
        F.col("title"), F.col("datetime.start_date"), F.col("venue.name")
    ).alias("__ck")
    df = events.withColumn("__ck", key)
    w = Window.partitionBy("__ck")
    elect = Window.partitionBy("__ck").orderBy(
        F.col("data_quality.overall_score").desc_nulls_last(), F.col("event_id").asc()
    )
    df = (
        df.withColumn("__rank", F.row_number().over(elect))
        .withColumn("__members", F.sort_array(F.collect_set("event_id").over(w)))
        .withColumn("__canonical", F.first("event_id").over(elect))
    )
    is_canon = F.col("__rank") == 1
    merged_from = F.filter(F.col("__members"), lambda m: m != F.col("event_id"))
    return (
        df.withColumn("canonical_id", F.col("__canonical"))
        .withColumn(
            "deduplication",
            F.struct(
                is_canon.alias("is_canonical"),
                F.when(is_canon, merged_from)
                .otherwise(F.array().cast("array<string>"))
                .alias("merged_from_ids"),
                F.when(
                    is_canon & (F.size(merged_from) > 0),
                    F.array(
                        F.concat(
                            F.lit("merged "),
                            F.size(merged_from).cast("string"),
                            F.lit(" duplicate(s) by title+date+venue"),
                        )
                    ),
                )
                .otherwise(F.array().cast("array<string>"))
                .alias("merge_log"),
            ),
        )
        .drop("__ck", "__rank", "__members", "__canonical")
    )


def canonical_only(events: DataFrame) -> DataFrame:
    """The deduplicated view: one (best) row per real-world event."""
    return canonicalize(events).filter(F.col("deduplication.is_canonical"))


def extraction_coalesce(df: DataFrame, field_sources: dict[str, list[str]]) -> DataFrame:
    """J8 — per-field precedence merge across extraction-layer columns.

    ``field_sources`` maps output field → ordered source columns (first
    non-null wins), e.g. ``{"title": ["jsonld_title", "wp_title",
    "meta_title", "pattern_title"]}`` mirroring the reference's
    ``{**pattern, **wp, **meta}`` + JSON-LD-preferred precedence.
    """
    out = df
    for field, sources in field_sources.items():
        out = out.withColumn(field, F.coalesce(*[F.col(s) for s in sources]))
    return out
