"""Unified event schema as an explicit StructType (schema-on-write contract).

Mirrors the reference's unified event document (helpers/schemas.py:12-180,
SURVEY §1.1): ~11 nested sections. Dates are canonicalized to TimestampType
UTC in the engine (the reference stores ISO strings and compares them
lexicographically — equivalent ordering once UTC-normalized); the raw string
is preserved in ``*_raw`` columns for provenance.

Open maps (social_links, popularity_metrics, raw_data) are
MapType(string,string); GeoJSON points keep the reference layout
(type + [lon, lat]) plus derived ``lon``/``lat`` columns added by refine.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

S = StringType()
D = DoubleType()
B = BooleanType()
I = IntegerType()  # noqa: E741
TS = TimestampType()
SMAP = MapType(StringType(), StringType())


def _f(name, dtype, nullable=True):
    return StructField(name, dtype, nullable)


COORDINATES = StructType(
    [
        _f("type", S),  # "Point"
        _f("coordinates", ArrayType(D)),  # [lon, lat]
    ]
)

ADDRESS = StructType(
    [
        _f("street", S),
        _f("city", S),
        _f("state", S),
        _f("country", S),
        _f("postal_code", S),
        _f("full_address", S),
    ]
)

SET_TIME = StructType([_f("start", S), _f("end", S), _f("duration_minutes", I)])

STAGE_ACT = StructType(
    [
        _f("act_id", S),
        _f("set_time", SET_TIME),
        _f("billing_order", I),
        _f("is_headliner", B),
    ]
)

STAGE = StructType(
    [
        _f("stage_id", S),
        _f("stage_name", S),
        _f("host", StructType([_f("host_name", S), _f("host_id", S)])),
        _f("stage_genres", ArrayType(S)),
        _f("acts", ArrayType(STAGE_ACT)),
    ]
)

VENUE = StructType(
    [
        _f("venue_id", S),
        _f("name", S),
        _f("address", ADDRESS),
        _f("coordinates", COORDINATES),
        _f("venue_type", S),
        _f("total_capacity", I),
        _f("social_links", SMAP),
        _f("stages", ArrayType(STAGE)),
    ]
)

ACT = StructType(
    [
        _f("act_id", S),
        _f("act_name", S),
        _f("act_type", S),
        _f("genres", ArrayType(S)),
        _f("styles", ArrayType(S)),
        _f("social_media", SMAP),
        _f("popularity_metrics", SMAP),
    ]
)

RECURRING = StructType(
    [
        _f("is_recurring", B),
        _f("frequency", S),
        _f("pattern_description", S),
        _f("end_recurrence", S),
    ]
)

DATETIME_SECTION = StructType(
    [
        _f("start_date", S),  # raw ISO string (reference-compatible)
        _f("end_date", S),
        _f("timezone", S),
        _f("doors_open", S),
        _f("last_entry", S),
        _f("is_all_day", B),
        _f("duration_hours", D),
        _f("recurring", RECURRING),
    ]
)

CONTENT = StructType(
    [
        _f("short_description", S),
        _f("full_description", S),
        _f("keywords", ArrayType(S)),
        _f("hashtags", ArrayType(S)),
    ]
)

MUSIC = StructType(
    [
        _f("primary_genre", S),
        _f("sub_genres", ArrayType(S)),
        _f("mood_tags", ArrayType(S)),
        _f("energy_level", I),
        _f("genre_confidence", D),
    ]
)

TIER = StructType(
    [
        _f("tier_name", S),
        _f("tier_price", D),
        _f("currency", S),
        _f("sale_start", S),
        _f("sale_end", S),
        _f("is_sold_out", B),
        _f("is_nearly_sold_out", B),
    ]
)

AGE_RESTRICTION = StructType([_f("minimum_age", I), _f("restriction_type", S)])

TICKETING = StructType(
    [
        _f("tickets_url", S),
        _f("is_free", B),
        _f("age_restriction", AGE_RESTRICTION),
        _f("promos", ArrayType(S)),
        _f("tiers", ArrayType(TIER)),
        _f("external_platforms", ArrayType(S)),
    ]
)

SCRAPING_METADATA = StructType(
    [
        _f("source_platform", S),
        _f("source_url", S),
        _f("source_event_id", S),
        _f("first_scraped", S),
        _f("last_scraped", S),
        _f("scraper_version", S),
        _f("raw_data", SMAP),
    ]
)

VALIDATION_FLAG = StructType([_f("field", S), _f("issue", S)])

FIELD_QUALITY_SCORES = StructType(
    [
        _f("title", D),
        _f("venue", D),
        _f("datetime", D),
        _f("acts", D),
        _f("ticketing", D),
    ]
)

DATA_QUALITY = StructType(
    [
        _f("overall_score", D),
        _f("field_quality_scores", FIELD_QUALITY_SCORES),
        _f("validation_flags", ArrayType(VALIDATION_FLAG)),
        _f(
            "manual_verification",
            StructType([_f("is_verified", B), _f("verified_by", S), _f("verified_at", S)]),
        ),
    ]
)

DEDUPLICATION = StructType(
    [
        _f("is_canonical", B),
        _f("merged_from_ids", ArrayType(S)),
        _f("merge_log", ArrayType(S)),
    ]
)

ANALYTICS = StructType(
    [
        _f("related_events", ArrayType(S)),
        _f("audience_profile_tags", ArrayType(S)),
        _f("influence_score", D),
        _f("views", I),
        _f("saves", I),
        _f("clicks_to_tickets", I),
    ]
)

SYSTEM_FLAGS = StructType(
    [
        _f("is_featured", B),
        _f("is_hidden", B),
        _f("needs_refresh", B),
        _f("refresh_requested_at", S),
    ]
)

UNIFIED_EVENT = StructType(
    [
        _f("event_id", S, nullable=False),
        _f("canonical_id", S),
        _f("title", S),
        _f("type", S),  # club_night | festival | concert | day_party
        _f("status", S),  # scheduled | cancelled | postponed | sold_out
        _f("datetime", DATETIME_SECTION),
        _f("venue", VENUE),
        _f("acts", ArrayType(ACT)),
        _f("content", CONTENT),
        _f("music", MUSIC),
        _f("ticketing", TICKETING),
        _f("scraping_metadata", SCRAPING_METADATA),
        _f("data_quality", DATA_QUALITY),
        _f("deduplication", DEDUPLICATION),
        _f("analytics", ANALYTICS),
        _f("created_at", S),
        _f("updated_at", S),
        _f("system_flags", SYSTEM_FLAGS),
    ]
)

# Gold-layer derived flat columns added by refine (query accelerators;
# reference's 16 secondary indexes become these + partitioning, SURVEY §4)
GOLD_DERIVED_COLUMNS = (
    "start_ts",  # timestamp parsed from datetime.start_date (UTC)
    "end_ts",
    "venue_name",
    "city",
    "overall_score",
    "lon",
    "lat",
    "search_blob",
)
