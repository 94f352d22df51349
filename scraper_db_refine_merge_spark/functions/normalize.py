"""Dictionary normalizations (SURVEY F15-F17) — venue names, genres,
timezone-from-location.

Small literal maps become ``create_map`` lookups (broadcast-free: the map is
a literal inside the expression, shipped with the task binary). For maps that
grow beyond literals, the same functions accept a DataFrame to broadcast-join
instead.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# schema_adapter_enhanced.py:272-288
VENUE_MAP = {
    "hi ibiza": "Hï Ibiza",
    "hi": "Hï Ibiza",
    "ushuaia": "Ushuaïa",
    "pacha": "Pacha",
    "amnesia": "Amnesia",
    "dc10": "DC10",
    "dc-10": "DC10",
    "privilege": "Privilege",
    "eden": "Eden",
    "es paradis": "Es Paradis",
}

# schema_adapter_enhanced.py:343-361
GENRE_MAP = {
    "techno": "Techno",
    "tech-house": "Tech House",
    "tech house": "Tech House",
    "house": "House",
    "deep house": "Deep House",
    "deep-house": "Deep House",
    "progressive": "Progressive House",
    "progressive house": "Progressive House",
    "trance": "Trance",
    "melodic techno": "Melodic Techno",
    "melodic-techno": "Melodic Techno",
    "minimal": "Minimal",
    "drum & bass": "Drum & Bass",
    "dnb": "Drum & Bass",
    "d&b": "Drum & Bass",
}

# schema_adapter_enhanced.py:363-373 (insertion order is match priority)
TIMEZONE_MAP = {
    "ibiza": "Europe/Madrid",
    "london": "Europe/London",
    "berlin": "Europe/Berlin",
    "new york": "America/New_York",
    "los angeles": "America/Los_Angeles",
    "tokyo": "Asia/Tokyo",
    "sydney": "Australia/Sydney",
}


def _literal_map(d: dict[str, str]) -> Column:
    return F.create_map(*[F.lit(x) for x in chain.from_iterable(d.items())])


def _title_case(c: Column) -> Column:
    """Python ``str.title()`` approximation: initcap within hyphen segments
    (initcap alone would lowercase after '-')."""
    return F.array_join(F.transform(F.split(c, "-"), F.initcap), "-")


def normalize_venue_name(venue: Column) -> Column:
    """Lowercase-key lookup, identity fallback (F15)."""
    return F.coalesce(F.element_at(_literal_map(VENUE_MAP), F.lower(F.trim(venue))), venue)


def normalize_genre(genre: Column) -> Column:
    """Lookup else title-case (F16, schema_adapter_enhanced.py:375-381)."""
    key = F.lower(F.trim(genre))
    return F.when(genre.isNull() | (genre == ""), F.lit("")).otherwise(
        F.coalesce(F.element_at(_literal_map(GENRE_MAP), key), _title_case(genre))
    )


def normalize_genres(genres: Column) -> Column:
    """Elementwise genre normalization over an array (HOF, no explode)."""
    key = lambda g: F.lower(F.trim(g))  # noqa: E731
    m = _literal_map(GENRE_MAP)
    return F.transform(genres, lambda g: F.coalesce(F.element_at(m, key(g)), _title_case(g)))


def timezone_from_location(location: Column) -> Column:
    """City-substring → IANA tz, default UTC (F17)."""
    loc = F.lower(F.coalesce(location, F.lit("")))
    expr = F.lit("UTC")
    for city, tz in reversed(list(TIMEZONE_MAP.items())):
        expr = F.when(loc.contains(city), tz).otherwise(expr)
    return expr


def normalize_with_mapping_table(
    df: DataFrame, col: str, mapping: DataFrame, key_col: str = "key", value_col: str = "value"
) -> DataFrame:
    """Large-dictionary variant: broadcast-join a mapping table and coalesce.
    The scale path when the dictionary outgrows a literal map."""
    joined = df.join(
        F.broadcast(mapping.withColumnRenamed(key_col, "__k").withColumnRenamed(value_col, "__v")),
        F.lower(F.trim(F.col(col))) == F.col("__k"),
        "left",
    )
    return joined.withColumn(col, F.coalesce(F.col("__v"), F.col(col))).drop("__k", "__v")
