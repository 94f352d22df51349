"""Quality scoring engine as native column expressions
(SURVEY D1/D2, D6, A10, A13, F18, F21, R1-R3).

Re-implements the reference's QualityScorer (database/quality_scorer.py:15-452)
branch-for-branch as JVM-side expressions — no UDFs — so scoring 10^9 events
is a single codegen'd projection.

§2 coverage in this module: A10 (weighted overall average), A13 (array_min
over available tiers), F6 (date sanity windows), F18 (title heuristics),
F21 (rounding), R1 (per-element acts scoring via HOFs), R2 (tier validity
proportion + cheapest + currency), R3 (validation-flag flattening).

Bit-parity notes:
- additions accumulate in the same order as the reference's ``score += ...``
  statements, so float results are identical;
- the overall score uses ``python_round`` (binary-value nearest with exact
  ties-to-even) — neither Spark ``round`` nor ``bround`` matches Python's
  ``round(x, 3)`` on all doubles (bround half-evens the shortest decimal
  repr: bround(0.3425, 3) = 0.342 but Python gives 0.343);
- "empty section" (Python falsy dict) maps to a NULL struct; arrays count as
  missing when NULL or empty, mirroring ``not acts_data``.

Each ``score_*`` returns ``struct(score double, flags array<string>)``;
``data_quality_struct`` composes them into the schema's ``data_quality``
shape (quality_scorer.py:79-91).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import Column
from pyspark.sql import functions as F

FIELD_WEIGHTS = {  # quality_scorer.py:21-27
    "title": 0.25,
    "venue": 0.20,
    "datetime": 0.25,
    "acts": 0.15,
    "ticketing": 0.15,
}

KNOWN_VENUES = ["Hï Ibiza", "Ushuaïa", "Pacha", "Amnesia", "DC10", "Privilege"]


def _truthy(c: Column) -> Column:
    """Python string truthiness: non-null and non-empty."""
    return c.isNotNull() & (c != "")


def _flag(cond: Column, name: str) -> Column:
    """Conditional single-element flag array."""
    return F.when(cond, F.array(F.lit(name))).otherwise(F.array().cast("array<string>"))


def _cat_flags(*parts: Column) -> Column:
    return F.concat(*parts)


def _empty_flags() -> Column:
    return F.array().cast("array<string>")


# ----------------------------------------------------------------------
# Title (quality_scorer.py:93-139)


def score_title_info(title: Column) -> Column:
    missing = title.isNull() | (title == "")
    length = F.length(title)
    len_ok = length >= 5
    has_date = title.rlike(r"\d{1,2}[/-]\d{1,2}[/-]\d{2,4}|\d{4}")
    words = F.when(F.trim(title) == "", F.lit(0)).otherwise(F.size(F.split(F.trim(title), r"\s+")))
    multi_word = words >= 2
    specials = F.length(F.regexp_replace(title, r"[a-zA-Z0-9\s&-]", ""))
    special_ok = (specials / length) < 0.2
    first = F.substring(title, 1, 1)
    first_upper = (first == F.upper(first)) & (first != F.lower(first))
    all_upper = (title == F.upper(title)) & (title != F.lower(title))
    cap_ok = first_upper & ~all_upper

    score = (
        F.when(len_ok, 0.3).otherwise(0.0)
        + F.when(has_date, 0.2).otherwise(0.0)
        + F.when(multi_word, 0.2).otherwise(0.0)
        + F.when(special_ok, 0.2).otherwise(0.0)
        + F.when(cap_ok, 0.1).otherwise(0.0)
    )
    flags = _cat_flags(_flag(~len_ok, "title_too_short"), _flag(~special_ok, "excessive_special_chars"))
    return F.when(
        missing, F.struct(F.lit(0.0).alias("score"), F.array(F.lit("missing_title")).alias("flags"))
    ).otherwise(F.struct(F.least(score, F.lit(1.0)).alias("score"), flags.alias("flags")))


# ----------------------------------------------------------------------
# Venue (quality_scorer.py:141-191)


def score_venue_info(venue: Column) -> Column:
    name = venue["name"]
    addr = venue["address"]
    coords = venue["coordinates"]

    has_name = _truthy(name)
    known = F.coalesce(
        F.array_contains(F.array(*[name.contains(v) for v in KNOWN_VENUES]), True), F.lit(False)
    )
    has_full_addr = _truthy(addr["full_address"])
    has_street_city = _truthy(addr["street"]) & _truthy(addr["city"])
    has_city = _truthy(addr["city"])
    city_ibiza = F.coalesce(F.lower(addr["city"]).contains("ibiza"), F.lit(False))

    coords_arr = coords["coordinates"]
    coords_present = (
        F.coalesce(coords["type"] == "Point", F.lit(False))
        & coords_arr.isNotNull()
        & (F.size(coords_arr) > 0)
    )
    coords_len2 = F.size(coords_arr) == 2
    # F.get is OOB-null-safe; plain [i] indexing throws under ANSI mode even
    # behind a guard (codegen subexpression elimination evaluates it eagerly)
    lon, lat = F.get(coords_arr, 0), F.get(coords_arr, 1)
    in_ibiza = F.coalesce(
        (lon >= 1.2) & (lon <= 1.6) & (lat >= 38.8) & (lat <= 39.1), F.lit(False)
    )

    score = (
        F.when(has_name, 0.3).otherwise(0.0)
        + F.when(has_name & known, 0.1).otherwise(0.0)
        + F.when(has_full_addr, 0.2).when(has_street_city, 0.15).otherwise(0.0)
        + F.when(has_city, 0.2).otherwise(0.0)
        + F.when(has_city & city_ibiza, 0.1).otherwise(0.0)
        + F.when(coords_present & coords_len2 & in_ibiza, 0.2).otherwise(0.0)
    )
    flags = _cat_flags(
        _flag(~has_name, "missing_venue_name"),
        _flag(~(has_full_addr | has_street_city), "missing_address_details"),
        _flag(~has_city, "missing_city"),
        _flag(coords_present & coords_len2 & ~in_ibiza, "coordinates_outside_ibiza"),
        _flag(coords_present & ~coords_len2, "invalid_coordinates_format"),
        _flag(~coords_present, "missing_coordinates"),
    )
    return F.when(
        venue.isNull(),
        F.struct(F.lit(0.0).alias("score"), F.array(F.lit("missing_venue_data")).alias("flags")),
    ).otherwise(F.struct(F.least(score, F.lit(1.0)).alias("score"), flags.alias("flags")))


# ----------------------------------------------------------------------
# Datetime (quality_scorer.py:193-266)


def score_datetime_info(dt: Column, now: datetime | None = None) -> Column:
    now = now or datetime.now(timezone.utc)
    now_lit = F.lit(now.replace(tzinfo=None)).cast("timestamp")
    past_cutoff = F.lit(now.replace(tzinfo=None) - timedelta(days=30)).cast("timestamp")
    future_cutoff = F.lit(now.replace(tzinfo=None) + timedelta(days=2 * 365)).cast("timestamp")
    _ = now_lit  # cutoffs carry the comparison; kept for clarity

    start_str = dt["start_date"]
    end_str = dt["end_date"]
    has_start = _truthy(start_str)
    start_ts = F.try_to_timestamp(start_str)
    start_valid = start_ts.isNotNull()
    too_past = start_ts < past_cutoff
    too_future = start_ts > future_cutoff
    reasonable = start_valid & ~too_past & ~too_future

    has_end = _truthy(end_str)
    end_ts = F.try_to_timestamp(end_str)
    end_valid = end_ts.isNotNull()
    end_before_start = end_valid & start_valid & (end_ts < start_ts)
    end_ok = end_valid & start_valid & (end_ts >= start_ts)

    tz = dt["timezone"]
    has_tz = _truthy(tz)
    tz_bonus = F.coalesce(tz.isin("Europe/Madrid", "CET", "CEST"), F.lit(False))

    rec = dt["recurring"]
    is_rec = F.coalesce(rec["is_recurring"], F.lit(False))
    has_pattern = _truthy(rec["pattern_description"])

    score = (
        F.when(has_start, 0.4).otherwise(0.0)
        + F.when(has_start & reasonable, 0.1).otherwise(0.0)
        + F.when(has_end, 0.1).otherwise(0.0)
        + F.when(has_end & has_start & end_ok, 0.05).otherwise(0.0)
        + F.when(has_tz, 0.2).otherwise(0.0)
        + F.when(has_tz & tz_bonus, 0.05).otherwise(0.0)
        + F.when(is_rec, 0.05).otherwise(0.0)
        + F.when(is_rec & has_pattern, 0.1).otherwise(0.0)
    )
    flags = _cat_flags(
        _flag(has_start & start_valid & too_past, "date_too_far_past"),
        _flag(has_start & start_valid & ~too_past & too_future, "date_too_far_future"),
        _flag(has_start & ~start_valid, "invalid_start_date_format"),
        _flag(~has_start, "missing_start_date"),
        _flag(has_end & has_start & end_before_start, "end_date_before_start_date"),
        _flag(has_end & has_start & ~end_valid, "invalid_end_date_format"),
        _flag(~has_tz, "missing_timezone"),
        _flag(is_rec & ~has_pattern, "missing_recurring_pattern_description"),
    )
    return F.when(
        dt.isNull(),
        F.struct(F.lit(0.0).alias("score"), F.array(F.lit("missing_datetime_data")).alias("flags")),
    ).otherwise(F.struct(F.least(score, F.lit(1.0)).alias("score"), flags.alias("flags")))


# ----------------------------------------------------------------------
# Acts (quality_scorer.py:268-318)


def score_acts_info(acts: Column) -> Column:
    missing = acts.isNull() | (F.size(acts) == 0)
    n = F.size(acts)
    # component >= 0.6 iff the act has a name (0.6 from name alone; max 0.4 without)
    valid = F.size(F.filter(acts, lambda a: _truthy(a["act_name"])))
    nameless = F.filter(acts, lambda a: ~_truthy(a["act_name"]))
    nameless_flags = F.transform(nameless, lambda a: F.lit("missing_act_name_in_list"))

    score = (
        F.lit(0.4)
        + F.when(valid > 0, F.lit(0.4) * (valid / n)).otherwise(0.0)
        + F.when(n >= 3, 0.2).when(n >= 2, 0.1).otherwise(0.0)
    )
    return F.when(
        missing,
        F.struct(F.lit(0.0).alias("score"), F.array(F.lit("missing_acts_data")).alias("flags")),
    ).otherwise(
        F.struct(F.least(score, F.lit(1.0)).alias("score"), nameless_flags.alias("flags"))
    )


# ----------------------------------------------------------------------
# Ticketing (quality_scorer.py:320-388)


def score_ticketing_info(t: Column) -> Column:
    is_free = t["is_free"]
    free_true = F.coalesce(is_free == True, F.lit(False))  # noqa: E712
    free_false = F.coalesce(is_free == False, F.lit(False))  # noqa: E712
    free_missing = is_free.isNull()

    url = t["tickets_url"]
    has_url = _truthy(url)
    url_ok = url.startswith("http://") | url.startswith("https://")

    tiers = t["tiers"]
    has_tiers = tiers.isNotNull() & (F.size(tiers) > 0)
    n_tiers = F.size(tiers)

    def tier_valid(x):
        return _truthy(x["tier_name"]) & x["tier_price"].isNotNull() & _truthy(x["currency"])

    valid_tiers_arr = F.filter(tiers, tier_valid)
    n_valid = F.size(valid_tiers_arr)
    cheapest = F.array_min(F.transform(valid_tiers_arr, lambda x: x["tier_price"]))
    currency_found = F.try_element_at(valid_tiers_arr, F.lit(1))["currency"]

    age = t["age_restriction"]
    has_age = F.coalesce(
        age["minimum_age"].isNotNull() | _truthy(age["restriction_type"]), F.lit(False)
    )

    score = (
        F.when(free_true, 0.5).when(free_false, 0.1).otherwise(0.0)
        + F.when(has_url, 0.2).otherwise(0.0)
        + F.when(has_url & url_ok, 0.05).otherwise(0.0)
        + F.when(has_tiers, 0.2).otherwise(0.0)
        + F.when(has_tiers & (n_valid > 0), F.lit(0.1) * (n_valid / n_tiers)).otherwise(0.0)
        + F.when(has_tiers & (n_valid > 0) & (currency_found == "EUR"), 0.05).otherwise(0.0)
        + F.when(
            has_tiers & (n_valid > 0) & (cheapest >= 5) & (cheapest <= 500), 0.05
        ).otherwise(0.0)
        + F.when(has_age, 0.05).otherwise(0.0)
    )
    flags = _cat_flags(
        _flag(free_missing, "missing_is_free_status"),
        _flag(has_url & ~url_ok, "invalid_tickets_url"),
        _flag(~has_url & free_false, "missing_tickets_url_for_paid_event"),
        _flag(has_tiers & (n_valid > 0) & (cheapest > 500), "very_high_ticket_price"),
        _flag(
            has_tiers & (n_valid > 0) & (cheapest < 5) & (cheapest > 0), "very_low_ticket_price"
        ),
        _flag(~has_tiers & free_false, "missing_tiers_for_paid_event_or_invalid_format"),
    )
    return F.when(
        t.isNull(),
        F.struct(F.lit(0.0).alias("score"), F.array(F.lit("missing_ticketing_data")).alias("flags")),
    ).otherwise(F.struct(F.least(score, F.lit(1.0)).alias("score"), flags.alias("flags")))


# ----------------------------------------------------------------------
# Composition (quality_scorer.py:29-91, 390-404)


def python_round(c: Column, scale: int) -> Column:
    """Python ``round()`` semantics as an expression.

    Neither Spark builtin matches Python: ``bround``/``round`` half-even /
    half-up the SHORTEST DECIMAL REPR (bround(0.3425, 3) = 0.342 although
    the binary value is 0.34250000000000002 and Python correctly gives
    0.343). This scaled-floor formula decides on the binary value: exact
    .5 fraction → ties-to-even, else nearest. Matches Python on all probe
    cases (0.3425→0.343, 0.125→0.12, 2.675→2.67); the only residual
    divergence is when the ×10^scale multiplication itself rounds onto an
    exact .5 boundary (no representable example at scale 3 is known).
    """
    m = float(10**scale)
    scaled = c * F.lit(m)
    fl = F.floor(scaled)
    frac = scaled - fl
    tie_even = F.when(fl % 2 == 0, fl).otherwise(fl + 1)
    rounded = (
        F.when(frac == 0.5, tie_even).when(frac > 0.5, fl + 1).otherwise(fl)
    )
    return rounded.cast("double") / F.lit(m)


def overall_score(
    title_s: Column, venue_s: Column, datetime_s: Column, acts_s: Column, ticketing_s: Column
) -> Column:
    """Weighted overall, accumulated in reference dict order, Python-round
    semantics to 3 — quality_scorer.py:390-404."""
    w = FIELD_WEIGHTS
    total = (
        title_s * w["title"]
        + venue_s * w["venue"]
        + datetime_s * w["datetime"]
        + acts_s * w["acts"]
        + ticketing_s * w["ticketing"]
    )
    total_weight = (
        F.lit(w["title"]) + F.lit(w["venue"]) + F.lit(w["datetime"]) + F.lit(w["acts"]) + F.lit(w["ticketing"])
    )
    return python_round(total / total_weight, 3)


def _tag_flags(field: str, flags: Column) -> Column:
    return F.transform(
        flags, lambda issue: F.struct(F.lit(field).alias("field"), issue.alias("issue"))
    )


def data_quality_struct(
    title: Column,
    venue: Column,
    dt: Column,
    acts: Column,
    ticketing: Column,
    now: datetime | None = None,
) -> Column:
    """Full data_quality struct for an event row (quality_scorer.py:29-91)."""
    ts = score_title_info(title)
    vs = score_venue_info(venue)
    ds = score_datetime_info(dt, now)
    as_ = score_acts_info(acts)
    tks = score_ticketing_info(ticketing)
    fqs = F.struct(
        ts["score"].alias("title"),
        vs["score"].alias("venue"),
        ds["score"].alias("datetime"),
        as_["score"].alias("acts"),
        tks["score"].alias("ticketing"),
    )
    all_flags = F.concat(
        _tag_flags("title", ts["flags"]),
        _tag_flags("venue", vs["flags"]),
        _tag_flags("datetime", ds["flags"]),
        _tag_flags("acts", as_["flags"]),
        _tag_flags("ticketing", tks["flags"]),
    )
    return F.struct(
        overall_score(ts["score"], vs["score"], ds["score"], as_["score"], tks["score"]).alias(
            "overall_score"
        ),
        fqs.alias("field_quality_scores"),
        all_flags.alias("validation_flags"),
        F.struct(
            F.lit(False).alias("is_verified"),
            F.lit(None).cast("string").alias("verified_by"),
            F.lit(None).cast("string").alias("verified_at"),
        ).alias("manual_verification"),
    )


# ----------------------------------------------------------------------
# Summary / recommendation (quality_scorer.py:412-451, SURVEY D6)


def quality_level(overall: Column) -> Column:
    return (
        F.when(overall >= 0.9, "Excellent")
        .when(overall >= 0.8, "Good")
        .when(overall >= 0.7, "Fair")
        .when(overall >= 0.6, "Poor")
        .otherwise("Very Poor")
    )


def weak_fields(fqs: Column) -> Column:
    """Field names scoring < 0.7, in schema order (quality_scorer.py:430)."""
    pairs = F.array(
        *[
            F.struct(F.lit(f).alias("field"), fqs[f].alias("score"))
            for f in ("title", "venue", "datetime", "acts", "ticketing")
        ]
    )
    return F.transform(F.filter(pairs, lambda p: p["score"] < 0.7), lambda p: p["field"])
