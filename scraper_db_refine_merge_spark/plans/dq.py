"""q56 — the DQ rule engine (SURVEY A14/D5) under the oracle gate.

VERDICT r1 item 2: the 32-rule catalog (functions/dq_rules.py, mirroring the
reference docs/data_quality_rules.md:30-86 and the rollup design
docs/dq_assessment_script_design.md:121-147) was the only operator family
with zero hash verification. Here a unified-shaped events table is
constructed deterministically from ``documents`` (the q50/q52/q53 pattern)
with pass AND fail cases for every rule, evaluated with the SAME
``evaluate_rules`` + ``rule_rollup`` the engine ships, and mirrored
predicate-for-predicate in DuckDB SQL. The oracle's per-rule metadata
(severity/field) is generated FROM the RULES registry, so any drift between
the registry and the oracle is itself a gate failure.

A fixed ``now`` (2026-01-01 UTC) keeps CP003/DF001/DF002 deterministic:
window literals are [-1y, +3y] = [2025-01-01, 2028-12-31], freshness cut
2025-12-25, future-event cut 2025-12-02.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dq_rules import RULES, evaluate_rules, rule_rollup
from ..sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}

_Q56_NOW = datetime(2026, 1, 1, tzinfo=timezone.utc)

_URL = r"(?i)^https?://[^\s/]+\.[^\s/]+"
_TZ = r"^[A-Za-z]+/[A-Za-z_+-]+$|^UTC$|^CET$|^CEST$"

_TIERS_SQL_T = "STRUCT(tier_name VARCHAR, tier_price DOUBLE, currency VARCHAR)[]"
_ACTS_SQL_T = "STRUCT(act_name VARCHAR)[]"

# Flat construction shared by both engines: every rule gets pass and fail
# rows. doc_id moduli are chosen so failure populations are independent-ish.
_Q56_CASES = f"""
    SELECT doc_id,
        CASE WHEN doc_id % 50 = 49 THEN ''
             WHEN doc_id % 23 = 5 THEN 'dup_' || CAST(doc_id % 46 AS VARCHAR)
             ELSE 'ev_' || CAST(doc_id AS VARCHAR) END AS event_id,
        CASE WHEN doc_id % 13 = 0 THEN NULL
             WHEN doc_id % 13 = 1 THEN 'tbc'
             WHEN doc_id % 13 = 2 THEN repeat('x', 501)
             ELSE 'Event ' || CAST(doc_id AS VARCHAR) END AS title,
        CASE WHEN doc_id % 11 = 0 THEN NULL
             WHEN doc_id % 11 = 1 THEN 'not-a-date'
             WHEN doc_id % 11 = 2 THEN '2020-01-01 00:00:00'
             WHEN doc_id % 11 = 3 THEN '2031-01-01 00:00:00'
             ELSE '2026-' || lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0')
                  || '-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                  || ' 23:00:00' END AS d_start,
        CASE WHEN doc_id % 17 = 0 THEN '2019-12-31 00:00:00'
             WHEN doc_id % 17 = 1 THEN '2099-01-01 00:00:00'
             ELSE NULL END AS d_end,
        CASE WHEN doc_id % 5 = 0 THEN 'Europe/Madrid'
             WHEN doc_id % 5 = 1 THEN 'UTC'
             WHEN doc_id % 5 = 2 THEN 'NotATZ!!!'
             ELSE NULL END AS d_tz,
        CASE WHEN doc_id % 9 = 0 THEN NULL
             WHEN doc_id % 9 = 1 THEN 'ftp://bad.example.com/x'
             ELSE 'https://events.example.com/e/' || CAST(doc_id AS VARCHAR) END AS src_url,
        CASE WHEN doc_id % 21 = 20 THEN '' ELSE 'platform_a' END AS platform,
        '2025-12-01 10:00:00' AS first_scraped,
        CASE WHEN doc_id % 8 = 0 THEN NULL
             WHEN doc_id % 8 = 1 THEN '2025-11-01 00:00:00'
             ELSE '2025-12-30 12:00:00' END AS last_scraped,
        CASE WHEN doc_id % 6 = 0 THEN NULL
             WHEN doc_id % 6 = 1 THEN 'tbc'
             ELSE 'Venue ' || CAST(doc_id AS VARCHAR) END AS v_name,
        CASE WHEN doc_id % 12 = 0 THEN 'Carrer Example 5, 07800 Ibiza'
             ELSE NULL END AS v_full,
        CASE WHEN doc_id % 10 = 0 THEN 'Ibiza Town'
             WHEN doc_id % 10 = 1 THEN 'Palma'
             ELSE NULL END AS v_city,
        CASE WHEN doc_id % 15 = 0 THEN 'France'
             WHEN doc_id % 15 = 1 THEN 'Spain'
             ELSE NULL END AS v_country,
        CASE WHEN doc_id % 14 = 0 THEN CAST([200.0, 38.9] AS DOUBLE[])
             WHEN doc_id % 14 = 1 THEN CAST([1.4] AS DOUBLE[])
             WHEN doc_id % 14 = 2 THEN CAST([1.4, 38.9] AS DOUBLE[])
             ELSE NULL END AS coords,
        CASE WHEN doc_id % 16 = 0 THEN ['not a url']
             WHEN doc_id % 16 = 1 THEN ['https://instagram.com/x']
             ELSE CAST([] AS VARCHAR[]) END AS social_vals,
        CASE WHEN doc_id % 4 = 0 THEN NULL
             ELSE 'Description for event ' || CAST(doc_id AS VARCHAR) END AS full_desc,
        CASE WHEN doc_id % 8 = 0 THEN 'Short ' || CAST(doc_id AS VARCHAR)
             ELSE NULL END AS short_desc,
        CASE WHEN doc_id % 3 = 0 THEN ['k1', 'k2']
             ELSE CAST([] AS VARCHAR[]) END AS keywords,
        CASE WHEN doc_id % 6 = 1 THEN ['#h']
             ELSE CAST([] AS VARCHAR[]) END AS hashtags,
        CASE WHEN doc_id % 12 = 0 THEN TRUE
             WHEN doc_id % 12 = 1 THEN FALSE
             ELSE CAST(NULL AS BOOLEAN) END AS is_free,
        CASE WHEN doc_id % 18 = 0 THEN [{{'tier_name': 'GA', 'tier_price': CAST(-5.0 AS DOUBLE), 'currency': 'EUR'}}]
             WHEN doc_id % 18 = 1 THEN [{{'tier_name': 'GA', 'tier_price': CAST(20000.0 AS DOUBLE), 'currency': 'EUR'}}]
             WHEN doc_id % 18 = 2 THEN [{{'tier_name': 'GA', 'tier_price': CAST(0.5 AS DOUBLE), 'currency': 'EUR'}}]
             WHEN doc_id % 18 = 3 THEN [{{'tier_name': 'GA', 'tier_price': CAST(25.0 AS DOUBLE), 'currency': 'ZZZ'}}]
             WHEN doc_id % 18 = 4 THEN [{{'tier_name': 'GA', 'tier_price': CAST(25.0 AS DOUBLE), 'currency': 'EUR'}}]
             ELSE CAST([] AS {_TIERS_SQL_T}) END AS tiers,
        CASE WHEN doc_id % 19 = 0 THEN 'ftp://tickets.bad'
             WHEN doc_id % 19 = 1 THEN 'https://tix.example.com/' || CAST(doc_id AS VARCHAR)
             ELSE NULL END AS tickets_url,
        CASE WHEN doc_id % 20 = 0 THEN CAST([] AS {_ACTS_SQL_T})
             WHEN doc_id % 20 = 1 THEN [{{'act_name': ''}}]
             ELSE [{{'act_name': 'DJ ' || CAST(doc_id AS VARCHAR)}}] END AS acts,
        CASE WHEN doc_id % 25 = 0 THEN CAST(NULL AS BOOLEAN) ELSE FALSE END AS is_hidden,
        TRUE AS is_featured
    FROM documents
"""

# Per-rule PASS expressions over the flat cases CTE (+ cnt window). These
# mirror the Spark predicates in functions/dq_rules.py RULES one-for-one.
_Q56_PASS = {
    "C001": "event_id IS NOT NULL AND event_id <> '' AND cnt = 1",
    "C002": "title IS NOT NULL AND title <> ''",
    "C003": "d_start IS NOT NULL AND d_start <> '' AND try_cast(d_start AS TIMESTAMP) IS NOT NULL",
    "C004": f"src_url IS NOT NULL AND src_url <> '' AND regexp_matches(src_url, '{_URL}')",
    "C005": "(v_name IS NOT NULL AND v_name <> '') OR (v_full IS NOT NULL AND v_full <> '')",
    "C006": "(full_desc IS NOT NULL AND full_desc <> '') OR (short_desc IS NOT NULL AND short_desc <> '')",
    "C007": "len(keywords) > 0 OR len(hashtags) > 0",
    "C008": "(is_free <> FALSE) OR len(tiers) > 0 OR (tickets_url IS NOT NULL AND tickets_url <> '')",
    "C009": "platform IS NOT NULL AND platform <> ''",
    "C010": "last_scraped IS NOT NULL AND last_scraped <> '' AND try_cast(last_scraped AS TIMESTAMP) IS NOT NULL",
    "C011": "len(acts) > 0",
    "VF001": f"src_url IS NULL OR regexp_matches(src_url, '{_URL}')",
    "VF002": f"len(list_filter(social_vals, x -> NOT regexp_matches(x, '{_URL}'))) = 0",
    "VF003": f"tickets_url IS NULL OR regexp_matches(tickets_url, '{_URL}')",
    "VF004": (
        "(d_start IS NULL OR try_cast(d_start AS TIMESTAMP) IS NOT NULL)"
        " AND (d_end IS NULL OR try_cast(d_end AS TIMESTAMP) IS NOT NULL)"
        " AND (first_scraped IS NULL OR try_cast(first_scraped AS TIMESTAMP) IS NOT NULL)"
        " AND (last_scraped IS NULL OR try_cast(last_scraped AS TIMESTAMP) IS NOT NULL)"
    ),
    "VF005": f"d_tz IS NULL OR regexp_matches(d_tz, '{_TZ}')",
    "VF006": "len(list_filter(tiers, t -> t.tier_price IS NOT NULL AND t.tier_price < 0)) = 0",
    "VF007": (
        "len(list_filter(tiers, t -> t.currency IS NOT NULL AND upper(t.currency) NOT IN "
        "('EUR','USD','GBP','JPY','INR','AUD','CAD','CHF'))) = 0"
    ),
    "VF008": (
        "(len(coalesce(coords, CAST([] AS DOUBLE[]))) <> 2)"
        " OR (coords[1] BETWEEN -180.0 AND 180.0 AND coords[2] BETWEEN -90.0 AND 90.0)"
    ),
    "VF009": "is_hidden IS NOT NULL AND is_featured IS NOT NULL",
    "VF010": "len(list_filter(acts, a -> a.act_name IS NULL OR a.act_name = '')) = 0",
    "VF011": (
        "length(coalesce(title, '')) <= 500 AND length(coalesce(full_desc, '')) <= 10000"
        " AND length(coalesce(v_name, '')) <= 200"
    ),
    "CP001": (
        "d_end IS NULL OR d_start IS NULL"
        " OR (try_cast(d_end AS TIMESTAMP) >= try_cast(d_start AS TIMESTAMP))"
    ),
    "CP002": (
        "d_end IS NULL OR d_start IS NULL"
        " OR (date_diff('second', try_cast(d_start AS TIMESTAMP),"
        " try_cast(d_end AS TIMESTAMP)) < 604800)"
    ),
    "CP003": (
        "try_cast(d_start AS TIMESTAMP) IS NULL OR (try_cast(d_start AS TIMESTAMP)"
        " BETWEEN TIMESTAMP '2025-01-01 00:00:00' AND TIMESTAMP '2028-12-31 00:00:00')"
    ),
    "CP004": (
        "v_city IS NULL OR v_country IS NULL"
        " OR NOT (lower(v_city) LIKE '%ibiza%' AND lower(v_country) <> 'spain')"
    ),
    "CP005": (
        "len(list_filter(tiers, t -> t.tier_price IS NOT NULL AND"
        " (t.tier_price > 10000 OR (t.tier_price > 0 AND t.tier_price < 1)))) = 0"
    ),
    "CP006": "(is_free <> TRUE) OR (len(list_filter(tiers, t -> t.tier_price > 0)) = 0)",
    "CP007": "NOT (lower(coalesce(title, '')) IN ('untitled event','lorem ipsum','test event','tbc','tba'))",
    "CP008": (
        "NOT (lower(coalesce(v_name, '')) IN "
        "('tbc','tba','venue to be announced','unknown venue','to be confirmed'))"
    ),
    "DF001": (
        "try_cast(last_scraped AS TIMESTAMP) IS NULL"
        " OR try_cast(last_scraped AS TIMESTAMP) >= TIMESTAMP '2025-12-25 00:00:00'"
    ),
    "DF002": (
        "try_cast(d_start AS TIMESTAMP) IS NULL"
        " OR try_cast(d_start AS TIMESTAMP) <= TIMESTAMP '2026-01-01 00:00:00'"
        " OR try_cast(last_scraped AS TIMESTAMP) >= TIMESTAMP '2025-12-02 00:00:00'"
    ),
}


def _q56_oracle() -> str:
    assert set(_Q56_PASS) == {r.rule_id for r in RULES}, "oracle/registry drift"
    rows = []
    for r in RULES:  # metadata comes FROM the registry — drift fails the gate
        rows.append(
            f"""
    SELECT '{r.rule_id}' AS rule_id, '{r.severity}' AS severity, '{r.field}' AS field,
           CAST(SUM(CASE WHEN NOT p THEN 1 ELSE 0 END) AS BIGINT) AS failures,
           ROUND(CAST(AVG(CASE WHEN p THEN 1.0 ELSE 0.0 END) AS DOUBLE), 4) AS pass_rate,
           CAST(COUNT(*) AS BIGINT) AS total_events
    FROM (SELECT coalesce({_Q56_PASS[r.rule_id]}, FALSE) AS p FROM wc)"""
        )
    body = " UNION ALL ".join(rows)
    return (
        f"WITH cases AS ({_Q56_CASES}), "
        "wc AS (SELECT *, COUNT(*) OVER (PARTITION BY event_id) AS cnt FROM cases) "
        + body
    )


def _build_unified(d: DataFrame) -> DataFrame:
    """Spark twin of _Q56_CASES, assembled into the nested unified schema the
    rule engine evaluates (event_id, title, datetime.*, scraping_metadata.*,
    venue.*, content.*, ticketing.*, acts[], system_flags.*).

    Built as ONE selectExpr of SQL strings (r12, with the rule-registry
    conversion): the stacked WHEN-chain Column builders were ~0.6 s of py4j
    round trips per q56 build; the SQL parses in one round trip with an
    identical Catalyst plan (oracle hash unchanged)."""
    tiers_t = "ARRAY<STRUCT<tier_name: STRING, tier_price: DOUBLE, currency: STRING>>"

    def tier(price: str, cur: str) -> str:
        return (
            "named_struct('tier_name', 'GA', 'tier_price',"
            f" CAST({price} AS DOUBLE), 'currency', '{cur}')"
        )

    event_id = (
        "CASE WHEN doc_id % 50 = 49 THEN ''"
        " WHEN doc_id % 23 = 5 THEN concat('dup_', CAST(doc_id % 46 AS STRING))"
        " ELSE concat('ev_', CAST(doc_id AS STRING)) END AS event_id"
    )
    title = (
        "CASE WHEN doc_id % 13 = 0 THEN CAST(NULL AS STRING)"
        " WHEN doc_id % 13 = 1 THEN 'tbc'"
        " WHEN doc_id % 13 = 2 THEN repeat('x', 501)"
        " ELSE concat('Event ', CAST(doc_id AS STRING)) END AS title"
    )
    d_start = (
        "CASE WHEN doc_id % 11 = 0 THEN CAST(NULL AS STRING)"
        " WHEN doc_id % 11 = 1 THEN 'not-a-date'"
        " WHEN doc_id % 11 = 2 THEN '2020-01-01 00:00:00'"
        " WHEN doc_id % 11 = 3 THEN '2031-01-01 00:00:00'"
        " ELSE concat('2026-', lpad(CAST(doc_id % 12 + 1 AS STRING), 2, '0'),"
        " '-', lpad(CAST(doc_id % 28 + 1 AS STRING), 2, '0'), ' 23:00:00') END"
    )
    d_end = (
        "CASE WHEN doc_id % 17 = 0 THEN '2019-12-31 00:00:00'"
        " WHEN doc_id % 17 = 1 THEN '2099-01-01 00:00:00'"
        " ELSE CAST(NULL AS STRING) END"
    )
    d_tz = (
        "CASE WHEN doc_id % 5 = 0 THEN 'Europe/Madrid'"
        " WHEN doc_id % 5 = 1 THEN 'UTC'"
        " WHEN doc_id % 5 = 2 THEN 'NotATZ!!!'"
        " ELSE CAST(NULL AS STRING) END"
    )
    src_url = (
        "CASE WHEN doc_id % 9 = 0 THEN CAST(NULL AS STRING)"
        " WHEN doc_id % 9 = 1 THEN 'ftp://bad.example.com/x'"
        " ELSE concat('https://events.example.com/e/', CAST(doc_id AS STRING)) END"
    )
    platform = "CASE WHEN doc_id % 21 = 20 THEN '' ELSE 'platform_a' END"
    last_scraped = (
        "CASE WHEN doc_id % 8 = 0 THEN CAST(NULL AS STRING)"
        " WHEN doc_id % 8 = 1 THEN '2025-11-01 00:00:00'"
        " ELSE '2025-12-30 12:00:00' END"
    )
    v_name = (
        "CASE WHEN doc_id % 6 = 0 THEN CAST(NULL AS STRING)"
        " WHEN doc_id % 6 = 1 THEN 'tbc'"
        " ELSE concat('Venue ', CAST(doc_id AS STRING)) END"
    )
    v_full = (
        "CASE WHEN doc_id % 12 = 0 THEN 'Carrer Example 5, 07800 Ibiza'"
        " ELSE CAST(NULL AS STRING) END"
    )
    v_city = (
        "CASE WHEN doc_id % 10 = 0 THEN 'Ibiza Town'"
        " WHEN doc_id % 10 = 1 THEN 'Palma' ELSE CAST(NULL AS STRING) END"
    )
    v_country = (
        "CASE WHEN doc_id % 15 = 0 THEN 'France'"
        " WHEN doc_id % 15 = 1 THEN 'Spain' ELSE CAST(NULL AS STRING) END"
    )
    coords = (
        "CASE WHEN doc_id % 14 = 0 THEN array(200.0D, 38.9D)"
        " WHEN doc_id % 14 = 1 THEN array(1.4D)"
        " WHEN doc_id % 14 = 2 THEN array(1.4D, 38.9D)"
        " ELSE CAST(NULL AS ARRAY<DOUBLE>) END"
    )
    social = (
        "CASE WHEN doc_id % 16 = 0 THEN map('instagram', 'not a url')"
        " WHEN doc_id % 16 = 1 THEN map('instagram', 'https://instagram.com/x')"
        " ELSE CAST(NULL AS MAP<STRING, STRING>) END"
    )
    full_desc = (
        "CASE WHEN doc_id % 4 = 0 THEN CAST(NULL AS STRING)"
        " ELSE concat('Description for event ', CAST(doc_id AS STRING)) END"
    )
    short_desc = (
        "CASE WHEN doc_id % 8 = 0 THEN concat('Short ', CAST(doc_id AS STRING))"
        " ELSE CAST(NULL AS STRING) END"
    )
    keywords = (
        "CASE WHEN doc_id % 3 = 0 THEN array('k1', 'k2')"
        " ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    hashtags = (
        "CASE WHEN doc_id % 6 = 1 THEN array('#h')"
        " ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    is_free = (
        "CASE WHEN doc_id % 12 = 0 THEN true"
        " WHEN doc_id % 12 = 1 THEN false ELSE CAST(NULL AS BOOLEAN) END"
    )
    tiers = (
        f"CASE WHEN doc_id % 18 = 0 THEN array({tier('-5.0', 'EUR')})"
        f" WHEN doc_id % 18 = 1 THEN array({tier('20000.0', 'EUR')})"
        f" WHEN doc_id % 18 = 2 THEN array({tier('0.5', 'EUR')})"
        f" WHEN doc_id % 18 = 3 THEN array({tier('25.0', 'ZZZ')})"
        f" WHEN doc_id % 18 = 4 THEN array({tier('25.0', 'EUR')})"
        f" ELSE CAST(array() AS {tiers_t}) END"
    )
    tickets_url = (
        "CASE WHEN doc_id % 19 = 0 THEN 'ftp://tickets.bad'"
        " WHEN doc_id % 19 = 1 THEN concat('https://tix.example.com/', CAST(doc_id AS STRING))"
        " ELSE CAST(NULL AS STRING) END"
    )
    acts = (
        "CASE WHEN doc_id % 20 = 0 THEN CAST(array() AS ARRAY<STRUCT<act_name: STRING>>)"
        " WHEN doc_id % 20 = 1 THEN array(named_struct('act_name', ''))"
        " ELSE array(named_struct('act_name', concat('DJ ', CAST(doc_id AS STRING)))) END"
        " AS acts"
    )
    is_hidden = "CASE WHEN doc_id % 25 = 0 THEN CAST(NULL AS BOOLEAN) ELSE false END"

    return d.selectExpr(
        event_id,
        title,
        f"named_struct('start_date', {d_start}, 'end_date', {d_end},"
        f" 'timezone', {d_tz}) AS `datetime`",
        f"named_struct('source_url', {src_url}, 'source_platform', {platform},"
        " 'first_scraped', '2025-12-01 10:00:00',"
        f" 'last_scraped', {last_scraped}) AS scraping_metadata",
        f"named_struct('name', {v_name},"
        f" 'address', named_struct('full_address', {v_full}, 'city', {v_city},"
        f" 'country', {v_country}),"
        f" 'coordinates', named_struct('coordinates', {coords}),"
        f" 'social_links', {social}) AS venue",
        f"named_struct('full_description', {full_desc},"
        f" 'short_description', {short_desc}, 'keywords', {keywords},"
        f" 'hashtags', {hashtags}) AS content",
        f"named_struct('is_free', {is_free}, 'tiers', {tiers},"
        f" 'tickets_url', {tickets_url}) AS ticketing",
        acts,
        f"named_struct('is_hidden', {is_hidden}, 'is_featured', true)"
        " AS system_flags",
    )
    d_start = (
        F.when(m % 11 == 0, null_s)
        .when(m % 11 == 1, F.lit("not-a-date"))
        .when(m % 11 == 2, F.lit("2020-01-01 00:00:00"))
        .when(m % 11 == 3, F.lit("2031-01-01 00:00:00"))
        .otherwise(
            F.concat(
                F.lit("2026-"),
                F.lpad((m % 12 + 1).cast("string"), 2, "0"),
                F.lit("-"),
                F.lpad((m % 28 + 1).cast("string"), 2, "0"),
                F.lit(" 23:00:00"),
            )
        )
    )
    d_end = (
        F.when(m % 17 == 0, F.lit("2019-12-31 00:00:00"))
        .when(m % 17 == 1, F.lit("2099-01-01 00:00:00"))
        .otherwise(null_s)
    )
    d_tz = (
        F.when(m % 5 == 0, F.lit("Europe/Madrid"))
        .when(m % 5 == 1, F.lit("UTC"))
        .when(m % 5 == 2, F.lit("NotATZ!!!"))
        .otherwise(null_s)
    )
    src_url = (
        F.when(m % 9 == 0, null_s)
        .when(m % 9 == 1, F.lit("ftp://bad.example.com/x"))
        .otherwise(F.concat(F.lit("https://events.example.com/e/"), m.cast("string")))
    )
    platform = F.when(m % 21 == 20, F.lit("")).otherwise(F.lit("platform_a"))
    last_scraped = (
        F.when(m % 8 == 0, null_s)
        .when(m % 8 == 1, F.lit("2025-11-01 00:00:00"))
        .otherwise(F.lit("2025-12-30 12:00:00"))
    )
    v_name = (
        F.when(m % 6 == 0, null_s)
        .when(m % 6 == 1, F.lit("tbc"))
        .otherwise(F.concat(F.lit("Venue "), m.cast("string")))
    )
    v_full = F.when(m % 12 == 0, F.lit("Carrer Example 5, 07800 Ibiza")).otherwise(null_s)
    v_city = F.when(m % 10 == 0, F.lit("Ibiza Town")).when(m % 10 == 1, F.lit("Palma")).otherwise(null_s)
    v_country = F.when(m % 15 == 0, F.lit("France")).when(m % 15 == 1, F.lit("Spain")).otherwise(null_s)
    coords = (
        F.when(m % 14 == 0, F.array(F.lit(200.0), F.lit(38.9)))
        .when(m % 14 == 1, F.array(F.lit(1.4)))
        .when(m % 14 == 2, F.array(F.lit(1.4), F.lit(38.9)))
        .otherwise(F.lit(None).cast("array<double>"))
    )
    social = (
        F.when(m % 16 == 0, F.create_map(F.lit("instagram"), F.lit("not a url")))
        .when(m % 16 == 1, F.create_map(F.lit("instagram"), F.lit("https://instagram.com/x")))
        .otherwise(F.lit(None).cast("map<string,string>"))
    )
    full_desc = F.when(m % 4 == 0, null_s).otherwise(
        F.concat(F.lit("Description for event "), m.cast("string"))
    )
    short_desc = F.when(m % 8 == 0, F.concat(F.lit("Short "), m.cast("string"))).otherwise(null_s)
    keywords = F.when(m % 3 == 0, F.array(F.lit("k1"), F.lit("k2"))).otherwise(
        F.array().cast("array<string>")
    )
    hashtags = F.when(m % 6 == 1, F.array(F.lit("#h"))).otherwise(F.array().cast("array<string>"))
    is_free = (
        F.when(m % 12 == 0, F.lit(True))
        .when(m % 12 == 1, F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )

    def tier(price: float, cur: str):
        return F.struct(
            F.lit("GA").alias("tier_name"),
            F.lit(price).cast("double").alias("tier_price"),
            F.lit(cur).alias("currency"),
        )

    tiers_t = "array<struct<tier_name:string,tier_price:double,currency:string>>"
    tiers = (
        F.when(m % 18 == 0, F.array(tier(-5.0, "EUR")))
        .when(m % 18 == 1, F.array(tier(20000.0, "EUR")))
        .when(m % 18 == 2, F.array(tier(0.5, "EUR")))
        .when(m % 18 == 3, F.array(tier(25.0, "ZZZ")))
        .when(m % 18 == 4, F.array(tier(25.0, "EUR")))
        .otherwise(F.array().cast(tiers_t))
    )
    tickets_url = (
        F.when(m % 19 == 0, F.lit("ftp://tickets.bad"))
        .when(m % 19 == 1, F.concat(F.lit("https://tix.example.com/"), m.cast("string")))
        .otherwise(null_s)
    )
    acts = (
        F.when(m % 20 == 0, F.array().cast("array<struct<act_name:string>>"))
        .when(m % 20 == 1, F.array(F.struct(F.lit("").alias("act_name"))))
        .otherwise(F.array(F.struct(F.concat(F.lit("DJ "), m.cast("string")).alias("act_name"))))
    )
    is_hidden = F.when(m % 25 == 0, F.lit(None).cast("boolean")).otherwise(F.lit(False))

    return d.select(
        event_id.alias("event_id"),
        title.alias("title"),
        F.struct(
            d_start.alias("start_date"), d_end.alias("end_date"), d_tz.alias("timezone")
        ).alias("datetime"),
        F.struct(
            src_url.alias("source_url"),
            platform.alias("source_platform"),
            F.lit("2025-12-01 10:00:00").alias("first_scraped"),
            last_scraped.alias("last_scraped"),
        ).alias("scraping_metadata"),
        F.struct(
            v_name.alias("name"),
            F.struct(
                v_full.alias("full_address"), v_city.alias("city"), v_country.alias("country")
            ).alias("address"),
            F.struct(coords.alias("coordinates")).alias("coordinates"),
            social.alias("social_links"),
        ).alias("venue"),
        F.struct(
            full_desc.alias("full_description"),
            short_desc.alias("short_description"),
            keywords.alias("keywords"),
            hashtags.alias("hashtags"),
        ).alias("content"),
        F.struct(
            is_free.alias("is_free"), tiers.alias("tiers"), tickets_url.alias("tickets_url")
        ).alias("ticketing"),
        acts.alias("acts"),
        F.struct(is_hidden.alias("is_hidden"), F.lit(True).alias("is_featured")).alias(
            "system_flags"
        ),
    )


def q56_dq_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    evaluated = evaluate_rules(_build_unified(d), now=_Q56_NOW)
    roll = rule_rollup(evaluated)
    return roll.select(
        "rule_id",
        "severity",
        "field",
        F.col("failures").cast("long").alias("failures"),
        "pass_rate",
        F.col("total_events").cast("long").alias("total_events"),
    )


QUERIES["q56_dq_rollup"] = q56_dq_rollup
ORACLES["q56_dq_rollup"] = _q56_oracle()
