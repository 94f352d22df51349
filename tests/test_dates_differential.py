"""F2 dateutil-parity differential (VERDICT r13 item 8).

The native format chain must agree with the reference's dateutil parse on
everything both can parse, EXCEPT the documented day-first class (ambiguous
numeric dates: the chain keeps the reference's European %d/%m convention,
dateutil defaults month-first). The chain must also never parse something
dateutil can't (native_only stays empty — the chain is a subset extension,
dateutil remains the fallback oracle for the fuzzy tail). Deterministic
corpus + a hypothesis sweep over rendered calendar dates.
"""

from __future__ import annotations

import pytest
import os
import sys
from datetime import date

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from gen_dates_diff import DAY_FIRST_RE, classify, corpus, dateutil_utc_iso  # noqa: E402

from scraper_db_refine_merge_spark.functions.dates import parse_fuzzy_to_utc_iso


def test_deterministic_corpus_divergence_domain(spark):
    classes = classify(spark, corpus())
    assert classes["native_only"] == []
    assert classes["differ_other"] == []
    # every remaining dateutil-only string needs dateutil's WALL-CLOCK
    # field injection (yearless / day-less) — exactly the nondeterminism
    # the chain refuses; the fallback UDF remains the compatibility oracle
    leftovers = [s for s, _ in classes["dateutil_only"]]
    assert all(
        not DAY_FIRST_RE.match(s) and len(s) < 12 for s in leftovers
    ), leftovers
    # the r14 chain extension holds: the measured fallback domain is tiny
    assert len(leftovers) <= 8, leftovers


# One render per format family the chain claims; hypothesis drives the
# calendar date. Unambiguous families must agree EXACTLY with dateutil;
# ambiguous numeric families must differ only day-first-vs-month-first.
_RENDERS = [
    lambda d: d.strftime("%Y-%m-%d"),
    lambda d: d.strftime("%Y-%m-%dT%H:%M:%SZ"),
    lambda d: f"{d.day} {d.strftime('%B')} {d.year}",
    lambda d: f"{d.strftime('%B')} {d.day}, {d.year}",
    lambda d: f"{d.strftime('%b')} {d.day}, {d.year}",
    lambda d: f"{d.day}-{d.strftime('%b')}-{d.year}",
    lambda d: f"{d.year}/{d.month:02d}/{d.day:02d}",
    lambda d: d.strftime("%Y%m%d"),
    lambda d: f"{d.day}th {d.strftime('%B')} {d.year}",
    lambda d: f"Friday {d.day} {d.strftime('%B')} {d.year}",
]


@settings(max_examples=30, deadline=None)
@given(
    st.dates(min_value=date(1990, 1, 1), max_value=date(2035, 12, 28)),
)
@pytest.mark.slow
def test_hypothesis_rendered_dates_agree(spark, d):
    strings = [r(d) for r in _RENDERS]
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    native = {
        r["s"]: r["n"]
        for r in df.select("s", parse_fuzzy_to_utc_iso(F.col("s")).alias("n")).collect()
    }
    for s in strings:
        n, u = native[s], dateutil_utc_iso(s)
        assert n is not None, s  # the chain claims all these families
        # dateutil chokes on some valid renders (e.g. '5th March 1990' with
        # unusual ordinals is fine, but keep the invariant one-sided: where
        # BOTH parse, they agree)
        if u is not None:
            assert n == u, (s, n, u)


@settings(max_examples=30, deadline=None)
@given(st.dates(min_value=date(2000, 1, 1), max_value=date(2035, 12, 28)))
def test_hypothesis_day_first_convention(spark, d):
    """Ambiguous numeric dates: the chain is day-first (the reference's
    European convention) regardless of what dateutil picks."""
    s = f"{d.day:02d}/{d.month:02d}/{d.year}"
    n = (
        spark.range(1)
        .select(parse_fuzzy_to_utc_iso(F.lit(s)).alias("n"))
        .first()["n"]
    )
    assert n == d.strftime("%Y-%m-%dT00:00:00Z"), (s, n)
