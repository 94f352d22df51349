"""asof_join / interval_join semantics on hand-built frames.

The oracle gate (q58/q59) proves equivalence with the quadratic SQL forms
on real data; these pin the operator corners the gate doesn't reach:
forward direction, tolerance nulling, exact-tie resolution, numeric time
columns, bucket-boundary inclusivity, and multi-bucket intervals.
"""

from __future__ import annotations

import pytest

from scraper_db_refine_merge_spark.operators.temporal import asof_join, interval_join


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


@pytest.fixture(scope="module")
def frames(spark):
    left = _df(
        spark,
        [("u1", 100, "a"), ("u1", 205, "b"), ("u2", 50, "c"), ("u3", 10, "d")],
        "k string, t long, tag string",
    )
    right = _df(
        spark,
        [
            ("u1", 90, 1),
            ("u1", 100, 2),  # exact tie with left t=100
            ("u1", 100, 3),  # same instant: highest rid wins backward
            ("u1", 200, 4),
            ("u2", 60, 5),  # after u2's only left row
        ],
        "k string, rt long, rid long",
    )
    return left, right


def _by_tag(res):
    return {r["tag"]: r for r in res.collect()}


def test_backward_basic(frames):
    left, right = frames
    out = _by_tag(
        asof_join(left, right, "k", "t", "rt", right_tiebreak="rid", matched_time_alias="mt")
    )
    assert out["a"]["rid"] == 3  # tie at t=100 → simultaneous match, max rid
    assert out["a"]["mt"] == 100
    assert out["b"]["rid"] == 4
    assert out["c"]["rid"] is None  # only later right rows
    assert out["d"]["rid"] is None  # no right rows for u3


def test_forward_basic(frames):
    left, right = frames
    out = _by_tag(
        asof_join(
            left, right, "k", "t", "rt",
            direction="forward", right_tiebreak="rid", matched_time_alias="mt",
        )
    )
    assert out["a"]["rid"] == 2  # simultaneous match, MIN rid forward
    assert out["b"]["rid"] is None  # nothing at/after 205
    assert out["c"]["rid"] == 5
    assert out["d"]["rid"] is None


def test_tolerance_nulls_far_matches(frames):
    left, right = frames
    out = _by_tag(
        asof_join(
            left, right, "k", "t", "rt",
            tolerance_us=4, right_tiebreak="rid", matched_time_alias="mt",
        )
    )
    assert out["a"]["rid"] == 3  # gap 0 <= 4
    assert out["b"]["rid"] is None  # gap 5 > 4 → nulled
    assert out["b"]["mt"] is None


def test_left_row_count_preserved(frames):
    left, right = frames
    assert asof_join(left, right, "k", "t", "rt", right_tiebreak="rid").count() == left.count()


def test_collision_rejected(spark, frames):
    left, _ = frames
    right_bad = _df(spark, [("u1", 90, "x")], "k string, rt long, tag string")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right_bad, "k", "t", "rt")


def test_interval_join_bounds_and_buckets(spark):
    points = _df(
        spark,
        [("u1", 0, 1), ("u1", 10, 2), ("u1", 25, 3), ("u1", 26, 4), ("u2", 10, 5)],
        "k string, t long, pid long",
    )
    intervals = _df(
        spark,
        [
            ("u1", 10, 25, 100),  # inclusive both ends; spans buckets 1..3 at width 8
            ("u2", 0, 9, 200),  # ends just before u2's point
        ],
        "k string, lo long, hi long, iid long",
    )
    rows = {
        (r["pid"], r["iid"])
        for r in interval_join(points, intervals, "k", "t", "lo", "hi", bucket_width_us=8).collect()
    }
    assert rows == {(2, 100), (3, 100)}  # t=10 (start) and t=25 (end) in; 26 out; u2 t=10 > hi=9


def test_interval_join_wide_interval_no_duplicates(spark):
    # interval spans many buckets; each contained point matches exactly once
    points = _df(spark, [("k", t, t) for t in range(0, 100, 7)], "k string, t long, pid long")
    intervals = _df(spark, [("k", 5, 95, 1)], "k string, lo long, hi long, iid long")
    got = interval_join(points, intervals, "k", "t", "lo", "hi", bucket_width_us=3).collect()
    expected = [t for t in range(0, 100, 7) if 5 <= t <= 95]
    assert sorted(r["pid"] for r in got) == expected


# ----------------------------------------------------------------------
# Randomized differential: asof_join ≡ pandas.merge_asof (the widely-used
# reference semantics for point-in-time joins). Right side sorted by
# (t, rid) makes pandas' positional tie-break coincide with the operator's
# max-rid (backward) / min-rid (forward) rule.

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

_key = st.sampled_from(["a", "b", "c"])


@given(
    left=st.lists(st.tuples(_key, st.integers(0, 40)), min_size=1, max_size=25),
    right=st.lists(st.tuples(_key, st.integers(0, 40)), min_size=0, max_size=25),
    direction=st.sampled_from(["backward", "forward"]),
)
@settings(max_examples=5, deadline=None)
@pytest.mark.slow
def test_asof_matches_pandas_merge_asof(spark, left, right, direction):
    lrows = [(k, t, i) for i, (k, t) in enumerate(left)]
    rrows = [(k, t, i) for i, (k, t) in enumerate(right)]
    ldf = spark.createDataFrame(lrows, "k string, t long, tag long")
    rdf = spark.createDataFrame(
        rrows or [("_none_", -1, -1)], "k string, rt long, rid long"
    )
    got = {
        r["tag"]: r["rid"]
        for r in asof_join(
            ldf, rdf, "k", "t", "rt", direction=direction, right_tiebreak="rid"
        ).collect()
    }

    lpd = pd.DataFrame(lrows, columns=["k", "t", "tag"]).sort_values(["t", "tag"])
    rpd = pd.DataFrame(rrows or [("_none_", -1, -1)], columns=["k", "rt", "rid"]).sort_values(
        ["rt", "rid"]
    )
    exp_df = pd.merge_asof(
        lpd, rpd, left_on="t", right_on="rt", by="k",
        direction=direction, allow_exact_matches=True,
    )
    expected = {
        int(r.tag): (None if pd.isna(r.rid) else int(r.rid)) for r in exp_df.itertuples()
    }
    assert got == expected


@pytest.mark.slow
def test_asof_and_interval_join_tolerate_timestamp_ntz(spark):
    """The driver has shipped events.ts as TIMESTAMP(NANOS) (r1) and as
    TIMESTAMP_NTZ (r3); load_table normalizes, but the temporal operators
    themselves must also survive either flavor (_time_expr casts NTZ via
    the UTC session). Same fixture through LTZ and NTZ inputs must give
    identical matches."""
    from pyspark.sql import functions as F

    from scraper_db_refine_merge_spark.operators.temporal import asof_join, interval_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 12:00:00"), (2, "2024-01-01 09:00:00")],
        "k long, t string",
    )
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:30:00", "a"), (1, "2024-01-01 11:30:00", "b"), (2, "2024-01-01 10:00:00", "c")],
        "k long, rt string, payload string",
    )

    def run(cast_type):
        l = left.select("k", F.col("t").cast(cast_type).alias("t"))
        r = right.select("k", F.col("rt").cast(cast_type).alias("rt"), "payload")
        out = asof_join(l, r, "k", "t", "rt").select("k", "payload")
        return sorted(tuple(x) for x in out.collect())

    assert run("timestamp") == run("timestamp_ntz") == [(1, "a"), (1, "b"), (2, None)]

    def run_iv(cast_type):
        pts = left.select("k", F.col("t").cast(cast_type).alias("t"))
        ivs = spark.createDataFrame(
            [(1, "2024-01-01 09:00:00", "2024-01-01 11:00:00", "w1")],
            "k long, s string, e string, tag string",
        ).select("k", F.col("s").cast(cast_type).alias("s"), F.col("e").cast(cast_type).alias("e"), "tag")
        out = interval_join(pts, ivs, "k", "t", "s", "e", bucket_width_us=3_600_000_000)
        return sorted(tuple(r) for r in out.select("k", "tag").collect())

    assert run_iv("timestamp") == run_iv("timestamp_ntz") == [(1, "w1")]
