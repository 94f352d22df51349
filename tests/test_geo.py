"""Geo predicates and distance (SURVEY G1/G2, F14)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from scraper_db_refine_merge_spark.functions.geo import (
    geojson_lat,
    geojson_lon,
    haversine_km,
    in_box,
    in_ibiza,
    nearest_within_km,
    valid_coordinates,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_coordinate_validation_and_boxes(spark):
    assert _one(spark, valid_coordinates(F.lit(1.4), F.lit(38.9)))
    assert not _one(spark, valid_coordinates(F.lit(181.0), F.lit(0.0)))
    assert not _one(spark, valid_coordinates(F.lit(0.0), F.lit(-91.0)))
    # Ibiza box: lon [1.2,1.6], lat [38.8,39.1] (quality_scorer.py:176-189)
    assert _one(spark, in_ibiza(F.lit(1.43), F.lit(38.91)))  # Ibiza Town
    assert not _one(spark, in_ibiza(F.lit(2.65), F.lit(39.57)))  # Palma
    assert _one(spark, in_box(F.lit(5.0), F.lit(5.0), (0.0, 10.0, 0.0, 10.0)))


def test_geojson_extraction(spark):
    pt = F.struct(
        F.lit("Point").alias("type"),
        F.array(F.lit(1.4091), F.lit(38.9067)).alias("coordinates"),
    )
    assert _one(spark, geojson_lon(pt)) == 1.4091
    assert _one(spark, geojson_lat(pt)) == 38.9067


def test_haversine_known_distances(spark):
    # one degree of longitude at the equator: 2*pi*R/360 with R=6371.0
    deg = 2 * math.pi * 6371.0 / 360
    got = _one(spark, haversine_km(F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(0.0)))
    assert abs(got - deg) < 0.01
    # Ibiza Town (1.4091E, 38.9067N) to Sant Antoni (1.3036E, 38.9744N): ~11.7 km
    got = _one(
        spark,
        haversine_km(F.lit(1.4091), F.lit(38.9067), F.lit(1.3036), F.lit(38.9744)),
    )
    assert 11.0 < got < 12.5
    assert _one(spark, haversine_km(F.lit(1.4), F.lit(38.9), F.lit(1.4), F.lit(38.9))) == 0.0


def test_nearest_within_km(spark):
    venues = spark.createDataFrame(
        [
            ("ibiza_town", 1.4091, 38.9067),
            ("sant_antoni", 1.3036, 38.9744),
            ("palma", 2.6502, 39.5696),
        ],
        "name string, lon double, lat double",
    )
    got = nearest_within_km(
        venues, F.col("lon"), F.col("lat"), center_lon=1.4091, center_lat=38.9067, km=20.0
    ).collect()
    names = [r["name"] for r in got]
    assert names[0] == "ibiza_town" and "sant_antoni" in names and "palma" not in names
    # ordered nearest-first
    dists = [r["distance_km"] for r in got]
    assert dists == sorted(dists)


def test_nearest_within_km_lon_window_at_latitude(spark):
    """The box prefilter must widen its lon window by 1/cos(lat): at Ibiza
    latitude 1° lon ≈ 86.7 km, so a point due east at ~17 km is only ~0.196°
    away in lon — outside a naive km/111° window (0.18°) but inside 20 km."""
    center_lon, center_lat = 1.4091, 38.9067
    east = (center_lon + 0.196, center_lat)  # ~17 km due east, < 20 km radius
    df = spark.createDataFrame(
        [("east_edge", *east)], "name string, lon double, lat double"
    )
    got = nearest_within_km(
        df, F.col("lon"), F.col("lat"), center_lon=center_lon, center_lat=center_lat, km=20.0
    ).collect()
    assert [r["name"] for r in got] == ["east_edge"]
    assert got[0]["distance_km"] < 20.0
