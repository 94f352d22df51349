"""Geo predicates and distance (SURVEY G1/G2, F14).

The reference creates a 2dsphere index (fix_schema.py:132-134) but only ever
evaluates box predicates (quality_scorer.py:176-189). Here geo becomes
derived lon/lat columns + bounding-box predicates (partition-prunable at
scale) and a haversine expression for distance queries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ibiza bounding box (schema_adapter_enhanced.py:143-155, quality_scorer.py:182)
IBIZA_BOX = (1.2, 1.6, 38.8, 39.1)  # lon_min, lon_max, lat_min, lat_max

EARTH_RADIUS_KM = 6371.0088


def valid_coordinates(lon: Column, lat: Column) -> Column:
    """lon ∈ [-180, 180], lat ∈ [-90, 90] (schema_adapter_enhanced.py:143-155)."""
    return lon.between(-180.0, 180.0) & lat.between(-90.0, 90.0)


def in_box(lon: Column, lat: Column, box: tuple[float, float, float, float]) -> Column:
    lon_min, lon_max, lat_min, lat_max = box
    return lon.between(lon_min, lon_max) & lat.between(lat_min, lat_max)


def in_ibiza(lon: Column, lat: Column) -> Column:
    return in_box(lon, lat, IBIZA_BOX)


def geojson_lon(coordinates: Column) -> Column:
    """GeoJSON Point stores [lon, lat]."""
    return coordinates["coordinates"][0]


def geojson_lat(coordinates: Column) -> Column:
    return coordinates["coordinates"][1]


def haversine_km(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in km — the $near equivalent as an expression."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = F.sin(dlat / 2) ** 2 + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) ** 2
    return F.lit(2 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def nearest_within_km(df, lon: Column, lat: Column, center_lon: float, center_lat: float, km: float):
    """Box prefilter (sargable, partition-prunable) + exact haversine —
    the scale-correct pattern for radius queries without a geo index."""
    import math

    lat_deg = km / 111.0  # ~degrees per km of latitude
    # One degree of longitude spans ~111*cos(lat) km, so the lon window must
    # be WIDER by 1/cos(lat) or points near the E/W edge are silently lost
    # (at Ibiza latitude 1° lon ≈ 86.7 km). Clamp cos for near-polar centers.
    lon_deg = km / (111.0 * max(math.cos(math.radians(center_lat)), 1e-6))
    boxed = df.filter(
        lon.between(center_lon - lon_deg, center_lon + lon_deg)
        & lat.between(center_lat - lat_deg, center_lat + lat_deg)
    )
    return (
        boxed.withColumn(
            "distance_km",
            F.round(haversine_km(lon, lat, F.lit(center_lon), F.lit(center_lat)), 3),
        )
        .filter(F.col("distance_km") <= km)
        .orderBy("distance_km")
    )
