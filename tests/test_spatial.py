"""Geo-point operators (LatLonPoint surface) vs scalar brute force:
quantized box edges, dateline crossing, haversine distance, polygon
containment, nearest-k."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions.spatial import (
    EARTH_MEAN_RADIUS_METERS,
    box_query,
    distance_query,
    encode_lat,
    encode_lon,
    nearest,
    polygon_query,
)

_LAT_DECODE = 180.0 / (1 << 32)
_LON_DECODE = 360.0 / (1 << 32)


def _pts(n=400):
    out = []
    for i in range(n):
        lat = ((i * 7919) % 16000) / 100.0 - 80.0
        lon = ((i * 104729) % 35000) / 100.0 - 175.0
        out.append((i, lat, lon))
    return out


@pytest.fixture(scope="module")
def geo_df(spark):
    return spark.createDataFrame(
        _pts(), "doc_id: long, lat: double, lon: double"
    ).cache()


def _hav(lat1, lon1, lat2, lon2):
    # on the DECODED quantized point, like the operators
    lat1 = math.floor(lat1 / _LAT_DECODE) * _LAT_DECODE
    lon1 = math.floor(lon1 / _LON_DECODE) * _LON_DECODE
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dlat, dlon = p2 - p1, math.radians(lon2) - math.radians(lon1)
    h = (
        math.sin(dlat / 2) ** 2
        + math.cos(p1) * math.cos(p2) * math.sin(dlon / 2) ** 2
    )
    return 2 * EARTH_MEAN_RADIUS_METERS * math.asin(math.sqrt(h))


def test_encode_matches_reference_quantization():
    # GeoEncodingUtils: floor toward -inf; ceil for lower box edges;
    # +90/+180 nudge down instead of overflowing
    assert encode_lat(0.0) == 0
    assert encode_lat(-90.0) == -(1 << 31)
    assert encode_lat(90.0) == (1 << 31) - 1
    assert encode_lon(180.0) == (1 << 31) - 1
    assert encode_lat(1e-12) == 0 and encode_lat(1e-12, ceil=True) == 1
    assert encode_lat(-1e-12) == -1


def test_box_query_brute_force(spark, geo_df):
    got = {r.doc_id for r in box_query(geo_df, "lat", "lon", -20, 40, 10, 60).collect()}
    want = {
        i
        for i, lat, lon in _pts()
        if encode_lat(-20, ceil=True) <= encode_lat(lat) <= encode_lat(40)
        and encode_lon(10, ceil=True) <= encode_lon(lon) <= encode_lon(60)
    }
    assert got == want and got


def test_box_query_dateline_crossing(spark, geo_df):
    got = {
        r.doc_id
        for r in box_query(geo_df, "lat", "lon", -60, 60, 150, -160).collect()
    }
    want = {
        i
        for i, lat, lon in _pts()
        if encode_lat(-60, ceil=True) <= encode_lat(lat) <= encode_lat(60)
        and (
            encode_lon(lon) >= encode_lon(150, ceil=True)
            or encode_lon(lon) <= encode_lon(-160)
        )
    }
    assert got == want and got


def test_distance_query_brute_force(spark, geo_df):
    got = {
        r.doc_id
        for r in distance_query(
            geo_df, "lat", "lon", 10.0, 20.0, 2_000_000.0
        ).collect()
    }
    want = {
        i for i, lat, lon in _pts() if _hav(lat, lon, 10.0, 20.0) <= 2_000_000.0
    }
    assert got == want and got


def test_nearest_matches_sorted_distances(spark, geo_df):
    rows = nearest(geo_df, "lat", "lon", 48.8566, 2.3522, 10).collect()
    import numpy as np

    want = sorted(
        (float(np.float32(_hav(lat, lon, 48.8566, 2.3522))), i)
        for i, lat, lon in _pts()
    )[:10]
    assert [(r.distance, r.doc_id) for r in rows] == [
        (d, i) for d, i in want
    ]


def test_polygon_query_brute_force(spark, geo_df):
    poly = [(30.0, -40.0), (40.0, 10.0), (5.0, 45.0), (-30.0, 20.0), (-25.0, -35.0)]

    def inside(lat, lon):
        y = math.floor(lat / _LAT_DECODE) * _LAT_DECODE
        x = math.floor(lon / _LON_DECODE) * _LON_DECODE
        n = len(poly)
        c = 0
        for k in range(n):
            y1, x1 = poly[k]
            y2, x2 = poly[(k + 1) % n]
            if (y1 > y) != (y2 > y) and x < x1 + (y - y1) * (x2 - x1) / (y2 - y1):
                c += 1
        return c % 2 == 1

    got = {r.doc_id for r in polygon_query(geo_df, "lat", "lon", poly).collect()}
    want = {i for i, lat, lon in _pts() if inside(lat, lon)}
    assert got == want and got


def test_distance_query_prefilter_pushes_down(spark, geo_df):
    plan = distance_query(
        geo_df, "lat", "lon", 10.0, 20.0, 500_000.0
    )._jdf.queryExecution().executedPlan().toString()
    # the coarse box predicate is plain column comparisons (codegen
    # filter), not hidden behind the trig expression
    assert "Filter" in plan


def test_pole_and_dateline_points_match_inclusive_boxes(spark):
    """lat=90 / lon=180 points encode through the reference's nextDown
    clamp on BOTH the document and query sides, so a box ending at the
    pole contains the pole."""
    df = spark.createDataFrame(
        [(0, 90.0, 180.0), (1, 89.0, 179.0), (2, -90.0, -180.0)],
        "doc_id: long, lat: double, lon: double",
    )
    got = {r.doc_id for r in box_query(df, "lat", "lon", 85, 90, 170, 180).collect()}
    assert got == {0, 1}
    got = {
        r.doc_id
        for r in box_query(df, "lat", "lon", -90, -85, -180, -170).collect()
    }
    assert got == {2}
