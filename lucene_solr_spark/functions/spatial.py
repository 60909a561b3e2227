"""Geo-point queries (the reference's LatLonPoint / LatLonDocValuesField
surface) as Catalyst-native predicates.

Reference semantics re-expressed:

- ``document/LatLonPoint.java`` — ``newBoxQuery`` (:176-198, dateline
  crossing splits into two ranges), ``newDistanceQuery`` (:205-215),
  ``newPolygonQuery`` (:226-246), ``nearest`` (:263-295).
- ``geo/GeoEncodingUtils.java:52-146`` — points are quantized to 32-bit
  ints, ``floor(deg / (180/2^32))`` per axis (ceil for lower box
  edges), so every comparison is INTEGER math; both executors compare
  the same encoded values and the float boundary problem disappears.
- ``util/SloppyMath.java:39-67`` haversin with
  ``GeoUtils.EARTH_MEAN_RADIUS_METERS`` = 6 371 008.7714 m — distances
  are computed on the DECODED (quantized) point, like the reference's
  distance predicate (GeoEncodingUtils.java:382).  The reference
  evaluates its approximated ``haversinSortKey``; we use the exact
  double haversine (same formula family, the approximation is a speed
  trick, not a semantic: divergence only in sub-meter boundary cases).
- ``geo/Polygon.java`` containment — the even-odd crossing-number test,
  emitted as a pure comparison/arithmetic expression from the edge
  list, so Spark and the SQL oracle share one generated predicate.

Scale notes: every operator here is a whole-stage-codegen filter over
two double columns; the distance query wraps the haversine in a
bounding-box prefilter that reaches the parquet scan (PushedFilters),
mirroring the reference's two-phase distance query
(LatLonPoint.newDistanceQuery's box approximation).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "EARTH_MEAN_RADIUS_METERS",
    "encode_lat",
    "encode_lon",
    "box_query",
    "distance_query",
    "distance_col",
    "nearest",
    "polygon_query",
    "box_sql",
    "distance_sql",
    "polygon_sql",
]

#: GeoUtils.java:56
EARTH_MEAN_RADIUS_METERS = 6_371_008.7714

#: GeoEncodingUtils: degrees per quantum
_LAT_DECODE = 180.0 / (1 << 32)
_LON_DECODE = 360.0 / (1 << 32)


def _enc(value, decode: float, ceil: bool):
    if isinstance(value, Column):
        f = F.ceil if ceil else F.floor
        # clamp exactly like the reference's +90/+180 nextDown nudge:
        # only lat == 90.0 / lon == 180.0 can reach 2^31
        return F.least(
            f(value / F.lit(decode)).cast("long"), F.lit((1 << 31) - 1)
        )
    return int(math.ceil(value / decode) if ceil else math.floor(value / decode))


def encode_lat(value, ceil: bool = False):
    """GeoEncodingUtils.encodeLatitude(Ceil) — works on a Column or a
    python float (floor/ceil of deg/(180/2^32)); 90.0 is nudged down
    like the reference to avoid overflow."""
    if not isinstance(value, Column) and value == 90.0:
        value = math.nextafter(value, -math.inf)
    return _enc(value, _LAT_DECODE, ceil)


def encode_lon(value, ceil: bool = False):
    if not isinstance(value, Column) and value == 180.0:
        value = math.nextafter(value, -math.inf)
    return _enc(value, _LON_DECODE, ceil)


def _dec_lat(enc):
    return enc * F.lit(_LAT_DECODE) if isinstance(enc, Column) else enc * _LAT_DECODE


def _dec_lon(enc):
    return enc * F.lit(_LON_DECODE) if isinstance(enc, Column) else enc * _LON_DECODE


# --------------------------------------------------------------------- box


def box_query(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
) -> DataFrame:
    """LatLonPoint.newBoxQuery: encoded-int range comparison per axis
    (lower edges round UP — encodeCeil — so the decoded box never
    over-matches); ``min_lon > max_lon`` crosses the dateline and splits
    into two longitude ranges OR-ed together (LatLonPoint.java:176-198)."""
    lat_e = encode_lat(F.col(lat_col))
    lon_e = encode_lon(F.col(lon_col))
    lat_pred = (lat_e >= F.lit(encode_lat(min_lat, ceil=True))) & (
        lat_e <= F.lit(encode_lat(max_lat))
    )
    if min_lon > max_lon:  # dateline crossing
        lon_pred = (lon_e >= F.lit(encode_lon(min_lon, ceil=True))) | (
            lon_e <= F.lit(encode_lon(max_lon))
        )
    else:
        lon_pred = (lon_e >= F.lit(encode_lon(min_lon, ceil=True))) & (
            lon_e <= F.lit(encode_lon(max_lon))
        )
    return df.filter(lat_pred & lon_pred)


def box_sql(
    lat_col: str,
    lon_col: str,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
) -> str:
    """SQL twin of ``box_query`` (same encoded-int comparisons)."""
    lat_e = f"least(CAST(floor({lat_col} / {_LAT_DECODE!r}) AS BIGINT), 2147483647)"
    lon_e = f"least(CAST(floor({lon_col} / {_LON_DECODE!r}) AS BIGINT), 2147483647)"
    lat_pred = (
        f"{lat_e} >= {encode_lat(min_lat, ceil=True)}"
        f" AND {lat_e} <= {encode_lat(max_lat)}"
    )
    if min_lon > max_lon:
        lon_pred = (
            f"({lon_e} >= {encode_lon(min_lon, ceil=True)}"
            f" OR {lon_e} <= {encode_lon(max_lon)})"
        )
    else:
        lon_pred = (
            f"{lon_e} >= {encode_lon(min_lon, ceil=True)}"
            f" AND {lon_e} <= {encode_lon(max_lon)}"
        )
    return f"({lat_pred} AND {lon_pred})"


# ---------------------------------------------------------------- distance

_D2R = math.pi / 180.0


def distance_col(lat_col: str, lon_col: str, lat: float, lon: float) -> Column:
    """Haversine meters from (lat, lon) to the DECODED quantized point —
    2R·asin(√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2)))."""
    p_lat = _dec_lat(encode_lat(F.col(lat_col))) * F.lit(_D2R)
    p_lon = _dec_lon(encode_lon(F.col(lon_col))) * F.lit(_D2R)
    q_lat, q_lon = lat * _D2R, lon * _D2R
    sdlat = F.sin((p_lat - F.lit(q_lat)) / F.lit(2.0))
    sdlon = F.sin((p_lon - F.lit(q_lon)) / F.lit(2.0))
    h = sdlat * sdlat + F.cos(p_lat) * F.lit(math.cos(q_lat)) * sdlon * sdlon
    return (
        F.lit(2.0 * EARTH_MEAN_RADIUS_METERS) * F.asin(F.sqrt(h))
    ).cast("float").cast("double")


def distance_sql(lat_col: str, lon_col: str, lat: float, lon: float) -> str:
    """SQL twin of ``distance_col`` (float32-rounded like the Column,
    absorbing trig-library 1-ulp differences)."""
    p_lat = f"(least(CAST(floor({lat_col} / {_LAT_DECODE!r}) AS BIGINT), 2147483647) * {_LAT_DECODE!r} * {_D2R!r})"
    p_lon = f"(least(CAST(floor({lon_col} / {_LON_DECODE!r}) AS BIGINT), 2147483647) * {_LON_DECODE!r} * {_D2R!r})"
    q_lat, q_lon = repr(lat * _D2R), repr(lon * _D2R)
    sdlat = f"sin(({p_lat} - {q_lat}) / 2.0)"
    sdlon = f"sin(({p_lon} - {q_lon}) / 2.0)"
    h = f"({sdlat} * {sdlat} + cos({p_lat}) * {math.cos(lat * _D2R)!r} * {sdlon} * {sdlon})"
    return (
        f"CAST(CAST({2.0 * EARTH_MEAN_RADIUS_METERS!r} * asin(sqrt({h})) AS REAL) AS DOUBLE)"
    )


def _distance_bounds(lat: float, lon: float, radius_m: float):
    """Bounding box enclosing the circle (GeoUtils.circleToBBox role):
    the COARSE prefilter — slightly widened so quantization can never
    exclude a true match."""
    dlat = math.degrees(radius_m / EARTH_MEAN_RADIUS_METERS)
    min_lat = max(-90.0, lat - dlat)
    max_lat = min(90.0, lat + dlat)
    cos_min = min(
        math.cos(math.radians(min_lat)), math.cos(math.radians(max_lat))
    )
    if cos_min <= 1e-9:
        return min_lat, max_lat, -180.0, 180.0
    dlon = math.degrees(radius_m / (EARTH_MEAN_RADIUS_METERS * cos_min))
    if dlon >= 180.0:
        return min_lat, max_lat, -180.0, 180.0
    # widen by one quantum for the encode floor
    eps = 2 * _LON_DECODE
    return min_lat, max_lat, lon - dlon - eps, lon + dlon + eps


def distance_query(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    lat: float,
    lon: float,
    radius_m: float,
) -> DataFrame:
    """LatLonPoint.newDistanceQuery: a pushdown-friendly bounding-box
    prefilter (plain column ranges the parquet reader can use) + the
    exact haversine on survivors — the reference's two-phase shape."""
    min_lat, max_lat, min_lon, max_lon = _distance_bounds(lat, lon, radius_m)
    pre = (F.col(lat_col) >= F.lit(min_lat - 2 * _LAT_DECODE)) & (
        F.col(lat_col) <= F.lit(max_lat + 2 * _LAT_DECODE)
    )
    if min_lon >= -180.0 and max_lon <= 180.0:
        pre = pre & (F.col(lon_col) >= F.lit(min_lon)) & (
            F.col(lon_col) <= F.lit(max_lon)
        )
    dist = distance_col(lat_col, lon_col, lat, lon)
    return df.filter(pre & (dist <= F.lit(float(radius_m))))


def nearest(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    lat: float,
    lon: float,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """LatLonPoint.nearest / LatLonDocValuesField.newDistanceSort: k
    closest points, distance asc then id asc tie-break."""
    dist = distance_col(lat_col, lon_col, lat, lon).alias("distance")
    return (
        df.select(F.col(id_col), dist)
        .orderBy(F.asc("distance"), F.asc(id_col))
        .limit(int(k))
    )


# ----------------------------------------------------------------- polygon


def _polygon_edges(polygon):
    pts = list(polygon)
    if pts[0] == pts[-1]:
        pts = pts[:-1]
    return [(pts[i], pts[(i + 1) % len(pts)]) for i in range(len(pts))]


def polygon_query(
    df: DataFrame, lat_col: str, lon_col: str, polygon
) -> DataFrame:
    """LatLonPoint.newPolygonQuery via the even-odd crossing-number test
    (geo/Polygon.java containment): odd number of polygon edges crossed
    by the ray eastward from the (decoded) point.  The predicate is a
    generated arithmetic expression — whole-stage codegen, no UDF."""
    y = _dec_lat(encode_lat(F.col(lat_col)))
    x = _dec_lon(encode_lon(F.col(lon_col)))
    crossings = None
    for (y1, x1), (y2, x2) in _polygon_edges(polygon):
        if y2 == y1:
            continue  # horizontal edges never straddle the ray
        straddles = (F.lit(y1) > y) != (F.lit(y2) > y)
        xcross = F.lit(x1) + (y - F.lit(y1)) * F.lit(x2 - x1) / F.lit(y2 - y1)
        c = F.when(straddles & (x < xcross), 1).otherwise(0)
        crossings = c if crossings is None else crossings + c
    return df.filter(crossings % 2 == 1)


def polygon_sql(lat_col: str, lon_col: str, polygon) -> str:
    """SQL twin of ``polygon_query`` — the same generated edge terms."""
    y = f"(least(CAST(floor({lat_col} / {_LAT_DECODE!r}) AS BIGINT), 2147483647) * {_LAT_DECODE!r})"
    x = f"(least(CAST(floor({lon_col} / {_LON_DECODE!r}) AS BIGINT), 2147483647) * {_LON_DECODE!r})"
    terms = []
    for (y1, x1), (y2, x2) in _polygon_edges(polygon):
        if y2 == y1:
            continue  # horizontal edges never straddle (matches Column side)
        straddles = f"(({y1!r} > {y}) <> ({y2!r} > {y}))"
        xcross = f"({x1!r} + ({y} - {y1!r}) * {x2 - x1!r} / {y2 - y1!r})"
        terms.append(
            f"CASE WHEN {straddles} AND {x} < {xcross} THEN 1 ELSE 0 END"
        )
    return f"(({' + '.join(terms)}) % 2 = 1)"
