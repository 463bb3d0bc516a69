"""Geo predicates shared by the Atlas ``$search`` geo operators, the
``$geoNear`` stage and the ``$match`` query language
(``$geoWithin``/``$geoIntersects``).

Everything here is pure Column math — haversine on the IUGG mean sphere
for distances, even-odd ray casting on the lon/lat plane for polygon
containment (exact for boxes and for Mongo's legacy planar 2d shapes,
a documented planar approximation of 2dsphere polygons otherwise).
Query geometry is driver-literal, so rings unroll into codegen-friendly
boolean chains: zero UDFs, zero shuffles, O(rows × vertices)."""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

EARTH_R_M = 6371008.7714  # IUGG mean Earth radius, Lucene's constant


def lonlat_from_type(col: Column, ftype: Any, what: str
                     ) -> tuple[Column, Column]:
    """Resolve a geo point column to ``(lon, lat)`` doubles given its
    schema type: ``array<numeric>`` as ``[lon, lat]`` or a GeoJSON-style
    struct carrying a ``coordinates`` array field."""
    if isinstance(ftype, T.StructType) and "coordinates" in ftype.fieldNames():
        col = col["coordinates"]
        ftype = ftype["coordinates"].dataType
    if not isinstance(ftype, T.ArrayType):
        raise ValueError(
            f"{what} needs a [lon, lat] or GeoJSON point field "
            f"(got {ftype.simpleString() if ftype is not None else 'unknown'})"
        )
    return col[0].cast("double"), col[1].cast("double")


def geo_point(spec: Any, what: str) -> tuple[float, float]:
    """A literal query-side point: GeoJSON ``{type: Point, coordinates}``
    or bare ``[lon, lat]``."""
    if isinstance(spec, dict) and "coordinates" in spec:
        spec = spec["coordinates"]
    if (isinstance(spec, (list, tuple)) and len(spec) >= 2
            and all(isinstance(v, (int, float)) and not isinstance(v, bool)
                    for v in spec[:2])):
        return float(spec[0]), float(spec[1])
    raise ValueError(f"{what} must be [lon, lat] or a GeoJSON Point")


def haversine_m(lon: Column, lat: Column, olon: float, olat: float
                ) -> Column:
    """Great-circle metres from ``(lon, lat)`` to a literal origin."""
    import math

    a = (F.pow(F.sin((F.radians(lat) - F.lit(math.radians(olat))) / 2), 2)
         + F.cos(F.radians(lat)) * F.lit(math.cos(math.radians(olat)))
         * F.pow(F.sin((F.radians(lon) - F.lit(math.radians(olon))) / 2), 2))
    root = F.sqrt(a)
    # clamp fp drift above 1.0 with when(), NOT least: least SKIPS
    # nulls, which would turn a null coordinate into a real distance
    root = F.when(root > 1.0, F.lit(1.0)).otherwise(root)
    return F.lit(2.0 * EARTH_R_M) * F.asin(root)


def point_in_ring(lon: Column, lat: Column, ring: list) -> Column:
    """Even-odd ray cast against ONE linear ring of literal vertices.

    The query-side ring is constant, so the crossing test unrolls into a
    chain of boolean-XOR terms — whole-stage-codegen friendly, no array
    column, no UDF.  The ring may or may not repeat its first vertex;
    horizontal edges drop out of the parity test."""
    pts = [(float(p[0]), float(p[1])) for p in ring]
    if len(pts) >= 2 and pts[0] == pts[-1]:
        pts = pts[:-1]
    if len(pts) < 3:
        raise ValueError("geo ring needs at least 3 distinct points")
    parity: Column = F.lit(False)
    for i in range(len(pts)):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % len(pts)]
        if y1 == y2:
            continue
        straddles = (F.lit(y1) > lat) != (F.lit(y2) > lat)
        xcross = (F.lit((x2 - x1) / (y2 - y1)) * (lat - F.lit(y1))
                  + F.lit(x1))
        parity = parity != (straddles & (lon < xcross))
    return parity


def point_in_geometry(lon: Column, lat: Column, geom: dict) -> Column:
    """Point-in-GeoJSON-geometry for Polygon (holes honored) and
    MultiPolygon query geometries."""
    gtype = geom.get("type")
    coords = geom.get("coordinates") or []
    if gtype == "Polygon":
        if not coords:
            raise ValueError("geo Polygon needs at least one ring")
        pred = point_in_ring(lon, lat, coords[0])
        for hole in coords[1:]:
            pred = pred & ~point_in_ring(lon, lat, hole)
        return pred
    if gtype == "MultiPolygon":
        pred: Any = None
        for poly in coords:
            p = point_in_geometry(
                lon, lat, {"type": "Polygon", "coordinates": poly})
            pred = p if pred is None else (pred | p)
        if pred is None:
            raise ValueError("geo MultiPolygon needs a polygon")
        return pred
    raise NotImplementedError(
        f"geo geometry type {gtype!r}; Polygon and MultiPolygon are "
        "supported")
