"""Geometry helpers: GeoJSON parsing, vectorized point-in-polygon, affine
pixel↔coordinate math (SURVEY.md §2.8 Geo row).

Dependency-free (numpy only — the container has no shapely/rasterio): the
containment test is an even-odd crossing-number algorithm vectorized over
pixel centers, which reproduces rasterio.mask(all_touched=False) semantics —
a pixel belongs to a polygon iff its *center* is inside
(geoprocessing/zonal.py:52-54; SURVEY §7 hard part 1).
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class ParsedGeometry:
    """Rings flattened from a (Multi)Polygon; even-odd parity over all rings
    handles holes without distinguishing shells."""
    rings: tuple[np.ndarray, ...]      # each (n, 2) float64 [lon, lat], closed or open
    bbox: tuple[float, float, float, float]  # west, south, east, north


def parse_geojson(geometry: str | None) -> ParsedGeometry | None:
    """Parse a GeoJSON Polygon/MultiPolygon string; None/invalid → None
    (reference returns EMPTY_STATS for null geometry, zonal.py:41-48)."""
    if geometry is None:
        return None
    try:
        geom = json.loads(geometry)
    except (TypeError, ValueError):
        return None
    gtype = geom.get("type")
    if gtype == "Polygon":
        polys = [geom["coordinates"]]
    elif gtype == "MultiPolygon":
        polys = geom["coordinates"]
    else:
        return None
    rings: list[np.ndarray] = []
    for poly in polys:
        for ring in poly:
            arr = np.asarray(ring, dtype=np.float64)
            if arr.ndim == 2 and len(arr) >= 3:
                rings.append(arr)
    if not rings:
        return None
    allpts = np.vstack(rings)
    bbox = (float(allpts[:, 0].min()), float(allpts[:, 1].min()),
            float(allpts[:, 0].max()), float(allpts[:, 1].max()))
    return ParsedGeometry(rings=tuple(rings), bbox=bbox)


def points_in_geometry(lon: np.ndarray, lat: np.ndarray,
                       geom: ParsedGeometry) -> np.ndarray:
    """Vectorized even-odd containment of points in a (Multi)Polygon.

    Crossing-number per ring, XOR-accumulated → holes subtract, disjoint
    shells add. Half-open edge rule (y1 <= p < y2) keeps shared edges
    counted once.
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    inside = np.zeros(lon.shape, dtype=bool)
    w, s, e, n = geom.bbox
    candidate = (lon >= w) & (lon <= e) & (lat >= s) & (lat <= n)
    if not candidate.any():
        return inside
    px, py = lon[candidate], lat[candidate]
    acc = np.zeros(px.shape, dtype=bool)
    for ring in geom.rings:
        x1, y1 = ring[:-1, 0], ring[:-1, 1]
        x2, y2 = ring[1:, 0], ring[1:, 1]
        if ring[0, 0] != ring[-1, 0] or ring[0, 1] != ring[-1, 1]:
            x1 = np.append(x1, ring[-1, 0]); y1 = np.append(y1, ring[-1, 1])
            x2 = np.append(x2, ring[0, 0]);  y2 = np.append(y2, ring[0, 1])
        # edges × points: (E, 1) vs (P,) broadcasting
        y1c, y2c = y1[:, None], y2[:, None]
        x1c, x2c = x1[:, None], x2[:, None]
        crosses = (y1c <= py) != (y2c <= py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1c + (py - y1c) * (x2c - x1c) / (y2c - y1c)
        hits = crosses & (px < xint)
        acc ^= (hits.sum(axis=0) % 2).astype(bool)
    inside[candidate] = acc
    return inside


# Spherical web-mercator (EPSG:3857) — closed form, no pyproj needed.
WEBMERC_RADIUS = 6378137.0
WEBMERC_MAX_LAT = 85.05112877980659  # atan(sinh(pi)) in degrees


def lonlat_to_webmercator_xy(lon: float, lat: float) -> tuple[float, float]:
    lat = min(max(lat, -WEBMERC_MAX_LAT), WEBMERC_MAX_LAT)
    x = WEBMERC_RADIUS * math.radians(lon)
    y = WEBMERC_RADIUS * math.log(math.tan(math.pi / 4
                                           + math.radians(lat) / 2))
    return x, y


def webmercator_to_lonlat_xy(x: float, y: float) -> tuple[float, float]:
    lon = math.degrees(x / WEBMERC_RADIUS)
    lat = math.degrees(2 * math.atan(math.exp(y / WEBMERC_RADIUS))
                       - math.pi / 2)
    return lon, lat


def reproject_geometry(geometry: str, dst_crs: str,
                       src_crs: str = "EPSG:4326") -> str:
    """Reproject a GeoJSON geometry string between CRSs
    (geoprocessing/zonal.py:30-38).

    EPSG:4326↔3857 is closed-form spherical mercator — computed natively
    (the reference's titiler tile export works in 3857). Other CRS pairs
    need pyproj and stay gated behind the same seam the format decoders
    use; the rest of the mask pipeline is CRS-agnostic since it only
    consumes ring coordinates.
    """
    def _norm(c: str) -> str:
        return c.strip().upper().replace(" ", "")
    src, dst = _norm(src_crs), _norm(dst_crs)
    if src == dst:
        return geometry
    fwd = {("EPSG:4326", "EPSG:3857"): lonlat_to_webmercator_xy,
           ("EPSG:3857", "EPSG:4326"): webmercator_to_lonlat_xy}
    fn = fwd.get((src, dst))
    if fn is not None:
        geom = json.loads(geometry)

        def tx(coords):
            if (isinstance(coords, (list, tuple)) and len(coords) >= 2
                    and all(isinstance(c, (int, float)) for c in coords[:2])):
                a, b = fn(float(coords[0]), float(coords[1]))
                return [a, b]
            return [tx(c) for c in coords]

        geom["coordinates"] = tx(geom["coordinates"])
        return json.dumps(geom)
    try:
        import pyproj  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            f"reprojection {src_crs}→{dst_crs} needs pyproj (not in this "
            "container); 4326↔3857 transforms are computed natively") from e
    raise NotImplementedError("pyproj transform path not wired yet")


def webmercator_xy(lat, lon):
    """(merc_x, merc_y) EPSG:3857 Columns from lat/lon degrees — the
    closed-form spherical mercator, JVM-side. Latitude clamps to the
    mercator limit (±85.051…°), matching the scalar helper — without it
    a polar pixel would produce an infinite merc_y."""
    from pyspark.sql import functions as F
    lat_c = F.greatest(F.lit(-WEBMERC_MAX_LAT),
                       F.least(lat, F.lit(WEBMERC_MAX_LAT)))
    x = (F.lit(WEBMERC_RADIUS) * F.radians(lon)).alias("merc_x")
    y = (F.lit(WEBMERC_RADIUS) * F.log(
        F.tan(F.lit(math.pi / 4) + F.radians(lat_c) / F.lit(2.0)))
        ).alias("merc_y")
    return x, y


def webmercator_tile(lat, lon, zoom: int):
    """Slippy-map tile index (tile_x, tile_y) Columns for a zoom level —
    the XYZ addressing the reference's titiler service exposes. Pure
    JVM expressions (radians/tan/log), clamped to the valid tile range.
    """
    from pyspark.sql import functions as F
    n = F.lit(float(1 << zoom))
    xt = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * n)
    lat_r = F.radians(lat)
    yt = F.floor((F.lit(1.0) - F.log(F.tan(lat_r)
                                     + F.lit(1.0) / F.cos(lat_r))
                  / F.lit(math.pi)) / F.lit(2.0) * n)
    clamp = lambda c: F.greatest(F.lit(0), F.least(c, F.lit((1 << zoom) - 1)))  # noqa: E731
    return clamp(xt).alias("tile_x"), clamp(yt).alias("tile_y")


def affine_index(lat0: float, lon0: float, res: float,
                 lat: float, lon: float) -> tuple[int, int]:
    """Exact nearest-pixel index from the affine transform — the J4
    "as-of join in space" resolved by arithmetic, not a tolerance join
    (analysis/timeseries/service.py:92-97; SURVEY §7 hard part 4).

    Grid contract: pixel center at (lat0 + res*(y+0.5), lon0 + res*(x+0.5)).
    floor((coord - origin)/res) gives the containing pixel; xarray
    method='nearest' on center coordinates picks the same pixel for interior
    points and resolves exact-boundary ties toward the lower index, which
    floor-with-half-shift reproduces.
    """
    y = int(np.floor((lat - lat0) / res))
    x = int(np.floor((lon - lon0) / res))
    return y, x
