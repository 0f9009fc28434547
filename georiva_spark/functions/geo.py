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


def reproject_geometry(geometry: str, dst_crs: str,
                       src_crs: str = "EPSG:4326") -> str:
    """Reproject a GeoJSON geometry string between CRSs
    (geoprocessing/zonal.py:30-38).

    Identity (same CRS) is handled natively; actual transforms need pyproj
    (not in this container) and are gated behind the same seam the format
    decoders use — the rest of the mask pipeline is CRS-agnostic since it
    only consumes ring coordinates.
    """
    def _norm(c: str) -> str:
        return c.strip().upper().replace(" ", "")
    if _norm(dst_crs) == _norm(src_crs):
        return geometry
    try:
        import pyproj  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            f"reprojection {src_crs}→{dst_crs} needs pyproj (not in this "
            "container); EPSG:4326 geometries pass through unchanged") from e
    raise NotImplementedError("pyproj transform path not wired yet")


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
