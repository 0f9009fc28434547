"""Mapbox Vector Tile sink (S13): zonal stats × boundary geometry → MVT.

Reproduces the reference's Martin tileserver function
(``analysis/zonal_stats/management/commands/create_martin_function.py:50-180``)
Spark-first. The reference installs a PostGIS function that, per tile
request, joins BoundaryZonalStats with AdminBoundary.geom, clips/quantizes
with ``ST_AsMVTGeom(geom, env, 4096, 256, true)`` and encodes with
``ST_AsMVT``. Here the same pipeline is:

- ``tile_envelope`` — closed-form XYZ→EPSG:3857 envelope
  (``ST_TileEnvelope``; same math as titiler ``app/dependencies.py``).
- ``mvt_geom_df`` — a DataFrame transform producing tile-local integer
  coordinates for every ring vertex with pure JVM expressions (the
  quantize half of ``ST_AsMVTGeom``); SQL-expressible, so the
  ``mvt_geom`` query oracle-checks it vertex-by-vertex.
- ``clip_ring`` — Sutherland–Hodgman clip against the buffered envelope
  (the clip half of ``ST_AsMVTGeom``; buffer default 256/4096 like the
  reference call).
- ``encode_mvt`` — dependency-free Mapbox Vector Tile 2.1 protobuf
  writer (varint/zigzag + MoveTo/LineTo/ClosePath command stream).
- ``boundary_stats_tile`` — the Martin function: required-parameter
  errors, org/catalog/collection triple pinning (wrong triple = EMPTY
  tile, never an error — "a caller must not learn from a tile whether
  another organisation exists"), stats×boundary join, encode.
- ``export_tiles`` — the bulk/scale path the reference cannot do in one
  query: enumerate every (z,x,y) each boundary touches, shuffle once on
  the tile key, and encode all tiles per partition with one
  ``applyInPandas`` pass. Boundary geometries are a bounded dim (admin
  boundaries ≪ pixels) so the explode fan-out is #boundaries × tiles
  touched, never pixel-scale.

Scale notes: feature *attributes* (the stats) arrive pre-aggregated from
``zonal_stats`` — one row per (boundary, time, variable) — so the only
shuffle is the groupBy on the tile key, partitioned by (z, x, y). Python
runs only inside the per-tile Arrow batch, on rings already reduced to
the tile's own vertices.
"""

from __future__ import annotations

import json
import math
from typing import Iterable, Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

from georiva_spark.functions.geo import (
    WEBMERC_MAX_LAT, WEBMERC_RADIUS, lonlat_to_webmercator_xy,
)

WORLD = math.pi * WEBMERC_RADIUS  # half-extent of the 3857 square world
DEFAULT_EXTENT = 4096
DEFAULT_BUFFER = 256


def tile_envelope(z: int, x: int, y: int) -> tuple[float, float, float, float]:
    """(xmin, ymin, xmax, ymax) in EPSG:3857 for an XYZ tile —
    ``ST_TileEnvelope(z, x, y)``."""
    size = 2.0 * WORLD / (1 << z)
    xmin = -WORLD + x * size
    ymax = WORLD - y * size
    return xmin, ymax - size, xmin + size, ymax


# ---------------------------------------------------------------------------
# Quantize (JVM-side, oracle-checkable)
# ---------------------------------------------------------------------------

def mvt_geom_df(vertices: DataFrame, z: int, x: int, y: int,
                lon_col: str = "lon", lat_col: str = "lat",
                extent: int = DEFAULT_EXTENT) -> DataFrame:
    """Append tile-local integer columns (px, py) to a vertex DataFrame.

    The quantize step of ``ST_AsMVTGeom``: spherical-mercator project,
    then linear map of the tile envelope onto [0, extent] with the y axis
    flipped (tile space is screen space, y down). Pure built-in
    expressions — no UDF — so the whole transform is one projection over
    the scan and reproducible in ANSI SQL for the oracle.
    """
    xmin, ymin, xmax, ymax = tile_envelope(z, x, y)
    size = xmax - xmin
    lat_c = F.greatest(F.lit(-WEBMERC_MAX_LAT),
                       F.least(F.col(lat_col), F.lit(WEBMERC_MAX_LAT)))
    mx = F.lit(WEBMERC_RADIUS) * F.radians(F.col(lon_col))
    my = F.lit(WEBMERC_RADIUS) * F.log(
        F.tan(F.lit(math.pi / 4) + F.radians(lat_c) / F.lit(2.0)))
    px = F.round((mx - F.lit(xmin)) / F.lit(size) * F.lit(float(extent)))
    py = F.round((F.lit(ymax) - my) / F.lit(size) * F.lit(float(extent)))
    return vertices.withColumn("px", px.cast("long")) \
                   .withColumn("py", py.cast("long"))


def _quantize_ring(ring: Sequence[Sequence[float]], z: int, x: int, y: int,
                   extent: int) -> list[tuple[int, int]]:
    xmin, ymin, xmax, ymax = tile_envelope(z, x, y)
    size = xmax - xmin
    out = []
    for lon, lat in (pt[:2] for pt in ring):
        mx, my = lonlat_to_webmercator_xy(float(lon), float(lat))
        out.append((int(round((mx - xmin) / size * extent)),
                    int(round((ymax - my) / size * extent))))
    return out


# ---------------------------------------------------------------------------
# Clip (Sutherland–Hodgman against the buffered tile square)
# ---------------------------------------------------------------------------

def clip_ring(ring: list[tuple[float, float]], lo: float, hi: float
              ) -> list[tuple[float, float]]:
    """Clip a polygon ring to the axis-aligned square [lo,hi]² in tile
    coords — the clip half of ``ST_AsMVTGeom(..., buffer, clip_geom=true)``.
    Sutherland–Hodgman: exact for convex clip windows."""
    def inside(p, edge):
        ax, side = edge
        v = p[ax]
        return v >= lo if side == 0 else v <= hi

    def intersect(a, b, edge):
        ax, side = edge
        bound = lo if side == 0 else hi
        if b[ax] == a[ax]:
            return (a[0], a[1])
        t = (bound - a[ax]) / (b[ax] - a[ax])
        return (a[0] + t * (b[0] - a[0]), a[1] + t * (b[1] - a[1]))

    pts = [p for p in ring]
    if pts and pts[0] == pts[-1]:
        pts = pts[:-1]
    for edge in ((0, 0), (0, 1), (1, 0), (1, 1)):
        if not pts:
            return []
        nxt = []
        prev = pts[-1]
        for cur in pts:
            pin, cin = inside(prev, edge), inside(cur, edge)
            if cin:
                if not pin:
                    nxt.append(intersect(prev, cur, edge))
                nxt.append(cur)
            elif pin:
                nxt.append(intersect(prev, cur, edge))
            prev = cur
        pts = nxt
    return pts


# ---------------------------------------------------------------------------
# MVT 2.1 protobuf writer (dependency-free)
# ---------------------------------------------------------------------------

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _len_field(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _varint(len(payload)) + payload


def _mvt_value(v) -> bytes:
    """Encode a vector_tile.Value message (string/int/double/bool)."""
    if isinstance(v, bool):
        return _field(7, 0) + _varint(1 if v else 0)
    if isinstance(v, int):
        return _field(6, 0) + _varint(_zigzag(v))  # sint_value
    if isinstance(v, float):
        import struct
        return _field(3, 1) + struct.pack("<d", v)  # double_value
    return _len_field(1, str(v).encode("utf-8"))


def _geometry_commands(rings: Iterable[Sequence[tuple[int, int]]]
                       ) -> list[int]:
    """MoveTo/LineTo/ClosePath command stream, cursor-relative zigzag."""
    cmds: list[int] = []
    cx = cy = 0
    for ring in rings:
        if len(ring) < 3:
            continue
        (x0, y0), rest = ring[0], ring[1:]
        cmds.append((1 << 3) | 1)  # MoveTo, count 1
        cmds += [_zigzag(x0 - cx), _zigzag(y0 - cy)]
        cx, cy = x0, y0
        cmds.append((len(rest) << 3) | 2)  # LineTo, count n
        for px, py in rest:
            cmds += [_zigzag(px - cx), _zigzag(py - cy)]
            cx, cy = px, py
        cmds.append((1 << 3) | 7)  # ClosePath
    return cmds


def encode_mvt(features: Sequence[dict], layer_name: str = "boundary_stats",
               extent: int = DEFAULT_EXTENT) -> bytes:
    """Encode features into one MVT layer (``ST_AsMVT`` equivalent).

    Each feature: ``{"id": int, "rings": [[(px,py),...],...],
    "props": {name: value}}`` with coords already in tile space.
    An empty feature list still yields a valid (empty) layer — the
    reference's empty-tile tenancy contract.
    """
    keys: list[str] = []
    vals: list = []

    def key_idx(k: str) -> int:
        try:
            return keys.index(k)
        except ValueError:
            keys.append(k)
            return len(keys) - 1

    def val_idx(v) -> int:
        for i, seen in enumerate(vals):
            if type(seen) is type(v) and seen == v:
                return i
        vals.append(v)
        return len(vals) - 1

    feats = b""
    for f in features:
        rings = [r for r in f.get("rings", ()) if len(r) >= 3]
        if not rings:
            continue
        tags: list[int] = []
        for k, v in f.get("props", {}).items():
            if v is None:
                continue
            tags += [key_idx(k), val_idx(v)]
        body = _field(1, 0) + _varint(int(f.get("id", 0)))
        body += _len_field(2, b"".join(_varint(t) for t in tags))
        body += _field(3, 0) + _varint(3)  # GeomType POLYGON
        cmds = _geometry_commands(rings)
        body += _len_field(4, b"".join(_varint(c) for c in cmds))
        feats += _len_field(2, body)

    layer = _field(15, 0) + _varint(2)  # version
    layer += _len_field(1, layer_name.encode("utf-8"))
    layer += feats
    layer += b"".join(_len_field(3, k.encode("utf-8")) for k in keys)
    layer += b"".join(_len_field(4, _mvt_value(v)) for v in vals)
    layer += _field(5, 0) + _varint(extent)
    return _len_field(3, layer)


def decode_mvt(tile: bytes) -> dict:
    """Minimal MVT reader (tests + parity checks): returns
    ``{"name", "extent", "features": [{"id", "tags", "rings"}] ,
    "keys", "values"}`` for the first layer."""
    import struct

    def rd_varint(buf, i):
        n = s = 0
        while True:
            b = buf[i]
            i += 1
            n |= (b & 0x7F) << s
            if not b & 0x80:
                return n, i
            s += 7

    def unzig(n):
        return (n >> 1) ^ -(n & 1)

    def rd_msg(buf):
        i, out = 0, []
        while i < len(buf):
            tag, i = rd_varint(buf, i)
            num, wire = tag >> 3, tag & 7
            if wire == 0:
                v, i = rd_varint(buf, i)
            elif wire == 2:
                ln, i = rd_varint(buf, i)
                v = buf[i:i + ln]
                i += ln
            elif wire == 1:
                v = struct.unpack("<d", buf[i:i + 8])[0]
                i += 8
            else:  # pragma: no cover
                raise ValueError(f"wire {wire}")
            out.append((num, v))
        return out

    layer = next(v for n, v in rd_msg(tile) if n == 3)
    res = {"name": None, "extent": DEFAULT_EXTENT, "features": [],
           "keys": [], "values": []}
    for num, v in rd_msg(layer):
        if num == 1:
            res["name"] = v.decode("utf-8")
        elif num == 5:
            res["extent"] = v
        elif num == 3:
            res["keys"].append(v.decode("utf-8"))
        elif num == 4:
            fields = rd_msg(v)
            n, val = fields[0]
            res["values"].append(
                val.decode("utf-8") if n == 1 else
                unzig(val) if n == 6 else val if n in (2, 3) else
                bool(val) if n == 7 else val)
        elif num == 2:
            feat = {"id": 0, "tags": [], "rings": []}
            for fn, fv in rd_msg(v):
                if fn == 1:
                    feat["id"] = fv
                elif fn == 2:
                    j = 0
                    while j < len(fv):
                        t, j = rd_varint(fv, j)
                        feat["tags"].append(t)
                elif fn == 4:
                    ints, j = [], 0
                    while j < len(fv):
                        c, j = rd_varint(fv, j)
                        ints.append(c)
                    cx = cy = 0
                    k, ring = 0, []
                    while k < len(ints):
                        cmd, cnt = ints[k] & 7, ints[k] >> 3
                        k += 1
                        if cmd == 1:
                            if ring:
                                feat["rings"].append(ring)
                            ring = []
                        if cmd in (1, 2):
                            for _ in range(cnt):
                                cx += unzig(ints[k])
                                cy += unzig(ints[k + 1])
                                k += 2
                                ring.append((cx, cy))
                        elif cmd == 7:
                            feat["rings"].append(ring)
                            ring = []
                    if ring:
                        feat["rings"].append(ring)
            res["features"].append(feat)
    return res


# ---------------------------------------------------------------------------
# The Martin function + bulk export
# ---------------------------------------------------------------------------

_STAT_COLS = ("mean", "min", "max", "sum", "std", "count")


def _feature(row: dict, geometry: str, z: int, x: int, y: int,
             extent: int, buffer_px: int) -> dict | None:
    geom = json.loads(geometry)
    polys = (geom["coordinates"] if geom["type"] == "MultiPolygon"
             else [geom["coordinates"]])
    rings = []
    for poly in polys:
        for ring in poly:
            q = _quantize_ring(ring, z, x, y, extent)
            clipped = clip_ring([(float(a), float(b)) for a, b in q],
                                -float(buffer_px), float(extent + buffer_px))
            ring_i = [(int(round(a)), int(round(b))) for a, b in clipped]
            dedup = [p for i, p in enumerate(ring_i)
                     if i == 0 or p != ring_i[i - 1]]
            if len(dedup) >= 3:
                rings.append(dedup)
    if not rings:
        return None
    props = {k: row[k] for k in row if k not in ("boundary_id", "geometry")
             and row[k] is not None}
    return {"id": int(row["boundary_id"]), "rings": rings, "props": props}


def boundary_stats_tile(stats: DataFrame, boundaries: Sequence[tuple],
                        z: int, x: int, y: int, *,
                        org: str | None, catalog: str | None,
                        collection: str | None, variable: str | None,
                        time: str | None, admin_level: int | None,
                        extent: int = DEFAULT_EXTENT,
                        buffer_px: int = DEFAULT_BUFFER) -> bytes:
    """One Martin tile request (``create_martin_function.py:50-180``).

    ``stats`` carries (boundary_id, level, org, catalog, collection,
    variable, time, mean..count); ``boundaries`` is the bounded dim
    [(boundary_id, level, name, geojson)]. Missing required parameters
    raise (the function's ``RAISE EXCEPTION``); a triple naming nothing
    yields a valid EMPTY tile — never an error and never a hint whether
    the organisation exists.
    """
    for pname, v in (("org", org), ("catalog", catalog),
                     ("collection", collection), ("variable", variable),
                     ("time", time), ("admin_level", admin_level)):
        if v is None or v == "":
            raise ValueError(f"{pname} query parameter is required")
    pinned = (stats
              .where((F.col("org") == org) & (F.col("catalog") == catalog)
                     & (F.col("collection") == collection)
                     & (F.col("variable") == variable)
                     & (F.col("time") == time)
                     & (F.col("level") == admin_level)))
    rows = {r["boundary_id"]: r.asDict() for r in pinned.collect()}
    feats = []
    for bid, level, name, gj in boundaries:
        if bid not in rows:
            continue
        row = dict(rows[bid])
        row.setdefault("name", name)
        f = _feature(row, gj, z, x, y, extent, buffer_px)
        if f is not None:
            feats.append(f)
    return encode_mvt(sorted(feats, key=lambda f: f["id"]),
                      extent=extent)


def covering_tiles(gj: str, zoom: int,
                   buffer_frac: float = DEFAULT_BUFFER / DEFAULT_EXTENT
                   ) -> list[tuple[int, int]]:
    """All (x, y) tiles at ``zoom`` whose *buffered* envelope intersects
    the geometry's bbox. ``buffer_frac`` is the ST_AsMVTGeom buffer as a
    fraction of the tile extent (256/4096 by default) — without it the
    bulk export would drop the edge slivers a per-tile clip keeps."""
    geom = json.loads(gj)

    def flat(c):
        if (isinstance(c, (list, tuple)) and len(c) >= 2
                and isinstance(c[0], (int, float))):
            yield c[0], c[1]
        else:
            for s in c:
                yield from flat(s)

    pts = list(flat(geom["coordinates"]))
    n = 1 << zoom

    def tf(lon, lat):
        mx, my = lonlat_to_webmercator_xy(lon, lat)
        return ((mx + WORLD) / (2 * WORLD) * n,
                (WORLD - my) / (2 * WORLD) * n)

    fx, fy = zip(*(tf(lo, la) for lo, la in pts))

    def rng(vals):
        lo = int(min(n - 1, max(0, math.floor(min(vals) - buffer_frac))))
        hi = int(min(n - 1, max(0, math.floor(max(vals) + buffer_frac))))
        return range(lo, hi + 1)

    return [(tx_, ty_) for tx_ in rng(fx) for ty_ in rng(fy)]


TILE_SCHEMA = StructType([
    StructField("z", IntegerType()), StructField("x", IntegerType()),
    StructField("y", IntegerType()), StructField("n_features", LongType()),
    StructField("tile", BinaryType()),
])


def export_tiles(stats: DataFrame, boundaries: Sequence[tuple], zoom: int,
                 *, extent: int = DEFAULT_EXTENT,
                 buffer_px: int = DEFAULT_BUFFER,
                 layer_name: str = "boundary_stats") -> DataFrame:
    """Bulk tile export: every tile at ``zoom`` that any boundary touches.

    Scale path: boundaries are a bounded broadcast dim; stats rows fan
    out only to the tiles their boundary touches (bbox cover), then ONE
    shuffle on (z,x,y) groups features per tile and a single
    ``applyInPandas`` pass clips+encodes each tile's features. At 1000
    executors each partition owns a disjoint set of tiles — no driver
    bottleneck, unlike the reference's per-request PostGIS function.
    """
    spark = stats.sparkSession
    bmap = {int(b[0]): b for b in boundaries}
    cover = [(int(bid), int(tx_), int(ty_))
             for bid, _lvl, _nm, gj in boundaries
             for tx_, ty_ in covering_tiles(gj, zoom,
                                            buffer_px / extent)]
    from georiva_spark.functions.frames import local_frame
    cover_df = local_frame(
        spark, cover, "boundary_id int, x int, y int")
    tagged = (stats.join(F.broadcast(cover_df), "boundary_id")
              .withColumn("z", F.lit(zoom)))
    b_bc = spark.sparkContext.broadcast(bmap)

    def encode(pdf):
        import pandas as pd
        z_, x_, y_ = (int(pdf["z"].iloc[0]), int(pdf["x"].iloc[0]),
                      int(pdf["y"].iloc[0]))
        feats = []
        cols = [c for c in pdf.columns if c not in ("z", "x", "y")]
        for rec in pdf[cols].to_dict("records"):
            b = b_bc.value.get(int(rec["boundary_id"]))
            if b is None:
                continue
            rec.setdefault("name", b[2])
            f = _feature(rec, b[3], z_, x_, y_, extent, buffer_px)
            if f is not None:
                feats.append(f)
        tile = encode_mvt(sorted(feats, key=lambda f: f["id"]),
                          layer_name=layer_name, extent=extent)
        return pd.DataFrame([{"z": z_, "x": x_, "y": y_,
                              "n_features": len(feats), "tile": tile}])

    return tagged.groupBy("z", "x", "y").applyInPandas(encode, TILE_SCHEMA)


MANIFEST_SCHEMA = ("z int, x int, y int, feature_id bigint, n_rings int, "
                   "n_points int, pxmin bigint, pxmax bigint, "
                   "pymin bigint, pymax bigint")


def tile_manifest(tiles: DataFrame) -> DataFrame:
    """Decode-verified per-feature manifest of an ``export_tiles`` result:
    each encoded tile's protobuf bytes are parsed BACK (decode_mvt) and
    every feature's id, ring count, vertex count, and quantized bbox are
    emitted. Proves the bytes are well-formed MVT 2.1 and exposes the
    deterministic geometry numbers an external oracle can recompute from
    the clip+quantize semantics (tile bytes themselves are
    engine-specific). Runs where the tiles live — one mapInPandas pass,
    no shuffle beyond export_tiles' own."""
    import pandas as pd

    cols = ["z", "x", "y", "feature_id", "n_rings", "n_points",
            "pxmin", "pxmax", "pymin", "pymax"]

    def gen(batches):
        for pdf in batches:
            rows = []
            for z_, x_, y_, tile in zip(pdf["z"], pdf["x"], pdf["y"],
                                        pdf["tile"]):
                dec = decode_mvt(bytes(tile))
                for ft in dec["features"]:
                    pts = [p for r in ft["rings"] for p in r]
                    if not pts:
                        continue
                    rows.append((int(z_), int(x_), int(y_), int(ft["id"]),
                                 len(ft["rings"]),
                                 sum(len(r) for r in ft["rings"]),
                                 min(p[0] for p in pts),
                                 max(p[0] for p in pts),
                                 min(p[1] for p in pts),
                                 max(p[1] for p in pts)))
            yield pd.DataFrame(rows, columns=cols)

    return tiles.mapInPandas(gen, MANIFEST_SCHEMA)
