"""Raster format scans (SURVEY.md §2.1 S1-S7) as distributed Spark reads.

Shared shape for every format: `spark.read.format("binaryFile")` lists and
ships file bytes to executors; a `mapInPandas` decoder turns each file into
long-format grid rows (GRID_SCHEMA). That single pattern subsumes the
reference's per-file open_variable / chunked extraction / windowed read
(formats/base.py:102-141, ingestion/handlers/asset_handler.py:175-196):
Spark partitions files across executors, and the window predicate is
applied inside the decoder before rows are emitted (S6 pushdown).

The container lacks cfgrib/xarray/rasterio, so the GRIB2/NetCDF/GeoTIFF
decoders are import-gated: the Spark plumbing (schemas, binaryFile scan,
decoder signature, window slicing, affine math) is identical to the real
path and is exercised end-to-end by the NPZ grid format, which needs only
numpy. Plugging a real decoder in is a one-function change.
"""

from __future__ import annotations

import datetime as dt
import io
import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from georiva_spark.schemas import GRID_SCHEMA
from georiva_spark.sources.registry import register_default

_GRID_COLS = [f.name for f in GRID_SCHEMA.fields]


def _emit_rows(values: np.ndarray, times: list, variable: str,
               transform: tuple[float, float, float], *,
               org: str = "default", catalog: str = "t", collection: str = "c",
               window: tuple[int, int, int, int] | None = None,
               timestamp=None) -> pd.DataFrame:
    """(T,H,W) float array → long grid rows; NaN→null; optional spatial
    window (x_off, y_off, w, h) and single-timestamp selection applied
    *before* explosion (S5/S6 pushdown).

    transform = (lat0, lon0, res): pixel center lat = lat0 + res*(y+0.5)
    with y=0 the southernmost row (north-up files are flipped by the
    decoder, mirroring the reference's south-up detect, netcdf.py:160-184).
    """
    lat0, lon0, res = transform
    arr = np.asarray(values, dtype=np.float64)
    if arr.ndim == 2:
        arr = arr[None]
    tsel = range(len(times))
    if timestamp is not None:
        # nearest-time select at extraction (J5; netcdf.py:130-134)
        diffs = [abs((t - timestamp).total_seconds()) for t in times]
        tsel = [int(np.argmin(diffs))]
    frames = []
    for ti in tsel:
        a = arr[ti]
        h, w = a.shape
        if window is not None:
            x0, y0, ww, wh = window
            a = a[y0:y0 + wh, x0:x0 + ww]
        else:
            x0, y0 = 0, 0
        hh, ww = a.shape
        yy, xx = np.mgrid[0:hh, 0:ww]
        yy = yy + y0
        xx = xx + x0
        vals = a.ravel()
        frames.append(pd.DataFrame({
            "org": org, "catalog": catalog, "collection": collection,
            "variable": variable, "time": times[ti], "reference_time": None,
            "y": yy.ravel().astype("int64"), "x": xx.ravel().astype("int64"),
            "lat": lat0 + res * (yy.ravel() + 0.5),
            "lon": lon0 + res * (xx.ravel() + 0.5),
            "value": np.where(np.isnan(vals), None, vals),
        }))
    out = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
        columns=_GRID_COLS)
    return out[_GRID_COLS]


def _binary_scan(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.format("binaryFile").load(path)


class _BaseFilePlugin:
    """Common binaryFile → mapInPandas plumbing; subclasses provide
    ``_decode(content) -> (values(T,H,W), times, transform, variables)``."""

    name = "base"
    extensions: tuple[str, ...] = ()
    magic_bytes: tuple[bytes, ...] = ()

    def can_handle(self, path: str, head: bytes | None = None) -> bool:
        ext = path.lower().rsplit(".", 1)[-1]
        if ext in self.extensions:
            return True
        return head is not None and any(head.startswith(m)
                                        for m in self.magic_bytes)

    # -- decode seam ------------------------------------------------------
    def _decode(self, content: bytes):
        raise NotImplementedError

    def _decode_variable(self, content: bytes, variable: str):
        values, times, transform, variables = self._decode(content)
        if variable not in variables:
            raise KeyError(f"{variable!r} not in {variables}")
        return values[variables.index(variable)], times, transform

    # -- contract ---------------------------------------------------------
    def list_variables(self, spark: SparkSession, path: str) -> list[str]:
        row = _binary_scan(spark, path).select("content").head()
        return list(self._decode(row.content)[3])

    def get_timestamps(self, spark: SparkSession, path: str,
                       variable: str) -> list:
        row = _binary_scan(spark, path).select("content").head()
        return list(self._decode(row.content)[1])

    def open_variable(self, spark: SparkSession, path: str, variable: str,
                      *, timestamp=None, window=None,
                      collection: str = "c") -> DataFrame:
        decode = self._decode_variable

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                for _, r in pdf.iterrows():
                    values, times, transform = decode(r["content"], variable)
                    yield _emit_rows(values, times, variable, transform,
                                     collection=collection,
                                     window=window, timestamp=timestamp)

        return (_binary_scan(spark, path).select("content")
                .mapInPandas(gen, schema=GRID_SCHEMA))


class NpzGridPlugin(_BaseFilePlugin):
    """Real, dependency-free grid format for the container: a .npz with
    ``values`` (T,H,W) or dict-of-variable arrays, ``times`` (epoch
    seconds), ``transform`` [lat0, lon0, res]. Exercises the exact
    binaryFile+mapInPandas path the GRIB/NetCDF/GeoTIFF plugins use."""

    name = "npz-grid"
    extensions = ("npz",)
    magic_bytes = (b"PK",)

    def _decode(self, content: bytes):
        z = np.load(io.BytesIO(content), allow_pickle=False)
        times = [dt.datetime.fromtimestamp(float(s), dt.timezone.utc)
                 .replace(tzinfo=None) for s in z["times"]]
        transform = tuple(float(v) for v in z["transform"])
        variables = [k for k in z.files if k not in ("times", "transform")]
        values = [z[k] for k in variables]
        return values, times, transform, variables


class Grib2Plugin(_BaseFilePlugin):
    """S1 — GRIB2 scan keyed (shortName, typeOfLevel, level)
    (formats/grib.py:61-144). Decoder requires cfgrib/eccodes."""

    name = "grib2"
    extensions = ("grib", "grib2", "grb", "grb2")
    magic_bytes = (b"GRIB",)

    def _decode(self, content: bytes):
        try:
            import cfgrib  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "GRIB2 decoding needs cfgrib/eccodes (not in this container); "
                "the Spark scan plumbing is shared with NpzGridPlugin") from e
        raise NotImplementedError("cfgrib decode path not wired yet")


class NetCDFPlugin(_BaseFilePlugin):
    """S2 — NetCDF scan with nearest-time select, window slice, fill→NaN,
    south-up flip (formats/netcdf.py:33-184). Needs xarray/h5netcdf."""

    name = "netcdf"
    extensions = ("nc", "nc4", "cdf")
    magic_bytes = (b"CDF", b"\x89HDF")

    def _decode(self, content: bytes):
        try:
            import xarray  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "NetCDF decoding needs xarray/h5netcdf (not in this "
                "container); Spark plumbing shared with NpzGridPlugin") from e
        raise NotImplementedError("xarray decode path not wired yet")


class GeoTIFFPlugin(_BaseFilePlugin):
    """S3 — band-indexed GeoTIFF read, timestamp from filename
    (formats/geotiff.py:37-360). Needs rasterio."""

    name = "geotiff"
    extensions = ("tif", "tiff", "gtiff")
    magic_bytes = (b"II*\x00", b"MM\x00*")

    def _decode(self, content: bytes):
        try:
            import rasterio  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "GeoTIFF decoding needs rasterio (not in this container); "
                "Spark plumbing shared with NpzGridPlugin") from e
        raise NotImplementedError("rasterio decode path not wired yet")


NPZ = register_default(NpzGridPlugin())
GRIB2 = register_default(Grib2Plugin())
NETCDF = register_default(NetCDFPlugin())
GEOTIFF = register_default(GeoTIFFPlugin())
