"""Format scan + ingestion pipeline tests (S1-S7, §3.1): real NPZ reads
through binaryFile+mapInPandas, registry dispatch, window/timestamp
pushdown, path grammar, variable binding with vector transform + unit
conversion, gated GRIB/NetCDF/GeoTIFF decoders."""

import datetime as dt
import os

import numpy as np
import pytest

from georiva_spark.sources.ingestion import (
    VariableBinding, ingest_file, parse_storage_path,
)
from georiva_spark.sources.raster_formats import (
    GEOTIFF, GRIB2, NETCDF, NPZ,
)
from georiva_spark.sources.registry import DEFAULT_REGISTRY

T0 = dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc)


def _write_npz(path, arrays: dict, times, transform=(0.0, 0.0, 1.0)):
    np.savez(path, times=np.array([t.timestamp() for t in times]),
             transform=np.array(transform, dtype=float), **arrays)


@pytest.fixture()
def npz_file(tmp_path):
    # two variables, two timesteps, 2×3 grid
    t2m = np.array([[[1.0, 2.0, 3.0], [4.0, 5.0, np.nan]],
                    [[10.0, 20.0, 30.0], [40.0, 50.0, 60.0]]])
    u10 = t2m + 100.0
    p = str(tmp_path / "slice.npz")
    _write_npz(p, {"t2m": t2m, "u10": u10},
               [T0, T0 + dt.timedelta(hours=6)])
    return p


def test_npz_contract(spark, npz_file):
    assert sorted(NPZ.list_variables(spark, npz_file)) == ["t2m", "u10"]
    ts = NPZ.get_timestamps(spark, npz_file, "t2m")
    assert len(ts) == 2 and ts[0] == T0.replace(tzinfo=None)


def test_npz_open_variable_long_grid(spark, npz_file):
    df = NPZ.open_variable(spark, npz_file, "t2m")
    rows = df.collect()
    assert len(rows) == 12  # 2 timesteps × 6 pixels
    bykey = {(r.time.hour, r.y, r.x): r.value for r in rows}
    assert bykey[(0, 0, 0)] == 1.0 and bykey[(6, 1, 2)] == 60.0
    assert bykey[(0, 1, 2)] is None  # NaN → null nodata
    one = [r for r in rows if (r.y, r.x) == (0, 1)][0]
    assert one.lat == 0.5 and one.lon == 1.5  # affine pixel centers


def test_npz_window_and_timestamp_pushdown(spark, npz_file):
    # S6 window (x_off=1, y_off=0, w=2, h=1) + S5/J5 nearest-time select
    df = NPZ.open_variable(spark, npz_file, "t2m",
                           timestamp=T0.replace(tzinfo=None) + dt.timedelta(hours=2),
                           window=(1, 0, 2, 1))
    rows = df.collect()
    assert len(rows) == 2
    assert {(r.y, r.x) for r in rows} == {(0, 1), (0, 2)}
    assert all(r.time == T0.replace(tzinfo=None) for r in rows)  # hour 0 nearest to +2h


def test_registry_dispatch(tmp_path, npz_file):
    assert DEFAULT_REGISTRY.get_by_extension("x/y.grib2") is GRIB2
    assert DEFAULT_REGISTRY.get_by_extension("a.nc") is NETCDF
    assert DEFAULT_REGISTRY.get_by_extension("a.tif") is GEOTIFF
    assert DEFAULT_REGISTRY.get_for_file(npz_file) is NPZ
    # magic-byte sniff with unknown extension
    blob = tmp_path / "mystery.bin"
    blob.write_bytes(b"GRIB1234")
    assert DEFAULT_REGISTRY.get_for_file(str(blob)) is GRIB2
    assert DEFAULT_REGISTRY.get_for_file(str(tmp_path / "missing.bin")) is None


def test_unsupported_grib_edition_raises(spark, tmp_path):
    # GRIB1 (edition byte 1) is outside the native simple-packing subset
    f = tmp_path / "x.grib2"
    f.write_bytes(b"GRIB\x00\x00\x00\x01" + b"\x00" * 64)
    with pytest.raises(Exception, match="edition"):
        GRIB2.list_variables(spark, str(f))


def test_parse_storage_path():
    p = ("default/chirps/chirps-monthly/precip/2020/01/15/"
         "rainfall_GR--2020011506.npz")
    got = parse_storage_path(p)
    assert got["org"] == "default" and got["collection"] == "chirps-monthly"
    assert got["variable"] == "precip" and got["reference_time"] == "2020011506"
    assert parse_storage_path("no/grammar.npz") is None


def test_ingest_file_end_to_end(spark, tmp_path):
    # wind components → speed via binding; K→°C conversion on t2m
    root = tmp_path / "default" / "t" / "winds" / "all" / "2020" / "01" / "01"
    os.makedirs(root)
    u = np.array([[[3.0, 0.0], [0.0, 3.0]]])
    v = np.array([[[4.0, -1.0], [0.0, 4.0]]])
    t2m = np.array([[[273.15, 283.15], [293.15, 303.15]]])
    path = str(root / "w.npz")
    _write_npz(path, {"u10": u, "v10": v, "t2m": t2m}, [T0])

    bindings = [
        VariableBinding("wind_speed", "vector_magnitude",
                        {"u": "u10", "v": "v10"}),
        VariableBinding("temp_c", "passthrough", {"main": "t2m"},
                        unit_factor=1.0, unit_offset=-273.15),
    ]
    grid_dir = str(tmp_path / "grid")
    out = ingest_file(spark, path, bindings, grid_dir=grid_dir)

    g = {(r.variable, r.y, r.x): r.value for r in out["grid"].collect()}
    assert g[("wind_speed", 0, 0)] == 5.0       # hypot(3,4)
    assert g[("temp_c", 0, 0)] == 0.0           # 273.15K → 0°C
    assert g[("temp_c", 1, 1)] == 30.0

    stats = {r.variable: r for r in out["stats"].collect()}
    assert stats["temp_c"].stats_min == 0.0 and stats["temp_c"].stats_max == 30.0
    items = out["items"].collect()
    assert len(items) == 1 and items[0].height == 2 and items[0].width == 2

    # partitioned store written for pruning (collection/variable/date)
    stored = spark.read.parquet(grid_dir)
    assert stored.count() == 8
    assert any("variable=wind_speed" in p for p in
               [str(x) for x in (tmp_path / "grid").rglob("*")])


def test_extract_times_formats_and_prefix():
    """time_extraction.py contract: GR-- prefix wins for reference_time,
    stem parses per format choice, never raises on garbage."""
    import datetime as dt

    from georiva_spark.sources.ingestion import extract_times

    r = extract_times("GR--2026030100--2026030106.grib2", "YYYYMMDDHH")
    assert r["reference_time"] == dt.datetime(2026, 3, 1, 0)
    assert r["valid_time"] == dt.datetime(2026, 3, 1, 6)
    r = extract_times("path/to/20260301.tif", "YYYYMMDD")
    assert r == {"valid_time": dt.datetime(2026, 3, 1)}
    assert extract_times("garbage.tif", "YYYYMMDD") == {}
    assert extract_times("20260301.tif", "NOPE") == {}
    # DDMMYYYY is ambiguous with YYYYMMDD only by choice — the operator
    # decides (01032026 = 1 March 2026 under DDMMYYYY)
    r = extract_times("01032026.tif", "DDMMYYYY")
    assert r == {"valid_time": dt.datetime(2026, 3, 1)}


def test_filename_times_vectorized(spark):
    import datetime as dt

    from georiva_spark.sources.ingestion import filename_times

    rows = [
        (1, "GR--2026030100--2026030106.grib2", "YYYYMMDDHH"),
        (2, "20260301.tif", "YYYYMMDD"),
        (3, "x20260301.tif", "YYYYMMDD"),      # mangled → nulls
        (4, "202603011230.nc", "YYYYMMDDHHMM"),
    ]
    df = spark.createDataFrame(
        rows, "id int, filename string, format_choice string")
    got = {r.id: (r.reference_time, r.valid_time)
           for r in filename_times(df).collect()}
    assert got[1] == (dt.datetime(2026, 3, 1, 0), dt.datetime(2026, 3, 1, 6))
    assert got[2] == (None, dt.datetime(2026, 3, 1))
    assert got[3] == (None, None)
    assert got[4] == (None, dt.datetime(2026, 3, 1, 12, 30))
