"""NetCDF classic codec + plugin tests (S2): dependency-free CDF-1
decode, CF conventions (_FillValue, scale/offset, time units), latitude
orientation, windowed read through the shared seam."""

import datetime as dt

import numpy as np
import pytest

from georiva_spark.sources.netcdf_codec import (
    cf_decode_times, cf_decode_values, decode_netcdf, encode_grid_netcdf,
    encode_netcdf,
)
from georiva_spark.sources.raster_formats import NETCDF

T0 = dt.datetime(2020, 1, 1)


def test_codec_roundtrip_and_fill():
    t2m = np.array([[[1., 2., 3.], [4., 5., -9.]],
                    [[10., 20., 30.], [40., 50., 60.]]], dtype=np.float32)
    buf = encode_grid_netcdf({"t2m": t2m}, [T0, T0 + dt.timedelta(hours=6)],
                             lat=np.array([0.5, 1.5]),
                             lon=np.array([0.5, 1.5, 2.5]), fill_value=-9.0)
    d = decode_netcdf(buf)
    assert [n for n, _ in d["dims"]] == ["time", "lat", "lon"]
    vals = cf_decode_values(d["variables"]["t2m"])
    assert np.isnan(vals[0, 1, 2]) and vals[1, 2 - 1, 2] == 60.0
    assert cf_decode_times(d["variables"]["time"]) == [
        T0, T0 + dt.timedelta(hours=6)]


def test_codec_packed_scale_offset():
    packed = np.array([[0, 100], [200, -32768]], dtype=np.int16)
    buf = encode_netcdf(
        {"p": packed}, [("y", 2), ("x", 2)], {"p": ("y", "x")},
        {"p": {"_FillValue": np.int16(-32768),
               "scale_factor": np.float64(0.1),
               "add_offset": np.float64(5.0)}})
    out = cf_decode_values(decode_netcdf(buf)["variables"]["p"])
    np.testing.assert_allclose(out[0], [5.0, 15.0])
    assert out[1, 0] == 25.0 and np.isnan(out[1, 1])


def test_record_dimension_unlimited_time():
    """Real-world files use an UNLIMITED (record) time dimension: data
    interleaves per record. Hand-build a 2-record CDF-1 file and decode."""
    import struct

    from georiva_spark.sources.netcdf_codec import _w_atts, _w_name

    time_vals = [6.0, 12.0]
    v_rows = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], dtype=">f4")

    hdr = b"CDF\x01" + struct.pack(">I", 2)              # numrecs = 2
    hdr += struct.pack(">II", 0x0A, 2)                   # dims
    hdr += _w_name("time") + struct.pack(">I", 0)        # record dim
    hdr += _w_name("x") + struct.pack(">I", 3)
    hdr += struct.pack(">II", 0, 0)                      # no global atts
    vhdr = struct.pack(">II", 0x0B, 2)
    # var time: record scalar, f8, vsize 8
    tvar = (_w_name("time") + struct.pack(">II", 1, 0)
            + _w_atts({"units": "hours since 2020-01-01"})
            + struct.pack(">III", 6, 8, 0))
    # var v: (time, x) f4, vsize 12
    vvar = (_w_name("v") + struct.pack(">III", 2, 0, 1)
            + _w_atts({}) + struct.pack(">III", 5, 12, 0))
    # place begins: header length first (two-pass like the writer)
    hlen = len(hdr) + len(vhdr) + len(tvar) + len(vvar)
    tvar = tvar[:-8] + struct.pack(">II", 8, hlen)
    vvar = vvar[:-8] + struct.pack(">II", 12, hlen + 8)
    data = b""
    for rec in range(2):
        data += struct.pack(">d", time_vals[rec]) + v_rows[rec].tobytes()
    buf = hdr + vhdr + tvar + vvar + data

    d = decode_netcdf(buf)
    assert d["numrecs"] == 2
    assert cf_decode_times(d["variables"]["time"]) == [
        dt.datetime(2020, 1, 1, 6), dt.datetime(2020, 1, 1, 12)]
    out = d["variables"]["v"]["data"]
    assert out.shape == (2, 3)
    np.testing.assert_array_equal(out, v_rows.astype("=f4"))


def test_time_unit_variants():
    for units, expect in [
        ("days since 2020-01-01", T0 + dt.timedelta(days=2)),
        ("hours since 2020-01-01 00:00:00", T0 + dt.timedelta(hours=2)),
        ("minutes since 2020-01-01T00:00Z", T0 + dt.timedelta(minutes=2)),
    ]:
        var = {"data": np.array([2.0]), "atts": {"units": units}}
        assert cf_decode_times(var) == [expect]
    with pytest.raises(ValueError, match="unsupported time unit"):
        cf_decode_times({"data": np.array([1.0]),
                         "atts": {"units": "fortnights since 2020-01-01"}})


def test_netcdf_open_variable_flip_and_window(spark, tmp_path):
    """Descending-latitude (north-up) file must flip to the south-up grid
    contract; S6 window applies inside the decoder."""
    # file row 0 = north (lat 3.5): values 0..3; row 3 = south: 12..15
    a = np.arange(16, dtype=np.float32).reshape(4, 4)
    lat_desc = np.array([3.5, 2.5, 1.5, 0.5])
    lon = np.array([0.5, 1.5, 2.5, 3.5])
    buf = encode_grid_netcdf({"v": a[None]}, [T0], lat_desc, lon)
    fp = tmp_path / "north_up.nc"
    fp.write_bytes(buf)

    assert NETCDF.list_variables(spark, str(fp)) == ["v"]
    assert NETCDF.get_timestamps(spark, str(fp), "v") == [T0]

    rows = NETCDF.open_variable(spark, str(fp), "v").collect()
    got = {(r.y, r.x): r.value for r in rows}
    assert got[(0, 0)] == 12.0 and got[(3, 3)] == 3.0  # flipped
    one = {(r.y, r.x): (r.lat, r.lon) for r in rows}
    assert one[(0, 0)] == (0.5, 0.5)

    win = NETCDF.open_variable(spark, str(fp), "v",
                               window=(1, 0, 2, 2)).collect()
    gw = {(r.y, r.x): r.value for r in win}
    assert len(gw) == 4
    assert gw[(0, 1)] == 13.0 and gw[(1, 2)] == 10.0


def test_netcdf_rectangular_grid(spark, tmp_path):
    """Independent lat/lon spacings (0.5° × 1.0°) must both be honored
    (the 4-tuple transform; round-2 review finding)."""
    a = np.arange(6, dtype=np.float32).reshape(1, 2, 3)
    buf = encode_grid_netcdf({"v": a}, [T0],
                             lat=np.array([0.25, 0.75]),      # dy=0.5
                             lon=np.array([0.5, 1.5, 2.5]))   # dx=1.0
    fp = tmp_path / "rect.nc"
    fp.write_bytes(buf)
    rows = NETCDF.open_variable(spark, str(fp), "v").collect()
    got = {(r.y, r.x): (r.lat, r.lon) for r in rows}
    assert got[(0, 0)] == (0.25, 0.5)
    assert got[(1, 2)] == (0.75, 2.5)


def test_netcdf4_still_gated(spark, tmp_path):
    f = tmp_path / "x.nc4"
    f.write_bytes(b"\x89HDF\r\n\x1a\n" + b"\0" * 64)
    with pytest.raises(Exception, match="h5netcdf|NotImplemented"):
        NETCDF.list_variables(spark, str(f))
