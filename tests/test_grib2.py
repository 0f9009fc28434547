"""GRIB2 codec + plugin tests (S1): simple-packing round trip, bitmap
missing points, multi-message variables, scanning-mode orientation,
valid-time arithmetic, gated complex packing."""

import datetime as dt

import numpy as np
import pytest

from georiva_spark.sources.grib2_codec import (
    decode_grib2, encode_grib2_message,
)
from georiva_spark.sources.raster_formats import GRIB2

T0 = dt.datetime(2024, 3, 1, 6)


def test_roundtrip_quantization_and_bitmap():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(20, 30))
    a[3, 4] = np.nan
    buf = encode_grib2_message(a, shortname="t", ref_time=T0,
                               forecast_hours=12, la1=10.0, lo1=-5.0,
                               di=0.5, dj=0.5)
    m = decode_grib2(buf)[0]
    assert m["shortName"] == "t"
    assert m["valid_time"] == T0 + dt.timedelta(hours=12)
    assert m["values"].shape == (20, 30)
    assert np.isnan(m["values"][3, 4])
    assert np.nanmax(np.abs(m["values"] - a)) <= 2.0 ** -24 * (
        np.nanmax(a) - np.nanmin(a) + 1)
    # floor quantization is exactly reproducible
    r = np.float32(np.nanmin(a))
    want = float(r) + np.floor((a[0, 0] - float(r)) * 2.0 ** 24) * 2.0 ** -24
    assert m["values"][0, 0] == want


def test_multi_message_and_negative_coords():
    a = np.arange(6, dtype=float).reshape(2, 3)
    buf = (encode_grib2_message(a, shortname="u", ref_time=T0,
                                la1=-10.25, lo1=-120.5, di=0.25, dj=0.25)
           + encode_grib2_message(a + 1, shortname="v", ref_time=T0,
                                  la1=-10.25, lo1=-120.5, di=0.25, dj=0.25))
    msgs = decode_grib2(buf)
    assert [m["shortName"] for m in msgs] == ["u", "v"]
    assert msgs[0]["la1"] == -10.25 and msgs[0]["lo1"] == -120.5


def test_plugin_orientation_and_times(spark, tmp_path):
    """North-up message flips to the south-up grid contract; two
    forecast steps stack along time."""
    a0 = np.arange(4, dtype=float).reshape(2, 2)        # row 0 = north
    a1 = a0 + 10
    # top row center lat 1.5, res 1 → south-up rows: y=0 holds file row 1
    kw = dict(shortname="t", ref_time=T0, la1=1.5, lo1=0.5, di=1.0, dj=1.0)
    buf = (encode_grib2_message(a0, forecast_hours=0, **kw)
           + encode_grib2_message(a1, forecast_hours=6, **kw))
    fp = tmp_path / "fc.grib2"
    fp.write_bytes(buf)

    assert GRIB2.list_variables(spark, str(fp)) == ["t"]
    assert GRIB2.get_timestamps(spark, str(fp), "t") == [
        T0, T0 + dt.timedelta(hours=6)]

    rows = GRIB2.open_variable(spark, str(fp), "t").collect()
    assert len(rows) == 8
    got = {(r.time.hour, r.y, r.x): r.value for r in rows}
    assert got[(6, 1, 0)] == 0.0      # north file row → high grid y
    assert got[(6, 0, 0)] == 2.0
    assert got[(12, 0, 1)] == 13.0
    one = [r for r in rows if (r.y, r.x) == (0, 0)][0]
    assert one.lat == 0.5 and one.lon == 0.5


def test_mixed_time_axes_raise(spark, tmp_path):
    """Two variables with different forecast-step sets cannot share the
    (values, times) contract — must fail loudly, not silently drop."""
    a = np.ones((2, 2))
    kw = dict(ref_time=T0, la1=1.5, lo1=0.5, di=1.0, dj=1.0)
    buf = (encode_grib2_message(a, shortname="t", forecast_hours=0, **kw)
           + encode_grib2_message(a, shortname="u", forecast_hours=0, **kw)
           + encode_grib2_message(a, shortname="u", forecast_hours=6, **kw))
    fp = tmp_path / "mixed.grib2"
    fp.write_bytes(buf)
    with pytest.raises(Exception, match="time axis"):
        GRIB2.list_variables(spark, str(fp))


@pytest.mark.parametrize("packing,order", [(2, 0), (3, 1), (3, 2)])
def test_complex_packing_roundtrip(packing, order):
    """5.2/5.3 decode matches the 5.0 decode of the same field exactly
    (identical floor quantization, different wire encoding)."""
    rng = np.random.default_rng(packing * 10 + order)
    a = np.cumsum(rng.normal(size=(23, 31)), axis=1)   # smooth-ish field
    a[5, 7] = np.nan
    kw = dict(shortname="t", ref_time=T0, forecast_hours=6,
              la1=10.0, lo1=-5.0, di=0.5, dj=0.5)
    simple = decode_grib2(encode_grib2_message(a, **kw))[0]
    m = decode_grib2(encode_grib2_message(
        a, packing=packing, spatial_order=order, group_size=17, **kw))[0]
    assert m["shortName"] == "t"
    assert np.isnan(m["values"][5, 7])
    np.testing.assert_array_equal(m["values"], simple["values"])


def test_complex_packing_constant_and_tiny_fields():
    kw = dict(shortname="t", ref_time=T0, la1=1.5, lo1=0.5, di=1, dj=1)
    for a in (np.full((4, 5), 2.5), np.array([[1.0, 2.0]]),
              np.full((1, 1), 7.0)):
        for packing, order in ((2, 0), (3, 1), (3, 2)):
            simple = decode_grib2(encode_grib2_message(a, **kw))[0]
            m = decode_grib2(encode_grib2_message(
                a, packing=packing, spatial_order=order, **kw))[0]
            np.testing.assert_array_equal(m["values"], simple["values"])


@pytest.mark.parametrize("packing,order", [(2, 0), (3, 1), (3, 2)])
def test_complex_packing_missing_management(packing, order):
    """Octet 23 = 1 (primary missing, the NCEP precip convention): NaNs
    ride in-field (no bitmap) — all-ones raw values at group width,
    all-ones width-0 refs for wholly-missing groups; the spatially
    differenced sequence skips missing points. Values must match the
    bitmap-based encode of the same field exactly."""
    rng = np.random.default_rng(23 + packing + order)
    a = np.cumsum(rng.normal(size=(23, 31)), axis=1)
    a[5, 7] = np.nan                      # isolated missing
    a[10, :] = np.nan                     # full row → all-missing groups
    a[0, 0] = np.nan                      # missing at the sequence head
    kw = dict(shortname="t", ref_time=T0, forecast_hours=6,
              la1=10.0, lo1=-5.0, di=0.5, dj=0.5)
    via_bitmap = decode_grib2(encode_grib2_message(
        a, packing=packing, spatial_order=order, group_size=17, **kw))[0]
    m = decode_grib2(encode_grib2_message(
        a, packing=packing, spatial_order=order, group_size=17,
        missing_management=True, **kw))[0]
    assert np.isnan(m["values"][5, 7])
    assert np.isnan(m["values"][10, :]).all()
    assert np.isnan(m["values"][0, 0])
    np.testing.assert_array_equal(m["values"], via_bitmap["values"])
    # the in-field message really has no bitmap section flag set
    buf = encode_grib2_message(a, packing=packing, spatial_order=order,
                               missing_management=True, **kw)
    pos = 16
    while True:
        ln = int.from_bytes(buf[pos:pos + 4], "big")
        if buf[pos + 4] == 6:
            assert buf[pos + 5] == 255    # bitmap indicator: none
            break
        pos += ln


def test_missing_management_all_nan_and_none_nan():
    kw = dict(shortname="t", ref_time=T0, la1=1.5, lo1=0.5, di=1, dj=1)
    allnan = np.full((3, 4), np.nan)
    m = decode_grib2(encode_grib2_message(
        allnan, packing=2, missing_management=True, **kw))[0]
    assert np.isnan(m["values"]).all()
    clean = np.arange(12, dtype=float).reshape(3, 4)
    m2 = decode_grib2(encode_grib2_message(
        clean, packing=3, spatial_order=2, missing_management=True,
        **kw))[0]
    simple = decode_grib2(encode_grib2_message(clean, **kw))[0]
    np.testing.assert_array_equal(m2["values"], simple["values"])


@pytest.mark.parametrize("e_scale", [-16, -8, 0])
def test_png_packing_roundtrip(e_scale):
    """5.41 decode matches the 5.0 decode of the same field exactly —
    PNG is a lossless container for the same floor-quantized X values.
    e_scale varies the bit depth so the 8/16/24/32-bit sample ladder is
    exercised."""
    rng = np.random.default_rng(41 + e_scale)
    a = np.cumsum(rng.normal(size=(19, 27)), axis=1) * 100
    a[2, 3] = np.nan
    kw = dict(shortname="t", ref_time=T0, forecast_hours=6, e_scale=e_scale,
              la1=10.0, lo1=-5.0, di=0.5, dj=0.5)
    simple = decode_grib2(encode_grib2_message(a, **kw))[0]
    m = decode_grib2(encode_grib2_message(a, packing=41, **kw))[0]
    assert m["shortName"] == "t"
    assert np.isnan(m["values"][2, 3])
    np.testing.assert_array_equal(m["values"], simple["values"])


def test_png_packing_constant_and_tiny_fields():
    kw = dict(shortname="t", ref_time=T0, la1=1.5, lo1=0.5, di=1, dj=1)
    for a in (np.full((4, 5), 2.5), np.array([[1.0, 2.0]]),
              np.full((1, 1), 7.0)):
        simple = decode_grib2(encode_grib2_message(a, **kw))[0]
        m = decode_grib2(encode_grib2_message(a, packing=41, **kw))[0]
        np.testing.assert_array_equal(m["values"], simple["values"])


def test_png_codec_filters():
    """Decoder handles all five scanline filter types (external encoders
    pick per-row filters; ours always writes 0)."""
    import struct
    import zlib

    from georiva_spark.sources.png_codec import png_decode, png_encode

    rng = np.random.default_rng(7)
    x = rng.integers(0, 65536, size=5 * 6)
    enc = png_encode(x, 6, 5, 16)
    got, w, h = png_decode(enc)
    assert (w, h) == (6, 5)
    np.testing.assert_array_equal(got, x)

    # re-filter the raw scanlines with each filter type and re-decode
    depth_bytes = 2
    stride = 6 * depth_bytes
    rows = ((x.reshape(5, 6)[:, :, None]
             >> np.array([8, 0])[None, None, :]) & 0xFF).astype(np.uint8)
    rows = rows.reshape(5, stride).astype(np.int64)

    def refilter(ftype):
        out = bytearray()
        bpp = depth_bytes
        for r in range(5):
            cur = rows[r]
            prev = rows[r - 1] if r else np.zeros(stride, np.int64)
            if ftype == 1:    # Sub
                left = np.concatenate(([0] * bpp, cur[:-bpp]))
                f = (cur - left) & 0xFF
            elif ftype == 2:  # Up
                f = (cur - prev) & 0xFF
            elif ftype == 3:  # Average
                left = np.concatenate(([0] * bpp, cur[:-bpp]))
                f = (cur - ((left + prev) >> 1)) & 0xFF
            else:             # Paeth
                f = np.zeros(stride, np.int64)
                for i in range(stride):
                    a_ = int(cur[i - bpp]) if i >= bpp else 0
                    c_ = int(prev[i - bpp]) if i >= bpp else 0
                    b_ = int(prev[i])
                    p = a_ + b_ - c_
                    pa, pb, pc = abs(p - a_), abs(p - b_), abs(p - c_)
                    pred = a_ if pa <= pb and pa <= pc else (
                        b_ if pb <= pc else c_)
                    f[i] = (cur[i] - pred) & 0xFF
            out += bytes([ftype]) + bytes(f.astype(np.uint8))
        return bytes(out)

    for ftype in (1, 2, 3, 4):
        raw = refilter(ftype)
        ihdr = struct.pack(">IIBBBBB", 6, 5, 16, 0, 0, 0, 0)

        def chunk(tag, body):
            crc = zlib.crc32(tag + body) & 0xFFFFFFFF
            return (struct.pack(">I", len(body)) + tag + body
                    + struct.pack(">I", crc))

        png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(raw))
               + chunk(b"IEND", b""))
        got, _, _ = png_decode(png)
        np.testing.assert_array_equal(got, x, err_msg=f"filter {ftype}")


def test_product_template_48_accumulation():
    """Template 4.8 (statistically processed interval — how precip
    accumulations ship): valid time = END of the overall interval, the
    statistical process code surfaces, values decode identically."""
    a = np.arange(12, dtype=float).reshape(3, 4)
    kw = dict(shortname="tp", ref_time=T0, forecast_hours=6,
              la1=1.5, lo1=0.5, di=1.0, dj=1.0)
    m = decode_grib2(encode_grib2_message(a, accum_hours=6, **kw))[0]
    assert m["shortName"] == "tp"
    assert m["valid_time"] == T0 + dt.timedelta(hours=12)  # end of interval
    assert m["stat_process"] == 1                          # accumulation
    simple = decode_grib2(encode_grib2_message(a, **kw))[0]
    np.testing.assert_array_equal(m["values"], simple["values"])
    assert simple["stat_process"] is None
    # complex packing + 4.8 compose
    m2 = decode_grib2(encode_grib2_message(
        a, accum_hours=24, packing=3, spatial_order=1, **kw))[0]
    assert m2["valid_time"] == T0 + dt.timedelta(hours=30)
    np.testing.assert_array_equal(m2["values"], simple["values"])


def test_exotic_packing_gated():
    buf = bytearray(encode_grib2_message(np.ones((2, 2)), shortname="t",
                                         ref_time=T0, la1=1.5, lo1=0.5,
                                         di=1, dj=1))
    pos = 16
    while True:
        ln = int.from_bytes(buf[pos:pos + 4], "big")
        if buf[pos + 4] == 5:
            # 5.200 run-length packing — still legitimately gated
            buf[pos + 9:pos + 11] = (200).to_bytes(2, "big")
            break
        pos += ln
    with pytest.raises(NotImplementedError, match="5.200"):
        decode_grib2(bytes(buf))


@pytest.mark.parametrize("e_scale", [-8, -14])
def test_jpeg2000_packing_roundtrip(e_scale):
    """Template 5.40: X integers ride in a lossless JPEG 2000
    codestream (j2k_codec: MQ + EBCOT T1 + reversible 5/3); identical
    quantized values to simple packing."""
    rng = np.random.default_rng(9)
    a = rng.normal(scale=40.0, size=(30, 44)) + 273.0
    kw = dict(shortname="t", ref_time=T0, forecast_hours=6,
              la1=10.0, lo1=0.0, di=0.5, dj=0.5, e_scale=e_scale)
    mj = decode_grib2(encode_grib2_message(a, packing=40, **kw))[0]
    ms = decode_grib2(encode_grib2_message(a, **kw))[0]
    np.testing.assert_array_equal(mj["values"], ms["values"])
    assert np.nanmax(np.abs(mj["values"] - a)) <= 2.0 ** e_scale * 2


def test_jpeg2000_packing_bitmap_and_constant():
    rng = np.random.default_rng(10)
    a = rng.uniform(0, 50, (9, 13))
    a[2, 5] = np.nan
    a[7, 0] = np.nan
    kw = dict(shortname="t", ref_time=T0, la1=5.0, lo1=0.0,
              di=1.0, dj=1.0, e_scale=-10)
    m = decode_grib2(encode_grib2_message(a, packing=40, **kw))[0]
    assert np.isnan(m["values"][2, 5]) and np.isnan(m["values"][7, 0])
    ms = decode_grib2(encode_grib2_message(a, **kw))[0]
    np.testing.assert_array_equal(m["values"], ms["values"])
    # constant field → nbits 0 → empty section 7
    c = decode_grib2(encode_grib2_message(np.full((4, 6), 2.5),
                                          packing=40, **kw))[0]
    np.testing.assert_array_equal(c["values"], np.full((4, 6), 2.5))


def test_jpeg2000_on_projected_grid():
    """5.40 packing composes with the LCC grid template."""
    rng = np.random.default_rng(11)
    a = rng.uniform(250, 300, (8, 10))
    buf = encode_grib2_message(
        a, shortname="t", ref_time=T0, la1=35.0, lo1=-100.0, di=0, dj=0,
        e_scale=-10, packing=40,
        grid_def={"kind": "lcc", "lat1": 38.5, "lat2": 38.5, "lad": 38.5,
                  "lon0": -97.5, "dx": 3000.0, "dy": 3000.0})
    m = decode_grib2(buf)[0]
    assert m["grid_template"] == 30
    ms = decode_grib2(encode_grib2_message(
        a, shortname="t", ref_time=T0, la1=35.0, lo1=-100.0, di=0.1,
        dj=0.1, e_scale=-10))[0]
    np.testing.assert_array_equal(m["values"], ms["values"])


# ---------------------------------------------------------------------------
# Projected grids: templates 3.1 (rotated pole), 3.20 (polar stereo),
# 3.30 (Lambert conformal) — reference reads these via eccodes
# (formats/grib.py:61-144); here the closed-form spherical inverses in
# functions/geo.py reconstruct per-pixel lat/lon.
# ---------------------------------------------------------------------------

def _micro(v):
    return np.floor(np.asarray(v) * 1e6 + 0.5) / 1e6


def test_lcc_grid_template_roundtrip():
    from georiva_spark.functions.geo import (
        lcc_sphere_inverse_np, lcc_sphere_np,
    )
    from georiva_spark.sources.grib2_codec import grid_latlon_mesh

    rng = np.random.default_rng(11)
    a = rng.uniform(250, 300, (5, 7))
    buf = encode_grib2_message(
        a, shortname="t", ref_time=T0, forecast_hours=6,
        la1=35.0, lo1=-100.0, di=0, dj=0,
        grid_def={"kind": "lcc", "lat1": 38.5, "lat2": 38.5, "lad": 38.5,
                  "lon0": -97.5, "dx": 3000.0, "dy": 3000.0})
    m = decode_grib2(buf)[0]
    assert m["grid_template"] == 30
    assert m["proj"]["kind"] == "lcc"
    assert m["proj"]["radius"] == 6371229.0
    lat2d, lon2d = grid_latlon_mesh(m)
    # first grid point round-trips exactly (la1/lo1 are micro-degree coords)
    assert (lat2d[0, 0], lon2d[0, 0]) == (35.0, -100.0)
    # an interior point matches the direct forward+offset+inverse path
    x1, y1 = lcc_sphere_np(35.0, -100.0, 38.5, 38.5, 38.5, -97.5)
    la, lo = lcc_sphere_inverse_np(float(x1) + 3 * 3000.0,
                                   float(y1) - 2 * 3000.0,  # scan 0: -j
                                   38.5, 38.5, 38.5, -97.5)
    assert lat2d[2, 3] == _micro(la) and lon2d[2, 3] == _micro(lo)
    # far-corner metadata comes from the same inverse
    la2, lo2 = lcc_sphere_inverse_np(float(x1) + 6 * 3000.0,
                                     float(y1) - 4 * 3000.0,
                                     38.5, 38.5, 38.5, -97.5)
    assert abs(m["la2"] - float(la2)) < 1e-12
    assert abs(m["lo2"] - float(lo2)) < 1e-12


def test_polar_stereo_grid_template_south_pole_flag():
    from georiva_spark.sources.grib2_codec import grid_latlon_mesh

    a = np.ones((4, 4))
    for south, la1 in ((False, 60.0), (True, -60.0)):
        buf = encode_grib2_message(
            a, shortname="t", ref_time=T0, la1=la1, lo1=10.0,
            di=0, dj=0, south_up=True,
            grid_def={"kind": "ps", "lat_ts": la1, "lon0": -45.0,
                      "south": south, "dx": 25000.0, "dy": 25000.0})
        m = decode_grib2(buf)[0]
        assert m["grid_template"] == 20
        assert m["proj"]["south"] is south
        lat2d, lon2d = grid_latlon_mesh(m)
        assert (lat2d[0, 0], lon2d[0, 0]) == (la1, 10.0)
        # moving away from the pole of projection lowers |lat|
        assert abs(lat2d[-1, -1]) < abs(la1)


def test_rotated_pole_grid_template():
    from georiva_spark.functions.geo import (
        lonlat_to_rotated_pole_np, rotated_pole_to_lonlat_np,
    )
    from georiva_spark.sources.grib2_codec import grid_latlon_mesh

    a = np.zeros((3, 5))
    buf = encode_grib2_message(
        a, shortname="t", ref_time=T0, la1=-1.0, lo1=-2.0,
        di=0.5, dj=0.5, south_up=True,
        grid_def={"kind": "rotated", "sp_lat": -40.0, "sp_lon": 10.0,
                  "angle": 0.0})
    m = decode_grib2(buf)[0]
    assert m["grid_template"] == 1
    assert m["proj"] == {"kind": "rotated", "sp_lat": -40.0,
                         "sp_lon": 10.0, "angle": 0.0}
    lat2d, lon2d = grid_latlon_mesh(m)
    la, lo = rotated_pole_to_lonlat_np(-1.0 + 0.5 * 2, -2.0 + 0.5 * 4,
                                       -40.0, 10.0)
    assert lat2d[2, 4] == _micro(la) and lon2d[2, 4] == _micro(lo)
    # unrotating back recovers the rotated grid coordinate
    lr, lor = lonlat_to_rotated_pole_np(la, lo, -40.0, 10.0)
    assert abs(lr - 0.0) < 1e-9 and abs(lor - 0.0) < 1e-9


def test_rotated_pole_invariants():
    from georiva_spark.functions.geo import rotated_pole_to_lonlat_np

    # identity rotation: south pole at the true south pole
    la, lo = rotated_pole_to_lonlat_np(12.5, 34.5, -90.0, 0.0)
    assert abs(la - 12.5) < 1e-9 and abs(lo - 34.5) < 1e-9
    # the rotated south pole maps to the configured pole position
    la, lo = rotated_pole_to_lonlat_np(-90.0, 0.0, -35.0, -10.0)
    assert abs(la - (-35.0)) < 1e-9 and abs(lo - (-10.0)) < 1e-9
    # grid origin maps 90° north of the pole along its meridian
    la, lo = rotated_pole_to_lonlat_np(0.0, 0.0, -35.0, -10.0)
    assert abs(la - 55.0) < 1e-9 and abs(lo - (-10.0)) < 1e-9


def test_lcc_plugin_grid_contract(spark, tmp_path):
    """LCC message through the Spark scan: row 0 = smallest projected y,
    per-pixel lat/lon from the inverse projection, window pushdown."""
    rng = np.random.default_rng(5)
    a = rng.uniform(0, 10, (4, 6))
    a[1, 2] = np.nan
    buf = encode_grib2_message(
        a, shortname="t", ref_time=T0, forecast_hours=3,
        la1=44.0, lo1=5.0, di=0, dj=0,
        grid_def={"kind": "lcc", "lat1": 46.0, "lat2": 46.0, "lad": 46.0,
                  "lon0": 8.0, "dx": 10000.0, "dy": 10000.0})
    fp = tmp_path / "lcc.grib2"
    fp.write_bytes(buf)
    df = GRIB2.open_variable(spark, str(fp), "t")
    rows = {(r.y, r.x): r for r in df.collect()}
    assert len(rows) == 24
    # scan mode 0 (north→south): storage row 0 = la1 → lands at y=3
    assert (rows[(3, 0)].lat, rows[(3, 0)].lon) == (44.0, 5.0)
    assert rows[(3, 0)].value == pytest.approx(a[0, 0], abs=1e-6)
    assert rows[(2, 2)].value is None                   # NaN → null
    # y increases with projected y: northern rows have larger lat at x=0
    assert rows[(3, 0)].lat > rows[(0, 0)].lat
    # window slices coords and values together
    sub = {(r.y, r.x): r for r in GRIB2.open_variable(
        spark, str(fp), "t", window=(1, 1, 2, 2)).collect()}
    assert set(sub) == {(1, 1), (1, 2), (2, 1), (2, 2)}
    for k, r in sub.items():
        assert (r.lat, r.lon) == (rows[k].lat, rows[k].lon)
        if rows[k].value is None:
            assert r.value is None
        else:
            assert r.value == rows[k].value


def test_ellipsoidal_earth_shape_gated():
    buf = bytearray(encode_grib2_message(
        np.ones((2, 2)), shortname="t", ref_time=T0, la1=60.0, lo1=0.0,
        di=0, dj=0,
        grid_def={"kind": "ps", "lat_ts": 60.0, "lon0": 0.0,
                  "south": False, "dx": 1000.0, "dy": 1000.0}))
    pos = 16
    while True:
        ln = int.from_bytes(buf[pos:pos + 4], "big")
        if buf[pos + 4] == 3:
            buf[pos + 14] = 4        # IAG-GRS80 ellipsoid → gated
            break
        pos += ln
    with pytest.raises(NotImplementedError, match="earth shape"):
        decode_grib2(bytes(buf))


def test_gaussian_grid_template():
    """Template 3.40: latitudes are the arcsin roots of P_2N, matched
    from the la1/la2 anchors; longitudes stay affine."""
    from georiva_spark.sources.grib2_codec import (
        gaussian_latitudes, grid_latlon_mesh,
    )

    n = 8                                   # F8 grid: 16 parallels
    lats = gaussian_latitudes(n)
    assert lats.shape == (16,)
    assert lats[0] > 0 and np.all(np.diff(lats) < 0)
    assert np.allclose(lats, -lats[::-1])   # symmetric about the equator
    # N=1: roots of P_2 at ±1/sqrt(3) → ±33.5573...
    l1 = gaussian_latitudes(1)
    assert abs(l1[0] - np.degrees(np.arcsin(1 / np.sqrt(3)))) < 1e-9

    a = np.arange(16 * 9, dtype=float).reshape(16, 9)
    buf = encode_grib2_message(
        a, shortname="t", ref_time=T0, la1=0.0, lo1=0.0, di=2.0, dj=0,
        grid_def={"kind": "gaussian", "n": n})
    m = decode_grib2(buf)[0]
    assert m["grid_template"] == 40
    assert m["proj"] == {"kind": "gaussian", "n": n}
    lat2d, lon2d = grid_latlon_mesh(m)
    micro = np.floor(lats * 1e6 + 0.5) / 1e6
    np.testing.assert_array_equal(lat2d[:, 0], micro)   # row 0 = north
    assert lon2d[0].tolist() == [0.0, 2.0, 4.0, 6.0, 8.0,
                                 10.0, 12.0, 14.0, 16.0]


def test_gaussian_grid_plugin_contract(spark, tmp_path):
    from georiva_spark.sources.grib2_codec import gaussian_latitudes

    n = 4
    a = np.arange(8 * 5, dtype=float).reshape(8, 5)
    buf = encode_grib2_message(
        a, shortname="t", ref_time=T0, la1=0.0, lo1=10.0, di=1.0, dj=0,
        grid_def={"kind": "gaussian", "n": n})
    fp = tmp_path / "gauss.grib2"
    fp.write_bytes(buf)
    rows = {(r.y, r.x): r for r in
            GRIB2.open_variable(spark, str(fp), "t").collect()}
    lats = gaussian_latitudes(n)
    micro = np.floor(lats * 1e6 + 0.5) / 1e6
    # south-up contract: y=0 is the southernmost Gaussian parallel
    assert rows[(0, 0)].lat == micro[-1]
    assert rows[(7, 0)].lat == micro[0]
    assert rows[(7, 2)].value == a[0, 2]    # storage row 0 = north
    assert rows[(0, 0)].lon == 10.0


def test_reduced_gaussian_truncated_list_raises():
    buf = bytearray(encode_grib2_message(
        np.ones((2, 2)), shortname="t", ref_time=T0, la1=0.0, lo1=0.0,
        di=1.0, dj=0, grid_def={"kind": "gaussian", "n": 1}))
    pos = 16
    while True:
        ln = int.from_bytes(buf[pos:pos + 4], "big")
        if buf[pos + 4] == 3:
            buf[pos + 10] = 2      # claims a point list it doesn't carry
            break
        pos += ln
    with pytest.raises(ValueError, match="point-count list truncated"):
        decode_grib2(bytes(buf))


def test_reduced_gaussian_roundtrip_and_mesh():
    """Template 3.40 with the octet-11 per-parallel list (ERA5 native):
    ragged rows decode into a NaN-padded rectangle, per-row longitudes
    run at 360/Ni, parallels come from the shared Gaussian table."""
    from georiva_spark.sources.grib2_codec import (
        gaussian_latitudes, grid_latlon_mesh,
    )

    n = 4
    row_ni = [4, 8, 12, 16, 16, 12, 8, 4]
    rng = np.random.default_rng(0)
    a = np.full((8, 16), np.nan)
    for j, nr in enumerate(row_ni):
        a[j, :nr] = np.round(rng.uniform(250, 300, nr), 2)
    a[1, 2] = np.nan                         # bitmap missing, real cell
    buf = encode_grib2_message(
        a, shortname="t", ref_time=T0, la1=0.0, lo1=0.0, di=1.0, dj=0,
        grid_def={"kind": "gaussian_reduced", "n": n, "row_ni": row_ni})
    m = decode_grib2(buf)[0]
    assert m["grid_template"] == 40
    assert m["proj"]["kind"] == "gaussian_reduced"
    assert m["proj"]["row_ni"] == row_ni
    v = m["values"]
    assert v.shape == (8, 16)
    for j, nr in enumerate(row_ni):
        assert np.isnan(v[j, nr:]).all()     # pad
        exp = a[j, :nr]
        got = v[j, :nr]
        assert (np.isnan(exp) == np.isnan(got)).all()
        ok = np.isfinite(exp)
        assert np.abs(exp[ok] - got[ok]).max() < 2.0 ** -24 + 1e-12
    lat2d, lon2d = grid_latlon_mesh(m)
    micro = np.floor(gaussian_latitudes(n) * 1e6 + 0.5) / 1e6
    for j, nr in enumerate(row_ni):
        assert np.isnan(lat2d[j, nr:]).all() and np.isnan(lon2d[j, nr:]).all()
        assert lat2d[j, 0] == micro[j]       # row 0 = north
        step = 360.0 / nr
        exp_lon = np.arange(nr) * step
        exp_lon = ((exp_lon + 180.0) % 360.0) - 180.0
        np.testing.assert_allclose(lon2d[j, :nr],
                                   np.floor(exp_lon * 1e6 + 0.5) / 1e6)


def test_reduced_gaussian_plugin_drops_pad_cells(spark, tmp_path):
    """The long grid table holds exactly sum(Ni) pixels — pad cells
    never become rows; bitmap-missing pixels DO (as nulls)."""
    n = 2
    row_ni = [6, 8, 8, 6]
    a = np.full((4, 8), np.nan)
    for j, nr in enumerate(row_ni):
        a[j, :nr] = float(j * 100) + np.arange(nr)
    a[0, 1] = np.nan                         # real missing pixel
    buf = encode_grib2_message(
        a, shortname="t", ref_time=T0, la1=0.0, lo1=0.0, di=1.0, dj=0,
        grid_def={"kind": "gaussian_reduced", "n": n, "row_ni": row_ni})
    fp = tmp_path / "red.grib2"
    fp.write_bytes(buf)
    rows = {(r.y, r.x): r for r in
            GRIB2.open_variable(spark, str(fp), "t").collect()}
    assert len(rows) == sum(row_ni)
    # south-up contract: y=0 holds storage row 3 (6 points)
    assert {x for (y, x) in rows if y == 0} == set(range(6))
    assert {x for (y, x) in rows if y == 2} == set(range(8))
    assert rows[(3, 1)].value is None        # bitmap missing kept
    assert rows[(3, 2)].value == 2.0
    assert rows[(0, 0)].value == 300.0
    assert rows[(2, 3)].lon == 3 * 360.0 / 8
    assert rows[(2, 4)].lon == -180.0        # 180° wraps to the west edge


def test_derived_templates_4_2_and_4_12(spark, tmp_path):
    """Templates 4.2/4.12 (GEFS ensemble mean/spread): the derivation
    code surfaces as a :mean/:spread variable suffix; 4.12 keeps the
    interval-end valid time."""
    a = np.arange(6, dtype=float).reshape(2, 3)
    kw = dict(shortname="t", ref_time=T0, forecast_hours=6,
              la1=1.5, lo1=0.5, di=1.0, dj=1.0)
    buf = (encode_grib2_message(a, derived_code=0, ens_size=31, **kw)
           + encode_grib2_message(a * 0.1, derived_code=4, ens_size=31,
                                  **kw))
    msgs = decode_grib2(buf)
    assert [m["derived_code"] for m in msgs] == [0, 4]
    assert msgs[0]["ens_size"] == 31
    assert msgs[0]["ens_member"] is None
    assert msgs[0]["valid_time"] == T0 + dt.timedelta(hours=6)
    fp = tmp_path / "drv.grib2"
    fp.write_bytes(buf)
    assert GRIB2.list_variables(spark, str(fp)) == ["t:mean", "t:spread"]
    rows = {(r.variable, r.y, r.x): r.value
            for r in GRIB2.open_variable(spark, str(fp), "t:spread")
            .collect()}
    assert rows[("t:spread", 1, 2)] == pytest.approx(0.2)
    # 4.12: derived + statistically processed interval
    buf12 = encode_grib2_message(a, derived_code=0, ens_size=31,
                                 accum_hours=24, **kw)
    m12 = decode_grib2(buf12)[0]
    assert m12["derived_code"] == 0
    assert m12["stat_process"] == 1
    assert m12["valid_time"] == T0 + dt.timedelta(hours=30)
    with pytest.raises(ValueError, match="not.*both|either"):
        encode_grib2_message(a, derived_code=0, ens_member=1, **kw)


def test_ensemble_templates_4_1_and_4_11(spark, tmp_path):
    """Templates 4.1/4.11: ensemble octets surface as ens_* fields and
    each member becomes a selectable shortName:pNN variable."""
    a = np.arange(6, dtype=float).reshape(2, 3)
    kw = dict(shortname="t", ref_time=T0, forecast_hours=6,
              la1=1.5, lo1=0.5, di=1.0, dj=1.0)
    buf = (encode_grib2_message(a, ens_member=0, ens_size=20, **kw)
           + encode_grib2_message(a + 5, ens_member=1, ens_size=20, **kw))
    msgs = decode_grib2(buf)
    assert [m["ens_member"] for m in msgs] == [0, 1]
    assert msgs[0]["ens_size"] == 20 and msgs[0]["ens_type"] == 3
    assert msgs[0]["valid_time"] == T0 + dt.timedelta(hours=6)
    base = decode_grib2(encode_grib2_message(a, **kw))[0]
    np.testing.assert_array_equal(msgs[0]["values"], base["values"])

    fp = tmp_path / "ens.grib2"
    fp.write_bytes(buf)
    assert GRIB2.list_variables(spark, str(fp)) == ["t:p0", "t:p1"]
    rows = GRIB2.open_variable(spark, str(fp), "t:p1").collect()
    assert {r.value for r in rows} == set((a + 5).ravel())

    # 4.11 = ensemble + accumulation interval
    m11 = decode_grib2(encode_grib2_message(
        a, ens_member=4, ens_size=10, accum_hours=12, **kw))[0]
    assert m11["ens_member"] == 4
    assert m11["valid_time"] == T0 + dt.timedelta(hours=18)
    assert m11["stat_process"] == 1      # accumulation
    np.testing.assert_array_equal(m11["values"], base["values"])


def test_missing_management_reserves_marker_in_finite_groups():
    """Regression: a fully-finite group with span 2^k-1 must not decode
    its maximum as a missing point — the all-ones marker is reserved in
    every group when octet 23 != 0."""
    a = np.array([[0.0, 1.0, 2.0, 3.0], [10.0, 11.0, 12.0, 13.0]])
    kw = dict(shortname="t", ref_time=T0, la1=1.5, lo1=0.5, di=1.0,
              dj=1.0, e_scale=0)
    for packing, order in ((2, 0), (3, 1), (3, 2)):
        m = decode_grib2(encode_grib2_message(
            a, packing=packing, spatial_order=order, group_size=4,
            missing_management=True, **kw))[0]
        np.testing.assert_array_equal(m["values"], a)


def test_mercator_grid_template(spark, tmp_path):
    """Template 3.10: Di/Dj are meters at the true-scale latitude; the
    mesh is separable (lat varies by row, lon by column)."""
    from georiva_spark.functions.geo import (
        mercator_sphere_inverse_np, mercator_sphere_np,
    )
    from georiva_spark.sources.grib2_codec import grid_latlon_mesh

    a = np.arange(12, dtype=float).reshape(3, 4)
    buf = encode_grib2_message(
        a, shortname="t", ref_time=T0, la1=10.0, lo1=100.0, di=0, dj=0,
        south_up=True,
        grid_def={"kind": "mercator", "lat_ts": 20.0,
                  "dx": 50000.0, "dy": 50000.0})
    m = decode_grib2(buf)[0]
    assert m["grid_template"] == 10
    assert m["proj"]["kind"] == "mercator"
    lat2d, lon2d = grid_latlon_mesh(m)
    assert (lat2d[0, 0], lon2d[0, 0]) == (10.0, 100.0)
    # mesh is separable: lon constant down a column, lat along a row
    assert np.all(lon2d[0] == lon2d[-1])
    assert np.all(lat2d[:, 0] == lat2d[:, -1])
    x1, y1 = mercator_sphere_np(10.0, 100.0, 20.0)
    la, lo = mercator_sphere_inverse_np(float(x1) + 2 * 50000.0,
                                        float(y1) + 1 * 50000.0, 20.0)
    micro = lambda v: np.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731
    assert lat2d[1, 2] == micro(la) and lon2d[1, 2] == micro(lo)
    fp = tmp_path / "merc.grib2"
    fp.write_bytes(buf)
    rows = {(r.y, r.x): r for r in
            GRIB2.open_variable(spark, str(fp), "t").collect()}
    assert rows[(0, 0)].lat == 10.0 and rows[(0, 0)].value == a[0, 0]
    assert rows[(2, 3)].lat > rows[(0, 3)].lat


@pytest.mark.parametrize("e_scale", [-16, -8, 0])
def test_aec_packing_roundtrip(e_scale):
    """5.42 (CCSDS/AEC) decode matches the 5.0 decode of the same field
    exactly — AEC is a lossless container for the same floor-quantized
    X values; e_scale varies the dynamic range so different Rice option
    mixes are exercised."""
    rng = np.random.default_rng(42 + e_scale)
    a = np.cumsum(rng.normal(size=(19, 27)), axis=1) * 100
    a[2, 3] = np.nan
    kw = dict(shortname="t", ref_time=T0, forecast_hours=6,
              e_scale=e_scale, la1=10.0, lo1=-5.0, di=0.5, dj=0.5)
    simple = decode_grib2(encode_grib2_message(a, **kw))[0]
    m = decode_grib2(encode_grib2_message(a, packing=42, **kw))[0]
    assert m["shortName"] == "t"
    assert np.isnan(m["values"][2, 3])
    np.testing.assert_array_equal(m["values"], simple["values"])


def test_aec_packing_constant_and_tiny_fields():
    kw = dict(shortname="t", ref_time=T0, la1=1.5, lo1=0.5, di=1, dj=1)
    for a in (np.full((4, 5), 2.5), np.array([[1.0, 2.0]]),
              np.full((1, 1), 7.0)):
        simple = decode_grib2(encode_grib2_message(a, **kw))[0]
        m = decode_grib2(encode_grib2_message(a, packing=42, **kw))[0]
        np.testing.assert_array_equal(m["values"], simple["values"])


def test_aec_codec_options_and_gates():
    """The coder hits every CCSDS option (zero-run incl. ROS decode,
    second extension, k-split ladder, uncompressed) and gates the
    unsupported libaec modes by name."""
    from georiva_spark.sources.aec_codec import aec_decode, aec_encode

    rng = np.random.default_rng(5)
    # hand-built ROS vector: nbits 8 (idlen 3), J=8, no preprocess —
    # one uncompressed block of 1s, then ID0+'0' + FS(4)=ROS to the end
    # of the 64-block segment (63 blocks), total 64*8 samples
    bits = "111" + "".join(f"{1:08b}" for _ in range(8))   # uncompressed
    bits += "000" + "0" + "00001"                          # zero + ROS
    pad = (-len(bits)) % 8
    data = int(bits + "0" * pad, 2).to_bytes((len(bits) + pad) // 8, "big")
    out = aec_decode(data, 64 * 8, 8, block_size=8, preprocess=False)
    assert out[:8].tolist() == [1] * 8 and not out[8:].any()

    # second extension chosen for tiny paired values
    x = np.tile([0, 1], 512).astype(np.int64)
    enc = aec_encode(x, 16, preprocess=False)
    assert np.array_equal(
        aec_decode(enc, len(x), 16, preprocess=False), x)
    assert len(enc) < len(x) * 2 // 4      # far below raw

    # every e_scale/k mix round-trips at odd sizes and tiny RSIs
    for n in (1, 31, 257, 1000):
        x = rng.integers(0, 1 << 12, n)
        enc = aec_encode(x, 12, block_size=16, rsi=2)
        assert np.array_equal(
            aec_decode(enc, n, 12, block_size=16, rsi=2), x)

    # named gates for libaec modes we don't speak
    from georiva_spark.sources.grib2_codec import (decode_grib2,
                                                   encode_grib2_message)
    msg = bytearray(encode_grib2_message(
        np.ones((4, 4)), shortname="t", ref_time=T0, la1=1.5, lo1=0.5,
        di=1, dj=1, packing=42))
    # find section 5 and poke the flags octet (21 bytes into s5 body)
    pos = 16
    while True:
        ln = int.from_bytes(msg[pos:pos + 4], "big")
        if msg[pos + 4] == 5:
            break
        pos += ln
    flag_off = pos + 21
    for bad, name in ((0x01 | 0x04, "SIGNED"), (0x02 | 0x04, "3BYTE"),
                      (0x10 | 0x04, "RESTRICTED"),
                      (0x20 | 0x04, "PAD_RSI"), (0x00, "LSB")):
        msg[flag_off] = bad
        with pytest.raises(NotImplementedError, match=name):
            decode_grib2(bytes(msg))


def test_probability_templates_4_5_and_4_9():
    """Probability-forecast products (NCEP PQPF / ECMWF EPS): 4.5
    point-in-time and 4.9 over-an-interval round-trip the probability
    block (number/total/type, scaled lower/upper limits) and decode the
    same values as the plain 4.0/4.8 encodings."""
    a = np.cumsum(np.ones((3, 4)), axis=1)
    kw = dict(shortname="tp", ref_time=T0, forecast_hours=6,
              la1=1.5, lo1=0.5, di=1, dj=1)
    plain = decode_grib2(encode_grib2_message(a, **kw))[0]
    m = decode_grib2(encode_grib2_message(
        a, probability={"num": 2, "total": 10, "type": 1,
                        "lower": 0.0, "upper": 25.4}, **kw))[0]
    assert (m["prob_num"], m["prob_type"]) == (2, 1)
    assert m["prob_upper"] == pytest.approx(25.4)
    assert m["valid_time"] == plain["valid_time"]
    np.testing.assert_array_equal(m["values"], plain["values"])
    # plain messages carry no probability metadata
    assert plain["prob_type"] is None and plain["prob_lower"] is None
    m9 = decode_grib2(encode_grib2_message(
        a, accum_hours=6, probability={"type": 3, "lower": 1.0},
        **kw))[0]
    assert m9["prob_type"] == 3 and m9["prob_lower"] == pytest.approx(1.0)
    assert m9["valid_time"] == T0 + dt.timedelta(hours=12)
    with pytest.raises(ValueError, match="either"):
        encode_grib2_message(a, ens_member=1,
                             probability={"type": 0}, **kw)


def test_probability_members_are_selectable_variables(spark, tmp_path):
    """Two probability thresholds of the same parameter in one file
    surface as distinct variables (tp:prob0, tp:prob1) with the shared
    time-axis contract intact."""
    a = np.arange(4, dtype=float).reshape(2, 2)
    kw = dict(shortname="tp", ref_time=T0, la1=1.5, lo1=0.5, di=1, dj=1)
    buf = (encode_grib2_message(
               a, probability={"num": 0, "total": 2, "type": 1,
                               "upper": 1.0}, **kw)
           + encode_grib2_message(
               a * 2, probability={"num": 1, "total": 2, "type": 1,
                                   "upper": 5.0}, **kw))
    fp = tmp_path / "prob.grib2"
    fp.write_bytes(buf)
    assert GRIB2.list_variables(spark, str(fp)) == ["tp:prob0",
                                                    "tp:prob1"]
    rows = {(r.y, r.x): r.value for r in
            GRIB2.open_variable(spark, str(fp), "tp:prob1").collect()}
    assert rows[(0, 0)] == 4.0            # north-up flip: file row 1
