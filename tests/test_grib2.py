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


def test_jpeg_packing_gated():
    buf = bytearray(encode_grib2_message(np.ones((2, 2)), shortname="t",
                                         ref_time=T0, la1=1.5, lo1=0.5,
                                         di=1, dj=1))
    pos = 16
    while True:
        ln = int.from_bytes(buf[pos:pos + 4], "big")
        if buf[pos + 4] == 5:
            buf[pos + 9:pos + 11] = (40).to_bytes(2, "big")
            break
        pos += ln
    with pytest.raises(NotImplementedError, match="5.40"):
        decode_grib2(bytes(buf))
