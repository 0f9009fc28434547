"""GeoTIFF codec + plugin tests (S3): dependency-free decode of the
envelope the reference COG writer emits (deflate, predictor 2/3, strips
and tiles — ingestion/asset_writer.py:86-99,213-235), band_N variables,
filename timestamps, nodata→NaN, north-up flip."""

import datetime as dt

import numpy as np
import pytest

from georiva_spark.sources.raster_formats import GEOTIFF
from georiva_spark.sources.tiff_codec import decode_tiff, encode_geotiff


@pytest.mark.parametrize("dtype,pred", [
    (np.float32, 3), (np.float64, 3), (np.int16, 2),
    (np.uint8, 2), (np.int32, 2), (np.float32, 1),
])
def test_codec_roundtrip_strips(dtype, pred):
    rng = np.random.default_rng(1)
    if np.issubdtype(dtype, np.floating):
        a = rng.normal(size=(37, 53)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        a = rng.integers(info.min, info.max, size=(37, 53)).astype(dtype)
    buf = encode_geotiff(a, pixel_scale=(0.1, 0.1), tiepoint_xy=(-10.0, 3.7),
                         predictor=pred, rows_per_strip=10)
    bands, nodata, geo, flip = decode_tiff(buf)
    assert np.array_equal(bands[0], a)
    assert geo == (0.1, 0.1, -10.0, 3.7) and flip


def test_codec_roundtrip_tiles_and_uncompressed():
    rng = np.random.default_rng(2)
    a = rng.integers(-500, 500, size=(100, 75)).astype(np.int16)
    buf = encode_geotiff(a, pixel_scale=(0.5, 0.5), tiepoint_xy=(0.0, 50.0),
                         tile=(32, 32))
    bands, _, _, _ = decode_tiff(buf)
    assert np.array_equal(bands[0], a)
    f = rng.normal(size=(20, 20)).astype(np.float32)
    raw = encode_geotiff(f, pixel_scale=(1, 1), tiepoint_xy=(0, 20),
                         compression="none", predictor=1)
    assert np.array_equal(decode_tiff(raw)[0][0], f)


def test_lzw_stream_codec():
    """TIFF LZW at the byte level: round trips crossing every width
    transition (9→10→11→12) and the 4094-entry table reset; early-change
    decode (width grows once entry 510/1022/2046 exists)."""
    from georiva_spark.sources.tiff_codec import lzw_decode, lzw_encode
    rng = np.random.default_rng(7)
    for n in (0, 1, 300, 3000, 20000, 80000):
        d = rng.integers(0, 256, n).astype(np.uint8).tobytes()
        assert lzw_decode(lzw_encode(d)) == d
    runs = b"A" * 500 + b"B" * 500 + bytes(range(256)) * 40
    assert lzw_decode(lzw_encode(runs)) == runs
    assert len(lzw_encode(runs)) < len(runs)        # actually compresses


def test_packbits_stream_codec():
    from georiva_spark.sources.tiff_codec import (
        packbits_decode, packbits_encode,
    )
    rng = np.random.default_rng(8)
    cases = [b"", b"x", b"\x00" * 300, bytes(rng.integers(0, 256, 999)
                                             .astype(np.uint8)),
             b"ab" + b"c" * 130 + b"de"]
    for d in cases:
        assert packbits_decode(packbits_encode(d)) == d
    # spec example: literal/run mix decodes correctly
    assert packbits_decode(bytes([254, 0xAA, 2, 0x80, 0x00, 0x2A])) == \
        bytes([0xAA, 0xAA, 0xAA, 0x80, 0x00, 0x2A])


@pytest.mark.parametrize("compression", ["lzw", "packbits"])
@pytest.mark.parametrize("pred", [1, 2])
def test_codec_roundtrip_lzw_packbits(compression, pred):
    rng = np.random.default_rng(11)
    a = rng.integers(-500, 500, size=(41, 37)).astype(np.int16)
    buf = encode_geotiff(a, pixel_scale=(0.1, 0.1), tiepoint_xy=(-1.0, 4.1),
                         compression=compression, predictor=pred,
                         rows_per_strip=9)
    bands, _, geo, _ = decode_tiff(buf)
    assert np.array_equal(bands[0], a)
    f = rng.normal(size=(30, 30)).astype(np.float32)
    buf2 = encode_geotiff(f, pixel_scale=(1, 1), tiepoint_xy=(0, 30),
                          compression=compression,
                          predictor=3 if compression == "lzw" else 1)
    assert np.array_equal(decode_tiff(buf2)[0][0], f)


def test_bigtiff_roundtrip_and_header():
    """BigTIFF (version 43, 20-byte IFD entries, 64-bit offsets): the
    layout COGs over 4 GB require. Round trip + header invariants."""
    rng = np.random.default_rng(43)
    a = rng.normal(size=(33, 29)).astype(np.float32)
    buf = encode_geotiff(a, pixel_scale=(0.25, 0.25),
                         tiepoint_xy=(-3.0, 8.25), bigtiff=True,
                         rows_per_strip=8)
    import struct
    assert buf[:2] == b"II"
    assert struct.unpack_from("<H", buf, 2)[0] == 43
    assert struct.unpack_from("<HH", buf, 4) == (8, 0)
    bands, _, geo, flip = decode_tiff(buf)
    assert np.array_equal(bands[0], a)
    assert geo == (0.25, 0.25, -3.0, 8.25) and flip
    # tiled + lzw variant
    b2 = encode_geotiff(a, pixel_scale=(1, 1), tiepoint_xy=(0, 33),
                        bigtiff=True, tile=(16, 16), compression="lzw",
                        predictor=3)
    assert np.array_equal(decode_tiff(b2)[0][0], a)


def test_codec_multiband_chunky(spark, tmp_path):
    """3-band chunky int16 with horizontal predictor (per-channel
    differencing) round-trips, and the plugin exposes band_1..band_3."""
    rng = np.random.default_rng(7)
    a = rng.integers(-500, 500, size=(9, 11, 3)).astype(np.int16)
    buf = encode_geotiff(a, pixel_scale=(1.0, 1.0), tiepoint_xy=(0.0, 9.0))
    bands, _, _, _ = decode_tiff(buf)
    assert bands.shape == (3, 9, 11)
    for b in range(3):
        assert np.array_equal(bands[b], a[:, :, b])
    fp = tmp_path / "rgb_20240101.tif"
    fp.write_bytes(buf)
    assert GEOTIFF.list_variables(spark, str(fp)) == [
        "band_1", "band_2", "band_3"]
    rows = GEOTIFF.open_variable(spark, str(fp), "band_2").collect()
    got = {(r.y, r.x): r.value for r in rows}
    # south-up grid y=0 = file row 8
    assert got[(0, 0)] == float(a[8, 0, 1])
    assert got[(8, 10)] == float(a[0, 10, 1])


def test_filename_timestamp_patterns():
    p = GEOTIFF._parse_timestamp_from_filename
    assert p("x_2024-01-15T06:30:00.tif") == dt.datetime(2024, 1, 15, 6, 30)
    assert p("rain_2024-01-15.tif") == dt.datetime(2024, 1, 15)
    assert p("rain_20240115_0630.tif") == dt.datetime(2024, 1, 15, 6, 30)
    assert p("rain_20240115063000.tif") == dt.datetime(2024, 1, 15, 6, 30)
    assert p("rain_20240115.tif") == dt.datetime(2024, 1, 15)
    assert p("nodate.tif") is None


def test_geotiff_open_variable_grid(spark, tmp_path):
    """North-up file: top row must land at the highest grid y; nodata →
    null; lat/lon at pixel centers; timestamp from filename."""
    a = np.array([[1.0, 2.0], [3.0, -9.0]], dtype=np.float32)  # -9 nodata
    buf = encode_geotiff(a, pixel_scale=(0.5, 0.5), tiepoint_xy=(10.0, 21.0),
                         nodata=-9.0)
    fp = tmp_path / "t2m_20240115.tif"
    fp.write_bytes(buf)

    assert GEOTIFF.list_variables(spark, str(fp)) == ["band_1"]
    assert GEOTIFF.get_timestamps(spark, str(fp), "band_1") == [
        dt.datetime(2024, 1, 15)]

    rows = GEOTIFF.open_variable(spark, str(fp), "band_1").collect()
    assert len(rows) == 4
    bykey = {(r.y, r.x): r.value for r in rows}
    # file row 0 (top, lat 20.75 center) → grid y=1; file row 1 → y=0
    assert bykey[(1, 0)] == 1.0 and bykey[(1, 1)] == 2.0
    assert bykey[(0, 0)] == 3.0
    assert bykey[(0, 1)] is None  # nodata
    one = {(r.y, r.x): (r.lat, r.lon) for r in rows}
    assert one[(0, 0)] == (20.25, 10.25)
    assert one[(1, 1)] == (20.75, 10.75)
    t = rows[0].time
    assert (t.year, t.month, t.day) == (2024, 1, 15)


def test_geotiff_rectangular_pixels(spark, tmp_path):
    """sx != sy must produce independent lon/lat spacings (the 4-tuple
    transform contract; round-2 review finding)."""
    a = np.arange(6, dtype=np.float32).reshape(2, 3)
    buf = encode_geotiff(a, pixel_scale=(1.0, 0.5),   # dx=1, dy=0.5
                         tiepoint_xy=(10.0, 21.0))
    fp = tmp_path / "rect_20240101.tif"
    fp.write_bytes(buf)
    rows = GEOTIFF.open_variable(spark, str(fp), "band_1").collect()
    got = {(r.y, r.x): (r.lat, r.lon) for r in rows}
    # lat spacing 0.5 (south edge 20.0), lon spacing 1.0 (west edge 10.0)
    assert got[(0, 0)] == (20.25, 10.5)
    assert got[(1, 2)] == (20.75, 12.5)


def test_geotiff_no_georeferencing_identity_grid(spark, tmp_path):
    """Missing ModelPixelScale/Tiepoint falls back to an identity
    south-up pixel grid: lat spans (0, h), no spurious flip."""
    from georiva_spark.sources import tiff_codec as tc
    a = np.array([[1.0, 2.0], [3.0, 4.0]], dtype=np.float32)
    buf = tc.encode_geotiff(a, pixel_scale=(1, 1), tiepoint_xy=(0, 2))
    # strip the geo tags by re-encoding without them: rebuild via decode
    # of a raw-tag-filtered buffer is overkill — craft with the private
    # writer path instead: drop the two geo entries from the IFD.
    import struct
    bo, n = "<", struct.unpack_from("<H", buf, 8)[0]
    keep = []
    for i in range(n):
        e = 10 + i * 12
        tag = struct.unpack_from("<H", buf, e)[0]
        if tag not in (tc.MODEL_PIXEL_SCALE, tc.MODEL_TIEPOINT):
            keep.append(buf[e:e + 12])
    out = bytearray(buf)
    out[8:10] = struct.pack("<H", len(keep))
    pos = 10
    for entry in keep:
        out[pos:pos + 12] = entry
        pos += 12
    out[pos:pos + 4] = struct.pack("<I", 0)
    fp = tmp_path / "nogeo_20240101.tif"
    fp.write_bytes(bytes(out))
    rows = GEOTIFF.open_variable(spark, str(fp), "band_1").collect()
    got = {(r.y, r.x): (r.lat, r.value) for r in rows}
    assert got[(0, 0)] == (0.5, 1.0)   # unflipped identity grid
    assert got[(1, 1)] == (1.5, 4.0)


def test_geotiff_windowed_read(spark, tmp_path):
    """S6 pushdown through the shared seam: window applies inside the
    decoder, in south-up grid coordinates."""
    a = np.arange(16, dtype=np.float32).reshape(4, 4)
    buf = encode_geotiff(a, pixel_scale=(1.0, 1.0), tiepoint_xy=(0.0, 4.0))
    fp = tmp_path / "w_20240101.tif"
    fp.write_bytes(buf)
    df = GEOTIFF.open_variable(spark, str(fp), "band_1",
                               window=(1, 0, 2, 2))  # x 1-2, y 0-1
    rows = df.collect()
    assert len(rows) == 4
    got = {(r.y, r.x): r.value for r in rows}
    # south-up grid y=0 is file row 3 (values 12..15), y=1 is row 2
    assert got[(0, 1)] == 13.0 and got[(0, 2)] == 14.0
    assert got[(1, 1)] == 9.0 and got[(1, 2)] == 10.0
