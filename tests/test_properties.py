"""Property-based tests (hypothesis) — beyond the reference's test strategy
(SURVEY §5 notes it has none): invariants of the geometry, hashing, and
float-semantics kernels that golden tests can't sweep."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from georiva_spark.functions.geo import (
    affine_index, parse_geojson, points_in_geometry,
)
from georiva_spark.functions.units import UNITS, conversion
from georiva_spark.plans.recipe import canonical_json, input_hash, unit_hash
from georiva_spark.sources import grib2_codec, netcdf_codec, tiff_codec

# -- geometry ---------------------------------------------------------------

boxes = st.tuples(st.floats(-50, 50), st.floats(-50, 50),
                  st.floats(0.5, 40), st.floats(0.5, 40))


@given(boxes, st.floats(-60, 60), st.floats(-60, 60))
@settings(max_examples=200, deadline=None)
def test_box_containment_matches_interval_test(box, px, py):
    x0, y0, w, h = box
    x1, y1 = x0 + w, y0 + h
    # %.17g: full double precision — %f would truncate tiny coordinates
    # and test a different polygon than the interval check uses
    geo = parse_geojson(
        '{"type": "Polygon", "coordinates": [[[%.17g, %.17g], [%.17g, %.17g], '
        '[%.17g, %.17g], [%.17g, %.17g], [%.17g, %.17g]]]}'
        % (x0, y0, x1, y0, x1, y1, x0, y1, x0, y0))
    inside = points_in_geometry(np.array([px]), np.array([py]), geo)[0]
    # away from the boundary the even-odd test must equal the interval test
    eps = 1e-9
    if (abs(px - x0) > eps and abs(px - x1) > eps
            and abs(py - y0) > eps and abs(py - y1) > eps):
        want = (x0 < px < x1) and (y0 < py < y1)
        assert inside == want


@given(st.floats(-89, 89), st.floats(-179, 179),
       st.sampled_from([0.05, 0.1, 0.25, 0.5, 1.0, 2.0]))
@settings(max_examples=200, deadline=None)
def test_affine_index_returns_nearest_center(lat, lon, res):
    lat0, lon0 = -90.0, -180.0
    y, x = affine_index(lat0, lon0, res, lat, lon)
    cy = lat0 + res * (y + 0.5)
    cx = lon0 + res * (x + 0.5)
    # the chosen pixel center is within half a cell of the query point
    assert abs(cy - lat) <= res / 2 + 1e-9
    assert abs(cx - lon) <= res / 2 + 1e-9


# -- hashing ----------------------------------------------------------------

unit_dicts = st.dictionaries(
    st.text(min_size=1, max_size=8),
    st.one_of(st.integers(-10**6, 10**6), st.text(max_size=12),
              st.lists(st.integers(0, 99), max_size=4)),
    max_size=6)


@given(unit_dicts)
@settings(max_examples=100, deadline=None)
def test_unit_hash_is_key_order_invariant(d):
    items = list(d.items())
    d2 = dict(reversed(items))
    assert unit_hash(d) == unit_hash(d2)
    assert canonical_json(d) == canonical_json(d2)


@given(st.lists(st.text(min_size=1, max_size=16), min_size=1, max_size=8),
       st.text(min_size=1, max_size=4))
@settings(max_examples=100, deadline=None)
def test_input_hash_order_invariant_but_version_sensitive(checksums, ver):
    a = input_hash(checksums, ver)
    b = input_hash(list(reversed(checksums)), ver)
    assert a == b
    assert input_hash(checksums, ver + "x") != a


# -- units ------------------------------------------------------------------

@given(st.sampled_from(sorted(UNITS)), st.floats(-1e6, 1e6))
@settings(max_examples=200, deadline=None)
def test_unit_roundtrip_identity(unit, value):
    peers = [u for u, d in UNITS.items()
             if d.dimension == UNITS[unit].dimension]
    for other in peers:
        f1, o1 = conversion(unit, other)
        f2, o2 = conversion(other, unit)
        back = (value * f1 + o1) * f2 + o2
        assert math.isclose(back, value, rel_tol=1e-9, abs_tol=1e-6)


# -- raster codecs ----------------------------------------------------------

_shapes = st.tuples(st.integers(1, 40), st.integers(1, 40))


@given(_shapes, st.sampled_from(["f4", "f8", "i2", "i4", "u1"]),
       st.integers(0, 3), st.booleans())
@settings(max_examples=60, deadline=None)
def test_tiff_roundtrip_any_shape_dtype_layout(shape, dtype, seed, tiled):
    rng = np.random.default_rng(seed)
    dt_ = np.dtype(dtype)
    if dt_.kind == "f":
        a = rng.normal(size=shape).astype(dt_)
    else:
        info = np.iinfo(dt_)
        a = rng.integers(info.min, info.max, size=shape).astype(dt_)
    buf = tiff_codec.encode_geotiff(
        a, pixel_scale=(0.5, 0.5), tiepoint_xy=(1.0, 2.0),
        tile=(16, 16) if tiled else None,
        rows_per_strip=None if tiled else 7)
    bands, _, geo, flip = tiff_codec.decode_tiff(buf)
    assert np.array_equal(bands[0], a)
    assert geo == (0.5, 0.5, 1.0, 2.0) and flip


@given(_shapes, st.integers(1, 4), st.integers(0, 3))
@settings(max_examples=40, deadline=None)
def test_netcdf_roundtrip_any_shape(shape, t, seed):
    import datetime as dt
    rng = np.random.default_rng(seed)
    h, w = shape
    a = rng.normal(size=(t, h, w)).astype(np.float32)
    times = [dt.datetime(2020, 1, 1) + dt.timedelta(hours=i)
             for i in range(t)]
    buf = netcdf_codec.encode_grid_netcdf(
        {"v": a}, times, lat=np.arange(h) + 0.5, lon=np.arange(w) + 0.5)
    d = netcdf_codec.decode_netcdf(buf)
    out = netcdf_codec.cf_decode_values(d["variables"]["v"])
    assert np.array_equal(out.astype(np.float32), a)
    assert netcdf_codec.cf_decode_times(d["variables"]["time"]) == times


@given(_shapes, st.integers(0, 3), st.booleans())
@settings(max_examples=40, deadline=None)
def test_grib2_quantization_bound_and_georef(shape, seed, south_up):
    import datetime as dt
    rng = np.random.default_rng(seed)
    a = rng.normal(size=shape) * 100
    buf = grib2_codec.encode_grib2_message(
        a, shortname="t", ref_time=dt.datetime(2024, 1, 1),
        la1=12.25, lo1=-33.5, di=0.25, dj=0.25, south_up=south_up)
    m = grib2_codec.decode_grib2(buf)[0]
    assert m["values"].shape == shape
    assert m["south_up"] == south_up
    assert m["la1"] == 12.25 and m["lo1"] == -33.5
    # quantization error bounded by one step of 2^-24 × value scale
    assert np.max(np.abs(m["values"] - a)) <= 2.0 ** -24 * (
        np.max(a) - np.min(a) + 1)


# -- JPEG 2000 / projections (round-3 codecs) -------------------------------

@given(st.integers(1, 120), st.integers(1, 120), st.integers(1, 20),
       st.integers(0, 2 ** 31))
@settings(max_examples=30, deadline=None)
def test_j2k_roundtrip_any_shape_depth(w, h, depth, seed):
    from georiva_spark.sources.j2k_codec import j2k_decode, j2k_encode
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 1 << depth, (h, w))
    assert np.array_equal(j2k_decode(j2k_encode(a, depth)), a)


@given(st.integers(0, 2 ** 31), st.sampled_from([1, 2, 3, 5]))
@settings(max_examples=30, deadline=None)
def test_dwt53_perfect_reconstruction(seed, levels):
    from georiva_spark.sources.j2k_codec import (
        dwt53_forward, dwt53_inverse,
    )
    rng = np.random.default_rng(seed)
    shape = (int(rng.integers(1, 200)), int(rng.integers(1, 200)))
    a = rng.integers(-(1 << 20), 1 << 20, shape)
    ll, det = dwt53_forward(a, levels)
    assert np.array_equal(dwt53_inverse(ll, det), a)


@given(st.floats(-85, 85), st.floats(-180, 179.999),
       st.floats(20, 60), st.floats(-150, 150))
@settings(max_examples=200, deadline=None)
def test_lcc_inverse_of_forward(lat, lon, lat1, lon0):
    from georiva_spark.functions.geo import (
        lcc_sphere_inverse_np, lcc_sphere_np,
    )
    # stay away from the opposite cone pole where LCC is undefined
    if abs(lat - (-np.sign(lat1 if lat1 else 1) * 90)) < 10:
        return
    x, y = lcc_sphere_np(lat, lon, lat1, lat1, lat1, lon0)
    la, lo = lcc_sphere_inverse_np(x, y, lat1, lat1, lat1, lon0)
    assert abs(float(la) - lat) < 1e-8
    dlon = (float(lo) - lon + 180.0) % 360.0 - 180.0
    assert abs(dlon) < 1e-8


@given(st.floats(-89.9, 89.9), st.floats(-180, 179.999),
       st.floats(-89, 89), st.floats(-180, 180),
       st.floats(-45, 45))
@settings(max_examples=200, deadline=None)
def test_rotated_pole_inverse_of_forward(lat, lon, sp_lat, sp_lon, angle):
    from georiva_spark.functions.geo import (
        lonlat_to_rotated_pole_np, rotated_pole_to_lonlat_np,
    )
    lr, lor = lonlat_to_rotated_pole_np(lat, lon, sp_lat, sp_lon, angle)
    la, lo = rotated_pole_to_lonlat_np(lr, lor, sp_lat, sp_lon, angle)
    # angle extraction is ill-conditioned near the rotated frame's poles
    # (arcsin derivative blows up); the well-conditioned invariant is the
    # 3-D chord between the two unit vectors — arcsin near ±1 loses half
    # the mantissa (√ε ≈ 1.5e-8), so bound at 5e-7 (≈3 m on Earth)
    def vec(pla, plo):
        pla, plo = math.radians(pla), math.radians(plo)
        return np.array([math.cos(pla) * math.cos(plo),
                         math.cos(pla) * math.sin(plo), math.sin(pla)])
    assert np.linalg.norm(vec(lat, lon) - vec(float(la), float(lo))) < 5e-7


# -- r4 codecs ---------------------------------------------------------------

@given(st.integers(0, 2**32 - 1), st.integers(1, 2000),
       st.sampled_from([1, 2, 8, 12, 16, 24, 32]),
       st.sampled_from([(8, 4), (16, 16), (32, 128), (64, 8)]),
       st.booleans(), st.sampled_from(["rand", "smooth", "zero", "const"]))
@settings(max_examples=60, deadline=None)
def test_aec_roundtrip_property(seed, n, nbits, jr, pre, shape):
    from georiva_spark.sources.aec_codec import aec_decode, aec_encode
    rng = np.random.default_rng(seed)
    hi = (1 << nbits) - 1
    if shape == "rand":
        x = rng.integers(0, hi + 1, n)
    elif shape == "smooth":
        x = np.clip(hi // 2 + np.cumsum(rng.integers(-2, 3, n)), 0, hi)
    elif shape == "zero":
        x = np.zeros(n, np.int64)
    else:
        x = np.full(n, min(7, hi), np.int64)
    J, R = jr
    enc = aec_encode(x, nbits, block_size=J, rsi=R, preprocess=pre)
    dec = aec_decode(enc, n, nbits, block_size=J, rsi=R, preprocess=pre)
    np.testing.assert_array_equal(dec, x)


@given(st.integers(0, 2**32 - 1), st.integers(0, 30000),
       st.sampled_from(["rand", "runs", "text"]))
@settings(max_examples=40, deadline=None)
def test_blosclz_roundtrip_property(seed, n, shape):
    from georiva_spark.sources.blosc_codec import (blosclz_compress,
                                                   blosclz_decompress)
    rng = np.random.default_rng(seed)
    if shape == "rand":
        raw = bytes(rng.integers(0, 256, n, dtype=np.uint8))
    elif shape == "runs":
        raw = b"".join(bytes([int(b)]) * int(r) for b, r in
                       zip(rng.integers(0, 4, 50),
                           rng.integers(1, max(2, n // 25), 50)))[:n]
    else:
        raw = bytes(rng.choice(list(b"abcde fgh "), n))
    assert blosclz_decompress(blosclz_compress(raw), len(raw)) == raw


@given(st.integers(0, 2**32 - 1), st.sampled_from([1, 2, 4, 8, 16]),
       st.integers(0, 5000))
@settings(max_examples=40, deadline=None)
def test_bitshuffle_involution_property(seed, ts, nel):
    from georiva_spark.sources.blosc_codec import (_bit_shuffle,
                                                   _bit_unshuffle)
    rng = np.random.default_rng(seed)
    raw = bytes(rng.integers(0, 256, nel * ts, dtype=np.uint8))
    assert _bit_unshuffle(_bit_shuffle(raw, ts), ts) == raw


@given(st.integers(0, 2**32 - 1), st.integers(8, 48), st.integers(8, 48),
       st.integers(30, 100), st.booleans())
@settings(max_examples=25, deadline=None)
def test_progressive_jpeg_equals_baseline_property(seed, h, w, q, color):
    from georiva_spark.sources.jpeg_codec import (jpeg_decode, jpeg_encode,
                                                  jpeg_encode_progressive)
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if color else (h, w)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    np.testing.assert_array_equal(
        jpeg_decode(jpeg_encode_progressive(img, quality=q)),
        jpeg_decode(jpeg_encode(img, quality=q)))


@given(st.integers(0, 2**32 - 1), st.integers(1, 64), st.integers(1, 64),
       st.sampled_from([1, 3, 4]))
@settings(max_examples=40, deadline=None)
def test_png_image_roundtrip_property(seed, h, w, c):
    from georiva_spark.sources.png_codec import (png_decode_image,
                                                 png_encode_image)
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    np.testing.assert_array_equal(png_decode_image(png_encode_image(a)), a)


def test_jpeg_truncated_stream_raises_by_name():
    """A baseline JPEG cut off mid-entropy-stream must fail loudly with
    a NAMED error, not a bare IndexError (and never a silent gray
    image) — the multimodal seam surfaces decode errors per image."""
    import numpy as np
    import pytest

    from georiva_spark.sources.jpeg_codec import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    data = jpeg_encode(img, quality=85)
    # cut inside the entropy data (well past the headers, before EOI)
    with pytest.raises(ValueError, match="truncated JPEG entropy"):
        jpeg_decode(data[:len(data) - 8])
