"""Zarr v2 store scan tests (S11/S12 concrete): chunk-parallel read,
listing-level pruning, orientation, fills, gates."""

import json
import os

import numpy as np
import pytest

from georiva_spark.sources.zarr_store import ZARR, write_zarr


def _store(tmp_path, a3, lat, lon, times, **kw):
    store = str(tmp_path / "store.zarr")
    write_zarr(store, {"t2m": a3, "lat": lat, "lon": lon,
                       "time": times}, **kw)
    return store


def test_roundtrip_3d_chunked(spark, tmp_path):
    rng = np.random.default_rng(0)
    a = rng.uniform(250, 300, (3, 10, 14)).astype("<f8")
    lat = np.arange(10, dtype="<f8") * 0.5 - 2.0       # ascending
    lon = np.arange(14, dtype="<f8") * 0.5 + 5.0
    times = np.array([0, 3600, 7200], dtype="<i8")
    store = _store(tmp_path, a, lat, lon, times,
                   chunks={"t2m": (2, 4, 5)})
    assert ZARR.list_variables(store) == ["t2m"]
    assert len(ZARR.get_timestamps(store)) == 3
    df = ZARR.open_variable(spark, store, "t2m")
    rows = {(r.time.hour, r.y, r.x): r for r in df.collect()}
    assert len(rows) == 3 * 10 * 14
    assert rows[(1, 3, 7)].value == a[1, 3, 7]
    assert rows[(0, 0, 0)].lat == -2.0 and rows[(0, 0, 0)].lon == 5.0


def test_descending_lat_flips_to_south_up(spark, tmp_path):
    a = np.arange(12, dtype="<f4").reshape(1, 3, 4)
    lat = np.array([10.0, 9.0, 8.0])                   # north-up store
    lon = np.arange(4, dtype="<f8")
    store = _store(tmp_path, a, lat, lon, np.array([0], dtype="<i8"))
    rows = {(r.y, r.x): r for r in
            ZARR.open_variable(spark, store, "t2m").collect()}
    # y=0 must be the southernmost (lat 8), holding storage row 2
    assert rows[(0, 0)].lat == 8.0
    assert rows[(0, 0)].value == 8.0
    assert rows[(2, 3)].lat == 10.0 and rows[(2, 3)].value == 3.0


def test_window_prunes_at_listing_time(spark, tmp_path):
    """Chunks outside the window are never READ: delete them from the
    store and the windowed query still works."""
    a = np.arange(64, dtype="<f8").reshape(1, 8, 8)
    lat = np.arange(8, dtype="<f8")
    lon = np.arange(8, dtype="<f8")
    store = _store(tmp_path, a, lat, lon, np.array([0], dtype="<i8"),
                   chunks={"t2m": (1, 4, 4)})
    # window covers only the (0,0) spatial chunk; corrupt the others
    for key in ("0.0.1", "0.1.0", "0.1.1"):
        os.remove(os.path.join(store, "t2m", key))
    df = ZARR.open_variable(spark, store, "t2m", window=(0, 0, 3, 3))
    rows = {(r.y, r.x): r.value for r in df.collect()}
    assert rows == {(y, x): a[0, y, x]
                    for y in range(3) for x in range(3)}


def test_timestamp_prunes_time_chunks(spark, tmp_path):
    import datetime as dt
    a = np.arange(2 * 4, dtype="<f8").reshape(2, 2, 2)
    lat = np.arange(2, dtype="<f8")
    lon = np.arange(2, dtype="<f8")
    store = _store(tmp_path, a, lat, lon,
                   np.array([0, 3600], dtype="<i8"),
                   chunks={"t2m": (1, 2, 2)})
    os.remove(os.path.join(store, "t2m", "0.0.0"))      # t=0 chunk gone
    df = ZARR.open_variable(spark, store, "t2m",
                            timestamp=dt.datetime(1970, 1, 1, 1))
    rows = df.collect()
    assert len(rows) == 4
    assert all(r.time.hour == 1 for r in rows)


def test_fill_value_and_uncompressed(spark, tmp_path):
    a = np.array([[[1.0, -9999.0], [3.0, 4.0]]])
    lat = np.arange(2, dtype="<f8")
    lon = np.arange(2, dtype="<f8")
    store = _store(tmp_path, a, lat, lon, np.array([0], dtype="<i8"),
                   fill_value=-9999.0, compress=False)
    rows = {(r.y, r.x): r.value for r in
            ZARR.open_variable(spark, store, "t2m").collect()}
    assert rows[(0, 1)] is None
    assert rows[(1, 1)] == 4.0


def test_blosc_store_roundtrip(spark, tmp_path):
    """zarr-python's default layout — Blosc(cname='lz4', shuffle=1) —
    decodes through the same scan path, fills and orientation intact."""
    rng = np.random.default_rng(3)
    a = rng.uniform(250, 300, (2, 9, 11)).astype("<f4")
    a[0, 2, 3] = -9999.0
    lat = np.arange(9, dtype="<f8")[::-1].copy()        # north-up store
    lon = np.arange(11, dtype="<f8")
    store = _store(tmp_path, a, lat, lon,
                   np.array([0, 3600], dtype="<i8"),
                   chunks={"t2m": (1, 4, 4)}, fill_value=-9999.0,
                   compressor="blosc:lz4")
    meta = json.load(open(os.path.join(store, "t2m", ".zarray")))
    assert meta["compressor"]["id"] == "blosc"
    rows = {(r.time.hour, r.y, r.x): r.value for r in
            ZARR.open_variable(spark, store, "t2m").collect()}
    assert len(rows) == 2 * 9 * 11
    assert rows[(0, 8 - 2, 3)] is None                  # fill → null
    exp = float(a[1, 4, 7])
    assert rows[(1, 8 - 4, 7)] == pytest.approx(exp)


def test_v3_store_roundtrip_and_prune(spark, tmp_path):
    """Zarr v3 layout (zarr.json, c/-prefixed slash keys, bytes+blosc
    codec chain) through the same scan: round-trip, orientation, fills,
    and listing-level pruning (deleted out-of-window chunks never read)."""
    rng = np.random.default_rng(5)
    a = rng.uniform(0, 10, (1, 8, 8)).astype("<f8")
    a[0, 1, 2] = -1.0
    lat = np.arange(8, dtype="<f8")
    lon = np.arange(8, dtype="<f8")
    store = _store(tmp_path, a, lat, lon, np.array([0], dtype="<i8"),
                   chunks={"t2m": (1, 4, 4)}, fill_value=-1.0,
                   zarr_format=3, compressor="blosc:lz4")
    assert os.path.isfile(os.path.join(store, "t2m", "zarr.json"))
    assert os.path.isfile(os.path.join(store, "t2m", "c", "0", "0", "0"))
    rows = {(r.y, r.x): r.value for r in
            ZARR.open_variable(spark, store, "t2m").collect()}
    assert len(rows) == 64
    assert rows[(1, 2)] is None                  # fill → null
    assert rows[(5, 6)] == a[0, 5, 6]
    # prune: drop the three chunks outside a (0,0,3,3) window
    for key in ("0/0/1", "0/1/0", "0/1/1"):
        os.remove(os.path.join(store, "t2m", "c", *key.split("/")))
    sub = {(r.y, r.x): r.value for r in
           ZARR.open_variable(spark, store, "t2m",
                              window=(0, 0, 3, 3)).collect()}
    assert sub == {(y, x): (None if (y, x) == (1, 2) else a[0, y, x])
                   for y in range(3) for x in range(3)}


def test_v3_gzip_codec_and_gates(spark, tmp_path):
    a = np.arange(12, dtype="<f4").reshape(1, 3, 4)
    lat = np.arange(3, dtype="<f8")
    lon = np.arange(4, dtype="<f8")
    store = _store(tmp_path, a, lat, lon, np.array([0], dtype="<i8"),
                   zarr_format=3)                # gzip codec chain
    rows = {(r.y, r.x): r.value for r in
            ZARR.open_variable(spark, store, "t2m").collect()}
    assert rows[(2, 3)] == 11.0
    # gates: sharding and unknown codecs raise by name
    meta = json.load(open(os.path.join(store, "t2m", "zarr.json")))
    meta["codecs"] = [{"name": "bytes"},
                      {"name": "sharding_indexed", "configuration": {}}]
    json.dump(meta, open(os.path.join(store, "t2m", "zarr.json"), "w"))
    from georiva_spark.sources.zarr_store import _read_meta
    with pytest.raises(NotImplementedError, match="sharding_indexed"):
        _read_meta(store, "t2m")


def test_v3_sharding_roundtrip_missing_and_window(spark, tmp_path):
    """sharding_indexed: shard files decode to their inner-chunk grid
    (index at end, crc32c-protected); a missing inner chunk (all-ones
    index pair) MATERIALIZES as fill_value per spec (r5 — zarr-python
    returns real fill-valued cells for sparsely-written shards). Here
    the caller-declared fill -9.0 is also the CF _FillValue, so the
    materialized cells surface as rows with NULL values — present, but
    nodata, exactly what the reference pipeline sees after masking; a
    window skips whole inner chunks inside the shard."""
    import struct

    from georiva_spark.sources.zarr_store import _read_meta, crc32c
    rng = np.random.default_rng(7)
    a = rng.uniform(0, 100, (1, 16, 16)).astype("<f8")
    lat = np.arange(16, dtype="<f8")
    lon = np.arange(16, dtype="<f8")
    store = _store(tmp_path, a, lat, lon, np.array([0], dtype="<i8"),
                   chunks={"t2m": (1, 16, 16)}, fill_value=-9.0,
                   zarr_format=3, compressor="blosc:lz4",
                   shard_inner={"t2m": (1, 4, 4)})
    rows = {(r.y, r.x): r.value for r in
            ZARR.open_variable(spark, store, "t2m").collect()}
    assert len(rows) == 256
    assert rows[(10, 13)] == a[0, 10, 13]
    # mark inner chunk (0, 1, 2) missing in the index → its 4x4 block
    # reads back as fill (-9.0), masked to null by the _FillValue attr
    kp = os.path.join(store, "t2m", "c", "0", "0", "0")
    blob = bytearray(open(kp, "rb").read())
    n_tot = 4 * 4
    isz = n_tot * 16 + 4
    k = (0 * 4 + 1) * 4 + 2                  # C order over (1, 4, 4) grid
    off = len(blob) - isz + k * 16
    blob[off:off + 16] = b"\xff" * 16
    ib = bytes(blob[len(blob) - isz:len(blob) - 4])
    blob[-4:] = struct.pack("<I", crc32c(ib))
    open(kp, "wb").write(bytes(blob))
    rows = {(r.y, r.x): r.value for r in
            ZARR.open_variable(spark, store, "t2m").collect()}
    assert len(rows) == 256
    missing = {(y, x) for y in range(4, 8) for x in range(8, 12)}
    assert all(rows[yx] is None for yx in missing)
    assert rows[(4, 12)] == a[0, 4, 12]
    # window confined to the top-left 4x4 inner chunk
    sub = ZARR.open_variable(spark, store, "t2m",
                             window=(0, 0, 4, 4)).collect()
    assert len(sub) == 16
    assert {(r.y, r.x) for r in sub} == \
        {(y, x) for y in range(4) for x in range(4)}
    m = _read_meta(store, "t2m")
    assert m["shard"]["inner"] == [1, 4, 4]


def test_layouts_agree_v2_v3_sharded(spark, tmp_path):
    """Format-invariance: one array written as v2+zlib, v2+blosc,
    v3+gzip, and v3+sharded-blosc reads back IDENTICALLY (rows, coords,
    nulls) through the same scan — the layout is an encoding detail,
    never a semantics change."""
    rng = np.random.default_rng(11)
    a = rng.uniform(0, 50, (2, 10, 12)).astype("<f8")
    a[0, 3, 4] = -5.0                       # fill sentinel
    lat = np.arange(10, dtype="<f8")[::-1].copy()       # north-up
    lon = np.arange(12, dtype="<f8")
    times = np.array([0, 3600], dtype="<i8")
    variants = [
        dict(zarr_format=2),
        dict(zarr_format=2, compressor="blosc:zstd"),
        dict(zarr_format=3),
        dict(zarr_format=3, compressor="blosc:lz4", checksum=True,
             shard_inner={"t2m": (1, 4, 4)}),
    ]
    results = []
    for i, kw in enumerate(variants):
        store = str(tmp_path / f"v{i}.zarr")
        write_zarr(store, {"t2m": a, "lat": lat, "lon": lon,
                           "time": times},
                   chunks={"t2m": (1, 4, 8)}, fill_value=-5.0, **kw)
        rows = sorted(
            ((r.time.isoformat(), r.y, r.x, r.lat, r.lon, r.value)
             for r in ZARR.open_variable(spark, store, "t2m").collect()))
        results.append(rows)
    assert len(results[0]) == 2 * 10 * 12
    for other in results[1:]:
        assert other == results[0]


def test_v3_crc32c_codec(spark, tmp_path):
    """Published CRC-32C vectors + verify-and-strip on read + loud
    failure on a corrupted chunk."""
    from georiva_spark.sources.zarr_store import _decode_chunk, \
        _read_meta, crc32c
    assert crc32c(b"123456789") == 0xE3069283       # RFC 3720 vector
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"\x00" * 32) == 0x8A9136AA       # iSCSI zero vector
    a = np.arange(12, dtype="<f4").reshape(1, 3, 4)
    lat = np.arange(3, dtype="<f8")
    lon = np.arange(4, dtype="<f8")
    store = _store(tmp_path, a, lat, lon, np.array([0], dtype="<i8"),
                   zarr_format=3, checksum=True)
    meta = json.load(open(os.path.join(store, "t2m", "zarr.json")))
    assert meta["codecs"][-1]["name"] == "crc32c"
    rows = {(r.y, r.x): r.value for r in
            ZARR.open_variable(spark, store, "t2m").collect()}
    assert rows[(1, 2)] == 6.0
    # corrupt one byte → named failure, not silent garbage
    kp = os.path.join(store, "t2m", "c", "0", "0", "0")
    blob = bytearray(open(kp, "rb").read())
    blob[0] ^= 0xFF
    m = _read_meta(store, "t2m")
    with pytest.raises(ValueError, match="crc32c mismatch"):
        _decode_chunk(bytes(blob), m)


def test_unsupported_features_gated(tmp_path):
    a = np.ones((2, 2), dtype="<f8")
    store = str(tmp_path / "bad.zarr")
    write_zarr(store, {"v": a})
    meta = json.load(open(os.path.join(store, "v", ".zarray")))
    meta["compressor"] = {"id": "lzma"}
    json.dump(meta, open(os.path.join(store, "v", ".zarray"), "w"))
    with pytest.raises(NotImplementedError, match="lzma"):
        from georiva_spark.sources.zarr_store import _read_meta
        _read_meta(store, "v")
    meta["compressor"] = None
    meta["order"] = "Q"                 # F decodes now; junk still gates
    json.dump(meta, open(os.path.join(store, "v", ".zarray"), "w"))
    with pytest.raises(NotImplementedError, match="order"):
        from georiva_spark.sources.zarr_store import _read_meta
        _read_meta(store, "v")


def test_v3_default_fill_keeps_genuine_zeros(spark, tmp_path):
    """v3 REQUIRES a structural fill_value (zarr-python defaults 0) but
    it is not a nodata sentinel: the same zero-bearing array written
    with writer defaults must read back identically under v2 and v3 —
    genuine 0.0 stays 0.0, never null. (Round-3 advisor bug: v3 wrote
    fill_value=0 and the scan masked value==fill → nulled real zeros.)"""
    a = np.array([[[0.0, 1.0], [2.0, 3.0]]], dtype="<f8")
    lat = np.arange(2, dtype="<f8")
    lon = np.arange(2, dtype="<f8")
    t = np.array([0], dtype="<i8")
    got = {}
    for fmt in (2, 3):
        store = str(tmp_path / f"z{fmt}.zarr")
        write_zarr(store, {"t2m": a, "lat": lat, "lon": lon, "time": t},
                   zarr_format=fmt)
        got[fmt] = {(r.y, r.x): r.value for r in
                    ZARR.open_variable(spark, store, "t2m").collect()}
    assert got[2] == got[3]
    assert got[3][(0, 0)] == 0.0
    # the v3 metadata advertises a float NaN fill, not 0
    meta = json.load(open(str(tmp_path / "z3.zarr/t2m/zarr.json")))
    assert meta["fill_value"] == "NaN"


def test_v3_explicit_fill_masks_via_fillvalue_attr(spark, tmp_path):
    """An explicit writer fill is recorded as a CF ``_FillValue``
    attribute (the only thing the scan masks on for v3, matching the
    reference's xarray mask-and-scale semantics) and sentinel values
    read back as null in BOTH formats."""
    a = np.array([[[-9.0, 1.0], [2.0, -9.0]]], dtype="<f8")
    lat = np.arange(2, dtype="<f8")
    lon = np.arange(2, dtype="<f8")
    t = np.array([0], dtype="<i8")
    for fmt in (2, 3):
        store = str(tmp_path / f"f{fmt}.zarr")
        write_zarr(store, {"t2m": a, "lat": lat, "lon": lon, "time": t},
                   fill_value=-9.0, zarr_format=fmt)
        rows = {(r.y, r.x): r.value for r in
                ZARR.open_variable(spark, store, "t2m").collect()}
        assert rows[(0, 0)] is None and rows[(1, 1)] is None
        assert rows[(0, 1)] == 1.0 and rows[(1, 0)] == 2.0
    meta = json.load(open(str(tmp_path / "f3.zarr/t2m/zarr.json")))
    assert meta["attributes"]["_FillValue"] == -9.0


def test_v2_zattrs_fillvalue_attr_masks(spark, tmp_path):
    """A third-party v2 store with fill_value: null but a CF
    ``_FillValue`` in .zattrs (xarray's encoding) still masks."""
    a = np.array([[[5.0, -1.0], [-1.0, 8.0]]], dtype="<f8")
    lat = np.arange(2, dtype="<f8")
    lon = np.arange(2, dtype="<f8")
    t = np.array([0], dtype="<i8")
    store = str(tmp_path / "attr.zarr")
    write_zarr(store, {"t2m": a, "lat": lat, "lon": lon, "time": t})
    with open(os.path.join(store, "t2m", ".zattrs"), "w") as f:
        json.dump({"_FillValue": -1.0}, f)
    rows = {(r.y, r.x): r.value for r in
            ZARR.open_variable(spark, store, "t2m").collect()}
    assert rows[(0, 1)] is None and rows[(1, 0)] is None
    assert rows[(0, 0)] == 5.0 and rows[(1, 1)] == 8.0


def test_sharded_coordinate_array_gated(tmp_path):
    """A v3 store whose 1-D axis arrays are themselves sharded raises a
    NAMED gate from the driver-side coordinate read, not an opaque
    reshape error."""
    store = str(tmp_path / "shco.zarr")
    write_zarr(store, {"lat": np.arange(8, dtype="<f8")},
               chunks={"lat": (8,)}, zarr_format=3,
               shard_inner={"lat": (4,)})
    from georiva_spark.sources.zarr_store import _read_small_array
    with pytest.raises(NotImplementedError, match="sharded coordinate"):
        _read_small_array(store, "lat")


def test_v2_forder_store_roundtrip(spark, tmp_path):
    """v2 order:'F' chunks (xarray transposes in legacy stores) decode
    identically to the same data written C-order — including blosc
    compression and edge-chunk padding."""
    rng = np.random.default_rng(13)
    a = rng.uniform(0, 50, (1, 9, 11)).astype("<f8")
    lat = np.arange(9, dtype="<f8")
    lon = np.arange(11, dtype="<f8")
    t = np.array([0], dtype="<i8")
    got = {}
    for order in ("C", "F"):
        store = str(tmp_path / f"ord{order}.zarr")
        write_zarr(store, {"t2m": a, "lat": lat, "lon": lon, "time": t},
                   chunks={"t2m": (1, 4, 4)}, order=order,
                   compressor="blosc:lz4")
        meta = json.load(open(os.path.join(store, "t2m", ".zarray")))
        assert meta["order"] == order
        got[order] = {(r.y, r.x): r.value for r in
                      ZARR.open_variable(spark, store, "t2m").collect()}
    assert got["C"] == got["F"]
    assert got["F"][(3, 7)] == a[0, 3, 7]


def test_v2_blosclz_store_roundtrip(spark, tmp_path):
    """Blosc(cname='blosclz') — c-blosc's own codec, the pre-1.14
    default — decodes through the native scan."""
    rng = np.random.default_rng(17)
    a = rng.uniform(0, 50, (1, 8, 8)).astype("<f4")
    store = str(tmp_path / "blz.zarr")
    write_zarr(store, {"t2m": a, "lat": np.arange(8, dtype="<f8"),
                       "lon": np.arange(8, dtype="<f8"),
                       "time": np.array([0], dtype="<i8")},
               chunks={"t2m": (1, 4, 4)}, compressor="blosc:blosclz")
    meta = json.load(open(os.path.join(store, "t2m", ".zarray")))
    assert meta["compressor"]["cname"] == "blosclz"
    rows = {(r.y, r.x): r.value for r in
            ZARR.open_variable(spark, store, "t2m").collect()}
    assert len(rows) == 64
    assert rows[(5, 2)] == pytest.approx(float(a[0, 5, 2]))


def test_v3_transpose_codec(spark, tmp_path):
    """v3 ``transpose`` codec (array→array, order=[2,1,0]): chunks are
    stored dim-permuted; the scan inverts the permutation. Store built
    by rewriting a plain v3 store's chunks + metadata — independent of
    the writer."""
    rng = np.random.default_rng(19)
    a = rng.uniform(0, 9, (2, 4, 6)).astype("<f8")
    lat = np.arange(4, dtype="<f8")
    lon = np.arange(6, dtype="<f8")
    t = np.array([0, 3600], dtype="<i8")
    store = str(tmp_path / "tr.zarr")
    write_zarr(store, {"t2m": a, "lat": lat, "lon": lon, "time": t},
               chunks={"t2m": (1, 4, 6)}, zarr_format=3, compress=False)
    # rewrite chunk files in (x, y, t) storage order + declare the codec
    mp = os.path.join(store, "t2m", "zarr.json")
    meta = json.load(open(mp))
    meta["codecs"] = [{"name": "transpose",
                       "configuration": {"order": [2, 1, 0]}}] \
        + meta["codecs"]
    json.dump(meta, open(mp, "w"))
    for ti in range(2):
        kp = os.path.join(store, "t2m", "c", str(ti), "0", "0")
        raw = np.frombuffer(open(kp, "rb").read(), "<f8").reshape(1, 4, 6)
        open(kp, "wb").write(
            np.ascontiguousarray(raw.transpose(2, 1, 0)).tobytes())
    rows = {(r.time.hour, r.y, r.x): r.value for r in
            ZARR.open_variable(spark, store, "t2m").collect()}
    assert len(rows) == 2 * 4 * 6
    assert rows[(0, 2, 5)] == a[0, 2, 5]
    assert rows[(1, 3, 1)] == a[1, 3, 1]


def test_v2_bitshuffle_store_roundtrip(spark, tmp_path):
    """Blosc bit-shuffle (v2 meta shuffle: 2, frame flag 0x4) decodes
    through the native scan — the last blosc filter gate closed."""
    rng = np.random.default_rng(23)
    a = np.cumsum(rng.integers(-2, 3, (1, 8, 8)), axis=2) \
        .astype("<f4") + 100.0
    store = str(tmp_path / "bshuf.zarr")
    write_zarr(store, {"t2m": a, "lat": np.arange(8, dtype="<f8"),
                       "lon": np.arange(8, dtype="<f8"),
                       "time": np.array([0], dtype="<i8")},
               chunks={"t2m": (1, 8, 8)}, compressor="blosc:lz4:bit")
    meta = json.load(open(os.path.join(store, "t2m", ".zarray")))
    assert meta["compressor"]["shuffle"] == 2
    rows = {(r.y, r.x): r.value for r in
            ZARR.open_variable(spark, store, "t2m").collect()}
    assert len(rows) == 64
    assert rows[(5, 2)] == pytest.approx(float(a[0, 5, 2]))


def test_v2_string_nan_fill(spark, tmp_path):
    """zarr v2 JSON-encodes a NaN fill as the string "NaN" (spec:
    non-finite floats have no JSON literal) — the scan must parse it,
    not compare floats to a string; NaN data reads as null, genuine
    values survive."""
    a = np.array([[[np.nan, 1.0], [2.0, 0.0]]], dtype="<f8")
    lat = np.arange(2, dtype="<f8")
    lon = np.arange(2, dtype="<f8")
    store = str(tmp_path / "nanfill.zarr")
    write_zarr(store, {"t2m": a, "lat": lat, "lon": lon,
                       "time": np.array([0], dtype="<i8")})
    mp = os.path.join(store, "t2m", ".zarray")
    meta = json.load(open(mp))
    meta["fill_value"] = "NaN"
    json.dump(meta, open(mp, "w"))
    rows = {(r.y, r.x): r.value for r in
            ZARR.open_variable(spark, store, "t2m").collect()}
    assert rows[(0, 0)] is None
    assert rows[(1, 1)] == 0.0 and rows[(0, 1)] == 1.0


def test_v3_sharded_with_inner_transpose(spark, tmp_path):
    """transpose inside a sharding_indexed inner codec chain: the perm
    flows through the shard's inner-chunk decode (the combination a
    zarr-python store with both codecs produces)."""
    rng = np.random.default_rng(29)
    a = rng.uniform(0, 9, (1, 8, 8)).astype("<f8")
    lat = np.arange(8, dtype="<f8")
    lon = np.arange(8, dtype="<f8")
    store = str(tmp_path / "shtr.zarr")
    write_zarr(store, {"t2m": a, "lat": lat, "lon": lon,
                       "time": np.array([0], dtype="<i8")},
               chunks={"t2m": (1, 8, 8)}, zarr_format=3, compress=False,
               shard_inner={"t2m": (1, 4, 4)})
    mp = os.path.join(store, "t2m", "zarr.json")
    meta = json.load(open(mp))
    shard_cfg = meta["codecs"][0]["configuration"]
    shard_cfg["codecs"] = [{"name": "transpose",
                            "configuration": {"order": [2, 1, 0]}}] \
        + shard_cfg["codecs"]
    json.dump(meta, open(mp, "w"))
    # rewrite each inner chunk's payload in (x, y, t) storage order;
    # the shard layout (uncompressed, crc32c index at end) is preserved
    kp = os.path.join(store, "t2m", "c", "0", "0", "0")
    blob = bytearray(open(kp, "rb").read())
    from georiva_spark.sources.zarr_store import crc32c
    import struct as _s
    n_inner = 4
    isz = n_inner * 16 + 4
    offs = np.frombuffer(bytes(blob[-isz:-4]), "<u8").reshape(-1, 2)
    for off, nb in offs:
        raw = np.frombuffer(bytes(blob[off:off + nb]), "<f8") \
            .reshape(1, 4, 4)
        blob[off:off + nb] = np.ascontiguousarray(
            raw.transpose(2, 1, 0)).tobytes()
    open(kp, "wb").write(bytes(blob))
    rows = {(r.y, r.x): r.value for r in
            ZARR.open_variable(spark, store, "t2m").collect()}
    assert len(rows) == 64
    assert rows[(2, 5)] == a[0, 2, 5]
    assert rows[(6, 1)] == a[0, 6, 1]


def test_fixture_cache_content_addressed():
    """The query-fixture zarr stores are keyed on a hash of the
    generator source + array bytes + write options, so changing the
    planting logic or any knob yields a FRESH directory (the old
    bare-name exists-skip could silently serve a store planted by an
    older generator). Same inputs must reuse the same directory
    without rebuilding it."""
    import os

    import numpy as np

    from georiva_spark.queries_ext import _zarr_fixture

    data = {"emb": np.arange(24, dtype="<f4").reshape(1, 4, 6),
            "lat": np.arange(4, dtype="<f8"),
            "lon": np.arange(6, dtype="<f8"),
            "time": np.array([0], dtype="<i8")}
    d1 = _zarr_fixture("cachetest", data, chunks={"emb": (1, 2, 3)})
    mt1 = os.path.getmtime(d1)
    # identical inputs -> same directory, no rebuild
    assert _zarr_fixture("cachetest", data,
                         chunks={"emb": (1, 2, 3)}) == d1
    assert os.path.getmtime(d1) == mt1
    # a changed write option (planting logic knob) -> fresh directory
    d2 = _zarr_fixture("cachetest", data, chunks={"emb": (1, 4, 3)})
    assert d2 != d1
    # changed data bytes -> fresh directory
    data2 = dict(data, emb=data["emb"] + 1.0)
    d3 = _zarr_fixture("cachetest", data2, chunks={"emb": (1, 2, 3)})
    assert d3 not in (d1, d2)


def test_absent_chunk_file_materializes_fill(spark, tmp_path):
    """Absent chunk FILES read as fill_value per spec, matching
    zarr-python on sparsely-written stores (r5). Three fill regimes:
    v3 structural fill (int array, no _FillValue attr -> fill 0) ->
    genuine zero-valued rows; v2 sentinel fill (-7.0) -> rows PRESENT
    with null values (fill is nodata in the v2 convention); v2 null
    fill -> no rows (missing data undefined, the pre-r5 behavior)."""
    import numpy as np

    a = np.arange(16, dtype="<f8").reshape(1, 4, 4) + 1.0
    lat = np.arange(4, dtype="<f8")
    lon = np.arange(4, dtype="<f8")
    t = np.array([0], dtype="<i8")

    # v3 int array, no caller fill: structural fill 0 -> real zeros
    s3 = str(tmp_path / "v3.zarr")
    ai = (a + 0).astype("<i4")
    write_zarr(s3, {"t2m": ai, "lat": lat, "lon": lon, "time": t},
               chunks={"t2m": (1, 2, 2)}, zarr_format=3)
    os.remove(os.path.join(s3, "t2m", "c", "0", "1", "1"))
    rows = {(r.y, r.x): r.value for r in
            ZARR.open_variable(spark, s3, "t2m").collect()}
    assert len(rows) == 16
    assert rows[(3, 3)] == 0.0 and rows[(2, 2)] == 0.0
    assert rows[(0, 0)] == float(ai[0, 0, 0])

    # v2: non-null fill is the nodata sentinel -> null-valued rows
    s2 = str(tmp_path / "v2.zarr")
    write_zarr(s2, {"t2m": a, "lat": lat, "lon": lon, "time": t},
               chunks={"t2m": (1, 2, 2)}, fill_value=-7.0)
    os.remove(os.path.join(s2, "t2m", "0.1.1"))
    rows = {(r.y, r.x): r.value for r in
            ZARR.open_variable(spark, s2, "t2m").collect()}
    assert len(rows) == 16
    assert rows[(3, 3)] is None and rows[(0, 1)] == a[0, 0, 1]

    # v2 null fill: absent chunk stays absent
    s0 = str(tmp_path / "v0.zarr")
    write_zarr(s0, {"t2m": a, "lat": lat, "lon": lon, "time": t},
               chunks={"t2m": (1, 2, 2)})
    os.remove(os.path.join(s0, "t2m", "0.1.1"))
    rows = {(r.y, r.x) for r in
            ZARR.open_variable(spark, s0, "t2m").collect()}
    assert len(rows) == 12
    assert (3, 3) not in rows
