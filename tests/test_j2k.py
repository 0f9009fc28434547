"""JPEG 2000 codec tests (j2k_codec): MQ coder, stuffed bit I/O, tag
trees, reversible 5/3 DWT, EBCOT T1, full codestream round trips, and
the unsupported-feature gates."""

import numpy as np
import pytest

from georiva_spark.sources.j2k_codec import (
    MQDecoder, MQEncoder, TagTree, _BitReader, _BitWriter, _sd_1d,
    dwt53_forward, dwt53_inverse, j2k_decode, j2k_encode, t1_decode,
    t1_encode,
)


def test_mq_roundtrip_and_compression():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 3000).tolist()
    ctxs = rng.integers(0, 19, 3000).tolist()
    enc = MQEncoder()
    for b, c in zip(bits, ctxs):
        enc.encode(int(b), int(c))
    data = enc.flush()
    dec = MQDecoder(data)
    assert [dec.decode(int(c)) for c in ctxs] == bits
    # a 2%-biased source must compress close to its entropy (~0.14 bpb)
    biased = (rng.random(10000) < 0.02).astype(int).tolist()
    enc = MQEncoder()
    for b in biased:
        enc.encode(int(b), 0)
    data = enc.flush()
    assert len(data) < 10000 * 0.25 / 8 * 2
    dec = MQDecoder(data)
    assert [dec.decode(0) for _ in biased] == biased


def test_bitio_stuffing():
    """A run of 1-bits creates 0xFF header bytes; the next byte then
    carries only 7 bits (B.10.1). The limit is latched per byte."""
    rng = np.random.default_rng(1)
    for _ in range(100):
        n = int(rng.integers(1, 200))
        bits = (rng.random(n) < 0.9).astype(int).tolist()
        w = _BitWriter()
        for b in bits:
            w.put(b)
        data = w.flush()
        assert not data.endswith(b"\xff")
        r = _BitReader(data)
        assert [r.get() for _ in bits] == bits
        assert r.align() == len(data)


def test_dwt53_known_lifting_and_roundtrip():
    lo, hi = _sd_1d(np.array([[10, 20, 30, 40, 50]]))
    assert lo.tolist() == [[10, 30, 50]] and hi.tolist() == [[0, 0]]
    rng = np.random.default_rng(2)
    for shape in [(1, 1), (1, 7), (5, 1), (7, 9), (65, 63), (128, 100)]:
        a = rng.integers(-5000, 5000, shape)
        for lv in (1, 2, 5):
            ll, det = dwt53_forward(a, lv)
            assert np.array_equal(dwt53_inverse(ll, det), a)


def test_tagtree_roundtrip():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 6, (5, 7))
    tt = TagTree(7, 5)
    tt.set_values(vals)
    bits = []
    order = [(x, y) for y in range(5) for x in range(7)]
    for t in range(1, 8):
        for x, y in order:
            tt.encode(x, y, t, bits.append)
    td = TagTree(7, 5)
    it = iter(bits)
    for t in range(1, 8):
        for x, y in order:
            td.decode(x, y, t, lambda: next(it))
    assert np.array_equal(td.value[0], vals)
    assert next(it, None) is None


@pytest.mark.parametrize("band", ["LL", "HL", "LH", "HH"])
def test_t1_roundtrip(band):
    rng = np.random.default_rng(4)
    for shape, scale in [((7, 5), 3), ((13, 17), 200), ((64, 64), 60000)]:
        a = rng.integers(-scale, scale, shape)
        mag, sgn = np.abs(a), (a < 0).astype(np.int8)
        data, npasses, nbps = t1_encode(mag, sgn, band)
        m2, s2 = t1_decode(data, shape[1], shape[0], band, nbps, npasses)
        assert np.array_equal(m2, mag)
        assert np.array_equal(s2[mag > 0], sgn[mag > 0])


def test_t1_runlength_sparse():
    rng = np.random.default_rng(5)
    a = np.where(rng.random((32, 32)) < 0.03,
                 rng.integers(-1000, 1000, (32, 32)), 0)
    mag, sgn = np.abs(a), (a < 0).astype(np.int8)
    data, npasses, nbps = t1_encode(mag, sgn, "HH")
    m2, s2 = t1_decode(data, 32, 32, "HH", nbps, npasses)
    assert np.array_equal(m2, mag)
    assert np.array_equal(s2[mag > 0], sgn[mag > 0])


def test_codestream_roundtrip_matrix():
    rng = np.random.default_rng(6)
    for shape in [(8, 8), (65, 63), (1, 50), (50, 1), (3, 3), (100, 130)]:
        for depth in (1, 8, 16, 24):
            a = rng.integers(0, 1 << depth, shape)
            assert np.array_equal(j2k_decode(j2k_encode(a, depth)), a), \
                (shape, depth)
    for val in (0, 65535):
        a = np.full((40, 30), val)
        assert np.array_equal(j2k_decode(j2k_encode(a, 16)), a)


def test_codestream_compresses_smooth_fields():
    y, x = np.mgrid[0:128, 0:128]
    smooth = ((np.sin(x / 9.0) + np.cos(y / 13.0) + 2) * 8000).astype(
        np.int64)
    buf = j2k_encode(smooth, 16)
    assert np.array_equal(j2k_decode(buf), smooth)
    assert len(buf) < 128 * 128 * 2 / 3      # ≥3:1 on a smooth field


def test_unsupported_features_gated():
    buf = bytearray(j2k_encode(np.arange(12).reshape(3, 4), 8))
    # patch COD wavelet byte to 9/7 irreversible
    i = buf.find(b"\xFF\x52")
    assert i != -1
    buf2 = bytearray(buf)
    buf2[i + 13] = 0                        # SPcod transform octet
    with pytest.raises(NotImplementedError, match="9/7"):
        j2k_decode(bytes(buf2))
    buf3 = bytearray(buf)
    buf3[i + 4] |= 0x02                     # Scod: SOP markers
    with pytest.raises(NotImplementedError, match="SOP"):
        j2k_decode(bytes(buf3))
    with pytest.raises(ValueError, match="SOC"):
        j2k_decode(b"\x00\x00" + bytes(buf))
