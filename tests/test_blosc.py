"""Blosc1 chunk codec tests: container round-trips across inner codecs /
typesizes / sizes, LZ4 block-format cross-checks vs pyarrow's C codec,
shuffle tails, memcpy fallback, hand-built frame decode, gates."""

import struct

import numpy as np
import pytest

from georiva_spark.sources.blosc_codec import (
    blosc_compress, blosc_decompress, lz4_compress_py, lz4_decompress_py)


@pytest.mark.parametrize("cname", ["blosclz", "lz4", "zstd", "snappy", "zlib"])
@pytest.mark.parametrize("typesize", [1, 2, 4, 8, 16, 32])
def test_roundtrip_matrix(cname, typesize):
    rng = np.random.default_rng(typesize)
    for n_el in (0, 1, 100, 5000, 70000):
        comp = (np.arange(n_el) % 251).astype(np.uint8) \
            .repeat(typesize).tobytes()
        rand = rng.integers(0, 256, n_el * typesize) \
            .astype(np.uint8).tobytes()
        for payload in (comp, rand):
            frame = blosc_compress(payload, typesize, cname=cname)
            assert blosc_decompress(frame) == payload


def test_leftover_blocks_and_shuffle_tails():
    rng = np.random.default_rng(0)
    for n in (17, 1000, 4097, 123457):
        payload = rng.integers(0, 7, n).astype(np.uint8).tobytes()
        for ts in (3, 4, 8):
            frame = blosc_compress(payload, ts, cname="lz4",
                                   blocksize=4096)
            assert blosc_decompress(frame) == payload


def test_lz4_cross_check_vs_pyarrow():
    """Pure-Python LZ4 block codec interoperates with the C one both
    ways — so the fallback path is wire-identical, not merely self-
    consistent."""
    import pyarrow as pa
    c = pa.Codec("lz4_raw")
    rng = np.random.default_rng(7)
    for trial in range(30):
        n = int(rng.integers(1, 8000))
        data = (rng.integers(0, 5 if trial % 2 else 256, n)
                .astype(np.uint8).tobytes())
        real = c.compress(data, asbytes=True)
        assert lz4_decompress_py(real, len(data)) == data
        mine = lz4_compress_py(data)
        assert c.decompress(mine, decompressed_size=len(data),
                            asbytes=True) == data
        assert lz4_decompress_py(mine, len(data)) == data


def test_lz4_overlapping_match_vector():
    # token 0x1F: 1 literal, match len 15+4+ext; offset 1 → RLE-style
    # overlap replication, the trickiest decoder path.
    frame = bytes([0x1F, ord("a"), 0x01, 0x00, 0x05]) + \
        bytes([0x50]) + b"tail!"
    out = lz4_decompress_py(frame, 1 + 24 + 5)
    assert out == b"a" * 25 + b"tail!"


def test_memcpy_frame_for_incompressible():
    rng = np.random.default_rng(1)
    payload = rng.integers(0, 256, 4096).astype(np.uint8).tobytes()
    frame = blosc_compress(payload, 4, cname="lz4")
    flags = frame[2]
    assert flags & 0x2                       # memcpyed
    assert blosc_decompress(frame) == payload


def test_float32_grid_compresses():
    a = np.sin(np.arange(100000) / 100).astype("<f4").tobytes()
    for cname in ("lz4", "zstd"):
        frame = blosc_compress(a, 4, cname=cname)
        assert len(frame) < len(a) * 0.7
        assert blosc_decompress(frame) == a


def test_hand_built_unsplit_frame():
    """Decode a frame assembled octet-by-octet from the published
    container spec (dont-split flag, zlib codec) — independent of our
    own encoder's choices."""
    import zlib
    payload = bytes(range(16)) * 64          # 1024 bytes, typesize 4
    shuffled = np.frombuffer(payload, np.uint8).reshape(-1, 4).T.tobytes()
    comp = zlib.compress(shuffled, 6)
    flags = (3 << 5) | 0x1 | 0x10            # zlib | shuffle | dont-split
    header = struct.pack("<BBBBiii", 2, 1, flags, 4, 1024, 1024,
                         16 + 4 + 4 + len(comp))
    frame = header + struct.pack("<i", 20) + \
        struct.pack("<i", len(comp)) + comp
    assert blosc_decompress(frame) == payload


def test_gates_named():
    with pytest.raises(NotImplementedError, match="unknowncodec"):
        blosc_compress(b"x" * 64, 4, cname="unknowncodec")


def test_bitshuffle_roundtrip_and_frame():
    """Bit-shuffle (flag 0x4): matrix-of-bits transpose per block, tail
    elements raw — round-trips across typesizes/sizes and beats
    byte-shuffle on smooth numeric data."""
    from georiva_spark.sources.blosc_codec import (_bit_shuffle,
                                                   _bit_unshuffle)
    rng = np.random.default_rng(4)
    for ts in (1, 2, 4, 8, 16):
        for n_el in (0, 7, 8, 63, 1000, 4097):
            raw = bytes(rng.integers(0, 256, n_el * ts, dtype=np.uint8))
            assert _bit_unshuffle(_bit_shuffle(raw, ts), ts) == raw
            frame = blosc_compress(raw, ts, cname="lz4", shuffle="bit")
            assert frame[2] & 0x4 or frame[2] & 0x2  # bit flag (or memcpy fallback)
            assert blosc_decompress(frame) == raw
    smooth = (1000 + np.cumsum(rng.integers(-2, 3, 20000))) \
        .astype("<i4").tobytes()
    bit = blosc_compress(smooth, 4, cname="lz4", shuffle="bit")
    byte = blosc_compress(smooth, 4, cname="lz4", shuffle=True)
    assert len(bit) < len(byte) < len(smooth)


def test_blosclz_token_stream_vectors():
    """Decode blosclz token streams assembled byte-by-byte from the
    blosclz.c format — literal runs, short match, 255-extended long
    match, overlapping match, and the far-distance marker (high bits 31
    + code 255 + 16-bit extra) that only pre-8191-window data hits."""
    from georiva_spark.sources.blosc_codec import (blosclz_compress,
                                                   blosclz_decompress)
    # literal run of 5 ("hello"): first token is masked & 31
    assert blosclz_decompress(bytes([4]) + b"hello", 5) == b"hello"
    # "abcabcabc": 3 literals then an overlapping match len 6 dist 2
    # (ref walks abc abc): ctrl = ((6-2)<<5)|0, code = 2
    s = bytes([2]) + b"abc" + bytes([(4 << 5) | 0, 2])
    assert blosclz_decompress(s, 9) == b"abcabcabc"
    # long match: 1 literal 'x' then 300 copies of it — len ext:
    # len = 7-1 + 255 + 36 + 3 = 300 → ext bytes 255, 36; dist 0
    s = bytes([0]) + b"x" + bytes([(7 << 5) | 0, 255, 36, 0])
    assert blosclz_decompress(s, 301) == b"x" * 301
    # far match: 9000 junk literals then re-copy the first 4 bytes.
    # dist = 8999 ≥ 8191 → ctrl high 31, code 255, extra16 = 808
    lead = bytes((i * 7 + 1) % 256 for i in range(9000))
    toks = bytearray()
    toks.append(31)                   # first literal token: 32-run
    pos = 0
    runs = []
    while pos < 9000:
        run = min(32, 9000 - pos)
        if pos:
            runs.append(run - 1)
        toks += lead[pos:pos + run]
        if pos + run < 9000:
            toks.append(min(32, 9000 - pos - run) - 1)
        pos += run
    # rebuild properly: simpler to emit with the encoder's writer
    toks = bytearray()
    pos = 0
    first = True
    while pos < 9000:
        run = min(32, 9000 - pos)
        toks.append(run - 1)
        toks += lead[pos:pos + run]
        pos += run
    extra = 8999 - 8191
    toks += bytes([(2 << 5) | 31, 255, extra >> 8, extra & 0xFF])
    got = blosclz_decompress(bytes(toks), 9004)
    assert got == lead + lead[:4]
    # encoder round-trip on compressible + random data
    rng = np.random.default_rng(9)
    for payload in (b"", b"a", b"ab" * 5000,
                    bytes(rng.integers(0, 256, 70000, dtype=np.uint8)),
                    lead):
        assert blosclz_decompress(blosclz_compress(payload),
                                  len(payload)) == payload
