"""Dependency-free Blosc1 chunk codec (the de-facto Zarr v2 compressor).

zarr-python's default compressor is ``Blosc(cname='lz4', clevel=5,
shuffle=SHUFFLE)`` — until now the native Zarr scan gated every
blosc-compressed store, which is to say *most real-world Zarr v2 data*.
This module implements the c-blosc 1.x chunk container from the public
format description (c-blosc README_CHUNK_FORMAT.rst / blosc.c):

    header(16) = version | versionlz | flags | typesize |
                 nbytes(i32) | blocksize(i32) | cbytes(i32)
    flags: 0x1 byte-shuffle, 0x2 memcpyed, 0x4 bit-shuffle,
           0x10 dont-split, bits 5-7 = inner codec
           (0 blosclz, 1 lz4/lz4hc, 2 snappy, 3 zlib, 4 zstd)

then, unless memcpyed, an ``int32 × nblocks`` block-start table and the
blocks themselves.  Each block holds ``typesize`` sub-streams when split
(flag 0x10 clear, not the leftover block) else one stream; every stream
is ``int32 csize`` + payload, with ``csize == neblock`` meaning stored
raw.  Byte-shuffle is applied per *block* before splitting, so decode is
concat streams → unshuffle(typesize).

Inner codecs: lz4 / zstd / snappy / zlib ride pyarrow's bundled codecs
(zero-copy C, no new dependency); an LZ4 *block-format* decoder and a
greedy hash-chain encoder in pure Python back them up so the path works
even on a pyarrow built without lz4; blosclz (c-blosc's own FastLZ
derivative, the pre-1.14 default) decodes natively, as does the
bit-shuffle filter (flag 0x4 — per-block bit-matrix transpose).

Reference behavior: the reference reads Zarr through zarr-python/numcodecs
(virtual_zarr/virtual_zarr.py:242-399); this is the same chunk format
re-implemented from the public spec, executor-side, no coordination.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SHUFFLE = 0x1
_MEMCPYED = 0x2
_BITSHUFFLE = 0x4
_DONT_SPLIT = 0x10

_CODEC_NAMES = {0: "blosclz", 1: "lz4", 2: "snappy", 3: "zlib", 4: "zstd"}
_CODEC_IDS = {v: k for k, v in _CODEC_NAMES.items()}

_MAX_SPLITS = 16          # c-blosc: streams per block when splitting
_MIN_BUFFERSIZE = 128     # c-blosc: smallest stream worth splitting to


# ---------------------------------------------------------------------------
# LZ4 block format — pure-Python fallback (pyarrow 'lz4_raw' is the fast
# path).  Format: sequences of [token | literal-len ext | literals |
# offset(i16 LE) | match-len ext]; the last sequence has no match.
# ---------------------------------------------------------------------------

def lz4_decompress_py(src: bytes, dst_size: int) -> bytes:
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        token = src[i]
        i += 1
        litlen = token >> 4
        if litlen == 15:
            while True:
                b = src[i]
                i += 1
                litlen += b
                if b != 255:
                    break
        if litlen:
            out += src[i:i + litlen]
            i += litlen
        if i >= n:
            break                       # last sequence: literals only
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0 or offset > len(out):
            raise ValueError("corrupt LZ4 stream: bad offset")
        mlen = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        if offset >= mlen:
            start = len(out) - offset
            out += out[start:start + mlen]
        else:                           # overlapping match: replicate run
            pattern = out[-offset:]
            reps = -(-mlen // offset)
            out += (bytes(pattern) * reps)[:mlen]
    if len(out) != dst_size:
        raise ValueError(
            f"corrupt LZ4 stream: got {len(out)} bytes, want {dst_size}")
    return bytes(out)


def lz4_compress_py(src: bytes) -> bytes:
    """Greedy hash-table LZ4 block encoder (valid, not maximal).  Matches
    ≥4 bytes via a 4-byte rolling hash; the final 5 literals and the last
    12 bytes are emitted literal per the block-format end conditions."""
    n = len(src)
    out = bytearray()

    def emit(lit_start: int, lit_end: int, offset: int, mlen: int) -> None:
        litlen = lit_end - lit_start
        tok_lit = 15 if litlen >= 15 else litlen
        if mlen:
            m = mlen - 4
            tok_m = 15 if m >= 15 else m
        else:
            tok_m = 0
        out.append((tok_lit << 4) | tok_m)
        if litlen >= 15:
            rem = litlen - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out.extend(src[lit_start:lit_end])
        if mlen:
            out.extend(struct.pack("<H", offset))
            if m >= 15:
                rem = m - 15
                while rem >= 255:
                    out.append(255)
                    rem -= 255
                out.append(rem)

    if n < 13:                          # too small for any match
        emit(0, n, 0, 0)
        return bytes(out)

    table: dict[int, int] = {}
    anchor = 0
    i = 0
    limit = n - 12                      # last 12 bytes must be literals
    while i < limit:
        key = src[i:i + 4]
        h = hash(key)
        cand = table.get(h)
        table[h] = i
        if (cand is not None and i - cand <= 0xFFFF
                and src[cand:cand + 4] == key):
            mlen = 4
            max_m = min(n - 5, i + (n - 5 - i)) - i  # keep 5 end literals
            max_m = n - 5 - i
            while mlen < max_m and src[cand + mlen] == src[i + mlen]:
                mlen += 1
            emit(anchor, i, i - cand, mlen)
            i += mlen
            anchor = i
        else:
            i += 1
    emit(anchor, n, 0, 0)
    return bytes(out)


# ---------------------------------------------------------------------------
# blosclz — c-blosc's own FastLZ-derived codec (blosclz.c).  Chunks from
# pre-1.14 c-blosc writers (default cname) and explicit Blosc(cname=
# 'blosclz') stores use codec id 0.  Token stream: first byte is a
# literal-run control (& 31); then ctrl < 32 → literal run of ctrl+1
# bytes, ctrl >= 32 → match of length (ctrl>>5)+2 (7 → 255-extended)
# at distance ((ctrl&31)<<8)+code+1; code==255 with high bits 31 marks
# a far match with a 16-bit extra distance beyond MAX_DISTANCE.
# ---------------------------------------------------------------------------

_BLOSCLZ_MAX_DISTANCE = 8191


def blosclz_decompress(src: bytes, dst_size: int) -> bytes:
    out = bytearray()
    i, n = 0, len(src)
    if n == 0:
        if dst_size:
            raise ValueError("empty blosclz stream for nonzero output")
        return b""
    ctrl = src[i] & 31
    i += 1
    while True:
        if ctrl >= 32:
            mlen = (ctrl >> 5) - 1
            ofs = (ctrl & 31) << 8
            if mlen == 6:                      # 7 - 1: length extension
                while True:
                    code = src[i]
                    i += 1
                    mlen += code
                    if code != 255:
                        break
            code = src[i]
            i += 1
            mlen += 3
            dist = ofs + code
            if code == 255 and ofs == (31 << 8):
                dist = ((src[i] << 8) | src[i + 1]) + _BLOSCLZ_MAX_DISTANCE
                i += 2
            start = len(out) - dist - 1
            if start < 0:
                raise ValueError("corrupt blosclz stream: bad distance")
            if dist + 1 >= mlen:
                out += out[start:start + mlen]
            else:                              # overlapping: replicate run
                pattern = out[start:]
                reps = -(-mlen // len(pattern))
                out += (bytes(pattern) * reps)[:mlen]
        else:
            run = ctrl + 1
            out += src[i:i + run]
            i += run
        if i < n:
            ctrl = src[i]
            i += 1
        else:
            break
    if len(out) != dst_size:
        raise ValueError(
            f"corrupt blosclz stream: got {len(out)} bytes, "
            f"want {dst_size}")
    return bytes(out)


def blosclz_compress(src: bytes) -> bytes:
    """Greedy hash-table blosclz encoder (valid, not maximal): literal
    runs ≤ 32 and NEAR matches only (distance < MAX_DISTANCE) — the far
    branch is decode-only, covered by hand-built vectors in tests."""
    n = len(src)
    out = bytearray()
    table: dict[bytes, int] = {}

    def emit_lits(lo: int, hi: int) -> None:
        while lo < hi:
            run = min(32, hi - lo)
            out.append(run - 1)
            out.extend(src[lo:lo + run])
            lo += run

    def emit_match(mlen: int, dist: int) -> None:
        code = dist & 0xFF
        high = dist >> 8
        if mlen <= 8:                          # (ctrl>>5) in 1..6
            out.append(((mlen - 2) << 5) | high)
        else:
            out.append((7 << 5) | high)
            rem = mlen - 9
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out.append(code)

    i = anchor = 0
    while i + 3 <= n:
        key = src[i:i + 3]
        cand = table.get(key)
        table[key] = i
        dist = i - cand - 1 if cand is not None else None
        if (dist is not None and dist < _BLOSCLZ_MAX_DISTANCE
                and src[cand:cand + 3] == key):
            mlen = 3
            while i + mlen < n and src[cand + mlen] == src[i + mlen]:
                mlen += 1
            # the far-match marker (high=31 AND code=255 ⇒ dist 8191)
            # is unreachable here: dist < 8191 by the guard above
            emit_lits(anchor, i)
            emit_match(mlen, dist)
            i += mlen
            anchor = i
        else:
            i += 1
    emit_lits(anchor, n)
    if not out:
        out.append(0)                          # empty input: 1-lit header?
    return bytes(out)


def _pa_codec(name: str):
    try:
        import pyarrow as pa
        return pa.Codec(name)
    except Exception:
        return None


def _inner_decompress(codec: int, payload: bytes, dst_size: int) -> bytes:
    name = _CODEC_NAMES.get(codec, str(codec))
    if codec == 0:
        return blosclz_decompress(payload, dst_size)
    if codec == 3:
        return zlib.decompress(payload)
    if codec == 1:
        c = _pa_codec("lz4_raw")
        if c is not None:
            return c.decompress(payload, decompressed_size=dst_size,
                                asbytes=True)
        return lz4_decompress_py(payload, dst_size)
    if codec in (2, 4):
        c = _pa_codec("snappy" if codec == 2 else "zstd")
        if c is None:
            raise NotImplementedError(
                f"blosc inner codec {name}: pyarrow build lacks it")
        return c.decompress(payload, decompressed_size=dst_size,
                            asbytes=True)
    raise NotImplementedError(f"blosc inner codec {name}")


def _inner_compress(codec: int, payload: bytes, clevel: int) -> bytes:
    if codec == 0:
        return blosclz_compress(payload)
    if codec == 3:
        return zlib.compress(payload, min(clevel, 9))
    if codec == 1:
        c = _pa_codec("lz4_raw")
        if c is not None:
            return c.compress(payload, asbytes=True)
        return lz4_compress_py(payload)
    if codec in (2, 4):
        c = _pa_codec("snappy" if codec == 2 else "zstd")
        if c is None:
            raise NotImplementedError(
                f"blosc inner codec {_CODEC_NAMES[codec]}: "
                "pyarrow build lacks it")
        return c.compress(payload, asbytes=True)
    raise NotImplementedError(f"blosc inner codec {_CODEC_NAMES[codec]}")


def _bit_shuffle(block: bytes, typesize: int) -> bytes:
    """Bitshuffle (Masui's bitshuffle library, what blosc flag 0x4
    applies per block): view the block as (n_elements, typesize*8)
    bits — element bytes in memory order, MSB-first per byte (the
    numpy unpackbits/packbits formulation bitshuffle's own test suite
    uses as the reference) — and transpose to bit-plane-major. Only
    complete groups of 8 elements shuffle; the tail is copied raw."""
    n = len(block) // typesize
    nb = n - n % 8
    body = nb * typesize
    if nb == 0:
        return bytes(block)
    a = np.frombuffer(block[:body], np.uint8)
    bits = np.unpackbits(a).reshape(nb, typesize * 8)
    out = np.packbits(np.ascontiguousarray(bits.T))
    return out.tobytes() + bytes(block[body:])


def _bit_unshuffle(block: bytes, typesize: int) -> bytes:
    n = len(block) // typesize
    nb = n - n % 8
    body = nb * typesize
    if nb == 0:
        return bytes(block)
    a = np.frombuffer(block[:body], np.uint8)
    bits = np.unpackbits(a).reshape(typesize * 8, nb)
    out = np.packbits(np.ascontiguousarray(bits.T))
    return out.tobytes() + bytes(block[body:])


def _unshuffle(block: bytes, typesize: int) -> bytes:
    """Inverse byte-shuffle: typesize planes of n/typesize bytes back to
    interleaved elements (numpy transpose — no Python loop).  A tail not
    divisible by typesize is stored unshuffled, per c-blosc shuffle.c."""
    tail = len(block) % typesize
    body = len(block) - tail
    a = np.frombuffer(block[:body], dtype=np.uint8)
    return a.reshape(typesize, -1).T.tobytes() + block[body:]


def _shuffle(block: bytes, typesize: int) -> bytes:
    tail = len(block) % typesize
    body = len(block) - tail
    a = np.frombuffer(block[:body], dtype=np.uint8)
    return a.reshape(-1, typesize).T.tobytes() + block[body:]


# ---------------------------------------------------------------------------
# Chunk container
# ---------------------------------------------------------------------------

def blosc_decompress(frame: bytes) -> bytes:
    """Decode one Blosc1 chunk to its raw bytes."""
    if len(frame) < 16:
        raise ValueError("blosc chunk shorter than its 16-byte header")
    version, _versionlz, flags, typesize = frame[0], frame[1], frame[2], \
        frame[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<iii", frame, 4)
    if version > 2:
        raise NotImplementedError(f"blosc format version {version}")
    if flags & _MEMCPYED:
        return bytes(frame[16:16 + nbytes])
    codec = flags >> 5
    if typesize == 0:
        typesize = 256                  # blosc stores 256 as 0
    nblocks = -(-nbytes // blocksize)
    leftover = nbytes % blocksize
    bstarts = struct.unpack_from(f"<{nblocks}i", frame, 16)
    dont_split = bool(flags & _DONT_SPLIT)
    out = bytearray()
    for bi in range(nblocks):
        bsize = blocksize
        leftoverblock = False
        if bi == nblocks - 1 and leftover:
            bsize = leftover
            leftoverblock = True
        # mirror c-blosc's blosc_d split decision exactly: pre-1.11
        # writers never set DONT_SPLIT, so the size conditions must be
        # re-derived on decode (typesize cap and minimum stream size)
        split = (not dont_split and not leftoverblock
                 and 1 < typesize <= _MAX_SPLITS
                 and blocksize // typesize >= _MIN_BUFFERSIZE)
        nstreams = typesize if split else 1
        if bsize % nstreams:
            raise ValueError("blosc block size not divisible by typesize")
        neblock = bsize // nstreams
        pos = bstarts[bi]
        block = bytearray()
        for _ in range(nstreams):
            (csize,) = struct.unpack_from("<i", frame, pos)
            pos += 4
            payload = frame[pos:pos + csize]
            pos += csize
            if csize == neblock:
                block += payload
            else:
                block += _inner_decompress(codec, payload, neblock)
        if flags & _BITSHUFFLE:
            block = _bit_unshuffle(bytes(block), typesize)
        elif (flags & _SHUFFLE) and typesize > 1:
            block = _unshuffle(bytes(block), typesize)
        out += block
    if len(out) != nbytes:
        raise ValueError(
            f"blosc chunk decoded to {len(out)} bytes, header says "
            f"{nbytes}")
    return bytes(out)


def blosc_compress(data: bytes, typesize: int, *, cname: str = "lz4",
                   clevel: int = 5, shuffle: bool | str = True,
                   blocksize: int = 0) -> bytes:
    """Encode raw bytes as one Blosc1 chunk (writer + test vectors).

    Emits the same container real blosc readers accept: byte-shuffle per
    block, typesize-way stream split when worthwhile, per-stream raw
    fallback when compression doesn't pay, whole-chunk memcpy fallback
    when nothing pays."""
    if cname not in _CODEC_IDS:
        raise NotImplementedError(f"blosc inner codec {cname!r}")
    codec = _CODEC_IDS[cname]
    nbytes = len(data)
    if typesize <= 0 or typesize > 255:
        typesize = 1
    if blocksize <= 0:
        blocksize = min(max(nbytes, typesize), 1 << 18)
    blocksize -= blocksize % typesize or 0
    blocksize = max(blocksize, typesize)
    do_bitshuffle = shuffle == "bit"
    do_shuffle = bool(shuffle) and not do_bitshuffle and typesize > 1
    split = (not do_bitshuffle and typesize <= _MAX_SPLITS
             and blocksize // typesize >= _MIN_BUFFERSIZE)
    flags = (codec << 5) | (_SHUFFLE if do_shuffle else 0) \
        | (_BITSHUFFLE if do_bitshuffle else 0) \
        | (0 if split else _DONT_SPLIT)
    nblocks = -(-nbytes // blocksize) if nbytes else 1
    leftover = nbytes % blocksize
    bstarts: list[int] = []
    body = bytearray()
    base = 16 + 4 * nblocks
    for bi in range(nblocks):
        lo = bi * blocksize
        block = data[lo:lo + blocksize]
        bsize = len(block)
        leftoverblock = bi == nblocks - 1 and leftover
        if do_bitshuffle and bsize:
            block = _bit_shuffle(block, typesize)
        elif do_shuffle and bsize:
            block = _shuffle(block, typesize)
        nstreams = 1 if (not split or leftoverblock or typesize == 1) \
            else typesize
        if bsize % nstreams:
            nstreams = 1
        neblock = bsize // nstreams if nstreams else 0
        bstarts.append(base + len(body))
        for si in range(nstreams):
            stream = bytes(block[si * neblock:(si + 1) * neblock])
            comp = _inner_compress(codec, stream, clevel)
            if len(comp) >= neblock:
                body += struct.pack("<i", neblock) + stream
            else:
                body += struct.pack("<i", len(comp)) + comp
    cbytes = base + len(body)
    if cbytes >= nbytes + 16:           # incompressible → memcpy frame
        header = struct.pack("<BBBBiii", 2, 1, _MEMCPYED,
                             typesize & 0xFF, nbytes, blocksize,
                             nbytes + 16)
        return header + data
    header = struct.pack("<BBBBiii", 2, 1, flags, typesize & 0xFF,
                         nbytes, blocksize, cbytes)
    return header + struct.pack(f"<{nblocks}i", *bstarts) + bytes(body)
