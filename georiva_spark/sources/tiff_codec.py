"""Dependency-free GeoTIFF codec (stdlib struct + zlib + numpy).

Implements exactly the envelope the reference engine produces and
consumes: baseline TIFF (classic, little/big-endian), strip or tile
layout, uncompressed / deflate / LZW (early-change, the libtiff
convention) / PackBits with predictor 1/2/3, sample formats
uint/int/float, GeoTIFF ModelPixelScale/ModelTiepoint georeferencing,
and the GDAL_NODATA ascii tag. The reference writes COGs as
deflate + predictor-by-dtype (3 for floats, 2 for ints) via rasterio
(ingestion/asset_writer.py:213-235); the decoder here reads those
payloads without rasterio, which is absent from this container.

Predictor 3 (floating point) follows libtiff tif_predict.c: per
scanline, sample bytes are stored plane-major MSB-first and
horizontally byte-differenced; decode = byte cumsum then plane
reassembly. Predictor 2 is per-channel horizontal differencing in the
sample's (modular) integer arithmetic.
"""

from __future__ import annotations

import math
import struct
import zlib

import numpy as np

# TIFF tag ids
IMAGE_WIDTH = 256
IMAGE_LENGTH = 257
BITS_PER_SAMPLE = 258
COMPRESSION = 259          # 1=none, 5=LZW, 8/32946=deflate, 32773=PackBits
PHOTOMETRIC = 262
STRIP_OFFSETS = 273
SAMPLES_PER_PIXEL = 277
ROWS_PER_STRIP = 278
STRIP_BYTE_COUNTS = 279
PLANAR_CONFIG = 284        # 1=chunky, 2=planar
PREDICTOR = 317            # 1=none, 2=horizontal, 3=floating point
TILE_WIDTH = 322
TILE_LENGTH = 323
TILE_OFFSETS = 324
TILE_BYTE_COUNTS = 325
SAMPLE_FORMAT = 339        # 1=uint, 2=int, 3=float
MODEL_PIXEL_SCALE = 33550  # [sx, sy, sz]
MODEL_TIEPOINT = 33922     # [i, j, k, x, y, z]
GDAL_NODATA = 42113        # ascii

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
               11: 4, 12: 8, 16: 8, 17: 8, 18: 8}
_TYPE_FMT = {3: "H", 4: "I", 8: "h", 9: "i", 11: "f", 12: "d",
             16: "Q", 17: "q", 18: "Q"}


def lzw_decode(data: bytes) -> bytes:
    """TIFF-flavor LZW (compression 5): MSB-first variable-width codes,
    ClearCode 256 / EOI 257, EARLY code-width change (width grows once
    table entry 510/1022/2046 exists — the libtiff convention, one code
    earlier than GIF). Strips/tiles are bounded, so the per-code Python
    loop stays off any per-pixel hot path."""
    out = bytearray()
    table: list[bytes] | None = None
    bitpos, width = 0, 9
    prev = b""
    nbits = len(data) * 8
    while True:
        if bitpos + width > nbits:
            break
        end = (bitpos + width + 7) // 8
        v = int.from_bytes(data[bitpos // 8:end], "big")
        code = (v >> (end * 8 - (bitpos + width))) & ((1 << width) - 1)
        bitpos += width
        if code == 257:                          # EOI
            break
        if code == 256:                          # Clear
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            if bitpos + width > nbits:
                break
            end = (bitpos + width + 7) // 8
            v = int.from_bytes(data[bitpos // 8:end], "big")
            code = (v >> (end * 8 - (bitpos + width))) & ((1 << width) - 1)
            bitpos += width
            if code == 257:
                break
            prev = table[code]
            out += prev
            continue
        if table is None:
            raise ValueError("LZW stream must start with ClearCode")
        if code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:                                    # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1                           # early change
    return bytes(out)


def lzw_encode(data: bytes) -> bytes:
    """TIFF LZW encoder (round-trip tests + writer option) — emits the
    early-change widths lzw_decode expects."""
    bits = bytearray()
    acc = nacc = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, nacc
        acc = (acc << width) | code
        nacc += width
        while nacc >= 8:
            bits.append((acc >> (nacc - 8)) & 0xFF)
            nacc -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(256)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) and width < 12:
            width += 1
        w = wc[-1:]
        if next_code == 4094:                    # table full → reset
            emit(table[w])
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
            w = b""
    if w:
        emit(table[w])
    emit(257)
    if nacc:
        bits.append((acc << (8 - nacc)) & 0xFF)
    return bytes(bits)


def packbits_decode(data: bytes) -> bytes:
    """PackBits (compression 32773): n∈[0,127] copy n+1 literals;
    n∈[-127,-1] repeat next byte 1-n times; -128 no-op."""
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i] - 256 if data[i] > 127 else data[i]
        i += 1
        if n >= 0:
            out += data[i:i + n + 1]
            i += n + 1
        elif n != -128:
            out += data[i:i + 1] * (1 - n)
            i += 1
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while (i + run < len(data) and run < 128
               and data[i + run] == data[i]):
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while (i < len(data) and i - lit < 128
               and not (i + 1 < len(data) and data[i + 1] == data[i]
                        and i + 2 < len(data) and data[i + 2] == data[i])):
            i += 1
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


def _read_ifd(buf: bytes, off: int, bo: str, big: bool = False) -> dict:
    """Classic (12-byte entries, u32 offsets) or BigTIFF (20-byte
    entries, u64 counts/offsets) IFD."""
    if big:
        n = struct.unpack_from(bo + "Q", buf, off)[0]
        base, esz, inline = off + 8, 20, 8
    else:
        n = struct.unpack_from(bo + "H", buf, off)[0]
        base, esz, inline = off + 2, 12, 4
    tags: dict = {}
    for i in range(n):
        e = base + i * esz
        if big:
            tag, typ = struct.unpack_from(bo + "HH", buf, e)
            cnt = struct.unpack_from(bo + "Q", buf, e + 4)[0]
            vpos = e + 12
        else:
            tag, typ, cnt = struct.unpack_from(bo + "HHI", buf, e)
            vpos = e + 8
        size = _TYPE_SIZES.get(typ, 1) * cnt
        voff = vpos if size <= inline else struct.unpack_from(
            bo + ("Q" if big else "I"), buf, vpos)[0]
        if typ == 2:
            tags[tag] = buf[voff:voff + cnt].split(b"\0")[0].decode(
                "ascii", "replace")
        elif typ in _TYPE_FMT:
            tags[tag] = list(struct.unpack_from(
                bo + str(cnt) + _TYPE_FMT[typ], buf, voff))
        elif typ == 5:  # rational
            v = struct.unpack_from(bo + str(2 * cnt) + "I", buf, voff)
            tags[tag] = [v[2 * j] / v[2 * j + 1] for j in range(cnt)]
        else:
            tags[tag] = bytes(buf[voff:voff + size])
    return tags


def _cumsum_wrap(a: np.ndarray, axis: int) -> np.ndarray:
    """Modular cumulative sum preserving the (unsigned) dtype wraparound."""
    with np.errstate(over="ignore"):
        return np.cumsum(a, axis=axis, dtype=a.dtype)


def _undo_predictor2(arr: np.ndarray, channels: int) -> np.ndarray:
    """arr (rows, cols*channels) native integer dtype → horizontal
    accumulate per channel, modular."""
    u = arr.view(np.dtype(f"u{arr.dtype.itemsize}"))
    rows, n = u.shape
    u = u.reshape(rows, n // channels, channels)
    acc = _cumsum_wrap(u, axis=1).reshape(rows, n)
    return acc.view(arr.dtype)


def _undo_predictor3(raw: bytes, rows: int, wc: int, bsz: int,
                     stride: int) -> np.ndarray:
    """libtiff fpAcc: per scanline, byte cumsum (stride = samples per
    pixel) then reassemble plane-major MSB-first bytes into big-endian
    floats. Returns (rows, wc) float array (wc = width*spp samples)."""
    b = np.frombuffer(raw, np.uint8, count=rows * wc * bsz).reshape(
        rows, wc * bsz).copy()
    if stride == 1:
        b = _cumsum_wrap(b, axis=1)
    else:
        for c in range(stride):
            b[:, c::stride] = _cumsum_wrap(b[:, c::stride], axis=1)
    planes = b.reshape(rows, bsz, wc)
    be = np.empty((rows, wc, bsz), np.uint8)
    for j in range(bsz):
        be[:, :, j] = planes[:, j, :]
    ftype = {4: ">f4", 8: ">f8"}[bsz]
    return np.frombuffer(be.tobytes(), dtype=ftype).reshape(rows, wc)


def decode_tiff(content: bytes):
    """Parse the first IFD of a classic TIFF.

    Returns (bands, nodata, geo, flip_to_south_up) where bands is
    (spp, H, W) in native dtype, geo = (sx, sy, x0, y0) from
    ModelPixelScale/Tiepoint (None if absent), and flip_to_south_up
    is True for north-up files (tiepoint at top edge — the standard
    case), meaning callers that want row 0 = southernmost must flipud.
    """
    bo = {b"II": "<", b"MM": ">"}.get(content[:2])
    if bo is None:
        raise ValueError("not a TIFF payload")
    version = struct.unpack_from(bo + "H", content, 2)[0]
    if version == 42:                               # classic
        ifd_off = struct.unpack_from(bo + "I", content, 4)[0]
        tags = _read_ifd(content, ifd_off, bo)
    elif version == 43:                             # BigTIFF
        osz, zero = struct.unpack_from(bo + "HH", content, 4)
        if osz != 8 or zero != 0:
            raise ValueError("malformed BigTIFF header")
        ifd_off = struct.unpack_from(bo + "Q", content, 8)[0]
        tags = _read_ifd(content, ifd_off, bo, big=True)
    else:
        raise ValueError(f"unknown TIFF version {version}")

    w = tags[IMAGE_WIDTH][0]
    h = tags[IMAGE_LENGTH][0]
    spp = tags.get(SAMPLES_PER_PIXEL, [1])[0]
    bps = tags.get(BITS_PER_SAMPLE, [8])[0]
    comp = tags.get(COMPRESSION, [1])[0]
    pred = tags.get(PREDICTOR, [1])[0]
    sfmt = tags.get(SAMPLE_FORMAT, [1])[0]
    planar = tags.get(PLANAR_CONFIG, [1])[0]
    bsz = bps // 8
    dtype = np.dtype({1: "u", 2: "i", 3: "f"}[sfmt] + str(bsz)
                     ).newbyteorder(bo)

    tiled = TILE_OFFSETS in tags
    if tiled:
        tw, th = tags[TILE_WIDTH][0], tags[TILE_LENGTH][0]
        offs, cnts = tags[TILE_OFFSETS], tags[TILE_BYTE_COUNTS]
        tiles_x = math.ceil(w / tw)
        segs_per_plane = tiles_x * math.ceil(h / th)
    else:
        rps = tags.get(ROWS_PER_STRIP, [h])[0]
        offs, cnts = tags[STRIP_OFFSETS], tags[STRIP_BYTE_COUNTS]
        segs_per_plane = math.ceil(h / rps)

    n_planes = spp if planar == 2 else 1
    ch = 1 if planar == 2 else spp
    out = np.empty((spp, h, w), dtype=dtype.newbyteorder("="))
    for p in range(n_planes):
        for s in range(segs_per_plane):
            idx = p * segs_per_plane + s
            raw = content[offs[idx]:offs[idx] + cnts[idx]]
            if comp in (8, 32946):
                raw = zlib.decompress(raw)
            elif comp == 5:
                raw = lzw_decode(raw)
            elif comp == 32773:
                raw = packbits_decode(raw)
            elif comp != 1:
                raise NotImplementedError(f"TIFF compression {comp}")
            if tiled:
                rows, cols = th, tw
                ty, tx = divmod(s, tiles_x)
                y0s, x0s = ty * th, tx * tw
            else:
                rows = min(rps, h - s * rps)
                cols = w
                y0s, x0s = s * rps, 0
            wc = cols * ch
            if pred == 3:
                seg = _undo_predictor3(raw, rows, wc, bsz, ch).astype(
                    dtype.newbyteorder("="))
            else:
                seg = np.frombuffer(raw, dtype=dtype,
                                    count=rows * wc).reshape(rows, wc)
                if pred == 2:
                    seg = _undo_predictor2(seg, ch)
            seg = seg.reshape(rows, cols, ch)
            vy = min(rows, h - y0s)
            vx = min(cols, w - x0s)
            for c in range(ch):
                band = p if planar == 2 else c
                out[band, y0s:y0s + vy, x0s:x0s + vx] = seg[:vy, :vx, c]

    nodata = None
    if GDAL_NODATA in tags:
        try:
            nodata = float(tags[GDAL_NODATA].strip().strip("\0"))
        except ValueError:
            nodata = None
    geo = None
    flip = False
    if MODEL_PIXEL_SCALE in tags and MODEL_TIEPOINT in tags:
        sx, sy = tags[MODEL_PIXEL_SCALE][0], tags[MODEL_PIXEL_SCALE][1]
        tp = tags[MODEL_TIEPOINT]
        # tiepoint maps raster (i,j) -> model (x,y); standard files pin
        # (0,0) at the top-left corner → transform.e = -sy (north-up).
        x0 = tp[3] - sx * tp[0]
        y_top = tp[4] + sy * tp[1]
        geo = (float(sx), float(sy), float(x0), float(y_top))
        flip = sy > 0  # north-up (the normal case) → flip for south-up grids
    return out, nodata, geo, flip


def _apply_predictor2(arr: np.ndarray, channels: int) -> np.ndarray:
    u = arr.view(np.dtype(f"u{arr.dtype.itemsize}"))
    rows, n = u.shape
    v = u.reshape(rows, n // channels, channels)
    d = v.copy()
    with np.errstate(over="ignore"):
        d[:, 1:, :] = v[:, 1:, :] - v[:, :-1, :]
    return d.reshape(rows, n).view(arr.dtype)


def _apply_predictor3(arr: np.ndarray) -> bytes:
    """Encode (rows, wc) floats: plane-major MSB-first bytes per row,
    then horizontal byte differencing (stride 1 — single band)."""
    rows, wc = arr.shape
    bsz = arr.dtype.itemsize
    be = np.frombuffer(arr.astype(f">f{bsz}").tobytes(),
                       np.uint8).reshape(rows, wc, bsz)
    planes = np.empty((rows, bsz, wc), np.uint8)
    for j in range(bsz):
        planes[:, j, :] = be[:, :, j]
    flat = planes.reshape(rows, bsz * wc)
    d = flat.copy()
    with np.errstate(over="ignore"):
        d[:, 1:] = flat[:, 1:] - flat[:, :-1]
    return d.tobytes()


def encode_geotiff(a: np.ndarray, *, pixel_scale: tuple[float, float],
                   tiepoint_xy: tuple[float, float],
                   nodata: float | None = None,
                   compression: str = "deflate",
                   predictor: int | None = None,
                   rows_per_strip: int | None = None,
                   tile: tuple[int, int] | None = None,
                   bigtiff: bool = False) -> bytes:
    """Encode a 2-D (h, w) or chunky multi-band (h, w, spp) array as a
    little-endian GeoTIFF (classic, or BigTIFF with ``bigtiff`` — the
    64-bit layout COGs over 4 GB require).

    Mirrors the reference writer's choices (deflate, predictor 3 for
    floats / 2 for ints, ingestion/asset_writer.py:86-99,213-235).
    Multi-band arrays use predictor 1/2 (the float predictor's byte
    stride is only wired for spp=1). `tiepoint_xy` is the model (x, y)
    of the top-left corner; north-up.
    """
    a = np.ascontiguousarray(a)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, spp = a.shape
    if predictor is None:
        predictor = (3 if a.dtype.kind == "f" and spp == 1 else
                     2 if a.dtype.kind in "iu" else 1)
    if predictor == 3 and spp > 1:
        raise ValueError("float predictor supported for single band only")
    sfmt = {"u": 1, "i": 2, "f": 3}[a.dtype.kind]
    bsz = a.dtype.itemsize
    comp = {"deflate": 8, "lzw": 5, "packbits": 32773, "none": 1}[
        compression]
    le = a.astype(a.dtype.newbyteorder("<"))

    def enc_rows(block: np.ndarray) -> bytes:
        rows = block.shape[0]
        flat = block.reshape(rows, -1)   # (rows, cols*spp) chunky
        if predictor == 3:
            raw = _apply_predictor3(flat)
        elif predictor == 2:
            raw = _apply_predictor2(flat.copy(), spp).tobytes()
        else:
            raw = flat.tobytes()
        if comp == 8:
            return zlib.compress(raw, 6)
        if comp == 5:
            return lzw_encode(raw)
        if comp == 32773:
            return packbits_encode(raw)
        return raw

    segs: list[bytes] = []
    if tile is not None:
        tw, th = tile
        for ty in range(math.ceil(h / th)):
            for tx in range(math.ceil(w / tw)):
                block = np.zeros((th, tw, spp), dtype=le.dtype)
                sub = le[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
                block[:sub.shape[0], :sub.shape[1]] = sub
                segs.append(enc_rows(block))
    else:
        rps = rows_per_strip or min(h, max(1, (1 << 16)
                                           // max(1, w * spp * bsz)))
        for s in range(math.ceil(h / rps)):
            segs.append(enc_rows(le[s * rps:(s + 1) * rps]))

    entries: list[tuple[int, int, int, object]] = [
        (IMAGE_WIDTH, 4, 1, [w]),
        (IMAGE_LENGTH, 4, 1, [h]),
        (BITS_PER_SAMPLE, 3, spp, [bsz * 8] * spp),
        (COMPRESSION, 3, 1, [comp]),
        (PHOTOMETRIC, 3, 1, [1]),
        (SAMPLES_PER_PIXEL, 3, 1, [spp]),
        (PLANAR_CONFIG, 3, 1, [1]),
        (PREDICTOR, 3, 1, [predictor]),
        (SAMPLE_FORMAT, 3, spp, [sfmt] * spp),
        (MODEL_PIXEL_SCALE, 12, 3,
         [float(pixel_scale[0]), float(pixel_scale[1]), 0.0]),
        (MODEL_TIEPOINT, 12, 6,
         [0.0, 0.0, 0.0, float(tiepoint_xy[0]), float(tiepoint_xy[1]), 0.0]),
    ]
    if tile is not None:
        entries += [(TILE_WIDTH, 3, 1, [tile[0]]),
                    (TILE_LENGTH, 3, 1, [tile[1]]),
                    (TILE_OFFSETS, 4, len(segs), None),
                    (TILE_BYTE_COUNTS, 4, len(segs),
                     [len(s) for s in segs])]
    else:
        entries += [(STRIP_OFFSETS, 4, len(segs), None),
                    (ROWS_PER_STRIP, 4, 1, [rps]),
                    (STRIP_BYTE_COUNTS, 4, len(segs),
                     [len(s) for s in segs])]
    if nodata is not None:
        nd = f"{nodata:g}\0".encode("ascii")
        entries.append((GDAL_NODATA, 2, len(nd), nd))
    if bigtiff:
        # 8-byte segment offsets (LONG8) so >4 GB files address cleanly
        entries = [(tag, 16 if tag in (STRIP_OFFSETS, TILE_OFFSETS)
                    else typ, cnt, val) for tag, typ, cnt, val in entries]
    entries.sort(key=lambda e: e[0])

    n = len(entries)
    if bigtiff:
        ifd_off, inline = 16, 8
        ext_off = ifd_off + 8 + n * 20 + 8
    else:
        ifd_off, inline = 8, 4
        ext_off = ifd_off + 2 + n * 12 + 4
    ext: list[bytes] = []
    # first pass: size the external value area (offsets tag included)
    sizes = []
    for tag, typ, cnt, val in entries:
        size = _TYPE_SIZES[typ] * cnt
        sizes.append(size if size > inline else 0)
    data_off = ext_off + sum(sizes)
    seg_offsets = []
    pos = data_off
    for s in segs:
        seg_offsets.append(pos)
        pos += len(s)

    def pack_val(typ: int, cnt: int, val) -> bytes:
        if typ == 2:
            return bytes(val)
        fmt = {3: "H", 4: "I", 12: "d", 16: "Q"}[typ]
        return struct.pack("<" + str(cnt) + fmt, *val)

    out = bytearray()
    if bigtiff:
        out += b"II" + struct.pack("<HHHQ", 43, 8, 0, ifd_off)
        out += struct.pack("<Q", n)
    else:
        out += b"II" + struct.pack("<HI", 42, ifd_off)
        out += struct.pack("<H", n)
    cur_ext = ext_off
    for (tag, typ, cnt, val), size in zip(entries, sizes):
        if val is None:  # offsets tag
            val = seg_offsets
        payload = pack_val(typ, cnt, val)
        if bigtiff:
            ehead = struct.pack("<HHQ", tag, typ, cnt)
            if len(payload) <= 8:
                out += ehead + payload.ljust(8, b"\0")
            else:
                out += ehead + struct.pack("<Q", cur_ext)
                ext.append(payload)
                cur_ext += len(payload)
        elif len(payload) <= 4:
            out += struct.pack("<HHI", tag, typ, cnt) + payload.ljust(4, b"\0")
        else:
            out += struct.pack("<HHI", tag, typ, cnt) + struct.pack(
                "<I", cur_ext)
            ext.append(payload)
            cur_ext += len(payload)
    out += struct.pack("<Q" if bigtiff else "<I", 0)  # next IFD
    for payload in ext:
        out += payload
    for s in segs:
        out += s
    return bytes(out)
