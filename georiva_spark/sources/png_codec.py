"""Dependency-free PNG codec (stdlib zlib + numpy) for GRIB2 template
5.41 (PNG packing).

The reference reads PNG-packed GRIB via eccodes (formats/grib.py:61-144);
this container has no eccodes, but PNG is just zlib + five per-scanline
byte filters — the same spirit as the native TIFF predictor work. Only
the subset GRIB PNG packing produces/consumes is supported:

- color type 0 (grayscale) at bit depth 8 or 16,
- color type 2 (RGB, 8-bit)  → one 24-bit big-endian sample per pixel,
- color type 6 (RGBA, 8-bit) → one 32-bit big-endian sample per pixel,
- filters 0-4 (None/Sub/Up/Average/Paeth), no interlace.

That is exactly the sample-width ladder eccodes' png packing uses for
bits-per-value ≤8 / ≤16 / ≤24 / ≤32. The encoder always writes filter 0
scanlines (valid PNG; zlib does the compression work).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(tag + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)


def png_encode(samples: np.ndarray, width: int, height: int,
               nbits: int) -> bytes:
    """Pack non-negative int samples (length width*height, row-major)
    into a PNG whose per-pixel big-endian sample width is the smallest
    of 8/16/24/32 bits that holds ``nbits``."""
    x = np.asarray(samples, dtype=np.int64).reshape(height, width)
    if nbits <= 8:
        depth, color, nch = 8, 0, 1
    elif nbits <= 16:
        depth, color, nch = 16, 0, 1
    elif nbits <= 24:
        depth, color, nch = 8, 2, 3
    else:
        depth, color, nch = 8, 6, 4
    nbytes = (depth // 8) * nch
    shifts = np.arange(nbytes - 1, -1, -1, dtype=np.int64) * 8
    rows = ((x[:, :, None] >> shifts[None, None, :]) & 0xFF).astype(np.uint8)
    raw = np.concatenate(
        [np.zeros((height, 1), np.uint8),          # filter byte 0 per row
         rows.reshape(height, width * nbytes)], axis=1)
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
            + _chunk(b"IEND", b""))


def png_encode_image(pixels: np.ndarray) -> bytes:
    """Encode an (h, w) or (h, w, c) uint8 array (c in {1, 3, 4}) as a
    real grayscale/RGB/RGBA PNG — filter-0 scanlines, zlib level 6.
    Round-trips through png_decode_image bit-exactly."""
    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color = {1: 0, 3: 2, 4: 6}.get(c)
    if color is None:
        raise ValueError(f"PNG channel count {c} (1/3/4 only)")
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), a.reshape(h, w * c)], axis=1)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: np.ndarray, height: int, stride: int,
              bpp: int) -> np.ndarray:
    """Undo per-scanline filters in place → (height, stride) uint8."""
    raw = raw.reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint8)
    for r in range(height):
        f = int(raw[r, 0])
        line = raw[r, 1:].astype(np.int64)
        prev = out[r - 1].astype(np.int64) if r else np.zeros(stride,
                                                             np.int64)
        if f == 0:
            out[r] = line.astype(np.uint8)
        elif f == 2:                                   # Up
            out[r] = ((line + prev) & 0xFF).astype(np.uint8)
        elif f == 1:                                   # Sub
            cur = line
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
            out[r] = cur.astype(np.uint8)
        elif f == 3:                                   # Average
            cur = line
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
            out[r] = cur.astype(np.uint8)
        elif f == 4:                                   # Paeth
            cur = line
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                ul = int(prev[i - bpp]) if i >= bpp else 0
                cur[i] = (cur[i] + _paeth(left, int(prev[i]), ul)) & 0xFF
            out[r] = cur.astype(np.uint8)
        else:
            raise NotImplementedError(f"PNG filter type {f}")
    return out


def _walk_chunks(data: bytes):
    """→ (width, height, depth, color, idat, plte, trns)."""
    if data[:8] != _SIG:
        raise ValueError("bad PNG signature")
    pos = 8
    width = height = depth = color = None
    idat = bytearray()
    plte = trns = None
    while pos < len(data):
        ln = struct.unpack(">I", data[pos:pos + 4])[0]
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", body)
            if ilace:
                raise NotImplementedError("interlaced PNG")
            if comp or filt:
                raise ValueError("bad IHDR compression/filter method")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(body, np.uint8)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    return width, height, depth, color, bytes(idat), plte, trns


def _decode_planes(data: bytes) -> tuple[np.ndarray, int, int, int, int]:
    """Shared chunk walk + unfilter → (pixel bytes (h, w*nbytes),
    width, height, depth, nch)."""
    width, height, depth, color, idat, _, _ = _walk_chunks(data)
    nch = {0: 1, 2: 3, 6: 4}.get(color)
    if nch is None or depth not in (8, 16):
        raise NotImplementedError(
            f"PNG color type {color} / bit depth {depth}")
    nbytes = (depth // 8) * nch
    raw = np.frombuffer(zlib.decompress(idat), np.uint8)
    if raw.size != height * (width * nbytes + 1):
        raise ValueError("PNG scanline size mismatch")
    px = _unfilter(raw.copy(), height, width * nbytes, nbytes)
    return px, width, height, depth, nch


def _decode_palette(data: bytes) -> np.ndarray:
    """Color type 3 (indexed) → (h, w, 3) or (h, w, 4 with tRNS) uint8.
    Indices at depth 1/2/4 pack MSB-first within scanline bytes; each
    scanline pads to a byte boundary."""
    width, height, depth, color, idat, plte, trns = _walk_chunks(data)
    if plte is None:
        raise ValueError("palette PNG missing PLTE")
    if depth not in (1, 2, 4, 8):
        raise NotImplementedError(f"palette PNG bit depth {depth}")
    stride = (width * depth + 7) // 8
    raw = np.frombuffer(zlib.decompress(idat), np.uint8)
    if raw.size != height * (stride + 1):
        raise ValueError("PNG scanline size mismatch")
    px = _unfilter(raw.copy(), height, stride, 1)
    if depth == 8:
        idx = px[:, :width]
    else:
        bits = np.unpackbits(px, axis=1)
        idx = np.zeros((height, width), np.uint8)
        for b in range(depth):
            idx = (idx << 1) | bits[:, b::depth][:, :width]
    if int(idx.max(initial=0)) >= len(plte):
        raise ValueError("palette index out of range")
    rgb = plte[idx]
    if trns is not None:
        alpha = np.full(len(plte), 255, np.uint8)
        alpha[:len(trns)] = trns
        return np.concatenate([rgb, alpha[idx][:, :, None]], axis=2)
    return rgb


def png_decode(data: bytes) -> tuple[np.ndarray, int, int]:
    """→ (samples int64 row-major, width, height). One integer sample
    per pixel, big-endian across the pixel's channel bytes (the GRIB2
    5.41 packing contract)."""
    px, width, height, depth, nch = _decode_planes(data)
    nbytes = (depth // 8) * nch
    shifts = np.arange(nbytes - 1, -1, -1, dtype=np.int64) * 8
    samples = (px.reshape(height * width, nbytes).astype(np.int64)
               << shifts[None, :]).sum(axis=1)
    return samples, width, height


def png_decode_image(data: bytes) -> np.ndarray:
    """→ (h, w, channels) per-CHANNEL pixel array (uint8 for depth 8,
    uint16 for depth 16) — the image-processing view of the same
    decoder (vs png_decode's combined GRIB sample integers). Indexed
    (palette) PNGs resolve through PLTE/tRNS to RGB(A)."""
    if len(data) > 25 and data[25] == 3:        # IHDR color type
        return _decode_palette(data)
    px, width, height, depth, nch = _decode_planes(data)
    a = px.reshape(height, width, nch, depth // 8)
    if depth == 8:
        return a[:, :, :, 0]
    return (a[:, :, :, 0].astype(np.uint16) << 8) | a[:, :, :, 1]
