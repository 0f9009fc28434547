"""Dependency-free RIFF/AVI container codec for MJPEG video — the one
container format whose frames a pure-Python stack can really decode
(each Motion-JPEG frame is a standalone baseline JPEG, and
sources/jpeg_codec.py already decodes those). Gives the video
operators (video_fingerprint, scene_cuts, video frame features) a
REAL container path without PyAV; H.264/VP9 in MP4/WebM stay behind
the plugin seam as named gates (operators/multimodal.py).

Reference analog: none — georiva's formats/ covers GRIB/NetCDF/GeoTIFF
only (no video at all); this is part of the north-star multimodal
surface. Container layout follows the public AVI RIFF specification
(msdn AVIMAINHEADER/AVISTREAMHEADER/BITMAPINFOHEADER) and OpenDML:
RIFF('AVI ' LIST('hdrl' 'avih' LIST('strl' 'strh' 'strf'))
             LIST('movi' '00dc'…) 'idx1').

``avi_mjpeg_decode`` → (n_frames, h, w) float32 grayscale (ITU-R 601
luma, matching the PyAV plugin's convention); ``avi_mjpeg_encode`` is
the fixture writer (frames → quality-q baseline JPEGs in a spec-correct
AVI with index).
"""

from __future__ import annotations

import struct

import numpy as np

_MJPG_CODES = {b"MJPG", b"mjpg", b"dmb1", b"DMB1"}


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from("<I", b, off)[0]


def _walk_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for each RIFF chunk
    in [start, end); chunks are word-aligned (odd sizes pad 1 byte)."""
    pos = start
    while pos + 8 <= end:
        fcc = data[pos:pos + 4]
        size = _u32(data, pos + 4)
        yield fcc, pos + 8, size
        pos += 8 + size + (size & 1)


def _video_codec(data: bytes, hdrl_start: int, hdrl_end: int) -> bytes:
    """Find the first 'vids' stream's codec fourcc (strh fccHandler,
    falling back to strf biCompression)."""
    for fcc, p, sz in _walk_chunks(data, hdrl_start, hdrl_end):
        if fcc == b"LIST" and data[p:p + 4] == b"strl":
            handler = compression = None
            is_video = False
            for sfcc, sp, ssz in _walk_chunks(data, p + 4, p + sz):
                if sfcc == b"strh" and ssz >= 8:
                    is_video = data[sp:sp + 4] == b"vids"
                    handler = data[sp + 4:sp + 8]
                elif sfcc == b"strf" and ssz >= 20:
                    # BITMAPINFOHEADER.biCompression at offset 16
                    compression = data[sp + 16:sp + 20]
            if is_video:
                if handler and handler.strip(b"\x00 "):
                    return handler
                if compression:
                    return compression
    raise ValueError("AVI: no video ('vids') stream in hdrl")


def avi_mjpeg_decode(content: bytes) -> np.ndarray:
    """Decode an MJPEG AVI → (n_frames, h, w) float32 grayscale.
    Raises by NAME for non-MJPEG codecs (H.264/XVID/… need a plugin
    backend) and for uncompressed-DIB streams."""
    from georiva_spark.sources.jpeg_codec import jpeg_decode

    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    end = min(len(content), 8 + _u32(content, 4))

    # two passes: find hdrl and gate on the codec FIRST, so a reordered
    # file (movi before hdrl) cannot feed H.264 bytes into jpeg_decode
    # and fail with an opaque JPEG error instead of the named gate
    codec = None
    movi_ranges: list[tuple[int, int]] = []
    for fcc, p, sz in _walk_chunks(content, 12, end):
        if fcc != b"LIST":
            continue
        ltype = content[p:p + 4]
        if ltype == b"hdrl":
            codec = _video_codec(content, p + 4, p + sz)
        elif ltype == b"movi":
            movi_ranges.append((p + 4, p + sz))
    if codec is None:
        raise ValueError("AVI: missing hdrl header list")
    if codec not in _MJPG_CODES:
        raise NotImplementedError(
            f"AVI codec {codec!r}: only MJPEG decodes natively — "
            "register a plugin backend (register_video_decoder) for "
            "other codecs")

    frames: list[np.ndarray] = []

    def movi(data: bytes, start: int, stop: int) -> None:
        for fcc, p, sz in _walk_chunks(data, start, stop):
            if fcc == b"LIST" and data[p:p + 4] == b"rec ":
                movi(data, p + 4, p + sz)       # OpenDML rec grouping
            elif fcc[2:4] in (b"dc", b"db") and sz > 0:
                if fcc[2:4] == b"db":
                    raise NotImplementedError(
                        "AVI uncompressed-DIB ('..db') frames: only "
                        "MJPEG ('..dc' JPEG) streams decode natively")
                a = jpeg_decode(data[p:p + sz]).astype(np.float32)
                if a.shape[2] == 1:
                    frames.append(a[:, :, 0])
                else:
                    frames.append(a[:, :, 0] * 0.299
                                  + a[:, :, 1] * 0.587
                                  + a[:, :, 2] * 0.114)

    for mstart, mstop in movi_ranges:
        movi(content, mstart, mstop)
    if not frames:
        raise ValueError("AVI: movi list has no video frames")
    shapes = {f.shape for f in frames}
    if len(shapes) > 1:
        raise ValueError(f"AVI: inconsistent frame shapes {shapes}")
    return np.stack(frames)


def avi_mjpeg_encode(frames: np.ndarray, fps: int = 25,
                     quality: int = 95,
                     jpegs: list[bytes] | None = None) -> bytes:
    """Encode (n, h, w) or (n, h, w, 3) uint8 frames as an MJPEG AVI
    (fixture writer): avih + one 'vids'/'MJPG' stream + movi of '00dc'
    baseline JPEGs + idx1. ``jpegs`` lets a caller supply the
    per-frame JPEG bytes (e.g. memoized encodes of repeated frames);
    ``frames`` still fixes n/h/w for the headers."""
    from georiva_spark.sources.jpeg_codec import jpeg_encode

    a = np.asarray(frames, dtype=np.uint8)
    n = a.shape[0]
    h, w = a.shape[1], a.shape[2]
    if jpegs is not None:
        if len(jpegs) != n:
            raise ValueError(
                f"avi_mjpeg_encode: {len(jpegs)} jpegs for {n} frames")
        jpgs = list(jpegs)
    else:
        jpgs = [jpeg_encode(a[i], quality=quality) for i in range(n)]
    maxbuf = max(len(j) for j in jpgs)

    def chunk(fcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,        # dwMicroSecPerFrame
        maxbuf * fps,            # dwMaxBytesPerSec
        0,                       # dwPaddingGranularity
        0x10,                    # dwFlags: AVIF_HASINDEX
        n, 0, 1,                 # totalframes, initialframes, streams
        maxbuf, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIIIhhhh",
                          0, 0, 0, 0,        # flags, prio, lang, initial
                          1, fps,            # scale, rate -> fps
                          0, n,              # start, length
                          maxbuf, 10_000,    # bufsize, quality
                          0,                 # samplesize
                          0, 0, w, h))       # rcFrame
    strf = struct.pack("<IiiHHIIiiII",
                       40, w, h, 1, 24,      # BITMAPINFOHEADER
                       struct.unpack("<I", b"MJPG")[0],
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl",
               chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_payload = b"movi"
    offsets = []
    for j in jpgs:
        offsets.append(len(movi_payload))    # offset from 'movi' fourcc
        movi_payload += chunk(b"00dc", j)
    movi = chunk(b"LIST", movi_payload)

    idx = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, len(j))
        for off, j in zip(offsets, jpgs))
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body
