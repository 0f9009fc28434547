"""Dependency-free baseline JPEG codec (stdlib + numpy) for the
multimodal image operators.

A real crawl pipeline's image column is overwhelmingly JPEG; the
reference hands decode to PIL/rasterio, neither of which is in this
container. Baseline JFIF is a bounded, fully-public format (ITU-T.81 /
ISO 10918-1): Huffman-coded 8×8 DCT blocks over YCbCr. Implemented in
the same spirit as the PNG/J2K/AEC codecs — from the spec, decode-first,
with named gates for the variants outside the subset:

- decode: SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOF2/SOS/EOI; grayscale,
  4:4:4 and 4:2:0 (and any H,V ≤ 2 factor mix); restart markers;
  byte-stuffing; 8-bit precision. SOF2 PROGRESSIVE decodes natively:
  multi-scan spectral selection + successive approximation into
  per-component coefficient buffers (DC first/refine interleaved or
  not, AC first with EOB runs, AC refine with correction-bit
  interleaving per ITU-T.81 G.2 / libjpeg jdphuff semantics).
  SOF1/3/5+ (extended/lossless/arithmetic) and 12-bit precision raise
  NotImplementedError by name.
- encode (tests/fixtures): baseline grayscale or RGB 4:4:4/4:2:0 with
  optional restart intervals, and ``jpeg_encode_progressive`` (the
  classic spectral-selection + successive-approximation scan script,
  per-scan Huffman tables) — verified by the invariant
  decode(progressive(img)) == decode(baseline(img)) bit-exactly.

The IDCT/FDCT are exact float64 matrix transforms (separable DCT-II),
so encode→decode round-trips are deterministic across platforms.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order (spec Figure 5)
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])
_UNZZ = np.argsort(_ZZ)

# Annex K.1 luminance / K.2 chrominance quantization tables
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103,
    99])
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99])

# Annex K.3 "typical" Huffman tables: (bits[1..16], values)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _dct_matrix() -> np.ndarray:
    x, u = np.meshgrid(np.arange(8), np.arange(8))
    c = np.cos((2 * x + 1) * u * np.pi / 16)
    c[0] /= np.sqrt(2)
    return c / 2                                   # orthonormal DCT-II


_C = _dct_matrix()


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


class _HuffTable:
    def __init__(self, bits, values):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1
        # encoder direction: symbol → (code, length)
        self.enc: dict[int, tuple[int, int]] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.enc[values[k]] = (code, length)
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first entropy-stream reader with 0xFF00 unstuffing; stops at
    markers (leaves them for the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nacc = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(
                    f"marker 0x{nxt:02X} inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nacc += 8

    def read_bit(self) -> int:
        if self.nacc == 0:
            self._fill()
        self.nacc -= 1
        return (self.acc >> self.nacc) & 1

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def align(self) -> None:
        self.nacc = 0

    def skip_restart(self) -> None:
        # reader positioned ON the 0xFF of the RSTn marker
        self.pos += 2
        self.acc = 0
        self.nacc = 0


class _RestartMarker(Exception):
    def __init__(self, marker):
        self.marker = marker


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def jpeg_decode(data: bytes) -> np.ndarray:
    """→ (h, w, channels) uint8 (1 = gray, 3 = RGB)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    restart_interval = 0
    n_scans = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:                         # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        body = data[pos + 2:pos + seglen]
        if marker == 0xDB:                         # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq:
                    raise NotImplementedError("16-bit quant table")
                qt[tq] = np.frombuffer(body[p:p + 64],
                                       np.uint8).astype(np.int32)
                p += 64
        elif marker == 0xC4:                       # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1:p + 17])
                n = sum(bits)
                values = list(body[p + 17:p + 17 + n])
                huff[(tc, th)] = _HuffTable(bits, values)
                p += 17 + n
        elif marker in (0xC0, 0xC2):               # SOF0 / SOF2
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
            if marker == 0xC2:
                coefs = _alloc_coefs(frame)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            kinds = {0xC1: "extended sequential", 0xC3: "lossless"}
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} "
                f"({kinds.get(marker, 'non-baseline')}) coding")
        elif marker == 0xDD:                       # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:                       # SOS
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, td_ta = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cs, td_ta >> 4, td_ta & 0x0F))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah_al = body[3 + 2 * ns]
            pos += seglen
            if not frame or not frame.get("progressive"):
                return _decode_scan(data, pos, frame, scan, qt, huff,
                                    restart_interval)
            pos = _decode_progressive_scan(
                data, pos, frame, scan, huff, restart_interval,
                coefs, ss, se, ah_al >> 4, ah_al & 0x0F)
            n_scans += 1
            continue
        pos += seglen
    if frame is not None and frame.get("progressive") and n_scans:
        return _reconstruct(frame, coefs, qt)
    raise ValueError("no SOS marker found")


def _mcu_geometry(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcux, mcuy


def _comp_grid(frame, c):
    """Non-interleaved block grid (ceil of the COMPONENT's own size —
    NOT padded to the MCU grid, per G.1.2)."""
    hmax, vmax, _, _ = _mcu_geometry(frame)
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _alloc_coefs(frame):
    _, _, mcux, mcuy = _mcu_geometry(frame)
    return {c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                              np.int32)
            for c in frame["comps"]}


def _next_marker_pos(data: bytes, p: int) -> int:
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00 \
                and not (0xD0 <= data[p + 1] <= 0xD7):
            return p
        p += 1
    return len(data)


def _decode_progressive_scan(data, pos, frame, scan, huff, ri,
                             coefs, ss, se, ah, al):
    """One SOF2 scan into the coefficient buffers (ITU-T.81 G.2 /
    libjpeg jdphuff.c semantics): DC first/refine (interleaved or not),
    AC first with EOB runs, AC refine with correction bits. Returns the
    byte position of the next marker."""
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    sel = {cs: (td, ta) for cs, td, ta in scan}
    r = _BitReader(data, pos)
    state = {"eobrun": 0}
    pred = {cs: 0 for cs in sel}

    def maybe_restart(count):
        if ri and count and count % ri == 0:
            r.align()
            if r.data[r.pos] == 0xFF and \
                    0xD0 <= r.data[r.pos + 1] <= 0xD7:
                r.skip_restart()
            state["eobrun"] = 0
            for k in pred:
                pred[k] = 0

    try:
        if ss == 0:                                # DC scan
            if se != 0:
                raise ValueError("DC scan with Se != 0")
            if len(sel) > 1:                       # interleaved MCUs
                _, _, mcux, mcuy = _mcu_geometry(frame)
                n = 0
                for my in range(mcuy):
                    for mx in range(mcux):
                        maybe_restart(n)
                        n += 1
                        for c in comps:
                            if c["id"] not in sel:
                                continue
                            td, _ = sel[c["id"]]
                            for by in range(c["v"]):
                                for bx in range(c["h"]):
                                    blk = coefs[c["id"]][
                                        my * c["v"] + by,
                                        mx * c["h"] + bx]
                                    _dc_prog(r, huff.get((0, td)), blk,
                                             ah, al, pred, c["id"])
            else:
                cs = next(iter(sel))
                c = by_id[cs]
                rows, cols = _comp_grid(frame, c)
                td, _ = sel[cs]
                n = 0
                for byy in range(rows):
                    for bxx in range(cols):
                        maybe_restart(n)
                        n += 1
                        _dc_prog(r, huff.get((0, td)),
                                 coefs[cs][byy, bxx], ah, al, pred, cs)
        else:                                      # AC scan: 1 component
            if len(sel) != 1:
                raise ValueError("interleaved AC progressive scan")
            cs = next(iter(sel))
            c = by_id[cs]
            rows, cols = _comp_grid(frame, c)
            _, ta = sel[cs]
            ac_t = huff[(1, ta)]
            n = 0
            for byy in range(rows):
                for bxx in range(cols):
                    maybe_restart(n)
                    n += 1
                    blk = coefs[cs][byy, bxx]
                    if ah == 0:
                        _ac_first(r, ac_t, blk, ss, se, al, state)
                    else:
                        _ac_refine(r, ac_t, blk, ss, se, al, state)
    except _RestartMarker:
        pass                                       # tolerant, like baseline
    return _next_marker_pos(data, r.pos)


def _dc_prog(r, dc_t, blk, ah, al, pred, cid):
    if ah == 0:                                    # first DC scan
        s = r.decode(dc_t)
        diff = _extend(r.read(s), s) if s else 0
        pred[cid] += diff
        blk[0] = pred[cid] << al
    else:                                          # refinement: 1 bit
        if r.read_bit():
            blk[0] |= 1 << al


def _ac_first(r, ac_t, blk, ss, se, al, state):
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = r.decode(ac_t)
        run, s = rs >> 4, rs & 0x0F
        if s == 0:
            if run < 15:                           # EOBn
                eob = 1 << run
                if run:
                    eob += r.read(run)
                state["eobrun"] = eob - 1
                return
            k += 16                                # ZRL
            continue
        k += run
        if k > se:
            raise ValueError("AC run past spectral end")
        blk[k] = _extend(r.read(s), s) << al
        k += 1


def _ac_refine(r, ac_t, blk, ss, se, al, state):
    """libjpeg decode_mcu_AC_refine: correction bits for already-nonzero
    coefficients interleave with newly significant ones."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = r.decode(ac_t)
            run, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if run < 15:                       # EOBn: break to tail
                    eob = 1 << run
                    if run:
                        eob += r.read(run)
                    state["eobrun"] = eob
                    break
                # run == 15: skip 16 zero-history coefficients
            else:
                newval = p1 if r.read_bit() else m1
            while k <= se:
                if blk[k]:
                    if r.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if k <= se and newval:
                blk[k] = newval
            k += 1
    if state["eobrun"] > 0:
        while k <= se:                             # tail correction bits
            if blk[k]:
                if r.read_bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        state["eobrun"] -= 1


def _reconstruct(frame, coefs, qt):
    planes = {}
    for c in frame["comps"]:
        q = qt[c["tq"]]
        arr = coefs[c["id"]]
        bv, bh = arr.shape[:2]
        plane = np.zeros((bv * 8, bh * 8))
        deq = (arr.astype(np.float64)
               * q[np.newaxis, np.newaxis, :])
        for byy in range(bv):
            for bxx in range(bh):
                plane[byy * 8:byy * 8 + 8, bxx * 8:bxx * 8 + 8] = \
                    _idct2(deq[byy, bxx][_UNZZ].reshape(8, 8))
        planes[c["id"]] = plane
    return _assemble(frame, planes)


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval):
    if frame is None:
        raise ValueError("SOS before SOF")
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component pixel planes at full MCU coverage
    planes = {c["id"]: np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]))
              for c in comps}
    sel = {cs: (td, ta) for cs, td, ta in scan}
    pred = {c["id"]: 0 for c in comps}
    r = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                r.align()
                if r.data[r.pos] == 0xFF and \
                        0xD0 <= r.data[r.pos + 1] <= 0xD7:
                    r.skip_restart()
                for cid in pred:
                    pred[cid] = 0
            mcu_count += 1
            for c in comps:
                td, ta = sel[c["id"]]
                dc_t, ac_t = huff[(0, td)], huff[(1, ta)]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        try:
                            blk = _decode_block(r, dc_t, ac_t, q,
                                                pred, c["id"])
                        except _RestartMarker:
                            # tolerate ONLY padding blocks whose pixel
                            # region lies wholly outside the image (a
                            # short final MCU some encoders emit); an
                            # unexpected restart inside visible data is
                            # a corrupt stream, not a gray block
                            sy = y0 * vmax // c["v"]
                            sx = x0 * hmax // c["h"]
                            if sy < h and sx < w:
                                raise ValueError(
                                    "unexpected restart marker inside "
                                    "JPEG entropy data (corrupt "
                                    "stream)") from None
                            blk = np.zeros((8, 8))
                        planes[c["id"]][y0:y0 + 8, x0:x0 + 8] = blk
    return _assemble(frame, planes)


def _assemble(frame, planes):
    """Shared reconstruction tail (baseline + progressive): chroma
    upsample, YCbCr→RGB (JFIF constants), clip/round — one copy so the
    two decode paths can never drift apart."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax, vmax, _, _ = _mcu_geometry(frame)
    out = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:                       # chroma upsample
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out.append(p[:h, :w])
    img = np.stack(out, axis=2) + 128.0
    if len(comps) == 3:                            # YCbCr → RGB (JFIF)
        y, cb, cr = img[:, :, 0], img[:, :, 1] - 128, img[:, :, 2] - 128
        img = np.stack([y + 1.402 * cr,
                        y - 0.344136 * cb - 0.714136 * cr,
                        y + 1.772 * cb], axis=2)
    elif len(comps) != 1:
        raise NotImplementedError(f"{len(comps)}-component JPEG")
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def _decode_block(r, dc_t, ac_t, q, pred, cid):
    s = r.decode(dc_t)
    diff = _extend(r.read(s), s) if s else 0
    pred[cid] += diff
    coeff = np.zeros(64)
    coeff[0] = pred[cid] * q[0]
    k = 1
    while k < 64:
        rs = r.decode(ac_t)
        rrrr, ssss = rs >> 4, rs & 0x0F
        if ssss == 0:
            if rrrr == 15:
                k += 16                            # ZRL
                continue
            break                                  # EOB
        k += rrrr
        if k > 63:
            raise ValueError("AC run past block end")
        coeff[k] = _extend(r.read(ssss), ssss) * q[k]
        k += 1
    return _idct2(coeff[_UNZZ].reshape(8, 8))


# ---------------------------------------------------------------------------
# Encoder (fixtures/tests): gray or RGB 4:4:4
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)          # byte stuffing
                self.acc = 0
                self.nacc = 0

    def flush(self) -> None:
        if self.nacc:
            self.write((1 << (8 - self.nacc)) - 1, 8 - self.nacc)


def _scale_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int32)


def _encode_block(w, block, q, dc_t, ac_t, pred):
    coeff = np.round(_fdct2(block) / q.reshape(8, 8)).astype(np.int64)
    zz = coeff.reshape(-1)[_ZZ]
    diff = int(zz[0]) - pred[0]
    pred[0] = int(zz[0])
    s = int(abs(diff)).bit_length()
    code, ln = dc_t.enc[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_t.enc[0xF0]              # ZRL
            w.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_t.enc[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = ac_t.enc[0x00]                  # EOB
        w.write(code, ln)


def _dht_seg(tc, th, bits, values):
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _pad_plane(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = p.shape
    pp = np.zeros((ph, pw))
    pp[:h, :w] = p
    if h < ph:
        pp[h:, :w] = p[-1:, :]                     # edge replicate
    if w < pw:
        pp[:, w:] = pp[:, w - 1:w]
    return pp


def jpeg_encode(pixels: np.ndarray, quality: int = 90,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Encode (h, w) or (h, w, c) uint8 (c in {1, 3}) as baseline JFIF
    (Annex-K tables scaled by ``quality``); ``subsample=True`` writes
    4:2:0 (2×2-averaged chroma — the layout wild JPEGs ship), else
    4:4:4. ``restart_interval`` emits a DRI segment and RSTn markers
    every N MCUs (what camera firmware writes for error resilience)."""
    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nc = a.shape
    if nc not in (1, 3):
        raise ValueError(f"JPEG channel count {nc} (1/3 only)")
    sub = subsample and nc == 3
    ql = _scale_q(_QL, quality)
    qc = _scale_q(_QC, quality)
    if nc == 3:
        r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
        planes = [0.299 * r + 0.587 * g + 0.114 * b - 128.0,
                  -0.168736 * r - 0.331264 * g + 0.5 * b,
                  0.5 * r - 0.418688 * g - 0.081312 * b]
    else:
        planes = [a[:, :, 0].astype(np.float64) - 128.0]

    out = bytearray(b"\xff\xd8")                   # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    for tq, q in ((0, ql),) + (((1, qc),) if nc == 3 else ()):
        # DQT stores the 64 elements in ZIGZAG order (spec B.2.4.1)
        out += (b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
                + bytes(int(q[z]) for z in _ZZ))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        hv = 0x22 if (sub and i == 0) else 0x11
        sof += bytes([i + 1, hv, 0 if i == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_seg(0, 0, *_DC_L) + _dht_seg(1, 0, *_AC_L)
    if nc == 3:
        out += _dht_seg(0, 1, *_DC_C) + _dht_seg(1, 1, *_AC_C)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_tabs = [_HuffTable(*_DC_L)] + [_HuffTable(*_DC_C)] * (nc - 1)
    ac_tabs = [_HuffTable(*_AC_L)] + [_HuffTable(*_AC_C)] * (nc - 1)
    qs = [ql] + [qc] * (nc - 1)
    preds = [[0] for _ in range(nc)]
    bw = _BitWriter()
    msz = 16 if sub else 8
    mcux, mcuy = -(-w // msz), -(-h // msz)
    if sub:
        y = _pad_plane(planes[0], mcuy * 16, mcux * 16)
        chroma = [
            _pad_plane(p, mcuy * 16, mcux * 16)
            .reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
            for p in planes[1:]]
        padded = [y] + chroma
        nblk = [(2, 2), (1, 1), (1, 1)]
    else:
        padded = [_pad_plane(p, mcuy * 8, mcux * 8) for p in planes]
        nblk = [(1, 1)] * nc
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()
                bw.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                for p in preds:
                    p[0] = 0
            mcu_count += 1
            for ci in range(nc):
                bh, bv = nblk[ci]
                for by in range(bv):
                    for bx in range(bh):
                        y0 = (my * bv + by) * 8
                        x0 = (mx * bh + bx) * 8
                        blk = padded[ci][y0:y0 + 8, x0:x0 + 8]
                        _encode_block(bw, blk, qs[ci], dc_tabs[ci],
                                      ac_tabs[ci], preds[ci])
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"                             # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive encoder (tests/fixtures): gray or RGB 4:4:4, the classic
# spectral-selection + successive-approximation scan script. Verified by
# the invariant decode(progressive) == decode(baseline) for the same
# quant tables — both encode the identical quantized coefficients.
# ---------------------------------------------------------------------------

class _SymSink:
    """Two-pass scan emission: pass 1 counts symbols (to build the
    scan's Huffman table — the Annex-K BASELINE tables lack the EOBn
    symbols progressive AC scans need), pass 2 writes bits."""

    def __init__(self, table=None, writer=None):
        self.table = table
        self.writer = writer
        self.counts: dict[int, int] = {}

    def sym(self, symbol: int) -> None:
        if self.writer is None:
            self.counts[symbol] = self.counts.get(symbol, 0) + 1
        else:
            code, ln = self.table.enc[symbol]
            self.writer.write(code, ln)

    def bits(self, v: int, n: int) -> None:
        if self.writer is not None:
            self.writer.write(v, n)


def _fixed_table(symbols):
    """Canonical fixed-length Huffman table covering ``symbols`` (all
    codes length L with 2^L − 1 ≥ n, avoiding the all-ones code)."""
    vals = sorted(symbols) or [0]
    L = max(1, (len(vals) + 1 - 1).bit_length())
    while (1 << L) - 1 < len(vals):
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(vals)
    return bits, vals


def _flush_cur(sk, state):
    for b in state["cur_bits"]:
        sk.bits(b, 1)
    state["cur_bits"] = []


def _emit_eobrun(sk, state):
    # libjpeg emit_eobrun: the EOBn symbol, its extension bits, THEN
    # the correction bits buffered over the RUN'S blocks (BE) — the
    # CURRENT block's buffered bits (BR) flush only after its own
    # in-block symbols, never here
    eobrun = state["eobrun"]
    if eobrun > 0:
        r = eobrun.bit_length() - 1
        sk.sym(r << 4)
        if r:
            sk.bits(eobrun - (1 << r), r)
        state["eobrun"] = 0
        for b in state["eob_bits"]:
            sk.bits(b, 1)
        state["eob_bits"] = []


def _enc_ac_first(sk, zz, ss, se, al, state):
    run = 0
    for k in range(ss, se + 1):
        t = int(zz[k])
        t2 = (abs(t)) >> al
        if t2 == 0:
            run += 1
            continue
        _emit_eobrun(sk, state)
        while run > 15:
            sk.sym(0xF0)
            run -= 16
        s = t2.bit_length()
        sk.sym((run << 4) | s)
        v = t2 if t > 0 else (1 << s) - 1 - t2
        sk.bits(v, s)
        run = 0
    if run > 0:
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:
            _emit_eobrun(sk, state)


def _end_refine_block(sk, state, run):
    if run > 0 or state["cur_bits"]:
        state["eobrun"] += 1
        state["eob_bits"] += state["cur_bits"]
        state["cur_bits"] = []
        if state["eobrun"] == 0x7FFF:
            _emit_eobrun(sk, state)


def _enc_ac_refine(sk, zz, ss, se, al, state):
    # jcphuff encode_mcu_AC_refine: pending ZRLs are emitted at EVERY
    # nonzero once the zero run exceeds 15 — including correction-only
    # coefficients — but only while k <= EOB (the last newly-significant
    # position); past EOB the run folds into the EOB run instead
    eob_k = ss - 1
    for k in range(ss, se + 1):
        if (abs(int(zz[k])) >> al) == 1:
            eob_k = k
    run = 0
    for k in range(ss, se + 1):
        t = int(zz[k])
        t2 = abs(t) >> al
        if t2 == 0:
            run += 1
            continue
        while run > 15 and k <= eob_k:
            _emit_eobrun(sk, state)
            sk.sym(0xF0)
            run -= 16
            _flush_cur(sk, state)
        if t2 > 1:                  # already significant: correction bit
            state["cur_bits"].append(t2 & 1)
            continue
        # newly significant (t2 == 1)
        _emit_eobrun(sk, state)
        sk.sym((run << 4) | 1)
        sk.bits(1 if t > 0 else 0, 1)
        _flush_cur(sk, state)
        run = 0
    _end_refine_block(sk, state, run)


def jpeg_encode_progressive(pixels: np.ndarray,
                            quality: int = 90) -> bytes:
    """Encode as SOF2 progressive JFIF (gray or RGB 4:4:4): DC first at
    Al=1 + DC refine, AC spectral bands 1-5 / 6-63 at Al=1, then an AC
    refinement pass — the classic libjpeg-style script, exercising EOB
    runs, ZRL-in-refine and correction-bit interleaving."""
    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w_, nc = a.shape
    if nc not in (1, 3):
        raise ValueError(f"JPEG channel count {nc} (1/3 only)")
    ql = _scale_q(_QL, quality)
    qc = _scale_q(_QC, quality)
    if nc == 3:
        r_, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
        planes = [0.299 * r_ + 0.587 * g + 0.114 * b - 128.0,
                  -0.168736 * r_ - 0.331264 * g + 0.5 * b,
                  0.5 * r_ - 0.418688 * g - 0.081312 * b]
    else:
        planes = [a[:, :, 0].astype(np.float64) - 128.0]
    qs = [ql] + [qc] * (nc - 1)
    mcux, mcuy = -(-w_ // 8), -(-h // 8)
    # quantized zigzag coefficient arrays, one per component
    zzs = []
    for ci, p in enumerate(planes):
        pp = _pad_plane(p, mcuy * 8, mcux * 8)
        arr = np.zeros((mcuy, mcux, 64), np.int64)
        for my in range(mcuy):
            for mx in range(mcux):
                blk = pp[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
                co = np.round(_fdct2(blk)
                              / qs[ci].reshape(8, 8)).astype(np.int64)
                arr[my, mx] = co.reshape(-1)[_ZZ]
        zzs.append(arr)

    out = bytearray(b"\xff\xd8")
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    for tq, q in ((0, ql),) + (((1, qc),) if nc == 3 else ()):
        out += (b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
                + bytes(int(q[z]) for z in _ZZ))
    sof = struct.pack(">BHHB", 8, h, w_, nc)
    for i in range(nc):
        sof += bytes([i + 1, 0x11, 0 if i == 0 else 1])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_seg(0, 0, *_DC_L) + _dht_seg(1, 0, *_AC_L)
    if nc == 3:
        out += _dht_seg(0, 1, *_DC_C) + _dht_seg(1, 1, *_AC_C)
    dc_tabs = [_HuffTable(*_DC_L)] + [_HuffTable(*_DC_C)] * (nc - 1)
    ac_tabs = [_HuffTable(*_AC_L)] + [_HuffTable(*_AC_C)] * (nc - 1)

    def sos_header(comps_td_ta, ss, se, ah, al):
        body = bytes([len(comps_td_ta)])
        for cid, td, ta in comps_td_ta:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body

    # scan 1: DC first, interleaved over all components, Al=1
    out += sos_header([(i + 1, 0 if i == 0 else 1, 0)
                       for i in range(nc)], 0, 0, 0, 1)
    bw = _BitWriter()
    preds = [0] * nc
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(nc):
                v = int(zzs[ci][my, mx, 0]) >> 1
                diff = v - preds[ci]
                preds[ci] = v
                s = abs(diff).bit_length()
                code, ln = dc_tabs[ci].enc[s]
                bw.write(code, ln)
                if s:
                    bw.write(diff if diff >= 0
                             else diff + (1 << s) - 1, s)
    bw.flush()
    out += bw.buf

    # AC scans per component: bands (1-5, 6-63) first at Al=1, then one
    # refinement pass 1-63 Ah=1 Al=0. Each scan builds its own Huffman
    # table (two-pass: count, then emit) and redefines DHT slot (1, 0).
    for ss, se, ah, al in ((1, 5, 0, 1), (6, 63, 0, 1), (1, 63, 1, 0)):
        for ci in range(nc):
            enc = _enc_ac_refine if ah else _enc_ac_first
            counter = _SymSink()
            state = {"eobrun": 0, "eob_bits": [], "cur_bits": []}
            for my in range(mcuy):
                for mx in range(mcux):
                    enc(counter, zzs[ci][my, mx], ss, se, al, state)
            _emit_eobrun(counter, state)
            bits, vals = _fixed_table(counter.counts)
            out += _dht_seg(1, 0, bits, vals)
            out += sos_header([(ci + 1, 0, 0)], ss, se, ah, al)
            bw = _BitWriter()
            sink = _SymSink(_HuffTable(bits, vals), bw)
            state = {"eobrun": 0, "eob_bits": [], "cur_bits": []}
            for my in range(mcuy):
                for mx in range(mcux):
                    enc(sink, zzs[ci][my, mx], ss, se, al, state)
            _emit_eobrun(sink, state)
            bw.flush()
            out += bw.buf

    # final scan: DC refinement, Ah=1 Al=0
    out += sos_header([(i + 1, 0, 0) for i in range(nc)], 0, 0, 1, 0)
    bw = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(nc):
                bw.write(int(zzs[ci][my, mx, 0]) & 1, 1)
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)
