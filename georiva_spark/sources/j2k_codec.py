"""Dependency-free JPEG 2000 (ISO/IEC 15444-1) codec for the GRIB2
template 5.40 envelope: lossless, single tile, single component,
reversible 5/3 wavelet, 64×64 code-blocks, one quality layer, no
precinct subdivision, LRCP progression — exactly the codestream shape
eccodes/openjpeg emits for NCEP products (GFS fields ship in this
packing; the reference reads them via eccodes, formats/grib.py:61-144).

Implemented from the public spec, bottom-up:

- MQ arithmetic coder (Annex C software conventions): the 47-state Qe
  table, BYTEOUT/BYTEIN with 0xFF bit-stuffing, FLUSH discarding the
  sentinel byte.
- Tag trees (B.10.2) for code-block inclusion and zero-bit-plane
  signalling in packet headers.
- Reversible 5/3 integer lifting DWT (Annex F) with symmetric (mirror)
  extension, multi-level Mallat decomposition.
- EBCOT T1 bit-plane coder (Annex D): significance propagation,
  magnitude refinement and cleanup passes with the standard context
  tables, sign coding with XOR bit, run-length mode in cleanup; default
  code-block style (no bypass/termination/causal/segmentation).
- Codestream layer: SOC/SIZ/COD/QCD/SOT/SOD/EOC markers and packet
  headers (inclusion + zero-bitplane tag trees, pass-count code, Lblock
  length signalling).

Validation: exhaustive encode→decode round-trips (the encoder and
decoder are independent walks of the same spec flowcharts), plus
hand-checked liftings and entropy sanity on the MQ coder. No reference
codestreams exist in this container (no openjpeg/glymur), so
cross-implementation conformance is asserted structurally, not against
golden files — the docstrings flag the conventions chosen where the
spec leaves room.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# MQ coder (Annex C). Qe table rows: (Qe, NMPS, NLPS, SWITCH).
# ---------------------------------------------------------------------------

QE_TABLE = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)


class MQEncoder:
    """MQ arithmetic encoder (C.2). Contexts are (index, mps) pairs in
    ``self.cx``; callers address them by integer label."""

    def __init__(self, n_contexts: int = 19):
        self.cx = [[0, 0] for _ in range(n_contexts)]
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        # out[0] is the B-1 sentinel byte the spec's INITENC points BP at;
        # FLUSH drops it.
        self.out = bytearray([0])

    def reset_contexts(self, states: dict[int, int] | None = None) -> None:
        for s in self.cx:
            s[0] = 0
            s[1] = 0
        for k, v in (states or {}).items():
            self.cx[k][0] = v

    # -- C.2.5 BYTEOUT ----------------------------------------------------
    def _byteout(self) -> None:
        out = self.out
        if out[-1] == 0xFF:
            out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        else:
            if self.c < 0x8000000:
                out.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8
            else:
                out[-1] += 1
                if out[-1] == 0xFF:
                    self.c &= 0x7FFFFFF
                    out.append((self.c >> 20) & 0xFF)
                    self.c &= 0xFFFFF
                    self.ct = 7
                else:
                    out.append((self.c >> 19) & 0xFF)
                    self.c &= 0x7FFFF
                    self.ct = 8

    def _renorm(self) -> None:
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def encode(self, d: int, cx: int) -> None:
        st = self.cx[cx]
        qe, nmps, nlps, switch = QE_TABLE[st[0]]
        if d == st[1]:                      # MPS path (C.2.3 CODEMPS)
            self.a -= qe
            if (self.a & 0x8000) == 0:
                if self.a < qe:
                    self.a = qe
                else:
                    self.c += qe
                st[0] = nmps
                self._renorm()
            else:
                self.c += qe
        else:                               # LPS path (C.2.4 CODELPS)
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                st[1] ^= 1
            st[0] = nlps
            self._renorm()

    def flush(self) -> bytes:
        """C.2.6 FLUSH: SETBITS, two renormalizing shifts, final
        byteouts; trailing 0xFF bytes may be discarded (the decoder
        feeds 1-bits past the segment end)."""
        # SETBITS
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        out = self.out[1:]                  # drop the B-1 sentinel
        while out and out[-1] == 0xFF:
            out.pop()
        return bytes(out)


class MQDecoder:
    """MQ arithmetic decoder (C.3)."""

    def __init__(self, data: bytes, n_contexts: int = 19):
        self.data = data
        self.cx = [[0, 0] for _ in range(n_contexts)]
        self.bp = 0
        b = data[0] if data else 0xFF
        self.c = b << 16
        self._bytein()
        self.c <<= 7
        self.ct -= 7
        self.a = 0x8000

    def reset_contexts(self, states: dict[int, int] | None = None) -> None:
        for s in self.cx:
            s[0] = 0
            s[1] = 0
        for k, v in (states or {}).items():
            self.cx[k][0] = v

    def _bytein(self) -> None:
        data, bp = self.data, self.bp
        b = data[bp] if bp < len(data) else 0xFF
        if b == 0xFF:
            b1 = data[bp + 1] if bp + 1 < len(data) else 0xFF
            if b1 > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp = bp + 1
                self.c += b1 << 9
                self.ct = 7
        else:
            self.bp = bp + 1
            b1 = data[self.bp] if self.bp < len(data) else 0xFF
            self.c += b1 << 8
            self.ct = 8

    def _renorm(self) -> None:
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break

    def decode(self, cx: int) -> int:
        st = self.cx[cx]
        qe, nmps, nlps, switch = QE_TABLE[st[0]]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange (C.3.4)
            if self.a < qe:
                d = st[1]
                st[0] = nmps
            else:
                d = st[1] ^ 1
                if switch:
                    st[1] ^= 1
                st[0] = nlps
            self.a = qe
            self._renorm()
        else:
            self.c -= qe << 16
            if (self.a & 0x8000) == 0:
                # MPS exchange (C.3.3)
                if self.a < qe:
                    d = st[1] ^ 1
                    if switch:
                        st[1] ^= 1
                    st[0] = nlps
                else:
                    d = st[1]
                    st[0] = nmps
                self._renorm()
            else:
                d = st[1]
        return d


# ---------------------------------------------------------------------------
# Tag trees (B.10.2)
# ---------------------------------------------------------------------------

class TagTree:
    """Tag tree over a w×h grid. Levels from leaves (level 0) up to a
    single root; node value = min over its 2×2 children. Encoding of a
    leaf against a threshold emits, walking root→leaf, 0-bits while the
    running lower bound is below the node value and a 1-bit when the
    node's value is reached (B.10.2); decoding mirrors bit-for-bit."""

    def __init__(self, w: int, h: int):
        self.dims = []
        while True:
            self.dims.append((w, h))
            if w == 1 and h == 1:
                break
            w, h = (w + 1) // 2, (h + 1) // 2
        self.value = [np.zeros((dh, dw), dtype=np.int64)
                      for dw, dh in self.dims]
        # per-node running lower bound + finalized flag (shared by the
        # encoder and decoder walks)
        self.low = [np.zeros((dh, dw), dtype=np.int64)
                    for dw, dh in self.dims]
        self.known = [np.zeros((dh, dw), dtype=bool)
                      for dw, dh in self.dims]

    def set_values(self, leaf_values: np.ndarray) -> None:
        self.value[0][...] = leaf_values
        for lv in range(1, len(self.dims)):
            prev = self.value[lv - 1]
            dw, dh = self.dims[lv]
            cur = np.full((dh, dw), np.iinfo(np.int64).max)
            for dy in range(2):
                for dx in range(2):
                    sub = prev[dy::2, dx::2]
                    cur[:sub.shape[0], :sub.shape[1]] = np.minimum(
                        cur[:sub.shape[0], :sub.shape[1]], sub)
            self.value[lv] = cur

    def _path(self, x: int, y: int):
        nodes = []
        for lv in range(len(self.dims) - 1, -1, -1):
            nodes.append((lv, x >> lv, y >> lv))
        return nodes

    def encode(self, x: int, y: int, threshold: int, emit) -> None:
        """Emit bits for leaf (x, y) against ``threshold`` via
        ``emit(bit)``."""
        lower = 0
        for lv, nx, ny in self._path(x, y):
            low = self.low[lv]
            if low[ny, nx] < lower:
                low[ny, nx] = lower
            val = int(self.value[lv][ny, nx])
            while not self.known[lv][ny, nx] and low[ny, nx] < threshold:
                if low[ny, nx] == val:
                    emit(1)
                    self.known[lv][ny, nx] = True
                else:
                    emit(0)
                    low[ny, nx] += 1
            lower = max(lower, int(low[ny, nx]) if not
                        self.known[lv][ny, nx] else val)

    def decode(self, x: int, y: int, threshold: int, read) -> bool:
        """Decoder walk: returns True when the leaf's value is known to
        be < threshold (i.e. the 1-bit was seen at the leaf)."""
        lower = 0
        for lv, nx, ny in self._path(x, y):
            low = self.low[lv]
            if low[ny, nx] < lower:
                low[ny, nx] = lower
            while not self.known[lv][ny, nx] and low[ny, nx] < threshold:
                if read():
                    self.known[lv][ny, nx] = True
                    self.value[lv][ny, nx] = low[ny, nx]
                else:
                    low[ny, nx] += 1
            if self.known[lv][ny, nx]:
                lower = int(self.value[lv][ny, nx])
            else:
                return False                # still ≥ threshold
        return True

    def leaf_value(self, x: int, y: int) -> int:
        return int(self.value[0][y, x])


# ---------------------------------------------------------------------------
# Reversible 5/3 DWT (Annex F) — integer lifting with mirror extension.
# ---------------------------------------------------------------------------

def _mirror(idx: np.ndarray, n: int) -> np.ndarray:
    """Whole-sample symmetric extension: -1 → 1, n → n-2."""
    idx = np.where(idx < 0, -idx, idx)
    return np.where(idx > n - 1, 2 * (n - 1) - idx, idx)


def _sd_1d(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Forward 5/3 lifting along the LAST axis (even-indexed samples =
    low-pass). In-place interleaved form (F.4.8.2 with the (2,2)
    whole-sample mirror):
        w[2k+1] -= (w[2k]   + w[2k+2]) >> 1
        w[2k]   += (w[2k-1] + w[2k+1] + 2) >> 2
    Returns (low, high); length-1 signals pass through as low."""
    n = x.shape[-1]
    if n == 1:
        return x.astype(np.int64), x[..., :0].astype(np.int64)
    w = x.astype(np.int64)
    odd = np.arange(1, n, 2)
    w[..., odd] -= (w[..., _mirror(odd - 1, n)]
                    + w[..., _mirror(odd + 1, n)]) >> 1
    even = np.arange(0, n, 2)
    w[..., even] += (w[..., _mirror(even - 1, n)]
                     + w[..., _mirror(even + 1, n)] + 2) >> 2
    return w[..., 0::2], w[..., 1::2]


def _sr_1d(low: np.ndarray, high: np.ndarray, n: int) -> np.ndarray:
    """Inverse of _sd_1d for a signal of original length ``n``."""
    if n == 1:
        return low.astype(np.int64)
    w = np.empty(low.shape[:-1] + (n,), dtype=np.int64)
    w[..., 0::2] = low
    w[..., 1::2] = high
    even = np.arange(0, n, 2)
    w[..., even] -= (w[..., _mirror(even - 1, n)]
                     + w[..., _mirror(even + 1, n)] + 2) >> 2
    odd = np.arange(1, n, 2)
    w[..., odd] += (w[..., _mirror(odd - 1, n)]
                    + w[..., _mirror(odd + 1, n)]) >> 1
    return w


def dwt53_forward(a: np.ndarray, levels: int):
    """Multi-level Mallat decomposition. Returns (ll, details) where
    details is a list, coarsest-first, of (hl, lh, hh) triples.

    Per-level order: horizontal split then vertical split — i.e. the
    row transform runs first, then the column transform on both halves
    (the separable order is fixed here and mirrored exactly by the
    inverse; integer lifting makes the order visible in rounding)."""
    ll = a.astype(np.int64)
    details = []
    for _ in range(levels):
        lo, hi = _sd_1d(ll)                           # rows
        llo, hlo = _sd_1d(lo.swapaxes(-1, -2))        # cols of low half
        lhi, hhi = _sd_1d(hi.swapaxes(-1, -2))        # cols of high half
        ll = llo.swapaxes(-1, -2)
        hl = lhi.swapaxes(-1, -2)
        lh = hlo.swapaxes(-1, -2)
        hh = hhi.swapaxes(-1, -2)
        details.append((hl, lh, hh))
    return ll, list(reversed(details))


def dwt53_inverse(ll: np.ndarray, details) -> np.ndarray:
    """Inverse of dwt53_forward (details coarsest-first)."""
    cur = ll.astype(np.int64)
    for hl, lh, hh in details:
        h = cur.shape[0] + lh.shape[0]
        w = cur.shape[1] + hl.shape[1]
        lo = _sr_1d(cur.swapaxes(-1, -2), lh.swapaxes(-1, -2),
                    h).swapaxes(-1, -2)
        if hl.shape[1]:
            hi = _sr_1d(hl.swapaxes(-1, -2), hh.swapaxes(-1, -2),
                        h).swapaxes(-1, -2)
        else:
            hi = np.zeros((h, 0), dtype=np.int64)
        cur = _sr_1d(lo, hi, w)
    return cur


# ---------------------------------------------------------------------------
# EBCOT Tier-1 code-block coder (Annex D): significance propagation,
# magnitude refinement, cleanup with run-length mode. Context labels:
# 0-8 zero coding, 9-13 sign coding, 14-16 magnitude refinement,
# 17 run-length, 18 UNIFORM. Default code-block style (no bypass, no
# per-pass termination, no vertical causality, no segmentation marks).
# ---------------------------------------------------------------------------

CX_RUN = 17
CX_UNI = 18
# initial (index, mps) states per D.2: UNIFORM→46, RUN→3, ZC(0)→4
T1_INIT_STATES = {CX_UNI: 46, CX_RUN: 3, 0: 4}

# Zero-coding context tables, indexed [h][v][d] clamped. LL/LH table
# (D-1); HL swaps h/v; HH uses (d, h+v).
def _zc_context(band: str, h: int, v: int, d: int) -> int:
    if band == "HL":
        h, v = v, h
    if band != "HH":
        if h == 2:
            return 8
        if h == 1:
            return 7 if v >= 1 else (6 if d >= 1 else 5)
        if v == 2:
            return 4
        if v == 1:
            return 3
        return 2 if d >= 2 else d
    hv = h + v
    if d >= 3:
        return 8
    if d == 2:
        return 7 if hv >= 1 else 6
    if d == 1:
        return 5 if hv >= 2 else (4 if hv == 1 else 3)
    return 2 if hv >= 2 else hv


# Sign-coding table: (H, V) → (context, xor-bit), H/V ∈ {-1, 0, 1}
_SC_TABLE = {
    (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
    (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
    (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
}


_ZC_LUTS: dict[str, list[int]] = {}
_SC_LUT = [_SC_TABLE[(hc, vc)] for hc in (-1, 0, 1) for vc in (-1, 0, 1)]


def _zc_lut(band: str) -> list[int]:
    """Flat zero-coding LUT indexed (h*3 + v)*5 + d."""
    lut = _ZC_LUTS.get(band)
    if lut is None:
        lut = [_zc_context(band, hh, vv, dd)
               for hh in range(3) for vv in range(3) for dd in range(5)]
        _ZC_LUTS[band] = lut
    return lut


def t1_encode(mag: np.ndarray, sign: np.ndarray, band: str
              ) -> tuple[bytes, int, int]:
    """Encode one code-block (magnitude, sign) → (codeword segment,
    n_passes, n_bitplanes). Inner loops run on flat bytearrays with a
    one-sample zero border (numpy scalar indexing measured ~6× slower
    than list/bytearray access at this grain)."""
    h, w = mag.shape
    nbps = int(mag.max()).bit_length() if mag.size else 0
    if nbps == 0:
        return b"", 0, 0
    w2 = w + 2
    size = (h + 2) * w2
    sig = bytearray(size)
    sgn = bytearray(size)
    vis = bytearray(size)
    refn = bytearray(size)
    magf = [int(v) for v in mag.ravel()]
    sgnf = [int(v) for v in sign.ravel()]
    zc = _zc_lut(band)
    sc = _SC_LUT
    mq = MQEncoder(n_contexts=19)
    mq.reset_contexts(T1_INIT_STATES)
    enc = mq.encode
    npasses = 0
    stripes = [(y0, min(4, h - y0)) for y0 in range(0, h, 4)]
    for p in range(nbps - 1, -1, -1):
        if npasses > 0:
            # significance propagation
            for y0, sh in stripes:
                for x in range(w):
                    i = (y0 + 1) * w2 + x + 1
                    k = y0 * w + x
                    for _ in range(sh):
                        if not sig[i]:
                            hcnt = sig[i - 1] + sig[i + 1]
                            vcnt = sig[i - w2] + sig[i + w2]
                            dcnt = (sig[i - w2 - 1] + sig[i - w2 + 1]
                                    + sig[i + w2 - 1] + sig[i + w2 + 1])
                            cx = zc[(hcnt * 3 + vcnt) * 5 + dcnt]
                            if cx:
                                v = (magf[k] >> p) & 1
                                enc(v, cx)
                                vis[i] = 1
                                if v:
                                    hc = (sig[i - 1] * (1 - 2 * sgn[i - 1])
                                          + sig[i + 1] * (1 - 2 * sgn[i + 1]))
                                    vc = (sig[i - w2] * (1 - 2 * sgn[i - w2])
                                          + sig[i + w2] * (1 - 2 * sgn[i + w2]))
                                    hc = -1 if hc < -1 else (1 if hc > 1 else hc)
                                    vc = -1 if vc < -1 else (1 if vc > 1 else vc)
                                    scx, xo = sc[(hc + 1) * 3 + vc + 1]
                                    s = sgnf[k]
                                    enc(s ^ xo, scx)
                                    sig[i] = 1
                                    sgn[i] = s
                        i += w2
                        k += w
            npasses += 1
            # magnitude refinement
            for y0, sh in stripes:
                for x in range(w):
                    i = (y0 + 1) * w2 + x + 1
                    k = y0 * w + x
                    for _ in range(sh):
                        if sig[i] and not vis[i]:
                            if refn[i]:
                                cx = 16
                            elif (sig[i - 1] or sig[i + 1] or sig[i - w2]
                                  or sig[i + w2] or sig[i - w2 - 1]
                                  or sig[i - w2 + 1] or sig[i + w2 - 1]
                                  or sig[i + w2 + 1]):
                                cx = 15
                            else:
                                cx = 14
                            enc((magf[k] >> p) & 1, cx)
                            refn[i] = 1
                            vis[i] = 1
                        i += w2
                        k += w
            npasses += 1
        # cleanup
        for y0, sh in stripes:
            for x in range(w):
                i0 = (y0 + 1) * w2 + x + 1
                k0 = y0 * w + x
                start = 0
                if sh == 4:
                    rl = True
                    i = i0
                    for _ in range(4):
                        if vis[i] or sig[i]:
                            rl = False
                            break
                        if zc[(sig[i - 1] + sig[i + 1]) * 15
                              + (sig[i - w2] + sig[i + w2]) * 5
                              + sig[i - w2 - 1] + sig[i - w2 + 1]
                              + sig[i + w2 - 1] + sig[i + w2 + 1]]:
                            rl = False
                            break
                        i += w2
                    if rl:
                        run = [(magf[k0 + d * w] >> p) & 1
                               for d in range(4)]
                        if 1 not in run:
                            enc(0, CX_RUN)
                            continue
                        enc(1, CX_RUN)
                        r = run.index(1)
                        enc(r >> 1, CX_UNI)
                        enc(r & 1, CX_UNI)
                        i = i0 + r * w2
                        k = k0 + r * w
                        hc = (sig[i - 1] * (1 - 2 * sgn[i - 1])
                              + sig[i + 1] * (1 - 2 * sgn[i + 1]))
                        vc = (sig[i - w2] * (1 - 2 * sgn[i - w2])
                              + sig[i + w2] * (1 - 2 * sgn[i + w2]))
                        hc = -1 if hc < -1 else (1 if hc > 1 else hc)
                        vc = -1 if vc < -1 else (1 if vc > 1 else vc)
                        scx, xo = sc[(hc + 1) * 3 + vc + 1]
                        s = sgnf[k]
                        enc(s ^ xo, scx)
                        sig[i] = 1
                        sgn[i] = s
                        start = r + 1
                i = i0 + start * w2
                k = k0 + start * w
                for _ in range(start, sh):
                    if not vis[i] and not sig[i]:
                        hcnt = sig[i - 1] + sig[i + 1]
                        vcnt = sig[i - w2] + sig[i + w2]
                        dcnt = (sig[i - w2 - 1] + sig[i - w2 + 1]
                                + sig[i + w2 - 1] + sig[i + w2 + 1])
                        v = (magf[k] >> p) & 1
                        enc(v, zc[(hcnt * 3 + vcnt) * 5 + dcnt])
                        if v:
                            hc = (sig[i - 1] * (1 - 2 * sgn[i - 1])
                                  + sig[i + 1] * (1 - 2 * sgn[i + 1]))
                            vc = (sig[i - w2] * (1 - 2 * sgn[i - w2])
                                  + sig[i + w2] * (1 - 2 * sgn[i + w2]))
                            hc = -1 if hc < -1 else (1 if hc > 1 else hc)
                            vc = -1 if vc < -1 else (1 if vc > 1 else vc)
                            scx, xo = sc[(hc + 1) * 3 + vc + 1]
                            s = sgnf[k]
                            enc(s ^ xo, scx)
                            sig[i] = 1
                            sgn[i] = s
                    i += w2
                    k += w
        npasses += 1
        vis = bytearray(size)
    return mq.flush(), npasses, nbps


def t1_decode(data: bytes, w: int, h: int, band: str, nbps: int,
              npasses: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode one code-block codeword segment → (magnitude, sign).
    Mirrors t1_encode decision-for-decision on the same flat state."""
    if nbps <= 0 or npasses <= 0:
        return (np.zeros((h, w), dtype=np.int64),
                np.zeros((h, w), dtype=np.int8))
    w2 = w + 2
    size = (h + 2) * w2
    sig = bytearray(size)
    sgn = bytearray(size)
    vis = bytearray(size)
    refn = bytearray(size)
    magf = [0] * (h * w)
    sgnf = [0] * (h * w)
    zc = _zc_lut(band)
    sc = _SC_LUT
    mq = MQDecoder(data, n_contexts=19)
    mq.reset_contexts(T1_INIT_STATES)
    dec = mq.decode
    stripes = [(y0, min(4, h - y0)) for y0 in range(0, h, 4)]
    done = 0
    p = nbps - 1
    first = True
    while done < npasses:
        if not first:
            # significance propagation
            for y0, sh in stripes:
                for x in range(w):
                    i = (y0 + 1) * w2 + x + 1
                    k = y0 * w + x
                    for _ in range(sh):
                        if not sig[i]:
                            hcnt = sig[i - 1] + sig[i + 1]
                            vcnt = sig[i - w2] + sig[i + w2]
                            dcnt = (sig[i - w2 - 1] + sig[i - w2 + 1]
                                    + sig[i + w2 - 1] + sig[i + w2 + 1])
                            cx = zc[(hcnt * 3 + vcnt) * 5 + dcnt]
                            if cx:
                                vis[i] = 1
                                if dec(cx):
                                    hc = (sig[i - 1] * (1 - 2 * sgn[i - 1])
                                          + sig[i + 1] * (1 - 2 * sgn[i + 1]))
                                    vc = (sig[i - w2] * (1 - 2 * sgn[i - w2])
                                          + sig[i + w2] * (1 - 2 * sgn[i + w2]))
                                    hc = -1 if hc < -1 else (1 if hc > 1 else hc)
                                    vc = -1 if vc < -1 else (1 if vc > 1 else vc)
                                    scx, xo = sc[(hc + 1) * 3 + vc + 1]
                                    s = dec(scx) ^ xo
                                    magf[k] |= 1 << p
                                    sgnf[k] = s
                                    sig[i] = 1
                                    sgn[i] = s
                        i += w2
                        k += w
            done += 1
            if done >= npasses:
                break
            # magnitude refinement
            for y0, sh in stripes:
                for x in range(w):
                    i = (y0 + 1) * w2 + x + 1
                    k = y0 * w + x
                    for _ in range(sh):
                        if sig[i] and not vis[i]:
                            if refn[i]:
                                cx = 16
                            elif (sig[i - 1] or sig[i + 1] or sig[i - w2]
                                  or sig[i + w2] or sig[i - w2 - 1]
                                  or sig[i - w2 + 1] or sig[i + w2 - 1]
                                  or sig[i + w2 + 1]):
                                cx = 15
                            else:
                                cx = 14
                            if dec(cx):
                                magf[k] |= 1 << p
                            refn[i] = 1
                            vis[i] = 1
                        i += w2
                        k += w
            done += 1
            if done >= npasses:
                break
        # cleanup
        for y0, sh in stripes:
            for x in range(w):
                i0 = (y0 + 1) * w2 + x + 1
                k0 = y0 * w + x
                start = 0
                if sh == 4:
                    rl = True
                    i = i0
                    for _ in range(4):
                        if vis[i] or sig[i]:
                            rl = False
                            break
                        if zc[(sig[i - 1] + sig[i + 1]) * 15
                              + (sig[i - w2] + sig[i + w2]) * 5
                              + sig[i - w2 - 1] + sig[i - w2 + 1]
                              + sig[i + w2 - 1] + sig[i + w2 + 1]]:
                            rl = False
                            break
                        i += w2
                    if rl:
                        if not dec(CX_RUN):
                            continue
                        r = (dec(CX_UNI) << 1) | dec(CX_UNI)
                        i = i0 + r * w2
                        k = k0 + r * w
                        hc = (sig[i - 1] * (1 - 2 * sgn[i - 1])
                              + sig[i + 1] * (1 - 2 * sgn[i + 1]))
                        vc = (sig[i - w2] * (1 - 2 * sgn[i - w2])
                              + sig[i + w2] * (1 - 2 * sgn[i + w2]))
                        hc = -1 if hc < -1 else (1 if hc > 1 else hc)
                        vc = -1 if vc < -1 else (1 if vc > 1 else vc)
                        scx, xo = sc[(hc + 1) * 3 + vc + 1]
                        s = dec(scx) ^ xo
                        magf[k] |= 1 << p
                        sgnf[k] = s
                        sig[i] = 1
                        sgn[i] = s
                        start = r + 1
                i = i0 + start * w2
                k = k0 + start * w
                for _ in range(start, sh):
                    if not vis[i] and not sig[i]:
                        hcnt = sig[i - 1] + sig[i + 1]
                        vcnt = sig[i - w2] + sig[i + w2]
                        dcnt = (sig[i - w2 - 1] + sig[i - w2 + 1]
                                + sig[i + w2 - 1] + sig[i + w2 + 1])
                        if dec(zc[(hcnt * 3 + vcnt) * 5 + dcnt]):
                            hc = (sig[i - 1] * (1 - 2 * sgn[i - 1])
                                  + sig[i + 1] * (1 - 2 * sgn[i + 1]))
                            vc = (sig[i - w2] * (1 - 2 * sgn[i - w2])
                                  + sig[i + w2] * (1 - 2 * sgn[i + w2]))
                            hc = -1 if hc < -1 else (1 if hc > 1 else hc)
                            vc = -1 if vc < -1 else (1 if vc > 1 else vc)
                            scx, xo = sc[(hc + 1) * 3 + vc + 1]
                            s = dec(scx) ^ xo
                            magf[k] |= 1 << p
                            sgnf[k] = s
                            sig[i] = 1
                            sgn[i] = s
                    i += w2
                    k += w
        done += 1
        vis = bytearray(size)
        p -= 1
        first = False
    mag = np.asarray(magf, dtype=np.int64).reshape(h, w)
    sign = np.asarray(sgnf, dtype=np.int8).reshape(h, w)
    return mag, sign


# ---------------------------------------------------------------------------
# Codestream layer: geometry, packet headers (B.10), markers (A).
# ---------------------------------------------------------------------------

class _BitWriter:
    """Packet-header bit writer with 0xFF bit-stuffing (B.10.1): after
    an aligned 0xFF byte only 7 bits go in the next byte."""

    def __init__(self):
        self.out = bytearray()
        self.byte = 0
        self.nbits = 0
        self.limit = 8                  # latched per byte at first bit

    def put(self, bit: int) -> None:
        if self.nbits == 0:
            self.limit = 7 if (self.out and self.out[-1] == 0xFF) else 8
        self.byte = (self.byte << 1) | (bit & 1)
        self.nbits += 1
        if self.nbits == self.limit:
            self.out.append(self.byte)
            self.byte = 0
            self.nbits = 0

    def put_bits(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.put((value >> i) & 1)

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.byte << (self.limit - self.nbits))
            self.byte = 0
            self.nbits = 0
        if self.out and self.out[-1] == 0xFF:
            self.out.append(0)          # stuffed terminator byte
        return bytes(self.out)


class _BitReader:
    """Mirror of _BitWriter, advancing through a bytes buffer."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.bit = 0                     # bits consumed of current byte
        self.limit = 8                   # latched per byte at first bit

    def get(self) -> int:
        if self.bit == 0:
            self.limit = 7 if (self.pos > 0
                               and self.data[self.pos - 1] == 0xFF) else 8
        b = self.data[self.pos]
        v = (b >> (self.limit - 1 - self.bit)) & 1
        self.bit += 1
        if self.bit == self.limit:
            self.pos += 1
            self.bit = 0
        return v

    def get_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get()
        return v

    def align(self) -> int:
        """Skip to the next byte boundary (consuming a stuffed byte if
        the header ended on a full 0xFF) and return the position."""
        if self.bit:
            self.pos += 1
            self.bit = 0
        if self.pos > 0 and self.pos <= len(self.data) \
                and self.data[self.pos - 1] == 0xFF:
            self.pos += 1                # the stuffed 0-bit byte
        return self.pos


def _band_geometry(w: int, h: int, levels: int):
    """Per-resolution subband layout. Returns [(res, [(band, bw, bh),
    ...]), ...] for res 0..levels; res 0 = the deepest LL."""
    dims = [(w, h)]
    for _ in range(levels):
        pw, ph = dims[-1]
        dims.append(((pw + 1) // 2, (ph + 1) // 2))
    out = [(0, [("LL", dims[levels][0], dims[levels][1])])]
    for r in range(1, levels + 1):
        lv = levels - r + 1              # decomposition level of bands
        pw, ph = dims[lv - 1]
        lw, lh = (pw + 1) // 2, (ph + 1) // 2
        hw, hh = pw // 2, ph // 2
        out.append((r, [("HL", hw, lh), ("LH", lw, hh), ("HH", hw, hh)]))
    return out


def _cblk_grid(bw: int, bh: int, cb: int = 64):
    """Code-block tiling of a subband (origin-anchored)."""
    nx = max(1, (bw + cb - 1) // cb) if bw else 0
    ny = max(1, (bh + cb - 1) // cb) if bh else 0
    return nx, ny


def _passes_code(wr: _BitWriter, n: int) -> None:
    """B.10.6 number-of-coding-passes codewords."""
    if n == 1:
        wr.put(0)
    elif n == 2:
        wr.put(1)
        wr.put(0)
    elif n <= 5:
        wr.put_bits(0b11, 2)
        wr.put_bits(n - 3, 2)
    elif n <= 36:
        wr.put_bits(0b1111, 4)
        wr.put_bits(n - 6, 5)
    else:
        wr.put_bits(0b111111111, 9)
        wr.put_bits(n - 37, 7)


def _passes_decode(rd: _BitReader) -> int:
    if rd.get() == 0:
        return 1
    if rd.get() == 0:
        return 2
    v = rd.get_bits(2)
    if v != 3:
        return 3 + v
    v = rd.get_bits(5)
    if v != 31:
        return 6 + v
    return 37 + rd.get_bits(7)


def j2k_encode(values: np.ndarray, bitdepth: int, levels: int = 5,
               cb: int = 64) -> bytes:
    """Lossless single-component codestream for an unsigned (h, w)
    integer array of the given bit depth. Levels clamp so the deepest
    LL stays at least 1×1 in each dimension."""
    a = np.asarray(values, dtype=np.int64)
    h, w = a.shape
    levels = max(0, min(levels, (min(w, h) - 1).bit_length()))
    guard = 2
    # DC level shift for unsigned data (B.8 / G.1)
    shifted = a - (1 << (bitdepth - 1))
    ll, details = dwt53_forward(shifted, levels)
    bands_by_res = {0: {"LL": ll}}
    for i, (hl, lh, hh) in enumerate(details):
        bands_by_res[i + 1] = {"HL": hl, "LH": lh, "HH": hh}

    geom = _band_geometry(w, h, levels)
    # Pass 1: Tier-1 code every code-block; the per-band QCD exponent is
    # derived from the band's ACTUAL max bit-plane count (εb = Mb − G + 1)
    # so zero-bitplane counts stay non-negative — a fixed bitdepth+gain
    # budget under-counts when deep high-pass cascades of rough data grow
    # past the guard bits.
    band_segs: dict[tuple[int, str], list] = {}
    band_eps: dict[tuple[int, str], int] = {}
    for res, bands in geom:
        for bname, bw, bh in bands:
            arr = bands_by_res[res][bname]
            assert arr.shape == (bh, bw), (res, bname, arr.shape, bw, bh)
            gain = {"LL": 0, "HL": 1, "LH": 1, "HH": 2}[bname]
            segs = []
            if bw and bh:
                nx, ny = _cblk_grid(bw, bh, cb)
                for cy in range(ny):
                    for cx in range(nx):
                        sub = arr[cy * cb:(cy + 1) * cb,
                                  cx * cb:(cx + 1) * cb]
                        segs.append(t1_encode(
                            np.abs(sub), (sub < 0).astype(np.int8),
                            bname))
            band_segs[(res, bname)] = segs
            max_nbps = max([s[2] for s in segs], default=0)
            band_eps[(res, bname)] = max(bitdepth + gain,
                                         max_nbps - guard + 1)

    packets = []
    for res, bands in geom:
        wr = _BitWriter()
        wr.put(1)                        # packet non-empty
        bodies = []
        for bname, bw, bh in bands:
            if bw == 0 or bh == 0:
                continue
            nx, ny = _cblk_grid(bw, bh, cb)
            mb = guard + band_eps[(res, bname)] - 1
            incl = TagTree(nx, ny)
            zbp = TagTree(nx, ny)
            segs = band_segs[(res, bname)]
            incl_vals = np.zeros((ny, nx), dtype=np.int64)
            zbp_vals = np.zeros((ny, nx), dtype=np.int64)
            for k, (data, npasses, nbps) in enumerate(segs):
                zbp_vals[k // nx, k % nx] = mb - nbps
            incl.set_values(incl_vals)
            zbp.set_values(zbp_vals)
            k = 0
            for cy in range(ny):
                for cx in range(nx):
                    data, npasses, nbps = segs[k]
                    k += 1
                    incl.encode(cx, cy, 1, wr.put)
                    # fully resolve the zero-bitplane tag tree
                    t = 1
                    while True:
                        before = zbp.known[0][cy, cx]
                        zbp.encode(cx, cy, t, wr.put)
                        if zbp.known[0][cy, cx]:
                            break
                        t += 1
                        assert t < 256
                        del before
                    npasses = max(npasses, 1)
                    _passes_code(wr, npasses)
                    # Lblock length signalling (B.10.7.1), single segment
                    lblock = 3
                    nbits_len = lblock + int(np.floor(np.log2(npasses)))
                    inc = 0
                    while len(data) >= (1 << (nbits_len + inc)):
                        inc += 1
                    for _ in range(inc):
                        wr.put(1)
                    wr.put(0)
                    nbits_len += inc
                    wr.put_bits(len(data), nbits_len)
                    bodies.append(data)
        packets.append(wr.flush() + b"".join(bodies))

    # ---- markers ----
    def marker(code: int, body: bytes) -> bytes:
        return code.to_bytes(2, "big") + (len(body) + 2).to_bytes(2, "big") \
            + body

    siz = ((0).to_bytes(2, "big")
           + w.to_bytes(4, "big") + h.to_bytes(4, "big")
           + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
           + w.to_bytes(4, "big") + h.to_bytes(4, "big")
           + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
           + (1).to_bytes(2, "big")
           + bytes([bitdepth - 1, 1, 1]))
    cod = (bytes([0])                     # Scod: no precincts/SOP/EPH
           + bytes([0])                   # LRCP
           + (1).to_bytes(2, "big")       # 1 layer
           + bytes([0])                   # no MCT
           + bytes([levels])
           + bytes([(cb.bit_length() - 3), (cb.bit_length() - 3)])
           + bytes([0])                   # cblk style: default
           + bytes([1]))                  # 5/3 reversible
    sb_exps = []
    for res, bands in geom:
        for bname, _, _ in bands:
            sb_exps.append((band_eps[(res, bname)] & 0x1F) << 3)
    qcd = bytes([(guard << 5) | 0x00]) + bytes(sb_exps)

    tile_body = b"".join(packets)
    sot_body = ((0).to_bytes(2, "big")
                + (len(tile_body) + 12 + 2).to_bytes(4, "big")
                + bytes([0, 1]))
    return (b"\xFF\x4F"
            + marker(0xFF51, siz)
            + marker(0xFF52, cod)
            + marker(0xFF5C, qcd)
            + marker(0xFF90, sot_body)
            + b"\xFF\x93" + tile_body
            + b"\xFF\xD9")


def j2k_decode(data: bytes) -> np.ndarray:
    """Decode a codestream within the supported envelope (single tile,
    single component, reversible 5/3, no precinct subdivision, no
    SOP/EPH, one layer per packet ordering LRCP/RLCP). Raises
    NotImplementedError naming the unsupported feature otherwise."""
    if data[:2] != b"\xFF\x4F":
        raise ValueError("not a JPEG 2000 codestream (no SOC)")
    pos = 2
    w = h = bitdepth = levels = cb = None
    guard = sb_exps = None
    tile = None
    while pos < len(data):
        code = int.from_bytes(data[pos:pos + 2], "big")
        if code == 0xFF93:               # SOD
            tile = data[pos + 2:]
            # trim EOC if present
            eoc = tile.rfind(b"\xFF\xD9")
            if eoc != -1:
                tile = tile[:eoc]
            break
        ln = int.from_bytes(data[pos + 2:pos + 4], "big")
        body = data[pos + 4:pos + 2 + ln]
        if code == 0xFF51:               # SIZ
            w = int.from_bytes(body[2:6], "big")
            h = int.from_bytes(body[6:10], "big")
            xo = int.from_bytes(body[10:14], "big")
            yo = int.from_bytes(body[14:18], "big")
            tw = int.from_bytes(body[18:22], "big")
            th = int.from_bytes(body[22:26], "big")
            ncomp = int.from_bytes(body[34:36], "big")
            if ncomp != 1:
                raise NotImplementedError(f"{ncomp}-component JPEG 2000")
            if xo or yo or tw < w or th < h:
                raise NotImplementedError("multi-tile / offset JPEG 2000")
            ssiz = body[36]
            if ssiz & 0x80:
                raise NotImplementedError("signed JPEG 2000 component")
            bitdepth = (ssiz & 0x7F) + 1
            if body[37] != 1 or body[38] != 1:
                raise NotImplementedError("subsampled JPEG 2000 component")
        elif code == 0xFF52:             # COD
            scod = body[0]
            if scod & 0x01:
                raise NotImplementedError("precinct-partitioned JPEG 2000")
            if scod & 0x06:
                raise NotImplementedError("SOP/EPH markers")
            prog = body[1]
            if prog not in (0, 1):       # LRCP / RLCP coincide here
                raise NotImplementedError(f"progression order {prog}")
            layers = int.from_bytes(body[2:4], "big")
            if layers != 1:
                raise NotImplementedError(f"{layers}-layer JPEG 2000")
            levels = body[5]
            cb = 1 << (body[6] + 2)
            if (1 << (body[7] + 2)) != cb:
                raise NotImplementedError("non-square code-blocks")
            if body[8] != 0:
                raise NotImplementedError(f"code-block style {body[8]:#x}")
            if body[9] != 1:
                raise NotImplementedError("irreversible 9/7 wavelet")
        elif code == 0xFF5C:             # QCD
            if body[0] & 0x1F:
                raise NotImplementedError("scalar-quantized JPEG 2000")
            guard = body[0] >> 5
            sb_exps = [b >> 3 for b in body[1:]]
        pos += 2 + ln
    if tile is None or w is None or levels is None:
        raise ValueError("truncated JPEG 2000 codestream")

    geom = _band_geometry(w, h, levels)
    bands_by_res: dict[int, dict[str, np.ndarray]] = {}
    rd = _BitReader(tile, 0)
    sbi = 0
    for res, bands in geom:
        nonempty = rd.get()
        cblks = []                       # (band, cx, cy, nbps, npasses, ln)
        if nonempty:
            for bname, bw, bh in bands:
                gain = {"LL": 0, "HL": 1, "LH": 1, "HH": 2}[bname]
                mb = guard + sb_exps[sbi] - 1 if sb_exps else \
                    bitdepth + gain + 1
                sbi += 1
                if bw == 0 or bh == 0:
                    continue
                nx, ny = _cblk_grid(bw, bh, cb)
                incl = TagTree(nx, ny)
                zbp = TagTree(nx, ny)
                for cy in range(ny):
                    for cx in range(nx):
                        if not incl.decode(cx, cy, 1, rd.get):
                            continue
                        t = 1
                        while not zbp.decode(cx, cy, t, rd.get):
                            t += 1
                        p = zbp.leaf_value(cx, cy)
                        npasses = _passes_decode(rd)
                        lblock = 3
                        while rd.get():
                            lblock += 1
                        nbits_len = lblock + int(
                            np.floor(np.log2(npasses)))
                        ln_ = rd.get_bits(nbits_len)
                        cblks.append((bname, bw, bh, cx, cy,
                                      mb - p, npasses, ln_))
        else:
            sbi += len(bands)
        body_pos = rd.align()
        bdict = bands_by_res.setdefault(res, {})
        for bname, bw, bh in bands:
            bdict.setdefault(bname, np.zeros((bh, bw), dtype=np.int64))
        for bname, bw, bh, cx, cy, nbps, npasses, ln_ in cblks:
            seg = tile[body_pos:body_pos + ln_]
            body_pos += ln_
            cw = min(cb, bw - cx * cb)
            ch = min(cb, bh - cy * cb)
            mag, sgn = t1_decode(seg, cw, ch, bname, nbps, npasses)
            sub = np.where(sgn == 1, -mag, mag)
            bdict[bname][cy * cb:cy * cb + ch,
                         cx * cb:cx * cb + cw] = sub
        rd = _BitReader(tile, body_pos)

    ll = bands_by_res[0]["LL"]
    details = [(bands_by_res[r]["HL"], bands_by_res[r]["LH"],
                bands_by_res[r]["HH"]) for r in range(1, levels + 1)]
    out = dwt53_inverse(ll, details)
    return out + (1 << (bitdepth - 1))
