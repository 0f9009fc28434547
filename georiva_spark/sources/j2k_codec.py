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
