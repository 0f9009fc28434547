"""CCSDS 121.0-B Adaptive Entropy Coding (Rice) for GRIB2 template 5.42.

The reference reads CCSDS/AEC-packed GRIB through eccodes+libaec
(formats/grib.py:61-144); this container has neither, so the coder is
implemented from the published recommendation (CCSDS 121.0-B-2,
"Lossless Data Compression", blue book) in the same dependency-free
spirit as the 5.40 (JPEG2000) and 5.41 (PNG) codecs.

Structure per the recommendation:

- samples are grouped into blocks of ``block_size`` (J) samples;
  ``rsi`` blocks form a reference sample interval;
- with preprocessing on, samples are unit-delay mapped: Δ = x − x̂
  (x̂ = previous sample), θ = min(x̂, 2ⁿ−1−x̂), d = 2Δ (0 ≤ Δ ≤ θ),
  2|Δ|−1 (−θ ≤ Δ < 0), θ+|Δ| otherwise; the first sample of each RSI
  is a REFERENCE, stored raw (n bits) right after its block's option
  ID, with the block coding the remaining J−1 mapped samples;
- each block selects one option, tagged by an ID of
  ``idlen = 1 (n≤2) / 2 (n≤4) / 3 (n≤8) / 4 (n≤16) / 5`` bits:
  * ID 0 + '0'  zero-block: a fundamental-sequence codeword gives the
    run of consecutive all-zero blocks — z<4 → z+1 blocks, z=4 → ROS
    (rest of the 64-block segment), z>4 → z blocks;
  * ID 0 + '1'  second extension: sample pairs folded
    m = (d₁+d₂)(d₁+d₂+1)/2 + d₂, FS-coded;
  * ID k+1      sample splitting: FS codes of d≫k for the whole
    block, then the k LSBs of each sample;
  * ID all-ones no compression: the mapped samples verbatim, n bits
    each.
- fundamental sequence codeword for value m: m '0's then '1'; bit
  order is MSB-first (AEC_DATA_MSB — the GRIB convention).

Encoder restrictions (all decode-side paths still accepted where
noted): zero runs are flushed at RSI and 64-block segment boundaries
and never emit ROS (decode handles ROS); second extension is never
chosen for reference blocks (decode raises a named error if a foreign
stream does, as the pairing of a ref block is writer-defined).
AEC_DATA_SIGNED / AEC_RESTRICTED / 3-byte modes raise by name.
"""

from __future__ import annotations

import numpy as np

_SEGMENT = 64          # blocks per zero-run segment (CCSDS 121.0 §5.2)


def _id_len(nbits: int) -> int:
    if nbits <= 2:
        return 1
    if nbits <= 4:
        return 2
    if nbits <= 8:
        return 3
    if nbits <= 16:
        return 4
    return 5


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nacc += nbits
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def write_fs(self, value: int) -> None:
        while value >= 32:
            self.write(0, 32)
            value -= 32
        self.write(1, value + 1)      # value zeros then a one

    def bytes(self) -> bytes:
        if self.nacc:
            return bytes(self.buf) + bytes(
                [(self.acc << (8 - self.nacc)) & 0xFF])
        return bytes(self.buf)


def _map_deltas(x: np.ndarray, nbits: int, block: int,
                rsi: int) -> np.ndarray:
    """Unit-delay preprocessor: per-RSI mapped deltas; index 0 of each
    RSI holds the RAW reference sample (emitted separately)."""
    xmax = (1 << nbits) - 1
    per = block * rsi
    d = np.empty_like(x)
    prev = np.empty_like(x)
    prev[1:] = x[:-1]
    for lo in range(0, len(x), per):
        prev[lo] = x[lo]
        d[lo] = x[lo]                 # reference, stored raw
    delta = x.astype(np.int64) - prev.astype(np.int64)
    theta = np.minimum(prev, xmax - prev)
    mapped = np.where(
        (delta >= 0) & (delta <= theta), 2 * delta,
        np.where((delta < 0) & (-delta <= theta), -2 * delta - 1,
                 theta + np.abs(delta)))
    for lo in range(0, len(x), per):
        mapped[lo] = x[lo]
    return mapped.astype(np.int64)


def aec_encode(samples: np.ndarray, nbits: int, *, block_size: int = 32,
               rsi: int = 128, preprocess: bool = True) -> bytes:
    """Encode non-negative ints < 2**nbits into a CCSDS 121.0 stream."""
    x = np.asarray(samples, dtype=np.int64).ravel()
    if nbits < 1 or nbits > 32:
        raise ValueError(f"AEC bits per sample {nbits} (1..32)")
    if x.size and (x.min() < 0 or x.max() >= (1 << nbits)):
        raise ValueError("sample out of range for nbits")
    J = block_size
    idlen = _id_len(nbits)
    uncompressed_id = (1 << idlen) - 1
    k_max = min(nbits - 1, (1 << idlen) - 3)
    w = _BitWriter()
    if x.size == 0:
        return w.bytes()

    npad = (-len(x)) % J
    xp = np.concatenate([x, np.zeros(npad, np.int64)]) if npad else x
    d = (_map_deltas(xp, nbits, J, rsi) if preprocess
         else xp.copy())
    nblocks = len(xp) // J
    per_rsi = rsi                      # blocks per reference interval

    def emit_block(b: int) -> None:
        lo = b * J
        is_ref = preprocess and (b % per_rsi == 0)
        vals = d[lo + 1:lo + J] if is_ref else d[lo:lo + J]
        m = len(vals)
        # option costs
        best_id, best_cost = uncompressed_id, m * nbits
        split_costs = [(int(np.sum(vals >> k)) + m + m * k, k)
                       for k in range(0, k_max + 1)]
        for cost, k in split_costs:
            if cost < best_cost:
                best_cost, best_id = cost, k + 1
        se_cost = None
        # second extension only ever wins for tiny samples; the guard
        # also keeps m = (d1+d2)(d1+d2+1)/2 inside int64 (unguarded,
        # 32-bit samples overflow the fold and the bogus negative cost
        # wins the option select)
        if not is_ref and m % 2 == 0 and int(vals.max(initial=0)) < 1 << 15:
            pairs = vals.reshape(-1, 2)
            s = pairs[:, 0] + pairs[:, 1]
            mvals = s * (s + 1) // 2 + pairs[:, 1]
            se_cost = int(np.sum(mvals)) + len(mvals) + 1
            if se_cost < best_cost:
                best_cost, best_id = se_cost, "se"
        if best_id == "se":
            w.write(0, idlen)
            w.write(1, 1)
            for mv in mvals:
                w.write_fs(int(mv))
            return
        w.write(best_id, idlen)
        if is_ref:
            w.write(int(d[lo]), nbits)
        if best_id == uncompressed_id:
            for v in vals:
                w.write(int(v), nbits)
        else:
            k = best_id - 1
            for v in vals:
                w.write_fs(int(v) >> k)
            if k:
                for v in vals:
                    w.write(int(v), k)

    b = 0
    while b < nblocks:
        lo = b * J
        is_ref = preprocess and (b % per_rsi == 0)
        vals = d[lo + 1:lo + J] if is_ref else d[lo:lo + J]
        if np.all(vals == 0):
            # zero-run: extend to the next non-zero block, RSI or
            # segment boundary
            run = 1
            while True:
                nb = b + run
                if nb >= nblocks:
                    break
                if preprocess and nb % per_rsi == 0:
                    break              # next block re-references
                if (nb % _SEGMENT) == 0:
                    break              # segment boundary
                nlo = nb * J
                if not np.all(d[nlo:nlo + J] == 0):
                    break
                run += 1
            w.write(0, idlen)
            w.write(0, 1)
            if is_ref:
                w.write(int(d[lo]), nbits)
            w.write_fs(run - 1 if run < 5 else run)
            b += run
        else:
            emit_block(b)
            b += 1
    return w.bytes()


def aec_decode(data: bytes, n_samples: int, nbits: int, *,
               block_size: int = 32, rsi: int = 128,
               preprocess: bool = True) -> np.ndarray:
    """Decode a CCSDS 121.0 stream back to ``n_samples`` ints.

    The bitstream is unpacked once (np.unpackbits) and all per-block
    payloads decode vectorized: a run of m fundamental-sequence
    codewords is a diff over the precomputed set-bit index (searchsorted
    + diff), and m fixed-width fields are one reshape+matmul — no
    per-bit Python on the hot path (measured ~20× over the bit-at-a-
    time reader on a GRIB 5.42 field)."""
    if n_samples == 0:
        return np.zeros(0, np.int64)
    J = block_size
    idlen = _id_len(nbits)
    uncompressed_id = (1 << idlen) - 1
    bits = np.unpackbits(np.frombuffer(data, np.uint8)).astype(np.int64)
    ones = np.flatnonzero(bits)
    pos = 0
    _pows: dict[int, np.ndarray] = {}

    def _pw(n: int) -> np.ndarray:
        p = _pows.get(n)
        if p is None:
            p = (1 << np.arange(n - 1, -1, -1, dtype=np.int64))
            _pows[n] = p
        return p

    def read(n: int) -> int:
        nonlocal pos
        v = int(bits[pos:pos + n] @ _pw(n))
        pos += n
        return v

    def read_fs_many(m: int) -> np.ndarray:
        nonlocal pos
        i0 = int(np.searchsorted(ones, pos))
        sel_ = ones[i0:i0 + m]
        if len(sel_) < m:
            raise ValueError("truncated AEC stream in FS run")
        vals = np.diff(np.concatenate(([pos - 1], sel_))) - 1
        pos = int(sel_[-1]) + 1
        return vals.astype(np.int64)

    def read_fixed_many(m: int, width: int) -> np.ndarray:
        nonlocal pos
        seg = bits[pos:pos + m * width]
        if len(seg) < m * width:
            raise ValueError("truncated AEC stream in fixed run")
        pos += m * width
        return seg.reshape(m, width) @ _pw(width)

    nblocks = -(-n_samples // J)
    d = np.zeros(nblocks * J, np.int64)
    refs: dict[int, int] = {}
    b = 0
    while b < nblocks:
        is_ref = preprocess and (b % rsi == 0)
        sel = read(idlen)
        lo = b * J
        m = J - 1 if is_ref else J
        if sel == 0:
            low = read(1)
            if low == 0:               # zero block(s)
                if is_ref:
                    refs[b] = read(nbits)
                z = int(read_fs_many(1)[0])
                if z < 4:
                    run = z + 1
                elif z == 4:           # ROS: rest of the segment
                    seg_left = _SEGMENT - (b % _SEGMENT)
                    rsi_left = (rsi - (b % rsi)) if preprocess \
                        else seg_left
                    run = min(seg_left, rsi_left, nblocks - b)
                else:
                    run = z
                b += run               # samples already zero
                continue
            # second extension
            if is_ref:
                raise NotImplementedError(
                    "second extension on a reference block (writer-"
                    "defined pairing)")
            mv = read_fs_many(J // 2)
            s = ((np.sqrt(8.0 * mv + 1.0) - 1.0) // 2).astype(np.int64)
            s = np.where(s * (s + 1) // 2 > mv, s - 1, s)
            s = np.where((s + 1) * (s + 2) // 2 <= mv, s + 1, s)
            d2 = mv - s * (s + 1) // 2
            d[lo:lo + J:2] = s - d2
            d[lo + 1:lo + J:2] = d2
            b += 1
            continue
        if is_ref:
            refs[b] = read(nbits)
        off = lo + 1 if is_ref else lo
        if sel == uncompressed_id:
            d[off:off + m] = read_fixed_many(m, nbits)
        else:
            k = sel - 1
            d[off:off + m] = read_fs_many(m) << k
            if k:
                d[off:off + m] |= read_fixed_many(m, k)
        b += 1

    if not preprocess:
        return d[:n_samples]
    # invert the unit-delay mapping. The recurrence is sequential
    # (theta depends on the previous sample), but the zigzag branch —
    # taken whenever the mapped delta is unambiguous, i.e. everywhere
    # except samples saturating toward 0/xmax — composes to a prefix
    # sum. So per RSI we OPTIMISTICALLY cumsum the zigzag-decoded
    # deltas, verify dv <= 2*theta(prev) vectorized against the
    # candidate chain (induction: if every step verifies, the chain is
    # the true decode), and only fall back to a scalar step AT the
    # first saturated sample, resuming the vector scan after it. Real
    # geophysical fields saturate rarely, so the r4 per-sample Python
    # loop (the decode-dominating cost the advisor flagged) collapses
    # to O(#saturated + #RSIs) numpy passes.
    xmax = (1 << nbits) - 1
    out = np.zeros(len(d), np.int64)
    zz = np.where(d % 2 == 0, d >> 1, -((d + 1) >> 1))
    per = J * rsi
    for lo in range(0, len(d), per):
        rb = lo // J
        prev = int(refs.get(rb, 0))
        out[lo] = prev
        hi = min(lo + per, len(d))
        i = lo + 1
        while i < hi:
            cand = prev + np.cumsum(zz[i:hi])
            prevs = np.empty(hi - i, np.int64)
            prevs[0] = prev
            prevs[1:] = cand[:-1]
            theta = np.minimum(prevs, xmax - prevs)
            bad = np.nonzero(d[i:hi] > 2 * theta)[0]
            if bad.size == 0:
                out[i:hi] = cand
                break
            fb = int(bad[0])
            if fb:
                out[i:i + fb] = cand[:fb]
                prev = int(cand[fb - 1])
            dv = int(d[i + fb])        # saturated: x is dv or xmax-dv
            prev = dv if prev <= xmax - prev else xmax - dv
            out[i + fb] = prev
            i += fb + 1
    return out[:n_samples]
