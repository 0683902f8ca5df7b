"""Gorilla time-series compression (Pelkonen et al., "Gorilla: A Fast,
Scalable, In-Memory Time Series Database", VLDB 2015 — public knowledge;
implemented from the paper, no reference code).

Two codecs over numpy arrays:

* **delta-of-delta** for integer streams (timestamps / counts / sums):
  header = first value (64b raw) + first delta (64b raw); each subsequent
  delta-of-delta encoded with the paper's prefix classes::

      dod == 0              -> '0'
      -63   <= dod <= 64    -> '10'    + 7  bits (dod + 63)
      -255  <= dod <= 256   -> '110'   + 9  bits (dod + 255)
      -2047 <= dod <= 2048  -> '1110'  + 12 bits (dod + 2047)
      else                  -> '11110' + 64 bits raw (two's complement)

  (The paper's final class is 32-bit; we widen to 64 so arbitrary int64
  streams — sums, not just timestamps — are losslessly encodable.)

* **XOR** for float64 streams (means/m2): header = first value (64b raw);
  each subsequent value XORed with its predecessor::

      xor == 0 -> '0'
      else     -> '1' + 5 bits leading-zero count (clamped 31)
                      + 6 bits meaningful-bit count
                      + the meaningful bits

  We always emit the explicit-window form (the paper's '11' control path
  collapsed to one bit) and never the reuse-previous-window '10' path —
  that path's state is inherently sequential and would serialize the
  encoder; dropping it costs a little compression but keeps the encoder
  fully vectorized (classification + bit-packing are pure numpy array ops).

ENCODE is vectorized (the write path — the 100 TB hot side).  DECODE
(VERDICT r2 next #7: a tier *restore* is read-path-bound) is vectorized
per blob: one ``np.unpackbits``, a whole-stream prefix-class/length table,
a trivial boundary chase (one array index + add per token — the only
sequential dependency a self-delimiting prefix code has), then per-class
payload gathers and one cumsum/cumxor.  The old big-int bit readers are
kept as ``_decode_*_scalar`` oracles (each ``read`` shifted the whole
remaining stream — O(bits^2) per blob)."""

from __future__ import annotations

import numpy as np

_M64 = (1 << 64) - 1


# ---------------------------------------------------------------------------
# vectorized bit packing

def pack_bits(codes: np.ndarray, nbits: np.ndarray) -> bytes:
    """Pack ``codes[i]``'s low ``nbits[i]`` bits (MSB-first) into a byte
    stream.  Fully vectorized: expands to a bit array then ``np.packbits``.
    """
    codes = codes.astype(np.uint64)
    nbits = nbits.astype(np.int64)
    total = int(nbits.sum())
    if total == 0:
        return b""
    ends = np.cumsum(nbits)
    starts = ends - nbits
    bitidx = np.arange(total, dtype=np.int64)
    elem = np.searchsorted(ends, bitidx, side="right")
    shift = (nbits[elem] - 1 - (bitidx - starts[elem])).astype(np.uint64)
    bits = ((codes[elem] >> shift) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits).tobytes()


class _BitReader:
    """Sequential MSB-first reader (decode path)."""

    def __init__(self, data: bytes):
        self.val = int.from_bytes(data, "big")
        self.nbits = len(data) * 8
        self.pos = 0

    def read(self, n: int) -> int:
        out = (self.val >> (self.nbits - self.pos - n)) & ((1 << n) - 1)
        self.pos += n
        return out


def _bitlen_u64(x: np.ndarray) -> np.ndarray:
    """bit_length of uint64 values (0 -> 0), exact via 32-bit halves."""
    x = x.astype(np.uint64)
    hi = (x >> np.uint64(32)).astype(np.float64)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.float64)
    with np.errstate(divide="ignore"):
        bl_hi = np.where(hi > 0, np.floor(np.log2(np.maximum(hi, 1))) + 1, 0)
        bl_lo = np.where(lo > 0, np.floor(np.log2(np.maximum(lo, 1))) + 1, 0)
    return np.where(hi > 0, bl_hi + 32, bl_lo).astype(np.int64)


# ---------------------------------------------------------------------------
# delta-of-delta integers

def encode_dod(values: np.ndarray) -> bytes:
    """Encode an int64 array; empty arrays encode to b''."""
    v = np.asarray(values, dtype=np.int64)
    n = len(v)
    header_codes = []
    header_bits = []
    if n == 0:
        return b""
    header_codes.append(np.uint64(int(v[0]) & _M64))
    header_bits.append(64)
    if n >= 2:
        d0 = int(v[1]) - int(v[0])
        header_codes.append(np.uint64(d0 & _M64))
        header_bits.append(64)
    if n <= 2:
        return pack_bits(np.array(header_codes, dtype=np.uint64),
                         np.array(header_bits, dtype=np.int64))

    deltas = v[1:] - v[:-1]
    dod = (deltas[1:] - deltas[:-1]).astype(np.int64)

    c0 = dod == 0
    c1 = (~c0) & (dod >= -63) & (dod <= 64)
    c2 = (~c0) & (~c1) & (dod >= -255) & (dod <= 256)
    c3 = (~c0) & (~c1) & (~c2) & (dod >= -2047) & (dod <= 2048)
    c4 = ~(c0 | c1 | c2 | c3)

    m = len(dod)
    # up to two (code,nbits) slots per dod (class 4 = prefix slot + payload slot)
    codes = np.zeros((m, 2), dtype=np.uint64)
    nbits = np.zeros((m, 2), dtype=np.int64)
    codes[c0, 0] = 0
    nbits[c0, 0] = 1
    codes[c1, 0] = (np.uint64(0b10) << np.uint64(7)) | (dod[c1] + 63).astype(np.uint64)
    nbits[c1, 0] = 9
    codes[c2, 0] = (np.uint64(0b110) << np.uint64(9)) | (dod[c2] + 255).astype(np.uint64)
    nbits[c2, 0] = 12
    codes[c3, 0] = (np.uint64(0b1110) << np.uint64(12)) | (dod[c3] + 2047).astype(np.uint64)
    nbits[c3, 0] = 16
    codes[c4, 0] = np.uint64(0b11110)
    nbits[c4, 0] = 5
    codes[c4, 1] = dod[c4].astype(np.int64).view(np.uint64)  # two's complement
    nbits[c4, 1] = 64

    flat_codes = np.concatenate([np.array(header_codes, dtype=np.uint64), codes.ravel()])
    flat_bits = np.concatenate([np.array(header_bits, dtype=np.int64), nbits.ravel()])
    keep = flat_bits > 0
    return pack_bits(flat_codes[keep], flat_bits[keep])


def _decode_dod_scalar(data: bytes, n: int) -> np.ndarray:
    """Reference decoder (big-int bit reader) — oracle for the vectorized
    path and the micro-bench baseline; O(bits^2), never the hot path."""
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    r = _BitReader(data)

    def s64(x):
        return x - (1 << 64) if x >= (1 << 63) else x

    out[0] = s64(r.read(64))
    if n == 1:
        return out
    delta = s64(r.read(64))
    out[1] = out[0] + delta
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            r.read(1)  # consume the 5th prefix bit ('11110')
            raw = r.read(64)
            dod = raw - (1 << 64) if raw >= (1 << 63) else raw
        # wrap mod 2^64 like the encoder's int64 arithmetic does
        delta = s64((delta + dod) & _M64)
        out[i] = s64((int(out[i - 1]) + delta) & _M64)
    return out


def _bit_windows(bits: np.ndarray, starts: np.ndarray, width: int) -> np.ndarray:
    """uint64 values of fixed-``width`` bit windows at ``starts`` (MSB
    first) — one (m, width) gather + weighted sum, no per-token Python."""
    if len(starts) == 0:
        return np.empty(0, dtype=np.uint64)
    idx = starts[:, None] + np.arange(width, dtype=np.int64)[None, :]
    w = (np.uint64(1) << np.arange(width - 1, -1, -1, dtype=np.uint64))
    return (bits[idx].astype(np.uint64) * w[None, :]).sum(axis=1, dtype=np.uint64)


def _chase(jump: np.ndarray, start: int, count: int) -> np.ndarray:
    """Token start positions: p_{k+1} = p_k + jump[p_k] — the only
    inherently sequential step of a self-delimiting prefix code (one array
    index + add per token; everything else is whole-array numpy)."""
    starts = np.empty(count, dtype=np.int64)
    j = jump.tolist()   # list indexing is ~3x ndarray scalar indexing
    p = start
    for k in range(count):
        starts[k] = p
        p += j[p]
    return starts


def decode_dod(data: bytes, n: int) -> np.ndarray:
    """Decode ``n`` int64 values — vectorized (module doc): unpack bits
    once, classify every position, chase token boundaries, gather payloads
    per class, then two wrapping cumsums reconstruct the values (int64
    two's-complement arithmetic is associative mod 2^64, so wrap-through
    is exact)."""
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    v0 = int(_bit_windows(bits, np.array([0], dtype=np.int64), 64)[0])
    out[0] = v0 - (1 << 64) if v0 >= (1 << 63) else v0
    if n == 1:
        return out
    d0 = np.int64(_bit_windows(bits, np.array([64], dtype=np.int64), 64).view(np.int64)[0])
    if n == 2:
        out[1] = out[0] + d0
        return out

    m = n - 2
    # class of a token STARTING at p, for every p (wasted work off token
    # boundaries is free parallelism; max token length 69 bits -> pad)
    b = np.pad(bits, (0, 70)).astype(np.int64)
    k = len(b) - 4
    is0 = b[:k] == 0
    is1 = ~is0 & (b[1: k + 1] == 0)
    is2 = ~is0 & ~is1 & (b[2: k + 2] == 0)
    is3 = ~is0 & ~is1 & ~is2 & (b[3: k + 3] == 0)
    length = np.where(is0, 1, np.where(is1, 9, np.where(
        is2, 12, np.where(is3, 16, 69)))).astype(np.int64)
    starts = _chase(length, 128, m)

    cls = np.where(is0[starts], 0, np.where(is1[starts], 1, np.where(
        is2[starts], 2, np.where(is3[starts], 3, 4))))
    dod = np.zeros(m, dtype=np.int64)
    for c, skip, width, bias in ((1, 2, 7, 63), (2, 3, 9, 255), (3, 4, 12, 2047)):
        sel = np.flatnonzero(cls == c)
        dod[sel] = _bit_windows(bits, starts[sel] + skip, width).astype(np.int64) - bias
    sel4 = np.flatnonzero(cls == 4)
    dod[sel4] = _bit_windows(bits, starts[sel4] + 5, 64).view(np.int64)

    # delta_1 = d0, delta_{i>=2} = d0 + cumsum(dod); out[i] = v0 + cumsum(delta)
    with np.errstate(over="ignore"):
        deltas = d0 + np.cumsum(dod, dtype=np.int64)
        all_deltas = np.concatenate(([d0], deltas))
        out[1:] = out[0] + np.cumsum(all_deltas, dtype=np.int64)
    return out


# ---------------------------------------------------------------------------
# XOR floats

def encode_xor(values: np.ndarray) -> bytes:
    v = np.asarray(values, dtype=np.float64)
    n = len(v)
    if n == 0:
        return b""
    bits = v.view(np.uint64)
    if n == 1:
        return pack_bits(bits[:1], np.array([64]))
    xor = bits[1:] ^ bits[:-1]

    nz = xor != 0
    bl = _bitlen_u64(xor)
    lead = np.where(nz, 64 - bl, 0).astype(np.int64)
    lead = np.minimum(lead, 31)
    low = (xor & (~xor + np.uint64(1)))  # lowest set bit
    trail = np.where(nz, _bitlen_u64(low) - 1, 0).astype(np.int64)
    mean_bits = np.where(nz, 64 - lead - trail, 0).astype(np.int64)
    payload = np.where(nz, xor >> trail.astype(np.uint64), np.uint64(0))

    m = len(xor)
    codes = np.zeros((m, 2), dtype=np.uint64)
    nbits = np.zeros((m, 2), dtype=np.int64)
    # zero-xor: single '0' bit
    codes[~nz, 0] = 0
    nbits[~nz, 0] = 1
    # nonzero: '1' + 5b lead + 6b meaningful-count, then payload slot
    codes[nz, 0] = (
        (np.uint64(1) << np.uint64(11))
        | (lead[nz].astype(np.uint64) << np.uint64(6))
        | (mean_bits[nz] & 63).astype(np.uint64)  # 64 encodes as 0
    )
    nbits[nz, 0] = 12
    codes[nz, 1] = payload[nz]
    nbits[nz, 1] = mean_bits[nz]

    flat_codes = np.concatenate([bits[:1], codes.ravel()])
    flat_bits = np.concatenate([np.array([64], dtype=np.int64), nbits.ravel()])
    keep = flat_bits > 0
    return pack_bits(flat_codes[keep], flat_bits[keep])


def _decode_xor_scalar(data: bytes, n: int) -> np.ndarray:
    """Reference decoder (big-int bit reader) — oracle + bench baseline."""
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    r = _BitReader(data)
    prev = r.read(64)
    out[0] = prev
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        lead = r.read(5)
        mb = r.read(6)
        if mb == 0:
            mb = 64
        payload = r.read(mb)
        trail = 64 - lead - mb
        prev = prev ^ (payload << trail)
        out[i] = prev
    return out.view(np.float64)


def decode_xor(data: bytes, n: int) -> np.ndarray:
    """Vectorized XOR decode: token length at every position from a
    shift-add 6-bit window scan, boundary chase, one masked variable-width
    payload gather, then ``np.bitwise_xor.accumulate`` reconstructs the
    stream (XOR is associative — the cumulative form replaces the
    sequential prev-chain)."""
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    first = _bit_windows(bits, np.array([0], dtype=np.int64), 64)[0]
    out[0] = first
    if n == 1:
        return out.view(np.float64)

    m = n - 1
    bp = np.pad(bits, (0, 80))
    b = bp.astype(np.int64)
    k = len(bits) + 1
    # 6-bit meaningful-count window starting at p+6, for every p
    mb_all = np.zeros(k, dtype=np.int64)
    for i in range(6):
        mb_all += b[6 + i: 6 + i + k] << (5 - i)
    mb_all = np.where(mb_all == 0, 64, mb_all)   # mb==0 encodes 64
    length = np.where(b[:k] == 0, 1, 12 + mb_all)
    starts = _chase(length, 64, m)

    nz = np.flatnonzero(bits[starts] == 1)
    lead = _bit_windows(bits, starts[nz] + 1, 5).astype(np.int64)
    mb = mb_all[starts[nz]]
    # masked variable-width payload gather: columns j < mb contribute
    # bit << (mb - 1 - j); the rest contribute 0
    idx = (starts[nz] + 12)[:, None] + np.arange(64, dtype=np.int64)[None, :]
    valid = np.arange(64, dtype=np.int64)[None, :] < mb[:, None]
    shift = np.where(valid, mb[:, None] - 1 - np.arange(64, dtype=np.int64)[None, :], 0)
    payload = ((bp[idx].astype(np.uint64) * valid.astype(np.uint64))
               << shift.astype(np.uint64)).sum(axis=1, dtype=np.uint64)
    if np.any(lead + mb > 64):
        # a foreign/corrupt blob would otherwise underflow trail to a huge
        # uint64 and the payload shift would be out-of-range garbage —
        # refuse loudly like the codec's other malformed-input paths
        raise ValueError("gorilla: corrupt XOR block (lead + meaningful > 64)")
    trail = (64 - lead - mb).astype(np.uint64)
    xors = np.zeros(m, dtype=np.uint64)
    xors[nz] = payload << trail
    out[1:] = first ^ np.bitwise_xor.accumulate(xors)
    return out.view(np.float64)
