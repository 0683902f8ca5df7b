"""Pure-numpy PNG codec (no PIL/libpng in this container).

Implements the public PNG specification (RFC 2083 / W3C PNG 2nd ed.):
zlib (stdlib) for the DEFLATE stream, ``zlib.crc32`` for chunk CRCs, numpy
for filtering.  This makes the reference's ``images.frompng`` /
``Images.topng`` (thunder/images/readers.py:~150, writers.py:~10) REAL
instead of codec-stubbed — the container ships no image libraries, but PNG
needs none beyond zlib.

Scope (everything thunder's png path produces via PIL):
  - color type 0 (grayscale) at bit depth 8 or 16, color type 2 (RGB) at 8
  - no interlace (Adam7 raises), no palette, no alpha
  - encoder emits filter 2 ("Up") per scanline — fully vectorizable on both
    sides and effective on smooth imaging data; decoder handles ALL five
    standard filters (0/1/2 vectorized; 3/4 scalar per-row, only reachable
    on foreign-encoder files)

Performance notes (the 100 TB story): encode/decode are whole-image numpy
kernels intended to run inside actor-pool ``map_batches`` stages with small
``batch_size`` (payload bytes x batch x concurrency must fit worker heaps).
16-bit samples are big-endian on the wire per spec ->  ``.byteswap`` copies
once each way.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(tag + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """(h, w) uint8/uint16 grayscale or (h, w, 3) uint8 RGB -> PNG bytes."""
    img = np.asarray(img)
    if img.ndim == 2:
        color_type, channels = 0, 1
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) array, got {img.shape}")
    if img.dtype == np.uint8:
        depth = 8
    elif img.dtype == np.uint16:
        if color_type == 2:
            raise ValueError("RGB supported at 8-bit only")
        depth = 16
    else:
        raise ValueError(f"expected uint8/uint16, got {img.dtype}")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")

    if depth == 16:
        raw = img.astype(">u2").view(np.uint8).reshape(h, -1)
    else:
        raw = img.reshape(h, -1)
    # Filter 2 (Up): row - previous_row, mod 256; first row unchanged.
    filt = np.empty_like(raw)
    filt[0] = raw[0]
    np.subtract(raw[1:], raw[:-1], out=filt[1:])
    stream = np.concatenate(
        [np.full((h, 1), 2, dtype=np.uint8), filt], axis=1
    ).tobytes()

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(stream, level))
        + _chunk(b"IEND", b"")
    )


def _defilter(stream: np.ndarray, h: int, rowbytes: int, bpp: int) -> np.ndarray:
    """Filtered scanline stream (h x (1+rowbytes) bytes) -> raw (h, rowbytes).

    Filters per the spec §6: 0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth.
    Sub is a per-byte-lane cumulative sum (uint8 accumulate wraps mod 256 ->
    vectorized); Average/Paeth carry a left dependency through a divide /
    predictor so they fall back to a scalar row loop (our encoder never
    emits them; foreign files only).
    """
    stream = stream.reshape(h, 1 + rowbytes)
    ftypes = stream[:, 0]
    rows = stream[:, 1:]
    if h and (ftypes == 2).all():
        # all-Up images (everything our encoder emits) de-filter as ONE
        # wrapping column-wise cumulative sum — no per-row Python on the
        # hot restore path (review r4); uint8 accumulate wraps mod 256
        return np.add.accumulate(rows, axis=0, dtype=np.uint8)
    out = np.empty((h, rowbytes), dtype=np.uint8)
    prior = np.zeros(rowbytes, dtype=np.uint8)
    lanes = rowbytes // bpp
    for y in range(h):
        f, row = int(ftypes[y]), rows[y]
        if f == 0:
            out[y] = row
        elif f == 1:
            np.add.accumulate(row.reshape(lanes, bpp), axis=0, out=out[y].reshape(lanes, bpp))
        elif f == 2:
            np.add(row, prior, out=out[y])
        elif f == 3:
            o = out[y]
            o[:bpp] = row[:bpp] + prior[:bpp] // 2
            for x in range(bpp, rowbytes):
                o[x] = row[x] + ((int(o[x - bpp]) + int(prior[x])) >> 1)
        elif f == 4:
            o = out[y]
            o[:bpp] = row[:bpp] + prior[:bpp]  # left=0, up-left=0 -> predictor=up
            for x in range(bpp, rowbytes):
                a, b, c = int(o[x - bpp]), int(prior[x]), int(prior[x - bpp])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                o[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f} on row {y}")
        prior = out[y]
    return out


def decode_png(data: bytes, verify_crc: bool = True) -> np.ndarray:
    """PNG bytes -> (h, w) uint8/uint16 or (h, w, 3) uint8 array."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", data, pos)
        if pos + 12 + length > n:
            # a truncated / corrupt-length chunk must raise the codec's
            # ValueError contract, not struct.error
            raise ValueError("truncated PNG (chunk past end of data)")
        tag = data[pos + 4: pos + 8]
        body = data[pos + 8: pos + 8 + length]
        if verify_crc:
            (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
            if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
                raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    if len(ihdr) != 13:
        # a short IHDR body passes the length/CRC chunk checks but would
        # raise struct.error below, breaking the ValueError contract
        raise ValueError(f"corrupt PNG: IHDR body is {len(ihdr)} bytes, expected 13")
    w, h, depth, color_type, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7 interlaced PNG not supported")
    if color_type == 0:
        channels = 1
    elif color_type == 2:
        channels = 3
    else:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if depth not in (8, 16) or (depth == 16 and color_type == 2):
        raise ValueError(f"unsupported bit depth {depth} for color type {color_type}")

    bpp = channels * depth // 8
    rowbytes = w * bpp
    stream = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(stream) != h * (1 + rowbytes):
        raise ValueError("PNG pixel stream length mismatch")
    raw = _defilter(stream, h, rowbytes, bpp)
    if depth == 16:
        return raw.reshape(h, w, 2).view(">u2").astype(np.uint16).reshape(h, w)
    if channels == 3:
        return raw.reshape(h, w, 3)
    return raw.reshape(h, w)
