"""Pure-struct/numpy baseline TIFF codec (no libtiff/PIL in this container).

Implements the public TIFF 6.0 baseline spec for the subset thunder's tif
path produces via PIL (thunder/images/readers.py:~200 ``fromtif``,
writers.py:~40 ``totif``): uncompressed grayscale at 8 or 16 bits,
single- or multi-page (IFD chain == a z/time stack, thunder's ``nplanes``
contract).  The encoder writes little-endian ("II") with one strip per
page; the decoder accepts either byte order.

Like the PNG codec this is a whole-image numpy kernel meant for actor-pool
``map_batches`` stages — see ``sources/imagefiles.py`` for the Ray wiring.
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES_PER_PIXEL = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_BYTE_COUNTS = 279
_TAG_SAMPLE_FORMAT = 339

_TYPE_SHORT = 3   # uint16
_TYPE_LONG = 4    # uint32

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def encode_tiff(frames: np.ndarray) -> bytes:
    """(h, w) or (t, h, w) uint8/uint16 grayscale -> multi-page TIFF bytes."""
    a = np.asarray(frames)
    if a.ndim == 2:
        a = a[None]
    if a.ndim != 3:
        raise ValueError(f"expected (h,w) or (t,h,w), got {a.shape}")
    if a.dtype not in (np.dtype(np.uint8), np.dtype(np.uint16)):
        raise ValueError(f"expected uint8/uint16, got {a.dtype}")
    t, h, w = a.shape
    if t == 0 or h == 0 or w == 0:
        raise ValueError("empty stack")
    bits = a.dtype.itemsize * 8
    page_bytes = h * w * a.dtype.itemsize

    n_entries = 9
    ifd_size = 2 + n_entries * 12 + 4
    out = bytearray(b"II*\x00")
    out += struct.pack("<I", 8)  # first IFD immediately after header
    pix_base = 8 + t * ifd_size  # all IFDs, then all pixel strips

    for p in range(t):
        entries = [
            (_TAG_WIDTH, _TYPE_LONG, 1, w),
            (_TAG_HEIGHT, _TYPE_LONG, 1, h),
            (_TAG_BITS, _TYPE_SHORT, 1, bits),
            (_TAG_COMPRESSION, _TYPE_SHORT, 1, 1),      # none
            (_TAG_PHOTOMETRIC, _TYPE_SHORT, 1, 1),      # BlackIsZero
            (_TAG_STRIP_OFFSETS, _TYPE_LONG, 1, pix_base + p * page_bytes),
            (_TAG_SAMPLES_PER_PIXEL, _TYPE_SHORT, 1, 1),
            (_TAG_ROWS_PER_STRIP, _TYPE_LONG, 1, h),
            (_TAG_STRIP_BYTE_COUNTS, _TYPE_LONG, 1, page_bytes),
        ]
        out += struct.pack("<H", n_entries)
        for tag, typ, cnt, val in entries:
            if typ == _TYPE_SHORT:
                out += struct.pack("<HHIHH", tag, typ, cnt, val, 0)
            else:
                out += struct.pack("<HHII", tag, typ, cnt, val)
        next_ifd = 8 + (p + 1) * ifd_size if p + 1 < t else 0
        out += struct.pack("<I", next_ifd)

    out += (a if a.dtype == np.uint8 else a.astype("<u2")).tobytes()
    return bytes(out)


def _read_entry(data: bytes, pos: int, e: str):
    tag, typ, cnt = struct.unpack_from(e + "HHI", data, pos)
    size = _TYPE_SIZE.get(typ, 0) * cnt
    if size <= 4:
        voff = pos + 8
    else:
        (voff,) = struct.unpack_from(e + "I", data, pos + 8)
    if typ == _TYPE_SHORT:
        vals = struct.unpack_from(e + f"{cnt}H", data, voff)
    elif typ == _TYPE_LONG:
        vals = struct.unpack_from(e + f"{cnt}I", data, voff)
    else:
        vals = ()
    return tag, vals


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes -> (t, h, w) uint8/uint16 stack (t == number of pages)."""
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    (magic,) = struct.unpack_from(e + "H", data, 2)
    if magic != 42:
        raise ValueError("not a TIFF (bad magic)")
    (ifd_off,) = struct.unpack_from(e + "I", data, 4)

    pages = []
    seen_offsets = set()
    while ifd_off:
        # a corrupt next-IFD pointer must raise like every other malformed
        # input, never loop a worker forever
        if ifd_off in seen_offsets:
            raise ValueError("corrupt TIFF: IFD chain cycle")
        seen_offsets.add(ifd_off)
        if ifd_off + 2 > len(data):
            raise ValueError("truncated TIFF (IFD offset past end)")
        (n_entries,) = struct.unpack_from(e + "H", data, ifd_off)
        if ifd_off + 2 + n_entries * 12 + 4 > len(data):
            # entry table + next-IFD pointer must fit in the buffer — a
            # fabricated n_entries raised struct.error instead of the
            # codec's ValueError contract (review r4)
            raise ValueError("truncated TIFF (IFD entry table past end)")
        tags = {}
        for i in range(n_entries):
            tag, vals = _read_entry(data, ifd_off + 2 + i * 12, e)
            if vals:
                tags[tag] = vals
        (ifd_off,) = struct.unpack_from(e + "I", data, ifd_off + 2 + n_entries * 12)

        if _TAG_WIDTH not in tags or _TAG_HEIGHT not in tags:
            raise ValueError("corrupt TIFF: IFD missing width/height tags")
        if _TAG_STRIP_OFFSETS not in tags or _TAG_STRIP_BYTE_COUNTS not in tags:
            raise ValueError("corrupt TIFF: IFD missing strip layout tags")
        w = tags[_TAG_WIDTH][0]
        h = tags[_TAG_HEIGHT][0]
        bits = tags.get(_TAG_BITS, (8,))[0]
        comp = tags.get(_TAG_COMPRESSION, (1,))[0]
        spp = tags.get(_TAG_SAMPLES_PER_PIXEL, (1,))[0]
        fmt = tags.get(_TAG_SAMPLE_FORMAT, (1,))[0]
        if comp != 1:
            raise ValueError(f"unsupported TIFF compression {comp} (baseline only)")
        if spp != 1:
            raise ValueError(f"unsupported samples/pixel {spp} (grayscale only)")
        if bits not in (8, 16) or fmt != 1:
            raise ValueError(f"unsupported bits/sample {bits} or sample format {fmt}")
        offsets = tags[_TAG_STRIP_OFFSETS]
        counts = tags[_TAG_STRIP_BYTE_COUNTS]
        buf = b"".join(data[o: o + c] for o, c in zip(offsets, counts))
        if len(buf) != h * w * bits // 8:
            raise ValueError("TIFF strip bytes do not match page dimensions")
        if bits == 8:
            page = np.frombuffer(buf, dtype=np.uint8)
        else:
            page = np.frombuffer(buf, dtype=e + "u2").astype(np.uint16)
        pages.append(page.reshape(h, w))

    if not pages:
        raise ValueError("TIFF has no pages")
    shapes = {p.shape for p in pages}
    if len(shapes) != 1:
        raise ValueError(f"mixed page shapes in stack: {shapes}")
    dtypes = {p.dtype for p in pages}
    if len(dtypes) != 1:
        # np.stack would silently upcast a mixed 8/16-bit stack (review r4)
        raise ValueError(f"mixed page dtypes in stack: {dtypes}")
    return np.stack(pages)
