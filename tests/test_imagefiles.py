"""PNG/TIFF codecs (functions/png.py, functions/tiff.py) + the frames-table
file IO (sources/imagefiles.py) — thunder images.frompng/fromtif and
Images.topng/totif parity (thunder/images/readers.py:~150/~200,
writers.py:~10/~40), pure numpy+zlib (no PIL in this container)."""

import struct
import zlib

import numpy as np
import pytest

from thunder_ray.functions.png import _defilter, decode_png, encode_png
from thunder_ray.functions.tiff import decode_tiff, encode_tiff

rng = np.random.default_rng(1234)


# ---------------------------------------------------------------------------
# PNG codec

@pytest.mark.parametrize("shape,dtype", [
    ((1, 1), np.uint8), ((5, 7), np.uint8), ((64, 64), np.uint8),
    ((3, 200), np.uint16), ((16, 16), np.uint16),
])
def test_png_roundtrip_gray(shape, dtype):
    img = rng.integers(0, np.iinfo(dtype).max + 1, size=shape).astype(dtype)
    out = decode_png(encode_png(img))
    assert out.dtype == img.dtype and np.array_equal(out, img)


def test_png_roundtrip_rgb():
    img = rng.integers(0, 256, size=(9, 11, 3)).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def _scalar_defilter(stream, h, rowbytes, bpp):
    """Per-spec scalar reconstruction oracle (PNG spec §6)."""
    stream = stream.reshape(h, 1 + rowbytes).astype(int)
    out = np.zeros((h, rowbytes), dtype=int)
    for y in range(h):
        f, row = stream[y, 0], stream[y, 1:]
        for x in range(rowbytes):
            a = out[y, x - bpp] if x >= bpp else 0
            b = out[y - 1, x] if y > 0 else 0
            c = out[y - 1, x - bpp] if (y > 0 and x >= bpp) else 0
            if f == 0:
                v = row[x]
            elif f == 1:
                v = row[x] + a
            elif f == 2:
                v = row[x] + b
            elif f == 3:
                v = row[x] + (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = row[x] + pred
            out[y, x] = v & 0xFF
    return out.astype(np.uint8)


@pytest.mark.parametrize("bpp", [1, 2, 3])
def test_png_defilter_all_filters_vs_scalar_oracle(bpp):
    """Foreign encoders mix filters per row — all 5 must reconstruct."""
    w, h = 6, 10
    rowbytes = w * bpp
    stream = rng.integers(0, 256, size=h * (1 + rowbytes)).astype(np.uint8)
    stream.reshape(h, -1)[:, 0] = rng.integers(0, 5, size=h)
    assert np.array_equal(_defilter(stream.copy(), h, rowbytes, bpp),
                          _scalar_defilter(stream, h, rowbytes, bpp))


def test_png_crc_corruption_detected():
    data = bytearray(encode_png(np.zeros((4, 4), dtype=np.uint8)))
    data[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_png_rejects_interlace_and_bad_inputs():
    img = np.zeros((4, 4), dtype=np.uint8)
    data = bytearray(encode_png(img))
    # IHDR body starts at byte 16; interlace flag is its 13th byte.
    ihdr_interlace = 8 + 8 + 12
    data[ihdr_interlace] = 1
    body = bytes(data[16: 16 + 13])
    struct.pack_into(">I", data, 8 + 8 + 13, zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="interlace"):
        decode_png(bytes(data))
    with pytest.raises(ValueError):
        decode_png(b"nonsense")
    with pytest.raises(ValueError):
        encode_png(np.zeros((2, 2), dtype=np.int64))  # must pre-cast
    with pytest.raises(ValueError):
        encode_png(np.zeros((2, 2, 3), dtype=np.uint16))  # RGB is 8-bit only


# ---------------------------------------------------------------------------
# TIFF codec

@pytest.mark.parametrize("shape,dtype", [
    ((4, 5, 6), np.uint8), ((1, 8, 8), np.uint16), ((3, 2, 2), np.uint16),
])
def test_tiff_roundtrip(shape, dtype):
    st = rng.integers(0, np.iinfo(dtype).max + 1, size=shape).astype(dtype)
    out = decode_tiff(encode_tiff(st))
    assert out.dtype == st.dtype and np.array_equal(out, st)


def test_tiff_2d_input_becomes_one_page():
    img = rng.integers(0, 256, (7, 9)).astype(np.uint8)
    out = decode_tiff(encode_tiff(img))
    assert out.shape == (1, 7, 9) and np.array_equal(out[0], img)


def test_tiff_big_endian_fixture():
    """Hand-built MM (big-endian) single-page 2x3 uint16 file — the decoder
    must honor the byte-order mark for both the IFD and the samples."""
    img = np.array([[1, 2, 3], [4, 5, 60000]], dtype=np.uint16)
    h, w = img.shape
    entries = [(256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 16), (259, 3, 1, 1),
               (262, 3, 1, 1), (273, 4, 1, 0), (277, 3, 1, 1), (278, 4, 1, h),
               (279, 4, 1, h * w * 2)]
    ifd = struct.pack(">H", len(entries))
    for tag, typ, cnt, val in entries:
        if typ == 3:
            ifd += struct.pack(">HHIHH", tag, typ, cnt, val, 0)
        else:
            ifd += struct.pack(">HHII", tag, typ, cnt, val)
    ifd += struct.pack(">I", 0)
    pix_off = 8 + len(ifd)
    # patch StripOffsets (6th entry, value at offset 2 + 5*12 + 8 in ifd)
    ifd = bytearray(ifd)
    struct.pack_into(">I", ifd, 2 + 5 * 12 + 8, pix_off)
    data = b"MM" + struct.pack(">HI", 42, 8) + bytes(ifd) + img.astype(">u2").tobytes()
    out = decode_tiff(data)
    assert out.dtype == np.uint16 and np.array_equal(out[0], img)


def test_tiff_rejects_compressed_and_garbage():
    st = encode_tiff(np.zeros((2, 2), dtype=np.uint8))
    bad = bytearray(st)
    # Compression tag value (entry index 3, SHORT) -> LZW(5)
    comp_val_off = 8 + 2 + 3 * 12 + 8
    struct.pack_into("<H", bad, comp_val_off, 5)
    with pytest.raises(ValueError, match="compression"):
        decode_tiff(bytes(bad))
    with pytest.raises(ValueError):
        decode_tiff(b"II+\x00whatever")


# ---------------------------------------------------------------------------
# Ray frames-table IO (needs the session Ray fixture)

def _stack_roundtrip(tmp_path, writer, reader, **kw):
    import ray.data as rd

    from thunder_ray.stages.images import frames_from_array

    stack = rng.integers(0, 60000, size=(24, 6, 5)).astype(np.int64)
    ds = rd.from_arrow(frames_from_array(stack)).repartition(4)
    out = writer(ds, str(tmp_path), dtype="uint16", **kw)
    rows = reader(out).take_all()
    rows.sort(key=lambda r: r["frame_id"])
    got = np.stack([np.asarray(r["image"]).reshape(6, 5) for r in rows])
    assert np.array_equal(got, stack)
    assert [r["frame_id"] for r in rows] == list(range(24))


def test_to_png_from_png_dir_roundtrip(ray_session, tmp_path):
    from thunder_ray.sources import imagefiles as imf

    _stack_roundtrip(tmp_path / "png", imf.to_png, imf.from_png)


def test_to_tif_from_tif_per_frame(ray_session, tmp_path):
    from thunder_ray.sources import imagefiles as imf

    _stack_roundtrip(tmp_path / "tif1", imf.to_tif, imf.from_tif)


def test_to_tif_from_tif_multipage_stacks(ray_session, tmp_path):
    from thunder_ray.sources import imagefiles as imf

    _stack_roundtrip(tmp_path / "tif6", imf.to_tif, imf.from_tif, npages=6)
    files = sorted(p.name for p in (tmp_path / "tif6").iterdir())
    assert "stack-0000000000.tif" in files and len(
        [f for f in files if f.endswith(".tif")]) == 4


def test_to_png_range_check(ray_session, tmp_path):
    import ray
    import ray.data as rd

    from thunder_ray.sources import imagefiles as imf
    from thunder_ray.stages.images import frames_from_array

    stack = np.full((2, 2, 2), 70000, dtype=np.int64)  # > uint16 max
    ds = rd.from_arrow(frames_from_array(stack))
    with pytest.raises(ray.exceptions.RayTaskError, match="uint16 range"):
        imf.to_png(ds, str(tmp_path / "bad"), dtype="uint16")


def test_decode_tiff_ifd_cycle_raises():
    """A next-IFD pointer that loops must raise, never hang the worker."""
    import struct

    import numpy as np
    import pytest

    from thunder_ray.functions.tiff import decode_tiff, encode_tiff

    data = bytearray(encode_tiff(np.zeros((1, 2, 2), dtype=np.uint8)))
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n_entries,) = struct.unpack_from("<H", data, ifd_off)
    next_pos = ifd_off + 2 + n_entries * 12
    struct.pack_into("<I", data, next_pos, ifd_off)   # point IFD at itself
    with pytest.raises(ValueError, match="cycle"):
        decode_tiff(bytes(data))


def test_decode_png_truncated_raises_valueerror():
    import numpy as np
    import pytest

    from thunder_ray.functions.png import decode_png, encode_png

    blob = encode_png(np.zeros((2, 2), dtype=np.uint8))
    with pytest.raises(ValueError, match="truncated|missing"):
        decode_png(blob[: len(blob) // 2])
