"""Images stack (thunder/images/images.py, SURVEY.md §2.3 'Images spatial
ops' + §2.7 ``toseries``), re-expressed over a flat Arrow table:

    frame_id: int64, image: list<T> (row-major h*w), height: int32, width: int32

Every spatial op is a whole-batch numpy kernel over the ``(n, h, w)`` cube
(fixed frame shape per dataset, like thunder).  scipy is not available in
this container, so the filters are pure-numpy implementations with
documented semantics (reflect padding, like scipy.ndimage defaults);
correctness is pinned to the naive per-frame oracles in tests/test_images.py.

``toseries`` — thunder's signature all-to-all (Images -> Series axis
transpose, thunder/blocks/blocks.py) — is expressed Ray-Data-first:
map_batches emits per-(pixel-chunk, frame) slices, a ``groupby(chunk)``
shuffle co-locates each pixel chunk's full time axis, and ``map_groups``
reassembles one Series row per pixel.  Partitioning assumption: one pixel
chunk x all frames fits a worker (chunk size trades shuffle fan-out vs
group memory, thunder's chunk_size='auto' ≈ equal-bytes chunks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import listkernels as lk


def _i64(a) -> pa.Array:
    return pa.array(np.asarray(a, dtype=np.int64), type=pa.int64())


def _cube(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, int, int]:
    """(frame_ids, (n, h, w) cube) — zero-copy reshape of the list column."""
    vals, offs = lk.list_parts(batch["image"])
    h = int(batch["height"][0].as_py())
    w = int(batch["width"][0].as_py())
    base = lk._base_values(vals, offs)
    fid = batch["frame_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return fid, base.reshape(len(fid), h, w), h, w


def _emit(fid, cube) -> pa.Table:
    n, h, w = cube.shape
    flat = cube.reshape(n, h * w)
    return pa.table({
        "frame_id": _i64(fid),
        "image": pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * h * w, h * w, dtype=np.int32)),
            pa.array(flat.reshape(-1))),
        "height": pa.array(np.full(n, h, dtype=np.int32)),
        "width": pa.array(np.full(n, w, dtype=np.int32)),
    })


def images_from_table(tbl: pa.Table):
    import ray.data as rd

    return rd.from_arrow(tbl)


def frames_from_array(a: np.ndarray) -> pa.Table:
    """thunder images.fromarray: (t, h, w) ndarray -> frames table."""
    t, h, w = a.shape
    return _emit(np.arange(t, dtype=np.int64), a)


# ---------------------------------------------------------------------------
# Per-frame spatial ops (thunder images.py:~200-600)

def max_projection(ds, axis: int = 0):
    """Max over one spatial axis -> 1-D profile per frame (axis 0 = over
    rows -> per-column maxima, matching thunder's spatial projection)."""

    def f(batch: pa.Table) -> pa.Table:
        fid, cube, h, w = _cube(batch)
        proj = cube.max(axis=1 + axis)
        d = proj.shape[1]
        return pa.table({
            "frame_id": _i64(np.repeat(fid, d)),
            "pos": _i64(np.tile(np.arange(d, dtype=np.int64), len(fid))),
            "value": pa.array(proj.reshape(-1)),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def max_min_projection(ds, axis: int = 0):
    """thunder max_min_projection: max + min along the axis."""

    def f(batch: pa.Table) -> pa.Table:
        fid, cube, h, w = _cube(batch)
        mx = cube.max(axis=1 + axis)
        mn = cube.min(axis=1 + axis)
        d = mx.shape[1]
        return pa.table({
            "frame_id": _i64(np.repeat(fid, d)),
            "pos": _i64(np.tile(np.arange(d, dtype=np.int64), len(fid))),
            "vmax": pa.array(mx.reshape(-1)),
            "vmin": pa.array(mn.reshape(-1)),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def spatial_subsample(ds, factor: int):
    def f(batch: pa.Table) -> pa.Table:
        fid, cube, h, w = _cube(batch)
        return _emit(fid, np.ascontiguousarray(cube[:, ::factor, ::factor]))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def subtract(ds, val):
    def f(batch: pa.Table) -> pa.Table:
        fid, cube, h, w = _cube(batch)
        return _emit(fid, cube - val)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _reflect_pad(cube: np.ndarray, r: int) -> np.ndarray:
    return np.pad(cube, ((0, 0), (r, r), (r, r)), mode="symmetric")


def uniform_filter(ds, size: int = 3):
    """Box mean with reflect padding (scipy.ndimage.uniform_filter semantics
    for odd ``size``), via 2-D sliding windows on the padded cube."""

    def f(batch: pa.Table) -> pa.Table:
        fid, cube, h, w = _cube(batch)
        out = _box_mean(cube.astype(np.float64), size)
        return _emit(fid, out)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _box_mean(cube: np.ndarray, size: int) -> np.ndarray:
    r = size // 2
    p = _reflect_pad(cube, r)
    # integral image per frame: exact separable box sum
    c = p.cumsum(axis=1).cumsum(axis=2)
    c = np.pad(c, ((0, 0), (1, 0), (1, 0)))
    n, H, W = cube.shape
    s = (c[:, size: size + H, size: size + W] - c[:, 0:H, size: size + W]
         - c[:, size: size + H, 0:W] + c[:, 0:H, 0:W])
    return s / (size * size)


def median_filter(ds, size: int = 3):
    """Median over the size x size neighbourhood, reflect padding."""

    def f(batch: pa.Table) -> pa.Table:
        fid, cube, h, w = _cube(batch)
        r = size // 2
        p = _reflect_pad(cube, r)
        views = [p[:, dy: dy + h, dx: dx + w]
                 for dy in range(size) for dx in range(size)]
        out = np.median(np.stack(views, axis=-1), axis=-1)
        return _emit(fid, out)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def gaussian_filter(ds, sigma: float, truncate: float = 4.0):
    """Separable Gaussian blur, reflect padding, kernel radius
    ``int(truncate * sigma + 0.5)`` (scipy parameterization)."""
    r = int(truncate * float(sigma) + 0.5)
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()

    def f(batch: pa.Table) -> pa.Table:
        fid, cube, h, w = _cube(batch)
        p = _reflect_pad(cube.astype(np.float64), r)
        # convolve rows then columns (tap loop, vectorized over frames)
        tmp = np.zeros((len(fid), h + 2 * r, w))
        for j in range(2 * r + 1):
            tmp += p[:, :, j: j + w] * k[j]
        out = np.zeros((len(fid), h, w))
        for j in range(2 * r + 1):
            out += tmp[:, j: j + h, :] * k[j]
        return _emit(fid, out)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# toseries — the axis-transpose shuffle (thunder Images.toseries)

def toseries(ds, chunks: int = 16):
    """Frames (time-major) -> per-pixel Series rows (space-major):
    one output row per pixel: (pixel_id, series: list ordered by frame_id).

    map_batches slices each frame batch into ``chunks`` contiguous pixel
    ranges -> groupby(chunk) shuffle -> map_groups stacks each chunk's
    frames in frame order and emits its pixels' series.
    """

    def slice_chunks(batch: pa.Table) -> pa.Table:
        fid, cube, h, w = _cube(batch)
        npix = h * w
        flat = cube.reshape(len(fid), npix)
        bounds = np.linspace(0, npix, chunks + 1).astype(np.int64)
        out_chunk, out_fid, out_vals, out_start = [], [], [], []
        for c in range(chunks):
            lo, hi = int(bounds[c]), int(bounds[c + 1])
            if lo == hi:
                continue
            for i in range(len(fid)):
                out_chunk.append(c)
                out_fid.append(int(fid[i]))
                out_start.append(lo)
                out_vals.append(flat[i, lo:hi])
        lens = np.array([len(v) for v in out_vals], dtype=np.int32)
        offs = np.zeros(len(lens) + 1, dtype=np.int32)
        np.cumsum(lens, out=offs[1:])
        return pa.table({
            "chunk": _i64(out_chunk),
            "frame_id": _i64(out_fid),
            "pix_start": _i64(out_start),
            "vals": pa.ListArray.from_arrays(
                pa.array(offs),
                pa.array(np.concatenate(out_vals) if out_vals
                         else np.empty(0, dtype=cube.dtype))),
        })

    sliced = ds.map_batches(slice_chunks, batch_format="pyarrow", zero_copy_batch=True)

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("frame_id")
        mat = np.stack([np.asarray(v) for v in g["vals"]])   # (t, chunk_pix)
        start = int(g["pix_start"].iloc[0])
        series = mat.T                                       # (chunk_pix, t)
        return pd.DataFrame({
            "pixel_id": np.arange(start, start + series.shape[0], dtype=np.int64),
            "series": list(series),
        })

    return sliced.groupby("chunk").map_groups(reassemble, batch_format="pandas")
