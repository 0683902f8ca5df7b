"""PNG / TIFF file IO for the Images stack — thunder ``images.frompng`` /
``images.fromtif`` (thunder/images/readers.py:~150/~200) and
``Images.topng`` / ``Images.totif`` (thunder/images/writers.py:~10/~40),
backed by the pure-numpy codecs in ``functions/png.py`` / ``functions/tiff.py``
(no PIL/libtiff in this container — PNG needs only stdlib zlib).

Layout (deterministic, idempotent under Ray task retries — the 100 TB
resume story, same contract as ``sources/binary.py``):

  - ``to_png``: one ``frame-{frame_id:010d}.png`` per frame, atomic
    tmp+rename, plus ``conf.json`` recording the sample dtype.
  - ``to_tif``: ``npages=1`` -> one single-page tif per frame (same naming);
    ``npages>1`` -> ``groupby(frame_id // npages)`` shuffle co-locates each
    stack's pages and writes one multi-page ``stack-{gid:010d}.tif``
    (thunder's ``nplanes`` contract: frame_id = gid * npages + page, so ids
    must be 0..t-1 contiguous for a lossless round trip).
  - ``from_png`` / ``from_tif``: ``read_binary_files(include_paths=True)``
    -> whole-image numpy decode per batch -> canonical frames table
    (``frame_id, image: list<u8|u16>, height, width``).

Scale notes: encoded frames are large binaries — readers decode with a
small ``batch_size`` so payload x batch x concurrency fits worker heaps;
writers emit one file per frame/stack so a failed run skips finished files.
"""

from __future__ import annotations

import json
import os
import re

import numpy as np
import pyarrow as pa

from ..functions.png import decode_png, encode_png
from ..functions.tiff import decode_tiff, encode_tiff

_FRAME_RE = re.compile(r"(?:frame|stack)-(\d+)\.(?:png|tif)$")


def _frames_cube(batch: pa.Table, dtype: str):
    """Frames batch -> (frame_ids, (n,h,w) cube) cast+range-checked to dtype."""
    from ..stages.images import _cube

    fid, cube, h, w = _cube(batch)
    dt = np.dtype(dtype)
    info = np.iinfo(dt)
    if cube.size and (cube.min() < info.min or cube.max() > info.max):
        raise ValueError(
            f"image values outside {dtype} range "
            f"[{info.min}, {info.max}]: [{cube.min()}, {cube.max()}]")
    return fid, cube.astype(dt), h, w


def _atomic_write(path: str, data: bytes):
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def _write_conf(out_dir: str, payload: dict):
    with open(os.path.join(out_dir, "conf.json"), "w") as f:
        json.dump(payload, f)


def _manifest_schema() -> pa.Table:
    return pa.table({"file": pa.array([], type=pa.string()),
                     "frames": pa.array([], type=pa.int64())})


def to_png(ds, out_dir: str, dtype: str = "uint16"):
    """Frames Dataset -> one PNG per frame under ``out_dir``; returns out_dir."""
    os.makedirs(out_dir, exist_ok=True)

    def write(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _manifest_schema()
        fid, cube, h, w = _frames_cube(batch, dtype)
        files = []
        for i, f in enumerate(fid):
            p = os.path.join(out_dir, f"frame-{int(f):010d}.png")
            _atomic_write(p, encode_png(cube[i]))
            files.append(p)
        return pa.table({"file": pa.array(files),
                         "frames": pa.array(np.ones(len(files), dtype=np.int64))})

    n = sum(m["frames"] for m in
            ds.map_batches(write, batch_format="pyarrow",
                           zero_copy_batch=True).take_all())
    _write_conf(out_dir, {"format": "png", "dtype": dtype, "npages": 1,
                          "nframes": int(n)})
    return out_dir


def to_tif(ds, out_dir: str, dtype: str = "uint16", npages: int = 1):
    """Frames Dataset -> tif files under ``out_dir`` (``npages`` per file)."""
    os.makedirs(out_dir, exist_ok=True)

    if npages == 1:
        def write(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return _manifest_schema()
            fid, cube, h, w = _frames_cube(batch, dtype)
            files = []
            for i, f in enumerate(fid):
                p = os.path.join(out_dir, f"frame-{int(f):010d}.tif")
                _atomic_write(p, encode_tiff(cube[i]))
                files.append(p)
            return pa.table({"file": pa.array(files),
                             "frames": pa.array(np.ones(len(files), dtype=np.int64))})

        manifest = ds.map_batches(write, batch_format="pyarrow",
                                  zero_copy_batch=True).take_all()
    else:
        import pyarrow.compute as pc

        def tag(batch: pa.Table) -> pa.Table:
            gid = pc.divide(batch["frame_id"], npages)
            return batch.append_column("stack_id", pc.cast(gid, pa.int64()))

        def write_stack(group: pa.Table) -> pa.Table:
            import pyarrow as pa  # noqa: F811 (worker-side)

            order = np.argsort(group["frame_id"].to_numpy(zero_copy_only=False))
            group = group.take(pa.array(order))
            fid, cube, h, w = _frames_cube(group, dtype)
            gid = int(fid[0]) // npages
            if len(fid) != npages or (fid != gid * npages + np.arange(npages)).any():
                raise ValueError(
                    f"stack {gid}: expected contiguous frame_ids "
                    f"{gid * npages}..{gid * npages + npages - 1}, got {fid.tolist()}")
            p = os.path.join(out_dir, f"stack-{gid:010d}.tif")
            _atomic_write(p, encode_tiff(cube))
            return pa.table({"file": pa.array([p]),
                             "frames": pa.array([len(fid)], type=pa.int64())})

        manifest = (ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
                    .groupby("stack_id")
                    .map_groups(write_stack, batch_format="pyarrow")
                    .take_all())
    n = sum(m["frames"] for m in manifest)
    _write_conf(out_dir, {"format": "tif", "dtype": dtype, "npages": int(npages),
                          "nframes": int(n)})
    return out_dir


def _read_image_dir(path: str, ext: str, decode_one, npages: int,
                    batch_size: int = 32):
    """Shared reader: binary files -> frames table (one decode per file,
    ``npages`` frames out per tif stack)."""
    import ray.data as rd

    from ..stages.images import _emit

    files = sorted(os.path.join(path, p) for p in os.listdir(path)
                   if p.endswith(ext))
    if not files:
        raise FileNotFoundError(f"no *{ext} files under {path}")
    ds = rd.read_binary_files(files, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        out = []
        for pth, blob in zip(batch["path"], batch["bytes"]):
            m = _FRAME_RE.search(pth.as_py())
            if not m:
                raise ValueError(f"unrecognized image filename: {pth.as_py()}")
            base = int(m.group(1))
            cube = decode_one(blob.as_py())          # (t, h, w)
            if len(cube) != npages:
                # a stale/missing conf.json (wrong npages) would otherwise
                # emit colliding frame_ids across neighbouring stacks
                raise ValueError(
                    f"{pth.as_py()}: {len(cube)} page(s) but conf declares "
                    f"npages={npages}")
            fids = base * npages + np.arange(len(cube), dtype=np.int64)
            out.append(_emit(fids, cube))
        if not out:
            return _emit(np.empty(0, dtype=np.int64),
                         np.empty((0, 1, 1), dtype=np.uint16))
        return pa.concat_tables(out)

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=batch_size)


def from_png(path: str, batch_size: int = 32):
    """PNG dir -> frames Dataset (grayscale; dtype preserved from the files)."""
    return _read_image_dir(
        path, ".png", lambda b: decode_png(b)[None], 1, batch_size)


def from_tif(path: str, batch_size: int = 32):
    """TIFF dir -> frames Dataset; multi-page stacks expand to ``npages``
    consecutive frame_ids per file (conf.json written by ``to_tif``, default
    1 for foreign dirs of single-page files)."""
    npages = 1
    conf_path = os.path.join(path, "conf.json")
    if os.path.exists(conf_path):
        with open(conf_path) as f:
            npages = int(json.load(f).get("npages", 1))
    return _read_image_dir(path, ".tif", decode_tiff, npages, batch_size)
