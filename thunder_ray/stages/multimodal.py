"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed by actor-pool ``map_batches`` stages (SURVEY.md §2.8 pattern —
stateful setup once per actor in ``__init__``, vectorized work per batch).

Decode paths: ``PngDecoder`` is a REAL decoder — PNG needs only stdlib
zlib, implemented in ``functions/png.py`` (same for TIFF via
``functions/tiff.py``).  ``FakeDecoder`` remains the deterministic
stand-in for formats whose codecs the container lacks (JPEG/audio), and
``RealDecoder`` stays import-gated on PIL/soundfile for those.

Memory discipline for large payloads: callers should pass a small
``batch_size`` (payload bytes x batch_size x concurrency must fit worker
heaps) — see ``decode_stage``'s default of 64.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    pa.field("media_id", pa.int64()),
    pa.field("payload", pa.binary()),        # opaque encoded bytes
    pa.field("media_type", pa.string()),     # "image" | "audio" | ...
    pa.field("n_bytes", pa.int64()),
])

FEATURE_DIM = 16


class FakeDecoder:
    """Deterministic stand-in for an image/audio decode + feature extract.

    __init__ = the once-per-actor setup slot (where a real decoder loads
    its model); __call__ = per-batch vectorized decode.  Features: byte
    histogram (16 coarse bins, exact ints) + payload length — deterministic
    and cheap, so tests can pin exact values.
    """

    def __init__(self, feature_dim: int = FEATURE_DIM):
        self.dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch["payload"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        buf = np.frombuffer(payload.buffers()[2], dtype=np.uint8)
        offs = np.frombuffer(payload.buffers()[1], dtype=np.int32)[
            payload.offset: payload.offset + len(payload) + 1].astype(np.int64)
        rel = offs - offs[0]
        data = buf[offs[0]: offs[-1]]
        # 16-bin byte histogram per row, fully segmented-vectorized
        bins = (data >> 4).astype(np.int64)
        row = np.repeat(np.arange(len(payload), dtype=np.int64), np.diff(rel))
        flatk = row * 16 + bins
        hist = np.bincount(flatk, minlength=len(payload) * 16).reshape(len(payload), 16)
        feats = pa.FixedSizeListArray.from_arrays(
            pa.array(hist.astype(np.float64).reshape(-1)), 16)
        return pa.table({
            "media_id": batch["media_id"].combine_chunks()
            if isinstance(batch["media_id"], pa.ChunkedArray) else batch["media_id"],
            "n_bytes": pa.array(np.diff(rel), type=pa.int64()),
            "features": feats,
        })


class PngDecoder:
    """REAL image decode over an actor pool: PNG payloads -> exact per-image
    pixel stats (sum/min/max + raster-order-weighted sum).  The codec is the
    pure-numpy PNG implementation in ``functions/png.py`` — no PIL needed.
    ``__init__`` builds per-actor state once (the weight ramp); ``__call__``
    decodes a batch of images."""

    def __init__(self, max_pixels: int = 1 << 24):
        self._w_cache: np.ndarray = np.arange(1, 257, dtype=np.int64)
        self._max_pixels = max_pixels

    def _weights(self, n: int) -> np.ndarray:
        if n > len(self._w_cache):
            self._w_cache = np.arange(1, n + 1, dtype=np.int64)
        return self._w_cache[:n]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.png import decode_png

        payload = batch["payload"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        sums, mins, maxs, wsums = [], [], [], []
        for blob in payload:
            img = decode_png(blob.as_py()).astype(np.int64).reshape(-1)
            if len(img) > self._max_pixels:
                raise ValueError("image exceeds per-actor pixel budget")
            sums.append(int(img.sum()))
            mins.append(int(img.min()))
            maxs.append(int(img.max()))
            wsums.append(int(img @ self._weights(len(img))))
        mid = batch["media_id"]
        return pa.table({
            "media_id": mid.combine_chunks()
            if isinstance(mid, pa.ChunkedArray) else mid,
            "pixel_sum": pa.array(sums, type=pa.int64()),
            "pixel_min": pa.array(mins, type=pa.int64()),
            "pixel_max": pa.array(maxs, type=pa.int64()),
            "pixel_wsum": pa.array(wsums, type=pa.int64()),
        })


class RealDecoder:
    """Decode stage for formats the container has no codecs for (JPEG,
    audio): requires PIL / soundfile — import-gated stub (north-rule
    multimodal requirement: make the Ray plumbing real, stub the codec).
    PNG/TIFF do NOT route here: see ``PngDecoder`` / ``functions/tiff.py``."""

    def __init__(self, media_type: str = "image"):
        try:
            import PIL.Image  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "image/audio codecs not available in this container; "
                "use FakeDecoder for plumbing tests"
            ) from e

    def __call__(self, batch: pa.Table) -> pa.Table:  # pragma: no cover
        raise NotImplementedError


def media_from_documents(sf_dir: str):
    """Derive a media table from documents: payload = utf-8 bytes of text
    (an opaque deterministic binary column with realistic size variance)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_media(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        payload = batch["text"].cast(pa.binary())
        return pa.table({
            "media_id": batch["doc_id"].cast(pa.int64()),
            "payload": payload,
            "media_type": pa.array(["image"] * len(batch)),
            "n_bytes": pc.binary_length(payload).cast(pa.int64()),
        })

    return ds.map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)


def decode_stage(media_ds, concurrency=(1, 4), batch_size: int = 64):
    """media table -> features via the actor-pool decode (small batch_size:
    payloads are large at production scale)."""
    return media_ds.map_batches(
        FakeDecoder, concurrency=concurrency, batch_size=batch_size,
        batch_format="pyarrow", zero_copy_batch=True,
    )


def frame_sample_stage(media_ds, every_k: int = 4, concurrency=(1, 2)):
    """'Frame sampling': deterministic byte-strided subsample of the payload
    (video-frame-sampling plumbing; the real codec would split frames)."""

    class Sampler:
        def __init__(self):
            self.k = every_k

        def __call__(self, batch: pa.Table) -> pa.Table:
            payload = batch["payload"]
            if isinstance(payload, pa.ChunkedArray):
                payload = payload.combine_chunks()
            buf = np.frombuffer(payload.buffers()[2], dtype=np.uint8)
            offs = np.frombuffer(payload.buffers()[1], dtype=np.int32)[
                payload.offset: payload.offset + len(payload) + 1].astype(np.int64)
            lens = np.diff(offs)
            n_s = (lens + self.k - 1) // self.k        # ceil(len / k)
            # one strided gather over the whole batch's byte buffer
            rep = np.repeat(np.arange(len(lens), dtype=np.int64), n_s)
            intra = (np.arange(int(n_s.sum()), dtype=np.int64)
                     - np.repeat(np.cumsum(n_s) - n_s, n_s))
            flat = buf[offs[:-1][rep] + intra * self.k]
            out_offs = np.zeros(len(lens) + 1, dtype=np.int64)
            out_offs[1:] = np.cumsum(n_s)
            sampled = pa.Array.from_buffers(
                pa.binary(), len(lens),
                [None, pa.py_buffer(out_offs.astype(np.int32).tobytes()),
                 pa.py_buffer(flat.tobytes())])
            return pa.table({
                "media_id": batch["media_id"].combine_chunks()
                if isinstance(batch["media_id"], pa.ChunkedArray) else batch["media_id"],
                "sampled": sampled,
                "n_sampled": pa.array(n_s, type=pa.int64()),
            })

    return media_ds.map_batches(Sampler, concurrency=concurrency,
                                batch_size=64, batch_format="pyarrow")


RESIZE_DIM = 32


def resize_stage(media_ds, out_dim: int = RESIZE_DIM, concurrency=(1, 2)):
    """'Resize' for opaque media: nearest-neighbour resample of the payload
    bytes to a fixed ``out_dim`` (the image-resize analogue on the stubbed
    decode path; a real decoder would resample pixels the same way).
    Fully vectorized: one gather over the batch's flat byte buffer with
    per-row stride indices ``(j * n_row) // out_dim``."""

    class Resizer:
        def __init__(self):
            self.j = np.arange(out_dim, dtype=np.int64)

        def __call__(self, batch: pa.Table) -> pa.Table:
            payload = batch["payload"]
            if isinstance(payload, pa.ChunkedArray):
                payload = payload.combine_chunks()
            buf = np.frombuffer(payload.buffers()[2], dtype=np.uint8)
            offs = np.frombuffer(payload.buffers()[1], dtype=np.int32)[
                payload.offset: payload.offset + len(payload) + 1].astype(np.int64)
            lens = np.diff(offs)
            if (lens == 0).any():
                raise ValueError("resize_stage requires non-empty payloads")
            idx = offs[:-1, None] + (self.j[None, :] * lens[:, None]) // out_dim
            resized = buf[idx].astype(np.int64)          # (n, out_dim)
            vals = pa.FixedSizeListArray.from_arrays(
                pa.array(resized.reshape(-1)), out_dim)
            return pa.table({
                "media_id": batch["media_id"].combine_chunks()
                if isinstance(batch["media_id"], pa.ChunkedArray) else batch["media_id"],
                "resized": vals,
            })

    return media_ds.map_batches(Resizer, concurrency=concurrency,
                                batch_size=64, batch_format="pyarrow",
                                zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Driver queries

def multimodal_features_documents(sf_dir: str):
    """(media_id, n_bytes, hist_hi) — hist_hi sums histogram bins 6-7
    (bytes in [96, 128): lowercase ASCII, SQL-expressible as a range
    count), n_bytes = octet_length.  Exercises the full actor-pool decode
    path."""
    feats = decode_stage(media_from_documents(sf_dir))

    def project(batch: pa.Table) -> pa.Table:
        f = batch["features"]
        if isinstance(f, pa.ChunkedArray):
            f = f.combine_chunks()
        H = np.asarray(f.values.to_numpy(zero_copy_only=False)).reshape(-1, FEATURE_DIM)
        return pa.table({
            "media_id": batch["media_id"].combine_chunks()
            if isinstance(batch["media_id"], pa.ChunkedArray) else batch["media_id"],
            "n_bytes": batch["n_bytes"].combine_chunks()
            if isinstance(batch["n_bytes"], pa.ChunkedArray) else batch["n_bytes"],
            "hist_hi": pa.array(H[:, 6:8].sum(axis=1).astype(np.int64)),
        })

    return feats.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


MULTIMODAL_FEATURES_SQL = """
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       CAST(octet_length(CAST(text AS BLOB))
            - octet_length(CAST(regexp_replace(text, '[\\x60-\\x7f]', '', 'g') AS BLOB))
            AS BIGINT) AS hist_hi
FROM documents
"""


def frame_sample_documents(sf_dir: str):
    media = media_from_documents(sf_dir)
    return frame_sample_stage(media).select_columns(["media_id", "n_sampled"])


FRAME_SAMPLE_SQL = """
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST((octet_length(CAST(text AS BLOB)) + 3) // 4 AS BIGINT) AS n_sampled
FROM documents
"""


def media_resize_documents(sf_dir: str):
    """Flattened resize output: (media_id, j, v) — v is the payload byte at
    ``(j * n) // 32``, which the SQL twin reproduces with ascii(substring)
    on the (verified pure-ASCII) documents text."""
    resized = resize_stage(media_from_documents(sf_dir))

    def flat(batch: pa.Table) -> pa.Table:
        r = batch["resized"]
        if isinstance(r, pa.ChunkedArray):
            r = r.combine_chunks()
        V = np.asarray(r.values.to_numpy(zero_copy_only=False)).reshape(-1, RESIZE_DIM)
        mid = batch["media_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "media_id": pa.array(np.repeat(mid, RESIZE_DIM)),
            "j": pa.array(np.tile(np.arange(RESIZE_DIM, dtype=np.int64), len(mid))),
            "v": pa.array(V.reshape(-1).astype(np.int64)),
        })

    return resized.map_batches(flat, batch_format="pyarrow", zero_copy_batch=True)


MEDIA_RESIZE_SQL = f"""
SELECT CAST(doc_id AS BIGINT) AS media_id, CAST(j AS BIGINT) AS j,
       CAST(ascii(substring(text,
            CAST(j * octet_length(CAST(text AS BLOB)) // {RESIZE_DIM} AS INTEGER) + 1,
            1)) AS BIGINT) AS v
FROM (SELECT doc_id, text, unnest(range({RESIZE_DIM})) AS j FROM documents)
"""


def build_multimodal_queries() -> dict:
    return {
        "multimodal_features_documents": multimodal_features_documents,
        "frame_sample_documents": frame_sample_documents,
        "media_resize_documents": media_resize_documents,
    }


def build_multimodal_sql() -> dict:
    return {
        "multimodal_features_documents": MULTIMODAL_FEATURES_SQL,
        "frame_sample_documents": FRAME_SAMPLE_SQL,
        "media_resize_documents": MEDIA_RESIZE_SQL,
    }
