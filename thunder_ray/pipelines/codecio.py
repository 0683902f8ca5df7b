"""Codec round-trip queries — prove the pure-numpy PNG/TIFF codecs
(functions/png.py, functions/tiff.py — thunder images readers/writers
parity) INSIDE distributed pipelines, with bit-exact DuckDB twins.

Each query encodes every frame, decodes it back, and reduces to per-frame
integer stats including a position-WEIGHTED sum — a plain sum would pass
under any pixel permutation, the weighted sum pins exact raster order.
Any corruption in filtering, CRC, byte order or strip layout breaks the
driver's value-hash against the closed-form SQL.

The codec call is per-image by nature (one DEFLATE stream per file); the
vectorization boundary is the whole-image numpy kernel inside each call,
and batches stream through ``map_batches`` so nothing materializes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _u16_cubes(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """embeddings batch -> (vec_ids, (n, 8, 8) uint16 cube): the same
    1e6-scaling as the other images-over-embeddings queries, folded into
    uint16 range mod 65536 (non-negative, matching SQL's ((v%m)+m)%m)."""
    from ..stages import listkernels as lk
    from ..stages import signal as sg

    vals, offs = lk.list_parts(batch["embedding"])
    Y = np.floor(sg.as_2d(vals, offs).astype(np.float64) * 1e6).astype(np.int64)
    cube = np.mod(Y, 65536).astype(np.uint16).reshape(len(Y), 8, 8)
    ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return ids, cube


def _frame_stats(ids: np.ndarray, cube: np.ndarray) -> pa.Table:
    # explicit width: reshape(0, -1) raises on empty batches
    flat = cube.reshape(len(ids),
                        int(np.prod(cube.shape[1:]))).astype(np.int64)
    w = np.arange(1, flat.shape[1] + 1, dtype=np.int64)
    return pa.table({
        "frame_id": pa.array(ids, type=pa.int64()),
        "npix": pa.array(np.full(len(ids), flat.shape[1], dtype=np.int64)),
        "vsum": pa.array(flat.sum(axis=1)),
        "vmin": pa.array(flat.min(axis=1)),
        "vmax": pa.array(flat.max(axis=1)),
        "wsum": pa.array(flat @ w),
    })


def _roundtrip_query(sf_dir: str, encode, decode):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def roundtrip(batch: pa.Table) -> pa.Table:
        ids, cube = _u16_cubes(batch)
        out = np.stack([decode(encode(cube[i])) for i in range(len(ids))]) \
            if len(ids) else cube
        if out.dtype != np.uint16:
            raise ValueError(f"codec round-trip changed dtype: {out.dtype}")
        return _frame_stats(ids, out.reshape(len(ids), 8, 8))

    return ds.map_batches(roundtrip, batch_format="pyarrow", zero_copy_batch=True)


def png_roundtrip_stats_embeddings(sf_dir: str):
    """encode_png -> decode_png per frame, per-frame exact stats
    (thunder Images.topng + images.frompng, now real codecs)."""
    from ..functions.png import decode_png, encode_png

    return _roundtrip_query(sf_dir, encode_png, decode_png)


def tif_roundtrip_stats_embeddings(sf_dir: str):
    """encode_tiff -> decode_tiff per frame (single-page) with exact stats
    (thunder Images.totif + images.fromtif, now real codecs)."""
    from ..functions.tiff import decode_tiff, encode_tiff

    return _roundtrip_query(
        sf_dir, encode_tiff, lambda b: decode_tiff(b)[0])


_ROUNDTRIP_SQL = """
WITH flat AS (
  SELECT vec_id, pos,
         ((CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) % 65536)
          + 65536) % 65536 AS v
  FROM (SELECT vec_id, unnest(embedding) AS x,
               unnest(range(len(embedding))) AS pos FROM embeddings)
)
SELECT CAST(vec_id AS BIGINT) AS frame_id,
       COUNT(*) AS npix,
       CAST(SUM(v) AS BIGINT) AS vsum,
       MIN(v) AS vmin,
       MAX(v) AS vmax,
       CAST(SUM(v * (pos + 1)) AS BIGINT) AS wsum
FROM flat GROUP BY vec_id
"""


def media_png_decode_documents(sf_dir: str):
    """Real multimodal decode over an actor pool: documents -> deterministic
    16x16 gray PNG payloads -> ``multimodal.PngDecoder`` (codec state built
    once per actor) -> per-image pixel stats.  The closed-form pixel rule
    p[i] = (doc_id*31 + i*7) % 256 gives the DuckDB twin."""
    import ray.data as rd

    from ..functions.png import encode_png
    from ..stages.multimodal import PngDecoder

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def render(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pix = np.mod(ids[:, None] * 31 + np.arange(256, dtype=np.int64) * 7,
                     256).astype(np.uint8)
        payloads = [encode_png(pix[i].reshape(16, 16)) for i in range(len(ids))]
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
            "media_type": pa.array(["image"] * len(ids)),
            "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
        })

    media = ds.map_batches(render, batch_format="pyarrow", zero_copy_batch=True)
    return media.map_batches(PngDecoder, concurrency=(1, 4), batch_size=64,
                             batch_format="pyarrow", zero_copy_batch=True)


MEDIA_PNG_DECODE_SQL = """
WITH v AS (
  SELECT doc_id, i, (doc_id * 31 + i * 7) % 256 AS p
  FROM (SELECT doc_id, unnest(range(256)) AS i FROM documents)
)
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST(SUM(p) AS BIGINT) AS pixel_sum,
       MIN(p) AS pixel_min,
       MAX(p) AS pixel_max,
       CAST(SUM(p * (i + 1)) AS BIGINT) AS pixel_wsum
FROM v GROUP BY doc_id
"""


def build_codecio_queries() -> dict:
    return {
        "png_roundtrip_stats_embeddings": png_roundtrip_stats_embeddings,
        "tif_roundtrip_stats_embeddings": tif_roundtrip_stats_embeddings,
        "media_png_decode_documents": media_png_decode_documents,
    }


def build_codecio_sql() -> dict:
    return {
        "png_roundtrip_stats_embeddings": _ROUNDTRIP_SQL,
        "tif_roundtrip_stats_embeddings": _ROUNDTRIP_SQL,
        "media_png_decode_documents": MEDIA_PNG_DECODE_SQL,
    }
