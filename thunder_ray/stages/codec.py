"""Gorilla-compressed tier storage: actor-pool encode/decode stages.

A rolled tier is compressed per ``source`` series: rows are sorted by
``bucket``, then each column is encoded — integer moments (bucket, count,
sum, sumsq, min, max) with delta-of-delta, derived floats (mean, m2) with
XOR (functions/gorilla.py) — producing ONE row per (source, chunk) with
binary blob columns.  Chunking bounds blob size (``max_points``) so a
single hot source can't produce an unbounded row: at 100 TB a source's
1m tier for a year is ~526k points -> a handful of 64k-point chunks.

Encode/decode run as **actor pools** (callable classes passed to
``map_batches(..., concurrency=N)``): buffers and dispatch tables are
constructed once per actor in ``__init__``, per-batch work is pure numpy
(SURVEY.md §2.8 'stateful stages are actor pools').
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import gorilla

INT_COLS = ["bucket", "count", "sum", "sumsq", "min", "max"]
FLOAT_COLS = ["mean", "m2"]

BLOB_SCHEMA = pa.schema(
    [pa.field("source", pa.string()), pa.field("chunk", pa.int32()),
     pa.field("n_points", pa.int64())]
    + [pa.field(f"{c}_blob", pa.binary()) for c in INT_COLS + FLOAT_COLS]
)


class GorillaEncode:
    """map_batches actor: batches of tier rows -> per-(source, chunk) blobs.

    Requires batches that contain whole source groups — produced by
    ``tier_ds.groupby("source").map_groups(GorillaEncode(), ...)`` or by
    ``encode_tier`` below.  Sorting by bucket inside the group makes the
    blob deterministic regardless of upstream row order.
    """

    def __init__(self, max_points: int = 65_536):
        self.max_points = int(max_points)

    def __call__(self, batch: pa.Table) -> pa.Table:
        srcs = batch["source"].to_numpy(zero_copy_only=False)
        order = np.lexsort((batch["bucket"].to_numpy(zero_copy_only=False), srcs))
        cols = {c: batch[c].to_numpy(zero_copy_only=False)[order] for c in INT_COLS + FLOAT_COLS}
        srcs = srcs[order]

        out = {name: [] for name in BLOB_SCHEMA.names}
        boundaries = np.flatnonzero(np.concatenate(([True], srcs[1:] != srcs[:-1])))
        ends = np.append(boundaries[1:], len(srcs))
        for s, e in zip(boundaries, ends):
            for ci, cs in enumerate(range(s, e, self.max_points)):
                ce = min(cs + self.max_points, e)
                out["source"].append(srcs[s])
                out["chunk"].append(ci)
                out["n_points"].append(ce - cs)
                for c in INT_COLS:
                    out[f"{c}_blob"].append(
                        gorilla.encode_dod(cols[c][cs:ce].astype(np.int64))
                    )
                for c in FLOAT_COLS:
                    out[f"{c}_blob"].append(gorilla.encode_xor(cols[c][cs:ce]))
        return pa.Table.from_pydict(out, schema=BLOB_SCHEMA)


class GorillaDecode:
    """map_batches actor: blob rows -> tier rows (inverse of GorillaEncode)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts = []
        for i in range(len(batch)):
            n = batch["n_points"][i].as_py()
            row = {"source": np.full(n, batch["source"][i].as_py(), dtype=object)}
            for c in INT_COLS:
                row[c] = gorilla.decode_dod(batch[f"{c}_blob"][i].as_py(), n)
            for c in FLOAT_COLS:
                row[c] = gorilla.decode_xor(batch[f"{c}_blob"][i].as_py(), n)
            parts.append(pa.table({
                "source": pa.array(row["source"], type=pa.string()),
                # decode restores the tier's PHYSICAL schema: min/max are
                # int32 in finalize_tier, the rest int64 (type fidelity is
                # part of the decode-is-the-tier contract)
                **{c: pa.array(row[c],
                               type=pa.int32() if c in ("min", "max")
                               else pa.int64())
                   for c in INT_COLS},
                **{c: pa.array(row[c]) for c in FLOAT_COLS},
            }))
        return pa.concat_tables(parts) if parts else pa.table(
            {"source": pa.array([], type=pa.string()),
             **{c: pa.array([], type=pa.int32() if c in ("min", "max")
                            else pa.int64()) for c in INT_COLS},
             **{c: pa.array([], type=pa.float64()) for c in FLOAT_COLS}})


def encode_tier(tier_ds, max_points: int = 65_536):
    """Rolled tier Dataset -> compressed blob Dataset.

    ``groupby(source)`` co-locates each series; the encoder then compresses
    whole groups (one call per group keeps chunk numbering consistent — a
    group split across batches would restart chunk ids).
    """
    enc = GorillaEncode(max_points=max_points)

    def encode_group(g: pa.Table) -> pa.Table:
        return enc(g)

    return tier_ds.groupby("source").map_groups(encode_group, batch_format="pyarrow")


def decode_tier(blob_ds, concurrency: int = 4):
    return blob_ds.map_batches(
        GorillaDecode, batch_format="pyarrow", concurrency=(1, concurrency),
        batch_size=16,
    )
