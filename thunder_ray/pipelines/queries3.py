"""Driver-contract queries, pack 3: element-wise zip ops (thunder
``Data.plus/minus/element_wise``, base.py:~380), Gorilla round-trip, and
compressed-tier size accounting.

The element-wise op is the engine's JOIN exercise: thunder zips two
distributed arrays record-by-record; here the two sides co-locate by key
through ``Dataset.join`` (Ray 2.49 hash join) and the value arrays combine
position-wise inside one vectorized kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.tokens import tokens_from_documents
from ..util import derive_parallelism
from ..stages import listkernels as lk


def _i64(arr) -> pa.Array:
    return pa.array(np.asarray(arr, dtype=np.int64), type=pa.int64())


# ---------------------------------------------------------------------------
# Element-wise plus: tokens(doc) + tokens(doc+1), truncated to common length
# (thunder Data.plus zips two Series record-wise; our pairing key is the
# consecutive doc id, the op is int addition per position)

def _tokens_as_binary(tokens) -> pa.BinaryArray:
    """list<int32> -> binary, reusing the values buffer (Acero hash joins
    cannot carry list columns as payload; int32 payloads ride through as
    opaque bytes and decode back zero-copy after the join)."""
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    off = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    if int(off[-1] - off[0]) * 4 >= 1 << 31:
        # int32 binary offsets would wrap silently and the join would carry
        # garbage payloads (review r4) — refuse loudly; the remedy is a
        # smaller batch_size on the zip join's map stages
        raise ValueError("tokens batch exceeds 2^31 payload bytes — lower "
                         "the batch size")
    rel = ((off - off[0]) * 4).astype(np.int32)
    data = tokens.values.slice(int(off[0]), int(off[-1] - off[0]))
    return pa.BinaryArray.from_buffers(
        pa.binary(), len(off) - 1,
        [None, pa.py_buffer(rel.tobytes()),
         pa.py_buffer(data.to_numpy(zero_copy_only=False).tobytes())])


def _binary_to_flat(col) -> tuple[np.ndarray, np.ndarray]:
    """binary column -> (int32 flat values, int64 relative offsets)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    boffs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
        col.offset: col.offset + len(col) + 1].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)[boffs[0]: boffs[-1]]
    return data.view(np.int32), (boffs - boffs[0]) // 4


def elementwise_plus_tokens(sf_dir: str):
    # one materialized (key, packed-tokens) projection: the join consumes it
    # as BOTH sides and Ray re-executes lazy lineage per consumer, so an
    # unmaterialized stream would read + tokenize the corpus twice; the
    # left/right derivations below are zero-copy renames over its blocks
    base = tokens_from_documents(sf_dir).map_batches(
        lambda b: pa.table({"k": b["doc_id_int"],
                            "tok": _tokens_as_binary(b["tokens"])}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    left = base.map_batches(
        lambda b: b.rename_columns(["k", "tok_l"]),
        batch_format="pyarrow", zero_copy_batch=True)
    right = base.map_batches(
        lambda b: pa.table({
            "k": pa.array(b["k"].to_numpy(zero_copy_only=False) - 1,
                          type=pa.int64()),
            "tok_r": b["tok"]}),
        batch_format="pyarrow", zero_copy_batch=True)

    joined = left.join(right, "inner", derive_parallelism(), on=("k",))

    def plus(batch: pa.Table) -> pa.Table:
        bl, rl = _binary_to_flat(batch["tok_l"])
        br, rr = _binary_to_flat(batch["tok_r"])
        n = np.minimum(np.diff(rl), np.diff(rr))
        doc = batch["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = lk.positions(np.concatenate(([0], np.cumsum(n))))
        row = np.repeat(np.arange(len(n), dtype=np.int64), n)
        s = bl[rl[:-1][row] + pos].astype(np.int64) + br[rr[:-1][row] + pos].astype(np.int64)
        return pa.table({
            "doc_id": _i64(doc[row]),
            "pos": _i64(pos),
            "v_sum": _i64(s),
        })

    return joined.map_batches(plus, batch_format="pyarrow", zero_copy_batch=True)


ELEMENTWISE_PLUS_SQL = """
WITH tok AS (
  SELECT doc_id, list_transform(string_split(text, ' '), w -> length(w)) AS tokens
  FROM documents
),
flat AS (
  SELECT doc_id, pos, CAST(v AS BIGINT) AS v
  FROM (SELECT doc_id, unnest(tokens) AS v, unnest(range(len(tokens))) AS pos FROM tok)
)
SELECT a.doc_id AS doc_id, CAST(a.pos AS BIGINT) AS pos,
       CAST(a.v + b.v AS BIGINT) AS v_sum
FROM flat a JOIN flat b ON b.doc_id = a.doc_id + 1 AND b.pos = a.pos
"""


# ---------------------------------------------------------------------------
# Gorilla round-trip: decode(encode(1m tier)) must BE the 1m tier —
# the oracle is therefore the plain rollup SQL (bit-exact identity).

def gorilla_roundtrip_1m(sf_dir: str):
    from ..stages.codec import decode_tier, encode_tier
    from .queries import rollup_documents_full

    # the SAME materialized 1m tier every other tier consumer shares —
    # encode/decode is the work under test, not re-rolling raw tokens
    full = rollup_documents_full(sf_dir, 60)
    blobs = encode_tier(full)
    decoded = decode_tier(blobs)
    return decoded.drop_columns(["sumsq"])


def compression_ratio_1m(sf_dir: str):
    """Per-source Gorilla blob bytes vs raw row bytes on the 1m tier —
    the storage-efficiency accounting pipeline (rows-only check: sizes are
    implementation detail, pinned by tests/test_gorilla.py instead)."""
    from ..stages.codec import INT_COLS, encode_tier
    from .queries import rollup_documents_full

    blobs = encode_tier(rollup_documents_full(sf_dir, 60))

    def sizes(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        total = None
        for c in INT_COLS + ["mean", "m2"]:
            ln = pc.binary_length(batch[f"{c}_blob"]).cast(pa.int64())
            total = ln if total is None else pc.add(total, ln)
        n = batch["n_points"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "source": batch["source"].combine_chunks()
            if isinstance(batch["source"], pa.ChunkedArray) else batch["source"],
            "n_points": _i64(n),
            "blob_bytes": total,
            # per tier row: bucket/count/sum/sumsq int64 (32B) + min/max
            # int32 (8B) + mean/m2 float64 (16B) = 56B
            "raw_bytes": _i64(n * 56),
        })

    return blobs.map_batches(sizes, batch_format="pyarrow", zero_copy_batch=True)


def build_queries3() -> dict:
    return {
        "elementwise_plus_tokens": elementwise_plus_tokens,
        "gorilla_roundtrip_1m": gorilla_roundtrip_1m,
        "compression_ratio_1m": compression_ratio_1m,
    }


def build_oracle_sql3() -> dict:
    from .queries import _rollup_sql

    return {
        "elementwise_plus_tokens": ELEMENTWISE_PLUS_SQL,
        "gorilla_roundtrip_1m": _rollup_sql(60),
        # compression_ratio_1m: rows-only (see docstring)
    }
