"""Continuous-aggregate sketch: incrementally-maintained rollup state in a
keyed pool of Ray actors (SURVEY.md §2.8: thunder has no stateful stages;
the north rule adds 'stateful actor pools maintain continuous-aggregate
sketches per (source, time-bucket)').

Design: ``num_shards`` actors, each owning the (source, bucket) keys with
``hash(source) % num_shards == shard_id`` — state is never shared across
actors, so no locking; a snapshot is a K-way concat (cheap: rolled points
are tiny vs raw tokens).  Batches flow through the normal Dataset pipeline;
a pass-through ``map_batches`` stage computes the batch's exact-integer
partial moments (stages/rollup.BucketizePartials) and routes each partial
row to its shard actor.

Exactness under retries: Ray Data tasks are retried on failure, so ingest
is **idempotent** — every ingest carries a deterministic content key and a
shard drops keys it has already folded.  Because the folded quantities are
exact integer moments, fold order is irrelevant and the sketch equals the
batch rollup bit-for-bit at every snapshot (tested).

This is the 'incrementally-maintained batch aggregate' reading of
continuous aggregates (SURVEY.md §2.8): per-doc token order is positional,
so no watermark machinery exists or is needed.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..stages.rollup import BucketizePartials, finalize_tier


def _content_key(tbl: pa.Table) -> str:
    h = hashlib.md5()
    for col in ("source", "bucket", "count", "sum"):
        c = tbl[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if pa.types.is_dictionary(c.type) or pa.types.is_string(c.type):
            h.update("\x00".join(c.cast(pa.string()).to_pylist()).encode())
        else:
            h.update(np.ascontiguousarray(
                c.to_numpy(zero_copy_only=False)).tobytes())
    return h.hexdigest()


@ray.remote(num_cpus=0.5)
class SketchShard:
    """One shard of the continuous aggregate: dict[(source, bucket)] -> moments."""

    def __init__(self):
        self.moments: dict = {}
        self.seen: set = set()

    def ingest(self, key: str, blob: bytes) -> int:
        if key in self.seen:
            return 0
        self.seen.add(key)
        tbl = pa.ipc.open_stream(blob).read_all()
        src = tbl["source"].to_pylist()
        bucket = tbl["bucket"].to_numpy(zero_copy_only=False)
        cnt = tbl["count"].to_numpy(zero_copy_only=False)
        s = tbl["sum"].to_numpy(zero_copy_only=False)
        q = tbl["sumsq"].to_numpy(zero_copy_only=False)
        mn = tbl["min"].to_numpy(zero_copy_only=False)
        mx = tbl["max"].to_numpy(zero_copy_only=False)
        for i in range(len(tbl)):
            k = (src[i], int(bucket[i]))
            g = self.moments.get(k)
            if g is None:
                self.moments[k] = [int(cnt[i]), int(s[i]), int(q[i]), int(mn[i]), int(mx[i])]
            else:
                g[0] += int(cnt[i])
                g[1] += int(s[i])
                g[2] += int(q[i])
                g[3] = min(g[3], int(mn[i]))
                g[4] = max(g[4], int(mx[i]))
        return len(tbl)

    def snapshot(self) -> bytes:
        keys = sorted(self.moments)
        tbl = pa.table({
            "source": pa.array([k[0] for k in keys], type=pa.string()),
            "bucket": pa.array([k[1] for k in keys], type=pa.int64()),
            "count": pa.array([self.moments[k][0] for k in keys], type=pa.int64()),
            "sum": pa.array([self.moments[k][1] for k in keys], type=pa.int64()),
            "sumsq": pa.array([self.moments[k][2] for k in keys], type=pa.int64()),
            "min": pa.array(np.array([self.moments[k][3] for k in keys], dtype=np.int32)),
            "max": pa.array(np.array([self.moments[k][4] for k in keys], dtype=np.int32)),
        })
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, tbl.schema) as w:
            w.write_table(tbl)
        return sink.getvalue().to_pybytes()

    def n_keys(self) -> int:
        return len(self.moments)


def _shard_of(source: str, num_shards: int) -> int:
    return int(hashlib.md5(source.encode()).hexdigest(), 16) % num_shards


class ContinuousAggregate:
    """Driver-side handle over the shard pool."""

    def __init__(self, tier_seconds: int, num_shards: int = 4,
                 t0_column: str | None = None):
        self.tier_seconds = tier_seconds
        self.num_shards = num_shards
        self.t0_column = t0_column
        self.shards = [SketchShard.remote() for _ in range(num_shards)]

    def ingest_stage(self):
        """A pass-through map_batches callable: fold the batch into the
        sketch, emit the batch unchanged (the pipeline continues)."""
        shards = self.shards
        num = self.num_shards
        bucketize = BucketizePartials(self.tier_seconds, t0_column=self.t0_column)

        def ingest(batch: pa.Table) -> pa.Table:
            partials = bucketize(batch)
            key = _content_key(partials)
            src = np.asarray(partials["source"].to_pylist(), dtype=object)
            shard_ids = np.array([_shard_of(s, num) for s in src])
            refs = []
            for sid in np.unique(shard_ids):
                sub = partials.filter(pa.array(shard_ids == sid))
                sink = pa.BufferOutputStream()
                with pa.ipc.new_stream(sink, sub.schema) as w:
                    w.write_table(sub)
                refs.append(shards[sid].ingest.remote(f"{key}:{sid}",
                                                      sink.getvalue().to_pybytes()))
            ray.get(refs)  # barrier per batch: state folded before task success
            return batch

        return ingest

    def ingest_dataset(self, tokens_ds) -> int:
        """Stream a tokens Dataset through the sketch; returns rows seen."""
        out = tokens_ds.map_batches(self.ingest_stage(), batch_format="pyarrow",
                                    zero_copy_batch=True)
        return out.count()

    def snapshot(self) -> pd.DataFrame:
        """Current rolled points (finalized mean/m2), sorted."""
        blobs = ray.get([s.snapshot.remote() for s in self.shards])
        tbls = [pa.ipc.open_stream(b).read_all() for b in blobs]
        merged = pa.concat_tables([t for t in tbls if len(t)])
        if merged.num_rows == 0:
            return pd.DataFrame()
        out = finalize_tier(merged).to_pandas()
        return out.sort_values(["source", "bucket"]).reset_index(drop=True)
