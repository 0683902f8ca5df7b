"""Continuous-aggregate HyperLogLog: incrementally-maintained distinct
counts in a keyed pool of Ray actors — the cardinality sibling of
state/sketch.py's moment sketch (SURVEY.md §2.8 'stateful actor pools
maintain continuous-aggregate sketches').

Same design contract as SketchShard:
- ``num_shards`` actors, each owning the buckets with
  ``bucket % num_shards == shard_id`` — no shared state, no locking;
- ingest is **idempotent** under Ray task retries BY ALGEBRA: the folded
  quantity is a per-register MAX, and max-folding the same partial twice
  is a no-op — so unlike SketchShard (whose integer sums double-count and
  need a content-key ledger), no seen-set exists and shard memory stays
  bounded at buckets x 4096 bytes forever, the continuous-stream
  requirement;
- the folded quantity (per-register max rho) is merge-order independent,
  so the streaming snapshot equals the batch pipeline
  (pipelines.queries8.hll_distinct_users_1h) BIT-FOR-BIT at every point
  in the stream where the same rows have been folded (tested);
- a snapshot is a K-way concat of register tables + one estimator pass —
  sketch-scale (buckets x 4096 registers), never input-scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _ipc(tbl: pa.Table) -> bytes:
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    return sink.getvalue().to_pybytes()


def _unipc(blob: bytes) -> pa.Table:
    return pa.ipc.open_stream(blob).read_all()


@ray.remote(num_cpus=0.5)
class HllShard:
    """One shard: a dict bucket -> dense uint8 register array (4096 regs at
    p=12; max rho = 53 fits uint8), folded with np.maximum per ingest."""

    def __init__(self, p: int):
        self.m = 1 << p
        self.regs: dict[int, np.ndarray] = {}

    def ingest(self, blob: bytes) -> int:
        # no dedup ledger needed: max-folding a retried partial is a no-op
        # (idempotent by algebra), and a ledger would grow without bound on
        # a continuous stream
        tbl = _unipc(blob)
        b = tbl["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = tbl["reg"].to_numpy(zero_copy_only=False).astype(np.int64)
        rho = tbl["rho"].to_numpy(zero_copy_only=False).astype(np.uint8)
        for bk in np.unique(b):
            m = b == bk
            arr = self.regs.setdefault(int(bk), np.zeros(self.m, np.uint8))
            np.maximum.at(arr, r[m], rho[m])
        return len(tbl)

    def snapshot(self) -> bytes:
        bs, rs, rhos = [], [], []
        for bk in sorted(self.regs):
            arr = self.regs[bk]
            nz = np.flatnonzero(arr)
            bs.append(np.full(len(nz), bk, dtype=np.int64))
            rs.append(nz.astype(np.int64))
            rhos.append(arr[nz].astype(np.int64))
        cat = (lambda xs: np.concatenate(xs) if xs else
               np.array([], dtype=np.int64))
        return _ipc(pa.table({
            "bucket": pa.array(cat(bs), type=pa.int64()),
            "reg": pa.array(cat(rs), type=pa.int64()),
            "rho": pa.array(cat(rhos), type=pa.int64()),
        }))


class HllContinuousAggregate:
    """Driver-side handle: stream batches through ``ingest_stage()`` (a
    pass-through map_batches callable), read estimates with
    ``snapshot()``."""

    def __init__(self, num_shards: int = 4):
        from ..pipelines.queries8 import HLL_P

        self.p = HLL_P
        self.num_shards = num_shards
        self.shards = [HllShard.remote(self.p) for _ in range(num_shards)]

    def ingest_stage(self):
        from ..pipelines.queries8 import _hll_reg_rho, _hour_bucket

        shards, num = self.shards, self.num_shards

        def ingest(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return batch
            b = _hour_bucket(batch)
            reg, rho = _hll_reg_rho(
                batch["user_id"].to_numpy(zero_copy_only=False).astype(
                    np.int64))
            partial = pa.table({"bucket": pa.array(b, type=pa.int64()),
                                "reg": pa.array(reg, type=pa.int64()),
                                "rho": pa.array(rho, type=pa.int64())})
            refs = []
            sid_all = b % num
            for sid in np.unique(sid_all):
                sub = partial.filter(pa.array(sid_all == sid))
                refs.append(shards[sid].ingest.remote(_ipc(sub)))
            ray.get(refs)   # barrier: folded before the task reports success
            return batch

        return ingest

    def ingest_dataset(self, events_ds) -> int:
        out = events_ds.map_batches(self.ingest_stage(),
                                    batch_format="pyarrow",
                                    zero_copy_batch=True)
        return out.count()

    def snapshot(self) -> pd.DataFrame:
        """(bucket, approx_distinct) — THE shared estimator
        (pipelines.queries8.hll_estimate), so identical registers give
        identical floats to the batch pipeline by construction."""
        from ..pipelines.queries8 import hll_estimate

        tbls = [_unipc(b) for b in
                ray.get([s.snapshot.remote() for s in self.shards])]
        tbls = [t for t in tbls if len(t)]
        if not tbls:     # concat_tables([]) raises — nothing ingested yet
            return pd.DataFrame({"bucket": pd.Series([], dtype=np.int64),
                                 "approx_distinct": pd.Series([], dtype=float)})
        df = pa.concat_tables(tbls).to_pandas()
        out_b, out_e = [], []
        for bk, g in df.groupby("bucket"):
            out_b.append(np.int64(bk))
            out_e.append(hll_estimate(g["reg"].to_numpy(np.int64),
                                      g["rho"].to_numpy(np.int64)))
        return pd.DataFrame({"bucket": np.array(out_b, dtype=np.int64),
                             "approx_distinct": out_e}).sort_values(
            "bucket").reset_index(drop=True)


def sketch_distinct_users_1h(sf_dir: str):
    """Streaming twin of queries8.hll_distinct_users_1h: fold the events
    stream through the actor pool, then snapshot.  Rows-only by design;
    pytest pins snapshot == batch pipeline bit-for-bit."""
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])
    agg = HllContinuousAggregate()
    agg.ingest_dataset(ev)
    return agg.snapshot()
