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
is **idempotent** — every ingest carries a deterministic identity key and a
shard drops keys it has already folded.  The folded-key ledger is EXACT for
the actor's whole lifetime (a compact sorted-digest structure, 16 B/key;
ADVICE r4: a bounded FIFO window silently double-folded a late lineage
replay) and refuses loudly at a hard memory cap instead of evicting.
Because the folded quantities are exact integer moments, fold order is
irrelevant and the sketch equals the batch rollup bit-for-bit at every
snapshot (tested).

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


def _batch_identity_key(batch: pa.Table) -> str:
    """Retry-dedup key = the identity of the INPUT batch (its doc_id set),
    not the partials' content: two legitimately distinct batches can roll
    to identical (source, bucket, count, sum) partials (e.g. tokens [1,3]
    vs [2,2]) and a content key silently dropped the second one (review
    r4).  doc_ids are unique per record and batches are disjoint record
    sets, so the doc_id bytes identify the batch exactly, while a Ray task
    retry reproduces the same batch -> the same key (idempotent)."""
    c = batch["doc_id"]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    h = hashlib.md5()
    h.update(str(len(batch)).encode())
    h.update("\x00".join(c.cast(pa.string()).to_pylist()).encode())
    return h.hexdigest()


class ExactLedger:
    """Exact, compact, lifetime idempotency ledger (ADVICE r4).

    Integer-moment folds are NOT idempotent, so a duplicate ingest silently
    corrupts counts.  The r4 design bounded the folded-key ledger with FIFO
    eviction, which reintroduced the bug for a late replay — Ray lineage
    reconstruction is not bounded by "lands promptly".  This ledger never
    silently forgets a key: each key is a 16-byte md5 digest held in a
    small delta set that periodically merges into two lexsorted uint64
    halves (16 B/key, searchsorted membership — ~100x denser than a Python
    set of key strings; numpy's S16 dtype is unusable here: it strips
    trailing NUL bytes, which real digests contain).  ``max_keys`` makes
    the bound explicit and
    checkable: at the cap the ledger REFUSES loudly — snapshot the
    aggregate and restart the shard pool (a fresh pool resets Ray lineage,
    so pre-restart replays cannot land) — rather than evicting keys and
    risking a silent double-fold.  16M keys ~ 256 MB of digests, ~1.6e11
    ingested rows per shard at 10k-row batches."""

    MAX_KEYS = 16_000_000
    _DELTA_MAX = 65_536

    def __init__(self, max_keys: int | None = None):
        self.max_keys = int(max_keys or self.MAX_KEYS)
        # base: digest halves lexsorted by (hi, lo)
        self._hi = np.empty(0, dtype=np.uint64)
        self._lo = np.empty(0, dtype=np.uint64)
        self._delta: set = set()                # recent (hi, lo) pairs

    def __len__(self) -> int:
        return len(self._hi) + len(self._delta)

    def seen(self, key: str) -> bool:
        """Exact membership + insert.  True -> already folded, drop."""
        digest = hashlib.md5(key.encode()).digest()
        pair = (int.from_bytes(digest[:8], "big"),
                int.from_bytes(digest[8:], "big"))
        if pair in self._delta:
            return True
        hi, lo = np.uint64(pair[0]), np.uint64(pair[1])
        left = int(np.searchsorted(self._hi, hi, "left"))
        right = int(np.searchsorted(self._hi, hi, "right"))
        if right > left and bool(np.any(self._lo[left:right] == lo)):
            return True
        if len(self) >= self.max_keys:
            raise RuntimeError(
                f"idempotency ledger reached max_keys={self.max_keys} "
                "folded batches; snapshot the aggregate and restart the "
                "shard pool (a fresh pool resets Ray lineage, so "
                "pre-restart replays cannot land) — refusing rather than "
                "evicting keys and risking a silent double-fold")
        self._delta.add(pair)
        if len(self._delta) > self._DELTA_MAX:
            d = np.array(sorted(self._delta), dtype=np.uint64)
            all_hi = np.concatenate([self._hi, d[:, 0]])
            all_lo = np.concatenate([self._lo, d[:, 1]])
            order = np.lexsort((all_lo, all_hi))
            self._hi, self._lo = all_hi[order], all_lo[order]
            self._delta = set()
        return False


def _source_as_string(tbl: pa.Table) -> pa.Table:
    src = tbl["source"]
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    if pa.types.is_dictionary(src.type):
        tbl = tbl.set_column(tbl.column_names.index("source"), "source",
                             src.cast(pa.string()))
    return tbl


@ray.remote(num_cpus=0.5)
class SketchShard:
    """One shard of the continuous aggregate: an Arrow partials table with
    one row per (source, bucket), folded VECTORIZED on every ingest with
    the same combine kernel the batch rollup uses (rollup.RerollupPartials
    — factorize + sort + reduceat; no per-row Python, VERDICT r2 wrong #6)."""

    _COLS = ["source", "bucket", "count", "sum", "sumsq", "min", "max"]

    def __init__(self):
        self.state: pa.Table | None = None
        self.pending: list[pa.Table] = []
        self.pending_rows = 0
        self.ledger = ExactLedger()

    def ingest(self, key: str, blob: bytes) -> int:
        if self.ledger.seen(key):
            return 0
        tbl = _source_as_string(pa.ipc.open_stream(blob).read_all())
        # fold lazily: append the blob's partials and compact only when the
        # pending backlog reaches the state size — amortized O(rows log rows)
        # over the stream instead of re-combining the WHOLE state per blob
        # (exactness is unaffected: integer moments are merge-order
        # independent, the house invariant).
        self.pending.append(tbl.select(self._COLS))
        self.pending_rows += len(tbl)
        state_rows = 0 if self.state is None else len(self.state)
        if self.pending_rows >= max(state_rows, 4096):
            self._compact()
        return len(tbl)

    def _compact(self):
        from ..stages.rollup import RerollupPartials

        if not self.pending:
            return
        parts = ([] if self.state is None else [self.state]) + self.pending
        merged = parts[0] if len(parts) == 1 else pa.concat_tables(parts)
        self.state = _source_as_string(
            RerollupPartials(1)(merged)).select(self._COLS)
        self.pending = []
        self.pending_rows = 0

    def snapshot(self) -> bytes:
        import pyarrow.compute as pc

        self._compact()
        tbl = self.state
        if tbl is None:
            tbl = pa.table({
                "source": pa.array([], type=pa.string()),
                "bucket": pa.array([], type=pa.int64()),
                "count": pa.array([], type=pa.int64()),
                "sum": pa.array([], type=pa.int64()),
                "sumsq": pa.array([], type=pa.int64()),
                "min": pa.array([], type=pa.int32()),
                "max": pa.array([], type=pa.int32()),
            })
        else:
            tbl = tbl.take(pc.sort_indices(
                tbl, sort_keys=[("source", "ascending"), ("bucket", "ascending")]))
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, tbl.schema) as w:
            w.write_table(tbl)
        return sink.getvalue().to_pybytes()

    def n_keys(self) -> int:
        self._compact()
        return 0 if self.state is None else len(self.state)


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
            key = _batch_identity_key(batch)
            src = np.asarray(partials["source"].to_pylist(), dtype=object)
            # hash UNIQUE sources only (sources repeat across many partial
            # rows; one md5 per row was the per-batch hot path, review r4)
            u, inv = np.unique(src, return_inverse=True)
            shard_ids = np.array([_shard_of(s, num) for s in u])[inv]
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
        tbls = [t for t in tbls if len(t)]
        if not tbls:     # concat_tables([]) raises — nothing ingested yet
            return pd.DataFrame()
        merged = pa.concat_tables(tbls)
        out = finalize_tier(merged).to_pandas()
        return out.sort_values(["source", "bucket"]).reset_index(drop=True)
