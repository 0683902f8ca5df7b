"""Tier rollup: the engine's shuffle heart (SURVEY.md §4.2).

Physical plan per tier::

    read_parquet(tokens)                                    # or prev tier
      -> map_batches(bucketize_partials, pyarrow, zero_copy)  # stateless combine
      -> groupby(source, bucket[, salt]).aggregate(merge)     # shuffle (small!)
      [-> groupby(source, bucket).aggregate(merge)]           # unsalt (tiny)
      -> map_batches(finalize)                                # mean/m2

The per-batch combiner collapses every (source, bucket) group *inside* the
batch to one partial row of exact integer moments (count/sum/sumsq/min/max)
before any shuffle — so the all-to-all exchange moves O(sources x buckets)
rows per batch, not O(tokens).  Integer moments are merge-order independent,
which is how rolled points are bit-identical under any parallelism /
cluster size (the north rule's correctness gate).

Skew handling: ``source`` is Zipf-skewed by design.  The batch-level
combine already bounds any one (source, bucket) group at the merge to
<= #batches rows; for belt-and-braces at 100 TB (millions of batches), the
``salt`` option splits hot groups into S sub-groups merged in a second,
tiny groupby — classic two-phase salted aggregation.

Thunder parity: this is ``aggregate_by_index`` (thunder/series/series.py:
~880) with index level = time bucket, fused with the cross-record reduction
of thunder/base.py:~270, re-expressed as Ray Data groupby-aggregate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..schema import derive_mean_m2, t0_for_doc_ids
from ..util import GuardedShard, TreeShardOverflowError, fanin_partitions
from . import listkernels as lk

# Partial/tier column order (TIER_SCHEMA + derived).
PARTIAL_COLS = ["source", "bucket", "count", "sum", "sumsq", "min", "max"]

# ~128k tokens per sumsq chunk: the squared int64 temp stays ~1 MiB
# (cache-resident) instead of a full-batch copy.
_SUMSQ_CHUNK_TOKENS = 1 << 17


def _seg_sumsq_chunked(base: np.ndarray, run_starts: np.ndarray,
                       end: int) -> np.ndarray:
    """Sum of v^2 per run WITHOUT materializing a full-batch int64 squared
    copy: runs are processed in ~_SUMSQ_CHUNK_TOKENS slices so the squared
    temp is reused and stays cache-resident.  The full-size ``np.square``
    temp was ~16 B/token of pure DRAM write+read traffic — the largest
    single contributor to the combine stage's memory footprint, and the
    first thing to stall all 32 workers when the shared bus is contended.
    Bit-identical to the one-shot version (integer adds reassociated only
    across chunk boundaries, which is exact)."""
    n = len(run_starts)
    out = np.empty(n, dtype=np.int64)
    bounds = np.append(run_starts, end)
    i = 0
    while i < n:
        # at least one run per chunk; a single over-budget run just gets a
        # proportionally larger temp
        j = int(np.searchsorted(bounds, bounds[i] + _SUMSQ_CHUNK_TOKENS,
                                side="left"))
        j = min(max(j, i + 1), n)
        lo = bounds[i]
        seg = base[lo:bounds[j]]
        out[i:j] = np.add.reduceat(np.square(seg, dtype=np.int64),
                                   bounds[i:j] - lo)
        i = j
    return out


def _factorize_source(col) -> tuple[pa.Array, np.ndarray]:
    """(dictionary: pa.Array of unique sources, codes: int64 ndarray) via
    Arrow's C++ dictionary_encode — O(n) hashing, no Python-object sort.
    Already-dictionary columns short-circuit (the partials tables carry
    `source` dictionary-encoded end-to-end so the merge never touches
    Python strings)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        # a null index becomes NaN through to_numpy, NaN.astype(int64) is
        # INT64_MIN, and INT64_MIN << 40 wraps to code 0 — silently merging
        # null-source rows into a REAL source's group (review r4)
        raise ValueError("rollup: null source values are not groupable — "
                         "clean or fill the source column upstream")
    if pa.types.is_dictionary(col.type):
        d = col
    else:
        d = col.dictionary_encode()
    if len(d.dictionary) >= 1 << 23:
        # the (code << 40 | bucket) pack wraps at 2^23 per-batch distinct
        # sources (negative keys) and collides at 2^24 (review r4) —
        # refuse loudly; the remedy is merge strategy="groupby" with
        # smaller combine batches
        raise ValueError("rollup: more than 2^23 distinct sources in one "
                         "combine batch — use merge strategy='groupby'")
    return d.dictionary, d.indices.to_numpy(zero_copy_only=False).astype(np.int64)


def _partials_table(src_dict, src_codes, bucket, cnt, s, q, mn, mx) -> pa.Table:
    src = pa.DictionaryArray.from_arrays(
        pa.array(np.asarray(src_codes, dtype=np.int32), type=pa.int32()), src_dict)
    return pa.table(
        {
            "source": src,
            "bucket": pa.array(bucket, type=pa.int64()),
            "count": pa.array(cnt, type=pa.int64()),
            "sum": pa.array(s, type=pa.int64()),
            "sumsq": pa.array(q, type=pa.int64()),
            "min": pa.array(mn.astype(np.int32), type=pa.int32()),
            "max": pa.array(mx.astype(np.int32), type=pa.int32()),
        }
    )


class BucketizePartials:
    """map_batches callable: tokens batch -> per-(source,bucket) partial moments.

    Stateless and vectorized: one lexsort + reduceat pass over the flattened
    token values.  ``tier_seconds`` fixed at construction (callable-class so
    Ray can also run it in an actor pool if desired; plain-function cheap
    tasks by default).
    """

    def __init__(self, tier_seconds: int, t0_column: str | None = None, salt: int | None = None):
        self.tier = int(tier_seconds)
        self.t0_column = t0_column
        self.salt = salt

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Memory-bandwidth discipline: buckets are NON-DECREASING within a
        # row (t = t0 + position), so every (row, bucket) group is a
        # contiguous RUN whose boundaries follow arithmetically from
        # (t0 % tier, row length).  We therefore never materialize any
        # per-token array except the four streaming reduceat passes — no
        # per-token keys, no per-token sort (the naive lexsort kernel moved
        # ~150 B/token and was memory-bound under multi-worker contention;
        # this one moves ~25 B/token, all sequential).
        vals, offs = lk.list_parts(batch["tokens"])
        base, rel = lk._flat(vals, offs)
        lens = lk.lengths(offs).astype(np.int64)
        if self.t0_column is not None:
            if self.t0_column not in batch.column_names:
                # a typo'd / pruned-away t0 column must refuse loudly, not
                # silently fall back to doc-id-derived buckets
                raise KeyError(
                    f"t0_column {self.t0_column!r} not in batch columns "
                    f"{batch.column_names}")
            t0 = batch[self.t0_column].to_numpy(zero_copy_only=False).astype(np.int64) % 86_400
        else:
            t0 = t0_for_doc_ids(batch["doc_id"].to_numpy(zero_copy_only=False))

        tier = self.tier
        phase = t0 % tier                       # offset into the first bucket
        runs_per_row = (phase + lens + tier - 1) // tier
        runs_per_row[lens == 0] = 0
        n_runs = int(runs_per_row.sum())
        run_row = np.repeat(np.arange(len(lens), dtype=np.int64), runs_per_row)
        run_cum = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(runs_per_row, out=run_cum[1:])
        run_k = np.arange(n_runs, dtype=np.int64) - run_cum[:-1][run_row]
        first_len = tier - phase                # tokens in the row's first run
        start_rel = np.where(run_k == 0, 0, first_len[run_row] + (run_k - 1) * tier)
        run_starts = rel[:-1][run_row] + start_rel
        run_bucket = (t0 // tier)[run_row] + run_k

        # four sequential reduction passes over the token values; dtype=
        # int64 upcasts inside reduceat (no 8-byte temp for the sum pass)
        cnt = np.diff(np.append(run_starts, rel[-1]))
        e = np.empty(0, dtype=np.int64)
        s = np.add.reduceat(base, run_starts, dtype=np.int64) if n_runs else e
        q = _seg_sumsq_chunked(base, run_starts, int(rel[-1])) if n_runs else e
        mn = np.minimum.reduceat(base, run_starts) if n_runs else base[:0]
        mx = np.maximum.reduceat(base, run_starts) if n_runs else base[:0]

        # in-batch combine of the ~n_tokens/tier run partials by (source, bucket);
        # source factorization via Arrow dictionary_encode (C++ hash, no
        # Python-string sort — np.unique on object arrays was the bottleneck)
        uniq_src, src_code = _factorize_source(batch["source"])
        key = (src_code.astype(np.int64)[run_row] << 40) | run_bucket
        order = np.argsort(key, kind="stable")
        k = key[order]
        boundary = np.empty(n_runs, dtype=bool)
        if n_runs:
            boundary[0] = True
            boundary[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(boundary)
        tbl = _partials_table(
            uniq_src,
            (k[starts] >> 40),
            (k[starts] & ((1 << 40) - 1)).astype(np.int64),
            np.add.reduceat(cnt[order], starts) if n_runs else cnt[:0],
            np.add.reduceat(s[order], starts) if n_runs else s[:0],
            np.add.reduceat(q[order], starts) if n_runs else q[:0],
            np.minimum.reduceat(mn[order], starts) if n_runs else mn[:0],
            np.maximum.reduceat(mx[order], starts) if n_runs else mx[:0],
        )
        if self.salt:
            # deterministic salt: spread *batches* of the same group across
            # S sub-groups; any stable per-batch value works — derive from
            # the batch's first doc t0 + row count (content-stable).
            # Empty batches (empty row group / empty upstream block) have no
            # t0[0]; any constant is fine since the table is empty.
            sval = (0 if len(t0) == 0 else
                    int((int(t0[0]) * 1_000_003 + len(batch)) % self.salt))
            tbl = tbl.append_column("salt", pa.array(np.full(len(tbl), sval, dtype=np.int32)))
        return tbl


class RerollupPartials:
    """Tier -> coarser tier partials: re-key bucket//factor + in-batch combine."""

    def __init__(self, factor: int):
        if int(factor) < 1:
            # assert vanishes under -O and bucket // 0 in numpy WARNS and
            # returns 0, collapsing the tier into one bucket (review r4)
            raise ValueError(f"rerollup factor must be >= 1, got {factor}")
        self.factor = int(factor)

    def __call__(self, batch: pa.Table) -> pa.Table:
        bucket = batch["bucket"].to_numpy(zero_copy_only=False) // self.factor
        uniq_src, src_code = _factorize_source(batch["source"])
        key = (src_code.astype(np.int64) << 40) | bucket
        order = np.argsort(key, kind="stable")
        k = key[order]
        boundary = np.empty(len(k), dtype=bool)
        if len(k):
            boundary[0] = True
            boundary[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(boundary)

        def red(col, ufunc, dtype=None):
            v = batch[col].to_numpy(zero_copy_only=False)[order]
            if dtype is not None:
                v = v.astype(dtype)
            return ufunc.reduceat(v, starts) if len(starts) else v[:0]

        return _partials_table(
            uniq_src,
            (k[starts] >> 40),
            (k[starts] & ((1 << 40) - 1)).astype(np.int64),
            red("count", np.add, np.int64),
            red("sum", np.add, np.int64),
            red("sumsq", np.add, np.int64),
            red("min", np.minimum),
            red("max", np.maximum),
        )


# A combiner-tree final task must hold every finalized group; beyond this
# row count the tree is the wrong topology (VERDICT r1 #9: pick by estimated
# group count instead of silently bottlenecking).  Patchable for tests.
TREE_MAX_GROUPS = 50_000_000


class TreeMergeOverflowError(TreeShardOverflowError):
    """Raised when a combiner-tree fan-in stage exceeds TREE_MAX_GROUPS
    output rows — rerun with merge strategy='groupby' (keyed shuffle).
    Subclasses util.TreeShardOverflowError so a caller catching the generic
    guard exception also catches rollup-tree overflows."""


def _guarded_rerollup(factor: int, max_rows: int,
                      check_input: bool = False):
    """util.GuardedShard specialization for the rollup combiner tree.

    ``check_input=True`` (the FINAL combine task) additionally refuses when
    the assembled input batch itself exceeds ``max_rows`` — level-2 shards
    can each legitimately hold up to the full group count (overlapping
    groups), so a disjoint-group corpus with fanin x max_rows total rows
    must be caught BEFORE the final task's argsort triples its memory."""
    inner = RerollupPartials(factor)

    def fn(batch: pa.Table) -> pa.Table:
        if check_input and len(batch) > max_rows:
            raise TreeMergeOverflowError(
                f"combiner-tree final task received {len(batch)} partial "
                f"rows (> {max_rows}); rerun merge_partials with "
                f"strategy='groupby'")
        return inner(batch)

    return GuardedShard(fn, max_rows, what="combiner-tree shard",
                        exc=TreeMergeOverflowError)


def merge_partials(ds, salted: bool = False, strategy: str = "auto",
                   combine_batch: int | None = None,
                   expected_groups: int | None = None):
    """Merge per-batch partial moments into one row per (source, bucket).

    Integer moments are merge-order independent, so ANY merge topology gives
    bit-identical results — we pick by output cardinality, not semantics:

    - ``strategy="auto"`` (default): ``tree`` when ``expected_groups`` is
      unknown or <= TREE_MAX_GROUPS, else ``groupby``.  The tree's fan-in
      stages carry a runtime cardinality guard (TreeMergeOverflowError)
      so an under-estimate refuses loudly instead of silently becoming the
      single-task bottleneck.

    - ``strategy="tree"`` (default): vectorized combiner tree — block-local
      combine (``RerollupPartials`` per block: combine_batch=None is
      CRITICAL — a row-count batch size makes Ray coalesce upstream blocks
      into huge batches, collapsing the fused scan stage to ~2 tasks and
      destroying scan parallelism; measured), each block-combine capping
      its output at the number of distinct groups it saw, then
      ``repartition(1)`` + one final combine task.  No keyed shuffle at all:
      measured ~6x faster than Ray's sort-based aggregate, and immune to
      source-key skew (hot groups are squashed inside every batch before any
      exchange).  Appropriate while the finalized tier (#sources x #buckets)
      fits one task's heap — true for rollup outputs up to tens of millions
      of groups.

    - ``strategy="groupby"``: Ray Data's native keyed shuffle
      (``groupby(source,bucket[,salt]).aggregate``) — the unbounded-
      cardinality path; with ``salted=True`` hot groups are first merged per
      salt then unsalted in a second tiny groupby (SURVEY.md §4.1 skew row).
    """
    if strategy == "auto":
        strategy = ("groupby" if (expected_groups is not None
                                  and expected_groups > TREE_MAX_GROUPS)
                    else "tree")
    if strategy == "tree":
        combined = ds.map_batches(
            RerollupPartials(1), batch_format="pyarrow",
            zero_copy_batch=True, batch_size=combine_batch,
        )
        # level 2: fan-in to `fanin` parallel combines (each bounded by the
        # group cardinality, guarded), then one final combine that ALSO
        # refuses on oversized input — disjoint-group shards can each pass
        # the per-shard bound while their union exceeds one task's heap
        level2 = combined.repartition(fanin_partitions()).map_batches(
            _guarded_rerollup(1, TREE_MAX_GROUPS), batch_format="pyarrow",
            zero_copy_batch=True, batch_size=None,
        )
        return level2.repartition(1).map_batches(
            _guarded_rerollup(1, TREE_MAX_GROUPS, check_input=True),
            batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
        )

    from ray.data.aggregate import Max, Min, Sum

    def _undict(batch: pa.Table) -> pa.Table:
        src = batch["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        if pa.types.is_dictionary(src.type):
            batch = batch.set_column(batch.column_names.index("source"),
                                     "source", src.cast(pa.string()))
        return batch

    ds = ds.map_batches(_undict, batch_format="pyarrow", zero_copy_batch=True)

    def aggs():
        return [
            Sum("count", alias_name="count"),
            Sum("sum", alias_name="sum"),
            Sum("sumsq", alias_name="sumsq"),
            Min("min", alias_name="min"),
            Max("max", alias_name="max"),
        ]

    keys = ["source", "bucket", "salt"] if salted else ["source", "bucket"]
    out = ds.groupby(keys).aggregate(*aggs())
    if salted:
        out = out.drop_columns(["salt"]).groupby(["source", "bucket"]).aggregate(*aggs())
    return out


def finalize_tier(batch: pa.Table) -> pa.Table:
    """Attach the fixed-expression derived columns mean/m2 (schema.derive_mean_m2)
    and normalize physical types to TIER_SCHEMA.

    Guards the exact int64-sumsq path: sumsq terms are squares, so the final
    (count, max(|min|,|max|)) of a group bounds its sumsq AND every
    intermediate partial;
    a group past the bound raises MomentsOverflowError instead of silently
    emitting wrapped moments (functions/moments.py — rerun with the float
    Chan-merge path there)."""
    from ..functions.moments import assert_exact_moments_safe

    cnt = batch["count"].to_numpy(zero_copy_only=False).astype(np.int64)
    s = batch["sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    q = batch["sumsq"].to_numpy(zero_copy_only=False).astype(np.int64)
    # Bound sumsq by the LARGER magnitude of min/max: from_array admits
    # arbitrary int32, so |min| can dominate while max stays small.
    mn_abs = np.abs(batch["min"].to_numpy(zero_copy_only=False).astype(np.int64))
    mx_abs = np.abs(batch["max"].to_numpy(zero_copy_only=False).astype(np.int64))
    assert_exact_moments_safe(cnt, np.maximum(mn_abs, mx_abs))
    mean, m2 = derive_mean_m2(cnt, s, q)
    src = batch["source"]
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    if pa.types.is_dictionary(src.type):
        src = src.cast(pa.string())
    return pa.table(
        {
            "source": src,
            "bucket": pa.array(batch["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)),
            "count": pa.array(cnt),
            "sum": pa.array(s),
            "sumsq": pa.array(q),
            "min": pa.array(batch["min"].to_numpy(zero_copy_only=False).astype(np.int32)),
            "max": pa.array(batch["max"].to_numpy(zero_copy_only=False).astype(np.int32)),
            "mean": pa.array(mean),
            "m2": pa.array(m2),
        }
    )


def rollup_tokens(ds, tier_seconds: int, t0_column: str | None = None,
                  salt: int | None = None, batch_size: int | None = None,
                  expected_groups: int | None = None):
    """tokens Dataset -> rolled tier Dataset (with sumsq; FIXTURES schema + sumsq).

    ``expected_groups`` (~ #sources x #buckets) steers the merge topology:
    tree below TREE_MAX_GROUPS, keyed groupby above (merge_partials auto)."""
    partials = ds.map_batches(
        BucketizePartials(tier_seconds, t0_column=t0_column, salt=salt),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
    merged = merge_partials(partials, salted=bool(salt),
                            strategy="groupby" if salt else "auto",
                            expected_groups=expected_groups)
    return merged.map_batches(finalize_tier, batch_format="pyarrow", zero_copy_batch=True)


def finalize_all_tiers(batch: pa.Table) -> pa.Table:
    """Merged base-tier (1m) partials -> ALL retention tiers in one task,
    tier-tagged (`tier` column).  Re-rollups touch only rolled points (~1e4x
    smaller than raw), so computing 1m+1h+1d in a single pass removes four
    sequential Ray executions of fixed latency from the tier chain — the
    serial floor measured in BENCH (the merged tier fits one task by the
    same cardinality argument as merge_partials strategy='tree')."""
    out = []
    prev = batch
    for tier, factor in (("1m", 1), ("1h", 60), ("1d", 24)):
        prev = RerollupPartials(factor)(prev)
        out.append(finalize_tier(prev).append_column(
            "tier", pa.array([tier] * len(prev), type=pa.string())))
    return pa.concat_tables(out)


def rerollup(ds_tier, factor: int, batch_size: int | None = 8192,
             merge_strategy: str = "auto", expected_groups: int | None = None):
    """Rolled tier Dataset -> coarser tier (e.g. 1m -> 1h: factor=60).
    ``merge_strategy``/``expected_groups`` forward to merge_partials so an
    explicit groupby topology survives the re-rollup tiers too (review r4:
    run_rollup(strategy='groupby') silently fell back to the tree here)."""
    cols = [c for c in PARTIAL_COLS]
    partials = ds_tier.select_columns(cols).map_batches(
        RerollupPartials(factor), batch_format="pyarrow",
        zero_copy_batch=True, batch_size=batch_size,
    )
    merged = merge_partials(partials, strategy=merge_strategy,
                            expected_groups=expected_groups)
    return merged.map_batches(finalize_tier, batch_format="pyarrow", zero_copy_batch=True)
