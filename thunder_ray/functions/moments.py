"""Float moment merging for beyond-int64-sumsq scale (schema.py overflow bound).

The exact rollup path carries integer moments (count/sum/sumsq int64); with
token values < ``VOCAB_SIZE`` (50,257) a (source, bucket) group stays exact up
to ``2**63 / VOCAB_SIZE**2`` ~ 3.65e9 tokens.  A 1d-tier bucket of a hot
source at 10^12-sequence scale can exceed that, and int64 wraparound is
SILENT.  This module closes that hole two ways:

1. **Runtime guard** (:func:`assert_exact_moments_safe`) — called by
   ``rollup.finalize_tier`` on every finalized group.  Because all terms are
   non-negative, ``count * max**2`` bounds the true sumsq of the group *and*
   of every intermediate partial, so checking the final (count, max) proves
   no intermediate reduceat / Sum-aggregate wrapped.  A group over the bound
   raises :class:`MomentsOverflowError` instead of silently returning wrong
   moments — the caller reruns with the float path.

2. **Float merge path** — partials carry ``(count:int64, sum:float64,
   mean:float64, m2:float64, min, max)`` and merge with the combined-group
   moment identity (Chan et al. 1979, "Updating formulae and a pairwise
   algorithm for computing sample variances" — the segment-sum form, which
   vectorizes with ``np.add.reduceat`` where the pairwise recurrence does
   not)::

       n    = sum(n_i)
       wsum = sum(n_i * mean_i)            # == sum of all values
       mean = wsum / n
       m2   = sum(m2_i + n_i * mean_i^2) - wsum^2 / n

   Error bound: values are bounded by VOCAB_SIZE so the absolute float64
   error is ~ ``n * mean^2 * 2^-52``; relative to ``m2 ~ n * var`` it stays
   below 1e-7 even at n = 1e13.  Unlike the exact path this IS
   merge-order-dependent at the last float digit, which is why it is the
   explicit opt-in / overflow-escape path, not the default (the north rule's
   bit-identical gate is served by the exact path; SURVEY.md §1.2).

Thunder parity: same ``series_stats`` vocabulary (thunder/series/series.py:
~540); the merge mirrors what Spark's treeReduce would do to thunder's
per-partition numpy partials.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..schema import VOCAB_SIZE

# Conservative threshold: one bit of margin under int64 plus float-check
# slack.  count * max^2 >= 2**62 => the exact path refuses.
EXACT_SUMSQ_LIMIT = float(2**62)

FLOAT_PARTIAL_COLS = ["source", "bucket", "count", "sum", "mean", "m2", "min", "max"]


class MomentsOverflowError(RuntimeError):
    """Raised by the exact integer-moment path when a group's
    ``count * max**2`` bound reaches int64 range (sumsq may have wrapped).
    Rerun the rollup with ``moments="float"`` (see pipelines.tiers)."""


def overflow_risk(count, max_abs) -> np.ndarray:
    """Boolean mask of groups whose int64 sumsq is no longer provably exact.

    Computed in float64 (the int product itself would overflow); the 2x
    margin in EXACT_SUMSQ_LIMIT absorbs the float rounding of the check.
    """
    c = np.asarray(count, dtype=np.float64)
    m = np.abs(np.asarray(max_abs, dtype=np.float64))
    return c * m * m >= EXACT_SUMSQ_LIMIT


def assert_exact_moments_safe(count, max_abs):
    risk = overflow_risk(count, max_abs)
    if risk.any():
        i = int(np.flatnonzero(risk)[0])
        c = int(np.asarray(count)[i])
        m = int(np.asarray(max_abs)[i])
        raise MomentsOverflowError(
            f"group with count={c}, max={m} exceeds the exact int64 sumsq "
            f"bound (count*max^2 >= 2^62); rerun with moments='float' "
            f"(thunder_ray.functions.moments)"
        )


def safe_total_tokens() -> int:
    """Dataset-wide token count below which EVERY group is provably exact
    (values < VOCAB_SIZE); usable as a cheap driver-side pre-check."""
    return int(EXACT_SUMSQ_LIMIT / (VOCAB_SIZE**2))


def to_float_partials(batch: pa.Table) -> pa.Table:
    """Exact int-moment partials -> float-moment partials.

    In-batch partials are always exact (a 128 MB Arrow block holds ~3e7
    tokens, 100x under the bound), so the pipeline computes exact per batch
    and converts at batch exit; only the cross-batch MERGE runs in float.
    """
    cnt = batch["count"].to_numpy(zero_copy_only=False).astype(np.int64)
    s = batch["sum"].to_numpy(zero_copy_only=False).astype(np.float64)
    q = batch["sumsq"].to_numpy(zero_copy_only=False).astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = s / cnt
        m2 = q - s * s / cnt
    return pa.table(
        {
            "source": batch["source"],
            "bucket": batch["bucket"],
            "count": pa.array(cnt),
            "sum": pa.array(s),
            "mean": pa.array(mean),
            "m2": pa.array(np.maximum(m2, 0.0)),
            "min": batch["min"],
            "max": batch["max"],
        }
    )


def merge_float_moments(cnt, mean, m2, starts):
    """Segmented merge of float moment partials (sorted groups, reduceat form).

    Returns (n, wsum, mean, m2) per segment.
    """
    cnt = np.asarray(cnt, dtype=np.int64)
    mean = np.asarray(mean, dtype=np.float64)
    m2 = np.asarray(m2, dtype=np.float64)
    if len(starts) == 0:
        z = np.empty(0)
        return cnt[:0], z, z, z
    cf = cnt.astype(np.float64)
    n = np.add.reduceat(cnt, starts)
    wsum = np.add.reduceat(cf * mean, starts)
    raw = np.add.reduceat(m2 + cf * mean * mean, starts)
    nf = n.astype(np.float64)
    out_mean = wsum / nf
    out_m2 = np.maximum(raw - wsum * wsum / nf, 0.0)
    return n, wsum, out_mean, out_m2


class RerollupFloatPartials:
    """Float-schema analog of rollup.RerollupPartials: re-key bucket//factor
    and combine groups with the Chan segment-sum identity."""

    def __init__(self, factor: int):
        assert factor >= 1
        self.factor = int(factor)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.rollup import _factorize_source

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

        def col(name, dtype=None):
            v = batch[name].to_numpy(zero_copy_only=False)[order]
            return v.astype(dtype) if dtype is not None else v

        n, wsum, mean, m2 = merge_float_moments(
            col("count"), col("mean"), col("m2"), starts)
        mn = (np.minimum.reduceat(col("min"), starts)
              if len(starts) else batch["min"].to_numpy(zero_copy_only=False)[:0])
        mx = (np.maximum.reduceat(col("max"), starts)
              if len(starts) else batch["max"].to_numpy(zero_copy_only=False)[:0])
        src = pa.DictionaryArray.from_arrays(
            pa.array((k[starts] >> 40).astype(np.int32), type=pa.int32()), uniq_src)
        return pa.table(
            {
                "source": src,
                "bucket": pa.array((k[starts] & ((1 << 40) - 1)).astype(np.int64)),
                "count": pa.array(n),
                "sum": pa.array(wsum),
                "mean": pa.array(mean),
                "m2": pa.array(m2),
                "min": pa.array(mn.astype(np.int32), type=pa.int32()),
                "max": pa.array(mx.astype(np.int32), type=pa.int32()),
            }
        )


def merge_float_partials(ds, fanin: int | None = None):
    """Tree merge (same topology as rollup.merge_partials strategy='tree')
    over the float schema — block combine, level-2 fan-in, final combine.
    Carries the same cardinality guards as the int tree: the float path is
    the designated beyond-int64 escape hatch, i.e. exactly where group
    counts are most likely huge, so an over-cardinality corpus must refuse
    loudly (TreeMergeOverflowError) instead of OOMing the final task."""
    from ..stages.rollup import TREE_MAX_GROUPS, TreeMergeOverflowError
    from ..util import GuardedShard, fanin_partitions

    def guarded(check_input: bool = False):
        inner = RerollupFloatPartials(1)

        def fn(batch: pa.Table) -> pa.Table:
            if check_input and len(batch) > TREE_MAX_GROUPS:
                raise TreeMergeOverflowError(
                    f"float combiner-tree final task received {len(batch)} "
                    f"partial rows (> {TREE_MAX_GROUPS}); shard the input "
                    f"and merge per shard")
            return inner(batch)

        return GuardedShard(fn, TREE_MAX_GROUPS,
                            what="float combiner-tree shard",
                            exc=TreeMergeOverflowError)

    combined = ds.map_batches(RerollupFloatPartials(1), batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
    level2 = combined.repartition(fanin or fanin_partitions()).map_batches(
        guarded(), batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None)
    return level2.repartition(1).map_batches(
        guarded(check_input=True), batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None)


def finalize_float_tier(batch: pa.Table) -> pa.Table:
    """Float partials -> public rolled-point layout (sum/mean/m2 float64;
    no sumsq column — it is not representable on this path)."""
    src = batch["source"]
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    if pa.types.is_dictionary(src.type):
        src = src.cast(pa.string())
    return pa.table(
        {
            "source": src,
            "bucket": batch["bucket"],
            "count": batch["count"],
            "sum": batch["sum"],
            "min": batch["min"],
            "max": batch["max"],
            "mean": batch["mean"],
            "m2": batch["m2"],
        }
    )


def rollup_tokens_float(ds, tier_seconds: int, t0_column: str | None = None,
                        batch_size: int | None = None):
    """tokens Dataset -> rolled tier via the float merge path (unbounded
    group size; last-float-digit merge-order dependence — see module doc)."""
    from ..stages.rollup import BucketizePartials

    partials = ds.map_batches(
        BucketizePartials(tier_seconds, t0_column=t0_column),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size,
    ).map_batches(to_float_partials, batch_format="pyarrow", zero_copy_batch=True)
    return merge_float_partials(partials).map_batches(
        finalize_float_tier, batch_format="pyarrow", zero_copy_batch=True)
