"""Segmented (per-record) kernels over Arrow ``list<T>`` columns.

Every thunder ``Series`` per-record operator (thunder/series/series.py,
§2.3–2.5 of SURVEY.md) is re-expressed here as a vectorized numpy kernel
over the *flattened* representation of an Arrow list column:
``(values, offsets)`` — never a Python loop over rows in the hot path.
``map_batches(batch_format="pyarrow", zero_copy_batch=True)`` hands us the
Arrow buffers zero-copy; we compute on ``ListArray.values`` +
``ListArray.offsets`` directly (SURVEY.md §2.3).

Variable-length records are first-class (the tokens table draws lengths in
[32, 512)); a handful of dense signal ops (fourier/detrend/normalize/...)
have an equal-length 2-D fast path and a per-row numpy fallback — those are
interactive-analysis ops, not the 100 TB rollup hot path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


# ---------------------------------------------------------------------------
# Arrow <-> flat helpers

def list_parts(col) -> tuple[np.ndarray, np.ndarray]:
    """Return ``(values, offsets)`` numpy views of a list column.

    ``offsets`` has length ``n_rows + 1`` and indexes into ``values``
    (correct for sliced arrays too — Arrow offsets are absolute).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = col.values.to_numpy(zero_copy_only=False)
    return values, offsets


def lengths(offsets: np.ndarray) -> np.ndarray:
    return np.diff(offsets)


def rebuild_list(values: np.ndarray, offsets: np.ndarray, type_=None) -> pa.ListArray:
    """Assemble a list array from flat values + absolute offsets.  The
    values buffer may be the FULL (untrimmed) buffer of a sliced column —
    rebasing the offsets alone would silently read the wrong rows, so trim
    the buffer to the addressed window first (review r4)."""
    lo, hi = int(offsets[0]), int(offsets[-1])
    if lo != 0 or hi != len(values):
        values = values[lo:hi]
    off = offsets - lo
    arr = pa.array(values, type=type_)
    return pa.ListArray.from_arrays(pa.array(off.astype(np.int32)), arr)


def row_ids(offsets: np.ndarray) -> np.ndarray:
    """Row id for every flattened value position."""
    lens = lengths(offsets)
    return np.repeat(np.arange(len(lens), dtype=np.int64), lens)


def positions(offsets: np.ndarray) -> np.ndarray:
    """Within-row position (0-based) for every flattened value position."""
    lens = lengths(offsets)
    total = int(offsets[-1] - offsets[0])
    return np.arange(total, dtype=np.int64) - np.repeat(
        (offsets[:-1] - offsets[0]).astype(np.int64), lens
    )


def _base_values(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Values restricted to the rows covered by ``offsets`` — handles BOTH
    slice directions (head-sliced: offsets[0] > 0; tail-sliced:
    offsets[0] == 0 but len(values) > offsets[-1]), so every seg_* caller
    sees a buffer of exactly sum(lens) values."""
    if offsets[0] == 0 and len(values) == int(offsets[-1]):
        return values
    return values[int(offsets[0]): int(offsets[-1])]


def _flat(values: np.ndarray, offsets: np.ndarray):
    """Normalize to (base_values, relative_offsets) so ``reduceat`` segments
    never overshoot a sliced buffer (its last segment runs to array end).
    ``_base_values`` already trims both slice directions, so base is exactly
    sum(lens) values."""
    return _base_values(values, offsets), (offsets - offsets[0]).astype(np.int64)


# ---------------------------------------------------------------------------
# Segmented reductions  (thunder series_sum/mean/std/max/min/median/percentile,
# thunder/series/series.py:~430-540)

def _reduceat(ufunc, values, starts, lens, empty_fill):
    """`ufunc.reduceat` that tolerates empty segments."""
    out_dtype = np.result_type(values.dtype)
    if len(starts) == 0:
        return np.empty(0, dtype=out_dtype)
    nonempty = lens > 0
    if nonempty.all():
        return ufunc.reduceat(values, starts)
    out = np.full(len(starts), empty_fill, dtype=out_dtype)
    if nonempty.any():
        out[nonempty] = ufunc.reduceat(values, starts[nonempty])
    return out


def seg_sum(values: np.ndarray, offsets: np.ndarray, dtype=np.int64) -> np.ndarray:
    base, rel = _flat(values, offsets)
    v = base.astype(dtype, copy=False)
    return _reduceat(np.add, v, rel[:-1], lengths(offsets), 0)


def seg_sumsq(values: np.ndarray, offsets: np.ndarray, dtype=np.int64) -> np.ndarray:
    base, rel = _flat(values, offsets)
    v = base.astype(dtype, copy=False)
    return _reduceat(np.add, v * v, rel[:-1], lengths(offsets), 0)


def seg_min(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    base, rel = _flat(values, offsets)
    return _reduceat(np.minimum, base, rel[:-1], lengths(offsets),
                     np.iinfo(base.dtype).max if np.issubdtype(base.dtype, np.integer) else np.inf)


def seg_max(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    base, rel = _flat(values, offsets)
    return _reduceat(np.maximum, base, rel[:-1], lengths(offsets),
                     np.iinfo(base.dtype).min if np.issubdtype(base.dtype, np.integer) else -np.inf)


def seg_mean(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    lens = lengths(offsets)
    s = seg_sum(values, offsets, dtype=np.float64 if values.dtype.kind == "f" else np.int64)
    with np.errstate(invalid="ignore", divide="ignore"):
        return s.astype(np.float64) / lens


def seg_std(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Population std (ddof=0), matching ``numpy.ndarray.std`` as thunder uses."""
    lens = lengths(offsets)
    if values.dtype.kind == "f":
        s = seg_sum(values, offsets, dtype=np.float64)
        q = seg_sumsq(values, offsets, dtype=np.float64)
    else:
        s = seg_sum(values, offsets).astype(np.float64)
        q = seg_sumsq(values, offsets).astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        var = q / lens - (s / lens) ** 2
    return np.sqrt(np.maximum(var, 0.0))


def seg_sorted(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Values sorted within each segment (stable, vectorized)."""
    base = _base_values(values, offsets)
    rid = row_ids(offsets)
    order = np.lexsort((base, rid))
    return base[order]


def seg_percentile(values: np.ndarray, offsets: np.ndarray, q: float) -> np.ndarray:
    """Per-segment percentile, numpy 'linear' interpolation semantics."""
    lens = lengths(offsets)
    sv = seg_sorted(values, offsets)
    rel = (offsets[:-1] - offsets[0]).astype(np.int64)
    pos = (lens - 1) * (q / 100.0)
    lo = np.floor(pos).astype(np.int64)
    hi = np.ceil(pos).astype(np.int64)
    frac = pos - lo
    lo_i = rel + np.clip(lo, 0, np.maximum(lens - 1, 0))
    hi_i = rel + np.clip(hi, 0, np.maximum(lens - 1, 0))
    # an empty TRAILING segment has rel == len(sv): clamp the gather (its
    # value is overwritten with NaN below) instead of indexing off the end
    if len(sv) == 0:
        return np.full(len(lens), np.nan)
    np.clip(lo_i, 0, len(sv) - 1, out=lo_i)
    np.clip(hi_i, 0, len(sv) - 1, out=hi_i)
    out = sv[lo_i].astype(np.float64) * (1 - frac) + sv[hi_i].astype(np.float64) * frac
    out[lens == 0] = np.nan
    return out


def seg_median(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    return seg_percentile(values, offsets, 50.0)


_STAT_FNS = {
    "count": lambda v, o: lengths(o).astype(np.int64),
    "sum": seg_sum,
    "mean": seg_mean,
    "median": seg_median,
    "std": seg_std,
    "stdev": seg_std,
    "max": seg_max,
    "min": seg_min,
}


def seg_stat(values, offsets, stat: str):
    """Name-dispatched per-record stat (thunder ``series_stat``, series.py:~520)."""
    return _STAT_FNS[stat](values, offsets)


# ---------------------------------------------------------------------------
# Per-record transforms (thunder series.py:~230-820)

def _broadcast(per_row: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    return np.repeat(per_row, lengths(offsets))


def seg_center(values, offsets):
    v = _base_values(values, offsets).astype(np.float64, copy=False)
    return v - _broadcast(seg_mean(values, offsets), offsets)


def seg_standardize(values, offsets):
    v = _base_values(values, offsets).astype(np.float64, copy=False)
    return v / _broadcast(seg_std(values, offsets), offsets)


def seg_zscore(values, offsets):
    v = _base_values(values, offsets).astype(np.float64, copy=False)
    m = _broadcast(seg_mean(values, offsets), offsets)
    s = _broadcast(seg_std(values, offsets), offsets)
    return (v - m) / s


def seg_squelch(values, offsets, threshold):
    """Zero every record whose max < threshold (thunder ``squelch``, series.py:~340)."""
    base = _base_values(values, offsets)
    keep = seg_max(values, offsets) >= threshold
    return base * _broadcast(keep.astype(base.dtype), offsets)


def seg_subsample(values, offsets, k: int):
    """Every k-th point per record: ``values[::k]`` (series.py:~600)."""
    pos = positions(offsets)
    mask = pos % k == 0
    lens = lengths(offsets)
    new_lens = (lens + k - 1) // k
    new_off = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(new_lens, out=new_off[1:])
    return _base_values(values, offsets)[mask], new_off


def seg_downsample(values, offsets, k: int):
    """Mean of non-overlapping length-k bins; remainder discarded (series.py:~620).

    Returns ``(bin_means: float64, new_offsets)``.
    """
    pos = positions(offsets)
    lens = lengths(offsets)
    nbins = lens // k
    keep = pos < _broadcast(nbins * k, offsets)
    kept = _base_values(values, offsets)[keep]
    new_off = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(nbins, out=new_off[1:])
    # global bin id = row's first output bin + local bin within the row
    global_bin = np.repeat(new_off[:-1], nbins * k) + pos[keep] // k
    sums = np.bincount(global_bin, weights=kept.astype(np.float64), minlength=int(new_off[-1]))
    return sums / k, new_off


def seg_select(values, offsets, idx, index: np.ndarray | None = None):
    """Project value positions whose index ∈ ``idx`` (thunder ``select``, series.py:~250).

    ``index`` defaults to the positional index (arange per record).
    """
    idx = np.atleast_1d(idx)
    pos = positions(offsets)
    key = pos if index is None else np.asarray(index)[pos]
    mask = np.isin(key, idx)
    lens = lengths(offsets)
    base = _base_values(values, offsets)
    rid = row_ids(offsets)
    new_lens = np.bincount(rid[mask], minlength=len(lens))
    new_off = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(new_lens, out=new_off[1:])
    return base[mask], new_off


def seg_select_by_level(values, offsets, index2d: np.ndarray, level: int,
                        vals, invert: bool = False):
    """thunder ``select_by_index(val, level=..., filter=...)`` on a TRUE
    multi-level index (thunder/series/series.py:~820; index is a 2-D
    (levels x length) ndarray shared by all records, series.py:~40):
    keep value positions whose index at ``level`` matches ``vals`` (list =
    OR); ``invert=True`` is thunder's ``filter=True``.  Returns
    ``(values, offsets)`` of the projected records."""
    key = np.asarray(index2d)[level]
    pos = positions(offsets)
    mask = np.isin(key[pos], np.atleast_1d(vals))
    if invert:
        mask = ~mask
    lens = lengths(offsets)
    base, _ = _flat(values, offsets)   # slice-safe (trims tail-sliced buffers)
    rid = row_ids(offsets)
    new_lens = np.bincount(rid[mask], minlength=len(lens))
    new_off = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(new_lens, out=new_off[1:])
    return base[mask], new_off


def seg_aggregate_by_level(values, offsets, index2d: np.ndarray, level: int,
                           stat: str):
    """thunder ``aggregate_by_index(function, level=...)`` /
    ``stat_by_index(stat, level=...)`` on a 2-D index (series.py:~880):
    group positions within each record by the index value at ``level``
    and reduce.  Returns ``(row_idx, level_value, stat)`` flat arrays."""
    key = np.asarray(index2d)[level]
    pos = positions(offsets)
    base, rel = _flat(values, offsets)   # slice-safe (base starts at offsets[0])
    return seg_stat_by_key(base, rel, key[pos], stat)


def seg_between(values, offsets, left, right, index: np.ndarray | None = None):
    """Positions with ``left <= index <= right`` (thunder ``between``, series.py:~230;
    thunder implements it via a boolean range crop on the index — bounds inclusive)."""
    pos = positions(offsets)
    key = pos if index is None else np.asarray(index)[pos]
    mask = (key >= left) & (key <= right)
    lens = lengths(offsets)
    base = _base_values(values, offsets)
    rid = row_ids(offsets)
    new_lens = np.bincount(rid[mask], minlength=len(lens))
    new_off = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(new_lens, out=new_off[1:])
    return base[mask], new_off


# ---------------------------------------------------------------------------
# Index-grouped aggregation within records (the rollup primitive;
# thunder select_by_index / aggregate_by_index / stat_by_index,
# thunder/series/series.py:~820-980)

def seg_stat_by_key(values, offsets, keys_per_pos: np.ndarray, stat: str):
    """Group *positions within each record* by ``keys_per_pos`` (one key per
    flattened position, e.g. a time bucket) and reduce each (row, key) group.

    Returns ``(row_idx, key, stat_value)`` flat arrays — one output element
    per (record, distinct key) pair, keys ascending within each record.
    This is `aggregate_by_index` generalized to per-position keys, and is
    exactly the raw->tier per-document partial of SURVEY.md §2.5.
    """
    rid = row_ids(offsets)
    base = _base_values(values, offsets)
    order = np.lexsort((keys_per_pos, rid))
    r = rid[order]
    k = keys_per_pos[order]
    v = base[order]
    boundary = np.empty(len(r), dtype=bool)
    if len(r):
        boundary[0] = True
        boundary[1:] = (r[1:] != r[:-1]) | (k[1:] != k[:-1])
    starts = np.flatnonzero(boundary)
    grp_lens = np.diff(np.append(starts, len(r)))
    out_r = r[starts]
    out_k = k[starts]
    if stat == "count":
        return out_r, out_k, grp_lens.astype(np.int64)
    if stat == "sum":
        return out_r, out_k, np.add.reduceat(v.astype(np.int64 if v.dtype.kind != "f" else np.float64), starts)
    if stat == "mean":
        s = np.add.reduceat(v.astype(np.float64), starts)
        return out_r, out_k, s / grp_lens
    if stat == "min":
        return out_r, out_k, np.minimum.reduceat(v, starts)
    if stat == "max":
        return out_r, out_k, np.maximum.reduceat(v, starts)
    if stat == "std":
        s = np.add.reduceat(v.astype(np.float64), starts)
        q = np.add.reduceat(v.astype(np.float64) ** 2, starts)
        var = q / grp_lens - (s / grp_lens) ** 2
        return out_r, out_k, np.sqrt(np.maximum(var, 0.0))
    if stat == "median":
        # v is already sorted by (row, key) but not by value; sort within groups
        g = np.cumsum(boundary) - 1
        o2 = np.lexsort((v, g))
        sv = v[o2]
        rel = starts
        pos = (grp_lens - 1) * 0.5
        lo = np.floor(pos).astype(np.int64)
        hi = np.ceil(pos).astype(np.int64)
        frac = pos - lo
        return out_r, out_k, sv[rel + lo].astype(np.float64) * (1 - frac) + sv[rel + hi].astype(np.float64) * frac
    raise ValueError(f"unknown stat {stat!r}")


def seg_moments_by_key(values, offsets, keys_per_pos: np.ndarray):
    """One pass -> exact integer moments per (record-collapsed) key group.

    Unlike :func:`seg_stat_by_key` this collapses across records too: it
    returns ``(key, count, sum, sumsq, min, max)`` for every distinct key in
    the batch — the engine's partial-aggregation combiner (SURVEY.md §4.2,
    'pre-aggregate inside map_batches before the groupby').  Integer moments
    are merge-order independent => bit-exact under any parallelism.
    """
    base = _base_values(values, offsets)
    order = np.argsort(keys_per_pos, kind="stable")
    k = keys_per_pos[order]
    v = base[order]
    boundary = np.empty(len(k), dtype=bool)
    if len(k):
        boundary[0] = True
        boundary[1:] = k[1:] != k[:-1]
    starts = np.flatnonzero(boundary)
    grp_lens = np.diff(np.append(starts, len(k))).astype(np.int64)
    v64 = v.astype(np.int64)
    return (
        k[starts],
        grp_lens,
        np.add.reduceat(v64, starts) if len(starts) else np.empty(0, np.int64),
        np.add.reduceat(v64 * v64, starts) if len(starts) else np.empty(0, np.int64),
        np.minimum.reduceat(v, starts) if len(starts) else np.empty(0, v.dtype),
        np.maximum.reduceat(v, starts) if len(starts) else np.empty(0, v.dtype),
    )
