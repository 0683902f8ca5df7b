"""Gap-fill interpolation across empty tier buckets — SHARDED plan.

The north rule names "detrend-style gap-fill interpolation": thunder's
``normalize(method='window')`` (thunder/series/series.py:~770) computes a
baseline at sparse points and interpolates between them.  For each key at a
tier, buckets with no data between the series' first and last bucket are
emitted with ``mean`` linearly interpolated from the neighbouring real
points, ``count=0`` and null min/max/m2, flagged ``gap_filled=True``.

One code path at every scale (VERDICT r2 next #6 — the old stage grouped
WHOLE keys, unbounded for a year-long 1m series): every fill row is
determined by ONE consecutive pair of present buckets, so

1. per ``(key, day = bucket // shard)`` shards fill in-day pairs and emit
   each day's FIRST and LAST present point as carry/summary rows;
2. a per-key pass over the summaries (2 rows per day — tiny) fills the
   day-BOUNDARY pairs (last point of a day -> first point of the next day
   with data), which also covers gaps spanning whole empty days.

The union is exactly the whole-key result — proven bit-identical under
pathological shard sizes by tests/test_property.py — without any group
larger than one day plus 2 rows x days per key.

Interpolation is the ONE fixed float expression shared by the stage, its
query twin (pipelines/queries2.gap_fill_1m_events) and the SQL oracle:
``mean = pm + (nm - pm) * ((b - pb) / (nb - pb))``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _i64(arr) -> pa.Array:
    return pa.array(np.asarray(arr, dtype=np.int64), type=pa.int64())


def _pair_fill(key, pb, nb, pm, nm, key_col: str = "source",
               mode: str = "interp") -> pd.DataFrame:
    """Fill rows for consecutive present-bucket pairs — fully vectorized
    over ALL pairs' missing buckets (repeat + intra-arange); elementwise
    float ops are bit-identical to a per-pair loop.

    ``mode="interp"`` linearly interpolates between the pair (the
    detrend-style baseline); ``mode="locf"`` carries the previous bucket's
    mean forward unchanged (last observation carried forward) — an exact
    copy, no float arithmetic at all."""
    pb = np.asarray(pb, dtype=np.int64)
    nb = np.asarray(nb, dtype=np.int64)
    pm = np.asarray(pm, dtype=np.float64)
    nm = np.asarray(nm, dtype=np.float64)
    key = np.asarray(key, dtype=object)
    gap = np.maximum(nb - pb - 1, 0)
    keep = gap > 0
    pb, nb, pm, nm, key, gap = (pb[keep], nb[keep], pm[keep], nm[keep],
                                key[keep], gap[keep])
    if not len(gap):
        return pd.DataFrame({key_col: pd.Series([], dtype=str),
                             "bucket": pd.Series([], dtype=np.int64),
                             "mean_fill": pd.Series([], dtype=np.float64)})
    rep = np.repeat(np.arange(len(gap), dtype=np.int64), gap)
    intra = (np.arange(int(gap.sum()), dtype=np.int64)
             - np.repeat(np.cumsum(gap) - gap, gap))
    miss = pb[rep] + 1 + intra
    if mode == "locf":
        mean = pm[rep]
    else:
        mean = pm[rep] + (nm[rep] - pm[rep]) * (
            (miss - pb[rep]).astype(np.float64) / (nb[rep] - pb[rep]).astype(np.float64))
    return pd.DataFrame({
        key_col: key[rep],
        "bucket": miss,
        "mean_fill": mean,
    })


def sharded_fills(mean_ds, key_col: str = "source", shard: int = 1440,
                  mode: str = "interp"):
    """Core sharded fill: Dataset with (key_col, bucket, mean) columns ->
    Dataset of filled rows (key_col, bucket, mean_fill) for every missing
    bucket between each key's first and last present bucket; ``mode`` picks
    the fill expression (see _pair_fill)."""

    def tag(batch: pa.Table) -> pa.Table:
        b = batch["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("day", _i64(b // shard))

    tagged = mean_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    def in_day(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket")
        b = g["bucket"].to_numpy(np.int64)
        m = g["mean"].to_numpy(np.float64)
        key = g[key_col].to_numpy()
        fills = _pair_fill(key[:-1], b[:-1], b[1:], m[:-1], m[1:], key_col,
                           mode=mode)
        fills["_kind"] = np.zeros(len(fills), dtype=np.int64)
        edge = [0, len(b) - 1] if len(b) else []
        summary = pd.DataFrame({
            key_col: key[edge],
            "bucket": b[edge],
            "mean_fill": m[edge],
            "_kind": np.ones(len(edge), dtype=np.int64),
        })
        return pd.concat([fills, summary], ignore_index=True)

    both = tagged.groupby([key_col, "day"]).map_groups(
        in_day, batch_format="pandas").materialize()

    def select_kind(k):
        def f(batch: pa.Table) -> pa.Table:
            kk = batch["_kind"].to_numpy(zero_copy_only=False).astype(np.int64)
            return batch.filter(pa.array(kk == k)).drop_columns(["_kind"])
        return f

    fills = both.map_batches(select_kind(0), batch_format="pyarrow",
                             zero_copy_batch=True)
    summaries = both.map_batches(select_kind(1), batch_format="pyarrow",
                                 zero_copy_batch=True)

    def boundary(g: pd.DataFrame) -> pd.DataFrame:
        # one key's day edges, sorted by bucket: consecutive SUMMARY points
        # in different days form the cross-day pairs (in-day neighbours
        # among summaries produce empty fills by construction)
        g = g.sort_values("bucket")
        b = g["bucket"].to_numpy(np.int64)
        m = g["mean_fill"].to_numpy(np.float64)
        key = g[key_col].to_numpy()
        day = b // shard
        sel = np.flatnonzero(day[1:] != day[:-1])
        return _pair_fill(key[sel], b[sel], b[sel + 1], m[sel], m[sel + 1],
                          key_col, mode=mode)

    cross = summaries.groupby(key_col).map_groups(
        boundary, batch_format="pandas").map_batches(
        lambda b: b, batch_format="pyarrow")   # arrow blocks for the union
    return fills.union(cross)


def _fills_to_tier_rows(key_col: str):
    """(key, bucket, mean_fill) -> full tier-schema rows (count=0, null
    min/max, NaN m2, gap_filled=True)."""

    def f(batch: pa.Table) -> pa.Table:
        n = len(batch)
        key = batch[key_col]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        return pa.table({
            key_col: key.cast(pa.string()),
            "bucket": _i64(batch["bucket"].to_numpy(zero_copy_only=False)),
            "count": _i64(np.zeros(n, dtype=np.int64)),
            "sum": _i64(np.zeros(n, dtype=np.int64)),
            "sumsq": _i64(np.zeros(n, dtype=np.int64)),
            "min": pa.nulls(n, type=pa.int32()),
            "max": pa.nulls(n, type=pa.int32()),
            "mean": pa.array(batch["mean_fill"].to_numpy(zero_copy_only=False)),
            "m2": pa.array(np.full(n, np.nan)),
            "gap_filled": pa.array(np.ones(n, dtype=bool)),
        })

    return f


_TIER_COLS = ["bucket", "count", "sum", "sumsq", "min", "max", "mean", "m2"]


def gap_fill(tier_ds, shard: int = 1440, key_col: str = "source"):
    """Rolled tier Dataset -> same rows (gap_filled=False) + interpolated
    rows for empty buckets (gap_filled=True), via the sharded plan."""

    def real_rows(batch: pa.Table) -> pa.Table:
        key = batch[key_col]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        cols = {key_col: key.cast(pa.string())}
        for c in _TIER_COLS:
            col = batch[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if c in ("min", "max"):
                col = col.cast(pa.int32())
            elif c in ("mean", "m2"):
                col = col.cast(pa.float64())
            else:
                col = col.cast(pa.int64())
            cols[c] = col
        cols["gap_filled"] = pa.array(np.zeros(len(batch), dtype=bool))
        return pa.table(cols)

    # materialized: the tier feeds BOTH the pass-through real rows and the
    # mean view, and Ray re-executes lazy lineage per consumer — an
    # un-cached caller would otherwise run its whole rollup twice
    # (rolled-point scale, spillable object-store blocks)
    tier_ds = tier_ds.materialize()
    real = tier_ds.map_batches(real_rows, batch_format="pyarrow",
                               zero_copy_batch=True)
    mean_view = tier_ds.select_columns([key_col, "bucket", "mean"])
    filled = sharded_fills(mean_view, key_col=key_col, shard=shard).map_batches(
        _fills_to_tier_rows(key_col), batch_format="pyarrow", zero_copy_batch=True)
    return real.union(filled)


def gap_fill_local(df: pd.DataFrame, key_col: str = "source") -> pd.DataFrame:
    """Driver-side oracle-friendly variant — same pair-fill expression,
    plain pandas, whole keys (test-scale only)."""
    parts = []
    for _, g in df.groupby(key_col, sort=True):
        g = g.sort_values("bucket")
        b = g["bucket"].to_numpy(np.int64)
        m = g["mean"].to_numpy(np.float64)
        key = g[key_col].to_numpy()
        fills = _pair_fill(key[:-1], b[:-1], b[1:], m[:-1], m[1:], key_col)
        real = g.assign(gap_filled=False).astype({"min": "Int32", "max": "Int32"})
        if len(fills):
            full = pd.DataFrame({
                key_col: fills[key_col],
                "bucket": fills["bucket"].astype(np.int64),
                "count": np.int64(0),
                "sum": np.int64(0),
                "sumsq": np.int64(0),
                "min": pd.array([pd.NA] * len(fills), dtype="Int32"),
                "max": pd.array([pd.NA] * len(fills), dtype="Int32"),
                "mean": fills["mean_fill"].to_numpy(),
                "m2": np.nan,
                "gap_filled": True,
            })
            parts.append(pd.concat([real, full], ignore_index=True))
        else:
            parts.append(real)
    out = pd.concat(parts, ignore_index=True) if parts else df.assign(gap_filled=False)
    return out.sort_values([key_col, "bucket"]).reset_index(drop=True)
