"""Gap-fill interpolation across empty tier buckets.

The north rule names "detrend-style gap-fill interpolation": thunder's
``normalize(method='window')`` (thunder/series/series.py:~770) computes a
baseline at sparse window centers and ``np.interp``-olates between them.
This stage reuses exactly that kernel shape: for each ``source`` at a tier,
buckets with no data between the series' first and last bucket are emitted
with ``mean`` linearly interpolated from the neighbouring real points
(np.interp), ``count=0`` and null min/max/m2, flagged ``gap_filled=True``.

Partitioning assumption: one ``map_groups`` group per source — group size is
O(active buckets per source per tier), bounded for 1m by 1440/day retained
windows; at 100 TB shard the fill by (source, day) if a source's bucket
range outgrows a worker (documented scale path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _fill_group(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values("bucket")
    buckets = g["bucket"].to_numpy(dtype=np.int64)
    if len(buckets) == 0:
        return g.assign(gap_filled=np.zeros(0, dtype=bool))
    full = np.arange(buckets[0], buckets[-1] + 1, dtype=np.int64)
    missing = np.setdiff1d(full, buckets, assume_unique=True)
    g = g.assign(gap_filled=False)
    if len(missing) == 0:
        return g
    interp_mean = np.interp(
        missing.astype(np.float64), buckets.astype(np.float64), g["mean"].to_numpy()
    )
    fill = pd.DataFrame(
        {
            "source": g["source"].iloc[0],
            "bucket": missing,
            "count": np.int64(0),
            "sum": np.int64(0),
            "sumsq": np.int64(0),
            "min": pd.array([pd.NA] * len(missing), dtype="Int32"),
            "max": pd.array([pd.NA] * len(missing), dtype="Int32"),
            "mean": interp_mean,
            "m2": np.nan,
            "gap_filled": True,
        }
    )
    out = pd.concat([g.astype({"min": "Int32", "max": "Int32"}), fill], ignore_index=True)
    return out.sort_values("bucket").reset_index(drop=True)


def gap_fill(tier_ds):
    """Rolled tier Dataset -> same + interpolated rows for empty buckets."""
    return tier_ds.groupby("source").map_groups(_fill_group, batch_format="pandas")


def gap_fill_local(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-side oracle-friendly variant (same kernel, plain pandas)."""
    return (
        df.groupby("source", group_keys=False)[df.columns.tolist()]
        .apply(_fill_group)
        .reset_index(drop=True)
    )
