"""Pure-NumPy oracle: naive, trusted implementations of every operator.

Mirrors thunder's dual-mode design (SURVEY.md §3 E3): thunder runs the same
API in ``mode='local'`` (plain numpy) and ``mode='spark'`` and its test
suite asserts the two agree (thunder/test/test_series.py pattern:
``allclose(data.op(...).toarray(), expected_numpy)``).  Here the "local
mode" is this module — deliberately written as simple per-row Python/numpy
loops, no vectorization tricks — and pytest asserts the distributed Ray
pipelines match it (exactly for integer ops, bit-identically for the fixed
derived-float expressions).
"""

from __future__ import annotations

import numpy as np

from ..schema import DAY_SECONDS, derive_mean_m2, t0_for_doc_ids

# ---------------------------------------------------------------------------
# Per-record stats (thunder series_stats / series_stat, series.py:~430-540)


def record_stat(y: np.ndarray, stat: str):
    y = np.asarray(y)
    if stat == "count":
        return len(y)
    if stat == "sum":
        return y.sum(dtype=np.int64 if y.dtype.kind != "f" else np.float64)
    if stat == "mean":
        return float(np.mean(y))
    if stat == "median":
        return float(np.median(y))
    if stat in ("std", "stdev"):
        return float(np.std(y))
    if stat == "max":
        return y.max()
    if stat == "min":
        return y.min()
    raise ValueError(stat)


def record_stats(y: np.ndarray) -> dict:
    """thunder ``series_stats``: index ['count','mean','std','max','min']."""
    return {
        "count": len(y),
        "mean": float(np.mean(y)),
        "std": float(np.std(y)),
        "max": y.max(),
        "min": y.min(),
    }


# ---------------------------------------------------------------------------
# Per-record transforms (series.py:~230-820)


def center(y):
    y = np.asarray(y, dtype=np.float64)
    return y - y.mean()


def standardize(y):
    y = np.asarray(y, dtype=np.float64)
    return y / y.std()


def zscore(y):
    y = np.asarray(y, dtype=np.float64)
    return (y - y.mean()) / y.std()


def squelch(y, threshold):
    y = np.asarray(y)
    return y if y.max() >= threshold else np.zeros_like(y)


def subsample(y, k):
    return np.asarray(y)[::k]


def downsample(y, k):
    """Mean of non-overlapping length-k bins; remainder discarded."""
    y = np.asarray(y)
    n = (len(y) // k) * k
    if n == 0:
        return np.empty(0, dtype=np.float64)
    return y[:n].astype(np.float64).reshape(-1, k).mean(axis=1)


def select(y, idx, index=None):
    y = np.asarray(y)
    index = np.arange(len(y)) if index is None else np.asarray(index)
    return y[np.isin(index, np.atleast_1d(idx))]


def between(y, left, right, index=None):
    y = np.asarray(y)
    index = np.arange(len(y)) if index is None else np.asarray(index)
    return y[(index >= left) & (index <= right)]


def detrend(y, method="linear", order=5):
    """Fit a polynomial (order 1 for 'linear'), zero its constant term, and
    subtract — removes the trend while preserving the record's offset.
    (thunder ``detrend``, series.py:~740; constant-term handling spec'd here.)
    """
    y = np.asarray(y, dtype=np.float64)
    o = 1 if method == "linear" else order
    x = np.arange(len(y), dtype=np.float64)
    p = np.polyfit(x, y, o)
    p[-1] = 0.0
    return y - np.polyval(p, x)


def normalize(y, method="percentile", window=None, perc=20, offset=0.1):
    """Baseline-normalize ``(y - b) / (b + offset)`` (thunder ``normalize``,
    series.py:~770).

    * 'percentile' / 'mean': scalar baseline over the whole record.
    * 'window': percentile per non-overlapping chunk of ``window`` points,
      linearly interpolated (np.interp) between chunk centers — the
      gap-fill-interpolation kernel the north rule names; reused for empty
      tier buckets in :mod:`thunder_ray.stages.gapfill`.
    * 'window-exact': rolling centered window percentile per position.
    """
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if method == "percentile":
        b = np.percentile(y, perc)
    elif method == "mean":
        b = y.mean()
    elif method == "window":
        if window is None or window > n:
            window = n
        starts = np.arange(0, n, window)
        centers = np.minimum(starts + window // 2, n - 1).astype(np.float64)
        chunk_p = np.array([np.percentile(y[s: s + window], perc) for s in starts])
        b = np.interp(np.arange(n, dtype=np.float64), centers, chunk_p)
    elif method == "window-exact":
        if window is None or window > n:
            window = n
        half_lo, half_hi = window // 2, window - window // 2
        b = np.array(
            [np.percentile(y[max(0, i - half_lo): min(n, i + half_hi)], perc) for i in range(n)]
        )
    else:
        raise ValueError(method)
    return (y - b) / (b + offset)


def fourier(y, freq):
    """Normalized FFT coherence + phase at ``freq`` (thunder ``fourier``,
    series.py:~650): returns ``[coherence, phase]``."""
    y = np.asarray(y, dtype=np.float64)
    y = y - y.mean()
    n = len(y)
    ft = np.fft.fft(y)[: n // 2]
    amp = 2.0 * np.abs(ft) / n
    with np.errstate(invalid="ignore", divide="ignore"):
        co = amp[freq] / np.sqrt(np.sum(amp**2))
    ph = -(np.pi / 2) - np.angle(ft[freq])
    if ph < 0:
        ph += 2 * np.pi
    return np.array([co, ph])


def convolve(y, signal, mode="full"):
    return np.convolve(np.asarray(y, dtype=np.float64), np.asarray(signal, dtype=np.float64), mode)


def correlate(y, signal):
    """Pearson r per record vs a 1-D signal (series.py:~360)."""
    y = np.asarray(y, dtype=np.float64)
    s = np.asarray(signal, dtype=np.float64)
    return float(np.corrcoef(y, s)[0, 1])


def crosscorr(y, signal, lag=0):
    """Normalized cross-correlation at lags -lag..+lag (series.py:~700).

    Both series are centered/normed; shifted overlaps are zero-padded,
    matching thunder's use of a padded dot product.
    """
    y = np.asarray(y, dtype=np.float64)
    s = np.asarray(signal, dtype=np.float64)
    y0 = (y - y.mean()) / (np.linalg.norm(y - y.mean()))
    s0 = (s - s.mean()) / (np.linalg.norm(s - s.mean()))
    out = []
    for sh in range(-lag, lag + 1):
        shifted = np.roll(s0, sh)
        if sh > 0:
            shifted[:sh] = 0.0
        elif sh < 0:
            shifted[sh:] = 0.0
        out.append(np.dot(y0, shifted))
    return np.array(out)


# ---------------------------------------------------------------------------
# Index-grouped aggregation (series.py:~820-1030)


def aggregate_by_index(y, index, func, level=0):
    """Apply ``func`` per distinct index value (ascending) at ``level``."""
    y = np.asarray(y)
    index = np.asarray(index)
    key = index if index.ndim == 1 else index[level]
    uniq = np.unique(key)
    return uniq, np.array([func(y[key == u]) for u in uniq])


def stat_by_index(y, index, stat, level=0):
    uniq, vals = aggregate_by_index(y, index, lambda g: record_stat(g, stat), level)
    return uniq, vals


def mean_by_panel(y, length):
    y = np.asarray(y, dtype=np.float64)
    assert len(y) % length == 0, "panel length must divide series length"
    return y.reshape(-1, length).mean(axis=0)


def mean_by_window(y, indices, window):
    """Event-triggered average across clipped windows (series.py:~1030).

    Window for center ``i``: positions ``[i - window//2, i + (window - window//2))``
    clipped to the record; offsets missing in a clipped window are averaged
    over the windows that do contain them (count-weighted).
    """
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    before, after = window // 2, window - window // 2
    sums = np.zeros(window)
    cnts = np.zeros(window)
    for i in indices:
        for woff in range(window):
            p = i - before + woff
            if 0 <= p < n:
                sums[woff] += y[p]
                cnts[woff] += 1
    with np.errstate(invalid="ignore", divide="ignore"):
        return sums / cnts


# ---------------------------------------------------------------------------
# Rollup tiers (the engine core; SURVEY.md §1.2/§4.2 spec)


def rollup(doc_ids, tokens_lists, sources, tier_seconds: int):
    """Naive rollup: for every token, ``t = t0(doc) + pos``; group by
    ``(source, t // tier_seconds)``; exact integer moments per group.

    Returns dict key -> [count, sum, sumsq, min, max].
    """
    t0s = t0_for_doc_ids(np.asarray(doc_ids))
    groups: dict = {}
    for t0, toks, src in zip(t0s, tokens_lists, sources):
        toks = np.asarray(toks, dtype=np.int64)
        for i, v in enumerate(toks):
            b = (int(t0) + i) // tier_seconds
            g = groups.get((src, b))
            if g is None:
                groups[(src, b)] = [1, int(v), int(v) * int(v), int(v), int(v)]
            else:
                g[0] += 1
                g[1] += int(v)
                g[2] += int(v) * int(v)
                g[3] = min(g[3], int(v))
                g[4] = max(g[4], int(v))
    return groups


def rollup_table(doc_ids, tokens_lists, sources, tier_seconds: int):
    """Rollup as sorted arrays incl. the derived mean/m2 (FIXTURES.md schema)."""
    groups = rollup(doc_ids, tokens_lists, sources, tier_seconds)
    keys = sorted(groups)
    src = np.array([k[0] for k in keys], dtype=object)
    bucket = np.array([k[1] for k in keys], dtype=np.int64)
    count = np.array([groups[k][0] for k in keys], dtype=np.int64)
    total = np.array([groups[k][1] for k in keys], dtype=np.int64)
    sumsq = np.array([groups[k][2] for k in keys], dtype=np.int64)
    mn = np.array([groups[k][3] for k in keys], dtype=np.int32)
    mx = np.array([groups[k][4] for k in keys], dtype=np.int32)
    mean, m2 = derive_mean_m2(count, total, sumsq)
    return {
        "source": src,
        "bucket": bucket,
        "count": count,
        "sum": total,
        "sumsq": sumsq,
        "min": mn,
        "max": mx,
        "mean": mean,
        "m2": m2,
    }


def rerollup_table(tier_tbl: dict, factor: int):
    """Re-rollup a tier table to a coarser tier (bucket -> bucket // factor)."""
    groups: dict = {}
    for i in range(len(tier_tbl["bucket"])):
        key = (tier_tbl["source"][i], int(tier_tbl["bucket"][i]) // factor)
        g = groups.get(key)
        row = [
            int(tier_tbl["count"][i]),
            int(tier_tbl["sum"][i]),
            int(tier_tbl["sumsq"][i]),
            int(tier_tbl["min"][i]),
            int(tier_tbl["max"][i]),
        ]
        if g is None:
            groups[key] = row
        else:
            g[0] += row[0]
            g[1] += row[1]
            g[2] += row[2]
            g[3] = min(g[3], row[3])
            g[4] = max(g[4], row[4])
    keys = sorted(groups)
    count = np.array([groups[k][0] for k in keys], dtype=np.int64)
    total = np.array([groups[k][1] for k in keys], dtype=np.int64)
    sumsq = np.array([groups[k][2] for k in keys], dtype=np.int64)
    mean, m2 = derive_mean_m2(count, total, sumsq)
    return {
        "source": np.array([k[0] for k in keys], dtype=object),
        "bucket": np.array([k[1] for k in keys], dtype=np.int64),
        "count": count,
        "sum": total,
        "sumsq": sumsq,
        "min": np.array([groups[k][3] for k in keys], dtype=np.int32),
        "max": np.array([groups[k][4] for k in keys], dtype=np.int32),
        "mean": mean,
        "m2": m2,
    }


def word_length_tokens(text: str) -> np.ndarray:
    """The SQL-reproducible tokenizer for the driver ``documents`` table:
    token i = len(i-th field of ``text.split(' ')``) — DuckDB:
    ``list_transform(string_split(text, ' '), w -> length(w))``."""
    return np.array([len(w) for w in text.split(" ")], dtype=np.int32)
