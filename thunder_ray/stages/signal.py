"""Dense signal kernels over fixed-length records (thunder series.py:~360-770).

These are thunder's interactive-analysis operators — detrend, normalize,
fourier, convolve, correlate, crosscorr, mean_by_window — re-expressed as
batch kernels for ``map_batches(batch_format="pyarrow", zero_copy_batch=True)``.

Vectorization strategy: a fixed-length ``list<T>`` column (the embeddings
table; thunder Series always has uniform length) reshapes zero-copy to a 2-D
``(n_rows, d)`` array, and every kernel below is a whole-matrix numpy
expression — loops only over the (small) signal/window/order dimension,
NEVER over rows.  Variable-length records (tokens) use the segmented
helpers in :mod:`listkernels`; :func:`seg_mean_by_window` here is the one
windowed kernel defined for ragged rows.

Float parity vs :mod:`thunder_ray.reference.oracle` is ``allclose`` (the
thunder test discipline, test_series.py) — bit-exactness is reserved for
the integer-moment rollup path (stages/rollup.py).
"""

from __future__ import annotations

import numpy as np

from . import listkernels as lk


def as_2d(values: np.ndarray, offsets: np.ndarray,
          d_if_empty: int | None = None) -> np.ndarray:
    """Zero-copy ``(n, d)`` view of a fixed-length list column.

    Raises if rows are ragged — caller decides whether to fall back to the
    segmented kernels.  An empty batch returns ``(0, d_if_empty or 0)`` —
    matmul consumers that know their width should pass it so ``Y @ Q.T``
    stays shape-valid on empty blocks.
    """
    lens = lk.lengths(offsets)
    if len(lens) == 0:
        return np.empty((0, d_if_empty or 0))
    d = int(lens[0])
    if not (lens == d).all():
        raise ValueError("ragged list column; use segmented kernels")
    return lk._base_values(values, offsets).reshape(len(lens), d)


# ---------------------------------------------------------------------------
# Detrend (thunder series.py:~740)

def detrend_2d(Y: np.ndarray, method: str = "linear", order: int = 5) -> np.ndarray:
    """Polynomial detrend per row, constant term preserved (oracle.detrend).

    One shared Vandermonde lstsq for the whole batch (same x for every row)
    — ``np.polyfit`` accepts a 2-D rhs, so the fit is a single LAPACK call.
    """
    Y = np.asarray(Y, dtype=np.float64)
    n, d = Y.shape
    o = 1 if method == "linear" else order
    x = np.arange(d, dtype=np.float64)
    coefs = np.polyfit(x, Y.T, o)          # (o+1, n)
    coefs[-1, :] = 0.0                     # keep each record's offset
    # Horner per row: trend[n, d]
    trend = np.zeros_like(Y)
    for c in coefs:                        # o+1 iterations, vectorized over rows
        trend = trend * x + c[:, None]
    return Y - trend


def detrend_linear_closed_form(Y: np.ndarray) -> np.ndarray:
    """Degree-1 detrend via the exact closed-form slope on integer moments.

    Mathematically identical to ``detrend_2d(Y, 'linear')`` but evaluated
    with ONE fixed float expression from exact sums — reproducible
    bit-for-bit by the DuckDB oracle (pipelines/queries.py uses this for
    the hash-matched query; the polyfit path keeps thunder parity).

    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2);  resid = y - slope * x
    (constant term zeroed, matching oracle.detrend's offset preservation).
    """
    Y = np.asarray(Y)
    n_rows, d = Y.shape
    x = np.arange(d, dtype=np.int64)
    sx = int(x.sum())
    sxx = int((x * x).sum())
    y64 = Y.astype(np.int64)
    sy = y64.sum(axis=1)                   # exact per row
    sxy = (y64 * x).sum(axis=1)            # exact per row
    slope = (d * sxy - sx * sy).astype(np.float64) / float(d * sxx - sx * sx)
    return Y.astype(np.float64) - slope[:, None] * x.astype(np.float64)


# ---------------------------------------------------------------------------
# Normalize (thunder series.py:~770) — the gap-fill-interpolation kernel

def _row_percentile(Y: np.ndarray, perc: float) -> np.ndarray:
    """Per-row percentile, numpy 'linear' semantics, vectorized."""
    return np.percentile(Y, perc, axis=1)


def normalize_2d(Y: np.ndarray, method: str = "percentile", window: int | None = None,
                 perc: float = 20, offset: float = 0.1) -> np.ndarray:
    Y = np.asarray(Y, dtype=np.float64)
    n, d = Y.shape
    if method == "percentile":
        b = _row_percentile(Y, perc)[:, None]
    elif method == "mean":
        b = Y.mean(axis=1)[:, None]
    elif method == "window":
        if window is None or window > d:
            window = d
        starts = np.arange(0, d, window)
        centers = np.minimum(starts + window // 2, d - 1).astype(np.float64)
        # chunk percentiles: loop over #chunks (small), vectorized over rows
        chunk_p = np.stack(
            [np.percentile(Y[:, s: s + window], perc, axis=1) for s in starts], axis=1
        )
        xs = np.arange(d, dtype=np.float64)
        # np.interp per row with shared x grid — loop-free via searchsorted
        b = _interp_rows(xs, centers, chunk_p)
    elif method == "window-exact":
        if window is None or window > d:
            window = d
        half_lo, half_hi = window // 2, window - window // 2
        cols = [
            np.percentile(Y[:, max(0, i - half_lo): min(d, i + half_hi)], perc, axis=1)
            for i in range(d)
        ]                                   # d iterations, vectorized over rows
        b = np.stack(cols, axis=1)
    else:
        raise ValueError(method)
    return (Y - b) / (b + offset)


def _interp_rows(x: np.ndarray, xp: np.ndarray, fp_rows: np.ndarray) -> np.ndarray:
    """Vectorized ``np.interp(x, xp, fp_rows[r])`` for every row r.

    Shared knots ``xp`` (ascending), per-row values ``fp_rows (n, k)``.
    Matches np.interp semantics incl. edge clamping.
    """
    k = len(xp)
    if k == 1:
        return np.repeat(fp_rows, len(x), axis=1)
    j = np.clip(np.searchsorted(xp, x, side="right") - 1, 0, k - 2)
    x0, x1 = xp[j], xp[j + 1]
    f0, f1 = fp_rows[:, j], fp_rows[:, j + 1]
    with np.errstate(invalid="ignore", divide="ignore"):
        slope = (f1 - f0) / (x1 - x0)
    out = slope * (x - x0) + f0
    out = np.where(x <= xp[0], fp_rows[:, :1], out)
    out = np.where(x >= xp[-1], fp_rows[:, -1:], out)
    return out


# ---------------------------------------------------------------------------
# Fourier / convolve / correlate / crosscorr (thunder series.py:~360-700)

def fourier_2d(Y: np.ndarray, freq: int) -> tuple[np.ndarray, np.ndarray]:
    """Normalized FFT coherence + phase at ``freq`` per row (oracle.fourier)."""
    Y = np.asarray(Y, dtype=np.float64)
    n, d = Y.shape
    if not 0 <= freq < d // 2:
        # thunder raises 'requested frequency is too high' at the Nyquist
        # bound (series.py fourier); a bare IndexError mid-pipeline is the
        # wrong failure mode (review r4)
        raise ValueError(f"fourier: freq {freq} outside [0, {d // 2}) — "
                         f"exceeds the Nyquist bound for length-{d} series")
    Yc = Y - Y.mean(axis=1)[:, None]
    ft = np.fft.fft(Yc, axis=1)[:, : d // 2]
    amp = 2.0 * np.abs(ft) / d
    with np.errstate(invalid="ignore", divide="ignore"):
        co = amp[:, freq] / np.sqrt(np.sum(amp**2, axis=1))
    ph = -(np.pi / 2) - np.angle(ft[:, freq])
    ph = np.where(ph < 0, ph + 2 * np.pi, ph)
    return co, ph


def convolve_2d(Y: np.ndarray, signal: np.ndarray, mode: str = "full") -> np.ndarray:
    """np.convolve per row — tap loop over the signal, vectorized over rows."""
    Y = np.asarray(Y, dtype=np.float64)
    s = np.asarray(signal, dtype=np.float64)
    n, d = Y.shape
    m = len(s)
    full = np.zeros((n, d + m - 1))
    for j in range(m):                      # m taps, each a whole-matrix op
        full[:, j: j + d] += Y * s[j]
    if mode == "full":
        return full
    if mode == "same":
        start = (m - 1) // 2
        return full[:, start: start + d]
    if mode == "valid":
        lo, hi = min(d, m) - 1, max(d, m)
        return full[:, lo:hi]
    raise ValueError(mode)


def correlate_2d(Y: np.ndarray, signal: np.ndarray) -> np.ndarray:
    """Pearson r per row against a shared 1-D signal (oracle.correlate)."""
    Y = np.asarray(Y, dtype=np.float64)
    s = np.asarray(signal, dtype=np.float64)
    Yc = Y - Y.mean(axis=1)[:, None]
    sc = s - s.mean()
    num = Yc @ sc
    den = np.sqrt((Yc * Yc).sum(axis=1)) * np.sqrt((sc * sc).sum())
    with np.errstate(invalid="ignore", divide="ignore"):
        return num / den


def crosscorr_int_2d(V: np.ndarray, lag: int):
    """Exact scaled-int cross-correlation numerators (the SQL-expressible
    twin of :func:`crosscorr_2d`, VERDICT r3 #4 — same detrend-closed-form
    trick: centering is multiplied through by d so everything stays int64).

    ``V``: (n, d) int64 scaled values.  Test signal w[q] = ((q*37+11) % 101)
    - 50 (pure-integer, reproducible in SQL).  With vc = d*V - rowsum(V) and
    wc = d*w - sum(w):
      num[:, i] = sum_p vc[:, p] * wc[p - L]   (L = i - lag, zero-padded)
      nv = sum(vc^2) per row, nw = sum(wc^2)
    and num / (sqrt(nv) * sqrt(nw)) equals crosscorr_2d(V, w, lag) exactly
    in real arithmetic (both scale-invariant normalizations cancel d)."""
    V = np.asarray(V, dtype=np.int64)
    n, d = V.shape
    vmax = int(np.abs(V).max()) if V.size else 0
    # two-stage overflow guard (numpy would WRAP silently where the SQL
    # twin's HUGEINT->BIGINT cast raises — refuse loudly instead, house
    # rule: cusum/hll/repetition guards).  Stage 1: vc = d*V - rowsum must
    # itself fit int64 (|vc| <= 2*d*vmax).
    if 2 * d * max(vmax, 50) >= 1 << 62:
        raise ValueError("crosscorr_int: centered values would overflow "
                         "int64 — rescale values or reduce the dimension")
    # nw = sum(wc^2) <= d * (100d)^2; guard it like nv (w is fixed, so this
    # is purely a dimension bound).  |num| <= sqrt(nv*nw) by Cauchy-Schwarz,
    # so nv and nw in range cover num too.
    if 10_000 * d ** 3 >= 1 << 62:
        raise ValueError("crosscorr_int: signal norm would overflow int64 — "
                         "reduce the dimension")
    w = (((np.arange(d, dtype=np.int64) * 37 + 11) % 101) - 50)
    vc = d * V - V.sum(axis=1, dtype=np.int64)[:, None]
    wc = d * w - w.sum(dtype=np.int64)
    # Stage 2: estimate nv in float64 (rel. error ~1e-16) with a 2x margin;
    # |num| <= sqrt(nv*nw) by Cauchy-Schwarz, so nv in range covers num too
    vcf = vc.astype(np.float64)
    if n and float(np.einsum("ij,ij->i", vcf, vcf).max()) >= float(1 << 62):
        raise ValueError("crosscorr_int: nv would overflow int64 — rescale "
                         "values or reduce the dimension")
    num = np.zeros((n, 2 * lag + 1), dtype=np.int64)
    for i, L in enumerate(range(-lag, lag + 1)):
        if L >= 0:
            num[:, i] = vc[:, L:] @ wc[: d - L]
        else:
            num[:, i] = vc[:, : d + L] @ wc[-L:]
    nv = np.einsum("ij,ij->i", vc, vc)
    nw = int(wc @ wc)
    return num, nv, nw


def crosscorr_2d(Y: np.ndarray, signal: np.ndarray, lag: int = 0) -> np.ndarray:
    """Normalized cross-correlation at lags -lag..+lag per row (oracle.crosscorr)."""
    Y = np.asarray(Y, dtype=np.float64)
    s = np.asarray(signal, dtype=np.float64)
    Yc = Y - Y.mean(axis=1)[:, None]
    Y0 = Yc / np.linalg.norm(Yc, axis=1)[:, None]
    sc = s - s.mean()
    s0 = sc / np.linalg.norm(sc)
    cols = []
    for sh in range(-lag, lag + 1):         # 2*lag+1 shifts, vectorized over rows
        shifted = np.roll(s0, sh)
        if sh > 0:
            shifted = shifted.copy()
            shifted[:sh] = 0.0
        elif sh < 0:
            shifted = shifted.copy()
            shifted[sh:] = 0.0
        cols.append(Y0 @ shifted)
    return np.stack(cols, axis=1)


# ---------------------------------------------------------------------------
# Event-triggered windows over ragged rows (thunder mean_by_window, series.py:~1030)

def seg_mean_by_window(values: np.ndarray, offsets: np.ndarray,
                       indices, window: int) -> np.ndarray:
    """oracle.mean_by_window per record, vectorized over rows.

    Returns ``(n_rows, window)`` of count-weighted window means; offsets of
    a clipped window average over the windows that contain them.  Loop is
    over (event index x window offset) — typically tens of iterations —
    with every iteration a whole-column gather.
    """
    base, rel = lk._flat(values, offsets)
    lens = lk.lengths(offsets)
    n_rows = len(lens)
    before = window // 2
    sums = np.zeros((n_rows, window))
    cnts = np.zeros((n_rows, window))
    starts = rel[:-1]
    for i in np.atleast_1d(indices):
        for woff in range(window):
            p = int(i) - before + woff
            valid = (p >= 0) & (p < lens)
            idx = starts[valid] + p
            sums[valid, woff] += base[idx].astype(np.float64)
            cnts[valid, woff] += 1
    with np.errstate(invalid="ignore", divide="ignore"):
        return sums / cnts
