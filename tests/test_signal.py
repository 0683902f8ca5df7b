"""Signal-op kernels vs the pure-NumPy oracle (thunder test_series.py style:
distributed/batch kernel result ``allclose`` to the naive per-row oracle)."""

import numpy as np
import pyarrow as pa
import pytest

from thunder_ray.reference import oracle
from thunder_ray.stages import listkernels as lk
from thunder_ray.stages import signal as sg

RNG = np.random.default_rng(7)
N, D = 23, 40
Y = RNG.normal(10.0, 3.0, size=(N, D))
SIG = RNG.normal(0.0, 1.0, size=D)


def _col(Y):
    flat = Y.reshape(-1)
    offs = np.arange(0, (len(Y) + 1) * Y.shape[1], Y.shape[1], dtype=np.int64)
    return flat, offs


def test_as_2d_roundtrip():
    flat, offs = _col(Y)
    assert np.array_equal(sg.as_2d(flat, offs), Y)
    ragged_offs = offs.copy()
    ragged_offs[1] -= 1  # not a valid list col, but enough to trip the check
    with pytest.raises(ValueError):
        sg.as_2d(flat[:-1], ragged_offs - np.arange(len(ragged_offs) > 0))


@pytest.mark.parametrize("method,order", [("linear", 1), ("nonlinear", 3), ("nonlinear", 5)])
def test_detrend(method, order):
    got = sg.detrend_2d(Y, method, order)
    want = np.stack([oracle.detrend(y, method, order) for y in Y])
    assert np.allclose(got, want, atol=1e-8)


def test_detrend_linear_closed_form_matches_polyfit():
    Yi = RNG.integers(0, 100, size=(N, D)).astype(np.int64)
    got = sg.detrend_linear_closed_form(Yi)
    want = np.stack([oracle.detrend(y, "linear") for y in Yi])
    assert np.allclose(got, want, atol=1e-8)


@pytest.mark.parametrize("method,window", [
    ("percentile", None), ("mean", None), ("window", 7), ("window", 64),
    ("window-exact", 7),
])
def test_normalize(method, window):
    got = sg.normalize_2d(Y, method, window)
    want = np.stack([oracle.normalize(y, method, window) for y in Y])
    assert np.allclose(got, want, atol=1e-10)


@pytest.mark.parametrize("freq", [1, 5])
def test_fourier(freq):
    co, ph = sg.fourier_2d(Y, freq)
    want = np.stack([oracle.fourier(y, freq) for y in Y])
    assert np.allclose(co, want[:, 0], atol=1e-10)
    assert np.allclose(ph, want[:, 1], atol=1e-10)


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
def test_convolve(mode):
    s = SIG[:9]
    got = sg.convolve_2d(Y, s, mode)
    want = np.stack([oracle.convolve(y, s, mode) for y in Y])
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-10)


def test_correlate():
    got = sg.correlate_2d(Y, SIG)
    want = np.array([oracle.correlate(y, SIG) for y in Y])
    assert np.allclose(got, want, atol=1e-12)


@pytest.mark.parametrize("lag", [0, 3])
def test_crosscorr(lag):
    got = sg.crosscorr_2d(Y, SIG, lag)
    want = np.stack([oracle.crosscorr(y, SIG, lag) for y in Y])
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-12)


def test_mean_by_window_ragged():
    lens = RNG.integers(10, 30, size=12)
    rows = [RNG.integers(0, 50, size=n).astype(np.int32) for n in lens]
    flat = np.concatenate(rows)
    offs = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    indices, window = [4, 11, 27], 6
    got = sg.seg_mean_by_window(flat, offs, indices, window)
    want = np.stack([oracle.mean_by_window(r, indices, window) for r in rows])
    assert np.allclose(got, want, equal_nan=True)


def test_mean_by_window_on_arrow_slice():
    """Kernels must be correct on sliced (non-zero-offset) Arrow buffers."""
    lens = [8, 12, 10, 9]
    rows = [RNG.integers(0, 9, size=n).astype(np.int32) for n in lens]
    arr = pa.array([r.tolist() for r in rows], type=pa.list_(pa.int32()))
    sliced = arr.slice(1, 3)
    vals, offs = lk.list_parts(sliced)
    got = sg.seg_mean_by_window(vals, offs, [3], 4)
    want = np.stack([oracle.mean_by_window(r, [3], 4) for r in rows[1:]])
    assert np.allclose(got, want, equal_nan=True)


@pytest.mark.parametrize("lag", [0, 2])
def test_crosscorr_int_matches_float_kernel(lag):
    """crosscorr_int_2d's num/(sqrt(nv)*sqrt(nw)) is the same normalized
    cross-correlation as crosscorr_2d against the integer test signal
    (centering-by-d cancels in the normalization)."""
    rng = np.random.default_rng(11)
    V = rng.integers(-1_000_000, 1_000_000, size=(20, 64), dtype=np.int64)
    num, nv, nw = sg.crosscorr_int_2d(V, lag)
    d = V.shape[1]
    w = (((np.arange(d) * 37 + 11) % 101) - 50).astype(np.float64)
    want = sg.crosscorr_2d(V.astype(np.float64), w, lag)
    got = num.astype(np.float64) / (np.sqrt(nv.astype(np.float64))[:, None]
                                    * np.sqrt(float(nw)))
    assert np.allclose(got, want, atol=1e-12)
