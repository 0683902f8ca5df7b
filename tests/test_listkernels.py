"""Segmented kernels vs the naive NumPy oracle (thunder test_series.py style:
tiny deterministic inputs, exact / allclose comparison per record)."""

import numpy as np
import pyarrow as pa
import pytest

from thunder_ray.reference import oracle
from thunder_ray.stages import listkernels as lk


def rows_of(tbl):
    vals, offs = lk.list_parts(tbl["tokens"])
    return [vals[offs[i]: offs[i + 1]] for i in range(len(offs) - 1)]


@pytest.fixture(scope="module")
def flat(tokens_table):
    vals, offs = lk.list_parts(tokens_table["tokens"])
    return vals, offs


def test_list_parts_roundtrip(tokens_table):
    vals, offs = lk.list_parts(tokens_table["tokens"])
    rebuilt = lk.rebuild_list(vals, offs, type_=pa.int32())
    assert rebuilt.equals(tokens_table["tokens"].combine_chunks())


@pytest.mark.parametrize("stat", ["count", "sum", "mean", "median", "std", "max", "min"])
def test_seg_stats(tokens_table, flat, stat):
    vals, offs = flat
    got = lk.seg_stat(vals, offs, stat)
    want = [oracle.record_stat(r, stat) for r in rows_of(tokens_table)]
    np.testing.assert_allclose(np.asarray(got, dtype=np.float64), want, rtol=1e-12)


def test_seg_percentile(tokens_table, flat):
    vals, offs = flat
    got = lk.seg_percentile(vals, offs, 20.0)
    want = [np.percentile(r, 20.0) for r in rows_of(tokens_table)]
    np.testing.assert_allclose(got, want, rtol=1e-12)


@pytest.mark.parametrize("fn,ref", [
    (lk.seg_center, oracle.center),
    (lk.seg_standardize, oracle.standardize),
    (lk.seg_zscore, oracle.zscore),
])
def test_seg_transforms(tokens_table, flat, fn, ref):
    vals, offs = flat
    got = fn(vals, offs)
    want = np.concatenate([ref(r) for r in rows_of(tokens_table)])
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_seg_squelch(tokens_table, flat):
    vals, offs = flat
    thr = 49_000
    got = lk.seg_squelch(vals, offs, thr)
    want = np.concatenate([oracle.squelch(r, thr) for r in rows_of(tokens_table)])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("k", [1, 3, 7])
def test_seg_subsample(tokens_table, flat, k):
    vals, offs = flat
    got_v, got_o = lk.seg_subsample(vals, offs, k)
    want = [oracle.subsample(r, k) for r in rows_of(tokens_table)]
    np.testing.assert_array_equal(got_v, np.concatenate(want))
    np.testing.assert_array_equal(np.diff(got_o), [len(w) for w in want])


@pytest.mark.parametrize("k", [2, 5, 13])
def test_seg_downsample(tokens_table, flat, k):
    vals, offs = flat
    got_v, got_o = lk.seg_downsample(vals, offs, k)
    want = [oracle.downsample(r, k) for r in rows_of(tokens_table)]
    np.testing.assert_allclose(got_v, np.concatenate(want), rtol=1e-12)
    np.testing.assert_array_equal(np.diff(got_o), [len(w) for w in want])


def test_seg_downsample_remainder_discarded():
    # 7 points, k=3 -> 2 bins, last point dropped (thunder semantics)
    t = pa.table({"tokens": pa.array([list(range(7))], type=pa.list_(pa.int32()))})
    vals, offs = lk.list_parts(t["tokens"])
    got_v, got_o = lk.seg_downsample(vals, offs, 3)
    np.testing.assert_allclose(got_v, [1.0, 4.0])


def test_seg_select_between(tokens_table, flat):
    vals, offs = flat
    got_v, got_o = lk.seg_select(vals, offs, [0, 2, 5])
    want = [oracle.select(r, [0, 2, 5]) for r in rows_of(tokens_table)]
    np.testing.assert_array_equal(got_v, np.concatenate(want))

    got_v, got_o = lk.seg_between(vals, offs, 3, 10)
    want = [oracle.between(r, 3, 10) for r in rows_of(tokens_table)]
    np.testing.assert_array_equal(got_v, np.concatenate(want))
    np.testing.assert_array_equal(np.diff(got_o), [len(w) for w in want])


def test_seg_stat_by_key_matches_oracle(tokens_table, flat):
    vals, offs = flat
    pos = lk.positions(offsets=offs)
    key = pos % 4  # a 4-level cyclic index, like FIXTURES multi-level fixture
    for stat in ["count", "sum", "mean", "min", "max", "std", "median"]:
        r, k, v = lk.seg_stat_by_key(vals, offs, key, stat)
        rows = rows_of(tokens_table)
        for row_i in range(len(rows)):
            idx = np.arange(len(rows[row_i])) % 4
            uniq, want = oracle.stat_by_index(rows[row_i], idx, stat)
            sel = r == row_i
            np.testing.assert_array_equal(k[sel], uniq)
            np.testing.assert_allclose(
                np.asarray(v[sel], dtype=np.float64),
                np.asarray(want, dtype=np.float64), rtol=1e-12,
            )


def test_seg_moments_by_key_exact(tokens_table, flat):
    vals, offs = flat
    pos = lk.positions(offs)
    key = pos // 60  # bucket-ish
    k, cnt, s, q, mn, mx = lk.seg_moments_by_key(vals, offs, key)
    allv = lk._base_values(vals, offs).astype(np.int64)
    for i, kk in enumerate(k):
        sel = key == kk
        assert cnt[i] == sel.sum()
        assert s[i] == allv[sel].sum()
        assert q[i] == (allv[sel] ** 2).sum()
        assert mn[i] == allv[sel].min()
        assert mx[i] == allv[sel].max()


def test_empty_segments():
    t = pa.table({"tokens": pa.array([[], [1, 2, 3], []], type=pa.list_(pa.int32()))})
    vals, offs = lk.list_parts(t["tokens"])
    assert list(lk.seg_sum(vals, offs)) == [0, 6, 0]
    assert lk.seg_stat(vals, offs, "count").tolist() == [0, 3, 0]


def test_sliced_batch():
    """Kernels must be correct on a sliced (non-zero offset) Arrow batch."""
    t = pa.table({"tokens": pa.array([[1, 2], [3, 4, 5], [6], [7, 8]], type=pa.list_(pa.int32()))})
    sl = t.slice(1, 2)  # rows [3,4,5], [6]
    vals, offs = lk.list_parts(sl["tokens"])
    assert list(lk.seg_sum(vals, offs)) == [12, 6]
    assert list(lk.seg_min(vals, offs)) == [3, 6]
    got_v, _ = lk.seg_downsample(vals, offs, 2)
    np.testing.assert_allclose(got_v, [3.5])
