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


# ---------------------------------------------------------------------------
# TRUE 2-level index + labels lockstep (thunder series.py:~40/~820/~880,
# base.py:~230/~340; VERDICT r2 next #9)

def _two_level_fixture():
    """4 records of length 12; index2d = (levels x length): level 0 = coarse
    panel (pos // 4), level 1 = phase (pos % 4) — the FIXTURES.md shape."""
    rng = np.random.default_rng(42)
    vals = rng.integers(0, 100, size=(4, 12)).astype(np.int32)
    index2d = np.stack([np.arange(12) // 4, np.arange(12) % 4])
    flat = vals.reshape(-1)
    offs = np.arange(0, 13 * 4, 12, dtype=np.int64)
    return vals, index2d, flat, offs


def test_select_by_index_level1():
    vals, index2d, flat, offs = _two_level_fixture()
    got_v, got_off = lk.seg_select_by_level(flat, offs, index2d, 1, [0, 2])
    want = vals[:, np.isin(index2d[1], [0, 2])]
    assert np.array_equal(got_v.reshape(4, -1), want)
    # filter=True inverts (thunder select_by_index(filter=True))
    inv_v, inv_off = lk.seg_select_by_level(flat, offs, index2d, 1, [0, 2],
                                            invert=True)
    assert np.array_equal(inv_v.reshape(4, -1),
                          vals[:, ~np.isin(index2d[1], [0, 2])])


def test_select_by_index_level0():
    vals, index2d, flat, offs = _two_level_fixture()
    got_v, got_off = lk.seg_select_by_level(flat, offs, index2d, 0, 1)
    assert np.array_equal(got_v.reshape(4, -1), vals[:, 4:8])


def test_aggregate_by_index_level0():
    vals, index2d, flat, offs = _two_level_fixture()
    r, k, s = lk.seg_aggregate_by_level(flat, offs, index2d, 0, "sum")
    # 3 distinct level-0 values per record
    assert np.array_equal(r, np.repeat(np.arange(4), 3))
    assert np.array_equal(k, np.tile(np.arange(3), 4))
    want = vals.reshape(4, 3, 4).sum(axis=2).reshape(-1)
    assert np.array_equal(s, want)


def test_aggregate_by_index_level1_mean():
    vals, index2d, flat, offs = _two_level_fixture()
    r, k, m = lk.seg_aggregate_by_level(flat, offs, index2d, 1, "mean")
    want = vals.reshape(4, 3, 4).mean(axis=1).reshape(-1)
    np.testing.assert_allclose(m, want)


def test_filter_keeps_labels_in_lockstep(ray_session):
    """thunder base.filter filters `labels` alongside values; the engine's
    labels are extra scalar columns and must survive aligned."""
    import pyarrow as pa

    from thunder_ray.sources.series import filter_records, from_array

    vals = np.arange(40, dtype=np.int32).reshape(5, 8)
    base = from_array(vals)

    def add_labels(batch: pa.Table) -> pa.Table:
        n = len(batch)
        ids = [int(d.split("-")[1]) for d in batch["doc_id"].to_pylist()]
        return batch.append_column(
            "label", pa.array([f"L{i}" for i in ids], type=pa.string()))

    labeled = base.map_batches(add_labels, batch_format="pyarrow")
    kept = filter_records(labeled, lambda v: v.mean() >= 12).take_all()
    # records 0 (mean 3.5) and 1 (mean 11.5) drop; labels follow their rows
    got = sorted((r["doc_id"], r["label"], int(np.asarray(r["tokens"]).sum()))
                 for r in kept)
    assert [g[0] for g in got] == [f"mem-{i:08d}" for i in (2, 3, 4)]
    assert [g[1] for g in got] == ["L2", "L3", "L4"]
    assert [g[2] for g in got] == [int(vals[i].sum()) for i in (2, 3, 4)]

    # vectorized predicate path agrees
    from thunder_ray.stages import listkernels as lkm

    def vec(vals_, offs_):
        return lkm.seg_sum(vals_, offs_) >= 12 * 8

    kept2 = filter_records(labeled, vec, vectorized=True).take_all()
    assert sorted(r["label"] for r in kept2) == ["L2", "L3", "L4"]


def test_scaled_list_slice_safe():
    """_scaled_list must return the SLICE's values with relative offsets —
    a head-sliced list column (absolute offsets) fed the full buffer with
    relative offsets would aggregate rows before the slice."""
    import pyarrow as pa

    from thunder_ray.pipelines.queries import _scaled_list

    full = pa.array([[0.1, 0.2], [0.3, 0.4], [0.5, 0.6]],
                    type=pa.list_(pa.float32()))
    sl = full.slice(1, 2)          # head-sliced: offsets start at 2
    tbl = pa.table({"embedding": sl})
    v, offs = _scaled_list(tbl["embedding"])
    assert offs[0] == 0 and len(v) == 4
    assert v.tolist() == [300000, 400000, 500000, 600000]


def test_seg_percentile_empty_trailing_segment():
    """offsets=[0,2,2]: an empty LAST segment must yield NaN, not IndexError
    (rel for the empty segment equals len(values))."""
    import numpy as np

    from thunder_ray.stages import listkernels as lk

    v = np.array([3, 1], dtype=np.int64)
    offs = np.array([0, 2, 2], dtype=np.int64)
    out = lk.seg_percentile(v, offs, 50.0)
    assert out[0] == 2.0 and np.isnan(out[1])
    out = lk.seg_median(np.empty(0, dtype=np.int64),
                        np.array([0, 0], dtype=np.int64))
    assert np.isnan(out[0])
