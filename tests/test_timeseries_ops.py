"""Round-3 timeseries engine additions (queries5): the branches the
sf0.01 oracle-parity run does not reach — quantile selection's hot-bin
recursion, and the selection primitive against a numpy sort oracle."""

import math

import numpy as np
import pyarrow.parquet as pq
import pytest

from thunder_ray.pipelines import queries5 as q5

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sorted_values():
    v = pq.read_table(f"{SF_DIR}/events.parquet", columns=["value"])
    return np.sort(v["value"].to_numpy())


def test_quantile_matches_sort_oracle(ray_session, sorted_values):
    out = q5.quantile_events(SF_DIR)
    n = len(sorted_values)
    for p, got in zip(q5.QUANTILE_PS, out["value"].to_numpy()):
        want = sorted_values[math.ceil(p * n) - 1]
        assert got == want, (p, got, want)


def test_quantile_recursion_path(ray_session, sorted_values, monkeypatch):
    """Force the hot-bin recursion (collect threshold below every bin
    population) and assert selection stays exact through multi-level
    12-bit prefix descent."""
    monkeypatch.setattr(q5, "QUANTILE_COLLECT_MAX", 1)
    import ray.data as rd

    ds = rd.read_parquet(f"{SF_DIR}/events.parquet", columns=["value"])
    n = len(sorted_values)
    for rank in (0, n // 2, n - 1):
        got = q5._select_rank(ds, rank)
        assert got == sorted_values[rank], (rank, got)


def test_ordered_u64_is_order_preserving():
    rng = np.random.default_rng(7)
    v = np.concatenate([rng.normal(size=500) * 10.0 ** rng.integers(-3, 3, 500),
                        [0.0, -0.0, 1e-300, -1e-300, 1e300, -1e300]])
    o = q5._ordered_u64(v)
    assert np.array_equal(np.sort(v), v[np.argsort(o, kind="stable")])
