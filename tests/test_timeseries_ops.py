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


def test_sessionize_exact_under_adversarial_batching(ray_session, tmp_path):
    """Shuffled row order + batch_size=5 makes same-user fragments from
    different batches overlap and interleave in time — the running-max
    chain-merge lemma must still give exact sessions."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pqw

    from thunder_ray.pipelines.queries4 import sessionize_events

    rng = np.random.default_rng(11)
    timeout = 1000
    rows = []
    for uid in range(1, 8):
        t = 0
        for _ in range(rng.integers(5, 40)):
            t += int(rng.integers(1, 3 * timeout))
            rows.append((uid, t))
    rng.shuffle(rows)
    uid = np.array([r[0] for r in rows], dtype=np.int64)
    ts = np.array([r[1] for r in rows], dtype="datetime64[us]")
    pqw.write_table(pa.table({"user_id": uid, "ts": pa.array(ts)}),
                    str(tmp_path / "events.parquet"))

    got = sessionize_events(str(tmp_path), timeout_us=timeout,
                            batch_size=5).to_pandas()
    got = got.sort_values(["user_id", "session_id"]).reset_index(drop=True)

    want_rows = []
    df = pd.DataFrame({"user_id": uid, "t": ts.astype(np.int64)})
    for u, g in df.groupby("user_id"):
        t = np.sort(g["t"].to_numpy())
        new = np.empty(len(t), dtype=bool)
        new[0] = True
        new[1:] = (t[1:] - t[:-1]) > timeout
        starts = np.flatnonzero(new)
        bounds = np.append(starts, len(t))
        for i, s in enumerate(starts):
            want_rows.append((u, i + 1, t[s], t[bounds[i + 1] - 1],
                              bounds[i + 1] - s))
    want = pd.DataFrame(want_rows, columns=[
        "user_id", "session_id", "session_start_us", "session_end_us",
        "n_events"])
    pd.testing.assert_frame_equal(got[want.columns].astype(np.int64),
                                  want.astype(np.int64))


def test_ordered_u64_is_order_preserving():
    rng = np.random.default_rng(7)
    v = np.concatenate([rng.normal(size=500) * 10.0 ** rng.integers(-3, 3, 500),
                        [0.0, -0.0, 1e-300, -1e-300, 1e300, -1e300]])
    o = q5._ordered_u64(v)
    assert np.array_equal(np.sort(v), v[np.argsort(o, kind="stable")])
