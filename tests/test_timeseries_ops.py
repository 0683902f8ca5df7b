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


# ---------------------------------------------------------------------------
# queries6: counter increase / heatmap / dyadic EWMA edge branches


def _write_events(tmp_path, ts_us, event_type, value, event_id=None):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pqw

    n = len(ts_us)
    if event_id is None:
        event_id = np.arange(n, dtype=np.int64)
    pqw.write_table(pa.table({
        "event_id": pa.array(np.asarray(event_id, dtype=np.int64)),
        "ts": pa.array(np.asarray(ts_us, dtype="datetime64[us]")),
        "event_type": pa.array(list(event_type), type=pa.string()),
        "value": pa.array(np.asarray(value, dtype=np.float64)),
    }), str(tmp_path / "events.parquet"))


def _counter_oracle(ts_us, et, value, eid):
    """Straight-line LAG-diff oracle on scaled ints."""
    import pandas as pd

    df = pd.DataFrame({
        "et": et, "ts": np.asarray(ts_us, np.int64),
        "eid": np.asarray(eid, np.int64),
        "sv": np.floor(np.asarray(value) * 1e6).astype(np.int64),
    }).sort_values(["et", "ts", "eid"]).reset_index(drop=True)
    prev = df.groupby("et")["sv"].shift(1)
    inc = np.where(prev.isna(), 0,
                   np.where(df["sv"] >= prev, df["sv"] - prev.fillna(0),
                            df["sv"])).astype(np.int64)
    df["bucket"] = df["ts"] // 1_000_000 // 3600
    df["inc"] = inc
    out = df.groupby(["et", "bucket"]).agg(
        increase_scaled=("inc", "sum"), n=("inc", "size")).reset_index()
    return out.rename(columns={"et": "event_type"})


def test_counter_increase_carry_hops_day_gaps(ray_session, tmp_path):
    """A key sampled on day 0 and day 5 only: the day-5 shard's carry must
    come from day 0 (previous EXISTING day), not day 4; resets (value drop)
    inside and across shards; duplicate timestamps tie-broken by event_id."""
    import pandas as pd

    from thunder_ray.pipelines.queries6 import counter_increase_1h

    day = 86_400_000_000
    ts, et, val, eid = [], [], [], []
    # key A: day 0 rising, then day 5 continues higher, then resets
    for t, v in [(100, 1.0), (3600_000_100, 2.5), (5 * day, 9.0),
                 (5 * day + 10, 0.5), (5 * day + 20, 1.5)]:
        ts.append(t), et.append("A"), val.append(v), eid.append(len(eid))
    # key B: duplicate timestamps, order decided by event_id; reset at eid 7
    for t, v in [(50, 10.0), (50, 11.0), (50, 3.0), (7200_000_000, 4.0)]:
        ts.append(t), et.append("B"), val.append(v), eid.append(len(eid))
    _write_events(tmp_path, ts, et, val, eid)

    got = counter_increase_1h(str(tmp_path)).to_pandas().sort_values(
        ["event_type", "bucket"]).reset_index(drop=True)
    want = _counter_oracle(ts, et, val, eid).sort_values(
        ["event_type", "bucket"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["event_type", "bucket", "increase_scaled", "n"]],
        want[["event_type", "bucket", "increase_scaled", "n"]],
        check_dtype=False)


def test_heatmap_negative_value_bins(ray_session, tmp_path):
    """Negative values exercise the signed vbin pack (offset encoding)."""
    import pandas as pd

    from thunder_ray.pipelines.queries6 import heatmap_events

    rng = np.random.default_rng(3)
    n = 1000
    ts = rng.integers(0, 10 * 3600, n) * 1_000_000
    val = rng.normal(0.0, 60.0, n)
    _write_events(tmp_path, ts, ["x"] * n, val)

    got = heatmap_events(str(tmp_path)).to_pandas().sort_values(
        ["bucket", "vbin"]).reset_index(drop=True)
    df = pd.DataFrame({"bucket": ts // 1_000_000 // 3600,
                       "vbin": np.floor(val / 25.0).astype(np.int64)})
    want = df.groupby(["bucket", "vbin"]).size().rename("cnt").reset_index()
    want = want.sort_values(["bucket", "vbin"]).reset_index(drop=True)
    assert (got["vbin"] < 0).any(), "fixture must produce negative bins"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_ewma_horizon_truncation(ray_session, tmp_path):
    """Docs longer than the horizon: only the last `horizon` tokens
    contribute; short docs use all tokens.  Oracle = explicit term sum."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pqw

    from thunder_ray.pipelines.queries6 import EWMA_HORIZON, ewma_tokens

    texts = ["a bb ccc", " ".join("w" * ((i % 7) + 1) for i in range(100)),
             "", "dddd"]
    pqw.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
        "source": pa.array(["s"] * len(texts), type=pa.string()),
    }), str(tmp_path / "documents.parquet"))

    got = ewma_tokens(str(tmp_path)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    for i, text in enumerate(texts):
        toks = [len(w) for w in text.split(" ")]
        m = min(len(toks), EWMA_HORIZON)
        want = sum(toks[-1 - k] * 2.0 ** -(k + 1) for k in range(m))
        assert got.loc[i, "n_used"] == m
        assert got.loc[i, "ewma"] == want, (i, got.loc[i, "ewma"], want)


def test_m4_exact_under_adversarial_batching(ray_session, tmp_path):
    """batch_size=7 over shuffled rows: every pixel cell's rows land in many
    batches, so first/last/min/max candidates must merge exactly; duplicate
    timestamps tie-broken by event_id on both sides."""
    import pandas as pd

    from thunder_ray.pipelines.queries6 import m4_downsample_events

    rng = np.random.default_rng(5)
    n = 500
    ts = rng.integers(0, 3 * 600, n) * 1_000_000  # 3 pixel buckets, many ties
    et = rng.choice(["a", "b"], n)
    val = rng.uniform(-50, 50, n)
    eid = rng.permutation(n)
    _write_events(tmp_path, ts, et, val, eid)

    got = m4_downsample_events(str(tmp_path), batch_size=7).to_pandas()
    got = got.sort_values(["event_type", "bucket"]).reset_index(drop=True)

    df = pd.DataFrame({"et": et, "ts": np.asarray(ts, np.int64), "eid": eid,
                       "sv": np.floor(val * 1e6).astype(np.int64)})
    df["bucket"] = df["ts"] // 1_000_000 // 600
    df = df.sort_values(["et", "bucket", "ts", "eid"])
    want = df.groupby(["et", "bucket"]).agg(
        first_sv=("sv", "first"), last_sv=("sv", "last"),
        min_sv=("sv", "min"), max_sv=("sv", "max")).reset_index().rename(
        columns={"et": "event_type"})
    pd.testing.assert_frame_equal(
        got[["event_type", "bucket", "first_sv", "last_sv", "min_sv",
             "max_sv"]].astype({"bucket": np.int64}),
        want[["event_type", "bucket", "first_sv", "last_sv", "min_sv",
              "max_sv"]].astype({"bucket": np.int64}), check_dtype=False)


def test_counter_increase_exact_under_adversarial_batching(ray_session,
                                                           tmp_path):
    """Shuffled rows + batch_size=5: each (key, day)'s last-sample
    candidates come from many batches and the carry map must still pick the
    true previous-existing-day last sample."""
    import pandas as pd

    from thunder_ray.pipelines.queries6 import counter_increase_1h

    rng = np.random.default_rng(17)
    day = 86_400_000_000
    n = 300
    ts = (rng.integers(0, 6, n) * day
          + rng.integers(0, 86_400, n) * 1_000_000)
    et = rng.choice(["A", "B", "C"], n)
    val = rng.uniform(0, 100, n)
    eid = rng.permutation(n)
    order = rng.permutation(n)
    _write_events(tmp_path, ts[order], et[order], val[order], eid[order])

    got = counter_increase_1h(str(tmp_path), batch_size=5).to_pandas()
    got = got.sort_values(["event_type", "bucket"]).reset_index(drop=True)
    want = _counter_oracle(ts, et, val, eid).sort_values(
        ["event_type", "bucket"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["event_type", "bucket", "increase_scaled", "n"]],
        want[["event_type", "bucket", "increase_scaled", "n"]],
        check_dtype=False)


def test_ewma_exact_on_sliced_list_batches(ray_session, tmp_path):
    """batch_size=3 makes Ray slice the tokens list column (absolute
    offsets, offs[0] > 0) — the kernel's _flat/positions normalization must
    keep values and ages aligned."""
    import pyarrow as pa
    import pyarrow.parquet as pqw

    from thunder_ray.pipelines.queries6 import EWMA_HORIZON, ewma_tokens

    rng = np.random.default_rng(23)
    texts = [" ".join("w" * int(rng.integers(1, 9))
                      for _ in range(int(rng.integers(1, 50))))
             for _ in range(20)]
    pqw.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
        "source": pa.array(["s"] * len(texts), type=pa.string()),
    }), str(tmp_path / "documents.parquet"))

    got = ewma_tokens(str(tmp_path), batch_size=3).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    for i, text in enumerate(texts):
        toks = [len(w) for w in text.split(" ")]
        m = min(len(toks), EWMA_HORIZON)
        want = sum(toks[-1 - k] * 2.0 ** -(k + 1) for k in range(m))
        assert got.loc[i, "ewma"] == want, (i, got.loc[i, "ewma"], want)
        assert got.loc[i, "n_used"] == m


def test_quantile_by_key_recursion_path(ray_session, monkeypatch):
    """Collect threshold 1 forces every rank into the per-key hot-cell
    recursion fallback; selection must stay exact vs the numpy sort oracle."""
    import math

    import pyarrow.parquet as pqr

    monkeypatch.setattr(q5, "QUANTILE_COLLECT_MAX", 1)
    from thunder_ray.pipelines.queries6 import quantile_by_key_events

    got = quantile_by_key_events(SF_DIR)
    t = pqr.read_table(f"{SF_DIR}/events.parquet",
                       columns=["event_type", "value"])
    et = t["event_type"].to_numpy(zero_copy_only=False)
    v = t["value"].to_numpy()
    for _, row in got.iterrows():
        vals = np.sort(v[et == row["event_type"]])
        p = {"p50": 0.5, "p90": 0.9, "p99": 0.99}[row["q"]]
        want = vals[math.ceil(p * len(vals)) - 1]
        assert row["value"] == want, (row["event_type"], row["q"])


def test_seasonal_hod_rejects_pre_epoch(ray_session, tmp_path):
    """Negative epoch-us would make numpy's floored % give hod in [0,24)
    while the SQL twin's truncated % goes negative — the kernel must refuse
    loudly like its queries6 siblings (ADVICE r3)."""
    import ray

    from thunder_ray.pipelines.queries6 import seasonal_hod_events

    _write_events(tmp_path,
                  np.array([-3_600_000_000, 7_200_000_000], dtype=np.int64),
                  ["a", "a"], [1.0, 2.0])
    with pytest.raises(ray.exceptions.RayTaskError, match="pre-epoch"):
        seasonal_hod_events(str(tmp_path)).to_pandas()
