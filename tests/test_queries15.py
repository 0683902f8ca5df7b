"""Edge tests for pack 15: per-day event-type transitions and per-type
inter-arrival stats.  (SQL-twin parity is covered by test_oracle_parity's
full parametrization; these pin the kernels against independent pandas
oracles and the day-window / tie-break contracts.)"""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
_DAY_US = 86_400_000_000


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()


def _ev() -> pd.DataFrame:
    import pyarrow.parquet as pq

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "event_id", "user_id",
                                "event_type"]).to_pandas()
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    ev["day"] = ev["ts_us"] // _DAY_US
    return ev


def test_transitions_match_pandas_oracle(ray_session):
    from thunder_ray.pipelines.queries15 import event_transitions_1d

    got = _to_df(event_transitions_1d(SF)).set_index(
        ["prev_type", "next_type"])["cnt"]
    ev = _ev().sort_values(["user_id", "day", "ts_us", "event_id"])
    prev = ev.groupby(["user_id", "day"])["event_type"].shift(1)
    mask = prev.notna()
    expect = pd.DataFrame({"prev_type": prev[mask],
                           "next_type": ev["event_type"][mask]}).groupby(
        ["prev_type", "next_type"]).size()
    assert len(got) == len(expect)
    for k, v in expect.items():
        assert got.loc[k] == v, k
    # total transitions = sum over shards of (len - 1)
    sizes = ev.groupby(["user_id", "day"]).size()
    assert got.sum() == (sizes - 1).clip(lower=0).sum()


def test_inter_arrival_matches_pandas_oracle(ray_session):
    from thunder_ray.pipelines.queries15 import inter_arrival_1d

    got = _to_df(inter_arrival_1d(SF)).set_index(["event_type", "day"])
    ev = _ev().sort_values(["event_type", "day", "ts_us", "event_id"])
    seen = 0
    for (et, day), g in ev.groupby(["event_type", "day"]):
        gaps = np.diff(g["ts_us"].to_numpy(np.int64))
        if len(gaps) == 0:
            assert (et, day) not in got.index
            continue
        seen += 1
        r = got.loc[(et, day)]
        assert r["n"] == len(gaps) and r["sg"] == gaps.sum()
        assert r["mn"] == gaps.min() and r["mx"] == gaps.max()
        assert abs(r["mean_gap"] - gaps.sum() / len(gaps)) < 1e-9
        assert r["mn"] >= 0  # same-day ordering never yields negative gaps
    assert seen == len(got)
