"""Edge tests for pack 16: same-day funnel conversion and DAU/WAU
stickiness.  (SQL-twin parity is covered by test_oracle_parity's full
parametrization; these pin the kernels against independent pandas oracles
and the ordering / window contracts.)"""

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


def test_funnel_matches_pandas_oracle(ray_session):
    from thunder_ray.pipelines.queries16 import (FUNNEL_A, FUNNEL_B,
                                                 funnel_view_purchase_1d)

    got = _to_df(funnel_view_purchase_1d(SF)).set_index("bucket")[
        "converted_users"]
    ev = _ev()
    expect = {}
    for (u, d), g in ev.groupby(["user_id", "day"]):
        a = g[g["event_type"] == FUNNEL_A]
        b = g[g["event_type"] == FUNNEL_B]
        if len(a) == 0 or len(b) == 0:
            continue
        amin = tuple(a.sort_values(["ts_us", "event_id"]).iloc[0][
            ["ts_us", "event_id"]])
        bmax = tuple(b.sort_values(["ts_us", "event_id"]).iloc[-1][
            ["ts_us", "event_id"]])
        if amin < bmax:
            expect[d] = expect.get(d, 0) + 1
    assert dict(got) == expect
    assert len(expect) > 0  # fixture genuinely exercises the funnel


def test_stickiness_matches_pandas_oracle(ray_session):
    from thunder_ray.pipelines.queries16 import stickiness_7d

    got = _to_df(stickiness_7d(SF)).set_index("bucket")
    p = _ev()[["user_id", "day"]].drop_duplicates()
    days = np.sort(p["day"].unique())
    assert len(got) == len(days)
    for d in days:
        dau = p[p["day"] == d]["user_id"].nunique()
        wau = p[(p["day"] >= d - 6) & (p["day"] <= d)]["user_id"].nunique()
        r = got.loc[d]
        assert r["dau"] == dau and r["wau"] == wau, d
        assert abs(r["stickiness"] - dau / wau) < 1e-12
    # invariants: dau <= wau, stickiness in (0, 1]
    assert (got["dau"] <= got["wau"]).all()
    assert (got["stickiness"] > 0).all() and (got["stickiness"] <= 1).all()
