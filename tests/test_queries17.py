"""Edge tests for pack 17: retention cohort matrix and churn-day counts.
(SQL-twin parity is covered by test_oracle_parity's full parametrization;
these pin the kernels against independent pandas oracles and the cohort
identities.)"""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
_DAY_US = 86_400_000_000


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()


def _pairs() -> pd.DataFrame:
    import pyarrow.parquet as pq

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "user_id"]).to_pandas()
    ev["day"] = ev["ts"].astype("datetime64[us]").astype(
        np.int64) // _DAY_US
    return ev[["user_id", "day"]].drop_duplicates()


def test_retention_matches_pandas_oracle(ray_session):
    from thunder_ray.pipelines.queries17 import (RETENTION_DAYS,
                                                 retention_curve_1d)

    got = _to_df(retention_curve_1d(SF)).set_index(["cohort_day", "k"])[
        "users"]
    p = _pairs()
    first = p.groupby("user_id")["day"].min()
    p = p.assign(fh=p["user_id"].map(first), k=lambda x: x["day"] - x["fh"])
    p = p[p["k"] <= RETENTION_DAYS]
    expect = p.groupby(["fh", "k"]).size()
    assert len(got) == len(expect)
    for key, v in expect.items():
        assert got.loc[key] == v, key
    # identity: the k=0 row of each cohort is the cohort size
    sizes = first.value_counts()
    for fh, sz in sizes.items():
        assert got.loc[(fh, 0)] == sz
    # retention never exceeds the cohort size
    df = got.reset_index()
    for fh, g in df.groupby("cohort_day"):
        assert (g["users"] <= sizes[fh]).all()


def test_churn_matches_pandas_oracle(ray_session):
    from thunder_ray.pipelines.queries17 import CHURN_GAP, churn_1d

    got = _to_df(churn_1d(SF)).set_index("bucket")["churned_users"]
    p = _pairs().sort_values(["user_id", "day"])
    p["nxt"] = p.groupby("user_id")["day"].shift(-1)
    churned = p[p["nxt"].isna() | (p["nxt"] - p["day"] > CHURN_GAP)]
    expect = churned.groupby("day").size()
    assert len(got) == len(expect)
    for d, v in expect.items():
        assert got.loc[d] == v, d
    # every user churns at least once (their last active day)
    assert got.sum() >= p["user_id"].nunique()
