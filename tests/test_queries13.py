"""Edge tests for pack 13: per-hour Fano factor and cohort entry/return
counts.  (SQL-twin parity of all three is covered by test_oracle_parity's
full parametrization; these pin the kernels against independent
NumPy/pandas oracles and the cohort accounting identities.)"""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()


def _hours(ev: pd.DataFrame) -> pd.DataFrame:
    out = ev.copy()
    out["h"] = out["ts"].astype("datetime64[us]").astype(
        np.int64) // 1_000_000 // 3600
    return out


# ---------------------------------------------------------------------------
# fano_factor_1h

def test_fano_matches_numpy(ray_session):
    """fano must equal population variance / mean of the hour's present
    per-minute counts (allclose; bit-exactness vs DuckDB is the parity
    test's job)."""
    from thunder_ray.pipelines.queries import rollup_documents_full
    from thunder_ray.pipelines.queries13 import fano_factor_1h

    got = _to_df(fano_factor_1h(SF)).set_index(["source", "hour"])
    tier = _to_df(rollup_documents_full(SF, 60))
    tier["hour"] = tier["bucket"] // 60
    seen = 0
    for (src, hr), g in tier.groupby(["source", "hour"]):
        c = g["count"].to_numpy(np.float64)
        if len(c) < 2:
            assert (src, hr) not in got.index
            continue
        seen += 1
        expect = c.var() / c.mean()
        assert abs(got.loc[(src, hr), "fano"] - expect) < 1e-9, (src, hr)
        assert got.loc[(src, hr), "n"] == len(c)
        assert got.loc[(src, hr), "scc"] == int(
            (g["count"].to_numpy(np.int64) ** 2).sum())
    assert seen == len(got)


# ---------------------------------------------------------------------------
# cohort counts

def test_cohort_counts_match_pandas_oracle(ray_session):
    import pyarrow.parquet as pq

    from thunder_ray.pipelines.queries13 import (new_users_1h,
                                                 returning_users_1h)

    ev = _hours(pq.read_table(f"{SF}/events.parquet",
                              columns=["ts", "user_id"]).to_pandas())
    first = ev.groupby("user_id")["h"].min()
    new = _to_df(new_users_1h(SF)).set_index("bucket")["new_users"]
    expect_new = first.value_counts().sort_index()
    assert new.sort_index().equals(expect_new.astype(np.int64)
                                   .rename_axis("bucket").rename("new_users"))

    pairs = ev[["user_id", "h"]].drop_duplicates()
    ret_pairs = pairs[pairs["h"] > pairs["user_id"].map(first)]
    expect_ret = ret_pairs.groupby("h").size()
    ret = _to_df(returning_users_1h(SF)).set_index("bucket")[
        "returning_users"].sort_index()
    assert len(ret) == len(expect_ret)
    assert (ret.to_numpy() == expect_ret.to_numpy()).all()


def test_cohort_accounting_identities(ray_session):
    """Sum of new_users over all buckets == total distinct users, and per
    bucket new + returning == distinct active users in that bucket."""
    import pyarrow.parquet as pq

    from thunder_ray.pipelines.queries13 import (new_users_1h,
                                                 returning_users_1h)

    ev = _hours(pq.read_table(f"{SF}/events.parquet",
                              columns=["ts", "user_id"]).to_pandas())
    new = _to_df(new_users_1h(SF)).set_index("bucket")["new_users"]
    ret = _to_df(returning_users_1h(SF)).set_index("bucket")[
        "returning_users"]
    assert new.sum() == ev["user_id"].nunique()
    active = ev[["user_id", "h"]].drop_duplicates().groupby("h").size()
    combined = new.reindex(active.index, fill_value=0).to_numpy() + \
        ret.reindex(active.index, fill_value=0).to_numpy()
    assert (combined == active.to_numpy()).all()
