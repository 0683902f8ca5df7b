"""Edge tests for pack 11: per-hour OLS derivative, RANGE-framed trailing
mean, and interpolated histogram quantile.  (SQL-twin parity of all three is
covered by test_oracle_parity's full parametrization; these pin the kernels
against independent NumPy oracles and the framing semantics.)"""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()


# ---------------------------------------------------------------------------
# deriv_slope_1h

def test_deriv_matches_polyfit(ray_session):
    """slope must equal np.polyfit degree-1 over (t, y) per (source, hour)
    (allclose: polyfit associates the float ops differently — bit-exactness
    vs DuckDB's identical expression is the parity test's job)."""
    from thunder_ray.pipelines.queries import rollup_documents_full
    from thunder_ray.pipelines.queries11 import deriv_slope_1h

    got = _to_df(deriv_slope_1h(SF)).set_index(["source", "hour"])
    tier = _to_df(rollup_documents_full(SF, 60))
    tier["hour"] = tier["bucket"] // 60
    tier["t"] = tier["bucket"] % 60
    assert len(got) > 0
    seen = 0
    for (src, hr), g in tier.groupby(["source", "hour"]):
        if len(g) < 2:
            assert (src, hr) not in got.index
            continue
        seen += 1
        expect = np.polyfit(g["t"].to_numpy(np.float64),
                            g["sum"].to_numpy(np.float64), 1)[0]
        assert abs(got.loc[(src, hr), "slope"] - expect) < 1e-6, (src, hr)
        assert got.loc[(src, hr), "n"] == len(g)
        assert got.loc[(src, hr), "sty"] == int(
            (g["t"].to_numpy(np.int64) * g["sum"].to_numpy(np.int64)).sum())
    assert seen == len(got)


def test_deriv_single_point_hours_excluded(ray_session):
    from thunder_ray.pipelines.queries11 import deriv_slope_1h

    got = _to_df(deriv_slope_1h(SF))
    assert (got["n"] >= 2).all()
    assert not got["slope"].isna().any()
    assert np.isfinite(got["slope"].to_numpy(np.float64)).all()


# ---------------------------------------------------------------------------
# range_mean_1m

def test_range_mean_matches_value_window_oracle(ray_session):
    """Per row: wsum/wcount must equal the sums over rows whose bucket lies
    in [b - (W-1), b] — computed here by brute force per source."""
    from thunder_ray.pipelines.queries import rollup_documents
    from thunder_ray.pipelines.queries11 import RANGE_WINDOW, range_mean_1m

    got = _to_df(range_mean_1m(SF)).set_index(["source", "bucket"])
    tier = _to_df(rollup_documents(SF, 60))
    assert len(got) == len(tier)
    for src, g in tier.groupby("source"):
        b = g["bucket"].to_numpy(np.int64)
        s = g["sum"].to_numpy(np.int64)
        c = g["count"].to_numpy(np.int64)
        for i in range(len(b)):
            m = (b >= b[i] - (RANGE_WINDOW - 1)) & (b <= b[i])
            row = got.loc[(src, b[i])]
            assert row["wsum"] == s[m].sum(), (src, b[i])
            assert row["wcount"] == c[m].sum(), (src, b[i])


def test_range_frame_shrinks_at_gaps(ray_session):
    """Where the series has a gap wider than the window, the RANGE frame
    must NOT reach across it (the ROWS frame would) — the testdata tier has
    such gaps, so at least one window must hold only its own row."""
    from thunder_ray.pipelines.queries import rollup_documents
    from thunder_ray.pipelines.queries11 import RANGE_WINDOW, range_mean_1m

    got = _to_df(range_mean_1m(SF))
    tier = _to_df(rollup_documents(SF, 60))
    gap_rows = 0
    for src, g in tier.groupby("source"):
        b = np.sort(g["bucket"].to_numpy(np.int64))
        after_gap = b[np.r_[True, np.diff(b) > RANGE_WINDOW - 1]]
        gap_rows += len(after_gap)
        sel = got[(got["source"] == src)
                  & got["bucket"].isin(after_gap)]
        own = g.set_index("bucket")
        for _, r in sel.iterrows():
            assert r["wsum"] == own.loc[r["bucket"], "sum"]
            assert r["wcount"] == own.loc[r["bucket"], "count"]
    assert gap_rows > 0  # the fixture genuinely exercises the gap path


def test_range_mean_sharding_invariant(ray_session):
    """A tiny day-shard scatters every window across shard boundaries; the
    carry machinery must keep the output bit-identical."""
    from thunder_ray.pipelines.queries11 import range_mean_1m

    a = _to_df(range_mean_1m(SF)).sort_values(
        ["source", "bucket"]).reset_index(drop=True)
    b = _to_df(range_mean_1m(SF, shard=8)).sort_values(
        ["source", "bucket"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# histogram_p90_events

def test_histogram_p90_brackets_exact_quantile(ray_session):
    """The interpolated quantile must land inside the bin that contains the
    exact 0.9-quantile of the raw values, and within one bin width of the
    exact empirical quantile."""
    import pyarrow.parquet as pq

    from thunder_ray.pipelines.queries11 import (HEATMAP_VBIN_WIDTH,
                                                 histogram_p90_events)

    got = _to_df(histogram_p90_events(SF)).set_index("bucket")
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "value"]).to_pandas()
    ev["bucket"] = ev["ts"].astype("datetime64[us]").astype(
        np.int64) // 1_000_000 // 3600
    assert len(got) == ev["bucket"].nunique()
    w = HEATMAP_VBIN_WIDTH
    for bk, g in ev.groupby("bucket"):
        v = np.sort(g["value"].to_numpy(np.float64))
        row = got.loc[bk]
        lo = row["vbin"] * w
        assert lo <= row["p90"] <= lo + w, bk
        # exact empirical quantile (inverse-CDF) lives in the same bin
        exact = v[int(np.ceil(0.9 * len(v))) - 1]
        assert abs(row["p90"] - exact) <= w, bk
        assert row["total"] == len(v)


def test_histogram_p90_cum_is_crossing_bin(ray_session):
    """cum must be the FIRST cumulative count reaching 0.9 * total."""
    from thunder_ray.pipelines.queries11 import histogram_p90_events

    got = _to_df(histogram_p90_events(SF))
    cum = got["cum"].to_numpy(np.int64)
    cnt = got["cnt"].to_numpy(np.int64)
    total = got["total"].to_numpy(np.int64)
    rk = total.astype(np.float64) * 0.9
    assert (cum.astype(np.float64) >= rk).all()
    assert ((cum - cnt).astype(np.float64) < rk).all()
