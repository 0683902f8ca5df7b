"""Edge tests for pack 14: per-source completeness report and JSON props
stats.  (SQL-twin parity is covered by test_oracle_parity's full
parametrization; these pin the kernels against independent pandas oracles
and the gap/coverage invariants.)"""

import json

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()


# ---------------------------------------------------------------------------
# coverage_report_1m

def test_coverage_matches_tier_oracle(ray_session):
    from thunder_ray.pipelines.queries import rollup_documents_full
    from thunder_ray.pipelines.queries14 import coverage_report_1m

    got = _to_df(coverage_report_1m(SF)).set_index("source")
    tier = _to_df(rollup_documents_full(SF, 60))
    assert len(got) == tier["source"].nunique()
    for src, g in tier.groupby("source"):
        b = np.sort(g["bucket"].to_numpy(np.int64))
        r = got.loc[src]
        span = b[-1] - b[0] + 1
        assert r["first_b"] == b[0] and r["last_b"] == b[-1]
        assert r["present"] == len(b)
        assert r["missing"] == span - len(b)
        assert abs(r["coverage"] - len(b) / span) < 1e-12
        assert r["max_gap"] == (np.diff(b).max() if len(b) > 1 else 0)


def test_coverage_invariants(ray_session):
    from thunder_ray.pipelines.queries14 import coverage_report_1m

    got = _to_df(coverage_report_1m(SF))
    assert (got["coverage"] > 0).all() and (got["coverage"] <= 1).all()
    assert (got["missing"] >= 0).all()
    # a source with no missing buckets has max stride 1 (or 0 if singleton)
    full = got[got["missing"] == 0]
    assert (full["max_gap"] <= 1).all()
    # a gap implies max stride > 1
    gappy = got[got["missing"] > 0]
    assert (gappy["max_gap"] > 1).all()


# ---------------------------------------------------------------------------
# props_k_stats_by_type

def test_props_stats_match_json_oracle(ray_session):
    import pyarrow.parquet as pq

    from thunder_ray.pipelines.queries14 import props_k_stats_by_type

    got = _to_df(props_k_stats_by_type(SF)).set_index("event_type")
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "props"]).to_pandas()
    ev["k"] = ev["props"].map(lambda s: json.loads(s).get("k"))
    ev = ev[ev["k"].notna()]
    ev["k"] = ev["k"].astype(np.int64)
    agg = ev.groupby("event_type")["k"].agg(["count", "sum", "min", "max"])
    assert len(got) == len(agg)
    for et, row in agg.iterrows():
        r = got.loc[et]
        assert r["n"] == row["count"] and r["sk"] == row["sum"]
        assert r["mn"] == row["min"] and r["mx"] == row["max"]
        assert abs(r["mean_k"] - row["sum"] / row["count"]) < 1e-12
