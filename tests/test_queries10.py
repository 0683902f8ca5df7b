"""Edge tests for pack 10: lag-1 autocorrelation over the 1m tier and
distributed per-key top-k.  (SQL-twin parity of both queries is covered by
test_oracle_parity's full parametrization; these pin the kernels against
independent NumPy oracles and the combiner's candidate-bound contract.)"""

import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()


# ---------------------------------------------------------------------------
# autocorr_lag1_1m

def test_autocorr_matches_numpy_corrcoef(ray_session):
    """r must equal np.corrcoef of adjacent rolled-point sums (allclose:
    corrcoef associates the float ops differently, so bits may differ —
    bit-exactness vs DuckDB's identical expression is the parity test's
    job)."""
    from thunder_ray.pipelines.queries import rollup_documents_full
    from thunder_ray.pipelines.queries10 import autocorr_lag1_1m

    got = _to_df(autocorr_lag1_1m(SF)).set_index("source")
    tier = _to_df(rollup_documents_full(SF, 60))
    assert len(got) > 0
    for src, g in tier.groupby("source"):
        x = g.sort_values("bucket")["sum"].to_numpy(np.float64)
        if len(x) < 3 or np.ptp(x[:-1]) == 0 or np.ptp(x[1:]) == 0:
            assert src not in got.index
            continue
        expect = np.corrcoef(x[:-1], x[1:])[0, 1]
        assert abs(got.loc[src, "r"] - expect) < 1e-9, src
        # sufficient statistics are exact ints
        assert got.loc[src, "m"] == len(x) - 1
        assert got.loc[src, "sxy"] == int(
            (x[:-1].astype(np.int64) * x[1:].astype(np.int64)).sum())


def test_autocorr_constant_series_excluded(ray_session):
    """A zero-variance head or tail series has no defined r — the group
    must be absent, not NaN (the SQL twin's WHERE does the same)."""
    from thunder_ray.pipelines.queries10 import autocorr_lag1_1m

    got = _to_df(autocorr_lag1_1m(SF))
    assert not got["r"].isna().any()
    assert (got["m"] >= 2).all()


# ---------------------------------------------------------------------------
# topk_docs_per_source

def test_topk_matches_full_sort_oracle(ray_session):
    from thunder_ray.pipelines.queries10 import TOPK_K, topk_docs_per_source
    from thunder_ray.sources.tokens import tokens_from_documents

    got = _to_df(topk_docs_per_source(SF)).sort_values(
        ["source", "rnk"]).reset_index(drop=True)
    full = _to_df(tokens_from_documents(SF).select_columns(
        ["source", "n_tok", "doc_id_int"]))
    expect = []
    for src, g in full.groupby("source"):
        g = g.sort_values(["n_tok", "doc_id_int"],
                          ascending=[False, True]).head(TOPK_K)
        for i, (_, row) in enumerate(g.iterrows(), 1):
            expect.append((src, int(row["doc_id_int"]),
                           int(row["n_tok"]), i))
    exp = pd.DataFrame(expect, columns=["source", "doc_id", "n_tok", "rnk"])
    exp = exp.sort_values(["source", "rnk"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["source", "doc_id", "n_tok", "rnk"]].astype(
            {"doc_id": np.int64, "n_tok": np.int64, "rnk": np.int64}),
        exp.astype({"doc_id": np.int64, "n_tok": np.int64,
                    "rnk": np.int64}))


def test_topk_combiner_candidate_bound_and_ties(ray_session):
    """The per-batch combiner emits at most k rows per source, and breaks
    n_tok ties on ascending doc_id — the contract that makes the keyed
    merge candidate-scale and the ranks deterministic."""
    from thunder_ray.pipelines.queries10 import _partial_topk

    batch = pa.table({
        "source": pa.array(["a"] * 5 + ["b"] * 2),
        "n_tok": pa.array([7, 7, 7, 2, 9, 4, 4], type=pa.int32()),
        "doc_id_int": pa.array([30, 10, 20, 1, 2, 6, 5], type=pa.int64()),
    })
    out = _partial_topk(batch, 3).to_pandas()
    a = out[out["source"] == "a"]
    assert len(a) == 3
    # 9 first, then the 7-tie resolved by doc_id ascending: 10 before 20
    assert a["doc_id"].tolist() == [2, 10, 20]
    b = out[out["source"] == "b"]
    assert b["doc_id"].tolist() == [5, 6]


def test_topk_batch_size_invariance(ray_session):
    """Candidate merge must give identical output whatever the block
    layout — rerun with tiny batches via a manual combiner pipeline."""
    from thunder_ray.pipelines.queries10 import _partial_topk
    from thunder_ray.sources.tokens import tokens_from_documents

    full = _to_df(tokens_from_documents(SF).select_columns(
        ["source", "n_tok", "doc_id_int"]))
    tbl = pa.Table.from_pandas(full, preserve_index=False)
    whole = _partial_topk(tbl, 5).to_pandas()
    parts = [_partial_topk(tbl.slice(i, 7), 5).to_pandas()
             for i in range(0, len(tbl), 7)]
    cand = pd.concat(parts, ignore_index=True)

    def finish(df):
        return (df.sort_values(["source", "n_tok", "doc_id"],
                               ascending=[True, False, True])
                .groupby("source").head(5).reset_index(drop=True))

    pd.testing.assert_frame_equal(finish(whole), finish(cand))
