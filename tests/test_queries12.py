"""Edge tests for pack 12: candidate-bounded correlation matrix, PAA+SAX
symbolization, and frequency-rank scoring.  (SQL-twin parity of all three
is covered by test_oracle_parity's full parametrization; these pin the
kernels against independent NumPy/pandas oracles and the candidate-set /
segmentation contracts.)"""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()


# ---------------------------------------------------------------------------
# corr_matrix_topk_1m

def test_corr_matrix_matches_corrcoef(ray_session):
    """r per pair must equal np.corrcoef over the inner-joined bucket
    vectors (allclose; bit-exactness vs DuckDB is the parity test's job),
    and the pair set must be exactly the top-k-by-activity candidates."""
    from thunder_ray.pipelines.queries import rollup_documents_full
    from thunder_ray.pipelines.queries12 import CORR_TOPK, corr_matrix_topk_1m

    got = _to_df(corr_matrix_topk_1m(SF))
    tier = _to_df(rollup_documents_full(SF, 60))
    act = tier.groupby("source")["count"].sum().reset_index()
    act = act.sort_values(["count", "source"],
                          ascending=[False, True]).head(CORR_TOPK)
    keys = sorted(act["source"])
    assert set(got["s1"]) | set(got["s2"]) <= set(keys)
    assert (got["s1"] < got["s2"]).all()
    by_src = {s: g.set_index("bucket")["sum"] for s, g in tier.groupby("source")}
    n_checked = 0
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            shared = by_src[a].index.intersection(by_src[b].index)
            x = by_src[a].loc[shared].to_numpy(np.float64)
            y = by_src[b].loc[shared].to_numpy(np.float64)
            sel = got[(got["s1"] == a) & (got["s2"] == b)]
            if len(shared) < 2 or np.ptp(x) == 0 or np.ptp(y) == 0:
                assert len(sel) == 0, (a, b)
                continue
            assert len(sel) == 1, (a, b)
            expect = np.corrcoef(x, y)[0, 1]
            assert abs(sel["r"].iloc[0] - expect) < 1e-9, (a, b)
            assert sel["n"].iloc[0] == len(shared)
            n_checked += 1
    assert n_checked == len(got)


# ---------------------------------------------------------------------------
# sax_symbols_tokens

def _naive_sax(tokens, S, breaks):
    n = len(tokens)
    if n < S:
        return None
    v = np.asarray(tokens, dtype=np.float64)
    fn = np.float64(n)
    mu = v.sum() / fn  # not the fixed expression — allclose oracle only
    vr = (fn * (v * v).sum() - v.sum() * v.sum()) / (fn * fn)
    if vr <= 0:
        return None
    sd = np.sqrt(vr)
    segs = []
    for k in range(S):
        mask = (np.arange(n) * S) // n == k
        paa = v[mask].mean()
        z = (paa - mu) / sd
        sym = int(z >= breaks[0]) + int(z >= breaks[1]) + int(z >= breaks[2])
        segs.append((k, int(mask.sum()), int(v[mask].sum()), paa, sym))
    return segs


def test_sax_matches_naive_oracle(ray_session):
    from thunder_ray.sources.tokens import tokens_from_documents
    from thunder_ray.pipelines.queries12 import (SAX_BREAKS, SAX_SEGMENTS,
                                                 sax_symbols_tokens)

    got = _to_df(sax_symbols_tokens(SF))
    toks = tokens_from_documents(SF).select_columns(
        ["doc_id_int", "tokens"]).to_pandas()
    assert len(got) > 0
    by_doc = dict(list(got.groupby("doc_id")))
    n_live = 0
    for _, row in toks.iterrows():
        expect = _naive_sax(row["tokens"], SAX_SEGMENTS, SAX_BREAKS)
        did = row["doc_id_int"]
        if expect is None:
            assert did not in by_doc, did
            continue
        n_live += 1
        g = by_doc[did].sort_values("seg")
        assert len(g) == SAX_SEGMENTS
        for (k, seg_n, seg_sum, paa, sym), (_, r) in zip(expect, g.iterrows()):
            assert r["seg"] == k and r["seg_n"] == seg_n
            assert r["seg_sum"] == seg_sum
            assert abs(r["paa"] - paa) < 1e-9
            assert r["sym"] == sym, (did, k)
    assert n_live == got["doc_id"].nunique()
    assert set(got["sym"]) <= {0, 1, 2, 3}


def test_sax_batching_invariance(ray_session):
    """Tiny batches slice the list column mid-buffer — the gather/reduceat
    kernel must be bit-invariant (absolute-offset discipline)."""
    from thunder_ray.pipelines.queries12 import sax_symbols_tokens

    a = _to_df(sax_symbols_tokens(SF)).sort_values(
        ["doc_id", "seg"]).reset_index(drop=True)
    b = _to_df(sax_symbols_tokens(SF, batch_size=7)).sort_values(
        ["doc_id", "seg"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# freq_rank_score_documents

def test_freq_rank_matches_pandas_oracle(ray_session):
    import pyarrow.parquet as pq

    from thunder_ray.pipelines.queries12 import freq_rank_score_documents

    got = _to_df(freq_rank_score_documents(SF)).set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    words = docs["text"].str.split(" ")
    flat = pd.DataFrame({
        "doc_id": np.repeat(docs["doc_id"].to_numpy(np.int64),
                            words.str.len().to_numpy(np.int64)),
        "word": np.concatenate(words.to_numpy()),
    })
    counts = flat.groupby("word").size().reset_index(name="c")
    counts = counts.sort_values(["c", "word"], ascending=[False, True])
    counts["rnk"] = np.arange(1, len(counts) + 1, dtype=np.int64)
    merged = flat.merge(counts[["word", "rnk"]], on="word")
    agg = merged.groupby("doc_id")["rnk"].agg(["count", "sum"])
    assert len(got) == len(docs)
    for did, row in agg.iterrows():
        r = got.loc[did]
        assert r["n_words"] == row["count"], did
        assert r["rank_sum"] == row["sum"], did
        assert abs(r["score"] - row["sum"] / row["count"]) < 1e-12


def test_freq_rank_most_common_words_score_low(ray_session):
    """Sanity: the doc scores order by mean rank — min score doc must use
    more common words on average than the max score doc."""
    from thunder_ray.pipelines.queries12 import freq_rank_score_documents

    got = _to_df(freq_rank_score_documents(SF))
    assert got["score"].min() < got["score"].max()
    assert (got["rank_sum"] >= got["n_words"]).all()  # ranks start at 1
