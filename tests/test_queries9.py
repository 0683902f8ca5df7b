"""Edge tests for pack 9: repetition signals, robust MAD-fence outliers,
LTTB downsampling.  (Parity of the two SQL-twinned queries is covered by
test_oracle_parity's full parametrization.)"""

import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()


# ---------------------------------------------------------------------------
# repetition signals

def test_repetition_kernel_hand_cases(ray_session):
    from thunder_ray.pipelines.queries9 import repetition_signals_documents

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array([
            "a b a b a",          # a:3 b:2 -> dup=5; top bigram "a b" x2
            "x y z",              # all unique -> dup=0, every bigram x1
            "w w w w",            # dup=4; "w w" x3
            "solo",               # single word: no bigrams
        ]),
    })
    import os
    import tempfile

    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(docs, os.path.join(d, "documents.parquet"))
        got = _to_df(repetition_signals_documents(d)).sort_values(
            "doc_id").reset_index(drop=True)
    assert got["n_words"].tolist() == [5, 3, 4, 1]
    assert got["dup_words"].tolist() == [5, 0, 4, 0]
    assert got["top2_cnt"].tolist() == [2, 1, 3, 0]
    assert got["dup_word_frac"].tolist() == [1.0, 0.0, 1.0, 0.0]
    assert got["top2_frac"].tolist() == [2 / 4, 1 / 2, 3 / 3, 0.0]


def test_repetition_batch_invariance(ray_session):
    from thunder_ray.pipelines.queries9 import repetition_signals_documents

    a = _to_df(repetition_signals_documents(SF)).sort_values(
        "doc_id").reset_index(drop=True)
    b = _to_df(repetition_signals_documents(SF)).sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# robust outliers

def test_robust_outliers_numpy_oracle(ray_session):
    import pyarrow.parquet as pq

    from thunder_ray.pipelines.queries9 import (OUTLIER_K,
                                                robust_outliers_events)

    got = set(_to_df(robust_outliers_events(SF))["event_id"])
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "event_type", "value"]
                       ).to_pandas()
    ev["sv"] = np.floor(ev["value"].to_numpy(np.float64) * 1e6).astype(
        np.int64)
    want = set()
    for _, g in ev.groupby("event_type"):
        sv = np.sort(g["sv"].to_numpy(np.int64))
        # percentile_disc(0.5): first element at cumulative prob >= 0.5
        med = sv[int(np.ceil(0.5 * len(sv))) - 1]
        dev = np.sort(np.abs(g["sv"].to_numpy(np.int64) - med))
        mad = dev[int(np.ceil(0.5 * len(dev))) - 1]
        m = np.abs(g["sv"].to_numpy(np.int64) - med) > OUTLIER_K * mad
        want |= set(g["event_id"].to_numpy()[m])
    assert got == want


# ---------------------------------------------------------------------------
# LTTB

def _lttb_naive(x, y, n_out):
    """Independent straight-from-the-thesis reimplementation."""
    n = len(x)
    if n <= n_out:
        return list(range(n))
    edges = np.linspace(1, n - 1, n_out - 1).astype(int)
    picked = [0]
    a = 0
    for i in range(n_out - 2):
        lo, hi = edges[i], edges[i + 1]
        nlo = edges[i + 1]
        nhi = edges[i + 2] if i < n_out - 3 else n
        cx, cy = np.mean(x[nlo:nhi]), np.mean(y[nlo:nhi])
        best, best_area = lo, -1.0
        for j in range(lo, hi):
            area = abs((x[a] - cx) * (y[j] - y[a])
                       - (x[a] - x[j]) * (cy - y[a]))
            if area > best_area:
                best, best_area = j, area
        picked.append(best)
        a = best
    picked.append(n - 1)
    return picked


def test_lttb_matches_naive():
    from thunder_ray.pipelines.queries9 import lttb

    rng = np.random.default_rng(7)
    for n, k in [(100, 10), (500, 20), (37, 12), (10, 10), (5, 20)]:
        x = np.sort(rng.uniform(0, 1000, n))
        y = rng.normal(size=n)
        assert lttb(x, y, k).tolist() == _lttb_naive(x, y, k)


def test_lttb_downsample_events_properties(ray_session):
    import pyarrow.parquet as pq

    from thunder_ray.pipelines.queries import SCALE
    from thunder_ray.pipelines.queries9 import (LTTB_POINTS,
                                                lttb_downsample_events)

    got = _to_df(lttb_downsample_events(SF01))
    # independent 1m rollup: mean of floor(value*SCALE) per (type, bucket)
    ev = pq.read_table(f"{SF01}/events.parquet",
                       columns=["ts", "event_type", "value"]).to_pandas()
    ev["bucket"] = (ev["ts"].astype("datetime64[us]").astype(np.int64)
                    // 1_000_000 // 60)
    ev["sv"] = np.floor(ev["value"].to_numpy(np.float64) * SCALE)
    rolled = (ev.groupby(["event_type", "bucket"])["sv"].mean()
              .reset_index())
    for et, g in rolled.groupby("event_type"):
        g = g.sort_values("bucket")
        sub = got[got["event_type"] == et].sort_values("ts_us")
        n = min(len(g), LTTB_POINTS)
        assert len(sub) == n
        # exact pick equality vs the naive reference over the rolled series
        x = g["bucket"].to_numpy(np.float64)
        y = g["sv"].to_numpy(np.float64)
        idx = _lttb_naive(x, y, LTTB_POINTS)
        want_ts = g["bucket"].to_numpy(np.int64)[idx] * 60_000_000
        want_v = y[idx] / SCALE
        assert sub["ts_us"].tolist() == want_ts.tolist()
        np.testing.assert_allclose(sub["value"].to_numpy(), want_v,
                                   rtol=1e-12)


# ---------------------------------------------------------------------------
# interval-join empty-hot edge (sf0.1 has no cell >= 2x mean)

def test_interval_join_empty_hot_schema(ray_session, monkeypatch):
    from thunder_ray.pipelines import queries8

    monkeypatch.setattr(queries8, "HOT_FACTOR", 1e9)   # force empty
    res = queries8.interval_join_hot_events(SF)
    df = _to_df(res)
    assert len(df) == 0
    assert sorted(df.columns) == ["event_id", "event_type", "w_bucket"]


# ---------------------------------------------------------------------------
# streaming HLL continuous aggregate

def test_sketch_distinct_equals_batch_hll(ray_session):
    from thunder_ray.pipelines.queries8 import hll_distinct_users_1h
    from thunder_ray.state.hll import sketch_distinct_users_1h

    batch = _to_df(hll_distinct_users_1h(SF01)).sort_values(
        "bucket").reset_index(drop=True)
    stream = sketch_distinct_users_1h(SF01)
    # register-max folding is order/batching independent, so the streaming
    # snapshot must equal the batch pipeline BIT-FOR-BIT
    assert batch["bucket"].tolist() == stream["bucket"].tolist()
    assert (batch["approx_distinct"].to_numpy()
            == stream["approx_distinct"].to_numpy()).all()


def test_hll_shard_ingest_idempotent(ray_session):
    import numpy as np
    import pyarrow as pa

    from thunder_ray.state.hll import HllShard, _ipc, _unipc
    import ray

    shard = HllShard.remote(12)
    tbl = pa.table({"bucket": pa.array([1, 1, 2], type=pa.int64()),
                    "reg": pa.array([5, 9, 5], type=pa.int64()),
                    "rho": pa.array([3, 7, 2], type=pa.int64())})
    ray.get(shard.ingest.remote(_ipc(tbl)))
    snap1 = _unipc(ray.get(shard.snapshot.remote())).to_pandas()
    # a retried (re-delivered) partial is a max-fold no-op — idempotent by
    # algebra, no content-key ledger needed (or kept: memory stays bounded)
    ray.get(shard.ingest.remote(_ipc(tbl)))
    snap2 = _unipc(ray.get(shard.snapshot.remote())).to_pandas()
    pd.testing.assert_frame_equal(snap1, snap2)
    assert snap1["rho"].tolist() == [3, 7, 2]


def test_fourier_probe_matches_naive_dft(ray_session):
    """The probe's exact-bin amplitudes equal an independent naive DFT of
    the centered window (not np.fft), confirming the integer identity
    |W*F(k)|^2 = (sum Z cos)^2 + (sum Z sin)^2 at k in {W/4, W/2}."""
    import duckdb

    from thunder_ray.pipelines.queries9 import (FOURIER_PROBE_W,
                                                fourier_probe_amp2_tokens)

    W = FOURIER_PROBE_W
    got = _to_df(fourier_probe_amp2_tokens(SF)).sort_values(
        "doc_id").reset_index(drop=True)
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).df()
    n = np.arange(W)
    want = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        x = np.array([len(w) for w in text.split(" ")], dtype=np.int64)
        if len(x) < W:
            continue
        z = W * x[:W] - x[:W].sum()
        for k, name in ((W // 4, "amp2_q"), (W // 2, "amp2_h")):
            re = int(np.round((z * np.cos(2 * np.pi * k * n / W)).sum()))
            im = int(np.round((z * np.sin(2 * np.pi * k * n / W)).sum()))
            want.setdefault(int(did), {})[name] = re * re + im * im
    assert len(got) == len(want)
    for _, row in got.iterrows():
        assert want[int(row["doc_id"])]["amp2_q"] == int(row["amp2_q"])
        assert want[int(row["doc_id"])]["amp2_h"] == int(row["amp2_h"])
