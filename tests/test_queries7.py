"""queries7 (training-data pipeline ops): planted-leak contamination,
stratified-sample exactness under adversarial batching, split determinism,
MAD against a straight-line numpy oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from thunder_ray.pipelines import queries7 as q7


def _write_docs(tmp_path, doc_ids, texts, langs=None):
    if langs is None:
        langs = ["en"] * len(doc_ids)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.asarray(doc_ids, dtype=np.int64)),
        "text": pa.array(list(texts), type=pa.string()),
        "lang": pa.array(list(langs), type=pa.string()),
    }), str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_split_bucket_deterministic_and_balanced():
    ids = np.arange(100_000, dtype=np.int64)
    b = q7._split_bucket(ids)
    assert b.min() >= 0 and b.max() <= 99
    # Knuth hash spreads sequential ids: every split is within 2x of target
    frac_test = (b < q7.TEST_PCT).mean()
    frac_val = ((b >= q7.TEST_PCT) & (b < q7.VAL_PCT)).mean()
    assert 0.025 < frac_test < 0.10 and 0.025 < frac_val < 0.10
    assert np.array_equal(b, q7._split_bucket(ids))


def test_contamination_catches_planted_leak(ray_session, tmp_path):
    """A test-split doc whose text is a verbatim copy of a train doc must
    be reported with containment 1.0; unrelated docs must not pair."""
    # find a doc_id in the test split and two in train
    ids = np.arange(1, 400, dtype=np.int64)
    b = q7._split_bucket(ids)
    test_id = int(ids[b < q7.TEST_PCT][0])
    train_ids = ids[b >= q7.VAL_PCT][:2].astype(int)
    leak = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten"
    sf = _write_docs(tmp_path,
                     [test_id, int(train_ids[0]), int(train_ids[1])],
                     [leak, leak, other])
    df = q7.contamination_check_documents(sf).to_pandas()
    pairs = {(int(r.test_doc), int(r.train_doc)): float(r.containment)
             for r in df.itertuples()}
    assert pairs == {(test_id, int(train_ids[0])): 1.0}


def test_stratified_partial_exact_under_slicing(ray_session, tmp_path):
    """batch_size-sliced partials must still produce the global per-stratum
    k-smallest-by-(h, doc_id) set (the list-kernel slicing regression class)."""
    rng = np.random.default_rng(5)
    ids = rng.permutation(np.arange(1, 301)).astype(np.int64)
    langs = np.array(["en", "fr", "de"])[rng.integers(0, 3, len(ids))]
    sf = _write_docs(tmp_path, ids, [f"t {i}" for i in ids], list(langs))
    got = q7.stratified_sample_documents(sf).to_pandas()
    h = (ids * q7.SPLIT_MULT) % q7.SPLIT_MOD
    want = (pd.DataFrame({"lang": langs, "doc_id": ids, "h": h})
            .sort_values(["lang", "h", "doc_id"])
            .groupby("lang").head(q7.SAMPLE_K))
    want["rank"] = want.groupby("lang").cumcount()
    g = got.sort_values(["lang", "rank"]).reset_index(drop=True)
    w = want.sort_values(["lang", "rank"]).reset_index(drop=True)
    for c in ["lang", "doc_id", "h", "rank"]:
        np.testing.assert_array_equal(g[c].to_numpy(), w[c].to_numpy(), c)


def test_mad_matches_numpy_disc_oracle(ray_session, tmp_path):
    rng = np.random.default_rng(9)
    n = 5000
    et = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    # per-stratum scales: wide (b) and tight (c) dispersion regimes both
    # exercise the 12-bit histogram descent, not just the unit-scale path
    code = (et == "b").astype(int) + 2 * (et == "c").astype(int)
    val = rng.normal(size=n) * np.array([1.0, 5.0, 0.2])[code] + (
        et == "b") * 10
    pq.write_table(pa.table({
        "event_type": pa.array(list(et), type=pa.string()),
        "value": pa.array(val),
    }), str(tmp_path / "events.parquet"))
    got = q7.mad_by_key_events(str(tmp_path))

    def disc(x, p):  # percentile_disc: element at rank ceil(p*n)-1
        import math
        s = np.sort(x)
        return s[math.ceil(p * len(s)) - 1]

    for _, r in got.iterrows():
        sv = np.floor(val[et == r["event_type"]] * 1e6)
        med = disc(sv, 0.5)
        assert r["median_scaled"] == int(med)
        assert r["mad_scaled"] == int(disc(np.abs(sv - med), 0.5))
