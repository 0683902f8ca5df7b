"""Round-4 review regressions: overflow guards and NULL-vs-NaN parity."""

import os
import tempfile

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_crosscorr_int_overflow_guard():
    from thunder_ray.stages.signal import crosscorr_int_2d

    # alternating +-2e8 at d=256: nv ~ d*(d*2e8)^2 ~ 6.7e23 >> 2^63
    V = np.where(np.arange(256) % 2 == 0, 2 * 10 ** 8, -2 * 10 ** 8)[
        None, :].repeat(2, axis=0).astype(np.int64)
    with pytest.raises(ValueError, match="overflow"):
        crosscorr_int_2d(V, 2)
    # constant rows in range: nv = 0, no spurious trip
    num, nv, nw = crosscorr_int_2d(
        np.full((2, 64), 1_000_000, dtype=np.int64), 2)
    assert nv.tolist() == [0, 0]


def test_crosscorr_constant_vector_null_matches_sql(ray_session):
    from thunder_ray.pipelines.queries2 import (CROSSCORR_EMB_SQL,
                                                crosscorr_embeddings)

    rng = np.random.default_rng(3)
    emb = [rng.normal(size=64).astype(np.float32),
           np.full(64, 0.25, dtype=np.float32),         # constant: nv = 0
           rng.normal(size=64).astype(np.float32)]
    tbl = pa.table({
        "vec_id": pa.array([0, 1, 2], type=pa.int64()),
        "embedding": pa.array([list(map(float, e)) for e in emb],
                              type=pa.list_(pa.float32())),
        "label": pa.array([0, 0, 0], type=pa.int32()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "embeddings.parquet"))
        got = crosscorr_embeddings(d).to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{d}/embeddings.parquet'")
        want = con.sql(CROSSCORR_EMB_SQL).df()
    key = ["vec_id", "lag"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    # constant vector -> engine NULL where DuckDB divides by zero -> NULL
    assert got[got.vec_id == 1]["xcorr"].isna().all()
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_split_bucket_range_guard():
    from thunder_ray.pipelines.queries7 import _split_bucket

    with pytest.raises(ValueError, match="doc_id"):
        _split_bucket(np.array([-1], dtype=np.int64))
    with pytest.raises(ValueError, match="doc_id"):
        _split_bucket(np.array([1 << 33], dtype=np.int64))
    assert _split_bucket(np.array([0, 7, 123456], dtype=np.int64)).shape == (3,)


def test_interval_join_empty_probe_batches_keep_string_type(ray_session):
    """Tiny batches force some probe outputs to be all-empty; without an
    explicit string type those columns infer null and Arrow block
    unification fails (round-4 review finding)."""
    from thunder_ray.pipelines.queries8 import interval_join_hot_events

    base = interval_join_hot_events("/root/testdata/sf0.001")
    base = (base.to_pandas() if hasattr(base, "to_pandas") else base)
    tiny = interval_join_hot_events("/root/testdata/sf0.001", batch_size=7)
    tiny = (tiny.to_pandas() if hasattr(tiny, "to_pandas") else tiny)
    key = ["event_id", "event_type", "w_bucket"]
    pd.testing.assert_frame_equal(
        base.sort_values(key).reset_index(drop=True),
        tiny.sort_values(key).reset_index(drop=True))


def test_repetition_null_text_dropped_like_sql(ray_session):
    """Null text -> no unnest rows in the twin -> the doc must be absent
    here too (not a 0/0 NaN row)."""
    from thunder_ray.pipelines.queries9 import _repetition_batch

    batch = pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                      "text": pa.array(["a b", None, "c"])})
    got = _repetition_batch(batch).to_pydict()
    assert got["doc_id"] == [0, 2]
    assert got["n_words"] == [2, 1]
