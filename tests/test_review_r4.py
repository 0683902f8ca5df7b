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


# ---------------------------------------------------------------------------
# third review batch (stages/ + sources/)

def test_from_list_preserves_floats_and_refuses_wide_ints(ray_session):
    from thunder_ray.sources.series import from_list

    got = from_list([[0.5, 1.5]]).take_all()[0]["tokens"]
    assert list(got) == [0.5, 1.5]
    with pytest.raises(Exception, match="int32"):
        from_list([[1 << 40]]).take_all()


def test_to_binary_refuses_out_of_range_valuetype(ray_session, tmp_path):
    from thunder_ray.sources.series import from_array
    from thunder_ray.sources.binary import to_binary

    ds = from_array(np.array([[70000, 1, 2]]), source="mem")
    with pytest.raises(Exception, match="range"):
        to_binary(ds, str(tmp_path / "bin"), valuetype="<i2")


def test_rebuild_list_sliced_buffer():
    from thunder_ray.stages.listkernels import rebuild_list

    values = np.array([10, 11, 12, 13, 14], dtype=np.int64)
    offsets = np.array([2, 4, 5], dtype=np.int64)  # sliced: rows [12,13],[14]
    out = rebuild_list(values, offsets)
    assert out.to_pylist() == [[12, 13], [14]]


def test_toblocks_skips_zero_area_blocks(ray_session):
    from thunder_ray.sources.series import from_array
    from thunder_ray.stages.images import toblocks

    # 3x3 frames, 4x4 grid -> zero-area rows/cols must be skipped, not crash
    frames = np.arange(18, dtype=np.int64).reshape(2, 9)
    ds = from_array(frames).map_batches(
        lambda b: pa.table({
            "frame_id": pa.array([0, 1], type=pa.int64()),
            "image": b["tokens"],
            "height": pa.array([3, 3], type=pa.int32()),
            "width": pa.array([3, 3], type=pa.int32()),
        }), batch_format="pyarrow")
    blocks = toblocks(ds, grid=(4, 4), padding=0).to_pandas()
    assert (blocks["sh"] > 0).all() and (blocks["sw"] > 0).all()
    # every pixel covered exactly once across kept blocks
    assert int((blocks["sh"] * blocks["sw"]).sum()) == 2 * 9


def test_fourier_nyquist_guard():
    from thunder_ray.stages.signal import fourier_2d

    Y = np.random.default_rng(0).normal(size=(2, 16))
    with pytest.raises(ValueError, match="Nyquist"):
        fourier_2d(Y, freq=8)
    fourier_2d(Y, freq=7)   # in range


def test_to_text_refuses_empty_records(ray_session, tmp_path):
    from thunder_ray.sources.series import from_list, to_text

    ds = from_list([[1, 2], []])
    with pytest.raises(Exception, match="zero-length"):
        to_text(ds, str(tmp_path / "txt"))


# ---------------------------------------------------------------------------
# fourth review batch (functions/ + state/)

def test_sketch_distinct_batches_with_equal_partials_both_count(ray_session):
    """tokens [1,3] and [2,2] roll to identical (source,bucket,count,sum)
    partials; the old content key silently dropped the second batch."""
    import ray.data as rd

    from thunder_ray.state.sketch import ContinuousAggregate

    def tok_table(vals, ids):
        return pa.table({
            "doc_id": pa.array([f"doc-{i:08d}" for i in ids]),
            "tokens": pa.array([list(v) for v in vals],
                               type=pa.list_(pa.int32())),
            "n_tok": pa.array([len(v) for v in vals], type=pa.int32()),
            "source": pa.array(["s"] * len(vals)),
        })

    agg = ContinuousAggregate(60, num_shards=2)
    agg.ingest_dataset(rd.from_arrow(tok_table([[1, 3]], [0])))
    agg.ingest_dataset(rd.from_arrow(tok_table([[2, 2]], [1])))
    snap = agg.snapshot()
    assert snap["count"].sum() == 4 and snap["sum"].sum() == 8


def test_snapshots_before_any_ingest_are_empty(ray_session):
    from thunder_ray.state.hll import HllContinuousAggregate
    from thunder_ray.state.sketch import ContinuousAggregate

    assert len(ContinuousAggregate(60, num_shards=2).snapshot()) == 0
    assert len(HllContinuousAggregate(num_shards=2).snapshot()) == 0


def test_png_short_ihdr_raises_valueerror():
    import struct
    import zlib

    from thunder_ray.functions.png import decode_png

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", b"\x00\x01")
            + chunk(b"IDAT", zlib.compress(b"\x00")) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="IHDR"):
        decode_png(blob)


def test_png_all_up_fast_path_matches_loop():
    from thunder_ray.functions import png as P

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (37, 23), dtype=np.uint8)
    blob = P.encode_png(img)          # encoder emits all filter-2 rows
    assert np.array_equal(P.decode_png(blob), img)
    # force the scalar loop (mixed filters) on the same de-filter input by
    # rewriting one row's filter byte to 0 with matching raw bytes
    import zlib

    h, w = img.shape
    stream = np.zeros((h, 1 + w), dtype=np.uint8)
    stream[:, 0] = 2
    stream[0, 0] = 0                  # row 0: None (identical semantics)
    stream[0, 1:] = img[0]
    stream[1:, 1:] = img[1:] - img[:-1]
    out = P._defilter(stream.reshape(-1), h, w, 1)
    assert np.array_equal(out, img)


def test_tiff_corrupt_inputs_raise_valueerror():
    import struct

    from thunder_ray.functions.tiff import decode_tiff, encode_tiff

    # sanity: round-trips still work for both dtypes
    assert decode_tiff(encode_tiff(
        np.zeros((2, 4, 4), dtype=np.uint8))).dtype == np.uint8
    assert decode_tiff(encode_tiff(
        np.ones((1, 4, 4), dtype=np.uint16))).dtype == np.uint16
    # fabricated n_entries past the buffer: ValueError, not struct.error
    blob = (b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 5000)
            + b"\x00" * 20)
    with pytest.raises(ValueError, match="truncated TIFF"):
        decode_tiff(blob)
    # empty IFD: missing mandatory tags must be the codec's ValueError
    blob = (b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 0)
            + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="missing width/height"):
        decode_tiff(blob)


# ---------------------------------------------------------------------------
# sixth review batch (rollup core + synth + tokens)

def test_factorize_source_refuses_nulls_and_synth_ids_unique(ray_session):
    from thunder_ray.stages.rollup import BucketizePartials, _factorize_source
    from thunder_ray.synth import generate_table

    col = pa.array(["s", None, "s"])
    with pytest.raises(ValueError, match="null source"):
        _factorize_source(col)
    # short last block must NOT collide doc_ids with the previous block
    t = generate_table(25_000, rows_per_block=10_000)
    ids = t["doc_id"].to_pylist()
    assert len(set(ids)) == 25_000
    assert ids[-1] == "doc-00024999"


def test_write_tokens_parquet_param_mismatch_refuses(tmp_path):
    from thunder_ray.synth import write_tokens_parquet

    d = str(tmp_path / "tok")
    write_tokens_parquet(d, rows=100, rows_per_block=50)
    write_tokens_parquet(d, rows=100, rows_per_block=50)   # idempotent
    with pytest.raises(ValueError, match="different parameters"):
        write_tokens_parquet(d, rows=200, rows_per_block=50)


def test_rerollup_factor_and_tier_order_validation(ray_session, tmp_path):
    from thunder_ray.pipelines import tiers as tp
    from thunder_ray.stages.rollup import RerollupPartials
    from thunder_ray.synth import write_tokens_parquet

    with pytest.raises(ValueError, match="factor"):
        RerollupPartials(0)
    d = write_tokens_parquet(str(tmp_path / "tok"), rows=100,
                             rows_per_block=50)
    with pytest.raises(ValueError, match="ascending"):
        tp.run_rollup(d, str(tmp_path / "out"), tiers=("1m", "1d", "1h"))


def test_tokenize_refuses_null_text(ray_session):
    from thunder_ray.sources.tokens import _tokenize_batch

    batch = pa.table({"doc_id": pa.array(["a", "b"]),
                      "text": pa.array(["x y", None]),
                      "source": pa.array(["s", "s"])})
    with pytest.raises(ValueError, match="null text"):
        _tokenize_batch(batch)


# ---------------------------------------------------------------------------
# seventh review batch (queries core)

def test_between_tokens_short_docs_match_sql(ray_session):
    """Docs with < left+1 tokens have no rows in the twin's WHERE/GROUP BY;
    the engine must drop them too, not emit (0, 0) rows."""
    import duckdb

    from thunder_ray.pipelines.queries import (BETWEEN_TOKENS_SQL,
                                               between_tokens)

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["one two", "a b c d e", "w1 w2 w3 w4 w5 w6"]),
        "lang": pa.array(["en"] * 3),
        "source": pa.array(["s"] * 3),
        "n_chars": pa.array([7, 9, 17], type=pa.int64()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(docs, os.path.join(d, "documents.parquet"))
        got = between_tokens(d).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{d}/documents.parquet'")
        want = con.sql(BETWEEN_TOKENS_SQL).df().sort_values(
            "doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist() == [1, 2]
    pd.testing.assert_frame_equal(got, want[got.columns])


def test_tokens_as_binary_payload_guard():
    from thunder_ray.pipelines.queries3 import _tokens_as_binary

    ok = pa.array([[1, 2, 3]], type=pa.list_(pa.int32()))
    assert _tokens_as_binary(ok).to_pylist()[0] is not None
