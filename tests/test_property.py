"""Property-based checks (hypothesis): segmented kernels vs the per-row
NumPy oracle on random ragged inputs, including empty rows and sliced
Arrow buffers — the shapes unit fixtures under-sample."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from thunder_ray.reference import oracle
from thunder_ray.stages import listkernels as lk
from thunder_ray.stages import rollup as ru

ragged = st.lists(
    st.lists(st.integers(0, 50_256), min_size=0, max_size=40),
    min_size=1, max_size=12,
)


def _col(rows):
    arr = pa.array([list(r) for r in rows], type=pa.list_(pa.int32()))
    return lk.list_parts(arr)


@settings(max_examples=30, deadline=None)
@given(ragged)
def test_seg_sum_min_max(rows):
    vals, offs = _col(rows)
    want_sum = [int(np.sum(r, dtype=np.int64)) if r else 0 for r in rows]
    assert lk.seg_sum(vals, offs).tolist() == want_sum
    for r, mn, mx in zip(rows, lk.seg_min(vals, offs), lk.seg_max(vals, offs)):
        if r:
            assert mn == min(r) and mx == max(r)


@settings(max_examples=30, deadline=None)
@given(ragged, st.integers(1, 7))
def test_seg_downsample_matches_oracle(rows, k):
    vals, offs = _col(rows)
    means, new_off = lk.seg_downsample(vals, offs, k)
    got = [means[new_off[i]: new_off[i + 1]].tolist() for i in range(len(rows))]
    want = [oracle.downsample(np.asarray(r, dtype=np.int64), k).tolist() for r in rows]
    assert got == want


@settings(max_examples=30, deadline=None)
@given(ragged, st.integers(1, 5))
def test_seg_subsample_matches_oracle(rows, k):
    vals, offs = _col(rows)
    v, new_off = lk.seg_subsample(vals, offs, k)
    got = [v[new_off[i]: new_off[i + 1]].tolist() for i in range(len(rows))]
    want = [oracle.subsample(np.asarray(r), k).tolist() for r in rows]
    assert got == want


@settings(max_examples=25, deadline=None)
@given(ragged, st.integers(0, 86_399), st.sampled_from([60, 3600, 86_400]))
def test_bucketize_matches_naive_rollup(rows, t0_base, tier):
    """BucketizePartials (run-boundary arithmetic) == naive per-token rollup
    for arbitrary ragged rows / phases / tiers."""
    n = len(rows)
    doc_ids = np.arange(n, dtype=np.int64) * 977 + t0_base  # varied t0 per row
    tbl = pa.table({
        "doc_id": pa.array([str(d) for d in doc_ids]),
        "doc_id_int": pa.array(doc_ids, type=pa.int64()),
        "tokens": pa.array([list(r) for r in rows], type=pa.list_(pa.int32())),
        "source": pa.array([f"s{i % 3}" for i in range(n)]),
    })
    got = ru.BucketizePartials(tier, t0_column="doc_id_int")(tbl)
    want = oracle.rollup(doc_ids % 86_400, rows,
                         [f"s{i % 3}" for i in range(n)], tier)
    # oracle.rollup keys by (source, bucket) using raw t0 ints
    got_map = {}
    gsrc = got["source"].to_pylist()
    for i in range(len(got)):
        key = (gsrc[i], int(got["bucket"][i].as_py()))
        got_map[key] = [int(got[c][i].as_py()) for c in ("count", "sum", "sumsq", "min", "max")]
    want_map = {k: [int(x) for x in v] for k, v in want.items()}
    assert got_map == want_map


@settings(max_examples=20, deadline=None)
@given(ragged)
def test_kernels_on_sliced_buffers(rows):
    """Every kernel must be correct on non-zero-offset Arrow slices."""
    if len(rows) < 3:
        return
    arr = pa.array([list(r) for r in rows], type=pa.list_(pa.int32()))
    sliced = arr.slice(1, len(rows) - 2)
    vals, offs = lk.list_parts(sliced)
    want = [int(np.sum(r, dtype=np.int64)) if r else 0 for r in rows[1:-1]]
    assert lk.seg_sum(vals, offs).tolist() == want


def test_sharded_windows_invariant_to_shard_size(ray_session):
    """rolling/gap-fill/asof results must not depend on the (key, day)
    shard size (VERDICT r1 #9 sharded plans): tiny shards force carries
    across many boundaries and must still be bit-identical."""
    import pandas as pd

    from thunder_ray.pipelines.queries2 import gap_fill_1m_events
    from thunder_ray.pipelines.queries4 import rolling_mean_1m

    sf = "/root/testdata/sf0.001"

    def norm(ds):
        df = ds.to_pandas()
        cols = sorted(df.columns)
        return df[cols].sort_values(cols).reset_index(drop=True)

    a = norm(rolling_mean_1m(sf))            # default day shards
    b = norm(rolling_mean_1m(sf, shard=7))   # pathologically small shards
    pd.testing.assert_frame_equal(a, b)

    c = norm(gap_fill_1m_events(sf))
    d = norm(gap_fill_1m_events(sf, shard=13))
    pd.testing.assert_frame_equal(c, d)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(max_size=30), min_size=1, max_size=10))
def test_rolling_fingerprint_property(texts):
    """Vectorized Mersenne-mod Rabin-Karp == per-row big-int oracle on
    arbitrary unicode (multi-byte UTF-8 exercises the byte paths the ASCII
    fixtures cannot)."""
    import pyarrow as pa

    from thunder_ray.pipelines.textops import KGRAM, _rolling_fp_batch

    MOD, BASE = (1 << 61) - 1, 257

    def oracle_fp(t):
        b = t.encode("utf-8")
        if len(b) < KGRAM:
            h = 0
            for x in b:
                h = (h * BASE + x) % MOD
            return h
        best = MOD
        for i in range(len(b) - KGRAM + 1):
            h = 0
            for x in b[i: i + KGRAM]:
                h = (h * BASE + x) % MOD
            best = min(best, h)
        return best

    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
    })
    got = _rolling_fp_batch(tbl)["fingerprint_u64"].to_pylist()
    for i, t in enumerate(texts):
        assert int(got[i]) == oracle_fp(t), repr(t)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet=" abcdeé", max_size=25), min_size=1, max_size=8))
def test_minhash_simhash_batch_property(texts):
    """Batch kernels == scalar references for arbitrary (incl. empty,
    multi-space, non-ASCII) texts."""
    import pyarrow as pa

    from thunder_ray.pipelines import dedup as dd

    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
    })
    sigs = dd.minhash_signatures_batch(tbl)
    sims = dd.simhash_batch(tbl)
    for i, t in enumerate(texts):
        assert np.array_equal(sigs[i], dd.minhash_signature(dd._shingle_set(t))), repr(t)
        assert int(sims[i]) == dd.simhash64(t), repr(t)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(-2**62, 2**62 - 1), max_size=200))
def test_gorilla_dod_vectorized_fuzz(vals):
    """Vectorized dod decode == scalar oracle == input, any int64 stream."""
    from thunder_ray.functions import gorilla as g

    a = np.asarray(vals, dtype=np.int64)
    enc = g.encode_dod(a)
    np.testing.assert_array_equal(g.decode_dod(enc, len(a)), a)
    np.testing.assert_array_equal(g._decode_dod_scalar(enc, len(a)), a)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(allow_nan=False, width=64), max_size=200))
def test_gorilla_xor_vectorized_fuzz(vals):
    from thunder_ray.functions import gorilla as g

    a = np.asarray(vals, dtype=np.float64)
    enc = g.encode_xor(a)
    got = g.decode_xor(enc, len(a))
    ref = g._decode_xor_scalar(enc, len(a))
    assert got.view(np.uint64).tobytes() == a.view(np.uint64).tobytes()
    assert ref.view(np.uint64).tobytes() == a.view(np.uint64).tobytes()


# ---------------------------------------------------------------------------
# round-4 kernels

_doc = st.lists(st.sampled_from(list("abcdefg")), min_size=1, max_size=25)


@settings(max_examples=40, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=8))
def test_repetition_batch_vs_counter_oracle(docs):
    from collections import Counter

    from thunder_ray.pipelines.queries9 import _repetition_batch

    batch = pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array([" ".join(d) for d in docs]),
    })
    got = _repetition_batch(batch).to_pydict()
    for i, d in enumerate(docs):
        wc = Counter(d)
        dup = sum(c for c in wc.values() if c > 1)
        bi = Counter(zip(d, d[1:]))
        top2 = max(bi.values()) if bi else 0
        assert got["n_words"][i] == len(d)
        assert got["dup_words"][i] == dup, (d, got["dup_words"][i], dup)
        assert got["top2_cnt"][i] == top2
        assert got["dup_word_frac"][i] == dup / len(d)
        assert got["top2_frac"][i] == (top2 / (len(d) - 1)
                                       if len(d) >= 2 else 0.0)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 2**62), min_size=1, max_size=200, unique=True))
def test_hll_reg_rho_vs_scalar_oracle(keys):
    from thunder_ray.pipelines.queries8 import HLL_P, _hll_reg_rho, _splitmix64

    arr = np.array(keys, dtype=np.int64)
    reg, rho = _hll_reg_rho(arr)
    h = _splitmix64(arr.astype(np.uint64))
    for i, hv in enumerate(int(x) for x in h):
        assert reg[i] == hv >> (64 - HLL_P)
        low = 64 - HLL_P
        w = (hv & ((1 << low) - 1)) | (1 << low)
        tz = (w & -w).bit_length() - 1
        assert rho[i] == tz + 1
