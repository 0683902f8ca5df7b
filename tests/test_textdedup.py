"""Dedup / text-analysis / ANN / multimodal operators: recall on planted
duplicates, exact oracles for hashes and features (ray_guide dedup pattern;
SURVEY.md engine-additions)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from thunder_ray.pipelines import dedup as dd
from thunder_ray.stages import multimodal as mm


# ---------------------------------------------------------------------------
# MinHash

def test_minhash_identical_sets_equal_signatures():
    s = {"a b c", "b c d", "c d e"}
    assert np.array_equal(dd.minhash_signature(s), dd.minhash_signature(set(s)))


def test_minhash_jaccard_estimate():
    rng = np.random.default_rng(0)
    base = {f"tok {i} x" for i in range(200)}
    # ~80% overlap set
    drop = set(list(base)[:40])
    other = (base - drop) | {f"new {i} y" for i in range(40)}
    a, b = dd.minhash_signature(base), dd.minhash_signature(other)
    est = (a == b).mean()
    true_j = len(base & other) / len(base | other)
    assert abs(est - true_j) < 0.15


def test_minhash_lsh_recall_on_near_dups():
    """Planted near-duplicates must be caught by the banding scheme."""
    words = [f"w{i}" for i in range(60)]
    t1 = " ".join(words)
    t2 = " ".join(words[:55] + ["x1", "x2", "x3", "x4", "x5"])  # high jaccard
    s1, s2 = dd._shingle_set(t1), dd._shingle_set(t2)
    j = len(s1 & s2) / len(s1 | s2)
    assert j > 0.5
    sig1, sig2 = dd.minhash_signature(s1), dd.minhash_signature(s2)
    shares_band = any(
        np.array_equal(sig1[b * dd.ROWS_PER_BAND:(b + 1) * dd.ROWS_PER_BAND],
                       sig2[b * dd.ROWS_PER_BAND:(b + 1) * dd.ROWS_PER_BAND])
        for b in range(dd.BANDS))
    assert shares_band, "banding failed to bucket a high-jaccard pair"


# ---------------------------------------------------------------------------
# SimHash

def test_simhash_similar_texts_close():
    t1 = " ".join(f"w{i}" for i in range(100))
    t2 = " ".join(f"w{i}" for i in range(98)) + " zz yy"
    t3 = " ".join(f"q{i}" for i in range(100))
    h1, h2, h3 = dd.simhash64(t1), dd.simhash64(t2), dd.simhash64(t3)
    near = bin(h1 ^ h2).count("1")
    far = bin(h1 ^ h3).count("1")
    assert near < far
    assert near <= dd.SIMHASH_HAM_T


def test_simhash_deterministic():
    assert dd.simhash64("a b c") == dd.simhash64("a b c")


# ---------------------------------------------------------------------------
# Rolling fingerprint oracle

def _rolling_oracle(text: str, k: int = 8) -> int:
    MOD, BASE = (1 << 61) - 1, 257
    b = text.encode("utf-8")
    if len(b) < k:
        h = 0
        for x in b:
            h = (h * BASE + x) % MOD
        return h
    best = MOD
    for i in range(len(b) - k + 1):
        h = 0
        for x in b[i: i + k]:
            h = (h * BASE + x) % MOD
        best = min(best, h)
    return best


def test_rolling_fingerprint_matches_naive(ray_session):
    import ray.data as rd

    from thunder_ray.pipelines.textops import fingerprint_rolling_documents

    res = fingerprint_rolling_documents("/root/testdata/sf0.001").take_all()
    docs = {int(r["doc_id"]): r["text"] for r in rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet").take_all()}
    assert len(res) == len(docs)
    for r in res[:10]:
        assert int(r["fingerprint_u64"]) == _rolling_oracle(docs[int(r["doc_id"])])


# ---------------------------------------------------------------------------
# ANN: LSH recall vs brute force

def test_ann_lsh_recall(ray_session):
    from thunder_ray.pipelines.ann import ann_lsh_topk_embeddings, ann_topk_embeddings

    sf = "/root/testdata/sf0.001"
    brute = {(r["query_id"], r["vec_id"]) for r in ann_topk_embeddings(sf).take_all()}
    lsh = {(r["query_id"], r["vec_id"]) for r in ann_lsh_topk_embeddings(sf).take_all()}
    assert len(brute) > 0
    recall = len(brute & lsh) / len(brute)
    assert recall >= 0.3, f"LSH recall too low: {recall}"


# ---------------------------------------------------------------------------
# Multimodal decode plumbing

def test_fake_decoder_histogram_exact():
    payloads = [b"hello world", b"\x00\x01\x02", b""]
    tbl = pa.table({
        "media_id": pa.array([1, 2, 3], type=pa.int64()),
        "payload": pa.array(payloads, type=pa.binary()),
    })
    out = mm.FakeDecoder()(tbl)
    assert out["n_bytes"].to_pylist() == [11, 3, 0]
    H = np.asarray(out["features"].combine_chunks().values.to_numpy(
        zero_copy_only=False)).reshape(3, 16)
    for i, p in enumerate(payloads):
        want = np.bincount(np.frombuffer(p, dtype=np.uint8) >> 4, minlength=16)
        assert np.array_equal(H[i], want), f"row {i}"


def test_fake_decoder_on_sliced_batch():
    payloads = [bytes([i] * (i + 1)) for i in range(6)]
    tbl = pa.table({
        "media_id": pa.array(list(range(6)), type=pa.int64()),
        "payload": pa.array(payloads, type=pa.binary()),
    })
    out = mm.FakeDecoder()(tbl.slice(2, 3))
    assert out["n_bytes"].to_pylist() == [3, 4, 5]


def test_real_decoder_is_gated():
    with pytest.raises(NotImplementedError):
        mm.RealDecoder()


def test_decode_stage_end_to_end(ray_session):
    media = mm.media_from_documents("/root/testdata/sf0.001")
    feats = mm.decode_stage(media).take_all()
    assert len(feats) > 0
    assert set(feats[0].keys()) == {"media_id", "n_bytes", "features"}
    # histogram counts must sum to n_bytes
    for r in feats[:5]:
        assert int(np.sum(r["features"])) == int(r["n_bytes"])
