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
    # ~80% overlap set (sorted: set iteration order is hash-randomized per
    # process, which made this test flaky)
    drop = set(sorted(base)[:40])
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
# Vectorized batch kernels == scalar references (round-2 rewrite)

_PARITY_TEXTS = ["a b c d e f", "a b c d e g", "x", "x y", "", "q w e r t y u i",
                 "a  b", "one two three one two three"]


def _parity_table():
    return pa.table({
        "doc_id": pa.array(range(len(_PARITY_TEXTS)), type=pa.int64()),
        "text": pa.array(_PARITY_TEXTS),
    })


def test_minhash_batch_equals_scalar():
    sigs = dd.minhash_signatures_batch(_parity_table())
    for i, t in enumerate(_PARITY_TEXTS):
        ref = dd.minhash_signature(dd._shingle_set(t))
        assert np.array_equal(sigs[i], ref), (i, t)


def test_simhash_batch_equals_scalar():
    sigs = dd.simhash_batch(_parity_table())
    for i, t in enumerate(_PARITY_TEXTS):
        assert int(sigs[i]) == dd.simhash64(t), (i, t)


def test_pair_key_packing_guard():
    with pytest.raises(ValueError):
        dd._pack_pair_key(np.array([2**31], dtype=np.int64),
                          np.array([1], dtype=np.int64))
    k = dd._pack_pair_key(np.array([3], dtype=np.int64),
                          np.array([2**31 - 1], dtype=np.int64))
    assert int(k[0] >> 31) == 3 and int(k[0] & (2**31 - 1)) == 2**31 - 1


def test_pair_combine_strategies_agree(ray_session):
    """tree fan-in and keyed groupby must produce identical jaccard rows."""
    sf = "/root/testdata/sf0.001"
    sh = dd._shingle_rows(sf)
    right = sh.map_batches(
        lambda b: b.rename_columns(["doc_hi", "gram", "n_hi"]),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = sh.join(right, "inner", 8, on=("gram",))

    def keep_lo_hi(batch: pa.Table) -> pa.Table:
        a = batch["doc_id"].to_numpy(zero_copy_only=False)
        b = batch["doc_hi"].to_numpy(zero_copy_only=False)
        m = a < b
        return pa.table({
            "doc_lo": pa.array(a[m]), "doc_hi": pa.array(b[m]),
            "n_lo": pa.array(batch["n_doc"].to_numpy(zero_copy_only=False)[m]),
            "n_hi": pa.array(batch["n_hi"].to_numpy(zero_copy_only=False)[m]),
        })

    matches = joined.map_batches(keep_lo_hi, batch_format="pyarrow",
                                 zero_copy_batch=True).materialize()

    def norm(ds):
        df = ds.to_pandas()[["doc_lo", "doc_hi", "i", "n_lo", "n_hi"]]
        return df.sort_values(["doc_lo", "doc_hi"]).reset_index(drop=True)

    import pandas as pd
    a = norm(dd._combine_pair_counts(matches, strategy="tree"))
    b = norm(dd._combine_pair_counts(matches, strategy="groupby"))
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_pair_tree_guard_refuses_runaway_pairs(ray_session, monkeypatch):
    """An oversized pair set must raise PairTreeOverflowError in the tree's
    fan-in shards, not silently funnel into the final repartition(1) task
    (VERDICT r2 next #3, mirroring rollup's TreeMergeOverflowError)."""
    import ray.data as rd

    monkeypatch.setattr(dd, "TREE_MAX_PAIRS", 0)
    t = pa.table({
        "doc_lo": pa.array([1, 1, 2, 3, 4], type=pa.int64()),
        "doc_hi": pa.array([2, 3, 3, 4, 5], type=pa.int64()),
        "n_lo": pa.array([5] * 5, type=pa.int64()),
        "n_hi": pa.array([5] * 5, type=pa.int64()),
    })
    merged = dd._combine_pair_counts(rd.from_arrow(t), strategy="tree")
    with pytest.raises(Exception) as ei:
        merged.materialize()
    assert "PairTreeOverflowError" in str(ei.value) or isinstance(
        ei.value, dd.PairTreeOverflowError)
    # the self-join dedupe path carries the same guard
    bands = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "band": pa.array([0, 0, 0], type=pa.int64()),
        "bucket": pa.array([7, 7, 7], type=pa.int64()),
    }))
    pairs = dd._pairs_via_self_join(bands, ("band", "bucket"), strategy="tree")
    with pytest.raises(Exception) as ei2:
        pairs.materialize()
    assert "PairTreeOverflowError" in str(ei2.value) or isinstance(
        ei2.value, dd.PairTreeOverflowError)


def test_ngram_cap_bounds_boilerplate_keeps_recall(ray_session, tmp_path):
    """Planted boilerplate: 30 docs share a hot 12-word prefix (df=30 per
    boilerplate gram) plus unique tails; docs 100/101 are true near-dups on
    RARE grams.  The capped path must (a) generate far fewer candidate
    pairs than the uncapped gram self-join and (b) still report the true
    near-dup pair with its exact jaccard (VERDICT r2 next #4)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = []
    for i in range(30):
        tail = " ".join(f"u{i}w{j}" for j in range(16))
        rows.append((i, f"{boiler} {tail}"))
    near = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    rows.append((100, near))
    rows.append((101, near.replace("mu", "nu")))
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)

    cap = 5
    # candidate volume: uncapped self-join sees the 30-doc boilerplate
    # clique (>= C(30,2) pairs); rare-gram candidates exclude it entirely
    uncapped_cand = dd._pairs_via_self_join(
        dd._shingle_rows(sf), ("gram",)).count()
    capped_cand = dd._pairs_via_self_join(
        dd._rare_shingle_rows(sf, cap), ("gram",)).count()
    assert uncapped_cand >= 435
    assert capped_cand < 20

    got = {(int(r["doc_lo"]), int(r["doc_hi"])): r["jaccard"]
           for r in dd.ngram_jaccard_capped_documents(sf, cap).take_all()}
    full = {(int(r["doc_lo"]), int(r["doc_hi"])): r["jaccard"]
            for r in dd.ngram_jaccard_pairs_documents(sf).take_all()}
    assert (100, 101) in got
    assert got[(100, 101)] == full[(100, 101)]   # exact score, same pair


def test_capped_ngram_join_fallback_matches_broadcast(ray_session, tmp_path,
                                                      monkeypatch):
    """With HOT_GRAM_BROADCAST_MAX forced to 0 the capped path must take the
    distributed rare-gram JOIN plan (the guarded fallback for corpora whose
    hot-gram set overflows a broadcast) and produce exactly the rows the
    broadcast anti-filter plan produces.  Boilerplate is planted so the
    hot-gram set is NON-empty (the clean-corpus fast path would bypass both
    branches)."""
    import pyarrow.parquet as pq

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, f"{boiler} " + " ".join(f"u{i}w{j}" for j in range(16)))
            for i in range(30)]
    near = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    rows += [(100, near), (101, near.replace("mu", "nu"))]
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    }), str(tmp_path / "documents.parquet"))
    sf, cap = str(tmp_path), 5

    via_broadcast = {(int(r["doc_lo"]), int(r["doc_hi"]), r["jaccard"])
                     for r in dd.ngram_jaccard_capped_documents(sf, cap).take_all()}
    monkeypatch.setattr(dd, "HOT_GRAM_BROADCAST_MAX", 0)
    via_join = {(int(r["doc_lo"]), int(r["doc_hi"]), r["jaccard"])
                for r in dd.ngram_jaccard_capped_documents(sf, cap).take_all()}
    assert (100, 101) in {(a, b) for a, b, _ in via_broadcast}
    assert via_join == via_broadcast


def test_pair_strategy_auto_picks_by_cardinality():
    assert dd._pick_pair_strategy("auto", None) == "tree"
    assert dd._pick_pair_strategy("auto", dd.TREE_MAX_PAIRS) == "tree"
    assert dd._pick_pair_strategy("auto", dd.TREE_MAX_PAIRS + 1) == "groupby"
    assert dd._pick_pair_strategy("groupby", 1) == "groupby"


def test_embedding_lsh_recall_and_precision(ray_session):
    """The LSH scale path must (a) emit only pairs the exact operator emits
    (verification is exact) and (b) recall a reasonable fraction."""
    sf = "/root/testdata/sf0.001"
    exact = {(int(r["vec_lo"]), int(r["vec_hi"]))
             for r in dd.embedding_neardup_pairs(sf).take_all()}
    lsh = {(int(r["vec_lo"]), int(r["vec_hi"]))
           for r in dd.embedding_neardup_lsh_pairs(sf).take_all()}
    assert lsh <= exact, "LSH emitted a pair the exact operator rejects"
    if exact:
        assert len(lsh) / len(exact) >= 0.2, f"recall {len(lsh)/len(exact)}"


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


def test_ann_ivf_recall(ray_session):
    from thunder_ray.pipelines.ann import ann_ivf_topk_embeddings, ann_topk_embeddings

    sf = "/root/testdata/sf0.001"
    brute = {(r["query_id"], r["vec_id"]) for r in ann_topk_embeddings(sf).take_all()}
    ivf = {(r["query_id"], r["vec_id"]) for r in ann_ivf_topk_embeddings(sf).take_all()}
    assert len(brute) > 0
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.3, f"IVF recall too low: {recall}"


def test_resize_stage_nearest_neighbour(ray_session):
    import ray.data as rd

    from thunder_ray.stages import multimodal as mm

    payloads = [b"hello world this is a payload", bytes(range(1, 200))]
    tbl = pa.table({
        "media_id": pa.array([1, 2], type=pa.int64()),
        "payload": pa.array(payloads, type=pa.binary()),
    })
    rows = mm.resize_stage(rd.from_arrow(tbl)).take_all()
    got = {int(r["media_id"]): np.asarray(r["resized"]) for r in rows}
    for mid, p in zip([1, 2], payloads):
        n = len(p)
        want = np.array([p[(j * n) // mm.RESIZE_DIM] for j in range(mm.RESIZE_DIM)])
        assert np.array_equal(got[mid], want), mid


def test_lang_profile_strategies_agree(ray_session):
    """tree and keyed-groupby profile plans must produce identical integer
    weights AND identical language_id predictions (VERDICT r2 next #8)."""
    import pandas as pd

    from thunder_ray.pipelines import textops as tx

    sf = "/root/testdata/sf0.001"

    def norm(ds, cols):
        df = ds.to_pandas()[cols]
        return df.sort_values(cols).reset_index(drop=True)

    a = norm(tx._lang_profile_ds(sf, strategy="tree"), ["lang", "word", "wt"])
    b = norm(tx._lang_profile_ds(sf, strategy="groupby"), ["lang", "word", "wt"])
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)

    pa_ = norm(tx.language_id_documents(sf, profile_strategy="tree"),
               ["doc_id", "pred_lang"])
    pb_ = norm(tx.language_id_documents(sf, profile_strategy="groupby"),
               ["doc_id", "pred_lang"])
    pd.testing.assert_frame_equal(pa_, pb_)


def test_lang_profile_tree_guard_refuses(ray_session, monkeypatch):
    """An under-estimated vocab x langs must raise in the tree's fan-in
    shards, not silently funnel the vocabulary into one task."""
    from thunder_ray import util
    from thunder_ray.pipelines import textops as tx

    monkeypatch.setattr(tx, "PROFILE_TREE_MAX_ROWS", 1)
    prof = None
    with pytest.raises(Exception) as ei:
        prof = tx._lang_profile_ds("/root/testdata/sf0.001", strategy="tree")
    assert prof is None
    assert "TreeShardOverflowError" in str(ei.value) or isinstance(
        ei.value, util.TreeShardOverflowError)


def test_lang_profile_auto_picks_groupby_beyond_bound():
    from thunder_ray.pipelines import textops as tx

    # auto + huge expected_rows must run the groupby plan end-to-end
    prof = tx._lang_profile_ds("/root/testdata/sf0.001", strategy="auto",
                               expected_rows=tx.PROFILE_TREE_MAX_ROWS + 1)
    assert prof.count() > 0


# ---------------------------------------------------------------------------
# SimHash pair pipeline: fused verify + parameterized banding (VERDICT r3 #2/#5)

def test_popcount64_matches_python():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 2 ** 64, size=1000, dtype=np.uint64)
    ham = dd._popcount64(x)
    assert all(int(h) == bin(int(v)).count("1") for h, v in zip(ham, x))
    assert dd._popcount64(np.zeros(0, dtype=np.uint64)).shape == (0,)


def test_simhash_pairs_schemes_recall_and_exact_hamming(ray_session, tmp_path):
    """Both banding schemes must (a) report every pair the pigeonhole
    guarantees (hamming <= 3), (b) attach the EXACT popcount hamming, and
    (c) never report a pair above SIMHASH_HAM_T."""
    import pyarrow.parquet as pq

    base = " ".join(f"w{i}" for i in range(120))
    near = " ".join([f"w{i}" for i in range(118)] + ["zz", "yy"])
    texts = [base, base, near] + [
        " ".join(f"q{i}d{d}" for i in range(60)) for d in range(40)]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)

    sigs = [dd.simhash64(tx) for tx in texts]
    guaranteed = {(i, j) for i in range(len(texts))
                  for j in range(i + 1, len(texts))
                  if bin(sigs[i] ^ sigs[j]).count("1") <= 3}
    assert (0, 1) in guaranteed  # identical docs -> hamming 0

    for scheme in ("b16", "prefix"):
        df = dd.simhash_pairs_documents(sf, scheme=scheme).to_pandas()
        pairs = set(zip(df["doc_lo"].astype(int), df["doc_hi"].astype(int)))
        assert guaranteed <= pairs, (scheme, guaranteed - pairs)
        for _, r in df.iterrows():
            h = bin(sigs[int(r["doc_lo"])] ^ sigs[int(r["doc_hi"])]).count("1")
            assert h == int(r["hamming"]) <= dd.SIMHASH_HAM_T, (scheme, r)


def test_simhash_prefix_bucket_occupancy_bounded():
    """The scale property VERDICT r3 #5 asks to pin: at a corpus size where
    the 16-bit band buckets already crowd, the permuted-prefix keys (~2^33
    space) keep worst-case bucket occupancy O(1) on random signatures."""
    rng = np.random.default_rng(7)
    sig = rng.integers(0, 2 ** 64, size=120_000, dtype=np.uint64)
    kp = dd._simhash_keys_prefix(sig)
    assert kp.shape == (len(sig), len(dd._PFX_COMBOS))
    worst_prefix = max(int(np.unique(kp[:, t], return_counts=True)[1].max())
                       for t in range(kp.shape[1]))
    kb = dd._simhash_keys_b16(sig)
    worst_b16 = max(int(np.unique(kb[:, t], return_counts=True)[1].max())
                    for t in range(kb.shape[1]))
    assert worst_prefix <= 4
    assert worst_b16 > 2 * worst_prefix  # 65,536-key bands already quadratic-bound
