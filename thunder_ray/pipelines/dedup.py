"""Deduplication pipelines over ``documents`` (engine additions; thunder has
no dedup — SURVEY.md §2.6 'absent in thunder' row):

- exact dedup (content hash -> min doc_id) lives in queries.py
- n-gram Jaccard ALL-PAIRS (exact, broadcast set-compare)  -> SQL twin
- MinHash + LSH banding (the 100 TB scale path)            -> rows-only
- SimHash (64-bit, hamming-distance near-dup)              -> rows-only
- embedding-cosine near-dup (exact scaled-int dot)         -> SQL twin

Scale notes: the exact all-pairs variants are O(n^2)-verify oracles used at
test scale; at 100 TB only the LSH paths run — candidate generation is a
``groupby(band_hash)`` shuffle whose group sizes are bounded by band width,
then verification touches only candidate pairs (documented partitioning
assumption: one LSH bucket fits one task).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

SHINGLE = 3          # words per shingle
JACCARD_T = 0.35     # pair-report threshold (driver data has mid-J pairs)
NUM_HASHES = 64      # minhash signature length
BANDS, ROWS_PER_BAND = 16, 4
SIMHASH_HAM_T = 8    # max hamming distance for simhash near-dup
COS_DOT_T = 0.40     # cosine threshold for embedding near-dup


def _read_docs(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _i64(arr) -> pa.Array:
    return pa.array(np.asarray(arr, dtype=np.int64), type=pa.int64())


def _shingle_set(text: str) -> set:
    w = text.split(" ")
    if len(w) < SHINGLE:
        return {" ".join(w)}
    return {" ".join(w[i: i + SHINGLE]) for i in range(len(w) - SHINGLE + 1)}


# ---------------------------------------------------------------------------
# Distributed shingle rows (no driver-side materialization anywhere)

def _shingle_rows(sf_dir: str):
    """(doc_id, gram_hash: uint64->int64, n_doc) — one row per DISTINCT
    shingle per doc, fully distributed (flat_map-style map_batches)."""

    def rows(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        out_doc, out_h, out_n = [], [], []
        for d, t in zip(doc, texts):
            sset = sorted(_shingle_set(t))
            h = _stable_u64(sset).astype(np.int64)
            out_doc.append(np.full(len(h), d, dtype=np.int64))
            out_h.append(h)
            out_n.append(np.full(len(h), len(h), dtype=np.int64))
        return pa.table({
            "doc_id": _i64(np.concatenate(out_doc) if out_doc else []),
            "gram": _i64(np.concatenate(out_h) if out_h else []),
            "n_doc": _i64(np.concatenate(out_n) if out_n else []),
        })

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        rows, batch_format="pyarrow", zero_copy_batch=True)


def _combine_pair_counts(matches):
    """(doc_lo, doc_hi, n_lo, n_hi) match rows -> one row per pair with the
    match count ``i`` — the same vectorized combiner tree as
    rollup.merge_partials (Ray's sort-based groupby-aggregate measured ~10x
    slower on this shape).  Pair key packs into one int64 (doc ids < 2^31)."""

    def combine(batch: pa.Table) -> pa.Table:
        lo = batch["doc_lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = batch["doc_hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = (lo << 31) | hi
        order = np.argsort(key, kind="stable")
        k = key[order]
        boundary = np.empty(len(k), dtype=bool)
        if len(k):
            boundary[0] = True
            boundary[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(boundary)
        cnt_col = (batch["i"].to_numpy(zero_copy_only=False).astype(np.int64)
                   if "i" in batch.column_names else np.ones(len(k), dtype=np.int64))
        return pa.table({
            "doc_lo": _i64(k[starts] >> 31),
            "doc_hi": _i64(k[starts] & ((1 << 31) - 1)),
            "i": _i64(np.add.reduceat(cnt_col[order], starts)
                      if len(starts) else cnt_col[:0]),
            "n_lo": _i64(batch["n_lo"].to_numpy(zero_copy_only=False)[order][starts]),
            "n_hi": _i64(batch["n_hi"].to_numpy(zero_copy_only=False)[order][starts]),
        })

    level1 = matches.map_batches(combine, batch_format="pyarrow",
                                 zero_copy_batch=True, batch_size=None)
    return level1.repartition(1).map_batches(
        combine, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def _pair_jaccard(inter_counts):
    """(doc_lo, doc_hi, i, n_lo, n_hi) table -> filtered jaccard table."""

    def jac(batch: pa.Table) -> pa.Table:
        i = batch["i"].to_numpy(zero_copy_only=False).astype(np.int64)
        nl = batch["n_lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        nh = batch["n_hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = i.astype(np.float64) / (nl + nh - i)
        keep = j >= JACCARD_T
        return pa.table({
            "doc_lo": _i64(batch["doc_lo"].to_numpy(zero_copy_only=False)[keep]),
            "doc_hi": _i64(batch["doc_hi"].to_numpy(zero_copy_only=False)[keep]),
            "jaccard": pa.array(j[keep]),
        })

    return inter_counts.map_batches(jac, batch_format="pyarrow", zero_copy_batch=True)


def ngram_jaccard_pairs_documents(sf_dir: str):
    """All doc pairs with 3-word-shingle Jaccard >= JACCARD_T — fully
    distributed, mirroring the SQL oracle's plan: shingle rows self-joined
    on the gram (hash join), intersection counts via groupby(pair), sizes
    carried on the shingle rows.  jaccard = i/(n_lo+n_hi-i) on exact ints.
    (Shingles compare by 64-bit SipHash — collision probability ~1e-14 per
    corpus, the only deviation from the string-equality SQL twin.)"""
    sh = _shingle_rows(sf_dir)
    right = sh.map_batches(
        lambda b: b.rename_columns(["doc_hi", "gram", "n_hi"]),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = sh.join(right, "inner", 8, on=("gram",))

    def keep_lo_hi(batch: pa.Table) -> pa.Table:
        a = batch["doc_id"].to_numpy(zero_copy_only=False)
        b = batch["doc_hi"].to_numpy(zero_copy_only=False)
        m = a < b
        return pa.table({
            "doc_lo": _i64(a[m]), "doc_hi": _i64(b[m]),
            "n_lo": _i64(batch["n_doc"].to_numpy(zero_copy_only=False)[m]),
            "n_hi": _i64(batch["n_hi"].to_numpy(zero_copy_only=False)[m]),
        })

    matches = joined.map_batches(keep_lo_hi, batch_format="pyarrow", zero_copy_batch=True)
    return _pair_jaccard(_combine_pair_counts(matches))


NGRAM_JACCARD_SQL = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
idx AS (
  SELECT doc_id, words, unnest(range(greatest(len(words) - {SHINGLE - 1}, 1))) AS i
  FROM w
),
sh AS (
  SELECT DISTINCT doc_id,
         CASE WHEN len(words) < {SHINGLE} THEN array_to_string(words, ' ')
              ELSE words[CAST(i AS INTEGER) + 1] || ' ' || words[CAST(i AS INTEGER) + 2]
                   || ' ' || words[CAST(i AS INTEGER) + 3] END AS g
  FROM idx
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_lo, b.doc_id AS doc_hi, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT CAST(doc_lo AS BIGINT) AS doc_lo, CAST(doc_hi AS BIGINT) AS doc_hi,
       CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = doc_lo JOIN sizes sb ON sb.doc_id = doc_hi
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {JACCARD_T}
"""


# ---------------------------------------------------------------------------
# MinHash + LSH banding (the scale path; rows-only driver check)

def _stable_u64(strings) -> np.ndarray:
    """Vectorized stable 64-bit hash of a string sequence (SipHash via pandas)."""
    return pd.util.hash_array(np.asarray(list(strings), dtype=object), categorize=False)


_MH_A = np.random.default_rng(1234).integers(1, (1 << 61) - 1, size=NUM_HASHES,
                                             dtype=np.uint64) | np.uint64(1)
_MH_B = np.random.default_rng(5678).integers(0, (1 << 61) - 1, size=NUM_HASHES,
                                             dtype=np.uint64)


def minhash_signature(shingles: set) -> np.ndarray:
    """64-lane minhash of a shingle set: universal-hash family
    ``h_i(x) = a_i * sip(x) + b_i`` (mod 2^64), min per lane."""
    if not shingles:
        return np.zeros(NUM_HASHES, dtype=np.uint64)
    base = _stable_u64(sorted(shingles))
    lanes = base[None, :] * _MH_A[:, None] + _MH_B[:, None]   # (H, n) mod 2^64
    return lanes.min(axis=1)



def _pairs_via_self_join(band_rows, key_cols):
    """Candidate pairs = self-join of band rows on the bucket key (C++ hash
    join) — replaces per-bucket ``map_groups`` (pandas per tiny group was
    the dominant cost at 5k docs: tens of thousands of ~1-row groups).
    Output deduplicated (a pair can match in several bands)."""
    right = band_rows.map_batches(
        lambda b: b.rename_columns(
            [c if c in key_cols else c + "_r" for c in b.column_names]),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = band_rows.join(right, "inner", 8, on=tuple(key_cols))

    def emit(batch: pa.Table) -> pa.Table:
        a = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["doc_id_r"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a < b
        return pa.table({"doc_lo": _i64(a[keep]), "doc_hi": _i64(b[keep])})

    pairs = joined.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)

    def dedupe(batch: pa.Table) -> pa.Table:
        a = batch["doc_lo"].to_numpy(zero_copy_only=False)
        b = batch["doc_hi"].to_numpy(zero_copy_only=False)
        key = (a.astype(np.int64) << 32) | b.astype(np.int64)
        _, idx = np.unique(key, return_index=True)
        return pa.table({"doc_lo": _i64(a[idx]), "doc_hi": _i64(b[idx])})

    # near-dup pair sets are small: single-task dedupe
    return pairs.repartition(1).map_batches(
        dedupe, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def minhash_lsh_pairs_documents(sf_dir: str):
    """Near-dup candidate pairs via LSH banding, verified by true Jaccard.

    Plan (the 100 TB shape):
      1. map_batches: doc -> 64-lane signature -> BANDS band-hash rows
      2. groupby(band, band_hash): docs sharing a band bucket -> candidates
      3. verify candidates with exact shingle Jaccard (here: broadcast sets;
         at scale: a co-partitioned join on doc_id)
    P(candidate | J) = 1 - (1 - J^{ROWS_PER_BAND})^{BANDS} — at the report
    threshold J>=0.35 recall is imperfect BY DESIGN (approximate operator):
    driver check is rows-only; pytest pins recall on planted duplicates.
    """
    def bands(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        out_doc, out_band, out_hash = [], [], []
        for d, t in zip(doc, texts):
            sig = minhash_signature(_shingle_set(t))
            for b in range(BANDS):
                chunk = sig[b * ROWS_PER_BAND: (b + 1) * ROWS_PER_BAND]
                h = hashlib.md5(chunk.tobytes() + bytes([b])).hexdigest()[:16]
                out_doc.append(d)
                out_band.append(b)
                out_hash.append(h)
        return pa.table({
            "doc_id": _i64(out_doc),
            "band": _i64(out_band),
            "bucket": pa.array(out_hash),
        })

    band_rows = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        bands, batch_format="pyarrow", zero_copy_batch=True)

    cand = _pairs_via_self_join(band_rows, ("band", "bucket"))

    # verify candidates with true Jaccard WITHOUT broadcasting documents:
    # candidates joined to shingle rows on each side; grams present on both
    # sides counted per pair (the co-partitioned-join scale path).
    sh = _shingle_rows(sf_dir)
    lo_side = cand.join(
        sh.map_batches(lambda b: b.rename_columns(["doc_lo", "gram", "n_lo"]),
                       batch_format="pyarrow", zero_copy_batch=True),
        "inner", 8, on=("doc_lo",))
    both = lo_side.join(
        sh.map_batches(lambda b: b.rename_columns(["doc_hi", "gram", "n_hi"]),
                       batch_format="pyarrow", zero_copy_batch=True),
        "inner", 8, on=("doc_hi", "gram"))
    return _pair_jaccard(_combine_pair_counts(both))


# ---------------------------------------------------------------------------
# SimHash (64-bit) near-dup (rows-only driver check; pytest oracle)

def simhash64(text: str) -> int:
    """64-bit SimHash over word hashes (Charikar 2002, public)."""
    words = text.split(" ")
    if not words:
        return 0
    h = _stable_u64(words)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    return int("".join("1" if x > 0 else "0" for x in v[::-1]), 2)


def simhash_pairs_documents(sf_dir: str):
    """Doc pairs whose 64-bit simhashes differ in <= SIMHASH_HAM_T bits.

    Plan: map_batches computes signatures; 4x 16-bit band buckets guarantee
    recall for hamming distance <= 3 per 16-bit block pigeonhole (any pair
    within hamming 8 shares at least one of 4 blocks... only if the 8
    differing bits avoid one block — guaranteed when ham < 4; heuristic
    above).  Verification is an exact popcount on candidate pairs.
    """
    def sig_rows(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        sigs = np.array([simhash64(t) for t in texts], dtype=np.uint64)
        return pa.table({"doc_id": _i64(doc),
                         "sig": pa.array(sigs.view(np.int64), type=pa.int64())})

    sig_ds = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        sig_rows, batch_format="pyarrow", zero_copy_batch=True)

    def bands(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sig = batch["sig"].to_numpy(zero_copy_only=False).view(np.uint64)
        n = len(doc)
        return pa.table({
            "doc_id": _i64(np.repeat(doc, 4)),
            "band": _i64(np.tile(np.arange(4, dtype=np.int64), n)),
            "key": _i64(((sig[:, None] >> (np.arange(4, dtype=np.uint64) * np.uint64(16)))
                         & np.uint64(0xFFFF)).astype(np.int64).reshape(-1)),
        })

    band_rows = sig_ds.map_batches(bands, batch_format="pyarrow", zero_copy_batch=True)
    cand = _pairs_via_self_join(band_rows, ("band", "key"))

    # hamming verify via two signature joins (no driver-side state)
    lo_side = cand.join(
        sig_ds.map_batches(lambda b: b.rename_columns(["doc_lo", "sig_lo"]),
                           batch_format="pyarrow", zero_copy_batch=True),
        "inner", 8, on=("doc_lo",))
    both = lo_side.join(
        sig_ds.map_batches(lambda b: b.rename_columns(["doc_hi", "sig_hi"]),
                           batch_format="pyarrow", zero_copy_batch=True),
        "inner", 8, on=("doc_hi",))

    def verify(batch: pa.Table) -> pa.Table:
        a = batch["sig_lo"].to_numpy(zero_copy_only=False).view(np.uint64)
        b = batch["sig_hi"].to_numpy(zero_copy_only=False).view(np.uint64)
        x = a ^ b
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x = x >> np.uint64(1)
        keep = ham <= SIMHASH_HAM_T
        return pa.table({
            "doc_lo": _i64(batch["doc_lo"].to_numpy(zero_copy_only=False)[keep]),
            "doc_hi": _i64(batch["doc_hi"].to_numpy(zero_copy_only=False)[keep]),
            "hamming": _i64(ham[keep]),
        })

    return both.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (exact scaled-int dot; SQL twin)

def embedding_neardup_pairs(sf_dir: str):
    """Vector pairs with cosine >= COS_DOT_T, decided on EXACT integers:
    keep iff dot > 0 and dot^2 >= T^2 * |a|^2 * |b|^2 (all int64 from
    1e6-scaled embeddings; float only in the reported cosine, one fixed
    expression).  Broadcast full matrix once; each task compares its rows.
    """
    import ray
    import ray.data as rd

    tbl = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"]).take_all()
    ids = np.array([int(r["vec_id"]) for r in tbl], dtype=np.int64)
    M = np.stack([np.floor(np.asarray(r["embedding"], dtype=np.float64) * 1e6)
                  for r in tbl]).astype(np.int64)
    order = np.argsort(ids)
    ids, M = ids[order], M[order]
    ref = ray.put((ids, M))

    class Compare:
        def __init__(self):
            self.ids, self.M = ray.get(ref)
            self.norms = (self.M.astype(object) ** 2).sum(axis=1)  # exact python ints

        def __call__(self, batch: pa.Table) -> pa.Table:
            from ..stages import listkernels as lk
            from ..stages import signal as sg

            vec = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            vals, offs = lk.list_parts(batch["embedding"])
            Y = np.floor(sg.as_2d(vals, offs).astype(np.float64) * 1e6).astype(np.int64)
            # exact int dot products via object dtype (no overflow: 64 dims x 1e12 each)
            D = Y @ self.M.T                      # int64: |dot| <= 64 * 1e12 < 2^63 OK
            ynorm = np.einsum("ij,ij->i", Y, Y)   # <= 64e12, fits int64
            lo_l, hi_l, cos_l = [], [], []
            for i, d in enumerate(vec):
                mask = self.ids > d
                dots = D[i][mask]
                nb = np.array([int(x) for x in self.norms[mask]], dtype=np.float64)
                pos = dots > 0
                ok = pos & (dots.astype(np.float64) ** 2
                            >= (COS_DOT_T ** 2) * float(ynorm[i]) * nb)
                if ok.any():
                    sel = np.flatnonzero(mask)[ok]
                    lo_l.extend([int(d)] * len(sel))
                    hi_l.extend(self.ids[sel].tolist())
                    cos_l.extend((D[i][mask][ok].astype(np.float64)
                                  / (np.sqrt(float(ynorm[i])) * np.sqrt(nb[ok]))).tolist())
            return pa.table({
                "vec_lo": _i64(lo_l), "vec_hi": _i64(hi_l),
                "cosine": pa.array(np.asarray(cos_l, dtype=np.float64)),
            })

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"]).map_batches(
        Compare, concurrency=(1, 4), batch_format="pyarrow", zero_copy_batch=True)


EMBEDDING_NEARDUP_SQL = f"""
WITH flat AS (
  SELECT vec_id, pos, CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS v
  FROM (SELECT vec_id, unnest(embedding) AS x,
               unnest(range(len(embedding))) AS pos FROM embeddings)
),
norms AS (SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS n2 FROM flat GROUP BY vec_id),
dots AS (
  SELECT a.vec_id AS vec_lo, b.vec_id AS vec_hi, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
  FROM flat a JOIN flat b ON a.pos = b.pos AND a.vec_id < b.vec_id
  GROUP BY 1, 2
)
SELECT CAST(vec_lo AS BIGINT) AS vec_lo, CAST(vec_hi AS BIGINT) AS vec_hi,
       CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
FROM dots JOIN norms na ON na.vec_id = vec_lo JOIN norms nb ON nb.vec_id = vec_hi
WHERE dot > 0
  AND CAST(dot AS DOUBLE) * CAST(dot AS DOUBLE)
        >= {COS_DOT_T * COS_DOT_T} * CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)
"""


def build_dedup_queries() -> dict:
    return {
        "ngram_jaccard_pairs_documents": ngram_jaccard_pairs_documents,
        "minhash_lsh_pairs_documents": minhash_lsh_pairs_documents,
        "simhash_pairs_documents": simhash_pairs_documents,
        "embedding_neardup_pairs": embedding_neardup_pairs,
    }


def build_dedup_sql() -> dict:
    return {
        "ngram_jaccard_pairs_documents": NGRAM_JACCARD_SQL,
        "embedding_neardup_pairs": EMBEDDING_NEARDUP_SQL,
        # minhash_lsh / simhash: approximate by design -> rows-only
    }
