"""Training-data pipeline operators, pack 7 (engine additions, round 4):
deterministic corpus splitting, stratified sampling, train/test
contamination checking over documents, and robust per-key dispersion (MAD)
over events.  Everything is exact — each query has a bit-exact DuckDB twin.

thunder has none of these (SURVEY.md §2 "engine additions"); they are the
operations the brief's "large-scale training-data pipeline" bullet asks for:
a 100 TB corpus needs a reproducible train/val/test assignment, per-stratum
samples for eval sets, a decontamination pass (test-set n-gram leakage into
train), and robust outlier scale estimates for telemetry.

Scale notes:
- ``split_assign``: pure per-batch integer hashing — zero shuffle.
- ``stratified_sample``: per-batch per-stratum partial top-k (k smallest by
  (hash, doc_id)) bounds what the keyed merge moves to #strata x k x
  #batches candidate rows; the final per-stratum selection sees <= that.
  No global sort, no full-corpus shuffle.
- ``contamination_check``: reuses dedup's distributed shingle machinery —
  test-side shingles (a few % of the corpus by design) hash-join train-side
  shingles on the gram; pair counts go through the guarded combiner tree /
  keyed-groupby strategies of dedup._combine_pair_counts.  The join output
  is bounded by gram df like ngram_jaccard (a df-capped variant would mirror
  dedup._rare_shingle_rows if boilerplate ever dominates).
- ``mad_by_key``: two grouped-selection passes (queries6.grouped_disc_quantiles
  — 12-bit histogram scans, never a sort); the per-key median map between
  passes is #keys-sized (key cardinality, not data-sized).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# Knuth multiplicative hash (public domain constant, 2^32 golden ratio):
# deterministic, SQL-expressible in int64 arithmetic (no overflow: doc_id
# < 2^31 guarded by dedup's pair packing, product < 2^63).
SPLIT_MULT = 2654435761
SPLIT_MOD = 4294967296
TEST_PCT = 5          # bucket < 5  -> test
VAL_PCT = 10          # bucket < 10 -> val, else train
SAMPLE_K = 10         # stratified sample size per stratum
CONTAIN_T = 0.5       # containment threshold for contamination report


def _i64(arr) -> pa.Array:
    return pa.array(np.asarray(arr, dtype=np.int64), type=pa.int64())


def _split_hash(doc_id: np.ndarray) -> np.ndarray:
    """Guarded Knuth hash shared by split/sample/contamination: numpy would
    wrap (and floored % of a negative id differs from the SQL twin's
    truncated %) — a silently different split corrupts the whole
    train/test partition, so refuse loudly outside the exact range."""
    if len(doc_id) and (int(doc_id.min()) < 0
                        or int(doc_id.max()) * SPLIT_MULT >= 1 << 63):
        raise ValueError("split: doc_id outside [0, 2^63/SPLIT_MULT) — the "
                         "exact hash twin does not hold")
    return (doc_id * SPLIT_MULT) % SPLIT_MOD


def _split_bucket(doc_id: np.ndarray) -> np.ndarray:
    return _split_hash(doc_id) % 100


# ---------------------------------------------------------------------------
# Deterministic train/val/test assignment

def split_assign_documents(sf_dir: str):
    """Reproducible split assignment: bucket = knuth_hash(doc_id) % 100,
    test < 5 <= val < 10 <= train.  Pure map — the assignment is a function
    of the id alone, so any node (or a rerun on different cluster topology)
    computes the identical split."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    splits = np.array(["train", "val", "test"], dtype=object)

    def assign(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = _split_bucket(doc)
        code = (b < VAL_PCT).astype(np.int64) + (b < TEST_PCT).astype(np.int64)
        return pa.table({
            "doc_id": _i64(doc),
            "bucket": _i64(b),
            "split": pa.array(splits[code], type=pa.string()),
        })

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


SPLIT_ASSIGN_SQL = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(b AS BIGINT) AS bucket,
       CASE WHEN b < {TEST_PCT} THEN 'test'
            WHEN b < {VAL_PCT} THEN 'val'
            ELSE 'train' END AS split
FROM (SELECT doc_id,
             ((doc_id * {SPLIT_MULT}) % {SPLIT_MOD}) % 100 AS b
      FROM documents)
"""


# ---------------------------------------------------------------------------
# Stratified deterministic sample (k per stratum, no global sort)

def stratified_sample_documents(sf_dir: str, k: int = SAMPLE_K):
    """The k docs per ``lang`` stratum with the smallest (hash, doc_id) —
    a reproducible stratified sample (hash order is a fixed random-ish
    permutation, so this is uniform-without-replacement per stratum).

    Plan: per-batch partial top-k per stratum (vectorized lexsort +
    segmented head) -> groupby(lang).map_groups final top-k over <=
    #batches x k candidates per stratum.  The shuffle moves candidates
    only, never the corpus."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lang = batch["lang"].to_numpy(zero_copy_only=False)
        if len(doc) == 0:
            return pa.table({"lang": pa.array([], type=pa.string()),
                             "doc_id": _i64([]), "h": _i64([])})
        h = _split_hash(doc)
        u, code = np.unique(lang, return_inverse=True)
        order = np.lexsort((doc, h, code))
        cs = code[order]
        # rank within stratum = position - start of the stratum's run
        starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        run_start = np.repeat(starts, np.diff(np.append(starts, len(cs))))
        keep = (np.arange(len(cs)) - run_start) < k
        sel = order[keep]
        return pa.table({
            "lang": pa.array(lang[sel], type=pa.string()),
            "doc_id": _i64(doc[sel]),
            "h": _i64(h[sel]),
        })

    cand = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id"]).head(k).reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        return g

    return cand.groupby("lang").map_groups(final, batch_format="pandas")


STRATIFIED_SAMPLE_SQL = f"""
SELECT lang, CAST(doc_id AS BIGINT) AS doc_id, CAST(h AS BIGINT) AS h,
       CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) - 1
            AS BIGINT) AS rank
FROM (SELECT lang, doc_id, (doc_id * {SPLIT_MULT}) % {SPLIT_MOD} AS h
      FROM documents)
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) <= {SAMPLE_K}
"""


# ---------------------------------------------------------------------------
# Train/test contamination (test-set shingle leakage into train+val)

def contamination_check_documents(sf_dir: str):
    """(test_doc, train_doc, shared, containment) for every test-split doc
    whose distinct-3-gram containment in a non-test doc is >= CONTAIN_T —
    the decontamination pass a training corpus runs before eval.

    Distributed plan (mirrors dedup.ngram_jaccard): one shingle-row scan,
    split by the same hash as split_assign, test-side grams hash-joined to
    non-test grams, pair counts via dedup's guarded combiner strategies.
    Gram identity is the 64-bit SipHash (collision odds ~2^-64; the SQL
    twin joins the strings — same counts, the ngram_jaccard precedent)."""
    from .dedup import _combine_pair_counts, shingle_rows_cached
    from ..util import sized_parallelism

    # materialized: BOTH split sides derive from it (one corpus scan), and
    # Ray 2.49's hash join needs schema-bearing partitions — sizing the
    # join to the (small) test side avoids empty-partition Acero crashes
    grams = shingle_rows_cached(sf_dir)

    def side(is_test: bool, names):
        def f(batch: pa.Table) -> pa.Table:
            doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            b = _split_bucket(doc)
            m = (b < TEST_PCT) if is_test else (b >= TEST_PCT)
            t = batch.filter(pa.array(m))
            return t.rename_columns(names)
        return f

    test_g = grams.map_batches(side(True, ["doc_lo", "gram", "n_lo"]),
                               batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    train_g = grams.map_batches(side(False, ["doc_hi", "gram", "n_hi"]),
                                batch_format="pyarrow", zero_copy_batch=True)
    matches = test_g.join(train_g, "inner",
                          sized_parallelism(test_g.count()), on=("gram",))
    counts = _combine_pair_counts(matches)

    def contain(batch: pa.Table) -> pa.Table:
        i = batch["i"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_test = batch["n_lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = i.astype(np.float64) / n_test
        keep = c >= CONTAIN_T
        return pa.table({
            "test_doc": _i64(batch["doc_lo"].to_numpy(zero_copy_only=False)[keep]),
            "train_doc": _i64(batch["doc_hi"].to_numpy(zero_copy_only=False)[keep]),
            "shared": _i64(i[keep]),
            "containment": pa.array(c[keep]),
        })

    return counts.map_batches(contain, batch_format="pyarrow",
                              zero_copy_batch=True)


CONTAMINATION_SQL = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
idx AS (
  SELECT doc_id, words, unnest(range(greatest(len(words) - 2, 1))) AS i
  FROM w
),
sh AS (
  SELECT DISTINCT doc_id,
         CASE WHEN len(words) < 3 THEN array_to_string(words, ' ')
              ELSE words[CAST(i AS INTEGER) + 1] || ' ' || words[CAST(i AS INTEGER) + 2]
                   || ' ' || words[CAST(i AS INTEGER) + 3] END AS g
  FROM idx
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
split AS (SELECT doc_id,
                 ((doc_id * {SPLIT_MULT}) % {SPLIT_MOD}) % 100 < {TEST_PCT} AS is_test
          FROM documents),
inter AS (
  SELECT a.doc_id AS test_doc, b.doc_id AS train_doc, COUNT(*) AS i
  FROM sh a JOIN split sa ON sa.doc_id = a.doc_id AND sa.is_test
       JOIN sh b ON a.g = b.g
       JOIN split sb ON sb.doc_id = b.doc_id AND NOT sb.is_test
  GROUP BY 1, 2
)
SELECT CAST(test_doc AS BIGINT) AS test_doc,
       CAST(train_doc AS BIGINT) AS train_doc,
       CAST(i AS BIGINT) AS shared,
       CAST(i AS DOUBLE) / s.n AS containment
FROM inter JOIN sizes s ON s.doc_id = test_doc
WHERE CAST(i AS DOUBLE) / s.n >= {CONTAIN_T}
"""


# ---------------------------------------------------------------------------
# Per-key median absolute deviation (robust dispersion) over events

def mad_by_key_events(sf_dir: str):
    """Per event_type: exact percentile_disc median of the scaled values
    and the MAD (disc-median of |sv - median|) — the robust sigma used for
    outlier fences where spike_detect's moment-based sigma is skew-fragile.

    Two grouped-selection passes (queries6.grouped_disc_quantiles: 12-bit
    histogram scans, no sort); the inter-pass median map is #keys-sized and
    ships in the task closure."""
    import ray.data as rd

    from .queries6 import grouped_disc_quantiles

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def scaled(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "event_type": batch["event_type"],
            # scaled int riding in float64 (|sv| << 2^53: exact)
            "value": pa.array(np.floor(v * 1e6)),
        })

    # materialized: grouped_disc_quantiles consumes its input TWICE
    # (histogram pass + collection pass) and runs twice here (median, then
    # MAD) — unmaterialized, the parquet scan + scale map re-executes 4x
    sv = ds.map_batches(scaled, batch_format="pyarrow",
                        zero_copy_batch=True).materialize()
    med_df = grouped_disc_quantiles(sv, [0.5])
    med = dict(zip(med_df["event_type"], med_df["value"]))

    def dev(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        u, inv = np.unique(et, return_inverse=True)
        m = np.array([med[x] for x in u], dtype=np.float64)[inv]
        return pa.table({"event_type": pa.array(et, type=pa.string()),
                         "value": pa.array(np.abs(v - m))})

    mad_df = grouped_disc_quantiles(
        sv.map_batches(dev, batch_format="pyarrow", zero_copy_batch=True),
        [0.5])
    mad = dict(zip(mad_df["event_type"], mad_df["value"]))
    keys = sorted(med)
    return pd.DataFrame({
        "event_type": keys,
        "median_scaled": np.array([med[k] for k in keys], dtype=np.int64),
        "mad_scaled": np.array([mad[k] for k in keys], dtype=np.int64),
    })


MAD_BY_KEY_SQL = """
WITH s AS (SELECT event_type,
                  CAST(floor(value * 1000000) AS BIGINT) AS sv FROM events),
med AS (SELECT event_type,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY sv) AS med
        FROM s GROUP BY event_type)
SELECT s.event_type,
       CAST(MAX(m.med) AS BIGINT) AS median_scaled,
       CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(s.sv - m.med))
            AS BIGINT) AS mad_scaled
FROM s JOIN med m ON m.event_type = s.event_type
GROUP BY s.event_type
"""


# ---------------------------------------------------------------------------

def build_queries7() -> dict:
    return {
        "split_assign_documents": split_assign_documents,
        "stratified_sample_documents": stratified_sample_documents,
        "contamination_check_documents": contamination_check_documents,
        "mad_by_key_events": mad_by_key_events,
    }


def build_oracle_sql7() -> dict:
    return {
        "split_assign_documents": SPLIT_ASSIGN_SQL,
        "stratified_sample_documents": STRATIFIED_SAMPLE_SQL,
        "contamination_check_documents": CONTAMINATION_SQL,
        "mad_by_key_events": MAD_BY_KEY_SQL,
    }
