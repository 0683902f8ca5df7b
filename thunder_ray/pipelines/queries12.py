"""Timeseries / training-data engine additions, pack 12 (round 5): a
candidate-bounded pairwise correlation matrix over the 1m tier, PAA + SAX
symbolization of token series, and a corpus-frequency-rank quality score.

thunder ships pairwise-similarity ideas only for images (`localcorr`,
stages/images.py) and a one-vs-signal `correlate` (SURVEY.md §2.3); the
all-pairs-of-keys correlation matrix, the SAX symbolic representation
(Lin, Keogh et al., "A Symbolic Representation of Time Series", DMKD 2003)
and frequency-rank scoring (the exact-arithmetic cousin of CCNet-style LM
quality filtering) are engine additions in the brief's "custom operators"
bullet (a).

Scale notes (what the 100 TB design is graded on):
- ``corr_matrix_topk_1m``: an UNBOUNDED all-pairs correlation over keys is
  quadratic and stays out of this engine (same stance as the documented
  O(n^2) exact dedup oracle, dedup.py); the production shape ships instead
  — correlate only a CANDIDATE SET of CORR_TOPK keys picked by total
  activity (deterministic ties).  The tier is rolled-point scale, the
  activity ranking is one #keys-sized aggregate (driver collect at key
  cardinality, the anomaly_3sigma/house bound), the filtered series is
  K x #buckets rows, and the pair statistics are exact int64 sums built
  per BUCKET group (<= K rows each, <= K(K-1)/2 pair rows emitted per
  bucket) then combined by one keyed groupby sum.  Raw tokens are never
  touched.
- ``sax_symbols_tokens``: embarrassingly parallel per-record kernel, zero
  shuffle — segment sums via one ``np.add.reduceat`` over the flattened
  list column per batch (the ewma/listkernels discipline).
- ``freq_rank_score_documents``: vocab counts through the existing
  ``_word_count_partials`` combiner (the groupby moves batch-vocab rows,
  never one row per token); the rank table is vocab-sized, broadcast ONCE
  via ``ray.put`` and read in each scorer actor's ``__init__`` (the
  anomaly_3sigma pattern — beyond-driver-heap vocabularies shard the rank
  table by word hash exactly like textops' keyed lang-ID weights); scoring
  is one vectorized searchsorted + reduceat per batch.

Exactness: every accumulated quantity is int64 with loud overflow guards;
each float output is ONE fixed expression over exact-int-derived doubles
mirrored verbatim in the SQL twin (identical IEEE operation order), so the
driver's hash compare is bit-exact — including the SAX breakpoint
comparisons, which test identical doubles against identical literals on
both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..stages import listkernels as lk

CORR_TOPK = 8       # candidate keys in the correlation matrix
SAX_SEGMENTS = 8    # PAA segments per series
# N(0,1) quartile breakpoints -> 4-symbol alphabet (Lin et al. 2003, a=4)
SAX_BREAKS = (-0.6745, 0.0, 0.6745)
CORR_X_MAX = 1 << 31  # per-bucket |sum| guard: keeps x*y inside int64


def _i64(arr) -> pa.Array:
    return pa.array(np.asarray(arr, dtype=np.int64), type=pa.int64())


def _col(batch: pa.Table, name: str) -> np.ndarray:
    return batch[name].to_numpy(zero_copy_only=False)


# ---------------------------------------------------------------------------
# Candidate-bounded pairwise correlation matrix over the 1m tier

def corr_matrix_topk_1m(sf_dir: str, k: int = CORR_TOPK):
    """Pearson correlation between every pair of the top-k most active
    sources' 1m ``sum`` series, over buckets where BOTH have a rolled
    point (inner-join alignment).  Activity = total tier ``count``;
    ties break on ascending source so the candidate set is deterministic.
    Pairs with fewer than 2 shared buckets or a constant series are
    excluded (r undefined), exactly like the twin's WHERE."""
    import ray.data as rd  # noqa: F401  (tier already materialized)
    from ray.data.aggregate import Max, Sum

    from .queries import rollup_documents

    tier = rollup_documents(sf_dir, 60).select_columns(
        ["source", "bucket", "count", "sum"])

    # activity ranking: one #keys-sized aggregate, collected at key
    # cardinality (the documented driver-collect bound)
    act = tier.groupby("source").aggregate(
        Sum("count", alias_name="c")).to_pandas()
    act = act.sort_values(["c", "source"],
                          ascending=[False, True]).head(k)
    keys = np.sort(act["source"].to_numpy())

    def keep(batch: pa.Table) -> pa.Table:
        src = _col(batch, "source")
        idx = np.searchsorted(keys, src)
        idx[idx == len(keys)] = 0
        return batch.filter(pa.array(keys[idx] == src))

    f = tier.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("source")
        x = g["sum"].to_numpy(np.int64)
        if len(x) and int(np.abs(x).max()) >= CORR_X_MAX:
            raise ValueError("corr_matrix: per-bucket |sum| >= 2^31 — "
                             "rescale the tier before the pair pass")
        src = g["source"].to_numpy()
        i, j = np.triu_indices(len(x), k=1)
        return pd.DataFrame({
            "s1": src[i], "s2": src[j],
            "n": np.ones(len(i), dtype=np.int64),
            "sx": x[i], "sy": x[j],
            "sxy": x[i] * x[j], "sxx": x[i] * x[i], "syy": x[j] * x[j],
            "ax": np.abs(x[i]), "ay": np.abs(x[j]),
        })

    q = f.groupby("bucket").map_groups(pairs, batch_format="pandas").groupby(
        ["s1", "s2"]).aggregate(
        Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
        Sum("sy", alias_name="sy"), Sum("sxy", alias_name="sxy"),
        Sum("sxx", alias_name="sxx"), Sum("syy", alias_name="syy"),
        Max("ax", alias_name="ax"), Max("ay", alias_name="ay"))

    def finalize(batch: pa.Table) -> pa.Table:
        n = _col(batch, "n").astype(np.int64)
        mx = np.maximum(_col(batch, "ax"), _col(batch, "ay")).astype(object)
        if len(n) and any(int(m) * int(m) * int(c) >= 1 << 62
                          for m, c in zip(mx, n)):
            raise ValueError("corr_matrix: pair sums may overflow int64 — "
                             "rescale the tier first")
        fn = n.astype(np.float64)
        sx = _col(batch, "sx").astype(np.float64)
        sy = _col(batch, "sy").astype(np.float64)
        sxy = _col(batch, "sxy").astype(np.float64)
        sxx = _col(batch, "sxx").astype(np.float64)
        syy = _col(batch, "syy").astype(np.float64)
        # fixed float expression, mirrored EXACTLY in the SQL twin
        varx = fn * sxx - sx * sx
        vary = fn * syy - sy * sy
        keep = (n >= 2) & (varx > 0) & (vary > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            r = (fn * sxy - sx * sy) / np.sqrt(varx * vary)
        out = batch.drop_columns(["ax", "ay"]).filter(pa.array(keep))
        return out.append_column("r", pa.array(r[keep], type=pa.float64()))

    return q.map_batches(finalize, batch_format="pyarrow",
                         zero_copy_batch=True)


def _corr_matrix_sql() -> str:
    from .queries import _rollup_sql

    return f"""
WITH t AS ({_rollup_sql(60)}),
k AS (SELECT source FROM (
        SELECT source, CAST(SUM(count) AS BIGINT) AS c FROM t
        GROUP BY source ORDER BY c DESC, source ASC LIMIT {CORR_TOPK})),
f AS (SELECT source, bucket, CAST(sum AS BIGINT) AS x FROM t
      WHERE source IN (SELECT source FROM k)),
p AS (SELECT a.source AS s1, b.source AS s2, a.x AS x, b.x AS y
      FROM f a JOIN f b ON a.bucket = b.bucket AND a.source < b.source),
q AS (SELECT s1, s2, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM p GROUP BY s1, s2)
SELECT s1, s2, n, sx, sy, sxy, sxx, syy,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r
FROM q
WHERE n >= 2
  AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
  AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
"""


# ---------------------------------------------------------------------------
# PAA + SAX symbolization of token series (Lin et al., DMKD 2003)

def sax_symbols_tokens(sf_dir: str, segments: int = SAX_SEGMENTS,
                       batch_size: int | None = None):
    """Per doc with >= ``segments`` tokens and non-constant values: the
    equal-frequency PAA segment means of the token series, z-normalized by
    the doc's own exact-int mean/variance, mapped to a 4-symbol alphabet
    at the N(0,1) quartile breakpoints.  One output row per (doc, segment)
    — segment boundaries are ``pos * segments // n`` on both sides."""
    from ..sources.tokens import tokens_from_documents

    ds = tokens_from_documents(sf_dir)
    s_ct = segments

    def kernel(batch: pa.Table) -> pa.Table:
        vals, offs = lk.list_parts(batch["tokens"])
        base, rel = lk._flat(vals, offs)
        base = base.astype(np.int64)
        lens = lk.lengths(rel).astype(np.int64)
        doc = _col(batch, "doc_id_int").astype(np.int64)

        live = lens >= s_ct
        if not live.any():
            return pa.table({"doc_id": _i64([]), "seg": _i64([]),
                             "seg_n": _i64([]), "seg_sum": _i64([]),
                             "paa": pa.array([], type=pa.float64()),
                             "sym": _i64([])})
        doc, lens = doc[live], lens[live]
        # gather the live docs' values into ONE contiguous buffer so every
        # reduceat segment end is the next segment's start (dead docs
        # between live ones would otherwise bleed into the last segment)
        off_live = np.concatenate([[0], np.cumsum(lens)])
        gidx = (np.arange(off_live[-1])
                - np.repeat(off_live[:-1], lens)
                + np.repeat(rel[:-1][live], lens))
        v = base[gidx]
        # per-doc exact moments (contiguous docs -> plain reduceat)
        s = np.add.reduceat(v, off_live[:-1])
        ss = np.add.reduceat(v * v, off_live[:-1])
        n = lens
        # segment k of an n-token doc starts at ceil(k*n/S): the positions
        # with pos * S // n == k, matching the twin's seg expression
        seg_starts = (off_live[:-1][:, None]
                      + (np.arange(s_ct)[None, :] * lens[:, None]
                         + (s_ct - 1)) // s_ct)
        flat_starts = seg_starts.ravel()
        seg_sum = np.add.reduceat(v, flat_starts)
        seg_n = np.diff(np.append(flat_starts, off_live[-1]))
        # fixed float expressions, mirrored EXACTLY in the SQL twin
        fn = n.astype(np.float64)
        mu = s.astype(np.float64) / fn
        vr = (fn * ss.astype(np.float64)
              - s.astype(np.float64) * s.astype(np.float64)) / (fn * fn)
        ok = vr > 0
        doc = doc[ok]
        mu, vr = mu[ok], vr[ok]
        seg_sum = seg_sum.reshape(-1, s_ct)[ok].ravel()
        seg_n = seg_n.reshape(-1, s_ct)[ok].ravel()
        std = np.sqrt(vr)
        paa = seg_sum.astype(np.float64) / seg_n.astype(np.float64)
        z = (paa - np.repeat(mu, s_ct)) / np.repeat(std, s_ct)
        sym = ((z >= SAX_BREAKS[0]).astype(np.int64)
               + (z >= SAX_BREAKS[1]).astype(np.int64)
               + (z >= SAX_BREAKS[2]).astype(np.int64))
        return pa.table({
            "doc_id": _i64(np.repeat(doc, s_ct)),
            "seg": _i64(np.tile(np.arange(s_ct, dtype=np.int64), len(doc))),
            "seg_n": _i64(seg_n),
            "seg_sum": _i64(seg_sum),
            "paa": pa.array(paa, type=pa.float64()),
            "sym": _i64(sym),
        })

    # batch_size is a test hook: tiny batches slice the list column
    # mid-buffer to exercise the absolute-offset gather
    bs = {"batch_size": batch_size} if batch_size else {}
    return ds.map_batches(kernel, batch_format="pyarrow",
                          zero_copy_batch=True, **bs)


def _sax_sql() -> str:
    s = SAX_SEGMENTS
    return f"""
WITH tok AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '), w -> length(w)) AS tokens
  FROM documents
),
f AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(v AS BIGINT) AS v,
         CAST(pos AS BIGINT) AS pos, CAST(len(tokens) AS BIGINT) AS n
  FROM (SELECT doc_id, tokens, unnest(tokens) AS v,
               unnest(range(len(tokens))) AS pos FROM tok)
  WHERE len(tokens) >= {s}
),
d AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS sv,
             CAST(SUM(v * v) AS BIGINT) AS ss
      FROM f GROUP BY doc_id),
g AS (SELECT doc_id, CAST(pos * {s} // n AS BIGINT) AS seg,
             CAST(COUNT(*) AS BIGINT) AS seg_n,
             CAST(SUM(v) AS BIGINT) AS seg_sum
      FROM f GROUP BY doc_id, seg),
z AS (
  SELECT g.doc_id, g.seg, g.seg_n, g.seg_sum,
         CAST(g.seg_sum AS DOUBLE) / CAST(g.seg_n AS DOUBLE) AS paa,
         CAST(d.sv AS DOUBLE) / CAST(d.n AS DOUBLE) AS mu,
         sqrt((CAST(d.n AS DOUBLE) * CAST(d.ss AS DOUBLE)
               - CAST(d.sv AS DOUBLE) * CAST(d.sv AS DOUBLE))
              / (CAST(d.n AS DOUBLE) * CAST(d.n AS DOUBLE))) AS sd
  FROM g JOIN d ON g.doc_id = d.doc_id
  WHERE (CAST(d.n AS DOUBLE) * CAST(d.ss AS DOUBLE)
         - CAST(d.sv AS DOUBLE) * CAST(d.sv AS DOUBLE))
        / (CAST(d.n AS DOUBLE) * CAST(d.n AS DOUBLE)) > 0
)
SELECT doc_id, seg, seg_n, seg_sum, paa,
       CAST((((paa - mu) / sd) >= {SAX_BREAKS[0]})::INT
            + (((paa - mu) / sd) >= {SAX_BREAKS[1]})::INT
            + (((paa - mu) / sd) >= {SAX_BREAKS[2]})::INT AS BIGINT) AS sym
FROM z
"""


# ---------------------------------------------------------------------------
# Corpus-frequency-rank quality score (exact-int CCNet-style filter)

class _RankScore:
    """Scorer actor: the vocab rank table ships once per ACTOR via the
    broadcast ref (``ray.get`` of a plasma object in ``__init__`` — the
    anomaly_3sigma pattern), then every batch is one vectorized
    searchsorted + segmented sum."""

    def __init__(self, payload_ref):
        import ray

        self.words, self.ranks = ray.get(payload_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        # absolute-offset discipline (listkernels): the values buffer of a
        # sliced batch is the FULL buffer; trim to this slice's span
        vals = words.values.to_numpy(zero_copy_only=False)
        offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = vals[offs[0]:offs[-1]]
        base_off = offs - offs[0]
        idx = np.searchsorted(self.words, flat)
        if len(flat) and (int(idx.max()) >= len(self.words)
                          or not (self.words[idx] == flat).all()):
            raise ValueError("freq_rank: word missing from the vocab rank "
                             "table — corpus and vocab are out of sync")
        rk = self.ranks[idx]
        starts = base_off[:-1]
        rank_sum = (np.add.reduceat(rk, starts)
                    if len(rk) else np.zeros(0, dtype=np.int64))
        n_words = np.diff(base_off)
        doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # fixed float expression, mirrored EXACTLY in the SQL twin
        score = rank_sum.astype(np.float64) / n_words.astype(np.float64)
        return pa.table({
            "doc_id": _i64(doc),
            "n_words": _i64(n_words),
            "rank_sum": _i64(rank_sum),
            "score": pa.array(score, type=pa.float64()),
        })


def freq_rank_score_documents(sf_dir: str):
    """Per doc: mean corpus-frequency RANK of its words (1 = most frequent;
    ties rank by ascending word) — a deterministic, integer-exact stand-in
    for perplexity-style quality filtering (low score = common-word text,
    high = rare/noisy).  Empty-string tokens count like the twin's
    string_split does."""
    import ray

    from .textops import _read_docs, _word_count_partials
    from ray.data.aggregate import Sum

    counts = _read_docs(sf_dir, ["text"]).map_batches(
        _word_count_partials, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("word").aggregate(Sum("n", alias_name="n")).to_pandas()
    # vocab-sized driver collect (the documented bound; beyond-heap vocabs
    # shard this table by word hash like textops' keyed lang-ID weights)
    counts = counts.sort_values(["n", "word"], ascending=[False, True])
    ranks_in_freq_order = np.arange(1, len(counts) + 1, dtype=np.int64)
    words = counts["word"].to_numpy()
    order = np.argsort(words)
    payload_ref = ray.put((words[order], ranks_in_freq_order[order]))

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(_RankScore, fn_constructor_args=(payload_ref,),
                          concurrency=(1, 4), batch_format="pyarrow",
                          zero_copy_batch=True)


FREQ_RANK_SQL = """
WITH w AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                  unnest(string_split(text, ' ')) AS word
           FROM documents),
v AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY word),
r AS (SELECT word, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, word ASC)
                        AS BIGINT) AS rnk FROM v),
d AS (SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(SUM(r.rnk) AS BIGINT) AS rank_sum
      FROM w JOIN r ON w.word = r.word GROUP BY w.doc_id)
SELECT doc_id, n_words, rank_sum,
       CAST(rank_sum AS DOUBLE) / CAST(n_words AS DOUBLE) AS score
FROM d
"""


def build_queries12() -> dict:
    return {
        "corr_matrix_topk_1m": corr_matrix_topk_1m,
        "sax_symbols_tokens": sax_symbols_tokens,
        "freq_rank_score_documents": freq_rank_score_documents,
    }


def build_oracle_sql12() -> dict:
    return {
        "corr_matrix_topk_1m": _corr_matrix_sql(),
        "sax_symbols_tokens": _sax_sql(),
        "freq_rank_score_documents": FREQ_RANK_SQL,
    }
