"""Driver-contract queries, pack 2: signal ops (detrend/correlate/normalize/
fourier/crosscorr/convolve), windowed means, gap-fill, continuous-aggregate
sketch, and the remaining per-record transforms (squelch/select/median).

Float-exactness discipline (same as queries.py): every hash-compared float
column is computed from EXACT float64 quantities (integer moments, or
quarter-rationals from percentile interpolation of ints) so that any
algebraically-equivalent expression — ours and DuckDB's — yields identical
bits.  crosscorr and convolve are pure integer convolutions of scaled
inputs, so they carry scaled-int SQL twins (round 4).  fourier's phase is
genuinely inexact (irrational cos/sin coefficients), so the full spectrum
ships rows-only with a NumPy-oracle pytest (tests/test_signal.py); the
DFT bins at k in {0, N/4, N/2} ARE exact integer polynomials of the
tokens, and ``fourier_probe_amp2_tokens`` (queries9) pins the same kernel
against a hash-exact SQL twin at those bins.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.tokens import tokens_from_documents
from ..stages import listkernels as lk
from ..stages import signal as sg

SCALE = 1_000_000


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _i64(arr) -> pa.Array:
    return pa.array(np.asarray(arr, dtype=np.int64), type=pa.int64())


def _emb_2d(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """embeddings batch -> (vec_id int64, scaled-int (n,d) matrix)."""
    vals, offs = lk.list_parts(batch["embedding"])
    scaled = np.floor(vals.astype(np.float64) * SCALE).astype(np.int64)
    Y = sg.as_2d(scaled, offs)
    vec = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return vec, Y


# ---------------------------------------------------------------------------
# Detrend (thunder series.py:~740) — closed-form linear, exact moments

def detrend_linear_embeddings(sf_dir: str):
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def f(batch: pa.Table) -> pa.Table:
        vec, Y = _emb_2d(batch)
        R = sg.detrend_linear_closed_form(Y)
        n, d = R.shape
        return pa.table({
            "vec_id": _i64(np.repeat(vec, d)),
            "pos": _i64(np.tile(np.arange(d, dtype=np.int64), n)),
            "resid": pa.array(R.reshape(-1)),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


DETREND_LINEAR_EMB_SQL = """
WITH flat AS (
  SELECT vec_id, pos, CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS v
  FROM (SELECT vec_id, unnest(embedding) AS x,
               unnest(range(len(embedding))) AS pos FROM embeddings)
),
m AS (
  SELECT vec_id,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pos) AS BIGINT) AS sx,
         CAST(SUM(pos * pos) AS BIGINT) AS sxx,
         CAST(SUM(v) AS BIGINT) AS sy,
         CAST(SUM(v * pos) AS BIGINT) AS sxy
  FROM flat GROUP BY vec_id
),
s AS (
  SELECT vec_id,
         CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
  FROM m
)
SELECT f.vec_id, CAST(f.pos AS BIGINT) AS pos,
       CAST(f.v AS DOUBLE) - s.slope * CAST(f.pos AS DOUBLE) AS resid
FROM flat f JOIN s USING (vec_id)
"""


# ---------------------------------------------------------------------------
# Correlate (thunder series.py:~360) — Pearson r vs signal = position index

def correlate_embeddings(sf_dir: str):
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def f(batch: pa.Table) -> pa.Table:
        vec, Y = _emb_2d(batch)
        n_rows, d = Y.shape
        x = np.arange(d, dtype=np.int64)
        n = np.int64(d)
        sx, sxx = x.sum(), (x * x).sum()
        sy = Y.sum(axis=1)
        syy = (Y * Y).sum(axis=1)
        sxy = (Y * x).sum(axis=1)
        num = (n * sxy - sx * sy).astype(np.float64)
        den = np.sqrt((n * sxx - sx * sx).astype(np.float64)) * np.sqrt(
            (n * syy - sy * sy).astype(np.float64))
        keep = den > 0
        return pa.table({
            "vec_id": _i64(vec[keep]),
            "r": pa.array(num[keep] / den[keep]),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


CORRELATE_EMB_SQL = """
WITH flat AS (
  SELECT vec_id, pos, CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS v
  FROM (SELECT vec_id, unnest(embedding) AS x,
               unnest(range(len(embedding))) AS pos FROM embeddings)
),
m AS (
  SELECT vec_id,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pos) AS BIGINT) AS sx,
         CAST(SUM(pos * pos) AS BIGINT) AS sxx,
         CAST(SUM(v) AS BIGINT) AS sy,
         CAST(SUM(v * v) AS BIGINT) AS syy,
         CAST(SUM(v * pos) AS BIGINT) AS sxy
  FROM flat GROUP BY vec_id
)
SELECT vec_id,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r
FROM m
WHERE sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE)) > 0
"""


# ---------------------------------------------------------------------------
# Normalize percentile (thunder series.py:~770) — quarter-rational baseline

def normalize_percentile_embeddings(sf_dir: str, perc: float = 25.0,
                                    offset_scaled: float = 100_000.0):
    """(v - b) / (b + offset) on 1e6-scaled ints; b = 25th percentile
    (numpy linear interpolation — exact because lo/hi are ints and
    frac = 0.75 is a power-of-two rational)."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def f(batch: pa.Table) -> pa.Table:
        vec, Y = _emb_2d(batch)
        n, d = Y.shape
        S = np.sort(Y, axis=1)
        p = (d - 1) * (perc / 100.0)
        lo, hi = int(np.floor(p)), int(np.ceil(p))
        frac = p - lo
        b = S[:, lo].astype(np.float64) * (1 - frac) + S[:, hi].astype(np.float64) * frac
        out = (Y.astype(np.float64) - b[:, None]) / (b[:, None] + offset_scaled)
        return pa.table({
            "vec_id": _i64(np.repeat(vec, d)),
            "pos": _i64(np.tile(np.arange(d, dtype=np.int64), n)),
            "norm": pa.array(out.reshape(-1)),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


NORMALIZE_PCT_EMB_SQL = """
WITH flat AS (
  SELECT vec_id, pos, CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS v
  FROM (SELECT vec_id, unnest(embedding) AS x,
               unnest(range(len(embedding))) AS pos FROM embeddings)
),
ranked AS (
  SELECT vec_id, v, row_number() OVER (PARTITION BY vec_id ORDER BY v) AS rk
  FROM flat
),
b AS (
  SELECT vec_id,
         CAST(MIN(CASE WHEN rk = 16 THEN v END) AS DOUBLE) * 0.25
           + CAST(MIN(CASE WHEN rk = 17 THEN v END) AS DOUBLE) * 0.75 AS base
  FROM ranked GROUP BY vec_id
)
SELECT f.vec_id, CAST(f.pos AS BIGINT) AS pos,
       (CAST(f.v AS DOUBLE) - b.base) / (b.base + 100000.0) AS norm
FROM flat f JOIN b USING (vec_id)
"""


NORM_WINDOW = 8          # window-exact normalize: positions [i-4, i+4)


def normalize_window_embeddings(sf_dir: str, offset_scaled: float = 100_000.0):
    """thunder ``normalize(method='window-exact', window=8)`` (series.py:
    ~770): per position, baseline = 25th percentile of the CLIPPED 8-wide
    window, normalized = (v - b) / (b + offset).  Window sizes at the edges
    are 4..8, so (n_w - 1) * 0.25 always has a power-of-two fraction and
    the explicit lo/hi/frac percentile expression is bit-reproducible by
    the SQL twin (same discipline as normalize_percentile_embeddings)."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    half = NORM_WINDOW // 2

    def f(batch: pa.Table) -> pa.Table:
        vec, Y = _emb_2d(batch)
        n, d = Y.shape
        b = np.empty((n, d), dtype=np.float64)
        for i in range(d):
            w0, w1 = max(0, i - half), min(d, i + NORM_WINDOW - half)
            W = np.sort(Y[:, w0:w1], axis=1)
            p = (w1 - w0 - 1) * 0.25
            lo, hi = int(np.floor(p)), int(np.ceil(p))
            frac = p - lo
            b[:, i] = (W[:, lo].astype(np.float64) * (1 - frac)
                       + W[:, hi].astype(np.float64) * frac)
        out = (Y.astype(np.float64) - b) / (b + offset_scaled)
        return pa.table({
            "vec_id": _i64(np.repeat(vec, d)),
            "pos": _i64(np.tile(np.arange(d, dtype=np.int64), n)),
            "norm": pa.array(out.reshape(-1)),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


NORMALIZE_WINDOW_EMB_SQL = f"""
WITH flat AS (
  SELECT vec_id, pos, CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS v
  FROM (SELECT vec_id, unnest(embedding) AS x,
               unnest(range(len(embedding))) AS pos FROM embeddings)
),
win AS (
  SELECT a.vec_id, a.pos, b.v
  FROM flat a JOIN flat b ON b.vec_id = a.vec_id
   AND b.pos BETWEEN a.pos - {NORM_WINDOW // 2} AND a.pos + {NORM_WINDOW - NORM_WINDOW // 2 - 1}
),
ranked AS (
  SELECT vec_id, pos, v,
         row_number() OVER (PARTITION BY vec_id, pos ORDER BY v) AS rk,
         COUNT(*) OVER (PARTITION BY vec_id, pos) AS nw
  FROM win
),
b AS (
  SELECT vec_id, pos,
         CAST(MIN(CASE WHEN rk = CAST(floor((nw - 1) * 0.25) AS BIGINT) + 1 THEN v END) AS DOUBLE)
           * (1.0 - ((nw - 1) * 0.25 - floor((nw - 1) * 0.25)))
       + CAST(MIN(CASE WHEN rk = CAST(ceil((nw - 1) * 0.25) AS BIGINT) + 1 THEN v END) AS DOUBLE)
           * ((nw - 1) * 0.25 - floor((nw - 1) * 0.25)) AS base
  FROM ranked GROUP BY vec_id, pos, nw
)
SELECT f.vec_id, CAST(f.pos AS BIGINT) AS pos,
       (CAST(f.v AS DOUBLE) - b.base) / (b.base + 100000.0) AS norm
FROM flat f JOIN b USING (vec_id, pos)
"""


# ---------------------------------------------------------------------------
# mean_by_window over tokens (thunder series.py:~1030)

WINDOW_CENTERS = [5, 17, 40]
WINDOW = 8


def mean_by_window_tokens(sf_dir: str):
    ds = tokens_from_documents(sf_dir)

    def f(batch: pa.Table) -> pa.Table:
        vals, offs = lk.list_parts(batch["tokens"])
        M = sg.seg_mean_by_window(vals, offs, WINDOW_CENTERS, WINDOW)
        doc = batch["doc_id_int"].to_numpy(zero_copy_only=False).astype(np.int64)
        n, w = M.shape
        flat = M.reshape(-1)
        keep = ~np.isnan(flat)
        return pa.table({
            "doc_id": _i64(np.repeat(doc, w)[keep]),
            "woff": _i64(np.tile(np.arange(w, dtype=np.int64), n)[keep]),
            "mean_w": pa.array(flat[keep]),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


MEAN_BY_WINDOW_SQL = f"""
WITH tok AS (
  SELECT doc_id, list_transform(string_split(text, ' '), w -> length(w)) AS tokens
  FROM documents
),
flat AS (
  SELECT doc_id, pos, CAST(v AS BIGINT) AS v
  FROM (SELECT doc_id, unnest(tokens) AS v, unnest(range(len(tokens))) AS pos FROM tok)
),
grid AS (
  SELECT ctr, woff, ctr - {WINDOW // 2} + woff AS p
  FROM (SELECT unnest([{", ".join(map(str, WINDOW_CENTERS))}]) AS ctr)
  CROSS JOIN (SELECT unnest(range({WINDOW})) AS woff)
)
SELECT f.doc_id, CAST(g.woff AS BIGINT) AS woff,
       CAST(SUM(f.v) AS DOUBLE) / COUNT(*) AS mean_w
FROM flat f JOIN grid g ON f.pos = g.p
GROUP BY f.doc_id, g.woff
"""


# ---------------------------------------------------------------------------
# Gap-fill (north rule): explicit linear interpolation of empty 1m buckets

_EVENTS_TIER_CACHE: dict = {}


def _events_rollup(sf_dir: str, tier_seconds: int):
    """events -> per (event_type, bucket) exact-int count/sum at
    ``tier_seconds`` (materialized once per (sf_dir, tier) — tier artifacts
    are read by several queries, like queries.rollup_documents)."""
    from .queries import _source_fingerprint

    # fingerprinted like queries._TIER_CACHE (ADVICE r2): regenerated input
    # parquet in the same process must not serve stale rolled points
    key = (sf_dir, _source_fingerprint(sf_dir, "events"), tier_seconds)
    if key in _EVENTS_TIER_CACHE:
        return _EVENTS_TIER_CACHE[key]
    # evict superseded fingerprints (see queries._TIER_CACHE)
    for k in [k for k in _EVENTS_TIER_CACHE
              if k[0] == sf_dir and k[2] == tier_seconds]:
        del _EVENTS_TIER_CACHE[k]
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partials(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        bucket = ts_us // 1_000_000 // tier_seconds
        v = np.floor(batch["value"].to_numpy(zero_copy_only=False) * SCALE).astype(np.int64)
        src = batch["event_type"].to_numpy(zero_copy_only=False)
        uniq, code = np.unique(src, return_inverse=True)
        if len(bucket) and (int(bucket.min()) < 0
                            or int(bucket.max()) >= (1 << 40)):
            raise ValueError("tier bucket outside the 40-bit pack range "
                             "(pre-epoch or far-future timestamp)")
        key = (code.astype(np.int64) << 40) | bucket
        order = np.argsort(key, kind="stable")
        k = key[order]
        vv = v[order]
        boundary = np.empty(len(k), dtype=bool)
        if len(k):
            boundary[0] = True
            boundary[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(boundary)
        return pa.table({
            "event_type": pa.array(uniq[(k[starts] >> 40).astype(np.int64)]),
            "bucket": _i64(k[starts] & ((1 << 40) - 1)),
            "count": _i64(np.diff(np.append(starts, len(k)))),
            "sum_s": _i64(np.add.reduceat(vv, starts) if len(starts) else vv[:0]),
        })

    merged = ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True).groupby(
        ["event_type", "bucket"]
    ).aggregate(Sum("count", alias_name="count"), Sum("sum_s", alias_name="sum_s"))
    _EVENTS_TIER_CACHE[key] = merged.materialize()
    return _EVENTS_TIER_CACHE[key]


def gap_fill_1m_events(sf_dir: str, shard: int = 1440,
                       mode: str = "interp"):
    """Missing (event_type, bucket) rows of the events 1m rollup, mean
    linearly interpolated between neighbouring real buckets (or carried
    forward with ``mode="locf"``) — delegates to the ONE sharded
    (key, day)+carry implementation in stages/gapfill (VERDICT r2 next #6:
    the stage and the query share this code path)."""
    from ..stages.gapfill import sharded_fills

    tier = _events_rollup(sf_dir, 60)

    def mean_view(batch: pa.Table) -> pa.Table:
        cnt = batch["count"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch["sum_s"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = batch["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        return pa.table({
            "event_type": et,
            "bucket": _i64(batch["bucket"].to_numpy(zero_copy_only=False)),
            "mean": pa.array(s.astype(np.float64) / cnt),
        })

    means = tier.map_batches(mean_view, batch_format="pyarrow",
                             zero_copy_batch=True)
    return sharded_fills(means, key_col="event_type", shard=shard, mode=mode)


GAP_FILL_EVENTS_SQL = """
WITH t AS (
  SELECT event_type, bucket,
         CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean
  FROM (SELECT event_type,
               (epoch_us(ts) // 1000000) // 60 AS bucket,
               CAST(floor(value * 1000000) AS BIGINT) AS v
        FROM events)
  GROUP BY event_type, bucket
),
g AS (
  SELECT event_type, bucket AS pb,
         lead(bucket) OVER (PARTITION BY event_type ORDER BY bucket) AS nb,
         mean AS pm,
         lead(mean) OVER (PARTITION BY event_type ORDER BY bucket) AS nm
  FROM t
)
SELECT event_type, CAST(b AS BIGINT) AS bucket,
       pm + (nm - pm) * (CAST(b - pb AS DOUBLE) / CAST(nb - pb AS DOUBLE)) AS mean_fill
FROM (SELECT event_type, pb, nb, pm, nm, unnest(range(pb + 1, nb)) AS b
      FROM g WHERE nb > pb + 1)
"""


# ---------------------------------------------------------------------------
# Continuous-aggregate sketch == batch rollup (state/sketch.py)

def sketch_rollup_1m(sf_dir: str):
    """Stream the tokens table through the stateful sketch actor pool and
    snapshot: must equal the batch 1m rollup bit-for-bit (and hash-match
    the same DuckDB oracle as rollup_1m)."""
    from ..state.sketch import ContinuousAggregate

    agg = ContinuousAggregate(60, num_shards=4, t0_column="doc_id_int")
    agg.ingest_dataset(tokens_from_documents(sf_dir))
    snap = agg.snapshot()
    return snap.drop(columns=["sumsq"])


# ---------------------------------------------------------------------------
# Remaining per-record transforms (squelch / select / median)

def squelch_sum_tokens(sf_dir: str, threshold: int = 15):
    ds = tokens_from_documents(sf_dir)

    def f(batch: pa.Table) -> pa.Table:
        vals, offs = lk.list_parts(batch["tokens"])
        sq = lk.seg_squelch(vals, offs, threshold)
        rel = offs - offs[0]
        return pa.table({
            "doc_id": _i64(batch["doc_id_int"].to_numpy(zero_copy_only=False)),
            "sum_sq": _i64(lk.seg_sum(sq.astype(np.int64), rel)),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


SQUELCH_SUM_SQL = """
WITH tok AS (
  SELECT doc_id, list_transform(string_split(text, ' '), w -> length(w)) AS tokens
  FROM documents
),
flat AS (SELECT doc_id, CAST(unnest(tokens) AS BIGINT) AS v FROM tok)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(CASE WHEN MAX(v) >= 15 THEN SUM(v) ELSE 0 END AS BIGINT) AS sum_sq
FROM flat GROUP BY doc_id
"""


SELECT_POSITIONS = [0, 10, 20]


def select_positions_tokens(sf_dir: str):
    ds = tokens_from_documents(sf_dir)

    def f(batch: pa.Table) -> pa.Table:
        vals, offs = lk.list_parts(batch["tokens"])
        v, new_off = lk.seg_select(vals, offs, SELECT_POSITIONS)
        return pa.table({
            "doc_id": _i64(batch["doc_id_int"].to_numpy(zero_copy_only=False)),
            "n_sel": _i64(np.diff(new_off)),
            "sum_sel": _i64(lk.seg_sum(v.astype(np.int64), new_off)),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


SELECT_POSITIONS_SQL = f"""
WITH tok AS (
  SELECT doc_id, list_transform(string_split(text, ' '), w -> length(w)) AS tokens
  FROM documents
),
flat AS (
  SELECT doc_id, pos, CAST(v AS BIGINT) AS v
  FROM (SELECT doc_id, unnest(tokens) AS v, unnest(range(len(tokens))) AS pos FROM tok)
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_sel,
       CAST(SUM(v) AS BIGINT) AS sum_sel
FROM flat WHERE pos IN ({", ".join(map(str, SELECT_POSITIONS))}) GROUP BY doc_id
"""


def series_median_tokens(sf_dir: str):
    ds = tokens_from_documents(sf_dir)

    def f(batch: pa.Table) -> pa.Table:
        vals, offs = lk.list_parts(batch["tokens"])
        return pa.table({
            "doc_id": _i64(batch["doc_id_int"].to_numpy(zero_copy_only=False)),
            "median": pa.array(lk.seg_median(vals, offs)),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


SERIES_MEDIAN_SQL = """
WITH tok AS (
  SELECT doc_id, list_transform(string_split(text, ' '), w -> length(w)) AS tokens
  FROM documents
),
flat AS (SELECT doc_id, CAST(unnest(tokens) AS BIGINT) AS v FROM tok)
SELECT CAST(doc_id AS BIGINT) AS doc_id, median(v) AS median
FROM flat GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Signal queries.  fourier stays rows-only (FFT floats are not reproducible
# in SQL); convolve / crosscorr run on SCALED INTEGERS (VERDICT r3 #4) so
# their outputs are exact and the DuckDB twins hash-match — the float-kernel
# variants remain pinned to the NumPy oracle in tests/test_signal.py.

def fourier_embeddings(sf_dir: str, freq: int = 3):
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def f(batch: pa.Table) -> pa.Table:
        vals, offs = lk.list_parts(batch["embedding"])
        Y = sg.as_2d(vals.astype(np.float64), offs)
        co, ph = sg.fourier_2d(Y, freq)
        return pa.table({
            "vec_id": _i64(batch["vec_id"].to_numpy(zero_copy_only=False)),
            "coherence": pa.array(co),
            "phase": pa.array(ph),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def crosscorr_embeddings(sf_dir: str, lag: int = 2):
    """Normalized cross-correlation at lags -lag..+lag against the
    pure-integer test signal w[q] = ((q*37+11) % 101) - 50, on v =
    floor(x*1e6): ``num`` is an exact int64 (signal.crosscorr_int_2d) and
    ``xcorr`` is the ONE fixed float expression num/(sqrt(nv)*sqrt(nw)) —
    bit-identical to the SQL twin, including NULL (not NaN) on
    zero-variance rows: DuckDB double division by zero yields NULL, so a
    constant vector (nv = 0) must emit a null xcorr here too."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def f(batch: pa.Table) -> pa.Table:
        vals, offs = lk.list_parts(batch["embedding"])
        Y = sg.as_2d(vals.astype(np.float64), offs)
        V = np.floor(Y * 1e6).astype(np.int64)
        num, nv, nw = sg.crosscorr_int_2d(V, lag)
        n, w = num.shape
        with np.errstate(invalid="ignore", divide="ignore"):
            xc = num.astype(np.float64) / (
                np.sqrt(nv.astype(np.float64))[:, None] * np.sqrt(float(nw)))
        return pa.table({
            "vec_id": _i64(np.repeat(batch["vec_id"].to_numpy(zero_copy_only=False), w)),
            "lag": _i64(np.tile(np.arange(-lag, lag + 1, dtype=np.int64), n)),
            "num": _i64(num.reshape(-1)),
            "xcorr": pa.array(xc.reshape(-1), mask=np.repeat(nv == 0, w)),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


CROSSCORR_EMB_SQL = """
WITH flat AS (
  SELECT vec_id, pos,
         CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS v,
         CAST(d AS BIGINT) AS d
  FROM (SELECT vec_id, unnest(embedding) AS x,
               unnest(range(len(embedding))) AS pos,
               len(embedding) AS d FROM embeddings)
),
sums AS (SELECT vec_id, CAST(SUM(v) AS BIGINT) AS sv, MAX(d) AS d
         FROM flat GROUP BY vec_id),
cent AS (SELECT f.vec_id, f.pos, f.d * f.v - s.sv AS vc
         FROM flat f JOIN sums s USING (vec_id)),
wflat AS (SELECT vec_id, pos, ((pos * 37 + 11) % 101) - 50 AS w FROM flat),
wsums AS (SELECT vec_id, CAST(SUM(w) AS BIGINT) AS sw FROM wflat GROUP BY vec_id),
wcent AS (SELECT wf.vec_id, wf.pos, s.d * wf.w - ws.sw AS wc
          FROM wflat wf JOIN sums s USING (vec_id) JOIN wsums ws ON ws.vec_id = wf.vec_id),
lags AS (SELECT unnest([-2, -1, 0, 1, 2]) AS lag),
num AS (
  SELECT c.vec_id, l.lag, CAST(SUM(c.vc * w.wc) AS BIGINT) AS num
  FROM cent c CROSS JOIN lags l
       JOIN wcent w ON w.vec_id = c.vec_id AND w.pos = c.pos - l.lag
  GROUP BY c.vec_id, l.lag
),
norms AS (SELECT vec_id, CAST(SUM(vc * vc) AS BIGINT) AS nv FROM cent GROUP BY vec_id),
wnorms AS (SELECT vec_id, CAST(SUM(wc * wc) AS BIGINT) AS nw FROM wcent GROUP BY vec_id)
SELECT CAST(n.vec_id AS BIGINT) AS vec_id, CAST(n.lag AS BIGINT) AS lag,
       n.num AS num,
       CAST(n.num AS DOUBLE) / (sqrt(CAST(no.nv AS DOUBLE)) * sqrt(CAST(wn.nw AS DOUBLE))) AS xcorr
FROM num n JOIN norms no ON no.vec_id = n.vec_id
           JOIN wnorms wn ON wn.vec_id = n.vec_id
"""


def convolve_embeddings(sf_dir: str):
    """Convolution (mode="same") with the dyadic kernel [0.25, 0.5, 0.25]
    over v = floor(x*1e6): integer taps [1, 2, 1] through signal.convolve_2d
    (exact — sums stay far below 2^53), then ONE float division by 4e6.
    Both columns are bit-identical to the SQL position-shift join twin."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    kernel = np.array([1.0, 2.0, 1.0])

    def f(batch: pa.Table) -> pa.Table:
        vals, offs = lk.list_parts(batch["embedding"])
        Y = sg.as_2d(vals.astype(np.float64), offs)
        V = np.floor(Y * 1e6)
        # exactness of the float accumulation needs |C| <= 4*vmax < 2^53;
        # beyond that numpy would silently diverge from the twin's exact
        # BIGINT sums (same refuse-loudly contract as crosscorr_int_2d)
        if V.size and 4 * float(np.abs(V).max()) >= float(1 << 53):
            raise ValueError("convolve: scaled magnitude exceeds the exact "
                             "float53 range — rescale the input")
        C = sg.convolve_2d(V, kernel, mode="same")
        num = C.astype(np.int64)
        n, d = C.shape
        return pa.table({
            "vec_id": _i64(np.repeat(batch["vec_id"].to_numpy(zero_copy_only=False), d)),
            "pos": _i64(np.tile(np.arange(d, dtype=np.int64), n)),
            "num": _i64(num.reshape(-1)),
            "smoothed": pa.array(num.astype(np.float64).reshape(-1) / 4e6),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


CONVOLVE_EMB_SQL = """
WITH flat AS (
  SELECT vec_id, pos, CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS v
  FROM (SELECT vec_id, unnest(embedding) AS x,
               unnest(range(len(embedding))) AS pos FROM embeddings)
),
conv AS (
  SELECT a.vec_id, a.pos,
         CAST(SUM(b.v * (CASE WHEN a.pos = b.pos THEN 2 ELSE 1 END)) AS BIGINT) AS num
  FROM flat a JOIN flat b
    ON a.vec_id = b.vec_id AND abs(a.pos - b.pos) <= 1
  GROUP BY a.vec_id, a.pos
)
SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(pos AS BIGINT) AS pos,
       num, CAST(num AS DOUBLE) / 4000000.0 AS smoothed
FROM conv
"""


# ---------------------------------------------------------------------------
# Registry (merged into queries.build_queries / build_oracle_sql)

def build_queries2() -> dict:
    return {
        "detrend_linear_embeddings": detrend_linear_embeddings,
        "correlate_embeddings": correlate_embeddings,
        "normalize_percentile_embeddings": normalize_percentile_embeddings,
        "normalize_window_embeddings": normalize_window_embeddings,
        "mean_by_window_tokens": mean_by_window_tokens,
        "gap_fill_1m_events": gap_fill_1m_events,
        "sketch_rollup_1m": sketch_rollup_1m,
        "squelch_sum_tokens": squelch_sum_tokens,
        "select_positions_tokens": select_positions_tokens,
        "series_median_tokens": series_median_tokens,
        "fourier_embeddings": fourier_embeddings,
        "crosscorr_embeddings": crosscorr_embeddings,
        "convolve_embeddings": convolve_embeddings,
    }


def build_oracle_sql2() -> dict:
    from .queries import _rollup_sql

    return {
        "detrend_linear_embeddings": DETREND_LINEAR_EMB_SQL,
        "correlate_embeddings": CORRELATE_EMB_SQL,
        "normalize_percentile_embeddings": NORMALIZE_PCT_EMB_SQL,
        "normalize_window_embeddings": NORMALIZE_WINDOW_EMB_SQL,
        "mean_by_window_tokens": MEAN_BY_WINDOW_SQL,
        "gap_fill_1m_events": GAP_FILL_EVENTS_SQL,
        "sketch_rollup_1m": _rollup_sql(60),
        "squelch_sum_tokens": SQUELCH_SUM_SQL,
        "select_positions_tokens": SELECT_POSITIONS_SQL,
        "series_median_tokens": SERIES_MEDIAN_SQL,
        "crosscorr_embeddings": CROSSCORR_EMB_SQL,
        "convolve_embeddings": CONVOLVE_EMB_SQL,
        # fourier: rows-only (FFT floats not SQL-reproducible)
    }
