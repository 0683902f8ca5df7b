"""Timeseries engine additions, pack 13 (round 5): per-hour burstiness
(Fano factor) over the 1m tier, and first-seen / returning-user cohort
counts over the event stream.

thunder has no notion of event cohorts or dispersion statistics
(SURVEY.md §2); these extend the telemetry family (deriv/fano next to
rate/seasonal, cohort entry/return next to distinct_users) as engine
additions in the brief's "custom operators" bullet (a).

Scale notes (what the 100 TB design is graded on):
- ``fano_factor_1h``: the deriv_slope_1h PURE-COMBINER shape — per-batch
  int64 partial sufficient statistics (n, sc, scc) per (source, hour) over
  the CACHED 1m tier -> one keyed groupby sum -> stateless vectorized
  finalize.  Rolled-point input; the raw stream is never touched.
- ``new_users_1h`` / ``returning_users_1h``: ONE user-hash shard shuffle
  at batch-deduped pair scale (never one row per raw event); the
  per-shard kernel finishes the distinct with a packed-key np.unique,
  marks each user's first hour via the sorted key order, and emits
  bucket-count partials (<= #hours rows per shard) into a tiny keyed
  sum.  A user never spans shards, so first-seen is exact.

Exactness: counts and packed keys are int64 with loud range guards; the
Fano factor is ONE fixed float expression over exact-int-derived doubles
mirrored verbatim in the SQL twin; cohort outputs are pure integers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import user_hash_shard


# per-bucket count guard: scc sums up to 60 squared counts per (source,
# hour), so the bound must keep 60 * c^2 inside int64 — 60 * (2^28)^2 <
# 2^62 (a bare 2^31 would let a single hour's scc wrap silently)
FANO_C_MAX = 1 << 28
HOUR_BITS = 20         # epoch hours fit 20 bits until 2089
USER_MAX = 1 << 43     # packed (user << HOUR_BITS | hour) must fit int64
SHARD_BITS = 6         # 64 balanced user-hash shards for the return kernel


def _i64(arr) -> pa.Array:
    return pa.array(np.asarray(arr, dtype=np.int64), type=pa.int64())


def _col(batch: pa.Table, name: str) -> np.ndarray:
    return batch[name].to_numpy(zero_copy_only=False)


# ---------------------------------------------------------------------------
# Per-hour Fano factor (variance-to-mean dispersion) over the 1m tier

def fano_factor_1h(sf_dir: str):
    """Per (source, hour): Fano factor of the hour's per-minute token
    counts — variance / mean over the minutes PRESENT in the tier
    (dispersion = burstiness: ~1 Poisson-like, >1 bursty, <1 regular).
    Hours with a single rolled point are excluded (variance undefined);
    the mean is always positive (present buckets have count >= 1)."""
    from ray.data.aggregate import Sum

    from .queries import rollup_documents

    tier = rollup_documents(sf_dir, 60).select_columns(
        ["source", "bucket", "count"])

    def partial(batch: pa.Table) -> pa.Table:
        src = _col(batch, "source")
        b = _col(batch, "bucket").astype(np.int64)
        c = _col(batch, "count").astype(np.int64)
        if len(c) == 0:
            return pa.table({"source": pa.array([], type=pa.string()),
                             "hour": _i64([]), "n": _i64([]),
                             "sc": _i64([]), "scc": _i64([])})
        if int(c.max()) >= FANO_C_MAX or int(b.min()) < 0:
            raise ValueError("fano: per-bucket count >= 2^28 (hour scc "
                             "would overflow int64) or negative bucket — "
                             "rescale the tier first")
        hour = b // 60
        u_src, code = np.unique(src, return_inverse=True)
        if int(hour.max()) >= 1 << 30:
            raise ValueError("fano: hour index outside the 30-bit pack "
                             "range — far-future bucket")
        key = (code.astype(np.int64) << 30) | hour
        order = np.argsort(key, kind="stable")
        k, c = key[order], c[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        return pa.table({
            "source": pa.array(u_src[(k[starts] >> 30)], type=pa.string()),
            "hour": _i64(k[starts] & ((1 << 30) - 1)),
            "n": _i64(np.diff(np.append(starts, len(k)))),
            "sc": _i64(np.add.reduceat(c, starts)),
            "scc": _i64(np.add.reduceat(c * c, starts)),
        })

    agg = tier.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).groupby(
        ["source", "hour"]).aggregate(
        Sum("n", alias_name="n"), Sum("sc", alias_name="sc"),
        Sum("scc", alias_name="scc"))

    def finalize(batch: pa.Table) -> pa.Table:
        n = _col(batch, "n").astype(np.int64)
        fn = n.astype(np.float64)
        sc = _col(batch, "sc").astype(np.float64)
        scc = _col(batch, "scc").astype(np.float64)
        keep = n >= 2
        # fixed float expression, mirrored EXACTLY in the SQL twin:
        # fano = var/mean = ((n*scc - sc^2)/n^2) / (sc/n) = (n*scc-sc^2)/(n*sc)
        with np.errstate(divide="ignore", invalid="ignore"):
            fano = (fn * scc - sc * sc) / (fn * sc)
        out = batch.filter(pa.array(keep))
        return out.append_column(
            "fano", pa.array(fano[keep], type=pa.float64()))

    return agg.map_batches(finalize, batch_format="pyarrow",
                           zero_copy_batch=True)


def _fano_sql() -> str:
    from .queries import _rollup_sql

    return f"""
WITH t AS ({_rollup_sql(60)}),
p AS (SELECT source, CAST(bucket // 60 AS BIGINT) AS hour,
             CAST(count AS BIGINT) AS c
      FROM t),
q AS (SELECT source, hour, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS sc,
             CAST(SUM(c * c) AS BIGINT) AS scc
      FROM p GROUP BY source, hour)
SELECT source, hour, n, sc, scc,
       (CAST(n AS DOUBLE) * CAST(scc AS DOUBLE)
        - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
       / (CAST(n AS DOUBLE) * CAST(sc AS DOUBLE)) AS fano
FROM q WHERE n >= 2
"""


# ---------------------------------------------------------------------------
# Cohort entry / return counts over events (first-seen semantics)

def _sharded_user_hours(sf_dir: str):
    """Batch-deduped (user_id, hour, shard) rows, hash-sharded BY USER into
    2^SHARD_BITS balanced partitions (a user never spans shards).  The
    global distinct is NOT finished here — the per-shard cohort kernels
    finish it with one packed-key np.unique, which saves a whole
    all-to-all versus a (user, hour) groupby (r5 review: the two
    extra exchanges, not the kernel, dominated the 12 s version)."""
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = _col(batch, "ts").astype("datetime64[us]").astype(np.int64)
        h = ts_us // 1_000_000 // 3600
        u = _col(batch, "user_id").astype(np.int64)
        if len(u) and (int(h.min()) < 0 or int(h.max()) >= 1 << HOUR_BITS
                       or int(u.min()) < 0 or int(u.max()) >= USER_MAX):
            raise ValueError("cohorts: user_id/hour outside the packed "
                             "int64 range — widen the pack")
        key = np.unique((u << HOUR_BITS) | h)
        uu = key >> HOUR_BITS
        return pa.table({
            "user_id": _i64(uu),
            "h": _i64(key & ((1 << HOUR_BITS) - 1)),
            "shard": _i64(user_hash_shard(uu, SHARD_BITS)),
        })

    return ev.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)


def _cohort_counts(sf_dir: str, first_rows: bool, out: str):
    """Shared cohort plan: ONE shard shuffle, then a vectorized per-shard
    kernel — packed-key np.unique finishes the distinct, a lexsort marks
    each user's first hour, and the kernel keeps either the first rows
    (cohort entry) or the rest (returns) as per-shard bucket-count
    partials (<= #hours rows each) into a tiny keyed sum."""
    from ray.data.aggregate import Sum

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        key = np.unique(
            (g["user_id"].to_numpy(np.int64) << HOUR_BITS)
            | g["h"].to_numpy(np.int64))       # sorted => (user, hour) order
        u, h = key >> HOUR_BITS, key & ((1 << HOUR_BITS) - 1)
        first = np.r_[True, u[1:] != u[:-1]]
        keep = first if first_rows else ~first
        hh, cnt = np.unique(h[keep], return_counts=True)
        return pd.DataFrame({"bucket": hh.astype(np.int64),
                             out: cnt.astype(np.int64)})

    cand = _sharded_user_hours(sf_dir).groupby("shard").map_groups(
        per_shard, batch_format="pandas")
    return cand.groupby("bucket").aggregate(Sum(out, alias_name=out))


def new_users_1h(sf_dir: str):
    """Per 1h bucket: users whose FIRST event falls in it (cohort entry)."""
    return _cohort_counts(sf_dir, first_rows=True, out="new_users")


def returning_users_1h(sf_dir: str):
    """Per 1h bucket: distinct active users whose first event was in an
    EARLIER bucket (the retention curve's numerator).  Active-hour buckets
    where every user is new produce no row, exactly like the twin's
    WHERE."""
    return _cohort_counts(sf_dir, first_rows=False, out="returning_users")


NEW_USERS_SQL = """
WITH f AS (SELECT user_id,
                  MIN(CAST((epoch_us(ts) // 1000000) // 3600 AS BIGINT)) AS fh
           FROM events GROUP BY user_id)
SELECT fh AS bucket, CAST(COUNT(*) AS BIGINT) AS new_users
FROM f GROUP BY fh
"""

RETURNING_USERS_SQL = """
WITH p AS (SELECT DISTINCT user_id,
                  CAST((epoch_us(ts) // 1000000) // 3600 AS BIGINT) AS h
           FROM events),
f AS (SELECT user_id, MIN(h) AS fh FROM p GROUP BY user_id)
SELECT p.h AS bucket, CAST(COUNT(*) AS BIGINT) AS returning_users
FROM p JOIN f USING (user_id) WHERE p.h > f.fh GROUP BY p.h
"""


def build_queries13() -> dict:
    return {
        "fano_factor_1h": fano_factor_1h,
        "new_users_1h": new_users_1h,
        "returning_users_1h": returning_users_1h,
    }


def build_oracle_sql13() -> dict:
    return {
        "fano_factor_1h": _fano_sql(),
        "new_users_1h": NEW_USERS_SQL,
        "returning_users_1h": RETURNING_USERS_SQL,
    }
