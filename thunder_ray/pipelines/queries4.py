"""Driver-contract queries, pack 4: windowed aggregation over rolled tiers,
retention expiry, and an as-of join — the north rule's remaining named
capabilities ("windowed aggregation", "retention tiers") plus the classic
time-series operator Ray Data lacks natively (as-of join; SURVEY.md 'Custom
operators' bullet (a): composition of sort + map_groups).

Partitioning assumptions (documented per the custom-operator rule):
- rolling window + as-of join group by the series key (source / event_type):
  one group per key must fit a worker (bounded by buckets-per-retention
  horizon; shard by (key, day) beyond that).
- retention is a stateless filter — embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

ROLL_WINDOW = 5          # buckets per rolling window (ROWS 4 PRECEDING)
RETENTION_BUCKETS = 600  # keep the newest N 1m buckets per source


def _i64(arr) -> pa.Array:
    return pa.array(np.asarray(arr, dtype=np.int64), type=pa.int64())


# ---------------------------------------------------------------------------
# Rolling-window aggregate over the 1m tier (exact ints -> exact mean)

DAY_SHARD = 1440         # 1m buckets per (key, day) shard


def rolling_mean_1m(sf_dir: str, shard: int = DAY_SHARD):
    """Per (source, bucket): mean over the trailing ROLL_WINDOW present rows'
    token sums/counts (count-weighted, edges use the available prefix).
    Exact: rolling sums are int64; mean = float64(wsum)/wcnt once.

    Sharded plan (VERDICT r1 #9 — no whole-key group on one worker):
      1. tag rows with day = bucket // shard; per (source, day) shard emit
         the day's rolling output AND its tail (last ROLL_WINDOW-1 rows)
      2. a per-key pass over the day TAILS ONLY (#days x (W-1) rows — tiny)
         assembles each day's carry-in rows (the W-1 rows preceding it)
      3. shards re-grouped by (source, day) with carry rows prepended give
         bit-identical rolling sums; carry rows are dropped from output.
    """
    from .queries import rollup_documents

    tier = rollup_documents(sf_dir, 60).select_columns(
        ["source", "bucket", "count", "sum"])

    def tag(batch: pa.Table) -> pa.Table:
        b = batch["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("day", _i64(b // shard)).append_column(
            "carry", _i64(np.zeros(len(b), dtype=np.int64)))

    tagged = tier.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    def day_tail(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket")
        return g.tail(ROLL_WINDOW - 1)

    tails = tagged.groupby(["source", "day"]).map_groups(
        day_tail, batch_format="pandas")

    def carries(g: pd.DataFrame) -> pd.DataFrame:
        # g: one source's day tails; emit, for every day with rows, the
        # last W-1 rows that precede it (across any number of prior days).
        # O(D*W): each day's carry is the positional tail right before its
        # first row in the day-sorted frame — no per-day rescan of g
        # (review r5: the boolean-filter version was O(D^2) per source)
        g = g.sort_values(["day", "bucket"]).reset_index(drop=True)
        days = g["day"].to_numpy(np.int64)
        day_starts = np.flatnonzero(np.r_[True, days[1:] != days[:-1]])
        out = []
        for s in day_starts[1:]:
            p = g.iloc[max(0, s - (ROLL_WINDOW - 1)):s].copy()
            p["day"] = days[s]
            p["carry"] = 1
            out.append(p)
        if not out:
            return g.head(0)
        return pd.concat(out, ignore_index=True)

    carry = tails.groupby("source").map_groups(
        carries, batch_format="pandas").map_batches(
        lambda b: b, batch_format="pyarrow")   # arrow blocks for the union

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["bucket", "carry"])
        s = g["sum"].to_numpy(np.int64)
        c = g["count"].to_numpy(np.int64)
        # int64 cumsum difference, NOT pandas rolling().sum(): pandas
        # accumulates in float64 and a window sum past 2^53 would round
        # before the cast, silently diverging from the SQL twin's exact
        # BIGINT window SUM (review r4)
        cs = np.concatenate([[0], np.cumsum(s)])
        cc = np.concatenate([[0], np.cumsum(c)])
        lo = np.maximum(np.arange(len(s)) + 1 - ROLL_WINDOW, 0)
        ws = cs[1:] - cs[lo]
        wc = cc[1:] - cc[lo]
        keep = g["carry"].to_numpy(np.int64) == 0
        return pd.DataFrame({
            "source": g["source"].to_numpy()[keep],
            "bucket": g["bucket"].to_numpy(np.int64)[keep],
            "wsum": ws[keep],
            "wcount": wc[keep],
            "wmean": ws[keep].astype(np.float64) / wc[keep],
        })

    return tagged.union(carry).groupby(["source", "day"]).map_groups(
        roll, batch_format="pandas")


def _rolling_mean_sql() -> str:
    from .queries import _rollup_sql

    return f"""
WITH t AS ({_rollup_sql(60)})
SELECT source, CAST(bucket AS BIGINT) AS bucket,
       CAST(SUM(sum) OVER w AS BIGINT) AS wsum,
       CAST(SUM(count) OVER w AS BIGINT) AS wcount,
       CAST(SUM(sum) OVER w AS DOUBLE) / SUM(count) OVER w AS wmean
FROM t
WINDOW w AS (PARTITION BY source ORDER BY bucket
             ROWS BETWEEN {ROLL_WINDOW - 1} PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# Retention expiry: keep only the newest RETENTION_BUCKETS buckets per source

def retention_1m(sf_dir: str):
    """The retention policy applied to the 1m tier: drop buckets older than
    (per-source max bucket - RETENTION_BUCKETS).  Two passes: a tiny
    groupby-max (broadcastable cutoffs), then a stateless filter —
    the expiry never touches raw tokens."""
    from ray.data.aggregate import Max

    from .queries import rollup_documents

    tier = rollup_documents(sf_dir, 60)
    cutoffs = {
        r["source"]: int(r["max_bucket"]) - RETENTION_BUCKETS
        for r in tier.groupby("source").aggregate(
            Max("bucket", alias_name="max_bucket")).take_all()
    }
    import ray

    cut_ref = ray.put(cutoffs)

    class Keep:
        def __init__(self):
            self.cut = ray.get(cut_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            src = batch["source"].to_numpy(zero_copy_only=False)
            b = batch["bucket"].to_numpy(zero_copy_only=False)
            # dict lookup once per UNIQUE source, broadcast via codes
            uniq, code = np.unique(src, return_inverse=True)
            cuts = np.array([self.cut[s] for s in uniq], dtype=np.int64)
            return batch.filter(pa.array(b > cuts[code]))

    return tier.map_batches(Keep, concurrency=(1, 4), batch_format="pyarrow",
                            zero_copy_batch=True)


# ---------------------------------------------------------------------------
# As-of join: each event joined to the latest 1m rolled point of its
# event_type at-or-before the event's bucket (sort + merge per key group —
# the composition pattern for operators Ray Data lacks natively)

def asof_join_events_1m(sf_dir: str, shard: int = DAY_SHARD * 30):
    import ray.data as rd

    from .queries2 import _events_rollup

    tier = _events_rollup(sf_dir, 60)  # (event_type, bucket, count, sum_s)

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "event_type"])

    def ev_bucket(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        n = len(batch)
        return pa.table({
            "event_id": _i64(batch["event_id"].to_numpy(zero_copy_only=False)),
            "event_type": batch["event_type"].combine_chunks()
            if isinstance(batch["event_type"], pa.ChunkedArray) else batch["event_type"],
            "ebucket": _i64(ts_us // 1_000_000 // 60),
            "side": _i64(np.ones(n, dtype=np.int64)),
            # zero-filled so the three-way union has ONE schema: a
            # mismatched union null-promotes t_count/t_sum to float64 in
            # the pandas groups, silently rounding int64 sums past 2^53
            "t_count": _i64(np.zeros(n, dtype=np.int64)),
            "t_sum": _i64(np.zeros(n, dtype=np.int64)),
        })

    evb = ev.map_batches(ev_bucket, batch_format="pyarrow", zero_copy_batch=True)

    def tier_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": _i64(np.full(len(batch), -1, dtype=np.int64)),
            "event_type": batch["event_type"].combine_chunks()
            if isinstance(batch["event_type"], pa.ChunkedArray) else batch["event_type"],
            "ebucket": _i64(batch["bucket"].to_numpy(zero_copy_only=False)),
            "side": _i64(np.zeros(len(batch), dtype=np.int64)),
            "t_count": _i64(batch["count"].to_numpy(zero_copy_only=False)),
            "t_sum": _i64(batch["sum_s"].to_numpy(zero_copy_only=False)),
        })

    tb = tier.map_batches(tier_rows, batch_format="pyarrow", zero_copy_batch=True)

    # --- sharded by (event_type, day) (VERDICT r1 #9) -------------------
    # 1. tag both sides with day = ebucket // shard (~monthly shards:
    #    bounded groups, but coarse enough that pandas per-group fixed
    #    costs do not dominate at bench scale)
    # 2. per (key, day) reduce the TIER side to its last row; per-key pass
    #    over those lasts + the set of days present (tiny: #days rows)
    #    emits each day's carry-in tier row (running as-of state)
    # 3. shards grouped by (key, day) see their own tier rows plus the
    #    carry row, so searchsorted within the shard is globally correct.

    def tag(batch: pa.Table) -> pa.Table:
        b = batch["ebucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("day", _i64(b // shard))

    # materialized: each side is consumed twice (lasts/day-distinct AND the
    # final union) and Ray re-executes lazy lineage per consumer — without
    # this, events.parquet is re-read and re-bucketed per consumer
    evd = evb.map_batches(tag, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    tbd = tb.map_batches(tag, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()

    # last tier row per (key, day): per-batch combine + tree fan-in (the
    # tier is rolled-point scale — no keyed shuffle needed)
    def last_combine(batch: pa.Table) -> pa.Table:
        from ..stages.rollup import _factorize_source

        uniq, code = _factorize_source(batch["event_type"])
        day = batch["day"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["ebucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(day) and int(day.min()) < 0:
            # a sign-extended negative day ORed into the pack collapses all
            # keys (review r4; same guard as queries5's topk partial)
            raise ValueError("asof: pre-epoch day outside the pack range")
        key = (code << 32) | day
        order = np.lexsort((b, key))
        k = key[order]
        last = np.empty(len(k), dtype=bool)
        if len(k):
            last[-1] = True
            last[:-1] = k[1:] != k[:-1]
        sel = order[last]
        return batch.take(pa.array(sel))

    tier_lasts = tbd.map_batches(
        last_combine, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None).repartition(1).map_batches(
        last_combine, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None)

    # days that contain events (so carries target event-only days too):
    # per-batch distinct + tree fan-in instead of a keyed event shuffle
    def day_distinct(batch: pa.Table) -> pa.Table:
        from ..stages.rollup import _factorize_source

        uniq, code = _factorize_source(batch["event_type"])
        day = batch["day"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = (code << 32) | day
        uk = np.unique(key)
        src = pa.DictionaryArray.from_arrays(
            pa.array((uk >> 32).astype(np.int32)), uniq).cast(pa.string())
        return pa.table({"event_type": src,
                         "day": _i64(uk & ((1 << 32) - 1))})

    ev_days = evd.map_batches(
        day_distinct, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None).repartition(1).map_batches(
        day_distinct, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None)

    def ev_day_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "event_id": _i64(np.full(n, -1, dtype=np.int64)),
            "event_type": batch["event_type"].combine_chunks()
            if isinstance(batch["event_type"], pa.ChunkedArray) else batch["event_type"],
            "ebucket": _i64(np.full(n, -1, dtype=np.int64)),
            "side": _i64(np.full(n, 2, dtype=np.int64)),   # day marker
            "t_count": _i64(np.zeros(n, dtype=np.int64)),
            "t_sum": _i64(np.zeros(n, dtype=np.int64)),
            "day": _i64(batch["day"].to_numpy(zero_copy_only=False)),
        })

    markers = ev_days.map_batches(ev_day_rows, batch_format="pyarrow")

    def carries(g: pd.DataFrame) -> pd.DataFrame:
        # g: one key's day-last tier rows (side 0) + event-day markers
        # (side 2); walk days ascending keeping the latest tier row seen
        # BEFORE each day -> that day's carry-in row
        g = g.sort_values(["day", "side"])
        days = np.unique(g["day"].to_numpy(np.int64))
        tier_rows = g[g["side"].to_numpy(np.int64) == 0]
        td = tier_rows["day"].to_numpy(np.int64)
        out = []
        for d in days:
            prev = tier_rows[td < d]
            if len(prev):
                p = prev.tail(1).copy()
                p["day"] = d
                out.append(p)
        if not out:
            return g.head(0)
        return pd.concat(out, ignore_index=True)

    carry = tier_lasts.map_batches(
        lambda b: b, batch_format="pyarrow").union(markers).groupby(
        "event_type").map_groups(carries, batch_format="pandas").map_batches(
        lambda b: b, batch_format="pyarrow")   # arrow blocks for the union

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized as-of: tier buckets sorted, searchsorted per event
        side = g["side"].to_numpy(np.int64)
        tg = g[side == 0].sort_values("ebucket")
        eg = g[side == 1]
        tbk = tg["ebucket"].to_numpy(np.int64)
        idx = np.searchsorted(tbk, eg["ebucket"].to_numpy(np.int64), side="right") - 1
        keep = idx >= 0
        sel = idx[keep]
        return pd.DataFrame({
            "event_id": eg["event_id"].to_numpy(np.int64)[keep],
            "asof_bucket": tbk[sel],
            "asof_count": tg["t_count"].to_numpy(np.int64)[sel],
            "asof_sum": tg["t_sum"].to_numpy(np.int64)[sel],
        })

    merged = evd.union(tbd).union(carry)
    return merged.groupby(["event_type", "day"]).map_groups(
        asof, batch_format="pandas")


ASOF_JOIN_SQL = """
WITH t AS (
  SELECT event_type, bucket,
         CAST(COUNT(*) AS BIGINT) AS t_count,
         CAST(SUM(v) AS BIGINT) AS t_sum
  FROM (SELECT event_type,
               (epoch_us(ts) // 1000000) // 60 AS bucket,
               CAST(floor(value * 1000000) AS BIGINT) AS v
        FROM events)
  GROUP BY event_type, bucket
),
ev AS (
  SELECT event_id, event_type, (epoch_us(ts) // 1000000) // 60 AS ebucket
  FROM events
)
SELECT CAST(ev.event_id AS BIGINT) AS event_id,
       CAST(t.bucket AS BIGINT) AS asof_bucket,
       t.t_count AS asof_count,
       t.t_sum AS asof_sum
FROM ev ASOF JOIN t
  ON ev.event_type = t.event_type AND ev.ebucket >= t.bucket
"""


# ---------------------------------------------------------------------------
# Gap-based sessionization (streaming-window engine addition; thunder has no
# event ops — SURVEY.md 'Custom operators' bullet (a): map_batches +
# groupby().map_groups composition)

SESSION_TIMEOUT_US = 30 * 60 * 1_000_000        # 30-minute inactivity gap


def sessionize_events(sf_dir: str, timeout_us: int = SESSION_TIMEOUT_US,
                      batch_size: int | None = None):
    """Per-user sessions: consecutive events whose inter-event gap is
    <= timeout; a strictly larger gap starts a new session.  Output one row
    per (user_id, session): 1-based session_id in start order, start/end as
    int64 epoch-us, event count.

    Combiner-first plan — the raw event stream is NEVER shuffled:
      1. pre-fragment INSIDE ``map_batches``: lexsort the batch by
         (user, ts), split at user changes and gaps > timeout, emit session
         FRAGMENTS (user_id, f_start, f_end, n).  One segmented numpy pass;
         output is ~#sessions-touched-per-batch rows, so the only shuffle
         in the pipeline moves fragments, not events.
      2. one hash-partitioned merge over fragments (``groupby(part)`` with
         ``part = user_id % nparts``, a segmented kernel per partition):
         lexsort by (user, f_start), chain-merge where
         ``s[i] - running_max(e[:i]) <= timeout`` within each user run.

    Exactness under ARBITRARY batch splits (fragments of one user from
    different batches may overlap in time): sessions are the connected
    components of the "within timeout" graph on points.  (i) hull gap
    <= timeout => the two extreme points themselves link; (ii) hull gap
    > timeout vs the running-max end => every earlier point sits <= that
    end, so no pair links; (iii) overlapping hulls always link, because a
    point inside another fragment's hull lies between two of its
    consecutive points, which are <= timeout apart — so it is within
    timeout/2 of one of them.  Hence running-max chain-merge = exact
    components.  (The previous (user, day)-sharded two-shuffle plan was
    exact too, but 40k tiny pandas groups at sf0.1 cost 8s of per-group
    overhead; per-user groups are 1.5k.)

    Scale bound: fragments per (user, batch) <= batch_time_span/timeout + 1
    when storage is roughly time-ordered (true for log-structured event
    tables); the per-user merge group is #batches-touching-user fragments —
    for a pathological always-on user, re-shard the merge by (user, day)
    with the same running-max kernel (exact per the lemma above).
    Both kernels are numpy (lexsort + flatnonzero + reduceat); exact
    integer microseconds end to end, so the SQL window-function twin
    hash-matches.
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def prefrag(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(uid) == 0:
            return pa.table({c: _i64([]) for c in
                             ("user_id", "f_start", "f_end", "n")})
        order = np.lexsort((ts_us, uid))
        u, t = uid[order], ts_us[order]
        new = np.empty(len(t), dtype=bool)
        new[0] = True
        new[1:] = (u[1:] != u[:-1]) | ((t[1:] - t[:-1]) > timeout_us)
        starts = np.flatnonzero(new)
        bounds = np.append(starts, len(t))
        return pa.table({
            "user_id": _i64(u[starts]),
            "f_start": _i64(t[starts]),
            "f_end": _i64(t[bounds[1:] - 1]),
            "n": _i64(np.diff(bounds)),
        })

    # batch_size is a test hook: tiny batches force maximal fragment
    # overlap/interleave across batches to exercise the merge lemma
    fr = ev.map_batches(prefrag, batch_format="pyarrow", zero_copy_batch=True,
                        **({"batch_size": batch_size} if batch_size else {}))

    # merge is sharded by HASH PARTITION, not by user: one vectorized
    # segmented kernel per partition (lexsort + per-user cummax + reduceat)
    # instead of one pandas call per user — per-group map_groups overhead
    # was 11.6s of the 100k-event run's CPU, the segmented kernel is <0.5s.
    from ..util import sharded_merge

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        u0 = g["user_id"].to_numpy(np.int64)
        s0 = g["f_start"].to_numpy(np.int64)
        order = np.lexsort((s0, u0))
        u, s = u0[order], s0[order]
        e = g["f_end"].to_numpy(np.int64)[order]
        n = g["n"].to_numpy(np.int64)[order]
        # per-user running max of f_end (order-preserving pandas cummax)
        rme = pd.Series(e).groupby(u).cummax().to_numpy(np.int64)
        new = np.empty(len(s), dtype=bool)
        new[0] = True
        new[1:] = (u[1:] != u[:-1]) | ((s[1:] - rme[:-1]) > timeout_us)
        starts = np.flatnonzero(new)
        us = u[starts]
        newu = np.empty(len(us), dtype=bool)
        newu[0] = True
        newu[1:] = us[1:] != us[:-1]
        firsts = np.flatnonzero(newu)
        cnts = np.diff(np.append(firsts, len(us)))
        sid = np.arange(len(us), dtype=np.int64) - np.repeat(firsts, cnts) + 1
        return pd.DataFrame({
            "user_id": us,
            "session_id": sid,
            "session_start_us": s[starts],
            "session_end_us": np.maximum.reduceat(e, starts),
            "n_events": np.add.reduceat(n, starts),
        })

    return sharded_merge(fr, "user_id", merge_part)


# The twin orders window frames by (ts, event_id) so cumulative-sum session
# numbering is deterministic under duplicate timestamps (the Ray kernel is
# tie-order free by construction: membership, min, max and count do not
# depend on the order of equal timestamps).
SESSIONIZE_SQL = f"""
WITH o AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_TIMEOUT_US}
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(sid AS BIGINT) AS session_id,
       CAST(epoch_us(MIN(ts)) AS BIGINT) AS session_start_us,
       CAST(epoch_us(MAX(ts)) AS BIGINT) AS session_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, sid
"""


# ---------------------------------------------------------------------------
# Images over embeddings-as-frames (vec -> 8x8 frame of 1e6-scaled ints):
# thunder Images ops + the toseries transpose shuffle, bit-exact oracles.

def _frames_from_embeddings(sf_dir: str):
    import ray.data as rd

    from ..stages import listkernels as lk
    from ..stages import signal as sg

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def to_frames(batch: pa.Table) -> pa.Table:
        vals, offs = lk.list_parts(batch["embedding"])
        Y = np.floor(sg.as_2d(vals, offs).astype(np.float64) * 1e6).astype(np.int64)
        n = len(Y)
        return pa.table({
            "frame_id": _i64(batch["vec_id"].to_numpy(zero_copy_only=False)),
            "image": pa.ListArray.from_arrays(
                pa.array(np.arange(0, (n + 1) * 64, 64, dtype=np.int32)),
                pa.array(Y.reshape(-1))),
            "height": pa.array(np.full(n, 8, dtype=np.int32)),
            "width": pa.array(np.full(n, 8, dtype=np.int32)),
        })

    return ds.map_batches(to_frames, batch_format="pyarrow", zero_copy_batch=True)


def images_max_projection_embeddings(sf_dir: str):
    """thunder Images.max_projection (images.py:~200) over 8x8 frames."""
    from ..stages import images as im

    return im.max_projection(_frames_from_embeddings(sf_dir), axis=0)


IMAGES_MAX_PROJ_SQL = """
WITH flat AS (
  SELECT vec_id, pos % 8 AS col,
         CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS v
  FROM (SELECT vec_id, unnest(embedding) AS x,
               unnest(range(len(embedding))) AS pos FROM embeddings)
)
SELECT CAST(vec_id AS BIGINT) AS frame_id, CAST(col AS BIGINT) AS pos,
       CAST(MAX(v) AS BIGINT) AS value
FROM flat GROUP BY vec_id, col
"""


def images_toseries_stats(sf_dir: str):
    """Images.toseries transpose shuffle (thunder blocks/blocks.py) ->
    per-pixel stats across frames; oracle = plain GROUP BY pixel position,
    proving the all-to-all is lossless and bit-exact."""
    from ..stages import images as im

    series = im.toseries(_frames_from_embeddings(sf_dir), chunks=8)

    def stats(batch: pa.Table) -> pa.Table:
        from ..stages import listkernels as lk

        vals, offs = lk.list_parts(batch["series"])
        return pa.table({
            "pixel_id": _i64(batch["pixel_id"].to_numpy(zero_copy_only=False)),
            "count": _i64(lk.lengths(offs)),
            "sum": _i64(lk.seg_sum(vals, offs)),
            "min": _i64(lk.seg_min(vals, offs)),
            "max": _i64(lk.seg_max(vals, offs)),
        })

    return series.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


IMAGES_TOSERIES_SQL = """
WITH flat AS (
  SELECT pos, CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS v
  FROM (SELECT unnest(embedding) AS x,
               unnest(range(len(embedding))) AS pos FROM embeddings)
)
SELECT CAST(pos AS BIGINT) AS pixel_id,
       CAST(COUNT(*) AS BIGINT) AS count,
       CAST(SUM(v) AS BIGINT) AS sum,
       CAST(MIN(v) AS BIGINT) AS min,
       CAST(MAX(v) AS BIGINT) AS max
FROM flat GROUP BY pos
"""


def images_roundtrip_embeddings(sf_dir: str):
    """toseries -> toimages round trip (thunder Images.toseries +
    Series.toimages, series.py:~1080): frames through BOTH transpose
    shuffles must reproduce every pixel exactly.  Output is the flattened
    (frame_id, pos, value) table; frame_id is the frame RANK (toseries
    orders by frame_id and the inverse keys frames 0..t-1)."""
    from ..stages import images as im

    series = im.toseries(_frames_from_embeddings(sf_dir), chunks=8)
    frames = im.toimages(series, height=8, width=8, time_chunks=8)

    def flat(batch: pa.Table) -> pa.Table:
        from ..stages import listkernels as lk

        fid = batch["frame_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals, offs = lk.list_parts(batch["image"])
        base, rel = lk._flat(vals, offs)
        return pa.table({
            "frame_id": _i64(np.repeat(fid, np.diff(rel))),
            "pos": _i64(lk.positions(offs)),
            "value": _i64(base),
        })

    return frames.map_batches(flat, batch_format="pyarrow", zero_copy_batch=True)


IMAGES_ROUNDTRIP_SQL = """
WITH ranked AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS fid, embedding
  FROM embeddings
)
SELECT CAST(fid AS BIGINT) AS frame_id, CAST(pos AS BIGINT) AS pos,
       CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS value
FROM (SELECT fid, unnest(embedding) AS x,
             unnest(range(len(embedding))) AS pos FROM ranked)
"""


def images_map_as_series_embeddings(sf_dir: str):
    """thunder Images.map_as_series (images.py:~600) over embeddings-as-
    frames: center every pixel's time series on its across-frame mean (the
    ONE fixed expression float64(v) - float64(sum)/count, shared with the
    SQL twin).  Output frames are keyed by RANK like the roundtrip query."""
    from ..stages import images as im
    from ..stages import listkernels as lk

    frames = _frames_from_embeddings(sf_dir)
    out = im.map_as_series(
        frames,
        lambda X: X.astype(np.float64)
        - (X.sum(axis=0, dtype=np.int64).astype(np.float64) / X.shape[0])[None, :],
        grid=(2, 2), vectorized=True)

    def flat(batch: pa.Table) -> pa.Table:
        fid = batch["frame_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals, offs = lk.list_parts(batch["image"])
        base, rel = lk._flat(vals, offs)
        return pa.table({
            "frame_id": _i64(np.repeat(fid, np.diff(rel))),
            "pos": _i64(lk.positions(offs)),
            "value": pa.array(base.astype(np.float64)),
        })

    return out.map_batches(flat, batch_format="pyarrow", zero_copy_batch=True)


IMAGES_MAP_AS_SERIES_SQL = """
WITH ranked AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS fid, embedding
  FROM embeddings
),
flat AS (
  SELECT fid, pos, CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS v
  FROM (SELECT fid, unnest(embedding) AS x,
               unnest(range(len(embedding))) AS pos FROM ranked)
),
m AS (SELECT pos, CAST(SUM(v) AS BIGINT) AS s, COUNT(*) AS c FROM flat GROUP BY pos)
SELECT CAST(f.fid AS BIGINT) AS frame_id, CAST(f.pos AS BIGINT) AS pos,
       CAST(f.v AS DOUBLE) - CAST(m.s AS DOUBLE) / m.c AS value
FROM flat f JOIN m USING (pos)
"""


def images_localcorr_embeddings(sf_dir: str):
    """thunder Images.localcorr via toblocks + halo (images.py:~130/~430):
    per-pixel Pearson correlation between the pixel's time series and its
    3x3 neighbourhood-SUM series (sum == mean under correlation; integer
    aggregates keep the one float corr expression bit-reproducible)."""
    from ..stages import images as im

    return im.localcorr(_frames_from_embeddings(sf_dir), size=3, grid=(2, 2))


IMAGES_LOCALCORR_SQL = """
WITH flat AS (
  SELECT vec_id AS t, CAST(pos // 8 AS BIGINT) AS y, CAST(pos % 8 AS BIGINT) AS x,
         CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS val
  FROM (SELECT vec_id, unnest(embedding) AS v,
               unnest(range(len(embedding))) AS pos FROM embeddings)
),
nb AS (
  SELECT a.t, a.y, a.x, CAST(SUM(b.val) AS BIGINT) AS ysum
  FROM flat a JOIN flat b ON b.t = a.t
   AND b.y BETWEEN a.y - 1 AND a.y + 1 AND b.x BETWEEN a.x - 1 AND a.x + 1
  GROUP BY a.t, a.y, a.x
),
m AS (
  SELECT f.y, f.x, COUNT(*) AS tn,
         CAST(SUM(f.val) AS BIGINT) AS sx,
         CAST(SUM(f.val * f.val) AS BIGINT) AS sxx,
         CAST(SUM(n.ysum) AS BIGINT) AS sy,
         CAST(SUM(n.ysum * n.ysum) AS BIGINT) AS syy,
         CAST(SUM(f.val * n.ysum) AS BIGINT) AS sxy
  FROM flat f JOIN nb n ON n.t = f.t AND n.y = f.y AND n.x = f.x
  GROUP BY f.y, f.x
)
SELECT y, x,
  (CAST(tn AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
  / (sqrt(CAST(tn AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
     * sqrt(CAST(tn AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr
FROM m
"""


def build_queries4() -> dict:
    return {
        "rolling_mean_1m": rolling_mean_1m,
        "retention_1m": retention_1m,
        "asof_join_events_1m": asof_join_events_1m,
        "sessionize_events": sessionize_events,
        "images_max_projection_embeddings": images_max_projection_embeddings,
        "images_toseries_stats": images_toseries_stats,
        "images_roundtrip_embeddings": images_roundtrip_embeddings,
        "images_map_as_series_embeddings": images_map_as_series_embeddings,
        "images_localcorr_embeddings": images_localcorr_embeddings,
    }


def build_oracle_sql4() -> dict:
    from .queries import _rollup_sql

    retention_sql = f"""
WITH t AS ({_rollup_sql(60)})
SELECT source, bucket, count, sum, min, max, mean, m2 FROM (
  SELECT *, MAX(bucket) OVER (PARTITION BY source) AS mx FROM t
) WHERE bucket > mx - {RETENTION_BUCKETS}
"""
    return {
        "rolling_mean_1m": _rolling_mean_sql(),
        "retention_1m": retention_sql,
        "asof_join_events_1m": ASOF_JOIN_SQL,
        "sessionize_events": SESSIONIZE_SQL,
        "images_max_projection_embeddings": IMAGES_MAX_PROJ_SQL,
        "images_toseries_stats": IMAGES_TOSERIES_SQL,
        "images_roundtrip_embeddings": IMAGES_ROUNDTRIP_SQL,
        "images_map_as_series_embeddings": IMAGES_MAP_AS_SERIES_SQL,
        "images_localcorr_embeddings": IMAGES_LOCALCORR_SQL,
    }
