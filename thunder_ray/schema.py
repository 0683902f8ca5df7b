"""Canonical schemas + time semantics for the rollup engine.

The engine's one logical input table (BASELINE.json ``input_hint``)::

    doc_id: string      # record key  (thunder: the key tuple)
    tokens: list<int32> # the Series value axis (pre-tokenized sequence)
    n_tok:  int32       # = len(tokens), denormalized
    source: string      # grouping key for rollups; skewed in practice

Time semantics (fixed spec, see FIXTURES.md F1): token position ``i`` of a
document maps to timestamp ``t0(doc) + i`` seconds, where
``t0(doc) = stable_hash(doc_id) % 86_400``.  Retention tiers bucket the
timestamp by 60 / 3600 / 86400 seconds (raw -> 1m -> 1h -> 1d).

A rolled-up point at tier ``T`` is
``(source, bucket, count, sum, min, max, mean, m2)`` — exactly thunder's
``series_stats`` vocabulary (thunder/series/series.py:~540) applied per
bucket.  Internally tiers also carry ``sumsq`` (exact int64 sum of squares)
so that re-rollups (1m -> 1h -> 1d) stay bit-exact: integer moments are
order-independent under merge, which is how this engine achieves
bit-identical rolled points under arbitrary parallelism (SURVEY.md §4.2).

``mean`` and ``m2`` are derived with ONE fixed float64 expression::

    mean = float64(sum) / count
    m2   = float64(sumsq) - float64(sum) * float64(sum) / count

which is reproducible bit-for-bit by any engine (incl. the DuckDB oracle)
that evaluates the same expression on the same exact integer moments.

Overflow bound: ``sumsq`` is int64; with token values < 50_257 a single
(source, bucket) group stays exact up to ~3.6e9 tokens.  Beyond that
(extreme day-tier groups at 100 TB) switch the merge to the float
Chan/Welford path in :mod:`thunder_ray.functions.moments`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# ---------------------------------------------------------------------------
# Schemas

TOKENS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
    ]
)

# Internal tier storage schema (carries sumsq for exact re-rollup).
TIER_SCHEMA = pa.schema(
    [
        pa.field("source", pa.string()),
        pa.field("bucket", pa.int64()),
        pa.field("count", pa.int64()),
        pa.field("sum", pa.int64()),
        pa.field("sumsq", pa.int64()),
        pa.field("min", pa.int32()),
        pa.field("max", pa.int32()),
    ]
)

# Public rolled-point schema (FIXTURES.md F1).
ROLLED_POINT_COLUMNS = ["source", "bucket", "count", "sum", "min", "max", "mean", "m2"]

# Retention tiers, seconds per bucket.
TIERS = {"raw": 1, "1m": 60, "1h": 3600, "1d": 86400}
TIER_ORDER = ["1m", "1h", "1d"]

DAY_SECONDS = 86_400

# Token vocabulary bound used by the synthetic generator (GPT-2-ish).
VOCAB_SIZE = 50_257


# ---------------------------------------------------------------------------
# Stable hashing / t0

def stable_hash_strings(arr) -> np.ndarray:
    """Deterministic uint64 hash of a string array, stable across processes.

    Uses pandas' SipHash-1-3 (``pd.util.hash_array`` with the documented
    fixed key) — vectorized and process-independent, unlike ``hash()``.
    """
    values = np.asarray(arr, dtype=object)
    return pd.util.hash_array(values, categorize=False)


def t0_for_doc_ids(doc_ids) -> np.ndarray:
    """``t0(doc) = stable_hash(doc_id) % 86_400`` as int64 seconds.

    Integer doc_ids (e.g. the driver ``documents`` table) use
    ``doc_id % 86_400`` directly so the DuckDB oracle can reproduce t0 in
    plain SQL; string doc_ids use :func:`stable_hash_strings`.
    """
    a = np.asarray(doc_ids)
    if np.issubdtype(a.dtype, np.integer):
        return (a.astype(np.int64) % DAY_SECONDS).astype(np.int64)
    if a.dtype.kind in ("U", "O", "S"):
        # Fast path for canonical synthetic ids "doc-%08d": hash the numeric
        # suffix is NOT used — spec is the string hash; keep it uniform.
        return (stable_hash_strings(a) % DAY_SECONDS).astype(np.int64)
    raise TypeError(f"unsupported doc_id dtype: {a.dtype}")


def derive_mean_m2(count: np.ndarray, total: np.ndarray, sumsq: np.ndarray):
    """The ONE fixed expression producing mean/m2 from exact integer moments.

    Mirrored verbatim by the DuckDB oracle SQL in ``__ray_entry__`` so float
    results are bit-identical.
    """
    count = np.asarray(count, dtype=np.int64)
    s = np.asarray(total, dtype=np.float64)
    q = np.asarray(sumsq, dtype=np.float64)
    mean = s / count
    m2 = q - s * s / count
    return mean, m2
