"""Flagship pipeline: raw tokens -> 1m -> 1h -> 1d retention tiers, with
per-shard checkpoint / lineage / metrics and resume (north rule; SURVEY.md
§4.1 'checkpoint/resume' row, mirroring thunder's conf.json sidecar idea
scaled up — thunder/series/writers.py:~10).

Layout under ``out_root``::

    partials_1m/shard=00000/part-*.parquet   # stage 1: per-shard 1m partials
    _manifest/1m/shard-00000.json            # lineage + metrics per shard
    tier=1m/  tier=1h/  tier=1d/             # stage 2: merged + finalized

Stage 1 is the expensive pass over raw tokens; it is resumable at shard
granularity (a shard = a group of input parquet files).  Each shard's
output directory is written atomically (tmp dir + rename) and recorded in a
manifest JSON carrying the input-file lineage, row/point counts, bytes and
wall time — a rerun skips shards whose manifest entry exists.  Stage 2
(merge partials -> finalize -> re-rollup 1m->1h->1d) touches only rolled
points (tiny vs raw) and is idempotently rerun on resume.

At 100 TB: shards map to input directories/row-group ranges; stage 1 runs
one Ray Data pipeline per shard using the whole cluster, so object-store
pressure is bounded by one shard's tokens regardless of total input size.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

from ..schema import TIERS
from ..stages import rollup as ru


def _atomic_write_dir(ds, final_dir: str):
    tmp = final_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ds.write_parquet(tmp)
    if os.path.exists(final_dir):
        shutil.rmtree(final_dir)
    os.replace(tmp, final_dir)


def _manifest_path(out_root: str, tier: str, shard_id: int) -> str:
    return os.path.join(out_root, "_manifest", tier, f"shard-{shard_id:05d}.json")


def _write_manifest(path: str, payload: dict):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def list_input_shards(input_path: str, files_per_shard: int = 4) -> list[list[str]]:
    """Deterministic sharding of the input file list (sorted, grouped)."""
    if os.path.isdir(input_path):
        files = sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    else:
        files = [input_path]
    if not files:
        raise FileNotFoundError(f"no parquet under {input_path}")
    return [files[i: i + files_per_shard] for i in range(0, len(files), files_per_shard)]


def rollup_shard(files: list[str], tier_seconds: int, t0_column: str | None,
                 batch_size: int | None):
    """One shard's raw->tier partials as a (lazy) Dataset."""
    from ..sources.tokens import read_tokens

    cols = ["doc_id", "tokens", "source"] + ([t0_column] if t0_column else [])
    # one block per input file: avoids Ray's ~1MB block splitting (tiny tasks)
    ds = read_tokens(files, columns=cols, override_num_blocks=len(files))
    return ds.map_batches(
        ru.BucketizePartials(tier_seconds, t0_column=t0_column),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size,
    )


def run_rollup(
    input_path: str,
    out_root: str,
    base_tier: str = "1m",
    tiers: tuple = ("1m", "1h", "1d"),
    t0_column: str | None = None,
    files_per_shard: int = 4,
    batch_size: int | None = None,
    resume: bool = True,
    fail_after_shards: int | None = None,
    merge_strategy: str = "auto",
    expected_groups: int | None = None,
) -> dict:
    """Run (or resume) the full tier pipeline.  Returns summary metrics.

    ``fail_after_shards`` is a fault-injection hook for the kill/resume test.

    INCREMENTAL APPEND: rerunning after new input files landed is the tier
    MAINTENANCE path — shards whose manifest lineage still matches are
    skipped (only the new data pays the raw scan), and stage 2 re-merges
    the per-shard partials into fresh tiers at rolled-point cost (~1e4x
    smaller than raw).  Bit-equal to a from-scratch rollup of the full
    input because integer partials compose exactly (pinned by
    test_pipeline.test_incremental_append).  Appended files must sort
    AFTER the existing ones (time-ordered ingest naming) so the
    deterministic sharding of the old files is unchanged; a rename that
    reshuffles the grouping is caught by the lineage check and simply
    recomputes — never silently double-counts.
    """
    os.makedirs(out_root, exist_ok=True)
    base_seconds = TIERS[base_tier]
    shards = list_input_shards(input_path, files_per_shard)
    metrics = {"shards_total": len(shards), "shards_run": 0, "shards_skipped": 0}

    # ---- stage 1: per-shard raw -> base-tier partials (resumable) ----
    done = 0
    for sid, files in enumerate(shards):
        mpath = _manifest_path(out_root, base_tier, sid)
        out_dir = os.path.join(out_root, f"partials_{base_tier}", f"shard={sid:05d}")
        if resume and os.path.exists(mpath) and os.path.exists(out_dir):
            # lineage check: a manifest is only trusted if it was computed
            # over THIS shard's exact file list — a resumed run with a
            # different files_per_shard or a changed input dir must redo
            # the shard, never silently reuse mismatched partials
            with open(mpath) as f:
                recorded = json.load(f).get("input_files")
            if recorded == files:
                metrics["shards_skipped"] += 1
                continue
        if fail_after_shards is not None and done >= fail_after_shards:
            raise RuntimeError(f"injected failure after {done} shards")
        t_start = time.perf_counter()
        ds = rollup_shard(files, base_seconds, t0_column, batch_size)
        _atomic_write_dir(ds, out_dir)
        wall = time.perf_counter() - t_start
        out_files = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
        n_rows = sum(_parquet_rows(f) for f in out_files)
        _write_manifest(mpath, {
            "shard": sid,
            "tier": base_tier,
            "input_files": files,
            "output_dir": out_dir,
            "partial_rows": n_rows,
            "output_bytes": sum(os.path.getsize(f) for f in out_files),
            "wall_seconds": round(wall, 4),
        })
        metrics["shards_run"] += 1
        done += 1

    # ---- stage 2: merge partials -> finalized tiers (idempotent) ----
    import ray.data as rd

    # read EXACTLY this run's shard set (never a bare shard=* glob: stale
    # higher-id dirs from a previous run with different sharding, or
    # leftover shard=NNNNN.tmp dirs, must not be double-counted)
    partial_files = sorted(
        f
        for sid in range(len(shards))
        for f in glob.glob(os.path.join(
            out_root, f"partials_{base_tier}", f"shard={sid:05d}", "*.parquet"))
    )
    merged = ru.merge_partials(rd.read_parquet(partial_files),
                               strategy=merge_strategy,
                               expected_groups=expected_groups)
    base = merged.map_batches(ru.finalize_tier, batch_format="pyarrow", zero_copy_batch=True)
    _atomic_write_dir(base, os.path.join(out_root, f"tier={base_tier}"))
    metrics[f"points_{base_tier}"] = _dir_rows(os.path.join(out_root, f"tier={base_tier}"))

    prev = base_tier
    for tier in tiers:
        if tier == base_tier:
            continue
        if TIERS[tier] <= TIERS[prev] or TIERS[tier] % TIERS[prev] != 0:
            raise ValueError(
                f"tiers must be ascending and divisible: {prev} -> {tier} "
                f"({TIERS[prev]}s -> {TIERS[tier]}s)")
        factor = TIERS[tier] // TIERS[prev]
        prev_ds = rd.read_parquet(
            sorted(glob.glob(os.path.join(out_root, f"tier={prev}", "*.parquet")))
        )
        _atomic_write_dir(
            ru.rerollup(prev_ds, factor, merge_strategy=merge_strategy,
                        expected_groups=expected_groups),
            os.path.join(out_root, f"tier={tier}"))
        metrics[f"points_{tier}"] = _dir_rows(os.path.join(out_root, f"tier={tier}"))
        prev = tier

    _write_manifest(os.path.join(out_root, "_manifest", "summary.json"), metrics)
    return metrics


def rollup_streaming(input_path: str, out_root: str | None = None,
                     t0_column: str | None = None,
                     batch_size: int | None = None,
                     merge_strategy: str = "auto",
                     expected_groups: int | None = None) -> dict:
    """Fused, non-checkpointed tier chain: ONE streaming pipeline raw->1m,
    then in-memory re-rollups 1m->1h->1d (tier outputs are orders of
    magnitude smaller than raw, so materializing them is safe at any scale).

    This is the throughput path (bench headline): no per-shard partial
    parquet round-trips — fault tolerance comes from Ray's task retries
    instead of shard manifests.  Use :func:`run_rollup` when you need
    mid-job resumability on preemptible clusters.

    Returns ``{"points_1m": .., "points_1h": .., "points_1d": ..}``.
    """
    from ..sources.tokens import read_tokens

    cols = ["doc_id", "tokens", "source"] + ([t0_column] if t0_column else [])
    # reuse the shard lister's listing + empty-dir refusal (review r4: the
    # inline duplicate skipped the FileNotFoundError guard)
    paths = [f for shard in list_input_shards(input_path, 1) for f in shard]
    ds = read_tokens(paths, columns=cols, override_num_blocks=len(paths))
    partials = ds.map_batches(
        ru.BucketizePartials(TIERS["1m"], t0_column=t0_column),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size,
    )
    merged = ru.merge_partials(partials, strategy=merge_strategy,
                               expected_groups=expected_groups)
    # repartition(1) guarantees finalize_all_tiers sees the WHOLE merged 1m
    # tier as ONE batch: the merge's final combine is a map task whose
    # output Ray may dynamically split into several blocks, and a per-block
    # re-rollup would emit duplicate partially-aggregated 1h/1d rows for
    # buckets straddling a block boundary.  The exchange moves rolled
    # points only (~1e4x smaller than raw); like merge strategy="tree",
    # this path requires the finalized tier to fit one task — use
    # run_rollup + rerollup for beyond-heap tiers.
    all_tiers = merged.repartition(1).map_batches(
        ru.finalize_all_tiers, batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None,
    ).materialize()
    metrics = {}
    if out_root:
        # ONE partitioned write fans all tiers out to tier=X/ dirs (the
        # partition column is excluded from the data files); per-tier point
        # counts come free from parquet metadata — no per-tier filter/count
        # executions (they cost ~6 extra scheduler round-trips).
        tmp = out_root + ".tmp_tiers"
        shutil.rmtree(tmp, ignore_errors=True)
        all_tiers.write_parquet(tmp, partition_cols=["tier"])
        os.makedirs(out_root, exist_ok=True)
        for tier in ("1m", "1h", "1d"):
            src = os.path.join(tmp, f"tier={tier}")
            dst = os.path.join(out_root, f"tier={tier}")
            if not os.path.exists(src):
                metrics[f"points_{tier}"] = 0
                continue
            if os.path.exists(dst):
                shutil.rmtree(dst)
            os.replace(src, dst)
            metrics[f"points_{tier}"] = _dir_rows(dst)
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        for r in all_tiers.groupby("tier").count().take_all():
            cnt = r.get("count()", r.get("count"))
            metrics[f"points_{r['tier']}"] = int(cnt)
    return metrics


def _parquet_rows(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.read_metadata(path).num_rows


def _dir_rows(d: str) -> int:
    return sum(_parquet_rows(f) for f in sorted(glob.glob(os.path.join(d, "*.parquet"))))


def read_tier(out_root: str, tier: str, columns=None):
    """Read a written tier directory; pass ``columns=`` so consumers that
    only need a subset (spike/rolling: source, bucket, mean) never pull the
    full rolled schema off storage (VERDICT r3 #6)."""
    import ray.data as rd

    ds = rd.read_parquet(
        sorted(glob.glob(os.path.join(out_root, f"tier={tier}", "*.parquet"))),
        columns=columns)
    # Ray hive-infers a `tier` column from the `tier=X` dir name; drop it to
    # keep the rolled-point schema canonical.
    if "tier" in ds.schema().names:
        ds = ds.drop_columns(["tier"])
    return ds
