"""End-to-end tier pipeline: checkpoint/resume ≡ single-shot; gap-fill."""

import os

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from thunder_ray.pipelines import tiers as tp
from thunder_ray.stages import gapfill, rollup as ru
from thunder_ray.synth import write_tokens_parquet


@pytest.fixture(scope="module")
def tokens_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tokens")
    return write_tokens_parquet(str(d / "tok"), rows=600, rows_per_block=75)


def tier_frames(out_root):
    out = {}
    for tier in ("1m", "1h", "1d"):
        df = tp.read_tier(out_root, tier).to_pandas()
        out[tier] = df.sort_values(["source", "bucket"]).reset_index(drop=True)
    return out


def test_run_rollup_and_resume(ray_session, tokens_dir, tmp_path):
    single = str(tmp_path / "single")
    m1 = tp.run_rollup(tokens_dir, single, files_per_shard=2, batch_size=64)
    assert m1["shards_run"] == 4 and m1["shards_skipped"] == 0
    assert m1["points_1m"] > m1["points_1h"] >= m1["points_1d"] >= 1

    # kill after 2 shards, then resume — must equal the single-shot run
    resumed = str(tmp_path / "resumed")
    with pytest.raises(RuntimeError, match="injected failure"):
        tp.run_rollup(tokens_dir, resumed, files_per_shard=2, batch_size=64,
                      fail_after_shards=2)
    m2 = tp.run_rollup(tokens_dir, resumed, files_per_shard=2, batch_size=64)
    assert m2["shards_skipped"] == 2 and m2["shards_run"] == 2

    a, b = tier_frames(single), tier_frames(resumed)
    for tier in ("1m", "1h", "1d"):
        pd.testing.assert_frame_equal(a[tier], b[tier])
        # bit-identical floats
        assert a[tier]["mean"].to_numpy().tobytes() == b[tier]["mean"].to_numpy().tobytes()

    # manifests carry lineage + metrics
    import json, glob
    man = sorted(glob.glob(os.path.join(single, "_manifest", "1m", "*.json")))
    assert len(man) == 4
    payload = json.load(open(man[0]))
    assert payload["input_files"] and payload["partial_rows"] > 0 and payload["wall_seconds"] >= 0


def test_gap_fill(ray_session):
    import pyarrow as pa

    # source 'a' has buckets 0, 3 -> fill 1, 2 with interpolated means
    t = pa.table({
        "source": ["a", "a", "b"],
        "bucket": pa.array([0, 3, 5], type=pa.int64()),
        "count": pa.array([2, 2, 1], type=pa.int64()),
        "sum": pa.array([10, 40, 7], type=pa.int64()),
        "sumsq": pa.array([60, 820, 49], type=pa.int64()),
        "min": pa.array([4, 19, 7], type=pa.int32()),
        "max": pa.array([6, 21, 7], type=pa.int32()),
        "mean": pa.array([5.0, 20.0, 7.0]),
        "m2": pa.array([2.0, 2.0, 0.0]),
    })
    got = gapfill.gap_fill(rd.from_arrow(t)).to_pandas()
    got = got.sort_values(["source", "bucket"]).reset_index(drop=True)
    a = got[got["source"] == "a"]
    assert a["bucket"].tolist() == [0, 1, 2, 3]
    np.testing.assert_allclose(a["mean"].to_numpy(), [5.0, 10.0, 15.0, 20.0])
    assert a["gap_filled"].tolist() == [False, True, True, False]
    assert a[a["gap_filled"]]["count"].tolist() == [0, 0]
    b = got[got["source"] == "b"]
    assert b["gap_filled"].tolist() == [False]

    # matches the local oracle kernel
    local = gapfill.gap_fill_local(t.to_pandas()).sort_values(["source", "bucket"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"min": "Int32", "max": "Int32"}), local.astype({"min": "Int32", "max": "Int32"})
    )


def test_resume_with_changed_sharding_recomputes(ray_session, tokens_dir,
                                                 tmp_path):
    """A resumed run whose shard -> file mapping changed (different
    files_per_shard) must NOT trust stale manifests by shard id alone, and
    stage 2 must not sweep stale higher-id shard dirs — the tiers must
    equal a fresh run's bit-for-bit."""
    fresh = str(tmp_path / "fresh")
    tp.run_rollup(tokens_dir, fresh, files_per_shard=1, batch_size=64)

    resharded = str(tmp_path / "resharded")
    m1 = tp.run_rollup(tokens_dir, resharded, files_per_shard=1,
                       batch_size=64)
    assert m1["shards_total"] == 8
    # resume the SAME out_root with coarser sharding: shard ids now map to
    # different file sets, and shards 4..7 from the first run are stale
    m2 = tp.run_rollup(tokens_dir, resharded, files_per_shard=2,
                       batch_size=64)
    assert m2["shards_total"] == 4
    assert m2["shards_run"] == 4 and m2["shards_skipped"] == 0

    a, b = tier_frames(fresh), tier_frames(resharded)
    for tier in ("1m", "1h", "1d"):
        pd.testing.assert_frame_equal(a[tier], b[tier])


def test_read_tier_column_pruning(ray_session, tokens_dir, tmp_path):
    """read_tier(columns=...) returns exactly the requested projection and
    still drops the hive-inferred `tier` partition column (VERDICT r3 #6 —
    the pruned path a spike/rolling-style consumer uses)."""
    out = str(tmp_path / "pruned")
    tp.run_rollup(tokens_dir, out, files_per_shard=2, batch_size=64)
    full = tp.read_tier(out, "1m").to_pandas()
    slim = tp.read_tier(out, "1m",
                        columns=["source", "bucket", "mean"]).to_pandas()
    assert sorted(slim.columns) == ["bucket", "mean", "source"]
    pd.testing.assert_frame_equal(
        slim.sort_values(["source", "bucket"]).reset_index(drop=True),
        full[["source", "bucket", "mean"]]
            .sort_values(["source", "bucket"]).reset_index(drop=True))


def test_incremental_append(ray_session, tmp_path):
    """Tier maintenance: after new input files land (sorting after the old
    ones), a rerun pays raw cost only for the NEW shards and produces
    tiers bit-equal to a from-scratch rollup of the full input."""
    import shutil

    full = write_tokens_parquet(str(tmp_path / "full"), rows=600,
                                rows_per_block=75)          # 8 part files
    parts = sorted(os.path.join(full, f"part-{i:05d}.parquet")
                   for i in range(8))
    inc = str(tmp_path / "inc")
    os.makedirs(inc)
    for p in parts[:4]:
        shutil.copy(p, inc)

    out = str(tmp_path / "out")
    m1 = tp.run_rollup(inc, out, files_per_shard=2, batch_size=64)
    assert m1["shards_run"] == 2 and m1["shards_skipped"] == 0

    for p in parts[4:]:                                     # data lands
        shutil.copy(p, inc)
    m2 = tp.run_rollup(inc, out, files_per_shard=2, batch_size=64)
    assert m2["shards_total"] == 4
    assert m2["shards_skipped"] == 2 and m2["shards_run"] == 2

    scratch = str(tmp_path / "scratch")
    tp.run_rollup(inc, scratch, files_per_shard=2, batch_size=64)
    a, b = tier_frames(out), tier_frames(scratch)
    for tier in ("1m", "1h", "1d"):
        pd.testing.assert_frame_equal(a[tier], b[tier])
