"""Merge strategies and pipeline variants must agree bit-for-bit:
tree combiner == salted groupby == checkpointed == fused streaming
(the integer-moment order-independence guarantee, SURVEY.md §4.2)."""

import glob
import os

import pandas as pd
import pytest

from thunder_ray import synth
from thunder_ray.stages import rollup as ru


def _sorted_df(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return df.sort_values(["source", "bucket"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def tokens_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(synth.generate_table(800))


def test_tree_equals_salted_groupby(tokens_ds):
    a = _sorted_df(ru.rollup_tokens(tokens_ds, 3600))
    b = _sorted_df(ru.rollup_tokens(tokens_ds, 3600, salt=4))
    pd.testing.assert_frame_equal(a, b)


def test_tree_equals_plain_groupby(tokens_ds):
    partials = tokens_ds.map_batches(
        ru.BucketizePartials(3600), batch_format="pyarrow", zero_copy_batch=True)
    a = _sorted_df(ru.merge_partials(partials, strategy="tree").map_batches(
        ru.finalize_tier, batch_format="pyarrow"))
    partials2 = tokens_ds.map_batches(
        ru.BucketizePartials(3600), batch_format="pyarrow", zero_copy_batch=True)
    b = _sorted_df(ru.merge_partials(partials2, strategy="groupby").map_batches(
        ru.finalize_tier, batch_format="pyarrow"))
    pd.testing.assert_frame_equal(a, b)


def test_auto_strategy_selects_by_cardinality(tokens_ds):
    """auto == tree below TREE_MAX_GROUPS, == groupby above; results
    bit-identical either way (integer-moment order independence)."""
    def roll(expected_groups):
        p = tokens_ds.map_batches(ru.BucketizePartials(3600),
                                  batch_format="pyarrow", zero_copy_batch=True)
        return _sorted_df(ru.merge_partials(
            p, strategy="auto", expected_groups=expected_groups).map_batches(
            ru.finalize_tier, batch_format="pyarrow"))

    small = roll(expected_groups=10)                      # tree path
    big = roll(expected_groups=ru.TREE_MAX_GROUPS + 1)    # groupby path
    pd.testing.assert_frame_equal(small, big)


def test_tree_guard_refuses_runaway_cardinality(tokens_ds, monkeypatch):
    """An under-estimated group count must raise, not silently bottleneck."""
    monkeypatch.setattr(ru, "TREE_MAX_GROUPS", 3)
    p = tokens_ds.map_batches(ru.BucketizePartials(60),
                              batch_format="pyarrow", zero_copy_batch=True)
    merged = ru.merge_partials(p, strategy="tree")
    with pytest.raises(Exception) as ei:
        merged.materialize()
    assert "TreeMergeOverflowError" in str(ei.value) or isinstance(
        ei.value, ru.TreeMergeOverflowError)


def test_streaming_equals_checkpointed(ray_session, tmp_path):
    import ray.data as rd

    inp = str(tmp_path / "tokens")
    synth.write_tokens_parquet(inp, 600, rows_per_block=150)

    m_stream = __import__("thunder_ray.pipelines.tiers", fromlist=["x"]).rollup_streaming(
        inp, str(tmp_path / "out_stream"))
    from thunder_ray.pipelines.tiers import run_rollup

    m_ckpt = run_rollup(inp, str(tmp_path / "out_ckpt"), files_per_shard=2)

    for tier in ("1m", "1h", "1d"):
        assert m_stream[f"points_{tier}"] == m_ckpt[f"points_{tier}"]
        a = pd.read_parquet(sorted(glob.glob(
            os.path.join(tmp_path, "out_stream", f"tier={tier}", "*.parquet"))))
        b = pd.read_parquet(sorted(glob.glob(
            os.path.join(tmp_path, "out_ckpt", f"tier={tier}", "*.parquet"))))
        a = a.sort_values(["source", "bucket"]).reset_index(drop=True)
        b = b.sort_values(["source", "bucket"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
