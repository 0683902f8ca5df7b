"""Continuous-aggregate sketch: incremental ingest == batch rollup, and
idempotent re-ingest (retry safety)."""

import pandas as pd
import pytest

import ray.data as rd

from thunder_ray.stages import rollup as ru
from thunder_ray.state.sketch import ContinuousAggregate


def test_sketch_matches_batch_rollup(ray_session, tokens_table):
    ds = rd.from_arrow(tokens_table).repartition(4)
    want = (
        ru.rollup_tokens(ds, 60, batch_size=16).to_pandas()
        .sort_values(["source", "bucket"]).reset_index(drop=True)
    )

    agg = ContinuousAggregate(60, num_shards=3)
    n = agg.ingest_dataset(ds)
    assert n == tokens_table.num_rows
    got = agg.snapshot()
    pd.testing.assert_frame_equal(got, want)
    assert got["mean"].to_numpy().tobytes() == want["mean"].to_numpy().tobytes()

    # incremental: ingest a second disjoint chunk -> equals rollup over union
    from thunder_ray.synth import generate_block
    import pyarrow as pa

    more = generate_block(99, 32)
    agg.ingest_dataset(rd.from_arrow(more))
    union = pa.concat_tables([tokens_table, more])
    want2 = (
        ru.rollup_tokens(rd.from_arrow(union).repartition(3), 60, batch_size=16)
        .to_pandas().sort_values(["source", "bucket"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(agg.snapshot(), want2)


def test_sketch_idempotent_reingest(ray_session, tokens_table):
    ds = rd.from_arrow(tokens_table)
    agg = ContinuousAggregate(60, num_shards=2)
    agg.ingest_dataset(ds)
    snap1 = agg.snapshot()
    agg.ingest_dataset(ds)  # simulated task retry: same content keys
    snap2 = agg.snapshot()
    pd.testing.assert_frame_equal(snap1, snap2)
