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


def test_exact_ledger_never_forgets_across_merges():
    """ADVICE r4: the idempotency ledger must stay exact for the actor's
    lifetime — a key ingested long ago (across many delta->base merges)
    is still recognized, so a late lineage replay can never double-fold."""
    from thunder_ray.state.sketch import ExactLedger

    led = ExactLedger()
    led._DELTA_MAX = 16          # force frequent merges
    keys = [f"batch-{i}" for i in range(500)]
    for k in keys:
        assert led.seen(k) is False
    # every historical key is still known, in any order
    for k in reversed(keys):
        assert led.seen(k) is True
    assert len(led) == 500


def test_exact_ledger_refuses_at_cap_instead_of_evicting():
    import pytest

    from thunder_ray.state.sketch import ExactLedger

    led = ExactLedger(max_keys=10)
    for i in range(10):
        assert led.seen(f"k{i}") is False
    # duplicates are still answered (no insert needed)
    assert led.seen("k3") is True
    with pytest.raises(RuntimeError, match="max_keys"):
        led.seen("k-new")
