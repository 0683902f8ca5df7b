"""Tier rollup vs the naive NumPy oracle — bit-identical rolled points
(the north rule's correctness gate), plus re-rollup and salting equivalence."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from thunder_ray.reference import oracle
from thunder_ray.stages import rollup as ru
from thunder_ray.stages import listkernels as lk


def to_sorted_pdf(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return df.sort_values(["source", "bucket"]).reset_index(drop=True)


def oracle_pdf(tbl: dict) -> pd.DataFrame:
    df = pd.DataFrame({k: v for k, v in tbl.items()})
    return df.sort_values(["source", "bucket"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def tokens_rows(tokens_table):
    vals, offs = lk.list_parts(tokens_table["tokens"])
    rows = [vals[offs[i]: offs[i + 1]] for i in range(len(offs) - 1)]
    return (
        tokens_table["doc_id"].to_pylist(),
        rows,
        tokens_table["source"].to_pylist(),
    )


@pytest.mark.parametrize("tier", [60, 3600])
def test_rollup_bit_identical(ray_session, tokens_table, tokens_rows, tier):
    ds = rd.from_arrow(tokens_table).repartition(4)
    got = to_sorted_pdf(ru.rollup_tokens(ds, tier, batch_size=16))
    doc_ids, rows, sources = tokens_rows
    want = oracle_pdf(oracle.rollup_table(doc_ids, rows, sources, tier))
    assert got["source"].tolist() == want["source"].tolist()
    for col in ["bucket", "count", "sum", "sumsq", "min", "max"]:
        np.testing.assert_array_equal(got[col].to_numpy(), want[col].to_numpy(), err_msg=col)
    # float columns must be BIT-identical (fixed derivation expression)
    for col in ["mean", "m2"]:
        assert (
            got[col].to_numpy().tobytes() == want[col].to_numpy().tobytes()
        ), f"{col} not bit-identical"


def test_rerollup_equals_direct(ray_session, tokens_table):
    """1m -> 1h re-rollup must equal rolling raw directly to 1h, bit-for-bit."""
    ds = rd.from_arrow(tokens_table).repartition(4)
    t1m = ru.rollup_tokens(ds, 60, batch_size=16).materialize()
    via = to_sorted_pdf(ru.rerollup(t1m, 60))
    direct = to_sorted_pdf(ru.rollup_tokens(ds, 3600, batch_size=16))
    pd.testing.assert_frame_equal(via, direct)


def test_salted_equals_unsalted(ray_session, tokens_table):
    ds = rd.from_arrow(tokens_table).repartition(4)
    plain = to_sorted_pdf(ru.rollup_tokens(ds, 60, batch_size=16))
    salted = to_sorted_pdf(ru.rollup_tokens(ds, 60, batch_size=16, salt=8))
    pd.testing.assert_frame_equal(plain, salted)


def test_parallelism_invariance(ray_session, tokens_table):
    """Same bits regardless of partitioning/batch size — the bit-determinism
    property that makes the N vs 4N cluster criterion meaningful."""
    a = to_sorted_pdf(ru.rollup_tokens(rd.from_arrow(tokens_table).repartition(1), 60, batch_size=1000))
    b = to_sorted_pdf(ru.rollup_tokens(rd.from_arrow(tokens_table).repartition(7), 60, batch_size=5))
    pd.testing.assert_frame_equal(a, b)


def test_t0_column_path(ray_session):
    """Integer doc ids (documents table): t0 = doc_id % 86400 via t0_column."""
    t = pa.table(
        {
            "doc_id": pa.array(["7", "86401"]),
            "doc_id_int": pa.array([7, 86401], type=pa.int64()),
            "tokens": pa.array([[1, 2, 3], [4, 5]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([3, 2], type=pa.int32()),
            "source": pa.array(["a", "a"]),
        }
    )
    ds = rd.from_arrow(t)
    got = to_sorted_pdf(ru.rollup_tokens(ds, 60, t0_column="doc_id_int"))
    # doc 7: t0=7 -> positions 7,8,9 bucket 0 ; doc 86401: t0=1 -> pos 1,2 bucket 0
    assert got["bucket"].tolist() == [0]
    assert got["count"].tolist() == [5]
    assert got["sum"].tolist() == [15]


def test_salted_bucketize_handles_empty_batch():
    """A zero-row batch (empty row group / empty upstream block) must yield
    a zero-row salted partials table, not IndexError on t0[0]."""
    empty = pa.table({
        "doc_id": pa.array([], type=pa.string()),
        "tokens": pa.array([], type=pa.list_(pa.int32())),
        "source": pa.array([], type=pa.string()),
    })
    out = ru.BucketizePartials(60, salt=8)(empty)
    assert len(out) == 0 and "salt" in out.column_names


def test_missing_t0_column_raises(tokens_table):
    """A typo'd / pruned t0 column must refuse loudly, never silently fall
    back to doc-id-derived buckets."""
    with pytest.raises(KeyError, match="typo_col"):
        ru.BucketizePartials(60, t0_column="typo_col")(tokens_table)


def test_tree_final_task_input_guard(ray_session, tokens_table, monkeypatch):
    """Disjoint-group shards can each pass the per-shard bound while their
    union exceeds the final task's budget — the final combine must refuse
    on oversized INPUT, not OOM."""
    partials = ru.BucketizePartials(60)(tokens_table)
    n = len(partials)
    assert n > 4
    # per-shard outputs stay under the bound, the final input does not
    monkeypatch.setattr(ru, "TREE_MAX_GROUPS", max(2, n // 8))
    ds = rd.from_arrow(partials).repartition(8)
    with pytest.raises(Exception) as ei:
        ru.merge_partials(ds, strategy="tree").materialize()
    assert "TreeMergeOverflowError" in str(ei.value) or isinstance(
        ei.value, ru.TreeMergeOverflowError)
