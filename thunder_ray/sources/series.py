"""Series constructors mirroring thunder's reader surface (SURVEY.md §2.1;
thunder/series/readers.py).  Each returns a ``ray.data.Dataset`` with the
canonical row shape ``(doc_id: string, tokens/values: list<T>, n_tok: int32,
source: string)`` so every engine operator composes downstream.

| thunder                | here        | Ray primitive                      |
|------------------------|-------------|------------------------------------|
| series.fromarray  :~30 | from_array  | ray.data.from_arrow (one block)    |
| series.fromlist   :~80 | from_list   | from_items + accessor map          |
| series.fromtext  :~120 | from_text   | read_text + per-line parse         |
| series.frombinary:~170 | read_tokens | read_parquet (sources/tokens.py)   |
| series.fromrandom:~240 | from_random | synth.synth_dataset (seeded blocks)|
| series.fromexample     | n/a         | no external data; FIXTURES.md      |
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def _table_from_2d(values: np.ndarray, source: str = "mem") -> pa.Table:
    values = np.atleast_2d(np.asarray(values))
    n, d = values.shape
    flat = pa.array(values.reshape(-1).astype(np.int32, copy=False)
                    if values.dtype.kind in "iu" else values.reshape(-1))
    tokens = pa.ListArray.from_arrays(
        pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32)), flat)
    return pa.table({
        "doc_id": pa.array([f"mem-{i:08d}" for i in range(n)], type=pa.string()),
        "tokens": tokens,
        "n_tok": pa.array(np.full(n, d, dtype=np.int32)),
        "source": pa.array([source] * n, type=pa.string()),
    })


def from_array(values: np.ndarray, source: str = "mem", npartitions: int | None = None):
    """thunder ``series.fromarray``: wrap an in-memory >=2-D array, last axis
    = the series axis, one record per leading-axis element."""
    import ray.data as rd

    values = np.asarray(values)
    if values.ndim > 2:
        values = values.reshape(-1, values.shape[-1])
    ds = rd.from_arrow(_table_from_2d(values, source))
    if npartitions:
        ds = ds.repartition(npartitions)
    return ds


def from_list(items, accessor=None, source: str = "mem"):
    """thunder ``series.fromlist``: parallelize a list of records, optional
    per-item ``accessor`` applied on workers via map_batches."""
    import ray.data as rd

    ds = rd.from_items([{"i": i, "item": x} for i, x in enumerate(items)])

    def build(batch: pa.Table) -> pa.Table:
        idx = batch["i"].to_pylist()
        rows = batch["item"].to_pylist()
        arrs = [np.asarray(accessor(r) if accessor else r) for r in rows]
        lens = np.array([len(a) for a in arrs], dtype=np.int32)
        flat = np.concatenate(arrs) if arrs else np.empty(0, dtype=np.int32)
        # preserve non-integer dtypes like from_array/_table_from_2d; cast
        # integers to int32 only when they FIT (a silent wrap corrupted
        # wide-int inputs; review r4)
        if flat.dtype.kind in "iu":
            if len(flat) and (int(flat.min()) < -(1 << 31)
                              or int(flat.max()) >= 1 << 31):
                raise ValueError("from_list: integer values exceed int32 — "
                                 "pass floats or rescale")
            flat = flat.astype(np.int32)
        offs = np.zeros(len(arrs) + 1, dtype=np.int32)
        np.cumsum(lens, out=offs[1:])
        return pa.table({
            "doc_id": pa.array([f"mem-{i:08d}" for i in idx], type=pa.string()),
            "tokens": pa.ListArray.from_arrays(pa.array(offs),
                                               pa.array(flat)),
            "n_tok": pa.array(lens),
            "source": pa.array([source] * len(arrs), type=pa.string()),
        })

    return ds.map_batches(build, batch_format="pyarrow")


def from_text(path, skip: int = 0, source: str = "txt"):
    """thunder ``series.fromtext``: whitespace-separated integers per line;
    the first ``skip`` fields are dropped (thunder: key fields).

    Line ids are GLOBALLY stable: each file is parsed as one unit (so ids
    never depend on Ray's block splits — a per-batch counter would collide
    across blocks), numbered ``line-{n}`` within its file, with a
    ``line-{file_index}-{n}`` form when reading a multi-file directory."""
    import glob as _glob

    import ray.data as rd

    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "*")))
    else:
        files = [path]
    file_index = {os.path.basename(p): i for i, p in enumerate(files)}
    multi = len(files) > 1

    ds = rd.read_binary_files(files, include_paths=True)

    def parse(batch) -> pa.Table:
        arrs, ids = [], []
        for p, blob in zip(batch["path"].to_pylist(),
                           batch["bytes"].to_pylist()):
            fi = file_index[os.path.basename(p)]
            n = 0
            for ln in blob.decode("utf-8").splitlines():
                fields = ln.split()
                if not fields:
                    continue
                arrs.append(np.asarray(fields[skip:], dtype=np.int32))
                if skip:
                    ids.append(" ".join(fields[:skip]))
                else:
                    ids.append(f"line-{fi}-{n}" if multi else f"line-{n}")
                n += 1
        lens = np.array([len(a) for a in arrs], dtype=np.int32)
        flat = np.concatenate(arrs) if arrs else np.empty(0, dtype=np.int32)
        offs = np.zeros(len(arrs) + 1, dtype=np.int32)
        np.cumsum(lens, out=offs[1:])
        return pa.table({
            "doc_id": pa.array(ids, type=pa.string()),
            "tokens": pa.ListArray.from_arrays(pa.array(offs), pa.array(flat)),
            "n_tok": pa.array(lens),
            "source": pa.array([source] * len(arrs), type=pa.string()),
        })

    return ds.map_batches(parse, batch_format="pyarrow")


def from_random(rows: int, rows_per_block: int = 10_000, seed: int = 42):
    """thunder ``series.fromrandom``: the deterministic seeded-per-block
    synthetic table (synth.py)."""
    from ..synth import synth_dataset

    return synth_dataset(rows, rows_per_block=rows_per_block, seed=seed)


def flatten(ds, key_columns=("source", "doc_id"), sep: str = "/"):
    """thunder ``Series.flatten`` (series.py:~100): collapse all key axes to
    one.  Thunder linearizes an n-d key tuple; the engine's analogue joins
    the key COLUMNS into one string key (vectorized Arrow concat) — rows
    and values untouched, single-key downstream ops compose."""
    import pyarrow.compute as pc

    key_columns = list(key_columns)

    def f(batch: pa.Table) -> pa.Table:
        parts = []
        for c in key_columns:
            col = batch[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            parts.append(col.cast(pa.string()))
        key = pc.binary_join_element_wise(*parts, sep)
        keep = [c for c in batch.column_names if c not in key_columns]
        out = batch.select(keep)
        return out.add_column(0, "key", key)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def filter_records(ds, predicate, value_column: str = "tokens",
                   vectorized: bool = False):
    """thunder ``Data.filter(func)`` (base.py:~340): keep records where
    ``predicate(values)`` is truthy — and filter every OTHER column,
    ``labels`` included, in LOCKSTEP (thunder filters the labels array
    alongside the values; here labels are extra scalar columns on the row,
    SURVEY §1.1, and the whole-table Arrow filter keeps them aligned).

    ``predicate`` receives one record's 1-D ndarray (thunder's UDF
    contract); pass ``vectorized=True`` for a kernel
    ``(values, offsets) -> bool mask per record`` — the scale path.
    """
    from ..stages import listkernels as lk

    def f(batch: pa.Table) -> pa.Table:
        vals, offs = lk.list_parts(batch[value_column])
        if vectorized:
            keep = np.asarray(predicate(vals, offs), dtype=bool)
        else:
            base, rel = lk._flat(vals, offs)
            keep = np.fromiter(
                (bool(predicate(base[rel[i]: rel[i + 1]]))
                 for i in range(len(batch))), dtype=bool, count=len(batch))
        return batch.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def to_text(ds, path: str, value_column: str = "tokens"):
    """thunder ``Series.totext`` (series/writers.py:~80): one line per
    record, whitespace-separated values — engine wrapper emitting a single
    text column then Ray's parallel CSV writer (one file per block).
    Round-trips through :func:`from_text` (skip=0).  Zero-length records
    are REFUSED: they would serialize to a blank line, which from_text
    cannot distinguish from a trailing newline and silently drops —
    shifting every later line id (review r4)."""
    import pyarrow.compute as pc

    def to_lines(batch: pa.Table) -> pa.Table:
        col = batch[value_column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = np.diff(col.offsets.to_numpy(zero_copy_only=False))
        if len(lens) and int(lens.min()) == 0:
            raise ValueError("totext: zero-length records are not "
                             "representable (blank line == no line)")
        strs = pc.cast(col.values, pa.string())
        lists = pa.ListArray.from_arrays(col.offsets, strs)
        return pa.table({"value": pc.binary_join(lists, " ")})

    def csv_args():
        from pyarrow import csv as pacsv

        # WriteOptions is not picklable; construct on the writer task
        return {"write_options": pacsv.WriteOptions(
            include_header=False, quoting_style="none")}

    ds.map_batches(to_lines, batch_format="pyarrow",
                   zero_copy_batch=True).write_csv(path, arrow_csv_args_fn=csv_args)
    return path


def to_array(ds, value_column: str = "tokens") -> np.ndarray:
    """thunder ``toarray`` (collect): rows sorted by doc_id -> 2-D array
    (requires uniform lengths, like thunder Series)."""
    rows = ds.sort("doc_id").take_all()
    arrs = [np.asarray(r[value_column]) for r in rows]
    lens = {len(a) for a in arrs}
    if len(lens) > 1:
        raise ValueError("ragged series cannot convert to a dense array")
    return np.stack(arrs) if arrs else np.empty((0, 0))
