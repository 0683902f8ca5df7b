"""Deterministic synthetic tokenized-sequences table (FIXTURES.md F1).

Mirrors thunder's ``series.fromrandom`` pattern
(thunder/series/readers.py:~240): seeded per block so any block can be
(re)generated independently and bit-identically — the property that makes
generation parallel, resumable and verifiable at any scale.

Schema: :data:`thunder_ray.schema.TOKENS_SCHEMA`
  - ``doc_id``  "doc-%08d" over the global row index
  - ``tokens``  length uniform [32, 512), values uniform [0, 50257)
  - ``n_tok``   len(tokens)
  - ``source``  Zipf(a=1.5)-skewed over [src-0 .. src-31] (intentional skew)
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import TOKENS_SCHEMA, VOCAB_SIZE

SEED = 42
N_SOURCES = 32
MIN_TOK, MAX_TOK = 32, 512


def generate_block(block_id: int, rows: int, seed: int = SEED,
                   base: int | None = None) -> pa.Table:
    """Generate one block deterministically: ``rng = default_rng(seed +
    block_id)``.  ``base`` is the GLOBAL row index of the block's first row
    — callers with a short last block must pass it explicitly (block_id *
    rows would collide doc_ids with the previous block; review r4)."""
    rng = np.random.default_rng(seed + block_id)
    lens = rng.integers(MIN_TOK, MAX_TOK, size=rows, dtype=np.int64)
    total = int(lens.sum())
    if total >= 1 << 31:
        # Arrow list offsets are int32; an int32 cumsum would wrap silently
        # before from_arrays could complain (review r4)
        raise ValueError("synth: block token count exceeds int32 offsets — "
                         "lower rows_per_block")
    values = rng.integers(0, VOCAB_SIZE, size=total, dtype=np.int32)
    offsets = np.zeros(rows + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    offsets = offsets.astype(np.int32)
    src_idx = (rng.zipf(1.5, size=rows) - 1) % N_SOURCES
    base = block_id * rows if base is None else base
    doc_id = pa.array([f"doc-{base + i:08d}" for i in range(rows)], type=pa.string())
    tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(values))
    source = pa.array([f"src-{k}" for k in src_idx], type=pa.string())
    return pa.Table.from_arrays(
        [doc_id, tokens, pa.array(lens.astype(np.int32)), source],
        schema=TOKENS_SCHEMA,
    )


def generate_table(rows: int, rows_per_block: int = 10_000, seed: int = SEED) -> pa.Table:
    """Small in-memory table (tests). Same bits as the parquet path."""
    blocks = []
    bid = 0
    done = 0
    while rows > 0:
        n = min(rows, rows_per_block)
        blocks.append(generate_block(bid, n, seed, base=done))
        rows -= n
        done += n
        bid += 1
    return pa.concat_tables(blocks)


def write_tokens_parquet(
    out_dir: str, rows: int, rows_per_block: int = 10_000, seed: int = SEED
) -> str:
    """Materialize the synthetic table as one parquet file per block.

    Idempotent: skips blocks whose part file already exists (a `_SUCCESS`
    marker gates completeness), so benchmark inputs are generated once.
    """
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_SUCCESS")
    n_blocks = (rows + rows_per_block - 1) // rows_per_block
    # v=2: generator format version (ADVICE r4) — v2 added the ``base=``
    # parameter that fixed short-last-block doc_id collisions, so datasets
    # stamped by the pre-fix generator must be refused and regenerated even
    # though their rows=/rows_per_block=/seed= params match (the old marker
    # carried no version token, so it never equals a v2 stamp).  Bump this
    # whenever generate_block's output for the same params changes.
    stamp = f"v=2 rows={rows} rows_per_block={rows_per_block} seed={seed}\n"
    if os.path.exists(marker):
        with open(marker) as f:
            recorded = f.read()
        if recorded == stamp:
            return out_dir
        # a rerun with DIFFERENT params (or a dataset written by an older
        # generator version) must not silently return the old dataset
        # (review r4) — refuse; the caller picks a fresh dir
        raise ValueError(
            f"{out_dir} holds a dataset with different parameters or an "
            f"older generator version ({recorded.strip()!r} vs "
            f"{stamp.strip()!r}); use a new out_dir or delete the old one")
    left = rows
    done = 0
    for bid in range(n_blocks):
        n = min(left, rows_per_block)
        left -= n
        part = os.path.join(out_dir, f"part-{bid:05d}.parquet")
        if not os.path.exists(part):
            tmp = part + ".tmp"
            pq.write_table(generate_block(bid, n, seed, base=done), tmp)
            os.replace(tmp, part)
        done += n
    with open(marker, "w") as f:
        f.write(stamp)
    return out_dir


def synth_dataset(rows: int, rows_per_block: int = 10_000, seed: int = SEED):
    """The table as a lazy ``ray.data.Dataset`` generated in parallel.

    One input row per block id; each task materializes its block from the
    seed — no data moves from the driver.
    """
    import ray.data as rd

    n_blocks = (rows + rows_per_block - 1) // rows_per_block
    sizes = [min(rows - b * rows_per_block, rows_per_block) for b in range(n_blocks)]

    def make(batch):
        bids = batch["id"].to_pylist() if isinstance(batch, pa.Table) else list(batch["id"])
        return pa.concat_tables([
            generate_block(int(b), sizes[int(b)], seed,
                           base=int(b) * rows_per_block) for b in bids])

    return rd.range(n_blocks, override_num_blocks=n_blocks).map_batches(
        make, batch_format="pyarrow", batch_size=1
    )
