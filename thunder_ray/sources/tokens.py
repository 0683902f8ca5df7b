"""Sources producing the canonical tokens table (schema.TOKENS_SCHEMA).

Mirrors thunder's reader layer (thunder/series/readers.py, SURVEY.md §2.1):
``read_tokens`` is the engine's ``series.frombinary`` equivalent (canonical
parquet source), ``tokens_from_documents`` the ``series.fromtext`` equivalent
(parse records out of text), ``synth_dataset`` the ``series.fromrandom``
equivalent (in synth.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import TOKENS_SCHEMA


def read_tokens(path, **kwargs):
    """Canonical source: parquet with TOKENS_SCHEMA columns.

    Columns are pruned at the read (SURVEY.md 'prune at the read') — pass
    ``columns=`` through to avoid shipping unused payloads.
    """
    import ray.data as rd

    kwargs.setdefault("columns", [f.name for f in TOKENS_SCHEMA])
    return rd.read_parquet(path, **kwargs)


def _tokenize_batch(batch: pa.Table) -> pa.Table:
    """documents row -> tokens row with the SQL-reproducible tokenizer:
    token i = length of the i-th field of ``text.split(' ')``.

    Fully vectorized and allocation-light: ``pc.split_pattern`` yields a
    list<string>; we reuse its offsets and take utf8 lengths of the
    flattened words — no per-row Python.
    DuckDB oracle: ``list_transform(string_split(text, ' '), w -> length(w))``.
    """
    if batch["text"].null_count:
        # a null text would silently become a 0-token row (ListArray
        # rebuilding drops the validity bitmap) while the SQL twin's
        # list_transform(NULL) is NULL — refuse loudly (review r4)
        raise ValueError("tokenize: null text values — clean the documents "
                         "table upstream")
    words = pc.split_pattern(batch["text"], " ").combine_chunks()
    flat_lens = pc.utf8_length(words.values).cast(pa.int32())
    tokens = pa.ListArray.from_arrays(words.offsets, flat_lens)
    n_tok = pc.list_value_length(tokens).cast(pa.int32())
    doc_id = pc.cast(batch["doc_id"], pa.string())
    return pa.Table.from_arrays(
        [doc_id, tokens, n_tok, batch["source"].combine_chunks()
         if isinstance(batch["source"], pa.ChunkedArray) else batch["source"]],
        schema=TOKENS_SCHEMA,
    ).append_column("doc_id_int", pc.cast(batch["doc_id"], pa.int64()))


def tokens_from_documents(sf_dir: str, **read_kwargs):
    """Derive the tokens table from the driver ``documents`` table.

    Keeps an extra ``doc_id_int`` column so t0 can be computed as
    ``doc_id % 86400`` — the SQL-reproducible t0 for integer ids
    (schema.t0_for_doc_ids).
    """
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"], **read_kwargs
    )
    return ds.map_batches(_tokenize_batch, batch_format="pyarrow", zero_copy_batch=True)


def tokenize_table(documents: pa.Table) -> pa.Table:
    """Local (driver-side) tokenization for tests — same kernel."""
    return _tokenize_batch(documents)
