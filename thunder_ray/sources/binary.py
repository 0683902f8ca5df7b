"""Fixed-width binary Series IO — literal thunder parity for
``Series.tobinary`` (thunder/series/writers.py:~10) and
``series.frombinary`` (thunder/series/readers.py:~170).

Format (thunder's shape, adapted to the engine's single string key):
one ``.bin`` file per Ray block of C-order records ``(key: int64,
values: nvalues x valuetype)``, plus ONE ``conf.json`` sidecar declaring
the record layout — the reader needs no other metadata::

    {"nkeys": 1, "keytype": "<i8", "nvalues": D, "valuetype": "<i4"}

Keys: thunder keys are int tuples; the engine's ``doc_id`` strings are
reduced to their digits (``doc-00000042`` -> 42) and the id FAMILY
(prefix + digit width, e.g. ``doc-``/8) is recorded in conf.json as
``keyprefix``/``keywidth`` so ``from_binary`` reconstructs the original
ids — mirroring thunder's key-preserving frombinary contract
(thunder/series/readers.py:~170).  Uniform value lengths are required,
as in thunder, and enforced across ALL blocks before conf.json is
written (a per-block-uniform dataset with differing widths would
otherwise frombuffer-misparse on read).

Writes are per-block tasks (parallel, one file per block named by the
block's first key plus a payload content hash — deterministic and
idempotent under task retries, and two blocks sharing a first key cannot
silently overwrite each other); reads are ``read_binary_files`` + a
vectorized frombuffer reshape.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa


def _keys_from_doc_ids(col) -> tuple[np.ndarray, str, int]:
    """(int keys, id prefix, digit width) — the prefix/width pair is the
    key-format template recorded in conf.json.  EVERY id in the block must
    match the derived family (prefix + fixed digit width): the first row
    alone is not enough, since a mixed block would silently rewrite the
    other rows' ids on read."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    digits = pc.replace_substring_regex(col, r"\D+", "")
    first = col[0].as_py() if len(col) else ""
    first_digits = digits[0].as_py() if len(col) else ""
    prefix = first[: len(first) - len(first_digits)]
    width = len(first_digits)
    if len(col):
        # vectorized family check (ADVICE r3): id == prefix + digits AND a
        # fixed digit width — Arrow kernels, no per-row Python on the write path
        rebuilt = pc.binary_join_element_wise(
            pa.repeat(prefix, len(col)).cast(pa.string()), digits, "")
        ok = pc.fill_null(
            pc.and_(pc.equal(col, rebuilt),
                    pc.equal(pc.binary_length(digits), width)),
            False).to_numpy(zero_copy_only=False).astype(bool)
        if not ok.all():
            ids = col.to_numpy(zero_copy_only=False)
            bad = ids[~ok][:3].tolist()
            raise ValueError(
                f"tobinary requires one doc_id family per block "
                f"(prefix={prefix!r}, width={width}); mismatched ids "
                f"e.g. {bad}")
    keys = np.asarray(digits.cast(pa.int64()).to_numpy(zero_copy_only=False),
                      dtype=np.int64)
    return keys, prefix, width


def to_binary(ds, path: str, value_column: str = "tokens",
              valuetype: str = "<i4"):
    """Series Dataset -> fixed-width binary dir + conf.json; returns path."""
    from ..stages import listkernels as lk

    os.makedirs(path, exist_ok=True)
    vt = np.dtype(valuetype)

    def write_block(batch: pa.Table) -> pa.Table:
        vals, offs = lk.list_parts(batch[value_column])
        lens = np.diff(offs)
        if len(lens) == 0:
            return pa.table({"file": pa.array([], type=pa.string()),
                             "rows": pa.array([], type=pa.int64()),
                             "nvalues": pa.array([], type=pa.int64()),
                             "keyprefix": pa.array([], type=pa.string()),
                             "keywidth": pa.array([], type=pa.int64())})
        d = int(lens[0])
        if (lens != d).any():
            raise ValueError("tobinary requires uniform series lengths")
        keys, prefix, width = _keys_from_doc_ids(batch["doc_id"])
        base = lk._base_values(vals, offs).reshape(len(keys), d)
        vtd = np.dtype(vt)
        if vtd.kind in "iu" and base.size:
            info = np.iinfo(vtd)
            if int(base.min()) < info.min or int(base.max()) > info.max:
                # a bare astype would WRAP silently and from_binary's
                # lossless check only validates the stored payload —
                # refuse loudly (review r4)
                raise ValueError(f"tobinary: values exceed {vt} range — "
                                 "pick a wider valuetype")
        base = base.astype(vtd)
        # interleave key + values per record, C-order
        rec = np.dtype([("k", "<i8"), ("v", vt, (d,))])
        out = np.empty(len(keys), dtype=rec)
        out["k"] = keys
        out["v"] = base
        # content-addressed name: first key orders the files, the payload
        # hash makes two blocks that happen to share a first key collide
        # ONLY when their bytes are identical (harmless overwrite) — a
        # first-key-only name silently dropped one of them (review r4)
        import hashlib

        digest = hashlib.md5(out.tobytes()).hexdigest()[:10]
        fname = os.path.join(path, f"part-{int(keys[0]):012d}-{digest}.bin")
        tmp = fname + ".tmp"
        with open(tmp, "wb") as f:
            f.write(out.tobytes())
        os.replace(tmp, fname)   # atomic, idempotent under retries
        return pa.table({"file": pa.array([fname]),
                         "rows": pa.array([len(keys)], type=pa.int64()),
                         "nvalues": pa.array([d], type=pa.int64()),
                         "keyprefix": pa.array([prefix], type=pa.string()),
                         "keywidth": pa.array([width], type=pa.int64())})

    manifest = ds.map_batches(write_block, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
    # Per-block uniformity is necessary but not sufficient: ONE conf.json
    # describes every file, so all blocks must agree on the record layout
    # (and on the key family, or reads could not reconstruct the ids).
    widths = {int(m["nvalues"]) for m in manifest}
    if len(widths) > 1:
        raise ValueError(
            f"tobinary requires uniform series lengths across the whole "
            f"dataset; blocks wrote nvalues={sorted(widths)}")
    keyfmts = {(m["keyprefix"], int(m["keywidth"])) for m in manifest}
    if len(keyfmts) > 1:
        raise ValueError(
            f"tobinary requires one doc_id family; blocks saw "
            f"prefix/width={sorted(keyfmts)}")
    d = int(manifest[0]["nvalues"]) if manifest else 0
    prefix, width = (manifest[0]["keyprefix"], int(manifest[0]["keywidth"])) \
        if manifest else ("doc-", 8)
    # the write manifest's file list is persisted into conf.json and is the
    # AUTHORITATIVE read set (ADVICE r4): content-addressed part names never
    # overwrite, so a rerun into the same dir after the data changed (or a
    # retried non-deterministic upstream block) can leave stale .bin files
    # behind — a glob would silently return duplicated/mixed records.
    # set(): two blocks with identical bytes and first key legitimately
    # share one content-addressed file, which must be read once.
    files = sorted({os.path.basename(m["file"]) for m in manifest})
    conf = {"nkeys": 1, "keytype": "<i8", "nvalues": d, "valuetype": valuetype,
            "keyprefix": prefix, "keywidth": width, "files": files}
    tmp = os.path.join(path, "conf.json.tmp")
    with open(tmp, "w") as f:
        json.dump(conf, f)
    os.replace(tmp, os.path.join(path, "conf.json"))   # atomic: readers see
    return path                                        # old or new, not half


def from_binary(path: str, source: str = "bin"):
    """Binary dir (+conf.json) -> canonical Series Dataset.

    Reads ONLY the files named in conf.json's ``files`` manifest (ADVICE
    r4): stale .bin parts left behind by an earlier run into the same dir
    are ignored rather than silently mixed in, and a manifest file that is
    missing on disk refuses loudly (the dir is corrupt/partially deleted).
    A legacy conf.json without a manifest falls back to globbing."""
    import ray.data as rd

    with open(os.path.join(path, "conf.json")) as f:
        conf = json.load(f)
    d = int(conf["nvalues"])
    vt = np.dtype(conf["valuetype"])
    rec = np.dtype([("k", conf["keytype"]), ("v", vt, (d,))])
    prefix = conf.get("keyprefix", "doc-")
    width = int(conf.get("keywidth", 8))

    names = conf.get("files")
    if names is None:      # legacy dir written before the manifest existed
        names = sorted(p for p in os.listdir(path) if p.endswith(".bin"))
    else:
        missing = [n for n in names
                   if not os.path.exists(os.path.join(path, n))]
        if missing:
            raise ValueError(
                f"frombinary: conf.json names {len(missing)} file(s) "
                f"missing on disk (e.g. {missing[:3]}) — the dir is "
                "corrupt or partially deleted")
    files = sorted(os.path.join(path, p) for p in names)
    ds = rd.read_binary_files(files)

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for blob in batch["bytes"]:
            arr = np.frombuffer(blob.as_py(), dtype=rec)
            n = len(arr)
            # honor the RECORDED valuetype: parse with it, then cast to the
            # canonical int32 tokens only when lossless — a float or wide
            # int payload must refuse, not silently truncate/wrap
            v = arr["v"]
            vals32 = v.astype(np.int32)
            if not np.array_equal(vals32.astype(v.dtype), v):
                raise ValueError(
                    f"frombinary: valuetype {conf['valuetype']} payload "
                    f"does not fit int32 tokens losslessly")
            vals32 = vals32.reshape(-1)
            tables.append(pa.table({
                "doc_id": pa.array(
                    np.char.add(prefix, np.char.zfill(
                        arr["k"].astype(np.int64).astype("U"), width)),
                    type=pa.string()),
                "tokens": pa.ListArray.from_arrays(
                    pa.array(np.arange(n + 1, dtype=np.int32) * d),
                    pa.array(vals32)),
                "n_tok": pa.array(np.full(n, d, dtype=np.int32)),
                "source": pa.array([source] * n, type=pa.string()),
            }))
        return pa.concat_tables(tables)

    return ds.map_batches(parse, batch_format="pyarrow")
