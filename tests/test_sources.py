"""Reader-surface parity (thunder series.fromarray/fromlist/fromtext/
fromrandom, SURVEY.md §2.1) — construct -> operate -> collect round trips."""

import numpy as np
import pytest

from thunder_ray.sources import series as src


def test_from_array_roundtrip(ray_session):
    a = np.arange(24, dtype=np.int32).reshape(4, 6)
    ds = src.from_array(a)
    assert src.to_array(ds).tolist() == a.tolist()
    assert ds.schema().names == ["doc_id", "tokens", "n_tok", "source"]


def test_from_array_3d_flattens(ray_session):
    a = np.arange(24, dtype=np.int32).reshape(2, 2, 6)
    ds = src.from_array(a)
    assert src.to_array(ds).shape == (4, 6)


def test_from_list_with_accessor(ray_session):
    items = [{"v": [1, 2, 3]}, {"v": [4, 5, 6]}]
    ds = src.from_list(items, accessor=lambda r: r["v"])
    assert src.to_array(ds).tolist() == [[1, 2, 3], [4, 5, 6]]


def test_from_text(tmp_path, ray_session):
    p = tmp_path / "series.txt"
    p.write_text("7 1 2 3\n8 4 5 6\n")
    ds = src.from_text(str(p), skip=1)
    rows = sorted(ds.take_all(), key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in rows] == ["7", "8"]
    assert [list(r["tokens"]) for r in rows] == [[1, 2, 3], [4, 5, 6]]


def test_from_random_deterministic(ray_session):
    a = src.from_random(50).take_all()
    b = src.from_random(50).take_all()
    assert [list(r["tokens"]) for r in a] == [list(r["tokens"]) for r in b]


def test_to_array_ragged_raises(ray_session):
    ds = src.from_list([[1, 2], [3, 4, 5]])
    with pytest.raises(ValueError):
        src.to_array(ds)


def test_constructed_series_feeds_rollup(ray_session):
    """from_array output flows straight into the tier rollup."""
    from thunder_ray.stages import rollup as ru

    a = np.arange(40, dtype=np.int32).reshape(4, 10)
    out = ru.rollup_tokens(src.from_array(a), 3600).take_all()
    assert sum(r["count"] for r in out) == 40


def test_flatten_collapses_keys(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from thunder_ray.sources.series import flatten

    t = pa.table({
        "source": pa.array(["a", "b"]),
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "n": pa.array([10, 20], type=pa.int64()),
    })
    rows = flatten(rd.from_arrow(t)).take_all()
    assert sorted(r["key"] for r in rows) == ["a/1", "b/2"]
    assert {r["key"]: r["n"] for r in rows} == {"a/1": 10, "b/2": 20}


def test_totext_fromtext_roundtrip(ray_session, tmp_path):
    import numpy as np

    from thunder_ray.sources.series import from_array, from_text, to_array, to_text

    vals = np.arange(24, dtype=np.int32).reshape(4, 6)
    out = str(tmp_path / "txt")
    to_text(from_array(vals), out)
    back = to_array(from_text(out), value_column="tokens")
    got = back[np.lexsort(back.T[::-1])]
    want = vals[np.lexsort(vals.T[::-1])]
    assert np.array_equal(got, want)


def test_tobinary_frombinary_roundtrip(ray_session, tmp_path):
    """thunder Series.tobinary/frombinary parity: fixed-width records +
    conf.json sidecar, values and integer keys preserved exactly."""
    import json

    import numpy as np

    from thunder_ray.sources.binary import from_binary, to_binary
    from thunder_ray.sources.series import from_array

    vals = (np.arange(40, dtype=np.int32).reshape(5, 8) * 7) % 50_000
    out = str(tmp_path / "bin")
    to_binary(from_array(vals), out)
    conf = json.load(open(f"{out}/conf.json"))
    files = conf.pop("files")
    assert conf == {"nkeys": 1, "keytype": "<i8", "nvalues": 8,
                    "valuetype": "<i4", "keyprefix": "mem-", "keywidth": 8}
    # the manifest names exactly the .bin parts this write produced
    import os
    assert sorted(files) == sorted(
        p for p in os.listdir(out) if p.endswith(".bin"))
    rows = from_binary(out).take_all()
    assert len(rows) == 5
    # key-preserving contract (thunder readers.py keeps keys intact): the
    # mem- family round-trips verbatim, not rewritten to doc- (ADVICE r2)
    assert sorted(r["doc_id"] for r in rows) == [f"mem-{i:08d}" for i in range(5)]
    got = {int(r["doc_id"].split("-")[1]): np.asarray(r["tokens"]) for r in rows}
    for i in range(5):
        assert np.array_equal(got[i], vals[i])


def test_tobinary_refuses_cross_block_width_mismatch(ray_session, tmp_path):
    """Blocks that are each internally uniform but disagree on width must
    refuse BEFORE conf.json is written (ADVICE r2: a single conf cannot
    describe both record layouts; frombuffer would misparse)."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from thunder_ray.sources.binary import to_binary
    from thunder_ray.sources.series import _table_from_2d

    a = _table_from_2d(np.arange(12, dtype=np.int32).reshape(3, 4))
    b = _table_from_2d(np.arange(18, dtype=np.int32).reshape(3, 6))
    # distinct ids so the two per-block files don't collide
    b = b.set_column(0, "doc_id",
                     pa.array([f"mem-{i + 10:08d}" for i in range(3)]))
    ds = rd.from_arrow([a, b])  # one block each
    with pytest.raises(ValueError, match="uniform series lengths"):
        to_binary(ds, str(tmp_path / "bad"))


def test_from_text_ids_stable_across_files(ray_session, tmp_path):
    """Multi-file from_text must produce globally unique, deterministic ids
    (a per-batch counter would collide across blocks/files)."""
    from thunder_ray.sources.series import from_text

    (tmp_path / "a.txt").write_text("1 2 3\n4 5\n")
    (tmp_path / "b.txt").write_text("6\n7 8\n")
    df = from_text(str(tmp_path)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert sorted(df["doc_id"]) == ["line-0-0", "line-0-1",
                                    "line-1-0", "line-1-1"]
    assert df["doc_id"].is_unique


def test_from_binary_rejects_lossy_valuetype(ray_session, tmp_path):
    """A float payload recorded in conf.json must refuse on read instead of
    silently truncating to int32."""
    import json
    import numpy as np
    import pytest

    from thunder_ray.sources.binary import from_binary

    d = 2
    rec = np.dtype([("k", "<i8"), ("v", "<f8", (d,))])
    arr = np.array([(1, (1.5, 2.0))], dtype=rec)
    (tmp_path / "part-000000000001.bin").write_bytes(arr.tobytes())
    (tmp_path / "conf.json").write_text(json.dumps(
        {"nkeys": 1, "keytype": "<i8", "nvalues": d, "valuetype": "<f8",
         "keyprefix": "doc-", "keywidth": 8}))
    with pytest.raises(Exception, match="losslessly"):
        from_binary(str(tmp_path)).materialize()


def test_to_binary_rejects_mixed_id_family(ray_session):
    """A block mixing id families (doc-00000042 vs doc-42) must refuse
    loudly, not silently rewrite ids on the round trip."""
    import pytest
    import ray.data as rd

    from thunder_ray.sources.binary import _keys_from_doc_ids
    import pyarrow as pa

    col = pa.array(["doc-00000042", "doc-42"], type=pa.string())
    with pytest.raises(ValueError, match="one doc_id family"):
        _keys_from_doc_ids(col)


def test_frombinary_reads_only_the_manifest(ray_session, tmp_path):
    """conf.json's file manifest is the authoritative read set (ADVICE r4):
    a rerun of to_binary into the same dir after the data changed leaves
    the old content-addressed parts behind, and a stray .bin planted in
    the dir must be ignored — only the last write's records come back."""
    import numpy as np

    from thunder_ray.sources.binary import from_binary, to_binary
    from thunder_ray.sources.series import from_array

    out = str(tmp_path / "bin")
    old = (np.arange(24, dtype=np.int32).reshape(3, 8) * 3) % 1000
    to_binary(from_array(old), out)
    # data changed -> rerun into the SAME dir (old parts stay on disk
    # because names are content-addressed and never overwritten)
    new = old + 1
    to_binary(from_array(new), out)
    # plus a stray file that is not part of any manifest
    (tmp_path / "bin" / "part-999999999999-deadbeef00.bin").write_bytes(
        b"\x00" * 40)
    rows = from_binary(out).take_all()
    assert len(rows) == 3
    got = {int(r["doc_id"].split("-")[1]): np.asarray(r["tokens"])
           for r in rows}
    for i in range(3):
        assert np.array_equal(got[i], new[i])


def test_frombinary_refuses_missing_manifest_file(ray_session, tmp_path):
    import json
    import os

    import numpy as np

    from thunder_ray.sources.binary import from_binary, to_binary
    from thunder_ray.sources.series import from_array

    out = str(tmp_path / "bin")
    vals = np.arange(16, dtype=np.int32).reshape(2, 8)
    to_binary(from_array(vals), out)
    conf = json.load(open(f"{out}/conf.json"))
    os.remove(os.path.join(out, conf["files"][0]))
    with pytest.raises(ValueError, match="missing on disk"):
        from_binary(out)


def test_frombinary_legacy_conf_without_manifest(ray_session, tmp_path):
    """A conf.json written before the manifest existed still reads (glob
    fallback), so old dirs are not orphaned."""
    import json

    import numpy as np

    from thunder_ray.sources.binary import from_binary, to_binary
    from thunder_ray.sources.series import from_array

    out = str(tmp_path / "bin")
    vals = np.arange(16, dtype=np.int32).reshape(2, 8)
    to_binary(from_array(vals), out)
    conf = json.load(open(f"{out}/conf.json"))
    del conf["files"]
    json.dump(conf, open(f"{out}/conf.json", "w"))
    rows = from_binary(out).take_all()
    assert len(rows) == 2
