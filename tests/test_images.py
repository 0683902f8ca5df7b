"""Images stack vs naive per-frame oracles (thunder test_images.py style)."""

import numpy as np
import pytest

from thunder_ray.stages import images as im

RNG = np.random.default_rng(11)
CUBE = RNG.integers(0, 100, size=(6, 8, 10)).astype(np.int32)  # (t, h, w)


@pytest.fixture(scope="module")
def frames(ray_session):
    return im.images_from_table(im.frames_from_array(CUBE))


def _naive_box_mean(frame, size):
    r = size // 2
    p = np.pad(frame.astype(np.float64), r, mode="symmetric")
    h, w = frame.shape
    out = np.empty((h, w))
    for i in range(h):
        for j in range(w):
            out[i, j] = p[i: i + size, j: j + size].mean()
    return out


def _naive_median(frame, size):
    r = size // 2
    p = np.pad(frame, r, mode="symmetric")
    h, w = frame.shape
    out = np.empty((h, w), dtype=np.float64)
    for i in range(h):
        for j in range(w):
            out[i, j] = np.median(p[i: i + size, j: j + size])
    return out


def _naive_gaussian(frame, sigma, truncate=4.0):
    r = int(truncate * sigma + 0.5)
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    p = np.pad(frame.astype(np.float64), r, mode="symmetric")
    tmp = np.zeros((frame.shape[0] + 2 * r, frame.shape[1]))
    for j in range(2 * r + 1):
        tmp += p[:, j: j + frame.shape[1]] * k[j]
    out = np.zeros(frame.shape)
    for j in range(2 * r + 1):
        out += tmp[j: j + frame.shape[0], :] * k[j]
    return out


def _collect(ds, value_col="value"):
    rows = ds.take_all()
    out = {}
    for r in rows:
        out.setdefault(r["frame_id"], {})[r["pos"]] = r[value_col]
    return out


def test_max_projection(frames):
    got = _collect(im.max_projection(frames, axis=0))
    for t in range(CUBE.shape[0]):
        want = CUBE[t].max(axis=0)
        assert [got[t][p] for p in range(len(want))] == want.tolist()


def test_max_min_projection(frames):
    rows = im.max_min_projection(frames, axis=1).take_all()
    for r in rows[:20]:
        t, p = r["frame_id"], r["pos"]
        assert r["vmax"] == CUBE[t, p, :].max()
        assert r["vmin"] == CUBE[t, p, :].min()


def test_spatial_subsample(frames):
    rows = im.spatial_subsample(frames, 2).take_all()
    for r in rows:
        got = np.asarray(r["image"]).reshape(r["height"], r["width"])
        assert np.array_equal(got, CUBE[r["frame_id"], ::2, ::2])


def test_subtract(frames):
    rows = im.subtract(frames, 7).take_all()
    for r in rows[:3]:
        got = np.asarray(r["image"]).reshape(8, 10)
        assert np.array_equal(got, CUBE[r["frame_id"]] - 7)


def test_uniform_filter(frames):
    rows = im.uniform_filter(frames, 3).take_all()
    for r in rows:
        got = np.asarray(r["image"]).reshape(8, 10)
        want = _naive_box_mean(CUBE[r["frame_id"]], 3)
        assert np.allclose(got, want)


def test_median_filter(frames):
    rows = im.median_filter(frames, 3).take_all()
    for r in rows:
        got = np.asarray(r["image"]).reshape(8, 10)
        want = _naive_median(CUBE[r["frame_id"]], 3)
        assert np.allclose(got, want)


def test_gaussian_filter(frames):
    rows = im.gaussian_filter(frames, sigma=1.2).take_all()
    for r in rows:
        got = np.asarray(r["image"]).reshape(8, 10)
        want = _naive_gaussian(CUBE[r["frame_id"]], 1.2)
        assert np.allclose(got, want)


def test_toseries_is_exact_transpose(frames):
    rows = im.toseries(frames, chunks=5).take_all()
    assert len(rows) == 8 * 10
    flat = CUBE.reshape(CUBE.shape[0], -1)    # (t, pixels)
    for r in rows:
        assert np.array_equal(np.asarray(r["series"]), flat[:, r["pixel_id"]])


def test_toimages_roundtrip(frames):
    """toseries -> toimages reproduces every frame exactly (frame ids are
    frame ranks; CUBE's ids are already 0..t-1)."""
    series = im.toseries(frames, chunks=5)
    rows = im.toimages(series, height=8, width=10, time_chunks=3).take_all()
    assert len(rows) == CUBE.shape[0]
    for r in rows:
        got = np.asarray(r["image"]).reshape(8, 10)
        assert np.array_equal(got, CUBE[int(r["frame_id"])])


def test_toblocks_halo_slices(frames):
    rows = im.toblocks(frames, grid=(2, 2), padding=1).take_all()
    # 4 blocks x 6 frames
    assert len(rows) == 4 * CUBE.shape[0]
    for r in rows:
        sub = np.asarray(r["vals"]).reshape(int(r["sh"]), int(r["sw"]))
        yy0, xx0 = int(r["yy0"]), int(r["xx0"])
        want = CUBE[int(r["frame_id"]),
                    yy0: yy0 + int(r["sh"]), xx0: xx0 + int(r["sw"])]
        assert np.array_equal(sub, want)
        # halo: core extended by <=1, clipped at image bounds
        assert yy0 == max(int(r["y0"]) - 1, 0)
        assert xx0 == max(int(r["x0"]) - 1, 0)


def _naive_localcorr(cube, size=3):
    t, h, w = cube.shape
    r = size // 2
    out = np.empty((h, w))
    x64 = cube.astype(np.int64)
    for i in range(h):
        for j in range(w):
            y0, y1 = max(i - r, 0), min(i + r + 1, h)
            x0, x1 = max(j - r, 0), min(j + r + 1, w)
            ysum = x64[:, y0:y1, x0:x1].sum(axis=(1, 2))
            x = x64[:, i, j]
            tf = np.float64(t)
            sx, sy = x.sum(), ysum.sum()
            sxx, syy, sxy = (x * x).sum(), (ysum * ysum).sum(), (x * ysum).sum()
            num = tf * np.float64(sxy) - np.float64(sx) * np.float64(sy)
            den = (np.sqrt(tf * np.float64(sxx) - np.float64(sx) * np.float64(sx))
                   * np.sqrt(tf * np.float64(syy) - np.float64(sy) * np.float64(sy)))
            out[i, j] = num / den
    return out


def test_localcorr_matches_naive(frames):
    rows = im.localcorr(frames, size=3, grid=(2, 2)).take_all()
    assert len(rows) == 8 * 10
    want = _naive_localcorr(CUBE)
    for r in rows:
        assert np.isclose(r["corr"], want[int(r["y"]), int(r["x"])],
                          rtol=1e-12), (r["y"], r["x"])


def test_map_as_series_center(ray_session):
    """map_as_series (thunder images.py:~600) with a same-length func must
    equal the numpy reference applied pixel-wise; frames keyed by rank."""
    rng = np.random.default_rng(5)
    a = rng.integers(0, 100, size=(6, 4, 6)).astype(np.int64)
    ds = im.images_from_table(im.frames_from_array(a))

    got = im.map_as_series(ds, lambda s: s - s.mean(), grid=(2, 3)).take_all()
    want = a - a.mean(axis=0, keepdims=True)
    assert len(got) == 6
    for r in got:
        f = int(r["frame_id"])
        np.testing.assert_allclose(
            np.asarray(r["image"]).reshape(4, 6), want[f])


def test_map_as_series_shortens_series(ray_session):
    """A func changing the series length (np.diff) produces t-1 frames."""
    rng = np.random.default_rng(6)
    a = rng.integers(0, 50, size=(5, 4, 4)).astype(np.int64)
    ds = im.images_from_table(im.frames_from_array(a))
    got = im.map_as_series(ds, np.diff, grid=(2, 2)).take_all()
    want = np.diff(a, axis=0)
    assert len(got) == 4
    for r in got:
        f = int(r["frame_id"])
        np.testing.assert_array_equal(
            np.asarray(r["image"]).reshape(4, 4), want[f])


def test_map_as_series_vectorized_matches_udf(ray_session):
    rng = np.random.default_rng(7)
    a = rng.integers(0, 50, size=(5, 4, 4)).astype(np.int64)
    ds = im.images_from_table(im.frames_from_array(a))
    udf = {int(r["frame_id"]): np.asarray(r["image"]) for r in
           im.map_as_series(ds, lambda s: s - s.min(), grid=(2, 2)).take_all()}
    ds2 = im.images_from_table(im.frames_from_array(a))
    vec = {int(r["frame_id"]): np.asarray(r["image"]) for r in
           im.map_as_series(ds2, lambda X: X - X.min(axis=0, keepdims=True),
                            grid=(2, 2), vectorized=True).take_all()}
    assert udf.keys() == vec.keys()
    for k in udf:
        np.testing.assert_array_equal(udf[k], vec[k])
