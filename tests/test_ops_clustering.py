"""Connected-component clustering filter: blob-selection semantics."""

import numpy as np
import pytest
from scipy import ndimage

from retargetvid_tpu.ops.clustering import clustering_filter, connected_components

#: Compile-heavy on CPU; excluded from the fast tier (pytest -m "not slow").
pytestmark = pytest.mark.slow


RNG = np.random.default_rng(3)


def _blob(canvas, cy, cx, r, val):
    h, w = canvas.shape
    yy, xx = np.mgrid[0:h, 0:w]
    canvas[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = val
    return canvas


def test_connected_components_matches_scipy():
    mask = RNG.random((48, 64)) > 0.7
    labels = np.asarray(connected_components(mask, n_iters=32))
    ref, n = ndimage.label(mask, structure=np.ones((3, 3)))
    # Same partition: map our root-index labels to scipy labels bijectively.
    ours_fg = labels[mask]
    ref_fg = ref[mask]
    pairs = set(zip(ours_fg.tolist(), ref_fg.tolist()))
    assert len(pairs) == n  # one-to-one
    assert len({a for a, _ in pairs}) == n
    assert len({b for _, b in pairs}) == n
    # Background labeled H*W
    assert (labels[~mask] == mask.size).all()


def test_keeps_heaviest_blob_max_value():
    smap = np.zeros((60, 80), np.float32)
    _blob(smap, 20, 20, 6, 200)     # bright blob
    _blob(smap, 45, 60, 8, 150)     # bigger but dimmer
    out = np.asarray(clustering_filter(
        smap[None], min_cluster_size=5, select_sum=2, op_close=False))[0]
    assert out[20, 20] == 200       # bright blob survives
    assert out[45, 60] == 0         # dimmer blob zeroed


def test_keeps_heaviest_blob_sum():
    smap = np.zeros((60, 80), np.float32)
    _blob(smap, 20, 20, 4, 200)     # bright but small
    _blob(smap, 45, 60, 10, 150)    # dimmer but much larger total
    out = np.asarray(clustering_filter(
        smap[None], min_cluster_size=5, select_sum=1, op_close=False))[0]
    assert out[20, 20] == 0
    assert out[45, 60] == 150


def test_small_blobs_are_noise():
    smap = np.zeros((60, 80), np.float32)
    _blob(smap, 30, 40, 8, 100)
    smap[5, 5] = 255                # lone bright pixel: noise, not a cluster
    out = np.asarray(clustering_filter(
        smap[None], min_cluster_size=26, select_sum=2, op_close=False,
        bridge=0))[0]
    assert out[5, 5] == 0
    assert out[30, 40] == 100


def test_too_few_points_pass_through():
    smap = np.zeros((60, 80), np.float32)
    smap[10, 10] = 90
    smap[11, 10] = 95
    out = np.asarray(clustering_filter(
        smap[None], min_cluster_size=26, select_sum=2, op_close=False))[0]
    np.testing.assert_array_equal(out, smap)


def test_no_valid_cluster_passes_through():
    # Many scattered single pixels: enough points, but no component reaches
    # min_cluster_size -> n_clusters == 0 -> unfiltered (reference parity).
    smap = np.zeros((60, 80), np.float32)
    ys = np.arange(5, 60, 7)
    xs = np.arange(5, 80, 11)
    for y in ys:
        for x in xs:
            smap[y, x] = 100
    out = np.asarray(clustering_filter(
        smap[None], min_cluster_size=26, select_sum=2, op_close=False,
        bridge=0))[0]
    np.testing.assert_array_equal(out, smap)


def test_empty_map_stays_empty():
    smap = np.zeros((3, 60, 80), np.float32)
    out = np.asarray(clustering_filter(smap, min_cluster_size=5))
    assert (out == 0).all()


def test_resize_factor_roundtrip():
    # Same 60x80 canvas as the blob-selection tests: the eager op cache is
    # keyed on shapes, so reusing the canvas shares the per-op compiles
    # with the earlier tests on this 1-core host.
    smap = np.zeros((60, 80), np.float32)
    _blob(smap, 30, 40, 12, 180)
    _blob(smap, 10, 70, 3, 250)
    out = np.asarray(clustering_filter(
        smap[None], min_cluster_size=5, select_sum=1,
        resize_factor=4.0, resize_type=1, op_close=True))[0]
    assert out.shape == smap.shape
    # Main blob survives, far small blob suppressed.
    assert out[30, 40] > 100
    assert out[10, 70] == 0


def test_batched_consistency():
    # (3, 60, 80) / (1, 60, 80): shapes shared with test_empty_map and the
    # blob-selection tests above (see test_resize_factor_roundtrip note).
    vol = np.zeros((3, 60, 80), np.float32)
    _blob(vol[0], 20, 25, 7, 120)
    _blob(vol[1], 10, 10, 5, 90)
    _blob(vol[1], 30, 40, 6, 200)
    batched = np.asarray(clustering_filter(vol, min_cluster_size=5,
                                           select_sum=2, op_close=False))
    for i in range(3):
        single = np.asarray(clustering_filter(
            vol[i][None], min_cluster_size=5, select_sum=2, op_close=False))[0]
        np.testing.assert_array_equal(batched[i], single)
