"""Center-of-mass vs the reference's 1-cluster KMeans oracle."""

import pytest
import cv2
import numpy as np
from sklearn.cluster import KMeans

from retargetvid_tpu.ops.center import center_of_mass

#: Compile-heavy on CPU; excluded from the fast tier (pytest -m "not slow").
pytestmark = pytest.mark.slow


RNG = np.random.default_rng(11)


def _oracle_km(sal_map, factor):
    """Reference semantics: nearest-downscale, 1-cluster KMeans over
    (row, col, value) points, centers scaled back by factor."""
    small = cv2.resize(sal_map, None, fx=1.0 / factor, fy=1.0 / factor,
                       interpolation=cv2.INTER_NEAREST)
    rows, cols = np.nonzero(small)
    if len(rows) == 0:
        return None, None
    vals = small[rows, cols].astype(float)
    max_dim = max(small.shape)
    pts = np.stack([rows, cols, vals / vals.max() * max_dim], axis=1)
    pts = pts.astype(np.uint8).astype(float)
    init = np.array([[rows[small[rows, cols].argmax()],
                      cols[small[rows, cols].argmax()],
                      small.max()]], dtype=float)
    km = KMeans(n_clusters=1, random_state=0, init=init, n_init=1,
                max_iter=5).fit(pts)
    x = km.cluster_centers_[0][1] * factor
    y = km.cluster_centers_[0][0] * factor
    return x, y


def test_km_center_matches_kmeans_oracle():
    for _ in range(5):
        smap = np.zeros((70, 125), np.float32)
        cy, cx = RNG.integers(15, 55), RNG.integers(20, 105)
        yy, xx = np.mgrid[0:70, 0:125]
        blob = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / 80.0)) * 255
        smap[blob > 90] = blob[blob > 90]
        x, y, valid = center_of_mass(smap[None], km=True, factor=2.0)
        ox, oy = _oracle_km(smap, 2.0)
        assert bool(valid[0])
        assert abs(float(x[0]) - ox) < 1e-3
        assert abs(float(y[0]) - oy) < 1e-3


def test_km_center_factor1():
    smap = np.zeros((40, 60), np.float32)
    smap[10:14, 20:26] = 100
    x, y, valid = center_of_mass(smap[None], km=True, factor=1.0)
    # Mean of coords: rows 10..13 -> 11.5, cols 20..25 -> 22.5
    assert float(y[0]) == 11.5
    assert float(x[0]) == 22.5


def test_argmax_center():
    smap = np.zeros((40, 60), np.float32)
    smap[17, 33] = 250
    smap[5, 5] = 100
    x, y, valid = center_of_mass(smap[None], km=False)
    assert (float(x[0]), float(y[0])) == (33.0, 17.0)
    assert bool(valid[0])


def test_empty_invalid():
    smap = np.zeros((2, 40, 60), np.float32)
    # Even coords so the 1/2 nearest-downscale keeps the pixel (cv2 nearest
    # samples even rows/cols at factor 2 — a single odd-coordinate pixel
    # disappears in the reference too).
    smap[1, 4, 6] = 10
    x, y, valid = center_of_mass(smap, km=True, factor=2.0)
    assert not bool(valid[0])
    assert bool(valid[1])
