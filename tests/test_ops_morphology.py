"""Morphology vs cv2 oracle."""

import pytest
import cv2
import numpy as np

from retargetvid_tpu.ops.morphology import close, dilate, erode

#: Compile-heavy on CPU; excluded from the fast tier (pytest -m "not slow").
pytestmark = pytest.mark.slow


RNG = np.random.default_rng(7)


def test_close_matches_cv2():
    img = RNG.integers(0, 256, size=(40, 60)).astype(np.uint8)
    img[img < 120] = 0
    kernel = np.ones((5, 5), np.uint8)
    ref = cv2.morphologyEx(img, cv2.MORPH_CLOSE, kernel)
    ours = np.asarray(close(img, 5))
    assert (ours == ref).all()


def test_dilate_erode_match_cv2():
    img = RNG.integers(0, 256, size=(30, 50)).astype(np.uint8)
    kernel = np.ones((5, 5), np.uint8)
    assert (np.asarray(dilate(img, 5)) == cv2.dilate(img, kernel)).all()
    assert (np.asarray(erode(img, 5)) == cv2.erode(img, kernel)).all()


def test_batched_close():
    vol = RNG.integers(0, 256, size=(4, 30, 50)).astype(np.uint8)
    vol[vol < 100] = 0
    out = np.asarray(close(vol, 5))
    kernel = np.ones((5, 5), np.uint8)
    for i in range(4):
        ref = cv2.morphologyEx(vol[i], cv2.MORPH_CLOSE, kernel)
        assert (out[i] == ref).all()
