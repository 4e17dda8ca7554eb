"""Resize-as-matmul vs cv2 / PIL oracles."""

import cv2
import numpy as np
import PIL.Image
import pytest

from retargetvid_tpu.ops.resize import resize

#: Compile-heavy on CPU; excluded from the fast tier (pytest -m "not slow").
pytestmark = pytest.mark.slow


RNG = np.random.default_rng(42)


@pytest.mark.parametrize("shape,out", [((36, 64), (18, 32)),
                                       ((27, 48), (54, 96)),
                                       ((35, 63), (140, 250)),
                                       ((140, 250), (35, 63))])
def test_linear_matches_cv2(shape, out):
    img = RNG.integers(0, 256, size=shape).astype(np.uint8)
    ours = np.round(np.asarray(resize(img, out, 'linear')))
    ref = cv2.resize(img, (out[1], out[0]), interpolation=cv2.INTER_LINEAR)
    # cv2 uses 11-bit fixed-point coefficients; rounded outputs differ <= 1.
    assert np.abs(ours - ref.astype(np.float32)).max() <= 1.0
    assert np.abs(ours - ref.astype(np.float32)).mean() < 0.2


@pytest.mark.parametrize("shape,out", [((36, 64), (18, 32)),
                                       ((140, 250), (35, 63)),
                                       ((33, 57), (17, 29))])
def test_nearest_matches_cv2(shape, out):
    img = RNG.integers(0, 256, size=shape).astype(np.uint8)
    ours = np.asarray(resize(img, out, 'nearest'))
    ref = cv2.resize(img, (out[1], out[0]), interpolation=cv2.INTER_NEAREST)
    assert (ours == ref.astype(np.float32)).mean() > 0.99


def test_cubic_close_to_cv2():
    img = RNG.integers(0, 256, size=(36, 64)).astype(np.uint8)
    ours = np.clip(np.round(np.asarray(resize(img, (18, 32), 'cubic'))), 0, 255)
    ref = cv2.resize(img, (32, 18), interpolation=cv2.INTER_CUBIC)
    assert np.abs(ours - ref.astype(np.float32)).max() <= 1.0


@pytest.mark.parametrize("shape,out", [((140, 250), (256, 416)),
                                       ((64, 64), (32, 32))])
def test_lanczos_matches_pil(shape, out):
    # Smooth natural-ish content: PIL clips to [0,255] after EACH 1-D pass,
    # our fused two-matmul path only at the end, so white-noise images
    # maximize an edge-lobe artifact that natural frames do not hit.
    yy, xx = np.mgrid[0:shape[0], 0:shape[1]].astype(np.float32)
    img = np.stack([
        127 + 100 * np.sin(yy / 9.0) * np.cos(xx / 13.0),
        127 + 80 * np.cos(yy / 17.0 + 1) * np.sin(xx / 7.0),
        np.clip(255 * np.exp(-((yy - shape[0] / 2) ** 2 +
                               (xx - shape[1] / 2) ** 2) / 900.0), 0, 255),
    ], axis=-1).astype(np.uint8)
    ours = np.clip(np.round(np.asarray(resize(img, out, 'lanczos'))), 0, 255)
    ref = np.asarray(PIL.Image.fromarray(img).resize(
        (out[1], out[0]), PIL.Image.LANCZOS)).astype(np.float32)
    assert np.abs(ours - ref).max() <= 3.0
    assert np.abs(ours - ref).mean() < 0.3


def test_channels_last_batched():
    img = RNG.integers(0, 256, size=(5, 36, 64, 3)).astype(np.uint8)
    out = np.asarray(resize(img, (18, 32), 'linear'))
    assert out.shape == (5, 18, 32, 3)
    single = np.asarray(resize(img[2], (18, 32), 'linear'))
    np.testing.assert_allclose(out[2], single, rtol=1e-5)


def test_batched_no_channels():
    vol = RNG.integers(0, 256, size=(7, 36, 64)).astype(np.uint8)
    out = np.asarray(resize(vol, (18, 32), 'linear'))
    assert out.shape == (7, 18, 32)
    single = np.asarray(resize(vol[3], (18, 32), 'linear'))
    np.testing.assert_allclose(out[3], single, rtol=1e-5)
