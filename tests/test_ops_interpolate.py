"""Per-segment interpolation vs scipy interp1d oracle."""

import numpy as np
import pytest
from scipy import interpolate as sinterp

from retargetvid_tpu.ops.interpolate import interp_segment, interpolate_segments

#: Compile-heavy on CPU; excluded from the fast tier (pytest -m "not slow").
pytestmark = pytest.mark.slow


RNG = np.random.default_rng(17)
MAXN = 32


def _pad(xs, ys, maxn):
    n = len(xs)
    xs_p = np.zeros(maxn, np.float32)
    ys_p = np.zeros(maxn, np.float32)
    xs_p[:n] = xs
    ys_p[:n] = ys
    # ascending continuation like the pipeline builds
    xs_p[n:] = xs[-1] + np.arange(n, maxn) - (n - 1)
    ys_p[n:] = ys[-1]
    return xs_p, ys_p


def test_repeat_under_3():
    for n in (1, 2):
        xs = np.arange(n, dtype=np.float32) * 6
        ys = RNG.uniform(0, 100, n).astype(np.float32)
        xe = np.arange(10, dtype=np.float32)
        xs_p, ys_p = _pad(xs, ys, MAXN)
        out = np.asarray(interp_segment(xs_p, ys_p, n, xe, MAXN))
        np.testing.assert_allclose(out, np.full(10, ys[0]), rtol=1e-5)


@pytest.mark.parametrize("n", [3, 4, 6])
def test_linear_matches_scipy(n):
    xs = np.sort(RNG.choice(np.arange(0, 40), n, replace=False)).astype(np.float32)
    ys = RNG.uniform(0, 100, n).astype(np.float32)
    xe = np.arange(45, dtype=np.float32)  # includes extrapolation
    f = sinterp.interp1d(xs, ys, kind='linear', fill_value='extrapolate')
    ref = f(xe)
    xs_p, ys_p = _pad(xs, ys, MAXN)
    out = np.asarray(interp_segment(xs_p, ys_p, n, xe, MAXN))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("n", [7, 9, 15, 30])
def test_quadratic_matches_scipy(n):
    xs = np.sort(RNG.choice(np.arange(0, 200), n, replace=False)).astype(np.float64)
    ys = RNG.uniform(0, 100, n)
    xe = np.arange(-3, int(xs[-1]) + 5, dtype=np.float64)  # with extrapolation
    f = sinterp.interp1d(xs, ys, kind='quadratic', fill_value='extrapolate')
    ref = f(xe)
    xs_p, ys_p = _pad(xs.astype(np.float32), ys.astype(np.float32), MAXN)
    out = np.asarray(interp_segment(
        xs_p, ys_p, n, xe.astype(np.float32), MAXN))
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=0.35)


def test_full_segments_pipeline():
    """Multi-segment series against per-segment scipy."""
    # selected frames every 6 within two segments [0..29], [30..59]
    true_inds = np.array(list(range(0, 30, 6)) + [29] +
                         list(range(30, 60, 6)) + [59], np.int32)
    t_sel = len(true_inds)
    d_sel = RNG.uniform(0, 100, t_sel).astype(np.float32)
    seg_starts = np.array([0, 30], np.int32)
    seg_ends = np.array([29, 59], np.int32)
    # selected-frame bounds: first 6 entries are segment 0, rest segment 1
    seg_sel_starts = np.array([0, 6], np.int32)
    seg_sel_ends = np.array([5, t_sel - 1], np.int32)

    out = np.asarray(interpolate_segments(
        d_sel, true_inds, seg_starts, seg_ends,
        seg_sel_starts, seg_sel_ends, n_segments=2, t_out=60,
        max_samples=16, max_len=64))

    # oracle: per segment scipy quadratic (both segments have >= 7 samples)
    ref = np.zeros(60)
    for (si, ei, ss, se) in [(0, 29, 0, 5), (30, 59, 6, t_sel - 1)]:
        xs = true_inds[ss:se + 1] - true_inds[ss]
        ys = d_sel[ss:se + 1]
        kind = 'quadratic' if len(xs) >= 7 else 'linear'
        f = sinterp.interp1d(xs, ys, kind=kind, fill_value='extrapolate')
        ref[si:ei + 1] = f(np.arange(ei - si + 1))
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=0.35)
