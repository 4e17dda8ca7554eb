"""Butterworth / Savitzky-Golay / LOESS vs scipy + pyloess-semantics oracles."""

import numpy as np
import pytest
from scipy import signal as ssignal

from retargetvid_tpu.ops.filters import (

    butter_lowpass_filter,
    loess_smooth,
    savgol_smooth,
    smooth_segments,
)

#: Compile-heavy on CPU; excluded from the fast tier (pytest -m "not slow").
pytestmark = pytest.mark.slow

RNG = np.random.default_rng(23)


class TestButter:
    @pytest.mark.parametrize("n,cutoff,order", [(120, 2.0, 5), (60, 1.0, 2),
                                                (450, 2.0, 5), (19, 5.0, 1)])
    def test_matches_scipy_filtfilt(self, n, cutoff, order):
        fs = 30.0
        x = np.cumsum(RNG.normal(0, 3, n)).astype(np.float32) + 50
        b, a = ssignal.butter(order, cutoff / (0.5 * fs), btype='lowpass')
        ref = ssignal.filtfilt(b, a, x.astype(np.float64))
        L = 512
        xp = np.zeros(L, np.float32)
        xp[:n] = x
        out = np.asarray(butter_lowpass_filter(xp, n, cutoff, fs, order))[:n]
        np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-2)

    def test_short_segment_fallback(self):
        # n <= 3*(order+1): scipy raises; reference falls back to box conv.
        n, order = 15, 5
        x = RNG.uniform(0, 100, n).astype(np.float32)
        box = np.convolve(x, np.ones(5), 'same') / 5
        expect = x.copy()
        expect[2:n - 2] = box[2:n - 2]
        xp = np.zeros(64, np.float32)
        xp[:n] = x
        out = np.asarray(butter_lowpass_filter(xp, n, 2.0, 30.0, order))[:n]
        np.testing.assert_allclose(out, expect, rtol=1e-5)

    def test_tiny_segment_passthrough(self):
        n = 4
        x = RNG.uniform(0, 100, n).astype(np.float32)
        xp = np.zeros(16, np.float32)
        xp[:n] = x
        out = np.asarray(butter_lowpass_filter(xp, n, 2.0, 30.0, 5))[:n]
        np.testing.assert_allclose(out, x, rtol=1e-6)


class TestSavgol:
    @pytest.mark.parametrize("n,window", [(100, 59), (40, 21), (25, 23)])
    def test_matches_scipy(self, n, window):
        x = np.cumsum(RNG.normal(0, 2, n)).astype(np.float32) + 20
        ref = ssignal.savgol_filter(x.astype(np.float64), window, 2)
        L = 128
        xp = np.zeros(L, np.float32)
        xp[:n] = x
        bank = tuple(range(5, 60, 2))
        out = np.asarray(savgol_smooth(xp, n, window, 2, bank))[:n]
        np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-2)


def _loess_oracle(y, window, degree):
    """pyloess semantics: normalized x/y, contiguous nearest window,
    tricubic weights, weighted poly fit via pinv."""
    n = len(y)
    xx = np.arange(n, dtype=float)
    n_xx = xx / (n - 1)
    ymin, ymax = y.min(), y.max()
    n_yy = (y - ymin) / (ymax - ymin)
    out = np.empty(n)
    for j in range(n):
        lo = int(np.clip(j - (window - 1) // 2, 0, n - window))
        idx = np.arange(lo, lo + window)
        d = np.abs(n_xx[idx] - n_xx[j])
        w = np.zeros(window)
        u = d / d.max()
        m = u <= 1
        w[m] = (1 - u[m] ** 3) ** 3
        X = np.vander(n_xx[idx], degree + 1, increasing=True)
        W = np.diag(w)
        beta = np.linalg.pinv(X.T @ W @ X) @ X.T @ W @ n_yy[idx]
        out[j] = beta @ (n_xx[j] ** np.arange(degree + 1))
    return out * (ymax - ymin) + ymin


class TestLoess:
    @pytest.mark.parametrize("n,window", [(60, 21), (100, 59), (30, 15)])
    def test_matches_oracle(self, n, window):
        y = (np.cumsum(RNG.normal(0, 2, n)) + 30).astype(np.float32)
        ref = _loess_oracle(y.astype(np.float64), window, 2)
        L = 128
        yp = np.zeros(L, np.float32)
        yp[:n] = y
        out = np.asarray(loess_smooth(yp, n, window, 2, max_window=64))[:n]
        np.testing.assert_allclose(out, ref, rtol=1e-2, atol=0.15)

    def test_constant_fallback(self):
        y = np.full(40, 17.0, np.float32)
        yp = np.zeros(64, np.float32)
        yp[:40] = y
        out = np.asarray(loess_smooth(yp, 40, 15, 2, max_window=64))[:40]
        np.testing.assert_allclose(out, y)


class TestSmoothSegments:
    def test_two_segments_loess(self):
        t = 90
        dxi = (np.cumsum(RNG.normal(0, 2, t)) + 100).astype(np.float32)
        dyi = (np.cumsum(RNG.normal(0, 2, t)) + 60).astype(np.float32)
        seg_starts = np.array([0, 50, 0, 0], np.int32)
        seg_ends = np.array([49, 89, 0, 0], np.int32)
        fps = 30.0
        dxs, dys, dxl, dyl = smooth_segments(
            dxi, dyi, seg_starts, seg_ends, 2,
            fps=fps, loess_filt=1, w_secs=2.0, degree=2,
            lp_filt=1, lp_cutoff=2.0, lp_order=5, max_len=128)

        # oracle per segment
        b, a = ssignal.butter(5, 2.0 / (fps / 2), btype='lowpass')
        for (si, ei) in [(0, 49), (50, 89)]:
            cl = ei - si + 1
            ref_l = ssignal.filtfilt(b, a, dxi[si:ei + 1].astype(np.float64))
            np.testing.assert_allclose(np.asarray(dxl)[si:ei + 1], ref_l,
                                       rtol=1e-3, atol=2e-2)
            w = min(int(fps * 2.0), cl - 2)
            if w % 2 == 0:
                w -= 1
            ref_s = _loess_oracle(ref_l, w, 2)
            np.testing.assert_allclose(np.asarray(dxs)[si:ei + 1], ref_s,
                                       rtol=1e-2, atol=0.35)

    def test_savgol_mode(self):
        t = 60
        dxi = (np.cumsum(RNG.normal(0, 2, t)) + 100).astype(np.float32)
        dyi = dxi.copy()
        seg_starts = np.array([0, 0], np.int32)
        seg_ends = np.array([59, 0], np.int32)
        # fps 10 -> static savgol bank 5..19 (8 windows) instead of 5..59
        # (28): the BANKING semantics under test are window-count
        # independent, and window 59 itself is covered by
        # TestSavgol::test_matches_scipy[100-59]; the big bank's compile
        # dominated this test's 59 s on the 1-core host.
        fps = 10.0
        dxs, dys, dxl, dyl = smooth_segments(
            dxi, dyi, seg_starts, seg_ends, 1,
            fps=fps, loess_filt=0, w_secs=2.0, degree=2,
            lp_filt=1, lp_cutoff=1.0, lp_order=2, max_len=64)
        b, a = ssignal.butter(2, 1.0 / (fps / 2), btype='lowpass')
        ref_l = ssignal.filtfilt(b, a, dxi.astype(np.float64))
        w = min(int(fps * 2.0), t - 2)
        if w % 2 == 0:
            w -= 1
        ref_s = ssignal.savgol_filter(ref_l, w, 2)
        np.testing.assert_allclose(np.asarray(dxs), ref_s, rtol=1e-3, atol=5e-2)

    def test_short_segment_passthrough(self):
        t = 20
        dxi = RNG.uniform(0, 100, t).astype(np.float32)
        seg_starts = np.array([0, 8], np.int32)
        seg_ends = np.array([7, 19], np.int32)
        dxs, dys, dxl, dyl = smooth_segments(
            dxi, dxi, seg_starts, seg_ends, 2,
            fps=30.0, loess_filt=1, w_secs=2.0, degree=2,
            lp_filt=0, lp_cutoff=2.0, lp_order=5, max_len=32)
        # first segment has cl=8 (<10): passthrough of (unfiltered) input
        np.testing.assert_allclose(np.asarray(dxs)[:8], dxi[:8], rtol=1e-6)
