"""Temporal smoothing filters, on device.

Reference chain (``smartVidCrop.py:1599-1734``): per shot segment the
interpolated center series is Butterworth low-passed (``filtfilt``) and then
smoothed with LOESS (default preset) or Savitzky-Golay (best preset).

TPU formulations:

- **Butterworth filtfilt** — second-order-section cascade of the affine
  recurrence ``s_n = M s_{n-1} + v * x_n`` run as a sequential
  ``jax.lax.scan`` (a few hundred 2x2 steps per pass; vmapped across
  segments/channels).  An associative-scan (O(log T) depth) formulation was
  tried and REVERTED: composing the affine maps in a tree is numerically
  unstable in float32 (~8 px error on real center signals vs 2e-4 for the
  sequential form — see ``_masked_lfilter``).  Forward/backward passes with
  scipy's odd-extension padding and per-section ``sosfilt_zi`` initial
  conditions reproduce ``scipy.signal.filtfilt``; segments shorter than the
  pad length fall back to the reference's box-convolution repair.  Variable
  segment length is handled by masking the scan steps (state passthrough on
  dead lanes), so one compiled program covers every segment.
- **Savitzky-Golay** — window length is data-dependent (``min(fps*w, cl-2)``
  forced odd), so the static coefficient banks for every reachable odd window
  are compiled in and the live window selected per segment.  The ``interp``
  edge mode (polynomial fit over the first/last window) is a pair of
  precomputed projection matrices per window.
- **LOESS** — for uniformly spaced samples the reference's nearest-``w``
  window is a closed-form contiguous range, so LOESS becomes a batched
  tricubic-weighted quadratic least-squares solve: one (T, 3, 3) solve per
  segment on the MXU, replacing the per-position Python estimator of
  ``pyloess``.  The solve runs in a window-centered/scaled basis with
  mean-centered y and one iterative-refinement step — the raw-x Vandermonde
  produced +-8 px float32 noise at segment tails (see ``loess_smooth``).
  The reference's NaN fallback (degenerate y range) is reproduced.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "butter_lowpass_filter", "savgol_smooth", "loess_smooth",
    "smooth_segments",
]

_BIG = 1e12


def _safe_div(a, b):
    return a / jnp.where(b == 0, 1.0, b)


# ---------------------------------------------------------------------------
# Butterworth low-pass via associative scan
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _butter_design(cutoff: float, fs: float, order: int):
    """Butterworth design as second-order sections — static, host-side.

    High-order direct-form IIR recurrences are ill-conditioned in float32;
    the SOS cascade has the same transfer function (so the result still
    matches ``scipy.signal.filtfilt(b, a, x)``) with biquad-level
    conditioning.  Returns ``(padlen, sections)`` where each section is
    ``(b0, M (2,2), v (2,), zi (2,))`` of the DF2T affine recurrence
    ``s_n = M s_{n-1} + v x_n``, ``y_n = b0 x_n + s_{n-1}[0]``.
    """
    from scipy import signal
    nyq = 0.5 * fs
    b, a = signal.butter(order, cutoff / nyq, btype='lowpass', analog=False)
    padlen = 3 * max(len(a), len(b))
    sos = signal.butter(order, cutoff / nyq, btype='lowpass', output='sos')
    zi_all = signal.sosfilt_zi(sos)          # (n_sections, 2), unit-step scaled
    sections = []
    for k in range(sos.shape[0]):
        b0, b1, b2, _, a1, a2 = sos[k]
        m = np.array([[-a1, 1.0], [-a2, 0.0]], np.float32)
        v = np.array([b1 - a1 * b0, b2 - a2 * b0], np.float32)
        sections.append((float(b0), m, v, zi_all[k].astype(np.float32)))
    return padlen, sections


def _masked_lfilter(x, mask, s0, b0, m, v):
    """lfilter over a padded sequence; masked-out lanes pass state through.

    Sequential ``lax.scan`` by design: an associative-scan formulation
    (composing the per-step affine maps in a tree) is mathematically
    equivalent but numerically unstable in float32 — long-span products of
    the biquad transition matrix mix O(1) and O(rho^k) magnitudes and the
    cancellation showed up as ~8 px oscillation on real center signals
    (vs 2e-4 for this sequential form against scipy).  The scan is ~500
    tiny steps per pass; vmapped across segments/channels it stays far
    inside the geometry budget.
    """

    def step(s, inp):
        xt, mt = inp
        y = jnp.where(mt, b0 * xt + s[0], xt)
        s = jnp.where(mt, m @ s + v * xt, s)
        return s, y

    _, ys = jax.lax.scan(step, s0, (x, mask))
    return ys


def butter_lowpass_filter(x, n, cutoff: float, fs: float, order: int,
                          max_len: int | None = None):
    """scipy ``filtfilt`` parity on a padded series with live length ``n``.

    ``x``: (L,) padded input; live entries [0, n).  Short segments
    (``n <= 3*(order+1)``, where scipy raises) use the reference's
    box-convolution fallback (``smartVidCrop.py:1611-1615``).
    Returns (L,) with live entries filtered.
    """
    x = jnp.asarray(x, jnp.float32)
    L = x.shape[0] if max_len is None else max_len
    padlen, sections = _butter_design(float(cutoff), float(fs), int(order))

    def cascade(sig, mask, x0):
        """SOS cascade of masked affine-scan biquads (scipy sosfilt parity:
        every section's zi scales by the ORIGINAL first input sample)."""
        y = sig
        for b0, m, v, zi in sections:
            y = _masked_lfilter(y, mask, jnp.asarray(zi) * x0, b0,
                                jnp.asarray(m), jnp.asarray(v))
        return y

    idx = jnp.arange(L + 2 * padlen)
    n = jnp.asarray(n, jnp.int32)
    xe = x[jnp.clip(n - 1, 0, L - 1)]
    x0 = x[0]

    # Odd extension, positions: [0,padlen) left ext, [padlen, padlen+n) data,
    # [padlen+n, 2*padlen+n) right ext.
    left = 2.0 * x0 - x[jnp.clip(padlen - idx, 0, L - 1)]
    mid = x[jnp.clip(idx - padlen, 0, L - 1)]
    jr = idx - padlen - n
    right = 2.0 * xe - x[jnp.clip(n - 2 - jr, 0, L - 1)]
    ext = jnp.where(idx < padlen, left,
                    jnp.where(idx < padlen + n, mid,
                              jnp.where(idx < 2 * padlen + n, right, 0.0)))
    ext_mask = idx < 2 * padlen + n

    # Forward pass.
    y1 = cascade(ext, ext_mask, ext[0])
    # Backward pass: reverse the LIVE region.  Gather live elements reversed
    # into the front of the physical array.
    last = 2 * padlen + n - 1
    rev_idx = jnp.clip(last - idx, 0, L + 2 * padlen - 1)
    y1r = y1[rev_idx]
    y2 = cascade(y1r, ext_mask, y1r[0])
    y2r = y2[rev_idx]
    filt = y2r[padlen:padlen + L]

    # Reference fallback for short segments: box-5 convolution of the
    # interior, ends passed through.
    xz = jnp.where(jnp.arange(L) < n, x, 0.0)
    box = jnp.convolve(xz, jnp.ones(5, jnp.float32), mode='same') / 5.0
    pos = jnp.arange(L)
    fallback = jnp.where((pos >= 2) & (pos < n - 2), box, x)

    return jnp.where(n > padlen, filt, fallback)


# ---------------------------------------------------------------------------
# Savitzky-Golay with window banking
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=256)
def _savgol_bank(window: int, degree: int):
    """FIR coeffs + edge polynomial-fit projection matrices (static)."""
    from scipy.signal import savgol_coeffs
    coeffs = savgol_coeffs(window, degree)
    half = window // 2
    # Edge fit: least-squares polynomial over the first/last `window` samples,
    # evaluated at the edge positions — a (half, window) projection.
    pos = np.arange(window)
    vand = np.vander(pos, degree + 1, increasing=True)
    proj = vand @ np.linalg.pinv(vand)            # (window, window)
    head = proj[:half]                            # rows for positions 0..half-1
    tail = proj[window - half:]                   # rows for last half positions
    return (coeffs.astype(np.float32), head.astype(np.float32),
            tail.astype(np.float32))


def _savgol_fixed(x, n, window: int, degree: int):
    """savgol_filter(x[:n], window, degree, mode='interp') on padded (L,)."""
    L = x.shape[0]
    coeffs, head, tail = _savgol_bank(window, degree)
    half = window // 2
    pos = jnp.arange(L)
    live = pos < n

    xz = jnp.where(live, x, 0.0)
    mid = jnp.correlate(xz, jnp.asarray(coeffs), mode='same')

    # Head fit over x[0:window].
    first = x[jnp.clip(jnp.arange(window), 0, L - 1)]
    head_vals = jnp.asarray(head) @ first                      # (half,)
    # Tail fit over x[n-window:n].
    tail_idx = jnp.clip(n - window + jnp.arange(window), 0, L - 1)
    last = x[tail_idx]
    tail_vals = jnp.asarray(tail) @ last                       # (half,)

    out = mid
    out = jnp.where(pos < half, head_vals[jnp.clip(pos, 0, half - 1)], out)
    tpos = pos - (n - half)
    out = jnp.where((tpos >= 0) & live,
                    tail_vals[jnp.clip(tpos, 0, half - 1)], out)
    return jnp.where(live, out, x)


def savgol_smooth(x, n, window, degree: int, window_bank):
    """Savitzky-Golay with a data-dependent odd window from a static bank."""
    out = x
    for w in window_bank:
        cand = _savgol_fixed(x, n, int(w), degree)
        out = jnp.where(window == w, cand, out)
    return out


# ---------------------------------------------------------------------------
# LOESS (pyloess parity)
# ---------------------------------------------------------------------------

def loess_smooth(y, n, window, degree: int, max_window: int):
    """LOESS over uniformly spaced samples, pyloess parity.

    ``y``: (L,) padded series, live [0, n); ``window`` traced odd scalar.
    Window per position j: the contiguous ``window`` nearest indices with the
    reference's alternate-right-first tie policy — closed form
    ``lo = clip(j - (window-1)//2, 0, n-window)``.
    Degenerate y range (all equal) falls back to the input, matching the
    reference's NaN fallback (``smartVidCrop.py:1639-1640``).
    """
    L = y.shape[0]
    pos = jnp.arange(L)
    live = pos < n
    w = jnp.asarray(window, jnp.int32)

    ymin = jnp.min(jnp.where(live, y, jnp.inf))
    ymax = jnp.max(jnp.where(live, y, -jnp.inf))
    yr = ymax - ymin
    denom_n = jnp.maximum(n - 1, 1).astype(jnp.float32)
    n_y = _safe_div(y - ymin, yr)

    half_lo = (w - 1) // 2
    lo = jnp.clip(pos - half_lo, 0, jnp.maximum(n - w, 0))     # (L,)
    k = jnp.arange(max_window)                                  # (W,)
    widx = lo[:, None] + k[None, :]                             # (L, W)
    in_win = k[None, :] < w
    gidx = jnp.clip(widx, 0, L - 1)

    xw = widx.astype(jnp.float32) / denom_n                     # normalized x
    yw = n_y[gidx]
    xj = pos.astype(jnp.float32) / denom_n                      # eval points

    dist = jnp.abs(xw - xj[:, None])
    maxd = jnp.max(jnp.where(in_win, dist, -jnp.inf), axis=1, keepdims=True)
    u = _safe_div(dist, maxd)
    wts = jnp.where(in_win & (u <= 1.0), (1.0 - u ** 3) ** 3, 0.0)

    # Weighted polynomial fit of `degree`, evaluated at xj.  The basis is
    # CENTERED at the evaluation point and scaled by the window radius
    # (same fitted polynomial, so still pyloess parity): the raw-x
    # Vandermonde [1, x, x^2] at x near 1 is close to collinear and the
    # float32 3x3 solve returned +-8 px noise at segment tails; in the
    # centered/scaled basis the columns are O(1) and the value at the
    # evaluation point is simply beta[0].
    powers = jnp.arange(degree + 1, dtype=jnp.float32)
    xc = _safe_div(xw - xj[:, None], maxd)                      # in [-1, 1]
    design = xc[:, :, None] ** powers[None, None, :]            # (L, W, D)
    # Conditioning in float32: centered/scaled basis (columns O(1)), the
    # y values centered on their weighted mean (solution magnitudes are
    # then the LOCAL variation, not the absolute level), and one step of
    # iterative refinement on the normal equations.  (Batched QR would be
    # cleaner but hangs on this CPU backend.)
    wsum = jnp.maximum(jnp.sum(wts, axis=1, keepdims=True), 1e-20)
    ybar = jnp.sum(wts * yw, axis=1, keepdims=True) / wsum
    yc = yw - ybar
    wd = design * wts[:, :, None]
    ata = jnp.einsum('lwd,lwe->lde', wd, design)                # (L, D, D)
    atb = jnp.einsum('lwd,lw->ld', wd, yc)                      # (L, D)
    beta = jnp.linalg.solve(ata, atb[..., None])[..., 0]        # (L, D)
    resid = atb - jnp.einsum('lde,le->ld', ata, beta)
    beta = beta + jnp.linalg.solve(ata, resid[..., None])[..., 0]
    out = (beta[:, 0] + ybar[:, 0]) * yr + ymin

    bad = (yr == 0) | jnp.any(jnp.where(live, jnp.isnan(out), False))
    out = jnp.where(bad, y, out)
    return jnp.where(live, out, y)


# ---------------------------------------------------------------------------
# Per-segment smoothing orchestration (reference sc_smoothing)
# ---------------------------------------------------------------------------

def _odd_window(cl, fps: float, w_secs: float):
    adj = jnp.minimum(jnp.int32(int(fps * w_secs)), cl - 2)
    return jnp.where(adj % 2 == 0, adj - 1, adj)


def smooth_segments(dxi, dyi, seg_starts, seg_ends, n_segments, *,
                    fps: float, loess_filt: int, w_secs: float, degree: int,
                    lp_filt: int, lp_cutoff: float, lp_order: int,
                    max_len: int):
    """Low-pass + LOESS/Savgol every segment of the (T,) center series.

    Returns (dxs, dys, dxl, dyl): smoothed and low-passed series, (T,) each.
    Segments shorter than 10 frames pass the low-passed series through
    (reference ``loess_handler``).
    """
    dxi = jnp.asarray(dxi, jnp.float32)
    dyi = jnp.asarray(dyi, jnp.float32)
    t_out = dxi.shape[0]
    s = seg_starts.shape[0]
    live_seg = jnp.arange(s) < n_segments

    w_static = int(fps * w_secs)
    if w_static % 2 == 0:
        w_static -= 1
    window_bank = tuple(w for w in range(5, max(w_static, 5) + 1, 2))

    def one(si, ei, live):
        cl = jnp.where(live, ei - si + 1, 1)
        k = jnp.arange(max_len)
        gidx = jnp.clip(si + k, 0, t_out - 1)
        seg_mask = k < cl
        window = _odd_window(cl, fps, w_secs)

        def chan(series):
            xs = jnp.where(seg_mask, series[gidx], 0.0)
            if lp_filt:
                xl = butter_lowpass_filter(xs, cl, lp_cutoff, fps, lp_order,
                                           max_len=max_len)
            else:
                xl = xs
            if loess_filt:
                sm = loess_smooth(xl, cl, window, degree,
                                  max_window=max(w_static, 5))
            else:
                sm = savgol_smooth(xl, cl, window, degree, window_bank)
            sm = jnp.where(cl < 10, xl, sm)
            return xl, sm

        xl, xs_sm = chan(dxi)
        yl, ys_sm = chan(dyi)
        return xl, xs_sm, yl, ys_sm, cl

    xl, xs_sm, yl, ys_sm, cls = jax.vmap(one)(seg_starts, seg_ends, live_seg)

    # Scatter per-segment results back into the (T,) series.
    k = jnp.arange(max_len)[None, :]
    gpos = seg_starts[:, None] + k
    mask = (k < cls[:, None]) & live_seg[:, None]
    safe = jnp.clip(gpos, 0, t_out - 1)

    def gather_out(vals):
        out = jnp.zeros((t_out,), jnp.float32)
        return out.at[safe].add(jnp.where(mask, vals, 0.0))

    return (gather_out(xs_sm), gather_out(ys_sm),
            gather_out(xl), gather_out(yl))
