"""Per-segment center interpolation, on device.

Reference ``interp_handler``/``sc_interpolate`` (``smartVidCrop.py:1528-1597``)
up-samples the per-selected-frame centers to every true frame, one shot
segment at a time:

- < 3 samples: repeat the first value,
- 3..6 samples: linear interpolation with extrapolation,
- >= 7 samples: scipy ``interp1d(kind='quadratic')`` — a quadratic B-spline
  with not-a-knot knots (midpoints, triple end knots), extrapolated.

TPU formulation: segments are padded to static (S, L) shapes and processed
with ``vmap``; the quadratic spline solves a padded collocation system
(identity rows beyond the live sample count) built with the BSPLVB basis
recursion and evaluated with de Boor extrapolation — so the data-dependent
segment lengths never change the compiled shapes.  All three interpolation
kinds are computed and the per-segment result selected by live length,
matching the reference's dispatch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["interpolate_segments", "interp_segment"]

_K = 2          # quadratic
_BIG = 1e12     # knot padding sentinel


def _safe_div(a, b):
    return a / jnp.where(b == 0, 1.0, b)


def _build_knots(xs, n, max_n):
    """Not-a-knot quadratic knot vector, padded to max_n + 3.

    scipy ``_not_a_knot(x, k=2)``: interior knots are the midpoints
    (x[j]+x[j+1])/2 for j = 1..n-3, flanked by triple knots at x[0], x[n-1].
    ``xs`` is (max_n,) with live entries [0, n); ``n`` is traced.
    """
    x0 = xs[0]
    xe = xs[jnp.maximum(n - 1, 0)]
    p = jnp.arange(max_n + 3)
    # positions 0..2 -> x0; 3..n-1 -> midpoint(x[p-2], x[p-1]); n..n+2 -> xe
    mid_lo = xs[jnp.clip(p - 2, 0, max_n - 1)]
    mid_hi = xs[jnp.clip(p - 1, 0, max_n - 1)]
    mids = 0.5 * (mid_lo + mid_hi)
    t = jnp.where(p < 3, x0, jnp.where(p < n, mids,
                  jnp.where(p < n + 3, xe, _BIG)))
    return t


def _bsplvb(t, i, x):
    """Values of the k+1=3 quadratic B-spline bases active on interval ``i``.

    de Boor's BSPLVB recursion, valid as polynomial extension when ``x`` lies
    outside [t[i], t[i+1]) (that is how splev extrapolates).  Vectorized over
    ``x``/``i`` of any matching shape; returns (..., 3) for bases i-2, i-1, i.
    """
    shape = jnp.shape(x)
    vals = [jnp.ones(shape)] + [jnp.zeros(shape), jnp.zeros(shape)]
    for d in range(1, _K + 1):
        saved = jnp.zeros(shape)
        new_vals = list(vals)
        for r in range(d):
            right = t[i + r + 1] - x
            left = x - t[i + 1 - (d - r)]
            term = _safe_div(vals[r], right + left)
            new_vals[r] = saved + right * term
            saved = left * term
        new_vals[d] = saved
        vals = new_vals
    return jnp.stack(vals, axis=-1)


def _interval_index(t, x, n):
    """Knot interval of ``x``: largest i with t[i] <= x, clamped to [k, n-1]."""
    i = jnp.searchsorted(t, x, side='right') - 1
    return jnp.clip(i, _K, jnp.maximum(n - 1, _K))


def _quadratic_spline(xs, ys, n, x_eval, max_n):
    """scipy interp1d(kind='quadratic', fill_value='extrapolate') parity.

    xs, ys: (max_n,) padded samples (live [0, n), xs ascending there).
    x_eval: (L,) evaluation points.  Safe (garbage, not NaN-free) when
    n < 3 — callers select away those lanes.
    """
    t = _build_knots(xs, n, max_n)

    # Collocation matrix: row i has the 3 active basis values of sample i.
    ii = _interval_index(t, xs, n)
    basis = _bsplvb(t, ii, xs)                       # (max_n, 3)
    rows = jnp.arange(max_n)
    cols = ii[:, None] - jnp.array([2, 1, 0])[None, :]
    live = rows < n
    mat = jnp.zeros((max_n, max_n))
    mat = mat.at[rows[:, None], jnp.clip(cols, 0, max_n - 1)].add(
        jnp.where(live[:, None], basis, 0.0))
    # Identity rows/cols for padded lanes keep the system non-singular.
    eye = jnp.eye(max_n)
    mat = jnp.where(live[:, None], mat, eye)
    rhs = jnp.where(live, ys, 0.0)
    coefs = jnp.linalg.solve(mat, rhs)

    ie = _interval_index(t, x_eval, n)
    be = _bsplvb(t, ie, x_eval)                      # (L, 3)
    ce = coefs[jnp.clip(ie[:, None] - jnp.array([2, 1, 0])[None, :],
                        0, max_n - 1)]
    return jnp.sum(be * ce, axis=-1)


def _linear_extrap(xs, ys, n, x_eval, max_n):
    """Linear interpolation with end extrapolation (interp1d 'linear')."""
    xs_pad = jnp.where(jnp.arange(max_n) < n, xs, _BIG)
    j = jnp.searchsorted(xs_pad, x_eval, side='right') - 1
    j = jnp.clip(j, 0, jnp.maximum(n - 2, 0))
    x0 = xs_pad[j]
    x1 = xs_pad[jnp.minimum(j + 1, max_n - 1)]
    y0 = ys[j]
    y1 = ys[jnp.minimum(j + 1, max_n - 1)]
    slope = _safe_div(y1 - y0, x1 - x0)
    return y0 + slope * (x_eval - x0)


def interp_segment(xs, ys, n, x_eval, max_n):
    """Interpolate one segment with the reference's length dispatch."""
    quad = _quadratic_spline(xs, ys, n, x_eval, max_n)
    lin = _linear_extrap(xs, ys, n, x_eval, max_n)
    rep = jnp.full_like(x_eval, ys[0])
    out = jnp.where(n < 3, rep, jnp.where(n <= 6, lin, quad))
    return out


def interpolate_segments(d_sel, true_inds,
                         seg_starts, seg_ends,
                         seg_sel_starts, seg_sel_ends,
                         n_segments, t_out: int,
                         max_samples: int, max_len: int):
    """Up-sample selected-frame centers to every true frame, per segment.

    Args:
      d_sel: (T_sel,) padded center series over selected frames.
      true_inds: (T_sel,) int32 true frame index of each selected frame.
      seg_starts/seg_ends: (S,) int32 true-frame segment bounds (inclusive).
      seg_sel_starts/seg_sel_ends: (S,) selected-frame bounds (inclusive).
      n_segments: number of live segments.
      t_out: static output length (true frames, padded).
      max_samples: static per-segment sample capacity.
      max_len: static per-segment true-frame capacity.

    Returns (t_out,) float32 — the concatenated per-segment interpolations
    (reference ``vid_data['dxi']``).
    """
    d_sel = jnp.asarray(d_sel, jnp.float32)
    true_inds = jnp.asarray(true_inds, jnp.int32)
    s = seg_starts.shape[0]

    def one(si, ei, sis, eis, live):
        n = jnp.where(live, eis - sis + 1, 0)
        samp = jnp.arange(max_samples)
        gather = jnp.clip(sis + samp, 0, d_sel.shape[0] - 1)
        xs_raw = true_inds[gather].astype(jnp.float32)
        base = xs_raw[0]
        # Pad xs ascending beyond the live range to keep searchsorted sane.
        xs = jnp.where(samp < n, xs_raw - base,
                       (xs_raw[jnp.maximum(n - 1, 0)] - base) + samp.astype(jnp.float32))
        ys = jnp.where(samp < n, d_sel[gather], d_sel[jnp.clip(
            sis + jnp.maximum(n - 1, 0), 0, d_sel.shape[0] - 1)])
        x_eval = jnp.arange(max_len, dtype=jnp.float32)
        vals = interp_segment(xs, ys, n, x_eval, max_samples)
        seg_len = jnp.where(live, ei - si + 1, 0)
        return vals, seg_len

    live = jnp.arange(s) < n_segments
    vals, seg_lens = jax.vmap(one)(
        seg_starts, seg_ends, seg_sel_starts, seg_sel_ends, live)

    # Scatter each segment's [0, seg_len) into the global series at seg_start.
    local = jnp.arange(max_len)[None, :]
    global_idx = seg_starts[:, None] + local
    mask = (local < seg_lens[:, None]) & live[:, None]
    out = jnp.zeros((t_out,), jnp.float32)
    out = out.at[jnp.clip(global_idx, 0, t_out - 1)].add(
        jnp.where(mask, vals, 0.0))
    return out
