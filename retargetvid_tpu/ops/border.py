"""Border detection, mean-saliency and coverage gates.

Vectorized equivalents of reference ``sc_border_detection``
(``smartVidCrop.py:842-924``), ``sc_compute_mean_sal`` (``:1304-1308``) and
``sc_compute_cvrg_score`` (``:1310-1331``).  The reference's per-pixel Python
scan for leading/trailing low-saliency rows becomes an argmax over a boolean
projection; the coverage sliding window becomes a cumulative-sum difference.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["border_detection", "mean_saliency", "coverage_score"]


def _leading_below(profile, t_border):
    """Count of leading entries <= t_border (stops at first above)."""
    above = profile > t_border
    any_above = jnp.any(above)
    first = jnp.argmax(above)
    return jnp.where(any_above, first, profile.shape[0])


def border_detection(smaps, t_border: int,
                     h_orig: int, w_orig: int):
    """Detect constant low-saliency borders.

    ``smaps``: (T, H, W) saliency volume in process resolution.
    Returns dict with integer borders ``t/b/l/r`` scaled to original dims,
    each capped at 45% of its dimension — reference parity.  With
    ``t_border == -1`` (both presets) returns zeros.
    """
    if t_border == -1:
        z = jnp.int32(0)
        return {'border_t': z, 'border_b': z, 'border_l': z, 'border_r': z}

    smaps = jnp.asarray(smaps)
    t_dim, h, w = smaps.shape
    sal_max = jnp.max(smaps, axis=0)            # (H, W) max over time
    f_col = jnp.max(sal_max, axis=1)            # per-row max -> top/bottom
    f_row = jnp.max(sal_max, axis=0)            # per-col max -> left/right

    top = _leading_below(f_col, t_border)
    bot = _leading_below(f_col[::-1], t_border)
    left = _leading_below(f_row, t_border)
    right = _leading_below(f_row[::-1], t_border)

    cap_h = int(h * 0.45)
    cap_w = int(w * 0.45)
    top = jnp.minimum(top, cap_h)
    bot = jnp.minimum(bot, cap_h)
    left = jnp.minimum(left, cap_w)
    right = jnp.minimum(right, cap_w)

    # Scale back to original dims with the reference's int() truncation.
    return {
        'border_t': ((h_orig / h) * top).astype(jnp.int32),
        'border_b': ((h_orig / h) * bot).astype(jnp.int32),
        'border_l': ((w_orig / w) * left).astype(jnp.int32),
        'border_r': ((w_orig / w) * right).astype(jnp.int32),
    }


def mean_saliency(smaps):
    """Global and per-frame mean saliency (pad gate #1).

    Reference ``sc_compute_mean_sal``: frames axis last there, first here.
    Returns (scalar mean, (T,) per-frame means).
    """
    smaps = jnp.asarray(smaps).astype(jnp.float32)
    return jnp.mean(smaps), jnp.mean(smaps, axis=(1, 2))


def coverage_score(smaps, conversion_mode: int, window: int | None = None):
    """Best sliding-window coverage of the 1-D saliency projection.

    Reference ``sc_compute_cvrg_score`` projects each map onto the axis being
    cropped and finds the window of length ``dim_process`` with the largest
    fraction of total saliency.  NOTE (reference quirk, preserved): the
    reference slides a window of the FULL projection length, so the loop body
    never runs and the score is 0.0 for every frame; pass ``window`` to get
    the (presumably intended) behavior with the crop-window length.
    """
    smaps = jnp.asarray(smaps).astype(jnp.float32)
    t, h, w = smaps.shape
    if conversion_mode == 1:
        flat = jnp.sum(smaps, axis=1)            # (T, W) column sums
        dim = w
    else:
        flat = jnp.sum(smaps, axis=2)            # (T, H) row sums
        dim = h
    win = dim if window is None else int(window)
    n = flat.shape[1]
    if n - win <= 0:
        return jnp.float32(0.0), jnp.zeros((t,), jnp.float32)

    csum = jnp.concatenate(
        [jnp.zeros((t, 1), jnp.float32), jnp.cumsum(flat, axis=1)], axis=1)
    # Window sums at offsets 0..n-win-1 (reference range excludes the last).
    offsets = jnp.arange(n - win)
    wsum = csum[:, offsets + win] - csum[:, offsets]
    total = jnp.sum(flat, axis=1, keepdims=True)
    cvrg = jnp.where(total > 0, wsum / total, 0.0)
    per_frame = jnp.max(cvrg, axis=1)
    return jnp.mean(per_frame), per_frame
