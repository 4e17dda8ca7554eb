"""Focus-jump saliency scoring (focus stability, ISM-2021 update #2).

Vectorized equivalent of reference ``get_points_on_line`` +
``sc_check_for_extra_cuts`` (``smartVidCrop.py:1337-1455``): for every pair of
consecutive focus centers, sample the saliency map along the connecting line
(the reference's Bresenham variant: unit steps along the major axis, minor
axis by truncated slope) and average.  A low mean (< ``foces_stab_t``) means
the focus jumped across a non-salient region — a focus change.

The per-frame Python loop and per-point accumulation become one
``vmap`` over frames with a static maximum point count and masking, so all
T line scores evaluate in a single fused gather+reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["jump_saliency_scores"]


def _line_score(smap, p1x, p1y, p2x, p2y, min_d, max_pts):
    """Mean saliency under the line p1 -> p2 (reference semantics)."""
    h, w = smap.shape
    dx = p2x - p1x
    dy = p2y - p1y
    dxa = jnp.abs(dx)
    dya = jnp.abs(dy)

    small = (dxa < min_d) & (dya < min_d)
    n_pts = jnp.ceil(jnp.maximum(dxa, dya)).astype(jnp.int32)

    k = jnp.arange(max_pts, dtype=jnp.float32)
    steep = dya > dxa

    # Major-axis positions: p +- (k+1), keeping the center's fractional part.
    step_y = jnp.where(dy < 0, -1.0, 1.0)
    step_x = jnp.where(dx < 0, -1.0, 1.0)
    ys_major = p1y + step_y * (k + 1)
    xs_major = p1x + step_x * (k + 1)

    # Minor-axis positions via truncated slope (reference .astype(np.int)).
    slope_x = jnp.where(dy != 0, dx / dy, 0.0)
    slope_y = jnp.where(dx != 0, dy / dx, 0.0)
    xs_steep = jnp.trunc(slope_x * (ys_major - p1y)) + p1x
    ys_flat = jnp.trunc(slope_y * (xs_major - p1x)) + p1y

    xs = jnp.where(steep, xs_steep, xs_major)
    ys = jnp.where(steep, ys_major, ys_flat)

    in_line = k < n_pts.astype(jnp.float32)
    in_img = (xs >= 0) & (ys >= 0) & (xs < w) & (ys < h)
    valid = in_line & in_img

    ii = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    jj = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    vals = smap[jj, ii]

    count = jnp.sum(valid)
    total = jnp.sum(jnp.where(valid, vals, 0.0))
    mean = jnp.where(count > 0, total / count, 255.0)
    return jnp.where(small, 255.0, mean)


def jump_saliency_scores(smaps, cx, cy, *, min_d_jump: float,
                         max_pts: int | None = None):
    """Line scores between consecutive centers for a (T, H, W) volume.

    Returns (T,) float32: entry 0 is 255 (no previous center, reference
    initializes jumps to 255); entry t scores the move from center t-1 to
    center t over frame t's map.
    """
    smaps = jnp.asarray(smaps).astype(jnp.float32)
    t, h, w = smaps.shape
    if max_pts is None:
        max_pts = max(h, w)

    score = jax.vmap(
        lambda m, ax, ay, bx, by: _line_score(
            m, ax, ay, bx, by, float(min_d_jump), max_pts))(
        smaps[1:], cx[:-1], cy[:-1], cx[1:], cy[1:])
    return jnp.concatenate([jnp.full((1,), 255.0, jnp.float32), score])
