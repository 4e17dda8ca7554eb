"""Temporal center-series repairs: empty-center filling and focus freezing.

Vectorized equivalents of reference ``sc_handle_empty_centers``
(``smartVidCrop.py:1221-1300``) and the focus-stability center freezing
(``:2449-2473``).  The reference walks runs of ``None`` centers in Python;
here runs are described in closed form with cumulative scans so the repair is
one fused pass over the (padded) selected-frame axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["fill_empty_centers", "freeze_unstable_segments"]


def fill_empty_centers(dx, dy, valid, seg_starts, seg_ends, frame_mask=None):
    """Fill invalid centers from a temporally-adjacent valid center.

    Reference rule per run of consecutive invalid frames: if the run start is
    closer to some segment start than the run end is to some segment end,
    fill the whole run with the next valid center, else with the previous.

    Args:
      dx, dy: (T,) float center series (padded; garbage where invalid).
      valid: (T,) bool.
      seg_starts, seg_ends: (S,) int32 selected-frame segment bounds, padded
        with a sentinel of -10**6 outside real segments (distance to a
        sentinel is huge, so padding never wins the min).
      frame_mask: optional (T,) bool marking real (non-padded) frames.

    Returns filled (dx, dy).  If every frame is invalid, returns the input.
    """
    dx = jnp.asarray(dx, jnp.float32)
    dy = jnp.asarray(dy, jnp.float32)
    valid = jnp.asarray(valid, bool)
    t = dx.shape[0]
    if frame_mask is None:
        frame_mask = jnp.ones((t,), bool)
    valid = valid & frame_mask
    idx = jnp.arange(t, dtype=jnp.int32)

    # Index of the previous / next valid frame for every position.
    prev_valid = jax.lax.associative_scan(
        jnp.maximum, jnp.where(valid, idx, -1))
    next_valid = t - 1 - jax.lax.associative_scan(
        jnp.maximum, jnp.where(valid, t - 1 - idx, -1)[::-1])[::-1]
    has_prev = prev_valid >= 0
    has_next = jax.lax.associative_scan(
        jnp.maximum, jnp.where(valid, idx, -1)[::-1])[::-1] >= 0
    next_valid = jnp.where(has_next, next_valid, 0)
    prev_valid_c = jnp.where(has_prev, prev_valid, 0)

    # Run bounds of the invalid run containing each invalid index.
    run_start = prev_valid + 1            # first invalid index of the run
    run_end = next_valid - 1              # last invalid index of the run
    run_end = jnp.where(has_next, run_end, t - 1)

    # Distance of the run start to the nearest segment start, and of the run
    # end to the nearest segment end (full small pairwise table).
    d_start = jnp.min(jnp.abs(run_start[:, None] - seg_starts[None, :]), axis=1)
    d_end = jnp.min(jnp.abs(run_end[:, None] - seg_ends[None, :]), axis=1)

    use_next = (d_start < d_end) & has_next
    use_next = jnp.where(has_prev, use_next, has_next)
    src = jnp.where(use_next, next_valid, prev_valid_c)

    fill_x = dx[src]
    fill_y = dy[src]
    any_valid = jnp.any(valid)
    out_x = jnp.where(valid, dx, jnp.where(any_valid, fill_x, dx))
    out_y = jnp.where(valid, dy, jnp.where(any_valid, fill_y, dy))
    return out_x, out_y


def freeze_unstable_segments(dx, dy, jump_inds, n_jumps, *,
                             fc_sel, skip: int, fps: float,
                             stab_secs: float, max_pairs: int | None = None):
    """Freeze centers of short focus segments to the segment-start center.

    Reference ``smartVidCrop.py:2453-2472``: for each consecutive pair of
    detected focus jumps (i, i+1) the span [jump_i - 1, jump_{i+1} + 1) is
    frozen to its first center when its duration (in true-video seconds,
    ``span * skip / fps``) is at most ``stab_secs``.  Pairs are applied in
    order, so later spans may copy already-frozen values — reproduced with a
    sequential ``fori_loop`` of masked vector updates.

    Args:
      jump_inds: (K,) int32 padded array of ascending jump indices.
      n_jumps: actual number of valid entries in ``jump_inds``.
      fc_sel: number of real selected frames (traced or static).
    """
    dx = jnp.asarray(dx, jnp.float32)
    dy = jnp.asarray(dy, jnp.float32)
    jump_inds = jnp.asarray(jump_inds, jnp.int32)
    k = jump_inds.shape[0] if max_pairs is None else max_pairs
    t = dx.shape[0]
    idx = jnp.arange(t, dtype=jnp.int32)

    def body(i, carry):
        cx, cy = carry
        active = i + 1 < n_jumps
        start = jnp.maximum(jump_inds[i] - 1, 0)
        end = jnp.minimum(jump_inds[i + 1] + 1, fc_sel - 1)
        dur = (end - start).astype(jnp.float32) * skip / fps
        do = active & (dur <= stab_secs)
        mask = do & (idx >= start) & (idx < end)
        cx = jnp.where(mask, cx[start], cx)
        cy = jnp.where(mask, cy[start], cy)
        return cx, cy

    dx, dy = jax.lax.fori_loop(0, k - 1, body, (dx, dy))
    return dx, dy
