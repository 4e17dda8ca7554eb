"""Destination-size calculation and crop-box computation.

Vectorized equivalents of reference ``sc_calc_dest_size``
(``smartVidCrop.py:946-977``), ``sc_compute_bb`` (``:979-1048``) and
``sc_shift_time`` (``:1740-1746``).  The per-frame clamping loop becomes one
fused elementwise pass over the whole center series.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

__all__ = ["calc_dest_size", "compute_crop_boxes", "shift_time", "iou_inclusive"]


def calc_dest_size(w_orig: int, h_orig: int, out_ratio: str) -> dict:
    """Final crop-window dims and conversion mode.

    Mode 0: ratios equal (no conversion); mode 1: preserve height; mode 2:
    preserve width (when the height-preserving window would exceed the frame).
    """
    c = out_ratio.split(':')
    target_w_units = float(c[0])
    target_h_units = float(c[1])
    orig_ratio = float(w_orig) / float(h_orig)
    target_ratio = target_w_units / target_h_units

    if abs(orig_ratio - target_ratio) < 1e-7:
        return {'w_final': w_orig, 'h_final': h_orig, 'conversion_mode': 0}

    w_final = int(math.floor((target_w_units / target_h_units) * h_orig))
    h_final = h_orig
    mode = 1
    if w_final > w_orig or h_final > h_orig:
        w_final = w_orig
        h_final = int(math.floor((target_h_units / target_w_units) * w_orig))
        mode = 2
    return {'w_final': w_final, 'h_final': h_final, 'conversion_mode': mode}


def compute_crop_boxes(dxs, dys, *,
                       w_orig: int, h_orig: int,
                       w_process: int, h_process: int,
                       w_final: int, h_final: int,
                       border_t=0, border_b=0, border_l=0, border_r=0):
    """Per-frame [x1, y1, x2, y2] crop boxes from smoothed centers.

    ``dxs``/``dys`` are the smoothed center series in process resolution
    (one entry per true frame).  Steps (reference parity):

    1. scale centers to original resolution with int truncation,
    2. shrink the final window by detected borders (preserving aspect),
    3. split the window around the center with floor/remainder halves,
    4. clamp inside the frame minus borders.

    Returns int32 (T, 4) plus the final window dims (fbb_w, fbb_h).
    """
    dxs = jnp.asarray(dxs, jnp.float32)
    dys = jnp.asarray(dys, jnp.float32)
    scale_h = float(h_process) / float(h_orig)
    scale_w = float(w_process) / float(w_orig)

    final_xs = jnp.floor(dxs / scale_w).astype(jnp.int32)
    final_ys = jnp.floor(dys / scale_h).astype(jnp.int32)

    bt = jnp.asarray(border_t, jnp.int32)
    bb = jnp.asarray(border_b, jnp.int32)
    bl = jnp.asarray(border_l, jnp.int32)
    br = jnp.asarray(border_r, jnp.int32)

    # ``w_final``/``h_final`` may be Python ints OR traced scalars: they are
    # jit ARGUMENTS in every pipeline program since round 5, so one compiled
    # program serves both benchmark ratios (the only consumer of the target
    # dims is this scalar math).  The reference's two ``if`` branches
    # (``sc_compute_bb``) become predicated selects; with static ints XLA
    # folds them back to constants.
    wf = jnp.asarray(w_final, jnp.int32)
    hf = jnp.asarray(h_final, jnp.int32)
    wf_f = wf.astype(jnp.float32)
    hf_f = hf.astype(jnp.float32)
    cond_h = hf == h_orig
    fbb_h_v = (hf - bt - bb).astype(jnp.int32)
    fbb_w_v = (fbb_h_v.astype(jnp.float32) / hf_f * wf_f).astype(jnp.int32)
    cond_w = wf == w_orig
    fbb_w_h = (wf - bl - br).astype(jnp.int32)
    fbb_h_h = (fbb_w_h.astype(jnp.float32) / wf_f * hf_f).astype(jnp.int32)
    # Reference order: the height branch applies first, the width branch
    # overrides it (both recompute from the raw finals).
    fbb_w = jnp.where(cond_w, fbb_w_h, jnp.where(cond_h, fbb_w_v, wf))
    fbb_h = jnp.where(cond_w, fbb_h_h, jnp.where(cond_h, fbb_h_v, hf))

    hbbw1 = (fbb_w / 2.0).astype(jnp.int32)
    hbbw2 = fbb_w - hbbw1
    hbbh1 = (fbb_h / 2.0).astype(jnp.int32)
    hbbh2 = fbb_h - hbbh1

    x1 = final_xs - hbbw1
    y1 = final_ys - hbbh1
    x2 = final_xs + hbbw2
    y2 = final_ys + hbbh2

    # Clamp left/top first, then right/bottom (reference order matters when
    # the window is wider than the usable area).
    x2 = jnp.where(x1 < bl, bl + fbb_w, x2)
    x1 = jnp.where(x1 < bl, bl, x1)
    over_r = x2 > (w_orig - br)
    x1 = jnp.where(over_r, w_orig - br - fbb_w, x1)
    x2 = jnp.where(over_r, w_orig - br, x2)

    y2 = jnp.where(y1 < bt, bt + fbb_h, y2)
    y1 = jnp.where(y1 < bt, bt, y1)
    over_b = y2 > (h_orig - bb)
    y1 = jnp.where(over_b, h_orig - bb - fbb_h, y1)
    y2 = jnp.where(over_b, h_orig - bb, y2)

    boxes = jnp.stack([x1, y1, x2, y2], axis=1).astype(jnp.int32)
    return boxes, fbb_w, fbb_h


def shift_time(boxes, shift: int):
    """Shift crop boxes ``shift`` frames earlier (reference ``sc_shift_time``).

    Frames [shift:] move to [0:T-shift]; the tail repeats the last box.
    """
    if shift <= 0:
        return boxes
    boxes = jnp.asarray(boxes)
    t = boxes.shape[0]
    shifted = jnp.roll(boxes, -shift, axis=0)
    idx = jnp.arange(t)
    return jnp.where((idx >= t - shift)[:, None], boxes[-1], shifted)


def iou_inclusive(box_a, box_b):
    """Inclusive (+1) IoU, jnp, broadcasting over leading dims."""
    a = jnp.asarray(box_a, jnp.float32)
    b = jnp.asarray(box_b, jnp.float32)
    xa = jnp.maximum(a[..., 0], b[..., 0])
    ya = jnp.maximum(a[..., 1], b[..., 1])
    xb = jnp.minimum(a[..., 2], b[..., 2])
    yb = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.maximum(0.0, xb - xa + 1) * jnp.maximum(0.0, yb - ya + 1)
    area_a = (a[..., 2] - a[..., 0] + 1) * (a[..., 3] - a[..., 1] + 1)
    area_b = (b[..., 2] - b[..., 0] + 1) * (b[..., 3] - b[..., 1] + 1)
    return inter / (area_a + area_b - inter)
