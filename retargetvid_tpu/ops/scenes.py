"""Shot-probability to scene-list conversion.

Reference semantics (``smartVidCrop.py:214-230`` plus the boundary fix at
``:459-464``): threshold transition probabilities, emit [start, end] spans of
below-threshold runs, fall back to one full-length scene when every frame is
a "transition", then stretch each scene's end to meet the next scene's start.

Scene lists are tiny (a handful of rows) and drive host-side segment layout,
so this runs in numpy; a jnp variant of the thresholding is trivial for
on-device use.
"""

from __future__ import annotations

import numpy as np

__all__ = ["predictions_to_scenes", "fix_scene_bounds", "scenes_to_selected"]


def predictions_to_scenes(predictions, threshold: float = 0.5) -> np.ndarray:
    """Scene [start, end] spans from per-frame transition probabilities."""
    preds = (np.asarray(predictions) > threshold).astype(np.uint8)
    scenes = []
    t, t_prev, start = -1, 0, 0
    for i, t in enumerate(preds):
        if t_prev == 1 and t == 0:
            start = i
        if t_prev == 0 and t == 1 and i != 0:
            scenes.append([start, i])
        t_prev = t
    if t == 0:
        scenes.append([start, i])
    if len(scenes) == 0:
        return np.array([[0, len(preds) - 1]], dtype=np.int32)
    return np.array(scenes, dtype=np.int32)


def fix_scene_bounds(segmentation, true_frame_count: int) -> np.ndarray:
    """Stretch scene ends so each scene's end abuts the next scene's start.

    Reference ``smartVidCrop.py:459-464``: the raw scene list leaves the
    transition frames unassigned; this makes segment i end at segment i+1's
    start minus one and pins the last end to the final frame.
    """
    seg = np.array(segmentation, dtype=np.int32, copy=True)
    for i in range(seg.shape[0] - 1):
        seg[i][1] = seg[i + 1][0] - 1
    seg[-1][1] = true_frame_count - 1
    return seg


def scenes_to_selected(segmentation, map2orig) -> np.ndarray:
    """Map a true-frame scene list into selected-frame indices.

    Reference ``smartVidCrop.py:470-474``: each boundary is replaced by the
    selected-frame index of that true frame (``inds_to_orig``).
    """
    seg = np.array(segmentation, dtype=np.int32, copy=True)
    map2orig = np.asarray(map2orig)
    for i in range(seg.shape[0]):
        for j in range(seg.shape[1]):
            seg[i][j] = map2orig[seg[i][j]]
    return seg
