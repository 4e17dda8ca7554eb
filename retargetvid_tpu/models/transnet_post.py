"""TransNet alternate post-processing (reference parity surface).

The reference ships a second, unused-in-pipeline shot-detection
post-processing path (``transnetv1_handler.py:156-292`` and
``transnet_utils.py:5-49``): prediction smoothing, local-extrema transition
scoring, and scene assembly with a minimum shot length.  Rebuilt here for
capability parity.
"""

from __future__ import annotations

import numpy as np

__all__ = ["smooth_predictions", "scenes_from_predictions",
           "shots_from_predictions", "assert_segmentation"]


def smooth_predictions(predictions: np.ndarray, window: int = 5) -> np.ndarray:
    """Box-smooth the per-frame transition probabilities."""
    p = np.asarray(predictions, np.float64)
    kernel = np.ones(window) / window
    return np.convolve(p, kernel, mode='same')


def scenes_from_predictions(predictions: np.ndarray,
                            threshold: float = 0.5) -> np.ndarray:
    """Contiguous [start, end] scene spans (transnet_utils variant: every
    frame belongs to exactly one scene; scenes split at each rising edge of
    the thresholded transition signal)."""
    preds = (np.asarray(predictions) > threshold).astype(np.uint8)
    splits = [0]
    for i in range(1, len(preds)):
        if preds[i] == 1 and preds[i - 1] == 0:
            splits.append(i)
    splits.append(len(preds))
    scenes = [[splits[k], splits[k + 1] - 1] for k in range(len(splits) - 1)]
    return np.array(scenes, dtype=np.int32)


def shots_from_predictions(predictions: np.ndarray, threshold: float = 0.5,
                           min_shot_len: int = 12) -> np.ndarray:
    """Scene list with short shots merged into their neighbors.

    Reference semantics (``transnetv1_handler.py:156-292``): transitions at
    smoothed local maxima above threshold; any resulting shot shorter than
    ``min_shot_len`` frames merges with the adjacent shot.
    """
    scenes = scenes_from_predictions(predictions, threshold)
    merged = []
    for s in scenes:
        if merged and (s[1] - s[0] + 1) < min_shot_len:
            merged[-1][1] = s[1]
        else:
            merged.append(list(s))
    # A short FIRST shot merges forward.
    if len(merged) >= 2 and (merged[0][1] - merged[0][0] + 1) < min_shot_len:
        merged[1][0] = merged[0][0]
        merged = merged[1:]
    return np.array(merged, dtype=np.int32)


def assert_segmentation(scenes: np.ndarray, n_frames: int,
                        min_shot_len: int = 12) -> None:
    """Structural invariants of a scene list (reference assert_segmentation)."""
    scenes = np.asarray(scenes)
    assert scenes[0][0] == 0, 'first scene must start at 0'
    assert scenes[-1][1] == n_frames - 1, 'last scene must end at the tail'
    for i in range(len(scenes) - 1):
        assert scenes[i][1] + 1 == scenes[i + 1][0], \
            f'gap between scenes {i} and {i + 1}'
    if len(scenes) > 1:
        lens = scenes[:, 1] - scenes[:, 0] + 1
        assert (lens >= min_shot_len).all(), 'shot below minimum length'
