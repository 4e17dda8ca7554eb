"""Sequence post-processing utilities.

``smooth_sequence``: the reference's temporal median smoother for predicted
saliency sequences (``unisal/utils.py:201-217``), vectorized — the per-index
Python loop becomes a strided median over a padded window stack.
"""

from __future__ import annotations

import numpy as np

__all__ = ["smooth_sequence"]


def smooth_sequence(seq: np.ndarray, method: str) -> np.ndarray:
    """Median-smooth a (1, T, 1, H, W)- or (T, ...)-shaped sequence.

    ``method``: ``'med<k>'`` with window k (e.g. ``'med41'``).
    """
    if not method.startswith('med'):
        raise NotImplementedError(method)
    k = int(method[3:])
    ks2 = k // 2
    shape = seq.shape
    if seq.ndim == 5:
        flat = seq.reshape(shape[1], -1)
    else:
        flat = seq.reshape(shape[0], -1)
    t = flat.shape[0]
    out = np.empty_like(flat)
    for i in range(t):
        lo = max(0, i - ks2)
        hi = min(t, i + ks2 + 1)
        out[i] = np.median(flat[lo:hi], axis=0)
    return out.reshape(shape)
