"""Grayscale morphology via ``lax.reduce_window``.

TPU-native counterpart of the reference's ``cv2.morphologyEx(...MORPH_CLOSE...)``
with a 5x5 all-ones structuring element (``smartVidCrop.py:1127-1128``):
dilation = max-pool, erosion = min-pool, close = dilate then erode.  Border
semantics follow cv2's morphology default border: dilation pads with -inf
(borders never brighten), erosion pads with +inf (borders never darken).

Operates on float32/uint8 2D maps or batches (..., H, W); each op is a single
fused reduce_window over the whole clip.
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp

__all__ = ["dilate", "erode", "close"]


def _window_reduce(x, ksize, op, init):
    x = jnp.asarray(x)
    nd = x.ndim
    window = (1,) * (nd - 2) + (ksize, ksize)
    strides = (1,) * nd
    pad = [(0, 0)] * (nd - 2) + [(ksize // 2, ksize // 2)] * 2
    return lax.reduce_window(x, init, op, window, strides, pad)


def dilate(x, ksize: int = 5):
    orig_dtype = jnp.asarray(x).dtype
    xf = jnp.asarray(x).astype(jnp.float32)
    out = _window_reduce(xf, ksize, lax.max, -jnp.inf)
    return out.astype(orig_dtype)


def erode(x, ksize: int = 5):
    orig_dtype = jnp.asarray(x).dtype
    xf = jnp.asarray(x).astype(jnp.float32)
    out = _window_reduce(xf, ksize, lax.min, jnp.inf)
    return out.astype(orig_dtype)


def close(x, ksize: int = 5):
    """Morphological closing: dilate then erode (cv2.MORPH_CLOSE parity)."""
    return erode(dilate(x, ksize), ksize)
