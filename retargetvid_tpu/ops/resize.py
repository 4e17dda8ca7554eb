"""Image resizing as matrix multiplication.

All resamplers used by the reference pipeline — cv2 ``INTER_LINEAR`` /
``INTER_CUBIC`` / ``INTER_NEAREST`` (``smartVidCrop.py:1078-1084``) and PIL
``LANCZOS`` (``unisal/data.py:1284-1285``) — are separable.  On TPU the
natural formulation is two dense matmuls that run on the MXU:

    out[H', W'] = A_h[H', H] @ img[H, W] @ A_w[W, W']

The interpolation matrices are built once on the host (static shapes), cached
per ``(src, dst, method)``, and closed over as jit constants.  This replaces
both the per-frame cv2 resizes of the clustering filter and the PIL LANCZOS
preprocessing resize of the saliency model with fused MXU work.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = ["resize", "resize_matrix"]


def _linear_matrix(src: int, dst: int) -> np.ndarray:
    """cv2 INTER_LINEAR: half-pixel centers, 2-tap, edge clamped."""
    a = np.zeros((dst, src), dtype=np.float32)
    if src == 1:
        a[:, 0] = 1.0
        return a
    scale = src / dst
    for d in range(dst):
        sx = (d + 0.5) * scale - 0.5
        x0 = int(np.floor(sx))
        frac = sx - x0
        x0c = min(max(x0, 0), src - 1)
        x1c = min(max(x0 + 1, 0), src - 1)
        a[d, x0c] += 1.0 - frac
        a[d, x1c] += frac
    return a


def _nearest_matrix(src: int, dst: int) -> np.ndarray:
    """cv2 INTER_NEAREST: sx = floor(dx * scale)."""
    a = np.zeros((dst, src), dtype=np.float32)
    scale = src / dst
    idx = np.minimum(np.floor(np.arange(dst) * scale).astype(np.int64), src - 1)
    a[np.arange(dst), idx] = 1.0
    return a


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic kernel with cv2's a=-0.75."""
    x = np.abs(x)
    out = np.where(
        x <= 1, (a + 2) * x**3 - (a + 3) * x**2 + 1,
        np.where(x < 2, a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a, 0.0))
    return out


def _cubic_matrix(src: int, dst: int) -> np.ndarray:
    """cv2 INTER_CUBIC: half-pixel centers, 4-tap Keys kernel, edge clamped."""
    a = np.zeros((dst, src), dtype=np.float32)
    if src == 1:
        a[:, 0] = 1.0
        return a
    scale = src / dst
    for d in range(dst):
        sx = (d + 0.5) * scale - 0.5
        x0 = int(np.floor(sx))
        for t in range(-1, 3):
            w = _cubic_kernel(np.array(sx - (x0 + t)))
            xc = min(max(x0 + t, 0), src - 1)
            a[d, xc] += float(w)
    return a


def _lanczos_kernel(x: np.ndarray, support: float = 3.0) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    out = np.sinc(x) * np.sinc(x / support)
    return np.where(np.abs(x) < support, out, 0.0)


def _lanczos_matrix(src: int, dst: int) -> np.ndarray:
    """PIL LANCZOS (support 3): kernel stretched by the scale on downsize,
    weights normalized per output pixel — matches PIL's separable resample.
    """
    a = np.zeros((dst, src), dtype=np.float64)
    scale = src / dst
    filterscale = max(scale, 1.0)
    support = 3.0 * filterscale
    for d in range(dst):
        center = (d + 0.5) * scale
        lo = max(int(center - support + 0.5), 0)
        hi = min(int(center + support + 0.5), src)
        xs = np.arange(lo, hi)
        w = _lanczos_kernel((xs + 0.5 - center) / filterscale)
        s = w.sum()
        if s != 0:
            w = w / s
        a[d, lo:hi] = w
    return a.astype(np.float32)


_BUILDERS = {
    'linear': _linear_matrix,
    'nearest': _nearest_matrix,
    'cubic': _cubic_matrix,
    'lanczos': _lanczos_matrix,
}

#: Map from the reference's ``resize_type`` config ints to method names
#: (``smartVidCrop.py:141-143``).
RESIZE_TYPE_TO_METHOD = {1: 'linear', 2: 'cubic', 3: 'nearest'}


@functools.lru_cache(maxsize=256)
def _resize_matrix_np(src: int, dst: int, method: str) -> np.ndarray:
    if method not in _BUILDERS:
        raise ValueError(f'unknown resize method {method!r}')
    return _BUILDERS[method](src, dst)


def resize_matrix(src: int, dst: int, method: str = 'linear') -> jnp.ndarray:
    """The (dst, src) interpolation matrix for one axis."""
    return jnp.asarray(_resize_matrix_np(src, dst, method))


def resize(img, out_hw, method: str = 'linear',
           channels_last: bool | None = None):
    """Separable resize of the trailing-or-HW axes via two matmuls.

    ``img`` may be (H, W), (..., H, W) or (..., H, W, C).  Pass
    ``channels_last`` explicitly for feature maps; when None, a trailing axis
    of size <= 4 on a >=3D array is treated as channels.
    """
    img = jnp.asarray(img)
    h_out, w_out = int(out_hw[0]), int(out_hw[1])
    if channels_last is None:
        channels_last = img.ndim >= 3 and img.shape[-1] <= 4
    if channels_last:
        h_in, w_in = img.shape[-3], img.shape[-2]
    else:
        h_in, w_in = img.shape[-2], img.shape[-1]

    a_h = resize_matrix(h_in, h_out, method)
    a_w = resize_matrix(w_in, w_out, method)
    x = img.astype(jnp.float32)
    if channels_last:
        # (..., H, W, C): contract H then W.
        x = jnp.einsum('Hh,...hwc->...Hwc', a_h, x)
        x = jnp.einsum('Ww,...hwc->...hWc', a_w, x)
    else:
        x = jnp.einsum('Hh,...hw->...Hw', a_h, x)
        x = jnp.einsum('Ww,...hw->...hW', a_w, x)
    return x
