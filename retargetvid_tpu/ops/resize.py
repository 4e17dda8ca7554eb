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

__all__ = ["resize", "resize_matrix", "resize_by_factor",
           "factor_dst_size", "round_half_up"]


def round_half_up(x):
    """uint8 quantization with cv2/PIL semantics.

    cv2's fixed-point resize descales with ``(acc + (1 << 21)) >> 22`` and
    PIL adds ``0.5`` before the int cast — both are floor(x + 0.5), NOT
    numpy's round-half-to-even; the difference flips ~half of the exact-.5
    averages a power-of-two downscale produces (measured by
    tools/parity_ablation.py as ~1px center drift at resize_factor=4).
    """
    import jax.numpy as jnp
    return jnp.floor(x + 0.5)


def _linear_matrix(src: int, dst: int, scale=None) -> np.ndarray:
    """cv2 INTER_LINEAR: half-pixel centers, 2-tap, edge clamped.

    ``scale`` defaults to src/dst (cv2's dsize call form); pass it explicitly
    to reproduce the ``fx=``/``fy=`` call form, where cv2 maps coordinates
    with exactly 1/fx even though dst = round(src*fx) makes src/dst differ
    (e.g. 250 -> 62 at fx=0.25 samples with scale 4.0, not 250/62).
    """
    a = np.zeros((dst, src), dtype=np.float32)
    if src == 1:
        a[:, 0] = 1.0
        return a
    scale = src / dst if scale is None else float(scale)
    for d in range(dst):
        sx = (d + 0.5) * scale - 0.5
        x0 = int(np.floor(sx))
        frac = sx - x0
        x0c = min(max(x0, 0), src - 1)
        x1c = min(max(x0 + 1, 0), src - 1)
        a[d, x0c] += 1.0 - frac
        a[d, x1c] += frac
    return a


def _nearest_matrix(src: int, dst: int, scale=None) -> np.ndarray:
    """cv2 INTER_NEAREST: sx = floor(dx * scale)."""
    a = np.zeros((dst, src), dtype=np.float32)
    scale = src / dst if scale is None else float(scale)
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


def _cubic_matrix(src: int, dst: int, scale=None) -> np.ndarray:
    """cv2 INTER_CUBIC: half-pixel centers, 4-tap Keys kernel, edge clamped."""
    a = np.zeros((dst, src), dtype=np.float32)
    if src == 1:
        a[:, 0] = 1.0
        return a
    scale = src / dst if scale is None else float(scale)
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


def _lanczos_matrix(src: int, dst: int, scale=None) -> np.ndarray:
    """PIL LANCZOS (support 3): kernel stretched by the scale on downsize,
    weights normalized per output pixel — matches PIL's separable resample.
    """
    a = np.zeros((dst, src), dtype=np.float64)
    scale = src / dst if scale is None else float(scale)
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
def _resize_matrix_np(src: int, dst: int, method: str,
                      scale=None) -> np.ndarray:
    if method not in _BUILDERS:
        raise ValueError(f'unknown resize method {method!r}')
    return _BUILDERS[method](src, dst, scale)


def resize_matrix(src: int, dst: int, method: str = 'linear',
                  scale=None) -> jnp.ndarray:
    """The (dst, src) interpolation matrix for one axis.

    ``scale`` overrides the coordinate-mapping scale (cv2 ``fx=`` semantics);
    by default it is src/dst (cv2 ``dsize`` semantics).
    """
    return jnp.asarray(_resize_matrix_np(src, dst, method, scale))


def factor_dst_size(h: int, w: int, factor: float):
    """Output dims of ``cv2.resize(img, None, fx=1/factor, fy=1/factor)``:
    cvRound (round-half-to-even) of src/factor."""
    return (_cv_round(h / factor), _cv_round(w / factor))


def _cv_round(v: float) -> int:
    import decimal
    return int(decimal.Decimal(v).quantize(0, rounding=decimal.ROUND_HALF_EVEN))


def resize_by_factor(img, factor: float, method: str = 'linear',
                     channels_last=None):
    """The reference's ``cv2.resize(img, None, fx=1/factor, fy=1/factor)``:
    dst dims are cvRound(src/factor) but coordinates map with exactly
    ``factor`` (``smartVidCrop.py:1078-1084, 1186``), which differs from the
    dsize form whenever src/factor is fractional.
    """
    img = jnp.asarray(img)
    if channels_last is None:
        channels_last = img.ndim >= 3 and img.shape[-1] <= 4
    if channels_last:
        h_in, w_in = img.shape[-3], img.shape[-2]
    else:
        h_in, w_in = img.shape[-2], img.shape[-1]
    h_out, w_out = factor_dst_size(h_in, w_in, factor)
    a_h = resize_matrix(h_in, h_out, method, scale=factor)
    a_w = resize_matrix(w_in, w_out, method, scale=factor)
    x = img.astype(jnp.float32)
    if channels_last:
        x = jnp.einsum('Hh,...hwc->...Hwc', a_h, x)
        x = jnp.einsum('Ww,...hwc->...hWc', a_w, x)
    else:
        x = jnp.einsum('Hh,...hw->...Hw', a_h, x)
        x = jnp.einsum('Ww,...hw->...hW', a_w, x)
    return x


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
