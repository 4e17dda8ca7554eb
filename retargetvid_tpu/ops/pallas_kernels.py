"""Pallas TPU kernels.

The pipeline's hot math (convs/matmuls) already maps to the MXU through XLA,
and profiling showed the wins on this workload come from algorithm choice
(scan-based CCL, SOS filtfilt) rather than hand scheduling.  The kernels here
cover the remaining fusion points:

- :func:`saliency_postprocess`: exp(log-probs) -> per-frame max-normalize ->
  scale to uint8 (reference ``train.py:1267-1274``), fused in VMEM with one
  grid step per frame batch — saves one HBM round trip of the float maps
  between the model output and the geometry chain's uint8 input.

Each kernel has an XLA fallback (``use_pallas=False``) used on platforms
without Mosaic (the CPU test mesh runs the kernels in interpret mode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["saliency_postprocess"]


def _postprocess_kernel(logp_ref, out_ref):
    """One frame block: p = exp(x); out = floor(p / max(p) * 255).

    The uint8 QUANTIZATION happens here as a floor (uint8 casting of
    non-negative floats truncates); the dtype cast itself is outside the
    kernel — Mosaic has no float32->uint8 cast lowering on this backend.
    """
    p = jnp.exp(logp_ref[:].astype(jnp.float32))
    mx = jnp.max(p)
    scale = jnp.where(mx > 0, 255.0 / mx, 0.0)
    out_ref[:] = jnp.floor(p * scale)


def saliency_postprocess(logp, use_pallas: bool = True,
                         interpret: bool = False):
    """(T, H, W) log-probabilities -> (T, H, W) uint8 normalized maps."""
    logp = jnp.asarray(logp)
    t, h, w = logp.shape
    if not use_pallas:
        p = jnp.exp(logp.astype(jnp.float32))
        mx = jnp.max(p, axis=(1, 2), keepdims=True)
        return (jnp.where(mx > 0, p / mx, p) * 255.0).astype(jnp.uint8)

    from jax.experimental.pallas import tpu as pltpu

    quant = pl.pallas_call(
        _postprocess_kernel,
        grid=(t,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.ANY if interpret
                               else pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.ANY if interpret
                               else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, h, w), jnp.float32),
        interpret=interpret,
    )(logp)
    return quant.astype(jnp.uint8)
