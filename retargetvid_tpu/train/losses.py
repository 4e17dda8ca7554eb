"""Saliency training losses (reference ``unisal/utils.py:139-184``).

All losses take (B, T, H, W, 1) NHWC sequences:

- ``kld_loss(pred_log, target)``: KL(target || exp(pred_log)) summed over the
  map per (B, T), with 0*log(0) = 0;
- ``nss(pred, fixations)``: mean of the standardized prediction over fixation
  pixels (empty fixation maps score 1.0 like the reference);
- ``corr_coeff(pred, target)``: Pearson correlation per (B, T).

The composite training loss is ``1*kld - 0.1*nss - 0.1*cc``
(``unisal/train.py:104-105, 410-423``) with nss/cc applied to exp(pred).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import xlogy

__all__ = ["kld_loss", "nss", "corr_coeff", "loss_sequences"]


def _flat(x):
    return x.reshape(x.shape[0], x.shape[1], -1)


def kld_loss(pred_log, target):
    """KL divergence, map-summed per (B, T); pred is log-probabilities."""
    p = _flat(pred_log)
    t = _flat(target)
    return jnp.sum(xlogy(t, t) - t * p, axis=-1)


def nss(pred, fixations):
    """Normalized Scanpath Saliency per (B, T); pred in probability space."""
    p = _flat(pred)
    f = _flat(fixations) > 0.5
    mean = jnp.mean(p, axis=-1, keepdims=True)
    # torch .std() default: unbiased (ddof=1) — reference parity.
    std = jnp.std(p, axis=-1, keepdims=True, ddof=1)
    normed = (p - mean) / jnp.maximum(std, 1e-12)
    count = jnp.sum(f, axis=-1)
    val = jnp.sum(jnp.where(f, normed, 0.0), axis=-1) / jnp.maximum(count, 1)
    # Empty fixation maps score 1.0 (reference utils.py:147-150).
    return jnp.where(count > 0, val, 1.0)


def corr_coeff(pred, target):
    """Pearson correlation per (B, T); pred in probability space."""
    p = _flat(pred)
    t = _flat(target)
    pm = p - jnp.mean(p, axis=-1, keepdims=True)
    tm = t - jnp.mean(t, axis=-1, keepdims=True)
    num = jnp.mean(pm * tm, axis=-1)
    den = jnp.sqrt(jnp.mean(pm ** 2, axis=-1) * jnp.mean(tm ** 2, axis=-1))
    return num / jnp.maximum(den, 1e-12)


def loss_sequences(pred_log, sal, fix, metrics=('kld', 'nss', 'cc')):
    """Per-metric (B, T) losses (reference ``train.py:410-423``)."""
    out = []
    for m in metrics:
        if m == 'kld':
            out.append(kld_loss(pred_log, sal))
        elif m == 'nss':
            out.append(nss(jnp.exp(pred_log), fix))
        elif m == 'cc':
            out.append(corr_coeff(jnp.exp(pred_log), sal))
        else:
            raise ValueError(f'unknown metric {m!r}')
    return out
