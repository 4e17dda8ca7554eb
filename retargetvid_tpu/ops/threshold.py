"""Saliency thresholding (reference ``sc_threshold``, ``smartVidCrop.py:1050``)."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["threshold_saliency"]


def threshold_saliency(smaps, t_threshold):
    """Zero saliency below ``t_threshold``; keeps dtype.

    Elementwise over any shape — the whole clip thresholds in one fused VPU op
    instead of the reference's in-place numpy mutation.
    """
    smaps = jnp.asarray(smaps)
    return jnp.where(smaps < t_threshold, jnp.zeros_like(smaps), smaps)
