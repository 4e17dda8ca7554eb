"""Pallas kernels vs their XLA fallbacks (interpret mode on the CPU mesh)."""

import pytest
import numpy as np

import jax.numpy as jnp

from retargetvid_tpu.ops.pallas_kernels import saliency_postprocess

#: Compile-heavy on CPU; excluded from the fast tier (pytest -m "not slow").
pytestmark = pytest.mark.slow



def test_postprocess_matches_fallback():
    rng = np.random.default_rng(0)
    logits = rng.normal(-8, 2, (5, 32, 128)).astype(np.float32)
    ref = np.asarray(saliency_postprocess(jnp.asarray(logits),
                                          use_pallas=False))
    out = np.asarray(saliency_postprocess(jnp.asarray(logits),
                                          use_pallas=True, interpret=True))
    assert out.shape == ref.shape
    assert out.dtype == np.uint8
    # rounding of the scale path may differ by 1 LSB
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_postprocess_empty_frame():
    logits = np.full((1, 32, 128), -np.inf, np.float32)  # exp -> all zeros
    out = np.asarray(saliency_postprocess(jnp.asarray(logits),
                                          use_pallas=True, interpret=True))
    assert (out == 0).all()
