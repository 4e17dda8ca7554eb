"""Fused clip program equals the separate saliency + geometry path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

#: Compile-heavy on CPU; excluded from the fast tier (pytest -m "not slow").
pytestmark = pytest.mark.slow



@pytest.mark.slow
def test_fused_matches_separate():
    from retargetvid_tpu.config import sc_init_crop_params
    from retargetvid_tpu.models.unisal import UNISAL
    from retargetvid_tpu.pipeline.fused import FusedClipProgram
    from retargetvid_tpu.pipeline.geometry import run_geometry
    from retargetvid_tpu.pipeline.saliency import SaliencyPredictor

    from conftest import TINY_UNISAL_CFG
    model = UNISAL(**TINY_UNISAL_CFG)
    x0 = jnp.zeros((1, 1, 224, 416, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(11), x0, static=True)

    rng = np.random.default_rng(2)
    # Same clip signature as the test_oneshot tests (fc=48 at 72x128,
    # fps=30, h_orig/w_orig = the frame dims): the FusedClipProgram is
    # then shared process-wide with the one-shot tests' 2-dispatch arm
    # (utils.cache.shared_program) instead of paying its own full cold
    # compile on the 1-core host.  Fused == separate is dim-independent.
    n_frames = 48
    h, w = 72, 128
    yy, xx = np.mgrid[0:h, 0:w]
    frames = np.zeros((n_frames, h, w, 3), np.uint8)
    for t in range(n_frames):
        cx = 20 + 2 * t
        blob = 220 * np.exp(-(((yy - 36) ** 2 + (xx - cx) ** 2) / 300.0))
        frames[t] = blob[..., None].astype(np.uint8)

    cp = sc_init_crop_params()
    selected = list(range(0, n_frames, 6)) + [n_frames - 1]
    true_inds = selected
    seg = np.array([[0, n_frames - 1]])
    seg_sel = np.array([[0, len(selected) - 1]])

    # Separate path.
    predictor = SaliencyPredictor(variables=variables, model=model,
                                  chunk=16, dtype=jnp.float32)
    smaps = predictor.predict(frames[np.array(selected)])
    ref = run_geometry(smaps, true_inds, seg, seg_sel, cp,
                       fps=30.0, h_orig=h, w_orig=w,
                       w_final=24, h_final=72, fc=n_frames)

    # Fused path.
    prog = FusedClipProgram(variables=variables, model=model,
                            dtype=jnp.float32)
    out = prog.run(jnp.asarray(frames), selected, true_inds, seg, seg_sel,
                   cp, fps=30.0, h_orig=h, w_orig=w,
                   w_final=24, h_final=72, fc=n_frames)

    # Identical math modulo uint8 quantization of the maps.
    diff = np.abs(out['boxes'] - ref['boxes'])
    assert diff.max() <= 1, diff.max()
    assert out['boxes'].shape == (n_frames, 4)
    assert np.isfinite(out['mean_sal'])
