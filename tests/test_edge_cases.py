"""Edge-case robustness: clips shorter than a shot window, very few frames,
ragged bucket boundaries."""

import numpy as np
import pytest

#: Compile-heavy on CPU; excluded from the fast tier (pytest -m "not slow").
pytestmark = pytest.mark.slow


def test_transnet_predictor_short_clips():
    """Clips shorter than the 100-frame window (and than the 50 stride)."""
    import jax
    import jax.numpy as jnp

    from retargetvid_tpu.models.transnet import (
        TransNetPredictor,
        TransNetV1,
        predict_video_windows,
    )

    model = TransNetV1(f=2, d=8)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8, 27, 48, 3), jnp.uint8))
    pred = TransNetPredictor(model, params)
    rng = np.random.default_rng(0)
    for n in (1, 7, 49, 50, 99):
        frames = rng.integers(0, 255, (n, 27, 48, 3)).astype(np.uint8)
        probs = pred(frames)
        assert probs.shape == (n,)
        eager = predict_video_windows(lambda b: model.apply(params, b),
                                      frames)
        np.testing.assert_allclose(probs, eager, rtol=1e-5, atol=1e-6)


def test_geometry_tiny_clip():
    """A handful of frames, single shot, still produces per-frame boxes."""
    from retargetvid_tpu.config import sc_init_crop_params
    from retargetvid_tpu.pipeline.geometry import run_geometry

    rng = np.random.default_rng(0)
    t_sel, h, w = 3, 36, 64
    smaps = np.zeros((t_sel, h, w), np.uint8)
    smaps[:, 12:24, 20:40] = 200
    cp = sc_init_crop_params()
    cp['out_ratio'] = '1:3'
    out = run_geometry(
        smaps, [0, 6, 11], [[0, 11]], [[0, 2]], cp,
        fps=30.0, h_orig=180, w_orig=320, w_final=60, h_final=180, fc=12)
    boxes = out['boxes']
    assert boxes.shape == (12, 4)
    assert ((boxes[:, 2] - boxes[:, 0]) == 60).all()
    assert (boxes[:, 0] >= 0).all() and (boxes[:, 2] <= 320).all()


def test_geometry_all_empty_maps():
    """All-empty saliency: centers invalid everywhere -> boxes still clamp
    in-frame (the reference would pad-gate such videos; the chain must not
    produce NaNs)."""
    from retargetvid_tpu.config import sc_init_crop_params
    from retargetvid_tpu.pipeline.geometry import run_geometry

    t_sel, h, w = 4, 36, 64
    smaps = np.zeros((t_sel, h, w), np.uint8)
    cp = sc_init_crop_params()
    cp['out_ratio'] = '1:3'
    out = run_geometry(
        smaps, [0, 6, 12, 17], [[0, 17]], [[0, 3]], cp,
        fps=30.0, h_orig=180, w_orig=320, w_final=60, h_final=180, fc=18)
    boxes = out['boxes']
    assert boxes.shape == (18, 4)
    assert np.isfinite(boxes).all()
    assert (boxes[:, 0] >= 0).all() and (boxes[:, 2] <= 320).all()


def test_fused_program_many_segments():
    """More shots than the smallest segment bucket exercises tier selection."""
    import jax.numpy as jnp

    from retargetvid_tpu.config import sc_init_crop_params
    from retargetvid_tpu.ops.boxes import calc_dest_size
    from retargetvid_tpu.pipeline.fused import FusedClipProgram
    from retargetvid_tpu.pipeline.geometry import seg_bucket_size

    rng = np.random.default_rng(0)
    n_frames, h, w = 72, 36, 64
    frames = rng.integers(0, 255, (n_frames, h, w, 3)).astype(np.uint8)
    # 6 shots of 12 frames -> segment bucket 8
    seg = [[i * 12, i * 12 + 11] for i in range(6)]
    assert seg_bucket_size(len(seg)) == 8
    selected = []
    seg_sel = []
    for s, e in seg:
        start_sel = len(selected)
        selected += [s, s + 6, e]
        seg_sel.append([start_sel, len(selected) - 1])
    cp = sc_init_crop_params()
    cp['out_ratio'] = '1:3'
    dest = calc_dest_size(w * 4, h * 4, '1:3')
    from conftest import TINY_UNISAL_CFG
    from retargetvid_tpu.models.unisal import UNISAL
    import jax
    un_model = UNISAL(**TINY_UNISAL_CFG)
    un_vars = un_model.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 1, 224, 416, 3), jnp.float32),
                            static=True)
    prog = FusedClipProgram(variables=un_vars, model=un_model,
                            dtype=jnp.float32)
    out = prog.run(jnp.asarray(frames), selected, selected, seg, seg_sel,
                   cp, fps=30.0, h_orig=h * 4, w_orig=w * 4,
                   w_final=dest['w_final'], h_final=dest['h_final'],
                   fc=n_frames)
    assert out['boxes'].shape == (n_frames, 4)
    assert np.isfinite(out['boxes']).all()
