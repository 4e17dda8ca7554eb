"""Process-wide shared trace cache (`utils.cache.shared_program`).

Equal-config program objects must hand back the IDENTICAL traced/jitted
program (each duplicate trace costs seconds on the 1-core host and the
suite builds dozens of equal programs); different configs must not share.
Because the shared programs take parameters as jit ARGUMENTS, sharing must
never pin one instance's weights into another's outputs — the value test
guards exactly that.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_transnet():
    from retargetvid_tpu.models.transnet import TransNetV1

    model = TransNetV1(f=2, l=1, s=1, d=8)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8, 27, 48, 3), jnp.uint8))
    return model, params


def test_transnet_predictor_shares_equal_configs():
    from retargetvid_tpu.models.transnet import TransNetPredictor

    model, params = _tiny_transnet()
    p1 = TransNetPredictor(model, params)
    p2 = TransNetPredictor(model, jax.tree_util.tree_map(lambda v: v + 1.0,
                                                         params))
    assert p1._compiled(64) is p2._compiled(64)
    # Different plan -> different program.
    p3 = TransNetPredictor(model, params, fullseq=True)
    assert p3._compiled(64) is not p1._compiled(64)
    # Different model config -> different program.
    model2, params2 = _tiny_transnet()
    from retargetvid_tpu.models.transnet import TransNetV1
    model2 = TransNetV1(f=2, l=1, s=1, d=16)
    params2 = model2.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 8, 27, 48, 3), jnp.uint8))
    p4 = TransNetPredictor(model2, params2)
    assert p4._compiled(64) is not p1._compiled(64)


def test_saliency_predictor_shares_and_does_not_pin_weights():
    from conftest import TINY_UNISAL_CFG
    from retargetvid_tpu.models.unisal import UNISAL
    from retargetvid_tpu.pipeline.saliency import SaliencyPredictor

    model = UNISAL(**TINY_UNISAL_CFG)
    a = SaliencyPredictor(model=model, rng_seed=0, chunk=4)
    b = SaliencyPredictor(model=model, rng_seed=1, chunk=4)
    h, w = 48, 80
    from retargetvid_tpu.pipeline.saliency import get_optimal_out_size
    net_hw = get_optimal_out_size((h, w))
    assert a._compiled(4, (h, w), net_hw) is b._compiled(4, (h, w), net_hw)

    # The shared program must follow each instance's weights: different
    # rng seeds -> different maps through the SAME compiled program.
    frames = np.random.default_rng(3).integers(
        0, 255, (4, h, w, 3)).astype(np.uint8)
    ma = a.predict(frames)
    mb = b.predict(frames)
    assert ma.shape == (4, h, w) and mb.shape == (4, h, w)
    assert not np.array_equal(ma, mb)


@pytest.mark.slow
def test_oneshot_program_shares_equal_configs():
    from conftest import TINY_UNISAL_CFG
    from retargetvid_tpu.config import sc_init_crop_params
    from retargetvid_tpu.models.unisal import UNISAL
    from retargetvid_tpu.pipeline.geometry import GeometryConfig
    from retargetvid_tpu.pipeline.oneshot import OneShotClipProgram

    tn_model, tn_params = _tiny_transnet()
    un = UNISAL(**TINY_UNISAL_CFG)
    un_vars = un.init(jax.random.PRNGKey(1),
                      jnp.zeros((1, 1, 224, 416, 3), jnp.float32),
                      static=True)
    cp = sc_init_crop_params()
    cfg = GeometryConfig.from_crop_params(cp)

    mk = lambda **kw: OneShotClipProgram(
        tn_model, tn_params, variables=un_vars, model=un,
        dtype=jnp.float32, s_pad=4, **kw)
    # w_final/h_final are traced args since round 5, not compile keys.
    args = (24, (48, 80), (48, 80), cfg, 6.0, int(cp['skip']))
    assert mk()._compiled(*args) is mk()._compiled(*args)
    assert mk(tn_fullseq=True)._compiled(*args) is not mk()._compiled(*args)
