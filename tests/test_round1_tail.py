"""Round-1 tail: pkl renderer mode, score_model, conversion script import."""

import pickle

import numpy as np
import pytest

#: Compile-heavy on CPU; excluded from the fast tier (pytest -m "not slow").
pytestmark = pytest.mark.slow



def test_render_cropped_pickle(tmp_path):
    from retargetvid_tpu.pipeline.render import render_cropped_pickle
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (8, 90, 160, 3)).astype(np.uint8)
    pkl = tmp_path / 'clip.pkl'
    with open(pkl, 'wb') as fp:
        pickle.dump({'fr': 25.0, 'frame_count': 8, 'w': 160, 'h': 90,
                     'frames': frames, 'trans_inds': []}, fp)
    boxes = np.tile([10, 0, 40, 90], (8, 1))
    out_path = render_cropped_pickle(pkl, boxes)
    assert out_path.endswith('_sc.pkl')
    with open(out_path, 'rb') as fp:
        out = pickle.load(fp)
    assert out['frames'].shape == (8, 90, 30, 3)
    np.testing.assert_array_equal(out['frames'][0],
                                  frames[0][0:90, 10:40])
    assert (out['w'], out['h']) == (30, 90)


@pytest.mark.slow
def test_score_model_metrics():
    import jax

    from conftest import TINY_UNISAL_CFG
    from retargetvid_tpu.train.trainer import Trainer

    # Metric semantics (kld/nss/cc/sim/aucj) are channel-count independent:
    # the narrow structure-test config skips a full-width eval compile.
    tr = Trainer(steps_per_epoch=5, model_cfg=TINY_UNISAL_CFG)
    tr.init_state(example_shape=(1, 1, 64, 64, 3))
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (1, 1, 64, 64, 3)).astype(np.float32)
    sal = np.zeros((1, 1, 64, 64, 1), np.float32)
    sal[0, 0, 30:34, 30:34, 0] = 1
    sal /= sal.sum()
    fix = (rng.random((1, 1, 64, 64, 1)) > 0.99).astype(np.float32)
    scores = tr.score_model([(x, sal, fix)], source='DHF1K')
    assert set(scores) == {'kld', 'nss', 'cc', 'sim', 'aucj'}
    assert np.isfinite(scores['kld'])
    assert 0.0 <= scores['sim'] <= 1.0
    assert 0.0 <= scores['aucj'] <= 1.0


def test_convert_script_importable():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'convert_transnet', 'tools/convert_transnet.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(mod.convert)
