"""copy_code and scalar-export Trainer extras."""

import pytest
import json

import numpy as np

#: Compile-heavy on CPU; excluded from the fast tier (pytest -m "not slow").
pytestmark = pytest.mark.slow



def test_copy_code_and_scalars(tmp_path):
    from retargetvid_tpu.train.trainer import Trainer
    from conftest import TINY_UNISAL_CFG
    tr = Trainer(steps_per_epoch=5, model_cfg=TINY_UNISAL_CFG)
    dst = tr.copy_code(tmp_path)
    assert (dst / 'config.py').is_file()
    assert (dst / 'models' / 'unisal.py').is_file()
    assert not list(dst.rglob('__pycache__'))

    history = [{'loss': 5.0, 'kld': 5.1}, {'loss': 4.0, 'kld': 4.2}]
    path = tr.export_scalars(tmp_path, history)
    scalars = json.loads(path.read_text())
    assert scalars['loss'] == [[0, 5.0], [1, 4.0]]
    assert scalars['kld'][1] == [1, 4.2]


def test_run_inference_video_and_scores():
    """Trainer.run_inference: recurrent video maps + metric scoring
    (reference train.py:425-556)."""
    import numpy as np

    from retargetvid_tpu.train.trainer import Trainer

    from conftest import TINY_UNISAL_CFG
    trainer = Trainer(steps_per_epoch=2, model_cfg=TINY_UNISAL_CFG)
    trainer.init_state(example_shape=(1, 2, 64, 64, 3))
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (6, 64, 64, 3)).astype(np.uint8)
    sal = rng.random((6, 64, 64)).astype(np.float32)
    fix = (rng.random((6, 64, 64)) > 0.99).astype(np.float32)
    maps, scores = trainer.run_inference(frames, frame_modulo=3, seq_len=2,
                                         sal=sal, fix=fix)
    assert maps.shape == (6, 64, 64)
    assert maps.dtype == np.uint8
    for k in ('kld', 'nss', 'cc', 'sim', 'aucj'):
        assert k in scores and np.isfinite(scores[k])
