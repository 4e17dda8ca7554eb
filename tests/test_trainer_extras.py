"""copy_code and scalar-export Trainer extras."""

import pytest
import json

import numpy as np

#: Compile-heavy on CPU; excluded from the fast tier (pytest -m "not slow").
pytestmark = pytest.mark.slow



def test_copy_code_and_scalars(tmp_path):
    from retargetvid_tpu.train.trainer import Trainer
    tr = Trainer(steps_per_epoch=5)
    dst = tr.copy_code(tmp_path)
    assert (dst / 'config.py').is_file()
    assert (dst / 'models' / 'unisal.py').is_file()
    assert not list(dst.rglob('__pycache__'))

    history = [{'loss': 5.0, 'kld': 5.1}, {'loss': 4.0, 'kld': 4.2}]
    path = tr.export_scalars(tmp_path, history)
    scalars = json.loads(path.read_text())
    assert scalars['loss'] == [[0, 5.0], [1, 4.0]]
    assert scalars['kld'][1] == [1, 4.2]
