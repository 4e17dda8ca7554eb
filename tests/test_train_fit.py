"""Tests for the full Trainer.fit loop, fine_tune_mit, and the MIT datasets
(reference train.py:223-407, 1326-1392; data.py:175-235, 237-516)."""

import json
import os
from pathlib import Path

import numpy as np
import pytest


def _write_jpg(path, arr):
    import cv2
    cv2.imwrite(str(path), arr)


@pytest.fixture()
def mit1003_tree(tmp_path):
    """Synthetic MIT1003 layout: ALLSTIMULI/ALLSTIMULI/*.jpeg +
    ALLFIXATIONMAPS/ALLFIXATIONMAPS/<stem>_fix{Map,Pts}.jpg."""
    rng = np.random.default_rng(0)
    img_dir = tmp_path / 'ALLSTIMULI' / 'ALLSTIMULI'
    fix_dir = tmp_path / 'ALLFIXATIONMAPS' / 'ALLFIXATIONMAPS'
    img_dir.mkdir(parents=True)
    fix_dir.mkdir(parents=True)
    shapes = [(96, 128), (128, 96), (96, 128), (100, 140), (128, 96),
              (96, 128), (100, 140), (128, 96), (96, 128), (96, 128)]
    for i, (h, w) in enumerate(shapes):
        stem = f'i{i:03d}'
        _write_jpg(img_dir / f'{stem}.jpeg',
                   rng.integers(0, 255, (h, w, 3)).astype(np.uint8))
        _write_jpg(fix_dir / f'{stem}_fixMap.jpg',
                   rng.integers(0, 255, (h, w)).astype(np.uint8))
        _write_jpg(fix_dir / f'{stem}_fixPts.jpg',
                   (rng.random((h, w)) > 0.99).astype(np.uint8) * 255)
    return tmp_path


def test_mit1003_dataset_split_and_layout(mit1003_tree, monkeypatch):
    from retargetvid_tpu.train.data import MIT1003Dataset

    monkeypatch.setenv('MIT1003_DATA_DIR', str(mit1003_tree))
    ds_train = MIT1003Dataset(phase='train', n_x_val=5, x_val_step=0)
    ds_valid = MIT1003Dataset(phase='valid', n_x_val=5, x_val_step=0)
    n = 10
    assert len(ds_train) + len(ds_valid) == n
    assert len(ds_valid) == n // 5
    assert not set(ds_train.samples) & set(ds_valid.samples)

    # out sizes come from the restricted train grid, target = 2x out
    for i in ds_train.samples:
        info = ds_train.size_dict[i]
        assert info['out_size'][0] % 32 == 0
        assert info['out_size'][1] % 32 == 0
        assert info['target_size'] == tuple(2 * s for s in info['out_size'])

    frame_nrs, x, sal, fix, target = ds_train.get_data(ds_train.samples[0])
    out = ds_train.size_dict[ds_train.samples[0]]['out_size']
    assert x.shape == (out[0], out[1], 3)
    assert sal.shape == (out[0], out[1], 1)
    assert fix.shape == (out[0], out[1], 1)
    assert abs(float(sal.sum()) - 1.0) < 1e-4
    assert set(np.unique(fix)) <= {0.0, 1.0}


def test_img_size_batch_sampler_groups_by_out_size(mit1003_tree, monkeypatch):
    from retargetvid_tpu.train.data import ImgSizeBatchSampler, MIT1003Dataset

    monkeypatch.setenv('MIT1003_DATA_DIR', str(mit1003_tree))
    ds = MIT1003Dataset(phase='train', x_val_step=None)
    sampler = ImgSizeBatchSampler(ds, batch_size=2, shuffle=False)
    seen = 0
    for batch in sampler:
        sizes = {ds.size_dict[ds.samples[i]]['out_size'] for i in batch}
        assert len(sizes) == 1, 'batch mixes out sizes'
        assert len(batch) <= 2
        seen += len(batch)
    assert seen == len(ds)


def test_mit300_dataset(tmp_path, monkeypatch):
    from retargetvid_tpu.train.data import MIT300Dataset

    rng = np.random.default_rng(1)
    d = tmp_path / 'BenchmarkIMAGES'
    d.mkdir(parents=True)
    for i in (1, 2, 10):
        _write_jpg(d / f'i{i}.jpg',
                   rng.integers(0, 255, (80, 120, 3)).astype(np.uint8))
    monkeypatch.setenv('MIT300_DATA_DIR', str(tmp_path))
    ds = MIT300Dataset()
    assert len(ds) == 3
    # sorted numerically, not lexically: i1, i2, i10
    assert [s[0] for s in ds.samples] == ['i1.jpg', 'i2.jpg', 'i10.jpg']
    _, x, target = ds.get_data(0)
    assert x.shape[0] % 32 == 0 and x.shape[1] % 32 == 0
    assert target == (80, 120)


class _Loader:
    """Zero-arg batch-iterator factory with a known length."""

    def __init__(self, batches):
        self.batches = batches
        self.n_batches = len(batches)

    def __call__(self):
        return iter(self.batches)


def _synthetic_batches(n, t, hw=64, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        x = rng.normal(0, 1, (1, t, hw, hw, 3)).astype(np.float32)
        sal = rng.random((1, t, hw, hw, 1)).astype(np.float32)
        sal = sal / sal.sum(axis=(2, 3, 4), keepdims=True)
        fix = (rng.random((1, t, hw, hw, 1)) > 0.99).astype(np.float32)
        out.append((x, sal, fix))
    return out


@pytest.mark.slow
def test_trainer_fit_multi_source_best_weights(tmp_path):
    from retargetvid_tpu.train.trainer import Trainer

    from conftest import TINY_UNISAL_CFG
    trainer = Trainer(num_epochs=2, steps_per_epoch=4, train_cnn_after=2,
                      model_cfg=TINY_UNISAL_CFG)
    trainer.epoch = 0
    trainer.best_val_score = None
    trainer.is_best = False
    trainer.history = []
    dataloaders = {
        'DHF1K': {'train': _Loader(_synthetic_batches(2, 2, seed=0)),
                  'valid': _Loader(_synthetic_batches(1, 2, seed=1))},
        'SALICON': {'train': _Loader(_synthetic_batches(2, 1, seed=2)),
                    'valid': _Loader(_synthetic_batches(1, 1, seed=3))},
    }
    trainer.init_state(example_shape=(1, 2, 64, 64, 3))
    best = trainer.fit(dataloaders, tmp_path, chkpnt_warmup=0,
                       chkpnt_epochs=1)
    # two epochs ran, each logging train+valid scalars for both sources
    assert len(trainer.history) == 2
    for epoch_scalars in trainer.history:
        assert 'conv/loss/train' in epoch_scalars
        assert 'conv/loss/valid' in epoch_scalars
        assert 'salicon/loss/train' in epoch_scalars
        assert 'salicon/loss/valid' in epoch_scalars
    # best-val selection engaged (warmup 0) and scalars exported
    assert trainer.best_val_score is not None
    assert best == trainer.best_val_score
    assert (tmp_path / 'all_scalars.json').exists()
    scalars = json.loads((tmp_path / 'all_scalars.json').read_text())
    assert len(scalars['conv/loss/valid']) == 2
    # checkpoints follow the warmup/period rule
    assert (tmp_path / 'chkpnt_epoch0000.pkl').exists()
    assert (tmp_path / 'chkpnt_epoch0001.pkl').exists()


@pytest.mark.slow
def test_fine_tune_mit_runs_and_tracks_best(tmp_path):
    from retargetvid_tpu.train.trainer import Trainer

    from conftest import TINY_UNISAL_CFG
    trainer = Trainer(num_epochs=1, steps_per_epoch=2,
                      model_cfg=TINY_UNISAL_CFG)
    trainer.epoch = 0
    trainer.best_val_score = None
    trainer.history = []
    trainer.init_state(example_shape=(1, 1, 64, 64, 3))
    dataloaders = {
        'MIT1003': {'train': _Loader(_synthetic_batches(2, 1, seed=4)),
                    'valid': _Loader(_synthetic_batches(1, 1, seed=5))},
    }
    best_val, best_epoch = trainer.fine_tune_mit(
        dataloaders, tmp_path, num_epochs=2)
    assert trainer.mit1003_finetuned
    assert trainer.loss_metrics == ('kld',)
    assert len(trainer.history) == 2
    assert trainer.best_val_score is not None
    assert (tmp_path / 'all_scalars.json').exists()
