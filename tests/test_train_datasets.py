"""Reference-convention training datasets on synthetic directory trees
(unisal/data.py:49-130 SALICON, :536-766 DHF1K, :768-943 Hollywood,
:946-1083 UCFSports)."""

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')


def _png(path, arr):
    path.parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(path), arr)


RNG = np.random.default_rng(0)


def _frame(hw=(64, 64), ch=3):
    shape = (*hw, ch) if ch else hw
    return RNG.integers(0, 255, shape).astype(np.uint8)


@pytest.fixture()
def dhf1k_tree(tmp_path):
    for v in range(1, 7):
        vdir = tmp_path / 'annotation' / f'{v:04d}'
        for f in range(1, 13):
            _png(vdir / 'images' / f'{f:04d}.png', _frame())
            _png(vdir / 'maps' / f'{f:04d}.png', _frame(ch=0))
            _png(vdir / 'fixation' / f'{f:04d}.png', _frame(ch=0))
    return tmp_path


def test_dhf1k_layout_split_and_batches(dhf1k_tree, monkeypatch):
    from retargetvid_tpu.train.data import DHF1KDataset

    monkeypatch.setenv('DHF1K_DATA_DIR', str(dhf1k_tree))
    train = DHF1KDataset(phase='train', seq_len=3, frame_modulo=2,
                         val_size=2)
    valid = DHF1KDataset(phase='valid', seq_len=3, frame_modulo=2,
                         val_size=2)
    assert len(valid.vid_nr_array) == 2
    assert not set(train.vid_nr_array) & set(valid.vid_nr_array)
    assert set(train.vid_nr_array) | set(valid.vid_nr_array) == set(range(1, 7))

    # frame files are 1-based 4-digit under annotation/NNNN/images
    f = train.data_file(train.vid_nr_array[0], 1, 'frame')
    assert f.name == '0001.png' and f.parent.name == 'images'
    assert f.parent.parent.name == f'{train.vid_nr_array[0]:04d}'

    x, sal, fix = train.sample(2)
    assert x.shape == (2, 3, 224, 384, 3)
    assert sal.shape == (2, 3, 224, 384, 1)
    assert fix.shape == (2, 3, 224, 384, 1)
    # valid-phase starts follow the linspace plan (deterministic)
    assert all(s is not None for _, s in valid.samples)


@pytest.fixture()
def hollywood_tree(tmp_path):
    root = tmp_path / 'training'
    for vid in (1, 2):
        for shot in (1, 2):
            d = root / f'actionclip{"train"}{vid:05d}_{shot:1d}'
            for f in range(3, 15):      # starts at frame 3 (register path)
                stem = f'actionclip{"train"}{vid:05d}_{f:05d}.png'
                _png(d / 'images' / stem, _frame())
                _png(d / 'maps' / stem, _frame(ch=0))
                _png(d / 'fixation' / stem, _frame(ch=0))
    return tmp_path


def test_hollywood_register_and_shots(hollywood_tree, monkeypatch):
    from retargetvid_tpu.train.data import HollywoodDataset

    monkeypatch.setenv('HOLLYWOOD_DATA_DIR', str(hollywood_tree))
    ds = HollywoodDataset(phase='train', seq_len=3, frame_modulo=2,
                          val_size=1)
    # shot-level keys are 100*vid + shot
    assert all(k % 100 in (1, 2) for k in ds.n_images_dict)
    # register captured the non-1 start frame number
    key = next(iter(ds.n_images_dict))
    assert ds._register[key]['start'] == 3
    f = ds.data_file(key, 1, 'frame')
    assert f.name.endswith('_00003.png')
    x, sal, fix = ds.sample(1)
    assert x.shape == (1, 3, 224, 416, 3)


@pytest.fixture()
def ucf_tree(tmp_path):
    root = tmp_path / 'training'
    for name in ('Diving-Side-001', 'Golf-Swing-Back-002', 'Kicking-003'):
        d = root / name
        for f in range(12):
            stem = f'{name}_{f:03d}'
            _png(d / 'images' / f'{stem}.png', _frame())
            _png(d / 'maps' / f'{stem}.png', _frame(ch=0))
            _png(d / 'fixation' / f'{stem}.png', _frame(ch=0))
    return tmp_path


def test_ucfsports_name_dirs(ucf_tree, monkeypatch):
    from retargetvid_tpu.train.data import UCFSportsDataset

    monkeypatch.setenv('UCFSPORTS_DATA_DIR', str(ucf_tree))
    ds = UCFSportsDataset(phase='train', seq_len=3, frame_modulo=2,
                          val_size=1)
    assert len(ds.vid_nr_array) == 2          # 3 videos - val_size 1
    f = ds.data_file(ds.vid_nr_array[0], 1, 'frame')
    assert f.parent.name == 'images'
    x, sal, fix = ds.sample(1)
    assert x.shape == (1, 3, 256, 384, 3)


@pytest.fixture()
def salicon_tree(tmp_path):
    for nr in (7, 13, 21):
        _png(tmp_path / 'images' / f'COCO_train2014_{nr:012d}.jpg', _frame())
        _png(tmp_path / 'maps' / 'train' / f'COCO_train2014_{nr:012d}.png',
             _frame(ch=0))
        _png(tmp_path / 'fixations' / 'train' /
             f'COCO_train2014_{nr:012d}.png', _frame(ch=0))
    return tmp_path


def test_salicon_coco_naming(salicon_tree, monkeypatch):
    from retargetvid_tpu.train.data import SALICONDataset

    monkeypatch.setenv('SALICON_DATA_DIR', str(salicon_tree))
    ds = SALICONDataset(phase='train')
    assert ds.samples == [7, 13, 21]
    _, x, sal, fix, target = ds.get_data(7)
    assert x.shape == (288, 384, 3)
    assert abs(float(sal.sum()) - 1.0) < 1e-4
    assert target == (480, 640)
    x, sal, fix = ds.sample(2)
    assert x.shape == (2, 1, 288, 384, 3)     # static T=1 batches
