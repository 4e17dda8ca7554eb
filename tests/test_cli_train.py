"""CLI train/score/predict subcommands (reference run.py:11-94)."""

import numpy as np
import pytest

from retargetvid_tpu import cli


@pytest.mark.parametrize('sub', ['train', 'score', 'predict'])
def test_cli_help(sub, capsys):
    with pytest.raises(SystemExit) as e:
        cli.main([sub, '--help'])
    assert e.value.code == 0
    assert sub in capsys.readouterr().out


def _saliency_tree(root, n_videos=3, n_frames=12, hw=(64, 64)):
    """Reference DHF1K layout: annotation/NNNN/{images,maps,fixation}/
    NNNN.png, 1-based 4-digit frame numbers (unisal/data.py:686-699)."""
    import cv2
    rng = np.random.default_rng(0)
    for v in range(n_videos):
        vdir = root / 'annotation' / f'{v + 1:04d}'
        for sub in ('images', 'maps', 'fixation'):
            (vdir / sub).mkdir(parents=True)
        for f in range(1, n_frames + 1):
            img = rng.integers(0, 255, (*hw, 3)).astype(np.uint8)
            cv2.imwrite(str(vdir / 'images' / f'{f:04d}.png'), img)
            cv2.imwrite(str(vdir / 'maps' / f'{f:04d}.png'),
                        rng.integers(0, 255, hw).astype(np.uint8))
            cv2.imwrite(str(vdir / 'fixation' / f'{f:04d}.png'),
                        (rng.random(hw) > 0.99).astype(np.uint8) * 255)


@pytest.mark.slow
def test_cli_train_then_score(tmp_path, monkeypatch):
    data = tmp_path / 'dhf1k'
    data.mkdir()
    _saliency_tree(data)
    monkeypatch.setenv('DHF1K_DATA_DIR', str(data))
    train_dir = tmp_path / 'run'
    import json as _json

    from conftest import TINY_UNISAL_CFG
    cli.main(['train', '--train-dir', str(train_dir), '--sources', 'DHF1K',
              '--num-epochs', '1', '--batch-size', '1', '--seq-len', '2',
              '--batches-per-epoch', '2', '--valid-batches', '1',
              '--chkpnt-warmup', '0', '--chkpnt-epochs', '1',
              '--model-cfg', _json.dumps(TINY_UNISAL_CFG)])
    # score must restore the tiny architecture from Trainer.json (the
    # reference's KwConfig round trip) or the weights would shape-mismatch.
    cfg = _json.loads((train_dir / 'Trainer.json').read_text())
    assert cfg['model_cfg'] == TINY_UNISAL_CFG
    assert (train_dir / 'all_scalars.json').exists()
    assert list(train_dir.glob('chkpnt_epoch*.pkl'))
    cli.main(['score', '--train-dir', str(train_dir), '--source', 'DHF1K',
              '--batch-size', '1', '--n-batches', '1', '--seq-len', '2'])


@pytest.mark.slow
def test_cli_predict_folder(tmp_path):
    import cv2
    rng = np.random.default_rng(1)
    folder = tmp_path / 'imgs'
    folder.mkdir()
    for i in range(2):
        cv2.imwrite(str(folder / f'img{i}.png'),
                    rng.integers(0, 255, (64, 64, 3)).astype(np.uint8))
    cli.main(['predict', str(folder), '--out', str(tmp_path / 'sal'),
              '--chunk', '2'])
    outs = sorted((tmp_path / 'sal').glob('*.png'))
    assert len(outs) == 2
    m = cv2.imread(str(outs[0]), cv2.IMREAD_GRAYSCALE)
    assert m.shape == (64, 64)
