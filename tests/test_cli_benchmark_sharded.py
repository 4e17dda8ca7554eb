"""Sharded benchmark CLI (--mesh): dp-batched SPMD run == sequential run."""

import numpy as np
import pytest

#: Compile-heavy on CPU; excluded from the fast tier (pytest -m "not slow").
pytestmark = pytest.mark.slow

cv2 = pytest.importorskip("cv2")


def _write_clip(path, n, h=360, w=640, phase=0.0):
    yy, xx = np.mgrid[0:h, 0:w]
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*'mp4v'),
                             30.0, (w, h))
    if not writer.isOpened():
        pytest.skip('cv2 cannot encode mp4 here')
    for t in range(n):
        cx = w * (0.25 + 0.5 * ((t / n + phase) % 1.0))
        blob = (230 * np.exp(-(((yy - h / 2) ** 2 +
                                (xx - cx) ** 2) / 2000.0))).astype(np.uint8)
        writer.write(np.stack([blob] * 3, axis=-1))
    writer.release()


def test_group_clips_batches_by_signature():
    from retargetvid_tpu.parallel.runner import group_clips

    def clip(t_all, n_sel, fc, n_seg=1):
        return {'sal_frames': np.zeros((t_all, 16, 16, 3), np.uint8),
                'selected': list(range(n_sel)),
                'segmentation': [[0, fc - 1]] * n_seg, 'fc': fc}

    clips = [clip(30, 6, 30), clip(31, 6, 31), clip(200, 40, 200),
             clip(29, 5, 29)]
    batches = group_clips(clips, dp=2)
    # clips 0/1/3 share the 32-frame bucket signature; clip 2 is alone.
    sizes = sorted((len(b), n) for b, n in batches)
    assert sizes == [(2, 1), (2, 1), (2, 2)]
    for batch, n_real in batches:
        assert len(batch) == 2
        assert len({b['sal_frames'].shape[0] <= 32 for b in batch}) == 1


def test_sharded_benchmark_matches_sequential(tmp_path):
    vids = tmp_path / 'vids'
    vids.mkdir()
    # Three clips, two in the same bucket, dp=4 so one batch covers them.
    _write_clip(vids / '001.mp4', 30, phase=0.0)
    _write_clip(vids / '002.mp4', 31, phase=0.3)
    _write_clip(vids / '003.mp4', 30, phase=0.6)

    from retargetvid_tpu.cli import main
    from retargetvid_tpu.eval.annotations import read_boxes_file

    seq_dir = tmp_path / 'seq'
    main(['benchmark', '--videos', str(vids), '--out', str(seq_dir),
          '--test-name', 'run', '--ratios', '1:3', '--chunk', '8',
          '--replace-existing'])

    shard_dir = tmp_path / 'shard'
    main(['benchmark', '--videos', str(vids), '--out', str(shard_dir),
          '--test-name', 'run', '--ratios', '1:3', '--mesh', '4',
          '--replace-existing'])

    for vid in ('001', '002', '003'):
        seq = read_boxes_file(seq_dir / 'run' / f'{vid}_1-3.txt')
        shard = read_boxes_file(shard_dir / 'run' / f'{vid}_1-3.txt')
        assert seq.shape == shard.shape, vid
        # Same weights, same ops; allow <=1px for batched-vs-chunked fp noise.
        assert np.abs(seq - shard).max() <= 1, vid
        assert (np.abs(seq - shard) > 0).mean() < 0.05, vid
