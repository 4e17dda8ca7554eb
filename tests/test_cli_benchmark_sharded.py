"""Sharded benchmark CLI (--mesh): dp-batched SPMD run == sequential run."""

import numpy as np
import pytest

#: 8-virtual-device SPMD compiles: the heaviest tier, deselected by the
#: default run (pytest.ini addopts); run with -m mesh (or -m "").
pytestmark = [pytest.mark.slow, pytest.mark.mesh]

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


def test_read_video_structure_streams_long_clips(tmp_path):
    """Clips longer than read_batch stream through overlap-stitched shot
    batches (reference smartVidCrop.py:248-374) instead of raising, and the
    streamed structure equals the whole-buffer one (VERDICT r2 item #5)."""
    from retargetvid_tpu.config import sc_init_crop_params
    from retargetvid_tpu.pipeline.ingest import read_video_structure

    path = tmp_path / 'long.mp4'
    _write_clip(path, 170)

    def mock_tn(frames):
        f = np.asarray(frames).astype(np.float32)
        probs = np.zeros(len(f), np.float32)
        if len(f) > 1:
            d = np.abs(f[1:] - f[:-1]).mean(axis=(1, 2, 3))
            live = f[:-1].max(axis=(1, 2, 3)) > 2
            probs[1:] = np.where((d > 20) & live, 0.9, 0.0)
        return probs

    whole = read_video_structure(str(path), sc_init_crop_params(), mock_tn)
    cp_small = sc_init_crop_params()
    cp_small['read_batch'] = 48
    streamed = read_video_structure(str(path), cp_small, mock_tn)

    assert whole['fc'] == streamed['fc'] == 170
    assert list(whole['true_inds']) == list(streamed['true_inds'])
    assert np.array_equal(np.asarray(whole['segmentation']),
                          np.asarray(streamed['segmentation']))
    assert whole['sal_frames'].shape == streamed['sal_frames'].shape
    assert np.array_equal(whole['sal_frames'], streamed['sal_frames'])


def test_oneshot_benchmark_matches_sequential(tmp_path):
    """`benchmark --oneshot` (one device program per clip) produces the same
    boxes as the sequential path within 1 px."""
    vids = tmp_path / 'vids'
    vids.mkdir()
    _write_clip(vids / '001.mp4', 30, phase=0.0)
    _write_clip(vids / '002.mp4', 31, phase=0.4)

    from retargetvid_tpu.cli import main
    from retargetvid_tpu.eval.annotations import read_boxes_file

    seq_dir = tmp_path / 'seq'
    main(['benchmark', '--videos', str(vids), '--out', str(seq_dir),
          '--test-name', 'run', '--ratios', '1:3', '--chunk', '8',
          '--replace-existing'])
    one_dir = tmp_path / 'one'
    main(['benchmark', '--videos', str(vids), '--out', str(one_dir),
          '--test-name', 'run', '--ratios', '1:3', '--oneshot',
          '--replace-existing'])

    for vid in ('001', '002'):
        seq = read_boxes_file(seq_dir / 'run' / f'{vid}_1-3.txt')
        one = read_boxes_file(one_dir / 'run' / f'{vid}_1-3.txt')
        assert seq.shape == one.shape, vid
        assert np.abs(seq - one).max() <= 1, vid
        info = (one_dir / 'run' / f'{vid}_1-3_info.txt').read_text()
        assert 't__clustering:' in info and 't_total:' in info


def test_oneshot_sharded_benchmark_matches_oneshot(tmp_path):
    """`benchmark --mesh 2 --oneshot` (whole-clip program, one clip per dp
    shard) produces the same boxes as the per-clip one-shot path: the two
    same-bucket clips ride ONE vmapped SPMD dispatch."""
    vids = tmp_path / 'vids'
    vids.mkdir()
    _write_clip(vids / '001.mp4', 30, phase=0.0)
    _write_clip(vids / '002.mp4', 31, phase=0.4)

    from retargetvid_tpu.cli import main
    from retargetvid_tpu.eval.annotations import read_boxes_file

    one_dir = tmp_path / 'one'
    main(['benchmark', '--videos', str(vids), '--out', str(one_dir),
          '--test-name', 'run', '--ratios', '1:3', '--oneshot',
          '--replace-existing'])
    sh_dir = tmp_path / 'shard'
    main(['benchmark', '--videos', str(vids), '--out', str(sh_dir),
          '--test-name', 'run', '--ratios', '1:3', '--oneshot',
          '--mesh', '2', '--replace-existing'])

    for vid in ('001', '002'):
        one = read_boxes_file(one_dir / 'run' / f'{vid}_1-3.txt')
        sh = read_boxes_file(sh_dir / 'run' / f'{vid}_1-3.txt')
        assert one.shape == sh.shape, vid
        # Same body vmapped/padded vs compiled at the exact frame count;
        # identical math modulo batched-fp reassociation.
        assert np.abs(one - sh).max() <= 1, vid
        info = (sh_dir / 'run' / f'{vid}_1-3_info.txt').read_text()
        assert 't__clustering:' in info and 't_total:' in info
        assert 'oneshot dp=2' in info
