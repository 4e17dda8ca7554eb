"""Auxiliary component tests: metrics, smoothers, post-processing, config,
plots, measurement, timing registry."""

import json

import numpy as np
import pytest


class TestSaliencyMetrics:
    def test_auc_judd_perfect_and_chance(self):
        from retargetvid_tpu.eval.saliency_metrics import auc_judd
        rng = np.random.default_rng(0)
        fix = np.zeros((20, 30))
        fix[5, 5] = fix[10, 20] = 1
        perfect = fix * 10.0 + rng.random((20, 30)) * 0.1
        assert auc_judd(perfect, fix) > 0.95
        chance = rng.random((20, 30))
        assert 0.2 < auc_judd(chance, fix) < 0.85

    def test_sim_bounds(self):
        from retargetvid_tpu.eval.saliency_metrics import sim
        rng = np.random.default_rng(1)
        a = rng.random((10, 10))
        assert sim(a, a) == pytest.approx(1.0)
        b = np.zeros((10, 10))
        b[0, 0] = 1
        c = np.zeros((10, 10))
        c[9, 9] = 1
        assert sim(b, c) == pytest.approx(0.0)

    def test_auc_shuffled(self):
        from retargetvid_tpu.eval.saliency_metrics import auc_shuffled
        rng = np.random.default_rng(2)
        fix = np.zeros((20, 30))
        fix[4, 6] = 1
        other = np.zeros((20, 30))
        other[15, 25] = other[2, 2] = 1
        sal = np.zeros((20, 30))
        sal[4, 6] = 1.0
        assert auc_shuffled(sal, fix, other) > 0.9


class TestSmoothSequence:
    def test_median_window(self):
        from retargetvid_tpu.utils.sequence import smooth_sequence
        seq = np.zeros((1, 7, 1, 4, 4), np.float32)
        seq[0, 3] = 100.0   # single outlier frame
        out = smooth_sequence(seq, 'med3')
        assert out[0, 3].max() == 0.0   # median of (0, 100, 0) is 0
        np.testing.assert_array_equal(
            smooth_sequence(seq, 'med1'), seq)


class TestTransnetPost:
    def test_scene_assembly_and_min_length(self):
        from retargetvid_tpu.models.transnet_post import (
            assert_segmentation,
            shots_from_predictions,
        )
        preds = np.zeros(100)
        preds[50] = 1.0
        preds[55] = 1.0   # would create a 4-frame shot -> merged
        scenes = shots_from_predictions(preds, 0.5, min_shot_len=12)
        assert_segmentation(scenes, 100)
        lens = scenes[:, 1] - scenes[:, 0] + 1
        assert (lens >= 12).all()

    def test_smooth_predictions(self):
        from retargetvid_tpu.models.transnet_post import smooth_predictions
        p = np.zeros(20)
        p[10] = 1.0
        s = smooth_predictions(p, 5)
        assert s[10] == pytest.approx(0.2)
        assert s.sum() == pytest.approx(1.0)

    def test_draw_video_with_predictions(self):
        """Debug scene-grid (reference transnet_utils.py:20-49): tiling,
        padding to the grid width, bar colors by threshold, separators."""
        from retargetvid_tpu.models.transnet_post import (
            draw_video_with_predictions,
        )
        ih, iw, n = 27, 48, 45            # pads to 60 = 3 rows of 20
        frames = np.full((n, ih, iw, 3), 128, np.uint8)
        preds = np.zeros(n, np.float32)
        preds[7] = 0.9                    # above threshold -> green bar
        preds[8] = 0.05                   # below threshold -> red bar
        img = draw_video_with_predictions(frames, preds, threshold=0.1)
        assert img.shape == (3 * ih, 20 * iw, 3)
        assert img.dtype == np.uint8
        # Tile 7 (row 0): green bar centered vertically at its right edge.
        x = 7 * iw + iw - 3
        assert tuple(img[ih // 2, x]) == (0, 255, 0)
        # Tile 8: red bar (length prop. to 0.05 -> ~1 px around center).
        x = 8 * iw + iw - 3
        assert tuple(img[ih // 2, x]) == (255, 0, 0)
        # Black backing band where the bar doesn't reach.
        assert tuple(img[1, x]) == (0, 0, 0)
        # White separator along each row's top edge; pad tiles are black.
        assert (img[0, :iw - 5] == 255).all()
        assert (img[2 * ih + 1, 19 * iw:19 * iw + iw - 5] == 0).all()


class TestKwConfig:
    def test_roundtrip(self, tmp_path):
        from retargetvid_tpu.train.trainer import Trainer
        tr = Trainer(num_epochs=3, lr=0.5, steps_per_epoch=7)
        tr.save_cfg(tmp_path)
        cfg = json.loads((tmp_path / 'Trainer.json').read_text())
        assert cfg['num_epochs'] == 3
        assert cfg['lr'] == 0.5
        tr2 = Trainer.init_from_cfg_dir(tmp_path)
        assert tr2.num_epochs == 3
        assert tr2.steps_per_epoch == 7


class TestTimingRegistry:
    def test_rollup_and_format(self):
        import time

        from retargetvid_tpu.utils.timing import (
            sc_all_times,
            sc_init_time,
            sc_register_time,
            sc_save_time_override,
        )
        sc_init_time()
        t0 = time.perf_counter() - 1.0   # pretend 1s elapsed
        sc_register_time(t0, '_stage_a')
        sc_save_time_override('_stage_b', 2.0)
        sc_save_time_override('aux', 0.5)
        out = sc_all_times(vid_dur=10.0)
        assert set(out) == {'_stage_a', '_stage_b', 'aux', 'total'}
        # format: "<sec>s, <percent>%"
        assert out['_stage_b'] == '  2.000s, 20.000%'
        total_sec = float(out['total'].split('s')[0])
        assert total_sec == pytest.approx(3.0, abs=0.1)


class TestMeasure:
    @pytest.mark.slow
    def test_model_size(self):
        import jax
        import jax.numpy as jnp

        from retargetvid_tpu.models.transnet import TransNetV1
        from retargetvid_tpu.train.measure import measure_model_size
        m = TransNetV1(f=2, d=16)
        params = m.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4, 27, 48, 3), jnp.uint8))
        info = measure_model_size(params)
        assert info['n_params'] > 1000
        assert info['bytes'] == info['n_params'] * 4


class TestPlots:
    def test_signal_plots_render(self, tmp_path):
        from retargetvid_tpu.utils.plots import (
            plot_cluster_scatter,
            plot_signals,
            plot_smoothing_preview,
        )
        rng = np.random.default_rng(0)
        vd = {'dxi': rng.random(50), 'dyi': rng.random(50),
              'dxs': rng.random(50), 'dys': rng.random(50),
              'dxl': rng.random(50), 'dyl': rng.random(50),
              'segmentation': np.array([[0, 24], [25, 49]])}
        p1 = tmp_path / 'sig.png'
        plot_signals(vd, str(p1))
        assert p1.stat().st_size > 0
        p2 = tmp_path / 'prev.png'
        plot_smoothing_preview(vd, str(p2))
        assert p2.stat().st_size > 0
        before = (rng.random((20, 30)) > 0.8) * 200.0
        after = before.copy()
        after[:10] = 0
        p3 = tmp_path / 'scatter.png'
        plot_cluster_scatter(before, after, str(p3))
        assert p3.stat().st_size > 0


class TestMemoryDatasets:
    def test_memory_image_dataset(self):
        from retargetvid_tpu.train.data import MemoryImageDataset
        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 255, (140, 250, 3)).astype(np.uint8)
                for _ in range(3)]
        ds = MemoryImageDataset(imgs)
        assert len(ds) == 3
        assert ds.out_size_dict[0] == (256, 416)
        nrs, tensor, target = ds.get_data(0)
        assert tensor.shape == (256, 416, 3)
        assert target == (140, 250)
        allx = ds.get_all_data()
        assert allx.shape == (3, 256, 416, 3)

    def test_env_gated_dataset_missing(self, monkeypatch):
        from retargetvid_tpu.train.data import DHF1KDataset
        monkeypatch.delenv('DHF1K_DATA_DIR', raising=False)
        with pytest.raises(FileNotFoundError):
            DHF1KDataset()


class TestNativeReader:
    """C++ decode loader == Python threaded reader, frame for frame."""

    def test_native_reader_matches_python(self, tmp_path):
        import cv2

        from retargetvid_tpu.io.native_reader import (
            native_available,
            open_reader,
        )
        from retargetvid_tpu.io.video import VideoReader

        if not native_available():
            pytest.skip('native reader toolchain unavailable')
        path = str(tmp_path / 'clip.mp4')
        w, h, n = 128, 72, 23
        writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'),
                                 30.0, (w, h))
        if not writer.isOpened():
            pytest.skip('cv2 cannot encode mp4 here')
        rng = np.random.default_rng(3)
        for _ in range(n):
            writer.write(rng.integers(0, 255, (h, w, 3)).astype(np.uint8))
        writer.release()

        native = open_reader(path)
        assert type(native).__name__ == 'NativeVideoReader'
        got = np.concatenate([c for c, _ in native.chunks(7)])
        native.stop()
        pyr = VideoReader(path)
        ref = np.stack(list(pyr.frames()))
        pyr.stop()
        assert got.shape == ref.shape == (n, h, w, 3)
        assert np.array_equal(got, ref)


class TestWebServiceCallbacks:
    """smart_vid_crop drives the ISM web-service callback protocol
    (reference smartVidCrop.py:2258-2531)."""

    def test_status_and_progress_sequence(self):
        from retargetvid_tpu.config import sc_init_crop_params
        from retargetvid_tpu.pipeline.crop import smart_vid_crop

        rng = np.random.default_rng(0)
        t_sel, h, w = 10, 36, 64
        smaps = np.zeros((t_sel, h, w), np.uint8)
        for i in range(t_sel):
            smaps[i, 10:20, 20 + i:34 + i] = 200
        vd = {
            'layout': 'thw', 'smaps': smaps,
            'segmentation': np.array([[0, 59]]),
            'segmentation_sel': np.array([[0, t_sel - 1]]),
            'true_inds': list(range(0, 60, 6)),
            'inds_to_orig': [1] * 60,
            'fr': 30.0, 'fc': 60, 'fc_sel': t_sel,
            'h_orig': 180, 'w_orig': 320, 'h_process': h, 'w_process': w,
        }
        cp = sc_init_crop_params()
        cp['out_ratio'] = '1:3'
        statuses, progresses = [], []
        smart_vid_crop(
            'unused.mp4', cp, vid_data=vd, save_vid=False,
            callback_session='sess-1',
            callback_status=lambda s, mod, code, label:
                statuses.append((s, mod, code)),
            callback_progress=lambda s, t, stage:
                progresses.append((s, round(t, 3), stage)))
        assert [c for _, _, c in statuses] == [
            'SC VIDEO ANALYSIS', 'SC PROCESSING', 'SC RENDERING']
        assert all(s == 'sess-1' for s, _, _ in statuses)
        assert [st for _, _, st in progresses] == [
            'STAGE#1', 'STAGE#2', 'STAGE#3']
        # 0.12 x the 2-second clip duration per stage
        assert all(abs(t - 0.24) < 1e-6 for _, t, _ in progresses)


class TestDynamicVideoPredictor:
    """predict_video: interleaved frame-modulo recurrent inference
    (reference train.py:425-556)."""

    def test_chunked_carryover_matches_single_pass(self):
        from retargetvid_tpu.models.unisal import UNISAL
        from retargetvid_tpu.pipeline.saliency import SaliencyPredictor

        rng = np.random.default_rng(0)
        t, h, w = 9, 64, 64
        frames = rng.integers(0, 255, (t, h, w, 3)).astype(np.uint8)
        from conftest import TINY_UNISAL_CFG
        pred = SaliencyPredictor(model=UNISAL(**TINY_UNISAL_CFG))
        maps = pred.predict_video(frames, frame_modulo=3, seq_len=2)
        assert maps.shape == (t, h, w)
        assert maps.dtype == np.uint8
        assert maps.max() > 0

        # Carryover through the REAL code path: seq_len=2 (hidden state
        # carried across chunk boundaries) must equal seq_len=9 (each
        # offset processed as one chunk, nothing carried).  Equality over
        # the full interleave is a stronger carryover assertion than the
        # former hand-rolled single-offset oracle, and compiles 1 extra
        # dynamic program instead of 3 (the uint8 quantization leaves 1
        # LSB of fp slack).  Full-width carryover parity vs torch stays in
        # test_models_unisal::test_hidden_state_carryover.
        whole = pred.predict_video(frames, frame_modulo=3, seq_len=9)
        diff = np.abs(maps.astype(np.int32) - whole.astype(np.int32))
        assert diff.max() <= 1, diff.max()

    def test_smooth_method_applies(self):
        from retargetvid_tpu.models.unisal import UNISAL
        from retargetvid_tpu.pipeline.saliency import SaliencyPredictor

        rng = np.random.default_rng(1)
        frames = rng.integers(0, 255, (6, 64, 64, 3)).astype(np.uint8)
        from conftest import TINY_UNISAL_CFG
        pred = SaliencyPredictor(model=UNISAL(**TINY_UNISAL_CFG))
        maps = pred.predict_video(frames, frame_modulo=2, seq_len=3,
                                  smooth_method='med3')
        assert maps.shape == (6, 64, 64)
