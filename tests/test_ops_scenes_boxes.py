"""Scene conversion, border detection, dest size, crop boxes vs oracles."""

import numpy as np
import pytest

from retargetvid_tpu.ops.border import border_detection, coverage_score, mean_saliency
from retargetvid_tpu.ops.boxes import calc_dest_size, compute_crop_boxes, shift_time
from retargetvid_tpu.ops.scenes import (
    fix_scene_bounds,
    predictions_to_scenes,
    scenes_to_selected,
)

RNG = np.random.default_rng(5)


class TestScenes:
    def test_simple_split(self):
        preds = np.zeros(20)
        preds[10] = 0.9
        scenes = predictions_to_scenes(preds, 0.5)
        assert scenes.tolist() == [[0, 10], [11, 19]]

    def test_all_transitions_fallback(self):
        preds = np.ones(7)
        scenes = predictions_to_scenes(preds, 0.5)
        assert scenes.tolist() == [[0, 6]]

    def test_no_transitions(self):
        preds = np.zeros(9)
        assert predictions_to_scenes(preds, 0.5).tolist() == [[0, 8]]

    def test_multi_frame_transition(self):
        preds = np.zeros(30)
        preds[10:13] = 0.9
        scenes = predictions_to_scenes(preds, 0.5)
        assert scenes.tolist() == [[0, 10], [13, 29]]

    def test_fix_bounds(self):
        seg = np.array([[0, 10], [13, 29]])
        fixed = fix_scene_bounds(seg, 31)
        assert fixed.tolist() == [[0, 12], [13, 30]]

    def test_selected_mapping(self):
        seg = np.array([[0, 12], [13, 30]])
        # selected every 6th frame: map2orig[f] = index of last selected <= f
        map2orig = np.repeat(np.arange(6), 6)[:31]
        sel = scenes_to_selected(seg, map2orig)
        assert sel.tolist() == [[0, 2], [2, 5]]


class TestBorders:
    def _oracle(self, smaps, t_border, h_orig, w_orig):
        """Python-loop oracle of the reference border scan."""
        sal_max = smaps.max(axis=0)
        f_col = sal_max.max(axis=1)
        f_row = sal_max.max(axis=0)
        h, w = sal_max.shape

        def count(profile):
            c = 0
            for v in profile:
                if v > t_border:
                    break
                c += 1
            return c

        t = min(count(f_col), int(h * 0.45))
        b = min(count(f_col[::-1]), int(h * 0.45))
        le = min(count(f_row), int(w * 0.45))
        r = min(count(f_row[::-1]), int(w * 0.45))
        return (int(h_orig / h * t), int(h_orig / h * b),
                int(w_orig / w * le), int(w_orig / w * r))

    def test_disabled(self):
        smaps = RNG.integers(0, 255, (4, 20, 30)).astype(np.uint8)
        out = border_detection(smaps, -1, 360, 640)
        assert all(int(out[k]) == 0 for k in out)

    def test_with_borders(self):
        smaps = RNG.integers(50, 255, (4, 36, 64)).astype(np.uint8)
        smaps[:, :5, :] = 0      # black top border
        smaps[:, :, -7:] = 3     # dark right border
        out = border_detection(smaps, 10, 360, 640)
        ot, ob, ol, orr = self._oracle(smaps, 10, 360, 640)
        assert (int(out['border_t']), int(out['border_b']),
                int(out['border_l']), int(out['border_r'])) == (ot, ob, ol, orr)
        assert int(out['border_t']) == int(360 / 36 * 5)

    def test_all_black_capped(self):
        smaps = np.zeros((2, 36, 64), np.uint8)
        out = border_detection(smaps, 10, 360, 640)
        assert int(out['border_t']) == int(360 / 36 * int(36 * 0.45))


class TestMeanSalCoverage:
    def test_mean(self):
        smaps = RNG.integers(0, 255, (6, 10, 12)).astype(np.uint8)
        g, per = mean_saliency(smaps)
        assert float(g) == pytest.approx(smaps.mean(), rel=1e-5)
        np.testing.assert_allclose(
            np.asarray(per), smaps.mean(axis=(1, 2)), rtol=1e-5)

    def test_coverage_reference_quirk_zero(self):
        # Reference slides a full-width window -> loop never runs -> 0.0.
        smaps = RNG.integers(0, 255, (3, 10, 12)).astype(np.uint8)
        g, per = coverage_score(smaps, conversion_mode=1)
        assert float(g) == 0.0

    def test_coverage_with_real_window(self):
        smaps = np.zeros((1, 10, 20), np.float32)
        smaps[0, :, 5:9] = 100.0
        g, per = coverage_score(smaps, conversion_mode=1, window=6)
        assert float(per[0]) == pytest.approx(1.0)


class TestDestSize:
    def test_no_conversion(self):
        d = calc_dest_size(640, 360, '16:9')
        assert d['conversion_mode'] == 0
        assert (d['w_final'], d['h_final']) == (640, 360)

    def test_preserve_height_13(self):
        d = calc_dest_size(640, 360, '1:3')
        assert d['conversion_mode'] == 1
        assert (d['w_final'], d['h_final']) == (120, 360)

    def test_preserve_width_31(self):
        d = calc_dest_size(640, 360, '3:1')
        assert d['conversion_mode'] == 2
        assert (d['w_final'], d['h_final']) == (640, 213)

    def test_45(self):
        d = calc_dest_size(640, 360, '4:5')
        assert d['conversion_mode'] == 1
        assert (d['w_final'], d['h_final']) == (288, 360)


class TestComputeBoxes:
    def _oracle(self, dxs, dys, kw):
        """Python-loop oracle of the reference per-frame box computation."""
        scale_h = kw['h_process'] / kw['h_orig']
        scale_w = kw['w_process'] / kw['w_orig']
        fbb_w, fbb_h = kw['w_final'], kw['h_final']
        bt, bb_, bl, br = (kw.get('border_t', 0), kw.get('border_b', 0),
                           kw.get('border_l', 0), kw.get('border_r', 0))
        if kw['h_final'] == kw['h_orig']:
            fbb_h = kw['h_final'] - bt - bb_
            fbb_w = int(fbb_h / kw['h_final'] * kw['w_final'])
        if kw['w_final'] == kw['w_orig']:
            fbb_w = kw['w_final'] - bl - br
            fbb_h = int(fbb_w / kw['w_final'] * kw['h_final'])
        h1, h2 = int(fbb_w / 2), fbb_w - int(fbb_w / 2)
        v1, v2 = int(fbb_h / 2), fbb_h - int(fbb_h / 2)
        out = []
        for x, y in zip(dxs, dys):
            cx, cy = int(x / scale_w), int(y / scale_h)
            x1, y1, x2, y2 = cx - h1, cy - v1, cx + h2, cy + v2
            if x1 < bl:
                x1 = bl
                x2 = x1 + fbb_w
            if x2 > kw['w_orig'] - br:
                x2 = kw['w_orig'] - br
                x1 = x2 - fbb_w
            if y1 < bt:
                y1 = bt
                y2 = y1 + fbb_h
            if y2 > kw['h_orig'] - bb_:
                y2 = kw['h_orig'] - bb_
                y1 = y2 - fbb_h
            out.append([x1, y1, x2, y2])
        return np.array(out)

    @pytest.mark.parametrize("ratio,final", [('1:3', (120, 360)),
                                             ('3:1', (640, 213))])
    def test_vs_oracle(self, ratio, final):
        kw = dict(w_orig=640, h_orig=360, w_process=250, h_process=140,
                  w_final=final[0], h_final=final[1])
        dxs = RNG.uniform(0, 250, 40)
        dys = RNG.uniform(0, 140, 40)
        boxes, fw, fh = compute_crop_boxes(dxs, dys, **kw)
        ref = self._oracle(dxs, dys, kw)
        np.testing.assert_array_equal(np.asarray(boxes), ref)

    def test_with_borders(self):
        kw = dict(w_orig=640, h_orig=360, w_process=250, h_process=140,
                  w_final=120, h_final=360,
                  border_t=20, border_b=10, border_l=15, border_r=5)
        dxs = RNG.uniform(0, 250, 25)
        dys = RNG.uniform(0, 140, 25)
        boxes, fw, fh = compute_crop_boxes(dxs, dys, **kw)
        ref = self._oracle(dxs, dys, kw)
        np.testing.assert_array_equal(np.asarray(boxes), ref)


class TestShift:
    def test_noop(self):
        b = np.arange(20).reshape(5, 4)
        np.testing.assert_array_equal(np.asarray(shift_time(b, 0)), b)

    def test_shift2(self):
        b = np.arange(20).reshape(5, 4)
        out = np.asarray(shift_time(b, 2))
        np.testing.assert_array_equal(out[0], b[2])
        np.testing.assert_array_equal(out[2], b[4])
        np.testing.assert_array_equal(out[3], b[4])
        np.testing.assert_array_equal(out[4], b[4])
