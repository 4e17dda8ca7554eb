"""Golden-parity tests for the evaluation harness.

Scoring the reference's released per-video outputs
(``/root/reference/results/smartvidcrop``) must reproduce the published
ICIP-2021 numbers: mean IoU 49.9 (1:3) and 71.4 (3:1) — reference
``README.md:57-61`` and ``BASELINE.md``.  This locks the metric before any
model work.
"""

import numpy as np
import pytest

from retargetvid_tpu.eval.annotations import write_boxes_file
from retargetvid_tpu.eval.harness import (
    benchmark_eval_boxes,
    evaluate_results_tree,
    iou_series,
    iou_xyxy_inclusive,
    score_run,
    validate_runs,
)


def test_iou_identity():
    assert iou_xyxy_inclusive([0, 0, 9, 9], [0, 0, 9, 9]) == pytest.approx(1.0)


def test_iou_disjoint():
    assert iou_xyxy_inclusive([0, 0, 4, 4], [10, 10, 14, 14]) == 0.0


def test_iou_inclusive_convention():
    # Boxes sharing exactly one row of pixels intersect under the +1 convention.
    a = [0, 0, 4, 4]
    b = [4, 0, 8, 4]
    # inter = 1x5 = 5, each area 25 -> 5/45
    assert iou_xyxy_inclusive(a, b) == pytest.approx(5.0 / 45.0)


def test_iou_broadcasting_matches_scalar():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 100, size=(7, 4))
    b = rng.integers(0, 100, size=(7, 4))
    a[:, 2:] += a[:, :2]
    b[:, 2:] += b[:, :2]
    batched = iou_xyxy_inclusive(a, b)
    for i in range(7):
        assert batched[i] == pytest.approx(
            iou_xyxy_inclusive(a[i], b[i]))


def test_negative_clamping():
    # Negative coords are clamped on both boxes (retargetvid_eval.py:181-190).
    gt = np.array([[-5, 0, 10, 10]])
    pr = np.array([[-5, 0, 10, 10]])
    assert iou_series(gt, pr)[0] == pytest.approx(1.0)


def test_benchmark_eval_boxes_13():
    pred = np.array([[30, 7, 99, 99]])
    fixed = benchmark_eval_boxes(pred, '1:3')
    assert fixed.tolist() == [[30, 7, 150, 360]]


def test_benchmark_eval_boxes_31():
    pred = np.array([[3, 40, 99, 99]])
    fixed = benchmark_eval_boxes(pred, '3:1')
    assert fixed.tolist() == [[3, 40, 640, 254]]


def _tiny_annots(vid_inds, n_frames=10, n_users=2):
    """Synthetic annots[user][ar][vid] nesting with constant boxes."""
    annots = []
    for u in range(n_users):
        user = {}
        for ar in ('1-3', '3-1'):
            user[ar] = {v: np.tile([10 + u, 0, 130 + u, 360], (n_frames, 1))
                        for v in vid_inds}
        annots.append(user)
    return annots


def test_corrupted_run_warns_and_still_scores(tmp_path, capsys):
    """Malformed run directories reproduce the reference's console behavior
    (``retargetvid_eval.py:92-125``): a validity report with file and
    frame-count error counts, warn-don't-raise, partial scoring of short
    files."""
    vid_inds = (1, 2)
    annots = _tiny_annots(vid_inds)
    run = tmp_path / 'broken_run'
    run.mkdir()
    box = np.tile([12, 0, 132, 360], (10, 1))
    write_boxes_file(run / '001_1-3.txt', box)
    write_boxes_file(run / '001_3-1.txt', box)
    # vid 2: 1-3 truncated to 7 frames (beyond the +-1 tolerance),
    #        3-1 missing entirely.
    write_boxes_file(run / '002_1-3.txt', box[:7])

    report = validate_runs(tmp_path, annots, vid_inds)
    assert report == {'broken_run': (1, 1)}
    out = capsys.readouterr().out
    assert 'Checking runs validity' in out
    assert '(file errors:1 + frame count errors:1)' in out

    scores = score_run(run, annots, vid_inds)       # must not raise
    out = capsys.readouterr().out
    assert 'could not find annotation!' in out
    assert scores['3-1']['missing_files'] == 1
    # vid 2 @ 1-3 scored over its 7 available frames, same constant IoU.
    assert scores['1-3']['missing_files'] == 0
    assert scores['1-3']['per_video'][2] == pytest.approx(
        scores['1-3']['per_video'][1])

    evals = evaluate_results_tree(tmp_path, annots, output_file=None,
                                  vid_inds=vid_inds, verbose=True)
    assert evals['broken_run']['validity'] == (1, 1)
    out = capsys.readouterr().out
    assert 'valid runs::' in out


@pytest.mark.golden
def test_golden_smartvidcrop_scores(reference_dir, annots):
    """Scoring the released outputs reproduces the published paper numbers."""
    scores = score_run(reference_dir / 'results' / 'smartvidcrop', annots)
    mean_13 = scores['1-3']['mean']
    mean_31 = scores['3-1']['mean']
    # Published: 49.9 @ 1:3, 71.4 @ 3:1 (reference README.md:57-61).
    assert round(mean_13, 1) == pytest.approx(49.9, abs=0.05), mean_13
    assert round(mean_31, 1) == pytest.approx(71.4, abs=0.05), mean_31
    # No missing files in the golden run.
    assert scores['1-3']['missing_files'] == 0
    assert scores['3-1']['missing_files'] == 0
    # worst <= mean <= best
    for ar in ('1-3', '3-1'):
        s = scores[ar]
        assert s['worst'] <= s['mean'] <= s['best']
