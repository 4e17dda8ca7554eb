"""Empty-center filling, focus freezing, jump line scores vs oracles."""

import pytest
import math

import numpy as np

from retargetvid_tpu.ops.focus import jump_saliency_scores
from retargetvid_tpu.ops.temporal import fill_empty_centers, freeze_unstable_segments

#: Compile-heavy on CPU; excluded from the fast tier (pytest -m "not slow").
pytestmark = pytest.mark.slow


RNG = np.random.default_rng(13)


def _fill_oracle(dx, dy, valid, seg_starts, seg_ends):
    """Reference sc_handle_empty_centers semantics, Python loops."""
    dx = [x if v else None for x, v in zip(dx, valid)]
    dy = [y if v else None for y, v in zip(dy, valid)]
    runs, cur = [], []
    for i, v in enumerate(dx):
        if v is None:
            cur.append(i)
        elif cur:
            runs.append(cur)
            cur = []
    if cur:
        runs.append(cur)
    for run in runs:
        mn, mx = min(run), max(run)
        d_start = min(abs(s - mn) for s in seg_starts)
        d_end = min(abs(e - mx) for e in seg_ends)
        if d_start < d_end:
            fx, fy = dx[mx + 1], dy[mx + 1]
        else:
            fx, fy = dx[mn - 1], dy[mn - 1]
        for j in run:
            dx[j] = fx
            dy[j] = fy
    return np.array(dx, float), np.array(dy, float)


def test_fill_matches_oracle():
    for trial in range(8):
        t = 30
        dx = RNG.uniform(0, 100, t)
        dy = RNG.uniform(0, 60, t)
        valid = RNG.random(t) > 0.3
        valid[0] = True          # avoid the reference's negative-index wrap
        valid[-1] = True
        seg_starts = np.array([0, 12, 22])
        seg_ends = np.array([11, 21, 29])
        ox, oy = _fill_oracle(dx.copy(), dy.copy(), valid, seg_starts, seg_ends)
        pad = np.full(5, -10**6)
        fx, fy = fill_empty_centers(
            dx, dy, valid,
            np.concatenate([seg_starts, pad]).astype(np.int32),
            np.concatenate([seg_ends, pad]).astype(np.int32))
        np.testing.assert_allclose(np.asarray(fx), ox, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(fy), oy, rtol=1e-6)


def test_fill_all_valid_noop():
    dx = RNG.uniform(0, 100, 10)
    dy = RNG.uniform(0, 60, 10)
    fx, fy = fill_empty_centers(
        dx, dy, np.ones(10, bool),
        np.array([0], np.int32), np.array([9], np.int32))
    np.testing.assert_allclose(np.asarray(fx), dx, rtol=1e-6)


def _freeze_oracle(dx, dy, jump_inds, fc_sel, skip, fps, stab_secs):
    dx, dy = list(dx), list(dy)
    for i in range(len(jump_inds) - 1):
        start = max(jump_inds[i] - 1, 0)
        end = min(jump_inds[i + 1] + 1, fc_sel - 1)
        dur = (end - start) * skip / fps
        if dur > stab_secs:
            continue
        for j in range(end - start):
            dx[start + j] = dx[start]
            dy[start + j] = dy[start]
    return np.array(dx), np.array(dy)


def test_freeze_matches_oracle():
    t = 40
    dx = RNG.uniform(0, 100, t)
    dy = RNG.uniform(0, 60, t)
    jump_inds = [3, 6, 15, 17, 30]
    ox, oy = _freeze_oracle(dx.copy(), dy.copy(), jump_inds, t, 6, 30.0, 1.5)
    ji = np.full(10, 10**6, np.int32)
    ji[:len(jump_inds)] = jump_inds
    fx, fy = freeze_unstable_segments(
        dx, dy, ji, len(jump_inds), fc_sel=t, skip=6, fps=30.0, stab_secs=1.5)
    np.testing.assert_allclose(np.asarray(fx), ox, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fy), oy, rtol=1e-6)


# ---------------------------------------------------------------------------
# Jump line scores
# ---------------------------------------------------------------------------

def _line_points_oracle(p1x, p1y, p2x, p2y, w, h, min_d):
    """Reference get_points_on_line semantics."""
    dx, dy = p2x - p1x, p2y - p1y
    dxa, dya = abs(dx), abs(dy)
    if dxa < min_d and dya < min_d:
        return None
    n = int(math.ceil(max(dxa, dya)))
    pts = []
    if p1x == p2x:
        ys = np.arange(p1y - 1, p1y - dya - 1, -1) if p1y > p2y \
            else np.arange(p1y + 1, p1y + dya + 1)
        pts = [(p1x, y) for y in ys]
    elif p1y == p2y:
        xs = np.arange(p1x - 1, p1x - dxa - 1, -1) if p1x > p2x \
            else np.arange(p1x + 1, p1x + dxa + 1)
        pts = [(x, p1y) for x in xs]
    elif dya > dxa:
        slope = np.float32(dx) / np.float32(dy)
        ys = np.arange(p1y - 1, p1y - dya - 1, -1) if p1y > p2y \
            else np.arange(p1y + 1, p1y + dya + 1)
        xs = (slope * (ys - p1y)).astype(int) + p1x
        pts = list(zip(xs, ys))
    else:
        slope = np.float32(dy) / np.float32(dx)
        xs = np.arange(p1x - 1, p1x - dxa - 1, -1) if p1x > p2x \
            else np.arange(p1x + 1, p1x + dxa + 1)
        ys = (slope * (xs - p1x)).astype(int) + p1y
        pts = list(zip(xs, ys))
    pts = [(x, y) for x, y in pts if 0 <= x < w and 0 <= y < h]
    return pts[:n]


def _score_oracle(smap, p1, p2, min_d):
    h, w = smap.shape
    pts = _line_points_oracle(p1[0], p1[1], p2[0], p2[1], w, h, min_d)
    if pts is None or len(pts) == 0:
        return 255.0
    s = sum(float(smap[int(math.floor(y)), int(math.floor(x))])
            for x, y in pts)
    return s / len(pts)


def test_jump_scores_match_oracle():
    h, w = 36, 64
    t = 12
    smaps = RNG.integers(0, 255, (t, h, w)).astype(np.float32)
    cx = RNG.uniform(1, w - 2, t).astype(np.float32)
    cy = RNG.uniform(1, h - 2, t).astype(np.float32)
    scores = np.asarray(jump_saliency_scores(
        smaps, cx, cy, min_d_jump=10))
    assert scores[0] == 255.0
    for i in range(1, t):
        ref = _score_oracle(smaps[i], (cx[i - 1], cy[i - 1]),
                            (cx[i], cy[i]), 10)
        assert abs(scores[i] - ref) < 0.5, (i, scores[i], ref)


def test_small_jump_is_255():
    smaps = np.zeros((2, 20, 20), np.float32)
    cx = np.array([5.0, 6.0])
    cy = np.array([5.0, 5.5])
    scores = np.asarray(jump_saliency_scores(smaps, cx, cy, min_d_jump=10))
    assert scores[1] == 255.0
