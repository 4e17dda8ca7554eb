"""End-to-end geometry pipeline vs an independent numpy/scipy oracle."""

import numpy as np
import pytest
from scipy import interpolate as sinterp
from scipy import ndimage
from scipy import signal as ssignal

from retargetvid_tpu.config import sc_init_crop_params
from retargetvid_tpu.pipeline.geometry import run_geometry

#: Compile-heavy on CPU; excluded from the fast tier (pytest -m "not slow").
pytestmark = pytest.mark.slow


RNG = np.random.default_rng(41)


def _synthetic_clip(t_sel=40, h=70, w=125, two_blobs=True):
    """Selected-frame saliency volume with a dominant moving blob."""
    yy, xx = np.mgrid[0:h, 0:w]
    smaps = np.zeros((t_sel, h, w), np.float32)
    cx = 20 + 80 * np.linspace(0, 1, t_sel)
    cy = 35 + 10 * np.sin(np.linspace(0, 4, t_sel))
    for t in range(t_sel):
        main = 250 * np.exp(-(((yy - cy[t]) ** 2 + (xx - cx[t]) ** 2) / 60.0))
        smaps[t] = main
        if two_blobs:
            side = 160 * np.exp(-(((yy - 10) ** 2 + (xx - (w - 12)) ** 2) / 30.0))
            smaps[t] = np.maximum(smaps[t], side)
    return smaps.astype(np.uint8)


def _oracle(smaps, true_inds, seg, seg_sel, cp, fps, dims):
    """Independent reference-semantics implementation (scipy CCL)."""
    h_orig, w_orig, w_final, h_final, fc = dims
    t_sel, h, w = smaps.shape
    sm = smaps.astype(np.float64).copy()
    sm[sm < cp['t_threshold']] = 0

    seg_cuts = [s[0] for s in seg_sel] + [seg_sel[-1][1]]

    # clustering filter + boundary averaging, sequential like the reference
    for i in range(t_sel):
        m = sm[i]
        mask = m > 0
        if mask.sum() > cp['hdbscan_min'] + 1:
            lbl, n = ndimage.label(
                ndimage.binary_dilation(mask, np.ones((3, 3))),
                structure=np.ones((3, 3)))
            lbl = np.where(mask, lbl, 0)
            sizes = ndimage.sum_labels(mask, lbl, range(1, n + 1))
            ok = [k for k in range(1, n + 1) if sizes[k - 1] >= cp['hdbscan_min']]
            if ok:
                if cp['select_sum'] == 1:
                    weights = ndimage.sum_labels(m, lbl, ok)
                else:
                    weights = ndimage.labeled_comprehension(
                        m, lbl, ok, np.max, float, 0)
                winner = ok[int(np.argmax(weights))]
                m = np.where(lbl == winner, m, 0)
                if cp['op_close']:
                    import cv2
                    m = cv2.morphologyEx(m.astype(np.float32),
                                         cv2.MORPH_CLOSE,
                                         np.ones((5, 5), np.uint8))
                sm[i] = m
        if i < t_sel - 2 and any(x in seg_cuts for x in (i - 1, i, i + 1)):
            sm[i + 1] = np.trunc((sm[i + 1] + sm[i]) / 2.0)

    # centers: masked mean of nonzero coords (factor 1.0)
    dx, dy = [], []
    for i in range(t_sel):
        rows, cols = np.nonzero(sm[i])
        if len(rows) == 0:
            dx.append(None)
            dy.append(None)
        else:
            dx.append(cols.mean())
            dy.append(rows.mean())
    # (synthetic data has no empty frames; skip fill)
    assert all(v is not None for v in dx)

    # interpolation per segment
    dxi = np.zeros(fc)
    dyi = np.zeros(fc)
    for k in range(len(seg)):
        si, ei = seg[k]
        sis, eis = seg_sel[k]
        xs = np.asarray(true_inds[sis:eis + 1], float)
        xs = xs - xs[0]
        te = np.arange(ei - si + 1, dtype=float)
        for arr, out in ((dx, dxi), (dy, dyi)):
            ys = np.asarray(arr[sis:eis + 1], float)
            n = len(xs)
            if n < 3:
                vals = np.full(len(te), ys[0])
            elif n <= 6:
                vals = sinterp.interp1d(xs, ys, kind='linear',
                                        fill_value='extrapolate')(te)
            else:
                vals = sinterp.interp1d(xs, ys, kind='quadratic',
                                        fill_value='extrapolate')(te)
            out[si:ei + 1] = vals

    # smoothing per segment
    from test_ops_filters import _loess_oracle
    b, a = ssignal.butter(cp['lp_order'], cp['lp_cutoff'] / (fps / 2),
                          btype='lowpass')
    dxs = np.zeros(fc)
    dys = np.zeros(fc)
    for k in range(len(seg)):
        si, ei = seg[k]
        cl = ei - si + 1
        wnd = min(int(fps * cp['loess_w_secs']), cl - 2)
        if wnd % 2 == 0:
            wnd -= 1
        for src, out in ((dxi, dxs), (dyi, dys)):
            x = src[si:ei + 1]
            if cp['lp_filt']:
                if cl > 3 * (cp['lp_order'] + 1):
                    xl = ssignal.filtfilt(b, a, x)
                else:
                    box = np.convolve(x, np.ones(5), 'same') / 5
                    xl = x.copy()
                    xl[2:cl - 2] = box[2:cl - 2]
            else:
                xl = x
            if cl < 10:
                sm_out = xl
            elif cp['loess_filt']:
                sm_out = _loess_oracle(xl, wnd, cp['loess_degree'])
            else:
                sm_out = ssignal.savgol_filter(xl, wnd, cp['loess_degree'])
            out[si:ei + 1] = sm_out

    # boxes
    scale_w = w / w_orig
    scale_h = h / h_orig
    fbb_w, fbb_h = w_final, h_final
    h1, h2 = int(fbb_w / 2), fbb_w - int(fbb_w / 2)
    v1, v2 = int(fbb_h / 2), fbb_h - int(fbb_h / 2)
    boxes = []
    for i in range(fc):
        cx0, cy0 = int(dxs[i] / scale_w), int(dys[i] / scale_h)
        x1, y1, x2, y2 = cx0 - h1, cy0 - v1, cx0 + h2, cy0 + v2
        if x1 < 0:
            x1, x2 = 0, fbb_w
        if x2 > w_orig:
            x1, x2 = w_orig - fbb_w, w_orig
        if y1 < 0:
            y1, y2 = 0, fbb_h
        if y2 > h_orig:
            y1, y2 = h_orig - fbb_h, h_orig
        boxes.append([x1, y1, x2, y2])
    return np.array(boxes)


@pytest.mark.slow
def test_geometry_pipeline_matches_oracle():
    cp = sc_init_crop_params()
    fps = 30.0
    t_sel = 40
    smaps = _synthetic_clip(t_sel)
    # two segments over 0..221 true frames, samples every 6
    fc = 222
    true_inds = np.array([i * 6 for i in range(37)] + [119, 215, 221])
    true_inds = np.sort(true_inds)[:t_sel]
    seg = np.array([[0, 119], [120, 221]])
    # selected bounds: find sel indices
    sel_of = lambda f: int(np.searchsorted(true_inds, f, 'right') - 1)
    seg_sel = np.array([[0, sel_of(119)], [sel_of(119) + 1, t_sel - 1]])

    out = run_geometry(smaps, true_inds, seg, seg_sel, cp,
                       fps=fps, h_orig=360, w_orig=640,
                       w_final=120, h_final=360, fc=fc)
    ref = _oracle(smaps, true_inds, seg, seg_sel, cp, fps,
                  (360, 640, 120, 360, fc))
    diff = np.abs(out['boxes'] - ref)
    # Independent implementations; allow small pixel slack from resampling.
    assert diff.max() <= 2, (diff.max(), np.argwhere(diff == diff.max())[:5])
    assert (diff > 0).mean() < 0.05


@pytest.mark.slow
def test_geometry_pipeline_best_settings():
    cp = sc_init_crop_params(use_best_settings=True)
    smaps = _synthetic_clip(30)
    t_sel = 30
    fc = 180
    true_inds = np.arange(t_sel) * 6
    seg = np.array([[0, 179]])
    seg_sel = np.array([[0, t_sel - 1]])
    out = run_geometry(smaps, true_inds, seg, seg_sel, cp,
                       fps=30.0, h_orig=360, w_orig=640,
                       w_final=120, h_final=360, fc=fc)
    b = out['boxes']
    assert b.shape == (fc, 4)
    assert ((b[:, 2] - b[:, 0]) == 120).all()
    assert ((b[:, 3] - b[:, 1]) == 360).all()
    assert (b[:, 0] >= 0).all() and (b[:, 2] <= 640).all()
    # main blob moves left->right
    assert b[-1, 0] > b[0, 0]
