"""Clustering/geometry parity-ablation harness (VERDICT round-1 item #3).

Quantifies how closely the TPU-native geometry chain reproduces the
reference's *decisions* — most importantly the filtering-through-clustering
step (``/root/reference/smartVidCrop.py:1062-1161, 2340-2348``), the paper's
core novelty, which this framework replaces with a vectorizable
connected-components selection (``retargetvid_tpu/ops/clustering.py``).

Methodology
-----------
1. The reference's pure geometry functions are AST-extracted from
   ``smartVidCrop.py`` at run time and exec'd with light stubs (timing noop,
   ``np.int`` alias, sklearn-backed ``hdbscan`` shim) — test-time oracle use
   of the reference, the same relationship as ``tests/reference_oracles.py``;
   nothing is copied into the framework source.  The HDBSCAN oracle is
   ``sklearn.cluster.HDBSCAN`` (same algorithm family; the reference's
   ``hdbscan`` package is not installed here) with the reference's exact
   parameters (min_cluster_size, min_samples, sqeuclidean metric, eom
   selection, allow_single_cluster — ``smartVidCrop.py:2340-2348``).
2. Both pipelines run on a corpus of synthetic saliency volumes covering the
   regimes that exercise the clustering decision: single moving blobs,
   near-tie two-blob scenes, speckle noise, sparse below-min-points frames,
   empty frames, and blobs crossing shot cuts.
3. Per-stage deviations are reported: post-filter pixel decision agreement,
   center-of-mass distance, and final crop-box IoU (the benchmark metric,
   budget >= 0.995 per BASELINE.md).

Run:  JAX_PLATFORMS=cpu python tools/parity_ablation.py [--report docs/PARITY.md]
"""

from __future__ import annotations

import argparse
import ast
import importlib.util
import math
import sys
import types

import numpy as np

REFERENCE = '/root/reference/smartVidCrop.py'
PYLOESS = '/root/reference/3rd_party_libs/loess/pyloess.py'

ORACLE_FUNCS = [
    'sc_threshold', 'sc_clustering_filt', 'sc_find_center_of_mass',
    'sc_handle_empty_centers', 'get_points_on_line', 'sc_check_for_extra_cuts',
    'interp_handler', 'sc_interpolate', 'sc_butter_lowpass_filter',
    'loess_handler', 'sc_smoothing', 'sc_shift_time', 'sc_calc_dest_size',
    'sc_compute_bb', 'bb_intersection_over_union',
]


class _SklearnHDBSCAN:
    """The reference's ``hdbscan.HDBSCAN`` call surface, backed by sklearn."""

    def __init__(self, min_cluster_size=5, min_samples=None,
                 metric='euclidean', approx_min_span_tree=True,
                 gen_min_span_tree=False, cluster_selection_method='eom',
                 core_dist_n_jobs=4, allow_single_cluster=False):
        from sklearn.cluster import HDBSCAN
        self._h = HDBSCAN(
            min_cluster_size=min_cluster_size, min_samples=min_samples,
            metric=metric, cluster_selection_method=cluster_selection_method,
            allow_single_cluster=allow_single_cluster, n_jobs=core_dist_n_jobs,
            copy=True)

    def fit_predict(self, X):
        # sklearn's HDBSCAN refuses n_samples < 2 etc. the same way the
        # caller guards (X.shape[0] > hdbscan_min + 1), so no extra handling.
        return self._h.fit_predict(np.asarray(X, np.float64))


def load_reference_geometry():
    """Exec the reference's pure geometry functions into a namespace."""
    import cv2
    import scipy.interpolate as interpolate
    import scipy.signal as signal
    from scipy.signal import savgol_filter
    from scipy.sparse import coo_matrix
    from sklearn.cluster import KMeans

    spec = importlib.util.spec_from_file_location('ref_pyloess', PYLOESS)
    pyloess = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pyloess)

    with open(REFERENCE) as fp:
        tree = ast.parse(fp.read())
    wanted = {n for n in ORACLE_FUNCS}
    nodes = [n for n in tree.body
             if isinstance(n, ast.FunctionDef) and n.name in wanted]
    missing = wanted - {n.name for n in nodes}
    assert not missing, f'reference functions not found: {missing}'

    if not hasattr(np, 'int'):        # legacy alias used by the reference
        np.int = int

    hdbscan_shim = types.ModuleType('hdbscan')
    hdbscan_shim.HDBSCAN = _SklearnHDBSCAN

    ns = {
        'np': np, 'cv2': cv2, 'math': math, 'signal': signal,
        'interpolate': interpolate, 'savgol_filter': savgol_filter,
        'coo_matrix': coo_matrix, 'KMeans': KMeans, 'pyloess': pyloess,
        'hdbscan': hdbscan_shim, 'plt': None,
        'sc_register_time': lambda *a, **k: None,
        'print': lambda *a, **k: None,     # silence the inline banners
    }
    mod = ast.Module(body=nodes, type_ignores=[])
    exec(compile(mod, REFERENCE, 'exec'), ns)
    return ns


def reference_geometry(ref, smaps, true_inds, segmentation, segmentation_sel,
                       cp, *, fps, h_orig, w_orig, h_process, w_process):
    """The reference's stage chain (``smartVidCrop.py:2296-2522``) driven by
    the extracted oracle functions.  ``smaps``: (T_sel, H, W) uint8."""
    t_sel = smaps.shape[0]
    vd = {
        'smaps': np.ascontiguousarray(np.transpose(smaps, (1, 2, 0))).copy(),
        'fc_sel': t_sel,
        'fc': int(segmentation[-1][1]) + 1,
        'fr': fps,
        'h_orig': h_orig, 'w_orig': w_orig,
        'h_process': h_process, 'w_process': w_process,
        'segmentation': np.asarray(segmentation, np.int64),
        'segmentation_sel': np.asarray(segmentation_sel, np.int64),
        'true_inds': list(np.asarray(true_inds, np.int64)),
        'border_t': 0, 'border_b': 0, 'border_l': 0, 'border_r': 0,
    }
    vd = ref['sc_calc_dest_size'](vd, cp)

    # threshold (smartVidCrop.py:2335)
    vd = ref['sc_threshold'](vd, cp)

    # clustering + sequential cut-boundary averaging (:2340-2373)
    segm_cuts = [int(s[0]) for s in vd['segmentation_sel']]
    segm_cuts.append(int(vd['segmentation_sel'][-1][1]))
    if cp['clust_filt']:
        clusterer = _SklearnHDBSCAN(
            min_cluster_size=cp['hdbscan_min'],
            min_samples=cp['hdbscan_min_samples'],
            metric='sqeuclidean', cluster_selection_method='eom',
            core_dist_n_jobs=4, allow_single_cluster=True)
        for i in range(vd['fc_sel']):
            vd['smaps'][:, :, i] = ref['sc_clustering_filt'](
                clusterer, vd['smaps'][:, :, i], cp)
            if i < vd['fc_sel'] - 2:
                if any(x in segm_cuts for x in [i - 1, i, i + 1]):
                    a = (vd['smaps'][:, :, i + 1] +
                         vd['smaps'][:, :, i]).astype('float')
                    a = a / 2.0
                    vd['smaps'][:, :, i + 1] = a.astype('int')

    # centers (:2402-2414)
    vd['dx'], vd['dy'] = [], []
    for i in range(vd['fc_sel']):
        if np.sum(vd['smaps'][:, :, i]) > 0:
            dx, dy = ref['sc_find_center_of_mass'](
                vd['smaps'][:, :, i], km=cp['com_km'],
                factor=cp['resize_factor'], bias=cp['value_bias'])
        else:
            dx = dy = None
        vd['dx'].append(dx)
        vd['dy'].append(dy)
    vd = ref['sc_handle_empty_centers'](vd)

    # focus stability (:2425-2473)
    vd['jumps'] = [255] * len(vd['dx'])
    vd['jumps_inds'] = []
    if cp['focus_stability']:
        for i in range(1, vd['fc_sel']):
            mean_jump = ref['sc_check_for_extra_cuts'](
                cp, vd['smaps'][:, :, i],
                vd['dx'][i - 1], vd['dy'][i - 1], vd['dx'][i], vd['dy'][i])
            vd['jumps'][i] = mean_jump
            if mean_jump < cp['foces_stab_t']:
                vd['jumps_inds'].append(i)
        for i in range(0, len(vd['jumps_inds']) - 1):
            start = max(vd['jumps_inds'][i] - 1, 0)
            end = min(vd['jumps_inds'][i + 1] + 1, vd['fc_sel'] - 1)
            dur = ((end - start) * cp['skip']) / vd['fr']
            if dur <= cp['foces_stab_s']:
                for j in range(end - start):
                    vd['dx'][start + j] = vd['dx'][start]
                    vd['dy'][start + j] = vd['dy'][start]

    vd = ref['sc_interpolate'](vd, cp)
    vd = ref['sc_smoothing'](vd, cp['loess_filt'], cp['loess_w_secs'],
                             cp['loess_degree'], cp['lp_filt'],
                             cp['lp_cutoff'], cp['lp_order'])
    vd = ref['sc_compute_bb'](vd, cp)
    if cp['shift_time'] > 0:
        vd = ref['sc_shift_time'](vd, cp['shift_time'])
    return vd


def our_geometry(smaps, true_inds, segmentation, segmentation_sel, cp, *,
                 fps, h_orig, w_orig):
    from retargetvid_tpu.ops.boxes import calc_dest_size
    from retargetvid_tpu.pipeline.geometry import run_geometry

    dest = calc_dest_size(w_orig, h_orig, cp['out_ratio'])
    return run_geometry(
        smaps, true_inds, segmentation, segmentation_sel, cp,
        fps=fps, h_orig=h_orig, w_orig=w_orig,
        w_final=dest['w_final'], h_final=dest['h_final'],
        fc=int(segmentation[-1][1]) + 1, fetch_maps=True)


# --------------------------------------------------------------------------
# corpus


def _blob(h, w, cy, cx, sigma, amp):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    return amp * np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) /
                          (2.0 * sigma ** 2)))


def make_corpus(h=140, w=250, seed=0):
    """Synthetic saliency frame generators.

    Each case is ``(frame_fn, cut_fracs)``: ``frame_fn(u, i)`` builds one
    (H, W) float map for normalized clip time ``u`` in [0, 1] (selected-frame
    index ``i`` for deterministic noise); ``cut_fracs`` are shot-cut
    positions as fractions of the clip.
    """
    rng = np.random.default_rng(seed)
    cases = {}

    # 1. single moving blob (the common case)
    cases['single_blob'] = (lambda u, i: _blob(
        h, w, h * (0.41 + 0.2 * math.sin(u * 7.0)), w * (0.16 + 0.7 * u),
        12, 230), ())

    # 2. two blobs, clear winner
    cases['two_blobs'] = (lambda u, i: _blob(h, w, h * 0.31, w * 0.27, 10, 240)
                          + _blob(h, w, h * 0.69, w * 0.73, 7, 160), ())

    # 3. two blobs near-tie (the hard decision)
    cases['near_tie'] = (lambda u, i: _blob(h, w, h * 0.31, w * 0.29, 9, 210) +
                         _blob(h, w, h * 0.71, w * 0.69, 9,
                               200 + 2 * math.sin(u * 40)), ())

    # 4. blob + speckle noise (noise pixels below cluster size)
    speckle = (rng.random((512, h, w)) > 0.995) * 180.0
    cases['speckle'] = (lambda u, i: _blob(
        h, w, h * 0.52, w * (0.21 + 0.6 * u), 11, 220) +
        speckle[i % 512].astype(np.float32), ())

    # 5. sparse frames below min-points (pass-through regime)
    sparse_pts = rng.integers(0, h * w, (512, 8))

    def sparse(u, i):
        m = np.zeros((h, w), np.float32)
        m.flat[sparse_pts[i % 512]] = 200
        return m
    cases['sparse'] = (sparse, ())

    # 6. interleaved empty frames (empty-center fill path)
    cases['with_empty'] = (
        lambda u, i: np.zeros((h, w), np.float32) if i % 9 == 4
        else _blob(h, w, h * 0.49, w * (0.31 + 0.4 * u), 10, 225), ())

    # 7. a hard cut: blob jumps sides at the cut (boundary averaging path)
    cases['shot_cut'] = (lambda u, i: _blob(
        h, w, h * 0.44, w * (0.26 if u < 0.5 else 0.74), 11, 230), (0.5,))

    # 8. elongated diagonal blob (cluster shape-vs-CCL stress)
    def diag(u, i):
        m = np.zeros((h, w), np.float32)
        for k in range(-25, 26):
            cy = h * 0.51 + k * 1.6
            cx = w * 0.49 + k * 3.0 + 10 * math.sin(u * 9.0)
            if 0 <= cy < h and 0 <= cx < w:
                m += _blob(h, w, cy, cx, 4, 150)
        return m
    cases['diagonal'] = (diag, ())

    return cases


def shot_structure(t_sel_total, cuts, skip, fc):
    """Build (true_inds, segmentation, segmentation_sel) like the ingest."""
    from retargetvid_tpu.ops.scenes import (
        fix_scene_bounds,
        predictions_to_scenes,
        scenes_to_selected,
    )
    from retargetvid_tpu.pipeline.ingest import sample_frames

    probs = np.zeros(fc, np.float32)
    for c in cuts:
        probs[c] = 1.0
    selected, true_inds, map2orig = sample_frames(fc, probs, skip, fc)
    seg = fix_scene_bounds(predictions_to_scenes(probs, 0.1), fc)
    seg_sel = scenes_to_selected(seg, map2orig)
    return selected, true_inds, seg, seg_sel


# --------------------------------------------------------------------------
# metrics


def iou(a, b):
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0, ix2 - ix1 + 1) * max(0, iy2 - iy1 + 1)
    aa = (a[2] - a[0] + 1) * (a[3] - a[1] + 1)
    ab = (b[2] - b[0] + 1) * (b[3] - b[1] + 1)
    return inter / float(aa + ab - inter)


def evaluate(settings_name, cp, corpus, ref, *, fps=30.0,
             h_orig=360, w_orig=640, n_frames=48):
    rows = []
    for name, (frame_fn, cut_fracs) in corpus.items():
        fc = n_frames * cp['skip']
        cuts = [int(cf * fc) for cf in cut_fracs]
        selected, true_inds, seg, seg_sel = shot_structure(
            n_frames, cuts, cp['skip'], fc)
        # Build the saliency volume on the actual selected-frame timeline.
        probe = frame_fn(0.0, 0)
        h, w = probe.shape
        smaps = np.zeros((len(true_inds), h, w), np.float32)
        for j, ti in enumerate(true_inds):
            smaps[j] = frame_fn(ti / max(fc - 1, 1), j)
        smaps = np.clip(smaps, 0, 255).astype(np.uint8)
        vd = reference_geometry(
            ref, smaps.copy(), true_inds, seg, seg_sel, dict(cp),
            fps=fps, h_orig=h_orig, w_orig=w_orig, h_process=h, w_process=w)
        ours = our_geometry(smaps.copy(), true_inds, seg, seg_sel, dict(cp),
                            fps=fps, h_orig=h_orig, w_orig=w_orig)

        # stage 1: post-filter pixel decision agreement
        ref_maps = np.transpose(vd['smaps'], (2, 0, 1))
        our_maps = ours['smaps_filtered']
        agree = float(np.mean((ref_maps > 0) == (our_maps > 0)))

        # stage 2: center-of-mass deviation (selected frames)
        rdx = np.asarray([v if v is not None else np.nan for v in vd['dx']],
                         np.float64)
        rdy = np.asarray([v if v is not None else np.nan for v in vd['dy']],
                         np.float64)
        cdist = np.hypot(ours['dx'][:len(rdx)] - rdx,
                         ours['dy'][:len(rdy)] - rdy)
        cdist = float(np.nanmean(cdist)) if np.any(np.isfinite(cdist)) else 0.0

        # stage 3: final-box IoU (the benchmark metric)
        ref_boxes = np.asarray(vd['bbs'], np.int64)
        our_boxes = np.asarray(ours['boxes'], np.int64)
        n = min(len(ref_boxes), len(our_boxes))
        ious = np.asarray([iou(ref_boxes[i], our_boxes[i]) for i in range(n)])
        rows.append({
            'case': name, 'frames': n, 'pixel_agreement': agree,
            'center_dist_px': cdist,
            'iou_mean': float(ious.mean()), 'iou_min': float(ious.min()),
        })
    return rows


def format_report(all_rows) -> str:
    lines = [
        '# Clustering/geometry decision-parity report',
        '',
        'Generated by `tools/parity_ablation.py` '
        '(see its docstring for methodology).  The oracle is the reference\'s',
        'own stage chain (`smartVidCrop.py:2296-2522`) with its pure functions',
        'AST-extracted and HDBSCAN backed by `sklearn.cluster.HDBSCAN` with the',
        'reference\'s exact parameters (`smartVidCrop.py:2340-2348`).',
        '',
        'Budget: final-box IoU >= 0.995 (BASELINE.md).',
        '',
    ]
    for settings_name, rows in all_rows.items():
        lines.append(f'## {settings_name}')
        lines.append('')
        lines.append('| case | frames | pixel agreement | center dist (px) '
                     '| box IoU mean | box IoU min |')
        lines.append('|---|---|---|---|---|---|')
        for r in rows:
            lines.append(
                f"| {r['case']} | {r['frames']} | {r['pixel_agreement']:.4f} "
                f"| {r['center_dist_px']:.2f} | {r['iou_mean']:.4f} "
                f"| {r['iou_min']:.4f} |")
        mean_iou = float(np.mean([r['iou_mean'] for r in rows]))
        min_iou = float(np.min([r['iou_min'] for r in rows]))
        lines.append('')
        lines.append(f'**Overall: mean IoU {mean_iou:.4f}, '
                     f'worst frame IoU {min_iou:.4f}.**')
        lines.append('')
    return '\n'.join(lines)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--report', default=None,
                        help='write a markdown report to this path')
    parser.add_argument('--frames', type=int, default=48,
                        help='frames per corpus volume')
    parser.add_argument('--settings', choices=['icip', 'ism', 'both'],
                        default='both')
    args = parser.parse_args(argv)

    from retargetvid_tpu.config import sc_init_crop_params

    ref = load_reference_geometry()
    corpus = make_corpus()

    all_rows = {}
    jobs = []
    if args.settings in ('icip', 'both'):
        cp = sc_init_crop_params()
        cp['out_ratio'] = '1:3'
        jobs.append(('ICIP 2021 defaults (1:3)', cp))
    if args.settings in ('ism', 'both'):
        cp = sc_init_crop_params(use_best_settings=True)
        cp['out_ratio'] = '1:3'
        jobs.append(('ISM 2021 best settings (1:3)', cp))

    for name, cp in jobs:
        rows = evaluate(name, cp, corpus, ref, n_frames=args.frames)
        all_rows[name] = rows
        print(f'== {name}')
        for r in rows:
            print(f"  {r['case']:12s} agree={r['pixel_agreement']:.4f} "
                  f"cdist={r['center_dist_px']:6.2f} "
                  f"iou={r['iou_mean']:.4f} (min {r['iou_min']:.4f})")

    report = format_report(all_rows)
    if args.report:
        with open(args.report, 'w') as fp:
            fp.write(report)
        print(f'report -> {args.report}')
    worst = min(r['iou_mean'] for rows in all_rows.values() for r in rows)
    print(f'worst per-case mean IoU: {worst:.4f}')
    return all_rows


if __name__ == '__main__':
    main()
