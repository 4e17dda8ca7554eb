"""Full-orchestrator parity harness (VERDICT round-2 item #1).

Runs the reference's *entire* ``smart_vid_crop`` chain — ingest with real
video decode, TransNet read-batch overlap stitching, frame sampling, the
per-batch saliency off-by-one, HDBSCAN clustering, empty-center repair,
focus stability, interpolation/smoothing, ``sc_compute_bb`` and the results
dict — against this framework's ``smart_vid_crop`` on a corpus of synthetic
multi-shot videos, at BOTH published presets and BOTH benchmark ratios.

Methodology
-----------
1. The reference pipeline (``/root/reference/smartVidCrop.py``) is
   AST-extracted at run time: every top-level function plus the module
   globals it closes over, exec'd with shims for its import-time model
   loading (mock TransNet / mock UNISAL — see below), ``imutils``'s
   ``FileVideoStream`` (not installed here; replaced by a synchronous
   reader with identical EOF semantics: imutils enqueues the final
   not-grabbed ``None`` frame, which is what flips the reference's
   ``bail_out``), and an sklearn-backed HDBSCAN with the reference's exact
   parameters (``smartVidCrop.py:2340-2348``).  This is test-time oracle
   use only; nothing is copied into framework source.
2. Both pipelines share deterministic numpy mock models:
   - shot probs = mean |frame diff| > 20 on the 27x48 stream (prob 0.9),
     suppressed when the previous frame is the zero padding both ingests
     place around read batches;
   - saliency = clip(1.3 * gray - 40).  Both mocks are Lipschitz-smooth in
     the input so the <=1-level difference between our matmul resize and
     cv2's 11-bit fixed-point INTER_LINEAR cannot cascade.
   The orchestration around the models — batch seams, sampling, repair,
   geometry — is exactly what this harness exercises.
3. Each case runs twice on our side: with ``quirk_batch_tail=True``
   (replicating the reference's per-batch saliency off-by-one,
   ``smartVidCrop.py:409-421``) to prove orchestrator equivalence, and with
   the production default (off-by-one fixed) to price that deliberate
   divergence.

Run:  JAX_PLATFORMS=cpu python tools/parity_full.py [--report docs/PARITY.md]
"""

from __future__ import annotations

import argparse
import ast
import gc
import importlib.util
import math
import os
import pathlib
import pickle
import statistics
import subprocess
import sys
import tempfile
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = '/root/reference/smartVidCrop.py'
PYLOESS = '/root/reference/3rd_party_libs/loess/pyloess.py'

WANTED_GLOBALS = {'sc_times', 'trans_threshold', 'TRANSNET_H', 'TRANSNET_W'}


# --------------------------------------------------------------------------
# mock models (shared by both pipelines; deterministic numpy)


def mock_transnet_probs(frames: np.ndarray) -> np.ndarray:
    """Shot probs from the 27x48 uint8 stream: big frame-to-frame change.

    Transitions out of the all-zero padding frames that both ingests place
    around read batches are suppressed (the real TransNet sees edge-padded
    copies there, not zeros — ``transnetv1_handler.py:107-112``).
    """
    f = np.asarray(frames).astype(np.float32)
    probs = np.zeros(f.shape[0], np.float32)
    if f.shape[0] < 2:
        return probs
    d = np.abs(f[1:] - f[:-1]).mean(axis=(1, 2, 3))
    prev_live = f[:-1].max(axis=(1, 2, 3)) > 2.0
    probs[1:] = np.where((d > 20.0) & prev_live, 0.9, 0.0)
    return probs


def mock_saliency_maps(frames: np.ndarray) -> np.ndarray:
    """(T, H, W, 3) uint8 -> (T, H, W) uint8 'saliency' = brightness ramp."""
    f = np.asarray(frames).astype(np.float32)
    gray = f.mean(axis=-1)
    return np.clip(1.3 * gray - 40.0, 0.0, 255.0).astype(np.uint8)


class _MockShotTransNet:
    """The reference's ``transnet_model.predict_frames`` surface."""

    def predict_frames(self, frames):
        return mock_transnet_probs(frames)


def _mock_unisal_handler() -> types.ModuleType:
    mod = types.ModuleType('unisal_handler')

    def predictions_from_memory_nuint8_np(model, images, _unused, _unused2):
        maps = mock_saliency_maps(np.asarray(images))       # (N, H, W)
        return np.transpose(maps, (1, 2, 0))                # reference (H,W,N)

    mod.predictions_from_memory_nuint8_np = predictions_from_memory_nuint8_np
    return mod


class _SyncFileVideoStream:
    """imutils ``FileVideoStream`` semantics, synchronously.

    imutils's decode thread enqueues every ``stream.read()`` result —
    including the final not-grabbed ``None`` — so the consumer loop sees one
    ``None`` frame at EOF (that is what sets the reference's ``bail_out``,
    ``smartVidCrop.py:315-317``) and ``more()`` is True until that ``None``
    is consumed.
    """

    def __init__(self, path, *a, **k):
        import cv2
        self._cap = cv2.VideoCapture(path)
        self._done = False

    def start(self):
        return self

    def more(self):
        return not self._done

    def read(self):
        ok, frame = self._cap.read()
        if not ok:
            self._done = True
            return None
        return frame

    def stop(self):
        self._cap.release()


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
        return self._h.fit_predict(np.asarray(X, np.float64))


# --------------------------------------------------------------------------
# reference module extraction


def load_reference_pipeline():
    """Exec the reference's full function surface with model/IO shims."""
    import cv2
    import scipy.interpolate as interpolate
    import scipy.signal as signal
    from scipy.signal import medfilt, savgol_filter
    from scipy.sparse import coo_matrix
    from sklearn.cluster import KMeans

    spec = importlib.util.spec_from_file_location('ref_pyloess', PYLOESS)
    pyloess = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pyloess)

    with open(REFERENCE) as fp:
        tree = ast.parse(fp.read())
    nodes = []
    for n in tree.body:
        if isinstance(n, ast.FunctionDef):
            nodes.append(n)
        elif isinstance(n, ast.Assign):
            targets = [t.id for t in n.targets if isinstance(t, ast.Name)]
            if any(t in WANTED_GLOBALS for t in targets):
                nodes.append(n)

    for legacy, builtin in (('int', int), ('float', float), ('bool', bool)):
        if not hasattr(np, legacy):
            setattr(np, legacy, builtin)

    hdbscan_shim = types.ModuleType('hdbscan')
    hdbscan_shim.HDBSCAN = _SklearnHDBSCAN

    ns = {
        'np': np, 'cv2': cv2, 'math': math, 'os': os, 'sys': sys,
        'time': time, 'pickle': pickle, 'gc': gc, 'statistics': statistics,
        'pathlib': pathlib, 'subprocess': subprocess,
        'signal': signal, 'interpolate': interpolate,
        'savgol_filter': savgol_filter, 'medfilt': medfilt,
        'coo_matrix': coo_matrix, 'KMeans': KMeans, 'pyloess': pyloess,
        'hdbscan': hdbscan_shim, 'plt': None, 'ffmpeg': None,
        'FileVideoStream': _SyncFileVideoStream,
        'transnet_model': _MockShotTransNet(),
        'unisal_handler': _mock_unisal_handler(),
        'unisal_model': None,
        'print': lambda *a, **k: None,
        'input': lambda *a, **k: '',
    }
    mod = ast.Module(body=nodes, type_ignores=[])
    exec(compile(mod, REFERENCE, 'exec'), ns)
    return ns


# --------------------------------------------------------------------------
# synthetic video corpus


def _render_frame(h, w, blobs, bg):
    """One RGB frame: Gaussian blobs (cy, cx, sigma, amp) on flat bg."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.full((h, w), float(bg), np.float32)
    for cy, cx, sigma, amp in blobs:
        img += amp * np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) /
                              (2.0 * sigma ** 2)))
    img = np.clip(img, 0, 255).astype(np.uint8)
    return np.stack([img, img, img], axis=-1)


def make_corpus(out_dir, h=360, w=640, fps=30.0):
    """Write the synthetic videos; returns {name: (path, overrides)}."""
    import cv2

    def write(name, frame_fns):
        path = os.path.join(out_dir, name + '.mp4')
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'),
                             fps, (w, h))
        for fn in frame_fns:
            vw.write(fn[:, :, ::-1])          # RGB -> BGR for the writer
        vw.release()
        return path

    def blob_track(n, cy_fn, cx_fn, sigma=30, amp=220, bg=12, extra=None):
        frames = []
        for i in range(n):
            u = i / max(n - 1, 1)
            blobs = [(cy_fn(u) * h, cx_fn(u) * w, sigma, amp)]
            if extra is not None:
                blobs.extend(extra(u))
            frames.append(_render_frame(h, w, blobs, bg))
        return frames

    cases = {}

    # Every case is exactly 156 frames so all runs land in ONE geometry
    # compile bucket per (preset, ratio) — the harness host is 1 vCPU and
    # XLA CPU compiles of the fused chain are minutes each (one-time,
    # persisted by the compilation cache).

    # 1. one shot, one smoothly-moving blob: the common path.
    cases['single_shot'] = (write('single_shot', blob_track(
        156, lambda u: 0.42 + 0.12 * math.sin(u * 6.0),
        lambda u: 0.18 + 0.62 * u)), {})

    # 2. two shots: background brightness change drives the mock shot prob.
    fr = blob_track(78, lambda u: 0.45, lambda u: 0.15 + 0.3 * u, bg=10)
    fr += blob_track(78, lambda u: 0.55, lambda u: 0.85 - 0.3 * u, bg=60)
    cases['two_shot'] = (write('two_shot', fr), {})

    # 3. four shots incl. a 20-frame one (repeat-interp + ISM focus freeze).
    fr = blob_track(60, lambda u: 0.4, lambda u: 0.2 + 0.4 * u, bg=10)
    fr += blob_track(20, lambda u: 0.6, lambda u: 0.75, bg=55)
    fr += blob_track(50, lambda u: 0.5 - 0.1 * u, lambda u: 0.3 + 0.5 * u,
                     bg=15)
    fr += blob_track(26, lambda u: 0.45, lambda u: 0.5 - 0.25 * u, bg=65)
    cases['multi_shot'] = (write('multi_shot', fr), {})

    # 4. read-batch seams: 156 frames at read_batch=48 -> 4 flushes.
    cases['batch_seam'] = (write('batch_seam', blob_track(
        156, lambda u: 0.5 + 0.08 * math.sin(u * 9.0),
        lambda u: 0.8 - 0.6 * u)), {'read_batch': 48})

    # 5. a dark gap (frames 60-80): empty maps -> empty-center repair.
    fr = blob_track(60, lambda u: 0.5, lambda u: 0.2 + 0.3 * u, bg=12)
    fr += [_render_frame(h, w, [], 12) for _ in range(20)]
    fr += blob_track(76, lambda u: 0.45, lambda u: 0.6 + 0.2 * u, bg=12)
    cases['with_empty'] = (write('with_empty', fr), {})

    # 6. two blobs, clear winner by mass: cluster selection inside the
    #    full chain.
    cases['two_blobs'] = (write('two_blobs', blob_track(
        156, lambda u: 0.38, lambda u: 0.25 + 0.35 * u, sigma=34, amp=225,
        extra=lambda u: [(0.72 * h, (0.8 - 0.25 * u) * w, 20, 170)])), {})

    return cases


# --------------------------------------------------------------------------
# runners


def run_reference(ref, video_path, cp):
    ref['sc_init_time']()
    vd, results = ref['smart_vid_crop'](
        video_path, dict(cp), demo_fn='', final_vid_fn='', plots_fn='',
        frames_dir='', temp_path=None, verbose=False, save_vid=False)
    return vd, results


def run_ours(video_path, cp, quirk_batch_tail):
    from retargetvid_tpu.pipeline.crop import smart_vid_crop
    from retargetvid_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    def transnet_fn(buf):
        return mock_transnet_probs(np.asarray(buf))

    def saliency_fn(frames):
        return mock_saliency_maps(np.asarray(frames))

    cp = dict(cp)
    cp['tpu_fix_batch_tail'] = not quirk_batch_tail
    return smart_vid_crop(video_path, cp, save_vid=False,
                          transnet_fn=transnet_fn, saliency_fn=saliency_fn)


def iou(a, b):
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0, ix2 - ix1 + 1) * max(0, iy2 - iy1 + 1)
    aa = (a[2] - a[0] + 1) * (a[3] - a[1] + 1)
    ab = (b[2] - b[0] + 1) * (b[3] - b[1] + 1)
    return inter / float(aa + ab - inter)


def boxes_txt(bbs):
    """The benchmark txt emission (``smartVidCrop.py:2783-2785``)."""
    return ''.join('%d,%d,%d,%d\n' % (b[0], b[1], b[2], b[3]) for b in bbs)


def compare(ref_vd, ref_res, our_vd, our_res):
    out = {}
    out['true_inds_equal'] = (
        list(map(int, ref_vd['true_inds'])) ==
        list(map(int, our_vd['true_inds'])))
    out['segmentation_equal'] = np.array_equal(
        np.asarray(ref_vd['segmentation']),
        np.asarray(our_vd['segmentation']))
    out['fc_equal'] = int(ref_vd['fc']) == int(our_vd['fc'])

    ref_boxes = np.asarray(ref_vd['bbs'], np.int64)
    our_boxes = np.asarray(our_vd['bbs'], np.int64)
    out['n_ref'], out['n_ours'] = len(ref_boxes), len(our_boxes)
    n = min(len(ref_boxes), len(our_boxes))
    ious = np.array([iou(ref_boxes[i], our_boxes[i]) for i in range(n)])
    out['iou_mean'] = float(ious.mean()) if n else 0.0
    out['iou_min'] = float(ious.min()) if n else 0.0
    out['txt_equal'] = (out['n_ref'] == out['n_ours'] and
                        boxes_txt(ref_boxes) == boxes_txt(our_boxes))

    out['info_equal'] = ref_res['info'] == our_res['info']
    out['cuts_clust_equal'] = (
        ref_res.get('cuts_clust') == our_res.get('cuts_clust'))
    ref_tkeys = {k for k in ref_res if k.startswith('t_')}
    our_tkeys = {k for k in our_res if k.startswith('t_')}
    out['missing_t_keys'] = sorted(ref_tkeys - our_tkeys)
    return out


def evaluate(corpus, ref, presets, ratios):
    rows = []
    for case, (path, overrides) in corpus.items():
        for preset_name, base_cp in presets:
            for ratio in ratios:
                cp = dict(base_cp)
                cp['out_ratio'] = ratio
                cp.update(overrides)
                ref_vd, ref_res = run_reference(ref, path, cp)
                for mode, quirk in (('quirk', True), ('fixed', False)):
                    our_vd, our_res = run_ours(path, cp, quirk)
                    c = compare(ref_vd, ref_res, our_vd, our_res)
                    c.update(case=case, preset=preset_name, ratio=ratio,
                             mode=mode)
                    rows.append(c)
                    print(f"{case:12s} {preset_name:4s} {ratio} {mode:5s} "
                          f"iou={c['iou_mean']:.4f} (min {c['iou_min']:.4f}) "
                          f"txt_eq={c['txt_equal']} "
                          f"ti_eq={c['true_inds_equal']} "
                          f"seg_eq={c['segmentation_equal']}",
                          flush=True)
    return rows


def format_report(rows) -> str:
    lines = [
        '## Full-orchestrator parity',
        '',
        'Generated by `tools/parity_full.py` (see its docstring).  The',
        'oracle is the reference\'s **whole** `smart_vid_crop` chain — real',
        'video decode, `read_and_segment_video` batch stitching and',
        'sampling, HDBSCAN filtering, empty-center repair, focus stability,',
        'interpolation/smoothing, `sc_compute_bb` and txt emission',
        '(`smartVidCrop.py:2218-2614`, `:234-556`, `:2778-2785`) — with',
        'deterministic mock models shared by both pipelines.',
        '',
        '`mode=quirk` replicates the reference\'s per-batch saliency',
        'off-by-one (the PRODUCTION DEFAULT — the published',
        '`results/smartvidcrop` boxes include it); `mode=fixed` is the',
        'opt-in `tpu_fix_batch_tail=True` improvement (real final-frame',
        'saliency) and prices that divergence.',
        '',
        '| case | preset | ratio | mode | box IoU mean | box IoU min '
        '| txt equal | true_inds eq | seg eq | info eq |',
        '|---|---|---|---|---|---|---|---|---|---|',
    ]
    for r in rows:
        lines.append(
            f"| {r['case']} | {r['preset']} | {r['ratio']} | {r['mode']} "
            f"| {r['iou_mean']:.4f} | {r['iou_min']:.4f} "
            f"| {'yes' if r['txt_equal'] else 'no'} "
            f"| {'yes' if r['true_inds_equal'] else 'no'} "
            f"| {'yes' if r['segmentation_equal'] else 'no'} "
            f"| {'yes' if r['info_equal'] else 'no'} |")
    for mode in ('quirk', 'fixed'):
        sel = [r for r in rows if r['mode'] == mode]
        mean_iou = float(np.mean([r['iou_mean'] for r in sel]))
        min_iou = float(np.min([r['iou_min'] for r in sel]))
        n_txt = sum(r['txt_equal'] for r in sel)
        lines.append('')
        lines.append(f'**mode={mode}: mean IoU {mean_iou:.4f}, worst frame '
                     f'{min_iou:.4f}, byte-identical txt {n_txt}/{len(sel)} '
                     'cases.**')
    missing = sorted({k for r in rows for k in r['missing_t_keys']})
    lines.append('')
    lines.append(f"Timing keys present in the reference results dict but "
                 f"absent from ours: {missing if missing else 'none'}.")
    lines.append('')
    return '\n'.join(lines)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--report', default=None)
    parser.add_argument('--video-dir', default=None,
                        help='reuse/keep corpus videos here')
    parser.add_argument('--settings', choices=['icip', 'ism', 'both'],
                        default='both')
    parser.add_argument('--ratios', default='1:3,3:1')
    args = parser.parse_args(argv)

    from retargetvid_tpu.config import sc_init_crop_params

    presets = []
    if args.settings in ('icip', 'both'):
        presets.append(('ICIP', sc_init_crop_params()))
    if args.settings in ('ism', 'both'):
        presets.append(('ISM', sc_init_crop_params(use_best_settings=True)))
    ratios = args.ratios.split(',')

    ref = load_reference_pipeline()
    vdir = args.video_dir or tempfile.mkdtemp(prefix='parity_corpus_')
    os.makedirs(vdir, exist_ok=True)
    corpus = make_corpus(vdir)

    rows = evaluate(corpus, ref, presets, ratios)

    if args.report:
        report = format_report(rows)
        path = args.report
        marker = '## Full-orchestrator parity'
        if os.path.isfile(path):
            with open(path) as fp:
                old = fp.read()
            head = old.split(marker)[0].rstrip()
            content = (head + '\n\n' + report) if head else report
        else:
            content = report
        with open(path, 'w') as fp:
            fp.write(content)
        print(f'report -> {path}')

    worst_quirk = min(r['iou_mean'] for r in rows if r['mode'] == 'quirk')
    print(f'worst per-case mean IoU (quirk mode): {worst_quirk:.4f}')
    return rows


if __name__ == '__main__':
    main()
