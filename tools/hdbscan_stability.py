"""HDBSCAN-oracle stability experiment (VERDICT round-2 item #2 evidence).

Question: can the ISM-preset clustering divergence on adversarial speckle
(``docs/PARITY.md``) be closed by a better density-linking emulation?

Method: three measurements on the ablation corpus' speckle case at the ISM
settings (threshold 90, resize_factor 4, min_cluster_size 5, min_samples 3,
eom, allow_single_cluster — ``smartVidCrop.py:2340-2348``):

1. **Linking-scheme sweep** — decision parity of CCL winners against the
   HDBSCAN oracle for: fixed 1-px / 2-px bridges, single-scale density
   gating (active = pixels with >= min_samples neighbors within lambda,
   linked at lambda), and per-pixel core-radius disk union (mutual-
   reachability style).  Metric: weighted-center distance of the kept
   pixels, per frame.
2. **Oracle translation instability** — the oracle applied to the SAME
   field translated by ONE pixel (semantically a no-op): change in kept-
   pixel count and (roll-compensated) center.
3. The comparison: if (2) >= (1), the residual divergence is inside the
   oracle's own chaos and no deterministic emulation can close it.

Result (written to the report): every linking scheme plateaus at
~2.7 px mean center distance, while the oracle's self-distance under a
1-px translation is mean ~3.6 px (kept-pixel count swings by a median of
~374 px, max ~2400) — the fixed 1-px bridge already sits inside the
oracle's noise band, so it stays the default
(``pipeline/geometry.py:GeometryConfig.from_crop_params``).

Run:  python tools/hdbscan_stability.py [--report]
(pure numpy/scipy/sklearn — no JAX, safe to run alongside other jobs)
"""

from __future__ import annotations

import argparse
import math
import os
import statistics
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _setup():
    from parity_ablation import (
        _SklearnHDBSCAN,
        load_reference_geometry,
        make_corpus,
    )

    from retargetvid_tpu.config import sc_init_crop_params

    ref = load_reference_geometry()
    cp = sc_init_crop_params(use_best_settings=True)
    corpus = make_corpus()

    def oracle(thr):
        cl = _SklearnHDBSCAN(
            min_cluster_size=cp['hdbscan_min'],
            min_samples=cp['hdbscan_min_samples'], metric='sqeuclidean',
            cluster_selection_method='eom', core_dist_n_jobs=4,
            allow_single_cluster=True)
        return ref['sc_clustering_filt'](cl, thr.copy(), cp)

    return cp, corpus, oracle


def _threshold_frames(corpus, cp, case='speckle', n_frames=24):
    fn, _ = corpus[case]
    out = []
    for j in range(n_frames):
        m = np.clip(fn(j / (n_frames - 1), j), 0, 255).astype(np.uint8)
        out.append(np.where(m < cp['t_threshold'], 0, m).astype(np.uint8))
    return np.stack(out)


def _center(a):
    tot = a.sum()
    if tot <= 0:
        return None
    yy, xx = np.mgrid[0:a.shape[0], 0:a.shape[1]]
    return (xx * a).sum() / tot, (yy * a).sum() / tot


def ccl_filter(thr, cp, scheme):
    """The clustering stage with a pluggable CCL linking scheme (numpy)."""
    import cv2
    from scipy import ndimage

    mcs = cp['hdbscan_min']
    ms = cp['hdbscan_min_samples'] or mcs
    sm = cv2.resize(thr, None, fx=1 / cp['resize_factor'],
                    fy=1 / cp['resize_factor'],
                    interpolation=cv2.INTER_LINEAR)
    mask = sm > 0
    if mask.sum() <= mcs + 1:
        return thr
    m = mask.astype(np.float32)

    def boxcnt(r):
        k = 2 * r + 1
        return cv2.filter2D(m, -1, np.ones((k, k), np.float32),
                            borderType=cv2.BORDER_CONSTANT) - m

    kind, p = scheme
    if kind == 'bridge':
        link = cv2.dilate(m, np.ones((2 * p + 1,) * 2, np.uint8)) > 0.5
    elif kind == 'lam':
        active = (boxcnt(p) >= ms) & mask
        link = cv2.dilate(active.astype(np.uint8),
                          np.ones((2 * p + 1,) * 2, np.uint8)) > 0
        link = link | mask
    elif kind == 'mincore':
        core = np.full(m.shape, p + 1, np.int32)
        for r in range(p, 0, -1):
            core = np.where(boxcnt(r) >= ms, r, core)
        link = mask.copy()
        for lam in range(1, p + 1):
            active = (core <= lam) & mask
            link = link | (cv2.dilate(active.astype(np.uint8),
                                      np.ones((lam + 1,) * 2, np.uint8)) > 0)
    else:
        raise ValueError(kind)

    labels, _ = ndimage.label(link, structure=np.ones((3, 3)))
    labels = np.where(mask, labels, 0)
    best, bestw = 0, -1.0
    for lab in np.unique(labels):
        if lab == 0:
            continue
        sel = labels == lab
        if sel.sum() < mcs:
            continue
        w = (sm[sel].astype(float).sum() if cp['select_sum'] == 1
             else float(sm[sel].max()))
        if w > bestw:
            best, bestw = lab, w
    if best == 0:
        out_small = sm
    else:
        out_small = np.where(labels == best, sm, 0).astype(np.uint8)
        if cp['op_close']:
            out_small = cv2.morphologyEx(out_small, cv2.MORPH_CLOSE,
                                         np.ones((5, 5), np.uint8))
    return cv2.resize(out_small, (thr.shape[1], thr.shape[0]),
                      interpolation=cv2.INTER_LINEAR)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--report', action='store_true',
                        help='print a markdown section for docs/PARITY.md')
    args = parser.parse_args(argv)

    cp, corpus, oracle = _setup()
    thr = _threshold_frames(corpus, cp)
    n = len(thr)
    orc = [oracle(thr[i]) for i in range(n)]

    schemes = [('bridge', 1), ('bridge', 2), ('lam', 2), ('lam', 3),
               ('mincore', 3), ('mincore', 4)]
    sweep = {}
    for scheme in schemes:
        ds = []
        for i in range(n):
            co = _center(ccl_filter(thr[i], cp, scheme).astype(float))
            cr = _center(orc[i].astype(float))
            if co and cr:
                ds.append(math.hypot(co[0] - cr[0], co[1] - cr[1]))
        sweep[scheme] = (float(np.mean(ds)), float(np.max(ds)))
        print(f'{scheme}: cdist mean {np.mean(ds):.2f} max {np.max(ds):.2f}',
              flush=True)

    deltas, selfds = [], []
    for i in range(n):
        rolled = oracle(np.roll(thr[i], 1, axis=1))
        deltas.append(abs(int((orc[i] > 0).sum()) - int((rolled > 0).sum())))
        ca, cb = _center(orc[i].astype(float)), _center(rolled.astype(float))
        if ca and cb:
            selfds.append(math.hypot(ca[0] - (cb[0] - 1), ca[1] - cb[1]))
    print(f'oracle 1-px-roll: kept-px |delta| median '
          f'{statistics.median(deltas):.0f} max {max(deltas)}; '
          f'self center-dist mean {np.mean(selfds):.2f} '
          f'max {np.max(selfds):.2f}')

    if args.report:
        print()
        print('## HDBSCAN-oracle stability (ISM speckle)')
        print()
        print('| linking scheme | center dist vs oracle (mean px) | (max) |')
        print('|---|---|---|')
        for scheme, (dm, dx) in sweep.items():
            print(f'| {scheme} | {dm:.2f} | {dx:.2f} |')
        print(f'| **oracle vs itself, input rolled 1 px** '
              f'| **{np.mean(selfds):.2f}** | **{np.max(selfds):.2f}** |')
        print()
        print('Every deterministic linking scheme plateaus at the same '
              'floor, and the oracle moves MORE under a semantically-null '
              '1-px translation than any scheme diverges from it — the '
              'residual ISM speckle divergence is inside the oracle\'s own '
              'chaos (EOM cluster selection on near-uniform random '
              'fields), so the fixed 1-px bridge stays the default.')
    return sweep


if __name__ == '__main__':
    main()
