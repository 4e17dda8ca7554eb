"""Direct one-shot-vs-reference parity with IDENTICAL real models.

`tools/parity_full.py` proves ORCHESTRATION parity (our sequential
`smart_vid_crop` vs the reference's, shared deterministic mock models) and
the model conversions are proven separately; the flagship one-dispatch
program (`pipeline/oneshot.py`) is tied in only transitively
(oneshot == sequential in `tests/test_oneshot.py` /
`tests/test_cli_benchmark_sharded.py`).  This tool closes the link
DIRECTLY: the SAME randomly-initialized flax TransNetV1 + UNISAL are
injected into

- the AST-extracted reference chain (as its ``transnet_model`` /
  ``unisal_handler`` surfaces — the exact boundaries the real reference
  wires its TF1/torch models into, ``smartVidCrop.py:49-83``), and
- our ``OneShotClipProgram`` (which runs them inside the single fused
  device program),

and the final per-frame crop boxes are compared.  Unlike the mock-model
harness, the models here are NOT Lipschitz-tamed: the <=1-level difference
between the reference's cv2 ingest resizes and our on-device matmul
resizes feeds real (random-weight) networks, so this also prices the
model-in-the-loop sensitivity of the whole composition.  Shot structure
comes from the real TransNet on both sides; a case whose random-weight cut
pattern exceeds the one-shot static bounds is reported as OVERRUN (the
production path falls back to the 2-dispatch chain there).

Run:  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/parity_oneshot.py \
          [--report docs/PARITY.md] [--cases single_shot,multi_shot,...]
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys
import tempfile
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_spec = importlib.util.spec_from_file_location(
    'parity_full', os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                'parity_full.py'))
pf = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(pf)

DEFAULT_CASES = 'single_shot,multi_shot,with_empty'


class _RealTransNet:
    """Reference ``transnet_model.predict_frames`` surface -> our jitted
    window-plan predictor (plan proven equal to the reference handler's,
    ``tests/test_models_transnet.py``)."""

    def __init__(self, fn):
        self._fn = fn

    def predict_frames(self, frames):
        return np.asarray(self._fn(np.asarray(frames)))


def _real_unisal_handler(saliency_fn) -> types.ModuleType:
    mod = types.ModuleType('unisal_handler')

    def predictions_from_memory_nuint8_np(model, images, _u1, _u2):
        maps = np.asarray(saliency_fn(np.asarray(images)))   # (N, H, W)
        return np.transpose(maps, (1, 2, 0))                 # ref: (H, W, N)

    mod.predictions_from_memory_nuint8_np = predictions_from_memory_nuint8_np
    return mod


def build_models(seed: int = 0, sharpen: float = 48.0, tn_bias: float = 0.0,
                 tn_fullseq: bool = False, unisal_weights: str = '',
                 transnet_weights: str = ''):
    """(transnet_fn, saliency_fn, oneshot program) sharing ONE set of
    randomly-initialized weights.

    ``sharpen`` scales the per-source ``adaptation`` 1x1 readout convs:
    a raw random init produces near-uniform post-softmax maps (spread
    ~0.14 in logit space, so after the predictor's max-normalize EVERY
    pixel clears the reference's fixed t_threshold and the comparison
    degenerates to full-frame boxes while the reference-side HDBSCAN
    chews 35k points/frame).  Everything downstream of the adaptation
    conv is linear until the spatial log-softmax, so scaling it by gamma
    sharpens the SAME random structure into concentrated,
    input-dependent blobs — both pipelines share the sharpened weights,
    so parity semantics are unchanged.

    ``tn_bias`` adds ``[+b, -b]`` to the final TransNet dense bias
    (shifting every transition logit down by 2b): a raw random init
    fires "cut" on ~half the frames, which no real checkpoint does and
    which overflows the one-shot static pick bound.  Both pipelines
    share the biased weights (see :func:`calibrate_tn_bias`).

    ``unisal_weights`` / ``transnet_weights`` (the real-weight preflight
    mode, docs/PREFLIGHT.md §4): load the released checkpoints instead of
    random inits — ``unisal_weights`` is the torch ``weights_best.pth``
    (converted at load time via ``models.torch_import``),
    ``transnet_weights`` the ``tools/convert_transnet.py`` pickle.  The
    random-init calibrations (``sharpen``, ``tn_bias``) never apply to
    real weights."""
    import jax
    import jax.numpy as jnp

    from retargetvid_tpu.models.transnet import TransNetPredictor, TransNetV1
    from retargetvid_tpu.models.unisal import UNISAL
    from retargetvid_tpu.pipeline.oneshot import OneShotClipProgram
    from retargetvid_tpu.pipeline.saliency import SaliencyPredictor
    from retargetvid_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    tn_model = TransNetV1()
    if transnet_weights:
        import pickle
        with open(transnet_weights, 'rb') as fp:
            tn_params = pickle.load(fp)
        print(f'loaded TransNet weights from {transnet_weights}', flush=True)
    else:
        tn_params = tn_model.init(jax.random.PRNGKey(seed),
                                  jnp.zeros((1, 8, 27, 48, 3), jnp.uint8))
        if tn_bias:
            tn_params['params']['dense2']['bias'] = jnp.asarray(
                [tn_bias, -tn_bias])
    un_model = UNISAL()
    if unisal_weights:
        import torch

        from retargetvid_tpu.models.torch_import import load_unisal_variables
        sd = torch.load(unisal_weights, map_location='cpu')
        if isinstance(sd, dict) and 'model_state_dict' in sd:
            sd = sd['model_state_dict']
        un_vars = load_unisal_variables(un_model, sd)
        print(f'loaded UNISAL weights from {unisal_weights}', flush=True)
    else:
        un_vars = un_model.init(jax.random.PRNGKey(seed),
                                jnp.zeros((1, 1, 224, 416, 3), jnp.float32),
                                static=True)
        if sharpen != 1.0:
            un_vars = jax.tree_util.tree_map(lambda x: x, un_vars)  # shallow
            params = un_vars['params']
            for name, leaf in params.items():
                if name.startswith('adaptation'):
                    params[name] = jax.tree_util.tree_map(
                        lambda x: x * sharpen, leaf)
    transnet_fn = TransNetPredictor(tn_model, tn_params)
    predictor = SaliencyPredictor(variables=un_vars, model=un_model)
    program = OneShotClipProgram(tn_model, tn_params, variables=un_vars,
                                 model=un_model, dtype=jnp.float32,
                                 tn_fullseq=tn_fullseq)
    return transnet_fn, predictor.predict, program


def calibrate_tn_bias(transnet_fn, corpus, max_cut_frames: int = 6,
                      margin: float = 1.5):
    """Pick a dense-bias shift that tames the random TransNet ROBUSTLY.

    The final dense produces 2-class softmax logits, so adding ``[b, -b]``
    to its bias shifts every transition logit-difference down by ``2b`` —
    a MONOTONE per-frame transform of the probs.  Robustness matters more
    than the cut count: the reference chain feeds the net cv2-resized
    frames while the one-shot program resizes on device, so a frame whose
    logit sits within the resize-path perturbation of the threshold flips
    between the two sides (a random-init TransNet's content response is
    ~0.03 logits — far below that perturbation).  The threshold is
    therefore placed only in a ``2*margin``-wide GAP of the pooled logit
    distribution (real content cuts spike well above the noise cluster);
    if no such gap exists among the top ``max_cut_frames`` order
    statistics, everything is pushed ``margin`` below threshold — both
    sides then agree on a single uncut shot, and shot-structure parity is
    carried by the mock-model harness (tools/parity_full.py) instead.
    """
    import cv2

    from retargetvid_tpu.pipeline.ingest import TRANS_THRESHOLD
    thr_logit = float(np.log(TRANS_THRESHOLD) - np.log1p(-TRANS_THRESHOLD))

    floors, tops = [], []
    for case, (path, _ov) in sorted(corpus.items()):
        raw, _fps = decode_rgb(path)
        tn = np.stack([cv2.resize(f, (48, 27)) for f in raw])
        p = np.clip(np.asarray(transnet_fn(tn), np.float64), 1e-9, 1 - 1e-9)
        d = np.log(p) - np.log1p(-p)
        hi = np.sort(d)[::-1]
        print(f'probe {case:12s}: frames>thr unbiased '
              f'{int((p > TRANS_THRESHOLD).sum()):3d}, top logits '
              f'{np.round(hi[:max_cut_frames + 2], 3).tolist()}', flush=True)
        floors.append(hi)
        tops.append(hi[0])
    # Candidate thresholds: midpoints of gaps >= 2*margin among the pooled
    # top-k order statistics, identical across all cases by construction
    # (one global shift).  k=0 (no cuts anywhere) is always available.
    pooled = np.sort(np.concatenate([h[:max_cut_frames + 1]
                                     for h in floors]))[::-1]
    for k in range(max_cut_frames, 0, -1):
        t = pooled[k - 1] - margin            # just below the k-th largest
        ok = all((h >= t + margin).sum() <= max_cut_frames
                 and not ((h > t - margin) & (h < t + margin)).any()
                 for h in floors)
        if ok:
            print(f'calibrated: threshold in a >= {2 * margin:.1f}-logit '
                  f'gap, {k} pooled cut frames kept', flush=True)
            return float((t - thr_logit) / 2.0)
    t = max(tops) + margin
    print('calibrated: no robust gap — shifting ALL frames below threshold '
          '(single-shot regime on both sides)', flush=True)
    # Fire iff (d - 2b) > thr_logit; placing the cutover at d = t needs
    # b = (t - thr_logit) / 2 (TRANS_THRESHOLD is 0.1, not 0.5).
    return float((t - thr_logit) / 2.0)


def decode_rgb(path):
    import cv2
    cap = cv2.VideoCapture(path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame[:, :, ::-1])
    cap.release()
    return np.ascontiguousarray(np.stack(frames)), float(fps)


def run_oneshot(program, raw, fps, cp):
    import jax.numpy as jnp

    from retargetvid_tpu.ops.boxes import calc_dest_size

    h, w = raw.shape[1], raw.shape[2]
    dest = calc_dest_size(w, h, cp['out_ratio'])
    return program.run(jnp.asarray(raw), dict(cp), fps=fps,
                       w_final=dest['w_final'], h_final=dest['h_final'])


def evaluate(corpus, ref, presets, ratios, program):
    rows = []
    for case, (path, overrides) in corpus.items():
        raw, fps = decode_rgb(path)
        for preset_name, base_cp in presets:
            for ratio in ratios:
                cp = dict(base_cp)
                cp['out_ratio'] = ratio
                cp.update(overrides)
                ref_vd, _ = pf.run_reference(ref, path, cp)
                row = dict(case=case, preset=preset_name, ratio=ratio)
                try:
                    out = run_oneshot(program, raw, fps, cp)
                except ValueError as e:
                    row.update(overrun=True, iou_mean=float('nan'),
                               iou_min=float('nan'), n_seg_ref=len(
                                   ref_vd['segmentation']), n_seg_ours=-1)
                    rows.append(row)
                    print(f'{case:12s} {preset_name:4s} {ratio} OVERRUN '
                          f'({e})', flush=True)
                    continue
                ref_boxes = np.asarray(ref_vd['bbs'], np.int64)
                our_boxes = np.asarray(out['boxes'], np.int64)
                n = min(len(ref_boxes), len(our_boxes))
                ious = np.array([pf.iou(ref_boxes[i], our_boxes[i])
                                 for i in range(n)])
                row.update(
                    overrun=False,
                    iou_mean=float(ious.mean()) if n else 0.0,
                    iou_min=float(ious.min()) if n else 0.0,
                    n_ref=len(ref_boxes), n_ours=len(our_boxes),
                    n_seg_ref=len(ref_vd['segmentation']),
                    n_seg_ours=int(out['n_segments']))
                rows.append(row)
                print(f"{case:12s} {preset_name:4s} {ratio} "
                      f"iou={row['iou_mean']:.4f} (min {row['iou_min']:.4f}) "
                      f"segs {row['n_seg_ref']}/{row['n_seg_ours']} "
                      f"frames {row['n_ref']}/{row['n_ours']}", flush=True)
    return rows


def format_report(rows) -> str:
    lines = [
        '## Direct one-shot parity (real models in the loop)',
        '',
        'Generated by `tools/parity_oneshot.py`: the reference\'s whole',
        '`smart_vid_crop` chain and our ONE-dispatch `OneShotClipProgram`',
        'share one set of randomly-initialized flax TransNetV1 + UNISAL',
        'weights (the reference calls them through its own model',
        'surfaces); final boxes compared directly.  Unlike the mock-model',
        'harness this includes real-network sensitivity to the <=1-level',
        'ingest-resize differences.',
        '',
        '| case | preset | ratio | box IoU mean | box IoU min | segments '
        '(ref/ours) |',
        '|---|---|---|---|---|---|',
    ]
    for r in rows:
        if r.get('overrun'):
            lines.append(f"| {r['case']} | {r['preset']} | {r['ratio']} | "
                         f"OVERRUN | OVERRUN | {r['n_seg_ref']}/- |")
        else:
            lines.append(
                f"| {r['case']} | {r['preset']} | {r['ratio']} | "
                f"{r['iou_mean']:.4f} | {r['iou_min']:.4f} | "
                f"{r['n_seg_ref']}/{r['n_seg_ours']} |")
    done = [r for r in rows if not r.get('overrun')]
    if done:
        lines += ['', f"**Overall: mean IoU "
                      f"{np.mean([r['iou_mean'] for r in done]):.4f}, "
                      f"worst frame "
                      f"{np.min([r['iou_min'] for r in done]):.4f}.**"]
    lines.append('')
    return '\n'.join(lines)


def roll_video(path, out_path, dx: int = 1):
    """Re-encode ``path`` with every frame rolled ``dx`` px horizontally —
    a semantically-null perturbation (the ideal crop box moves by dx)."""
    import cv2
    raw, fps = decode_rgb(path)
    rolled = np.roll(raw, dx, axis=2)
    h, w = raw.shape[1], raw.shape[2]
    vw = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*'mp4v'),
                         fps, (w, h))
    for f in rolled:
        vw.write(f[:, :, ::-1])
    vw.release()
    return out_path


def oracle_stability(corpus, ref, presets, ratios, vdir):
    """Reference-vs-itself under a 1-px roll, with the same real models.

    Prices the oracle's own sensitivity in the regime where our ISM rows
    diverge: if HDBSCAN's EOM selection moves the reference's final boxes
    more under a semantically-null 1-px translation than our one-shot
    program diverges from the un-perturbed reference, the divergence is
    inside the oracle's chaos (same argument as docs/PARITY.md's
    stage-level stability table, here end-to-end)."""
    rows = []
    for case, (path, overrides) in corpus.items():
        rolled = roll_video(path, os.path.join(vdir, case + '_roll1.mp4'))
        for preset_name, base_cp in presets:
            for ratio in ratios:
                cp = dict(base_cp)
                cp['out_ratio'] = ratio
                cp.update(overrides)
                vd_a, _ = pf.run_reference(ref, path, cp)
                vd_b, _ = pf.run_reference(ref, rolled, cp)
                a = np.asarray(vd_a['bbs'], np.int64)
                b = np.asarray(vd_b['bbs'], np.int64)
                n = min(len(a), len(b))
                ious = np.array([pf.iou(a[i], b[i]) for i in range(n)])
                rows.append(dict(case=case, preset=preset_name, ratio=ratio,
                                 iou_mean=float(ious.mean()),
                                 iou_min=float(ious.min())))
                print(f"oracle-roll1 {case:12s} {preset_name:4s} {ratio} "
                      f"self-iou={ious.mean():.4f} (min {ious.min():.4f})",
                      flush=True)
    return rows


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--report', default=None)
    parser.add_argument('--oracle-stability', action='store_true',
                        help='instead of the parity table, measure the '
                             'reference-vs-itself box movement under a '
                             '1-px horizontal roll (same real models)')
    parser.add_argument('--video-dir', default=None)
    parser.add_argument('--settings', choices=['icip', 'ism', 'both'],
                        default='both')
    parser.add_argument('--ratios', default='1:3,3:1')
    parser.add_argument('--cases', default=DEFAULT_CASES)
    parser.add_argument('--fullseq', action='store_true',
                        help='price the tpu_transnet_fullseq mode: OUR '
                             'program runs the whole-sequence TransNet '
                             'forward while the reference chain keeps its '
                             'windowed plan — the IoU gap is the '
                             'END-TO-END cost of the semantic difference')
    parser.add_argument('--tn-bias', type=float, default=None,
                        help='final-dense bias shift [b,-b] taming the '
                             'random TransNet (default: auto-calibrated, '
                             'see calibrate_tn_bias)')
    parser.add_argument('--unisal-weights', default='',
                        help='torch weights_best.pth: run with the REAL '
                             'released saliency model instead of the '
                             'calibrated random init (preflight mode, '
                             'docs/PREFLIGHT.md §4)')
    parser.add_argument('--transnet-weights', default='',
                        help='converted TransNet pickle '
                             '(tools/convert_transnet.py output)')
    parser.add_argument('--videos', default='',
                        help='directory of REAL videos (e.g. DHF1k/): use '
                             'the first --max-videos clips as the corpus '
                             'instead of the synthetic cases')
    parser.add_argument('--max-videos', type=int, default=6,
                        help='number of real clips with --videos')
    parser.add_argument('--best-settings', action='store_true',
                        help="shorthand for --settings ism (the ISM-2021 "
                             "use_best_settings preset)")
    parser.add_argument('--adaptive-link', action='store_true',
                        help='set tpu_adaptive_link=True on OUR side (the '
                             'HDBSCAN mutual-reachability emulation, '
                             'ops/clustering.py) — the A/B arm of the '
                             'speckle promotion rule in docs/PARITY.md')
    args = parser.parse_args(argv)
    if args.best_settings:
        args.settings = 'ism'

    from retargetvid_tpu.config import sc_init_crop_params

    presets = []
    if args.settings in ('icip', 'both'):
        presets.append(('ICIP', sc_init_crop_params()))
    if args.settings in ('ism', 'both'):
        presets.append(('ISM', sc_init_crop_params(use_best_settings=True)))
    ratios = args.ratios.split(',')

    vdir = args.video_dir or tempfile.mkdtemp(prefix='parity_oneshot_')
    os.makedirs(vdir, exist_ok=True)
    if args.videos:
        import glob as _glob
        exts = ('*.AVI', '*.avi', '*.MP4', '*.mp4', '*.MOV', '*.mov')
        paths = sorted(p for ext in exts
                       for p in _glob.glob(os.path.join(args.videos, ext)))
        if not paths:
            parser.error(f'no videos found under {args.videos}')
        corpus = {os.path.splitext(os.path.basename(p))[0]: (p, {})
                  for p in paths[:args.max_videos]}
        print(f'real-video corpus: {sorted(corpus)}', flush=True)
    else:
        wanted = set(args.cases.split(','))
        corpus = {k: v for k, v in pf.make_corpus(vdir).items() if k in wanted}
    if args.adaptive_link:
        # Our side only: GeometryConfig.from_crop_params consumes the key;
        # the reference's extracted functions ignore unknown cp keys.
        corpus = {k: (p, {**ov, 'tpu_adaptive_link': True})
                  for k, (p, ov) in corpus.items()}

    real_weights = bool(args.unisal_weights or args.transnet_weights)
    if args.tn_bias is not None:
        tn_bias = args.tn_bias
    elif real_weights:
        tn_bias = 0.0   # real checkpoints need no taming
    else:
        transnet_fn, _, _ = build_models()
        tn_bias = calibrate_tn_bias(transnet_fn, corpus)
    print(f'tn_bias = {tn_bias:.3f}', flush=True)
    transnet_fn, saliency_fn, program = build_models(
        tn_bias=tn_bias, tn_fullseq=args.fullseq,
        unisal_weights=args.unisal_weights,
        transnet_weights=args.transnet_weights)
    ref = pf.load_reference_pipeline()
    ref['transnet_model'] = _RealTransNet(transnet_fn)
    ref['unisal_handler'] = _real_unisal_handler(saliency_fn)

    if args.oracle_stability:
        rows = oracle_stability(corpus, ref, presets, ratios, vdir)
        for r in rows:
            print(r)
        return rows

    rows = evaluate(corpus, ref, presets, ratios, program)

    if args.report:
        report = format_report(rows)
        marker = '## Direct one-shot parity'
        path = args.report
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
    return rows


if __name__ == '__main__':
    main()
