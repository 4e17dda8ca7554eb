"""Command-line interface.

Subcommands mirror the reference's entry points:

- ``benchmark`` — the ``python smartVidCrop.py`` benchmark loop
  (``smartVidCrop.py:2621-2846``): run every video in a directory at the
  requested aspect ratios, write ``NNN_<ar>.txt`` + ``NNN_<ar>_info.txt`` per
  video, and report inline IoU against the 6 annotators.
- ``crop`` — smart-crop a single video (or reference-format ``.pkl``).
- ``eval`` — the standalone ``retargetvid_eval.py`` evaluator.

Model weights: pass ``--unisal-weights`` (torch ``weights_best.pth``) to run
with the pretrained saliency model; without it a randomly initialized model
is used (throughput benchmarking only — IoU numbers are meaningless).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import statistics
import sys
from pathlib import Path

import numpy as np

from retargetvid_tpu.config import sc_init_crop_params, smart_crop_version


def _build_models(args):
    """Construct (transnet_fn, saliency_fn) with optional weights."""
    import jax

    from retargetvid_tpu.models.transnet import TransNetPredictor, TransNetV1
    from retargetvid_tpu.pipeline.saliency import SaliencyPredictor

    variables = None
    if args.unisal_weights:
        import torch

        from retargetvid_tpu.models.torch_import import load_unisal_variables
        from retargetvid_tpu.models.unisal import UNISAL
        sd = torch.load(args.unisal_weights, map_location='cpu')
        if isinstance(sd, dict) and 'model_state_dict' in sd:
            sd = sd['model_state_dict']
        variables = load_unisal_variables(UNISAL(), sd)
        print(f' loaded UNISAL weights from {args.unisal_weights}')
    else:
        print(' WARNING: no --unisal-weights; using random init '
              '(throughput runs only)')
    predictor = SaliencyPredictor(variables=variables, chunk=args.chunk)

    model = TransNetV1()
    if args.transnet_weights:
        import pickle
        with open(args.transnet_weights, 'rb') as fp:
            params = pickle.load(fp)
        print(f' loaded TransNet weights from {args.transnet_weights}')
    else:
        import jax.numpy as jnp
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 8, 27, 48, 3), jnp.uint8))
        print(' WARNING: no --transnet-weights; using random init')
    transnet_fn = TransNetPredictor(
        model, params, fullseq=_tn_fullseq(args))
    return transnet_fn, predictor.predict


def _tn_fullseq(args) -> bool:
    """Resolve the ``--tn-plan`` flag to the ``fullseq`` boolean."""
    return getattr(args, 'tn_plan', 'windowed') == 'fullseq'


def _eval_inline(annots, vid_fn, ar, bbs):
    from retargetvid_tpu.eval.harness import benchmark_eval_boxes, iou_xyxy_inclusive

    if annots is None or not vid_fn.isdigit():
        return
    vid_ind = int(vid_fn)
    pred = benchmark_eval_boxes(np.asarray(bbs, int), ar)
    user_means = []
    for user in range(len(annots)):
        gt = annots[user][ar.replace(':', '-')][vid_ind]
        n = min(len(gt), len(pred))
        ious = iou_xyxy_inclusive(
            np.maximum(gt[:n], 0), np.maximum(pred[:n], 0))
        user_means.append(float(ious.mean()))
        print('   user #%d: %.3f' % (user + 1, user_means[-1]))
    print('   mean   : %.3f' % statistics.mean(user_means))


def cmd_benchmark_sharded(args, vid_paths, results_out, annots, crop_params):
    """The 200-video loop with clips sharded across the mesh dp axis
    (SURVEY.md §7.7).  Two phases: host-bound ingest (decode + resize +
    shot detection) per video, then dp-batched SPMD saliency+geometry via
    :class:`ShardedClipRunner`, grouped by bucket signature."""
    import jax

    from retargetvid_tpu.eval.annotations import write_boxes_file
    from retargetvid_tpu.models.transnet import TransNetPredictor, TransNetV1
    from retargetvid_tpu.ops.boxes import calc_dest_size
    from retargetvid_tpu.parallel.mesh import make_mesh
    from retargetvid_tpu.parallel.runner import ShardedClipRunner
    from retargetvid_tpu.pipeline.ingest import read_video_structure

    n_dev = min(args.mesh, len(jax.devices()))
    mesh = make_mesh(n_dev)
    print(f' sharded benchmark over mesh {dict(mesh.shape)}')

    import jax.numpy as jnp

    model = TransNetV1()
    if args.transnet_weights:
        import pickle
        with open(args.transnet_weights, 'rb') as fp:
            tn_params = pickle.load(fp)
        print(f' loaded TransNet weights from {args.transnet_weights}')
    else:
        tn_params = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 8, 27, 48, 3), jnp.uint8))
        print(' WARNING: no --transnet-weights; using random init')
    transnet_fn = TransNetPredictor(model, tn_params,
                                    fullseq=_tn_fullseq(args))

    variables = None
    if args.unisal_weights:
        import torch

        from retargetvid_tpu.models.torch_import import load_unisal_variables
        from retargetvid_tpu.models.unisal import UNISAL
        sd = torch.load(args.unisal_weights, map_location='cpu')
        if isinstance(sd, dict) and 'model_state_dict' in sd:
            sd = sd['model_state_dict']
        variables = load_unisal_variables(UNISAL(), sd)
        print(f' loaded UNISAL weights from {args.unisal_weights}')
    else:
        print(' WARNING: no --unisal-weights; using random init '
              '(throughput runs only)')
    runner = ShardedClipRunner(mesh, variables=variables)

    # Pipelined ingest/compute: worker threads decode + shot-detect the next
    # clips while the mesh runs the SPMD program of already-full groups (the
    # round-2 version ingested all 200 videos serially with the mesh idle).
    # In-flight clips are bounded (each holds its whole saliency-resolution
    # frame volume, ~45 MB for a DHF1K clip).
    import time as _time
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    from retargetvid_tpu.parallel.runner import clip_signature

    ars = args.ratios.split(',')
    dp = mesh.shape['dp']

    def ingest_one(vid_path):
        t0 = _time.perf_counter()
        clip = read_video_structure(vid_path, crop_params, transnet_fn)
        clip['vid_fn'] = Path(vid_path).stem
        clip['t_ingest'] = _time.perf_counter() - t0
        print(f" ingested: {clip['vid_fn']} ({clip['fc']} frames, "
              f"{clip['t_ingest']:.2f}s)")
        return clip

    def run_group(batch, n_real):
        c0 = batch[0]
        fps, h_orig, w_orig = c0['fps'], c0['h_orig'], c0['w_orig']
        for ar in ars:
            cp = dict(crop_params)
            cp['out_ratio'] = ar
            dest = calc_dest_size(w_orig, h_orig, ar)
            t0 = _time.perf_counter()
            results = runner.run_batch(
                batch, cp, fps=fps, h_orig=h_orig, w_orig=w_orig,
                w_final=dest['w_final'], h_final=dest['h_final'])
            t_spmd_per_clip = (_time.perf_counter() - t0) / max(n_real, 1)
            for c, res in list(zip(batch, results))[:n_real]:
                suffix = f"{c['vid_fn']}_{ar.replace(':', '-')}"
                boxes = np.asarray(res['boxes'], int)
                write_boxes_file(results_out / f'{suffix}.txt', boxes)
                info = _sharded_info(cp, c, dest, boxes,
                                     t_spmd_per_clip, dp)
                with open(results_out / f'{suffix}_info.txt', 'w') as fp:
                    for k, v in info.items():
                        fp.write(f'{k}:{v}\n')
                print(f' {suffix}: {len(res["boxes"])} boxes')
                _eval_inline(annots, c['vid_fn'], ar, res['boxes'])

    pending: dict = {}
    futures: deque = deque()
    paths_iter = iter(vid_paths)
    max_inflight = max(2, dp + 2)
    with ThreadPoolExecutor(max_workers=2) as ex:

        def topup():
            while len(futures) < max_inflight:
                try:
                    p = next(paths_iter)
                except StopIteration:
                    return
                futures.append(ex.submit(ingest_one, p))

        topup()
        while futures:
            clip = futures.popleft().result()
            topup()
            key = (clip['fps'], clip['h_orig'], clip['w_orig'],
                   clip_signature(clip))
            pending.setdefault(key, []).append(clip)
            if len(pending[key]) == dp:
                run_group(pending.pop(key), dp)
    # Tail: partial groups, padded by repeating the last clip.
    for rest in pending.values():
        n_real = len(rest)
        while len(rest) < dp:
            rest.append(rest[-1])
        run_group(rest, n_real)


def _sharded_info(cp, clip, dest, boxes, t_spmd, dp) -> dict:
    """Full reference-contract results dict for one sharded-benchmark clip
    (the sequential path's ``smart_vid_crop`` results keys,
    ``smartVidCrop.py:2581-2610``): dims pipeline string, params dump,
    pad-gate scores, ``cuts_clust`` (always 0 in the reference —
    ``smartVidCrop.py:2352,2374``) and ``<sec>s, <percent>%`` stage timings
    the reference's ``retargetvid_eval.py:196-222`` parses.  The SPMD batch
    wall time is apportioned evenly over the batch's real clips; the whole
    device phase is reported under ``_clustering`` (one fused program — same
    convention as the sequential path)."""
    sal_shape = clip['sal_frames'].shape
    fbb_w = int(boxes[0][2] - boxes[0][0]) if len(boxes) else dest['w_final']
    fbb_h = int(boxes[0][3] - boxes[0][1]) if len(boxes) else dest['h_final']
    vid_dur = clip['fc'] / clip['fps'] if clip['fps'] else 1.0
    fmt = lambda v: '%7.3fs, %6.3f%%' % (v, v / vid_dur * 100.0)
    info = {
        'result': f'smart cropped (sharded dp={dp})',
        'info': ' (%dx%d)->(%dx%d)->(%dx%d)->(%dx%d)\n' % (
            clip['h_orig'], clip['w_orig'], sal_shape[1], sal_shape[2],
            dest['h_final'], dest['w_final'], fbb_h, fbb_w),
        'params': ''.join(' %-18s : %s\n' % (k, str(v))
                          for k, v in cp.items()),
        'mean_sal_score': None, 'mean_sal_score_t': cp['t_sal'],
        'coverage_score': None, 'coverage_score_t': cp['t_cvrg'],
        'cuts_clust': 0,
        't__read': fmt(clip.get('t_ingest', 0.0)),
        't__clustering': fmt(t_spmd),
        't_total': fmt(clip.get('t_ingest', 0.0) + t_spmd),
    }
    return info


def _load_oneshot_models(args):
    """(tn_model, tn_params, unisal variables-or-None) for the one-shot
    paths, from the CLI weight flags."""
    import jax
    import jax.numpy as jnp

    from retargetvid_tpu.models.transnet import TransNetV1

    tn_model = TransNetV1()
    if args.transnet_weights:
        import pickle
        with open(args.transnet_weights, 'rb') as fp:
            tn_params = pickle.load(fp)
        print(f' loaded TransNet weights from {args.transnet_weights}')
    else:
        tn_params = tn_model.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 8, 27, 48, 3), jnp.uint8))
        print(' WARNING: no --transnet-weights; using random init')
    variables = None
    if args.unisal_weights:
        import torch

        from retargetvid_tpu.models.torch_import import load_unisal_variables
        from retargetvid_tpu.models.unisal import UNISAL
        sd = torch.load(args.unisal_weights, map_location='cpu')
        if isinstance(sd, dict) and 'model_state_dict' in sd:
            sd = sd['model_state_dict']
        variables = load_unisal_variables(UNISAL(), sd)
        print(f' loaded UNISAL weights from {args.unisal_weights}')
    else:
        print(' WARNING: no --unisal-weights; using random init '
              '(throughput runs only)')
    return tn_model, tn_params, variables


def _oneshot_info(cp, *, result, h, w, sal_hw, dest, boxes, fc, fps,
                  t_read, t_dev) -> dict:
    """One-shot results dict under the reference contracts
    (``smartVidCrop.py:2581-2610`` keys; timings in the
    ``<sec>s, <percent>%`` form ``retargetvid_eval.py:196-222`` parses;
    the whole device phase reported under ``_clustering`` — one fused
    program, same convention as the sequential path)."""
    vid_dur = fc / fps if fps else 1.0
    fmt = lambda v: '%7.3fs, %6.3f%%' % (v, v / vid_dur * 100.0)
    fbb_w = int(boxes[0][2] - boxes[0][0]) if len(boxes) else dest['w_final']
    fbb_h = int(boxes[0][3] - boxes[0][1]) if len(boxes) else dest['h_final']
    return {
        'result': result,
        'info': ' (%dx%d)->(%dx%d)->(%dx%d)->(%dx%d)\n' % (
            h, w, sal_hw[0], sal_hw[1], dest['h_final'],
            dest['w_final'], fbb_h, fbb_w),
        'params': ''.join(' %-18s : %s\n' % (k, str(v))
                          for k, v in cp.items()),
        'mean_sal_score': None, 'mean_sal_score_t': cp['t_sal'],
        'coverage_score': None, 'coverage_score_t': cp['t_cvrg'],
        'cuts_clust': 0,
        't__read': fmt(t_read),
        't__clustering': fmt(t_dev),
        't_total': fmt(t_read + t_dev),
    }


def cmd_benchmark_oneshot(args, vid_paths, results_out, annots, crop_params):
    """Per-video one-dispatch fast path (``pipeline.oneshot``): decode the
    whole clip, run resizes + shot windows + sampling + saliency + geometry
    as ONE device program, fall back to the sequential ``smart_vid_crop``
    when a clip exceeds the program's static pick/shot bounds."""
    import time as _time

    import jax.numpy as jnp

    from retargetvid_tpu.eval.annotations import write_boxes_file
    from retargetvid_tpu.io.native_reader import open_reader
    from retargetvid_tpu.io.video import probe_video
    from retargetvid_tpu.ops.boxes import calc_dest_size
    from retargetvid_tpu.pipeline.oneshot import OneShotClipProgram

    tn_model, tn_params, variables = _load_oneshot_models(args)
    program = OneShotClipProgram(
        tn_model, tn_params, variables=variables,
        tn_fullseq=crop_params.get('tpu_transnet_fullseq', False))

    def _finish(pend):
        """Collect a dispatched clip, write EVERY ratio's outputs, eval
        inline.  ``jobs``: [(ar, cp, txt, info_path, dest), ...] — all the
        ratios served by the single multi-ratio dispatch."""
        (ticket, vid_path, vid_fn, jobs, meta, fc, t_read, t_disp) = pend
        fps, w, h = meta['fps'], meta['width'], meta['height']
        outs = None
        t_dev = t_disp
        if ticket is not None:
            t0 = _time.perf_counter()
            try:
                outs = program.collect_multi(ticket)
            except ValueError as exc:
                print(f' oneshot fallback: {exc}')
            # Host-attributed device time: the dispatch call plus the
            # collect wait.  Wall between the two belongs to the NEXT
            # clip's decode (that overlap is the point of the pipeline),
            # so dispatch->collect wall would double-count it.
            t_dev = t_disp + (_time.perf_counter() - t0)
        for r, (ar, cp, txt, info_path, dest) in enumerate(jobs):
            if outs is None:
                # Streaming fallback: the sequential reference path.
                from retargetvid_tpu.pipeline.crop import smart_vid_crop
                transnet_fn, saliency_fn = _build_models(args)
                vd, res = smart_vid_crop(vid_path, cp, save_vid=False,
                                         transnet_fn=transnet_fn,
                                         saliency_fn=saliency_fn)
                boxes = np.asarray(vd['bbs'], int)
                with open(info_path, 'w') as fp:
                    for k, v in res.items():
                        fp.write(f'{k}:{v}\n')
            else:
                from retargetvid_tpu.pipeline.ingest import sal_dims
                boxes = outs[r]['boxes']
                # Decode + device time amortize across the ratios served
                # by the one dispatch (the whole point of the sharing).
                info = _oneshot_info(
                    cp, result='smart cropped (oneshot)', h=h, w=w,
                    sal_hw=sal_dims(w, h, cp['max_input_d']), dest=dest,
                    boxes=boxes, fc=fc, fps=fps,
                    t_read=t_read / len(jobs), t_dev=t_dev / len(jobs))
                with open(info_path, 'w') as fp:
                    for k, v in info.items():
                        fp.write(f'{k}:{v}\n')
            write_boxes_file(txt, np.asarray(boxes, int))
            _eval_inline(annots, vid_fn, ar, boxes)

    # One-deep pipeline: dispatch video k, decode video k+1 while the chip
    # runs k, only then collect k (the bench's pipelined protocol — all-
    # dispatch-before-first-fetch measured +36% over synchronous per-clip
    # on the real chip; depth 1 captures the decode/execute overlap
    # without holding more than two clips in HBM).  Outputs are identical
    # to the synchronous order; collect() is where the static-bounds check
    # fires, so the sequential fallback still engages per clip.
    pending = None
    ars = args.ratios.split(',')
    for i, vid_path in enumerate(vid_paths):
        vid_fn = Path(vid_path).stem
        # One decode + ONE dispatch per video serving every ratio still
        # missing on disk: the multi-ratio program shares the ingest
        # resizes, the TransNet plan and the UNISAL forward across ratios
        # (pipeline.oneshot.dispatch_multi) — vs. the reference's
        # per-ratio loop, which re-reads and re-infers unless its on-disk
        # vid_data cache is warm.
        jobs = []
        for ar in ars:
            suffix = f"{vid_fn}_{ar.replace(':', '-')}"
            txt = results_out / f'{suffix}.txt'
            info_path = results_out / f'{suffix}_info.txt'
            if txt.is_file() and info_path.is_file() and \
                    not args.replace_existing:
                print(f' skipping {suffix}')
                continue
            cp = dict(crop_params)
            cp['out_ratio'] = ar
            jobs.append((ar, cp, txt, info_path))
        if not jobs:
            continue
        print(f'\n video ({i + 1}/{len(vid_paths)}): {vid_path} '
              f'[{",".join(j[0] for j in jobs)}]')
        meta = probe_video(vid_path)
        fps, w, h = meta['fps'], meta['width'], meta['height']
        jobs = [(ar, cp, txt, info_path, calc_dest_size(w, h, ar))
                for ar, cp, txt, info_path in jobs]
        t0 = _time.perf_counter()
        reader = open_reader(vid_path)
        parts = [jnp.asarray(chunk) for chunk, _ in reader.chunks(256)]
        reader.stop()
        raw = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
        t_read = _time.perf_counter() - t0
        fc = int(raw.shape[0])
        ticket = None
        t0 = _time.perf_counter()
        if fc <= crop_params['read_batch']:
            try:
                ticket = program.dispatch_multi(
                    raw, jobs[0][1], fps=fps,
                    dests=[(d['w_final'], d['h_final'])
                           for _, _, _, _, d in jobs])
            except ValueError as exc:
                print(f' oneshot fallback: {exc}')
        t_disp = _time.perf_counter() - t0
        if pending is not None:
            _finish(pending)
        pending = (ticket, vid_path, vid_fn, jobs, meta, fc, t_read, t_disp)
    if pending is not None:
        _finish(pending)


def cmd_benchmark_oneshot_sharded(args, vid_paths, results_out, annots,
                                  crop_params):
    """``--mesh N --oneshot``: the whole-clip one-dispatch program with one
    clip per dp shard (``parallel.runner.ShardedOneShot``) — D chips each
    run a video's ENTIRE post-decode pipeline concurrently, zero hot-path
    collectives.  Decode is pipelined: worker threads read the next videos
    while the mesh runs already-full signature groups.  Clips that exceed
    ``read_batch`` or the static pick/shot bounds fall back to the
    sequential streaming path."""
    import time as _time
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    import jax

    from retargetvid_tpu.eval.annotations import write_boxes_file
    from retargetvid_tpu.io.native_reader import open_reader
    from retargetvid_tpu.io.video import probe_video
    from retargetvid_tpu.ops.boxes import calc_dest_size
    from retargetvid_tpu.parallel.mesh import make_mesh
    from retargetvid_tpu.parallel.runner import ShardedOneShot, raw_clip_signature
    from retargetvid_tpu.pipeline.ingest import sal_dims

    n_dev = min(args.mesh, len(jax.devices()))
    mesh = make_mesh(n_dev)
    dp = mesh.shape['dp']
    print(f' sharded one-shot benchmark over mesh {dict(mesh.shape)}')

    tn_model, tn_params, variables = _load_oneshot_models(args)
    runner = ShardedOneShot(
        mesh, tn_model, tn_params, variables=variables,
        tn_fullseq=crop_params.get('tpu_transnet_fullseq', False))
    ars = args.ratios.split(',')

    def read_one(vid_path):
        t0 = _time.perf_counter()
        meta = probe_video(vid_path)
        reader = open_reader(vid_path)
        parts = [chunk for chunk, _ in reader.chunks(256)]
        reader.stop()
        raw = np.concatenate(parts) if len(parts) > 1 else parts[0]
        return {'raw': raw, 'fps': meta['fps'], 'vid_fn': Path(vid_path).stem,
                'path': vid_path, 't_read': _time.perf_counter() - t0}

    fb_models: list = []

    def fallback(item, cp, ar):
        from retargetvid_tpu.pipeline.crop import smart_vid_crop
        if not fb_models:
            fb_models.append(_build_models(args))
        transnet_fn, saliency_fn = fb_models[0]
        vd, res = smart_vid_crop(item['path'], cp, save_vid=False,
                                 transnet_fn=transnet_fn,
                                 saliency_fn=saliency_fn)
        return np.asarray(vd['bbs'], int), res

    def emit(item, ar, cp, boxes, info):
        suffix = f"{item['vid_fn']}_{ar.replace(':', '-')}"
        write_boxes_file(results_out / f'{suffix}.txt',
                         np.asarray(boxes, int))
        with open(results_out / f'{suffix}_info.txt', 'w') as fp:
            for k, v in info.items():
                fp.write(f'{k}:{v}\n')
        print(f' {suffix}: {len(boxes)} boxes')
        _eval_inline(annots, item['vid_fn'], ar, boxes)

    # SPMD dispatch/collect pipelining: enqueue up to `max_groups_inflight`
    # signature-group programs before fetching the oldest — the mesh runs
    # group N while group N+1's dispatch (and the host-side decode feed)
    # proceeds, so the per-group dispatch/fetch link cost is overlapped.
    inflight: deque = deque()
    max_groups_inflight = 2

    def collect_group():
        (batch, n_real, ar, cp, dest, ticket, t0, h, w,
         fps) = inflight.popleft()
        results = runner.collect_batch(ticket)
        t_dev = (_time.perf_counter() - t0) / max(n_real, 1)
        for item, res in list(zip(batch, results))[:n_real]:
            if res['overrun']:
                print(f" oneshot overrun, streaming fallback: "
                      f"{item['vid_fn']}")
                boxes, res_info = fallback(item, cp, ar)
                emit(item, ar, cp, boxes, res_info)
                continue
            fc = item['raw'].shape[0]
            info = _oneshot_info(
                cp, result=f'smart cropped (oneshot dp={dp})', h=h,
                w=w, sal_hw=sal_dims(w, h, cp['max_input_d']),
                dest=dest, boxes=res['boxes'], fc=fc, fps=fps,
                t_read=item['t_read'], t_dev=t_dev)
            emit(item, ar, cp, res['boxes'], info)

    def run_group(batch, n_real):
        it0 = batch[0]
        h, w = it0['raw'].shape[1], it0['raw'].shape[2]
        fps = it0['fps']
        for ar in ars:
            cp = dict(crop_params)
            cp['out_ratio'] = ar
            dest = calc_dest_size(w, h, ar)
            t0 = _time.perf_counter()
            ticket = runner.dispatch_batch(
                [it['raw'] for it in batch], cp, fps=fps,
                w_final=dest['w_final'], h_final=dest['h_final'])
            inflight.append((batch, n_real, ar, cp, dest, ticket, t0,
                             h, w, fps))
            while len(inflight) > max_groups_inflight:
                collect_group()

    def done_paths():
        if args.replace_existing:
            return set()
        done = set()
        for p in vid_paths:
            stem = Path(p).stem
            if all((results_out / f"{stem}_{ar.replace(':', '-')}.txt"
                    ).is_file() and
                   (results_out / f"{stem}_{ar.replace(':', '-')}_info.txt"
                    ).is_file() for ar in ars):
                print(f' skipping {stem}')
                done.add(p)
        return done

    skip = done_paths()
    todo = [p for p in vid_paths if p not in skip]
    pending: dict = {}
    futures: deque = deque()
    paths_iter = iter(todo)
    max_inflight = max(2, dp + 2)
    with ThreadPoolExecutor(max_workers=2) as ex:

        def topup():
            while len(futures) < max_inflight:
                try:
                    p = next(paths_iter)
                except StopIteration:
                    return
                futures.append(ex.submit(read_one, p))

        topup()
        while futures:
            item = futures.popleft().result()
            topup()
            if item['raw'].shape[0] > crop_params['read_batch']:
                print(f" long clip ({item['raw'].shape[0]} frames), "
                      f"streaming fallback: {item['vid_fn']}")
                for ar in ars:
                    cp = dict(crop_params)
                    cp['out_ratio'] = ar
                    boxes, res_info = fallback(item, cp, ar)
                    emit(item, ar, cp, boxes, res_info)
                continue
            key = raw_clip_signature(item['raw'], item['fps'])
            pending.setdefault(key, []).append(item)
            if len(pending[key]) == dp:
                run_group(pending.pop(key), dp)
    for rest in pending.values():
        n_real = len(rest)
        while len(rest) < dp:
            rest.append(rest[-1])
        run_group(rest, n_real)
    while inflight:
        collect_group()


def cmd_benchmark(args):
    from retargetvid_tpu.eval.annotations import load_annotations, write_boxes_file
    from retargetvid_tpu.pipeline.crop import smart_vid_crop

    crop_params = sc_init_crop_params(use_best_settings=args.best_settings)
    crop_params['tpu_transnet_fullseq'] = _tn_fullseq(args)

    annots = None
    if args.annotations:
        annots = load_annotations(args.annotations,
                                  extract_to=args.annotations_extract)

    extensions = ('*.AVI', '*.avi', '*.MP4', '*.mp4', '*.MOV', '*.mov')
    vid_paths = sorted(p for ext in extensions
                       for p in glob.glob(os.path.join(args.videos, ext)))
    print(f' Videos:: found {len(vid_paths)} videos in {args.videos}')

    results_out = Path(args.out) / args.test_name
    results_out.mkdir(parents=True, exist_ok=True)

    if getattr(args, 'mesh', 0):
        if getattr(args, 'oneshot', False):
            return cmd_benchmark_oneshot_sharded(args, vid_paths,
                                                 results_out, annots,
                                                 crop_params)
        return cmd_benchmark_sharded(args, vid_paths, results_out, annots,
                                     crop_params)
    if getattr(args, 'oneshot', False):
        return cmd_benchmark_oneshot(args, vid_paths, results_out, annots,
                                     crop_params)

    transnet_fn, saliency_fn = _build_models(args)

    ars = args.ratios.split(',')
    for ar in ars:
        crop_params = dict(crop_params)
        crop_params['out_ratio'] = ar
        for i, vid_path in enumerate(vid_paths):
            vid_fn = Path(vid_path).stem
            suffix = f"{vid_fn}_{ar.replace(':', '-')}"
            txt = results_out / f'{suffix}.txt'
            info = results_out / f'{suffix}_info.txt'
            if txt.is_file() and info.is_file() and not args.replace_existing:
                print(f' skipping {suffix}')
                continue
            print(f'\n video ({i + 1}/{len(vid_paths)}): {vid_path} [{ar}]')
            vd, res = smart_vid_crop(
                vid_path, crop_params,
                final_vid_fn=str(results_out / suffix) if args.save_vid else '',
                temp_path=args.temp_path, save_vid=args.save_vid,
                transnet_fn=transnet_fn, saliency_fn=saliency_fn)
            with open(info, 'w') as fp:
                for k, v in res.items():
                    fp.write(f'{k}:{v}\n')
            write_boxes_file(txt, np.asarray(vd['bbs'], int))

            # Inline eval (reference :2798-2836).
            _eval_inline(annots, vid_fn, ar, vd['bbs'])


def cmd_crop(args):
    from retargetvid_tpu.eval.annotations import write_boxes_file
    from retargetvid_tpu.pipeline.crop import smart_vid_crop

    crop_params = sc_init_crop_params(use_best_settings=args.best_settings)
    crop_params['out_ratio'] = args.ratio
    crop_params['tpu_transnet_fullseq'] = _tn_fullseq(args)
    transnet_fn, saliency_fn = _build_models(args)
    out = Path(args.out or (Path(args.video).stem + '_crop'))
    vd, res = smart_vid_crop(
        args.video, crop_params,
        final_vid_fn=str(out) if args.save_vid else '',
        demo_fn=str(out) + '_demo' if args.demo else '',
        temp_path=args.temp_path, save_vid=args.save_vid,
        transnet_fn=transnet_fn, saliency_fn=saliency_fn,
        copy_sound=args.copy_sound)
    write_boxes_file(str(out) + '.txt', np.asarray(vd['bbs'], int))
    print(res['info'])
    for k, v in res.items():
        if k.startswith('t_'):
            print('  %-22s %s' % (k, v))


def cmd_eval(args):
    from retargetvid_tpu.eval.annotations import load_annotations
    from retargetvid_tpu.eval.harness import evaluate_results_tree

    annots = load_annotations(args.annotations,
                              extract_to=args.annotations_extract)
    evaluate_results_tree(args.results, annots, output_file=args.out)


_DATASETS = {}


def _dataset_classes():
    if not _DATASETS:
        from retargetvid_tpu.train.data import (
            DHF1KDataset,
            HollywoodDataset,
            MIT1003Dataset,
            SALICONDataset,
            UCFSportsDataset,
        )
        _DATASETS.update({
            'DHF1K': DHF1KDataset, 'Hollywood': HollywoodDataset,
            'UCFSports': UCFSportsDataset, 'SALICON': SALICONDataset,
            'MIT1003': MIT1003Dataset,
        })
    return _DATASETS


class _SampleLoader:
    """Batch-iterator factory over a dataset's ``sample()`` method."""

    def __init__(self, dataset, n_batches: int, batch_size: int):
        self.dataset = dataset
        self.n_batches = n_batches
        self.batch_size = batch_size

    def __call__(self):
        for _ in range(self.n_batches):
            yield self.dataset.sample(self.batch_size)


def _build_dataloaders(sources, *, batch_size: int, batches_per_epoch: int,
                       valid_batches: int, seq_len=None):
    loaders = {}
    for src in sources:
        cls = _dataset_classes()[src]
        if src == 'MIT1003':
            train_ds = cls(phase='train')
            valid_ds = cls(phase='valid')
            loaders[src] = {
                'train': _MITLoader(train_ds, batch_size),
                'valid': _MITLoader(valid_ds, batch_size),
            }
        else:
            kw = {}
            if seq_len is not None and src != 'SALICON':
                kw['seq_len'] = seq_len
            train_ds = cls(phase='train', **kw)
            valid_ds = cls(phase='valid', **kw)
            loaders[src] = {
                'train': _SampleLoader(train_ds, batches_per_epoch,
                                       batch_size),
                'valid': _SampleLoader(valid_ds, valid_batches, batch_size),
            }
    return loaders


class _MITLoader:
    """ImgSizeBatchSampler-backed loader for MIT1003."""

    def __init__(self, dataset, batch_size: int):
        from retargetvid_tpu.train.data import ImgSizeBatchSampler
        self.dataset = dataset
        self.batch_size = batch_size
        self.n_batches = len(ImgSizeBatchSampler(dataset,
                                                 batch_size=batch_size))

    def __call__(self):
        return self.dataset.batches(self.batch_size)


def cmd_train(args):
    """Train UNISAL (reference ``run.py train`` -> ``Trainer.fit``)."""
    from retargetvid_tpu.train.trainer import Trainer

    sources = tuple(args.sources.split(','))
    model_cfg = json.loads(args.model_cfg) if args.model_cfg else None
    trainer = Trainer(num_epochs=args.num_epochs, lr=args.lr,
                      data_sources=sources,
                      train_cnn_after=args.train_cnn_after,
                      model_cfg=model_cfg)
    loaders = _build_dataloaders(
        sources, batch_size=args.batch_size,
        batches_per_epoch=args.batches_per_epoch,
        valid_batches=args.valid_batches, seq_len=args.seq_len)
    best = trainer.fit(loaders, args.train_dir,
                       chkpnt_warmup=args.chkpnt_warmup,
                       chkpnt_epochs=args.chkpnt_epochs)
    print(f'best val score: {best}')
    if args.fine_tune_mit:
        mit = _build_dataloaders(('MIT1003',), batch_size=args.batch_size,
                                 batches_per_epoch=args.batches_per_epoch,
                                 valid_batches=args.valid_batches)
        best_val, best_epoch = trainer.fine_tune_mit(mit, args.train_dir)
        print(f'MIT1003 fine-tune: best val {best_val} @ epoch {best_epoch}')


def cmd_score(args):
    """Score a trained model (reference ``run.py score_model``).

    The trainer (including ``model_cfg``) restores from the run's saved
    ``Trainer.json`` — the reference's KwConfig round trip
    (``unisal/utils.py:28-44``, ``train.py Trainer.init_from_cfg_dir``) —
    so scoring always rebuilds the exact trained architecture.
    """
    from retargetvid_tpu.train.trainer import Trainer

    if (Path(args.train_dir) / 'Trainer.json').exists():
        trainer = Trainer.init_from_cfg_dir(args.train_dir)
    else:
        trainer = Trainer()
    chk = sorted(Path(args.train_dir).glob('chkpnt_epoch*.pkl'))
    best = Path(args.train_dir) / 'weights_best.pkl'
    if best.exists():
        trainer.init_state()
        trainer.load_weights(best)
        print(f' loaded {best}')
    elif chk:
        trainer.load_chkpnt(chk[-1])
        print(f' loaded {chk[-1]}')
    else:
        raise FileNotFoundError(f'no weights under {args.train_dir}')
    kw = {}
    if args.seq_len is not None and args.source not in ('SALICON', 'MIT1003'):
        kw['seq_len'] = args.seq_len
    ds = _dataset_classes()[args.source](phase=args.phase, **kw)
    batches = (ds.sample(args.batch_size) for _ in range(args.n_batches))
    scores = trainer.score_model(batches, source=args.source)
    for k, v in scores.items():
        print(f'  {k}: {v:.4f}')


def cmd_predict(args):
    """Generate saliency maps for a folder of images or a video file
    (reference ``run.py predict_examples`` / ``generate_predictions``)."""
    import cv2

    from retargetvid_tpu.pipeline.saliency import SaliencyPredictor
    from retargetvid_tpu.train.data import FolderImageDataset, FolderVideoDataset

    variables = None
    if args.unisal_weights:
        import torch

        from retargetvid_tpu.models.torch_import import load_unisal_variables
        from retargetvid_tpu.models.unisal import UNISAL
        sd = torch.load(args.unisal_weights, map_location='cpu')
        if isinstance(sd, dict) and 'model_state_dict' in sd:
            sd = sd['model_state_dict']
        variables = load_unisal_variables(UNISAL(), sd)
    else:
        print(' WARNING: no --unisal-weights; using random init')
    predictor = SaliencyPredictor(variables=variables, chunk=args.chunk)

    path = Path(args.path)
    if path.is_dir():
        ds = FolderImageDataset(path)
        names = [f.stem for f in ds.files]
    else:
        ds = FolderVideoDataset(path)
        names = [f'{i:05d}' for i in range(len(ds.images))]
    out_dir = Path(args.out or (str(path) + '_saliency'))
    out_dir.mkdir(parents=True, exist_ok=True)
    frames = np.stack(ds.images)
    if args.dynamic:
        maps = predictor.predict_video(frames, source=args.source,
                                       smooth_method=args.smooth or None)
    else:
        maps = predictor.predict(frames)
    for name, m in zip(names, maps):
        cv2.imwrite(str(out_dir / f'{name}.png'), m)
    print(f' wrote {len(names)} saliency maps to {out_dir}')


def main(argv=None):
    p = argparse.ArgumentParser(
        prog='retargetvid_tpu',
        description=f'SmartVidCrop-TPU v{smart_crop_version()}')
    sub = p.add_subparsers(dest='cmd', required=True)

    def add_model_args(sp):
        sp.add_argument('--unisal-weights', default=os.environ.get(
            'UNISAL_WEIGHTS', ''))
        sp.add_argument('--transnet-weights', default=os.environ.get(
            'TRANSNET_WEIGHTS', ''))
        sp.add_argument('--chunk', type=int, default=32,
                        help='saliency inference batch size')
        sp.add_argument('--best-settings', action='store_true',
                        help='ISM-2021 preset (use_best_settings=True)')
        sp.add_argument('--temp-path', default=None,
                        help='vid_data feature cache directory')

    b = sub.add_parser('benchmark', help='RetargetVid benchmark loop')
    add_model_args(b)
    b.add_argument('--videos', default='DHF1k')
    b.add_argument('--out', default='results')
    b.add_argument('--test-name', default='default_config')
    b.add_argument('--ratios', default='1:3,3:1')
    b.add_argument('--annotations', default=None)
    b.add_argument('--annotations-extract', default=None)
    b.add_argument('--replace-existing', action='store_true')
    b.add_argument('--save-vid', action='store_true')
    b.add_argument('--oneshot', action='store_true',
                   help='one-dispatch whole-clip program per video '
                        '(pipeline.oneshot; falls back to the streaming '
                        'path when a clip exceeds its static bounds)')
    b.add_argument('--mesh', type=int, default=0,
                   help='shard clips over an N-device dp mesh '
                        '(0 = sequential single-chip loop)')
    b.add_argument('--tn-plan', choices=('windowed', 'fullseq'),
                   default='fullseq',
                   help="TransNet shot-detection plan.  'fullseq' (the "
                        'benchmark default and the flagship bench '
                        'configuration) runs ONE whole-clip forward — the '
                        'network is fully convolutional in time, so this '
                        'only removes the window plan\'s edge truncation '
                        'and computes each frame once instead of ~2.1x; '
                        'end-to-end crop boxes match the windowed plan to '
                        "4 decimals on every parity row (docs/PARITY.md).  "
                        "'windowed' replicates the reference's 100/50 "
                        'sliding-window semantics exactly.')
    b.set_defaults(fn=cmd_benchmark)

    c = sub.add_parser('crop', help='smart-crop one video')
    add_model_args(c)
    c.add_argument('video')
    c.add_argument('--ratio', default='4:5')
    c.add_argument('--out', default=None)
    c.add_argument('--save-vid', action='store_true')
    c.add_argument('--demo', action='store_true')
    c.add_argument('--copy-sound', action='store_true')
    c.add_argument('--tn-plan', choices=('windowed', 'fullseq'),
                   default='windowed',
                   help="TransNet plan; 'crop' keeps the reference's "
                        'windowed semantics by default (replicate-by-'
                        "default for single-video use); pass 'fullseq' "
                        'for the faster whole-clip forward (see '
                        'benchmark --tn-plan)')
    c.set_defaults(fn=cmd_crop)

    e = sub.add_parser('eval', help='standalone results evaluator')
    e.add_argument('results')
    e.add_argument('--annotations', required=True)
    e.add_argument('--annotations-extract', default=None)
    e.add_argument('--out', default='eval_current.txt')
    e.set_defaults(fn=cmd_eval)

    t = sub.add_parser('train', help='train UNISAL (reference run.py train)')
    t.add_argument('--train-dir', default=os.environ.get(
        'TRAIN_DIR', 'training_runs/run'))
    t.add_argument('--sources', default='DHF1K,Hollywood,UCFSports,SALICON')
    t.add_argument('--num-epochs', type=int, default=16)
    t.add_argument('--lr', type=float, default=0.04)
    t.add_argument('--batch-size', type=int, default=4)
    t.add_argument('--batches-per-epoch', type=int, default=1000)
    t.add_argument('--valid-batches', type=int, default=100)
    t.add_argument('--train-cnn-after', type=int, default=2)
    t.add_argument('--seq-len', type=int, default=None,
                   help='override dataset sequence length (frames per clip)')
    t.add_argument('--chkpnt-warmup', type=int, default=3)
    t.add_argument('--chkpnt-epochs', type=int, default=2)
    t.add_argument('--fine-tune-mit', action='store_true')
    t.add_argument('--model-cfg', default=None,
                   help='JSON dict of UNISAL constructor overrides '
                        '(persisted in Trainer.json and restored by score)')
    t.set_defaults(fn=cmd_train)

    s = sub.add_parser('score', help='score a trained model '
                                     '(reference run.py score_model)')
    s.add_argument('--train-dir', required=True)
    s.add_argument('--source', default='DHF1K')
    s.add_argument('--phase', default='valid')
    s.add_argument('--batch-size', type=int, default=4)
    s.add_argument('--n-batches', type=int, default=25)
    s.add_argument('--seq-len', type=int, default=None)
    s.set_defaults(fn=cmd_score)

    pr = sub.add_parser('predict', help='saliency maps for a folder/video '
                                        '(reference run.py predictions)')
    pr.add_argument('path')
    pr.add_argument('--out', default=None)
    pr.add_argument('--unisal-weights', default=os.environ.get(
        'UNISAL_WEIGHTS', ''))
    pr.add_argument('--chunk', type=int, default=32)
    pr.add_argument('--dynamic', action='store_true',
                    help='recurrent (ConvGRU) video mode with interleaved '
                         'frame-modulo inference (reference run_inference)')
    pr.add_argument('--source', default='DHF1K')
    pr.add_argument('--smooth', default='',
                    help="temporal smoother for --dynamic, e.g. 'med41'")
    pr.set_defaults(fn=cmd_predict)

    args = p.parse_args(argv)
    # Persistent XLA cache: repeat CLI invocations (the benchmark resume
    # pattern, reference smartVidCrop.py:2732-2742) skip recompilation.
    from retargetvid_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    return args.fn(args)


if __name__ == '__main__':
    sys.exit(main())
