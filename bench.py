"""Single-chip end-to-end pipeline throughput benchmark.

Measures the full on-device crop pipeline over a synthetic DHF1K-like clip
(640x360 @ 30fps): ingest resizes (device matmuls) -> TransNet shot windows
-> frame sampling -> UNISAL saliency on selected frames -> the fused geometry
chain (threshold/cluster/centers/fill/interpolate/smooth/boxes).  Video
decode is excluded (no video assets in this environment); weights are random
(throughput is weight-independent).

Default path: the ONE-dispatch whole-clip program (``pipeline.oneshot`` —
sampling and scene extraction run on device as scans, removing two host
round trips and the probs fetch per clip; equivalence vs the 2-dispatch
path is exact, ``tests/test_oneshot.py``) with the full-sequence TransNet
plan (one whole-clip forward; reproduces the reference window plan's
end-to-end decisions on every parity row, docs/PARITY.md).
``BENCH_ONESHOT=0`` times the 2-dispatch path, ``BENCH_TN_FULLSEQ=0`` the
windowed TransNet plan (`cli benchmark --tn-plan windowed`; the fullseq
plan measured here is also the `cli benchmark` default since round 5).

Baseline: the reference reports t = exec_time/duration = 19% at 1:3 with the
ICIP settings on the authors' GPU PC (reference README.md:59; BASELINE.md).
At DHF1K's 30 fps that is an effective 30/0.19 ~= 157.9 video-frames/sec.

The timed region starts at HBM-resident uint8 frames (the decode handoff
point): this dev environment reaches the TPU through a loopback relay at
~25 MB/s, so uploading the synthetic 331 MB clip takes 8-15 s — three orders
of magnitude slower than the PCIe link of any real TPU host and not a
property of the pipeline.  Decode itself is likewise excluded (no video
assets here); on production hosts both stream concurrently with compute
behind the double-buffered reader.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

REFERENCE_FPS = 30.0 / 0.19     # ~157.9 frames/sec effective


def make_clip(n_frames=480, h=360, w=640, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = np.empty((n_frames, h, w, 3), np.uint8)
    cx = w * (0.2 + 0.6 * np.linspace(0, 1, n_frames))
    cy = h * (0.5 + 0.2 * np.sin(np.linspace(0, 8, n_frames)))
    base = rng.integers(0, 60, (h, w, 3)).astype(np.float32)
    for t in range(n_frames):
        blob = 200 * np.exp(-(((yy - cy[t]) ** 2 + (xx - cx[t]) ** 2) / 2500.0))
        frames[t] = np.clip(base + blob[..., None], 0, 255).astype(np.uint8)
    return frames


def main():
    import jax
    import jax.numpy as jnp

    from retargetvid_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from retargetvid_tpu.config import sc_init_crop_params
    from retargetvid_tpu.models.transnet import TransNetPredictor, TransNetV1
    from retargetvid_tpu.ops.boxes import calc_dest_size
    from retargetvid_tpu.ops.scenes import (
        fix_scene_bounds,
        predictions_to_scenes,
        scenes_to_selected,
    )
    from retargetvid_tpu.pipeline.fused import FusedClipProgram
    from retargetvid_tpu.pipeline.ingest import (
        TRANS_THRESHOLD,
        _resize_kernel,
        sal_dims,
        sample_frames,
    )

    fps = 30.0
    n_frames = 480
    h, w = 360, 640

    cp = sc_init_crop_params()
    cp['out_ratio'] = '1:3'
    sal_h, sal_w = sal_dims(w, h, cp['max_input_d'])
    resize_kernel = _resize_kernel(h, w, sal_h, sal_w)

    # Models (random weights; bf16 compute for the saliency net).
    tn_model = TransNetV1(dtype=jnp.bfloat16)
    tn_params = tn_model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 8, 27, 48, 3), jnp.uint8))
    tn_predict = TransNetPredictor(tn_model, tn_params)
    # BENCH_PALLAS_PP=1 swaps the saliency postprocess tail for the Pallas
    # VMEM kernel (A/B datapoint recorded in docs/PERF.md).
    clip_program = FusedClipProgram(
        dtype=jnp.bfloat16,
        pallas_postprocess=bool(os.environ.get('BENCH_PALLAS_PP')))

    dest = calc_dest_size(w, h, cp['out_ratio'])

    # Random-weight TransNet fires "transition" on every frame, which would
    # select all 480 frames instead of a realistic ~1/skip.  Time the real
    # shot-detection forward, but drive sampling from a plausible probs
    # profile (one hard cut) so the saliency/geometry load matches real runs.
    synth_probs = np.zeros(n_frames, np.float32)
    synth_probs[n_frames // 2] = 1.0

    # Frames land in HBM once, outside the timed region (see module doc).
    # The dev relay memoizes byte-identical dispatches, so (a) every timed
    # iteration uses a DISTINCT clip buffer and (b) the warmup clip (seed
    # 100) is never timed — a timed dispatch byte-identical to the warmup
    # would be served from the memo and deflate the measurement.
    n_timed = int(os.environ.get('BENCH_ITERS', '4'))
    batch = int(os.environ.get('BENCH_BATCH', '1'))
    n_pool = n_timed if batch == 1 else n_timed + batch - 1
    warm_dev = [jax.device_put(jnp.asarray(make_clip(n_frames, h, w,
                                                     seed=100 + i)))
                for i in range(batch)]
    clips_dev = [jax.device_put(jnp.asarray(make_clip(n_frames, h, w, seed=s)))
                 for s in range(n_pool)]
    for c in clips_dev + warm_dev:
        c.block_until_ready()
    if batch == 1:
        warm_dev = warm_dev[0]

    # TransNet plan: ONE whole-sequence forward by default (~2.1x less
    # shot-detection compute than the reference's overlapping 100/50 window
    # plan; docs/PERF.md A/B).  The fast plan reproduces the windowed plan's
    # end-to-end decisions on every parity row measured (docs/PARITY.md,
    # "Full-sequence TransNet plan"), so the bench runs it as the flagship
    # configuration — the same plan `cli benchmark` defaults to since
    # round 5; BENCH_TN_FULLSEQ=0 times the windowed plan instead
    # (`--tn-plan windowed`, the `crop` default).  The JSON records which
    # plan ran (`tn_plan`).
    tn_fullseq = os.environ.get('BENCH_TN_FULLSEQ', '1') != '0'

    if batch > 1:
        # B clips per dispatch on the ONE chip: the vmapped whole-clip
        # program (parallel.runner.ShardedOneShot on a 1-device mesh, so
        # the clip axis lands whole on this chip).  Amortizes the
        # per-dispatch overhead and widens the convs' batch dimension.
        from retargetvid_tpu.parallel.mesh import make_mesh
        from retargetvid_tpu.parallel.runner import ShardedOneShot
        tn_params['params']['dense2']['bias'] = jnp.asarray([5.0, -5.0])
        sharded = ShardedOneShot(make_mesh(1), tn_model, tn_params,
                                 dtype=jnp.bfloat16, tn_fullseq=tn_fullseq)

        def run_once(clips):
            outs = sharded.run_batch(clips, cp, fps=fps,
                                     w_final=dest['w_final'],
                                     h_final=dest['h_final'])
            return outs[0]['boxes']
    elif os.environ.get('BENCH_ONESHOT', '1') != '0':
        # ONE dispatch per clip: resizes + TransNet windows + on-device
        # sampling/scene scans + saliency + geometry (pipeline.oneshot).
        # The final TransNet layer is biased so the random weights do not
        # fire a "cut" on every frame (which would overflow the one-shot
        # static pick bound and select all 480 frames); the conv FLOPs are
        # unchanged and the selected-frame load matches the 2-dispatch run.
        from retargetvid_tpu.pipeline.oneshot import OneShotClipProgram
        tn_params['params']['dense2']['bias'] = jnp.asarray([5.0, -5.0])
        oneshot = OneShotClipProgram(
            tn_model, tn_params, dtype=jnp.bfloat16, tn_fullseq=tn_fullseq)

        if os.environ.get('BENCH_MULTI_RATIO'):
            # Opt-in: ONE dispatch serves BOTH benchmark ratios (the
            # 200x2 protocol through dispatch_multi — saliency/TransNet
            # shared, geometry tail vmapped).  `value` stays video
            # frames/sec; each timed frame now yields 2 ratios' boxes, so
            # compare against the default run to read the sharing factor.
            dest31 = calc_dest_size(w, h, '3:1')
            dests = [(dest['w_final'], dest['h_final']),
                     (dest31['w_final'], dest31['h_final'])]

            def run_once(frames_dev):
                outs = oneshot.collect_multi(oneshot.dispatch_multi(
                    frames_dev, cp, fps=fps, dests=dests))
                return outs[0]['boxes']

            def dispatch_once(frames_dev):
                return oneshot.dispatch_multi(frames_dev, cp, fps=fps,
                                              dests=dests)

            def collect_once(ticket):
                return oneshot.collect_multi(ticket)[0]
        else:
            def run_once(frames_dev):
                out = oneshot.run(frames_dev, cp, fps=fps,
                                  w_final=dest['w_final'],
                                  h_final=dest['h_final'])
                return out['boxes']

            def dispatch_once(frames_dev):
                return oneshot.dispatch(frames_dev, cp, fps=fps,
                                        w_final=dest['w_final'],
                                        h_final=dest['h_final'])

            collect_once = oneshot.collect
    else:
        tn_fullseq = False  # the 2-dispatch path times the windowed predictor

        def run_once(frames_dev):
            # Ingest resizes then shot detection as TWO programs: measured
            # faster than the fused IngestShotProgram (~15 ms/clip) because
            # the small resize program overlaps with host-side work while
            # the conv windows of the previous dispatch drain.
            tn_frames, sal_frames = resize_kernel(frames_dev)
            _probs_timed = tn_predict(tn_frames)
            probs = synth_probs
            # Frame sampling (host, trivial).
            selected, true_inds, map2orig = sample_frames(
                n_frames, probs, cp['skip'], n_frames)
            # Scenes.
            seg = fix_scene_bounds(
                predictions_to_scenes(probs, TRANS_THRESHOLD), n_frames)
            seg_sel = scenes_to_selected(seg, map2orig)
            # Gather + saliency + geometry: ONE fused program, one dispatch.
            geo = clip_program.run(sal_frames, selected, true_inds, seg,
                                   seg_sel, cp, fps=fps, h_orig=h, w_orig=w,
                                   w_final=dest['w_final'],
                                   h_final=dest['h_final'], fc=n_frames)
            return geo['boxes']

    # Warmup (compilation) on the dedicated warmup clip only.
    boxes = run_once(warm_dev)
    assert boxes.shape == (n_frames, 4)
    if os.environ.get('BENCH_VERBOSE'):
        import cProfile
        import pstats
        prof = cProfile.Profile()
        prof.enable()
        run_once(warm_dev)
        prof.disable()
        pstats.Stats(prof).sort_stats('cumulative').print_stats(25)
    if os.environ.get('BENCH_TRACE_DIR'):
        # jax.profiler trace of one pipeline pass (view with TensorBoard
        # or xprof) — the TPU-native counterpart of the reference's
        # stage-keyed wall-clock registry (SURVEY.md §5.1).
        with jax.profiler.trace(os.environ['BENCH_TRACE_DIR']):
            run_once(warm_dev)

    # Timed: each iteration is a fresh clip (batch mode: a fresh sliding
    # window over the pool, so every stacked batch buffer differs) never
    # dispatched before.
    #
    # Two protocols, BOTH measured by default in the one-shot path so the
    # driver artifact and any narrative quote the same run:
    #
    # - per_clip (the headline `value`): per-clip LATENCY, dispatch->fetch
    #   per clip, MEDIAN over iterations (docs/PERF.md methodology).  The
    #   defensible default — no overlap between clips.
    # - pipelined: steady-state THROUGHPUT — all clips are dispatched before
    #   the first result is fetched, so device execution of clip N overlaps
    #   the dispatch/fetch link traffic of its neighbors, the production
    #   serving pattern (every result is still value-fetched, which is the
    #   only reliable sync on this relay).
    #
    # BENCH_PIPELINE=0 / =1 restrict the run to one protocol.
    pipelined_capable = (batch == 1
                         and os.environ.get('BENCH_ONESHOT', '1') != '0')
    mode = os.environ.get('BENCH_PIPELINE', 'both')
    do_pipelined = pipelined_capable and mode in ('1', 'both')
    do_per_clip = mode in ('0', 'both') or not pipelined_capable

    per_clip_fps = pipelined_fps = None
    if do_per_clip:
        times = []
        for i in range(n_timed):
            arg = clips_dev[i] if batch == 1 else clips_dev[i:i + batch]
            t0 = time.perf_counter()
            run_once(arg)
            times.append(time.perf_counter() - t0)
        per_clip_fps = n_frames * batch / float(np.median(times))
        if os.environ.get('BENCH_VERBOSE'):
            print('per-clip seconds:', [round(t, 4) for t in times])
    if do_pipelined:
        # Fresh clip buffers: the relay memoizes byte-identical dispatches,
        # so re-dispatching the per-clip pool would be served from the memo.
        pipe_dev = [jax.device_put(jnp.asarray(
            make_clip(n_frames, h, w, seed=200 + s)))
            for s in range(n_timed)]
        for c in pipe_dev:
            c.block_until_ready()
        t0 = time.perf_counter()
        tickets = [dispatch_once(c) for c in pipe_dev]
        for t in tickets:
            out = collect_once(t)
            assert out['boxes'].shape == (n_frames, 4)
        pipelined_fps = n_frames * n_timed / (time.perf_counter() - t0)

    headline = per_clip_fps if per_clip_fps is not None else pipelined_fps
    result = {
        'metric': 'end-to-end crop pipeline throughput (640x360 video frames/sec, single chip)',
        'value': round(headline, 2),
        'unit': 'frames/sec',
        'vs_baseline': round(headline / REFERENCE_FPS, 2),
        'protocol': 'per_clip_median' if per_clip_fps is not None
                    else 'pipelined',
        'tn_plan': 'fullseq' if tn_fullseq else 'windowed',
        'ratios_per_dispatch': 2 if os.environ.get('BENCH_MULTI_RATIO')
                               else 1,
    }
    if per_clip_fps is not None:
        result['per_clip_fps'] = round(per_clip_fps, 2)
    if pipelined_fps is not None:
        result['pipelined_fps'] = round(pipelined_fps, 2)
    print(json.dumps(result))


if __name__ == '__main__':
    main()
