"""One-dispatch whole-clip program == the 2-dispatch path, exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

#: Compile-heavy on CPU; excluded from the fast tier (pytest -m "not slow").
pytestmark = pytest.mark.slow


def _random_probs(rng, n, p_hi=0.06):
    return (rng.random(n) < p_hi).astype(np.float32) * 0.9


def test_device_sampling_matches_host():
    """Every trial runs the PADDED-capacity program (static fc_cap, traced
    live count n) — the batched SPMD contract — so the 20 random frame
    counts share ONE compiled program per skip instead of compiling 20
    (the old per-fc static form cost ~0.5 s compile per trial)."""
    from retargetvid_tpu.pipeline.ingest import sample_frames
    from retargetvid_tpu.pipeline.oneshot import sample_frames_device

    rng = np.random.default_rng(3)
    fc_cap, t_sel_cap = 300, 300 // 1 + 8
    for trial in range(20):
        fc = int(rng.integers(8, 300))
        skip = int(rng.choice([1, 4, 6, 9]))
        probs = _random_probs(rng, fc)
        selected, true_inds, m2o = sample_frames(fc, probs, skip, fc)
        probs_pad = np.zeros(fc_cap, np.float32)
        probs_pad[:fc] = probs
        sel_mask, sel_idx, fc_sel, ti = jax.jit(
            sample_frames_device, static_argnums=(1, 2, 3))(
            jnp.asarray(probs_pad), skip, fc_cap, t_sel_cap, n=fc)
        assert int(fc_sel) == len(true_inds), (trial, fc, skip)
        assert list(np.asarray(sel_idx)[:len(true_inds)]) == true_inds
        sel_nz = list(np.nonzero(np.asarray(sel_mask))[0])
        assert sel_nz == true_inds
        # ascending continuation beyond the live region
        tail = np.asarray(ti)[len(true_inds):]
        assert np.all(np.diff(np.asarray(ti)) >= 1)
        assert len(tail) == 0 or tail[0] == true_inds[-1] + 1


def test_device_scenes_match_host():
    from retargetvid_tpu.ops.scenes import (
        fix_scene_bounds,
        predictions_to_scenes,
        scenes_to_selected,
    )
    from retargetvid_tpu.pipeline.ingest import sample_frames
    from retargetvid_tpu.pipeline.oneshot import (
        sample_frames_device,
        scene_bounds_device,
    )

    rng = np.random.default_rng(5)
    cases = [_random_probs(rng, int(rng.integers(10, 260)))
             for _ in range(16)]
    cases.append(np.zeros(40, np.float32))          # single scene
    cases.append(np.full(40, 0.9, np.float32))      # all-transition fallback
    first_hi = np.zeros(60, np.float32)
    first_hi[0] = 0.9                               # prob[0] > t quirk
    cases.append(first_hi)

    # Padded-capacity programs (static caps, traced live count n — the
    # batched SPMD contract): all 19 cases share ONE compiled program per
    # function instead of one per distinct length.
    fc_cap = 260
    t_sel_cap = fc_cap // 6 + fc_cap // 8 + 10
    s_cap = fc_cap // 2 + 4
    for probs in cases:
        fc = len(probs)
        seg = fix_scene_bounds(predictions_to_scenes(probs, 0.1), fc)
        _, _, m2o = sample_frames(fc, probs, 6, fc)
        seg_sel = scenes_to_selected(seg, m2o)

        probs_pad = np.zeros(fc_cap, np.float32)
        probs_pad[:fc] = probs
        sel_mask, _, _, _ = jax.jit(
            sample_frames_device, static_argnums=(1, 2, 3))(
            jnp.asarray(probs_pad), 6, fc_cap, t_sel_cap, n=fc)
        ss, se, sss, sse, n = jax.jit(
            scene_bounds_device, static_argnums=(2, 3))(
            jnp.asarray(probs_pad), sel_mask, fc_cap, s_cap, n=fc)
        n = int(n)
        assert n == len(seg), probs[:8]
        assert list(np.asarray(ss)[:n]) == [int(s[0]) for s in seg]
        assert list(np.asarray(se)[:n]) == [int(s[1]) for s in seg]
        assert list(np.asarray(sss)[:n]) == [int(s[0]) for s in seg_sel]
        assert list(np.asarray(sse)[:n]) == [int(s[1]) for s in seg_sel]


def test_oneshot_program_matches_two_dispatch():
    from retargetvid_tpu.config import sc_init_crop_params
    from retargetvid_tpu.models.transnet import TransNetPredictor, TransNetV1
    from retargetvid_tpu.models.unisal import UNISAL
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
    from retargetvid_tpu.pipeline.oneshot import OneShotClipProgram

    fc, h, w = 48, 72, 128
    fps = 30.0
    cp = sc_init_crop_params()
    cp['out_ratio'] = '1:3'
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = np.zeros((fc, h, w, 3), np.uint8)
    for t in range(fc):
        cx = w * (0.2 + 0.6 * t / fc) if t < fc // 2 else w * 0.75
        blob = 225 * np.exp(-(((yy - h * 0.5) ** 2 +
                               (xx - cx) ** 2) / 250.0))
        frames[t] = np.clip(blob[..., None] +
                            (10 if t < fc // 2 else 60), 0,
                            255).astype(np.uint8)
    frames_dev = jnp.asarray(frames)
    dest = calc_dest_size(w, h, cp['out_ratio'])

    tn_model = TransNetV1(f=2, l=3, s=2, d=16)
    tn_params = tn_model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 8, 27, 48, 3), jnp.uint8))
    # Random-weight TransNet fires a "transition" on every frame (the
    # pathological all-selected case the one-shot static bounds reject);
    # bias the final layer so probs ~ 0 and the sampling rule runs its
    # realistic every-skip regime.
    tn_params = jax.tree_util.tree_map(lambda v: v, tn_params)
    tn_params['params']['dense2']['bias'] = jnp.asarray([5.0, -5.0])
    from conftest import TINY_UNISAL_CFG
    un_model = UNISAL(**TINY_UNISAL_CFG)
    x0 = jnp.zeros((1, 1, 224, 416, 3), jnp.float32)
    un_vars = un_model.init(jax.random.PRNGKey(1), x0, static=True)

    # --- 2-dispatch path
    sal_h, sal_w = sal_dims(w, h, cp['max_input_d'])
    kernel = _resize_kernel(h, w, sal_h, sal_w)
    tn, sal = kernel(frames_dev)
    probs = np.asarray(TransNetPredictor(tn_model, tn_params)(tn))
    selected, true_inds, m2o = sample_frames(fc, probs, cp['skip'], fc)
    seg = fix_scene_bounds(predictions_to_scenes(probs, TRANS_THRESHOLD), fc)
    seg_sel = scenes_to_selected(seg, m2o)
    two = FusedClipProgram(variables=un_vars, model=un_model,
                           dtype=jnp.float32).run(
        sal, selected, true_inds, seg, seg_sel, cp, fps=fps,
        h_orig=h, w_orig=w, w_final=dest['w_final'],
        h_final=dest['h_final'], fc=fc)

    # --- one-dispatch path
    one = OneShotClipProgram(tn_model, tn_params, variables=un_vars,
                             model=un_model, dtype=jnp.float32).run(
        frames_dev, cp, fps=fps, w_final=dest['w_final'],
        h_final=dest['h_final'])

    assert one['fc_sel'] == len(true_inds)
    assert one['n_segments'] == len(seg)
    np.testing.assert_allclose(one['probs'][:fc], probs, rtol=1e-5,
                               atol=1e-5)
    assert np.array_equal(one['boxes'], np.asarray(two['boxes'], np.int32))


def test_oneshot_fullseq_matches_windowed_decisions():
    """tpu_transnet_fullseq: one whole-sequence TransNet forward inside the
    one-shot program — ~2.1x less shot-detection compute — must reproduce
    the windowed plan's sampling/scene/box decisions on content whose probs
    sit far from the threshold (the value-level difference is the windows'
    receptive-field truncation, see models/transnet.py)."""
    from retargetvid_tpu.config import sc_init_crop_params
    from retargetvid_tpu.models.transnet import TransNetV1
    from retargetvid_tpu.models.unisal import UNISAL
    from retargetvid_tpu.ops.boxes import calc_dest_size
    from retargetvid_tpu.pipeline.oneshot import OneShotClipProgram

    from conftest import TINY_UNISAL_CFG

    fc, h, w = 48, 72, 128
    cp = sc_init_crop_params()
    cp['out_ratio'] = '1:3'
    dest = calc_dest_size(w, h, cp['out_ratio'])
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = np.zeros((fc, h, w, 3), np.uint8)
    for t in range(fc):
        cx = w * (0.2 + 0.6 * t / fc)
        blob = 225 * np.exp(-(((yy - h * 0.5) ** 2 +
                               (xx - cx) ** 2) / 250.0))
        frames[t] = np.clip(blob[..., None] + 10, 0, 255).astype(np.uint8)

    tn_model = TransNetV1(f=2, l=3, s=2, d=16)
    tn_params = tn_model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 8, 27, 48, 3), jnp.uint8))
    tn_params = jax.tree_util.tree_map(lambda v: v, tn_params)
    tn_params['params']['dense2']['bias'] = jnp.asarray([5.0, -5.0])
    un_model = UNISAL(**TINY_UNISAL_CFG)
    un_vars = un_model.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 1, 224, 416, 3), jnp.float32),
                            static=True)

    kw = dict(fps=30.0, w_final=dest['w_final'], h_final=dest['h_final'])
    base = OneShotClipProgram(tn_model, tn_params, variables=un_vars,
                              model=un_model, dtype=jnp.float32).run(
        jnp.asarray(frames), cp, **kw)
    fast = OneShotClipProgram(tn_model, tn_params, variables=un_vars,
                              model=un_model, dtype=jnp.float32,
                              tn_fullseq=True).run(
        jnp.asarray(frames), cp, **kw)

    assert fast['fc_sel'] == base['fc_sel']
    assert fast['n_segments'] == base['n_segments']
    assert np.array_equal(fast['boxes'], base['boxes'])
    # Value-level: both prob vectors are ~0 under the biased head; the
    # fullseq values differ only by the windows' truncated context.
    np.testing.assert_allclose(fast['probs'][:fc], base['probs'][:fc],
                               atol=0.05)


def test_oneshot_multi_ratio_matches_per_ratio():
    """dispatch_multi (ONE program serving R ratios, geometry tail vmapped,
    saliency/TransNet shared) == per-ratio run() for every ratio."""
    from retargetvid_tpu.config import sc_init_crop_params
    from retargetvid_tpu.models.transnet import TransNetV1
    from retargetvid_tpu.models.unisal import UNISAL
    from retargetvid_tpu.ops.boxes import calc_dest_size
    from retargetvid_tpu.pipeline.oneshot import OneShotClipProgram

    from conftest import TINY_UNISAL_CFG

    # Same shapes/models as test_oneshot_program_matches_two_dispatch so
    # the scalar one-shot program is shared within the session.
    fc, h, w = 48, 72, 128
    cp = sc_init_crop_params()
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = np.zeros((fc, h, w, 3), np.uint8)
    for t in range(fc):
        cx = w * (0.2 + 0.6 * t / fc) if t < fc // 2 else w * 0.75
        blob = 225 * np.exp(-(((yy - h * 0.5) ** 2 +
                               (xx - cx) ** 2) / 250.0))
        frames[t] = np.clip(blob[..., None] +
                            (10 if t < fc // 2 else 60), 0,
                            255).astype(np.uint8)
    frames_dev = jnp.asarray(frames)

    tn_model = TransNetV1(f=2, l=3, s=2, d=16)
    tn_params = tn_model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 8, 27, 48, 3), jnp.uint8))
    tn_params = jax.tree_util.tree_map(lambda v: v, tn_params)
    tn_params['params']['dense2']['bias'] = jnp.asarray([5.0, -5.0])
    un_model = UNISAL(**TINY_UNISAL_CFG)
    un_vars = un_model.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 1, 224, 416, 3), jnp.float32),
                            static=True)
    program = OneShotClipProgram(tn_model, tn_params, variables=un_vars,
                                 model=un_model, dtype=jnp.float32)

    ratios = ('1:3', '3:1')
    dests = [calc_dest_size(w, h, ar) for ar in ratios]
    singles = [program.run(frames_dev, cp, fps=30.0,
                           w_final=d['w_final'], h_final=d['h_final'])
               for d in dests]
    multi = program.collect_multi(program.dispatch_multi(
        frames_dev, cp, fps=30.0,
        dests=[(d['w_final'], d['h_final']) for d in dests]))

    assert len(multi) == len(ratios)
    for single, m in zip(singles, multi):
        assert m['fc_sel'] == single['fc_sel']
        assert m['n_segments'] == single['n_segments']
        # Same math; the vmapped geometry tail may reassociate fp
        # reductions (same tolerance as the oneshot-vs-streaming tests).
        assert np.abs(np.asarray(m['boxes']) -
                      np.asarray(single['boxes'])).max() <= 1
        np.testing.assert_allclose(m['probs'][:fc], single['probs'][:fc],
                                   rtol=1e-5, atol=1e-5)


def test_oneshot_pipelined_dispatch_matches_run():
    """dispatch-all-then-collect (the bench.py BENCH_PIPELINE protocol and
    the production serving pattern) == the synchronous per-clip run()."""
    from retargetvid_tpu.config import sc_init_crop_params
    from retargetvid_tpu.models.transnet import TransNetV1
    from retargetvid_tpu.ops.boxes import calc_dest_size
    from retargetvid_tpu.pipeline.oneshot import OneShotClipProgram

    # Same shapes/model as test_oneshot_program_matches_two_dispatch so the
    # compiled one-shot program is shared within the session (VERDICT r03:
    # distinct signatures each pay a full cold compile on the 1-core host).
    fc, h, w = 48, 72, 128
    cp = sc_init_crop_params()
    cp['out_ratio'] = '1:3'
    dest = calc_dest_size(w, h, cp['out_ratio'])

    tn_model = TransNetV1(f=2, l=3, s=2, d=16)
    tn_params = tn_model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 8, 27, 48, 3), jnp.uint8))
    tn_params = jax.tree_util.tree_map(lambda v: v, tn_params)
    tn_params['params']['dense2']['bias'] = jnp.asarray([5.0, -5.0])
    from conftest import TINY_UNISAL_CFG
    from retargetvid_tpu.models.unisal import UNISAL
    un_model = UNISAL(**TINY_UNISAL_CFG)
    un_vars = un_model.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 1, 224, 416, 3), jnp.float32),
                            static=True)
    program = OneShotClipProgram(tn_model, tn_params, variables=un_vars,
                                 model=un_model, dtype=jnp.float32)

    rng = np.random.default_rng(7)
    # 2 clips: enough to exercise out-of-order collect vs sync order; each
    # extra clip costs 2 more ~13 s tiny-program executions on this host.
    clips = [jnp.asarray(rng.integers(0, 255, (fc, h, w, 3)).astype(np.uint8))
             for _ in range(2)]
    kw = dict(fps=30.0, w_final=dest['w_final'], h_final=dest['h_final'])

    sync = [program.run(c, cp, **kw) for c in clips]
    tickets = [program.dispatch(c, cp, **kw) for c in clips]
    piped = [program.collect(t) for t in tickets]
    for a, b in zip(sync, piped):
        assert np.array_equal(a['boxes'], b['boxes'])
        assert a['fc_sel'] == b['fc_sel']
        assert a['n_segments'] == b['n_segments']
