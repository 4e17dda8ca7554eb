"""Whole-clip pipeline in ONE dispatch: raw frames -> crop boxes.

The 2-dispatch benchmark path (resize+TransNet program, host sampling, then
the fused saliency+geometry program) pays two device round trips plus a
probs fetch per clip — ~50 ms of a ~170 ms clip on the dev relay, and a
host sync point on any hardware.  This module moves the two host stages in
between on device:

- **Frame sampling** (reference ``smartVidCrop.py:379-399``): the
  sequential selection rule (every ``skip`` frames from the LAST selected,
  plus the frame after each shot cut, the first and the final frame) is a
  ``lax.scan`` over frames carrying the last-selected index.
- **Scene extraction** (reference ``predictions_to_scenes`` +
  boundary fix, ``smartVidCrop.py:214-230, 459-464``): after the boundary
  fix the segmentation is exactly the partition of [0, fc) at scene
  starts; a start is any below-threshold frame at position 0 or preceded
  by an above-threshold frame — one masked ``nonzero``.

Everything else reuses the existing building blocks: the TransNet window
plan (``models.transnet``), the ingest resizes (``ops.resize``) and the
fused saliency+geometry body (``pipeline.fused.make_clip_fn``).

Static padding bounds (compile-time): ``t_sel_pad`` covers
``fc // skip + 2`` regular picks plus one forced pick per cut (bounded by
``s_pad`` segments); a clip with more shots than ``s_pad`` must fall back
to the 2-dispatch path (``n_segments`` is returned so callers can check —
DHF1K clips have 1-3 shots).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from retargetvid_tpu.models.unisal import UNISAL
from retargetvid_tpu.pipeline.fused import (
    make_clip_fn,
    pack_clip_outputs,
    unpack_clip_outputs,
)
from retargetvid_tpu.pipeline.geometry import GeometryConfig, bucket_size
from retargetvid_tpu.pipeline.ingest import TRANS_THRESHOLD
from retargetvid_tpu.pipeline.saliency import get_optimal_out_size

__all__ = ["OneShotClipProgram", "sample_frames_device",
           "scene_bounds_device"]


def sample_frames_device(probs, skip: int, fc: int, t_sel_pad: int,
                         threshold: float = TRANS_THRESHOLD, n=None):
    """The reference's sequential frame-selection rule as a ``lax.scan``.

    ``fc`` is the STATIC frame capacity; ``n`` (traced, default ``fc``) the
    clip's live frame count — the batched SPMD variant pads clips to a
    shared capacity.  Returns (sel_mask (fc,), sel_idx (t_sel_pad,),
    fc_sel, ti (t_sel_pad,)): ``sel_idx`` holds the selected frame indices
    (clamped repeats beyond ``fc_sel``), ``ti`` the same but continued
    ASCENDING past the live region (the interpolation gather contract of
    ``run_geometry``).
    """
    n = jnp.int32(fc) if n is None else jnp.asarray(n, jnp.int32)
    fidx = jnp.arange(fc)
    after_cut = jnp.concatenate(
        [jnp.zeros(1, bool), jnp.asarray(probs)[:fc - 1] > threshold])

    def step(last, inp):
        f, cut = inp
        want = ((f == last + skip) | cut | (f == n - 1)) & (f < n)
        last = jnp.where(want, f, last)
        return last, want

    # init last = -skip so frame 0 satisfies f == last + skip (the
    # reference's "no true_inds yet -> select" branch).
    _, sel_mask = jax.lax.scan(step, jnp.int32(-skip),
                               (fidx, after_cut))
    fc_sel = jnp.sum(sel_mask).astype(jnp.int32)
    sel_idx = jnp.nonzero(sel_mask, size=t_sel_pad,
                          fill_value=fc - 1)[0].astype(jnp.int32)
    sel_idx = jnp.minimum(sel_idx, jnp.maximum(n - 1, 0))
    k = jnp.arange(t_sel_pad)
    last_ti = sel_idx[jnp.clip(fc_sel - 1, 0, t_sel_pad - 1)]
    ti = jnp.where(k < fc_sel, sel_idx, last_ti + (k - fc_sel + 1))
    return sel_mask, sel_idx, fc_sel, ti.astype(jnp.int32)


def scene_bounds_device(probs, sel_mask, fc: int, s_pad: int,
                        threshold: float = TRANS_THRESHOLD, n=None):
    """Post-boundary-fix segmentation as padded start/end arrays.

    ``fc`` static capacity, ``n`` traced live count (default ``fc``).
    Returns (seg_starts, seg_ends, seg_sel_starts, seg_sel_ends,
    n_segments), each (s_pad,) int32 — the contract of
    ``geometry_pipeline``.  Scene starts are below-threshold frames at
    position 0 or preceded by an above-threshold frame; the all-transition
    fallback emits one full-length scene.
    """
    n_live = jnp.int32(fc) if n is None else jnp.asarray(n, jnp.int32)
    live = jnp.arange(fc) < n_live
    p = (jnp.asarray(probs)[:fc] > threshold) & live
    prev_hi = jnp.concatenate([jnp.zeros(1, bool), p[:-1]])
    is_start = (~p) & ((jnp.arange(fc) == 0) | prev_hi) & live
    n_seg = jnp.sum(is_start).astype(jnp.int32)
    starts = jnp.nonzero(is_start, size=s_pad,
                         fill_value=fc)[0].astype(jnp.int32)
    # Fallback: no below-threshold frame at all -> one [0, n-1] scene.
    starts = jnp.where(n_seg == 0,
                       jnp.where(jnp.arange(s_pad) == 0, 0, fc), starts)
    n_seg = jnp.maximum(n_seg, 1)
    k = jnp.arange(s_pad)
    next_start = jnp.concatenate([starts[1:], jnp.full(1, fc, jnp.int32)])
    ends = jnp.where(k == n_seg - 1, n_live - 1, next_start - 1)

    # Selected-frame mapping: m2o[f] = cumsum(sel_mask) - 1.
    m2o = (jnp.cumsum(sel_mask.astype(jnp.int32)) - 1)
    safe = lambda idx: m2o[jnp.clip(idx, 0, fc - 1)]
    return (starts, ends, safe(starts), safe(ends), n_seg)


def make_oneshot_body(model, tn_model, *, source, dtype, t_border,
                      cfg: GeometryConfig, fc: int, sal_hw, net_hw,
                      t_out: int, t_sel_pad: int, s_pad: int, skip: int,
                      fps: float, h_orig: int, w_orig: int,
                      window: int = 100, stride: int = 50,
                      keep: tuple = (25, 75), tn_fullseq: bool = False):
    """Traceable whole-clip body:
    (variables, tn_params, raw, n, w_final, h_final) -> dict.

    ``fc`` is the static frame capacity; ``n`` the clip's traced live
    count (pad ``raw`` with zero frames up to ``fc``); the target dims
    ``w_final``/``h_final`` are traced scalars so one compiled program
    serves both benchmark ratios.  Shared by :class:`OneShotClipProgram`
    (n == fc) and the dp-sharded batched variant
    (``parallel.runner.ShardedOneShot``) which vmaps it.
    """
    from retargetvid_tpu.models.transnet import INPUT_HEIGHT, INPUT_WIDTH
    from retargetvid_tpu.ops.resize import resize, round_half_up

    sal_h, sal_w = sal_hw
    m = window // stride
    kk = -(-(fc + window - stride + keep[0]) // stride)
    length = kk * stride
    n_w = kk - m + 1

    clip_fn = make_clip_fn(
        model, source=source, dtype=dtype, t_border=t_border, cfg=cfg,
        in_hw=(sal_h, sal_w), net_hw=net_hw, t_out=t_out, fps=fps,
        h_orig=h_orig, w_orig=w_orig)

    def body(variables, tn_params, raw, n, w_final, h_final):
        n = jnp.asarray(n, jnp.int32)
        to_u8 = lambda v: jnp.clip(round_half_up(v), 0,
                                   255).astype(jnp.uint8)
        tn = to_u8(resize(raw, (INPUT_HEIGHT, INPUT_WIDTH), 'linear'))
        sal = to_u8(resize(raw, (sal_h, sal_w), 'linear'))

        if tn_fullseq:
            # One whole-sequence forward (the net is fully convolutional in
            # time — TransNetPredictor docstring): ~2.1x less TransNet
            # compute than the overlapping window plan, not bit-identical
            # at window edges (tpu_transnet_fullseq opt-in).
            src = jnp.clip(jnp.arange(fc + 2 * keep[0]) - keep[0], 0, n - 1)
            probs = tn_model.apply(tn_params, tn[src][None])[0]
            probs = probs[keep[0]:keep[0] + fc]
        else:
            # TransNet window plan (edge padding via clamped row gather).
            src = jnp.clip(jnp.arange(length) - keep[0], 0, n - 1)
            blocks = tn[src].reshape(kk, stride, INPUT_HEIGHT, INPUT_WIDTH,
                                     3)
            windows = jnp.concatenate(
                [blocks[off:off + n_w] for off in range(m)], axis=1)
            probs = tn_model.apply(tn_params, windows)
            probs = probs[:, keep[0]:keep[1]].reshape(-1)[:fc]
        probs = jnp.where(jnp.arange(fc) < n, probs, 0.0)

        sel_mask_f, sel_idx, fc_sel, ti = sample_frames_device(
            probs, skip, fc, t_sel_pad, n=n)
        ss, se, sss, sse, n_seg = scene_bounds_device(
            probs, sel_mask_f, fc, s_pad, n=n)

        # Clamp against static-bound overflow (a clip with more forced
        # picks than t_sel_pad allows); callers check the raw count and
        # fall back to the 2-dispatch path.
        fc_sel_c = jnp.minimum(fc_sel, jnp.int32(t_sel_pad))
        sel_live = jnp.arange(t_sel_pad) < fc_sel_c
        out = clip_fn(variables, sal, sel_idx, sel_live, fc_sel_c, ti,
                      ss, se, sss, sse, n_seg, n, w_final, h_final)
        out['probs'] = probs
        out['fc_sel'] = fc_sel
        out['n_segments'] = n_seg
        out['seg_starts'] = ss
        out['seg_ends'] = se
        out['sel_idx'] = sel_idx
        return out

    return body


class OneShotClipProgram:
    """Raw decoded frames -> crop boxes, one compiled program, one dispatch.

    Combines: device resizes (TransNet 27x48 + saliency max-dim-250) ->
    TransNet window plan -> on-device sampling scan -> on-device scene
    bounds -> UNISAL saliency on the selected frames -> the fused geometry
    chain.  No host round trip between decode hand-off and the packed
    outputs (boxes + probs + structure for the txt/_info.txt contracts).
    """

    def __init__(self, tn_model, tn_params, variables=None,
                 model: Optional[UNISAL] = None, source: str = 'SALICON',
                 dtype=jnp.bfloat16, rng_seed: int = 0, t_border: int = -1,
                 s_pad: int = 8, window: int = 100, stride: int = 50,
                 keep: tuple = (25, 75), tn_fullseq: bool = False):
        self.tn_model = tn_model
        # Parameters ride as jit arguments: pin them on device ONCE so a
        # numpy checkpoint tree is not re-uploaded on every dispatch.
        self.tn_params = jax.tree_util.tree_map(jnp.asarray, tn_params)
        self.model = model or UNISAL()
        self.source = source
        self.dtype = dtype
        self.t_border = t_border
        self.s_pad = s_pad
        self.window = window
        self.stride = stride
        self.keep = keep
        self.tn_fullseq = tn_fullseq
        if variables is None:
            x0 = jnp.zeros((1, 1, 224, 416, 3), jnp.float32)
            variables = self.model.init(jax.random.PRNGKey(rng_seed), x0,
                                        static=True)
        self.variables = jax.tree_util.tree_map(jnp.asarray, variables)

    @functools.lru_cache(maxsize=16)
    def _compiled(self, fc: int, hw: Tuple[int, int],
                  sal_hw: Tuple[int, int], cfg: GeometryConfig,
                  fps: float, skip: int, n_ratios: int = 0):
        from retargetvid_tpu.utils.cache import shared_program, tree_signature

        # Parameters are jit ARGUMENTS, so equal-config instances trace the
        # identical program — share it process-wide (the test suite builds
        # many equal programs; each duplicate trace costs seconds).
        # w_final/h_final ride as traced args: both benchmark ratios run
        # the SAME compiled program.  n_ratios == 0 -> scalar targets; >= 1
        # -> shape-(R,) targets with the geometry tail vmapped (the
        # saliency/TransNet work is shared across the R ratios).
        key = ('oneshot', repr(self.model), repr(self.tn_model), self.source,
               jnp.dtype(self.dtype).name, self.t_border, self.s_pad,
               self.window, self.stride, self.keep, self.tn_fullseq,
               tree_signature(self.variables), tree_signature(self.tn_params),
               fc, hw, sal_hw, cfg, fps, skip, n_ratios)
        return shared_program(key, lambda: self._build(
            fc, hw, sal_hw, cfg, fps, skip, n_ratios))

    def _build(self, fc: int, hw: Tuple[int, int],
               sal_hw: Tuple[int, int], cfg: GeometryConfig,
               fps: float, skip: int, n_ratios: int = 0):
        h_orig, w_orig = hw
        sal_h, sal_w = sal_hw
        t_sel_pad = bucket_size(fc // skip + 2 + self.s_pad)
        t_out = bucket_size(fc)
        s_pad = self.s_pad
        net_hw = get_optimal_out_size((sal_h, sal_w))
        window, stride, keep = self.window, self.stride, self.keep
        tn_model = self.tn_model

        body = make_oneshot_body(
            self.model, tn_model, source=self.source, dtype=self.dtype,
            t_border=self.t_border, cfg=cfg, fc=fc, sal_hw=(sal_h, sal_w),
            net_hw=net_hw, t_out=t_out, t_sel_pad=t_sel_pad, s_pad=s_pad,
            skip=skip, fps=fps, h_orig=h_orig, w_orig=w_orig,
            window=window, stride=stride,
            keep=keep, tn_fullseq=self.tn_fullseq)

        spec_holder = {}

        def fn(variables, tn_params, raw, w_final, h_final):
            vec, spec = pack_clip_outputs(
                body(variables, tn_params, raw, jnp.int32(fc),
                     w_final, h_final))
            spec_holder.update(spec)
            return vec

        zero_wh = (jnp.int32(0) if n_ratios == 0
                   else jnp.zeros((n_ratios,), jnp.int32))
        zero_args = (
            jax.tree_util.tree_map(
                lambda v: jnp.zeros(np.shape(v), v.dtype), self.variables),
            jax.tree_util.tree_map(
                lambda v: jnp.zeros(np.shape(v), v.dtype), self.tn_params),
            jnp.zeros((fc, h_orig, w_orig, 3), jnp.uint8),
            zero_wh, zero_wh)
        jax.eval_shape(fn, *zero_args)
        return jax.jit(fn), dict(spec_holder)

    def dispatch(self, raw_frames, crop_params: dict, *, fps: float,
                 w_final: int, h_final: int):
        """Enqueue the clip program WITHOUT fetching its outputs.

        Returns an opaque ticket for :meth:`collect`.  XLA dispatch is
        asynchronous, so a caller can enqueue clip N+1 while clip N still
        executes — the steady-state production pattern (and how
        ``bench.py`` measures pipelined throughput): device execution and
        the dispatch/fetch link overlap instead of alternating.
        """
        from retargetvid_tpu.pipeline.ingest import sal_dims

        fc, h, w = (int(raw_frames.shape[0]), int(raw_frames.shape[1]),
                    int(raw_frames.shape[2]))
        sal_h, sal_w = sal_dims(w, h, crop_params['max_input_d'])
        cfg = GeometryConfig.from_crop_params(crop_params)
        fn, spec = self._compiled(fc, (h, w), (sal_h, sal_w), cfg,
                                  float(fps), int(crop_params['skip']))
        vec = fn(self.variables, self.tn_params, raw_frames,
                 jnp.int32(w_final), jnp.int32(h_final))
        return vec, spec, fc, int(crop_params['skip'])

    def collect(self, ticket) -> dict:
        """Fetch + unpack a :meth:`dispatch` ticket (blocks on the value)."""
        vec, spec, fc, skip = ticket
        out = unpack_clip_outputs(np.asarray(vec), spec)
        out['boxes'] = out['boxes'][:fc].astype(np.int32)
        out['fc_sel'] = int(out['fc_sel'])
        out['n_segments'] = int(out['n_segments'])
        t_sel_pad = bucket_size(fc // skip + 2 + self.s_pad)
        if out['n_segments'] > self.s_pad or out['fc_sel'] > t_sel_pad:
            raise ValueError(
                f'clip exceeds one-shot static bounds '
                f'({out["n_segments"]} shots > s_pad={self.s_pad} or '
                f'{out["fc_sel"]} picks > t_sel_pad={t_sel_pad}); '
                'use the 2-dispatch path')
        return out

    def run(self, raw_frames, crop_params: dict, *, fps: float,
            w_final: int, h_final: int) -> dict:
        """(fc, H, W, 3) uint8 device frames -> outputs dict (ONE fetch)."""
        return self.collect(self.dispatch(raw_frames, crop_params, fps=fps,
                                          w_final=w_final, h_final=h_final))

    def dispatch_multi(self, raw_frames, crop_params: dict, *, fps: float,
                       dests):
        """Enqueue ONE program computing boxes for R output ratios.

        ``dests``: sequence of (w_final, h_final).  Ingest resizes, the
        TransNet plan, sampling/scene scans and the UNISAL forward run
        ONCE; only the geometry tail is replicated (vmapped) per ratio —
        for the reference benchmark's 2-ratio protocol this does the 2x
        saliency work of the per-ratio loop once (the reference gets the
        same sharing only via its on-disk ``vid_data`` feature cache,
        ``smartVidCrop.py`` per-ratio loop)."""
        from retargetvid_tpu.pipeline.ingest import sal_dims

        fc, h, w = (int(raw_frames.shape[0]), int(raw_frames.shape[1]),
                    int(raw_frames.shape[2]))
        sal_h, sal_w = sal_dims(w, h, crop_params['max_input_d'])
        cfg = GeometryConfig.from_crop_params(crop_params)
        dests = list(dests)
        fn, spec = self._compiled(fc, (h, w), (sal_h, sal_w), cfg,
                                  float(fps), int(crop_params['skip']),
                                  n_ratios=len(dests))
        wf = jnp.asarray([int(d[0]) for d in dests], jnp.int32)
        hf = jnp.asarray([int(d[1]) for d in dests], jnp.int32)
        vec = fn(self.variables, self.tn_params, raw_frames, wf, hf)
        return vec, spec, fc, int(crop_params['skip']), len(dests)

    def collect_multi(self, ticket) -> list:
        """Fetch a :meth:`dispatch_multi` ticket -> one outputs dict per
        ratio (ratio-independent keys repeated in each)."""
        vec, spec, fc, skip, n_ratios = ticket
        out = unpack_clip_outputs(np.asarray(vec), spec)
        fc_sel = int(out['fc_sel'])
        n_segments = int(out['n_segments'])
        t_sel_pad = bucket_size(fc // skip + 2 + self.s_pad)
        if n_segments > self.s_pad or fc_sel > t_sel_pad:
            raise ValueError(
                f'clip exceeds one-shot static bounds '
                f'({n_segments} shots > s_pad={self.s_pad} or '
                f'{fc_sel} picks > t_sel_pad={t_sel_pad}); '
                'use the 2-dispatch path')
        ratio_keys = ('boxes', 'dx', 'dy', 'dxs', 'dys', 'dxi', 'dyi',
                      'jumps', 'fbb_w', 'fbb_h')
        outs = []
        for r in range(n_ratios):
            o = {k: (v[r] if k in ratio_keys else v)
                 for k, v in out.items()}
            o['boxes'] = np.asarray(o['boxes'])[:fc].astype(np.int32)
            o['fc_sel'] = fc_sel
            o['n_segments'] = n_segments
            outs.append(o)
        return outs
