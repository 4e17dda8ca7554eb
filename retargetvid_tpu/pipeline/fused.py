"""Fully-fused per-clip program: selected frames -> crop boxes in ONE jit.

Chains the saliency model and the whole geometry pipeline inside a single
XLA program: gather of the sampled frames, Lanczos preprocess, UNISAL static
forward, per-frame max-normalize, border detection, pad-gate scores, and the
threshold->cluster->center->interpolate->smooth->boxes chain.  One dispatch
per clip (plus the TransNet/shot program) — on the tunneled dev TPU each
dispatch costs ~25ms, and a clip otherwise needs ~15 of them.

Shapes are bucketized on (selected-frame count, true-frame count); the
sampling indices, segment tables and live counts are data.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from retargetvid_tpu.models.unisal import UNISAL
from retargetvid_tpu.ops.border import border_detection, mean_saliency
from retargetvid_tpu.pipeline.geometry import (
    GeometryConfig,
    bucket_size,
    geometry_pipeline,
    seg_bucket_size,
)
from retargetvid_tpu.pipeline.saliency import get_optimal_out_size, preprocess_frames

__all__ = ["FusedClipProgram", "make_clip_fn"]


def make_clip_fn(model, *, source: str, dtype,
                 t_border: int, cfg: GeometryConfig,
                 in_hw: Tuple[int, int], net_hw: Tuple[int, int],
                 t_out: int, fps: float, h_orig: int, w_orig: int,
                 pallas_postprocess: bool = False):
    """The per-clip program body: sampled frames -> boxes + diagnostics.

    Pure (traceable) function of the clip's device arrays, reused by the
    single-clip :class:`FusedClipProgram` and vmapped over a clip axis by
    :class:`retargetvid_tpu.parallel.runner.ShardedClipRunner`.  The target
    dims ``w_final``/``h_final`` ride as TRACED arguments (the last two), so
    one compiled program serves every output ratio.

    Multi-ratio: pass ``w_final``/``h_final`` as shape-(R,) vectors and the
    geometry tail is vmapped over the R targets while the expensive
    ratio-INDEPENDENT work (frame gather, preprocess, the UNISAL forward,
    border detection) runs once — the reference's benchmark recomputes
    saliency per ratio unless its on-disk ``vid_data`` cache is warm
    (``smartVidCrop.py`` per-ratio loop); here the sharing happens inside
    one device program.  Ratio-dependent outputs then carry a leading R
    axis; ``mean_sal`` stays shared.
    """

    def fn(variables, sal_frames, sel_idx, sel_mask, fc_sel, true_inds,
           seg_starts, seg_ends, seg_sel_starts, seg_sel_ends,
           n_segments, fc, w_final, h_final):
        # Gather sampled frames (large contiguous rows -> efficient).
        sel = sal_frames[sel_idx]
        x = preprocess_frames(sel, net_hw).astype(dtype)
        logp, _ = model.apply(variables, x[:, None], target_size=in_hw,
                              source=source, static=True)
        if pallas_postprocess:
            # Hand-written VMEM kernel for the exp/max-normalize/uint8 tail
            # (A/B-measured against the XLA-fused inline version below —
            # docs/PERF.md "Pallas assessment").
            from retargetvid_tpu.ops.pallas_kernels import saliency_postprocess
            smaps = saliency_postprocess(
                logp[:, 0, :, :, 0].astype(jnp.float32)).astype(jnp.float32)
        else:
            p = jnp.exp(logp[:, 0, :, :, 0].astype(jnp.float32))
            mx = jnp.max(p, axis=(1, 2), keepdims=True)
            smaps = jnp.where(mx > 0, p / mx, p) * 255.0
            smaps = smaps.astype(jnp.uint8).astype(jnp.float32)
        smaps = jnp.where(sel_mask[:, None, None], smaps, 0.0)
        if cfg.quirk_batch_tail:
            # Reference ingest off-by-one: last selected frame's map stays
            # zero (smartVidCrop.py:409-421); keeps this path's outputs
            # identical to the sequential ingest's.
            t_idx = jnp.arange(smaps.shape[0])
            smaps = jnp.where((t_idx == fc_sel - 1)[:, None, None],
                              0.0, smaps)

        borders = border_detection(smaps, t_border, h_orig, w_orig)
        mean_sal, _ = mean_saliency(smaps)

        def geo(wf, hf):
            return geometry_pipeline(
                smaps, sel_mask, fc_sel, true_inds,
                seg_starts, seg_ends, seg_sel_starts, seg_sel_ends,
                n_segments, fc,
                borders['border_t'], borders['border_b'],
                borders['border_l'], borders['border_r'],
                cfg=cfg, fps=fps, h_orig=h_orig, w_orig=w_orig,
                w_final=wf, h_final=hf, t_out=t_out)

        if jnp.ndim(w_final) == 0:
            out = geo(w_final, h_final)
        else:
            # Multi-ratio: vmap ONLY the geometry tail over the R targets;
            # smaps/borders are closed over (broadcast, computed once).
            out = jax.vmap(geo)(jnp.asarray(w_final), jnp.asarray(h_final))
        return {'boxes': out['boxes'], 'mean_sal': mean_sal,
                'dx': out['dx'], 'dy': out['dy'],
                'dxs': out['dxs'], 'dys': out['dys'],
                'dxi': out['dxi'], 'dyi': out['dyi'],
                'jumps': out['jumps'],
                'fbb_w': out['fbb_w'], 'fbb_h': out['fbb_h']}

    return fn


def pack_clip_outputs(out: dict):
    """Flatten the per-clip output dict into ONE float32 vector.

    Each device->host fetch pays a full relay/PCIe round trip; the 11 small
    outputs cost far more in latency than in bytes, so they ship as a single
    buffer.  Box coordinates are < 2^24 so the int->float32 round trip is
    exact.  Returns (vector, spec) where spec maps keys to (offset, shape).
    """
    spec = {}
    parts = []
    off = 0
    canonical = ('boxes', 'dx', 'dy', 'dxs', 'dys', 'dxi', 'dyi', 'jumps',
                 'mean_sal', 'fbb_w', 'fbb_h')
    keys = [k for k in canonical if k in out] + \
        [k for k in out if k not in canonical]
    for k in keys:
        v = jnp.asarray(out[k], jnp.float32).reshape(-1)
        spec[k] = (off, tuple(np.shape(out[k])))
        parts.append(v)
        off += v.shape[0]
    return jnp.concatenate(parts), spec


def unpack_clip_outputs(vec: np.ndarray, spec: dict) -> dict:
    out = {}
    for k, (off, shape) in spec.items():
        n = int(np.prod(shape)) if shape else 1
        v = vec[off:off + n].reshape(shape)
        out[k] = v.astype(np.int32) if k == 'boxes' else v
    return out


class FusedClipProgram:
    """Compile-once runner for the post-shot-detection clip pipeline."""

    def __init__(self, variables=None, model: Optional[UNISAL] = None,
                 source: str = 'SALICON', dtype=jnp.bfloat16,
                 rng_seed: int = 0, t_border: int = -1,
                 pallas_postprocess: bool = False):
        self.model = model or UNISAL()
        self.source = source
        self.dtype = dtype
        self.t_border = t_border
        self.pallas_postprocess = pallas_postprocess
        if variables is None:
            x0 = jnp.zeros((1, 1, 224, 416, 3), jnp.float32)
            variables = self.model.init(jax.random.PRNGKey(rng_seed), x0,
                                        static=True)
        # Parameters ride as jit arguments: pin them on device ONCE so a
        # numpy checkpoint tree is not re-uploaded on every dispatch.
        self.variables = jax.tree_util.tree_map(jnp.asarray, variables)

    @functools.lru_cache(maxsize=16)
    def _compiled(self, t_sel_pad: int, t_out: int, s_pad: int,
                  in_hw: Tuple[int, int], net_hw: Tuple[int, int],
                  cfg: GeometryConfig, fps: float,
                  h_orig: int, w_orig: int):
        from retargetvid_tpu.utils.cache import shared_program, tree_signature

        # Parameters are jit ARGUMENTS (see below), so equal-config
        # instances trace the identical program — share it process-wide.
        # w_final/h_final are traced args too: one program per clip
        # signature serves BOTH benchmark ratios.
        key = ('fused', repr(self.model), self.source,
               jnp.dtype(self.dtype).name, self.t_border,
               self.pallas_postprocess, tree_signature(self.variables),
               t_sel_pad, t_out, s_pad, in_hw, net_hw, cfg, fps,
               h_orig, w_orig)
        return shared_program(key, lambda: self._build(
            t_sel_pad, t_out, s_pad, in_hw, net_hw, cfg, fps,
            h_orig, w_orig))

    def _build(self, t_sel_pad: int, t_out: int, s_pad: int,
               in_hw: Tuple[int, int], net_hw: Tuple[int, int],
               cfg: GeometryConfig, fps: float,
               h_orig: int, w_orig: int):
        fn = make_clip_fn(
            self.model, source=self.source, dtype=self.dtype,
            t_border=self.t_border, cfg=cfg, in_hw=in_hw, net_hw=net_hw,
            t_out=t_out, fps=fps, h_orig=h_orig, w_orig=w_orig,
            pallas_postprocess=self.pallas_postprocess)
        # Parameters enter as a jit argument: closed-over device arrays would
        # lower as MLIR constants, round-tripping the weights through the
        # host on every compile (tens of seconds on the tunneled link).
        spec_holder = {}

        def packed(*args):
            vec, spec = pack_clip_outputs(fn(*args))
            spec_holder.update(spec)
            return vec

        # Shape-only trace fills the spec without touching the device.
        zero_args = (
            jax.tree_util.tree_map(
                lambda v: jnp.zeros(np.shape(v), v.dtype), self.variables),
            jnp.zeros((1, *in_hw, 3), jnp.uint8),
            jnp.zeros(t_sel_pad, jnp.int32), jnp.zeros(t_sel_pad, bool),
            jnp.int32(0), jnp.zeros(t_sel_pad, jnp.int32),
            jnp.zeros(s_pad, jnp.int32), jnp.zeros(s_pad, jnp.int32),
            jnp.zeros(s_pad, jnp.int32), jnp.zeros(s_pad, jnp.int32),
            jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0))
        jax.eval_shape(packed, *zero_args)
        return jax.jit(packed), dict(spec_holder)

    def run(self, sal_frames, selected, true_inds, segmentation,
            segmentation_sel, crop_params: dict, *, fps: float,
            h_orig: int, w_orig: int, w_final: int, h_final: int,
            fc: int, seg_bucket: Optional[int] = None) -> dict:
        """Execute on (T_all, H, W, 3) device-resident frames.

        ``selected``: int indices of sampled frames; everything else as in
        :func:`retargetvid_tpu.pipeline.geometry.run_geometry`.
        """
        cfg = GeometryConfig.from_crop_params(crop_params)
        t_sel = len(selected)
        t_sel_pad = bucket_size(t_sel)
        t_out = bucket_size(fc)
        s = len(segmentation)
        s_pad = seg_bucket_size(s) if seg_bucket is None else (
            seg_bucket if s <= seg_bucket else bucket_size(s))
        h, w = int(sal_frames.shape[1]), int(sal_frames.shape[2])
        net_hw = get_optimal_out_size((h, w))

        sel_idx = np.zeros(t_sel_pad, np.int32)
        sel_idx[:t_sel] = np.asarray(selected, np.int32)
        sel_mask = np.zeros(t_sel_pad, bool)
        sel_mask[:t_sel] = True
        ti = np.zeros(t_sel_pad, np.int32)
        ti[:t_sel] = np.asarray(true_inds, np.int32)
        if t_sel > 0:
            ti[t_sel:] = ti[t_sel - 1] + np.arange(1, t_sel_pad - t_sel + 1)

        def pad_seg(arr, col):
            out = np.zeros(s_pad, np.int32)
            out[:s] = np.asarray(arr, np.int32)[:, col]
            return out

        fn, spec = self._compiled(t_sel_pad, t_out, s_pad, (h, w), net_hw,
                                  cfg, float(fps), int(h_orig), int(w_orig))
        vec = fn(self.variables, sal_frames,
                 jnp.asarray(sel_idx), jnp.asarray(sel_mask),
                 jnp.int32(t_sel), jnp.asarray(ti),
                 jnp.asarray(pad_seg(segmentation, 0)),
                 jnp.asarray(pad_seg(segmentation, 1)),
                 jnp.asarray(pad_seg(segmentation_sel, 0)),
                 jnp.asarray(pad_seg(segmentation_sel, 1)),
                 jnp.int32(s), jnp.int32(fc),
                 jnp.int32(w_final), jnp.int32(h_final))
        # ONE device->host transfer for all 11 outputs (latency-bound link).
        out = unpack_clip_outputs(np.asarray(vec), spec)
        out['boxes'] = out['boxes'][:fc]
        for k in ('dxi', 'dyi', 'dxs', 'dys'):
            out[k] = out[k][:fc]
        for k in ('dx', 'dy', 'jumps'):
            out[k] = out[k][:t_sel]
        return out
