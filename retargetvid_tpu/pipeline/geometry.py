"""The jit-compiled geometry pipeline: saliency volume -> crop boxes.

This is the on-device equivalent of the reference's host-side stage chain
(``smart_vid_crop``, ``smartVidCrop.py:2296-2522``):

    threshold -> clustering filter (+ cut-boundary map averaging) ->
    center-of-mass -> empty-center fill -> focus-jump scores + freezing ->
    per-segment interpolation -> Butterworth low-pass -> LOESS/Savgol ->
    crop boxes (+ optional time shift)

Everything after the saliency maps land in HBM runs inside ONE jitted
function over padded, bucketized shapes: frame counts, segment counts and
per-segment lengths are data (masked), only bucket sizes are compile-time.

Reference quirk preserved: the sequential cut-boundary averaging
(``smartVidCrop.py:2369-2373``) feeds frame i's *filtered* map into frame
i+1's filter input near shot cuts; a ``lax.scan`` recomputes exactly the
affected frames while the bulk of the clip filters in parallel via ``vmap``.
"""

from __future__ import annotations

import dataclasses
import functools
import jax
import jax.numpy as jnp
import numpy as np

from retargetvid_tpu.ops.boxes import compute_crop_boxes, shift_time
from retargetvid_tpu.ops.center import center_of_mass
from retargetvid_tpu.ops.clustering import _filter_one
from retargetvid_tpu.ops.filters import smooth_segments
from retargetvid_tpu.ops.focus import jump_saliency_scores
from retargetvid_tpu.ops.interpolate import interpolate_segments
from retargetvid_tpu.ops.morphology import close as morph_close
from retargetvid_tpu.ops.resize import (
    RESIZE_TYPE_TO_METHOD,
    resize,
    resize_by_factor,
    round_half_up,
)
from retargetvid_tpu.ops.temporal import fill_empty_centers, freeze_unstable_segments
from retargetvid_tpu.ops.threshold import threshold_saliency

__all__ = ["GeometryConfig", "geometry_pipeline", "run_geometry",
           "bucket_size", "seg_bucket_size"]

_BUCKETS = (32, 48, 64, 96, 128, 160, 192, 256, 320, 384, 512, 640, 768,
            1024, 1536, 2048, 3072, 4096, 6144, 8192)


def bucket_size(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return int(np.ceil(n / 4096) * 4096)


def seg_bucket_size(n: int) -> int:
    """Shot-segment count bucket.  Most DHF1K clips have 1-3 shots; the
    per-segment interpolation/smoothing work is proportional to the bucket,
    so small tiers save ~10x over a flat 64 (measured ~170 ms/clip)."""
    for b in (4, 8, 16, 32, 64):
        if n <= b:
            return b
    return bucket_size(n)


@dataclasses.dataclass(frozen=True)
class GeometryConfig:
    """Static (compile-time) pipeline parameters, from ``crop_params``."""
    t_threshold: int = 120
    clust_filt: bool = True
    hdbscan_min: int = 26
    select_sum: int = 2
    resize_factor: float = 1.0
    resize_type: int = 1
    op_close: bool = True
    value_bias: float = 1.0
    com_km: bool = True
    focus_stability: bool = False
    foces_stab_t: float = 60.0
    foces_stab_s: float = 1.5
    min_d_jump: float = 10.0
    skip: int = 6
    loess_filt: int = 1
    loess_w_secs: float = 2.0
    loess_degree: int = 2
    lp_filt: int = 1
    lp_cutoff: float = 2.0
    lp_order: int = 5
    shift_time: int = 0
    bridge: int = 1
    cc_iters: int = 12
    #: HDBSCAN mutual-reachability emulation (ops.clustering
    #: _adaptive_link_mask); None = fixed ``bridge`` dilation.
    adaptive_min_samples: int | None = None
    adaptive_max_radius: int = 4
    #: Replicate the reference ingest's off-by-one (last selected frame's
    #: saliency map stays zero).  Consumed by paths that COMPUTE saliency
    #: inside the program (pipeline.fused.make_clip_fn); the sequential
    #: ingest applies it host-side before geometry ever runs.
    quirk_batch_tail: bool = True

    @classmethod
    def from_crop_params(cls, cp: dict) -> "GeometryConfig":
        # Default OFF: the fixed 1-px bridge measured BEST against the
        # HDBSCAN oracle across every linking scheme tried (fixed bridge
        # 1/2, single-scale density gating, per-pixel core-radius disks) —
        # all plateau at ~2.7 px mean center distance on adversarial
        # speckle, *within the oracle's own instability* (a 1-px input
        # translation moves the oracle's center by mean 3.6 px; see
        # tools/hdbscan_stability.py and docs/PARITY.md).
        adaptive = None
        if cp.get('tpu_adaptive_link', False) and cp['clust_filt']:
            adaptive = cp.get('hdbscan_min_samples') or cp['hdbscan_min']
        return cls(
            adaptive_min_samples=adaptive,
            quirk_batch_tail=not cp.get('tpu_fix_batch_tail', False),
            t_threshold=cp['t_threshold'],
            clust_filt=cp['clust_filt'],
            hdbscan_min=cp['hdbscan_min'],
            select_sum=cp['select_sum'],
            resize_factor=float(cp['resize_factor']),
            resize_type=cp['resize_type'],
            op_close=cp['op_close'],
            value_bias=float(cp['value_bias']),
            com_km=cp['com_km'],
            focus_stability=cp['focus_stability'],
            foces_stab_t=float(cp['foces_stab_t']),
            foces_stab_s=float(cp['foces_stab_s']),
            min_d_jump=float(cp['min_d_jump']),
            skip=cp['skip'],
            loess_filt=cp['loess_filt'],
            loess_w_secs=float(cp['loess_w_secs']),
            loess_degree=cp['loess_degree'],
            lp_filt=cp['lp_filt'],
            lp_cutoff=float(cp['lp_cutoff']),
            lp_order=cp['lp_order'],
            shift_time=cp['shift_time'],
        )


def _cut_boundary_fixup(raw_full, pass1_full, cut_mask, fc_sel,
                        cfg: GeometryConfig, max_cuts: int | None = None):
    """Reproduce the sequential averaging of ``smartVidCrop.py:2369-2373``.

    For each i (in order): if i < fc_sel-2 and a cut index lies in
    {i-1, i, i+1}, frame i+1's filter INPUT becomes the uint8 average of the
    raw frame i+1 and frame i's OUTPUT.  Reference quirks reproduced exactly
    (measured by ``tools/parity_ablation.py`` to move final boxes by 1-5 px
    otherwise):

    - the sum wraps modulo 256 — the reference adds two uint8 maps before
      the float cast (``(VD['smaps'][:,:,i+1] + VD['smaps'][:,:,i])``), so
      pixels whose values sum past 255 alias;
    - the averaging happens at FULL process resolution, after the clustering
      filter's ``resize_factor`` upscale; the averaged map then goes through
      the filter's full downscale -> cluster -> upscale roundtrip.

    Only the affected frames are recomputed in the scan; the rest keep the
    parallel pass-1 result.
    """
    t, h, w = raw_full.shape
    if max_cuts is None:
        max_cuts = t
    idx = jnp.arange(t)
    prev_cut = jnp.concatenate([jnp.zeros(1, bool), cut_mask[:-1]])
    next_cut = jnp.concatenate([cut_mask[1:], jnp.zeros(1, bool)])
    avg_here = (prev_cut | cut_mask | next_cut) & (idx < fc_sel - 2)
    # needs_redo[i]: frame i's input was modified by step i-1.
    needs_redo = jnp.concatenate([jnp.zeros(1, bool), avg_here[:-1]])

    filt = functools.partial(
        _filter_one,
        min_cluster_size=cfg.hdbscan_min,
        select_sum=cfg.select_sum,
        bridge=cfg.bridge,
        cc_iters=cfg.cc_iters,
        adaptive_min_samples=cfg.adaptive_min_samples,
        adaptive_max_radius=cfg.adaptive_max_radius)
    min_points = cfg.hdbscan_min + 1
    method = RESIZE_TYPE_TO_METHOD.get(cfg.resize_type, 'linear')

    def refilter(inp_full):
        if cfg.resize_factor != 1.0:
            inp = jnp.clip(round_half_up(
                resize_by_factor(inp_full, cfg.resize_factor, method)),
                0, 255)
        else:
            inp = inp_full
        out, any_valid, n_points = filt(inp)
        if cfg.op_close:
            out = jnp.where(any_valid, morph_close(out, 5), out)
        out = jnp.where((n_points > min_points) & any_valid, out, inp)
        if cfg.resize_factor != 1.0:
            out = jnp.clip(round_half_up(resize(out, (h, w), 'linear')), 0, 255)
        # Empty maps skip the reference's resize roundtrip entirely
        # (smartVidCrop.py:1064-1065); zeros are roundtrip-invariant, so only
        # the all-zero input case needs no special handling.
        return out

    # Only ~3 frames per cut need the sequential recompute; gather them and
    # loop over that bounded subset instead of every frame (t steps -> K
    # steps; each step costs ~0.4 ms in dispatch/serialization alone).
    # Capacity: each cut position contributes at most 3 redo frames.  A
    # while_loop stops at the clip's ACTUAL redo count (data, not the
    # static capacity), so a 1-cut clip pays ~3 steps, not k_cap=30.
    k_cap = int(min(3 * (max_cuts + 1), t))
    redo_idx = jnp.nonzero(needs_redo, size=k_cap, fill_value=t)[0]
    n_redo = jnp.minimum(jnp.sum(needs_redo).astype(jnp.int32),
                         jnp.int32(k_cap))

    def cond(state):
        return state[0] < n_redo

    def body(state):
        k, prev_idx, prev_out, acc = state
        jc = redo_idx[k]            # k < n_redo, so jc < t (live) always
        raw_j = jax.lax.dynamic_index_in_dim(raw_full, jc, keepdims=False)
        pass1_prev = jax.lax.dynamic_index_in_dim(
            pass1_full, jnp.clip(jc - 1, 0, t - 1), keepdims=False)
        # Chained redos feed the previous step's output; otherwise the
        # previous frame kept its pass-1 result (redo indices ascend, so a
        # redone predecessor is always the immediately previous step).
        prev_map = jnp.where(prev_idx == jc - 1, prev_out, pass1_prev)
        inp = jnp.trunc(jnp.mod(raw_j + prev_map, 256.0) / 2.0)
        out = refilter(inp)
        acc = jax.lax.dynamic_update_index_in_dim(acc, out, jc, 0)
        return k + 1, jc, out, acc

    init = (jnp.int32(0), jnp.int32(-2), raw_full[0] * 0.0, pass1_full)
    return jax.lax.while_loop(cond, body, init)[3]


def geometry_pipeline(smaps, sel_mask, fc_sel, true_inds,
                      seg_starts, seg_ends, seg_sel_starts, seg_sel_ends,
                      n_segments, fc,
                      border_t, border_b, border_l, border_r,
                      *, cfg: GeometryConfig, fps: float,
                      h_orig: int, w_orig: int,
                      w_final: int, h_final: int,
                      t_out: int):
    """Full on-device geometry chain.  All array args padded/bucketized.

    Returns dict with ``boxes`` (t_out, 4) int32 plus diagnostics
    (dx/dy raw centers, jump scores, smoothed series).
    """
    smaps = jnp.asarray(smaps).astype(jnp.float32)
    t_sel_pad, h, w = smaps.shape

    # 1. threshold (smartVidCrop.py:2335)
    sm = threshold_saliency(smaps, cfg.t_threshold)

    # 2. clustering filter, parallel over frames (smartVidCrop.py:2359-2368)
    if cfg.clust_filt:
        method = RESIZE_TYPE_TO_METHOD.get(cfg.resize_type, 'linear')
        if cfg.resize_factor != 1.0:
            work = resize_by_factor(sm, cfg.resize_factor, method)
            work = jnp.clip(round_half_up(work), 0, 255)
        else:
            work = sm

        filt = functools.partial(
            _filter_one, min_cluster_size=cfg.hdbscan_min,
            select_sum=cfg.select_sum, bridge=cfg.bridge,
            cc_iters=cfg.cc_iters,
            adaptive_min_samples=cfg.adaptive_min_samples,
            adaptive_max_radius=cfg.adaptive_max_radius)
        filtered, any_valid, n_points = jax.vmap(filt)(work)
        if cfg.op_close:
            closed = morph_close(filtered, 5)
            filtered = jnp.where(any_valid[:, None, None], closed, filtered)
        use = (n_points > cfg.hdbscan_min + 1) & any_valid
        pass1 = jnp.where(use[:, None, None], filtered, work)
        if cfg.resize_factor != 1.0:
            pass1 = jnp.clip(round_half_up(resize(pass1, (h, w), 'linear')),
                             0, 255)

        # cut mask over selected-frame indices (segment starts + last end)
        cut_mask = jnp.zeros((t_sel_pad,), bool)
        live_seg = jnp.arange(seg_sel_starts.shape[0]) < n_segments
        cut_mask = cut_mask.at[jnp.clip(seg_sel_starts, 0, t_sel_pad - 1)
                               ].max(live_seg)
        last_end = jnp.clip(fc_sel - 1, 0, t_sel_pad - 1)
        cut_mask = cut_mask.at[last_end].set(True)

        # The sequential averaging runs at full process resolution on the
        # upscaled pass-1 outputs (reference order: filter -> upscale ->
        # average into the next frame's stored uint8 map).
        sm = _cut_boundary_fixup(sm, pass1, cut_mask, fc_sel, cfg,
                                 max_cuts=int(seg_sel_starts.shape[0]) + 1)

    # 3. centers (smartVidCrop.py:2402-2414)
    cx, cy, valid = center_of_mass(
        sm, km=cfg.com_km, factor=cfg.resize_factor, bias=cfg.value_bias)
    valid = valid & sel_mask

    # 4. empty-center fill (smartVidCrop.py:2421)
    pad_sentinel = jnp.int32(-10 ** 6)
    live_seg = jnp.arange(seg_sel_starts.shape[0]) < n_segments
    s_starts = jnp.where(live_seg, seg_sel_starts, pad_sentinel)
    s_ends = jnp.where(live_seg, seg_sel_ends, pad_sentinel)
    cx, cy = fill_empty_centers(cx, cy, valid, s_starts, s_ends,
                                frame_mask=sel_mask)

    # 5. focus stability (smartVidCrop.py:2425-2473)
    jumps = jnp.full((t_sel_pad,), 255.0, jnp.float32)
    if cfg.focus_stability:
        jumps = jump_saliency_scores(sm, cx, cy, min_d_jump=cfg.min_d_jump)
        jumps = jnp.where(sel_mask, jumps, 255.0)
        is_jump = (jumps < cfg.foces_stab_t) & sel_mask & \
                  (jnp.arange(t_sel_pad) >= 1)
        jump_inds = jnp.nonzero(is_jump, size=t_sel_pad,
                                fill_value=10 ** 6)[0].astype(jnp.int32)
        n_jumps = jnp.sum(is_jump)
        cx, cy = freeze_unstable_segments(
            cx, cy, jump_inds, n_jumps, fc_sel=fc_sel, skip=cfg.skip,
            fps=fps, stab_secs=cfg.foces_stab_s)

    # 6. per-segment interpolation to true frames (smartVidCrop.py:2479)
    max_samples = t_sel_pad
    max_len = t_out
    dxi = interpolate_segments(cx, true_inds, seg_starts, seg_ends,
                               seg_sel_starts, seg_sel_ends, n_segments,
                               t_out, max_samples, max_len)
    dyi = interpolate_segments(cy, true_inds, seg_starts, seg_ends,
                               seg_sel_starts, seg_sel_ends, n_segments,
                               t_out, max_samples, max_len)

    # 7. low-pass + smoothing per segment (smartVidCrop.py:2486-2489)
    dxs, dys, dxl, dyl = smooth_segments(
        dxi, dyi, seg_starts, seg_ends, n_segments,
        fps=fps, loess_filt=cfg.loess_filt, w_secs=cfg.loess_w_secs,
        degree=cfg.loess_degree, lp_filt=cfg.lp_filt,
        lp_cutoff=cfg.lp_cutoff, lp_order=cfg.lp_order, max_len=max_len)

    # 8. crop boxes (smartVidCrop.py:2513)
    h_process, w_process = h, w
    boxes, fbb_w, fbb_h = compute_crop_boxes(
        dxs, dys, w_orig=w_orig, h_orig=h_orig,
        w_process=w_process, h_process=h_process,
        w_final=w_final, h_final=h_final,
        border_t=border_t, border_b=border_b,
        border_l=border_l, border_r=border_r)

    # 9. optional time shift (smartVidCrop.py:2521)
    if cfg.shift_time > 0:
        boxes = shift_time(boxes, cfg.shift_time)

    return {
        'boxes': boxes,
        'fbb_w': fbb_w,
        'fbb_h': fbb_h,
        # All values are integral at this point (the reference stores the
        # filtered maps back into its uint8 array); uint8 halves the payload.
        'smaps_filtered': jnp.clip(sm, 0, 255).astype(jnp.uint8),
        'dx': cx, 'dy': cy,
        'jumps': jumps,
        'dxi': dxi, 'dyi': dyi,
        'dxs': dxs, 'dys': dys,
        'dxl': dxl, 'dyl': dyl,
    }


@functools.lru_cache(maxsize=32)
def _compiled_pipeline(cfg: GeometryConfig, fps: float, h_orig: int,
                       w_orig: int, t_out: int):
    # w_final/h_final are TRACED arguments (not compile keys): the target
    # dims only feed compute_crop_boxes' scalar math, so one compiled
    # program serves every output ratio (the 200x2 benchmark runs two).
    def fn(smaps, sel_mask, fc_sel, true_inds, seg_starts, seg_ends,
           seg_sel_starts, seg_sel_ends, n_segments, fc,
           border_t, border_b, border_l, border_r, w_final, h_final):
        return geometry_pipeline(
            smaps, sel_mask, fc_sel, true_inds, seg_starts, seg_ends,
            seg_sel_starts, seg_sel_ends, n_segments, fc,
            border_t, border_b, border_l, border_r,
            cfg=cfg, fps=fps, h_orig=h_orig, w_orig=w_orig,
            w_final=w_final, h_final=h_final, t_out=t_out)

    return jax.jit(fn)


def run_geometry(smaps, true_inds, segmentation,
                 segmentation_sel, crop_params: dict, *,
                 fps: float, h_orig: int, w_orig: int,
                 w_final: int, h_final: int, fc: int,
                 borders=(0, 0, 0, 0),
                 seg_bucket: int | None = None,
                 fetch_maps: bool = False) -> dict:
    """Host entry: pad/bucketize the ingest outputs and run the jitted chain.

    ``smaps``: (T_sel, H, W) uint8 saliency volume (selected frames), numpy
    OR a device array — device inputs stay resident (no host round trip; the
    only hot-path host<->device traffic is the tiny crop-box/series output).
    Set ``fetch_maps`` to also pull the filtered saliency volume (demo
    rendering); it is the one large output.
    """
    cfg = GeometryConfig.from_crop_params(crop_params)
    t_sel = smaps.shape[0]
    t_sel_pad = bucket_size(t_sel)
    t_out = bucket_size(fc)
    s = len(segmentation)
    s_pad = seg_bucket_size(s) if seg_bucket is None else (
        seg_bucket if s <= seg_bucket else bucket_size(s))

    # Pad the volume on device (cheap) instead of materializing on host.
    smaps_j = jnp.asarray(smaps)
    if t_sel_pad != t_sel:
        smaps_j = jnp.pad(smaps_j, ((0, t_sel_pad - t_sel), (0, 0), (0, 0)))
    sel_mask = np.zeros(t_sel_pad, bool)
    sel_mask[:t_sel] = True
    ti = np.zeros(t_sel_pad, np.int32)
    ti[:t_sel] = np.asarray(true_inds, np.int32)
    # Ascending continuation keeps interpolation gathers sane.
    if t_sel > 0:
        ti[t_sel:] = ti[t_sel - 1] + np.arange(1, t_sel_pad - t_sel + 1)

    def pad_seg(arr, col):
        out = np.zeros(s_pad, np.int32)
        out[:s] = np.asarray(arr, np.int32)[:, col]
        return out

    fn = _compiled_pipeline(cfg, float(fps), int(h_orig), int(w_orig),
                            int(t_out))
    out = fn(smaps_j, jnp.asarray(sel_mask),
             jnp.int32(t_sel), jnp.asarray(ti),
             jnp.asarray(pad_seg(segmentation, 0)),
             jnp.asarray(pad_seg(segmentation, 1)),
             jnp.asarray(pad_seg(segmentation_sel, 0)),
             jnp.asarray(pad_seg(segmentation_sel, 1)),
             jnp.int32(s), jnp.int32(fc),
             jnp.int32(borders[0]), jnp.int32(borders[1]),
             jnp.int32(borders[2]), jnp.int32(borders[3]),
             jnp.int32(w_final), jnp.int32(h_final))
    maps = out.pop('smaps_filtered')
    out = {k: np.asarray(v) for k, v in out.items()}
    if fetch_maps:
        out['smaps_filtered'] = np.asarray(maps)[:t_sel]
    out['boxes'] = out['boxes'][:fc]
    for k in ('dxi', 'dyi', 'dxs', 'dys', 'dxl', 'dyl'):
        out[k] = out[k][:fc]
    for k in ('dx', 'dy', 'jumps'):
        out[k] = out[k][:t_sel]
    return out
