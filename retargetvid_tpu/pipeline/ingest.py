"""Video ingest: decode, shot detection, frame sampling, saliency volume.

Behavioral parity with ``read_and_segment_video`` (``smartVidCrop.py:234-556``)
and ``ingest_pickle`` (``:560-836``):

- frames decode on a host thread and stream to the device in chunks;
- both resizes (48x27 for TransNet, max-dim-250 for saliency) run on device
  as matmuls in one jitted kernel per chunk;
- shot probabilities come from batched TransNet windows per read batch, with
  the reference's ``int(fps-5)``-frame overlap stitching (including its
  zero-padded first batch and zero-filled partial tail);
- frame sampling: every ``skip`` frames from the last selected, plus the
  frame after each shot cut and the final frame;
- scene list from thresholded probabilities with the boundary fix.

Returns the ``vid_data`` dict (reference contract: ``smaps``,
``segmentation``, ``segmentation_sel``, ``true_inds``, ``inds_to_orig``,
``fr``, ``fc``, ``fc_sel``, ``h/w_orig``, ``h/w_process``) with ``smaps`` in
(T, H, W) layout plus ``layout='thw'``.

The reference's per-batch off-by-one (the last selected frame of each read
batch never receives its saliency map, SURVEY.md §3.3) is REPLICATED by
default for exact parity with the published ``results/smartvidcrop`` boxes
(measured: 0.9984 vs 0.9918 mean box IoU against the reference orchestrator,
``tools/parity_full.py``); set ``crop_params['tpu_fix_batch_tail']=True`` to
use the real final-frame saliency instead.  The repair path (empty-center
fill) also still covers genuinely empty maps.
"""

from __future__ import annotations

import functools
import pickle
import time
from typing import Callable, Optional

import numpy as np

from retargetvid_tpu.ops.resize import round_half_up
from retargetvid_tpu.ops.scenes import (
    fix_scene_bounds,
    predictions_to_scenes,
    scenes_to_selected,
)
from retargetvid_tpu.utils.timing import sc_register_time

__all__ = ["read_and_segment_video", "ingest_pickle", "sample_frames",
           "TRANS_THRESHOLD", "TRANSNET_H", "TRANSNET_W"]

TRANSNET_H = 27
TRANSNET_W = 48
#: Transition probability threshold (reference ``smartVidCrop.py:64``).
TRANS_THRESHOLD = 0.1


@functools.lru_cache(maxsize=8)
def _resize_kernel(h: int, w: int, sal_h: int, sal_w: int):
    import jax
    import jax.numpy as jnp

    from retargetvid_tpu.ops.resize import resize

    def fn(frames):
        x = jnp.asarray(frames)
        tn = resize(x, (TRANSNET_H, TRANSNET_W), 'linear')
        sal = resize(x, (sal_h, sal_w), 'linear')
        to_u8 = lambda v: jnp.clip(round_half_up(v), 0, 255).astype(jnp.uint8)
        return to_u8(tn), to_u8(sal)

    return jax.jit(fn)


def sal_dims(w: int, h: int, max_input_d: int):
    """Saliency processing dims (reference ``smartVidCrop.py:252-254``)."""
    dsr = float(max(w, h)) / max_input_d
    return int(h / dsr), int(w / dsr)


def sample_frames(n_frames: int, trans_probs: np.ndarray, skip: int,
                  frame_count: int, start: int = 0,
                  prev_true_inds: Optional[list] = None):
    """Reference frame-selection rule over one batch (``:379-399``).

    Selects frame si+i when it is exactly ``skip`` after the last selected
    frame, or follows a frame whose transition probability exceeded the
    threshold, or is the first frame ever, or the video's final frame.
    Returns (selected_local_indices, true_inds_additions, map2orig_additions).
    """
    true_inds = prev_true_inds if prev_true_inds is not None else []
    selected = []
    map2orig = []
    total = len(true_inds) - 1
    for i in range(n_frames):
        f = start + i
        want = (f == true_inds[-1] + skip) if true_inds else True
        # "after shot change" == previous frame's prob above threshold; this
        # carries across read batches in the reference (:394-396).
        after_shot_change = f > 0 and bool(
            trans_probs[f - 1] > TRANS_THRESHOLD)
        if want or after_shot_change or f == frame_count - 1:
            total += 1
            selected.append(i)
            true_inds.append(f)
        map2orig.append(total)
    return selected, true_inds, map2orig


def read_and_segment_video(video_path, crop_params: dict,
                           transnet_fn: Callable,
                           saliency_fn: Callable,
                           verbose: bool = False,
                           quirk_batch_tail: Optional[bool] = None) -> dict:
    """Decode + shot detect + sample + saliency, streaming chunks to device.

    ``transnet_fn``: (N, 27, 48, 3) uint8 -> (N,) probs (whole-buffer window
    inference, e.g. ``models.transnet.predict_video_windows`` partial).
    ``saliency_fn``: (T, SAL_H, SAL_W, 3) uint8 -> (T, SAL_H, SAL_W) uint8.

    ``quirk_batch_tail`` replicates the reference's per-read-batch
    off-by-one: the last selected frame of each batch never receives its
    saliency map (``smartVidCrop.py:409-421``, SURVEY.md §3.3) and flows
    through the empty-center repair.  DEFAULT ON (None -> not
    ``crop_params['tpu_fix_batch_tail']``): the published
    ``results/smartvidcrop`` boxes include this behavior, and the
    full-orchestrator harness (``tools/parity_full.py``) measures
    replicate=0.9984 vs fix=0.9918 mean box IoU against the reference —
    set ``tpu_fix_batch_tail=True`` to use the real final-frame saliency
    instead (documented improvement, costs exact-parity).
    """
    if quirk_batch_tail is None:
        quirk_batch_tail = not crop_params.get('tpu_fix_batch_tail', False)
    from retargetvid_tpu.io.native_reader import open_reader
    from retargetvid_tpu.io.video import probe_video

    t0 = time.perf_counter()
    info = probe_video(video_path)
    fr, frame_count = info['fps'], info['frame_count']
    w, h = info['width'], info['height']

    batch_size = crop_params['read_batch']
    batch_overlap = int(fr - 5)
    skip = crop_params['skip']
    sal_h, sal_w = sal_dims(w, h, crop_params['max_input_d'])
    kernel = _resize_kernel(h, w, sal_h, sal_w)
    sc_register_time(t0, 'read_init')

    import jax.numpy as jnp

    reader = open_reader(video_path)

    trans_probs: list = []
    true_inds: list = []
    map2orig: list = []
    smaps_parts: list = []          # device arrays; concatenated at the end

    # Per-read-batch accumulation of device-resident resized chunks.
    tn_parts: list = []
    sal_parts: list = []
    tn_overlap_tail = jnp.zeros((batch_overlap, TRANSNET_H, TRANSNET_W, 3),
                                jnp.uint8) if batch_overlap > 0 else None
    bsi = 0
    batch_start = 0
    total_read = 0
    device_chunk = 256

    def flush_batch(cur_len):
        nonlocal tn_overlap_tail, batch_start, bsi, tn_parts, sal_parts
        tn_batch = jnp.concatenate(tn_parts) if len(tn_parts) > 1 \
            else tn_parts[0]
        sal_batch = jnp.concatenate(sal_parts) if len(sal_parts) > 1 \
            else sal_parts[0]
        pieces = []
        if batch_overlap > 0:
            pieces.append(tn_overlap_tail)
        pieces.append(tn_batch)
        # Zero tail: the reference predicts over its zero-filled buffer;
        # only ~75 trailing zero frames can influence the probs we keep.
        pieces.append(jnp.zeros((75, TRANSNET_H, TRANSNET_W, 3), jnp.uint8))
        tn_context = jnp.concatenate(pieces)
        _process_batch(tn_context, sal_batch, cur_len, batch_start,
                       batch_overlap, frame_count, skip,
                       transnet_fn, saliency_fn,
                       trans_probs, true_inds, map2orig, smaps_parts,
                       quirk_batch_tail=quirk_batch_tail)
        if batch_overlap > 0:
            tn_overlap_tail = tn_batch[-batch_overlap:]
        batch_start += cur_len
        bsi = 0
        tn_parts = []
        sal_parts = []

    t_read = time.perf_counter()
    for chunk, cstart in reader.chunks(device_chunk):
        tn, sal = kernel(chunk)      # chunk lands on device once, stays there
        k = len(chunk)
        total_read += k
        pos = 0
        while pos < k:
            take = min(batch_size - bsi, k - pos)
            tn_parts.append(tn[pos:pos + take])
            sal_parts.append(sal[pos:pos + take])
            bsi += take
            pos += take
            if bsi == batch_size:
                flush_batch(batch_size)
    sc_register_time(t_read, '_read')
    reader.stop()

    if bsi > 0:
        flush_batch(bsi)

    true_frame_count = total_read

    t_tidy = time.perf_counter()
    smaps = (jnp.concatenate(smaps_parts) if len(smaps_parts) > 1
             else smaps_parts[0]) if smaps_parts else \
        np.zeros((0, sal_h, sal_w), np.uint8)

    segmentation = predictions_to_scenes(np.array(trans_probs),
                                         threshold=TRANS_THRESHOLD)
    segmentation = fix_scene_bounds(segmentation, true_frame_count)
    segmentation_sel = scenes_to_selected(segmentation, map2orig)

    vid_data = {
        'layout': 'thw',
        'smaps': smaps,
        'segmentation': segmentation,
        'segmentation_sel': segmentation_sel,
        'true_inds': true_inds,
        'inds_to_orig': map2orig,
        'fr': fr,
        'fc': true_frame_count,
        'fc_sel': smaps.shape[0],
        'h_orig': h, 'w_orig': w,
        'h_process': sal_h, 'w_process': sal_w,
    }
    _sanity_checks(vid_data, frame_count)
    sc_register_time(t_tidy, 'read_tidy')
    return vid_data


def _process_batch(tn_context, sal_batch, cur_len, batch_start,
                   batch_overlap, frame_count, skip, transnet_fn,
                   saliency_fn, trans_probs, true_inds, map2orig,
                   smaps_parts, quirk_batch_tail: bool = False):
    """Shot-detect + sample + saliency for one read batch (device-resident).

    ``tn_context``: device (overlap + cur_len + 75, 27, 48, 3) — previous
    batch tail + this batch + the reference's zero tail.
    ``sal_batch``: device (cur_len, SAL_H, SAL_W, 3).
    """
    import jax.numpy as jnp

    t = time.perf_counter()
    probs = np.asarray(transnet_fn(tn_context))
    for i in range(cur_len):
        trans_probs.append(float(probs[batch_overlap + i]))
    sc_register_time(t, '_read_shot_det')

    t = time.perf_counter()
    selected, _, m2o = sample_frames(
        cur_len, np.array(trans_probs), skip, frame_count,
        start=batch_start, prev_true_inds=true_inds)
    map2orig.extend(m2o)
    if selected:
        sel_frames = sal_batch[jnp.asarray(np.array(selected))]
        sm = saliency_fn(sel_frames)
        if quirk_batch_tail:
            # Reference off-by-one: smaps[:, :, si:ei] from frames[:process_
            # ind] leaves the batch's final selected map zero (:409-421).
            sm = np.asarray(sm).copy()
            sm[-1] = 0
        smaps_parts.append(sm)
    sc_register_time(t, '_read_sal_det')


def _sanity_checks(vd: dict, frame_count: int):
    """The reference's seven structural invariants (``:519-545``), raising."""
    problems = []
    if vd['fc'] > frame_count:
        problems.append('fc exceeds container frame count')
    if vd['fc_sel'] != len(vd['true_inds']):
        problems.append('fc_sel != len(true_inds)')
    if vd['fc'] != len(vd['inds_to_orig']):
        problems.append('fc != len(inds_to_orig)')
    if vd['fc_sel'] != vd['smaps'].shape[0]:
        problems.append('fc_sel != smaps frames')
    if vd['segmentation'][-1][-1] != vd['fc'] - 1:
        problems.append('segmentation end mismatch')
    if vd['segmentation_sel'][-1][-1] != vd['fc_sel'] - 1:
        problems.append('segmentation_sel end mismatch')
    if vd['inds_to_orig'][-1] != vd['fc_sel'] - 1:
        problems.append('inds_to_orig tail mismatch')
    if problems:
        raise ValueError('ingest sanity checks failed: ' + '; '.join(problems))


def ingest_pickle(pkl_path, crop_params: dict,
                  saliency_fn: Callable, verbose: bool = False) -> dict:
    """Ingest the reference's web-service pickle contract (``:560-836``).

    The pickle holds ``fr``, ``frame_count``, ``w``, ``h``, ``frames``
    (decoded RGB uint8) and precomputed ``trans_inds`` shot-cut indices —
    TransNet is skipped.
    """
    import jax.numpy as jnp

    with open(pkl_path, 'rb') as fp:
        data = pickle.load(fp)
    fr = data['fr']
    frame_count = int(data['frame_count'])
    w, h = int(data['w']), int(data['h'])
    frames = np.asarray(data['frames'])
    trans_inds = list(data.get('trans_inds', []))
    skip = crop_params['skip']

    sal_h, sal_w = sal_dims(w, h, crop_params['max_input_d'])
    kernel = _resize_kernel(frames.shape[1], frames.shape[2], sal_h, sal_w)
    _, sal_frames = kernel(frames)
    sal_frames = np.asarray(sal_frames)

    n = len(frames)
    probs = np.zeros(n, np.float32)
    for ti in trans_inds:
        if 0 <= ti < n:
            probs[ti] = 1.0

    selected, true_inds, map2orig = sample_frames(
        n, probs, skip, n, start=0, prev_true_inds=None)
    smaps = np.asarray(saliency_fn(sal_frames[np.array(selected)]))
    if not crop_params.get('tpu_fix_batch_tail', False) and len(smaps):
        # Reference off-by-one, same as read_and_segment_video
        # (``smartVidCrop.py:696-709``): last selected map stays zero.
        smaps = smaps.copy()
        smaps[-1] = 0

    segmentation = predictions_to_scenes(probs, threshold=TRANS_THRESHOLD)
    segmentation = fix_scene_bounds(segmentation, n)
    segmentation_sel = scenes_to_selected(segmentation, map2orig)

    vid_data = {
        'layout': 'thw',
        'smaps': smaps,
        'segmentation': segmentation,
        'segmentation_sel': segmentation_sel,
        'true_inds': true_inds,
        'inds_to_orig': map2orig,
        'fr': fr,
        'fc': n,
        'fc_sel': smaps.shape[0],
        'h_orig': h, 'w_orig': w,
        'h_process': sal_h, 'w_process': sal_w,
    }
    _sanity_checks(vid_data, frame_count)
    return vid_data


def load_vid_data(path) -> dict:
    """Load a cached ``vid_data`` pickle; accepts the reference's (H, W, T)
    smaps layout and converts to (T, H, W)."""
    with open(path, 'rb') as fp:
        vd = pickle.load(fp)
    if vd.get('layout') != 'thw':
        vd['smaps'] = np.moveaxis(vd['smaps'], -1, 0)
        vd['layout'] = 'thw'
    return vd


def save_vid_data(path, vd: dict) -> None:
    vd = dict(vd)
    vd['smaps'] = np.asarray(vd['smaps'])     # device arrays don't pickle
    with open(path, 'wb') as fp:
        pickle.dump(vd, fp)


def read_video_structure(video_path, crop_params: dict,
                         transnet_fn: Callable) -> dict:
    """Decode + resize + shot-detect + sample, DEFERRING saliency.

    Returns the clip dict consumed by
    :class:`retargetvid_tpu.parallel.runner.ShardedClipRunner` /
    :func:`group_clips`: ``sal_frames`` is the whole resized frame volume
    (numpy uint8) so the sharded SPMD program can run gather + saliency +
    geometry on device.  Clips up to ``read_batch`` frames go through one
    whole-buffer shot-detection dispatch; longer clips stream through the
    same ``read_batch``/``int(fps-5)``-overlap batch stitching as the
    sequential ingest (the reference's streaming construct,
    ``smartVidCrop.py:248-374``), still deferring saliency.
    """
    from retargetvid_tpu.io.native_reader import open_reader
    from retargetvid_tpu.io.video import probe_video

    info = probe_video(video_path)
    fr, w, h = info['fps'], info['width'], info['height']
    skip = crop_params['skip']
    sal_h, sal_w = sal_dims(w, h, crop_params['max_input_d'])
    kernel = _resize_kernel(h, w, sal_h, sal_w)

    import jax.numpy as jnp

    reader = open_reader(video_path)
    raw_parts = [jnp.asarray(chunk) for chunk, _ in reader.chunks(256)]
    reader.stop()
    raw = jnp.concatenate(raw_parts) if len(raw_parts) > 1 else raw_parts[0]
    fc = int(raw.shape[0])

    from retargetvid_tpu.models.transnet import IngestShotProgram
    read_batch = crop_params['read_batch']
    if fc > read_batch:
        # Streaming shot detection: the sequential ingest's overlap-stitched
        # read batches (zero-padded first overlap, 75-frame zero tail per
        # batch), saliency-resolution frames kept whole for the SPMD phase.
        batch_overlap = int(fr - 5)
        tn_all, sal_frames = kernel(raw)
        if isinstance(transnet_fn, IngestShotProgram):
            from retargetvid_tpu.models.transnet import TransNetPredictor
            probs_fn = TransNetPredictor(
                transnet_fn.model, transnet_fn.params,
                window=transnet_fn.window, stride=transnet_fn.stride,
                keep=transnet_fn.keep)
        else:
            probs_fn = transnet_fn
        probs_parts = []
        tail = jnp.zeros((batch_overlap,) + tuple(tn_all.shape[1:]),
                         tn_all.dtype) if batch_overlap > 0 else None
        zero_tail = jnp.zeros((75,) + tuple(tn_all.shape[1:]), tn_all.dtype)
        for start in range(0, fc, read_batch):
            batch = tn_all[start:start + read_batch]
            pieces = ([tail] if batch_overlap > 0 else []) + [batch, zero_tail]
            context = jnp.concatenate(pieces)
            p = np.asarray(probs_fn(context))
            probs_parts.append(p[batch_overlap:batch_overlap + len(batch)])
            if batch_overlap > 0:
                tail = batch[-batch_overlap:]
        probs = np.concatenate(probs_parts)
    elif isinstance(transnet_fn, IngestShotProgram):
        sal_frames, probs = transnet_fn(raw)
    else:
        tn, sal_frames = kernel(raw)
        probs = np.asarray(transnet_fn(tn))
    selected, true_inds, map2orig = sample_frames(fc, probs, skip, fc)
    segmentation = fix_scene_bounds(
        predictions_to_scenes(probs, TRANS_THRESHOLD), fc)
    segmentation_sel = scenes_to_selected(segmentation, map2orig)
    return {
        'sal_frames': np.asarray(sal_frames),
        'selected': selected,
        'true_inds': true_inds,
        'segmentation': segmentation,
        'segmentation_sel': segmentation_sel,
        'fc': fc,
        'fps': fr,
        'h_orig': h, 'w_orig': w,
    }
