"""Filtering-through-clustering, fully on device.

The reference selects each frame's main focus region by clustering the
nonzero (thresholded) saliency pixels with HDBSCAN and keeping only the
heaviest cluster (``sc_clustering_filt``, ``smartVidCrop.py:1062-1161``).
Hierarchical density clustering is hostile to TPU (dynamic point sets,
mutual-reachability graphs), so this module preserves the *decision* — which
pixels survive — with a vectorizable equivalent:

1. Binary mask of nonzero pixels, optionally dilated by ``bridge`` pixels to
   emulate HDBSCAN's density linking of nearby blobs.
2. Connected components by gather-free line relaxation: 3x3 min-pool for
   diagonal hops + segmented cumulative-min scans along full rows/columns
   (see :func:`connected_components`) — arbitrary gathers measured ~150x
   slower than scans on v5e, so the classic pointer-jumping CCL is avoided.
3. Per-component mass (sum or max of saliency, matching ``select_sum``) via
   one scatter-add/scatter-max into an (H*W,) table.
4. Components with fewer than ``min_cluster_size`` member pixels are noise
   (HDBSCAN ``min_cluster_size`` analog).  If no component survives, the frame
   passes through unfiltered (reference ``n_clusters == 0`` path).
5. All pixels outside the winning component are zeroed; optional 5x5
   morphological close (reference ``op_close``).

Everything is batched over frames with ``vmap`` — the whole clip filters in
one XLA program instead of a per-frame Python loop over an HDBSCAN fit.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from retargetvid_tpu.ops.morphology import close as morph_close
from retargetvid_tpu.ops.morphology import dilate as morph_dilate
from retargetvid_tpu.ops.resize import (
    RESIZE_TYPE_TO_METHOD,
    resize,
    resize_by_factor,
    round_half_up,
)

__all__ = ["connected_components", "clustering_filter"]


def _min_pool3(x):
    """3x3 min-pool with +inf-like padding, any (..., H, W)."""
    big = jnp.asarray(jnp.iinfo(jnp.int32).max, x.dtype)
    return -jax.lax.reduce_window(
        -x, -big, jax.lax.max,
        (1,) * (x.ndim - 2) + (3, 3),
        (1,) * x.ndim,
        [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)])


def _segmented_cummin(vals, reset, axis: int, reverse: bool = False):
    """Per-run cumulative min along ``axis``; runs reset where ``reset``.

    Segmented-scan monoid over (value, reset-flag) pairs — an
    ``associative_scan``, so it is log-depth VPU work with no gathers.
    """
    if reverse:
        vals = jnp.flip(vals, axis)
        reset = jnp.flip(reset, axis)

    def combine(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, jnp.minimum(av, bv)), af | bf

    out, _ = jax.lax.associative_scan(combine, (vals, reset), axis=axis)
    if reverse:
        out = jnp.flip(out, axis)
    return out


def connected_components(mask, n_iters: int = 12):
    """8-connected component labels of a boolean (H, W) mask.

    Returns int32 (H, W): each foreground pixel labeled with the smallest
    flat index of its component; background pixels get H*W.

    TPU-native line relaxation: each sweep does one 3x3 masked min-pool
    (diagonal hops) followed by segmented cumulative-min scans along full
    rows and columns in both directions — a whole straight run converges in
    ONE sweep, so a component needs roughly as many sweeps as its geodesic
    has axis turns.  No gathers/scatters anywhere (arbitrary gathers measured
    ~150x slower than scans on v5e).  ``n_iters`` sweeps; 8 handles any
    realistic saliency blob (use more for adversarial spirals).
    """
    mask = jnp.asarray(mask, dtype=bool)
    h, w = mask.shape
    bg_val = jnp.int32(h * w)
    flat_idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    labels = jnp.where(mask, flat_idx, bg_val)
    reset = ~mask

    def sweep(labels):
        pooled = _min_pool3(labels)
        labels = jnp.where(mask, jnp.minimum(labels, pooled), bg_val)
        labels = _segmented_cummin(labels, reset, axis=1)
        labels = _segmented_cummin(labels, reset, axis=1, reverse=True)
        labels = _segmented_cummin(labels, reset, axis=0)
        labels = _segmented_cummin(labels, reset, axis=0, reverse=True)
        return jnp.where(mask, labels, bg_val)

    # Early exit at the fixpoint: labels decrease monotonically, so a
    # sweep that changes nothing proves convergence and the remaining
    # sweeps would be no-ops (results identical to the fixed-trip loop;
    # realistic blobs settle in 2-4 sweeps, saving ~2/3 of the CCL time
    # in the one-shot program — docs/PERF.md).
    def cond(state):
        i, _, done = state
        return (i < n_iters) & ~done

    def body(state):
        i, labels, _ = state
        new = sweep(labels)
        return i + 1, new, jnp.array_equal(new, labels)

    _, labels, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), labels, jnp.bool_(False)))
    return labels


def _adaptive_link_mask(mask, min_samples: int, max_radius: int):
    """Density-adaptive dilation emulating HDBSCAN's mutual-reachability
    linking (``smartVidCrop.py:1062-1161, 2340-2348``).

    HDBSCAN (min_samples=k) joins points whose distance is within their
    core distances — isolated-but-near points chain across gaps a fixed
    1-px bridge cannot.  Emulation: each nonzero pixel's "core radius" is
    the smallest Chebyshev radius containing >= ``min_samples`` other
    nonzero pixels (box-count convolutions, r = 1..max_radius; counts are
    density, exactly HDBSCAN's quantity); the pixel is then dilated by
    half that radius, so two pixels link when their distance is within
    roughly the mean of their core radii.  Dense blob interiors get
    radius 1 (behaves like the fixed bridge); sparse speckle fields get
    larger radii and chain like the oracle.
    """
    m = mask.astype(jnp.float32)
    core = jnp.full(mask.shape, max_radius + 1, jnp.int32)
    for r in range(max_radius, 0, -1):
        k = 2 * r + 1
        cnt = jax.lax.reduce_window(m, 0.0, jax.lax.add, (k, k), (1, 1),
                                    [(r, r), (r, r)]) - m
        core = jnp.where(cnt >= min_samples, r, core)
    rho = (core + 1) // 2                       # dilation radius per pixel
    out = jnp.zeros_like(mask)
    for radius in range(0, (max_radius + 1 + 1) // 2 + 1):
        sel = mask & (rho == radius)
        if radius == 0:
            out = out | sel
        else:
            out = out | (morph_dilate(sel.astype(jnp.float32),
                                      2 * radius + 1) > 0.5)
    return out


def _filter_one(smap, *, min_cluster_size: int, select_sum: int,
                bridge: int, cc_iters: int,
                adaptive_min_samples: Optional[int] = None,
                adaptive_max_radius: int = 4):
    """Cluster-filter a single (H, W) float32 saliency map (factor-resized)."""
    h, w = smap.shape
    n_px = h * w
    mask = smap > 0

    if adaptive_min_samples is not None:
        link_mask = _adaptive_link_mask(mask, adaptive_min_samples,
                                        adaptive_max_radius)
    elif bridge > 0:
        link_mask = morph_dilate(mask.astype(jnp.float32),
                                 2 * bridge + 1) > 0.5
    else:
        link_mask = mask
    labels = connected_components(link_mask, n_iters=cc_iters)
    labels = jnp.where(mask, labels, n_px)          # only true pixels count
    flat_labels = labels.reshape(-1)
    flat_vals = smap.reshape(-1)

    # Component reductions by sort + segmented scans.  A scatter into an
    # (H*W + 1,) table costs ~3x more on v5e (measured 65 ms vs 22 ms for a
    # 96-frame batch at 140x250); sorting groups each component into a
    # contiguous run whose stats are cumulative-sum/max differences.
    # Saliency values are uint8-integral and labels fit 24 bits, so (label,
    # value) packs into ONE int32 sort key — a single-array sort, and the
    # ascending value order inside each run makes the run MAX simply the
    # run's last element (no segmented max scan).
    v_u8 = jnp.clip(flat_vals, 0, 255).astype(jnp.int32)
    packed = flat_labels * 256 + v_u8
    sp = jax.lax.sort(packed)
    sl = sp >> 8
    sv = (sp & 255).astype(jnp.float32)
    newseg = jnp.concatenate([jnp.ones(1, bool), sl[1:] != sl[:-1]])
    is_last = jnp.concatenate([sl[1:] != sl[:-1], jnp.ones(1, bool)])

    def seg_carry(vals, seg):
        """Value at each position's segment start (inclusive scan)."""
        return jax.lax.associative_scan(
            lambda a, b: (jnp.where(b[1], b[0], a[0]), a[1] | b[1]),
            (vals, seg))[0]

    cnt = jnp.arange(1, n_px + 1, dtype=jnp.float32)
    start_cnt = seg_carry(jnp.where(newseg, cnt - 1.0, 0.0), newseg)
    sizes = cnt - start_cnt                          # run length so far

    if select_sum == 1:
        cv = jnp.cumsum(sv)
        start_cv = seg_carry(jnp.where(newseg, cv - sv, 0.0), newseg)
        weights = cv - start_cv                      # run sum so far
    else:
        weights = sv                                 # at run end: run max

    valid = is_last & (sizes >= min_cluster_size) & (sl < n_px)
    any_valid = jnp.any(valid)
    # argmax picks the first (= lowest-label) run on ties, matching the
    # reference's weights.index(max(weights)).
    winner = sl[jnp.argmax(jnp.where(valid, weights, -jnp.inf))]

    keep = flat_labels == winner
    filtered = jnp.where(keep.reshape(h, w), smap, 0.0)

    # Reference semantics: with zero clusters the map passes through; the
    # per-frame "enough points" gate (X.shape[0] > hdbscan_min + 1) is applied
    # by the caller, as is op_close.
    n_points = jnp.sum(mask)
    return filtered, any_valid, n_points


def clustering_filter(smaps,
                      *,
                      min_cluster_size: int = 26,
                      select_sum: int = 2,
                      resize_factor: float = 1.0,
                      resize_type: int = 1,
                      op_close: bool = True,
                      bridge: int = 1,
                      cc_iters: int = 12,
                      min_points: Optional[int] = None,
                      adaptive_min_samples: Optional[int] = None,
                      adaptive_max_radius: int = 4):
    """Apply the clustering filter to a (T, H, W) saliency volume.

    Reference behavior map (``smartVidCrop.py:1062-1161``):

    - ``resize_factor`` / ``resize_type``: maps are shrunk by ``1/factor``
      before clustering and scaled back bilinearly after.
    - frames with ``<= min_points`` nonzero pixels (reference
      ``hdbscan_min + 1``) pass through unfiltered.
    - ``select_sum == 1`` keeps the cluster with the largest saliency sum,
      otherwise the cluster containing the largest single value.
    - ``op_close``: 5x5 morphological close of the surviving blob.
    - ``adaptive_min_samples``: density-adaptive linking emulating HDBSCAN's
      mutual reachability (see :func:`_adaptive_link_mask`); when None, a
      fixed ``bridge``-px dilation links near-adjacent pixels.

    Returns float32 (T, H, W).
    """
    smaps = jnp.asarray(smaps).astype(jnp.float32)
    t, h, w = smaps.shape
    if min_points is None:
        min_points = min_cluster_size + 1

    method = RESIZE_TYPE_TO_METHOD.get(resize_type, 'linear')
    work = smaps
    if resize_factor != 1.0:
        work = resize_by_factor(smaps, resize_factor, method)
        # uint8 saturation parity with cv2's fixed-point resize output
        work = jnp.clip(round_half_up(work), 0, 255)

    filt = functools.partial(
        _filter_one, min_cluster_size=min_cluster_size,
        select_sum=select_sum, bridge=bridge, cc_iters=cc_iters,
        adaptive_min_samples=adaptive_min_samples,
        adaptive_max_radius=adaptive_max_radius)
    filtered, any_valid, n_points = jax.vmap(filt)(work)

    if op_close:
        closed = morph_close(filtered, 5)
        filtered = jnp.where(any_valid[:, None, None], closed, filtered)

    # Pass-through conditions (per frame): too few points, or no cluster.
    use_filtered = (n_points > min_points) & any_valid
    out_small = jnp.where(use_filtered[:, None, None], filtered, work)

    if resize_factor != 1.0:
        out = resize(out_small, (h, w), 'linear')
        out = jnp.clip(round_half_up(out), 0, 255)
    else:
        out = out_small
    return out
