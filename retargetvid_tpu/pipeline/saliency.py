"""Saliency inference wrapper: fused on-device preprocessing + UNISAL.

Reference path (``unisal/train.py:1255-1279`` + ``unisal/data.py:1241-1313``):
per frame, PIL-LANCZOS resize to a x32 grid, ToTensor, ImageNet normalize,
single-frame static forward, exp, per-frame max-normalize to uint8.

TPU design: the resize is the Lanczos matmul from ``ops.resize`` and fuses
with the normalize and the backbone's first conv inside one jit; frames batch
across the clip (vmap semantics via a leading batch axis) instead of the
reference's one-frame-at-a-time loop.  Chunks are bucketized so at most a
couple of program shapes compile.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from retargetvid_tpu.models.unisal import UNISAL
from retargetvid_tpu.ops.resize import resize, round_half_up

__all__ = ["get_optimal_out_size", "preprocess_frames", "SaliencyPredictor",
           "IMAGENET_MEAN", "IMAGENET_STD"]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def get_optimal_out_size(img_size: Tuple[int, int]) -> Tuple[int, int]:
    """Pick the x32 network input grid best matching the aspect ratio.

    Parity with reference ``unisal/data.py:1086-1103``: (n1, n2) in [7,13]^2
    with 100 <= n1*n2 <= 120 maximizing aspect similarity, times 32.
    """
    ar = img_size[0] / img_size[1]
    best, best_ratio = None, -1.0
    for n1 in range(7, 14):
        for n2 in range(7, 14):
            if 100 <= n1 * n2 <= 120:
                this_ar = n1 / n2
                ratio = min(ar, this_ar) / max(ar, this_ar)
                if ratio > best_ratio:
                    best_ratio = ratio
                    best = (n1, n2)
    return (best[0] * 32, best[1] * 32)


def preprocess_frames(frames, out_size: Tuple[int, int]):
    """uint8 (B, H, W, 3) -> normalized float32 (B, h, w, 3), on device.

    LANCZOS resize (PIL semantics incl. the uint8 rounding PIL applies before
    ToTensor), /255, ImageNet normalize.
    """
    x = resize(jnp.asarray(frames), out_size, 'lanczos')
    x = jnp.clip(round_half_up(x), 0, 255) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (x - mean) / std


class SaliencyPredictor:
    """Batched static-mode UNISAL inference producing uint8 saliency maps.

    ``predict(frames)``: uint8 (T, H, W, 3) RGB -> uint8 (T, H, W) maps with
    the reference's per-frame exp + max-normalize postprocessing
    (``train.py:1267-1274``).
    """

    def __init__(self, variables=None, model: Optional[UNISAL] = None,
                 source: str = 'SALICON', chunk: int = 32,
                 dtype=jnp.float32, rng_seed: int = 0):
        self.model = model or UNISAL()
        self.source = source
        self.chunk = chunk
        self.dtype = dtype
        if variables is None:
            x0 = jnp.zeros((1, 1, 224, 416, 3), jnp.float32)
            # Init the dynamic path so the tree includes the RNN parameters
            # (the static forward simply never reads them).
            variables = self.model.init(
                jax.random.PRNGKey(rng_seed), x0,
                static=not getattr(self.model, 'with_rnn', False))
        # Parameters ride as jit arguments: pin them on device ONCE so a
        # numpy checkpoint tree is not re-uploaded on every dispatch.
        self.variables = jax.tree_util.tree_map(jnp.asarray, variables)

    @functools.lru_cache(maxsize=16)
    def _compiled(self, batch: int, in_hw: Tuple[int, int],
                  net_hw: Tuple[int, int]):
        from retargetvid_tpu.utils.cache import shared_program, tree_signature

        key = ('saliency-static', repr(self.model), self.source,
               jnp.dtype(self.dtype).name, tree_signature(self.variables),
               batch, in_hw, net_hw)
        return shared_program(key, lambda: self._build(in_hw, net_hw))

    def _build(self, in_hw: Tuple[int, int], net_hw: Tuple[int, int]):
        model = self.model
        source = self.source

        # Parameters enter as a jit argument (closed-over device arrays
        # would lower as MLIR constants AND pin the program to one
        # instance's weights, defeating the shared trace cache).
        def fn(variables, frames):
            x = preprocess_frames(frames, net_hw).astype(self.dtype)
            x = x[:, None]                          # (B, T=1, h, w, 3)
            logp, _ = model.apply(variables, x, target_size=in_hw,
                                  source=source, static=True)
            p = jnp.exp(logp[:, 0, :, :, 0].astype(jnp.float32))
            mx = jnp.max(p, axis=(1, 2), keepdims=True)
            p = jnp.where(mx > 0, p / mx, p) * 255.0
            return p.astype(jnp.uint8)

        return jax.jit(fn)

    def predict_video(self, frames, *, source: str = 'DHF1K',
                      frame_modulo: int = 4, seq_len: int = 6,
                      smooth_method=None) -> np.ndarray:
        """Dynamic (ConvGRU) whole-video saliency with the reference's
        interleaved frame-modulo scheme (``train.py:425-556``).

        Each of the ``frame_modulo`` phase-offset subsequences runs through
        the recurrent model in ``seq_len``-frame chunks with the hidden
        state carried across chunk boundaries (a host-level scan; the GRU
        inside each chunk is a ``lax.scan``); the per-offset predictions
        interleave back into frame order.  ``smooth_method`` optionally
        applies the reference's median/mean temporal smoother over the
        interleaved sequence (``utils.smooth_sequence``).

        Returns (T, H, W) uint8 maps.
        """
        from retargetvid_tpu.utils.cache import shared_program, tree_signature

        t, h, w, _ = frames.shape
        net_hw = get_optimal_out_size((h, w))
        frames = jnp.asarray(frames)
        model = self.model
        variables = self.variables
        sig = tree_signature(variables)

        def chunk_fn(n: int):
            # Shared process-wide: repeat predict_video calls (and equal-
            # config predictors) previously re-traced this program per CALL.
            key = ('saliency-dynamic', repr(model), source,
                   jnp.dtype(self.dtype).name, sig, (h, w), net_hw, n)

            def build():
                def fn(variables, batch, h0):
                    x = preprocess_frames(batch, net_hw).astype(self.dtype)
                    logp, h1 = model.apply(variables, x[None],
                                           target_size=(h, w),
                                           source=source, static=False, h0=h0)
                    return logp[0, :, :, :, 0].astype(jnp.float32), h1
                return jax.jit(fn)

            return shared_program(key, build)

        logps = np.zeros((t, h, w), np.float32)
        for offset in range(min(frame_modulo, t)):
            idx = list(range(offset, t, frame_modulo))
            h0 = None
            for s in range(0, len(idx), seq_len):
                sel = idx[s:s + seq_len]
                batch = frames[jnp.asarray(sel)]
                n = len(sel)
                if n < seq_len:           # ragged tail: pad, trim after
                    batch = jnp.concatenate(
                        [batch, jnp.repeat(batch[-1:], seq_len - n, axis=0)])
                logp, h0 = chunk_fn(seq_len)(variables, batch, h0)
                logps[sel] = np.asarray(logp)[:n]

        if smooth_method is not None:
            from retargetvid_tpu.utils.sequence import smooth_sequence
            logps = smooth_sequence(logps, smooth_method)

        p = np.exp(logps)
        mx = p.max(axis=(1, 2), keepdims=True)
        p = np.where(mx > 0, p / mx, p) * 255.0
        return p.astype(np.uint8)

    def predict(self, frames, return_device: bool = False):
        """Run saliency over (T, H, W, 3) uint8 frames -> (T, H, W) uint8.

        ``frames`` may be numpy or a device array; device inputs stay
        resident (chunk slicing happens on device) and with
        ``return_device=True`` the maps are returned as a device array too —
        the hot path then has zero host<->device traffic.
        """
        t, h, w, _ = frames.shape
        net_hw = get_optimal_out_size((h, w))
        fn = self._compiled(self.chunk, (h, w), net_hw)
        frames = jnp.asarray(frames)
        chunks = []
        for s in range(0, t, self.chunk):
            e = min(t, s + self.chunk)
            batch = frames[s:e]
            if e - s < self.chunk:                  # pad ragged tail
                batch = jnp.concatenate(
                    [batch, jnp.repeat(batch[-1:], self.chunk - (e - s),
                                       axis=0)], axis=0)
            chunks.append(fn(self.variables, batch)[:e - s])
        out = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks)
        return out if return_device else np.asarray(out)
