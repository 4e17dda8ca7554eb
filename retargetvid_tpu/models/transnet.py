"""TransNet V1 shot-boundary detector (flax, NDHWC, TPU-native).

Behavioral parity with the reference TF1 graph
(``transnetv1_handler.py:25-83``): input uint8 (B, T, 27, 48, 3) scaled by
1/255, then L=3 "SDDCNN" stages of S=2 "DDCNN" cells — each cell runs four
parallel 3x3x3 Conv3D branches with temporal dilations 1, 2, 4, 8 (ReLU,
bias) whose outputs concatenate on channels — followed by spatial 1x2x2 max
pooling; finally per-frame flatten, Dense(256)+ReLU, Dense(2), softmax[..1].

Window inference (``transnetv1_handler.py:100-130``): 100-frame sliding
windows with stride 50, edge-padded, keeping each window's middle 50
predictions.  On TPU the windows become ONE batched forward (B = n_windows)
instead of the reference's sequential session.run loop.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["TransNetV1", "TransNetPredictor", "predict_video_windows"]

INPUT_HEIGHT = 27
INPUT_WIDTH = 48


class _DilConvParams(nn.Module):
    """Parameter container matching ``nn.Conv``'s tree (kernel DHWIO + bias)."""
    in_ch: int
    filters: int

    def setup(self):
        self.kernel = self.param(
            'kernel', nn.initializers.lecun_normal(),
            (3, 3, 3, self.in_ch, self.filters))
        self.bias = self.param('bias', nn.initializers.zeros,
                               (self.filters,))

    def __call__(self):                                  # pragma: no cover
        return self.kernel, self.bias


def _tshift(y, s: int):
    """Shift along axis 1 with zero fill: out[t] = y[t - s]."""
    if s == 0:
        return y
    t = y.shape[1]
    pad = [(0, 0)] * y.ndim
    if s > 0:
        pad[1] = (s, 0)
        return jnp.pad(y, pad)[:, :t]
    pad[1] = (0, -s)
    return jnp.pad(y, pad)[:, -s:]


class DDCNN(nn.Module):
    """Four parallel temporally-dilated 3D convs, channel-concatenated.

    Computed EXACTLY as three 2-D convs (time folded into the batch) plus
    zero-padded temporal shifts: a SAME Conv3D with temporal dilation d is
    ``sum_j K[j] * x[t + (j-1)d]`` with zeros outside the clip, so each
    temporal tap is a plain NHWC conv2d evaluated once for all frames and
    shifted.  XLA's TPU lowering of temporally-dilated Conv3D runs at ~10%
    MFU; the folded conv2d formulation uses the standard MXU conv path.
    Parameter tree is identical to the ``nn.Conv`` stack (conversion and
    checkpoints unaffected).
    """
    filters: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        mods = [_DilConvParams(c, self.filters, name=f'conv3d_dil{d}')
                for d in (1, 2, 4, 8)]
        cdtype = self.dtype or x.dtype
        x2 = x.reshape(b * t, h, w, c).astype(cdtype)
        taps = []
        for j in range(3):
            kj = jnp.concatenate([m.kernel[j] for m in mods],
                                 axis=-1).astype(cdtype)          # (3,3,c,4F)
            yj = jax.lax.conv_general_dilated(
                x2, kj, (1, 1), 'SAME',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            taps.append(yj.reshape(b, t, h, w, 4 * self.filters))
        outs = []
        for bi, d in enumerate((1, 2, 4, 8)):
            sl = slice(bi * self.filters, (bi + 1) * self.filters)
            y = (_tshift(taps[0][..., sl], d) + taps[1][..., sl] +
                 _tshift(taps[2][..., sl], -d))
            outs.append(nn.relu(y + mods[bi].bias.astype(cdtype)))
        return jnp.concatenate(outs, axis=-1)


class TransNetV1(nn.Module):
    """TransNet V1: (B, T, 27, 48, 3) uint8/float -> (B, T) transition probs.

    ``dtype``: compute dtype for the conv/dense stack (params stay f32; the
    softmax runs in f32).  bf16 keeps the dilated Conv3D stack on the MXU
    fast path; shot decisions only threshold the probability at 0.1, far
    from bf16's resolution (see test_models_transnet bf16 agreement test).
    """
    f: int = 16     # base filters
    l: int = 3      # SDDCNN stages
    s: int = 2      # DDCNN cells per stage
    d: int = 256    # dense width
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype or jnp.float32) / 255.0
        for idx_l in range(self.l):
            filters = (2 ** idx_l) * self.f
            for idx_s in range(self.s):
                x = DDCNN(filters, dtype=self.dtype,
                          name=f'sddcnn{idx_l + 1}_ddcnn{idx_s + 1}')(x)
            # Spatial-only max pool (1, 2, 2).
            x = nn.max_pool(x, (1, 2, 2), strides=(1, 2, 2))
        b, t = x.shape[0], x.shape[1]
        x = x.reshape(b, t, -1)
        x = nn.relu(nn.Dense(self.d, dtype=self.dtype, name='dense1')(x))
        logits = nn.Dense(2, dtype=self.dtype, name='dense2')(x)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., 1]


class TransNetPredictor:
    """Whole-clip shot predictions in ONE dispatch per frame-count bucket.

    The eager version (:func:`predict_video_windows`) issues ~8 device ops
    (pads, reshapes, window concats, slices) around the batched forward; on a
    dispatch-latency-bound link that overhead dominates (measured 124 ms for
    a 480-frame clip, ~40 ms of it compute).  Here edge padding, the
    reshape-based window build, the forward over all windows and the
    middle-[25:75) trim run inside one jit; model parameters are jit
    ARGUMENTS, not closed-over constants, so lowering never round-trips them
    through the host.

    ``fullseq=True`` (the ``tpu_transnet_fullseq`` config knob) drops the
    window plan entirely: the network is fully convolutional in time (the
    DDCNN temporal taps are zero-filled shifts = SAME Conv3D), so ONE
    forward over the edge-padded whole clip yields every frame's
    probability while the 100/50 overlap scheme computes each frame ~2.1x
    (plus window padding).  NOT bit-identical to the reference: its
    windows zero-truncate the temporal receptive field (~±48 frames) at
    window edges, which full-sequence evaluation removes; with a window
    spanning the whole clip the two are exactly equal
    (tests/test_models_transnet.py).  Default stays the reference plan.
    """

    def __init__(self, model: "TransNetV1", params, *, window: int = 100,
                 stride: int = 50, keep: tuple = (25, 75),
                 fullseq: bool = False):
        assert window % stride == 0
        self.model = model
        # Parameters ride as jit arguments: pin them on device ONCE so a
        # numpy checkpoint tree is not re-uploaded on every dispatch.
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.window = window
        self.stride = stride
        self.keep = keep
        self.fullseq = fullseq

    @functools.lru_cache(maxsize=16)
    def _compiled(self, n_pad: int):
        from retargetvid_tpu.utils.cache import shared_program, tree_signature

        key = ('transnet-windows', repr(self.model), self.window,
               self.stride, self.keep, self.fullseq,
               tree_signature(self.params), n_pad)
        return shared_program(key, lambda: self._build(n_pad))

    def _build(self, n_pad: int):
        window, stride, keep = self.window, self.stride, self.keep
        m = window // stride
        k = -(-(n_pad + window - stride + keep[0]) // stride)   # blocks
        length = k * stride
        n_w = k - m + 1
        model = self.model
        fullseq = self.fullseq

        @jax.jit
        def fn(params, frames, n):
            if fullseq:
                # Edge-pad keep[0] frames each side (the reference's clip-end
                # padding), one whole-sequence forward, trim.
                src = jnp.clip(jnp.arange(n_pad + 2 * keep[0]) - keep[0],
                               0, n - 1)
                probs = model.apply(params, frames[src][None])[0]
                return probs[keep[0]:keep[0] + n_pad]
            # Edge padding via clamped row gather (contiguous rows).
            src = jnp.clip(jnp.arange(length) - keep[0], 0, n - 1)
            padded = frames[src]
            blocks = padded.reshape(k, stride, *frames.shape[1:])
            windows = jnp.concatenate(
                [blocks[off:off + n_w] for off in range(m)], axis=1)
            probs = model.apply(params, windows)                 # (n_w, window)
            return probs[:, keep[0]:keep[1]].reshape(-1)[:n_pad]

        return fn

    def __call__(self, frames) -> np.ndarray:
        """(N, 27, 48, 3) uint8 frames -> (N,) float32 probabilities."""
        frames = jnp.asarray(frames)
        n = len(frames)
        n_pad = -(-n // 64) * 64
        if n_pad != n:
            frames = jnp.concatenate(
                [frames, jnp.zeros((n_pad - n,) + frames.shape[1:],
                                   frames.dtype)], axis=0)
        probs = self._compiled(n_pad)(self.params, frames, jnp.int32(n))
        return np.asarray(probs[:n])


class IngestShotProgram:
    """Raw frames -> (saliency-res frames, shot probabilities) in ONE jit.

    Fuses the ingest's two resizes (``pipeline.ingest._resize_kernel``) with
    the whole TransNet window plan, removing one dispatch round trip per
    clip (~25 ms on the dev relay).  The saliency-resolution frames stay on
    device for the fused clip program; only the (N,) probabilities return to
    the host (the sampling rule needs them).
    """

    def __init__(self, model: "TransNetV1", params, *,
                 sal_hw, window: int = 100, stride: int = 50,
                 keep: tuple = (25, 75)):
        self.model = model
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.sal_hw = tuple(sal_hw)
        self.window = window
        self.stride = stride
        self.keep = keep

    @functools.lru_cache(maxsize=16)
    def _compiled(self, n_pad: int, h: int, w: int):
        from retargetvid_tpu.utils.cache import shared_program, tree_signature

        key = ('ingest-shot', repr(self.model), self.sal_hw, self.window,
               self.stride, self.keep, tree_signature(self.params),
               n_pad, h, w)
        return shared_program(key, lambda: self._build(n_pad, h, w))

    def _build(self, n_pad: int, h: int, w: int):
        from retargetvid_tpu.ops.resize import resize, round_half_up

        window, stride, keep = self.window, self.stride, self.keep
        sal_h, sal_w = self.sal_hw
        m = window // stride
        k = -(-(n_pad + window - stride + keep[0]) // stride)
        length = k * stride
        n_w = k - m + 1
        model = self.model

        @jax.jit
        def fn(params, frames, n):
            to_u8 = lambda v: jnp.clip(round_half_up(v), 0, 255).astype(
                jnp.uint8)
            tn = to_u8(resize(frames, (INPUT_HEIGHT, INPUT_WIDTH), 'linear'))
            sal = to_u8(resize(frames, (sal_h, sal_w), 'linear'))
            src = jnp.clip(jnp.arange(length) - keep[0], 0, n - 1)
            blocks = tn[src].reshape(k, stride, INPUT_HEIGHT, INPUT_WIDTH, 3)
            windows = jnp.concatenate(
                [blocks[off:off + n_w] for off in range(m)], axis=1)
            probs = model.apply(params, windows)
            return sal, probs[:, keep[0]:keep[1]].reshape(-1)[:n_pad]

        return fn

    def __call__(self, frames):
        """(N, H, W, 3) uint8 -> (device sal frames (N,sal_h,sal_w,3),
        numpy probs (N,))."""
        frames = jnp.asarray(frames)
        n, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
        n_pad = -(-n // 64) * 64
        if n_pad != n:
            frames = jnp.concatenate(
                [frames, jnp.zeros((n_pad - n,) + frames.shape[1:],
                                   frames.dtype)], axis=0)
        sal, probs = self._compiled(n_pad, int(h), int(w))(
            self.params, frames, jnp.int32(n))
        return sal[:n], np.asarray(probs[:n])


def predict_video_windows(apply_fn, frames, window: int = 100,
                          stride: int = 50, keep: tuple = (25, 75),
                          batch_windows: int = 64):
    """Sliding-window shot predictions over a whole clip, batched.

    ``frames``: (N, 27, 48, 3) uint8, numpy or device-resident.  Reproduces
    the reference's window plan (edge padding by 25 front / 25..74 back,
    stride 50, keep the middle [25:75) of each window —
    ``transnetv1_handler.py:105-130``) but evaluates all windows as ONE MXU
    batch, with the window gather on device (no host copies).

    ``apply_fn``: callable (B, T, H, W, 3) -> (B, T) probabilities.
    Returns (N,) float32 numpy array.
    """
    assert window % stride == 0, 'window must be a stride multiple'
    frames = jnp.asarray(frames)
    n = len(frames)
    pad_start = keep[0]
    rem = n % stride
    pad_end = keep[0] + stride - (rem if rem != 0 else stride)
    padded = jnp.concatenate(
        [jnp.repeat(frames[:1], pad_start, axis=0), frames,
         jnp.repeat(frames[-1:], pad_end, axis=0)], axis=0)

    # Window extraction WITHOUT gathers (arbitrary gathers are ~100x slower
    # than reshapes on v5e): pad_start+pad_end always total a stride
    # multiple, so the clip reshapes into `stride`-frame blocks and window i
    # is the concatenation of blocks [i : i + window//stride].
    m = window // stride
    blocks = padded.reshape(-1, stride, *padded.shape[1:])
    k = blocks.shape[0]
    n_w = k - m + 1
    # Bucket the window count (multiples of 8) so varying clip lengths do
    # not trigger a recompile per video; padded windows are zero blocks and
    # their predictions are discarded.
    n_w_pad = min(-(-n_w // 8) * 8, batch_windows) if n_w <= batch_windows \
        else -(-n_w // batch_windows) * batch_windows
    if n_w_pad > n_w:
        blocks = jnp.concatenate(
            [blocks, jnp.zeros((n_w_pad - n_w,) + blocks.shape[1:],
                               blocks.dtype)], axis=0)
    windows = jnp.concatenate(
        [blocks[off:off + n_w_pad] for off in range(m)], axis=1)

    probs = []
    for i in range(0, n_w_pad, batch_windows):
        p = apply_fn(windows[i:i + batch_windows])
        probs.append(p[:, keep[0]:keep[1]])
    probs = jnp.concatenate(probs, axis=0)[:n_w].reshape(-1)
    return np.asarray(probs[:n])
