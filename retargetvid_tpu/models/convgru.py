"""Convolutional GRU (flax, NHWC) with a ``lax.scan`` over time.

Behavioral parity with the reference's ConvGRU
(``unisal/models/cgru.py:16-375``) as configured by UNISAL
(``unisal/model.py:58-62, 204-212``): six mobile depthwise-separable 3x3
convolutions (w_r, u_r, w_z, u_z, w, u), per-branch domain-specific BatchNorm
with free affine scales (a_*) and shared gate biases (b_r, b_z, b_h):

    r = sigmoid(a_r_x BN(w_r x) + a_r_h BN(u_r h) + b_r)
    z = sigmoid(a_z_x BN(w_z x) + a_z_h BN(u_z h) + b_z)
    c = tanh  (a_h_x BN(w   x) + r * a_h_h BN(u  h) + b_h)
    h' = (1 - z) h + z c

The reference iterates time in a Python loop over ``torch.unbind``; here the
sequence axis is a single ``jax.lax.scan`` — one compiled step reused across
time with O(1) program size, which is how long sequences stay cheap under jit
(SURVEY.md §5.7).  Recurrent (variational) dropout masks are sampled once per
sequence and closed over by the scan body, matching the reference's
``set_drop_masks`` semantics.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from retargetvid_tpu.models.layers import DEFAULT_SOURCES, make_bn, relu6


class _MobileConv(nn.Module):
    """Depthwise 3x3 + BN + ReLU6 + pointwise 1x1 (no bias)."""
    in_ch: int
    out_ch: int
    ksize: Tuple[int, int] = (3, 3)
    sources: Sequence[str] = DEFAULT_SOURCES
    ds_bn: bool = True
    bn_train: bool = False

    @nn.compact
    def __call__(self, x, source: str = 'DHF1K'):
        pad = tuple(k // 2 for k in self.ksize)
        x = nn.Conv(self.in_ch, self.ksize, padding=[(pad[0],) * 2,
                                                     (pad[1],) * 2],
                    feature_group_count=self.in_ch, use_bias=False,
                    name='conv_dw')(x)
        bn = make_bn(self.ds_bn, self.sources,
                     use_running_average=not self.bn_train)(name='sep_bn')
        x = bn(x, source) if self.ds_bn else bn(x)
        x = relu6(x)
        x = nn.Conv(self.out_ch, (1, 1), use_bias=False, name='conv_sep')(x)
        return x


class ConvGRUCell(nn.Module):
    """One ConvGRU step; inputs/hidden are NHWC."""
    input_ch: int
    hidden_ch: int
    kernel_size: Tuple[int, int] = (3, 3)
    gate_ksize: Tuple[int, int] = (3, 3)
    sources: Sequence[str] = DEFAULT_SOURCES
    ds_bn: bool = True
    bn_train: bool = False

    @nn.compact
    def __call__(self, x, h, source: str = 'DHF1K',
                 drop_x=None, drop_h=None):
        def conv(name, in_ch, ksize):
            return _MobileConv(in_ch, self.hidden_ch, ksize,
                               sources=self.sources, ds_bn=self.ds_bn,
                               bn_train=self.bn_train, name=name)

        def bn(name):
            m = make_bn(self.ds_bn, self.sources,
                        use_running_average=not self.bn_train)(name=name)
            return (lambda v: m(v, source)) if self.ds_bn else m

        def affine(name):
            return self.param(name, nn.initializers.ones, (self.hidden_ch,))

        def bias(name, init=0.0):
            return self.param(name, nn.initializers.constant(init),
                              (self.hidden_ch,))

        def dx(v, i):
            return v * drop_x[i] if drop_x is not None else v

        def dh(v, i):
            return v * drop_h[i] if drop_h is not None else v

        r_x = bn('norm_r_x')(conv('w_r', self.input_ch, self.gate_ksize)(
            dx(x, 0), source)) * affine('a_r_x')
        r_h = bn('norm_r_h')(conv('u_r', self.hidden_ch, self.gate_ksize)(
            dh(h, 0), source)) * affine('a_r_h')
        z_x = bn('norm_z_x')(conv('w_z', self.input_ch, self.gate_ksize)(
            dx(x, 1), source)) * affine('a_z_x')
        z_h = bn('norm_z_h')(conv('u_z', self.hidden_ch, self.gate_ksize)(
            dh(h, 1), source)) * affine('a_z_h')
        h_x = bn('norm_out_x')(conv('w', self.input_ch, self.kernel_size)(
            dx(x, 2), source)) * affine('a_h_x')
        h_h = bn('norm_out_h')(conv('u', self.hidden_ch, self.gate_ksize)(
            dh(h, 2), source)) * affine('a_h_h')

        r = jax.nn.sigmoid(r_x + r_h + bias('b_r'))
        z = jax.nn.sigmoid(z_x + z_h + bias('b_z'))
        c = jnp.tanh(h_x + r * h_h + bias('b_h'))
        h_new = (1.0 - z) * h + z * c
        return h_new, h_new


class ConvGRU(nn.Module):
    """Single-layer ConvGRU over (B, T, H, W, C) sequences via ``lax.scan``.

    Returns (outputs (B, T, H, W, Ch), final hidden (B, H, W, Ch)).
    ``drop_prob`` enables variational recurrent dropout when a ``'dropout'``
    rng is provided and ``deterministic=False``.
    """
    input_ch: int
    hidden_ch: int
    kernel_size: Tuple[int, int] = (3, 3)
    gate_ksize: Tuple[int, int] = (3, 3)
    drop_prob: Tuple[float, float, float] = (0.0, 0.2, 0.0)
    sources: Sequence[str] = DEFAULT_SOURCES
    ds_bn: bool = True
    bn_train: bool = False

    @nn.compact
    def __call__(self, xs, h0=None, source: str = 'DHF1K',
                 deterministic: bool = True):
        b, t, hh, ww, _ = xs.shape
        if h0 is None:
            h0 = jnp.zeros((b, hh, ww, self.hidden_ch), xs.dtype)

        drop_x = drop_h = None
        if not deterministic and self.drop_prob[1] > 0:
            rng = self.make_rng('dropout')
            keep = 1.0 - self.drop_prob[1]
            masks = jax.random.bernoulli(
                rng, keep, (3, 1, 1, 1, self.hidden_ch)).astype(xs.dtype) / keep
            drop_h = masks

        cell = ConvGRUCell(self.input_ch, self.hidden_ch, self.kernel_size,
                           self.gate_ksize, sources=self.sources,
                           ds_bn=self.ds_bn, bn_train=self.bn_train,
                           name='cell')

        if self.bn_train:
            # Train mode: BN statistics mutate every timestep (the reference
            # updates running stats per step of its Python loop), so the
            # batch_stats collection is CARRIED through the scan.  The carry
            # must exist before scanning — create the cell's variables with
            # one unrolled step at init time.
            if self.is_initializing():
                cell(xs[:, 0], h0, source=source,
                     drop_x=drop_x, drop_h=drop_h)
            scan = nn.scan(
                lambda mdl, carry, x: mdl(x, carry, source=source,
                                          drop_x=drop_x, drop_h=drop_h),
                variable_broadcast='params',
                variable_carry='batch_stats',
                split_rngs={'params': False},
                in_axes=1, out_axes=1)
        else:
            scan = nn.scan(
                lambda mdl, carry, x: mdl(x, carry, source=source,
                                          drop_x=drop_x, drop_h=drop_h),
                variable_broadcast=('params', 'batch_stats'),
                split_rngs={'params': False},
                in_axes=1, out_axes=1)
        h_final, outputs = scan(cell, h0, xs)
        return outputs, h_final
