"""Shared flax building blocks for the saliency/shot models.

NHWC layouts throughout (TPU-native), bf16-friendly.  Behavioral parity
targets the reference's torch modules:

- ``ConvBN`` / ``Conv1x1BN``: conv + BatchNorm + ReLU6
  (``unisal/models/MobileNetV2.py:10-23``).
- ``InvertedResidual``: MobileNetV2 block with the reference's
  ``omit_stride`` variant (declared stride recorded but executed as 1; the
  caller subsamples afterwards) — ``MobileNetV2.py:26-98``.
- ``DomainBN``: domain-specific BatchNorm selecting per-source statistics
  statically at apply time (``unisal/model.py:65-101``); under jit the source
  is a static argument so selection costs nothing at runtime.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

DEFAULT_SOURCES = ('DHF1K', 'Hollywood', 'UCFSports', 'SALICON')


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


class DomainBN(nn.Module):
    """Domain-specific BatchNorm: one set of statistics per source.

    The active source arrives as a static string, so XLA sees a single BN —
    no runtime dispatch (reference keeps N modules and dispatches in Python,
    ``unisal/model.py:65-101``).  All sources' parameters are created eagerly
    in setup so weight conversion sees the full tree.
    """
    sources: Sequence[str] = DEFAULT_SOURCES
    use_running_average: bool = True
    #: flax momenta (= 1 - torch momentum) per source; reference uses torch
    #: momentum 0.01 for dynamic sources and 0.1 for SALICON
    #: (``unisal/model.py:293-299``).
    momenta: Optional[Sequence[float]] = None

    def setup(self):
        momenta = self.momenta or tuple(
            0.9 if src == 'SALICON' else 0.99 for src in self.sources)
        for src, m in zip(self.sources, momenta):
            setattr(self, f'bn_{src.lower()}', nn.BatchNorm(
                use_running_average=self.use_running_average,
                momentum=m, epsilon=1e-5))

    def __call__(self, x, source: str = 'DHF1K'):
        if source not in self.sources:
            raise ValueError(f'unknown source {source!r}')
        if self.is_initializing():
            # Materialize every source's params (linen creates submodule
            # variables only on use); the active output is returned.
            outs = {s: getattr(self, f'bn_{s.lower()}')(x)
                    for s in self.sources}
            return outs[source]
        # Apply time: ONLY the active source's BN runs — in train mode an
        # applied BN mutates its running stats, and the reference never
        # touches inactive sources' statistics (model.py:100-101).
        return getattr(self, f'bn_{source.lower()}')(x)


def make_bn(ds_bn: bool, sources, use_running_average: bool = True,
            momentum: float = 0.99):
    """BatchNorm factory: domain-specific or plain.

    ``momentum`` is the flax convention (new = m*old + (1-m)*batch), i.e.
    1 - torch momentum; torch defaults 0.1 -> 0.9, UNISAL's bn_momentum
    0.01 -> 0.99.
    """
    if ds_bn:
        return lambda name=None: DomainBN(
            sources=sources, use_running_average=use_running_average,
            name=name)
    return lambda name=None: nn.BatchNorm(
        use_running_average=use_running_average, momentum=momentum,
        epsilon=1e-5, name=name)


class ConvBN(nn.Module):
    """3x3 conv (stride s) + BN + ReLU6."""
    features: int
    stride: int = 1
    sources: Sequence[str] = DEFAULT_SOURCES
    ds_bn: bool = False
    bn_train: bool = False

    @nn.compact
    def __call__(self, x, source: str = 'DHF1K'):
        x = nn.Conv(self.features, (3, 3), strides=self.stride,
                    padding=1, use_bias=False, name='conv')(x)
        bn = make_bn(self.ds_bn, self.sources,
                     use_running_average=not self.bn_train)(name='bn')
        x = bn(x, source) if self.ds_bn else bn(x)
        return relu6(x)


class Conv1x1BN(nn.Module):
    """1x1 conv + BN + ReLU6 (reference conv_1x1_bn)."""
    features: int
    sources: Sequence[str] = DEFAULT_SOURCES
    ds_bn: bool = False
    bn_train: bool = False

    @nn.compact
    def __call__(self, x, source: str = 'DHF1K'):
        x = nn.Conv(self.features, (1, 1), use_bias=False, name='conv')(x)
        bn = make_bn(self.ds_bn, self.sources,
                     use_running_average=not self.bn_train)(name='bn')
        x = bn(x, source) if self.ds_bn else bn(x)
        return relu6(x)


class InvertedResidual(nn.Module):
    """MobileNetV2 inverted residual with the reference's quirks.

    ``omit_stride``: the declared stride is recorded (the caller subsamples
    with ``x[..., ::2, ::2, :]`` afterwards) but the depthwise conv runs at
    stride 1 — reference ``MobileNetV2.py:33-37``.
    """
    inp: int
    oup: int
    stride: int = 1
    expand_ratio: int = 6
    omit_stride: bool = False
    no_res_connect: bool = False
    sources: Sequence[str] = DEFAULT_SOURCES
    ds_bn: bool = False
    bn_train: bool = False
    bn_momentum: float = 0.99

    @property
    def use_res_connect(self) -> bool:
        return (not self.no_res_connect and self.stride == 1
                and self.inp == self.oup)

    @nn.compact
    def __call__(self, x, source: str = 'DHF1K'):
        actual_stride = 1 if self.omit_stride else self.stride
        hidden = round(self.inp * self.expand_ratio)
        bnf = make_bn(self.ds_bn, self.sources,
                      use_running_average=not self.bn_train,
                      momentum=self.bn_momentum)

        def apply_bn(bn, h):
            return bn(h, source) if self.ds_bn else bn(h)

        h = x
        if self.expand_ratio != 1:
            h = nn.Conv(hidden, (1, 1), use_bias=False, name='pw')(h)
            h = apply_bn(bnf(name='pw_bn'), h)
            h = relu6(h)
        h = nn.Conv(hidden, (3, 3), strides=actual_stride, padding=1,
                    feature_group_count=hidden, use_bias=False, name='dw')(h)
        h = apply_bn(bnf(name='dw_bn'), h)
        h = relu6(h)
        h = nn.Conv(self.oup, (1, 1), use_bias=False, name='pw_linear')(h)
        h = apply_bn(bnf(name='pw_linear_bn'), h)
        if self.use_res_connect:
            return x + h
        return h
