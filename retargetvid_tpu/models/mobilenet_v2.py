"""MobileNetV2 backbone (flax, NHWC) with the reference's multi-scale taps.

Behavioral parity with ``unisal/models/MobileNetV2.py:101-173``:

- standard inverted-residual table (t, c, n, s);
- the FIRST block of every group is built with ``omit_stride=True`` and the
  subsample happens AFTER the block via strided slicing
  (``x[..., ::2, ::2]``, reference ``:170-171``);
- feature taps: ``feat_4x`` is the output of block index 7 and ``feat_2x``
  of block index 14, both captured BEFORE their trailing subsample
  (reference ``:164-171``);
- optional trailing 1x1 conv to ``last_channel``.

The whole backbone is a stack of (1x1, depthwise 3x3, 1x1) convs — pure
MXU/VPU work that XLA fuses; batching over frames happens in the caller.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn

from retargetvid_tpu.models.layers import ConvBN, Conv1x1BN, InvertedResidual

# (expand_ratio, channels, repeats, stride) — the standard MobileNetV2 table.
INVERTED_RESIDUAL_SETTING = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class MobileNetV2(nn.Module):
    """Backbone returning (feat_1x, feat_2x, feat_4x) NHWC feature maps."""
    widen_factor: float = 1.0
    input_channel: int = 32
    last_channel: Optional[int] = 1280

    @property
    def out_channels(self) -> int:
        if self.last_channel is not None:
            return (int(self.last_channel * self.widen_factor)
                    if self.widen_factor > 1.0 else self.last_channel)
        return int(INVERTED_RESIDUAL_SETTING[-1][1] * self.widen_factor)

    @property
    def feat_2x_channels(self) -> int:
        return int(INVERTED_RESIDUAL_SETTING[-2][1] * self.widen_factor)

    @property
    def feat_4x_channels(self) -> int:
        return int(INVERTED_RESIDUAL_SETTING[-4][1] * self.widen_factor)

    @nn.compact
    def __call__(self, x):
        feat_2x = feat_4x = None
        inp = int(self.input_channel * self.widen_factor)
        x = ConvBN(inp, stride=2, name='features_0')(x)

        idx = 1
        in_ch = inp
        for t, c, n, s in INVERTED_RESIDUAL_SETTING:
            out_ch = int(c * self.widen_factor)
            for i in range(n):
                block_stride = s if i == 0 else 1
                x = InvertedResidual(
                    in_ch, out_ch, stride=block_stride, expand_ratio=t,
                    omit_stride=(i == 0), name=f'features_{idx}')(x)
                if idx == 7:
                    feat_4x = x
                elif idx == 14:
                    feat_2x = x
                if block_stride != 1:
                    x = x[..., ::2, ::2, :]
                in_ch = out_ch
                idx += 1

        if self.last_channel is not None:
            x = Conv1x1BN(self.out_channels, name=f'features_{idx}')(x)
        return x, feat_2x, feat_4x
