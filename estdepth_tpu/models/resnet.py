"""ResNet context encoder (18/34/50/101/152), torchvision-layout.

Behavioral equivalent of ResnetEncoder
(/root/reference/hybrid_models/resnet_encoder.py:17-51): returns the 5
post-ReLU feature maps [relu(bn(conv1)), layer1..layer4] at strides
2/4/8/16/32 with channel widths [64, 64, 128, 256, 512] (x4 from layer1 up
for depth >= 50).

Matches torchvision's module layout (stride on the 3x3 conv of Bottleneck)
so that pretrained torch weights can be imported 1:1 by
estdepth_tpu/utils/convert.py.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from estdepth_tpu.models.layers import ConvBN

_STAGES = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        out = ConvBN(self.planes, 3, self.stride, act="relu", name="conv1", **kw)(
            x, train
        )
        out = ConvBN(self.planes, 3, 1, zero_bn_scale=True, name="conv2", **kw)(
            out, train
        )
        if self.downsample:
            x = ConvBN(self.planes, 1, self.stride, padding=0, name="downsample", **kw)(
                x, train
            )
        return nn.relu(out + x)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1(x4) with post-add ReLU (torchvision v1.5)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        out = ConvBN(self.planes, 1, 1, padding=0, act="relu", name="conv1", **kw)(
            x, train
        )
        out = ConvBN(self.planes, 3, self.stride, act="relu", name="conv2", **kw)(
            out, train
        )
        out = ConvBN(
            self.planes * 4, 1, 1, padding=0, zero_bn_scale=True, name="conv3",
            **kw,
        )(out, train)
        if self.downsample:
            x = ConvBN(
                self.planes * 4, 1, self.stride, padding=0, name="downsample", **kw
            )(x, train)
        return nn.relu(out + x)


class ResNetEncoder(nn.Module):
    depth: int = 50
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @property
    def num_ch_enc(self) -> Tuple[int, ...]:
        mult = 4 if self.depth > 34 else 1
        return (64, 64 * mult, 128 * mult, 256 * mult, 512 * mult)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        block_kind, stages = _STAGES[self.depth]
        block = BasicBlock if block_kind == "basic" else Bottleneck
        expansion = 1 if block_kind == "basic" else 4
        kw = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)

        feats = []
        x = ConvBN(64, 7, 2, padding=3, act="relu", name="conv1", **kw)(x, train)
        feats.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        planes = 64
        for stage_i, blocks in enumerate(stages):
            stride = 1 if stage_i == 0 else 2
            for block_i in range(blocks):
                s = stride if block_i == 0 else 1
                ds = block_i == 0 and (s != 1 or x.shape[-1] != planes * expansion)
                x = block(
                    planes, s, ds, name=f"layer{stage_i + 1}_{block_i}", **kw
                )(x, train)
            feats.append(x)
            planes *= 2
        return feats
