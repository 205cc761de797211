"""Squeeze-and-Excitation encoder family (alternative matching encoder).

Behavioral equivalents of /root/reference/networks/senet.py:88-452 and
networks/senet_submodule.py:9-142: the SE module, the three SE bottleneck
variants, and `SEFeatureNet` (se_feature_extraction), an SE-bottleneck PSM
extractor returning 1/2- and 1/4-scale features. The reference never
instantiates these on its default path (model_hybrid.py:22 mentions
"psm or senet"); provided for API completeness.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from estdepth_tpu.models.layers import _KERNEL_INIT, ConvBN, resize_bilinear


class SEModule(nn.Module):
    """Global-pool -> 1x1 squeeze -> 1x1 excite -> sigmoid gate
    (senet.py:88-107)."""

    channels: int
    reduction: int = 16
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(self.channels // self.reduction, (1, 1), dtype=self.dtype,
                    name="fc1")(g)
        g = nn.relu(g)
        g = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="fc2")(g)
        return x * nn.sigmoid(g)


class SEBottleneck(nn.Module):
    """SENet-154-style bottleneck (senet_submodule.py:9-30 variant:
    conv1 1x1 -> 2*planes, grouped conv2 3x3 keeps 2*planes, conv3 1x1 ->
    4*planes, SE gate on the residual branch, post-add ReLU)."""

    planes: int
    groups: int = 32
    reduction: int = 16
    stride: int = 1
    downsample: bool = False
    downsample_kernel: int = 1
    wide_conv2: bool = False  # senet.py:138-157 variant: conv2 -> 4*planes
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        mid = self.planes * (4 if self.wide_conv2 else 2)
        out = ConvBN(self.planes * 2, 1, 1, padding=0, act="relu",
                     name="conv1", **kw)(x, train)
        out = nn.Conv(
            mid, (3, 3), strides=(self.stride,) * 2, padding=[(1, 1)] * 2,
            feature_group_count=self.groups, use_bias=False,
            kernel_init=_KERNEL_INIT, dtype=self.dtype, name="conv2",
        )(out)
        out = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis_name=self.bn_axis_name, dtype=jnp.float32, name="bn2",
        )(out)
        out = nn.relu(out)
        out = ConvBN(self.planes * 4, 1, 1, padding=0, zero_bn_scale=True,
                     name="conv3", **kw)(out, train)
        out = SEModule(self.planes * 4, self.reduction, self.dtype,
                       name="se")(out)
        if self.downsample:
            pad = self.downsample_kernel // 2
            x = ConvBN(self.planes * 4, self.downsample_kernel, self.stride,
                       padding=pad, name="downsample", **kw)(x, train)
        return nn.relu(out + x)


class SEFeatureNet(nn.Module):
    """SE-bottleneck PSM-style extractor (senet_submodule.py:33-142):
    returns (1/2-scale 128ch, 1/4-scale 32ch) feature maps."""

    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    def _layer(self, x, blocks, stride, dk, name, train):
        downsample = stride != 1 or x.shape[-1] != 32 * 4
        x = SEBottleneck(
            32, stride=stride, downsample=downsample, downsample_kernel=dk,
            bn_axis_name=self.bn_axis_name, dtype=self.dtype, name=f"{name}_0",
        )(x, train)
        for i in range(1, blocks):
            x = SEBottleneck(
                32, bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                name=f"{name}_{i}",
            )(x, train)
        return x

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        kw = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        x = ConvBN(32, 3, 2, act="relu", name="firstconv_0", **kw)(x, train)
        x = ConvBN(32, 3, 1, act="relu", name="firstconv_1", **kw)(x, train)
        x = ConvBN(32, 3, 1, act="relu", name="firstconv_2", **kw)(x, train)

        feat_half = self._layer(x, 3, 1, 1, "layer1", train)      # 1/2, 128ch
        raw = self._layer(feat_half, 3, 2, 3, "layer2", train)    # 1/4
        x = self._layer(raw, 3, 1, 1, "layer3", train)
        skip = self._layer(x, 3, 1, 1, "layer4", train)

        h, w = skip.shape[1], skip.shape[2]
        branches = []
        for i, pool in enumerate((32, 16, 8, 4)):
            win = (min(pool, h), min(pool, w))
            b = nn.avg_pool(skip, win, strides=win, padding="VALID")
            b = ConvBN(32, 1, 1, padding=0, act="relu",
                       name=f"branch{i + 1}", **kw)(b, train)
            branches.append(resize_bilinear(b, h, w))

        feat = jnp.concatenate([raw, skip] + branches[::-1], axis=-1)  # 384ch
        feat = ConvBN(128, 3, 1, act="relu", name="lastconv_0", **kw)(feat, train)
        feat = nn.Conv(32, (1, 1), padding="VALID", use_bias=False,
                       kernel_init=_KERNEL_INIT, dtype=self.dtype,
                       name="lastconv_1")(feat)
        return feat_half, feat
