"""Squeeze-and-Excitation encoder family (alternative matching encoder).

Behavioral equivalents of /root/reference/networks/senet.py:88-452 and
networks/senet_submodule.py:9-142: the SE module, the three SE bottleneck
variants (SEBottleneck / SEResNetBottleneck / SEResNeXtBottleneck), the
SENet container with its six constructors (senet154, se_resnet50/101/152,
se_resnext50/101_32x4d), and `SEFeatureNet` (se_feature_extraction), an
SE-bottleneck PSM-style extractor returning 1/2- and 1/4-scale features.
The reference never instantiates these on its default path
(model_hybrid.py:22 mentions "featureNet: psm or senet");
DepthNetHybrid(feature_net="senet") selects SEFeatureNet here.

Reference quirks preserved in SENet: layer plane widths (32, 32, 256, 512)
and strides (2, 1, 2, 2) — this repo's senet.py:292-330 modifies the
upstream Cadene architecture — and the removed layer0 maxpool (:286-288).
Pretrained Cadene weights would come through a converter, not a download
(`pretrained` is accepted for signature parity and must be falsy).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from estdepth_tpu.models.layers import (
    _KERNEL_INIT, ConvBN, TorchBatchNorm, resize_bilinear,
)


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
        out = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis_name=self.bn_axis_name, dtype=self.dtype, name="bn2",
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


class SEResNetBottleneck(nn.Module):
    """SE-ResNet bottleneck (senet.py:162-184): Caffe-style stride on the
    1x1 conv1 (not conv2), mid width = planes, SE gate before the add."""

    planes: int
    groups: int = 1
    reduction: int = 16
    stride: int = 1
    downsample: bool = False
    downsample_kernel: int = 1
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        out = ConvBN(self.planes, 1, self.stride, padding=0, act="relu",
                     name="conv1", **kw)(x, train)
        out = nn.Conv(
            self.planes, (3, 3), padding=[(1, 1)] * 2,
            feature_group_count=self.groups, use_bias=False,
            kernel_init=_KERNEL_INIT, dtype=self.dtype, name="conv2",
        )(out)
        out = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis_name=self.bn_axis_name, dtype=self.dtype, name="bn2",
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


class SEResNeXtBottleneck(nn.Module):
    """SE-ResNeXt bottleneck type C (senet.py:186-210): grouped 3x3 with
    width = planes * base_width/64 * groups, stride on conv2."""

    planes: int
    groups: int = 32
    reduction: int = 16
    stride: int = 1
    downsample: bool = False
    downsample_kernel: int = 1
    base_width: int = 4
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        width = int(self.planes * self.base_width / 64) * self.groups
        out = ConvBN(width, 1, 1, padding=0, act="relu",
                     name="conv1", **kw)(x, train)
        out = nn.Conv(
            width, (3, 3), strides=(self.stride,) * 2, padding=[(1, 1)] * 2,
            feature_group_count=self.groups, use_bias=False,
            kernel_init=_KERNEL_INIT, dtype=self.dtype, name="conv2",
        )(out)
        out = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis_name=self.bn_axis_name, dtype=self.dtype, name="bn2",
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


_SENET_BLOCKS = {
    "se": SEBottleneck,
    "se_resnet": SEResNetBottleneck,
    "se_resnext": SEResNeXtBottleneck,
}


class SENet(nn.Module):
    """The SENet container (senet.py:213-381), reference configuration:
    layer0 (3x 3x3 convs or one 7x7, stride 2, NO maxpool — removed at
    :286-288), then 4 stages with plane widths (32, 32, 256, 512) and
    strides (2, 1, 2, 2) (:290-330), global 7x7 avg-pool, optional dropout,
    linear head. `features_only=True` returns the layer4 map
    (SENet.features, :362-369)."""

    block: str  # "se" | "se_resnet" | "se_resnext"
    layers: Tuple[int, int, int, int]
    groups: int
    reduction: int = 16
    dropout_p: Optional[float] = 0.2
    inplanes: int = 128
    input_3x3: bool = True
    downsample_kernel_size: int = 3
    downsample_padding: int = 1
    num_classes: int = 1000
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    def _stage(self, x, blocks, planes, stride, dk, name, train):
        block_cls = _SENET_BLOCKS[self.block]
        extra = {}
        if self.block == "se":
            # senet.py:138-157: senet154's conv2 widens to 4*planes
            extra["wide_conv2"] = True
        kw = dict(
            groups=self.groups, reduction=self.reduction,
            bn_axis_name=self.bn_axis_name, dtype=self.dtype, **extra,
        )
        ds = stride != 1 or x.shape[-1] != planes * 4
        x = block_cls(
            planes, stride=stride, downsample=ds, downsample_kernel=dk,
            name=f"{name}_0", **kw,
        )(x, train)
        for i in range(1, blocks):
            x = block_cls(planes, name=f"{name}_{i}", **kw)(x, train)
        return x

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, features_only: bool = False
    ) -> jnp.ndarray:
        kw = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        if self.input_3x3:
            x = ConvBN(64, 3, 2, act="relu", name="layer0_conv1", **kw)(x, train)
            x = ConvBN(64, 3, 1, act="relu", name="layer0_conv2", **kw)(x, train)
            x = ConvBN(self.inplanes, 3, 1, act="relu",
                       name="layer0_conv3", **kw)(x, train)
        else:
            x = ConvBN(self.inplanes, 7, 2, padding=3, act="relu",
                       name="layer0_conv1", **kw)(x, train)

        dks = self.downsample_kernel_size
        x = self._stage(x, self.layers[0], 32, 2, 1, "layer1", train)
        x = self._stage(x, self.layers[1], 32, 1, dks, "layer2", train)
        x = self._stage(x, self.layers[2], 256, 2, dks, "layer3", train)
        x = self._stage(x, self.layers[3], 512, 2, dks, "layer4", train)
        if features_only:
            return x

        x = nn.avg_pool(x, (7, 7), strides=(1, 1), padding="VALID")
        if self.dropout_p is not None:
            x = nn.Dropout(self.dropout_p, deterministic=not train)(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="last_linear")(x)


def _ctor(name, block, layers, groups, **cfg):
    def build(num_classes: int = 1000, pretrained=None, **kw) -> SENet:
        assert not pretrained, (
            f"{name}: pretrained weights must come through the converter "
            "(no model-zoo download); pass pretrained=None"
        )
        return SENet(block=block, layers=layers, groups=groups,
                     num_classes=num_classes, **cfg, **kw)

    build.__name__ = name
    build.__doc__ = f"Reference constructor {name} (networks/senet.py)."
    return build


# the six reference constructors (senet.py:395-452)
senet154 = _ctor("senet154", "se", (3, 8, 36, 3), 64, dropout_p=0.2)
se_resnet50 = _ctor(
    "se_resnet50", "se_resnet", (3, 4, 6, 3), 1, dropout_p=None,
    inplanes=64, input_3x3=False, downsample_kernel_size=1,
    downsample_padding=0,
)
se_resnet101 = _ctor(
    "se_resnet101", "se_resnet", (3, 4, 23, 3), 1, dropout_p=None,
    inplanes=64, input_3x3=False, downsample_kernel_size=1,
    downsample_padding=0,
)
se_resnet152 = _ctor(
    "se_resnet152", "se_resnet", (3, 8, 36, 3), 1, dropout_p=None,
    inplanes=64, input_3x3=False, downsample_kernel_size=1,
    downsample_padding=0,
)
se_resnext50_32x4d = _ctor(
    "se_resnext50_32x4d", "se_resnext", (3, 4, 6, 3), 32, dropout_p=None,
    inplanes=64, input_3x3=False, downsample_kernel_size=1,
    downsample_padding=0,
)
se_resnext101_32x4d = _ctor(
    "se_resnext101_32x4d", "se_resnext", (3, 4, 23, 3), 32, dropout_p=None,
    inplanes=64, input_3x3=False, downsample_kernel_size=1,
    downsample_padding=0,
)


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
