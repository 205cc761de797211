"""PSMNet-style matching feature extractor.

Behavioral equivalent of psm_feature_extraction
(/root/reference/networks/psm_submodule.py:40-116): a stride-4, 32-channel
feature map per image, built from residual conv stacks plus a 4-branch
spatial-pyramid-pooling context head. The output has NO trailing BN/ReLU
(psm_submodule.py:74,116) — raw features feed the cost-volume correlation.

Channels-last [B, H, W, C]; all convs map onto the MXU via XLA.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from estdepth_tpu.models.layers import _KERNEL_INIT, ConvBN, resize_bilinear


class PSMBasicBlock(nn.Module):
    """Residual block WITHOUT post-add activation (psm_submodule.py:14-37)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out = ConvBN(
            self.planes, 3, self.stride, dilation=self.dilation, act="relu",
            bn_axis_name=self.bn_axis_name, dtype=self.dtype, name="conv1",
        )(x, train)
        out = ConvBN(
            self.planes, 3, 1, dilation=self.dilation, zero_bn_scale=True,
            bn_axis_name=self.bn_axis_name, dtype=self.dtype, name="conv2",
        )(out, train)
        if self.downsample:
            x = ConvBN(
                self.planes, 1, self.stride, padding=0,
                bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                name="downsample",
            )(x, train)
        return out + x


class PSMFeatureNet(nn.Module):
    """32-channel stride-4 matching features (psm_submodule.py:40-116)."""

    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    def _layer(self, x, planes, blocks, stride, dilation, name, train):
        # First block carries stride/projection shortcut when shape changes
        # (psm_submodule.py:77-91).
        downsample = stride != 1 or x.shape[-1] != planes
        x = PSMBasicBlock(
            planes, stride, dilation, downsample,
            self.bn_axis_name, self.dtype, name=f"{name}_0",
        )(x, train)
        for i in range(1, blocks):
            x = PSMBasicBlock(
                planes, 1, dilation, False,
                self.bn_axis_name, self.dtype, name=f"{name}_{i}",
            )(x, train)
        return x

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        x = ConvBN(32, 3, 2, act="relu", name="firstconv_0", **kw)(x, train)
        x = ConvBN(32, 3, 1, act="relu", name="firstconv_1", **kw)(x, train)
        x = ConvBN(32, 3, 1, act="relu", name="firstconv_2", **kw)(x, train)

        x = self._layer(x, 32, 3, 1, 1, "layer1", train)
        raw = self._layer(x, 64, 16, 2, 1, "layer2", train)  # stride 4 from here
        x = self._layer(raw, 128, 3, 1, 1, "layer3", train)
        skip = self._layer(x, 128, 3, 1, 2, "layer4", train)

        h, w = skip.shape[1], skip.shape[2]
        branches = []
        for i, pool in enumerate((32, 16, 8, 4)):
            # clamp the window so sub-reference-resolution inputs still yield
            # a >=1x1 pooled map (identical at the reference 64x80 and up)
            win = (min(pool, h), min(pool, w))
            b = nn.avg_pool(skip, win, strides=win, padding="VALID")
            b = ConvBN(32, 1, 1, padding=0, act="relu", name=f"branch{i + 1}", **kw)(
                b, train
            )
            branches.append(resize_bilinear(b, h, w))

        # reference concat order: raw, skip, branch4, branch3, branch2, branch1
        feat = jnp.concatenate([raw, skip] + branches[::-1], axis=-1)  # 320ch
        feat = ConvBN(128, 3, 1, act="relu", name="lastconv_0", **kw)(feat, train)
        feat = nn.Conv(
            32, (1, 1), padding="VALID", use_bias=False,
            kernel_init=_KERNEL_INIT, dtype=self.dtype, name="lastconv_1",
        )(feat)
        return feat
