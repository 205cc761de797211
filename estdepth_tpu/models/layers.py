"""Conv/Norm building blocks (channels-last, 2D and 3D).

Behavioral equivalents of the reference layer factories
(/root/reference/networks/layers_op.py:10-39): Conv(bias=False) + BatchNorm
(+ activation). BatchNorm uses torch semantics (momentum 0.1 on new stats ->
flax momentum 0.9, eps 1e-5) and supports cross-device stat sync via
`axis_name` — the TPU-native replacement for apex sync-BN
(train_hybrid.py:291-295) using an ICI pmean instead of a NCCL allreduce.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

# Conv weights follow a He-normal fan-out init; BN starts at identity.
_KERNEL_INIT = nn.initializers.he_normal()


def _tup(v: Union[int, Sequence[int]], rank: int):
    if isinstance(v, int):
        return (v,) * rank
    return tuple(v)


class ConvBN(nn.Module):
    """Conv(bias=False) + BatchNorm + optional activation, rank-agnostic.

    `padding` follows the reference's convbn rule: explicit pad, except that
    dilation > 1 forces pad = dilation (layers_op.py:12).
    Input is [B, *spatial, C]; rank is inferred from `kernel`.
    """

    features: int
    kernel: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 1
    padding: Optional[int] = None
    dilation: int = 1
    act: Optional[str] = None  # None | "relu" | "tanh"
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    # zero-init the BN scale so a residual branch starts as identity —
    # keeps init-time activations O(1) through deep residual stacks (the
    # torch running-stats-at-init equivalent would explode 2^depth).
    zero_bn_scale: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        rank = x.ndim - 2
        kernel = _tup(self.kernel, rank)
        pad = self.padding if self.padding is not None else kernel[0] // 2
        if self.dilation > 1:
            pad = self.dilation
        x = nn.Conv(
            self.features,
            kernel,
            strides=_tup(self.stride, rank),
            padding=[(pad, pad)] * rank,
            kernel_dilation=_tup(self.dilation, rank),
            use_bias=False,
            kernel_init=_KERNEL_INIT,
            dtype=self.dtype,
            name="conv",
        )(x)
        # BN statistics are always computed (and pmean-synced) in float32 —
        # flax's _compute_stats forces float32 reductions regardless of
        # `dtype`. `dtype` only sets the OUTPUT dtype: with a bf16 model this
        # keeps every inter-layer activation (and the K/V volumes the hot
        # frustum gather reads) bf16 instead of silently promoting the whole
        # activation graph to f32 — measured 2x activation HBM and a major
        # term in the train step's memory footprint.
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.bn_axis_name,
            dtype=self.dtype,
            scale_init=(
                nn.initializers.zeros if self.zero_bn_scale
                else nn.initializers.ones
            ),
            name="bn",
        )(x)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act == "tanh":
            x = jnp.tanh(x)
        return x


def upsample_nearest(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest x`factor` upsample of [B, H, W, C].

    torch F.interpolate(mode="nearest") with an integer scale factor indexes
    src = floor(dst / factor), which is exactly a repeat
    (hybrid_depth_decoder.py:11-14 and the x4 logit upsamples at :202,259).
    """
    x = jnp.repeat(x, factor, axis=1)
    return jnp.repeat(x, factor, axis=2)


def resize_bilinear(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bilinear resize of [B, H, W, C] with half-pixel (align_corners=False)
    semantics, matching torch-1.2 F.upsample(mode='bilinear')
    (psm_submodule.py:101-110)."""
    import jax

    return jax.image.resize(
        x, (x.shape[0], height, width, x.shape[3]), method="bilinear"
    ).astype(x.dtype)
