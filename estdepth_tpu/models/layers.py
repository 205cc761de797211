"""Conv/Norm building blocks (channels-last, 2D and 3D).

Behavioral equivalents of the reference layer factories
(/root/reference/networks/layers_op.py:10-39): Conv(bias=False) + BatchNorm
(+ activation). BatchNorm uses torch semantics (momentum 0.1 on new stats ->
flax momentum 0.9, eps 1e-5) and supports cross-device stat sync via
`axis_name` — the TPU-native replacement for apex sync-BN
(train_hybrid.py:291-295) using an ICI pmean instead of a NCCL allreduce.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

# Conv weights follow a He-normal fan-out init; BN starts at identity.
_KERNEL_INIT = nn.initializers.he_normal()


class TorchBatchNorm(nn.Module):
    """BatchNorm with exact torch running-statistics semantics.

    torch BatchNorm{2,3}d normalizes with the BIASED batch variance but
    updates running_var with the UNBIASED one (x var * n/(n-1)); torch/apex
    SyncBatchNorm use the GLOBAL element count across the sync group for
    that correction. flax.linen.BatchNorm stores the biased variance, which
    drifts eval-mode outputs of a from-scratch-trained model away from a
    torch-trained reference (worst on deep low-resolution layers where n is
    small: resnet-50 layer4 at 1/32 res has n ~ tens, a several-percent
    running_var gap). Validated against real multi-step torch training in
    tests/test_reference_parity.py::test_training_trajectory_matches_reference.

    Normalization arithmetic replicates flax BatchNorm: statistics reduced
    in float32 (pmean-synced over `axis_name` when given — the apex sync-BN
    equivalent, train_hybrid.py:291-295), then (x - mean) * scale *
    rsqrt(var + eps) + bias computed in the promoted output dtype, so bf16
    models keep bf16 activations (see ConvBN note below).

    State/param names match flax BatchNorm ("mean"/"var" in batch_stats,
    "scale"/"bias" in params) — checkpoint- and converter-compatible.
    """

    use_running_average: bool
    momentum: float = 0.9  # fraction of the OLD stat kept (torch: 1 - 0.1)
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    scale_init: Callable[..., Any] = nn.initializers.ones

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feat = x.shape[-1]
        axes = tuple(range(x.ndim - 1))
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((feat,), jnp.float32),
        )
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((feat,), jnp.float32),
        )
        scale = self.param("scale", self.scale_init, (feat,), jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros, (feat,), jnp.float32
        )

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.promote_types(jnp.float32, x.dtype))
            mean = jnp.mean(xf, axes)
            mean2 = jnp.mean(jnp.square(xf), axes)
            n = 1
            for a in axes:
                n *= x.shape[a]
            # like flax BatchNorm: no cross-device sync during init traces
            # (init runs outside shard_map, so the axis is unbound there)
            if self.axis_name is not None and not self.is_initializing():
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
                n = n * jax.lax.psum(1, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                # torch's unbiased running variance: n/(n-1) over the
                # (sync-)global count
                bessel = n / jnp.maximum(n - 1, 1).astype(jnp.float32)
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var * bessel

        out_dtype = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        y = x.astype(out_dtype) - mean.astype(out_dtype)
        mul = jax.lax.rsqrt(var.astype(out_dtype) + jnp.asarray(
            self.epsilon, out_dtype
        )) * scale.astype(out_dtype)
        return y * mul + bias.astype(out_dtype)


def _tup(v: Union[int, Sequence[int]], rank: int):
    if isinstance(v, int):
        return (v,) * rank
    return tuple(v)


class PackedConv3D(nn.Module):
    """Drop-in nn.Conv replacement (3D, stride 1, SAME padding) evaluated
    as a lane-packed strided conv (ops/packed_conv.py) so small-C_out convs
    fill the MXU's 128 output lanes. Parameter names/shapes are identical
    to nn.Conv ("kernel" [kd,kh,kw,ci,co], optional "bias" [co]) —
    checkpoints, the torch converter, and parity tests are unaffected.
    Falls back to the plain conv when no pack factor divides W."""

    features: int
    kernel: Sequence[int]
    use_bias: bool = False
    dtype: Optional[jnp.dtype] = None
    kernel_init: Callable[..., Any] = _KERNEL_INIT

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from estdepth_tpu.ops.packed_conv import (
            choose_pack, lane_packed_conv3d,
        )

        kd, kh, kw = self.kernel
        k = self.param(
            "kernel", self.kernel_init,
            (kd, kh, kw, x.shape[-1], self.features), jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
            if self.use_bias else None
        )
        p = choose_pack(self.features, x.shape[3]) if kw % 2 == 1 else 1
        # nn.Conv's dtype=None rule: promote input with the f32 params, so
        # a bf16 input runs an f32 conv (not a silent bf16 downcast)
        dtype = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        return lane_packed_conv3d(
            x.astype(dtype), k.astype(dtype), p,
            None if bias is None else bias,
        )


class Decomp3DConv(nn.Module):
    """Drop-in nn.Conv replacement (3D, stride 1, SAME odd-kernel padding)
    evaluated as kd depth-shifted 2D convs over a fused [B*D, H, W, C]
    batch — EXACTLY the same arithmetic (a k x k x k conv is the sum of
    its kd depth slices applied as 2D convs to depth-shifted input).

    The point is XLA's conv BACKWARD: the 3D form materializes gradient
    temps whose {C-minor, batch-sublane} layout tile-pads ~5x at the
    decoder's B<=12 / C=32 shapes (the dominant train-step HBM term,
    ARCHITECTURE.md headroom #1), while the 2D form's fused B*D batch
    (hundreds) never pads sublanes. Parameter names/shapes are identical
    to nn.Conv ("kernel" [kd,kh,kw,ci,co], optional "bias") — checkpoints,
    the converter, and parity tests are unaffected.
    """

    features: int
    kernel: Sequence[int]
    use_bias: bool = False
    dtype: Optional[jnp.dtype] = None
    kernel_init: Callable[..., Any] = _KERNEL_INIT

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kd, kh, kw = self.kernel
        k = self.param(
            "kernel", self.kernel_init,
            (kd, kh, kw, x.shape[-1], self.features), jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
            if self.use_bias else None
        )
        dtype = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        xd = x.astype(dtype)
        kc = k.astype(dtype)
        b, d, h, w, c = x.shape
        xp = jnp.pad(xd, ((0, 0), (kd // 2, kd // 2), (0, 0), (0, 0),
                          (0, 0)))
        out = None
        for i in range(kd):
            xi = jax.lax.dynamic_slice_in_dim(xp, i, d, 1).reshape(
                b * d, h, w, c)
            y = jax.lax.conv_general_dilated(
                xi, kc[i], (1, 1),
                [(kh // 2, kh // 2), (kw // 2, kw // 2)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            out = y if out is None else out + y
        out = out.reshape(b, d, h, w, self.features)
        if bias is not None:
            out = out + bias.astype(dtype)
        return out


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
    # evaluate 3D convs lane-packed (PackedConv3D) — exact same arithmetic,
    # ~2x MXU utilization at the decoder's 16-33 output channels
    lane_pack: bool = False
    # evaluate 3D convs as depth-shifted conv2ds (Decomp3DConv) — exact
    # same arithmetic, avoids the 3D conv backward's padded gradient temps.
    # Tri-state: False | True | "train_only". "train_only" picks the form
    # per call — as2d under train=True, native conv3d under eval — for
    # stages where the two paths prefer opposite forms (the cost-volume
    # prestack: eval forward 4.13 ms native vs 6.22 as2d, train gradient
    # 54.9 ms as2d vs 61.0 native — tools/profile_scan.py, round 4). Both
    # forms bind the identical "conv"/kernel parameter, so one init/
    # checkpoint serves either.
    conv3d_as2d: Union[bool, str] = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        rank = x.ndim - 2
        kernel = _tup(self.kernel, rank)
        pad = self.padding if self.padding is not None else kernel[0] // 2
        if self.dilation > 1:
            pad = self.dilation
        eligible3d = (
            rank == 3
            and _tup(self.stride, rank) == (1, 1, 1)
            and self.dilation == 1
            and all(kk % 2 == 1 for kk in kernel)
            and len(set(kernel)) == 1  # cubic: per-dim pad == pad below
            and pad == kernel[0] // 2
        )
        as2d = (
            train if self.conv3d_as2d == "train_only" else self.conv3d_as2d
        )
        if as2d and eligible3d and kernel[0] > 1:
            x = Decomp3DConv(
                self.features, kernel, dtype=self.dtype, name="conv",
            )(x)
        elif self.lane_pack and eligible3d:
            x = PackedConv3D(
                self.features, kernel, dtype=self.dtype, name="conv",
            )(x)
        else:
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
        x = TorchBatchNorm(
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
