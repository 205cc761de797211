"""Epipolar spatio-temporal transformer: per-voxel attention + ConvGRU fusion.

Behavioral equivalent of EpipolarTransformer
(/root/reference/transformer/epipolar_transformer.py:10-83). For each voxel
of the target cost volume it attends over the same voxel in N neighbor
volumes that were epipolar-warped into the target frustum, then fuses the
attended context into the target value volume with a 3D ConvGRU.

TPU-native differences from the reference:
  * the neighbor axis is a static, padded leading axis with a validity mask
    instead of a Python list — one jit specialization per (num, memory) shape
    rather than per-call graph rebuilds;
  * the attention softmax masks invalid neighbors with -inf and the
    "h = mean over neighbors" (epipolar_transformer.py:73) becomes
    sum(attn * v) / n_valid, which reduces to the reference exactly when all
    neighbors are valid, and to the reference's zero-h fallback
    (epipolar_transformer.py:78-79) when none are.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

_NEG_INF = -1e9


class EpipolarTransformer(nn.Module):
    """channels: key/value channel count (reference base_channels // 2 = 16).

    use_pallas: route the attention stage through the fused Pallas kernel
    (ops/pallas/epipolar_attention.py). Default off — see that module's
    docstring for the measured tradeoff vs XLA's producer fusion.
    """

    channels: int = 16
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False
    pallas_interpret: bool = False  # set for CPU tests
    # lane-packed GRU convs (ops/packed_conv.py): exact, ~2x MXU fill
    lane_pack: bool = False
    # GRU convs as depth-shifted conv2ds (layers.Decomp3DConv): exact,
    # sidesteps the conv3d backward's padded gradient temps
    conv3d_as2d: bool = False

    @nn.compact
    def __call__(
        self,
        target_key: jnp.ndarray,      # [B, D, H, W, C]
        target_value: jnp.ndarray,    # [B, D, H, W, C]
        warped_keys: Optional[jnp.ndarray] = None,    # [N, B, D, H, W, C]
        warped_values: Optional[jnp.ndarray] = None,  # [N, B, D, H, W, C]
        neighbor_valid: Optional[jnp.ndarray] = None,  # [N, B] bool
    ) -> jnp.ndarray:
        c = self.channels

        if warped_keys is not None and warped_keys.shape[0] > 0:
            n = warped_keys.shape[0]
            if neighbor_valid is None:
                neighbor_valid = jnp.ones(
                    (n, target_key.shape[0]), dtype=jnp.bool_
                )
            if self.use_pallas:
                h = self._pallas_attention(
                    target_key, warped_keys, warped_values, neighbor_valid
                )
            else:
                # per-voxel correlation over channels
                # (epipolar_transformer.py:65)
                corr = jnp.sum(target_key[None] * warped_keys, axis=-1)
                vmask = neighbor_valid[:, :, None, None, None]
                logits = jnp.where(vmask, corr.astype(jnp.float32), _NEG_INF)
                attn = nn.softmax(logits, axis=0)
                attn = jnp.where(vmask, attn, 0.0)
                n_valid = jnp.sum(neighbor_valid.astype(jnp.float32), axis=0)
                # reference: mean over neighbor axis of (values * attn) (:73)
                h = jnp.sum(
                    warped_values
                    * attn[..., None].astype(target_value.dtype),
                    axis=0,
                )
                h = h / jnp.maximum(n_valid, 1.0)[
                    :, None, None, None, None
                ].astype(h.dtype)
        else:
            h = jnp.zeros_like(target_value)

        if self.conv3d_as2d:
            from estdepth_tpu.models.layers import Decomp3DConv

            def conv3(features, name):
                return Decomp3DConv(
                    features, (3, 3, 3), use_bias=True, dtype=self.dtype,
                    kernel_init=nn.initializers.lecun_normal(), name=name,
                )
        elif self.lane_pack:
            from estdepth_tpu.models.layers import PackedConv3D

            def conv3(features, name):
                return PackedConv3D(
                    features, (3, 3, 3), use_bias=True, dtype=self.dtype,
                    kernel_init=nn.initializers.lecun_normal(), name=name,
                )
        else:
            def conv3(features, name):
                return nn.Conv(
                    features, (3, 3, 3), padding=[(1, 1)] * 3,
                    dtype=self.dtype, name=name,
                )

        x = target_value
        xh = jnp.concatenate([x, h], axis=-1)  # [B,D,H,W,2C]
        gates = conv3(2 * c, "gate_conv")(xh)
        r = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype, name="reset_gate_norm")(
            gates[..., :c]
        )
        u = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype, name="update_gate_norm")(
            gates[..., c:]
        )
        r = nn.sigmoid(r)
        u = nn.sigmoid(u)

        o = conv3(c, "output_conv")(jnp.concatenate([x, r * h], axis=-1))
        o = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype, name="output_norm")(o)
        y = jnp.tanh(o)
        return u * h + (1.0 - u) * y

    def _pallas_attention(self, target_key, warped_keys, warped_values, valid):
        """Fold [B, D] and [H, W] and call the fused kernel."""
        from estdepth_tpu.ops.pallas import epipolar_attention

        n, b, d, h, w, c = warped_keys.shape
        s, p = b * d, h * w
        out = epipolar_attention(
            target_key.reshape(s, p, c),
            warped_keys.reshape(n, s, p, c),
            warped_values.reshape(n, s, p, c),
            jnp.repeat(valid, d, axis=1),  # [N, B] -> [N, B*D]
            interpret=self.pallas_interpret,
        )
        return out.reshape(b, d, h, w, c)
