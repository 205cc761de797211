"""Hybrid depth decoder: semantic U-Net + 3D matching stack + EST fusion.

Behavioral equivalent of DepthHybridDecoder
(/root/reference/hybrid_models/hybrid_depth_decoder.py:41-433), redesigned
for TPU/XLA:

  * the per-target Python loops over warps and attention
    (hybrid_depth_decoder.py:229-260) are folded into one batched
    frustum_warp + one batched EpipolarTransformer call over a static
    (target, neighbor) pair list — every hot op is a single large conv /
    gather instead of many small ones;
  * the softargmin is taken at cost-volume resolution and the *depth map*
    is nearest-upsampled x4, which is mathematically identical to the
    reference's upsample-logits-then-softargmin (F.interpolate default
    nearest, hybrid_depth_decoder.py:202,259) because depth hypotheses are
    spatially constant — a 16x saving on softmax work;
  * streaming state is the fixed-shape ESTMemory pytree instead of Python
    lists.

Two forward behaviors, selected by the static `use_est` flag exactly like
the reference's `flag` (hybrid_depth_decoder.py:423): with EST fusion
(forward_transformer, :138-292) and without (forward_notransformer,
:294-417).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from estdepth_tpu.models.est_transformer import EpipolarTransformer
from estdepth_tpu.models.layers import ConvBN, upsample_nearest
from estdepth_tpu.models.memory import ESTMemory
from estdepth_tpu.ops.warp import frustum_warp


def softargmin_depth(
    logits: jnp.ndarray, depth_values: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Depth expectation + max probability from plane logits.

    logits: [N, D, H, W]; depth_values: [N, D].
    Equivalent of depthlayer (hybrid_depth_decoder.py:33-38). fp32 reduction.
    """
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
    depth = jnp.einsum("ndhw,nd->nhw", probs, depth_values.astype(jnp.float32))
    prob = jnp.max(probs, axis=1)
    return depth, prob


class ConvBlock(nn.Module):
    """convbn 3x3 + ReLU (hybrid_depth_decoder.py:17-30)."""

    features: int
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvBN(
            self.features, 3, 1, act="relu",
            bn_axis_name=self.bn_axis_name, dtype=self.dtype, name="conv",
        )(x, train)


class ConvBNRelu3D(nn.Module):
    features: int
    kernel: int = 3
    act: str = "relu"
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    lane_pack: bool = False
    conv3d_as2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvBN(
            self.features, (self.kernel,) * 3, 1, act=self.act,
            bn_axis_name=self.bn_axis_name, dtype=self.dtype,
            lane_pack=self.lane_pack, conv3d_as2d=self.conv3d_as2d,
            name="conv",
        )(x, train)


class StereoHead(nn.Module):
    """convbnrelu_3d(16) + Conv3d(16->1, k1, bias) (decoder :104-112)."""

    channels: int = 16
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    lane_pack: bool = False
    conv3d_as2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNRelu3D(
            self.channels, 3, bn_axis_name=self.bn_axis_name, dtype=self.dtype,
            lane_pack=self.lane_pack, conv3d_as2d=self.conv3d_as2d,
            name="conv0",
        )(x, train)
        if self.lane_pack:
            from estdepth_tpu.models.layers import PackedConv3D

            x = PackedConv3D(
                1, (1, 1, 1), use_bias=True, dtype=self.dtype,
                kernel_init=nn.initializers.lecun_normal(), name="out",
            )(x)
        else:
            x = nn.Conv(
                1, (1, 1, 1), padding="VALID", dtype=self.dtype, name="out",
            )(x)
        return x[..., 0]  # [N, D, H, W]


class DepthHybridDecoder(nn.Module):
    ndepths: int = 64
    depth_max: float = 10.0
    est_transformer: bool = True
    # Reference-faithful sequential fusion: the reference updates values[i]
    # in place inside its per-target loop (hybrid_depth_decoder.py:253), so
    # target i attends over the already-FUSED values of targets j < i.
    # True (default) replicates that chain; False runs all targets against
    # pre-fusion neighbor values in one batched call (more parallel,
    # identical when num == 1, i.e. in ESTM streaming).
    sequential_fusion: bool = True
    # Reference-faithful TRAIN-mode BN for stereo_head1: the reference calls
    # it once per target INSIDE the fusion loop (hybrid_depth_decoder.py:256),
    # so in train mode its BN normalizes per-target batches and its running
    # stats update `num` times per step. Default folds all targets into one
    # call (identical in eval mode; pooled batch stats in train — the
    # TPU-native choice). See DepthNetHybrid.sequential_cost_bn.
    sequential_head_bn: bool = False
    base_channels: int = 32
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    # route EST attention through the fused Pallas kernel
    # (ops/pallas/epipolar_attention.py) — measured tradeoff documented
    # there and in ARCHITECTURE.md; default off (XLA producer-fusion wins)
    use_pallas_attention: bool = False
    pallas_interpret: bool = False  # CPU-test mode for the kernel
    # evaluate the 3D stack's convs lane-packed (ops/packed_conv.py) —
    # exact same arithmetic, ~2x MXU output-lane utilization
    lane_pack: bool = False
    # evaluate the 3D stack's convs as depth-shifted conv2ds
    # (layers.Decomp3DConv) — exact same arithmetic, sidesteps the conv3d
    # BACKWARD's {C-minor, batch-sublane} padded gradient temps
    conv3d_as2d: bool = False
    # route EST memory warps through frustum_warp(mode="plane_mix") — the
    # measured-fast z-mix-matmul + 2D-gather reformulation (ops/warp.py);
    # sub-plane-spacing deviation from the exact trilinear, so default off
    fast_frustum: bool = False
    pallas_warp: bool = False
    # upgrade either fast mode with the slope-carry exact-z correction
    # (ops/warp_exact_z.py): z deviation drops to second order for ~2x the
    # fast warp's resample cost — the parity-fast combination
    exact_z: bool = False
    # ride the exact-z Pallas kernels' (A, s) pair as origin-shifted bf16
    # int32 lanes (ops/pallas/plane_warp_exact_z.py): plain plane-mix
    # kernel cost, ~1e-4-class transport quantization. Only meaningful
    # with pallas_warp + exact_z; ignored otherwise.
    packed_exact_z: bool = False

    @property
    def _frustum_mode(self) -> str:
        ez = "_exact_z" if self.exact_z else ""
        if self.pallas_warp:
            if self.exact_z and self.packed_exact_z:
                ez = "_exact_z_packed"
            return "plane_mix_pallas" + ez
        return ("plane_mix" + ez) if self.fast_frustum else "exact"

    def setup(self):
        # num_ch_dec = [16, 32, ndepths, 128, 256] (decoder :52)
        kw = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        self.upconv_4_0 = ConvBlock(256, **kw)
        self.upconv_4_1 = ConvBlock(256, **kw)
        self.upconv_3_0 = ConvBlock(128, **kw)
        self.upconv_3_1 = ConvBlock(128, **kw)
        self.upconv_2_0 = ConvBlock(self.ndepths, **kw)
        self.upconv_2_1 = ConvBlock(self.ndepths, **kw)
        self.upconv_1_0 = ConvBlock(32, **kw)
        self.upconv_1_1 = ConvBlock(32, **kw)
        self.upconv_0_0 = ConvBlock(16, **kw)
        self.upconv_0_1 = ConvBlock(16, **kw)
        self.dispconv_1 = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype)
        self.dispconv_0 = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype)

        bc = self.base_channels
        kw3 = dict(kw, lane_pack=self.lane_pack,
                   conv3d_as2d=self.conv3d_as2d)
        self.dres0_0 = ConvBNRelu3D(bc, **kw3)
        self.dres0_1 = ConvBNRelu3D(bc, **kw3)
        self.dres1_0 = ConvBNRelu3D(bc, **kw3)
        self.dres1_1 = ConvBNRelu3D(bc, **kw3)
        self.dres2 = ConvBNRelu3D(bc + 1, **kw3)
        self.key_layer = ConvBNRelu3D(bc // 2, **kw3)
        self.value_layer = ConvBNRelu3D(bc // 2, act="tanh", **kw3)
        self.stereo_head0 = StereoHead(bc // 2, **kw3)
        self.stereo_head1 = StereoHead(bc // 2, **kw3)
        if self.est_transformer:
            self.est = EpipolarTransformer(
                bc // 2, dtype=self.dtype,
                use_pallas=self.use_pallas_attention,
                pallas_interpret=self.pallas_interpret,
                lane_pack=self.lane_pack,
                conv3d_as2d=self.conv3d_as2d,
            )

    def _semantic_unet(self, feats: List[jnp.ndarray], train: bool):
        """Scales 4->2 of the monodepth2-style U-Net (decoder :163-184).

        Returns semantic_vs [BN, H, W, ndepths] at 1/4 resolution.
        """
        x = self.upconv_4_0(feats[4], train)
        x = jnp.concatenate([upsample_nearest(x), feats[3]], axis=-1)
        x = self.upconv_4_1(x, train)

        x = self.upconv_3_0(x, train)
        x = jnp.concatenate([upsample_nearest(x), feats[2]], axis=-1)
        x = self.upconv_3_1(x, train)

        x = self.upconv_2_0(x, train)
        x = jnp.concatenate([upsample_nearest(x), feats[1]], axis=-1)
        return self.upconv_2_1(x, train)

    def _est_fusion(
        self,
        key: jnp.ndarray,       # [B, num, D, H, W, C]
        value: jnp.ndarray,     # [B, num, D, H, W, C]
        target_poses: jnp.ndarray,  # [B, num, 4, 4]
        cam_intr: jnp.ndarray,      # [B, 3, 3]
        depth_values: jnp.ndarray,  # [B, D]
        depth_min: float,
        depth_interval: float,
        memory: Optional[ESTMemory],
    ) -> jnp.ndarray:
        """Warp every neighbor (in-window + memory) into each target frustum
        and fuse with the EST transformer. Returns fused values
        [B, num, D, H, W, C].

        Mirrors the double loop at hybrid_depth_decoder.py:229-253, batched:
        rel_pose = pose_j @ inv(pose_i) (:235), warp keys and values (:237-243),
        attention+GRU fusion (:248-251).
        """
        b, num, d, h, w, c = key.shape

        if memory is not None and memory.size > 0:
            all_keys = jnp.concatenate([key, memory.keys.astype(key.dtype)], 1)
            all_vals = jnp.concatenate([value, memory.values.astype(value.dtype)], 1)
            all_poses = jnp.concatenate([target_poses, memory.poses], 1)
            window_valid = jnp.ones((b, num), jnp.bool_)
            all_valid = jnp.concatenate([window_valid, memory.valid], 1)
        else:
            all_keys, all_vals, all_poses = key, value, target_poses
            all_valid = jnp.ones((b, num), jnp.bool_)

        s = all_keys.shape[1]
        nn_per_target = s - 1
        pairs = [(i, j) for i in range(num) for j in range(s) if j != i]
        if not pairs:
            # single target, no memory: zero-h GRU fallback
            # (epipolar_transformer.py:78-79)
            fused = self.est(
                key.reshape(b * num, d, h, w, c),
                value.reshape(b * num, d, h, w, c),
            )
            return fused.reshape(b, num, d, h, w, c)
        idx_i = jnp.array([p[0] for p in pairs])  # target index
        idx_j = jnp.array([p[1] for p in pairs])  # neighbor index
        p = len(pairs)

        nb_keys = jnp.take(all_keys, idx_j, axis=1)      # [B, P, D, H, W, C]
        nb_vals = jnp.take(all_vals, idx_j, axis=1)
        nb_valid = jnp.take(all_valid, idx_j, axis=1)    # [B, P]
        nb_poses = jnp.take(all_poses, idx_j, axis=1)    # [B, P, 4, 4]
        ref_poses = jnp.take(target_poses, idx_i, axis=1)

        rel = jnp.einsum(
            "bpij,bpjk->bpik", nb_poses, jnp.linalg.inv(ref_poses),
            precision=jax.lax.Precision.HIGHEST,
        )

        # fold pairs into batch for one big warp
        def fold(x):
            return x.reshape((b * p,) + x.shape[2:])

        k_rep = jnp.tile(cam_intr[:, None], (1, p, 1, 1))
        dv_rep = jnp.tile(depth_values[:, None], (1, p, 1))
        kv = jnp.concatenate([nb_keys, nb_vals], axis=-1)  # warp both in one pass
        warped = frustum_warp(
            fold(kv), fold(rel), fold(k_rep), fold(dv_rep),
            depth_min, depth_interval,
            mode=self._frustum_mode,
        )
        warped = warped.reshape(b, num, nn_per_target, d, h, w, 2 * c)
        # neighbor-leading, targets folded into batch: [Nn, B*num, D, H, W, C]
        warped = jnp.moveaxis(warped, 2, 0).reshape(
            nn_per_target, b * num, d, h, w, 2 * c
        )
        warped_k, warped_v = warped[..., :c], warped[..., c:]
        valid = jnp.moveaxis(
            nb_valid.reshape(b, num, nn_per_target), 2, 0
        ).reshape(nn_per_target, b * num)

        fused = self.est(
            key.reshape(b * num, d, h, w, c),
            value.reshape(b * num, d, h, w, c),
            warped_k,
            warped_v,
            valid,
        )
        return fused.reshape(b, num, d, h, w, c)

    def _est_fusion_sequential(
        self,
        key: jnp.ndarray,       # [B, num, D, H, W, C]
        value: jnp.ndarray,     # [B, num, D, H, W, C]
        target_poses: jnp.ndarray,
        cam_intr: jnp.ndarray,
        depth_values: jnp.ndarray,
        depth_min: float,
        depth_interval: float,
        memory: Optional[ESTMemory],
    ) -> jnp.ndarray:
        """Reference-faithful fusion: targets processed in order, each
        attending over the CURRENT state of its neighbors — in-window
        neighbors j < i are already fused (hybrid_depth_decoder.py:229-254).
        Keys never change, so key warps still batch across all pairs."""
        b, num, d, h, w, c = key.shape

        if memory is not None and memory.size > 0:
            all_poses = jnp.concatenate([target_poses, memory.poses], 1)
            window_valid = jnp.ones((b, num), jnp.bool_)
            all_valid = jnp.concatenate([window_valid, memory.valid], 1)
            mem_keys = memory.keys.astype(key.dtype)
            mem_vals = memory.values.astype(value.dtype)
        else:
            all_poses = target_poses
            all_valid = jnp.ones((b, num), jnp.bool_)
            mem_keys = mem_vals = None

        s = all_poses.shape[1]
        if s == 1:
            return self.est(key[:, 0], value[:, 0])[:, None]

        values = [value[:, i] for i in range(num)]
        keys_all = [key[:, i] for i in range(num)]
        if mem_keys is not None:
            keys_all += [mem_keys[:, m] for m in range(memory.size)]

        for i in range(num):
            nb_idx = [j for j in range(s) if j != i]
            nn = len(nb_idx)
            rel = jnp.einsum(
                "bnij,bjk->bnik",
                jnp.stack([all_poses[:, j] for j in nb_idx], 1),
                jnp.linalg.inv(target_poses[:, i]),
                precision=jax.lax.Precision.HIGHEST,
            )
            # current neighbor K/V (values of j < i already fused)
            nb_k = jnp.stack([keys_all[j] for j in nb_idx], 1)
            nb_v = jnp.stack(
                [
                    values[j] if j < num else mem_vals[:, j - num]
                    for j in nb_idx
                ],
                1,
            )
            kv = jnp.concatenate([nb_k, nb_v], axis=-1)
            warped = frustum_warp(
                kv.reshape(b * nn, d, h, w, 2 * c),
                rel.reshape(b * nn, 4, 4),
                jnp.tile(cam_intr[:, None], (1, nn, 1, 1)).reshape(b * nn, 3, 3),
                jnp.tile(depth_values[:, None], (1, nn, 1)).reshape(b * nn, -1),
                depth_min, depth_interval,
                mode=self._frustum_mode,
            ).reshape(b, nn, d, h, w, 2 * c)
            warped = jnp.moveaxis(warped, 1, 0)  # [NN, B, D, H, W, 2C]
            valid_i = jnp.stack([all_valid[:, j] for j in nb_idx], 0)  # [NN,B]
            fused = self.est(
                key[:, i], values[i], warped[..., :c], warped[..., c:],
                valid_i,
            )
            values[i] = fused
        return jnp.stack(values, axis=1)

    def __call__(
        self,
        cost_volumes: jnp.ndarray,            # [B, num, D, H, W, 32]
        semantic_features: List[jnp.ndarray],  # 5 maps, [B*num, h, w, c]
        target_poses: jnp.ndarray,             # [B, num, 4, 4]
        cam_intr: jnp.ndarray,                 # [B, 3, 3] at 1/4 res
        depth_values: jnp.ndarray,             # [B, D]
        depth_min: float,
        depth_interval: float,
        memory: Optional[ESTMemory] = None,
        use_est: bool = True,
        train: bool = False,
    ):
        b, num, d, h, w, _ = cost_volumes.shape
        bn = b * num
        use_est = use_est and self.est_transformer

        semantic_vs = self._semantic_unet(semantic_features, train)  # [BN,H,W,nd]

        mx = self.dres0_0(cost_volumes.reshape(bn, d, h, w, -1), train)
        mx = self.dres0_1(mx, train)
        mx = self.dres1_0(mx, train)
        mx = self.dres1_1(mx, train)

        # reinterpret semantic channels as the depth axis and fuse (decoder :195)
        sem_vol = jnp.moveaxis(semantic_vs, -1, 1)[..., None]  # [BN, D, H, W, 1]
        x3 = jnp.concatenate([sem_vol.astype(mx.dtype), mx], axis=-1)
        x3 = self.dres2(x3, train)

        value = self.value_layer(x3, train)  # [BN, D, H, W, 16] tanh
        key = self.key_layer(x3, train)      # relu

        dv_bn = jnp.repeat(depth_values, num, axis=0)  # [BN, D]

        init_logits = self.stereo_head0(value, train)  # [BN, D, H, W]
        depth3, prob3 = softargmin_depth(init_logits, dv_bn)

        key_w = key.reshape(b, num, d, h, w, -1)
        value_w = value.reshape(b, num, d, h, w, -1)

        if self.est_transformer and not use_est and self.is_initializing():
            # Materialize EST params even when this init trace skips the EST
            # path, so any checkpoint/init covers every specialization.
            self.est(key_w[:, 0], value_w[:, 0])

        if use_est:
            fusion = (
                self._est_fusion_sequential
                if self.sequential_fusion
                else self._est_fusion
            )
            fused = fusion(
                key_w, value_w, target_poses, cam_intr, depth_values,
                depth_min, depth_interval, memory,
            )  # [B, num, D, H, W, C]
            if self.sequential_head_bn and train:
                # reference loop order: one head call per target, each with
                # its own BN batch stats + sequential running-stat updates
                # (hybrid_depth_decoder.py:229,256)
                fused_logits = jnp.stack(
                    [self.stereo_head1(fused[:, i], train) for i in range(num)],
                    axis=1,
                ).reshape(bn, d, h, w)
            else:
                fused_logits = self.stereo_head1(
                    fused.reshape(bn, d, h, w, -1), train
                )
            state_value = fused[:, -1]
        else:
            fused_logits = self.stereo_head1(value, train)
            state_value = value_w[:, -1]

        depth2, prob2 = softargmin_depth(fused_logits, dv_bn)

        # 2D refinement (decoder :264-290): logits' plane axis becomes channels
        fl2d = jnp.moveaxis(fused_logits, 1, -1).astype(semantic_vs.dtype)
        x = self.upconv_1_0(
            jnp.concatenate([semantic_vs, nn.relu(fl2d)], axis=-1), train
        )
        x = jnp.concatenate([upsample_nearest(x), semantic_features[0]], axis=-1)
        x = self.upconv_1_1(x, train)
        depth1 = self.depth_max * nn.sigmoid(
            self.dispconv_1(x).astype(jnp.float32)
        )  # [BN, 2H, 2W, 1]

        x = self.upconv_0_0(x, train)
        x = upsample_nearest(x)
        x = self.upconv_0_1(x, train)
        depth0 = self.depth_max * nn.sigmoid(
            self.dispconv_0(x).astype(jnp.float32)
        )  # [BN, 4H, 4W, 1]

        def full(x2d, factor):  # [BN, h', w'] or [BN,h',w',1] -> [B, num, 4H, 4W]
            if x2d.ndim == 4:
                x2d = x2d[..., 0]
            if factor > 1:
                x2d = upsample_nearest(x2d[..., None], factor)[..., 0]
            return x2d.reshape(b, num, 4 * h, 4 * w)

        outputs: Dict[str, jnp.ndarray] = {
            # [B, num, scales=4, 4H, 4W]; scale s matches ("depth", i, s)
            "depth": jnp.stack(
                [full(depth0, 1), full(depth1, 2), full(depth2, 4), full(depth3, 4)],
                axis=2,
            ),
            "init_prob": full(prob3, 4),
            "fused_prob": full(prob2, 4),
        }

        # streaming state: detached key (pre-fusion) + value (fused when EST
        # ran) of the LAST target (decoder :215-216,253-254,292)
        new_key = jax.lax.stop_gradient(key_w[:, -1])
        new_value = jax.lax.stop_gradient(state_value)
        new_pose = target_poses[:, -1]
        return outputs, new_key, new_value, new_pose
