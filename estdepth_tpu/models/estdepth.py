"""DepthNetHybrid: the flagship hybrid MVS depth network.

Behavioral equivalent of DepthNetHybrid
(/root/reference/hybrid_models/model_hybrid.py:14-184): given V >= 3 frames
with poses and intrinsics, predicts full-resolution depth for the V-2 middle
("target") frames at 4 scales, optionally fusing an ESTMemory of past
key/value cost volumes (streaming / ESTM mode).

TPU-native design points:
  * the per-target cost-volume loop (model_hybrid.py:152-164) is batched:
    all (target, left/right-neighbor) plane-sweep warps run as one folded
    plane_sweep_warp call and one folded conv stack;
  * losses/metrics are NOT computed inside the model (pure forward);
    see estdepth_tpu/train/loss.py and eval/metrics.py;
  * all shapes static given (B, V, memory_size) — each inference mode is a
    single jit specialization.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from estdepth_tpu.models.decoder import DepthHybridDecoder
from estdepth_tpu.models.layers import ConvBN
from estdepth_tpu.models.memory import ESTMemory
from estdepth_tpu.models.psm import PSMFeatureNet
from estdepth_tpu.models.resnet import ResNetEncoder
from estdepth_tpu.ops.geometry import camera_projection, scale_intrinsics
from estdepth_tpu.ops.warp import plane_sweep_warp


class DepthNetHybrid(nn.Module):
    ndepths: int = 64
    depth_min: float = 0.01
    depth_max: float = 10.0
    resnet: int = 50
    # matching encoder family: "psm" (default path) or "senet"
    # (model_hybrid.py:22 "featureNet: psm or senet")
    feature_net: str = "psm"
    est_transformer: bool = True
    # reference-faithful in-window fusion order (see DepthHybridDecoder)
    sequential_fusion: bool = True
    # Reference-faithful TRAIN-mode BN batching. The reference runs the
    # cost-volume pre stack once per (target, neighbor) pair in loop order
    # (model_hybrid.py:79-95 inside :152-164) and stereo_head1 once per
    # target inside the fusion loop (hybrid_depth_decoder.py:256), so in
    # train mode those BNs normalize with per-call batch statistics and
    # their running stats update several times per step. The default folds
    # everything into ONE call each (identical in eval-mode; pooled batch
    # stats in train — the TPU-native choice). Enable for exact multi-step
    # training parity runs (tests/test_reference_parity.py trajectory test).
    sequential_cost_bn: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    # fused Pallas EST attention (see DepthHybridDecoder) — default off
    use_pallas_attention: bool = False
    pallas_interpret: bool = False
    # Route EST memory warps through the plane-mix frustum resample
    # (ops/warp.py frustum_warp mode="plane_mix"): the per-voxel trilinear
    # gather is the profiled bottleneck of the window step; this trades a
    # sub-plane-spacing interpolation deviation for ~3x cheaper warps.
    # Default off (exact reference semantics); accuracy pinned in
    # tests/test_warp.py, end-metric check in tests/test_fast_frustum.py.
    fast_frustum: bool = False
    # Route BOTH hot warps (EST memory frustum + cost-volume plane-sweep)
    # through the Pallas lane-gather kernels (ops/pallas/plane_warp.py):
    # the gather engine leaves the critical path entirely — z-mix and the
    # two-pass homography resample run as same-shape vreg lane gathers on
    # the VPU. Implies the plane-mix z semantics plus a sub-pixel two-pass
    # x deviation (tests/test_pallas_warp.py pins tolerances). Trainable:
    # the kernels carry a custom VJP — the plane-mix XLA path's gradient
    # w.r.t. the sampled volume at identical coordinates, with zero
    # coordinate cotangents (the reference's no_grad grid math,
    # homo_utils.py:468).
    pallas_warp: bool = False
    # Upgrade the fast warp modes (fast_frustum / pallas_warp) with the
    # slope-carry exact-z correction (ops/warp_exact_z.py): the z-lerp is
    # corrected to the EXACT per-voxel source plane index, dropping the
    # fast warps' dominant deviation from first to second order for ~2x
    # their (small) resample cost. No effect on the exact default.
    exact_z_warp: bool = False
    # Ride the exact-z Pallas kernels' (A, s) pair as origin-shifted bf16
    # int32 lanes (ops/pallas/plane_warp_exact_z.py module doc): restores
    # plain plane-mix kernel cost for a ~1e-4-class transport
    # quantization of the corrected value. Only meaningful with
    # pallas_warp + exact_z_warp; ignored otherwise.
    packed_exact_z: bool = False
    # Evaluate the 3D-stack convs lane-packed (ops/packed_conv.py): exactly
    # the same arithmetic restructured so p horizontally-adjacent output
    # pixels share the MXU's 128 output lanes — the decoder's 16-33-channel
    # conv3ds otherwise run at 12-25% lane fill. Checkpoint-compatible
    # (identical parameter tree); measured win recorded in ARCHITECTURE.md.
    lane_pack: bool = False
    # Evaluate 3x3x3 convs as depth-shifted conv2ds (layers.Decomp3DConv):
    # exactly the same arithmetic; targets the conv3d BACKWARD's padded
    # gradient temps (the dominant train-step HBM term) and the forward's
    # tile-padded conv3d temps. Checkpoint-compatible (identical parameter
    # tree) and numerically exact (parity_gate 1.4e-7 end-to-end), measured
    # faster on BOTH paths (train 1.41x, eval scan +11% — ARCHITECTURE.md),
    # so it is the DEFAULT execution strategy; conv3d_as2d=False /
    # --no-conv3d-as2d restores XLA's native conv3d lowering.
    conv3d_as2d: bool = True

    @property
    def depth_interval(self) -> float:
        return (self.depth_max - self.depth_min) / (self.ndepths - 1)

    def depth_candidates(self, batch: int) -> jnp.ndarray:
        """[B, D] uniform depth hypotheses (model_hybrid.py:29-33)."""
        cands = (
            jnp.arange(self.ndepths, dtype=jnp.float32) * self.depth_interval
            + self.depth_min
        )
        return jnp.tile(cands[None], (batch, 1))

    def setup(self):
        kw = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        if self.feature_net == "psm":
            self.matching_feature = PSMFeatureNet(**kw)
        elif self.feature_net == "senet":
            from estdepth_tpu.models.senet import SEFeatureNet

            self.matching_feature = SEFeatureNet(**kw)
        else:
            raise ValueError(
                f"feature_net must be 'psm' or 'senet', got {self.feature_net!r}"
            )
        self.semantic_feature = ResNetEncoder(self.resnet, **kw)
        self.decoder = DepthHybridDecoder(
            ndepths=self.ndepths,
            depth_max=self.depth_max,
            est_transformer=self.est_transformer,
            sequential_fusion=self.sequential_fusion,
            sequential_head_bn=self.sequential_cost_bn,
            use_pallas_attention=self.use_pallas_attention,
            pallas_interpret=self.pallas_interpret,
            lane_pack=self.lane_pack,
            conv3d_as2d=self.conv3d_as2d,
            fast_frustum=self.fast_frustum,
            pallas_warp=self.pallas_warp,
            exact_z=self.exact_z_warp,
            packed_exact_z=self.packed_exact_z,
            **kw,
        )
        # cost-volume pair aggregation (model_hybrid.py:58-60).
        # The prestack is the one 3D stage whose eval forward is FASTER
        # native (4.13 vs 6.22 ms — XLA fuses the residual composite's
        # conv3d temps well, while the as2d form's depth-shifted input
        # copies don't fuse) but whose train gradient is faster as2d
        # (54.9 vs 61.0 ms) — tools/profile_scan.py, round 4. "train_only"
        # selects per call; both forms share the same parameters.
        kw3 = dict(kw, lane_pack=self.lane_pack,
                   conv3d_as2d="train_only" if self.conv3d_as2d else False)
        self.pre0 = ConvBN(32, (1, 1, 1), 1, padding=0, **kw3)
        self.pre1 = ConvBN(32, (3, 3, 3), 1, act="relu", **kw3)
        self.pre2 = ConvBN(32, (3, 3, 3), 1, zero_bn_scale=True, **kw3)

    def _cost_volumes(
        self,
        feats: jnp.ndarray,        # [B, V, H, W, 32] stride-4 matching feats
        cam_poses: jnp.ndarray,    # [B, V, 4, 4]
        cam_intr_s1: jnp.ndarray,  # [B, 3, 3] at 1/4 res
        depth_values: jnp.ndarray,  # [B, D]
        train: bool,
    ) -> jnp.ndarray:
        """Batched equivalent of get_costvolume over all targets
        (model_hybrid.py:62-102,152-164).

        For each target t in 1..V-2 and each neighbor in {t-1, t+1}:
        plane-sweep warp the neighbor features, concat [ref, warped], run the
        pre0 + residual(pre2 . pre1) stack, then average the two neighbor
        contributions. Returns [B, T, D, H, W, 32].
        """
        b, v, h, w, c = feats.shape
        t = v - 2
        d = depth_values.shape[1]

        proj = camera_projection(
            jnp.tile(cam_intr_s1[:, None], (1, v, 1, 1)).reshape(b * v, 3, 3),
            cam_poses.reshape(b * v, 4, 4),
        ).reshape(b, v, 4, 4)

        ref_feats = feats[:, 1 : 1 + t]      # [B, T, H, W, C]
        ref_proj = proj[:, 1 : 1 + t]
        # neighbor pairs: left = t-1, right = t+1; pair axis leads the fold
        src_feats = jnp.stack([feats[:, 0:t], feats[:, 2 : 2 + t]], axis=0)
        src_proj = jnp.stack([proj[:, 0:t], proj[:, 2 : 2 + t]], axis=0)
        bp = 2 * b * t
        src_feats = src_feats.reshape(bp, h, w, c)
        src_proj = src_proj.reshape(bp, 4, 4)
        ref_proj2 = jnp.broadcast_to(ref_proj[None], (2, b, t, 4, 4)).reshape(
            bp, 4, 4
        )
        dv2 = jnp.broadcast_to(depth_values[None, :, None], (2, b, t, d)).reshape(
            bp, d
        )

        warped = plane_sweep_warp(
            src_feats, src_proj, ref_proj2, dv2,
            backend="pallas" if self.pallas_warp else "xla",
        )
        # ref volume expanded over planes (model_hybrid.py:76)
        ref_vol = jnp.broadcast_to(
            ref_feats[None, :, :, None], (2, b, t, d, h, w, c)
        ).reshape(bp, d, h, w, c)

        x = jnp.concatenate([ref_vol, warped], axis=-1)  # 64ch
        if self.sequential_cost_bn and train:
            # reference loop order (t0,L),(t0,R),(t1,L),...: one pre-stack
            # call per pair, each with its own BN batch stats (see the
            # sequential_cost_bn field note)
            ys = []
            for ti in range(t):
                for pi in range(2):
                    rows = pi * b * t + jnp.arange(b) * t + ti
                    yi = self.pre0(jnp.take(x, rows, axis=0), train)
                    yi = yi + self.pre2(self.pre1(yi, train), train)
                    ys.append(yi)
            y = jnp.stack(ys, 0).reshape((t, 2, b) + ys[0].shape[1:])
            return jnp.moveaxis(y.mean(axis=1), 0, 1)  # [B, T, D, H, W, C]
        x = self.pre0(x, train)
        x = x + self.pre2(self.pre1(x, train), train)
        # mean over the 2 neighbors (model_hybrid.py:97-99)
        x = x.reshape(2, b, t, d, h, w, -1).mean(axis=0)
        return x

    def compute_matching(self, imgs: jnp.ndarray) -> jnp.ndarray:
        """Stride-4 matching features of [N, H, W, 3] frames (0..255).

        Exposed so streaming drivers can cache per-frame features across
        overlapping windows (eval-mode BN makes them per-frame
        deterministic, so caching is EXACT). Apply with
        `model.apply(vars, frames, method="compute_matching")`.
        """
        # uint8 frames are accepted (the eval datasets upload uint8 — 1/4
        # the host->device bytes); the cast to float happens here, on
        # device, and is exact
        if not jnp.issubdtype(imgs.dtype, jnp.floating):
            imgs = imgs.astype(jnp.float32)
        x = 2.0 * (imgs / 255.0) - 1.0
        if self.dtype is not None:
            x = x.astype(self.dtype)
        feats = self.matching_feature(x, False)
        if isinstance(feats, tuple):  # SEFeatureNet: (1/2, 1/4) maps
            feats = feats[-1]
        return feats

    def __call__(
        self,
        imgs: jnp.ndarray,        # [B, V, H, W, 3] float in [0, 255]
        cam_poses: jnp.ndarray,   # [B, V, 4, 4] cam-to-world
        cam_intr: jnp.ndarray,    # [B, 3, 3] at full res
        memory: Optional[ESTMemory] = None,
        use_est: Optional[bool] = None,
        train: bool = False,
        matching_feats: Optional[jnp.ndarray] = None,
    ) -> Tuple[Dict[str, jnp.ndarray], ESTMemory]:
        """Forward pass.

        Returns (outputs, state) where outputs holds:
          "depth":      [B, T, 4, H, W]  (scale s at index s)
          "init_prob":  [B, T, H, W]
          "fused_prob": [B, T, H, W]
        and state = (key, value, pose) of the last target for ESTM memory
        (push with ESTMemory.push).

        `use_est` defaults to the reference's flag logic
        (hybrid_depth_decoder.py:423): EST fusion runs when training or when
        a memory is provided.

        `matching_feats` ([B, V, H/4, W/4, C], from `compute_matching`)
        skips the in-call matching encoder — streaming drivers pass cached
        features for the lwindow-1 frames shared with the previous window.
        """
        b, v, h_img, w_img, _ = imgs.shape
        assert v > 2, "need at least 3 views (model_hybrid.py:123)"
        t = v - 2
        h, w = h_img // 4, w_img // 4

        if use_est is None:
            use_est = self.est_transformer and (train or memory is not None)

        if not jnp.issubdtype(imgs.dtype, jnp.floating):
            imgs = imgs.astype(jnp.float32)  # uint8 ingest: exact, on device
        imgs = 2.0 * (imgs / 255.0) - 1.0  # (model_hybrid.py:119)
        if self.dtype is not None:
            imgs = imgs.astype(self.dtype)

        if matching_feats is not None:
            matching = matching_feats.astype(
                self.dtype if self.dtype is not None else matching_feats.dtype
            )
            if self.is_initializing():
                # still materialize encoder params on init traces
                self.matching_feature(imgs.reshape(b * v, h_img, w_img, 3),
                                      train)
        else:
            matching = self.matching_feature(
                imgs.reshape(b * v, h_img, w_img, 3), train
            )
            if isinstance(matching, tuple):  # SEFeatureNet: (1/2, 1/4) maps
                matching = matching[-1]
            matching = matching.reshape(b, v, h, w, -1)

        # remat boundary tags: under make_train_step(remat_policy=
        # "save_features"), the stride-4 encoder outputs are the ONLY saved
        # residuals — the 3D stack (whose f32 conv-backward temps dominate
        # train HBM, ARCHITECTURE.md) recomputes from here in the backward.
        # checkpoint_name is a no-op outside jax.checkpoint.
        from jax.ad_checkpoint import checkpoint_name

        matching = checkpoint_name(matching, "encoder_features")

        semantic = self.semantic_feature(
            imgs[:, 1 : 1 + t].reshape(b * t, h_img, w_img, 3), train
        )  # list of 5 maps [B*T, ...]
        semantic = [
            checkpoint_name(s, "encoder_features") for s in semantic
        ]

        cam_intr_s1 = scale_intrinsics(cam_intr, 0.25)
        depth_values = self.depth_candidates(b)

        cost_volumes = self._cost_volumes(
            matching, cam_poses, cam_intr_s1, depth_values, train
        )
        target_poses = cam_poses[:, 1 : 1 + t]

        outputs, new_key, new_value, new_pose = self.decoder(
            cost_volumes,
            semantic,
            target_poses,
            cam_intr_s1,
            depth_values,
            self.depth_min,
            self.depth_interval,
            memory=memory,
            use_est=use_est,
            train=train,
        )
        return outputs, (new_key, new_value, new_pose)
