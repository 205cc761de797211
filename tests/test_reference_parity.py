"""TRUE numerical parity vs the ACTUAL reference implementation.

Unlike tests/test_torch_parity.py (independent comparators rebuilt from the
reference's documented behavior), these tests EXECUTE the reference's own
PyTorch modules from /root/reference — psm_submodule, homo_utils,
hybrid_depth_decoder, model_hybrid (with a torchvision-stub ResNet of
identical architecture/state_dict layout) — load weights exported from a
randomized JAX model via utils/convert.export_state_dict, and assert the two
implementations agree numerically end-to-end:

  * PSM matching features                (networks/psm_submodule.py:93-116)
  * ResNet-50 context features           (hybrid_models/resnet_encoder.py:40-51)
  * plane-sweep warp                     (utils/homo_utils.py:458-504)
  * frustum warp                         (utils/homo_utils.py:240-279)
  * full model, no-EST path              (hybrid_depth_decoder.py:294-417)
  * full model, EST path + training loss (hybrid_depth_decoder.py:138-292,
                                          model_hybrid.py:186-222)
  * 3-window ESTM streaming chain        (eval_hybrid_seq.py:158-193), using
    the strict reference_pose_pairing mode (ESTMemory.push)

A shared misreading of the reference can no longer pass: the reference code
itself is the oracle.
"""

from __future__ import annotations

from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# runs the ACTUAL torch reference as oracle (multi-minute)
pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

from estdepth_tpu.data.synthetic import SyntheticSceneConfig, synthetic_stream
from estdepth_tpu.models import DepthNetHybrid, ESTMemory
from estdepth_tpu.models.psm import PSMFeatureNet
from estdepth_tpu.models.resnet import ResNetEncoder
from estdepth_tpu.ops.geometry import camera_projection, scale_intrinsics
from estdepth_tpu.ops.warp import frustum_warp, plane_sweep_warp
from estdepth_tpu.train.loss import multi_scale_loss
from estdepth_tpu.utils.reference_runner import (
    build_reference_model,
    import_reference,
)

# Small-but-valid shapes: PSM's SPP needs >= 128x128 input (32-pool at 1/4
# res, psm_submodule.py:56-70); the decoder U-Net needs H, W % 32 == 0; and
# ndepths must be >= 63 because the reference's pixel2cam carries a dead
# debug indexing line `depth[:, 0, 62, :]` (homo_utils.py:56) that crashes
# the EST warp for smaller plane counts — so we test at the flagship 64.
H, W, V = 128, 160, 5
NDEPTHS = 64
DEPTH_MIN, DEPTH_MAX = 0.01, 10.0
DEPTH_INTERVAL = (DEPTH_MAX - DEPTH_MIN) / (NDEPTHS - 1)
N_FRAMES = 7

torch.set_grad_enabled(False)


def _randomize(variables, seed: int = 0):
    """De-degenerate every normalization leaf while keeping activations O(1).

    Plain init would hide bugs: zero-init BN scales (residual branches) and
    identity BN stats make several parameter groups invisible to the output.
    Conv kernels keep their (already random, variance-calibrated) init;
    scales/stats get tight random spreads so the multiplicative walk through
    ~50 BN layers stays bounded and no nonlinearity saturates (saturation
    would make parity trivially true).
    """
    rng = np.random.default_rng(seed)

    def perturb(path, leaf):
        a = np.asarray(leaf)
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "scale" and not a.any():
            # zero-γ residual scales: small but NONZERO, so the residual
            # branch weights influence the output (a zero scale would hide
            # layout bugs) without the 2^depth variance blow-up that full
            # scales cause through 25 residual blocks.
            return rng.uniform(0.05, 0.15, a.shape).astype(np.float32)
        if name in ("scale", "var"):
            return rng.uniform(0.8, 1.2, a.shape).astype(np.float32)
        if name == "mean":
            return rng.normal(0.0, 0.05, a.shape).astype(np.float32)
        if name == "bias":
            return rng.normal(0.0, 0.02, a.shape).astype(np.float32)
        return a  # conv kernels: calibrated random init

    return jax.tree_util.tree_map_with_path(perturb, variables)


def _to_torch_imgs(imgs: np.ndarray) -> torch.Tensor:
    """[B, V, H, W, 3] -> [B, V, 3, H, W]."""
    return torch.from_numpy(imgs).permute(0, 1, 4, 2, 3).contiguous()


def _ref_sample(frames, lo: int, hi: int):
    """torch sample dict for frames[lo:hi] (dmaps/dmasks for every view)."""
    dmaps = np.stack([f["dmap"] for f in frames[lo:hi]])[None, :, None]
    dmasks = np.stack([f["dmask"] for f in frames[lo:hi]])[None, :, None]
    return {
        "dmaps": torch.from_numpy(dmaps.astype(np.float32)),
        "dmasks": torch.from_numpy(dmasks.astype(np.bool_)),
    }


@pytest.fixture(scope="module")
def ctx():
    frames = list(
        synthetic_stream(
            SyntheticSceneConfig(height=H, width=W), n_frames=N_FRAMES,
            depth_min=DEPTH_MIN, depth_max=DEPTH_MAX,
        )
    )
    imgs = np.stack([f["img"] for f in frames[:V]])[None].astype(np.float32)
    poses_all = np.stack([f["cam_pose"] for f in frames]).astype(np.float32)
    poses = poses_all[None, :V]
    intr = frames[0]["cam_intr"][None].astype(np.float32)

    model = DepthNetHybrid(
        ndepths=NDEPTHS, depth_min=DEPTH_MIN, depth_max=DEPTH_MAX,
        resnet=50, est_transformer=True,
    )
    variables = jax.jit(
        lambda r, i, p, k: model.init(r, i, p, k, train=False)
    )(jax.random.key(0), jnp.asarray(imgs), jnp.asarray(poses),
      jnp.asarray(intr))
    variables = _randomize(jax.device_get(variables))

    ref_model = build_reference_model(
        variables, ndepths=NDEPTHS, depth_min=DEPTH_MIN,
        depth_max=DEPTH_MAX, resnet=50, est_transformer=True,
    )
    return SimpleNamespace(
        frames=frames, imgs=imgs, poses=poses, poses_all=poses_all,
        intr=intr, model=model, variables=variables, ref_model=ref_model,
        ref=import_reference(),
    )


def _sub_vars(variables, name):
    return {
        "params": variables["params"][name],
        "batch_stats": variables["batch_stats"][name],
    }


def test_psm_features_match_reference(ctx):
    """Our PSMFeatureNet vs the reference's psm_feature_extraction
    (networks/psm_submodule.py:93-116) with identical weights."""
    x = (2.0 * (ctx.imgs[0, :2] / 255.0) - 1.0).astype(np.float32)
    ours = PSMFeatureNet().apply(
        _sub_vars(ctx.variables, "matching_feature"), jnp.asarray(x),
        False,
    )
    xt = torch.from_numpy(x).permute(0, 3, 1, 2).contiguous()
    want = ctx.ref_model.matchingFeature(xt).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), want, rtol=1e-3, atol=2e-4)


def test_resnet_features_match_reference(ctx):
    """Our ResNetEncoder vs the reference's ResnetEncoder forward
    (hybrid_models/resnet_encoder.py:40-51) over the torchvision-layout
    ResNet-50 carrying the same exported weights."""
    x = (2.0 * (ctx.imgs[0, 1:3] / 255.0) - 1.0).astype(np.float32)
    ours = ResNetEncoder(50).apply(
        _sub_vars(ctx.variables, "semantic_feature"), jnp.asarray(x), False,
    )
    xt = torch.from_numpy(x).permute(0, 3, 1, 2).contiguous()
    want = ctx.ref_model.semanticFeature(xt)
    assert len(ours) == len(want) == 5
    for i, (a, b) in enumerate(zip(ours, want)):
        np.testing.assert_allclose(
            np.asarray(a), b.permute(0, 2, 3, 1).numpy(),
            rtol=1e-3, atol=2e-4, err_msg=f"feature map {i}",
        )


def test_plane_sweep_warp_matches_reference(ctx, rng):
    """ops/warp.plane_sweep_warp vs the reference homo_warping
    (utils/homo_utils.py:458-504), actual code."""
    h, w, c = H // 4, W // 4, 8
    feat = rng.normal(size=(1, h, w, c)).astype(np.float32)
    intr_s1 = np.asarray(scale_intrinsics(jnp.asarray(ctx.intr), 0.25))
    src_proj = camera_projection(
        jnp.asarray(intr_s1), jnp.asarray(ctx.poses[:, 0])
    )
    ref_proj = camera_projection(
        jnp.asarray(intr_s1), jnp.asarray(ctx.poses[:, 1])
    )
    dv = (
        np.arange(NDEPTHS, dtype=np.float32) * DEPTH_INTERVAL + DEPTH_MIN
    )[None]

    ours = plane_sweep_warp(
        jnp.asarray(feat), src_proj, ref_proj, jnp.asarray(dv)
    )  # [B, D, h, w, C]

    want = ctx.ref.homo_utils.homo_warping(
        torch.from_numpy(feat).permute(0, 3, 1, 2).contiguous(),
        torch.from_numpy(np.asarray(src_proj)),
        torch.from_numpy(np.asarray(ref_proj)),
        torch.from_numpy(dv[:, :, None, None]),
    )  # [B, C, D, h, w]
    want = want.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), want, rtol=1e-4, atol=1e-4)


def test_frustum_warp_matches_reference(ctx, rng):
    """ops/warp.frustum_warp vs the reference warp_volume
    (utils/homo_utils.py:240-279), actual code, decoder calling convention
    (hybrid_depth_decoder.py:235-243)."""
    h, w, c = H // 4, W // 4, 6
    vol = rng.normal(size=(1, NDEPTHS, h, w, c)).astype(np.float32)
    intr_s1 = np.asarray(scale_intrinsics(jnp.asarray(ctx.intr), 0.25))
    rel = ctx.poses[0, 0] @ np.linalg.inv(ctx.poses[0, 2])  # src @ inv(tgt)
    dv = (
        np.arange(NDEPTHS, dtype=np.float32) * DEPTH_INTERVAL + DEPTH_MIN
    )[None]

    ours = frustum_warp(
        jnp.asarray(vol), jnp.asarray(rel[None]), jnp.asarray(intr_s1),
        jnp.asarray(dv), DEPTH_MIN, DEPTH_INTERVAL,
    )

    hu = ctx.ref.homo_utils
    pixel_grid = (
        hu.set_id_grid(h, w).view(1, 3, 1, h * w).repeat(1, 1, NDEPTHS, 1)
    )
    dv_lowres = torch.from_numpy(dv[:, :, None, None]).repeat(1, 1, h, w)
    want = hu.warp_volume(
        torch.from_numpy(vol).permute(0, 4, 1, 2, 3).contiguous(),
        dv_lowres.view(1, 1, NDEPTHS, h * w),
        torch.from_numpy(rel[None].astype(np.float32)),
        torch.from_numpy(intr_s1),
        pixel_grid, DEPTH_MIN, DEPTH_INTERVAL,
    )  # [B, C, D, H, W]
    want = want.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), want, rtol=1e-4, atol=1e-4)

    # border-padding mode (homo_utils.py:271-275 + _set_vol_border)
    ours_b = frustum_warp(
        jnp.asarray(vol), jnp.asarray(rel[None]), jnp.asarray(intr_s1),
        jnp.asarray(dv), DEPTH_MIN, DEPTH_INTERVAL,
        padding_mode="border", padding_value=0.5,
    )
    want_b = hu.warp_volume(
        torch.from_numpy(vol).permute(0, 4, 1, 2, 3).contiguous(),
        dv_lowres.view(1, 1, NDEPTHS, h * w),
        torch.from_numpy(rel[None].astype(np.float32)),
        torch.from_numpy(intr_s1),
        pixel_grid, DEPTH_MIN, DEPTH_INTERVAL,
        padding_mode="border", padding_value=0.5,
    ).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(
        np.asarray(ours_b), want_b, rtol=1e-4, atol=1e-4
    )


def _run_ours(ctx, use_est: bool, memory=None):
    outputs, state = ctx.model.apply(
        ctx.variables, jnp.asarray(ctx.imgs), jnp.asarray(ctx.poses),
        jnp.asarray(ctx.intr), memory=memory, use_est=use_est, train=False,
    )
    return jax.device_get(outputs), state


def _compare_outputs(outputs, ref_outputs, num, atol, prob_atol):
    depth = outputs["depth"]  # [B, T, 4, H, W]
    for i in range(num):
        for s in range(4):
            want = ref_outputs[("depth", i, s)][:, 0].numpy()
            np.testing.assert_allclose(
                depth[:, i, s], want, atol=atol, rtol=1e-3,
                err_msg=f"depth target {i} scale {s}",
            )
        np.testing.assert_allclose(
            outputs["init_prob"][:, i],
            ref_outputs[("init_prob", i)][:, 0].numpy(),
            atol=prob_atol, rtol=1e-3, err_msg=f"init_prob target {i}",
        )
        np.testing.assert_allclose(
            outputs["fused_prob"][:, i],
            ref_outputs[("fused_prob", i)][:, 0].numpy(),
            atol=prob_atol, rtol=1e-3, err_msg=f"fused_prob target {i}",
        )


def test_full_forward_no_est_matches_reference(ctx):
    """Full DepthNetHybrid forward, no-EST path (forward_notransformer,
    hybrid_depth_decoder.py:294-417) vs mode='val' with no memory."""
    outputs, _ = _run_ours(ctx, use_est=False)
    ref_outputs, _, _ = ctx.ref_model(
        _to_torch_imgs(ctx.imgs), torch.from_numpy(ctx.poses),
        torch.from_numpy(ctx.intr), _ref_sample(ctx.frames, 0, V),
        None, None, mode="val",
    )
    _compare_outputs(outputs, ref_outputs, V - 2, atol=5e-3, prob_atol=1e-3)


def test_full_forward_est_and_loss_match_reference(ctx):
    """Full forward through the EST path (forward_transformer,
    hybrid_depth_decoder.py:138-292; triggered by mode='train' without
    memory, :423) plus the training loss (model_hybrid.py:186-222).

    The reference model stays in eval() so BatchNorm uses running stats on
    both sides; mode='train' only selects the fused path + loss."""
    outputs, _ = _run_ours(ctx, use_est=True)
    ref_outputs, ref_losses = ctx.ref_model(
        _to_torch_imgs(ctx.imgs), torch.from_numpy(ctx.poses),
        torch.from_numpy(ctx.intr), _ref_sample(ctx.frames, 0, V),
        None, None, mode="train",
    )
    _compare_outputs(outputs, ref_outputs, V - 2, atol=5e-3, prob_atol=1e-3)

    gt = np.stack([f["dmap"] for f in ctx.frames[1 : V - 1]])[None]
    mask = np.stack([f["dmask"] for f in ctx.frames[1 : V - 1]])[None]
    total, scalars = multi_scale_loss(
        jnp.asarray(outputs["depth"]), jnp.asarray(gt.astype(np.float32)),
        jnp.asarray(mask), DEPTH_MIN, DEPTH_MAX,
    )
    for s in range(4):
        np.testing.assert_allclose(
            float(scalars[f"loss_{s}"]),
            float(ref_losses[f"loss_{s}"]), rtol=2e-3, atol=2e-3,
            err_msg=f"loss scale {s}",
        )
    np.testing.assert_allclose(
        float(total), float(ref_losses["loss"]), rtol=2e-3, atol=2e-3,
    )


def test_estm_chain_matches_reference(ctx):
    """3-window ESTM streaming chain vs the reference driver protocol
    (eval_hybrid_seq.py:158-193): sliding 3-frame window, FIFO memory of 2,
    first window no-EST, later windows fused; memory poses follow the
    reference's stale pairing (reference_pose_pairing=True)."""
    lwindow, memory_size = 3, 2
    frames = ctx.frames

    # --- reference: in-process replica of the eval_hybrid_seq deque flow
    ref_depths = []
    deq_costs, deq_poses = [], []
    window = []
    for idx in range(N_FRAMES):
        window.append(idx)
        if len(window) < lwindow:
            continue
        lo, hi = window[0], window[-1] + 1
        imgs = np.stack([frames[i]["img"] for i in window])[None].astype(
            np.float32
        )
        poses = ctx.poses_all[None, window[0] : window[-1] + 1]
        if deq_poses:
            pre_costs = {
                "keys": [d["keys"][0] for d in deq_costs],
                "values": [d["values"][0] for d in deq_costs],
            }
            pre_poses = [p[0] for p in deq_poses]
        else:
            pre_costs, pre_poses = None, None
        outputs, cur_costs, cur_poses = ctx.ref_model(
            _to_torch_imgs(imgs), torch.from_numpy(poses),
            torch.from_numpy(ctx.intr), _ref_sample(frames, lo, hi),
            pre_costs, pre_poses, mode="val",
        )
        deq_costs.append(cur_costs)
        deq_poses.append(cur_poses)
        window.pop(0)
        if len(deq_costs) > memory_size:
            deq_costs.pop(0)
            deq_poses.pop(0)
        ref_depths.append(
            np.stack(
                [outputs[("depth", 0, s)][:, 0].numpy() for s in range(4)],
                axis=1,
            )
        )

    # --- ours: the streaming step with strict reference pose pairing
    from estdepth_tpu.eval.estm import ESTMRunner

    runner = ESTMRunner(
        ctx.model, ctx.variables, H, W, lwindow=lwindow,
        memory_size=memory_size, reference_pose_pairing=True,
    )
    our_depths = []
    for idx in range(N_FRAMES):
        d = runner.push_frame(
            frames[idx]["img"], frames[idx]["cam_pose"],
            frames[idx]["cam_intr"],
        )
        if d is not None:
            our_depths.append(np.asarray(d))

    assert len(our_depths) == len(ref_depths) == N_FRAMES - lwindow + 1
    for wi, (got, want) in enumerate(zip(our_depths, ref_depths)):
        np.testing.assert_allclose(
            got, want, atol=8e-3, rtol=1e-3, err_msg=f"window {wi}",
        )


def test_joint_chain_matches_reference(ctx):
    """Joint-mode cross-window chain vs the actual reference protocol
    (eval_hybrid.py:229-243): consecutive windows advance by T = V - 2
    frames, the last target's detached key/value threads to the next
    window as pre_costs (a 1-entry memory), first window runs without EST
    (flag = pre_costs is not None, hybrid_depth_decoder.py:423), and the
    stored pose follows the reference's stale pairing. Drives OUR side
    through tools/eval_joint.py's JointRunner(reference_pose_pairing=True)
    — the shipped driver, not a test-only replica."""
    from tools.eval_joint import JointRunner

    v = 4  # windows of 4 frames (2 targets): 3 chained windows fit N_FRAMES
    t = v - 2
    # frames 0-3, 2-5, 3-6: the third window advances by 1 instead of T so
    # all three fit the 7-frame fixture — the pre_costs threading (what
    # this test pins, incl. the stale-pose induction to window 3) is
    # independent of the stride
    starts = [0, t, t + 1]
    frames = ctx.frames

    # --- reference: the real model with threaded pre_costs/pre_cam_poses
    ref_depths = []
    pre_costs, pre_poses = None, None
    for lo in starts:
        hi = lo + v
        imgs = np.stack([f["img"] for f in frames[lo:hi]])[None].astype(
            np.float32
        )
        poses = ctx.poses_all[None, lo:hi]
        outputs, pre_costs, pre_poses = ctx.ref_model(
            _to_torch_imgs(imgs), torch.from_numpy(poses),
            torch.from_numpy(ctx.intr), _ref_sample(frames, lo, hi),
            pre_costs, pre_poses, mode="val",
        )
        ref_depths.append(
            np.stack(
                [
                    np.stack(
                        [outputs[("depth", i, s)][:, 0].numpy()
                         for s in range(4)], axis=1,
                    )
                    for i in range(t)
                ],
                axis=1,
            )[:, :, :]
        )  # [B, T, 4, H, W]

    # --- ours: the shipped JointRunner in strict-parity mode
    runner = JointRunner(
        ctx.model, ctx.variables, est_on=True, reference_pose_pairing=True,
    )
    import jax.numpy as jnp

    our_depths = []
    for lo in starts:
        hi = lo + v
        imgs = np.stack([f["img"] for f in frames[lo:hi]])[None].astype(
            np.float32
        )
        poses = ctx.poses_all[None, lo:hi]
        depth, _ = runner.run_window(
            jnp.asarray(imgs), jnp.asarray(poses), jnp.asarray(ctx.intr)
        )
        our_depths.append(np.asarray(depth))

    for wi, (got, want) in enumerate(zip(our_depths, ref_depths)):
        np.testing.assert_allclose(
            got, want, atol=8e-3, rtol=1e-3, err_msg=f"window {wi}",
        )


def test_gradients_match_reference(ctx):
    """d(loss)/d(params) of the full EST training path vs the actual
    reference backward (model_hybrid.py:186-222 loss through
    hybrid_depth_decoder.py:138-292), eval-mode BN both sides so the
    comparison is deterministic. Validates warps, attention, GRU, decoder,
    and the sequential in-place fusion (values of targets j < i feed
    target i, so cross-target gradient flow must match too)."""
    import jax.numpy as jnp

    from estdepth_tpu.utils.convert import export_state_dict

    gt = np.stack([f["dmap"] for f in ctx.frames[1 : V - 1]])[None]
    mask = np.stack([f["dmask"] for f in ctx.frames[1 : V - 1]])[None]

    def loss_fn(params):
        outputs, _ = ctx.model.apply(
            {"params": params, "batch_stats": ctx.variables["batch_stats"]},
            jnp.asarray(ctx.imgs), jnp.asarray(ctx.poses),
            jnp.asarray(ctx.intr), use_est=True, train=False,
        )
        total, _ = multi_scale_loss(
            outputs["depth"], jnp.asarray(gt.astype(np.float32)),
            jnp.asarray(mask), DEPTH_MIN, DEPTH_MAX,
        )
        return total

    grads = jax.device_get(jax.grad(loss_fn)(ctx.variables["params"]))
    # reuse the name/layout mapping to get torch-style grad names; the BN
    # running_mean/var entries it emits are just placeholders to skip
    grad_sd = export_state_dict(
        {"params": grads, "batch_stats": ctx.variables["batch_stats"]}
    )

    with torch.enable_grad():
        ref_model = ctx.ref_model
        for p in ref_model.parameters():
            p.requires_grad_(True)
            p.grad = None
        _, ref_losses = ref_model(
            _to_torch_imgs(ctx.imgs), torch.from_numpy(ctx.poses),
            torch.from_numpy(ctx.intr), _ref_sample(ctx.frames, 0, V),
            None, None, mode="train",
        )
        ref_losses["loss"].backward()

    named = dict(ref_model.named_parameters())
    pairs = []
    for name, g in grad_sd.items():
        if name.endswith(("running_mean", "running_var")):
            continue
        p = named.get(name)
        if p is None or p.grad is None:
            continue
        pairs.append((name, np.asarray(g, np.float32), p.grad.numpy()))
    for p in ref_model.parameters():
        p.requires_grad_(False)
        p.grad = None
    assert len(pairs) > 400, len(pairs)  # every conv/bn/head participates

    # Tolerance must be scale-aware ACROSS tensors: some true gradients are
    # exactly zero by symmetry (e.g. the stereo-head output bias adds a
    # uniform shift to every depth-plane logit, to which the softargmin is
    # invariant), leaving only fp noise on both sides — a per-tensor
    # relative metric explodes there. Compare against the tensor's own
    # magnitude with an absolute floor from the global gradient scale.
    global_scale = max(float(np.abs(w).max()) for _, _, w in pairs)
    report = []
    for name, got, want in pairs:
        wmax = float(np.abs(want).max())
        diff = float(np.abs(got - want).max())
        # absolute sanity vs the global gradient scale
        assert diff < 2e-3 * global_scale, (
            f"{name}: |Δ|={diff:.3e} vs global={global_scale:.3e} "
            f"(|want|max={wmax:.3e}, |got|max={float(np.abs(got).max()):.3e})"
        )
        # tight relative check on well-conditioned gradients
        if wmax >= 1e-2 * global_scale:
            report.append((diff / wmax, name, wmax, diff))
    report.sort(reverse=True)
    assert report and report[0][0] < 2e-3, (
        f"worst well-conditioned grad: {report[0][1]} rel={report[0][0]:.2e} "
        f"(|want|max={report[0][2]:.3e}, |Δ|={report[0][3]:.3e})"
    )


# reference-side results of the trajectory test, shared across its warp
# parametrizations (the torch loop is warp-independent — see the comment
# at its computation site)
_TRAJECTORY_REF_CACHE: dict = {}


@pytest.mark.parametrize("warp", ["exact", "gated_f32", "shipped_fast"])
def test_training_trajectory_matches_reference(ctx, warp):
    """THREE real training steps vs the actual reference training recipe:
    train-mode (batch-stats) BN with momentum 0.1 running updates, torch
    Adam(4e-5, wd 4e-4) with L2-in-gradient semantics, clip_grad_norm_ 10,
    and the real WarmupMultiStepLR (utils/utils.py:208-252) stepped per
    iteration (train_hybrid.py:79-109,155-186) — from identical exported
    init on identical distinct batches. Catches optimizer-trajectory and
    BN-momentum drift that one-step eval-mode gradient parity cannot.

    Asserts, per step: the train-mode loss; after 3 steps: every BN
    running mean/var (incl. the unbiased n/(n-1) running-var correction —
    TorchBatchNorm) and the parameter updates at norm level. Per-element
    update comparison is meaningless under Adam: the first-step update is
    ~sign(g)*lr, so elements whose true gradient is at fp-noise scale flip
    sign freely between implementations; tensor-norm agreement is the
    sound assertion (fp-noise sign flips on a vanishing fraction of
    elements perturb the norm negligibly).

    Ours runs the SHIPPED step: make_train_step (shard_map over a 1-device
    mesh, sync-BN axis, staged clip, optax chain), with the
    reference-faithful sequential_cost_bn mode so the cost-volume pre
    stack sees per-(target,neighbor) batch statistics like the
    reference's sequential calls (model_hybrid.py:79-95).

    warp="gated_f32" re-runs the SAME strict gate with the parity-gated
    fast warp family (Pallas lane-gather + slope-carry exact-z, f32
    tap/slope transport; interpreted kernels on CPU) — proving the gated
    warp TRAINS to the reference trajectory too (its custom VJP is the
    exact-z cotangent scatter), not just evaluates at parity. This is
    the measured basis for recommending the gated warp for fast
    TRAINING, not only eval.

    warp="shipped_fast" adds the packed bf16 tap/slope transport (the
    EVAL-tool default). Packing quantizes the (A, s) pair to RNE-bf16 in
    the forward and its VJP backpropagates through the quantized values,
    so gradients into the matching encoder carry ~2.6e-4 relative
    op-level noise that Adam integrates into few-percent update-norm
    deviations concentrated in matchingFeature.* (measured median 0.071,
    p90 0.131 vs the strict 0.03/0.10 gate; losses and BN stats still
    match at the same tolerances). The packed transport is therefore an
    EVAL-side bandwidth optimization only — training recipes use the f32
    transport — and this variant pins the LOOSER stability envelope so a
    regression (e.g. a broken packed VJP) still fails loudly.
    """
    from estdepth_tpu.parallel.mesh import create_mesh, shard_batch
    from estdepth_tpu.train.schedule import warmup_multistep_schedule
    from estdepth_tpu.train.trainer import (
        TrainState, make_optimizer, make_train_step,
    )
    from estdepth_tpu.utils.convert import export_state_dict

    lr, wd, clip = 4e-5, 4e-4, 10.0
    n_steps = 3
    # 2 targets: the smallest window the reference can train with EST on
    # (a 1-target window has no in-window neighbors and its EST loop
    # crashes on an empty correlation stack,
    # transformer/epipolar_transformer.py:61-68) — and 2 targets also
    # exercise the sequential-fusion chain under train-mode BN.
    v = 4
    windows = [(0, 4), (2, 6), (3, 7)]  # distinct batches per step

    def np_batch(lo, hi):
        imgs = np.stack(
            [ctx.frames[i]["img"] for i in range(lo, hi)]
        )[None].astype(np.float32)
        poses = ctx.poses_all[None, lo:hi]
        dmaps = np.stack(
            [ctx.frames[i]["dmap"] for i in range(lo + 1, hi - 1)]
        )[None].astype(np.float32)
        dmasks = np.stack(
            [ctx.frames[i]["dmask"] for i in range(lo + 1, hi - 1)]
        )[None]
        return imgs, poses, dmaps, dmasks

    # ---- reference: the real torch training loop --------------------------
    # The reference side depends only on ctx and the fixed windows — it is
    # identical across the warp parametrizations, so compute it ONCE per
    # module and reuse (the 3-step ResNet-50 torch loop is the dominant
    # cost of this already-slowest slow-tier test).
    cache = _TRAJECTORY_REF_CACHE
    if cache.get("ctx_id") != id(ctx):
        ref_model = build_reference_model(
            ctx.variables, ndepths=NDEPTHS, depth_min=DEPTH_MIN,
            depth_max=DEPTH_MAX, resnet=50, est_transformer=True,
        )
        ref_model.train()
        ref_losses = []
        with torch.enable_grad():
            for p in ref_model.parameters():
                p.requires_grad_(True)
            opt = torch.optim.Adam(
                ref_model.parameters(), lr=lr, betas=(0.9, 0.999),
                weight_decay=wd,
            )
            sched = ctx.ref.utils.WarmupMultiStepLR(
                opt, milestones=[10**6], gamma=0.5, warmup_factor=1.0 / 3,
                warmup_iters=500,
            )
            for lo, hi in windows:
                imgs, poses, dmaps, dmasks = np_batch(lo, hi)
                opt.zero_grad()
                _, losses = ref_model(
                    _to_torch_imgs(imgs), torch.from_numpy(poses),
                    torch.from_numpy(ctx.intr),
                    _ref_sample(ctx.frames, lo, hi),
                    None, None, mode="train",
                )
                losses["loss"].backward()
                torch.nn.utils.clip_grad_norm_(
                    ref_model.parameters(), clip, norm_type=2
                )
                opt.step()
                sched.step()
                ref_losses.append(float(losses["loss"]))
            for p in ref_model.parameters():
                p.requires_grad_(False)
        ref_model.eval()
        cache.clear()
        cache.update(
            ctx_id=id(ctx),
            ref_losses=ref_losses,
            ref_sd={
                k: v.detach().numpy().copy()
                for k, v in ref_model.state_dict().items()
            },
            named_ref={
                k: v.detach().numpy().copy()
                for k, v in ref_model.named_parameters()
            },
        )
        del ref_model
    ref_losses = cache["ref_losses"]

    # ---- ours: the shipped SPMD train step on a 1-device mesh -------------
    fast = warp != "exact"
    model = DepthNetHybrid(
        ndepths=NDEPTHS, depth_min=DEPTH_MIN, depth_max=DEPTH_MAX,
        resnet=50, est_transformer=True, bn_axis_name="data",
        sequential_cost_bn=True,
        pallas_warp=fast, exact_z_warp=fast,
        packed_exact_z=warp == "shipped_fast",
    )
    mesh = create_mesh(1)
    tx = make_optimizer(
        warmup_multistep_schedule(lr, steps_per_epoch=10**6,
                                  warmup_steps=500),
        weight_decay=wd,
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=jax.tree.map(jnp.asarray, ctx.variables["params"]),
        batch_stats=jax.tree.map(
            jnp.asarray, ctx.variables["batch_stats"]
        ),
        opt_state=tx.init(ctx.variables["params"]),
    )
    step_fn = make_train_step(model, tx, mesh, DEPTH_MIN, DEPTH_MAX)
    our_losses = []
    for lo, hi in windows:
        imgs, poses, dmaps, dmasks = np_batch(lo, hi)
        batch = shard_batch(
            {
                "imgs": imgs, "cam_poses": poses, "cam_intr": ctx.intr,
                "dmaps": dmaps, "dmasks": dmasks,
            },
            mesh,
        )
        state, scalars = step_fn(state, batch, jnp.float32(clip))
        our_losses.append(float(scalars["loss"]))

    # ---- per-step train-mode losses ---------------------------------------
    np.testing.assert_allclose(
        our_losses, ref_losses, rtol=3e-3, atol=3e-3,
        err_msg="per-step train-mode loss trajectory",
    )

    # ---- BN running statistics after 3 momentum-0.1 updates ---------------
    final_sd = export_state_dict(
        {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
        }
    )
    ref_sd = cache["ref_sd"]
    n_stats = 0
    for name, got in final_sd.items():
        if not name.endswith(("running_mean", "running_var")):
            continue
        want = ref_sd[name]
        np.testing.assert_allclose(
            np.asarray(got, np.float32), want, rtol=5e-3, atol=5e-4,
            err_msg=f"BN running stat {name}",
        )
        n_stats += 1
    assert n_stats > 100, n_stats

    # ---- parameter updates at tensor-norm level ---------------------------
    init_sd = export_state_dict(ctx.variables)
    named_ref = cache["named_ref"]
    rels = []
    for name, p1 in final_sd.items():
        if name.endswith(("running_mean", "running_var")):
            continue
        if name not in named_ref:
            continue
        if name.endswith("stereo_head0.1.bias"):
            # This bias adds the same constant to every depth logit, and
            # init_logits feed ONLY the depth softmax (decoder.py:364,
            # reference hybrid_depth_decoder.py:200-202), which is
            # shift-invariant — its true gradient is exactly zero. Both
            # implementations integrate pure float-cancellation noise
            # through Adam (sign-random ~lr-sized steps), so its update
            # direction is meaningless. (stereo_head1's bias DOES have a
            # real gradient via the relu(logits) refinement input and is
            # checked.)
            continue
        d_ours = np.asarray(p1, np.float32) - np.asarray(
            init_sd[name], np.float32
        )
        d_ref = named_ref[name] - np.asarray(init_sd[name], np.float32)
        nref = float(np.linalg.norm(d_ref))
        if nref < 1e-12:  # frozen / untouched tensors
            assert float(np.linalg.norm(d_ours)) < 1e-12, name
            continue
        rels.append((float(np.linalg.norm(d_ours - d_ref)) / nref, name))
    assert len(rels) > 400, len(rels)
    # Distributional assertion: Adam normalizes every element's step to
    # ~lr, so on tensors whose TRUE gradient is cancellation-dominated
    # (deep-encoder BN scales) both implementations integrate fp noise
    # into sign-random updates and per-tensor agreement is not meaningful.
    # A SYSTEMATIC mismatch (wrong BN momentum / Adam eps / weight-decay
    # placement / lr schedule) shifts the whole distribution, which is
    # what the quantile gates catch; the tail allowance covers the
    # handful of ill-conditioned tensors.
    rels.sort(reverse=True)
    qs = np.percentile([r for r, _ in rels], [50, 90, 100])
    frac_bad = np.mean([r >= 0.15 for r, _ in rels])
    if warp == "shipped_fast":
        # packed bf16 transport: looser stability envelope (docstring) —
        # measured median 0.071 / p90 0.131 / frac>=0.15 0.069
        assert qs[0] < 0.12 and qs[1] < 0.25 and frac_bad < 0.15, (
            f"packed-transport update-norm envelope: median={qs[0]:.4f} "
            f"p90={qs[1]:.4f} max={qs[2]:.4f} frac>=0.15: {frac_bad:.3f}; "
            f"worst: {rels[:5]}"
        )
        return
    assert qs[0] < 0.03 and qs[1] < 0.10 and frac_bad < 0.05, (
        f"update-norm mismatch distribution: median={qs[0]:.4f} "
        f"p90={qs[1]:.4f} max={qs[2]:.4f} frac>=0.15: {frac_bad:.3f}; "
        f"worst: {rels[:5]}"
    )
