"""Pallas lane-gather warp kernels (ops/pallas/plane_warp.py).

On CPU these run through the Pallas interpreter (plane_warp._interpret), so
the tests validate the kernel math itself; the Mosaic lowering is exercised
on the real chip by bench.py / tools/profile_scan.py.

Reference anchors: frustum warp = warp_volume (homo_utils.py:240-279) via
the plane-mix reformulation; plane-sweep = homo_warping (:458-504).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from estdepth_tpu.ops import geometry
from estdepth_tpu.ops.warp import frustum_warp, plane_sweep_warp


def _pose(tx=0.0, ty=0.0, tz=0.0, yaw=0.0, pitch=0.0):
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    m = np.eye(4)
    m[:3, :3] = ry @ rx
    m[:3, 3] = [tx, ty, tz]
    return jnp.asarray(m[None].astype(np.float32))


@pytest.fixture
def setup():
    rng = np.random.default_rng(7)
    b, d, h, w, c = 1, 16, 16, 20, 8
    vol = jnp.asarray(rng.normal(size=(b, d, h, w, c)).astype(np.float32))
    intr = jnp.asarray(
        [[[18.0, 0, (w - 1) / 2], [0, 18.0, (h - 1) / 2], [0, 0, 1]]],
        jnp.float32,
    )
    dvals = jnp.asarray(np.linspace(0.5, 5.0, d)[None].astype(np.float32))
    dint = float(dvals[0, 1] - dvals[0, 0])
    return rng, vol, intr, dvals, 0.5, dint


POSES = [
    _pose(),
    _pose(tx=0.05),
    _pose(ty=-0.04, tz=0.08),
    _pose(tx=0.04, ty=-0.03, tz=0.06, yaw=0.015, pitch=-0.01),
    _pose(tz=0.2, yaw=0.03),
]


def test_frustum_pallas_matches_planemix(setup):
    """The kernel is the plane-mix algorithm; the only extra deviation is
    the two-pass x evaluation at row crossings — sub-pixel for realistic
    motion, so the volumes must agree tightly."""
    _, vol, intr, dvals, dmin, dint = setup
    for rel in POSES:
        pm = frustum_warp(vol, rel, intr, dvals, dmin, dint,
                          mode="plane_mix")
        pp = frustum_warp(vol, rel, intr, dvals, dmin, dint,
                          mode="plane_mix_pallas")
        np.testing.assert_allclose(
            np.asarray(pp), np.asarray(pm), atol=2e-2, rtol=0.0
        )


def test_frustum_pallas_exact_for_inplane_motion(setup):
    """Pure in-plane translation: the z-mix and the two-pass x are both
    exact (zi constant per plane, source lines vertical), so the kernel
    must equal the exact trilinear warp to float tolerance."""
    _, vol, intr, dvals, dmin, dint = setup
    for rel in [_pose(), _pose(tx=0.07), _pose(tx=-0.03, ty=0.06)]:
        ex = frustum_warp(vol, rel, intr, dvals, dmin, dint)
        pp = frustum_warp(vol, rel, intr, dvals, dmin, dint,
                          mode="plane_mix_pallas")
        np.testing.assert_allclose(
            np.asarray(pp), np.asarray(ex), atol=2e-3, rtol=1e-3
        )


def test_frustum_pallas_oob_zeroed(setup):
    """A warp that throws every sample out of frustum returns all zeros
    (the reference's zeros padding, homo_utils.py:192-198)."""
    _, vol, intr, dvals, dmin, dint = setup
    rel = _pose(tx=1e3)
    pp = frustum_warp(vol, rel, intr, dvals, dmin, dint,
                      mode="plane_mix_pallas")
    assert float(jnp.max(jnp.abs(pp))) == 0.0


def test_plane_sweep_pallas_matches_xla(setup):
    """Plane-sweep has no z stage. Pure translations keep target columns
    mapped to vertical source lines, so the two-pass form is exact; with
    rotation the row-crossing x evaluation deviates sub-pixel (same class
    as plane-mix's documented z deviation) — tolerance-pinned."""
    rng, _, intr, dvals, _, _ = setup
    b, h, w, c = 1, 16, 20, 8
    feat = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    ref_proj = geometry.camera_projection(intr, _pose())
    for rel in [_pose(), _pose(tx=0.05), _pose(ty=-0.04, tz=0.08)]:
        src_proj = geometry.camera_projection(intr, rel)
        a = plane_sweep_warp(feat, src_proj, ref_proj, dvals)
        p = plane_sweep_warp(feat, src_proj, ref_proj, dvals,
                             backend="pallas")
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(a), atol=5e-4, rtol=0.0
        )
    for rel in POSES[3:]:  # rotation poses
        src_proj = geometry.camera_projection(intr, rel)
        a = plane_sweep_warp(feat, src_proj, ref_proj, dvals)
        p = plane_sweep_warp(feat, src_proj, ref_proj, dvals,
                             backend="pallas")
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(a), atol=2e-2, rtol=0.0
        )


@pytest.mark.parametrize("dtype", [None, jnp.bfloat16])
def test_model_pallas_warp_end_to_end(dtype):
    """DepthNetHybrid(pallas_warp=True) produces depth maps close to the
    plane-mix model's — the full decoder path (EST memory warps + cost
    volumes) runs through the kernels. The bf16 variant exercises the
    int32-packed kernels (what bench's flagship config runs)."""
    from estdepth_tpu.data.synthetic import (
        SyntheticSceneConfig, synthetic_stream,
    )
    from estdepth_tpu.models import DepthNetHybrid, ESTMemory
    import jax

    h, w, nd = 64, 96, 16
    base = dict(
        ndepths=nd, depth_min=0.5, depth_max=5.0, resnet=18,
        est_transformer=True, dtype=dtype,
    )
    model_pm = DepthNetHybrid(**base, fast_frustum=True)
    model_pl = DepthNetHybrid(**base, pallas_warp=True)

    frames = list(synthetic_stream(
        SyntheticSceneConfig(height=h, width=w), n_frames=3,
    ))
    imgs = jnp.asarray(np.stack([f["img"] for f in frames])[None])
    poses = jnp.asarray(np.stack([f["cam_pose"] for f in frames])[None])
    intr = jnp.asarray(frames[0]["cam_intr"][None])

    variables = jax.jit(
        lambda r: model_pm.init(r, imgs, poses, intr, train=False)
    )(jax.random.key(0))
    mdt = dtype or jnp.float32
    mem = ESTMemory.create(1, 2, nd, h // 4, w // 4, 16, dtype=mdt)
    mem = mem.replace(
        keys=jnp.asarray(
            np.random.default_rng(3).normal(
                size=mem.keys.shape
            ).astype(np.float32) * 0.2
        ).astype(mdt),
        values=jnp.asarray(
            np.random.default_rng(4).normal(
                size=mem.values.shape
            ).astype(np.float32) * 0.2
        ).astype(mdt),
        poses=jnp.tile(poses[:, :1], (1, 2, 1, 1)),
        valid=jnp.ones((1, 2), bool),
    )

    out_pm, _ = model_pm.apply(variables, imgs, poses, intr, memory=mem,
                               use_est=True, train=False)
    out_pl, _ = model_pl.apply(variables, imgs, poses, intr, memory=mem,
                               use_est=True, train=False)
    d_pm = np.asarray(out_pm["depth"][:, 0, 0], np.float32)
    d_pl = np.asarray(out_pl["depth"][:, 0, 0], np.float32)
    # bf16 runs the packed kernels AND quantizes both models' activations;
    # allow the correspondingly looser (still sub-percent-of-range) gap
    mean_tol, max_tol = (1e-2, 0.3) if dtype else (5e-3, 0.2)
    assert np.abs(d_pl - d_pm).mean() < mean_tol
    assert np.abs(d_pl - d_pm).max() < max_tol


def test_packed_lerp_bit_exact():
    """_lerp2 (bf16 pairs packed in int32 lanes, f32 math, RNE repack) is
    BIT-identical to astype(bfloat16) of the f32 lerp — the packed kernels'
    only deviation from the f32 kernels is therefore the bf16 quantization
    of the inter-stage intermediates, nothing else."""
    import jax
    from estdepth_tpu.ops.pallas.plane_warp import _lerp2

    rng = np.random.default_rng(5)
    vals = rng.normal(size=(256, 64, 2)).astype(np.float32) * 3.0
    pair = jnp.asarray(vals).astype(jnp.bfloat16)
    packed = jax.lax.bitcast_convert_type(pair, jnp.int32)
    f = jnp.asarray(rng.uniform(0, 1, size=(256, 64)).astype(np.float32))

    got = jax.lax.bitcast_convert_type(
        _lerp2(packed, packed[::-1], f), jnp.bfloat16
    )
    want = (
        pair.astype(jnp.float32) * (1.0 - f[..., None])
        + pair[::-1].astype(jnp.float32) * f[..., None]
    ).astype(jnp.bfloat16)
    assert np.array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


def test_frustum_pallas_bf16_packed_matches_f32_kernels(setup):
    """A bf16 volume dispatches the int32-packed kernels; vs the f32
    kernels on the SAME (bf16-quantized) volume the only extra error is
    bf16 rounding of the two inter-stage intermediates."""
    _, vol, intr, dvals, dmin, dint = setup
    vol_bf = vol.astype(jnp.bfloat16)
    for rel in POSES:
        pf = frustum_warp(vol_bf.astype(jnp.float32), rel, intr, dvals,
                          dmin, dint, mode="plane_mix_pallas")
        pb = frustum_warp(vol_bf, rel, intr, dvals, dmin, dint,
                          mode="plane_mix_pallas")
        assert pb.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(pb, np.float32), np.asarray(pf), atol=6e-2, rtol=0.0
        )
    # OOB zeroing holds for the packed masks too
    allout = frustum_warp(vol_bf, _pose(tx=1e3), intr, dvals, dmin, dint,
                          mode="plane_mix_pallas")
    assert float(jnp.max(jnp.abs(allout.astype(jnp.float32)))) == 0.0


def test_plane_sweep_pallas_bf16_packed_matches_f32_kernels(setup):
    rng, _, intr, dvals, _, _ = setup
    b, h, w, c = 1, 16, 20, 8
    feat = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    feat_bf = feat.astype(jnp.bfloat16)
    ref_proj = geometry.camera_projection(intr, _pose())
    for rel in [_pose(tx=0.05), POSES[3]]:
        src_proj = geometry.camera_projection(intr, rel)
        pf = plane_sweep_warp(feat_bf.astype(jnp.float32), src_proj,
                              ref_proj, dvals, backend="pallas")
        pb = plane_sweep_warp(feat_bf, src_proj, ref_proj, dvals,
                              backend="pallas")
        assert pb.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(pb, np.float32), np.asarray(pf), atol=4e-2, rtol=0.0
        )


def test_frustum_pallas_bf16_odd_channels_fallback(setup):
    """Odd channel counts can't pair-pack; the f32 kernel path must serve
    them (still returning the volume dtype)."""
    _, vol, intr, dvals, dmin, dint = setup
    vol7 = vol[..., :7].astype(jnp.bfloat16)
    out = frustum_warp(vol7, POSES[1], intr, dvals, dmin, dint,
                       mode="plane_mix_pallas")
    assert out.dtype == jnp.bfloat16 and out.shape == vol7.shape


def test_frustum_pallas_grad_matches_planemix(setup):
    """The custom VJP is DEFINED as the plane-mix path's gradient w.r.t.
    the volume at identical coordinates, so d(loss)/d(volume) must match
    plane_mix's exactly (same cotangent scatter); pose cotangents are
    zero by construction (reference no_grad grid, homo_utils.py:468)."""
    import jax

    _, vol, intr, dvals, dmin, dint = setup
    rel = POSES[3]

    def loss(v, mode):
        out = frustum_warp(v, rel, intr, dvals, dmin, dint, mode=mode)
        return jnp.sum(out * out)

    g_pm = jax.grad(lambda v: loss(v, "plane_mix"))(vol)
    g_pl = jax.grad(lambda v: loss(v, "plane_mix_pallas"))(vol)
    # the cotangent seeds differ slightly (out_pallas vs out_planemix in
    # the squared loss), so allow the corresponding linear deviation
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_pm), atol=5e-2, rtol=1e-3
    )
    g_pose = jax.grad(
        lambda r: loss_pose(vol, r, intr, dvals, dmin, dint)
    )(rel)
    assert float(jnp.max(jnp.abs(g_pose))) == 0.0


def loss_pose(vol, rel, intr, dvals, dmin, dint):
    out = frustum_warp(vol, rel, intr, dvals, dmin, dint,
                       mode="plane_mix_pallas")
    return jnp.sum(out * out)


def test_plane_sweep_pallas_grad_matches_xla(setup):
    """d(loss)/d(src_feat) through the pallas backend equals the XLA
    sampler's gradient (the VJP is literally that sampler's transpose)."""
    import jax

    rng, _, intr, dvals, _, _ = setup
    b, h, w, c = 1, 16, 20, 8
    feat = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    ref_proj = geometry.camera_projection(intr, _pose())
    src_proj = geometry.camera_projection(intr, _pose(tx=0.06, ty=-0.02))

    def loss(f, backend):
        out = plane_sweep_warp(f, src_proj, ref_proj, dvals,
                               backend=backend)
        return jnp.sum(out * out)

    g_x = jax.grad(lambda f: loss(f, "xla"))(feat)
    g_p = jax.grad(lambda f: loss(f, "pallas"))(feat)
    np.testing.assert_allclose(
        np.asarray(g_p), np.asarray(g_x), atol=5e-3, rtol=1e-3
    )


def test_train_step_with_pallas_warp():
    """A full DP train step through pallas_warp=True: the custom VJPs make
    the kernels trainable (loss finite, params move). ndepths == H/4 so the
    z-mix lane gather sees its D == Z square case."""
    import jax
    from estdepth_tpu.data.synthetic import (
        SyntheticSceneConfig, synthetic_window,
    )
    from estdepth_tpu.models import DepthNetHybrid
    from estdepth_tpu.parallel.mesh import (
        create_mesh, replicate, shard_batch,
    )
    from estdepth_tpu.train.schedule import warmup_multistep_schedule
    from estdepth_tpu.train.trainer import (
        create_train_state, make_optimizer, make_train_step,
    )

    cfg = SyntheticSceneConfig(height=64, width=96, focal=80.0)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_window(
            cfg, n_frames=3, depth_min=0.5, depth_max=8.0, batch=1
        ).items()
    }
    mesh = create_mesh(1)
    model = DepthNetHybrid(
        ndepths=16, depth_min=0.5, depth_max=8.0, resnet=18,
        est_transformer=True, bn_axis_name="data", pallas_warp=True,
    )
    tx = make_optimizer(
        warmup_multistep_schedule(1e-3, 100, warmup_steps=10)
    )
    state = create_train_state(model, jax.random.key(0), batch, tx)
    state = replicate(state, mesh)
    sharded = shard_batch(batch, mesh)
    step = make_train_step(model, tx, mesh, 0.5, 8.0)

    p0 = jax.tree.map(lambda x: np.asarray(x), state.params)
    state, scalars = step(state, sharded, jnp.float32(10.0))
    assert np.isfinite(float(scalars["loss"]))
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        state.params, p0,
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


def test_soft_sampler_matches_torch_band():
    """soft=True reproduces torch grid_sample's NATIVE zeros padding
    including the half-voxel fade band outside [0, size-1] that the hard
    mode (and the reference's strict masks) cut; compared WITHOUT pushing
    out-of-range coordinates away (unlike test_sampling's hard goldens)."""
    torch = pytest.importorskip("torch")
    from estdepth_tpu.ops.sampling import (
        bilinear_sample, bilinear_sample_stacked,
        trilinear_sample, trilinear_sample_stacked,
    )

    rng = np.random.default_rng(11)
    b, d, h, w, c = 2, 6, 9, 11, 4
    n = 600
    src3 = rng.normal(size=(b, d, h, w, c)).astype(np.float32)
    x = rng.uniform(-2.5, w + 1.5, size=(b, n)).astype(np.float32)
    y = rng.uniform(-2.5, h + 1.5, size=(b, n)).astype(np.float32)
    z = rng.uniform(-2.5, d + 1.5, size=(b, n)).astype(np.float32)

    def norm(q, size):
        return 2 * q / (size - 1) - 1

    t3 = torch.from_numpy(src3).permute(0, 4, 1, 2, 3)
    grid3 = torch.from_numpy(
        np.stack([norm(x, w), norm(y, h), norm(z, d)], axis=-1)[
            :, :, None, None, :
        ]
    )
    want3 = torch.nn.functional.grid_sample(
        t3, grid3, mode="bilinear", padding_mode="zeros",
        align_corners=True,
    ).squeeze(-1).squeeze(-1).permute(0, 2, 1).numpy()
    for fn in (trilinear_sample, trilinear_sample_stacked):
        got = np.asarray(
            fn(jnp.array(src3), jnp.array(x), jnp.array(y), jnp.array(z),
               soft=True)
        )
        np.testing.assert_allclose(got, want3, rtol=1e-4, atol=1e-5)

    src2 = rng.normal(size=(b, h, w, c)).astype(np.float32)
    t2 = torch.from_numpy(src2).permute(0, 3, 1, 2)
    grid2 = torch.from_numpy(
        np.stack([norm(x, w), norm(y, h)], axis=-1)[:, :, None, :]
    )
    want2 = torch.nn.functional.grid_sample(
        t2, grid2, mode="bilinear", padding_mode="zeros",
        align_corners=True,
    ).squeeze(-1).permute(0, 2, 1).numpy()
    for fn in (bilinear_sample, bilinear_sample_stacked):
        got = np.asarray(
            fn(jnp.array(src2), jnp.array(x), jnp.array(y), soft=True)
        )
        np.testing.assert_allclose(got, want2, rtol=1e-4, atol=1e-5)


def test_fused_two_pass_matches_split(setup, monkeypatch):
    """ESTDEPTH_FUSED_WARP=1 opts into the single-kernel K2+K3 form
    (pass-1 intermediate resident in VMEM, per-(plane, channel-block)
    grid — plane_warp._make_fused_pass_kernel). Same ops in the same
    order as the split kernels; outputs agree to 1 f32 ulp (compiler FMA
    contraction differs with the reshaped broadcast graph) on every mode
    that rides _two_pass — f32, packed bf16, and plane-sweep (which
    exercises planes_per_map > 1). Measured a perf WASH on chip (module
    docstring), kept as an A/B + compile-time option; this test keeps
    the path correct."""
    _, vol, intr, dvals, dmin, dint = setup
    rel = POSES[3]
    feat = vol[:, 0]
    ref_proj = geometry.camera_projection(intr, _pose())
    src_proj = geometry.camera_projection(intr, rel)

    def run_all():
        return (
            frustum_warp(vol, rel, intr, dvals, dmin, dint,
                         mode="plane_mix_pallas"),
            frustum_warp(vol.astype(jnp.bfloat16), rel, intr, dvals, dmin,
                         dint, mode="plane_mix_pallas_exact_z_packed"),
            plane_sweep_warp(feat, src_proj, ref_proj, dvals,
                             backend="pallas"),
        )

    monkeypatch.delenv("ESTDEPTH_FUSED_WARP", raising=False)
    split = run_all()
    monkeypatch.setenv("ESTDEPTH_FUSED_WARP", "1")
    fused = run_all()
    for s, f in zip(split, fused):
        np.testing.assert_allclose(
            np.asarray(s, np.float32), np.asarray(f, np.float32),
            rtol=0.0, atol=3e-6,
        )
