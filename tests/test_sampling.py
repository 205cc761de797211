"""Sampling parity vs torch grid_sample(align_corners=True, zeros padding).

torch >= 1.3's explicit align_corners=True reproduces the torch-1.2 semantics
the reference depends on. The reference additionally zeroes any sample whose
coordinate leaves [-1, 1] (homo_utils.py:488-491), which we model in the
torch golden by masking.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from estdepth_tpu.ops.sampling import bilinear_sample, trilinear_sample

torch = pytest.importorskip("torch")


def _norm(coord, size):
    return 2.0 * coord / (size - 1.0) - 1.0


def test_bilinear_matches_torch(rng):
    b, h, w, c = 2, 13, 17, 5
    n = 400
    src = rng.normal(size=(b, h, w, c)).astype(np.float32)
    # include plenty of out-of-range points
    x = rng.uniform(-4, w + 3, size=(b, n)).astype(np.float32)
    y = rng.uniform(-4, h + 3, size=(b, n)).astype(np.float32)

    got = np.asarray(bilinear_sample(jnp.array(src), jnp.array(x), jnp.array(y)))

    t_src = torch.from_numpy(src).permute(0, 3, 1, 2)  # [B,C,H,W]
    gx, gy = _norm(x, w), _norm(y, h)
    valid = (np.abs(gx) <= 1) & (np.abs(gy) <= 1)
    # reference forces OOB coords to 2 -> fully zero sample
    gx = np.where(valid, gx, 2.0)
    gy = np.where(valid, gy, 2.0)
    grid = torch.from_numpy(np.stack([gx, gy], axis=-1)[:, :, None, :])  # [B,N,1,2]
    want = torch.nn.functional.grid_sample(
        t_src, grid, mode="bilinear", padding_mode="zeros", align_corners=True
    )  # [B,C,N,1]
    want = want.squeeze(-1).permute(0, 2, 1).numpy()

    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_trilinear_matches_torch(rng):
    b, d, h, w, c = 2, 6, 9, 11, 4
    n = 500
    src = rng.normal(size=(b, d, h, w, c)).astype(np.float32)
    x = rng.uniform(-3, w + 2, size=(b, n)).astype(np.float32)
    y = rng.uniform(-3, h + 2, size=(b, n)).astype(np.float32)
    z = rng.uniform(-3, d + 2, size=(b, n)).astype(np.float32)

    got = np.asarray(
        trilinear_sample(jnp.array(src), jnp.array(x), jnp.array(y), jnp.array(z))
    )

    t_src = torch.from_numpy(src).permute(0, 4, 1, 2, 3)  # [B,C,D,H,W]
    gx, gy, gz = _norm(x, w), _norm(y, h), _norm(z, d)
    valid = (np.abs(gx) <= 1) & (np.abs(gy) <= 1) & (np.abs(gz) <= 1)
    gx = np.where(valid, gx, 2.0)
    gy = np.where(valid, gy, 2.0)
    gz = np.where(valid, gz, 2.0)
    grid = torch.from_numpy(
        np.stack([gx, gy, gz], axis=-1)[:, :, None, None, :]
    )  # [B,N,1,1,3]
    want = torch.nn.functional.grid_sample(
        t_src, grid, mode="bilinear", padding_mode="zeros", align_corners=True
    )  # [B,C,N,1,1]
    want = want.squeeze(-1).squeeze(-1).permute(0, 2, 1).numpy()

    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_bilinear_identity_grid(rng):
    """Sampling at exact integer pixel locations returns the input."""
    b, h, w, c = 1, 8, 10, 3
    src = rng.normal(size=(b, h, w, c)).astype(np.float32)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    x = xx.reshape(1, -1).astype(np.float32)
    y = yy.reshape(1, -1).astype(np.float32)
    got = np.asarray(bilinear_sample(jnp.array(src), jnp.array(x), jnp.array(y)))
    np.testing.assert_allclose(got.reshape(b, h, w, c), src, atol=1e-6)


@pytest.mark.parametrize("form", ["patch", "stacked"])
def test_fast_samplers_match_reference_impls(rng, form):
    """The optimized samplers (patch: one (2,2[,2],C)-slice gather;
    stacked: corner-stacked source + one aligned row gather — the warp hot
    path) == the pointwise-gather reference implementations, including
    boundary and out-of-range coordinates."""
    from estdepth_tpu.ops import sampling
    from estdepth_tpu.ops.sampling import bilinear_sample, trilinear_sample

    bilinear_sample_patch = getattr(sampling, f"bilinear_sample_{form}")
    trilinear_sample_patch = getattr(sampling, f"trilinear_sample_{form}")

    b, d, h, w, c = 2, 5, 9, 11, 4
    src3 = jnp.asarray(rng.normal(size=(b, d, h, w, c)).astype(np.float32))
    src2 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    n = 1500
    x = jnp.asarray(rng.uniform(-2, w + 1, (b, n)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-2, h + 1, (b, n)).astype(np.float32))
    z = jnp.asarray(rng.uniform(-2, d + 1, (b, n)).astype(np.float32))

    np.testing.assert_allclose(
        np.asarray(bilinear_sample_patch(src2, x, y)),
        np.asarray(bilinear_sample(src2, x, y)), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(trilinear_sample_patch(src3, x, y, z)),
        np.asarray(trilinear_sample(src3, x, y, z)), rtol=1e-5, atol=1e-6,
    )
    # exact-corner coordinates (the size-2 start clamp must stay exact)
    xc = jnp.asarray(np.array([[0.0, w - 1.0, w - 2.0, 1.0]], np.float32))
    yc = jnp.asarray(np.array([[0.0, h - 1.0, h - 2.0, h - 1.0]], np.float32))
    zc = jnp.asarray(np.array([[0.0, d - 1.0, d - 2.0, d - 1.0]], np.float32))
    np.testing.assert_allclose(
        np.asarray(bilinear_sample_patch(src2[:1], xc, yc)),
        np.asarray(bilinear_sample(src2[:1], xc, yc)), rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(trilinear_sample_patch(src3[:1], xc, yc, zc)),
        np.asarray(trilinear_sample(src3[:1], xc, yc, zc)),
        rtol=1e-6, atol=1e-7,
    )


def test_stacked_sampler_gradients_match_pointwise(rng):
    """grad-wrt-src of the stacked samplers == the pointwise form (the
    stacked backward is a row scatter + shift transposes instead of a tiny-
    window scatter — must be numerically identical)."""
    import jax

    from estdepth_tpu.ops.sampling import (
        bilinear_sample,
        bilinear_sample_stacked,
        trilinear_sample,
        trilinear_sample_stacked,
    )

    b, d, h, w, c = 2, 4, 7, 9, 3
    src3 = jnp.asarray(rng.normal(size=(b, d, h, w, c)).astype(np.float32))
    src2 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    n = 500
    x = jnp.asarray(rng.uniform(-2, w + 1, (b, n)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-2, h + 1, (b, n)).astype(np.float32))
    z = jnp.asarray(rng.uniform(-2, d + 1, (b, n)).astype(np.float32))
    cot2 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    cot3 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))

    g_ref = jax.grad(lambda s: jnp.sum(bilinear_sample(s, x, y) * cot2))(src2)
    g_new = jax.grad(
        lambda s: jnp.sum(bilinear_sample_stacked(s, x, y) * cot2)
    )(src2)
    np.testing.assert_allclose(
        np.asarray(g_new), np.asarray(g_ref), rtol=1e-5, atol=1e-5
    )

    g_ref = jax.grad(
        lambda s: jnp.sum(trilinear_sample(s, x, y, z) * cot3)
    )(src3)
    g_new = jax.grad(
        lambda s: jnp.sum(trilinear_sample_stacked(s, x, y, z) * cot3)
    )(src3)
    np.testing.assert_allclose(
        np.asarray(g_new), np.asarray(g_ref), rtol=1e-5, atol=1e-5
    )


def test_stacked_samplers_handle_size_one_axes(rng):
    """Size-1 sampled axes must not produce start index -1 under
    PROMISE_IN_BOUNDS (the corner-start clamp is [0, max(size-2, 0)])."""
    from estdepth_tpu.ops.sampling import (
        bilinear_sample,
        bilinear_sample_stacked,
        trilinear_sample,
        trilinear_sample_stacked,
    )

    src2 = jnp.asarray(rng.normal(size=(1, 1, 6, 3)).astype(np.float32))
    x = jnp.asarray(np.array([[0.0, 2.5, 5.0]], np.float32))
    y = jnp.asarray(np.zeros((1, 3), np.float32))
    np.testing.assert_allclose(
        np.asarray(bilinear_sample_stacked(src2, x, y)),
        np.asarray(bilinear_sample(src2, x, y)), rtol=1e-6, atol=1e-7,
    )

    src3 = jnp.asarray(rng.normal(size=(1, 1, 5, 6, 3)).astype(np.float32))
    z = jnp.asarray(np.zeros((1, 3), np.float32))
    y3 = jnp.asarray(np.array([[0.0, 1.5, 4.0]], np.float32))
    np.testing.assert_allclose(
        np.asarray(trilinear_sample_stacked(src3, x, y3, z)),
        np.asarray(trilinear_sample(src3, x, y3, z)), rtol=1e-6, atol=1e-7,
    )
