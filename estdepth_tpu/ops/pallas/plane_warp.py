"""Pallas lane-gather warps: the gather engine off the critical path.

The eval window step is dominated by warp gathers (tools/profile_scan.py):
every warped voxel costs one gather-engine row (~13-42 ns) and all the conv
compute combined is smaller than the two frustum warps. Mosaic on v5e cannot
vectorize an arbitrary cross-row gather — but it CAN vectorize a same-shape
2D lane gather (`tpu.dynamic_gather` of src[s, idx[s, l]] with idx.shape ==
src.shape and the gathered axis within one 128-lane vreg), and that form
runs at VPU speed: measured 14.6x faster than XLA's take_along_axis at
[8192, 128] and ~0.4 ms for an entire 64-plane warp pass
(tools/experiments/pallas_lane_gather.py).

Both hot warps factor EXACTLY into chains of such gathers at this model's
shapes, because every per-axis resample direction fits in one vreg
(Z = D = ndepths <= 128, H/4 <= 128, W/4 <= 128):

  frustum_warp (reference warp_volume, homo_utils.py:240-279):
    K1 z-mix   per channel: out[n, d] = lerp_z(V[c][n, :], zi[n, d])
               — the plane-mix stage-A z interpolation as a lane gather
               over the Z axis (idx [HW, D] == src [HW, Z] since D == Z)
    K2 pass-1  per plane: horizontal resample of each source row at the
               row-crossing positions x = a_u h + b_u of each target
               column's source line (a homography maps the target column
               u to a source LINE, so x is affine in the source row)
    K3 pass-2  per plane: vertical resample of each column at the exact
               per-voxel source y, with hard OOB zeroing at the exact
               (x*, y*) (idx [W, Hout] == src [W, H] since Hout == H)

  plane_sweep_warp (reference homo_warping, homo_utils.py:458-504):
    K2 + K3 only, with all D homographies reading ONE shared feature map.

Accuracy: K1 is bit-identical in formulation to frustum_warp's
mode="plane_mix" stage A (z evaluated per source pixel — the documented
sub-plane-spacing deviation from exact trilinear, tests/test_fast_frustum).
K2/K3 is the classic two-pass decomposition (Catmull-Smith '80): the
horizontal lerp is evaluated where the column's source line crosses integer
source rows instead of at the exact sample point — a deviation bounded by
|a_u| (the line's pixels-per-row slope), sub-pixel whenever the warp keeps
target columns within 45 degrees of vertical, which every realistic camera
motion here does. Planes whose target columns map to near-HORIZONTAL source
lines (|den| ~ 0 below) cannot be two-passed in this direction; their ab
coefficients degrade gracefully (clamped pass-1, exact-coordinate masking
still zeroes OOB) but in-bounds values are wrong — tests pin the realistic-
motion tolerance, and the flag stays opt-in like fast_frustum.

Everything runs in f32 lanes — Mosaic's dynamic_gather rejects bf16 on this
toolchain (reproducible compile-helper crash, probe file above). bf16
volumes do NOT pay an f32 upcast, though: since bf16 is the TOP HALF of an
f32 bit pattern, two bf16 channels pack into one int32 lane outside the
kernels (one XLA bitcast), the lane gathers move int32 bits, and in-kernel
unpack is a shift + same-width bitcast with the lerp in f32 and a
round-to-nearest-even integer repack — HALVING every kernel's HBM traffic
and the inter-kernel transposes vs upcasting. The repack is bit-identical
to `astype(bfloat16)` of the f32 lerp; the only deviation vs the f32
kernels is bf16 quantization of the two inter-stage intermediates
(tests/test_pallas_warp.py pins it).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_P = jax.lax.Precision.HIGHEST


def _interpret() -> bool:
    # CPU tests run the kernels through the Pallas interpreter
    return jax.default_backend() == "cpu"


def _check_lane_fit(**axes: int) -> None:
    """Every resampled axis must fit ONE 128-lane vreg: Mosaic's
    tpu.dynamic_gather fails with 'Multiple source vregs along gather
    dimension' beyond that. The model only warps at stride 4 (D<=64,
    H/4<=64, W/4<=80), so this never fires on the shipped paths; it turns
    a cryptic Mosaic error into an actionable one for other shapes."""
    for name, size in axes.items():
        if size > 128:
            raise ValueError(
                f"pallas plane-warp: axis {name}={size} exceeds the "
                f"128-lane dynamic_gather limit; use the XLA backend for "
                f"full-resolution warps"
            )


def _row_tile(n: int, d: int, budget_bytes: int = 6 * 1024 * 1024) -> int:
    """Largest divisor of n whose [tile, d] f32 kernel working set (~8 live
    intermediates: src/idx/out blocks + valid/i0/f/g0/g1) fits the ~16 MB
    scoped-vmem limit with headroom; flagship [5120, 64] otherwise OOMs at
    19.7 MB (measured through the AOT compile helper)."""
    cap = max(1, budget_bytes // (d * 4 * 8))
    for t in range(min(n, cap), 0, -1):
        if n % t == 0:
            return t
    return 1


def _corner(q: jnp.ndarray, size: int):
    """Stacked-sampler corner conventions (ops/sampling.py): clamp the
    coordinate into [0, size-1], the base index into [0, size-2]; the
    fraction is taken against the clamped coordinate."""
    qc = jnp.clip(q, 0.0, size - 1.0)
    i0 = jnp.clip(jnp.floor(qc), 0.0, max(size - 2.0, 0.0))
    return i0.astype(jnp.int32), qc - i0


_HI = -65536  # 0xFFFF0000 as int32: the bf16 (top) half of an f32 lane
# (a plain Python int — a jnp scalar here would be captured as a pallas
# kernel constant, which pallas_call rejects)


def _bc(x, dt):
    """Same-width bit reinterpretation (lowers in Mosaic AND interpret)."""
    return jax.lax.bitcast_convert_type(x, dt)


def _unpack2(g):
    """int32 bf16-pair lane -> (low-half, high-half) f32 values."""
    return _bc(g << 16, jnp.float32), _bc(g & _HI, jnp.float32)


def _rne_hi(x):
    """f32 -> round-to-nearest-even bf16 bits in the TOP half of the lane.
    Bit-identical to `astype(bfloat16)` of x
    (tests/test_pallas_warp.py::test_packed_lerp_bit_exact)."""
    bits = _bc(x, jnp.int32)
    lsb = jax.lax.shift_right_logical(bits, 16) & 1
    return (bits + 0x7FFF + lsb) & _HI


def _pack2(lo, hi):
    """Pack two f32 values as RNE bf16 halves of one int32 lane
    (low half = `lo`, matching _unpack2's order)."""
    return jax.lax.shift_right_logical(_rne_hi(lo), 16) | _rne_hi(hi)


def _lerp2(g0, g1, f):
    """Lerp bf16 channel PAIRS packed into int32 lanes, in f32 math.

    bf16 is the top 16 bits of f32, so unpack = shift + same-width bitcast
    — no 16-bit dtypes in-kernel (Mosaic rejects bf16 dynamic_gather);
    repack rounds to nearest-even. Bit-identical to `astype(bfloat16)` of
    the f32 lerp (tests/test_pallas_warp.py::test_packed_lerp_bit_exact).
    """
    a0, b0 = _unpack2(g0)
    a1, b1 = _unpack2(g1)
    return _pack2(a0 * (1.0 - f) + a1 * f, b0 * (1.0 - f) + b1 * f)


def _lerp1(g0, g1, f):
    return g0 * (1.0 - f) + g1 * f


def _make_zmix_kernel(packed: bool):
    mix = _lerp2 if packed else _lerp1

    def kernel(vt_ref, zi_ref, out_ref):
        # vt [1, N, Z] f32|int32; zi [1, N, D] f32; out [1, N, D]
        v = vt_ref[0]
        zi = zi_ref[0]
        z = v.shape[-1]
        # epsilon-padded hard OOB zero (homo_utils.py:192; see the matching
        # note in ops/warp._frustum_warp_planemix — boundary-exact zi must
        # not be noise-zeroed)
        valid = (zi >= -1e-3) & (zi <= z - 1.0 + 1e-3)
        i0, f = _corner(zi, z)
        g0 = jnp.take_along_axis(v, i0, axis=1)
        g1 = jnp.take_along_axis(v, i0 + 1, axis=1)
        out_ref[0] = jnp.where(valid, mix(g0, g1, f), 0)

    return kernel


def _make_pass1_kernel(packed: bool):
    mix = _lerp2 if packed else _lerp1

    def kernel(m_ref, ab_ref, j_ref):
        # m [1, H, C, W] f32|int32; ab [1, 2, W]; j [1, H, C, W]
        _, hh, cc, ww = m_ref.shape
        a = ab_ref[0, 0:1]  # [1, W]
        b = ab_ref[0, 1:2]
        hrow = jax.lax.broadcasted_iota(
            jnp.int32, (hh, 1, ww), 0
        ).astype(jnp.float32)
        xq = a[None] * hrow + b[None]  # [H, 1, W] row-crossing x per column
        x0, f = _corner(xq, ww)
        idx = jnp.broadcast_to(x0, (hh, cc, ww)).reshape(hh * cc, ww)
        fb = jnp.broadcast_to(f, (hh, cc, ww)).reshape(hh * cc, ww)
        src = m_ref[0].reshape(hh * cc, ww)
        g0 = jnp.take_along_axis(src, idx, axis=1)
        g1 = jnp.take_along_axis(src, idx + 1, axis=1)
        j_ref[0] = mix(g0, g1, fb).reshape(hh, cc, ww)

    return kernel


def _make_pass2_kernel(packed: bool):
    mix = _lerp2 if packed else _lerp1

    def kernel(jt_ref, yq_ref, xv_ref, out_ref):
        # jt [1, C, W, H] f32|int32; yq/xv [1, W, Hout]; out [1, C, W, Hout]
        _, cc, ww, hh = jt_ref.shape
        yq = yq_ref[0]
        xv = xv_ref[0]
        hout = yq.shape[-1]
        valid = (
            (yq >= 0.0) & (yq <= hh - 1.0) & (xv >= 0.0) & (xv <= ww - 1.0)
        )
        y0, f = _corner(yq, hh)
        idx = jnp.broadcast_to(y0[None], (cc, ww, hout)).reshape(
            cc * ww, hout)
        fb = jnp.broadcast_to(f[None], (cc, ww, hout)).reshape(
            cc * ww, hout)
        vb = jnp.broadcast_to(valid[None], (cc, ww, hout)).reshape(
            cc * ww, hout)
        src = jt_ref[0].reshape(cc * ww, hh)
        g0 = jnp.take_along_axis(src, idx, axis=1)
        g1 = jnp.take_along_axis(src, idx + 1, axis=1)
        out_ref[0] = jnp.where(vb, mix(g0, g1, fb), 0).reshape(
            cc, ww, hout)

    return kernel


def _make_fused_pass_kernel(packed: bool, cblk: int):
    """K2 + K3 fused per (plane, channel-block): pass-1, the per-channel
    [H, W] -> [W, H] relayout, and pass-2 all inside one kernel, so the
    pass-1 intermediate never round-trips HBM and the inter-kernel XLA
    transpose program disappears. The math is the SAME ops in the SAME
    order as the split kernels; outputs agree to 1 f32 ulp (compiler
    FMA contraction differs with the reshaped broadcast graph — pinned
    by tests/test_pallas_warp.py::test_fused_two_pass_matches_split) —
    only the intermediate's residency changes (VMEM, not HBM).

    Why per-channel: Mosaic cannot shape-cast [H*C, W] -> [H, C*W]
    (regrouping across the lane axis is data movement it refuses to
    infer), but the per-channel [H, W] -> [W, H] relayout is a plain 2D
    vector transpose it supports. The channel axis moves to the grid
    (innermost, `cblk` slices per step); the plane-indexed ab/yq/xv
    blocks keep the SAME index across that inner dim, so the pipeline
    fetches them once per plane, not once per channel."""
    mix = _lerp2 if packed else _lerp1

    def kernel(m_ref, ab_ref, yq_ref, xv_ref, out_ref):
        # m [1, cblk, H, W] f32|int32 (channel-major so the blocked axis
        # stays clear of the last-two-dims tiling constraint); ab
        # [1, 2, W]; yq/xv [1, W, Hout]; out [1, cblk, W, Hout]
        _, _, hh, ww = m_ref.shape
        a = ab_ref[0, 0:1]  # [1, W]
        b = ab_ref[0, 1:2]
        hrow = jax.lax.broadcasted_iota(
            jnp.int32, (hh, ww), 0
        ).astype(jnp.float32)
        xq = a * hrow + b  # [H, W] row-crossing x per target column
        x0, f = _corner(xq, ww)
        yq = yq_ref[0]
        xv = xv_ref[0]
        valid = (
            (yq >= 0.0) & (yq <= hh - 1.0) & (xv >= 0.0) & (xv <= ww - 1.0)
        )
        y0, f2 = _corner(yq, hh)
        for t in range(cblk):
            src = m_ref[0, t]  # [H, W]
            g0 = jnp.take_along_axis(src, x0, axis=1)
            g1 = jnp.take_along_axis(src, x0 + 1, axis=1)
            j = mix(g0, g1, f)        # [H, W] — pass-1, stays in VMEM
            jt = jnp.transpose(j)     # [W, H] 2D vector transpose
            h0 = jnp.take_along_axis(jt, y0, axis=1)
            h1 = jnp.take_along_axis(jt, y0 + 1, axis=1)
            out_ref[0, t] = jnp.where(valid, mix(h0, h1, f2), 0)

    return kernel


def _line_coeffs(hmat: jnp.ndarray, width: int) -> jnp.ndarray:
    """Per-target-column source-line coefficients from homographies.

    hmat: [P, 3, 3] mapping target pixel (u, v, 1) -> source (x', y', z').
    For fixed u the image of the target column is a source line
    x = a_u y + b_u; with c = H[:, 0] u + H[:, 2] and d = H[:, 1]:
      a = (d0 c2 - d2 c0) / den,  b = (c0 d1 - c1 d0) / den,
      den = d1 c2 - d2 c1  (near-zero <=> near-horizontal source line,
    the direction this decomposition cannot express — see module note).

    Returns [P, 2, W] stacked (a, b), f32.
    """
    u = jnp.arange(width, dtype=jnp.float32)
    c = (
        hmat[:, :, 0:1] * u[None, None, :] + hmat[:, :, 2:3]
    )  # [P, 3, W]
    d = hmat[:, :, 1:2]  # [P, 3, 1]
    den = d[:, 1] * c[:, 2] - d[:, 2] * c[:, 1]  # [P, W]
    den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    a = (d[:, 0] * c[:, 2] - d[:, 2] * c[:, 0]) / den
    b = (c[:, 0] * d[:, 1] - c[:, 1] * d[:, 0]) / den
    return jnp.stack([a, b], axis=1)


def _two_pass(maps_t, ab, yq, xv, planes_per_map: int,
              packed: bool = False):
    """Run K2 + K3 over P = M * planes_per_map output planes.

    maps_t: [M, H, C, W] f32 — or int32 bf16-pairs when `packed`
    ab:     [P, 2, W] line coefficients
    yq/xv:  [P, W, Hout] exact per-voxel source y / x (for pass-2 + mask)
    Returns [P, Hout, W, C] f32 (int32 bf16-pairs when `packed`).

    ESTDEPTH_FUSED_WARP=1 opts into the FUSED per-(plane, channel-block)
    kernel (pass-1 intermediate stays in VMEM — no HBM round-trip, no
    inter-kernel transpose program). Measured round-5 on chip: a WASH
    (packed frustum x4 7.72/7.96 ms fused vs 7.69/7.74 unfused across
    two sessions; plane-sweep within noise) — the chain is NOT
    inter-kernel-HBM-bound, so the split two-kernel form stays the
    default and the fused path is kept as a compile-time/A-B option.
    """
    m, hh, cc, ww = maps_t.shape
    p = ab.shape[0]
    hout = yq.shape[-1]
    interp = _interpret()
    dt = jnp.int32 if packed else jnp.float32

    if os.environ.get("ESTDEPTH_FUSED_WARP", "") not in ("", "0"):
        cblk = next(k for k in (4, 2, 1) if cc % k == 0)
        # channel-major input so the blocked C axis stays clear of the
        # last-two-dims tiling constraint; XLA folds this into the
        # producer's transpose (transpose-of-transpose -> one copy)
        maps_c = jnp.transpose(maps_t, (0, 2, 1, 3))  # [M, C, H, W]
        out = pl.pallas_call(
            _make_fused_pass_kernel(packed, cblk),
            out_shape=jax.ShapeDtypeStruct((p, cc, ww, hout), dt),
            # channel-block dim innermost: the plane-indexed blocks below
            # keep the same index across it and are fetched once per plane
            grid=(p, cc // cblk),
            in_specs=[
                pl.BlockSpec(
                    (1, cblk, hh, ww),
                    lambda i, k, r=planes_per_map: (i // r, k, 0, 0),
                ),
                pl.BlockSpec((1, 2, ww), lambda i, k: (i, 0, 0)),
                pl.BlockSpec((1, ww, hout), lambda i, k: (i, 0, 0)),
                pl.BlockSpec((1, ww, hout), lambda i, k: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, cblk, ww, hout), lambda i, k: (i, k, 0, 0)
            ),
            interpret=interp,
        )(maps_c, ab, yq, xv)
        return jnp.transpose(out, (0, 3, 2, 1))  # [P, Hout, W, C]

    j = pl.pallas_call(
        _make_pass1_kernel(packed),
        out_shape=jax.ShapeDtypeStruct((p, hh, cc, ww), dt),
        grid=(p,),
        in_specs=[
            pl.BlockSpec(
                (1, hh, cc, ww),
                lambda i, r=planes_per_map: (i // r, 0, 0, 0),
            ),
            pl.BlockSpec((1, 2, ww), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hh, cc, ww), lambda i: (i, 0, 0, 0)),
        interpret=interp,
    )(maps_t, ab)

    jt = jnp.transpose(j, (0, 2, 3, 1))  # [P, C, W, H]

    out = pl.pallas_call(
        _make_pass2_kernel(packed),
        out_shape=jax.ShapeDtypeStruct((p, cc, ww, hout), dt),
        grid=(p,),
        in_specs=[
            pl.BlockSpec((1, cc, ww, hh), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, ww, hout), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, ww, hout), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, cc, ww, hout), lambda i: (i, 0, 0, 0)),
        interpret=interp,
    )(jt, yq, xv)

    return jnp.transpose(out, (0, 3, 2, 1))  # [P, Hout, W, C]


def _frustum_impl(
    volume: jnp.ndarray,      # [B, D, H, W, C]
    t: jnp.ndarray,           # [B, 4, 4] target->source rigid transform
    cam_intr: jnp.ndarray,    # [B, 3, 3]
    depth_values: jnp.ndarray,  # [B, D]
    depth_min: float,
    depth_interval: float,
    grid: jnp.ndarray,        # [3, H*W] homogeneous pixel grid
    x: jnp.ndarray,           # [B, D*H*W] exact source-pixel x (plane-major)
    y: jnp.ndarray,           # [B, D*H*W] exact source-pixel y
) -> jnp.ndarray:
    """plane_mix frustum warp with every gather on the VPU (see module doc).

    Same interface/semantics as ops/warp._frustum_warp_planemix stage A
    (identical zi field) with the two-pass stage B.
    """
    b, d, h, w, c = volume.shape
    _check_lane_fit(depth=d, height=h, width=w)
    f32 = jnp.float32
    dtype = volume.dtype

    # ---- zi field (plane-mix stage A math, ops/warp.py) -------------------
    rot = t[:, :3, :3]
    trans = t[:, :3, 3]
    k_inv = jnp.linalg.inv(cam_intr)
    m0 = jnp.einsum("bij,bjk->bik", rot, k_inv, precision=_P)
    a_mats = depth_values[:, :, None, None].astype(f32) * m0[:, None]
    a_mats = a_mats.at[:, :, :, 2].add(trans[:, None, :])
    e3 = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], f32), (b, d, 3))
    n = jnp.linalg.solve(jnp.swapaxes(a_mats, -1, -2), e3[..., None])[..., 0]
    rays = jnp.einsum("bij,jn->bin", k_inv, grid, precision=_P)
    denom = jnp.einsum("bdi,bin->bdn", n, rays, precision=_P)  # [B, D, HW]
    zs = 1.0 / denom
    zi = (zs - depth_min) / depth_interval
    in_front = (denom > 1e-8) & jnp.isfinite(zi)
    zi = jnp.where(in_front, zi, -2.0)

    # bf16 volumes ride the kernels as int32-packed channel PAIRS (half the
    # HBM traffic of an f32 upcast, see module doc); f32 volumes unchanged
    packed = dtype == jnp.bfloat16 and c % 2 == 0
    c2 = c // 2 if packed else c
    kdt = jnp.int32 if packed else f32

    # ---- K1: z-mix as a lane gather over Z (idx [HW, D] == src [HW, Z]) ---
    zi_t = jnp.transpose(zi, (0, 2, 1))  # [B, HW, D]
    if packed:
        vt = _bc(
            jnp.transpose(
                volume.reshape(b, d, h * w, c2, 2), (0, 3, 2, 1, 4)
            ),
            jnp.int32,
        ).reshape(b * c2, h * w, d)  # [B*C/2, HW, Z] int32 pairs
    else:
        vt = jnp.transpose(
            volume.astype(f32).reshape(b, d, h * w, c), (0, 3, 2, 1)
        ).reshape(b * c, h * w, d)  # [B*C, HW, Z]

    tile = _row_tile(h * w, d)
    mixed = pl.pallas_call(
        _make_zmix_kernel(packed),
        out_shape=jax.ShapeDtypeStruct((b * c2, h * w, d), kdt),
        grid=(b * c2, (h * w) // tile),
        in_specs=[
            pl.BlockSpec((1, tile, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec(
                (1, tile, d), lambda i, j, cc=c2: (i // cc, j, 0)
            ),
        ],
        out_specs=pl.BlockSpec((1, tile, d), lambda i, j: (i, j, 0)),
        interpret=_interpret(),
    )(vt, zi_t)

    # [B*C2, HW, D] -> per-plane maps [B*D, H, C2, W]
    maps_t = jnp.transpose(
        mixed.reshape(b, c2, h, w, d), (0, 4, 2, 1, 3)
    ).reshape(b * d, h, c2, w)

    # ---- per-plane homographies -> line coefficients ----------------------
    # target depth plane z_t = dv_d: H_d = dv_d * K R K^-1 + (K t) e3^T
    krk = jnp.einsum("bij,bjk->bik", cam_intr.astype(f32), m0, precision=_P)
    kt = jnp.einsum("bij,bj->bi", cam_intr.astype(f32), trans, precision=_P)
    hmat = (
        depth_values[:, :, None, None].astype(f32) * krk[:, None]
    )
    hmat = hmat.at[:, :, :, 2].add(kt[:, None, :])  # [B, D, 3, 3]
    ab = _line_coeffs(hmat.reshape(b * d, 3, 3), w)

    # ---- K2 + K3 with the exact per-voxel y (and x for masking) -----------
    yq = jnp.transpose(
        y.astype(f32).reshape(b * d, h, w), (0, 2, 1)
    )  # [B*D, W, Hout]
    xv = jnp.transpose(x.astype(f32).reshape(b * d, h, w), (0, 2, 1))
    out = _two_pass(maps_t, ab, yq, xv, planes_per_map=1, packed=packed)
    if packed:  # [P, Hout, W, C2] int32 -> [..., C2, 2] bf16 -> channels
        return _bc(out, jnp.bfloat16).reshape(b, d, h, w, c)
    return out.reshape(b, d, h, w, c).astype(dtype)


# ---- trainable wrappers ----------------------------------------------------
# The kernels are forward-only; the VJP is defined as the gradient of the
# XLA plane-mix formulation W.R.T. THE SAMPLED VOLUME at the same
# coordinates — the two forwards agree to sub-pixel tolerance
# (tests/test_pallas_warp.py) and sampling is linear in the source, so this
# is the plane-mix cotangent scatter, not an approximation of one.
# Coordinate/pose/intrinsics cotangents are ZERO: the reference computes
# its plane-sweep grid under torch.no_grad() (homo_utils.py:468) and pose/
# intrinsics are non-parameter inputs everywhere, so no training signal is
# lost (tests/test_pallas_warp.py::test_frustum_pallas_grad*).


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _frustum_diff(depth_min, depth_interval, volume, t, cam_intr,
                  depth_values, grid, x, y):
    return _frustum_impl(volume, t, cam_intr, depth_values, depth_min,
                         depth_interval, grid, x, y)


def _frustum_diff_fwd(depth_min, depth_interval, volume, t, cam_intr,
                      depth_values, grid, x, y):
    out = _frustum_impl(volume, t, cam_intr, depth_values, depth_min,
                        depth_interval, grid, x, y)
    return out, (volume, t, cam_intr, depth_values, grid, x, y)


def _frustum_diff_bwd(depth_min, depth_interval, res, ct):
    from estdepth_tpu.ops.warp import _frustum_warp_planemix

    volume, t, cam_intr, depth_values, grid, x, y = res
    _, vjp = jax.vjp(
        lambda v: _frustum_warp_planemix(
            v, t, cam_intr, depth_values, depth_min, depth_interval,
            grid, x, y,
        ),
        volume,
    )
    (dvol,) = vjp(ct)
    zl = jnp.zeros_like
    return (dvol, zl(t), zl(cam_intr), zl(depth_values), zl(grid),
            zl(x), zl(y))


_frustum_diff.defvjp(_frustum_diff_fwd, _frustum_diff_bwd)


def frustum_warp_pallas(
    volume, t, cam_intr, depth_values, depth_min: float,
    depth_interval: float, grid, x, y,
) -> jnp.ndarray:
    """Differentiable entry: Pallas forward, plane-mix-VJP backward."""
    return _frustum_diff(float(depth_min), float(depth_interval), volume,
                         t, cam_intr, depth_values, grid, x, y)


def _psweep_impl(
    src_feat: jnp.ndarray,     # [B, H, W, C]
    rot: jnp.ndarray,          # [B, 3, 3] K-premultiplied relative rotation
    trans: jnp.ndarray,        # [B, 3]    K-premultiplied translation
    depth_values: jnp.ndarray,  # [B, D]
    x: jnp.ndarray,            # [B, D*H*W] exact source x (plane-major)
    y: jnp.ndarray,            # [B, D*H*W] exact source y
) -> jnp.ndarray:
    """Two-pass homo_warping: D homographies of ONE shared feature map.

    rot/trans are homo_warping's decomposition (geometry.relative_projection
    — already K-premultiplied on both sides), so the depth-d homography is
    directly H_d = d * rot + trans e3^T (homo_utils.py:469-483).
    """
    b, h, w, c = src_feat.shape
    d = depth_values.shape[1]
    _check_lane_fit(height=h, width=w)
    f32 = jnp.float32
    dtype = src_feat.dtype

    hmat = depth_values[:, :, None, None].astype(f32) * rot.astype(f32)[
        :, None
    ]
    hmat = hmat.at[:, :, :, 2].add(trans.astype(f32)[:, None, :])
    ab = _line_coeffs(hmat.reshape(b * d, 3, 3), w)

    packed = dtype == jnp.bfloat16 and c % 2 == 0
    if packed:  # int32 bf16-pair lanes (see module doc)
        maps_t = _bc(
            jnp.transpose(
                src_feat.reshape(b, h, w, c // 2, 2), (0, 1, 3, 2, 4)
            ),
            jnp.int32,
        )  # [B, H, C/2, W]
    else:
        maps_t = jnp.transpose(
            src_feat.astype(f32), (0, 1, 3, 2))  # [B,H,C,W]
    yq = jnp.transpose(y.astype(f32).reshape(b * d, h, w), (0, 2, 1))
    xv = jnp.transpose(x.astype(f32).reshape(b * d, h, w), (0, 2, 1))
    out = _two_pass(maps_t, ab, yq, xv, planes_per_map=d, packed=packed)
    if packed:
        return _bc(out, jnp.bfloat16).reshape(b, d, h, w, c)
    return out.reshape(b, d, h, w, c).astype(dtype)


@jax.custom_vjp
def plane_sweep_warp_pallas(src_feat, rot, trans, depth_values, x, y):
    """Differentiable entry: Pallas forward; backward is the exact
    bilinear-sampling transpose w.r.t. src_feat (the XLA path's own VJP —
    ops/warp.plane_sweep_warp samples `bilinear_sample_stacked(feat, x, y)`
    at the identical coordinates). Coordinate cotangents are zero, exactly
    the reference's torch.no_grad() grid (homo_utils.py:468)."""
    return _psweep_impl(src_feat, rot, trans, depth_values, x, y)


def _psweep_fwd(src_feat, rot, trans, depth_values, x, y):
    out = _psweep_impl(src_feat, rot, trans, depth_values, x, y)
    return out, (src_feat, rot, trans, depth_values, x, y)


def _psweep_bwd(res, ct):
    from estdepth_tpu.ops.sampling import bilinear_sample_stacked

    src_feat, rot, trans, depth_values, x, y = res
    b, h, w, c = src_feat.shape
    d = depth_values.shape[1]
    _, vjp = jax.vjp(
        lambda s: bilinear_sample_stacked(s, x, y).reshape(b, d, h, w, c),
        src_feat,
    )
    (dfeat,) = vjp(ct.astype(src_feat.dtype))
    zl = jnp.zeros_like
    return (dfeat, zl(rot), zl(trans), zl(depth_values), zl(x), zl(y))


plane_sweep_warp_pallas.defvjp(_psweep_fwd, _psweep_bwd)
