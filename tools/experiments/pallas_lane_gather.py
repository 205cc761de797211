#!/usr/bin/env python
"""Feasibility probe: can Mosaic on v5e vectorize a lane gather
(take_along_axis over the minor dim) inside a Pallas kernel, and how fast
is it vs XLA's row-gather for the same resample work?

Context: the frustum/plane-sweep warps' stage-B is a per-plane 2D bilinear
gather — ~13.5 ns per 128-lane row through the gather engine, the dominant
term of the eval window step (tools/profile_scan.py). The plane maps are
only [H=64, W=80, C=32]: W and H both fit a single 128-lane vreg, so a
two-pass (horizontal then vertical) resample could replace the gather
engine with VPU lane gathers IF tpu.dynamic_gather is generated for
take_along_axis at these shapes. This probe measures exactly that.

Run on the TPU: python tools/experiments/pallas_lane_gather.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from estdepth_tpu.utils.platform import (  # noqa: E402
    apply_platform_env, enable_compilation_cache,
)

apply_platform_env()
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def lane_gather_kernel(src_ref, idx_ref, out_ref):
    # src [S, L], idx [S, L] int32 in [0, L) -> out[s, l] = src[s, idx[s, l]]
    out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=-1)


def run_lane_gather(src, idx):
    return pl.pallas_call(
        lane_gather_kernel,
        out_shape=jax.ShapeDtypeStruct(src.shape, src.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(src, idx)


def main():
    n = int(os.environ.get("N", "50"))

    def timed(name, fn, *args):
        # scan-amortized timing with distinct inputs per iteration and one
        # fetch (relay measurement rules, CLAUDE.md)
        stacked = [
            jnp.stack([a + (jnp.zeros_like(a) + i % 3) if a.dtype != jnp.int32
                       else a for i in range(n)])
            for a in args
        ]

        @jax.jit
        def prog(xs):
            def body(c, x):
                return c + jnp.sum(jnp.abs(fn(*x).astype(jnp.float32))), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), tuple(xs))
            return c

        try:
            float(prog(stacked))  # compile + warm
            t0 = time.perf_counter()
            float(prog(stacked))
            dt = (time.perf_counter() - t0) / n * 1e3
            print(f"{name:34s} {dt:8.3f} ms/iter")
            return dt
        except Exception as e:
            print(f"{name:34s} FAILED: {type(e).__name__}: {e}"[:300])
            return None

    rng = np.random.default_rng(0)

    # shape family A: one vreg-width gather, many sublanes
    # (the two-pass warp's inner op: resample H=64..128-wide lines)
    for s, l in [(256, 128), (2048, 128), (8192, 128)]:
        src = jnp.asarray(rng.normal(size=(s, l)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, l, size=(s, l)).astype(np.int32))
        timed(f"pallas lane_gather [{s},{l}] f32", run_lane_gather, src, idx)
        timed(f"xla take_along_axis [{s},{l}] f32",
              lambda a, b: jnp.take_along_axis(a, b, axis=-1), src, idx)

    # bf16 variant (the warp's dtype)
    src = jnp.asarray(rng.normal(size=(2048, 128)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, 128, size=(2048, 128)).astype(np.int32))
    timed("pallas lane_gather [2048,128] bf16", run_lane_gather, src, idx)

    # the comparison row-gather: same total elements fetched through the
    # gather engine (what the warps do today): 2048 rows of 128 lanes
    tbl = jnp.asarray(rng.normal(size=(8192, 128)).astype(np.float32))
    rows = jnp.asarray(rng.integers(0, 8192, size=(2048,)).astype(np.int32))
    timed("xla row-gather 2048x[128] f32",
          lambda t, r: jnp.take(t, r, axis=0), tbl, rows)

    # ---- the warp kernel's actual shapes: sub-128 lane widths ------------
    # K1 z-mix: [HW=5120, Z=64]; K3 pass-2: [W=80, H=64]; K2 pass-1:
    # [C=32, W=80]. All strictly same-shape source/idx.
    for s, l in [(5120, 64), (80, 64), (32, 80)]:
        src = jnp.asarray(rng.normal(size=(s, l)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, l, size=(s, l)).astype(np.int32))
        timed(f"pallas lane_gather [{s},{l}] f32", run_lane_gather, src, idx)

    # bf16 retry (first attempt died in the remote compile helper —
    # determine transient vs real)
    src = jnp.asarray(rng.normal(size=(2048, 128)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, 128, size=(2048, 128)).astype(np.int32))
    timed("pallas lane_gather bf16 retry", run_lane_gather, src, idx)

    # ---- K2-style kernel: fori_loop + dynamic sublane ref indexing -------
    # per grid step: a [h=64, C=32, w=80] block; loop h, lane-gather each
    # [C, w] row at per-h affine positions, lerp, write [C, Wout]
    hh, cc, ww = 64, 32, 80

    def pass1_kernel(m_ref, a_ref, b_ref, j_ref):
        av = a_ref[:]  # [1, W]
        bv = b_ref[:]

        def body(i, _):
            row = m_ref[i]                       # [C, w]
            xq = av * jnp.float32(1.0) * i * 0.02 + bv  # [1, W]
            x0 = jnp.floor(xq)
            f = (xq - x0).astype(row.dtype)
            x0i = jnp.clip(x0.astype(jnp.int32), 0, ww - 2)
            idx = jnp.broadcast_to(x0i, (cc, ww))
            g0 = jnp.take_along_axis(row, idx, axis=1)
            g1 = jnp.take_along_axis(row, idx + 1, axis=1)
            j_ref[i] = g0 * (1.0 - f) + g1 * f
            return 0

        jax.lax.fori_loop(0, hh, body, 0)

    def run_pass1(m, a, b):
        return pl.pallas_call(
            pass1_kernel,
            out_shape=jax.ShapeDtypeStruct((hh, cc, ww), m.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(m, a, b)

    m = jnp.asarray(rng.normal(size=(hh, cc, ww)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(1, ww)).astype(np.float32))
    b = jnp.asarray((rng.uniform(0, ww - 1, size=(1, ww))).astype(np.float32))
    timed("pallas pass1-style [64,32,80] f32", run_pass1, m, a, b)

    # ---- vectorized pass-1: flatten (h, C) onto sublanes, ONE gather ------
    # per tap instead of a 64-iteration fori_loop (the loop body costs
    # ~5 us/iter; vectorized it's 2 gathers of [h*C, w] = 256 vregs)
    def pass1v_kernel(m_ref, a_ref, b_ref, j_ref):
        hrow = jax.lax.broadcasted_iota(
            jnp.int32, (hh, 1, ww), 0).astype(jnp.float32)  # h per row
        xq = a_ref[:][None] * hrow * 0.02 + b_ref[:][None]  # [h, 1, w]
        x0 = jnp.floor(xq)
        f = xq - x0
        x0i = jnp.clip(x0.astype(jnp.int32), 0, ww - 2)
        idx = jnp.broadcast_to(x0i, (hh, cc, ww)).reshape(hh * cc, ww)
        src = m_ref[:].reshape(hh * cc, ww)
        g0 = jnp.take_along_axis(src, idx, axis=1)
        g1 = jnp.take_along_axis(src, idx + 1, axis=1)
        fb = jnp.broadcast_to(f, (hh, cc, ww)).reshape(hh * cc, ww)
        j_ref[:] = (g0 * (1.0 - fb) + g1 * fb).reshape(hh, cc, ww)

    def run_pass1v(m, a, b):
        return pl.pallas_call(
            pass1v_kernel,
            out_shape=jax.ShapeDtypeStruct((hh, cc, ww), m.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(m, a, b)

    timed("pallas pass1-vectorized f32", run_pass1v, m, a, b)

    # grid version: 64 planes per call (the real K2 shape: one grid step
    # per plane, same block each)
    def pass1v_kernel_g(m_ref, a_ref, b_ref, j_ref):
        hrow = jax.lax.broadcasted_iota(
            jnp.int32, (hh, 1, ww), 0).astype(jnp.float32)
        xq = a_ref[:][None] * hrow * 0.02 + b_ref[:][None]
        x0 = jnp.floor(xq)
        f = xq - x0
        x0i = jnp.clip(x0.astype(jnp.int32), 0, ww - 2)
        idx = jnp.broadcast_to(x0i, (hh, cc, ww)).reshape(hh * cc, ww)
        src = m_ref[0].reshape(hh * cc, ww)
        g0 = jnp.take_along_axis(src, idx, axis=1)
        g1 = jnp.take_along_axis(src, idx + 1, axis=1)
        fb = jnp.broadcast_to(f, (hh, cc, ww)).reshape(hh * cc, ww)
        j_ref[0] = (g0 * (1.0 - fb) + g1 * fb).reshape(hh, cc, ww)

    def run_pass1v_grid2(mp, a, b):
        return pl.pallas_call(
            pass1v_kernel_g,
            out_shape=jax.ShapeDtypeStruct((64, hh, cc, ww), mp.dtype),
            grid=(64,),
            in_specs=[
                pl.BlockSpec((1, hh, cc, ww), lambda p: (p, 0, 0, 0)),
                pl.BlockSpec((1, ww), lambda p: (0, 0)),
                pl.BlockSpec((1, ww), lambda p: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, hh, cc, ww), lambda p: (p, 0, 0, 0)),
        )(mp, a, b)

    mp = jnp.asarray(rng.normal(size=(64, hh, cc, ww)).astype(np.float32))
    timed("pallas pass1-grid64 (full warp) f32", run_pass1v_grid2, mp, a, b)

    # ---- bf16-PAIR packing probe: int32 lane gather + in-kernel bitcast ---
    # Mosaic rejects bf16 dynamic_gather, but bf16 is the TOP HALF of f32:
    # pack two bf16 channels into one int32 lane outside the kernel
    # (lax.bitcast_convert_type of a [..., 2] bf16 pair), gather int32,
    # unpack in-kernel with shift + same-width bitcast, lerp in f32, repack
    # with round-to-nearest-even integer math. Halves every warp kernel's
    # HBM traffic IF Mosaic accepts (a) int32 dynamic_gather and
    # (b) in-kernel i32<->f32 bitcasts. This probe tests exactly that.
    def packed_gather_kernel(src_ref, idx_ref, f_ref, out_ref):
        g0 = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=-1)
        g1 = jnp.take_along_axis(src_ref[:], idx_ref[:] + 1, axis=-1)
        f = f_ref[:]

        def unpack(g):
            lo = pltpu.bitcast(g << 16, jnp.float32)
            hi = pltpu.bitcast(g & jnp.int32(-65536), jnp.float32)
            return lo, hi

        def rne16(x):  # f32 -> bf16 bits in the TOP half, RNE
            bits = pltpu.bitcast(x, jnp.int32)
            lsb = jax.lax.shift_right_logical(bits, 16) & 1
            return (bits + 0x7FFF + lsb) & jnp.int32(-65536)

        a0, b0 = unpack(g0)
        a1, b1 = unpack(g1)
        ra = a0 * (1.0 - f) + a1 * f
        rb = b0 * (1.0 - f) + b1 * f
        out_ref[:] = jax.lax.shift_right_logical(rne16(ra), 16) | rne16(rb)

    def run_packed(src32, idx, f):
        return pl.pallas_call(
            packed_gather_kernel,
            out_shape=jax.ShapeDtypeStruct(src32.shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src32, idx, f)

    s, l = 5120, 64
    vals = rng.normal(size=(s, l, 2)).astype(np.float32)
    src_bf = jnp.asarray(vals).astype(jnp.bfloat16)  # [S, L, 2] ch pair
    # pack: [S, L, 2] bf16 -> [S, L] int32 (lo half = ch0, hi half = ch1)
    src32 = jax.lax.bitcast_convert_type(src_bf, jnp.int32)
    idx = jnp.asarray(rng.integers(0, l - 1, size=(s, l)).astype(np.int32))
    f = jnp.asarray(rng.uniform(0, 1, size=(s, l)).astype(np.float32))

    dt_packed = timed(f"pallas PACKED bf16-pair [{s},{l}]", run_packed,
                      src32, idx, f)
    if dt_packed is not None:
        # correctness vs the f32 reference lerp, bf16-rounded
        out32 = run_packed(src32, idx, f)
        out_bf = jax.lax.bitcast_convert_type(out32, jnp.bfloat16)
        ref = np.asarray(src_bf, np.float32)
        i = np.asarray(idx)
        fn = np.asarray(f)
        rows = np.arange(s)[:, None]
        g0 = ref[rows, i]          # [S, L, 2]
        g1 = ref[rows, i + 1]
        want = g0 * (1 - fn[..., None]) + g1 * fn[..., None]
        got = np.asarray(out_bf, np.float32)
        # out32 lo half = ch0 -> bitcast [S, L, 2] maps ch0 to [..., 0]
        err = np.abs(got - want.astype(np.float32))
        rel = err / (np.abs(want) + 1e-3)
        print(f"  packed-gather correctness: max abs err "
              f"{err.max():.5f}, max rel {rel.max():.5f} "
              f"(bf16 ulp ~ 0.0078 rel)")

    # matched-shape f32 comparison: TWO unpacked gathers over the same
    # logical data (what the packed kernel replaces)
    def two_gather_kernel(s_ref, i_ref, f_ref, o_ref):
        g0 = jnp.take_along_axis(s_ref[:], i_ref[:], axis=-1)
        g1 = jnp.take_along_axis(s_ref[:], i_ref[:] + 1, axis=-1)
        o_ref[:] = g0 * (1.0 - f_ref[:]) + g1 * f_ref[:]

    def run_two(srcf, idx, f):
        return pl.pallas_call(
            two_gather_kernel,
            out_shape=jax.ShapeDtypeStruct(srcf.shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(srcf, idx, f)

    srcf2 = jnp.asarray(vals[..., 0])  # one f32 channel, same [S, L]
    timed(f"pallas f32 single-ch  [{s},{l}]", run_two, srcf2, idx, f)


if __name__ == "__main__":
    main()
