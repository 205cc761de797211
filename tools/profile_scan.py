#!/usr/bin/env python
"""Scan-amortized DEVICE-time decomposition of the flagship window step.

tools/profile_step.py times components one launch at a time, so every number
carries this environment's ~30 ms dispatch+fetch RPC floor — fine for
ranking, useless for absolute attribution. This tool instead runs each
component N times inside ONE compiled `lax.scan` program over N DISTINCT
on-device inputs and fetches a scalar reduction once: the launch floor
amortizes to ~floor/N and what remains is honest per-iteration device time.

Anti-elision hygiene (CLAUDE.md): inputs are freshly generated device
buffers per repetition (the relay elides repeated identical launches), and
the timed region ends with a device->host fetch of the carry (the only
thing that forces execution through this relay). A `control` program with a
trivial body measures the residual launch+fetch floor, which is subtracted.

Usage: python tools/profile_scan.py [--n 10] [--reps 2] [--only a,b,c]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from estdepth_tpu.utils.platform import (  # noqa: E402
    apply_platform_env, enable_compilation_cache,
)

apply_platform_env()
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10,
                    help="scan iterations per program")
    ap.add_argument("--reps", type=int, default=2,
                    help="timed repetitions (plus one untimed compile rep)")
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated component names")
    ap.add_argument("--grads", action="store_true",
                    help="also run the train-backward decomposition probes")
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--ndepths", type=int, default=64)
    args = ap.parse_args()

    from flax import linen as nn

    from estdepth_tpu.models.decoder import ConvBNRelu3D, StereoHead
    from estdepth_tpu.models.layers import ConvBN
    from estdepth_tpu.models.psm import PSMFeatureNet
    from estdepth_tpu.models.resnet import ResNetEncoder
    from estdepth_tpu.ops.packed_conv import lane_packed_conv3d
    from estdepth_tpu.ops.sampling import trilinear_sample_stacked
    from estdepth_tpu.ops.warp import frustum_warp, plane_sweep_warp

    h, w, nd = args.height, args.width, args.ndepths
    hq, wq = h // 4, w // 4
    dt = jnp.bfloat16
    n = args.n
    only = set(args.only.split(",")) if args.only else None
    results = {}

    def measure(name, shapes, fn, dtypes=None):
        """Time fn(*xs) executed n times inside one lax.scan program.

        shapes: per-argument shapes WITHOUT the leading scan axis; the i-th
        scan iteration sees an independent random tensor per argument.
        """
        if only is not None and name != "control" and name not in only:
            return
        dts = dtypes or [dt] * len(shapes)

        @jax.jit
        def gen(key):
            keys = jax.random.split(key, len(shapes))
            return tuple(
                (
                    jax.random.normal(k, (n,) + s, jnp.float32) * 0.5
                ).astype(d)
                for k, s, d in zip(keys, shapes, dts)
            )

        @jax.jit
        def prog(xs):
            def body(c, x):
                out = fn(*x)
                red = sum(
                    jnp.sum(jnp.abs(l.astype(jnp.float32)))
                    for l in jax.tree_util.tree_leaves(out)
                )
                return c + red, None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
            return c

        times = []
        for rep in range(args.reps + 1):
            # crc32, not hash(): builtin str hashing is randomized per
            # interpreter run, which made profile inputs non-reproducible
            xs = gen(jax.random.key(
                100 * rep + zlib.crc32(name.encode()) % 97
            ))
            jax.block_until_ready(xs)
            t0 = time.perf_counter()
            float(prog(xs))  # fetch forces execution
            dt_s = time.perf_counter() - t0
            if rep > 0:  # rep 0 pays compilation
                times.append(dt_s)
        total = min(times)
        floor = results.get("control", (0.0, 0.0))[1] * 1e-3
        per = (total - floor) / n * 1e3
        results[name] = (per, total * 1e3)
        print(f"{name:26s} {per:9.2f} ms/iter   (launch {total*1e3:8.1f} ms)",
              flush=True)

    # ---- launch+fetch floor ------------------------------------------------
    measure("control", [(8, 128)], lambda x: x * 1.0001,
            dtypes=[jnp.float32])
    if "control" in results:
        # control's per-iter is ~0; its launch time IS the floor
        results["control"] = (0.0, results["control"][1])
        print(f"{'(floor subtracted below)':26s} {results['control'][1]:9.1f} ms")

    rng = np.random.default_rng(0)

    def init_mod(mod, *shapes, method=None):
        xs = [jnp.asarray(rng.normal(size=s).astype(np.float32)).astype(dt)
              for s in shapes]
        kw = {"method": method} if method else {}
        v = jax.jit(
            lambda k: mod.init(k, *xs, **kw), static_argnums=()
        )(jax.random.key(0))
        return v

    # ---- 2D encoders -------------------------------------------------------
    psm = PSMFeatureNet(dtype=dt)
    psm_v = init_mod(psm, (1, h, w, 3))
    measure("psm_1frame", [(1, h, w, 3)],
            lambda x: psm.apply(psm_v, x, False))

    res = ResNetEncoder(50, dtype=dt)
    res_v = init_mod(res, (1, h, w, 3))
    measure("resnet50_1frame", [(1, h, w, 3)],
            lambda x: res.apply(res_v, x))

    # ---- cost-volume pre stack (pair-folded batch: 2 neighbors x 1 target)
    pre0 = ConvBN(32, (1, 1, 1), 1, padding=0, dtype=dt)
    pre1 = ConvBN(32, (3, 3, 3), 1, act="relu", dtype=dt)
    pre2 = ConvBN(32, (3, 3, 3), 1, dtype=dt)
    pv0 = init_mod(pre0, (2, nd, hq, wq, 64))
    pv1 = init_mod(pre1, (2, nd, hq, wq, 32))
    pv2 = init_mod(pre2, (2, nd, hq, wq, 32))

    def prestack(x):
        y = pre0.apply(pv0, x, False)
        return y + pre2.apply(pv2, pre1.apply(pv1, y, False), False)

    measure("prestack_2x", [(2, nd, hq, wq, 64)], prestack)

    # ---- dres chain + dres2 + key/value + stereo heads ---------------------
    c32 = ConvBNRelu3D(32, dtype=dt)
    c32v = init_mod(c32, (1, nd, hq, wq, 32))

    def dres_chain(x):
        for _ in range(4):  # dres0_0/0_1/1_0/1_1 (identical shape)
            x = c32.apply(c32v, x, False)
        return x

    measure("dres_chain_x4", [(1, nd, hq, wq, 32)], dres_chain)

    c33 = ConvBNRelu3D(33, dtype=dt)
    c33v = init_mod(c33, (1, nd, hq, wq, 33))
    kv16 = ConvBNRelu3D(16, dtype=dt)
    kv16v = init_mod(kv16, (1, nd, hq, wq, 33))
    head = StereoHead(16, dtype=dt)
    headv = init_mod(head, (1, nd, hq, wq, 16))
    kv16vb = jax.tree.map(lambda a: a * 1.003, kv16v)

    def tail3d(x):
        x = c33.apply(c33v, x, False)                    # dres2
        key = kv16.apply(kv16v, x, False)
        # value_layer with DISTINCT weights — identical params would be
        # CSE'd into one conv and under-measure the stage
        val = kv16.apply(kv16vb, x, False)
        return head.apply(headv, val, False), key

    measure("dres2_kv_head0", [(1, nd, hq, wq, 33)], tail3d)

    # ---- the same conv stages under as2d execution (the round-4 default) --
    # identical parameter trees, so the modules reuse the vars init'd above
    pre0a = ConvBN(32, (1, 1, 1), 1, padding=0, dtype=dt, conv3d_as2d=True)
    pre1a = ConvBN(32, (3, 3, 3), 1, act="relu", dtype=dt, conv3d_as2d=True)
    pre2a = ConvBN(32, (3, 3, 3), 1, dtype=dt, conv3d_as2d=True)

    def prestack_as2d(x):
        y = pre0a.apply(pv0, x, False)
        return y + pre2a.apply(pv2, pre1a.apply(pv1, y, False), False)

    measure("prestack_as2d_2x", [(2, nd, hq, wq, 64)], prestack_as2d)

    # round-5 bisection: prestack runs at ~half the standalone-conv rate
    # (4.75 ms vs ~2.4 at conv32to32_3d's 30 TFLOP/s). Which part?
    def pre_residual(y):
        return y + pre2.apply(pv2, pre1.apply(pv1, y, False), False)

    measure("prestack_residual_2x", [(2, nd, hq, wq, 32)], pre_residual)

    # pre0 with the concat UNMATERIALIZED: cat[ref, warped] @ W ==
    # ref @ W[:32] + warped @ W[32:] for a k1 conv — the model-side
    # rewrite candidate if the split form wins
    # raw conv split only (BN is a channelwise epilogue, identical cost)
    w0 = pv0["params"]["conv"]["kernel"].astype(dt)  # [1,1,1,64,32]

    def pre0_split(ref, wrp):
        a = jax.lax.conv_general_dilated(
            ref, w0[..., :32, :], (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)
        b = jax.lax.conv_general_dilated(
            wrp, w0[..., 32:, :], (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)
        return (a + b).astype(dt)

    measure("pre0_split_2x", [(2, nd, hq, wq, 32), (2, nd, hq, wq, 32)],
            pre0_split)

    c32a = ConvBNRelu3D(32, dtype=dt, conv3d_as2d=True)

    def dres_chain_as2d(x):
        for _ in range(4):
            x = c32a.apply(c32v, x, False)
        return x

    measure("dres_chain_as2d_x4", [(1, nd, hq, wq, 32)], dres_chain_as2d)

    c33a = ConvBNRelu3D(33, dtype=dt, conv3d_as2d=True)
    kv16a = ConvBNRelu3D(16, dtype=dt, conv3d_as2d=True)
    heada = StereoHead(16, dtype=dt, conv3d_as2d=True)

    def tail3d_as2d(x):
        x = c33a.apply(c33v, x, False)
        key = kv16a.apply(kv16v, x, False)
        val = kv16a.apply(kv16vb, x, False)
        return heada.apply(headv, val, False), key

    measure("dres2_kv_head0_as2d", [(1, nd, hq, wq, 33)], tail3d_as2d)

    # finer attribution of the prestack as2d regression: which layer?
    measure("pre0_1x1_3d", [(2, nd, hq, wq, 64)],
            lambda x: pre0.apply(pv0, x, False))
    measure("pre0_1x1_as2d", [(2, nd, hq, wq, 64)],
            lambda x: pre0a.apply(pv0, x, False))
    measure("pre1_3x3_3d", [(2, nd, hq, wq, 32)],
            lambda x: pre1.apply(pv1, x, False))
    measure("pre1_3x3_as2d", [(2, nd, hq, wq, 32)],
            lambda x: pre1a.apply(pv1, x, False))

    # ---- dres2 channel-pad tax probe: does C=33 cost more than C=32? ------
    # (round-4 VERDICT #4: "whether the 33-channel dres2 pays a pad tax")
    c33b = ConvBNRelu3D(33, dtype=dt)
    c33bv = init_mod(c33b, (1, nd, hq, wq, 33))
    c32b = ConvBNRelu3D(32, dtype=dt)
    c32bv = init_mod(c32b, (1, nd, hq, wq, 32))
    c40b = ConvBNRelu3D(40, dtype=dt)
    c40bv = init_mod(c40b, (1, nd, hq, wq, 40))
    measure("conv33to33_3d", [(1, nd, hq, wq, 33)],
            lambda x: c33b.apply(c33bv, x, False))
    measure("conv32to32_3d", [(1, nd, hq, wq, 32)],
            lambda x: c32b.apply(c32bv, x, False))
    measure("conv40to40_3d", [(1, nd, hq, wq, 40)],
            lambda x: c40b.apply(c40bv, x, False))
    c33c = ConvBNRelu3D(33, dtype=dt, conv3d_as2d=True)
    c32c = ConvBNRelu3D(32, dtype=dt, conv3d_as2d=True)
    c40c = ConvBNRelu3D(40, dtype=dt, conv3d_as2d=True)
    measure("conv33to33_as2d", [(1, nd, hq, wq, 33)],
            lambda x: c33c.apply(c33bv, x, False))
    measure("conv32to32_as2d", [(1, nd, hq, wq, 32)],
            lambda x: c32c.apply(c32bv, x, False))
    measure("conv40to40_as2d", [(1, nd, hq, wq, 40)],
            lambda x: c40c.apply(c40bv, x, False))

    # ---- EST fusion pieces -------------------------------------------------
    intr_q = jnp.asarray(
        [[72.2, 0.0, (wq - 1) / 2], [0.0, 72.2, (hq - 1) / 2],
         [0.0, 0.0, 1.0]], jnp.float32)
    dvals = (jnp.arange(nd, dtype=jnp.float32) * (10.0 / (nd - 1)) + 0.01)

    def frustum2(v, e):
        rel = jnp.tile(jnp.eye(4)[None], (2, 1, 1)).at[:, 0, 3].add(
            0.05 + 0.01 * e.astype(jnp.float32))
        return frustum_warp(
            v, rel, jnp.tile(intr_q[None], (2, 1, 1)),
            jnp.tile(dvals[None], (2, 1)), 0.01, 10.0 / (nd - 1),
        )

    measure("frustum_warp_x2", [(2, nd, hq, wq, 32), (2,)], frustum2,
            dtypes=[dt, jnp.float32])

    def frustum2_planemix(v, e):
        rel = jnp.tile(jnp.eye(4)[None], (2, 1, 1)).at[:, 0, 3].add(
            0.05 + 0.01 * e.astype(jnp.float32))
        return frustum_warp(
            v, rel, jnp.tile(intr_q[None], (2, 1, 1)),
            jnp.tile(dvals[None], (2, 1)), 0.01, 10.0 / (nd - 1),
            mode="plane_mix",
        )

    measure("frustum_planemix_x2", [(2, nd, hq, wq, 32), (2,)],
            frustum2_planemix, dtypes=[dt, jnp.float32])

    # gather formulated WITHOUT operand_batching_dims (batch folded into
    # global row indices) — isolates whether the batched-gather lowering
    # is the slow part
    def sample_flat(v, coords):
        from estdepth_tpu.ops.sampling import _shift1
        b2, d2, h2, w2, c2 = v.shape
        sx = _shift1(v, 3)
        vy = [v, sx, _shift1(v, 2), _shift1(sx, 2)]
        stacked = jnp.concatenate(
            vy + [_shift1(q, 1) for q in vy], axis=-1
        ).reshape(b2 * d2 * h2 * w2, 8 * c2)
        x = jnp.clip((coords[..., 0] * 0.5 + 0.5) * (w2 - 1), 0, w2 - 2)
        y = jnp.clip((coords[..., 1] * 0.5 + 0.5) * (h2 - 1), 0, h2 - 2)
        z = jnp.clip((coords[..., 2] * 0.5 + 0.5) * (d2 - 1), 0, d2 - 2)
        bi = jnp.arange(b2, dtype=jnp.int32)[:, None]
        rows = (
            ((bi * d2 + z.astype(jnp.int32)) * h2 + y.astype(jnp.int32))
            * w2 + x.astype(jnp.int32)
        ).reshape(-1)
        return jnp.take(stacked, rows, axis=0, mode="clip")  # [B*N, 8C]

    measure("sampler_flat_x2", [(2, nd, hq, wq, 32), (2, nd * hq * wq, 3)],
            sample_flat, dtypes=[dt, jnp.float32])

    # stacked-build alone (the 8C corner concat the sampler constructs)
    def stackbuild(v):
        from estdepth_tpu.ops.sampling import _shift1
        sx = _shift1(v, 3)
        vy = [v, sx, _shift1(v, 2), _shift1(sx, 2)]
        return jnp.concatenate(vy + [_shift1(q, 1) for q in vy], axis=-1)

    measure("stackbuild_x2", [(2, nd, hq, wq, 32)], stackbuild)

    # gather at fixed random coords (index math + gather, no warp algebra)
    def sample_only(v, coords):
        x = (coords[..., 0] * 0.5 + 0.5) * (wq - 1)
        y = (coords[..., 1] * 0.5 + 0.5) * (hq - 1)
        z = (coords[..., 2] * 0.5 + 0.5) * (nd - 1)
        return trilinear_sample_stacked(v, x, y, z)

    measure("sampler_x2", [(2, nd, hq, wq, 32), (2, nd * hq * wq, 3)],
            sample_only, dtypes=[dt, jnp.float32])

    # attention math (2 neighbors, streaming shape)
    def attn(tk, wk, wv):
        corr = jnp.sum(tk[None] * wk, axis=-1)
        a = jax.nn.softmax(corr.astype(jnp.float32), axis=0)
        return jnp.sum(wv * a[..., None].astype(wv.dtype), axis=0) / 2.0

    measure("est_attention", [(1, nd, hq, wq, 16), (2, 1, nd, hq, wq, 16),
                              (2, 1, nd, hq, wq, 16)], attn)

    # ConvGRU + stereo_head1
    gate = nn.Conv(32, (3, 3, 3), padding=[(1, 1)] * 3, dtype=dt)
    gv = init_mod(gate, (1, nd, hq, wq, 32))
    outc = nn.Conv(16, (3, 3, 3), padding=[(1, 1)] * 3, dtype=dt)
    ov = init_mod(outc, (1, nd, hq, wq, 32))

    def gru_head1(x, hh):
        xh = jnp.concatenate([x, hh], axis=-1)
        g = gate.apply(gv, xh)
        r, u = jax.nn.sigmoid(g[..., :16]), jax.nn.sigmoid(g[..., 16:])
        o = outc.apply(ov, jnp.concatenate([x, r * hh], axis=-1))
        y = jnp.tanh(o)
        fused = u * hh + (1 - u) * y
        return head.apply(headv, fused, False)

    measure("gru_head1", [(1, nd, hq, wq, 16), (1, nd, hq, wq, 16)],
            gru_head1)

    # the shipped default runs these convs as2d (est_transformer.py:90);
    # identical parameter trees, so the as2d modules reuse gv/ov/headv
    from estdepth_tpu.models.layers import Decomp3DConv
    gate_a = Decomp3DConv(32, (3, 3, 3), use_bias=True, dtype=dt)
    outc_a = Decomp3DConv(16, (3, 3, 3), use_bias=True, dtype=dt)

    def gru_head1_as2d(x, hh):
        xh = jnp.concatenate([x, hh], axis=-1)
        g = gate_a.apply(gv, xh)
        r, u = jax.nn.sigmoid(g[..., :16]), jax.nn.sigmoid(g[..., 16:])
        o = outc_a.apply(ov, jnp.concatenate([x, r * hh], axis=-1))
        y = jnp.tanh(o)
        fused = u * hh + (1 - u) * y
        return heada.apply(headv, fused, False)

    measure("gru_head1_as2d", [(1, nd, hq, wq, 16), (1, nd, hq, wq, 16)],
            gru_head1_as2d)

    # ---- plane-sweep side --------------------------------------------------
    def psweep(f, e):
        proj = jnp.tile(jnp.eye(4)[None], (2, 1, 1)).at[:, 0, 3].add(
            0.05 + 0.01 * e.astype(jnp.float32))
        return plane_sweep_warp(
            f, proj, jnp.tile(jnp.eye(4)[None], (2, 1, 1)),
            jnp.tile(dvals[None], (2, 1)),
        )

    measure("plane_sweep_x2", [(2, hq, wq, 32), (2,)], psweep,
            dtypes=[dt, jnp.float32])

    # ---- softargmin + 2D refinement ---------------------------------------
    def softarg(logits):
        p = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
        return jnp.einsum("ndhw,d->nhw", p, dvals), jnp.max(p, axis=1)

    measure("softargmin_x2", [(2, nd, hq, wq)], softarg,
            dtypes=[jnp.float32])

    # layout A/B (round-5): same math on [N, D, H*W] — the (8,128) tiling
    # pads W=80 to 128 lanes in the 4D form (1.6x), while the flattened
    # form fills every lane and reduces over D on the sublane axis
    def softarg_flat(logits):
        lf = logits.reshape(logits.shape[0], nd, hq * wq)
        p = jax.nn.softmax(lf.astype(jnp.float32), axis=1)
        d = jnp.einsum("nds,d->ns", p, dvals)
        pk = jnp.max(p, axis=1)
        return d.reshape(-1, hq, wq), pk.reshape(-1, hq, wq)

    measure("softargmin_flat_x2", [(2, nd, hq, wq)], softarg_flat,
            dtypes=[jnp.float32])

    # head0 + softargmin composed, both layouts — prices headroom #5 (the
    # D-axis logits round-trip between the head and the softmax)
    def head0_softarg(v):
        logits = head.apply(headv, v, False)
        return softarg(logits)

    measure("head0_softargmin", [(1, nd, hq, wq, 16)], head0_softarg)

    def head0_softarg_flat(v):
        logits = head.apply(headv, v, False)
        return softarg_flat(logits)

    measure("head0_softargmin_flat", [(1, nd, hq, wq, 16)],
            head0_softarg_flat)

    up10 = ConvBN(32, 3, 1, act="relu", dtype=dt)
    u10v = init_mod(up10, (1, hq, wq, 128))
    up11 = ConvBN(32, 3, 1, act="relu", dtype=dt)
    u11v = init_mod(up11, (1, h // 2, w // 2, 96))
    up00 = ConvBN(16, 3, 1, act="relu", dtype=dt)
    u00v = init_mod(up00, (1, h // 2, w // 2, 32))
    up01 = ConvBN(16, 3, 1, act="relu", dtype=dt)
    u01v = init_mod(up01, (1, h, w, 16))
    disp = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2, dtype=dt)
    dv1 = init_mod(disp, (1, h // 2, w // 2, 32))

    def refine(sem_logits, skip0):
        from estdepth_tpu.models.layers import upsample_nearest
        x = up10.apply(u10v, sem_logits, False)
        x = jnp.concatenate([upsample_nearest(x), skip0], axis=-1)
        x = up11.apply(u11v, x, False)
        d1 = jax.nn.sigmoid(disp.apply(dv1, x).astype(jnp.float32))
        x = up00.apply(u00v, x, False)
        x = upsample_nearest(x)
        x = up01.apply(u01v, x, False)
        return d1, x

    measure("refine_2d", [(1, hq, wq, 128), (1, h // 2, w // 2, 64)], refine)

    # ---- frustum warp at the TRUE streaming multiplicity -------------------
    # Steady-state streaming fuses 4 neighbors per target (2 in-window +
    # memory_size=2), each a K/V-concatenated 2C=32 volume — the x2
    # measurements above undercount the step's warp term by half.
    def frustum4(v, e):
        rel = jnp.tile(jnp.eye(4)[None], (4, 1, 1)).at[:, 0, 3].add(
            0.05 + 0.01 * e.astype(jnp.float32))
        return frustum_warp(
            v, rel, jnp.tile(intr_q[None], (4, 1, 1)),
            jnp.tile(dvals[None], (4, 1)), 0.01, 10.0 / (nd - 1),
        )

    measure("frustum_warp_x4", [(4, nd, hq, wq, 32), (4,)], frustum4,
            dtypes=[dt, jnp.float32])

    def frustum4_planemix(v, e):
        rel = jnp.tile(jnp.eye(4)[None], (4, 1, 1)).at[:, 0, 3].add(
            0.05 + 0.01 * e.astype(jnp.float32))
        return frustum_warp(
            v, rel, jnp.tile(intr_q[None], (4, 1, 1)),
            jnp.tile(dvals[None], (4, 1)), 0.01, 10.0 / (nd - 1),
            mode="plane_mix",
        )

    measure("frustum_planemix_x4", [(4, nd, hq, wq, 32), (4,)],
            frustum4_planemix, dtypes=[dt, jnp.float32])

    # ---- Pallas lane-gather warps (ops/pallas/plane_warp.py) ---------------
    def frustum2_pallas(v, e):
        rel = jnp.tile(jnp.eye(4)[None], (2, 1, 1)).at[:, 0, 3].add(
            0.05 + 0.01 * e.astype(jnp.float32))
        return frustum_warp(
            v, rel, jnp.tile(intr_q[None], (2, 1, 1)),
            jnp.tile(dvals[None], (2, 1)), 0.01, 10.0 / (nd - 1),
            mode="plane_mix_pallas",
        )

    measure("frustum_pallas_x2", [(2, nd, hq, wq, 32), (2,)],
            frustum2_pallas, dtypes=[dt, jnp.float32])

    def psweep_pallas(f, e):
        proj = jnp.tile(jnp.eye(4)[None], (2, 1, 1)).at[:, 0, 3].add(
            0.05 + 0.01 * e.astype(jnp.float32))
        return plane_sweep_warp(
            f, proj, jnp.tile(jnp.eye(4)[None], (2, 1, 1)),
            jnp.tile(dvals[None], (2, 1)), backend="pallas",
        )

    measure("plane_sweep_pallas_x2", [(2, hq, wq, 32), (2,)], psweep_pallas,
            dtypes=[dt, jnp.float32])

    def frustum4_pallas(v, e):
        # the TRUE steady-state streaming multiplicity (2 in-window + 2
        # memory neighbors), for residual attribution of full_step_pallas
        rel = jnp.tile(jnp.eye(4)[None], (4, 1, 1)).at[:, 0, 3].add(
            0.05 + 0.01 * e.astype(jnp.float32))
        return frustum_warp(
            v, rel, jnp.tile(intr_q[None], (4, 1, 1)),
            jnp.tile(dvals[None], (4, 1)), 0.01, 10.0 / (nd - 1),
            mode="plane_mix_pallas",
        )

    measure("frustum_pallas_x4", [(4, nd, hq, wq, 32), (4,)],
            frustum4_pallas, dtypes=[dt, jnp.float32])

    def frustum4_pallas_exact_z(v, e):
        # the parity-fast pick: Pallas two-pass + slope-carry exact-z
        # correction (ops/pallas/plane_warp_exact_z.py)
        rel = jnp.tile(jnp.eye(4)[None], (4, 1, 1)).at[:, 0, 3].add(
            0.05 + 0.01 * e.astype(jnp.float32))
        return frustum_warp(
            v, rel, jnp.tile(intr_q[None], (4, 1, 1)),
            jnp.tile(dvals[None], (4, 1)), 0.01, 10.0 / (nd - 1),
            mode="plane_mix_pallas_exact_z",
        )

    measure("frustum_pallas_exact_z_x4", [(4, nd, hq, wq, 32), (4,)],
            frustum4_pallas_exact_z, dtypes=[dt, jnp.float32])

    def frustum4_pallas_ez_packed(v, e):
        # the SHIPPED warp since the round-4 snapshot: exact-z with the
        # (A, s) pair packed as origin-shifted bf16 halves of one int32
        # lane — plain plane-mix kernel traffic
        rel = jnp.tile(jnp.eye(4)[None], (4, 1, 1)).at[:, 0, 3].add(
            0.05 + 0.01 * e.astype(jnp.float32))
        return frustum_warp(
            v, rel, jnp.tile(intr_q[None], (4, 1, 1)),
            jnp.tile(dvals[None], (4, 1)), 0.01, 10.0 / (nd - 1),
            mode="plane_mix_pallas_exact_z_packed",
        )

    measure("frustum_pallas_ez_packed_x4", [(4, nd, hq, wq, 32), (4,)],
            frustum4_pallas_ez_packed, dtypes=[dt, jnp.float32])

    # ---- FULL window step (what bench's scan mode actually runs) -----------
    # The component sum has never matched the end-to-end window; this
    # measures the whole flagship streaming step — compute_matching on the
    # one new frame + full model.apply with 4-neighbor EST fusion + memory
    # push — inside the same scan-amortized harness, so (full_step - sum of
    # parts) is the honest unattributed residual.
    from estdepth_tpu.models import DepthNetHybrid, ESTMemory

    _full_names = {
        "full_step", "full_step_no_as2d", "full_step_planemix",
        "full_step_pallas", "full_step_pallas_as2d",
        "full_step_pallas_exact_z", "full_step_shipped",
        "cost_volumes_full", "decoder_full", "decoder_full_planemix",
        "decoder_full_pallas", "decoder_full_pallas_as2d",
        "semantic_unet", "resnet_in_model",
    }
    if only is None or _full_names & only:
        model = DepthNetHybrid(
            ndepths=nd, depth_min=0.01, depth_max=10.0, resnet=50,
            est_transformer=True, dtype=dt,
        )
        model_fast = model.clone(fast_frustum=True)
        pz = jnp.asarray(rng.normal(size=(1, 3, 4, 4)).astype(np.float32))
        iz = jnp.asarray(rng.normal(size=(1, 3, h, w, 3)).astype(np.float32))
        kz = jnp.asarray(
            [[72.2 * 4, 0.0, (w - 1) / 2], [0.0, 72.2 * 4, (h - 1) / 2],
             [0.0, 0.0, 1.0]], jnp.float32)[None]
        ez = jnp.tile(jnp.eye(4)[None, None], (1, 3, 1, 1))
        variables = jax.jit(
            lambda r, i, p, k: model.init(r, i, p, k, train=False)
        )(jax.random.key(0), iz, ez, kz)

        def full_step(mdl, imgs, twist, feats2, memkv):
            # near-identity window poses from the per-iteration twist (the
            # gather pattern only needs plausible in-bounds coordinates)
            poses = jnp.tile(jnp.eye(4)[None, None], (1, 3, 1, 1))
            poses = poses.at[0, :, :3, 3].set(0.08 * twist)
            mem = ESTMemory(
                keys=memkv[..., :16], values=memkv[..., 16:],
                poses=jnp.tile(jnp.eye(4)[None, None], (1, 2, 1, 1)),
                valid=jnp.ones((1, 2), jnp.bool_),
            )
            scaled = imgs * 40.0 + 128.0  # into the model's 0..255 domain
            new_feat = mdl.apply(
                variables, scaled[:, -1], method="compute_matching")
            feats = jnp.concatenate([feats2, new_feat[:, None]], 1)
            out, (key, val, pose) = mdl.apply(
                variables, scaled, poses, kz, memory=mem, use_est=True,
                train=False, matching_feats=feats,
            )
            return out["depth"][:, 0], mem.push(key, val, pose)

        full_shapes = [(1, 3, h, w, 3), (3, 3), (1, 2, hq, wq, 32),
                       (1, 2, nd, hq, wq, 32)]
        full_dts = [jnp.float32, jnp.float32, dt, dt]
        # NOTE: conv3d_as2d=True is the shipped default since round 4, so
        # every variant below runs as2d execution unless it says otherwise
        measure("full_step", full_shapes,
                lambda i, t, f, m: full_step(model, i, t, f, m),
                dtypes=full_dts)
        model_no_as2d = model.clone(conv3d_as2d=False)
        measure("full_step_no_as2d", full_shapes,
                lambda i, t, f, m: full_step(model_no_as2d, i, t, f, m),
                dtypes=full_dts)
        measure("full_step_planemix", full_shapes,
                lambda i, t, f, m: full_step(model_fast, i, t, f, m),
                dtypes=full_dts)
        model_pallas = model.clone(pallas_warp=True, conv3d_as2d=False)
        measure("full_step_pallas", full_shapes,
                lambda i, t, f, m: full_step(model_pallas, i, t, f, m),
                dtypes=full_dts)
        # pallas warps + as2d: the fast offline-eval pick
        model_pallas_as2d = model.clone(pallas_warp=True)
        measure("full_step_pallas_as2d", full_shapes,
                lambda i, t, f, m: full_step(model_pallas_as2d, i, t, f, m),
                dtypes=full_dts)
        # + the slope-carry exact-z correction: the parity-fast pick
        model_pallas_ez = model.clone(pallas_warp=True, exact_z_warp=True)
        measure("full_step_pallas_exact_z", full_shapes,
                lambda i, t, f, m: full_step(model_pallas_ez, i, t, f, m),
                dtypes=full_dts)
        # + the packed bf16 tap/slope transport: the SHIPPED eval default
        model_shipped = model.clone(pallas_warp=True, exact_z_warp=True,
                                    packed_exact_z=True)
        measure("full_step_shipped", full_shapes,
                lambda i, t, f, m: full_step(model_shipped, i, t, f, m),
                dtypes=full_dts)

        # -- bisecting probes for (full_step - sum of parts) ----------------
        def cost_volumes_probe(feats, twist):
            poses = jnp.tile(jnp.eye(4)[None, None], (1, 3, 1, 1))
            poses = poses.at[0, :, :3, 3].set(0.08 * twist)
            kq = intr_q[None]
            dv = dvals[None]
            return model.apply(
                variables, feats, poses, kq, dv, False,
                method="_cost_volumes",
            )

        measure("cost_volumes_full", [(1, 3, hq, wq, 32), (3, 3)],
                cost_volumes_probe, dtypes=[dt, jnp.float32])

        def decoder_probe(mdl, cv, s4, s3, s2, s1, s0, twist, memkv):
            poses = jnp.tile(jnp.eye(4)[None, None], (1, 1, 1, 1))
            mem = ESTMemory(
                keys=memkv[..., :16], values=memkv[..., 16:],
                poses=jnp.tile(jnp.eye(4)[None, None], (1, 2, 1, 1)),
                valid=jnp.ones((1, 2), jnp.bool_),
            )
            return mdl.apply(
                variables, cv, [s0, s1, s2, s3, s4], poses, intr_q[None],
                dvals[None], 0.01, 10.0 / (nd - 1), mem, True, False,
                method=lambda m, *a: m.decoder(*a),
            )

        dec_shapes = [
            (1, 1, nd, hq, wq, 32),
            (1, h // 32, w // 32, 2048), (1, h // 16, w // 16, 1024),
            (1, h // 8, w // 8, 512), (1, hq, wq, 256),
            (1, h // 2, w // 2, 64),
            (3,), (1, 2, nd, hq, wq, 32),
        ]
        dec_dts = [dt] * 6 + [jnp.float32, dt]
        measure("decoder_full", dec_shapes,
                lambda *a: decoder_probe(model, *a), dtypes=dec_dts)
        measure("decoder_full_planemix", dec_shapes,
                lambda *a: decoder_probe(model_fast, *a), dtypes=dec_dts)
        # pallas-variant bisectors: attribute full_step_pallas's residual
        # (the decoder holds both warps, the 3D stacks, and the GRU)
        measure("decoder_full_pallas", dec_shapes,
                lambda *a: decoder_probe(model_pallas, *a), dtypes=dec_dts)
        measure("decoder_full_pallas_as2d", dec_shapes,
                lambda *a: decoder_probe(model_pallas_as2d, *a),
                dtypes=dec_dts)

        def unet_probe(s4, s3, s2, s1, s0):
            return model.apply(
                variables, [s0, s1, s2, s3, s4], False,
                method=lambda m, f, tr: m.decoder._semantic_unet(f, tr),
            )

        measure("semantic_unet", dec_shapes[1:6], unet_probe,
                dtypes=[dt] * 5)

        measure("resnet_in_model", [(1, h, w, 3)],
                lambda x: model.apply(
                    variables, x, False,
                    method=lambda m, i, tr: m.semantic_feature(i, tr)))

    # ---- train-backward decomposition (--grads) ----------------------------
    # The flagship train step (V=5, B=1, bf16) measures 700-820 ms but has
    # never been attributed per-op; ARCHITECTURE.md's "conv3d-backward
    # dominated" claim rests on OOM evidence, not timing. These probes time
    # forward+backward (d loss / d params AND d inputs — what the step's
    # backward computes) of each hot component at the TRAIN multiplicities:
    # V=5 window -> 3 targets, 6 (target, neighbor) pairs, 5 matching
    # frames, 3 semantic frames. Train-mode BN (batch statistics on the
    # fwd path, their reductions on the bwd path), like the real step.
    if args.grads:
        def sumabs(out):
            return sum(
                jnp.sum(jnp.abs(l.astype(jnp.float32)))
                for l in jax.tree_util.tree_leaves(out)
            )

        def gradify(apply_fn, params):
            """fn(*xs) computing d(sumabs(apply_fn(params, *xs)))/d(params,
            xs): weights ride the closure (constant across scan iterations,
            like the model's), inputs are fresh per iteration."""
            def fn(*xs):
                def loss(p, *ys):
                    return sumabs(apply_fn(p, *ys))
                return jax.grad(
                    loss, argnums=tuple(range(1 + len(xs)))
                )(params, *xs)
            return fn

        def train_apply(mod):
            # train-mode BN: batch stats on the forward, running-stat
            # updates discarded (they don't affect the loss)
            def ap(p, x):
                y, _ = mod.apply(p, x, True, mutable=["batch_stats"])
                return y
            return ap

        # encoders at their train frame counts
        measure("g_psm_5f", [(5, h, w, 3)],
                gradify(train_apply(psm), psm_v))
        measure("g_resnet50_3f", [(3, h, w, 3)],
                gradify(lambda p, x: res.apply(
                    p, x, True, mutable=["batch_stats"])[0], res_v))

        # cost-volume pre stack: 6 pair volumes (3 targets x 2 neighbors)
        def prestack_train(p, x):
            pv0_, pv1_, pv2_ = p
            y, _ = pre0.apply(pv0_, x, True, mutable=["batch_stats"])
            z, _ = pre1.apply(pv1_, y, True, mutable=["batch_stats"])
            z, _ = pre2.apply(pv2_, z, True, mutable=["batch_stats"])
            return y + z
        measure("g_prestack_x6", [(6, nd, hq, wq, 64)],
                gradify(prestack_train, (pv0, pv1, pv2)))

        # the as2d A/B at train multiplicity: the eval forward measured the
        # prestack FASTER native (4.13 vs 6.22 ms) while every other 3D
        # stage prefers as2d — decide the train-side default per stage
        def prestack_as2d_train(p, x):
            pv0_, pv1_, pv2_ = p
            y, _ = pre0a.apply(pv0_, x, True, mutable=["batch_stats"])
            z, _ = pre1a.apply(pv1_, y, True, mutable=["batch_stats"])
            z, _ = pre2a.apply(pv2_, z, True, mutable=["batch_stats"])
            return y + z
        measure("g_prestack_as2d_x6", [(6, nd, hq, wq, 64)],
                gradify(prestack_as2d_train, (pv0, pv1, pv2)))

        # 3D regularization chains at 3 targets
        def dres_train(p, x):
            for _ in range(4):
                x, _ = c32.apply(p, x, True, mutable=["batch_stats"])
            return x
        measure("g_dres_chain_x3", [(3, nd, hq, wq, 32)],
                gradify(dres_train, c32v))

        def tail3d_train(p, x):
            c33v_, kv16v_, kv16v2_, headv_ = p
            x, _ = c33.apply(c33v_, x, True, mutable=["batch_stats"])
            key, _ = kv16.apply(kv16v_, x, True, mutable=["batch_stats"])
            # DISTINCT weights for value_layer: identical params would let
            # XLA CSE the two convs into one and under-measure the stage
            val, _ = kv16.apply(kv16v2_, x, True, mutable=["batch_stats"])
            hd, _ = head.apply(headv_, val, True, mutable=["batch_stats"])
            return hd, key
        kv16v2 = jax.tree.map(lambda a: a * 1.003, kv16v)
        measure("g_dres2_kv_head0_x3", [(3, nd, hq, wq, 33)],
                gradify(tail3d_train, (c33v, kv16v, kv16v2, headv)))

        # warps at train multiplicity: 6 in-window frustum warps (3 targets
        # x 2 neighbors; training never uses memory), 6 plane sweeps
        def frustum6_mode(mode):
            def fn(v, e):
                rel = jnp.tile(jnp.eye(4)[None], (6, 1, 1)).at[:, 0, 3].add(
                    0.05 + 0.01 * e.astype(jnp.float32))
                out = frustum_warp(
                    v, rel, jnp.tile(intr_q[None], (6, 1, 1)),
                    jnp.tile(dvals[None], (6, 1)), 0.01, 10.0 / (nd - 1),
                    mode=mode,
                )
                return out
            def g(v, e):
                return jax.grad(lambda vv: sumabs(fn(vv, e)))(v)
            return g

        for mode in ("exact", "plane_mix", "plane_mix_pallas"):
            measure(f"g_frustum_x6_{mode}", [(6, nd, hq, wq, 32), (6,)],
                    frustum6_mode(mode), dtypes=[dt, jnp.float32])

        def psweep6_grad(f, e):
            def fn(ff):
                proj = jnp.tile(jnp.eye(4)[None], (6, 1, 1)).at[
                    :, 0, 3].add(0.05 + 0.01 * e.astype(jnp.float32))
                return plane_sweep_warp(
                    ff, proj, jnp.tile(jnp.eye(4)[None], (6, 1, 1)),
                    jnp.tile(dvals[None], (6, 1)),
                )
            return jax.grad(lambda ff: sumabs(fn(ff)))(f)
        measure("g_plane_sweep_x6", [(6, hq, wq, 32), (6,)], psweep6_grad,
                dtypes=[dt, jnp.float32])

        # GRU + head1 and the 2D refinement at 3 targets
        def gru_train(p, xh_pair):
            gv_, ov_, headv_ = p
            x, hh2 = xh_pair
            xh = jnp.concatenate([x, hh2], axis=-1)
            g = gate.apply(gv_, xh)
            r, u = jax.nn.sigmoid(g[..., :16]), jax.nn.sigmoid(g[..., 16:])
            o = outc.apply(ov_, jnp.concatenate([x, r * hh2], axis=-1))
            y = jnp.tanh(o)
            fused = u * hh2 + (1 - u) * y
            hd, _ = head.apply(headv_, fused, True, mutable=["batch_stats"])
            return hd
        measure("g_gru_head1_x3", [(3, nd, hq, wq, 16), (3, nd, hq, wq, 16)],
                gradify(lambda p, x, hh2: gru_train(p, (x, hh2)),
                        (gv, ov, headv)))

        # conv3d backward restructuring experiment: a 3x3x3 conv is EXACTLY
        # the sum of three depth-shifted 3x3 conv2ds over [B*D, H, W, C] —
        # XLA's conv3d backward materializes {C-minor, batch-sublane}
        # padded temps (the train-step HBM/time problem, ARCHITECTURE.md
        # headroom #1); the 2D form gives it a large (B*D) batch whose
        # sublane dim never pads. Same FLOPs, same math — if its backward
        # is faster/leaner this is the drop-in fix for the 3D stack.
        k2 = jnp.asarray(
            rng.normal(size=(3, 3, 3, 32, 32)).astype(np.float32)
        ).astype(dt) * 0.1

        def conv3d_plain(x):
            return jax.lax.conv_general_dilated(
                x, k2, (1, 1, 1), [(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )

        def conv3d_as2d(x):
            bb, dd2, hh2, ww2, cc2 = x.shape
            xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
            out = 0.0
            for i in range(3):
                xi = jax.lax.dynamic_slice_in_dim(xp, i, dd2, 1).reshape(
                    bb * dd2, hh2, ww2, cc2)
                out = out + jax.lax.conv_general_dilated(
                    xi, k2[i], (1, 1), [(1, 1)] * 2,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            return out.reshape(bb, dd2, hh2, ww2, -1)

        def gradded(fn):
            return lambda x: jax.grad(lambda v: sumabs(fn(v)))(x)

        measure("g_conv32_3d_x3", [(3, nd, hq, wq, 32)],
                gradded(conv3d_plain))
        measure("g_conv32_as2d_x3", [(3, nd, hq, wq, 32)],
                gradded(conv3d_as2d))
        measure("conv32_as2d_fwd", [(1, nd, hq, wq, 32)], conv3d_as2d)

        def refine_train(p, sem, skip0):
            from estdepth_tpu.models.layers import upsample_nearest
            u10_, u11_, u00_, u01_, dv1_ = p
            x, _ = up10.apply(u10_, sem, True, mutable=["batch_stats"])
            x = jnp.concatenate([upsample_nearest(x), skip0], axis=-1)
            x, _ = up11.apply(u11_, x, True, mutable=["batch_stats"])
            d1 = jax.nn.sigmoid(disp.apply(dv1_, x).astype(jnp.float32))
            x, _ = up00.apply(u00_, x, True, mutable=["batch_stats"])
            x = upsample_nearest(x)
            x, _ = up01.apply(u01_, x, True, mutable=["batch_stats"])
            return d1, x
        measure("g_refine_2d_x3",
                [(3, hq, wq, 128), (3, h // 2, w // 2, 64)],
                gradify(refine_train, (u10v, u11v, u00v, u01v, dv1)))

    # ---- lane-packed conv experiments -------------------------------------
    k32 = jnp.asarray(rng.normal(size=(3, 3, 3, 32, 32)).astype(np.float32)
                      ).astype(dt) * 0.1
    measure("conv32_plain", [(1, nd, hq, wq, 32)],
            lambda x: lane_packed_conv3d(x, k32, 1))
    measure("conv32_packed4", [(1, nd, hq, wq, 32)],
            lambda x: lane_packed_conv3d(x, k32, 4))
    k16 = jnp.asarray(rng.normal(size=(3, 3, 3, 33, 16)).astype(np.float32)
                      ).astype(dt) * 0.1
    measure("conv33to16_plain", [(1, nd, hq, wq, 33)],
            lambda x: lane_packed_conv3d(x, k16, 1))
    measure("conv33to16_packed8", [(1, nd, hq, wq, 33)],
            lambda x: lane_packed_conv3d(x, k16, 8))

    print("\nsummary (ms/iter, floor-subtracted):")
    total = 0.0
    parts = [
        "psm_1frame", "resnet50_1frame", "prestack_2x", "dres_chain_x4",
        "dres2_kv_head0", "frustum_warp_x2", "est_attention", "gru_head1",
        "plane_sweep_x2", "softargmin_x2", "refine_2d",
    ]
    for k in parts:
        if k in results:
            total += results[k][0]
            print(f"  {k:24s} {results[k][0]:8.2f}")
    print(f"  {'SUM OF PARTS':24s} {total:8.2f}   "
          "(vs bench scan mode ~83.6 ms/window in r02)")


if __name__ == "__main__":
    main()
