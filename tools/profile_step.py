#!/usr/bin/env python
"""Component-level timing of the ESTM streaming step on the accelerator.

Times each stage of the flagship pipeline in isolation (jitted, steady
state) so optimization effort goes where the milliseconds are. Also the
anchor for `jax.profiler` traces: pass --trace <dir> to dump one.

Measurement hygiene (ARCHITECTURE.md): this environment's remote-execution
relay elides repeated identical launches AND does not force execution under
`block_until_ready` without a data fetch — so every timed iteration here
feeds a DISTINCT input and fetches (part of) its result. Component times
therefore include one device->host fetch RPC (~30 ms on this tunnel);
relative comparisons remain meaningful.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from estdepth_tpu.utils.platform import apply_platform_env

apply_platform_env()


def _fetch(out):
    """Fetch a bounded slice of the first output leaf — enough to force the
    producing program to execute (the slice reads its buffer) without
    dragging hundreds of MB through the ~30ms-RPC tunnel per iteration."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:4096])


def timeit(fn, *args, n=10, warmup=2, vary=0):
    """Time fn with a DISTINCT perturbed copy of args[vary] per call and a
    result fetch per call (see module docstring).

    Variants are generated ON DEVICE before timing — per-iteration
    device_put of a large input would measure the host->device upload
    (e.g. a 167 MB cost volume takes ~2.8 s through this tunnel), not the
    op."""
    import jax
    import jax.numpy as jnp

    base = args[vary]

    @jax.jit
    def perturb(x, key):
        return x + (1e-3 * jax.random.normal(key, x.shape)).astype(x.dtype)

    variants = [
        perturb(base, jax.random.key(i)) for i in range(warmup + n)
    ]
    jax.block_until_ready(variants)

    def call(i):
        a = list(args)
        a[vary] = variants[i]
        return fn(*a)

    for i in range(warmup):
        _fetch(call(i))
    t0 = time.perf_counter()
    for i in range(n):
        _fetch(call(warmup + i))
    return (time.perf_counter() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--ndepths", type=int, default=64)
    p.add_argument("--resnet", type=int, default=50)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--trace", type=str, default=None)
    p.add_argument("--train-batch", type=int, default=1,
                   help="per-chip batch for the train-step timing")
    p.add_argument("--remat", action="store_true",
                   help="rematerialized train step (jax.checkpoint)")
    p.add_argument("--skip-components", action="store_true",
                   help="only run the train-step section")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from estdepth_tpu.models import DepthNetHybrid, ESTMemory
    from estdepth_tpu.models.psm import PSMFeatureNet
    from estdepth_tpu.models.resnet import ResNetEncoder
    from estdepth_tpu.ops.warp import frustum_warp, plane_sweep_warp
    from estdepth_tpu.ops.geometry import camera_projection

    h, w, nd = args.height, args.width, args.ndepths
    hq, wq = h // 4, w // 4
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    rng = np.random.default_rng(0)

    model = DepthNetHybrid(
        ndepths=nd, depth_min=0.01, depth_max=10.0, resnet=args.resnet,
        est_transformer=True, dtype=dtype,
    )
    imgs = jnp.asarray(rng.uniform(0, 255, (1, 3, h, w, 3)).astype(np.float32))
    poses = np.tile(np.eye(4, dtype=np.float32)[None, None], (1, 3, 1, 1))
    for i in range(3):
        poses[0, i, 0, 3] = 0.05 * i
    poses = jnp.asarray(poses)
    intr = jnp.asarray(np.array(
        [[[288.9, 0, (w - 1) / 2], [0, 288.9, (h - 1) / 2], [0, 0, 1]]],
        np.float32))
    # jitted init: eager init is pathologically slow on remote TPU backends
    variables = jax.jit(
        lambda r: model.init(r, imgs, poses, intr, train=False)
    )(jax.random.key(0))
    memory = ESTMemory.create(
        1, 2, nd, hq, wq, 16, dtype=model.dtype or jnp.float32
    )
    memory = memory.replace(valid=jnp.ones_like(memory.valid))

    # --- full step
    @jax.jit
    def full(v, i, p, k, m):
        out, st = model.apply(v, i, p, k, memory=m, use_est=True, train=False)
        return out["depth"]

    if not args.skip_components:
        t_full = timeit(full, variables, imgs, poses, intr, memory, vary=1)
        print(f"full ESTM step:        {1e3*t_full:8.2f} ms  "
              f"({1/t_full:.1f} fps)")

    if args.trace:
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(full(variables, imgs, poses, intr, memory))
        print(f"trace written to {args.trace}")

    if not args.skip_components:
        # --- PSM features (3 frames)
        psm = PSMFeatureNet(dtype=dtype)
        pv = {"params": variables["params"]["matching_feature"],
              "batch_stats": variables["batch_stats"]["matching_feature"]}
        x3 = jnp.asarray(rng.normal(size=(3, h, w, 3)).astype(np.float32)).astype(dtype)
        t = timeit(jax.jit(psm.apply), pv, x3, vary=1)
        print(f"PSM features (3 imgs): {1e3*t:8.2f} ms")

        # --- ResNet (1 target frame)
        res = ResNetEncoder(args.resnet, dtype=dtype)
        rv = {"params": variables["params"]["semantic_feature"],
              "batch_stats": variables["batch_stats"]["semantic_feature"]}
        x1 = x3[:1]
        t = timeit(jax.jit(lambda v, x: res.apply(v, x)[-1]), rv, x1, vary=1)
        print(f"ResNet-{args.resnet} (1 img):    {1e3*t:8.2f} ms")

        # --- plane-sweep warp (2 neighbors)
        feat = jnp.asarray(rng.normal(size=(2, hq, wq, 32)).astype(np.float32)).astype(dtype)
        proj = camera_projection(jnp.tile(intr / 4, (2, 1, 1)).at[:, 2, 2].set(1.0),
                                 jnp.tile(poses[0, :2], (1, 1, 1)))
        dv = jnp.tile(jnp.linspace(0.01, 10.0, nd)[None], (2, 1))
        t = timeit(jax.jit(plane_sweep_warp), feat, proj, proj, dv, vary=0)
        print(f"plane-sweep x2:        {1e3*t:8.2f} ms")

        # --- frustum warp (2 memory neighbors, keys+values fused = 32ch)
        vol = jnp.asarray(
            rng.normal(size=(2, nd, hq, wq, 32)).astype(np.float32)
        ).astype(dtype)
        rel = jnp.tile(jnp.eye(4)[None], (2, 1, 1)).astype(jnp.float32)
        k2 = jnp.tile(intr / 4, (2, 1, 1)).at[:, 2, 2].set(1.0)
        t = timeit(
            jax.jit(lambda v, r, k, d: frustum_warp(v, r, k, d, 0.01, 10 / 63)),
            vol, rel, k2, dv, vary=0,
        )
        print(f"frustum warp x2:       {1e3*t:8.2f} ms")

        # --- decoder 3D conv stack proxy: dres chain on [1, D, H/4, W/4, 32]
        from estdepth_tpu.models.decoder import ConvBNRelu3D

        cv = jnp.asarray(rng.normal(size=(1, nd, hq, wq, 32)).astype(np.float32)).astype(dtype)
        conv3 = ConvBNRelu3D(32, dtype=dtype)
        c3v = conv3.init(jax.random.key(0), cv)
        t = timeit(jax.jit(conv3.apply), c3v, cv, vary=1)
        print(f"one conv3d 32ch:       {1e3*t:8.2f} ms  (decoder has ~7)")

    # --- training step (flagship config, single chip, V=5 window)
    from estdepth_tpu.data.synthetic import SyntheticSceneConfig, synthetic_window
    from estdepth_tpu.parallel.mesh import create_mesh, replicate, shard_batch
    from estdepth_tpu.train.schedule import warmup_multistep_schedule
    from estdepth_tpu.train.trainer import (
        create_train_state, make_optimizer, make_train_step,
    )

    mesh = create_mesh(1)
    tmodel = DepthNetHybrid(
        ndepths=nd, depth_min=0.01, depth_max=10.0, resnet=args.resnet,
        est_transformer=True, bn_axis_name="data", dtype=dtype,
    )
    cfg = SyntheticSceneConfig(height=h, width=w)
    batch = synthetic_window(cfg, n_frames=5, batch=args.train_batch)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    tx = make_optimizer(warmup_multistep_schedule(4e-5, 1000))
    state = create_train_state(
        tmodel, jax.random.key(0),
        jax.tree.map(lambda x: x[:1], batch), tx,
    )
    state = replicate(state, mesh)
    sharded = shard_batch(batch, mesh)
    step_fn = make_train_step(tmodel, tx, mesh, 0.01, 10.0, remat=args.remat)

    rng_b = np.random.default_rng(1)

    def one_step(st):
        # DISTINCT batch per call + scalar fetch: anti-elision hygiene
        b = dict(sharded)
        b["imgs"] = jnp.asarray(
            np.asarray(batch["imgs"])
            + rng_b.normal(0, 1e-2, batch["imgs"].shape).astype(np.float32)
        )
        st, scalars = step_fn(st, b, jnp.float32(10.0))
        return st, float(scalars["loss"])

    state, _ = one_step(state)  # compile
    state, _ = one_step(state)
    t0 = time.perf_counter()
    n_it = 5
    for _ in range(n_it):
        state, _ = one_step(state)
    t = (time.perf_counter() - t0) / n_it
    tag = " remat" if args.remat else ""
    bt = args.train_batch
    print(f"train step (V=5, B={bt}{tag}): {1e3*t:8.2f} ms  "
          f"({1/t:.2f} steps/s/chip, {bt/t:.2f} windows/s/chip)")


if __name__ == "__main__":
    main()
