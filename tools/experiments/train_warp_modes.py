"""Measure the flagship train step under the three warp backends.

exact (shipping default), plane_mix (differentiable XLA reformulation),
pallas (lane-gather forward + plane-mix-VJP backward), plus as2d /
plane_mix_as2d / pallas_as2d (3x3x3 convs as depth-shifted conv2ds —
targets the conv3d BACKWARD's padded gradient temps,
models/layers.Decomp3DConv; pallas_as2d stacks them on the warp kernels,
the measured-fastest eval combo). Same
anti-elision protocol as bench.py's train block: distinct batch per step,
scalar fetch inside the timed region.

Usage: python tools/experiments/train_warp_modes.py [--steps 5]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from estdepth_tpu.utils.platform import (  # noqa: E402
    apply_platform_env, enable_compilation_cache,
)

apply_platform_env()
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from estdepth_tpu.data.synthetic import (  # noqa: E402
    SyntheticSceneConfig, synthetic_window,
)
from estdepth_tpu.models import DepthNetHybrid  # noqa: E402
from estdepth_tpu.parallel.mesh import (  # noqa: E402
    create_mesh, replicate, shard_batch,
)
from estdepth_tpu.train.schedule import warmup_multistep_schedule  # noqa: E402
from estdepth_tpu.train.trainer import (  # noqa: E402
    create_train_state, make_optimizer, make_train_step,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--ndepths", type=int, default=64)
    ap.add_argument(
        "--batch", type=int, default=1,
        help="windows per device batch — each element is a DISTINCT "
             "synthetic scene segment (identical per-element data distorts "
             "relay timing, CLAUDE.md); the flagship direct-B=2 question")
    ap.add_argument(
        "--modes", type=str,
        default="exact,plane_mix,pallas,as2d,plane_mix_as2d",
        help="comma list from {exact, plane_mix, pallas, as2d, "
             "plane_mix_as2d, pallas_as2d, plane_mix_ez_as2d, "
             "pallas_ez_as2d, pallas_ez_packed_as2d} (_ez_ = slope-carry "
             "exact-z correction, ops/warp_exact_z.py — the parity-fast "
             "warp; _packed_ adds the origin-shifted bf16 tap/slope "
             "transport, the shipped eval default)")
    args = ap.parse_args()

    cfg = SyntheticSceneConfig(height=args.height, width=args.width)
    windows = [synthetic_window(cfg, n_frames=5, start_frame=10 * i)
               for i in range(args.batch)]
    batch = {k: jnp.asarray(np.concatenate([w[k] for w in windows], axis=0))
             for k in windows[0]}
    mesh = create_mesh(1)
    tx = make_optimizer(warmup_multistep_schedule(4e-5, 1000))
    rng_b = np.random.default_rng(1)
    imgs_host = np.asarray(batch["imgs"])

    for mode in args.modes.split(","):
        model = DepthNetHybrid(
            ndepths=args.ndepths, depth_min=0.01, depth_max=10.0,
            resnet=50, est_transformer=True, bn_axis_name="data",
            dtype=jnp.bfloat16,
            fast_frustum=mode in ("plane_mix", "plane_mix_as2d",
                                  "plane_mix_ez_as2d"),
            pallas_warp=mode.startswith("pallas"),
            exact_z_warp="_ez_" in mode,
            packed_exact_z="_packed_" in mode,
            conv3d_as2d="as2d" in mode,
        )
        state = create_train_state(model, jax.random.key(0), batch, tx)
        state = replicate(state, mesh)
        sharded = shard_batch(batch, mesh)
        step_fn = make_train_step(model, tx, mesh, 0.01, 10.0)

        def one_step(st):
            b = dict(sharded)
            b["imgs"] = jnp.asarray(
                imgs_host + rng_b.normal(
                    0, 1e-2, imgs_host.shape).astype(np.float32))
            st, scalars = step_fn(st, b, jnp.float32(10.0))
            return st, float(scalars["loss"])

        state, l0 = one_step(state)   # compile
        state, _ = one_step(state)    # warm
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, loss = one_step(state)
        dt = (time.perf_counter() - t0) / args.steps
        print(f"{mode:10s}: {1e3 * dt:8.1f} ms/step  "
              f"({1.0 / dt:.3f} steps/s)  loss0={l0:.4f} lossN={loss:.4f}",
              flush=True)
        del state, step_fn


if __name__ == "__main__":
    main()
