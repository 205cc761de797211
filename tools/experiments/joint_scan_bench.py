"""On-chip joint-mode eval throughput: window-loop vs whole-scene scan.

The joint eval driver gained a --scan mode (one compiled lax.scan program
per scene group, tools/eval_joint.py); this measures what it buys on real
hardware vs the dispatch-per-window loop, at the flagship shape.

Protocol follows bench.py's relay rules: every timed unit feeds DISTINCT
fresh inputs (the relay elides repeated identical launches) and fetches
its full result to host (only a device->host fetch forces execution).
The first scan group / first two loop windows are untimed warmup
(compile). Prints ONE JSON line.

Usage:
  python tools/experiments/joint_scan_bench.py                 # exact warps
  python tools/experiments/joint_scan_bench.py --pallas-warp --bf16
  python tools/experiments/joint_scan_bench.py --scene-batch 4
"""

import argparse
import json
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

import jax.numpy as jnp  # noqa: E402

from estdepth_tpu.data.synthetic import (  # noqa: E402
    SyntheticSceneConfig, synthetic_stream,
)
from estdepth_tpu.eval.sequence import make_joint_processor  # noqa: E402


def scene_arrays(seed: int, n_frames: int, h: int, w: int):
    """A distinct synthetic scene per seed (content AND trajectory)."""
    cfg = SyntheticSceneConfig(
        height=h, width=w, seed=seed, plane_offset=2.0 + 0.15 * (seed % 7),
        step_x=0.05 + 0.01 * (seed % 5), yaw_per_frame=0.005 * (seed % 3),
    )
    fs = list(synthetic_stream(cfg, n_frames=n_frames))
    return (
        np.stack([f["img"] for f in fs]).astype(np.float32),
        np.stack([f["cam_pose"] for f in fs]).astype(np.float32),
        fs[0]["cam_intr"].astype(np.float32),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--ndepths", type=int, default=64)
    ap.add_argument("--resnet", type=int, default=50)
    ap.add_argument("--depth-min", type=float, default=0.01)
    ap.add_argument("--depth-max", type=float, default=10.0)
    ap.add_argument("--seq-length", type=int, default=5)
    ap.add_argument("--windows", type=int, default=8,
                    help="windows per scan program")
    ap.add_argument("--groups", type=int, default=3,
                    help="timed scan groups (distinct scenes each)")
    ap.add_argument("--loop-windows", type=int, default=6,
                    help="timed loop-mode windows")
    ap.add_argument("--scene-batch", type=int, default=1)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--fast-frustum", action="store_true")
    ap.add_argument("--pallas-warp", action="store_true")
    ap.add_argument("--conv3d-as2d", action="store_true")
    ap.add_argument("--skip-loop", action="store_true")
    args = ap.parse_args()

    from tools.eval_estm import build_model_and_params

    ns = argparse.Namespace(**vars(args))
    ns.lwindow = args.seq_length
    ns.ckpt = None
    model, variables = build_model_and_params(ns)

    lw, stride = args.seq_length, args.seq_length - 2
    t_scene = (args.windows - 1) * stride + lw
    n_targets_prog = args.windows * (lw - 2) * args.scene_batch
    out = {
        "windows_per_program": args.windows,
        "scene_batch": args.scene_batch,
        "variant": ("pallas" if args.pallas_warp else
                    "plane_mix" if args.fast_frustum else "exact")
                   + ("+as2d" if args.conv3d_as2d else "")
                   + ("+bf16" if args.bf16 else ""),
    }

    proc = make_joint_processor(
        model, seq_length=lw, output_scales=(0, 2),
    )

    def group(seed0):
        scenes = [
            scene_arrays(seed0 + i, t_scene, args.height, args.width)
            for i in range(args.scene_batch)
        ]
        return (
            jnp.asarray(np.stack([s[0] for s in scenes])),
            jnp.asarray(np.stack([s[1] for s in scenes])),
            jnp.asarray(np.stack([s[2] for s in scenes])),
        )

    # warmup (compile) on its own distinct scenes, full fetch
    np.asarray(proc(variables, *group(900)))
    t0 = time.perf_counter()
    for g in range(args.groups):
        np.asarray(proc(variables, *group(100 + 10 * g)))
    dt = time.perf_counter() - t0
    out["joint_scan_targets_per_s"] = round(
        args.groups * n_targets_prog / dt, 3
    )
    out["joint_scan_ms_per_window"] = round(
        1e3 * dt / (args.groups * args.windows * args.scene_batch), 2
    )

    if not args.skip_loop:
        from tools.eval_joint import JointRunner

        runner = JointRunner(model, variables, est_on=True)
        imgs, poses, intr = [np.asarray(x[0]) for x in group(800)]
        # warmup both loop programs (first window no-EST, then EST)
        for wi in range(2):
            s = wi * stride
            d, _ = runner.run_window(
                jnp.asarray(imgs[None, s : s + lw]),
                jnp.asarray(poses[None, s : s + lw]),
                jnp.asarray(intr[None]),
            )
            np.asarray(d)
        # timed: distinct windows (fresh scene), strict per-window fetch
        t_loop = (args.loop_windows + 1) * stride + lw
        imgs, poses, intr = scene_arrays(700, t_loop, args.height,
                                         args.width)
        runner.reset()
        d, _ = runner.run_window(  # chain head (no-EST program), untimed
            jnp.asarray(imgs[None, :lw]), jnp.asarray(poses[None, :lw]),
            jnp.asarray(intr[None]),
        )
        np.asarray(d)
        t0 = time.perf_counter()
        for wi in range(1, args.loop_windows + 1):
            s = wi * stride
            d, _ = runner.run_window(
                jnp.asarray(imgs[None, s : s + lw]),
                jnp.asarray(poses[None, s : s + lw]),
                jnp.asarray(intr[None]),
            )
            np.asarray(d)
        dt = time.perf_counter() - t0
        out["joint_loop_targets_per_s"] = round(
            args.loop_windows * (lw - 2) / dt, 3
        )
        out["joint_loop_ms_per_window"] = round(
            1e3 * dt / args.loop_windows, 2
        )
        out["scan_vs_loop"] = round(
            out["joint_scan_targets_per_s"]
            / out["joint_loop_targets_per_s"], 2
        )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
