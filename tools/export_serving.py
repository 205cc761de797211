#!/usr/bin/env python
"""Export the ESTM streaming step as a StableHLO serving artifact.

Serializes the two jit specializations of the per-frame window step
(first-window / steady-state, weights baked in) via jax.export into a
directory a plain JAX runtime can execute without the model code — the
deployment form of the reference's live-process serving loop
(/root/reference/eval_hybrid_seq.py:124-193). See estdepth_tpu/serving.py.

Usage:
  python tools/export_serving.py --out artifacts/estm/       # random init
  python tools/export_serving.py --out artifacts/estm/ \
      --ckpt runs/ckpt_dir --bf16 --platforms tpu,cpu --verify 6
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


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", type=str, required=True,
                   help="artifact output directory")
    p.add_argument("--ckpt", type=str, default=None,
                   help="orbax run dir or reference torch .ckpt/.pth "
                        "(converted); default random init")
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--ndepths", type=int, default=64)
    p.add_argument("--depth-min", type=float, default=0.01)
    p.add_argument("--depth-max", type=float, default=10.0)
    p.add_argument("--resnet", type=int, default=50)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--fast-frustum", action="store_true",
                   help="plane-mix EST memory warps (see eval_estm.py)")
    p.add_argument("--pallas-warp", action="store_true",
                   help="Pallas lane-gather warps (see eval_estm.py); "
                        "TPU-platform artifacts only")
    p.add_argument("--exact-z", action="store_true",
                   help="slope-carry exact-z correction on the fast warps "
                        "(see eval_estm.py)")
    p.add_argument("--conv3d-as2d", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="exact 3x3x3-as-depth-shifted-conv2ds execution "
                        "(see eval_estm.py); default ON")
    p.add_argument("--batch", type=int, default=1,
                   help="independent streams per exported step")
    p.add_argument("--lwindow", type=int, default=3)
    p.add_argument("--memory-size", type=int, default=2)
    p.add_argument("--joint", action="store_true",
                   help="export the Joint protocol instead (seq_length-"
                        "frame windows advancing by seq_length-2, 3 "
                        "target depths per window, 1-entry threaded "
                        "memory); load with serving.load_joint")
    p.add_argument("--seq-length", type=int, default=5,
                   help="window length for --joint")
    p.add_argument("--scales", type=str, default="0",
                   help="comma-separated output depth scales (serving "
                        "default: refined scale-0 only)")
    p.add_argument("--output-bf16", action="store_true",
                   help="downcast the fetched depth maps (8x less "
                        "device->host transfer vs 4-scale fp32)")
    p.add_argument("--platforms", type=str, default=None,
                   help="comma-separated lowering platforms, e.g. "
                        "'tpu,cpu' for a cross-platform artifact; "
                        "default: current backend")
    p.add_argument("--verify", type=int, default=0, metavar="N",
                   help="after export, stream N synthetic frames through "
                        "the reloaded artifact AND a live ESTMRunner and "
                        "compare frame-for-frame")
    p.add_argument("--precision", choices=["default", "high", "highest"],
                   default="high",
                   help="matmul/conv precision BAKED into the exported "
                        "program — matches the eval tools' shipped "
                        "'high' default (absolute on-chip parity at "
                        "1.4e-5, free on the bf16 stack; PARITY.md)")
    return p.parse_args()


def build_model_and_params(args):
    """One recipe for model+weights across eval and export: reuse
    tools/eval_estm.py's builder (jitted init; orbax or converted-torch
    checkpoint; fast-kernel model variants)."""
    from tools.eval_estm import build_model_and_params as build

    return build(args)


def verify(args, model, variables, n_frames: int) -> float:
    """Stream the same synthetic scene through the reloaded artifact and
    the matching live runner (ESTMRunner / JointRunner); return the max
    abs depth delta across emitted maps."""
    import jax.numpy as jnp

    from estdepth_tpu.data.synthetic import (
        SyntheticSceneConfig, synthetic_stream,
    )

    scales = tuple(int(s) for s in args.scales.split(","))
    out_dtype = jnp.bfloat16 if args.output_bf16 else None
    cfg = SyntheticSceneConfig(
        height=args.height, width=args.width, focal=args.width * 0.6
    )
    if args.joint:
        # N counts windows in joint mode
        stride = args.seq_length - 2
        n_frames = max(n_frames, 1) * stride + 2
    frames = list(synthetic_stream(
        cfg, n_frames=n_frames,
        depth_min=args.depth_min, depth_max=args.depth_max,
    ))

    if args.joint:
        import numpy as _np

        from estdepth_tpu.serving import load_joint
        from tools.eval_joint import JointRunner

        live = JointRunner(model, variables, est_on=True)
        exported = load_joint(args.out)
        lw, stride = args.seq_length, args.seq_length - 2
        max_delta = 0.0
        wi = 0
        for fi, f in enumerate(frames):
            d_exp = exported.push_frame(f["img"], f["cam_pose"],
                                        f["cam_intr"])
            if d_exp is None:
                continue
            s = wi * stride
            d_live, _ = live.run_window(
                jnp.asarray(_np.stack(
                    [x["img"] for x in frames[s : s + lw]])[None]),
                jnp.asarray(_np.stack(
                    [x["cam_pose"] for x in frames[s : s + lw]])[None]),
                jnp.asarray(f["cam_intr"][None]),
            )
            d_live = d_live[:, :, jnp.array(scales)]
            if out_dtype is not None:
                d_live = d_live.astype(out_dtype)
            delta = float(jnp.max(jnp.abs(
                d_live.astype(jnp.float32) - d_exp.astype(jnp.float32)
            )))
            max_delta = max(max_delta, delta)
            wi += 1
        return max_delta

    from estdepth_tpu.eval.estm import ESTMRunner
    from estdepth_tpu.serving import load_stream

    live = ESTMRunner(
        model, variables, args.height, args.width, lwindow=args.lwindow,
        memory_size=args.memory_size, batch=args.batch,
        output_scales=scales, output_dtype=out_dtype,
    )
    exported = load_stream(args.out)
    max_delta = 0.0
    for f in frames:
        d_live = live.push_frame(f["img"], f["cam_pose"], f["cam_intr"])
        d_exp = exported.push_frame(f["img"], f["cam_pose"], f["cam_intr"])
        assert (d_live is None) == (d_exp is None)
        if d_live is not None:
            delta = float(jnp.max(jnp.abs(
                d_live.astype(jnp.float32) - d_exp.astype(jnp.float32)
            )))
            max_delta = max(max_delta, delta)
    return max_delta


def main():
    args = parse_args()
    import jax.numpy as jnp

    from estdepth_tpu.serving import export_joint, export_stream

    if args.joint:
        args.lwindow = args.seq_length  # builder inits with a full window
    model, variables = build_model_and_params(args)
    scales = tuple(int(s) for s in args.scales.split(","))
    platforms = (
        tuple(args.platforms.split(",")) if args.platforms else None
    )
    t0 = time.perf_counter()
    if args.joint:
        artifact = export_joint(
            model, variables,
            height=args.height, width=args.width, batch=args.batch,
            seq_length=args.seq_length, output_scales=scales,
            output_dtype=jnp.bfloat16 if args.output_bf16 else None,
            platforms=platforms,
        )
    else:
        artifact = export_stream(
            model, variables,
            height=args.height, width=args.width, batch=args.batch,
            lwindow=args.lwindow, memory_size=args.memory_size,
            output_scales=scales,
            output_dtype=jnp.bfloat16 if args.output_bf16 else None,
            platforms=platforms,
        )
    artifact.save(args.out)
    n_bytes = len(artifact.first_blob) + len(artifact.steady_blob)
    print(
        f"exported {args.out} ({n_bytes / 1e6:.1f} MB, "
        f"platforms={artifact.manifest['platforms']}, "
        f"{time.perf_counter() - t0:.1f}s)"
    )
    if args.verify:
        delta = verify(args, model, variables, args.verify)
        print(f"verify: max |depth delta| over {args.verify} frames = "
              f"{delta:.3e}")
        if delta > 1e-3:
            # quarantine: a failed artifact must be distinguishable on disk
            marker = os.path.join(args.out, "VERIFY_FAILED")
            with open(marker, "w") as f:
                f.write(f"max |depth delta| {delta:.6e} > 1e-3\n")
            sys.exit(f"verification FAILED (delta {delta:.3e} > 1e-3); "
                     f"wrote {marker}")


if __name__ == "__main__":
    main()
