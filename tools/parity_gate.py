#!/usr/bin/env python
"""One-command real-data parity gate: our ESTM eval vs the ACTUAL reference.

The north-star acceptance criterion (BASELINE.json) is ScanNet abs-rel
within 1e-3 of the reference implementation given the released checkpoint.
That artifact (a Google-Drive .ckpt, /root/reference/README.md:86) and the
ScanNet data are not available in this build environment — so this tool
packages the ENTIRE gate as one command that runs hermetically on synthetic
data today and runs unchanged on real data the day an artifact lands:

  1. weights: load a reference torch .ckpt through the converter
     (utils/convert.py), or export a random init to torch format when no
     ckpt is given — either way BOTH implementations run identical weights;
  2. evaluate OUR shipped streaming driver (ESTMRunner, strict
     reference-pose-pairing by default so the diff isolates implementation
     error, not the documented pose-pairing deviation);
  3. evaluate the ACTUAL reference code (/root/reference/eval_hybrid_seq.py
     deque protocol executed through utils/reference_runner.py);
  4. score both with the same metric (eval/metrics.py compute_errors, the
     reference metric.py formulas) and print the per-metric deltas vs the
     gate.

Usage:
  python tools/parity_gate.py --synthetic                     # hermetic
  python tools/parity_gate.py --ckpt released.ckpt \
      --datapath /data/7scenes --sequence chess/seq-03        # real data
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from estdepth_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", type=str, default=None,
                   help="reference torch .ckpt; omitted -> random init "
                        "exported to torch so both sides still share weights")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--datapath", type=str, default=None)
    p.add_argument("--sequence", type=str, default=None,
                   help="scene[/seq] under datapath (7scenes layout)")
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--ndepths", type=int, default=64)
    p.add_argument("--resnet", type=int, default=50)
    p.add_argument("--depth-min", type=float, default=0.01)
    p.add_argument("--depth-max", type=float, default=10.0)
    p.add_argument("--protocol", choices=["stream", "joint"],
                   default="stream",
                   help="'stream' gates the ESTM per-frame chain "
                        "(eval_hybrid_seq.py deque protocol); 'joint' "
                        "gates the Joint window chain — windows advancing "
                        "by lwindow-2 with the last target's K/V threaded "
                        "as pre_costs (eval_hybrid.py:229-243), driven "
                        "through the shipped JointRunner")
    p.add_argument("--lwindow", type=int, default=None,
                   help="window length (default: 3 for stream, 5 for joint)")
    p.add_argument("--memory", type=int, default=2)
    p.add_argument("--max-frames", type=int, default=6,
                   help="stream: frames evaluated (reference torch-CPU is "
                        "~4 s/frame)")
    p.add_argument("--windows", type=int, default=3,
                   help="joint: chained windows evaluated")
    p.add_argument("--gate", type=float, default=1e-3,
                   help="max |abs_rel delta| to PASS (BASELINE.json)")
    p.add_argument("--geometric-pairing", action="store_true",
                   help="run OUR side with the geometrically-correct memory "
                        "pose pairing instead of strict reference parity "
                        "(measures the documented deviation, not the gate)")
    p.add_argument("--json", type=str, default=None)
    p.add_argument("--variant",
                   choices=["exact", "plane_mix", "plane_mix_exact_z",
                            "pallas", "pallas_exact_z",
                            "pallas_exact_z_packed", "pallas_bf16",
                            "pallas_exact_z_bf16"],
                   default="exact",
                   help="warp backend for OUR side: 'exact' is the "
                        "reference-faithful default; 'plane_mix' / "
                        "'pallas' gate the fast eval paths' end-metric "
                        "drift against the actual reference (the gate "
                        "then measures approximation + float error); "
                        "'*_exact_z' adds the slope-carry exact-z "
                        "correction (ops/warp_exact_z.py — the candidate "
                        "that passes the 1e-3 gate on a fast backend); "
                        "'pallas_exact_z_packed' rides its tap/slope "
                        "pair as origin-shifted bf16 int32 lanes (plain "
                        "plane-mix kernel cost, ~1e-4-class transport "
                        "quantization); "
                        "'*_bf16' additionally runs OUR model in "
                        "bfloat16, exercising the int32-packed kernels — "
                        "the flagship bench configuration")
    p.add_argument("--conv3d-as2d", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="orthogonal to --variant: run OUR side's 3x3x3 "
                        "convs as depth-shifted conv2ds (exact "
                        "decomposition, models/layers.Decomp3DConv; "
                        "default ON — the shipped execution strategy) — "
                        "gates the eval execution-strategy flag "
                        "end-to-end against the actual reference")
    p.add_argument("--precision", choices=["default", "high", "highest"],
                   default="high",
                   help="OUR side's global matmul/conv precision; default "
                        "'high' matches the eval tools' shipped default "
                        "(round-5 flip — measured free on the bf16 stack). "
                        "On TPU the BACKEND default (1 bf16 pass, "
                        "'--precision default') is a model-wide ~1.15e-3 "
                        "drift vs the torch-f32 reference that EVERY "
                        "variant shares (incl. exact); measured on-chip: "
                        "high 1.4e-5, highest 8.0e-7 — both PASS. CPU f32 "
                        "numerics pass at any setting (PARITY.md)")
    return p.parse_args()


def main():
    args = parse_args()
    from estdepth_tpu.utils.platform import apply_matmul_precision

    apply_matmul_precision(args.precision)
    if args.lwindow is None:
        args.lwindow = 5 if args.protocol == "joint" else 3
    if args.protocol == "joint":
        n_frames = (args.windows - 1) * (args.lwindow - 2) + args.lwindow
    else:
        n_frames = args.max_frames + args.lwindow - 1
    import torch

    from estdepth_tpu.eval.metric_offline import compute_errors
    from estdepth_tpu.models import DepthNetHybrid
    from estdepth_tpu.utils.reference_runner import build_reference_model
    from estdepth_tpu.utils.convert import load_torch_checkpoint

    import jax
    import jax.numpy as jnp

    # ---- frames ------------------------------------------------------------
    if args.synthetic or not args.datapath:
        from estdepth_tpu.data.synthetic import (
            SyntheticSceneConfig, synthetic_stream,
        )

        cfg = SyntheticSceneConfig(height=args.height, width=args.width)
        frames = list(synthetic_stream(
            cfg, n_frames=n_frames, depth_min=args.depth_min,
            depth_max=args.depth_max,
        ))
    else:
        from estdepth_tpu.data.eval_stream import StreamEvalDataset

        scene, _, seq = (args.sequence or "").partition("/")
        ds = StreamEvalDataset(
            args.datapath, args.height, args.width,
            depth_min=args.depth_min, depth_max=args.depth_max,
        )
        ds.reset(scene, seq or None)
        frames = [ds[i] for i in range(min(len(ds), n_frames))]

    # ---- weights (shared by construction) ----------------------------------
    if args.ndepths < 63:
        # the reference side cannot run shallower volumes: pixel2cam has a
        # leftover hardcoded debug index `depth[:, 0, 62, :]`
        # (/root/reference/utils/homo_utils.py:56) that IndexErrors for
        # ndepths < 63; the SPP pooling additionally needs height/4 >= 32
        sys.exit("parity_gate: --ndepths must be >= 63 (the reference's "
                 "homo_utils.py:56 indexes depth plane 62 unconditionally)")
    model = DepthNetHybrid(
        ndepths=args.ndepths, depth_min=args.depth_min,
        depth_max=args.depth_max, resnet=args.resnet, est_transformer=True,
        fast_frustum=args.variant.startswith("plane_mix"),
        pallas_warp=args.variant.startswith("pallas"),
        exact_z_warp="exact_z" in args.variant,
        packed_exact_z="packed" in args.variant,
        dtype=jnp.bfloat16 if args.variant.endswith("bf16") else None,
        conv3d_as2d=args.conv3d_as2d,
    )
    if args.ckpt:
        variables, unmatched = load_torch_checkpoint(args.ckpt, strict=False)
        if unmatched:
            print(f"converter skipped {len(unmatched)} torch keys")
        src = args.ckpt
    else:
        imgs0 = jnp.asarray(np.stack(
            [f["img"] for f in frames[: args.lwindow]]
        )[None].astype(np.float32))
        poses0 = jnp.asarray(np.stack(
            [f["cam_pose"] for f in frames[: args.lwindow]]
        )[None].astype(np.float32))
        intr0 = jnp.asarray(frames[0]["cam_intr"][None].astype(np.float32))
        variables = jax.jit(
            lambda r: model.init(r, imgs0, poses0, intr0, train=False)
        )(jax.random.key(0))
        variables = jax.device_get(variables)
        src = "random init (exported to torch)"
    print(f"weights: {src}")

    ref_model = build_reference_model(
        variables, ndepths=args.ndepths, depth_min=args.depth_min,
        depth_max=args.depth_max, resnet=args.resnet, est_transformer=True,
    )

    intr = frames[0]["cam_intr"].astype(np.float32)

    def score(depth_q, f):
        """Upsample the refined map to GT res and score (the same
        convention as tools/eval_estm.py:score)."""
        import cv2

        gt, mask = f.get("dmap"), f.get("dmask")
        if gt is None:
            return None
        pred = cv2.resize(
            np.asarray(depth_q, np.float32), (gt.shape[1], gt.shape[0])
        )
        return compute_errors(
            pred, np.where(np.asarray(mask, bool), gt, 0.0),
            min_thred=max(args.depth_min, 0.3), max_thred=args.depth_max,
        )

    def _window_arrays(lo):
        hi = lo + args.lwindow
        imgs = np.stack(
            [f["img"] for f in frames[lo:hi]]
        )[None].astype(np.float32)
        poses = np.stack(
            [f["cam_pose"] for f in frames[lo:hi]]
        )[None].astype(np.float32)
        return imgs, poses

    if args.protocol == "joint":
        # ---- ours: the shipped joint window-chain driver --------------
        from tools.eval_joint import JointRunner

        runner = JointRunner(
            model, variables, est_on=True,
            reference_pose_pairing=not args.geometric_pairing,
        )
        stride = args.lwindow - 2
        starts = [w * stride for w in range(args.windows)]
        our_scores, torch_scores = [], []
        for lo in starts:
            imgs, poses = _window_arrays(lo)
            depth, _ = runner.run_window(
                jnp.asarray(imgs), jnp.asarray(poses),
                jnp.asarray(intr[None]),
            )
            for ti in range(args.lwindow - 2):
                s = score(np.asarray(depth[0, ti, 0]), frames[lo + 1 + ti])
                if s is not None:
                    our_scores.append(s)

        # ---- reference: the actual torch code, threaded pre_costs -----
        # (eval_hybrid.py:229-243: the model's returned cur_costs/
        # cur_poses pass straight back in as the next window's 1-entry
        # memory)
        pre_costs, pre_poses = None, None
        with torch.no_grad():
            for lo in starts:
                imgs, poses = _window_arrays(lo)
                t_imgs = torch.from_numpy(imgs).permute(
                    0, 1, 4, 2, 3).contiguous()
                sample = {
                    "dmaps": torch.zeros(1, args.lwindow, 1, 8, 8),
                    "dmasks": torch.zeros(1, args.lwindow, 1, 8, 8) > 0,
                }
                outputs, pre_costs, pre_poses = ref_model(
                    t_imgs, torch.from_numpy(poses),
                    torch.from_numpy(intr[None]), sample,
                    pre_costs, pre_poses, mode="val",
                )
                for ti in range(args.lwindow - 2):
                    dq = outputs[("depth", ti, 0)][0, 0].numpy()
                    s = score(dq, frames[lo + 1 + ti])
                    if s is not None:
                        torch_scores.append(s)
                print(f"reference window at {lo}: done", flush=True)
    else:
        # ---- ours: the shipped streaming driver ------------------------
        from estdepth_tpu.eval.estm import ESTMRunner

        runner = ESTMRunner(
            model, variables, args.height, args.width,
            lwindow=args.lwindow, memory_size=args.memory,
            reference_pose_pairing=not args.geometric_pairing,
        )
        ours = []
        for i, f in enumerate(frames):
            d = runner.push_frame(f["img"], f["cam_pose"], f["cam_intr"])
            if d is not None:
                ci = i - args.lwindow // 2  # center-frame convention
                ours.append((np.asarray(d[0, 0]), frames[ci]))
        our_scores = [
            s for dq, f in ours if (s := score(dq, f)) is not None
        ]

        # ---- reference: the actual torch code, deque protocol ----------
        torch_scores = []
        deq_costs, deq_poses = [], []
        window = []
        with torch.no_grad():
            for i, f in enumerate(frames):
                window.append(i)
                if len(window) < args.lwindow:
                    continue
                imgs = np.stack(
                    [frames[j]["img"] for j in window]
                )[None].astype(np.float32)
                poses = np.stack(
                    [frames[j]["cam_pose"] for j in window]
                )[None].astype(np.float32)
                t_imgs = torch.from_numpy(imgs).permute(
                    0, 1, 4, 2, 3).contiguous()
                if deq_poses:
                    pre_costs = {
                        "keys": [d["keys"][0] for d in deq_costs],
                        "values": [d["values"][0] for d in deq_costs],
                    }
                    pre_poses = [p[0] for p in deq_poses]
                else:
                    pre_costs, pre_poses = None, None
                sample = {
                    "dmaps": torch.zeros(1, args.lwindow, 1, 8, 8),
                    "dmasks": torch.zeros(1, args.lwindow, 1, 8, 8) > 0,
                }
                outputs, cur_costs, cur_poses = ref_model(
                    t_imgs, torch.from_numpy(poses),
                    torch.from_numpy(intr[None]), sample,
                    pre_costs, pre_poses, mode="val",
                )
                deq_costs.append(cur_costs)
                deq_poses.append(cur_poses)
                if len(deq_costs) > args.memory:
                    deq_costs.pop(0)
                    deq_poses.pop(0)
                window.pop(0)
                ci = i - args.lwindow // 2
                dq = outputs[("depth", 0, 0)][0, 0].numpy()
                s = score(dq, frames[ci])
                if s is not None:
                    torch_scores.append(s)
                print(f"reference frame {i}: done", flush=True)

    # ---- diff --------------------------------------------------------------
    keys = sorted(our_scores[0]) if our_scores else []
    result = {"protocol": args.protocol, "frames": len(our_scores),
              "weights": src,
              "pairing": ("geometric" if args.geometric_pairing
                          else "reference-strict"), "metrics": {}}
    for k in keys:
        a = float(np.mean([s[k] for s in our_scores]))
        b = float(np.mean([s[k] for s in torch_scores]))
        result["metrics"][k] = {"ours": a, "reference": b, "delta": a - b}
    delta = abs(
        result["metrics"].get("abs_relative", {}).get("delta", float("nan"))
    )
    result["gate"] = args.gate
    result["abs_rel_delta"] = delta
    result["pass"] = bool(delta <= args.gate)
    print(json.dumps(result, indent=2))
    print(f"PARITY GATE: {'PASS' if result['pass'] else 'FAIL'} "
          f"(|abs_rel delta| = {delta:.2e} vs gate {args.gate:g})")
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(result, fh, indent=2)
    sys.exit(0 if result["pass"] else 1)


if __name__ == "__main__":
    main()
