#!/usr/bin/env python
"""Measure the reference implementation's throughput on THIS host and ours
beside it — the traceable denominator for bench.py's `vs_baseline`.

The reference repo publishes no performance numbers (BASELINE.md) and no GPU
is available here, so the only measurable baseline is the reference PyTorch
code itself, run on this host's CPU at its eval protocol: steady-state ESTM
streaming, one 3-frame window forward per new frame with a 2-entry memory,
320x256, 64 planes, ResNet-50 — the "inference time" metric of
/root/reference/eval_hybrid_seq.py:179-184,259. The exact same protocol is
then timed for the JAX model on the same CPU.

Both models carry IDENTICAL weights (exported from one JAX init through
utils/convert.py), so the comparison is implementation-vs-implementation.

Writes BASELINE_MEASURED.json, consumed by bench.py. Run once per host:
  ESTDEPTH_PLATFORM=cpu python tools/measure_baseline.py
"""

from __future__ import annotations

import argparse
import json
import os
import platform as _platform
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("ESTDEPTH_PLATFORM", "cpu")
from estdepth_tpu.utils.platform import apply_platform_env

apply_platform_env()

H, W, NDEPTHS, RESNET = 256, 320, 64, 50
DEPTH_MIN, DEPTH_MAX = 0.01, 10.0
LWINDOW, MEMORY = 3, 2


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--timed-windows", type=int, default=5)
    p.add_argument("--out", type=str, default="BASELINE_MEASURED.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    from estdepth_tpu.data.synthetic import (
        SyntheticSceneConfig, synthetic_stream,
    )
    from estdepth_tpu.eval.estm import ESTMRunner
    from estdepth_tpu.models import DepthNetHybrid
    from estdepth_tpu.utils.reference_runner import build_reference_model

    n_frames = LWINDOW + MEMORY + 1 + args.timed_windows
    frames = list(
        synthetic_stream(SyntheticSceneConfig(height=H, width=W),
                         n_frames=n_frames)
    )
    intr = frames[0]["cam_intr"][None].astype(np.float32)

    model = DepthNetHybrid(
        ndepths=NDEPTHS, depth_min=DEPTH_MIN, depth_max=DEPTH_MAX,
        resnet=RESNET, est_transformer=True,
    )
    imgs0 = jnp.asarray(
        np.stack([f["img"] for f in frames[:LWINDOW]])[None].astype(np.float32)
    )
    poses0 = jnp.asarray(
        np.stack([f["cam_pose"] for f in frames[:LWINDOW]])[None]
    )
    print("initializing JAX model (CPU)...", flush=True)
    variables = jax.jit(
        lambda r, i, p, k: model.init(r, i, p, k, train=False)
    )(jax.random.key(0), imgs0, poses0, jnp.asarray(intr))
    variables = jax.tree.map(np.asarray, dict(variables))

    print("building reference torch model with identical weights...",
          flush=True)
    ref_model = build_reference_model(
        variables, ndepths=NDEPTHS, depth_min=DEPTH_MIN,
        depth_max=DEPTH_MAX, resnet=RESNET, est_transformer=True,
    )

    # ---- reference protocol: eval_hybrid_seq.py streaming loop -----------
    def torch_window(lo):
        imgs = np.stack(
            [frames[lo + i]["img"] for i in range(LWINDOW)]
        )[None].astype(np.float32)
        poses = np.stack(
            [frames[lo + i]["cam_pose"] for i in range(LWINDOW)]
        )[None].astype(np.float32)
        dmaps = np.stack(
            [frames[lo + i]["dmap"] for i in range(LWINDOW)]
        )[None, :, None].astype(np.float32)
        sample = {
            "dmaps": torch.from_numpy(dmaps),
            "dmasks": torch.from_numpy(dmaps > 0),
        }
        return (
            torch.from_numpy(imgs).permute(0, 1, 4, 2, 3).contiguous(),
            torch.from_numpy(poses),
            torch.from_numpy(intr),
            sample,
        )

    print("timing reference torch (CPU)...", flush=True)
    times = []
    pre_costs = pre_poses = None
    deq_c, deq_p = [], []
    with torch.no_grad():
        for wi in range(n_frames - LWINDOW + 1):
            im, po, k, sample = torch_window(wi)
            if deq_p:
                pre_costs = {
                    "keys": [d["keys"][0] for d in deq_c],
                    "values": [d["values"][0] for d in deq_c],
                }
                pre_poses = [p_[0] for p_ in deq_p]
            else:
                pre_costs = pre_poses = None
            t0 = time.perf_counter()
            _, cur_c, cur_p = ref_model(im, po, k, sample, pre_costs,
                                        pre_poses, mode="val")
            dt = time.perf_counter() - t0
            deq_c.append(cur_c)
            deq_p.append(cur_p)
            if len(deq_c) > MEMORY:
                deq_c.pop(0)
                deq_p.pop(0)
            # steady state = memory full (first window is the cheaper
            # no-transformer path; next MEMORY windows fill the FIFO)
            if wi > MEMORY:
                times.append(dt)
            print(f"  torch window {wi}: {dt:.3f}s", flush=True)
    torch_s = float(np.mean(times))

    # ---- ours, same protocol, same host --------------------------------
    print("timing JAX (CPU), same protocol...", flush=True)
    runner = ESTMRunner(model, variables, H, W, lwindow=LWINDOW,
                        memory_size=MEMORY)
    out = None
    # warmup: both specializations + fill memory
    for f in frames[: LWINDOW + MEMORY + 1]:
        out = runner.push_frame(f["img"], f["cam_pose"], f["cam_intr"])
    jax.block_until_ready(out)
    jtimes = []
    for f in frames[LWINDOW + MEMORY + 1 :]:
        t0 = time.perf_counter()
        out = runner.push_frame(f["img"], f["cam_pose"], f["cam_intr"])
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        jtimes.append(dt)
        print(f"  jax window: {dt:.3f}s", flush=True)
    jax_s = float(np.mean(jtimes))

    result = {
        "protocol": "steady-state ESTM window forward "
                    "(eval_hybrid_seq.py:179-184): lwindow 3, memory 2, "
                    "320x256, ndepths 64, resnet 50, fp32, identical "
                    "exported weights",
        "host": {
            "machine": _platform.machine(),
            "cpus": os.cpu_count(),
            "torch": torch.__version__,
            "jax": jax.__version__,
        },
        "reference_torch_cpu": {
            "seconds_per_window": round(torch_s, 4),
            "fps": round(1.0 / torch_s, 4),
        },
        "estdepth_tpu_jax_cpu": {
            "seconds_per_window": round(jax_s, 4),
            "fps": round(1.0 / jax_s, 4),
        },
        "jax_over_torch_cpu": round(torch_s / jax_s, 3),
        "timed_windows": args.timed_windows,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
