"""On-chip A/B: packed exact-z warp transport vs the f32 exact-z kernels.

Measures the whole-scene lax.scan throughput (bench.py's anti-elision
protocol: warm-compile on clip A, time a DISTINCT clip B, fetch inside the
timed region — only a fetch forces execution on this relay) for

  A. pallas_warp + exact_z            (the shipped eval-tool default)
  B. pallas_warp + exact_z + packed   (origin-shifted bf16 int32 lanes,
                                       ops/pallas/plane_warp_exact_z.py)

back to back in ONE process so relay conditions are shared. Run ALONE on
this 1-core box (CLAUDE.md).

Usage: python tools/experiments/packed_scan_ab.py [--frames 20] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3,
                    help="timed clips per variant (distinct data each)")
    args = ap.parse_args()

    from estdepth_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from estdepth_tpu.data.synthetic import (
        SyntheticSceneConfig, synthetic_stream,
    )
    from estdepth_tpu.eval.sequence import make_sequence_processor
    from estdepth_tpu.models import DepthNetHybrid

    h, w, nd = 256, 320, 64
    base = DepthNetHybrid(
        ndepths=nd, depth_min=0.01, depth_max=10.0, resnet=50,
        est_transformer=True, dtype=jnp.bfloat16,
        pallas_warp=True, exact_z_warp=True,
    )
    cfg = SyntheticSceneConfig(height=h, width=w)
    n = args.frames
    sf = list(synthetic_stream(cfg, n_frames=(args.reps + 1) * n))

    def clip(fr):
        return (
            jnp.asarray(np.stack([f["img"] for f in fr])[None]),
            jnp.asarray(np.stack([f["cam_pose"] for f in fr])[None]),
        )

    clips = [clip(sf[i * n:(i + 1) * n]) for i in range(args.reps + 1)]
    intr0 = jnp.asarray(sf[0]["cam_intr"][None])

    variables = None
    results = {}
    for name, model in (
        ("exact_z_f32", base),
        ("exact_z_packed", base.clone(packed_exact_z=True)),
    ):
        if variables is None:
            variables = jax.jit(
                lambda r, i, p, k: model.init(r, i[:, :3], p[:, :3], k,
                                              train=False)
            )(jax.random.key(0), *clips[0], intr0)
        proc = make_sequence_processor(
            model, lwindow=3, memory_size=2,
            output_scales=(0, 2), output_dtype=jnp.bfloat16,
        )
        # warm compile on clip 0 (fetch to force)
        out = proc(variables, *clips[0], intr0)
        jax.tree.map(lambda x: np.asarray(x), out)
        n_windows = n - 3 + 1
        fps = []
        for r in range(args.reps):
            ci, cp = clips[1 + r]
            t0 = time.perf_counter()
            out = proc(variables, ci, cp, intr0)
            jax.tree.map(lambda x: np.asarray(x), out)
            dt = time.perf_counter() - t0
            fps.append(n_windows / dt)
        results[name] = {
            "fps_per_clip": [round(f, 3) for f in fps],
            "fps_best": round(max(fps), 3),
            "fps_median": round(sorted(fps)[len(fps) // 2], 3),
        }
        print(name, results[name], flush=True)

    a = results["exact_z_f32"]["fps_median"]
    b = results["exact_z_packed"]["fps_median"]
    results["speedup_packed_vs_f32"] = round(b / a, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
