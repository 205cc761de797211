"""ESTM streaming throughput benchmark on the local accelerator.

Measures steady-state frames/sec of the flagship DepthNetHybrid in ESTM
streaming mode (resnet-50, ndepths=64, 320x256 input, lwindow=3,
memory_size=2) — the reference's "inference time" metric
(/root/reference/eval_hybrid_seq.py:179-184,259), where each step consumes
one new frame and emits one full-resolution depth map.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement hygiene: every timed step consumes a DISTINCT freshly-uploaded
frame (remote-execution backends can elide repeated launches with identical
input buffers, which inflates naive loop timings by orders of magnitude),
and the result of the final step is fetched to host.

vs_baseline: the reference repo publishes no numbers (BASELINE.md). We use
12.5 fps as the assumed GTX-2080Ti reference throughput (0.08 s/window, the
ballpark of the paper's reported runtime); the north-star target
"vs_baseline >= 2" (BASELINE.json) then means >= 25 fps/chip.
"""

from __future__ import annotations

import json
import time

import numpy as np

ASSUMED_GPU_BASELINE_FPS = 12.5
N_TIMED = 30


def main():
    import jax
    import jax.numpy as jnp

    from estdepth_tpu.data.synthetic import SyntheticSceneConfig, synthetic_stream
    from estdepth_tpu.eval.estm import ESTMRunner
    from estdepth_tpu.models import DepthNetHybrid

    h, w = 256, 320
    model = DepthNetHybrid(
        ndepths=64, depth_min=0.01, depth_max=10.0, resnet=50,
        est_transformer=True, dtype=jnp.bfloat16,
    )
    # enough distinct frames that no timed step repeats an input buffer
    cfg = SyntheticSceneConfig(height=h, width=w)
    frames = list(synthetic_stream(cfg, n_frames=6 + N_TIMED))

    imgs0 = jnp.asarray(np.stack([f["img"] for f in frames[:3]])[None])
    poses0 = jnp.asarray(np.stack([f["cam_pose"] for f in frames[:3]])[None])
    intr0 = jnp.asarray(frames[0]["cam_intr"][None])
    # jitted init: eager init is pathologically slow on remote TPU backends
    variables = jax.jit(
        lambda r, i, p, k: model.init(r, i, p, k, train=False)
    )(jax.random.key(0), imgs0, poses0, intr0)

    runner = ESTMRunner(model, variables, h, w, lwindow=3, memory_size=2)

    # Warm up both specializations (first-window + steady-state) and fill
    # the memory.
    d = None
    for f in frames[:6]:
        d = runner.push_frame(f["img"], f["cam_pose"], f["cam_intr"])
    if d is not None:
        jax.block_until_ready(d)

    # Steady-state timing: each push = 1 DISTINCT new frame -> 1 depth map.
    t0 = time.perf_counter()
    out = None
    for f in frames[6 : 6 + N_TIMED]:
        out = runner.push_frame(f["img"], f["cam_pose"], f["cam_intr"])
    # force full completion incl. a host fetch of real data (np.asarray is a
    # pure transfer; an eager reduction here would COMPILE a new op, which
    # costs tens of seconds through remote-compiled backends). The fetch
    # runs under a timeout: this environment's device->host path has been
    # observed to wedge indefinitely, and the bench must still print.
    import threading

    fetched = threading.Event()

    def _fetch():
        try:
            np.asarray(out)
        finally:
            fetched.set()

    th = threading.Thread(target=_fetch, daemon=True)
    th.start()
    if not fetched.wait(timeout=180.0):
        import sys

        jax.block_until_ready(out)
        print(
            "WARNING: device->host fetch timed out; timing is "
            "block_until_ready-based and may under-report",
            file=sys.stderr, flush=True,
        )
    dt = time.perf_counter() - t0

    fps = N_TIMED / dt
    print(
        json.dumps(
            {
                "metric": "estm_streaming_throughput",
                "value": round(fps, 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / ASSUMED_GPU_BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
