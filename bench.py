"""ESTM throughput benchmark on the local accelerator, with decomposition.

Measures the flagship DepthNetHybrid (resnet-50, ndepths=64, 320x256,
lwindow=3, memory_size=2) at the reference's "inference time" protocol
(/root/reference/eval_hybrid_seq.py:179-184,259): each step consumes one new
frame and emits one full-resolution depth map.

Prints ONE JSON line. Required keys {"metric", "value", "unit",
"vs_baseline"}; extra keys document the decomposition:
  - streaming_fps: host-driven per-frame steps, async pipelined (the
    deployment latency path; this is `value`). Each step fetches the two
    maps the reference's protocol saves per frame (refined scale-0 +
    fused scale-2, half precision — eval_hybrid_seq.py:200-258);
    streaming_full_fetch_fps is the stricter all-4-scales-fp32 variant
    (the r01 protocol)
  - streaming_sync_ms: same step, blocked each frame (upper bound incl.
    full dispatch+RPC round trip per frame)
  - scan_fps: whole-scene lax.scan mode (eval/sequence.py) — ZERO per-frame
    dispatch; the streaming-vs-scan gap measures host dispatch cost
  - window_gflops / achieved_tflops / mfu: compiled FLOPs from XLA
    cost_analysis, v5e bf16 peak 197 TFLOP/s
  - pallas_streaming_fps: same pipeline with the fused Pallas EST-attention
    kernel (ops/pallas/) — the measured Pallas-vs-XLA verdict
  - scan_planemix_fps / scan_pallas_fps (+ mfu_scan_pallas) /
    scan_batch4_pallas_total_fps / streaming_pallas_warp_fps
    (+ _pipelined): the fast-warp variants (plane-mix reformulation and
    the Pallas lane-gather kernels, ops/pallas/plane_warp.py) under the
    same protocols; end-metric drift characterized in PARITY.md
  - scan_pallas_as2d_fps (+ mfu_scan_pallas_as2d): warp kernels plus the
    EXACT conv3d-as-depth-shifted-conv2ds execution of the 3D stacks
    (models/layers.Decomp3DConv) — the post-warp-bottleneck candidate
  - train_fast_step_ms / train_fast_steps_per_sec_chip: the fast-training
    pick (plane-mix warps + conv3d-as-2d, targets the padded conv3d
    backward temps) next to the exact train_step_ms
  - baseline: the traceable vs_baseline denominator — the reference
    PyTorch implementation measured on THIS host (tools/measure_baseline.py
    -> BASELINE_MEASURED.json); no GPU exists here and the reference
    publishes no numbers (BASELINE.md), so implementation-vs-implementation
    on shared hardware is the only honest ratio.

Measurement hygiene (ARCHITECTURE.md): every timed step consumes a DISTINCT
freshly-uploaded frame AND every timed step's result is FETCHED to host.
Both are load-bearing on this environment's remote-execution relay:
repeated identical launches are elided, and `block_until_ready` WITHOUT a
data fetch returns without forcing execution at all (measured: the same
371-GFLOP step "completes" in 2.0 ms under block_until_ready-only timing —
impossible — vs ~170 ms when the depth map is actually fetched). Fetches
are timeout-protected; this environment's device->host path can wedge.
"""

from __future__ import annotations

import json
import os
import threading
import time

import numpy as np

N_TIMED = 30
N_TIMED_PALLAS = 10
SCAN_FRAMES = 20
V5E_BF16_PEAK_FLOPS = 197e12
FALLBACK_BASELINE_FPS = 12.5  # only if BASELINE_MEASURED.json is absent


def _fetch_with_timeout(x, seconds=180.0, label=""):
    """np.asarray(x) bounded by a timeout; falls back to block_until_ready."""
    import jax

    done = threading.Event()

    def _run():
        try:
            np.asarray(x)
        finally:
            done.set()

    th = threading.Thread(target=_run, daemon=True)
    th.start()
    if not done.wait(timeout=seconds):
        import sys

        jax.block_until_ready(x)
        print(f"WARNING: fetch timed out ({label}); "
              "block_until_ready-based timing", file=sys.stderr, flush=True)
        return False
    return True


def _time_streaming(runner, frames, n_timed, pipeline=False):
    """Steady-state streaming fps over n_timed DISTINCT frames.

    Every step's depth map is fetched to host inside the timed region —
    the realistic deployment loop (the consumer reads each depth map), and
    the only protocol this relay cannot elide or defer.

    pipeline=True fetches frame t-1's depth AFTER dispatching frame t's
    step (one frame of added latency), so the device->host transfer
    overlaps the next step's compute — the throughput-oriented consumer
    loop. Every map is still fetched; nothing is skipped or elided (each
    step's donated-memory dependency chains it to the previous one)."""
    out = None
    for f in frames[: len(frames) - n_timed]:
        out = runner.push_frame(f["img"], f["cam_pose"], f["cam_intr"])
    if out is not None:
        np.asarray(out)
    if not pipeline:
        t0 = time.perf_counter()
        t_dispatch = 0.0
        for f in frames[len(frames) - n_timed :]:
            td = time.perf_counter()
            out = runner.push_frame(f["img"], f["cam_pose"], f["cam_intr"])
            t_dispatch += time.perf_counter() - td
            np.asarray(out)
        fps = n_timed / (time.perf_counter() - t0)
        # host-side cost of the async dispatch itself (arg flattening +
        # upload + enqueue RPC; execution+fetch excluded) — the VERDICT #7
        # decomposition of the streaming-vs-scan gap
        _time_streaming.last_dispatch_ms = 1e3 * t_dispatch / n_timed
        return fps
    prev = None
    t0 = time.perf_counter()
    for f in frames[len(frames) - n_timed :]:
        out = runner.push_frame(f["img"], f["cam_pose"], f["cam_intr"])
        if prev is not None:
            np.asarray(prev)
        prev = out
    np.asarray(prev)
    return n_timed / (time.perf_counter() - t0)


def main():
    from estdepth_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    # The TPU relay in this environment has multi-hour outage windows
    # (backend init raises UNAVAILABLE or hangs — and a failed in-process
    # init is cached by jax for the life of the interpreter). The driver
    # runs bench once per round, so probe availability in a SUBPROCESS
    # (fresh interpreter per attempt) and wait out a transient outage
    # before touching jax in this process.
    import subprocess
    import sys
    for attempt in range(10):
        # NEVER SIGKILL a hung probe: a kill -9'd TPU process can wedge the
        # chip claim (CLAUDE.md), making the next probe hang too. SIGTERM
        # with a grace period lets the child release its claim.
        p = subprocess.Popen(
            [sys.executable, "-c", "import jax; jax.devices()"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        try:
            if p.wait(timeout=180) == 0:
                break
        except subprocess.TimeoutExpired:
            p.terminate()
            try:
                p.wait(timeout=30)
            except subprocess.TimeoutExpired:
                p.kill()
                p.wait()
        if attempt == 9:
            print("WARNING: backend still unavailable after 10 probes; "
                  "proceeding anyway", file=sys.stderr, flush=True)
            break
        print(f"WARNING: backend unavailable; probe {attempt + 1}/10, "
              "retry in 120 s", file=sys.stderr, flush=True)
        time.sleep(120.0)

    import jax
    import jax.numpy as jnp

    from estdepth_tpu.data.synthetic import (
        SyntheticSceneConfig, synthetic_stream,
    )
    from estdepth_tpu.eval.estm import ESTMRunner
    from estdepth_tpu.eval.sequence import make_sequence_processor
    from estdepth_tpu.models import DepthNetHybrid, ESTMemory

    h, w, nd = 256, 320, 64
    extras = {}
    model = DepthNetHybrid(
        ndepths=nd, depth_min=0.01, depth_max=10.0, resnet=50,
        est_transformer=True, dtype=jnp.bfloat16,
    )
    cfg = SyntheticSceneConfig(height=h, width=w)
    frames = list(synthetic_stream(cfg, n_frames=6 + N_TIMED))

    imgs0 = jnp.asarray(np.stack([f["img"] for f in frames[:3]])[None])
    poses0 = jnp.asarray(np.stack([f["cam_pose"] for f in frames[:3]])[None])
    intr0 = jnp.asarray(frames[0]["cam_intr"][None])
    # jitted init: eager init is pathologically slow on remote TPU backends
    variables = jax.jit(
        lambda r, i, p, k: model.init(r, i, p, k, train=False)
    )(jax.random.key(0), imgs0, poses0, intr0)

    # ---- streaming (deployment path: fetch every frame's depth) ---------
    # The fetched payload matches the reference's output protocol: it saves
    # exactly TWO maps per frame — refined scale-0 and fused scale-2 — as
    # float16 (eval_hybrid_seq.py:200-258). Fetching all 4 scales in fp32
    # (8x the bytes) is measured separately as streaming_full_fetch_fps.
    # one retry: the remote compile service occasionally 500s transiently,
    # and the driver needs the primary metric even then
    for attempt in range(2):
        try:
            runner = ESTMRunner(
                model, variables, h, w, lwindow=3, memory_size=2,
                output_scales=(0, 2), output_dtype=jnp.bfloat16,
            )
            streaming_fps = _time_streaming(runner, frames, N_TIMED)
            break
        except Exception:
            if attempt == 1:
                raise
            time.sleep(20.0)
    extras["streaming_fps"] = round(streaming_fps, 3)
    extras["streaming_ms_per_frame"] = round(1e3 / streaming_fps, 2)
    if hasattr(_time_streaming, "last_dispatch_ms"):
        # host dispatch (arg flatten + upload + enqueue) vs the rest of the
        # per-frame overhead (execution + ~30 ms fetch RPC)
        extras["dispatch_host_ms_per_frame"] = round(
            _time_streaming.last_dispatch_ms, 2
        )

    try:
        # fetch t-1 while t computes: transfer overlaps the next step
        pfps = _time_streaming(runner, frames, N_TIMED, pipeline=True)
        extras["streaming_pipelined_fps"] = round(pfps, 3)
    except Exception as e:
        extras["pipelined_error"] = f"{type(e).__name__}: {e}"[:120]

    try:
        frunner = ESTMRunner(model, variables, h, w, lwindow=3, memory_size=2)
        ffps = _time_streaming(frunner, frames[: 6 + N_TIMED_PALLAS],
                               N_TIMED_PALLAS)
        extras["streaming_full_fetch_fps"] = round(ffps, 3)
        del frunner
    except Exception as e:
        extras["full_fetch_error"] = f"{type(e).__name__}: {e}"[:120]

    # ---- compiled FLOPs / MFU of the steady-state window step -----------
    try:
        mem = ESTMemory.create(1, 2, nd, h // 4, w // 4, 16)
        mem = mem.replace(valid=jnp.ones_like(mem.valid))
        feats2 = jnp.zeros((1, 2, h // 4, w // 4, 32), jnp.bfloat16)

        # mirrors ESTMRunner's steady-state program: matching encoder on
        # the ONE new frame, cached features for the shared frames
        def step(v, i, f2, p, k, m):
            new_feat = model.apply(v, i[:, -1], method="compute_matching")
            feats = jnp.concatenate([f2, new_feat[:, None]], 1)
            out, (key, val, pose) = model.apply(
                v, i, p, k, memory=m, use_est=True, train=False,
                matching_feats=feats,
            )
            return out["depth"][:, 0], m.push(key, val, pose)

        compiled = (
            jax.jit(step)
            .lower(variables, imgs0, feats2, poses0, intr0, mem)
            .compile()
        )
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            extras["window_gflops"] = round(flops / 1e9, 1)
            extras["achieved_tflops"] = round(flops * streaming_fps / 1e12, 3)
            extras["mfu"] = round(
                flops * streaming_fps / V5E_BF16_PEAK_FLOPS, 5
            )
    except Exception as e:  # cost_analysis unsupported on some backends
        extras["mfu_error"] = f"{type(e).__name__}: {e}"[:120]

    # ---- whole-scene lax.scan mode (zero per-frame dispatch) -------------
    try:
        # same fetch protocol as the primary streaming metric (the two maps
        # the reference saves, half precision) so the streaming-vs-scan gap
        # isolates dispatch, not transfer size
        proc = make_sequence_processor(
            model, lwindow=3, memory_size=2,
            output_scales=(0, 2), output_dtype=jnp.bfloat16,
        )
        sf = list(synthetic_stream(cfg, n_frames=2 * SCAN_FRAMES))

        def clip(fr):
            return (
                jnp.asarray(np.stack([f["img"] for f in fr])[None]),
                jnp.asarray(np.stack([f["cam_pose"] for f in fr])[None]),
            )

        ca_imgs, ca_poses = clip(sf[:SCAN_FRAMES])      # compile clip
        cb_imgs, cb_poses = clip(sf[SCAN_FRAMES:])      # distinct timed clip
        # fetch (not just block) the warmup so no deferred work leaks into
        # the timed region
        _fetch_with_timeout(
            proc(variables, ca_imgs, ca_poses, intr0), label="scan-warmup",
        )
        n_windows = SCAN_FRAMES - 3 + 1
        # the host fetch is INSIDE the timed region: on this relay only a
        # fetch forces execution (block_until_ready alone does not)
        t0 = time.perf_counter()
        depths = proc(variables, cb_imgs, cb_poses, intr0)
        _fetch_with_timeout(depths, seconds=180.0, label="scan")
        dt = time.perf_counter() - t0
        scan_fps = n_windows / dt
        extras["scan_fps"] = round(scan_fps, 3)
        extras["dispatch_overhead_ms_per_frame"] = round(
            1e3 / streaming_fps - 1e3 * dt / n_windows, 2
        )
        if "window_gflops" in extras:
            # the honest compute ceiling: scan mode has zero per-frame
            # dispatch, so its MFU measures the kernel schedule, not the
            # relay's per-frame RPC floor (VERDICT r02 weak #2)
            sflops = extras["window_gflops"] * 1e9 * scan_fps
            extras["achieved_tflops_scan"] = round(sflops / 1e12, 3)
            extras["mfu_scan"] = round(sflops / V5E_BF16_PEAK_FLOPS, 5)
    except Exception as e:
        extras["scan_error"] = f"{type(e).__name__}: {e}"[:120]

    # ---- batched-scene scan (offline eval throughput) ---------------------
    # 4 INDEPENDENT scenes through ONE scan program (the processor is
    # batch-generic): this is how the TPU beats the reference's
    # one-scene-at-a-time offline loop (eval_hybrid_seq.py:124-193).
    # 8 distinct scenes total: 4 warm up the compile, 4 are timed.
    try:
        def scan_scenes(seed0):
            cfgs = [
                SyntheticSceneConfig(
                    height=h, width=w, seed=seed0 + 13 * s,
                    plane_offset=2.0 + 0.4 * s,
                    plane_normal=(0.12 - 0.07 * s, -0.08 + 0.05 * s, 1.0),
                    step_x=0.05 + 0.02 * s, step_z=0.01 + 0.008 * s,
                    yaw_per_frame=0.006 + 0.005 * s,
                )
                for s in range(4)
            ]
            streams = [
                list(synthetic_stream(c, n_frames=SCAN_FRAMES))
                for c in cfgs
            ]
            return (
                jnp.asarray(np.stack(
                    [[f["img"] for f in st] for st in streams]
                ).astype(np.float32)),
                jnp.asarray(np.stack(
                    [[f["cam_pose"] for f in st] for st in streams]
                ).astype(np.float32)),
                jnp.asarray(np.stack(
                    [st[0]["cam_intr"] for st in streams]
                ).astype(np.float32)),
            )

        wa_i, wa_p, wa_k = scan_scenes(101)
        tb_i, tb_p, tb_k = scan_scenes(401)
        _fetch_with_timeout(
            proc(variables, wa_i, wa_p, wa_k), seconds=240.0,
            label="scan-batch4-warmup",
        )
        n_windows = SCAN_FRAMES - 3 + 1
        t0 = time.perf_counter()
        depths4 = proc(variables, tb_i, tb_p, tb_k)
        _fetch_with_timeout(depths4, seconds=240.0, label="scan-batch4")
        dt4 = time.perf_counter() - t0
        extras["scan_batch4_total_fps"] = round(4 * n_windows / dt4, 3)
    except Exception as e:
        extras["scan_batch4_error"] = f"{type(e).__name__}: {e}"[:120]

    # ---- plane-mix frustum warp variant (fast_frustum=True) ---------------
    # the per-voxel trilinear gather is the profiled bottleneck of the
    # window step (tools/profile_scan.py: 24-30 ms of the ~84 ms window);
    # plane_mix reformulates it as a dense z-mix matmul + per-plane 2D
    # gather (measured 2x on the op). Same weights; sub-plane-spacing
    # interpolation deviation (tests/test_fast_frustum.py).
    try:
        proc_fast = make_sequence_processor(
            model.clone(fast_frustum=True), lwindow=3, memory_size=2,
            output_scales=(0, 2), output_dtype=jnp.bfloat16,
        )
        _fetch_with_timeout(
            proc_fast(variables, ca_imgs, ca_poses, intr0),
            seconds=240.0, label="scan-planemix-warmup",
        )
        n_windows = SCAN_FRAMES - 3 + 1
        t0 = time.perf_counter()
        depths_f = proc_fast(variables, cb_imgs, cb_poses, intr0)
        _fetch_with_timeout(depths_f, seconds=240.0, label="scan-planemix")
        dtf = time.perf_counter() - t0
        extras["scan_planemix_fps"] = round(n_windows / dtf, 3)
    except Exception as e:
        extras["scan_planemix_error"] = f"{type(e).__name__}: {e}"[:120]

    # ---- Pallas lane-gather warp variant (pallas_warp=True) ---------------
    # Both hot warps (EST frustum + cost-volume plane-sweep) leave the
    # gather engine entirely: z-mix and the two-pass homography resample
    # run as same-shape vreg lane gathers on the VPU
    # (ops/pallas/plane_warp.py; tolerances in tests/test_pallas_warp.py).
    try:
        proc_pl = make_sequence_processor(
            model.clone(pallas_warp=True), lwindow=3, memory_size=2,
            output_scales=(0, 2), output_dtype=jnp.bfloat16,
        )
        _fetch_with_timeout(
            proc_pl(variables, ca_imgs, ca_poses, intr0),
            seconds=240.0, label="scan-pallas-warmup",
        )
        n_windows = SCAN_FRAMES - 3 + 1
        t0 = time.perf_counter()
        depths_p = proc_pl(variables, cb_imgs, cb_poses, intr0)
        _fetch_with_timeout(depths_p, seconds=240.0, label="scan-pallas")
        dtp = time.perf_counter() - t0
        pallas_scan_fps = n_windows / dtp
        extras["scan_pallas_fps"] = round(pallas_scan_fps, 3)
        if "window_gflops" in extras:
            pflops = extras["window_gflops"] * 1e9 * pallas_scan_fps
            extras["mfu_scan_pallas"] = round(pflops / V5E_BF16_PEAK_FLOPS, 5)

        # max offline throughput: 4 independent scenes x pallas warps
        # through one batched scan program (distinct scenes per stream,
        # same protocol as scan_batch4_total_fps)
        _fetch_with_timeout(
            proc_pl(variables, wa_i, wa_p, wa_k), seconds=300.0,
            label="scan-batch4-pallas-warmup",
        )
        t0 = time.perf_counter()
        depths4p = proc_pl(variables, tb_i, tb_p, tb_k)
        _fetch_with_timeout(depths4p, seconds=300.0, label="scan-batch4-pallas")
        dt4p = time.perf_counter() - t0
        extras["scan_batch4_pallas_total_fps"] = round(
            4 * n_windows / dt4p, 3
        )
    except Exception as e:
        extras["scan_pallas_error"] = f"{type(e).__name__}: {e}"[:120]

    # ---- Pallas warps + exact conv3d-as-2d (the combined candidate) -------
    # After the warp kernels, the window step's residual is the 3D conv
    # stacks (C=16/32 minor dims); conv3d_as2d evaluates each 3x3x3 conv as
    # three depth-shifted conv2ds over a [B*D,H,W,C] batch — numerically
    # exact, same parameters (models/layers.Decomp3DConv).
    try:
        proc_pa = make_sequence_processor(
            model.clone(pallas_warp=True, conv3d_as2d=True), lwindow=3,
            memory_size=2, output_scales=(0, 2), output_dtype=jnp.bfloat16,
        )
        _fetch_with_timeout(
            proc_pa(variables, ca_imgs, ca_poses, intr0),
            seconds=240.0, label="scan-pallas-as2d-warmup",
        )
        n_windows = SCAN_FRAMES - 3 + 1
        t0 = time.perf_counter()
        depths_pa = proc_pa(variables, cb_imgs, cb_poses, intr0)
        _fetch_with_timeout(depths_pa, seconds=240.0, label="scan-pallas-as2d")
        dtpa = time.perf_counter() - t0
        pa_fps = n_windows / dtpa
        extras["scan_pallas_as2d_fps"] = round(pa_fps, 3)
        if "window_gflops" in extras:
            paf = extras["window_gflops"] * 1e9 * pa_fps
            extras["mfu_scan_pallas_as2d"] = round(
                paf / V5E_BF16_PEAK_FLOPS, 5
            )
    except Exception as e:
        extras["scan_pallas_as2d_error"] = f"{type(e).__name__}: {e}"[:120]

    # ---- fused Pallas EST attention variant ------------------------------
    if os.environ.get("ESTDEPTH_BENCH_PALLAS", "1") != "0":
        try:
            pmodel = DepthNetHybrid(
                ndepths=nd, depth_min=0.01, depth_max=10.0, resnet=50,
                est_transformer=True, dtype=jnp.bfloat16,
                use_pallas_attention=True,
            )
            prunner = ESTMRunner(
                pmodel, variables, h, w, lwindow=3, memory_size=2,
                output_scales=(0, 2), output_dtype=jnp.bfloat16,
            )
            pfps = _time_streaming(
                prunner, frames[: 6 + N_TIMED_PALLAS], N_TIMED_PALLAS
            )
            extras["pallas_streaming_fps"] = round(pfps, 3)
        except Exception as e:
            extras["pallas_error"] = f"{type(e).__name__}: {e}"[:120]

    # ---- online streaming with the Pallas lane-gather warps ---------------
    # same strict fetch-per-frame protocol as the headline streaming number,
    # so (this - streaming_fps) isolates the warp-kernel win in the
    # latency-critical serving path. NOT under ESTDEPTH_BENCH_PALLAS: that
    # gate controls the (known-tied) fused-attention variant only.
    try:
        wrunner = ESTMRunner(
            model.clone(pallas_warp=True), variables, h, w,
            lwindow=3, memory_size=2,
            output_scales=(0, 2), output_dtype=jnp.bfloat16,
        )
        wfps = _time_streaming(
            wrunner, frames[: 6 + N_TIMED_PALLAS], N_TIMED_PALLAS
        )
        extras["streaming_pallas_warp_fps"] = round(wfps, 3)
        # same program, fetch pipelined one frame deep: compute (~27 ms
        # window) overlaps the ~30 ms relay fetch — the serving
        # throughput ceiling of this build environment
        wpfps = _time_streaming(
            wrunner, frames[: 6 + N_TIMED_PALLAS], N_TIMED_PALLAS,
            pipeline=True,
        )
        extras["streaming_pallas_warp_pipelined_fps"] = round(wpfps, 3)
        wrunner = None  # noqa: F841
    except Exception as e:
        extras["pallas_warp_error"] = f"{type(e).__name__}: {e}"[:120]

    # ---- serving variants -------------------------------------------------
    try:
        # latency: fetch only the refined (scale-0) map, bf16 — 8x less
        # device->host transfer per frame than the default 4-scale fp32
        srunner = ESTMRunner(
            model, variables, h, w, lwindow=3, memory_size=2,
            output_scales=(0,), output_dtype=jnp.bfloat16,
        )
        sfps = _time_streaming(
            srunner, frames[: 6 + N_TIMED_PALLAS], N_TIMED_PALLAS
        )
        extras["serving_scale0_bf16_fps"] = round(sfps, 3)
    except Exception as e:
        extras["serving_error"] = f"{type(e).__name__}: {e}"[:120]

    try:
        # throughput: 4 independent streams batched in one step, each
        # stream fed DISTINCT frames (push_frame accepts [B, H, W, 3])
        brunner = ESTMRunner(
            model, variables, h, w, lwindow=3, memory_size=2, batch=4,
            output_scales=(0,), output_dtype=jnp.bfloat16,
        )
        # four INDEPENDENT scenes — distinct seeds, geometry, and camera
        # paths per stream (distinct buffers alone are not enough: this
        # relay partially elides near-identical content, and identical
        # data within one batched step distorts timing — CLAUDE.md)
        bcfgs = [
            SyntheticSceneConfig(
                height=h, width=w, seed=11 * s + 3,
                plane_offset=2.0 + 0.5 * s,
                plane_normal=(0.15 - 0.08 * s, -0.1 + 0.06 * s, 1.0),
                step_x=0.06 + 0.02 * s, step_z=0.015 + 0.01 * s,
                yaw_per_frame=0.008 + 0.004 * s,
            )
            for s in range(4)
        ]
        bstreams = [
            list(synthetic_stream(c, n_frames=6 + N_TIMED_PALLAS))
            for c in bcfgs
        ]
        bframes = [
            {
                "img": np.stack([st[i]["img"] for st in bstreams]),
                "cam_pose": np.stack([st[i]["cam_pose"] for st in bstreams]),
                "cam_intr": np.stack([st[i]["cam_intr"] for st in bstreams]),
            }
            for i in range(6 + N_TIMED_PALLAS)
        ]
        bfps = _time_streaming(brunner, bframes, N_TIMED_PALLAS)
        extras["batch4_total_fps"] = round(4 * bfps, 3)
    except Exception as e:
        extras["batch4_error"] = f"{type(e).__name__}: {e}"[:120]

    # ---- training throughput (flagship config, single chip) --------------
    if os.environ.get("ESTDEPTH_BENCH_TRAIN", "1") != "0":
        try:
            # free the eval-side device state first: the train step's working
            # set is most of HBM
            runner = prunner = srunner = brunner = proc = None  # noqa: F841

            from estdepth_tpu.data.synthetic import synthetic_window
            from estdepth_tpu.parallel.mesh import (
                create_mesh, replicate, shard_batch,
            )
            from estdepth_tpu.train.schedule import warmup_multistep_schedule
            from estdepth_tpu.train.trainer import (
                create_train_state, make_optimizer, make_train_step,
            )

            mesh = create_mesh(1)
            tmodel = DepthNetHybrid(
                ndepths=nd, depth_min=0.01, depth_max=10.0, resnet=50,
                est_transformer=True, bn_axis_name="data",
                dtype=jnp.bfloat16,
            )
            batch = {
                k: jnp.asarray(v)
                for k, v in synthetic_window(cfg, n_frames=5).items()
            }
            tx = make_optimizer(warmup_multistep_schedule(4e-5, 1000))
            state = create_train_state(tmodel, jax.random.key(0), batch, tx)
            state = replicate(state, mesh)
            sharded = shard_batch(batch, mesh)
            step_fn = make_train_step(tmodel, tx, mesh, 0.01, 10.0)
            rng_b = np.random.default_rng(1)
            imgs_host = np.asarray(batch["imgs"])

            def one_step(st):
                # distinct batch + scalar fetch: anti-elision hygiene
                b = dict(sharded)
                b["imgs"] = jnp.asarray(
                    imgs_host
                    + rng_b.normal(0, 1e-2, imgs_host.shape).astype(
                        np.float32
                    )
                )
                st, scalars = step_fn(st, b, jnp.float32(10.0))
                return st, float(scalars["loss"])

            state, _ = one_step(state)
            state, _ = one_step(state)
            t0 = time.perf_counter()
            n_train = 5
            for _ in range(n_train):
                state, loss = one_step(state)
            t_step = (time.perf_counter() - t0) / n_train
            extras["train_step_ms"] = round(1e3 * t_step, 1)
            extras["train_steps_per_sec_chip"] = round(1.0 / t_step, 3)

            # fast-training pick: plane-mix warps + conv3d-as-2d execution
            # (tools/experiments/train_warp_modes.py measured 798 -> 503
            # ms/step; end-metric drift characterized via
            # parity_gate --variant plane_mix --conv3d-as2d)
            try:
                state = step_fn = None  # free the exact step's working set
                fmodel = tmodel.clone(fast_frustum=True, conv3d_as2d=True)
                fstate = create_train_state(
                    fmodel, jax.random.key(0), batch, tx)
                fstate = replicate(fstate, mesh)
                fstep_fn = make_train_step(fmodel, tx, mesh, 0.01, 10.0)

                def fast_step(st):
                    b = dict(sharded)
                    b["imgs"] = jnp.asarray(
                        imgs_host
                        + rng_b.normal(0, 1e-2, imgs_host.shape).astype(
                            np.float32
                        )
                    )
                    st, scalars = fstep_fn(st, b, jnp.float32(10.0))
                    return st, float(scalars["loss"])

                fstate, _ = fast_step(fstate)
                fstate, _ = fast_step(fstate)
                t0 = time.perf_counter()
                for _ in range(n_train):
                    fstate, _ = fast_step(fstate)
                tf_step = (time.perf_counter() - t0) / n_train
                extras["train_fast_step_ms"] = round(1e3 * tf_step, 1)
                extras["train_fast_steps_per_sec_chip"] = round(
                    1.0 / tf_step, 3)
            except Exception as e:
                extras["train_fast_error"] = f"{type(e).__name__}: {e}"[:120]
        except Exception as e:
            extras["train_error"] = f"{type(e).__name__}: {e}"[:120]

    # ---- traceable baseline ----------------------------------------------
    mb_path = os.path.join(os.path.dirname(__file__) or ".",
                           "BASELINE_MEASURED.json")
    if os.path.exists(mb_path):
        with open(mb_path) as f:
            mb = json.load(f)
        baseline_fps = mb["reference_torch_cpu"]["fps"]
        extras["baseline"] = {
            "fps": baseline_fps,
            "source": "reference torch implementation measured on this "
                      "host's CPU, identical weights+protocol "
                      "(BASELINE_MEASURED.json)",
            "our_jax_cpu_fps": mb["estdepth_tpu_jax_cpu"]["fps"],
        }
    else:
        baseline_fps = FALLBACK_BASELINE_FPS
        extras["baseline"] = {
            "fps": baseline_fps,
            "source": "ASSUMED (no BASELINE_MEASURED.json; run "
                      "tools/measure_baseline.py)",
        }

    print(
        json.dumps(
            {
                "metric": "estm_streaming_throughput",
                "value": round(streaming_fps, 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(streaming_fps / baseline_fps, 3),
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
