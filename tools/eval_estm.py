#!/usr/bin/env python
"""ESTM streaming evaluation (the latency-critical path).

TPU-native equivalent of /root/reference/eval_hybrid_seq.py: per scene,
stream frames one at a time through a local window (lwindow=3) with a FIFO
memory of 2 detached key/value cost volumes; dump per-frame depth (.npy +
colorized .jpg), report mean inference time and offline metrics.

Warp defaults to the parity-gated fast recipe (pallas+exact-z on TPU,
plane-mix+exact-z elsewhere — 1.19e-7 abs_rel vs the actual reference
under f32 numerics, within 2e-6 of `exact` on chip; PARITY.md);
`--exact-warp` restores reference trilinear semantics. The tool defaults
to `--precision high` (round-5 flip): it removes the TPU backend's
default-matmul-precision term (~1.15e-3 model-wide vs torch-f32 — the
on-chip gate passes at 1.4e-5) and measures FREE on the shipped bf16
stack; `--precision default` restores the backend's one-bf16-pass mode.

Usage:
  python tools/eval_estm.py --synthetic                       # hermetic
  python tools/eval_estm.py --datapath /data/scannet_test \
      --testlist data/splits/test_split.txt --outdir out/
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
    p.add_argument("--datapath", type=str, default=None)
    p.add_argument("--testlist", type=str, default=None)
    p.add_argument("--eval-dataset", choices=["scannet", "7scenes"],
                   default="scannet")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--outdir", type=str, default=None)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--ndepths", type=int, default=64)
    p.add_argument("--depth-min", type=float, default=0.01)
    p.add_argument("--depth-max", type=float, default=10.0)
    p.add_argument("--resnet", type=int, default=50)
    p.add_argument("--lwindow", type=int, default=3)
    p.add_argument("--memory-size", type=int, default=2)
    p.add_argument("--frame-interval", type=int, default=10)
    p.add_argument("--start-index", type=int, default=0,
                   help="offset of the first subsampled frame (reference "
                        "start_i, general_eval_seq.py:48-49)")
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--save-maps", action="store_true")
    p.add_argument("--scan", action="store_true",
                   help="offline whole-scene mode: process each scene in "
                        "compiled fixed-size chunks (eval/sequence.py "
                        "SequenceProcessor) — identical outputs to "
                        "streaming, amortized dispatch")
    p.add_argument("--chunk", type=int, default=16,
                   help="frames per compiled chunk in --scan mode")
    p.add_argument("--scene-batch", type=int, default=1,
                   help="in --scan mode, evaluate this many independent "
                        "scenes per batched program (throughput mode; "
                        "outputs identical to scene-batch 1)")
    p.add_argument("--fast-frustum", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="plane-mix EST memory warps (ops/warp.py): ~2x on "
                        "the profiled hot op; sub-plane-spacing deviation "
                        "from the exact trilinear (test_fast_frustum.py). "
                        "Default: auto — ON (with --exact-z) when "
                        "--pallas-warp is off, i.e. on non-TPU backends")
    p.add_argument("--pallas-warp", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="route BOTH hot warps through the Pallas "
                        "lane-gather kernels (ops/pallas/plane_warp.py): "
                        "no gather engine on the critical path; implies "
                        "plane-mix z semantics plus a sub-pixel two-pass "
                        "deviation (test_pallas_warp.py). Eval-only. "
                        "Default: auto — ON on TPU (with --exact-z, the "
                        "parity-gated fast recipe, PARITY.md 1.19e-7)")
    p.add_argument("--exact-warp", action="store_true",
                   help="reference-exact trilinear warp semantics "
                        "(homo_utils.py:240-279): disables the parity-"
                        "gated fast-warp default (equivalent to "
                        "--no-fast-frustum --no-pallas-warp --no-exact-z)")
    p.add_argument("--fetch-half", action="store_true",
                   help="fetch the per-frame maps in bfloat16 instead of "
                        "fp32 — protocol-exact (the reference saves "
                        "float16 .npy, eval_hybrid_seq.py:200-258; the "
                        "dumps here are float16 either way) and half the "
                        "device->host transfer, the serving-latency "
                        "streaming pick (bench streaming_fps protocol)")
    p.add_argument("--exact-z", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="upgrade --fast-frustum / --pallas-warp with the "
                        "slope-carry exact-z correction "
                        "(ops/warp_exact_z.py): the fast warps' dominant "
                        "deviation drops to second order for ~2x their "
                        "resample cost — the parity-fast eval pick. "
                        "Default: ON whenever a fast warp is on")
    p.add_argument("--packed-warp", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="ride the exact-z Pallas kernels' tap/slope pair "
                        "as origin-shifted bf16 int32 lanes "
                        "(ops/pallas/plane_warp_exact_z.py): plain "
                        "plane-mix kernel traffic, 1.22x scan throughput, "
                        "parity still at float noise (6.56e-7, PARITY.md). "
                        "Default: ON with --pallas-warp --exact-z (the TPU "
                        "default); no effect on other warp modes")
    p.add_argument("--conv3d-as2d", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="run every 3x3x3 conv as three depth-shifted "
                        "conv2ds over a [B*D,H,W,C] fused batch "
                        "(models/layers.Decomp3DConv) — numerically exact, "
                        "identical parameter tree. Default ON (measured "
                        "+11%% eval scan); --no-conv3d-as2d restores "
                        "native conv3d lowering")
    p.add_argument("--precision", choices=["default", "high", "highest"],
                   default="high",
                   help="global matmul/conv precision. TPU's backend "
                        "default runs f32 matmuls as ONE bf16 pass — a "
                        "model-wide ~1.15e-3 end-metric drift vs f32 "
                        "numerics shared by EVERY warp variant incl. "
                        "--exact-warp. The TOOL default is 'high' (3 "
                        "passes): on-chip parity gate 1.4e-5, measured "
                        "FREE on the shipped bf16 stack (39.8 vs 37.8 fps "
                        "scan, within variance — BENCH r05; bf16 convs are "
                        "unaffected by f32 precision). '--precision "
                        "default' restores the backend default, 'highest' "
                        "(6 passes) gives 8.0e-7 (PARITY.md)")
    p.add_argument("--reference-layout", action="store_true",
                   help="write outputs in the reference's directory layout "
                        "(<outdir>/<scene>/{init_depth,init_prob,"
                        "refined_depth,refined_prob}/<frame>.npy+.jpg, "
                        "eval_hybrid_seq.py:144-258) — implies per-frame "
                        "prob maps; streaming mode only")
    return p.parse_args()


def build_model_and_params(args):
    import jax
    import jax.numpy as jnp

    from estdepth_tpu.config import resolve_warp_args
    from estdepth_tpu.models import DepthNetHybrid
    from estdepth_tpu.utils.platform import apply_matmul_precision

    # tri-state warp flags -> the shipped parity-gated fast default
    # (pallas+exact-z on TPU, plane-mix+exact-z elsewhere; --exact-warp
    # restores reference trilinear semantics)
    resolve_warp_args(args)
    apply_matmul_precision(getattr(args, "precision", None))
    model = DepthNetHybrid(
        ndepths=args.ndepths, depth_min=args.depth_min,
        depth_max=args.depth_max, resnet=args.resnet, est_transformer=True,
        dtype=jnp.bfloat16 if args.bf16 else None,
        fast_frustum=getattr(args, "fast_frustum", False),
        pallas_warp=getattr(args, "pallas_warp", False),
        exact_z_warp=getattr(args, "exact_z", False),
        packed_exact_z=getattr(args, "packed_warp", False),
        conv3d_as2d=getattr(args, "conv3d_as2d", True),
    )
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.uniform(0, 255, size=(1, args.lwindow, args.height, args.width, 3))
        .astype(np.float32)
    )
    poses = np.tile(np.eye(4, dtype=np.float32)[None, None],
                    (1, args.lwindow, 1, 1))
    intr = jnp.asarray(np.eye(3, dtype=np.float32)[None] * 100.0)
    # jitted init: eager init is pathologically slow on remote TPU backends
    variables = jax.jit(lambda r, i, p, k: model.init(r, i, p, k, train=False))(
        jax.random.key(0), imgs, jnp.asarray(poses), intr
    )
    if args.ckpt:
        if args.ckpt.endswith((".ckpt", ".pth", ".pt", ".tar")):
            # reference torch checkpoint -> converted variables
            from estdepth_tpu.utils.convert import load_torch_checkpoint

            variables, unmatched = load_torch_checkpoint(args.ckpt, strict=False)
            if unmatched:
                print(f"converter skipped {len(unmatched)} torch keys")
            print(f"converted torch checkpoint {args.ckpt}")
        else:
            # orbax TrainState directory from tools/train.py
            import orbax.checkpoint as ocp

            mgr = ocp.CheckpointManager(os.path.abspath(args.ckpt))
            step = mgr.latest_step()
            restored = mgr.restore(step)
            variables = {
                "params": restored["params"],
                "batch_stats": restored["batch_stats"],
            }
            print(f"restored checkpoint step {step} from {args.ckpt}")
    return model, variables


def score(pred: np.ndarray, gt: np.ndarray, mask: np.ndarray):
    """Resize pred to GT resolution and compute the offline metric suite."""
    import cv2

    from estdepth_tpu.eval.metric_offline import compute_errors

    pred_up = cv2.resize(pred, (gt.shape[1], gt.shape[0]))
    gt = np.where(mask, gt, 0.0)
    return compute_errors(pred_up, gt)


def run_scenes_scan(proc, named_scenes, args, outdir=None):
    """Chunked-scan evaluation of 1..scene_batch scenes per batched program
    (same outputs as streaming; see SequenceProcessor.process_scenes)."""
    from estdepth_tpu.utils.viz import colorize_depth, save_image

    kept = []  # (name, frames) with enough frames
    for scene, frames in named_scenes:
        frames = list(frames)
        if args.max_frames:
            frames = frames[: args.max_frames + args.lwindow - 1]
        if len(frames) >= args.lwindow:
            kept.append((scene, frames))
    if not kept:
        return [], []

    # pad a partial final group to the full --scene-batch width by
    # repeating the first scene (outputs dropped below): the batched chunk
    # programs are compiled for B=scene_batch, and a smaller tail group
    # would recompile both through the remote-compile relay (minutes)
    n_real = len(kept)
    batch = list(kept)
    while len(batch) < args.scene_batch:
        batch.append(kept[0])

    t0 = time.perf_counter()
    results = proc.process_scenes(
        [
            (
                # dtype preserved: uint8 dataset frames upload at 1/4 the
                # float32 bytes (SequenceProcessor casts on device)
                np.stack([f["img"] for f in frames]),
                np.stack([f["cam_pose"] for f in frames]).astype(np.float32),
                frames[0]["cam_intr"],
            )
            for _, frames in batch
        ]
    )[:n_real]
    dt = time.perf_counter() - t0
    n_total = sum(len(d) for d in results)
    times = [dt / n_total] * n_total
    for (scene, _), depths in zip(kept, results):
        print(f"{scene}: {len(depths)} windows "
              f"(scan batch of {len(batch)})")

    errs = []
    for (scene, frames), depths in zip(kept, results):
        for wi, d in enumerate(depths):
            # the emitted depth belongs to the window's CENTER frame
            # (eval_hybrid_seq.py:202 saves under img_paths[lwindow // 2])
            f = frames[wi + args.lwindow // 2]
            refined, init = d[0], d[1]  # output_scales=(0, 2)
            if f.get("dmap") is not None:
                errs.append(score(refined, f["dmap"], f["dmask"]))
            if outdir and args.save_maps:
                base = os.path.join(
                    outdir, f"{scene}_{wi + args.lwindow // 2:06d}"
                )
                np.save(base + "_depth.npy", refined.astype(np.float16))
                np.save(base + "_init.npy", init.astype(np.float16))
                save_image(
                    base + "_depth.jpg",
                    colorize_depth(refined, args.depth_min, args.depth_max),
                )
    return times, errs


def _write_reference_layout(outdir, scene, idx, refined, init, probs,
                            depth_max):
    """Reference output tree: <outdir>/<scene>/{init_depth,init_prob,
    refined_depth,refined_prob}/<frame>.npy + colorized .jpg
    (eval_hybrid_seq.py:144-156,200-258). Note the reference's naming: its
    'init_depth' is the fused scale-2 head, 'refined_depth' is scale-0."""
    from estdepth_tpu.utils.viz import (
        colorize_depth, colorize_probmap, save_image,
    )

    base = os.path.join(outdir, scene)
    maps = {
        "init_depth": (init, "depth"),
        "refined_depth": (refined, "depth"),
        "init_prob": (np.asarray(probs[0, 0]), "prob"),
        "refined_prob": (np.asarray(probs[0, 1]), "prob"),
    }
    for kind, (arr, flavor) in maps.items():
        d = os.path.join(base, kind)
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, f"{idx:06d}.npy"), arr.astype(np.float16))
        img = (
            colorize_depth(arr, 0.0, min(depth_max, 5.0))
            if flavor == "depth" else colorize_probmap(arr)
        )
        save_image(os.path.join(d, f"{idx:06d}.jpg"), img)


def run_scene(runner, frames, args, outdir=None, scene=""):
    """Streaming eval with a one-frame-deep fetch pipeline: frame t's step
    is dispatched, THEN frame t-1's depth is read/scored/saved while t
    computes on the device. Every map is still fetched; the overlap was
    measured at ~2x streaming throughput (bench.py
    streaming_pipelined_fps vs streaming_fps) because the device->host
    transfer is half the per-frame wall time through this path."""
    from estdepth_tpu.utils.viz import colorize_depth, save_image

    def consume(pending):
        out, cidx, cf = pending
        depth, probs = out if isinstance(out, tuple) else (out, None)
        # runner output is trimmed to the two scored maps: index 0 is the
        # refined scale-0 map, index 1 the fused-head scale-2 map
        refined = np.asarray(depth[0, 0], dtype=np.float32)
        init = np.asarray(depth[0, 1], dtype=np.float32)
        err = (
            score(refined, cf["dmap"], cf["dmask"])
            if cf.get("dmap") is not None else None
        )
        if outdir and args.reference_layout and probs is not None:
            _write_reference_layout(
                outdir, scene, cidx, refined, init, np.asarray(probs),
                args.depth_max,
            )
        elif outdir and args.save_maps:
            base = os.path.join(outdir, f"{scene}_{cidx:06d}")
            np.save(base + "_depth.npy", refined.astype(np.float16))
            np.save(base + "_init.npy", init.astype(np.float16))
            save_image(base + "_depth.jpg",
                       colorize_depth(refined, args.depth_min,
                                      args.depth_max))
        return err

    runner.reset()
    times, errs = [], []
    emitted = 0
    pending = None  # (out, center_idx, center_frame) awaiting fetch
    window = []  # recent frames; the emitted depth is the CENTER frame's
    for idx, f in enumerate(frames):
        window.append((idx, f))
        if len(window) > args.lwindow:
            window.pop(0)
        t0 = time.perf_counter()
        out = runner.push_frame(f["img"], f["cam_pose"], f["cam_intr"])
        if pending is not None:
            err = consume(pending)
            pending = None
            if err is not None:
                errs.append(err)
        if out is not None:
            # score/save against the window's center frame
            # (eval_hybrid_seq.py:202: img_paths[lwindow // 2])
            cidx, cf = window[args.lwindow // 2]
            pending = (out, cidx, cf)
            times.append(time.perf_counter() - t0)
            emitted += 1
        if args.max_frames and emitted >= args.max_frames:
            break
    if pending is not None:
        err = consume(pending)
        if err is not None:
            errs.append(err)
    return times, errs


def main():
    args = parse_args()
    print("args:", vars(args))  # print_args equivalent (utils/utils.py:8-12)

    from estdepth_tpu.eval.estm import ESTMRunner
    from estdepth_tpu.eval.sequence import SequenceProcessor

    model, variables = build_model_and_params(args)
    import jax.numpy as jnp

    fetch_dtype = jnp.bfloat16 if getattr(args, "fetch_half", False) else None
    if args.scan:
        # fetch only the two scored maps (refined scale-0, fused scale-2):
        # half the device->host transfer per chunk
        proc = SequenceProcessor(
            model, variables, args.lwindow, args.memory_size,
            chunk=args.chunk, output_scales=(0, 2),
            output_dtype=fetch_dtype,
        )
        runner = None
    else:
        # fetch only the two maps the protocol saves/scores (refined
        # scale-0 + fused scale-2, eval_hybrid_seq.py:200-258) — 2x less
        # device->host transfer per frame than all four scales
        runner = ESTMRunner(
            model, variables, args.height, args.width, args.lwindow,
            args.memory_size, return_probs=args.reference_layout,
            output_scales=(0, 2), output_dtype=fetch_dtype,
        )

    scan_group = []  # scenes queued for one batched --scene-batch program

    def process(frames, outdir, scene):
        if args.scan:
            scan_group.append((scene, list(frames)))
            if len(scan_group) < args.scene_batch:
                return [], []
            group = list(scan_group)
            scan_group.clear()
            return run_scenes_scan(proc, group, args, outdir)
        return run_scene(runner, frames, args, outdir, scene)

    if args.outdir:
        os.makedirs(args.outdir, exist_ok=True)

    all_times, all_errs = [], []
    if args.synthetic:
        from estdepth_tpu.data.synthetic import (
            SyntheticSceneConfig, synthetic_stream,
        )

        for seed in range(2):
            cfg = SyntheticSceneConfig(
                height=args.height, width=args.width, seed=seed
            )
            frames = list(synthetic_stream(cfg, n_frames=12))
            times, errs = process(frames, args.outdir, f"synthetic{seed}")
            all_times += times
            all_errs += errs
    else:
        from estdepth_tpu.data.eval_stream import StreamEvalDataset
        from estdepth_tpu.data.eval_windows import SEVEN_SCENES_TEST_SEQS
        from estdepth_tpu.data.io_utils import read_split_file

        assert args.datapath
        ds = StreamEvalDataset(
            args.datapath, args.height, args.width,
            depth_min=args.depth_min, depth_max=min(args.depth_max, 5.0),
            frame_interval=args.frame_interval,
            scannet_layout=args.eval_dataset == "scannet",
            start_index=args.start_index,
        )
        if args.eval_dataset == "scannet":
            scenes = read_split_file(args.testlist) if args.testlist else (
                sorted(os.listdir(args.datapath)))
            scene_seqs = [(s, None) for s in scenes]
        else:
            scene_seqs = SEVEN_SCENES_TEST_SEQS
        for scene, seq in scene_seqs:
            name = scene if seq is None else f"{scene}_{seq}"
            if args.outdir and args.save_maps:
                import glob as _glob

                # skip-completed-scenes resume (eval_hybrid_seq.py:289-290)
                if _glob.glob(os.path.join(args.outdir, f"{name}_*_depth.npy")):
                    print(f"{name}: outputs exist, skipping")
                    continue
            ds.reset(scene, seq)
            times, errs = process(iter(ds), args.outdir, name)
            all_times += times
            all_errs += errs
            if not args.scan:
                # scan mode reports per scene inside run_scenes_scan (a
                # queued scene would otherwise misread as "0 frames")
                print(f"{name}: {len(times)} frames")

    if scan_group:  # flush a partial final scene batch
        times, errs = run_scenes_scan(proc, scan_group, args, args.outdir)
        all_times += times
        all_errs += errs
    if all_times:
        # skip the first few (compile) when reporting, like steady-state fps
        steady = all_times[4:] or all_times
        print(f"inference time: {np.mean(steady):.4f}s "
              f"({1.0/np.mean(steady):.2f} fps)")
    if all_errs:
        keys = ["abs_relative", "sq_relative", "rmse", "rmse_log",
                "ratio_threshold_1.25"]
        means = {k: float(np.mean([e[k] for e in all_errs])) for k in keys}
        print("metrics:", " ".join(f"{k}={v:.4f}" for k, v in means.items()))


if __name__ == "__main__":
    main()
