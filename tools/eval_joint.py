#!/usr/bin/env python
"""Joint-mode evaluation: 5-frame windows, 3 depth maps per window.

TPU-native equivalent of /root/reference/eval_hybrid.py: per scene, windows
of seq_length frames advance by (seq_length-2) frames so targets tile the
video; the last target's detached key/value volume threads to the next
window as a 1-entry EST memory (eval_hybrid.py:229-243).

Usage:
  python tools/eval_joint.py --synthetic
  python tools/eval_joint.py --datapath /data/7scenes --eval-dataset 7scenes
"""

from __future__ import annotations

import argparse
import os
import sys

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
    p.add_argument("--seq-length", type=int, default=5)
    p.add_argument("--frame-interval", type=int, default=10)
    p.add_argument("--eval-all", action="store_true",
                   help="densify: windows from every start offset "
                        "(reference --eval_all, general_eval.py:46-50)")
    p.add_argument("--no-est", action="store_true")
    p.add_argument("--keyframe-list", type=str, default=None,
                   help="evaluate (scene, index) keyframe windows "
                        "(ScannetTestDataset mode, scannet_select.py)")
    p.add_argument("--max-windows", type=int, default=None)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--save-maps", action="store_true")
    p.add_argument("--fast-frustum", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="plane-mix EST memory warps (see eval_estm.py); "
                        "default auto — ON off-TPU, with --exact-z")
    p.add_argument("--pallas-warp", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="Pallas lane-gather warps (see eval_estm.py); "
                        "default auto — ON on TPU, with --exact-z (the "
                        "parity-gated fast recipe, PARITY.md 1.19e-7)")
    p.add_argument("--exact-z", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="slope-carry exact-z correction on the fast warps "
                        "(see eval_estm.py); default ON with a fast warp")
    p.add_argument("--packed-warp", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="origin-shifted bf16 int32-lane transport for the "
                        "exact-z Pallas kernels (see eval_estm.py); "
                        "default ON with --pallas-warp --exact-z")
    p.add_argument("--exact-warp", action="store_true",
                   help="reference-exact trilinear warp semantics — "
                        "disables the parity-gated fast-warp default")
    p.add_argument("--conv3d-as2d", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="exact 3x3x3-as-depth-shifted-conv2ds execution "
                        "(see eval_estm.py); default ON")
    p.add_argument("--save-probs", action="store_true",
                   help="also dump per-target init/refined probability maps "
                        "(eval_hybrid.py:59-62 save_init_prob/"
                        "save_refined_prob, default off there too)")
    p.add_argument("--scan", action="store_true",
                   help="whole-scene lax.scan evaluation: the window chain "
                        "of a scene runs as ONE compiled program (zero "
                        "per-window dispatch; identical outputs — "
                        "tests/test_joint_scan.py). Scenes whose chain has "
                        "pose-skip gaps, --eval-all, --keyframe-list, and "
                        "--save-probs fall back to the window loop")
    p.add_argument("--scene-batch", type=int, default=1,
                   help="with --scan: evaluate N independent scenes per "
                        "batched program (the batch axis never mixes)")
    p.add_argument("--precision", choices=["default", "high", "highest"],
                   default="high",
                   help="global matmul/conv precision (see eval_estm.py: "
                        "TPU backend default = 1 bf16 pass, ~1.15e-3 "
                        "model-wide drift; the TOOL default 'high' "
                        "restores f32-class parity — measured free on the "
                        "shipped bf16 stack)")
    p.add_argument("--window-bucket", type=int, default=4,
                   help="with --scan: round the program's window count up "
                        "to a multiple of this (padded windows' outputs "
                        "dropped), bounding recompiles across scene lengths")
    return p.parse_args()


class JointRunner:
    """Chains windows of one scene, threading last-target state as a
    1-entry memory (eval_hybrid.py:229-243)."""

    def __init__(self, model, variables, est_on: bool,
                 return_probs: bool = False,
                 reference_pose_pairing: bool = False):
        import jax

        from estdepth_tpu.models import ESTMemory

        self.model = model
        self.variables = variables
        self.est_on = est_on
        self.return_probs = return_probs
        self._mem_template = None

        def step(variables, imgs, poses, intr, memory, use_est):
            import jax.numpy as jnp

            outputs, (key, value, pose) = model.apply(
                variables, imgs, poses, intr,
                memory=memory if use_est else None,
                use_est=use_est, train=False,
            )
            if reference_pose_pairing and use_est:
                # strict parity with the reference's bookkeeping: its
                # decoder extends cam_poses with pre_cam_poses BEFORE
                # returning cam_poses[-1:] (hybrid_depth_decoder.py:221,292),
                # so with a threaded 1-entry memory the stored pose is the
                # PREVIOUS window's stored pose — by induction, window 0's
                # last-target pose forever (ARCHITECTURE.md deviation #1).
                pose = memory.poses[:, -1]
            new_memory = ESTMemory(
                keys=key[:, None], values=value[:, None],
                poses=pose[:, None],
                valid=jnp.ones((key.shape[0], 1), jnp.bool_),
            )
            if not return_probs:
                # the default no-probs eval step carries no [B,T,2,H,W]
                # output buffers (probs exist only under --save-probs,
                # like the reference's off-by-default save_*_prob flags)
                return outputs["depth"], None, new_memory
            # probs: [B, T, 2, H, W] — (init_prob, fused_prob) per target
            # (eval_hybrid.py:154-188 save_init_prob/save_refined_prob)
            probs = jnp.stack(
                [outputs["init_prob"], outputs["fused_prob"]], axis=2
            )
            return outputs["depth"], probs, new_memory

        self._step = jax.jit(step, static_argnames=("use_est",))
        self.memory = None

    def reset(self):
        self.memory = None

    def run_window(self, imgs, poses, intr):
        import jax.numpy as jnp

        from estdepth_tpu.models import ESTMemory

        use_est = self.est_on and self.memory is not None
        if self.memory is None:
            b = imgs.shape[0]
            h, w = imgs.shape[2] // 4, imgs.shape[3] // 4
            self.memory = ESTMemory.create(
                b, 1, self.model.ndepths, h, w, 16
            )
            self.memory = self.memory.replace(
                valid=jnp.ones_like(self.memory.valid)
            )
        depth, probs, self.memory = self._step(
            self.variables, imgs, poses, intr, self.memory, use_est=use_est
        )
        return depth, probs  # [B, T, 4, H, W], [B, T, 2, H, W] | None


def run_scenes_scan(proc, variables, queued, args, outdir=None):
    """Scan-mode evaluation of one batched group of scenes.

    queued: list of (name, seq dict from WindowEvalDataset.sequence,
    gt_fn(sampled_frame_index) -> (gt, mask) | None). All scenes run
    through ONE compiled program: per-scene T is padded to a common
    window grid (rounded up to --window-bucket to bound recompiles across
    scene lengths) and the padded windows' outputs dropped.
    """
    import time

    import jax.numpy as jnp

    from estdepth_tpu.utils.viz import colorize_depth, save_image
    from tools.eval_estm import score

    stride = args.seq_length - 2
    n_real = len(queued)
    batch = list(queued)
    while len(batch) < args.scene_batch:
        # pad a partial final group to the compiled batch width by
        # repeating the first scene (outputs dropped below)
        batch.append(queued[0])
    nws = [q[1]["n_windows"] for q in batch]
    bucket = max(1, args.window_bucket)
    nw_prog = -(-max(nws) // bucket) * bucket
    t_prog = (nw_prog - 1) * stride + args.seq_length

    def pad_t(x):
        if x.shape[0] >= t_prog:
            return x[:t_prog]
        return np.concatenate(
            [x, np.repeat(x[-1:], t_prog - x.shape[0], axis=0)], axis=0
        )

    imgs = np.stack([pad_t(q[1]["imgs"]) for q in batch])
    poses = np.stack([pad_t(q[1]["cam_poses"]) for q in batch])
    intr = np.stack([q[1]["cam_intr"] for q in batch])
    t0 = time.perf_counter()
    depths = np.asarray(
        proc(variables, jnp.asarray(imgs), jnp.asarray(poses),
             jnp.asarray(intr))
    )  # [B, nw_prog, seq_length-2, 2, H, W] (scales 0, 2)
    dt = time.perf_counter() - t0
    n_targets = sum(nw * (args.seq_length - 2) for nw in nws[:n_real])
    print(f"scan group of {n_real}: {n_targets} target frames in {dt:.1f}s "
          f"({n_targets / dt:.2f} targets/s, program windows={nw_prog})")

    errs = []
    for i in range(n_real):
        name, seq, gt_fn = queued[i]
        for wi in range(seq["n_windows"]):
            for ti in range(args.seq_length - 2):
                refined = depths[i, wi, ti, 0]
                gt = gt_fn(wi * stride + 1 + ti)
                if gt is not None:
                    errs.append(score(refined, gt[0], gt[1]))
                base = os.path.join(outdir or "", f"{name}_{wi:04d}_{ti}")
                if outdir and args.save_maps:
                    # same two maps as the loop driver: refined scale-0 +
                    # fused-head scale-2 (eval_hybrid.py:259-308)
                    np.save(base + "_depth.npy",
                            refined.astype(np.float16))
                    np.save(base + "_init.npy",
                            depths[i, wi, ti, 1].astype(np.float16))
                    save_image(
                        base + "_depth.jpg",
                        colorize_depth(refined, args.depth_min,
                                       args.depth_max),
                    )
    return errs


def main():
    args = parse_args()
    print("args:", vars(args))  # print_args equivalent (utils/utils.py:8-12)

    import jax.numpy as jnp

    from tools.eval_estm import build_model_and_params, score

    ns = argparse.Namespace(**vars(args))
    ns.lwindow = args.seq_length
    model, variables = build_model_and_params(ns)
    if args.scan and (args.save_probs or args.keyframe_list or
                      args.eval_all):
        print("note: --scan does not cover --save-probs/--keyframe-list/"
              "--eval-all; using the window loop")
        args.scan = False
    proc = None
    if args.scan:
        from estdepth_tpu.eval.sequence import make_joint_processor

        # fetch only the two saved/scored maps (refined scale-0, fused
        # scale-2) — half the device->host transfer
        proc = make_joint_processor(
            model, seq_length=args.seq_length, est_on=not args.no_est,
            output_scales=(0, 2),
        )
    runner = JointRunner(model, variables, est_on=not args.no_est,
                         return_probs=args.save_probs)
    if args.outdir:
        os.makedirs(args.outdir, exist_ok=True)

    def eval_windows(windows_iter, name):
        from estdepth_tpu.utils.viz import colorize_depth, save_image

        runner.reset()
        errs = []
        for wi, sample in enumerate(windows_iter):
            depth, probs = runner.run_window(
                jnp.asarray(sample["imgs"]),
                jnp.asarray(sample["cam_poses"]),
                jnp.asarray(sample["cam_intr"]),
            )
            t = depth.shape[1]
            for ti in range(t):
                refined = np.asarray(depth[0, ti, 0])
                if "dmaps" in sample:
                    gt = sample["dmaps"][0, ti]
                    mask = sample["dmasks"][0, ti]
                    errs.append(score(refined, gt, mask))
                # --save-maps and --save-probs are independent switches,
                # like the reference's save_*_depth / save_*_prob flags
                # (eval_hybrid.py:59-62)
                base = os.path.join(args.outdir or "", f"{name}_{wi:04d}_{ti}")
                if args.outdir and args.save_maps:
                    # both maps the reference saves per target: refined
                    # scale-0 and fused-head scale-2 (eval_hybrid.py:259-308)
                    np.save(base + "_depth.npy", refined.astype(np.float16))
                    np.save(base + "_init.npy",
                            np.asarray(depth[0, ti, 2]).astype(np.float16))
                    save_image(
                        base + "_depth.jpg",
                        colorize_depth(refined, args.depth_min, args.depth_max),
                    )
                if args.outdir and args.save_probs:
                    from estdepth_tpu.utils.viz import colorize_probmap

                    for pi, kind in enumerate(("init_prob",
                                               "refined_prob")):
                        pmap = np.asarray(probs[0, ti, pi])
                        np.save(f"{base}_{kind}.npy",
                                pmap.astype(np.float16))
                        save_image(f"{base}_{kind}.jpg",
                                   colorize_probmap(pmap))
            if args.max_windows and wi + 1 >= args.max_windows:
                break
        return errs

    all_errs = []
    if args.keyframe_list:
        from estdepth_tpu.data.keyframe_eval import KeyframeEvalDataset

        assert args.datapath
        ds = KeyframeEvalDataset(
            args.datapath, args.keyframe_list, args.height, args.width,
            depth_min=max(args.depth_min, 0.1), depth_max=args.depth_max,
        )
        # keyframe windows are independent: no cross-window state
        for i in range(len(ds)):
            runner.reset()
            sample = ds[i]
            all_errs += eval_windows(iter([sample]),
                                     f"{sample['scene']}_{sample['index']}")
        print(f"keyframes: {len(ds)} windows")
    elif args.synthetic:
        from estdepth_tpu.data.synthetic import (
            SyntheticSceneConfig, synthetic_stream, synthetic_window,
        )

        cfg = SyntheticSceneConfig(height=args.height, width=args.width)
        if args.scan:
            # the same 3-window chain as the loop path, as one sampled
            # sequence (synthetic_window/_stream render identical frames)
            stride = args.seq_length - 2
            frames = list(synthetic_stream(
                cfg, n_frames=2 * stride + args.seq_length,
            ))
            seq = {
                "imgs": np.stack(
                    [f["img"] for f in frames]).astype(np.float32),
                "cam_poses": np.stack(
                    [f["cam_pose"] for f in frames]).astype(np.float32),
                "cam_intr": frames[0]["cam_intr"].astype(np.float32),
                "n_windows": 3,
            }

            def gt_fn(k):
                return frames[k]["dmap"], frames[k]["dmask"]

            all_errs += run_scenes_scan(
                proc, variables, [("synthetic", seq, gt_fn)], args,
                args.outdir,
            )
        else:
            windows = [
                synthetic_window(cfg, n_frames=args.seq_length,
                                 start_frame=s)
                for s in range(0, 9, 3)
            ]
            all_errs += eval_windows(iter(windows), "synthetic")
    else:
        from estdepth_tpu.data.eval_windows import (
            SEVEN_SCENES_TEST_SEQS, WindowEvalDataset,
        )
        from estdepth_tpu.data.io_utils import read_split_file

        assert args.datapath
        ds = WindowEvalDataset(
            args.datapath, args.height, args.width,
            depth_min=0.3, depth_max=5.0, seq_length=args.seq_length,
            frame_interval=args.frame_interval,
            scannet_layout=args.eval_dataset == "scannet",
            eval_all=args.eval_all,
        )
        if args.eval_dataset == "scannet":
            scenes = read_split_file(args.testlist) if args.testlist else (
                sorted(os.listdir(args.datapath)))
            scene_seqs = [(s, None) for s in scenes]
        else:
            scene_seqs = SEVEN_SCENES_TEST_SEQS
        scan_queue = []  # scenes awaiting one batched --scene-batch program

        def flush_queue():
            if not scan_queue:
                return []
            group = list(scan_queue)
            scan_queue.clear()
            return run_scenes_scan(proc, variables, group, args,
                                   args.outdir)

        for scene, seq in scene_seqs:
            name = scene if seq is None else f"{scene}_{seq}"
            if args.outdir and args.save_maps:
                import glob as _glob

                # skip-completed-scenes resume (eval_hybrid.py:99-100)
                if _glob.glob(os.path.join(args.outdir, f"{name}_*_depth.npy")):
                    print(f"{name}: outputs exist, skipping")
                    continue
            ds.reset(scene, seq)
            if args.scan:
                sq = ds.sequence(args.max_windows)
                if sq is not None and (
                    sq["window_stride"] != args.seq_length - 2
                ):
                    sq = None  # non-default seq_inter: scan grid mismatch
                if sq is not None:
                    def gt_fn(k, _paths=sq["dmap_paths"]):
                        return ds.read_gt(_paths[k])

                    scan_queue.append((name, sq, gt_fn))
                    if len(scan_queue) >= args.scene_batch:
                        all_errs += flush_queue()
                    continue
                print(f"{name}: window chain is not a gapless grid; "
                      "loop fallback")
            errs = eval_windows((ds[i] for i in range(len(ds))), name)
            all_errs += errs
            print(f"{name}: {len(errs)} target frames")
        all_errs += flush_queue()

    if all_errs:
        keys = ["abs_relative", "sq_relative", "rmse", "rmse_log",
                "ratio_threshold_1.25"]
        means = {k: float(np.mean([e[k] for e in all_errs])) for k in keys}
        print("metrics:", " ".join(f"{k}={v:.4f}" for k, v in means.items()))


if __name__ == "__main__":
    main()
