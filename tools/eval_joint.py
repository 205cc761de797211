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
    p.add_argument("--fast-frustum", action="store_true",
                   help="plane-mix EST memory warps (see eval_estm.py)")
    p.add_argument("--pallas-warp", action="store_true",
                   help="Pallas lane-gather warps (see eval_estm.py)")
    p.add_argument("--conv3d-as2d", action="store_true",
                   help="exact 3x3x3-as-depth-shifted-conv2ds execution "
                        "(see eval_estm.py)")
    p.add_argument("--save-probs", action="store_true",
                   help="also dump per-target init/refined probability maps "
                        "(eval_hybrid.py:59-62 save_init_prob/"
                        "save_refined_prob, default off there too)")
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


def main():
    args = parse_args()
    print("args:", vars(args))  # print_args equivalent (utils/utils.py:8-12)

    import jax.numpy as jnp

    from tools.eval_estm import build_model_and_params, score

    ns = argparse.Namespace(**vars(args))
    ns.lwindow = args.seq_length
    model, variables = build_model_and_params(ns)
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
            SyntheticSceneConfig, synthetic_window,
        )

        cfg = SyntheticSceneConfig(height=args.height, width=args.width)
        windows = [
            synthetic_window(cfg, n_frames=args.seq_length, start_frame=s)
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
        for scene, seq in scene_seqs:
            name = scene if seq is None else f"{scene}_{seq}"
            if args.outdir and args.save_maps:
                import glob as _glob

                # skip-completed-scenes resume (eval_hybrid.py:99-100)
                if _glob.glob(os.path.join(args.outdir, f"{name}_*_depth.npy")):
                    print(f"{name}: outputs exist, skipping")
                    continue
            ds.reset(scene, seq)
            errs = eval_windows((ds[i] for i in range(len(ds))), name)
            all_errs += errs
            print(f"{name}: {len(errs)} target frames")

    if all_errs:
        keys = ["abs_relative", "sq_relative", "rmse", "rmse_log",
                "ratio_threshold_1.25"]
        means = {k: float(np.mean([e[k] for e in all_errs])) for k in keys}
        print("metrics:", " ".join(f"{k}={v:.4f}" for k, v in means.items()))


if __name__ == "__main__":
    main()
