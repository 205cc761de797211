#!/usr/bin/env python
"""Train DepthNetHybrid (data-parallel over all local devices).

TPU-native equivalent of /root/reference/train_hybrid.py: same optimization
recipe (Adam 4e-5 + L2 4e-4, warmup-multistep LR, staged grad clip 10->1 at
epoch 3, sync-BN across the data mesh), driven by one jitted shard_map step.

Usage:
  python tools/train.py --synthetic --steps 20          # hermetic smoke run
  python tools/train.py --datapath /data/scannet --split data/splits/train_split.txt
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
    p.add_argument("--split", type=str, default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="train on generated synthetic scenes (hermetic)")
    p.add_argument("--logdir", type=str, default="./logs")
    p.add_argument("--epochs", type=int, default=7)
    p.add_argument("--steps", type=int, default=None,
                   help="cap total steps (smoke runs)")
    p.add_argument("--lr", type=float, default=4e-5)
    p.add_argument("--wd", type=float, default=4e-4)
    p.add_argument("--lrepochs", type=str, default="2,4,6:2",
                   help="milestones:decay-divisor (train_hybrid.py:80-82)")
    p.add_argument("--batch-per-device", type=int, default=1)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--n-frames", type=int, default=5)
    p.add_argument("--ndepths", type=int, default=64)
    p.add_argument("--depth-min", type=float, default=0.01)
    p.add_argument("--depth-max", type=float, default=10.0)
    p.add_argument("--resnet", type=int, default=50)
    p.add_argument("--no-est", action="store_true")
    p.add_argument("--fix-matching-feature", action="store_true",
                   help="freeze the PSM matching encoder (train_hybrid.py:297-301)")
    p.add_argument("--fix-semantic-feature", action="store_true",
                   help="freeze the ResNet context encoder (train_hybrid.py:302-306)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--loadckpt", type=str, default=None,
                   help="initialize weights from a checkpoint: an orbax dir "
                        "written by this tool, or a reference torch .ckpt "
                        "(converted on the fly). Shape-filtered partial load "
                        "like train_hybrid.py:331-337. Ignored when --resume "
                        "finds a checkpoint.")
    p.add_argument("--restore-part", action="store_true",
                   help="with --loadckpt, restore ONLY the two encoders "
                        "(matching_feature + semantic_feature) — the "
                        "reference's --restore_part (train_hybrid.py:338-347)")
    p.add_argument("--pretrained-encoder", type=str, default=None,
                   help="ImageNet-pretrained semantic encoder init: a "
                        "torchvision resnet .pth or a converted .npz from "
                        "tools/import_torchvision.py (the reference's "
                        "pretrained=True, resnet_encoder.py:35)")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--summary-freq", type=int, default=10)
    p.add_argument("--image-freq", type=int, default=100,
                   help="dump colorized depth/prob images every N steps")
    p.add_argument("--ckpt-steps", type=int, default=5000)
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--debug-nans", action="store_true",
                   help="jax_debug_nans — the TPU equivalent of the "
                        "reference's always-on autograd anomaly mode "
                        "(train_hybrid.py:167)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute (norm statistics, softargmin and "
                        "optimizer state stay fp32 — models/layers.py). "
                        "The reference's apex-AMP equivalent; halves the "
                        "activation+backward-temp HBM that pins the "
                        "flagship batch (ARCHITECTURE.md headroom #1)")
    p.add_argument("--fast-frustum", action="store_true",
                   help="train with plane-mix EST memory warps (fully "
                        "differentiable XLA reformulation; sub-plane-"
                        "spacing forward deviation, test_fast_frustum.py)")
    p.add_argument("--pallas-warp", action="store_true",
                   help="train with the Pallas lane-gather warps: VPU "
                        "forward, plane-mix-VJP backward "
                        "(ops/pallas/plane_warp.py)")
    p.add_argument("--exact-z", action="store_true",
                   help="slope-carry exact-z correction on the fast warps "
                        "(ops/warp_exact_z.py; differentiable on both "
                        "fast backends)")
    p.add_argument("--conv3d-as2d", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="evaluate 3x3x3 convs as depth-shifted conv2ds "
                        "(exact arithmetic; sidesteps the conv3d "
                        "backward's padded gradient temps — "
                        "ARCHITECTURE.md headroom #1). Default ON (measured "
                        "1.41x train step); --no-conv3d-as2d restores "
                        "native conv3d lowering")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize forward during backward (larger batches)")
    p.add_argument("--remat-policy", default="nothing",
                   choices=["nothing", "save_features", "dots"],
                   help="with --remat: which residuals to keep "
                        "(save_features pins the stride-4 encoder outputs "
                        "so only the 3D stack recomputes)")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="accumulate gradients over this many microbatches "
                        "per step (effective batch = batch-per-device x "
                        "devices, HBM working set = one microbatch). At "
                        "the flagship 320x256x64 config the base step "
                        "already fills v5e HBM — use at reduced "
                        "resolution (measured working: 256x192) or on "
                        "larger-memory parts (ARCHITECTURE.md)")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() for multi-host")
    p.add_argument("--coordinator", type=str, default=None,
                   help="with --multihost: coordinator address for manual "
                        "clusters (auto-detected on TPU pods when omitted)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p.parse_args()


class SyntheticTrainDataset:
    """Map-style wrapper over synthetic_window with varied scenes."""

    def __init__(self, n, height, width, n_frames, depth_min, depth_max):
        from estdepth_tpu.data.synthetic import SyntheticSceneConfig

        self.cfgs = [
            SyntheticSceneConfig(height=height, width=width, seed=i)
            for i in range(max(n // 4, 1))
        ]
        self.n = n
        self.n_frames = n_frames
        self.depth_min = depth_min
        self.depth_max = depth_max

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        from estdepth_tpu.data.synthetic import synthetic_window

        w = synthetic_window(
            self.cfgs[i % len(self.cfgs)], n_frames=self.n_frames,
            start_frame=i % 7, depth_min=self.depth_min,
            depth_max=self.depth_max,
        )
        return {k: v[0] for k, v in w.items()}  # unbatch


def main():
    args = parse_args()

    import jax
    import jax.numpy as jnp

    if args.multihost:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from estdepth_tpu.data.pipeline import TrainLoader, prefetch_to_device
    from estdepth_tpu.models import DepthNetHybrid
    from estdepth_tpu.parallel.mesh import create_mesh, replicate
    from estdepth_tpu.train.schedule import warmup_multistep_schedule
    from estdepth_tpu.train.trainer import (
        create_train_state, make_optimizer, make_train_step,
    )
    from estdepth_tpu.utils.checkpoint import CheckpointManager
    from estdepth_tpu.utils.logging import DictAverageMeter, ScalarLogger

    print("args:", vars(args))  # print_args equivalent (utils/utils.py:8-12)
    n_dev = len(jax.devices())
    mesh = create_mesh()
    global_batch = args.batch_per_device * n_dev
    # each process loads ONLY the samples for its own chips; shard_batch
    # assembles the global array from process-local data
    local_batch = args.batch_per_device * jax.local_device_count()
    print(f"devices={n_dev} global_batch={global_batch} "
          f"local_batch={local_batch} processes={jax.process_count()}")

    if args.synthetic:
        dataset = SyntheticTrainDataset(
            256, args.height, args.width, args.n_frames,
            args.depth_min, args.depth_max,
        )
    else:
        from estdepth_tpu.data.scannet import ScanNetTrainDataset

        assert args.datapath, "--datapath or --synthetic required"
        dataset = ScanNetTrainDataset(
            args.datapath, args.split, args.height, args.width,
            args.n_frames, depth_min=max(args.depth_min, 0.1),
            depth_max=args.depth_max,
        )
    loader = TrainLoader(
        dataset, local_batch,
        shard_index=jax.process_index(), num_shards=jax.process_count(),
        num_workers=args.num_workers, seed=args.seed,
    )
    steps_per_epoch = max(loader.steps_per_epoch(), 1)
    print(f"dataset={len(dataset)} steps/epoch={steps_per_epoch}")

    milestones, decay = args.lrepochs.split(":")
    milestones = [int(m) for m in milestones.split(",")]
    sched = warmup_multistep_schedule(
        args.lr, steps_per_epoch, milestones, 1.0 / float(decay),
    )
    frozen = tuple(
        name
        for flag, name in (
            (args.fix_matching_feature, "matching_feature"),
            (args.fix_semantic_feature, "semantic_feature"),
        )
        if flag
    )
    tx = make_optimizer(sched, args.wd, frozen_prefixes=frozen)

    model = DepthNetHybrid(
        ndepths=args.ndepths, depth_min=args.depth_min,
        depth_max=args.depth_max, resnet=args.resnet,
        est_transformer=not args.no_est, bn_axis_name="data",
        fast_frustum=args.fast_frustum, pallas_warp=args.pallas_warp,
        exact_z_warp=args.exact_z,
        conv3d_as2d=args.conv3d_as2d,
        dtype=jnp.bfloat16 if args.bf16 else None,
    )

    example = next(iter(loader.epoch(0)))
    local = jax.tree.map(lambda x: jnp.asarray(x[:1]), example)
    state = create_train_state(model, jax.random.key(args.seed), local, tx)
    n_params = sum(
        p.size for p in jax.tree_util.tree_leaves(state.params)
    )
    print(f"params: {n_params/1e6:.2f}M")

    if args.pretrained_encoder:
        from estdepth_tpu.utils.checkpoint import partial_restore
        from estdepth_tpu.utils.convert import load_pretrained_encoder

        enc = load_pretrained_encoder(args.pretrained_encoder)
        state = state.replace(
            params={**state.params, "semantic_feature": partial_restore(
                state.params["semantic_feature"], enc["params"]
            )},
            batch_stats={
                **state.batch_stats,
                "semantic_feature": partial_restore(
                    state.batch_stats["semantic_feature"],
                    enc["batch_stats"],
                ),
            },
        )
        print(f"pretrained encoder loaded from {args.pretrained_encoder}")

    ckpt = CheckpointManager(os.path.join(args.logdir, "ckpt"))
    start_epoch = 0
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        start_epoch = int(state.step) // steps_per_epoch
        print(f"resumed from step {int(state.step)} (epoch {start_epoch})")
    elif args.loadckpt:
        from estdepth_tpu.utils.checkpoint import (
            load_weights_for_finetune, partial_restore,
        )

        params_l, stats_l = load_weights_for_finetune(args.loadckpt)
        if args.restore_part:
            # encoders only (train_hybrid.py:338-347)
            keep = ("matching_feature", "semantic_feature")
            params_l = {k: v for k, v in params_l.items() if k in keep}
            stats_l = {k: v for k, v in stats_l.items() if k in keep}
        state = state.replace(
            params=partial_restore(state.params, params_l),
            batch_stats=partial_restore(state.batch_stats, stats_l),
        )
        print(f"loaded weights from {args.loadckpt} "
              f"(restore_part={args.restore_part})")

    state = replicate(state, mesh)
    if args.batch_per_device % args.grad_accum:
        raise SystemExit("--batch-per-device must be divisible by --grad-accum")
    step_fn = make_train_step(
        model, tx, mesh, args.depth_min, args.depth_max, remat=args.remat,
        grad_accum=args.grad_accum, remat_policy=args.remat_policy,
    )
    logger = ScalarLogger(args.logdir) if jax.process_index() == 0 else None
    meter = DictAverageMeter()

    # eval-mode forward for periodic image summaries (reference save_images,
    # train_hybrid.py:185-204)
    @jax.jit
    def viz_fn(params, batch_stats, imgs, poses, intr):
        outputs, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            imgs, poses, intr, train=False,
        )
        return outputs["depth"][0, 0, 0], outputs["fused_prob"][0, 0]

    def dump_images(step, batch):
        from estdepth_tpu.utils.viz import (
            colorize_depth, colorize_probmap, save_image,
        )

        img_dir = os.path.join(args.logdir, "images")
        os.makedirs(img_dir, exist_ok=True)
        depth, prob = viz_fn(
            state.params, state.batch_stats,
            batch["imgs"][:1], batch["cam_poses"][:1], batch["cam_intr"][:1],
        )
        save_image(
            os.path.join(img_dir, f"depth_{step:07d}.jpg"),
            colorize_depth(np.asarray(depth), args.depth_min, args.depth_max),
        )
        save_image(
            os.path.join(img_dir, f"prob_{step:07d}.jpg"),
            colorize_probmap(np.asarray(prob)),
        )
        gt = np.asarray(batch["dmaps"][0, 0])
        save_image(
            os.path.join(img_dir, f"gt_{step:07d}.jpg"),
            colorize_depth(gt, args.depth_min, args.depth_max),
        )

    total_steps = 0
    for epoch in range(start_epoch, args.epochs):
        clip = 10.0 if epoch < 3 else 1.0  # train_hybrid.py:94-97
        for batch in prefetch_to_device(loader.epoch(epoch), mesh):
            t0 = time.perf_counter()
            state, scalars = step_fn(state, batch, jnp.float32(clip))
            step = int(state.step)
            total_steps += 1
            if step % args.summary_freq == 0:
                scalars = {k: float(v) for k, v in scalars.items()}
                meter.update(scalars)
                dt = time.perf_counter() - t0
                if logger:
                    logger.log(step, scalars)
                print(
                    f"epoch {epoch} step {step} loss {scalars['loss']:.4f} "
                    f"delta0 {scalars['delta_0']:.4f} "
                    f"thred0 {scalars['thred_0']:.4f} time {dt:.3f}s"
                )
            if (step % args.image_freq == 0 and jax.process_index() == 0):
                dump_images(step, batch)
            if step % args.ckpt_steps == 0:
                # EVERY process calls save: orbax coordinates multi-host
                # persistence internally (sync_global_devices barriers) —
                # a rank-0-only call deadlocks the other ranks' barriers
                # (caught by tests/test_multihost.py). The reference's
                # rank-0 torch.save gate (train_hybrid.py:188) maps to
                # orbax's primary-host write, not to gating the call.
                ckpt.save(step, jax.device_get(state))
            if args.steps and total_steps >= args.steps:
                break
        ckpt.save(int(state.step), jax.device_get(state))
        if args.steps and total_steps >= args.steps:
            break

    if logger:
        logger.close()
    ckpt.close()
    if jax.process_count() > 1:
        # rank 0's final checkpoint save/close runs long after the other
        # ranks finish their last step; without an explicit barrier they
        # reach jax.distributed's atexit shutdown barrier early and time
        # out (observed in tests/test_multihost.py's 2-process smoke)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("train_end")
    print("training done")


if __name__ == "__main__":
    main()
