"""Single dataclass config with presets.

Replaces the reference's argparse flags duplicated across three entry scripts
(/root/reference/train_hybrid.py:19-69, eval_hybrid.py:15-66,
eval_hybrid_seq.py:17-70) and its hardcoded constants (image size 320x256 at
data/scannet.py:62, frame interval 10 at data/scannet.py:258).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """DepthNetHybrid hyper-parameters (reference model_hybrid.py:15-16)."""

    ndepths: int = 64
    depth_min: float = 0.01
    depth_max: float = 10.0
    resnet: int = 50
    # matching encoder family (model_hybrid.py:22 "featureNet: psm or senet")
    feature_net: str = "psm"
    est_transformer: bool = True
    # Compute dtype for conv stacks; normalization + softargmin stay fp32.
    compute_dtype: str = "float32"

    @property
    def depth_interval(self) -> float:
        return (self.depth_max - self.depth_min) / (self.ndepths - 1)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Input pipeline settings (reference data/scannet.py, general_eval*.py)."""

    height: int = 256
    width: int = 320
    n_frames: int = 5  # training window length (train_hybrid.py defaults)
    frame_interval: int = 10  # every 10th frame (data/scannet.py:258)
    # ScanNet default intrinsics at 640x480 (data/scannet.py:83-87)
    fx: float = 577.870605
    fy: float = 577.870605
    cx: float = 319.5
    cy: float = 239.5
    depth_min: float = 0.01
    depth_max: float = 10.0
    min_valid_ratio: float = 0.5  # assert >=50% valid depth (scannet.py:147-149)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization settings (reference train_hybrid.py:80-97, README.md:62-78).

    These dataclasses are the documented recipe card for library users —
    the CLI tools take the same values via argparse flags and do NOT read
    this config (by design, mirroring the reference's flag-only setup).
    """

    lr: float = 4e-5
    weight_decay: float = 4e-4
    beta1: float = 0.9
    beta2: float = 0.999
    epochs: int = 7
    lr_decay_epochs: Tuple[int, ...] = (2, 4, 6)
    lr_decay_factor: float = 0.5
    warmup_steps: int = 500
    warmup_factor: float = 1.0 / 3.0
    # grad clip 10 for epochs < 3, then 1 (train_hybrid.py:94-97)
    clip_early: float = 10.0
    clip_late: float = 1.0
    clip_switch_epoch: int = 3
    batch_per_device: int = 1
    grad_accum: int = 1  # microbatches per step (trainer.make_train_step)
    remat: bool = False  # rematerialize forward during backward
    seed: int = 1
    loss_scale_weight: float = 0.8  # per-scale weight 0.8**scale (model_hybrid.py:219)
    sync_bn: bool = True
    summary_freq: int = 10
    ckpt_steps: int = 5000


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Evaluation protocol (eval_hybrid.py:76-78, eval_hybrid_seq.py:70)."""

    seq_length: int = 5  # joint-mode window
    lwindow: int = 3  # ESTM local window
    memory_size: int = 2  # ESTM FIFO memory entries
    eval_depth_min: float = 0.3  # scoring valid range (metric.py:4)
    eval_depth_max: float = 5.0


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)


def default_config() -> Config:
    return Config()


def tiny_config() -> Config:
    """Small shapes for unit tests and CPU dry runs."""
    return Config(
        model=ModelConfig(ndepths=8),
        data=DataConfig(height=64, width=96),
    )


def resolve_warp_args(args) -> None:
    """Resolve the eval tools' tri-state warp flags IN PLACE.

    Shipped default (round 4): the parity-gated fast warp recipe — the
    slope-carry exact-z correction (ops/warp_exact_z.py) on the Pallas
    lane-gather kernels on TPU, or on the XLA plane-mix formulation on
    other backends (the Pallas kernels only run interpreted there). Both
    variants pass the 1e-3 reference-parity gate at float noise under
    f32 matmul numerics (1.19e-7 abs_rel end-to-end, PARITY.md;
    `tools/parity_gate.py --variant pallas_exact_z|plane_mix_exact_z`).
    On the TPU branch the exact-z (A, s) pair additionally rides the
    kernels as origin-shifted bf16 int32 lanes (`packed_warp`,
    ops/pallas/plane_warp_exact_z.py): plain plane-mix kernel traffic,
    measured 1.22x scan throughput
    (tools/experiments/packed_scan_ab.py), still float-noise parity
    (6.56e-7 abs_rel, PARITY.md). `--no-packed-warp` restores the f32
    tap/slope transport.
    On TPU the remaining deviation is the backend's DEFAULT bf16 matmul
    precision applied model-wide — EVERY variant including `exact`
    measures ~1.15e-3 vs the torch-f32 reference, with the fast-warp
    variants within 2e-6 of `exact`; `--precision high|highest`
    restores a passing on-chip gate (1.4e-5 / 8.0e-7 measured) at extra
    matmul cost (PARITY.md has the table).

    `--exact-warp` (or explicit --no-* flags) restores the reference's
    exact trilinear semantics (homo_utils.py:240-279) — also the
    model-library default (DepthNetHybrid) and the training default.

    Namespaces carrying plain booleans (older tools, tests) pass through
    unchanged — only `None` (the tri-state "unset") is resolved.
    """
    if getattr(args, "exact_warp", False):
        args.fast_frustum = False
        args.pallas_warp = False
        args.exact_z = False
        if hasattr(args, "packed_warp"):
            args.packed_warp = False
        return
    pw = getattr(args, "pallas_warp", False)
    ff = getattr(args, "fast_frustum", False)
    if pw is None and ff is None:
        import jax

        pw = jax.default_backend() == "tpu"
        ff = not pw
    args.pallas_warp = bool(pw)
    args.fast_frustum = bool(ff)
    if getattr(args, "exact_z", False) is None:
        args.exact_z = args.pallas_warp or args.fast_frustum
    if getattr(args, "packed_warp", False) is None:
        # packed transport only exists on the Pallas exact-z path
        args.packed_warp = bool(args.pallas_warp and args.exact_z)
