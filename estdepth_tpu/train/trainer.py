"""SPMD data-parallel training step.

TPU-native equivalent of the reference's DDP training loop
(/root/reference/train_hybrid.py:155-211): one jitted shard_map step over a
1-D `data` mesh that fuses forward, backward, cross-chip gradient pmean
(NCCL allreduce equivalent), staged gradient clipping
(train_hybrid.py:94-97,182), Adam-with-L2 (torch Adam + weight_decay,
train_hybrid.py:308), and scalar metric reduction (utils/utils.py:183-201)
into a single XLA program. Sync-BN rides the same mesh axis through
BatchNorm(axis_name="data").
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from estdepth_tpu.train.loss import multi_scale_loss


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(
    schedule: optax.Schedule, weight_decay: float = 4e-4,
    beta1: float = 0.9, beta2: float = 0.999,
    frozen_prefixes: Tuple[str, ...] = (),
) -> optax.GradientTransformation:
    """torch Adam(lr, betas, weight_decay) semantics: L2 added to the raw
    gradient BEFORE the moment updates (not AdamW).

    frozen_prefixes: top-level param subtrees to freeze (zero updates) —
    the reference's --fix_matchingFeature / --fix_semanticFeature
    requires_grad=False controls (train_hybrid.py:297-306); use
    ("matching_feature",), ("semantic_feature",) here.
    """
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=beta1, b2=beta2),
        optax.scale_by_learning_rate(schedule),
    )
    if not frozen_prefixes:
        return tx

    def label(params):
        return {
            k: ("frozen" if k in frozen_prefixes else "train")
            for k in params
        }

    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, label
    )


def clip_by_global_norm(grads, max_norm: jnp.ndarray):
    """torch clip_grad_norm_ equivalent with a traced clip value."""
    leaves = jax.tree_util.tree_leaves(grads)
    norm = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return jax.tree.map(lambda g: g * scale.astype(g.dtype), grads), norm


def create_train_state(
    model, rng, example_batch, tx: optax.GradientTransformation
) -> TrainState:
    # jit the init: eager init compiles each op separately, which is
    # pathologically slow on remote-compiled TPU backends
    init = jax.jit(partial(model.init, train=True))
    variables = init(
        rng,
        example_batch["imgs"],
        example_batch["cam_poses"],
        example_batch["cam_intr"],
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    depth_min: float,
    depth_max: float,
    loss_weight: float = 0.8,
    remat: bool = False,
    grad_accum: int = 1,
    remat_policy: str = "nothing",
) -> Callable[[TrainState, Dict[str, jnp.ndarray], jnp.ndarray],
              Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Returns jitted (state, batch, clip_norm) -> (state, scalars).

    batch: imgs [B,V,H,W,3] 0..255, cam_poses [B,V,4,4], cam_intr [B,3,3],
    dmaps [B,T,H,W], dmasks [B,T,H,W] bool — batch axis sharded over `data`.

    remat: rematerialize the forward during backward (jax.checkpoint) —
    trades ~1.5x FLOPs for dropping all forward activations from HBM,
    enabling larger per-chip batches (the cost volumes dominate activation
    memory at ~250 MB per target window).

    remat_policy (with remat=True):
      "nothing"       — save no residuals; the whole forward recomputes
                        (max memory saving, max recompute).
      "save_features" — save the tagged stride-4 encoder outputs
                        (models/estdepth.py checkpoint_name
                        "encoder_features"): the encoders — ~40% of forward
                        FLOPs — are NOT recomputed in the backward, while
                        the 3D stack (whose f32 conv-backward temps with 4x
                        lane padding dominate train HBM, ARCHITECTURE.md
                        headroom #1) still rematerializes.
      "dots"          — jax's dots_saveable: save matmul/conv outputs.

    grad_accum: split the per-device batch into this many microbatches and
    accumulate gradients over a lax.scan before the single optimizer
    update. One chip's working set stays close to that of B/grad_accum
    while the effective batch is B. Measured envelope (ARCHITECTURE.md):
    at the flagship 320x256x64 config even accum=2 exceeds v5e HBM (the
    base step already fills the chip); at 256x192 it trains on-chip with
    effective batch 2. BN batch statistics update per microbatch
    (equivalent to running the microbatches as separate steps, like the
    reference's B=1-per-GPU accumulation-free recipe).
    """

    def loss_fn(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        (outputs, _), updates = model.apply(
            variables,
            batch["imgs"],
            batch["cam_poses"],
            batch["cam_intr"],
            train=True,
            mutable=["batch_stats"],
        )
        loss, scalars = multi_scale_loss(
            outputs["depth"], batch["dmaps"], batch["dmasks"],
            depth_min, depth_max, weight=loss_weight,
        )
        return loss, (scalars, updates["batch_stats"])

    if remat:
        policies = {
            "nothing": jax.checkpoint_policies.nothing_saveable,
            "save_features": jax.checkpoint_policies.save_only_these_names(
                "encoder_features"
            ),
            "dots": jax.checkpoint_policies.dots_saveable,
        }
        loss_fn = jax.checkpoint(loss_fn, policy=policies[remat_policy])

    def step_fn(state: TrainState, batch, clip_norm):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if grad_accum > 1:
            micro = jax.tree.map(
                lambda x: x.reshape(
                    (grad_accum, x.shape[0] // grad_accum) + x.shape[1:]
                ),
                batch,
            )

            def accum(carry, mb):
                grads_acc, stats = carry
                (_, (scalars, stats)), g = grad_fn(
                    state.params, stats, mb
                )
                grads_acc = jax.tree.map(jnp.add, grads_acc, g)
                return (grads_acc, stats), scalars

            zeros = jax.tree.map(
                lambda p: jnp.zeros(p.shape, p.dtype), state.params
            )
            (grads, new_stats), scalars_seq = jax.lax.scan(
                accum, (zeros, state.batch_stats), micro
            )
            grads = jax.tree.map(lambda g: g / grad_accum, grads)
            scalars = jax.tree.map(lambda s: jnp.mean(s, 0), scalars_seq)
        else:
            (_, (scalars, new_stats)), grads = grad_fn(
                state.params, state.batch_stats, batch
            )
        # NCCL-allreduce equivalent over ICI (train_hybrid.py:180)
        grads = jax.lax.pmean(grads, "data")
        scalars = jax.lax.pmean(scalars, "data")
        grads, grad_norm = clip_by_global_norm(grads, clip_norm)
        scalars = dict(scalars, grad_norm=grad_norm)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # BN stats were pmean-synced by axis_name; identical on every shard
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
        )
        return new_state, scalars

    sharded = jax.shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))
