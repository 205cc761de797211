"""LR schedule: linear warmup + multi-step decay.

Behavioral equivalent of WarmupMultiStepLR
(/root/reference/utils/utils.py:208-252) as driven by train_hybrid.py:80-83:
linear warmup from warmup_factor * lr over warmup_steps, then lr multiplied
by gamma at each epoch milestone.
"""

from __future__ import annotations

from typing import Sequence

import optax


def warmup_multistep_schedule(
    base_lr: float,
    steps_per_epoch: int,
    milestones_epochs: Sequence[int] = (2, 4, 6),
    gamma: float = 0.5,
    warmup_steps: int = 500,
    warmup_factor: float = 1.0 / 3.0,
) -> optax.Schedule:
    milestones = sorted(int(m * steps_per_epoch) for m in milestones_epochs)

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = jnp.minimum(step / max(warmup_steps, 1), 1.0)
        warmup_mult = warmup_factor * (1.0 - warm) + warm
        decay = jnp.float32(1.0)
        for m in milestones:
            decay = decay * jnp.where(step >= m, gamma, 1.0)
        return base_lr * warmup_mult * decay

    return schedule
