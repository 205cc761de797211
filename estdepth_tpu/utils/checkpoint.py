"""Checkpoint save/resume via orbax.

TPU-native equivalent of the reference's torch.save/load flow
(/root/reference/train_hybrid.py:137-151,312-347): periodic + per-epoch
saves, resume-from-latest, and partial restore (shape-filtered load and
encoder-only restore, :331-347) expressed as pytree merges.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any):
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def close(self):
        self._mgr.close()


def load_weights_for_finetune(path: str):
    """Load (params, batch_stats) from either an orbax checkpoint dir
    written by tools/train.py or a reference torch .ckpt (converted via
    utils/convert.py) — the `--loadckpt` source resolution
    (train_hybrid.py:325-347; fine-tuning the released checkpoint).
    """
    if os.path.isdir(path):
        mgr = ocp.CheckpointManager(os.path.abspath(path))
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {path}")
        restored = mgr.restore(step)
        return restored["params"], restored.get("batch_stats", {})
    from estdepth_tpu.utils.convert import load_torch_checkpoint

    variables, _ = load_torch_checkpoint(path, strict=False)
    return variables["params"], variables["batch_stats"]


def partial_restore(target_params: Any, loaded_params: Any, verbose: bool = True):
    """Merge loaded leaves into target where path + shape + dtype match.

    Equivalent of the reference's shape-filtered partial load
    (train_hybrid.py:331-337): anything missing or mismatched keeps the
    freshly-initialized value.
    """
    flat_target = dict(jax.tree_util.tree_flatten_with_path(target_params)[0])
    flat_loaded = dict(jax.tree_util.tree_flatten_with_path(loaded_params)[0])
    merged = {}
    n_hit = 0
    for path, leaf in flat_target.items():
        cand = flat_loaded.get(path)
        if cand is not None and getattr(cand, "shape", None) == leaf.shape:
            merged[path] = cand
            n_hit += 1
        else:
            merged[path] = leaf
    if verbose:
        print(f"partial_restore: {n_hit}/{len(flat_target)} tensors restored")
    treedef = jax.tree_util.tree_structure(target_params)
    paths = [p for p, _ in jax.tree_util.tree_flatten_with_path(target_params)[0]]
    return jax.tree_util.tree_unflatten(treedef, [merged[p] for p in paths])
