"""StableHLO serving artifacts for ESTM streaming inference.

`jax.export` serializes the jitted per-frame window step — model weights
baked into the module as constants — into a versioned artifact that a
plain JAX runtime executes WITHOUT the model code: deployment needs this
module only for the thin host-side window bookkeeping
(`ExportedStreamRunner`) plus the ESTMemory pytree definition
(models/memory.py — a flax.struct dataclass, so flax itself is still a
serving dependency); the model zoo, checkpoint converter, and training
stack never import (models/__init__ resolves names lazily). The
reference serves by holding the live torch module inside the eval driver
process (/root/reference/eval_hybrid_seq.py:124-193); this is the
TPU-deployment equivalent — a frozen, process-independent program per
jit specialization.

Artifact layout (``export_stream(...).save(dir)``)::

    manifest.json   shapes / scales / dtypes / platforms / jax version
    first.shlo      first window of a scene (no EST fusion yet)
    steady.shlo     steady state (EST fusion against the memory FIFO)

Both programs take the window as ``lwindow`` SEPARATE per-frame image
arrays (stacked on device inside the program), so the host driver keeps
frames device-resident and uploads only the ONE new frame each step —
the live runner's measured-11x device-resident protocol (eval/estm.py),
not a host re-stack of the whole window::

    first (frames: lw x [B,H,W,3] f32, poses [B,lw,4,4] f32,
           intr [B,3,3] f32, memory)   -> (depth [B,S,H,W], memory, feats)
    steady(frames, poses, intr, memory, feats)
                                       -> (depth [B,S,H,W], memory, feats)

`feats` are the carried matching features of the ``lw-1`` frames shared
with the previous window (eval-mode BN makes them deterministic, so the
carry is exact). Frame-for-frame equality with a live ``ESTMRunner`` is
pinned by tests/test_serving.py.

The Joint protocol exports the same way (``export_joint`` /
``load_joint`` / ``ExportedJointRunner``): seq_length-frame windows
advancing by seq_length-2 frames, the last target's K/V threaded as a
1-entry memory (reference eval_hybrid.py:229-243), with the 2 overlap
frames' matching features carried. A manifest ``protocol`` field keeps
the two artifact kinds from being loaded as each other.

Known limitation vs the live runner: `jax.export` does not carry buffer
donation through serialization (`Exported` has no donation field), so
the restored step cannot reuse the memory/feats buffers in place — the
FIFO state costs one extra transient copy per step compared to the live
jit with `donate_argnames`.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_MANIFEST = "manifest.json"
_FIRST = "first.shlo"
_STEADY = "steady.shlo"
_FORMAT_VERSION = 1

_registered = False


def register_serialization() -> None:
    """Register custom pytree nodes with jax.export (idempotent).

    ESTMemory crosses the exported-function boundary, so its treedef must
    be serializable alongside the StableHLO.
    """
    global _registered
    if _registered:
        return
    from jax import export as jexport

    from estdepth_tpu.models.memory import ESTMemory

    def _ser(aux) -> bytes:
        if aux not in ((), None):  # flax.struct dataclass: no static fields
            raise ValueError(f"unexpected ESTMemory auxdata {aux!r}")
        return b""

    jexport.register_pytree_node_serialization(
        ESTMemory,
        serialized_name="estdepth_tpu.models.memory.ESTMemory",
        serialize_auxdata=_ser,
        deserialize_auxdata=lambda b: (),
    )
    _registered = True


def _make_step_fns(model, variables, output_scales, output_dtype):
    """(first_fn, steady_fn) mirroring eval/estm.py's window step.

    The window arrives as ``lwindow`` separate per-frame arrays and is
    stacked INSIDE the program, so the host driver never re-uploads the
    ``lw-1`` frames it already sent (they stay device-resident buffers)."""
    from estdepth_tpu.eval.output import trim_depth

    def _step(frames, poses, intr, memory, feats, use_est):
        imgs = jnp.stack(frames, axis=1)  # [B, lw, H, W, 3]
        b, lw, h_img, w_img, _ = imgs.shape
        if feats is None:  # first window: matching features of all frames
            all_feats = model.apply(
                variables, imgs.reshape(b * lw, h_img, w_img, 3),
                method="compute_matching",
            ).reshape(b, lw, h_img // 4, w_img // 4, -1)
        else:  # steady state: only the new frame's features
            new_feat = model.apply(
                variables, frames[-1], method="compute_matching",
            )
            all_feats = jnp.concatenate([feats, new_feat[:, None]], 1)
        outputs, (key, value, pose) = model.apply(
            variables, imgs, poses, intr,
            memory=memory if use_est else None,
            use_est=use_est, train=False, matching_feats=all_feats,
        )
        new_memory = memory.push(key, value, pose)
        depth = trim_depth(
            outputs["depth"][:, 0], output_scales, output_dtype
        )
        return depth, new_memory, all_feats[:, 1:]

    def first_fn(frames, poses, intr, memory):
        return _step(frames, poses, intr, memory, None, False)

    def steady_fn(frames, poses, intr, memory, feats):
        return _step(frames, poses, intr, memory, feats, True)

    return first_fn, steady_fn


def _make_joint_step_fns(model, variables, seq_length, output_scales,
                         output_dtype):
    """(first_fn, steady_fn) mirroring tools/eval_joint.py's window step
    (equivalently eval/sequence.make_joint_processor's): seq_length-frame
    windows, seq_length-2 target depths out, last target's K/V pushed into
    a 1-entry memory. The window arrives as separate per-frame arrays so
    the host re-uploads only the seq_length-2 NEW frames per window; the
    2 overlap frames' matching features are carried."""
    overlap = 2
    stride = seq_length - overlap

    def _trim(depth):  # [B, Tt, 4, H, W] -> [B, Tt, S, H, W] (+ cast)
        if tuple(output_scales) != (0, 1, 2, 3):
            depth = depth[:, :, jnp.array(tuple(output_scales))]
        if output_dtype is not None:
            depth = depth.astype(output_dtype)
        return depth

    def _step(frames, poses, intr, memory, feats, use_est):
        imgs = jnp.stack(frames, axis=1)  # [B, lw, H, W, 3]
        b, lw, h_img, w_img, _ = imgs.shape
        if feats is None:  # first window: matching features of all frames
            all_feats = model.apply(
                variables, imgs.reshape(b * lw, h_img, w_img, 3),
                method="compute_matching",
            ).reshape(b, lw, h_img // 4, w_img // 4, -1)
        else:  # steady state: only the stride new frames' features
            new_imgs = jnp.stack(frames[overlap:], axis=1)
            new_feats = model.apply(
                variables, new_imgs.reshape(b * stride, h_img, w_img, 3),
                method="compute_matching",
            ).reshape(b, stride, h_img // 4, w_img // 4, -1)
            all_feats = jnp.concatenate([feats, new_feats], 1)
        outputs, (key, value, pose) = model.apply(
            variables, imgs, poses, intr,
            memory=memory if use_est else None,
            use_est=use_est, train=False, matching_feats=all_feats,
        )
        new_memory = memory.push(key, value, pose)
        depth = _trim(outputs["depth"])
        return depth, new_memory, all_feats[:, stride:]

    def first_fn(frames, poses, intr, memory):
        return _step(frames, poses, intr, memory, None, False)

    def steady_fn(frames, poses, intr, memory, feats):
        return _step(frames, poses, intr, memory, feats, True)

    return first_fn, steady_fn


def _fresh_memory(manifest: dict):
    from estdepth_tpu.models.memory import ESTMemory

    return ESTMemory.create(
        manifest["batch"], manifest["memory_size"], manifest["ndepths"],
        manifest["height"] // 4, manifest["width"] // 4,
        manifest["memory_channels"],
        dtype=jnp.dtype(manifest["memory_dtype"]),
    )


@dataclasses.dataclass
class StreamArtifact:
    """An exported ESTM streaming step: two serialized programs + manifest."""

    manifest: dict
    first_blob: bytes
    steady_blob: bytes

    def save(self, directory: str) -> None:
        os.makedirs(directory, exist_ok=True)
        with open(os.path.join(directory, _MANIFEST), "w") as f:
            json.dump(self.manifest, f, indent=2, sort_keys=True)
        with open(os.path.join(directory, _FIRST), "wb") as f:
            f.write(self.first_blob)
        with open(os.path.join(directory, _STEADY), "wb") as f:
            f.write(self.steady_blob)


def export_stream(
    model,
    variables,
    *,
    height: int,
    width: int,
    batch: int = 1,
    lwindow: int = 3,
    memory_size: int = 2,
    output_scales: Sequence[int] = (0,),
    output_dtype=None,
    platforms: Optional[Sequence[str]] = None,
) -> StreamArtifact:
    """Export the streaming window step as a StableHLO serving artifact.

    Weights are baked into the programs as constants (the freeze_weights
    tradeoff documented in eval/estm.py: long XLA compiles for the
    flagship, but zero per-call weight marshaling — the right side of the
    tradeoff for a frozen serving build). ``platforms`` defaults to the
    current backend; pass e.g. ``("tpu", "cpu")`` for a cross-platform
    artifact exported from any host.
    """
    from jax import export as jexport

    register_serialization()
    first_fn, steady_fn = _make_step_fns(
        model, variables, tuple(output_scales), output_dtype
    )

    f32 = jnp.float32
    frames = tuple(
        jax.ShapeDtypeStruct((batch, height, width, 3), f32)
        for _ in range(lwindow)
    )
    poses = jax.ShapeDtypeStruct((batch, lwindow, 4, 4), f32)
    intr = jax.ShapeDtypeStruct((batch, 3, 3), f32)
    mem_dtype = model.dtype or jnp.float32
    manifest = {
        "format_version": _FORMAT_VERSION,
        "protocol": "stream",
        "jax_version": jax.__version__,
        "platforms": list(platforms) if platforms else [
            jax.default_backend()
        ],
        "height": height,
        "width": width,
        "batch": batch,
        "lwindow": lwindow,
        "memory_size": memory_size,
        "ndepths": model.ndepths,
        "memory_channels": 16,
        "memory_dtype": jnp.dtype(mem_dtype).name,
        "output_scales": list(output_scales),
        "output_dtype": (
            jnp.dtype(output_dtype).name if output_dtype is not None
            else None
        ),
    }
    mem = jax.eval_shape(lambda: _fresh_memory(manifest))
    feats = jax.eval_shape(
        lambda v, i: model.apply(v, i, method="compute_matching"),
        variables,
        jax.ShapeDtypeStruct((batch * (lwindow - 1), height, width, 3), f32),
    )
    feats = jax.ShapeDtypeStruct(
        (batch, lwindow - 1) + feats.shape[1:], feats.dtype
    )

    kw = {"platforms": tuple(platforms)} if platforms else {}
    first = jexport.export(jax.jit(first_fn), **kw)(frames, poses, intr, mem)
    steady = jexport.export(jax.jit(steady_fn), **kw)(
        frames, poses, intr, mem, feats
    )
    return StreamArtifact(
        manifest=manifest,
        first_blob=bytes(first.serialize()),
        steady_blob=bytes(steady.serialize()),
    )


def export_joint(
    model,
    variables,
    *,
    height: int,
    width: int,
    batch: int = 1,
    seq_length: int = 5,
    output_scales: Sequence[int] = (0,),
    output_dtype=None,
    platforms: Optional[Sequence[str]] = None,
) -> StreamArtifact:
    """Export the Joint-protocol window step as a serving artifact.

    Same artifact layout as ``export_stream`` (first/steady StableHLO
    blobs + manifest, weights baked in) with ``protocol: "joint"`` —
    seq_length-frame windows, seq_length-2 target depth maps per window,
    1-entry threaded memory. Load with ``load_joint``.
    """
    from jax import export as jexport

    register_serialization()
    first_fn, steady_fn = _make_joint_step_fns(
        model, variables, seq_length, tuple(output_scales), output_dtype
    )

    f32 = jnp.float32
    frames = tuple(
        jax.ShapeDtypeStruct((batch, height, width, 3), f32)
        for _ in range(seq_length)
    )
    poses = jax.ShapeDtypeStruct((batch, seq_length, 4, 4), f32)
    intr = jax.ShapeDtypeStruct((batch, 3, 3), f32)
    mem_dtype = model.dtype or jnp.float32
    manifest = {
        "format_version": _FORMAT_VERSION,
        "protocol": "joint",
        "jax_version": jax.__version__,
        "platforms": list(platforms) if platforms else [
            jax.default_backend()
        ],
        "height": height,
        "width": width,
        "batch": batch,
        "seq_length": seq_length,
        "memory_size": 1,
        "ndepths": model.ndepths,
        "memory_channels": 16,
        "memory_dtype": jnp.dtype(mem_dtype).name,
        "output_scales": list(output_scales),
        "output_dtype": (
            jnp.dtype(output_dtype).name if output_dtype is not None
            else None
        ),
    }
    mem = jax.eval_shape(lambda: _fresh_memory(manifest))
    feats = jax.eval_shape(
        lambda v, i: model.apply(v, i, method="compute_matching"),
        variables,
        jax.ShapeDtypeStruct((batch * 2, height, width, 3), f32),
    )
    feats = jax.ShapeDtypeStruct((batch, 2) + feats.shape[1:], feats.dtype)

    kw = {"platforms": tuple(platforms)} if platforms else {}
    first = jexport.export(jax.jit(first_fn), **kw)(frames, poses, intr, mem)
    steady = jexport.export(jax.jit(steady_fn), **kw)(
        frames, poses, intr, mem, feats
    )
    return StreamArtifact(
        manifest=manifest,
        first_blob=bytes(first.serialize()),
        steady_blob=bytes(steady.serialize()),
    )


class ExportedStreamRunner:
    """Host-side streaming driver over a deserialized artifact.

    Mirrors eval/estm.py's ESTMRunner window bookkeeping (slide-by-one
    window, FIFO memory, carried matching features, per-scene reset) but
    every device step is a restored ``jax.export`` program — no model
    code or weights on the host path. Window frames are kept as
    device-resident arrays: each step uploads only the ONE new frame
    (the per-frame programs take the window as separate arrays).
    """

    def __init__(self, manifest: dict, first, steady):
        self.manifest = manifest
        self._first = first
        self._steady = steady
        self.batch = manifest["batch"]
        self.lwindow = manifest["lwindow"]
        self.height = manifest["height"]
        self.width = manifest["width"]
        self.reset()

    def reset(self) -> None:
        """New scene: clear window + memory (eval_hybrid_seq.py:163-167)."""
        self._window_imgs = []
        self._window_poses = []
        self._feats = None
        self._memory = _fresh_memory(self.manifest)
        self._memory_filled = False
        self._intr = None

    def push_frame(
        self, img: np.ndarray, pose: np.ndarray, intr: np.ndarray
    ) -> Optional[jnp.ndarray]:
        """Feed one frame per stream; returns [B, S, H, W] center-frame
        depth once the window is full, else None (ESTMRunner protocol)."""
        img = np.asarray(img, np.float32)
        if img.ndim == 3:
            img = np.broadcast_to(img[None], (self.batch,) + img.shape)
        pose = np.asarray(pose, np.float32)
        if pose.ndim == 2:
            pose = np.broadcast_to(pose[None], (self.batch, 4, 4))
        # one [B,H,W,3] upload per frame; prior frames stay on device
        self._window_imgs.append(jnp.asarray(np.ascontiguousarray(img)))
        self._window_poses.append(np.ascontiguousarray(pose))
        if len(self._window_imgs) < self.lwindow:
            return None
        if self._intr is None:
            k = np.asarray(intr, np.float32)
            k = k[None] if k.ndim == 2 else k
            if k.shape[0] != self.batch:
                k = np.tile(k[:1], (self.batch, 1, 1))
            self._intr = k
        frames = tuple(self._window_imgs)
        poses = jnp.asarray(np.stack(self._window_poses, axis=1))
        if self._memory_filled:
            depth, self._memory, self._feats = self._steady.call(
                frames, poses, self._intr, self._memory, self._feats
            )
        else:
            depth, self._memory, self._feats = self._first.call(
                frames, poses, self._intr, self._memory
            )
        self._memory_filled = True
        self._window_imgs.pop(0)
        self._window_poses.pop(0)
        return depth


class ExportedJointRunner:
    """Host-side Joint-protocol driver over a deserialized artifact.

    Mirrors tools/eval_joint.py's JointRunner chain: feed frames one at a
    time; every completed seq_length window (the first after seq_length
    frames, then every seq_length-2 frames) returns its
    [B, seq_length-2, S, H, W] target depths. The 2 overlap frames stay
    device-resident between windows (the programs take the window as
    separate per-frame arrays), so steady state uploads seq_length-2 new
    frames per window.
    """

    def __init__(self, manifest: dict, first, steady):
        self.manifest = manifest
        self._first = first
        self._steady = steady
        self.batch = manifest["batch"]
        self.seq_length = manifest["seq_length"]
        self.stride = self.seq_length - 2
        self.reset()

    def reset(self) -> None:
        """New scene: clear window + threaded memory."""
        self._window_imgs = []
        self._window_poses = []
        self._feats = None
        self._memory = _fresh_memory(self.manifest)
        self._memory_filled = False
        self._intr = None

    def push_frame(
        self, img: np.ndarray, pose: np.ndarray, intr: np.ndarray
    ) -> Optional[jnp.ndarray]:
        """Feed one frame per stream; returns [B, seq_length-2, S, H, W]
        target depths whenever a window completes, else None."""
        img = np.asarray(img, np.float32)
        if img.ndim == 3:
            img = np.broadcast_to(img[None], (self.batch,) + img.shape)
        pose = np.asarray(pose, np.float32)
        if pose.ndim == 2:
            pose = np.broadcast_to(pose[None], (self.batch, 4, 4))
        # one [B,H,W,3] upload per frame; prior frames stay on device
        self._window_imgs.append(jnp.asarray(np.ascontiguousarray(img)))
        self._window_poses.append(np.ascontiguousarray(pose))
        if len(self._window_imgs) < self.seq_length:
            return None
        if self._intr is None:
            k = np.asarray(intr, np.float32)
            k = k[None] if k.ndim == 2 else k
            if k.shape[0] != self.batch:
                k = np.tile(k[:1], (self.batch, 1, 1))
            self._intr = k
        frames = tuple(self._window_imgs)
        poses = jnp.asarray(np.stack(self._window_poses, axis=1))
        if self._memory_filled:
            depth, self._memory, self._feats = self._steady.call(
                frames, poses, self._intr, self._memory, self._feats
            )
        else:
            depth, self._memory, self._feats = self._first.call(
                frames, poses, self._intr, self._memory
            )
        self._memory_filled = True
        # windows advance by seq_length-2 frames (eval_hybrid.py:76-78)
        del self._window_imgs[: self.stride]
        del self._window_poses[: self.stride]
        return depth


def _read_artifact(directory: str, expected_protocol: str, loader_name: str):
    from jax import export as jexport

    register_serialization()
    marker = os.path.join(directory, "VERIFY_FAILED")
    if os.path.exists(marker):
        with open(marker) as f:
            reason = f.read().strip()
        raise ValueError(
            f"artifact {directory} failed export-time verification "
            f"({reason}); re-export it"
        )
    with open(os.path.join(directory, _MANIFEST)) as f:
        manifest = json.load(f)
    if manifest.get("format_version") != _FORMAT_VERSION:
        raise ValueError(
            f"artifact format {manifest.get('format_version')} != "
            f"{_FORMAT_VERSION}"
        )
    protocol = manifest.get("protocol", "stream")
    if protocol != expected_protocol:
        raise ValueError(
            f"artifact {directory} is protocol {protocol!r}; load it with "
            f"load_{protocol} (not {loader_name})"
        )
    with open(os.path.join(directory, _FIRST), "rb") as f:
        first = jexport.deserialize(bytearray(f.read()))
    with open(os.path.join(directory, _STEADY), "rb") as f:
        steady = jexport.deserialize(bytearray(f.read()))
    return manifest, first, steady


def load_stream(directory: str) -> ExportedStreamRunner:
    """Load a saved streaming artifact directory into a ready runner."""
    return ExportedStreamRunner(
        *_read_artifact(directory, "stream", "load_stream")
    )


def load_joint(directory: str) -> ExportedJointRunner:
    """Load a saved Joint-protocol artifact directory into a ready runner."""
    return ExportedJointRunner(
        *_read_artifact(directory, "joint", "load_joint")
    )
