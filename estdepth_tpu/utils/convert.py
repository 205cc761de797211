"""PyTorch checkpoint -> estdepth_tpu variables converter.

One-time converter for the reference's released DepthNetHybrid checkpoints
(torch.save({'epoch','model','optimizer'}), /root/reference/train_hybrid.py:
137-151), enabling parity evaluation (SURVEY.md §6).

Name mapping (torch module tree, from the reference sources):
  matchingFeature.*      (networks/psm_submodule.py) -> params.matching_feature
  semanticFeature.encoder.* (torchvision resnet)     -> params.semantic_feature
  CostRegNet.*           (hybrid_depth_decoder.py)   -> params.decoder
  pre0/pre1/pre2         (model_hybrid.py:58-60)     -> params.pre0/1/2

Layout: Conv2d [O,I,kh,kw] -> [kh,kw,I,O]; Conv3d [O,I,kd,kh,kw] ->
[kd,kh,kw,I,O]; BatchNorm weight/bias/running_mean/running_var ->
scale/bias + batch_stats mean/var; GroupNorm weight/bias -> scale/bias.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    if w.ndim == 4:  # Conv2d
        return np.transpose(w, (2, 3, 1, 0))
    if w.ndim == 5:  # Conv3d
        return np.transpose(w, (2, 3, 4, 1, 0))
    raise ValueError(f"unexpected conv weight rank {w.ndim}")


def _put(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


# --- per-subtree torch-name -> our-path rules ------------------------------

def _map_psm(key: str):
    """matchingFeature.* (psm_submodule.py:40-116).

    torch names:
      firstconv.{0,2,4}.{0,1}.*          -> firstconv_{0,1,2}.{conv,bn}
      layer{L}.{i}.conv1.0.{0,1}.*       -> layer{L}_{i}.conv1.{conv,bn}
      layer{L}.{i}.conv2.{0,1}.*         -> layer{L}_{i}.conv2.{conv,bn}
      layer{L}.{i}.downsample.{0,1}.*    -> layer{L}_{i}.downsample.{conv,bn}
      branch{B}.1.{0,1}.*                -> branch{B}.{conv,bn}
      lastconv.0.{0,1}.*                 -> lastconv_0.{conv,bn}
      lastconv.2.weight                  -> lastconv_1 (plain conv)
    """
    m = re.match(r"firstconv\.(\d+)\.(\d+)\.(.+)", key)
    if m:
        seq, sub, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        return (f"firstconv_{seq // 2}", "conv" if sub == 0 else "bn", rest)
    m = re.match(r"layer(\d+)\.(\d+)\.conv1\.0\.(\d+)\.(.+)", key)
    if m:
        return (f"layer{m.group(1)}_{m.group(2)}", "conv1",
                "conv" if int(m.group(3)) == 0 else "bn", m.group(4))
    m = re.match(r"layer(\d+)\.(\d+)\.conv2\.(\d+)\.(.+)", key)
    if m:
        return (f"layer{m.group(1)}_{m.group(2)}", "conv2",
                "conv" if int(m.group(3)) == 0 else "bn", m.group(4))
    m = re.match(r"layer(\d+)\.(\d+)\.downsample\.(\d+)\.(.+)", key)
    if m:
        return (f"layer{m.group(1)}_{m.group(2)}", "downsample",
                "conv" if int(m.group(3)) == 0 else "bn", m.group(4))
    m = re.match(r"branch(\d+)\.1\.(\d+)\.(.+)", key)
    if m:
        return (f"branch{m.group(1)}",
                "conv" if int(m.group(2)) == 0 else "bn", m.group(3))
    m = re.match(r"lastconv\.0\.(\d+)\.(.+)", key)
    if m:
        return ("lastconv_0", "conv" if int(m.group(1)) == 0 else "bn",
                m.group(2))
    m = re.match(r"lastconv\.2\.(.+)", key)
    if m:
        return ("lastconv_1", m.group(1))
    return None


def _map_resnet(key: str):
    """semanticFeature.encoder.* (torchvision resnet layout)."""
    m = re.match(r"conv1\.(.+)", key)
    if m:
        return ("conv1", "conv", m.group(1))
    m = re.match(r"bn1\.(.+)", key)
    if m:
        return ("conv1", "bn", m.group(1))
    m = re.match(r"layer(\d+)\.(\d+)\.conv(\d)\.(.+)", key)
    if m:
        return (f"layer{m.group(1)}_{m.group(2)}", f"conv{m.group(3)}",
                "conv", m.group(4))
    m = re.match(r"layer(\d+)\.(\d+)\.bn(\d)\.(.+)", key)
    if m:
        return (f"layer{m.group(1)}_{m.group(2)}", f"conv{m.group(3)}",
                "bn", m.group(4))
    m = re.match(r"layer(\d+)\.(\d+)\.downsample\.(\d+)\.(.+)", key)
    if m:
        return (f"layer{m.group(1)}_{m.group(2)}", "downsample",
                "conv" if int(m.group(3)) == 0 else "bn", m.group(4))
    if key.startswith("fc."):
        return "skip"  # classification head unused (resnet_encoder.py:40-51)
    return None


def _map_decoder(key: str):
    """CostRegNet.* (hybrid_depth_decoder.py:41-112)."""
    m = re.match(r"(upconv_\d_\d)\.conv\.(\d+)\.(.+)", key)
    if m:
        return (m.group(1), "conv", "conv" if int(m.group(2)) == 0 else "bn",
                m.group(3))
    m = re.match(r"(dispconv_[01])\.(.+)", key)
    if m:
        return (m.group(1), m.group(2))
    m = re.match(r"dres([01])\.(\d+)\.(\d+)\.(.+)", key)
    if m:
        return (f"dres{m.group(1)}_{m.group(2)}", "conv",
                "conv" if int(m.group(3)) == 0 else "bn", m.group(4))
    m = re.match(r"dres2\.0\.(\d+)\.(.+)", key)
    if m:
        return ("dres2", "conv", "conv" if int(m.group(1)) == 0 else "bn",
                m.group(2))
    m = re.match(r"(key_layer|value_layer)\.0\.(\d+)\.(.+)", key)
    if m:
        return (m.group(1), "conv",
                "conv" if int(m.group(2)) == 0 else "bn", m.group(3))
    m = re.match(r"(stereo_head[01])\.0\.(\d+)\.(.+)", key)
    if m:
        sub = "conv" if int(m.group(2)) == 0 else "bn"
        return (m.group(1), "conv0", "conv", sub, m.group(3))
    m = re.match(r"(stereo_head[01])\.1\.(.+)", key)
    if m:
        return (m.group(1), "out", m.group(2))
    m = re.match(
        r"epipolar_transformer\.(gate_conv|output_conv|reset_gate_norm"
        r"|update_gate_norm|output_norm)\.(.+)",
        key,
    )
    if m:
        return ("est", m.group(1), m.group(2))
    return None


def _map_pre(key: str):
    m = re.match(r"(pre[012])\.(\d+)\.(.+)", key)
    if m:
        return (m.group(1), "conv" if int(m.group(2)) == 0 else "bn",
                m.group(3))
    return None


def convert_state_dict(state_dict: Dict[str, "np.ndarray"], strict: bool = True):
    """torch state_dict (tensor or ndarray values) -> {'params', 'batch_stats'}.

    Handles the 'module.' DDP prefix (train_hybrid.py:363-368).
    """
    params: Dict = {}
    batch_stats: Dict = {}
    unmatched = []

    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        arr = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value
        )
        k = key[len("module."):] if key.startswith("module.") else key

        if k.startswith("matchingFeature."):
            root, mapped = "matching_feature", _map_psm(
                k[len("matchingFeature."):]
            )
        elif k.startswith("semanticFeature.encoder."):
            root, mapped = "semantic_feature", _map_resnet(
                k[len("semanticFeature.encoder."):]
            )
        elif k.startswith("CostRegNet."):
            root, mapped = "decoder", _map_decoder(k[len("CostRegNet."):])
        elif k.startswith("pre"):
            root, mapped = None, _map_pre(k)
        else:
            root, mapped = None, None

        if mapped == "skip":
            continue
        if mapped is None:
            unmatched.append(key)
            continue

        path = ((root,) if root else ()) + tuple(mapped[:-1])
        leaf = mapped[-1]
        if leaf == "weight":
            if arr.ndim >= 4:  # conv
                _put(params, path + ("kernel",), _conv_kernel(arr))
            else:  # norm scale
                _put(params, path + ("scale",), arr)
        elif leaf == "bias":
            _put(params, path + ("bias",), arr)
        elif leaf == "running_mean":
            _put(batch_stats, path + ("mean",), arr)
        elif leaf == "running_var":
            _put(batch_stats, path + ("var",), arr)
        else:
            unmatched.append(key)

    if unmatched and strict:
        raise KeyError(f"unmatched torch keys ({len(unmatched)}): "
                       f"{unmatched[:10]} ...")
    return {"params": params, "batch_stats": batch_stats}, unmatched


def _invert_conv_kernel(k: np.ndarray) -> np.ndarray:
    if k.ndim == 4:  # [kh,kw,I,O] -> [O,I,kh,kw]
        return np.transpose(k, (3, 2, 0, 1))
    if k.ndim == 5:  # [kd,kh,kw,I,O] -> [O,I,kd,kh,kw]
        return np.transpose(k, (4, 3, 0, 1, 2))
    raise ValueError(f"unexpected kernel rank {k.ndim}")


# inverse of the _map_* rules: our path segments -> torch name fragments
_PSM_INV = {
    "firstconv_0": "firstconv.0", "firstconv_1": "firstconv.2",
    "firstconv_2": "firstconv.4",
    "branch1": "branch1.1", "branch2": "branch2.1",
    "branch3": "branch3.1", "branch4": "branch4.1",
    "lastconv_0": "lastconv.0",
}


def export_state_dict(variables) -> dict:
    """Our {'params','batch_stats'} -> a torch-style state_dict with the
    reference's module names (the exact inverse of convert_state_dict;
    enables round-trip validation and export to the reference format)."""
    import re as _re

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out = {}

    def emit(torch_prefix, node, stat_node, kind):
        """kind: 'conv' | 'bn' | 'gn' | 'plain'"""
        if kind == "conv":
            out[f"{torch_prefix}.weight"] = _invert_conv_kernel(
                np.asarray(node["kernel"])
            )
            if "bias" in node:
                out[f"{torch_prefix}.bias"] = np.asarray(node["bias"])
        elif kind in ("bn", "gn"):
            out[f"{torch_prefix}.weight"] = np.asarray(node["scale"])
            out[f"{torch_prefix}.bias"] = np.asarray(node["bias"])
            if kind == "bn" and stat_node is not None:
                out[f"{torch_prefix}.running_mean"] = np.asarray(
                    stat_node["mean"]
                )
                out[f"{torch_prefix}.running_var"] = np.asarray(stat_node["var"])

    def convbn(torch_base, node, stat_node, conv_idx="0", bn_idx="1"):
        emit(f"{torch_base}.{conv_idx}", node["conv"], None, "conv")
        emit(f"{torch_base}.{bn_idx}", node["bn"],
             stat_node.get("bn") if stat_node else None, "bn")

    # --- matching feature (PSM)
    mf = params.get("matching_feature", {})
    ms = stats.get("matching_feature", {})
    for name, node in mf.items():
        snode = ms.get(name, {})
        m = _re.match(r"layer(\d+)_(\d+)$", name)
        if m:
            base = f"matchingFeature.layer{m.group(1)}.{m.group(2)}"
            convbn(f"{base}.conv1.0", node["conv1"], snode.get("conv1"))
            convbn(f"{base}.conv2", node["conv2"], snode.get("conv2"))
            if "downsample" in node:
                convbn(f"{base}.downsample", node["downsample"],
                       snode.get("downsample"))
        elif name == "lastconv_1":
            emit("matchingFeature.lastconv.2", node, None, "conv")
        elif name in _PSM_INV:
            convbn(f"matchingFeature.{_PSM_INV[name]}", node, snode)

    # --- semantic feature (torchvision resnet)
    sf = params.get("semantic_feature", {})
    ss = stats.get("semantic_feature", {})
    for name, node in sf.items():
        snode = ss.get(name, {})
        if name == "conv1":
            emit("semanticFeature.encoder.conv1", node["conv"], None, "conv")
            emit("semanticFeature.encoder.bn1", node["bn"],
                 snode.get("bn"), "bn")
            continue
        m = _re.match(r"layer(\d+)_(\d+)$", name)
        if m:
            base = f"semanticFeature.encoder.layer{m.group(1)}.{m.group(2)}"
            for ci in ("1", "2", "3"):
                key = f"conv{ci}"
                if key in node:
                    emit(f"{base}.conv{ci}", node[key]["conv"], None, "conv")
                    emit(f"{base}.bn{ci}", node[key]["bn"],
                         snode.get(key, {}).get("bn"), "bn")
            if "downsample" in node:
                convbn(f"{base}.downsample", node["downsample"],
                       snode.get("downsample"))

    # --- decoder
    dec = params.get("decoder", {})
    ds = stats.get("decoder", {})
    for name, node in dec.items():
        snode = ds.get(name, {})
        if name.startswith("upconv_"):
            convbn(f"CostRegNet.{name}.conv", node["conv"], snode.get("conv"))
        elif name.startswith("dispconv_"):
            emit(f"CostRegNet.{name}", node, None, "conv")
        elif _re.match(r"dres[01]_\d$", name):
            seq = name[-1]
            convbn(f"CostRegNet.{name[:5]}.{seq}", node["conv"],
                   snode.get("conv"))
        elif name == "dres2":
            convbn("CostRegNet.dres2.0", node["conv"], snode.get("conv"))
        elif name in ("key_layer", "value_layer"):
            convbn(f"CostRegNet.{name}.0", node["conv"], snode.get("conv"))
        elif name.startswith("stereo_head"):
            convbn(f"CostRegNet.{name}.0", node["conv0"]["conv"],
                   snode.get("conv0", {}).get("conv"))
            emit(f"CostRegNet.{name}.1", node["out"], None, "conv")
        elif name == "est":
            for sub in ("gate_conv", "output_conv"):
                emit(f"CostRegNet.epipolar_transformer.{sub}", node[sub],
                     None, "conv")
            for sub in ("reset_gate_norm", "update_gate_norm", "output_norm"):
                emit(f"CostRegNet.epipolar_transformer.{sub}", node[sub],
                     None, "gn")

    # --- pre0/1/2
    for name in ("pre0", "pre1", "pre2"):
        if name in params:
            convbn(name, params[name], stats.get(name, {}))

    return out


def load_torch_checkpoint(path: str, strict: bool = True):
    """Load a reference .ckpt file and convert (requires torch)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = blob.get("model", blob) if isinstance(blob, dict) else blob
    return convert_state_dict(state_dict, strict=strict)


def convert_torchvision_resnet(state_dict: Dict[str, "np.ndarray"]):
    """torchvision resnet{18,34,50,101,152} state_dict -> the
    `semantic_feature` variables subtree ({'params', 'batch_stats'}).

    This is the ImageNet-pretrained encoder import path: the reference
    trains from torchvision pretrained weights
    (hybrid_models/resnet_encoder.py:35, pretrained=True), so training
    parity requires initializing our ResNetEncoder the same way.
    """
    prefixed = {
        f"semanticFeature.encoder.{k}": v for k, v in state_dict.items()
    }
    tree, _ = convert_state_dict(prefixed, strict=True)
    return {
        "params": tree["params"]["semantic_feature"],
        "batch_stats": tree["batch_stats"]["semantic_feature"],
    }


def load_pretrained_encoder(path: str):
    """Load a pretrained `semantic_feature` subtree from either a converted
    .npz artifact (tools/import_torchvision.py) or a raw torchvision .pth
    (converted on the fly; requires torch)."""
    if path.endswith(".npz"):
        flat = dict(np.load(path))
        return unflatten_tree(flat)
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return convert_torchvision_resnet(sd)


def flatten_tree(tree, prefix: str = "") -> Dict[str, "np.ndarray"]:
    """Nested dict -> {'a/b/c': array} (npz-friendly)."""
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(flatten_tree(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_tree(flat: Dict[str, "np.ndarray"]) -> Dict:
    """Inverse of flatten_tree."""
    tree: Dict = {}
    for key, v in flat.items():
        _put(tree, tuple(key.split("/")), np.asarray(v))
    return tree
