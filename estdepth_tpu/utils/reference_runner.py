"""Run the ACTUAL reference implementation (/root/reference, PyTorch) with
weights exported from an estdepth_tpu model.

This is the ground-truth side of the numerical parity harness
(tests/test_reference_parity.py): instead of re-deriving torch comparators
from the reference's documented behavior, we execute the reference's own
modules (networks/psm_submodule.py, hybrid_models/hybrid_depth_decoder.py,
hybrid_models/model_hybrid.py, transformer/epipolar_transformer.py,
utils/homo_utils.py) and compare outputs numerically.

The only reference dependency not installed here is torchvision, which it
imports solely to construct the ResNet context encoder
(hybrid_models/resnet_encoder.py:13,27-35). `install_torchvision_stub`
registers a minimal stand-in that provides the standard torchvision ResNet
architecture (v1.5 bottleneck — stride on the 3x3 conv — identical module
names and state_dict layout), which is exactly the architecture
estdepth_tpu/models/resnet.py implements and utils/convert.py maps.
"""

from __future__ import annotations

import sys
import types
from typing import Any, Dict

import numpy as np

REFERENCE_ROOT = "/root/reference"


# --------------------------------------------------------------------------
# Minimal torchvision ResNet stand-in (standard public architecture).
# --------------------------------------------------------------------------

def _make_resnet_classes():
    import torch.nn as nn

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(
                planes, planes * self.expansion, 1, bias=False
            )
            self.bn3 = nn.BatchNorm2d(planes * self.expansion)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet(nn.Module):
        def __init__(self, block, layers, num_classes=1000):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = self._make_layer(block, 64, layers[0])
            self.layer2 = self._make_layer(block, 128, layers[1], 2)
            self.layer3 = self._make_layer(block, 256, layers[2], 2)
            self.layer4 = self._make_layer(block, 512, layers[3], 2)
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc = nn.Linear(512 * block.expansion, num_classes)

        def _make_layer(self, block, planes, blocks, stride=1):
            downsample = None
            if stride != 1 or self.inplanes != planes * block.expansion:
                downsample = nn.Sequential(
                    nn.Conv2d(
                        self.inplanes, planes * block.expansion, 1, stride,
                        bias=False,
                    ),
                    nn.BatchNorm2d(planes * block.expansion),
                )
            layers = [block(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes * block.expansion
            for _ in range(1, blocks):
                layers.append(block(self.inplanes, planes))
            return nn.Sequential(*layers)

        def forward(self, x):
            x = self.relu(self.bn1(self.conv1(x)))
            x = self.maxpool(x)
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = self.avgpool(x)
            return self.fc(x.flatten(1))

    return BasicBlock, Bottleneck, ResNet


def install_torchvision_stub() -> None:
    """Register a minimal `torchvision.models` in sys.modules (idempotent).

    Only the resnet constructors the reference touches
    (resnet_encoder.py:26-30) are provided; `pretrained` is accepted and
    ignored — parity runs always overwrite weights with an exported
    state_dict.
    """
    if "torchvision" in sys.modules:
        return
    BasicBlock, Bottleneck, ResNet = _make_resnet_classes()

    models = types.ModuleType("torchvision.models")
    cfgs = {
        "resnet18": (BasicBlock, [2, 2, 2, 2]),
        "resnet34": (BasicBlock, [3, 4, 6, 3]),
        "resnet50": (Bottleneck, [3, 4, 6, 3]),
        "resnet101": (Bottleneck, [3, 4, 23, 3]),
        "resnet152": (Bottleneck, [3, 8, 36, 3]),
    }

    def _factory(block, layers):
        def ctor(pretrained=False, **kwargs):
            return ResNet(block, layers, **kwargs)

        return ctor

    for name, (block, layers) in cfgs.items():
        setattr(models, name, _factory(block, layers))
    models.ResNet = ResNet
    models.BasicBlock = BasicBlock
    models.Bottleneck = Bottleneck

    # torchvision.transforms subset used by the reference's m_preprocess
    # (data/m_preprocess.py:10-37): ToTensor / Normalize / Compose with the
    # standard public semantics. The eval datasets construct these but
    # never apply them to the images (SURVEY §2.2); the train dataset only
    # holds a ToTensor it does not call in read_sample_train.
    import torch as _torch

    class _ToTensor:
        def __call__(self, pic):
            a = np.asarray(pic)
            if a.ndim == 2:
                a = a[:, :, None]
            t = _torch.from_numpy(np.ascontiguousarray(a.transpose(2, 0, 1)))
            if a.dtype == np.uint8:
                t = t.to(_torch.float32) / 255.0
            return t

    class _Normalize:
        def __init__(self, mean, std):
            self.mean = _torch.tensor(mean).view(-1, 1, 1)
            self.std = _torch.tensor(std).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    class _Compose:
        def __init__(self, ts):
            self.transforms = ts

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    transforms = types.ModuleType("torchvision.transforms")
    transforms.ToTensor = _ToTensor
    transforms.Normalize = _Normalize
    transforms.Compose = _Compose

    # torchvision.utils.make_grid: imported at module scope by the
    # reference's utils/utils.py:2 (used only inside save_images, which the
    # parity harness never calls) — an identity stand-in suffices.
    tv_utils = types.ModuleType("torchvision.utils")
    tv_utils.make_grid = lambda t, *a, **k: t
    tv = types.ModuleType("torchvision")
    tv.models = models
    tv.transforms = transforms
    tv.utils = tv_utils
    tv.__version__ = "0.0-estdepth-stub"
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.utils"] = tv_utils


def install_natsort_stub() -> None:
    """Register a minimal `natsort.natsorted` (idempotent).

    Standard natural-sort semantics (digit runs compared numerically);
    the reference only sorts zero-padded `frame-%06d.*` globs with it
    (general_eval.py:37-38), where this is also identical to plain sort.
    """
    # `path.Path` (the path.py package, general_eval.py:3): os.PathLike and
    # str-interoperable — pathlib.Path covers the reference's usage.
    # Registered FIRST, independent of whether natsort needs stubbing.
    if "path" not in sys.modules:
        import pathlib

        pm = types.ModuleType("path")
        pm.Path = pathlib.Path
        sys.modules["path"] = pm

    if "natsort" in sys.modules:
        return
    try:  # a real natsort wins if installed
        import natsort  # noqa: F401

        return
    except ImportError:
        pass
    import re as _re

    def natsorted(seq, key=None):
        def nkey(s):
            s2 = key(s) if key is not None else s
            return [
                int(t) if t.isdigit() else t
                for t in _re.split(r"(\d+)", str(s2))
            ]

        return sorted(seq, key=nkey)

    m = types.ModuleType("natsort")
    m.natsorted = natsorted
    sys.modules["natsort"] = m


def import_reference_datasets(root: str = REFERENCE_ROOT):
    """Make the reference's data/ package importable and return its modules.

    Returns a namespace with: scannet, scannet_select, general_eval,
    general_eval_seq — the ACTUAL reference dataset code, runnable on a
    fake on-disk scene for protocol parity tests.
    """
    install_torchvision_stub()
    install_natsort_stub()
    if root not in sys.path:
        sys.path.append(root)
    import importlib

    ns = types.SimpleNamespace()
    ns.scannet = importlib.import_module("data.scannet")
    ns.scannet_select = importlib.import_module("data.scannet_select")
    ns.general_eval = importlib.import_module("data.general_eval")
    ns.general_eval_seq = importlib.import_module("data.general_eval_seq")
    return ns


def install_torch12_semantics() -> None:
    """Restore torch-1.2 `grid_sample` semantics for the reference code.

    The reference pins torch 1.2 (environment.yml), whose grid_sample had
    align_corners=True behavior and no `align_corners` argument
    (SURVEY.md "hard parts"; homo_utils.py:276,499 call it bare). torch
    >= 1.3 added the argument with default False, so running the reference
    under the installed torch silently changes every warp by half a pixel.
    This patch makes a bare grid_sample call mean align_corners=True again —
    callers passing the argument explicitly are unaffected. Idempotent.
    """
    import torch.nn.functional as F

    if getattr(F.grid_sample, "_estdepth_torch12", False):
        return
    orig = F.grid_sample

    def grid_sample(input, grid, mode="bilinear", padding_mode="zeros",
                    align_corners=None):
        if align_corners is None:
            align_corners = True
        return orig(input, grid, mode=mode, padding_mode=padding_mode,
                    align_corners=align_corners)

    grid_sample._estdepth_torch12 = True
    F.grid_sample = grid_sample


def import_reference(root: str = REFERENCE_ROOT):
    """Make the reference repo importable and return its key modules.

    Returns a namespace with: model_hybrid, hybrid_depth_decoder,
    psm_submodule, epipolar_transformer, homo_utils, metric.
    """
    install_torchvision_stub()
    install_torch12_semantics()
    if root not in sys.path:
        # The reference uses top-level packages (utils, networks, ...);
        # append so nothing shadows this repo's own modules.
        sys.path.append(root)
    import importlib

    ns = types.SimpleNamespace()
    ns.psm_submodule = importlib.import_module("networks.psm_submodule")
    ns.epipolar_transformer = importlib.import_module(
        "transformer.epipolar_transformer"
    )
    ns.homo_utils = importlib.import_module("utils.homo_utils")
    ns.hybrid_depth_decoder = importlib.import_module(
        "hybrid_models.hybrid_depth_decoder"
    )
    ns.model_hybrid = importlib.import_module("hybrid_models.model_hybrid")
    ns.metric = importlib.import_module("metric")
    # the ACTUAL training-infra module: WarmupMultiStepLR etc.
    # (utils/utils.py:208-252), used by the training-trajectory oracle
    ns.utils = importlib.import_module("utils.utils")
    return ns


def load_reference_state(ref_model, variables: Dict[str, Any]) -> None:
    """Load an estdepth_tpu variables pytree into a reference torch module.

    Goes through utils/convert.py's export_state_dict (the documented
    inverse name/layout mapping). Asserts every exported tensor lands and
    that the only reference parameters left untouched are BN bookkeeping
    counters and the unused classification head
    (resnet_encoder.py:40-51 never calls encoder.fc / avgpool).
    """
    import numpy as np
    import torch

    from estdepth_tpu.utils.convert import export_state_dict

    sd = export_state_dict(variables)
    tsd = {
        k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()
    }
    missing, unexpected = ref_model.load_state_dict(tsd, strict=False)
    if unexpected:
        raise KeyError(f"exported keys unknown to reference: {unexpected[:8]}")
    bad = [
        k
        for k in missing
        if "num_batches_tracked" not in k and ".fc." not in k
    ]
    if bad:
        raise KeyError(f"reference parameters not covered: {bad[:8]}")


def build_reference_model(
    variables: Dict[str, Any],
    ndepths: int = 64,
    depth_min: float = 0.01,
    depth_max: float = 10.0,
    resnet: int = 50,
    est_transformer: bool = True,
):
    """Construct the reference DepthNetHybrid (eval mode) carrying the given
    estdepth_tpu variables. Mirrors model build at eval_hybrid_seq.py:399-421.
    """
    ref = import_reference()
    model = ref.model_hybrid.DepthNetHybrid(
        ndepths=ndepths,
        depth_min=depth_min,
        depth_max=depth_max,
        resnet=resnet,
        IF_EST_transformer=est_transformer,
    )
    load_reference_state(model, variables)
    return model.eval()
