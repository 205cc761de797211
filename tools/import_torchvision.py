#!/usr/bin/env python
"""Import ImageNet-pretrained torchvision ResNet weights as the
`semantic_feature` encoder initialization.

The reference trains its context encoder from torchvision pretrained
weights (/root/reference/hybrid_models/resnet_encoder.py:35,
`pretrained=True`), so reproducing the training recipe requires the same
initialization. This tool converts a torchvision resnet{18,34,50,101,152}
state_dict (a local .pth file — this environment has no network egress) to
a torch-free .npz artifact that `tools/train.py --pretrained-encoder` (or
utils/convert.load_pretrained_encoder) consumes.

Usage:
  python tools/import_torchvision.py --pth resnet50-*.pth --out resnet50_enc.npz
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pth", required=True,
                   help="torchvision resnet state_dict (.pth)")
    p.add_argument("--out", required=True, help="output .npz path")
    args = p.parse_args()

    import numpy as np
    import torch

    from estdepth_tpu.utils.convert import (
        convert_torchvision_resnet,
        flatten_tree,
    )

    blob = torch.load(args.pth, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    tree = convert_torchvision_resnet(sd)
    flat = flatten_tree(tree)
    np.savez(args.out, **flat)
    n_params = sum(v.size for v in flat.values())
    print(f"wrote {args.out}: {len(flat)} tensors, {n_params/1e6:.2f}M values")


if __name__ == "__main__":
    main()
