#!/usr/bin/env python
"""Export a trained orbax checkpoint to the reference's torch .ckpt format.

Inverse of the import path: writes torch.save({'epoch', 'model'}) with the
reference's module names (train_hybrid.py:137-151 layout), so models trained
here can be evaluated by the original PyTorch code (or inspected with torch
tooling).

Usage:
  python tools/export_torch.py --ckpt logs/ckpt --out model_000060.ckpt
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from estdepth_tpu.utils.platform import apply_platform_env

apply_platform_env()


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True,
                   help="orbax checkpoint dir written by tools/train.py")
    p.add_argument("--out", required=True, help="output .ckpt path")
    p.add_argument("--step", type=int, default=None)
    args = p.parse_args()

    import numpy as np
    import orbax.checkpoint as ocp
    import torch

    from estdepth_tpu.utils.convert import export_state_dict

    mgr = ocp.CheckpointManager(os.path.abspath(args.ckpt))
    step = args.step if args.step is not None else mgr.latest_step()
    restored = mgr.restore(step)
    variables = {
        "params": restored["params"],
        "batch_stats": restored["batch_stats"],
    }
    sd = export_state_dict(variables)
    torch_sd = {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}
    torch.save({"epoch": int(restored["step"]), "model": torch_sd}, args.out)
    print(f"wrote {args.out}: {len(torch_sd)} tensors from step {step}")


if __name__ == "__main__":
    main()
