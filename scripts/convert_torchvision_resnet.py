#!/usr/bin/env python
"""Convert torchvision ResNet weights to the flax ResNetBackbone layout.

Usage:
    python scripts/convert_torchvision_resnet.py resnet50.pth resnet50.npz \
        --model resnet50

Input: a ``state_dict`` saved from ``torchvision.models.resnetXX(weights=...)``
(the reference loads IMAGENET1K_V1, ``img2latex/model/encoder.py:184-199``).
Output: an ``.npz`` whose keys match ``img2latex_tpu.models.resnet``:

    conv kernels   OIHW -> HWIO transpose,  ``<block>/<conv>/kernel``
    BN weight/bias -> ``<block>/<bn>/{scale,bias}`` (params collection)
    BN running stats -> ``<block>/<bn>/{mean,var}`` (batch_stats collection)

Load at model-build time with :func:`load_converted_resnet` (set
``model.encoder.resnet.pretrained_path`` in the config).  This environment
has no torchvision and no network egress, so conversion is an offline step
run wherever the .pth exists; the mapping itself is unit-tested against a
synthesized state dict (tests/test_resnet_convert.py).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from typing import Any, Dict, Tuple

import numpy as np

from img2latex_tpu.models.pretrained import (  # noqa: F401
    convert_state_dict,
    load_converted_resnet,
    map_torch_key,
    unflatten,
)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input", help="torchvision state_dict .pth")
    ap.add_argument("output", help="output .npz path")
    ap.add_argument("--model", default="resnet50")
    args = ap.parse_args()
    import torch

    sd = torch.load(args.input, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    flat = convert_state_dict(sd)
    np.savez(args.output, **flat)
    print(f"Converted {len(flat)} tensors -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
