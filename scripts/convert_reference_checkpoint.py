#!/usr/bin/env python
"""Convert a reference (PyTorch) checkpoint into this framework's format.

Usage:
    python scripts/convert_reference_checkpoint.py best_checkpoint.pt out_dir

Reads the reference's ``torch.save`` dict (``{model_state_dict, config,
tokenizer_config, epoch, step, ...}``, ``img2latex/training/trainer.py:181-233``),
maps the weights onto the flax tree (see
``img2latex_tpu.models.convert_reference`` — forward equivalence is covered
by tests/test_reference_convert.py), and writes one of OUR checkpoint
directories, ready for ``Predictor.from_checkpoint(out_dir)`` or
``img2latex-tpu predict/evaluate``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input", help="reference checkpoint .pt")
    ap.add_argument("output", help="output checkpoint directory")
    args = ap.parse_args()

    import torch

    from img2latex_tpu.config import config_from_dict
    from img2latex_tpu.models.convert_reference import convert_reference_checkpoint
    from img2latex_tpu.utils import checkpoint as ckpt_lib

    ckpt = torch.load(args.input, map_location="cpu", weights_only=False)
    variables, ref_cfg, tokenizer_config = convert_reference_checkpoint(ckpt)
    cfg = config_from_dict(ref_cfg)
    step = int(ckpt.get("step", 0) or 0)
    meta = {
        "epoch": int(ckpt.get("epoch", 0) or 0),
        "step": step,
        "best_val_loss": float(ckpt.get("metrics", {}).get("val_loss", float("inf")))
        if isinstance(ckpt.get("metrics"), dict)
        else float("inf"),
        "config": cfg.to_dict(),
        "tokenizer_config": tokenizer_config,
        "converted_from": os.path.abspath(args.input),
    }
    state_tree = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "step": step,
    }
    ckpt_lib.save_checkpoint(args.output, state_tree, meta, step=step, is_best=True)
    print(f"Converted {args.input} -> {args.output}/step_{step}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
