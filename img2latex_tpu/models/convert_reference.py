"""Convert reference (PyTorch) Seq2Seq checkpoints to this framework.

The reference saves ``{epoch, step, model_state_dict, optimizer_state_dict,
metrics, config, tokenizer_config}`` via ``torch.save``
(``img2latex/training/trainer.py:181-233``).  This module maps its
``model_state_dict`` onto our flax parameter tree so a user can bring their
trained reference checkpoints along:

CNN-LSTM (``model/encoder.py:74-107``, ``model/decoder.py:69-93``):

* ``encoder.cnn_layers.{3i}.weight``  (OIHW) -> ``encoder/Conv_i/kernel`` (HWIO)
* ``encoder.embedding_layer.weight``  -> ``encoder/Dense_0/kernel`` with the
  NCHW->NHWC **flatten permutation** applied to its input rows: torch
  flattens the conv stack's (C, H', W') activations c-major while NHWC
  flattens (H', W', C) channel-minor, so row ``c*H'W' + h*W' + w`` moves to
  ``h*W'C + w*C + c``;
* ``decoder.embedding.weight``        -> ``decoder/cell/embedding/embedding``
* ``decoder.lstm.weight_ih_l{k}``     -> ``decoder/cell/lstm/W_ih_l{k}`` (transposed;
  gate order (i,f,g,o) matches by construction, models/lstm.py)
* ``decoder.attention.attn|v``        -> ``decoder/cell/attention/{attn,v}``
* ``decoder.output_layer``            -> ``decoder/cell/out``

Forward-equivalence (same logits as a torch execution of the reference
architecture) is asserted in tests/test_reference_convert.py.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

from img2latex_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def _warn_unmatched(unmatched: List[str], family: str) -> None:
    """A reference checkpoint variant we don't recognize (renamed heads,
    bidirectional LSTMs, extra modules) must not convert 'successfully' with
    silently missing weights — the model would run with fresh inits in their
    place."""
    if unmatched:
        logger.warning(
            "convert(%s): %d state_dict key(s) did not match any mapping and "
            "were DROPPED: %s — the converted tree may be missing trained "
            "weights", family, len(unmatched), ", ".join(sorted(unmatched)),
        )

import numpy as np


def _t(arr) -> np.ndarray:
    a = np.asarray(arr.detach().cpu().numpy() if hasattr(arr, "detach") else arr, np.float32)
    return a


def flatten_permutation(c: int, h: int, w: int) -> np.ndarray:
    """Row permutation mapping torch's (C,H,W)-flatten index to NHWC's
    (H,W,C)-flatten index: perm[new_row] = old_row."""
    idx = np.arange(c * h * w).reshape(c, h, w)  # old layout: [c, h, w]
    return np.transpose(idx, (1, 2, 0)).reshape(-1)  # new order (h, w, c)


def _convert_decoder_key(key: str, value: Any, cell: Dict[str, Any]) -> bool:
    """Map one reference decoder/head state-dict key into the flax cell tree
    (shared by cnn_lstm and resnet_lstm — the decoder is identical,
    ``model/decoder.py:16-284``).  Returns True when handled."""
    if key == "decoder.embedding.weight":
        cell["embedding"] = {"embedding": _t(value)}
        return True
    m = re.match(r"decoder\.lstm\.(weight|bias)_(ih|hh)_l(\d+)$", key)
    if m:
        part, which, layer = m.groups()
        name = f"{'W' if part == 'weight' else 'b'}_{which}_l{layer}"
        arr = _t(value)
        cell["lstm"][name] = arr.T if part == "weight" else arr
        return True
    if key.startswith("decoder.attention.attn."):
        cell.setdefault("attention", {}).setdefault("attn", {})[
            "kernel" if key.endswith("weight") else "bias"
        ] = _t(value).T if key.endswith("weight") else _t(value)
        return True
    if key.startswith("decoder.attention.v."):
        cell.setdefault("attention", {}).setdefault("v", {})["kernel"] = _t(value).T
        return True
    if key == "decoder.output_layer.weight":
        cell.setdefault("out", {})["kernel"] = _t(value).T
        return True
    if key == "decoder.output_layer.bias":
        cell.setdefault("out", {})["bias"] = _t(value)
        return True
    return False


def convert_cnn_lstm_state_dict(
    state_dict: Dict[str, Any],
    conv_shape_after: Tuple[int, int, int],
) -> Dict[str, Any]:
    """Reference cnn_lstm ``model_state_dict`` -> flax params tree.

    ``conv_shape_after`` is (C, H', W') of the conv stack output (for the
    dense flatten permutation), e.g. (128, 8, 100) for 64x800 inputs with
    filters [32, 64, 128].
    """
    params: Dict[str, Any] = {"encoder": {}, "decoder": {"cell": {}}}
    cell = params["decoder"]["cell"]
    cell["lstm"] = {}
    conv_idx = {}
    unmatched: List[str] = []
    for key, value in state_dict.items():
        m = re.match(r"encoder\.cnn_layers\.(\d+)\.(weight|bias)$", key)
        if m:
            layer, part = int(m.group(1)), m.group(2)
            # torch Sequential: Conv2d at 0, 3, 6, ... (conv, relu, pool)
            i = layer // 3
            conv_idx.setdefault(i, {})
            if part == "weight":
                conv_idx[i]["kernel"] = np.transpose(_t(value), (2, 3, 1, 0))  # OIHW->HWIO
            else:
                conv_idx[i]["bias"] = _t(value)
            continue
        if key == "encoder.embedding_layer.weight":
            w = _t(value).T  # (in, out)
            c, h, ww = conv_shape_after
            perm = flatten_permutation(c, h, ww)
            params["encoder"]["Dense_0"] = params["encoder"].get("Dense_0", {})
            params["encoder"]["Dense_0"]["kernel"] = w[perm]
            continue
        if key == "encoder.embedding_layer.bias":
            params["encoder"].setdefault("Dense_0", {})["bias"] = _t(value)
            continue
        if _convert_decoder_key(key, value, cell):
            continue
        unmatched.append(key)
    _warn_unmatched(unmatched, "cnn_lstm")
    for i, tree in conv_idx.items():
        params["encoder"][f"Conv_{i}"] = tree
    return params


# nn.Sequential(list(backbone.children())[:-1]) renames torchvision modules
# to indices (reference encoder.py:199-200): 0=conv1, 1=bn1, 2=relu,
# 3=maxpool, 4..7=layer1..4, 8=avgpool (only parameterized ones listed).
_SEQ_TO_TORCHVISION = {0: "conv1", 1: "bn1", 4: "layer1", 5: "layer2", 6: "layer3", 7: "layer4"}


def convert_resnet_lstm_state_dict(
    state_dict: Dict[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference resnet_lstm ``model_state_dict`` -> (flax params tree,
    batch_stats tree).

    The backbone keys are ``encoder.resnet.<seq_idx>.<torchvision tail>``;
    they are renamed back to torchvision form and mapped through the tested
    backbone converter (:mod:`img2latex_tpu.models.pretrained`).  The head
    (``encoder.embedding_layer``: Linear(512|2048 -> E) after avgpool+flatten,
    reference ``encoder.py:225-228``) transposes directly — torch's flatten
    of (F, 1, 1) is the identity, so no layout permutation is needed.  The
    decoder maps exactly like cnn_lstm."""
    from img2latex_tpu.models.pretrained import convert_state_dict, unflatten

    params: Dict[str, Any] = {"encoder": {}, "decoder": {"cell": {}}}
    cell = params["decoder"]["cell"]
    cell["lstm"] = {}
    backbone_sd: Dict[str, Any] = {}
    unmatched: List[str] = []
    for key, value in state_dict.items():
        m = re.match(r"encoder\.resnet\.(\d+)\.(.+)$", key)
        if m:
            idx, tail = int(m.group(1)), m.group(2)
            name = _SEQ_TO_TORCHVISION.get(idx)
            if name is not None:  # relu/maxpool/avgpool carry no params
                backbone_sd[f"{name}.{tail}"] = value
            continue
        if key == "encoder.embedding_layer.weight":
            params["encoder"].setdefault("Dense_0", {})["kernel"] = _t(value).T
            continue
        if key == "encoder.embedding_layer.bias":
            params["encoder"].setdefault("Dense_0", {})["bias"] = _t(value)
            continue
        if _convert_decoder_key(key, value, cell):
            continue
        unmatched.append(key)
    _warn_unmatched(unmatched, "resnet_lstm")
    bb_params, bb_stats = unflatten(convert_state_dict(backbone_sd))
    params["encoder"]["backbone"] = bb_params
    batch_stats = {"encoder": {"backbone": bb_stats}} if bb_stats else {}
    return params, batch_stats


def convert_reference_checkpoint(ckpt: Dict[str, Any]) -> Tuple[Dict[str, Any], Dict[str, Any], Dict[str, Any]]:
    """Full reference checkpoint dict -> (variables, config_dict,
    tokenizer_config), where ``variables = {"params": ..., "batch_stats":
    ...}`` (batch_stats populated for resnet_lstm's BatchNorm running
    stats, empty for cnn_lstm).  Supports both reference model families
    (``model/encoder.py:16-129`` and ``132-249``)."""
    cfg = ckpt.get("config", {})
    model_name = cfg.get("model", {}).get("name", "cnn_lstm")
    if model_name == "resnet_lstm":
        params, batch_stats = convert_resnet_lstm_state_dict(ckpt["model_state_dict"])
        return (
            {"params": params, "batch_stats": batch_stats},
            cfg,
            ckpt.get("tokenizer_config", {}),
        )
    if model_name != "cnn_lstm":
        raise NotImplementedError(f"unknown reference model type {model_name!r}")
    enc = cfg.get("model", {}).get("encoder", {}).get("cnn", {})
    h = enc.get("img_height", 64)
    w = enc.get("img_width", 800)
    filters = enc.get("conv_filters", [32, 64, 128])
    pool = enc.get("pool_size", 2)
    hh, ww = h, w
    for _ in filters:
        hh //= pool
        ww //= pool
    params = convert_cnn_lstm_state_dict(
        ckpt["model_state_dict"], (filters[-1], hh, ww)
    )
    return {"params": params, "batch_stats": {}}, cfg, ckpt.get("tokenizer_config", {})
