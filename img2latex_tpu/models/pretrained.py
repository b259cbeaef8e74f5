"""Pretrained torchvision ResNet weights: key mapping, conversion, loading.

Core of ``scripts/convert_torchvision_resnet.py`` (see that file's docstring
for the offline conversion workflow; reference loads IMAGENET1K_V1 backbones
at ``img2latex/model/encoder.py:184-199``).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

# torch key -> (flax path, kind); kind in {conv, scale, bias, mean, var}
_BN_PARTS = {"weight": "scale", "bias": "bias", "running_mean": "mean", "running_var": "var"}


def map_torch_key(key: str) -> Tuple[str, str] | None:
    """Map one torchvision state-dict key to (flax_path, kind); None = skip."""
    if key.endswith("num_batches_tracked") or key.startswith("fc."):
        return None
    # stem
    if key == "conv1.weight":
        return "conv1/kernel", "conv"
    m = re.match(r"bn1\.(\w+)$", key)
    if m and m.group(1) in _BN_PARTS:
        return f"bn1/{_BN_PARTS[m.group(1)]}", _BN_PARTS[m.group(1)]
    # blocks: layer{S}.{B}.conv{N}.weight / bn{N}.* / downsample.{0,1}.*
    m = re.match(r"layer(\d)\.(\d+)\.conv(\d)\.weight$", key)
    if m:
        s, b, n = m.groups()
        return f"layer{s}_{b}/conv{n}/kernel", "conv"
    m = re.match(r"layer(\d)\.(\d+)\.bn(\d)\.(\w+)$", key)
    if m and m.group(4) in _BN_PARTS:
        s, b, n, part = m.groups()
        return f"layer{s}_{b}/bn{n}/{_BN_PARTS[part]}", _BN_PARTS[part]
    m = re.match(r"layer(\d)\.(\d+)\.downsample\.0\.weight$", key)
    if m:
        s, b = m.groups()
        return f"layer{s}_{b}/downsample_conv/kernel", "conv"
    m = re.match(r"layer(\d)\.(\d+)\.downsample\.1\.(\w+)$", key)
    if m and m.group(3) in _BN_PARTS:
        s, b, part = m.groups()
        return f"layer{s}_{b}/downsample_bn/{_BN_PARTS[part]}", _BN_PARTS[part]
    return None


def convert_state_dict(state_dict: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """torch state dict -> flat {path: array} with flax layouts."""
    out: Dict[str, np.ndarray] = {}
    for key, value in state_dict.items():
        mapped = map_torch_key(key)
        if mapped is None:
            continue
        path, kind = mapped
        arr = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach") else value)
        if kind == "conv":
            arr = np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
        out[path] = arr.astype(np.float32)
    return out


def unflatten(flat: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """Split into (params, batch_stats) nested trees for the backbone."""
    params: Dict = {}
    stats: Dict = {}
    for path, arr in flat.items():
        parts = path.split("/")
        leaf = parts[-1]
        target = stats if leaf in ("mean", "var") else params
        node = target
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[leaf] = arr
    return params, stats


def load_converted_resnet(variables: Dict, npz_path: str, backbone_scope=("encoder", "backbone")) -> Dict:
    """Merge a converted .npz into a freshly-initialized variables dict.

    Shapes are checked; a mismatch names the offending path.
    """
    import jax

    flat = dict(np.load(npz_path))
    params_tree, stats_tree = unflatten(flat)

    def merge(dst, src, scope):
        for k, v in src.items():
            if isinstance(v, dict):
                if k not in dst:
                    raise KeyError(f"{'/'.join(scope + (k,))} not in model tree")
                merge(dst[k], v, scope + (k,))
            else:
                if k not in dst:
                    raise KeyError(f"{'/'.join(scope + (k,))} not in model tree")
                if tuple(dst[k].shape) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch at {'/'.join(scope + (k,))}: "
                        f"model {tuple(dst[k].shape)} vs checkpoint {tuple(v.shape)}"
                    )
                dst[k] = jax.numpy.asarray(v, dst[k].dtype)

    variables = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy
    node_p = variables["params"]
    node_s = variables.get("batch_stats", {})
    for s in backbone_scope:
        node_p = node_p[s]
        node_s = node_s[s] if node_s else node_s
    merge(node_p, params_tree, backbone_scope)
    if node_s:
        merge(node_s, stats_tree, backbone_scope)
    return variables


