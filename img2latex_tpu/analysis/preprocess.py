"""Preprocessing visualization: CNN vs ResNet pipelines side by side.

Capability parity with reference ``img2latex/analysis/preprocess.py:35-454``:
original -> aspect-resize -> pad/crop -> normalize, shown for both the
grayscale CNN path and the RGB ResNet path, with an image-stats caption.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from img2latex_tpu.analysis.utils import ensure_output_dir
from img2latex_tpu.data.transforms import resize_with_aspect_ratio
from img2latex_tpu.utils.logging import get_logger
from img2latex_tpu.utils.visualization import apply_dark_theme

logger = get_logger(__name__)


def create_preprocessing_visualization(
    image_path: str,
    out_path: str,
    cnn_size=(64, 800),
    resnet_size=(64, 800),
    pad_value: int = 255,
) -> str:
    import matplotlib.pyplot as plt

    apply_dark_theme()
    original = Image.open(image_path)
    gray = original.convert("L")
    rgb = original.convert("RGB")
    gray_canvas = resize_with_aspect_ratio(gray, cnn_size[0], cnn_size[1], pad_value)
    rgb_canvas = resize_with_aspect_ratio(rgb, resnet_size[0], resnet_size[1], pad_value)

    g = np.asarray(gray_canvas, dtype=np.float32) / 255.0
    g_norm = g * 2 - 1
    r = np.asarray(rgb_canvas, dtype=np.float32) / 255.0
    mean = np.array([0.485, 0.456, 0.406])
    std = np.array([0.229, 0.224, 0.225])
    r_norm = (r - mean) / std

    fig, axes = plt.subplots(3, 2, figsize=(16, 8))
    axes[0, 0].imshow(gray, cmap="gray")
    axes[0, 0].set_title(f"original L {original.size}")
    axes[0, 1].imshow(rgb)
    axes[0, 1].set_title(f"original RGB {original.size}")
    axes[1, 0].imshow(gray_canvas, cmap="gray")
    axes[1, 0].set_title(f"CNN canvas {cnn_size[1]}x{cnn_size[0]} (pad {pad_value})")
    axes[1, 1].imshow(rgb_canvas)
    axes[1, 1].set_title(f"ResNet canvas {resnet_size[1]}x{resnet_size[0]}")
    axes[2, 0].imshow(g_norm, cmap="gray", vmin=-1, vmax=1)
    axes[2, 0].set_title(f"[-1,1] normalized (mean {g_norm.mean():.3f})")
    # Clip the ImageNet-normalized image back to [0,1] for display.
    axes[2, 1].imshow(np.clip((r_norm * std + mean), 0, 1))
    axes[2, 1].set_title(
        f"ImageNet-normalized (ch means {np.round(r_norm.mean(axis=(0, 1)), 2).tolist()})"
    )
    for ax in np.ravel(axes):
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def visualize_preprocess_cmd(args) -> int:
    from img2latex_tpu.config import load_config

    cfg = load_config(args.config)
    out_dir = ensure_output_dir(args.output_dir)
    cnn = cfg.model.encoder.cnn
    resnet = cfg.model.encoder.resnet
    out = create_preprocessing_visualization(
        args.image,
        os.path.join(out_dir, "preprocessing.png"),
        cnn_size=(cnn.img_height, cnn.img_width),
        resnet_size=(resnet.img_height, resnet.img_width),
        pad_value=cfg.preprocessing.pad_value,
    )
    print(f"Wrote {out}")
    return 0
