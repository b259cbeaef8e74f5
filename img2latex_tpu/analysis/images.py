"""Dataset image analysis: size/aspect/pixel statistics + figures.

Capability parity with reference ``img2latex/analysis/images.py:33-546``:
sample N images from a split, collect width/height/aspect/color-mode/pixel
stats with normalization detection, emit an image-grid figure, size- and
pixel-distribution figures, and a stats JSON.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import numpy as np
from PIL import Image

from img2latex_tpu.analysis.utils import ensure_output_dir, save_json_file
from img2latex_tpu.utils.logging import get_logger
from img2latex_tpu.utils.visualization import apply_dark_theme

logger = get_logger(__name__)


def analyze_images(
    data_dir: str,
    split_file: str,
    img_dir: str = "img",
    num_samples: int = 1000,
    seed: int = 0,
) -> Dict[str, Any]:
    split_path = os.path.join(data_dir, split_file)
    with open(split_path) as f:
        names = [line.split()[0] for line in f if line.strip()]
    rng = np.random.default_rng(seed)
    if len(names) > num_samples:
        names = list(rng.choice(names, size=num_samples, replace=False))
    widths, heights, aspects, modes = [], [], [], {}
    pixel_means, pixel_stds = [], []
    missing = 0
    for name in names:
        path = os.path.join(data_dir, img_dir, name)
        if not os.path.exists(path):
            missing += 1
            continue
        with Image.open(path) as img:
            w, h = img.size
            widths.append(w)
            heights.append(h)
            aspects.append(w / h if h else 0)
            modes[img.mode] = modes.get(img.mode, 0) + 1
            arr = np.asarray(img.convert("L"), dtype=np.float32) / 255.0
            pixel_means.append(float(arr.mean()))
            pixel_stds.append(float(arr.std()))
    if not widths:
        return {"num_analyzed": 0, "missing": missing}
    mean_px = float(np.mean(pixel_means))
    stats = {
        "num_analyzed": len(widths),
        "missing": missing,
        "width": {"mean": float(np.mean(widths)), "min": int(min(widths)), "max": int(max(widths)),
                  "p50": float(np.median(widths)), "p95": float(np.percentile(widths, 95))},
        "height": {"mean": float(np.mean(heights)), "min": int(min(heights)), "max": int(max(heights)),
                   "p50": float(np.median(heights)), "p95": float(np.percentile(heights, 95))},
        "aspect_ratio": {"mean": float(np.mean(aspects)), "p50": float(np.median(aspects))},
        "color_modes": modes,
        "pixels": {
            "mean": mean_px,
            "std": float(np.mean(pixel_stds)),
            # normalization detection (reference images.py): mostly-white
            # backgrounds read as mean near 1.0 in [0,1]
            "likely_range": "[0,1] white-background" if mean_px > 0.5 else "dark-background",
        },
    }
    return stats


def create_image_grid(
    data_dir: str, split_file: str, out_path: str, img_dir: str = "img",
    rows: int = 4, cols: int = 2, seed: int = 0,
) -> Optional[str]:
    import matplotlib.pyplot as plt

    apply_dark_theme()
    split_path = os.path.join(data_dir, split_file)
    with open(split_path) as f:
        names = [line.split()[0] for line in f if line.strip()]
    rng = np.random.default_rng(seed)
    rng.shuffle(names)
    fig, axes = plt.subplots(rows, cols, figsize=(14, 2 * rows))
    shown = 0
    for ax in np.ravel(axes):
        ax.axis("off")
        while names:
            name = names.pop()
            path = os.path.join(data_dir, img_dir, name)
            if os.path.exists(path):
                ax.imshow(Image.open(path).convert("L"), cmap="gray")
                ax.set_title(name, fontsize=7)
                shown += 1
                break
    if shown == 0:
        plt.close(fig)
        return None
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def visualize_distributions(stats_samples: Dict[str, List[float]], out_dir: str) -> List[str]:
    """Size + pixel distribution figures from raw sample lists."""
    import matplotlib.pyplot as plt

    apply_dark_theme()
    paths = []
    if stats_samples.get("widths"):
        fig, axes = plt.subplots(1, 2, figsize=(12, 4))
        axes[0].hist(stats_samples["widths"], bins=40)
        axes[0].set_title("Image widths")
        axes[1].hist(stats_samples["heights"], bins=40)
        axes[1].set_title("Image heights")
        p = os.path.join(out_dir, "size_distribution.png")
        fig.tight_layout(); fig.savefig(p, dpi=120); plt.close(fig)
        paths.append(p)
    if stats_samples.get("pixel_means"):
        fig, ax = plt.subplots(figsize=(8, 4))
        ax.hist(stats_samples["pixel_means"], bins=40)
        ax.set_title("Per-image mean pixel value ([0,1])")
        p = os.path.join(out_dir, "pixel_distribution.png")
        fig.tight_layout(); fig.savefig(p, dpi=120); plt.close(fig)
        paths.append(p)
    return paths


def analyze_images_cmd(args) -> int:
    from img2latex_tpu.config import load_config

    cfg = load_config(args.config, {"data.data_dir": args.data_dir} if args.data_dir else {})
    split_file = {
        "train": cfg.data.train_file,
        "validate": cfg.data.validate_file,
        "test": cfg.data.test_file,
    }[args.split]
    out_dir = ensure_output_dir(args.output_dir)
    n = args.num_samples or cfg.analysis.image_stats_samples
    stats = analyze_images(cfg.data.data_dir, split_file, cfg.data.img_dir, num_samples=n)
    save_json_file(stats, os.path.join(out_dir, "image_stats.json"))
    grid = create_image_grid(
        cfg.data.data_dir, split_file, os.path.join(out_dir, "image_grid.png"), cfg.data.img_dir
    )
    logger.info("Image stats: %s", {k: stats[k] for k in ("num_analyzed", "missing") if k in stats})
    print(f"Wrote {out_dir}/image_stats.json" + (f" and {grid}" if grid else ""))
    return 0
