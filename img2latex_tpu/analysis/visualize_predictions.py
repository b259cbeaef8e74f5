"""Prediction-vs-reference comparison figures + uniqueness metrics.

Capability parity with reference ``img2latex/analysis/visualize_predictions.py:26-320``.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List

import numpy as np

from img2latex_tpu.analysis.utils import ensure_output_dir, load_predictions_any
from img2latex_tpu.utils.logging import get_logger
from img2latex_tpu.utils.visualization import apply_dark_theme

logger = get_logger(__name__)


def get_sample_predictions(rows: List[Dict[str, str]], n: int, seed: int = 0) -> List[Dict[str, str]]:
    rng = np.random.default_rng(seed)
    if len(rows) <= n:
        return rows
    idx = rng.choice(len(rows), size=n, replace=False)
    return [rows[i] for i in idx]


def render_latex_comparison(samples: List[Dict[str, str]], out_path: str) -> str:
    """Table-style prediction/reference figure (monospace text rendering —
    LaTeX math rendering needs a TeX toolchain that is absent here, as in the
    reference which uses matplotlib text too)."""
    import matplotlib.pyplot as plt

    apply_dark_theme()
    n = len(samples)
    fig, ax = plt.subplots(figsize=(16, 0.9 * n + 1))
    ax.axis("off")
    y = 1.0
    dy = 1.0 / max(n, 1)
    for s in samples:
        match = s["prediction"].strip() == s["reference"].strip()
        color = "#a6e3a1" if match else "#f38ba8"
        ax.text(0.0, y, ("= " if match else "x ") + s["reference"][:110], fontsize=8,
                family="monospace", va="top", color="#cdd6f4")
        ax.text(0.0, y - dy * 0.45, "  " + s["prediction"][:110], fontsize=8,
                family="monospace", va="top", color=color)
        y -= dy
    fig.suptitle("reference (top) vs prediction (bottom)")
    fig.savefig(out_path, dpi=140, bbox_inches="tight")
    plt.close(fig)
    return out_path


def calculate_uniqueness_metrics(rows: List[Dict[str, str]]) -> Dict[str, Any]:
    preds = [r["prediction"] for r in rows]
    refs = [r["reference"] for r in rows]
    exact = sum(p.strip() == r.strip() for p, r in zip(preds, refs))
    return {
        "num_samples": len(rows),
        "exact_match_rate": exact / len(rows) if rows else 0.0,
        "unique_predictions": len(set(preds)) / len(preds) if preds else 0.0,
        "unique_references": len(set(refs)) / len(refs) if refs else 0.0,
        "mean_pred_tokens": float(np.mean([len(p.split()) for p in preds])) if preds else 0.0,
        "mean_ref_tokens": float(np.mean([len(r.split()) for r in refs])) if refs else 0.0,
    }


def create_metrics_figure(metrics: Dict[str, Any], out_path: str) -> str:
    import matplotlib.pyplot as plt

    apply_dark_theme()
    keys = ["exact_match_rate", "unique_predictions", "unique_references"]
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.bar(keys, [metrics[k] for k in keys])
    ax.set_ylim(0, 1)
    for i, k in enumerate(keys):
        ax.text(i, metrics[k] + 0.02, f"{metrics[k]:.2f}", ha="center")
    ax.set_title(
        f"{metrics['num_samples']} samples | mean len pred {metrics['mean_pred_tokens']:.1f} "
        f"vs ref {metrics['mean_ref_tokens']:.1f}"
    )
    fig.tight_layout()
    fig.savefig(out_path, dpi=140)
    plt.close(fig)
    return out_path


def visualize_cmd(args) -> int:
    rows = load_predictions_any(args.predictions_file)
    out_dir = ensure_output_dir(args.output_dir)
    samples = get_sample_predictions(rows, args.num_samples)
    p1 = render_latex_comparison(samples, os.path.join(out_dir, "prediction_comparison.png"))
    metrics = calculate_uniqueness_metrics(rows)
    p2 = create_metrics_figure(metrics, os.path.join(out_dir, "prediction_metrics.png"))
    print(f"Wrote {p1} and {p2}; exact match {metrics['exact_match_rate']:.1%}")
    return 0
