"""Publication report figures from the per-epoch metrics artifact.

Capability parity with reference ``img2latex/analysis/plot_report_figures.py:28-507``:
loss/accuracy curves, BLEU/Levenshtein progression, metric correlation
heatmap, per-epoch radar chart, and a 2x2 composite.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np
import pandas as pd

from img2latex_tpu.analysis.curves import load_metrics_data
from img2latex_tpu.analysis.utils import ensure_output_dir
from img2latex_tpu.utils.logging import get_logger
from img2latex_tpu.utils.visualization import apply_dark_theme

logger = get_logger(__name__)

METRIC_COLS = ["train_loss", "val_loss", "train_accuracy", "val_accuracy", "val_bleu", "val_levenshtein"]


def plot_training_curves(df: pd.DataFrame, out_dir: str) -> List[str]:
    import matplotlib.pyplot as plt

    apply_dark_theme()
    written = []
    pairs = [("train_loss", "val_loss", "loss"), ("train_accuracy", "val_accuracy", "accuracy")]
    for a, b, label in pairs:
        cols = [c for c in (a, b) if c in df.columns]
        if not cols:
            continue
        fig, ax = plt.subplots(figsize=(10, 6))
        for c in cols:
            ax.plot(df["step"], df[c], label=c)
        ax.set_xlabel("epoch")
        ax.set_ylabel(label)
        ax.legend()
        p = os.path.join(out_dir, f"report_{label}.png")
        fig.tight_layout(); fig.savefig(p, dpi=140); plt.close(fig)
        written.append(p)
    return written


def plot_bleu_levenshtein(df: pd.DataFrame, out_dir: str) -> List[str]:
    import matplotlib.pyplot as plt

    apply_dark_theme()
    cols = [c for c in ("val_bleu", "val_levenshtein") if c in df.columns]
    if not cols:
        return []
    fig, ax = plt.subplots(figsize=(10, 6))
    for c in cols:
        ax.plot(df["step"], df[c], label=c, marker="o", markersize=3)
    ax.set_xlabel("epoch")
    ax.set_ylabel("score")
    ax.legend()
    p = os.path.join(out_dir, "report_bleu_levenshtein.png")
    fig.tight_layout(); fig.savefig(p, dpi=140); plt.close(fig)
    return [p]


def plot_metrics_correlation(df: pd.DataFrame, out_dir: str) -> List[str]:
    import matplotlib.pyplot as plt

    apply_dark_theme()
    cols = [c for c in METRIC_COLS if c in df.columns]
    if len(cols) < 2:
        return []
    corr = df[cols].corr()
    fig, ax = plt.subplots(figsize=(8, 6))
    im = ax.imshow(corr.values, cmap="coolwarm", vmin=-1, vmax=1)
    ax.set_xticks(range(len(cols)))
    ax.set_xticklabels(cols, rotation=45, ha="right")
    ax.set_yticks(range(len(cols)))
    ax.set_yticklabels(cols)
    for i in range(len(cols)):
        for j in range(len(cols)):
            ax.text(j, i, f"{corr.values[i, j]:.2f}", ha="center", va="center", fontsize=8)
    fig.colorbar(im)
    p = os.path.join(out_dir, "report_correlation.png")
    fig.tight_layout(); fig.savefig(p, dpi=140); plt.close(fig)
    return [p]


def plot_metrics_radar(df: pd.DataFrame, out_dir: str, epochs: int = 4) -> List[str]:
    import matplotlib.pyplot as plt

    apply_dark_theme()
    cols = [c for c in ("val_accuracy", "val_bleu", "val_levenshtein") if c in df.columns]
    if len(cols) < 3 or df.empty:
        return []
    idx = np.linspace(0, len(df) - 1, min(epochs, len(df))).astype(int)
    angles = np.linspace(0, 2 * np.pi, len(cols), endpoint=False).tolist()
    angles += angles[:1]
    fig, ax = plt.subplots(figsize=(7, 7), subplot_kw={"polar": True})
    maxv = {c: max(df[c].max(), 1e-9) for c in cols}
    for i in idx:
        vals = [df[c].iloc[i] / maxv[c] for c in cols]
        vals += vals[:1]
        ax.plot(angles, vals, label=f"epoch {int(df['step'].iloc[i])}")
        ax.fill(angles, vals, alpha=0.08)
    ax.set_xticks(angles[:-1])
    ax.set_xticklabels(cols)
    ax.legend(loc="lower right", fontsize=8)
    p = os.path.join(out_dir, "report_radar.png")
    fig.tight_layout(); fig.savefig(p, dpi=140); plt.close(fig)
    return [p]


def create_composite_plot(df: pd.DataFrame, out_dir: str, experiment: str) -> List[str]:
    import matplotlib.pyplot as plt

    apply_dark_theme()
    fig, axes = plt.subplots(2, 2, figsize=(14, 9))
    panels = [
        (["train_loss", "val_loss"], "loss"),
        (["train_accuracy", "val_accuracy"], "accuracy"),
        (["val_bleu"], "BLEU-4"),
        (["val_levenshtein"], "Levenshtein similarity"),
    ]
    for ax, (cols, label) in zip(np.ravel(axes), panels):
        plotted = False
        for c in cols:
            if c in df.columns:
                ax.plot(df["step"], df[c], label=c)
                plotted = True
        ax.set_title(label)
        ax.set_xlabel("epoch")
        if plotted:
            ax.legend(fontsize=8)
    fig.suptitle(experiment)
    p = os.path.join(out_dir, "report_composite.png")
    fig.tight_layout(); fig.savefig(p, dpi=140); plt.close(fig)
    return [p]


def generate_cmd(args) -> int:
    from img2latex_tpu.utils.paths import PathManager

    paths = PathManager()
    mfile = str(paths.experiment_dir(args.experiment) / "metrics" / "metrics.json")
    if not os.path.exists(mfile):
        print(f"No metrics file at {mfile}")
        return 1
    out_dir = ensure_output_dir(args.output_dir or str(paths.get_dir(args.experiment, "reports")))
    df = load_metrics_data(mfile)
    written = []
    written += plot_training_curves(df, out_dir)
    written += plot_bleu_levenshtein(df, out_dir)
    written += plot_metrics_correlation(df, out_dir)
    written += plot_metrics_radar(df, out_dir)
    written += create_composite_plot(df, out_dir, args.experiment)
    print(f"Wrote {len(written)} report figures to {out_dir}")
    return 0
