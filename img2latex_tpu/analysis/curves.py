"""Learning-curve plots from metrics artifacts.

Capability parity with reference ``img2latex/analysis/curves.py:32-300``:
loads metrics from CSV or any of the three JSON shapes the reference supports
(``{"steps": {...}}``, a list of per-epoch dicts, or a flat metric->list
dict), then writes one PNG learning curve per metric with optional EWM
smoothing.
"""

from __future__ import annotations

import os
from typing import Optional

import pandas as pd

from img2latex_tpu.analysis.utils import ensure_output_dir, load_json_file
from img2latex_tpu.utils.logging import get_logger
from img2latex_tpu.utils.visualization import apply_dark_theme

logger = get_logger(__name__)


def load_metrics_data(path: str) -> pd.DataFrame:
    """CSV or JSON (3 shapes, reference ``curves.py:53-106``) -> DataFrame
    indexed by step/epoch."""
    if path.endswith(".csv"):
        df = pd.read_csv(path)
    else:
        data = load_json_file(path)
        if isinstance(data, dict) and "steps" in data:
            rows = []
            for step, metrics in data["steps"].items():
                row = {"step": int(step)}
                row.update({k: v for k, v in metrics.items() if isinstance(v, (int, float))})
                rows.append(row)
            df = pd.DataFrame(sorted(rows, key=lambda r: r["step"]))
        elif isinstance(data, list):
            df = pd.DataFrame(data)
        elif isinstance(data, dict):
            df = pd.DataFrame({k: v for k, v in data.items() if isinstance(v, list)})
            df["step"] = range(1, len(df) + 1)
        else:
            raise ValueError(f"Unrecognized metrics shape in {path}")
    if "step" not in df.columns:
        if "epoch" in df.columns:
            df = df.rename(columns={"epoch": "step"})
        else:
            df["step"] = range(1, len(df) + 1)
    return df


def plot_learning_curves(
    df: pd.DataFrame, out_dir: str, smoothing: float = 0.0, experiment: str = ""
) -> list:
    import matplotlib.pyplot as plt

    apply_dark_theme()
    ensure_output_dir(out_dir)
    written = []
    numeric = [c for c in df.columns if c != "step" and pd.api.types.is_numeric_dtype(df[c])]
    for col in numeric:
        series = df[col].dropna()
        if series.empty:
            continue
        fig, ax = plt.subplots(figsize=(10, 6))
        x = df.loc[series.index, "step"]
        ax.plot(x, series, alpha=0.45 if smoothing else 1.0, label=col)
        if smoothing and 0 < smoothing < 1:
            ax.plot(x, series.ewm(alpha=1 - smoothing).mean(), label=f"{col} (smoothed)")
        ax.set_xlabel("epoch")
        ax.set_ylabel(col)
        ax.set_title(f"{experiment} {col}".strip())
        ax.legend()
        p = os.path.join(out_dir, f"curve_{col}.png")
        fig.tight_layout()
        fig.savefig(p, dpi=120)
        plt.close(fig)
        written.append(p)
    # Paired train/val loss overview when both exist.
    if {"train_loss", "val_loss"} <= set(df.columns):
        fig, ax = plt.subplots(figsize=(10, 6))
        ax.plot(df["step"], df["train_loss"], label="train")
        ax.plot(df["step"], df["val_loss"], label="validation")
        ax.set_xlabel("epoch")
        ax.set_ylabel("loss")
        ax.set_title(f"{experiment} loss".strip())
        ax.legend()
        p = os.path.join(out_dir, "curve_loss_overview.png")
        fig.tight_layout()
        fig.savefig(p, dpi=120)
        plt.close(fig)
        written.append(p)
    return written


def plot_curves_cmd(args) -> int:
    from img2latex_tpu.config import load_config
    from img2latex_tpu.utils.paths import PathManager

    cfg = load_config(args.config)
    paths = PathManager()
    mfile = args.metrics_file or str(
        paths.experiment_dir(args.experiment) / "metrics" / "metrics.json"
    )
    if not os.path.exists(mfile):
        print(f"No metrics file at {mfile}", file=__import__("sys").stderr)
        return 1
    out_dir = args.output_dir or str(paths.get_dir(args.experiment, "plots"))
    smoothing = args.smoothing if args.smoothing is not None else cfg.analysis.curve_smoothing
    df = load_metrics_data(mfile)
    written = plot_learning_curves(df, out_dir, smoothing, args.experiment)
    print(f"Wrote {len(written)} curve plots to {out_dir}")
    return 0
