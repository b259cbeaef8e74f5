"""Metrics viewer: enhanced-metrics series printers + trend plots.

Capability parity with reference ``img2latex/utils/visualize_metrics.py:22-286``:
loads an experiment's ``*_enhanced_metrics_epoch_*.json`` series, prints
sample predictions + token-distribution tables (rich console), and plots
diversity/repetition trends; wired to the ``visualize`` CLI command.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

from img2latex_tpu.analysis.metrics import load_experiment_metrics, print_metrics_table
from img2latex_tpu.utils.logging import get_logger
from img2latex_tpu.utils.paths import PathManager
from img2latex_tpu.utils.visualization import apply_dark_theme

logger = get_logger(__name__)


def print_prediction_samples(series: List[Dict[str, Any]], max_samples: int = 3) -> None:
    if not series:
        return
    latest = series[-1]
    samples = latest.get("samples", {}).get("samples", [])[:max_samples]
    if not samples:
        return
    try:
        from rich.console import Console
        from rich.panel import Panel

        console = Console()
        for i, s in enumerate(samples):
            body = f"[green]target[/green]: {s['target'][:160]}\n" \
                   f"[cyan]pred  [/cyan]: {s['prediction'][:160]}"
            low = s.get("low_confidence_tokens") or []
            if low:
                body += "\n[yellow]low-confidence[/yellow]: " + ", ".join(
                    f"{t}({c:.2f})" for t, c in low[:8]
                )
            console.print(Panel(body, title=f"sample {i} @ epoch {latest['_epoch']}"))
    except ImportError:  # pragma: no cover
        for s in samples:
            print("target:", s["target"][:160])
            print("pred  :", s["prediction"][:160])


def print_token_distribution(series: List[Dict[str, Any]]) -> None:
    if not series:
        return
    dist = series[-1].get("token_distribution", {})
    try:
        from rich.console import Console
        from rich.table import Table

        table = Table(title=f"token distribution @ epoch {series[-1]['_epoch']}")
        table.add_column("prediction top tokens")
        table.add_column("target top tokens")
        pt = dist.get("predictions", {}).get("top_tokens", [])
        tt = dist.get("targets", {}).get("top_tokens", [])
        for i in range(max(len(pt), len(tt))):
            p = f"{pt[i][0]} ({pt[i][1]})" if i < len(pt) else ""
            t = f"{tt[i][0]} ({tt[i][1]})" if i < len(tt) else ""
            table.add_row(p, t)
        Console().print(table)
        preds = dist.get("predictions", {})
        Console().print(
            f"entropy {preds.get('entropy', 0):.3f}  diversity {preds.get('diversity', 0):.3f}  "
            f"repetition {preds.get('repetition_factor', 0):.3f}"
        )
    except ImportError:  # pragma: no cover
        print(dist)


def plot_metrics_over_time(series: List[Dict[str, Any]], out_dir: str) -> List[str]:
    import matplotlib.pyplot as plt

    apply_dark_theme()
    if not series:
        return []
    os.makedirs(out_dir, exist_ok=True)
    epochs = [d["_epoch"] for d in series]
    rows = {
        "accuracy": [d.get("accuracy") for d in series],
        "bleu": [d.get("bleu") for d in series],
        "levenshtein": [d.get("levenshtein") for d in series],
        "diversity": [
            d.get("token_distribution", {}).get("predictions", {}).get("diversity")
            for d in series
        ],
        "repetition": [
            d.get("token_distribution", {}).get("predictions", {}).get("repetition_factor")
            for d in series
        ],
    }
    written = []
    fig, ax = plt.subplots(figsize=(10, 6))
    for name, vals in rows.items():
        if any(v is not None for v in vals):
            ax.plot(epochs, [v if v is not None else float("nan") for v in vals], label=name,
                    marker="o", markersize=3)
    ax.set_xlabel("epoch")
    ax.legend()
    p = os.path.join(out_dir, "enhanced_metrics_trends.png")
    fig.tight_layout()
    fig.savefig(p, dpi=130)
    plt.close(fig)
    written.append(p)
    return written


def visualize_experiment_metrics(
    experiment: Optional[str],
    output_dir: Optional[str] = None,
    metric: Optional[str] = None,
    show_samples: bool = True,
) -> int:
    paths = PathManager(output_dir)
    if experiment is None:
        from img2latex_tpu.utils.registry import ExperimentRegistry

        exps = ExperimentRegistry(paths).list_experiments()
        if not exps:
            print("No experiments found.")
            return 1
        experiment = exps[0]["name"]
        print(f"Using most recent experiment: {experiment}")
    mdir = str(paths.get_dir(experiment, "metrics"))
    series = load_experiment_metrics(mdir)
    if not series:
        print(f"No enhanced metrics under {mdir}")
        return 1
    print_metrics_table(series, f"{experiment} metrics")
    if show_samples:
        print_prediction_samples(series)
        print_token_distribution(series)
    plots = plot_metrics_over_time(series, str(paths.get_dir(experiment, "plots")))
    if plots:
        print(f"Wrote {plots[0]}")
    return 0
