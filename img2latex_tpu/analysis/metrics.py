"""Enhanced-metrics browser: tables, latest summary, comparison, export.

Capability parity with reference ``img2latex/analysis/metrics.py:30-313``:
loads ``<exp>_enhanced_metrics_epoch_*.json`` series from an experiment's
metrics dir, renders rich tables, shows the latest snapshot, ranks
experiments on a chosen metric, and exports CSV/JSON.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Dict, List, Optional

from img2latex_tpu.analysis.utils import save_csv_file, save_json_file
from img2latex_tpu.utils.logging import get_logger
from img2latex_tpu.utils.paths import PathManager

logger = get_logger(__name__)

_EPOCH_RE = re.compile(r"_enhanced_metrics_epoch_(\d+)\.json$")


def load_experiment_metrics(metrics_dir: str) -> List[Dict[str, Any]]:
    """All enhanced-metrics files in epoch order."""
    out = []
    for path in glob.glob(os.path.join(metrics_dir, "*_enhanced_metrics_epoch_*.json")):
        m = _EPOCH_RE.search(path)
        if not m:
            continue
        try:
            data = json.load(open(path))
        except json.JSONDecodeError:
            continue
        data["_epoch"] = int(m.group(1))
        data["_path"] = path
        out.append(data)
    return sorted(out, key=lambda d: d["_epoch"])


def _series_rows(series: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
    rows = []
    for d in series:
        rows.append(
            {
                "epoch": d["_epoch"],
                "accuracy": d.get("accuracy"),
                "bleu": d.get("bleu"),
                "levenshtein": d.get("levenshtein"),
                "num_tokens": d.get("num_tokens"),
                "diversity": d.get("token_distribution", {})
                .get("predictions", {})
                .get("diversity"),
                "repetition": d.get("token_distribution", {})
                .get("predictions", {})
                .get("repetition_factor"),
            }
        )
    return rows


def print_metrics_table(series: List[Dict[str, Any]], title: str) -> None:
    try:
        from rich.console import Console
        from rich.table import Table

        table = Table(title=title)
        for col in ("epoch", "accuracy", "bleu", "levenshtein", "diversity", "repetition"):
            table.add_column(col)
        for row in _series_rows(series):
            table.add_row(
                *[
                    f"{row[c]:.4f}" if isinstance(row[c], float) else str(row[c])
                    for c in ("epoch", "accuracy", "bleu", "levenshtein", "diversity", "repetition")
                ]
            )
        Console().print(table)
    except ImportError:  # pragma: no cover
        for row in _series_rows(series):
            print(row)


def show_latest(series: List[Dict[str, Any]]) -> None:
    if not series:
        print("No enhanced metrics found.")
        return
    latest = series[-1]
    print(f"epoch {latest['_epoch']}:")
    for k in ("accuracy", "bleu", "levenshtein", "num_tokens"):
        if k in latest:
            v = latest[k]
            print(f"  {k}: {v:.4f}" if isinstance(v, float) else f"  {k}: {v}")
    samples = latest.get("samples", {}).get("samples", [])
    for s in samples[:2]:
        print(f"  pred: {s['prediction'][:100]}")
        print(f"  tgt : {s['target'][:100]}")


def compare_experiments_table(
    experiments: List[str], metric: str, paths: PathManager
) -> List[Dict[str, Any]]:
    rows = []
    for exp in experiments:
        series = load_experiment_metrics(str(paths.get_dir(exp, "metrics")))
        best = None
        best_epoch = None
        for d in series:
            v = d.get(metric)
            if v is not None and (best is None or v > best):
                best, best_epoch = v, d["_epoch"]
        rows.append({"experiment": exp, f"best_{metric}": best, "epoch": best_epoch,
                     "num_epochs": len(series)})
    rows.sort(key=lambda r: (r[f"best_{metric}"] is None, -(r[f"best_{metric}"] or 0)))
    return rows


def metrics_cmd(args) -> int:
    paths = PathManager(args.output_dir)
    action = args.action
    if action == "compare":
        exps = args.experiments or [r["name"] for r in __registry_names(paths)]
        rows = compare_experiments_table(exps, args.metric, paths)
        for r in rows:
            print(r)
        return 0
    if not args.experiment:
        raise SystemExit("--experiment is required for this action")
    mdir = str(paths.get_dir(args.experiment, "metrics"))
    series = load_experiment_metrics(mdir)
    if action == "visualize":
        print_metrics_table(series, f"{args.experiment} enhanced metrics")
        return 0
    if action == "latest":
        show_latest(series)
        return 0
    if action == "export":
        rows = _series_rows(series)
        out_dir = args.output_dir or mdir
        if args.format == "csv":
            out = os.path.join(out_dir, f"{args.experiment}_metrics_export.csv")
            save_csv_file(rows, out)
        else:
            out = os.path.join(out_dir, f"{args.experiment}_metrics_export.json")
            save_json_file(rows, out)
        print(f"Wrote {out}")
        return 0
    raise SystemExit(f"Unknown action {action}")


def __registry_names(paths: PathManager) -> List[Dict[str, Any]]:
    from img2latex_tpu.utils.registry import ExperimentRegistry

    return ExperimentRegistry(paths).list_experiments()
