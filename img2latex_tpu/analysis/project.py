"""Project health checks: config validation, missing files, sweep summary.

Capability parity with reference ``img2latex/analysis/project.py:59-764``:
schema validation per model type, dataset-file existence checks, model
consistency lint, hyperparameter-sweep summary over ``outputs/*/metrics.json``
(CSV + comparison chart), and a pip-freeze environment snapshot.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from typing import Any, Dict, List

from img2latex_tpu.analysis.utils import ensure_output_dir, save_csv_file, save_json_file
from img2latex_tpu.config import Config, load_config, validate_config
from img2latex_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def validate_config_report(cfg: Config) -> Dict[str, Any]:
    issues: List[str] = []
    try:
        validate_config(cfg)
    except ValueError as e:
        issues.append(str(e))
    # Cross-field consistency lint (reference project.py:412-514).
    if cfg.model.name == "resnet_lstm" and cfg.model.encoder.resnet.channels != 3:
        issues.append("resnet encoder expects channels=3")
    if cfg.model.name == "cnn_lstm" and cfg.model.encoder.cnn.channels not in (1, 3):
        issues.append("cnn encoder channels must be 1 or 3")
    if cfg.inference.max_length > cfg.data.max_seq_length:
        issues.append(
            f"inference.max_length ({cfg.inference.max_length}) exceeds "
            f"data.max_seq_length ({cfg.data.max_seq_length})"
        )
    if cfg.inference.top_p < 0 or cfg.inference.top_p > 1:
        issues.append("inference.top_p must be in [0,1]")
    return {"valid": not issues, "issues": issues}


def check_missing_files(cfg: Config) -> Dict[str, Any]:
    d = cfg.data
    required = [
        os.path.join(d.data_dir, d.train_file),
        os.path.join(d.data_dir, d.validate_file),
        os.path.join(d.data_dir, d.test_file),
        os.path.join(d.data_dir, d.formulas_file),
        os.path.join(d.data_dir, d.img_dir),
    ]
    missing = [p for p in required if not os.path.exists(p)]
    return {"all_present": not missing, "missing": missing}


def summarize_hyperparameter_sweep(outputs_dir: str, out_dir: str) -> List[Dict[str, Any]]:
    """Scan outputs/*/metrics/metrics.json; summarize best metrics per
    experiment into CSV + a comparison bar chart (reference
    ``project.py:296-390,517-563``)."""
    rows: List[Dict[str, Any]] = []
    if not os.path.isdir(outputs_dir):
        return rows
    for name in sorted(os.listdir(outputs_dir)):
        mfile = os.path.join(outputs_dir, name, "metrics", "metrics.json")
        if not os.path.exists(mfile):
            continue
        try:
            steps = json.load(open(mfile)).get("steps", {})
        except json.JSONDecodeError:
            continue
        if not steps:
            continue
        best_loss = min(
            (m.get("val_loss") for m in steps.values() if m.get("val_loss") is not None),
            default=None,
        )
        best_bleu = max(
            (m.get("val_bleu") for m in steps.values() if m.get("val_bleu") is not None),
            default=None,
        )
        best_acc = max(
            (m.get("val_accuracy") for m in steps.values() if m.get("val_accuracy") is not None),
            default=None,
        )
        rows.append(
            {
                "experiment": name,
                "epochs": len(steps),
                "best_val_loss": best_loss,
                "best_val_bleu": best_bleu,
                "best_val_accuracy": best_acc,
            }
        )
    if rows:
        save_csv_file(rows, os.path.join(out_dir, "sweep_summary.csv"))
        try:
            import matplotlib.pyplot as plt

            from img2latex_tpu.utils.visualization import apply_dark_theme

            apply_dark_theme()
            labeled = [r for r in rows if r["best_val_accuracy"] is not None]
            if labeled:
                fig, ax = plt.subplots(figsize=(10, 5))
                ax.bar([r["experiment"] for r in labeled], [r["best_val_accuracy"] for r in labeled])
                ax.set_ylabel("best val accuracy")
                ax.tick_params(axis="x", rotation=45)
                fig.tight_layout()
                fig.savefig(os.path.join(out_dir, "sweep_comparison.png"), dpi=120)
                plt.close(fig)
        except Exception as e:  # plotting is best-effort
            logger.warning("sweep chart failed: %s", e)
    return rows


def snapshot_environment(out_dir: str) -> str:
    """pip-freeze snapshot (reference ``project.py:393-409``)."""
    path = os.path.join(ensure_output_dir(out_dir), "environment.txt")
    try:
        out = subprocess.run(
            [sys.executable, "-m", "pip", "freeze"], capture_output=True, text=True, timeout=120
        ).stdout
    except Exception as e:
        out = f"pip freeze failed: {e}\n"
    with open(path, "w") as f:
        f.write(out)
    return path


def analyze_project_cmd(args) -> int:
    cfg = load_config(args.config, {"data.data_dir": args.data_dir} if args.data_dir else {})
    out_dir = ensure_output_dir(args.output_dir)
    report: Dict[str, Any] = {}
    if args.check in ("all", "config", "consistency"):
        report["config"] = validate_config_report(cfg)
    if args.check in ("all", "files"):
        report["files"] = check_missing_files(cfg)
    if args.check in ("all", "sweep"):
        report["sweep"] = summarize_hyperparameter_sweep("outputs", out_dir)
    if args.check in ("all", "env"):
        report["environment_snapshot"] = snapshot_environment(out_dir)
    save_json_file(report, os.path.join(out_dir, "project_report.json"))
    print(json.dumps(report, indent=2, default=str))
    ok = report.get("config", {}).get("valid", True) and report.get("files", {}).get(
        "all_present", True
    )
    return 0 if ok else 1
