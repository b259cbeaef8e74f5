"""Project health checks: config validation, git diff, missing files, sweeps.

Capability parity with reference ``img2latex/analysis/project.py:59-764``:
schema validation per model type (hard issues + soft warnings, reference
``project.py:412-514``), config-vs-git-HEAD diff (``project.py:231-293``),
dataset-file existence checks, hyperparameter-sweep summary over
``outputs/*/metrics.json`` (CSV + comparison chart), and a pip-freeze
environment snapshot.  Beyond the reference: ``check_checkpoint_consistency``
cross-checks a checkpoint's actual parameter shapes (orbax metadata, no array
reads) against its embedded config/tokenizer and reports drift vs the current
config.
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
    # Cross-field consistency lint: hard errors (reference project.py:412-514).
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
    # Soft warnings: plausible-but-unusual settings the reference lints for
    # (project.py:427-512 — channel/kernel/dropout/lr/weight-decay ranges).
    warnings: List[str] = []
    if cfg.model.name == "cnn_lstm":
        if cfg.model.encoder.cnn.channels != 1:
            warnings.append(
                f"cnn_lstm typically uses grayscale (channels=1); config has "
                f"channels={cfg.model.encoder.cnn.channels}"
            )
        k = cfg.model.encoder.cnn.kernel_size
        if k < 3 or k > 5:
            warnings.append(f"unusual CNN kernel size: {k} (typical 3-5)")
    if cfg.model.name == "resnet_lstm":
        valid = ("resnet18", "resnet34", "resnet50", "resnet101", "resnet152")
        if cfg.model.encoder.resnet.model_name not in valid:
            issues.append(
                f"invalid resnet model_name: {cfg.model.encoder.resnet.model_name} "
                f"(expected one of {list(valid)})"
            )
    if cfg.model.embedding_dim != cfg.model.decoder.hidden_dim:
        warnings.append(
            f"embedding_dim ({cfg.model.embedding_dim}) != decoder hidden_dim "
            f"({cfg.model.decoder.hidden_dim}) — intentional in the small recipes, "
            "but worth confirming"
        )
    dr = cfg.model.decoder.dropout
    if dr < 0 or dr >= 0.5:
        warnings.append(f"unusual dropout: {dr} (typical 0.1-0.3)")
    lr = cfg.training.learning_rate
    if lr > 0.1 or lr < 1e-5:
        warnings.append(f"unusual learning rate: {lr} (typical 1e-5 to 1e-2)")
    if cfg.training.optimizer == "adam" and cfg.training.weight_decay > 0.01:
        warnings.append(
            f"high weight decay ({cfg.training.weight_decay}) for adam; consider reducing"
        )
    return {"valid": not issues, "issues": issues, "warnings": warnings}


def compare_config_with_git(config_path: str) -> Dict[str, Any]:
    """Diff the on-disk config YAML against its last committed version.

    Same contract as reference ``project.py:231-293``: returns
    ``{added, modified, deleted}`` dotted-key lists (modified entries show
    ``old -> new``), or ``{"error": ...}`` when the file is untracked or the
    directory is not a git repository."""
    import yaml

    path = os.path.abspath(config_path)
    workdir = os.path.dirname(path) or "."
    try:
        top = subprocess.run(
            ["git", "-C", workdir, "rev-parse", "--show-toplevel"],
            capture_output=True,
            text=True,
            timeout=30,
        )
        if top.returncode != 0:
            return {"error": f"not inside a git repository: {top.stderr.strip()}"}
        rel = os.path.relpath(path, top.stdout.strip())
        shown = subprocess.run(
            ["git", "-C", workdir, "show", f"HEAD:{rel}"],
            capture_output=True,
            text=True,
            timeout=30,
        )
        if shown.returncode != 0:
            return {"error": f"could not retrieve committed version: {shown.stderr.strip()}"}
        prev = yaml.safe_load(shown.stdout) or {}
        with open(path) as f:
            curr = yaml.safe_load(f) or {}
    except Exception as e:  # git missing, unreadable file, bad YAML
        return {"error": f"config/git comparison failed: {e}"}

    changes: Dict[str, List[str]] = {"added": [], "modified": [], "deleted": []}

    def _walk(p: Dict, c: Dict, prefix: str = "") -> None:
        for key in c:
            dotted = f"{prefix}.{key}" if prefix else str(key)
            if key not in p:
                changes["added"].append(dotted)
            elif isinstance(c[key], dict) and isinstance(p[key], dict):
                _walk(p[key], c[key], dotted)
            elif c[key] != p[key]:
                changes["modified"].append(f"{dotted}: {p[key]} -> {c[key]}")
        for key in p:
            if key not in c:
                changes["deleted"].append(f"{prefix}.{key}" if prefix else str(key))

    _walk(prev, curr)
    return changes


def check_checkpoint_consistency(ckpt_path: str, cfg: Config | None = None) -> Dict[str, Any]:
    """Cross-check a checkpoint's actual parameter shapes against its embedded
    config + tokenizer, and (optionally) against the current on-disk config.

    Deepens the reference's config-only lint (``project.py:412-514``) to what
    it gestures at but never does: checkpoint-vs-config agreement on the
    dimensions that silently break a restore (vocab rows, embedding width,
    LSTM hidden size, layer count, vocab-projection width)."""
    from img2latex_tpu.config import config_from_dict
    from img2latex_tpu.utils import checkpoint as ckpt_lib

    ckpt_dir, step = ckpt_lib.resolve_checkpoint_path(ckpt_path)
    all_shapes, meta = ckpt_lib.param_shapes(ckpt_dir, step=step)
    # Restrict to model params: the Adam opt_state (mu/nu) mirrors the same
    # tree structure and would double every suffix match below.
    shapes = {
        k[len("params/"):]: v for k, v in all_shapes.items() if k.startswith("params/")
    }
    issues: List[str] = []
    report: Dict[str, Any] = {"checkpoint": str(ckpt_dir), "num_params_leaves": len(shapes)}
    if "config" not in meta or "tokenizer_config" not in meta:
        return {
            "checkpoint": str(ckpt_dir),
            "consistent": False,
            "issues": ["checkpoint meta.json lacks config/tokenizer_config"],
        }
    ck_cfg = config_from_dict(meta["config"])
    vocab = len(meta["tokenizer_config"]["token_to_id"])
    report["model"] = ck_cfg.model.name
    report["vocab_size"] = vocab

    def _find(suffix: str) -> Dict[str, tuple]:
        return {k: v for k, v in shapes.items() if k.endswith(suffix)}

    emb = _find("embedding/embedding")
    if emb:
        ek, ev = next(iter(emb.items()))
        if ev[0] != vocab:
            issues.append(f"{ek}: {ev[0]} rows != tokenizer vocab {vocab}")
        if ev[1] != ck_cfg.model.embedding_dim:
            issues.append(f"{ek}: width {ev[1]} != model.embedding_dim {ck_cfg.model.embedding_dim}")
    else:
        issues.append("no token-embedding parameter found in checkpoint")
    whh = {k: v for k, v in shapes.items() if "/W_hh_l" in k or k.startswith("W_hh_l")}
    if whh:
        h = next(iter(whh.values()))[0]
        if h != ck_cfg.model.decoder.hidden_dim:
            issues.append(
                f"LSTM hidden {h} != model.decoder.hidden_dim {ck_cfg.model.decoder.hidden_dim}"
            )
        n_layers = len({k.rsplit("W_hh_l", 1)[1] for k in whh})
        if n_layers != ck_cfg.model.decoder.lstm_layers:
            issues.append(
                f"{n_layers} LSTM layers in checkpoint != model.decoder.lstm_layers "
                f"{ck_cfg.model.decoder.lstm_layers}"
            )
    else:
        issues.append("no LSTM recurrent weights found in checkpoint")
    out = _find("out/kernel")
    for k, v in out.items():
        if v[-1] != vocab:
            issues.append(f"{k}: output width {v[-1]} != tokenizer vocab {vocab}")
    enc_keys = [k for k in shapes if k.startswith("encoder/")]
    has_resnet = any("backbone" in k for k in enc_keys)
    if ck_cfg.model.name == "resnet_lstm" and enc_keys and not has_resnet:
        issues.append("config says resnet_lstm but checkpoint encoder has no ResNet blocks")
    if ck_cfg.model.name == "cnn_lstm" and has_resnet:
        issues.append("config says cnn_lstm but checkpoint encoder contains ResNet blocks")

    if cfg is not None:
        drift: List[str] = []
        pairs = [
            ("model.name", cfg.model.name, ck_cfg.model.name),
            ("model.embedding_dim", cfg.model.embedding_dim, ck_cfg.model.embedding_dim),
            ("model.decoder.hidden_dim", cfg.model.decoder.hidden_dim, ck_cfg.model.decoder.hidden_dim),
            ("model.decoder.lstm_layers", cfg.model.decoder.lstm_layers, ck_cfg.model.decoder.lstm_layers),
            ("model.memory", cfg.model.memory, ck_cfg.model.memory),
            ("data.max_seq_length", cfg.data.max_seq_length, ck_cfg.data.max_seq_length),
        ]
        for key, cur, ck in pairs:
            if cur != ck:
                drift.append(f"{key}: config {cur} vs checkpoint {ck}")
        report["config_drift"] = drift
    report["consistent"] = not issues
    report["issues"] = issues
    return report


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
    if args.check in ("all", "consistency") and getattr(args, "checkpoint", None):
        report["checkpoint_consistency"] = check_checkpoint_consistency(args.checkpoint, cfg)
    if args.check in ("all", "git"):
        if args.config:
            report["git"] = compare_config_with_git(args.config)
        elif args.check == "git":
            report["git"] = {"error": "--check git requires --config pointing at a tracked YAML"}
    if args.check in ("all", "files"):
        report["files"] = check_missing_files(cfg)
    if args.check in ("all", "sweep"):
        report["sweep"] = summarize_hyperparameter_sweep("outputs", out_dir)
    if args.check in ("all", "env"):
        report["environment_snapshot"] = snapshot_environment(out_dir)
    save_json_file(report, os.path.join(out_dir, "project_report.json"))
    print(json.dumps(report, indent=2, default=str))
    ok = (
        report.get("config", {}).get("valid", True)
        and report.get("files", {}).get("all_present", True)
        and report.get("checkpoint_consistency", {}).get("consistent", True)
    )
    return 0 if ok else 1
