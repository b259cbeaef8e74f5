"""Versioned file-based experiment registry.

Same artifact contract as the reference (``img2latex/utils/registry.py:24-524``):
a JSON registry at ``outputs/registry/experiment_registry.json`` holding, per
experiment, ``{creation_time, status, tags, description, config_path,
metrics: {steps: {"<step>": {...}}}}``; auto-versioning ``name -> name_vN``;
per-step metric logging dual-written to the registry and the experiment's
``metrics/metrics.json``; list/filter/compare/delete operations.
"""

from __future__ import annotations

import json
import os
import shutil
from datetime import datetime
from typing import Any, Dict, List, Optional

import numpy as np

from img2latex_tpu.utils.logging import get_logger
from img2latex_tpu.utils.paths import PathManager, path_manager

logger = get_logger(__name__)

STATUSES = ("initialized", "training", "completed", "failed")


def _jsonable(obj: Any) -> Any:
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, datetime):
        return obj.isoformat()
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if hasattr(obj, "item"):  # jax/torch scalars
        try:
            return _jsonable(obj.item())
        except Exception:
            return str(obj)
    return obj


class ExperimentRegistry:
    def __init__(self, paths: Optional[PathManager] = None):
        self.paths = paths or path_manager()

    # ------------------------------------------------------------------
    def _load(self) -> Dict[str, Any]:
        f = self.paths.registry_file()
        if f.exists():
            try:
                return json.loads(f.read_text())
            except json.JSONDecodeError:
                logger.warning("Corrupt registry file %s; starting fresh", f)
        return {}

    def _save(self, data: Dict[str, Any]) -> None:
        f = self.paths.registry_file()
        tmp = f.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(_jsonable(data), indent=2))
        os.replace(tmp, f)

    # ------------------------------------------------------------------
    def register_experiment(
        self,
        name: str,
        description: str = "",
        tags: Optional[List[str]] = None,
        config_path: Optional[str] = None,
        auto_version: bool = True,
    ) -> str:
        """Register (optionally auto-versioned) and return the final name."""
        data = self._load()
        final = name
        if auto_version and name in data:
            version = 1
            while f"{name}_v{version}" in data:
                version += 1
            final = f"{name}_v{version}"
        data[final] = {
            "creation_time": datetime.now().isoformat(),
            "status": "initialized",
            "tags": tags or [],
            "description": description,
            "config_path": config_path,
            "metrics": {"steps": {}},
        }
        self._save(data)
        logger.info("Registered experiment %s", final)
        return final

    def update_status(self, name: str, status: str) -> None:
        if status not in STATUSES:
            raise ValueError(f"Invalid status {status!r}; valid: {STATUSES}")
        data = self._load()
        if name not in data:
            logger.warning("update_status: unknown experiment %s", name)
            return
        data[name]["status"] = status
        data[name]["last_updated"] = datetime.now().isoformat()
        self._save(data)

    # ------------------------------------------------------------------
    def log_metrics(self, name: str, step: int, metrics: Dict[str, Any]) -> None:
        """Per-step dual write: registry + per-experiment metrics.json
        (reference ``registry.py:132-211``)."""
        data = self._load()
        if name not in data:
            logger.warning("log_metrics: unknown experiment %s; registering", name)
            data[name] = {
                "creation_time": datetime.now().isoformat(),
                "status": "training",
                "tags": [],
                "description": "",
                "config_path": None,
                "metrics": {"steps": {}},
            }
        entry = _jsonable({"step": step, **metrics})
        data[name]["metrics"]["steps"][str(step)] = entry
        self._save(data)

        metrics_dir = self.paths.get_dir(name, "metrics")
        mfile = metrics_dir / "metrics.json"
        per_exp: Dict[str, Any] = {}
        if mfile.exists():
            try:
                per_exp = json.loads(mfile.read_text())
            except json.JSONDecodeError:
                logger.warning("Corrupt %s — starting a fresh step history", mfile)
                per_exp = {}
        per_exp.setdefault("steps", {})[str(step)] = entry
        # Atomic replace (like _save): a kill mid-write must not truncate the
        # whole step history.
        tmp = mfile.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(per_exp, indent=2))
        os.replace(tmp, mfile)

    # ------------------------------------------------------------------
    def get(self, name: str) -> Optional[Dict[str, Any]]:
        return self._load().get(name)

    def list_experiments(
        self,
        status: Optional[str] = None,
        tag: Optional[str] = None,
        sort_by: str = "creation_time",
    ) -> List[Dict[str, Any]]:
        data = self._load()
        rows = [{"name": k, **v} for k, v in data.items()]
        if status:
            rows = [r for r in rows if r.get("status") == status]
        if tag:
            rows = [r for r in rows if tag in r.get("tags", [])]
        return sorted(rows, key=lambda r: str(r.get(sort_by, "")), reverse=True)

    def delete_experiment(self, name: str, delete_files: bool = False) -> bool:
        data = self._load()
        if name not in data:
            return False
        del data[name]
        self._save(data)
        if delete_files:
            exp_dir = self.paths.experiment_dir(name)
            if exp_dir.exists():
                shutil.rmtree(exp_dir)
        return True

    # ------------------------------------------------------------------
    def compare_experiments(
        self, names: Optional[List[str]] = None, metric: str = "val_loss", minimize: bool = True
    ):
        """Cross-experiment comparison DataFrame with best-step extraction
        (reference ``registry.py:264-418``)."""
        import pandas as pd

        data = self._load()
        names = names or list(data)
        rows = []
        for name in names:
            exp = data.get(name)
            if not exp:
                continue
            steps = exp.get("metrics", {}).get("steps", {})
            best_val, best_step = None, None
            for step_key, m in steps.items():
                v = m.get(metric)
                if v is None:
                    continue
                if best_val is None or (v < best_val if minimize else v > best_val):
                    best_val, best_step = v, step_key
            rows.append(
                {
                    "experiment": name,
                    "status": exp.get("status"),
                    "num_steps": len(steps),
                    f"best_{metric}": best_val,
                    "best_step": best_step,
                }
            )
        return pd.DataFrame(rows)


_default: Optional[ExperimentRegistry] = None


def experiment_registry() -> ExperimentRegistry:
    global _default
    if _default is None:
        _default = ExperimentRegistry()
    return _default
