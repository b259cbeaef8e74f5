"""PathManager: canonical experiment directory tree + project-root detection.

Same filesystem contract as the reference (``img2latex/utils/path_utils.py``):
``outputs/<experiment>[_vN]/{checkpoints,logs,metrics,plots,reports,predictions}``
plus ``outputs/registry/experiment_registry.json``, created on access
(``path_utils.py:119-232,342-373``), with a writability self-test on the log
dir (``path_utils.py:168-177``).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, Optional

SUBDIRS = ("checkpoints", "logs", "metrics", "plots", "reports", "predictions")


def find_project_root(start: Optional[str] = None) -> Path:
    """Heuristic project-root detection (reference ``path_utils.py:34-96``):
    walk up from ``start`` looking for repo markers; fall back to cwd."""
    p = Path(start or os.getcwd()).resolve()
    for candidate in [p, *p.parents]:
        for marker in (".git", "pyproject.toml", "img2latex_tpu"):
            if (candidate / marker).exists():
                return candidate
    return p


class PathManager:
    def __init__(self, project_root: Optional[str] = None, outputs_dirname: str = "outputs"):
        self.project_root = find_project_root(project_root)
        self.outputs_dir = self.project_root / outputs_dirname

    # ------------------------------------------------------------------
    def registry_file(self) -> Path:
        reg_dir = self.outputs_dir / "registry"
        reg_dir.mkdir(parents=True, exist_ok=True)
        return reg_dir / "experiment_registry.json"

    def experiment_dir(self, experiment_name: str) -> Path:
        return self.outputs_dir / experiment_name

    def get_dir(self, experiment_name: str, kind: str) -> Path:
        """Kind in {checkpoints, logs, metrics, plots, reports, predictions};
        created on access."""
        if kind not in SUBDIRS:
            raise ValueError(f"Unknown experiment subdir {kind!r}; valid: {SUBDIRS}")
        d = self.experiment_dir(experiment_name) / kind
        d.mkdir(parents=True, exist_ok=True)
        return d

    # ------------------------------------------------------------------
    def next_version_name(self, base_name: str) -> str:
        """Auto-version ``name -> name_vN`` by scanning existing experiment
        dirs (reference ``registry.py:62-84`` semantics)."""
        if not self.outputs_dir.exists():
            return base_name
        existing = {p.name for p in self.outputs_dir.iterdir() if p.is_dir()}
        if base_name not in existing:
            return base_name
        version = 1
        while f"{base_name}_v{version}" in existing:
            version += 1
        return f"{base_name}_v{version}"

    # ------------------------------------------------------------------
    def create_experiment_structure(self, experiment_name: str) -> Dict[str, Path]:
        """Create the full experiment tree; returns dir map.  Includes a
        writability self-test on the logs dir (reference
        ``path_utils.py:168-177``)."""
        dirs = {kind: self.get_dir(experiment_name, kind) for kind in SUBDIRS}
        probe = dirs["logs"] / ".write_test"
        try:
            probe.write_text("ok")
            probe.unlink()
        except OSError as e:
            raise OSError(f"Experiment log dir not writable: {dirs['logs']}: {e}") from e
        return dirs


_default: Optional[PathManager] = None


def path_manager() -> PathManager:
    """Module-level default instance (reference ``path_utils.py:393``)."""
    global _default
    if _default is None:
        _default = PathManager()
    return _default
