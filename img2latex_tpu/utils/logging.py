"""Logging: named-logger cache, per-experiment flushed file handlers.

Same observability contract as the reference (``img2latex/utils/logging.py``):
``get_logger`` with a module cache, ``configure_logging(cfg)`` installing a
console handler plus a line-buffered, flush-per-emit file handler under the
experiment's ``logs/`` dir (reference ``ImmediateFileHandler``,
``logging.py:17-72``), third-party logger silencing, and an execution-context
banner (``log_execution_params``, ``logging.py:285-301``).
"""

from __future__ import annotations

import atexit
import logging
import os
import sys
from typing import Any, Dict, Optional

_LOGGERS: Dict[str, logging.Logger] = {}
_FILE_HANDLER: Optional[logging.Handler] = None
_ROOT_NAME = "img2latex_tpu"

_FORMAT = "%(asctime)s | %(levelname)-7s | %(name)s | %(message)s"
_DATEFMT = "%Y-%m-%d %H:%M:%S"


class ImmediateFileHandler(logging.FileHandler):
    """File handler that flushes on every emit so tail -f always sees the
    latest record even if the process dies (reference ``logging.py:17-72``)."""

    def __init__(self, filename: str, mode: str = "a", encoding: str = "utf-8"):
        os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
        super().__init__(filename, mode=mode, encoding=encoding)

    def emit(self, record: logging.LogRecord) -> None:
        super().emit(record)
        self.flush()


def get_logger(name: str, log_level: str = "INFO") -> logging.Logger:
    if name in _LOGGERS:
        return _LOGGERS[name]
    logger = logging.getLogger(name)
    logger.setLevel(getattr(logging, log_level.upper(), logging.INFO))
    root = logging.getLogger(_ROOT_NAME)
    if not root.handlers and not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT, _DATEFMT))
        root.addHandler(handler)
    # Stop at the package root: other libraries (absl/jax) install root-logger
    # handlers that would double every line.
    root.propagate = False
    logger.propagate = True
    _LOGGERS[name] = logger
    return logger


def configure_logging(
    config: Any = None, log_dir: Optional[str] = None, experiment_name: Optional[str] = None
) -> None:
    """Install console + per-experiment file handlers on the package root
    logger; silence noisy third-party loggers (reference ``logging.py:161-282``)."""
    global _FILE_HANDLER
    level_name = "INFO"
    log_file = "train.log"
    log_to_file = True
    if config is not None:
        log_cfg = getattr(config, "logging", None)
        if log_cfg is not None:
            level_name = getattr(log_cfg, "level", level_name)
            log_file = getattr(log_cfg, "log_file", log_file)
            log_to_file = getattr(log_cfg, "log_to_file", log_to_file)
    level = getattr(logging, str(level_name).upper(), logging.INFO)

    root = logging.getLogger(_ROOT_NAME)
    root.setLevel(level)
    if not any(isinstance(h, logging.StreamHandler) and not isinstance(h, logging.FileHandler) for h in root.handlers):
        console = logging.StreamHandler(sys.stderr)
        console.setFormatter(logging.Formatter(_FORMAT, _DATEFMT))
        root.addHandler(console)

    if log_to_file and log_dir:
        if _FILE_HANDLER is not None:
            root.removeHandler(_FILE_HANDLER)
            _FILE_HANDLER.close()
        path = os.path.join(log_dir, log_file)
        _FILE_HANDLER = ImmediateFileHandler(path)
        _FILE_HANDLER.setFormatter(logging.Formatter(_FORMAT, _DATEFMT))
        root.addHandler(_FILE_HANDLER)
        root.info("Logging to %s", path)

    for noisy in ("matplotlib", "PIL", "jax._src", "absl", "orbax"):
        logging.getLogger(noisy).setLevel(logging.WARNING)
    atexit.register(logging.shutdown)


def log_execution_params(logger: logging.Logger, params: Dict[str, Any]) -> None:
    """Execution-context banner (reference ``logging.py:285-301``)."""
    logger.info("=" * 60)
    logger.info("Execution parameters:")
    for key, value in params.items():
        logger.info("  %s: %s", key, value)
    logger.info("=" * 60)
