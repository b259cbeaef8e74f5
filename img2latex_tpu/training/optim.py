"""Optimizer construction and host-side LR control.

Numerics parity with the reference trainer (``img2latex/training/trainer.py``):

* torch ``Adam(lr, weight_decay)`` adds L2 *into the gradient* before the
  moment updates (NOT decoupled AdamW) — reproduced with
  ``optax.add_decayed_weights`` placed before ``scale_by_adam``
  (``trainer.py:80-86``);
* global grad-norm clip 5.0 before the update (``trainer.py:392-397``);
* gradient accumulation via ``optax.MultiSteps`` (averaged grads at the
  boundary == the reference's loss/k backward accumulation,
  ``trainer.py:344-383``);
* ``ReduceLROnPlateau(factor=0.5, patience=2)`` re-implemented host-side with
  torch's rel-threshold semantics (``trainer.py:95-97``) — the LR lives in the
  optimizer state via ``optax.inject_hyperparams`` so changing it does NOT
  retrace the compiled train step;
* backbone freezing (``encoder.py:200-210``) is an update mask here:
  ``freeze_backbone=True`` zeroes updates for all ResNet backbone params
  except stage ``layer4_*``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import optax

from img2latex_tpu.config import Config


# ---------------------------------------------------------------------------
# Optimizer
# ---------------------------------------------------------------------------


def _trainable_label(path_keys) -> str:
    """'freeze' for ResNet backbone params outside layer4, else 'train'."""
    keys = [getattr(k, "key", str(k)) for k in path_keys]
    if "backbone" in keys and not any(str(k).startswith("layer4_") for k in keys):
        return "freeze"
    return "train"


def build_optimizer(cfg: Config, freeze_backbone: Optional[bool] = None) -> optax.GradientTransformation:
    tcfg = cfg.training
    if freeze_backbone is None:
        freeze_backbone = (
            cfg.model.name == "resnet_lstm" and cfg.model.encoder.resnet.freeze_backbone
        )
    if tcfg.optimizer.lower() != "adam":
        raise ValueError(f"Unsupported optimizer {tcfg.optimizer!r} (reference supports adam)")

    def build(learning_rate):
        return optax.chain(
            optax.clip_by_global_norm(tcfg.clip_grad_norm),
            optax.add_decayed_weights(tcfg.weight_decay),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(learning_rate),
        )

    tx: optax.GradientTransformation = optax.inject_hyperparams(build)(
        learning_rate=tcfg.learning_rate
    )
    if freeze_backbone:
        import jax

        def label_tree(params):
            return jax.tree_util.tree_map_with_path(lambda path, _: _trainable_label(path), params)

        tx = optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, label_tree)
    if tcfg.accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=tcfg.accumulation_steps)
    return tx


# ---------------------------------------------------------------------------
# Dynamic learning rate (host-controlled, no retrace)
# ---------------------------------------------------------------------------


def _map_inject_states(state: Any, fn: Callable[[Dict[str, Any]], Dict[str, Any]]) -> Any:
    """Rebuild an optax state pytree, applying ``fn`` to every
    InjectHyperparams ``hyperparams`` dict found."""
    if hasattr(state, "hyperparams") and hasattr(state, "_replace"):
        return state._replace(hyperparams=fn(dict(state.hyperparams)))
    if isinstance(state, tuple) and hasattr(state, "_fields"):  # NamedTuple
        return type(state)(*[_map_inject_states(s, fn) for s in state])
    if isinstance(state, tuple):
        return tuple(_map_inject_states(s, fn) for s in state)
    if isinstance(state, list):
        return [_map_inject_states(s, fn) for s in state]
    if isinstance(state, dict):
        return {k: _map_inject_states(v, fn) for k, v in state.items()}
    return state


def set_learning_rate(opt_state: Any, learning_rate: float) -> Any:
    """Return a new opt_state with the injected learning rate replaced."""
    import jax.numpy as jnp

    def setter(h: Dict[str, Any]) -> Dict[str, Any]:
        if "learning_rate" in h:
            h["learning_rate"] = jnp.asarray(learning_rate, dtype=jnp.float32)
        return h

    return _map_inject_states(opt_state, setter)


def get_learning_rate(opt_state: Any) -> Optional[float]:
    found: list = []

    def getter(h: Dict[str, Any]) -> Dict[str, Any]:
        if "learning_rate" in h:
            found.append(float(h["learning_rate"]))
        return h

    _map_inject_states(opt_state, getter)
    return found[0] if found else None


class PlateauScheduler:
    """torch ``ReduceLROnPlateau(mode=min, threshold_mode=rel)`` semantics."""

    def __init__(
        self,
        init_lr: float,
        factor: float = 0.5,
        patience: int = 2,
        threshold: float = 1e-4,
        min_lr: float = 0.0,
    ):
        self.lr = float(init_lr)
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best: Optional[float] = None
        self.num_bad_epochs = 0

    def step(self, metric: float) -> bool:
        """Record an epoch metric; returns True when the LR was reduced."""
        if self.best is None or metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
            return False
        self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            new_lr = max(self.lr * self.factor, self.min_lr)
            reduced = new_lr < self.lr
            self.lr = new_lr
            self.num_bad_epochs = 0
            return reduced
        return False

    def state_dict(self) -> dict:
        """Resume state (torch ReduceLROnPlateau also checkpoints these)."""
        return {"lr": self.lr, "best": self.best, "num_bad_epochs": self.num_bad_epochs}

    def load_state_dict(self, d: dict) -> None:
        self.lr = float(d["lr"])
        self.best = None if d.get("best") is None else float(d["best"])
        self.num_bad_epochs = int(d.get("num_bad_epochs", 0))


class EarlyStopping:
    """val-loss early stop (reference ``trainer.py:759-765``)."""

    def __init__(self, patience: int = 10, threshold: float = 0.0):
        self.patience = patience
        self.threshold = threshold
        self.best: Optional[float] = None
        self.num_bad_epochs = 0

    def step(self, metric: float) -> bool:
        """Returns True when training should stop."""
        if self.best is None or metric < self.best - self.threshold:
            self.best = metric
            self.num_bad_epochs = 0
            return False
        self.num_bad_epochs += 1
        return self.num_bad_epochs >= self.patience

    def state_dict(self) -> dict:
        return {"best": self.best, "num_bad_epochs": self.num_bad_epochs}

    def load_state_dict(self, d: dict) -> None:
        self.best = None if d.get("best") is None else float(d["best"])
        self.num_bad_epochs = int(d.get("num_bad_epochs", 0))
