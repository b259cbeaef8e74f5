"""Compiled train/eval steps: pure functions over an explicit TrainState.

The reference's hot loop interleaves host work per batch — ``.to(device)``
copies, ``loss.item()``, masked-accuracy ``.cpu()`` syncs
(``img2latex/training/trainer.py:271-459``, ``metrics.py:226-238``).  Here one
jitted step consumes a uint8 batch and returns a scalar metrics pytree; the
uint8->float normalization, forward, loss, backward, clip, and optimizer
update all fuse into a single XLA program with donated buffers.  The same
step functions are pjit-sharded over a device mesh by
``img2latex_tpu.parallel`` — they contain no device-specific code.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from img2latex_tpu.config import Config
from img2latex_tpu.models.seq2seq import Seq2SeqModel
from img2latex_tpu.ops.losses import (
    masked_accuracy,
    masked_token_counts,
    smoothed_cross_entropy,
)
from img2latex_tpu.ops.preprocess import normalize_images


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any  # {} for models without BatchNorm


def create_train_state(
    model: Seq2SeqModel,
    tx: optax.GradientTransformation,
    cfg: Config,
    rng: jax.Array,
    max_seq_length: Optional[int] = None,
) -> TrainState:
    h, w, c = cfg.image_shape
    L = max_seq_length or cfg.data.max_seq_length
    dummy_img = jnp.zeros((2, h, w, c), jnp.float32)
    dummy_tgt = jnp.zeros((2, L), jnp.int32)
    variables = model.init(rng, dummy_img, dummy_tgt)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=batch_stats,
    )


def make_train_step(
    model: Seq2SeqModel,
    tx: optax.GradientTransformation,
    cfg: Config,
    pad_id: int,
) -> Callable:
    """Build the (jittable) train step: (state, batch, rng) -> (state, metrics)."""
    smoothing = cfg.training.label_smoothing
    mean = tuple(cfg.preprocessing.normalization_mean)
    std = tuple(cfg.preprocessing.normalization_std)
    has_bn = cfg.model.name == "resnet_lstm"
    augment_device = bool(getattr(cfg.data, "augment_device", False))
    pad_fill = float(getattr(cfg.preprocessing, "pad_value", 255))

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        images = batch["images"]
        dropout_rng = jax.random.fold_in(rng, state.step)
        if augment_device:
            from img2latex_tpu.ops.augment import augment_batch

            # Distinct stream from dropout; still step-deterministic.
            aug_rng = jax.random.fold_in(dropout_rng, 0x617567)
            images = augment_batch(
                images, aug_rng, fill=pad_fill,
                max_rotate_deg=float(
                    getattr(cfg.data, "augment_max_rotate_deg", 5.0)
                ),
                max_translate_frac=float(
                    getattr(cfg.data, "augment_max_translate_frac", 0.02)
                ),
            )
        images = normalize_images(images, mean, std)
        formulas = batch["formulas"]
        targets = formulas[:, 1:]

        def loss_fn(params):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = state.batch_stats
                logits, mutated = model.apply(
                    variables,
                    images,
                    formulas,
                    train=True,
                    rngs={"dropout": dropout_rng},
                    mutable=["batch_stats"],
                )
                new_stats = mutated["batch_stats"]
            else:
                logits = model.apply(
                    variables, images, formulas, train=True, rngs={"dropout": dropout_rng}
                )
                new_stats = state.batch_stats
            loss = smoothed_cross_entropy(logits, targets, pad_id, smoothing)
            correct, total = masked_accuracy(logits, targets, pad_id)
            return loss, (new_stats, correct, total)

        (loss, (new_stats, correct, total)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=new_stats,
        )
        metrics = {
            "loss": loss,
            "correct": correct,
            "total": total,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return train_step


def make_eval_step(model: Seq2SeqModel, cfg: Config, pad_id: int) -> Callable:
    """Teacher-forced eval step returning loss/accuracy counts plus the argmax
    prediction ids and their max-probabilities (for BLEU + enhanced metrics,
    reference ``trainer.py:489-563``)."""
    smoothing = cfg.training.label_smoothing
    mean = tuple(cfg.preprocessing.normalization_mean)
    std = tuple(cfg.preprocessing.normalization_std)
    has_bn = cfg.model.name == "resnet_lstm"

    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        images = normalize_images(batch["images"], mean, std)
        formulas = batch["formulas"]
        targets = formulas[:, 1:]
        variables = {"params": state.params}
        if has_bn:
            variables["batch_stats"] = state.batch_stats
        logits = model.apply(variables, images, formulas)
        loss = smoothed_cross_entropy(logits, targets, pad_id, smoothing)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        # One vocab-axis argmax serves both the accuracy counts and the
        # prediction ids (softmax preserves the argmax).
        pred_ids = jnp.argmax(probs, axis=-1).astype(jnp.int32)
        correct, total = masked_token_counts(pred_ids, targets, pad_id)
        probs_max = jnp.max(probs, axis=-1)
        # Weight the loss by this batch's token count so short (padded) final
        # batches average correctly on host.
        return {
            "loss": loss,
            "correct": correct,
            "total": total,
            "pred_ids": pred_ids,
            "probs_max": probs_max,
        }

    return eval_step
