"""On-device loss and accuracy ops (jit-safe, static shapes).

The reference computes label-smoothed masked cross-entropy via
``nn.CrossEntropyLoss(ignore_index=pad, label_smoothing=0.1)``
(``img2latex/training/trainer.py:111-115``) and masked accuracy with a
device->host sync per batch (``training/metrics.py:226-238``).  Here both are
pure JAX functions evaluated inside the jitted train/eval step — no host
round-trips; the host pulls one scalar pytree per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smoothed_cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    pad_token_id: int,
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """Mean label-smoothed CE over non-PAD positions.

    Matches ``torch.nn.CrossEntropyLoss(ignore_index=pad, label_smoothing=s)``:
    target distribution ``(1-s)`` on the true class plus ``s/V`` uniform over
    all ``V`` classes, averaged over unmasked tokens.

    Args:
      logits: (..., V) float logits.
      targets: (...) int class ids.
    """
    vocab = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth_loss = -jnp.mean(logp, axis=-1)  # == -(1/V) * sum_j logp_j
        # torch folds the (s/V) mass on the true class into the uniform term:
        # loss = (1 - s) * nll + s * mean_j(-logp_j)
        del vocab
        loss = (1.0 - label_smoothing) * nll + label_smoothing * smooth_loss
    else:
        loss = nll
    mask = (targets != pad_token_id).astype(jnp.float32)
    total = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(loss * mask) / total


def masked_accuracy(logits: jnp.ndarray, targets: jnp.ndarray, pad_token_id: int):
    """(correct, total) token counts over non-PAD positions, on device."""
    pred = jnp.argmax(logits, axis=-1)
    mask = targets != pad_token_id
    correct = jnp.sum(jnp.logical_and(pred == targets, mask))
    return correct, jnp.sum(mask)


def masked_token_counts(pred_ids: jnp.ndarray, targets: jnp.ndarray, pad_token_id: int):
    """(correct, total) from already-computed prediction ids."""
    mask = targets != pad_token_id
    correct = jnp.sum(jnp.logical_and(pred_ids == targets, mask))
    return correct, jnp.sum(mask)
