"""Host-side evaluation metrics: BLEU-n, Levenshtein, token accuracy.

Numerically identical contracts to the reference implementations in
``img2latex/training/metrics.py``:

* :func:`levenshtein_similarity` — normalized similarity ``1 - d/max_len``
  (reference ``metrics.py:49-94``), here with an O(min(m,n)) memory,
  vectorized-inner-loop DP instead of the reference's O(m*n) Python loops.
* :func:`bleu_n_score` — geometric mean of 1..n-gram precisions, zero if any
  precision is zero, brevity penalty only when the candidate is shorter
  (reference ``metrics.py:97-181``).
* :func:`token_list_accuracy` — correct/total counts over the overlapping
  prefix, ignoring PAD positions in the target (reference ``metrics.py:241-277``).
* :func:`calculate_metrics` / :func:`compute_all_metrics` — batch
  orchestrators with the same output keys (reference ``metrics.py:184-223,546-656``).

An optional native C++ fast path (``native/fastmetrics``) accelerates the
Levenshtein/BLEU hot loop for large eval sweeps; results are bit-identical.
"""

from __future__ import annotations

import json
import math
import os
from collections import Counter
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

# Optional native fast path, loaded lazily (see native/fastmetrics.cpp).
_native = None
_native_checked = False


def _get_native():
    global _native, _native_checked
    if not _native_checked:
        _native_checked = True
        try:
            from img2latex_tpu.ops import _fastmetrics  # type: ignore

            _native = _fastmetrics
        except Exception:
            _native = None
    return _native


# ---------------------------------------------------------------------------
# Levenshtein
# ---------------------------------------------------------------------------


def levenshtein_raw(a: Sequence[int], b: Sequence[int]) -> int:
    """Plain edit distance between two token sequences."""
    native = _get_native()
    if native is not None:
        return native.levenshtein(list(map(int, a)), list(map(int, b)))
    m, n = len(a), len(b)
    if m == 0:
        return n
    if n == 0:
        return m
    if m > n:  # keep the vectorized row (b) the longer one: the Python loop
        a, b, m, n = b, a, n, m  # then runs min(m, n) iterations
    b_arr = np.asarray(b, dtype=np.int64)
    prev = np.arange(n + 1, dtype=np.int64)
    idx = np.arange(n + 1, dtype=np.int64)
    for i in range(1, m + 1):
        sub = prev[:-1] + (b_arr != a[i - 1])
        dele = prev[1:] + 1
        cur = np.empty(n + 1, dtype=np.int64)
        cur[0] = i
        cur[1:] = np.minimum(sub, dele)
        # Insertion (cur[j] <= cur[j-1] + 1) is a prefix-min recurrence:
        # min over k<=j of cur[k] + (j - k) == minimum.accumulate(cur - j) + j.
        cur = np.minimum.accumulate(cur - idx) + idx
        prev = cur
    return int(prev[n])


def levenshtein_similarity(a: Sequence[int], b: Sequence[int]) -> float:
    """Normalized similarity ``1 - d / max(len(a), len(b))`` in [<=0, 1]."""
    max_len = max(len(a), len(b))
    if max_len == 0:
        return 1.0
    return 1.0 - levenshtein_raw(a, b) / max_len


# Alias with the reference's (misleading) name for drop-in compatibility:
# the reference's ``levenshtein_distance`` actually returns the similarity.
levenshtein_distance = levenshtein_similarity


# ---------------------------------------------------------------------------
# BLEU
# ---------------------------------------------------------------------------


def bleu_n_score(generated: Sequence[int], reference: Sequence[int], n: int = 4) -> float:
    """BLEU-n for a single candidate/reference pair of token-id sequences."""
    gen = list(map(int, generated))
    ref = list(map(int, reference))
    gen_len, ref_len = len(gen), len(ref)
    if gen_len == 0 or ref_len == 0:
        return 0.0
    native = _get_native()
    if native is not None:
        return native.bleu_n(gen, ref, n)

    log_sum = 0.0
    for k in range(1, n + 1):
        if gen_len < k or ref_len < k:
            return 0.0
        gen_ngrams = Counter(tuple(gen[i : i + k]) for i in range(gen_len - k + 1))
        ref_ngrams = Counter(tuple(ref[i : i + k]) for i in range(ref_len - k + 1))
        matching = sum(min(c, ref_ngrams[g]) for g, c in gen_ngrams.items())
        total = gen_len - k + 1
        if matching == 0:
            return 0.0
        log_sum += math.log(matching / total)
    geo_mean = math.exp(log_sum / n)
    if gen_len < ref_len:
        return math.exp(1.0 - ref_len / gen_len) * geo_mean
    return geo_mean


# ---------------------------------------------------------------------------
# Accuracy
# ---------------------------------------------------------------------------


def token_list_accuracy(
    predictions: Sequence[Sequence[int]],
    targets: Sequence[Sequence[int]],
    pad_token_id: int,
) -> Tuple[int, int]:
    """(correct, total) token counts over overlapping prefixes, ignoring PAD."""
    total_correct = 0
    total_tokens = 0
    for pred, tgt in zip(predictions, targets):
        m = min(len(pred), len(tgt))
        p = np.asarray(pred[:m])
        t = np.asarray(tgt[:m])
        mask = t != pad_token_id
        total_correct += int(np.sum((p == t) & mask))
        total_tokens += int(np.sum(mask))
    return total_correct, total_tokens


def masked_accuracy_from_arrays(
    pred_ids: np.ndarray, targets: np.ndarray, pad_token_id: int
) -> Tuple[int, int]:
    """(correct, total) for dense (B, L) arrays (reference ``metrics.py:226-238``
    computed the argmax on host; here callers pass device-computed argmax ids)."""
    mask = targets != pad_token_id
    correct = int(np.sum((pred_ids == targets) & mask))
    return correct, int(np.sum(mask))


# ---------------------------------------------------------------------------
# Batch orchestrators
# ---------------------------------------------------------------------------


def calculate_metrics(
    predictions: Sequence[Sequence[int]], targets: Sequence[Sequence[int]], bleu_n: int = 4
) -> Dict[str, float]:
    """Mean BLEU + mean Levenshtein similarity over a batch (reference
    ``metrics.py:184-223``)."""
    assert len(predictions) == len(targets), "predictions/targets length mismatch"
    n = len(predictions)
    if n == 0:
        return {"bleu": 0.0, "levenshtein": 0.0, "batch_size": 0}
    native = _get_native()
    if native is not None:
        bleus, levs = native.batch_metrics(predictions, targets, bleu_n)
        return {"bleu": float(bleus.mean()), "levenshtein": float(levs.mean()), "batch_size": n}
    bleu = sum(bleu_n_score(predictions[i], targets[i], bleu_n) for i in range(n)) / n
    lev = sum(levenshtein_similarity(predictions[i], targets[i]) for i in range(n)) / n
    return {"bleu": bleu, "levenshtein": lev, "batch_size": n}


def analyze_token_distribution(
    predictions: Sequence[Sequence[int]],
    targets: Sequence[Sequence[int]],
    tokenizer,
    top_k: int = 10,
) -> Dict[str, Any]:
    """Top-k tokens, entropy, diversity and repetition factor (reference
    ``metrics.py:280-360``)."""

    def _entropy(counter: Counter, total: int) -> float:
        if total == 0:
            return 0.0
        probs = np.array([c / total for c in counter.values()], dtype=np.float64)
        probs = probs[probs > 0]
        return float(-np.sum(probs * np.log(probs)))

    pred_flat = [int(t) for seq in predictions for t in seq]
    tgt_flat = [int(t) for seq in targets for t in seq]
    pred_counter, tgt_counter = Counter(pred_flat), Counter(tgt_flat)
    pred_common = pred_counter.most_common(top_k)
    tgt_common = tgt_counter.most_common(top_k)
    return {
        "predictions": {
            "top_tokens": [
                (tokenizer.id_to_token.get(tid, "<UNK>"), cnt) for tid, cnt in pred_common
            ],
            "entropy": _entropy(pred_counter, len(pred_flat)),
            "diversity": len(pred_counter) / len(pred_flat) if pred_flat else 0,
            "repetition_factor": pred_common[0][1] / len(pred_flat) if pred_common else 0,
        },
        "targets": {
            "top_tokens": [
                (tokenizer.id_to_token.get(tid, "<UNK>"), cnt) for tid, cnt in tgt_common
            ],
            "entropy": _entropy(tgt_counter, len(tgt_flat)),
            "diversity": len(tgt_counter) / len(tgt_flat) if tgt_flat else 0,
        },
    }


def sample_predictions_and_targets(
    probs_max: np.ndarray,
    pred_ids: np.ndarray,
    targets: np.ndarray,
    tokenizer,
    num_samples: int = 2,
    confidence_threshold: float = 0.5,
) -> Dict[str, List]:
    """Per-sample prediction/confidence dump (reference ``metrics.py:363-454``).

    Takes the already-computed max-probabilities and argmax ids (device
    arrays pulled once) instead of full (B, L, V) logits to keep the
    device->host transfer small.
    """
    samples = []
    batch = pred_ids.shape[0]
    for i in range(min(batch, num_samples)):
        pred_mask = pred_ids[i] != tokenizer.pad_token_id
        tgt_mask = targets[i] != tokenizer.pad_token_id
        pred_seq = pred_ids[i][pred_mask]
        tgt_seq = targets[i][tgt_mask]
        confidences = probs_max[i][pred_mask]
        low_idx = np.where(confidences < confidence_threshold)[0]
        low_tokens = [
            (tokenizer.id_to_token.get(int(pred_seq[j]), "<UNK>"), float(confidences[j]))
            for j in low_idx
            if j < len(pred_seq)
        ]
        samples.append(
            {
                "prediction": tokenizer.decode(pred_seq.tolist()),
                "target": tokenizer.decode(tgt_seq.tolist()),
                "low_confidence_tokens": low_tokens,
                "token_by_token": [
                    {
                        "pred_token": tokenizer.id_to_token.get(int(t), "<UNK>"),
                        "confidence": float(c),
                        "is_correct": bool(t == tgt_seq[j]) if j < len(tgt_seq) else None,
                    }
                    for j, (t, c) in enumerate(zip(pred_seq, confidences))
                    if j < 20
                ],
            }
        )
    return {"samples": samples}


def _to_jsonable(obj: Any) -> Any:
    if obj is None:
        return None
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.bool_, bool)):
        return bool(obj)
    if isinstance(obj, dict):
        return {k: _to_jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(v) for v in obj]
    return obj


def save_enhanced_metrics(
    metrics: Dict[str, Any], experiment_name: str, metrics_dir: str, epoch: int
) -> str:
    """Write ``<exp>_enhanced_metrics_epoch_<N>.json`` (reference
    ``metrics.py:457-503``); the analysis suite globs this exact pattern."""
    os.makedirs(metrics_dir, exist_ok=True)
    path = os.path.join(metrics_dir, f"{experiment_name}_enhanced_metrics_epoch_{epoch}.json")
    with open(path, "w") as f:
        json.dump(_to_jsonable(metrics), f, indent=2)
    return path


def compute_all_metrics(
    all_predictions: List[List[int]],
    all_targets: List[List[int]],
    tokenizer,
    probs_max: Optional[np.ndarray] = None,
    pred_ids: Optional[np.ndarray] = None,
    dense_targets: Optional[np.ndarray] = None,
    num_samples: int = 2,
    confidence_threshold: float = 0.5,
    experiment_name: Optional[str] = None,
    metrics_dir: Optional[str] = None,
    save_to_file: bool = False,
    epoch: Optional[int] = None,
    bleu_n: int = 4,
) -> Dict[str, Any]:
    """Combined accuracy/BLEU/Levenshtein/token-distribution report with the
    same output keys as reference ``metrics.py:546-656``."""
    combined: Dict[str, Any] = {}
    if pred_ids is not None and dense_targets is not None:
        correct, total = masked_accuracy_from_arrays(
            np.asarray(pred_ids), np.asarray(dense_targets), tokenizer.pad_token_id
        )
        if probs_max is not None:
            combined["samples"] = sample_predictions_and_targets(
                np.asarray(probs_max),
                np.asarray(pred_ids),
                np.asarray(dense_targets),
                tokenizer,
                num_samples,
                confidence_threshold,
            )
        else:
            combined["samples"] = {"samples": []}
    else:
        correct, total = token_list_accuracy(all_predictions, all_targets, tokenizer.pad_token_id)
        combined["samples"] = {"samples": []}
    combined["accuracy"] = correct / total if total > 0 else 0.0
    combined["num_tokens"] = total

    basic = calculate_metrics(all_predictions, all_targets, bleu_n)
    combined["bleu"] = basic["bleu"]
    combined["levenshtein"] = basic["levenshtein"]
    combined["batch_size"] = basic["batch_size"]
    combined["token_distribution"] = analyze_token_distribution(
        all_predictions, all_targets, tokenizer
    )
    if epoch is not None:
        combined["epoch"] = epoch
    if save_to_file and experiment_name and metrics_dir and epoch is not None:
        save_enhanced_metrics(combined, experiment_name, metrics_dir, epoch)
    return combined
