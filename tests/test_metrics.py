import math

import numpy as np
import pytest

from img2latex_tpu.ops.metrics import (
    analyze_token_distribution,
    bleu_n_score,
    calculate_metrics,
    compute_all_metrics,
    levenshtein_raw,
    levenshtein_similarity,
    token_list_accuracy,
)


class TestLevenshtein:
    def test_identical(self):
        assert levenshtein_raw([1, 2, 3], [1, 2, 3]) == 0
        assert levenshtein_similarity([1, 2, 3], [1, 2, 3]) == 1.0

    def test_empty(self):
        assert levenshtein_raw([], [1, 2]) == 2
        assert levenshtein_raw([1, 2], []) == 2
        assert levenshtein_similarity([], []) == 1.0

    def test_substitution_insertion_deletion(self):
        assert levenshtein_raw([1, 2, 3], [1, 9, 3]) == 1
        assert levenshtein_raw([1, 2, 3], [1, 2, 3, 4]) == 1
        assert levenshtein_raw([1, 2, 3], [2, 3]) == 1

    def test_known_distance(self):
        # "kitten" -> "sitting" = 3, mapped to ints
        a = [ord(c) for c in "kitten"]
        b = [ord(c) for c in "sitting"]
        assert levenshtein_raw(a, b) == 3
        assert levenshtein_similarity(a, b) == pytest.approx(1 - 3 / 7)

    def test_matches_bruteforce_random(self, rng):
        def brute(a, b):
            m, n = len(a), len(b)
            d = np.zeros((m + 1, n + 1), dtype=int)
            d[:, 0] = np.arange(m + 1)
            d[0, :] = np.arange(n + 1)
            for i in range(1, m + 1):
                for j in range(1, n + 1):
                    d[i, j] = min(
                        d[i - 1, j] + 1,
                        d[i, j - 1] + 1,
                        d[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
                    )
            return d[m, n]

        for _ in range(50):
            a = rng.integers(0, 5, size=rng.integers(0, 15)).tolist()
            b = rng.integers(0, 5, size=rng.integers(0, 15)).tolist()
            assert levenshtein_raw(a, b) == brute(a, b)


class TestBleu:
    def test_perfect_match(self):
        seq = [5, 6, 7, 8, 9]
        assert bleu_n_score(seq, seq, 4) == pytest.approx(1.0)

    def test_empty(self):
        assert bleu_n_score([], [1, 2]) == 0.0
        assert bleu_n_score([1, 2], []) == 0.0

    def test_no_overlap_zero(self):
        assert bleu_n_score([1, 2, 3, 4, 5], [6, 7, 8, 9, 10]) == 0.0

    def test_too_short_for_ngram_is_zero(self):
        # len < 4 -> 4-gram precision is 0 -> BLEU-4 = 0 (reference semantics)
        assert bleu_n_score([1, 2, 3], [1, 2, 3], 4) == 0.0
        assert bleu_n_score([1, 2, 3], [1, 2, 3], 3) == pytest.approx(1.0)

    def test_brevity_penalty(self):
        gen = [1, 2, 3, 4]
        ref = [1, 2, 3, 4, 5, 6]
        # precisions all 1.0 (every gen n-gram appears in ref)
        expected = math.exp(1 - 6 / 4)
        assert bleu_n_score(gen, ref, 4) == pytest.approx(expected)

    def test_golden_value(self):
        # Hand-checked against the reference bleu_n_score implementation
        # (img2latex/training/metrics.py:97-181).
        gen = [1, 2, 3, 4, 2, 3]
        ref = [1, 2, 3, 4, 5, 3]
        # 1-grams: matches min-counts -> 1,2x(2),3x(2->min2),4 = 1+1+2+1 = 5 of 6
        # 2-grams: (1,2),(2,3)x2->min1,(3,4) = 3 of 5
        # 3-grams: (1,2,3),(2,3,4) = 2 of 4
        # 4-grams: (1,2,3,4) = 1 of 3
        expected = (5 / 6 * 3 / 5 * 2 / 4 * 1 / 3) ** 0.25
        assert bleu_n_score(gen, ref, 4) == pytest.approx(expected)


class TestAccuracy:
    def test_token_list_accuracy(self):
        preds = [[1, 2, 3], [4, 5]]
        tgts = [[1, 9, 3, 7], [4, 5]]
        correct, total = token_list_accuracy(preds, tgts, pad_token_id=0)
        assert (correct, total) == (4, 5)

    def test_pad_ignored(self):
        correct, total = token_list_accuracy([[1, 2, 0]], [[1, 2, 0]], pad_token_id=0)
        assert (correct, total) == (2, 2)


class TestOrchestrators:
    def test_calculate_metrics_keys(self):
        out = calculate_metrics([[1, 2, 3, 4]], [[1, 2, 3, 4]])
        assert out["bleu"] == pytest.approx(1.0)
        assert out["levenshtein"] == pytest.approx(1.0)
        assert out["batch_size"] == 1

    def test_token_distribution(self, tiny_tokenizer):
        preds = [[4, 4, 5], [4, 6]]
        tgts = [[4, 5, 6], [4, 5]]
        dist = analyze_token_distribution(preds, tgts, tiny_tokenizer, top_k=3)
        assert dist["predictions"]["repetition_factor"] == pytest.approx(3 / 5)
        assert dist["predictions"]["diversity"] == pytest.approx(3 / 5)
        assert len(dist["targets"]["top_tokens"]) == 3

    def test_compute_all_metrics_saves_file(self, tiny_tokenizer, tmp_path):
        out = compute_all_metrics(
            [[4, 5, 6, 7]],
            [[4, 5, 6, 7]],
            tiny_tokenizer,
            experiment_name="exp",
            metrics_dir=str(tmp_path),
            save_to_file=True,
            epoch=3,
        )
        assert out["accuracy"] == pytest.approx(1.0)
        assert (tmp_path / "exp_enhanced_metrics_epoch_3.json").exists()


class TestDeviceLosses:
    def test_smoothed_ce_matches_torch(self):
        torch = pytest.importorskip("torch")
        import jax.numpy as jnp

        from img2latex_tpu.ops.losses import masked_accuracy, smoothed_cross_entropy

        rng = np.random.default_rng(1)
        B, L, V = 3, 7, 11
        logits = rng.normal(size=(B, L, V)).astype(np.float32)
        targets = rng.integers(0, V, size=(B, L))
        targets[0, 5:] = 0  # PAD
        for smoothing in (0.0, 0.1):
            ref = torch.nn.functional.cross_entropy(
                torch.tensor(logits).reshape(-1, V),
                torch.tensor(targets).reshape(-1),
                ignore_index=0,
                label_smoothing=smoothing,
            ).item()
            got = float(
                smoothed_cross_entropy(jnp.array(logits), jnp.array(targets), 0, smoothing)
            )
            assert got == pytest.approx(ref, rel=1e-5)

        correct, total = masked_accuracy(jnp.array(logits), jnp.array(targets), 0)
        pred = logits.argmax(-1)
        mask = targets != 0
        assert int(correct) == int(((pred == targets) & mask).sum())
        assert int(total) == int(mask.sum())
