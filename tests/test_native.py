"""Native fastmetrics: bit-exact parity with the Python implementations."""

import numpy as np
import pytest

fast = pytest.importorskip("img2latex_tpu.ops._fastmetrics")

from img2latex_tpu.ops import metrics as pymetrics  # noqa: E402


class TestNativeParity:
    def test_levenshtein_random(self, rng):
        for _ in range(200):
            a = rng.integers(0, 20, size=rng.integers(0, 40)).tolist()
            b = rng.integers(0, 20, size=rng.integers(0, 40)).tolist()
            # compare against the pure-numpy path (bypass native dispatch)
            m, n = len(a), len(b)
            expected = _numpy_lev(a, b)
            assert fast.levenshtein(a, b) == expected

    def test_bleu_random(self, rng):
        for _ in range(300):
            a = rng.integers(0, 12, size=rng.integers(0, 30)).tolist()
            b = rng.integers(0, 12, size=rng.integers(0, 30)).tolist()
            expected = _python_bleu(a, b, 4)
            assert fast.bleu_n(a, b, 4) == pytest.approx(expected, abs=1e-12)

    def test_batch_matches_single(self, rng):
        preds = [rng.integers(0, 10, size=rng.integers(0, 25)).tolist() for _ in range(50)]
        tgts = [rng.integers(0, 10, size=rng.integers(0, 25)).tolist() for _ in range(50)]
        bleus, levs = fast.batch_metrics(preds, tgts, 4)
        for i in range(50):
            assert bleus[i] == pytest.approx(_python_bleu(preds[i], tgts[i], 4), abs=1e-12)
            maxlen = max(len(preds[i]), len(tgts[i]))
            exp_sim = 1.0 if maxlen == 0 else 1.0 - _numpy_lev(preds[i], tgts[i]) / maxlen
            assert levs[i] == pytest.approx(exp_sim, abs=1e-12)

    def test_calculate_metrics_uses_native(self):
        out = pymetrics.calculate_metrics([[1, 2, 3, 4]], [[1, 2, 3, 4]])
        assert out["bleu"] == pytest.approx(1.0)
        assert out["levenshtein"] == pytest.approx(1.0)


def _numpy_lev(a, b):
    m, n = len(a), len(b)
    d = np.zeros((m + 1, n + 1), dtype=int)
    d[:, 0] = np.arange(m + 1)
    d[0, :] = np.arange(n + 1)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1, d[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
    return int(d[m, n])


def _python_bleu(gen, ref, n):
    """Tuple-based python BLEU (the reference algorithm, metrics.py:97-181)."""
    import math
    from collections import Counter

    if not gen or not ref:
        return 0.0
    log_sum = 0.0
    for k in range(1, n + 1):
        if len(gen) < k or len(ref) < k:
            return 0.0
        g = Counter(tuple(gen[i : i + k]) for i in range(len(gen) - k + 1))
        r = Counter(tuple(ref[i : i + k]) for i in range(len(ref) - k + 1))
        matching = sum(min(c, r[t]) for t, c in g.items())
        if matching == 0:
            return 0.0
        log_sum += math.log(matching / (len(gen) - k + 1))
    geo = math.exp(log_sum / n)
    if len(gen) < len(ref):
        geo *= math.exp(1 - len(ref) / len(gen))
    return geo
