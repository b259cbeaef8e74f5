"""Token-distribution analysis: frequencies, KL divergence, divergent tokens.

Capability parity with reference ``img2latex/analysis/tokens.py:49-547`` —
implementing the *intended* behavior: the reference command crashes on
mismatched call signatures (``tokens.py:503-514``, see SURVEY.md §2); here
the pipeline (load -> tokenize -> frequencies -> KL + per-token contributions
-> over/under-represented report + comparison plot + markdown) runs end to end.
"""

from __future__ import annotations

import os
from collections import Counter
from typing import Dict, List, Tuple

import numpy as np

from img2latex_tpu.analysis.utils import (
    ensure_output_dir,
    load_predictions_any,
    save_json_file,
)
from img2latex_tpu.utils.logging import get_logger
from img2latex_tpu.utils.visualization import apply_dark_theme

logger = get_logger(__name__)


def tokenize_sequences(texts: List[str]) -> List[List[str]]:
    return [t.split() for t in texts]


def compute_token_frequencies(sequences: List[List[str]]) -> Counter:
    c: Counter = Counter()
    for seq in sequences:
        c.update(seq)
    return c


def calculate_kl_divergence(
    pred_counter: Counter, ref_counter: Counter, eps: float = 1e-10
) -> Tuple[float, Dict[str, float]]:
    """KL(ref || pred) over the union vocabulary, plus each token's
    contribution (reference ``tokens.py:181-229``)."""
    vocab = sorted(set(pred_counter) | set(ref_counter))
    p_total = sum(ref_counter.values()) or 1
    q_total = sum(pred_counter.values()) or 1
    contributions: Dict[str, float] = {}
    kl = 0.0
    for tok in vocab:
        p = ref_counter.get(tok, 0) / p_total + eps
        q = pred_counter.get(tok, 0) / q_total + eps
        c = p * np.log(p / q)
        contributions[tok] = float(c)
        kl += c
    return float(kl), contributions


def find_divergent_tokens(
    pred_counter: Counter, ref_counter: Counter, top_k: int = 20
) -> Dict[str, List[Tuple[str, float]]]:
    """Most over-/under-represented tokens by frequency-ratio difference."""
    p_total = sum(ref_counter.values()) or 1
    q_total = sum(pred_counter.values()) or 1
    diffs = []
    for tok in set(pred_counter) | set(ref_counter):
        ref_f = ref_counter.get(tok, 0) / p_total
        pred_f = pred_counter.get(tok, 0) / q_total
        diffs.append((tok, pred_f - ref_f))
    diffs.sort(key=lambda kv: kv[1])
    return {
        "overrepresented": [(t, d) for t, d in reversed(diffs[-top_k:]) if d > 0],
        "underrepresented": [(t, d) for t, d in diffs[:top_k] if d < 0],
    }


def plot_token_distributions(
    pred_counter: Counter, ref_counter: Counter, out_path: str, top_k: int = 20
) -> str:
    import matplotlib.pyplot as plt

    apply_dark_theme()
    top = [t for t, _ in ref_counter.most_common(top_k)]
    p_total = sum(ref_counter.values()) or 1
    q_total = sum(pred_counter.values()) or 1
    ref_f = [ref_counter.get(t, 0) / p_total for t in top]
    pred_f = [pred_counter.get(t, 0) / q_total for t in top]
    x = np.arange(len(top))
    fig, ax = plt.subplots(figsize=(14, 6))
    ax.bar(x - 0.2, ref_f, width=0.4, label="reference")
    ax.bar(x + 0.2, pred_f, width=0.4, label="prediction")
    ax.set_xticks(x)
    ax.set_xticklabels(top, rotation=45, ha="right")
    ax.set_ylabel("frequency")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def write_divergence_report(
    kl: float,
    divergent: Dict[str, List[Tuple[str, float]]],
    contributions: Dict[str, float],
    out_path: str,
    top_k: int = 10,
) -> str:
    top_contrib = sorted(contributions.items(), key=lambda kv: abs(kv[1]), reverse=True)[:top_k]
    lines = [
        "# Token distribution report",
        "",
        f"KL(reference || prediction) = **{kl:.4f}**",
        "",
        "## Top KL contributors",
        "",
        "| token | contribution |",
        "|---|---|",
        *[f"| `{t}` | {c:+.5f} |" for t, c in top_contrib],
        "",
        "## Overrepresented in predictions",
        "",
        "| token | freq diff |",
        "|---|---|",
        *[f"| `{t}` | {d:+.5f} |" for t, d in divergent["overrepresented"][:top_k]],
        "",
        "## Underrepresented in predictions",
        "",
        "| token | freq diff |",
        "|---|---|",
        *[f"| `{t}` | {d:+.5f} |" for t, d in divergent["underrepresented"][:top_k]],
        "",
    ]
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    return out_path


def analyze_tokens_cmd(args) -> int:
    rows = load_predictions_any(args.predictions_file)
    out_dir = ensure_output_dir(args.output_dir)
    pred_counter = compute_token_frequencies(tokenize_sequences([r["prediction"] for r in rows]))
    ref_counter = compute_token_frequencies(tokenize_sequences([r["reference"] for r in rows]))
    kl, contributions = calculate_kl_divergence(pred_counter, ref_counter)
    divergent = find_divergent_tokens(pred_counter, ref_counter, args.top_k)
    plot = plot_token_distributions(
        pred_counter, ref_counter, os.path.join(out_dir, "token_distributions.png"), args.top_k
    )
    report = write_divergence_report(
        kl, divergent, contributions, os.path.join(out_dir, "token_report.md")
    )
    save_json_file(
        {
            "kl_divergence": kl,
            "num_samples": len(rows),
            "divergent": divergent,
        },
        os.path.join(out_dir, "token_analysis.json"),
    )
    print(f"KL divergence {kl:.4f} over {len(rows)} samples; wrote {plot} and {report}")
    return 0
