"""Error analysis: edit-distance buckets + LaTeX error-pattern detection.

Capability parity with reference ``img2latex/analysis/errors.py:42-536``:
flexible predictions loader (JSON/CSV, alternate column names), bucketing by
configurable edit-distance ranges, regex detection of 8 LaTeX error patterns,
a markdown report with per-bucket samples + pattern table, and
``error_buckets.json``.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, List

from img2latex_tpu.analysis.utils import ensure_output_dir, load_predictions_any, save_json_file
from img2latex_tpu.ops.metrics import levenshtein_raw
from img2latex_tpu.utils.logging import get_logger

logger = get_logger(__name__)

# The reference's 8 regex pattern detectors (errors.py:245-297), rebuilt.
ERROR_PATTERNS: Dict[str, Any] = {
    "unbalanced_braces": lambda s: s.count("{") != s.count("}"),
    "unbalanced_brackets": lambda s: s.count("[") != s.count("]"),
    "unbalanced_parens": lambda s: s.count("(") != s.count(")"),
    "missing_backslash_command": re.compile(
        r"(?<![\\a-zA-Z])(frac|sqrt|sum|int|alpha|beta|gamma|cdot|left|right)(?![a-zA-Z])"
    ),
    "bad_frac": re.compile(r"\\frac(?!\s*\{)"),
    # \s is excluded from the offending-char class: otherwise the greedy \s*
    # backtracks and the space itself "offends", flagging well-formed
    # space-tokenized scripts like "x _ { k }" (the reference's own pattern,
    # errors.py:262, has exactly that false positive; intended behavior only).
    "dangling_subscript": re.compile(r"_\s*($|[^\s\{a-zA-Z0-9\\])"),
    "dangling_superscript": re.compile(r"\^\s*($|[^\s\{a-zA-Z0-9\\])"),
    "double_script": re.compile(r"(_\s*_|\^\s*\^)"),
}


def token_edit_distance(pred: str, ref: str) -> int:
    """Token-level edit distance on whitespace tokens."""
    ptoks, rtoks = pred.split(), ref.split()
    vocab: Dict[str, int] = {}
    to_ids = lambda toks: [vocab.setdefault(t, len(vocab)) for t in toks]
    return levenshtein_raw(to_ids(ptoks), to_ids(rtoks))


def bucket_by_edit_distance(
    rows: List[Dict[str, str]], ranges: List[List[Any]]
) -> Dict[str, List[Dict[str, Any]]]:
    """Bucket prediction rows by token edit distance into config ranges
    (reference ``errors.py:208-242``); range end "inf" = unbounded."""
    buckets: Dict[str, List[Dict[str, Any]]] = {}
    parsed = []
    for lo, hi in ranges:
        hi_v = float("inf") if str(hi) == "inf" else int(hi)
        label = f"{lo}-{hi}" if hi_v != float("inf") else f"{lo}+"
        parsed.append((int(lo), hi_v, label))
        buckets[label] = []
    for row in rows:
        d = token_edit_distance(row["prediction"], row["reference"])
        entry = {**row, "edit_distance": d}
        for lo, hi, label in parsed:
            if lo <= d <= hi:
                buckets[label].append(entry)
                break
    return buckets


def identify_error_patterns(rows: List[Dict[str, str]]) -> Dict[str, int]:
    counts = {name: 0 for name in ERROR_PATTERNS}
    for row in rows:
        pred = row["prediction"]
        for name, pat in ERROR_PATTERNS.items():
            if callable(pat):
                hit = pat(pred)
            else:
                hit = bool(pat.search(pred))
            if hit:
                counts[name] += 1
    return counts


def generate_error_report(
    buckets: Dict[str, List[Dict[str, Any]]],
    patterns: Dict[str, int],
    out_path: str,
    samples_per_bucket: int = 5,
    top_patterns: int = 5,
) -> str:
    total = sum(len(v) for v in buckets.values())
    lines = ["# Error analysis report", "", f"Total samples: {total}", "", "## Edit-distance buckets", ""]
    lines += ["| bucket | count | share |", "|---|---|---|"]
    for label, items in buckets.items():
        share = len(items) / total if total else 0
        lines.append(f"| {label} | {len(items)} | {share:.1%} |")
    lines += ["", "## Top error patterns", "", "| pattern | count |", "|---|---|"]
    for name, count in sorted(patterns.items(), key=lambda kv: kv[1], reverse=True)[:top_patterns]:
        lines.append(f"| {name} | {count} |")
    for label, items in buckets.items():
        if not items:
            continue
        lines += ["", f"## Samples: bucket {label}", ""]
        for item in items[:samples_per_bucket]:
            lines += [
                f"- distance {item['edit_distance']}",
                f"  - pred: `{item['prediction'][:120]}`",
                f"  - ref:  `{item['reference'][:120]}`",
            ]
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return out_path


def analyze_errors_cmd(args) -> int:
    from img2latex_tpu.config import load_config

    cfg = load_config(args.config)
    rows = load_predictions_any(args.predictions_file)
    out_dir = ensure_output_dir(args.output_dir)
    buckets = bucket_by_edit_distance(rows, cfg.analysis.error_distance_ranges)
    patterns = identify_error_patterns(rows)
    report = generate_error_report(
        buckets,
        patterns,
        os.path.join(out_dir, "error_report.md"),
        samples_per_bucket=cfg.analysis.samples_per_bucket,
        top_patterns=cfg.analysis.top_error_patterns,
    )
    save_json_file(
        {
            "bucket_counts": {k: len(v) for k, v in buckets.items()},
            "patterns": patterns,
            "buckets": {
                k: v[: cfg.analysis.max_bucket_examples] for k, v in buckets.items()
            },
        },
        os.path.join(out_dir, "error_buckets.json"),
    )
    print(f"Wrote {report} and error_buckets.json ({len(rows)} samples)")
    return 0
