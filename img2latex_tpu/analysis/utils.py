"""Shared analysis helpers (reference ``img2latex/analysis/utils.py:15-137``)."""

from __future__ import annotations

import csv
import json
import os
from typing import Any, Dict, List

import numpy as np


class NumPyJSONEncoder(json.JSONEncoder):
    def default(self, obj):
        if isinstance(obj, np.integer):
            return int(obj)
        if isinstance(obj, np.floating):
            return float(obj)
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        if isinstance(obj, np.bool_):
            return bool(obj)
        return super().default(obj)


def ensure_output_dir(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path


def load_json_file(path: str) -> Any:
    with open(path) as f:
        return json.load(f)


def save_json_file(data: Any, path: str) -> None:
    ensure_output_dir(os.path.dirname(os.path.abspath(path)))
    with open(path, "w") as f:
        json.dump(data, f, indent=2, cls=NumPyJSONEncoder)


def load_csv_file(path: str) -> List[Dict[str, str]]:
    with open(path, newline="") as f:
        return list(csv.DictReader(f))


def save_csv_file(rows: List[Dict[str, Any]], path: str) -> None:
    ensure_output_dir(os.path.dirname(os.path.abspath(path)))
    if not rows:
        open(path, "w").close()
        return
    keys = list(rows[0].keys())
    with open(path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=keys)
        writer.writeheader()
        writer.writerows(rows)


def load_predictions_any(path: str) -> List[Dict[str, str]]:
    """Flexible predictions loader: our predictions.json schema, bare lists,
    or CSV with alternate column names (reference ``errors.py:42-205``)."""
    alt_pred = ("prediction", "predicted", "pred", "hypothesis", "output")
    alt_ref = ("reference", "target", "ground_truth", "truth", "label")

    def norm_row(row: Dict[str, Any]) -> Dict[str, str]:
        pred = next((row[k] for k in alt_pred if k in row and row[k] is not None), "")
        ref = next((row[k] for k in alt_ref if k in row and row[k] is not None), "")
        return {"prediction": str(pred), "reference": str(ref), "image": row.get("image")}

    if path.endswith(".csv"):
        return [norm_row(r) for r in load_csv_file(path)]
    data = load_json_file(path)
    if isinstance(data, dict) and "predictions" in data:
        data = data["predictions"]
    if isinstance(data, dict):  # {"pred": [...], "ref": [...]} style
        preds = next((data[k] for k in alt_pred if k in data), None)
        refs = next((data[k] for k in alt_ref if k in data), None)
        if preds is not None and refs is not None:
            return [
                {"prediction": str(p), "reference": str(r), "image": None}
                for p, r in zip(preds, refs)
            ]
        raise ValueError(f"Unrecognized predictions schema in {path}")
    return [norm_row(r) for r in data]
