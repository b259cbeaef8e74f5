"""Dataset evaluation: free-running decode over a split + metrics + artifacts.

Parity with ``img2latex evaluate`` (reference ``cli.py:315-518``): loads a
checkpoint into a predictor, decodes the chosen split with greedy/beam/
sampling, computes BLEU/Levenshtein/token accuracy over the whole split and
writes ``predictions/predictions.json`` under the experiment directory.

TPU-native: the eval loop feeds loader batches (uint8, static shapes)
straight into the predictor's compiled decode — images/sec here IS the
benchmark path (north star: >=5k img/s on v5e-8).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np

from img2latex_tpu.data.pipeline import create_data_loaders
from img2latex_tpu.decoding.decode import DecodeConfig, trim_host
from img2latex_tpu.ops.metrics import calculate_metrics, token_list_accuracy
from img2latex_tpu.training.predictor import Predictor
from img2latex_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def evaluate_checkpoint(
    checkpoint_path: str,
    data_dir: Optional[str] = None,
    split: str = "test",
    beam_size: Optional[int] = None,
    max_length: Optional[int] = None,
    temperature: Optional[float] = None,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    length_penalty: Optional[float] = None,
    early_exit: Optional[bool] = None,
    batch_size: Optional[int] = None,
    max_batches: Optional[int] = None,
    output_dir: Optional[str] = None,
    predictor: Optional[Predictor] = None,
    bucket_widths: Optional[Any] = None,
    config_overrides: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    pred = predictor or Predictor.from_checkpoint(
        checkpoint_path, config_overrides=config_overrides
    )
    # Work on a copy: a caller-supplied predictor must come back with its
    # config untouched (data_dir/batch overrides here are per-evaluation).
    import copy

    cfg = copy.deepcopy(pred.cfg)
    if data_dir:
        cfg.data.data_dir = data_dir
    if batch_size:
        cfg.data.batch_size = batch_size
        cfg.data.eval_batch_size_multiplier = 1
        cfg.data.max_eval_batch_size = batch_size
    tok = pred.tokenizer
    loaders = create_data_loaders(cfg, tok, splits=(split,))
    loader = loaders[split]

    icfg = cfg.inference
    dcfg = DecodeConfig(
        max_length=max_length if max_length is not None else icfg.max_length,
        start_id=tok.start_token_id,
        end_id=tok.end_token_id,
        pad_id=tok.pad_token_id,
        temperature=temperature if temperature is not None else icfg.temperature,
        top_k=top_k if top_k is not None else icfg.top_k,
        top_p=top_p if top_p is not None else icfg.top_p,
        beam_size=beam_size if beam_size is not None else icfg.beam_size,
        length_penalty=length_penalty if length_penalty is not None else icfg.length_penalty,
        early_exit=early_exit if early_exit is not None else getattr(icfg, "early_exit", False),
        selective_beam_frac=getattr(icfg, "selective_beam_frac", 0.0),
    )

    if bucket_widths is None:
        bucket_widths = getattr(icfg, "bucket_widths", None)
    if bucket_widths and cfg.model.name == "cnn_lstm":
        return _evaluate_bucketed(
            pred, cfg, loader, dcfg, split, bucket_widths, max_batches, output_dir
        )

    all_preds, all_tgts, rows = [], [], []
    n_images = 0
    decode_s = 0.0
    first_batch_s = 0.0  # includes XLA compile; excluded from throughput
    first_batch_images = 0
    run = None
    rng = jax.random.PRNGKey(0)
    sample_offset = 0
    for bi, batch in enumerate(loader):
        if max_batches is not None and bi >= max_batches:
            break
        B = batch["images"].shape[0]
        if run is None:
            run = pred._decode_fn(B, dcfg)
        # n_valid is the GLOBAL count; this process's rows are n_valid_local
        # (equal on single-process runs).  Slice/count with the local number
        # — the global one would clamp silently and double-count images on
        # multi-host runs (the Trainer does the same, trainer.py n_valid_local).
        n_valid = int(batch.get("n_valid", B))
        n_local = int(batch.get("n_valid_local", n_valid))
        rng, sub = jax.random.split(rng)
        t0 = time.perf_counter()
        tokens = run(jax.numpy.asarray(batch["images"]), sub)
        pred_ids = trim_host(
            np.asarray(tokens)[:n_local], tok.end_token_id, tok.pad_token_id,
            start_id=tok.start_token_id,
        )
        if bi == 0:
            first_batch_s = time.perf_counter() - t0
            first_batch_images = n_local
        else:
            decode_s += time.perf_counter() - t0
        tgt_ids = trim_host(
            np.asarray(batch["formulas"])[:n_local, 1:],  # strip START
            tok.end_token_id,
            tok.pad_token_id,
        )
        all_preds.extend(pred_ids)
        all_tgts.extend(tgt_ids)
        ds = loader.dataset
        # Global sample index of this process's first row in the batch.
        row_base = sample_offset + loader.process_index * loader.local_batch_size
        for j in range(n_local):
            idx = row_base + j
            name = ds.samples[idx][0] if idx < len(ds.samples) and not loader.shuffle else None
            rows.append(
                {
                    "image": name,
                    "prediction": tok.decode(pred_ids[j]),
                    "reference": tok.decode(tgt_ids[j]),
                }
            )
        sample_offset += n_valid
        n_images += n_local

    return _finish(
        cfg, tok, split, all_preds, all_tgts, rows, n_images, decode_s,
        first_batch_s, first_batch_images, dcfg, output_dir,
    )


def _finish(cfg, tok, split, all_preds, all_tgts, rows, n_images, decode_s,
            first_batch_s, first_batch_images, dcfg, output_dir,
            bucketed: bool = False):
    quality = calculate_metrics(all_preds, all_tgts, cfg.evaluation.bleu_n)
    correct, total = token_list_accuracy(all_preds, all_tgts, tok.pad_token_id)
    result = {
        "split": split,
        "num_images": n_images,
        "bleu": quality["bleu"],
        "levenshtein": quality["levenshtein"],
        "token_accuracy": correct / total if total else 0.0,
        "decode_seconds": decode_s + first_batch_s,
        "compile_and_first_batch_seconds": first_batch_s,
        # Steady-state throughput: exclude the first batch (it carries the
        # XLA compile) and exactly its images.  With a single batch there is
        # no compile-free measurement — report the compile-inclusive number
        # and say so (it feeds RESULTS.json artifacts).
        "images_per_second": (
            (n_images - first_batch_images) / decode_s
            if decode_s > 0
            else n_images / max(first_batch_s, 1e-9)
        ),
        "images_per_second_includes_compile": decode_s <= 0,
        "bucketed": bucketed,
        "decode": {
            "beam_size": dcfg.beam_size,
            "temperature": dcfg.temperature,
            "top_k": dcfg.top_k,
            "top_p": dcfg.top_p,
            "length_penalty": dcfg.length_penalty,
            "selective_beam_frac": dcfg.selective_beam_frac,
            "max_length": dcfg.max_length,
        },
    }
    logger.info(
        "evaluate[%s]: %d images bleu %.4f lev %.4f acc %.4f (%.0f img/s)",
        split,
        n_images,
        result["bleu"],
        result["levenshtein"],
        result["token_accuracy"],
        result["images_per_second"],
    )
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "predictions.json"), "w") as f:
            json.dump({"metrics": result, "predictions": rows}, f, indent=2)
        logger.info("Wrote %s/predictions.json", output_dir)
    return result


def _evaluate_bucketed(pred, cfg, loader, dcfg, split, bucket_widths, max_batches, output_dir):
    """Aspect-bucketed evaluation: decode straight from the image files (the
    buckets need natural widths, which the fixed-canvas loader discards).
    Encoder cost scales with each image's bucket; outputs are identical to
    the fixed-canvas path (Predictor._predict_bucketed).  Throughput here
    includes the per-bucket compiles — scripts/bench_buckets.py measures the
    steady state."""
    tok = pred.tokenizer
    ds = loader.dataset
    n = len(ds.samples)
    if max_batches is not None:
        n = min(n, max_batches * loader.batch_size)
    paths = []
    for name, _ in ds.samples[:n]:
        p = os.path.join(ds.img_dir, name)
        if not os.path.exists(p) and not os.path.splitext(name)[1]:
            p += ".png"
        paths.append(p)
    t0 = time.perf_counter()
    pred_ids = pred.predict_batch(
        paths,
        beam_size=dcfg.beam_size,
        max_length=dcfg.max_length,
        temperature=dcfg.temperature,
        top_k=dcfg.top_k,
        top_p=dcfg.top_p,
        length_penalty=dcfg.length_penalty,
        early_exit=dcfg.early_exit,
        batch_size=loader.batch_size,
        return_ids=True,
        bucket_widths=bucket_widths,
        selective_beam_frac=dcfg.selective_beam_frac,
    )
    wall = time.perf_counter() - t0
    tgt_rows = np.stack([ds.token_ids(i) for i in range(n)])
    tgt_ids = trim_host(tgt_rows[:, 1:], tok.end_token_id, tok.pad_token_id)
    rows = [
        {
            "image": ds.samples[i][0],
            "prediction": tok.decode(pred_ids[i]),
            "reference": tok.decode(tgt_ids[i]),
        }
        for i in range(n)
    ]
    return _finish(
        cfg, tok, split, pred_ids, tgt_ids, rows, n, 0.0, wall, 0, dcfg,
        output_dir, bucketed=True,
    )
