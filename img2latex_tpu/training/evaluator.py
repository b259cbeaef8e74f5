"""Dataset evaluation: free-running decode over a split + metrics + artifacts.

Parity with ``img2latex evaluate`` (reference ``cli.py:315-518``): loads a
checkpoint into a predictor, decodes the chosen split with greedy/beam/
sampling, computes BLEU/Levenshtein/token accuracy over the whole split and
writes ``predictions/predictions.json`` under the experiment directory.

TPU-native: the eval loop feeds loader batches (uint8, static shapes)
straight into the predictor's compiled decode — images/sec here IS the
benchmark path (north star: >=5k img/s on v5e-8).  Two overlap mechanisms
keep it device-bound rather than host-bound:

* dispatch/fetch pipelining — batch *i* is dispatched, batch *i+1* is pulled
  from the loader (whose background thread preps it) and uploaded, and only
  then is batch *i*'s result fetched, so host prep + upload ride under the
  device decode;
* ``data.device_cache=true`` uploads the whole split ONCE (uint8 in HBM) and
  decodes from device-resident arrays — zero steady-state host->device
  traffic, the same recipe the Trainer uses (essential on link-bound hosts;
  see STATUS.md on the dev tunnel's upload cost).

Throughput accounting (round-2 review fix: the old ``decode_seconds`` /
``images_per_second`` pair used different inclusion rules and could point in
opposite directions, ``artifacts/mathtext_hard_grid/bucketed_eval.json``).
Every executable's FIRST call carries its XLA compile; steady-state numbers
exclude each first call and exactly its images, consistently:

* ``end_to_end_seconds``   — total wall: prep + upload + compile + decode + post
* ``decode_seconds``       — steady-state device dispatch + blocking wait only.
  NOTE: in the overlapped whole-split passes (r5) the fetch blocks only for
  transfer — the device compute rides under the host post of the previous
  pass — so decode_seconds there understates per-pass device time and
  ``images_per_second_resident`` is the honest steady rate.
* ``compile_and_first_batch_seconds`` — sum of first-call walls (one per executable)
* ``host_prep_seconds`` / ``host_post_seconds`` / ``input_wait_seconds`` /
  ``cache_build_seconds`` — host-side buckets (prep overlaps decode, so the
  buckets deliberately do NOT sum to the wall)
* ``images_per_second``    — steady END-TO-END: steady_images / (wall − compile)
* ``images_per_second_decode_only`` — steady_images / decode_seconds
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
    passes: int = 1,
) -> Dict[str, Any]:
    pred = predictor or Predictor.from_checkpoint(
        checkpoint_path, config_overrides=config_overrides
    )
    # Work on a copy: a caller-supplied predictor must come back with its
    # config untouched (data_dir/batch overrides here are per-evaluation).
    import copy

    cfg = copy.deepcopy(pred.cfg)
    if predictor is not None and config_overrides:
        # With a caller-supplied predictor the overrides can't ride the
        # checkpoint load — apply them to the evaluation's config copy
        # instead of silently ignoring them (same validation as the load
        # path).  Note model/hardware-shaping keys still can't change an
        # already-built predictor; data/inference keys are the intended use.
        from img2latex_tpu.config import set_by_path, validate_config

        for dotted, value in config_overrides.items():
            set_by_path(cfg, dotted, value)
        validate_config(cfg)
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
        selective_signal=getattr(icfg, "selective_signal", "logp"),
    )

    if bucket_widths is None:
        bucket_widths = getattr(icfg, "bucket_widths", None)
    if bucket_widths:
        # Both families bucket (CNN conv-stack seam; ResNet layer4 seam with
        # the receptive-field margin, Predictor.bucket_margin_px).  A margin
        # too wide for the canvas only disables individual buckets
        # (_assign_bucket), never silently un-buckets the whole run.
        return _evaluate_bucketed(
            pred, cfg, loader, dcfg, split, bucket_widths, max_batches,
            output_dir, passes,
        )

    stats: Dict[str, Any] = {}
    wall0 = time.perf_counter()

    # ---- optional split-in-HBM cache (data.device_cache) -----------------
    # Single upload of the whole split; the decode loop then reads
    # device-resident uint8 — no steady-state host->device transfers.
    # Guarded like the Trainer's cache: single-process only, and the split
    # must fit the HBM budget (explicit knob, else half the free HBM, else
    # a 2 GiB fallback on backends that report no stats) or we fall back to
    # the streaming loader instead of OOMing the device.
    use_cache = bool(getattr(cfg.data, "device_cache", False)) and (
        getattr(loader, "process_count", 1) == 1
    )
    if use_cache:
        h, w, c = cfg.image_shape
        n_rows = len(loader.dataset)
        if max_batches is not None:
            n_rows = min(n_rows, max_batches * loader.batch_size)
        est = n_rows * h * w * c
        knob = getattr(cfg.data, "device_cache_budget_gb", None)
        if knob:
            budget = int(knob * 1024**3)
        else:
            from img2latex_tpu.utils.device import free_device_memory_bytes

            free = free_device_memory_bytes()
            budget = int(free * 0.5) if free else 2 * 1024**3
        if est > budget:
            logger.warning(
                "data.device_cache: %s split would use %.2f GiB (> %.2f GiB "
                "budget); streaming from the host loader instead",
                split, est / 1024**3, budget / 1024**3,
            )
            use_cache = False
    if use_cache:
        t0 = time.perf_counter()
        cached = []
        host_imgs = []
        for bi, batch in enumerate(loader):
            if max_batches is not None and bi >= max_batches:
                break
            host_imgs.append(batch["images"])
            cached.append(dict(batch))
        big = None
        if cached:
            # ONE stacked upload instead of per-batch device_puts: each put
            # costs a full round trip on remoted backends (~25-30 ms on the
            # axon tunnel), so 64 batch puts burn ~2 s of pure RTT for the
            # same 420 MB.  Per-batch views are lazy device-side slices that
            # pipeline with the decode dispatches.
            big = jax.device_put(np.concatenate(host_imgs, axis=0))
            big.block_until_ready()
            del host_imgs
        if (
            big is not None
            and getattr(icfg, "whole_split", True)
            and all(b["images"].shape[0] == loader.batch_size for b in cached)
        ):
            # Whole-split resident decode: one lax.map program over every
            # cached batch — one dispatch + one fetch for the split instead
            # of 2 host round trips per batch (round-3 verdict weak #1).
            stats["cache_build_s"] = time.perf_counter() - t0
            try:
                return _evaluate_whole_split(
                    pred, cfg, tok, split, loader, cached, big, dcfg, stats,
                    wall0, output_dir, passes,
                )
            except jax.errors.JaxRuntimeError as e:
                # Availability over the fast path: some shapes can't compile
                # the nested lax.map program (measured r5: hidden-640 grid
                # kernels scoped-VMEM-OOM at the auto tile inside the
                # whole-split nesting while the SAME kernel compiles
                # per-batch).  Fall back to the per-batch device-cached
                # loop — slower (2 RTTs/batch on remoted backends), same
                # outputs.
                logger.warning(
                    "whole-split program failed to build (%s); falling back "
                    "to the per-batch device-cached loop. Hint: "
                    "IMG2LATEX_VMEM_BUDGET_MB=48 shrinks the kernel tile "
                    "and restores the whole-split path on wide-hidden grid "
                    "models.", str(e).splitlines()[0] if str(e) else e,
                )
        if cached:
            off = 0
            for b in cached:
                n = b["images"].shape[0]
                b["_images_dev"] = big[off : off + n]
                off += n
        stats["cache_build_s"] = time.perf_counter() - t0
        batch_iter: Any = enumerate(cached)
    else:
        batch_iter = enumerate(loader)

    all_preds, all_tgts, rows = [], [], []
    n_images = 0
    run = None
    # One up-front split for every batch: a per-batch jax.random.split is a
    # tiny device program whose dispatch costs ~2 RTTs per batch on remoted
    # backends (the axon tunnel) — measured as seconds of untracked loop
    # time at 8k-image scale.
    n_b = len(cached) if use_cache else len(loader)
    if max_batches is not None:
        n_b = min(n_b, max_batches)
    keys = list(jax.random.split(jax.random.PRNGKey(0), max(n_b, 1)))
    sample_offset = 0
    ds = loader.dataset
    pending = None  # (tokens_dev, n_local, row_base) awaiting fetch
    seen_exec = False
    t_post = 0.0

    def _collect(p) -> None:
        nonlocal t_post, seen_exec
        tokens_dev, n_local, row_base, dispatch_wall = p
        t0 = time.perf_counter()
        tokens = np.asarray(tokens_dev)
        dt = time.perf_counter() - t0
        if not seen_exec:
            stats.setdefault("first_calls", []).append(
                {"exec": "decode", "seconds": dt + dispatch_wall, "images": n_local}
            )
            seen_exec = True
        else:
            stats["fetch_s"] = stats.get("fetch_s", 0.0) + dt
            stats["steady_images"] = stats.get("steady_images", 0) + n_local
        t1 = time.perf_counter()
        pred_ids = trim_host(
            tokens[:n_local], tok.end_token_id, tok.pad_token_id,
            start_id=tok.start_token_id,
        )
        all_preds.extend(pred_ids)
        pred_strs = tok.decode_rows(pred_ids)
        for j in range(n_local):
            idx = row_base + j
            name = ds.samples[idx][0] if idx < len(ds.samples) and not loader.shuffle else None
            rows.append({"image": name, "prediction": pred_strs[j]})
        t_post += time.perf_counter() - t1

    # NOTE on first-call accounting: the first dispatch's wall is folded into
    # its fetch (JAX compiles at first execution; with async dispatch the
    # block lands in np.asarray), so first_calls[0] = dispatch + fetch walls
    # of batch 0 and steady dispatch_s starts at batch 1.
    t_input0 = time.perf_counter()
    for bi, batch in batch_iter:
        stats["input_wait_s"] = stats.get("input_wait_s", 0.0) + (
            time.perf_counter() - t_input0
        )
        if max_batches is not None and bi >= max_batches:
            break
        B = batch["images"].shape[0]
        if run is None:
            # One-time: builds the decode callable — packs the decoder
            # weights (host work + device uploads), so it costs real
            # seconds on remoted backends.  Tracked as setup_seconds, NOT
            # left to leak into the steady window unattributed.
            t_setup = time.perf_counter()
            run = pred._decode_fn(B, dcfg)
            stats["setup_s"] = time.perf_counter() - t_setup
        # n_valid is the GLOBAL count; this process's rows are n_valid_local
        # (equal on single-process runs).  Slice/count with the local number
        # — the global one would clamp silently and double-count images on
        # multi-host runs (the Trainer does the same, trainer.py n_valid_local).
        n_valid = int(batch.get("n_valid", B))
        n_local = int(batch.get("n_valid_local", n_valid))
        sub = keys[bi % len(keys)]
        t0 = time.perf_counter()
        images = batch.get("_images_dev")
        if images is None:
            images = jax.numpy.asarray(batch["images"])
        tokens = run(images, sub)
        t_dispatch = time.perf_counter() - t0
        if seen_exec or pending is not None:
            stats["dispatch_s"] = stats.get("dispatch_s", 0.0) + t_dispatch
            t_dispatch = 0.0
        # Targets trim on host while the device decodes.
        t1 = time.perf_counter()
        tgt_ids = trim_host(
            np.asarray(batch["formulas"])[:n_local, 1:],  # strip START
            tok.end_token_id,
            tok.pad_token_id,
        )
        all_tgts.extend(tgt_ids)
        t_post += time.perf_counter() - t1
        row_base = sample_offset + loader.process_index * loader.local_batch_size
        if pending is not None:
            _collect(pending)
        pending = (tokens, n_local, row_base, t_dispatch)
        sample_offset += n_valid
        n_images += n_local
        t_input0 = time.perf_counter()
    if pending is not None:
        _collect(pending)
    stats["post_s"] = stats.get("post_s", 0.0) + t_post
    # references join their rows only now (rows were built per fetched batch)
    for r, ref in zip(rows, tok.decode_rows(all_tgts)):
        r["reference"] = ref

    wall = time.perf_counter() - wall0
    return _finish(
        cfg, tok, split, all_preds, all_tgts, rows, n_images, stats, wall,
        dcfg, output_dir,
    )


def _evaluate_whole_split(pred, cfg, tok, split, loader, cached, big, dcfg,
                          stats, wall0, output_dir, passes):
    """Whole-split resident decode: ONE jitted program ``lax.map``s the
    per-batch decode over every device-cached batch
    (``Predictor._decode_split_fn``), so the split costs one dispatch and
    one fetch regardless of batch count.  Replaces the per-batch loop's
    2-RTT/batch floor on remoted backends — round-3 verdict weak #1: at
    b1024 the loop sustained 2,932 img/s resident against 15,426 decode-only
    with the difference being host round trips the tunnel charges per batch.

    ``passes``: decode passes.  1 (product default) = decode once; that call
    carries the XLA compile, so only a compile-inclusive rate exists
    (``images_per_second_includes_compile``).  >=2 re-dispatches the now-
    compiled program and times it alone — the resident regime (split in HBM,
    executable built), populating ``decode_seconds`` /
    ``images_per_second_resident`` with measured walls instead of estimates.
    Tokens are taken from the last pass (identical across passes for
    deterministic decodes)."""
    B = loader.batch_size
    n_b = len(cached)
    t_setup = time.perf_counter()
    run = pred._decode_split_fn(n_b, B, dcfg)
    keys = jax.random.split(jax.random.PRNGKey(0), max(n_b, 1))
    images_all = big.reshape((n_b, B) + big.shape[1:])
    # Targets are split-dependent, not decode-dependent: trim + detokenize
    # them once with the other one-time split preparation (a repeated eval
    # of a cached split reuses them like it reuses the uploaded canvases),
    # keeping the per-pass window to prediction post-processing only.
    tgt_ids_batches, tgt_str_batches = [], []
    for b in cached:
        n_local = int(b.get("n_valid_local", b.get("n_valid", B)))
        t_ids = trim_host(
            np.asarray(b["formulas"])[:n_local, 1:],  # strip START
            tok.end_token_id, tok.pad_token_id,
        )
        tgt_ids_batches.append(t_ids)
        tgt_str_batches.append(tok.decode_rows(t_ids))
    stats["setup_s"] = time.perf_counter() - t_setup

    n_images = sum(
        int(b.get("n_valid_local", b.get("n_valid", B))) for b in cached
    )
    ds = loader.dataset

    def _post(toks_np):
        """Full per-pass host post-processing: trim, detokenize, rows.
        This is exactly what a repeated eval / long-lived server pays per
        request, so the steady passes below run it per pass (overlapped
        under the next pass's device decode, not once at the end)."""
        all_preds, all_tgts, rows = [], [], []
        sample_offset = 0
        for bi, b in enumerate(cached):
            n_local = int(b.get("n_valid_local", b.get("n_valid", B)))
            pred_ids = trim_host(
                toks_np[bi, :n_local], tok.end_token_id, tok.pad_token_id,
                start_id=tok.start_token_id,
            )
            tgt_ids = tgt_ids_batches[bi]
            all_preds.extend(pred_ids)
            all_tgts.extend(tgt_ids)
            pred_strs = tok.decode_rows(pred_ids)
            tgt_strs = tgt_str_batches[bi]
            for j in range(n_local):
                idx = sample_offset + j
                name = (
                    ds.samples[idx][0]
                    if idx < len(ds.samples) and not loader.shuffle
                    else None
                )
                rows.append({
                    "image": name,
                    "prediction": pred_strs[j],
                    "reference": tgt_strs[j],
                })
            sample_offset += int(b.get("n_valid", B))
        return all_preds, all_tgts, rows

    t0 = time.perf_counter()
    toks_np = np.asarray(run(images_all, keys))  # blocks: compile+decode+fetch
    first_wall = time.perf_counter() - t0
    stats["first_calls"] = [{
        "exec": f"whole_split_decode[{n_b}x{B}]",
        "seconds": first_wall,
        "images": n_images,
    }]
    # Steady passes pipeline host post against device decode (round-4 verdict
    # weak #7: resident trailed decode-only 1.47x and the residual was the
    # per-pass host post).  JAX dispatch is asynchronous, so pass N+1 is
    # dispatched FIRST, pass N's tokens are post-processed on the host while
    # the device decodes, and only then is pass N+1 fetched (np.asarray
    # blocks).  Per-pass steady cost becomes ~max(device decode, host post)
    # instead of their sum; the last pass's post is the pipeline drain — one
    # constant exposed post per eval, amortized over the steady passes.
    posted = None
    for _ in range(max(passes, 1) - 1):
        t0 = time.perf_counter()
        fut = run(images_all, keys)  # async dispatch of the next pass
        stats["dispatch_s"] = stats.get("dispatch_s", 0.0) + (
            time.perf_counter() - t0
        )
        t1 = time.perf_counter()
        posted = _post(toks_np)  # rides under the device decode
        stats["post_s"] = stats.get("post_s", 0.0) + (time.perf_counter() - t1)
        t2 = time.perf_counter()
        toks_np = np.asarray(fut)
        stats["fetch_s"] = stats.get("fetch_s", 0.0) + (time.perf_counter() - t2)
        stats["steady_images"] = stats.get("steady_images", 0) + n_images
    # Drain: the final pass's tokens still need their post (identical output
    # for deterministic decodes, but the timing contract runs it for real).
    t1 = time.perf_counter()
    all_preds, all_tgts, rows = _post(toks_np)
    stats["post_s"] = stats.get("post_s", 0.0) + (time.perf_counter() - t1)
    del posted
    wall = time.perf_counter() - wall0
    return _finish(
        cfg, tok, split, all_preds, all_tgts, rows, n_images, stats, wall,
        dcfg, output_dir,
        extra_fields={"whole_split": True, "decode_passes": max(passes, 1)},
    )


def _finish(cfg, tok, split, all_preds, all_tgts, rows, n_images, stats,
            wall_s, dcfg, output_dir, bucketed: bool = False,
            extra_fields: Optional[Dict[str, Any]] = None):
    quality = calculate_metrics(all_preds, all_tgts, cfg.evaluation.bleu_n)
    correct, total = token_list_accuracy(all_preds, all_tgts, tok.pad_token_id)
    first_calls = stats.get("first_calls", [])
    compile_s = sum(f["seconds"] for f in first_calls)
    steady_images = int(stats.get("steady_images", 0))
    decode_s = stats.get("dispatch_s", 0.0) + stats.get("fetch_s", 0.0)
    steady_wall = max(wall_s - compile_s, 0.0)
    if steady_images > 0 and steady_wall > 0 and decode_s > 0:
        ips = steady_images / steady_wall
        ips_decode = steady_images / decode_s
        includes_compile = False
    else:
        # Single batch (or single executable call): no compile-free
        # measurement exists — report the compile-inclusive rate and say so.
        ips = n_images / max(wall_s, 1e-9)
        ips_decode = ips
        includes_compile = True
    result = {
        "split": split,
        "num_images": n_images,
        "bleu": quality["bleu"],
        "levenshtein": quality["levenshtein"],
        "token_accuracy": correct / total if total else 0.0,
        # ---- throughput accounting (see module docstring) ----------------
        # ONE inclusion rule for both throughput fields: each executable's
        # first call (XLA compile) and exactly its images are excluded, so
        # the two rates always agree in direction; prep/post overlap decode,
        # so the host buckets do not sum to the wall.
        "end_to_end_seconds": wall_s,
        "decode_seconds": decode_s,
        "compile_and_first_batch_seconds": compile_s,
        "host_prep_seconds": stats.get("prep_s", 0.0) + stats.get("bucket_assign_s", 0.0),
        "host_post_seconds": stats.get("post_s", 0.0),
        "input_wait_seconds": stats.get("input_wait_s", 0.0),
        "cache_build_seconds": stats.get("cache_build_s", 0.0),
        # Wall time no bucket claims: per-batch python bookkeeping plus, on
        # remoted backends, dispatch-side RTTs.  Kept explicit so a growing
        # gap is visible in the artifact instead of silently inflating
        # images_per_second's denominator.
        "setup_seconds": stats.get("setup_s", 0.0),
        "host_other_seconds": max(
            wall_s
            - compile_s
            - stats.get("setup_s", 0.0)
            - stats.get("cache_build_s", 0.0)
            - (stats.get("dispatch_s", 0.0) + stats.get("fetch_s", 0.0))
            - stats.get("post_s", 0.0)
            - stats.get("prep_s", 0.0)
            - stats.get("bucket_assign_s", 0.0)
            - stats.get("input_wait_s", 0.0),
            0.0,
        ),
        "steady_images": steady_images,
        "images_per_second": ips,
        "images_per_second_decode_only": ips_decode,
        # The repeated-eval / serving regime: split already device-resident
        # and the decode callable already built — what a second evaluate of
        # the same split (or a long-lived server) sustains.  Excludes the
        # one-time cache upload + setup on top of the compile exclusion.
        "images_per_second_resident": (
            steady_images / max(
                steady_wall - stats.get("cache_build_s", 0.0) - stats.get("setup_s", 0.0),
                1e-9,
            )
            if steady_images > 0 and steady_wall > 0
            else ips
        ),
        "images_per_second_includes_compile": includes_compile,
        "accounting": (
            "images_per_second = steady end-to-end: (num_images - first-call "
            "images) / (end_to_end_seconds - compile_and_first_batch_seconds); "
            "images_per_second_decode_only divides the same images by "
            "decode_seconds (device dispatch + blocking wait only); "
            "images_per_second_resident additionally excludes the one-time "
            "cache_build_seconds + setup_seconds (the repeated-eval regime)"
        ),
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
    if extra_fields:
        result.update(extra_fields)
    logger.info(
        "evaluate[%s]: %d images bleu %.4f lev %.4f acc %.4f "
        "(%.0f img/s end-to-end, %.0f img/s decode-only%s)",
        split,
        n_images,
        result["bleu"],
        result["levenshtein"],
        result["token_accuracy"],
        result["images_per_second"],
        result["images_per_second_decode_only"],
        " incl. compile" if includes_compile else "",
    )
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "predictions.json"), "w") as f:
            json.dump({"metrics": result, "predictions": rows}, f, indent=2)
        logger.info("Wrote %s/predictions.json", output_dir)
    return result


def _evaluate_bucketed(pred, cfg, loader, dcfg, split, bucket_widths,
                       max_batches, output_dir, passes: int = 1):
    """Aspect-bucketed evaluation: decode straight from the image files (the
    buckets need natural widths, which the fixed-canvas loader discards).
    Encoder cost scales with each image's bucket; outputs are identical to
    the fixed-canvas path (Predictor._predict_bucketed).

    Two execution shapes, chosen by the same knobs as the unbucketed path:

    * streaming (default): chunked ``predict_batch`` — host prep pipelines
      against device decode, per-bucket-width compiles excluded from
      steady-state via the shared stats contract;
    * resident (``data.device_cache`` + ``inference.whole_split``): one
      whole-split ``lax.map`` program PER BUCKET over the bucket's uploaded
      canvases (``Predictor.predict_split_bucketed``) — one dispatch + one
      fetch per bucket instead of 2 RTTs per batch (round-4 verdict #6:
      bucketed shapes are per-bucket, so whole-split becomes per-bucket
      whole-split)."""
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
    stats: Dict[str, Any] = {}
    use_split = bool(getattr(cfg.data, "device_cache", False)) and getattr(
        cfg.inference, "whole_split", True
    ) and getattr(loader, "process_count", 1) == 1
    t0 = time.perf_counter()
    if use_split:
        try:
            pred_ids = pred.predict_split_bucketed(
                paths, dcfg, loader.batch_size, bucket_widths,
                passes=passes, stats=stats,
            )
        except jax.errors.JaxRuntimeError as e:
            # Same availability fallback as the unbucketed whole-split path
            # (wide-hidden grid kernels can scoped-VMEM-OOM inside the
            # nested lax.map): degrade to the streaming chunked path.
            logger.warning(
                "per-bucket whole-split failed to build (%s); falling back "
                "to the streaming bucketed path. Hint: "
                "IMG2LATEX_VMEM_BUDGET_MB=48 shrinks the kernel tile.",
                str(e).splitlines()[0] if str(e) else e,
            )
            use_split = False
            stats = {}
            t0 = time.perf_counter()
    if not use_split:
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
            stats=stats,
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
        cfg, tok, split, pred_ids, tgt_ids, rows, n, stats, wall, dcfg,
        output_dir, bucketed=True,
        extra_fields=(
            {"whole_split": True, "decode_passes": max(passes, 1)}
            if use_split else None
        ),
    )
