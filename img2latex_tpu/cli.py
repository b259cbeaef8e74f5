"""Command-line interface: train / predict / evaluate / visualize / analyze.

Same command surface as the reference typer app (``img2latex/cli.py:62-697``):
``train``, ``predict``, ``evaluate``, ``visualize``, ``debug-logs`` and the
seven ``analyze`` sub-commands (images, project, curves, tokens, errors,
preprocess, metrics) plus the report-figure and prediction-visualization
tools.  Built on argparse (typer is not a hard dependency of this package);
every command takes ``--config`` plus targeted overrides exactly like the
reference's per-command typer options (``cli.py:130-148``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Any, Dict, List, Optional

from img2latex_tpu.config import Config, load_config
from img2latex_tpu.utils.logging import configure_logging, get_logger, log_execution_params

logger = get_logger(__name__)


# ---------------------------------------------------------------------------
# Helpers
# ---------------------------------------------------------------------------


def _common_config_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--config", "-c", default=None, help="YAML config path")
    p.add_argument("--data-dir", default=None, help="Override data.data_dir")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="Dotted config override, e.g. training.learning_rate=3e-4")


def _parse_overrides(args: argparse.Namespace, extra: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    overrides: Dict[str, Any] = {}
    if getattr(args, "data_dir", None):
        overrides["data.data_dir"] = args.data_dir
    for item in getattr(args, "set", []):
        if "=" not in item:
            raise SystemExit(f"--set expects KEY=VALUE, got {item!r}")
        key, raw = item.split("=", 1)
        try:
            value = json.loads(raw)
        except json.JSONDecodeError:
            value = raw
        overrides[key.strip()] = value
    for k, v in (extra or {}).items():
        if v is not None:
            overrides[k] = v
    return overrides


def _load_cfg(args: argparse.Namespace, extra: Optional[Dict[str, Any]] = None) -> Config:
    return load_config(args.config, _parse_overrides(args, extra))


def set_seed(seed: int) -> None:
    """Cross-library seeding (reference ``mps_utils.py:200-251,374-377``).
    JAX randomness is functional (explicit PRNGKey threading), so only the
    host-side libraries need global seeds."""
    import random

    import numpy as np

    random.seed(seed)
    np.random.seed(seed)


# ---------------------------------------------------------------------------
# train
# ---------------------------------------------------------------------------


def cmd_train(args: argparse.Namespace) -> int:
    from img2latex_tpu.data.pipeline import create_data_loaders
    from img2latex_tpu.data.tokenizer import LaTeXTokenizer
    from img2latex_tpu.training.trainer import Trainer
    from img2latex_tpu.utils.paths import PathManager
    from img2latex_tpu.utils.registry import ExperimentRegistry

    cfg = _load_cfg(
        args,
        {
            "training.experiment_name": args.experiment_name,
            "training.epochs": args.epochs,
            "data.batch_size": args.batch_size,
            "training.learning_rate": args.learning_rate,
            "model.name": args.model,
        },
    )
    set_seed(cfg.training.seed)
    from img2latex_tpu.parallel.distributed import is_primary_host, maybe_initialize_distributed

    maybe_initialize_distributed()
    paths = PathManager(args.output_dir)
    registry = ExperimentRegistry(paths)
    if is_primary_host():
        exp_name = registry.register_experiment(
            cfg.training.experiment_name,
            description=f"{cfg.model.name} via CLI",
            config_path=args.config,
            auto_version=True,
        )
        dirs = paths.create_experiment_structure(exp_name)
        configure_logging(cfg, log_dir=str(dirs["logs"]), experiment_name=exp_name)
        cfg.to_yaml(paths.experiment_dir(exp_name) / "config.yaml")
    else:
        # Multi-host: only the primary touches the shared registry/experiment
        # tree — auto-versioning from every host would fork the run into
        # per-host experiment names and race the registry JSON.  The Trainer
        # gates all its writes on the primary; non-primaries log to console.
        exp_name = cfg.training.experiment_name
        configure_logging(cfg)
    log_execution_params(logger, {"command": "train", "experiment": exp_name,
                                  "model": cfg.model.name, "data_dir": cfg.data.data_dir})

    tokenizer = LaTeXTokenizer(max_sequence_length=cfg.data.max_seq_length)
    formulas_path = os.path.join(cfg.data.data_dir, cfg.data.formulas_file)
    tokenizer.fit_on_formulas_file(formulas_path)
    if is_primary_host():
        tokenizer.save(str(paths.experiment_dir(exp_name) / "tokenizer.json"))

    loaders = create_data_loaders(cfg, tokenizer)
    trainer = Trainer(
        cfg, tokenizer, loaders, paths=paths, registry=registry, experiment_name=exp_name
    )
    if args.checkpoint_path:
        trainer.load_checkpoint(args.checkpoint_path)
    result = trainer.train()
    logger.info(
        "Training done: %d epochs, best val loss %.4f%s",
        result["epochs_run"],
        result["best_val_loss"],
        " (early stop)" if result["stopped_early"] else "",
    )
    return 0


# ---------------------------------------------------------------------------
# predict
# ---------------------------------------------------------------------------


def cmd_predict(args: argparse.Namespace) -> int:
    from img2latex_tpu.training.predictor import Predictor

    # Expand: each positional may be a file or a directory of images.
    images: List[str] = []
    for item in args.image:
        if os.path.isdir(item):
            images += sorted(
                os.path.join(item, f)
                for f in os.listdir(item)
                if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".gif"))
            )
        else:
            images.append(item)
    if not images:
        raise SystemExit("No images found")
    if getattr(args, "exported", False):
        # CHECKPOINT is a `img2latex-tpu export` directory: decode settings
        # are baked into the serialized executables, so the tuning flags
        # cannot apply — reject them instead of silently ignoring.
        baked = {
            "beam_size": args.beam_size, "max_length": args.max_length,
            "temperature": args.temperature, "top_k": args.top_k,
            "top_p": args.top_p, "length_penalty": args.length_penalty,
            "early_exit": args.early_exit,
        }
        stray = [k for k, v in baked.items() if v is not None]
        if stray or args.set:
            raise SystemExit(
                f"--exported artifacts bake their decode config; remove "
                f"{stray + (['--set'] if args.set else [])} or re-export"
            )
        from img2latex_tpu.export import ExportedPredictor

        exported = ExportedPredictor.load(args.checkpoint)
        log_execution_params(
            logger,
            {"command": "predict", "exported": args.checkpoint, "images": len(images)},
        )
        # --batch-size stays live on the artifact path: it is a runtime
        # chunk cap (exact chunk shape for --symbolic-batch artifacts,
        # clamped to the exported sizes for fixed-batch ones), not a baked
        # decode setting.
        results = exported.predict_batch(images, batch_size=args.batch_size)
        rows = [{"image": img, "prediction": latex} for img, latex in zip(images, results)]
        if args.output:
            os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
            with open(args.output, "w") as f:
                json.dump({"predictions": rows}, f, indent=2)
            print(f"Wrote {len(rows)} predictions to {args.output}")
        elif len(images) == 1:
            print(results[0])
        else:
            for row in rows:
                print(f"{row['image']}\t{row['prediction']}")
        return 0
    predictor = Predictor.from_checkpoint(
        args.checkpoint, batch_size=args.batch_size or 16,
        config_overrides=_parse_overrides(args),
    )
    log_execution_params(
        logger,
        {"command": "predict", "checkpoint": args.checkpoint, "images": len(images),
         "beam_size": args.beam_size},
    )
    options = dict(
        beam_size=args.beam_size,
        max_length=args.max_length,
        temperature=args.temperature,
        top_k=args.top_k,
        top_p=args.top_p,
        length_penalty=args.length_penalty,
        early_exit=args.early_exit,
    )
    if len(images) == 1 and not args.output:
        print(predictor.predict(images[0], **options))
        return 0
    results = predictor.predict_batch(images, **options)
    rows = [{"image": img, "prediction": latex} for img, latex in zip(images, results)]
    if args.output:
        os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
        with open(args.output, "w") as f:
            json.dump({"predictions": rows}, f, indent=2)
        print(f"Wrote {len(rows)} predictions to {args.output}")
    else:
        for row in rows:
            print(f"{row['image']}\t{row['prediction']}")
    return 0


# ---------------------------------------------------------------------------
# export
# ---------------------------------------------------------------------------


def cmd_export(args: argparse.Namespace) -> int:
    from img2latex_tpu.export import export_checkpoint

    try:
        batch_sizes = [int(b) for b in args.batch_sizes.split(",") if b.strip()]
    except ValueError:
        raise SystemExit(f"--batch-sizes must be a comma list of ints, got {args.batch_sizes!r}")
    try:
        bucket_widths = (
            [int(b) for b in args.bucket_widths.split(",") if b.strip()]
            if args.bucket_widths
            else None
        )
    except ValueError:
        raise SystemExit(
            f"--bucket-widths must be a comma list of ints, got {args.bucket_widths!r}"
        )
    platforms = (
        [p.strip() for p in args.platforms.split(",") if p.strip()]
        if args.platforms
        else None
    )
    log_execution_params(
        logger,
        {"command": "export", "checkpoint": args.checkpoint, "output": args.output,
         "batch_sizes": batch_sizes, "platforms": platforms},
    )
    manifest = export_checkpoint(
        args.checkpoint,
        args.output,
        batch_sizes=batch_sizes,
        beam_size=args.beam_size,
        max_length=args.max_length,
        temperature=args.temperature,
        top_k=args.top_k,
        top_p=args.top_p,
        length_penalty=args.length_penalty,
        selective_beam_frac=args.selective_beam_frac,
        platforms=platforms,
        config_overrides=_parse_overrides(args),
        symbolic_batch=args.symbolic_batch,
        bucket_widths=bucket_widths,
    )
    batches = "any (symbolic)" if manifest["symbolic_batch"] else manifest["batch_sizes"]
    print(
        f"Exported {args.checkpoint} -> {args.output} "
        f"(batches {batches}, platforms {manifest['platforms']}, "
        f"beam {manifest['decode']['beam_size']})"
    )
    return 0


# ---------------------------------------------------------------------------
# evaluate
# ---------------------------------------------------------------------------


def cmd_evaluate(args: argparse.Namespace) -> int:
    from img2latex_tpu.training.evaluator import evaluate_checkpoint
    from img2latex_tpu.utils.paths import PathManager

    output_dir = args.output_dir
    if output_dir is None:
        # Infer the experiment dir from the checkpoint path (reference
        # cli.py:339-350) and write under its predictions/.
        probe = os.path.abspath(args.checkpoint)
        while probe and os.path.basename(probe) not in ("", "/"):
            if os.path.basename(os.path.dirname(probe)) == "outputs":
                output_dir = os.path.join(probe, "predictions")
                break
            probe = os.path.dirname(probe)
    overrides = _parse_overrides(args)
    # --set data.data_dir=... is the same override surface as the flags;
    # route it through the data_dir parameter (the loader reads the copied
    # config, so leaving it in config_overrides would also work, but the
    # positional/flag forms take precedence and must compose predictably).
    set_data_dir = overrides.pop("data.data_dir", None)
    if getattr(args, "selective_frac", None) is not None:
        # Rides the config-override surface: evaluate_checkpoint reads
        # inference.selective_beam_frac from the (overridden) config.
        overrides["inference.selective_beam_frac"] = args.selective_frac
    result = evaluate_checkpoint(
        args.checkpoint,
        data_dir=args.data_dir or getattr(args, "data_dir_opt", None) or set_data_dir,
        split=args.split,
        beam_size=args.beam_size,
        max_length=args.max_length,
        temperature=args.temperature,
        top_k=args.top_k,
        top_p=args.top_p,
        length_penalty=args.length_penalty,
        early_exit=args.early_exit,
        batch_size=args.batch_size,
        max_batches=args.max_batches,
        output_dir=output_dir,
        config_overrides=overrides,
    )
    print(json.dumps(result, indent=2))
    return 0


# ---------------------------------------------------------------------------
# visualize / debug-logs
# ---------------------------------------------------------------------------


def cmd_prime(args: argparse.Namespace) -> int:
    """Pre-compile decode executables into the persistent compilation cache
    (cold-start mitigation: a later evaluate/serve/predict with the same
    hardware.compilation_cache_dir starts at warm-deserialize cost instead
    of a full XLA compile — see training/prime.py)."""
    from img2latex_tpu.training.prime import prime_checkpoint

    report = prime_checkpoint(
        args.checkpoint,
        batch_sizes=[int(b) for b in args.batch_sizes.split(",") if b],
        beam_size=args.beam_size,
        length_penalty=args.length_penalty,
        selective_frac=args.selective_frac,
        temperature=args.temperature,
        top_k=args.top_k,
        top_p=args.top_p,
        bucket_widths=(
            [int(b) for b in args.buckets.split(",") if b] if args.buckets else None
        ),
        split_batches=args.split_batches,
        split_batch_size=args.split_batch_size,
        config_overrides=_parse_overrides(args),
    )
    print(json.dumps(report, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    return 0


def cmd_serve(args: argparse.Namespace) -> int:
    """Dynamic-batching HTTP inference server (no reference equivalent)."""
    from img2latex_tpu.serving_http import serve

    serve(
        args.checkpoint,
        host=args.host,
        port=args.port,
        batch_size=args.batch_size,
        max_wait_ms=args.max_wait_ms,
        config_overrides=_parse_overrides(args),
        exported=getattr(args, "exported", False),
    )
    return 0


def cmd_visualize(args: argparse.Namespace) -> int:
    from img2latex_tpu.utils.visualize_metrics import visualize_experiment_metrics

    return visualize_experiment_metrics(
        experiment=args.experiment,
        output_dir=args.output_dir,
        metric=args.metric,
        show_samples=not args.no_samples,
    )


def cmd_debug_logs(args: argparse.Namespace) -> int:
    """Logger diagnostics (reference ``cli.py:591`` + ``logging.py:304-435``)."""
    import logging as pylogging

    from img2latex_tpu.utils.paths import PathManager

    paths = PathManager(args.output_dir)
    root = pylogging.getLogger("img2latex_tpu")
    print(f"root logger level: {pylogging.getLevelName(root.level)}")
    for h in root.handlers:
        print(f"handler: {type(h).__name__} -> {getattr(h, 'baseFilename', 'stderr')}")
    if args.experiment:
        log_dir = paths.get_dir(args.experiment, "logs")
        for f in sorted(log_dir.glob("*.log")):
            print(f"{f} ({f.stat().st_size} bytes)")
            if args.tail:
                lines = f.read_text(errors="replace").splitlines()[-args.tail :]
                print("\n".join("  " + ln for ln in lines))
    return 0


# ---------------------------------------------------------------------------
# analyze sub-apps
# ---------------------------------------------------------------------------


def cmd_analyze(args: argparse.Namespace) -> int:
    tool = args.tool
    if tool == "images":
        from img2latex_tpu.analysis.images import analyze_images_cmd

        return analyze_images_cmd(args)
    if tool == "project":
        from img2latex_tpu.analysis.project import analyze_project_cmd

        return analyze_project_cmd(args)
    if tool == "curves":
        from img2latex_tpu.analysis.curves import plot_curves_cmd

        return plot_curves_cmd(args)
    if tool == "tokens":
        from img2latex_tpu.analysis.tokens import analyze_tokens_cmd

        return analyze_tokens_cmd(args)
    if tool == "errors":
        from img2latex_tpu.analysis.errors import analyze_errors_cmd

        return analyze_errors_cmd(args)
    if tool == "preprocess":
        from img2latex_tpu.analysis.preprocess import visualize_preprocess_cmd

        return visualize_preprocess_cmd(args)
    if tool == "metrics":
        from img2latex_tpu.analysis.metrics import metrics_cmd

        return metrics_cmd(args)
    if tool == "report":
        from img2latex_tpu.analysis.report_figures import generate_cmd

        return generate_cmd(args)
    if tool == "predictions":
        from img2latex_tpu.analysis.visualize_predictions import visualize_cmd

        return visualize_cmd(args)
    if tool == "site":
        from img2latex_tpu.analysis.site import site_cmd

        return site_cmd(args)
    raise SystemExit(f"Unknown analyze tool: {tool}")


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="img2latex-tpu",
        description="TPU-native image-to-LaTeX: train, predict, evaluate, analyze.",
    )
    sub = p.add_subparsers(dest="command", required=True)

    # train
    t = sub.add_parser("train", help="Train a model")
    _common_config_args(t)
    t.add_argument("--experiment-name", default=None)
    t.add_argument("--model", default=None, choices=[None, "cnn_lstm", "resnet_lstm"])
    t.add_argument("--epochs", type=int, default=None)
    t.add_argument("--batch-size", type=int, default=None)
    t.add_argument("--learning-rate", type=float, default=None)
    t.add_argument("--checkpoint-path", default=None, help="Resume from checkpoint")
    t.add_argument("--output-dir", default=None, help="Project root for outputs/")
    t.set_defaults(func=cmd_train)

    # predict
    pr = sub.add_parser("predict", help="Predict LaTeX for images (files or directories)")
    pr.add_argument("checkpoint")
    pr.add_argument("image", nargs="+", help="Image file(s) and/or director(ies)")
    pr.add_argument("--beam-size", type=int, default=None)
    pr.add_argument("--max-length", type=int, default=None)
    pr.add_argument("--temperature", type=float, default=None)
    pr.add_argument("--top-k", type=int, default=None)
    pr.add_argument("--top-p", type=float, default=None)
    pr.add_argument("--early-exit", action="store_true", default=None,
                    help="Stop decoding when every sequence emitted END "
                         "(the reference's early break; output-identical)")
    pr.add_argument("--length-penalty", type=float, default=None,
                    help="Beam length-normalization exponent")
    pr.add_argument("--batch-size", type=int, default=None,
                    help="Decode chunk size (live default 16; exported "
                         "artifacts default to their largest exported batch)")
    pr.add_argument("--output", "-o", default=None, help="Write predictions JSON here")
    pr.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                    help="Dotted override applied to the checkpoint's config, "
                         "e.g. hardware.int8_encoder=true")
    pr.add_argument("--exported", action="store_true",
                    help="CHECKPOINT is an `img2latex-tpu export` artifact "
                         "directory (decode settings are baked in)")
    pr.set_defaults(func=cmd_predict)

    # export
    ex = sub.add_parser(
        "export",
        help="Serialize a checkpoint's decode path to a portable StableHLO "
             "serving artifact (weights baked in; no model code needed to run)",
    )
    ex.add_argument("checkpoint")
    ex.add_argument("output", help="Artifact directory to create")
    ex.add_argument("--batch-sizes", default="1,16",
                    help="Comma list of exported batch sizes (default 1,16)")
    ex.add_argument("--beam-size", type=int, default=None)
    ex.add_argument("--max-length", type=int, default=None)
    ex.add_argument("--temperature", type=float, default=None)
    ex.add_argument("--top-k", type=int, default=None)
    ex.add_argument("--top-p", type=float, default=None)
    ex.add_argument("--length-penalty", type=float, default=None)
    ex.add_argument("--selective-beam-frac", type=float, default=None)
    ex.add_argument("--platforms", default=None,
                    help='Comma list of target platforms, e.g. "tpu,cpu" '
                         "(default: current backend only)")
    ex.add_argument("--bucket-widths", default=None,
                    help="Comma list of aspect-bucket widths to also export "
                         "(one executable per batch x width; inputs route "
                         "through the same bucket rule as the live path)")
    ex.add_argument("--symbolic-batch", action="store_true",
                    help="One batch-polymorphic executable (any batch size, "
                         "no padding) instead of one per --batch-sizes entry; "
                         "compiles per distinct batch at serving time")
    ex.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                    help="Dotted override applied before export")
    ex.set_defaults(func=cmd_export)

    # evaluate
    ev = sub.add_parser("evaluate", help="Evaluate a checkpoint on a dataset split")
    ev.add_argument("checkpoint")
    ev.add_argument("data_dir", nargs="?", default=None)
    ev.add_argument("--data-dir", dest="data_dir_opt", default=None)
    ev.add_argument("--split", default="test", choices=["train", "validate", "test"])
    ev.add_argument("--beam-size", type=int, default=None)
    ev.add_argument("--max-length", type=int, default=None)
    ev.add_argument("--temperature", type=float, default=None)
    ev.add_argument("--top-k", type=int, default=None)
    ev.add_argument("--top-p", type=float, default=None)
    ev.add_argument("--early-exit", action="store_true", default=None,
                    help="Stop decoding when every sequence emitted END "
                         "(the reference's early break; output-identical)")
    ev.add_argument("--length-penalty", type=float, default=None,
                    help="Beam length-normalization exponent")
    ev.add_argument("--selective-frac", type=float, default=None,
                    help="With --beam-size K: greedy-decode everything, beam "
                         "only this fraction of least-confident rows "
                         "(near-beam BLEU at near-greedy throughput)")
    ev.add_argument("--batch-size", type=int, default=None)
    ev.add_argument("--max-batches", type=int, default=None)
    ev.add_argument("--output-dir", default=None)
    ev.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                    help="Dotted override applied to the checkpoint's config, "
                         "e.g. hardware.use_pallas_decode=false")
    ev.set_defaults(func=cmd_evaluate)

    # prime
    pm = sub.add_parser(
        "prime",
        help="Pre-compile decode executables into the persistent compilation "
             "cache (hardware.compilation_cache_dir) so a later evaluate/"
             "serve/predict process starts warm — data-free, AOT",
    )
    pm.add_argument("checkpoint")
    pm.add_argument("--batch-sizes", default="16",
                    help="Comma list of per-batch decode batch sizes to prime")
    pm.add_argument("--beam-size", type=int, default=None)
    pm.add_argument("--length-penalty", type=float, default=None)
    pm.add_argument("--selective-frac", type=float, default=None)
    pm.add_argument("--temperature", type=float, default=None)
    pm.add_argument("--top-k", type=int, default=None)
    pm.add_argument("--top-p", type=float, default=None)
    pm.add_argument("--buckets", default=None,
                    help="Comma list of bucket content widths to prime "
                         "(one executable per width, as bucketed eval/serving builds)")
    pm.add_argument("--split-batches", type=int, default=0,
                    help="Prime the whole-split resident program over this "
                         "many device-cached batches (0 = skip)")
    pm.add_argument("--split-batch-size", type=int, default=None,
                    help="Batch size of the whole-split program "
                         "(default: max of --batch-sizes)")
    pm.add_argument("--out", default=None, help="Write the prime report JSON here")
    pm.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                    help="Dotted override applied to the checkpoint's config")
    pm.set_defaults(func=cmd_prime)

    sv = sub.add_parser("serve", help="HTTP inference server (dynamic batching)")
    sv.add_argument("checkpoint")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8000)
    sv.add_argument("--batch-size", type=int, default=None)
    sv.add_argument("--max-wait-ms", type=float, default=5.0,
                    help="Max time to wait for a batch to fill before decoding")
    sv.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                    help="Dotted override applied to the checkpoint's config, "
                         "e.g. inference.early_exit=true")
    sv.add_argument("--exported", action="store_true",
                    help="CHECKPOINT is an `img2latex-tpu export` artifact "
                         "directory — serve it without loading model code")
    sv.set_defaults(func=cmd_serve)

    vz = sub.add_parser("visualize", help="Visualize experiment metrics")
    vz.add_argument("--experiment", "-e", default=None)
    vz.add_argument("--output-dir", default=None)
    vz.add_argument("--metric", default=None)
    vz.add_argument("--no-samples", action="store_true")
    vz.set_defaults(func=cmd_visualize)

    # debug-logs
    dl = sub.add_parser("debug-logs", help="Logger/log-file diagnostics")
    dl.add_argument("--experiment", "-e", default=None)
    dl.add_argument("--output-dir", default=None)
    dl.add_argument("--tail", type=int, default=0)
    dl.set_defaults(func=cmd_debug_logs)

    # analyze
    an = sub.add_parser("analyze", help="Analysis suite")
    an_sub = an.add_subparsers(dest="tool", required=True)

    ai = an_sub.add_parser("images", help="Dataset image statistics")
    _common_config_args(ai)
    ai.add_argument("--split", default="train")
    ai.add_argument("--num-samples", type=int, default=None)
    ai.add_argument("--output-dir", default="outputs/analysis/images")
    ai.set_defaults(func=cmd_analyze)

    ap_ = an_sub.add_parser("project", help="Config validation + sweep summary")
    _common_config_args(ap_)
    ap_.add_argument("--check", default="all",
                     choices=["all", "config", "files", "consistency", "git", "sweep", "env"])
    ap_.add_argument("--checkpoint", default=None,
                     help="cross-check this checkpoint's param shapes against its "
                          "embedded config (used by --check consistency/all)")
    ap_.add_argument("--output-dir", default="outputs/analysis/project")
    ap_.set_defaults(func=cmd_analyze)

    ac = an_sub.add_parser("curves", help="Learning-curve plots")
    ac.add_argument("--experiment", "-e", required=True)
    ac.add_argument("--metrics-file", default=None)
    ac.add_argument("--smoothing", type=float, default=None)
    ac.add_argument("--output-dir", default=None)
    _common_config_args(ac)
    ac.set_defaults(func=cmd_analyze)

    at = an_sub.add_parser("tokens", help="Token distribution / KL divergence")
    at.add_argument("--predictions-file", required=True)
    at.add_argument("--top-k", type=int, default=20)
    at.add_argument("--output-dir", default="outputs/analysis/tokens")
    at.set_defaults(func=cmd_analyze)

    ae = an_sub.add_parser("errors", help="Edit-distance buckets + error patterns")
    ae.add_argument("--predictions-file", required=True)
    ae.add_argument("--output-dir", default="outputs/analysis/errors")
    _common_config_args(ae)
    ae.set_defaults(func=cmd_analyze)

    app_ = an_sub.add_parser("preprocess", help="Preprocessing visualization")
    app_.add_argument("--image", required=True)
    app_.add_argument("--output-dir", default="outputs/analysis/preprocess")
    _common_config_args(app_)
    app_.set_defaults(func=cmd_analyze)

    am = an_sub.add_parser("metrics", help="Enhanced-metrics browser")
    am.add_argument("action", nargs="?", default="visualize",
                    choices=["visualize", "latest", "compare", "export"])
    am.add_argument("--experiment", "-e", default=None)
    am.add_argument("--experiments", nargs="*", default=None)
    am.add_argument("--metric", default="bleu")
    am.add_argument("--format", default="csv", choices=["csv", "json"])
    am.add_argument("--output-dir", default=None)
    am.set_defaults(func=cmd_analyze)

    ar = an_sub.add_parser("report", help="Publication report figures")
    ar.add_argument("--experiment", "-e", required=True)
    ar.add_argument("--output-dir", default=None)
    ar.set_defaults(func=cmd_analyze)

    av = an_sub.add_parser("predictions", help="Prediction-vs-reference figures")
    av.add_argument("--predictions-file", required=True)
    av.add_argument("--num-samples", type=int, default=10)
    av.add_argument("--output-dir", default="outputs/analysis/predictions")
    av.set_defaults(func=cmd_analyze)

    asite = an_sub.add_parser("site", help="Generate a static HTML project report")
    asite.add_argument("--experiment", "-e", required=True)
    asite.add_argument("--output-dir", default=None)
    asite.set_defaults(func=cmd_analyze)

    return p


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    return args.func(args) or 0


if __name__ == "__main__":
    sys.exit(main())
