"""Worker process for the 2-process multi-host trainer test.

Launched twice by ``tests/test_multihost.py`` (process 0 and 1) against a
local TCP coordinator.  Each process sees 2 virtual CPU devices (4 global),
initializes ``jax.distributed`` with gloo CPU collectives, and runs one
epoch of the PRODUCT training path (``Trainer``) on a shared synthetic
corpus with per-process data sharding.  Results (losses + what got written)
land in a JSON file the test asserts on.

Usage: python multihost_worker.py <pid> <nproc> <port> <corpus> <outdir> <result_json>
"""

import json
import os
import sys


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    corpus, outdir, result_path = sys.argv[4], sys.argv[5], sys.argv[6]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    # Bootstrap through the PRODUCT helper (cli.py calls it the same way):
    # it must run jax.distributed.initialize before anything touches the
    # XLA backend — a regression here once made multi-host init impossible
    # (jax.process_count() pre-check initialized the backend first).
    from img2latex_tpu.parallel.distributed import maybe_initialize_distributed

    assert maybe_initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc

    from img2latex_tpu.config import Config
    from img2latex_tpu.data.pipeline import create_data_loaders, read_formulas
    from img2latex_tpu.data.tokenizer import LaTeXTokenizer
    from img2latex_tpu.training.trainer import Trainer
    from img2latex_tpu.utils.paths import PathManager

    cfg = Config()
    cfg.data.data_dir = corpus
    cfg.data.batch_size = 8
    cfg.data.max_seq_length = 16
    cfg.model.embedding_dim = 32
    cfg.model.decoder.hidden_dim = 32
    cfg.model.decoder.lstm_layers = 1
    cfg.model.decoder.dropout = 0.0
    cfg.model.encoder.cnn.img_height = 32
    cfg.model.encoder.cnn.img_width = 96
    cfg.model.encoder.cnn.conv_filters = [4]
    cfg.training.epochs = 1
    cfg.training.accumulation_steps = 1
    cfg.hardware.compute_dtype = "float32"
    cfg.evaluation.bleu_batches = 1

    tok = LaTeXTokenizer(max_sequence_length=cfg.data.max_seq_length)
    tok.fit(read_formulas(os.path.join(corpus, "im2latex_formulas.norm.lst")))
    loaders = create_data_loaders(cfg, tok)
    # per-process loader sharding engaged?
    loader = loaders["train"]
    assert loader.process_count == nproc and loader.local_batch_size == 8 // nproc

    paths = PathManager(outdir)
    paths.outputs_dir.mkdir(parents=True, exist_ok=True)
    tr = Trainer(cfg, tok, loaders, paths=paths, experiment_name="mh")
    assert tr.mesh is not None and tr.mesh.size == jax.device_count()
    train_metrics = tr.train_epoch(0)
    val_metrics = tr.validate(0)
    tr.save_checkpoint(0, is_best=True)

    ckpt_dir = paths.get_dir("mh", "checkpoints")
    wrote_ckpt = any(ckpt_dir.iterdir()) if ckpt_dir.exists() else False
    with open(result_path, "w") as f:
        json.dump(
            {
                "pid": pid,
                "train_loss": float(train_metrics["train_loss"]),
                "train_accuracy": float(train_metrics["train_accuracy"]),
                "val_loss": float(val_metrics["val_loss"]),
                "val_accuracy": float(val_metrics["val_accuracy"]),
                "wrote_checkpoint": bool(wrote_ckpt),
                "mesh": dict(tr.mesh.shape),
            },
            f,
        )


if __name__ == "__main__":
    main()
