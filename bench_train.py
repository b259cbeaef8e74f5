"""Secondary benchmark: training-step throughput at reference scale.

Measures images/sec through the full compiled train step (normalize ->
CNN-LSTM forward -> label-smoothed CE -> backward -> clip -> Adam update,
donated buffers) at the reference's production shapes: batch 128, 64x800
grayscale, vocab 503, seq 141 (``config.yaml`` values; the reference logs
1,177 steps/epoch at this batch size on Apple-Silicon MPS).

Usage: ``python bench_train.py [batch]``.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

VOCAB = 503
IMG_H, IMG_W, IMG_C = 64, 800, 1
EMBED, HIDDEN, LAYERS = 512, 512, 2
SEQ = 141


def main() -> None:
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    import jax.numpy as jnp

    from img2latex_tpu.config import Config
    from img2latex_tpu.models.seq2seq import build_model
    from img2latex_tpu.training.optim import build_optimizer
    from img2latex_tpu.training.steps import create_train_state, make_train_step

    argv = [a for a in sys.argv[1:] if a != "--augment"]
    augment = "--augment" in sys.argv[1:]
    B = int(argv[0]) if argv else 128

    cfg = Config()
    cfg.data.augment_device = augment
    cfg.model.embedding_dim = EMBED
    cfg.model.decoder.hidden_dim = HIDDEN
    cfg.model.decoder.lstm_layers = LAYERS
    cfg.model.decoder.dropout = 0.3
    cfg.model.encoder.cnn.img_height = IMG_H
    cfg.model.encoder.cnn.img_width = IMG_W
    cfg.data.max_seq_length = SEQ
    cfg.training.accumulation_steps = 1
    cfg.hardware.compute_dtype = "bfloat16"

    model = build_model(cfg, VOCAB)
    tx = build_optimizer(cfg)
    state = create_train_state(model, tx, cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, tx, cfg, pad_id=0), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.integers(0, 256, size=(B, IMG_H, IMG_W, IMG_C), dtype=np.uint8)),
        "formulas": jnp.asarray(rng.integers(0, VOCAB, size=(B, SEQ), dtype=np.int32)),
    }
    key = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    state, metrics = step(state, batch, key)
    _ = float(metrics["loss"])  # sync (block_until_ready is a no-op on axon)
    compile_s = time.perf_counter() - t0

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, key)
    _ = float(metrics["loss"])  # single sync; device stream is in-order
    elapsed = time.perf_counter() - t0
    img_per_sec = B * iters / elapsed
    print(
        f"batch={B} compile={compile_s:.1f}s steady={elapsed / iters * 1e3:.1f}ms/step",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "train_step_images_per_sec",
                "value": round(img_per_sec, 1),
                "unit": "img/s",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
