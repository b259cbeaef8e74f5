"""On-chip A/B: train step with the whole-sequence Pallas LSTM vs XLA scan.

Times the full production train step (normalize -> fwd -> CE -> bwd ->
clip -> Adam, donated) at reference scale with hardware.pallas_lstm
False / True, plus the isolated decoder fwd/grad (as in
scripts/bench_train_parts.py).

Usage: python scripts/bench_lstm_train.py [batch] [iters]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

VOCAB = 503
IMG_H, IMG_W = 64, 800
EMBED, HIDDEN, LAYERS = 512, 512, 2
SEQ = 141


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import jax

    cache_dir = os.path.join(repo, ".cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from img2latex_tpu.config import Config
    from img2latex_tpu.models.seq2seq import build_model
    from img2latex_tpu.training.optim import build_optimizer
    from img2latex_tpu.training.steps import create_train_state, make_train_step

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(
            rng.integers(0, 256, size=(B, IMG_H, IMG_W, 1), dtype=np.uint8)
        ),
        "formulas": jnp.asarray(rng.integers(0, VOCAB, size=(B, SEQ), dtype=np.int32)),
    }
    key = jax.random.PRNGKey(1)

    for flag in (False, True):
        cfg = Config()
        cfg.model.embedding_dim = EMBED
        cfg.model.decoder.hidden_dim = HIDDEN
        cfg.model.decoder.lstm_layers = LAYERS
        cfg.model.decoder.dropout = 0.3
        cfg.model.encoder.cnn.img_height = IMG_H
        cfg.model.encoder.cnn.img_width = IMG_W
        cfg.data.max_seq_length = SEQ
        cfg.training.accumulation_steps = 1
        cfg.hardware.compute_dtype = "bfloat16"
        cfg.hardware.pallas_lstm = flag
        model = build_model(cfg, VOCAB)
        tx = build_optimizer(cfg)
        state = create_train_state(model, tx, cfg, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(model, tx, cfg, pad_id=0), donate_argnums=(0,))

        t0 = time.perf_counter()
        state, metrics = step(state, batch, key)
        _ = float(metrics["loss"])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, batch, key)
        loss = float(metrics["loss"])
        ms = (time.perf_counter() - t0) / iters * 1e3
        assert np.isfinite(loss)
        print(
            f"pallas_lstm={flag}: batch={B} compile={compile_s:.1f}s "
            f"{ms:.2f} ms/step = {B / (ms / 1e3):.0f} img/s loss={loss:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
