"""Train-step composition: where do the milliseconds go at reference scale?

Times, at several batch sizes, on the real chip:
  full      — the production train step (normalize -> fwd -> CE -> bwd ->
              clip -> Adam, donated)
  fwd       — teacher-forced forward (encoder + decoder), dropout on
  enc_fwd   — encoder forward only
  enc_grad  — encoder forward+backward (grad of a scalar of the memory)
  dec_fwd   — teacher-forced decoder forward only (precomputed memory)
  dec_grad  — decoder forward+backward

Timing follows bench.py's tunnel-safe pattern (pipelined dispatches,
device-side checksum fetched once — block_until_ready is a no-op on the
tunneled axon platform).

Usage: python scripts/bench_train_parts.py [iters] [batch ...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

VOCAB = 503
IMG_H, IMG_W, IMG_C = 64, 800, 1
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
    from img2latex_tpu.models.seq2seq import Seq2SeqModel, build_model
    from img2latex_tpu.training.optim import build_optimizer
    from img2latex_tpu.training.steps import create_train_state, make_train_step

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    batches = [int(b) for b in sys.argv[2:]] or [128, 256, 512]

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

    model = build_model(cfg, VOCAB)
    tx = build_optimizer(cfg)

    def time_fn(fn, args, n):
        """Pipelined dispatch timing with one device-side checksum fetch."""
        acc_fn = jax.jit(
            lambda x, a: a + jnp.sum(x.astype(jnp.float32)), donate_argnums=(1,)
        )
        out = fn(*args)
        float(acc_fn(jax.tree_util.tree_leaves(out)[0], jnp.float32(0)))  # warm
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for _ in range(n):
            out = fn(*args)
            acc = acc_fn(jax.tree_util.tree_leaves(out)[0], acc)
        v = float(acc)
        elapsed = time.perf_counter() - t0
        assert np.isfinite(v)
        return elapsed / n * 1e3

    for B in batches:
        rng = np.random.default_rng(0)
        images_u8 = jnp.asarray(
            rng.integers(0, 256, size=(B, IMG_H, IMG_W, IMG_C), dtype=np.uint8)
        )
        images = images_u8.astype(jnp.float32) / 255.0
        tokens = jnp.asarray(rng.integers(0, VOCAB, size=(B, SEQ), dtype=np.int32))
        batch = {"images": images_u8, "formulas": tokens}
        drng = {"dropout": jax.random.PRNGKey(1)}

        state = create_train_state(model, tx, cfg, jax.random.PRNGKey(0))
        # step donates its state arg — keep an independent copy of the params
        # for the part benches.
        params = jax.tree_util.tree_map(jnp.array, state.params)

        step = jax.jit(make_train_step(model, tx, cfg, pad_id=0), donate_argnums=(0,))
        key = jax.random.PRNGKey(1)
        st, metrics = step(state, batch, key)  # compile
        _ = float(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            st, metrics = step(st, batch, key)
        v = float(metrics["loss"])
        full_ms = (time.perf_counter() - t0) / iters * 1e3
        assert np.isfinite(v)
        print(f"B={B} full_step {full_ms:7.2f} ms = {B / (full_ms / 1e3):6.0f} img/s", flush=True)

        def fwd(p):
            return model.apply({"params": p}, images, tokens, train=True, rngs=drng)

        def fwd_loss(p):
            return jnp.mean(fwd(p).astype(jnp.float32) ** 2)

        def enc_fwd(p):
            return model.apply({"params": p}, images, method=Seq2SeqModel.encode)

        def enc_loss(p):
            return jnp.mean(enc_fwd(p).astype(jnp.float32) ** 2)

        memory = jax.jit(enc_fwd)(params)

        def dec_fwd(p):
            return model.apply(
                {"params": p},
                memory,
                tokens[:, :-1],
                method=lambda m, mem, inp: m.decoder(mem, inp, deterministic=False),
                rngs=drng,
            )

        def dec_loss(p):
            return jnp.mean(dec_fwd(p).astype(jnp.float32) ** 2)

        for name, fn in (
            ("fwd", jax.jit(fwd_loss)),
            ("enc_fwd", jax.jit(enc_loss)),
            ("enc_grad", jax.jit(jax.grad(enc_loss))),
            ("dec_fwd", jax.jit(dec_loss)),
            ("dec_grad", jax.jit(jax.grad(dec_loss))),
        ):
            ms = time_fn(fn, (params,), iters)
            print(f"B={B} {name:9s} {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
