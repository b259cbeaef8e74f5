"""Benchmark: top-k sampling decode throughput (the third decode strategy).

Same harness as bench.py but with the reference's sampling gate active
(``top_k>0`` -> filtered categorical sampling, ``predictor.py:294-335``):
temperature 0.8, top-k 10, scanned XLA path (the Pallas fast path is
greedy-only).  Usage: ``python bench_sampling.py [batch]``.

Prints ONE JSON line like bench.py.
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
MAX_LEN = 141
PER_CHIP_BASELINE = 5000.0 / 8.0


def main() -> None:
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from img2latex_tpu.config import Config
    from img2latex_tpu.decoding.decode import DecodeConfig, greedy_sample_decode
    from img2latex_tpu.models.seq2seq import Seq2SeqModel, build_model
    from img2latex_tpu.ops.preprocess import normalize_images

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 3072

    cfg = Config()
    cfg.model.name = "cnn_lstm"
    cfg.model.embedding_dim = EMBED
    cfg.model.decoder.hidden_dim = HIDDEN
    cfg.model.decoder.lstm_layers = LAYERS
    cfg.model.decoder.dropout = 0.0
    cfg.model.encoder.cnn.img_height = IMG_H
    cfg.model.encoder.cnn.img_width = IMG_W
    cfg.data.max_seq_length = MAX_LEN
    cfg.hardware.compute_dtype = "bfloat16"
    cfg.hardware.pallas_conv1 = jax.default_backend() in ("tpu", "axon")

    model = build_model(cfg, VOCAB)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, size=(B, IMG_H, IMG_W, IMG_C), dtype=np.uint8))
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, IMG_H, IMG_W, IMG_C), jnp.float32),
        jnp.zeros((2, 8), jnp.int32),
    )
    dcfg = DecodeConfig(
        max_length=MAX_LEN, start_id=1, end_id=2, pad_id=0, temperature=0.8, top_k=10
    )
    dtype = jnp.bfloat16

    # "kernel" (default on TPU): whole-decode sampling kernel (in-kernel
    # top-k + Gumbel-max); "scan": the XLA scan path (round-1 baseline).
    variant = sys.argv[2] if len(sys.argv) > 2 else "kernel"
    use_kernel = variant == "kernel" and jax.default_backend() in ("tpu", "axon")
    packed = None
    if use_kernel:
        from img2latex_tpu.ops.pallas.decode_step import (
            pack_decoder_weights,
            pallas_full_sample_decode,
        )

        packed = pack_decoder_weights(params, VOCAB, dtype)

    def decode(params, images_u8, key):
        x = normalize_images(images_u8, compute_dtype=dtype)
        memory = model.apply(params, x, method=Seq2SeqModel.encode)
        if use_kernel:
            seed = jax.random.bits(key, dtype=jnp.uint32).astype(jnp.int32)
            return pallas_full_sample_decode(
                packed, memory[:, 0, :], MAX_LEN, dcfg.start_id, dcfg.end_id,
                dcfg.pad_id, top_k=dcfg.top_k, seed=seed,
                temperature=dcfg.temperature,
            )

        def step_fn(tokens, carry):
            return model.apply(params, memory, tokens, carry, method=Seq2SeqModel.decode_step)

        carry0 = (
            jnp.zeros((LAYERS, B, HIDDEN), dtype),
            jnp.zeros((LAYERS, B, HIDDEN), dtype),
        )
        return greedy_sample_decode(step_fn, carry0, B, dcfg, rng=key)

    run = jax.jit(decode)
    checksum = jax.jit(lambda t, acc: acc + jnp.sum(t.astype(jnp.int64)))
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    out = run(params, images, key)
    _ = float(checksum(out, jnp.int64(0)))
    compile_s = time.perf_counter() - t0

    iters = 20
    acc = jnp.int64(0)
    t0 = time.perf_counter()
    for i in range(iters):
        out = run(params, images, jax.random.fold_in(key, i))
        acc = checksum(out, acc)
    total = float(acc)
    elapsed = time.perf_counter() - t0
    assert np.isfinite(total)
    img_per_sec = B * iters / elapsed
    print(
        f"batch={B} top_k=10 T=0.8 compile={compile_s:.1f}s "
        f"steady={elapsed / iters * 1e3:.1f}ms/iter",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "topk_sampling_decode_images_per_sec",
                "value": round(img_per_sec, 1),
                "unit": "img/s",
                # single-device bench: img_per_sec IS the per-chip rate
                "vs_baseline": round(img_per_sec / PER_CHIP_BASELINE, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
