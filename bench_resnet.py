"""Benchmark: ResNet-LSTM greedy decode throughput (second model family).

Same harness as bench.py but with the ResNet-50 encoder (RGB 64x800 input,
``encoder.py:132-249`` parity topology) feeding the whole-decode Pallas
kernel.  Usage: ``python bench_resnet.py [batch] [resnet_name]``.

Prints ONE JSON line like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

VOCAB = 503
IMG_H, IMG_W, IMG_C = 64, 800, 3
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
    from img2latex_tpu.decoding.decode import DecodeConfig
    from img2latex_tpu.models.seq2seq import Seq2SeqModel, build_model
    from img2latex_tpu.ops.pallas.decode_step import (
        pack_decoder_weights,
        pallas_full_greedy_decode,
    )
    from img2latex_tpu.ops.preprocess import normalize_images

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    name = sys.argv[2] if len(sys.argv) > 2 else "resnet50"

    cfg = Config()
    cfg.model.name = "resnet_lstm"
    cfg.model.encoder.resnet.model_name = name
    cfg.model.encoder.resnet.img_height = IMG_H
    cfg.model.encoder.resnet.img_width = IMG_W
    cfg.model.embedding_dim = EMBED
    cfg.model.decoder.hidden_dim = HIDDEN
    cfg.model.decoder.lstm_layers = LAYERS
    cfg.model.decoder.dropout = 0.0
    cfg.data.max_seq_length = MAX_LEN
    cfg.hardware.compute_dtype = "bfloat16"

    model = build_model(cfg, VOCAB)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, size=(B, IMG_H, IMG_W, IMG_C), dtype=np.uint8))
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, IMG_H, IMG_W, IMG_C), jnp.float32),
        jnp.zeros((2, 8), jnp.int32),
    )
    dcfg = DecodeConfig(max_length=MAX_LEN, start_id=1, end_id=2, pad_id=0)
    dtype = jnp.bfloat16
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    use_pallas = jax.default_backend() in ("tpu", "axon")
    packed = pack_decoder_weights(params, VOCAB, dtype) if use_pallas else None

    def decode(params, images_u8):
        x = normalize_images(images_u8, mean, std, compute_dtype=dtype)
        memory = model.apply(params, x, method=Seq2SeqModel.encode)
        if use_pallas:
            return pallas_full_greedy_decode(
                packed, memory[:, 0, :], MAX_LEN, dcfg.start_id, dcfg.end_id, dcfg.pad_id
            )
        from img2latex_tpu.decoding.decode import greedy_sample_decode

        def step_fn(tokens, carry):
            return model.apply(params, memory, tokens, carry, method=Seq2SeqModel.decode_step)

        carry0 = (
            jnp.zeros((LAYERS, B, HIDDEN), dtype),
            jnp.zeros((LAYERS, B, HIDDEN), dtype),
        )
        return greedy_sample_decode(step_fn, carry0, B, dcfg)

    run = jax.jit(decode)
    checksum = jax.jit(lambda t, acc: acc + jnp.sum(t.astype(jnp.int64)))
    t0 = time.perf_counter()
    out = run(params, images)
    _ = float(checksum(out, jnp.int64(0)))
    compile_s = time.perf_counter() - t0

    iters = 20
    acc = jnp.int64(0)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(params, images)
        acc = checksum(out, acc)
    total = float(acc)
    elapsed = time.perf_counter() - t0
    assert np.isfinite(total)
    img_per_sec = B * iters / elapsed
    print(
        f"{name} batch={B} compile={compile_s:.1f}s steady={elapsed / iters * 1e3:.1f}ms/iter",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"{name}_greedy_decode_images_per_sec",
                "value": round(img_per_sec, 1),
                "unit": "img/s",
                # single-device bench: img_per_sec IS the per-chip rate
                "vs_baseline": round(img_per_sec / PER_CHIP_BASELINE, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
