"""Secondary benchmark: beam-search decode throughput (images/sec).

The driver's official metric is greedy (``bench.py``); this script measures
the batched on-device beam path (the reference has no working beam at all —
its CLI clamps beam off, ``predictor.py:163-167``, and the model-level beam is
a B=1 host loop).  On TPU the default path is the fused whole-beam-decode
Pallas kernel (``ops/pallas/beam_decode.py``); ``--scan`` forces the XLA
scan path for A/B.  Usage: ``python bench_beam.py [batch] [beam_size] [--scan]``.
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


def main() -> None:
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    import jax.numpy as jnp

    from img2latex_tpu.config import Config
    from img2latex_tpu.decoding.decode import DecodeConfig, beam_decode
    from img2latex_tpu.models.seq2seq import Seq2SeqModel, build_model
    from img2latex_tpu.ops.preprocess import normalize_images

    force_scan = "--scan" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args[0]) if args else 512
    K = int(args[1]) if len(args) > 1 else 5
    TILE = int(args[2]) if len(args) > 2 else 0  # 0 = kernel default

    cfg = Config()
    cfg.model.embedding_dim = EMBED
    cfg.model.decoder.hidden_dim = HIDDEN
    cfg.model.decoder.lstm_layers = LAYERS
    cfg.model.decoder.dropout = 0.0
    cfg.model.encoder.cnn.img_height = IMG_H
    cfg.model.encoder.cnn.img_width = IMG_W
    cfg.hardware.compute_dtype = "bfloat16"
    # Same conv1 fast path as bench.py (1.06x the XLA conv1 block on chip).
    cfg.hardware.pallas_conv1 = jax.default_backend() in ("tpu", "axon")
    model = build_model(cfg, VOCAB)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, size=(B, IMG_H, IMG_W, IMG_C), dtype=np.uint8))
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, IMG_H, IMG_W, IMG_C)), jnp.zeros((2, 8), jnp.int32)
    )
    dcfg = DecodeConfig(max_length=MAX_LEN, start_id=1, end_id=2, pad_id=0, beam_size=K)
    dt = jnp.bfloat16
    use_kernel = jax.default_backend() in ("tpu", "axon") and not force_scan
    packed = None
    if use_kernel:
        from img2latex_tpu.ops.pallas.beam_decode import pallas_full_beam_decode
        from img2latex_tpu.ops.pallas.decode_step import pack_decoder_weights

        packed = pack_decoder_weights(params, VOCAB, dt)

    def decode(params, images_u8):
        x = normalize_images(images_u8, compute_dtype=dt)
        memory = model.apply(params, x, method=Seq2SeqModel.encode)
        if use_kernel:
            tokens, _ = pallas_full_beam_decode(
                packed, memory[:, 0, :], K, dcfg, batch_tile=TILE
            )
            return tokens
        mem_exp = jnp.repeat(memory, K, axis=0)

        def step_fn(tokens, carry):
            return model.apply(params, mem_exp, tokens, carry, method=Seq2SeqModel.decode_step)

        carry0 = (
            jnp.zeros((LAYERS, B * K, HIDDEN), dt),
            jnp.zeros((LAYERS, B * K, HIDDEN), dt),
        )
        tokens, scores = beam_decode(step_fn, carry0, B, K, dcfg)
        return tokens

    run = jax.jit(decode)
    checksum = jax.jit(lambda t, acc: acc + jnp.sum(t.astype(jnp.int64)))
    t0 = time.perf_counter()
    out = run(params, images)
    _ = float(checksum(out, jnp.int64(0)))
    compile_s = time.perf_counter() - t0
    iters = 10
    acc = jnp.int64(0)
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = checksum(run(params, images), acc)
    _ = float(acc)
    elapsed = time.perf_counter() - t0
    img_per_sec = B * iters / elapsed
    print(
        f"batch={B} beam={K} compile={compile_s:.1f}s steady={elapsed / iters * 1e3:.1f}ms/iter",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"beam{K}_decode_images_per_sec",
                "value": round(img_per_sec, 1),
                "unit": "img/s",
                "vs_baseline": round(img_per_sec / 625.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
