"""Benchmark: greedy-decode throughput (images/sec) on the flagship CNN-LSTM.

North star (BASELINE.json): >=5,000 images/sec greedy decode on a TPU v5e-8
at BLEU parity => 625 img/s/chip.  This bench runs the full inference path —
uint8 NHWC batch -> on-device normalize -> CNN encode -> 141-step scanned
greedy decode — data-parallel over all available devices, and reports
aggregate images/sec plus per-chip rate vs the 625 img/s/chip target.

Prints ONE JSON line:
  {"metric": "greedy_decode_images_per_sec", "value": N, "unit": "img/s",
   "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# Reference-scale shapes: IM2LaTeX vocab ~500 (README.md:47-52), 64x800 gray
# canvas (encoder.py:52-54), embed/hidden 512, 2 LSTM layers (config.yaml:45-48),
# max decode length 141 (config.yaml:77).
VOCAB = 503
IMG_H, IMG_W, IMG_C = 64, 800, 1
EMBED, HIDDEN, LAYERS = 512, 512, 2
MAX_LEN = 141
PER_CHIP_BASELINE = 5000.0 / 8.0  # north-star v5e-8 target, per chip


def main() -> None:
    import jax

    # Persistent compile cache: tunnel compiles run 2-5 minutes; warm runs
    # (e.g. the driver's round-end invocation) then start in seconds.
    import os

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from img2latex_tpu.config import Config
    from img2latex_tpu.decoding.decode import DecodeConfig, greedy_sample_decode
    from img2latex_tpu.models.seq2seq import Seq2SeqModel, build_model
    from img2latex_tpu.ops.preprocess import normalize_images
    from img2latex_tpu.parallel.mesh import create_mesh, put_batch, put_replicated

    use_pallas = jax.default_backend() in ("tpu", "axon")

    n_dev = jax.device_count()
    # Batch sweep on one v5e chip (the Pallas conv1 kernel freed the HBM
    # that capped the XLA path at 3072): 3072 -> 28.2k, 4096 -> 28.9k,
    # 5120 -> 29.6k, 6144 -> 30.4k img/s; 8192 exceeds HBM.
    batch_per_chip = int(sys.argv[1]) if len(sys.argv) > 1 else 6144
    B = batch_per_chip * n_dev
    # Encoder variant: "conv1" (default) = first-block kernel only (1.02-1.06x
    # vs XLA on chip); "chain" = whole-conv-stack channel-first Pallas path —
    # measured 0.435x vs XLA at batch 3072 (scripts/bench_encoder_chain.py,
    # 2026-08-17: xla 73.7ms / conv1 72.0ms / chain 169.4ms), kept only as an
    # A/B variant; "xla" = no Pallas encoder.
    enc_variant = sys.argv[2] if len(sys.argv) > 2 else "conv1"

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
    # Encoder fast path: "chain" runs the whole conv stack channel-first
    # (conv1_phase + conv_cf kernels, layout-absorbing head — no NCHW->NHWC
    # relayout; scripts/bench_encoder_chain.py); "conv1" is the round-1
    # first-block-only kernel (1.06x conv1 vs XLA, scripts/bench_conv1.py).
    cfg.hardware.pallas_conv1 = use_pallas and enc_variant in ("conv1", "chain")
    cfg.hardware.pallas_chain = use_pallas and enc_variant == "chain"

    model = build_model(cfg, VOCAB)
    rng = np.random.default_rng(0)
    images_u8 = rng.integers(0, 256, size=(B, IMG_H, IMG_W, IMG_C), dtype=np.uint8)
    init_imgs = jnp.zeros((2, IMG_H, IMG_W, IMG_C), jnp.float32)
    init_tgts = jnp.zeros((2, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), init_imgs, init_tgts)

    mesh = create_mesh((-1, 1), ("data", "model"))
    params = put_replicated(params, mesh)
    batch = put_batch({"images": jnp.asarray(images_u8)}, mesh)["images"]

    dcfg = DecodeConfig(max_length=MAX_LEN, start_id=1, end_id=2, pad_id=0)
    dtype = jnp.dtype(cfg.hardware.compute_dtype)

    # Same decode path the Predictor ships: the whole-decode Pallas kernel
    # (weights VMEM-resident across all 141 steps; 1.13x the XLA scan at
    # batch 3072, scripts/bench_decode_paths.py).  Scan fallback off-TPU.
    packed = None
    if use_pallas:
        from img2latex_tpu.ops.pallas.decode_step import (
            pack_decoder_weights,
            pallas_full_greedy_decode,
        )

        packed = pack_decoder_weights(params, VOCAB, dtype)

    def decode(params, images_u8):
        x = normalize_images(images_u8, compute_dtype=dtype)
        memory = model.apply(params, x, method=Seq2SeqModel.encode)
        if use_pallas:
            return pallas_full_greedy_decode(
                packed, memory[:, 0, :], MAX_LEN, dcfg.start_id, dcfg.end_id, dcfg.pad_id
            )

        def step_fn(tokens, carry):
            return model.apply(params, memory, tokens, carry, method=Seq2SeqModel.decode_step)

        carry0 = (
            jnp.zeros((LAYERS, B, HIDDEN), dtype),
            jnp.zeros((LAYERS, B, HIDDEN), dtype),
        )
        return greedy_sample_decode(step_fn, carry0, B, dcfg)

    run = jax.jit(decode)
    checksum = jax.jit(lambda t, acc: acc + jnp.sum(t.astype(jnp.int64)))
    # Warmup / compile.  NOTE: on the tunneled axon platform
    # block_until_ready() does not actually block AND every host sync costs a
    # ~25-30ms round trip, so the loop pipelines all dispatches and
    # accumulates a device-side checksum fetched ONCE at the end.
    t0 = time.perf_counter()
    out = run(params, batch)
    _ = float(checksum(out, jnp.int64(0)))
    compile_s = time.perf_counter() - t0

    iters = 20
    acc = jnp.int64(0)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(params, batch)
        acc = checksum(out, acc)
    total = float(acc)  # single sync
    elapsed = time.perf_counter() - t0
    assert np.isfinite(total)
    img_per_sec = B * iters / elapsed
    per_chip = img_per_sec / n_dev

    print(
        f"devices={n_dev} batch={B} compile={compile_s:.1f}s "
        f"steady={elapsed / iters * 1e3:.1f}ms/iter per_chip={per_chip:.0f} img/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "greedy_decode_images_per_sec",
                "value": round(img_per_sec, 1),
                "unit": "img/s",
                "vs_baseline": round(per_chip / PER_CHIP_BASELINE, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
