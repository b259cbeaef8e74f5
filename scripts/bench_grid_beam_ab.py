"""A/B: grid-memory beam-5 decode — XLA scan baseline vs the Pallas
whole-beam kernel at explicit batch tiles.

The grid beam kernel's VMEM footprint exceeds XLA's 16M scoped-vmem stack
limit at the auto tile (51 rows x K=5; hard Mosaic compile OOM on-chip
2026-08-18), so this driver sweeps explicit tiles to find the largest one
that compiles and the throughput at each.

Usage: python scripts/bench_grid_beam_ab.py [batch] [iters] [path ...]
  path: "scan" | "tile<N>" (e.g. tile25 tile32)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

VOCAB = 503
EMBED, HIDDEN, LAYERS = 256, 384, 2
SLOTS = 100
MAX_LEN = 141
K = 5


def main() -> None:
    import jax

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    cache_dir = os.path.join(repo, ".cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from img2latex_tpu.config import Config
    from img2latex_tpu.decoding.decode import DecodeConfig, beam_decode
    from img2latex_tpu.models.seq2seq import Seq2SeqModel, build_model
    from img2latex_tpu.ops.pallas.decode_step import pack_decoder_weights
    from img2latex_tpu.ops.pallas.grid_decode import (
        pack_attention_weights,
        pallas_full_grid_beam_decode,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 3072
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    paths = sys.argv[3:] or ["scan", "tile25"]
    dtype = jnp.bfloat16

    cfg = Config()
    cfg.model.name = "cnn_lstm"
    cfg.model.memory = "grid"
    cfg.model.embedding_dim = EMBED
    cfg.model.decoder.hidden_dim = HIDDEN
    cfg.model.decoder.lstm_layers = LAYERS
    cfg.model.decoder.dropout = 0.0
    cfg.data.max_seq_length = MAX_LEN
    cfg.hardware.compute_dtype = "bfloat16"
    model = build_model(cfg, VOCAB)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, 64, 800, 1), jnp.float32),
        jnp.zeros((2, 8), jnp.int32),
    )
    packed = pack_decoder_weights(params, VOCAB, dtype)
    att = pack_attention_weights(params, dtype)

    rng = np.random.default_rng(0)
    memory = jnp.asarray(rng.normal(size=(B, SLOTS, EMBED)).astype(np.float32), dtype)
    dcfg = DecodeConfig(
        max_length=MAX_LEN, start_id=1, end_id=2, pad_id=0, beam_size=K,
        length_penalty=1.5,
    )

    def scan_beam(params, memory):
        mem_exp = jnp.repeat(memory, K, axis=0)

        def step_fn(tokens, carry):
            return model.apply(
                params, mem_exp, tokens, carry, method=Seq2SeqModel.decode_step
            )

        carry0 = (
            jnp.zeros((LAYERS, B * K, HIDDEN), dtype),
            jnp.zeros((LAYERS, B * K, HIDDEN), dtype),
        )
        tokens, _ = beam_decode(step_fn, carry0, B, K, dcfg)
        return tokens

    def make_pallas(tile):
        def pallas_beam(memory):
            tokens, _ = pallas_full_grid_beam_decode(
                packed, att, memory, K, dcfg, batch_tile=tile
            )
            return tokens

        return pallas_beam

    checksum = jax.jit(lambda t, acc: acc + jnp.sum(t.astype(jnp.int64)))
    for name in paths:
        if name == "scan":
            fn, args = jax.jit(scan_beam), (params, memory)
        else:
            fn, args = jax.jit(make_pallas(int(name[4:]))), (memory,)
        try:
            t0 = time.perf_counter()
            out = fn(*args)
            ref = float(checksum(out, jnp.int64(0)))
            compile_s = time.perf_counter() - t0
        except Exception as e:  # compile OOM etc. — report and move on
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
            continue

        acc = jnp.int64(0)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
            acc = checksum(out, acc)
        total = float(acc)
        elapsed = time.perf_counter() - t0
        assert np.isfinite(total)
        ms = elapsed / iters * 1e3
        print(
            f"{name}: batch={B} compile={compile_s:.1f}s {ms:.2f} ms/iter "
            f"= {B / (elapsed / iters):.0f} img/s checksum={ref:.0f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
