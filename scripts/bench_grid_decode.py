"""Microbench: grid-memory decode throughput, XLA-scan vs Pallas whole-decode.

The quality-bearing checkpoints run ``model.memory = "grid"`` — real additive
attention over the S = W' feature-grid columns (the non-degenerate
generalization of reference ``decoder.py:287-343``).  Before
``ops/pallas/grid_decode.py`` they decoded on the XLA scan path, which pays a
fresh HBM round-trip of the (B, S, A) attention energies every step; the grid
kernel keeps memory + the precomputed memory projection U + all decoder
weights VMEM-resident across all 141 steps.

Shapes mirror the hard-corpus flagship (artifacts/mathtext_hard_grid):
embed 256, hidden 384, 2 layers, S = 100 grid slots, vocab 503, bf16.

Timing: pipelined dispatches + device-side checksum (see bench.py — on the
axon tunnel ``block_until_ready`` does not block, so per-iter host syncs are
meaningless; we chain a checksum and fetch once).

Usage: python scripts/bench_grid_decode.py [batch] [iters]
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
    from img2latex_tpu.decoding.decode import DecodeConfig, greedy_sample_decode
    from img2latex_tpu.models.seq2seq import Seq2SeqModel, build_model
    from img2latex_tpu.ops.pallas.decode_step import pack_decoder_weights
    from img2latex_tpu.ops.pallas.grid_decode import (
        pack_attention_weights,
        pallas_full_grid_beam_decode,
        pallas_full_grid_greedy_decode,
        pallas_full_grid_sample_decode,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 3072
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
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
    dcfg = DecodeConfig(max_length=MAX_LEN, start_id=1, end_id=2, pad_id=0)

    def scan_path(params, memory):
        def step_fn(tokens, carry):
            return model.apply(params, memory, tokens, carry, method=Seq2SeqModel.decode_step)

        carry0 = (
            jnp.zeros((LAYERS, B, HIDDEN), dtype),
            jnp.zeros((LAYERS, B, HIDDEN), dtype),
        )
        return greedy_sample_decode(step_fn, carry0, B, dcfg)

    def pallas_greedy(memory):
        return pallas_full_grid_greedy_decode(
            packed, att, memory, MAX_LEN, dcfg.start_id, dcfg.end_id, dcfg.pad_id
        )

    def pallas_sample(memory):
        return pallas_full_grid_sample_decode(
            packed, att, memory, MAX_LEN, dcfg.start_id, dcfg.end_id, dcfg.pad_id,
            top_k=10, seed=7, temperature=0.8,
        )

    beam_dcfg = DecodeConfig(
        max_length=MAX_LEN, start_id=1, end_id=2, pad_id=0, beam_size=5, length_penalty=1.5
    )

    def pallas_beam(memory):
        tokens, _ = pallas_full_grid_beam_decode(packed, att, memory, 5, beam_dcfg)
        return tokens

    checksum = jax.jit(lambda t, acc: acc + jnp.sum(t.astype(jnp.int64)))
    only = sys.argv[3] if len(sys.argv) > 3 else None
    for name, fn, args in (
        ("xla_scan_grid", jax.jit(scan_path), (params, memory)),
        ("pallas_grid_greedy", jax.jit(pallas_greedy), (memory,)),
        ("pallas_grid_sample_k10", jax.jit(pallas_sample), (memory,)),
        ("pallas_grid_beam5", jax.jit(pallas_beam), (memory,)),
    ):
        if only and only not in name:
            continue
        t0 = time.perf_counter()
        out = fn(*args)
        ref = float(checksum(out, jnp.int64(0)))
        compile_s = time.perf_counter() - t0

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
