"""Microbench: decode-only throughput, XLA-scan vs Pallas whole-decode kernel.

Isolates the 141-step greedy decode (no encoder) at reference scale so the
two decode implementations can be compared directly on the chip:

* ``greedy_sample_decode`` — pure-XLA ``lax.scan`` over the flax decode_step;
  re-reads the ~13 MB of decoder weights from HBM every step.
* ``pallas_full_greedy_decode`` — one kernel per 256-row batch tile; weights
  DMA into VMEM once per tile and stay resident for all steps.

Timing: pipelined dispatches + device-side checksum (see bench.py).

Usage: python scripts/bench_decode_paths.py [batch] [iters]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

VOCAB = 503
EMBED, HIDDEN, LAYERS = 512, 512, 2
MAX_LEN = 141


def main() -> None:
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from img2latex_tpu.config import Config
    from img2latex_tpu.decoding.decode import DecodeConfig, greedy_sample_decode
    from img2latex_tpu.models.seq2seq import Seq2SeqModel, build_model
    from img2latex_tpu.ops.pallas.decode_step import (
        pack_decoder_weights,
        pallas_full_greedy_decode,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 3072
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    dtype = jnp.bfloat16

    cfg = Config()
    cfg.model.name = "cnn_lstm"
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

    rng = np.random.default_rng(0)
    context = jnp.asarray(rng.normal(size=(B, EMBED)).astype(np.float32), dtype)
    memory = context[:, None, :]
    dcfg = DecodeConfig(max_length=MAX_LEN, start_id=1, end_id=2, pad_id=0)

    def scan_path(params, memory):
        def step_fn(tokens, carry):
            return model.apply(params, memory, tokens, carry, method=Seq2SeqModel.decode_step)

        carry0 = (
            jnp.zeros((LAYERS, B, HIDDEN), dtype),
            jnp.zeros((LAYERS, B, HIDDEN), dtype),
        )
        return greedy_sample_decode(step_fn, carry0, B, dcfg)

    def pallas_path(context):
        # `packed` closed over: it holds static ints (num_layers, dims) that
        # must stay concrete at trace time.
        return pallas_full_greedy_decode(
            packed, context, MAX_LEN, dcfg.start_id, dcfg.end_id, dcfg.pad_id
        )

    checksum = jax.jit(lambda t, acc: acc + jnp.sum(t.astype(jnp.int64)))
    for name, fn, args in (
        ("xla_scan", jax.jit(scan_path), (params, memory)),
        ("pallas_whole", jax.jit(pallas_path), (context,)),
    ):
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
