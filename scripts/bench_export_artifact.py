"""Throughput of a serialized serving artifact at reference scale.

Builds a flagship-scale CNN-LSTM (vocab 503, 64x800, 141 steps, bf16) with
random weights, exports its greedy decode via jax.export (the pure-XLA scan
path — the portability tier; Pallas-kernel serving stays with the live
Predictor), deserializes, and times the artifact on the current backend with
the pipelined-dispatch + device-checksum method every bench here uses (the
tunneled platform's block_until_ready is a no-op).

Usage: python scripts/bench_export_artifact.py [batch] [--beam K]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VOCAB = 503
IMG_H, IMG_W, IMG_C = 64, 800, 1
EMBED, HIDDEN, LAYERS = 512, 512, 2
MAX_LEN = 141


def main() -> None:
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "jax"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from img2latex_tpu.config import Config
    from img2latex_tpu.decoding.decode import DecodeConfig
    from img2latex_tpu.export import _build_symbolic_decode
    from img2latex_tpu.models.seq2seq import build_model

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args[0]) if args else 1024
    beam = int(sys.argv[sys.argv.index("--beam") + 1]) if "--beam" in sys.argv else 0

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

    model = build_model(cfg, VOCAB)
    imgs0 = jnp.zeros((2, IMG_H, IMG_W, IMG_C), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs0, jnp.zeros((2, 8), jnp.int32))
    dcfg = DecodeConfig(max_length=MAX_LEN, start_id=1, end_id=2, pad_id=0, beam_size=beam)

    # Same builder the export path uses, at a fixed batch (static export).
    class _P:  # minimal Predictor-shaped shim for _build_symbolic_decode
        pass

    p = _P()
    p.model = model
    p.cfg = cfg
    p._variables = lambda: params
    run = jax.jit(_build_symbolic_decode(p, dcfg))

    t0 = time.perf_counter()
    exp = jax.export.export(run)(
        jax.ShapeDtypeStruct((B, IMG_H, IMG_W, IMG_C), jnp.uint8),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )
    blob = exp.serialize()
    print(f"export+serialize {time.perf_counter() - t0:.1f}s, {len(blob) / 1e6:.1f} MB",
          file=sys.stderr)
    call = jax.jit(jax.export.deserialize(blob).call)

    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.integers(0, 256, size=(B, IMG_H, IMG_W, IMG_C), dtype=np.uint8))
    key = jax.random.PRNGKey(0)
    checksum = jax.jit(lambda t, acc: acc + jnp.sum(t.astype(jnp.int64)))

    t0 = time.perf_counter()
    out = call(batch, key)
    _ = float(checksum(out, jnp.int64(0)))
    compile_s = time.perf_counter() - t0

    iters = 10
    acc = jnp.int64(0)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = call(batch, key)
        acc = checksum(out, acc)
    total = float(acc)
    elapsed = time.perf_counter() - t0
    assert np.isfinite(total)
    ips = B * iters / elapsed
    print(
        f"artifact decode (beam={beam}): batch={B} compile={compile_s:.1f}s "
        f"steady={elapsed / iters * 1e3:.1f}ms/iter {ips:,.0f} img/s"
    )


if __name__ == "__main__":
    main()
