"""Microbench: selective-beam decode throughput vs greedy and full beam.

Selective beam (``inference.selective_beam_frac``) runs the whole-greedy
kernel with in-kernel confidence accumulation over everything, then the
whole-beam kernel over only the ``frac`` least-confident rows
(``predictor.py`` routing; semantics in ``decoding/decode.py``).  Expected
cost model: t(frac) ~ t_greedy_with_scores + frac * t_beam — this bench
measures the actual curve at reference scale (vocab 503, 64x800, embed/
hidden 512, 141 steps, bf16, vector memory).

Usage: python scripts/bench_selective.py [batch] [beam_size] [iters] [--grid]
Prints one JSON line per variant: greedy, beam, selective @ 0.1/0.2/0.3.
``--grid``: grid-memory flagship shapes (embed 256 / hidden 384, S=100,
in-kernel attention — ops/pallas/grid_decode.py) instead of the vector
reference scale.
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
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import jax

    cache_dir = os.path.join(repo, ".cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from img2latex_tpu.config import Config
    from img2latex_tpu.decoding.decode import DecodeConfig, select_uncertain
    from img2latex_tpu.models.seq2seq import Seq2SeqModel, build_model
    from img2latex_tpu.ops.pallas.beam_decode import pallas_full_beam_decode
    from img2latex_tpu.ops.pallas.decode_step import (
        pack_decoder_weights,
        pallas_full_greedy_decode,
    )
    from img2latex_tpu.ops.preprocess import normalize_images

    grid = "--grid" in sys.argv
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(argv[0]) if argv else 3072
    K = int(argv[1]) if len(argv) > 1 else 5
    iters = int(argv[2]) if len(argv) > 2 else 10

    cfg = Config()
    if grid:
        cfg.model.memory = "grid"
        cfg.model.embedding_dim = 256
        cfg.model.decoder.hidden_dim = 384
    else:
        cfg.model.embedding_dim = EMBED
        cfg.model.decoder.hidden_dim = HIDDEN
    cfg.model.decoder.lstm_layers = LAYERS
    cfg.model.decoder.dropout = 0.0
    cfg.model.encoder.cnn.img_height = IMG_H
    cfg.model.encoder.cnn.img_width = IMG_W
    cfg.hardware.compute_dtype = "bfloat16"
    cfg.hardware.pallas_conv1 = jax.default_backend() in ("tpu", "axon")
    model = build_model(cfg, VOCAB)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, size=(B, IMG_H, IMG_W, IMG_C), dtype=np.uint8)
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, IMG_H, IMG_W, IMG_C)),
        jnp.zeros((2, 8), jnp.int32),
    )
    dt = jnp.bfloat16
    dcfg = DecodeConfig(max_length=MAX_LEN, start_id=1, end_id=2, pad_id=0, beam_size=K)
    packed = pack_decoder_weights(params, VOCAB, dt)
    att = None
    if grid:
        from img2latex_tpu.ops.pallas.grid_decode import (
            pack_attention_weights,
            pallas_full_grid_beam_decode,
            pallas_full_grid_greedy_decode,
        )

        att = pack_attention_weights(params, dt)

    def encode(params, images_u8):
        x = normalize_images(images_u8, compute_dtype=dt)
        mem = model.apply(params, x, method=Seq2SeqModel.encode)
        return mem if grid else mem[:, 0, :]

    def g_decode(ctx, return_scores=False):
        if grid:
            return pallas_full_grid_greedy_decode(
                packed, att, ctx, MAX_LEN, dcfg.start_id, dcfg.end_id,
                dcfg.pad_id, return_scores=return_scores,
            )
        return pallas_full_greedy_decode(
            packed, ctx, MAX_LEN, dcfg.start_id, dcfg.end_id, dcfg.pad_id,
            return_scores=return_scores,
        )

    def b_decode(ctx):
        if grid:
            return pallas_full_grid_beam_decode(packed, att, ctx, K, dcfg)[0]
        return pallas_full_beam_decode(packed, ctx, K, dcfg)[0]

    def make_run(frac: float, mode: str):
        def decode(params, images_u8):
            ctx = encode(params, images_u8)
            if mode == "greedy":
                return g_decode(ctx)
            if mode == "beam":
                return b_decode(ctx)
            tokens_g, scores = g_decode(ctx, return_scores=True)
            import math

            k = max(1, math.ceil(frac * B))
            idx = select_uncertain(tokens_g, scores, k, dcfg.pad_id)
            tokens_b = b_decode(jnp.take(ctx, idx, axis=0))
            return tokens_g.at[idx].set(tokens_b)

        return jax.jit(decode)

    checksum = jax.jit(lambda t, acc: acc + jnp.sum(t.astype(jnp.int64)))
    variants = [("greedy", 0.0), ("beam", 0.0)] + [
        ("selective", f) for f in (0.1, 0.2, 0.3)
    ]
    results = {}
    for mode, frac in variants:
        run = make_run(frac, mode)
        t0 = time.perf_counter()
        out = run(params, images)
        _ = float(checksum(out, jnp.int64(0)))
        compile_s = time.perf_counter() - t0
        acc = jnp.int64(0)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = checksum(run(params, images), acc)
        _ = float(acc)
        elapsed = time.perf_counter() - t0
        ips = B * iters / elapsed
        name = mode if mode != "selective" else f"selective_{frac:g}"
        results[name] = round(ips, 1)
        print(
            json.dumps(
                {
                    "metric": f"{name}_images_per_sec",
                    "value": round(ips, 1),
                    "unit": "img/s",
                    "compile_s": round(compile_s, 1),
                    "steady_ms": round(elapsed / iters * 1e3, 1),
                }
            ),
            flush=True,
        )
    if "beam" in results and "greedy" in results:
        print(
            json.dumps(
                {
                    "summary": results,
                    "selective_0.2_vs_beam": round(
                        results.get("selective_0.2", 0) / results["beam"], 2
                    ),
                }
            )
        )


if __name__ == "__main__":
    main()
