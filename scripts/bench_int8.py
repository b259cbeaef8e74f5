"""Microbench: int8-quantized CNN encoder vs the bf16 XLA path on chip.

The v5e MXU runs int8 at 2x the bf16 rate (394 vs 197 TOP/s) and the
encoder's conv2/conv3 are its compute-bound blocks (autopsies in
``ops/pallas/conv1_phase.py`` / ``conv_cf.py``).  ``hardware.int8_encoder``
(ops/int8.py) computes conv blocks as int8xint8->int32 with per-channel
weight and per-tensor dynamic activation scales.  This bench measures:

  xla        — bf16 conv blocks (the default)
  int8       — all blocks int8
  conv1+int8 — block 1 via the exact Pallas phase-split kernel (HBM-bound,
               int8 can't help it), blocks 2..n int8 (compute-bound)

Timing follows bench.py's tunnel-safe pattern: pipelined dispatches with a
device-side checksum fetched once (block_until_ready is a no-op on the
tunneled axon platform and every host sync costs ~25-30 ms).

Usage: python scripts/bench_int8.py [per-chip-batch] [iters]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

IMG_H, IMG_W, IMG_C = 64, 800, 1
EMBED = 512


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import jax

    cache_dir = os.path.join(repo, ".cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from img2latex_tpu.models.encoder import CNNEncoder
    from img2latex_tpu.ops.preprocess import normalize_images

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 3072
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    dtype = jnp.bfloat16

    rng = np.random.default_rng(0)
    images_u8 = jnp.asarray(
        rng.integers(0, 256, size=(B, IMG_H, IMG_W, IMG_C), dtype=np.uint8)
    )

    variants = {
        "xla": dict(),
        "int8": dict(int8=True),
        "conv1+int8": dict(int8=True, pallas_conv1=True),
    }
    params = None
    base_ms = None
    for name, kw in variants.items():
        enc = CNNEncoder(embedding_dim=EMBED, dtype=dtype, **kw)
        if params is None:  # identical param tree across all variants
            params = enc.init(
                jax.random.PRNGKey(0), jnp.zeros((2, IMG_H, IMG_W, IMG_C), jnp.float32)
            )

        def fwd(params, imgs_u8, enc=enc):
            x = normalize_images(imgs_u8, compute_dtype=dtype)
            return enc.apply(params, x)

        run = jax.jit(fwd)
        checksum = jax.jit(lambda t, acc: acc + jnp.sum(t.astype(jnp.float32)))

        t0 = time.perf_counter()
        out = run(params, images_u8)
        ref = float(checksum(out, jnp.float32(0)))
        compile_s = time.perf_counter() - t0

        acc = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(params, images_u8)
            acc = checksum(out, acc)
        total = float(acc)  # single sync
        elapsed = time.perf_counter() - t0
        assert np.isfinite(total)
        ms = elapsed / iters * 1e3
        if base_ms is None:
            base_ms = ms
        print(
            f"{name:11s} batch={B} compile={compile_s:.1f}s {ms:.2f} ms/iter = "
            f"{B / (elapsed / iters):.0f} img/s ({base_ms / ms:.3f}x vs xla) "
            f"checksum={ref:.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
