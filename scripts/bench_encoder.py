"""Microbench: CNN encoder forward on the chip, standard vs fused conv+pool.

The encoder dominates e2e greedy decode time (STATUS.md); its bottleneck is
conv1's full-resolution 64x800x32 pre-pool map round-tripping HBM.  The
``fused_conv_pool`` phase decomposition (models/encoder.py) computes
relu(max of 4 phase-shifted stride-2 convs) — algebraically identical, same
param tree — and never materializes that map.  This bench measures both paths
at reference scale so the flag's default can be set from data.

Timing follows bench.py's tunnel-safe pattern: pipelined dispatches with a
device-side checksum fetched once (block_until_ready is a no-op on the
tunneled axon platform and every host sync costs ~25-30 ms).

Usage: python scripts/bench_encoder.py [per-chip-batch] [iters]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

IMG_H, IMG_W, IMG_C = 64, 800, 1
EMBED = 512


def main() -> None:
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "jax")
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
    images_u8 = jnp.asarray(rng.integers(0, 256, size=(B, IMG_H, IMG_W, IMG_C), dtype=np.uint8))

    results = {}
    params = None
    for fused in (False, True):
        enc = CNNEncoder(embedding_dim=EMBED, dtype=dtype, fused_pool=fused)
        if params is None:  # identical param tree both ways
            params = enc.init(jax.random.PRNGKey(0), jnp.zeros((2, IMG_H, IMG_W, IMG_C), jnp.float32))

        def fwd(params, imgs_u8):
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
        results[fused] = (ms, ref)
        print(
            f"fused={fused} batch={B} compile={compile_s:.1f}s "
            f"{ms:.2f} ms/iter = {B / (elapsed / iters):.0f} img/s checksum={ref:.1f}",
            flush=True,
        )

    std_ms, std_ref = results[False]
    fus_ms, fus_ref = results[True]
    rel = abs(std_ref - fus_ref) / max(abs(std_ref), 1e-9)
    print(f"checksum rel diff: {rel:.2e} (bf16 path, expect ~1e-3)")
    print(f"speedup fused/standard: {std_ms / fus_ms:.3f}x")


if __name__ == "__main__":
    main()
