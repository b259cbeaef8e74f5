"""Full-encoder bench: XLA vs pallas_conv1 vs pallas_chain (channel-first).

The round-1 frontier (VERDICT "weak #1"): at B=3072 the CNN encoder is
74.4 ms of the 110.7 ms e2e decode iteration, and the shipped pallas_conv1
nets only 1.06x because the NCHW->NHWC re-entry eats the kernel's 3x core
win.  ``hardware.pallas_chain`` runs the whole conv stack channel-first
(conv1_phase + conv_cf kernels) and absorbs the layout in the Dense head's
weight order — no transpose anywhere.  This bench measures the three
encoder configurations end to end (image -> (B, E) embedding or grid).

Usage: python scripts/bench_encoder_chain.py [batch] [iters] [vector|grid]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

IMG_H, IMG_W = 64, 800


def main() -> None:
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "jax"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from img2latex_tpu.models.encoder import CNNEncoder

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 3072
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    output = sys.argv[3] if len(sys.argv) > 3 else "vector"
    dtype = jnp.bfloat16

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, IMG_H, IMG_W, 1)).astype(np.float32), dtype)

    variants = {
        "xla": CNNEncoder(output=output, dtype=dtype),
        "conv1": CNNEncoder(output=output, dtype=dtype, pallas_conv1=True),
        "chain": CNNEncoder(output=output, dtype=dtype, pallas_chain=True),
    }
    params = variants["xla"].init(jax.random.PRNGKey(0), x[:1])

    checksum = jax.jit(lambda t, acc: acc + jnp.sum(t.astype(jnp.float32)))
    results = {}
    for name, enc in variants.items():
        fn = jax.jit(lambda xx, e=enc: e.apply(params, xx))
        t0 = time.perf_counter()
        ref = float(checksum(fn(x), jnp.float32(0)))
        compile_s = time.perf_counter() - t0
        acc = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = checksum(fn(x), acc)
        total = float(acc)
        elapsed = time.perf_counter() - t0
        assert np.isfinite(total)
        ms = elapsed / iters * 1e3
        results[name] = (ms, ref)
        print(
            f"{name:6s}: compile={compile_s:.1f}s {ms:.2f} ms/iter "
            f"({B / (elapsed / iters):,.0f} img/s) checksum={ref:.1f}",
            flush=True,
        )

    base_ms, base_ref = results["xla"]
    for name in ("conv1", "chain"):
        ms, ref = results[name]
        rel = abs(ref - base_ref) / max(abs(base_ref), 1e-9)
        print(f"{name}: {base_ms / ms:.3f}x vs xla, checksum rel diff {rel:.2e}")


if __name__ == "__main__":
    main()
