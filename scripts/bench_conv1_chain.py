"""Chain bench: conv1 block + conv2 block, XLA-only vs Pallas-conv1-NCHW.

The phase-split kernel's native output is channel-first; an explicit
NCHW->NHWC transpose costs ~25 ms at B=3072 (measured) and erases the win.
This bench checks the alternative: feed conv2 the NCHW tensor directly via
``lax.conv_general_dilated`` dimension_numbers ('NCHW', 'HWIO', 'NHWC'),
re-entering channels-last "for free" inside the conv.  Compares the
conv1->conv2 chain end to end (both finish NHWC after pool2, checksummed).

Usage: python scripts/bench_conv1_chain.py [batch] [iters]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

IMG_H, IMG_W = 64, 800
C1, C2 = 32, 64


def main() -> None:
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from flax import linen as nn

    from img2latex_tpu.ops.pallas.conv1_phase import fused_conv1_pool

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 3072
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    dtype = jnp.bfloat16

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, IMG_H, IMG_W, 1)).astype(np.float32), dtype)
    k1 = jnp.asarray(rng.normal(size=(3, 3, 1, C1)).astype(np.float32) * 0.2, dtype)
    b1 = jnp.asarray(rng.normal(size=(C1,)).astype(np.float32) * 0.1)
    k2 = jnp.asarray(rng.normal(size=(3, 3, C1, C2)).astype(np.float32) * 0.05, dtype)
    b2 = jnp.asarray(rng.normal(size=(C2,)).astype(np.float32) * 0.1)

    def block2_nhwc(y):
        z = jax.lax.conv_general_dilated(
            y, k2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        z = jax.nn.relu(z + b2).astype(dtype)
        return nn.max_pool(z, (2, 2), (2, 2))

    def chain_xla(x):
        y = jax.lax.conv_general_dilated(
            x, k1, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        y = jax.nn.relu(y + b1).astype(dtype)
        y = nn.max_pool(y, (2, 2), (2, 2))
        return block2_nhwc(y)

    def chain_pallas(x):
        y = fused_conv1_pool(x, k1, b1, layout="nchw")  # (B, C1, H2, W2)
        z = jax.lax.conv_general_dilated(
            y, k2, (1, 1), "SAME", dimension_numbers=("NCHW", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        z = jax.nn.relu(z + b2).astype(dtype)
        return nn.max_pool(z, (2, 2), (2, 2))

    checksum = jax.jit(lambda t, acc: acc + jnp.sum(t.astype(jnp.float32)))
    results = {}
    for name, fn in (("chain_xla", jax.jit(chain_xla)), ("chain_pallas", jax.jit(chain_pallas))):
        t0 = time.perf_counter()
        out = fn(x)
        ref = float(checksum(out, jnp.float32(0)))
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
        print(f"{name}: compile={compile_s:.1f}s {ms:.2f} ms/iter checksum={ref:.1f}", flush=True)

    a, ar = results["chain_xla"]
    b, br = results["chain_pallas"]
    print(f"checksum rel diff: {abs(ar - br) / max(abs(ar), 1e-9):.2e}")
    print(f"speedup pallas-chain/xla-chain: {a / b:.3f}x")


if __name__ == "__main__":
    main()
