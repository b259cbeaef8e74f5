"""Microbench: conv1 block (conv3x3 Cin=1 + bias + relu + maxpool2) on chip.

Compares XLA's conv+pool against the phase-split Pallas kernel
(ops/pallas/conv1_phase.py) at reference scale.  Timing: pipelined dispatches
+ device-side checksum (see bench.py — block_until_ready is a no-op on the
tunneled platform).

Usage: python scripts/bench_conv1.py [batch] [iters]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

IMG_H, IMG_W = 64, 800
COUT = 32


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
    k = jnp.asarray(rng.normal(size=(3, 3, 1, COUT)).astype(np.float32) * 0.2, dtype)
    b = jnp.asarray(rng.normal(size=(COUT,)).astype(np.float32) * 0.1)

    def xla_path(x):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        y = jax.nn.relu(y + b).astype(dtype)
        return nn.max_pool(y, (2, 2), (2, 2))

    def pallas_path(x):
        return fused_conv1_pool(x, k, b)

    def pallas_nhwc_kernel(x):
        return fused_conv1_pool(x, k, b, layout="nhwc_kernel")

    checksum = jax.jit(lambda t, acc: acc + jnp.sum(t.astype(jnp.float32)))
    results = {}
    for name, fn in (
        ("xla", jax.jit(xla_path)),
        ("pallas_phase", jax.jit(pallas_path)),
        ("pallas_nhwc_kernel", jax.jit(pallas_nhwc_kernel)),
    ):
        t0 = time.perf_counter()
        out = fn(x)
        ref = float(checksum(out, jnp.float32(0)))
        compile_s = time.perf_counter() - t0

        acc = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
            acc = checksum(out, acc)
        total = float(acc)
        elapsed = time.perf_counter() - t0
        assert np.isfinite(total)
        ms = elapsed / iters * 1e3
        results[name] = (ms, ref)
        print(
            f"{name}: batch={B} compile={compile_s:.1f}s {ms:.2f} ms/iter "
            f"= {B / (elapsed / iters):.0f} img/s checksum={ref:.1f}",
            flush=True,
        )

    xla_ms, xla_ref = results["xla"]
    pal_ms, pal_ref = results["pallas_phase"]
    rel = abs(xla_ref - pal_ref) / max(abs(xla_ref), 1e-9)
    print(f"checksum rel diff: {rel:.2e} (bf16; expect ~1e-3)")
    print(f"speedup pallas/xla: {xla_ms / pal_ms:.3f}x")


if __name__ == "__main__":
    main()
