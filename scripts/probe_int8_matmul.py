"""Probe: int8 matmul throughput vs bf16 at decode-kernel shapes, on chip.

Two questions gate an int8 decode-kernel investment:
  1. XLA: does ``lax.dot_general`` int8xint8->int32 actually run at ~2x the
     bf16 rate on the decode matmul shapes ((B,1024)x(1024,2048))?  The
     encoder's int8 *conv* lost 0.85x, but conv carries im2col/layout
     overheads matmul doesn't.
  2. Mosaic: does an int8 dot lower inside a Pallas TPU kernel at all
     (interpret mode is permissive; the real compiler is the test)?

Usage: python scripts/probe_int8_matmul.py [B] [iters]

Measured on chip (v5e, B=6144, 2026-08-17):

    xla bf16       1.193 ms = 21.6 TFLOP/s
    xla int8       1.081 ms = 23.8 TOP/s   (1.10x)
    xla int8+eplg  0.954 ms = 27.0 TOP/s   (1.25x)
    pallas int8    1.099 ms = 23.5 TOP/s   (1.09x, Mosaic lowers it fine)
    pallas bf16    1.109 ms                 (1.08x)

Verdict: int8 pays ~1.1-1.25x at the decode matmul shapes, not the 2x MXU
rate — both paths sit far below the MXU peak (21-27 of ~200 TFLOP/s), so the
bound is not issue rate and halving operand width barely moves it.  An int8
decode-kernel variant would buy <<1.1x e2e (the kernel's matmuls are already
VMEM-fed) at a real quality risk — not built.  This matches the int8 encoder
result (0.85x dynamic, 0.835x static scales, `ops/int8.py` docstring).
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import jax

    cache_dir = os.path.join(repo, ".cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 6144
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    K, N = 1024, 2048  # the decode LSTM W_ih shape

    rng = np.random.default_rng(0)
    x_bf = jnp.asarray(rng.normal(size=(B, K)), dtype=jnp.bfloat16)
    w_bf = jnp.asarray(rng.normal(size=(K, N)), dtype=jnp.bfloat16)
    x_i8 = jnp.asarray(rng.integers(-127, 128, size=(B, K), dtype=np.int8))
    w_i8 = jnp.asarray(rng.integers(-127, 128, size=(K, N), dtype=np.int8))

    checksum = jax.jit(lambda t, acc: acc + jnp.sum(t.astype(jnp.float32)))

    def bench(name, fn, *args):
        run = jax.jit(fn)
        t0 = time.perf_counter()
        out = run(*args)
        ref = float(checksum(out, jnp.float32(0)))
        compile_s = time.perf_counter() - t0
        acc = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(*args)
            acc = checksum(out, acc)
        total = float(acc)
        elapsed = time.perf_counter() - t0
        assert np.isfinite(total)
        ms = elapsed / iters * 1e3
        tops = 2 * B * K * N / (ms / 1e3) / 1e12
        print(
            f"{name:14s} compile={compile_s:.1f}s {ms:.3f} ms = {tops:.1f} T(FL)OP/s "
            f"checksum={ref:.3e}",
            flush=True,
        )
        return ms

    ms_bf = bench("xla bf16", lambda x, w: jnp.dot(x, w), x_bf, w_bf)
    ms_i8 = bench(
        "xla int8",
        lambda x, w: jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ),
        x_i8, w_i8,
    )
    print(f"xla int8 speedup: {ms_bf / ms_i8:.3f}x", flush=True)

    # int8 with the epilogue the kernel would need (scale to f32)
    sw = jnp.asarray(rng.uniform(0.01, 0.02, size=(N,)), dtype=jnp.float32)
    ms_i8e = bench(
        "xla int8+eplg",
        lambda x, w: (
            jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            ).astype(jnp.float32)
            * sw
        ).astype(jnp.bfloat16),
        x_i8, w_i8,
    )
    print(f"xla int8+eplg speedup: {ms_bf / ms_i8e:.3f}x", flush=True)

    # ---- Mosaic: int8 dot inside a Pallas kernel ------------------------
    TB = 512  # batch tile

    def mm_kernel(x_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    @jax.jit
    def pallas_mm(x, w):
        return pl.pallas_call(
            mm_kernel,
            grid=(B // TB,),
            in_specs=[
                pl.BlockSpec((TB, K), lambda i: (i, 0)),
                pl.BlockSpec((K, N), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((TB, N), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, N), jnp.int32),
        )(x, w)

    try:
        ms_pl = bench("pallas int8", pallas_mm, x_i8, w_i8)
        print(f"pallas int8 vs xla bf16: {ms_bf / ms_pl:.3f}x", flush=True)
    except Exception as e:  # Mosaic rejection is a result, not a crash
        print(f"pallas int8 FAILED: {type(e).__name__}: {str(e)[:500]}", flush=True)

    # bf16 pallas reference for kernel-overhead comparison
    def mm_kernel_bf(x_ref, w_ref, o_ref):
        o_ref[...] = jnp.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.float32)

    @jax.jit
    def pallas_mm_bf(x, w):
        return pl.pallas_call(
            mm_kernel_bf,
            grid=(B // TB,),
            in_specs=[
                pl.BlockSpec((TB, K), lambda i: (i, 0)),
                pl.BlockSpec((K, N), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((TB, N), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        )(x, w)

    try:
        ms_plbf = bench("pallas bf16", pallas_mm_bf, x_bf, w_bf)
        print(f"pallas bf16 vs xla bf16: {ms_bf / ms_plbf:.3f}x", flush=True)
    except Exception as e:
        print(f"pallas bf16 FAILED: {type(e).__name__}: {str(e)[:500]}", flush=True)


if __name__ == "__main__":
    main()
