"""Decompose conv1_phase cost on chip: phase-split, NCHW-writing kernel
variant, and the shipped NHWC (in-kernel transpose) kernel.

The NCHW variant is the v2 design (dot + (C, H2, W2p) store, caller would
still owe a ~25 ms XLA transpose at B=3072); the NHWC path is what ships.
Their difference isolates the in-kernel swapaxes + crop-store cost.

Usage: python scripts/bench_conv1_parts.py [batch] [iters]
"""

from __future__ import annotations

import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from img2latex_tpu.ops.pallas.conv1_phase import (
        _TAPS,
        LANE,
        _round_up,
        fused_conv1_pool,
        pack_conv1_taps,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 3072
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    dtype = jnp.bfloat16
    H, W = IMG_H, IMG_W
    H2, W2 = H // 2, W // 2
    W2p = _round_up(W2, LANE)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, 1)).astype(np.float32), dtype)
    k = jnp.asarray(rng.normal(size=(3, 3, 1, COUT)).astype(np.float32) * 0.2, dtype)
    bias = jnp.asarray(rng.normal(size=(COUT,)).astype(np.float32) * 0.1)
    kT = pack_conv1_taps(k).astype(dtype)
    bias_col = jnp.asarray(bias, jnp.float32).reshape(COUT, 1)

    def split(x):
        x2 = x[..., 0]
        if W2p != W2:
            x2 = jnp.pad(x2, ((0, 0), (0, 0), (0, 2 * W2p - W)))
        return [x2[:, a::2, b::2] for a in range(2) for b in range(2)]

    planes = [jnp.asarray(p) for p in jax.jit(split)(x)]

    def _nchw_kernel(*refs):
        pls = {(0, 0): refs[0], (0, 1): refs[1], (1, 0): refs[2], (1, 1): refs[3]}
        kT_ref, bias_ref, out_ref, pat_ref = refs[4], refs[5], refs[6], refs[7]
        padded = {key: jnp.pad(ref[0], ((1, 1), (1, 1))) for key, ref in pls.items()}
        for s in range(4):
            ps, ds = _TAPS[s]
            for t in range(4):
                pt, dt = _TAPS[t]
                pat_ref[s * 4 + t] = jax.lax.slice(
                    padded[(ps, pt)], (1 + ds, 1 + dt), (1 + ds + H2, 1 + dt + W2p)
                )
        pat2 = pat_ref[:].reshape(16, H2 * W2p)
        y = jnp.dot(kT_ref[:], pat2, preferred_element_type=jnp.float32)
        y = jnp.max(y.reshape(4, COUT, H2 * W2p), axis=0)
        y = jnp.maximum(y + bias_ref[:], 0.0).astype(kT_ref.dtype)
        out_ref[0] = y.reshape(COUT, H2, W2p)

    def raw_nchw(*planes):
        plane_spec = pl.BlockSpec((1, H2, W2p), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _nchw_kernel,
            grid=(B,),
            in_specs=[plane_spec] * 4
            + [
                pl.BlockSpec((4 * COUT, 16), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((COUT, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, COUT, H2, W2p), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, COUT, H2, W2p), dtype),
            scratch_shapes=[pltpu.VMEM((16, H2, W2p), dtype)],
        )(*planes, kT, bias_col)

    checksum = jax.jit(lambda t, acc: acc + t)

    def run(name, fn, args):
        t0 = time.perf_counter()
        ref = float(checksum(fn(*args), jnp.float32(0)))
        compile_s = time.perf_counter() - t0
        acc = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = checksum(fn(*args), acc)
        total = float(acc)
        elapsed = time.perf_counter() - t0
        assert np.isfinite(total)
        print(
            f"{name}: compile={compile_s:.1f}s {elapsed / iters * 1e3:.2f} ms/iter "
            f"checksum={ref:.1f}",
            flush=True,
        )

    run(
        "phase_split",
        jax.jit(lambda x: sum(jnp.sum(p.astype(jnp.float32)) for p in split(x))),
        (x,),
    )
    run(
        "kernel_nchw",
        jax.jit(lambda *p: jnp.sum(raw_nchw(*p).astype(jnp.float32))),
        tuple(planes),
    )
    run(
        "kernel_nhwc_full",
        jax.jit(lambda x: jnp.sum(fused_conv1_pool(x, k, bias).astype(jnp.float32))),
        (x,),
    )


if __name__ == "__main__":
    main()
