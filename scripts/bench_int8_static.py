"""Microbench: int8 conv chain with STATIC activation scales vs dynamic vs bf16.

bench_int8.py measured the dynamic-quantization path at 0.85x vs bf16 XLA:
the per-tensor abs-max reduction + separate quantize pass adds full HBM
round-trips of the largest activation tensors, swamping the 2x int8 MXU
rate.  With *static* (calibration-time) activation scales the quantize is
pure elementwise — XLA can fuse the round/clip/cast into the previous
block's relu+pool epilogue, so blocks hand each other int8 tensors (half
the HBM bytes of bf16).  This bench answers whether that formulation wins
before we invest in calibration plumbing.

Variants (functional 3-block chain, params from a real CNNEncoder init):
  bf16     — conv+bias+relu+pool in bf16 (the XLA baseline)
  dyn-int8 — ops/int8.py conv_block_int8 (per-tensor dynamic scales)
  static   — int8 weights (per-channel) + int8 activations with scales
             passed in as host constants; each block's epilogue emits int8

Usage: python scripts/bench_int8_static.py [batch] [iters]

MEASURED (v5e, 2026-08-18, batch 3072, 20 iters): bf16 73.96 ms = 41,536
img/s; dyn-int8 87.02 ms (0.850x); static 88.36 ms (**0.837x — slower than
dynamic**).  Static scales do NOT rescue int8 convs on this toolchain: XLA
does not run the int8xint8->int32 convs anywhere near the 2x MXU rate at
these shapes, so removing the abs-max pass doesn't matter.  Together with
bench_int8.py and probe_int8_matmul.py (1.09-1.25x at decode shapes), the
int8-encoder direction is closed: bf16 is the production path.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

IMG_H, IMG_W, IMG_C = 64, 800, 1


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
    from img2latex_tpu.ops.int8 import conv_block_int8, quantize_per_channel
    from img2latex_tpu.ops.preprocess import normalize_images

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 3072
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    dtype = jnp.bfloat16

    rng = np.random.default_rng(0)
    images_u8 = jnp.asarray(
        rng.integers(0, 256, size=(B, IMG_H, IMG_W, IMG_C), dtype=np.uint8)
    )

    enc = CNNEncoder(embedding_dim=512, dtype=dtype)
    variables = enc.init(
        jax.random.PRNGKey(0), jnp.zeros((2, IMG_H, IMG_W, IMG_C), jnp.float32)
    )
    convs = [
        (
            variables["params"][f"Conv_{i}"]["kernel"],
            variables["params"][f"Conv_{i}"]["bias"],
        )
        for i in range(3)
    ]

    def pool(y):
        return jax.lax.reduce_window(
            y, jnp.array(-jnp.inf, y.dtype), jax.lax.max,
            (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
        )

    def conv(x, k, preferred=None):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=preferred,
        )

    # ---- bf16 baseline ------------------------------------------------
    def chain_bf16(imgs_u8):
        x = normalize_images(imgs_u8, compute_dtype=dtype)
        for k, b in convs:
            x = pool(jax.nn.relu(conv(x, k.astype(dtype)) + b.astype(dtype)))
        return x

    # ---- dynamic int8 (the shipped opt-in) -----------------------------
    def chain_dyn(imgs_u8):
        x = normalize_images(imgs_u8, compute_dtype=dtype)
        for k, b in convs:
            x = conv_block_int8(x, k, b, 2, dtype)
        return x

    # ---- static-scale int8: blocks hand each other int8 tensors --------
    # Calibrate scales from a small batch (one-time cost, outside the timed
    # loop — in the product this would be Predictor-init calibration).  Jit
    # the whole chain and subsample the batch: an eager op-by-op f32 chain at
    # B=3072 materializes every intermediate and OOMs the chip.
    qconvs = [quantize_per_channel(k) for k, _ in convs]

    @jax.jit
    def calibrate(imgs_u8):
        x = normalize_images(imgs_u8, compute_dtype=dtype)
        scales = [jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0]
        for k, b in convs:
            x = pool(jax.nn.relu(conv(x, k.astype(dtype)) + b.astype(dtype)))
            scales.append(jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0)
        return jnp.stack(scales)

    scales = [float(s) for s in calibrate(images_u8[: min(B, 256)])]
    print(f"calibrated activation scales: {[f'{s:.4f}' for s in scales]}", flush=True)

    def chain_static(imgs_u8):
        # Block 1 stays bf16: it is HBM-bound (the full-res pre-pool map) and
        # an int8->int32 conv1 output cannot fuse with the pool — XLA
        # materializes s32[B,64,800,32] (20 GB at B=3072, OOM).  int8 applies
        # to the compute-bound blocks 2..n with static scales: each block's
        # epilogue emits int8 at the next block's scale, halving inter-block
        # HBM bytes vs bf16.
        x = normalize_images(imgs_u8, compute_dtype=dtype)
        k0, b0 = convs[0]
        y = pool(jax.nn.relu(conv(x, k0.astype(dtype)) + b0.astype(dtype)))
        sx = scales[1]
        xq = jnp.clip(jnp.round(y.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
        for i in range(1, len(convs)):
            kq, sw = qconvs[i]
            b = convs[i][1]
            y = conv(xq, kq, preferred=jnp.int32)
            y = y.astype(jnp.float32) * (sx * sw) + b.astype(jnp.float32)
            y = pool(jax.nn.relu(y))
            if i + 1 < len(convs):
                sx = scales[i + 1]
                xq = jnp.clip(jnp.round(y / sx), -127, 127).astype(jnp.int8)
        return y.astype(dtype)

    checksum = jax.jit(lambda t, acc: acc + jnp.sum(t.astype(jnp.float32)))
    base_ms = None
    for name, fn in (("bf16", chain_bf16), ("dyn-int8", chain_dyn), ("static", chain_static)):
        run = jax.jit(fn)
        t0 = time.perf_counter()
        out = run(images_u8)
        ref = float(checksum(out, jnp.float32(0)))
        compile_s = time.perf_counter() - t0
        acc = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(images_u8)
            acc = checksum(out, acc)
        total = float(acc)  # single sync
        elapsed = time.perf_counter() - t0
        assert np.isfinite(total)
        ms = elapsed / iters * 1e3
        if base_ms is None:
            base_ms = ms
        print(
            f"{name:8s} batch={B} compile={compile_s:.1f}s {ms:.2f} ms/iter = "
            f"{B / (elapsed / iters):.0f} img/s ({base_ms / ms:.3f}x vs bf16) "
            f"checksum={ref:.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
