"""int8 quantized conv blocks for the CNN encoder (inference fast path).

The v5e MXU runs int8 matmuls/convs at 2x the bf16 rate (394 vs 197
TOP/s), and the encoder's conv2/conv3 are its compute-bound blocks (the
round-1/2 autopsies in ``ops/pallas/conv1_phase.py`` / ``conv_cf.py``).
This module computes conv+bias+relu+maxpool with:

* **per-output-channel symmetric int8 weights** — ``scale_c =
  max|k[..., c]| / 127`` (trace-time arithmetic on the live params; no
  separate quantized checkpoint),
* **per-tensor dynamic symmetric int8 activations** — ``scale_x =
  max|x| / 127`` over the batch (one fused reduction; activations are
  post-ReLU and well-conditioned),
* int8 x int8 -> int32 ``lax.conv_general_dilated``
  (``preferred_element_type=int32`` — probed working on both the TPU
  MXU and the CPU backend),
* float epilogue ``y_int32 * (scale_x * scale_c) + bias`` then ReLU+pool.

SAME padding pads int8 zeros == the f32 conv's zero padding, so the only
deviation from the f32 path is quantization rounding.  Quality impact is
measured per checkpoint with ``scripts/ab_pallas_decode.py --int8``
(BLEU deltas recorded in the artifacts); the flag
(``hardware.int8_encoder``) is an inference-side opt-in, ignored during
training.

**Measured on a v5e chip** (``scripts/bench_int8.py``, batch 3072,
encoder forward): xla bf16 74.8 ms, int8 88.2 ms (**0.85x**),
conv1-kernel+int8 85.5 ms (0.87x).  The dynamic per-tensor abs-max adds a
full HBM read of each block's input and the separate quantize pass adds a
read+write — those extra passes of the chain's largest tensors cost more
than the 2x int8 MXU rate saves (the blocks are less compute-bound than
their FLOP count suggests).  The static-scale formulation
(``scripts/bench_int8_static.py``: calibrated scales, quantize fused into
the previous epilogue, int8 inter-block tensors = half the HBM bytes) is
no better — 88.1 ms (**0.835x**); and an int8 conv1 is unusable outright:
its int8->int32 output cannot fuse with the pool, so XLA materializes
s32[B,64,800,32] (20 GB at B=3072, OOM).  Conclusion: on this toolchain
``lax.conv_general_dilated`` int8->int32 does not pay on these shapes;
the flag stays a correctness-tested opt-in for future toolchains.

Reference semantics covered: conv blocks of ``encoder.py:74-107``
(conv 3x3 SAME + ReLU + maxpool) — numerically approximate by design.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def quantize_per_channel(kernel: jnp.ndarray, eps: float = 1e-8):
    """(kh, kw, cin, cout) float -> (int8 kernel, (cout,) f32 scales)."""
    amax = jnp.max(jnp.abs(kernel.astype(jnp.float32)), axis=(0, 1, 2))
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(kernel.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_per_tensor(x: jnp.ndarray, eps: float = 1e-8):
    """float tensor -> (int8 tensor, scalar f32 scale), symmetric."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def conv_block_int8(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    pool_size: int,
    dtype: Any,
) -> jnp.ndarray:
    """Quantized conv3x3(SAME)+bias+ReLU+maxpool block, NHWC.

    Returns the pooled activations in ``dtype``.  Approximates the f32
    block to int8 rounding (per-channel weights, per-tensor activations).
    """
    kq, sw = quantize_per_channel(kernel)
    xq, sx = quantize_per_tensor(x)
    y = jax.lax.conv_general_dilated(
        xq,
        kq,
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (sx * sw) + bias.astype(jnp.float32)
    y = jax.nn.relu(y).astype(dtype)
    return jax.lax.reduce_window(
        y,
        jnp.array(-jnp.inf, dtype),
        jax.lax.max,
        (1, pool_size, pool_size, 1),
        (1, pool_size, pool_size, 1),
        "VALID",
    )
