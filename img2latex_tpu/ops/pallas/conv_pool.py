"""Fused conv3x3(SAME) + ReLU + maxpool2x2 Pallas kernel.

The encoder's perf cliff is HBM traffic, not FLOPs: XLA materializes each
pre-pool activation map at full resolution (e.g. conv1 at 64x800x32 = 3.3 GB
per 1024-batch, written then re-read by the pool — measured 13.9 ms for a
30 GFLOP convolution).  This kernel computes one image per grid program
entirely in VMEM: build the 3x3 im2col patches, one MXU matmul
``(H*W, 9*Cin) @ (9*Cin, Cout)``, ReLU, 2x2 max-pool — only the pooled
output returns to HBM (4x + channel-ratio less traffic).

Used by ``CNNEncoder`` when ``hardware.use_pallas_conv`` is enabled;
numerically identical to the XLA path (tests/test_pallas_conv.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_pool_kernel(H: int, W: int, Cin: int, Cout: int, x_ref, k_ref, out_ref, pat_ref):
    """One image: x (1, H, W, Cin), k (9*Cin, Cout) -> out (1, H/2, W/2, Cout).

    im2col patches are STORED into a VMEM scratch (Mosaic cannot concatenate
    shifted slices directly: "offset mismatch on non-concat dimension"), then
    contracted in one MXU matmul.
    """
    x = x_ref[0]  # (H, W, Cin)
    dtype = x.dtype
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))  # SAME halo
    for u in range(3):
        for v in range(3):
            idx = u * 3 + v
            pat_ref[:, :, idx * Cin : (idx + 1) * Cin] = jax.lax.slice(
                xp, (u, v, 0), (u + H, v + W, Cin)
            )
    pat = pat_ref[:].reshape(H * W, 9 * Cin)
    y = jnp.dot(pat, k_ref[:], preferred_element_type=jnp.float32)  # (H*W, Cout)
    y = jnp.maximum(y, 0.0).astype(dtype)
    y = y.reshape(H // 2, 2, W // 2, 2, Cout)
    y = jnp.max(jnp.max(y, axis=3), axis=1)  # (H/2, W/2, Cout)
    out_ref[0] = y


def _conv1_pool_kernel(H: int, W: int, Cout: int, x_ref, k_ref, out_ref, pat_ref):
    """Single-input-channel variant with W in the lane dimension.

    A channel-last layout with Cin=1 pads every VMEM buffer's lane dim from
    1 to 128 (measured 86 MB for a 64x800 image — over the 16 MB budget), so
    this kernel squeezes the channel: x (1, H, W); patches land in a
    (H, 9, W) scratch; a batched-over-H matmul (Cout, 9) x (9, W) contracts
    the taps; pool + transpose produce the channel-last output block.
    """
    x = x_ref[0]  # (H, W)
    dtype = x.dtype
    xp = jnp.pad(x, ((1, 1), (1, 1)))
    for u in range(3):
        for v in range(3):
            pat_ref[:, u * 3 + v, :] = jax.lax.slice(xp, (u, v), (u + H, v + W))
    pat = pat_ref[:]  # (H, 9, W)
    k = k_ref[:]  # (Cout, 9)
    kb = jnp.broadcast_to(k[None], (H, Cout, 9))
    # batched matmul over H: (Cout, 9) @ (9, W) -> (H, Cout, W)
    y = jax.lax.dot_general(
        kb, pat, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    y = jnp.maximum(y, 0.0).astype(dtype)
    y = y.reshape(H // 2, 2, Cout, W // 2, 2)
    y = jnp.max(jnp.max(y, axis=4), axis=1)  # (H/2, Cout, W/2)
    out_ref[0] = jnp.transpose(y, (0, 2, 1))  # (H/2, W/2, Cout)


def _fused_conv1(x: jnp.ndarray, kernel: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    B, H, W, _ = x.shape
    Cout = kernel.shape[-1]
    k2d = kernel.reshape(9, Cout).T.astype(x.dtype)  # (Cout, 9), taps (u,v) ordered
    kern = functools.partial(_conv1_pool_kernel, H, W, Cout)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, 9), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, H // 2, W // 2, Cout), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H // 2, W // 2, Cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((H, 9, W), x.dtype)],
        interpret=interpret,
    )(x[..., 0], k2d)


def fused_conv_relu_pool(x: jnp.ndarray, kernel: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """x (B, H, W, Cin) NHWC, kernel (3, 3, Cin, Cout) HWIO ->
    (B, H//2, W//2, Cout); equivalent to conv(SAME) -> relu -> maxpool(2,2)."""
    B, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    assert kernel.shape[:3] == (3, 3, Cin), f"expected (3,3,{Cin},Cout), got {kernel.shape}"
    assert H % 2 == 0 and W % 2 == 0, "H and W must be even for 2x2 pooling"
    if Cin == 1:
        return _fused_conv1(x, kernel, interpret)
    # (3,3,Cin,Cout) -> (9*Cin, Cout) with rows ordered (u, v, cin) to match
    # the kernel's patch concatenation order.
    k2d = kernel.reshape(9 * Cin, Cout).astype(x.dtype)
    kern = functools.partial(_conv_pool_kernel, H, W, Cin, Cout)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, Cin), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * Cin, Cout), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, H // 2, W // 2, Cout), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H // 2, W // 2, Cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((H, W, 9 * Cin), x.dtype)],
        interpret=interpret,
    )(x, k2d)
