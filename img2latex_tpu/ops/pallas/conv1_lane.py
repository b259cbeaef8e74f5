"""Single-channel conv3x3+ReLU+pool2x2 with lane-aligned W tiles.  [EXPERIMENTAL]

Second attempt at the conv1 bottleneck (see ``conv_pool.py`` STATUS note).
Strategy: keep W in the lane dimension end to end so no buffer ever pays the
Cin=1 128x lane-padding tax:

* W is padded to a multiple of 128 in XLA and split into 128-lane tiles with
  a +-1 column halo (130-wide input blocks);
* patches land in a ``(9, H, 128)`` scratch via leading-index stores (layout
  preserved — no relayout);
* the tap contraction is ONE MXU matmul ``(Cout, 9) @ (9, H*128)`` after a
  lane-tile-aligned merge reshape;
* W-pair max-pool uses a roll + 0/1 compaction matmul (stride-2 lane gathers
  are unsupported); H-pair pooling is a sublane-split reshape max.

Output is (B, H/2, Wp/2, Cout) channel-last; the caller crops the padded
columns.  Parity in tests/test_pallas_conv.py (interpret mode).

STATUS: bit-exact on the v5e chip (checksum-identical to XLA) but 58.9 ms vs
XLA's 14.6 ms at B=1024 — the (image x lane-tile) grid is 7,168 tiny
programs and per-program overhead dominates.  Conclusion across both conv
kernels: on this toolchain XLA's conv emitters win; Pallas pays off for
weight-resident sequential loops (decode), not for convolutions.  Kept as a
correctness-tested reference for round-2 experiments (fewer, larger grid
programs with double-buffered DMA would be the next iteration).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _kernel(H: int, Cout: int, x_ref, k_ref, sel_ref, out_ref, pat_ref):
    """x (1, 1, H, 130); k (Cout, 9); sel (128, 64); out (1, 1, H/2, 64, Cout)."""
    x = x_ref[0, 0]  # (H, 130)
    dtype = x.dtype
    xp = jnp.pad(x, ((1, 1), (0, 0)))  # row halo
    for u in range(3):
        for v in range(3):
            pat_ref[u * 3 + v] = jax.lax.slice(xp, (u, v), (u + H, v + LANE))
    pat2 = pat_ref[:].reshape(9, H * LANE)  # lane-tile-aligned merge
    y = jnp.dot(k_ref[:], pat2, preferred_element_type=jnp.float32)  # (Cout, H*128)
    y = jnp.maximum(y, 0.0)
    # W-pair max: neighbor at w+1 == roll by N-1 (pltpu.roll shifts right and
    # requires a non-negative amount).
    yn = pltpu.roll(y, H * LANE - 1, 1)
    ymax = jnp.maximum(y, yn).astype(dtype)  # even w positions hold pair max
    # Compact even lanes: (Cout, H*128) -> per-H-tile (.., 128) @ sel (128, 64)
    y3 = ymax.reshape(Cout, H, LANE)
    sel = sel_ref[:].astype(dtype)  # (128, 64), sel[2j, j] = 1
    yw = jax.lax.dot_general(
        y3, sel, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Cout, H, 64)
    # H-pair max: split sublanes.
    yh = yw.reshape(Cout, H // 2, 2, LANE // 2)
    pooled = jnp.max(yh, axis=2).astype(dtype)  # (Cout, H/2, 64)
    out_ref[0, 0] = jnp.transpose(pooled, (1, 2, 0))  # (H/2, 64, Cout)


def conv1_lane_relu_pool(x: jnp.ndarray, kernel: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """x (B, H, W, 1), kernel (3, 3, 1, Cout) -> (B, H/2, W/2, Cout).

    Equivalent to conv(SAME, zero padding) -> relu -> maxpool(2,2).  W is
    internally padded to a multiple of 128 with zeros; the padded region's
    pooled columns are cropped from the output.
    """
    B, H, W, Cin = x.shape
    assert Cin == 1
    Cout = kernel.shape[-1]
    Wp = ((W + LANE - 1) // LANE) * LANE
    n_tiles = Wp // LANE
    x2 = x[..., 0]  # (B, H, W)
    # zero-pad W to Wp (SAME conv pads zeros anyway) then halo the tiles
    xw = jnp.pad(x2, ((0, 0), (0, 0), (0, Wp - W)))
    xh = jnp.pad(xw, ((0, 0), (0, 0), (1, 1)))  # column halo source
    tiles = [
        jax.lax.slice(xh, (0, 0, t * LANE), (B, H, t * LANE + LANE + 2))
        for t in range(n_tiles)
    ]
    x_tiles = jnp.stack(tiles, axis=1)  # (B, T, H, 130)

    k2d = jnp.asarray(kernel.reshape(9, Cout).T, x.dtype)  # (Cout, 9)
    sel = np.zeros((LANE, LANE // 2), np.float32)
    sel[np.arange(0, LANE, 2), np.arange(LANE // 2)] = 1.0
    sel = jnp.asarray(sel, x.dtype)

    kern = functools.partial(_kernel, H, Cout)
    out = pl.pallas_call(
        kern,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, H, LANE + 2), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, 9), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE, LANE // 2), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, H // 2, LANE // 2, Cout), lambda b, t: (b, t, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles, H // 2, LANE // 2, Cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((9, H, LANE), x.dtype)],
        interpret=interpret,
    )(x_tiles, k2d, sel)
    out = jnp.transpose(out, (0, 2, 1, 3, 4)).reshape(B, H // 2, Wp // 2, Cout)
    return out[:, :, : W // 2, :]
