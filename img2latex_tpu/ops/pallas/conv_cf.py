"""Channel-first phase-split conv3x3 + bias + ReLU + maxpool2x2 for Cin > 1.

Extends ``conv1_phase.py`` (Cin=1 first block) to the rest of the CNN
encoder's conv chain (reference topology ``encoder.py:74-107``: blocks of
conv3x3 SAME + ReLU + maxpool 2x2 with filters (32, 64, 128)).  Together
they form an encoder fast path that is **channel-first end to end**:

    x (B,H,W,1) --conv1_phase(nchw)--> (B,C1,H/2,W/2)
                --conv_block_cf-----> (B,C2,H/4,W/4)
                --conv_block_cf-----> (B,C3,H/8,W/8)
                --flatten (C-major) + permuted Dense head --> (B,E)

The round-1 autopsy (``conv1_phase.py`` STATUS) showed the phase-split
kernel core beats XLA 13 ms vs 38 ms at B=3072 but the NCHW->NHWC
re-entry for the next conv costs ~20-25 ms by every measured route.  The
fix is to never re-enter channels-last: subsequent blocks consume NCHW
directly (this kernel), and the final Dense head absorbs the layout by
reshaping its weight matrix from (H,W,C)-major to (C,H,W)-major rows —
a pure transpose of the packed weights, exact, done once per trace.

Kernel design (per grid program = one image):

* the input (Cin, H, W) is split by XLA strided slices into 4 parity
  planes (Cin, H/2, W2p) (W2p = W/2 lane-padded to 128);
* in-kernel, each plane gets a +-1 halo pad, and 16 shifted copies build
  the tap bundle ``pat`` (16*Cin, H2, W2p): rows (s*4+t)*Cin..+Cin are
  input phase ((s-1)%2, (t-1)%2) shifted by the 4x4-window tap (s, t)
  — the fused conv+pool stencil needs only static +-1 shifts on the
  quarter-res planes (the ``conv1_phase`` insight);
* ONE matmul ``(4*Cout, 16*Cin) @ (16*Cin, H2*W2p)`` computes all four
  pool phases of the conv output (M = 4*Cout = 256+ rows and
  K = 16*Cin = 512+ fill the MXU; the 16/9 tap inflation buys bundle
  sharing across phases and full-width matmul shapes);
* phase max (pool), +bias, ReLU, crop lane pad, store (Cout, H2, W2).

Reference semantics: conv blocks 2..n of ``encoder.py:74-107``.
Kernel-language reference: /opt/skills/guides/pallas_guide.md.

ON-CHIP VERDICT (v5e, 2026-08-17, ``scripts/bench_encoder_chain.py`` at
B=3072 vector):  xla 73.7 ms / conv1 72.0 ms / **chain 169.4 ms** — the
channel-first chain is 0.435x vs XLA despite eliminating every relayout.
The per-image grid fragments the MXU: each program issues one
(256, 512) @ (512, ~6.4k) matmul for conv2 and a (512, 1024) @ (1024, ~1.6k)
for conv3 — too little arithmetic per program to hide the (Cin, H, W)
tap-bundle build (16 shifted VPU copies of the whole input per block),
and the 16/9 tap inflation that is free for HBM-bound conv1 costs real
FLOPs on compute-bound conv2/3.  This closes the round-1 question "is the
layout wall fundamental?": yes — the relayout-free formulation loses more
on the VPU tap build + FLOP inflation than the ~20-25 ms NCHW->NHWC
transpose it avoids.  The path stays correct (checksum rel diff 2.5e-07
vs XLA on chip) and opt-in via ``hardware.pallas_chain`` for A/B, but the
shipped default is ``pallas_conv1`` only (1.02-1.06x).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128

# 4x4-window tap s -> (input row parity, plane-row shift); row r = 2*ph+s-1
# lands in plane (s-1) % 2 at plane-row ph + shift.
_TAPS = ((1, -1), (0, 0), (1, 0), (0, 1))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_conv_taps_cf(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) HWIO -> (4*Cout, 16*Cin) tap matrix.

    Row p*Cout + c holds pool phase p = a*2 + b of output channel c;
    column (s*4 + t)*Cin + ci holds K_ab[s,t,ci] = k[s-a, t-b, ci, c]
    (zero outside the 3x3 support).
    """
    assert kernel.shape[:2] == (3, 3), f"conv kernel must be (3,3,Cin,Cout), got {kernel.shape}"
    k = kernel.astype(jnp.float32)
    Cin, Cout = k.shape[2], k.shape[3]
    out = jnp.zeros((4 * Cout, 16 * Cin), jnp.float32)
    for a in range(2):
        for b in range(2):
            p = a * 2 + b
            for s in range(4):
                for t in range(4):
                    u, v = s - a, t - b
                    if 0 <= u <= 2 and 0 <= v <= 2:
                        col = (s * 4 + t) * Cin
                        # (Cin, Cout) block -> rows p*Cout..+Cout, cols col..+Cin
                        out = out.at[p * Cout : (p + 1) * Cout, col : col + Cin].set(
                            jnp.swapaxes(k[u, v], 0, 1)
                        )
    return out.astype(kernel.dtype)


def _kernel_cf(Cin: int, H2: int, W2: int, W2p: int, Cout: int, *refs):
    """refs: [x_ee x_eo x_oe x_oo (1, Cin, H2, W2p)] [kT (4*Cout, 16*Cin)]
    [bias (Cout, 1) f32] -> out (1, Cout, H2, W2); scratch pat
    (16*Cin, H2, W2p).  Plane naming: x_<row parity><col parity>."""
    planes = {
        (0, 0): refs[0],
        (0, 1): refs[1],
        (1, 0): refs[2],
        (1, 1): refs[3],
    }
    kT_ref, bias_ref, out_ref, pat_ref = refs[4], refs[5], refs[6], refs[7]
    dtype = kT_ref.dtype

    padded = {}
    for key, ref in planes.items():
        # +-1 halo on the two spatial dims; SAME-padding zeros at borders.
        padded[key] = jnp.pad(ref[0], ((0, 0), (1, 1), (1, 1)))

    for s in range(4):
        ps, ds = _TAPS[s]
        for t in range(4):
            pt, dt = _TAPS[t]
            xp = padded[(ps, pt)]
            idx = (s * 4 + t) * Cin
            pat_ref[idx : idx + Cin] = jax.lax.slice(
                xp, (0, 1 + ds, 1 + dt), (Cin, 1 + ds + H2, 1 + dt + W2p)
            )

    pat2 = pat_ref[:].reshape(16 * Cin, H2 * W2p)  # lane-aligned merge
    y = jnp.dot(kT_ref[:], pat2, preferred_element_type=jnp.float32)  # (4C, M)
    y = jnp.max(y.reshape(4, Cout, H2 * W2p), axis=0)  # pool = phase max
    y = jnp.maximum(y + bias_ref[:], 0.0).astype(dtype)
    y = y.reshape(Cout, H2, W2p)  # aligned split (W2p % 128 == 0)
    out_ref[0] = jax.lax.slice(y, (0, 0, 0), (Cout, H2, W2))  # crop pad cols


def fused_convblock_cf(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (B, Cin, H, W) channel-first -> conv3x3(SAME)+bias -> relu ->
    maxpool(2,2), returned (B, Cout, H//2, W//2) channel-first.

    ``kernel`` is HWIO (3, 3, Cin, Cout) — the flax/NHWC parameter as
    stored; the tap packing handles the orientation.
    """
    B, Cin, H, W = x.shape
    assert kernel.shape[:3] == (3, 3, Cin), (kernel.shape, Cin)
    assert H % 2 == 0 and W % 2 == 0, "H and W must be even for 2x2 pooling"
    Cout = kernel.shape[-1]
    H2, W2 = H // 2, W // 2
    W2p = _round_up(W2, LANE)
    dtype = x.dtype

    x2 = x
    if W2p != W2:
        x2 = jnp.pad(x2, ((0, 0), (0, 0), (0, 0), (0, 2 * W2p - W)))
    # Parity planes (B, Cin, H2, W2p); one strided-slice pass in XLA.
    planes = [x2[:, :, a::2, b::2] for a in range(2) for b in range(2)]

    kT = pack_conv_taps_cf(kernel).astype(dtype)  # (4*Cout, 16*Cin)
    bias2 = jnp.asarray(bias, jnp.float32).reshape(Cout, 1)

    kern = functools.partial(_kernel_cf, Cin, H2, W2, W2p, Cout)
    plane_spec = pl.BlockSpec(
        (1, Cin, H2, W2p), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[plane_spec] * 4
        + [
            pl.BlockSpec((4 * Cout, 16 * Cin), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, Cout, H2, W2), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Cout, H2, W2), dtype),
        scratch_shapes=[pltpu.VMEM((16 * Cin, H2, W2p), dtype)],
        interpret=interpret,
    )(*planes, kT, bias2)
    return out


# ---------------------------------------------------------------------------
# Differentiable wrapper (training safety — inference is the target user)
# ---------------------------------------------------------------------------


def _xla_convblock_cf(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """The fused math as plain XLA ops on NCHW (also the VJP reference)."""
    y = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        (1, 1),
        "SAME",
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    y = jax.nn.relu(y + bias.astype(jnp.float32)[None, :, None, None]).astype(x.dtype)
    neg_inf = jnp.asarray(-jnp.inf, y.dtype)
    return jax.lax.reduce_window(
        y, neg_inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def convblock_cf(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray, interpret: bool = False):
    """Differentiable fused channel-first conv block: Pallas forward,
    XLA-derived backward (same contract as ``conv1_phase.conv1_pool``)."""
    return fused_convblock_cf(x, kernel, bias, interpret=interpret)


def _convblock_cf_fwd(x, kernel, bias, interpret):
    return fused_convblock_cf(x, kernel, bias, interpret=interpret), (x, kernel, bias)


def _convblock_cf_bwd(interpret, res, g):
    x, kernel, bias = res
    _, vjp = jax.vjp(_xla_convblock_cf, x, kernel, bias)
    return vjp(g)


convblock_cf.defvjp(_convblock_cf_fwd, _convblock_cf_bwd)
