"""Phase-split fused conv3x3(Cin=1) + bias + ReLU + maxpool2x2 kernel.

Third attempt at the encoder's conv1 bottleneck (autopsies of the first two:
``conv_pool.py`` and ``conv1_lane.py`` STATUS notes).  conv1 is HBM-bound in
XLA — the full-resolution (H, W, Cout) pre-pool map round-trips HBM (measured
14.6 ms at B=1024 vs ~0.1 MB of actual input per image) and is ~60% of
encoder time at reference scale.  This kernel writes only the pooled map.

Design — what the failed attempts taught us:

* **No stride-2 lane work in the kernel** (conv1_lane's roll+compaction
  matmuls dominated): the input is split into its four (row, col)-parity
  phase planes ``x[, a::2, b::2]`` by XLA strided slices *outside* the
  kernel (one cheap pass over 0.1 MB/image).  On the phase planes, the
  fused 4x4/stride-2 view of conv+pool needs only **static +-1 shifts**:
  pooled output (ph, pw) = max over the 2x2 window of conv outputs
  = max_{a,b} sum_{s,t} K_ab[s,t] * x[2ph+s-1, 2pw+t-1], and row
  ``2ph + (s-1)`` lands in the even plane at ``ph + {0,+1}`` or the odd
  plane at ``ph + {-1,0}`` (same for columns) — plain pad+slice taps.
* **One image per grid program** (conv1_lane's 7k tiny programs paid
  per-program overhead): each program builds a (16, H2*W2p) patch bundle
  with 16 shifted stores and runs ONE MXU matmul
  ``(4*Cout, 16) @ (16, H2*W2p)`` covering all four pool phases, then a
  phase max — a few microseconds of work.
* **Lane-tile-aligned merges only**: W2 is padded to a multiple of 128 in
  XLA so the (16, H2, W2p) -> (16, H2*W2p) merge and the (Cout, H2*W2p) ->
  (Cout, H2, W2p) split never relayout (the pattern conv1_lane proved).

The 16 tap weights: K_ab[s,t] = k[s-a, t-b] where in range, the 3x3 kernel
embedded at offset (a, b) of a 4x4 window; bias is added after the phase max
(constant per channel commutes with max) and ReLU last (monotone).

Output is (B, Cout, H2, W2) channel-first (pad columns cropped in-kernel);
``layout="nhwc"`` adds the XLA transpose for API parity.

STATUS (all numbers v5e chip, B=3072, 64x800 bf16, Cout=32; bit-exact
checksum parity with XLA in every variant):

* kernel core (this file, NCHW out): **13 ms vs XLA's 38 ms** for the same
  block — the phase-split design does beat XLA's conv emitters, unlike the
  im2col attempts (conv_pool.py 60.8 ms, conv1_lane.py 58.9 ms).
* BUT the (Cout, H2*W2) -> channels-last conversion costs ~20-25 ms by every
  route measured: XLA NCHW->NHWC transpose 25 ms; in-kernel swapaxes +18 ms;
  reorienting the matmul to emit (M, C) makes Mosaic materialize pat^T
  (VMEM OOM, or +47 ms chunked); feeding conv2 NCHW via dimension_numbers
  ('NCHW','HWIO','NHWC') makes XLA relayout inside conv2 (chain bench
  scripts/bench_conv1_chain.py: 0.985x — a tie).
* Cropping the pad columns IN-kernel (store (C, H2, W2) instead of
  (C, H2, W2p)) shrank the downstream transpose enough to flip the verdict:
  full pipeline **36.2 ms vs XLA 38.3 ms (1.06x)** — the shipped
  configuration (layout="nhwc": kernel NCHW + XLA transpose).  In-kernel
  per-output-row transposes (layout="nhwc_kernel") measured 49.5 ms; kept
  for the record.
* The remaining gap to the 13 ms kernel core is still the layout flip
  (~18 ms); see STATUS.md round-2 notes for why a phase-split conv2 is NOT
  the answer (16-tap form inflates compute-bound conv2 FLOPs 1.78x).

Flag ``hardware.pallas_conv1`` defaults off (training pays a recompute-VJP;
the gain is inference-side); ``bench.py`` and inference deployments enable
it explicitly.  Benches: scripts/bench_conv1.py, bench_conv1_parts.py,
bench_conv1_chain.py.

Reference semantics covered: first CNN block of ``encoder.py:74-107``
(conv 3x3 SAME + ReLU + maxpool 2x2 on 1-channel images).
Kernel-language reference: /opt/skills/guides/pallas_guide.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128

# Tap decomposition: original row r = 2*ph + (s-1) for s in 0..3 lands in
# parity plane r%2 at plane-row ph + shift.  (parity, shift) per s:
_TAPS = ((1, -1), (0, 0), (1, 0), (0, 1))


def _kernel(H2: int, W2: int, W2p: int, Cout: int, nhwc_out: bool, *refs):
    """refs: [x_ee x_eo x_oe x_oo (1, H2, W2p)] [kT (4*Cout, 16)]
    [bias (Cout, 1) f32] -> out (1, Cout, H2, W2) channel-FIRST;
    scratch pat (16, H2, W2p).  Plane naming: x_<row parity><col parity>.

    Orientation notes (all measured at B=3072 production shape):
    * (4C, 16) @ (16, M) with M=H2*W2p in lanes: 13 ms — the winner.
    * The same with 4 separate (C, 16) dots: +9 ms (25% MXU row occupancy).
    * einsum('km,kn->mn') producing channels-last directly: Mosaic
      materializes pat^T padded to (M, 128) — 8 MB relayout, VMEM OOM or
      +47 ms chunked.
    * in-kernel swapaxes to channels-last: +18 ms; XLA-side NCHW->NHWC
      transpose: +25 ms.  Hence: emit NCHW and let the NEXT conv consume it
      (see fused_conv1_pool's layout parameter)."""
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
        # +-1 halo in both dims; SAME-padding zeros at the borders.
        padded[key] = jnp.pad(ref[0], ((1, 1), (1, 1)))

    for s in range(4):
        ps, ds = _TAPS[s]
        for t in range(4):
            pt, dt = _TAPS[t]
            xp = padded[(ps, pt)]
            pat_ref[s * 4 + t] = jax.lax.slice(
                xp, (1 + ds, 1 + dt), (1 + ds + H2, 1 + dt + W2p)
            )

    pat2 = pat_ref[:].reshape(16, H2 * W2p)  # lane-tile-aligned merge
    # ONE dot for all 4 pool phases: M = 4*Cout rows fill the MXU.
    y = jnp.dot(kT_ref[:], pat2, preferred_element_type=jnp.float32)  # (4C, M)
    y = jnp.max(y.reshape(4, Cout, H2 * W2p), axis=0)  # phase max (C, M)
    y = jnp.maximum(y + bias_ref[:], 0.0).astype(dtype)
    if nhwc_out:  # channels-last out: per-output-row
        # transposes (experimental alternative to the whole-array swapaxes,
        # which measured +18 ms at B=3072 — see module STATUS)
        y3 = y.reshape(Cout, H2, W2p)
        for h in range(H2):
            row = jax.lax.slice(y3, (0, h, 0), (Cout, h + 1, W2))[:, 0, :]
            out_ref[0, h] = jnp.swapaxes(row, 0, 1)  # (W2, Cout)
        return
    y = y.reshape(Cout, H2, W2p)  # aligned split (W2p % 128 == 0)
    out_ref[0] = jax.lax.slice(y, (0, 0, 0), (Cout, H2, W2))  # crop pad cols


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_conv1_taps(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 1, Cout) HWIO -> (4*Cout, 16) tap matrix.

    Row p*Cout + c holds pool phase p = a*2 + b; column s*4 + t holds
    K_ab[s,t] = k[s-a, t-b, 0, c] (zero outside the 3x3 support).
    """
    assert kernel.shape[:3] == (3, 3, 1), f"conv1 kernel must be (3,3,1,Cout), got {kernel.shape}"
    k = kernel.astype(jnp.float32)
    Cout = k.shape[-1]
    # jnp (not numpy) so this traces under jit when the kernel is a model
    # parameter; for concrete weights XLA constant-folds the whole packing.
    out = jnp.zeros((4 * Cout, 16), jnp.float32)
    for a in range(2):
        for b in range(2):
            p = a * 2 + b
            for s in range(4):
                for t in range(4):
                    u, v = s - a, t - b
                    if 0 <= u <= 2 and 0 <= v <= 2:
                        out = out.at[p * Cout : (p + 1) * Cout, s * 4 + t].set(k[u, v, 0, :])
    return out.astype(kernel.dtype)


def fused_conv1_pool(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    interpret: bool = False,
    layout: str = "nhwc",
) -> jnp.ndarray:
    """x (B, H, W, 1) NHWC -> conv3x3(SAME) + bias -> relu -> maxpool(2,2).

    ``layout="nhwc"`` returns (B, H//2, W//2, Cout) — parity-convenient but
    pays an XLA relayout transpose (~25 ms at B=3072; measured).
    ``layout="nchw"`` returns (B, Cout, H//2, W//2) — the kernel's native
    orientation, free; pair it with a consumer that accepts channel-first
    input (``lax.conv_general_dilated`` dimension_numbers
    ('NCHW', 'HWIO', 'NHWC') re-enters channels-last at the next conv).
    ``layout="nhwc_kernel"`` returns channels-last via per-output-row
    (Cout, W2) transposes inside the kernel — experimental alternative to
    the whole-array relayout."""
    B, H, W, Cin = x.shape
    assert Cin == 1, "phase-split conv1 kernel requires Cin=1"
    assert H % 2 == 0 and W % 2 == 0, "H and W must be even for 2x2 pooling"
    assert layout in ("nhwc", "nchw", "nhwc_kernel"), layout
    Cout = kernel.shape[-1]
    H2, W2 = H // 2, W // 2
    W2p = _round_up(W2, LANE)
    dtype = x.dtype

    x2 = x[..., 0]
    if W2p != W2:
        x2 = jnp.pad(x2, ((0, 0), (0, 0), (0, 2 * W2p - W)))
    # Parity planes (B, H2, W2p); strided slices are one XLA pass over the
    # (tiny) input.  Plane (a, b) = rows a::2, cols b::2.
    planes = [x2[:, a::2, b::2] for a in range(2) for b in range(2)]

    kT = pack_conv1_taps(kernel).astype(dtype)  # (4*Cout, 16)
    bias2 = jnp.asarray(bias, jnp.float32).reshape(Cout, 1)

    kern = functools.partial(_kernel, H2, W2, W2p, Cout, layout == "nhwc_kernel")
    plane_spec = pl.BlockSpec((1, H2, W2p), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    if layout == "nhwc_kernel":
        out_block, out_arr = (1, H2, W2, Cout), (B, H2, W2, Cout)
    else:
        out_block, out_arr = (1, Cout, H2, W2), (B, Cout, H2, W2)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[plane_spec] * 4
        + [
            pl.BlockSpec((4 * Cout, 16), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(out_block, lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_arr, dtype),
        scratch_shapes=[pltpu.VMEM((16, H2, W2p), dtype)],
        interpret=interpret,
    )(*planes, kT, bias2)
    if layout in ("nchw", "nhwc_kernel"):
        return out
    return jnp.transpose(out, (0, 2, 3, 1))


# ---------------------------------------------------------------------------
# Differentiable wrapper (training support)
# ---------------------------------------------------------------------------


def _xla_conv1_pool(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """The math this kernel fuses, as plain XLA ops (also the VJP reference)."""
    y = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = jax.nn.relu(y + bias.astype(jnp.float32)).astype(x.dtype)
    neg_inf = jnp.asarray(-jnp.inf, y.dtype)
    return jax.lax.reduce_window(
        y, neg_inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv1_pool(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    interpret: bool = False,
    layout: str = "nhwc",
):
    """Differentiable fused conv1+pool: Pallas forward, XLA-derived backward.

    Pallas kernels have no automatic VJP; the backward pass linearizes the
    algebraically-identical XLA composition at the same primals (recomputes
    the forward — training defaults to the pure-XLA path anyway, this exists
    so the flag is safe to leave on everywhere).  ``layout="nchw"`` keeps
    the kernel's native channel-first output (the conv-chain fast path).
    """
    return fused_conv1_pool(x, kernel, bias, interpret=interpret, layout=layout)


def _conv1_pool_fwd(x, kernel, bias, interpret, layout):
    return (
        fused_conv1_pool(x, kernel, bias, interpret=interpret, layout=layout),
        (x, kernel, bias),
    )


def _conv1_pool_bwd(interpret, layout, res, g):
    x, kernel, bias = res
    if layout == "nchw":
        _, vjp = jax.vjp(
            lambda *a: jnp.transpose(_xla_conv1_pool(*a), (0, 3, 1, 2)), x, kernel, bias
        )
    else:
        _, vjp = jax.vjp(_xla_conv1_pool, x, kernel, bias)
    return vjp(g)


conv1_pool.defvjp(_conv1_pool_fwd, _conv1_pool_bwd)
