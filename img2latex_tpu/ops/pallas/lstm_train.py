"""Whole-sequence LSTM layer for TRAINING — Pallas forward + custom-VJP backward.

Why: the teacher-forced decoder is the train step's second-largest block
(scripts/bench_train_parts.py: fwd 2.7 ms + bwd 6.8 ms of the 22.9 ms
reference-scale step at B=128), and profiling shows the XLA ``lax.scan``
pays ~20 us of per-step overhead against a ~5 us matmul floor — at every
batch size (the cost is flat per image from B=128 to 512).  Unrolling makes
it WORSE (scripts/probe_scan_unroll.py: grad 6.5 -> 13.0 ms at unroll=16).
The fix is the same one the decode kernels proved: run all T steps inside
one Pallas program with the recurrent weights VMEM-resident.

Design (reference semantics: ``models/lstm.py::lstm_cell_step`` — PyTorch
gate order (i, f, g, o), itself mirroring ``torch.nn.LSTM`` used at
``/root/reference/img2latex/model/decoder.py:76-82``):

* The input projection ``x @ W_ih + b_ih + b_hh`` for all T steps stays in
  XLA (one large MXU matmul) — only the recurrence enters the kernel.
* Forward kernel, grid ``(nb, T)`` (batch tiles outer, time inner — the TPU
  grid is sequential, so VMEM scratch carries (h, c) across the T sweep of
  each batch tile): per step one ``(Bt, H) @ (H, 4H)`` dot in f32
  accumulation, gate nonlinearities in f32, carries stored back in the
  compute dtype.  Emits ``ys`` (the h-sequence), ``c_seq`` and the
  *activated* gates — the residuals that make the backward matmul-only.
* Backward kernel, same grid with time-reversed index maps: reconstructs
  per-step gate grads from the stored activations, streams ``dgates_x`` out
  (XLA backprops it through the input projection), carries (dh, dc) in f32
  scratch, and accumulates ``dW_hh`` in an f32 VMEM scratch per batch tile
  (the XLA scan accumulates this in bf16 — the kernel is *more* accurate).
* ``jax.custom_vjp`` ties the two together; grads are defined wrt
  ``(gates_x, h0, c0, w_hh)``.

Measured on a v5e chip (scripts/bench_lstm_train.py, B=128, T=140, H=512,
2 layers, bf16): see the benchmark script / STATUS.md.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_batch_tile(B: int) -> int:
    """Largest tile <= 128 that divides the (8-rounded) batch."""
    Bp = _round_up(B, 8)
    for bt in (128, 64, 32, 16, 8):
        if Bp % bt == 0:
            return min(bt, Bp)
    return Bp


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------
def _fwd_kernel(H, out_dtype, gx_ref, h0_ref, c0_ref, whh_ref,
                ys_ref, cs_ref, ga_ref, h_scr, c_scr):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[...] = h0_ref[...]
        c_scr[...] = c0_ref[...]

    h = h_scr[...]
    c = c_scr[...].astype(jnp.float32)
    g = (
        jnp.dot(h, whh_ref[...], preferred_element_type=jnp.float32)
        + gx_ref[0].astype(jnp.float32)
    )
    i = jax.nn.sigmoid(g[:, :H])
    f = jax.nn.sigmoid(g[:, H : 2 * H])
    gg = jnp.tanh(g[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(g[:, 3 * H :])
    c2 = f * c + i * gg
    h2 = o * jnp.tanh(c2)
    h_scr[...] = h2.astype(out_dtype)
    c_scr[...] = c2.astype(out_dtype)
    ys_ref[0] = h2.astype(out_dtype)
    cs_ref[0] = c2.astype(out_dtype)
    ga_ref[0] = jnp.concatenate([i, f, gg, o], axis=-1).astype(out_dtype)


def _run_fwd(gates_x, h0, c0, w_hh, batch_tile, interpret):
    T, B, H4 = gates_x.shape
    H = H4 // 4
    dtype = gates_x.dtype
    Bt = batch_tile or _pick_batch_tile(B)
    Bp = _round_up(B, Bt)
    if Bp != B:
        gates_x = jnp.pad(gates_x, ((0, 0), (0, Bp - B), (0, 0)))
        h0 = jnp.pad(h0, ((0, Bp - B), (0, 0)))
        c0 = jnp.pad(c0, ((0, Bp - B), (0, 0)))
    nb = Bp // Bt

    ys, cs, ga = pl.pallas_call(
        functools.partial(_fwd_kernel, H, dtype),
        grid=(nb, T),
        in_specs=[
            pl.BlockSpec((1, Bt, 4 * H), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, H), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, H), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Bt, H), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt, H), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt, 4 * H), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, Bp, H), dtype),
            jax.ShapeDtypeStruct((T, Bp, H), dtype),
            jax.ShapeDtypeStruct((T, Bp, 4 * H), dtype),
        ),
        scratch_shapes=[pltpu.VMEM((Bt, H), dtype), pltpu.VMEM((Bt, H), dtype)],
        interpret=interpret,
    )(gates_x, h0, c0, w_hh)
    return ys, cs, ga, Bp


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------
def _bwd_kernel(H, T, out_dtype,
                dys_ref, ga_ref, cs_ref, hprev_ref, cprev_ref, whhT_ref,
                dhT_ref, dcT_ref,
                dgx_ref, dh0_ref, dc0_ref, dwhh_ref,
                dh_scr, dc_scr, dw_scr):
    t = pl.program_id(1)  # kernel time; data time is rt = T-1-t via index maps

    @pl.when(t == 0)
    def _():
        dh_scr[...] = dhT_ref[...].astype(jnp.float32)
        dc_scr[...] = dcT_ref[...].astype(jnp.float32)
        dw_scr[...] = jnp.zeros(dw_scr.shape, dw_scr.dtype)

    ga = ga_ref[0].astype(jnp.float32)
    i, f, gg, o = ga[:, :H], ga[:, H : 2 * H], ga[:, 2 * H : 3 * H], ga[:, 3 * H :]
    tanh_ct = jnp.tanh(cs_ref[0].astype(jnp.float32))
    c_prev = cprev_ref[0].astype(jnp.float32)

    dh = dys_ref[0].astype(jnp.float32) + dh_scr[...]
    do = dh * tanh_ct
    dc = dc_scr[...] + dh * o * (1.0 - tanh_ct * tanh_ct)
    di = dc * gg
    dg = dc * i
    df = dc * c_prev
    dc_scr[...] = dc * f

    dpre = jnp.concatenate(
        [
            di * i * (1.0 - i),
            df * f * (1.0 - f),
            dg * (1.0 - gg * gg),
            do * o * (1.0 - o),
        ],
        axis=-1,
    )
    dpre_c = dpre.astype(out_dtype)
    dgx_ref[0] = dpre_c
    dh_scr[...] = jnp.dot(dpre_c, whhT_ref[...], preferred_element_type=jnp.float32)
    # dW_hh += h_{t-1}^T @ dgates  — contract the batch dim.
    h_prev = hprev_ref[0]
    dw_scr[...] += jax.lax.dot_general(
        h_prev, dpre_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(t == T - 1)
    def _():
        dh0_ref[...] = dh_scr[...].astype(out_dtype)
        dc0_ref[...] = dc_scr[...].astype(out_dtype)
        dwhh_ref[0] = dw_scr[...]


def _run_bwd(dys, dhT, dcT, ga, cs, h_prev, c_prev, w_hh, batch_tile, interpret):
    T, Bp, H4 = ga.shape
    H = H4 // 4
    dtype = ga.dtype
    if batch_tile:
        Bt = batch_tile
    else:
        # The backward's fixed VMEM share is large (w_hh^T + the f32 dW_hh
        # block + f32 dW scratch ~ 10.5M at H=512), and with MULTIPLE batch
        # tiles the revisited-output buffering pushed Bt=128 to 17.7M
        # scoped VMEM — a Mosaic compile OOM (measured on-chip 2026-08-18 at
        # B=512; the single-tile B=128 case compiles fine).  Cap the tile at
        # 64 whenever more than one tile is needed.
        Bt = _pick_batch_tile(Bp)
        if Bp > 128:
            Bt = min(Bt, 64)
    nb = Bp // Bt
    whh_T = jnp.swapaxes(w_hh, 0, 1)  # (4H, H)

    rev = lambda b, t: (T - 1 - t, b, 0)
    fix = lambda b, t: (b, 0)

    dgx, dh0, dc0, dwhh = pl.pallas_call(
        functools.partial(_bwd_kernel, H, T, dtype),
        grid=(nb, T),
        in_specs=[
            pl.BlockSpec((1, Bt, H), rev, memory_space=pltpu.VMEM),      # dys
            pl.BlockSpec((1, Bt, 4 * H), rev, memory_space=pltpu.VMEM),  # ga
            pl.BlockSpec((1, Bt, H), rev, memory_space=pltpu.VMEM),      # cs
            pl.BlockSpec((1, Bt, H), rev, memory_space=pltpu.VMEM),      # h_prev
            pl.BlockSpec((1, Bt, H), rev, memory_space=pltpu.VMEM),      # c_prev
            pl.BlockSpec((4 * H, H), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, H), fix, memory_space=pltpu.VMEM),         # dhT
            pl.BlockSpec((Bt, H), fix, memory_space=pltpu.VMEM),         # dcT
        ],
        out_specs=(
            pl.BlockSpec((1, Bt, 4 * H), rev, memory_space=pltpu.VMEM),  # dgx
            pl.BlockSpec((Bt, H), fix, memory_space=pltpu.VMEM),         # dh0
            pl.BlockSpec((Bt, H), fix, memory_space=pltpu.VMEM),         # dc0
            pl.BlockSpec((1, H, 4 * H), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, Bp, 4 * H), dtype),
            jax.ShapeDtypeStruct((Bp, H), dtype),
            jax.ShapeDtypeStruct((Bp, H), dtype),
            jax.ShapeDtypeStruct((nb, H, 4 * H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Bt, H), jnp.float32),
            pltpu.VMEM((Bt, H), jnp.float32),
            pltpu.VMEM((H, 4 * H), jnp.float32),
        ],
        interpret=interpret,
    )(dys, ga, cs, h_prev, c_prev, whh_T, dhT, dcT)
    return dgx, dh0, dc0, jnp.sum(dwhh, axis=0).astype(w_hh.dtype)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=8)
def _make_lstm_seq(batch_tile: int, interpret: bool):
    @jax.custom_vjp
    def lstm_seq(gates_x, h0, c0, w_hh):
        ys, cs, ga, Bp = _run_fwd(gates_x, h0, c0, w_hh, batch_tile, interpret)
        B = gates_x.shape[1]
        return ys[:, :B], ys[-1, :B], cs[-1, :B]

    def fwd(gates_x, h0, c0, w_hh):
        ys, cs, ga, Bp = _run_fwd(gates_x, h0, c0, w_hh, batch_tile, interpret)
        B = gates_x.shape[1]
        res = (ys, cs, ga, h0, c0, w_hh, B)
        return (ys[:, :B], ys[-1, :B], cs[-1, :B]), res

    def bwd(res, cts):
        ys, cs, ga, h0, c0, w_hh, B = res
        dys, dhT, dcT = cts
        T, Bp, _ = ys.shape
        if Bp != B:
            dys = jnp.pad(dys, ((0, 0), (0, Bp - B), (0, 0)))
            dhT = jnp.pad(dhT, ((0, Bp - B), (0, 0)))
            dcT = jnp.pad(dcT, ((0, Bp - B), (0, 0)))
            h0 = jnp.pad(h0, ((0, Bp - B), (0, 0)))
            c0 = jnp.pad(c0, ((0, Bp - B), (0, 0)))
        # The final-h cotangent joins the last step's dys (ys[-1] IS hT);
        # the final-c cotangent rides the kernel's dc carry.
        dys = dys.at[-1].add(dhT)
        zero_dhT = jnp.zeros_like(dhT)
        h_prev = jnp.concatenate([h0[None].astype(ys.dtype), ys[:-1]], axis=0)
        c_prev = jnp.concatenate([c0[None].astype(cs.dtype), cs[:-1]], axis=0)
        dgx, dh0, dc0, dwhh = _run_bwd(
            dys, zero_dhT, dcT, ga, cs, h_prev, c_prev, w_hh, batch_tile, interpret
        )
        return dgx[:, :B], dh0[:B], dc0[:B], dwhh

    lstm_seq.defvjp(fwd, bwd)
    return lstm_seq


def lstm_seq_pallas(
    gates_x: jnp.ndarray,  # (T, B, 4H) time-major, = x @ W_ih + b_ih + b_hh
    h0: jnp.ndarray,  # (B, H)
    c0: jnp.ndarray,  # (B, H)
    w_hh: jnp.ndarray,  # (H, 4H)
    *,
    batch_tile: int = 0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One LSTM layer over a full sequence: returns (ys (T,B,H), hT, cT).

    Differentiable wrt every array argument via the paired backward kernel.
    Semantics match ``models/lstm.py::lstm_cell_step`` driven by ``lax.scan``
    (PyTorch gate order), with f32 gate math and f32 dW_hh accumulation.
    """
    return _make_lstm_seq(batch_tile, interpret)(gates_x, h0, c0, w_hh)
