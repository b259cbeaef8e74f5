"""Whole-decode Pallas TPU kernels for **grid-memory** models (S > 1).

The fused decode kernels in :mod:`ops.pallas.decode_step` cover the vector
memory case (S = 1, reference parity: the encoder pools to one embedding and
attention degenerates, reference ``decoder.py:176``).  The quality-bearing
checkpoints, however, run ``model.memory = "grid"`` — real additive attention
over the S = W' feature-grid columns — and previously decoded on the XLA scan
path, which pays per step:

* a fresh HBM round-trip of the (B, S, A) attention energies (the dominant
  traffic: at B=256, S=100, A=384 that's ~20 MB/step x 141 steps),
* full decoder weight reloads (no VMEM residency across steps),
* XLA scan bookkeeping.

Measured cost: the hard-corpus flagship decoded at ~1.1k img/s vs ~30k for
the vector kernel (artifacts/mathtext_hard_grid/RESULTS.json).

This module keeps EVERYTHING resident in VMEM across all ``max_length``
steps: the decoder weights, the memory (B, S, E), and the **precomputed
memory-side attention projection** ``U = memory @ W_m + b`` (B, S, A).
Additive attention splits exactly (reference ``decoder.py:287-343``;
ours ``models/decoder.py::AdditiveAttention``):

    energy_s = tanh(W [h; m_s] + b) = tanh(h @ W_h + (m_s @ W_m + b))
                                            ^ per step   ^ once per batch

so the per-step attention work is one (B, H) x (H, A) matmul plus VPU
tanh/softmax/weighted-sum over the VMEM-resident U and memory — no HBM
traffic at all inside the decode loop.

Mosaic layout notes (hard-won, see ``beam_decode.py`` / ``decode_step.py``):
attention intermediates never drop the trailing singleton — scores stay
(B, S, 1) so the softmax reduces over *sublanes* (axis=1) and the weights
lane-broadcast against the (B, S, E) memory without a (B,S) -> (B,S,1)
relayout; ``h @ W_h`` broadcasts over sublanes via ``[:, None, :]``.

Parity: interpret-mode f32 tests assert exact token equality with the scan
path (tests/test_pallas_grid.py); bf16 on-chip is subject to the same
near-tie argmax caveat as the vector kernels (quality A/B per checkpoint:
``scripts/ab_pallas_decode.py``).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from img2latex_tpu.ops.pallas.decode_step import (
    _decode_loop,
    _make_sampler,
    _round_up,
)

# ---------------------------------------------------------------------------
# Attention weight packing + host-side precompute
# ---------------------------------------------------------------------------


def pack_attention_weights(params: Dict[str, Any], dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Extract the additive-attention parameters from a Seq2SeqModel tree.

    The flax module computes ``v . tanh(Dense_attn([h; m]))`` with the
    concat order [h, memory] (``models/decoder.py::AdditiveAttention``), so
    the (H+E, A) kernel splits row-wise into ``w_h`` (H, A) applied per step
    and ``w_m`` (E, A) folded into the once-per-batch memory projection.
    """
    cell = params["params"]["decoder"]["cell"] if "params" in params else params["decoder"]["cell"]
    # Batched host fetch (see pack_decoder_weights): the attention + LSTM
    # leaves land in one staged device_get instead of serial syncs.
    att = jax.device_get({"attention": cell["attention"], "W_hh_l0": cell["lstm"]["W_hh_l0"]})
    cell = {**cell, "attention": att["attention"], "lstm": {**cell["lstm"], "W_hh_l0": att["W_hh_l0"]}}
    att = cell["attention"]
    kern = np.asarray(att["attn"]["kernel"], np.float32)  # (H+E, A)
    bias = np.asarray(att["attn"]["bias"], np.float32)  # (A,)
    v = np.asarray(att["v"]["kernel"], np.float32)  # (A, 1)
    A = kern.shape[1]
    # h rows first, memory rows second (concat order); derive H from the LSTM
    # carry width so non-square (A != H) variants stay correct.
    lstm = cell["lstm"]
    H = np.asarray(lstm["W_hh_l0"], np.float32).shape[0]
    E = kern.shape[0] - H
    return {
        "w_h": jnp.asarray(kern[:H], dtype),  # (H, A)
        "w_m": jnp.asarray(kern[H:], dtype),  # (E, A)
        "b": jnp.asarray(bias, jnp.float32),  # (A,)
        "v": jnp.asarray(v.reshape(1, A), dtype),  # (1, A) row for VPU broadcast
        "attn_dim": A,
        "mem_dim": E,
        "hidden_dim": H,
    }


def grid_memory_proj(att: Dict[str, Any], memory: jnp.ndarray) -> jnp.ndarray:
    """Once-per-batch XLA precompute: U = memory @ W_m + b -> (B, S, A).

    Stored in the kernel compute dtype — the scan path's Dense also emits
    bf16 activations on TPU, so this matches its numerics; in f32 tests the
    split-matmul algebra is exact up to accumulation order."""
    dtype = att["w_m"].dtype
    u = (
        jax.lax.dot_general(
            memory.astype(dtype),
            att["w_m"],
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + att["b"]
    )
    return u.astype(dtype)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _attend(mem_ref, u_ref, w_h_ref, v_ref, h_top):
    """One additive-attention step, all operands VMEM-resident.

    h_top: (B, H) dtype -> context (B, E) dtype.
    Layout discipline: scores/weights keep the trailing singleton so every
    broadcast is a natural sublane/lane broadcast (module docstring)."""
    dtype = mem_ref.dtype
    hw = jnp.dot(h_top, w_h_ref[:], preferred_element_type=jnp.float32).astype(dtype)  # (B, A)
    energy = jnp.tanh(u_ref[...] + hw[:, None, :])  # (B, S, A)
    prod = energy * v_ref[...][None]  # (B, S, A)
    scores = jnp.sum(prod.astype(jnp.float32), axis=-1, keepdims=True)  # (B, S, 1) f32
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    w = e / jnp.sum(e, axis=1, keepdims=True)  # (B, S, 1) f32
    ctx = jnp.sum(w.astype(dtype) * mem_ref[...], axis=1)  # (B, E)
    return ctx


def _grid_greedy_kernel(
    num_layers: int,
    max_length: int,
    start_id: int,
    end_id: int,
    pad_id: int,
    early_exit: bool,
    with_score: bool,
    signal: str,
    *refs,
):
    """refs: [mem (B,S,E)] [u (B,S,A)] [emb (Vp,E)] [w_ih_i w_hh_i b_i]*L
    [w_h (H,A)] [v (1,A)] [w_out (H,Vp)] [b_out (1,Vp)]
    -> out [tokens (T,B) i32] (+ [score (1,B) f32] when ``with_score``);
    scratch h (L,B,H), c (L,B,H).

    Shares the decode loop with the vector kernels
    (``decode_step._decode_loop``); the context closure runs in-kernel
    additive attention over the VMEM-resident memory from the PREVIOUS
    top-layer h (DecoderCell order: attend first, then step the LSTM —
    models/decoder.py)."""
    (
        (mem_ref, u_ref, w_h_ref, v_ref),
        emb_ref, layer_refs, w_out_ref, b_out_ref, _, out_ref, out_extra,
        h_ref, c_ref,
    ) = _unpack_grid_refs(num_layers, refs, n_out_extra=1 if with_score else 0)

    def greedy(t, logits):
        return jnp.argmax(logits, axis=-1, keepdims=True).astype(jnp.int32)

    _decode_loop(
        greedy,
        lambda h_top: _attend(mem_ref, u_ref, w_h_ref, v_ref, h_top),
        emb_ref, layer_refs, w_out_ref, b_out_ref, out_ref, h_ref, c_ref,
        num_layers, max_length, start_id, end_id, pad_id, early_exit,
        score_ref=out_extra[0] if with_score else None,
        signal=signal,
    )


def _unpack_grid_refs(num_layers: int, refs, n_extra: int = 0, n_out_extra: int = 0):
    """Grid ref layout: [mem] [u] [emb] [w_ih_i w_hh_i b_i]*L [w_h] [v]
    [w_out] [b_out] [extras] [out] [extra outs] [h] [c] — reorder
    ``decode_step._unpack_loop_refs``'s lead/post split so the attention
    operands (mem, u, w_h, v) come back as one lead tuple."""
    mem_ref, u_ref, emb_ref = refs[0], refs[1], refs[2]
    idx = 3
    layer_refs = []
    for _ in range(num_layers):
        layer_refs.append((refs[idx], refs[idx + 1], refs[idx + 2]))
        idx += 3
    w_h_ref, v_ref, w_out_ref, b_out_ref = refs[idx], refs[idx + 1], refs[idx + 2], refs[idx + 3]
    extra = refs[idx + 4 : idx + 4 + n_extra]
    out_ref = refs[idx + 4 + n_extra]
    out_extra = refs[idx + 5 + n_extra : idx + 5 + n_extra + n_out_extra]
    h_ref = refs[idx + 5 + n_extra + n_out_extra]
    c_ref = refs[idx + 6 + n_extra + n_out_extra]
    return (
        (mem_ref, u_ref, w_h_ref, v_ref),
        emb_ref, layer_refs, w_out_ref, b_out_ref, extra, out_ref, out_extra,
        h_ref, c_ref,
    )


def _grid_sample_kernel(
    num_layers: int,
    max_length: int,
    start_id: int,
    end_id: int,
    pad_id: int,
    top_k: int,
    top_p: float,
    early_exit: bool,
    *refs,
):
    """Temperature + top-k/top-p sampling variant (same RNG/filter contract
    as ``decode_step._full_sample_kernel``: int32 lowbias32 hash -> Gumbel-max
    over the filtered logits via ``_sample_next_token``; temperature
    pre-folded into w_out/b_out).

    refs: [mem] [u] [emb] [w_ih_i w_hh_i b_i]*L [w_h] [v] [w_out] [b_out]
    [seed (1,1) i32 SMEM] -> out [tokens (T,B) i32]; scratch h, c."""
    (
        (mem_ref, u_ref, w_h_ref, v_ref),
        emb_ref, layer_refs, w_out_ref, b_out_ref, (seed_ref,), out_ref, _,
        h_ref, c_ref,
    ) = _unpack_grid_refs(num_layers, refs, n_extra=1)
    sampler = _make_sampler(seed_ref, h_ref.shape[1], emb_ref.shape[0], top_k, top_p)
    _decode_loop(
        sampler,
        lambda h_top: _attend(mem_ref, u_ref, w_h_ref, v_ref, h_top),
        emb_ref, layer_refs, w_out_ref, b_out_ref, out_ref, h_ref, c_ref,
        num_layers, max_length, start_id, end_id, pad_id, early_exit,
    )


# ---------------------------------------------------------------------------
# Host-callable wrappers (tiling at the XLA level, like decode_step)
# ---------------------------------------------------------------------------


def grid_vmem_bytes_estimate(packed: Dict[str, Any], att: Dict[str, Any], batch: int, S: int) -> int:
    """Rough per-tile VMEM footprint: weights + memory + U + the f32
    (B, S, A) reduction temp + carries/logits."""
    itemsize = jnp.dtype(packed["emb"].dtype).itemsize
    total = 0
    for src in (packed, att):
        for v in src.values():
            if hasattr(v, "size"):
                total += v.size * v.dtype.itemsize
    E = att["mem_dim"]
    A = att["attn_dim"]
    L, H = packed["num_layers"], packed["hidden_dim"]
    Vp = packed["vocab_padded"]
    total += batch * S * (E + A) * itemsize  # mem + U resident
    total += batch * S * A * (itemsize + 4)  # energy (dtype) + f32 reduce temp
    total += batch * (4 * L * H + 4 * H + 2 * Vp) * max(itemsize, 4)
    return int(total)


def _vmem_budget_bytes() -> int:
    """Default 96 MiB (v5e-class VMEM is 128 MiB; leave headroom for Mosaic
    temporaries).  Override with IMG2LATEX_VMEM_BUDGET_MB on parts with
    smaller VMEM — the tile shrinks, semantics are unchanged (tested)."""
    import os

    return int(os.environ.get("IMG2LATEX_VMEM_BUDGET_MB", "96")) * 1024 * 1024


def _auto_tile(packed, att, S: int, budget_bytes: int = 0, batch: int = 0) -> int:
    """Largest VMEM-fitting tile, capped at the (8-rounded) actual batch so a
    small request (Predictor.predict B=1, default batch 16) never pads up to
    a full 128/256-row tile and decodes zero-memory rows for max_length
    steps — which would also defeat early_exit (padding rows never emit END,
    so the in-kernel all-finished bailout could never trip)."""
    budget_bytes = budget_bytes or _vmem_budget_bytes()
    cap = max(8, _round_up(batch, 8)) if batch > 0 else 256
    for tile in sorted({256, 128, 64, 32, 16, 8, cap}, reverse=True):
        if tile > cap:
            continue
        if grid_vmem_bytes_estimate(packed, att, tile, S) <= budget_bytes:
            return tile
    return 8


def _run_tiled(one_tile, operands: Tuple[jnp.ndarray, ...], B: int, batch_tile: int,
               max_length: int, per_tile: jnp.ndarray | None = None,
               with_scores: bool = False) -> jnp.ndarray:
    """Pad B to a multiple of batch_tile and lax.map ``one_tile`` over chunks.
    Each operand's leading dim is B; extra (non-batch) args ride via closure,
    except ``per_tile`` — a (num_chunks,) array appended as the last arg of
    each chunk (per-tile sampling seeds).  ``with_scores``: ``one_tile``
    returns (tokens (T, tile), score (1, tile)) and so does this (unpadded,
    batch-major)."""
    Bp = _round_up(B, batch_tile)
    padded = tuple(
        jnp.pad(x, ((0, Bp - B),) + ((0, 0),) * (x.ndim - 1)) if Bp != B else x
        for x in operands
    )
    nc = Bp // batch_tile
    if per_tile is not None:
        # Extra per-chunk scalar operand (e.g. the sampling seed): element i
        # rides with chunk i rather than being split along the batch.
        if nc == 1:
            out = one_tile(padded + (per_tile[0],))
            out = jax.tree_util.tree_map(lambda x: x[None], out)
        else:
            chunks = tuple(x.reshape((nc, batch_tile) + x.shape[1:]) for x in padded)
            out = jax.lax.map(one_tile, chunks + (per_tile,))
    elif nc == 1:
        out = one_tile(padded)
        out = jax.tree_util.tree_map(lambda x: x[None], out)
    else:
        chunks = tuple(x.reshape((nc, batch_tile) + x.shape[1:]) for x in padded)
        out = jax.lax.map(one_tile, chunks)  # (nc, T, tile)[, (nc, 1, tile)]
    if with_scores:
        tokens_tb, score_tb = out
        tokens = jnp.swapaxes(tokens_tb, 1, 2).reshape(Bp, max_length)
        return tokens[:B], score_tb.reshape(Bp)[:B]
    tokens = jnp.swapaxes(out, 1, 2).reshape(Bp, max_length)
    return tokens[:B]


def pallas_full_grid_greedy_decode(
    packed: Dict[str, Any],
    att: Dict[str, Any],
    memory: jnp.ndarray,  # (B, S, E)
    max_length: int,
    start_id: int,
    end_id: int,
    pad_id: int,
    interpret: bool = False,
    batch_tile: int = 0,
    early_exit: bool = False,
    return_scores: bool = False,
    signal: str = "logp",
) -> jnp.ndarray:
    """Grid-memory analog of ``pallas_full_greedy_decode``: returns (B, T)
    int32 tokens, semantically identical to the scan path
    (``greedy_sample_decode`` over ``Seq2SeqModel.decode_step``).

    ``return_scores=True`` additionally returns the (B,) f32 per-sequence
    confidence (sum of the per-step ``signal`` — logp/margin/entropy, see
    ``_decode_loop``) the selective-beam path ranks on."""
    B, S, E = memory.shape
    L = int(packed["num_layers"])
    H = int(packed["hidden_dim"])
    dtype = packed["emb"].dtype
    if batch_tile <= 0:
        batch_tile = _auto_tile(packed, att, S, batch=B)
    kernel = functools.partial(
        _grid_greedy_kernel, L, max_length, start_id, end_id, pad_id, early_exit,
        return_scores, signal,
    )
    weight_args: List[jnp.ndarray] = [packed["emb"]]
    for i in range(L):
        weight_args += [packed[f"w_ih_{i}"], packed[f"w_hh_{i}"], packed[f"b_{i}"].reshape(1, -1)]
    weight_args += [att["w_h"], att["v"], packed["w_out"], packed["b_out"].reshape(1, -1)]
    n_inputs = 2 + len(weight_args)

    mem = memory.astype(dtype)
    u = grid_memory_proj(att, memory)  # (B, S, A) once per batch, XLA

    def one_tile(args):
        mem_t, u_t = args
        tile = mem_t.shape[0]
        out_shape = [jax.ShapeDtypeStruct((max_length, tile), jnp.int32)]
        out_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
        if return_scores:
            out_shape.append(jax.ShapeDtypeStruct((1, tile), jnp.float32))
            out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        out = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_inputs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((L, tile, H), dtype),
                pltpu.VMEM((L, tile, H), dtype),
            ],
            interpret=interpret,
        )(mem_t, u_t, *weight_args)
        return tuple(out) if return_scores else out[0]

    return _run_tiled(
        one_tile, (mem, u), B, batch_tile, max_length, with_scores=return_scores
    )


def _grid_beam_kernel(
    num_layers: int,
    K: int,
    max_length: int,
    start_id: int,
    end_id: int,
    pad_id: int,
    early_exit: bool,
    *refs,
):
    """Grid-memory analog of ``beam_decode._beam_kernel``: identical beam-
    major bookkeeping (sublane-roll group reductions, iterative K·V top-k,
    one-hot MXU carry gathers) but the per-step context comes from additive
    attention over the VMEM-resident memory instead of a fixed broadcast.

    Beams of a sample share the memory, so attention runs once per beam on
    the (Bt, H) static slice of the top-layer carry — no K× duplication of
    the (Bt, S, E)/(Bt, S, A) memory operands in VMEM.

    refs: [mem (Bt,S,E)] [u (Bt,S,A)] [emb (Vp,E)] [w_ih_i w_hh_i b_i]*L
    [w_h (H,A)] [v (1,A)] [w_out (H,Vp)] [b_out (1,Vp)]
    -> out [tok_seq (T,K*Bt) i32] [beam_seq (T,K*Bt) i32] [scores (K*Bt,1) f32]
    scratch: h (L,K*Bt,H), c (L,K*Bt,H)."""
    from img2latex_tpu.ops.pallas.beam_decode import _beam_loop

    (
        (mem_ref, u_ref, w_h_ref, v_ref),
        emb_ref, layer_refs, w_out_ref, b_out_ref,
        (tok_ref, beam_ref, scores_ref),
        h_ref, c_ref,
    ) = _unpack_grid_beam_refs(num_layers, refs)
    Bt = mem_ref.shape[0]

    def ctx_of(h_top):
        # Attention per beam on the parent-gathered previous top-layer h;
        # beams of a sample share the memory, so each attend runs on a
        # static (Bt, H) beam slice — no KX duplication of the (Bt, S, E)/
        # (Bt, S, A) memory operands in VMEM.
        return jnp.concatenate(
            [
                _attend(mem_ref, u_ref, w_h_ref, v_ref, h_top[k * Bt : (k + 1) * Bt])
                for k in range(K)
            ],
            axis=0,
        )  # (K*Bt, E)

    _beam_loop(
        ctx_of,
        emb_ref, layer_refs, w_out_ref, b_out_ref,
        tok_ref, beam_ref, scores_ref, h_ref, c_ref,
        num_layers, K, Bt, max_length, start_id, end_id, pad_id, early_exit,
    )


def _unpack_grid_beam_refs(num_layers: int, refs):
    """Grid beam ref layout (see ``_grid_beam_kernel`` docstring): like
    ``_unpack_grid_refs`` but with the three beam outputs before scratch."""
    mem_ref, u_ref, emb_ref = refs[0], refs[1], refs[2]
    idx = 3
    layer_refs = []
    for _ in range(num_layers):
        layer_refs.append((refs[idx], refs[idx + 1], refs[idx + 2]))
        idx += 3
    w_h_ref, v_ref, w_out_ref, b_out_ref = refs[idx], refs[idx + 1], refs[idx + 2], refs[idx + 3]
    outs = (refs[idx + 4], refs[idx + 5], refs[idx + 6])
    h_ref, c_ref = refs[idx + 7], refs[idx + 8]
    return (
        (mem_ref, u_ref, w_h_ref, v_ref),
        emb_ref, layer_refs, w_out_ref, b_out_ref, outs, h_ref, c_ref,
    )


def grid_beam_vmem_bytes_estimate(
    packed: Dict[str, Any], att: Dict[str, Any], batch_tile: int, S: int, K: int
) -> int:
    """Per-tile VMEM footprint of the grid beam kernel: weights + per-sample
    memory/U (+ one beam-slice f32 energy temp, reused across the K attends)
    + K·Bt-row carries, score matrix, and the (KB, KB) gather one-hot."""
    itemsize = jnp.dtype(packed["emb"].dtype).itemsize
    total = 0
    for src in (packed, att):
        for v in src.values():
            if hasattr(v, "size"):
                total += v.size * v.dtype.itemsize
    E = att["mem_dim"]
    A = att["attn_dim"]
    L, H = packed["num_layers"], packed["hidden_dim"]
    Vp = packed["vocab_padded"]
    KB = K * batch_tile
    total += batch_tile * S * (E + A) * itemsize  # mem + U resident
    total += batch_tile * S * A * (itemsize + 4)  # one beam's energy + f32 temp
    total += KB * (4 * L * H + 4 * H) * max(itemsize, 4)  # carries + gates
    total += KB * Vp * 4 * 2  # logits/total + masked cur (f32)
    total += KB * KB * itemsize  # carry-gather one-hot
    return int(total)


def _beam_scoped_budget_bytes() -> int:
    """The grid beam kernel is additionally bounded by XLA's scoped-VMEM
    stack limit (16 MiB default): its whole operand set (weights + memory +
    U at K*Bt rows) is charged to the scoped stack, and Mosaic hard-fails
    the compile when it doesn't fit — measured on-chip 2026-08-18 at
    flagship shapes (E=256/H=384/S=100/K=5): estimate 20.4M (tile 32)
    compiles, 24.0M (tile 40) and 29.0M (tile 51) are compile OOMs.
    Raising ``vmem_limit_bytes`` via Mosaic compiler params does not help —
    this XLA charges the kernel the full granted budget, so the demand
    chases the limit.  Default the beam tile budget to 21 MiB (just above
    the largest measured-good estimate); override with
    IMG2LATEX_BEAM_VMEM_BUDGET_MB if a future toolchain lifts the limit."""
    import os

    return int(os.environ.get("IMG2LATEX_BEAM_VMEM_BUDGET_MB", "21")) * 1024 * 1024


def _auto_tile_beam(
    packed, att, S: int, K: int, budget_bytes: int = 0, batch: int = 0
) -> int:
    budget_bytes = min(budget_bytes or _vmem_budget_bytes(), _beam_scoped_budget_bytes())
    cap = max(8, 256 // K)
    if batch > 0:
        # Cap at the (8-rounded) actual batch: see _auto_tile.
        cap = min(cap, max(8, _round_up(batch, 8)))
    for tile in sorted({cap, 64, 48, 40, 32, 24, 16, 12, 8}, reverse=True):
        if tile > cap:
            continue
        if grid_beam_vmem_bytes_estimate(packed, att, tile, S, K) <= budget_bytes:
            return tile
    return 8


def pallas_full_grid_beam_decode(
    packed: Dict[str, Any],
    att: Dict[str, Any],
    memory: jnp.ndarray,  # (B, S, E)
    beam_size: int,
    cfg,  # DecodeConfig
    interpret: bool = False,
    batch_tile: int = 0,
    early_exit: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Grid-memory analog of ``pallas_full_beam_decode``: returns
    (best tokens (B, T), best scores (B,)), semantically identical to the
    scan beam over ``Seq2SeqModel.decode_step`` with expanded grid memory."""
    from img2latex_tpu.ops.pallas.beam_decode import _select_from_beam_tiles

    B, S, E = memory.shape
    K = int(beam_size)
    L = int(packed["num_layers"])
    H = int(packed["hidden_dim"])
    T = int(cfg.max_length)
    dtype = packed["emb"].dtype
    if batch_tile <= 0:
        batch_tile = _auto_tile_beam(packed, att, S, K, batch=B)

    kernel = functools.partial(
        _grid_beam_kernel, L, K, T, cfg.start_id, cfg.end_id, cfg.pad_id, early_exit
    )
    weight_args: List[jnp.ndarray] = [packed["emb"]]
    for i in range(L):
        weight_args += [packed[f"w_ih_{i}"], packed[f"w_hh_{i}"], packed[f"b_{i}"].reshape(1, -1)]
    weight_args += [att["w_h"], att["v"], packed["w_out"], packed["b_out"].reshape(1, -1)]
    n_inputs = 2 + len(weight_args)

    mem = memory.astype(dtype)
    u = grid_memory_proj(att, memory)

    def one_tile(args):
        mem_t, u_t = args
        Bt = mem_t.shape[0]
        KB = K * Bt
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((T, KB), jnp.int32),
                jax.ShapeDtypeStruct((T, KB), jnp.int32),
                jax.ShapeDtypeStruct((KB, 1), jnp.float32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_inputs,
            out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(3)),
            scratch_shapes=[
                pltpu.VMEM((L, KB, H), dtype),
                pltpu.VMEM((L, KB, H), dtype),
            ],
            interpret=interpret,
        )(mem_t, u_t, *weight_args)

    Bp = _round_up(B, batch_tile)
    if Bp != B:
        mem = jnp.pad(mem, ((0, Bp - B), (0, 0), (0, 0)))
        u = jnp.pad(u, ((0, Bp - B), (0, 0), (0, 0)))
    nc = Bp // batch_tile
    if nc == 1:
        tok_kb, beam_kb, scores_kb = one_tile((mem, u))
        tok_kb, beam_kb, scores_kb = tok_kb[None], beam_kb[None], scores_kb[None]
    else:
        # Grouped lax.map: one flat map over all nc tiles puts its
        # (nc, T, K*Bt) x2 token accumulators in XLA *scoped VMEM* — at
        # B=3072/K=5 that is 17.6M > the 16M scoped limit, a hard Mosaic
        # compile OOM (2026-08-18 on-chip; vmap-of-pallas_call is worse
        # still, 33.4M, because the whole vmapped output is stack-
        # allocated).  Mapping GROUP tiles at a time keeps each
        # accumulator ~2.3M and concatenates the groups in HBM; the tile
        # program is identical across groups so compile cost is one
        # kernel + a short unrolled chain.
        mem_r = mem.reshape(nc, batch_tile, S, E)
        u_r = u.reshape((nc, batch_tile) + u.shape[1:])
        group = max(1, int(os.environ.get("IMG2LATEX_BEAM_MAP_GROUP", "8")))
        parts = [
            jax.lax.map(one_tile, (mem_r[s : s + group], u_r[s : s + group]))
            if min(group, nc - s) > 1
            else jax.tree_util.tree_map(
                lambda x: x[None], one_tile((mem_r[s], u_r[s]))
            )
            for s in range(0, nc, group)
        ]
        tok_kb = jnp.concatenate([p[0] for p in parts])
        beam_kb = jnp.concatenate([p[1] for p in parts])
        scores_kb = jnp.concatenate([p[2] for p in parts])

    return _select_from_beam_tiles(
        tok_kb, beam_kb, scores_kb, nc, T, K, batch_tile, Bp, B, cfg
    )


def pallas_full_grid_sample_decode(
    packed: Dict[str, Any],
    att: Dict[str, Any],
    memory: jnp.ndarray,  # (B, S, E)
    max_length: int,
    start_id: int,
    end_id: int,
    pad_id: int,
    top_k: int,
    seed,
    temperature: float = 1.0,
    top_p: float = 0.0,
    interpret: bool = False,
    batch_tile: int = 0,
    early_exit: bool = False,
) -> jnp.ndarray:
    """Grid-memory analog of ``pallas_full_sample_decode`` (temperature +
    top-k/top-p filtering + Gumbel-max, ``_sample_next_token``)."""
    assert top_k > 0 or top_p > 0.0, "use pallas_full_grid_greedy_decode for argmax decoding"
    B, S, E = memory.shape
    L = int(packed["num_layers"])
    H = int(packed["hidden_dim"])
    dtype = packed["emb"].dtype
    if batch_tile <= 0:
        batch_tile = _auto_tile(packed, att, S, batch=B)
    kernel = functools.partial(
        _grid_sample_kernel,
        L, max_length, start_id, end_id, pad_id, int(top_k), float(top_p), early_exit,
    )
    inv_t = jnp.float32(1.0 / temperature) if temperature not in (0.0, 1.0) else None
    w_out = packed["w_out"]
    b_out = packed["b_out"].reshape(1, -1)
    if inv_t is not None:
        w_out = (w_out.astype(jnp.float32) * inv_t).astype(w_out.dtype)
        b_out = b_out * inv_t
    weight_args: List[jnp.ndarray] = [packed["emb"]]
    for i in range(L):
        weight_args += [packed[f"w_ih_{i}"], packed[f"w_hh_{i}"], packed[f"b_{i}"].reshape(1, -1)]
    weight_args += [att["w_h"], att["v"], w_out, b_out]
    n_inputs = 2 + len(weight_args)

    mem = memory.astype(dtype)
    u = grid_memory_proj(att, memory)
    seed0 = jnp.asarray(seed, jnp.int32).reshape(())
    nc_total = _round_up(B, batch_tile) // batch_tile
    seeds = seed0 + jnp.arange(nc_total, dtype=jnp.int32)

    def one_tile(args) -> jnp.ndarray:
        mem_t, u_t, tile_seed = args
        tile = mem_t.shape[0]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((max_length, tile), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_inputs
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((L, tile, H), dtype),
                pltpu.VMEM((L, tile, H), dtype),
            ],
            interpret=interpret,
        )(mem_t, u_t, *weight_args, tile_seed.reshape(1, 1))

    return _run_tiled(one_tile, (mem, u), B, batch_tile, max_length, per_tile=seeds)
