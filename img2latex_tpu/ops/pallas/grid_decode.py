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
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from img2latex_tpu.ops.pallas.decode_step import _round_up, _sample_next_token

NEG = -1e30


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
    *refs,
):
    """refs: [mem (B,S,E)] [u (B,S,A)] [emb (Vp,E)] [w_ih_i w_hh_i b_i]*L
    [w_h (H,A)] [v (1,A)] [w_out (H,Vp)] [b_out (1,Vp)]
    -> out [tokens (T,B) i32]; scratch h (L,B,H), c (L,B,H)."""
    mem_ref, u_ref, emb_ref = refs[0], refs[1], refs[2]
    idx = 3
    layer_refs = []
    for _ in range(num_layers):
        layer_refs.append((refs[idx], refs[idx + 1], refs[idx + 2]))
        idx += 3
    w_h_ref, v_ref, w_out_ref, b_out_ref = refs[idx], refs[idx + 1], refs[idx + 2], refs[idx + 3]
    out_ref = refs[idx + 4]
    h_ref, c_ref = refs[idx + 5], refs[idx + 6]

    B = mem_ref.shape[0]
    Vp = emb_ref.shape[0]
    dtype = emb_ref.dtype

    h_ref[...] = jnp.zeros_like(h_ref)
    c_ref[...] = jnp.zeros_like(c_ref)

    def body(t, state):
        tokens, finished = state  # (B, 1) i32, (B, 1) i32
        col = jax.lax.broadcasted_iota(jnp.int32, (B, Vp), 1)
        onehot = (col == tokens).astype(dtype)
        emb = jnp.dot(onehot, emb_ref[:], preferred_element_type=jnp.float32)
        # Attention context from the PREVIOUS top-layer h (DecoderCell order:
        # attend first, then step the LSTM — models/decoder.py).
        ctx = _attend(mem_ref, u_ref, w_h_ref, v_ref, h_ref[num_layers - 1])
        x = jnp.concatenate([emb.astype(dtype), ctx], axis=-1)
        for layer, (w_ih_ref, w_hh_ref, b_ref) in enumerate(layer_refs):
            gates = (
                jnp.dot(x, w_ih_ref[:], preferred_element_type=jnp.float32)
                + jnp.dot(h_ref[layer], w_hh_ref[:], preferred_element_type=jnp.float32)
                + b_ref[:]
            )
            i_g, f_g, g_g, o_g = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f_g) * c_ref[layer].astype(jnp.float32) + jax.nn.sigmoid(
                i_g
            ) * jnp.tanh(g_g)
            h_new = jax.nn.sigmoid(o_g) * jnp.tanh(c_new)
            h_ref[layer] = h_new.astype(dtype)
            c_ref[layer] = c_new.astype(dtype)
            x = h_new.astype(dtype)
        logits = jnp.dot(x, w_out_ref[:], preferred_element_type=jnp.float32) + b_out_ref[:]
        nxt = jnp.argmax(logits, axis=-1, keepdims=True).astype(jnp.int32)
        out_tok = finished * jnp.int32(pad_id) + (1 - finished) * nxt
        finished = jnp.maximum(finished, (out_tok == end_id).astype(jnp.int32))
        out_ref[pl.ds(t, 1), :] = out_tok.reshape(1, B)
        return out_tok, finished

    tokens0 = jnp.full((B, 1), start_id, jnp.int32)
    finished0 = jnp.zeros((B, 1), jnp.int32)
    if not early_exit:
        jax.lax.fori_loop(0, max_length, body, (tokens0, finished0))
        return
    out_ref[...] = jnp.full_like(out_ref, pad_id)

    def w_cond(state):
        t, _, finished = state
        return jnp.logical_and(t < max_length, jnp.sum(finished) < B)

    def w_body(state):
        t, tokens, finished = state
        tokens, finished = body(t, (tokens, finished))
        return t + 1, tokens, finished

    jax.lax.while_loop(w_cond, w_body, (jnp.int32(0), tokens0, finished0))


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
    mem_ref, u_ref, emb_ref = refs[0], refs[1], refs[2]
    idx = 3
    layer_refs = []
    for _ in range(num_layers):
        layer_refs.append((refs[idx], refs[idx + 1], refs[idx + 2]))
        idx += 3
    w_h_ref, v_ref, w_out_ref, b_out_ref = refs[idx], refs[idx + 1], refs[idx + 2], refs[idx + 3]
    seed_ref = refs[idx + 4]
    out_ref = refs[idx + 5]
    h_ref, c_ref = refs[idx + 6], refs[idx + 7]

    B = mem_ref.shape[0]
    Vp = emb_ref.shape[0]
    dtype = emb_ref.dtype

    h_ref[...] = jnp.zeros_like(h_ref)
    c_ref[...] = jnp.zeros_like(c_ref)
    seed_i = seed_ref[0, 0]
    row_i = jax.lax.broadcasted_iota(jnp.int32, (B, Vp), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (B, Vp), 1)
    srl = jax.lax.shift_right_logical

    def random_uniform(t):
        x = (
            seed_i
            + t * jnp.int32(-1640531527)
            + row_i * jnp.int32(-2048144789)
            + col_i * jnp.int32(-1028477387)
        )
        x = x ^ srl(x, 16)
        x = x * jnp.int32(2146121005)
        x = x ^ srl(x, 15)
        x = x * jnp.int32(-2073254261)
        x = x ^ srl(x, 16)
        u = srl(x, 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
        return u * jnp.float32(1.0 - 2e-7) + jnp.float32(1e-7)

    def body(t, state):
        tokens, finished = state
        onehot = (col_i == tokens).astype(dtype)
        emb = jnp.dot(onehot, emb_ref[:], preferred_element_type=jnp.float32)
        ctx = _attend(mem_ref, u_ref, w_h_ref, v_ref, h_ref[num_layers - 1])
        x = jnp.concatenate([emb.astype(dtype), ctx], axis=-1)
        for layer, (w_ih_ref, w_hh_ref, b_ref) in enumerate(layer_refs):
            gates = (
                jnp.dot(x, w_ih_ref[:], preferred_element_type=jnp.float32)
                + jnp.dot(h_ref[layer], w_hh_ref[:], preferred_element_type=jnp.float32)
                + b_ref[:]
            )
            i_g, f_g, g_g, o_g = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f_g) * c_ref[layer].astype(jnp.float32) + jax.nn.sigmoid(
                i_g
            ) * jnp.tanh(g_g)
            h_new = jax.nn.sigmoid(o_g) * jnp.tanh(c_new)
            h_ref[layer] = h_new.astype(dtype)
            c_ref[layer] = c_new.astype(dtype)
            x = h_new.astype(dtype)
        logits = jnp.dot(x, w_out_ref[:], preferred_element_type=jnp.float32) + b_out_ref[:]
        nxt = _sample_next_token(logits, col_i, top_k, top_p, random_uniform(t))
        out_tok = finished * jnp.int32(pad_id) + (1 - finished) * nxt
        finished = jnp.maximum(finished, (out_tok == end_id).astype(jnp.int32))
        out_ref[pl.ds(t, 1), :] = out_tok.reshape(1, B)
        return out_tok, finished

    tokens0 = jnp.full((B, 1), start_id, jnp.int32)
    finished0 = jnp.zeros((B, 1), jnp.int32)
    if not early_exit:
        jax.lax.fori_loop(0, max_length, body, (tokens0, finished0))
        return
    out_ref[...] = jnp.full_like(out_ref, pad_id)

    def w_cond(state):
        t, _, finished = state
        return jnp.logical_and(t < max_length, jnp.sum(finished) < B)

    def w_body(state):
        t, tokens, finished = state
        tokens, finished = body(t, (tokens, finished))
        return t + 1, tokens, finished

    jax.lax.while_loop(w_cond, w_body, (jnp.int32(0), tokens0, finished0))


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
               max_length: int) -> jnp.ndarray:
    """Pad B to a multiple of batch_tile and lax.map ``one_tile`` over chunks.
    Each operand's leading dim is B; extra (non-batch) args ride via closure."""
    Bp = _round_up(B, batch_tile)
    padded = tuple(
        jnp.pad(x, ((0, Bp - B),) + ((0, 0),) * (x.ndim - 1)) if Bp != B else x
        for x in operands
    )
    nc = Bp // batch_tile
    if nc == 1:
        tokens_tb = one_tile(padded)[None]
    else:
        chunks = tuple(x.reshape((nc, batch_tile) + x.shape[1:]) for x in padded)
        tokens_tb = jax.lax.map(one_tile, chunks)  # (nc, T, tile)
    tokens = jnp.swapaxes(tokens_tb, 1, 2).reshape(Bp, max_length)
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
) -> jnp.ndarray:
    """Grid-memory analog of ``pallas_full_greedy_decode``: returns (B, T)
    int32 tokens, semantically identical to the scan path
    (``greedy_sample_decode`` over ``Seq2SeqModel.decode_step``)."""
    B, S, E = memory.shape
    L = int(packed["num_layers"])
    H = int(packed["hidden_dim"])
    dtype = packed["emb"].dtype
    if batch_tile <= 0:
        batch_tile = _auto_tile(packed, att, S, batch=B)
    kernel = functools.partial(
        _grid_greedy_kernel, L, max_length, start_id, end_id, pad_id, early_exit
    )
    weight_args: List[jnp.ndarray] = [packed["emb"]]
    for i in range(L):
        weight_args += [packed[f"w_ih_{i}"], packed[f"w_hh_{i}"], packed[f"b_{i}"].reshape(1, -1)]
    weight_args += [att["w_h"], att["v"], packed["w_out"], packed["b_out"].reshape(1, -1)]
    n_inputs = 2 + len(weight_args)

    mem = memory.astype(dtype)
    u = grid_memory_proj(att, memory)  # (B, S, A) once per batch, XLA

    def one_tile(args) -> jnp.ndarray:
        mem_t, u_t = args
        tile = mem_t.shape[0]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((max_length, tile), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_inputs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((L, tile, H), dtype),
                pltpu.VMEM((L, tile, H), dtype),
            ],
            interpret=interpret,
        )(mem_t, u_t, *weight_args)

    return _run_tiled(one_tile, (mem, u), B, batch_tile, max_length)


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
    mem_ref, u_ref, emb_ref = refs[0], refs[1], refs[2]
    idx = 3
    layer_refs = []
    for _ in range(num_layers):
        layer_refs.append((refs[idx], refs[idx + 1], refs[idx + 2]))
        idx += 3
    w_h_ref, v_ref, w_out_ref, b_out_ref = refs[idx], refs[idx + 1], refs[idx + 2], refs[idx + 3]
    tok_ref, beam_ref, scores_ref = refs[idx + 4], refs[idx + 5], refs[idx + 6]
    h_ref, c_ref = refs[idx + 7], refs[idx + 8]

    Bt = mem_ref.shape[0]
    KB = K * Bt
    Vp = emb_ref.shape[0]
    dtype = emb_ref.dtype
    NEGf = jnp.float32(NEG)

    h_ref[...] = jnp.zeros_like(h_ref)
    c_ref[...] = jnp.zeros_like(c_ref)
    lane = jax.lax.broadcasted_iota(jnp.int32, (KB, Vp), 1)
    pad_row = jnp.where(lane == pad_id, jnp.float32(0.0), NEGf)  # (KB, Vp)
    row_beam = jax.lax.broadcasted_iota(jnp.int32, (KB, 1), 0) // Bt

    def group_reduce(x, op):
        acc = x
        for i in range(1, K):
            acc = op(acc, pltpu.roll(x, (KB - i * Bt) % KB, 0))
        return acc

    def body(t, state):
        tokens, scores, fin = state  # (KB, 1): i32, f32, i32
        onehot = (lane == tokens).astype(dtype)
        emb = jnp.dot(onehot, emb_ref[:], preferred_element_type=jnp.float32)
        # Attention per beam on the parent-gathered previous top-layer h
        # (DecoderCell order: attend first, then step the LSTM).
        h_top = h_ref[num_layers - 1]  # (KB, H)
        ctx = jnp.concatenate(
            [
                _attend(mem_ref, u_ref, w_h_ref, v_ref, h_top[k * Bt : (k + 1) * Bt])
                for k in range(K)
            ],
            axis=0,
        )  # (KB, E)
        x = jnp.concatenate([emb.astype(dtype), ctx], axis=-1)
        for layer, (w_ih_ref, w_hh_ref, b_ref) in enumerate(layer_refs):
            gates = (
                jnp.dot(x, w_ih_ref[:], preferred_element_type=jnp.float32)
                + jnp.dot(h_ref[layer], w_hh_ref[:], preferred_element_type=jnp.float32)
                + b_ref[:]
            )
            i_g, f_g, g_g, o_g = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f_g) * c_ref[layer].astype(jnp.float32) + jax.nn.sigmoid(
                i_g
            ) * jnp.tanh(g_g)
            h_new = jax.nn.sigmoid(o_g) * jnp.tanh(c_new)
            h_ref[layer] = h_new.astype(dtype)
            c_ref[layer] = c_new.astype(dtype)
            x = h_new.astype(dtype)
        logits = jnp.dot(x, w_out_ref[:], preferred_element_type=jnp.float32) + b_out_ref[:]
        m = jnp.max(logits, axis=-1, keepdims=True)
        logp = logits - (jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True)) + m)
        logp = jnp.where(fin > 0, pad_row, logp)
        total = scores + logp  # (KB, Vp)

        cur = total
        parents: List[jnp.ndarray] = []
        toks: List[jnp.ndarray] = []
        scs: List[jnp.ndarray] = []
        for _n in range(K):
            row_max = jnp.max(cur, axis=-1, keepdims=True)
            row_arg = jnp.argmax(cur, axis=-1, keepdims=True).astype(jnp.int32)
            m_all = group_reduce(row_max, jnp.maximum)
            cand = jnp.where(row_max == m_all, row_beam, jnp.int32(K))
            win_beam = group_reduce(cand, jnp.minimum)
            tok_cand = jnp.where(row_beam == win_beam, row_arg, jnp.int32(0))
            win_tok = group_reduce(tok_cand, jnp.maximum)
            parents.append(win_beam)
            toks.append(win_tok)
            scs.append(m_all)
            cur = jnp.where(
                jnp.logical_and(row_beam == win_beam, lane == win_tok), NEGf, cur
            )

        new_tok = jnp.zeros((KB, 1), jnp.int32)
        new_parent = jnp.zeros((KB, 1), jnp.int32)
        new_score = jnp.zeros((KB, 1), jnp.float32)
        for n in range(K):
            sel = row_beam == n
            new_tok = jnp.where(sel, toks[n], new_tok)
            new_parent = jnp.where(sel, parents[n], new_parent)
            new_score = jnp.where(sel, scs[n], new_score)

        delta = jnp.remainder(new_parent - row_beam, jnp.int32(K))
        fin_gathered = jnp.zeros((KB, 1), jnp.int32)
        for i in range(K):
            rolled = fin if i == 0 else pltpu.roll(fin, (KB - i * Bt) % KB, 0)
            fin_gathered = jnp.where(delta == i, rolled, fin_gathered)
        fin_new = jnp.maximum(fin_gathered, (new_tok == end_id).astype(jnp.int32))

        row_pos = jax.lax.broadcasted_iota(jnp.int32, (KB, 1), 0) - row_beam * Bt
        parent_flat = new_parent * Bt + row_pos
        colq = jax.lax.broadcasted_iota(jnp.int32, (KB, KB), 1)
        P = (colq == parent_flat).astype(dtype)
        for layer in range(num_layers):
            h_ref[layer] = jnp.dot(
                P, h_ref[layer], preferred_element_type=jnp.float32
            ).astype(dtype)
            c_ref[layer] = jnp.dot(
                P, c_ref[layer], preferred_element_type=jnp.float32
            ).astype(dtype)

        tok_ref[pl.ds(t, 1), :] = new_tok.reshape(1, KB)
        beam_ref[pl.ds(t, 1), :] = new_parent.reshape(1, KB)
        return new_tok, new_score, fin_new

    tokens0 = jnp.full((KB, 1), start_id, jnp.int32)
    scores0 = jnp.where(row_beam == 0, jnp.float32(0.0), NEGf)
    fin0 = jnp.zeros((KB, 1), jnp.int32)
    if early_exit:
        tok_ref[...] = jnp.full_like(tok_ref, pad_id)
        beam_ref[...] = jnp.broadcast_to(row_beam.reshape(1, KB), beam_ref.shape)

        def w_cond(state):
            t, st = state
            return jnp.logical_and(t < max_length, jnp.sum(st[2]) < KB)

        def w_body(state):
            t, st = state
            return t + 1, body(t, st)

        _, (_, final_scores, _) = jax.lax.while_loop(
            w_cond, w_body, (jnp.int32(0), (tokens0, scores0, fin0))
        )
    else:
        _, final_scores, _ = jax.lax.fori_loop(0, max_length, body, (tokens0, scores0, fin0))
    scores_ref[...] = final_scores


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


def _auto_tile_beam(
    packed, att, S: int, K: int, budget_bytes: int = 0, batch: int = 0
) -> int:
    budget_bytes = budget_bytes or _vmem_budget_bytes()
    tile = max(8, 256 // K)
    if batch > 0:
        # Cap at the (8-rounded) actual batch: see _auto_tile.
        tile = min(tile, max(8, _round_up(batch, 8)))
    while tile > 8 and grid_beam_vmem_bytes_estimate(packed, att, tile, S, K) > budget_bytes:
        tile //= 2
    return max(8, tile)


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
    from img2latex_tpu.decoding.decode import backtrack_and_select

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
        tok_kb, beam_kb, scores_kb = jax.lax.map(
            one_tile,
            (
                mem.reshape(nc, batch_tile, S, E),
                u.reshape((nc, batch_tile) + u.shape[1:]),
            ),
        )

    Bt = batch_tile
    tok_seq = tok_kb.reshape(nc, T, K, Bt).transpose(1, 0, 3, 2).reshape(T, Bp, K)
    beam_seq = beam_kb.reshape(nc, T, K, Bt).transpose(1, 0, 3, 2).reshape(T, Bp, K)
    final_scores = scores_kb.reshape(nc, K, Bt).transpose(0, 2, 1).reshape(Bp, K)
    tokens, scores = backtrack_and_select(tok_seq, beam_seq, final_scores, Bp, K, cfg)
    return tokens[:B], scores[:B]


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

    Bp = _round_up(B, batch_tile)
    mem_p = jnp.pad(mem, ((0, Bp - B), (0, 0), (0, 0))) if Bp != B else mem
    u_p = jnp.pad(u, ((0, Bp - B), (0, 0), (0, 0))) if Bp != B else u
    nc = Bp // batch_tile
    if nc == 1:
        tokens_tb = one_tile((mem_p, u_p, seeds[0]))[None]
    else:
        chunks = (
            mem_p.reshape(nc, batch_tile, S, E),
            u_p.reshape((nc, batch_tile) + u_p.shape[1:]),
            seeds,
        )
        tokens_tb = jax.lax.map(one_tile, chunks)
    tokens = jnp.swapaxes(tokens_tb, 1, 2).reshape(Bp, max_length)
    return tokens[:B]
