"""Fused greedy decode step as a single Pallas TPU kernel.

One autoregressive step of the LSTM decoder — token embedding lookup, L LSTM
layers, vocab projection, argmax — fused into one kernel so that per step:

* the embedding gather is a one-hot matmul on the MXU (dynamic row gathers
  lower poorly on TPU; a (B, Vp) x (Vp, E) matmul is ~free at these sizes);
* all gate matmuls and the vocab projection run back-to-back from VMEM with
  float32 accumulation (``preferred_element_type``);
* only the winning token ids (B,) and the carry leave the kernel — logits
  never round-trip to HBM on the greedy path.

Driven by ``lax.scan`` from :func:`pallas_greedy_decode`.  The vocab is padded
to a multiple of 128 (lane width); padded logit columns get a -inf bias so
argmax can never select them.  Used by the Predictor when
``hardware.use_pallas_decode`` is on and the shapes fit VMEM; the scan-based
XLA path remains the correctness fallback (identical outputs, tested).

Kernel-language reference: /opt/skills/guides/pallas_guide.md.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Weight packing
# ---------------------------------------------------------------------------


def pack_decoder_weights(params: Dict[str, Any], vocab_size: int, dtype=jnp.bfloat16):
    """Extract + pad the decode-path weights from a Seq2SeqModel param tree.

    Returns a dict of arrays with the vocab dimension padded to a multiple of
    128: ``emb (Vp, E)``, per-layer ``w_ih (In, 4H)``, ``w_hh (H, 4H)``,
    ``b (4H,)`` (b_ih + b_hh folded), ``w_out (H, Vp)``, ``b_out (Vp,)`` with
    -inf on padded columns.
    """
    cell = params["params"]["decoder"]["cell"] if "params" in params else params["decoder"]["cell"]
    # One batched host fetch for every leaf: device_get stages every copy
    # async before blocking, so the ~10 weight fetches cost one round trip
    # on remoted backends instead of ten serial np.asarray syncs (measured
    # as seconds of decode-fn setup on the tunnel).
    cell = jax.device_get(cell)
    emb = np.asarray(cell["embedding"]["embedding"], dtype=np.float32)  # (V, E)
    V, E = emb.shape
    Vp = _round_up(V, 128)
    emb_p = np.zeros((Vp, E), np.float32)
    emb_p[:V] = emb

    layers = []
    lstm = cell["lstm"]
    li = 0
    while f"W_ih_l{li}" in lstm:
        w_ih = np.asarray(lstm[f"W_ih_l{li}"], np.float32)
        w_hh = np.asarray(lstm[f"W_hh_l{li}"], np.float32)
        b = np.asarray(lstm[f"b_ih_l{li}"], np.float32) + np.asarray(
            lstm[f"b_hh_l{li}"], np.float32
        )
        layers.append((w_ih, w_hh, b))
        li += 1

    w_out = np.asarray(cell["out"]["kernel"], np.float32)  # (H, V)
    b_out = np.asarray(cell["out"]["bias"], np.float32)
    H = w_out.shape[0]
    w_out_p = np.zeros((H, Vp), np.float32)
    w_out_p[:, :V] = w_out
    b_out_p = np.full((Vp,), NEG_INF, np.float32)
    b_out_p[:V] = b_out

    packed = {
        "emb": jnp.asarray(emb_p, dtype),
        "w_out": jnp.asarray(w_out_p, dtype),
        "b_out": jnp.asarray(b_out_p, jnp.float32),
        "num_layers": len(layers),
        "vocab_padded": Vp,
        "vocab": V,
        "embed_dim": E,
        "hidden_dim": layers[0][1].shape[0],
    }
    for i, (w_ih, w_hh, b) in enumerate(layers):
        packed[f"w_ih_{i}"] = jnp.asarray(w_ih, dtype)
        packed[f"w_hh_{i}"] = jnp.asarray(w_hh, dtype)
        packed[f"b_{i}"] = jnp.asarray(b, jnp.float32)
    return packed


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _decode_step_kernel(num_layers: int, *refs):
    """refs layout:
    [tokens (B,1) i32] [ctx (B,E)] [h (L,B,H)] [c (L,B,H)]
    [emb (Vp,E)] [w_ih_0 w_hh_0 b_0 ... per layer ...] [w_out (H,Vp)] [b_out (1,Vp)]
    -> outputs: [next_tokens (B,1) i32] [h_out (L,B,H)] [c_out (L,B,H)]
    """
    (tokens_ref, ctx_ref, h_ref, c_ref, emb_ref) = refs[:5]
    idx = 5
    layer_refs = []
    for _ in range(num_layers):
        layer_refs.append((refs[idx], refs[idx + 1], refs[idx + 2]))
        idx += 3
    w_out_ref, b_out_ref = refs[idx], refs[idx + 1]
    out_tok_ref, h_out_ref, c_out_ref = refs[idx + 2], refs[idx + 3], refs[idx + 4]

    B = tokens_ref.shape[0]
    Vp = emb_ref.shape[0]
    dtype = emb_ref.dtype

    # Embedding lookup as a one-hot matmul on the MXU.
    tokens = tokens_ref[:]  # (B, 1) int32
    col = jax.lax.broadcasted_iota(jnp.int32, (B, Vp), 1)
    onehot = (col == tokens).astype(dtype)  # (B, Vp)
    x = jnp.dot(onehot, emb_ref[:], preferred_element_type=jnp.float32)  # (B, E)
    x = jnp.concatenate([x.astype(dtype), ctx_ref[:]], axis=-1)  # (B, 2E)

    for layer, (w_ih_ref, w_hh_ref, b_ref) in enumerate(layer_refs):
        h_prev = h_ref[layer]
        c_prev = c_ref[layer].astype(jnp.float32)
        gates = (
            jnp.dot(x, w_ih_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(h_prev, w_hh_ref[:], preferred_element_type=jnp.float32)
            + b_ref[:]
        )  # (B, 4H) f32
        i_g, f_g, g_g, o_g = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f_g) * c_prev + jax.nn.sigmoid(i_g) * jnp.tanh(g_g)
        h_new = jax.nn.sigmoid(o_g) * jnp.tanh(c_new)
        h_out_ref[layer] = h_new.astype(dtype)
        c_out_ref[layer] = c_new.astype(dtype)
        x = h_new.astype(dtype)

    logits = (
        jnp.dot(x, w_out_ref[:], preferred_element_type=jnp.float32) + b_out_ref[:]
    )  # (B, Vp) f32; padded columns carry -inf bias
    out_tok_ref[:] = jnp.argmax(logits, axis=-1, keepdims=True).astype(jnp.int32)


def fused_decode_step(packed: Dict[str, Any], interpret: bool = False):
    """Build (tokens (B,), context (B,E), h, c) -> (next (B,), h, c) using the
    fused kernel.  Shapes are static per returned callable."""
    L = int(packed["num_layers"])
    dtype = packed["emb"].dtype

    kernel = functools.partial(_decode_step_kernel, L)

    def step(tokens: jnp.ndarray, ctx: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray):
        B = tokens.shape[0]
        H = packed["hidden_dim"]
        weight_args: List[jnp.ndarray] = [packed["emb"]]
        for i in range(L):
            weight_args += [packed[f"w_ih_{i}"], packed[f"w_hh_{i}"], packed[f"b_{i}"].reshape(1, -1)]
        weight_args += [packed["w_out"], packed["b_out"].reshape(1, -1)]

        out_shapes = (
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((L, B, H), dtype),
            jax.ShapeDtypeStruct((L, B, H), dtype),
        )
        n_inputs = 4 + len(weight_args)
        toks, h_new, c_new = pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_inputs,
            out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(3)),
            interpret=interpret,
        )(tokens.reshape(B, 1), ctx.astype(dtype), h.astype(dtype), c.astype(dtype), *weight_args)
        return toks[:, 0], h_new, c_new

    return step


# ---------------------------------------------------------------------------
# Greedy decode loop on top of the fused step
# ---------------------------------------------------------------------------


def pallas_greedy_decode(
    packed: Dict[str, Any],
    context: jnp.ndarray,  # (B, E) pooled encoder embedding
    max_length: int,
    start_id: int,
    end_id: int,
    pad_id: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full greedy decode with the fused kernel inside a lax.scan.

    Semantically identical to ``greedy_sample_decode`` with default filters
    (argmax, finished->PAD); returns (B, max_length) int32.
    """
    B = context.shape[0]
    L = int(packed["num_layers"])
    H = int(packed["hidden_dim"])
    dtype = packed["emb"].dtype
    step = fused_decode_step(packed, interpret=interpret)
    ctx = context.astype(dtype)

    def scan_step(state, _):
        tokens, h, c, finished = state
        nxt, h, c = step(tokens, ctx, h, c)
        out = jnp.where(finished, jnp.int32(pad_id), nxt)
        finished = jnp.logical_or(finished, out == end_id)
        return (out, h, c, finished), out

    init = (
        jnp.full((B,), start_id, jnp.int32),
        jnp.zeros((L, B, H), dtype),
        jnp.zeros((L, B, H), dtype),
        jnp.zeros((B,), bool),
    )
    _, tokens_t = jax.lax.scan(scan_step, init, None, length=max_length)
    return jnp.swapaxes(tokens_t, 0, 1)


def _decode_loop(
    next_token,  # (t, logits (B, Vp) f32) -> (B, 1) i32
    ctx_of,  # (h_top (B, H) dtype) -> context (B, E) dtype
    emb_ref,
    layer_refs,
    w_out_ref,
    b_out_ref,
    out_ref,
    h_ref,
    c_ref,
    num_layers: int,
    max_length: int,
    start_id: int,
    end_id: int,
    pad_id: int,
    early_exit: bool,
    score_ref=None,
    signal: str = "logp",
):
    """The whole-decode loop body shared by every (greedy | sampling) x
    (vector | grid) kernel: one-hot embedding matmul, context from
    ``ctx_of`` (a constant closure for vector memory; in-kernel additive
    attention for grid memory — ``grid_decode._attend``), the L-layer LSTM
    stack, vocab projection, then ``next_token`` picks (argmax or a
    filtered Gumbel-max draw).

    ``score_ref`` (optional, (1, B) f32 VMEM): accumulates the per-sequence
    confidence — sum over emitting steps (END included, post-END PAD steps
    masked) of the per-step ``signal``:

      * ``"logp"``    — ``log_softmax(logits)`` at the chosen token;
      * ``"margin"``  — top-1 minus top-2 logit (== the log-prob gap: the
        logsumexp cancels), the measured-best selective-beam gate
        (``scripts/selective_signal_ab.py``);
      * ``"entropy"`` — negative entropy of the step distribution.

    GREEDY-ONLY assumption for the margin-family signals: ``"margin"`` and
    ``"margin_logp[:alpha]"`` mask the *chosen* token ``nxt`` to find the
    runner-up, which equals masking the argmax only when ``next_token`` is
    greedy.  A sampling ``next_token`` would make the margin degenerate to
    ~0 whenever the draw is not the argmax.  This is safe today because no
    sampling entry point accepts ``score_ref``/``signal``
    (``pallas_full_sample_decode`` has neither parameter) and the selective
    path requests scores only on greedy kernels (``predictor.py``); any new
    sampling-with-scores entry must switch the margin to a true top-2.

    The selective-beam path ranks sequences by this confidence to choose
    which rows get a beam re-decode (``predictor.py``).  The padded vocab
    columns carry a ~-1e30 bias (``pack_decoder_weights``) so they vanish
    from the logsumexp (and contribute ``exp(-big) * logp == 0`` to the
    entropy sum; the margin mask reuses the same ~-1e30 scale).

    Mosaic notes (the first version crashed the on-chip compiler): the token
    stream is written **time-major** so the per-step dynamic store
    ``out_ref[pl.ds(t, 1), :]`` indexes the *sublane* dimension (dynamic
    lane-dim stores of width 1 into a non-128-multiple minor dim are what
    broke), and the finished flag is carried as int32 arithmetic — bool
    vectors in a ``fori_loop`` carry are the other Mosaic-hostile idiom.
    The callers transpose the (T, B) output back to (B, T).

    ``early_exit``: stop once every row has emitted END — the trained-model
    latency win (mean sequence length << max_length).  Pre-fill the tail
    with PAD (skipped steps never store), carry (t, tokens, finished)
    through a while_loop with a scalar all-finished condition.
    Output-identical to the full-length loop.
    """
    B = h_ref.shape[1]
    Vp = emb_ref.shape[0]
    dtype = emb_ref.dtype

    h_ref[...] = jnp.zeros_like(h_ref)
    c_ref[...] = jnp.zeros_like(c_ref)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, Vp), 1)

    def body(t, state):
        tokens, finished = state  # (B, 1) i32, (B, 1) i32 (0/1)
        onehot = (col == tokens).astype(dtype)
        emb = jnp.dot(onehot, emb_ref[:], preferred_element_type=jnp.float32)
        ctx = ctx_of(h_ref[num_layers - 1])
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
        nxt = next_token(t, logits)
        if score_ref is not None:
            # per-step confidence signal, masked on already-finished rows.
            live = (1 - finished).astype(jnp.float32)
            if signal == "margin":
                # top-1 − top-2 logit; mask the chosen (argmax) column with
                # the same ~-1e30 scale the vocab padding uses (Mosaic-safe,
                # no inf literals).  Greedy's nxt IS the argmax, so the
                # remaining max is the second-best logit; on exact ties the
                # masked column's twin survives and the margin is 0 — the
                # same value lax.top_k gives the scan oracle.
                top1 = jnp.max(logits, axis=-1, keepdims=True)
                rest = jnp.where(col == nxt, -1e30, logits)
                step = top1 - jnp.max(rest, axis=-1, keepdims=True)
            elif signal == "entropy":
                # negative entropy (smaller = more entropic = less
                # confident, matching the bottom-k rule).
                m = jnp.max(logits, axis=-1, keepdims=True)
                lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True))
                logp = logits - lse
                step = jnp.sum(jnp.exp(logp) * logp, axis=-1, keepdims=True)
            elif signal.startswith("margin_logp"):
                # composite: margin + alpha*chosen-logp in ONE accumulator
                # (r4 offline search, scripts/selective_signal_ab.py).  The
                # margin needs no logsumexp (it cancels); the logp term does.
                from img2latex_tpu.decoding.decode import signal_alpha

                alpha = signal_alpha(signal)
                top1 = jnp.max(logits, axis=-1, keepdims=True)
                rest = jnp.where(col == nxt, -1e30, logits)
                lse = top1 + jnp.log(
                    jnp.sum(jnp.exp(logits - top1), axis=-1, keepdims=True)
                )
                chosen = jnp.sum(
                    jnp.where(col == nxt, logits, 0.0), axis=-1, keepdims=True
                )
                step = (top1 - jnp.max(rest, axis=-1, keepdims=True)) + alpha * (
                    chosen - lse
                )
            else:  # "logp": log-prob of the chosen token
                m = jnp.max(logits, axis=-1, keepdims=True)
                lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True))
                chosen = jnp.sum(
                    jnp.where(col == nxt, logits, 0.0), axis=-1, keepdims=True
                )  # (B, 1)
                step = chosen - lse
            score_ref[...] += (step * live).reshape(1, B)
        # finished-select and END-absorption in int32 arithmetic (no bools).
        out_tok = finished * jnp.int32(pad_id) + (1 - finished) * nxt
        finished = jnp.maximum(finished, (out_tok == end_id).astype(jnp.int32))
        out_ref[pl.ds(t, 1), :] = out_tok.reshape(1, B)
        return out_tok, finished

    tokens0 = jnp.full((B, 1), start_id, jnp.int32)
    finished0 = jnp.zeros((B, 1), jnp.int32)
    if score_ref is not None:
        score_ref[...] = jnp.zeros_like(score_ref)
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


def _unpack_loop_refs(
    num_layers: int, refs, n_lead: int, n_extra: int = 0, n_out_extra: int = 0
):
    """Common ref-layout unpacking for the whole-decode kernels:
    [<n_lead leading refs>] [emb] [w_ih_i w_hh_i b_i]*L [w_out] [b_out]
    [<n_extra trailing input refs>] [out] [<n_out_extra extra output refs>]
    [h scratch] [c scratch]."""
    lead = refs[:n_lead]
    emb_ref = refs[n_lead]
    idx = n_lead + 1
    layer_refs = []
    for _ in range(num_layers):
        layer_refs.append((refs[idx], refs[idx + 1], refs[idx + 2]))
        idx += 3
    w_out_ref, b_out_ref = refs[idx], refs[idx + 1]
    extra = refs[idx + 2 : idx + 2 + n_extra]
    out_ref = refs[idx + 2 + n_extra]
    out_extra = refs[idx + 3 + n_extra : idx + 3 + n_extra + n_out_extra]
    h_ref = refs[idx + 3 + n_extra + n_out_extra]
    c_ref = refs[idx + 4 + n_extra + n_out_extra]
    return (
        lead, emb_ref, layer_refs, w_out_ref, b_out_ref, extra, out_ref,
        out_extra, h_ref, c_ref,
    )


def _full_decode_kernel(
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
    """Entire greedy decode loop in ONE kernel: weights stay VMEM-resident
    across all ``max_length`` steps (no per-step HBM weight reloads, no
    per-step XLA scan bookkeeping).  See :func:`_decode_loop`.

    refs: [ctx (B,E)] [emb (Vp,E)] [w_ih_i w_hh_i b_i]*L [w_out (H,Vp)]
          [b_out (1,Vp)] -> out [tokens (T,B) i32]
          (+ [score (1,B) f32] when ``with_score``),
    scratch: h (L,B,H), c (L,B,H)
    """
    (
        (ctx_ref,), emb_ref, layer_refs, w_out_ref, b_out_ref, _, out_ref,
        out_extra, h_ref, c_ref,
    ) = _unpack_loop_refs(num_layers, refs, 1, n_out_extra=1 if with_score else 0)
    ctx = ctx_ref[:]

    def greedy(t, logits):
        return jnp.argmax(logits, axis=-1, keepdims=True).astype(jnp.int32)

    _decode_loop(
        greedy, lambda h_top: ctx, emb_ref, layer_refs, w_out_ref, b_out_ref,
        out_ref, h_ref, c_ref,
        num_layers, max_length, start_id, end_id, pad_id, early_exit,
        score_ref=out_extra[0] if with_score else None,
        signal=signal,
    )


def pallas_full_greedy_decode(
    packed: Dict[str, Any],
    context: jnp.ndarray,
    max_length: int,
    start_id: int,
    end_id: int,
    pad_id: int,
    interpret: bool = False,
    batch_tile: int = 256,
    early_exit: bool = False,
    return_scores: bool = False,
    signal: str = "logp",
) -> jnp.ndarray:
    """Whole-decode-in-one-kernel variant of :func:`pallas_greedy_decode`.

    ``return_scores=True`` additionally returns the per-sequence confidence
    ((B,) f32 — the sum of the per-step ``signal``, see ``_decode_loop``'s
    ``score_ref``) the selective-beam path ranks on.

    ``early_exit=True`` swaps the in-kernel fori_loop for a while_loop that
    bails out once every row in the tile has emitted END (tail rows are
    PAD-prefilled) — output-identical, and each batch tile exits
    independently, so latency tracks the tile's longest sequence.

    Batches larger than ``batch_tile`` are split into tiles at the XLA level
    (``lax.map`` over chunks): at reference scale the weights plus one
    256-row tile are ~17 MB of VMEM and 512 rows overflow.  Each chunk pays
    one ~13 MB weight DMA into VMEM, then runs all ``max_length`` steps from
    VMEM — unlike the scanned step-kernel path, which re-reads the weights
    from HBM on every one of the steps.  (A multi-program Pallas grid with
    constant-index weight blocks is the in-kernel alternative; it crashes
    the Mosaic compiler on this toolchain, so tiling stays in XLA.)

    Parity: bit-identical to the scanned step-kernel path (same kernel
    numerics).  Versus the pure-XLA scan path in bfloat16, near-tie argmax
    steps can flip (measured on-chip: 1 row in 256 with random weights);
    float32 interpret-mode parity is exact (tested).
    """
    B = context.shape[0]
    L = int(packed["num_layers"])
    H = int(packed["hidden_dim"])
    dtype = packed["emb"].dtype
    kernel = functools.partial(
        _full_decode_kernel, L, max_length, start_id, end_id, pad_id, early_exit,
        return_scores, signal,
    )
    weight_args: List[jnp.ndarray] = [packed["emb"]]
    for i in range(L):
        weight_args += [packed[f"w_ih_{i}"], packed[f"w_hh_{i}"], packed[f"b_{i}"].reshape(1, -1)]
    weight_args += [packed["w_out"], packed["b_out"].reshape(1, -1)]
    n_inputs = 1 + len(weight_args)

    def one_tile(ctx_tile: jnp.ndarray):
        tile = ctx_tile.shape[0]
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
        )(ctx_tile, *weight_args)
        return tuple(out) if return_scores else out[0]

    ctx = context.astype(dtype)
    if B <= batch_tile:
        if return_scores:
            tokens_tb, score = one_tile(ctx)
            return jnp.swapaxes(tokens_tb, 0, 1), score.reshape(B)
        return jnp.swapaxes(one_tile(ctx), 0, 1)
    Bp = _round_up(B, batch_tile)
    if Bp != B:
        ctx = jnp.pad(ctx, ((0, Bp - B), (0, 0)))
    chunks = ctx.reshape(Bp // batch_tile, batch_tile, -1)
    if return_scores:
        tokens_tb, scores_tb = jax.lax.map(one_tile, chunks)  # (nc,T,tile),(nc,1,tile)
        tokens = jnp.swapaxes(tokens_tb, 1, 2).reshape(Bp, max_length)
        return tokens[:B], scores_tb.reshape(Bp)[:B]
    tokens_tb = jax.lax.map(one_tile, chunks)  # (nc, T, tile)
    tokens = jnp.swapaxes(tokens_tb, 1, 2).reshape(Bp, max_length)
    return tokens[:B]


def _sample_next_token(
    logits: jnp.ndarray,  # (B, Vp) f32, temperature pre-folded
    col_i: jnp.ndarray,  # (B, Vp) i32 column iota
    top_k: int,
    top_p: float,
    u: jnp.ndarray,  # (B, Vp) f32 uniform draws
) -> jnp.ndarray:
    """In-kernel filtered categorical draw -> (B, 1) int32.

    Matches ``decode._next_token_probs`` (reference ``predictor.py:294-335``)
    exactly:

    * top-k: keep the k best logits, duplicates counted separately
      (``lax.top_k`` semantics) via ``top_k`` iterative (max, argmax, mask)
      passes;
    * top-p: keep the smallest descending-prob prefix whose strictly-
      preceding cumulative mass is <= p (always keeping the best), with
      prob ties resolved lowest-index-first — the stable-argsort order of
      ``decode.filter_top_p``.  The mass is measured over the RENORMALIZED
      top-k survivors, matching the reference's renormalize-between-filters
      chain (``predictor.py:307-309``; same in ``decode._next_token_probs``).
      No sort: a ``while_loop`` iteratively extracts the max-prob token
      while any row's kept mass is still <= p — trips = the largest
      nucleus size in the tile (small for trained, peaky models; bounded
      by Vp in the uniform worst case);
    * draw: ``argmax(log kept_probs + Gumbal)`` — Gumbel-max samples the
      renormalized kept distribution exactly (normalization is a constant
      shift in log space).
    """
    NEGf = jnp.float32(NEG_INF)
    kth = None
    if top_k > 0:
        cur = logits
        for _ in range(top_k):
            kth = jnp.max(cur, axis=-1, keepdims=True)
            arg = jnp.argmax(cur, axis=-1, keepdims=True).astype(jnp.int32)
            cur = jnp.where(col_i == arg, NEGf, cur)
    if top_p > 0.0:
        Vp = logits.shape[-1]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)  # (B, Vp) f32
        if top_k > 0:
            probs = jnp.where(logits >= kth, probs, jnp.float32(0.0))
            # Renormalize BETWEEN the filters (reference chain) so the
            # nucleus cutoff sees the top-k survivors' relative masses.
            total = jnp.sum(probs, axis=-1, keepdims=True)
            probs = probs / jnp.maximum(total, jnp.float32(1e-38))
        B = logits.shape[0]
        keep0 = jnp.zeros(probs.shape, jnp.float32)
        cum0 = jnp.zeros((B, 1), jnp.float32)

        def n_cond(state):
            _cur, _keep, cum, n = state
            return jnp.logical_and(jnp.any(cum <= top_p), n < Vp)

        def n_body(state):
            cur_p, keep, cum, n = state
            row_max = jnp.max(cur_p, axis=-1, keepdims=True)
            row_arg = jnp.argmax(cur_p, axis=-1, keepdims=True).astype(jnp.int32)
            active = (cum <= top_p).astype(jnp.float32)  # (B, 1) 0/1
            sel = (col_i == row_arg).astype(jnp.float32) * active  # (B, Vp)
            keep = jnp.maximum(keep, sel)
            cum = cum + active * row_max  # strictly-preceding mass check above
            cur_p = jnp.where(sel > 0.0, jnp.float32(-1.0), cur_p)
            return cur_p, keep, cum, n + 1

        # f32 0/1 keep mask + int counter: bool carries are Mosaic-hostile.
        _, keep, _, _ = jax.lax.while_loop(n_cond, n_body, (probs, keep0, cum0, jnp.int32(0)))
        # Zero-prob tokens can enter `keep` in the exhaustion tail (they add
        # no mass, mirroring the reference where zeros are "kept" but can
        # never be drawn) — exclude them from the draw explicitly.
        masked = jnp.where(
            jnp.logical_and(keep > 0.0, probs > 0.0),
            jnp.log(jnp.maximum(probs, jnp.float32(1e-38))),
            NEGf,
        )
    else:
        masked = jnp.where(logits >= kth, logits, NEGf)
    gumbel = -jnp.log(-jnp.log(u))
    return jnp.argmax(masked + gumbel, axis=-1, keepdims=True).astype(jnp.int32)


def _full_sample_kernel(
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
    """Whole-decode loop with **temperature + top-k/top-p sampling** in-kernel.

    Same VMEM-resident-weights structure as :func:`_full_decode_kernel`;
    the per-step token choice replaces argmax with a Gumbel-max draw over
    the filtered logits (temperature is folded into ``w_out``/``b_out`` by
    the caller, so the kernel sees pre-scaled logits):

    * filtering (top-k threshold, top-p nucleus) and the draw live in
      :func:`_sample_next_token` — exact ``decode._next_token_probs``
      semantics, same distribution as the scan path's categorical draw but
      a different RNG stream;
    * ``U`` comes from a counter-based integer hash of (seed, step, row,
      col) (two rounds of xorshift-multiply, the "lowbias32" mixer) rather
      than ``pltpu.prng_random_bits``: plain uint32 VPU ops run identically
      in Mosaic and in interpret mode (the TPU PRNG primitives have no CPU
      lowering on this toolchain) and make draws reproducible per seed.

    refs: [ctx (B,E)] [emb (Vp,E)] [w_ih_i w_hh_i b_i]*L [w_out (H,Vp)]
          [b_out (1,Vp)] [seed (1,1) i32 SMEM] -> out [tokens (T,B) i32],
    scratch: h (L,B,H), c (L,B,H)
    """
    (ctx_ref,), emb_ref, layer_refs, w_out_ref, b_out_ref, (seed_ref,), out_ref, _, h_ref, c_ref = (
        _unpack_loop_refs(num_layers, refs, 1, n_extra=1)
    )
    ctx = ctx_ref[:]
    sampler = _make_sampler(seed_ref, h_ref.shape[1], emb_ref.shape[0], top_k, top_p)
    _decode_loop(
        sampler, lambda h_top: ctx, emb_ref, layer_refs, w_out_ref, b_out_ref,
        out_ref, h_ref, c_ref,
        num_layers, max_length, start_id, end_id, pad_id, early_exit,
    )


def _make_sampler(seed_ref, B: int, Vp: int, top_k: int, top_p: float):
    """Build the per-step sampling ``next_token`` callback for
    :func:`_decode_loop`: a lowbias32 uniform field + the shared filter/draw
    (:func:`_sample_next_token`).

    The hash runs in int32 with logical shifts: Mosaic rejects
    uint32->float32 casts in-kernel ("Unsupported cast", measured on chip
    2026-08-17) and uint->int bitcasts are equally dicey, while int32
    wraparound multiply/add and lax.shift_right_logical lower fine and are
    bit-identical to the uint32 formulation (two's complement).
    """
    seed_i = seed_ref[0, 0]
    row_i = jax.lax.broadcasted_iota(jnp.int32, (B, Vp), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (B, Vp), 1)
    srl = jax.lax.shift_right_logical

    def random_uniform(t):
        """(B, Vp) U(0,1) from a lowbias32-style hash of (seed, t, row, col);
        int32 constants are the two's-complement views of the uint32 ones."""
        x = (
            seed_i
            + t * jnp.int32(-1640531527)  # 0x9E3779B9
            + row_i * jnp.int32(-2048144789)  # 0x85EBCA6B
            + col_i * jnp.int32(-1028477387)  # 0xC2B2AE35
        )
        x = x ^ srl(x, 16)
        x = x * jnp.int32(2146121005)  # 0x7FEB352D
        x = x ^ srl(x, 15)
        x = x * jnp.int32(-2073254261)  # 0x846CA68B
        x = x ^ srl(x, 16)
        # Top 24 bits: non-negative in int32, so the int->float cast is exact.
        u = srl(x, 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
        return u * jnp.float32(1.0 - 2e-7) + jnp.float32(1e-7)

    def next_token(t, logits):
        return _sample_next_token(logits, col_i, top_k, top_p, random_uniform(t))

    return next_token


def pallas_full_sample_decode(
    packed: Dict[str, Any],
    context: jnp.ndarray,
    max_length: int,
    start_id: int,
    end_id: int,
    pad_id: int,
    top_k: int,
    seed,
    temperature: float = 1.0,
    top_p: float = 0.0,
    interpret: bool = False,
    batch_tile: int = 256,
    early_exit: bool = False,
) -> jnp.ndarray:
    """Temperature + top-k/top-p sampling variant of
    :func:`pallas_full_greedy_decode` (reference sampling semantics:
    ``predictor.py:294-335``; the scan equivalent is
    ``decode.greedy_sample_decode`` with ``top_k > 0`` or ``top_p > 0``).

    ``temperature`` is folded into the vocab projection outside the kernel
    (``w_out/T``, ``b_out/T``) — algebraically identical to dividing the
    logits.  ``seed`` (int32 scalar or array) seeds the in-kernel TPU PRNG;
    each batch tile reseeds with ``seed + tile_index``.  Top-p runs sort-free
    in-kernel (iterative nucleus extraction, :func:`_sample_next_token`).
    """
    assert top_k > 0 or top_p > 0.0, "use pallas_full_greedy_decode for argmax decoding"
    B = context.shape[0]
    L = int(packed["num_layers"])
    H = int(packed["hidden_dim"])
    dtype = packed["emb"].dtype
    kernel = functools.partial(
        _full_sample_kernel,
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
    weight_args += [w_out, b_out]
    n_inputs = 1 + len(weight_args)

    def one_tile(args) -> jnp.ndarray:
        ctx_tile, tile_seed = args
        tile = ctx_tile.shape[0]
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
        )(ctx_tile, *weight_args, tile_seed.reshape(1, 1))

    ctx = context.astype(dtype)
    seed0 = jnp.asarray(seed, jnp.int32).reshape(())
    if B <= batch_tile:
        return jnp.swapaxes(one_tile((ctx, seed0)), 0, 1)
    Bp = _round_up(B, batch_tile)
    if Bp != B:
        ctx = jnp.pad(ctx, ((0, Bp - B), (0, 0)))
    nc = Bp // batch_tile
    chunks = ctx.reshape(nc, batch_tile, -1)
    seeds = seed0 + jnp.arange(nc, dtype=jnp.int32)
    tokens_tb = jax.lax.map(one_tile, (chunks, seeds))  # (nc, T, tile)
    tokens = jnp.swapaxes(tokens_tb, 1, 2).reshape(Bp, max_length)
    return tokens[:B]


def vmem_bytes_estimate(packed: Dict[str, Any], batch: int) -> int:
    """Rough VMEM footprint of one kernel invocation (weights + IO)."""
    itemsize = jnp.dtype(packed["emb"].dtype).itemsize
    total = 0
    for k, v in packed.items():
        if hasattr(v, "size"):
            total += v.size * v.dtype.itemsize
    L, H, E = packed["num_layers"], packed["hidden_dim"], packed["embed_dim"]
    Vp = packed["vocab_padded"]
    total += batch * (2 * E + 4 * L * H + Vp) * max(itemsize, 4)
    return int(total)
