"""Whole-beam-decode in ONE Pallas TPU kernel.

The scan-based beam path (``decoding.decode.beam_decode``) re-reads the
decoder weights from HBM on every one of ``max_length`` steps and pays XLA
scan bookkeeping per step; beam throughput trails greedy 3.7x (STATUS r1).
This kernel keeps the weights VMEM-resident across ALL steps (the same trick
as :func:`ops.pallas.decode_step.pallas_full_greedy_decode`) and runs the
beam bookkeeping — K·V top-k, beam-ancestry bookkeeping, carry gathers — on
the VPU in-kernel:

* rows are **beam-major**: row ``k*Bt + s`` is beam k of sample s.  Every
  per-row array stays in ``(K*Bt, 1)`` sublane form — Mosaic rejects
  general 2D shape casts like ``(K, Bt) -> (K*Bt, 1)`` ("unsupported shape
  cast"), so per-sample reductions over beams use **sublane rolls**
  instead: rolling by ``i*Bt`` maps row ``k*Bt+s`` to ``((k+i)%K)*Bt+s`` —
  the same sample, a different beam — so ``op`` over the K rolls is the
  per-sample beam reduction, broadcast back to every row for free;
* top-k over the ``(K, Vp)`` score matrix per sample is K iterative
  (argmax, mask) passes — the same tie-breaking as ``lax.top_k``/
  ``topk_iterative`` (lowest flat index wins), which the oracle tests pin;
* the beam-ancestry carry gather is K rolls of the (K*Bt, H) carry plus
  per-row delta masks (``delta = (parent - beam) mod K``);
* END-absorption matches ``beam_decode`` exactly: finished beams emit PAD
  with additive score 0 and everything else ``-1e30``;
* the kernel emits the per-step (token, parent) history; ancestry
  backtracking + length penalty + best-beam selection reuse
  ``decoding.decode.backtrack_and_select`` (shared with the scan path).

Semantics parity with ``beam_decode`` (reference beam:
``/root/reference/img2latex/model/seq2seq.py:234-298``) is asserted in
interpret mode by tests/test_pallas_beam.py.

Roofline (checkable arithmetic: ``scripts/beam_roofline.py`` ->
``artifacts/beam_roofline.json``).  At the headline bench (B=3072, K=5,
E=H=512, L=2, Vp=512, T=141, tile Bt=51 -> KB=255 beam-rows) each beam-row
step provably executes 12.58 MFLOP of matmuls: embedding one-hot 0.52M,
LSTM 10.5M (layer0 ih 2E->4H + hh, layer1), vocab projection 0.52M, and the
one-hot carry gather P@{h,c} 1.04M (scales with KB).  That is 8.87 GFLOP of
decode per image; at the measured 10,553 img/s with the encoder's 74 ms
subtracted, the decode phase sustains **125 TFLOP/s = 64% of the v5e's 197
TFLOP/s bf16 peak — 1.57x from the every-MAC-at-100%-MXU floor**.  The
remaining 1.57x is not free headroom: the per-step matmul chain is serially
dependent, interleaved with K VPU top-k passes and the roll-based beam
reductions, and M=KB=255 tiles the 128-row MXU imperfectly.  No HBM term:
weights/carries are VMEM-resident (one weight DMA per tile), which is the
entire design.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from img2latex_tpu.ops.pallas.decode_step import _round_up

NEG = -1e30


def _beam_kernel(
    num_layers: int,
    K: int,
    max_length: int,
    start_id: int,
    end_id: int,
    pad_id: int,
    early_exit: bool,
    *refs,
):
    """refs: [ctx (Bt,E)] [emb (Vp,E)] [w_ih_i w_hh_i b_i]*L [w_out] [b_out (1,Vp)]
    -> out [tok_seq (T, K*Bt) i32] [beam_seq (T, K*Bt) i32] [scores (K*Bt, 1) f32]
    scratch: h (L, K*Bt, H), c (L, K*Bt, H)

    Beam-major row layout throughout: row ``k*Bt + b`` is beam k of sample b
    (the wrapper reshapes scores via ``(nc, K, Bt)``).
    """
    ctx_ref = refs[0]
    emb_ref = refs[1]
    idx = 2
    layer_refs = []
    for _ in range(num_layers):
        layer_refs.append((refs[idx], refs[idx + 1], refs[idx + 2]))
        idx += 3
    w_out_ref, b_out_ref = refs[idx], refs[idx + 1]
    tok_ref, beam_ref, scores_ref = refs[idx + 2], refs[idx + 3], refs[idx + 4]
    h_ref, c_ref = refs[idx + 5], refs[idx + 6]

    Bt = ctx_ref.shape[0]
    KB = K * Bt
    # ctx per row (beam-major: each beam of a sample shares the context);
    # constant across steps — the closure keeps it hoisted out of the loop.
    ctx = jnp.broadcast_to(ctx_ref[:][None], (K, Bt, ctx_ref.shape[1])).reshape(
        KB, ctx_ref.shape[1]
    )
    _beam_loop(
        lambda h_top: ctx,
        emb_ref, layer_refs, w_out_ref, b_out_ref,
        tok_ref, beam_ref, scores_ref, h_ref, c_ref,
        num_layers, K, Bt, max_length, start_id, end_id, pad_id, early_exit,
    )


def _beam_loop(
    ctx_of,  # (h_top (K*Bt, H) dtype) -> context (K*Bt, E) dtype
    emb_ref,
    layer_refs,
    w_out_ref,
    b_out_ref,
    tok_ref,
    beam_ref,
    scores_ref,
    h_ref,
    c_ref,
    num_layers: int,
    K: int,
    Bt: int,
    max_length: int,
    start_id: int,
    end_id: int,
    pad_id: int,
    early_exit: bool,
):
    """The whole-beam-decode loop shared by the vector and grid beam kernels
    (module docstring for the layout/top-k/gather design).  ``ctx_of``
    supplies the per-step context: a constant closure for vector memory, or
    per-beam in-kernel additive attention over the VMEM-resident memory for
    grid memory (``grid_decode._grid_beam_kernel``)."""
    KB = K * Bt
    Vp = emb_ref.shape[0]
    dtype = emb_ref.dtype

    h_ref[...] = jnp.zeros_like(h_ref)
    c_ref[...] = jnp.zeros_like(c_ref)
    lane = jax.lax.broadcasted_iota(jnp.int32, (KB, Vp), 1)
    pad_row = jnp.where(lane == pad_id, jnp.float32(0.0), jnp.float32(NEG))  # (KB, Vp)
    # row r = k*Bt + s -> beam index k, in sublane form.
    row_beam = jax.lax.broadcasted_iota(jnp.int32, (KB, 1), 0) // Bt

    def group_reduce(x, op):
        """Per-sample reduction over the K beams, broadcast to every row:
        rolling by i*Bt maps row k*Bt+s -> ((k+i)%K)*Bt+s (same sample)."""
        acc = x
        for i in range(1, K):
            acc = op(acc, pltpu.roll(x, (KB - i * Bt) % KB, 0))
        return acc

    def body(t, state):
        tokens, scores, fin = state  # all (KB, 1): i32, f32, i32
        onehot = (lane == tokens).astype(dtype)
        emb = jnp.dot(onehot, emb_ref[:], preferred_element_type=jnp.float32)
        # Context from the PREVIOUS top-layer h (DecoderCell order: attend
        # first, then step the LSTM); constant closures ignore the argument.
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
        # log-softmax over lanes; padded lanes carry the -1e30 bias, so they
        # contribute 0 mass and stay unselectable — identical to softmaxing
        # over the true V columns.
        m = jnp.max(logits, axis=-1, keepdims=True)
        logp = logits - (jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True)) + m)
        # Finished beams: PAD continues at +0, everything else -1e30.
        logp = jnp.where(fin > 0, pad_row, logp)
        total = scores + logp  # (KB, Vp)

        # --- top-K over (K beams x Vp lanes) per sample -------------------
        # K iterative passes; every per-pass quantity is a (KB, 1) per-row
        # broadcast of its sample's value.
        cur = total
        parents: List[jnp.ndarray] = []
        toks: List[jnp.ndarray] = []
        scs: List[jnp.ndarray] = []
        for _n in range(K):
            row_max = jnp.max(cur, axis=-1, keepdims=True)  # (KB, 1)
            row_arg = jnp.argmax(cur, axis=-1, keepdims=True).astype(jnp.int32)
            m_all = group_reduce(row_max, jnp.maximum)  # group max, per row
            # winner beam: lowest beam index attaining the max (= lax.top_k's
            # lowest-flat-index tie rule)
            cand = jnp.where(row_max == m_all, row_beam, jnp.int32(K))
            win_beam = group_reduce(cand, jnp.minimum)
            # the winner's token: only the winner beam's row holds it
            tok_cand = jnp.where(row_beam == win_beam, row_arg, jnp.int32(0))
            win_tok = group_reduce(tok_cand, jnp.maximum)
            parents.append(win_beam)
            toks.append(win_tok)
            scs.append(m_all)
            # mask the winner element so the next pass picks the runner-up
            cur = jnp.where(
                jnp.logical_and(row_beam == win_beam, lane == win_tok),
                jnp.float32(NEG),
                cur,
            )

        # combine the K passes into per-row NEW beam values (row r belongs
        # to new beam row_beam[r])
        new_tok = jnp.zeros((KB, 1), jnp.int32)
        new_parent = jnp.zeros((KB, 1), jnp.int32)
        new_score = jnp.zeros((KB, 1), jnp.float32)
        for n in range(K):
            sel = row_beam == n
            new_tok = jnp.where(sel, toks[n], new_tok)
            new_parent = jnp.where(sel, parents[n], new_parent)
            new_score = jnp.where(sel, scs[n], new_score)

        # --- gather carries + finished by parent beam -------------------
        # finished: K rolls + masks on a 1-lane vector (trivial).
        delta = jnp.remainder(new_parent - row_beam, jnp.int32(K))  # (KB, 1)
        fin_gathered = jnp.zeros((KB, 1), jnp.int32)
        for i in range(K):
            rolled = fin if i == 0 else pltpu.roll(fin, (KB - i * Bt) % KB, 0)
            fin_gathered = jnp.where(delta == i, rolled, fin_gathered)
        fin_new = jnp.maximum(fin_gathered, (new_tok == end_id).astype(jnp.int32))

        # carries: one-hot MXU matmul gather — P[r, q] = (q == parent row of
        # r); P @ h selects exactly one row per output row (exact, and far
        # cheaper than K VPU rolls of the (KB, H) carries: (KB x KB x H)
        # MACs ride the MXU).
        row_pos = jax.lax.broadcasted_iota(jnp.int32, (KB, 1), 0) - row_beam * Bt
        parent_flat = new_parent * Bt + row_pos  # (KB, 1)
        colq = jax.lax.broadcasted_iota(jnp.int32, (KB, KB), 1)
        P = (colq == parent_flat).astype(dtype)  # (KB, KB)
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
    # Only beam 0 live at t=0 (rows 0..Bt) so the first expansion picks K
    # distinct tokens — matches beam_decode's scores0.
    scores0 = jnp.where(row_beam == 0, jnp.float32(0.0), jnp.float32(NEG))
    fin0 = jnp.zeros((KB, 1), jnp.int32)
    if early_exit:
        # Pre-fill the skipped tail: PAD tokens + identity parents (exactly
        # what the full-length loop emits once every beam is finished — the
        # frozen scores are already sorted, so top-k returns the identity).
        tok_ref[...] = jnp.full_like(tok_ref, pad_id)
        beam_ref[...] = jnp.broadcast_to(row_beam.reshape(1, KB), beam_ref.shape)

        def w_cond(state):
            t, st = state
            return jnp.logical_and(t < max_length, jnp.sum(st[2]) < K * Bt)

        def w_body(state):
            t, st = state
            return t + 1, body(t, st)

        _, (_, final_scores, _) = jax.lax.while_loop(
            w_cond, w_body, (jnp.int32(0), (tokens0, scores0, fin0))
        )
    else:
        _, final_scores, _ = jax.lax.fori_loop(
            0, max_length, body, (tokens0, scores0, fin0)
        )
    scores_ref[...] = final_scores


def _select_from_beam_tiles(tok_kb, beam_kb, scores_kb, nc, T, K, Bt, Bp, B, cfg):
    """Reassemble the per-tile beam-major outputs into (T, Bp, K) histories
    and (Bp, K) final scores, then backtrack + length-penalty-select the best
    beam (``decoding.decode.backtrack_and_select``, shared with the scan
    path).  Used by both the vector and grid beam wrappers."""
    from img2latex_tpu.decoding.decode import backtrack_and_select

    tok_seq = tok_kb.reshape(nc, T, K, Bt).transpose(1, 0, 3, 2).reshape(T, Bp, K)
    beam_seq = beam_kb.reshape(nc, T, K, Bt).transpose(1, 0, 3, 2).reshape(T, Bp, K)
    final_scores = scores_kb.reshape(nc, K, Bt).transpose(0, 2, 1).reshape(Bp, K)
    tokens, scores = backtrack_and_select(tok_seq, beam_seq, final_scores, Bp, K, cfg)
    return tokens[:B], scores[:B]


def pallas_full_beam_decode(
    packed: Dict[str, Any],
    context: jnp.ndarray,  # (B, E)
    beam_size: int,
    cfg,  # DecodeConfig
    interpret: bool = False,
    batch_tile: int = 0,
    early_exit: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused beam search: returns (best tokens (B, T), best scores (B,)).

    Tiling mirrors the greedy whole-decode kernel: tiles of ``batch_tile``
    samples (default sized so K*Bt ~ 256 rows) map at the XLA level; each
    tile pays one weight DMA and runs all steps from VMEM.
    """
    B, E = context.shape
    K = int(beam_size)
    L = int(packed["num_layers"])
    H = int(packed["hidden_dim"])
    T = int(cfg.max_length)
    dtype = packed["emb"].dtype
    if batch_tile <= 0:
        batch_tile = max(8, 256 // K)

    kernel = functools.partial(
        _beam_kernel, L, K, T, cfg.start_id, cfg.end_id, cfg.pad_id, early_exit
    )
    weight_args: List[jnp.ndarray] = [packed["emb"]]
    for i in range(L):
        weight_args += [
            packed[f"w_ih_{i}"],
            packed[f"w_hh_{i}"],
            packed[f"b_{i}"].reshape(1, -1),
        ]
    weight_args += [packed["w_out"], packed["b_out"].reshape(1, -1)]
    n_inputs = 1 + len(weight_args)

    def one_tile(ctx_tile: jnp.ndarray):
        Bt = ctx_tile.shape[0]
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
        )(ctx_tile, *weight_args)

    ctx = context.astype(dtype)
    Bp = _round_up(B, batch_tile)
    if Bp != B:
        ctx = jnp.pad(ctx, ((0, Bp - B), (0, 0)))
    nc = Bp // batch_tile
    if nc == 1:
        tok_kb, beam_kb, scores_kb = one_tile(ctx)
        tok_kb, beam_kb, scores_kb = tok_kb[None], beam_kb[None], scores_kb[None]
    else:
        tok_kb, beam_kb, scores_kb = jax.lax.map(
            one_tile, ctx.reshape(nc, batch_tile, E)
        )  # (nc, T, K*Bt), (nc, T, K*Bt), (nc, K*Bt, 1)

    return _select_from_beam_tiles(
        tok_kb, beam_kb, scores_kb, nc, T, K, batch_tile, Bp, B, cfg
    )
