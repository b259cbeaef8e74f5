"""Fully on-device autoregressive decoding: greedy, sampling, beam.

The reference decodes with host-side Python loops — a per-token
``decode_step`` round-trip for greedy/sampling (``training/predictor.py:251-361``,
``model/seq2seq.py:192-232``) and a B=1 dict-based beam search that the CLI
clamps off entirely (``predictor.py:163-167``).  Here every strategy is a
single ``lax.scan`` over ``max_length`` steps compiled into one XLA program:
no host round-trips, batched over B (and B*K beams), shardable with pjit.

Semantics parity (verified against numpy oracles in ``tests/test_decoding.py``):

* greedy == argmax of (logits / temperature); temperature alone never turns
  on sampling (reference gate ``predictor.py:330-335``);
* sampling activates when ``top_k > 0`` or ``top_p > 0``: probs are computed,
  top-k filtered (drop probs below the k-th largest), then nucleus-filtered
  (drop tokens beyond cumulative ``top_p``, always keeping the best), then
  renormalized and sampled (reference ``predictor.py:294-335``);
* finished sequences (emitted END) produce PAD forever after — equivalent to
  the reference's trim-at-first-END post-processing;
* beam search: fixed width K, log-prob accumulation, END-absorbing beams
  (their score frozen, they emit PAD), flat top-k over K*V, best-scoring beam
  returned (optional length normalization ``score / len^alpha``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# step_fn(tokens (N,), carry) -> (logits (N, V), new_carry)
StepFn = Callable[[jnp.ndarray, object], Tuple[jnp.ndarray, object]]


def signal_alpha(signal: str, default: float = 1.0) -> float:
    """Blend weight from a ``"margin_logp[:alpha]"`` selective-signal string.

    The alpha rides inside the (static, hashable) signal string so the
    composite needs no new DecodeConfig/kernel parameters; shared by the
    scan path here and ``ops/pallas/decode_step._decode_loop``.

    Strict: the head must be exactly ``margin_logp`` and the alpha finite,
    so a typo like ``"margin_logpx"`` (which would pass a bare
    ``startswith`` dispatch) or ``"margin_logp:nan"`` (which ``float()``
    happily parses but would poison every confidence score) raises here —
    at trace/validate time — instead of silently mis-gating rows."""
    head, _, tail = signal.partition(":")
    if head != "margin_logp":
        raise ValueError(
            f"malformed composite selective signal {signal!r} "
            "(expected 'margin_logp' or 'margin_logp:<alpha>')"
        )
    alpha = float(tail) if tail else default
    if not math.isfinite(alpha):
        raise ValueError(f"selective-signal alpha must be finite, got {alpha!r}")
    return alpha


@dataclass(frozen=True)
class DecodeConfig:
    """Static decode settings (hashable -> usable as a jit static arg)."""

    max_length: int = 141
    start_id: int = 1
    end_id: int = 2
    pad_id: int = 0
    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 0.0
    beam_size: int = 0
    length_penalty: float = 0.0
    # Selective beam: with beam_size > 0 and 0 < frac < 1, decode everything
    # greedily first (cheap — the whole-decode kernel), then re-decode only
    # the ``frac`` least-confident rows (lowest mean chosen-token log-prob)
    # with the full beam.  Beam reads most of its BLEU win from exactly the
    # rows greedy was unsure about, so this buys near-beam quality at
    # near-greedy throughput; frac>=1 (or 0) degenerates to plain beam.
    selective_beam_frac: float = 0.0
    # Which per-step confidence signal the selective gate ranks on (all are
    # accumulated over non-finished steps and length-normalized in
    # select_uncertain; for every signal SMALLER = LESS confident):
    #   "logp"    — chosen-token log-prob (the kernels emit this in-kernel)
    #   "margin"  — log-prob gap between the top-1 and top-2 tokens
    #   "entropy" — negative entropy of the step distribution
    #   "margin_logp[:alpha]" — margin + alpha*logp per step (alpha defaults
    #     to 1.0), the single-accumulator composite from the r4 offline
    #     search (scripts/selective_signal_ab.py "composites")
    # Measured across four checkpoints (scripts/selective_signal_ab.py;
    # artifacts/mathtext_hard_{grid_v2,cap512,cap640,resnet_v2}/
    # selective_signal_ab.json): margin beats logp and entropy at the
    # operating fracs on every CNN checkpoint (48/44/39% capture at frac
    # 0.2), and NO margin_logp alpha or rank-sum blend ever beats plain
    # margin — margin is the measured default; the composite stays
    # available for future checkpoints.  All signals run
    # in-kernel on the Pallas whole-decode paths (decode_step._decode_loop).
    selective_signal: str = "margin"
    # Stop the decode loop as soon as every sequence has emitted END — the
    # reference's all-finished early break (``seq2seq.py:219-221``,
    # ``predictor.py:337-347``), as a ``lax.while_loop`` instead of the fixed
    # ``lax.scan``.  Output-identical (the skipped steps would emit PAD); a
    # real-time win on trained models whose sequences end well before
    # max_length.  Off by default: benches keep the fixed-length scan so
    # throughput numbers don't depend on the weights.
    early_exit: bool = False

    @property
    def sampling(self) -> bool:
        # Reference gate: multinomial only when top-k or top-p filtering is on
        # (predictor.py:330-335); plain temperature still argmaxes.
        return self.temperature > 0 and (self.top_k > 0 or self.top_p > 0.0)


# ---------------------------------------------------------------------------
# Logit filtering (shared by sampling paths)
# ---------------------------------------------------------------------------


def filter_top_k(probs: jnp.ndarray, k: int) -> jnp.ndarray:
    """Zero out probs strictly below the k-th largest (reference
    ``predictor.py:299-309``); no renormalization here."""
    k = min(k, probs.shape[-1])
    kth = jax.lax.top_k(probs, k)[0][..., -1:]
    return jnp.where(probs < kth, 0.0, probs)


def filter_top_p(probs: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filter: keep the smallest prefix of descending-prob tokens with
    cumulative probability <= p, always keeping the most probable token
    (reference ``predictor.py:311-327``)."""
    sort_idx = jnp.argsort(-probs, axis=-1)
    sorted_probs = jnp.take_along_axis(probs, sort_idx, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    remove = cum > p
    remove = jnp.concatenate([jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1)
    inv = jnp.argsort(sort_idx, axis=-1)
    remove_orig = jnp.take_along_axis(remove, inv, axis=-1)
    return jnp.where(remove_orig, 0.0, probs)


def _next_token_probs(logits: jnp.ndarray, cfg: DecodeConfig) -> jnp.ndarray:
    """Temperature + top-k + top-p filtered, renormalized probabilities.

    The reference RENORMALIZES between the filters (``predictor.py:307-309``
    divides by the surviving mass right after the top-k zeroing), so with
    both filters active the nucleus mass is measured over the renormalized
    top-k survivors — top_p then always bites once the (renormalized)
    cumulative mass crosses p, regardless of how much raw mass top-k kept.
    """
    if cfg.temperature != 1.0 and cfg.temperature > 0:
        logits = logits / cfg.temperature
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if cfg.top_k > 0:
        probs = filter_top_k(probs, cfg.top_k)
        total = jnp.sum(probs, axis=-1, keepdims=True)
        probs = jnp.where(total > 0, probs / jnp.maximum(total, 1e-38), probs)
    if cfg.top_p > 0.0:
        probs = filter_top_p(probs, cfg.top_p)
    total = jnp.sum(probs, axis=-1, keepdims=True)
    return jnp.where(total > 0, probs / jnp.maximum(total, 1e-38), probs)


# ---------------------------------------------------------------------------
# Greedy / sampling
# ---------------------------------------------------------------------------


def greedy_sample_decode(
    step_fn: StepFn,
    carry0,
    batch_size: int,
    cfg: DecodeConfig,
    rng: Optional[jax.Array] = None,
    return_scores: bool = False,
) -> jnp.ndarray:
    """Batched greedy (or filtered-sampling) decode.

    Returns token ids ``(B, max_length)`` — generated tokens only (no START),
    with PAD at and after the first END position's successor (END itself is
    kept so hosts can locate it; use :func:`trim_host` to strip).

    ``rng`` seeds the sampling draws; omitting it defaults to PRNGKey(0),
    making repeated sampling calls bit-identical — pass a fresh key per call
    for varied draws (the Predictor does).

    ``return_scores=True`` additionally returns (B,) f32 per-sequence sums of
    the per-step confidence signal chosen by ``cfg.selective_signal`` (over
    the raw, unfiltered logits; END included, post-END PAD steps excluded) —
    the confidence the selective-beam path ranks on.  The default "logp"
    (chosen-token ``log_softmax``) is the oracle for the Pallas kernels'
    score output; "margin" and "entropy" are the alternative gates the
    round-2 review asked to measure.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def one_step(tokens, carry, finished, key, score):
        logits, carry = step_fn(tokens, carry)
        if cfg.sampling:
            key, sub = jax.random.split(key)
            probs = _next_token_probs(logits, cfg)
            nxt = jax.random.categorical(sub, jnp.log(jnp.maximum(probs, 1e-38)), axis=-1)
        else:
            # argmax is invariant under the (positive) temperature divide the
            # reference performs before it (predictor.py:330-335) — skip it.
            nxt = jnp.argmax(logits, axis=-1)
        nxt = nxt.astype(jnp.int32)
        if return_scores:
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            if cfg.selective_signal == "margin":
                top2, _ = jax.lax.top_k(logp, 2)
                step_score = top2[:, 0] - top2[:, 1]
            elif cfg.selective_signal == "entropy":
                # negative entropy: smaller (more entropic) = less confident,
                # keeping select_uncertain's bottom-k rule uniform.
                p = jnp.exp(logp)
                step_score = jnp.sum(p * logp, axis=-1)
            elif cfg.selective_signal.startswith("margin_logp"):
                # composite: margin + alpha*chosen-logp, one accumulator
                # (same blend the kernels run; alpha parsed from the static
                # signal string so no extra plumbing/jit-key fields).
                alpha = signal_alpha(cfg.selective_signal)
                top2, _ = jax.lax.top_k(logp, 2)
                chosen_lp = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]
                step_score = (top2[:, 0] - top2[:, 1]) + alpha * chosen_lp
            else:  # "logp"
                step_score = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]
            score = score + jnp.where(finished, 0.0, step_score)
        out = jnp.where(finished, jnp.int32(cfg.pad_id), nxt)
        finished = jnp.logical_or(finished, out == cfg.end_id)
        return out, carry, finished, key, score

    start = jnp.full((batch_size,), cfg.start_id, dtype=jnp.int32)
    finished0 = jnp.zeros((batch_size,), dtype=bool)
    score0 = jnp.zeros((batch_size,), jnp.float32)
    T = cfg.max_length

    if cfg.early_exit:
        # while_loop into a PAD-prefilled (T, B) buffer; the steps it skips
        # are exactly those where every row is finished and the scan below
        # would emit PAD.
        out0 = jnp.full((T, batch_size), cfg.pad_id, jnp.int32)

        def loop_cond(state):
            t, _, _, finished, _, _, _ = state
            return jnp.logical_and(t < T, jnp.logical_not(jnp.all(finished)))

        def loop_body(state):
            t, tokens, carry, finished, key, score, buf = state
            out, carry, finished, key, score = one_step(tokens, carry, finished, key, score)
            buf = jax.lax.dynamic_update_slice(buf, out[None, :], (t, 0))
            return t + 1, out, carry, finished, key, score, buf

        state = (jnp.int32(0), start, carry0, finished0, rng, score0, out0)
        *_, scores, tokens_t = jax.lax.while_loop(loop_cond, loop_body, state)
    else:

        def scan_step(state, _):
            tokens, carry, finished, key, score = state
            out, carry, finished, key, score = one_step(tokens, carry, finished, key, score)
            return (out, carry, finished, key, score), out

        (_, _, _, _, scores), tokens_t = jax.lax.scan(
            scan_step, (start, carry0, finished0, rng, score0), None, length=T
        )
    tokens = jnp.swapaxes(tokens_t, 0, 1)  # (B, T)
    if return_scores:
        return tokens, scores
    return tokens


def select_uncertain(
    tokens: jnp.ndarray, scores: jnp.ndarray, k: int, pad_id: int
) -> jnp.ndarray:
    """Indices ((k,) int32) of the k least-confident rows by mean
    chosen-token log-prob (sum score / generated length).  Mean, not sum:
    a sum ranks every long sequence as unconfident regardless of how sure
    each step was."""
    lengths = jnp.sum(tokens != pad_id, axis=-1).astype(jnp.float32)
    mean_lp = scores / jnp.maximum(lengths, 1.0)
    _, idx = jax.lax.top_k(-mean_lp, k)
    return idx.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Beam search
# ---------------------------------------------------------------------------


def topk_iterative(flat: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k iterative (argmax, mask) passes — output-identical to
    ``jax.lax.top_k`` (argmax and top_k both prefer the lower index on ties)
    but avoids its sort lowering, which dominates beam-step time on TPU for
    small k over a K*V axis.

    Precondition: ``flat`` must contain no ``-inf`` in its top-k window —
    selected entries are masked with ``-inf``, so a genuine ``-inf`` input
    inside the window ties with masked entries and a later pass can return a
    duplicate index (``lax.top_k`` always returns distinct indices).  The
    beam path satisfies this by construction: its inputs are
    ``log_softmax`` of finite logits, and dead beams are padded with the
    finite sentinel ``-1e30`` (``beam_decode``'s NEG)."""
    NEG = jnp.asarray(-jnp.inf, flat.dtype)
    iota = jax.lax.broadcasted_iota(jnp.int32, flat.shape, flat.ndim - 1)
    vals, idxs = [], []
    cur = flat
    for _ in range(k):
        i = jnp.argmax(cur, axis=-1).astype(jnp.int32)
        vals.append(jnp.max(cur, axis=-1))
        idxs.append(i)
        cur = jnp.where(iota == i[..., None], NEG, cur)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def beam_decode(
    step_fn: StepFn,
    carry0,
    batch_size: int,
    beam_size: int,
    cfg: DecodeConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched fixed-width beam search, fully on device.

    ``step_fn`` must operate on a flattened ``B*K`` batch (the caller expands
    the encoder memory; ``carry0`` is the B*K carry).  Returns
    ``(tokens (B, max_length), scores (B,))`` for the best beam per sample.
    """
    K = beam_size
    NEG = jnp.float32(-1e30)

    def gather_beams(tree, beam_idx):
        """Reindex the B*K axis of every leaf by beam_idx (B, K) via a
        one-hot batched matmul — exact (each row is selected once, scaled by
        1.0) and MXU/VPU-friendly, unlike a flat ``jnp.take`` whose gather
        lowering is scatter-heavy on TPU."""
        onehot = (
            beam_idx[..., None] == jnp.arange(K, dtype=beam_idx.dtype)
        )  # (B, K_new, K_old) bool
        flat_idx = (
            beam_idx + (jnp.arange(batch_size, dtype=beam_idx.dtype) * K)[:, None]
        ).reshape(-1)

        def gather_leaf(leaf):
            fp = jnp.issubdtype(leaf.dtype, jnp.floating)
            if leaf.ndim >= 2 and leaf.shape[-2] == batch_size * K:
                # e.g. LSTM carry (L, B*K, H)
                if not fp:  # preserve bool/int carry leaves exactly
                    return jnp.take(leaf, flat_idx, axis=-2)
                lead = leaf.shape[:-2]
                x = leaf.reshape(lead + (batch_size, K, leaf.shape[-1]))
                sel = jnp.einsum(
                    "bnk,...bkh->...bnh", onehot.astype(leaf.dtype), x
                )
                return sel.reshape(leaf.shape)
            if leaf.shape[0] == batch_size * K:
                if not fp:
                    return jnp.take(leaf, flat_idx, axis=0)
                x = leaf.reshape((batch_size, K) + leaf.shape[1:])
                oh = onehot.astype(leaf.dtype)
                oh = oh.reshape(oh.shape + (1,) * (x.ndim - 2))
                return jnp.sum(oh * x[:, None], axis=2).reshape(leaf.shape)
            return leaf

        return jax.tree_util.tree_map(gather_leaf, tree)

    def scan_step(state, _):
        tokens, carry, scores, finished = state  # tokens (B*K,), scores (B,K)
        logits, carry = step_fn(tokens, carry)  # (B*K, V)
        V = logits.shape[-1]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1).reshape(batch_size, K, V)
        fin = finished.reshape(batch_size, K)
        # END-absorbing: finished beams emit PAD with additive score 0 and
        # everything else -inf, freezing their cumulative score.
        pad_onehot = jnp.where(
            jnp.arange(V) == cfg.pad_id, jnp.float32(0.0), NEG
        )  # (V,)
        logp = jnp.where(fin[..., None], pad_onehot[None, None, :], logp)
        total = scores[..., None] + logp  # (B, K, V)
        flat = total.reshape(batch_size, K * V)
        new_scores, flat_idx = topk_iterative(flat, K)  # (B, K)
        beam_idx = flat_idx // V
        token_idx = (flat_idx % V).astype(jnp.int32)

        carry = gather_beams(carry, beam_idx)
        fin = jnp.take_along_axis(fin, beam_idx, axis=1)
        fin_new = jnp.logical_or(fin, token_idx == cfg.end_id)
        # Finished-before beams emit PAD (token_idx already == pad for them).
        out_tokens = token_idx.reshape(-1)
        return (out_tokens, carry, new_scores, fin_new.reshape(-1)), (token_idx, beam_idx)

    start = jnp.full((batch_size * K,), cfg.start_id, dtype=jnp.int32)
    # Only beam 0 is live at t=0 so the first expansion picks K distinct tokens.
    scores0 = jnp.tile(
        jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.full((K - 1,), NEG)])[None, :],
        (batch_size, 1),
    )
    finished0 = jnp.zeros((batch_size * K,), dtype=bool)
    T = cfg.max_length
    if cfg.early_exit:
        # All-finished bailout, mirroring the greedy while_loop (and the
        # Pallas beam kernels): pre-fill the skipped tail with PAD tokens +
        # identity parents — exactly what the full-length scan emits once
        # every beam is finished (frozen scores stay sorted, so the top-k
        # returns the identity; ties also resolve to identity because the
        # flat index beam*V + pad ascends with the beam index).
        tok0 = jnp.full((T, batch_size, K), cfg.pad_id, jnp.int32)
        beam0 = jnp.broadcast_to(
            jnp.arange(K, dtype=jnp.int32)[None, None, :], (T, batch_size, K)
        )

        def loop_cond(s):
            t, state, _, _ = s
            return jnp.logical_and(t < T, jnp.logical_not(jnp.all(state[3])))

        def loop_body(s):
            t, state, tok_buf, beam_buf = s
            state, (token_idx, beam_idx) = scan_step(state, None)
            tok_buf = jax.lax.dynamic_update_slice(tok_buf, token_idx[None], (t, 0, 0))
            beam_buf = jax.lax.dynamic_update_slice(
                beam_buf, beam_idx.astype(jnp.int32)[None], (t, 0, 0)
            )
            return t + 1, state, tok_buf, beam_buf

        _, (_, _, final_scores, _), tok_seq, beam_seq = jax.lax.while_loop(
            loop_cond, loop_body, (jnp.int32(0), (start, carry0, scores0, finished0), tok0, beam0)
        )
    else:
        (_, _, final_scores, _), (tok_seq, beam_seq) = jax.lax.scan(
            scan_step, (start, carry0, scores0, finished0), None, length=T
        )
    return backtrack_and_select(tok_seq, beam_seq, final_scores, batch_size, K, cfg)


def backtrack_and_select(
    tok_seq: jnp.ndarray,  # (T, B, K)
    beam_seq: jnp.ndarray,  # (T, B, K)
    final_scores: jnp.ndarray,  # (B, K)
    batch_size: int,
    K: int,
    cfg: DecodeConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backtrack the beam ancestry to the per-beam token sequences, apply the
    length penalty, and return the best beam per sample ((B, T), (B,)).
    Shared by the lax.scan beam and the fused Pallas beam kernel.

    The returned score is the SELECTION score — length-normalized when
    ``cfg.length_penalty > 0`` — so (tokens, scores) are always consistent
    with the ranking that picked them."""
    T = tok_seq.shape[0]

    def backtrack(carry_beam, t):
        # carry_beam: (B, K) current beam index at step t+1's perspective
        tok = tok_seq[t]  # (B, K)
        toks = jnp.take_along_axis(tok, carry_beam, axis=1)
        prev_beam = jnp.take_along_axis(beam_seq[t], carry_beam, axis=1)
        return prev_beam, toks

    last_beams = jnp.tile(jnp.arange(K)[None, :], (batch_size, 1))
    _, rev_tokens = jax.lax.scan(backtrack, last_beams, jnp.arange(T - 1, -1, -1))
    sequences = jnp.flip(rev_tokens, axis=0)  # (T, B, K)
    sequences = jnp.transpose(sequences, (1, 2, 0))  # (B, K, T)

    # Length normalization: score / length^alpha over generated length
    # (END included), reference has alpha=0 (pure sum).
    if cfg.length_penalty > 0:
        lengths = jnp.sum(sequences != cfg.pad_id, axis=-1).astype(jnp.float32)
        norm_scores = final_scores / jnp.maximum(lengths, 1.0) ** cfg.length_penalty
    else:
        norm_scores = final_scores
    best = jnp.argmax(norm_scores, axis=-1)  # (B,)
    best_tokens = jnp.take_along_axis(sequences, best[:, None, None], axis=1)[:, 0, :]
    best_scores = jnp.take_along_axis(norm_scores, best[:, None], axis=1)[:, 0]
    return best_tokens, best_scores


# ---------------------------------------------------------------------------
# Host-side post-processing
# ---------------------------------------------------------------------------


def trim_host(tokens: np.ndarray, end_id: int, pad_id: int, start_id: Optional[int] = None) -> List[List[int]]:
    """Device (B, T) -> list of python id lists, cut at the first END
    (exclusive), PAD and leading START stripped (reference
    ``predictor.py:349-360,382-391``).

    Vectorized: the cut/strip masks compute once over the whole (B, T)
    array — per-row Python here was the largest single term of the
    whole-split eval's resident window (0.71 s host post for 8k rows
    against 0.52 s of device decode, ``predictions_wholesplit_b1024``)."""
    arr = np.asarray(tokens)
    if arr.size == 0:
        return [[] for _ in range(arr.shape[0])] if arr.ndim == 2 else []
    B, T = arr.shape
    is_end = arr == end_id
    has_end = is_end.any(axis=1)
    end_pos = np.where(has_end, is_end.argmax(axis=1), T)
    col = np.arange(T)[None, :]
    valid = (col < end_pos[:, None]) & (arr != pad_id)
    if start_id is not None:
        # START stripped only at position 0 (END search is unaffected:
        # START and END are distinct ids, so a START at 0 is never the cut)
        valid[:, 0] &= arr[:, 0] != start_id
    return [arr[i, valid[i]].tolist() for i in range(B)]


def decode_chunks(plan, rng: jax.Array, stats: Optional[dict] = None):
    """Pipelined host-prep/device-decode chunk runner (host-side utility).

    ``plan``: sequence of ``(exec_key, run, prep_fn, idxs)`` — ``prep_fn()``
    returns the chunk's uint8 buffer, ``run(buf, rng)`` is a compiled decode,
    ``idxs`` the input positions covered.  JAX dispatch is asynchronous, so
    the loop dispatches chunk *i*, preps chunk *i+1* on the host while the
    device decodes, and only then fetches chunk *i* (``np.asarray`` blocks) —
    host PIL prep + upload ride under the device decode.  Shared by the live
    ``Predictor`` and the serialized-artifact ``ExportedPredictor`` so both
    serving paths overlap identically.

    ``stats`` (optional, mutated) accumulates the evaluator's throughput
    accounting: ``prep_s``/``dispatch_s``/``fetch_s`` plus ``first_calls``
    (one entry per executable; its dispatch wall carries the blocking
    ``jax.jit`` trace+compile, its images are excluded from
    ``steady_images``).

    Yields ``(idxs, np.ndarray tokens)`` in plan order.
    """
    import time

    seen: set = set()
    out = []
    pending = None  # (tokens_dev, idxs, key, first_dispatch_wall | None)

    def _fetch(p) -> None:
        tokens_dev, idxs, key, dispatch_wall = p
        t0 = time.perf_counter()
        arr = np.asarray(tokens_dev)
        dt = time.perf_counter() - t0
        if stats is not None:
            if dispatch_wall is not None:
                stats.setdefault("first_calls", []).append(
                    {"exec": str(key), "seconds": dt + dispatch_wall,
                     "images": len(idxs)}
                )
            else:
                stats["fetch_s"] = stats.get("fetch_s", 0.0) + dt
                stats["steady_images"] = stats.get("steady_images", 0) + len(idxs)
        out.append((idxs, arr))

    for key, run, prep_fn, idxs in plan:
        t0 = time.perf_counter()
        buf = prep_fn()
        t1 = time.perf_counter()
        rng, sub = jax.random.split(rng)
        tokens = run(jnp.asarray(buf), sub)
        t2 = time.perf_counter()
        first = key not in seen
        seen.add(key)
        if stats is not None:
            stats["prep_s"] = stats.get("prep_s", 0.0) + (t1 - t0)
            if not first:
                stats["dispatch_s"] = stats.get("dispatch_s", 0.0) + (t2 - t1)
        if pending is not None:
            _fetch(pending)
        pending = (tokens, idxs, key, (t2 - t1) if first else None)
    if pending is not None:
        _fetch(pending)
    return out
