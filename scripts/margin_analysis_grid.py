"""Margin triage for Mosaic-vs-interpret greedy disagreements.

The on-chip check (scripts/check_topp_onchip.py) measures token agreement
between the compiled grid-greedy kernel and the same kernel in interpret
mode.  With RANDOM weights the logit distribution over the 503-vocab is
near-uniform, so the top-1/top-2 margin at many steps is within matmul
numerics (TPU MXU runs reduced-precision accumulation even for f32 inputs)
and a flipped argmax cascades for the rest of the row.  That is numerics,
not a loop bug — but 'agreement 0.95' alone can't tell the two apart.

This script tells them apart: for every row where the two paths first
diverge at step t, it teacher-forces the *scan* oracle (XLA, float32
params, highest matmul precision) over the common prefix and reports the
f32 logit margin |logit[tok_interp] - logit[tok_mosaic]| at step t.  A
near-tie margin (~1e-2 at logit scale; bf16 eps is 0.0078) per divergence
=> every flip happened on a tie => the compiled kernel is argmax-equivalent
up to documented bf16 tie semantics.  Any divergence with a LARGE margin
would be a real kernel bug.

Usage: python scripts/margin_analysis_grid.py [batch] [max_len]
Writes artifacts/grid_kernel_margin_triage.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

VOCAB = 503
EMBED, HIDDEN, LAYERS = 256, 384, 2
SLOTS = 100


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import jax

    cache_dir = os.path.join(repo, ".cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from img2latex_tpu.config import Config
    from img2latex_tpu.models.seq2seq import Seq2SeqModel, build_model
    from img2latex_tpu.ops.pallas.decode_step import pack_decoder_weights
    from img2latex_tpu.ops.pallas.grid_decode import (
        pack_attention_weights,
        pallas_full_grid_greedy_decode,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    dtype = jnp.bfloat16

    cfg = Config()
    cfg.model.name = "cnn_lstm"
    cfg.model.memory = "grid"
    cfg.model.embedding_dim = EMBED
    cfg.model.decoder.hidden_dim = HIDDEN
    cfg.model.decoder.lstm_layers = LAYERS
    cfg.model.decoder.dropout = 0.0
    cfg.data.max_seq_length = T
    cfg.hardware.compute_dtype = "bfloat16"
    model = build_model(cfg, VOCAB)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, 64, 800, 1), jnp.float32),
        jnp.zeros((2, 8), jnp.int32),
    )
    packed = pack_decoder_weights(params, VOCAB, dtype)
    att = pack_attention_weights(params, dtype)

    rng = np.random.default_rng(0)
    memory = jnp.asarray(rng.normal(size=(B, SLOTS, EMBED)).astype(np.float32), dtype)

    got = np.asarray(
        jax.jit(lambda: pallas_full_grid_greedy_decode(packed, att, memory, T, 1, 2, 0))()
    )
    ref = np.asarray(
        jax.jit(
            lambda: pallas_full_grid_greedy_decode(
                packed, att, memory, T, 1, 2, 0, interpret=True
            )
        )()
    )
    agr = float((got == ref).mean())
    div_rows = np.where((got != ref).any(axis=1))[0]
    print(f"agreement={agr:.4f} divergent_rows={len(div_rows)}/{B}", flush=True)

    # f32 oracle: same params, float32 compute, HIGHEST matmul precision.
    cfg32 = Config()
    cfg32.model.name = "cnn_lstm"
    cfg32.model.memory = "grid"
    cfg32.model.embedding_dim = EMBED
    cfg32.model.decoder.hidden_dim = HIDDEN
    cfg32.model.decoder.lstm_layers = LAYERS
    cfg32.model.decoder.dropout = 0.0
    cfg32.data.max_seq_length = T
    cfg32.hardware.compute_dtype = "float32"
    model32 = build_model(cfg32, VOCAB)
    mem32 = memory.astype(jnp.float32)

    def oracle_logits(row: int, prefix: np.ndarray):
        """Teacher-force the scan oracle over ``prefix`` (starting from
        START) and return the logits for the step after the prefix."""
        m = mem32[row : row + 1]
        carry = (
            jnp.zeros((LAYERS, 1, HIDDEN), jnp.float32),
            jnp.zeros((LAYERS, 1, HIDDEN), jnp.float32),
        )
        with jax.default_matmul_precision("highest"):
            tok = jnp.full((1,), 1, jnp.int32)  # START
            logits = None
            for t in range(len(prefix) + 1):
                logits, carry = model32.apply(
                    params, m, tok, carry, method=Seq2SeqModel.decode_step
                )
                if t < len(prefix):
                    tok = jnp.asarray(prefix[t : t + 1], jnp.int32)
        return np.asarray(logits[0], np.float32)

    records = []
    for row in div_rows.tolist():
        t = int(np.argmax(got[row] != ref[row]))
        prefix = ref[row, :t]  # common prefix (identical in both paths)
        logits = oracle_logits(row, prefix)
        a, b = int(ref[row, t]), int(got[row, t])
        margin = float(abs(logits[a] - logits[b]))
        scale = float(logits.max() - logits.min())
        top2 = np.sort(logits)[-2:]
        records.append(
            {
                "row": row,
                "first_divergent_step": t,
                "interp_token": a,
                "mosaic_token": b,
                "oracle_margin": margin,
                "oracle_top1_top2_gap": float(top2[1] - top2[0]),
                "logit_range": scale,
            }
        )
        print(
            f"row {row}: step {t} interp={a} mosaic={b} "
            f"margin={margin:.5f} (logit range {scale:.2f})",
            flush=True,
        )

    margins = [r["oracle_margin"] for r in records]
    out = {
        "batch": B,
        "max_len": T,
        "agreement": agr,
        "divergent_rows": len(div_rows),
        "max_margin": max(margins) if margins else 0.0,
        "mean_margin": float(np.mean(margins)) if margins else 0.0,
        "records": records,
    }
    path = os.path.join(repo, "artifacts", "grid_kernel_margin_triage.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(
        f"max first-divergence oracle margin: {out['max_margin']:.5f} "
        f"(bf16 eps at this logit scale ~"
        f"{0.0078 * np.mean([r['logit_range'] for r in records]) if records else 0:.3f}) "
        f"-> {path}",
        flush=True,
    )


if __name__ == "__main__":
    main()
