"""Selective-beam gating signals A/B (VERDICT r2 #4a): which per-row
confidence — mean chosen-token log-prob ("logp"), mean top1-top2 log-prob
margin ("margin"), or mean negative step entropy ("entropy") — captures the
most of beam's BLEU gain at a given re-decode fraction?

Method: ONE greedy pass per signal (tokens identical; only the confidence
differs), ONE full-beam pass.  Batched beam decode is row-independent, so the
selective output for (signal, frac) is assembled on host: replace the frac
least-confident rows' greedy decode with their full-beam decode — exactly the
live selective path's result, without re-decoding per configuration.

Round-4 additions (VERDICT r3 weak #5: margin captures 48% at frac 0.2 vs
the 50% target — ceiling or signal?):
  * ``oracle`` row — rank rows by the beam's ACTUAL per-row sentence-BLEU
    improvement (unobservable live; computed only where beam != greedy).
    Its capture curve is the upper bound ANY gating signal can reach, and
    ``beam_changed_frac`` says how many rows beam touches at all.
  * ``composites`` — host-side search over one-accumulator combinations
    (margin + alpha*logp per step: implementable as a single in-kernel f32
    accumulator) and a rank-sum blend, reported at every frac.
  * ``--save-rows FILE.npz`` — per-row tokens/targets/raw signals for any
    further offline search without another chip run.

Usage:
  python scripts/selective_signal_ab.py CKPT --data-dir DIR [--split test]
      [--beam-size 5] [--length-penalty 1.5] [--fracs 0.1,0.2,0.3,0.5]
      [--batch-size 256] [--max-batches N] [--out artifacts/...json]
      [--save-rows artifacts/...npz]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--split", default="test")
    ap.add_argument("--beam-size", type=int, default=5)
    ap.add_argument("--length-penalty", type=float, default=1.5)
    ap.add_argument("--fracs", default="0.1,0.2,0.3,0.5")
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--max-batches", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--use-mesh", action="store_true",
                    help="keep the predictor's default product-mesh wrapping "
                         "(the r5 cap640 run showed the no-mesh jit can "
                         "scoped-VMEM-OOM kernels that compile under the "
                         "mesh path the battery uses)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--save-rows", default=None,
                    help="npz dump of per-row tokens/targets/signals")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from img2latex_tpu.data.pipeline import create_data_loaders
    from img2latex_tpu.decoding.decode import DecodeConfig, trim_host
    from img2latex_tpu.models.seq2seq import Seq2SeqModel
    from img2latex_tpu.ops.metrics import calculate_metrics
    from img2latex_tpu.ops.preprocess import normalize_images
    from img2latex_tpu.training.predictor import Predictor

    pred = Predictor.from_checkpoint(
        args.checkpoint,
        config_overrides=(
            None if args.use_mesh else {"hardware.use_mesh": False}
        ),
    )
    import copy

    cfg = copy.deepcopy(pred.cfg)
    cfg.data.data_dir = args.data_dir
    cfg.data.batch_size = args.batch_size
    cfg.data.eval_batch_size_multiplier = 1
    cfg.data.max_eval_batch_size = args.batch_size
    tok = pred.tokenizer
    loader = create_data_loaders(cfg, tok, splits=(args.split,))[args.split]

    model, variables = pred.model, pred._variables()
    mean = tuple(cfg.preprocessing.normalization_mean)
    std = tuple(cfg.preprocessing.normalization_std)
    layers = cfg.model.decoder.lstm_layers
    hidden = cfg.model.decoder.hidden_dim
    dtype = jnp.dtype(cfg.hardware.compute_dtype)
    signals = ("logp", "margin", "entropy")

    def dcfg_for(signal, beam=0):
        return DecodeConfig(
            max_length=cfg.inference.max_length,
            start_id=tok.start_token_id, end_id=tok.end_token_id,
            pad_id=tok.pad_token_id, beam_size=beam,
            length_penalty=args.length_penalty if beam else 0.0,
            selective_signal=signal,
        )

    def build_greedy(B, signal):
        dcfg = dcfg_for(signal)

        @jax.jit
        def run(images_u8, rng):
            from img2latex_tpu.decoding.decode import greedy_sample_decode

            x = normalize_images(images_u8, mean, std)
            memory = model.apply(variables, x, method=Seq2SeqModel.encode)
            mem_proj = model.apply(variables, memory, method=Seq2SeqModel.memory_proj)

            def step(tokens, carry):
                return model.apply(
                    variables, memory, tokens, carry, mem_proj,
                    method=Seq2SeqModel.decode_step,
                )

            carry0 = (
                jnp.zeros((layers, B, hidden), dtype),
                jnp.zeros((layers, B, hidden), dtype),
            )
            return greedy_sample_decode(step, carry0, B, dcfg, rng=rng,
                                        return_scores=True)

        return run

    greedy_tokens, scores = [], {s: [] for s in signals}
    beam_tokens, tgt_rows = [], []
    beam_run = None
    greedy_runs = {}
    rng = jax.random.PRNGKey(0)
    for bi, batch in enumerate(loader):
        if args.max_batches is not None and bi >= args.max_batches:
            break
        B = batch["images"].shape[0]
        n = int(batch.get("n_valid_local", batch.get("n_valid", B)))
        imgs = jnp.asarray(batch["images"])
        if beam_run is None:
            beam_run = pred._decode_fn(B, dcfg_for("logp", beam=args.beam_size))
            for s in signals:
                greedy_runs[s] = build_greedy(B, s)
        rng, sub = jax.random.split(rng)
        for s in signals:
            t, sc = greedy_runs[s](imgs, sub)
            if s == signals[0]:
                greedy_tokens.append(np.asarray(t)[:n])
            scores[s].append(np.asarray(sc)[:n])
        beam_tokens.append(np.asarray(beam_run(imgs, sub))[:n])
        tgt_rows.append(np.asarray(batch["formulas"])[:n, 1:])
        print(f"batch {bi}: {n} rows", flush=True)

    g_tok = np.concatenate(greedy_tokens)
    b_tok_raw = np.concatenate(beam_tokens)
    N = len(g_tok)
    g_ids = trim_host(g_tok, tok.end_token_id, tok.pad_token_id,
                      start_id=tok.start_token_id)
    # beam output may be one column wider (START kept) — trim handles it
    b_ids = trim_host(b_tok_raw, tok.end_token_id, tok.pad_token_id,
                      start_id=tok.start_token_id)
    t_ids = trim_host(np.concatenate(tgt_rows), tok.end_token_id, tok.pad_token_id)

    bleu_g = calculate_metrics(g_ids, t_ids, cfg.evaluation.bleu_n)
    bleu_b = calculate_metrics(b_ids, t_ids, cfg.evaluation.bleu_n)
    gain = bleu_b["bleu"] - bleu_g["bleu"]
    lengths = np.maximum((g_tok != tok.pad_token_id).sum(-1), 1).astype(np.float64)

    out = {
        "checkpoint": args.checkpoint,
        "split": args.split,
        "num_images": N,
        "beam_size": args.beam_size,
        "length_penalty": args.length_penalty,
        "greedy_bleu": bleu_g["bleu"],
        "beam_bleu": bleu_b["bleu"],
        "beam_gain": gain,
        "signals": {},
    }
    fracs = [float(f) for f in args.fracs.split(",")]

    def capture_curve(order, label):
        """Mix beam into the `frac` first rows of `order`; corpus BLEU + capture."""
        rows = {}
        for frac in fracs:
            k = max(1, math.ceil(frac * N))
            pick = set(order[:k].tolist())
            mixed = [b_ids[i] if i in pick else g_ids[i] for i in range(N)]
            bleu_m = calculate_metrics(mixed, t_ids, cfg.evaluation.bleu_n)["bleu"]
            rows[str(frac)] = {
                "bleu": bleu_m,
                "capture": (bleu_m - bleu_g["bleu"]) / gain if gain > 0 else None,
            }
            print(f"{label} frac {frac}: bleu {bleu_m:.4f} "
                  f"capture {rows[str(frac)]['capture']}", flush=True)
        return rows

    raw = {s: np.concatenate(scores[s]) for s in signals}
    for s in signals:
        out["signals"][s] = capture_curve(np.argsort(raw[s] / lengths), s)

    # ---- oracle upper bound (r4): rank by beam's ACTUAL per-row gain ------
    # Unobservable live (needs the target), but it bounds what any signal
    # can capture at a frac, and beam_changed_frac bounds the useful frac:
    # rows where beam == greedy contribute exactly nothing.
    changed = [i for i in range(N) if not np.array_equal(g_ids[i], b_ids[i])]
    out["beam_changed_frac"] = len(changed) / N
    delta = np.zeros(N)
    bleu_n = cfg.evaluation.bleu_n
    for i in changed:
        delta[i] = (
            calculate_metrics([b_ids[i]], [t_ids[i]], bleu_n)["bleu"]
            - calculate_metrics([g_ids[i]], [t_ids[i]], bleu_n)["bleu"]
        )
    out["signals"]["oracle"] = capture_curve(np.argsort(-delta), "oracle")

    # ---- composite search (r4): single-accumulator blends -----------------
    # (margin + alpha*logp) summed per step is ONE extra f32 accumulator in
    # the whole-decode kernels -> directly implementable if it wins.
    out["composites"] = {}
    for alpha in (0.25, 0.5, 1.0, 2.0, 4.0):
        m = (raw["margin"] + alpha * raw["logp"]) / lengths
        out["composites"][f"margin+{alpha}*logp"] = capture_curve(
            np.argsort(m), f"margin+{alpha}*logp")
    rank_sum = (np.argsort(np.argsort(raw["margin"] / lengths))
                + np.argsort(np.argsort(raw["logp"] / lengths)))
    out["composites"]["rank_sum(margin,logp)"] = capture_curve(
        np.argsort(rank_sum, kind="stable"), "rank_sum")

    if args.save_rows:
        os.makedirs(os.path.dirname(args.save_rows) or ".", exist_ok=True)
        T = max(max(map(len, g_ids)), max(map(len, b_ids)), max(map(len, t_ids)))

        def pad(rows_):
            a = np.full((N, T), tok.pad_token_id, dtype=np.int32)
            for i, r in enumerate(rows_):
                a[i, : len(r)] = r
            return a

        np.savez_compressed(
            args.save_rows, greedy=pad(g_ids), beam=pad(b_ids),
            targets=pad(t_ids), lengths=lengths, delta=delta,
            **{f"raw_{s}": raw[s] for s in signals},
        )
        print("wrote", args.save_rows)

    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
        print("wrote", args.out)
    print(json.dumps({k: v for k, v in out.items() if k != "signals"}))


if __name__ == "__main__":
    main()
