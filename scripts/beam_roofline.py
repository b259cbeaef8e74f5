"""Beam whole-decode kernel roofline arithmetic (VERDICT r2 #4b).

Turns the round-2 claim "the beam kernel is within ~1.5x of its matmul
floor" into checkable arithmetic: count the MACs every beam step provably
executes (the kernel's matmuls are enumerable — embedding one-hot, LSTM
ih/hh per layer, vocab projection, and the one-hot carry-gather P@h/P@c),
multiply out to FLOPs/image, and divide the measured throughput into the
chip's bf16 peak.

No HBM term: the whole point of the kernel is that weights + carries stay
VMEM-resident across all 141 steps (one weight DMA per batch tile), so the
steady state is compute-bound; the scan baseline it replaced re-read the
weights from HBM every step.

Usage:
  python scripts/beam_roofline.py [--img-per-s 10553] [--batch 3072]
      [--encoder-ms 74] [--peak-tflops 197] [--out artifacts/beam_roofline.json]

Defaults = the round-2 headline bench (bench_beam.py 3072 5 on one v5e
chip; encoder share measured in the r2 autopsy, STATUS.md ledger #4).
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab-padded", type=int, default=512)  # 503 -> lane pad
    ap.add_argument("--embed", type=int, default=512)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--steps", type=int, default=141)
    ap.add_argument("--batch", type=int, default=3072)
    ap.add_argument("--batch-tile", type=int, default=0,
                    help="0 = kernel default max(8, 256//K)")
    ap.add_argument("--img-per-s", type=float, default=10553.0,
                    help="measured end-to-end beam img/s (BENCH r2)")
    ap.add_argument("--encoder-ms", type=float, default=74.0,
                    help="measured encoder share of one iteration")
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="bf16 MXU peak of the chip (v5e: 197)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    Vp, E, H, L, K, T = (args.vocab_padded, args.embed, args.hidden,
                         args.layers, args.beam, args.steps)
    Bt = args.batch_tile or max(8, 256 // K)
    KB = K * Bt

    # ---- MACs per beam-row per decode step (x2 = FLOPs) -------------------
    flops = {
        # one-hot (KB,Vp) @ emb (Vp,E): the gather-free embedding read
        "embedding_onehot": 2 * Vp * E,
        # LSTM layer 0: x = concat(emb, ctx) (2E) @ W_ih (2E,4H) + h @ W_hh
        "lstm_layer0": 2 * (2 * E) * (4 * H) + 2 * H * (4 * H),
        # layers 1..L-1: x = h (H)
        "lstm_upper": (L - 1) * (2 * H * (4 * H) + 2 * H * (4 * H)),
        # vocab projection (KB,H) @ (H,Vp)
        "vocab_proj": 2 * H * Vp,
        # carry ancestry gather: P (KB,KB) @ {h,c} (KB,H) per layer —
        # per-row cost scales with the tile's beam-rows KB
        "carry_gather": 2 * L * (2 * KB * H),
    }
    per_row_step = sum(flops.values())
    per_image = per_row_step * K * T  # K beam-rows per image, T steps

    # ---- measured ----------------------------------------------------------
    iter_s = args.batch / args.img_per_s
    decode_s = iter_s - args.encoder_ms / 1e3
    achieved_tflops = per_image * args.batch / decode_s / 1e12
    mxu_frac = achieved_tflops / args.peak_tflops

    out = {
        "shapes": {"Vp": Vp, "E": E, "H": H, "L": L, "K": K, "T": T,
                   "batch": args.batch, "batch_tile": Bt, "KB_rows": KB},
        "flops_per_beamrow_step": flops,
        "flops_per_beamrow_step_total": per_row_step,
        "decode_gflops_per_image": per_image / 1e9,
        "measured": {
            "img_per_s": args.img_per_s,
            "iteration_s": iter_s,
            "encoder_s": args.encoder_ms / 1e3,
            "decode_s": decode_s,
            "decode_ms_per_step": decode_s / T * 1e3,
        },
        "achieved_decode_tflops": achieved_tflops,
        "bf16_peak_tflops": args.peak_tflops,
        "mxu_utilization": mxu_frac,
        "distance_to_matmul_floor": 1.0 / mxu_frac,
        "note": (
            "floor = every counted MAC at 100% MXU; real headroom is smaller: "
            "the per-step chain (embed -> L0 ih+hh -> L1 -> proj -> gather) is "
            "serially dependent and interleaved with VPU top-k passes, and "
            "M=KB rows tile the 128-row MXU dimension imperfectly"
        ),
    }
    print(json.dumps(out, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
