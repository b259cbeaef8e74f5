"""Aspect-ratio bucketing throughput: fixed 64x800 canvas vs bucketed.

Workload: a mixed-width image population (natural widths lognormal around
the IM2LaTeX mean — reference dataset mean 319px at ~61px height scales to
~335px at height 64, README.md:47-52).  The fixed path pays the full-width
encoder for every image; the bucketed path runs each image's conv stack at
its bucket width and white-fills the feature grid (output-identical,
tests/test_buckets.py).  Decode cost is width-independent, so the win is
the encoder share times the width ratio.

Timing follows bench.py's tunnel-safe protocol: pipeline all dispatches,
fetch one device-side checksum at the end.

Usage: python scripts/bench_buckets.py [n_images] [--smoke]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "jax"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from img2latex_tpu.config import Config
    from img2latex_tpu.data.tokenizer import LaTeXTokenizer
    from img2latex_tpu.decoding.decode import DecodeConfig
    from img2latex_tpu.models.seq2seq import build_model
    from img2latex_tpu.training.predictor import Predictor

    smoke = "--smoke" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if smoke:
        VOCAB, H, W_FULL, EMBED, HIDDEN, LAYERS, MAX_LEN = 64, 32, 256, 32, 32, 1, 12
        BUCKETS = [64, 128, 192]
        B = 8
        n_images = int(args[0]) if args else 64
    else:
        VOCAB, H, W_FULL, EMBED, HIDDEN, LAYERS, MAX_LEN = 503, 64, 800, 512, 512, 2, 141
        BUCKETS = [320, 512, 640]
        B = 1024
        n_images = int(args[0]) if args else 8192

    cfg = Config()
    cfg.model.name = "cnn_lstm"
    cfg.model.embedding_dim = EMBED
    cfg.model.decoder.hidden_dim = HIDDEN
    cfg.model.decoder.lstm_layers = LAYERS
    cfg.model.decoder.dropout = 0.0
    cfg.model.encoder.cnn.img_height = H
    cfg.model.encoder.cnn.img_width = W_FULL
    cfg.data.max_seq_length = MAX_LEN
    cfg.inference.max_length = MAX_LEN
    cfg.hardware.compute_dtype = "bfloat16" if not smoke else "float32"
    cfg.hardware.use_mesh = False
    use_tpu = jax.default_backend() in ("tpu", "axon")
    cfg.hardware.pallas_conv1 = use_tpu
    cfg.hardware.use_pallas_decode = use_tpu

    model = build_model(cfg, VOCAB)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, H, W_FULL, 1)), jnp.zeros((2, 8), jnp.int32)
    )
    tok = LaTeXTokenizer(max_sequence_length=MAX_LEN)
    tok.default_init()
    pred = Predictor(cfg, model, variables["params"], {}, tok, batch_size=B)

    # Natural-width population: lognormal, median ~ IM2LaTeX-like mean.
    rng = np.random.default_rng(0)
    median_w = int(W_FULL * 0.42)
    nat_w = np.clip(
        rng.lognormal(np.log(median_w), 0.45, size=n_images), 24, W_FULL - 1
    ).astype(int)
    margin = pred.bucket_margin_px()

    def bucket_of(w):
        for bw in BUCKETS:
            if w + margin <= bw:
                return bw
        return None

    assignments = [bucket_of(int(w)) for w in nat_w]
    share = {bw: assignments.count(bw) for bw in BUCKETS + [None]}
    print(f"width median {np.median(nat_w):.0f}; bucket shares {share}", file=sys.stderr)

    dcfg = DecodeConfig(max_length=MAX_LEN, start_id=1, end_id=2, pad_id=0)
    checksum = jax.jit(lambda t, acc: acc + jnp.sum(t.astype(jnp.int64)))

    # Pre-built batches per path (content-free canvases; throughput only).
    def batches_for(width):
        canvas_w = W_FULL if width is None else width + margin
        count = share[width]
        n_b = (count + B - 1) // B
        img = jnp.asarray(
            rng.integers(0, 256, size=(B, H, canvas_w, 1), dtype=np.uint8)
        )
        return n_b, img

    def time_path(widths):
        """widths: list of (bucket_width, n_batches, images) to run."""
        runs = [(pred._decode_fn(B, dcfg, width=bw), n_b, img) for bw, n_b, img in widths]
        key = jax.random.PRNGKey(0)
        # compile + warmup
        acc = jnp.int64(0)
        for run, _, img in runs:
            acc = checksum(run(img, key), acc)
        _ = float(acc)
        acc = jnp.int64(0)
        t0 = time.perf_counter()
        total_imgs = 0
        for run, n_b, img in runs:
            for _ in range(n_b):
                acc = checksum(run(img, key), acc)
                total_imgs += B
        _ = float(acc)  # single sync
        return total_imgs / (time.perf_counter() - t0)

    total_batches = (n_images + B - 1) // B
    fixed_ips = time_path([(None, total_batches, batches_for(None)[1])])
    bucketed = []
    for bw in BUCKETS + [None]:
        n_b, img = batches_for(bw)
        if n_b:
            bucketed.append((bw, n_b, img))
    bucket_ips = time_path(bucketed)

    print(
        f"fixed {fixed_ips:.0f} img/s vs bucketed {bucket_ips:.0f} img/s "
        f"({bucket_ips / fixed_ips:.2f}x)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "bucketed_vs_fixed_speedup",
                "value": round(bucket_ips / fixed_ips, 3),
                "unit": "x",
                "fixed_img_per_sec": round(fixed_ips, 1),
                "bucketed_img_per_sec": round(bucket_ips, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
