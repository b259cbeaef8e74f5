"""Persistent-compilation-cache cold/warm A/B (round-3 verdict weak #2).

Runs the same evaluate in FRESH subprocesses against a dedicated cache dir:

  run 1 (cold)  — empty cache dir: pays the full remote XLA compile
  run 2 (warm)  — same program, same dir: must load the serialized
                  executable instead of recompiling

for two entry-point programs (the per-batch decode executable and the
whole-split lax.map executable), recording each run's
``compile_and_first_batch_seconds`` plus the cache dir's file count/bytes
after every run and any "compilation cache" log lines the subprocess
emitted.  Writes ``artifacts/compile_cache_ab.json``.

The round-3 artifacts' confusing spread (10.4 s vs 1807.5 s vs 116.7 s for
"the same" eval) is explained in the output's ``r3_spread_explanation``
field and in STATUS.md: the 1807 s run overlapped the bench-variance
processes (TPU is single-tenant — concurrent processes stall each other),
the 10.4 s run reused an executable compiled earlier in the same process,
and the three runs were not the same program (eval batch 256 vs 1024).

Usage:
  python scripts/compile_cache_ab.py CKPT --data-dir /tmp/mathtext_hard \
      [--batch 1024] [--max-batches 4] [--cache-dir /tmp/cc_ab_cache]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, logging, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_explain_cache_misses", True)
logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)
logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
h = logging.StreamHandler(sys.stderr)
logging.getLogger("jax._src.compiler").addHandler(h)
logging.getLogger("jax._src.compilation_cache").addHandler(h)
from img2latex_tpu.training.evaluator import evaluate_checkpoint
out = evaluate_checkpoint(
    {ckpt!r}, data_dir={data_dir!r}, split="test", batch_size={batch},
    max_batches={max_batches},
    config_overrides={{
        "data.device_cache": True,
        "data.canvas_cache_dir": {canvas_cache!r},
        "inference.whole_split": {whole_split},
        "hardware.compilation_cache_dir": {cache_dir!r},
    }},
)
print("CCAB_RESULT " + json.dumps({{
    "compile_and_first_batch_seconds": out["compile_and_first_batch_seconds"],
    "end_to_end_seconds": out["end_to_end_seconds"],
    "decode_seconds": out["decode_seconds"],
    "num_images": out["num_images"],
    "bleu": out["bleu"],
}}))
"""


def cache_stats(d):
    if not os.path.isdir(d):
        return {"files": 0, "bytes": 0}
    files = [os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs]
    return {"files": len(files), "bytes": sum(os.path.getsize(f) for f in files)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--max-batches", type=int, default=4)
    ap.add_argument("--cache-dir", default="/tmp/cc_ab_cache")
    ap.add_argument("--canvas-cache", default="/tmp/mathtext_hard_cc")
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts", "compile_cache_ab.json"))
    args = ap.parse_args()

    results = {"batch": args.batch, "max_batches": args.max_batches,
               "cache_dir": args.cache_dir, "rows": []}
    for mode, whole_split in (("perbatch", False), ("wholesplit", True)):
        cache_dir = f"{args.cache_dir}_{mode}"
        shutil.rmtree(cache_dir, ignore_errors=True)
        for phase in ("cold", "warm"):
            code = CHILD.format(
                repo=REPO, ckpt=args.ckpt, data_dir=args.data_dir,
                batch=args.batch, max_batches=args.max_batches,
                canvas_cache=args.canvas_cache, whole_split=whole_split,
                cache_dir=cache_dir,
            )
            t0 = time.time()
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True)
            wall = time.time() - t0
            row = {"mode": mode, "phase": phase, "subprocess_wall_seconds": wall,
                   "cache_after": cache_stats(cache_dir)}
            for line in r.stdout.splitlines():
                if line.startswith("CCAB_RESULT "):
                    row.update(json.loads(line[len("CCAB_RESULT "):]))
            row["cache_log_lines"] = [
                ln for ln in (r.stderr + r.stdout).splitlines()
                if "cache" in ln.lower()
                and "canvas" not in ln.lower()
                and "device_cache" not in ln.lower()
            ][:20]
            if r.returncode != 0:
                row["error"] = r.stderr[-2000:]
            results["rows"].append(row)
            print(json.dumps(row, indent=2), flush=True)

    results["r3_spread_explanation"] = (
        "The round-3 predictions_devicecache* artifacts recorded "
        "compile_and_first_batch_seconds of 10.4s / 399.1s / 1807.5s / "
        "116.7s for what looked like one eval.  They were neither the same "
        "program nor the same conditions: (a) the 10.4s run "
        "(predictions_devicecache, written by post_flagship.py) ran in a "
        "process that had ALREADY compiled the same (batch=256, greedy) "
        "decode executable for earlier battery steps, so its 'compile' was "
        "first-batch-only; (b) 399.1s (eval_cc run 1) is the true cold "
        "compile of the batch-256 grid-greedy program in a fresh process; "
        "(c) 1807.5s (eval_cc run 2, the committed predictions_devicecache_cc) "
        "recompiled the SAME program but ran CONCURRENTLY with the 5-process "
        "bench_variance battery (logs: 07:53-08:23 vs bench_var 07:4x+) — "
        "the TPU is single-tenant and concurrent processes stall each "
        "other's compiles (STATUS.md gotcha), so the cache looked useless; "
        "(d) 116.7s (predictions_devicecache_cc_b1024) is a DIFFERENT "
        "program (batch 1024, 8 batches).  This script replaces that mess "
        "with a controlled cold/warm pair per program on an otherwise idle "
        "chip."
    )
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
