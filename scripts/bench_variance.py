"""Bench run-to-run variance (VERDICT r2 weak #6): run bench.py N times at
the headline config and report mean +/- sd, so headline claims can quote the
driver-captured number with a characterized noise band instead of explaining
away a -1.6% drift.

Usage:
  python scripts/bench_variance.py [-n 5] [--out artifacts/bench_variance.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _one_run(retries: int = 2, cooldown_s: float = 30.0) -> dict:
    """One bench.py subprocess -> its JSON line.  The tunnel occasionally
    refuses a fresh session right after the previous process exits; retry
    after a cooldown instead of crashing the whole N-run sweep."""
    last_err = ""
    for attempt in range(retries + 1):
        r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                           capture_output=True, text=True)
        lines = [ln for ln in r.stdout.splitlines() if ln.strip().startswith("{")]
        if lines:
            return json.loads(lines[-1])
        last_err = (r.stderr or r.stdout or "")[-2000:]
        print(f"  bench.py produced no JSON (rc={r.returncode}); "
              f"retry {attempt + 1}/{retries} after {cooldown_s:.0f}s\n{last_err}",
              flush=True)
        time.sleep(cooldown_s)
    raise RuntimeError(f"bench.py failed {retries + 1} times; last stderr:\n{last_err}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=5)
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts", "bench_variance.json"))
    args = ap.parse_args()

    runs = []
    for i in range(args.n):
        row = _one_run()
        runs.append(row)
        print(f"run {i + 1}/{args.n}: {row['value']:.0f} {row['unit']}", flush=True)

    values = [r["value"] for r in runs]
    mean = statistics.fmean(values)
    sd = statistics.stdev(values) if len(values) > 1 else 0.0
    out = {
        "n": args.n,
        "metric": runs[0]["metric"],
        "unit": runs[0]["unit"],
        "values": values,
        "mean": mean,
        "sd": sd,
        "cv_pct": 100.0 * sd / mean if mean else None,
        "min": min(values),
        "max": max(values),
        "note": ("each run is a fresh process (fresh compile-cache hit, fresh "
                 "tunnel session); spread therefore includes everything a "
                 "driver-captured single run can see"),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
