"""Probe: does ``lax.scan(..., unroll=k)`` pay on the teacher-forced LSTM?

The decoder's training forward is 3.4x off its FLOP floor (141-step scan of
(B,H)@(H,4H) matmuls — scripts/bench_train_parts.py) and the backward is
2.5x the forward.  Unrolling reduces per-step loop overhead and lets XLA
fuse across steps.  This probe times fwd and grad of a standalone 2-layer
hoisted-projection LSTM at reference scale for several unroll factors.

Usage: python scripts/probe_scan_unroll.py [batch] [iters]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

HIDDEN, LAYERS, T = 512, 2, 140
EMBED = 512


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import jax

    cache_dir = os.path.join(repo, ".cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    dtype = jnp.bfloat16

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(B, T, EMBED)).astype(np.float32), dtype)
    params = {}
    for l in range(LAYERS):
        d_in = EMBED if l == 0 else HIDDEN
        params[f"w_ih_{l}"] = jnp.asarray(
            rng.normal(size=(d_in, 4 * HIDDEN)).astype(np.float32) * 0.05, dtype
        )
        params[f"w_hh_{l}"] = jnp.asarray(
            rng.normal(size=(HIDDEN, 4 * HIDDEN)).astype(np.float32) * 0.05, dtype
        )
        params[f"b_{l}"] = jnp.zeros((4 * HIDDEN,), dtype)

    def forward(params, xs, unroll):
        ys = xs
        for l in range(LAYERS):
            gates_x = ys @ params[f"w_ih_{l}"] + params[f"b_{l}"]
            gates_x_t = jnp.swapaxes(gates_x, 0, 1)
            w_hh = params[f"w_hh_{l}"]

            def scan_fn(hc, gx, w_hh=w_hh):
                h, c = hc
                g = gx + h @ w_hh
                i, f, gg, o = jnp.split(g, 4, axis=-1)
                c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
                h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
                return (h2, c2), h2

            h0 = jnp.zeros((B, HIDDEN), dtype)
            (_, _), ys_t = jax.lax.scan(scan_fn, (h0, h0), gates_x_t, unroll=unroll)
            ys = jnp.swapaxes(ys_t, 0, 1)
        return ys

    def time_fn(fn, args, n):
        acc_fn = jax.jit(lambda x, a: a + jnp.sum(x.astype(jnp.float32)))
        out = fn(*args)
        float(acc_fn(jax.tree_util.tree_leaves(out)[0], jnp.float32(0)))
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for _ in range(n):
            out = fn(*args)
            acc = acc_fn(jax.tree_util.tree_leaves(out)[0], acc)
        v = float(acc)
        elapsed = time.perf_counter() - t0
        assert np.isfinite(v)
        return elapsed / n * 1e3

    for unroll in (1, 2, 4, 8, 16):
        fwd = jax.jit(lambda p, x, u=unroll: forward(p, x, u))
        loss = jax.jit(
            lambda p, x, u=unroll: jnp.mean(forward(p, x, u).astype(jnp.float32) ** 2)
        )
        grad = jax.jit(jax.grad(lambda p, x, u=unroll: jnp.mean(
            forward(p, x, u).astype(jnp.float32) ** 2
        )))
        f_ms = time_fn(fwd, (params, xs), iters)
        g_ms = time_fn(grad, (params, xs), iters)
        print(f"B={B} unroll={unroll:2d} fwd {f_ms:6.2f} ms  grad {g_ms:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
