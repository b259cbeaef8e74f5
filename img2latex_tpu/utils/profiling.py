"""Profiling + numerics debugging toggles.

The reference has no formal profiler (SURVEY.md §5: tqdm bars and an ad-hoc
throughput probe only).  TPU-natively this wires ``jax.profiler`` traces
(viewable in TensorBoard/Perfetto/xprof) behind ``hardware.profile`` and
``jax_debug_nans`` behind ``hardware.debug_nans``.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

from img2latex_tpu.utils.logging import get_logger

logger = get_logger(__name__)


@contextlib.contextmanager
def maybe_trace(enabled: bool, log_dir: str, name: str = "train") -> Iterator[None]:
    """jax.profiler trace context; no-op when disabled."""
    if not enabled:
        yield
        return
    import jax

    trace_dir = os.path.join(log_dir, "traces", name)
    os.makedirs(trace_dir, exist_ok=True)
    logger.info("Profiler trace -> %s", trace_dir)
    with jax.profiler.trace(trace_dir):
        yield
    logger.info("Profiler trace complete: %s", trace_dir)


def apply_numerics_flags(debug_nans: bool) -> None:
    if debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)
        logger.info("jax_debug_nans enabled")


def enable_compilation_cache(cache_dir: str) -> None:
    """Point JAX's persistent compilation cache at ``cache_dir``
    (``hardware.compilation_cache_dir``; empty string = disabled).

    Idempotent and safe to call after backend init; programs compiled
    before the call simply aren't cached.  ``min_compile_time_secs=1``
    keeps trivial CPU/test compiles out of the cache.

    Best-effort: on hosts where ``cache_dir`` isn't writable (read-only
    HOME in a serving container — the default lives under ~/.cache) the
    run continues WITHOUT the persistent cache instead of failing the
    checkpoint/artifact load that called us."""
    if not cache_dir:
        return
    import jax

    path = os.path.abspath(os.path.expanduser(cache_dir))
    if jax.config.jax_compilation_cache_dir == path:
        return
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except OSError as e:
        logger.warning(
            "persistent compilation cache disabled (%s not writable: %s)", path, e
        )
        return
    logger.info("persistent compilation cache -> %s", path)


def apply_rng_impl(rng_impl: str) -> None:
    """Set the default PRNG bit-generator (``hardware.rng_impl``).

    Must run before the keys it should affect are created (the Trainer calls
    it first thing in ``__init__``); keys created earlier keep their impl —
    JAX typed keys carry it — so mixing is safe."""
    if rng_impl in ("threefry", "threefry2x32", ""):
        return
    if rng_impl not in ("rbg", "unsafe_rbg"):
        raise ValueError(
            f"hardware.rng_impl must be 'threefry', 'rbg', or 'unsafe_rbg'; got {rng_impl!r}"
        )
    import jax

    jax.config.update("jax_default_prng_impl", rng_impl)
    logger.info("jax_default_prng_impl = %s", rng_impl)


class StepTimer:
    """Lightweight per-step wall-clock aggregator (host side)."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.count = 0
        self.total = 0.0
        self._t0: Optional[float] = None

    def __enter__(self) -> "StepTimer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.total += time.perf_counter() - self._t0
        self.count += 1

    @property
    def mean_ms(self) -> float:
        return (self.total / self.count * 1e3) if self.count else 0.0
