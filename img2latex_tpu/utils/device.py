"""Device helpers: backend info, seeding, empirical batch-size finder.

TPU-native counterpart of the reference's device backend
(``img2latex/utils/mps_utils.py:16-439``).  JAX needs no ``set_device`` —
the platform comes from the runtime — and no cache hygiene (XLA owns HBM),
so what remains meaningful is: backend introspection, cross-library seeding
(JAX randomness itself is explicit PRNGKey threading), a live-memory readout,
and the empirical throughput-probe ``batch_size_finder``
(``mps_utils.py:267-322``) rebuilt for compiled-step semantics.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, List, Optional

from img2latex_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def set_device(preferred: str = "tpu") -> str:
    """Informational device selection (reference ``set_device``,
    ``mps_utils.py:50-75``): JAX picks the backend at init; this logs and
    returns what is actually available, falling back gracefully."""
    import jax

    backend = jax.default_backend()
    if preferred not in (backend, "auto") and preferred not in str(backend):
        logger.warning("Requested device %r; JAX backend is %r", preferred, backend)
    logger.info("Using %s (%d device(s))", backend, jax.device_count())
    return backend


def device_info() -> Dict[str, Any]:
    import jax

    devices = jax.devices()
    return {
        "backend": jax.default_backend(),
        "device_count": jax.device_count(),
        "local_device_count": jax.local_device_count(),
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "devices": [str(d) for d in devices],
        "platform_version": getattr(devices[0], "device_kind", "?") if devices else None,
    }


def set_seed(seed: int, deterministic: bool = False) -> None:
    """Cross-library host seeding (reference ``mps_utils.py:200-251``).  JAX
    device randomness is functional (PRNGKey), so nothing global to set; the
    ``deterministic`` knob pins matmuls to highest precision — the numerics
    knob that matters on TPU, where XLA reductions are already run-to-run
    deterministic.  It is NOT a cross-backend (GPU) determinism guarantee."""
    import random

    import numpy as np

    random.seed(seed)
    np.random.seed(seed)
    if deterministic:
        import jax

        jax.config.update("jax_default_matmul_precision", "highest")


def live_device_memory_mb() -> float:
    """Approximate live HBM usage from JAX's live buffers."""
    import jax

    total = 0
    for buf in jax.live_arrays():
        total += buf.nbytes
    return total / 1e6


def free_device_memory_bytes(fallback: Optional[int] = None) -> Optional[int]:
    """Free HBM on device 0 from the runtime's ``memory_stats()`` (bytes),
    or ``fallback`` when the backend does not report stats (e.g. the CPU
    platform, where ``memory_stats`` is absent or empty)."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:  # pragma: no cover - backend-dependent
        stats = {}
    limit = stats.get("bytes_limit")
    in_use = stats.get("bytes_in_use", 0)
    if limit:
        return max(int(limit) - int(in_use), 0)
    hbm = device_hbm_bytes()
    if hbm:
        # Stats unavailable (e.g. the tunneled axon TPU plugin returns None)
        # but the part is known: report capacity minus a 20% headroom guess.
        return int(hbm * 0.8)
    return fallback


# HBM per chip by device_kind substring (first match wins).  Used only when
# the runtime reports no memory_stats; callers apply their own share/headroom.
_HBM_BY_KIND = (
    ("v5 lite", 16),  # v5e ("TPU v5 lite")
    ("v5e", 16),
    ("v5p", 95),
    ("v6 lite", 32),  # Trillium
    ("v6e", 32),
    ("v4", 32),
    ("v3", 16),
    ("v2", 8),
)


def device_hbm_bytes() -> Optional[int]:
    """Best-effort HBM capacity of device 0 in bytes from ``device_kind``
    (TPU parts only), for backends whose ``memory_stats()`` is absent."""
    import jax

    try:
        dev = jax.local_devices()[0]
        if dev.platform not in ("tpu", "axon"):
            return None
        kind = (dev.device_kind or "").lower()
    except Exception:  # pragma: no cover - backend-dependent
        return None
    for sub, gib in _HBM_BY_KIND:
        if sub in kind:
            return gib * 1024**3
    return 16 * 1024**3  # unknown TPU: conservative v5e-class default


def batch_size_finder(
    step_builder: Callable[[int], Callable[[], Any]],
    start: int = 32,
    max_batch: int = 4096,
    target_seconds: float = 30.0,
) -> Dict[int, float]:
    """Empirical throughput probe: for doubling batch sizes, build + run the
    step and record items/sec; stops on compile/OOM failure or time budget.

    ``step_builder(batch_size)`` returns a zero-arg callable that runs one
    compiled step and BLOCKS until complete (callers must sync — see
    bench.py's checksum note for the tunneled-platform caveat).
    """
    results: Dict[int, float] = {}
    t_start = time.perf_counter()
    b = start
    while b <= max_batch and (time.perf_counter() - t_start) < target_seconds:
        try:
            run = step_builder(b)
            run()  # compile + warmup
            t0 = time.perf_counter()
            iters = 3
            for _ in range(iters):
                run()
            dt = (time.perf_counter() - t0) / iters
            results[b] = b / dt
            logger.info("batch %d: %.0f items/s", b, results[b])
        except Exception as e:  # noqa: BLE001 - OOM/compile failures end the probe
            logger.warning("batch %d failed (%s); stopping probe", b, type(e).__name__)
            break
        b *= 2
    return results


def quantize_params(params: Any, dtype: str = "bfloat16") -> Any:
    """Reduced-precision copy of a parameter tree (floating leaves only).

    Parity with the reference's temporary fp16 quantize/restore helpers
    (``mps_utils.py:405-439``), functional-style: the reference mutates the
    model in place and restores from a saved dict; in JAX parameters are
    immutable pytrees, so "quantize" returns a cast copy and "restore" is
    keeping the original tree.  bf16 is the TPU-native reduced precision.
    """
    import jax
    import jax.numpy as jnp

    dt = jnp.dtype(dtype)

    def cast(leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(dt)
        return leaf

    return jax.tree_util.tree_map(cast, params)


def param_bytes(params: Any) -> int:
    """Total bytes of all array leaves (reference logs MB before/after
    quantization, ``mps_utils.py:423-431``)."""
    import jax

    return sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(params)
        if hasattr(leaf, "dtype")
    )
