"""Multi-host initialization: ``jax.distributed`` over DCN.

The reference is single-process (SURVEY.md §2: no distributed backend).  For
multi-host TPU slices the idiomatic JAX bootstrap is
``jax.distributed.initialize()`` — afterwards ``jax.devices()`` spans the
slice, the same ``Mesh``/pjit code runs unchanged, and gradient collectives
ride ICI within a slice and DCN across hosts.
"""

from __future__ import annotations

import os
from typing import Optional

from img2latex_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when multi-host env/args are present.

    Detection order: explicit args -> JAX_COORDINATOR_ADDRESS env (with
    JAX_NUM_PROCESSES/JAX_PROCESS_ID) -> Cloud-TPU-pod env markers (no-arg
    ``jax.distributed.initialize``, which self-detects pod topology).
    Returns True when multi-host mode is active.

    ORDER MATTERS: ``jax.distributed.initialize`` must run before ANY call
    that initializes the XLA backend — including ``jax.process_count()`` /
    ``jax.devices()`` — or it raises ("must be called before any JAX calls
    ...").  So the coordinator decision is made purely from args/env, and
    jax state is only queried afterwards (or when nothing is configured).
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    multi_worker_pod = len([h for h in hostnames.split(",") if h.strip()]) > 1 or bool(
        os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )
    try:
        if coordinator_address:
            num_processes = num_processes or (int(env_np) if env_np else None)
            process_id = (
                process_id if process_id is not None else (int(env_pid) if env_pid else None)
            )
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        elif multi_worker_pod:
            # Multi-worker Cloud TPU pod slice: no-arg initialize self-detects
            # the coordinator + topology from the TPU metadata.  Single-worker
            # hostnames (e.g. "localhost" from the local TPU plugin) must NOT
            # take this path — no-arg initialize requires pod metadata.
            jax.distributed.initialize()
        else:
            return jax.process_count() > 1
    except (RuntimeError, ValueError) as e:
        # Already initialized (re-entrant call), backends touched first
        # in-process, or pod metadata incomplete: degrade to the state we
        # actually have rather than killing a launchable single-process run.
        logger.warning("jax.distributed.initialize skipped: %s", e)
        return jax.process_count() > 1
    logger.info(
        "jax.distributed initialized: process %d/%d",
        jax.process_index(),
        jax.process_count(),
    )
    return jax.process_count() > 1


def is_primary_host() -> bool:
    import jax

    return jax.process_index() == 0
