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
    JAX_NUM_PROCESSES/JAX_PROCESS_ID) -> TPU pod metadata (auto-detected by
    jax.distributed.initialize with no args on Cloud TPU pods).  Returns True
    when multi-host mode is active.
    """
    import jax

    if jax.process_count() > 1:
        return True  # already initialized
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if coordinator_address:
        num_processes = num_processes or (int(env_np) if env_np else None)
        process_id = process_id if process_id is not None else (int(env_pid) if env_pid else None)
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info(
            "jax.distributed initialized: process %d/%d",
            jax.process_index(),
            jax.process_count(),
        )
        return jax.process_count() > 1
    return False


def is_primary_host() -> bool:
    import jax

    return jax.process_index() == 0
