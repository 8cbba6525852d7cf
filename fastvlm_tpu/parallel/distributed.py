"""Multi-host bring-up (SURVEY.md §5: jax.distributed + ICI/DCN collectives
replace the reference's torchrun/NCCL launcher).

One call per host before any device use:

    from fastvlm_tpu.parallel.distributed import initialize
    initialize()                      # TPU pod: env-autodetected
    initialize(coordinator, n, pid)   # explicit (CPU/GPU or custom launch)

then the regular mesh code lays DP across hosts (DCN) and TP within each
host's ICI domain, because jax.devices() orders devices host-major:

    mesh = make_mesh(tp=jax.local_device_count())
"""

from __future__ import annotations

import logging
from typing import Optional

logger = logging.getLogger(__name__)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Idempotent jax.distributed.initialize with TPU-pod autodetection."""
    import jax

    try:
        if coordinator_address is None:
            jax.distributed.initialize()  # TPU metadata autodetection
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id)
        logger.info("jax.distributed up: process %d/%d, %d local / %d global devices",
                    jax.process_index(), jax.process_count(),
                    jax.local_device_count(), jax.device_count())
    except RuntimeError as e:
        if "already initialized" in str(e):
            return
        raise


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    import jax

    return jax.process_index() == 0
