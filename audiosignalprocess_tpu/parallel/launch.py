"""Multi-host bring-up (SURVEY.md §2 P6-P7, §3.5).

The comm layer is pure XLA collectives over jax.distributed — there is no
custom transport (the TPU-native equivalent of the reference having no
MPI/NCCL: ICI/DCN are driven entirely by the compiler).
"""

from __future__ import annotations

import logging
import os

import jax

log = logging.getLogger("asp_tpu.launch")


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the multi-host runtime (DCN control plane).

    No-ops on a single process.  On TPU pods with standard env vars, all
    arguments may be None (auto-detection).  ASP_FORCE_PLATFORM overrides
    the backend (e.g. "cpu" for simulated multi-host runs) even when an
    accelerator plugin pre-registered itself.
    """
    plat = os.environ.get("ASP_FORCE_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    if num_processes is not None and num_processes <= 1:
        log.info("single process; skipping jax.distributed")
        return
    if coordinator_address is None and num_processes is None and (
        "COORDINATOR_ADDRESS" not in os.environ
    ):
        log.info("no coordinator configured; assuming single host")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "distributed init: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def warmup(fn, *args) -> None:
    """Compile-and-run barrier: verifies collective connectivity at init."""
    out = fn(*args)
    jax.block_until_ready(out)
