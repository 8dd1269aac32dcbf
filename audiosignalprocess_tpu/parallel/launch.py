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
    if coordinator_address is None and num_processes is None:
        # TPU-pod auto-detection: fall through to jax.distributed's
        # cluster detection only on a genuinely MULTI-worker environment
        # (the docstring's "all arguments may be None" path) — an
        # explicit coordinator env, or TPU_WORKER_HOSTNAMES naming more
        # than one host (single-host TPU VMs and the axon plugin set it
        # with one entry).  Checked via env vars, NOT
        # jax.default_backend(), which would initialize the backend
        # before the distributed runtime.
        explicit = any(m in os.environ for m in (
            "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS"))
        hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        multi = len([h for h in hosts.split(",") if h.strip()]) > 1
        if not (explicit or multi):
            log.info("no coordinator configured; assuming single host")
            return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except ValueError as e:
        # auto-detection found no usable cluster (e.g. a plugin set pod
        # markers on a single host): run single-host rather than die
        if coordinator_address is not None or num_processes is not None:
            raise  # explicit request: surface the real error
        log.warning("jax.distributed auto-detect failed (%s); "
                    "assuming single host", e)
        return
    log.info(
        "distributed init: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def warmup(fn, *args) -> None:
    """Compile-and-run barrier: verifies collective connectivity at init."""
    out = fn(*args)
    jax.block_until_ready(out)
