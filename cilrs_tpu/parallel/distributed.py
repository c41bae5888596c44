"""Multi-process (multi-host / multi-slice) initialization.

The reference's only inter-process seam is the CARLA client<->server TCP RPC
(model/autonomous_drive.py:552, SURVEY.md §5 "distributed communication
backend"). The TPU-native replacement deletes that seam: sim + policy live in
one jitted program, and scaling across hosts/slices goes through
`jax.distributed` — ICI collectives within a slice, DCN across slices — with
XLA inserting the transfers from sharding annotations.

Single-process runs (one chip, or a virtual CPU mesh) need no initialization;
`initialize_distributed()` is a no-op unless a multi-process environment is
detected or explicitly described.
"""

from __future__ import annotations

import os

import jax

_INITIALIZED = False


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: list[int] | None = None,
) -> bool:
    """Initialize jax.distributed for multi-host execution.

    Returns True if distributed mode was initialized (or already was), False
    for single-process runs. Arguments default to the standard environment
    variables (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID),
    which TPU pod launchers set automatically; on Cloud TPU, calling
    jax.distributed.initialize() with no args also auto-detects from metadata.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    explicit = coordinator_address is not None and num_processes is not None
    # A pod slice is only multi-process when there is more than one worker:
    # single-host setups (and the axon tunnel) export TPU_WORKER_HOSTNAMES
    # with one entry, where jax.distributed.initialize() has no coordinator
    # to find and would raise.
    worker_hosts = [h for h in
                    os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if h]
    auto_tpu_pod = (
        len(worker_hosts) > 1
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS") is not None
    )
    if not explicit and not auto_tpu_pod:
        return False  # single-process: nothing to do

    if explicit:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    else:
        jax.distributed.initialize()
    _INITIALIZED = True
    return True


def is_coordinator() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
