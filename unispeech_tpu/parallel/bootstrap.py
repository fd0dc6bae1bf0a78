"""Multi-host bootstrap: single-controller SPMD initialization.

Replaces the reference's whole rendezvous stack — process spawning,
NCCL/gloo init_process_group, SLURM/env inference
(/root/reference/src/fairseq/distributed/utils.py:41-160, 255-364) — with
one call to `jax.distributed.initialize`. One process per host; GSPMD
handles everything after.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_INITIALIZED = False


def multihost_env_detected(environ=None) -> bool:
    """True when the environment indicates a multi-host launch.

    Judged PER SOURCE: TPU-pod env vars are sufficient on their own (a pod
    without SLURM must not silently fall back to single-process); the SLURM
    node count only counts when it is actually > 1. Reference parity:
    /root/reference/src/fairseq/distributed/utils.py:255-297.
    """
    env = os.environ if environ is None else environ
    return (
        "MEGASCALE_COORDINATOR_ADDRESS" in env
        or "TPU_WORKER_HOSTNAMES_OVERRIDE" in env
        or env.get("SLURM_JOB_NUM_NODES", "1") != "1"
    )


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the JAX distributed runtime when running multi-host.

    Resolution order: explicit args > JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env > cluster auto-detection
    (jax.distributed.initialize() detects TPU pod / SLURM / GKE
    environments itself). Returns True when the distributed runtime was
    (or already is) initialized, False for plain single-process runs.

    Safe to call more than once.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np:
        num_processes = int(env_np)
    if process_id is None and env_pid:
        process_id = int(env_pid)

    auto = multihost_env_detected()

    if coordinator_address is None and not auto:
        return False

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    return True
