"""Multi-host runtime bootstrap.

Net-new vs the single-process reference (SURVEY.md §5.8): thin, explicit glue
over ``jax.distributed`` so the same serving/quantization code runs on a TPU
pod slice. Collectives themselves are emitted by GSPMD from the shardings in
``parallel/sharding.py`` — ICI within a slice, DCN across slices — so there
is no hand-written communication layer to maintain.

Typical pod entrypoint:

    from ganq_tpu.parallel import distributed, sharding
    distributed.initialize()                  # once per process, all hosts
    mesh = sharding.make_mesh(data=D, model=M)  # global devices
    params = sharding.shard_params(cfg, params, mesh)
    ...

Process-0-only side effects (checkpoint writes, logs) go through
:func:`is_coordinator` / :func:`coordinator_only`.
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Optional

import jax

from ..utils.logger import get_logger

log = get_logger(__name__)

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-host runtime. On TPU pods all arguments are
    auto-detected from the environment; no-op for single-process runs."""
    global _initialized
    if _initialized:
        return
    env_world = int(os.environ.get("GANQ_TPU_NUM_PROCESSES",
                                   num_processes or 1))
    if env_world <= 1 and coordinator_address is None and \
            "COORDINATOR_ADDRESS" not in os.environ:
        log.info("single-process run; skipping jax.distributed")
        _initialized = True
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("COORDINATOR_ADDRESS"),
        num_processes=num_processes, process_id=process_id)
    _initialized = True
    log.info(f"distributed: process {jax.process_index()}/{jax.process_count()}"
             f" with {jax.local_device_count()} local devices")


def is_coordinator() -> bool:
    return jax.process_index() == 0


def coordinator_only(fn: Callable) -> Callable:
    """Run ``fn`` only on process 0 (checkpoint writes, server binding)."""

    @functools.wraps(fn)
    def wrapper(*a, **k):
        if is_coordinator():
            return fn(*a, **k)
        return None

    return wrapper


def local_batch_slice(global_batch: int) -> slice:
    """The rows of a globally-sharded batch owned by this process."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)


__all__ = ["initialize", "is_coordinator", "coordinator_only",
           "local_batch_slice"]
