"""Multi-host runtime initialization.

The TPU-native replacement for the reference's absent distributed backend
(SURVEY §2.15): ``jax.distributed`` multi-process SPMD.  Each host runs the
same program; the global mesh spans every chip of the slice; batches are fed
host-locally (each host materializes its shard of the "data" axis).

Typical pod-slice launch (one process per host):

    from matcha_tpu.parallel.distributed import init_distributed, global_mesh
    init_distributed()                       # env-driven on TPU pods
    mesh = global_mesh(n_model=1)            # ("data", "model") over all chips
    trainer = Trainer(..., mesh=mesh)

On a single host this is a no-op and the mesh covers the local devices.
"""

from __future__ import annotations

from typing import Optional

import jax

from matcha_tpu.parallel.mesh import make_mesh


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed.  With no arguments, TPU pod environments
    auto-discover topology from the runtime; arguments are for CPU/GPU
    clusters or tests."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        if coordinator_address is None and num_processes is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
    except (RuntimeError, ValueError):
        # single-process environment (no coordinator): run locally
        pass


def global_mesh(n_model: int = 1):
    """("data", "model") mesh over every device in the (possibly multi-host)
    runtime.  Data-parallel axis spans hosts (DCN) then chips (ICI); the
    model axis should stay within a host so table shards ride ICI."""
    return make_mesh(n_model=n_model)


def local_batch_slice(global_batch: int) -> slice:
    """The [start, stop) rows of a global batch this process should feed
    (host-local data loading for the "data" axis)."""
    per = global_batch // jax.process_count()
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
