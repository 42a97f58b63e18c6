"""Multi-host runtime initialization and host-local data feeding.

The TPU-native replacement for the reference's absent distributed backend
(SURVEY §2.15): ``jax.distributed`` multi-controller SPMD.  Each host runs
the same program; the global mesh spans every chip of the slice; batches are
fed host-locally (each process materializes ON DEVICE only the shards of the
"data" axis its chips own — see ``put_global``).

Typical pod-slice launch (one process per host):

    from matcha_tpu.parallel.distributed import init_distributed, global_mesh
    init_distributed()                       # env-driven on TPU pods
    mesh = global_mesh(n_model=1)            # ("data", "model") over all chips
    trainer = Trainer(..., mesh=mesh)

On a single host this is a no-op and the mesh covers the local devices.
The multi-process path is exercised for real by tests/test_multiprocess.py
(2 OS processes x 2 virtual CPU devices) and by ``dryrun_multichip``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

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


def put_global(x, sharding) -> jax.Array:
    """Place a host value under ``sharding`` as a GLOBAL array, multi-process
    safe.

    Single process: plain ``device_put``.  Multi-process: every process holds
    the same host value (deterministic data pipeline) and materializes on
    device ONLY the shards its own devices are assigned — no process ever
    device_puts the full global array, and the result is a global jax.Array
    addressable-where-owned (the jax.make_array_from_callback pattern).
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def replicate_to_host(tree, mesh):
    """Gather possibly non-addressable sharded outputs to every host.

    Under multi-controller SPMD, per-shard outputs of a jitted step are only
    addressable on the process that owns them — ``jax.device_get`` on them
    throws.  A jitted identity with fully-replicated out_shardings inserts
    the all-gather ON DEVICE (riding ICI/DCN), after which every process can
    read the full value."""
    from jax.sharding import NamedSharding, PartitionSpec
    rep = NamedSharding(mesh, PartitionSpec())
    tree = jax.jit(lambda t: t, out_shardings=rep)(tree)
    return jax.device_get(tree)
