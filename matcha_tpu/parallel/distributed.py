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

import os
from typing import Optional

import jax
import numpy as np

from matcha_tpu.parallel.mesh import make_mesh


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed.  With no arguments, TPU pod environments
    auto-discover topology from the runtime; arguments are for CPU/GPU
    clusters or tests.

    MUST be called before any other JAX call: probing e.g.
    ``jax.process_count()`` first would initialize the XLA backend, after
    which ``jax.distributed.initialize`` unconditionally raises — and a
    swallowed error there means every pod host silently trains as an
    independent single-process job with the wrong topology."""
    if jax.distributed.is_initialized():
        return
    try:
        if coordinator_address is None and num_processes is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
    except RuntimeError as e:
        if "backend" in str(e).lower():
            # Called after the XLA backend initialized.  If a cluster was
            # actually requested (explicit args or pod environment markers),
            # failing loudly beats every host silently training as an
            # independent single-process job with the wrong topology; a
            # plain single-process late call stays a no-op.
            wants_cluster = coordinator_address is not None or any(
                os.environ.get(v) for v in
                ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                 "MEGASCALE_COORDINATOR_ADDRESS", "CLOUD_TPU_TASK_ID",
                 "TPU_WORKER_ID"))
            if wants_cluster:
                raise RuntimeError(
                    "init_distributed was called after JAX initialized its "
                    "backend; call it FIRST or the pod topology is lost"
                ) from e
            return
        # no coordinator/cluster detected: single-process environment
    except ValueError:
        # auto-detection found no supported cluster: single-process
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
