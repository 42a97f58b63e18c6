"""Multi-host init helpers (single-process semantics on the test mesh)."""

import jax

from matcha_tpu.parallel.distributed import (global_mesh, init_distributed,
                                             local_batch_slice)


def test_init_noop_single_process():
    init_distributed()          # must not raise in single-process env
    assert jax.process_count() == 1


def test_global_mesh_covers_devices():
    mesh = global_mesh(n_model=2)
    assert mesh.shape["data"] * mesh.shape["model"] == len(jax.devices())
    assert mesh.shape["model"] == 2


def test_local_batch_slice():
    s = local_batch_slice(256)
    assert s == slice(0, 256)   # single process feeds the whole batch
