"""Multi-host init helpers (single-process semantics on the test mesh).
The real multi-process path is exercised by tests/test_multiprocess.py."""

import jax
import jax.numpy as jnp
import numpy as np

from matcha_tpu.parallel.distributed import (global_mesh, init_distributed,
                                             put_global, replicate_to_host)
from matcha_tpu.parallel.mesh import batch_sharding


def test_init_noop_single_process():
    init_distributed()          # must not raise in single-process env
    assert jax.process_count() == 1


def test_global_mesh_covers_devices():
    mesh = global_mesh(n_model=2)
    assert mesh.shape["data"] * mesh.shape["model"] == len(jax.devices())
    assert mesh.shape["model"] == 2


def test_put_global_and_replicate_roundtrip():
    mesh = global_mesh(n_model=1)
    x = np.arange(4 * 16 * 3, dtype=np.int32).reshape(4, 16, 3)
    g = put_global(x, batch_sharding(mesh, x.ndim))
    assert g.shape == x.shape
    np.testing.assert_array_equal(np.asarray(g), x)
    back = replicate_to_host(g, mesh)
    np.testing.assert_array_equal(back, x)


def test_init_raises_when_cluster_requested_late(monkeypatch):
    """If pod markers are present but the backend already initialized, the
    helper must fail loudly — silently proceeding would train every host
    as an independent single-process job with the wrong topology."""
    import pytest
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    with pytest.raises(RuntimeError, match="backend"):
        init_distributed()
