"""shard_map wrapping of the Pallas kernel call sites (parallel/mesh.py
active-mesh context): Pallas custom calls have no GSPMD partitioning rule,
so under a sharded jit XLA would all-gather their operands and run them
replicated on every chip.  These tests pin, on the virtual 8-device CPU
mesh (kernel fallbacks = the XLA reference paths), that the shard_mapped
wrappers (a) match the unsharded numerics including weight gradients
(the pcast-to-varying + transpose-psum path) and (b) keep the batch
device-local (no all-gather of batch-sized arrays in the compiled HLO).
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from matcha_tpu.models.modules import mha_dynamic, mha_fused, mha_init
from matcha_tpu.ops.table_scatter import (bincount_f32, bincount_sharded,
                                          table_gather_sharded)
from matcha_tpu.parallel.mesh import (active_data_mesh, make_mesh,
                                      set_active_mesh)

D, H = 32, 4


@pytest.fixture
def data_mesh():
    mesh = make_mesh(n_data=8, n_model=1)
    yield mesh
    set_active_mesh(None)


def test_active_mesh_gating(data_mesh):
    set_active_mesh(None)
    assert active_data_mesh() is None
    set_active_mesh(data_mesh)
    assert active_data_mesh() is data_mesh
    tp = make_mesh(n_data=4, n_model=2)
    set_active_mesh(tp)
    # mixed data x model meshes qualify since the kernels shard the batch
    # over BOTH axes jointly (weights replicated when params are) — only
    # Trainer-level TP (model-sharded attention weights) passes None
    assert active_data_mesh() is tp


def test_mha_fused_sharded_matches_unsharded(rng, data_mesh):
    E, L = 1024, 3
    p = mha_init(jax.random.PRNGKey(0), H, D, D, D, D)
    x = jnp.asarray(rng.standard_normal((E, L, D)), jnp.float32)
    xs = jax.device_put(x, NamedSharding(data_mesh, P("data")))

    def loss_sharded(p, x):
        return jnp.sum(mha_fused(p, x, H, True, False, data_mesh) ** 2)

    def loss_plain(p, x):
        return jnp.sum(mha_fused(p, x, H, True, False, None) ** 2)

    o1 = jax.jit(lambda p, x: mha_fused(p, x, H, True, False, data_mesh))(
        p, xs)
    o2 = mha_fused(p, x, H, True, False, None)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=2e-5, atol=2e-5)

    g1 = jax.jit(jax.grad(loss_sharded))(p, xs)
    g2 = jax.jit(jax.grad(loss_plain))(p, x)
    flat1, _ = jax.tree_util.tree_flatten(g1)
    flat2, _ = jax.tree_util.tree_flatten(g2)
    for i, (a, b) in enumerate(zip(flat1, flat2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=f"leaf {i}")


def test_mha_fused_sharded_no_batch_allgather(rng, data_mesh):
    """The compiled sharded fwd+bwd must not all-gather batch-sized arrays
    (weight-grad psums ARE expected)."""
    E, L = 1024, 3
    p = mha_init(jax.random.PRNGKey(0), H, D, D, D, D)
    x = jnp.asarray(rng.standard_normal((E, L, D)), jnp.float32)
    xs = jax.device_put(x, NamedSharding(data_mesh, P("data")))

    def loss(p, x):
        return jnp.sum(mha_fused(p, x, H, True, False, data_mesh) ** 2)

    hlo = jax.jit(jax.grad(loss)).lower(p, xs).compile().as_text()
    for m in re.finditer(r"all-gather[^=]*=\s*\S*?f32\[([\d,]+)\]", hlo):
        size = np.prod([int(v) for v in m.group(1).split(",")])
        assert size < E * L * D, f"batch-sized all-gather: {m.group(0)[:80]}"


def test_table_gather_sharded_grads(rng, data_mesh):
    T, N, d = 1024, 96, 16
    idx = jnp.asarray(rng.integers(0, N, T), jnp.int32)
    table = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
    gg = jnp.asarray(rng.standard_normal((T, d)), jnp.float32)

    def loss_sm(t):
        return jnp.sum(jnp.sin(table_gather_sharded(t, idx, data_mesh)) * gg)

    def loss_ref(t):
        return jnp.sum(jnp.sin(t[idx]) * gg)

    g1 = jax.jit(jax.grad(loss_sm))(table)
    g2 = jax.jit(jax.grad(loss_ref))(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)


def test_bincount_sharded(rng, data_mesh):
    T, N = 1024, 77
    idx = jnp.asarray(rng.integers(0, N, T), jnp.int32)
    ref = jnp.zeros((N,)).at[idx].add(1.0)
    got = jax.jit(lambda i: bincount_sharded(i, N, data_mesh))(idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref))


def test_using_active_mesh_scopes_and_restores(data_mesh):
    """Trainer-scoped mesh activation: a second Trainer (or none) must not
    clobber what an earlier Trainer's still-untraced functions see."""
    from matcha_tpu.parallel.mesh import using_active_mesh
    set_active_mesh(None)
    with using_active_mesh(data_mesh):
        assert active_data_mesh() is data_mesh
        with using_active_mesh(None):      # nested Trainer without a mesh
            assert active_data_mesh() is None
        assert active_data_mesh() is data_mesh
    assert active_data_mesh() is None
