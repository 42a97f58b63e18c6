"""MXU one-hot-matmul scatter (ops/table_scatter.py) vs XLA scatter-add."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matcha_tpu.ops.table_scatter import scatter_add_matmul, table_gather


@pytest.mark.parametrize("T,N", [(1024, 300), (512, 128), (640, 3068)])
def test_scatter_matches_at_add(rng, T, N):
    d = 64
    g = jnp.asarray(rng.standard_normal((T, d)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, T), jnp.int32)
    ref = jnp.zeros((N, d)).at[idx].add(g)
    got = scatter_add_matmul(g, idx, N, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_scatter_odd_token_count_falls_back(rng):
    # T not divisible by any block size -> XLA .at[].add fallback
    T, N, d = 1000, 64, 16
    g = jnp.asarray(rng.standard_normal((T, d)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, T), jnp.int32)
    ref = jnp.zeros((N, d)).at[idx].add(g)
    got = scatter_add_matmul(g, idx, N)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_table_gather_vjp(rng):
    T, N, d = 768, 200, 32
    g = jnp.asarray(rng.standard_normal((T, d)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, T), jnp.int32)
    table = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)

    def loss(t):
        return jnp.sum(jnp.sin(table_gather(t, idx)) * g)

    def loss_ref(t):
        return jnp.sum(jnp.sin(t[idx]) * g)

    g1 = jax.jit(jax.grad(loss))(table)
    g2 = jax.jit(jax.grad(loss_ref))(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("T,N", [(1024, 300), (640, 3068), (1000, 64)])
def test_bincount(rng, T, N):
    from matcha_tpu.ops.table_scatter import bincount_f32
    idx = jnp.asarray(rng.integers(0, N, T), jnp.int32)
    ref = jnp.zeros((N,)).at[idx].add(1.0)
    got = bincount_f32(idx, N, interpret=(T % 128 == 0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref))
