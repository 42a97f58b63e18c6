"""Incidence op correctness vs dense oracles."""

import numpy as np

import jax.numpy as jnp

from matcha_tpu.ops.incidence import (PaddedIncidence, edge_gather_sum,
                                      edge_sddmm, node_scatter_add)

EDGES = [[1, 2, 3], [2, 5], [1, 4, 5, 6], [3, 6]]
N = 6


def _dense_incidence():
    m = np.zeros((len(EDGES), N + 1))
    for i, e in enumerate(EDGES):
        m[i, e] = 1
    return m


def test_edge_gather_sum(rng):
    X = np.zeros((N + 1, 8), dtype=np.float32)
    X[1:] = rng.standard_normal((N, 8)).astype(np.float32)
    inc = PaddedIncidence.from_ragged(EDGES)
    y = np.asarray(edge_gather_sum(inc, jnp.asarray(X)))
    oracle = _dense_incidence() @ X
    np.testing.assert_allclose(y, oracle, rtol=1e-5)

    w = rng.random(len(EDGES)).astype(np.float32)
    yw = np.asarray(edge_gather_sum(inc, jnp.asarray(X), jnp.asarray(w)))
    np.testing.assert_allclose(yw, oracle * w[:, None], rtol=1e-5)


def test_node_scatter_add(rng):
    Y = rng.standard_normal((len(EDGES), 8)).astype(np.float32)
    inc = PaddedIncidence.from_ragged(EDGES)
    z = np.asarray(node_scatter_add(inc, jnp.asarray(Y), N))
    oracle = _dense_incidence().T @ Y
    np.testing.assert_allclose(z[1:], oracle[1:], rtol=1e-5)


def test_edge_sddmm(rng):
    X = np.zeros((N + 1, 8), dtype=np.float32)
    X[1:] = rng.standard_normal((N, 8)).astype(np.float32)
    inc = PaddedIncidence.from_ragged(EDGES)
    s = np.asarray(edge_sddmm(inc, jnp.asarray(X)))
    for i, e in enumerate(EDGES):
        oracle = sum(float(X[u] @ X[v])
                     for ai, u in enumerate(e) for v in e[ai + 1:])
        assert abs(s[i] - oracle) < 1e-4


def test_from_csr_matches_ragged():
    flat = np.concatenate(EDGES).astype(np.int32)
    offsets = np.zeros(len(EDGES) + 1, dtype=np.int64)
    np.cumsum([len(e) for e in EDGES], out=offsets[1:])
    a = PaddedIncidence.from_ragged(EDGES)
    b = PaddedIncidence.from_csr(flat, offsets)
    np.testing.assert_array_equal(np.asarray(a.members),
                                  np.asarray(b.members))
