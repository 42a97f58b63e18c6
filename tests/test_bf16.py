"""Mixed-precision (bfloat16 compute) path: runs, agrees with f32 to bf16
tolerance, and trains."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matcha_tpu.genome import GenomeBins
from matcha_tpu.models.hypersagnn import (ModelDims, build_frozen_tables,
                                          forward, init_model)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    genome = GenomeBins(["chr1", "chr2"], [24_000_000, 15_000_000], 1_000_000)
    n = genome.num_nodes
    intra = rng.random((n, n)).astype(np.float32)
    intra = intra + intra.T
    inter = rng.random((n, n)).astype(np.float32)
    chrom_sizes = [int(e - s) for s, e in genome.chrom_range]
    dims32 = ModelDims(dim=16, n_head=4, num_chroms=2, num_nodes=n)
    params = init_model(jax.random.PRNGKey(0), dims32, chrom_sizes)
    frozen = build_frozen_tables(genome, intra, inter)
    return genome, dims32, params, frozen


def test_bf16_close_to_f32(problem, rng):
    genome, dims32, params, frozen = problem
    dims16 = dims32._replace(compute_dtype="bfloat16")
    x = jnp.asarray(np.sort(
        rng.choice(np.arange(1, genome.num_nodes + 1), (32, 3)), axis=1))
    out32 = np.asarray(forward(params, frozen, dims32, x))
    out16 = np.asarray(forward(params, frozen, dims16, x))
    assert out16.dtype == np.float32          # logits always f32
    np.testing.assert_allclose(out16, out32, atol=0.15, rtol=0.1)
    # correlation stays essentially perfect
    corr = np.corrcoef(out16.reshape(-1), out32.reshape(-1))[0, 1]
    assert corr > 0.999


def test_bf16_grads_finite(problem, rng):
    genome, dims32, params, frozen = problem
    dims16 = dims32._replace(compute_dtype="bfloat16")
    x = jnp.asarray(np.sort(
        rng.choice(np.arange(1, genome.num_nodes + 1), (16, 3)), axis=1))

    def loss(p):
        out, recon = forward(p, frozen, dims16, x, return_recon=True,
                             key=jax.random.PRNGKey(0), train=True)
        return jnp.mean(out ** 2) + 0.001 * recon

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # master params stay f32: grads match param dtype
    for g, p in zip(leaves, jax.tree_util.tree_leaves(params)):
        assert g.dtype == p.dtype == jnp.float32
