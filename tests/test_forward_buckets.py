"""Merged-bucket forward must match the per-bucket forward exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matcha_tpu.genome import GenomeBins
from matcha_tpu.models.hypersagnn import (ModelDims, build_frozen_tables,
                                          forward, forward_buckets,
                                          init_model, recon_loss_with_chrom)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(2)
    genome = GenomeBins(["chr1", "chr2"], [24_000_000, 15_000_000], 1_000_000)
    n = genome.num_nodes
    intra = rng.random((n, n)).astype(np.float32)
    intra = intra + intra.T
    inter = rng.random((n, n)).astype(np.float32)
    dims = ModelDims(dim=16, n_head=4, num_chroms=2, num_nodes=n)
    chrom_sizes = [int(e - s) for s, e in genome.chrom_range]
    params = init_model(jax.random.PRNGKey(0), dims, chrom_sizes)
    frozen = build_frozen_tables(genome, intra, inter)
    xs = {}
    for k in (2, 3, 5):
        e = np.stack([np.sort(rng.choice(np.arange(1, n + 1), k,
                                         replace=False))
                      for _ in range(11)])
        xs[k] = jnp.asarray(e, dtype=jnp.int32)
    return dims, params, frozen, xs


def test_merged_matches_per_bucket(setup):
    dims, params, frozen, xs = setup
    merged = forward_buckets(params, frozen, dims, xs)
    for k, x in xs.items():
        ref = np.asarray(forward(params, frozen, dims, x))
        np.testing.assert_allclose(np.asarray(merged[k]), ref,
                                   rtol=1e-5, atol=1e-6, err_msg=f"k={k}")


def test_recon_node_matches_token_oracle(setup):
    """The per-node recon (production path) equals the per-token oracle for
    every chromosome draw — including repeated node ids and pad-id-0 tokens
    (which the mask excludes)."""
    from matcha_tpu.models.hypersagnn import (encode_node_table,
                                              recon_loss_node)
    dims, params, frozen, xs = setup
    table = encode_node_table(params, frozen, dims)
    rng = np.random.default_rng(9)
    flat = jnp.asarray(
        rng.integers(0, dims.num_nodes + 1, size=300), jnp.int32)
    emb = table[flat]
    for r in range(dims.num_chroms):
        oracle = float(recon_loss_with_chrom(params, frozen, dims, flat,
                                             emb, r))
        fast = float(recon_loss_node(params, frozen, dims, flat, table, r))
        assert abs(fast - oracle) < 1e-3 * max(1.0, abs(oracle)), (r, fast,
                                                                   oracle)


def test_merged_recon_matches(setup):
    dims, params, frozen, xs = setup
    from matcha_tpu.models.hypersagnn import encode_node_table
    _, recon = forward_buckets(params, frozen, dims, xs, return_recon=True,
                               key=jax.random.PRNGKey(3), train=False)
    # oracle: recon on the concatenated token stream with the same chrom
    table = encode_node_table(params, frozen, dims)
    flat = jnp.concatenate([xs[k].reshape(-1) for k in sorted(xs)])
    emb = table[flat]
    vals = [float(recon_loss_with_chrom(params, frozen, dims, flat, emb, r))
            for r in range(dims.num_chroms)]
    assert any(abs(float(recon) - v) < 1e-4 for v in vals)


def test_merged_grads_match(setup):
    dims, params, frozen, xs = setup

    def loss_merged(p):
        out = forward_buckets(p, frozen, dims, xs)
        return sum(jnp.sum(v ** 2) for v in out.values())

    def loss_ref(p):
        return sum(jnp.sum(forward(p, frozen, dims, x) ** 2)
                   for x in xs.values())

    g1 = jax.grad(loss_merged)(params)
    g2 = jax.grad(loss_ref)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
