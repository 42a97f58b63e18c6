"""Closed-form pairwise scorer must exactly match the batched forward."""

import numpy as np

import jax
import jax.numpy as jnp

from matcha_tpu.apps.pairwise_fast import pairwise_logits
from matcha_tpu.genome import GenomeBins
from matcha_tpu.models.hypersagnn import (ModelDims, build_frozen_tables,
                                          forward, init_model)


def test_pairwise_matches_forward(rng):
    genome = GenomeBins(["chr1", "chr2"], [21_000_000, 14_000_000], 1_000_000)
    n = genome.num_nodes
    intra = rng.random((n, n)).astype(np.float32)
    intra = intra + intra.T
    inter = rng.random((n, n)).astype(np.float32)
    dims = ModelDims(dim=16, n_head=4, num_chroms=2, num_nodes=n)
    chrom_sizes = [int(e - s) for s, e in genome.chrom_range]
    params = init_model(jax.random.PRNGKey(0), dims, chrom_sizes)
    frozen = build_frozen_tables(genome, intra, inter)

    nodes = np.arange(1, 15)
    mat = np.asarray(pairwise_logits(params, frozen, dims, nodes))

    # oracle: batched forward on explicit pairs
    pairs = [(i, j) for i in range(len(nodes)) for j in range(len(nodes))
             if i < j]
    x = jnp.asarray([[nodes[i], nodes[j]] for i, j in pairs])
    ref = np.asarray(forward(params, frozen, dims, x)).reshape(-1)
    got = np.asarray([mat[i, j] for i, j in pairs])
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
    # symmetric by construction
    np.testing.assert_allclose(mat, mat.T, rtol=1e-5, atol=1e-6)
