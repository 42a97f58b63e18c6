"""Walk-pretraining integration: walks -> SGNS -> table-mode model."""

import numpy as np

import jax

from matcha_tpu.genome import GenomeBins
from matcha_tpu.models.hypersagnn import (ModelDims, build_frozen_tables,
                                          forward, init_model)
from matcha_tpu.walks.pretrain import pretrain_node_embeddings


def test_pretrain_feeds_table_mode(rng):
    genome = GenomeBins(["chr1"], [19_000_000], 1_000_000)
    n = genome.num_nodes
    # hyperedges (1-based) from two communities
    comm = rng.integers(0, 2, n + 1)
    edges = []
    for _ in range(300):
        c = rng.integers(0, 2)
        members = np.flatnonzero(comm[1:] == c) + 1
        if len(members) >= 3:
            edges.append(sorted(rng.choice(members, 3, replace=False)))

    emb, losses = pretrain_node_embeddings(
        n, edges, dim=16, walk_mode="hyper", num_walks=5, walk_length=10,
        window=3, epochs=2, seed=0)
    assert emb.shape == (n, 16)
    assert losses[-1] < losses[0]

    dims = ModelDims(dim=16, n_head=4, num_chroms=1, num_nodes=n)
    chrom_sizes = [int(e - s) for s, e in genome.chrom_range]
    params = init_model(jax.random.PRNGKey(0), dims, chrom_sizes,
                        embedding_mode="table", table_init=emb)
    intra = rng.random((n, n)).astype(np.float32)
    frozen = build_frozen_tables(genome, intra + intra.T,
                                 rng.random((n, n)).astype(np.float32))
    import jax.numpy as jnp
    out = forward(params, frozen, dims, jnp.asarray([[1, 3, 7]]))
    assert np.isfinite(np.asarray(out)).all()


def test_clique_mode_runs(rng):
    edges = [sorted(rng.choice(np.arange(1, 15), 3, replace=False))
             for _ in range(40)]
    emb, losses = pretrain_node_embeddings(
        14, edges, dim=8, walk_mode="clique", num_walks=3, walk_length=8,
        window=2, epochs=1, seed=1)
    assert emb.shape == (14, 8)
