"""Activation-level golden parity: our JAX Hyper-SAGNN vs the imported
PyTorch reference (eval mode, identical weights).  This is the BASELINE.json
allclose requirement."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from matcha_tpu.genome import GenomeBins
from matcha_tpu.models.hypersagnn import (ModelDims, build_frozen_tables,
                                          encode_node_table, forward,
                                          init_model, node_embeddings,
                                          recon_loss_with_chrom)

from reference_harness import build_torch_reference, copy_params_to_torch

DIM, HEADS = 16, 4


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    genome = GenomeBins(["chr1", "chr2", "chr3"],
                        [19_500_000, 12_200_000, 8_000_000], 1_000_000)
    n = genome.num_nodes
    intra = rng.random((n, n)).astype(np.float32)
    intra = intra + intra.T
    inter = (rng.random((n, n)) * (rng.random((n, n)) > 0.3)).astype(np.float32)
    inter = inter + inter.T
    np.fill_diagonal(inter, 0)

    dims = ModelDims(dim=DIM, n_head=HEADS,
                     num_chroms=genome.num_chroms, num_nodes=n)
    chrom_sizes = [int(e - s) for s, e in genome.chrom_range]
    params = init_model(jax.random.PRNGKey(0), dims, chrom_sizes)
    frozen = build_frozen_tables(genome, intra, inter)

    tmodel = build_torch_reference(genome, intra, inter, DIM, HEADS)
    copy_params_to_torch(params, tmodel, genome.num_chroms)
    return genome, dims, params, frozen, tmodel


def _batch(genome, rng, b, k, pad_to=None):
    n = genome.num_nodes
    rows = np.stack([np.sort(rng.choice(np.arange(1, n + 1), k, replace=False))
                     for _ in range(b)]).astype(np.int64)
    if pad_to and pad_to > k:
        rows = np.concatenate(
            [rows, np.zeros((b, pad_to - k), dtype=np.int64)], axis=1)
    return rows


def test_frozen_tables_match_reference(setup):
    genome, dims, params, frozen, tmodel = setup
    # attribute table identical to ref get_attributes
    ref_attr = tmodel.attribute_dict.weight.detach().numpy()
    np.testing.assert_allclose(np.asarray(frozen.attr_table), ref_attr,
                               atol=1e-6)
    # z-scored inter table identical to ref MultipleEmbedding preprocessing
    ref_inter = tmodel.node_embedding.inter_initial.embedding.detach().numpy()
    np.testing.assert_allclose(np.asarray(frozen.inter_z)[1:], ref_inter,
                               atol=1e-5)
    # corrcoef feature tables identical
    for c in range(genome.num_chroms):
        ref_feat = tmodel.node_embedding.embeddings[c].embedding.detach().numpy()
        np.testing.assert_allclose(np.asarray(frozen.features[c]), ref_feat,
                                   atol=1e-6)


def test_node_embeddings_match(setup):
    genome, dims, params, frozen, tmodel = setup
    ours = np.asarray(node_embeddings(params, frozen, dims))
    ids = torch.arange(1, genome.num_nodes + 1).view(-1, 1)
    with torch.no_grad():
        ref = tmodel.get_node_embeddings(ids).numpy()[:, 0, :]
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=5e-5)


@pytest.mark.parametrize("k,pad_to", [(2, None), (3, None), (5, None),
                                      (2, 5), (3, 5)])
def test_logits_match(setup, k, pad_to):
    genome, dims, params, frozen, tmodel = setup
    rng = np.random.default_rng(k * 100 + (pad_to or 0))
    x = _batch(genome, rng, 17, k, pad_to)
    ours = np.asarray(forward(params, frozen, dims, jnp.asarray(x)))
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=5e-5)


def test_recon_loss_matches(setup):
    genome, dims, params, frozen, tmodel = setup
    rng = np.random.default_rng(11)
    x = _batch(genome, rng, 13, 3)

    table = encode_node_table(params, frozen, dims, train=False)
    emb = table[jnp.asarray(x)].reshape(-1, DIM)
    for r in range(genome.num_chroms):
        ours = float(recon_loss_with_chrom(
            params, frozen, dims, jnp.asarray(x).reshape(-1), emb, r))
        # force the reference's random chromosome draw to r
        orig_choice = np.random.choice
        np.random.choice = lambda a, size=None, **kw: np.array([r])
        try:
            with torch.no_grad():
                _, ref_loss = tmodel.node_embedding(
                    torch.from_numpy(x.reshape(-1)))
        finally:
            np.random.choice = orig_choice
        assert abs(ours - float(ref_loss)) < 1e-3 * max(1.0, abs(ours))


def test_train_mode_runs(setup):
    """Smoke: dropout path executes and is stochastic."""
    genome, dims, params, frozen, tmodel = setup
    rng = np.random.default_rng(3)
    x = jnp.asarray(_batch(genome, rng, 9, 3))
    out1, rec1 = forward(params, frozen, dims, x, key=jax.random.PRNGKey(1),
                         train=True, return_recon=True)
    out2, _ = forward(params, frozen, dims, x, key=jax.random.PRNGKey(2),
                      train=True, return_recon=True)
    assert out1.shape == (9, 1)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    assert np.isfinite(float(rec1))
