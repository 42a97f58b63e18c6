"""Generic (typed, non-genomic) hypergraph dataset support."""

import numpy as np

import jax
import jax.numpy as jnp

from matcha_tpu.data.generic import (adjacency_features,
                                     build_generic_problem,
                                     node_space_from_type_counts,
                                     packed_coord_attributes)
from matcha_tpu.data.store import split_by_frequency_bands
from matcha_tpu.models.hypersagnn import forward
from matcha_tpu.sampler.bloom import build_bloom
from matcha_tpu.sampler.negative import sample_negatives


def test_node_space_counts():
    space = node_space_from_type_counts(["drug", "gene", "disease"],
                                        [10, 25, 7])
    assert space.num_nodes == 42
    assert space.chrom_range.tolist() == [[1, 11], [11, 36], [36, 43]]
    assert (space.node2chrom[1:11] == 0).all()
    assert (space.node2chrom[36:43] == 2).all()


def test_adjacency_features_split():
    space = node_space_from_type_counts(["a", "b"], [4, 4])
    edges = [[1, 2, 5], [2, 6], [1, 2]]
    flat = np.concatenate(edges).astype(np.int32)
    offsets = np.array([0, 3, 5, 7], dtype=np.int64)
    intra, inter = adjacency_features(space, flat, offsets)
    assert intra[0, 1] == 2          # nodes 1,2 co-occur twice, same type
    assert intra[0, 4] == 0          # cross-type zeroed in intra
    assert inter[0, 4] == 1          # nodes 1,5 cross-type
    assert inter[1, 5] == 1          # nodes 2,6 cross-type


def test_generic_problem_trains_and_samples(rng):
    edges = []
    for _ in range(60):
        a = int(rng.integers(1, 13))
        b = int(rng.integers(13, 33))
        if a != b:
            edges.append(sorted({a, b}))
    edges = [e for e in edges if len(e) == 2]
    space, dims, params, frozen, table = build_generic_problem(
        [12, 20], edges, dim=16, n_head=4)
    x = jnp.asarray(edges[:8], dtype=jnp.int32)
    out, recon = forward(params, frozen, dims, x, return_recon=True,
                         key=jax.random.PRNGKey(0), train=True)
    assert out.shape == (8, 1)
    assert np.isfinite(np.asarray(out)).all()

    # per-type negative sampling ranges (start_end_dict semantics):
    # corrupted positions stay within their node type
    pos = np.asarray(edges[:32], dtype=np.int32)
    neg = np.asarray(sample_negatives(
        jax.random.PRNGKey(1), jnp.asarray(pos), table, 0,
        build_bloom(pos), neg_num=2))
    np.testing.assert_array_equal(
        np.sort(space.node2chrom[np.tile(pos, (2, 1))], 1),
        np.sort(space.node2chrom[neg], 1))


def test_packed_coord_attributes_matches_reference_rule():
    """Oracle: the exact transform at ref main_drop.py:627-630."""
    a = np.array([[3 * 1e7 + 5], [7 * 1e7 + 2]])
    got = packed_coord_attributes(a, n_first_type=4)
    # ref: concat([a % 1e7, a // 1e7]) / max, prepended zeros(n0+1, 1)
    exp = np.concatenate([a % 1e7, np.floor(a / 1e7)]) / 7.0
    assert got.shape == (4 + 1 + 4, 1)
    np.testing.assert_allclose(got[:5], 0.0)
    np.testing.assert_allclose(got[5:], exp, rtol=1e-6)

    # degenerate inputs fail loudly instead of producing NaN tables
    import pytest
    with pytest.raises(ValueError, match="positive"):
        packed_coord_attributes(np.zeros((3, 1)), n_first_type=2)
    with pytest.raises(ValueError, match="positive"):
        packed_coord_attributes(np.zeros((0, 1)), n_first_type=2)


def test_generic_problem_custom_attributes(rng):
    """attribute_dict surface: a user attribute matrix replaces the built-in
    one-hot-type table and flows through attr_nn (ref main_drop.py:607-631)."""
    edges = [sorted({int(rng.integers(1, 9)), int(rng.integers(9, 21))})
             for _ in range(40)]
    edges = [e for e in edges if len(e) == 2]
    attrs = rng.standard_normal((20, 3)).astype(np.float32)
    space, dims, params, frozen, _ = build_generic_problem(
        [8, 12], edges, dim=16, n_head=4, attributes=attrs)
    assert dims.attr_dim == 3
    assert frozen.attr_table.shape == (21, 3)       # pad row 0 prepended
    np.testing.assert_array_equal(np.asarray(frozen.attr_table[0]), 0.0)
    assert params["attr_nn"]["w"].shape == (3, 16)
    x = jnp.asarray(edges[:4], dtype=jnp.int32)
    out = forward(params, frozen, dims, x)
    assert out.shape == (4, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_frequency_bands():
    kmers = np.arange(12).reshape(6, 2)
    freqs = np.array([3, 4, 5, 8, 12, 30])
    bands = split_by_frequency_bands(kmers, freqs,
                                     [(3, 5), (5, 8), (8, 12), (12, -1)])
    assert len(bands[(3, 5)]) == 2
    assert len(bands[(5, 8)]) == 1
    assert len(bands[(8, 12)]) == 1
    assert len(bands[(12, -1)]) == 2
