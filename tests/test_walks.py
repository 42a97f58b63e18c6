"""Random-walk subsystem tests: transition-probability parity with the
reference formulas + skip-gram learning sanity."""

import numpy as np
import pytest

from matcha_tpu.walks.alias import alias_setup, build_alias_tables
from matcha_tpu.walks.clique import clique_expansion, clique_node2vec_walks
from matcha_tpu.walks.hyper import hypergraph_walks, incidence_matrices
from matcha_tpu.walks.skipgram import train_skipgram, unigram_table, walks_to_pairs

HYPEREDGES = [[0, 1, 2], [1, 2, 3], [2, 3], [3, 4, 5], [0, 5], [1, 4, 5]]
N = 6


def test_alias_tables_sample_correct_distribution():
    rng = np.random.default_rng(0)
    dists = [np.array([0.7, 0.2, 0.1]), np.array([0.5, 0.5]),
             np.array([1.0])]
    values = [np.array([10, 20, 30]), np.array([40, 50]), np.array([60])]
    tables = build_alias_tables(dists, values)
    draws = tables.draw(np.zeros(200_000, dtype=np.int64), rng)
    freq = np.array([(draws == v).mean() for v in values[0]])
    np.testing.assert_allclose(freq, dists[0], atol=0.01)
    assert (tables.draw(np.full(100, 2, dtype=np.int64), rng) == 60).all()


def test_clique_expansion_weights():
    adj = clique_expansion(N, HYPEREDGES).toarray()
    # pair (1,2) appears in hyperedges 0 and 1 -> weight 2 (ref add_weight)
    assert adj[1, 2] == 2 and adj[2, 1] == 2
    assert adj[0, 1] == 1
    assert adj[0, 3] == 0
    assert (adj == adj.T).all()
    assert (np.diag(adj) == 0).all()


def test_clique_walk_empirical_first_step():
    """First step from a node follows w(v,x)/sqrt(deg x), normalized
    (ref random_walk.py:84-93)."""
    adj = clique_expansion(N, HYPEREDGES).toarray()
    degree = adj.sum(1)
    v = 2
    w = adj[v] / np.sqrt(np.where(degree > 0, degree, 1))
    expect = w / w.sum()

    walks = clique_node2vec_walks(N, HYPEREDGES, num_walks=3000,
                                  walk_length=2, seed=1)
    first_steps = walks[walks[:, 0] == v][:, 1]
    freq = np.bincount(first_steps, minlength=N) / len(first_steps)
    np.testing.assert_allclose(freq, expect, atol=0.03)


def test_clique_second_order_bias():
    """p/q biasing: with huge p and tiny q, returning to the previous node
    should be rare; with tiny p, common (ref get_alias_edge :32-62)."""
    back = {}
    for p, q in [(100.0, 100.0), (0.01, 100.0)]:
        walks = clique_node2vec_walks(N, HYPEREDGES, p=p, q=q,
                                      num_walks=2000, walk_length=3, seed=2)
        returned = (walks[:, 2] == walks[:, 0]).mean()
        back[(p, q)] = returned
    assert back[(0.01, 100.0)] > back[(100.0, 100.0)] + 0.2


def test_hypergraph_first_order_weights():
    """ff(src,dst) = sum over shared hyperedges of 1/|e|
    (ref random_walk_hyper.py:111-141)."""
    EV, EV_od = incidence_matrices(N, HYPEREDGES)
    W = (EV_od.T @ EV_od).toarray()
    np.fill_diagonal(W, 0)
    # nodes 1,2 share hyperedges {0,1,2}... sizes 3,3 -> 1/3+1/3
    assert abs(W[1, 2] - (1 / 3 + 1 / 3)) < 1e-6
    # nodes 2,3 share hyperedge 1 (size 3) and 2 (size 2) -> 1/3+1/2
    assert abs(W[2, 3] - (1 / 3 + 1 / 2)) < 1e-6
    assert W[0, 3] == 0


def test_device_cooccurrence_matches_scipy():
    """ops.incidence.pair_cooccurrence == the scipy VE_od @ EV_od product
    (the walks' first-order weights), on both a hand graph and a random one."""
    from matcha_tpu.walks.hyper import cooccurrence_csr
    rng = np.random.default_rng(9)
    cases = [HYPEREDGES]
    n_rand = 40
    cases.append([sorted(rng.choice(n_rand, size=rng.integers(2, 6),
                                    replace=False))
                  for _ in range(120)])
    for n, edges in [(N, cases[0]), (n_rand, cases[1])]:
        a = cooccurrence_csr(n, edges, backend="device").toarray()
        b = cooccurrence_csr(n, edges, backend="scipy").toarray()
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_hypergraph_walks_backends_agree():
    """Same seed, same walks, whichever backend computed the weights (the
    small-|e| reciprocals are exact in f32 here)."""
    w_dev = hypergraph_walks(N, HYPEREDGES, num_walks=20, walk_length=8,
                             seed=5, weight_backend="device")
    w_sp = hypergraph_walks(N, HYPEREDGES, num_walks=20, walk_length=8,
                            seed=5, weight_backend="scipy")
    np.testing.assert_array_equal(w_dev, w_sp)


def test_hypergraph_walks_shapes_and_support():
    walks = hypergraph_walks(N, HYPEREDGES, num_walks=50, walk_length=10,
                             seed=3)
    assert walks.shape == (N * 50, 10)
    EV, EV_od = incidence_matrices(N, HYPEREDGES)
    W = (EV_od.T @ EV_od).toarray()
    np.fill_diagonal(W, 0)
    # every transition must follow an existing node-node co-membership
    for t in range(9):
        a, b = walks[:, t], walks[:, t + 1]
        moved = a != b
        assert (W[a[moved], b[moved]] > 0).all()


def test_walks_to_pairs_window():
    rng = np.random.default_rng(0)
    walks = np.arange(12).reshape(2, 6)
    pairs = walks_to_pairs(walks, window=2, rng=rng)
    # all pairs within distance 2 on the same walk
    for c, ctx in pairs:
        assert abs(int(c) - int(ctx)) <= 2
        assert (c < 6) == (ctx < 6)


def test_skipgram_learns_community_structure():
    """Walks that never cross two communities -> embeddings separate them."""
    rng = np.random.default_rng(0)
    vocab = 20
    comm = np.arange(vocab) // 10
    walks = []
    for _ in range(400):
        c = rng.integers(0, 2)
        members = np.flatnonzero(comm == c)
        walks.append(rng.choice(members, 20))
    walks = np.asarray(walks)
    emb, losses = train_skipgram(walks, vocab, 16, window=3, epochs=6,
                                 batch=512, seed=0)
    assert losses[-1] < losses[0]
    emb = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-9)
    sims = emb @ emb.T
    same = sims[comm[:, None] == comm[None, :]].mean()
    diff = sims[comm[:, None] != comm[None, :]].mean()
    assert same > diff + 0.2, (same, diff)


def test_unigram_table_power():
    walks = np.array([[0, 0, 0, 1]])
    t = unigram_table(walks, 3)
    assert t[2] == 0
    assert abs(t[0] / t[1] - 3 ** 0.75) < 1e-5


def test_short_walks_and_wide_windows():
    """Regression: window > walk_length crashed walks_to_pairs with an
    IndexError, and walk_length=1 crashed the clique walker."""
    import numpy as np
    from matcha_tpu.walks.clique import clique_node2vec_walks
    from matcha_tpu.walks.skipgram import walks_to_pairs

    rng = np.random.default_rng(0)
    walks = rng.integers(0, 10, (16, 5))
    pairs = walks_to_pairs(walks, window=10, rng=rng)   # window > L
    assert pairs.shape[1] == 2 and len(pairs) > 0

    w = clique_node2vec_walks(4, [[0, 1, 2], [1, 2, 3]], num_walks=2,
                              walk_length=1, seed=0)
    assert w.shape == (8, 1)
